"""Ingest-spine tests — each encodes a runtime check the reference
performs (SURVEY §5): canonical projection under schema drift, the
maxerrors gate, routing, AutoID density, chunk arithmetic, upsert
idempotence, archive moves, report export."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from python_lambda_ecs_container_data_etl_aws_spark.catalog import load_table
from python_lambda_ecs_container_data_etl_aws_spark.export import export_report_csv
from python_lambda_ecs_container_data_etl_aws_spark.sources import archive, chunking, merge, registry
from python_lambda_ecs_container_data_etl_aws_spark.sources.loader import (
    read_csv_canonical,
    validate_counts,
)
from tests.conftest import SF_DIR

HEADER = ",".join(registry.PRICEINDEX.canonical_columns)
ROW = '2023-01-01,Canada,D1,food,unit,1,f,2,v,c,101.5,ok,,n,1'


def _write_csv(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_canonical_projection_handles_column_drift(spark, tmp_path):
    # shuffled column order + an extra column must still project canonically
    cols = list(registry.PRICEINDEX.canonical_columns)
    shuffled = cols[5:] + cols[:5] + ["EXTRA"]
    vals = {c: f"v_{c}" for c in cols}
    vals["VALUE"] = "101.5"
    line = ",".join(vals[c] if c in vals else "x" for c in shuffled[:-1]) + ",extra"
    path = _write_csv(tmp_path, "PriceIndex_drift.csv", [",".join(shuffled), line])
    res = read_csv_canonical(spark, path, registry.PRICEINDEX)
    assert res.good.columns == list(registry.PRICEINDEX.canonical_columns)
    row = res.good.collect()[0]
    assert row["VALUE"] == "101.5" and row["GEO"] == "v_GEO"


def test_missing_canonical_column_becomes_null(spark, tmp_path):
    cols = [c for c in registry.PRICEINDEX.canonical_columns if c != "SYMBOL"]
    line = ",".join("x" for _ in cols)
    path = _write_csv(tmp_path, "price_nosym.csv", [",".join(cols), line])
    res = read_csv_canonical(spark, path, registry.PRICEINDEX)
    assert res.good.collect()[0]["SYMBOL"] is None


def test_maxerrors_gate(spark, tmp_path):
    # PERMISSIVE CSV: rows with too many columns land in _corrupt_record
    good = [ROW] * 10
    bad = [ROW + ",overflow,overflow"] * 6
    path = _write_csv(tmp_path, "priceindex_bad.csv", [HEADER] + good + bad)
    res = read_csv_canonical(spark, path, registry.PRICEINDEX, maxerrors=5)
    assert res.bad_rows == 6
    assert not res.accepted
    res2 = read_csv_canonical(spark, path, registry.PRICEINDEX, maxerrors=6)
    assert res2.accepted
    assert validate_counts(16, res2.good.count(), maxerrors=6)


def test_routing_lookup():
    assert registry.lookup_table("PriceIndex2023.csv").table == "priceindex"
    assert registry.lookup_table("some_price_data.txt").table == "priceindex"
    assert registry.lookup_table("index_values.csv").table == "priceindex"
    assert registry.lookup_table("unrelated.csv") is None
    assert registry.lookup_table("converted_price.csv") is None  # loop guard


def test_add_autoid_dense_and_ordered(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    with_id = chunking.add_autoid(li, ["l_orderkey", "l_linenumber"], partitions=8)
    n = li.count()
    stats = with_id.agg(
        F.min("autoid").alias("mn"), F.max("autoid").alias("mx"), F.count(F.lit(1)).alias("c"),
        F.countDistinct("autoid").alias("d"),
    ).collect()[0]
    assert (stats.mn, stats.mx, stats.c, stats.d) == (1, n, n, n)
    # order agreement: autoid ascends with the sort key
    head = with_id.orderBy("l_orderkey", "l_linenumber").limit(5).collect()
    assert [r.autoid for r in head] == [1, 2, 3, 4, 5]


def test_chunk_arithmetic_short_last_chunk(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    n = li.count()
    with_id = chunking.add_autoid(li, ["l_orderkey", "l_linenumber"], partitions=4)
    chunked = chunking.assign_chunks(with_id, n, size_mib=23.0)
    sizes = {r.chunk: r.cnt for r in chunked.groupBy("chunk").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    lpf = chunking.lines_per_file(n, 23.0)
    assert len(sizes) == chunking.n_chunks(n, 23.0)
    full = [sizes[c] for c in sorted(sizes)[:-1]]
    assert all(s == lpf for s in full)
    assert sizes[max(sizes)] == n - lpf * (len(sizes) - 1)


def test_upsert_semantics_and_idempotence(spark):
    perm = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    delta = spark.createDataFrame(
        [(2, "B", None), (4, "d", 40.0)], "k int, s string, v double"
    )
    out = merge.upsert(perm, delta, ["k"])
    rows = {r.k: (r.s, r.v) for r in out.collect()}
    assert rows == {1: ("a", 10.0), 2: ("B", None), 3: ("c", 30.0), 4: ("d", 40.0)}
    # idempotent: applying the same delta again changes nothing
    again = {r.k: (r.s, r.v) for r in merge.upsert(out, delta, ["k"]).collect()}
    assert again == rows


def test_archive_move(tmp_path):
    src = tmp_path / "in" / "f.csv"
    src.parent.mkdir()
    src.write_text("x")
    backup = str(tmp_path / "backup")
    dest = archive.archive_file(str(src), backup)
    assert os.path.exists(dest) and not src.exists()
    # idempotent re-archive
    assert archive.archive_file(str(src), backup) == dest


def test_export_report_csv(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, name string")
    path = export_report_csv(df, str(tmp_path / "report"))
    with open(path) as f:
        content = f.read().strip().splitlines()
    assert content[0] == "id,name"
    assert sorted(content[1:]) == ["1,x", "2,y"]


def test_export_report_csv_gzip(spark, tmp_path):
    """S11: the reference's abandoned `mysqldump | gzip` path is one
    writer option here."""
    import gzip

    df = spark.createDataFrame([(1, "x")], "id int, name string")
    path = export_report_csv(df, str(tmp_path / "gz"), compression="gzip")
    assert path.endswith(".gz")
    with gzip.open(path, "rt") as f:
        assert f.read().splitlines()[0] == "id,name"


def test_http_collect_file_url(tmp_path):
    """S1/S2: fetch → dated landing folder (file:// keeps it offline)."""
    from python_lambda_ecs_container_data_etl_aws_spark.sources import http_source

    src = tmp_path / "remote" / "PriceIndex_2023.csv"
    src.parent.mkdir()
    src.write_text("Date,GEO\n2023-01-01,Canada\n")
    dest = http_source.collect(src.as_uri(), str(tmp_path / "landing"))
    assert os.path.basename(dest) == "PriceIndex_2023.csv"
    assert os.path.basename(os.path.dirname(dest)) == __import__("datetime").date.today().isoformat()
    assert open(dest).read().startswith("Date,GEO")


def test_wallclock_recency_gate_tz_and_dst(spark):
    """F11: the gate compares NY wall-clocks, so across the spring-
    forward DST jump (2024-03-10 07:00 UTC) an event 31 instant-minutes
    before "now" appears 1h31m older in wall-clock terms and is dropped,
    while the same spread away from a transition keeps it."""
    from python_lambda_ecs_container_data_etl_aws_spark.functions.tz import (
        wallclock_recency_gate,
    )

    US = 1_000_000
    # away from DST: wall-clock gap == instant gap
    base = 1704067200 * US  # 2024-01-01 00:00:00 UTC
    plain = spark.createDataFrame(
        [(1, base), (2, base - 29 * 60 * US), (3, base - 31 * 60 * US)],
        "id bigint, ts_us bigint",
    )
    kept = {r.id for r in wallclock_recency_gate(plain, now_us=base).collect()}
    assert kept == {1, 2}
    # across spring-forward: 02:00 EST jumps to 03:00 EDT at 07:00 UTC
    jump = 1710054000 * US  # 2024-03-10 07:00:00 UTC == 03:00 EDT
    dst = spark.createDataFrame(
        [(1, jump + 60 * US), (2, jump - 29 * 60 * US)],
        "id bigint, ts_us bigint",
    )
    kept = {r.id for r in wallclock_recency_gate(dst, now_us=jump + 60 * US).collect()}
    # row 2 is 30 instant-minutes old but 1h30m wall-clock-old: dropped
    assert kept == {1}


def test_db_init_script_executes_against_catalog(spark, tmp_path):
    """The db_init route consumer: a .sql script replayed against the
    Spark SQL catalog (the reference replays it against MySQL via ECS,
    2.1:190-236)."""
    from python_lambda_ecs_container_data_etl_aws_spark.sources.db_init import (
        run_init_script,
        split_statements,
    )

    script = tmp_path / "init_views.sql"
    script.write_text(
        "-- init script\n"
        "CREATE OR REPLACE TEMPORARY VIEW init_t AS\n"
        "SELECT 1 AS k, 'a' AS v; -- inline comment\n"
        "CREATE OR REPLACE TEMPORARY VIEW init_t2 AS\n"
        "SELECT k + 1 AS k2 FROM init_t;\n"
    )
    assert len(split_statements(script.read_text())) == 2
    n = run_init_script(spark, str(script))
    assert n == 2
    assert spark.sql("SELECT k2 FROM init_t2").collect()[0].k2 == 2


def test_upsert_delta_seam(spark, tmp_path):
    """The Delta MERGE INTO backend behind the same upsert contract:
    full parity with the plain-parquet path where delta-spark exists;
    a clean NotImplementedError where it doesn't (this sandbox)."""
    from python_lambda_ecs_container_data_etl_aws_spark.sources.merge import (
        upsert,
        upsert_delta,
    )

    perm = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    delta = spark.createDataFrame([(2, None), (3, "c")], "k INT, v STRING")
    try:
        import delta as _delta  # noqa: F401
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            upsert_delta(spark, str(tmp_path / "t"), delta, ["k"])
        return
    path = str(tmp_path / "t")
    perm.write.format("delta").save(path)
    upsert_delta(spark, path, delta, ["k"])
    got = sorted((r.k, r.v) for r in spark.read.format("delta").load(path).collect())
    want = sorted(
        (r.k, r.v) for r in upsert(perm, delta, ["k"]).collect()
    )
    assert got == want  # delta wins incl. NULLs; unmatched insert


def test_cli_list_and_unknown_query(capsys):
    """The CLI lists the full catalog and suggests near-matches for
    typos without touching Spark."""
    from python_lambda_ecs_container_data_etl_aws_spark.__main__ import main
    from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES

    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert set(out) == set(QUERIES)

    assert main(["run", "q05_report_agregate"]) == 2  # typo
    err = capsys.readouterr().err
    assert "q05_report_aggregate" in err  # suggestion


def test_cli_run_writes_csv(spark, tmp_path, capsys):
    """`run --out x.csv` writes a single-file CSV of the query result."""
    from python_lambda_ecs_container_data_etl_aws_spark.__main__ import main

    out = str(tmp_path / "q01.csv")
    assert main(
        ["run", "q01_ingest_count", "--sf-dir", SF_DIR, "--out", out]
    ) == 0
    import glob

    part = glob.glob(f"{out}/*.csv") + ([out] if os.path.isfile(out) else [])
    assert part
    body = open(part[0]).read().strip().split("\n")
    assert body[0] == "n_rows" and int(body[1]) > 0


def test_export_report_json_roundtrip(spark, tmp_path):
    """JSONL export: one file, parseable line-per-row, values intact;
    gzip variant produces a .gz part readable by Spark."""
    import gzip
    import json

    from python_lambda_ecs_container_data_etl_aws_spark.export import export_report_json

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, k string, v double"
    )
    path = export_report_json(df, str(tmp_path / "rep_json"))
    assert path.endswith(".json")
    rows = [json.loads(l) for l in open(path)]
    assert {(r["id"], r["k"], r["v"]) for r in rows} == {(1, "a", 1.5), (2, "b", 2.5)}

    gz = export_report_json(df, str(tmp_path / "rep_json_gz"), compression="gzip")
    assert gz.endswith(".gz")
    rows = [json.loads(l) for l in gzip.open(gz, "rt")]
    assert len(rows) == 2
    back = spark.read.json(str(tmp_path / "rep_json_gz"))
    assert back.count() == 2

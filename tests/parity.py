"""Cross-engine comparison harness: runs a Spark DataFrame and a DuckDB
oracle SQL over the same parquet tables and asserts row-count, column
set, and an order-insensitive value hash agree — a strict local stand-in
for the driver's CORRECTNESS gate."""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from decimal import Decimal

import duckdb

from python_lambda_ecs_container_data_etl_aws_spark.catalog import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return str(v)


def canon_rows(rows, cols) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def result_hash(rows, cols) -> str:
    h = hashlib.sha256()
    for row in canon_rows(rows, cols):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()


def compare(spark_df, duck_con, sql: str, name: str = "") -> None:
    s_rows = spark_df.collect()
    s_cols = list(spark_df.columns)
    res = duck_con.execute(sql)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    # ORDER-sensitive: the hash below sorts columns by name, so an
    # order drift is invisible to it — but the driver's schema check
    # may not be as forgiving (same harness-blind-spot class as the
    # round-3 HUGEINT canonicalization). Pin the exact SELECT order.
    assert s_cols == o_cols, (
        f"{name}: column order mismatch spark={s_cols} oracle={o_cols}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sh = result_hash(s_rows, s_cols)
    oh = result_hash(o_rows, o_cols)
    if sh != oh:
        sc = canon_rows(s_rows, s_cols)
        oc = canon_rows(o_rows, o_cols)
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        raise AssertionError(f"{name}: value hash mismatch; first diffs {diffs}")

"""Synthesize a larger scale-factor dataset from a driver testdata
directory by KEYED REPLICATION — the round-4 verdict item 4 scale
tier (sf1 = 10x sf0.1: ~6M lineitem rows, 50k documents, 20k
embeddings) used to measure per-family scaling exponents.

    python tools/synth_sf.py --src /root/testdata/sf0.1 \
        --dst /tmp/sfsynth/sf1 --factor 10

Design rules (all deterministic, no RNG):

- **Fact/dim tables** (customer, supplier, part, orders, lineitem,
  events): replica ``i`` shifts every key in domain D by ``i * |D|``
  (domains are 0-based dense), so PK↔FK relationships hold exactly
  and per-key densities (lines per order, events per user) are
  preserved. region/nation stay fixed — TPC-H semantics (and the
  catalog's broadcast-dim assumption) keep small dims constant as SF
  grows.
- **documents**: replica 0 is verbatim; replica i>0 applies a
  BIJECTIVE token rename (every word w -> w_r<i>) and recomputes
  n_chars. A bijection preserves the near-duplicate structure within
  a replica EXACTLY (exact dups, shingle sets, simhash bags, BPE
  stats all isomorphic to the source corpus) while cross-replica
  lexical overlap is ZERO at both shingle and bag-of-words level —
  so every text-similarity family's candidate/pair counts scale
  ~linearly with the factor instead of quadratically. (The first cut
  interleaved salt tokens instead; that killed shingle overlap but
  left ~80% bag overlap, and the sf1 bench caught simhash banding
  going quadratic across replicas — 65 s on q26.) Vocabulary grows
  ~linearly with the factor, the Heaps'-law direction a real corpus
  takes.
- **embeddings**: replica i rolls each 64-dim vector by i positions.
  A roll is an orthogonal transform applied uniformly within the
  replica, so intra-replica pairwise cosines (kNN structure, near-dup
  rate) are EXACTLY the source corpus's, while cross-replica cosines
  decorrelate to base rates — same linear-pairs argument as the salt.
- **events**: user_id shifts per replica (factor x more users at the
  same per-user density — the web-scale direction); timestamps stay,
  so the window count is fixed and windows get factor x denser.

The output directory mirrors testdata layout (one ``<table>.parquet``
per table), so ``SPARK_GRAFT_SF_DIR=<dst> python bench.py`` and
``PARITY_SF_DIR=<dst> pytest tests/test_oracle_parity.py`` work
unchanged. Never writes under /root/testdata.
"""

from __future__ import annotations

import argparse
import os

TABLES_COPY = ["region", "nation"]
# parquet row-group sizing: the driver testdata ships single-file
# single-row-group tables, which Spark cannot split — CPU-heavy scan
# stages (shingling, signatures) then run on ONE task no matter the
# core count. Synthesized tiers write many row groups so scans
# parallelize the way a real multi-file 100 TB layout would.
ROW_GROUPS = {"documents": 4096, "embeddings": 2048}
DEFAULT_ROW_GROUP = 65536


def _key_sizes(con, src: str) -> dict[str, int]:
    sizes = {}
    for dom, table, col in [
        ("cust", "customer", "c_custkey"),
        ("ord", "orders", "o_orderkey"),
        ("part", "part", "p_partkey"),
        ("supp", "supplier", "s_suppkey"),
        ("evt", "events", "event_id"),
        ("user", "events", "user_id"),
        ("doc", "documents", "doc_id"),
        ("vec", "embeddings", "vec_id"),
    ]:
        mx = con.execute(
            f"SELECT MAX({col}) FROM '{src}/{table}.parquet'"
        ).fetchone()[0]
        sizes[dom] = int(mx) + 1
    return sizes


def synth(
    src: str, dst: str, factor: int, tables: set[str] | None = None
) -> None:
    """``tables`` restricts output to a subset (still includes the
    copied dims) — the sf100 dedup tier only needs ``documents``
    (~0.6 GB at factor 1000) while a full factor-1000 fact build
    would not fit the container disk. Probes that read a missing
    table fail loudly on the absent parquet path."""
    import duckdb

    if os.path.realpath(dst).startswith("/root/testdata"):
        raise ValueError("refusing to write under /root/testdata")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # Round-11 fix: with preserve_insertion_order (the default) DuckDB
    # MATERIALIZES a COPY's whole input before writing — the factor-1000
    # lineitem replication (600M rows) buffered ~100 GB RSS and never
    # flushed a byte. Row order in the replicated facts is meaningless
    # (Spark repartitions on read), so let the COPY stream; the
    # documents/embeddings writers carry their own ORDER BY, which
    # DuckDB still honors per-query at their much smaller sizes.
    con.execute("SET preserve_insertion_order = false")
    con.execute("SET memory_limit = '32GB'")  # fail loudly, not box-wide
    sz = _key_sizes(con, src)

    def _want(t: str) -> bool:
        return tables is None or t in tables

    for t in TABLES_COPY:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    def _copy(table: str, sql: str) -> None:
        rg = ROW_GROUPS.get(table, DEFAULT_ROW_GROUP)
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )

    # keyed replication: every replica shifts each key domain by i*|D|
    rep = f"range({factor}) r(i)"
    facts = {
        "customer": f"""
            SELECT c_custkey + r.i * {sz['cust']} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet', {rep}""",
        "supplier": f"""
            SELECT s_suppkey + r.i * {sz['supp']} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM '{src}/supplier.parquet', {rep}""",
        "part": f"""
            SELECT p_partkey + r.i * {sz['part']} AS p_partkey, p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM '{src}/part.parquet', {rep}""",
        "orders": f"""
            SELECT o_orderkey + r.i * {sz['ord']} AS o_orderkey,
                   o_custkey + r.i * {sz['cust']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{src}/orders.parquet', {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + r.i * {sz['ord']} AS l_orderkey,
                   l_partkey + r.i * {sz['part']} AS l_partkey,
                   l_suppkey + r.i * {sz['supp']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{src}/lineitem.parquet', {rep}""",
        "events": f"""
            SELECT event_id + r.i * {sz['evt']} AS event_id, ts,
                   user_id + r.i * {sz['user']} AS user_id,
                   event_type, value, props
            FROM '{src}/events.parquet', {rep}""",
    }
    for t, sql in facts.items():
        if _want(t):
            _copy(t, sql)

    if _want("documents"):
        _synth_documents(con, src, dst, factor, sz["doc"])
    if _want("embeddings"):
        _synth_embeddings(con, src, dst, factor, sz["vec"])
    con.close()


def _rename_tokens(text: str, i: int) -> str:
    """Bijective per-replica token rename (w -> w_r<i>): intra-replica
    text structure is isomorphic to the source corpus, cross-replica
    lexical overlap is zero at shingle AND bag-of-words level."""
    sfx = f"_r{i}"
    return " ".join(w + sfx for w in text.split(" "))


def _synth_documents(con, src: str, dst: str, factor: int, ndoc: int) -> None:
    import pandas as pd

    base = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetch_df()
    frames = [
        base.assign(n_chars=base["text"].str.len().astype("int64"))
    ]
    for i in range(1, factor):
        renamed = base["text"].map(lambda t, _i=i: _rename_tokens(t, _i))
        frames.append(
            pd.DataFrame(
                {
                    "doc_id": base["doc_id"] + i * ndoc,
                    "text": renamed,
                    "lang": base["lang"],
                    "source": base["source"],
                    "n_chars": renamed.str.len().astype("int64"),
                }
            )
        )
    allf = pd.concat(frames, ignore_index=True)
    con.register("docs_out", allf)
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source, n_chars FROM docs_out "
        f"ORDER BY doc_id) TO '{dst}/documents.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUPS['documents']})"
    )
    con.unregister("docs_out")


def _synth_embeddings(con, src: str, dst: str, factor: int, nvec: int) -> None:
    import numpy as np
    import pandas as pd

    base = con.execute(
        f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetch_df()
    mat = np.asarray([np.asarray(v, dtype=np.float32) for v in base["embedding"]])
    dim = mat.shape[1]
    frames = []
    for i in range(factor):
        rolled = np.roll(mat, i % dim, axis=1)
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": base["vec_id"] + i * nvec,
                    "embedding": list(rolled),
                    "label": base["label"],
                }
            )
        )
    allf = pd.concat(frames, ignore_index=True)
    con.register("emb_out", allf)
    con.execute(
        f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, "
        f"CAST(label AS INTEGER) AS label FROM emb_out ORDER BY vec_id) "
        f"TO '{dst}/embeddings.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUPS['embeddings']})"
    )
    con.unregister("emb_out")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables",
        default="",
        help="comma-separated subset (e.g. 'documents'); empty = all",
    )
    args = ap.parse_args()
    tables = (
        {t.strip() for t in args.tables.split(",") if t.strip()} or None
    )
    synth(args.src, args.dst, args.factor, tables)
    print(f"wrote {args.dst} (factor {args.factor} of {args.src})")


if __name__ == "__main__":
    main()

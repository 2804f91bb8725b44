"""Upsert merge — the temp→permanent "upsert instead of insert"
contract (`2.2 loading-lambda-for-mysql.py:209-217`, SP call
`2.2:306-316`): on key collision the delta wins; unmatched delta rows
insert; unmatched permanent rows persist.

Plain-Parquet strategy: full-outer join + coalesce (delta side first),
written by deterministic partition overwrite for idempotency (ST3).
On Delta/Iceberg this is literally ``MERGE INTO`` — the API here is the
seam where that upgrade lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(perm: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge ``delta`` into ``perm`` on ``keys``; delta wins. Columns =
    perm's columns (delta must carry them all)."""
    p, d = perm.alias("p"), delta.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"p.{k}") == F.col(f"d.{k}")
        cond = c if cond is None else (cond & c)
    out_cols = []
    for c in perm.columns:
        if c in keys:
            out_cols.append(F.coalesce(F.col(f"d.{c}"), F.col(f"p.{c}")).alias(c))
        else:
            # delta wins whenever the delta row exists (matched on key),
            # even if its value is NULL — key-presence flag, not value
            # coalesce, decides.
            out_cols.append(
                F.when(F.col(f"d.{keys[0]}").isNotNull(), F.col(f"d.{c}"))
                .otherwise(F.col(f"p.{c}"))
                .alias(c)
            )
    return p.join(d, cond, "full_outer").select(*out_cols)

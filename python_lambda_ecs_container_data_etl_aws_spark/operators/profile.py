"""Table profiling — per-column null / distinct / min / max stats.

The reference's only data-quality probe is the A2 row-count compare
(`2.2 loading-lambda-for-mysql.py:300-308`); a production ETL over the
same tables wants the per-column profile (nulls, cardinality, range)
after every load — the ANALYZE-style statistics that drive both data
validation and join planning.

Scale design: ONE aggregation pass PER COLUMN over a column-pruned
scan, unioned at the end. The tempting single-pass alternative —
``agg(count_distinct(c1), count_distinct(c2), ...)`` — compiles to an
Expand that replicates every input row once per distinct-aggregate
(N× the shuffle for N columns), which is exactly wrong at 100 TB.
N tiny scans each reading one parquet column stream keep total I/O
equal to ONE full scan, each with a map-side partial agg, and the
unioned result is N rows. Parquet column chunks make the per-column
scan genuinely cheap; on a row-major source you'd flip the trade.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """Profile each ``name → SQL expression`` entry of ``cols``.

    Output (one row per entry, ordered by caller-side sort on ``col``):
    ``col, n_rows, n_nulls, n_distinct, min_val, max_val`` — min/max
    rendered as strings (profile values of heterogeneous types share
    one schema). Use exact-typed expressions (strings, DECIMAL casts)
    so the string rendering is engine-portable; bare DOUBLE min/max
    would format differently across engines.

    ``n_distinct`` excludes NULLs (ANSI COUNT(DISTINCT) semantics).
    """
    if not cols:
        raise ValueError("profile_columns: cols must be non-empty")
    parts = []
    for name, expr in cols.items():
        v = F.expr(expr)
        parts.append(
            df.select(v.alias("v")).agg(
                F.lit(name).alias("col"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count("v")).alias("n_nulls"),
                F.count_distinct(F.col("v")).alias("n_distinct"),
                F.min("v").cast("string").alias("min_val"),
                F.max("v").cast("string").alias("max_val"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)

"""Skew mitigation helpers — the 100 TB toolbox for hot keys (a
``GEO='Canada'``-like value dominating a join or aggregation).

AQE's skew-join handling (on in session.py) covers sort-merge joins at
runtime; these helpers cover the cases AQE can't re-plan: hot-key
aggregations (two-phase salted agg) and broadcast-ineligible joins
against replicated small sides (salted join).

Both are semantic no-ops: tests assert salted output ≡ unsalted output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    group_cols: list[str],
    sum_col: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-phase aggregation: partial agg on (keys, salt) spreads a hot
    key over ``salt_buckets`` reducers, final agg re-combines. Output:
    group_cols + n_rows + sum_<col> (sum via DECIMAL for determinism).

    The salt is a hash of a per-row unique expression — deterministic,
    no rand() (reproducible plans, stable tests).
    """
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % salt_buckets).alias(
        "__salt"
    )
    partial = (
        df.select(*group_cols, F.col(sum_col).cast("decimal(38,2)").alias("__v"), salt)
        .groupBy(*group_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__v").alias("__s"))
    )
    return (
        partial.groupBy(*group_cols)
        .agg(
            F.sum("__n").alias("n_rows"),
            F.sum("__s").cast("double").alias(f"sum_{sum_col}"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` is too large
    to broadcast: salt the big side (hash of all columns), replicate the
    small side across all buckets (explode), join on (key, salt).
    Row-for-row equivalent to ``big.join(small, key)``.
    """
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salt_buckets)
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return big_s.join(small_s, [key, "__salt"]).drop("__salt")

"""Sketch / approximate aggregation — the 100 TB estimators.

The reference computes exact COUNTs per load (`2.2:300-308`) — fine at
Lambda scale, but distinct-cardinality, quantiles, and membership at
100 TB are sketch problems: exact answers either don't fit (distinct
hash sets) or cost an extra full shuffle (exact percentiles). These
wrappers expose Spark's built-in mergeable sketches with the error
contracts spelled out; each is pytest-gated against its exact twin at
test scale.

All three sketches are ALGEBRAIC (mergeable partial states), so they
map-side combine and their shuffle is O(groups × sketch size), not
O(rows) — the property that makes them the scale path.

- HyperLogLog++ (`approx_count_distinct`): ~rsd relative error on
  cardinality, default 5%.
- KLL-ish quantile sketch (`percentile_approx`): rank error bounded by
  1/accuracy.
- Bloom join pre-filter: Catalyst's InjectRuntimeFilter builds the
  sketch and pushes ``might_contain`` onto the probe-side scan when
  the build side can't broadcast — :func:`bloom_filtered_semi_join`
  is the declarative shape that lets it fire, with a plan test
  proving it does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, keys: list[str], col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group HLL++ cardinality: ``keys + n_distinct_approx``.
    Relative standard deviation ``rsd`` (Spark's default 0.05)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias("n_distinct_approx")
    )


def approx_quantiles_by(
    df: DataFrame,
    keys: list[str],
    col: str,
    probs: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantile sketch: ``keys + q_<pct>...`` columns. Rank
    error ≤ 1/accuracy of the group size."""
    aggs = [
        F.percentile_approx(col, p, accuracy).alias(f"q_{int(p * 100)}")
        for p in probs
    ]
    return df.groupBy(*keys).agg(*aggs)


def bloom_filtered_semi_join(
    big: DataFrame, selective: DataFrame, key: str
) -> DataFrame:
    """Exact semi-join written so the optimizer's runtime Bloom-filter
    injection applies: when ``selective`` is too large to broadcast,
    Catalyst builds ``bloom_filter_agg`` over the selective keys and
    pushes ``might_contain(...)`` onto the big side's scan — non-member
    rows drop BEFORE the sort-merge shuffle, which then only carries
    survivors. When ``selective`` IS broadcastable, the plan degrades
    to the even-better broadcast semi-join. Either way the result is
    exact: the Bloom pass only ever admits false positives, which the
    join removes.

    `bloom_filter_agg`/`might_contain` are planner-internal in Spark
    (the InjectRuntimeFilter rule), not public SQL — expressing the
    semi-join declaratively is what makes the engine do this; a
    hand-built Bloom relation can't (and needn't) beat it. Governing
    confs: ``spark.sql.optimizer.runtime.bloomFilter.enabled`` (default
    true) and the creation/application-side thresholds. The plan test
    asserts the injection actually fires at test scale.
    """
    return big.join(selective, key, "left_semi")


def count_min_counts(
    df: DataFrame,
    col: str,
    query_keys: DataFrame,
    width: int = 1 << 12,
    depth: int = 4,
) -> DataFrame:
    """Count-min frequency estimates for ``query_keys`` over ``df[col]``
    — "how often does each of these tokens/urls/ids appear in 100 TB"
    without a full-cardinality groupBy.

    Sketch build: one pass, ``depth`` seeded xxhash64 rows × ``width``
    buckets — the aggregated state is ``depth × width`` counters
    (mergeable, map-side combined; the shuffle is O(depth · width), not
    O(distinct keys), which is the whole point vs an exact groupBy
    whose hash table scales with the corpus vocabulary). Estimate:
    min over the depth rows of the key's bucket counter — a biased-up
    estimate; error ≤ ε·N (ε ≈ e/width) with prob ≥ 1−(1/e)^depth,
    never an undercount.

    The probe side joins on (row, bucket) against the sketch relation —
    broadcast-sized: depth × width rows at most. Exact top-k (q40)
    stays the contract query; this is the documented estimator for
    vocabularies too large to group exactly.
    """
    seeds = list(range(depth))
    buckets = F.array(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(s)), F.lit(width)).cast("int")
            for s in seeds
        ]
    )
    sketch = (
        df.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probe = query_keys.select(
        F.col(col),
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(col), F.lit(s)), F.lit(width)).cast("int")
                    for s in seeds
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        probe.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("est_count"))
    )

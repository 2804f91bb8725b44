"""Temporal joins Spark lacks as built-ins, composed from DataFrame
primitives (no UDFs, no per-key loops):

- :func:`asof_join` — for each left row, the most recent right row at
  or before its timestamp (per key). The classic trades↔quotes /
  "latest reading as of t" operator. Implemented as the union-window
  trick: tag both sides, union, and run ``last(value, ignoreNulls)``
  over a per-key time-ordered window — ONE shuffle on the key, no
  range self-join, no driver loops. DuckDB expresses the same thing as
  a native ASOF JOIN, which is the oracle for q42.
- :func:`range_join_binned` — interval⋈point containment join at
  scale: exploding each interval into fixed-width time bins and
  equi-joining points on their bin turns the inequality join (which
  Spark would execute as a broadcast-nested-loop) into a hash join
  plus a cheap residual range filter. Bin width trades join fanout
  (intervals × bins covered) against candidate precision.

Reference parity: the reference has no temporal joins (its recency
logic is scalar gates, `2.2:596-611`); these are north-star extension
operators for event/time-series workloads at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str = "ts_us",
    right_time: str = "ts_us",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join (epoch-µs BIGINT times).

    Returns every left row that has a match: all left columns, plus the
    right row's non-key columns and ``__matched_ts_us`` (the matched
    right timestamp). A right non-key column whose name collides with a
    left column comes back suffixed ``__right`` (otherwise the flat
    output would carry two same-named columns and every downstream
    reference would be AMBIGUOUS_REFERENCE). A right row at exactly the
    left time matches (inclusive). ``tolerance_us`` drops matches older
    than ``left_time - tolerance_us``.
    """
    lcols = left.columns
    if "__matched_ts_us" in lcols:
        raise ValueError("left side may not carry a __matched_ts_us column")
    rcols = [c for c in right.columns if c not in on and c != right_time]
    rout = {c: (c + "__right" if c in lcols else c) for c in rcols}
    # pathological right-side names would still collide after the
    # rename (a literal `x__right` next to a renamed `x`, or a column
    # named like the generated match timestamp) — reject rather than
    # emit ambiguous output
    out_names = list(rout.values())
    if "__matched_ts_us" in out_names or len(set(out_names)) != len(out_names):
        raise ValueError(
            f"right-side column names collide after rename: {sorted(rcols)}"
        )
    l2 = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lv"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    *[F.col(c).alias(rout[c]) for c in rcols],
                    F.col(right_time).alias("__matched_ts_us"),
                ).alias("s")
            ).schema["s"].dataType
        ).alias("__rv"),
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("s")).schema["s"].dataType
        ).alias("__lv"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c).alias(rout[c]) for c in rcols],
            F.col(right_time).alias("__matched_ts_us"),
        ).alias("__rv"),
    )
    u = l2.unionByName(r2)
    # right rows (__side=0) sort before left rows at the same instant →
    # inclusive semantics; the window is per-key, time-ordered
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
    out = filled.filter((F.col("__side") == 1) & F.col("__m").isNotNull())
    if tolerance_us is not None:
        out = out.filter(
            F.col("__m.__matched_ts_us") >= F.col("__t") - F.lit(int(tolerance_us))
        )
    return out.select("__lv.*", "__m.*")


def range_join_binned(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    time_col: str = "ts_us",
    keys: list[str] | None = None,
    bin_us: int = 3_600_000_000,
) -> DataFrame:
    """Containment join: every (interval, point) pair with
    ``start <= t <= end`` (and equal ``keys``, if given) — as a hash
    join on time bins instead of an O(N·M) nested loop.

    Each interval explodes into the bins it covers; each point maps to
    its single bin; the equi-join on (keys, bin) produces candidates
    and the exact range predicate filters them. Join cost is
    |points| + Σ interval_bins — linear, shuffle-partitioned by bin, so
    it survives inputs where Spark's own inequality-join strategy
    (BroadcastNestedLoopJoin) would not.
    """
    keys = keys or []
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.expr(f"sequence({start_col} div {bin_us}, {end_col} div {bin_us})")
        ),
    )
    pt = points.withColumn("__bin", F.expr(f"{time_col} div {bin_us}"))
    cond = [iv["__bin"] == pt["__bin"]] + [iv[k] == pt[k] for k in keys]
    joined = iv.join(pt, cond).filter(
        (pt[time_col] >= iv[start_col]) & (pt[time_col] <= iv[end_col])
    )
    return joined.drop(iv["__bin"]).drop(pt["__bin"]).drop(
        *[pt[k] for k in keys]
    )

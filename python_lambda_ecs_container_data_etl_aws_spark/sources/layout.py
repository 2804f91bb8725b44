"""Physical data layout: bucketed tables (co-located joins, bucket
pruning) and Z-order clustering (multi-dimensional locality).

These are the two storage-side levers that cut shuffle and scan cost
at 100 TB *before* any query runs:

- **Bucketing** pre-shuffles a table ONCE at write time. Two tables
  bucketed by their join key with the same bucket count join with
  ZERO exchanges (the scan itself reports hash-partitioned output),
  and an equality predicate on the bucket key prunes to a single
  bucket's files (``SelectedBucketsCount`` in the scan). For the
  reference's repeated fact⋈dim loads (`2.2
  loading-lambda-for-mysql.py` re-joins orders-shaped uploads into
  report tables every batch) this converts a per-run shuffle of the
  big side into a one-time write-side cost — the classic
  write-once/join-many trade.
- **Z-ordering** interleaves the bits of several normalized sort keys
  into one clustering key, so a range predicate on ANY of the keyed
  dimensions maps to a bounded number of contiguous files — where a
  1-D sort gives locality only on its leading column and scatters
  every other dimension across all files. Parquet min/max stats then
  skip whole row groups/files for 2-D box predicates (the
  OPTIMIZE ZORDER layout strategy of lakehouse engines, applied with
  plain DataFrame ops: two-pass min/max + bit-interleave +
  repartitionByRange).

Both writers are side-effecting sinks (SURVEY §2 S-row style):
covered by plan/behavior tests rather than hash-contract queries.

A third lever needs no writer at all: hive-partitioning a fact table
on its date key (plain ``df.write.partitionBy``) lets Spark's dynamic
partition pruning plant a ``dynamicpruningexpression`` inside the
scan's PartitionFilters whenever a FILTERED dim joins on that key —
``tests/test_layout.py`` pins the firing and its DPP-off negative
control.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str | None = None,
    sort: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed by ``keys``.

    Bucketing is the write-once shuffle: rows land in
    ``hash(keys) % n_buckets`` files, the catalog records the spec,
    and every later join/aggregate keyed on ``keys`` against a
    same-bucketed table skips its exchange. ``sort`` additionally
    orders rows inside each bucket (sort-merge joins can then skip
    their sorts when each bucket holds one file).

    ``path`` makes the table external (files land there instead of
    the warehouse dir) — the test-friendly and lake-friendly mode.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, keys[0], *keys[1:])
    if sort:
        w = w.sortBy(sort[0], *sort[1:])
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_keys: list[str],
    right_keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys.

    When both tables were written with :func:`write_bucketed` on
    these keys with the same bucket count, the physical plan contains
    NO Exchange on either side — the scans themselves satisfy the
    join's distribution requirement (asserted in
    ``tests/test_layout.py``). At 100 TB that is the difference
    between shuffling the fact table per query and never shuffling
    it at all.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    cond = reduce(
        lambda a, b: a & b,
        [left[lk] == right[rk] for lk, rk in zip(left_keys, right_keys)],
    )
    return left.join(right, cond, how)


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of pre-normalized integer
    columns into one Morton (Z-order) key.

    ``cols`` must already be non-negative BIGINTs in ``[0, 2**bits)``
    (use :func:`_normalize` / :func:`write_zordered` for raw values).
    Bit ``b`` of column ``i`` lands at position ``b * len(cols) + i``,
    so nearby values in ANY dimension stay nearby in key order. The
    expression is a flat OR chain — whole-stage codegen folds it into
    straight-line integer ops, no UDF.

    ``len(cols) * bits`` must be <= 63 (the usable bits of a signed
    BIGINT): 4+ dimensions need ``bits <= 15``, 5 need 12, etc. —
    the trade is per-dimension grid resolution, not correctness, and
    16 bits/dim is already far below parquet row-group granularity.
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(
            f"zorder_key: {k} columns x {bits} bits = {k * bits} key bits "
            "exceeds the 63 usable bits of a signed BIGINT key; lower "
            "`bits` (e.g. bits=63//len(cols)) or drop a dimension. "
            "Fewer bits per dimension only coarsens locality — rows that "
            "shared a cell still share it."
        )
    one = F.lit(1).cast("bigint")
    terms = [
        (F.shiftright(c, b).bitwiseAND(one) * F.lit(1 << (b * k + i)))
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return reduce(lambda a, t: a + t, terms).cast("bigint")


def _normalize(col: str, cmin: str, cmax: str, bits: int) -> Column:
    """Min-max scale ``col`` to ``[0, 2**bits)`` with EXACT integer math
    at any int64 span — including spans that exceed 2**63 (a column
    mixing large negative and positive extremes), where even the
    subtraction ``max - min`` would wrap in BIGINT.

    All terms are therefore staged through DECIMAL(38,0) (round-6
    review: the first rewrite left ``hi - lo`` in BIGINT, which wraps
    for full-range int64 columns and silently coerced span to 1):
    offset <= span <= ~1.8e19 and ``off * top`` <= span * 65535 ~
    1.2e24, all far inside the 1e38 decimal cap; ``div`` on decimal
    operands is exact integral division returning BIGINT.

    Two branches (round-5 advice — the original cut computed
    ``(col-cmin) * top / span`` with a BIGINT multiply that wrapped
    past span ~7e13 and double division losing bits above 2**53):

    - narrow span (``span <= 2**62/top``): classic min-max scale-up
      ``off * top div span`` — values spread across the full
      ``[0, top]`` grid.
    - wide span: staged scale-DOWN ``off div (span div (top+1) + 1)``
      — the quotient is provably ``<= top`` (step > span/(top+1));
      resolution loss is one part in 2**bits, exactly the grid the
      key keeps anyway.

    Takes column NAMES (not Columns) so the whole expression can be a
    SQL string using the integral ``div`` operator, which has no
    Column-API equivalent.
    """
    top = (1 << bits) - 1
    dec = "DECIMAL(38,0)"
    c, lo, hi = f"`{col}`", f"`{cmin}`", f"`{cmax}`"
    # The value must go through the SAME BIGINT cast as write_zordered's
    # min/max stats (which truncate toward zero) BEFORE the decimal
    # stage. A direct DOUBLE->DECIMAL(38,0) cast ROUNDS, so a fractional
    # column (min=0.4, max=10.6, value=10.6) would give off=11 > span=10
    # — the cell escapes the 2**bits grid and zorder_key keeps only the
    # low bits, wrapping top values to the bottom of the key space
    # (round-6 advice). Truncation is monotonic, so after the shared
    # cast off stays within [0, span] exactly.
    off = f"(CAST(CAST({c} AS BIGINT) AS {dec}) - CAST({lo} AS {dec}))"
    span = f"GREATEST(CAST({hi} AS {dec}) - CAST({lo} AS {dec}), CAST(1 AS {dec}))"
    narrow = (1 << 62) // top
    return F.expr(
        f"CASE WHEN {span} <= {narrow}"
        f" THEN {off} * {top} div {span}"
        f" ELSE {off} div ({span} div {top + 1} + 1) END"
    ).cast("bigint")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    Two passes: (1) one aggregate computes per-column min/max,
    broadcast back as a 1-row scalar attach; (2) rows repartition by
    RANGE of the interleaved key (contiguous key ranges per file) and
    sort within each file, so parquet footer min/max stats on every
    ``cols`` member are tight per file. A box predicate over any
    subset of ``cols`` then touches a bounded fraction of files —
    the locality property ``tests/test_layout.py`` measures against
    a 1-D sorted twin.
    """
    stats = df.agg(
        *[F.min(c).cast("bigint").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("bigint").alias(f"__max_{c}") for c in cols],
    )
    normed = [_normalize(c, f"__min_{c}", f"__max_{c}", bits) for c in cols]
    keyed = (
        df.join(F.broadcast(stats))  # 1-row scalar attach
        .withColumn("__zkey", zorder_key(normed, bits))
        .drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    )
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def write_linear(
    df: DataFrame, path: str, col: str, n_files: int, mode: str = "overwrite"
) -> None:
    """1-D range-sorted layout (the baseline Z-order is measured
    against): contiguous ranges of ``col`` per file — perfect
    locality on ``col``, none on any other column."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )

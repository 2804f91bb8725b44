"""Maintained report table — incremental view maintenance wired into
the ingest lifecycle.

The reference re-runs its full reporting stored procedure after every
load (`2.2 loading-lambda-for-mysql.py:376-398`, logged to
`log_for_reporting` at `2.2:389`): load file → rebuild report. At
100 TB the rebuild, not the load, is the bottleneck — every arriving
5 MiB file re-aggregates the whole fact table. For ADDITIVE measures
(counts, exact-typed sums) the maintained state only needs the
aggregates of (a) the rows the merge replaced and (b) the arriving
delta: ``new = base − retract + delta`` per group
(merge.incremental_agg_merge). Cost scales with the delta and the
number of groups, never the fact table.

The report table itself is |groups|-sized, so a full atomic rewrite of
the report directory per refresh is the cheap part; the win is never
re-scanning the facts.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import incremental_agg_merge


@dataclass(frozen=True)
class ReportSpec:
    """Declares the maintained aggregate: GROUP BY ``group_keys``,
    COUNT(*) AS n_rows, plus one SUM per ``sums`` entry.

    ``sums`` maps output column name → SQL expression over the fact
    columns. Use exact types (CAST(... AS DECIMAL(p,s)) / BIGINT) so the
    retraction subtraction is exact — float sums would drift under
    incremental maintenance.
    """

    group_keys: tuple[str, ...]
    sums: tuple[tuple[str, str], ...] = ()

    @property
    def measures(self) -> list[str]:
        return ["n_rows", *[name for name, _ in self.sums]]


def aggregate_state(df: DataFrame, spec: ReportSpec) -> DataFrame:
    """The report state of ``df``: one row per group with additive
    measures. Used for deltas, retractions, and full rebuilds alike."""
    return df.groupBy(*[F.col(k) for k in spec.group_keys]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.expr(expr)).alias(name) for name, expr in spec.sums],
    )


def _aside_of(final: str) -> str:
    parent, name = os.path.split(final.rstrip("/"))
    return os.path.join(parent, f".{name}__old")


def _recover_dir(final: str) -> None:
    """Heal the one non-atomic window of :func:`_swap_dir`: a crash
    between rename-aside and rename-in leaves ``final`` missing with
    the old state in the aside — restore it. (A present ``final`` plus
    a stale aside means the swap completed; the aside is droppable and
    the next swap scrubs it.)"""
    aside = _aside_of(final)
    if not os.path.isdir(final) and os.path.isdir(aside):
        os.rename(aside, final)


def _swap_dir(staging: str, final: str) -> None:
    """Swap ``staging`` in as ``final``: rename old aside → rename new
    in → drop old (dot-prefixed aside, invisible to any reader that
    lists the parent). Each rename is atomic; the one crash window
    between them is healed by :func:`_recover_dir`, which every reader
    and the next swap run first — so old-or-new, never destroyed."""
    aside = _aside_of(final)
    _recover_dir(final)
    shutil.rmtree(aside, ignore_errors=True)
    if os.path.isdir(final):
        os.rename(final, aside)
    os.rename(staging, final)
    shutil.rmtree(aside, ignore_errors=True)


def refresh_report(
    spark: SparkSession,
    report_dir: str,
    spec: ReportSpec,
    delta_state: DataFrame,
    retract_state: DataFrame | None = None,
    marker_batch_id: int | str | None = None,
) -> None:
    """Fold one load's delta (and the merge's retractions) into the
    maintained report table at ``report_dir``.

    ``retract_state`` is derived from the PRE-merge table: run this
    refresh before the permanent table is rewritten (Spark evaluates
    lazily — pipeline.ingest_file refreshes before its bucket swap),
    or materialize the retract first.

    ``marker_batch_id`` (replay guard — a streaming batch id or a
    pipeline load id) is written into the staging dir as ``_last_batch``
    BEFORE the swap — underscore-prefixed so parquet readers skip it —
    making state and marker flip in the same atomic rename (see
    streaming.runner.refresh_report_once / pipeline.ingest_file).

    A MISSING ``report_dir`` is treated as a first-ever bootstrap: the
    state becomes the delta alone and any retract is ignored. Callers
    maintaining a report over a table that already has history must
    bootstrap explicitly (pipeline.ingest_file recomputes from the
    merged table in that case) — folding a delta into a missing base
    would silently diverge from the facts.
    """
    _recover_dir(report_dir)
    if os.path.isdir(report_dir):
        base = spark.read.parquet(report_dir)
        if retract_state is None:
            retract_state = spark.createDataFrame([], base.schema)
        state = incremental_agg_merge(
            base, retract_state, delta_state, list(spec.group_keys), spec.measures
        )
    else:
        state = delta_state
    # groups whose every row was replaced away retract to n_rows = 0 —
    # they have no surviving facts and leave the report
    state = state.filter(F.col("n_rows") > 0)
    staging = report_dir.rstrip("/") + "__staging"
    state.coalesce(1).write.mode("overwrite").parquet(staging)
    if marker_batch_id is not None:
        with open(os.path.join(staging, "_last_batch"), "w") as fh:
            fh.write(str(marker_batch_id))
    _swap_dir(staging, report_dir)


def last_applied_marker(report_dir: str) -> str | None:
    """The raw ``_last_batch`` marker inside the report dir, or None."""
    _recover_dir(report_dir)
    marker = os.path.join(report_dir, "_last_batch")
    if os.path.isfile(marker):
        with open(marker) as fh:
            return fh.read().strip() or None
    return None


def last_applied_batch(report_dir: str) -> int:
    """The ``_last_batch`` marker as a streaming batch id, or -1 (also
    -1 for a non-numeric pipeline load-id marker)."""
    raw = last_applied_marker(report_dir)
    try:
        return int(raw) if raw is not None else -1
    except ValueError:
        return -1


def read_report(spark: SparkSession, report_dir: str) -> DataFrame:
    return spark.read.parquet(report_dir)

"""Append-only ingest audit log — the reference's `log_for_loading` /
`log_for_reporting` tables (`2.2 loading-lambda-for-mysql.py:273,311,389`),
re-expressed as a partitioned Parquet table (SURVEY §1.1).

Every `ingest_file` outcome (ok, count_mismatch, rejected, skipped)
appends one row; re-running a load appends another row rather than
updating in place — the log is the immutable record the "did
yesterday's load succeed" query reads.

Scale posture: one tiny file per load event, partitioned by log_date so
status queries prune to the days they ask about. At 100 TB-scale load
volume you'd compact small files per day (a nightly coalesce of closed
partitions) — the append contract and schema stay identical.
"""

from __future__ import annotations

import datetime as _dt
import time
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover - import cycle guard (typing only)
    from .pipeline import IngestReport

LOG_SCHEMA = (
    "file STRING, route STRING, loaded_rows BIGINT, bad_rows BIGINT, "
    "status STRING, detail STRING, ts_us BIGINT, log_date STRING"
)


def log_ingest(
    spark: SparkSession,
    log_dir: str,
    report: "IngestReport",
    now_us: int | None = None,
) -> None:
    """Append one audit row for ``report``. ``now_us`` is injectable for
    deterministic tests; defaults to wall-clock."""
    # the write path is a maintenance entry point (single-maintainer
    # contract), so it is the safe place to heal a crashed compaction
    # swap — readers must not (see _heal_log)
    _heal_log(log_dir)
    ts = int(time.time_ns() // 1000) if now_us is None else int(now_us)
    day = _dt.datetime.fromtimestamp(ts / 1e6, tz=_dt.timezone.utc).date().isoformat()
    row = [
        (
            report.file,
            report.route,
            int(report.loaded_rows),
            int(report.bad_rows),
            report.status,
            report.detail,
            ts,
            day,
        )
    ]
    (
        spark.createDataFrame(row, LOG_SCHEMA)
        .coalesce(1)
        .write.mode("append")
        .partitionBy("log_date")
        .parquet(log_dir)
    )


def _heal_log(log_dir: str) -> None:
    """Recover any day partition stranded by a compaction crash (live
    dir renamed aside, staging never renamed in). Partition discovery
    skips the dot-prefixed aside, so without this an interrupted
    compact_log silently removes a whole day from every status query
    until the next maintenance pass heals it. Runs ONLY from the
    maintenance entry points (log_ingest, compact_log, expire_log) —
    never from readers: a status query healing mid-swap would rmtree
    the maintainer's live staging or restore an aside it is about to
    drop. Single-maintainer contract (same as compact_log: closed
    days, no concurrent maintenance)."""
    import os
    import shutil

    if not os.path.isdir(log_dir):
        return
    for entry in list(os.listdir(log_dir)):
        path = os.path.join(log_dir, entry)
        if entry.startswith(".log_date=") and entry.endswith("__old"):
            live = os.path.join(log_dir, entry[1 : -len("__old")])
            if not os.path.isdir(live):
                os.rename(path, live)
            else:
                shutil.rmtree(path, ignore_errors=True)
        elif entry.startswith(".log_date=") and entry.endswith("__staging"):
            shutil.rmtree(path, ignore_errors=True)


def load_ingest_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """The audit table, ready for status queries (partition-pruned on
    log_date). An empty/absent log (fresh deployment, or retention that
    expired every day) reads as zero rows, not a schema-inference
    error: the "did yesterday's load succeed" job must not die on the
    day there is nothing to report. The empty fallback triggers only
    when Spark itself cannot read the path, so remote (s3a/hdfs) logs
    are read normally.

    Readers do NOT heal crashed compaction swaps (that would race the
    maintainer's in-flight swap — see _heal_log): a day stranded by a
    compaction crash reads as ZERO rows for that day until the next
    log_ingest / compact_log / expire_log heals it — so stranded
    dot-prefixed day asides trigger a warning here, making the partial
    read observable without mutating the log dir."""
    import os
    import warnings

    from pyspark.errors import AnalysisException

    if os.path.isdir(log_dir):
        stranded = sorted(
            e
            for e in os.listdir(log_dir)
            if e.startswith(".log_date=") and e.endswith("__old")
        )
        if stranded:
            warnings.warn(
                f"ingest log has {len(stranded)} day partition(s) stranded "
                f"by a crashed compaction ({stranded[0]}...); those days "
                "read as zero rows until the next maintenance pass heals "
                "them",
                stacklevel=2,
            )
    try:
        return spark.read.parquet(log_dir)
    except AnalysisException:
        # fall back to a typed zero-row log ONLY when the path is
        # genuinely absent or holds no day partitions (fresh deployment,
        # full retention); a local dir WITH partitions that still fails
        # to read is real corruption and must fail loudly, not read as
        # "no loads". Remote paths (os checks false) keep the fallback —
        # Spark already failed to read them.
        if os.path.isdir(log_dir) and any(
            e.startswith("log_date=") for e in os.listdir(log_dir)
        ):
            raise
        return spark.createDataFrame([], LOG_SCHEMA)


def status_rollup(log: DataFrame) -> DataFrame:
    """Loads per (log_date, status): the reference's post-load probe
    (`2.2:389` "check log_for_loading for today's status")."""
    from pyspark.sql import functions as F

    return (
        log.groupBy("log_date", "status")
        .agg(
            F.count(F.lit(1)).alias("n_loads"),
            F.sum("loaded_rows").cast("bigint").alias("total_rows"),
            F.sum("bad_rows").cast("bigint").alias("total_bad"),
        )
        .orderBy("log_date", "status")
    )


def compact_log(spark: SparkSession, log_dir: str, log_date: str) -> int:
    """Compact one closed ``log_date`` partition: N one-row appended
    files → one file, atomically swapped in. The nightly small-file
    maintenance the module docstring promises — every `ingest_file`
    appends one tiny parquet file per outcome, which is the right write
    path (no read-modify-write on the hot log) but leaves day
    partitions made of thousands of 1-row files. Returns the number of
    rows compacted.

    Only run on CLOSED days (no concurrent appends): an append racing
    the swap would be lost. Idempotent — re-compacting is a no-op
    rewrite.
    """
    import os
    import shutil

    part = os.path.join(log_dir, f"log_date={log_date}")
    # both work dirs are DOT-prefixed so partition discovery never sees
    # them — an un-prefixed leftover would parse as a malformed
    # log_date value and break every later read
    aside = os.path.join(log_dir, f".log_date={log_date}__old")
    staging = os.path.join(log_dir, f".log_date={log_date}__staging")
    # heal crashes for EVERY day, not just this one
    _heal_log(log_dir)
    if not os.path.isdir(part):
        return 0
    shutil.rmtree(staging, ignore_errors=True)
    rows = spark.read.parquet(part)
    n = rows.count()
    rows.coalesce(1).write.mode("overwrite").parquet(staging)
    # same "never install a failed write" gate as pipeline.compact_table:
    # the staged day must hold every audit row before the swap — a short
    # write must not displace the only copy of a day's audit history
    persisted = spark.read.parquet(staging).count() if n else 0
    if persisted != n:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compact_log aborted: staging holds {persisted} rows for "
            f"log_date={log_date}, expected {n}; live partition untouched"
        )
    shutil.rmtree(aside, ignore_errors=True)
    os.rename(part, aside)
    os.rename(staging, part)
    shutil.rmtree(aside, ignore_errors=True)
    return n


def expire_log(log_dir: str, keep_after: str) -> list[str]:
    """Retention: drop log_date partitions strictly OLDER than
    ``keep_after`` (ISO date string — lexicographic compare is date
    compare). Partition-dir deletes, no data scan. Returns the dropped
    dates."""
    import os
    import shutil

    dropped = []
    if not os.path.isdir(log_dir):
        return dropped
    _heal_log(log_dir)  # restore crashed swaps so retention sees them
    for entry in sorted(os.listdir(log_dir)):
        if not entry.startswith("log_date="):
            continue
        day = entry.split("=", 1)[1]
        if day < keep_after:
            shutil.rmtree(os.path.join(log_dir, entry), ignore_errors=True)
            dropped.append(day)
    return dropped

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


def load_ingest_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """The audit table, ready for status queries (partition-pruned on
    log_date)."""
    return spark.read.parquet(log_dir)


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

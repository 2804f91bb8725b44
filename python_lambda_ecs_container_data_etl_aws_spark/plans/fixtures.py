"""Synthetic ``files`` listing derived deterministically from ``events``
(FIXTURES.md §4) — both engines must see the identical relation, so the
derivation exists once here, rendered to both dialects.

Models the reference's S3-event envelope: filename, bucket, extension,
size and arrival time are what the leader lambda routes on
(`2.1 leader-lambda-for-mysql.py:157-185`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def files_df(events: DataFrame) -> DataFrame:
    """files(filename, bucket, ext, size_mib, ts_us) from events."""
    eid = F.col("event_id")
    sid = eid.cast("string")
    filename = (
        F.when(eid % 5 == 0, F.concat(F.lit("PriceIndex_"), sid, F.lit(".csv")))
        .when(eid % 5 == 1, F.concat(F.lit("some_price_data_"), sid, F.lit(".txt")))
        .when(eid % 5 == 2, F.concat(F.lit("index_values_"), sid, F.lit(".csv")))
        .when(eid % 5 == 3, F.concat(F.lit("unrelated_"), sid, F.lit(".csv")))
        .otherwise(F.concat(F.lit("converted_"), sid, F.lit(".csv")))
    )
    bucket = F.when(eid % 4 == 0, F.lit("backup-bucket")).otherwise(F.lit("upload-bucket"))
    ext = (
        F.when(eid % 3 == 0, F.lit("csv"))
        .when(eid % 3 == 1, F.lit("txt"))
        .otherwise(F.lit("sql"))
    )
    size_mib = (eid % 100).cast("double") / F.lit(10.0)
    return events.select(
        filename.alias("filename"),
        bucket.alias("bucket"),
        ext.alias("ext"),
        size_mib.alias("size_mib"),
        F.col("ts_us"),
    )


# DuckDB CTE body producing the identical relation. events.ts is
# TIMESTAMP (ns truncated to us by the scan); epoch_us matches Spark's
# `ts div 1000` bit-for-bit.
FILES_CTE_SQL = """
    SELECT
        CASE event_id % 5
            WHEN 0 THEN 'PriceIndex_' || CAST(event_id AS VARCHAR) || '.csv'
            WHEN 1 THEN 'some_price_data_' || CAST(event_id AS VARCHAR) || '.txt'
            WHEN 2 THEN 'index_values_' || CAST(event_id AS VARCHAR) || '.csv'
            WHEN 3 THEN 'unrelated_' || CAST(event_id AS VARCHAR) || '.csv'
            ELSE 'converted_' || CAST(event_id AS VARCHAR) || '.csv'
        END AS filename,
        CASE WHEN event_id % 4 = 0 THEN 'backup-bucket' ELSE 'upload-bucket' END AS bucket,
        CASE event_id % 3 WHEN 0 THEN 'csv' WHEN 1 THEN 'txt' ELSE 'sql' END AS ext,
        CAST(event_id % 100 AS DOUBLE) / 10.0 AS size_mib,
        epoch_us(ts) AS ts_us
    FROM events
"""

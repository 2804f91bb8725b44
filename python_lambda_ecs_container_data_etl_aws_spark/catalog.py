"""Loaders for the driver-provided test tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}``.

Scale posture: loaders return plain scans (no .cache()) so Catalyst
can push filters/projections into the parquet reader; at 100 TB the
same code reads a partitioned table directory instead of a single
file and partition pruning applies unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .session import configure

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; ``events`` gets its nanos timestamp normalized.

    Applies the package's runtime confs to the session first — an
    externally-created (driver) session must get the same optimizer
    posture the queries were tuned for (AQE, the
    InferFiltersFromGenerate exclusion), not just the nanos conf that
    events needs for correctness.
    """
    configure(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_us`` (epoch microseconds, BIGINT) replacing ``ts``.

    The parquet stores TIMESTAMP(NANOS); Spark reads it as a long when
    ``spark.sql.legacy.parquet.nanosAsLong`` is on. ``ts div 1000``
    truncates nanos→micros exactly the way DuckDB's scan does, so both
    engines see identical integer instants (verified: sum/min/max of
    epoch_us agree bit-for-bit). Epoch integers also sidestep every
    timezone/format hazard in cross-engine comparison.
    """
    configure(spark)
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.select(
            "event_id",
            F.expr("ts div 1000").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    except Exception:
        # Fallback for sessions where the legacy conf cannot be set:
        # arrow-side conversion. Fine at test scale; at production scale
        # the landing data would be written with micros in the first place.
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{sf_dir}/events.parquet")
        pdf = tbl.to_pandas()
        pdf["ts_us"] = pdf["ts"].astype("int64") // 1000
        pdf = pdf[["event_id", "ts_us", "user_id", "event_type", "value", "props"]]
        return spark.createDataFrame(pdf, schema=_EVENTS_SCHEMA)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql-style plans)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs

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

    The landing file's ``ts`` physical type has varied across driver
    testdata generations — TIMESTAMP(NANOS) (read as BIGINT under
    ``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP(MICROS)
    isAdjustedToUTC=false (read as TIMESTAMP_NTZ), or an adjusted
    TIMESTAMP (read as TIMESTAMP_LTZ) — so we dispatch on the resolved
    Spark type instead of assuming one. All three paths produce the
    same integer instant DuckDB's ``epoch_us(ts)`` yields (session tz
    is pinned UTC, so the NTZ cast is interpretation-free). Epoch
    integers sidestep every timezone/format hazard in cross-engine
    comparison, and the normalization is a zero-shuffle projection the
    scan absorbs.
    """
    configure(spark)
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            ts_us = F.expr("ts div 1000")  # nanosAsLong: truncate nanos→micros
        else:
            # timestamp_ntz under a UTC session tz casts instant-preserving;
            # timestamp (ltz) is already an instant.
            ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        return df.select(
            "event_id",
            ts_us.alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    except Exception:
        # Fallback for sessions where the confs cannot be set: arrow-side
        # conversion. Fine at test scale; at production scale the landing
        # data would be written with micros in the first place.
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{sf_dir}/events.parquet")
        ts = tbl.column("ts")
        unit = ts.type.unit if pa.types.is_timestamp(ts.type) else "ns"
        div = {"s": 1, "ms": 1, "us": 1, "ns": 1000}[unit]
        mul = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[unit]
        import pyarrow.compute as pc

        ts_us = pc.divide(pc.multiply(ts.cast(pa.int64()), mul), div)
        pdf = tbl.to_pandas()
        pdf["ts_us"] = ts_us.to_pandas().astype("int64")
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

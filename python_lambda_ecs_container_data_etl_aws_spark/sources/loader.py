"""CSV ingest with canonical projection and quarantine.

Reference contract being re-expressed (cited, not copied):
- the loader hard-codes the expected column list and re-projects the
  file into that exact order to defend against upstream column
  reordering/addition (`2.2 loading-lambda-for-mysql.py:534-539`);
- malformed rows are tolerated up to ``maxerrors_allowed`` (=5) and
  counted, else the load aborts (`2.1:112`, `2.2:114,308`);
- per-extension delimiter: csv/txt → ',' (`2.1:284-287`);
- ISO-8859-1 tolerated on the raw-count path (`2.2:195-199`);
- unknown files are rejected with notification (`2.1:546-552`) — here,
  a quarantine DataFrame the caller can persist.

Spark shape: one PERMISSIVE read with a corrupt-record column; good
rows are re-projected to canonical order (missing columns become
typed NULLs, extras are dropped); bad rows go to quarantine. The
count-compare commit gate is :func:`validate_counts`.
"""

from __future__ import annotations

import os

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import StringType, StructField, StructType

from .registry import TableSpec

CORRUPT_COL = "_corrupt_record"


@dataclass
class IngestResult:
    good: DataFrame
    quarantine: DataFrame
    src_rows: int
    bad_rows: int
    accepted: bool
    raw: DataFrame | None = None  # the cached scan; release() when done

    def release(self) -> None:
        """Drop the cached raw relation (call after the last action
        over good/quarantine) so repeated loads in one session don't
        accumulate cached file versions."""
        if self.raw is not None:
            self.raw.unpersist()


def read_csv_canonical(
    spark: SparkSession,
    path: str,
    spec: TableSpec,
    sep: str = ",",
    encoding: str = "UTF-8",
    maxerrors: int = 5,
) -> IngestResult:
    """Read a CSV into the canonical column order, quarantining bad rows.

    The read is a single pass: Spark parses permissively, bad lines
    land in ``_corrupt_record``. Canonical projection tolerates column
    reordering and extra columns; missing canonical columns surface as
    NULL (schema drift is observable, not fatal).
    """
    # Pass 1: header only → the file's own column order. Pass 2: full
    # read with an explicit all-string schema + corrupt-record column —
    # PERMISSIVE only captures malformed rows when a schema is given.
    file_cols = (
        spark.read.option("header", True).option("sep", sep).csv(path).limit(0).columns
    )
    schema = StructType(
        [StructField(c, StringType()) for c in file_cols]
        + [StructField(CORRUPT_COL, StringType())]
    )
    # version-stamp the plan before caching: Spark's cache manager
    # matches relations by logical plan, so re-reading the SAME path
    # after its content changed (a daily re-delivered file) would
    # silently return the previous content's cached rows. The stamp
    # (size+mtime literal, dropped below) makes each file version a
    # distinct plan. The cache itself is required — filtering on only
    # the corrupt column from a raw scan is disallowed.
    try:
        stamp = f"{os.path.getsize(path)}:{os.stat(path).st_mtime_ns}"
    except OSError:
        # un-stattable path (remote scheme): a CONSTANT fallback would
        # re-create the aliasing bug for every such path — a unique
        # stamp merely forgoes cache reuse, which fails safe
        import uuid

        stamp = f"uncached:{uuid.uuid4()}"
    raw = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(schema)
        .csv(path)
        .withColumn("__src_version", F.lit(stamp))
    ).cache()
    have = set(file_cols)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop("__src_version")
    projected = good.select(
        *[
            F.col(c) if c in have else F.lit(None).cast("string").alias(c)
            for c in spec.canonical_columns
        ]
    )
    src_rows = raw.count()
    bad_rows = bad.count()
    return IngestResult(
        good=projected,
        quarantine=bad,
        src_rows=src_rows,
        bad_rows=bad_rows,
        accepted=bad_rows <= maxerrors,
        raw=raw,
    )


def validate_counts(src_rows: int, loaded_rows: int, maxerrors: int = 5) -> bool:
    """The reference's commit gate: |source − loaded| within tolerance
    (`2.2:300-308`)."""
    return abs(src_rows - loaded_rows) <= maxerrors

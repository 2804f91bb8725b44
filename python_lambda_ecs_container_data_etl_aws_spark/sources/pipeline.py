"""The §3.1 lifecycle collapsed into one callable — what a user of the
reference actually runs: file arrives → route → read+validate → stage →
merge into the permanent table → archive the input → (report hook).

The reference spreads this over two lambdas, SQS, and five stored
procedures; here it is one driver function over distributed transforms.
Every step delegates to the tested building blocks in this package.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from . import archive as archive_mod
from . import registry
from .idempotent import write_partitioned_idempotent
from .loader import IngestResult, read_csv_canonical, validate_counts
from .merge import upsert


@dataclass
class IngestReport:
    """What the reference returns as {loading_status, error} (`2.2:486-491`)."""

    file: str
    route: str
    loaded_rows: int = 0
    bad_rows: int = 0
    status: str = "ok"
    detail: str = ""
    extras: dict = field(default_factory=dict)


def ingest_file(
    spark: SparkSession,
    file_path: str,
    warehouse_dir: str,
    backup_dir: str | None = None,
    keys: list[str] | None = None,
    maxerrors: int = 5,
) -> IngestReport:
    """Route → canonical read → maxerrors gate → merge (upsert on keys,
    else append-style overwrite) → count-validate → archive.

    Unknown filenames quarantine (status='quarantined'); the converted_
    guard and extension gates behave exactly like q03's routing rules.
    """
    fname = os.path.basename(file_path)
    spec = registry.lookup_table(fname)
    if spec is None:
        route = (
            registry.ROUTE_SKIP_CONVERTED
            if fname.lower().startswith("converted_")
            else registry.ROUTE_QUARANTINE
        )
        return IngestReport(file=fname, route=route, status="skipped")

    res: IngestResult = read_csv_canonical(spark, file_path, spec, maxerrors=maxerrors)
    if not res.accepted:
        return IngestReport(
            file=fname,
            route=spec.table,
            bad_rows=res.bad_rows,
            status="rejected",
            detail=f"{res.bad_rows} bad rows > maxerrors={maxerrors}",
        )

    table_dir = os.path.join(warehouse_dir, spec.table)
    merged_mode = keys is not None and os.path.isdir(table_dir)
    if merged_mode:
        perm = spark.read.parquet(table_dir)
        merged = upsert(perm, res.good, keys)
        # Rewrite via a temp dir: the merge plan reads table_dir, and
        # overwriting a path while scanning it is undefined.
        tmp_dir = table_dir + "__staging"
        merged.write.mode("overwrite").parquet(tmp_dir)
        spark.read.parquet(tmp_dir).write.mode("overwrite").parquet(table_dir)
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
    else:
        res.good.write.mode(
            "append" if os.path.isdir(table_dir) else "overwrite"
        ).parquet(table_dir)

    loaded = spark.read.parquet(table_dir).count()
    # the A2 count gate applies to plain loads; a merge legitimately
    # changes row counts (updates don't add rows)
    ok = merged_mode or validate_counts(res.src_rows - res.bad_rows, loaded, maxerrors)
    report = IngestReport(
        file=fname,
        route=spec.table,
        loaded_rows=loaded,
        bad_rows=res.bad_rows,
        status="ok" if ok else "count_mismatch",
    )
    if backup_dir:
        archive_mod.archive_file(file_path, backup_dir)
    return report

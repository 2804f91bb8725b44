"""Report export — the reporting container's table dump
(`2.3 reporting-lambda-for-mysql.py:113-123`: ``mysql --batch -e
"select * from T"`` → csv → S3), re-expressed as a DataFrame write.

``coalesce(1)`` reproduces the reference's single-CSV-per-report
contract (a static dashboard reads one file). At 100 TB you would NOT
coalesce(1) a fact table — this is for report-sized outputs only; the
``single_file=False`` path writes parallel parts.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame


def export_report_csv(
    df: DataFrame, out_dir: str, single_file: bool = True, compression: str | None = None
) -> str:
    """Write df as CSV with header; returns the part-file path (single
    file mode) or the directory."""
    writer = (df.coalesce(1) if single_file else df).write.mode("overwrite").option(
        "header", True
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(out_dir)
    if single_file:
        parts = glob.glob(os.path.join(out_dir, "part-*.csv*"))
        return parts[0] if parts else out_dir
    return out_dir


def export_report_json(
    df: DataFrame,
    out_dir: str,
    single_file: bool = True,
    compression: str | None = None,
) -> str:
    """Write df as JSON Lines — the dashboard-feed twin of the CSV
    dump (the reference's front end consumes JSON over CloudFront;
    `4 front-end:*` reads per-report JSON documents). Same single-file
    contract and gzip option as :func:`export_report_csv`; returns the
    part-file path (single-file mode) or the directory."""
    writer = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(out_dir)
    if single_file:
        parts = glob.glob(os.path.join(out_dir, "part-*.json*"))
        return parts[0] if parts else out_dir
    return out_dir

"""The §3.1 lifecycle collapsed into one callable — what a user of the
reference actually runs: file arrives → route → read+validate → stage →
merge into the permanent table → archive the input → audit-log the
outcome → (reject hook).

The reference spreads this over two lambdas, SQS, and five stored
procedures; here it is one driver function over distributed transforms.
Every step delegates to the tested building blocks in this package.

Scale design — the permanent table is hash-bucket partitioned:

    table_dir/__bucket=0/..., __bucket=1/..., ...

``__bucket = pmod(xxhash64(keys), n_buckets)`` is derivable from the
merge keys alone, so an arriving delta knows exactly which partitions
it can touch. The merge then
  1. reads ONLY those partitions (partition pruning — untouched buckets
     are never scanned),
  2. upserts the delta into that bounded subset,
  3. writes the result to a staging dir and swaps each touched bucket
     directory in with an atomic rename (crash mid-swap leaves every
     bucket either fully old or fully new — never destroyed; at worst a
     recoverable ``*__old`` dir lingers).
Cost per arriving file is proportional to the delta's bucket fanout,
NOT the table size — the property that keeps a 5 MiB file from
rewriting a 100 TB table. On Delta/Iceberg steps 2-3 collapse into
``MERGE INTO`` behind this same function signature (SURVEY §7).

The A2 count gate (`2.2:300-308`) validates the rows THIS file
delivered (src − bad vs rows staged), never the cumulative table —
comparing a 2-row delta against a billion-row table is meaningless.
"""

from __future__ import annotations

import os
import shutil
import warnings
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import archive as archive_mod
from . import registry
from .audit import log_ingest
from .loader import IngestResult, read_csv_canonical, validate_counts
from .merge import upsert
from .report import ReportSpec, aggregate_state, last_applied_marker, refresh_report

BUCKET_COL = "__bucket"


@dataclass
class IngestReport:
    """What the reference returns as {loading_status, error} (`2.2:486-491`).

    ``loaded_rows`` is the rows delivered by THIS file (the delta), not
    the cumulative table size."""

    file: str
    route: str
    loaded_rows: int = 0
    bad_rows: int = 0
    status: str = "ok"
    detail: str = ""
    extras: dict = field(default_factory=dict)


def _bucket_expr(keys: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def _count_parquet(spark: SparkSession, path: str) -> int:
    """Row count of a written dir — parquet footers only, no data scan.
    The single seam every 'never install a failed write' read-back gate
    goes through (ingest staging, compaction staging)."""
    return spark.read.parquet(path).count()


def _heal_bucket_asides(table_dir: str) -> None:
    """Recover buckets stranded by a crash inside the per-bucket swap
    (bucket renamed aside, staged copy never renamed in): restore the
    aside as the live bucket when the live dir is missing — deleting it
    unconditionally would destroy the only surviving copy, since the
    staged copy is overwritten by the next load's staging write. Runs
    BEFORE any read of the permanent table (the merge's perm scan must
    see the restored rows) and before every swap."""
    if not os.path.isdir(table_dir):
        return
    for entry in list(os.listdir(table_dir)):
        if entry.startswith(".") and entry.endswith("__old"):
            live = os.path.join(table_dir, entry[1 : -len("__old")])
            aside = os.path.join(table_dir, entry)
            if not os.path.isdir(live):
                os.rename(aside, live)
            else:
                shutil.rmtree(aside, ignore_errors=True)
        elif entry.endswith(_LAYOUT_FILE + ".tmp"):
            # a crash between writing and os.replace of the layout tmp
            try:
                os.remove(os.path.join(table_dir, entry))
            except OSError:
                pass


def _swap_bucket_dirs(staging_dir: str, table_dir: str) -> int:
    """Atomically move every ``__bucket=*`` dir from staging into the
    table: rename old aside → rename new in → drop old. Each bucket
    flips in one rename; a crash leaves buckets fully-old or fully-new.

    The aside name is DOT-prefixed (``.__bucket=k__old``): Spark's file
    index skips '.'/'_'-prefixed paths, so a crash-leftover aside dir is
    invisible to partition discovery — an un-prefixed leftover would
    parse as a malformed partition value and fail every later read."""
    os.makedirs(table_dir, exist_ok=True)
    # heal leftovers from any previously interrupted swap (all buckets,
    # not just the ones this delta touches) — restore-or-scrub, never
    # blind delete
    _heal_bucket_asides(table_dir)
    n = 0
    for entry in sorted(os.listdir(staging_dir)):
        if not entry.startswith(f"{BUCKET_COL}="):
            continue
        src = os.path.join(staging_dir, entry)
        dst = os.path.join(table_dir, entry)
        old = os.path.join(table_dir, "." + entry + "__old")
        if os.path.isdir(dst):
            os.rename(dst, old)
        os.rename(src, dst)
        shutil.rmtree(old, ignore_errors=True)
        n += 1
    shutil.rmtree(staging_dir, ignore_errors=True)
    return n


def _is_bucketed(table_dir: str) -> bool:
    return any(e.startswith(f"{BUCKET_COL}=") for e in os.listdir(table_dir))


_LAYOUT_FILE = ".layout.json"


def _read_layout(table_dir: str) -> dict | None:
    import json

    path = os.path.join(table_dir, _LAYOUT_FILE)
    if not os.path.isfile(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _write_layout(table_dir: str, keys: list[str], n_buckets: int) -> None:
    import json

    tmp = os.path.join(table_dir, "." + _LAYOUT_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"keys": list(keys), "n_buckets": int(n_buckets)}, fh)
    os.replace(tmp, os.path.join(table_dir, _LAYOUT_FILE))


def _aside_dir(table_dir: str) -> str:
    parent, base = os.path.split(os.path.abspath(table_dir))
    return os.path.join(parent, "." + base + "__old")


def _heal_unbucketed_swap(table_dir: str) -> None:
    """Recover from a crash inside the whole-table compaction swap.

    Crash window state: the live dir was renamed aside but staging was
    never renamed in — the path is missing while ``.{table}__old``
    holds every row. Restore the aside dir as the live table (the
    interrupted compaction simply retries later) and scrub any stale
    staging; if the swap completed (live dir present), scrub leftovers.
    Without this, the next keyless ingest would see a missing table and
    silently recreate it from one delta while the full history sat
    forever in a hidden sibling."""
    aside = _aside_dir(table_dir)
    if os.path.isdir(aside):
        if not os.path.isdir(table_dir):
            os.rename(aside, table_dir)
        else:
            shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(table_dir + "__compact", ignore_errors=True)


def ingest_file(
    spark: SparkSession,
    file_path: str,
    warehouse_dir: str,
    backup_dir: str | None = None,
    keys: list[str] | None = None,
    maxerrors: int = 5,
    n_buckets: int = 64,
    log_dir: str | None = None,
    on_reject: Callable[[IngestReport], None] | None = None,
    quarantine_dir: str | None = None,
    report_spec: ReportSpec | None = None,
    report_dir: str | None = None,
) -> IngestReport:
    """Route → canonical read → maxerrors gate → merge (bucket-scoped
    upsert on keys, else append) → count-validate → archive → audit.

    Unknown filenames quarantine (status='skipped'); the converted_
    guard and extension gates behave exactly like q03's routing rules.
    ``on_reject`` is the reference's reject-with-notification hook
    (`2.1:546-552`) — called for quarantined and maxerrors-rejected
    files; SNS/email/Slack is the caller's choice, the seam is ours.
    ``log_dir`` appends every outcome to the audit log (audit.py).
    ``quarantine_dir`` persists malformed source lines (raw_line +
    source file) so rejected data is inspectable, not just counted —
    written for BOTH outcomes: the bad rows of an accepted load and the
    full bad set of a rejected one.
    ``report_spec``/``report_dir`` maintain an incremental report table
    alongside the load — the reference's load→rebuild-report loop
    (`2.2:376-398`) with the rebuild made delta-scoped
    (report.refresh_report): the retraction state is aggregated from
    exactly the rows the merge replaces, the delta state from this
    file's rows, and the fact table is never re-scanned.
    """

    res: IngestResult | None = None

    def _finish(report: IngestReport, rejected: bool = False) -> IngestReport:
        if res is not None:
            res.release()  # drop this file version's cached scan
        if log_dir:
            log_ingest(spark, log_dir, report)
        if rejected and on_reject is not None:
            on_reject(report)
        return report

    fname = os.path.basename(file_path)
    spec = registry.lookup_table(fname)
    if spec is None:
        route = (
            registry.ROUTE_SKIP_CONVERTED
            if fname.lower().startswith("converted_")
            else registry.ROUTE_QUARANTINE
        )
        return _finish(
            IngestReport(file=fname, route=route, status="skipped"),
            rejected=route == registry.ROUTE_QUARANTINE,
        )

    res = read_csv_canonical(spark, file_path, spec, maxerrors=maxerrors)
    if quarantine_dir and res.bad_rows > 0:
        (
            res.quarantine.withColumn("source_file", F.lit(fname))
            .write.mode("append")
            .parquet(quarantine_dir)
        )
    if not res.accepted:
        return _finish(
            IngestReport(
                file=fname,
                route=spec.table,
                bad_rows=res.bad_rows,
                status="rejected",
                detail=f"{res.bad_rows} bad rows > maxerrors={maxerrors}",
            ),
            rejected=True,
        )

    table_dir = os.path.join(warehouse_dir, spec.table)
    # crashes interrupted mid-swap must be healed BEFORE the existence
    # check and the merge's permanent-table scan below — otherwise this
    # load would recreate the table from one delta (whole-table swap)
    # or merge without a stranded bucket's rows (per-bucket swap)
    _heal_unbucketed_swap(table_dir)
    _heal_bucket_asides(table_dir)
    # Per-file A2 gate, two halves:
    #  - parse gate (the reference's maxerrors semantics): src rows
    #    minus bad rows vs what the canonical read produced;
    #  - write gate: the files THIS load physically wrote, read back
    #    (parquet footers — no data scan), must hold the rows the plan
    #    claimed. Comparing the plan against itself would be a
    #    tautology; the read-back catches lost/partial writes, and
    #    every count is bounded by the delta/touched buckets, never the
    #    table.
    loaded = res.good.count()
    extras: dict = {}
    write_ok = True

    # Report maintenance ordering + crash recovery: the incremental
    # refresh runs BEFORE the table swap (its retract state reads the
    # pre-merge table) and carries a per-load marker, so the designed
    # recovery — re-running the same file after a crash — converges:
    # a crash before the refresh re-derives the same retract from the
    # unchanged table; a crash after it (mid- or pre-swap) skips the
    # already-applied refresh via the marker and the idempotent merge
    # heals the table. The marker is a high-water guard for the
    # immediate-retry case; re-running an OLD file after newer loads
    # re-applies (use a bootstrap/recompute to repair — see below).
    rdir = report_dir or table_dir + "__report"
    # the marker id must distinguish a crash REPLAY of this physical
    # file (same inode, same mtime — refresh already applied, skip)
    # from a NEW drop that happens to reuse yesterday's filename and
    # row counts (daily re-delivery with updated values — refresh must
    # apply). Name+counts alone cannot tell those apart.
    st = os.stat(file_path)
    load_id = (
        f"{fname}|{res.src_rows}|{res.bad_rows}|{st.st_size}|{st.st_mtime_ns}"
    )
    table_existed = os.path.isdir(table_dir)
    # A missing report over a table WITH history (first enablement, or
    # operational loss) cannot be folded incrementally — bootstrap by
    # full recompute from the merged table after the swap instead.
    bootstrap_report = (
        report_spec is not None and table_existed and not os.path.isdir(rdir)
    )

    def _refresh_incremental(pre_merge: DataFrame | None) -> None:
        if report_spec is None or bootstrap_report:
            return
        if last_applied_marker(rdir) == load_id:
            return  # crash-recovery re-run: refresh already landed
        retract = None
        if pre_merge is not None:
            replaced = pre_merge.join(
                res.good.select(*keys).distinct(), keys, "left_semi"
            )
            retract = aggregate_state(replaced, report_spec)
        refresh_report(
            spark,
            rdir,
            report_spec,
            delta_state=aggregate_state(res.good, report_spec),
            retract_state=retract,
            marker_batch_id=load_id,
        )

    if keys is not None:
        # the bucket function is part of the table's physical layout:
        # honoring a DIFFERENT n_buckets on a later load would hash the
        # delta into buckets the existing rows don't occupy — the merge
        # would never see the old copy of a key and the table would end
        # up with duplicate keys, silently. The layout file wins; a
        # keys mismatch rejects the load through the normal path (audit
        # row + on_reject + cache release), like every other failure.
        layout = _read_layout(table_dir) if table_existed else None
        if layout is not None:
            if list(layout["keys"]) != list(keys):
                return _finish(
                    IngestReport(
                        file=fname,
                        route=spec.table,
                        bad_rows=res.bad_rows,
                        status="rejected",
                        detail=(
                            f"table is bucketed on keys={layout['keys']}, "
                            f"load requested keys={list(keys)}"
                        ),
                    ),
                    rejected=True,
                )
            n_buckets = int(layout["n_buckets"])
        elif table_existed and _is_bucketed(table_dir):
            # pre-layout table: the caller's n_buckets is a CLAIM, not a
            # record. Validate it against the stored bucket values once
            # (one scan — a one-time migration event) before adopting it
            # into .layout.json; a wrong claim rejected here is a
            # re-runnable error, a wrong claim adopted is permanent
            # silent duplicate-key corruption.
            mismatched = (
                spark.read.parquet(table_dir)
                .filter(_bucket_expr(keys, n_buckets) != F.col(BUCKET_COL))
                .limit(1)
                .count()
            )
            if mismatched:
                return _finish(
                    IngestReport(
                        file=fname,
                        route=spec.table,
                        bad_rows=res.bad_rows,
                        status="rejected",
                        detail=(
                            f"existing bucket layout does not match "
                            f"n_buckets={n_buckets}/keys={list(keys)}; pass "
                            "the values the table was created with"
                        ),
                    ),
                    rejected=True,
                )
        delta = res.good.withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
        if loaded == 0:
            # Empty accepted delta (header-only file, or every bad row
            # quarantined within maxerrors): nothing to merge, and the
            # staging overwrite below would hold no part files — the
            # read-back verification would then die on parquet schema
            # inference instead of reporting a clean zero-row load.
            # Short-circuit: no write, no swap, no migration (a legacy
            # unbucketed table migrates on its next non-empty load).
            extras["persisted_rows"] = 0
            extras["buckets_touched"] = 0
        elif table_existed and _is_bucketed(table_dir):
            # Bucket-scoped merge: only partitions the delta hashes into
            # are read, merged, and swapped. Everything else: untouched.
            touched = sorted(
                r[BUCKET_COL]
                for r in delta.select(BUCKET_COL).distinct().collect()
            )
            perm = spark.read.parquet(table_dir).filter(
                F.col(BUCKET_COL).isin(touched)
            )
            _refresh_incremental(perm)
            merged = upsert(perm, delta, keys).persist()
            staging = table_dir + "__staging"
            # cluster by bucket before the partitioned write: the merge
            # join shuffles on the MERGE KEYS, so without this every
            # write task holds rows of many buckets and each bucket dir
            # gets one file per task — small-file accretion that at
            # scale turns scans into file-open storms. One bucket → one
            # task → one file.
            (
                merged.repartition(max(len(touched), 1), F.col(BUCKET_COL))
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(staging)
            )
            expected = merged.count()  # cached — no join re-run
            persisted = _count_parquet(spark, staging)
            merged.unpersist()
            write_ok = persisted == expected
            extras["persisted_rows"] = persisted
            if write_ok:
                extras["buckets_touched"] = _swap_bucket_dirs(staging, table_dir)
                if layout is None:
                    _write_layout(table_dir, keys, n_buckets)  # legacy adopt
            else:
                # NEVER install a staging write that lost rows: the old
                # buckets are the only good copy, and aborting here is
                # fully recoverable (idempotent merge + marker retry)
                shutil.rmtree(staging, ignore_errors=True)
                extras["buckets_touched"] = 0
        else:
            if table_existed:
                # legacy unbucketed layout: one-time migration
                old = spark.read.parquet(table_dir).withColumn(
                    BUCKET_COL, _bucket_expr(keys, n_buckets)
                )
                _refresh_incremental(old)
                delta = upsert(old, delta, keys)
            else:
                _refresh_incremental(None)
            staging = table_dir + "__staging"
            migrated = table_existed
            if migrated:
                delta = delta.persist()
            (
                delta.repartition(n_buckets, F.col(BUCKET_COL))
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(staging)
            )
            # fresh table: delta rows == loaded by construction (the
            # bucket column adds no rows) — only the migration merge
            # needs its own expected count
            expected = delta.count() if migrated else loaded
            persisted = _count_parquet(spark, staging)
            if migrated:
                delta.unpersist()
            write_ok = persisted == expected
            extras["persisted_rows"] = persisted
            if write_ok:
                extras["buckets_touched"] = _swap_bucket_dirs(staging, table_dir)
                _write_layout(table_dir, keys, n_buckets)
            else:
                shutil.rmtree(staging, ignore_errors=True)
                extras["buckets_touched"] = 0
    else:
        _refresh_incremental(None)
        before_files = (
            {f for f in os.listdir(table_dir) if f.endswith(".parquet")}
            if table_existed
            else set()
        )
        res.good.write.mode(
            "append" if table_existed else "overwrite"
        ).parquet(table_dir)
        new_files = [
            os.path.join(table_dir, f)
            for f in os.listdir(table_dir)
            if f.endswith(".parquet") and f not in before_files
        ]
        persisted = (
            spark.read.parquet(*new_files).count() if new_files else 0
        )
        write_ok = persisted == loaded
        extras["persisted_rows"] = persisted
        if not write_ok:
            # roll the append back to the pre-load state — a partial
            # write must not linger in the live table
            if table_existed:
                for f in new_files:
                    try:
                        os.remove(f)
                    except OSError:
                        pass
            else:
                shutil.rmtree(table_dir, ignore_errors=True)

    if bootstrap_report:
        merged_facts = spark.read.parquet(table_dir)
        if BUCKET_COL in merged_facts.columns:
            merged_facts = merged_facts.drop(BUCKET_COL)
        refresh_report(
            spark,
            rdir,
            report_spec,
            delta_state=aggregate_state(merged_facts, report_spec),
            marker_batch_id=load_id,
        )

    ok = validate_counts(res.src_rows - res.bad_rows, loaded, maxerrors) and write_ok
    report = IngestReport(
        file=fname,
        route=spec.table,
        loaded_rows=loaded,
        bad_rows=res.bad_rows,
        status="ok" if ok else "count_mismatch",
        detail="" if write_ok else "persisted rows != staged rows",
        extras=extras,
    )
    if backup_dir:
        archive_mod.archive_file(file_path, backup_dir)
    return _finish(report)


def stranded_asides(table_dir: str) -> list[str]:
    """Mutation-free detection of crash-window swap leftovers: the
    whole-table aside (sibling ``.<table>__old``) and any per-bucket
    asides (dot-prefixed ``*__old`` entries inside the table dir).
    A non-empty result means the live table is silently PARTIAL until
    the next maintenance entry point heals it."""
    out = []
    parent_aside = _aside_dir(table_dir)
    if os.path.isdir(parent_aside):
        out.append(parent_aside)
    if os.path.isdir(table_dir):
        for entry in sorted(os.listdir(table_dir)):
            if entry.startswith(".") and entry.endswith("__old"):
                out.append(os.path.join(table_dir, entry))
    return out


def read_permanent(
    spark: SparkSession, warehouse_dir: str, table: str, strict: bool = False
) -> DataFrame:
    """The permanent table without the internal layout column.

    Readers never mutate the table dir: healing an interrupted swap
    from here would race the single maintainer's own mid-flight swap
    (rmtree its live staging, or restore an aside it is about to drop).
    Crash recovery runs only from the maintenance entry points —
    ``ingest_file``, ``compact_table`` — so a read landing inside the
    crash window of a *whole-table* swap fails loudly on the missing
    path (and heals on the next ingest/compaction); a crashed
    *per-bucket* swap reads the surviving buckets (asides are
    dot-prefixed, invisible to partition discovery) until healed.

    That crash window is OBSERVABLE here without mutating anything:
    stranded aside dirs trigger a warning (default) so a caller knows
    the result may be missing a bucket, or a ``RuntimeError`` under
    ``strict=True`` for jobs that must not consume partial tables."""
    table_dir = os.path.join(warehouse_dir, table)
    asides = stranded_asides(table_dir)
    if asides:
        msg = (
            f"table '{table}' has {len(asides)} stranded swap aside(s) "
            f"from a crashed maintenance pass ({asides[0]}...); reads may "
            "be partial until the next ingest/compaction heals them"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=2)
    df = spark.read.parquet(table_dir)
    return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df


def compact_table(
    spark: SparkSession,
    table_dir: str,
    max_files_per_bucket: int = 1,
) -> int:
    """Merge the small files incremental ingestion accretes: every
    bucket-scoped upsert writes at least one new file per touched
    bucket, so a bucket that receives a daily 2-row delta is a thousand
    tiny files after three years — and scan cost at 100 TB is dominated
    by file-open overhead, not bytes.

    Only buckets whose file count exceeds ``max_files_per_bucket`` are
    read (partition pruning keeps every healthy bucket untouched — same
    contract as the merge itself); each is rewritten as one file per
    bucket (``repartition(n, bucket)`` maps a bucket to exactly one
    task) and swapped in atomically via the same rename protocol as
    ingest, so a crash mid-compaction never loses a bucket. Returns the
    number of buckets compacted.

    Unbucketed tables (the keyless append path — one new file per
    appended load) compact as a whole: rewrite to ``max_files_per_bucket``
    files in staging, then rename the live dir aside and the staging
    dir in. A crash between those two renames leaves the table
    recoverable in the aside dir; :func:`_heal_unbucketed_swap` (run on
    entry here AND by ``ingest_file``) restores it before anything else
    reads or recreates the path — so the swap is crash-SAFE (never
    loses data), though not single-rename atomic like the per-bucket
    protocol.

    The audit-log twin is :func:`audit.compact_log` (date-partitioned);
    this one owns the ingest pipeline's permanent tables.
    """
    _heal_unbucketed_swap(table_dir)
    _heal_bucket_asides(table_dir)
    if not os.path.isdir(table_dir):
        return 0
    if not _is_bucketed(table_dir):
        n_files = sum(1 for f in os.listdir(table_dir) if f.endswith(".parquet"))
        if n_files <= max_files_per_bucket:
            return 0
        staging = table_dir + "__compact"
        src = spark.read.parquet(table_dir)
        expected = src.count()
        src.repartition(max_files_per_bucket).write.mode("overwrite").parquet(
            staging
        )
        # Same "never install a failed write" gate as ingest_file: the
        # read-back (parquet footers only) must hold every pre-compaction
        # row before the live dir is replaced — a silently short write
        # must never displace good data.
        persisted = (
            _count_parquet(spark, staging) if expected else 0
        )
        if persisted != expected:
            shutil.rmtree(staging, ignore_errors=True)
            raise RuntimeError(
                f"compact_table aborted: staging holds {persisted} rows, "
                f"expected {expected}; live table left untouched"
            )
        aside = _aside_dir(table_dir)
        shutil.rmtree(aside, ignore_errors=True)
        os.rename(table_dir, aside)
        os.rename(staging, table_dir)
        shutil.rmtree(aside, ignore_errors=True)
        return 1
    todo: list[int] = []
    for entry in sorted(os.listdir(table_dir)):
        if not entry.startswith(f"{BUCKET_COL}="):
            continue
        n_files = sum(
            1
            for f in os.listdir(os.path.join(table_dir, entry))
            if f.endswith(".parquet")
        )
        if n_files > max_files_per_bucket:
            todo.append(int(entry.split("=", 1)[1]))
    if not todo:
        return 0
    oversized = spark.read.parquet(table_dir).filter(
        F.col(BUCKET_COL).isin(todo)
    )
    expected = oversized.count()
    staging = table_dir + "__compact"
    (
        oversized.repartition(len(todo), F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(staging)
    )
    # read-back gate before the per-bucket swap, mirroring ingest_file:
    # count the staged rows for the touched buckets (footer-only scan)
    # against the pre-compaction count and abort on mismatch
    persisted = _count_parquet(spark, staging) if expected else 0
    if persisted != expected:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compact_table aborted: staging holds {persisted} rows for "
            f"buckets {todo}, expected {expected}; live buckets untouched"
        )
    return _swap_bucket_dirs(staging, table_dir)

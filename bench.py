"""Benchmark runner: executes the declared query catalog at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Output contract (round 3): a per-query
detail JSON line first, then a compact (<200 byte) machine-parseable
summary line LAST — {"metric", "value", "unit", "sf", "n_queries",
"n_errors"} — because the driver tail-captures stdout and a 70+-query
single line outgrew it. The full payload also lands in bench_out.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES
from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark


def digest_plan(df):
    """The LAZY digest reduction of a result DataFrame — exposed
    separately from :func:`digest_frame` so tests/test_bench_digest.py
    asserts the Sort-preservation property on the SAME expression tree
    production collects from (round-10 ADVICE: an inline re-build in
    the test could drift and keep passing while production digests
    silently lost the sort stage again)."""
    # per-row hash over EVERY output column (string-cast: engine-
    # stable for the bit-deterministic contract types). Each value is
    # preceded by its isnull flag — xxhash64 SKIPS null arguments, so
    # without the flag two rows differing only in WHICH column is
    # NULL would fold to the same input stream (round-9 ADVICE).
    parts = []
    for c in df.columns:
        parts.append(F.isnull(F.col(c)).cast("int"))
        parts.append(F.col(c).cast("string"))
    h = F.xxhash64(*parts)
    # Two order-insensitive accumulators: bit_xor alone is blind to
    # even multiplicities of identical rows ({A,A,B} vs {B,B,B} —
    # same count, same XOR); the wrapping sum of the 31-bit-folded
    # hash breaks that class (safe from ANSI overflow to ~4e9 rows).
    # The __rid projection is load-bearing, not debris: a
    # NONDETERMINISTIC projection between the query's final orderBy
    # and this aggregate stops EliminateSorts from recursing through,
    # so the global sort (and its range exchange) stays in the
    # measured plan. The count references __rid through a predicate
    # Catalyst cannot fold (plain count(__rid) gets rewritten to
    # count(1) on the non-nullable column, the column pruned, and the
    # sort eliminated after all — pinned in tests/test_bench_digest);
    # monotonically_increasing_id() >= 0 always holds, so n is still
    # the exact row count.
    return df.select(
        h.alias("__h"),
        F.monotonically_increasing_id().alias("__rid"),
    ).agg(
        F.count(F.when(F.col("__rid") >= 0, True)).alias("n"),
        F.bit_xor("__h").alias("x"),
        F.sum(F.pmod("__h", F.lit(2147483647))).alias("s"),
    )


def digest_frame(df) -> list[int]:
    """Executor-side digest of a result DataFrame: [row count,
    order-insensitive bit_xor of per-row xxhash64, wrapping sum of the
    31-bit-folded hash] — ``collect()`` of :func:`digest_plan`.

    FORMAT HISTORY (do NOT diff digests across the break): rounds ≤9
    emitted ``[n, xor]`` with no null-position flags; round 10 added
    the wrapping-sum accumulator and per-column isnull flags (round-9
    ADVICE), so a round-10+ digest never matches a round-≤9 digest
    even for bit-identical results. Cross-round digest comparison is
    only valid within the same format generation (BENCH_SF30_DIGEST_r10
    onward)."""
    row = digest_plan(df).collect()[0]
    return [int(row["n"]), int(row["x"] or 0), int(row["s"] or 0)]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0  # unconventional dir name: still emit a parseable payload
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # SPARK_GRAFT_ONLY=q26_...,q100_... restricts the run to a named
    # subset — the scale-tier heavy-tail probes (sf30) re-measure the
    # top-N expensive queries without paying a full 192-query catalog
    # at every decade. Unknown names fail loudly: a silently-skipped
    # probe query would read as "measured fine". Off by default; the
    # driver's per-round run is unaffected.
    only = os.environ.get("SPARK_GRAFT_ONLY", "")
    queries = dict(QUERIES)
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in queries]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_ONLY names not in catalog: {unknown}")
        queries = {n: queries[n] for n in names}

    # Warm EVERY query's codegen shape at sf0.001 before timing: C2
    # compilation of the big generated methods (signature folds, literal
    # matrices) is 3-10s per shape and lands nondeterministically on
    # whichever run triggers it — q26 measured 8.2s cold vs 2.4s steady
    # in the same session. Warming on a DIFFERENT (tiny) dataset keeps
    # the timed pass honest: JIT warm, measured data cold, cache cleared.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(
        sf_dir.rstrip("/")
    ):
        for name in sorted(queries):
            try:
                queries[name](spark, warm_dir).collect()
            except Exception:
                pass
            spark.catalog.clearCache()
        # The tiny warm dataset runs mapInPandas on 1-2 partitions, so
        # only 1-2 Python workers exist when timing starts and whichever
        # sf0.1 query first needs all of them pays the ~4s pool spawn.
        # Spin up one worker per core before the timed pass.
        n = spark.sparkContext.defaultParallelism
        spark.range(n * 10, numPartitions=n).toDF("v").mapInPandas(
            lambda it: it, schema="v bigint"
        ).collect()
    else:
        # No separate warm dataset: minimal warm of the shared engine
        # paths (scan/join/agg/window, interpreted HOFs, Python workers)
        # without giving any measured query a silent second run. Warm
        # failures must not kill the run before any timing/error output
        # exists (e.g. a bad SF dir should still yield an errors payload).
        for warm_name in (
            "q01_ingest_count",
            "q04_recency_window",
            "q11_latest_version_dedup",
        ):
            try:
                QUERIES[warm_name](spark, sf_dir).collect()
            except Exception:
                break  # dataset unusable: the timed pass will record it
        spark.range(1000).selectExpr(
            "aggregate(transform(sequence(0, 50), i -> concat('t', i)),"
            " cast(0 as bigint), (a, v) -> a + length(v))"
        ).collect()
        spark.range(1000).toDF("v").mapInPandas(
            lambda it: it, schema="v bigint"
        ).collect()

    errors: dict[str, str] = {}

    # --- collect-free digest mode (SPARK_GRAFT_DIGEST=1) --------------
    # Round-8 finding: the contract's collect() is itself the scale
    # bottleneck for fact-sized results — q100's 60M-row sf30 history
    # trips spark.driver.maxResultSize (1 GiB), and collect-GC inflates
    # collect-inclusive exponents (q34 α 1.86 vs 0.76 compute-only). A
    # cluster pipeline writes to a sink; it never funnels a fact table
    # through the driver. With the flag set, every query reduces to
    # (row count, order-insensitive XOR + wrapping sum of per-row
    # xxhash64) computed EXECUTOR-side — full computation, every
    # shuffle INCLUDING the final global sort (a nondeterministic
    # projection blocks EliminateSorts — see run_once), nothing pruned
    # (all output columns + null flags feed the hash), one row to the
    # driver — and the digests land in the payload so two digest runs
    # are comparable. Off by default: the driver's per-round sf0.1 run
    # keeps the byte-identical collect-inclusive contract.
    digest_mode = os.environ.get("SPARK_GRAFT_DIGEST", "") == "1"
    digests: dict[str, list[int]] = {}

    # --- optional per-query memory audit (SPARK_GRAFT_MEMCHECK) -------
    # Round-7 verdict: the sf10 catalog needed a 48 GiB driver heap and
    # the steady-state footprint was unattributed. With
    # SPARK_GRAFT_MEMCHECK=1 record, per query: the G1 Old Gen PEAK
    # (what actually pressures the heap — long-lived join/window/
    # broadcast structures promote there), storage-memory residual
    # after clearCache (unpersist is async and broadcast blocks are
    # only freed by the ContextCleaner after a driver GC, so residual
    # growth here = GC-lagged broadcasts, not a persist leak), and the
    # persistent-RDD count (must be 0 — a nonzero is a real leak).
    # SPARK_GRAFT_MEMCHECK=gc additionally forces a driver System.gc()
    # after each query: if residuals return to ~0 under gc mode, the
    # footprint is reclaimable GC lag, not retention. Off by default —
    # the driver's per-round run is byte-identical.
    memcheck = os.environ.get("SPARK_GRAFT_MEMCHECK", "")
    memstats: dict[str, list[int]] = {}
    if memcheck:
        _jvm = spark.sparkContext._jvm
        _mm = _jvm.org.apache.spark.SparkEnv.get().memoryManager()
        _pools = _jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
        _old = next(
            _pools.get(i)
            for i in range(_pools.size())
            if "Old Gen" in _pools.get(i).getName()
        )

    def _mem_before() -> None:
        if memcheck:
            _old.resetPeakUsage()

    def _mem_after(name: str) -> None:
        if not memcheck:
            return
        if memcheck == "gc":
            _jvm.java.lang.System.gc()
        mib = 1 << 20
        memstats[name] = [
            int(_old.getPeakUsage().getUsed()) // mib,
            int(_mm.storageMemoryUsed()) // mib,
            int(_mm.executionMemoryUsed()) // mib,
            spark.sparkContext._jsc.getPersistentRDDs().size(),
        ]

    def run_once(name: str) -> float:
        # start marker BEFORE the query runs: when a scale run dies
        # mid-query (JVM OOM kills the py4j bridge before any payload
        # prints) the crashing query is attributed directly by the last
        # start line, not inferred as "the one after the last finish"
        # (round-7 ADVICE: the finish-only marker left the live query
        # implicit).
        print(f"[bench] start {name}", file=sys.stderr, flush=True)
        _mem_before()
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if digest_mode:
                # see digest_frame: null-flagged per-row xxhash64,
                # XOR + wrapping-sum accumulators, sort kept in plan
                digests[name] = digest_frame(df)
            else:
                # collect() uniformly: count() would let Catalyst prune
                # unused projection columns and under-measure wide queries
                _ = len(df.collect())
        except Exception as exc:  # one broken query must not lose the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        elapsed = round(time.perf_counter() - t0, 3)
        # operators persist intermediates (shingles, signatures, ranged
        # partitions) whose lifetime is the consuming action — drop them
        # so 69 queries in one session don't accumulate cached blocks
        spark.catalog.clearCache()
        _mem_after(name)
        return elapsed

    timings: dict[str, float] = {}
    failed_elapsed: dict[str, float] = {}
    for name in sorted(queries):
        timings[name] = run_once(name)
        # finish marker (start marker printed inside run_once): a dead
        # run's log shows the live query directly — round 7 lost an
        # sf10 attribution to exactly this gap.
        print(f"[bench] {name} {timings[name]}s", file=sys.stderr, flush=True)

    # A failed query's time-to-failure is neither the healthy-catalog
    # time nor comparable across runs: pull it out before the outlier
    # median and the total so error runs stay comparable to clean runs.
    for name in errors:
        if name in timings:
            failed_elapsed[name] = timings.pop(name)

    # Noise guard: this container shares hardware, and exogenous load
    # spikes have measured a single arbitrary query 10x slower in one
    # run and fine in the next (q38 18.9s vs a 1.8s steady-state probe
    # seconds later). Re-run only the outliers (>= 3x the catalog
    # median, floored at 5s) once and keep the min — steady-state cost
    # is the quantity that predicts cluster throughput; a one-off CPU
    # steal is not. Bounded extra cost: only outliers re-run.
    # (guard: if EVERY query errored — bad SF dir — timings is empty
    # and the median is undefined; skip straight to the error payload
    # so the driver still gets a diagnosable line, not a crash)
    med = sorted(timings.values())[len(timings) // 2] if timings else 0.0
    for name, t in list(timings.items()):
        if t >= max(5.0, 3 * med) and name not in errors:
            had_error = set(errors)
            t2 = run_once(name)
            if name in errors and name not in had_error:
                errors.pop(name)  # first run succeeded; discard the
                # transient re-run failure along with its timing
            else:
                timings[name] = min(t, t2)

    # Re-runs can add new errored names; sweep once more.
    for name in errors:
        if name in timings:
            failed_elapsed[name] = timings.pop(name)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "catalog_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
    }

    # Compute/transfer split for the heavy tail (round-5 verdict item
    # 3): the bench collect()s by contract, so wide-output queries
    # carry a driver-transfer cost a cluster sink would not (q100 at
    # sf3: 5.9 s compute vs ~26 s collect-inclusive). With
    # SPARK_GRAFT_COMPUTE_SPLIT=N set (scale-tier runs), re-run the N
    # most expensive queries into a noop sink — full computation, all
    # shuffles, zero driver transfer — and record both numbers so the
    # artifacts stop conflating engine cost with transfer. Off by
    # default: the driver's per-round run stays byte-compatible.
    try:
        split_n = int(os.environ.get("SPARK_GRAFT_COMPUTE_SPLIT", "0") or 0)
    except ValueError:
        split_n = 0  # malformed flag must not lose the finished timed pass
    if split_n > 0 and timings:
        compute: dict[str, float] = {}
        for name in sorted(timings, key=timings.__getitem__, reverse=True)[
            :split_n
        ]:
            t0 = time.perf_counter()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                compute[name] = round(time.perf_counter() - t0, 3)
            except Exception:
                compute[name] = -1.0  # sentinel: split unavailable
            spark.catalog.clearCache()
        payload["compute"] = compute
    if digest_mode:
        payload["digest_mode"] = True
        payload["digests"] = digests
    if memstats:
        # [old_gen_peak_mib, storage_after_mib, exec_after_mib, n_rdds]
        # per query, plus the catalog-level invariants the audit exists
        # to check: executor storage must return to ~0 between queries
        # and nothing may stay persisted.
        payload["memcheck"] = {
            "mode": memcheck,
            "per_query": memstats,
            "max_old_gen_peak_mib": max(v[0] for v in memstats.values()),
            "max_storage_residual_mib": max(v[1] for v in memstats.values()),
            "max_exec_residual_mib": max(v[2] for v in memstats.values()),
            "n_queries_with_persistent_rdds": sum(
                1 for v in memstats.values() if v[3] > 0
            ),
        }
    if errors:
        payload["errors"] = errors
        payload["failed_elapsed"] = failed_elapsed
    # Full payload to a file (the single-line form outgrew the driver's
    # tail capture at 71 queries — BENCH_r02 recorded "parsed": null).
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json")
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    # Per-query detail first (human/file readers), then the driver's
    # machine-parsed line LAST and guaranteed compact (< 200 bytes).
    print(json.dumps({"queries": timings, "errors": errors}))
    summary = {
        "metric": "catalog_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
    }
    line = json.dumps(summary)
    if len(line) >= 200:
        # Never die before the driver's machine-parsed line is printed
        # (a missing final line IS the "parsed: null" failure this
        # contract exists to prevent) — drop optional keys until the
        # line fits, minimal core last.
        for drop in ("unit", "n_queries", "n_errors", "sf"):
            summary.pop(drop, None)
            line = json.dumps(summary)
            if len(line) < 200:
                break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()

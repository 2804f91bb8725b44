"""Catalog-run memory hygiene — the round-8 verdict item 1 invariant,
made permanent: on a real cluster the driver must stay small (SURVEY §4
— executors hold the data), so after every catalog query the driver
JVM must release everything the query held.

Runs the FULL query catalog at the tiny test SF and checks, per query
(collect → clearCache, the exact bench.py lifecycle):

- ``getPersistentRDDs()`` is empty — a nonzero count is a real persist
  leak (an operator persisted an intermediate and no consuming action
  owned its unpersist);
- execution memory is 0 — nothing holds Tungsten pages between
  queries;
- storage memory returns to ~0 once a driver GC lets the
  ContextCleaner collect dangling ``Broadcast`` refs (broadcast torrent
  blocks count as storage and are freed asynchronously AFTER the GC
  enqueues the refs, hence the settle poll). Checked at checkpoints
  rather than per query: per-query forced full GCs would triple the
  test's wall clock for no extra signal — a leak that survives the
  next checkpoint's GC is still caught, attributed to a ≤48-query
  window.

The sf10 attribution runs live in BASELINE.md (Round 8); this test is
the cheap always-on twin that keeps the invariant from regressing.
"""

from __future__ import annotations

import time

from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES

from tests.conftest import SF_DIR

# storage residual allowed after GC + settle. Measured floor (round
# 8): the residual is broadcast blocks whose ``Broadcast`` refs the
# ContextCleaner frees asynchronously after a GC enqueues them — a
# repeat-loop experiment shows it OSCILLATES (10-200 MiB depending on
# which queries ran last) and does not grow, the same bounded shape
# the 48 GiB sf10 profile showed (BASELINE.md Round 8). A real leak
# accumulates linearly: 192 queries of pinned broadcasts would blow
# through 512 MiB while the lag floor stays 1-2 queries deep.
_STORAGE_SETTLE_MIB = 512
_CHECKPOINT_EVERY = 48


def _storage_settles(spark, jvm, mm, limit_mib: int, timeout_s: float = 10.0):
    """Force a driver GC, then poll for the ContextCleaner to drain."""
    deadline = time.monotonic() + timeout_s
    while True:
        jvm.java.lang.System.gc()
        mib = int(mm.storageMemoryUsed()) >> 20
        if mib <= limit_mib or time.monotonic() >= deadline:
            return mib
        time.sleep(0.5)


def test_catalog_releases_memory_between_queries(spark):
    sc = spark.sparkContext
    jvm = sc._jvm
    mm = jvm.org.apache.spark.SparkEnv.get().memoryManager()

    leaks: dict[str, str] = {}
    names = sorted(QUERIES)
    for i, name in enumerate(names, start=1):
        QUERIES[name](spark, SF_DIR).collect()
        spark.catalog.clearCache()
        n_rdds = sc._jsc.getPersistentRDDs().size()
        if n_rdds:
            leaks[f"{name}:persist"] = (
                f"{n_rdds} persistent RDDs after clearCache"
            )
        exec_mib = int(mm.executionMemoryUsed()) >> 20
        if exec_mib:
            leaks[f"{name}:exec"] = (
                f"{exec_mib} MiB execution memory retained"
            )
        if i % _CHECKPOINT_EVERY == 0 or i == len(names):
            mib = _storage_settles(spark, jvm, mm, _STORAGE_SETTLE_MIB)
            if mib > _STORAGE_SETTLE_MIB:
                leaks[f"checkpoint@{name}"] = (
                    f"{mib} MiB storage memory survives GC + settle "
                    f"(window: previous {_CHECKPOINT_EVERY} queries)"
                )
    assert not leaks, leaks

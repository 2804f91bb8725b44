"""Per-stage task-metric probe for scale-tier attribution (round-9
verdict item 1).

Round 8 measured q111's compute exponent at α≈1.4-1.5 sf10→sf30 and
hypothesized sort/join spill of the shingle-set relation; the heap
sweep was inconclusive (16g≈32g wall). Wall-clock alone cannot
separate (a) genuine execution-memory spill (disk/memory
BytesSpilled > 0, grows with tier), (b) GC pressure (jvmGcTime share
grows), and (c) cache-locality / pure-CPU superlinearity (spill ≈ 0,
executorCpuTime tracks wall). This tool runs catalog queries into a
noop sink and attributes every new stage via the Spark UI REST API
(``/api/v1/applications/<id>/stages`` — the same metrics a cluster's
history server exposes), printing per-query totals and the top
stages by executor time with their spill/shuffle/GC numbers.

    SPARK_GRAFT_UI=1 python tools/spill_probe.py \
        --sf-dir /tmp/sfsynth/sf30 \
        --queries q111_setsim_prefix_join,q71_containment,q163_token_idf

Prints one JSON line last (artifact-ready). Requires SPARK_GRAFT_UI=1
(the session factory keeps the UI off otherwise).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES
from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark

_STAGE_FIELDS = (
    "executorRunTime",
    "executorCpuTime",
    "jvmGcTime",
    "memoryBytesSpilled",
    "diskBytesSpilled",
    "peakExecutionMemory",
    "inputBytes",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "numTasks",
)


def _api(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _app_id(port: int) -> str:
    return _api(port, "applications")[0]["id"]


def _stages(port: int, app: str) -> list[dict]:
    # COMPLETE+FAILED (never RUNNING — a live row would double-count
    # on the next snapshot diff): a stage that fails mid-query (the
    # OOM case the per-query JSON flush guards against) still did its
    # spill/GC work and must count toward that query's attribution
    # (round-9 ADVICE: complete-only silently undercounted).
    rows = _api(port, f"applications/{app}/stages?status=complete")
    rows += _api(port, f"applications/{app}/stages?status=failed")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sfsynth/sf30")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--top-stages", type=int, default=6)
    args = ap.parse_args()

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"not in catalog: {unknown}")
    if os.environ.get("SPARK_GRAFT_UI") != "1":
        raise SystemExit("set SPARK_GRAFT_UI=1 (REST metrics need the UI)")

    spark = get_spark("spill-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # Derive the port from THIS session's bound UI, not the configured
    # one: spark.ui.port is a starting point and Spark auto-increments
    # on conflict (a leftover JVM on 4050 would silently point the
    # probe at a stale/foreign app's REST endpoint — round-9 ADVICE).
    ui_url = spark.sparkContext.uiWebUrl
    if not ui_url:
        raise SystemExit("session has no UI bound despite SPARK_GRAFT_UI=1")
    port = int(ui_url.rsplit(":", 1)[-1])
    app = _app_id(port)

    def run_noop(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        return round(time.perf_counter() - t0, 3)

    for name in names:  # JIT warm (same rationale as bench.py)
        try:
            run_noop(name, args.warm_dir)
        except Exception as exc:
            print(f"[spill] WARM FAILED {name}: {exc!r}", file=sys.stderr)

    out = {"sf_dir": args.sf_dir, "queries": {}}
    for name in names:
        print(f"[spill] {name}", file=sys.stderr, flush=True)
        seen = {s["stageId"] for s in _stages(port, app)}
        wall = run_noop(name, args.sf_dir)
        # the UI store ingests listener events asynchronously; settle
        # briefly so the final stages are COMPLETE before the snapshot
        time.sleep(2.0)
        new = [s for s in _stages(port, app) if s["stageId"] not in seen]
        tot = {f: sum(int(s.get(f) or 0) for s in new) for f in _STAGE_FIELDS}
        tot["peakExecutionMemory"] = max(
            (int(s.get("peakExecutionMemory") or 0) for s in new), default=0
        )
        top = sorted(
            new, key=lambda s: int(s.get("executorRunTime") or 0), reverse=True
        )[: args.top_stages]
        out["queries"][name] = {
            "wall_sec": wall,
            "n_stages": len(new),
            "totals": tot,
            "top_stages": [
                {
                    "stageId": s["stageId"],
                    "name": (s.get("name") or "")[:120],
                    **{f: int(s.get(f) or 0) for f in _STAGE_FIELDS},
                }
                for s in top
            ],
        }
        t = out["queries"][name]
        # one JSON line per query IMMEDIATELY — a later query's OOM
        # (it shares the local-mode JVM) must not lose earlier
        # attributions (learned the hard way: the round-9 sf30 run
        # died on its third query with two finished results unwritten)
        print(json.dumps({"query": name, **out["queries"][name]}), flush=True)
        print(
            f"[spill] {name} wall={wall}s stages={len(new)} "
            f"memSpill={tot['memoryBytesSpilled']>>20}MiB "
            f"diskSpill={tot['diskBytesSpilled']>>20}MiB "
            f"gc={tot['jvmGcTime']/1000:.1f}s "
            f"cpu={tot['executorCpuTime']/1e9:.1f}s "
            f"run={tot['executorRunTime']/1000:.1f}s",
            file=sys.stderr,
            flush=True,
        )
        _ = t
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

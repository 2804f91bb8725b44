"""Driver-visible recall artifact for the two no-oracle catalog rows
(round-9 verdict item 6).

q27 (hyperplane-LSH ANN) and q35 (IVF ANN) are approximate BY DESIGN —
seeded random hyperplanes and float k-means cell means are not
SQL-reproducible, so the driver's CORRECTNESS row records
``no_oracle`` forever and their quality evidence lived only in
pytest's recall gates. This probe closes the loop outside pytest: it
runs the exact catalog callables (same parameters, same corpus) and
scores recall@k against the float-exact brute-force top-k
(:func:`similarity.brute_force_topk`, the q23 semantics) at each
requested tier, then writes one artifact JSON (``RECALL_r{N}.json``)
the judge can read next to CORRECTNESS.

    python tools/recall_probe.py --out RECALL_r10.json \
        --sf-dirs /root/testdata/sf0.01,/root/testdata/sf0.1

Recall is computed per query id over candidate-id sets at the
contract k (3), then averaged; the per-query minimum is also recorded
so one silently-dead query cannot hide behind nine perfect ones.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from python_lambda_ecs_container_data_etl_aws_spark.catalog import load_table
from python_lambda_ecs_container_data_etl_aws_spark.operators import similarity
from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES
from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark

_K = 3  # the q27/q35 contract k


def _topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(int(r["query_id"]), set()).add(int(r["cand_id"]))
    return out


def _recall(ann: dict[int, set[int]], exact: dict[int, set[int]]) -> dict:
    per_q = {
        q: len(ann.get(q, set()) & cands) / len(cands)
        for q, cands in exact.items()
        if cands
    }
    vals = sorted(per_q.values())
    return {
        "k": _K,
        "n_queries": len(per_q),
        "mean_recall": round(sum(vals) / len(vals), 4) if vals else None,
        "min_recall": round(vals[0], 4) if vals else None,
        "per_query": {str(q): round(v, 4) for q, v in sorted(per_q.items())},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs", default="/root/testdata/sf0.01,/root/testdata/sf0.1"
    )
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    spark = get_spark("recall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    payload: dict = {"contract_k": _K, "tiers": {}}
    for sf_dir in [d.strip() for d in args.sf_dirs.split(",") if d.strip()]:
        emb = load_table(spark, sf_dir, "embeddings")
        t0 = time.perf_counter()
        exact = _topk_sets(
            similarity.brute_force_topk(
                emb, emb.filter(F.col("vec_id") < 10), k=_K
            ).collect()
        )
        tier = {}
        for name in ("q27_ann_lsh_topk", "q35_ann_ivf_topk"):
            ann = _topk_sets(QUERIES[name](spark, sf_dir).collect())
            tier[name] = _recall(ann, exact)
        tier["wall_sec"] = round(time.perf_counter() - t0, 3)
        payload["tiers"][sf_dir] = tier
        spark.catalog.clearCache()
        print(f"[recall] {sf_dir}: " + json.dumps(tier), file=sys.stderr)

    line = json.dumps(payload)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()

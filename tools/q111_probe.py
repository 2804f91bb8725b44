"""q111 intermediate-volume probe (round-9 verdict item 1).

The sf30 task-metric run (tools/spill_probe.py) attributes q111's
α≈1.4-1.5 to the candidate-generation stage: CPU grew 22× sf10→sf30
while its shuffle output grew only 2.9× — so the raw prefix-join
MATCH volume (pre-aggregation) is the suspect, not the exchanged
bytes. This probe measures every intermediate volume of the
prefix_filtered_pairs pipeline at one tier:

- ranked-token / prefix-posting counts (linear checkpoints),
- the ANALYTIC raw-match upper bound Σ_h c_h·(c_h-1)/2 over prefix
  posting lists (cheap aggregate, no join) + the posting histogram —
  the quantity that decides quadratic vs linear candidate generation,
- the EXACT raw match count (runs the self-join with a count sink —
  no per-pair exchange, isolating join CPU from shuffle write),
- candidates after the positional filter, final verified pairs.

    python tools/q111_probe.py --sf-dir /tmp/sfsynth/sf10

Prints one JSON line last (artifact-ready).
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
from python_lambda_ecs_container_data_etl_aws_spark.operators import dedup
from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark

_T10 = 6  # q111 contract threshold (plans/platform.py)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sfsynth/sf10")
    ap.add_argument(
        "--skip-exact-matches",
        action="store_true",
        help="skip the exact raw-match count join (the expensive step)",
    )
    args = ap.parse_args()

    spark = get_spark("q111-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, args.sf_dir, "documents")
    shingles = F.expr(
        "transform(sequence(1, size(toks) - 2),"
        " i -> concat_ws(' ', slice(toks, i, 3)))"
    )
    ts = (
        d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.explode(shingles).alias("tok"))
    )

    out: dict = {"sf_dir": args.sf_dir, "t10": _T10}

    def timed(label: str, fn):
        t0 = time.perf_counter()
        v = fn()
        out[f"{label}_sec"] = round(time.perf_counter() - t0, 3)
        out[label] = v
        print(
            f"[q111] {label}={v} ({out[f'{label}_sec']}s)",
            file=sys.stderr,
            flush=True,
        )
        return v

    thw = dedup._pf_ranked(ts, "doc_id", "tok").persist()
    timed("n_ranked_tokens", thw.count)
    out["n_docs"] = d.count()
    pfx = dedup._pf_prefixes(thw, _T10, "doc_id").persist()
    timed("n_prefix_postings", pfx.count)

    # analytic raw-match bound from posting-list sizes: Σ c·(c-1)/2
    # (the a<b self-match volume BEFORE the length filter) — a single
    # cheap aggregate that decides quadratic vs linear
    occ = pfx.groupBy("__h").agg(F.count(F.lit(1)).alias("c")).persist()
    hist = (
        occ.select(F.floor(F.log2("c")).cast("int").alias("log2_c"), "c")
        .groupBy("log2_c")
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.sum(F.expr("c * (c - 1) / 2")).cast("bigint").alias("pairs"),
        )
        .orderBy("log2_c")
        .collect()
    )
    out["posting_hist"] = [
        {
            "log2_c": r["log2_c"],
            "n_hashes": r["n_hashes"],
            "pairs": int(r["pairs"]),
        }
        for r in hist
    ]
    out["raw_match_bound"] = int(sum(r["pairs"] for r in hist))
    out["max_posting_len"] = occ.agg(F.max("c")).collect()[0][0]
    occ.unpersist()
    print(
        f"[q111] raw_match_bound={out['raw_match_bound']} "
        f"max_posting={out['max_posting_len']}",
        file=sys.stderr,
        flush=True,
    )

    if not args.skip_exact_matches:
        # exact raw matches (post length filter, pre positional agg):
        # count sink — partial counts only, no per-pair exchange
        a = pfx.select(
            F.col("doc_id").alias("a_id"),
            "__h",
            F.col("n").alias("na"),
        )
        b = pfx.select(
            F.col("doc_id").alias("b_id"),
            "__h",
            F.col("n").alias("nb"),
        )
        timed(
            "n_raw_matches",
            a.join(b, "__h")
            .filter(
                (F.col("a_id") < F.col("b_id"))
                & (
                    10 * F.least("na", "nb")
                    >= _T10 * F.greatest("na", "nb")
                )
            )
            .count,
        )

    # candidates + pair-keyed verify measure the SUPERSEDED round-8
    # path (the attribution target); the live operator verifies
    # inline and is timed end-to-end below
    cand = dedup._pf_candidates(pfx, _T10, "doc_id").persist()
    timed("n_candidates", cand.count)
    sets = dedup._pf_sets(thw, "doc_id").persist()
    timed(
        "n_final_pairs_old_path",
        dedup._pf_verify(cand, sets, _T10, "doc_id").count,
    )
    for rel in (cand, sets, pfx, thw):
        rel.unpersist()
    spark.catalog.clearCache()
    timed(
        "n_final_pairs_live",
        dedup.prefix_filtered_pairs(ts, threshold_tenths=_T10).count,
    )
    spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

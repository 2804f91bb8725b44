"""Compare two bench_out.json payloads from different scale factors
and report per-query scaling: ratio = t_hi / t_lo and the implied
exponent alpha = log(ratio) / log(sf_hi / sf_lo) (alpha 1.0 = linear,
<1 = sublinear / fixed-overhead amortizing, >1 = superlinear — the
red flag the sf1 tier exists to raise).

    python tools/scaling_report.py /tmp/bench_out_sf01.json \
        /tmp/bench_out_sf1.json [--flag 1.3]

Prints one line per shared query sorted by alpha descending, then a
summary block. Queries faster than --floor (default 0.5 s) at BOTH
scales are exempt from flagging: their runtime is dominated by fixed
planning/launch overhead, so the exponent is noise.
"""

from __future__ import annotations

import argparse
import json
import math


def load(path: str) -> tuple[float, dict[str, float]]:
    with open(path) as f:
        p = json.load(f)
    return float(p["sf"]), dict(p["queries"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lo")
    ap.add_argument("hi")
    ap.add_argument("--flag", type=float, default=1.3,
                    help="flag queries with alpha above this")
    ap.add_argument("--floor", type=float, default=0.5,
                    help="ignore queries faster than this at both scales")
    args = ap.parse_args()
    sf_lo, q_lo = load(args.lo)
    sf_hi, q_hi = load(args.hi)
    scale = sf_hi / sf_lo
    rows = []
    for name in sorted(set(q_lo) & set(q_hi)):
        tl, th = q_lo[name], q_hi[name]
        if tl <= 0 or th <= 0:
            continue
        ratio = th / tl
        alpha = math.log(ratio) / math.log(scale)
        rows.append((alpha, ratio, tl, th, name))
    rows.sort(reverse=True)
    flagged = []
    print(f"# scaling {sf_lo} -> {sf_hi} ({scale:g}x data), "
          f"{len(rows)} shared queries")
    print(f"{'alpha':>6} {'ratio':>7} {'t_lo':>8} {'t_hi':>8}  query")
    for alpha, ratio, tl, th, name in rows:
        mark = ""
        if alpha > args.flag and max(tl, th) >= args.floor:
            mark = "  <-- SUPERLINEAR"
            flagged.append(name)
        print(f"{alpha:6.2f} {ratio:7.2f} {tl:8.2f} {th:8.2f}  {name}{mark}")
    tot_lo = sum(r[2] for r in rows)
    tot_hi = sum(r[3] for r in rows)
    agg_alpha = math.log(tot_hi / tot_lo) / math.log(scale)
    print(f"\ntotal: {tot_lo:.1f}s -> {tot_hi:.1f}s "
          f"(ratio {tot_hi / tot_lo:.2f}, aggregate alpha {agg_alpha:.2f})")
    print(f"flagged (alpha > {args.flag}, above {args.floor}s): "
          f"{flagged or 'none'}")


if __name__ == "__main__":
    main()

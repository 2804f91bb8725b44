"""BIGINT-overflow horizon audit: run every oracle at two scale
factors in DuckDB, measure per-column max|value| growth, and
extrapolate the scale factor at which each column would cross 2^63.

q09's checksum overflowed at ~sf1 and was only caught by actually
running that tier; this audit finds such horizons by extrapolation
instead — any column whose max grows with data size has a finite
crossing point, and the report ranks the nearest ones.

    python tools/overflow_audit.py [--lo /root/testdata/sf0.01]
        [--hi /root/testdata/sf0.1] [--horizon-warn 1000]

For each oracle column (integer-typed), prints the growth exponent
g = log(max_hi/max_lo)/log(sf_hi/sf_lo) and the extrapolated crossing
SF* = sf_hi * (LIMIT/max_hi)^(1/g) for g > 0.1; warns when SF* is
within --horizon-warn multiples of sf_hi. Columns that do not grow
(ratios, ppm, bounded codes) have no horizon.
"""

from __future__ import annotations

import argparse
import math
import sys

sys.path.insert(0, "/root/repo")

LIMIT = float(2**63 - 1)


def column_maxes(con, sql: str) -> dict[str, float]:
    rel = con.sql(sql)
    out = {}
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if t in ("BIGINT", "INTEGER", "HUGEINT", "SMALLINT", "UBIGINT"):
            try:
                q = rel.aggregate(f'MAX(ABS(CAST("{col}" AS HUGEINT)))')
                v = q.fetchone()[0]
            except Exception:
                continue
            if v is not None:
                out[col] = float(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default="/root/testdata/sf0.01")
    ap.add_argument("--hi", default="/root/testdata/sf0.1")
    ap.add_argument("--sf-lo", type=float, default=0.01)
    ap.add_argument("--sf-hi", type=float, default=0.1)
    ap.add_argument("--horizon-warn", type=float, default=1000.0,
                    help="warn when crossing SF is within this multiple of sf_hi")
    args = ap.parse_args()

    import duckdb

    from python_lambda_ecs_container_data_etl_aws_spark.catalog import TABLE_NAMES
    from python_lambda_ecs_container_data_etl_aws_spark.plans import ORACLE

    def connect(sf_dir):
        con = duckdb.connect()
        con.execute("SET memory_limit='24GB'")
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con

    con_lo, con_hi = connect(args.lo), connect(args.hi)
    scale = args.sf_hi / args.sf_lo
    rows = []
    errors = []
    for name in sorted(ORACLE):
        try:
            lo = column_maxes(con_lo, ORACLE[name])
            hi = column_maxes(con_hi, ORACLE[name])
        except Exception as e:
            errors.append((name, f"{type(e).__name__}: {e}"[:120]))
            continue
        for col in sorted(set(lo) & set(hi)):
            ml, mh = lo[col], hi[col]
            if mh <= 0 or ml <= 0:
                continue
            g = math.log(mh / ml) / math.log(scale)
            if g <= 0.1:  # bounded column: no horizon
                continue
            sf_cross = args.sf_hi * (LIMIT / mh) ** (1.0 / g)
            rows.append((sf_cross, g, mh, name, col))
    rows.sort()
    print(f"# overflow horizons ({args.sf_lo} -> {args.sf_hi}); "
          f"LIMIT=2^63; {len(rows)} growing integer columns")
    print(f"{'SF*':>12} {'growth':>7} {'max@hi':>12}  query.column")
    warned = []
    for sf_cross, g, mh, name, col in rows[:25]:
        mark = ""
        if sf_cross < args.horizon_warn * args.sf_hi:
            mark = "  <-- WITHIN HORIZON"
            warned.append(f"{name}.{col}")
        print(f"{sf_cross:12.1f} {g:7.2f} {mh:12.3g}  {name}.{col}{mark}")
    print(f"\nwarned (SF* < {args.horizon_warn}x sf_hi): {warned or 'none'}")
    if errors:
        print(f"errors: {errors}")


if __name__ == "__main__":
    main()

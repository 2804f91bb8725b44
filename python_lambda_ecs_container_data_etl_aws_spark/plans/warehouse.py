"""Decision-support queries q163-q182: the classic warehouse shapes
(TPC-H Q7/Q8/Q9/Q10/Q11/Q12/Q14/Q15/Q17/Q18/Q21/Q22 analogues, adapted
to this testdata's schema — no partsupp / l_shipmode / l_commitdate /
c_phone, so lateness derives from ``l_shipdate - o_orderdate``, supply
cost from ``p_retailprice``, and the Q22 country-code from nation) plus
a referential-integrity audit. The reference's report tier (SURVEY.md
§2 A3/A4; `3.(2) mysql-lambda-ecs-container-etl.py` report routes)
parameterizes grouped revenue aggregates over exactly this star schema;
these are the standard decision-support analyses one step downstream,
and — the engineering point — they exercise the one Catalyst surface
the first 162 queries did not: **correlated-subquery decorrelation**
(EXISTS / NOT EXISTS / scalar-subquery HAVING), asserted in
``tests/test_plans_quality.py`` to rewrite into semi/anti/broadcast
joins with zero CartesianProduct.

Exact-arithmetic discipline (cross-engine hash contract):

- money lands as DOUBLE with sub-cent noise; ``CAST(x AS
  DECIMAL(38,2))`` is the one correctly-rounded conversion both
  engines perform identically (functions.dec_sum rationale), and
  ``* 100 -> BIGINT`` yields exact integer cents.
- discounted revenue is kept in **cent-percent units** (cents x
  (100 - disc_pct), "cp"): l_discount is hundredths by construction,
  so ``(100 - 100*disc)`` is an exact integer factor and every
  revenue sum is an integer — no float SUM ordering hazard.
- all sums run as ``SUM(CAST(x AS DECIMAL(38,0)))`` then cast BIGINT:
  Spark's SUM(BIGINT) wraps non-ANSI on overflow, DuckDB's widens to
  HUGEINT — the decimal stage makes both exact to 1e38. Per-line cp
  <= ~1e9, so the BIGINT output cap binds near 9e9 summed lines (~
  absolute SF 1.5e3, >100 TB) — documented horizon, decimal escape.
- ratios (market share, promo share) are single truncating ``div`` /
  ``//`` divisions on non-negative operands, staged through
  DECIMAL(38,0) on Spark and **HUGEINT on DuckDB** — DuckDB's ``//``
  over DECIMAL routes through DOUBLE and drifts by ±1 above 2^53
  (caught in this family's first parity run); 128-bit integer
  operands keep both engines exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import ORACLE, _q, _t
from .evalsuite import _md5i_spark, _md5i_sql

# Exact integer cents from a 2-decimal money DOUBLE (see module doc).
def _cents_sql(x: str) -> str:
    return f"CAST(CAST({x} AS DECIMAL(38,2)) * 100 AS BIGINT)"


def _cents(x: str) -> F.Column:
    return F.expr(_cents_sql(x))


# Discounted line revenue in cent-percent units (exact BIGINT).
_REV_CP_SQL = (
    f"({_cents_sql('l_extendedprice')}"
    f" * (100 - {_cents_sql('l_discount')}))"
)


def _rev_cp() -> F.Column:
    return F.expr(_REV_CP_SQL)


def _dsum(col: F.Column) -> F.Column:
    """Overflow-safe exact integer sum (decimal stage, BIGINT out)."""
    return F.sum(col.cast("decimal(38,0)")).cast("bigint")


def _dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,0))) AS BIGINT)"


_LATE = "l_shipdate > o_orderdate + INTERVAL 180 DAY"


# --------------------------------------------------------------------------
# q163 only-late supplier (TPC-H Q21 shape). Suppliers who, on a
# finished multi-supplier order, were the ONLY one to ship late
# (>180 days after the order date — the schema has no commit/receipt
# dates). Deliberately written as SQL with EXISTS / NOT EXISTS so
# Catalyst's DecorrelateInnerQuery + RewritePredicateSubquery turn the
# correlated predicates into one left-semi and one left-anti join on
# l_orderkey — the plan test pins that no CartesianProduct and no
# per-row subquery survives. At 100 TB all three lineitem-shaped
# relations shuffle on l_orderkey (co-keyed, one exchange each);
# supplier is a broadcast dim; the <> l_suppkey filters ride the
# joined rows, never a second shuffle.
ORACLE["q163_only_late_supplier"] = f"""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.{_LATE}
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o2.o_orderdate + INTERVAL 180 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@_q("q163_only_late_supplier")
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("wh_supplier")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("wh_lineitem")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("wh_orders")
    return spark.sql(
        ORACLE["q163_only_late_supplier"]
        .replace("FROM supplier", "FROM wh_supplier")
        .replace("JOIN lineitem", "JOIN wh_lineitem")
        .replace("JOIN orders", "JOIN wh_orders")
        .replace("FROM lineitem", "FROM wh_lineitem")
    )


# --------------------------------------------------------------------------
# q164 idle high-balance customers (TPC-H Q22 shape, country-code ->
# nation; Q22's "no orders at all" is deliberately rewritten "no
# orders since 1999" — an IDLE-customer analysis that stays
# non-degenerate at every SF. Never-ordered customers are near-absent
# in this corpus (round-7 measurement: 0 at sf0.001/sf0.01, exactly 1
# of 15k at sf0.1), so textbook Q22 would return an ~empty relation;
# the date-gated rewrite is the scale-stable variant and its
# semantics stand on their own — both engines run the same predicate.
# tests/test_oracle_parity.py::test_q164_generator_assumption pins
# that never-ordered customers stay RARE (<= 0.1%): if a regenerated
# corpus made them common, "idle since 1999" and "never ordered"
# would diverge materially and the Q22 analogy claim must be
# re-examined, loudly). Customers with
# above-average positive balance and no RECENT order, grouped by
# nation. The above-average test is EXACT integer: cents * n_pos >
# sum_pos_cents (no float average). Scale: one scalar aggregate
# broadcasts (1 row), the anti join shuffles customer and the
# date-pruned orders slice on custkey once, nation is a broadcast dim.
ORACLE["q164_idle_customers"] = f"""
WITH pos AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
           {_dsum_sql(_cents_sql('c_acctbal'))} AS sum_cents
    FROM customer WHERE c_acctbal > 0.0
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       {_dsum_sql(_cents_sql('c_acctbal'))} AS bal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
CROSS JOIN pos
WHERE {_cents_sql('c_acctbal')} * n_pos > sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name
ORDER BY n_name
"""


@_q("q164_idle_customers")
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pos"),
        _dsum(_cents("c_acctbal")).alias("sum_cents"),
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(_cents("c_acctbal") * F.col("n_pos") > F.col("sum_cents"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
            .select("o_custkey"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            _dsum(_cents("c_acctbal")).alias("bal_cents"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# q165 small-quantity revenue (TPC-H Q17 shape). For one brand's
# parts, the revenue of lines whose quantity is below 20% of that
# part's average quantity. The correlated AVG subquery becomes a
# partkey-keyed aggregate joined back to the brand-filtered lines —
# both sides pre-filtered by the broadcast brand dim, so at 100 TB the
# per-part stats relation is |brand parts| sized and the join is
# partkey-co-keyed (one shuffle each side; AQE broadcasts the stats
# side when it fits). The 20%-of-average test is EXACT integer:
# 5 * qty * cnt < sum_qty.
ORACLE["q165_small_qty_revenue"] = f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'),
s AS (
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem JOIN bp ON l_partkey = p_partkey
    GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       {_dsum_sql(_cents_sql('l_extendedprice'))} AS revenue_cents
FROM lineitem
JOIN s ON lineitem.l_partkey = s.l_partkey
WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty
"""


@_q("q165_small_qty_revenue")
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bp = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    # bp is a brand slice of SF-scaled part — no hard hint; AQE
    # broadcasts it while it fits and shuffle-joins beyond.
    lib = li.join(bp, li.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    stats = lib.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
    )
    return (
        lib.join(stats.withColumnRenamed("l_partkey", "sk"), F.col("l_partkey") == F.col("sk"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            _dsum(_cents("l_extendedprice")).alias("revenue_cents"),
        )
    )


# --------------------------------------------------------------------------
# q166 large-order customers (TPC-H Q18 shape). Orders whose total
# quantity exceeds 300, with their customer. The HAVING aggregate is
# the orderkey-keyed groupBy; the join back to orders/customer rides
# the same key (orders) then a broadcast-sized customer dim at test SF
# / custkey shuffle at scale. Quantities are integral-by-construction
# doubles; CAST AS BIGINT is exact in both engines.
ORACLE["q166_large_order_customers"] = """
WITH big AS (
    SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
)
SELECT c_name, o_orderkey, CAST(YEAR(o_orderdate) AS INT) AS y, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""


@_q("q166_large_order_customers")
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("y"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q167 important parts (TPC-H Q11 shape, lineitem-derived value — the
# schema has no partsupp). Parts whose shipped revenue exceeds 1.5x
# the mean per-part value (this generator's per-part spread tops out
# near 1.8x the mean, so 1.5x keeps a stable ~1% tail at every SF —
# the replicated tiers preserve the per-part value distribution
# exactly): the scalar-subquery HAVING becomes one global aggregate
# broadcast against the partkey-keyed per-part aggregate. The
# threshold is RELATIVE (value * 2 * n_parts > 3 * total), so the
# result stays non-degenerate at every scale factor, and the compare
# is staged in DECIMAL(38,0) on Spark / HUGEINT on DuckDB —
# value*n_parts would cross BIGINT near ~9e18 cent-parts, and a
# DuckDB DECIMAL multiply past width 38 silently routes through
# DOUBLE (the module-doc '//' trap), so only 128-bit integer staging
# keeps BOTH engines exact.
ORACLE["q167_important_parts"] = f"""
WITH v AS (
    SELECT l_partkey, {_dsum_sql(_cents_sql('l_extendedprice'))} AS value_cents
    FROM lineitem GROUP BY l_partkey
),
t AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           {_dsum_sql('value_cents')} AS total_cents
    FROM v
)
SELECT l_partkey, value_cents
FROM v CROSS JOIN t
WHERE CAST(value_cents AS HUGEINT) * 2 * n_parts
      > 3 * CAST(total_cents AS HUGEINT)
ORDER BY value_cents DESC, l_partkey
LIMIT 100
"""


@_q("q167_important_parts")
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(
        _dsum(_cents("l_extendedprice")).alias("value_cents")
    )
    t = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        _dsum(F.col("value_cents")).alias("total_cents"),
    )
    return (
        v.crossJoin(F.broadcast(t))
        .filter(
            F.col("value_cents").cast("decimal(38,0)") * 2 * F.col("n_parts")
            > F.lit(3).cast("decimal(38,0)") * F.col("total_cents")
        )
        .select("l_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "l_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q168 nation-pair trade volume (TPC-H Q7 shape). Discounted revenue
# shipped between two specific nations (both directions) per ship
# year. nation is a broadcast dim applied to BOTH supplier and
# customer sides; the only big shuffles are lineitem⋈orders on
# orderkey (co-keyed) — the nation filters prune before the fact
# join at the scan thanks to broadcast-hash-join pushdown.
ORACLE["q168_nation_volume_pairs"] = f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS INT) AS y,
       {_dsum_sql(_REV_CP_SQL)} AS rev_cp
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ns ON ns.n_nationkey = s_nationkey
JOIN nation nc ON nc.n_nationkey = c_nationkey
WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
    OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
  AND YEAR(l_shipdate) BETWEEN 1996 AND 1999
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@_q("q168_nation_volume_pairs")
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    # customer/supplier are SF-scaled: unhinted (AQE broadcasts while
    # they fit); only the two 25-row nation aliases get hard hints.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .withColumn("y", F.year("l_shipdate").cast("int"))
        .filter(F.col("y").between(1996, 1999))
        .groupBy("supp_nation", "cust_nation", "y")
        .agg(_dsum(_rev_cp()).alias("rev_cp"))
        .orderBy("supp_nation", "cust_nation", "y")
    )


# --------------------------------------------------------------------------
# q169 market share (TPC-H Q8 shape). Within orders from customers of
# one region, the ppm share of discounted revenue supplied by one
# nation, per order year. The ratio is staged in DECIMAL(38,0)
# (num * 1e6 would cross BIGINT near ~9e12 summed cp otherwise) and
# is one truncating div on non-negative operands — engine-identical.
ORACLE["q169_market_share"] = f"""
WITH base AS (
    SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
           CASE WHEN ns.n_name = 'NATION_3' THEN {_REV_CP_SQL} ELSE 0 END AS nat_cp,
           {_REV_CP_SQL} AS cp
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
    JOIN region ON r_regionkey = nc.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    WHERE r_name = 'EUROPE'
)
SELECT y,
       {_dsum_sql('nat_cp')} AS nat_cp,
       {_dsum_sql('cp')} AS total_cp,
       CAST(CAST(SUM(CAST(nat_cp AS HUGEINT)) AS HUGEINT) * 1000000
            // CAST(SUM(CAST(cp AS HUGEINT)) AS HUGEINT) AS BIGINT) AS share_ppm
FROM base
GROUP BY y
ORDER BY y
"""


@_q("q169_market_share")
def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_reg")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    # customer/supplier SF-scaled: unhinted; nation/region fixed: hinted.
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            F.col("nc_reg") == F.col("r_regionkey"),
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("y"),
            F.when(F.col("supp_nation") == "NATION_3", _rev_cp())
            .otherwise(F.lit(0))
            .alias("nat_cp"),
            _rev_cp().alias("cp"),
        )
    )
    return (
        base.groupBy("y")
        .agg(
            _dsum(F.col("nat_cp")).alias("nat_cp"),
            _dsum(F.col("cp")).alias("total_cp"),
            F.expr(
                "CAST(SUM(CAST(nat_cp AS DECIMAL(38,0))) * 1000000"
                " div SUM(CAST(cp AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("y")
    )


# --------------------------------------------------------------------------
# q170 returned-item report (TPC-H Q10 shape). Revenue lost to
# returned lines per customer over a half-year window, top 20. The
# one big join is lineitem⋈orders on orderkey (the returnflag and
# date predicates prune both sides BEFORE the shuffle — PushedFilters
# asserted in the plan test); customer/nation broadcast.
ORACLE["q170_returned_items"] = f"""
SELECT c_custkey, c_name, n_name,
       {_dsum_sql(_REV_CP_SQL)} AS lost_cp
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND YEAR(o_orderdate) = 1996 AND MONTH(o_orderdate) <= 6
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_cp DESC, c_custkey
LIMIT 20
"""


@_q("q170_returned_items")
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1996) & (F.month("o_orderdate") <= 6)
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaled: no hard hint
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(_rev_cp()).alias("lost_cp"))
        .orderBy(F.desc("lost_cp"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q171 promo revenue share (TPC-H Q14 shape). Per ship month: the ppm
# of discounted revenue earned by PROMO-type parts. part is a
# broadcast dim; one lineitem pass, one group-by on (y, m) — the
# conditional-share pattern the reference's report routes compute for
# categories (2.2 loading-lambda 416-428), here as an exact staged
# division.
ORACLE["q171_promo_share"] = f"""
SELECT CAST(YEAR(l_shipdate) AS INT) AS y,
       CAST(MONTH(l_shipdate) AS INT) AS m,
       CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN {_REV_CP_SQL}
                          ELSE 0 END AS HUGEINT)) AS HUGEINT) * 1000000
            // CAST(SUM(CAST({_REV_CP_SQL} AS HUGEINT)) AS HUGEINT) AS BIGINT)
           AS promo_ppm
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE YEAR(l_shipdate) = 1997
GROUP BY 1, 2
ORDER BY 1, 2
"""


@_q("q171_promo_share")
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    p = _t(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # part SF-scaled: no hint
        .select(
            F.year("l_shipdate").cast("int").alias("y"),
            F.month("l_shipdate").cast("int").alias("m"),
            F.when(F.col("p_type") == "PROMO", _rev_cp())
            .otherwise(F.lit(0))
            .alias("promo_cp"),
            _rev_cp().alias("cp"),
        )
        .groupBy("y", "m")
        .agg(
            F.expr(
                "CAST(SUM(CAST(promo_cp AS DECIMAL(38,0))) * 1000000"
                " div SUM(CAST(cp AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("promo_ppm")
        )
        .orderBy("y", "m")
    )


# --------------------------------------------------------------------------
# q172 top supplier (TPC-H Q15 shape). The supplier(s) earning the
# maximum discounted revenue in one quarter — the Q15 view + scalar
# MAX subquery, decorrelated into a suppkey-keyed aggregate and a
# 1-row broadcast max (ties kept, as the spec requires). At 100 TB
# the aggregate is one lineitem shuffle on suppkey; everything after
# is |suppliers| sized.
ORACLE["q172_top_supplier"] = f"""
WITH rev AS (
    SELECT l_suppkey, {_dsum_sql(_REV_CP_SQL)} AS total_cp
    FROM lineitem
    WHERE YEAR(l_shipdate) = 1996 AND MONTH(l_shipdate) <= 3
    GROUP BY l_suppkey
),
mx AS (SELECT MAX(total_cp) AS max_cp FROM rev)
SELECT s_suppkey, s_name, total_cp
FROM rev JOIN supplier ON s_suppkey = l_suppkey
CROSS JOIN mx
WHERE total_cp = max_cp
ORDER BY s_suppkey
"""


@_q("q172_top_supplier")
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") == 1996) & (F.month("l_shipdate") <= 3)
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(_dsum(_rev_cp()).alias("total_cp"))
    mx = rev.agg(F.max("total_cp").alias("max_cp"))
    return (
        rev.crossJoin(F.broadcast(mx))  # 1-row scalar: hint stays
        .filter(F.col("total_cp") == F.col("max_cp"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)  # SF-scaled: no hint
        .select("s_suppkey", "s_name", "total_cp")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q173 referential-integrity audit. One row per FK edge of the star
# schema: child row count and orphan count (child keys with no
# parent). Each edge is a NOT EXISTS — Catalyst rewrites to a
# left-anti join (shuffle on the key for fact-sized children,
# broadcast for dim-sized parents); the seven 1-row aggregates union
# into one result, so the whole audit is a single job. The synthetic
# tiers replicate FK-consistently, so orphans stay 0 at every SF —
# the audit VERIFIES that invariant rather than assuming it (the
# reference's count-validation gate, SURVEY §2 A2, generalized to
# every relationship).
_RI_EDGES = [
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]

ORACLE["q173_ri_audit"] = "\nUNION ALL\n".join(
    f"""SELECT '{edge}' AS edge,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_child,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}
        WHERE NOT EXISTS (SELECT 1 FROM {parent} WHERE {pk} = {fk})) AS n_orphans"""
    for edge, child, fk, parent, pk in _RI_EDGES
) + "\nORDER BY edge"


@_q("q173_ri_audit")
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 shape: ONE left join + one aggregate per edge — the
    # previous form scanned each child twice (a bare count branch plus
    # an anti-join branch, cross-joined back together), i.e. 14 child
    # scans and 21 aggregates for 7 edges. n_orphans = rows whose
    # probe found no parent key (pk NULL after the left join) — same
    # NOT EXISTS semantics for null/absent FKs; parent pks are primary
    # keys (unique), so the left join cannot inflate n_child, and a
    # hypothetical duplicate-pk corruption would fail the oracle
    # comparison loudly.
    out = None
    for edge, child, fk, parent, pk in _RI_EDGES:
        ch = _t(spark, sf_dir, child).select(fk)
        pa = _t(spark, sf_dir, parent).select(pk)
        row = (
            ch.join(pa, F.col(fk) == F.col(pk), "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(F.lit(edge).alias("edge"), "n_child", "n_orphans")
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("edge")


# --------------------------------------------------------------------------
# q174 priority shipping delay (TPC-H Q12 shape — no l_shipmode in
# this schema, so the severity split rides o_orderpriority). Per ship
# year: late lines (>180 days after order) split into high-priority
# (1-URGENT / 2-HIGH) vs lower. One orderkey-co-keyed join, one
# group-by; the CASE counts are map-side partial aggregates.
ORACLE["q174_priority_late"] = f"""
SELECT CAST(YEAR(l_shipdate) AS INT) AS y,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_late,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_low_late
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE {_LATE}
GROUP BY 1
ORDER BY 1
"""


@_q("q174_priority_late")
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.expr(_LATE))
        .groupBy(F.year("l_shipdate").cast("int").alias("y"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("n_high_late"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("n_low_late"),
        )
        .orderBy("y")
    )


# --------------------------------------------------------------------------
# q175 product profit (TPC-H Q9 shape — supply cost proxied by
# p_retailprice, the schema's only cost-side column). Per supplier
# nation and order year, the profit on parts whose name contains
# 'widget': discounted revenue minus retail-cost-of-quantity, all in
# exact cent-percent units (profit can be negative — both engines sum
# signed BIGINTs through the decimal stage identically). part/
# supplier/nation broadcast; lineitem⋈orders co-keyed on orderkey.
ORACLE["q175_product_profit"] = f"""
SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS y,
       {_dsum_sql(
           f"{_REV_CP_SQL} - {_cents_sql('p_retailprice')}"
           " * CAST(l_quantity AS BIGINT) * 100"
       )} AS profit_cp
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY 1, 2
"""


@_q("q175_product_profit")
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    profit = F.expr(
        f"{_REV_CP_SQL} - {_cents_sql('p_retailprice')}"
        " * CAST(l_quantity AS BIGINT) * 100"
    )
    # part/supplier SF-scaled: unhinted; nation fixed: hinted.
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("y"))
        .agg(_dsum(profit).alias("profit_cp"))
        .orderBy("n_name", "y")
    )


# --------------------------------------------------------------------------
# q176 late-order priority check (TPC-H Q4 shape). Orders of one year
# with AT LEAST one late line, counted per priority — the correlated
# EXISTS carries a NON-EQUI predicate on the outer row (l_shipdate >
# o_orderdate + 180d), the harder decorrelation case: Catalyst folds
# it into the left-semi join condition beside the orderkey equality
# (plan-asserted). One orderkey-co-keyed semi join at any scale.
ORACLE["q176_late_order_priorities"] = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE YEAR(o_orderdate) = 1997
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 180 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@_q("q176_late_order_priorities")
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("wh_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("wh_lineitem")
    return spark.sql(
        ORACLE["q176_late_order_priorities"]
        .replace("FROM orders", "FROM wh_orders")
        .replace("FROM lineitem", "FROM wh_lineitem")
    )


# --------------------------------------------------------------------------
# q177 segment backlog (TPC-H Q3 shape). For one market segment's
# orders placed before mid-1997, the revenue still unshipped at
# 1998-01-01 — top 10 orders. Both date predicates push to their
# scans; customer broadcasts; the one shuffle is lineitem⋈orders on
# orderkey, then an orderkey-keyed aggregate on the SAME key (no
# second exchange).
ORACLE["q177_segment_backlog"] = f"""
SELECT l_orderkey,
       {_dsum_sql(_REV_CP_SQL)} AS backlog_cp,
       CAST(YEAR(o_orderdate) AS INT) AS y
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_shipdate >= TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, 3
ORDER BY backlog_cp DESC, l_orderkey
LIMIT 10
"""


@_q("q177_segment_backlog")
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaled: no hard hint
        .groupBy("l_orderkey", F.year("o_orderdate").cast("int").alias("y"))
        .agg(_dsum(_rev_cp()).alias("backlog_cp"))
        .select("l_orderkey", "backlog_cp", "y")
        .orderBy(F.desc("backlog_cp"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q178 cheapest supplier per part (TPC-H Q2 shape — no partsupp, so
# the offer price derives from shipped lines). For one brand: each
# part's supplier with the lowest average unit price (exact
# milli-cents via one truncating div), suppkey tiebreak. The argmin
# rides a (partkey)-keyed window over the (part,supplier) aggregate —
# |brand parts|×|suppliers-per-part| sized, never lineitem sized.
ORACLE["q178_cheapest_supplier"] = f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#5'),
ps AS (
    SELECT l_partkey, l_suppkey,
           {_dsum_sql(_cents_sql('l_extendedprice'))} AS sum_cents,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem JOIN bp ON l_partkey = p_partkey
    GROUP BY l_partkey, l_suppkey
),
u AS (
    SELECT l_partkey, l_suppkey,
           CAST(CAST(sum_cents AS HUGEINT) * 1000 // sum_qty AS BIGINT)
               AS unit_milli,
           ROW_NUMBER() OVER (
               PARTITION BY l_partkey
               ORDER BY CAST(CAST(sum_cents AS HUGEINT) * 1000 // sum_qty
                             AS BIGINT), l_suppkey) AS rn
    FROM ps
)
SELECT l_partkey, l_suppkey AS best_suppkey, unit_milli
FROM u WHERE rn = 1
ORDER BY l_partkey
LIMIT 100
"""


@_q("q178_cheapest_supplier")
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    bp = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#5")
        .select("p_partkey")
    )
    ps = (
        # brand slice of SF-scaled part: unhinted (see q165 note)
        li.join(bp, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            _dsum(_cents("l_extendedprice")).alias("sum_cents"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
        )
        .withColumn(
            "unit_milli",
            F.expr(
                "CAST(CAST(sum_cents AS DECIMAL(38,0)) * 1000"
                " div sum_qty AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_milli", "l_suppkey")
    return (
        ps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            F.col("l_suppkey").alias("best_suppkey"),
            "unit_milli",
        )
        .orderBy("l_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q179 discount-band revenue (TPC-H Q6 shape, banded). One ship
# year's revenue and line counts by exact discount percentage and
# small/large quantity band — the what-if pricing report. Pure
# scan-project-aggregate: no joins, predicates pushed, CASE bands in
# codegen, map-side partial aggregation into a 22-cell result.
ORACLE["q179_discount_band_revenue"] = f"""
SELECT {_cents_sql('l_discount')} AS disc_pct,
       CASE WHEN CAST(l_quantity AS BIGINT) < 25 THEN 'small'
            ELSE 'large' END AS qty_band,
       {_dsum_sql(_cents_sql('l_extendedprice'))} AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE YEAR(l_shipdate) = 1997
GROUP BY 1, 2
ORDER BY 1, 2
"""


@_q("q179_discount_band_revenue")
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    return (
        li.select(
            _cents("l_discount").alias("disc_pct"),
            F.when(F.col("l_quantity").cast("bigint") < 25, "small")
            .otherwise("large")
            .alias("qty_band"),
            _cents("l_extendedprice").alias("cents"),
        )
        .groupBy("disc_pct", "qty_band")
        .agg(
            _dsum(F.col("cents")).alias("rev_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .orderBy("disc_pct", "qty_band")
    )


# --------------------------------------------------------------------------
# q180 Poisson-bootstrap confidence interval. The at-scale bootstrap:
# classic resampling needs the whole dataset per replicate; the
# Poisson(1) approximation gives each row an i.i.d. integer weight
# per replicate, so B replicates are ONE pass over rows x B with
# map-side aggregation collapsing to |groups| x B immediately — the
# standard large-data CI recipe. Weights derive from a 60-bit md5
# integer reduced mod 1e9 against PRE-COMPUTED integer thresholds of
# the Poisson(1) CDF (engine-identical: both engines compare the same
# integers — no float RNG). Per (priority, replicate): the
# weighted-mean order price (exact milli-cents, one truncating div);
# the 90% CI is the nearest-rank 2nd / 31st of the B=32 replicate
# means (deterministic tiebreak on replicate id).
_POIS = [367879441, 735758882, 919698603, 981011843, 996340153]
_B = 32


def _pois_w_sql(h: str) -> str:
    cases = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS)
    )
    return f"(CASE {cases} ELSE 5 END)"


ORACLE["q180_bootstrap_ci"] = f"""
WITH rep AS (
    SELECT o_orderpriority, b,
           {_pois_w_sql(f"({_md5i_sql('bs|', '(o_orderkey * 37 + b)')} % 1000000000)")} AS w,
           {_cents_sql('o_totalprice')} AS cents
    FROM orders CROSS JOIN (SELECT UNNEST(generate_series(0, {_B - 1})) AS b)
),
m AS (
    SELECT o_orderpriority, b,
           CASE WHEN SUM(w) = 0 THEN 0
                ELSE CAST(SUM(CAST(w AS HUGEINT) * cents) * 1000
                          // SUM(CAST(w AS HUGEINT)) AS BIGINT)
           END AS rep_mean_milli
    FROM rep GROUP BY o_orderpriority, b
),
r AS (
    SELECT o_orderpriority, rep_mean_milli,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY rep_mean_milli, b) AS rk
    FROM m
),
pt AS (
    SELECT o_orderpriority,
           CAST(SUM(CAST({_cents_sql('o_totalprice')} AS HUGEINT)) * 1000
                // COUNT(*) AS BIGINT) AS mean_milli
    FROM orders GROUP BY o_orderpriority
)
SELECT pt.o_orderpriority, mean_milli,
       MAX(CASE WHEN rk = 2 THEN rep_mean_milli END) AS ci_lo_milli,
       MAX(CASE WHEN rk = 31 THEN rep_mean_milli END) AS ci_hi_milli
FROM pt JOIN r ON r.o_orderpriority = pt.o_orderpriority
GROUP BY pt.o_orderpriority, mean_milli
ORDER BY pt.o_orderpriority
"""


@_q("q180_bootstrap_ci")
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.spread import spread_scan

    o = _t(spark, sf_dir, "orders")
    rep = (
        # spread_scan: the ×32 replicate explode + one md5 per
        # (order, replicate) is the heaviest per-row expansion in the
        # warehouse family and otherwise runs at the scan's row-group
        # width (round-11: the whole rep-means chain measured 5.4 s
        # serial vs 1.2 s spread on local[32] at sf0.1 — guide §2.5
        # unsplittable-input case; a real partitioned orders table
        # passes through untouched)
        spread_scan(
            o.select(
                "o_orderpriority",
                "o_orderkey",
                _cents("o_totalprice").alias("cents"),
            )
        )
        .withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(_B - 1))))
        # the shared 60-bit md5-prefix family (one helper, one DuckDB
        # twin — hand-inlining it here would let the pair desynchronize)
        .withColumn(
            "__h",
            _md5i_spark("bs|", F.expr("(o_orderkey * 37 + b)")) % 1_000_000_000,
        )
        .withColumn("w", F.expr(_pois_w_sql("__h")))
        .drop("__h")
    )
    m = rep.groupBy("o_orderpriority", "b").agg(
        F.when(F.sum("w") == 0, F.lit(0))
        .otherwise(
            F.expr(
                "CAST(SUM(CAST(w AS DECIMAL(38,0)) * cents) * 1000"
                " div SUM(CAST(w AS DECIMAL(38,0))) AS BIGINT)"
            )
        )
        .alias("rep_mean_milli")
    )
    r = m.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("o_orderpriority").orderBy("rep_mean_milli", "b")
        ),
    )
    pt = o.groupBy("o_orderpriority").agg(
        F.expr(
            f"CAST(SUM(CAST({_cents_sql('o_totalprice')} AS DECIMAL(38,0)))"
            " * 1000 div COUNT(*) AS BIGINT)"
        ).alias("mean_milli")
    )
    return (
        pt.join(r, "o_orderpriority")
        .groupBy("o_orderpriority", "mean_milli")
        .agg(
            F.max(F.when(F.col("rk") == 2, F.col("rep_mean_milli"))).alias(
                "ci_lo_milli"
            ),
            F.max(F.when(F.col("rk") == 31, F.col("rep_mean_milli"))).alias(
                "ci_hi_milli"
            ),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q181 key-skew profile. The shuffle diagnostic a 100 TB pipeline
# runs BEFORE keying a join: per-user event counts reduced to one row
# of skew statistics — key count, max, exact nearest-rank p50/p99 (on
# the COUNT-OF-COUNTS histogram, so order statistics never sort the
# key relation — the grid is |distinct counts| sized), mean (milli),
# and max/mean skew ratio (ppm). One user-keyed shuffle; everything
# after is histogram-sized. The q82/q53 smokes consume exactly this
# signal; here it is first-class and oracle-backed.
ORACLE["q181_key_skew_profile"] = """
WITH c AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY user_id
),
h AS (
    SELECT cnt, CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COALESCE(SUM(COUNT(*)) OVER (ORDER BY cnt
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS below
    FROM c GROUP BY cnt
),
t AS (
    SELECT CAST(SUM(n_keys) AS BIGINT) AS total_keys,
           CAST(SUM(cnt * n_keys) AS BIGINT) AS total_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt
    FROM h
)
SELECT total_keys, max_cnt,
       (SELECT MIN(cnt) FROM h, t
        WHERE below + n_keys >= (total_keys + 1) // 2) AS p50_cnt,
       (SELECT MIN(cnt) FROM h, t
        WHERE (below + n_keys) * 100 >= total_keys * 99) AS p99_cnt,
       CAST(CAST(total_rows AS HUGEINT) * 1000 // total_keys AS BIGINT)
           AS mean_cnt_milli,
       CAST(CAST(max_cnt AS HUGEINT) * 1000000 * total_keys // total_rows
            AS BIGINT) AS skew_ratio_ppm
FROM t
"""


@_q("q181_key_skew_profile")
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..catalog import load_events

    e = load_events(spark, sf_dir)
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    h = (
        c.groupBy("cnt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
        .withColumn(
            "below",
            F.coalesce(
                F.sum("n_keys").over(
                    Window.orderBy("cnt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("bigint"),
        )
    )
    t = h.agg(
        F.sum("n_keys").cast("bigint").alias("total_keys"),
        F.sum(F.col("cnt") * F.col("n_keys")).cast("bigint").alias("total_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    ht = h.crossJoin(F.broadcast(t))
    p50 = ht.filter(
        F.col("below") + F.col("n_keys") >= F.expr("(total_keys + 1) div 2")
    ).agg(F.min("cnt").alias("p50_cnt"))
    p99 = ht.filter(
        (F.col("below") + F.col("n_keys")) * 100 >= F.col("total_keys") * 99
    ).agg(F.min("cnt").alias("p99_cnt"))
    return (
        t.crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p99))
        .select(
            "total_keys",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            # both ratios stage through DECIMAL(38,0) (HUGEINT in the
            # oracle): raw BIGINT products wrap silently on Spark past
            # ~9.2e18 (max_cnt*1e6*total_keys lands there near 1e9 keys
            # x 1e4 max) while DuckDB raises — the family's staging rule.
            F.expr(
                "CAST(CAST(total_rows AS DECIMAL(38,0)) * 1000"
                " div total_keys AS BIGINT)"
            ).alias("mean_cnt_milli"),
            F.expr(
                "CAST(CAST(max_cnt AS DECIMAL(38,0)) * 1000000 * total_keys"
                " div total_rows AS BIGINT)"
            ).alias("skew_ratio_ppm"),
        )
    )


# --------------------------------------------------------------------------
# q182 snapshot diff. The reconciliation op a lake pipeline runs
# between two table versions: added / removed / changed keys plus a
# per-column changed-count profile. The two snapshots derive
# DETERMINISTICALLY from orders (old = keys outside a 5% md5 slice;
# new = keys outside a different 5% slice, with prices re-stated on a
# 7% slice and priorities on a 3% slice), so the operator's input
# shape is real while the fixture needs no second table. Exact cents
# comparison (no float equality). Scale: ONE full-outer join on the
# key — both sides shuffle once on o_orderkey; the change profile is
# a conditional aggregate over the joined rows, map-side partial.
ORACLE["q182_snapshot_diff"] = f"""
WITH old AS (
    SELECT o_orderkey, {_cents_sql('o_totalprice')} AS price_cents,
           o_orderpriority
    FROM orders
    WHERE {_md5i_sql('snapA|', 'o_orderkey')} % 20 <> 0
),
new AS (
    SELECT o_orderkey,
           CASE WHEN {_md5i_sql('bump|', 'o_orderkey')} % 100 < 7
                THEN {_cents_sql('o_totalprice')} + 500
                ELSE {_cents_sql('o_totalprice')} END AS price_cents,
           CASE WHEN {_md5i_sql('prio|', 'o_orderkey')} % 100 < 3
                THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority
    FROM orders
    WHERE {_md5i_sql('snapB|', 'o_orderkey')} % 20 <> 0
),
j AS (
    SELECT old.o_orderkey AS ko, new.o_orderkey AS kn,
           old.price_cents AS po, new.price_cents AS pn,
           old.o_orderpriority AS ro, new.o_orderpriority AS rn
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
)
SELECT CAST(SUM(CASE WHEN ko IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN kn IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                      AND (po <> pn OR ro <> rn) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changed,
       CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                      AND po = pn AND ro = rn THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unchanged,
       CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL AND po <> pn
                THEN 1 ELSE 0 END) AS BIGINT) AS n_price_changed,
       CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL AND ro <> rn
                THEN 1 ELSE 0 END) AS BIGINT) AS n_priority_changed
FROM j
"""


@_q("q182_snapshot_diff")
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    old = o.filter(_md5i_spark("snapA|", F.col("o_orderkey")) % 20 != 0).select(
        F.col("o_orderkey").alias("ko"),
        _cents("o_totalprice").alias("po"),
        F.col("o_orderpriority").alias("ro"),
    )
    new = o.filter(_md5i_spark("snapB|", F.col("o_orderkey")) % 20 != 0).select(
        F.col("o_orderkey").alias("kn"),
        F.when(
            _md5i_spark("bump|", F.col("o_orderkey")) % 100 < 7,
            _cents("o_totalprice") + 500,
        )
        .otherwise(_cents("o_totalprice"))
        .alias("pn"),
        F.when(
            _md5i_spark("prio|", F.col("o_orderkey")) % 100 < 3, F.lit("1-URGENT")
        )
        .otherwise(F.col("o_orderpriority"))
        .alias("rn"),
    )
    j = old.join(new, old.ko == new.kn, "full_outer")
    both = F.col("ko").isNotNull() & F.col("kn").isNotNull()
    return j.agg(
        F.sum(F.when(F.col("ko").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.sum(F.when(F.col("kn").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.sum(
            F.when(
                both & ((F.col("po") != F.col("pn")) | (F.col("ro") != F.col("rn"))),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_changed"),
        F.sum(
            F.when(
                both & (F.col("po") == F.col("pn")) & (F.col("ro") == F.col("rn")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_unchanged"),
        F.sum(F.when(both & (F.col("po") != F.col("pn")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_price_changed"),
        F.sum(F.when(both & (F.col("ro") != F.col("rn")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_priority_changed"),
    )

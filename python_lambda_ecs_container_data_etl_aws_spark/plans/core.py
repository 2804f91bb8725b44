"""Declared query catalog Q01-Q16 (SURVEY.md §2.10).

Each query is (a) a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
and (b) a DuckDB oracle-SQL twin over the same parquet tables. Column
names, dtypes and values are engineered to hash-match across engines:

- counts/ids stay integer (exact);
- money sums go through DECIMAL(38,2) (order-independent) and come back
  as DOUBLE (one correctly-rounded conversion — see ``functions``);
- averages are one IEEE double division (bit-deterministic);
- instants are epoch-microsecond BIGINTs (no tz/format ambiguity);
- every window/sort key is made unique with explicit tiebreakers.

Scale notes are inline per query: what broadcasts, what shuffles, and
what the 100 TB variant of the plan looks like.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import dec_sum, dec_sum_sql, det_avg, det_avg_sql
from ..sources.registry import route_column, route_sql
from .fixtures import FILES_CTE_SQL, files_df

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q01 ingest-count (S4, A1) — the reference counts rows three different
# ways (newline scan 2.2:197, len(df) 2.1:439, SELECT COUNT(*) 2.2:300);
# in Spark they are all `df.count()`, served from parquet row-group metadata.
@_q("q01_ingest_count", "SELECT COUNT(*) AS n_rows FROM lineitem")
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


# --------------------------------------------------------------------------
# Q02 canonical-projection (P1) — ordered column projection, the
# reference's schema-drift defense (2.2:534-539). Column pruning reaches
# the scan (ReadSchema shows only 6 columns).
ORACLE["q02_canonical_projection"] = """
SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000
"""


@_q("q02_canonical_projection")
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    )


# --------------------------------------------------------------------------
# Q03 filename-routing (P2, P3, P9, A5) — the leader lambda's router
# (2.1:528-558) as one declarative CASE; rules live once in
# sources/registry.py and render to both dialects.
ORACLE["q03_filename_routing"] = f"""
WITH files AS ({FILES_CTE_SQL})
SELECT {route_sql()} AS route,
       COUNT(*) AS n_files,
       CAST(SUM(CAST(size_mib AS DECIMAL(18,1))) AS DOUBLE) AS total_size_mib
FROM files GROUP BY 1 ORDER BY 1
"""


@_q("q03_filename_routing")
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = files_df(_t(spark, sf_dir, "events"))
    return (
        files.withColumn(
            "route", route_column(F.col("filename"), F.col("bucket"), F.col("ext"))
        )
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.col("size_mib").cast("decimal(18,1)")).cast("double").alias("total_size_mib"),
        )
        .orderBy("route")
    )


# --------------------------------------------------------------------------
# Q04 recency-window (P5, A5, F10) — the loader's 30-minute freshness
# gate (2.2:595-611) rebased onto max(ts) so the query is reproducible.
# Scale: the scalar max is a broadcast join, not a window over all rows.
ORACLE["q04_recency_window"] = f"""
WITH files AS ({FILES_CTE_SQL}),
m AS (SELECT MAX(ts_us) AS max_us FROM files)
SELECT CAST(ts_us >= max_us - 1800000000 AS INT) AS is_valid,
       COUNT(*) AS n_files,
       MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
FROM files, m GROUP BY 1 ORDER BY 1
"""


@_q("q04_recency_window")
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = files_df(_t(spark, sf_dir, "events"))
    mx = files.agg(F.max("ts_us").alias("max_us"))
    return (
        files.crossJoin(F.broadcast(mx))
        .withColumn(
            "is_valid",
            (F.col("ts_us") >= F.col("max_us") - F.lit(1800000000)).cast("int"),
        )
        .groupBy("is_valid")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.min("ts_us").alias("min_ts_us"),
            F.max("ts_us").alias("max_ts_us"),
        )
        .orderBy("is_valid")
    )


# --------------------------------------------------------------------------
# Q05 report-aggregate (A3, J2, F12) — the flagship: the reference's
# sp_reporting_1_price_by_year_month_geo_category shape (2.2:416-428):
# filter year/month/geo/category, aggregate VALUE. n_name plays GEO,
# p_type plays category, l_extendedprice plays VALUE (FIXTURES.md §1).
# Scale: nation/customer/part broadcast (dims), lineitem⋈orders is the
# one real shuffle; the year/month predicate would prune date partitions
# on a partitioned 100 TB table.
_Q05_FILTER = "YEAR(o_orderdate) = 1995 AND MONTH(o_orderdate) = 12"
ORACLE["q05_report_aggregate"] = f"""
SELECT n_name AS geo,
       CAST(YEAR(o_orderdate) AS INT) AS y,
       CAST(MONTH(o_orderdate) AS INT) AS m,
       p_type AS category,
       {dec_sum_sql('l_extendedprice')} AS sum_price,
       {det_avg_sql('l_extendedprice')} AS avg_price,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE {_Q05_FILTER} AND n_name = 'NATION_3' AND p_type LIKE '%PROMO%'
GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
"""


def _report_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ part with y/m derived."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    # Only fixed-cardinality nation (25 rows at every SF) carries a hard
    # broadcast hint. customer/part grow with SF: an explicit hint would
    # bypass AQE's size check and OOM the driver at the 100 TB target, so
    # those joins are left unhinted — stats/AQE pick broadcast while they
    # fit (they do at every bench SF; horizon documented in BASELINE.md)
    # and fall back to shuffle joins beyond it.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .withColumn("y", F.year("o_orderdate").cast("int"))
        .withColumn("m", F.month("o_orderdate").cast("int"))
    )


@_q("q05_report_aggregate")
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _report_base(spark, sf_dir)
    return (
        base.filter(
            (F.col("y") == 1995)
            & (F.col("m") == 12)
            & (F.col("n_name") == "NATION_3")
            & F.col("p_type").contains("PROMO")
        )
        .groupBy(F.col("n_name").alias("geo"), "y", "m", F.col("p_type").alias("category"))
        .agg(
            dec_sum("l_extendedprice").alias("sum_price"),
            det_avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("geo", "y", "m", "category")
    )


# --------------------------------------------------------------------------
# Q06 multi-geo-param (A4, F7) — the SP's comma-delimited multi-value
# parameter convention (2.2:418-419): one string, split at query time.
_Q06_GEOS = "NATION_1,NATION_3,NATION_7"
ORACLE["q06_multi_geo_param"] = f"""
SELECT n_name AS geo,
       CAST(MONTH(o_orderdate) AS INT) AS m,
       {dec_sum_sql('l_extendedprice')} AS sum_price,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE YEAR(o_orderdate) = 1996
  AND list_contains(string_split('{_Q06_GEOS}', ','), n_name)
  AND p_type LIKE '%STANDARD%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


@_q("q06_multi_geo_param")
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _report_base(spark, sf_dir)
    geo_list = F.split(F.lit(_Q06_GEOS), ",")
    return (
        base.filter(
            (F.col("y") == 1996)
            & F.array_contains(geo_list, F.col("n_name"))
            & F.col("p_type").contains("STANDARD")
        )
        .groupBy(F.col("n_name").alias("geo"), "m")
        .agg(
            dec_sum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("geo", "m")
    )


# --------------------------------------------------------------------------
# Q07 report-table-build (J2) — the denormalized wide table the
# sp_reporting_50_general_table_for_report_building call implies
# (2.2:381-398): fact joined to every dimension, dashboard columns
# projected. Scale: one fact shuffle; all five dims broadcast.
ORACLE["q07_report_table_build"] = """
SELECT l_orderkey, l_linenumber,
       CAST(YEAR(o_orderdate) AS INT) AS y,
       CAST(MONTH(o_orderdate) AS INT) AS m,
       c_name, n_name AS cust_nation, r_name AS cust_region,
       s_name AS supplier_name, p_name AS part_name, p_type AS category,
       l_quantity, l_extendedprice, l_discount,
       l_extendedprice * (1.0 - l_discount) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN part     ON l_partkey = p_partkey
ORDER BY l_orderkey, l_linenumber LIMIT 2000
"""


@_q("q07_report_table_build")
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    # Hard hints only on the fixed dims (nation/region); customer/
    # supplier/part are SF-scaled and stay unhinted (AQE broadcasts
    # them while they fit — see _report_base note).
    wide = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(p, li.l_partkey == p.p_partkey)
    )
    return (
        wide.orderBy("l_orderkey", "l_linenumber")
        .limit(2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
            "c_name",
            F.col("n_name").alias("cust_nation"),
            F.col("r_name").alias("cust_region"),
            F.col("s_name").alias("supplier_name"),
            F.col("p_name").alias("part_name"),
            F.col("p_type").alias("category"),
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Q08 upsert-merge (J1) — the temp→permanent "upsert instead of insert"
# contract the loader spells out (2.2:209-217, SP call 2.2:306-316):
# delta wins on key collision, inserts otherwise. Expressed as a
# full-outer merge; on a real table format this is MERGE INTO.
ORACLE["q08_upsert_merge"] = """
WITH perm AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 7 <> 0
),
delta AS (
    SELECT o_orderkey, 'U' AS o_orderstatus,
           o_totalprice + 100000.0 AS o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 3 = 0
)
SELECT d.o_orderkey, d.o_orderstatus, d.o_totalprice, d.o_orderpriority FROM delta d
UNION ALL
SELECT p.o_orderkey, p.o_orderstatus, p.o_totalprice, p.o_orderpriority
FROM perm p WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = p.o_orderkey)
ORDER BY o_orderkey
"""


@_q("q08_upsert_merge")
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    perm = o.filter(F.col("o_orderkey") % 7 != 0)
    delta = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(100000.0)).alias("o_totalprice"),
        "o_orderpriority",
    )
    p, d = perm.alias("p"), delta.alias("d")
    merged = p.join(d, F.col("p.o_orderkey") == F.col("d.o_orderkey"), "full_outer").select(
        F.coalesce(F.col("d.o_orderkey"), F.col("p.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("d.o_orderstatus"), F.col("p.o_orderstatus")).alias("o_orderstatus"),
        F.coalesce(F.col("d.o_totalprice"), F.col("p.o_totalprice")).alias("o_totalprice"),
        F.coalesce(F.col("d.o_orderpriority"), F.col("p.o_orderpriority")).alias(
            "o_orderpriority"
        ),
    )
    return merged.orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Q09 autoid-rownumber (W1) — the DynamoDB loader's 1-based surrogate
# key (3:378-401). The declared query checksums the full assignment.
# The Spark side uses the SCALABLE dense-id operator (range partition +
# per-partition offsets, sources/chunking.add_autoid) — identical ids
# to a global ROW_NUMBER over the same unique ordering, without the
# single-partition sort the oracle SQL implies.
# checksum terms are modded BEFORE multiplying and summing: the raw
# SUM(autoid * l_orderkey) overflows BIGINT at ~6M rows (found by the
# round-5 sf1 scale tier — DuckDB silently widens to HUGEINT, Spark
# ANSI throws). (a%M)*(b%M) < 1e18 stays in range and the modded-term
# sum is exact to ~9e9 rows; past that, the next rung is a two-level
# grouped aggregation modding the partial sums.
_Q09_M = 1_000_000_007

ORACLE["q09_autoid_rownumber"] = f"""
WITH t AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS BIGINT) AS autoid,
           l_orderkey
    FROM lineitem
)
SELECT COUNT(*) AS n_rows,
       CAST(MIN(autoid) AS BIGINT) AS min_id,
       CAST(MAX(autoid) AS BIGINT) AS max_id,
       CAST(SUM(autoid) AS BIGINT) AS sum_id,
       CAST(SUM(((autoid % {_Q09_M}) * (l_orderkey % {_Q09_M})) % {_Q09_M})
            AS BIGINT) AS checksum
FROM t
"""


@_q("q09_autoid_rownumber")
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.chunking import add_autoid

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    t = add_autoid(li, ["l_orderkey", "l_linenumber"]).select("autoid", "l_orderkey")
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("autoid").alias("min_id"),
        F.max("autoid").alias("max_id"),
        F.sum("autoid").alias("sum_id"),
        F.sum(
            (F.col("autoid") % _Q09_M) * (F.col("l_orderkey") % _Q09_M)
            % _Q09_M
        ).alias("checksum"),
    )


# --------------------------------------------------------------------------
# Q10 range-chunking (W2, F13) — the leader's file-split arithmetic
# `lines_per_file = int(N*5/size_mib)` (2.1:453-479) with size_mib=23,
# including the short last chunk. Physical analogue at scale:
# repartitionByRange + maxRecordsPerFile, not row_number.
ORACLE["q10_range_chunking"] = """
WITH t AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS BIGINT) AS autoid
    FROM lineitem
),
p AS (SELECT (COUNT(*) * 5) // 23 AS lines_per_file FROM t)
SELECT (autoid - 1) // lines_per_file AS chunk, COUNT(*) AS n_rows
FROM t, p GROUP BY 1 ORDER BY 1
"""


@_q("q10_range_chunking")
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.chunking import add_autoid

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    t = add_autoid(li, ["l_orderkey", "l_linenumber"]).select("autoid")
    p = t.agg(F.expr("(count(1) * 5) div 23").alias("lines_per_file"))
    return (
        t.crossJoin(F.broadcast(p))
        .select(F.expr("(autoid - 1) div lines_per_file").alias("chunk"))
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("chunk")
    )


# --------------------------------------------------------------------------
# Q11 latest-version-dedup (W3, ST3, A6) — keep the newest record per
# key, plus how many versions existed: the CloudFront lambda's
# multi-version detection (4:244-289) and the loader's idempotency
# window (2.2:219-255) share this shape.
ORACLE["q11_latest_version_dedup"] = """
WITH e AS (
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events
)
SELECT user_id, event_type,
       event_id AS latest_event_id,
       ts_us AS latest_ts_us,
       n_versions
FROM (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts_us DESC, event_id DESC) AS rn,
           COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_versions
    FROM e
)
WHERE rn = 1 ORDER BY user_id, event_type
"""


@_q("q11_latest_version_dedup")
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    part = Window.partitionBy("user_id", "event_type")
    w = part.orderBy(F.col("ts_us").desc(), F.col("event_id").desc())
    # n_versions shares w's (partition, order) with a full frame: the
    # count is order-insensitive, and agreeing specs let Catalyst plan
    # ONE Window operator for rn + n_versions instead of two stacked
    # passes (round-12, same fusion as q111's ranked relation)
    w_n = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        e.select(
            "user_id",
            "event_type",
            "event_id",
            "ts_us",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(w_n).alias("n_versions"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts_us").alias("latest_ts_us"),
            "n_versions",
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# Q12 count-validation (A2, J4) — the loader's commit gate: loaded row
# count vs source row count, tolerate |Δ|<=5 (2.2:300-308,
# maxerrors_allowed 2.1:112). Emulated per synthetic "file".
ORACLE["q12_count_validation"] = """
WITH staged AS (
    SELECT l_suppkey % 10 AS file_id, COUNT(*) AS staged FROM lineitem GROUP BY 1
),
loaded AS (
    SELECT l_suppkey % 10 AS file_id, COUNT(*) AS loaded
    FROM lineitem WHERE l_orderkey % 1000 >= 3 GROUP BY 1
)
SELECT s.file_id,
       s.staged,
       COALESCE(l.loaded, 0) AS loaded,
       s.staged - COALESCE(l.loaded, 0) AS delta,
       CAST(ABS(s.staged - COALESCE(l.loaded, 0)) > 5 AS INT) AS flag_mismatch
FROM staged s LEFT JOIN loaded l ON s.file_id = l.file_id
ORDER BY s.file_id
"""


@_q("q12_count_validation")
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    staged = li.groupBy((F.col("l_suppkey") % 10).alias("file_id")).agg(
        F.count(F.lit(1)).alias("staged")
    )
    loaded = (
        li.filter(F.col("l_orderkey") % 1000 >= 3)
        .groupBy((F.col("l_suppkey") % 10).alias("file_id"))
        .agg(F.count(F.lit(1)).alias("loaded"))
    )
    j = staged.join(loaded, "file_id", "left").select(
        "file_id",
        "staged",
        F.coalesce("loaded", F.lit(0)).alias("loaded"),
    )
    return (
        j.withColumn("delta", F.col("staged") - F.col("loaded"))
        .withColumn("flag_mismatch", (F.abs(F.col("delta")) > 5).cast("int"))
        .orderBy("file_id")
    )


# --------------------------------------------------------------------------
# Q13 snapshot-reconcile (U2-ext) — what's in staging but not final,
# and vice versa: the set-operation form of the reference's
# count-compare validation (A2). Anti/semi joins, not EXCEPT, so the
# plan stays a pair of broadcast-able joins at scale.
ORACLE["q13_snapshot_reconcile"] = """
WITH staging AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 <> 4),
final AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 <> 0)
SELECT
    (SELECT COUNT(*) FROM staging s
     WHERE NOT EXISTS (SELECT 1 FROM final f WHERE f.o_orderkey = s.o_orderkey)) AS staging_only,
    (SELECT COUNT(*) FROM final f
     WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = f.o_orderkey)) AS final_only,
    (SELECT COUNT(*) FROM staging s
     WHERE EXISTS (SELECT 1 FROM final f WHERE f.o_orderkey = s.o_orderkey)) AS in_both
"""


@_q("q13_snapshot_reconcile")
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    staging = o.filter(F.col("o_orderkey") % 5 != 4)
    final = o.filter(F.col("o_orderkey") % 3 != 0)
    so = staging.join(final, "o_orderkey", "left_anti").agg(
        F.count(F.lit(1)).alias("staging_only")
    )
    fo = final.join(staging, "o_orderkey", "left_anti").agg(
        F.count(F.lit(1)).alias("final_only")
    )
    ib = staging.join(final, "o_orderkey", "left_semi").agg(
        F.count(F.lit(1)).alias("in_both")
    )
    return so.crossJoin(fo).crossJoin(ib)


# --------------------------------------------------------------------------
# Q14 tumbling-window (ST1-ST4 ext) — batch-checkable form of the
# streaming contract: 10-minute tumbling windows over event time with a
# 30-minute watermark that drops late rows (the loader's recency gate
# 2.2:595-611 generalized). streaming/runner.py runs the same logic
# through Structured Streaming; this batch twin is the hash oracle.
ORACLE["q14_tumbling_window"] = """
WITH e AS (SELECT epoch_us(ts) AS ts_us, user_id FROM events),
m AS (SELECT MAX(ts_us) AS max_us FROM e)
SELECT (ts_us // 600000000) * 600 AS window_start_sec,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM e, m
WHERE ts_us >= max_us - 1800000000
GROUP BY 1 ORDER BY 1
"""


@_q("q14_tumbling_window")
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("ts_us", "user_id")
    mx = e.agg(F.max("ts_us").alias("max_us"))
    return (
        e.crossJoin(F.broadcast(mx))
        .filter(F.col("ts_us") >= F.col("max_us") - F.lit(1800000000))
        .select(F.expr("(ts_us div 600000000) * 600").alias("window_start_sec"), "user_id")
        .groupBy("window_start_sec")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start_sec")
    )


# --------------------------------------------------------------------------
# Q15 rollup-drilldown (A3-ext) — the dashboard's year→month→geo
# drilldown as one ROLLUP pass (partial aggregation keeps it one
# shuffle). NULL subtotal markers are coalesced to 'ALL' so both
# engines hash identically.
ORACLE["q15_rollup_drilldown"] = f"""
WITH base AS (
    SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           n_name AS geo, l_extendedprice
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE YEAR(o_orderdate) IN (1995, 1996)
)
SELECT COALESCE(CAST(y AS VARCHAR), 'ALL') AS y,
       COALESCE(CAST(m AS VARCHAR), 'ALL') AS m,
       COALESCE(geo, 'ALL') AS geo,
       {dec_sum_sql('l_extendedprice')} AS sum_price,
       COUNT(*) AS n_items
FROM base GROUP BY ROLLUP(y, m, geo) ORDER BY 1, 2, 3
"""


@_q("q15_rollup_drilldown")
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaled: no hard hint
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("y", F.year("o_orderdate").cast("int"))
        .withColumn("m", F.month("o_orderdate").cast("int"))
        .filter(F.col("y").isin(1995, 1996))
        .select("y", "m", F.col("n_name").alias("geo"), "l_extendedprice")
    )
    return (
        base.rollup("y", "m", "geo")
        .agg(
            dec_sum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce(F.col("y").cast("string"), F.lit("ALL")).alias("y"),
            F.coalesce(F.col("m").cast("string"), F.lit("ALL")).alias("m"),
            F.coalesce(F.col("geo"), F.lit("ALL")).alias("geo"),
            "sum_price",
            "n_items",
        )
        .orderBy("y", "m", "geo")
    )


# --------------------------------------------------------------------------
# Q16 rank-and-lag (W-ext) — month-over-month analytics on the report
# table: RANK within (geo, category), LAG delta, and a 3-month moving
# aggregate. The moving sum is built from explicit LAGs (fixed IEEE
# evaluation order) rather than a frame AVG, because sliding-frame
# accumulation order differs between engines on doubles; COUNT over the
# ROWS frame exercises the frame spec with exact integers.
_Q16_MOV = (
    "(COALESCE(prev2, 0.0) + COALESCE(prev1, 0.0)) + avg_price"
)
ORACLE["q16_rank_and_lag"] = f"""
WITH monthly AS (
    SELECT n_name AS geo, p_type AS category,
           CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           {det_avg_sql('l_extendedprice')} AS avg_price
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE p_type IN ('PROMO', 'ECONOMY') AND YEAR(o_orderdate) BETWEEN 1995 AND 1997
    GROUP BY 1, 2, 3, 4
),
laged AS (
    SELECT geo, category, y, m, avg_price,
           CAST(RANK() OVER (PARTITION BY geo, category ORDER BY avg_price DESC) AS INT) AS price_rank,
           LAG(avg_price, 1) OVER (PARTITION BY geo, category ORDER BY y, m) AS prev1,
           LAG(avg_price, 2) OVER (PARTITION BY geo, category ORDER BY y, m) AS prev2,
           COUNT(*) OVER (PARTITION BY geo, category ORDER BY y, m
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS frame_cnt
    FROM monthly
)
SELECT geo, category, y, m, avg_price, price_rank,
       prev1 AS prev_avg,
       avg_price - prev1 AS mom_delta,
       frame_cnt,
       ({_Q16_MOV}) / frame_cnt AS mov_avg
FROM laged ORDER BY geo, category, y, m
"""


@_q("q16_rank_and_lag")
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _report_base(spark, sf_dir)
    monthly = (
        base.filter(
            F.col("p_type").isin("PROMO", "ECONOMY") & F.col("y").between(1995, 1997)
        )
        .groupBy(F.col("n_name").alias("geo"), F.col("p_type").alias("category"), "y", "m")
        .agg(det_avg("l_extendedprice").alias("avg_price"))
    )
    part = Window.partitionBy("geo", "category")
    w_time = part.orderBy("y", "m")
    w_rank = part.orderBy(F.col("avg_price").desc())
    w_frame = w_time.rowsBetween(-2, 0)
    laged = monthly.select(
        "geo",
        "category",
        "y",
        "m",
        "avg_price",
        F.rank().over(w_rank).cast("int").alias("price_rank"),
        F.lag("avg_price", 1).over(w_time).alias("prev1"),
        F.lag("avg_price", 2).over(w_time).alias("prev2"),
        F.count(F.lit(1)).over(w_frame).alias("frame_cnt"),
    )
    mov_sum = (
        F.coalesce(F.col("prev2"), F.lit(0.0)) + F.coalesce(F.col("prev1"), F.lit(0.0))
    ) + F.col("avg_price")
    return laged.select(
        "geo",
        "category",
        "y",
        "m",
        "avg_price",
        "price_rank",
        F.col("prev1").alias("prev_avg"),
        (F.col("avg_price") - F.col("prev1")).alias("mom_delta"),
        "frame_cnt",
        (mov_sum / F.col("frame_cnt")).alias("mov_avg"),
    ).orderBy("geo", "category", "y", "m")

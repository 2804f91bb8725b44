"""Extension contract queries q29-q31: embedding-cosine near-dup,
control-character sanitization (F8), URL-decode normalization (P8).

- q29 completes the dedup family (exact / minhash / simhash / n-gram
  Jaccard / embedding-cosine). The corpus plants no embedding dups
  (max pairwise cosine ≈ 0.46), so the threshold parameter is 0.4 to
  produce a non-trivial deterministic result; production corpora use
  ~0.95. Quantization (floor(v*1000) → BIGINT) keeps dot/norms exact.
- q30 is the reference's unicode control-char sanitizer
  (`2.1 leader-lambda-for-mysql.py:568`, `2.2:703`, `3:579`, `4:230`) —
  dirt is synthesized (tab + newline appended) so the strip is
  observable; both regex engines agree on \\p{C}.
- q31 is the S3-key URL-decode (`unquote_plus`, `2.1:159-164`,
  `3:122-127`) — Spark uses the built-in url_decode; DuckDB 1.0 has no
  url_decode, so the oracle decodes the same fixed escape set with
  replace chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..sources.registry import route_column, route_sql
from .core import ORACLE, _q
from .fixtures import FILES_CTE_SQL, files_df

_EMB_THRESH = 0.4
_EMB_SUBSET = 300

ORACLE["q29_embedding_neardup"] = f"""
WITH comp AS (
    SELECT vec_id, i AS pos,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
    FROM embeddings, range(1, 65) t(i)
    WHERE vec_id < {_EMB_SUBSET}
),
norms AS (SELECT vec_id, SUM(qv * qv) AS nrm FROM comp GROUP BY 1),
dots AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, SUM(a.qv * b.qv) AS dot
    FROM comp a JOIN comp b ON a.pos = b.pos AND a.vec_id < b.vec_id
    GROUP BY 1, 2
)
SELECT a_id, b_id,
       CAST(dot AS DOUBLE) / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))) AS cosine
FROM dots
JOIN norms na ON na.vec_id = a_id
JOIN norms nb ON nb.vec_id = b_id
WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))) >= {_EMB_THRESH}
ORDER BY a_id, b_id
"""


@_q("q29_embedding_neardup")
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    # in-row fold kernel (round-4 rewrite, see q23/q97): the bounded
    # subset broadcasts as quantized arrays; dot + norms fold inside
    # each of the subset² / 2 pair rows — no 64x pos explode, no
    # separate norms relation. At scale the pair relation comes from
    # the LSH-bucketed path (operators/similarity), same as before.
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _EMB_SUBSET)
    qarr = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    )
    nrm = F.expr("aggregate(transform(qv, x -> x * x), 0L, (a, v) -> a + v)")
    eq = emb.select("vec_id", qarr.alias("qv")).withColumn("nrm", nrm)
    a = eq.select(
        F.col("vec_id").alias("a_id"), F.col("qv").alias("aq"), F.col("nrm").alias("an")
    )
    b = eq.select(
        F.col("vec_id").alias("b_id"), F.col("qv").alias("bq"), F.col("nrm").alias("bn")
    )
    dot = F.expr(
        "aggregate(zip_with(aq, bq, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    out = (
        b.crossJoin(F.broadcast(a))
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (
                dot.cast("double")
                / (F.sqrt(F.col("an").cast("double")) * F.sqrt(F.col("bn").cast("double")))
            ).alias("cosine"),
        )
    )
    return out.filter(F.col("cosine") >= _EMB_THRESH).orderBy("a_id", "b_id")


ORACLE["q30_sanitize_controlchars"] = """
WITH dirty AS (
    SELECT doc_id, text || chr(9) || 'tail' || chr(10) AS raw FROM documents
)
SELECT doc_id,
       length(raw) AS len_dirty,
       length(regexp_replace(raw, '\\p{C}', '', 'g')) AS len_clean,
       length(raw) - length(regexp_replace(raw, '\\p{C}', '', 'g')) AS n_stripped
FROM dirty ORDER BY doc_id
"""


@_q("q30_sanitize_controlchars")
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(F.col("text"), F.lit("\t"), F.lit("tail"), F.lit("\n"))
    clean = F.regexp_replace(raw, r"\p{C}", "")
    return d.select(
        "doc_id",
        F.length(raw).alias("len_dirty"),
        F.length(clean).alias("len_clean"),
        (F.length(raw) - F.length(clean)).alias("n_stripped"),
    ).orderBy("doc_id")


ORACLE["q31_url_decode_keys"] = """
WITH keys AS (
    SELECT event_id,
           'data%2F' || CAST(event_id AS VARCHAR) || '%20v' || CAST(event_id % 7 AS VARCHAR) || '.csv' AS enc
    FROM events
)
SELECT CAST(SUM(length(enc)) AS BIGINT) AS total_enc_len,
       CAST(SUM(length(replace(replace(enc, '%2F', '/'), '%20', ' '))) AS BIGINT) AS total_dec_len,
       COUNT(DISTINCT replace(replace(enc, '%2F', '/'), '%20', ' ')) AS n_distinct_decoded
FROM keys
"""


@_q("q31_url_decode_keys")
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    enc = F.concat(
        F.lit("data%2F"),
        F.col("event_id").cast("string"),
        F.lit("%20v"),
        (F.col("event_id") % 7).cast("string"),
        F.lit(".csv"),
    )
    dec = F.url_decode(enc)
    return e.select(enc.alias("enc"), dec.alias("dec")).agg(
        F.sum(F.length("enc")).cast("bigint").alias("total_enc_len"),
        F.sum(F.length("dec")).cast("bigint").alias("total_dec_len"),
        F.countDistinct("dec").alias("n_distinct_decoded"),
    )


# --------------------------------------------------------------------------
# q32 JSON payload parse (F14) — the reference parses nested JSON
# envelopes everywhere (S3 event Records, `2.1:142-144`; secrets,
# `2.2:136-138`). Spark side uses from_json into a typed STRUCT (the
# one nested-type obligation); the oracle uses DuckDB's JSON extension.
ORACLE["q32_json_props"] = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       COUNT(*) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""


@_q("q32_json_props")
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q33 first-match / pick-one (W4) — the loader scans the file listing,
# the first valid file becomes the unload target and the rest are
# appended as a name list (`2.2:622-640`). Latest-by-time pick with
# deterministic tiebreak + sorted bounded name list.
ORACLE["q33_pick_one_per_route"] = f"""
WITH files AS ({FILES_CTE_SQL}),
routed AS (
    SELECT *, {route_sql()} AS route FROM files
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY route
                                 ORDER BY ts_us DESC, filename DESC) AS rn
    FROM routed
),
names AS (
    SELECT route,
           array_to_string(list_slice(list_sort(list(filename)), 1, 3), ',') AS first3_names,
           COUNT(*) AS n_files
    FROM routed GROUP BY 1
)
SELECT r.route, r.filename AS latest_filename, r.ts_us AS latest_ts_us,
       n.n_files, n.first3_names
FROM ranked r JOIN names n ON r.route = n.route
WHERE r.rn = 1 ORDER BY r.route
"""


# --------------------------------------------------------------------------
# q36 cube-drilldown — GROUP BY CUBE over (geo, category): every
# subtotal combination in one shuffle (q15's ROLLUP sibling; together
# they cover Spark's grouping-sets family). NULL markers coalesced as
# in q15.
ORACLE["q36_cube_drilldown"] = """
WITH base AS (
    SELECT n_name AS geo, p_type AS category, l_extendedprice
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE YEAR(o_orderdate) = 1997
)
SELECT COALESCE(geo, 'ALL') AS geo,
       COALESCE(category, 'ALL') AS category,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_items
FROM base GROUP BY CUBE(geo, category) ORDER BY 1, 2
"""


@_q("q36_cube_drilldown")
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer/part are SF-scaled: unhinted (AQE broadcasts while
        # they fit); only fixed-cardinality nation gets a hard hint.
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .filter(F.year("o_orderdate") == 1997)
        .select(F.col("n_name").alias("geo"), F.col("p_type").alias("category"), "l_extendedprice")
    )
    return (
        base.cube("geo", "category")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,2)")).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce("geo", F.lit("ALL")).alias("geo"),
            F.coalesce("category", F.lit("ALL")).alias("category"),
            "sum_price",
            "n_items",
        )
        .orderBy("geo", "category")
    )


# --------------------------------------------------------------------------
# q34 gap-based sessionization — the batch form of session windows
# (the event-time generalization of the reference's activity windows):
# a new session starts when a user's inter-event gap exceeds 30 min.
# LAG flags boundaries, a cumulative SUM numbers sessions — all integer
# arithmetic over epoch-µs, so both engines agree bit-for-bit. The
# streaming twin of this shape is applyInPandasWithState
# (streaming/runner.stateful_user_counts shows the state plumbing).
_GAP_US = 1800000000
ORACLE["q34_sessionize"] = f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
gaps AS (
    SELECT user_id, event_id, ts_us,
           CASE WHEN LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                  OR ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > {_GAP_US}
                THEN 1 ELSE 0 END AS new_sess
    FROM e
),
sess AS (
    SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
    FROM gaps
)
SELECT user_id, sess_no,
       COUNT(*) AS n_events,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM sess GROUP BY 1, 2 ORDER BY 1, 2
"""


@_q("q34_sessionize")
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts_us")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > _GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    sess = e.withColumn("new_sess", new_sess).withColumn(
        "sess_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return (
        sess.groupBy("user_id", "sess_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        )
        .orderBy("user_id", "sess_no")
    )


@_q("q33_pick_one_per_route")
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = files_df(load_table(spark, sf_dir, "events"))
    routed = files.withColumn(
        "route", route_column(F.col("filename"), F.col("bucket"), F.col("ext"))
    )
    w = Window.partitionBy("route").orderBy(F.col("ts_us").desc(), F.col("filename").desc())
    ranked = routed.select(
        "route", "filename", "ts_us", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") == 1)
    names = routed.groupBy("route").agg(
        F.array_join(
            F.slice(F.array_sort(F.collect_list("filename")), 1, 3), ","
        ).alias("first3_names"),
        F.count(F.lit(1)).alias("n_files"),
    )
    return (
        ranked.join(names, "route")
        .select(
            "route",
            F.col("filename").alias("latest_filename"),
            F.col("ts_us").alias("latest_ts_us"),
            "n_files",
            "first3_names",
        )
        .orderBy("route")
    )

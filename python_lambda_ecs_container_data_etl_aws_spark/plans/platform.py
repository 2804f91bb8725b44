"""Platform-tier queries q99-q105: the warehouse/graph/retrieval
operations that sit AROUND a curation pipeline — seed-quality graph
ranking, slowly-changing-dimension history, embedding compression,
series anomaly audit, tokenizer-merge statistics, late-interaction
retrieval, and the shard manifest a trainer's data loader reads.

- q99 domain PageRank: fixed-point integer PageRank (3 unrolled
  iterations, damping 0.85) over a deterministic domain link graph —
  the CommonCrawl-style "rank hosts to pick crawl seeds" job. Every
  per-edge contribution is BIGINT (rank*weight integer-divided by the
  source's out-weight), so both engines iterate bit-identically.
- q100 SCD Type-2 historization: fold the q96 CDC change log into
  versioned dimension rows (valid_from/valid_to sequence bounds,
  is_current, tombstone-closed) — the warehouse-side history twin of
  q96's latest-wins apply and q08's upsert (reference upsert contract:
  2.2 loading-lambda-for-mysql.py:209-217 keeps only latest; SCD2 is
  what a reporting warehouse keeps instead).
- q101 int8 embedding quantization: per-dimension affine int8 codes
  with exact integer reconstruction error — the compression pass a
  100 TB vector store runs before ANN indexing. Two-pass: one
  64-group stats aggregate, then a broadcast one-row parameter join
  and an in-row fold (q97's kernel shape).
- q102 series anomaly audit: per-(event_type, day) counts flagged by
  an INTEGER z-score test — z^2 > 9 rewritten as
  (n*c - S)^2 > 9*(n*Q - S^2) over exact count sums, so "3 sigma"
  needs no float variance anywhere.
- q103 BPE pair statistics: the first tokenizer-training merge step —
  adjacent character-pair counts weighted by word frequency, top-20.
  The explode runs over the VOCABULARY relation (distinct words),
  never the raw corpus: at 100 TB the vocab is orders of magnitude
  smaller than the text.
- q104 multi-vector MaxSim: ColBERT-style late interaction — each
  embedding is 8 sub-vectors of 8 dims; score(q,d) = sum over query
  sub-vectors of the max dot-product against any doc sub-vector,
  exact over quantized BIGINTs; top-3 per query.
- q105 shard manifest: per-shard (n_docs, n_tokens, n_chars,
  membership fingerprint) over the q60-style seeded global shuffle —
  the manifest file a data loader checks before an epoch.

The reference pipeline (CSV -> MySQL/DynamoDB loads) stops at q08's
upsert; these extend the Tier-C suite with oracle-backed contracts.
All arithmetic that crosses engines is integer (BIGINT) or md5, the
established bit-exactness discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..sources.chunking import add_autoid
from .core import ORACLE, _q
from .corpus import CDC_LOG_CTE, _md5_ordered, cdc_log

# --------------------------------------------------------------------------
# q99 domain PageRank — fixed-point integer PageRank over a
# deterministic domain link graph (69 domains; each document
# contributes one edge, derived row-locally from doc_id so both
# engines build the identical graph with no join).
#
# Numerics: ranks are scaled by 1e6. r_{t+1}(v) =
#   0.15*SCALE + 0.85 * sum_{u->v} (r_t(u) * w(u,v)) div W(u)
# with every division a truncating BIGINT division over non-negative
# operands — both engines agree bit-for-bit, so 3 iterations compose
# exactly. Dangling mass (nodes with no out-edges) is dropped, the
# standard "leaky" variant.
#
# Scale shape: the one data-sized operation is the edge aggregation
# (one shuffle with map-side combine); iterations then run on the
# aggregated (src, dst, w) relation. Here the rank/out-weight
# relations (<=69 rows) BROADCAST into the edge join; on a 100M-node
# web graph the same loop runs with the broadcasts swapped for
# shuffle hash joins keyed by src — the plan degrades gracefully
# because the join keys don't change.

_PR_SCALE = 1_000_000
_PR_BASE = 150_000  # 0.15 * SCALE
_PR_ITERS = 3
_PR_NODES = 69  # 23 names x 3 TLDs, same residue family as q82's URLs

_PR_LABEL_SQL = """'d' || CAST(node % 23 AS VARCHAR) || '.example'
    || CAST(node % 3 AS VARCHAR)
    || CASE node % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.net' ELSE '.xxx' END"""

# same label, Spark dialect (CAST AS STRING, not VARCHAR)
_PR_LABEL_SPARK = """concat('d', CAST(node % 23 AS STRING), '.example',
    CAST(node % 3 AS STRING),
    CASE node % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.net' ELSE '.xxx' END)"""


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""c{cur} AS (
    SELECT e.t AS node, SUM(r.r * e.w // o.tw) AS m
    FROM edges e JOIN r{prev} r ON r.node = e.s JOIN outw o ON o.s = e.s
    GROUP BY 1
),
r{cur} AS (
    SELECT n.node,
           CAST({_PR_BASE} + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS r
    FROM nodes n LEFT JOIN c{cur} c ON n.node = c.node
)"""


ORACLE["q99_domain_pagerank"] = f"""
WITH e0 AS (
    SELECT doc_id % {_PR_NODES} AS s,
           (doc_id * 31 + 7) % {_PR_NODES} AS t
    FROM documents
),
edges AS (SELECT s, t, CAST(COUNT(*) AS BIGINT) AS w FROM e0 GROUP BY 1, 2),
outw AS (SELECT s, CAST(SUM(w) AS BIGINT) AS tw FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT s AS node FROM e0
          UNION SELECT DISTINCT t AS node FROM e0),
inw AS (SELECT t AS node, CAST(SUM(w) AS BIGINT) AS iw FROM edges GROUP BY 1),
r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM nodes),
{_pr_iter_sql('0', '1')},
{_pr_iter_sql('1', '2')},
{_pr_iter_sql('2', '3')}
SELECT {_PR_LABEL_SQL.replace('node', 'r.node')} AS domain,
       CAST(COALESCE(o.tw, 0) AS BIGINT) AS out_w,
       CAST(COALESCE(i.iw, 0) AS BIGINT) AS in_w,
       r.r AS rank_fp
FROM r3 r
LEFT JOIN outw o ON o.s = r.node
LEFT JOIN inw i ON i.node = r.node
ORDER BY domain
"""


@_q("q99_domain_pagerank")
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e0 = d.select(
        (F.col("doc_id") % _PR_NODES).alias("s"),
        ((F.col("doc_id") * 31 + 7) % _PR_NODES).alias("t"),
    )
    # the one data-sized shuffle; everything after runs on <=69x69 rows
    edges = (
        e0.groupBy("s", "t").agg(F.count(F.lit(1)).alias("w")).persist()
    )
    outw = edges.groupBy("s").agg(F.sum("w").cast("bigint").alias("tw"))
    nodes = (
        e0.select(F.col("s").alias("node"))
        .union(e0.select(F.col("t").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.select(
        "node", F.lit(_PR_SCALE).cast("bigint").alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(
                F.broadcast(ranks.withColumnRenamed("node", "s")), "s"
            )
            .join(F.broadcast(outw), "s")
            .select(
                F.col("t").alias("node"),
                F.expr("(r * w) div tw").alias("m"),
            )
            .groupBy("node")
            .agg(F.sum("m").alias("m"))
        )
        ranks = nodes.join(F.broadcast(contrib), "node", "left").select(
            "node",
            F.expr(
                f"CAST({_PR_BASE} + (85 * coalesce(m, 0L)) div 100 AS BIGINT)"
            ).alias("r"),
        )
    inw = edges.groupBy(F.col("t").alias("node")).agg(
        F.sum("w").cast("bigint").alias("iw")
    )
    return (
        ranks.join(
            F.broadcast(outw.withColumnRenamed("s", "node")), "node", "left"
        )
        .join(F.broadcast(inw), "node", "left")
        .select(
            F.expr(_PR_LABEL_SPARK).alias("domain"),
            F.coalesce("tw", F.lit(0)).cast("bigint").alias("out_w"),
            F.coalesce("iw", F.lit(0)).cast("bigint").alias("in_w"),
            F.col("r").alias("rank_fp"),
        )
        .orderBy("domain")
    )


# --------------------------------------------------------------------------
# q100 SCD Type-2 historization — fold the CDC change log (q96's
# fixture) into versioned dimension rows: each non-delete change
# opens a version valid from its sequence number until the NEXT
# change (any op, including the tombstone that closes history);
# versions with no successor are current. Shape: one key shuffle
# feeding two same-partitioning windows (LEAD over all events, then
# per-key version numbers over the survivors) — Spark reuses the
# exchange, so the whole history build is one pass.

ORACLE["q100_scd2_history"] = f"""
WITH {CDC_LOG_CTE},
h AS (
    SELECT k, qp, seq, op,
           LEAD(seq) OVER (PARTITION BY k ORDER BY seq, op) AS next_seq
    FROM log
),
v AS (
    SELECT k, qp, op, seq AS valid_from_seq,
           COALESCE(next_seq, -1) AS valid_to_seq,
           CASE WHEN next_seq IS NULL THEN 1 ELSE 0 END AS is_current,
           ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq, op) AS ver
    FROM h WHERE op <> 'D'
)
SELECT k, CAST(ver AS INT) AS ver, op, CAST(qp AS BIGINT) AS qp,
       CAST(valid_from_seq AS INT) AS valid_from_seq,
       CAST(valid_to_seq AS INT) AS valid_to_seq,
       CAST(is_current AS INT) AS is_current
FROM v ORDER BY k, ver
"""


@_q("q100_scd2_history")
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = cdc_log(spark, sf_dir)
    # (seq, op) is unique within a key (the only seq collision is the
    # U/I overlap at seq 1, distinct ops) so LEAD is deterministic
    w_all = Window.partitionBy("k").orderBy("seq", "op")
    h = log.withColumn("next_seq", F.lead("seq").over(w_all))
    return (
        h.filter(F.col("op") != "D")
        .withColumn("ver", F.row_number().over(w_all).cast("int"))
        .select(
            "k",
            "ver",
            "op",
            F.col("qp").cast("bigint").alias("qp"),
            F.col("seq").cast("int").alias("valid_from_seq"),
            F.coalesce("next_seq", F.lit(-1)).cast("int").alias("valid_to_seq"),
            F.col("next_seq").isNull().cast("int").alias("is_current"),
        )
        .orderBy("k", "ver")
    )


# --------------------------------------------------------------------------
# q101 int8 embedding quantization — per-dimension affine codes:
# q8 = ((qv - mn) * 255) div rng over the quantized-BIGINT components
# (qv = floor(x*1000), the catalog-wide convention), reconstruction
# recon = mn + (q8 * rng) div 255, error |recon - qv|. All operands
# non-negative BIGINTs, so the truncating divisions agree across
# engines and the per-vector error totals are exact.
#
# Scale shape: pass 1 computes 64 (min, range) pairs with a map-side-
# combined aggregate; the parameters fold into ONE broadcast row of
# arrays, and pass 2 is an in-row transform/aggregate over each
# embedding (q97's kernel shape) — no per-component join against the
# corpus, no driver-side stats collect.

_Q8_LEVELS = 255

ORACLE["q101_int8_quantize"] = f"""
WITH comp AS (
    SELECT vec_id, i AS pos,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
    FROM embeddings, range(1, 65) t(i)
),
stats AS (
    SELECT pos, MIN(qv) AS mn,
           GREATEST(MAX(qv) - MIN(qv), 1) AS rng
    FROM comp GROUP BY pos
),
e AS (
    SELECT c.vec_id,
           abs(s.mn + ((((c.qv - s.mn) * {_Q8_LEVELS}) // s.rng) * s.rng)
                   // {_Q8_LEVELS} - c.qv) AS err
    FROM comp c JOIN stats s USING (pos)
)
SELECT vec_id,
       CAST(SUM(err) AS BIGINT) AS sum_abs_err,
       CAST(MAX(err) AS BIGINT) AS max_abs_err
FROM e GROUP BY vec_id ORDER BY vec_id
"""


@_q("q101_int8_quantize")
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", qv.alias("qv")
    )
    comp = emb.select(
        "vec_id", F.posexplode("qv").alias("pos0", "q")
    )
    stats = comp.groupBy("pos0").agg(
        F.min("q").alias("mn"),
        F.greatest(F.max("q") - F.min("q"), F.lit(1)).alias("rng"),
    )
    # fold the 64 per-dimension params into one broadcastable row
    params = stats.agg(
        F.array_sort(F.collect_list(F.struct("pos0", "mn", "rng"))).alias("st")
    ).select(
        F.expr("transform(st, s -> s.mn)").alias("mn_arr"),
        F.expr("transform(st, s -> s.rng)").alias("rng_arr"),
    )
    err_arr = F.expr(
        f"""transform(qv, (x, i) ->
            abs(element_at(mn_arr, i + 1)
                + (((((x - element_at(mn_arr, i + 1)) * {_Q8_LEVELS})
                      div element_at(rng_arr, i + 1))
                    * element_at(rng_arr, i + 1)) div {_Q8_LEVELS})
                - x))"""
    )
    return (
        emb.crossJoin(F.broadcast(params))
        .select("vec_id", err_arr.alias("errs"))
        .select(
            "vec_id",
            F.expr("aggregate(errs, 0L, (a, v) -> a + v)").alias("sum_abs_err"),
            F.array_max("errs").alias("max_abs_err"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# q102 series anomaly audit — flag (event_type, day) count outliers
# with an integer z-score test. For a type with n days, day-count sum
# S and square-sum Q, the day c is anomalous iff z^2 > 9, i.e.
#   (n*c - S)^2 > 9 * (n*Q - S^2)
# — exact BIGINT on both sides, so "3 sigma" never touches a float.
# A zero-variance series flags any deviating day (dev2 > 0 = thr),
# the natural limit of the test. Shape: one (type, day) aggregate
# with map-side combine, then a broadcast join of the tiny per-type
# stats relation.

ORACLE["q102_anomaly_zscore"] = """
WITH day AS (
    SELECT event_type,
           strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
st AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS q
    FROM day GROUP BY 1
)
SELECT d.event_type, d.day, d.c AS n_events,
       CAST((st.n * d.c - st.s) * (st.n * d.c - st.s) AS BIGINT) AS dev2,
       CAST(9 * (st.n * st.q - st.s * st.s) AS BIGINT) AS thr,
       CAST((st.n * d.c - st.s) * (st.n * d.c - st.s) >
            9 * (st.n * st.q - st.s * st.s) AS INT) AS is_anomaly
FROM day d JOIN st USING (event_type)
ORDER BY event_type, day
"""


@_q("q102_anomaly_zscore")
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts_us")
    day = (
        e.select(
            "event_type",
            F.to_date(F.timestamp_micros(F.col("ts_us")))
            .cast("string")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    st = day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    dev2 = F.expr("(n * c - s) * (n * c - s)")
    thr = F.expr("9 * (n * q - s * s)")
    return (
        day.join(F.broadcast(st), "event_type")
        .select(
            "event_type",
            "day",
            F.col("c").alias("n_events"),
            dev2.cast("bigint").alias("dev2"),
            thr.cast("bigint").alias("thr"),
            (dev2 > thr).cast("int").alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# q103 BPE pair statistics — the counting step of one tokenizer-
# training merge iteration: adjacent character pairs inside each word,
# weighted by corpus word frequency; top-20 pairs (deterministic ties
# by pair). The pair explode runs over the DISTINCT-word relation, so
# its cost scales with vocabulary size, not corpus size — the raw
# corpus is touched exactly once, by the word-frequency aggregate.

_Q103_TOPK = 20

ORACLE["q103_bpe_pair_stats"] = f"""
WITH tf AS (
    SELECT u.t AS term, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
    GROUP BY 1
),
p AS (
    SELECT substring(term, CAST(u.i AS INT), 2) AS pair, SUM(n) AS n_occ
    FROM tf, UNNEST(range(1, length(term))) AS u(i)
    GROUP BY 1
)
SELECT pair, CAST(n_occ AS BIGINT) AS n_occ
FROM p ORDER BY n_occ DESC, pair LIMIT {_Q103_TOPK}
"""


@_q("q103_bpe_pair_stats")
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # words shorter than 2 chars have no pairs (the oracle's empty
    # range); the filter also keeps sequence() ascending
    pairs = tf.filter(F.length("term") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(term) - 1),"
                " i -> substring(term, i, 2))"
            )
        ).alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("bigint").alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), "pair")
        .limit(_Q103_TOPK)
    )


# --------------------------------------------------------------------------
# q104 multi-vector MaxSim — ColBERT-style late-interaction scoring:
# each 64-dim embedding is read as 8 sub-vectors of 8 dims;
# score(q, d) = sum over the query's sub-vectors of the MAX dot
# product against any of the doc's sub-vectors; top-3 docs per query
# (queries = vec_id < 8, deterministic ties by doc id). Dots are
# exact quantized-BIGINT, so max/sum/rank agree across engines.
#
# Scale shape: the bounded query side broadcasts and the corpus
# streams past it once (q97's sanctioned broadcast-small cross-join
# shape); the 8x8x8 interaction is an in-row integer fold — no
# per-sub-vector explode, no positional join.

_Q104_NQ = 8
_Q104_K = 3
_Q104_SUBS = 8  # sub-vectors per embedding, 8 dims each

ORACLE["q104_multivector_maxsim"] = f"""
WITH q AS (
    SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
                          x -> CAST(floor(x * 1000) AS BIGINT)) AS qv
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
           CAST(list_sum(list_transform(range(0, {_Q104_SUBS}), i ->
               list_aggregate(list_transform(range(0, {_Q104_SUBS}), j ->
                   list_sum(list_transform(range(1, 9), s ->
                       a.qv[i * 8 + s] * b.qv[j * 8 + s]))
               ), 'max')
           )) AS BIGINT) AS score
    FROM q a JOIN q b ON a.vec_id < {_Q104_NQ} AND a.vec_id <> b.vec_id
),
rk AS (
    SELECT query_id, doc_id, score,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS rn
    FROM pairs
)
SELECT query_id, CAST(rn AS INT) AS rnk, doc_id, score
FROM rk WHERE rn <= {_Q104_K} ORDER BY query_id, rnk
"""


@_q("q104_multivector_maxsim")
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", qv.alias("qv")
    )
    a = emb.filter(F.col("vec_id") < _Q104_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("aq")
    )
    b = emb.select(F.col("vec_id").alias("doc_id"), F.col("qv").alias("bq"))
    score = F.expr(
        f"""aggregate(sequence(0, {_Q104_SUBS - 1}), 0L, (acc, i) ->
            acc + array_max(transform(sequence(0, {_Q104_SUBS - 1}), j ->
                aggregate(sequence(1, 8), 0L, (a2, s) ->
                    a2 + element_at(aq, i * 8 + s)
                       * element_at(bq, j * 8 + s)))))"""
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        b.crossJoin(F.broadcast(a))
        .filter(F.col("query_id") != F.col("doc_id"))
        .select("query_id", "doc_id", score.alias("score"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _Q104_K)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# q105 shard manifest — the per-shard summary a trainer's data loader
# verifies before an epoch: document count, token/char totals, and a
# membership fingerprint (md5 of doc ids in shuffle order) for each
# of the 8 shards of a seeded global shuffle. Reuses the q60 plan
# (add_autoid: range partition + broadcast offsets, no global
# window); the manifest itself is one 8-group aggregate.

_Q105_SHARDS = 8
_Q105_SEED = "105|"

ORACLE["q105_shard_manifest"] = f"""
WITH k AS (
    SELECT doc_id, text,
           md5('{_Q105_SEED}' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
),
p AS (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (ORDER BY shuffle_key) AS pos
    FROM k
)
SELECT CAST((pos - 1) % {_Q105_SHARDS} AS INT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       md5(string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY pos)) AS docs_md5
FROM p GROUP BY 1 ORDER BY 1
"""


@_q("q105_shard_manifest")
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    keyed = d.select(
        "doc_id",
        "text",
        F.md5(
            F.concat(
                F.lit(_Q105_SEED), F.col("doc_id").cast("string")
            ).cast("binary")
        ).alias("shuffle_key"),
    )
    pos = add_autoid(keyed, ["shuffle_key"]).withColumnRenamed(
        "autoid", "pos"
    )
    return (
        pos.select(
            ((F.col("pos") - 1) % _Q105_SHARDS).cast("int").alias("shard"),
            "doc_id",
            "pos",
            F.size(F.split(F.col("text"), " ")).alias("ntok"),
            F.length("text").alias("nch"),
            F.col("doc_id").cast("string").alias("ds"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
            F.sum("nch").cast("bigint").alias("n_chars"),
            _md5_ordered("ds", "pos").alias("docs_md5"),
        )
        .orderBy("shard")
    )

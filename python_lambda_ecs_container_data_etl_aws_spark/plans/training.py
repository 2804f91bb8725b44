"""Training-set assembly queries q58-q63 and q65-q66: the operations
that turn a cleaned corpus (q17-q30, q44-q57) into what a trainer
actually reads — context windows, salient terms, a deterministic
global shuffle, an epoch-replicated mixture, classifier-scored
quality, per-slice inspection samples, and integer JL projection
feeding projected kNN retrieval.

The reference pipeline stops at warehouse loads; these extend the
Tier-C LLM-operator suite on its `documents` table.

Scale posture (the reason each plan looks the way it does):

- q58 window generation is a per-row explode — zero shuffles; output
  volume is sum(ceil(tokens/stride)), the same fan-out a tokenizer
  shard job produces, and it streams through whole-stage codegen.
- q59 aggregates (doc, term) BEFORE joining the vocabulary relation,
  so the head-token skew lands in a map-side-combined agg, not a
  shuffled join of raw token rows; AQE broadcasts the vocab side when
  it is small.
- q60 reuses the two-pass range-partition/offset plan from
  `sources/chunking.add_autoid` — a deterministic global permutation
  with NO single-partition global window (the classic ROW_NUMBER()
  OVER (ORDER BY ...) scale-killer).
- q61 replication is explode(sequence(...)) — row fan-out inside the
  scan stage; the only shuffle is the final small rollup.

Every hash/score is engine-portable (md5 buckets, single IEEE
divisions, exact BIGINT projections) so every query in this module is
value-hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..sources.chunking import add_autoid
from .core import ORACLE, _q
from .curation import MD5_BUCKET100_SQL, md5_bucket100

# --------------------------------------------------------------------------
# q58 sliding context windows with overlap (RAG / long-context chunking).
# Window = 16 tokens, stride = 8 (50% overlap). A document with n tokens
# yields ceil(max(n-16,0)/8)+1 windows; the last window may be short.

_WIN = 16
_STRIDE = 8

ORACLE["q58_sliding_windows"] = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
x AS (
    SELECT doc_id, toks, CAST(u.i AS INT) AS win_idx
    FROM tok, UNNEST(range(0, (greatest(len(toks) - {_WIN}, 0) + {_STRIDE} - 1)
                              // {_STRIDE} + 1)) AS u(i)
),
s AS (
    SELECT doc_id, win_idx,
           list_slice(toks, win_idx * {_STRIDE} + 1,
                      win_idx * {_STRIDE} + {_WIN}) AS win
    FROM x
)
SELECT doc_id, win_idx, CAST(len(win) AS INT) AS win_tokens,
       win[1] AS head_tok, md5(array_to_string(win, ' ')) AS win_md5
FROM s ORDER BY doc_id, win_idx
"""


@_q("q58_sliding_windows")
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # integer `div` keeps the window count exact (no float floor)
    d = d.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.expr(
            f"CAST((greatest(size(split(text, ' ')) - {_WIN}, 0) + {_STRIDE} - 1) "
            f"div {_STRIDE} AS INT)"
        ).alias("extra"),
    )
    win = F.slice(F.col("toks"), F.col("win_idx") * _STRIDE + 1, _WIN)
    return (
        d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("extra"))).alias("win_idx"),
            "toks",
        )
        .select("doc_id", "win_idx", win.alias("win"))
        .select(
            "doc_id",
            "win_idx",
            F.size("win").alias("win_tokens"),
            F.element_at("win", 1).alias("head_tok"),
            F.md5(F.array_join("win", " ").cast("binary")).alias("win_md5"),
        )
        .orderBy("doc_id", "win_idx")
    )


# --------------------------------------------------------------------------
# q59 per-document salient terms by TF-IDF rank. score = tf / df is ONE
# IEEE division — bit-identical in both engines; ties break on the term
# itself so the top-3 cut is deterministic.

_TOPK = 3

ORACLE["q59_tfidf_topterms"] = f"""
WITH tok AS (
    SELECT doc_id, u.t AS term
    FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           CAST(tf.tf AS DOUBLE) / df.df AS score,
           ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                              ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC,
                                       tf.term) AS rk
    FROM tf JOIN df USING (term)
)
SELECT doc_id, CAST(rk AS INT) AS rk, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
FROM scored WHERE rk <= {_TOPK} ORDER BY doc_id, rk
"""


@_q("q59_tfidf_topterms")
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("tf").cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term"))
    return (
        tf.join(df_rel, "term")
        .withColumn("score", score)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select("doc_id", "rk", "term", "tf", "df", "score")
        .orderBy("doc_id", "rk")
    )


# --------------------------------------------------------------------------
# q60 deterministic global training shuffle: permute the corpus by a
# seeded md5 key and hand out dense positions + shards. The position
# comes from the add_autoid two-pass plan (range partition + broadcast
# offsets), not a global window.

_SEED = "42|"
_SHARDS = 8

ORACLE["q60_seeded_shuffle"] = f"""
WITH k AS (
    SELECT doc_id, md5('{_SEED}' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
),
p AS (
    SELECT doc_id, shuffle_key,
           ROW_NUMBER() OVER (ORDER BY shuffle_key) AS shuffle_pos
    FROM k
)
SELECT doc_id, shuffle_key, CAST(shuffle_pos AS BIGINT) AS shuffle_pos,
       CAST((shuffle_pos - 1) % {_SHARDS} AS INT) AS shard
FROM p ORDER BY shuffle_pos
"""


@_q("q60_seeded_shuffle")
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.md5(
            F.concat(F.lit(_SEED), F.col("doc_id").cast("string")).cast("binary")
        ).alias("shuffle_key"),
    )
    out = (
        add_autoid(keyed, ["shuffle_key"])
        .withColumnRenamed("autoid", "shuffle_pos")
        .withColumn(
            "shard", ((F.col("shuffle_pos") - 1) % _SHARDS).cast("int")
        )
        .select("doc_id", "shuffle_key", "shuffle_pos", "shard")
        .orderBy("shuffle_pos")
    )
    return out


# --------------------------------------------------------------------------
# q61 epoch-replicated mixture: upsample each source to a fractional
# epoch target (even sources 2.5 epochs, odd 1.25). Whole epochs
# replicate every document; the fractional tail keeps the md5 bucket
# below rate%100 — the exact complement of q50's downsampler.

ORACLE["q61_epoch_mixture"] = f"""
WITH h AS (
    SELECT doc_id, source,
           {MD5_BUCKET100_SQL.format(col='doc_id')} AS b,
           CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                THEN 250 ELSE 125 END AS rate
    FROM documents
),
c AS (
    SELECT doc_id, source,
           rate // 100 + CASE WHEN b < rate % 100 THEN 1 ELSE 0 END AS n_copies
    FROM h
),
e AS (
    SELECT source, CAST(u.i AS INT) AS epoch
    FROM c, UNNEST(range(1, n_copies + 1)) AS u(i)
)
SELECT source, epoch, COUNT(*) AS n_docs
FROM e GROUP BY 1, 2 ORDER BY 1, 2
"""


@_q("q61_epoch_mixture")
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b = md5_bucket100(F.col("doc_id"))
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(250)
    ).otherwise(F.lit(125))
    n_copies = (rate / 100).cast("int") + F.when(b < rate % 100, 1).otherwise(0)
    return (
        d.select(
            "source",
            F.explode(
                F.sequence(F.lit(1), n_copies.cast("int"))
            ).alias("epoch"),
        )
        .groupBy("source", "epoch")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "epoch")
    )


# --------------------------------------------------------------------------
# q62 quality-classifier inference: a (fasttext-style) linear model
# applied as a projection. Weights are integer-quantized literals, the
# features are integer counts, so the logit is an exact BIGINT in both
# engines — model inference with zero float hazard and zero shuffles
# (the classic "score 100 TB with a small model" job is exactly this
# plan plus a real weight vector).

_W_TOK, _W_UPPER, _W_DIGIT, _W_PUNCT, _BIAS = 3, -2, -1, -4, 50
_LOGIT_KEEP = 120


ORACLE["q62_quality_classifier"] = f"""
WITH f AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
           length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
    FROM documents
)
SELECT doc_id,
       CAST({_BIAS} + {_W_TOK} * n_tokens + {_W_UPPER} * n_upper
            + {_W_DIGIT} * n_digit + {_W_PUNCT} * n_punct AS BIGINT) AS logit_q,
       ({_BIAS} + {_W_TOK} * n_tokens + {_W_UPPER} * n_upper
            + {_W_DIGIT} * n_digit + {_W_PUNCT} * n_punct) >= {_LOGIT_KEEP} AS keep
FROM f ORDER BY doc_id
"""


@_q("q62_quality_classifier")
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    n_upper = F.length(F.regexp_replace("text", "[^A-Z]", ""))
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace("text", "[^.,;:!?]", ""))
    logit = (
        F.lit(_BIAS)
        + _W_TOK * n_tokens
        + _W_UPPER * n_upper
        + _W_DIGIT * n_digit
        + _W_PUNCT * n_punct
    ).cast("bigint")
    return (
        d.select(
            "doc_id",
            logit.alias("logit_q"),
            (logit >= _LOGIT_KEEP).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q63 deterministic per-group inspection sample: the first 3 documents
# of every (source, lang) group under a seeded md5 order — "show me a
# few examples per slice" without ORDER BY RANDOM() nondeterminism.
# The window partitions by group key, so the sort is per-group and
# distributed, never global.

_SAMPLE_K = 3

ORACLE["q63_group_sample"] = f"""
WITH r AS (
    SELECT source, lang, doc_id,
           md5('63|' || CAST(doc_id AS VARCHAR)) AS pick_key,
           ROW_NUMBER() OVER (PARTITION BY source, lang
                              ORDER BY md5('63|' || CAST(doc_id AS VARCHAR))) AS rk
    FROM documents
)
SELECT source, lang, CAST(rk AS INT) AS rk, doc_id
FROM r WHERE rk <= {_SAMPLE_K} ORDER BY source, lang, rk
"""


@_q("q63_group_sample")
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pick = F.md5(F.concat(F.lit("63|"), F.col("doc_id").cast("string")).cast("binary"))
    w = Window.partitionBy("source", "lang").orderBy(pick)
    return (
        d.select("source", "lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _SAMPLE_K)
        .select("source", "lang", "rk", "doc_id")
        .orderBy("source", "lang", "rk")
    )


# --------------------------------------------------------------------------
# q65 exact-integer JL projection (quantized Rademacher): narrow every
# embedding 64 -> 16 dims in pure BIGINT arithmetic. The +-1 matrix is
# generated once driver-side (md5 parity, seeded) and rendered as a
# literal into BOTH engines, so the contract is bit-exact — the float
# Gaussian twin (similarity.random_projection) differs across engines
# by summation order and stays a library op with JL-bound tests.

_RP_DIM = 16


def _rp_matrix_duckdb() -> str:
    from ..operators.similarity import _rademacher_matrix

    m = _rademacher_matrix(64, _RP_DIM, 65)
    return (
        "["
        + ", ".join("[" + ", ".join(str(x) for x in row) + "]" for row in m)
        + "]"
    )


ORACLE["q65_rademacher_projection"] = f"""
WITH m AS (SELECT {_rp_matrix_duckdb()}::BIGINT[][] AS mat),
q AS (
    SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
                          x -> CAST(floor(x * 1000) AS BIGINT)) AS qv
    FROM embeddings
)
SELECT vec_id, CAST(u.j AS INT) AS j,
       CAST(list_sum(list_transform(range(1, 65),
                                    i -> qv[i] * mat[u.j][i])) AS BIGINT) AS q_proj
FROM q, m, UNNEST(range(1, {_RP_DIM} + 1)) AS u(j)
ORDER BY vec_id, j
"""


@_q("q65_rademacher_projection")
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import rademacher_projection

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return (
        rademacher_projection(emb, out_dim=_RP_DIM, seed=65)
        .select(
            "vec_id", F.posexplode("qproj").alias("j0", "q_proj")
        )
        .select("vec_id", (F.col("j0") + 1).cast("int").alias("j"), "q_proj")
        .orderBy("vec_id", "j")
    )


# --------------------------------------------------------------------------
# q66 kNN over the PROJECTED space: the reduction actually feeding a
# retrieval stage. Queries = vec_id < 20; for each, top-5 corpus
# neighbors by squared L2 distance over the 16-dim integer projections
# — every distance an exact BIGINT, so the ranking (and the contract)
# is bit-deterministic. Scale shape: the tiny projected query side
# broadcasts; per-pair arithmetic is 16 integer ops instead of 64
# float ops — the dim/k saving q65's docstring promises, measured here.

_KNN_Q = 20
_KNN_K = 5

ORACLE["q66_projected_knn"] = f"""
WITH m AS (SELECT {_rp_matrix_duckdb()}::BIGINT[][] AS mat),
q AS (
    SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
                          x -> CAST(floor(x * 1000) AS BIGINT)) AS qv
    FROM embeddings
),
p AS (
    SELECT vec_id,
           list_transform(range(1, {_RP_DIM} + 1),
                          j -> list_sum(list_transform(range(1, 65),
                                        i -> qv[i] * mat[j][i]))) AS pv
    FROM q, m
),
pairs AS (
    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
           CAST(list_sum(list_transform(range(1, {_RP_DIM} + 1),
                         j -> (a.pv[j] - b.pv[j]) * (a.pv[j] - b.pv[j])))
                AS BIGINT) AS dist2
    FROM p a JOIN p b ON a.vec_id < {_KNN_Q} AND a.vec_id <> b.vec_id
),
rk AS (
    SELECT query_id, cand_id, dist2,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dist2, cand_id) AS rnk
    FROM pairs
)
SELECT query_id, CAST(rnk AS INT) AS rnk, cand_id, dist2
FROM rk WHERE rnk <= {_KNN_K} ORDER BY query_id, rnk
"""


@_q("q66_projected_knn")
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import rademacher_projection

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    proj = rademacher_projection(emb, out_dim=_RP_DIM, seed=65).select(
        "vec_id", "qproj"
    )
    qside = proj.filter(F.col("vec_id") < _KNN_Q).select(
        F.col("vec_id").alias("query_id"), F.col("qproj").alias("q_pv")
    )
    cside = proj.select(
        F.col("vec_id").alias("cand_id"), F.col("qproj").alias("c_pv")
    )
    dist2 = F.expr(
        "aggregate(zip_with(q_pv, c_pv, (x, y) -> (x - y) * (x - y)),"
        " 0L, (a, v) -> a + v)"
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "cand_id")
    return (
        F.broadcast(qside)
        .join(cside, F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", dist2.alias("dist2"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _KNN_K)
        .select("query_id", "rnk", "cand_id", "dist2")
        .orderBy("query_id", "rnk")
    )

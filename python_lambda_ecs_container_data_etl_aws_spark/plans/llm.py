"""LLM-training-data pipeline queries (Tier C, BASELINE.json north star):
deduplication, text analysis, similarity search, multimodal columns —
each with a DuckDB oracle twin so they sit inside the hash contract.

Determinism engineering mirrors plans/core.py. Two extra tricks:

- embeddings are float32; every cross-engine numeric goes through
  ``floor(value * 1000)`` quantization to BIGINT, making dot products
  and norms exact integers (order-independent) — the one remaining
  float op, cosine = dot / (sqrt(qn)*sqrt(cn)), is a fixed-shape IEEE
  expression both engines evaluate identically;
- n-gram/shingle sets are compared relationally (explode → distinct →
  join) instead of via array set-functions, whose dedup semantics
  differ subtly between engines.

The approximate/scale-path variants of these operators (MinHash-LSH,
SimHash, LSH-bucketed ANN) live in ``operators/`` — they are validated
by property tests against these exact versions rather than by SQL
oracles (approximate by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as dedup_ops
from .core import ORACLE, _q

# Shared lexical resources (tiny, literal in both dialects).
STOPWORDS = ("the", "a", "of", "and", "to")
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "de": ("der", "die", "und"),
}
_SQL_STOP = ", ".join(f"'{w}'" for w in STOPWORDS)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q17 exact dedup — hash-groupBy over a corpus with re-ingested copies
# (documents ∪ every 10th doc re-arriving under a new id), the daily-file
# re-load scenario the reference's idempotency gate defends against
# (2.2:219-255). Keep-policy: lowest doc_id survives.
# Scale: one shuffle on text_md5; at 100 TB you'd hash to 128-bit and
# pre-partition by hash prefix — same plan shape.
ORACLE["q17_dedup_exact"] = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS text_md5,
       COUNT(*) AS n_copies,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM corpus GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY keeper_doc_id
"""


@_q("q17_dedup_exact")
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return (
        corpus.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("keeper_doc_id")
    )


# --------------------------------------------------------------------------
# Q18 text quality scoring — per-document length/stopword/alpha ratios,
# the heuristics an LLM-data pipeline gates on. Pure built-in column
# expressions (whole-stage codegen; no UDF).
ORACLE["q18_text_quality"] = f"""
WITH d AS (
    SELECT doc_id, lang, n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '), x -> x IN ({_SQL_STOP}))) AS n_stopwords,
           length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha
    FROM documents
)
SELECT doc_id, lang, n_chars, n_tokens, n_stopwords,
       n_stopwords / n_tokens AS stop_ratio,
       n_alpha / n_chars AS alpha_ratio,
       CAST(n_tokens BETWEEN 20 AND 200 AND n_stopwords > 0 AS INT) AS quality_flag
FROM d ORDER BY doc_id
"""


@_q("q18_text_quality")
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    d = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(f"size(filter(split(text, ' '), x -> x IN ({stop_list})))").alias(
            "n_stopwords"
        ),
        F.length(F.regexp_replace("text", "[^a-z]", "")).alias("n_alpha"),
    )
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        "n_tokens",
        "n_stopwords",
        (F.col("n_stopwords") / F.col("n_tokens")).alias("stop_ratio"),
        (F.col("n_alpha") / F.col("n_chars")).alias("alpha_ratio"),
        (
            F.col("n_tokens").between(20, 200) & (F.col("n_stopwords") > 0)
        ).cast("int").alias("quality_flag"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q19 language-ID — marker-token voting with a fixed precedence
# (en > fr > es > de > unknown), emitted as a confusion matrix against
# the corpus's lang label. A deterministic n-gram-heuristic stand-in for
# fasttext-style LID; the operator version lives in operators/text.py.
def _marker_counts_sql(fn: str) -> dict[str, str]:
    return {
        lang: f"len(list_filter(string_split(text, ' '), x -> x IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in LANG_MARKERS.items()
    }


_M = _marker_counts_sql("d")
ORACLE["q19_lang_id"] = f"""
WITH scored AS (
    SELECT lang,
           {_M['en']} AS s_en, {_M['fr']} AS s_fr,
           {_M['es']} AS s_es, {_M['de']} AS s_de
    FROM documents
),
pred AS (
    SELECT lang,
           CASE WHEN s_en > 0 AND s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
                WHEN s_fr > 0 AND s_fr >= greatest(s_es, s_de) THEN 'fr'
                WHEN s_es > 0 AND s_es >= s_de THEN 'es'
                WHEN s_de > 0 THEN 'de'
                ELSE 'unknown' END AS pred_lang
    FROM scored
)
SELECT lang AS actual_lang, pred_lang, COUNT(*) AS n_docs
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


@_q("q19_lang_id")
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        *[
            F.expr(
                f"size(filter(split(text, ' '), x -> x IN ({', '.join(repr(w) for w in words)})))"
            ).alias(f"s_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    pred = scored.select(
        "lang",
        F.when(
            (F.col("s_en") > 0)
            & (F.col("s_en") >= F.greatest("s_fr", "s_es", "s_de")),
            F.lit("en"),
        )
        .when((F.col("s_fr") > 0) & (F.col("s_fr") >= F.greatest("s_es", "s_de")), F.lit("fr"))
        .when((F.col("s_es") > 0) & (F.col("s_es") >= F.col("s_de")), F.lit("es"))
        .when(F.col("s_de") > 0, F.lit("de"))
        .otherwise(F.lit("unknown"))
        .alias("pred_lang"),
    )
    return (
        pred.groupBy(F.col("lang").alias("actual_lang"), "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual_lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# Q20 token profile — BPE-ish regex tokenization ([a-z]+ runs after
# lowercasing), profiled per source. avg via one IEEE division.
ORACLE["q20_token_profile"] = """
WITH d AS (
    SELECT source, n_chars,
           len(regexp_extract_all(lower(text), '[a-z]+')) AS n_tokens
    FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS BIGINT) / COUNT(*) AS avg_tokens_per_doc
FROM d GROUP BY 1 ORDER BY 1
"""


@_q("q20_token_profile")
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.expr("size(regexp_extract_all(lower(text), '[a-z]+', 0))").alias("n_tokens"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (F.sum("n_tokens").cast("bigint") / F.count(F.lit(1))).alias(
                "avg_tokens_per_doc"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q21 document fingerprinting — md5 over normalized text (lowercase,
# alpha+space only), truncated to 16 hex chars; per-source uniqueness.
ORACLE["q21_fingerprint"] = """
WITH d AS (
    SELECT source,
           substr(md5(regexp_replace(lower(text), '[^a-z ]', '', 'g')), 1, 16) AS fp
    FROM documents
)
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_fingerprints
FROM d GROUP BY 1 ORDER BY 1
"""


@_q("q21_fingerprint")
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.substring(
            F.md5(F.regexp_replace(F.lower("text"), "[^a-z ]", "")), 1, 16
        ).alias("fp"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_fingerprints"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q22 n-gram Jaccard near-dedup — word-3-gram shingle sets compared
# relationally: explode → distinct → self-join on shingle → pair
# intersection counts; |A∪B| = |A|+|B|−|A∩B|. Finds the corpus's
# planted near-duplicate pairs exactly. Scale: this is the exact
# (quadratic-candidate) baseline; operators/dedup.py MinHash-LSH is the
# 100 TB path that bands the same shingle sets to kill the self-join.
_JACCARD_MIN = 0.5
ORACLE["q22_ngram_jaccard_neardup"] = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
shingle AS (
    SELECT DISTINCT doc_id, s FROM tok,
    UNNEST(list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS u(s)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingle GROUP BY 1),
inter AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
    FROM shingle a JOIN shingle b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT a_id, b_id, n_inter,
       sa.n + sb.n - n_inter AS n_union,
       n_inter / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE n_inter / (sa.n + sb.n - n_inter) >= {_JACCARD_MIN}
ORDER BY a_id, b_id
"""


@_q("q22_ngram_jaccard_neardup")
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.spread import spread_scan

    d = _t(spark, sf_dir, "documents")
    # Per-row array_distinct (shingle-distinctness is a per-document
    # property) then explode — the corpus-wide .distinct() exchange
    # this replaces did the same dedup with a full shuffle. Short-doc
    # guard: <3 tokens → zero shingles (ANSI-safe; the DuckDB twin's
    # range(1, len-1) is empty for the same docs).
    # spread_scan: q22's shingle build + exact all-candidate verify is
    # the heaviest per-row expansion in the catalog; on a narrow scan
    # (single-file testdata) it would run on one core. A/B at sf0.1:
    # 3.3 s → 2.1 s. The same spread was measured on the LIGHTER
    # expansions (q55/q59/q64/q69/q70/q73/q44) and REGRESSED them
    # ~1.5-2x (extra stage > parallelism gain) — so it stays at the
    # call sites with a measured win: here, the two simhash signature
    # builders, and q180's replicate explode (round-11 re-measured the
    # shared shingle builders: still a loss, see operators/dedup.py).
    # hash shingles to 64-bit keys right after the explode: the
    # self-join and its partial-count shuffle carry 8-byte keys, not
    # 3-gram strings (a collision would fail the oracle comparison
    # loudly, not drift silently)
    shingle = (
        dedup_ops.doc_shingles(spread_scan(d), "text", "doc_id", 3)
        .select(F.col("id").alias("doc_id"), F.explode("sh").alias("s0"))
        .select("doc_id", F.xxhash64("s0").alias("s"))
        .persist()  # feeds sizes + both sides of the self-join
    )
    sizes = shingle.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingle.alias("a"), shingle.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    j = (
        inter.join(F.broadcast(sa), F.col("a_id") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            "n_inter",
            (F.col("sa.n") + F.col("sb.n") - F.col("n_inter")).alias("n_union"),
            (F.col("n_inter") / (F.col("sa.n") + F.col("sb.n") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
    )
    return j.filter(F.col("jaccard") >= _JACCARD_MIN).orderBy("a_id", "b_id")


# --------------------------------------------------------------------------
# Q23 brute-force cosine top-k — ANN baseline: 10 query vectors against
# the full embedding table, relational dot product over quantized
# components (floor(v*1000) → exact integer dot/norms; cosine is one
# fixed IEEE expression). Top-3 per query, rank ties broken by vec_id.
# Scale: the candidate side partitions by pos; operators/similarity.py
# holds the LSH-bucketed variant that prunes candidates first.
_KNN_K = 3
ORACLE["q23_knn_bruteforce"] = f"""
WITH comp AS (
    SELECT vec_id, i AS pos,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
    FROM embeddings, range(1, 65) t(i)
),
norms AS (SELECT vec_id, SUM(qv * qv) AS nrm FROM comp GROUP BY 1),
dots AS (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id, SUM(q.qv * c.qv) AS dot
    FROM comp q JOIN comp c ON q.pos = c.pos
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    GROUP BY 1, 2
),
scored AS (
    SELECT query_id, cand_id,
           CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nrm AS DOUBLE)) * sqrt(CAST(nc.nrm AS DOUBLE))) AS cosine
    FROM dots
    JOIN norms nq ON nq.vec_id = query_id
    JOIN norms nc ON nc.vec_id = cand_id
)
SELECT query_id, cand_id, cosine, rnk FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS INT) AS rnk
    FROM scored
) WHERE rnk <= {_KNN_K} ORDER BY query_id, rnk
"""


@_q("q23_knn_bruteforce")
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    # in-row fold kernel (round-4 rewrite, same as q97/q98): the 10
    # query vectors broadcast as quantized BIGINT arrays, the corpus
    # streams past once, and dot product + norms are zip_with/
    # aggregate folds — |queries| x |corpus| rows instead of the
    # 64x pos-exploded join, and the norms relation disappears
    # (exact integer sums are order-free, so values are bit-identical)
    emb = _t(spark, sf_dir, "embeddings")
    qarr = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    )
    nrm = F.expr("aggregate(transform(qv, x -> x * x), 0L, (a, v) -> a + v)")
    eq = emb.select("vec_id", qarr.alias("qv")).withColumn("nrm", nrm)
    q = eq.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qq"),
        F.col("nrm").alias("qn"),
    )
    c = eq.select(
        F.col("vec_id").alias("cand_id"),
        F.col("qv").alias("cq"),
        F.col("nrm").alias("cn"),
    )
    dot = F.expr(
        "aggregate(zip_with(qq, cq, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (
                dot.cast("double")
                / (F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.select("*", F.row_number().over(w).cast("int").alias("rnk"))
        .filter(F.col("rnk") <= _KNN_K)
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# Q24 multimodal binary columns — payloads as opaque BINARY with typed
# metadata (byte length, content checksum), profiled per source. The
# decode/feature-extraction path (mapInPandas, batch-shaped, stubbed
# codecs) lives in operators/multimodal.py.
ORACLE["q24_multimodal_binary"] = """
WITH b AS (
    SELECT source, encode(text) AS payload, md5(text) AS checksum FROM documents
)
SELECT source,
       COUNT(*) AS n_items,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT checksum) AS n_checksums
FROM b GROUP BY 1 ORDER BY 1
"""


@_q("q24_multimodal_binary")
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.md5(F.col("text").cast("binary")).alias("checksum"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
            F.countDistinct("checksum").alias("n_checksums"),
        )
        .orderBy("source")
    )

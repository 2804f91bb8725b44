"""Corpus-mining queries q72-q79: the curation decisions a 100 TB
pre-training pipeline makes AFTER the per-doc quality/dedup signals
exist — capping, scoring, sampling, and novelty measurement.

- q72 per-source document cap: web-scale "max K docs per domain",
  keeping the best K by a quality proxy — one window, no shuffle
  beyond the source-keyed one.
- q73 interpolated bigram LM score: the CCNet/KenLM-shaped
  fluency proxy (q57 is the unigram half); per-token probabilities are
  floor-quantized to BIGINTs so the doc score is an exact integer sum
  with one final IEEE division.
- q74 semantic-dedup survivors: SemDeDup-style greedy-by-id resolution
  over the q29 embedding near-dup pair relation — an anti-join, no
  transitive clustering needed at the decision point.
- q75 per-source quality percentile normalization: cross-source
  threshold harmonization (a raw score that means "good" on src3 may
  be mediocre on src7) via percent_rank, summarized as a decile
  histogram per language.
- q76 stratified sample with exact allocation: a fixed-size eval set
  allocated across language strata by largest-remainder rounding
  (allocations sum EXACTLY to the budget), members picked by a
  deterministic hash order both engines share (md5).
- q77 shingle novelty vs a reference corpus: the graded complement of
  q44's decontamination — what fraction of a new doc's shingles the
  corpus has never seen.
- q78 quality-aware cluster representatives: keep the BEST copy of a
  near-dup cluster (argmax quality), not the arbitrary first.
- q79 normalized-text exact dedup: case/punctuation/whitespace
  variants of the same text are the same document.

The reference pipeline has no curation stage (SURVEY Tier C); these
extend the LLM-operator suite with oracle-backed contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .core import ORACLE, _q

# --------------------------------------------------------------------------
# q72 per-source document cap (domain capping): keep the top K docs per
# source by (n_chars DESC, doc_id) — the "best K per domain" rule that
# stops a single crawled domain from dominating a shard. One
# source-keyed window; the kept-set fingerprint makes the whole kept
# LIST part of the hash contract, not just its size.

_CAP_K = 10

ORACLE["q72_source_cap"] = f"""
WITH r AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {_CAP_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(string_agg(CASE WHEN rn <= {_CAP_K} THEN CAST(doc_id AS VARCHAR) END,
                      ' ' ORDER BY doc_id)) AS kept_md5
FROM r GROUP BY source ORDER BY source
"""


@_q("q72_source_cap")
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Hot-source posture (same shape as q82's domain cap, 15x on the
    # 80%-hot smoke — BASELINE.md): counts are a plain map-side-
    # combining aggregate, and the kept set is a rank FILTER that
    # WindowGroupLimit prunes to ~K rows per map partition before the
    # sort shuffle — a skewed source ships K x partitions rows, never
    # its full population through one sort partition.
    base = d.select("doc_id", "source", "n_chars")
    counts = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    kept = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CAP_K)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.col("doc_id"))),
                        lambda x: x.cast("string"),
                    ),
                    " ",
                ).cast("binary")
            ).alias("kept_md5"),
        )
    )
    return counts.join(kept, "source").orderBy("source")


# --------------------------------------------------------------------------
# q73 interpolated bigram LM score. Corpus model: unigram counts c1,
# bigram counts c2, total tokens N; per adjacent token pair
# p = LAMBDA * c2(w1,w2)/c1(w1) + (1-LAMBDA) * c1(w2)/N, floor-quantized
# to an integer at 1e9 so the per-doc mean is an exact BIGINT sum with
# one final division. LAMBDA = 0.75 is exactly representable in binary,
# and both engines evaluate the identical expression tree, so the
# quantized values agree bit-for-bit. Every observed pair has c2 >= 1
# (the corpus contains the doc), so no smoothing edge case exists.
# Scale shape: two count aggregations (map-side combinable), then
# broadcast-able joins of the pair stream against c2/c1 — the same
# aggregate-before-join posture as q57/q59.

_LM_LAMBDA = "0.75"
_LM_Q = "1000000000"

ORACLE["q73_bigram_lm_score"] = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
uni AS (
    SELECT w, COUNT(*) AS c1 FROM tok, UNNEST(toks) AS u(w) GROUP BY 1
),
total AS (SELECT SUM(c1) AS n FROM uni),
big AS (
    SELECT w1, w2, COUNT(*) AS c2 FROM (
        SELECT toks[i] AS w1, toks[i+1] AS w2
        FROM tok, UNNEST(range(1, len(toks))) AS u(i)
    ) GROUP BY 1, 2
),
pairs AS (
    SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
    FROM tok, UNNEST(range(1, len(toks))) AS u(i)
),
scored AS (
    SELECT p.doc_id,
           CAST(floor({_LM_Q} * ({_LM_LAMBDA} * (CAST(b.c2 AS DOUBLE) / u1.c1)
                + (1 - {_LM_LAMBDA}) * (CAST(u2.c1 AS DOUBLE) / t.n))) AS BIGINT) AS qp
    FROM pairs p
    JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
    JOIN uni u1 ON u1.w = p.w1
    JOIN uni u2 ON u2.w = p.w2
    CROSS JOIN total t
)
SELECT doc_id, COUNT(*) AS n_pairs,
       CAST(SUM(qp) AS BIGINT) AS sum_qp,
       CAST(SUM(qp) AS DOUBLE) / (COUNT(*) * {_LM_Q}) AS lm_score
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@_q("q73_bigram_lm_score")
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.split("text", " ").alias("toks"))
    uni = (
        tok.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    # single-token guard: sequence(1, 0) DESCENDS under Spark and the
    # out-of-bounds toks[i] aborts the job in ANSI mode — same hazard
    # dedup.shingles guards. Filtering short docs BEFORE the generator
    # keeps the transform unconditional; the DuckDB range(1, len) is
    # empty-safe, and a <2-token doc has no pairs in either engine.
    pairs = tok.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    total = uni.agg(F.sum("c1").alias("n"))
    lam, q = float(_LM_LAMBDA), int(_LM_Q)
    u1 = uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1a"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1b"))
    scored = (
        pairs.join(big, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.floor(
                q
                * (
                    lam * (F.col("c2").cast("double") / F.col("c1a"))
                    + (1 - lam) * (F.col("c1b").cast("double") / F.col("n"))
                )
            )
            .cast("bigint")
            .alias("qp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("qp").cast("bigint").alias("sum_qp"),
            (F.sum("qp").cast("double") / (F.count(F.lit(1)) * q)).alias(
                "lm_score"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q74 semantic-dedup survivors: greedy-by-id resolution over the exact
# quantized-cosine pair relation of q29 — a vector survives unless some
# LOWER-id vector sits within the cosine threshold. At the decision
# point this is ONE anti-join on the pair relation (no transitive
# closure needed: the kept set of greedy-by-id is exactly "no smaller
# neighbor"); at 100 TB the pair relation comes from the LSH-bucketed
# path (operators/similarity.lsh_near_dup_pairs) instead of all-pairs.

_SEM_THRESH = 0.4
_SEM_SUBSET = 300

ORACLE["q74_semantic_dedup_survivors"] = f"""
WITH comp AS (
    SELECT vec_id, i AS pos,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
    FROM embeddings, range(1, 65) t(i)
    WHERE vec_id < {_SEM_SUBSET}
),
norms AS (SELECT vec_id, SUM(qv * qv) AS nrm FROM comp GROUP BY 1),
dots AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, SUM(a.qv * b.qv) AS dot
    FROM comp a JOIN comp b ON a.pos = b.pos AND a.vec_id < b.vec_id
    GROUP BY 1, 2
),
dup AS (
    SELECT DISTINCT b_id AS vec_id FROM dots
    JOIN norms na ON na.vec_id = a_id
    JOIN norms nb ON nb.vec_id = b_id
    WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
          >= {_SEM_THRESH}
)
SELECT e.vec_id, e.label
FROM embeddings e
WHERE e.vec_id < {_SEM_SUBSET}
  AND e.vec_id NOT IN (SELECT vec_id FROM dup)
ORDER BY e.vec_id
"""


@_q("q74_semantic_dedup_survivors")
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    # in-row fold kernel (round-4 rewrite, see q23/q29/q97): quantized
    # arrays broadcast, dot + norms fold per pair row — no 64x pos
    # explode, no separate norms relation. At scale the pair relation
    # comes from the LSH-bucketed path, unchanged.
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _SEM_SUBSET
    )
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
    dup = (
        b.crossJoin(F.broadcast(a))
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            dot.cast("double")
            / (
                F.sqrt(F.col("an").cast("double"))
                * F.sqrt(F.col("bn").cast("double"))
            )
            >= _SEM_THRESH
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return (
        emb.select("vec_id", "label")
        .join(dup, "vec_id", "left_anti")
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# q75 per-source quality percentile normalization: percent_rank of the
# quality proxy within each source (unique tiebreak on doc_id so ranks
# are dense and both engines agree), then a per-language decile
# histogram of the normalized score — the summary a curation dashboard
# shows to pick one cross-source threshold.

ORACLE["q75_quality_percentile_hist"] = """
WITH r AS (
    SELECT doc_id, lang, source,
           PERCENT_RANK() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS pr
    FROM documents
)
SELECT lang,
       CAST(LEAST(CAST(floor(pr * 10) AS BIGINT), 9) AS BIGINT) AS decile,
       COUNT(*) AS n_docs
FROM r GROUP BY 1, 2 ORDER BY 1, 2
"""


@_q("q75_quality_percentile_hist")
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select("doc_id", "lang", "source", "n_chars").withColumn(
        "pr", F.percent_rank().over(w)
    )
    return (
        r.select(
            "lang",
            F.least(F.floor(F.col("pr") * 10).cast("bigint"), F.lit(9).cast("bigint")).alias(
                "decile"
            ),
        )
        .groupBy("lang", "decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "decile")
    )


# --------------------------------------------------------------------------
# q76 stratified sample with exact allocation: allocate a fixed budget
# S across language strata proportionally, rounded by largest remainder
# so the allocations sum EXACTLY to S (floor everything, then give the
# leftover units to the strata with the largest remainders, language
# ascending on ties). Members are picked per stratum in md5(doc_id)
# order — a deterministic hash both engines share, so the sampled SET
# is part of the hash contract. The stratum relation is tiny (one row
# per language): every allocation join broadcasts.

_SAMPLE_BUDGET = 100

ORACLE["q76_stratified_sample"] = f"""
WITH strata AS (
    SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY 1
),
tot AS (SELECT SUM(n_l) AS n FROM strata),
alloc0 AS (
    SELECT s.lang, s.n_l,
           CAST(floor({_SAMPLE_BUDGET} * s.n_l / t.n) AS BIGINT) AS base,
           ({_SAMPLE_BUDGET} * s.n_l) % t.n AS rem
    FROM strata s CROSS JOIN tot t
),
leftover AS (
    SELECT {_SAMPLE_BUDGET} - SUM(base) AS k FROM alloc0
),
alloc AS (
    SELECT lang, n_l,
           base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang)
                            <= (SELECT k FROM leftover)
                       THEN 1 ELSE 0 END AS n_pick
    FROM alloc0
),
ranked AS (
    SELECT d.doc_id, d.lang,
           ROW_NUMBER() OVER (PARTITION BY d.lang
                              ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS rn
    FROM documents d
)
SELECT a.lang, a.n_l AS n_docs, CAST(a.n_pick AS BIGINT) AS n_pick,
       md5(string_agg(CAST(r.doc_id AS VARCHAR), ' ' ORDER BY r.doc_id)) AS picked_md5
FROM alloc a
JOIN ranked r ON r.lang = a.lang AND r.rn <= a.n_pick
GROUP BY a.lang, a.n_l, a.n_pick
ORDER BY a.lang
"""


def largest_remainder_alloc(
    strata: DataFrame, budget: int, key_col: str = "lang", n_col: str = "n_l"
) -> DataFrame:
    """Proportional allocation of ``budget`` across strata, rounded by
    largest remainder so the allocations sum EXACTLY to the budget
    (floor each share, hand the leftover units to the largest
    remainders, key ascending on ties). The strata relation is
    |strata|-sized — the single-partition window and both crossJoins
    are over tiny broadcast relations, never data-sized.

    Output: (key_col, n_col, n_pick). Property-tested directly
    (allocations sum to budget, monotone in stratum size, never
    negative); q76 composes it with the md5-ordered member pick."""
    tot = strata.agg(F.sum(n_col).alias("n"))
    alloc0 = strata.crossJoin(F.broadcast(tot)).select(
        key_col,
        n_col,
        F.floor(F.lit(budget) * F.col(n_col) / F.col("n"))
        .cast("bigint")
        .alias("base"),
        ((F.lit(budget) * F.col(n_col)) % F.col("n")).alias("rem"),
    )
    leftover = alloc0.agg((F.lit(budget) - F.sum("base")).alias("k"))
    wr = Window.orderBy(F.col("rem").desc(), key_col)
    return (
        alloc0.withColumn("rr", F.row_number().over(wr))
        .crossJoin(F.broadcast(leftover))
        .select(
            key_col,
            n_col,
            (
                F.col("base")
                + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
            ).alias("n_pick"),
        )
    )


@_q("q76_stratified_sample")
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    strata = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    alloc = largest_remainder_alloc(strata, _SAMPLE_BUDGET)
    wp = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    ranked = d.select("doc_id", "lang").withColumn("rn", F.row_number().over(wp))
    picked = ranked.join(F.broadcast(alloc), "lang").filter(
        F.col("rn") <= F.col("n_pick")
    )
    return (
        picked.groupBy("lang", "n_l", "n_pick")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                    " ",
                ).cast("binary")
            ).alias("picked_md5")
        )
        .select(
            "lang",
            F.col("n_l").alias("n_docs"),
            F.col("n_pick").cast("bigint").alias("n_pick"),
            "picked_md5",
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q77 shingle novelty vs a reference corpus: the graded complement of
# q44's decontamination gate. Reference = doc_id % 10 != 0 ("the corpus
# so far"), batch = % 10 == 0; per batch doc, the fraction of its
# distinct 3-token shingles the reference has never seen. One
# membership probe on the shingle key (at scale: the persisted shingle
# index q70's ingest maintains), exact integer counts, one division.

ORACLE["q77_shingle_novelty"] = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
shingle AS (
    SELECT DISTINCT doc_id, s FROM tok,
    UNNEST(list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS u(s)
),
ref AS (SELECT DISTINCT s FROM shingle WHERE doc_id % 10 <> 0),
batch AS (SELECT doc_id, s FROM shingle WHERE doc_id % 10 = 0)
SELECT b.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
           AS novelty
FROM batch b LEFT JOIN ref r ON r.s = b.s
GROUP BY b.doc_id ORDER BY b.doc_id
"""


@_q("q77_shingle_novelty")
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup

    d = load_table(spark, sf_dir, "documents")
    # membership probe on 64-bit shingle hashes — the reference-corpus
    # index side stores 8-byte keys, not 3-gram strings (collision ⇒
    # loud parity failure, not silent drift)
    sh = dedup.shingles(d).select(
        F.col("id").alias("doc_id"), F.xxhash64("shingle").alias("s")
    )
    ref = sh.filter(F.col("doc_id") % 10 != 0).select("s").distinct()
    batch = sh.filter(F.col("doc_id") % 10 == 0)
    probed = batch.join(
        ref.withColumn("__seen", F.lit(1)), "s", "left"
    )
    novel = F.when(F.col("__seen").isNull(), 1).otherwise(0)
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            (F.sum(novel).cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q78 quality-aware cluster representatives: q47 resolves near-dup
# clusters; the curation decision is WHICH copy to keep. "First copy"
# (min id) is arbitrary — real pipelines keep the BEST copy. Per
# connected component: representative = argmax (n_chars, doc_id).
# Oracle = q47's recursive-CTE component walk + the same argmax.
# Scale: the cluster relation is pairs-sized (tiny next to the corpus),
# and the quality join touches only clustered docs.
# Edge-set contract: the Spark side generates candidates via MinHash
# banding (16 bands x 2 rows) with an EXACT Jaccard verify, the oracle
# is exact all-pairs — identical results rely on the banding missing no
# >= 0.5 pair, the SAME corpus-wide bet q25/q47/q54 make, validated by
# the full parity suite at sf0.001/0.01/0.1 (BASELINE.md). A borderline
# organic pair at j ≈ 0.5 has ~1% band-miss probability; if one ever
# appears in new testdata, q47 and q78 fail together and loudly.

ORACLE["q78_cluster_best_doc"] = """
WITH RECURSIVE tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, s FROM tok,
    UNNEST(list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS u(s)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
edges AS (
    SELECT a_id, b_id FROM inter
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.5
),
sym AS (
    SELECT a_id AS s, b_id AS d FROM edges
    UNION ALL SELECT b_id, a_id FROM edges
),
walk(node, label) AS (
    SELECT DISTINCT s, s FROM sym
    UNION
    SELECT sym.d, walk.label FROM walk JOIN sym ON sym.s = walk.node
),
cc AS (SELECT node, MIN(label) AS cluster_rep FROM walk GROUP BY node),
best AS (
    SELECT cc.cluster_rep, cc.node, d.n_chars,
           ROW_NUMBER() OVER (PARTITION BY cc.cluster_rep
                              ORDER BY d.n_chars DESC, cc.node DESC) AS rn
    FROM cc JOIN documents d ON d.doc_id = cc.node
)
SELECT cluster_rep,
       COUNT(*) AS n_docs,
       CAST(MAX(CASE WHEN rn = 1 THEN node END) AS BIGINT) AS best_doc,
       CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS best_chars,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM best GROUP BY cluster_rep ORDER BY cluster_rep
"""


@_q("q78_cluster_best_doc")
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dedup_ops

    d = load_table(spark, sf_dir, "documents")
    pairs = dedup_ops.minhash_lsh_dedup(d, threshold=0.5)
    cc = dedup_ops.connected_components(pairs)
    quality = d.select(F.col("doc_id").alias("node"), "n_chars")
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col("n_chars").desc(), F.col("node").desc()
    )
    ranked = cc.join(quality, "node").withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_rep")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(F.when(F.col("rn") == 1, F.col("node")))
            .cast("bigint")
            .alias("best_doc"),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
            .cast("bigint")
            .alias("best_chars"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dropped"),
        )
        .orderBy("cluster_rep")
    )


# --------------------------------------------------------------------------
# q79 normalized-text exact dedup (the Dolma-style "fuzzy-exact" rule):
# case, punctuation, and whitespace variants of the same text are the
# same document. The fixture corpus is already clean, so variants are
# PLANTED deterministically in both engines (doc_id % 5 selects a
# transformation), then the normalizer (lower, strip non-alnum, collapse
# runs of spaces, trim) must collapse every planted variant back onto
# its original. One md5-of-normalized-text hash shuffle — the exact
# dedup cost shape, insensitive to surface noise.

ORACLE["q79_normalized_dedup"] = r"""
WITH variants AS (
    SELECT doc_id, CASE doc_id % 5
        WHEN 0 THEN upper(text)
        WHEN 1 THEN text || '!!!'
        WHEN 2 THEN replace(text, ' ', '   ')
        WHEN 3 THEN '  ' || text || '  '
        ELSE text END AS raw
    FROM documents
),
norm AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(raw), '[^\p{L}\p{N} ]', '', 'g'),
                               ' +', ' ', 'g')) AS norm_text
    FROM variants
),
grp AS (
    -- keep-all-empty rule (shared with curate_corpus stage 2 and the
    -- exact-dedup stream): a doc whose normalized form is EMPTY carries
    -- no content signal, so each one is its own group (kept), never
    -- collapsed onto the md5('') group. 'E'||id cannot collide with a
    -- 32-hex-char md5.
    SELECT CASE WHEN norm_text = '' THEN 'E' || CAST(doc_id AS VARCHAR)
                ELSE md5(norm_text) END AS norm_md5,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper
    FROM norm GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(n_copies) AS BIGINT) AS n_docs,
       CAST(SUM(n_copies - 1) AS BIGINT) AS n_dropped,
       md5(string_agg(CAST(keeper AS VARCHAR), ' ' ORDER BY keeper)) AS keepers_md5
FROM grp
"""


@_q("q79_normalized_dedup")
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("doc_id") % 5 == 0, F.upper("text"))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.col("text"), F.lit("!!!")))
        .when(F.col("doc_id") % 5 == 2, F.regexp_replace("text", " ", "   "))
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.lit("  "), F.col("text"), F.lit("  ")),
        )
        .otherwise(F.col("text"))
    )
    from ..operators.curate import norm_group_key, normalize_text

    # ONE normalizer and ONE group key: the same expressions the
    # curation pipeline and the streaming dedup apply
    # (operators/curate.normalize_text / norm_group_key) — the oracle
    # above spells out the identical regex chain and the keep-all-empty
    # per-doc key rule.
    norm = normalize_text(raw)
    grp = (
        d.select("doc_id", norm.alias("norm_text"))
        .groupBy(
            norm_group_key(F.col("norm_text"), F.col("doc_id")).alias("norm_md5")
        )
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper"),
        )
    )
    return grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n_copies").cast("bigint").alias("n_docs"),
        F.sum(F.col("n_copies") - 1).cast("bigint").alias("n_dropped"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("keeper")),
                    lambda x: x.cast("string"),
                ),
                " ",
            ).cast("binary")
        ).alias("keepers_md5"),
    )

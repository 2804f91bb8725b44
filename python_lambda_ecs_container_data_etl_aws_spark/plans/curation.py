"""Training-corpus curation queries q44-q50: the pre-training prep
steps a 100 TB data pipeline runs AFTER dedup/quality (q17-q30) and
BEFORE tokenizer/trainer handoff.

- q44 decontamination: flag train documents whose n-gram overlap with
  a held-out benchmark set exceeds a threshold (the GPT-3/Dolma-style
  13-gram overlap check, here 3-grams on the synthetic corpus). The
  benchmark shingle set is a distinct projection; contamination is a
  shuffle join on the shingle followed by a per-doc count — at scale
  the benchmark side is small enough to broadcast, and the train side
  streams through one exchange.
- q45 split assignment: deterministic hash-based train/val/test split,
  stratified reporting per language. The split must be a pure function
  of the doc id (reproducible across runs and engines), so the hash is
  md5-derived — the same engine-portable trick as SimHash (q26).
- q46 sequence packing: assign documents to fixed token-budget context
  windows by a global running token total — SUM OVER (ORDER BY) — via
  the scalable two-pass prefix sum (sources/chunking.add_prefix_sum),
  NOT a single-partition global window. Greedy boundary semantics: a
  document belongs to the bin its first token lands in.
- q47 cluster resolution: near-dup PAIRS folded into connected
  components (min-label propagation) — the "keep one doc per cluster"
  step; oracle = recursive-CTE walk of the exact-Jaccard pair graph.
- q48 per-label embedding centroids: exact integer per-position sums →
  centroid norm with one IEEE division — vector aggregation without
  float-order nondeterminism.
- q49 quality filter funnel: ordered rejection rules, each doc
  attributed to the first rule it fails (the C4/Gopher funnel report).
- q50 mixture rebalancing: deterministic hash-gated per-source
  downsampling to target rates; achieved-vs-target report.

The reference has no corpus-curation stage (its pipeline ends at
MySQL/DynamoDB loads); these extend the LLM-operator suite that
BASELINE.json names the north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as dedup_ops
from .core import ORACLE, _q

# Engine-portable 0-99 sampling bucket: first 15 md5 hex chars of the
# id as a BIGINT, mod 100. ONE definition (plus its SQL twin) shared by
# the split assigner (q45), the downsampler (q50), and the epoch
# upsampler (q61) — their complement guarantees hold only while all
# three use the identical hash.
MD5_BUCKET100_SQL = (
    "CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15) AS BIGINT) % 100"
)


def md5_bucket100(col):
    return (
        F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )


# --------------------------------------------------------------------------
# q44 decontamination: train docs sharing >= 50% of their 3-gram
# shingles with ANY benchmark (src0) document.

_BENCH_SOURCE = "src0"
_CONTAM_FRAC = 0.5

ORACLE["q44_decontaminate"] = f"""
WITH tok AS (
    SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, source, s FROM tok,
    UNNEST(list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS u(s)
),
bench AS (SELECT DISTINCT s FROM sh WHERE source = '{_BENCH_SOURCE}'),
train_sz AS (
    SELECT doc_id, COUNT(*) AS n FROM sh WHERE source <> '{_BENCH_SOURCE}' GROUP BY 1
),
ov AS (
    SELECT sh.doc_id, COUNT(*) AS o
    FROM sh JOIN bench USING (s)
    WHERE sh.source <> '{_BENCH_SOURCE}' GROUP BY 1
)
SELECT t.doc_id, t.n AS n_shingles, ov.o AS n_overlap,
       ov.o / t.n AS overlap_frac
FROM train_sz t JOIN ov ON t.doc_id = ov.doc_id
WHERE ov.o / t.n >= {_CONTAM_FRAC}
ORDER BY t.doc_id
"""


@_q("q44_decontaminate")
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Filter by source BEFORE shingling (each side tokenizes only its
    # own rows), and persist the train shingle arrays once — they feed
    # two branches (sizes + the overlap explode). The benchmark set is
    # a single-consumer distinct projection: small enough to broadcast
    # into the overlap join (AQE picks that up from its runtime size).
    # the overlap join needs shingle EQUALITY only: both sides carry
    # xxhash64 keys (8 bytes vs ~18-byte 3-gram strings through the
    # distinct + join shuffles; a collision fails parity loudly)
    bench_sh = (
        dedup_ops.doc_shingles(d.filter(F.col("source") == _BENCH_SOURCE), "text", "doc_id", 3)
        .select(F.explode("sh").alias("s0"))
        .select(F.xxhash64("s0").alias("s"))
        .distinct()
    )
    # cache hashed long arrays, not shingle strings (the round-10 q25
    # lesson: the deserialized string cache inflates ~7x and breaks the
    # storage fraction at big tiers); size() and the overlap explode
    # read the same hashed relation
    train = dedup_ops.doc_shingles(
        d.filter(F.col("source") != _BENCH_SOURCE), "text", "doc_id", 3
    ).select(
        "id", F.transform("sh", lambda s: F.xxhash64(s)).alias("sh")
    ).persist()
    ov = (
        train.select("id", F.explode("sh").alias("s"))
        .join(bench_sh, "s")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    sizes = train.select("id", F.size("sh").alias("n_shingles"))
    return (
        sizes.join(ov, "id")
        .select(
            F.col("id").alias("doc_id"),
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            (F.col("n_overlap") / F.col("n_shingles")).alias("overlap_frac"),
        )
        .filter(F.col("overlap_frac") >= _CONTAM_FRAC)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q45 deterministic stratified split assignment. Hash bucket 0-79 →
# train, 80-89 → val, 90-99 → test; report counts per (lang, split).

ORACLE["q45_split_assign"] = f"""
WITH h AS (
    SELECT lang,
           {MD5_BUCKET100_SQL.format(col='doc_id')} AS b
    FROM documents
)
SELECT lang,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM h GROUP BY 1, 2 ORDER BY 1, 2
"""


@_q("q45_split_assign")
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b = md5_bucket100(F.col("doc_id"))
    return (
        d.select(
            "lang",
            F.when(b < 80, F.lit("train"))
            .when(b < 90, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


# --------------------------------------------------------------------------
# q46 sequence packing: 512-token context windows over the corpus in
# doc_id order. bin = (running_total - ntok) div 512 — the window a
# document's FIRST token lands in (greedy packing with straddle).

_CTX_TOKENS = 512

# --------------------------------------------------------------------------
# q49 quality filter funnel — ordered rejection rules, each document
# attributed to the FIRST rule it fails (the C4/Gopher-style funnel
# report: "how many docs did each rule cost?"). One conditional
# aggregation pass; the rule chain is a CASE expression in both
# engines, so attribution is identical by construction.

ORACLE["q49_quality_funnel"] = """
WITH m AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
           length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
           n_chars
    FROM documents
),
staged AS (
    SELECT CASE WHEN n_tokens < 20 THEN 1
                WHEN n_tokens > 200 THEN 2
                WHEN n_stop = 0 THEN 3
                WHEN n_alpha / n_chars < 0.5 THEN 4
                ELSE 0 END AS stage_id
    FROM m
)
SELECT stage_id,
       CASE stage_id WHEN 1 THEN 'too_short' WHEN 2 THEN 'too_long'
                     WHEN 3 THEN 'no_stopwords' WHEN 4 THEN 'low_alpha'
                     ELSE 'kept' END AS stage,
       COUNT(*) AS n_docs
FROM staged GROUP BY 1, 2 ORDER BY 1
"""


@_q("q49_quality_funnel")
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(
            "size(filter(split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to')))"
        ).alias("n_stop"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).alias("n_alpha"),
        "n_chars",
    )
    stage_id = (
        F.when(F.col("n_tokens") < 20, 1)
        .when(F.col("n_tokens") > 200, 2)
        .when(F.col("n_stop") == 0, 3)
        .when(F.col("n_alpha") / F.col("n_chars") < 0.5, 4)
        .otherwise(0)
    )
    stage = (
        F.when(F.col("stage_id") == 1, "too_short")
        .when(F.col("stage_id") == 2, "too_long")
        .when(F.col("stage_id") == 3, "no_stopwords")
        .when(F.col("stage_id") == 4, "low_alpha")
        .otherwise("kept")
    )
    return (
        m.select(stage_id.alias("stage_id"))
        .groupBy("stage_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select("stage_id", stage.alias("stage"), "n_docs")
        .orderBy("stage_id")
    )


# --------------------------------------------------------------------------
# q50 mixture rebalancing — deterministic per-source downsampling to
# target rates (the "adjust the source mixture" step before training).
# Keep-decision = md5 bucket of doc_id under the source's rate; the
# report shows achieved vs target per source. Hash-based, so the
# sample is reproducible across runs, engines, and partitionings.

ORACLE["q50_mixture_sample"] = f"""
WITH h AS (
    SELECT source,
           {MD5_BUCKET100_SQL.format(col='doc_id')} AS b,
           CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 40 ELSE 80 END AS rate
    FROM documents
)
SELECT source, rate,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN b < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN b < rate THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*) AS kept_frac
FROM h GROUP BY 1, 2 ORDER BY 1
"""


@_q("q50_mixture_sample")
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b = md5_bucket100(F.col("doc_id"))
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(40)
    ).otherwise(F.lit(80))
    h = d.select("source", b.alias("b"), rate.alias("rate"))
    return (
        h.groupBy("source", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("b") < F.col("rate"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .select(
            "source",
            "rate",
            "n_total",
            "n_kept",
            (F.col("n_kept") / F.col("n_total")).alias("kept_frac"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q47 near-dup cluster resolution — pairs → connected components →
# per-cluster rollup. Spark side: min-label propagation over the
# MinHash-LSH pair set (operators/dedup.connected_components); the
# oracle walks the exact-Jaccard pair graph with a recursive CTE.
# The two edge sets are equal (q25's oracle proves LSH+verify ≡ exact
# at the threshold), so cluster assignments must agree exactly.

ORACLE["q47_neardup_clusters"] = f"""
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
cc AS (SELECT node, MIN(label) AS cluster_rep FROM walk GROUP BY node)
SELECT cluster_rep,
       COUNT(*) AS n_docs,
       CAST(MAX(node) AS BIGINT) AS max_doc
FROM cc GROUP BY 1 ORDER BY 1
"""


@_q("q47_neardup_clusters")
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup_ops.minhash_lsh_dedup(d, threshold=0.5)
    cc = dedup_ops.connected_components(pairs)
    return (
        cc.groupBy("cluster_rep")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("node").cast("bigint").alias("max_doc"),
        )
        .orderBy("cluster_rep")
    )


# --------------------------------------------------------------------------
# q48 per-label embedding centroids — the vector-aggregation shape of
# cluster analysis / class prototypes. Components quantized to integers
# (floor(v*1000)) so the per-position sums are exact bigints in both
# engines; the centroid norm is assembled from those sums with a single
# IEEE division + sqrt (no float accumulation order anywhere).

ORACLE["q48_label_centroids"] = """
WITH comp AS (
    SELECT label, vec_id, i AS pos,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
    FROM embeddings, range(1, 65) t(i)
),
per_pos AS (
    SELECT label, pos, CAST(SUM(qv) AS BIGINT) AS s
    FROM comp GROUP BY 1, 2
),
norms AS (
    SELECT label, CAST(SUM(s * s) AS BIGINT) AS sumsq FROM per_pos GROUP BY 1
),
counts AS (SELECT label, COUNT(DISTINCT vec_id) AS n_vecs FROM comp GROUP BY 1)
SELECT c.label, c.n_vecs, n.sumsq,
       sqrt(CAST(n.sumsq AS DOUBLE)) / c.n_vecs AS centroid_norm
FROM counts c JOIN norms n ON c.label = n.label
ORDER BY c.label
"""


@_q("q48_label_centroids")
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("pos0", "val"),
    ).select(
        "label",
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("val").cast("double") * 1000).cast("bigint").alias("qv"),
    )
    per_pos = comp.groupBy("label", "pos").agg(F.sum("qv").cast("bigint").alias("s"))
    norms = per_pos.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast("bigint").alias("sumsq")
    )
    # vec_id is unique per row, so COUNT(DISTINCT vec_id) over the
    # exploded components ≡ COUNT(*) over the vectors — the plain count
    # skips the explode and reads only the label column in this branch
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        counts.join(norms, "label")
        .select(
            "label",
            "n_vecs",
            "sumsq",
            (F.sqrt(F.col("sumsq").cast("double")) / F.col("n_vecs")).alias(
                "centroid_norm"
            ),
        )
        .orderBy("label")
    )

ORACLE["q46_pack_contexts"] = f"""
WITH t AS (
    SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents
),
c AS (
    SELECT doc_id, ntok,
           SUM(ntok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT CAST((cum - ntok) // {_CTX_TOKENS} AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS bin_tokens
FROM c GROUP BY 1 ORDER BY 1
"""


@_q("q46_pack_contexts")
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.chunking import add_prefix_sum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("ntok")
    )
    c = add_prefix_sum(d, ["doc_id"], "ntok", out_col="cum")
    return (
        c.select(F.expr(f"(cum - ntok) div {_CTX_TOKENS}").alias("bin"), "ntok")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("bin")
    )

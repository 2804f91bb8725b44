"""Training-corpus curation queries q44-q46: the pre-training prep
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
    bench_sh = (
        dedup_ops.doc_shingles(d.filter(F.col("source") == _BENCH_SOURCE), "text", "doc_id", 3)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    train = dedup_ops.doc_shingles(
        d.filter(F.col("source") != _BENCH_SOURCE), "text", "doc_id", 3
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

ORACLE["q45_split_assign"] = """
WITH h AS (
    SELECT lang,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS b
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
    b = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
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

ORACLE["q46_pack_contexts"] = f"""
WITH t AS (
    SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents
),
c AS (
    SELECT doc_id, ntok,
           SUM(ntok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT (cum - ntok) // {_CTX_TOKENS} AS bin,
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

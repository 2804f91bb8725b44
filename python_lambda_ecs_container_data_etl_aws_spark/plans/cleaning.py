"""Corpus-cleaning queries q55-q57: the per-document quality signals a
100 TB pre-training pipeline computes between raw ingest and the
dedup/funnel stages (q17-q30, q44-q50).

- q55 repetition signals: the Gopher repetition rules (type-token
  ratio, top-bigram fraction, duplicate-trigram fraction) as two
  (doc, gram)-keyed aggregations plus a zero-shuffle array expression.
- q56 PII scrub: C4-style redaction of emails / phone numbers / IPv4
  addresses with per-source redaction accounting. The synthetic corpus
  carries no PII, so the query plants deterministic PII derived from
  doc_id in BOTH engines and verifies the scrubber end-to-end.
- q57 unigram frequency score: mean corpus token frequency per doc —
  the relational core of a CCNet/KenLM-style unigram-LM quality
  scorer, kept in exact integers for bit-determinism.

The reference pipeline ends at warehouse loads (no corpus-quality
stage); these extend the Tier-C LLM-operator suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import text as text_ops
from .core import ORACLE, _q

# --------------------------------------------------------------------------
# q55 Gopher repetition signals over the whole corpus.

ORACLE["q55_repetition_signals"] = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
base AS (
    SELECT doc_id, len(toks) AS n_tokens,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
    FROM tok
),
g2 AS (
    SELECT doc_id, g, COUNT(*) AS c
    FROM tok, UNNEST(list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i+1])) AS u(g)
    GROUP BY 1, 2
),
s2 AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top2_frac FROM g2 GROUP BY 1),
g3 AS (
    SELECT doc_id, g, COUNT(*) AS c
    FROM tok, UNNEST(list_transform(range(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS u(g)
    GROUP BY 1, 2
),
s3 AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c) AS dup3_frac
    FROM g3 GROUP BY 1
)
SELECT b.doc_id, b.n_tokens, b.ttr,
       COALESCE(s2.top2_frac, 0.0) AS top2_frac,
       COALESCE(s3.dup3_frac, 0.0) AS dup3_frac
FROM base b LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
ORDER BY b.doc_id
"""


@_q("q55_repetition_signals")
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        text_ops.repetition_signals(d)
        .select(
            F.col("id").alias("doc_id"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "ttr",
            "top2_frac",
            "dup3_frac",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q56 PII scrub with planted fixtures. The plants are pure functions of
# doc_id built identically in both engines; counts and the redacted
# text length are exact integers, so the hash pins the scrubber's
# regex semantics (not just row counts).

_PII_AUG_SQL = """
    text
    || CASE WHEN doc_id % 5 = 0
            THEN ' contact bob' || CAST(doc_id AS VARCHAR) || '@mail.example.com now'
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
            ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
            ELSE '' END
"""

ORACLE["q56_pii_scrub"] = f"""
WITH aug AS (SELECT doc_id, source, ({_PII_AUG_SQL}) AS text FROM documents),
scrubbed AS (
    SELECT source,
           len(regexp_extract_all(text, '{text_ops.PII_EMAIL_RE}')) AS n_emails,
           regexp_replace(text, '{text_ops.PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
    FROM aug
),
s2 AS (
    SELECT source, n_emails,
           len(regexp_extract_all(t1, '{text_ops.PII_PHONE_RE}')) AS n_phones,
           regexp_replace(t1, '{text_ops.PII_PHONE_RE}', '<PHONE>', 'g') AS t2
    FROM scrubbed
),
s3 AS (
    SELECT source, n_emails, n_phones,
           len(regexp_extract_all(t2, '{text_ops.PII_IP_RE}')) AS n_ips,
           regexp_replace(t2, '{text_ops.PII_IP_RE}', '<IP>', 'g') AS clean_text
    FROM s2
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_emails) AS BIGINT) AS emails,
       CAST(SUM(n_phones) AS BIGINT) AS phones,
       CAST(SUM(n_ips) AS BIGINT) AS ips,
       CAST(SUM(CASE WHEN n_emails + n_phones + n_ips > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_redacted,
       CAST(SUM(LENGTH(clean_text)) AS BIGINT) AS clean_chars
FROM s3 GROUP BY source ORDER BY source
"""


def pii_augmented(d: DataFrame) -> DataFrame:
    """documents with the deterministic PII plants (the _PII_AUG_SQL
    twin) — shared fixture for q56 (per-source scrub totals) and q91
    (per-doc density histogram)."""
    did = F.col("doc_id")
    return d.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" contact bob"),
                    did.cast("string"),
                    F.lit("@mail.example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((did % 1000).cast("string"), 3, "0"),
                    F.lit("-0199"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit(".7")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


@_q("q56_pii_scrub")
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = pii_augmented(load_table(spark, sf_dir, "documents"))
    return (
        text_ops.scrub_pii(aug)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").alias("emails"),
            F.sum("n_phones").alias("phones"),
            F.sum("n_ips").alias("ips"),
            F.sum(
                (
                    (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
                ).cast("bigint")
            ).alias("docs_redacted"),
            F.sum(F.length("clean_text")).alias("clean_chars"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q57 unigram corpus-frequency score per document.

ORACLE["q57_token_freq_score"] = """
WITH tok AS (
    SELECT doc_id, u.t AS tok
    FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
),
vocab AS (SELECT tok, COUNT(*) AS corpus_cnt FROM tok GROUP BY 1),
s AS (
    SELECT doc_id, COUNT(*) AS n_tokens, SUM(corpus_cnt) AS freq_sum
    FROM tok JOIN vocab USING (tok) GROUP BY 1
)
SELECT doc_id, n_tokens, CAST(freq_sum AS BIGINT) AS freq_sum,
       CAST(freq_sum AS DOUBLE) / n_tokens AS mean_freq
FROM s ORDER BY doc_id
"""


@_q("q57_token_freq_score")
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        text_ops.token_freq_score(d)
        .select(
            F.col("id").alias("doc_id"),
            "n_tokens",
            "freq_sum",
            "mean_freq",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q64 segment-level exact dedup with document reconstruction — the
# C4-style "remove duplicated lines across the corpus" pass, at a
# deterministic 8-token segment granularity (the fixture corpus has no
# line breaks). First occurrence wins ((doc_id, seg_idx) order); every
# document is rebuilt from its surviving segments IN ORDER via a
# sorted-struct aggregation (collect_list gives no order guarantee —
# the sort is explicit, so the rebuild is deterministic under any
# partitioning). Two shuffles total: segment-hash window + per-doc
# rebuild; both keys are high-cardinality, no driver-side data.

_SEG = 8

ORACLE["q64_segment_dedup"] = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
seg AS (
    SELECT doc_id, CAST(u.i AS INT) AS seg_idx,
           array_to_string(list_slice(toks, u.i * {_SEG} + 1,
                                      u.i * {_SEG} + {_SEG}), ' ') AS seg_text
    FROM tok, UNNEST(range(0, (len(toks) + {_SEG} - 1) // {_SEG})) AS u(i)
),
r AS (
    SELECT doc_id, seg_idx, seg_text,
           ROW_NUMBER() OVER (PARTITION BY seg_text
                              ORDER BY doc_id, seg_idx) AS rn
    FROM seg
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' '
                               ORDER BY seg_idx), '')) AS clean_md5
FROM r GROUP BY doc_id ORDER BY doc_id
"""


@_q("q64_segment_dedup")
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    seg = (
        d.select(
            "doc_id",
            F.split(F.col("text"), " ").alias("toks"),
            F.expr(
                f"CAST((size(split(text, ' ')) + {_SEG} - 1) div {_SEG} AS INT)"
            ).alias("n_segs"),
        )
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_segs") - 1)).alias("seg_idx"),
            "toks",
        )
        .select(
            "doc_id",
            "seg_idx",
            F.array_join(
                F.slice(F.col("toks"), F.col("seg_idx") * _SEG + 1, _SEG), " "
            ).alias("seg_text"),
        )
    )
    w = Window.partitionBy("seg_text").orderBy("doc_id", "seg_idx")
    r = seg.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("seg_idx"), F.col("seg_text"))
    )
    return (
        r.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x["seg_text"],
                    ),
                    " ",
                ).cast("binary")
            ).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q69 token co-occurrence lift — distributional association mining
# (the PMI ranking behind phrase detection / tokenizer-merge analysis),
# kept oracle-exact: lift = (c_xy·N) / (c_x·c_y) evaluated as two
# IEEE multiplications and one division in a fixed order, identical in
# both engines; ties break on the token pair. Windows are the same
# deterministic 8-token segments as q64; tokens are distinct within a
# segment so the counts are set-semantic. Scale shape: the pair
# generation is a per-segment self-join keyed by (doc, seg) — work is
# sum over segments of k² with k ≤ 8, linear in corpus size — and the
# marginals are one groupBy each; the final top-30 compiles to
# TakeOrderedAndProject, never a global sort.

_CO_MIN = 5
_CO_TOPK = 30

ORACLE["q69_cooccurrence_lift"] = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
seg AS (
    SELECT doc_id, CAST(u.i AS INT) AS seg_idx,
           list_distinct(list_slice(toks, u.i * {_SEG} + 1,
                                    u.i * {_SEG} + {_SEG})) AS stoks
    FROM tok, UNNEST(range(0, (len(toks) + {_SEG} - 1) // {_SEG})) AS u(i)
),
st AS (SELECT doc_id, seg_idx, u.t AS tok FROM seg, UNNEST(stoks) AS u(t)),
n AS (SELECT COUNT(*) AS n_segs FROM seg),
cx AS (SELECT tok, COUNT(*) AS c FROM st GROUP BY 1),
cxy AS (
    SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS c_xy
    FROM st a JOIN st b
      ON a.doc_id = b.doc_id AND a.seg_idx = b.seg_idx AND a.tok < b.tok
    GROUP BY 1, 2
),
scored AS (
    SELECT tok_a, tok_b, c_xy,
           (CAST(c_xy AS DOUBLE) * CAST(n_segs AS DOUBLE))
               / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
    FROM cxy
    JOIN cx ca ON ca.tok = tok_a
    JOIN cx cb ON cb.tok = tok_b
    CROSS JOIN n
    WHERE c_xy >= {_CO_MIN}
)
SELECT tok_a, tok_b, CAST(c_xy AS BIGINT) AS c_xy, lift
FROM scored ORDER BY lift DESC, tok_a, tok_b LIMIT {_CO_TOPK}
"""


@_q("q69_cooccurrence_lift")
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    seg = (
        d.select(
            "doc_id",
            F.split(F.col("text"), " ").alias("toks"),
            F.expr(
                f"CAST((size(split(text, ' ')) + {_SEG} - 1) div {_SEG} AS INT)"
            ).alias("n_segs"),
        )
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_segs") - 1)).alias("seg_idx"),
            "toks",
        )
        .select(
            "doc_id",
            "seg_idx",
            F.array_distinct(
                F.slice(F.col("toks"), F.col("seg_idx") * _SEG + 1, _SEG)
            ).alias("stoks"),
        )
    )
    # tokenize/segment ONCE: st feeds the pair self-join (both sides)
    # and the marginal counts — without the persist each consumer
    # re-runs split+slice+explode over the whole corpus (lifetime:
    # released by the consuming action's clearCache, same as the other
    # persisted operator intermediates)
    st = seg.select(
        "doc_id", "seg_idx", F.explode("stoks").alias("tok")
    ).persist()
    n = seg.agg(F.count(F.lit(1)).alias("n_segs"))
    cx = st.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    a, b = st.alias("a"), st.alias("b")
    cxy = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= _CO_MIN)
    )
    lift = (F.col("c_xy").cast("double") * F.col("n_segs").cast("double")) / (
        F.col("ca.c").cast("double") * F.col("cb.c").cast("double")
    )
    return (
        cxy.join(cx.alias("ca"), F.col("ca.tok") == F.col("tok_a"))
        .join(cx.alias("cb"), F.col("cb.tok") == F.col("tok_b"))
        .crossJoin(F.broadcast(n))
        .select("tok_a", "tok_b", F.col("c_xy").cast("bigint").alias("c_xy"), lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "tok_a", "tok_b")
        .limit(_CO_TOPK)
    )


# --------------------------------------------------------------------------
# q70 incremental segment dedup: today's batch (doc_id % 10 = 0)
# cleaned against the EXISTING corpus's segments plus itself — the
# daily C4-style line-dedup without re-deduping history. The corpus
# side contributes only a segment-membership probe (at scale: the
# stored segment-hash index, exactly what q64's first pass persists);
# old-old work is never done, mirroring q54's incremental MinHash.
# First occurrence within the batch wins in (doc_id, seg_idx) order;
# any segment already in the corpus loses.

ORACLE["q70_incremental_segment_dedup"] = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
seg AS (
    SELECT doc_id, CAST(u.i AS INT) AS seg_idx,
           array_to_string(list_slice(toks, u.i * {_SEG} + 1,
                                      u.i * {_SEG} + {_SEG}), ' ') AS seg_text
    FROM tok, UNNEST(range(0, (len(toks) + {_SEG} - 1) // {_SEG})) AS u(i)
),
old_seg AS (SELECT DISTINCT seg_text FROM seg WHERE doc_id % 10 <> 0),
new_seg AS (
    SELECT doc_id, seg_idx, seg_text,
           ROW_NUMBER() OVER (PARTITION BY seg_text
                              ORDER BY doc_id, seg_idx) AS rn
    FROM seg WHERE doc_id % 10 = 0
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN rn = 1 AND seg_text NOT IN (SELECT seg_text FROM old_seg)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(
           CASE WHEN rn = 1 AND seg_text NOT IN (SELECT seg_text FROM old_seg)
                THEN seg_text END, ' ' ORDER BY seg_idx), '')) AS clean_md5
FROM new_seg GROUP BY doc_id ORDER BY doc_id
"""


@_q("q70_incremental_segment_dedup")
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    seg = (
        d.select(
            "doc_id",
            F.split(F.col("text"), " ").alias("toks"),
            F.expr(
                f"CAST((size(split(text, ' ')) + {_SEG} - 1) div {_SEG} AS INT)"
            ).alias("n_segs"),
        )
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_segs") - 1)).alias("seg_idx"),
            "toks",
        )
        .select(
            "doc_id",
            "seg_idx",
            F.array_join(
                F.slice(F.col("toks"), F.col("seg_idx") * _SEG + 1, _SEG), " "
            ).alias("seg_text"),
        )
    )
    old_seg = seg.filter(F.col("doc_id") % 10 != 0).select("seg_text").distinct()
    new_seg = seg.filter(F.col("doc_id") % 10 == 0)
    w = Window.partitionBy("seg_text").orderBy("doc_id", "seg_idx")
    r = (
        new_seg.withColumn("rn", F.row_number().over(w))
        # membership probe against the corpus index: left-anti marks
        # survivors; at scale old_seg is the persisted segment table
        .join(old_seg.withColumn("__in_corpus", F.lit(1)), "seg_text", "left")
    )
    keep = (F.col("rn") == 1) & F.col("__in_corpus").isNull()
    kept_struct = F.when(keep, F.struct(F.col("seg_idx"), F.col("seg_text")))
    return (
        r.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x["seg_text"],
                    ),
                    " ",
                ).cast("binary")
            ).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q71 containment detection — the asymmetric complement of q22's
# Jaccard: a short document largely CONTAINED in a longer one
# (quotation, boilerplate inclusion, partial copy) scores near 1.0 on
# containment while its Jaccard is tiny. Both directions are single
# IEEE divisions of exact integers.

_CONT_THRESH = 0.7


ORACLE["q71_containment_pairs"] = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
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
SELECT a_id, b_id,
       n_inter / sa.n AS c_ab,
       n_inter / sb.n AS c_ba
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE n_inter / sa.n >= {_CONT_THRESH} OR n_inter / sb.n >= {_CONT_THRESH}
ORDER BY a_id, b_id
"""


@_q("q71_containment_pairs")
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup

    d = load_table(spark, sf_dir, "documents")
    # the operator only needs shingle EQUALITY: hash to 64-bit keys so
    # the intersection self-join shuffles 8-byte keys, not 3-gram
    # strings (a collision would fail the oracle comparison loudly)
    sh = dedup.shingles(d).select("id", F.xxhash64("shingle").alias("shingle"))
    return dedup.containment_pairs(sh, _CONT_THRESH).orderBy("a_id", "b_id")

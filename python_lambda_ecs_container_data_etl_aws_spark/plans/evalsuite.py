"""Model-eval + corpus-health queries q124-q133: the measurement jobs
that run AROUND a curation pipeline — sampling for human review,
classifier/labeler quality audits, RAG chunking, distribution drift,
point-in-time dimension lookups, lexical-health metrics, source
overlap, duplication profiles, and stream-cadence medians.

- q124 weighted group sample: deterministic weight-proportional
  sampling per source (Efraimidis-Spirakis exponential races made
  integer: key = md5-int div weight, smallest keys win) — "review 5
  docs per source, longer docs proportionally more likely" with zero
  ORDER BY RANDOM() nondeterminism.
- q125 classifier AUC: tie-aware Mann-Whitney AUC of the q62 linear
  quality classifier against a held-out label, via the rank-sum
  identity on the DISTINCT-SCORE relation (never a per-pair join);
  exact rational (auc_num, auc_den) BIGINTs.
- q126 labeler agreement: Cohen's kappa over two deterministic
  synthetic annotators — confusion counts, then the kappa identity
  N*agree - sum(row_i*col_i) over N^2 - sum(row_i*col_i), exact.
- q127 RAG chunking: overlapping token windows (32 tokens, stride
  24) per document with md5 content fingerprints — the chunk table a
  retrieval index ingests. Fan-out is sequence+explode inside the
  scan stage; no shuffle until the caller aggregates.
- q128 source distribution drift: total-variation distance between
  each source's token distribution and the corpus, exactly in
  cross-multiplied BIGINTs; the absent-token mass folds into one
  closed-form term so only PRESENT (source, token) pairs join.
- q129 point-in-time as-of join: probe the q100 SCD2 history at a
  per-key probe sequence (key-equi join + validity range filter,
  never a range-join fan-out); per-probe-time found/missing/sums.
- q130 lexical health: per-source token/type/hapax counts and
  type-token ratio ppm — the Heaps'-law corpus-health panel.
- q131 source overlap matrix: pairwise token-set Jaccard between
  sources via a token-keyed self-join (each token fans out only to
  the sources containing it), exact (n_inter, n_union) + ppm.
- q132 duplication profile: exact-dup cluster-size histogram (how
  much of the corpus sits in clusters of size k) — the shape a dedup
  run reports before choosing thresholds.
- q133 event-cadence medians: per-user inter-event-gap median/max via
  the exact lower-middle order statistic (row_number pick), not an
  interpolating percentile — portable across engines.

All arithmetic that crosses engines is BIGINT or md5 (the catalog
discipline); every aggregate/window runs on a keyed relation no
larger than the input, and the one intentional fan-out (q127 chunks)
is linear in corpus tokens. The reference pipeline has no evaluation
tier; these extend the Tier-C suite (SURVEY §7 scope) with
oracle-backed contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .core import ORACLE, _q
from .corpus import CDC_LOG_CTE, cdc_log
from .training import _BIAS, _W_DIGIT, _W_PUNCT, _W_TOK, _W_UPPER


def _md5i_spark(prefix: str, col: F.Column) -> F.Column:
    """60-bit md5-prefix integer of prefix||col — the engine-portable
    hash family (conv/substr idiom shared with q84/q107)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(prefix), col.cast("string")).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")


def _md5i_sql(prefix: str, expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{prefix}' || CAST({expr} AS VARCHAR)), "
        "1, 15) AS BIGINT)"
    )


# --------------------------------------------------------------------------
# q124 weighted group sample — deterministic weight-proportional
# sampling without replacement, per group. Efraimidis-Spirakis keys
# (u^(1/w), float) become integer races: key = h div w over a 60-bit
# uniform h, so a doc's chance of holding a group's smallest key is
# ~proportional to its weight, and both engines pick IDENTICAL rows.
#
# Scale shape: one hash projection in the scan, one per-group window
# with rk<=K — Spark prunes it to a WindowGroupLimit (top-K per group
# streams through the shuffle, never the full group sort).

_Q124_K = 5

ORACLE["q124_weighted_group_sample"] = f"""
WITH keyed AS (
    SELECT source, doc_id, CAST(n_chars + 1 AS BIGINT) AS w,
           {_md5i_sql('124|', 'doc_id')} // (n_chars + 1) AS race_key
    FROM documents
),
r AS (
    SELECT source, doc_id, w, race_key,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY race_key, doc_id) AS rk
    FROM keyed
)
SELECT source, CAST(rk AS INT) AS rk, doc_id, w, race_key
FROM r WHERE rk <= {_Q124_K} ORDER BY source, rk
"""


@_q("q124_weighted_group_sample")
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w_col = (F.col("n_chars") + 1).cast("bigint")
    race = F.expr(
        "cast(conv(substring(md5(cast(concat('124|', cast(doc_id as string)) "
        "as binary)), 1, 15), 16, 10) as bigint) div (n_chars + 1)"
    ).cast("bigint")
    win = Window.partitionBy("source").orderBy("race_key", "doc_id")
    return (
        d.select(
            "source", "doc_id", w_col.alias("w"), race.alias("race_key")
        )
        .withColumn("rk", F.row_number().over(win).cast("int"))
        .filter(F.col("rk") <= _Q124_K)
        .select("source", "rk", "doc_id", "w", "race_key")
        .orderBy("source", "rk")
    )


# --------------------------------------------------------------------------
# q125 classifier AUC — tie-aware Mann-Whitney AUC of the q62 logit
# against the lang='en' label, via the rank-sum identity: with scores
# grouped, a positive at score s has doubled mid-rank
# 2R = 2*(count below s) + (count at s) + 1, so
#   auc_num = sum over positives of 2R  -  n_pos*(n_pos+1)
#   auc_den = 2 * n_pos * n_neg
# exactly — never the O(n^2) pair join. The only window is a running
# sum over the DISTINCT-LOGIT relation (tiny next to the corpus); the
# corpus itself sees one scan + one aggregate.

ORACLE["q125_classifier_auc"] = f"""
WITH f AS (
    SELECT CAST({_BIAS}
             + {_W_TOK} * len(string_split(text, ' '))
             + {_W_UPPER} * length(regexp_replace(text, '[^A-Z]', '', 'g'))
             + {_W_DIGIT} * length(regexp_replace(text, '[^0-9]', '', 'g'))
             + {_W_PUNCT} * length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
           AS BIGINT) AS score,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
    FROM documents
),
g AS (
    SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS p
    FROM f GROUP BY score
),
c AS (
    SELECT score, n, p,
           CAST(COALESCE(SUM(n) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS below
    FROM g
),
s AS (
    SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos,
           CAST(COALESCE(SUM(n - p), 0) AS BIGINT) AS n_neg,
           CAST(COALESCE(SUM(p * (2 * below + n + 1)), 0) AS BIGINT) AS sum2r
    FROM c
)
SELECT n_pos, n_neg,
       CAST(sum2r - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
       CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
       CAST(CASE WHEN n_pos * n_neg = 0 THEN -1
            ELSE (sum2r - n_pos * (n_pos + 1)) * 1000000
                 // (2 * n_pos * n_neg) END AS BIGINT) AS auc_ppm
FROM s
"""


@_q("q125_classifier_auc")
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    score = (
        F.lit(_BIAS)
        + _W_TOK * F.size(F.split(F.col("text"), " "))
        + _W_UPPER * F.length(F.regexp_replace("text", "[^A-Z]", ""))
        + _W_DIGIT * F.length(F.regexp_replace("text", "[^0-9]", ""))
        + _W_PUNCT * F.length(F.regexp_replace("text", "[^.,;:!?]", ""))
    ).cast("bigint")
    pos = (F.col("lang") == "en").cast("bigint")
    g = d.select(score.alias("score"), pos.alias("pos")).groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    below_w = (
        Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.withColumn(
        "below", F.coalesce(F.sum("n").over(below_w), F.lit(0)).cast("bigint")
    )
    s = c.agg(
        F.coalesce(F.sum("p"), F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce(F.sum(F.col("n") - F.col("p")), F.lit(0))
        .cast("bigint")
        .alias("n_neg"),
        F.coalesce(
            F.sum(F.col("p") * (2 * F.col("below") + F.col("n") + 1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("sum2r"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        (F.col("sum2r") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("bigint")
        .alias("auc_num"),
        (2 * F.col("n_pos") * F.col("n_neg")).cast("bigint").alias("auc_den"),
        F.when(F.col("n_pos") * F.col("n_neg") == 0, F.lit(-1))
        .otherwise(
            F.expr(
                "(sum2r - n_pos * (n_pos + 1)) * 1000000 "
                "div (2 * n_pos * n_neg)"
            )
        )
        .cast("bigint")
        .alias("auc_ppm"),
    )


# --------------------------------------------------------------------------
# q126 labeler agreement — Cohen's kappa between two deterministic
# synthetic annotators (annotator 2 flips annotator 1's class on an
# md5-selected 20% of docs). Confusion marginals are 3-row relations;
# the kappa identity kappa = (N*agree - E) / (N^2 - E) with
# E = sum_i row_i * col_i stays in exact BIGINTs.

ORACLE["q126_label_agreement"] = f"""
WITH lab AS (
    SELECT doc_id,
           {_md5i_sql('126a|', 'doc_id')} % 3 AS a1,
           CASE WHEN {_md5i_sql('126f|', 'doc_id')} % 5 = 0
                THEN ({_md5i_sql('126a|', 'doc_id')} % 3 + 1
                      + {_md5i_sql('126s|', 'doc_id')} % 2) % 3
                ELSE {_md5i_sql('126a|', 'doc_id')} % 3 END AS a2
    FROM documents
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(CASE WHEN a1 = a2 THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS n_agree
    FROM lab
),
rc AS (
    SELECT CAST(COALESCE(SUM(r.cnt * c.cnt), 0) AS BIGINT) AS e
    FROM (SELECT a1 AS k, COUNT(*) AS cnt FROM lab GROUP BY 1) r
    JOIN (SELECT a2 AS k, COUNT(*) AS cnt FROM lab GROUP BY 1) c
      ON r.k = c.k
)
SELECT t.n, t.n_agree,
       CAST(t.n * t.n_agree - rc.e AS BIGINT) AS kappa_num,
       CAST(t.n * t.n - rc.e AS BIGINT) AS kappa_den
FROM tot t, rc
"""


@_q("q126_label_agreement")
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a1 = _md5i_spark("126a|", F.col("doc_id")) % 3
    flip = _md5i_spark("126f|", F.col("doc_id")) % 5 == 0
    a2 = F.when(
        flip, (a1 + 1 + _md5i_spark("126s|", F.col("doc_id")) % 2) % 3
    ).otherwise(a1)
    lab = d.select(a1.alias("a1"), a2.alias("a2"))
    tot = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum((F.col("a1") == F.col("a2")).cast("bigint")), F.lit(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    r = lab.groupBy(F.col("a1").alias("k")).agg(
        F.count(F.lit(1)).alias("rcnt")
    )
    c = lab.groupBy(F.col("a2").alias("k")).agg(
        F.count(F.lit(1)).alias("ccnt")
    )
    e = (
        r.join(c, "k")
        .agg(
            F.coalesce(F.sum(F.col("rcnt") * F.col("ccnt")), F.lit(0))
            .cast("bigint")
            .alias("e")
        )
    )
    return tot.crossJoin(F.broadcast(e)).select(
        "n",
        "n_agree",
        (F.col("n") * F.col("n_agree") - F.col("e"))
        .cast("bigint")
        .alias("kappa_num"),
        (F.col("n") * F.col("n") - F.col("e"))
        .cast("bigint")
        .alias("kappa_den"),
    )


# --------------------------------------------------------------------------
# q127 RAG chunking — overlapping token windows (32-token chunks,
# stride 24) with md5 content fingerprints: the chunk table a
# retrieval index ingests. Chunk count K = 1 + (n_tokens-1) div 24,
# so every doc yields >=1 chunk and the last chunk may run short.
#
# Scale shape: the fan-out (sequence + explode, ~n_tokens/24 rows per
# doc) happens INSIDE the scan stage and carries only (doc_id, slice
# text); no shuffle at all — the ORDER BY is the contract's display
# sort, dropped by real consumers.

_Q127_LEN = 32
_Q127_STRIDE = 24

ORACLE["q127_rag_chunks"] = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n
    FROM documents
),
ch AS (
    SELECT doc_id, CAST(u.k AS INT) AS chunk_idx,
           CAST(u.k * {_Q127_STRIDE} AS BIGINT) AS start_tok,
           CAST(LEAST({_Q127_LEN}, n - u.k * {_Q127_STRIDE}) AS BIGINT)
               AS n_chunk_tokens,
           md5(array_to_string(
               toks[u.k * {_Q127_STRIDE} + 1 :
                    u.k * {_Q127_STRIDE} + {_Q127_LEN}], ' ')) AS chunk_fp
    FROM t, UNNEST(range(0, 1 + (n - 1) // {_Q127_STRIDE})) AS u(k)
)
SELECT doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_fp
FROM ch ORDER BY doc_id, chunk_idx
"""


@_q("q127_rag_chunks")
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    )
    ks = F.sequence(
        F.lit(0), F.expr(f"(n - 1) div {_Q127_STRIDE}").cast("int")
    )
    ch = t.select(
        "doc_id", "toks", "n", F.explode(ks).alias("k")
    ).select(
        "doc_id",
        F.col("k").cast("int").alias("chunk_idx"),
        (F.col("k") * _Q127_STRIDE).cast("bigint").alias("start_tok"),
        F.least(
            F.lit(_Q127_LEN), F.col("n") - F.col("k") * _Q127_STRIDE
        )
        .cast("bigint")
        .alias("n_chunk_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("toks"),
                    (F.col("k") * _Q127_STRIDE + 1).cast("int"),
                    F.lit(_Q127_LEN),
                ),
            ).cast("binary")
        ).alias("chunk_fp"),
    )
    return ch.orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# q128 source distribution drift — total-variation distance between
# each source's token distribution and the whole corpus:
#   TVD = 1/2 * sum_t | c_st/T_s - c_gt/T_g |
# cross-multiplied to BIGINTs: tvd_num = sum_t |c_st*T_g - c_gt*T_s|
# + T_s*(T_g - sum_{t in S} c_gt) (the absent-token mass in closed
# form, so only PRESENT pairs ever join), tvd_den = 2*T_s*T_g.
#
# Scale shape: one token-keyed aggregate each for (source, token) and
# global counts, one join keyed by the 8-byte xxhash64 token key (the
# catalog hash-key convention), then a source-sized aggregate with
# two broadcast scalar attaches. At extreme corpus sizes the
# cross-products approach the BIGINT ceiling (c*T ~ 9e18 at ~3e9
# tokens); the decimal(38,0) twin of this plan is the documented
# 128-bit escape.

ORACLE["q128_source_token_tvd"] = """
WITH tok AS (
    SELECT source, u.t AS tok
    FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
),
st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
       FROM tok GROUP BY 1, 2),
g AS (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_gt FROM st GROUP BY 1),
ts AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s FROM st GROUP BY 1),
tg AS (SELECT CAST(SUM(c_gt) AS BIGINT) AS t_g FROM g)
SELECT s.source, ts.t_s AS n_tokens,
       CAST(SUM(abs(s.c_st * tg.t_g - g.c_gt * ts.t_s))
            + ts.t_s * (tg.t_g - SUM(g.c_gt)) AS BIGINT) AS tvd_num,
       CAST(2 * ts.t_s * tg.t_g AS BIGINT) AS tvd_den
FROM st s
JOIN g ON s.tok = g.tok
JOIN ts ON ts.source = s.source
CROSS JOIN tg
GROUP BY s.source, ts.t_s, tg.t_g
ORDER BY s.source
"""


@_q("q128_source_token_tvd")
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).select("source", F.xxhash64("tok").alias("tk"))
    st = tok.groupBy("source", "tk").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_st")
    )
    g = st.groupBy("tk").agg(F.sum("c_st").cast("bigint").alias("c_gt"))
    ts = st.groupBy("source").agg(F.sum("c_st").cast("bigint").alias("t_s"))
    tg = g.agg(F.coalesce(F.sum("c_gt"), F.lit(0)).cast("bigint").alias("t_g"))
    joined = (
        st.join(g, "tk")
        .join(F.broadcast(ts), "source")
        .crossJoin(F.broadcast(tg))
    )
    return (
        joined.groupBy("source", "t_s", "t_g")
        .agg(
            F.sum(
                F.abs(
                    F.col("c_st") * F.col("t_g")
                    - F.col("c_gt") * F.col("t_s")
                )
            ).alias("sum_abs"),
            F.sum("c_gt").alias("present_g"),
        )
        .select(
            "source",
            F.col("t_s").alias("n_tokens"),
            (
                F.col("sum_abs")
                + F.col("t_s") * (F.col("t_g") - F.col("present_g"))
            )
            .cast("bigint")
            .alias("tvd_num"),
            (2 * F.col("t_s") * F.col("t_g")).cast("bigint").alias("tvd_den"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q129 point-in-time as-of join — probe the q100 SCD2 history at a
# per-key probe sequence: "what did key k's row look like at time p"
# for a probe set (every 11th order key, probing at seq = key % 3).
# The join is KEY-equi with the validity range as a filter — at most
# one version matches — never a range-join fan-out; misses (key
# deleted at p, or not yet inserted) stay as left-join nulls and are
# counted, the audit a warehouse runs on its history table.

ORACLE["q129_pit_asof_join"] = f"""
WITH {CDC_LOG_CTE},
h AS (
    SELECT k, qp, seq, op,
           LEAD(seq) OVER (PARTITION BY k ORDER BY seq, op) AS next_seq
    FROM log
),
v AS (
    SELECT k, qp, seq AS valid_from_seq,
           COALESCE(next_seq, -1) AS valid_to_seq
    FROM h WHERE op <> 'D'
),
probe AS (
    SELECT o_orderkey AS k, CAST(o_orderkey % 3 AS BIGINT) AS probe_seq
    FROM orders WHERE o_orderkey % 11 = 0
),
j AS (
    SELECT p.probe_seq, v.qp
    FROM probe p
    LEFT JOIN v ON v.k = p.k AND v.valid_from_seq <= p.probe_seq
               AND (v.valid_to_seq = -1 OR p.probe_seq < v.valid_to_seq)
)
SELECT probe_seq,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(COALESCE(SUM(CASE WHEN qp IS NULL THEN 0 ELSE 1 END), 0)
            AS BIGINT) AS n_found,
       CAST(COALESCE(SUM(qp), 0) AS BIGINT) AS sum_qp
FROM j GROUP BY probe_seq ORDER BY probe_seq
"""


@_q("q129_pit_asof_join")
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = cdc_log(spark, sf_dir)
    w_all = Window.partitionBy("k").orderBy("seq", "op")
    v = (
        log.withColumn("next_seq", F.lead("seq").over(w_all))
        .filter(F.col("op") != "D")
        .select(
            "k",
            "qp",
            F.col("seq").alias("valid_from_seq"),
            F.coalesce("next_seq", F.lit(-1)).alias("valid_to_seq"),
        )
    )
    probe = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 11 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_orderkey") % 3).cast("bigint").alias("probe_seq"),
        )
    )
    j = probe.join(
        v,
        (probe["k"] == v["k"])
        & (v["valid_from_seq"] <= probe["probe_seq"])
        & (
            (v["valid_to_seq"] == -1)
            | (probe["probe_seq"] < v["valid_to_seq"])
        ),
        "left",
    )
    return (
        j.groupBy("probe_seq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.coalesce(
                F.sum(F.col("qp").isNotNull().cast("bigint")), F.lit(0)
            )
            .cast("bigint")
            .alias("n_found"),
            F.coalesce(F.sum("qp"), F.lit(0)).cast("bigint").alias("sum_qp"),
        )
        .orderBy("probe_seq")
    )


# --------------------------------------------------------------------------
# q130 lexical health — per-source token/type/hapax counts and
# type-token ratio: the Heaps'-law panel a corpus report leads with.
# One (source, token-hash) aggregate, then a source-sized rollup.

ORACLE["q130_hapax_rate"] = """
WITH tok AS (
    SELECT source, u.t AS tok
    FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
),
st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
       FROM tok GROUP BY 1, 2)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(COALESCE(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_hapax,
       CAST(COUNT(*) * 1000000 // SUM(c) AS BIGINT) AS ttr_ppm
FROM st GROUP BY source ORDER BY source
"""


@_q("q130_hapax_rate")
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    st = (
        d.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .select("source", F.xxhash64("tok").alias("tk"))
        .groupBy("source", "tk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return (
        st.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.coalesce(F.sum((F.col("c") == 1).cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias("n_hapax"),
            F.expr("count(1) * 1000000 div sum(c)")
            .cast("bigint")
            .alias("ttr_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q131 source overlap matrix — pairwise token-SET Jaccard between
# sources: how redundant are two ingestion feeds before you pay to
# dedup them. The distinct (source, token) relation self-joins on
# the token key, so each token fans out only to the <=20 sources
# containing it (sum over tokens of k_t-choose-2 pairs, linear in
# vocabulary for bounded source counts — at larger source
# cardinality, cap or df-filter the fan-out). Set sizes broadcast in.

ORACLE["q131_source_overlap"] = """
WITH st AS (
    SELECT DISTINCT source, u.t AS tok
    FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1),
pairs AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_inter
    FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2
)
SELECT p.src_a, p.src_b, p.n_inter,
       CAST(sa.n + sb.n - p.n_inter AS BIGINT) AS n_union,
       CAST(p.n_inter * 1000000 // (sa.n + sb.n - p.n_inter) AS BIGINT)
           AS jaccard_ppm
FROM pairs p
JOIN sz sa ON sa.source = p.src_a
JOIN sz sb ON sb.source = p.src_b
ORDER BY src_a, src_b
"""


@_q("q131_source_overlap")
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    st = (
        d.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .select("source", F.xxhash64("tok").alias("tk"))
        .distinct()
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = st.select(F.col("source").alias("src_a"), "tk")
    b = st.select(F.col("source").alias("src_b"), "tk")
    pairs = (
        a.join(b, "tk")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    return (
        pairs.join(
            F.broadcast(sz.withColumnRenamed("source", "src_a")), "src_a"
        )
        .withColumnRenamed("n", "na")
        .join(F.broadcast(sz.withColumnRenamed("source", "src_b")), "src_b")
        .withColumnRenamed("n", "nb")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter"))
            .cast("bigint")
            .alias("n_union"),
            F.expr("n_inter * 1000000 div (na + nb - n_inter)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
        .orderBy("src_a", "src_b")
    )


# --------------------------------------------------------------------------
# q132 duplication profile — exact-dup cluster-size histogram: group
# docs by md5(lower(text)), count cluster sizes, then histogram the
# sizes — "x% of the corpus sits in clusters of size k", the report
# that picks dedup thresholds. Two keyed aggregates, each output no
# larger than its input.

ORACLE["q132_dup_cluster_histogram"] = """
WITH cl AS (
    SELECT md5(lower(text)) AS ckey, CAST(COUNT(*) AS BIGINT) AS csize
    FROM documents GROUP BY 1
)
SELECT csize AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(csize * COUNT(*) AS BIGINT) AS n_docs
FROM cl GROUP BY csize ORDER BY cluster_size
"""


@_q("q132_dup_cluster_histogram")
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cl = d.groupBy(
        F.md5(F.lower(F.col("text")).cast("binary")).alias("ckey")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("csize"))
    return (
        cl.groupBy(F.col("csize").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


# --------------------------------------------------------------------------
# q133 event-cadence medians — per-user inter-event-gap median/max in
# exact microseconds: the stream-health panel (is a user's cadence
# drifting). The median is the LOWER-MIDDLE order statistic picked by
# row_number (portable and exact; interpolating percentiles differ
# across engines). Users with one event have no gaps and are absent.
# Both windows share one (user_id)-keyed shuffle.

ORACLE["q133_interevent_gaps"] = """
WITH e AS (
    SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
    FROM events
),
gap AS (
    SELECT user_id, event_id,
           tus - LAG(tus) OVER (PARTITION BY user_id
                                ORDER BY tus, event_id) AS g
    FROM e
),
gg AS (SELECT user_id, event_id, CAST(g AS BIGINT) AS g
       FROM gap WHERE g IS NOT NULL),
r AS (
    SELECT user_id, g,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY g, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS n,
           MAX(g) OVER (PARTITION BY user_id) AS mx
    FROM gg
)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
       g AS median_gap_us,
       CAST(mx AS BIGINT) AS max_gap_us
FROM r WHERE rn = (n + 1) // 2
ORDER BY user_id
"""


@_q("q133_interevent_gaps")
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts_us").alias("tus")
    )
    w_seq = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gg = (
        e.withColumn("g", F.col("tus") - F.lag("tus").over(w_seq))
        .filter(F.col("g").isNotNull())
        .select("user_id", "event_id", F.col("g").cast("bigint").alias("g"))
    )
    w_rank = Window.partitionBy("user_id").orderBy("g", "event_id")
    # n and max_gap fuse into w_rank's operator (full frame, round-12):
    # count/max are order-insensitive, so rn + n + max_gap_us all
    # evaluate in one Window pass
    w_all = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = gg.select(
        "user_id",
        "g",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.max("g").over(w_all).cast("bigint").alias("max_gap_us"),
    )
    return (
        r.filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_gaps"),
            F.col("g").alias("median_gap_us"),
            "max_gap_us",
        )
        .orderBy("user_id")
    )

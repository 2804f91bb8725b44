"""Ranking-eval + drift + sequence-analytics queries q146-q157: the
measurement jobs that close the loop AROUND the retrieval and
curation tiers — retrieval ranking quality, classifier PR trade-off
curves, categorical independence screens, phonetic entity blocking,
sequential-pattern support, continuous-distribution drift, per-key
changepoint screens, lag autocorrelation, readability profiling,
conversion-latency percentiles, and the GROUPING SETS / UNPIVOT
reshapes that complete the OLAP surface (ROLLUP q15, CUBE q36,
PIVOT q115 being the other three corners).

- q146 retrieval MRR/recall@k: for each anchor vector, the exact
  top-10 by quantized squared-L2 (the q97 kernel: bounded anchors
  broadcast, one corpus stream, in-row zip_with fold); relevance =
  same label. Emits first-relevant rank, reciprocal rank (ppm),
  recall@10 (ppm) against the per-label population.
- q147 PR curve: precision/recall/F1 at the ten equal-frequency
  decile thresholds of the q62 linear classifier, via suffix sums
  over the DISTINCT-SCORE histogram (q125/q136 discipline — the
  corpus sees one scan; windows run over distinct logits only).
- q148 chi-square independence: event_type x day-of-week contingency
  cells with expected counts and per-cell chi-square terms (milli),
  exact integer arithmetic; the day-of-week key is epoch-day mod 7
  so both engines bucket identically (no locale-dependent DOW).
- q149 phonetic blocking: consonant-skeleton blocking key over the
  DISTINCT token vocabulary; candidate pairs share a key and carry
  the exact levenshtein distance — the entity-resolution blocking
  stage (q134's deletion-neighborhood join is the distance-1 tier;
  this is the recall-oriented coarse tier). All work is vocab-sized.
- q150 sequential-pattern support: GSP-style "some A before some B"
  support counts across users, from each user's per-type first/last
  timestamps — the pair join runs on the (user, type) aggregate,
  never raw events.
- q151 KS drift: per event_type Kolmogorov-Smirnov distance (ppm)
  between the type's value distribution and the global one, exact on
  the centi-quantized VALUE GRID (bounded by value range, not corpus
  size); the supremum point is reported deterministically.
- q152 CUSUM changepoint: per-user maximum excursion of the
  mean-centered cumulative sum, scaled by n to stay integer
  (exc_i = n*cum_i - i*sum); the classic level-shift screen.
- q153 lag autocorrelation: per-user lag-1/2/3 autocovariance
  components (num, denx, deny, sign) in the q123 exact-rational
  output idiom; the three lags come from one window pass.
- q154 readability: Flesch-style score in exact milli-points
  (sentence count floors at 1 — the synthetic corpus has no
  terminal punctuation, the formula's shape is preserved), clamped
  to ±1000 points and histogrammed per language.
- q155 conversion latency: signup-week cohorts x first-view ->
  first-purchase latency; median = exact lower-middle order
  statistic, p90 = nearest-rank (q133 idiom), -1 sentinels for
  cohorts with no conversions.
- q156 GROUPING SETS report: the custom-sets aggregation the
  reference's parameterized report API implies but its MySQL tier
  runs as four separate queries (3.(2) mysql-lambda ... .py report
  routes); one pass with grouping_id disambiguating the set.
- q157 metric UNPIVOT: wide per-source health metrics melted to
  (source, metric, value) rows — the long-form feed a dashboard
  ingests; completes PIVOT q115's reshape pair.

All cross-engine arithmetic is BIGINT with non-negative division
operands (Spark `div` truncates, DuckDB `//` floors — they agree
only on non-negatives; q154 clamps-then-shifts before binning for
exactly this reason). Overflow horizons (tools/overflow_audit.py):
q148's d^2*1000 term crosses 2^63 around SF* ~3e4, q152's n*cum
around SF* ~2e4, q153's n*sxy around SF* ~8e3 (unit-quantized for
headroom) — all documented, none within 1000x of the bench tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_events, load_table
from ..functions import dec_sum, dec_sum_sql
from .core import ORACLE, _q
from .training import _BIAS, _W_DIGIT, _W_PUNCT, _W_TOK, _W_UPPER

_WEEK_US = 7 * 86400 * 1_000_000
_DAY_US = 86400 * 1_000_000


# --------------------------------------------------------------------------
# q146 retrieval MRR / recall@k — ranking-quality audit of the exact
# retrieval tier: for each anchor (the bounded vec_id < 40 set, q97's
# convention), rank the whole corpus by exact quantized squared-L2
# and score the top-10 against the same-label relevance set. At
# 100 TB the candidate list comes from the IVF/LSH retrieval path
# (q27/q35) and this query becomes its offline eval harness.
#
# Shape: anchors broadcast; the corpus streams past once with the
# in-row zip_with/aggregate fold (64 integer ops per pair); the
# per-anchor top-10 is a WindowGroupLimit; the per-label population
# join broadcasts the |labels|-sized relation.

_Q146_ANCHORS = 40
_Q146_K = 10

ORACLE["q146_retrieval_mrr"] = f"""
WITH comp AS (
    SELECT vec_id, label, i AS pos,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
    FROM embeddings, range(1, 65) t(i)
),
d AS (
    SELECT a.vec_id AS anchor, b.vec_id AS cand,
           ANY_VALUE(a.label) AS a_label, ANY_VALUE(b.label) AS b_label,
           SUM((a.qv - b.qv) * (a.qv - b.qv)) AS d2
    FROM comp a JOIN comp b ON a.pos = b.pos AND a.vec_id <> b.vec_id
    WHERE a.vec_id < {_Q146_ANCHORS}
    GROUP BY 1, 2
),
rk AS (
    SELECT anchor, a_label, b_label,
           ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY d2, cand) AS rn
    FROM d
),
k AS (
    SELECT anchor, ANY_VALUE(a_label) AS a_label,
           MIN(CASE WHEN b_label = a_label THEN rn END) AS first_rel_rank,
           CAST(SUM(CASE WHEN b_label = a_label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel_at_k
    FROM rk WHERE rn <= {_Q146_K} GROUP BY anchor
),
tot AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label
        FROM embeddings GROUP BY label)
SELECT k.anchor AS vec_id,
       CAST(COALESCE(first_rel_rank, 0) AS BIGINT) AS first_rel_rank,
       CAST(COALESCE(1000000 // first_rel_rank, 0) AS BIGINT) AS rr_ppm,
       n_rel_at_k,
       CAST(t.n_label - 1 AS BIGINT) AS n_rel_total,
       CAST(CASE WHEN t.n_label <= 1 THEN 0
            ELSE n_rel_at_k * 1000000 // LEAST({_Q146_K}, t.n_label - 1)
            END AS BIGINT) AS recall_ppm
FROM k JOIN tot t ON k.a_label = t.label
ORDER BY vec_id
"""


def _quantized_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    )
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", qv.alias("qv")
    )


@_q("q146_retrieval_mrr")
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _quantized_vecs(spark, sf_dir)
    a = emb.filter(F.col("vec_id") < _Q146_ANCHORS).select(
        F.col("vec_id").alias("anchor"),
        F.col("label").alias("a_label"),
        F.col("qv").alias("aq"),
    )
    b = emb.select(
        F.col("vec_id").alias("cand"),
        F.col("label").alias("b_label"),
        F.col("qv").alias("bq"),
    )
    d2 = F.expr(
        "aggregate(zip_with(aq, bq, (x, y) -> (x - y) * (x - y)), 0L, "
        "(acc, v) -> acc + v)"
    )
    d = (
        b.crossJoin(F.broadcast(a))
        .filter(F.col("anchor") != F.col("cand"))
        .select("anchor", "cand", "a_label", "b_label", d2.alias("d2"))
    )
    w = Window.partitionBy("anchor").orderBy("d2", "cand")
    k = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _Q146_K)
        .groupBy("anchor")
        .agg(
            F.any_value(F.col("a_label")).alias("a_label"),
            F.min(
                F.when(F.col("b_label") == F.col("a_label"), F.col("rn"))
            ).alias("first_rel_rank"),
            F.sum(
                F.when(F.col("b_label") == F.col("a_label"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rel_at_k"),
        )
    )
    tot = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_label"))
    )
    return (
        k.join(F.broadcast(tot), k.a_label == tot.label)
        .select(
            F.col("anchor").alias("vec_id"),
            F.coalesce("first_rel_rank", F.lit(0))
            .cast("bigint")
            .alias("first_rel_rank"),
            F.coalesce(
                F.expr("1000000 div first_rel_rank"), F.lit(0)
            )
            .cast("bigint")
            .alias("rr_ppm"),
            "n_rel_at_k",
            (F.col("n_label") - 1).cast("bigint").alias("n_rel_total"),
            F.when(F.col("n_label") <= 1, F.lit(0))
            .otherwise(
                F.expr(
                    f"n_rel_at_k * 1000000 div least({_Q146_K}, n_label - 1)"
                )
            )
            .cast("bigint")
            .alias("recall_ppm"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# q147 PR curve — precision/recall/F1 for the q62 classifier at its
# ten equal-frequency decile thresholds. tp/fp at a threshold are
# SUFFIX sums of the distinct-score histogram (total minus the
# prefix-below), so the corpus sees one scan + one aggregate and
# every window runs over distinct logits (q125/q136 discipline).

ORACLE["q147_pr_curve"] = f"""
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
g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
      FROM f GROUP BY score),
c AS (SELECT score, n, p,
             CAST(COALESCE(SUM(n) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS below_n,
             CAST(COALESCE(SUM(p) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS below_p,
             CAST(SUM(n) OVER () AS BIGINT) AS ntot,
             CAST(SUM(p) OVER () AS BIGINT) AS ptot
      FROM g),
b AS (SELECT *, below_n * 10 // ntot + 1 AS bin FROM c),
thr AS (SELECT bin, MIN(score) AS thr_score FROM b GROUP BY bin),
j AS (SELECT b.bin, b.score AS thr_score, b.ntot, b.ptot,
             b.ntot - b.below_n AS pred_pos, b.ptot - b.below_p AS tp
      FROM b JOIN thr ON b.bin = thr.bin AND b.score = thr.thr_score)
SELECT CAST(bin AS BIGINT) AS bin, CAST(thr_score AS BIGINT) AS thr_score,
       CAST(tp AS BIGINT) AS tp,
       CAST(pred_pos - tp AS BIGINT) AS fp,
       CAST(ptot - tp AS BIGINT) AS fn,
       CAST(ntot - pred_pos - (ptot - tp) AS BIGINT) AS tn,
       CAST(tp * 1000000 // pred_pos AS BIGINT) AS precision_ppm,
       CAST(CASE WHEN ptot = 0 THEN 0
            ELSE tp * 1000000 // ptot END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN pred_pos + ptot = 0 THEN 0
            ELSE 2 * tp * 1000000 // (pred_pos + ptot) END AS BIGINT) AS f1_ppm
FROM j ORDER BY bin
"""


@_q("q147_pr_curve")
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w_below = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = (
        g.select(
            "score",
            "n",
            "p",
            F.coalesce(F.sum("n").over(w_below), F.lit(0))
            .cast("bigint")
            .alias("below_n"),
            F.coalesce(F.sum("p").over(w_below), F.lit(0))
            .cast("bigint")
            .alias("below_p"),
            F.sum("n").over(w_all).cast("bigint").alias("ntot"),
            F.sum("p").over(w_all).cast("bigint").alias("ptot"),
        )
        .withColumn("bin", F.expr("below_n * 10 div ntot + 1"))
        .persist()  # both sides of the thr self-join: one corpus scan
    )
    thr = c.groupBy("bin").agg(F.min("score").alias("thr_score")).select(
        F.col("bin").alias("bin_t"), "thr_score"
    )
    j = c.join(
        F.broadcast(thr),
        (c.bin == thr.bin_t) & (c.score == thr.thr_score),
    ).select(
        F.col("bin").alias("bin_"),
        "thr_score",
        "ntot",
        "ptot",
        (F.col("ntot") - F.col("below_n")).alias("pred_pos"),
        (F.col("ptot") - F.col("below_p")).alias("tp"),
    )
    return j.select(
        F.col("bin_").cast("bigint").alias("bin"),
        F.col("thr_score").cast("bigint").alias("thr_score"),
        F.col("tp").cast("bigint").alias("tp"),
        F.expr("pred_pos - tp").cast("bigint").alias("fp"),
        F.expr("ptot - tp").cast("bigint").alias("fn"),
        F.expr("ntot - pred_pos - (ptot - tp)").cast("bigint").alias("tn"),
        F.expr("tp * 1000000 div pred_pos").cast("bigint").alias(
            "precision_ppm"
        ),
        F.when(F.col("ptot") == 0, F.lit(0))
        .otherwise(F.expr("tp * 1000000 div ptot"))
        .cast("bigint")
        .alias("recall_ppm"),
        F.when(F.expr("pred_pos + ptot") == 0, F.lit(0))
        .otherwise(F.expr("2 * tp * 1000000 div (pred_pos + ptot)"))
        .cast("bigint")
        .alias("f1_ppm"),
    ).orderBy("bin")


# --------------------------------------------------------------------------
# q148 chi-square independence — is event_type independent of
# day-of-week? Contingency cells with expected counts and exact
# per-cell chi-square terms (milli). DOW = epoch-day mod 7 (a pure
# bucketing key, identical in both engines — named DOW functions
# disagree on week start). e floors at 1 so sparse cells never
# divide by zero; d^2*1000 stays under 2^63 until SF* ~3e4.

ORACLE["q148_chisq_independence"] = f"""
WITH e AS (
    SELECT event_type,
           (epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US}) % 7 AS dow
    FROM events
),
o AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS o
      FROM e GROUP BY 1, 2),
m AS (SELECT event_type, dow, o,
             CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
             CAST(SUM(o) OVER (PARTITION BY dow) AS BIGINT) AS ct,
             CAST(SUM(o) OVER () AS BIGINT) AS ntot
      FROM o)
SELECT event_type, CAST(dow AS BIGINT) AS dow, o,
       CAST(GREATEST(rt * ct // ntot, 1) AS BIGINT) AS expected,
       CAST((o - GREATEST(rt * ct // ntot, 1))
            * (o - GREATEST(rt * ct // ntot, 1)) * 1000
            // GREATEST(rt * ct // ntot, 1) AS BIGINT) AS chisq_milli
FROM m ORDER BY event_type, dow
"""


@_q("q148_chisq_independence")
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "event_type",
        F.expr(f"(ts_us div {_DAY_US}) % 7").alias("dow"),
    )
    o = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    # marginals via windows over the |types| x 7 CELL relation — the
    # corpus is reduced before any window runs
    m = o.select(
        "event_type",
        "dow",
        "o",
        F.sum("o")
        .over(Window.partitionBy("event_type"))
        .cast("bigint")
        .alias("rt"),
        F.sum("o").over(Window.partitionBy("dow")).cast("bigint").alias("ct"),
        F.sum("o")
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("ntot"),
    )
    exp_ = F.expr("greatest(rt * ct div ntot, 1)")
    return m.select(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        "o",
        exp_.cast("bigint").alias("expected"),
        F.expr(
            "(o - greatest(rt * ct div ntot, 1)) "
            "* (o - greatest(rt * ct div ntot, 1)) * 1000 "
            "div greatest(rt * ct div ntot, 1)"
        )
        .cast("bigint")
        .alias("chisq_milli"),
    ).orderBy("event_type", "dow")


# --------------------------------------------------------------------------
# q149 phonetic blocking — entity-resolution candidate generation by
# consonant skeleton: key = first letter + first three consonants of
# the rest (vowels and H/W/Y dropped), uppercased. Pairs sharing a
# key get the exact levenshtein tag. Everything runs on the DISTINCT
# token vocabulary (Heaps-sublinear in the corpus), so the self-join
# is vocab-bounded; no run-collapse regex because RE2 (DuckDB) has
# no backreferences — the skeleton must stay backref-free.

ORACLE["q149_phonetic_blocking"] = """
WITH toks AS (
    SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
),
t AS (SELECT tok FROM toks WHERE length(tok) >= 2),
k AS (
    SELECT tok,
           upper(substr(tok, 1, 1)) ||
           substr(regexp_replace(upper(substr(tok, 2)), '[AEIOUYHW]', '', 'g'),
                  1, 3) AS pkey
    FROM t
)
SELECT a.pkey AS pkey, a.tok AS tok_a, b.tok AS tok_b,
       CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS lev
FROM k a JOIN k b ON a.pkey = b.pkey AND a.tok < b.tok
ORDER BY pkey, tok_a, tok_b
"""


@_q("q149_phonetic_blocking")
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .where(F.length("tok") >= 2)
        .distinct()
    )
    pkey = F.concat(
        F.upper(F.substring("tok", 1, 1)),
        F.substring(
            F.regexp_replace(
                F.upper(F.expr("substring(tok, 2)")), "[AEIOUYHW]", ""
            ),
            1,
            3,
        ),
    )
    k = toks.select("tok", pkey.alias("pkey")).persist()  # both join sides
    a = k.select(F.col("pkey"), F.col("tok").alias("tok_a"))
    b = k.select(F.col("pkey").alias("pkey_b"), F.col("tok").alias("tok_b"))
    return (
        a.join(b, (a.pkey == b.pkey_b) & (F.col("tok_a") < F.col("tok_b")))
        .select(
            "pkey",
            "tok_a",
            "tok_b",
            F.levenshtein("tok_a", "tok_b").cast("bigint").alias("lev"),
        )
        .orderBy("pkey", "tok_a", "tok_b")
    )


# --------------------------------------------------------------------------
# q150 sequential-pattern support — GSP-style length-2 pattern
# support: for how many users does SOME 'a' event precede SOME 'b'
# event?  Equivalent to first_ts(a) < last_ts(b), so raw events
# reduce to per-(user, type) first/last aggregates BEFORE the pair
# join — the join relation is |users| x |types|, and the pair space
# is |types|^2, never corpus-sized.

ORACLE["q150_seq_pattern_support"] = """
WITH ut AS (
    SELECT user_id, event_type,
           MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_us,
           MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
    FROM events GROUP BY 1, 2
),
u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
p AS (
    SELECT a.event_type AS ta, b.event_type AS tb,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM ut a JOIN ut b ON a.user_id = b.user_id
         AND a.event_type <> b.event_type
    WHERE a.first_us < b.last_us
    GROUP BY 1, 2
)
SELECT ta, tb, support,
       CAST(support * 1000000 // n_users AS BIGINT) AS support_ppm
FROM p CROSS JOIN u ORDER BY ta, tb
"""


@_q("q150_seq_pattern_support")
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    ut = e.groupBy("user_id", "event_type").agg(
        F.min("ts_us").alias("first_us"), F.max("ts_us").alias("last_us")
    ).persist()  # feeds both pair-join sides AND the user count: one scan
    n_users = ut.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    a = ut.select(
        "user_id", F.col("event_type").alias("ta"), "first_us"
    )
    b = ut.select(
        F.col("user_id").alias("uid_b"),
        F.col("event_type").alias("tb"),
        "last_us",
    )
    p = (
        a.join(b, (a.user_id == b.uid_b) & (F.col("ta") != F.col("tb")))
        .where(F.col("first_us") < F.col("last_us"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    return (
        p.crossJoin(F.broadcast(n_users))  # 1-row scalar attach
        .select(
            "ta",
            "tb",
            "support",
            F.expr("support * 1000000 div n_users")
            .cast("bigint")
            .alias("support_ppm"),
        )
        .orderBy("ta", "tb")
    )


# --------------------------------------------------------------------------
# q151 KS drift — per event_type Kolmogorov-Smirnov distance between
# the type's value ECDF and the global ECDF, on the centi-quantized
# value GRID (bounded by the value RANGE — ~56k points here — not by
# corpus size; the same boundedness argument as q136's logit
# histogram). The grid is densified per type (types broadcast), the
# per-type and global running sums are windows over the grid, and
# the supremum row is picked deterministically (max diff, then
# smallest value).

ORACLE["q151_ks_drift"] = """
WITH e AS (
    SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vm FROM events
),
tv AS (SELECT event_type, vm, CAST(COUNT(*) AS BIGINT) AS c
       FROM e GROUP BY 1, 2),
gv AS (SELECT vm, CAST(SUM(c) AS BIGINT) AS cg,
              CAST(SUM(SUM(c)) OVER (ORDER BY vm
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_g
       FROM tv GROUP BY vm),
ty AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_t FROM tv GROUP BY 1),
gtot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_g FROM tv),
grid AS (
    SELECT ty.event_type, ty.n_t, gv.vm, gv.cum_g, COALESCE(tv.c, 0) AS c
    FROM ty CROSS JOIN gv
    LEFT JOIN tv ON tv.event_type = ty.event_type AND tv.vm = gv.vm
),
cum AS (
    SELECT event_type, n_t, vm, cum_g,
           CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY vm
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_t
    FROM grid
),
diff AS (
    SELECT event_type, n_t, vm,
           abs(cum_t * 1000000 // n_t - cum_g * 1000000 // n_g) AS d_ppm
    FROM cum CROSS JOIN gtot
),
pick AS (
    SELECT event_type, n_t, vm, d_ppm,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY d_ppm DESC, vm) AS rn
    FROM diff
)
SELECT event_type, n_t, CAST(d_ppm AS BIGINT) AS ks_ppm,
       CAST(vm AS BIGINT) AS at_vm
FROM pick WHERE rn = 1 ORDER BY event_type
"""


@_q("q151_ks_drift")
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "event_type", F.expr("CAST(floor(value * 100) AS BIGINT)").alias("vm")
    )
    tv = e.groupBy("event_type", "vm").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).persist()  # grid-sized; feeds gv/ty/n_g/probe from one corpus scan
    # global grid with cumulative counts: one ordered window over the
    # bounded value grid (same shape class as q125/q136's logit scans)
    gv = (
        tv.groupBy("vm")
        .agg(F.sum("c").cast("bigint").alias("cg"))
        .select(
            "vm",
            F.sum("cg")
            .over(
                Window.orderBy("vm").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .cast("bigint")
            .alias("cum_g"),
        )
    )
    ty = tv.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("n_t"))
    n_g = tv.agg(F.sum("c").cast("bigint").alias("n_g"))
    grid = (
        gv.crossJoin(F.broadcast(ty))  # |types| x grid densification
        .join(tv, ["event_type", "vm"], "left")
        .select(
            "event_type", "n_t", "vm", "cum_g", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    cum = grid.withColumn(
        "cum_t",
        F.sum("c")
        .over(
            Window.partitionBy("event_type")
            .orderBy("vm")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("bigint"),
    )
    diff = cum.crossJoin(F.broadcast(n_g)).select(
        "event_type",
        "n_t",
        "vm",
        F.expr(
            "abs(cum_t * 1000000 div n_t - cum_g * 1000000 div n_g)"
        ).alias("d_ppm"),
    )
    w = Window.partitionBy("event_type").orderBy(F.col("d_ppm").desc(), "vm")
    return (
        diff.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_t",
            F.col("d_ppm").cast("bigint").alias("ks_ppm"),
            F.col("vm").cast("bigint").alias("at_vm"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q152 CUSUM changepoint — per-user level-shift screen: the maximum
# |excursion| of the mean-centered cumulative sum. Scaled by n to
# stay integer (exc_i = n*cum_i - i*sum, i.e. n * (cum_i - i*mean)),
# so no division happens at all; the peak row is picked
# deterministically (largest |exc|, then earliest position). One
# shuffle on user_id serves both window specs.

ORACLE["q152_cusum_changepoint"] = """
WITH e AS (
    SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
           CAST(floor(value * 1000) AS BIGINT) AS vm
    FROM events
),
r AS (
    SELECT user_id,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
           CAST(SUM(vm) OVER (PARTITION BY user_id) AS BIGINT) AS s,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY tus, event_id) AS BIGINT) AS rn,
           CAST(SUM(vm) OVER (PARTITION BY user_id ORDER BY tus, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM e
),
x AS (SELECT user_id, n, s, rn, n * cum - rn * s AS exc FROM r),
pk AS (
    SELECT user_id, n, s, rn, exc,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY abs(exc) DESC, rn) AS pr
    FROM x
)
SELECT user_id, n, s AS sum_vm, CAST(rn AS BIGINT) AS peak_rn,
       CAST(exc AS BIGINT) AS peak_exc,
       CAST(abs(exc) AS BIGINT) AS peak_abs
FROM pk WHERE pr = 1 ORDER BY user_id
"""


@_q("q152_cusum_changepoint")
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("tus"),
        F.expr("CAST(floor(value * 1000) AS BIGINT)").alias("vm"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("tus", "event_id")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # n/s share w_ord's spec with the full frame: rn, cum, n and s all
    # evaluate in ONE Window operator pass (round-12 fusion; count and
    # BIGINT sum are order-insensitive)
    w_all = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = e.select(
        "user_id",
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum("vm").over(w_all).cast("bigint").alias("s"),
        F.row_number().over(w_ord).cast("bigint").alias("rn"),
        F.sum("vm").over(w_cum).cast("bigint").alias("cum"),
    )
    x = r.withColumn("exc", F.expr("n * cum - rn * s"))
    pk = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("exc")).desc(), "rn"
    )
    return (
        x.withColumn("pr", F.row_number().over(pk))
        .filter(F.col("pr") == 1)
        .select(
            "user_id",
            "n",
            F.col("s").alias("sum_vm"),
            F.col("rn").cast("bigint").alias("peak_rn"),
            F.col("exc").cast("bigint").alias("peak_exc"),
            F.abs(F.col("exc")).cast("bigint").alias("peak_abs"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# q153 lag autocorrelation — per-user lag-1/2/3 autocovariance in the
# q123 exact-rational idiom (num, denx, deny, sign; r^2 ranks by
# cross-multiplication without floats). The three lags come from ONE
# ordered window pass (three LEADs), then explode into (lag, x, y)
# pairs inside the same stage — no second shuffle. Values quantize
# at unit scale for BIGINT headroom (num ~ n^2 * max_v^2).

ORACLE["q153_lag_autocorr"] = """
WITH e AS (
    SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
           CAST(floor(value) AS BIGINT) AS vm
    FROM events
),
l AS (
    SELECT user_id, vm,
           LEAD(vm, 1) OVER w AS y1,
           LEAD(vm, 2) OVER w AS y2,
           LEAD(vm, 3) OVER w AS y3
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
s AS (
    SELECT user_id, lag, x, y FROM (
        SELECT user_id, 1 AS lag, vm AS x, y1 AS y FROM l
        UNION ALL SELECT user_id, 2, vm, y2 FROM l
        UNION ALL SELECT user_id, 3, vm, y3 FROM l
    ) WHERE y IS NOT NULL
),
a AS (
    SELECT user_id, lag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM s GROUP BY 1, 2
)
SELECT user_id, CAST(lag AS BIGINT) AS lag, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS num,
       CAST(n * sxx - sx * sx AS BIGINT) AS denx,
       CAST(n * syy - sy * sy AS BIGINT) AS deny,
       CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
            WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT)
           AS direction
FROM a ORDER BY user_id, lag
"""


@_q("q153_lag_autocorr")
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("tus"),
        F.expr("CAST(floor(value) AS BIGINT)").alias("vm"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    lagged = e.select(
        "user_id",
        "vm",
        F.lead("vm", 1).over(w).alias("y1"),
        F.lead("vm", 2).over(w).alias("y2"),
        F.lead("vm", 3).over(w).alias("y3"),
    )
    s = (
        lagged.select(
            "user_id",
            F.explode(
                F.expr(
                    "array(named_struct('lag', 1L, 'x', vm, 'y', y1), "
                    "named_struct('lag', 2L, 'x', vm, 'y', y2), "
                    "named_struct('lag', 3L, 'x', vm, 'y', y3))"
                )
            ).alias("p"),
        )
        .select("user_id", "p.lag", "p.x", "p.y")
        .where(F.col("y").isNotNull())
    )
    a = s.groupBy("user_id", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = F.expr("n * sxy - sx * sy")
    return a.select(
        "user_id",
        F.col("lag").cast("bigint").alias("lag"),
        "n",
        num.cast("bigint").alias("num"),
        F.expr("n * sxx - sx * sx").cast("bigint").alias("denx"),
        F.expr("n * syy - sy * sy").cast("bigint").alias("deny"),
        F.when(num > 0, 1)
        .when(num < 0, -1)
        .otherwise(0)
        .cast("bigint")
        .alias("direction"),
    ).orderBy("user_id", "lag")


# --------------------------------------------------------------------------
# q154 readability — Flesch-style reading-ease in exact milli-points:
#   F_milli = 206835 - 1015*(W div S) - 84600*(Syl div W)... computed
# with the divisions INSIDE the formula kept integer and ordered
# identically in both engines:
#   f = 206835 - (1015 * W) div S - (84600 * Syl) div W
# Syllables ~ [aeiouy]+ vowel runs (the standard heuristic); the
# synthetic corpus has no terminal punctuation so S floors at 1 —
# the words-per-sentence term degrades gracefully rather than
# dividing by zero. Scores clamp to ±1000 points then SHIFT so the
# histogram bin division sees non-negative operands (Spark div
# truncates, DuckDB // floors; they only agree on non-negatives).

ORACLE["q154_readability"] = """
WITH f AS (
    SELECT lang,
           len(string_split(text, ' ')) AS w,
           GREATEST(length(regexp_replace(text, '[^.!?]', '', 'g')), 1) AS s,
           length(regexp_replace(regexp_replace(lower(text), '[aeiouy]+',
                  '@', 'g'), '[^@]', '', 'g')) AS syl
    FROM documents
),
sc AS (
    SELECT lang,
           GREATEST(LEAST(206835 - (1015 * w) // s - (84600 * syl) // w,
                          1000000), -1000000) AS fm
    FROM f
)
SELECT lang, CAST((fm + 1000000) // 10000 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(fm) AS BIGINT) AS min_milli,
       CAST(MAX(fm) AS BIGINT) AS max_milli,
       CAST(SUM(fm) AS BIGINT) AS sum_milli
FROM sc GROUP BY lang, bucket ORDER BY lang, bucket
"""


@_q("q154_readability")
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    f = d.select(
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("w"),
        F.greatest(
            F.length(F.regexp_replace("text", "[^.!?]", "")), F.lit(1)
        )
        .cast("bigint")
        .alias("s"),
        F.length(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[aeiouy]+", "@"),
                "[^@]",
                "",
            )
        )
        .cast("bigint")
        .alias("syl"),
    )
    fm = F.expr(
        "greatest(least(206835 - (1015 * w) div s - (84600 * syl) div w, "
        "1000000), -1000000)"
    )
    sc = f.select("lang", fm.alias("fm"))
    return (
        sc.groupBy("lang", F.expr("(fm + 1000000) div 10000").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("fm").cast("bigint").alias("min_milli"),
            F.max("fm").cast("bigint").alias("max_milli"),
            F.sum("fm").cast("bigint").alias("sum_milli"),
        )
        .select(
            "lang",
            F.col("bucket").cast("bigint").alias("bucket"),
            "n_docs",
            "min_milli",
            "max_milli",
            "sum_milli",
        )
        .orderBy("lang", "bucket")
    )


# --------------------------------------------------------------------------
# q155 conversion latency — signup-week cohorts x first-view ->
# first-purchase latency, with the exact lower-middle median and
# nearest-rank p90 (q133's portable order-statistic idiom — never an
# interpolating percentile). The purchase probe is a user-keyed join
# against the per-user first-view aggregate; cohorts with no
# conversions emit -1 sentinels.

ORACLE["q155_conversion_latency"] = f"""
WITH e AS (
    SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
    FROM events
),
u AS (
    SELECT user_id, MIN(tus) // {_WEEK_US} AS wk,
           MIN(CASE WHEN event_type = 'view' THEN tus END) AS fv
    FROM e GROUP BY user_id
),
conv AS (
    SELECT u.user_id, u.wk,
           MIN(e.tus - u.fv) // 1000000 AS lat_s
    FROM u JOIN e ON e.user_id = u.user_id
         AND e.event_type = 'purchase' AND e.tus > u.fv
    GROUP BY 1, 2
),
r AS (
    SELECT wk, user_id, lat_s,
           ROW_NUMBER() OVER (PARTITION BY wk ORDER BY lat_s, user_id) AS rn,
           COUNT(*) OVER (PARTITION BY wk) AS nc
    FROM conv
),
agg AS (
    SELECT wk, CAST(MAX(nc) AS BIGINT) AS n_conv,
           CAST(MAX(CASE WHEN rn = (nc + 1) // 2 THEN lat_s END) AS BIGINT)
               AS med_lat_s,
           CAST(MAX(CASE WHEN rn = (9 * nc + 9) // 10 THEN lat_s END)
               AS BIGINT) AS p90_lat_s,
           CAST(MAX(lat_s) AS BIGINT) AS max_lat_s
    FROM r GROUP BY wk
),
coh AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_users FROM u GROUP BY wk)
SELECT CAST(coh.wk AS BIGINT) AS wk, coh.n_users,
       CAST(COALESCE(agg.n_conv, 0) AS BIGINT) AS n_conv,
       CAST(COALESCE(agg.med_lat_s, -1) AS BIGINT) AS med_lat_s,
       CAST(COALESCE(agg.p90_lat_s, -1) AS BIGINT) AS p90_lat_s,
       CAST(COALESCE(agg.max_lat_s, -1) AS BIGINT) AS max_lat_s
FROM coh LEFT JOIN agg ON coh.wk = agg.wk
ORDER BY wk
"""


@_q("q155_conversion_latency")
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "user_id", "event_type", F.col("ts_us").alias("tus")
    )
    u = e.groupBy("user_id").agg(
        F.expr(f"MIN(tus) div {_WEEK_US}").alias("wk"),
        F.min(F.when(F.col("event_type") == "view", F.col("tus"))).alias(
            "fv"
        ),
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid_p"), F.col("tus").alias("ptus")
    )
    conv = (
        u.join(pur, (u.user_id == pur.uid_p) & (pur.ptus > u.fv))
        .groupBy("user_id", "wk")
        .agg(F.expr("MIN(ptus - fv) div 1000000").alias("lat_s"))
    )
    w_ord = Window.partitionBy("wk").orderBy("lat_s", "user_id")
    # nc fuses into w_ord's operator (full frame, round-12): one pass
    w_all = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = conv.select(
        "wk",
        "user_id",
        "lat_s",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("nc"),
    )
    agg = r.groupBy("wk").agg(
        F.max("nc").cast("bigint").alias("n_conv"),
        F.max(
            F.when(F.expr("rn = (nc + 1) div 2"), F.col("lat_s"))
        )
        .cast("bigint")
        .alias("med_lat_s"),
        F.max(
            F.when(F.expr("rn = (9 * nc + 9) div 10"), F.col("lat_s"))
        )
        .cast("bigint")
        .alias("p90_lat_s"),
        F.max("lat_s").cast("bigint").alias("max_lat_s"),
    )
    coh = u.groupBy("wk").agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    return (
        coh.join(agg, "wk", "left")
        .select(
            F.col("wk").cast("bigint").alias("wk"),
            "n_users",
            F.coalesce("n_conv", F.lit(0)).cast("bigint").alias("n_conv"),
            F.coalesce("med_lat_s", F.lit(-1))
            .cast("bigint")
            .alias("med_lat_s"),
            F.coalesce("p90_lat_s", F.lit(-1))
            .cast("bigint")
            .alias("p90_lat_s"),
            F.coalesce("max_lat_s", F.lit(-1))
            .cast("bigint")
            .alias("max_lat_s"),
        )
        .orderBy("wk")
    )


# --------------------------------------------------------------------------
# q156 GROUPING SETS report — the custom-sets aggregation
# ((geo, year), (geo), (year), ()) in ONE pass with grouping_id
# disambiguating which set each row belongs to; completes the OLAP
# reshape family (ROLLUP q15, CUBE q36). The reference's
# parameterized report API implies exactly these four groupings but
# its MySQL tier runs them as separate queries
# (3.(2) mysql-lambda-ecs...py report routes). Money uses the
# dec_sum order-independent decimal discipline (q05).

ORACLE["q156_grouping_sets"] = f"""
WITH base AS (
    SELECT n_name AS geo, CAST(YEAR(o_orderdate) AS INT) AS y,
           l_extendedprice
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE YEAR(o_orderdate) IN (1995, 1996)
)
SELECT COALESCE(geo, 'ALL') AS geo,
       COALESCE(CAST(y AS VARCHAR), 'ALL') AS y,
       CAST(GROUPING(geo) * 2 + GROUPING(y) AS BIGINT) AS gid,
       {dec_sum_sql('l_extendedprice')} AS sum_price,
       COUNT(*) AS n_items
FROM base
GROUP BY GROUPING SETS ((geo, y), (geo), (y), ())
ORDER BY gid, geo, y
"""


@_q("q156_grouping_sets")
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaled: no hard hint
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("y", F.year("o_orderdate").cast("int"))
        .filter(F.col("y").isin(1995, 1996))
        .select(F.col("n_name").alias("geo"), "y", "l_extendedprice")
    )
    return (
        base.groupingSets(
            [["geo", "y"], ["geo"], ["y"], []], "geo", "y"
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dec_sum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce(F.col("geo"), F.lit("ALL")).alias("geo"),
            F.coalesce(F.col("y").cast("string"), F.lit("ALL")).alias("y"),
            "gid",
            "sum_price",
            "n_items",
        )
        .orderBy("gid", "geo", "y")
    )


# --------------------------------------------------------------------------
# q157 metric UNPIVOT — per-source corpus-health metrics melted from
# wide to long (source, metric, value): the feed shape a metrics
# dashboard ingests. The wide relation is |sources|-sized, so the
# reshape is free; the corpus sees one scan + one aggregate.
# Completes q115's PIVOT with the inverse reshape.

ORACLE["q157_metric_unpivot"] = """
WITH wide AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
)
SELECT source, metric, value
FROM wide UNPIVOT (value FOR metric IN (n_docs, sum_chars, n_langs, n_tokens))
ORDER BY source, metric
"""


@_q("q157_metric_unpivot")
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    wide = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return (
        wide.unpivot(
            ["source"],
            ["n_docs", "sum_chars", "n_langs", "n_tokens"],
            "metric",
            "value",
        )
        .orderBy("source", "metric")
    )

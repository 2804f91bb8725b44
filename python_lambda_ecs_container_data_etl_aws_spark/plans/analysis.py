"""Robust-statistics + fuzzy-matching analysis queries q134-q145: the
data-profiling and record-matching jobs that run over a curated corpus
and its operational tables — fuzzy key matching, time-weighted
integrals, classifier calibration, concentration/dispersion profiles,
robust outlier screens, distribution drift by rank, and
interval/sequence analytics over event streams.

- q134 fuzzy name pairs: edit-distance<=1 similarity join over the
  customer-name relation via SymSpell-style deletion neighborhoods
  (each name joins only through its |name|+1 deletion variants, so
  candidate generation is linear and group sizes are alphabet-bounded
  — never an all-pairs levenshtein). Verified with the exact
  levenshtein built-in on the candidate set only.
- q135 time-weighted average: per-user integral of `value` over the
  event timeline (each reading holds until the next), exact in
  milli-value x whole-second BIGINTs.
- q136 calibration bins: reliability-diagram deciles for the q62
  linear quality classifier. Bins are equal-frequency cuts computed
  on the DISTINCT-SCORE relation (q125's trick: the corpus sees one
  scan + one aggregate; the only windows run over the tiny score
  histogram), so ties land in one bin deterministically — no global
  NTILE sort of the corpus.
- q137 source Gini: per-source concentration of token frequencies via
  the rank formula gini = (2*sum(rn*x) - (n+1)*sum(x)) / (n*sum(x)),
  exact rational + ppm; ranks live on the (source, token) type
  relation, orders of magnitude smaller than the corpus.
- q138 centroid dispersion: per-label embedding centroid magnitude
  and total variance in exact integers via the n*sum(q^2) - sum(q)^2
  identity per dimension (quantized at 1e2 so the worst term stays
  ~2^57 even at sf1000; see tools/overflow_audit.py).
- q139 winsorized stats: per-supplier 5%/95% nearest-rank clip of
  line-item spend; one window pass builds the bounds, the clipped
  re-aggregation joins the bounds back to the raw scan by key.
- q140 MAD outliers: per-user robust screen — median via the exact
  lower-middle order statistic (q133 idiom), MAD as the median of
  absolute deviations, outliers = |x - med| > 3*MAD. Complements
  q102's mean/stddev z-score with the estimator that survives the
  outliers it is hunting.
- q141 weighted median: per-part quantity-weighted median spend via
  running cumulative weight (first row with 2*cumw >= totw) — the
  mixture-weight quantile primitive.
- q142 rank drift: Spearman-footrule distance between the top-20
  token ranks of the doc_id-parity corpus halves + membership churn;
  a join-free MAX(CASE) pivot over the two rank lists.
- q143 peak concurrency: classic sweep-line max-overlap (+1/-1
  boundary deltas, running sum) over 7-day order validity windows,
  per priority. Boundaries are pre-aggregated per (priority, instant)
  BEFORE the running sum, so the ordered scan touches distinct
  instants (~days), not raw orders — the shape that survives 100 TB.
- q144 interval coverage: per-user union length of overlapping
  30-minute session intervals (gaps-and-islands: island starts where
  start > running max of prior ends, islands merge with one
  aggregate).
- q145 path motif: MATCH_RECOGNIZE-style sequence predicate — users
  whose ordered event-initial path matches view .. click .. purchase
  with no intervening purchase (regex 'v[^p]*c[^p]*p' over the
  per-user path string) — strictly stronger than q67's staged-min
  funnel, which cannot express the exclusion.

Reference parity: the reference's analytics tier stops at grouped
reports (2.3 transforming-lambda-for-mysql.py aggregates); this module
extends the Tier-C suite (SURVEY §7) with oracle-backed contracts.
All cross-engine arithmetic is BIGINT/ppm (catalog discipline); the
only self-join (q134) is candidate-bounded by deletion-variant keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_events, load_table
from .core import ORACLE, _q
from .training import _BIAS, _W_DIGIT, _W_PUNCT, _W_TOK, _W_UPPER

_WEEK_US = 7 * 86400 * 1_000_000
_SESSION_US = 1800 * 1_000_000


def _order_us(col: str = "o_orderdate") -> F.Column:
    """Epoch microseconds of an orders NTZ timestamp. The session pins
    spark.sql.session.timeZone=UTC (functions/tz.py contract), so the
    NTZ->LTZ cast is the identity instant DuckDB's epoch_us computes."""
    return F.unix_micros(F.col(col).cast("timestamp"))


# --------------------------------------------------------------------------
# q134 fuzzy name pairs — SymSpell deletion-neighborhood edit-distance
# join. D(t) = {t} u {t minus char i}; lev(a,b) <= 1 implies the
# neighborhoods intersect (substitution: delete the differing position
# from both; insert/delete: the shorter string IS a deletion variant of
# the longer), so joining on variants finds every true pair, and the
# exact levenshtein filter removes the distance-2 collisions (e.g.
# transpositions share two variants). Candidate groups are bounded by
# |alphabet| names per variant key — linear at any scale, vs the
# quadratic blocked self-join a naive fuzzy match would run.

ORACLE["q134_fuzzy_name_pairs"] = """
WITH names AS (SELECT DISTINCT c_name FROM customer),
vars AS (
    SELECT c_name, unnest(list_append(
        list_transform(range(1, length(c_name) + 1),
                       i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)),
        c_name)) AS v
    FROM names
),
cand AS (
    SELECT DISTINCT a.c_name AS name_a, b.c_name AS name_b
    FROM vars a JOIN vars b ON a.v = b.v AND a.c_name < b.c_name
)
SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev
FROM cand WHERE levenshtein(name_a, name_b) <= 1
ORDER BY name_a, name_b
"""


@_q("q134_fuzzy_name_pairs")
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "customer").select("c_name").distinct()
    # |name|+1 variants per name: the |name| single-deletions plus the
    # name itself (covers insert/delete pairs at distance 1).
    # The self-join keys on xxhash64(variant), not the variant string
    # (round 12): the joined/broadcast relation carries 8-byte longs
    # instead of ~|name|-char strings, and long-key hashing beats
    # string hashing in the build and probe. EXACT, not probabilistic:
    # lev(a,b) <= 1 GUARANTEES a shared true variant (the docstring
    # theorem above), so the exact levenshtein filter reduces any
    # candidate superset — hash collisions included — to the identical
    # result set; a collision can only add a candidate that the
    # lev <= 1 filter then decides exactly.
    v = (
        names.select(
            "c_name",
            F.explode(
                F.expr(
                    "array_append(transform(sequence(1, length(c_name)), "
                    "i -> concat(substring(c_name, 1, i - 1), "
                    "substring(c_name, i + 1))), c_name)"
                )
            ).alias("v"),
        )
        .select("c_name", F.xxhash64("v").alias("vh"))
        .persist()  # both sides of the variant-key self-join (caller-owned)
    )
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(b, F.col("a.vh") == F.col("b.vh"))
        .where(F.col("a.c_name") < F.col("b.c_name"))
        .select(
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()
    )
    return (
        cand.where(F.levenshtein("name_a", "name_b") <= 1)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("lev"),
        )
        .orderBy("name_a", "name_b")
    )


# --------------------------------------------------------------------------
# q135 time-weighted average — per-user integral of value over time.
# Segment value vm (milli) holds for dt_s whole seconds (floor of the
# microsecond gap); num <= max|v|*1e3 * span_s * segments stays far
# inside BIGINT. One per-user window (lead) + one aggregate.

ORACLE["q135_time_weighted_avg"] = """
WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
seg AS (
    SELECT user_id, vm,
           (LEAD(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus)
               // 1000000 AS dt_s
    FROM e
),
s AS (SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_segments,
             CAST(SUM(vm * dt_s) AS BIGINT) AS twa_num,
             CAST(SUM(dt_s) AS BIGINT) AS twa_den
      FROM seg WHERE dt_s IS NOT NULL GROUP BY user_id)
SELECT user_id, n_segments, twa_num, twa_den,
       CAST(CASE WHEN twa_den = 0 THEN -1
            ELSE twa_num // twa_den END AS BIGINT) AS twa_milli
FROM s ORDER BY user_id
"""


@_q("q135_time_weighted_avg")
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("tus"),
        F.expr("cast(floor(value * 1000) as bigint)").alias("vm"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    seg = (
        e.withColumn("next_tus", F.lead("tus").over(w))
        .where(F.col("next_tus").isNotNull())
        .select(
            "user_id",
            "vm",
            F.expr("(next_tus - tus) div 1000000").alias("dt_s"),
        )
    )
    s = seg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.col("vm") * F.col("dt_s")).cast("bigint").alias("twa_num"),
        F.sum("dt_s").cast("bigint").alias("twa_den"),
    )
    return s.select(
        "user_id",
        "n_segments",
        "twa_num",
        "twa_den",
        F.when(F.col("twa_den") == 0, F.lit(-1))
        .otherwise(F.expr("twa_num div twa_den"))
        .cast("bigint")
        .alias("twa_milli"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# q136 calibration bins — reliability diagram for the q62 classifier.
# Equal-frequency decile cuts computed on the DISTINCT-SCORE histogram
# (bin = below*10 // ntot + 1), so every windowed row count is the
# number of distinct logits, not documents, and ties are deterministic.

ORACLE["q136_calibration_bins"] = f"""
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
             AS BIGINT) AS below,
             CAST(SUM(n) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS ntot
      FROM g)
SELECT CAST((below * 10) // ntot + 1 AS BIGINT) AS bin,
       CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(MIN(score) AS BIGINT) AS min_score,
       CAST(MAX(score) AS BIGINT) AS max_score,
       CAST(SUM(score * n) AS BIGINT) AS sum_score,
       CAST(SUM(p) * 1000000 // SUM(n) AS BIGINT) AS pos_rate_ppm
FROM c GROUP BY bin ORDER BY bin
"""


@_q("q136_calibration_bins")
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    c = g.select(
        "score",
        "n",
        "p",
        F.coalesce(F.sum("n").over(w_below), F.lit(0))
        .cast("bigint")
        .alias("below"),
        F.sum("n").over(w_all).cast("bigint").alias("ntot"),
    )
    return (
        c.withColumn("bin", F.expr("(below * 10) div ntot + 1").cast("bigint"))
        .groupBy("bin")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("p").cast("bigint").alias("n_pos"),
            F.min("score").cast("bigint").alias("min_score"),
            F.max("score").cast("bigint").alias("max_score"),
            F.sum(F.col("score") * F.col("n")).cast("bigint").alias("sum_score"),
            F.expr("sum(p) * 1000000 div sum(n)")
            .cast("bigint")
            .alias("pos_rate_ppm"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# q137 source Gini — token-frequency concentration per source. Ranks
# and sums run on the (source, token) TYPE relation (vocab-sized), so
# the per-source window sorts tens of rows even when the corpus is TBs.

ORACLE["q137_source_gini"] = """
WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
x AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM t WHERE tok <> '' GROUP BY source, tok),
r AS (SELECT source, cnt,
             CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt, tok)
             AS BIGINT) AS rn
      FROM x),
s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(SUM(rn * cnt) AS BIGINT) AS sum_rx
      FROM r GROUP BY source)
SELECT source, n_types, n_tokens,
       CAST(2 * sum_rx - (n_types + 1) * n_tokens AS BIGINT) AS gini_num,
       CAST(n_types * n_tokens AS BIGINT) AS gini_den,
       CAST((2 * sum_rx - (n_types + 1) * n_tokens) * 1000000
            // (n_types * n_tokens) AS BIGINT) AS gini_ppm
FROM s ORDER BY source
"""


@_q("q137_source_gini")
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    x = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("source").orderBy("cnt", "tok")
    r = x.select(
        "source", "cnt", F.row_number().over(w).cast("bigint").alias("rn")
    )
    s = r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum(F.col("rn") * F.col("cnt")).cast("bigint").alias("sum_rx"),
    )
    return s.select(
        "source",
        "n_types",
        "n_tokens",
        F.expr("2 * sum_rx - (n_types + 1) * n_tokens")
        .cast("bigint")
        .alias("gini_num"),
        F.expr("n_types * n_tokens").cast("bigint").alias("gini_den"),
        F.expr(
            "(2 * sum_rx - (n_types + 1) * n_tokens) * 1000000 "
            "div (n_types * n_tokens)"
        )
        .cast("bigint")
        .alias("gini_ppm"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# q138 centroid dispersion — per-label cluster health in exact ints.
# Per (label, dim): n*sum(q^2) - sum(q)^2 is n^2 x the dim variance;
# summed over dims it is the total within-cluster dispersion. The 1e2
# quantization keeps every term < 2^50 at sf1000 (|q| <= ~60).

ORACLE["q138_centroid_dispersion"] = """
WITH comp AS (
    SELECT label, i AS pos,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 100) AS BIGINT) AS q
    FROM embeddings, range(1, 65) t(i)
),
d AS (SELECT label, pos, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(q * q) AS BIGINT) AS sq2
      FROM comp GROUP BY label, pos)
SELECT CAST(label AS INT) AS label,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(sq * sq) AS BIGINT) AS centroid_sq_num,
       CAST(SUM(n * sq2 - sq * sq) AS BIGINT) AS disp_num
FROM d GROUP BY label ORDER BY label
"""


@_q("q138_centroid_dispersion")
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label",
        F.expr(
            "transform(embedding, x -> "
            "cast(floor(cast(x as double) * 100) as bigint))"
        ).alias("qv"),
    )
    comp = emb.select("label", F.posexplode("qv").alias("pos", "q"))
    d = comp.groupBy("label", "pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sq2"),
    )
    return (
        d.groupBy("label")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.sum(F.col("sq") * F.col("sq"))
            .cast("bigint")
            .alias("centroid_sq_num"),
            F.sum(F.col("n") * F.col("sq2") - F.col("sq") * F.col("sq"))
            .cast("bigint")
            .alias("disp_num"),
        )
        .select(F.col("label").cast("int").alias("label"), "n",
                "centroid_sq_num", "disp_num")
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# q139 winsorized stats — nearest-rank p05/p95 clip per supplier. One
# window pass over the keyed relation builds the bounds (conditional
# MAX at the two pick ranks); the clipped sum re-joins bounds to the
# RAW scan by key, so the windowed relation is consumed exactly once.

ORACLE["q139_winsorized_stats"] = """
WITH x AS (SELECT l_suppkey, CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
                  l_orderkey, l_linenumber FROM lineitem),
r AS (SELECT l_suppkey, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
                  ORDER BY cents, l_orderkey, l_linenumber) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY l_suppkey) AS BIGINT) AS n
      FROM x),
bounds AS (SELECT l_suppkey,
                  MAX(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN cents END) AS lo,
                  MAX(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN cents END) AS hi,
                  MAX(n) AS n
           FROM r GROUP BY l_suppkey)
SELECT x.l_suppkey, CAST(MAX(b.n) AS BIGINT) AS n,
       CAST(MAX(b.lo) AS BIGINT) AS lo_cents,
       CAST(MAX(b.hi) AS BIGINT) AS hi_cents,
       CAST(SUM(LEAST(GREATEST(x.cents, b.lo), b.hi)) AS BIGINT) AS wsum_cents,
       CAST(SUM(LEAST(GREATEST(x.cents, b.lo), b.hi)) // MAX(b.n) AS BIGINT)
           AS wmean_cents
FROM x JOIN bounds b USING (l_suppkey)
GROUP BY x.l_suppkey ORDER BY x.l_suppkey
"""


@_q("q139_winsorized_stats")
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        "l_suppkey",
        F.expr("cast(floor(l_extendedprice * 100) as bigint)").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    w_rank = Window.partitionBy("l_suppkey").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    # full-frame count on w_rank's spec: one Window operator for rn+n
    # (round-12 fusion — the count is order-insensitive)
    w_all = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = x.select(
        "l_suppkey",
        "cents",
        F.row_number().over(w_rank).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    bounds = r.groupBy("l_suppkey").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n - 1) * 5 div 100 + 1"), F.col("cents"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.expr("(n - 1) * 95 div 100 + 1"), F.col("cents"))
        ).alias("hi"),
        F.max("n").alias("n"),
    )
    clipped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        x.join(bounds, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.max("lo").cast("bigint").alias("lo_cents"),
            F.max("hi").cast("bigint").alias("hi_cents"),
            F.sum(clipped).cast("bigint").alias("wsum_cents"),
        )
        .withColumn("wmean_cents", F.expr("wsum_cents div n").cast("bigint"))
        .orderBy("l_suppkey")
    )


# --------------------------------------------------------------------------
# q140 MAD outliers — median/MAD robust screen per user. Two order-
# statistic picks (value median, then deviation median) via the q133
# row_number idiom. The Spark build broadcasts each pick back as a
# MAX(CASE WHEN rn = pick) window over the SAME user_id partitioning
# instead of joining a medians relation back — every window and the
# final aggregate reuse ONE user-keyed exchange (the oracle's join
# form computes identical values).

ORACLE["q140_mad_outliers"] = """
WITH e AS (SELECT user_id, event_id, CAST(floor(value * 1000) AS BIGINT) AS vm
           FROM events),
r1 AS (SELECT user_id, event_id, vm,
              ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vm, event_id) AS rn,
              COUNT(*) OVER (PARTITION BY user_id) AS n
       FROM e),
med AS (SELECT user_id, vm AS med FROM r1 WHERE rn = (n + 1) // 2),
d AS (SELECT e.user_id, e.event_id, m.med, abs(e.vm - m.med) AS dev
      FROM e JOIN med m USING (user_id)),
r2 AS (SELECT user_id, event_id, med, dev,
              ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dev, event_id) AS rn2,
              COUNT(*) OVER (PARTITION BY user_id) AS n2
       FROM d),
mad AS (SELECT user_id, dev AS mad FROM r2 WHERE rn2 = (n2 + 1) // 2)
SELECT d.user_id, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(d.med) AS BIGINT) AS med_milli,
       CAST(MAX(m2.mad) AS BIGINT) AS mad_milli,
       CAST(SUM(CASE WHEN d.dev > 3 * m2.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM d JOIN mad m2 USING (user_id)
GROUP BY d.user_id ORDER BY d.user_id
"""


@_q("q140_mad_outliers")
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("cast(floor(value * 1000) as bigint)").alias("vm"),
    )
    w_rank = Window.partitionBy("user_id").orderBy("vm", "event_id")
    w_all = Window.partitionBy("user_id")
    # the count fuses into w_rank's Window operator (full frame, round
    # 12); w_all stays unordered for the med/mad pick layers below —
    # THEIR inputs arrive sorted by different keys (vm vs dev), so an
    # ordered spec there would force a re-sort for nothing
    w_n = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r1 = e.select(
        "user_id",
        "event_id",
        "vm",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    # the n rows per user are the same relation for both medians: pick
    # values propagate as per-partition window maxima, never a join
    d = r1.withColumn(
        "med",
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("vm"))
        ).over(w_all),
    ).withColumn("dev", F.abs(F.col("vm") - F.col("med")))
    w_rank2 = Window.partitionBy("user_id").orderBy("dev", "event_id")
    r2 = d.withColumn("rn2", F.row_number().over(w_rank2))
    withmad = r2.withColumn(
        "mad",
        F.max(
            F.when(F.col("rn2") == F.expr("(n + 1) div 2"), F.col("dev"))
        ).over(w_all),
    )
    return (
        withmad.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("med").cast("bigint").alias("med_milli"),
            F.max("mad").cast("bigint").alias("mad_milli"),
            F.sum((F.col("dev") > 3 * F.col("mad")).cast("bigint"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# q141 weighted median — quantity-weighted median spend per part via
# running cumulative weight: the first row (by spend order) whose
# doubled cumulative weight reaches the total. cumw is strictly
# increasing (w >= 1), so the pick is unique and deterministic.

ORACLE["q141_weighted_median"] = """
WITH x AS (SELECT l_partkey, CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
                  CAST(floor(l_quantity) AS BIGINT) + 1 AS w,
                  l_orderkey, l_linenumber FROM lineitem),
c AS (SELECT l_partkey, cents, w,
             CAST(SUM(w) OVER (PARTITION BY l_partkey
                  ORDER BY cents, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cumw,
             CAST(SUM(w) OVER (PARTITION BY l_partkey) AS BIGINT) AS totw,
             CAST(COUNT(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n
      FROM x),
f AS (SELECT l_partkey, cents, cumw, totw, n,
             ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY cumw) AS pick
      FROM c WHERE 2 * cumw >= totw)
SELECT l_partkey, CAST(n AS BIGINT) AS n, CAST(totw AS BIGINT) AS total_w,
       cents AS wmedian_cents
FROM f WHERE pick = 1 ORDER BY l_partkey
"""


@_q("q141_weighted_median")
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        "l_partkey",
        F.expr("cast(floor(l_extendedprice * 100) as bigint)").alias("cents"),
        (F.expr("cast(floor(l_quantity) as bigint)") + 1).alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    w_ord = Window.partitionBy("l_partkey").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # totw/n share w_cum's (partition, order) with the full frame —
    # same Window operator, two frames, one pass (round-12 fusion;
    # both aggregates are order-insensitive BIGINTs)
    w_all = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = x.select(
        "l_partkey",
        "cents",
        F.sum("w").over(w_cum).cast("bigint").alias("cumw"),
        F.sum("w").over(w_all).cast("bigint").alias("totw"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    w_pick = Window.partitionBy("l_partkey").orderBy("cumw")
    f = c.where(2 * F.col("cumw") >= F.col("totw")).withColumn(
        "pick", F.row_number().over(w_pick)
    )
    return (
        f.where(F.col("pick") == 1)
        .select(
            "l_partkey",
            "n",
            F.col("totw").alias("total_w"),
            F.col("cents").alias("wmedian_cents"),
        )
        .orderBy("l_partkey")
    )


# --------------------------------------------------------------------------
# q142 rank drift — Spearman footrule between the top-20 token ranks
# of the two doc_id-parity corpus halves. The two rank lists are
# pivoted together with a join-free MAX(CASE) groupBy, then one scalar
# aggregate; token counts shrink the corpus to vocab size first.

ORACLE["q142_rank_drift"] = """
WITH t AS (SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS tok
           FROM documents),
x AS (SELECT half, tok, COUNT(*) AS cnt FROM t WHERE tok <> '' GROUP BY half, tok),
r AS (SELECT half, tok,
             CAST(ROW_NUMBER() OVER (PARTITION BY half ORDER BY cnt DESC, tok)
             AS BIGINT) AS rk
      FROM x),
j AS (SELECT tok, MAX(CASE WHEN half = 0 THEN rk END) AS ra,
             MAX(CASE WHEN half = 1 THEN rk END) AS rb
      FROM r WHERE rk <= 20 GROUP BY tok)
SELECT CAST(COUNT(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL THEN 1 END)
       AS BIGINT) AS n_shared,
       CAST(COALESCE(SUM(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                          THEN abs(ra - rb) END), 0) AS BIGINT) AS footrule,
       CAST(COUNT(CASE WHEN rb IS NULL THEN 1 END) AS BIGINT) AS n_only_a,
       CAST(COUNT(CASE WHEN ra IS NULL THEN 1 END) AS BIGINT) AS n_only_b
FROM j
"""


@_q("q142_rank_drift")
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    x = t.groupBy("half", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("half").orderBy(F.col("cnt").desc(), "tok")
    r = x.select(
        "half", "tok", F.row_number().over(w).cast("bigint").alias("rk")
    ).where(F.col("rk") <= 20)
    j = r.groupBy("tok").agg(
        F.max(F.when(F.col("half") == 0, F.col("rk"))).alias("ra"),
        F.max(F.when(F.col("half") == 1, F.col("rk"))).alias("rb"),
    )
    both = F.col("ra").isNotNull() & F.col("rb").isNotNull()
    return j.agg(
        F.count(F.when(both, F.lit(1))).cast("bigint").alias("n_shared"),
        F.coalesce(
            F.sum(F.when(both, F.abs(F.col("ra") - F.col("rb")))), F.lit(0)
        )
        .cast("bigint")
        .alias("footrule"),
        F.count(F.when(F.col("rb").isNull(), F.lit(1)))
        .cast("bigint")
        .alias("n_only_a"),
        F.count(F.when(F.col("ra").isNull(), F.lit(1)))
        .cast("bigint")
        .alias("n_only_b"),
    )


# --------------------------------------------------------------------------
# q143 peak concurrency — sweep-line max-overlap of 7-day order
# validity windows per priority. Boundary deltas are pre-aggregated
# per (priority, instant) BEFORE the running sum, so the per-priority
# ordered pass runs over distinct instants (calendar days here), not
# raw orders — the running sum's input shrinks with GROUP BY first.

ORACLE["q143_peak_concurrency"] = f"""
WITH b AS (
    SELECT o_orderpriority, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS tus,
           1 AS delta
    FROM orders
    UNION ALL
    SELECT o_orderpriority,
           epoch_us(CAST(o_orderdate AS TIMESTAMP)) + {_WEEK_US}, -1
    FROM orders
),
g AS (SELECT o_orderpriority, tus, CAST(SUM(delta) AS BIGINT) AS net
      FROM b GROUP BY o_orderpriority, tus),
c AS (SELECT o_orderpriority, tus,
             CAST(SUM(net) OVER (PARTITION BY o_orderpriority ORDER BY tus
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
             CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
                 AS n_points
      FROM g),
p AS (SELECT o_orderpriority, tus, cum, n_points,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY cum DESC, tus) AS pick
      FROM c)
SELECT o_orderpriority, cum AS peak, tus AS peak_at_us, n_points
FROM p WHERE pick = 1 ORDER BY o_orderpriority
"""


@_q("q143_peak_concurrency")
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    starts = o.select(
        "o_orderpriority", _order_us().alias("tus"), F.lit(1).alias("delta")
    )
    ends = o.select(
        "o_orderpriority",
        (_order_us() + F.lit(_WEEK_US)).alias("tus"),
        F.lit(-1).alias("delta"),
    )
    g = (
        starts.unionByName(ends)
        .groupBy("o_orderpriority", "tus")
        .agg(F.sum("delta").cast("bigint").alias("net"))
    )
    w_ord = Window.partitionBy("o_orderpriority").orderBy("tus")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # n_points fuses into the cumulative window's operator (full
    # frame, round-12): one pass computes both
    w_all = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "o_orderpriority",
        "tus",
        F.sum("net").over(w_cum).cast("bigint").alias("cum"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n_points"),
    )
    w_pick = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cum").desc(), "tus"
    )
    return (
        c.withColumn("pick", F.row_number().over(w_pick))
        .where(F.col("pick") == 1)
        .select(
            "o_orderpriority",
            F.col("cum").alias("peak"),
            F.col("tus").alias("peak_at_us"),
            "n_points",
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q144 interval coverage — union length of overlapping 30-minute
# session intervals per user (gaps-and-islands): an interval starts a
# new island when its start exceeds the running max of all prior ends;
# the island id is the running count of starts; islands then merge
# with one keyed aggregate.

ORACLE["q144_interval_coverage"] = f"""
WITH e AS (SELECT user_id, event_id,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS s,
                  epoch_us(CAST(ts AS TIMESTAMP)) + {_SESSION_US} AS en
           FROM events),
o AS (SELECT user_id, event_id, s, en,
             MAX(en) OVER (PARTITION BY user_id ORDER BY s, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM e),
m AS (SELECT user_id, event_id, s, en,
             CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END
                 AS is_start
      FROM o),
isl AS (SELECT user_id, s, en,
               CAST(SUM(is_start) OVER (PARTITION BY user_id
                    ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
        FROM m),
g AS (SELECT user_id, island, MIN(s) AS st, MAX(en) AS fin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM isl GROUP BY user_id, island)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(c) AS BIGINT) AS n_intervals,
       CAST(SUM(fin - st) AS BIGINT) AS covered_us
FROM g GROUP BY user_id ORDER BY user_id
"""


@_q("q144_interval_coverage")
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("s"),
        (F.col("ts_us") + F.lit(_SESSION_US)).alias("en"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("s", "event_id")
    w_prev = w_seq.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m = e.withColumn("prev_max", F.max("en").over(w_prev)).withColumn(
        "is_start",
        F.when(
            F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    isl = m.select(
        "user_id",
        "s",
        "en",
        F.sum("is_start").over(w_cum).cast("bigint").alias("island"),
    )
    g = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("st"),
        F.max("en").alias("fin"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum("c").cast("bigint").alias("n_intervals"),
            F.sum(F.col("fin") - F.col("st")).cast("bigint").alias("covered_us"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# q145 path motif — sequence-pattern predicate over per-user ordered
# event paths: view, then click, then purchase, with NO intervening
# purchase (regex 'v[^p]*c[^p]*p'). Event-type initials are distinct
# (click/signup/error/view/purchase), so one char per step suffices;
# the per-user path is built with a sorted-struct fold inside one
# groupBy — no window, no self-join, and q67's staged-min funnel
# cannot express the exclusion constraint.

ORACLE["q145_path_motif"] = """
WITH e AS (SELECT user_id, substr(event_type, 1, 1) AS ch,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_id FROM events),
p AS (SELECT user_id, string_agg(ch, '' ORDER BY tus, event_id) AS path
      FROM e GROUP BY user_id),
m AS (SELECT user_id,
             CASE WHEN regexp_matches(path, 'v[^p]*c[^p]*p') THEN 1 ELSE 0 END
                 AS hit,
             CAST(length(path) AS BIGINT) AS plen
      FROM p)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COALESCE(SUM(hit), 0) AS BIGINT) AS n_matched,
       CAST(CASE WHEN COUNT(*) = 0 THEN -1
            ELSE COALESCE(SUM(hit), 0) * 1000000 // COUNT(*) END AS BIGINT)
           AS match_ppm,
       CAST(COALESCE(SUM(plen), 0) AS BIGINT) AS total_steps
FROM m
"""


@_q("q145_path_motif")
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "user_id",
        F.col("ts_us").alias("tus"),
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    p = e.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(tus, event_id, ch))), x -> x.ch), '')"
        ).alias("path")
    )
    m = p.select(
        F.when(F.col("path").rlike("v[^p]*c[^p]*p"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("hit"),
        F.length("path").cast("bigint").alias("plen"),
    )
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_matched"),
        F.when(F.count(F.lit(1)) == 0, F.lit(-1))
        .otherwise(
            F.expr("coalesce(sum(hit), 0) * 1000000 div count(1)")
        )
        .cast("bigint")
        .alias("match_ppm"),
        F.coalesce(F.sum("plen"), F.lit(0)).cast("bigint").alias("total_steps"),
    )

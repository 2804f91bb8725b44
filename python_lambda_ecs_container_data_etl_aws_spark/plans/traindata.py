"""Training-data pipeline + analytic queries q183-q192.

The reference's report tier stops at grouped aggregates
(`3.(2) mysql-lambda-ecs-container-etl.py` report routes, SURVEY §2
A3/A4); this family adds the corpus-QA and distribution analyses a
100 TB TRAINING-DATA pipeline runs downstream of them, each as one
declarative plan with a DuckDB oracle twin:

- q183 benchmark decontamination (shingle semi-join against an
  eval-set fingerprint), q184 sequence packing (prefix-sum binning),
  q185 vocabulary growth / hapax profile, q186 n-gram novelty
  (first-occurrence attribution) — the LLM-corpus ops;
- q187 YoY revenue ratio (lag window), q188 exact revenue deciles
  (rank-target join), q189 event-transition matrix (lead window),
  q190 event-type bitmask profile (sum-distinct powers of two),
  q191 Gini concentration (rank-weighted sums), q192 declarative
  data-quality rule suite (one pass per table, unioned verdicts).

Exactness discipline is the warehouse family's (see
plans/warehouse.py module doc): integer cents via DECIMAL(38,2)*100,
sums staged through DECIMAL(38,0) (HUGEINT on the DuckDB side), every
ratio one truncating ``div``/``//`` on NON-NEGATIVE 128-bit-staged
operands, every window keyed with explicit tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .core import ORACLE, _q, _t
from .evalsuite import _md5i_spark, _md5i_sql
from .warehouse import _cents_sql, _dsum, _dsum_sql, _REV_CP_SQL, _rev_cp


# --------------------------------------------------------------------------
# q183 benchmark decontamination. The pre-training hygiene gate: which
# documents leak an evaluation set's content? The "benchmark" is a
# deterministic 2% slice of the corpus (md5 gate on doc_id — in
# production it would be the real eval set); a non-benchmark doc is
# contaminated when it shares ANY word-5-gram with a benchmark doc.
# Scale: the corpus is shingled ONCE with an is_bench flag riding
# along, the membership test is MAX(is_bench) OVER the shingle key —
# the same single-shuffle window trick as q186 (a bench-side semi-join
# would make Spark re-derive the whole shingle build for the probe
# consumer: two full scan+split+explode subtrees, caught by round-7
# ADVICE); per-doc and per-source rollups after are aggregate-sized,
# and the only other documents scan is the trivial 2-column doc count
# (plan-asserted: text is read exactly once). 5-grams (not 3) keep
# the test discriminative on small vocabularies.
_Q183_MOD = 50  # 1/50 of docs form the benchmark slice


def _bench_gate_sql(col: str) -> str:
    return f"{_md5i_sql('bench|', col)} % {_Q183_MOD} = 0"


ORACLE["q183_benchmark_decontamination"] = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
shingle AS (
    SELECT DISTINCT doc_id, s FROM tok,
    UNNEST(list_transform(range(1, len(toks) - 3),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4])) AS u(s)
),
bench AS (
    SELECT DISTINCT s FROM shingle WHERE {_bench_gate_sql('doc_id')}
),
cont AS (
    SELECT DISTINCT doc_id FROM shingle
    WHERE NOT ({_bench_gate_sql('doc_id')})
      AND s IN (SELECT s FROM bench)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM cont)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
FROM documents
WHERE NOT ({_bench_gate_sql('doc_id')})
GROUP BY source ORDER BY source
"""


@_q("q183_benchmark_decontamination")
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    is_bench = (_md5i_spark("bench|", F.col("doc_id")) % _Q183_MOD == 0).cast(
        "int"
    )
    # inline 5-gram build (dedup.shingles discipline: toks materialized
    # once per row, short docs guarded, per-row array_distinct instead
    # of a corpus-wide distinct exchange) with source + is_bench riding
    # along so neither the window nor the rollup re-derives the subtree
    sh = (
        d.select(
            "doc_id",
            "source",
            is_bench.alias("is_bench"),
            F.split("text", " ").alias("toks"),
        )
        .filter(F.size("toks") >= 5)
        .select(
            "doc_id",
            "source",
            "is_bench",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(0, size(toks) - 5),"
                    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],"
                    " toks[i+3], toks[i+4])))"
                )
            ).alias("s"),
        )
    )
    hit = sh.withColumn(
        "hit", F.max("is_bench").over(Window.partitionBy("s"))
    )
    cont_per_src = (
        hit.filter(F.col("is_bench") == 0)
        .groupBy("doc_id", F.col("source").alias("ps"))
        .agg(F.max("hit").alias("cont"))
        .groupBy("ps")
        .agg(F.sum("cont").cast("bigint").alias("nc"))
    )
    # zero-shingle docs carry no rows above but still count as n_docs:
    # a second trivial (doc_id, source) scan — never a text re-read
    nb = d.filter(
        _md5i_spark("bench|", F.col("doc_id")) % _Q183_MOD != 0
    ).groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        nb.join(cont_per_src, nb.source == F.col("ps"), "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("nc"), F.lit(0))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q184 sequence packing. The pre-training batcher: documents packed
# into fixed-capacity token bins per source, sequentially by doc_id
# (deterministic; a greedy first-fit would be order-dependent anyway).
# bin = exclusive-prefix-sum(tokens) div CAP — one window pass; a doc
# straddling a boundary charges its bin past CAP (overflow is COUNTED,
# not hidden). Per-source report: bins, overflow bins, fill ppm.
# Scale: one source-keyed window (source partitions sort locally),
# two aggregate layers after — never a second corpus shuffle.
_Q184_CAP = 512

ORACLE["q184_sequence_packing"] = f"""
WITH d AS (
    SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
    FROM documents
),
c AS (
    SELECT source, doc_id, tok,
           CAST(COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS prior
    FROM d
),
b AS (
    SELECT source, prior // {_Q184_CAP} AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS bin_tokens
    FROM c GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN bin_tokens > {_Q184_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overflow_bins,
       CAST(CAST(SUM(bin_tokens) AS HUGEINT) * 1000000
            // (COUNT(*) * {_Q184_CAP}) AS BIGINT) AS fill_ppm
FROM b GROUP BY source ORDER BY source
"""


@_q("q184_sequence_packing")
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn(
        "prior", F.coalesce(F.sum("tok").over(w), F.lit(0)).cast("bigint")
    )
    b = (
        c.withColumn("bin", F.expr(f"prior div {_Q184_CAP}"))
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("bin_tokens"),
        )
    )
    return (
        b.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("bin_tokens").cast("bigint").alias("total_tokens"),
            F.sum(F.when(F.col("bin_tokens") > _Q184_CAP, 1).otherwise(0))
            .cast("bigint")
            .alias("n_overflow_bins"),
            F.expr(
                "CAST(SUM(CAST(bin_tokens AS DECIMAL(38,0))) * 1000000"
                f" div (COUNT(*) * {_Q184_CAP}) AS BIGINT)"
            ).alias("fill_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q185 vocabulary growth / hapax profile. Corpus-health statistics a
# data mix is tuned on: per source, total tokens, distinct tokens
# (type-token ratio) and hapax legomena (tokens seen exactly once —
# the OOV/noise signal). Scale: one token-keyed shuffle builds the
# per-(source, token) counts; everything after is vocabulary-sized.
ORACLE["q185_vocab_profile"] = """
WITH tok AS (
    SELECT source, u.t AS token
    FROM (SELECT source, string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(t)
),
v AS (
    SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(CAST(COUNT(*) AS HUGEINT) * 1000000 // SUM(cnt) AS BIGINT)
           AS ttr_ppm
FROM v GROUP BY source ORDER BY source
"""


@_q("q185_vocab_profile")
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    v = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        v.groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
            F.expr(
                "CAST(CAST(COUNT(*) AS DECIMAL(38,0)) * 1000000"
                " div SUM(cnt) AS BIGINT)"
            ).alias("ttr_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q186 n-gram novelty. Per source: how much of its shingle mass is
# NOVEL — first introduced by that document (global first occurrence
# attributed by min doc_id)? The dataset-curation signal for ordering
# and dedup aggressiveness. Scale: first-occurrence is a MIN WINDOW
# over the shingle key, not an aggregate joined back — the join form
# would make Spark re-derive the whole shingle build for the second
# consumer (the round-7 q189 lesson); here the corpus is scanned and
# shingled ONCE (plan-asserted), shuffled once on shingle, and the
# per-source rollup is aggregate-sized. Docs shorter than 3 tokens
# carry zero shingles and simply contribute n_docs.
ORACLE["q186_ngram_novelty"] = """
WITH tok AS (
    SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
shingle AS (
    SELECT DISTINCT doc_id, source, s FROM tok,
    UNNEST(list_transform(range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS u(s)
),
w AS (
    SELECT doc_id, source,
           CASE WHEN MIN(doc_id) OVER (PARTITION BY s) = doc_id
                THEN 1 ELSE 0 END AS novel
    FROM shingle
),
per_src AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(novel) AS BIGINT) AS n_novel
    FROM w GROUP BY source
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(MAX(n_shingles), 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(MAX(n_novel), 0) AS BIGINT) AS n_novel,
       CAST(CAST(COALESCE(MAX(n_novel), 0) AS HUGEINT) * 1000000
            // GREATEST(COALESCE(MAX(n_shingles), 0), 1) AS BIGINT)
           AS novelty_ppm
FROM documents d LEFT JOIN per_src p ON p.source = d.source
GROUP BY d.source ORDER BY d.source
"""


@_q("q186_ngram_novelty")
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # inline shingle build (operators.dedup.shingles keeps only the
    # id; source must ride along so the rollup needs no doc join).
    # toks materialized once per row, short docs guarded, per-row
    # array_distinct instead of a corpus-wide distinct exchange —
    # the dedup.shingles/q22 discipline.
    sh = (
        d.select("doc_id", "source", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(0, size(toks) - 3),"
                    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
                )
            ).alias("s"),
        )
    )
    w = sh.withColumn(
        "novel",
        F.when(
            F.min("doc_id").over(Window.partitionBy("s")) == F.col("doc_id"), 1
        ).otherwise(0),
    )
    per_src = w.groupBy(F.col("source").alias("ps")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum("novel").cast("bigint").alias("n_novel"),
    )
    return (
        d.join(per_src, d.source == F.col("ps"), "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.max("n_shingles"), F.lit(0))
            .cast("bigint")
            .alias("n_shingles"),
            F.coalesce(F.max("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
            F.expr(
                "CAST(CAST(COALESCE(MAX(n_novel), 0) AS DECIMAL(38,0))"
                " * 1000000 div GREATEST(COALESCE(MAX(n_shingles), 0), 1)"
                " AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q187 year-over-year revenue ratio. Per customer nation and order
# year: discounted revenue and the YoY RATIO in ppm (rev * 1e6 div
# prev_rev — a ratio of positive integers keeps the division on
# non-negative operands; NULL for a nation's first year). The lag
# window runs over the |nations|x|years| AGGREGATE, never raw facts.
# customer is SF-scaled (unhinted); nation is a hinted fixed dim.
ORACLE["q187_yoy_revenue"] = f"""
WITH r AS (
    SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS y,
           {_dsum_sql(_REV_CP_SQL)} AS rev_cp
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY 1, 2
)
SELECT n_name, y, rev_cp,
       CAST(CAST(rev_cp AS HUGEINT) * 1000000
            // LAG(rev_cp) OVER (PARTITION BY n_name ORDER BY y)
            AS BIGINT) AS yoy_ratio_ppm
FROM r ORDER BY n_name, y
"""


@_q("q187_yoy_revenue")
def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaled: no hard hint
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("y"))
        .agg(_dsum(_rev_cp()).alias("rev_cp"))
    )
    w = Window.partitionBy("n_name").orderBy("y")
    return (
        r.withColumn("prev_cp", F.lag("rev_cp").over(w))
        .select(
            "n_name",
            "y",
            "rev_cp",
            F.expr(
                "CAST(CAST(rev_cp AS DECIMAL(38,0)) * 1000000"
                " div prev_cp AS BIGINT)"
            ).alias("yoy_ratio_ppm"),
        )
        .orderBy("n_name", "y")
    )


# --------------------------------------------------------------------------
# q188 exact revenue deciles. Nearest-rank d/10 quantiles (d = 1..9)
# of order value per priority — exact, not approx_percentile. The
# rank targets k_d = ceil(d*n/10) need the per-priority count n; a
# separate count aggregate joined back would re-scan orders (the
# round-7 shared-subtree lesson), so n rides the SAME window
# partition as the row_number (COUNT(*) OVER needs no order — zero
# extra sort) and target rows filter by a 9-term OR. Scale: ONE
# orders scan (plan-asserted), one priority-keyed window sort; the
# <=9x|priorities| survivors explode x9 to recover which decile(s)
# each rank serves (ranks coincide when n < 10 — both engines emit
# one row per (priority, decile) regardless).
ORACLE["q188_revenue_deciles"] = f"""
WITH v AS (
    SELECT o_orderpriority,
           {_cents_sql('o_totalprice')} AS cents,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY {_cents_sql('o_totalprice')},
                                       o_orderkey) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
),
hit AS (
    SELECT * FROM v
    WHERE {' OR '.join(f'rn = ({d} * n + 9) // 10' for d in range(1, 10))}
)
SELECT o_orderpriority, CAST(u.d AS INT) AS decile, cents AS decile_cents
FROM hit, UNNEST(range(1, 10)) AS u(d)
WHERE rn = (u.d * n + 9) // 10
ORDER BY o_orderpriority, decile
"""


@_q("q188_revenue_deciles")
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.expr(_cents_sql("o_totalprice")).alias("cents"),
    )
    w_rank = Window.partitionBy("o_orderpriority").orderBy(
        "cents", "o_orderkey"
    )
    # n fuses into the rank window's operator (full frame, round-12)
    w_n = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    v = o.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    is_target = " OR ".join(f"rn = ({d} * n + 9) div 10" for d in range(1, 10))
    return (
        v.filter(F.expr(is_target))
        .withColumn("d", F.explode(F.sequence(F.lit(1), F.lit(9))))
        .filter(F.expr("rn = (d * n + 9) div 10"))
        .select(
            "o_orderpriority",
            F.col("d").cast("int").alias("decile"),
            F.col("cents").alias("decile_cents"),
        )
        .orderBy("o_orderpriority", "decile")
    )


# --------------------------------------------------------------------------
# q189 event-transition matrix. The Markov view of user behavior: for
# each user's time-ordered event stream, count (state -> next state)
# transitions and their per-state probability in ppm. The lead window
# partitions on user_id (one keyed shuffle); the per-state totals are
# a second WINDOW over the already-|types|^2-sized matrix — a join
# back would make Spark re-derive the whole scan+window subtree for
# the totals branch (measured: two events scans), the classic
# shared-subtree trap. The deterministic order is (ts_us, event_id) —
# same tiebreak family as q67's funnel.
ORACLE["q189_event_transitions"] = """
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
    FROM events
),
s AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS to_type
    FROM e
),
m AS (
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
    FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_trans,
       CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
       CAST(CAST(n_trans AS HUGEINT) * 1000000
            // SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
           AS prob_ppm
FROM m
ORDER BY from_type, to_type
"""


@_q("q189_event_transitions")
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    m = s.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trans")
    )
    wf = Window.partitionBy("from_type")
    return (
        m.withColumn("n_from", F.sum("n_trans").over(wf).cast("bigint"))
        .select(
            "from_type",
            "to_type",
            "n_trans",
            "n_from",
            F.expr(
                "CAST(CAST(n_trans AS DECIMAL(38,0)) * 1000000"
                " div n_from AS BIGINT)"
            ).alias("prob_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


# --------------------------------------------------------------------------
# q190 event-type bitmask profile. Per user, the SET of event types
# collapses to one integer: each type is a power-of-two bit and
# SUM(DISTINCT bit) == bit_or for distinct powers — portable to both
# engines without bit-aggregate functions. The mask distribution
# (which behavioral combinations exist, how many users each) is
# 2^|types|-bounded. Popcount is open-coded shifts so both engines
# run the identical integer expression. One user-keyed aggregate.
_Q190_BIT_SQL = (
    "(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2"
    " WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8"
    " WHEN 'view' THEN 16 ELSE 0 END)"
)
_Q190_POP = " + ".join(f"((mask div {1 << i}) % 2)" for i in range(5))
_Q190_POP_DUCK = " + ".join(f"((mask // {1 << i}) % 2)" for i in range(5))

ORACLE["q190_event_bitmask"] = f"""
WITH u AS (
    SELECT user_id,
           CAST(SUM(DISTINCT {_Q190_BIT_SQL}) AS BIGINT) AS mask
    FROM events GROUP BY user_id
)
SELECT mask, CAST({_Q190_POP_DUCK} AS INT) AS n_types,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u GROUP BY mask ORDER BY mask
"""


@_q("q190_event_bitmask")
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    u = (
        e.withColumn("bit", F.expr(_Q190_BIT_SQL))
        .groupBy("user_id")
        .agg(F.sum_distinct(F.col("bit")).cast("bigint").alias("mask"))
    )
    return (
        u.groupBy("mask")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            "mask",
            F.expr(_Q190_POP).cast("int").alias("n_types"),
            "n_users",
        )
        .orderBy("mask")
    )


# --------------------------------------------------------------------------
# q191 Gini concentration of positive customer balances per nation.
# With balances sorted ascending (custkey tiebreak), the Gini index is
# (2*SUM(rank*x) - (n+1)*SUM(x)) / (n*SUM(x)); every term stages
# through DECIMAL(38,0) / HUGEINT — SUM(rank*cents) reaches ~6e22 at
# SF 10 (240k customers/nation x 1e6 cents), far past BIGINT but well
# inside the 128-bit stage; the numerator is non-negative by the sort.
# One nation-keyed window over customer; aggregates after.
ORACLE["q191_gini_balance"] = f"""
WITH p AS (
    SELECT n_name, {_cents_sql('c_acctbal')} AS cents,
           ROW_NUMBER() OVER (PARTITION BY n_name
                              ORDER BY {_cents_sql('c_acctbal')}, c_custkey)
               AS rk
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    WHERE c_acctbal > 0.0
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       {_dsum_sql('cents')} AS bal_cents,
       CAST((2 * SUM(CAST(rk AS HUGEINT) * cents)
             - (COUNT(*) + 1) * SUM(CAST(cents AS HUGEINT))) * 1000000
            // (COUNT(*) * SUM(CAST(cents AS HUGEINT))) AS BIGINT)
           AS gini_ppm
FROM p GROUP BY n_name ORDER BY n_name
"""


@_q("q191_gini_balance")
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    n = _t(spark, sf_dir, "nation")
    p = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            F.expr(_cents_sql("c_acctbal")).alias("cents"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("n_name").orderBy("cents", "c_custkey")
            ),
        )
    )
    return (
        p.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            _dsum(F.col("cents")).alias("bal_cents"),
            F.expr(
                "CAST((2 * SUM(CAST(rk AS DECIMAL(38,0)) * cents)"
                " - (COUNT(*) + 1) * SUM(CAST(cents AS DECIMAL(38,0))))"
                " * 1000000"
                " div (COUNT(*) * SUM(CAST(cents AS DECIMAL(38,0))))"
                " AS BIGINT)"
            ).alias("gini_ppm"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# q192 declarative data-quality rule suite. The Deequ-style contract
# check a pipeline gates loads on (the reference's count-validation A2
# generalized to value rules): key uniqueness, range bounds, temporal
# sanity, positivity, unioned into a single verdict relation. The
# Spark plan computes ALL of a table's rules in ONE aggregate pass
# (each table scanned exactly once — plan-asserted) and stacks the
# verdict vector to rows with an in-row explode. Violation counts,
# not booleans: the operator reports magnitude.
ORACLE["q192_dq_rule_suite"] = f"""
SELECT 'orders_key_unique' AS rule,
       CAST(COUNT(*) AS BIGINT) AS n_checked,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_date_bounds',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderdate IS NULL
                      OR YEAR(o_orderdate) < 1992
                      OR YEAR(o_orderdate) > 2005 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_qty_range',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN CAST(l_quantity AS BIGINT) < 1
                      OR CAST(l_quantity AS BIGINT) > 50
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN {_cents_sql('l_discount')} < 0
                      OR {_cents_sql('l_discount')} > 10
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_price_positive',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN {_cents_sql('l_extendedprice')} <= 0
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
ORDER BY rule
"""


@_q("q192_dq_rule_suite")
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One MULTI-RULE aggregate per table (orders scanned once,
    # lineitem once — per-rule aggregates unioned naively would
    # re-scan the table per rule), then the 1-row verdict vector
    # stacks to rule rows with an in-row explode. The oracle keeps
    # the readable UNION ALL form; only results must match.
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def _stack(agg_df: DataFrame, rules: list[str]) -> DataFrame:
        pairs = ", ".join(
            f"struct('{r}' AS rule, n_checked, `{r}` AS n_violations)"
            for r in rules
        )
        return agg_df.select(
            F.explode(F.expr(f"array({pairs})")).alias("x")
        ).select("x.rule", "x.n_checked", "x.n_violations")

    yr = F.year("o_orderdate")
    o_agg = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("orders_key_unique"),
        F.sum(
            F.when(
                F.col("o_orderdate").isNull() | (yr < 1992) | (yr > 2005), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("orders_date_bounds"),
    )
    q = F.col("l_quantity").cast("bigint")
    dc = F.expr(_cents_sql("l_discount"))
    li_agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.sum(F.when((q < 1) | (q > 50), 1).otherwise(0))
        .cast("bigint")
        .alias("lineitem_qty_range"),
        F.sum(F.when((dc < 0) | (dc > 10), 1).otherwise(0))
        .cast("bigint")
        .alias("lineitem_discount_range"),
        F.sum(
            F.when(F.expr(_cents_sql("l_extendedprice")) <= 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("lineitem_price_positive"),
    )
    return (
        _stack(o_agg, ["orders_key_unique", "orders_date_bounds"])
        .unionByName(
            _stack(
                li_agg,
                [
                    "lineitem_qty_range",
                    "lineitem_discount_range",
                    "lineitem_price_positive",
                ],
            )
        )
        .orderBy("rule")
    )

"""Operator-backed contract queries q25-q28: the scale-path operators
(operators/) exposed through the driver contract.

- q25 MinHash-LSH carries the exact-Jaccard SQL oracle: the operator is
  fully deterministic (fixed seed), and its verify stage makes output ≡
  exact pairs at the threshold (validated equal at sf0.001/0.01/0.1;
  planted pairs sit at j ≥ 0.8 where band-miss probability is ~2e-4 and
  deterministic besides).
- q26 SimHash and q28 multimodal features are oracle-backed: both hash
  with md5 (the one hash every SQL engine shares), so the DuckDB twin
  reproduces signatures/checksums bit-for-bit. The q26 oracle computes
  ground truth the semantic way — ALL pairs at Hamming ≤ d — while the
  Spark side goes through banded candidates; banding is complete for
  d < num_bands (pigeonhole), so the outputs are identical, and the
  oracle doubles as a completeness proof of the banding.
- q27/q35 ANN remain rows-only (seeded hyperplanes / k-means cell means
  are not SQL-reproducible); recall-floor pytest properties carry their
  correctness instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup, multimodal, similarity
from .core import ORACLE, _q

_THRESH = 0.5

ORACLE["q25_minhash_lsh_neardup"] = f"""
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
SELECT a_id, b_id,
       n_inter / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE n_inter / (sa.n + sb.n - n_inter) >= {_THRESH}
ORDER BY a_id, b_id
"""


@_q("q25_minhash_lsh_neardup")
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_dedup(docs, threshold=_THRESH).orderBy("a_id", "b_id")


_SIMHASH_MAXD = 6

def _simhash_oracle() -> str:
    """Render the full SimHash pipeline (md5 token bits → sign-sums →
    signature → all-pairs Hamming filter) as one DuckDB query. The
    60 sum/bit columns are generated, mirroring the Spark loop."""
    bits = dedup.SIMHASH_BITS
    sums = ",\n           ".join(
        f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
h AS (
    SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok
),
sums AS (
    SELECT doc_id,
           {sums}
    FROM h GROUP BY 1
),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM sums)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_MAXD}
ORDER BY a_id, b_id
"""


ORACLE["q26_simhash_neardup"] = _simhash_oracle()


@_q("q26_simhash_neardup")
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs. Oracle-backed: md5-derived signatures
    are engine-portable, and banded candidate generation is complete
    for max_distance < num_bands, so Spark's banded output equals the
    oracle's all-pairs Hamming filter exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, max_distance=_SIMHASH_MAXD).orderBy("a_id", "b_id")


def _simhash_wide_oracle() -> str:
    """q193 ground truth: the 120-bit SimHash (both md5 halves as two
    60-bit BIGINT limbs) → all-pairs Hamming ≤ d, rendered as one
    DuckDB query. 2×60 generated sum columns mirror the Spark limb
    folds; limb hashes are md5 hex chars 1-15 / 16-30, identical
    byte-for-byte in both engines."""
    sums = ",\n           ".join(
        f"SUM(CASE WHEN ((h{half} >> {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        f" AS {half}{b}"
        for half in ("lo", "hi")
        for b in range(60)
    )
    sig_lo = " + ".join(
        f"(CASE WHEN lo{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(60)
    )
    sig_hi = " + ".join(
        f"(CASE WHEN hi{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(60)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
h AS (
    SELECT doc_id,
           CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS hlo,
           CAST('0x' || substr(md5(t), 16, 15) AS BIGINT) AS hhi
    FROM tok
),
sums AS (
    SELECT doc_id,
           {sums}
    FROM h GROUP BY 1
),
sig AS (
    SELECT doc_id,
           CAST({sig_lo} AS BIGINT) AS sim_lo,
           CAST({sig_hi} AS BIGINT) AS sim_hi
    FROM sums
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.sim_lo, b.sim_lo))
            + bit_count(xor(a.sim_hi, b.sim_hi)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim_lo, b.sim_lo))
      + bit_count(xor(a.sim_hi, b.sim_hi)) <= {_SIMHASH_MAXD}
ORDER BY a_id, b_id
"""


ORACLE["q193_simhash_wide_neardup"] = _simhash_wide_oracle()


@_q("q193_simhash_wide_neardup")
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    """120-bit wide-SimHash near-dup pairs — the design-scale fix for
    q26's measured quadratic candidate generation (BASELINE.md Round
    8: 60-bit/7-band geometry ⇒ ≤2^9 buckets/band ⇒ raw candidates
    ~7n²/2^9; the 120-bit layout's ≥2^17 buckets/band cuts density
    ~250× at the same d ≤ 6 pigeonhole completeness). Oracle-backed
    exactly like q26: md5-derived limbs reproduce bit-for-bit in
    DuckDB, and banding is complete for max_distance < num_bands, so
    the banded output equals the oracle's all-pairs Hamming filter.
    The relative threshold (6/120 vs 6/60) is deliberately tighter —
    a new contract, not a q26 replacement."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_wide_pairs(
        docs, max_distance=_SIMHASH_MAXD
    ).orderBy("a_id", "b_id")


@_q("q27_ann_lsh_topk")
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-3 for 10 query vectors (rows-only: seeded
    hyperplanes are not SQL-reproducible); recall vs brute force is
    property-tested."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=3
    ).orderBy("query_id", "rnk")


@_q("q35_ann_ivf_topk")
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-3 (rows-only: k-means cell means are float-order
    sensitive, so not SQL-reproducible); recall vs brute force is
    property-tested AND emitted per-round as RECALL_r{N}.json
    (tools/recall_probe.py). The k-means fit runs on a 25% seeded
    sample (the scale posture: fit on a sketch, assign/probe the full
    corpus). (n_cells, n_probe) = (16, 6) is a round-10 measured
    choice: the synthetic embeddings are near-uniform (rolled-replica
    construction), so recall is governed almost purely by the probed
    fraction — the swept frontier (8,3)=0.50, (32,12)=0.77-0.90,
    (16,6)=0.83-0.87 mean recall@3 picked the most tier-consistent
    point at ~38% scan; a naturally clustered corpus sits far above
    this floor at the same probe fraction.

    Round 11: ``min_coverage=0.5`` makes the probe COVERAGE-adaptive
    (see ivf_topk) — a query whose nearest cells are small keeps
    probing until half the corpus is covered, which removes the
    cell-size-skew recall floor (sf0.1 mean 0.83→0.97 measured).
    DOCUMENTED FLOOR: on this near-uniform corpus a true neighbor can
    sit in a distance-FAR cell (measured worst case: cell rank 14 of
    16 at sf0.01), which no probe ordering fixes below ~90% scan —
    the per-query min recall@3 at 50% coverage is 1/3 there
    (RECALL_r11); that is the IVF contract on unclustered data, not a
    defect, and pytest gates min recall ≥ 2/3 on a clustered fixture
    (the operator's operating regime)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=3, n_cells=16, n_probe=6,
        fit_fraction=0.25, min_coverage=0.5,
    ).orderBy("query_id", "rnk")


ORACLE["q28_multimodal_features"] = """
WITH b AS (
    SELECT doc_id AS item_id, 'image' AS modality, encode(text) AS payload,
           CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
    FROM documents
)
SELECT item_id, modality,
       CAST(octet_length(payload) AS BIGINT) AS size_bytes,
       CAST(64 + h % 960 AS BIGINT) AS width,
       CAST(64 + (h >> 10) % 960 AS BIGINT) AS height,
       h AS checksum64
FROM b ORDER BY item_id
"""


@_q("q28_multimodal_features")
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Oracle-backed:
    the stub decoder's md5-derived (width, height, checksum) is exactly
    reproducible in SQL, so the whole Arrow-batched worker path — schema,
    batching, partitioning — is validated against DuckDB, not just
    rows-counted."""
    docs = load_table(spark, sf_dir, "documents")
    mm = multimodal.documents_as_multimodal(docs)
    return multimodal.extract_features(mm).orderBy("item_id")


# --------------------------------------------------------------------------
# q54 incremental near-dup — today's batch (doc_id % 10 = 0) deduped
# against the existing corpus without forming old-old pairs
# (operators/dedup.minhash_lsh_dedup_incremental). Oracle = the exact
# all-pairs Jaccard restricted to pairs touching a new doc; equality
# holds for the same reason as q25 (deterministic verify ≡ exact at the
# threshold, band-miss probability ~2e-4 at planted similarities).

ORACLE["q54_incremental_neardup"] = f"""
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
    WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
    GROUP BY 1, 2
)
SELECT a_id, b_id,
       n_inter / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE n_inter / (sa.n + sb.n - n_inter) >= {_THRESH}
ORDER BY a_id, b_id
"""


@_q("q54_incremental_neardup")
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    return dedup.minhash_lsh_dedup_incremental(
        old, new, threshold=_THRESH
    ).orderBy("a_id", "b_id")

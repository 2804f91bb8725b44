"""Operator-backed contract queries q25-q28: the scale-path operators
(operators/) exposed through the driver contract.

- q25 MinHash-LSH carries the exact-Jaccard SQL oracle: the operator is
  fully deterministic (fixed seed), and its verify stage makes output ≡
  exact pairs at the threshold (validated equal at sf0.001/0.01/0.1;
  planted pairs sit at j ≥ 0.8 where band-miss probability is ~2e-4 and
  deterministic besides).
- q26-q28 are genuinely non-SQL-expressible (xxhash64 signatures,
  seeded hyperplanes, mapInPandas byte-level decode) → no oracle entry;
  the driver records the weaker rows-only check, and pytest property
  tests (tests/test_operators.py) carry correctness instead.
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


@_q("q26_simhash_neardup")
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates (rows-only: signature hashes are not
    SQL-reproducible). Deterministic for fixed input."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, max_distance=6).orderBy("a_id", "b_id")


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
    property-tested."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=3, n_cells=8, n_probe=3
    ).orderBy("query_id", "rnk")


@_q("q28_multimodal_features")
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (rows-only:
    byte-level FNV decode is not SQL-expressible). Deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    mm = multimodal.documents_as_multimodal(docs)
    return multimodal.extract_features(mm).orderBy("item_id")

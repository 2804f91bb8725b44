"""Deduplication operators.

- :func:`dedup_exact` — hash-groupBy, keep lowest id. One shuffle.
- :func:`shingles` / :func:`jaccard_pairs` — exact word-n-gram Jaccard
  (the q22 plan as a reusable operator). Quadratic in candidates.
- :func:`minhash_signatures` / :func:`lsh_candidate_pairs` /
  :func:`minhash_lsh_dedup` — the 100 TB path: shingle → xxhash64 →
  K universal-hash min-aggregations → band → bucket-join. Candidate
  generation is linear in corpus size (per bucket), and only candidates
  pay the exact-Jaccard verify.
- :func:`simhash_signatures` / :func:`simhash_pairs` — 60-bit SimHash
  (md5-derived token bits, so the pipeline is SQL-oracle-able) with
  banded candidate generation and Hamming-distance verify.

Everything is built-in column expressions (whole-stage codegen) — no
Python UDF anywhere on the hot path. xxhash64 is Spark's JVM-side
64-bit hash; universal hashing ((a*x+b) mod p) gives the K independent
permutations.

Reference parity: the reference has no near-dedup (its dedup is the
idempotency window, `2.2 loading-lambda-for-mysql.py:219-255`); these
operators are the north-star extension (BASELINE.json) for LLM-corpus
curation at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus. Keys and coefficients
# stay below 2^31 so a*x+b fits in a 63-bit long (Spark 4 runs ANSI
# mode: long overflow is an error, not a wrap).
_P = (1 << 31) - 1


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per exact text (lowest id wins). Returns kept rows."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word-n-gram shingles per document: (id, shingle).

    Tokenization is materialized once per row (a projected ``toks``
    column) — inlining split() into each n-gram index re-parses the
    text n+1 times per row and dominated profile time.

    Docs shorter than ``n`` tokens yield zero shingles: the index
    generator is guarded so ``sequence(0, negative)`` never runs —
    under Spark 4 ANSI mode an unguarded descending sequence indexes
    ``toks`` out of bounds and aborts the whole job. Empty/short docs
    are routine in LLM corpora; they must be a no-op, not a crash.
    """
    parts = ", ".join(f"toks[i+{j}]" for j in range(n))
    gen = (
        f"CASE WHEN size(toks) >= {n} "
        f"THEN transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.split(F.col(text_col), " ").alias("toks"),
        )
        .select("id", F.explode(F.expr(gen)).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, threshold: float, candidates: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard over shingle sets → pairs (a_id, b_id, jaccard) ≥ threshold.

    With ``candidates`` (a_id, b_id) the shingle self-join is restricted
    to those pairs (the LSH verify path); without, it is all-pairs.
    """
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    if candidates is not None:
        # Candidate-restricted intersection: expand each candidate pair
        # by the left doc's shingles, then probe the right side on
        # (id, shingle). Cost is |candidates| × shingles-per-doc — NOT
        # the all-pairs shingle self-join (common shingles in a small
        # vocab make that explode quadratically).
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            F.broadcast(candidates)
            .join(a, F.col("a_id") == F.col("a.id"))
            .join(
                b,
                (F.col("b_id") == F.col("b.id"))
                & (F.col("a.shingle") == F.col("b.shingle")),
            )
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    j = (
        inter.join(F.broadcast(sizes.alias("sa")), F.col("a_id") == F.col("sa.id"))
        .join(F.broadcast(sizes.alias("sb")), F.col("b_id") == F.col("sb.id"))
        .select(
            "a_id",
            "b_id",
            (
                F.col("n_inter")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def _perm_params(k: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) draws for K universal hash functions."""
    params = []
    state = seed & 0x7FFFFFFFFFFFFFFF
    for _ in range(k):
        # xorshift64* — tiny deterministic PRNG, no runtime randomness.
        state ^= (state >> 12) & 0xFFFFFFFFFFFFFFFF
        state ^= (state << 25) & 0xFFFFFFFFFFFFFFFF
        state ^= (state >> 27) & 0xFFFFFFFFFFFFFFFF
        a = ((state * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF) % _P or 1
        state ^= (state >> 12) & 0xFFFFFFFFFFFFFFFF
        state ^= (state << 25) & 0xFFFFFFFFFFFFFFFF
        state ^= (state >> 27) & 0xFFFFFFFFFFFFFFFF
        b = ((state * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF) % _P
        params.append((a, b))
    return params


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """(id, h0..h{K-1}) MinHash signature via K min-aggregations.

    One shuffle (groupBy id); each h_i is min((a_i*x + b_i) mod P) over
    the doc's shingle hashes x = xxhash64(shingle) (sign-masked to
    non-negative so the modulus behaves).
    """
    x = (F.xxhash64("shingle").bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))) % F.lit(_P)
    hashed = sh.select("id", x.alias("x"))
    aggs = [
        F.min((F.col("x") * F.lit(a) + F.lit(b)) % F.lit(_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(_perm_params(num_hashes, seed))
    ]
    return hashed.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, num_bands: int = 16, max_bucket_size: int | None = None
) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band bucket
    become candidate pairs (a_id < b_id, distinct).

    Scale shape: explode to (band, bucket_hash) rows → self-join per
    bucket. Bucket sizes are the skew risk at 100 TB: one boilerplate
    phrase shared by 10M docs makes a bucket whose self-join is 10M² —
    ``max_bucket_size`` drops those degenerate buckets before the join
    (a doc pair that REALLY is a near-dup still meets in its other,
    non-boilerplate bands, so recall loss is confined to pairs similar
    only in the skewed content). AQE skew-join handles the moderate
    skew below the cap.
    """
    hcols = [c for c in sig.columns if c.startswith("h")]
    rows_per_band = len(hcols) // num_bands
    bands = []
    for bnd in range(num_bands):
        cols = hcols[bnd * rows_per_band : (bnd + 1) * rows_per_band]
        bands.append(
            F.struct(
                F.lit(bnd).alias("band"),
                F.xxhash64(*[F.col(c) for c in cols]).alias("bucket"),
            )
        )
    exploded = sig.select(
        F.col("id"), F.explode(F.array(*bands)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if max_bucket_size is not None:
        # one extra shuffle on the same (band, bucket) keys the join
        # uses; the window count never materializes mega-bucket pairs
        wb = Window.partitionBy("band", "bucket")
        exploded = (
            exploded.withColumn("__bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    num_bands: int = 16,
    ngram: int = 3,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs ≥ threshold: MinHash-LSH candidates, exact
    Jaccard verify. Returns (a_id, b_id, jaccard).

    The shingle relation feeds three plan branches (signatures, sizes,
    intersection self-join) — persist it once instead of recomputing
    the tokenize+explode+distinct pipeline per branch. At 100 TB this
    persist becomes a checkpoint to cluster storage; the plan shape is
    identical."""
    sh = shingles(df, text_col, id_col, ngram).persist()
    sig = minhash_signatures(sh, num_hashes, seed)
    cand = lsh_candidate_pairs(sig, num_bands, max_bucket_size)
    return jaccard_pairs(sh, threshold, candidates=cand)


# --------------------------------------------------------------------------
# SimHash


SIMHASH_BITS = 60


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash per doc: bit b is the sign of sum(±1) over token
    hashes' bit b. Exploded tokens → 60 conditional sums → bit-OR fold.

    The token hash is the first 15 hex chars of md5 as a 60-bit integer
    (``conv(substr(md5(t),1,15),16,10)``) — deliberately md5, not
    xxhash64: md5 is reproducible in any SQL engine, so the whole
    SimHash pipeline carries a DuckDB oracle twin (q26) instead of a
    weaker rows-only check. 60 bits keeps the value strictly positive
    in a signed BIGINT (no sign-bit special case) at no meaningful
    precision loss vs 64.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    )
    h = F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("bigint")
    hashed = tok.select("id", h.alias("h"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = hashed.groupBy("id").agg(*sums)
    sig = F.lit(0).cast("bigint")
    for b in range(SIMHASH_BITS):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.lit(2 ** b).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    return per_doc.select("id", sig.alias("simhash"))


def hamming64(a, b):
    """Hamming distance between two BIGINT columns (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 10,
    num_bands: int = 12,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 60-bit signature into
    ``num_bands`` chunks — by pigeonhole, a pair with Hamming distance
    < num_bands agrees exactly on ≥1 band, so bucket-joining bands
    yields a complete candidate set for ``max_distance < num_bands`` —
    then verify true Hamming distance. Returns (a_id, b_id, hamming).

    Calibration on the test corpus: planted near-dups land at distance
    0-9, background pairs at median ~18 (word-level SimHash on short
    docs is noisy — expect some background pairs below 10; MinHash-LSH
    is the higher-precision choice, SimHash the cheaper signature).
    """
    # persist: the banded self-join consumes the signature relation on
    # both sides — without it the 60-column aggregation runs twice.
    sig = simhash_signatures(df, text_col, id_col).persist()
    width = SIMHASH_BITS // num_bands
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bucket"),
        )
        for i in range(num_bands)
    ]
    exploded = sig.select("id", "simhash", F.explode(F.array(*bands)).alias("bb")).select(
        "id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "a_id", "b_id", hamming64(F.col("sa"), F.col("sb")).alias("hamming")
        )
        .filter(F.col("hamming") <= max_distance)
    )

"""Pins for bench.py's SPARK_GRAFT_DIGEST reduction (round-9 ADVICE).

Three properties the digest must hold for digest-mode walls and the
scale exponents derived from them to mean what they claim:

1. the query's final global sort is NOT eliminated under the digest
   aggregate (EliminateSorts drops a Sort under an order-insensitive
   Aggregate unless something order-opaque sits between) — otherwise
   digest walls exclude the range-partition exchange that every
   contract query pays;
2. two multisets that agree in count and XOR but differ in element
   multiplicities (the {A,A,B} vs {B,B,B} class) produce different
   digests;
3. two rows that differ only in WHICH column is NULL produce
   different digests (xxhash64 skips null arguments).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bench import digest_frame, digest_plan


def test_digest_keeps_global_sort(spark):
    df = (
        spark.range(1000)
        .select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
        .orderBy("k", "v")
    )
    # inspect the plan of the SAME lazy reduction production collects
    # (digest_frame == digest_plan(df).collect()) — no inline re-build
    # that could drift from the shipped expressions (round-10 ADVICE)
    reduced = digest_plan(df)
    optimized = reduced._jdf.queryExecution().optimizedPlan().toString()
    assert "Sort " in optimized, (
        "EliminateSorts dropped the query's final orderBy under the "
        "digest aggregate — digest walls would exclude the global "
        f"sort stage:\n{optimized}"
    )
    # and the naive reduction (no nondeterministic barrier) really
    # does lose the sort — the barrier is load-bearing, not cargo cult
    parts = []
    for c in df.columns:
        parts.append(F.isnull(F.col(c)).cast("int"))
        parts.append(F.col(c).cast("string"))
    naive = df.select(F.xxhash64(*parts).alias("__h")).agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor("__h").alias("x")
    )
    naive_opt = naive._jdf.queryExecution().optimizedPlan().toString()
    assert "Sort " not in naive_opt


def test_digest_breaks_even_multiplicity_collision(spark):
    a = spark.createDataFrame([("A",), ("A",), ("B",)], "v string")
    b = spark.createDataFrame([("B",), ("B",), ("B",)], "v string")
    da, db = digest_frame(a), digest_frame(b)
    assert da[0] == db[0] and da[1] == db[1], (
        "fixture no longer exercises the XOR collision class"
    )
    assert da != db  # the wrapping sum separates them


def test_digest_distinguishes_null_position(spark):
    a = spark.createDataFrame([(None, "x")], "c1 string, c2 string")
    b = spark.createDataFrame([("x", None)], "c1 string, c2 string")
    assert digest_frame(a) != digest_frame(b)


def test_digest_order_insensitive(spark):
    rows = [(i % 5, f"s{i}") for i in range(50)]
    a = spark.createDataFrame(rows, "k int, s string")
    b = spark.createDataFrame(list(reversed(rows)), "k int, s string").repartition(7)
    assert digest_frame(a) == digest_frame(b)

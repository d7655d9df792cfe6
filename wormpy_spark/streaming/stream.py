"""Structured Streaming front-ends.

The crawl engine is iterative batch by design (SURVEY.md §7.4: exact
ordering replay demands deterministic round boundaries — streaming
micro-batch boundaries are not replayable). This module provides the
streaming surfaces the engine exposes anyway:

- ``stream_metrics_rollup``: a readStream over an events/metrics table
  (file source) → watermarked tumbling-window aggregation →
  writeStream. With ``availableNow`` it processes a bounded backlog
  and stops — the per-round crawl ``metrics`` table can be tailed live
  this way on a cluster.
- ``stream_frontier_ingest``: continuous seed ingestion — new seed
  files appear in a directory, are canonicalized and deduped against
  the seen set per micro-batch via foreachBatch (the streaming
  analogue of J2 admission).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urlnorm import canonicalize_udf


def stream_metrics_rollup(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
):
    """Watermarked tumbling-window rollup over a file-source stream.
    Returns the started StreamingQuery (availableNow: drains backlog)."""
    src = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n",
            F.round("sum_value", 2).alias("sum_value"),
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_frontier_ingest(
    spark: SparkSession,
    seeds_dir: str,
    seen: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
):
    """Micro-batch seed admission: canonicalize incoming URLs, dedupe
    within the batch and against the seen set (J2 semantics), append
    admitted frontier rows. foreachBatch keeps the anti-join exact."""

    def admit(batch: DataFrame, batch_id: int) -> None:
        cand = (
            batch.withColumn("url_norm", canonicalize_udf(F.col("url")))
            .withColumn("url_hash", F.xxhash64("url_norm"))
            .dropDuplicates(["url_norm"])
        )
        admitted = cand.join(
            seen.select("url_hash", "url_norm"), on=["url_hash", "url_norm"], how="left_anti"
        )
        admitted.write.mode("append").parquet(out_dir)

    src = spark.readStream.schema("url string").text(seeds_dir).withColumnRenamed(
        "value", "url"
    )
    return (
        src.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


SESSION_OUTPUT_SCHEMA = "user_id long, n_sessions long, last_epoch long"
SESSION_STATE_SCHEMA = "last_epoch long, n_sessions long"


def stream_sessionize(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
    max_files_per_trigger: int = 1,
):
    """Custom STATEFUL streaming operator via applyInPandasWithState:
    per-user 30-min-gap sessionization maintained across micro-batches
    (the streaming analogue of the batch ``events_sessionize`` query —
    the test asserts the final emitted counts equal the batch window
    result). State per user = (last event epoch, sessions so far);
    each micro-batch folds its (in-order) events into the state and
    emits the running count in Update mode. Late/out-of-order arrivals
    across batches are the watermark problem; this operator assumes
    per-user batch-monotonic input (the crawl metrics tail satisfies
    it) and documents that contract rather than silently mis-counting —
    ``stream_sessionize_watermarked`` below is the event-time variant
    with an explicit drop-late policy.

    Returns a started StreamingQuery writing to the in-memory sink
    named ``sessionize_out`` (query it with
    ``spark.table("sessionize_out")``).
    """
    import pandas as pd

    def fold(key, pdfs, state) -> "pd.DataFrame":
        if state.exists:
            last_epoch, n_sessions = state.get
        else:
            last_epoch, n_sessions = None, 0
        # A group larger than arrow.maxRecordsPerBatch arrives as
        # MULTIPLE chunks whose concatenation is NOT chronologically
        # ordered (shuffle output order is arbitrary) — concatenate the
        # whole group and sort ONCE before folding; sorting chunks
        # independently lets last_epoch regress across chunk boundaries
        # and miscounts sessions.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(["ts", "event_id"])
            for ts in whole["ts"]:
                epoch = int(ts.timestamp())
                if last_epoch is None or epoch - last_epoch > gap_s:
                    n_sessions += 1
                last_epoch = epoch
        state.update((last_epoch, n_sessions))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "last_epoch": [last_epoch],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    sessions = src.groupBy("user_id").applyInPandasWithState(
        fold,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "Update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName("sessionize_out")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize_watermarked(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int = 1,
):
    """Event-time sessionization with an explicit LATE-DATA POLICY —
    the watermark-complete companion of ``stream_sessionize``.

    Built on Spark's native ``session_window`` aggregation (merging
    event-time windows with a ``gap`` timeout) plus ``withWatermark``:

    - out-of-order events WITHIN the watermark horizon merge into (or
      extend) their session window exactly as batch semantics would;
    - events older than the watermark are DROPPED (the documented
      policy: a row later than ``watermark`` behind the stream's max
      event time never resurrects or recounts a closed session);
    - append mode emits one row per (user, session) only when the
      watermark passes the session's end, so every emitted row is
      final — resumable and exactly-once from the checkpoint.

    Returns a started StreamingQuery writing to the in-memory table
    ``sessionize_wm_out`` with columns (user_id, session_start,
    session_end, n_events).
    """
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    sessions = (
        src.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessionize_wm_out")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_exact(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    checkpoint_dir: str,
    out_dir: str,
    key_cols: tuple = ("fingerprint",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
):
    """Streaming exact deduplication — the ingest-side companion of the
    batch ``dedup_exact`` query: rows whose key (e.g. content
    fingerprint) was already emitted are dropped across micro-batches.

    Uses ``dropDuplicatesWithinWatermark``: state holds only keys newer
    than the event-time watermark, so memory is bounded by the dedup
    horizon instead of growing with the whole stream — the honest
    100-TB posture (an unbounded ``dropDuplicates`` state would OOM; a
    full-history exact dedup belongs in the batch layer where the seen
    set lives in snapshots, crawl J1 semantics). Duplicates farther
    apart than the watermark are the batch layer's job.

    Returns the started StreamingQuery (availableNow drains a bounded
    backlog and stops).
    """
    src = spark.readStream.schema(schema).parquet(source_dir)
    deduped = src.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

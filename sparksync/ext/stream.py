"""Structured Streaming incremental sync — the extension the reference
lacks entirely (it is one-shot batch, cmd/root.go:40-45).

Shape: readStream(source) -> watermark -> optional windowed aggregation
-> foreachBatch(sink upsert). foreachBatch gives the JDBC upsert path
(MERGE/INSERT..ON DUPLICATE KEY) that Spark's streaming JDBC sink can't
express natively; on fixtures the sink is parquet append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def read_event_stream(
    spark: SparkSession, src_dir: str, schema, max_files: int = 1
) -> DataFrame:
    """File-based incremental source: new parquet files appearing under
    src_dir are the change feed (maxFilesPerTrigger throttles batches)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour", late: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type — late rows
    beyond `late` are dropped, bounding state at scale."""
    # Watermarks require TIMESTAMP (an instant); the batch loader emits
    # NTZ for the fixture's naive nanos column. Pin wall-clock == UTC via
    # epoch arithmetic — a plain cast would route through session tz.
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn(
            "ts",
            F.expr(
                "timestamp_micros(timestampdiff(MICROSECOND,"
                " timestamp_ntz '1970-01-01 00:00:00', ts))"
            ),
        )
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


RUNNING_STATS_SCHEMA = "user_id long, events_seen long, value_sum double"
_STATE_SCHEMA = "events_seen long, value_sum double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value sum maintained across micro-batches.
    This is the escape hatch for semantics windowed aggs can't express
    (the state lives between triggers); Arrow-batched so the Python hop
    is amortized. State size is O(distinct users) — bounded, and a
    production deployment adds a state timeout."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        seen, vsum = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            seen += len(pdf)
            vsum += float(pdf["value"].sum())
        state.update((seen, vsum))
        yield pd.DataFrame(
            {"user_id": [key[0]], "events_seen": [seen], "value_sum": [vsum]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def incremental_sync(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
) -> StreamingQuery:
    """foreachBatch upsert loop: each micro-batch is deduped on the key
    then appended; a JDBC target swaps the write body for an
    INSERT .. ON DUPLICATE KEY UPDATE executed per batch."""
    keys = key_cols or ["event_id"]

    def upsert(batch: DataFrame, batch_id: int) -> None:
        batch.dropDuplicates(keys).write.mode("append").parquet(out_dir)

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None, late: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps state
    only for the watermark horizon, so distinct-key state is bounded —
    the streaming counterpart of dedup.exact_dedup (which would need
    unbounded state as a plain dropDuplicates on a stream)."""
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn(
            "ts",
            F.expr(
                "timestamp_micros(timestampdiff(MICROSECOND,"
                " timestamp_ntz '1970-01-01 00:00:00', ts))"
            ),
        )
    return events.withWatermark("ts", late).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def enrich_stream(events: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (broadcastable) dimension snapshot — no watermark or state needed,
    and the dim can be re-read per trigger for slowly-changing lookups.
    The standard shape for attaching reference data at ingest."""
    return events.join(F.broadcast(dim), key, "left")

"""Structured Streaming incremental sync (ext/stream.py): two file
'arrivals' -> availableNow drain -> sink holds the union, keyed dedup
applied per batch; windowed aggregation matches its batch equivalent."""

from __future__ import annotations

from sparksync.ext import stream
from sparksync.source import load_table

from .conftest import SF_SMOKE


def test_incremental_sync_two_batches(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "synced")
    ckpt = str(tmp_path / "ckpt")
    first = events.where("event_id < 500")
    second = events.where("event_id >= 500")
    first.write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    s = stream.read_event_stream(spark, src, schema)
    q = stream.incremental_sync(s, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == first.count()

    # second arrival; availableNow restart drains only the new file
    second.write.mode("append").parquet(src)
    s2 = stream.read_event_stream(spark, src, schema)
    q2 = stream.incremental_sync(s2, out, ckpt)
    q2.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_windowed_counts_match_batch(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "in2")
    events.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = stream.read_event_stream(spark, src, schema)
    agg = stream.windowed_counts(s)
    out = str(tmp_path / "agg")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; with a
    # single availableNow drain that is every window except the last 2h.
    got = spark.read.parquet(out)
    from pyspark.sql import functions as F

    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "event_type", "cnt")
    )
    got_m = {(r["win_start"], r["event_type"]): r["cnt"] for r in got.collect()}
    batch_m = {(r["win_start"], r["event_type"]): r["cnt"] for r in batch.collect()}
    assert got_m, "stream emitted nothing"
    for k, v in got_m.items():
        assert batch_m[k] == v

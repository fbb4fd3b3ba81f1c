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


def test_stateful_running_stats(spark, tmp_path):
    """applyInPandasWithState: state persists across two availableNow
    drains — the second run's counts include the first run's events."""
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "in3")
    out = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt3")
    events.where("event_id < 500").write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        s = stream.read_event_stream(spark, src, schema, max_files=10)

        def sink(batch, _bid):
            # parquet has no update-mode sink; foreachBatch appends the
            # per-trigger update rows instead
            batch.write.mode("append").parquet(out)

        q = (
            stream.running_user_stats(s)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    events.where("event_id >= 500").write.mode("append").parquet(src)
    drain()
    got = spark.read.parquet(out)
    # last emission per user must equal the full-batch totals
    from pyspark.sql import functions as F

    final = {
        r["user_id"]: (r["events_seen"], round(r["value_sum"], 2))
        for r in got.groupBy("user_id")
        .agg(F.max("events_seen").alias("events_seen"),
             F.max("value_sum").alias("value_sum"))
        .collect()
    }
    batch = {
        r["user_id"]: (r["cnt"], round(r["s"], 2))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("s"))
        .collect()
    }
    assert final == batch


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


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicated input files -> dedup_stream emits each event_id once."""
    events = load_table(spark, SF_SMOKE, "events").limit(200)
    src = str(tmp_path / "dup_in")
    events.write.mode("append").parquet(src)
    events.write.mode("append").parquet(src)  # every row duplicated
    schema = spark.read.parquet(src).schema
    s = stream.read_event_stream(spark, src, schema, max_files=10)
    out = str(tmp_path / "dedup_out")
    q = (
        stream.dedup_stream(s)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_stream_static_enrichment(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").limit(300)
    src = str(tmp_path / "enrich_in")
    events.write.mode("append").parquet(src)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("purchase", "revenue")],
        "event_type string, category string",
    )
    schema = spark.read.parquet(src).schema
    s = stream.read_event_stream(spark, src, schema, max_files=10)
    out = str(tmp_path / "enriched")
    q = (
        stream.enrich_stream(s, dim, "event_type")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    assert got.where("event_type = 'purchase' and category != 'revenue'").count() == 0
    assert "category" in got.columns


def test_session_stats_match_batch(spark, tmp_path):
    """Closed sessions emitted by the stream must equal the batch
    session_window aggregation for the same (user, start)."""
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "sess_in")
    events.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = stream.read_event_stream(spark, src, schema, max_files=10)
    out = str(tmp_path / "sess_out")
    q = (
        stream.session_stats(s)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    from pyspark.sql import functions as F

    batch = (
        stream._as_instant(events)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("sess_start"), "n_events")
    )
    got_m = {(r["user_id"], r["sess_start"]): r["n_events"] for r in got.collect()}
    batch_m = {(r["user_id"], r["sess_start"]): r["n_events"] for r in batch.collect()}
    assert got_m, "stream emitted no closed sessions"
    for k, v in got_m.items():
        assert batch_m[k] == v


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """click->purchase attribution: the streaming range join must emit
    exactly the batch join's matches."""
    events = load_table(spark, SF_SMOKE, "events")
    clicks = events.where("event_type = 'click'")
    buys = events.where("event_type = 'purchase'")
    src_l = str(tmp_path / "jl")
    src_r = str(tmp_path / "jr")
    clicks.write.mode("append").parquet(src_l)
    buys.write.mode("append").parquet(src_r)
    schema = spark.read.parquet(src_l).schema
    sl = stream.read_event_stream(spark, src_l, schema, max_files=10)
    sr = stream.read_event_stream(spark, src_r, schema, max_files=10)
    out = str(tmp_path / "joined")
    q = (
        stream.join_streams(sl, sr)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "jck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    from pyspark.sql import functions as F

    bl = stream._as_instant(clicks).select(
        F.col("user_id").alias("l_key"), F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    br = stream._as_instant(buys).select(
        F.col("user_id").alias("r_key"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    batch = bl.join(
        br,
        F.expr("l_key = r_key and r_ts >= l_ts and r_ts <= l_ts + interval 1 hour"),
    )
    got_pairs = {(r["l_event_id"], r["r_event_id"]) for r in got.collect()}
    batch_pairs = {(r["l_event_id"], r["r_event_id"]) for r in batch.collect()}
    assert got_pairs == batch_pairs
    assert len(got_pairs) > 0


def test_cdc_apply_stream_two_batches(spark, tmp_path):
    """Streaming CDC apply: batch 1 seeds the snapshot (inserts, with
    one in-batch insert-then-delete netting out); batch 2 updates,
    deletes, and inserts against the live snapshot. The final snapshot
    equals applying merge_cdc twice in batch."""
    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [
            (1, "one", "I", 10),
            (2, "two", "I", 11),
            (3, "flash", "I", 12),
            (3, None, "D", 13),  # nets out within the batch
        ],
        "id long, val string, op string, seq long",
    )
    b1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = stream.read_event_stream(spark, src, schema, max_files=10)
    q = stream.cdc_apply_stream(s, snap, ckpt, ["id"], seq_col="seq")
    q.awaitTermination(120)
    got1 = {(r["id"], r["val"]) for r in spark.read.parquet(snap).collect()}
    assert got1 == {(1, "one"), (2, "two")}

    b2 = spark.createDataFrame(
        [(1, "one-v2", "U", 20), (2, None, "D", 21), (7, "seven", "I", 22)],
        "id long, val string, op string, seq long",
    )
    b2.write.mode("append").parquet(src)
    s2 = stream.read_event_stream(spark, src, schema, max_files=10)
    q2 = stream.cdc_apply_stream(s2, snap, ckpt, ["id"], seq_col="seq")
    q2.awaitTermination(120)
    got2 = {(r["id"], r["val"]) for r in spark.read.parquet(snap).collect()}
    assert got2 == {(1, "one-v2"), (7, "seven")}


def test_filter_report_runs_on_stream(spark, tmp_path):
    """corpus_filter_report is a pure narrow map, so the SAME operator
    runs unchanged on a stream — verdicts from the streaming run equal
    the batch run over identical input."""
    from sparksync.ext import textops

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    docs.write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    s = stream.read_event_stream(spark, src, schema, max_files=10)
    q = (
        textops.corpus_filter_report(s)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {tuple(r) for r in spark.read.parquet(out).collect()}
    batch = {tuple(r) for r in textops.corpus_filter_report(docs).collect()}
    assert streamed == batch and len(batch) > 0


def test_cms_counters_stream_match_batch(spark, tmp_path):
    """The streaming sketch drained over the fixture equals the batch
    counter table — fixed-state streaming frequency tracking."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    src = str(tmp_path / "cms_in")
    docs.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.cms_counters_stream(s)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_sketch")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.j, r.slot): r.cnt for r in spark.sql("select * from cms_sketch").collect()
    }
    batch = {
        (r.j, r.slot): r.cnt
        for r in stream.cms_counters_stream(docs).collect()
    }
    assert got == batch and len(got) > 0


def test_funnel_stream_matches_batch(spark, tmp_path):
    """The stateful streaming funnel, drained over the fixture in TWO
    micro-batches SPLIT BY EVENT (every user's history straddles the
    batch boundary, so state carry is genuinely exercised), agrees
    with the batch funnel_conversion step counts. Last-write-wins per
    user via emit_seq — update-mode emissions are not monotone (a late
    earlier-step event can demote), so max() would be wrong."""
    from pyspark.sql import functions as F

    from sparksync.ext import asof

    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "fun_in")
    # split by EVENT id, not user: both batches carry events for the
    # same users -> the second batch must merge into existing state
    events.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    events.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    steps = ["view", "click", "purchase"]
    q = (
        stream.funnel_stream(s, steps)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_live")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from funnel_live").collect()
    # a user emits at most once per batch, only on change
    per_user_rows = {}
    for r in rows:
        per_user_rows.setdefault(r.user_id, []).append(r)
    assert all(len(v) <= 2 for v in per_user_rows.values())
    # last emission per user (highest emit_seq) is the final state
    final = {
        u: max(v, key=lambda r: r.emit_seq).steps_completed
        for u, v in per_user_rows.items()
    }
    live_counts = {
        n: sum(1 for d in final.values() if d >= n) for n in (1, 2, 3)
    }
    batch = {
        r.step_idx: r.n_users
        for r in asof.funnel_conversion(events, steps).collect()
    }
    assert live_counts == {1: batch[1], 2: batch[2], 3: batch[3]}


def test_attribution_stream_matches_batch(spark, tmp_path):
    """Streaming last-touch attribution, drained in TWO micro-batches
    split at the median timestamp (state must carry each user's latest
    touch across the boundary), agrees with batch asof.last_touch on
    every purchase."""
    from pyspark.sql import functions as F

    from sparksync.ext import asof

    events = load_table(spark, SF_SMOKE, "events")
    # events.ts is TIMESTAMP_NTZ (nanos parquet): cast before unix_micros
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = (
        events.select(us.alias("u"))
        .agg(F.expr("percentile(u, 0.5)").alias("c"))
        .first()
        .c
    )
    src = str(tmp_path / "attr_in")
    events.where(us <= cut).coalesce(1).write.mode("append").parquet(src)
    events.where(us > cut).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream.attribution_stream(s, "purchase")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_live")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = {
        r.event_id: r.attributed
        for r in spark.sql("select * from attr_live").collect()
    }
    batch = {
        r.event_id: r.attributed
        for r in asof.last_touch(
            events, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    assert live == batch
    assert len(live) > 0


def test_media_features_on_stream(spark, tmp_path):
    """The multimodal decode path runs unchanged under Structured
    Streaming (mapInPandas is stream-capable): media files 'arriving'
    across two micro-batches decode with the same per-row capture as
    batch."""
    import numpy as np

    from sparksync.ext import multimodal as mm
    from sparksync.ext.jpeg import emit_jpeg

    img = np.full((8, 8, 3), [10, 200, 30], dtype=np.uint8)
    rows1 = [(1, "image", bytearray(emit_jpeg(img)), 8, 8)]
    rows2 = [(2, "image", bytearray(mm.emit_png(img)), 8, 8),
             (3, "image", bytearray(b"\x89PNG junk"), None, None)]
    src = str(tmp_path / "media_in")
    spark.createDataFrame(rows1, mm.MEDIA_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows2, mm.MEDIA_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    s = (
        spark.readStream.schema(mm.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        mm.media_features(s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("media_live")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r.media_id: r for r in spark.sql("select * from media_live").collect()}
    assert out[1].status == "decoded" and out[1].mean_g in range(198, 203)
    assert out[2].status == "decoded" and out[2].mean_g == 200.0
    assert out[3].status == "unsupported"


def test_zone_map_stream_matches_batch(spark, tmp_path):
    """The streamed zone-map table drained over the fixture equals the
    batch zone_map_stats build — live file-skipping statistics with
    one-row-per-bucket state."""
    from sparksync.compare import zone_map_stats

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    src = str(tmp_path / "zm_in")
    li.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.zone_map_stream(s, "l_orderkey", 1000, "l_shipdate")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("zone_map")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from zone_map").collect()}
    batch = {
        tuple(r)
        for r in zone_map_stats(li, "l_orderkey", 1000, "l_shipdate").collect()
    }
    assert got == batch and len(got) > 0


def test_freshness_stream_matches_batch(spark, tmp_path):
    """The streamed per-group freshness table drained over the fixture
    equals the batch freshness_audit's (group, last_ts, n_rows) slice —
    one-row-per-group state, no watermark needed."""
    from sparksync.compare import freshness_audit

    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "ts")
    src = str(tmp_path / "fresh_in")
    ev.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.freshness_stream(s, "event_type", "ts")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("freshness")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from freshness").collect()}
    batch = {
        (r.event_type, r.last_ts, r.n_rows)
        for r in freshness_audit(ev, "event_type", "ts").collect()
    }
    assert got == batch and len(got) == 5


def test_interarrival_stream_matches_batch(spark, tmp_path):
    """The streamed per-batch bucket increments, rolled up after a
    TWO-batch drain (state must carry each user's last event across
    the batch boundary), equal the batch interarrival_histogram."""
    from pyspark.sql import functions as F

    from sparksync.ext.asof import interarrival_histogram

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )
    src = str(tmp_path / "ia_in")
    # two files = two availableNow micro-batches, split on event time so
    # cross-batch gaps exercise the saved state (NTZ has no double
    # cast; diff against the epoch instead)
    epoch = (
        "timestampdiff(SECOND, timestamp_ntz '1970-01-01 00:00:00', ts)"
    )
    cut = ev.selectExpr(f"percentile({epoch}, 0.5) p").collect()[0].p
    ev.where(F.expr(epoch) <= cut).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.expr(epoch) > cut).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.interarrival_stream(s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ia")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_type, r.bucket): r.n
        for r in spark.sql(
            "select event_type, bucket, cast(sum(n_gaps) as bigint) n "
            "from ia group by 1, 2"
        ).collect()
    }
    want = {
        (r.event_type, r.bucket): r.n_gaps
        for r in interarrival_histogram(
            ev, "event_type", "user_id", "ts", "event_id"
        ).collect()
    }
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# Restart recovery (VERDICT r6 #4): every stateful family must survive a
# stop + cold restart from its checkpoint — the production failure mode
# for stateful streaming. Each test drains batch 1 with ONE query, lets
# it terminate, lands new data, and starts a SECOND query object from
# the SAME checkpoint; parity with the batch operator then proves the
# state store round-tripped (not merely that state carried between
# micro-batches inside one run).
# ---------------------------------------------------------------------------


def _two_files_by_time(events, src):
    """Split the fixture at the median event time into two files so
    per-user histories straddle the restart boundary."""
    from pyspark.sql import functions as F

    epoch = "timestampdiff(SECOND, timestamp_ntz '1970-01-01 00:00:00', ts)"
    cut = events.selectExpr(f"percentile({epoch}, 0.5) p").collect()[0].p
    first = events.where(F.expr(epoch) <= cut)
    second = events.where(F.expr(epoch) > cut)
    first.coalesce(1).write.mode("append").parquet(src)
    return second


def test_funnel_stream_restart_recovers_state(spark, tmp_path):
    """applyInPandasWithState restart: funnel state (first-step
    timestamps + emit_seq) written by query 1 must be recovered by a
    brand-new query 2 started from the same checkpoint; the merged
    emissions equal the batch funnel."""
    from pyspark.sql import functions as F

    from sparksync.ext import asof

    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "fr_in")
    out = str(tmp_path / "fr_out")
    ckpt = str(tmp_path / "fr_ckpt")
    second = _two_files_by_time(events, src)
    schema = spark.read.parquet(src).schema
    steps = ["view", "click", "purchase"]

    def drain():
        s = spark.readStream.schema(schema).parquet(src)

        def sink(batch, _bid):
            batch.write.mode("append").parquet(out)

        q = (
            stream.funnel_stream(s, steps)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # query 1: first half, then terminates
    second.coalesce(1).write.mode("append").parquet(src)
    drain()  # query 2: cold start from checkpoint, second half only
    got = spark.read.parquet(out)
    # emit_seq lives IN the state, so it keeps counting across the
    # restart; max emit_seq per user = the final verdict
    final = {
        r.user_id: r.steps_completed
        for r in got.withColumn(
            "rk",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("emit_seq"))
            ),
        )
        .where("rk = 1")
        .collect()
    }
    live_counts = {n: sum(1 for d in final.values() if d >= n) for n in (1, 2, 3)}
    batch = {
        r.step_idx: r.n_users
        for r in asof.funnel_conversion(events, steps).collect()
    }
    assert live_counts == {1: batch[1], 2: batch[2], 3: batch[3]}


def test_attribution_stream_restart_recovers_state(spark, tmp_path):
    """Restart for the append-mode stateful family: the latest-touch
    triple saved by query 1 must attribute query 2's purchases after a
    cold start from the checkpoint."""
    from sparksync.ext import asof

    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "ar_in")
    out = str(tmp_path / "ar_out")
    ckpt = str(tmp_path / "ar_ckpt")
    second = _two_files_by_time(events, src)
    schema = spark.read.parquet(src).schema

    def drain():
        s = spark.readStream.schema(schema).parquet(src)

        def sink(batch, _bid):
            batch.write.mode("append").parquet(out)

        q = (
            stream.attribution_stream(s, "purchase")
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    second.coalesce(1).write.mode("append").parquet(src)
    drain()
    live = {
        r.event_id: r.attributed for r in spark.read.parquet(out).collect()
    }
    batch = {
        r.event_id: r.attributed
        for r in asof.last_touch(
            events, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    assert live == batch and len(live) > 0


def test_interarrival_stream_restart_recovers_state(spark, tmp_path):
    """Restart for the increment-emitting stateful family: each
    (event_type, user) last-event state saved by query 1 must produce
    the straddling gap in query 2; the summed increments equal the
    batch histogram."""
    from sparksync.ext.asof import interarrival_histogram

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )
    src = str(tmp_path / "iar_in")
    out = str(tmp_path / "iar_out")
    ckpt = str(tmp_path / "iar_ckpt")
    second = _two_files_by_time(ev, src)
    schema = spark.read.parquet(src).schema

    def drain():
        s = spark.readStream.schema(schema).parquet(src)

        def sink(batch, _bid):
            batch.write.mode("append").parquet(out)

        q = (
            stream.interarrival_stream(s)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    second.coalesce(1).write.mode("append").parquet(src)
    drain()
    got = {
        (r.event_type, r.bucket): r.n
        for r in spark.read.parquet(out)
        .groupBy("event_type", "bucket")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).sum("n_gaps").cast("long").alias("n"))
        .collect()
    }
    want = {
        (r.event_type, r.bucket): r.n_gaps
        for r in interarrival_histogram(
            ev, "event_type", "user_id", "ts", "event_id"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_freshness_stream_restart_recovers_state(spark, tmp_path):
    """Restart for the aggregation-twin family (X87/X152/X180 share the
    statefulness mechanism: Spark's streaming-agg state store, not
    applyInPandasWithState): after a cold restart + second drain, the
    complete-mode table equals the batch audit over ALL data, proving
    the per-group (max, count) agg state round-tripped the
    checkpoint."""
    from sparksync.compare import freshness_audit

    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "ts")
    src = str(tmp_path / "fre_in")
    ckpt = str(tmp_path / "fre_ckpt")
    second = _two_files_by_time(ev, src)
    schema = spark.read.parquet(src).schema

    def drain(qname):
        s = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.freshness_stream(s, "event_type", "ts")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain("fre1")
    second.coalesce(1).write.mode("append").parquet(src)
    drain("fre2")  # new query, same checkpoint: agg state recovered
    got = {tuple(r) for r in spark.sql("select * from fre2").collect()}
    batch = {
        (r.event_type, r.last_ts, r.n_rows)
        for r in freshness_audit(ev, "event_type", "ts").collect()
    }
    assert got == batch and len(got) == 5


def test_hll_stream_matches_batch(spark, tmp_path):
    """The drained streaming HLL register table is BIT-IDENTICAL to the
    batch sketch over the same rows (register-max is commutative-
    mergeable), and the shared finisher over it reproduces the batch
    estimate exactly — stream and batch cannot disagree on the
    estimator by construction."""
    from sparksync.ext import skew

    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "user_id")
    src = str(tmp_path / "hll_in")
    ev.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.hll_registers_stream(s, "event_type", "user_id")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hllregs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = spark.sql("select * from hllregs")
    got = {tuple(r) for r in live.collect()}
    batch = {
        tuple(r)
        for r in skew.hll_registers(ev, "event_type", "user_id").collect()
    }
    assert got == batch and len(got) > 0
    est_live = {
        tuple(r) for r in skew.hll_estimate(live, "event_type").collect()
    }
    est_batch = {
        tuple(r)
        for r in skew.approx_distinct_hll(ev, "event_type", "user_id").collect()
    }
    assert est_live == est_batch


def test_hll_stream_restart_recovers_state(spark, tmp_path):
    """Restart for the streaming HLL: after a cold restart + second
    drain from the same checkpoint, the complete-mode register table
    equals the batch sketch over ALL data — the per-(group, register)
    max state round-tripped the state store."""
    from sparksync.ext import skew

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id", "ts"
    )
    src = str(tmp_path / "hllr_in")
    ckpt = str(tmp_path / "hllr_ckpt")
    second = _two_files_by_time(ev, src)
    schema = spark.read.parquet(src).schema

    def drain(qname):
        s = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.hll_registers_stream(s, "event_type", "user_id")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain("hllr1")
    second.coalesce(1).write.mode("append").parquet(src)
    drain("hllr2")
    got = {
        tuple(r)
        for r in spark.sql("select grp, _j, _m from hllr2").collect()
    }
    batch = {
        tuple(r)
        for r in skew.hll_registers(
            ev.select("event_type", "user_id"), "event_type", "user_id"
        ).collect()
    }
    assert got == batch and len(got) > 0


def _census_vocab(docs, k=64):
    """Frozen vocabulary the way production would freeze it: top-k
    corpus tokens by (freq desc, token asc) from a historical census."""
    from collections import Counter

    uni: Counter = Counter()
    for r in docs.select("text").collect():
        uni.update(t for t in r.text.split() if t)
    return sorted(uni, key=lambda t: (-uni[t], t))[:k]


def test_lm_counts_stream_matches_batch(spark, tmp_path):
    """The drained streaming bigram-LM count table equals the batch
    lm_bigram_counts over the same rows against the same frozen vocab
    — and both equal a pure-Python replay, so the array-side pair
    expression is proven against the definition, not just against
    itself. State is bounded by (V+1)^2 by construction."""
    from collections import Counter

    from sparksync.ext import textops

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    vocab = _census_vocab(docs)
    src = str(tmp_path / "lm_in")
    docs.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.lm_counts_stream(s, vocab)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("lm_model")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.w, r.w2): r.cnt
        for r in spark.sql("select * from lm_model").collect()
    }
    batch = {
        (r.w, r.w2): r.cnt
        for r in textops.lm_bigram_counts(docs, vocab).collect()
    }
    vs = set(vocab)
    want: Counter = Counter()
    for r in docs.select("text").collect():
        ts = [t if t in vs else "<unk>" for t in r.text.split() if t]
        want.update(zip(ts, ts[1:]))
    assert got == batch == dict(want) and len(got) > 0
    assert len(got) <= (len(vocab) + 1) ** 2


def test_lm_counts_stream_join_mapping_above_threshold(spark, tmp_path):
    """The auto-switched broadcast-join '<unk>' mapping (VERDICT r9
    #3) must stay STREAM-legal: above LM_VOCAB_JOIN_THRESHOLD the
    shared expression maps via two stream-static broadcast joins
    placed after array-side pair assembly and before the stateful
    count — drained table still equals batch and a pure-Python replay,
    and state stays bounded by the mapping happening pre-aggregation."""
    from collections import Counter

    from sparksync.ext import textops

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    real = _census_vocab(docs, 64)
    vocab = real + [
        f"__pad{i}__"
        for i in range(textops.LM_VOCAB_JOIN_THRESHOLD + 8 - len(real))
    ]
    assert len(vocab) > textops.LM_VOCAB_JOIN_THRESHOLD
    src = str(tmp_path / "lm_in_big")
    docs.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.lm_counts_stream(s, vocab)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("lm_model_big")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.w, r.w2): r.cnt
        for r in spark.sql("select * from lm_model_big").collect()
    }
    batch = {
        (r.w, r.w2): r.cnt
        for r in textops.lm_bigram_counts(docs, vocab).collect()
    }
    vs = set(real)  # pads never occur, so mapping matches the real set
    want: Counter = Counter()
    for r in docs.select("text").collect():
        ts = [t if t in vs else "<unk>" for t in r.text.split() if t]
        want.update(zip(ts, ts[1:]))
    assert got == batch == dict(want) and len(got) > 0


def test_lm_counts_stream_restart_recovers_state(spark, tmp_path):
    """Restart for the streaming LM model: after a cold restart +
    second drain from the same checkpoint, the complete-mode count
    table equals the batch model over ALL rows — the (w, w2) sums
    round-tripped the state store."""
    from pyspark.sql import functions as F

    from sparksync.ext import textops

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    vocab = _census_vocab(docs)
    src = str(tmp_path / "lmr_in")
    ckpt = str(tmp_path / "lmr_ckpt")
    first = docs.where(F.col("doc_id") % 2 == 0)
    second = docs.where(F.col("doc_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(qname):
        s = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.lm_counts_stream(s, vocab)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain("lmr1")
    second.coalesce(1).write.mode("append").parquet(src)
    drain("lmr2")
    got = {
        (r.w, r.w2): r.cnt for r in spark.sql("select * from lmr2").collect()
    }
    batch = {
        (r.w, r.w2): r.cnt
        for r in textops.lm_bigram_counts(docs, vocab).collect()
    }
    assert got == batch and len(got) > 0


def test_lm_score_against_drained_stream_model(spark, tmp_path):
    """The full production loop: census -> model maintained by a file
    stream -> drained memory table scored against a fresh corpus.
    Regression: the scoring join derives its context aggregate from
    the SAME model table (a self-join over a MemorySink view), which
    crashes with conflicting attribute ids unless the aggregate's
    inputs are re-aliased first — and it must equal scoring against
    the batch-built counts."""
    from collections import Counter

    from sparksync.ext import textops

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    vocab = _census_vocab(docs, k=128)
    src = str(tmp_path / "lms_in")
    docs.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.lm_counts_stream(s, vocab)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("lm_live_model")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = spark.sql("select * from lm_live_model")
    via_stream = {
        tuple(r)
        for r in textops.lm_score_against_model(
            docs, live, vocab, mode="fixed"
        ).collect()
    }
    via_batch = {
        tuple(r)
        for r in textops.lm_score_against_model(
            docs, textops.lm_bigram_counts(docs, vocab), vocab, mode="fixed"
        ).collect()
    }
    assert via_stream == via_batch and len(via_stream) == 20


def test_hll_stream_matches_batch_m64(spark, tmp_path):
    """The register-count parameter reaches the streaming twin too
    (round 11, with q48's m=64 gate): drained m=64 registers are
    bit-identical to the m=64 batch sketch, and the shared finisher at
    m=64 reproduces the batch estimate — one sketch, two runtimes, two
    accuracy points."""
    from sparksync.ext import skew

    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "user_id")
    src = str(tmp_path / "hll64_in")
    ev.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.hll_registers_stream(s, "event_type", "user_id", m=64)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hllregs64")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = spark.sql("select * from hllregs64")
    got = {tuple(r) for r in live.collect()}
    batch = {
        tuple(r)
        for r in skew.hll_registers(ev, "event_type", "user_id", m=64).collect()
    }
    assert got == batch and len(got) > 0
    assert max(r[1] for r in got) < 64  # register index bounded by m
    est_live = {
        tuple(r) for r in skew.hll_estimate(live, "event_type", m=64).collect()
    }
    est_batch = {
        tuple(r)
        for r in skew.approx_distinct_hll(
            ev, "event_type", "user_id", m=64
        ).collect()
    }
    assert est_live == est_batch


def test_cdc_apply_stream_recovers_mid_swap_crash(spark, tmp_path):
    """code-review r12: the old rmtree->rename swap could destroy the
    snapshot in a crash window and the retried batch rebuilt from ONE
    change batch. Simulate the worst window (publish crashed after the
    link vanished, versioned dir survives): the recovery scan must
    resume from the newest COMPLETE version, losing nothing."""
    import os

    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [(1, "one", "I", 10), (2, "two", "I", 11)],
        "id long, val string, op string, seq long",
    )
    b1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = stream.read_event_stream(spark, src, schema, max_files=10)
    q = stream.cdc_apply_stream(s, snap, ckpt, ["id"], seq_col="seq")
    q.awaitTermination(120)
    assert os.path.islink(snap)  # published via the atomic link
    # crash simulation: the link is gone, the complete version survives
    os.remove(snap)
    # an INCOMPLETE version (no _SUCCESS) must be ignored by recovery
    os.makedirs(snap + ".v999")
    b2 = spark.createDataFrame(
        [(1, "one-v2", "U", 20), (3, "three", "I", 21)],
        "id long, val string, op string, seq long",
    )
    b2.write.mode("append").parquet(src)
    s2 = stream.read_event_stream(spark, src, schema, max_files=10)
    q2 = stream.cdc_apply_stream(s2, snap, ckpt, ["id"], seq_col="seq")
    q2.awaitTermination(120)
    got = {(r["id"], r["val"]) for r in spark.read.parquet(snap).collect()}
    # batch-1 rows survived the simulated crash; batch 2 applied on top
    assert got == {(1, "one-v2"), (2, "two"), (3, "three")}


def test_incremental_sync_replay_is_idempotent(spark, tmp_path):
    """code-review r12: foreachBatch is at-least-once — a replayed
    batch (same batch_id, e.g. after a crash before the checkpoint
    commit) must not duplicate rows. Simulated by draining the same
    source twice with a FRESH checkpoint (second run replays batch 0
    over the same out_dir)."""
    events = load_table(spark, SF_SMOKE, "events").where("event_id < 200")
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "synced")
    events.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    for i, ckpt in enumerate(("ck_a", "ck_b")):
        s = stream.read_event_stream(spark, src, schema, max_files=10)
        q = stream.incremental_sync(s, out, str(tmp_path / ckpt))
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.count() == events.count(), f"run {i}"
        assert got.select("event_id").distinct().count() == events.count()


def test_cdc_gc_retains_previous_version(spark, tmp_path):
    """ADVICE r12: the publish GC must retain the most recent
    SUPERSEDED version one batch longer (GC N-2) so a concurrent
    reader that resolved the symlink just before the swap can finish
    its scan. After batch N publishes, version N-1 still exists;
    versions older than N-1 are gone."""
    import glob
    import os

    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    schema = None
    for i in range(3):
        b = spark.createDataFrame(
            [(100 + i, f"v{i}", "I", i)],
            "id long, val string, op string, seq long",
        )
        b.write.mode("append").parquet(src)
        if schema is None:
            schema = spark.read.parquet(src).schema
        s = stream.read_event_stream(spark, src, schema, max_files=10)
        q = stream.cdc_apply_stream(s, snap, ckpt, ["id"], seq_col="seq")
        q.awaitTermination(120)

    vers = sorted(glob.glob(snap + ".v*"))
    live = os.path.realpath(snap)
    assert live in (os.path.realpath(v) for v in vers)
    # exactly two versions on disk: the live one + its predecessor
    assert len(vers) == 2, vers
    # and the snapshot itself reads complete
    got = {r["id"] for r in spark.read.parquet(snap).collect()}
    assert got == {100, 101, 102}


def test_diversity_stream_matches_batch(spark, tmp_path):
    """X221: the drained streaming diversity state table is
    BIT-IDENTICAL to the batch state over the same rows (integer
    sums/counts are commutative-mergeable), and the shared finisher
    over it reproduces the batch score exactly — stream and batch
    cannot disagree by construction."""
    from sparksync.ext import similarity

    emb = load_table(spark, SF_SMOKE, "embeddings").select("label", "embedding")
    src = str(tmp_path / "div_in")
    emb.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.diversity_state_stream(s, "label")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("divstate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = spark.sql("select * from divstate")
    got = {tuple(r) for r in live.collect()}
    batch = {
        tuple(r)
        for r in similarity.diversity_state(emb, "label").collect()
    }
    assert got == batch and len(got) > 0
    score_live = {
        tuple(r) for r in similarity.diversity_finish(live, "label").collect()
    }
    score_batch = {
        tuple(r)
        for r in similarity.diversity_score(emb, "label").collect()
    }
    assert score_live == score_batch


def test_diversity_stream_restart_recovers_state(spark, tmp_path):
    """Restart for the diversity twin: drain half the corpus, stop,
    land the second half, restart from the same checkpoint — the
    complete-mode state equals the batch state over ALL rows."""
    from sparksync.ext import similarity

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    src = str(tmp_path / "div_in2")
    ckpt = str(tmp_path / "div_ckpt")
    emb.where("vec_id % 2 = 0").drop("vec_id").write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(name):
        s = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.diversity_state_stream(s, "label")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain("divr1")
    emb.where("vec_id % 2 = 1").drop("vec_id").write.mode("append").parquet(src)
    drain("divr2")
    got = {tuple(r) for r in spark.sql("select * from divr2").collect()}
    batch = {
        tuple(r)
        for r in similarity.diversity_state(
            emb.drop("vec_id"), "label"
        ).collect()
    }
    assert got == batch


def test_length_bucket_stream_matches_batch(spark, tmp_path):
    """X225: the drained streaming length-bucket state is BIT-IDENTICAL
    to the batch state over the same rows, and the shared finisher over
    it reproduces q226's padding numbers exactly."""
    from sparksync.ext import sampling

    docs = load_table(spark, SF_SMOKE, "documents").select("text")
    src = str(tmp_path / "lb_in")
    docs.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.length_bucket_stream(s)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("lbstate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = spark.sql("select * from lbstate")
    got = {tuple(r) for r in live.collect()}
    batch = {
        tuple(r) for r in sampling.length_bucket_state(docs).collect()
    }
    assert got == batch and len(got) > 0
    fin_live = {
        tuple(r) for r in sampling.length_bucket_finish(live).collect()
    }
    fin_batch = {
        tuple(r) for r in sampling.length_bucket_packing(docs).collect()
    }
    assert fin_live == fin_batch


def test_length_bucket_stream_restart_recovers_state(spark, tmp_path):
    """Restart for the length-bucket twin: drain half, stop, land the
    rest, restart from the same checkpoint — state equals batch over
    ALL rows."""
    from sparksync.ext import sampling

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    src = str(tmp_path / "lb_in2")
    ckpt = str(tmp_path / "lb_ckpt")
    docs.where("doc_id % 2 = 0").select("text").write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(name):
        s = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.length_bucket_stream(s)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain("lbr1")
    docs.where("doc_id % 2 = 1").select("text").write.mode("append").parquet(src)
    drain("lbr2")
    got = {tuple(r) for r in spark.sql("select * from lbr2").collect()}
    batch = {
        tuple(r)
        for r in sampling.length_bucket_state(docs.select("text")).collect()
    }
    assert got == batch

"""Event-time streaming: watermarked windows, applyInPandasWithState."""

import time

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.streaming.windows import (
    running_totals_with_state,
    windowed_event_counts,
)
from kusto_pre_forge_spark.tables import load_table


@pytest.fixture()
def event_waves(spark, sf_smoke, tmp_path):
    """events split into two parquet waves; wave 2 includes rows whose
    timestamps fall into wave-1 windows (late data)."""
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    land = tmp_path / "ev"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(land / "w0"))
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(land / "w1"))
    return str(land), ev


def test_windowed_counts_batch_matches_plain_groupby(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    got = {
        (r.window_start, r.window_end): r.n
        for r in windowed_event_counts(ev, "ts", "1 hour").collect()
    }
    want = {
        (r.w.start, r.w.end): r.n
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got


def test_windowed_counts_streaming_merges_late_rows(spark, event_waves, tmp_path):
    """Two micro-batches (1 file each); batch 2 carries rows that are late
    for batch-1 windows. Complete-mode output must equal the batch answer —
    i.e. late rows merged into their original windows."""
    land, ev = event_waves
    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{land}/w0").schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/w*/")
    )
    counts = windowed_event_counts(stream, "ts", "1 hour", watermark="2 days")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.window_end): r.n
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r.window_start, r.window_end): r.n
        for r in windowed_event_counts(ev, "ts", "1 hour").collect()
    }
    assert got == want


def test_running_totals_with_state_accumulates_across_batches(
    spark, event_waves, tmp_path
):
    land, ev = event_waves
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{land}/w0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/w*/")
    )
    totals = running_totals_with_state(stream, "event_type", "ts")
    q = (
        totals.writeStream.format("memory")
        .queryName("run_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM run_totals").collect()
    assert rows, "stateful op emitted nothing"
    # the LAST emission per key is the across-batch running total == batch count
    last = {}
    for r in rows:
        last[r.key] = max(last.get(r.key, 0), r.total)
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert last == want
    # state really persisted: some key must have emitted twice (two batches)
    from collections import Counter

    emissions = Counter(r.key for r in rows)
    assert max(emissions.values()) >= 2, "expected per-key emissions from both batches"


def test_streaming_dedup_drops_redelivery(spark, sf_smoke, tmp_path):
    """The same blob delivered twice (two micro-batches): the deduped
    stream must emit each event exactly once."""
    from kusto_pre_forge_spark.streaming.windows import streaming_dedup

    ev = load_table(spark, sf_smoke, "events").select("event_id", "ts").limit(50)
    land = tmp_path / "dup"
    ev.coalesce(1).write.parquet(str(land / "w0"))
    ev.coalesce(1).write.parquet(str(land / "w1"))  # re-delivery
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{land}/w0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/w*/")
    )
    deduped = streaming_dedup(stream, ["event_id"], "ts", watermark="10 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert len(got) == 50
    assert len({r.event_id for r in got}) == 50


def test_session_window_stats_batch_boundaries(spark):
    from kusto_pre_forge_spark.streaming.windows import session_window_stats

    rows = [
        # key u1: two events 10 min apart (one session), then a 2h gap
        (1, "2024-01-01 10:00:00", 5.0),
        (1, "2024-01-01 10:10:00", 7.0),
        (1, "2024-01-01 12:30:00", 1.0),
        # key u2: single event
        (2, "2024-01-01 09:00:00", 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sorted(
        (r.user_id, str(r.session_start), r.n_events, r.total_value)
        for r in session_window_stats(df, "user_id", "ts", gap="30 minutes").collect()
    )
    assert out == [
        (1, "2024-01-01 10:00:00", 2, 12.0),
        (1, "2024-01-01 12:30:00", 1, 1.0),
        (2, "2024-01-01 09:00:00", 1, 2.0),
    ]


def test_session_window_stats_streaming(spark, sf_smoke, tmp_path):
    from kusto_pre_forge_spark.streaming.windows import session_window_stats

    ev = load_table(spark, sf_smoke, "events").select("user_id", "ts", "value")
    land = tmp_path / "sess"
    ev.coalesce(1).write.parquet(str(land / "w0"))
    src = (
        spark.readStream.schema(ev.schema).parquet(str(land / "*"))
    )
    q = (
        session_window_stats(src, "user_id", "ts", gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM sess_out").first().n
    want = session_window_stats(ev, "user_id", "ts", gap="30 minutes").count()
    assert got == want and got > 0


def test_streaming_zscore_state_across_batches(spark, tmp_path):
    from kusto_pre_forge_spark.streaming.windows import (
        streaming_zscore_anomalies,
    )

    # wave 1 (older file): 50 calm points; wave 2: one wild spike.
    # maxFilesPerTrigger=1 makes each file its own micro-batch inside ONE
    # availableNow run, so the Welford state must carry between batches.
    calm = [("k", 10.0 + (i % 5) * 0.1) for i in range(50)]
    spike = [("k", 10.2), ("k", 999.0)]
    land = tmp_path / "z"
    spark.createDataFrame(calm, "key string, v double").coalesce(1).write.parquet(
        str(land / "w0")
    )
    import time as _time

    _time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    spark.createDataFrame(spike, "key string, v double").coalesce(1).write.parquet(
        str(land / "w1")
    )
    src = (
        spark.readStream.schema("key string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "*"))
    )
    q = (
        streaming_zscore_anomalies(src, "key", "v", threshold=5.0, min_history=30)
        .writeStream.format("memory")
        .queryName("z_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r.n: r for r in spark.sql("SELECT * FROM z_out").collect()}
    assert 50 in rows and rows[50].anomalies == 0, "calm batch: no flags"
    assert 52 in rows, "state carried into the second micro-batch"
    assert rows[52].anomalies == 1, "only the 999 spike flags"
    assert rows[52].max_abs_z > 100


def test_session_window_stats_custom_value_col(spark):
    from kusto_pre_forge_spark.streaming.windows import session_window_stats

    df = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00", 3.0),
            ("u1", "2024-01-01 10:10:00", 4.0),
        ],
        "user_id string, ts string, amount double",
    )
    r = session_window_stats(
        df, "user_id", "ts", gap="30 minutes", value_col="amount"
    ).first()
    assert r.n_events == 2 and r.total_value == 7.0


def test_stream_stream_interval_join_matches_batch(spark, sf_smoke, tmp_path):
    """streamed impression⋈click attribution == the same join run as a
    batch query; watermark + band bound the state."""
    from kusto_pre_forge_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    ev = load_table(spark, sf_smoke, "events").select("event_id", "ts", "user_id")
    views = ev.filter(F.col("event_id") % 3 == 0)
    clicks = ev.filter(F.col("event_id") % 3 == 1).withColumnRenamed(
        "event_id", "click_id"
    )
    # batch reference
    want = sorted(
        (r.user_id, r.ts, r.ts_right)
        for r in stream_stream_interval_join(
            views, clicks, "user_id",
            watermark="365 days", max_delay="interval 30 minutes",
        ).collect()
    )
    assert want, "fixture must produce matches"
    vdir, cdir = tmp_path / "v", tmp_path / "c"
    views.write.parquet(str(vdir))
    clicks.write.parquet(str(cdir))
    vs = spark.readStream.schema(views.schema).parquet(str(vdir))
    cs = spark.readStream.schema(clicks.schema).parquet(str(cdir))
    joined = stream_stream_interval_join(
        vs, cs, "user_id",
        watermark="365 days", max_delay="interval 30 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.ts, r.ts_right)
        for r in spark.sql("SELECT * FROM ssj").collect()
    )
    assert got == want


def test_streaming_heavy_hitters_state_across_batches(spark, tmp_path):
    """SpaceSaving counters persist across micro-batches: the second
    batch's emission reflects the WHOLE stream's counts, and lifetime
    bucket_rows accumulates."""
    from collections import Counter
    import hashlib

    from kusto_pre_forge_spark.streaming.windows import streaming_heavy_hitters

    K, B, SALT = 4, 2, "kpf-hh"
    w0 = ["x"] * 20 + ["y"] * 5
    w1 = ["x"] * 10 + ["z"] * 3
    land = tmp_path / "hh"
    spark.createDataFrame([(i,) for i in w0], "item string").coalesce(1).write.parquet(
        str(land / "w0")
    )
    import time as _time

    _time.sleep(1.1)
    spark.createDataFrame([(i,) for i in w1], "item string").coalesce(1).write.parquet(
        str(land / "w1")
    )
    src = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "*"))
    )
    q = (
        streaming_heavy_hitters(src, "item", k=K, n_buckets=B, salt=SALT)
        .writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM hh_out").collect()

    def bucket_of(it):
        h = hashlib.md5(f"{SALT}|{it}".encode()).hexdigest()[:8]
        return int(h, 16) % B

    true = Counter(w0 + w1)
    # latest emission per (bucket, item) = max bucket_rows
    latest = {}
    for r in rows:
        cur = latest.get((r.bucket, r.item))
        if cur is None or r.bucket_rows > cur[1]:
            latest[(r.bucket, r.item)] = (r.est, r.bucket_rows)
    # x spans both batches: its final est must count all 30 occurrences
    bx = bucket_of("x")
    assert latest[(bx, "x")][0] == 30, latest
    # lifetime rows per bucket accumulate across batches
    per_bucket_rows = {}
    for (b, _i), (_e, n) in latest.items():
        per_bucket_rows[b] = max(per_bucket_rows.get(b, 0), n)
    total_rows = sum(per_bucket_rows.values())
    assert total_rows == len(w0) + len(w1), per_bucket_rows


def test_streaming_source_quota_across_batches(spark, tmp_path):
    """Quota admits deterministically by order within a batch and the
    count persists across micro-batches: source a (quota 3) admits 2 in
    wave 0 then exactly 1 more in wave 1; source b under quota admits
    everything."""
    from kusto_pre_forge_spark.streaming.windows import streaming_source_quota

    w0 = [("a", 5), ("a", 1), ("b", 10)]
    w1 = [("a", 7), ("a", 2), ("b", 20)]
    land = tmp_path / "q"
    spark.createDataFrame(w0, "src string, n long").coalesce(1).write.parquet(
        str(land / "w0")
    )
    import time as _time

    _time.sleep(1.1)
    spark.createDataFrame(w1, "src string, n long").coalesce(1).write.parquet(
        str(land / "w1")
    )
    srcs = (
        spark.readStream.schema("src string, n long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "*"))
    )
    q = (
        streaming_source_quota(srcs, "src", 3, "n")
        .writeStream.format("memory")
        .queryName("quota_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM quota_out").collect()
    a = sorted(r.order_value for r in rows if r.source == "a")
    b = sorted(r.order_value for r in rows if r.source == "b")
    # wave0 admits 1 and 5 (sorted order); wave1 has room for ONE more,
    # the smaller of (2, 7) -> 2. 7 is dropped by the lifetime quota.
    assert a == [1, 2, 5], a
    assert b == [10, 20], b
    totals = {r.source: r.admitted_total for r in rows if r.source == "a"}
    assert max(
        r.admitted_total for r in rows if r.source == "a"
    ) == 3
    import pytest as _pt
    with _pt.raises(ValueError):
        streaming_source_quota(srcs, "src", 0, "n")


def test_streaming_source_quota_whole_batch_sorted_across_chunks(spark, tmp_path):
    """Admission near the quota cut must see the WHOLE micro-batch per
    key sorted, not each Arrow chunk independently: with a 10-row Arrow
    batch size and 100 rows arriving DESCENDING in one micro-batch, a
    per-chunk sort would admit the first chunk's values (90..99); the
    correct answer is the globally smallest 5 (0..4)."""
    from kusto_pre_forge_spark.streaming.windows import streaming_source_quota

    rows = [("a", 99 - i) for i in range(100)]
    land = tmp_path / "chunked"
    spark.createDataFrame(rows, "src string, n long").coalesce(1).write.parquet(
        str(land)
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        srcs = spark.readStream.schema("src string, n long").parquet(str(land))
        q = (
            streaming_source_quota(srcs, "src", 5, "n")
            .writeStream.format("memory")
            .queryName("quota_chunks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out = spark.sql("SELECT * FROM quota_chunks").collect()
        assert sorted(r.order_value for r in out) == [0, 1, 2, 3, 4]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streaming_domain_drift_jsd_against_history(spark, tmp_path):
    """First batch of a source has no history (jsd NULL); a second wave
    with the SAME distribution scores the closed-form near-zero JSD; a
    shifted wave scores higher. Expected values computed independently
    with numpy from the same histograms."""
    import math
    import time as _time

    import numpy as np

    from kusto_pre_forge_spark.streaming.windows import streaming_domain_drift

    B, sm = 64, 0.5
    w0 = [("a", "alpha beta gamma delta"), ("b", "one two three")]
    w1 = [("a", "alpha beta gamma delta"), ("b", "nine ten eleven twelve")]
    land = tmp_path / "drift"
    spark.createDataFrame(w0, "src string, text string").coalesce(1).write.parquet(
        str(land / "w0")
    )
    _time.sleep(1.1)
    spark.createDataFrame(w1, "src string, text string").coalesce(1).write.parquet(
        str(land / "w1")
    )
    srcs = (
        spark.readStream.schema("src string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "*"))
    )
    q = (
        streaming_domain_drift(srcs, "src", "text", n_buckets=B, smoothing=sm)
        .writeStream.format("memory")
        .queryName("drift_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM drift_out ORDER BY source, lifetime_tokens"
    ).collect()
    by = {}
    for r in rows:
        by.setdefault(r.source, []).append(r)

    import hashlib

    def hist(words):
        h = np.zeros(B, dtype="int64")
        for w in words:
            h[int(hashlib.md5(f"kpf-jsd|{w}".encode()).hexdigest()[:8], 16) % B] += 1
        return h

    def jsd(batch, lifetime):
        p = (batch + sm) / (batch.sum() + sm * B)
        q_ = (lifetime + sm) / (lifetime.sum() + sm * B)
        m = (p + q_) / 2
        return round(float(0.5 * (p * np.log(p / m)).sum()
                           + 0.5 * (q_ * np.log(q_ / m)).sum()), 6)

    # first batch: no history
    assert by["a"][0].jsd is None and by["b"][0].jsd is None
    # source a repeats its distribution; source b shifts vocabulary
    a0 = hist("alpha beta gamma delta".split())
    b0 = hist("one two three".split())
    b1 = hist("nine ten eleven twelve".split())
    assert by["a"][1].jsd == jsd(a0, a0)
    assert by["b"][1].jsd == jsd(b1, b0)
    assert by["b"][1].jsd > by["a"][1].jsd
    assert by["a"][1].lifetime_tokens == 8 and by["b"][1].lifetime_tokens == 7
    # bucket parity with the batch operator's md5 fold
    from kusto_pre_forge_spark.operators.corpus import _dsir_bucket
    from pyspark.sql import functions as F2

    got = (
        spark.createDataFrame([("alpha",), ("twelve",)], "w string")
        .select(_dsir_bucket(F2.col("w"), B, "kpf-jsd").alias("b"))
        .collect()
    )
    exp = [int(hashlib.md5(f"kpf-jsd|{w}".encode()).hexdigest()[:8], 16) % B
           for w in ("alpha", "twelve")]
    assert [r.b for r in got] == exp


def test_streaming_scan_steps_matches_batch_machine(spark, sf_smoke, tmp_path):
    """r14: the multi-step scan machine over a stream — two TIME-ORDERED
    waves (state must resume mid-session across the batch boundary)
    replay EXACTLY the batch machine's per-row output: same running
    state, same match ids. One walker backs both tiers, so this pins
    the state (de)serialization and batch-boundary resume, not a
    reimplementation."""
    from kusto_pre_forge_spark.operators import kql
    from kusto_pre_forge_spark.streaming.windows import streaming_scan_steps

    ev = (
        load_table(spark, sf_smoke, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < 15)
    )
    land = tmp_path / "scanev"
    ev.filter("ts < '2024-01-16'").coalesce(1).write.parquet(str(land / "w0"))
    ev.filter("ts >= '2024-01-16'").coalesce(1).write.parquet(str(land / "w1"))

    steps = [
        ("start", lambda env: True,
         [("last_ts", lambda env: env["ts"]), ("c", lambda env: 1)]),
        ("cont",
         lambda env: env["last_ts"] is not None
         and (env["ts"] - env["last_ts"]).total_seconds() <= 6 * 3600,
         [("last_ts", lambda env: env["ts"]),
          ("c", lambda env: env["c"] + 1)]),
    ]
    declare = {"last_ts": (None, "timestamp"), "c": (0, "bigint")}

    stream = (
        spark.readStream.schema(spark.read.parquet(f"{land}/w0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/w*/")
    )
    out = streaming_scan_steps(stream, "user_id", "ts", steps, declare)
    q = (
        out.writeStream.format("memory")
        .queryName("scan_sess")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_scan"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.ts): (r.c, r.match_id)
        for r in spark.sql("SELECT * FROM scan_sess").collect()
    }
    batch = kql.scan_steps(
        ev, order=[("ts", True)], steps=steps, declare=declare,
        by=["user_id"], match_name="match_id",
    )
    want = {
        (str(r.user_id), r.ts): (r.c, r.match_id) for r in batch.collect()
    }
    assert got == want and got
    # sessions genuinely cross the wave boundary (state resumed) OR at
    # minimum both waves emitted — the memory sink saw two batches
    assert len(got) == ev.count()

"""Sessionization: lag+cumsum vs native session_window equivalence."""

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators.sessions import session_stats, sessionize_lag
from kusto_pre_forge_spark.tables import load_table

GAP = 3600


@pytest.fixture(scope="module")
def events(spark, sf_smoke):
    return load_table(spark, sf_smoke, "events")


def test_lag_and_session_window_agree_on_session_counts(events):
    by_lag = (
        sessionize_lag(events, "user_id", "ts", GAP)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
    )
    by_sw = (
        session_stats(events, "user_id", "ts", GAP)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    l = {r.user_id: r.n_sessions for r in by_lag.collect()}
    s = {r.user_id: r.n_sessions for r in by_sw.collect()}
    assert l == s and l


def test_session_window_event_totals_and_bounds(events):
    st = session_stats(events, "user_id", "ts", GAP)
    assert st.agg(F.sum("n_events")).collect()[0][0] == events.count()
    # every session spans < its event count * gap and start <= end
    bad = st.filter(F.col("session_start") > F.col("session_end")).count()
    assert bad == 0


def test_sessionize_lag_ids_are_contiguous(events):
    rows = (
        sessionize_lag(events, "user_id", "ts", GAP)
        .filter(F.col("user_id") == 1)
        .orderBy("ts")
        .collect()
    )
    ids = [r.session_id for r in rows]
    assert ids[0] == 1
    assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))


def test_streaming_session_stats(spark, events, tmp_path):
    """session_window over a file stream with availableNow + watermark:
    append-mode output must equal the batch answer for closed sessions."""
    ev = events.select("user_id", "ts", "event_id")
    ev.coalesce(2).write.parquet(str(tmp_path / "ev"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(tmp_path / "ev")).schema
    ).parquet(str(tmp_path / "ev"))
    q = (
        session_stats(stream, "user_id", "ts", GAP, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    want = {
        (r.user_id, r.session_start): r.n_events
        for r in session_stats(events, "user_id", "ts", GAP).collect()
    }
    # append mode emits only watermark-closed sessions; everything emitted
    # must match the batch answer, and most sessions should have closed
    assert got
    for k, v in got.items():
        assert want.get(k) == v
    assert len(got) >= len(want) * 0.5

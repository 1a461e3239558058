"""Activity metrics: cohort retention + rolling engagement
(operators/activity.py)."""

import datetime

from kusto_pre_forge_spark.operators import activity


def _df(spark):
    D = datetime.datetime
    rows = [
        ("u1", D(2024, 1, 1)), ("u1", D(2024, 1, 8)), ("u1", D(2024, 1, 15)),
        ("u2", D(2024, 1, 2)), ("u2", D(2024, 1, 9)),
        ("u3", D(2024, 1, 10)),
    ]
    return spark.createDataFrame(rows, "u string, ts timestamp")


def test_cohort_retention_weekly(spark):
    ret = {
        (str(r.cohort)[:10], r.offset): (r.n_active, round(r.retention, 3))
        for r in activity.cohort_retention(_df(spark), "u", "ts", "week").collect()
    }
    # u1+u2 start week of Jan 1; u3 starts week of Jan 8
    assert ret[("2024-01-01", 0)] == (2, 1.0)
    assert ret[("2024-01-01", 1)] == (2, 1.0)
    assert ret[("2024-01-01", 2)] == (1, 0.5)  # only u1 returns in week 3
    assert ret[("2024-01-08", 0)] == (1, 1.0)


def test_rolling_engagement_dau_wau(spark):
    eng = {
        str(r.day): (r.inner_active, r.outer_active)
        for r in activity.rolling_engagement(_df(spark), "u", "ts", 1, 7).collect()
    }
    assert eng["2024-01-02"] == (1, 2)   # u2 today; u1 (Jan 1) still in window
    assert eng["2024-01-08"] == (1, 2)   # u1 today; u2 (Jan 2) in [Jan 2..8]
    assert eng["2024-01-10"] == (1, 3)   # u3 today; u1 (8), u2 (9) in window
    # only observed activity days are emitted
    assert "2024-01-03" not in eng


def test_funnel_steps_strict_ordering(spark):
    import datetime
    D = datetime.datetime
    rows = [
        # u1 completes the full funnel in order
        ("u1", D(2024, 1, 1), "signup"), ("u1", D(2024, 1, 2), "click"),
        ("u1", D(2024, 1, 3), "purchase"),
        # u2 purchases BEFORE clicking: stops at click
        ("u2", D(2024, 1, 1), "signup"), ("u2", D(2024, 1, 2), "purchase"),
        ("u2", D(2024, 1, 3), "click"),
        # u3 never signs up: not in the funnel at all
        ("u3", D(2024, 1, 1), "click"), ("u3", D(2024, 1, 2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, s string")
    out = {
        r.step_index: r.n_actors
        for r in activity.funnel_steps(
            df, "u", "ts", "s", ["signup", "click", "purchase"]
        ).collect()
    }
    assert out == {0: 2, 1: 2, 2: 1}


def test_sequence_transitions_counts(spark):
    import datetime
    D = datetime.datetime
    rows = [
        ("u1", D(2024, 1, 1), "a"), ("u1", D(2024, 1, 2), "b"),
        ("u1", D(2024, 1, 3), "a"),
        ("u2", D(2024, 1, 1), "a"), ("u2", D(2024, 1, 2), "b"),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, s string")
    out = {
        (r.from_state, r.to_state): r.n
        for r in activity.sequence_transitions(df, "u", "ts", "s").collect()
    }
    assert out == {("a", "b"): 2, ("b", "a"): 1}


def test_cohort_retention_monthly_calendar_units(spark):
    import pytest
    import datetime

    D = datetime.datetime
    rows = [
        ("u1", D(2024, 1, 5)), ("u1", D(2024, 2, 20)), ("u1", D(2024, 4, 1)),
        ("u2", D(2024, 1, 31)), ("u2", D(2024, 3, 1)),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    ret = {
        (str(r.cohort)[:10], r.offset): r.n_active
        for r in activity.cohort_retention(df, "u", "ts", "month").collect()
    }
    # variable-length months (Jan=31d, Feb=29d in 2024) must still land on
    # whole calendar offsets — fixed-seconds division would misbucket Feb->Mar
    assert ret[("2024-01-01", 0)] == 2
    assert ret[("2024-01-01", 1)] == 1  # u1 in Feb
    assert ret[("2024-01-01", 2)] == 1  # u2 in Mar
    assert ret[("2024-01-01", 3)] == 1  # u1 in Apr

    with pytest.raises(ValueError, match="bucket must be one of"):
        activity.cohort_retention(df, "u", "ts", "fortnight")


def test_sequence_detect_constraints(spark):
    from datetime import datetime as dt

    from kusto_pre_forge_spark.operators.activity import sequence_detect

    rows = [
        # user 1: clean a->b->c within windows
        (1, dt(2024, 1, 1, 0), "a"), (1, dt(2024, 1, 1, 1), "b"),
        (1, dt(2024, 1, 1, 2), "c"),
        # user 2: step gap too large (b is 3 days after a)
        (2, dt(2024, 1, 1, 0), "a"), (2, dt(2024, 1, 4, 0), "b"),
        (2, dt(2024, 1, 4, 1), "c"),
        # user 3: wrong order (c before b)
        (3, dt(2024, 1, 1, 0), "a"), (3, dt(2024, 1, 1, 1), "c"),
        # user 4: greedy first-match anchors at EARLIEST a; later a ignored
        (4, dt(2024, 1, 1, 0), "a"), (4, dt(2024, 1, 2, 0), "a"),
        (4, dt(2024, 1, 1, 12), "b"), (4, dt(2024, 1, 1, 13), "c"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string")
    out = {
        r.u: (r.step1_ts, r.span_s)
        for r in sequence_detect(
            df, "u", "ts", "s", ["a", "b", "c"],
            max_step_seconds=86400, max_span_seconds=2 * 86400,
        ).collect()
    }
    assert set(out) == {1, 4}
    assert out[1][1] == 7200.0
    assert out[4][0] == dt(2024, 1, 1, 0), "anchored at earliest step-1 event"


def test_sliding_window_counts_dense_axis(spark):
    from kusto_pre_forge_spark.operators.activity import sliding_window_counts

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 11:00:00"),
            (2, "2024-01-02 09:00:00"),
            (1, "2024-01-05 09:00:00"),
        ],
        "user_id long, ts string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    out = {
        str(r.day): (r.count_events, r.dcount_actors)
        for r in sliding_window_counts(df, "user_id", "ts", lookback_days=3).collect()
    }
    # dense axis covers Jan 1..5 including the empty Jan 4 window gap
    assert len(out) == 5
    assert out["2024-01-01"] == (2, 1)
    assert out["2024-01-02"] == (3, 2), "trailing 3d: both Jan1 events + Jan2"
    assert out["2024-01-03"] == (3, 2)
    assert out["2024-01-04"] == (1, 1), "only Jan 2 remains in window"
    assert out["2024-01-05"] == (1, 1)


def test_rolling_percentile_exact_window(spark):
    from kusto_pre_forge_spark.operators.activity import rolling_percentile

    F = __import__("pyspark.sql.functions", fromlist=["F"])
    df = spark.createDataFrame(
        [
            (10.0, "2024-01-01 01:00:00"),
            (20.0, "2024-01-02 01:00:00"),
            (30.0, "2024-01-03 01:00:00"),
        ],
        "value double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        str(r.day): r.p50
        for r in rolling_percentile(df, "value", "ts", 50.0, 2).collect()
    }
    # 2-day trailing windows: Jan1 {10}, Jan2 {10,20}, Jan3 {20,30}
    assert out["2024-01-01"] == 10.0
    assert out["2024-01-02"] == 15.0, "exact interpolation between 10 and 20"
    assert out["2024-01-03"] == 25.0


def test_active_users_count_threshold(spark):
    from kusto_pre_forge_spark.operators.activity import active_users_count

    F = __import__("pyspark.sql.functions", fromlist=["F"])
    rows = [
        # u1 active on 2 days of the window, u2 only 1
        (1, "2024-01-01 01:00:00"), (1, "2024-01-02 01:00:00"),
        (2, "2024-01-02 02:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        str(r.day): r.active_users
        for r in active_users_count(df, "user_id", "ts", 3, 2).collect()
    }
    assert out["2024-01-01"] == 0, "nobody has 2 distinct days yet"
    assert out["2024-01-02"] == 1, "only u1 crosses the 2-day threshold"


def test_funnel_sequence_prev_next(spark):
    from kusto_pre_forge_spark.operators.activity import funnel_sequence

    F = __import__("pyspark.sql.functions", fromlist=["F"])
    rows = [
        (1, "2024-01-01 01:00:00", "a"),
        (1, "2024-01-01 02:00:00", "mid"),
        (1, "2024-01-01 03:00:00", "b"),
        (2, "2024-01-01 01:00:00", "mid"),  # boundary: no prev/next
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, s string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        (r.prev_state, r.next_state): r.n
        for r in funnel_sequence(df, "user_id", "ts", "s", "mid").collect()
    }
    assert out[("a", "b")] == 1
    assert out[(None, None)] == 1


def test_activity_counts_metrics(spark):
    from kusto_pre_forge_spark.operators.activity import (
        activity_counts_metrics,
    )

    rows = [
        ("u1", "2024-01-01 03:00:00"),
        ("u1", "2024-01-01 09:00:00"),
        ("u2", "2024-01-01 10:00:00"),
        ("u1", "2024-01-02 01:00:00"),
        ("u3", "2024-01-02 02:00:00"),
        ("u3", "2024-01-04 05:00:00"),
    ]
    df = spark.createDataFrame(rows, "actor string, ts string")
    out = {
        str(r.bin.date()): r
        for r in activity_counts_metrics(df, "actor", "ts").collect()
    }
    d1, d2, d4 = out["2024-01-01"], out["2024-01-02"], out["2024-01-04"]
    assert (d1.count_, d1.dcount, d1.new_dcount, d1.aggregated_dcount) == (3, 2, 2, 2)
    assert (d2.count_, d2.dcount, d2.new_dcount, d2.aggregated_dcount) == (2, 2, 1, 3)
    assert (d4.count_, d4.dcount, d4.new_dcount, d4.aggregated_dcount) == (1, 1, 0, 3)


def test_new_activity_metrics(spark):
    from kusto_pre_forge_spark.operators.activity import new_activity_metrics

    rows = [
        ("u1", "2024-01-01 03:00:00"),
        ("u2", "2024-01-01 10:00:00"),
        ("u1", "2024-01-02 01:00:00"),  # u1 retained, u2 churned
        ("u3", "2024-01-02 02:00:00"),  # u3 new
        ("u2", "2024-01-03 05:00:00"),  # u2 returns (not new, not retained)
    ]
    df = spark.createDataFrame(rows, "actor string, ts string")
    out = {
        str(r.bin.date()): r
        for r in new_activity_metrics(df, "actor", "ts").collect()
    }
    d1, d2, d3 = out["2024-01-01"], out["2024-01-02"], out["2024-01-03"]
    assert (d1.dcount, d1.new_dcount, d1.retained_dcount, d1.churn_dcount) == (2, 2, 0, 0)
    assert d1.retention_rate is None, "no previous bin -> NULL rate"
    assert (d2.dcount, d2.new_dcount, d2.retained_dcount, d2.churn_dcount) == (2, 1, 1, 1)
    assert d2.retention_rate == 0.5 and d2.churn_rate == 0.5
    assert (d3.dcount, d3.new_dcount, d3.retained_dcount, d3.churn_dcount) == (1, 0, 0, 2)
    assert d3.retention_rate == 0.0 and d3.churn_rate == 1.0


def test_session_count(spark):
    from kusto_pre_forge_spark.operators.activity import session_count

    rows = [
        ("u1", "2024-01-01 10:00:00"),  # session 1
        ("u1", "2024-01-01 10:10:00"),  # same session (10 min gap)
        ("u1", "2024-01-01 12:00:00"),  # session 2 (>30 min)
        ("u2", "2024-01-01 09:00:00"),  # session 3
        ("u2", "2024-01-02 09:00:00"),  # session 4, next day
    ]
    df = spark.createDataFrame(rows, "actor string, ts string")
    out = {
        str(r.bin.date()): r.n_sessions
        for r in session_count(df, "actor", "ts").collect()
    }
    assert out == {"2024-01-01": 3, "2024-01-02": 1}

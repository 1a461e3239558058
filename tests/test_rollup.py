"""Multi-resolution rollups: stacked grains, refresh-from-finer equality."""

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators.rollup import rollup_from_finer, rollup_timeseries
from kusto_pre_forge_spark.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_smoke):
    return load_table(spark, sf_smoke, "events")


def test_rollup_grains_are_consistent(events):
    out = rollup_timeseries(
        events, "ts", ["1 hour", "1 day"],
        [("value", "sum", "sum_value"), ("event_id", "count", "n")],
    ).cache()
    hours = out.filter(F.col("resolution") == "1 hour")
    days = out.filter(F.col("resolution") == "1 day")
    # totals agree across grains and with the raw table
    n = events.count()
    assert hours.agg(F.sum("n")).collect()[0][0] == n
    assert days.agg(F.sum("n")).collect()[0][0] == n
    hs = hours.agg(F.sum("sum_value")).collect()[0][0]
    ds = days.agg(F.sum("sum_value")).collect()[0][0]
    assert abs(hs - ds) < 1e-6 * max(abs(hs), 1)
    # a day's count equals the sum of its hours
    one_day = days.orderBy("bucket_start").limit(1).collect()[0]
    hours_in_day = hours.filter(
        F.to_date("bucket_start") == F.lit(one_day.bucket_start.date())
    )
    assert hours_in_day.agg(F.sum("n")).collect()[0][0] == one_day.n


def test_rollup_from_finer_matches_direct(events):
    fine = rollup_timeseries(
        events, "ts", ["1 hour"],
        [("value", "sum", "sum_value"), ("event_id", "count", "n")],
        keys=["event_type"],
    ).drop("resolution")
    refreshed = rollup_from_finer(
        fine, "1 day",
        [("sum_value", "sum", "sum_value"), ("n", "count", "n")],
        keys=["event_type"],
    )
    direct = rollup_timeseries(
        events, "ts", ["1 day"],
        [("value", "sum", "sum_value"), ("event_id", "count", "n")],
        keys=["event_type"],
    )
    r = {(x.bucket_start, x.event_type): (x.n, round(x.sum_value, 6)) for x in refreshed.collect()}
    d = {(x.bucket_start, x.event_type): (x.n, round(x.sum_value, 6)) for x in direct.collect()}
    assert set(r) == set(d)
    for k in d:
        assert r[k][0] == d[k][0]
        assert abs(r[k][1] - d[k][1]) < 1e-6

"""GenerateLogData port (SURVEY §7 Phase 5) and skew helpers (Phase 7)."""

import datetime

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.functions.datagen import (
    TEXT_LENGTH_MAX,
    TEXT_LENGTH_MIN,
    generate_log_data,
)
from kusto_pre_forge_spark.operators import skew

BASE = datetime.datetime(2026, 1, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def logs(spark):
    return generate_log_data(spark, n_rows=2000, seed=3, base_time=BASE).cache()


def test_log_schema_and_domains(logs):
    assert [f.name for f in logs.schema.fields] == [
        "Id", "Timestamp", "Level", "Node", "ActivityId", "Text",
    ]
    r = logs.agg(
        F.count("*").alias("n"),
        F.countDistinct("Id").alias("ids"),
        F.countDistinct("Level").alias("levels"),
        F.countDistinct("Node").alias("nodes"),
        F.countDistinct("ActivityId").alias("acts"),
        F.min(F.length("Text")).alias("lmin"),
        F.max(F.length("Text")).alias("lmax"),
    ).collect()[0]
    assert r.n == r.ids == 2000
    assert r.levels == 3 and r.nodes == 25 and r.acts == 25
    assert r.lmin >= TEXT_LENGTH_MIN and r.lmax <= TEXT_LENGTH_MAX
    # reference invariant (NoHeaderNoCompressionTest.cs:25-34): rowcount ==
    # Id cardinality == Timestamp cardinality, Level cardinality == 3
    assert logs.select("Timestamp").distinct().count() == 2000


def test_log_level_mix_and_timestamps(logs):
    n = logs.count()
    counts = {r.Level: r.c for r in logs.groupBy("Level").agg(F.count("*").alias("c")).collect()}
    # 60/30/10 split (schema.kql:18) within generous tolerance
    assert abs(counts["Information"] / n - 0.60) < 0.08
    assert abs(counts["Warning"] / n - 0.30) < 0.08
    assert abs(counts["Error"] / n - 0.10) < 0.06
    # one second per row counting back from base_time (schema.kql:19)
    first, last = logs.agg(F.min("Timestamp"), F.max("Timestamp")).collect()[0]
    assert last == BASE
    assert (last - first).total_seconds() == n - 1


def test_log_determinism(spark, logs):
    again = generate_log_data(spark, n_rows=2000, seed=3, base_time=BASE)
    assert logs.exceptAll(again).count() == 0
    assert again.exceptAll(logs).count() == 0
    other = generate_log_data(spark, n_rows=2000, seed=4, base_time=BASE)
    assert other.exceptAll(logs).count() > 0


@pytest.fixture(scope="module")
def orders(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/orders.parquet")


def test_salted_agg_equals_plain(orders):
    plain = orders.groupBy("o_orderpriority").agg(
        F.sum("o_totalprice").alias("s"),
        F.count("o_orderkey").alias("c"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.avg("o_totalprice").alias("av"),
    )
    salted = skew.salted_agg(
        orders,
        ["o_orderpriority"],
        [
            ("o_totalprice", "sum", "s"),
            ("o_orderkey", "count", "c"),
            ("o_totalprice", "min", "mn"),
            ("o_totalprice", "max", "mx"),
            ("o_totalprice", "avg", "av"),
        ],
        salt_buckets=8,
    )
    p = {r.o_orderpriority: r for r in plain.collect()}
    s = {r.o_orderpriority: r for r in salted.collect()}
    assert set(p) == set(s)
    for k in p:
        assert p[k].c == s[k].c and p[k].mn == s[k].mn and p[k].mx == s[k].mx
        assert abs(p[k].s - s[k].s) < 1e-6 * max(abs(p[k].s), 1)
        assert abs(p[k].av - s[k].av) < 1e-9 * max(abs(p[k].av), 1)


def test_salted_join_equals_plain(spark, orders, sf_smoke):
    cust = spark.read.parquet(f"{sf_smoke}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, ["o_custkey"]).select("o_orderkey", "c_name")
    salted = skew.salted_join(orders, cust, ["o_custkey"], salt_buckets=4).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched big-side rows exactly once
    half = cust.filter(F.col("o_custkey") % 2 == 0)
    pl = orders.join(half, ["o_custkey"], "left").count()
    sl = skew.salted_join(orders, half, ["o_custkey"], how="left", salt_buckets=4).count()
    assert pl == sl == orders.count()


def test_salted_join_rejects_right(orders):
    with pytest.raises(ValueError):
        skew.salted_join(orders, orders, ["o_custkey"], how="full")

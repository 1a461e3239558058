"""Bucketed co-located joins: correctness + shuffle-free plan property."""

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators import bucketing


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    customer = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    bucketing.save_bucketed(orders, "orders_b", ["o_custkey"], buckets=8,
                            sort_by=["o_custkey"])
    bucketing.save_bucketed(customer, "customer_b", ["c_custkey"], buckets=8,
                            sort_by=["c_custkey"])
    yield orders, customer
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_is_shuffle_free_and_correct(spark, bucketed_tables):
    orders, customer = bucketed_tables
    # bucketed SMJ needs broadcast auto-off for small inputs, else the
    # planner broadcasts and the property being tested never engages
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(
            spark, "orders_b", "customer_b", "o_custkey", "c_custkey"
        )
        assert bucketing.join_is_shuffle_free(joined), joined._jdf.queryExecution().executedPlan().toString()[:2000]
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    want = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
    assert n == want


def test_unbucketed_join_does_shuffle(spark, sf_smoke):
    """Control: the same join on plain parquet has an Exchange."""
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    customer = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        assert not bucketing.join_is_shuffle_free(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

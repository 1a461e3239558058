"""Bucketed tables: co-located, shuffle-free repeated joins.

The brief's 100 TB playbook ("co-locate joins via bucketing or
pre-partitioning"). A fact table joined on the same key by many queries
pays one hash exchange per query — unless it is stored bucketed on that
key, in which case SortMergeJoin reads both sides pre-partitioned and the
exchange disappears from every subsequent plan. This is storage-level
partitioning (Hive bucketing), complementary to the in-query
`repartition` the pipelines use.

Usage shape::

    save_bucketed(orders, "orders_b", ["o_custkey"], buckets=64)
    save_bucketed(customer, "customer_b", ["c_custkey"], buckets=64)
    joined = bucketed_join(spark, "orders_b", "customer_b",
                           left_on="o_custkey", right_on="c_custkey")
    # joined's plan contains no Exchange on either join side

Bucket counts must match on both sides for the co-location to apply, and
the session must keep ``spark.sql.sources.bucketing.enabled=true``
(default). At 100 TB choose buckets ≈ cluster cores × small multiple so
one bucket ≈ one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-bucketed) table.

    Sorting within buckets additionally removes the per-query Sort from
    SortMergeJoin — the join becomes a pure streamed merge of co-located,
    pre-sorted files.
    """
    writer = df.write.format(fmt).mode("overwrite").bucketBy(buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys.

    With matching bucket counts the planner proves both sides already
    hash-partitioned and plans a SortMergeJoin with NO Exchange — verified
    by ``join_is_shuffle_free`` (tests assert it).
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_on] == right[right_on], how)


def join_is_shuffle_free(df: DataFrame) -> bool:
    """True when the physical plan contains no Exchange (the property
    bucketing exists to deliver). Broadcast exchanges don't count — they
    are not shuffles of the bucketed data."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return not any(
        line.strip().lstrip("+-*( ").startswith("Exchange")
        for line in plan.splitlines()
    )

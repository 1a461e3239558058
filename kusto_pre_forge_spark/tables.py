"""Canonical loader for the driver-provided testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf directory.

``events.ts`` is written as TIMESTAMP(NANOS), which Spark's vectorized
parquet reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` (set
by session.get_session) it surfaces as a long that this loader converts
back to a microsecond timestamp (truncating, matching DuckDB's ns→us cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _driver_proof(spark: SparkSession) -> None:
    """Set the runtime-settable confs every query depends on.

    The driver harness builds its own plain SparkSession, so nothing from
    session.get_session can be assumed. Everything here is runtime-settable
    and idempotent: UTC session timezone (timestamp→string / bin must match
    the DuckDB oracle, which is TZ-naive), and Arrow for the pandas-UDF
    operators (perf only, but 10-100× on those paths).
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _driver_proof(spark)
    if name == "events":
        # events.ts is TIMESTAMP(NANOS); the vectorized reader rejects it
        # unless nanosAsLong is set. The conf is runtime-settable, so set it
        # here rather than relying on the caller's session builder — the
        # driver harness constructs its own SparkSession.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (mirrors the driver's DuckDB setup)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Hypertable-style time-series rollups: multi-resolution downsampling.

The brief's "hypertable rollup" custom-operator example — continuous
aggregates at several time resolutions (the TimescaleDB pattern), done the
Spark way: one ``groupBy(window)`` per resolution, unioned with a
``resolution`` discriminator column. Each resolution is an independent
map-side-combinable aggregation; at 100 TB the coarse resolutions are
nearly free because they reuse the same scan (Spark schedules one pass per
resolution; persist the finest rollup and derive coarser ones from it when
the input is colder than the rollup).

``rollup_from_finer`` implements that second form: re-aggregate an
existing fine rollup into a coarser bucket — the standard continuous-
aggregate refresh, touching only rollup rows, never the raw table. Only
algebraic aggregates survive re-aggregation (sum/count/min/max — avg must
be kept as sum+count); the API takes explicit (col, fn) pairs to keep that
constraint visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import normalize_ts as _normalize_ts

_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def rollup_timeseries(
    df: DataFrame,
    ts_col: str,
    resolutions: list[str],
    aggs: list[tuple[str, str, str]],
    keys: list[str] | None = None,
) -> DataFrame:
    """Aggregate ``df`` at every resolution in one stacked result.

    ``aggs`` = [(column, fn, alias)], fn in sum/count/min/max.
    Returns (resolution, bucket_start, *keys, *aliases).
    """
    src = _normalize_ts(df, ts_col)
    parts = []
    for res in resolutions:
        exprs = [
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(alias)
            for col, fn, alias in aggs
        ]
        parts.append(
            src.groupBy(F.window(ts_col, res).alias("_w"), *(keys or []))
            .agg(*exprs)
            .select(
                F.lit(res).alias("resolution"),
                F.col("_w.start").alias("bucket_start"),
                *(keys or []),
                *[alias for _, _, alias in aggs],
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rollup_from_finer(
    fine: DataFrame,
    coarse_resolution: str,
    aggs: list[tuple[str, str, str]],
    keys: list[str] | None = None,
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Re-aggregate a fine rollup into a coarser one without touching the
    raw table (continuous-aggregate refresh). ``aggs`` fns name how each
    already-aggregated column combines: count → sum, sum → sum, min → min,
    max → max.
    """
    exprs = [_REAGG[fn](col).alias(alias) for col, fn, alias in aggs]
    return (
        fine.groupBy(F.window(bucket_col, coarse_resolution).alias("_w"), *(keys or []))
        .agg(*exprs)
        .select(
            F.lit(coarse_resolution).alias("resolution"),
            F.col("_w.start").alias("bucket_start"),
            *(keys or []),
            *[alias for _, _, alias in aggs],
        )
    )

"""Sessionization: gap-based session segmentation, batch and streaming.

Two equivalent forms, pinned against each other by tests:

- ``sessionize_lag`` — the classic lag + cumulative-sum: a window per key
  marks rows that start a new session (gap > timeout), the running sum of
  the marks is the session ordinal. Batch-only (needs the whole key
  history) but gives per-ROW session ids, which downstream feature
  pipelines want.
- ``session_stats`` — Spark's native ``session_window``: gap-parameterized
  windows the engine merges as rows arrive. Works identically on batch
  and Structured Streaming (with a watermark it is the streaming
  sessionization path — state bounded, sessions finalize when the
  watermark passes their close). Gives per-SESSION aggregates.

Scale: both shuffle once on the key; ``session_window`` streaming state is
per-open-session, evicted on watermark — the applyInPandasWithState
equivalent hand-rolled in ``streaming/windows.py`` is for semantics the
built-in can't express (session_window covers plain gap sessions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..tables import normalize_ts as _norm_ts


def _floor_seconds(col: Column, dtype: str) -> Column:
    """Epoch seconds (floor) for timestamp/NTZ columns; pass-through for
    numeric ts columns.

    Spark 4 forbids NTZ→numeric casts under ANSI, so NTZ goes through a
    session-TZ TIMESTAMP cast first (the session TZ is pinned to UTC, so
    values are unchanged). Floor-seconds subtraction — not
    ``timestamp_diff`` — is deliberate: DuckDB's ``date_diff('second')``
    oracle counts second-boundary crossings, which equals the difference
    of floored epochs, not elapsed whole seconds.
    """
    if dtype == "timestamp_ntz":
        col = col.cast("timestamp")
    if dtype.startswith("timestamp"):
        return col.cast("long")
    return col


def _gap_exceeds(cur: Column, prev: Column, dtype: str, gap_seconds: float) -> Column:
    """gap(cur, prev) > gap_seconds for timestamp OR numeric ts columns."""
    return (
        _floor_seconds(cur, dtype) - _floor_seconds(prev, dtype)
    ) > F.lit(gap_seconds)


def sessionize_lag(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 3600,
    order_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Per-row session ordinal (1-based) per key."""
    src = _norm_ts(df, ts_col)
    w = Window.partitionBy(key_col).orderBy(ts_col, *(order_cols or []))
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | _gap_exceeds(
            F.col(ts_col), prev, dict(src.dtypes)[ts_col], gap_seconds
        ),
        1,
    ).otherwise(0)
    return src.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 3600,
    watermark: str | None = None,
) -> DataFrame:
    """Per-session aggregates via native ``session_window``.

    Returns (key, session_start, session_end, n_events). On a streaming
    DataFrame pass ``watermark`` (e.g. "1 hour") so session state is
    evicted once sessions can no longer grow.
    """
    src = _norm_ts(df, ts_col)
    if watermark and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("_sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("_sw.start").alias("session_start"),
            F.col("_sw.end").alias("session_end"),
            "n_events",
        )
    )

"""Event-time streaming aggregation: watermarked windows and custom state.

The reference needs none of this (SURVEY §2.6 — blobs are independent
units, no event-time state), but a training-data pipeline at scale does:
rate metrics over arriving documents, per-key sessionization of events,
dedup-state across micro-batches. Two building blocks:

- ``windowed_event_counts`` — tumbling/sliding event-time windows with a
  watermark so late rows are merged until the watermark passes, then the
  window state is evicted (bounded state, the only way streaming aggs
  survive unbounded input).
- ``running_totals_with_state`` — ``applyInPandasWithState``: an explicit
  per-key state machine for aggregations Spark's built-ins can't express
  (here: a running total + last-seen timestamp per key, emitted every
  batch; swap the update function for custom semantics).
- ``streaming_scan_steps`` — the multi-step scan machine
  (kql.scan_steps: session labeling, multi-state funnels) over a
  stream, per-key state resumed across micro-batches; the SAME walker
  as the batch tier, so the two can never drift.

Scale: state is partitioned by key across executors; the watermark bounds
how much of it lives; checkpointing makes both exactly-once across
restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import normalize_ts as _norm_ts


def windowed_event_counts(
    events: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Watermarked event-time window counts (works on batch DataFrames too,
    where the watermark is a no-op — tests exploit this to pin values).

    Returns (window.start, window.end, *keys, n).
    """
    # normalize ts (nanos-as-long or TIMESTAMP_NTZ) like tables.load_table
    src = _norm_ts(events, ts_col)
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    src = src.withWatermark(ts_col, watermark) if src.isStreaming else src
    group = [win] + [F.col(k) for k in (keys or [])]
    return (
        src.groupBy(*group)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(keys or []),
            "n",
        )
    )


RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

RUNNING_OUTPUT_SCHEMA = (
    "key string, total bigint, last_ts timestamp, batch_rows bigint"
)


def running_totals_with_state(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str | None = None,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-key running totals that survive across micro-batches.

    Each batch emits one row per key seen in the batch with the
    accumulated total so far — the shape of a streaming ingest counter
    (the reference's PerfCounterJournal, but keyed and exactly-once).
    """

    def update(key, pdfs, state):
        import pandas as pd

        rows = 0
        add = 0
        last = None
        for pdf in pdfs:
            rows += len(pdf)
            add += int(pdf["_v"].sum())
            mx = pdf[ts_col].max()
            last = mx if last is None else max(last, mx)
        if state.exists:
            (total, prev_ts) = state.get
            total += add
            if last is None or (prev_ts is not None and prev_ts > last):
                last = prev_ts
        else:
            total = add
        state.update((total, last))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "total": [total],
                "last_ts": [last],
                "batch_rows": [rows],
            }
        )

    events = _norm_ts(events, ts_col)
    ts = F.col(ts_col)
    src = events.select(
        F.col(key_col).cast("string").alias(key_col),
        ts.alias(ts_col),
        (F.lit(1) if value_col is None else F.col(value_col)).cast("long").alias("_v"),
    )
    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def streaming_dedup(
    docs: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup: drop re-deliveries of the same key across
    micro-batches — the continuous form of ``dedup.exact`` for a corpus
    that arrives as a stream (re-crawled pages, replayed queue messages).

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key only
    until the watermark passes its event time, so state is bounded by the
    dedup horizon — the property that makes this runnable forever at
    ingest scale, unlike an unbounded ``dropDuplicates`` whose state grows
    with every distinct key it has ever seen. Keys are partitioned across
    executors; checkpointing makes the drop decision exactly-once.
    """
    return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def session_window_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Event-time SESSION windows — the streaming form of the batch
    ``sessionize`` operator: rows for one key belong to one session while
    the gap between consecutive events stays under ``gap``; a quiet period
    longer than the gap closes the session and (in streaming mode) the
    watermark finalizes + evicts its state.

    Built on ``F.session_window`` — Spark's native dynamic-gap session
    aggregation — so session merging across micro-batches, late-row
    handling, and state eviction are engine-managed instead of
    hand-rolled ``applyInPandasWithState`` bookkeeping. Works on batch
    DataFrames too (watermark no-op), which is how the unit test pins the
    session boundaries exactly.

    Returns (key, session_start, session_end, n_events, total_value) —
    total_value sums ``value_col`` (default ``"value"``).
    """
    src = _norm_ts(events, ts_col)
    src = src.withWatermark(ts_col, watermark) if src.isStreaming else src
    win = F.session_window(F.col(ts_col), gap)
    return (
        src.groupBy(win, F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


ZSCORE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)

ZSCORE_OUTPUT_SCHEMA = (
    "key string, batch_rows bigint, n bigint, mean double, stdev double, "
    "anomalies bigint, max_abs_z double"
)


def streaming_zscore_anomalies(
    events: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 3.0,
    min_history: int = 30,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming anomaly detection with EXPLICIT state: per-key running
    mean/variance via Welford's online update (numerically stable — the
    naive Σx² form cancels catastrophically on long streams), carried
    across micro-batches in ``applyInPandasWithState``. Each arriving
    value is scored against the state BEFORE it updates it (a point can't
    vouch for itself), and batches emit one summary row per key:
    anomaly count + the worst |z| this batch.

    ``min_history`` gates scoring until the mean/stdev are trustworthy —
    the first points of a key are never flagged. State is three numbers
    per key (bounded forever); checkpointing makes counts exactly-once.
    The batch-mode twin (same function, batch DataFrame) lets tests pin
    the arithmetic without a streaming harness.
    """

    def update(key, pdfs, state):
        import math

        import pandas as pd

        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        rows = 0
        anomalies = 0
        max_abs_z = 0.0
        for pdf in pdfs:
            for v in pdf["_v"]:
                rows += 1
                x = float(v)
                if n >= min_history and m2 > 0:
                    sd = math.sqrt(m2 / (n - 1))
                    if sd > 0:
                        z = abs((x - mean) / sd)
                        max_abs_z = max(max_abs_z, z)
                        if z > threshold:
                            anomalies += 1
                # Welford update AFTER scoring
                n += 1
                d = x - mean
                mean += d / n
                m2 += d * (x - mean)
        state.update((n, mean, m2))
        sd_out = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "batch_rows": [rows],
                "n": [n],
                "mean": [mean],
                "stdev": [sd_out],
                "anomalies": [anomalies],
                "max_abs_z": [max_abs_z],
            }
        )

    src = events.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull())
    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    max_delay: str = "interval 5 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — the canonical streaming
    attribution shape (impression ⋈ click within N minutes): equi-join on
    ``key_col`` plus the event-time band
    ``left_ts <= right_ts <= left_ts + max_delay``.

    Both inputs get event-time watermarks, which is what BOUNDS the join
    state: Spark buffers each side only until the other side's watermark
    passes the band, then evicts — without the watermark + time-range
    condition a stream-stream join's state grows forever (the reason
    this wrapper makes both mandatory rather than optional). Works
    identically on batch frames (tests pin stream == batch equality).
    Outer joins emit the unmatched side only after watermark expiry, so
    ``join_type='leftOuter'`` results are complete only once the
    watermark passes — the standard Structured Streaming contract.

    Scale: state is per-key and band-bounded; the shuffle keys are
    (key, time-bucket) — the same skew rules as any keyed stream apply
    (salt hot keys upstream).
    """
    lt, rt = f"_l_{left_ts}", f"_r_{right_ts}"
    lf = left.withWatermark(left_ts, watermark).withColumnRenamed(left_ts, lt)
    rf = right.withWatermark(right_ts, watermark).withColumnRenamed(right_ts, rt)
    lk, rk = f"_l_{key_col}", f"_r_{key_col}"
    lf = lf.withColumnRenamed(key_col, lk)
    rf = rf.withColumnRenamed(key_col, rk)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(max_delay))
    )
    return (
        lf.join(rf, cond, join_type)
        .withColumnRenamed(lk, key_col)
        .withColumnRenamed(lt, left_ts)
        .withColumnRenamed(rt, f"{right_ts}_right")
        .drop(rk)
    )


HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("ests", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
    ]
)

HH_OUTPUT_SCHEMA = "bucket long, item string, est long, err long, bucket_rows long"


def streaming_heavy_hitters(
    events: DataFrame,
    item_col: str,
    k: int = 16,
    n_buckets: int = 8,
    salt: str = "kpf-hh",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming SpaceSaving heavy hitters — the stateful twin of
    :func:`~kusto_pre_forge_spark.operators.kql.heavy_hitters_sketch`.
    Items hash (md5, same fold as the batch twin) into ``n_buckets``
    groups; each group's ≤``k`` ``(item, est, err)`` counters persist
    across micro-batches in ``applyInPandasWithState``, so the sketch
    covers the WHOLE stream, not just the current batch. Every batch each
    bucket re-emits its full counter table plus the lifetime row count —
    downstream consumers read the latest emission per bucket.

    State is ``n_buckets × k`` counters forever (bounded regardless of
    stream length or item cardinality); SpaceSaving's guarantees hold
    over the lifetime stream: every item with true count > N/k per bucket
    is present, ``true ≤ est ≤ true + N/k``. Within a batch, rows are
    applied in arrival order (the streaming contract); the batch twin
    sorts instead — both orders satisfy the guarantees, tests pin each
    separately.
    """
    if k < 1 or n_buckets < 2:
        raise ValueError("k >= 1 and n_buckets >= 2 required")
    src = events.select(
        F.col(item_col).cast("string").alias("item"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit(salt), F.col(item_col).cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(int(n_buckets)),
        ).alias("bucket"),
    )

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            items, ests, errs, n = state.get
            counters = {
                it: [int(e), int(r)] for it, e, r in zip(items, ests, errs)
            }
            n = int(n)
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            for item in pdf["item"]:
                n += 1
                if item in counters:
                    counters[item][0] += 1
                elif len(counters) < k:
                    counters[item] = [1, 0]
                else:
                    evict = max(
                        counters, key=lambda it: (-counters[it][0], it)
                    )
                    m = counters.pop(evict)[0]
                    counters[item] = [m + 1, m]
        out_items = sorted(counters)
        state.update(
            (
                out_items,
                [counters[i][0] for i in out_items],
                [counters[i][1] for i in out_items],
                n,
            )
        )
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(out_items),
                "item": out_items,
                "est": [counters[i][0] for i in out_items],
                "err": [counters[i][1] for i in out_items],
                "bucket_rows": [n] * len(out_items),
            }
        )

    return src.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def streaming_source_quota(
    events: DataFrame,
    source_col: str,
    quota: int,
    order_col: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-source admission quota across the stream's LIFETIME: each
    source admits at most ``quota`` rows, first-come within a batch by
    ascending ``order_col`` (deterministic — never partition arrival
    order), with the admitted count carried across micro-batches as
    explicit state. The cross-batch form of the corpus budget valves
    (``budget_sample`` caps per-mix tokens statically; this caps a LIVE
    feed) — the standard guard against one crawl host flooding an ingest.

    Emits only the admitted rows: (source, order_value, admitted_total)
    where admitted_total is the source's running count AFTER this batch.
    State is one long per source, bounded forever. Works on batch frames
    (one batch = the whole input), which is how tests pin the arithmetic.
    """
    if quota < 1:
        raise ValueError("quota must be >= 1")
    src = events.select(
        F.col(source_col).cast("string").alias("source"),
        F.col(order_col).cast("long").alias("order_value"),
    )

    def update(key, pdfs, state):
        import pandas as pd

        admitted = state.get[0] if state.exists else 0
        rows = []
        # One sorted pass over the WHOLE micro-batch for this key: the
        # pdfs iterator yields Arrow chunks (~10k rows each), and a
        # per-chunk sort would make admission near the quota cut depend
        # on nondeterministic chunk boundaries. Chunk count per key per
        # batch is bounded (batch rows / chunk size), so the concat is
        # the same memory applyInPandasWithState already budgets for.
        chunks = [pdf["order_value"] for pdf in pdfs]
        batch = pd.concat(chunks) if chunks else pd.Series([], dtype="int64")
        for v in sorted(batch):
            if admitted >= quota:
                break
            admitted += 1
            rows.append(int(v))
        state.update((admitted,))
        yield pd.DataFrame(
            {
                "source": [key[0]] * len(rows),
                "order_value": rows,
                "admitted_total": [admitted] * len(rows),
            }
        )

    return src.groupBy("source").applyInPandasWithState(
        update,
        outputStructType="source string, order_value long, admitted_total long",
        stateStructType=T.StructType([T.StructField("admitted", T.LongType())]),
        outputMode="update",
        timeoutConf=timeout,
    )


def streaming_domain_drift(
    docs: DataFrame,
    source_col: str,
    text_col: str,
    n_buckets: int = 256,
    smoothing: float = 0.5,
    salt: str = "kpf-jsd",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-source distribution-DRIFT monitor — the streaming twin of
    ``corpus.domain_shift_jsd``: each micro-batch's hashed-unigram
    distribution is compared (Jensen-Shannon divergence, natural log,
    Laplace-smoothed over the same ``n_buckets`` feature space) against
    the source's LIFETIME distribution accumulated so far, then folded
    into it. A crawl source that suddenly starts emitting something
    different (template change, language flip, spam flood) raises its
    JSD the trigger it happens — the alarm a live ingest wants BEFORE
    the mixture drifts.

    State per source is one B-long histogram + a total — bounded forever
    (the SpaceSaving principle applied to distributions). Buckets use the
    same md5 fold as the batch operator, so a batch row replayed through
    ``domain_shift_jsd`` lands in the identical feature. Emits one row
    per (source, batch): (source, batch_tokens, lifetime_tokens, jsd);
    the FIRST batch of a source has no history — jsd is NULL by
    contract, never 0 (0 means "matches history exactly").

    Tokenization matches the batch twin EXACTLY: NULL text contributes
    zero tokens (``domain_shift_jsd``'s split-of-NULL explodes to
    nothing — it must not become the literal token ``'none'`` here), and
    the splitter is Java's ASCII ``\\s`` class ``[ \\t\\n\\x0b\\f\\r]``
    — Python's ``str.split()`` also breaks on unicode whitespace
    (e.g. NBSP \\xa0), which would make the streaming statistic drift
    from the batch one on identical data.
    """
    import hashlib
    import re

    B, sm = int(n_buckets), float(smoothing)
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def bucket_of(w: str) -> int:
        h = hashlib.md5(f"{salt}|{w}".encode()).hexdigest()[:8]
        return int(h, 16) % B

    src = docs.select(
        F.col(source_col).cast("string").alias("source"),
        F.col(text_col).cast("string").alias("_text"),
    )

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd

        batch = np.zeros(B, dtype="int64")
        for pdf in pdfs:
            for text in pdf["_text"]:
                if text is None or pd.isna(text):
                    continue
                for w in java_ws.split(str(text).lower()):
                    if w:
                        batch[bucket_of(w)] += 1
        if state.exists:
            (hist_list, total) = state.get
            hist = np.asarray(hist_list, dtype="int64")
            total = int(total)
        else:
            hist, total = np.zeros(B, dtype="int64"), 0
        bt = int(batch.sum())
        if total > 0 and bt > 0:
            p = (batch + sm) / (bt + sm * B)          # batch distribution
            q = (hist + sm) / (total + sm * B)        # lifetime-so-far
            m = (p + q) / 2.0
            jsd = round(
                float(0.5 * np.sum(p * np.log(p / m))
                      + 0.5 * np.sum(q * np.log(q / m))),
                6,
            )
        else:
            jsd = None
        hist += batch
        state.update(([int(x) for x in hist], total + bt))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "batch_tokens": [bt],
                "lifetime_tokens": [total + bt],
                "jsd": [jsd],
            }
        )

    return src.groupBy("source").applyInPandasWithState(
        update,
        outputStructType=(
            "source string, batch_tokens long, lifetime_tokens long, "
            "jsd double"
        ),
        stateStructType=T.StructType(
            [
                T.StructField("hist", T.ArrayType(T.LongType())),
                T.StructField("total", T.LongType()),
            ]
        ),
        outputMode="update",
        timeoutConf=timeout,
    )


# ------------------------------------------------- streaming scan


def _scan_state_encode(states: list, mids: list, next_mid: int) -> str:
    """JSON-serialize the per-key scan machine state (one instance per
    step). Timestamps wrap as {"$ts": iso}; everything else the
    declared scalar types cover is JSON-native (json round-trips NaN)."""
    import json

    def enc(v):
        if v is None or isinstance(v, (int, float, str, bool)):
            return v
        if hasattr(v, "isoformat"):
            return {"$ts": v.isoformat()}
        raise TypeError(f"scan state cannot serialize {type(v).__name__}")

    return json.dumps(
        {
            "states": [
                None if s is None else {k: enc(v) for k, v in s.items()}
                for s in states
            ],
            "mids": mids,
            "next_mid": next_mid,
        }
    )


def _scan_state_decode(blob: str, n_steps: int):
    import json

    import pandas as pd

    def dec(v):
        if isinstance(v, dict) and "$ts" in v:
            return pd.Timestamp(v["$ts"])
        return v

    if not blob:
        return [None] * n_steps, [None] * n_steps, 0
    saved = json.loads(blob)
    states = [
        None if s is None else {k: dec(v) for k, v in s.items()}
        for s in saved["states"]
    ]
    return states, saved["mids"], saved["next_mid"]


def streaming_scan_steps(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    steps,
    declare: dict,
    match_name: str = "match_id",
    step_name: str = "step",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """The multi-step scan state machine (``kql.scan_steps`` — same
    ``steps``/``declare`` shapes, SAME walker, zero semantic drift)
    over a STREAM: per-key session labeling / multi-state funnels on
    live data, state carried across micro-batches via
    ``applyInPandasWithState``.

    Within each micro-batch a key's rows walk in ``ts_col`` order;
    across batches the machine resumes from its persisted state
    (per-step instances + match-id counter, JSON in the state store —
    bounded: n_steps instances × declared vars per key). Rows are
    emitted only when CAPTURED (Kusto's rule), one output row per
    captured event with the post-update state variables.

    Arrival-order contract (the ingest family's replay posture): a row
    arriving in a later batch than a newer-ts row processes late — the
    stream analogue of Kusto's serialize order is per-batch; replays
    through checkpoints are exactly-once. Scale: state partitions by
    key across executors like every stateful op here.
    """
    var_names = list(declare)
    defaults = {v: declare[v][0] for v in var_names}
    n = len(steps)
    out_schema = ", ".join(
        [f"`{key_col}` string", f"`{ts_col}` timestamp"]
        + [f"`{v}` {declare[v][1]}" for v in var_names]
        + [f"`{match_name}` bigint", f"`{step_name}` string"]
    )

    def update(key, pdfs, state):
        import pandas as pd

        from kusto_pre_forge_spark.operators.kql import scan_steps_walk

        if state.exists:
            states, mids, next_mid = _scan_state_decode(state.get[0], n)
        else:
            states, mids, next_mid = [None] * n, [None] * n, 0
        batches = [pdf for pdf in pdfs if len(pdf)]
        out_rows: list[dict] = []

        def emit(rec, newst, mid, name_k):
            out_rows.append(
                {
                    key_col: str(key[0]),
                    ts_col: rec[ts_col],
                    **{v: newst.get(v) for v in var_names},
                    match_name: mid,
                    step_name: name_k,
                }
            )

        if batches:
            batch = pd.concat(batches).sort_values(ts_col, kind="mergesort")
            next_mid = scan_steps_walk(
                batch.to_dict("records"), steps, defaults, states, mids,
                next_mid, emit,
            )
        state.update((_scan_state_encode(states, mids, next_mid),))
        yield pd.DataFrame(
            out_rows,
            columns=[key_col, ts_col, *var_names, match_name, step_name],
        )

    src = _norm_ts(events, ts_col)
    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="state_json string",
        outputMode="update",
        timeoutConf=timeout,
    )

"""KQL activity-metrics plugin family: cohort retention and rolling
engagement (``new_activity_metrics`` / ``activity_engagement`` analogues).

Reference scope note: the reference delegates all analytics to Kusto
(SURVEY §2.5); these are the activity plugins a Kusto user would reach for
next, re-expressed as distributed aggregations.

Scale posture — both operators reduce the event stream to DISTINCT
(actor, bucket) pairs first (one map-side-combinable aggregation; the
stream's volume collapses to |actors| × |buckets| before anything wide
happens):

- ``cohort_retention``   — first-seen bucket per actor (one aggregation),
  joined back to activity pairs (hash join on actor), counted per
  (cohort, offset). Nothing is ever quadratic; the join key is the actor.
- ``rolling_engagement`` — the DAU/MAU trick: each (actor, day) pair
  CONTRIBUTES to the outer windows of the following ``outer-1`` days, so
  the rolling distinct count becomes explode(sequence) + distinct + count
  — the shape that scales linearly with activity, never rescanning a
  window per day.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    bucket: str = "week",
) -> DataFrame:
    """KQL ``new_activity_metrics``-style cohort retention.

    Buckets time by ``bucket`` — one of ``hour``, ``day``, ``week``
    (fixed-length, offset by elapsed seconds) or ``month`` (calendar
    months via ``months_between``, since months have no fixed length) —
    assigns every actor to the cohort of its FIRST active bucket, and
    counts distinct actors per (cohort_bucket, offset) where offset is
    whole buckets since the cohort started. Offset 0 is the cohort size;
    retention@k = n_active(k) / n_active(0) — emitted as a ratio column.

    Returns (cohort, offset, n_active, retention).
    """
    seconds_per = {"week": 7 * 86400, "day": 86400, "hour": 3600}
    if bucket not in seconds_per and bucket != "month":
        raise ValueError(
            f"bucket must be one of {sorted(seconds_per) + ['month']}, "
            f"got {bucket!r}"
        )
    b = F.date_trunc(bucket, F.col(ts_col))
    pairs = df.select(F.col(actor_col).alias("_a"), b.alias("_b")).distinct()
    firsts = pairs.groupBy("_a").agg(F.min("_b").alias("_cohort"))
    if bucket == "month":
        offset = F.months_between(F.col("_b"), F.col("_cohort")).cast("long")
    else:
        offset = (
            (F.unix_timestamp("_b") - F.unix_timestamp("_cohort"))
            / seconds_per[bucket]
        ).cast("long")
    joined = pairs.join(firsts, "_a").withColumn("_offset", offset)
    counts = joined.groupBy(F.col("_cohort").alias("cohort"), F.col("_offset").alias("offset")).agg(
        F.count_distinct("_a").alias("n_active")
    )
    sizes = counts.filter(F.col("offset") == 0).select(
        "cohort", F.col("n_active").alias("_size")
    )
    return (
        counts.join(sizes, "cohort")
        .withColumn(
            "retention", F.col("n_active").cast("double") / F.col("_size")
        )
        .drop("_size")
    )


def rolling_engagement(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    inner_days: int = 1,
    outer_days: int = 7,
) -> DataFrame:
    """KQL ``activity_engagement`` — rolling distinct-actor ratio
    (DAU/WAU for the defaults; 1/28 or 1/30 for DAU/MAU).

    For each activity day d: inner = distinct actors in
    [d-inner_days+1, d], outer = same over ``outer_days``. Implemented by
    exploding each (actor, day) pair into the days whose trailing window
    it belongs to (sequence + explode), then one distinct-count per day —
    no per-day rescans, no quadratic window joins.

    Returns (day, inner_active, outer_active, engagement_ratio), days
    restricted to those with outer activity (matching KQL, which emits
    rows only for days inside the observed range).
    """
    day = F.to_date(F.col(ts_col))  # DATE so sequence/date_add stay date-typed
    pairs = df.select(F.col(actor_col).alias("_a"), day.alias("_d")).distinct()

    def window_counts(days: int, out_name: str) -> DataFrame:
        contrib = pairs.select(
            "_a",
            F.explode(
                F.sequence(
                    F.col("_d"),
                    F.date_add(F.col("_d"), days - 1),
                )
            ).alias("_day"),
        ).distinct()
        return contrib.groupBy("_day").agg(F.count_distinct("_a").alias(out_name))

    inner = window_counts(inner_days, "inner_active")
    outer = window_counts(outer_days, "outer_active")
    # keep only days with real activity in range (the sequence also emits
    # tail days past the last activity; KQL clips to the observed axis)
    observed = pairs.select(F.col("_d").alias("_day")).distinct()
    return (
        observed.join(inner, "_day", "left")
        .join(outer, "_day", "left")
        .select(
            F.col("_day").alias("day"),
            F.coalesce("inner_active", F.lit(0)).alias("inner_active"),
            F.coalesce("outer_active", F.lit(0)).alias("outer_active"),
            (
                F.coalesce("inner_active", F.lit(0)).cast("double")
                / F.coalesce("outer_active", F.lit(1)).cast("double")
            ).alias("engagement_ratio"),
        )
    )


def funnel_steps(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    state_col: str,
    steps: list[str],
) -> DataFrame:
    """KQL ``funnel_sequence_completion``-style ordered funnel: how many
    actors reached step k, where step k must occur STRICTLY AFTER the
    actor's completion of step k-1 (first qualifying occurrence each).

    Fully relational — one aggregation per step plus a hash join on the
    actor id (steps lists are short; each join's right side is one row per
    surviving actor, shrinking monotonically). No per-actor arrays, no
    state machines: at 100 TB the event stream is only ever filtered by
    step value and joined on its partition-friendly actor key.

    Returns (step_index, step_value, n_actors), step_index 0-based.
    """
    reached = (
        df.filter(F.col(state_col) == steps[0])
        .groupBy(F.col(actor_col).alias("_a"))
        .agg(F.min(ts_col).alias("_t"))
    )
    counts = reached.select(
        F.lit(0).alias("step_index"), F.lit(steps[0]).alias("step_value"), F.col("_a")
    )
    for i, s in enumerate(steps[1:], 1):
        nxt = df.filter(F.col(state_col) == s).select(
            F.col(actor_col).alias("_a"), F.col(ts_col).alias("_ts")
        )
        reached = (
            nxt.join(reached, "_a")
            .filter(F.col("_ts") > F.col("_t"))
            .groupBy("_a")
            .agg(F.min("_ts").alias("_t"))
        )
        counts = counts.unionByName(
            reached.select(
                F.lit(i).alias("step_index"),
                F.lit(s).alias("step_value"),
                F.col("_a"),
            )
        )
    return counts.groupBy("step_index", "step_value").agg(
        F.count(F.lit(1)).alias("n_actors")
    )


def sequence_transitions(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    state_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """State-transition (Markov) counts over each actor's ordered event
    sequence: (from_state, to_state, n) for every consecutive pair. One
    lag window per actor (single shuffle on the actor key) + one
    map-side-combinable aggregation.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(actor_col).orderBy(ts_col, *(order_cols or []))
    prev = F.lag(F.col(state_col)).over(w)
    return (
        df.withColumn("_prev", prev)
        .filter(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sequence_detect(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    state_col: str,
    steps: list[str],
    max_step_seconds: int,
    max_span_seconds: int | None = None,
) -> DataFrame:
    """KQL ``evaluate sequence_detect()`` — time-constrained ordered event
    sequences per actor. Deterministic greedy first-match semantics: step 1
    anchors at the actor's EARLIEST matching event; each later step at the
    earliest matching event strictly after the previous step and within
    ``max_step_seconds`` of it; the whole sequence must fit in
    ``max_span_seconds`` (when given). One row per actor that completes
    the sequence, with every step's timestamp and the span.

    Same relational shape as ``funnel_steps`` (one filtered aggregate per
    step + a hash join on the actor key, right side one row per surviving
    actor, shrinking monotonically) — no per-actor event arrays, no state
    machine, so the event stream is only ever filtered and joined on its
    partition-friendly key. Time arithmetic stays in integer microseconds
    (``unix_micros``) so an external SQL engine replays it bit-exactly.
    """
    if len(steps) < 2:
        raise ValueError("sequence_detect needs at least two steps")
    cur = (
        df.filter(F.col(state_col) == steps[0])
        .groupBy(F.col(actor_col).alias("_a"))
        .agg(F.min(ts_col).alias("_t1"))
    )
    carried = ["_t1"]
    for i, s in enumerate(steps[1:], 2):
        nxt = df.filter(F.col(state_col) == s).select(
            F.col(actor_col).alias("_a"), F.col(ts_col).alias("_ts")
        )
        prev_t = F.col(f"_t{i - 1}")
        cur = (
            nxt.join(cur, "_a")
            .filter(
                (F.col("_ts") > prev_t)
                & (
                    F.unix_micros("_ts") - F.unix_micros(prev_t)
                    <= max_step_seconds * 1_000_000
                )
            )
            .groupBy("_a", *carried)
            .agg(F.min("_ts").alias(f"_t{i}"))
        )
        carried.append(f"_t{i}")
    span_us = F.unix_micros(F.col(f"_t{len(steps)}")) - F.unix_micros(F.col("_t1"))
    if max_span_seconds is not None:
        cur = cur.filter(span_us <= max_span_seconds * 1_000_000)
    return cur.select(
        F.col("_a").alias(actor_col),
        *[F.col(f"_t{i}").alias(f"step{i}_ts") for i in range(1, len(steps) + 1)],
        (span_us / 1_000_000.0).alias("span_s"),
    )


def sliding_window_counts(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    lookback_days: int = 7,
) -> DataFrame:
    """KQL ``evaluate sliding_window_counts(Id, Timeline, …, LookbackWindow,
    Bin)`` — for every day on the dense observed axis, the event count and
    distinct-actor count over the trailing ``lookback_days`` window
    (e.g. rolling weekly active users + event volume).

    Same scale shape as ``rolling_engagement``: each event contributes to
    the ``lookback_days`` bins whose trailing window contains it (sequence
    + explode — the blowup factor is the window/bin ratio, a constant),
    then ONE map-side-combinable aggregate per bin; never a per-bin rescan
    and never a quadratic bin×event join (that shape is fine for the
    sf0.01 oracle, fatal at 100 TB). The dense axis comes from a 1-row
    min/max aggregate exploded into days — bins with no activity in range
    still appear with zero counts, matching KQL's dense timeline.
    """
    day = F.to_date(F.col(ts_col))
    ev = df.select(F.col(actor_col).alias("_a"), day.alias("_d"))
    bounds = ev.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    axis = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("day"))
    contrib = ev.select(
        "_a",
        F.explode(
            F.sequence(F.col("_d"), F.date_add(F.col("_d"), lookback_days - 1))
        ).alias("day"),
    )
    agg = contrib.groupBy("day").agg(
        F.count(F.lit(1)).alias("count_events"),
        F.count_distinct("_a").alias("dcount_actors"),
    )
    return axis.join(agg, "day", "left").select(
        "day",
        F.coalesce("count_events", F.lit(0)).cast("long").alias("count_events"),
        F.coalesce("dcount_actors", F.lit(0)).cast("long").alias("dcount_actors"),
    )


def rolling_percentile(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    percentile: float = 50.0,
    window_days: int = 7,
) -> DataFrame:
    """KQL ``evaluate rolling_percentile(Value, Pct, Timeline, Bin, N)`` —
    for every day on the dense observed axis, the EXACT interpolated
    percentile of all values in the trailing ``window_days`` window.

    Same contribute-to-trailing-bins explode as ``sliding_window_counts``
    (constant window/bin blowup), one exact ``percentile`` aggregate per
    bin — KQL computes this approximately (T-digest); exact is affordable
    here because the shuffle carries (bin, value) pairs, and matches the
    engine's exact ``percentiles()`` contract."""
    day = F.to_date(F.col(ts_col))
    ev = df.select(F.col(value_col).alias("_v"), day.alias("_d")).where(
        F.col("_v").isNotNull()
    )
    bounds = ev.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    axis = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("day"))
    contrib = ev.select(
        "_v",
        F.explode(
            F.sequence(F.col("_d"), F.date_add(F.col("_d"), window_days - 1))
        ).alias("day"),
    )
    agg = contrib.groupBy("day").agg(
        F.percentile(F.col("_v"), F.lit(percentile / 100.0)).alias("_p")
    )
    return axis.join(agg, "day", "left").select(
        "day", F.col("_p").alias(f"p{int(percentile)}")
    )


def active_users_count(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    lookback_days: int = 7,
    min_active_days: int = 2,
) -> DataFrame:
    """KQL ``evaluate active_users_count(Id, Timeline, …, LookbackWindow,
    Period, ActivePeriodsCount)`` — per day, how many users were active on
    at least ``min_active_days`` DISTINCT days of the trailing window (the
    robust engaged-actives metric that one-hit users can't inflate).

    Distinct (actor, day) pairs first, contribute-to-trailing-bins
    explode, then per (bin, actor) period counts → threshold → one count
    per bin. All aggregates map-side combinable; blowup = the constant
    window/bin ratio."""
    day = F.to_date(F.col(ts_col))
    pairs = df.select(F.col(actor_col).alias("_a"), day.alias("_d")).distinct()
    bounds = pairs.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    axis = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("day"))
    contrib = pairs.select(
        "_a",
        F.explode(
            F.sequence(F.col("_d"), F.date_add(F.col("_d"), lookback_days - 1))
        ).alias("day"),
    )
    per_actor = contrib.groupBy("day", "_a").agg(
        F.count(F.lit(1)).alias("_days")
    )
    agg = (
        per_actor.filter(F.col("_days") >= min_active_days)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    return axis.join(agg, "day", "left").select(
        "day", F.coalesce("active_users", F.lit(0)).cast("long").alias("active_users")
    )


def funnel_sequence(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    state_col: str,
    mid_state: str,
) -> DataFrame:
    """KQL ``evaluate funnel_sequence(Id, Timeline, State, …, MidState)``
    — for every occurrence of ``mid_state`` in an actor's time-ordered
    event sequence, count the (previous state, next state) pairs. One
    lag+lead window per actor key (a single hash exchange), then a
    map-side-combined count; boundary occurrences carry NULL prev/next,
    as KQL renders sequence edges."""
    w = Window.partitionBy("_a").orderBy(F.col("_ts"), F.col("_s"))
    t = (
        df.select(
            F.col(actor_col).alias("_a"),
            F.col(ts_col).alias("_ts"),
            F.col(state_col).alias("_s"),
        )
        .withColumn("_prev", F.lag("_s").over(w))
        .withColumn("_next", F.lead("_s").over(w))
    )
    return (
        t.filter(F.col("_s") == mid_state)
        .groupBy(F.col("_prev").alias("prev_state"), F.col("_next").alias("next_state"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def activity_counts_metrics(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    bin: str = "day",
) -> DataFrame:
    """KQL ``evaluate activity_counts_metrics(actor, ts)`` — per time
    bin: event ``count``, distinct-actor ``dcount``, ``new_dcount``
    (actors whose FIRST appearance is this bin) and ``aggregated_dcount``
    (distinct actors seen up to and including this bin).

    The cumulative distinct needs no quadratic re-scan: distinct-so-far
    is exactly the running sum of per-bin new actors, so the plan is two
    actor-keyed aggregates (per-bin counts, per-actor first-seen) plus a
    prefix sum OVER THE BIN AXIS. The new-actor counts are densified
    (union with zero rows for every active bin, re-aggregated) BEFORE
    the window, so the single-partition prefix-sum exchange consumes a
    bins-sized aggregate directly — the exact shape the plan guard
    admits — and the final per-bin join is broadcast.
    """
    b = F.date_trunc(bin, F.col(ts_col).cast("timestamp"))
    base = df.select(b.alias("bin"), F.col(actor_col).alias("actor"))
    per_bin = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("count_"),
        F.countDistinct("actor").alias("dcount"),
    )
    first_seen = base.groupBy("actor").agg(F.min("bin").alias("bin"))
    new_per_bin = first_seen.groupBy("bin").agg(
        F.count(F.lit(1)).alias("new_dcount")
    )
    dense_new = (
        per_bin.select("bin", F.lit(0).cast("long").alias("new_dcount"))
        .unionByName(new_per_bin)
        .groupBy("bin")
        .agg(F.sum("new_dcount").alias("new_dcount"))
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dense_new.withColumn(
        "aggregated_dcount", F.sum("new_dcount").over(w)
    )
    return per_bin.join(F.broadcast(cum), "bin").select(
        "bin", "count_", "dcount", "new_dcount", "aggregated_dcount"
    )


def new_activity_metrics(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    bin: str = "day",
) -> DataFrame:
    """KQL ``evaluate new_activity_metrics(actor, ts)`` (consecutive-
    period form): per time bin — ``dcount`` (active actors),
    ``new_dcount`` (first ever seen this bin), ``retained_dcount``
    (active this bin AND the immediately previous bin), ``churn_dcount``
    (active previous bin but not this one), plus ``retention_rate`` /
    ``churn_rate`` over the previous bin's actives.

    Everything reduces to DISTINCT (actor, bin) pairs first (the
    activity-family contract — events collapse before any join), then:
    retained = pairs self-joined one bin apart on the actor key (hash
    join, actor-partitioned); churn = previous actives − retained (no
    anti-join needed); new = per-actor min-bin aggregate. No windows, no
    single-partition funnels.
    """
    if bin not in ("day", "hour", "week"):
        raise ValueError("bin must be 'day', 'hour' or 'week'")
    step = {"day": "INTERVAL 1 DAY", "hour": "INTERVAL 1 HOUR",
            "week": "INTERVAL 7 DAY"}[bin]
    b = F.date_trunc(bin, F.col(ts_col).cast("timestamp"))
    pairs = (
        df.select(b.alias("bin"), F.col(actor_col).alias("actor"))
        .distinct()
    )
    per_bin = pairs.groupBy("bin").agg(F.count(F.lit(1)).alias("dcount"))
    new_per_bin = (
        pairs.groupBy("actor")
        .agg(F.min("bin").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("new_dcount"))
    )
    nxt = pairs.select(
        F.expr(f"bin + {step}").alias("bin"), F.col("actor")
    )
    retained = (
        pairs.join(nxt, ["bin", "actor"])
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("retained_dcount"))
    )
    prev_dcount = per_bin.select(
        F.expr(f"bin + {step}").alias("bin"),
        F.col("dcount").alias("prev_dcount"),
    )
    out = (
        per_bin.join(new_per_bin, "bin", "left")
        .join(retained, "bin", "left")
        .join(prev_dcount, "bin", "left")
        .select(
            "bin",
            "dcount",
            F.coalesce("new_dcount", F.lit(0)).alias("new_dcount"),
            F.coalesce("retained_dcount", F.lit(0)).alias("retained_dcount"),
            (
                F.coalesce("prev_dcount", F.lit(0))
                - F.coalesce("retained_dcount", F.lit(0))
            ).alias("churn_dcount"),
            (
                F.coalesce("retained_dcount", F.lit(0))
                / F.col("prev_dcount").cast("double")
            ).alias("retention_rate"),
            (
                (
                    F.coalesce("prev_dcount", F.lit(0))
                    - F.coalesce("retained_dcount", F.lit(0))
                )
                / F.col("prev_dcount").cast("double")
            ).alias("churn_rate"),
        )
    )
    return out


def session_count(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    bin: str = "day",
    lookback_seconds: float = 1800.0,
) -> DataFrame:
    """KQL ``evaluate session_count(actor, ts)`` — sessions STARTED per
    time bin, where a session starts at an actor's first event or after
    more than ``lookback_seconds`` of inactivity.

    One lag window per actor key (a single hash exchange on the actor —
    the sessionize shape), then a map-side-combinable per-bin count of
    the start events. Returns (bin, n_sessions).
    """
    ts = F.col(ts_col).cast("timestamp")
    starts = (
        df.select(F.col(actor_col), ts.alias("_ts"))
        .withColumn("_prev", F.lag("_ts").over(
            Window.partitionBy(actor_col).orderBy("_ts")
        ))
        .filter(
            F.col("_prev").isNull()
            | (
                F.col("_ts").cast("double") - F.col("_prev").cast("double")
                > F.lit(float(lookback_seconds))
            )
        )
    )
    return (
        starts.groupBy(F.date_trunc(bin, F.col("_ts")).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )

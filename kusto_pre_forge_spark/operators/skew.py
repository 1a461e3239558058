"""Skew mitigation: salted aggregation and salted joins.

SURVEY §7 Phase-7 hardening. At 100 TB a handful of hot keys (a boilerplate
document in dedup, a hot partition id in PrePartition, a mega-customer in a
join) can put one shuffle partition orders of magnitude above the rest.
Spark's own mitigations come first — map-side partial aggregation makes
most `groupBy` skew harmless, and AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on in our session factory) handles
sort-merge joins. These helpers cover the remaining case: a shuffled join
whose small side is too big to broadcast while the big side's key
distribution is pathological, and algebraic aggregations whose *combine*
state itself is heavy (e.g. large collect-style maps).

Both transforms are semantics-preserving; tests pin equality against the
unsalted plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (partial expr builder, final expr builder).
#: Two-phase algebra: phase 1 groups by (keys, salt) and computes the
#: partial; phase 2 groups by keys and combines.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key: `groupBy(keys + salt)`
    partials (spreads one hot key over ``salt_buckets`` reducers), then
    `groupBy(keys)` combine (tiny — one row per (key, salt)).

    ``aggs`` = [(column, fn, alias)] with fn in sum/count/min/max/avg.
    avg decomposes into sum+count internally (the salted mean of means
    would be wrong under uneven bucket sizes).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    salted = df.withColumn("_salt", salt)

    partials, finals = [], []
    for col, fn, alias in aggs:
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"_p_{alias}_s"),
                F.count(col).alias(f"_p_{alias}_c"),
            ]
            finals.append(
                (F.sum(f"_p_{alias}_s") / F.sum(f"_p_{alias}_c")).alias(alias)
            )
        else:
            part, comb = _ALGEBRAIC[fn]
            partials.append(part(col).alias(f"_p_{alias}"))
            finals.append(comb(f"_p_{alias}").alias(alias))

    phase1 = salted.groupBy(*keys, "_salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where the big side's keys are skewed and the small side
    can't broadcast: salt the big side's rows into ``salt_buckets``
    groups, replicate the small side once per bucket (explode of a
    ``sequence`` — executor-side, no driver loop), and join on
    (keys, salt). A hot key's rows now land on ``salt_buckets`` reducers
    instead of one; the price is a ``salt_buckets``× replication of the
    small side's shuffle, which is the explicit trade.

    Supports inner/left joins (the salted small side would multiply
    unmatched right rows under right/full).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, on + ["_salt"], how).drop("_salt")

"""Synthetic log-data generator — the reference's `GenerateLogData()` KQL
function (deployment/infra/schema.kql:1-23) re-expressed Spark-first.

Semantics ported, mechanism changed: the KQL function draws `rand()` per
letter via `mv-apply`; Spark forbids nondeterministic expressions inside
higher-order-function lambdas, so randomness here is a seeded counter-based
PRNG — `xxhash64(seed, id, lane)` — which is (a) legal inside `transform`,
(b) fully deterministic given `seed` (tests can pin outputs), and (c) free
of any driver-side loop: `spark.range(n)` parallelizes the generation
across the cluster, so generating 10M rows (the reference's `IdRange`,
schema.kql:2) is a narrow one-stage job at any scale.

Output schema matches the reference generator: `Id:long,
Timestamp:timestamp, Level:string, Node:string, ActivityId:string(guid),
Text:string` (SURVEY §1.2).
"""

from __future__ import annotations

import hashlib
import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: letters the reference draws text from (schema.kql:5): a-z plus space
_LETTERS = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [" "]

TEXT_LENGTH_MIN = 30
TEXT_LENGTH_MAX = 150


def _hash_mod(seed: int, lane: str, n: int, *cols: Column) -> Column:
    """Uniform-ish value in [0, n) from a counter-based hash — the
    deterministic stand-in for the reference's `toint(rand(n))`."""
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(lane), *cols), F.lit(n)).cast("int")


def _guids(seed: int, count: int) -> list[str]:
    """Deterministic GUID-formatted strings ≡ the 25 pre-drawn ActivityIds
    (schema.kql:7-9)."""
    out = []
    for j in range(count):
        h = hashlib.md5(f"kpf-activity-{seed}-{j}".encode()).hexdigest()
        out.append(f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}")
    return out


def generate_log_data(
    spark: SparkSession,
    n_rows: int = 10_000_000,
    seed: int = 0,
    base_time: datetime.datetime | None = None,
    n_activity_ids: int = 25,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic log table, one narrow stage, no UDFs.

    Column-for-column port of GenerateLogData (schema.kql:10-22):
    Text = 30..150 letters drawn from a 27-char alphabet; Level is
    60/30/10 Information/Warning/Error; Timestamp counts back one second
    per row from ``base_time`` (default: now, like `now() - 1s*(n-Id)`);
    Node is one of 25 machines; ActivityId one of ``n_activity_ids``
    pre-drawn GUIDs.

    ``base_time`` exists because `now()` would make the output
    nondeterministic; tests pass a fixed instant.
    """
    rng = spark.range(1, n_rows + 1, 1, num_partitions) if num_partitions else (
        spark.range(1, n_rows + 1)
    )
    df = rng.withColumnRenamed("id", "Id")
    id_col = F.col("Id")

    text_len = F.lit(TEXT_LENGTH_MIN) + _hash_mod(
        seed, "len", TEXT_LENGTH_MAX - TEXT_LENGTH_MIN + 1, id_col
    )
    letters = F.array(*[F.lit(ch) for ch in _LETTERS])
    text = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), text_len),
            lambda i: F.element_at(
                letters, _hash_mod(seed, "letter", len(_LETTERS), id_col, i) + 1
            ),
        ),
    )

    level_rand = _hash_mod(seed, "level", 100, id_col)
    level = (
        F.when(level_rand < 60, "Information")
        .when(level_rand < 90, "Warning")
        .otherwise("Error")
    )

    if base_time is None:
        ts_base = F.current_timestamp()
    else:
        ts_base = F.lit(base_time)
    timestamp = ts_base - F.make_interval(secs=(F.lit(n_rows) - id_col).cast("double"))

    node = F.concat(F.lit("Machine"), _hash_mod(seed, "node", 25, id_col).cast("string"))

    activity_ids = F.array(*[F.lit(g) for g in _guids(seed, n_activity_ids)])
    activity = F.element_at(
        activity_ids, _hash_mod(seed, "activity", n_activity_ids, id_col) + 1
    )

    return df.select(
        id_col,
        timestamp.alias("Timestamp"),
        level.alias("Level"),
        node.alias("Node"),
        activity.alias("ActivityId"),
        text.alias("Text"),
    )

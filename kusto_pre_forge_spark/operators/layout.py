"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

The 100 TB write-side companion to predicate pushdown: parquet row-group
min/max statistics prune scans only when rows with nearby key values sit
in the same files. A single-column sort clusters one dimension and
destroys the others; interleaving the bits of k columns (the Z-order /
Morton curve, the technique behind Delta Lake's OPTIMIZE ZORDER BY and
HBase/Accumulo shard keys) keeps EVERY indexed dimension's value ranges
compact, so selective filters on any of them skip most row groups.

Everything here is pure codegen integer arithmetic — the key computes in
the scan projection, and the layout write is one ``repartitionByRange``
(Spark's range partitioner samples the key distribution) plus a
``sortWithinPartitions``. No UDF, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton interleave of ``k`` non-negative integer columns at ``bits``
    bits each: output bit ``j·k + i`` is bit ``j`` of column ``i``.
    Values clamp into ``[0, 2^bits)`` (callers range-normalize or modulo
    first — the key is a LAYOUT device, collisions are fine). Requires
    ``k · bits ≤ 63`` so the key fits a signed long. Unrolled in Python
    to ``k · bits`` masked shifts — a flat codegen expression, no UDF.
    """
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds a signed long")
    cap = (1 << bits) - 1
    cs = [
        F.least(
            F.greatest((F.col(c) if isinstance(c, str) else c).cast("long"), F.lit(0)),
            F.lit(cap),
        )
        for c in cols
    ]
    acc = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cs):
            acc = acc + F.shiftleft(
                F.shiftright(c, j).bitwiseAND(F.lit(1)), j * k + i
            )
    return acc


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "_kpf_zkey",
) -> DataFrame:
    """Cluster rows for writing: compute the Z-order key, range-partition
    on it (Spark samples the distribution — balanced output files), and
    sort within partitions so row-group min/max stats are tight on every
    interleaved dimension. Write the result with any sink; drop
    ``key_col`` first if the key itself shouldn't persist."""
    keyed = df.withColumn(key_col, zorder_key(list(cols), bits))
    parted = (
        keyed.repartitionByRange(num_partitions, key_col)
        if num_partitions
        else keyed.repartitionByRange(key_col)
    )
    return parted.sortWithinPartitions(key_col)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-BUCKETED on its join/aggregation key — the
    write-side half of shuffle elimination. Spark records the bucket
    spec in the catalog; any later equi-join or aggregation on
    ``bucket_cols`` between tables with compatible bucket counts reads
    co-located buckets and plans NO exchange on either side (pinned by
    ``tests/test_layout.py`` walking the join plan). ``sort_cols``
    additionally pre-sorts each bucket so sort-merge joins skip their
    sort too.

    This is the standard 100 TB pattern for a fact table joined
    repeatedly on the same key (orders ⋈ lineitem on the order key:
    bucket both at write time, every downstream join is shuffle-free);
    at 1000 executors the avoided exchange is the whole job cost.
    Bucketed output requires the table catalog (``saveAsTable``) — plain
    ``parquet(path)`` cannot record the spec.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark, table: str) -> DataFrame:
    """Read a :func:`write_bucketed` table with its bucket spec live
    (``spark.table`` — the spec only exists through the catalog)."""
    return spark.table(table)


def compact_files(
    spark,
    path: str,
    out_dir: str,
    target_bytes: int = 128 << 20,
    fmt: str = "parquet",
    sort_cols: list | None = None,
) -> dict:
    """Small-file compaction — the OPTIMIZE-shaped maintenance pass a
    streaming/incremental writer eventually needs (thousands of KB-scale
    parquet files make every downstream scan pay per-file open + footer
    costs, and executors schedule one task per tiny split).

    Spark-first, two honest pieces:

    - SIZING is metadata-only: the output partition count comes from the
      listing's byte totals (``binaryFile`` prunes content for
      path/length-only selects), never a data pass — at 100 TB the
      decision costs a directory listing.
    - The REWRITE is one ``repartition(n)`` (or ``repartitionByRange``
      over ``sort_cols`` + ``sortWithinPartitions``, which re-clusters
      while compacting — pair with :func:`zorder_key` to restore
      pruning) and a single write. Catalyst/Tungsten own the physical
      plan; there is deliberately no hand-rolled bin packing.

    Returns {input_files, input_bytes, output_partitions}. The write
    goes to ``out_dir`` (mode=overwrite): compact-aside + swap is the
    crash-safe pattern (the manifest sink's ``.compact``/grace protocol
    governs in-place swaps)."""
    import math

    glob = path if any(ch in path for ch in "*?[") else path.rstrip("/") + "/*"
    listing = (
        spark.read.format("binaryFile").load(glob).select("path", "length")
    )
    row = listing.agg(
        F.count(F.lit(1)).alias("n"), F.sum("length").alias("b")
    ).collect()[0]
    n_in, total = int(row["n"]), int(row["b"] or 0)
    n_out = max(1, math.ceil(total / max(1, int(target_bytes))))
    df = spark.read.format(fmt).load(path)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").format(fmt).save(out_dir)
    return {
        "input_files": n_in,
        "input_bytes": total,
        "output_partitions": n_out,
    }

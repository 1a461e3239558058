"""Z-order layout: Morton math + range-partitioned clustered write."""

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators.layout import zorder_key, zorder_layout


def test_zorder_key_morton_vectors(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (255, 0), (0, 255), (3, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(["x", "y"], bits=8).alias("z")
        ).collect()
    }

    def morton(x, y):
        z = 0
        for j in range(8):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}
    # clamping: negatives to 0, overflow to the cap
    r = (
        spark.createDataFrame([(-5, 300)], "x long, y long")
        .select(zorder_key(["x", "y"], bits=8).alias("z"))
        .first()
    )
    assert r.z == morton(0, 255)
    with pytest.raises(ValueError, match="signed long"):
        zorder_key(["x", "y"], bits=32)


def test_zorder_layout_clusters_both_dims(spark):
    """After the layout pass, per-partition min/max spans of BOTH
    dimensions are tight relative to the global span — the property that
    makes row-group stats prune on either column."""
    n = 64
    df = spark.createDataFrame(
        [(i % n, i // n) for i in range(n * n)], "x long, y long"
    )
    laid = zorder_layout(df, ["x", "y"], bits=6, num_partitions=16)
    spans = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    avg_sx = sum(r.sx for r in spans) / len(spans)
    avg_sy = sum(r.sy for r in spans) / len(spans)
    # a single-column sort would leave the other dimension's span ~n-1;
    # z-order keeps both average spans well under half the global span
    assert avg_sx < n / 2, avg_sx
    assert avg_sy < n / 2, avg_sy


def test_zorder_key_fuzz_vs_reference(spark):
    """Property: the codegen Morton key equals the Python reference for
    random coordinate batches (one Spark job for the whole batch)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def morton3(x, y, z, bits):
        out = 0
        for j in range(bits):
            out |= ((x >> j) & 1) << (3 * j)
            out |= ((y >> j) & 1) << (3 * j + 1)
            out |= ((z >> j) & 1) << (3 * j + 2)
        return out

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 2**10 - 1),
                st.integers(0, 2**10 - 1),
                st.integers(0, 2**10 - 1),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def prop(coords):
        df = spark.createDataFrame(coords, "x long, y long, z long")
        got = [
            r.k
            for r in df.select(zorder_key(["x", "y", "z"], bits=10).alias("k"))
            .orderBy("k")
            .collect()
        ]
        want = sorted(morton3(x, y, z, 10) for x, y, z in coords)
        assert got == want

    prop()


def test_bucketed_join_plans_no_exchange(spark, tmp_path):
    """both sides bucketed on the join key with equal bucket counts →
    the join plan contains ZERO Exchange operators (the whole point)."""
    from kusto_pre_forge_spark.operators import layout

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    layout.write_bucketed(a, "kpf_bkt_a", ["k"], n_buckets=8, sort_cols=["k"])
    layout.write_bucketed(b, "kpf_bkt_b", ["k"], n_buckets=8, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta = layout.read_bucketed(spark, "kpf_bkt_a")
        tb = layout.read_bucketed(spark, "kpf_bkt_b")
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = joined.agg(F.sum(F.col("va") + F.col("vb"))).collect()[0][0]
        assert got == sum(2 * i + 3 * i for i in range(1000))
        # control: the same join over unbucketed frames DOES exchange
        plain = a.join(b, "k")
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in pplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS kpf_bkt_a")
        spark.sql("DROP TABLE IF EXISTS kpf_bkt_b")


def test_compact_files_shrinks_and_preserves(spark, tmp_path):
    """Compaction: metadata-only sizing, file count collapses toward
    ceil(bytes/target), rows and values survive byte-exact, and the
    sort_cols variant re-clusters while compacting."""
    import glob as _glob

    from kusto_pre_forge_spark.operators.layout import compact_files

    src = str(tmp_path / "many")
    d = spark.range(0, 20_000).withColumn("v", F.col("id") * 2)
    d.repartition(64).write.parquet(src)
    assert len(_glob.glob(src + "/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    stats = compact_files(spark, src, out, target_bytes=1 << 30)
    assert stats["input_files"] == 64 and stats["output_partitions"] == 1
    files = _glob.glob(out + "/*.parquet")
    assert len(files) == 1
    a = sorted(r.id for r in spark.read.parquet(out).collect())
    assert a == list(range(20_000))
    assert spark.read.parquet(out).agg(F.sum("v")).collect()[0][0] == \
        sum(i * 2 for i in range(20_000))

    out2 = str(tmp_path / "clustered")
    compact_files(spark, src, out2, target_bytes=1 << 30, sort_cols=["id"])
    rows = spark.read.parquet(out2).limit(5).collect()
    assert [r.id for r in rows] == sorted(r.id for r in rows), (
        "sorted-within-partition layout expected"
    )

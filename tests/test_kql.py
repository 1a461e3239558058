"""KQL operator layer semantics (SURVEY §2.5) on tiny DataFrames."""

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators import kql


def test_project_where_extend(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], ["x", "k"])
    out = kql.project(kql.where(df, F.col("x") > 1), doubled=F.col("x") * 2, k="k")
    rows = sorted((r.doubled, r.k) for r in out.collect())
    assert rows == [(4, "b"), (6, "a")]


def test_mv_expand_drops_empty_like_kql(spark):
    df = spark.createDataFrame([(1, [10, 20]), (2, []), (3, None)], "id int, arr array<int>")
    out = kql.mv_expand(df, "arr")
    assert sorted((r.id, r.arr) for r in out.collect()) == [(1, 10), (1, 20)]


def test_mv_apply(spark):
    df = spark.createDataFrame([(1, [1, 2, 3])], "id int, arr array<int>")
    out = kql.mv_apply(df, "arr", lambda x: x * 10, to="scaled")
    assert out.collect()[0].scaled == [10, 20, 30]


def test_summarize_take_any_make_list(spark):
    df = spark.createDataFrame([("a", 3), ("a", 1), ("b", 2)], ["k", "v"])
    out = kql.summarize(
        df,
        by=["k"],
        aggs={"n": F.count(F.lit(1)), "any_v": kql.take_any("v"), "vs": kql.make_list("v")},
    )
    rows = {r.k: (r.n, r.any_v, r.vs) for r in out.collect()}
    assert rows == {"a": (2, 1, [1, 3]), "b": (1, 2, [2])}


def test_has_term_token_boundaries(spark):
    df = spark.createDataFrame(
        [("North wind",), ("Northern",), ("the NORTH!",), ("nor th",)], ["t"]
    )
    out = df.filter(kql.has_term("t", "north")).collect()
    assert sorted(r.t for r in out) == ["North wind", "the NORTH!"]


def test_split_ix_literal_separator(spark):
    df = spark.createDataFrame([("a.b.c",)], ["s"])
    r = df.select(
        kql.split_ix("s", ".", 1).alias("mid"), kql.split_ix("s", ".", 9).alias("oob")
    ).collect()[0]
    assert r.mid == "b" and r.oob is None


def test_parse_csv_rfc4180(spark):
    df = spark.createDataFrame([('1,"a,""b"",c",x',)], ["line"])
    r = df.select(kql.parse_csv("line", "i int, s string, t string").alias("p")).collect()[0]
    assert (r.p.i, r.p.s, r.p.t) == (1, 'a,"b",c', "x")


def test_case_and_casts(spark):
    df = spark.createDataFrame([(1,), (5,), (50,)], ["x"])
    out = df.select(
        kql.case_(
            (F.col("x") < 3, F.lit("low")),
            (F.col("x") < 10, F.lit("mid")),
            F.lit("high"),
        ).alias("bucket"),
        kql.toint(F.lit("12x")).alias("bad_int"),
        kql.todatetime(F.lit("2024-01-02 03:04:05")).alias("ts"),
    ).collect()
    assert [r.bucket for r in out] == ["low", "mid", "high"]
    assert out[0].bad_int is None
    assert str(out[0].ts) == "2024-01-02 03:04:05"


def test_range_inclusive_and_top(spark):
    r = kql.kql_range(spark, "x", 1, 5, 2)
    assert [row.x for row in r.collect()] == [1, 3, 5]
    df = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    top = kql.top(df, 3, [F.col("v").desc()])
    assert [row.v for row in top.collect()] == [9, 8, 7]


def test_todynamic_variant_path(spark):
    df = spark.createDataFrame([('{"a": {"b": 7}}',)], ["j"])
    out = df.select(
        kql.dynamic_get(kql.todynamic("j"), "a.b", "int").alias("v"),
        kql.json_path("j", "a.b").alias("s"),
    ).collect()[0]
    assert out.v == 7 and out.s == "7"


def test_strcat_array_length_guid(spark):
    df = spark.createDataFrame([(["x", "y"],)], "arr array<string>")
    r = df.select(
        kql.strcat_array(F.col("arr"), "|").alias("j"),
        kql.array_length("arr").alias("n"),
        kql.new_guid().alias("g"),
    ).collect()[0]
    assert r.j == "x|y" and r.n == 2 and len(r.g) == 36


def test_datetime_add_seconds(spark):
    df = spark.createDataFrame([(3,)], ["n"])
    r = df.select(
        kql.datetime_add_seconds(F.lit("2024-01-01 00:00:00").cast("timestamp"), -F.col("n")).alias("ts")
    ).collect()[0]
    assert str(r.ts) == "2023-12-31 23:59:57"


def test_print_and_toscalar(spark):
    one = kql.print_expr(spark, x=F.lit(2) + F.lit(3), s=F.lit("ab"))
    r = one.collect()
    assert len(r) == 1 and r[0].x == 5 and r[0].s == "ab"
    # toscalar(count) feeds a literal into another query, the
    # NoHeaderNoCompressionTest.cs:26-34 shape
    n = kql.toscalar(kql.count_rows(spark.range(7)))
    assert kql.print_expr(spark, n=n).collect()[0].n == 7


def test_export_csv_size_limit_and_headers(spark, sf_smoke, tmp_path):
    import glob

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    out = str(tmp_path / "export")
    kql.export_csv(orders, out, size_limit_bytes=16 * 1024, include_headers=True)
    files = sorted(glob.glob(f"{out}/*.csv"))
    assert len(files) > 1, "size limit should split the export"
    total = 0
    import os

    for f in files:
        first = open(f).readline()
        assert first.startswith("o_orderkey"), "each exported file carries the header"
        total += sum(1 for _ in open(f)) - 1
        assert os.path.getsize(f) <= 2 * 16 * 1024, "file size ~ sizeLimit"
    assert total == orders.count()


def test_make_series_dense_axis_and_default_fill(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        ("a", t, 1.0),                      # hour 00
        ("a", t + dt.timedelta(hours=2), 2.0),  # hour 02 (hour 01 is a gap)
        ("b", t, 5.0),                      # b has only hour 00
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = kql.make_series(
        df, on="ts", step="hour", by=["k"], agg=F.sum("v"), default=0.0
    )
    got = {r.k: (r.series_ts, r.series_value) for r in out.collect()}
    hours = [dt.datetime(2024, 1, 1, h) for h in (0, 1, 2)]
    assert got["a"] == (hours, [1.0, 0.0, 2.0])
    assert got["b"] == (hours, [5.0, 0.0, 0.0])


def test_make_series_exploded_long_form(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 0, 0)
    df = spark.createDataFrame(
        [("a", t, 1.0), ("a", t + dt.timedelta(hours=1), 3.0)],
        "k string, ts timestamp, v double",
    )
    out = kql.make_series(
        df, on="ts", step="hour", by=["k"], agg=F.sum("v"), exploded=True
    )
    assert sorted((r.k, r.series_ts, r.series_value) for r in out.collect()) == [
        ("a", t, 1.0),
        ("a", t + dt.timedelta(hours=1), 3.0),
    ]


def test_join_innerunique_dedupes_left_deterministically(spark):
    left = spark.createDataFrame(
        [(1, 2, "x"), (1, 1, "y"), (2, 1, "z")], ["k", "ord", "payload"]
    )
    right = spark.createDataFrame([(1, "r1"), (2, "r2")], ["k", "rv"])
    out = kql.join_innerunique(left, right, ["k"], ["ord"])
    rows = sorted((r.k, r.payload, r.rv) for r in out.collect())
    # key 1 keeps the ord=1 row ("y"), not "x"
    assert rows == [(1, "y", "r1"), (2, "z", "r2")]


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_innerunique_gets_window_group_limit_pushdown(spark):
    """The rn=1 filter must compile to WindowGroupLimit (per-group limit
    applied before/around the exchange), not a full window materialization."""
    left = spark.range(100).selectExpr("id % 10 AS k", "id AS ord", "id AS p")
    right = spark.range(10).selectExpr("id AS k", "id * 2 AS rv")
    out = kql.join_innerunique(left, right, ["k"], ["ord"])
    assert "WindowGroupLimit" in _physical_plan(out)


def test_make_series_axis_is_broadcast(spark):
    """The dense-axis cross join must broadcast the axis side — a shuffled
    cross join over the keys would be a scale bug."""
    import datetime as dt

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)], "k string, ts timestamp, v double"
    )
    out = kql.make_series(df, on="ts", step="hour", by=["k"], agg=F.sum("v"))
    assert "BroadcastNestedLoopJoin" in _physical_plan(out)


def test_union_tables_is_zero_shuffle(spark):
    df1 = spark.createDataFrame([(1, "a")], ["x", "y"])
    df2 = spark.createDataFrame([(2,)], ["x"])
    out = kql.union_tables(df1, df2)
    rows = sorted((r.x, r.y) for r in out.collect())
    assert rows == [(1, "a"), (2, None)]
    assert "Exchange" not in _physical_plan(out)


def test_top_nested_hierarchy_and_ties(spark):
    df = spark.createDataFrame(
        [("r1", "n1", 10), ("r1", "n2", 5), ("r1", "n3", 1),
         ("r2", "n4", 100), ("r3", "n5", 1), ("r3", "n6", 1)],
        ["reg", "nat", "v"],
    )
    out = kql.top_nested(
        df, "reg", "nat", F.sum("v"), k_outer=2, k_inner=1,
        outer_alias="rv", inner_alias="nv",
    )
    rows = sorted((r.reg, r.rv, r.nat, r.nv) for r in out.collect())
    # top 2 regions by total: r2 (100), r1 (16); within each the top nation
    assert rows == [("r1", 16, "n1", 10), ("r2", 100, "n4", 100)]


def test_series_fill_linear_interpolates_and_clamps(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0)
    hours = [t0 + dt.timedelta(hours=h) for h in range(6)]
    # gaps: leading (h0), interior (h2, h3), trailing (h5)
    vals = [None, 10.0, None, None, 40.0, None]
    df = spark.createDataFrame(
        list(zip(["k"] * 6, hours, vals)), "k string, ts timestamp, v double"
    )
    out = kql.series_fill_linear(df, on="ts", value="v", by=["k"])
    got = [r.v for r in out.orderBy("ts").collect()]
    assert got == [10.0, 10.0, 20.0, 30.0, 40.0, 40.0]


def test_series_outliers_tukey_fences_and_degenerate_iqr(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 5, 100]] + [("b", 7.0), ("b", 7.0)],
        ["k", "v"],
    )
    out = kql.series_outliers(df, value="v", by=["k"])
    rows = {(r.k, r.v): r.outlier_score for r in out.collect()}
    # series a: q1=2.25, q3=4.75, IQR=2.5 → fences [-1.5, 8.5];
    # in-fence points score exactly 0, 100 scores (100-8.5)/2.5 = 36.6
    assert rows[("a", 5.0)] == 0.0
    assert rows[("a", 3.0)] == 0.0
    assert rows[("a", 100.0)] == pytest.approx(36.6)
    # series b: IQR 0 → score pinned to 0, no divide-by-zero
    assert rows[("b", 7.0)] == 0.0


def test_sort_by_kql_desc_default_and_getschema(spark):
    df = spark.createDataFrame([(1, "b"), (3, "a"), (2, "c")], ["x", "y"])
    assert [r.x for r in kql.sort_by(df, "x", desc_first=True).collect()] == [3, 2, 1]
    schema = {(r.ColumnName, r.ColumnOrdinal, r.ColumnType)
              for r in kql.getschema(df).collect()}
    assert schema == {("x", 0, "bigint"), ("y", 1, "string")}


def test_make_series_fromto_dst_axis_alignment(spark):
    """ADVICE r14 (medium): the from/to axis must use the same
    epoch-seconds arithmetic as the bucket labels. A calendar INTERVAL
    axis diverges after a DST transition (day step, DST-observing
    session timezone) and post-transition buckets silently read as the
    default fill."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.createDataFrame(
            [("2024-03-09 12:00:00", 1.0), ("2024-03-11 12:00:00", 7.0)],
            "tss string, v double",
        ).selectExpr("cast(tss as timestamp) ts", "v")
        out = kql.make_series(
            df, on="ts", step="day", by=[], agg=F.sum("v"), default=0.0,
            lo=F.to_timestamp(F.lit("2024-03-09 00:00:00")),
            hi=F.to_timestamp(F.lit("2024-03-13 00:00:00")),
            exploded=True,
        )
        vals = [r.series_value for r in out.collect()]
        assert len(vals) == 4          # [lo, hi) at 86400-s steps
        assert sum(vals) == 8.0        # nothing lost to the default fill
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)

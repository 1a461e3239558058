"""Unit tests for the round-2 KQL surface: conditional/positional
aggregates, scalar batch 2, array scalars, scan/serialized-row functions,
narrow, deterministic sample, series analytics."""

import math

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators import kql


@pytest.fixture(scope="module")
def tiny(spark):
    return kql.datatable(
        spark,
        "k string, x long, v double, flag boolean",
        ("a", 1, 10.0, False),
        ("a", 2, 20.0, False),
        ("a", 3, 5.0, True),
        ("a", 4, 7.0, False),
        ("b", 1, 100.0, False),
        ("b", 2, 1.0, True),
    )


def test_arg_max_min(tiny):
    row = tiny.groupBy().agg(
        kql.arg_max("v", "x").alias("mx"), kql.arg_min("v", "x").alias("mn")
    ).first()
    assert row["mx"] == 1 and row["mn"] == 2  # v=100 → x=1; v=1 → x=2


def test_conditional_aggs(tiny):
    row = tiny.groupBy().agg(
        kql.avgif("v", F.col("k") == "a").alias("avg_a"),
        kql.minif("v", F.col("k") == "a").alias("min_a"),
        kql.maxif("v", F.col("k") == "b").alias("max_b"),
        kql.dcountif("x", F.col("k") == "a", exact=True).alias("dc_a"),
    ).first()
    assert row["avg_a"] == pytest.approx(10.5)
    assert row["min_a"] == 5.0 and row["max_b"] == 100.0 and row["dc_a"] == 4


def test_stdev_variance(tiny):
    row = tiny.where("k = 'a'").groupBy().agg(
        kql.stdev("v").alias("s"), kql.variance("v").alias("var")
    ).first()
    # sample variance of [10,20,5,7] = 45.666...
    assert row["var"] == pytest.approx(44.33333333)
    assert row["s"] == pytest.approx(math.sqrt(44.33333333))


def test_hll_sketch_roundtrip(tiny):
    per_k = tiny.groupBy("k").agg(kql.hll("x").alias("sk"))
    est = per_k.agg(kql.dcount_hll(kql.hll_merge("sk")).alias("e")).first()["e"]
    assert est == 4  # exact at tiny cardinality


def test_bin_at_anchor(spark):
    df = spark.sql("SELECT timestamp'1970-01-01 02:10:00' AS ts")
    out = df.select(
        kql.bin_at("ts", "1 hour", "1970-01-01 00:30:00").alias("b")
    ).first()["b"]
    assert out.hour == 1 and out.minute == 30  # 01:30, not 02:00


def test_startofweek_is_sunday(spark):
    df = spark.sql("SELECT timestamp'2024-01-10 13:00:00' AS ts")  # Wed
    out = df.select(kql.startofweek("ts").alias("s")).first()["s"]
    assert out.isoweekday() == 7 and out.day == 7  # Sunday Jan 7


def test_string_scalars(spark):
    df = kql.datatable(spark, "s string", ("abracadabra",))
    row = df.select(
        kql.indexof("s", "cad").alias("i"),
        kql.countof("s", "ab").alias("c"),
        kql.reverse_str("s").alias("r"),
        kql.trim_kql("[ab]", "s").alias("t"),
        kql.tohex(F.lit(255)).alias("h"),
    ).first()
    assert row["i"] == 4 and row["c"] == 2
    assert row["r"] == "arbadacarba"
    assert row["t"] == "racadabr"  # leading "ab" and trailing "a" stripped
    assert row["h"] == "ff"


def test_base64_roundtrip(spark):
    df = kql.datatable(spark, "s string", ("hello",))
    row = df.select(
        kql.base64_decode_tostring(kql.base64_encode_tostring("s")).alias("rt")
    ).first()
    assert row["rt"] == "hello"


def test_array_scalars(spark):
    df = spark.sql(
        "SELECT array('d','b','c','a') AS arr, array(1, 2, 3) AS nums"
    )
    row = df.select(
        kql.array_slice("arr", 1, 2).alias("sl"),
        kql.array_index_of("arr", "c").alias("ix"),
        kql.array_index_of("arr", "zz").alias("missing"),
        kql.array_sort_desc("arr").alias("sd"),
        kql.array_rotate_left("arr", 1).alias("rot"),
        kql.array_sum("nums").alias("sm"),
        kql.set_difference_arr("arr", F.array(F.lit("a"), F.lit("b"))).alias("diff"),
        kql.zip_arrays("nums", "nums").alias("z"),
    ).first()
    assert row["sl"] == ["b", "c"] and row["ix"] == 2 and row["missing"] == -1
    assert row["sd"] == ["d", "c", "b", "a"]
    assert row["rot"] == ["b", "c", "a", "d"]
    assert row["sm"] == 6.0
    assert row["diff"] == ["c", "d"]
    assert row["z"][0] == ["1", "1"]


def test_scan_accumulate_restart(tiny):
    out = kql.scan_accumulate(
        tiny, by=["k"], order=["x"], value="v", restart=F.col("flag")
    )
    rows = {(r["k"], r["x"]): (r["scan_sum"], r["scan_step"]) for r in out.collect()}
    assert rows[("a", 1)] == (10.0, 1)
    assert rows[("a", 2)] == (30.0, 2)
    assert rows[("a", 3)] == (5.0, 1)  # restart fires ON the flagged row
    assert rows[("a", 4)] == (12.0, 2)
    assert rows[("b", 2)] == (1.0, 1)


def test_row_cumsum_and_prev_next(tiny):
    out = kql.row_cumsum(tiny, "v", order=["x"], by=["k"])
    rows = {(r["k"], r["x"]): r["cumsum"] for r in out.collect()}
    assert rows[("a", 4)] == 42.0 and rows[("b", 2)] == 101.0
    pn = kql.prev_next(tiny, "v", order=["x"], by=["k"])
    r = {(x["k"], x["x"]): (x["prev_value"], x["next_value"]) for x in pn.collect()}
    assert r[("a", 1)] == (None, 20.0) and r[("a", 4)] == (5.0, None)


def test_serialize_rows(tiny):
    out = kql.serialize_rows(tiny, order=[F.col("v").desc()], by=["k"])
    top = {r["k"]: r["x"] for r in out.where("row_number = 1").collect()}
    assert top == {"a": 2, "b": 1}


def test_narrow(tiny):
    agg = tiny.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    out = kql.narrow(agg, ids=["k"], value_cols=["n"])
    rows = {(r["k"], r["Column"]): r["Value"] for r in out.collect()}
    assert rows[("a", "n")] == "4" and rows[("b", "n")] == "2"


def test_sample_deterministic_stable(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    key = F.concat_ws("-", "l_orderkey", "l_linenumber")
    a = kql.sample_deterministic(li, key, 0.1).count()
    b = kql.sample_deterministic(li, key, 0.1).count()
    n = li.count()
    assert a == b  # reproducible
    assert 0.05 * n < a < 0.15 * n  # roughly the asked fraction


def test_series_stats_known(spark):
    df = spark.sql("SELECT array(1.0, 5.0, 3.0, 5.0) AS s")
    row = kql.series_stats(df, "s").first()
    assert row["series_min"] == 1.0 and row["series_max"] == 5.0
    assert row["series_min_idx"] == 0 and row["series_max_idx"] == 1  # first max
    assert row["series_avg"] == pytest.approx(3.5)
    assert row["series_sum"] == 14.0
    assert row["series_stdev"] == pytest.approx(1.91485422)


def test_series_moving_avg(spark):
    df = spark.sql("SELECT array(3.0, 6.0, 9.0, 12.0) AS s")
    out = df.select(kql.series_moving_avg("s", 3).alias("m")).first()["m"]
    assert out == pytest.approx([3.0, 4.5, 6.0, 9.0])


def test_series_pearson(spark):
    df = spark.sql(
        "SELECT array(1.0,2.0,3.0) AS a, array(2.0,4.0,6.0) AS b, "
        "array(3.0,2.0,1.0) AS c"
    )
    row = df.select(
        kql.series_pearson_correlation("a", "b").alias("pos"),
        kql.series_pearson_correlation("a", "c").alias("neg"),
    ).first()
    assert row["pos"] == pytest.approx(1.0) and row["neg"] == pytest.approx(-1.0)


def test_partition_apply(tiny):
    def head1(pdf):
        return pdf.sort_values("x").head(1)

    out = kql.partition_apply(
        tiny.select("k", "x", "v"), "k", head1, "k string, x long, v double"
    )
    assert {r["k"]: r["x"] for r in out.collect()} == {"a": 1, "b": 1}


def test_facet_by(tiny):
    f = kql.facet_by(tiny, "k")
    assert set(f) == {"k"}
    assert {r["k"]: r["count_"] for r in f["k"].collect()} == {"a": 4, "b": 2}


def test_externaldata(spark, tmp_path):
    p = tmp_path / "ext.csv"
    p.write_text("1,x\n2,y\n")
    out = kql.externaldata(spark, "id long, name string", str(p))
    assert {r["id"]: r["name"] for r in out.collect()} == {1: "x", 2: "y"}


def test_project_family(tiny):
    out = kql.project_away(tiny, "flag")
    assert out.columns == ["k", "x", "v"]
    out = kql.project_keep(tiny, "v", "k")  # original order kept
    assert out.columns == ["k", "v"]
    out = kql.project_rename(tiny, key="k")
    assert out.columns == ["key", "x", "v", "flag"]
    out = kql.project_reorder(tiny, "v")
    assert out.columns == ["v", "k", "x", "flag"]


def test_parse_where_drops_nonmatching(spark):
    df = kql.datatable(
        spark, "s string", ("Customer#42",), ("garbage",), ("Customer#7",)
    )
    out = kql.parse_where(df, "s", "Customer#", ("cnum", "long"))
    assert sorted(r["cnum"] for r in out.collect()) == [7, 42]


def test_search_tables(tiny, spark):
    other = kql.datatable(spark, "name string", ("findme-here",), ("nope",))
    out = kql.search_tables({"t1": tiny, "t2": other}, "FINDME")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["source_"] == "t2"
    assert "findme-here" in rows[0]["row_json"]


def test_sample_distinct(tiny):
    out = kql.sample_distinct(tiny, "x", 2)
    a = sorted(r["key"] for r in out.collect())
    b = sorted(r["key"] for r in kql.sample_distinct(tiny, "x", 2).collect())
    assert a == b and len(a) == 2  # reproducible pick of 2 distinct keys


def test_predicates(spark):
    df = kql.datatable(spark, "s string, n long", ("North Wind", 5), ("seaside", 20))
    rows = df.select(
        kql.has_any("s", "wind", "fire").alias("any_"),
        kql.has_all("s", "north", "wind").alias("all_"),
        kql.startswith("s", "NORTH").alias("sw"),
        kql.endswith("s", "SIDE").alias("ew"),
        kql.matches_regex("s", "^[Ns]").alias("rx"),
        kql.in_ci("s", "SEASIDE").alias("inci"),
        kql.between("n", 5, 10).alias("btw"),
    ).collect()
    assert [r["any_"] for r in rows] == [True, False]
    assert [r["all_"] for r in rows] == [True, False]
    assert [r["sw"] for r in rows] == [True, False]
    assert [r["ew"] for r in rows] == [False, True]
    assert [r["rx"] for r in rows] == [True, True]
    assert [r["inci"] for r in rows] == [False, True]
    assert [r["btw"] for r in rows] == [True, False]


def test_union_withsource(tiny, spark):
    other = kql.datatable(spark, "k string", ("z",))
    out = kql.union_withsource({"a": tiny.select("k"), "b": other})
    counts = out.groupBy("source_").count().collect()
    assert {r["source_"]: r["count"] for r in counts} == {"a": 6, "b": 1}


def test_reduce_by(spark):
    df = kql.datatable(
        spark,
        "s string",
        ("job 12 failed at 10:30",),
        ("job 99 failed at 11:45",),
        ("heartbeat ok",),
        ("guid 6f9619ff-8b86-d011-b42d-00c04fc964ff seen",),
    )
    rows = {r["Pattern"]: r["Count"] for r in kql.reduce_by(df, "s").collect()}
    assert rows["job * failed at *:*"] == 2
    assert rows["heartbeat ok"] == 1
    assert rows["guid * seen"] == 1


def test_make_bag_sorted_dedups_keys(tiny):
    row = tiny.groupBy().agg(
        kql.make_bag_sorted("k", "x").alias("bag")
    ).first()
    # key a → values 1..4, smallest string "1"; key b → "1"
    assert row["bag"] == '{"a":"1","b":"1"}'


def test_binary_all_aggs(tiny):
    row = tiny.groupBy().agg(
        kql.binary_all_and("x").cast("long").alias("a"),
        kql.binary_all_or("x").cast("long").alias("o"),
        kql.binary_all_xor("x").cast("long").alias("x_"),
    ).first()
    # x values: 1,2,3,4,1,2 → and=0, or=7, xor=1^2^3^4^1^2=7
    assert row["a"] == 0 and row["o"] == 7 and row["x_"] == 7


def test_series_moving_avg_centered_edges(spark):
    """center=True divisor = realized slice size at BOTH array ends
    (previously deflated near the tail by counting past-the-end slots)."""
    df = spark.createDataFrame([([1.0, 2.0, 3.0, 4.0, 5.0],)], "s array<double>")
    out = df.select(kql.series_moving_avg("s", 3, center=True).alias("m")).first()["m"]
    # window 3 centered: [1,2]/2, [1,2,3]/3, [2,3,4]/3, [3,4,5]/3, [4,5]/2
    expect = [1.5, 2.0, 3.0, 4.0, 4.5]
    assert [round(v, 9) for v in out] == expect
    # trailing form unchanged: [1]/1, [1,2]/2, [1,2,3]/3, [2,3,4]/3, [3,4,5]/3
    trail = df.select(kql.series_moving_avg("s", 3).alias("m")).first()["m"]
    assert [round(v, 9) for v in trail] == [1.0, 1.5, 2.0, 3.0, 4.0]


def test_make_bag_sorted_escapes_json(spark):
    """Keys/values containing quotes and backslashes must round-trip as
    valid JSON (raw concatenation produced broken strings)."""
    import json

    df = spark.createDataFrame(
        [('say "hi"', 'back\\slash'), ("plain", 'quote"inside')],
        "k string, v string",
    )
    bag = df.agg(kql.make_bag_sorted("k", "v").alias("bag")).first()["bag"]
    parsed = json.loads(bag)  # raises if escaping is broken
    assert parsed == {"plain": 'quote"inside', 'say "hi"': "back\\slash"}


def test_binary_all_aggs_accept_computed_columns(tiny):
    """Native bit_and/or/xor path: computed Column inputs (the SQL-string
    round-trip used to mis-render them)."""
    row = tiny.agg(
        kql.binary_all_and(F.col("x") + 0).cast("long").alias("a"),
        kql.binary_all_or(F.col("x") * 1).cast("long").alias("o"),
    ).first()
    xs = [r["x"] for r in tiny.select("x").collect()]
    import functools, operator

    assert row["a"] == functools.reduce(operator.and_, xs)
    assert row["o"] == functools.reduce(operator.or_, xs)


def test_degenerate_inputs_guarded(tiny, spark):
    """Zero-term has_any/has_all, empty countof needle, and a
    string-column-free search must not raise."""
    row = tiny.select(
        kql.has_any("s").alias("any0"),
        kql.has_all("s").alias("all0"),
        kql.countof("s", "").alias("c0"),
    ).first()
    assert row["any0"] is False and row["all0"] is True and row["c0"] == 0

    nums = spark.range(3)  # no string columns anywhere
    out = kql.search_tables({"nums": nums}, "zzz")
    assert out.count() == 0
    assert out.columns == ["source_", "row_json"]


def test_ipv4_scalars(spark):
    df = spark.createDataFrame(
        [("10.1.2.3",), ("8.8.8.8",), ("172.31.0.1",), ("256.1.1.1",), ("junk",)],
        "ip string",
    )
    rows = df.select(
        kql.parse_ipv4("ip").alias("n"),
        kql.format_ipv4(kql.parse_ipv4("ip")).alias("rt"),
        kql.ipv4_is_private("ip").alias("p"),
        kql.ipv4_is_in_range("ip", "8.8.0.0/16").alias("r"),
    ).collect()
    assert rows[0]["n"] == 10 * 16777216 + 1 * 65536 + 2 * 256 + 3
    assert rows[0]["rt"] == "10.1.2.3" and rows[0]["p"] is True
    assert rows[1]["r"] is True and rows[1]["p"] is False
    assert rows[2]["p"] is True  # 172.16/12 upper half
    assert rows[3]["n"] is None and rows[3]["p"] is None  # octet > 255
    assert rows[4]["n"] is None


def test_url_scalars(spark):
    df = spark.createDataFrame(
        [("https://u.example.org:9443/a/b?q=1#top",)], "u string"
    )
    bag = df.select(F.to_json(kql.parse_url_kql("u")).alias("j")).first()["j"]
    import json

    d = json.loads(bag)
    assert d == {
        "Scheme": "https", "Host": "u.example.org", "Port": "9443",
        "Path": "/a/b", "QueryString": "q=1", "Fragment": "top",
    }
    r = df.select(
        kql.url_encode_component(F.lit("a b/c")).alias("e"),
        kql.url_decode(F.lit("a%20b%2Fc")).alias("d"),
    ).first()
    assert r["e"] == "a%20b%2Fc" and r["d"] == "a b/c"


def test_series_fill_packed_arrays(spark):
    df = spark.createDataFrame(
        [([None, 1.0, None, None, 4.0, None],), ([None, None],)],
        "s array<double>",
    )
    rows = df.select(
        kql.series_fill_forward("s").alias("f"),
        kql.series_fill_backward("s").alias("b"),
    ).collect()
    assert rows[0]["f"] == [None, 1.0, 1.0, 1.0, 4.0, 4.0]
    assert rows[0]["b"] == [1.0, 1.0, 4.0, 4.0, 4.0, None]
    assert rows[1]["f"] == [None, None] and rows[1]["b"] == [None, None]


def test_bitwise_scalars(spark):
    df = spark.createDataFrame([(0b1100,)], "x long")
    r = df.select(
        kql.binary_and("x", 0b1010).alias("a"),
        kql.binary_or("x", 0b0011).alias("o"),
        kql.binary_xor("x", 0b1010).alias("x_"),
        kql.binary_not("x").alias("n"),
        kql.binary_shift_left("x", 2).alias("l"),
        kql.binary_shift_right("x", 2).alias("r"),
        kql.bitset_count_ones("x").alias("p"),
    ).first()
    assert (r["a"], r["o"], r["x_"], r["n"]) == (0b1000, 0b1111, 0b0110, -13)
    assert (r["l"], r["r"], r["p"]) == (0b110000, 0b11, 2)


def test_strcmp_and_string_size(spark):
    df = spark.createDataFrame([("abc", "abd"), ("b", "a"), ("x", "x")], "a string, b string")
    rows = df.select(kql.strcmp("a", "b").alias("c")).collect()
    assert [r["c"] for r in rows] == [-1, 1, 0]
    sz = spark.range(1).select(kql.string_size(F.lit("héllo")).alias("s")).first()["s"]
    assert sz == 6  # é is 2 UTF-8 bytes


def test_geo_distance_known_pair(spark):
    # Paris (2.3522, 48.8566) → London (-0.1276, 51.5072) ≈ 343.5 km
    df = spark.range(1)
    km = df.select(
        (kql.geo_distance_2points(
            F.lit(2.3522), F.lit(48.8566), F.lit(-0.1276), F.lit(51.5072)
        ) / 1000.0).alias("km")
    ).first()["km"]
    assert 340 < km < 347, km


def test_row_rank_dense_vs_min(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 5)], "k string, v long"
    )
    d = kql.row_rank_dense(df, ["v"], by=["k"], out_name="rd")
    m = kql.row_rank_min(d, ["v"], by=["k"], out_name="rm")
    rows = {(r.k, r.v, r.rd, r.rm) for r in m.collect()}
    assert ("a", 2, 2, 3) in rows  # dense: 2, min-rank: 3 after the tie
    assert ("b", 5, 1, 1) in rows


def test_series_decompose_long_form_identity_and_outlier(spark):
    """baseline + residual reconstructs the input exactly; a planted spike
    on a smooth series is the top |residual| and flags +1; a clean series
    flags nothing."""
    rows = [("k", i, i * 1.0 + (40.0 if i == 13 else 0.0)) for i in range(24)]
    rows += [("clean", i, 5.0) for i in range(24)]
    df = spark.createDataFrame(rows, "k string, ord long, v double")

    dec = kql.series_decompose(df, "v", "ord", ["k"], period=4)
    for r in dec.collect():
        assert abs(r.sd_baseline + r.sd_residual - r.v) < 1e-9
        assert abs(r.sd_trend + r.sd_seasonal - r.sd_baseline) < 1e-9
    spike = {r.ord: abs(r.sd_residual) for r in dec.filter(F.col("k") == "k").collect()}
    assert max(spike, key=spike.get) == 13

    an = kql.series_decompose_anomalies(df, "v", "ord", ["k"], 4, threshold=3.0)
    flags = {(r.k, r.ord): r.anomaly_flag for r in an.collect()}
    assert flags[("k", 13)] == 1
    assert all(f == 0 for (k, _), f in flags.items() if k == "clean"), "constant series must not flag"


def test_bag_utilities(spark):
    df = spark.createDataFrame(
        [('{"b":"2","a":"1"}', '{"b":"X","c":"3"}')], "x string, y string"
    )
    r = df.select(
        kql.bag_merge("x", "y").alias("m"),
        kql.bag_remove_keys(F.col("x"), ["a"]).alias("rm"),
        F.array_join(kql.bag_keys("x"), ",").alias("k"),
    ).first()
    assert r["m"] == '{"a":"1","b":"2","c":"3"}', "left wins on b, keys sorted"
    assert r["rm"] == '{"b":"2"}'
    assert r["k"] == "a,b"


def test_basket_frequent_exact_support(spark):
    rows = [("a", "x")] * 6 + [("a", "y")] * 3 + [("b", "y")] * 1
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    out = {
        r.itemset: (r.size, r.n_rows, round(r.support, 3))
        for r in kql.basket_frequent(df, ["c1", "c2"], min_support=0.3).collect()
    }
    assert out == {
        "c1=a": (1, 9, 0.9),
        "c2=x": (1, 6, 0.6),
        "c2=y": (1, 4, 0.4),
        "c1=a,c2=x": (2, 6, 0.6),
        "c1=a,c2=y": (2, 3, 0.3),
    }


def test_bag_merge_null_side_is_empty_bag(spark):
    df = spark.createDataFrame(
        [('{"a":"1"}', None), (None, '{"b":"2"}'), (None, None)],
        "x string, y string",
    )
    got = [r.m for r in df.select(kql.bag_merge("x", "y").alias("m")).collect()]
    assert got == ['{"a":"1"}', '{"b":"2"}', "{}"], "null side = empty bag, not null poison"


def test_basket_frequent_null_value_labeled(spark):
    rows = [("a", None)] * 5 + [("a", "x")] * 5
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    out = {
        r.itemset: r.n_rows
        for r in kql.basket_frequent(df, ["c1", "c2"], min_support=0.4).collect()
    }
    assert out["c2=null"] == 5, "null group must be labeled, not a NULL itemset"
    assert out["c1=a,c2=null"] == 5
    assert None not in out


def test_series_fit_line_perfect_and_flat(spark):
    df = spark.createDataFrame(
        [([1.0, 3.0, 5.0, 7.0],), ([4.0, 4.0, 4.0, 4.0],)],
        "s array<double>",
    )
    out = df.select(kql.series_fit_line("s").alias("f")).collect()
    perfect, flat = out[0].f, out[1].f
    assert abs(perfect.slope - 2.0) < 1e-9
    assert abs(perfect.interception - 1.0) < 1e-9
    assert abs(perfect.rsquare - 1.0) < 1e-9
    assert abs(flat.slope) < 1e-9
    assert flat.rsquare == 1.0, "flat series: exact fit by convention"
    assert flat.variance == 0.0


def test_series_fit_2lines_finds_breakpoint(spark):
    # flat at 0 for 5 points, then a jump onto slope 3 — break at index 5
    # (the jump makes the breakpoint unique: no point lies on both lines)
    left = [0.0] * 5
    right = [3.0 * i + 4.0 for i in range(5)]
    df = spark.createDataFrame([(left + right,)], "s array<double>")
    f = df.select(kql.series_fit_2lines("s").alias("f")).collect()[0].f
    assert f.split_idx == 5
    assert abs(f.slope_left) < 1e-9
    assert abs(f.slope_right - 3.0) < 1e-9
    assert abs(f.rsquare - 1.0) < 1e-9
    # right intercept in GLOBAL x: y = 3(x - 5) + 4 -> -11 at x = 0
    assert abs(f.interception_right + 11.0) < 1e-9


def test_percentilesw_weighted_semantics(spark):
    # values 1..4, weight 1 except value 4 has weight 7 (total 10):
    # p50 threshold 5.0 first crossed at value 4 (cum 3 -> 10)
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)], "v double, w double"
    )
    out = kql.percentilesw(df, "v", "w", [10.0, 50.0, 100.0]).collect()[0]
    assert out.percentile_10_0 == 1.0
    assert out.percentile_50_0 == 4.0
    assert out.percentile_100_0 == 4.0


def test_autocluster_ranks_and_wildcards(spark):
    rows = [("a", "x")] * 6 + [("a", "y")] * 3 + [("b", "y")] * 1
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    out = sorted(
        kql.autocluster(df, ["c1", "c2"], min_support=0.3, num_segments=3).collect(),
        key=lambda r: r.segment_id,
    )
    assert [r.segment_id for r in out] == [0, 1, 2]
    top = out[0]
    assert (top.c1, top.c2, top.n_rows) == ("a", None, 9), "c1=a covers 9 rows, c2 wildcard"
    assert abs(top.percent - 0.9) < 1e-9


def test_diffpatterns_cohort_counts(spark):
    rows = [("a", "A")] * 6 + [("b", "A")] * 4 + [("a", "B")] * 2 + [("b", "B")] * 8
    df = spark.createDataFrame(rows, "c1 string, g string")
    out = {
        r.c1: (r.count_a, r.count_b, round(r.percent_diff, 3))
        for r in kql.diffpatterns(df, ["c1"], "g", "A", "B", min_support=0.05).collect()
    }
    assert out["a"] == (6, 2, 0.4), "a: 60% of A vs 20% of B"
    assert out["b"] == (4, 8, -0.4)


def test_totimespan_and_format_roundtrip(spark):
    df = spark.createDataFrame(
        [("1.02:03:04",), ("02:03:04.5",), ("nonsense",), ("25:00:00",)],
        "t string",
    )
    got = df.select(
        kql.totimespan("t").alias("sec"),
        kql.format_timespan(kql.totimespan("t"), "d.hh:mm:ss").alias("rt"),
    ).collect()
    assert got[0].sec == 86400 + 2 * 3600 + 3 * 60 + 4
    assert got[0].rt == "1.02:03:04"
    assert got[1].sec == 2 * 3600 + 3 * 60 + 4.5
    assert got[2].sec is None
    assert got[3].sec == 25 * 3600.0, "hours past 24 accepted (KQL timespan)"


def test_series_periods_detect_finds_planted_period(spark):
    import math

    series = [math.sin(2 * math.pi * i / 7) + 0.01 * i for i in range(56)]
    df = spark.createDataFrame([(series,)], "s array<double>")
    d = df.select(
        kql.series_periods_detect("s", 2, 14, 3).alias("d")
    ).collect()[0].d
    assert d.periods[0] == 7, f"weekly period must rank first, got {d.periods}"
    assert d.scores[0] > 0.8
    # flat series -> empty result, not a crash or div-by-zero
    flat = spark.createDataFrame([([5.0] * 20,)], "s array<double>")
    d2 = flat.select(kql.series_periods_detect("s").alias("d")).collect()[0].d
    assert list(d2.periods) == [] and list(d2.scores) == []


def test_series_fit_2lines_df_equals_packed_form(spark):
    # jump series + a noisy-but-unambiguous series, incl. negative values
    # (totals must come from the LAST cumsum, not max)
    s1 = [0.0] * 5 + [3.0 * i + 4.0 for i in range(5)]
    s2 = [-5.0, -3.0, -1.0, 1.0, 10.0, 11.0, 12.5, 13.0]
    df = spark.createDataFrame([("a", s1), ("b", s2)], "k string, s array<double>")
    packed = {
        r.k: r.f
        for r in df.select("k", kql.series_fit_2lines("s").alias("f")).collect()
    }
    dfform = {
        r.k: r
        for r in kql.series_fit_2lines_df(df, "s", ["k"]).collect()
    }
    for k in ("a", "b"):
        assert dfform[k].fit2_split_idx == packed[k].split_idx
        assert dfform[k].fit2_rsquare == pytest.approx(packed[k].rsquare)
        assert dfform[k].fit2_slope_left == pytest.approx(packed[k].slope_left)
        assert dfform[k].fit2_slope_right == pytest.approx(packed[k].slope_right)
        assert dfform[k].fit2_interception_right == pytest.approx(
            packed[k].interception_right
        )


def test_parse_version_ordering_and_nulls(spark):
    df = spark.createDataFrame(
        [("1.2.3",), ("1.2.10",), ("1.10.0",), ("2.0",), ("bad.ver",), ("1.2.3.4.5",)],
        "v string",
    )
    got = [r.p for r in df.select(kql.parse_version("v").alias("p")).collect()]
    assert got[4] is None and got[5] is None
    nums = got[:4]
    assert nums == sorted(nums), "dotted order must match numeric order"
    assert nums[0] < nums[1] < nums[2] < nums[3]


def test_array_shift_and_iff(spark):
    df = spark.sql(
        "SELECT array(1, 2, 3, 4) AS a, array(9, 9, 9, 9) AS b, "
        "array(true, false, true, false) AS c"
    )
    row = df.select(
        kql.array_shift_left("a", 2, 0).alias("l2"),
        kql.array_shift_left("a", -1, 0).alias("r1"),
        kql.array_iff("c", "a", "b").alias("iff"),
    ).first()
    assert row.l2 == [3, 4, 0, 0]
    assert row.r1 == [0, 1, 2, 3]
    assert row.iff == [1, 9, 3, 9]


def test_format_bytes_units(spark):
    df = spark.createDataFrame(
        [(0,), (512,), (2048,), (3 * 1024 * 1024,)], "n long"
    )
    got = [r.f for r in df.select(kql.format_bytes("n").alias("f")).collect()]
    assert got == ["0.0 Bytes", "512.0 Bytes", "2.0 KB", "3.0 MB"]


def test_graph_match_patterns_and_hub_valve(spark):
    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"), ("a", "y"), ("b", "y"), ("h", "a")],
        "src string, dst string",
    )
    # V-pattern: (n0)->(n1)<-(n2)
    v = {
        (r.n0, r.n1, r.n2)
        for r in kql.graph_match_path(edges, ["fwd", "rev"]).collect()
        if r.n0 < r.n2
    }
    assert ("a", "x", "b") in v and ("a", "y", "b") in v and ("a", "x", "c") in v
    assert all(p[0] != p[2] for p in v), "distinct-nodes semantics"
    # chain: (n0)->(n1)->(n2): h->a->x / h->a->y
    chain = {
        (r.n0, r.n1, r.n2)
        for r in kql.graph_match_path(edges, ["fwd", "fwd"]).collect()
    }
    assert chain == {("h", "a", "x"), ("h", "a", "y")}
    # hub valve on a set where only x exceeds degree 2: x-paths dropped,
    # y-paths survive
    edges2 = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"), ("a", "y"), ("b", "y")],
        "src string, dst string",
    )
    capped = {
        (r.n0, r.n1, r.n2)
        for r in kql.graph_match_path(edges2, ["fwd", "rev"], max_degree=2).collect()
    }
    assert all(p[1] != "x" for p in capped)
    assert ("a", "y", "b") in capped


def test_parse_ipv6_edge_cases(spark):
    cases = [
        ("2001:db8::1", "20010db8000000000000000000000001"),
        ("::1", "00000000000000000000000000000001"),
        ("::", "00000000000000000000000000000000"),
        ("1:2:3:4:5:6:7::", "00010002000300040005000600070000"),
        ("2001:0DB8::FF00:42:8329", "20010db8000000000000ff0000428329"),
        ("a:::b", None),
        ("1:2:3:4:5:6:7:8:9", None),
        ("g::1", None),
        ("2001:db8::1::2", None),
        (":::", None),
        ("", None),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "s string")
    got = [r.p for r in df.select(kql.parse_ipv6("s").alias("p")).collect()]
    assert got == [want for _, want in cases]


def test_ipv6_compare_and_match(spark):
    df = spark.createDataFrame([(1,)], "x long")
    row = df.select(
        kql.ipv6_compare(F.lit("::1"), F.lit("::2")).alias("lt"),
        kql.ipv6_compare(F.lit("2001:db8::"), F.lit("2001:0DB8:0:0:0:0:0:0")).alias("eq"),
        kql.ipv6_compare(F.lit("bad"), F.lit("::1")).alias("bad"),
        kql.ipv6_is_match(F.lit("2001:db8::1"), F.lit("2001:db8::ffff"), 64).alias("m64"),
        kql.ipv6_is_match(F.lit("2001:db8::1"), F.lit("2001:db9::1"), 32).alias("m32"),
    ).first()
    assert (row.lt, row.eq, row.bad) == (-1, 0, None)
    assert row.m64 is True and row.m32 is False


def test_top_nested_with_others(spark):
    rows = (
        [("r1", "a", 10.0)] * 2 + [("r1", "b", 5.0)] * 2 + [("r1", "c", 1.0)]
        + [("r2", "x", 8.0)] + [("r3", "y", 2.0)]
    )
    df = spark.createDataFrame(rows, "o string, i string, v double")
    out = kql.top_nested(
        df, "o", "i", F.sum("v"), k_outer=2, k_inner=1,
        outer_alias="om", inner_alias="im", others_label="Other",
    ).collect()
    got = {(r.o, r.i): (r.om, r.im) for r in out}
    # top-2 outer: r1 (31), r2 (8); r3 (2) -> outer Other row
    assert got[("Other", "Other")] == (2.0, 2.0)
    # within r1: top-1 inner a (20); b+c (11) -> inner Other row
    assert got[("r1", "a")] == (31.0, 20.0)
    assert got[("r1", "Other")] == (31.0, 11.0)
    assert got[("r2", "x")] == (8.0, 8.0)
    assert got[("r2", "Other")] == (8.0, 0.0)


def test_parse_ipv6_against_stdlib_fuzz(spark):
    """200 seeded-random addresses (full, compressed, mixed-case, plus
    malformed mutations) checked against Python's ipaddress module — an
    independent ground-truth oracle, not a replay of our own parser."""
    import ipaddress
    import random

    rng = random.Random(123)
    cases = []
    for _ in range(150):
        groups = [rng.randrange(0, 0x10000) for _ in range(8)]
        # zero a random run to exercise '::' compression via the stdlib's
        # compressed form as an input variant
        a, b = sorted(rng.sample(range(9), 2))
        for i in range(a, b):
            groups[i] = 0
        full = ":".join(f"{g:x}" for g in groups)
        addr = ipaddress.IPv6Address(full)
        variant = rng.choice([full, addr.compressed, full.upper()])
        cases.append((variant, "%032x" % int(addr)))
    for _ in range(50):
        bad = rng.choice(
            ["1:2:3", "::g", "1::2::3", "12345::", ":1:2:3:4:5:6:7", "x", ""]
        )
        cases.append((bad, None))
    df = spark.createDataFrame([(c,) for c, _ in cases], "s string")
    got = [r.p for r in df.select(kql.parse_ipv6("s").alias("p")).collect()]
    for (inp, want), have in zip(cases, got):
        assert have == want, f"{inp!r}: got {have!r} want {want!r}"


def test_datetime_diff_boundary_semantics(spark):
    """KQL counts BOUNDARIES crossed, not elapsed periods: one day apart
    across New Year = 1 year / 1 quarter / 1 month / 1 day."""
    df = spark.sql(
        "SELECT timestamp'2015-01-01 00:00:00' AS a, "
        "timestamp'2014-12-31 23:59:59' AS b, "
        "timestamp'2024-01-14 23:00:00' AS sat, "  # Sunday boundary: 14th IS Sunday
        "timestamp'2024-01-15 01:00:00' AS mon"
    )
    row = df.select(
        kql.datetime_diff("year", F.col("a"), F.col("b")).alias("y"),
        kql.datetime_diff("quarter", F.col("a"), F.col("b")).alias("q"),
        kql.datetime_diff("month", F.col("a"), F.col("b")).alias("m"),
        kql.datetime_diff("day", F.col("a"), F.col("b")).alias("d"),
        kql.datetime_diff("hour", F.col("a"), F.col("b")).alias("h"),
        kql.datetime_diff("week", F.col("mon"), F.col("sat")).alias("w0"),
        kql.datetime_diff("day", F.col("b"), F.col("a")).alias("neg"),
    ).first()
    assert (row.y, row.q, row.m, row.d, row.h) == (1, 1, 1, 1, 1)
    assert row.w0 == 0, "same Sunday-anchored week"
    assert row.neg == -1, "antisymmetric"


def test_datetime_scalars_and_indexof_regex(spark):
    df = spark.sql("SELECT timestamp'2024-03-05 07:08:09' AS t, 'abcdef' AS s")
    row = df.select(
        kql.endofyear("t").alias("eoy"),
        kql.week_of_year("t").alias("w"),
        kql.indexof_regex("s", "cd").alias("i"),
        kql.indexof_regex("s", "zz").alias("miss"),
        kql.has_any_index("s", ["zz", "de", "ab"]).alias("hai"),
        kql.unixtime_seconds_todatetime(F.lit(0)).alias("epoch"),
    ).first()
    assert str(row.eoy) == "2024-12-31 23:59:59.999999"
    assert row.w == 10  # ISO week of 2024-03-05
    assert (row.i, row.miss, row.hai) == (2, -1, 1)
    assert str(row.epoch) == "1970-01-01 00:00:00"


def test_series_fir_edges_and_center(spark):
    df = spark.sql("SELECT array(1.0d, 2.0d, 3.0d, 4.0d) AS s")
    row = df.select(
        kql.series_fir("s", [1.0, 1.0], normalize=True).alias("ma"),
        kql.series_fir("s", [1.0, 1.0, 1.0], normalize=True, center=True).alias("c"),
        kql.series_fir("s", [2.0, 1.0], normalize=False).alias("raw"),
    ).first()
    # trailing [1,1]: head uses the partial window (just x[0])
    assert row.ma == [1.0, 1.5, 2.5, 3.5]
    # centered [1,1,1]: edges average the 2 available neighbors
    assert row.c == [1.5, 2.0, 3.0, 3.5]
    # normalize=False: plain weighted sum, missing taps contribute 0
    assert row.raw == [2.0, 5.0, 8.0, 11.0]


def test_series_iir_exponential_smoothing(spark):
    df = spark.sql("SELECT array(10.0d, 0.0d, 0.0d) AS s")
    row = df.select(kql.series_iir("s", [0.5], [1.0, -0.5]).alias("y")).first()
    # y[i] = 0.5*x[i] + 0.5*y[i-1]
    assert row.y == [5.0, 2.5, 1.25]


def test_series_seasonal_phase_medians(spark):
    df = spark.sql("SELECT array(1.0d, 10.0d, 2.0d, 20.0d, 100.0d) AS s")
    row = df.select(kql.series_seasonal("s", 2).alias("y")).first()
    # phase 0: median(1,2,100)=2 (NOT the mean 34.33); phase 1:
    # median(10,20)=15 (even-sized phase interpolates the middle pair)
    assert row.y == [2.0, 15.0, 2.0, 15.0, 2.0]


def test_series_arith_elementwise(spark):
    df = spark.sql("SELECT array(4.0d, 9.0d) AS a, array(2.0d, 0.0d) AS b")
    row = df.select(
        kql.series_add("a", "b").alias("s"),
        kql.series_divide("a", "b").alias("d"),
        kql.series_sign(kql.series_subtract("b", "a")).alias("sg"),
    ).first()
    assert row.s == [6.0, 9.0]
    assert row.d[0] == 2.0 and row.d[1] is None, "0 denominator -> NULL"
    assert row.sg == [-1.0, -1.0]


def test_geohash_known_vectors(spark):
    df = spark.sql("SELECT 57.64911d AS lat, 10.40744d AS lon")
    r = df.select(
        kql.geo_point_to_geohash("lon", "lat", 11).alias("gh"),
        kql.geo_point_to_geohash(F.lit(-5.6), F.lit(42.6), 5).alias("gh2"),
        kql.geo_geohash_to_central_point(F.lit("ezs42")).alias("c"),
        kql.geo_point_to_geohash(F.lit(200.0), F.lit(0.0), 5).alias("bad_lon"),
        kql.geo_geohash_to_central_point(F.lit("ari")).alias("bad_alpha"),
        kql.geo_point_in_circle(F.lit(2.36), F.lit(48.86), 2.3522, 48.8566, 1000.0).alias("near"),
        kql.geo_point_in_circle(F.lit(10.0), F.lit(48.86), 2.3522, 48.8566, 1000.0).alias("far"),
    ).first()
    # Wikipedia geohash test vectors
    assert r.gh == "u4pruydqqvj"
    assert r.gh2 == "ezs42"
    assert abs(r.c.lat - 42.60498046875) < 1e-12
    assert abs(r.c.lon + 5.60302734375) < 1e-12
    assert r.bad_lon is None, "out-of-range lon -> NULL"
    assert r.bad_alpha is None, "'a' not in the geohash alphabet -> NULL"
    assert r.near is True and r.far is False


def test_parse_xml_xpath_forms(spark):
    df = spark.sql(
        """SELECT '<r a="5"><i>x</i><i>y</i></r>' AS x, 'nope' AS bad"""
    )
    r = df.select(
        kql.parse_xml_long("x", "/r/@a").alias("a"),
        kql.parse_xml_string("x", "/r/i").alias("first_i"),
        kql.parse_xml_list("x", "/r/i/text()").alias("all_i"),
        kql.parse_xml_string("x", "/r/none").alias("miss"),
        kql.parse_xml_string("bad", "/r").alias("guarded"),
        kql.parse_xml_string(F.lit(None).cast("string"), "/r").alias("null_in"),
    ).first()
    assert r.a == 5
    assert r.first_i == "x"
    assert r.all_i == ["x", "y"]
    assert r.miss == ""
    assert r.guarded is None and r.null_in is None


def test_rows_near_context_window(spark):
    df = spark.createDataFrame(
        [(i, "a", 100.0 if i == 5 else 1.0) for i in range(10)],
        "i long, g string, v double",
    )
    out = sorted(
        r.i
        for r in kql.rows_near(
            df, F.col("v") > 50, order=["i"], by=["g"], before=2, after=1
        ).collect()
    )
    # match at i=5 keeps [5-2, 5+1] = 3..6
    assert out == [3, 4, 5, 6]
    # unkeyed serialize form still works (small data)
    out2 = sorted(
        r.i
        for r in kql.rows_near(df, F.col("v") > 50, order=["i"], before=0, after=2).collect()
    )
    assert out2 == [5, 6, 7]


def test_ipv4_round2_scalars(spark):
    df = spark.sql("SELECT 1 AS x")
    r = df.select(
        kql.ipv4_compare(F.lit("10.0.0.2"), F.lit("10.0.0.10")).alias("lt"),
        kql.ipv4_compare(F.lit("10.0.0.2"), F.lit("10.0.0.2")).alias("eq"),
        kql.ipv4_compare(F.lit("nope"), F.lit("10.0.0.2")).alias("bad"),
        kql.ipv4_is_match(F.lit("10.1.2.3"), F.lit("10.1.2.200"), 24).alias("m24"),
        kql.ipv4_is_match(F.lit("10.1.2.3"), F.lit("10.1.3.3"), 24).alias("n24"),
        kql.ipv4_is_match(F.lit("1.2.3.4"), F.lit("200.2.3.4"), 0).alias("m0"),
        kql.ipv4_netmask_suffix(F.lit("192.168.1.0/24")).alias("s24"),
        kql.ipv4_netmask_suffix(F.lit("192.168.1.0")).alias("sdef"),
        kql.ipv4_netmask_suffix(F.lit("192.168.1.0/40")).alias("sbad"),
        kql.ipv4_netmask_suffix(F.lit("x/24")).alias("abad"),
        kql.ipv4_netmask_suffix(F.lit("1.2.3.4/24/9")).alias("dslash"),
    ).first()
    assert (r.lt, r.eq, r.bad) == (-1, 0, None)
    assert (r.m24, r.n24, r.m0) == (True, False, True)
    assert (r.s24, r.sdef, r.sbad, r.abad) == (24, 32, None, None)
    assert r.dslash is None, "two slashes is malformed, not /24"


def test_scalar_suite6_semantics(spark):
    df = spark.sql(
        "SELECT CAST('inf' AS DOUBLE) AS i, CAST('nan' AS DOUBLE) AS n, "
        "1.5d AS d, CAST(NULL AS DOUBLE) AS z, array(1, 2, 3, 4, 5) AS a, "
        "'  pad  ' AS s"
    )
    r = df.select(
        kql.isfinite("d").alias("fd"), kql.isfinite("i").alias("fi"),
        kql.isfinite("n").alias("fn"), kql.isfinite("z").alias("fz"),
        kql.isinf("i").alias("ii"), kql.isinf("n").alias("inn"),
        kql.gettype("d").alias("td"), kql.gettype("a").alias("ta"),
        kql.gettype("z").alias("tz"),
        kql.trim_start(r"\s+", "s").alias("t1"),
        kql.trim_end(r"\s+", "s").alias("t2"),
        kql.array_rotate_right("a", 7).alias("r7"),
        kql.array_rotate_right("a", -1).alias("rm1"),
        kql.array_split("a", [0, 5]).alias("edges"),
    ).first()
    assert (r.fd, r.fi, r.fn, r.fz) == (True, False, False, False)
    assert (r.ii, r.inn) == (True, False)
    assert (r.td, r.ta, r.tz) == ("real", "dynamic", "null")
    assert (r.t1, r.t2) == ("pad  ", "  pad")
    assert r.r7 == [4, 5, 1, 2, 3], "rotation normalizes mod length"
    assert r.rm1 == [2, 3, 4, 5, 1], "negative rotates left"
    assert r.edges == [[], [1, 2, 3, 4, 5], []]


def test_fork_shares_one_source(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "v long, g string")
    br = kql.fork(
        df,
        {
            "n": lambda d: d.groupBy("g").count(),
            "s": lambda d: d.groupBy("g").agg(F.sum("v").alias("s")),
        },
    )
    assert {r.g: r["count"] for r in br["n"].collect()} == {"a": 2, "b": 1}
    assert {r.g: r.s for r in br["s"].collect()} == {"a": 3, "b": 3}


def test_ipv4_lookup_multimatch_and_malformed(spark):
    lk = spark.createDataFrame(
        [("10.0.0.0/8", "corp"), ("10.1.0.0/16", "eng"), ("x/8", "junk")],
        "network string, name string",
    )
    t = spark.createDataFrame(
        [(1, "10.1.2.3"), (2, "10.200.0.1"), (3, "11.0.0.1"), (4, "garbage")],
        "id long, ip string",
    )
    out = sorted((r.id, r.name) for r in kql.ipv4_lookup(t, lk, "ip").collect())
    # 10.1.2.3 matches BOTH corp and eng; junk/garbage never match
    assert out == [(1, "corp"), (1, "eng"), (2, "corp")]


def test_compression_codecs_roundtrip(spark):
    df = spark.sql("SELECT 'hello κόσμος 123' AS t")
    r = df.select(
        kql.zlib_decompress_from_base64_string(
            kql.zlib_compress_to_base64_string("t")
        ).alias("z"),
        kql.gzip_decompress_from_base64_string(
            kql.gzip_compress_to_base64_string("t")
        ).alias("g"),
        kql.gzip_compress_to_base64_string("t").alias("g1"),
        kql.zlib_decompress_from_base64_string(F.lit("###")).alias("bad_b64"),
        kql.zlib_decompress_from_base64_string(F.lit("aGVsbG8=")).alias("bad_stream"),
        kql.zlib_decompress_from_base64_string(F.lit(None).cast("string")).alias("nul"),
    ).first()
    assert r.z == "hello κόσμος 123" and r.g == "hello κόσμος 123"
    # pinned mtime=0 keeps gzip output deterministic across runs
    r2 = df.select(kql.gzip_compress_to_base64_string("t").alias("g1")).first()
    assert r.g1 == r2.g1
    assert r.bad_b64 is None and r.bad_stream is None and r.nul is None


def test_geo_point_in_polygon_raycast(spark):
    square = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    df = spark.sql("SELECT 1 AS x")
    r = df.select(
        kql.geo_point_in_polygon(F.lit(5.0), F.lit(5.0), square).alias("inside"),
        kql.geo_point_in_polygon(F.lit(15.0), F.lit(5.0), square).alias("right_of"),
        kql.geo_point_in_polygon(F.lit(-1.0), F.lit(5.0), square).alias("left_of"),
        kql.geo_point_in_polygon(F.lit(5.0), F.lit(-1.0), square).alias("below"),
        kql.geo_point_in_polygon(
            F.lit(None).cast("double"), F.lit(5.0), square
        ).alias("null_in"),
    ).first()
    assert r.inside is True
    assert (r.right_of, r.left_of, r.below, r.null_in) == (False, False, False, False)
    # concave polygon: notch cut into the square's right side
    concave = [(0.0, 0.0), (10.0, 0.0), (4.0, 5.0), (10.0, 10.0), (0.0, 10.0)]
    r2 = df.select(
        kql.geo_point_in_polygon(F.lit(7.0), F.lit(5.0), concave).alias("in_notch"),
        kql.geo_point_in_polygon(F.lit(2.0), F.lit(5.0), concave).alias("in_body"),
    ).first()
    assert r2.in_notch is False and r2.in_body is True


def test_mv_expand_itemindex_and_pack_all(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], "id long, arr array<string>"
    )
    out = [(r.id, r.item_index, r.v) for r in kql.mv_expand_itemindex(df, "arr", to="v").collect()]
    assert sorted(out) == [(1, 0, "a"), (1, 1, "b")], "empty/null arrays drop"
    df2 = spark.createDataFrame([(1, "x")], "id long, name string")
    bag = df2.select(kql.pack_all(df2).alias("b")).first().b
    assert bag == '{"id":1,"name":"x"}'
    bag2 = df2.select(kql.pack_all(df2, exclude=["name"]).alias("b")).first().b
    assert bag2 == '{"id":1}'


def test_series_cosine_similarity(spark):
    df = spark.sql("SELECT array(1.0d, 0.0d) AS a, array(0.0d, 2.0d) AS b, array(3.0d, 0.0d) AS c")
    r = df.select(
        kql.series_cosine_similarity("a", "b").alias("orth"),
        kql.series_cosine_similarity("a", "c").alias("par"),
    ).first()
    assert r.orth == 0.0 and abs(r.par - 1.0) < 1e-12


def test_parse_path_and_codepoints(spark):
    df = spark.sql(
        r"SELECT 'C:\\Users\\bob\\report.v2.pdf' AS w, "
        "'/var/log/errors.log' AS u, 'noext' AS bare"
    )
    r = df.select(
        kql.parse_path("w").alias("w"),
        kql.parse_path("u").alias("u"),
        kql.parse_path("bare").alias("b"),
        kql.unicode_codepoints_from_string(F.lit("Hi")).alias("cp"),
        kql.unicode_codepoints_to_string(F.array(F.lit(72), F.lit(105))).alias("s"),
    ).first()
    assert r.w.RootPath == "C:" and r.w.Scheme == "", "drive letter is not a scheme"
    assert r.w.Filename == "report.v2.pdf" and r.w.Extension == "pdf"
    assert r.u.DirectoryPath == "/var/log" and r.u.DirectoryName == "log"
    assert r.b.Filename == "noext" and r.b.Extension == "" and r.b.DirectoryPath == ""
    assert r.cp == [72, 105] and r.s == "Hi"


def test_has_ipv4_and_prefix(spark):
    df = spark.sql("SELECT 1 AS x")
    r = df.select(
        kql.has_ipv4(F.lit("src 10.1.2.3 dst")).alias("ok"),
        kql.has_ipv4(F.lit("10.1.2.3")).alias("whole"),
        kql.has_ipv4(F.lit("x10.1.2.3")).alias("glued"),
        kql.has_ipv4(F.lit("300.1.2.3 here")).alias("badoct"),
        kql.has_ipv4(F.lit("no ip")).alias("none"),
        kql.has_ipv4_prefix(F.lit("a 192.168.1.5 b"), "192.168.").alias("pfx"),
        kql.has_ipv4_prefix(F.lit("a 10.0.0.5 b"), "192.168.").alias("nopfx"),
    ).first()
    assert (r.ok, r.whole) == (True, True)
    assert (r.glued, r.badoct, r.none) == (False, False, False)
    assert (r.pfx, r.nopfx) == (True, False)


def test_invoke_consume_asview_graphvar(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert kql.consume(df) == 3
    kql.as_view(df, "edges_v")
    assert spark.sql("SELECT count(*) AS n FROM edges_v").first().n == 3
    doubled = kql.invoke(df, lambda d, k: d.limit(k), 2)
    assert doubled.count() == 2
    out = {(r.n_start, r.n_end, r.hops) for r in kql.graph_match_var(df, 1, 2).collect()}
    assert (1, 2, 1) in out and (1, 3, 2) in out and (2, 4, 2) in out
    assert (1, 4, 3) not in out, "3 hops excluded by max_hops=2"


def test_graph_shortest_paths_bfs(spark):
    # chain 1->2->3->4 plus shortcut 1->4 and a disconnected 9->10
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (9, 10)], "src long, dst long"
    )
    out = {r.node: r.dist for r in kql.graph_shortest_paths(df, [1]).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 1}, "shortcut wins; unreachable absent"
    # cycle must converge, not loop forever
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out2 = {r.node: r.dist for r in kql.graph_shortest_paths(cyc, [1]).collect()}
    assert out2 == {1: 0, 2: 1}


def test_quarter_week_boundaries(spark):
    df = spark.sql("SELECT timestamp'2024-05-15 10:30:00' AS t")  # a Wednesday
    r = df.select(
        kql.startofyear("t").alias("soy"),
        kql.startofquarter("t").alias("soq"),
        kql.endofquarter("t").alias("eoq"),
        kql.endofweek("t").alias("eow"),
    ).first()
    assert str(r.soy) == "2024-01-01 00:00:00"
    assert str(r.soq) == "2024-04-01 00:00:00"
    assert str(r.eoq) == "2024-06-30 23:59:59.999999"
    # Sunday-anchored: week of Wed 2024-05-15 runs Sun 05-12 .. Sat 05-18
    assert str(r.eow) == "2024-05-18 23:59:59.999999"


def test_export_any_formats(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(100)], "id long, name string"
    )
    for fmt in ("parquet", "json", "tsv", "orc"):
        out = str(tmp_path / fmt)
        kql.export_any(df, out, fmt, distribution=2)
        back = (
            spark.read.option("sep", "\t").option("header", "true").csv(out)
            if fmt == "tsv"
            else getattr(spark.read, fmt)(out)
        )
        assert back.count() == 100, fmt
    # size cap produces multiple parquet files
    capped = str(tmp_path / "capped")
    kql.export_any(df, capped, "parquet", size_limit_bytes=200)
    import glob

    assert len(glob.glob(f"{capped}/*.parquet")) > 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kql.export_any(df, str(tmp_path / "x"), "avro")


def test_scalar_suite8_semantics(spark):
    df = spark.sql("SELECT CAST(NULL AS DOUBLE) AS z, 3.0d AS v, 'héllo' AS nonascii")
    r = df.select(
        kql.max_of(F.col("z"), F.col("v"), F.lit(1.0)).alias("mx"),
        kql.min_of(F.col("z"), F.col("v")).alias("mn"),
        kql.isascii(F.lit("plain")).alias("a1"),
        kql.isascii("nonascii").alias("a2"),
        kql.isascii(F.lit(None).cast("string")).alias("a3"),
        kql.estimate_data_size(F.lit("ab"), F.lit(123), F.col("z")).alias("sz"),
        kql.format_ipv4_mask(F.lit("192.168.1.77"), 24).alias("m"),
        kql.format_ipv4_mask(F.lit("192.168.1.77"), 32).alias("m32"),
    ).first()
    assert r.mx == 3.0 and r.mn == 3.0, "nulls skipped"
    assert (r.a1, r.a2, r.a3) == (True, False, False)
    assert r.sz == 5, "2 + 3 + 0 for the null"
    assert r.m == "192.168.1.0/24" and r.m32 == "192.168.1.77/32"


def test_geohash_fuzz_against_reference(spark):
    """300 seeded-random points: Spark encode/decode vs an independent
    textbook geohash implementation."""
    import random

    rnd = random.Random(4242)
    B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

    def ref_encode(lat, lon, p):
        lalo, lahi, lolo, lohi = -90.0, 90.0, -180.0, 180.0
        bits = []
        for i in range(5 * p):
            if i % 2 == 0:
                mid = (lolo + lohi) / 2
                if lon >= mid:
                    bits.append(1); lolo = mid
                else:
                    bits.append(0); lohi = mid
            else:
                mid = (lalo + lahi) / 2
                if lat >= mid:
                    bits.append(1); lalo = mid
                else:
                    bits.append(0); lahi = mid
        return "".join(
            B32[int("".join(map(str, bits[i * 5 : i * 5 + 5])), 2)]
            for i in range(p)
        )

    pts = [
        (i, rnd.uniform(-90, 90), rnd.uniform(-180, 180)) for i in range(300)
    ]
    df = spark.createDataFrame(pts, "i long, lat double, lon double")
    got = {
        r.i: (r.g7, (r.c.lon, r.c.lat))
        for r in df.select(
            "i",
            kql.geo_point_to_geohash("lon", "lat", 7).alias("g7"),
            kql.geo_geohash_to_central_point(
                kql.geo_point_to_geohash("lon", "lat", 7)
            ).alias("c"),
        ).collect()
    }
    for i, lat, lon in pts:
        g = ref_encode(lat, lon, 7)
        assert got[i][0] == g, (i, lat, lon)
        # decode(encode(p)) cell must contain the original point
        clon, clat = got[i][1]
        assert abs(clon - lon) < 360 / 2**17 and abs(clat - lat) < 180 / 2**17


def test_series_fir_fuzz_against_numpy(spark):
    """Interior points of a trailing FIR must equal numpy's convolution."""
    import numpy as np

    rng = np.random.default_rng(7)
    xs = rng.uniform(-5, 5, size=40).round(6).tolist()
    coefs = [0.5, 1.25, -2.0]
    df = spark.createDataFrame([(xs,)], "s array<double>")
    got = df.select(
        kql.series_fir("s", coefs, normalize=False).alias("y")
    ).first().y
    # numpy 'full' convolution: out[i] = sum_j coefs[j] * x[i-j]
    want = np.convolve(np.array(xs), np.array(coefs))[: len(xs)]
    for i in range(2, len(xs)):  # interior: full taps available
        assert abs(got[i] - want[i]) < 1e-9, i


def test_series_decompose_forecast_line_and_season(spark):
    # perfectly linear series: forecast continues the line exactly
    rows = [("k", i, 2.0 * i + 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, d long, v double")
    out = {
        r.position: r.forecast
        for r in kql.series_decompose_forecast(df, "v", "d", ["g"], 5, 3).collect()
    }
    assert set(out) == {10, 11, 12}
    for p, f in out.items():
        assert abs(f - (2.0 * p + 1.0)) < 1e-9
    # pure oscillation (period 2, zero trend): pattern repeats
    rows2 = [("k", i, 10.0 if i % 2 == 0 else 0.0) for i in range(8)]
    df2 = spark.createDataFrame(rows2, "g string, d long, v double")
    out2 = {
        r.position: r.forecast
        for r in kql.series_decompose_forecast(df2, "v", "d", ["g"], 2, 2).collect()
    }
    # the fitted line absorbs a small tilt (even positions come first in a
    # finite window), so assert the preserved OSCILLATION, not exact levels
    assert out2[8] - out2[9] > 8.0, "high/low phase alternation survives"
    assert 0.0 < (out2[8] + out2[9]) / 2 < 10.0, "forecast stays in range"


def test_conditional_collection_aggs(spark):
    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 95.0), ("a", 3, 99.0), ("a", 3, 99.0)],
        "g string, id long, v double",
    )
    r = df.groupBy("g").agg(
        kql.make_list_if(F.col("id"), F.col("v") > 90).alias("l"),
        kql.make_set_if(F.col("id"), F.col("v") > 90).alias("s"),
        kql.take_anyif(F.col("id"), F.col("v") > 90).alias("any_"),
        kql.take_anyif(F.col("id"), F.col("v") > 1000).alias("none_"),
        kql.percentiles_array(F.col("v"), 0, 100).alias("p"),
    ).first()
    assert r.l == [2, 3, 3], "list keeps duplicates, sorted"
    assert r.s == [2, 3], "set dedups"
    assert r.any_ == 2 and r.none_ is None
    assert r.p == [5.0, 99.0]


def test_string_distance_scalars(spark):
    df = spark.sql("SELECT 'kitten' AS a, 'sitting' AS b, '' AS e")
    r = df.select(
        kql.edit_distance("a", "b").alias("d"),
        F.round(kql.string_similarity("a", "b"), 4).alias("s"),
        kql.string_similarity("e", "e").alias("both_empty"),
        kql.soundex_kql(F.lit("Robert")).alias("x1"),
        kql.soundex_kql(F.lit("Rupert")).alias("x2"),
    ).first()
    assert r.d == 3, "classic kitten->sitting"
    assert abs(r.s - (1 - 3 / 7)) < 1e-4
    assert r.both_empty == 1.0
    assert r.x1 == r.x2 == "R163"


def test_bag_round2_and_repeat(spark):
    df = spark.sql("""SELECT '{"b":"2","a":"1"}' AS bag""")
    r = df.select(
        kql.bag_has_key("bag", "a").alias("h"),
        kql.bag_has_key("bag", "x").alias("m"),
        kql.bag_has_key(F.lit(None).cast("string"), "a").alias("nul"),
        kql.bag_set_key("bag", "c", F.lit(3)).alias("ins"),
        kql.bag_set_key("bag", "a", F.lit("9")).alias("upd"),
        kql.bag_set_key(F.lit("junk"), "k", F.lit("v")).alias("from_bad"),
        kql.repeat_kql(F.lit(7), 3).alias("r3"),
        kql.repeat_kql(F.lit(7), 0).alias("r0"),
        kql.repeat_kql(F.lit(7), -2).alias("rneg"),
    ).first()
    assert (r.h, r.m, r.nul) == (True, False, False)
    assert r.ins == '{"a":"1","b":"2","c":"3"}', "sorted rebuild"
    assert r.upd == '{"a":"9","b":"2"}'
    assert r.from_bad == '{"k":"v"}', "malformed bag treated as empty"
    assert r.r3 == [7, 7, 7] and r.r0 == [] and r.rneg == []


def test_math_suite_scalars(spark):
    import math

    df = spark.sql("SELECT 1 AS x")
    r = df.select(
        kql.gamma_kql(F.lit(5.0)).alias("g5"),
        kql.gamma_kql(F.lit(0.5)).alias("gh"),
        kql.gamma_kql(F.lit(-1.0)).alias("pole"),
        kql.loggamma(F.lit(10.0)).alias("lg"),
        kql.exp2(F.lit(10.0)).alias("e"),
        kql.log2_kql(F.lit(8.0)).alias("l"),
        kql.pi_kql().alias("p"),
    ).first()
    assert r.g5 == 24.0, "gamma(5) = 4!"
    assert abs(r.gh - math.sqrt(math.pi)) < 1e-12
    assert r.pole is None
    assert abs(r.lg - math.lgamma(10.0)) < 1e-12
    assert r.e == 1024.0 and r.l == 3.0
    assert r.p == math.pi


def test_simple_scalar_sweep(spark):
    """Touch the simple scalars that only ever ran indirectly."""
    df = spark.sql(
        "SELECT timestamp'2024-03-05 07:08:09' AS t, array(1, 2, 3) AS a, "
        "array(2, 3, 4) AS b, '42' AS s"
    )
    r = df.select(
        kql.startofday("t").alias("sod"),
        kql.endofday("t").alias("eod"),
        kql.startofmonth("t").alias("som"),
        kql.getmonth("t").alias("mo"),
        kql.array_avg("a").alias("avg_"),
        F.array_join(kql.array_concat_kql("a", "b").cast("array<string>"), ",").alias("cat"),
        F.array_join(kql.set_union_arr("a", "b").cast("array<string>"), ",").alias("un"),
        F.array_join(kql.pack_array(F.lit(1), F.lit(2)).cast("array<string>"), ",").alias("pk"),
        kql.bag_pack("k1", F.lit("v1"), "k2", F.lit("2")).alias("bp"),
        kql.tolong(F.col("s")).alias("lg"),
        kql.todouble(F.col("s")).alias("db"),
    ).first()
    assert str(r.sod) == "2024-03-05 00:00:00"
    assert str(r.eod).startswith("2024-03-05 23:59:59")
    assert str(r.som).startswith("2024-03-01")
    assert r.mo == 3
    assert r.avg_ == 2.0
    assert r.cat == "1,2,3,2,3,4"
    assert set(r.un.split(",")) == {"1", "2", "3", "4"}
    assert r.pk == "1,2"
    assert '"k1":"v1"' in r.bp
    assert r.lg == 42 and r.db == 42.0
    # ago() is now()-relative; just check it's in the past
    past = spark.sql("SELECT 1").select(kql.ago("1 HOUR").alias("p"), kql.now().alias("n")).first()
    assert past.p < past.n


def test_parse_ipv4_fuzz_against_stdlib(spark):
    """300 seeded-random candidate strings (valid + malformed) vs the
    stdlib ipaddress module."""
    import ipaddress
    import random

    rnd = random.Random(1717)
    cases = []
    for i in range(300):
        kind = i % 5
        if kind == 0:
            s = ".".join(str(rnd.randint(0, 255)) for _ in range(4))
        elif kind == 1:
            s = ".".join(str(rnd.randint(0, 400)) for _ in range(4))  # maybe bad
        elif kind == 2:
            s = ".".join(str(rnd.randint(0, 255)) for _ in range(rnd.choice([3, 5])))
        elif kind == 3:
            s = "1.2.3." + rnd.choice(["x", "-1", "04", "255"])
        else:
            s = rnd.choice(["", " 1.2.3.4", "1.2.3.4 ", "1..2.3", "a.b.c.d"])
        cases.append((i, s))
    df = spark.createDataFrame(cases, "i long, s string")
    got = {
        r.i: r.v
        for r in df.select("i", kql.parse_ipv4("s").alias("v")).collect()
    }
    for i, s in cases:
        try:
            want = int(ipaddress.IPv4Address(s))
        except (ipaddress.AddressValueError, ValueError):
            want = None
        # one documented divergence: stdlib rejects leading zeros ('04'),
        # our parser (like KQL) reads them as decimal
        if want is None and got[i] is not None:
            parts = s.split(".")
            assert len(parts) == 4 and all(
                p.isdigit() and int(p) <= 255 for p in parts
            ), (i, s, got[i])
        else:
            assert got[i] == want, (i, s)


def test_series_fill_const(spark):
    df = spark.sql("SELECT array(1.0d, CAST(NULL AS DOUBLE), 3.0d) AS s")
    r = df.select(
        kql.series_fill_const("s", -1.0).alias("f"),
        kql.series_fill_const("s").alias("z"),
    ).first()
    assert r.f == [1.0, -1.0, 3.0]
    assert r.z == [1.0, 0.0, 3.0]


def test_series_suite2_semantics(spark):
    df = spark.sql(
        "SELECT array(3.0d, 1.0d, 2.0d) AS a, array(2.0d, 0.0d, 10.0d) AS b"
    )
    r = df.select(
        kql.series_sum("a").alias("s"),
        kql.series_avg("a").alias("m"),
        kql.series_min("a").alias("mn"),
        kql.series_max("a").alias("mx"),
        kql.series_dot_product("a", "b").alias("dot"),
        kql.series_magnitude("b").alias("mag"),
        kql.series_exp("a").alias("e"),
        kql.series_log("b").alias("lg"),
        kql.series_pow("a", "b").alias("pw"),
    ).first()
    assert (r.s, r.m, r.mn, r.mx) == (6.0, 2.0, 1.0, 3.0)
    assert r.dot == 3.0 * 2.0 + 0.0 + 20.0
    assert abs(r.mag - (4 + 0 + 100) ** 0.5) < 1e-12
    assert abs(r.e[0] - math.exp(3.0)) < 1e-12
    assert r.lg[1] is None, "log of non-positive -> NULL"
    assert abs(r.lg[2] - math.log(10.0)) < 1e-12
    assert r.pw == [9.0, 1.0, 1024.0]


def test_pivot_kql_semantics(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 5.0), ("a", "x", 3.0)],
        "g string, p string, v double",
    )
    out = kql.pivot_kql(df, "p", "v", agg="sum", group_cols=["g"])
    rows = {r.g: r for r in out.collect()}
    assert out.columns == ["g", "x", "y"], "value-sorted column order"
    assert rows["a"].x == 4.0 and rows["a"].y == 2.0
    assert rows["b"].x == 5.0 and rows["b"].y is None, "missing combo -> NULL"
    # explicit values pin width and order regardless of data
    out2 = kql.pivot_kql(df, "p", "v", group_cols=["g"], values=["y", "x", "z"])
    assert out2.columns == ["g", "y", "x", "z"]
    assert {r.g: r.z for r in out2.collect()} == {"a": None, "b": None}


def test_percentile_tdigest_accuracy(spark):
    df = spark.range(10001).select(F.col("id").cast("double").alias("v"))
    r = df.agg(
        kql.percentile_tdigest("v", 0.5).alias("p50"),
        kql.percentile_tdigest("v", 0.99).alias("p99"),
    ).first()
    assert abs(r.p50 - 5000.0) <= 5, "rank error bounded by N/accuracy"
    assert abs(r.p99 - 9900.0) <= 5


def test_parse_kv_semantics(spark):
    df = spark.sql(
        "SELECT 'ts=2024 msg=\"disk full now\" level=warn' AS s"
    )
    r = df.select(
        kql.parse_kv("s", ["ts", "msg", "level", "absent"]).alias("kv")
    ).first()
    assert r.kv.ts == "2024"
    assert r.kv.msg == "disk full now", "quoted value keeps the delimiter"
    assert r.kv.level == "warn"
    assert r.kv.absent is None, "missing key -> NULL"


def test_punycode_roundtrip(spark):
    df = spark.createDataFrame(
        [("münchen",), ("bücher",), ("plain",), ("",)], "s string"
    )
    out = df.select(
        "s",
        kql.punycode_from_string("s").alias("enc"),
    ).withColumn("back", kql.punycode_to_string(F.col("enc")))
    rows = {r.s: r for r in out.collect()}
    assert rows["münchen"].enc == "mnchen-3ya"
    assert rows["münchen"].back == "münchen"
    assert rows["bücher"].back == "bücher"
    assert rows["plain"].enc == "plain-"
    dom = df.select(
        kql.punycode_domain_from_string(F.lit("münchen.example.com")).alias("d")
    ).first()
    assert dom.d == "xn--mnchen-3ya.example.com"
    bad = df.select(kql.punycode_to_string(F.lit("münchen")).alias("x")).first()
    assert bad.x is None, "non-ascii punycode input -> NULL"


def test_parse_kv_edges(spark):
    df = spark.sql("SELECT 'tid=9 id=5 empty= last=end' AS s")
    r = df.select(
        kql.parse_kv("s", ["id", "tid", "empty", "last"]).alias("kv")
    ).first()
    assert r.kv.id == "5", "key must not match inside a longer key (tid)"
    assert r.kv.tid == "9"
    assert r.kv.empty == "", "k= with nothing before delimiter -> empty"
    assert r.kv.last == "end", "value at end of string"


def test_pivot_kql_null_pivot_values(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", None, 9.0), ("b", "x", 2.0)],
        "g string, p string, v double",
    )
    out = kql.pivot_kql(df, "p", "v", group_cols=["g"])
    assert out.columns == ["g", "x"], "NULL pivot values are not columns"
    rows = {r.g: r.x for r in out.collect()}
    assert rows == {"a": 1.0, "b": 2.0}


def test_punycode_edge_labels(spark):
    r = (
        spark.range(1)
        .select(
            kql.punycode_domain_from_string(F.lit("all.ascii.com")).alias("a"),
            kql.punycode_from_string(F.lit("")).alias("e"),
            kql.punycode_domain_from_string(F.lit("")).alias("ed"),
        )
        .first()
    )
    assert r.a == "all.ascii.com", "pure-ASCII domains pass through"
    assert r.e == "" or r.e == "-"
    assert r.ed == ""


def test_series_seasonal_period_longer_than_series(spark):
    """period > len(series): empty phases must not crash the job
    (element_at index-0 guard) — out-of-range phases are simply never
    referenced by the output."""
    df = spark.sql("SELECT array(1.0d, 2.0d, 3.0d) AS s")
    row = df.select(kql.series_seasonal("s", 7).alias("y")).first()
    assert row.y == [1.0, 2.0, 3.0]


def test_parse_kv_multichar_pair_delimiter(spark):
    """A multi-char delimiter must bound bare values as a whole string:
    'hello world' contains a space (one char of ', ') but not ', '."""
    df = spark.sql("SELECT 'a=1, b=hello world, c=\"x, y\"' AS s")
    r = df.select(
        kql.parse_kv("s", ["a", "b", "c"], pair_delimiter=", ").alias("kv")
    ).first()
    assert r.kv.a == "1"
    assert r.kv.b == "hello world", "bare value stops at the FULL delimiter"
    assert r.kv.c == "x, y", "quoted value may contain the delimiter"


def test_pivot_kql_width_valve(spark):
    df = spark.range(50).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("p"), F.col("id")).alias("p"),
        F.col("id").cast("double").alias("v"),
    )
    with pytest.raises(ValueError, match="distinct values"):
        kql.pivot_kql(df, "p", "v", group_cols=["g"], max_values=10)
    # explicit values bypass the probe entirely
    out = kql.pivot_kql(df, "p", "v", group_cols=["g"], values=["p1", "p2"], max_values=10)
    assert out.columns == ["g", "p1", "p2"]


def test_evaluate_python_plugin(spark):
    """ADX `evaluate python()` contract: df in, result out, schema from
    the typeof spec; partition-local execution."""
    df = spark.range(100).select(
        F.col("id").alias("x"), (F.col("id") % 7).alias("g")
    )
    out = kql.evaluate_python(
        df,
        "result = pd.DataFrame({'g': df['g'], 'y': df['x'] * 2 + 1})",
        "g long, y long",
    )
    rows = out.groupBy("g").agg(F.sum("y").alias("s")).collect()
    want = {}
    for i in range(100):
        want[i % 7] = want.get(i % 7, 0) + 2 * i + 1
    assert {r.g: r.s for r in rows} == want

    import pytest as _pt

    bad = kql.evaluate_python(df, "x = 1", "g long, y long")
    with _pt.raises(Exception, match="result"):
        bad.collect()


def test_ipv6_lookup_containment(spark):
    nets = spark.createDataFrame(
        [
            ("2001:db8::/32", "doc"),
            ("2001:db8:1::/48", "sub"),
            ("2001:da8::/29", "odd"),     # non-nibble-aligned prefix
            ("badnet", "junk"),
        ],
        "network string, name string",
    )
    ips = spark.createDataFrame(
        [
            (1, "2001:db8:1::5"),      # doc + sub
            (2, "2001:db8:2::5"),      # doc only
            (3, "2001:daf::1"),        # outside /29: 7th nibble 'b'... no —
                                       # 'daf' shares '20010da', digit f>>3=1 -> match
            (4, "2001:da9::1"),        # odd: da9 shares 7 nibbles + top bit of 9
            (5, "2001:da0::1"),        # 7 nibbles agree but 0>>3=0 != 1 -> none
            (6, "not-an-ip"),          # none
        ],
        "id long, ip string",
    )
    out = kql.ipv6_lookup(ips, nets, "ip")
    got = sorted((r.id, r.name) for r in out.collect())
    # /29 of 2001:da8:: = first 7 hex digits '20010da' + top bit of the
    # 8th digit (8>>3 = 1): da8..daf match, da0..da7 and db* do not
    assert got == sorted(
        [(1, "doc"), (1, "sub"), (2, "doc"), (3, "odd"), (4, "odd")]
    ), got


def test_parse_where_drops_nonmatching(spark):
    df = spark.createDataFrame(
        [(1, "Customer#000001"), (2, "garbage"), (3, "Customer#000042")],
        "id long, s string",
    )
    out = kql.parse_where(df, "s", "Customer#", ("cnum", "long"))
    got = sorted((r.id, r.cnum) for r in out.collect())
    assert got == [(1, 1), (3, 42)], "non-matching row dropped, captures typed"
    # plain parse keeps the garbage row (null capture)
    kept = kql.parse_pattern(df, "s", "Customer#", ("cnum", "long"))
    assert kept.count() == 3


def test_getschema_metadata(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "x long, s string, v double")
    rows = kql.getschema(df).collect()
    assert [(r.ColumnName, r.ColumnOrdinal, r.DataType) for r in rows] == [
        ("x", 0, "bigint"), ("s", 1, "string"), ("v", 2, "double"),
    ]


def test_parse_ipv6_fuzz_vs_stdlib(spark):
    """Property: canonicalization agrees with the stdlib ipaddress module
    on valid addresses (compressed AND exploded forms) and rejects what
    the subset documents (no embedded IPv4)."""
    import ipaddress
    import random as _random

    rng = _random.Random(97)
    addrs = [ipaddress.IPv6Address(rng.getrandbits(128)) for _ in range(60)]
    rows = []
    for a in addrs:
        want = a.exploded.replace(":", "")
        rows.append((a.compressed, want))
        rows.append((a.exploded, want))
    df = spark.createDataFrame(rows, "s string, want string")
    out = df.select("want", kql.parse_ipv6("s").alias("got")).collect()
    for r in out:
        assert r.got == r.want, (r.got, r.want)
    bad = spark.createDataFrame(
        [("1:2:3:4:5:6:7:8:9",), ("::1::2",), ("g::1",), ("",)], "s string"
    )
    assert all(
        r.got is None for r in bad.select(kql.parse_ipv6("s").alias("got")).collect()
    )


def test_series_fit_poly_recovers_coefficients(spark):
    """Exact quadratic input recovers (c0, c1, c2) with rss 0; short and
    degenerate inputs yield NULL."""
    vals = [3 + 2 * x + 0.5 * x * x for x in range(8)]
    df = spark.sql(
        "SELECT array(" + ",".join(f"{v}d" for v in vals) + ") AS s"
    )
    r = df.select(kql.series_fit_poly("s").alias("f")).first()
    assert r.f.asDict() == {"c0": 3.0, "c1": 2.0, "c2": 0.5, "rss": 0.0}
    short = spark.sql("SELECT array(1.0d, 2.0d) AS s").select(
        kql.series_fit_poly("s").alias("f")
    ).first()
    assert short.f is None
    import pytest as _pt
    with _pt.raises(ValueError):
        kql.series_fit_poly("s", degree=3)


def test_find_in_cross_table_search(spark):
    """find: per-table string search, schema union with null padding,
    source_ tag; explicit-predicate mode; arg validation."""
    a = spark.createDataFrame(
        [(1, "alpha Bravo", 10.0), (2, "charlie", 20.0)], "id long, txt string, v double"
    )
    b = spark.createDataFrame(
        [(3, "BRAVO delta"), (4, "echo")], "id long, note string"
    )
    out = kql.find_in({"a": a, "b": b}, term="bravo")
    rows = {(r.source_, r.id): r for r in out.collect()}
    assert set(rows) == {("a", 1), ("b", 3)}
    assert rows[("a", 1)].txt == "alpha Bravo" and rows[("a", 1)].note is None
    assert rows[("b", 3)].note == "BRAVO delta" and rows[("b", 3)].v is None
    # predicate mode applies the same Column to every table
    out2 = kql.find_in({"a": a, "b": b}, predicate=F.col("id") >= 2)
    assert sorted((r.source_, r.id) for r in out2.collect()) == [
        ("a", 2), ("b", 3), ("b", 4),
    ]
    # project keeps only named columns present per table
    out3 = kql.find_in({"a": a, "b": b}, term="bravo", project=["txt", "note"])
    assert out3.columns == ["source_", "txt", "note"]
    import pytest as _pt
    with _pt.raises(ValueError):
        kql.find_in({"a": a}, term="x", predicate=F.lit(True))
    with _pt.raises(ValueError):
        kql.find_in({"a": a})


def test_heavy_hitters_sketch_replays_reference_algorithm(spark):
    """Spark's per-bucket SpaceSaving == a reference Python replay (same
    sorted order + tie-break), and the capture/bound guarantees hold."""
    import hashlib

    K, B, SALT = 3, 2, "kpf-hh"
    items = ["a"] * 10 + ["b"] * 6 + [c for c in "cdefghij"]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    out = kql.heavy_hitters_sketch(df, "item", k=K, n_buckets=B, salt=SALT)
    got = {(r.bucket, r.item): (r.est, r.err) for r in out.collect()}

    def bucket_of(it):
        h = hashlib.md5(f"{SALT}|{it}".encode()).hexdigest()[:8]
        return int(h, 16) % B

    # reference replay per bucket
    expect = {}
    from collections import Counter
    for b in range(B):
        seq = sorted(i for i in items if bucket_of(i) == b)
        counters = {}
        for item in seq:
            if item in counters:
                counters[item][0] += 1
            elif len(counters) < K:
                counters[item] = [1, 0]
            else:
                evict = max(counters, key=lambda it: (-counters[it][0], it))
                m = counters.pop(evict)[0]
                counters[item] = [m + 1, m]
        for it, (e, r) in counters.items():
            expect[(b, it)] = (e, r)
    assert got == expect
    # guarantees: per bucket, any item with true > N_b/K captured in-bounds
    true = Counter(items)
    for b in range(B):
        nb = sum(c for i, c in true.items() if bucket_of(i) == b)
        for i, c in true.items():
            if bucket_of(i) == b and c * K > nb:
                est, err = got[(b, i)]
                assert c <= est <= c + nb // K, (i, c, est, nb)
    # bounded summary width
    from collections import defaultdict
    per_bucket = defaultdict(int)
    for (b, _i) in got:
        per_bucket[b] += 1
    assert all(v <= K for v in per_bucket.values())


def test_pagerank_converges_to_analytic_fixed_point(spark):
    """A->B, A->C, B->C, C->A with d=0.85: 60 rounds reach the analytic
    stationary point; mass is conserved with dangling handling; weighted
    out-edges split contributions proportionally."""
    e = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")], "src string, dst string"
    )
    r = {x.node: x.rank for x in kql.pagerank(e, iterations=60).collect()}
    assert r["A"] == pytest.approx(0.387789, abs=1e-4)
    assert r["B"] == pytest.approx(0.214810, abs=1e-4)
    assert r["C"] == pytest.approx(0.397401, abs=1e-4)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    # dangling node: B has no out-edges; mass conserved only when handled
    e2 = spark.createDataFrame([("A", "B")], "src string, dst string")
    with_d = {x.node: x.rank for x in kql.pagerank(e2, iterations=30).collect()}
    assert sum(with_d.values()) == pytest.approx(1.0, abs=1e-9)
    no_d = {
        x.node: x.rank
        for x in kql.pagerank(e2, iterations=30, handle_dangling=False).collect()
    }
    assert sum(no_d.values()) < 0.7
    # weighted: A->B w=3, A->C w=1 -> after 1 round B gets 3x C's contrib
    e3 = spark.createDataFrame(
        [("A", "B", 3.0), ("A", "C", 1.0)], "src string, dst string, w double"
    )
    one = {
        x.node: x.rank
        for x in kql.pagerank(
            e3, weight_col="w", iterations=1, handle_dangling=False
        ).collect()
    }
    base = 0.15 / 3
    assert one["B"] - base == pytest.approx(3 * (one["C"] - base), rel=1e-9)


def test_scalar_suite9_functions(spark):
    """todecimal overflow->null, reverse, extract_json typed, and
    base64_decode_toarray byte values."""
    df = spark.createDataFrame(
        [("QUJD", "abc", '{"x": {"y": 7}}')], "b64 string, s string, js string"
    )
    r = df.select(
        kql.base64_decode_toarray("b64").alias("arr"),
        kql.reverse_kql("s").alias("rev"),
        kql.extract_json("$.x.y", F.col("js"), cast_to="long").alias("v"),
        kql.todecimal(F.lit("12.5")).cast("double").alias("d"),
        kql.todecimal(F.lit("not-a-number")).alias("bad"),
    ).first()
    assert r.arr == [65, 66, 67]  # "ABC"
    assert r.rev == "cba" and r.v == 7 and r.d == 12.5 and r.bad is None


def test_welch_test_pinned_against_t_table(spark):
    """welch_test p-values match classic t-table constants; equal groups
    give t=0, p=1; tiny groups raise."""
    # p(|t| >= 2.228, df=10) = 0.05 (two-sided t-table)
    assert abs(kql._t_sf_two_sided(2.228, 10.0) - 0.05) < 1e-3
    assert abs(kql._t_sf_two_sided(2.086, 20.0) - 0.05) < 1e-3
    assert abs(kql._t_sf_two_sided(1.96, 1e9) - 0.05) < 1e-3
    assert kql._t_sf_two_sided(0.0, 5.0) == 1.0
    a = [(float(v), "a") for v in (1, 2, 3, 4, 5)]
    b = [(float(v), "b") for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(a + b, "v double, g string")
    r = kql.welch_test(df, "v", "g", "a", "b").first()
    assert r.t_stat == 0.0 and r.p_value == 1.0 and r.df_welch == 8.0
    shifted = spark.createDataFrame(
        a + [(v + 100.0, "b") for v, _ in b], "v double, g string"
    )
    r2 = kql.welch_test(shifted, "v", "g", "a", "b").first()
    assert r2.p_value < 1e-6 and r2.t_stat < -50
    import pytest as _pt
    tiny = spark.createDataFrame([(1.0, "a"), (2.0, "b")], "v double, g string")
    with _pt.raises(ValueError, match=">= 2 samples"):
        kql.welch_test(tiny, "v", "g", "a", "b")


def test_series_fft_matches_numpy(spark):
    """fft values equal numpy's; ifft round-trips to the input."""
    import numpy as np

    vals = [1.0, 2.0, -1.0, 0.5, 3.0, -2.0, 0.0, 1.5]
    df = spark.createDataFrame([(vals,)], "s array<double>")
    r = df.select(kql.series_fft("s").alias("f")).first().f
    z = np.fft.fft(np.array(vals))
    assert np.allclose(r.re, z.real) and np.allclose(r.im, z.imag)
    rt = (
        df.select(kql.series_fft("s").alias("f"))
        .select(kql.series_ifft(F.col("f.re"), F.col("f.im")).alias("b"))
        .first()
        .b
    )
    assert np.allclose(rt.re, vals) and np.allclose(rt.im, 0.0)


def test_graph_mark_components_keeps_isolated_and_selfloop_nodes(spark):
    """Components are min-id labeled; self-loop-only nodes survive as
    their own component (KQL semantics, unlike the dedup CC)."""
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 5), (7, 8)], "src long, dst long"
    )
    out = {r.node: r.component for r in kql.graph_mark_components(e).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 8: 7}


def test_heavy_hitters_two_level_guarantees(spark):
    """Two-level (partition-parallel) SpaceSaving: every globally heavy
    item is captured with true <= est <= true + N_b/k regardless of
    partitioning; forced repartitions agree on capture."""
    import hashlib
    from collections import Counter

    K, B, SALT = 4, 2, "kpf-hh"
    # skewed: x dominates, y moderate, long tail of singletons
    items = ["x"] * 400 + ["y"] * 120 + [f"t{i}" for i in range(80)]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    true = Counter(items)

    def bucket_of(it):
        h = hashlib.md5(f"{SALT}|{it}".encode()).hexdigest()[:8]
        return int(h, 16) % B

    nb = {b: sum(c for i, c in true.items() if bucket_of(i) == b) for b in range(B)}
    for parts in (3, 11):
        out = kql.heavy_hitters_sketch(
            df.repartition(parts), "item", k=K, n_buckets=B, two_level=True
        ).collect()
        got = {(r.bucket, r.item): r.est for r in out}
        per_bucket = Counter(b for b, _ in got)
        assert all(v <= K for v in per_bucket.values())
        for it, c in true.items():
            b = bucket_of(it)
            if c * K > nb[b]:  # globally heavy in its bucket
                assert (b, it) in got, (parts, it)
                est = got[(b, it)]
                assert c <= est <= c + nb[b] // K, (parts, it, c, est)


def test_graph_triangles_hand_counted(spark):
    """Hand-verifiable graphs: K4 (every node in C(3,2)=3 triangles),
    a 4-cycle (none), a star (none — hubs alone make no triangles), and
    direction/duplicate/self-loop noise collapsing first."""
    from kusto_pre_forge_spark.operators.kql import graph_triangles

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noise = [(1, 0), (2, 2), (0, 1)]  # reverse dup, self-loop, dup
    df = spark.createDataFrame(k4 + noise, "src long, dst long")
    got = {r.node: r.triangles for r in graph_triangles(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    ring = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    assert graph_triangles(ring).count() == 0

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "src long, dst long"
    )
    assert graph_triangles(star).count() == 0

    # one triangle hanging off a hub: only its three members count
    tri_on_star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)] + [(1, 2)], "src long, dst long"
    )
    got2 = {r.node: r.triangles for r in graph_triangles(tri_on_star).collect()}
    assert got2 == {0: 1, 1: 1, 2: 1}


def test_label_propagation_communities(spark):
    """Synchronous LPA with min-label ties: two 4-cliques joined by one
    bridge edge resolve to two communities (each labeled by its min id);
    an isolated node keeps its own label; the result is deterministic
    round-for-round."""
    from kusto_pre_forge_spark.operators.kql import label_propagation

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.label for r in label_propagation(e, n_iter=4).collect()
    }
    assert {got[n] for n in (1, 2, 3)} == {1}
    assert {got[n] for n in (11, 12, 13)} == {10}
    # the bridge endpoints join their own cliques (clique majority beats
    # the single cross edge)
    assert got[4] == 1 and got[10] == 10

    # isolated node: self-loop-free singleton keeps its own label
    e2 = spark.createDataFrame(edges + [(99, 99)], "src long, dst long")
    got2 = {
        r.node: r.label for r in label_propagation(e2, n_iter=2).collect()
    }
    assert got2[99] == 99


def test_scan_accumulate_global_negative_values(spark):
    """ADVICE r14 (high): the global (by=[]) rebase must take each
    segment's base from its FIRST row's exclusive prefix, not the minimum
    prefix in the segment — with negative accumulated values the minimum
    can occur mid-segment and every running sum silently shifts."""
    vals = [-3.0 if i % 4 == 0 else float(i % 7 - 3) for i in range(200)]
    df = spark.createDataFrame(
        [(i, v, i % 50 == 0) for i, v in enumerate(vals)],
        "x long, v double, flag boolean",
    ).repartition(8)
    out = kql.scan_accumulate(
        df, by=[], order=["x"], value="v", restart=F.col("flag")
    )
    got = {r["x"]: r["scan_sum"] for r in out.collect()}
    s = 0.0
    for i, v in enumerate(vals):  # sequential replay is the truth
        if i % 50 == 0:
            s = 0.0
        s += v
        assert got[i] == pytest.approx(s), f"row {i}"


def test_scan_steps_keyed_machine(spark):
    """kql.scan_steps keyed form (r14): the sequential state machine
    runs per key via applyInPandas — one hash exchange, each key's rows
    one task. Per-key session labeling with a state-reading condition."""
    rows = [
        ("a", 0, 1.0), ("a", 10, 2.0), ("a", 100, 3.0),
        ("b", 5, 4.0), ("b", 200, 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    steps = [
        ("start", lambda env: True, [("last_t", lambda env: env["t"]),
                                     ("n", lambda env: 1)]),
        ("cont",
         lambda env: env["last_t"] is not None
         and env["t"] - env["last_t"] <= 50,
         [("last_t", lambda env: env["t"]),
          ("n", lambda env: env["n"] + 1)]),
    ]
    out = kql.scan_steps(
        df, order=[("t", True)], steps=steps,
        declare={"last_t": (None, "bigint"), "n": (0, "bigint")},
        by=["k"], match_name="sid",
    )
    got = sorted((r.k, r.t, r.n, r.sid) for r in out.collect())
    assert got == [
        ("a", 0, 1, 0), ("a", 10, 2, 0), ("a", 100, 1, 1),
        ("b", 5, 1, 0), ("b", 200, 1, 1),
    ]
    # keyed form plans one hash exchange on the key, not SinglePartition
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

"""The emitted-KQL operator layer (SURVEY §2.5).

The reference delegates all relational work to Kusto; this module provides
native Spark implementations of every KQL construct the reference emits,
with KQL-faithful semantics. Emission sites cited per function — e.g. the
partitioning-config query ``... | project ... | where ... | mv-expand ...``
at code/KustoPreForgeLib/EtlRun.cs:150-164, the shard-tracking queries at
code/IntegrationTests/TestBase.cs:308-336, and the invariant assertions at
code/IntegrationTests/Text/NoHeaderNoCompressionTest.cs:19-51.

Everything here is a thin, lazily-composed wrapper over DataFrame ops —
Catalyst sees through all of it (predicate pushdown, column pruning, codegen
still apply). Nothing collects; nothing drops to Python row loops.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# tabular operators
# --------------------------------------------------------------------------


def project(df: DataFrame, **cols: Column | str) -> DataFrame:
    """KQL ``project a = expr, b`` — select/rename/compute.

    Emitted at EtlRun.cs:153-159 and TestBase.cs:316,331.
    """
    return df.select(*[(F.col(c) if isinstance(c, str) else c).alias(name) for name, c in cols.items()])


def where(df: DataFrame, predicate: Column | str) -> DataFrame:
    """KQL ``where pred`` — emitted at EtlRun.cs:155, TestBase.cs:313,330."""
    return df.filter(predicate)


def extend(df: DataFrame, **cols: Column) -> DataFrame:
    """KQL ``extend c = expr`` — computed columns (schema.kql:10-21)."""
    return df.withColumns(dict(cols))


def mv_expand(df: DataFrame, col: str, to: str | None = None) -> DataFrame:
    """KQL ``mv-expand c`` — explode an array/dynamic column row-wise.

    Emitted at EtlRun.cs:154, TestBase.cs:314,329. KQL drops rows whose
    array is empty/null — Spark's ``explode`` (not ``explode_outer``)
    matches that exactly.
    """
    out = to or col
    others = [c for c in df.columns if c != col]
    return df.select(*others, F.explode(F.col(col)).alias(out))


def mv_apply(df: DataFrame, col: str, inner, to: str | None = None) -> DataFrame:
    """KQL ``mv-apply c on (subquery)`` — per-row array subquery.

    Emitted at schema.kql:11-15. ``inner`` is a lambda over the element
    Column returning a Column; implemented with higher-order functions so
    it never explodes/regroups (no shuffle at all).
    """
    return df.withColumn(to or col, F.transform(F.col(col), inner))


def summarize(
    df: DataFrame,
    by: Sequence[str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """KQL ``summarize agg1 = f(x), ... by k1, k2``.

    Emitted at TestBase.cs:311,328 and NoHeaderNoCompressionTest.cs:25-33.
    Hash aggregate with map-side partial aggregation — the scalable default.
    """
    exprs = [c.alias(name) for name, c in aggs.items()]
    return df.groupBy(*by).agg(*exprs) if by else df.agg(*exprs)


def distinct_of(df: DataFrame, *cols: str) -> DataFrame:
    """KQL ``summarize by k`` ≡ ``distinct k`` (NoHeaderNoCompressionTest.cs:25-26)."""
    return df.select(*cols).distinct()


def count_rows(df: DataFrame, alias: str = "Count") -> DataFrame:
    """KQL ``count`` / ``toscalar(... | count)`` (NoHeaderNoCompressionTest.cs:26-34)."""
    return df.agg(F.count(F.lit(1)).alias(alias))


def take_any(col: Column | str) -> Column:
    """KQL ``take_any(x)`` aggregate — any value per group.

    Emitted at TestBase.cs:311,328. KQL picks an arbitrary value; we pin
    ``min`` so results are deterministic and oracle-checkable (any single
    value satisfies take_any's contract).
    """
    return F.min(col)


def take(df: DataFrame, n: int) -> DataFrame:
    """KQL ``take n`` — e.g. ``take 0`` at TestCaseConfiguration.cs:63."""
    return df.limit(n)


def top(df: DataFrame, n: int, by: Sequence[Column]) -> DataFrame:
    """KQL ``top n by expr`` — capability row in SURVEY §2.5 (sort/top-k).

    Spark's ``orderBy().limit()`` compiles to TakeOrderedAndProject: each
    task keeps a size-n heap, only n rows per task reach the driver-side
    merge — no global sort at any scale.
    """
    return df.orderBy(*by).limit(n)


def kql_range(spark: SparkSession, name: str, start: int, stop: int, step: int = 1) -> DataFrame:
    """KQL ``range x from a to b step s`` — inclusive bounds (schema.kql:6,9)."""
    return spark.range(start, stop + (1 if step > 0 else -1), step).withColumnRenamed("id", name)


# --------------------------------------------------------------------------
# scalar / aggregate functions
# --------------------------------------------------------------------------


def todynamic(col: Column | str) -> Column:
    """KQL ``todynamic(json)`` (EtlRun.cs:153) — parse to a VariantType.

    Spark 4's VARIANT is the dynamic type; path access via
    ``variant_get``. For fixed shapes prefer ``from_json`` with a schema.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_json(c)


def dynamic_get(col: Column, path: str, typ: str) -> Column:
    """Path access ``x.y.z`` on a dynamic value (EtlRun.cs:157-159)."""
    return F.try_variant_get(col, f"$.{path}", typ)


def json_path(col: Column | str, path: str) -> Column:
    """``todynamic(x).y`` shortcut over raw JSON text without variant."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}")


def tostring(c: Column) -> Column:
    """KQL ``tostring`` (EtlRun.cs:157-159)."""
    return c.cast("string")


def toint(c: Column) -> Column:
    """KQL ``toint`` — KQL returns null on unparsable input, as try_cast."""
    return c.try_cast("int")


def tolong(c: Column) -> Column:
    return c.try_cast("long")


def todouble(c: Column) -> Column:
    return c.try_cast("double")


def todatetime(c: Column) -> Column:
    """KQL ``todatetime`` (NoHeaderNoCompressionTest.cs:23)."""
    return c.try_cast("timestamp")


def has_term(col: Column | str, term: str) -> Column:
    """KQL ``x has "term"`` — whole-term, case-insensitive match.

    Emitted at TestBase.cs:313,330. KQL's ``has`` matches on token
    boundaries (alphanumeric runs), not substrings: "North has 'nor'" is
    false. Implemented as a case-insensitive regex with non-alphanumeric
    boundaries — stays in codegen (Java regex), no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    import re as _re

    pat = f"(?i)(^|[^a-zA-Z0-9]){_re.escape(term)}($|[^a-zA-Z0-9])"
    return c.rlike(pat)


def split_ix(col: Column | str, sep: str, ix: int) -> Column:
    """KQL ``split(s, sep)[i]`` (TestBase.cs:316,331).

    KQL split is a *literal* separator; Spark's F.split takes a regex, so
    the separator is quoted. Out-of-range index yields NULL in both —
    ``F.get`` (not ``[]``, which throws under ANSI mode).
    """
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    return F.get(F.split(c, _re.escape(sep)), ix)


def parse_csv(col: Column | str, schema: str) -> Column:
    """KQL ``parse_csv(line)`` (NoHeaderNoCompressionTest.cs:22).

    RFC-4180 quoting ("" escapes) to match CsvParseTransform.cs:64-82.
    Returns a struct; access fields positionally like KQL's array index.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.from_csv(c, schema, {"quote": '"', "escape": '"'})


def case_(*args: tuple[Column, Column] | Column) -> Column:
    """KQL ``case(pred1, val1, pred2, val2, ..., default)`` (schema.kql:18)."""
    *pairs, default = args
    expr: Column | None = None
    for pred, val in pairs:
        expr = F.when(pred, val) if expr is None else expr.when(pred, val)
    return default if expr is None else expr.otherwise(default)


def make_list(col: Column | str, sort: bool = True) -> Column:
    """KQL ``make_list(x)`` aggregate (schema.kql:8,14).

    KQL's list order is arrival order (nondeterministic under parallel
    scan); we sort by default so results are stable and oracle-checkable.
    """
    c = F.collect_list(col)
    return F.sort_array(c) if sort else c


def strcat(*cols: Column | str) -> Column:
    """KQL ``strcat(...)`` (schema.kql:16,20)."""
    return F.concat(*[F.lit(c) if isinstance(c, str) else c for c in cols])


def strcat_array(col: Column, sep: str) -> Column:
    """KQL ``strcat_array(arr, sep)`` (schema.kql:16)."""
    return F.array_join(col, sep)


def array_length(col: Column | str) -> Column:
    """KQL ``array_length`` (schema.kql:21)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(c)


def new_guid() -> Column:
    """KQL ``new_guid()`` (schema.kql:7). Nondeterministic by nature."""
    return F.expr("uuid()")


def now() -> Column:
    """KQL ``now()`` (schema.kql:19)."""
    return F.current_timestamp()


def datetime_add_seconds(ts: Column, seconds: Column) -> Column:
    """KQL ``ts - 1s * n`` arithmetic (schema.kql:19) — second granularity."""
    return F.timestamp_add("SECOND", seconds.cast("long"), ts)


def bin(col: Column, interval: str) -> Column:
    """KQL ``bin(ts, 1d)`` — time bucketing (standard KQL companion of
    summarize; Spark's date_trunc/window equivalent)."""
    return F.date_trunc(interval, col)


def print_expr(spark: SparkSession, **exprs: Column) -> DataFrame:
    """KQL ``print name = expr, ...`` — a one-row table of scalars
    (emission shape: the let/print invariant probes,
    code/IntegrationTests/Text/NoHeaderNoCompressionTest.cs:21-38)."""
    return spark.range(1).select(*[c.alias(n) for n, c in exprs.items()])


def toscalar(df: DataFrame) -> Column:
    """KQL ``toscalar(T)`` — first column of the first row as a scalar
    usable in another query (NoHeaderNoCompressionTest.cs:26-34). Spark
    form: a literal produced from a driver-evaluated 1×1 result; the input
    must already aggregate to one row (e.g. ``count_rows``)."""
    row = df.limit(1).collect()
    if not row:
        return F.lit(None)
    return F.lit(row[0][0])


def export_csv(
    df: DataFrame,
    prefix: str,
    size_limit_bytes: int | None = None,
    include_headers: bool = True,
    distribution: int | None = None,
) -> None:
    """KQL ``.export to csv (prefix) with (sizeLimit, includeHeaders,
    distribution)`` — the reference exports its 10M-row test dataset this
    way (code/IntegrationTests/TestBase.cs:397-408).

    Spark caps files by record count, not bytes, so ``sizeLimit``
    approximates via rows-per-file = limit / sampled-average-row-width
    (declared approximation, SURVEY §7 "What's hard" — the reference's own
    cap applies to compressed bytes and no test requires byte exactness).
    ``distribution`` ≡ per-node export parallelism → ``repartition(n)``.
    """
    writer_df = df
    opts: dict[str, str] = {"header": str(include_headers).lower()}
    if size_limit_bytes:
        sample = df.limit(1000).select(
            F.sum(F.octet_length(F.concat_ws(",", *df.columns))).alias("b"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        avg_row = (sample["b"] or 1) / max(sample["n"] or 1, 1) + 1
        opts["maxRecordsPerFile"] = str(max(int(size_limit_bytes / avg_row), 1))
    if distribution:
        writer_df = writer_df.repartition(distribution)
    writer_df.write.mode("overwrite").options(**opts).csv(prefix)


def dcount(col: Column | str, exact: bool = False) -> Column:
    """KQL ``dcount(col)`` — distinct count, approximate (HLL++) by
    default like Kusto's; ``exact=True`` for the precise variant (KQL's
    ``count_distinct``). The approximate form is the 100 TB default: one
    pass, fixed memory, mergeable sketch."""
    return F.count_distinct(F.col(col) if isinstance(col, str) else col) if exact \
        else F.approx_count_distinct(col)


def percentiles(col: Column | str, *ps: float, approx: bool = False) -> list[Column]:
    """KQL ``percentiles(col, p1, p2, ...)`` — exact linear-interpolation
    percentiles by default (KQL's percentiles are estimates; we expose the
    exact form for oracle-checkable results and ``approx=True`` —
    percentile_approx, fixed-memory, mergeable — as the 100 TB default)."""
    c = F.col(col) if isinstance(col, str) else col
    fn = F.percentile_approx if approx else F.percentile
    return [fn(c, p / 100.0).alias(f"p{int(p)}") for p in ps]


def extract(col: Column | str, pattern: str, group: int = 0) -> Column:
    """KQL ``extract(regex, captureGroup, text)`` — regexp capture."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, pattern, group)


# --------------------------------------------------------------------------
# common KQL scalar functions (1-line Spark equivalents, grouped here so a
# Kusto user finds the name they know; all stay inside codegen)
# --------------------------------------------------------------------------


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def iif(cond: Column, then_val: Column, else_val: Column) -> Column:
    """KQL ``iif(cond, a, b)``."""
    return F.when(cond, then_val).otherwise(else_val)


def isempty(col: Column | str) -> Column:
    """KQL ``isempty`` — true for null or ''."""
    c = _c(col)
    return c.isNull() | (c == "")


def strlen(col: Column | str) -> Column:
    return F.length(_c(col))


def kql_substring(col: Column | str, start: int, length: int | None = None) -> Column:
    """KQL ``substring(s, start[, length])`` — 0-based start."""
    c = _c(col)
    return F.substring(c, start + 1, length) if length is not None else F.expr(
        f"substring({c._jc.toString()}, {start + 1})"
    )


def replace_string(col: Column | str, lookup: str, rewrite: str) -> Column:
    """KQL ``replace_string`` — literal (non-regex) replacement."""
    return F.replace(_c(col), F.lit(lookup), F.lit(rewrite))


def tolower(col: Column | str) -> Column:
    return F.lower(_c(col))


def toupper(col: Column | str) -> Column:
    return F.upper(_c(col))


def countif(cond: Column) -> Column:
    """KQL ``countif(predicate)`` aggregate."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")


def sumif(col: Column | str, cond: Column) -> Column:
    """KQL ``sumif(col, predicate)`` aggregate."""
    return F.sum(F.when(cond, _c(col)))


def make_set(col: Column | str) -> Column:
    """KQL ``make_set`` — distinct values as a (sorted, deterministic) array."""
    return F.array_sort(F.collect_set(_c(col)))


def startofday(col: Column | str) -> Column:
    """KQL ``startofday``."""
    return F.date_trunc("day", _c(col))


def endofday(col: Column | str) -> Column:
    """KQL ``endofday`` — last instant of the day (start of next day - 1µs)."""
    return F.date_trunc("day", _c(col)) + F.expr("INTERVAL 1 DAY") - F.expr(
        "INTERVAL 1 MICROSECOND"
    )


def ago(interval_expr: str) -> Column:
    """KQL ``ago(1h)``-style — now() minus a SQL interval string."""
    return F.current_timestamp() - F.expr(f"INTERVAL {interval_expr}")


def parse_pattern(df: DataFrame, col: Column | str, *segments) -> DataFrame:
    """KQL ``parse Col with "lit" Name:type "lit2" Name2:type2 ...``.

    ``segments`` alternate string literals and ``(name, type)`` capture
    tuples, e.g.::

        parse_pattern(df, "c_name", "Customer#", ("cnum", "long"))

    Compiles to ONE regexp_extract-based projection (anchored, literals
    regex-escaped, captures non-greedy except the last) — a single
    codegen'd pass, not one regex per field.
    """
    import re as _re

    c = _c(col)
    pattern = "^"
    caps: list[tuple[str, str]] = []
    for i, seg in enumerate(segments):
        if isinstance(seg, str):
            pattern += _re.escape(seg)
        else:
            name, typ = seg
            is_last_capture = all(isinstance(s, str) for s in segments[i + 1 :])
            pattern += "(.*)" if is_last_capture else "(.*?)"
            caps.append((name, typ))
    out = df
    for gi, (name, typ) in enumerate(caps, start=1):
        val = F.regexp_extract(c, pattern, gi)
        if typ and typ != "string":
            val = val.cast(typ)
        out = out.withColumn(name, val)
    return out


def make_series(
    df: DataFrame,
    on: Column | str,
    step: str,
    by: list[str],
    agg: Column,
    default: float | None = 0.0,
    value_name: str = "series_value",
    ts_name: str = "series_ts",
    exploded: bool = False,
) -> DataFrame:
    """KQL ``make-series agg() default=d on Ts step S by Keys``.

    KQL extension beyond the reference's emitted surface (SURVEY §2.5 notes
    the reference delegates relational work to Kusto; make-series is the
    canonical Kusto time-series operator, so capability parity needs it).

    Spark-first plan, no collect():
      1. bucket ``on`` to ``step`` (date_trunc) and aggregate per (keys, bucket);
      2. derive the axis bounds with a 1-row global agg, expand to the dense
         axis via ``sequence() + explode`` (a literal-sized broadcast side);
      3. dense axis = distinct-keys x axis (broadcast cross join — the axis
         is tiny), left-join the aggregates, fill ``default``.

    With ``exploded=True`` returns long form ``(keys..., ts_name,
    value_name)`` (= make-series | mv-expand, hash-friendly); otherwise the
    true KQL shape with aligned ``dynamic`` arrays per key row.

    At 100 TB the only shuffles are the per-bucket aggregation (map-side
    partial combine) and the distinct over keys; the axis join is broadcast.
    """
    step_interval = {"hour": "1 hour", "day": "1 day", "minute": "1 minute",
                     "week": "1 week", "month": "1 month"}.get(step, step)
    b = F.date_trunc(step, _c(on)).alias("_bucket")
    binned = df.groupBy(*by, b).agg(agg.alias(value_name))
    bounds = df.agg(
        F.min(F.date_trunc(step, _c(on))).alias("_lo"),
        F.max(F.date_trunc(step, _c(on))).alias("_hi"),
    )
    axis = bounds.select(
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step_interval}"))
        ).alias("_bucket")
    )
    keys = df.select(*by).distinct()
    dense = keys.crossJoin(F.broadcast(axis))
    out = dense.join(binned, [*by, "_bucket"], "left")
    if default is not None:
        out = out.withColumn(
            value_name, F.coalesce(F.col(value_name), F.lit(default))
        )
    # default=None keeps gaps as nulls — feed to series_fill_linear
    out = out.withColumnRenamed("_bucket", ts_name)
    if exploded:
        return out
    pair = F.array_sort(F.collect_list(F.struct(F.col(ts_name), F.col(value_name))))
    return out.groupBy(*by).agg(
        F.transform(pair, lambda s: s[ts_name]).alias(ts_name),
        F.transform(pair, lambda s: s[value_name]).alias(value_name),
    )


def join_innerunique(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_order: list[str],
) -> DataFrame:
    """KQL ``join kind=innerunique`` — Kusto's DEFAULT join flavor: the left
    side is first deduplicated to one arbitrary row per key, then
    inner-joined. Kusto picks a nondeterministic row; we take the first row
    under ``left_order`` so results are stable and oracle-checkable.

    Implemented as row_number()-over-window (one shuffle on the join key that
    the subsequent join reuses — the window's hash partitioning co-locates
    the rows the join needs, so AQE plans a single exchange on the left).
    """
    w = Window.partitionBy(*on).orderBy(*[_c(c) for c in left_order])
    deduped = (
        left.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    return deduped.join(right, on, "inner")


def top_nested(
    df: DataFrame,
    outer_key: str,
    inner_key: str,
    measure: Column,
    k_outer: int,
    k_inner: int,
    outer_alias: str = "outer_measure",
    inner_alias: str = "inner_measure",
) -> DataFrame:
    """KQL ``top-nested k1 of A by agg, top-nested k2 of B by agg`` —
    hierarchical top-k: keep the top ``k_outer`` outer groups by the summed
    measure, and within each the top ``k_inner`` inner groups.

    Ties broken by key name so results are deterministic/oracle-checkable.
    Pass a decimal-typed ``measure`` when exact cross-engine sums matter
    (the outer level re-sums the inner aggregates).

    Scale notes: the inner aggregation is the only full-data shuffle; both
    rankings run over group-cardinality-sized data (the outer ranking's
    unpartitioned window is bounded by |outer_key| — fine for the dimension
    cardinalities top-nested targets), and the final join broadcasts the
    ≤k_outer-row outer side.
    """
    inner = df.groupBy(outer_key, inner_key).agg(measure.alias(inner_alias))
    outer = inner.groupBy(outer_key).agg(F.sum(inner_alias).alias(outer_alias))
    wo = Window.orderBy(F.col(outer_alias).desc(), F.col(outer_key))
    top_outer = (
        outer.withColumn("_r", F.row_number().over(wo))
        .filter(F.col("_r") <= k_outer)
        .drop("_r")
    )
    wi = Window.partitionBy(outer_key).orderBy(
        F.col(inner_alias).desc(), F.col(inner_key)
    )
    top_inner = (
        inner.withColumn("_r", F.row_number().over(wi))
        .filter(F.col("_r") <= k_inner)
        .drop("_r")
    )
    return F.broadcast(top_outer).join(top_inner, outer_key, "inner")


def union_tables(*dfs: DataFrame) -> DataFrame:
    """KQL ``union`` — multi-table union aligned BY COLUMN NAME, with
    missing columns null-filled (KQL unions heterogeneous tables; SQL's
    positional UNION ALL does not). ``unionByName(allowMissingColumns)``
    is the exact Spark primitive: a zero-shuffle narrow concatenation of
    inputs — partitions append, nothing moves.
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def series_fill_linear(
    df: DataFrame,
    on: Column | str,
    value: str,
    by: list[str],
    out_name: str | None = None,
) -> DataFrame:
    """KQL ``series_fill_linear`` — linearly interpolate null gaps in a
    (long-form) series, clamping leading/trailing gaps to the nearest
    non-null value. Companion of :func:`make_series` with ``default=None``.

    Pure window-function plan (ignore-nulls last/first over the
    per-key ordering): the struct trick ``last(when(v notnull,
    struct(pos, v)), ignorenulls=True)`` carries the *position* of the
    bracketing non-null samples, so irregular axes interpolate correctly.
    One hash partitioning on the series keys, no UDF, no collect.
    """
    out_name = out_name or value
    ts = _c(on)
    v = F.col(value)
    pos = ts.cast("long")  # epoch seconds; exact for binned axes
    w = Window.partitionBy(*by).orderBy(ts)
    prev = F.last(
        F.when(v.isNotNull(), F.struct(pos.alias("p"), v.alias("v"))), ignorenulls=True
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    nxt = F.first(
        F.when(v.isNotNull(), F.struct(pos.alias("p"), v.alias("v"))), ignorenulls=True
    ).over(w.rowsBetween(1, Window.unboundedFollowing))
    interp = prev["v"] + (nxt["v"] - prev["v"]) * (pos - prev["p"]) / (
        nxt["p"] - prev["p"]
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev.isNull() & nxt.isNotNull(), nxt["v"])
        .when(nxt.isNull() & prev.isNotNull(), prev["v"])
        .otherwise(interp)
    )
    return df.withColumn(out_name, filled)


def lookup(
    left: DataFrame,
    dim: DataFrame,
    on: list[str],
    kind: str = "leftouter",
) -> DataFrame:
    """KQL ``lookup kind=leftouter DimTable on Key`` — join against a
    dimension table. KQL's lookup is defined for small right sides; we
    encode that contract in the plan with an explicit ``broadcast`` hint
    (the fact side never shuffles). ``kind`` ∈ {leftouter, inner}.
    """
    if kind not in ("leftouter", "inner"):
        raise ValueError("lookup supports kind=leftouter|inner")
    return left.join(F.broadcast(dim), on, kind)


def top_hitters(
    df: DataFrame,
    of: str,
    k: int,
    by_sum: str | None = None,
    count_name: str = "approximate_count",
) -> DataFrame:
    """KQL ``top-hitters k of Col [by SumCol]`` — heavy hitters.

    KQL computes this approximately (space-saving sketch); at Spark scale
    the exact two-stage plan is already cheap — a map-side-combined
    groupBy(of) whose output is |distinct of| rows, then TakeOrderedAndProject
    for the top k (per-task heaps, no global sort) — so we return EXACT
    counts under the same contract (KQL's column name is kept).
    """
    measure = (
        F.count(F.lit(1)) if by_sum is None else F.sum(F.col(by_sum))
    ).alias(count_name)
    agg = df.groupBy(of).agg(measure)
    return agg.orderBy(F.col(count_name).desc(), F.col(of)).limit(k)


def datatable(spark: SparkSession, schema: str, *rows: tuple) -> DataFrame:
    """KQL ``datatable(col:type, ...) [values]`` — inline literal table
    (the let-bound test fixtures shape, NoHeaderNoCompressionTest.cs:21-38).
    """
    return spark.createDataFrame(list(rows), schema)


def series_outliers(
    df: DataFrame,
    value: str,
    by: list[str],
    score_name: str = "outlier_score",
    fence_k: float = 1.5,
) -> DataFrame:
    """KQL ``series_outliers`` — Tukey-fence anomaly score per series.

    Matches KQL's fence-test semantics: points INSIDE the fences
    ``[q25 - k·IQR, q75 + k·IQR]`` score 0; outside, the score is the
    signed distance beyond the violated fence in IQR units
    (``(x - fence) / IQR``). 0 when the IQR collapses. (KQL's operator
    works on packed series arrays; this is the per-row grouped adaptation.)

    Two-stage distributed plan: exact interpolated quartiles per key
    (one map-side-combinable aggregation over the data; swap
    ``percentiles(..., approx=True)`` mechanics in at extreme key
    cardinality), broadcast-joined back onto the rows — the fact side
    never reshuffles. Scoring is pure codegen arithmetic.
    """
    q1, q3 = percentiles(value, 25, 75)
    quart = df.groupBy(*by).agg(q1.alias("_q1"), q3.alias("_q3"))
    joined = df.join(F.broadcast(quart), by, "inner")
    iqr = F.col("_q3") - F.col("_q1")
    lo = F.col("_q1") - fence_k * iqr
    hi = F.col("_q3") + fence_k * iqr
    x = F.col(value)
    score = (
        F.when(iqr == 0, F.lit(0.0))
        .when(x > hi, (x - hi) / iqr)
        .when(x < lo, (x - lo) / iqr)
        .otherwise(F.lit(0.0))
    )
    return joined.withColumn(score_name, score).drop("_q1", "_q3")


def sort_by(df: DataFrame, *cols: Column | str, desc_first: bool = False) -> DataFrame:
    """KQL ``sort by c1 [asc|desc], ...`` (alias ``order by``). KQL defaults
    to DESCENDING order per key when unspecified — pass plain column names
    with ``desc_first=True`` for that behavior, or explicit ``Column``
    expressions (``F.col("x").desc()``) for full control. Compiles to a
    range-partitioned global sort; prefer :func:`top` when a k-limit exists
    (TakeOrderedAndProject avoids the global sort entirely).
    """
    exprs = [
        (F.col(c).desc() if desc_first else F.col(c)) if isinstance(c, str) else c
        for c in cols
    ]
    return df.orderBy(*exprs)


def getschema(df: DataFrame) -> DataFrame:
    """KQL ``getschema`` — the table's schema as rows
    (ColumnName, ColumnOrdinal, ColumnType). Driver-side metadata only;
    touches no data."""
    spark = df.sparkSession
    rows = [(n, i, t) for i, (n, t) in enumerate(df.dtypes)]
    return spark.createDataFrame(
        rows, "ColumnName string, ColumnOrdinal int, ColumnType string"
    )


def bag_unpack(
    df: DataFrame, col: str, schema: str, drop: bool = True
) -> DataFrame:
    """KQL ``evaluate bag_unpack(Col)`` — promote a dynamic bag's keys to
    top-level columns. KQL infers the key set from the data; Spark-first we
    take the declared ``schema`` (DDL string) so the plan stays static and
    the parse is ONE codegen'd ``from_json`` (no per-row schema discovery —
    at 100 TB inference would force an extra full scan).
    """
    others = [c for c in df.columns if not (drop and c == col)]
    return df.select(
        *others, F.from_json(F.col(col), schema).alias("_bag")
    ).select(*others, "_bag.*")

"""KQL text → Spark: parse and RUN the query strings the reference emits.

The reference delegates its relational work to Kusto by EMITTING KQL
text (EtlRun.cs:148-164 partition-policy introspection,
TestBase.cs:305-332 shard-count tracking, schema.kql's generator). The
operator wrappers in ``operators/kql.py`` implement the semantics; this
module closes the last gap for a user switching off Kusto: the emitted
STRINGS themselves run, via a recursive-descent parser over the KQL
tabular-expression grammar (public language spec:
https://learn.microsoft.com/azure/data-explorer/kusto/query/).

Scope — the reference's full emitted surface (SURVEY §2.5) plus the
everyday tabular operators:

- sources: table name, ``range x from a to b step s``, ``print n=e``,
  ``externaldata (schema) ['path'] with (format=...)``
- control commands: ``.export … with (…) <| query`` (writes through
  kql.export_any), ``.show table T [policy partitioning]`` (answered
  from the engine catalog, trailing stages continue), and the
  ``.create-or-alter function`` wrapper strip
- ``let`` statements (scalar and tabular), ``toscalar(subquery)``
  (driver-evaluated, Kusto's own semantics), let-bound FUNCTION
  literals ``let f = (T:(*), k:long=5) { … }`` called in scalar,
  source, or ``| invoke f(…)`` position (bodies re-parse at the call
  site — every invocation is an ordinary Catalyst plan)
- ``find in (T1, T2) where …``, ``search in (T1, T2) 'term'``,
  ``partition by Col ( stages )`` (legacy bounded-key contract),
  ``scan`` (accumulate/restart profiles → distributed-prefix-sum
  segment windows; general multi-step state machines — multiple
  variables, state-reading conditions — → kql.scan_steps' sequential
  executor), ``project-keep``/``project-reorder``, ``reduce by``,
  ``consume``, ``declare query_parameters (…)``, ``set option;``
- evaluate plugins: ``pivot`` / ``python`` / ``basket`` /
  ``autocluster`` / ``diffpatterns`` / ``ipv4_lookup`` /
  ``bag_unpack : (schema)`` / ``narrow`` / ``rows_near`` /
  ``sequence_detect`` / ``activity_counts_metrics`` /
  ``session_count`` / ``activity_engagement`` / ``funnel_sequence`` /
  ``sliding_window_counts`` / ``rolling_percentile`` /
  ``new_activity_metrics`` / ``active_users_count`` /
  ``dcount_intersect`` / ``diffpatterns_text``;
  ``lookup`` / ``fork`` / ``facet`` / ``top-nested [with others]`` /
  ``top-hitters`` / ``as`` / ``sample`` / ``invoke``
- the packed-series scalar batch (``series_fir``/``series_iir``/
  ``series_moving_avg``/fills/arithmetic/stats/``series_fit_line`` +
  ``extend (a, b, …) = fn()`` tuple unpacking), property-bag scalars,
  ``bin_at``, datetime ``range`` axes, ``make-series from/to``
  (bin_at-aligned), join/summarize hints, ``union withsource``,
  right-side semi/anti joins, ``nulls first/last``, ``parse
  kind=regex/relaxed``, ``mv-expand with_itemindex``
- ``where  project  project-away  project-rename  extend
  summarize ... by  distinct  count  take/limit  top N by
  sort/order by  serialize (+row_number/prev/next/row_cumsum)
  mv-expand  mv-apply ... to typeof(T) on (stages)
  join kind=... (T) on ...  union  search  getschema
  parse/parse-where ... with  evaluate pivot(...)  make-series``
- scalar exprs: arithmetic, comparisons, ``and/or/not``, ``has``,
  ``contains``, ``startswith/endswith``, ``matches regex``, ``in``,
  ``between (a .. b)``, dynamic path access ``x.y.z`` (VariantType,
  type-coerced at use), array indexing ``a[i]``, timespan literals
  (``1h``/``30m``/``10s``/``100ms`` — double seconds internally,
  converted at datetime ± boundaries), ``datetime(...)`` literals
- scalar fns: to*/strcat/strlen/substring/split/extract/replace_string
  /tolower/toupper/trim/bin/iff/case/coalesce/is*/now/ago/array_length
  /strcat_array/round/floor/abs/…; aggregates: count/countif/sum/sumif
  /avg/min/max/minif/maxif/dcount/make_list/make_set/take_any/any
  /arg_max/arg_min/percentile
- ``functions=`` lets callers bind environment functions — e.g. map
  ``extent_tags()``/``extent_id()`` onto this engine's lineage columns
  so the reference's shard-tracking queries run VERBATIM (pinned in
  tests).

Posture: the parser builds pyspark Columns/DataFrames directly (no
interpreter in the data path — whatever text compiles here runs as
ordinary Catalyst plans with full pushdown/codegen); unknown constructs
raise ``KqlSyntaxError`` naming the position, never mis-run.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators import kql as K

__all__ = ["run_kql", "KqlSyntaxError"]


class KqlSyntaxError(ValueError):
    pass


# --------------------------------------------------------------- lexer

_TS_FACTORS = {
    "d": 86400.0,
    "h": 3600.0,
    "m": 60.0,
    "s": 1.0,
    "ms": 1e-3,
    "microsecond": 1e-6,
    "microseconds": 1e-6,
    "tick": 1e-7,
    "ticks": 1e-7,
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<verbatim>@"(?:[^"]|"")*")
  | (?P<dstr>"(?:[^"\\]|\\.)*")
  | (?P<sstr>'(?:[^'\\]|\\.)*')
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<bracketid>\[\s*(?:'[^']*'|"[^"]*")\s*\])
  | (?P<punct>==|!=|=~|!~|<=|>=|<>|<\||\.\.|[|,()\[\]{}=.<>+\-*/%!$;:])
    """,
    re.VERBOSE,
)

_STR_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"',
    "0": "\0",
}


def _unescape(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            out.append(_STR_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


class _Tok:
    __slots__ = ("kind", "val", "pos", "braq")

    def __init__(self, kind, val, pos, braq=False):
        # braq: this ident came from ['bracket quoting'] — in postfix
        # position that surface form is KQL's bracket member access
        self.kind, self.val, self.pos, self.braq = kind, val, pos, braq

    def __repr__(self):
        return f"{self.kind}:{self.val!r}"


def _lex(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise KqlSyntaxError(
                f"unexpected character {text[pos]!r} at offset {pos}"
            )
        kind = m.lastgroup
        raw = m.group()
        if kind == "ws":
            pos = m.end()
            continue
        if kind == "verbatim":
            toks.append(_Tok("str", raw[2:-1].replace('""', '"'), pos))
        elif kind in ("dstr", "sstr"):
            toks.append(_Tok("str", _unescape(raw[1:-1]), pos))
        elif kind == "num":
            # timespan literal: number immediately followed by a unit
            m2 = re.match(r"[A-Za-z]+", text[m.end() :])
            unit = m2.group() if m2 else ""
            if unit in _TS_FACTORS and not (
                unit == "m" and text[m.end() : m.end() + 2] == "ms"
            ):
                toks.append(
                    _Tok("ts", float(raw) * _TS_FACTORS[unit], pos)
                )
                pos = m.end() + len(unit)
                continue
            toks.append(
                _Tok("num", float(raw) if "." in raw or "e" in raw.lower()
                     else int(raw), pos)
            )
        elif kind == "ident":
            toks.append(_Tok("ident", raw, pos))
        elif kind == "bracketid":
            inner = raw[1:-1].strip()
            toks.append(_Tok("ident", inner[1:-1], pos, braq=True))
        else:
            toks.append(_Tok("punct", raw, pos))
        pos = m.end()
    toks.append(_Tok("eof", None, n))
    return toks


# ------------------------------------------------------------ expr node

class KExpr:
    """A parsed scalar expression: a Column plus the bits of KQL typing
    the grammar needs — pending VARIANT paths (materialized with the
    right target type at use: ``Keys.Kind == "Hash"`` coerces to
    string, ``toint(Keys.Seed)`` to int) and timespan-ness (double
    seconds internally; converted at datetime ± boundaries)."""

    def __init__(self, col: Column, name: str | None = None,
                 kind: str = "plain", vbase: Column | None = None,
                 vpath: str | None = None, pyval=None,
                 struct_fields=None):
        self.col = col
        self.name = name
        self.kind = kind  # plain | timespan | variant | string | number | struct
        self.vbase = vbase
        self.vpath = vpath
        self.pyval = pyval  # python literal when known (grammar constants)
        self.struct_fields = struct_fields  # field order for tuple extend

    def as_type(self, typ: str) -> Column:
        if self.kind == "variant" and self.vbase is not None:
            return F.try_variant_get(self.vbase, f"$.{self.vpath}", typ)
        if typ == "variant":
            return self.col
        return self.col.cast(
            {"string": "string", "int": "int", "long": "long",
             "double": "double", "boolean": "boolean",
             "timestamp": "timestamp"}[typ]
        )

    def c(self) -> Column:
        if self.kind == "variant" and self.vbase is not None:
            return F.try_variant_get(self.vbase, f"$.{self.vpath}", "variant")
        return self.col


def _coerce_pair(a: KExpr, b: KExpr):
    """Comparison operands: a pending variant coerces to the OTHER
    side's natural type (string literal → string, number → double)."""
    def target(other: KExpr) -> str:
        return "double" if other.kind == "number" else (
            "string" if other.kind == "string" else "variant"
        )

    ca = a.as_type(target(b)) if a.kind == "variant" else a.col
    cb = b.as_type(target(a)) if b.kind == "variant" else b.col
    return ca, cb


# ------------------------------------------------------------- parser

_AGG_FNS = {
    "count", "countif", "sum", "sumif", "avg", "avgif", "min", "minif",
    "max", "maxif", "dcount", "make_list", "make_set", "take_any",
    "any", "arg_max", "arg_min", "percentile", "stdev", "variance",
}

_JOIN_KINDS = {
    "inner": "inner", "innerunique": "inner", "leftouter": "left",
    "rightouter": "right", "fullouter": "outer", "leftsemi": "left_semi",
    "leftanti": "left_anti", "anti": "left_anti",
    # Spark has no native right-side semi/anti: the runner swaps the
    # operands and uses the left form (same result, build side flips)
    "rightsemi": "swap:left_semi", "rightanti": "swap:left_anti",
}


class _Parser:
    def __init__(self, text: str, tables, functions, spark):
        self.toks = _lex(text)
        self.i = 0
        self.tables = dict(tables or {})
        self.functions = dict(functions or {})
        self.spark = spark
        self.lets: dict[str, KExpr] = {}
        self.lambdas: dict[str, tuple] = {}

    # ---- token helpers
    def peek(self, k=0) -> _Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat(self, kind, val=None) -> _Tok:
        t = self.peek()
        if t.kind != kind or (val is not None and t.val != val):
            raise KqlSyntaxError(
                f"expected {val or kind} at offset {t.pos}, got {t.val!r}"
            )
        return self.next()

    def at(self, kind, val=None) -> bool:
        t = self.peek()
        return t.kind == kind and (val is None or t.val == val)

    def at_ident(self, *names) -> bool:
        t = self.peek()
        return t.kind == "ident" and t.val in names

    # ---- entry
    def parse_query(self) -> DataFrame:
        while self.at_ident("let", "declare", "set"):
            if self.at_ident("set"):
                # ``set notruncation;`` etc — Kusto query OPTIONS;
                # engine knobs here are Spark confs, so options are
                # accepted and ignored (never semantics-changing)
                self.next()
                self.eat("ident")
                if self.at("punct", "="):
                    self.next()
                    self.next()
                if self.at("punct", ";"):
                    self.next()
            elif self.at_ident("declare"):
                self._parse_declare_query_parameters()
            else:
                self._parse_let()
        df = self.parse_pipeline()
        self.eat("eof")
        return df

    def _parse_declare_query_parameters(self):
        """``declare query_parameters (Name:type [= default], …);`` —
        dashboard/app queries ship with this preamble. Parameters bind
        like scalar lets from their declared defaults (this runner has
        no out-of-band parameter channel — pass real values by string
        substitution or a wrapping let); a parameter WITHOUT a default
        refuses by name rather than mis-running with null."""
        self.eat("ident", "declare")
        self.eat("ident", "query_parameters")
        self.eat("punct", "(")
        while not self.at("punct", ")"):
            name = self.eat("ident").val
            self.eat("punct", ":")
            self.eat("ident")  # declared type: the literal carries it
            if not self.at("punct", "="):
                raise KqlSyntaxError(
                    f"query parameter {name!r} has no default — this "
                    "runner binds parameters from defaults; provide one "
                    "or bind the name with a let"
                )
            self.next()
            e = self.parse_expr()
            if name not in self.lets:  # an outer let overrides defaults
                self.lets[name] = e
            if self.at("punct", ","):
                self.next()
        self.eat("punct", ")")
        if self.at("punct", ";"):
            self.next()

    def _parse_let(self):
        self.eat("ident", "let")
        name = self.eat("ident").val
        self.eat("punct", "=")
        # tabular let: RHS starts with a known table / source keyword
        t = self.peek()
        if t.kind == "punct" and t.val == "(" and self._lambda_ahead():
            self.lambdas[name] = self._parse_lambda()
            if self.at("punct", ";"):
                self.next()
            return
        if t.kind == "ident" and (
            t.val in self.tables
            or t.val
            in ("range", "print", "datatable", "externaldata", "materialize")
            or self._is_table(t.val)
        ):
            self.tables[name] = self.parse_pipeline(stop_at_semicolon=True)
        else:
            self.lets[name] = self.parse_expr()
        if self.at("punct", ";"):
            self.next()

    # ---- let-bound function literals (lambdas)
    def _lambda_ahead(self) -> bool:
        """True when the cursor sits on ``(params) {`` — a function
        literal RHS, vs a parenthesized scalar/tabular expression."""
        depth = 0
        j = self.i
        while j < len(self.toks):
            t = self.toks[j]
            if t.kind == "punct" and t.val == "(":
                depth += 1
            elif t.kind == "punct" and t.val == ")":
                depth -= 1
                if depth == 0:
                    nxt = self.toks[j + 1] if j + 1 < len(self.toks) else None
                    return (
                        nxt is not None
                        and nxt.kind == "punct"
                        and nxt.val == "{"
                    )
            j += 1
        return False

    def _parse_lambda(self):
        """``let f = (T:(*), k:long [= default], …) { body };`` —
        Kusto's let-bound function literal. Parameters are tabular
        (``(*)`` or a declared row schema — documentation here, callers
        pass real frames) or scalar with optional literal defaults. The
        body is captured as a TOKEN SPAN and re-parsed at each call
        site with the arguments bound (tabular args become tables,
        scalar args become lets) — so every invocation compiles to
        ordinary Catalyst plans over the caller's lineage, exactly like
        writing the body inline. No interpreter in the data path."""
        self.eat("punct", "(")
        params = []  # (name, "tabular" | scalar-type-name, default)
        while not self.at("punct", ")"):
            pname = self.eat("ident").val
            self.eat("punct", ":")
            if self.at("punct", "("):
                depth = 0
                while True:
                    t = self.next()
                    if t.kind == "punct" and t.val == "(":
                        depth += 1
                    elif t.kind == "punct" and t.val == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    elif t.kind == "eof":
                        raise KqlSyntaxError(
                            "unterminated tabular parameter type"
                        )
                params.append((pname, "tabular", None))
            else:
                typ = self.eat("ident").val
                default = None
                if self.at("punct", "="):
                    self.next()
                    default = _lit_value(self.parse_expr())
                params.append((pname, typ, default))
            if self.at("punct", ","):
                self.next()
        self.eat("punct", ")")
        self.eat("punct", "{")
        depth = 1
        body: list[_Tok] = []
        while True:
            t = self.next()
            if t.kind == "punct" and t.val == "{":
                depth += 1
            elif t.kind == "punct" and t.val == "}":
                depth -= 1
                if depth == 0:
                    break
            elif t.kind == "eof":
                raise KqlSyntaxError("unterminated function body")
            body.append(t)
        if not body:
            raise KqlSyntaxError("empty function body")
        return params, body

    def _lambda_env(self, body, bind_tab, bind_scalar) -> "_Parser":
        """A sub-parser over a captured body span, with the call-site
        bindings layered over this parser's tables / lets / lambdas."""
        p = _Parser.__new__(_Parser)
        p.toks = list(body) + [_Tok("eof", None, body[-1].pos + 1)]
        p.i = 0
        p.tables = dict(self.tables)
        p.tables.update(bind_tab)
        p.functions = self.functions
        p.spark = self.spark
        p.lets = dict(self.lets)
        p.lets.update(bind_scalar)
        p.lambdas = dict(self.lambdas)
        return p

    def _parse_lambda_args(self, name, params, piped_df=None):
        """Parse a ``(…)`` call-site argument list against the declared
        params. A piped frame (``| invoke``) binds the FIRST tabular
        parameter (Kusto's invoke contract); remaining tabular params
        take source arguments, scalar params take expressions, and
        trailing defaults fill in."""
        self.eat("punct", "(")
        plist = list(params)
        bind_tab: dict[str, DataFrame] = {}
        bind_scalar: dict[str, KExpr] = {}
        if piped_df is not None:
            for i, (pn, pk, _) in enumerate(plist):
                if pk == "tabular":
                    bind_tab[pn] = piped_df
                    del plist[i]
                    break
            else:
                raise KqlSyntaxError(
                    f"invoke target {name!r} has no tabular parameter"
                )
        idx = 0
        while not self.at("punct", ")"):
            if idx >= len(plist):
                raise KqlSyntaxError(
                    f"too many arguments for function {name!r}"
                )
            pn, pk, _ = plist[idx]
            if pk == "tabular":
                bind_tab[pn] = self._parse_source()
            else:
                bind_scalar[pn] = self.parse_expr()
            idx += 1
            if self.at("punct", ","):
                self.next()
        self.eat("punct", ")")
        for pn, pk, dflt in plist[idx:]:
            if dflt is None:
                raise KqlSyntaxError(
                    f"missing argument for parameter {pn!r} of {name!r}"
                )
            bind_scalar[pn] = KExpr(F.lit(dflt), pyval=dflt)
        return bind_tab, bind_scalar

    def _is_table(self, name: str) -> bool:
        if name in self.tables:
            return True
        if self.spark is not None:
            try:
                return self.spark.catalog.tableExists(name)
            except Exception:
                return False
        return False

    def continue_pipeline(self, df: DataFrame) -> DataFrame:
        """Run the remaining `| stage` chain over an externally-built
        source (the .show control-command results)."""
        self._last_order = None  # fresh pipeline — no inherited order
        self._last_order_names = None
        while self.at("punct", "|"):
            self.next()
            df = self._parse_stage(df)
        self.eat("eof")
        return df

    # ---- pipeline
    def parse_pipeline(self, stop_at_semicolon=False) -> DataFrame:
        # _last_order is scoped to THIS pipeline: a `sort by` inside a
        # let / join branch / union source / toscalar subquery must not
        # leak into the outer pipeline's serialize/row_number windows.
        outer_order = getattr(self, "_last_order", None)
        outer_names = getattr(self, "_last_order_names", None)
        self._last_order = None
        self._last_order_names = None
        try:
            df = self._parse_source()
            while self.at("punct", "|"):
                self.next()
                df = self._parse_stage(df)
            return df
        finally:
            self._last_order = outer_order
            self._last_order_names = outer_names

    def _parse_source(self) -> DataFrame:
        if self.at("punct", "("):
            self.next()
            df = self.parse_pipeline()
            self.eat("punct", ")")
            return df
        t = self.eat("ident")
        if t.val == "find":
            return self._parse_find()
        if t.val == "search" and t.val not in self.tables and (
            self.at_ident("in") or self.peek().kind == "str"
        ):
            return self._parse_search_source()
        if t.val in self.lambdas and self.at("punct", "("):
            params, body = self.lambdas[t.val]
            bt, bs = self._parse_lambda_args(t.val, params)
            return self._lambda_env(body, bt, bs).parse_query()
        if t.val == "externaldata":
            return self._parse_externaldata()
        if t.val == "datatable":
            return self._parse_datatable()
        if t.val == "materialize":
            # materialize(subquery): pin one evaluation for every
            # consumer — bound to kql.materialize's lazy persist (the
            # Spark-idiomatic form of Kusto's subquery cache)
            self.eat("punct", "(")
            inner = self.parse_pipeline()
            self.eat("punct", ")")
            return K.materialize(inner)
        if t.val == "range":
            name = self.eat("ident").val
            self.eat("ident", "from")
            lo = self.parse_expr()
            self.eat("ident", "to")
            hi = self.parse_expr()
            self.eat("ident", "step")
            step = self.parse_expr()
            if step.kind == "timespan":
                # datetime axis: range ts from datetime(a) to
                # datetime(b) step 1d — inclusive bounds like the
                # numeric form, via one literal-sized sequence
                secs = int(float(_lit_value(step)))
                return self.spark.range(1).select(
                    F.explode(
                        F.sequence(
                            lo.as_type("timestamp"),
                            hi.as_type("timestamp"),
                            F.expr(f"INTERVAL {secs} SECOND"),
                        )
                    ).alias(name)
                )
            lo_v, hi_v, st_v = (
                _lit_value(lo), _lit_value(hi), _lit_value(step)
            )
            return self.spark.range(
                int(lo_v), int(hi_v) + 1, int(st_v)
            ).select(F.col("id").alias(name))
        if t.val == "print":
            cols = []
            while True:
                name, e = self._parse_named_expr(default_prefix="print")
                cols.append(e.c().alias(name))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            return self.spark.range(1).select(*cols)
        if t.val in self.tables:
            return self.tables[t.val]
        if self.spark is not None and self._is_table(t.val):
            return self.spark.table(t.val)
        raise KqlSyntaxError(f"unknown table {t.val!r} at offset {t.pos}")

    def _parse_datatable(self) -> DataFrame:
        """``datatable(Col:type, …) [ v1, v2, … ]`` — KQL's inline
        literal table (the single most common source form in pasted
        snippets and docs examples). Values are row-major literal
        expressions; a trailing comma is tolerated (Kusto does)."""
        type_map = {
            "string": "string", "int": "int", "long": "long",
            "real": "double", "double": "double", "bool": "boolean",
            "boolean": "boolean", "datetime": "timestamp",
            "guid": "string",
        }
        self.eat("punct", "(")
        fields = []
        while True:
            name = self.eat("ident").val
            self.eat("punct", ":")
            typ = self.eat("ident").val
            if typ not in type_map:
                raise KqlSyntaxError(f"unsupported datatable type {typ!r}")
            fields.append((name, type_map[typ]))
            if self.at("punct", ","):
                self.next()
                continue
            break
        self.eat("punct", ")")
        self.eat("punct", "[")
        values = []
        while not self.at("punct", "]"):
            if self.at_ident("null"):
                self.next()
                values.append(None)
            else:
                values.append(_lit_value(self.parse_expr()))
            if self.at("punct", ","):
                self.next()
        self.eat("punct", "]")
        ncols = len(fields)
        if len(values) % ncols:
            raise KqlSyntaxError(
                f"datatable value count {len(values)} is not a multiple "
                f"of the {ncols}-column schema"
            )
        rows = [
            tuple(values[i : i + ncols]) for i in range(0, len(values), ncols)
        ]
        ddl = ", ".join(f"`{n}` {t}" for n, t in fields)
        return self.spark.createDataFrame(rows, ddl)

    def _parse_externaldata(self) -> DataFrame:
        """``externaldata (Col:type, …) ['path', …] with (format='csv',
        ignoreFirstRecord=true)`` — KQL's inline external table, mapped
        onto Spark's own readers with the declared schema (csv / tsv /
        json / parquet / txt). Local/mounted paths only (this engine
        has no cloud credential plumbing — mount the store, the
        worker_local_path contract)."""
        type_map = {
            "string": "string", "int": "int", "long": "long",
            "real": "double", "double": "double", "bool": "boolean",
            "boolean": "boolean", "datetime": "timestamp",
            "decimal": "decimal(38,18)", "guid": "string",
        }
        self.eat("punct", "(")
        fields = []
        while True:
            name = self.eat("ident").val
            self.eat("punct", ":")
            typ = self.eat("ident").val
            if typ not in type_map:
                raise KqlSyntaxError(f"unsupported externaldata type {typ!r}")
            fields.append(f"`{name}` {type_map[typ]}")
            if self.at("punct", ","):
                self.next()
                continue
            break
        self.eat("punct", ")")
        paths = []
        if self.at("punct", "["):
            self.next()
            while True:
                paths.append(str(_lit_value(self.parse_expr())))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            self.eat("punct", "]")
        else:
            # a SINGLE ['path'] lexes as a bracket-quoted identifier
            # (same surface syntax) — accept it as the one path
            paths.append(self.eat("ident").val)
        fmt, header = "csv", False
        if self.at_ident("with"):
            self.next()
            self.eat("punct", "(")
            while not self.at("punct", ")"):
                key = self.eat("ident").val
                self.eat("punct", "=")
                val = self.next().val
                if key.lower() == "format":
                    fmt = str(val).lower()
                elif key.lower() == "ignorefirstrecord":
                    header = str(val).lower() == "true"
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", ")")
        ddl = ", ".join(fields)
        if fmt in ("csv", "tsv", "psv", "txt"):
            sep = {"csv": ",", "tsv": "\t", "psv": "|", "txt": "\x01"}[fmt]
            return (
                self.spark.read.schema(ddl)
                .options(sep=sep, header=str(header).lower())
                .csv(paths)
            )
        if fmt in ("json", "multijson"):
            return self.spark.read.schema(ddl).json(paths)
        if fmt == "parquet":
            return self.spark.read.schema(ddl).parquet(*paths)
        raise KqlSyntaxError(f"unsupported externaldata format {fmt!r}")

    def _parse_stage(self, df: DataFrame) -> DataFrame:
        t = self.eat("ident")
        op = t.val
        # mv-expand / project-away / project-rename / order-by hyphens
        if self.at("punct", "-"):
            self.next()
            op = f"{op}-{self.eat('ident').val}"
        handler = getattr(self, "_op_" + op.replace("-", "_"), None)
        if handler is None:
            raise KqlSyntaxError(
                f"unsupported operator {op!r} at offset {t.pos}"
            )
        return handler(df)

    # ---- stages
    def _op_where(self, df):
        return df.filter(self.parse_expr(df=df).c())

    def _op_filter(self, df):
        return self._op_where(df)

    def _op_take(self, df):
        n = int(_lit_value(self.parse_expr()))
        if not 0 <= n <= 2**31 - 1:
            raise KqlSyntaxError(f"take: row count {n} out of range")
        return df.limit(n)

    def _op_limit(self, df):
        return self._op_take(df)

    def _op_count(self, df):
        return df.groupBy().agg(F.count(F.lit(1)).alias("Count"))

    def _op_distinct(self, df):
        if self.at("punct", "*"):
            self.next()
            return df.distinct()
        cols = []
        while True:
            name, e = self._parse_named_expr()
            cols.append(e.c().alias(name))
            if self.at("punct", ","):
                self.next()
                continue
            break
        return df.select(*cols).distinct()

    def _op_project(self, df):
        cols = []
        while True:
            name, e = self._parse_named_expr()
            cols.append(e.c().alias(name))
            if self.at("punct", ","):
                self.next()
                continue
            break
        return df.select(*cols)

    def _op_project_away(self, df):
        pats = []
        while True:
            pats.append(self._parse_col_pattern())
            if self.at("punct", ","):
                self.next()
                continue
            break
        drop = [c for c in df.columns if any(p(c) for p in pats)]
        return df.drop(*drop)

    def _op_project_rename(self, df):
        pairs = []
        while True:
            new = self.eat("ident").val
            self.eat("punct", "=")
            old = self.eat("ident").val
            pairs.append((old, new))
            if self.at("punct", ","):
                self.next()
                continue
            break
        return df.withColumnsRenamed(dict(pairs))

    def _op_extend(self, df):
        cols = dict()
        while True:
            if self.at("punct", "("):
                # ADX tuple unpacking: (a, b, …) = series_fit_line(s)
                # — positional against the function's declared fields
                self.next()
                names = []
                while True:
                    names.append(self.eat("ident").val)
                    if self.at("punct", ","):
                        self.next()
                        continue
                    break
                self.eat("punct", ")")
                self.eat("punct", "=")
                e = self.parse_expr(df=df)
                if e.kind != "struct" or not e.struct_fields:
                    raise KqlSyntaxError(
                        "tuple extend needs a struct-returning function "
                        "(series_fit_line / series_fit_2lines)"
                    )
                if len(names) > len(e.struct_fields):
                    raise KqlSyntaxError(
                        f"tuple extend: {len(names)} names but the "
                        f"function returns {len(e.struct_fields)} fields"
                    )
                base = e.c()
                for nm, fld in zip(names, e.struct_fields):
                    cols[nm] = base.getItem(fld)
            else:
                name, e = self._parse_named_expr(default_prefix="Column")
                cols[name] = e.c()
            if self.at("punct", ","):
                self.next()
                continue
            break
        return df.withColumns(cols)

    def _op_summarize(self, df):
        # hint.shufflekey / hint.strategy / hint.num_partitions are
        # Kusto scheduling metadata — accepted and ignored (Catalyst
        # plans the aggregate's partial combine + exchange itself);
        # unknown hints refuse by name
        while self.at_ident("hint"):
            self.next()
            self.eat("punct", ".")
            prop = self.eat("ident").val
            if prop not in ("shufflekey", "strategy", "num_partitions"):
                raise KqlSyntaxError(
                    f"unsupported summarize hint {prop!r}"
                )
            self.eat("punct", "=")
            self.next()
        aggs = []
        keys = []
        if not self.at_ident("by"):
            while True:
                if (
                    self.at_ident("percentiles")
                    and self.peek(1).kind == "punct"
                    and self.peek(1).val == "("
                ):
                    # percentiles(Col, p1, p2, …) — ADX's multi-output
                    # aggregate: one percentile_<Col>_<p> column per
                    # requested percentile (ADX's own naming), all from
                    # a single approx-percentile accumulator pass
                    self.next()
                    self.next()
                    colname = self.eat("ident").val
                    ps = []
                    while self.at("punct", ","):
                        self.next()
                        ps.append(float(_lit_value(self.parse_expr())))
                    self.eat("punct", ")")
                    if not ps:
                        raise KqlSyntaxError(
                            "percentiles() needs at least one percentile"
                        )
                    for p in ps:
                        suffix = (
                            str(int(p))
                            if p == int(p)
                            else str(p).replace(".", "_")
                        )
                        aggs.append(
                            F.percentile_approx(
                                F.col(colname), p / 100.0
                            ).alias(f"percentile_{colname}_{suffix}")
                        )
                else:
                    name, e = self._parse_named_expr(agg=True)
                    aggs.append(e.c().alias(name))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
        if self.at_ident("by"):
            self.next()
            while True:
                name, e = self._parse_named_expr()
                keys.append(e.c().alias(name))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
        rid = getattr(self, "_mv_rid", None)
        if rid is not None and rid in df.columns:
            keys.append(F.col(rid))
        if not aggs:
            # `summarize by k1, k2` == distinct over the keys
            return df.select(*keys).distinct()
        return df.groupBy(*keys).agg(*aggs)

    def _op_sort(self, df):
        return self._sort_like(df)

    def _op_order(self, df):
        return self._sort_like(df)

    def _sort_like(self, df):
        self.eat("ident", "by")
        order = []
        self._last_order = order  # serialize/row_number/prev/next reuse it
        # bare-column sort keys also record (name, asc) — the sequential
        # scan machine (general multi-step scan) needs plain names to
        # replay the order pandas-side; None marks a computed key
        order_names = []
        self._last_order_names = order_names
        while True:
            e = self.parse_expr(df=df)
            col = e.c()
            desc = True  # KQL default order is DESCENDING
            if self.at_ident("asc"):
                self.next()
                desc = False
            elif self.at_ident("desc"):
                self.next()
            nulls = None
            if self.at_ident("nulls"):
                self.next()
                nulls = self.eat("ident").val
                if nulls not in ("first", "last"):
                    raise KqlSyntaxError(
                        f"sort: nulls first|last, got {nulls!r}"
                    )
            if nulls == "first":
                order.append(col.desc_nulls_first() if desc
                             else col.asc_nulls_first())
            elif nulls == "last":
                order.append(col.desc_nulls_last() if desc
                             else col.asc_nulls_last())
            else:
                order.append(col.desc() if desc else col.asc())
            order_names.append(
                (e.name, not desc, nulls)
                if getattr(e, "name", None) in df.columns
                else None
            )
            if self.at("punct", ","):
                self.next()
                continue
            break
        return df.orderBy(*order)

    def _op_top(self, df):
        n = int(_lit_value(self.parse_expr()))
        self.eat("ident", "by")
        e = self.parse_expr(df=df)
        col = e.c()
        desc = True
        if self.at_ident("asc"):
            self.next()
            desc = False
        elif self.at_ident("desc"):
            self.next()
        return df.orderBy(col.desc() if desc else col.asc()).limit(n)

    def _op_top_nested(self, df):
        """``top-nested K1 of Col1 by Agg1=agg(...), top-nested K2 of
        Col2 by Agg2=agg(...)`` — hierarchical top-K: level 1 keeps the
        K1 best Col1 values by Agg1 over the whole input; level 2 keeps,
        WITHIN each surviving Col1, the K2 best Col2 by Agg2; and so on.
        Spark shape: one aggregate per level over (prefix keys + level
        key) + a rank window partitioned by the prefix — each level's
        aggregate is map-side combinable and the windows run over the
        (tiny) aggregate, never the fact stream.

        ``with others = "Label"`` (ADX's basket row) aggregates every
        NON-surviving value under the label — one anti-join against the
        tiny survivor set + one more map-side aggregate. Bound for the
        LAST level (the dominant "top N plus the rest" report shape);
        an inner-level others row would need null-padded descent and
        refuses by name."""
        from pyspark.sql.window import Window

        levels = []
        while True:
            k = int(_lit_value(self.parse_expr()))
            self.eat("ident", "of")
            col = self.eat("ident").val
            label = None
            if self.at_ident("with"):
                self.next()
                self.eat("ident", "others")
                self.eat("punct", "=")
                label = _lit_value(self.parse_expr())
                if not isinstance(label, str):
                    raise KqlSyntaxError(
                        "top-nested `with others` label must be a string"
                    )
            self.eat("ident", "by")
            agg_name, agg_e = self._parse_named_expr(agg=True)
            levels.append((k, col, agg_name, agg_e.c(), label))
            if self.at("punct", ","):
                self.next()
                self.eat("ident", "top")
                self.eat("punct", "-")
                self.eat("ident", "nested")
                continue
            break
        if any(lab is not None for *_x, lab in levels[:-1]):
            raise KqlSyntaxError(
                "top-nested `with others` is supported on the LAST "
                "level only (an inner-level others row would need "
                "null-padded descent)"
            )
        prefix: list[str] = []
        kept = None  # surviving rows: prefix keys + earlier agg columns
        out_cols: list[str] = []
        for k, col, agg_name, agg_c, label in levels:
            agg_df = df
            if kept is not None:
                agg_df = df.join(
                    F.broadcast(kept.select(*prefix)), prefix, "inner"
                )
            lvl = agg_df.groupBy(*(prefix + [col])).agg(
                agg_c.alias(agg_name)
            )
            w = (
                Window.partitionBy(*prefix)
                if prefix
                else Window.partitionBy(F.lit(1))
            ).orderBy(F.col(agg_name).desc(), F.col(col).asc())
            lvl = lvl.withColumn("_kpf_rnk", F.row_number().over(w)).filter(
                F.col("_kpf_rnk") <= k
            ).drop("_kpf_rnk")
            if label is not None:
                # everything the rank window dropped, re-aggregated
                # under the label: anti-join against the TINY survivor
                # set, then the same map-side-combinable aggregate
                others = (
                    agg_df.join(
                        F.broadcast(lvl.select(*(prefix + [col]))),
                        prefix + [col],
                        "left_anti",
                    )
                    .groupBy(*prefix)
                    .agg(agg_c.alias(agg_name))
                    .withColumn(col, F.lit(label))
                )
                lvl = lvl.unionByName(others.select(*lvl.columns))
            if kept is not None:
                # reattach the earlier levels' aggregate columns
                lvl = lvl.join(F.broadcast(kept), prefix, "inner")
            kept = lvl
            prefix = prefix + [col]
            out_cols = out_cols + [col, agg_name]
        return kept.select(*out_cols)

    def _op_mv_expand(self, df):
        from pyspark.sql.types import VariantType

        idx_name = None
        if self.at_ident("with_itemindex"):
            # ``mv-expand with_itemindex=Idx Col`` — ADX's element
            # ordinal, via posexplode (0-based, per-row; no window)
            self.next()
            self.eat("punct", "=")
            idx_name = self.eat("ident").val
        name, e = self._parse_named_expr()
        col = e.c()
        # a dynamic (VARIANT) column holding a JSON array explodes via
        # an array<variant> view — KQL's mv-expand over dynamic
        if (
            e.name is not None
            and e.name in df.columns
            and isinstance(df.schema[e.name].dataType, VariantType)
        ):
            col = F.try_variant_get(col, "$", "array<variant>")
        elif e.kind == "variant":
            col = e.as_type("array<variant>")
        elif (
            e.name is not None and e.name in df.columns
            and name == e.name and idx_name is None
        ):
            return K.mv_expand(df, e.name)
        others = [c for c in df.columns if c != name]
        if idx_name is not None:
            return df.select(
                *others,
                F.posexplode(col).alias(idx_name, name),
            ).select(*others, F.col(idx_name).cast("long"), name)
        return df.select(*others, F.explode(col).alias(name))

    def _op_mv_apply(self, df):
        """``mv-apply Name=arr to typeof(T) on ( stages )`` — apply a
        subpipeline to each row's array: explode behind a synthetic
        row id, run the stages (summarize grouping silently gains the
        row id — the per-ROW aggregation mv-apply means), then join the
        subquery's new columns back to the original rows. KQL's
        schema.kql generator uses exactly this shape."""
        name, e = self._parse_named_expr()
        if self.at_ident("to"):
            self.next()
            self.eat("ident", "typeof")
            self.eat("punct", "(")
            self.eat("ident")
            self.eat("punct", ")")
        self.eat("ident", "on")
        self.eat("punct", "(")
        rid = "_kpf_mvrow"
        src = df.withColumn(rid, F.monotonically_increasing_id())
        exploded = src.withColumn(name, F.explode(e.c()))
        prev = getattr(self, "_mv_rid", None)
        prev_order = getattr(self, "_last_order", None)
        prev_names = getattr(self, "_last_order_names", None)
        self._mv_rid = rid
        self._last_order = None  # a sort inside on(...) is subquery-scoped
        self._last_order_names = None
        try:
            sub = self._parse_stage(exploded)
            while self.at("punct", "|"):
                self.next()
                sub = self._parse_stage(sub)
        finally:
            self._mv_rid = prev
            self._last_order = prev_order
            self._last_order_names = prev_names
        self.eat("punct", ")")
        if set(src.columns) <= set(sub.columns):
            return sub.drop(rid)
        new_cols = [c for c in sub.columns if c not in src.columns and c != rid]
        return src.join(
            sub.select(rid, *new_cols), rid, "left"
        ).drop(rid)

    def _op_getschema(self, df):
        return K.getschema(df)

    def _op_render(self, df):
        """``| render timechart [with (…)]`` — a PRESENTATION directive,
        not a relational operator: dashboards terminate nearly every
        query with one. The chart kind and its with-properties parse
        (so the pipeline is accepted verbatim) and the data passes
        through untouched — rendering belongs to the client."""
        self.eat("ident")  # chart kind (timechart, barchart, table, …)
        if self.at_ident("with"):
            self.next()
            self.eat("punct", "(")
            depth = 1
            while depth and not self.at("eof"):
                tok = self.next()
                if tok.kind == "punct" and tok.val == "(":
                    depth += 1
                elif tok.kind == "punct" and tok.val == ")":
                    depth -= 1
        return df

    def _op_search(self, df):
        """``T | search "term"`` — case-insensitive match across every
        string column (the KQL search-in-table form)."""
        from pyspark.sql.types import StringType

        term = str(_lit_value(self._parse_add())).lower()
        cond = F.lit(False)
        for f in df.schema.fields:
            if isinstance(f.dataType, StringType):
                cond = cond | F.lower(F.col(f.name)).contains(term)
        return df.filter(cond)

    def _op_parse(self, df):
        """``parse [kind=simple] Col with 'lit' Name[:type] 'lit' …`` —
        compiles to kql.parse_pattern's single anchored regex pass;
        ``parse-where`` additionally drops non-matching rows."""
        return self._parse_like(df, where=False)

    def _op_parse_where(self, df):
        return self._parse_like(df, where=True)

    def _op_parse_kv(self, df):
        """``parse-kv Col as (k1:type, k2:type) with
        (pair_delimiter=' ', kv_delimiter='=' [, quote='"'])`` — the
        log-analytics key-value extractor: first occurrence of each
        declared key, one anchored ``regexp_extract`` per key inside a
        single codegen projection (no UDF, no extra pass). Quoted
        values (when ``quote`` is given) may contain the pair
        delimiter. Single-character delimiters only (the common case;
        multi-char would need lookahead classes — refuse loudly)."""
        type_map = {
            "string": "string", "int": "int", "long": "long",
            "real": "double", "double": "double", "bool": "boolean",
            "boolean": "boolean", "datetime": "timestamp",
        }
        src = self.eat("ident").val
        self.eat("ident", "as")
        self.eat("punct", "(")
        fields = []
        while True:
            name = self.eat("ident").val
            self.eat("punct", ":")
            typ = self.eat("ident").val
            if typ not in type_map:
                raise KqlSyntaxError(f"unsupported parse-kv type {typ!r}")
            fields.append((name, type_map[typ]))
            if self.at("punct", ","):
                self.next()
                continue
            break
        self.eat("punct", ")")
        pair_delim, kv_delim, quote = " ", "=", None
        if self.at_ident("with"):
            self.next()
            self.eat("punct", "(")
            while not self.at("punct", ")"):
                key = self.eat("ident").val.lower()
                self.eat("punct", "=")
                val = str(_lit_value(self.parse_expr()))
                if key == "pair_delimiter":
                    pair_delim = val
                elif key == "kv_delimiter":
                    kv_delim = val
                elif key == "quote":
                    quote = val
                else:
                    raise KqlSyntaxError(
                        f"unsupported parse-kv property {key!r}"
                    )
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", ")")
        for d in (pair_delim, kv_delim) + ((quote,) if quote else ()):
            if len(d) != 1:
                raise KqlSyntaxError(
                    "parse-kv delimiters/quote must be single characters"
                )
        pd_esc, kv_esc = re.escape(pair_delim), re.escape(kv_delim)
        cols = {}
        for name, typ in fields:
            if quote:
                q = re.escape(quote)
                val_pat = f"(?:{q}([^{q}]*){q}|([^{pd_esc}]*))"
            else:
                val_pat = f"([^{pd_esc}]*)"
            pat = (
                f"(?:^|{pd_esc}){re.escape(name)}{kv_esc}{val_pat}"
            )
            c = F.regexp_extract(F.col(src).cast("string"), pat, 1)
            if quote:
                c = F.when(c != "", c).otherwise(
                    F.regexp_extract(F.col(src).cast("string"), pat, 2)
                )
            c = F.nullif(c, F.lit(""))
            cols[name] = c.cast(typ)
        return df.withColumns(cols)

    def _parse_like(self, df, where: bool):
        # kind=simple (default) escapes the literal segments;
        # kind=regex uses them as raw regex fragments; kind=relaxed
        # maps to simple — the extractor already try_casts, so failed
        # typed captures become null, the relaxed contract. Unknown
        # kinds refuse (a previous version swallowed kind=regex and
        # silently ran SIMPLE semantics — a mis-run, never again).
        regex_lits = False
        if self.at_ident("kind"):
            self.next()
            self.eat("punct", "=")
            k = self.eat("ident").val
            if k == "regex":
                regex_lits = True
            elif k not in ("simple", "relaxed"):
                raise KqlSyntaxError(
                    f"parse kind=simple|regex|relaxed, got {k!r}"
                )
        src = self.eat("ident").val
        self.eat("ident", "with")
        segments = []
        while True:
            t = self.peek()
            if t.kind == "str":
                segments.append(self.next().val)
                continue
            if t.kind == "ident":
                name = self.next().val
                typ = "string"
                if self.at("punct", ":"):
                    self.next()
                    typ = self.eat("ident").val
                segments.append(
                    (name, {"int": "int", "long": "long", "real": "double",
                            "double": "double", "string": "string",
                            "datetime": "timestamp"}.get(typ, "string"))
                )
                continue
            break
        fn = K.parse_where if where else K.parse_pattern
        return fn(df, src, *segments, regex_literals=regex_lits)

    def _op_serialize(self, df):
        """``| serialize`` — marks the preceding sort's order as the
        serialized row order; row_number()/prev()/next() then window
        over it. KQL's unkeyed serialize is inherently single-reducer
        (the serialize_rows wrapper documents the same)."""
        if not getattr(self, "_last_order", None):
            raise KqlSyntaxError(
                "serialize requires a preceding `sort by` to pin the "
                "row order (Spark has no implicit table order)"
            )
        return df

    def _op_make_series(self, df):
        """``make-series Name=agg(x) [default=d] on Ts step <1h|1d|1m|1s>
        by Keys`` — the canonical Kusto time-series operator, through
        kql.make_series (dense axis via sequence+broadcast, per-bucket
        map-side combine). Without from/to the bounds derive from the
        data; ``from lo to hi`` pins the axis to [lo, hi) and aligns
        buckets to ``lo`` (Kusto's bin_at semantics — round-13)."""
        name, e = self._parse_named_expr(agg=True)
        default = 0.0
        if self.at_ident("default"):
            self.next()
            self.eat("punct", "=")
            default = float(_lit_value(self.parse_expr()))
        self.eat("ident", "on")
        on_col = self.eat("ident").val
        lo = hi = None
        if self.at_ident("from"):
            self.next()
            lo = self.parse_expr().as_type("timestamp")
            self.eat("ident", "to")
            hi = self.parse_expr().as_type("timestamp")
        self.eat("ident", "step")
        st = self.next()
        if st.kind != "ts":
            raise KqlSyntaxError("make-series step must be a timespan")
        grain = {86400.0: "day", 3600.0: "hour", 60.0: "minute",
                 1.0: "second"}.get(float(st.val))
        if grain is None:
            raise KqlSyntaxError(
                "make-series step must be one of 1d/1h/1m/1s"
            )
        by = []
        if self.at_ident("by"):
            self.next()
            while True:
                by.append(self.eat("ident").val)
                if self.at("punct", ","):
                    self.next()
                    continue
                break
        return K.make_series(
            df, on_col, grain, by, e.c(), default=default,
            value_name=name, ts_name=on_col, exploded=True,
            lo=lo, hi=hi,
        )

    def _op_evaluate(self, df):
        """``| evaluate <plugin>(…)`` — the plugin family, each bound to
        the library's deterministic implementation (others raise loudly
        naming the plugin):

        - ``pivot(PivotCol [, agg(AggCol)] [, GroupCol…])`` →
          kql.pivot_kql's single conditional-aggregate plan (the bare
          form defaults to count() with implicit grouping, per ADX);
        - ``python(typeof(*, Col:type …), 'script')`` →
          kql.evaluate_python's mapInPandas sandbox (`*` expands to
          the input schema);
        - ``basket([Threshold])`` → kql.basket_frequent over ALL input
          columns (the exact variant of Kusto's sampled Apriori);
        - ``autocluster([Threshold])`` → kql.autocluster over all
          columns;
        - ``diffpatterns(SplitCol, ValueA, ValueB [, Threshold])`` →
          kql.diffpatterns, pattern columns = everything but SplitCol;
        - ``ipv4_lookup(LookupTable, IpCol [, CidrCol])`` →
          kql.ipv4_lookup's broadcast non-equi containment join;
        - ``bag_unpack(Col [, 'Prefix']) : (Name:type, …)`` →
          kql.bag_unpack's single codegen'd from_json — the output
          schema spec is REQUIRED (ADX's data-driven key inference
          would force an extra full scan; the declared spec keeps the
          plan static), matching ADX's own documented spec syntax;
        - ``narrow([IdCol, …])`` → kql.narrow's native unpivot. With
          id columns they carry the row identity (the scale path);
          bare ``narrow()`` emits ADX's (Row, Column, Value) shape
          with Row from the pinned serialize order — requires a
          preceding ``sort by`` exactly like row_number()."""
        t = self.eat("ident")
        if t.val == "pivot":
            self.eat("punct", "(")
            pivot_col = self.eat("ident").val
            if self.at("punct", ")"):
                # ADX's bare pivot(Col): default count() aggregation,
                # remaining columns group implicitly
                self.next()
                return K.pivot_kql(
                    df,
                    pivot_col,
                    pivot_col,
                    agg="count",
                    group_cols=[c for c in df.columns if c != pivot_col],
                )
            self.eat("punct", ",")
            agg_name = self.eat("ident").val
            self.eat("punct", "(")
            agg_col = self.eat("ident").val
            self.eat("punct", ")")
            groups = None
            if self.at("punct", ","):
                groups = []
                while self.at("punct", ","):
                    self.next()
                    groups.append(self.eat("ident").val)
            self.eat("punct", ")")
            return K.pivot_kql(
                df, pivot_col, agg_col, agg=agg_name, group_cols=groups
            )
        if t.val in ("basket", "autocluster"):
            self.eat("punct", "(")
            threshold = 0.05 if t.val == "basket" else 0.1
            if not self.at("punct", ")"):
                threshold = float(_lit_value(self.parse_expr()))
            self.eat("punct", ")")
            if t.val == "basket":
                return K.basket_frequent(
                    df, list(df.columns), min_support=threshold
                )
            return K.autocluster(df, list(df.columns), min_support=threshold)
        if t.val == "diffpatterns":
            self.eat("punct", "(")
            split_col = self.eat("ident").val
            self.eat("punct", ",")
            value_a = _lit_value(self.parse_expr())
            self.eat("punct", ",")
            value_b = _lit_value(self.parse_expr())
            threshold = 0.05
            if self.at("punct", ","):
                self.next()
                threshold = float(_lit_value(self.parse_expr()))
            self.eat("punct", ")")
            cols = [c for c in df.columns if c != split_col]
            return K.diffpatterns(
                df, cols, split_col, value_a, value_b, min_support=threshold
            )
        if t.val == "ipv4_lookup":
            self.eat("punct", "(")
            lk = self._parse_source()
            self.eat("punct", ",")
            ip_col = self.eat("ident").val
            cidr_col = "network"
            if self.at("punct", ","):
                self.next()
                cidr_col = self.eat("ident").val
            self.eat("punct", ")")
            return K.ipv4_lookup(df, lk, ip_col, cidr_col=cidr_col)
        if t.val == "python":
            # evaluate python(typeof(*, Col:type …), 'script') — the
            # ADX inline-Python plugin, bound to kql.evaluate_python's
            # mapInPandas sandbox (script sees the Arrow batch as `df`,
            # binds `result`); `*` expands to the input schema
            type_map = {
                "string": "string", "int": "int", "long": "long",
                "real": "double", "double": "double", "bool": "boolean",
                "boolean": "boolean", "datetime": "timestamp",
                "guid": "string",
            }
            self.eat("punct", "(")
            self.eat("ident", "typeof")
            self.eat("punct", "(")
            fields: list[str] = []
            while not self.at("punct", ")"):
                if self.at("punct", "*"):
                    self.next()
                    fields.extend(
                        f"`{f.name}` {f.dataType.simpleString()}"
                        for f in df.schema.fields
                    )
                else:
                    nm = self.eat("ident").val
                    self.eat("punct", ":")
                    ty = self.eat("ident").val
                    if ty not in type_map:
                        raise KqlSyntaxError(
                            f"unsupported python plugin output type {ty!r}"
                        )
                    fields.append(f"`{nm}` {type_map[ty]}")
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", ")")
            self.eat("punct", ",")
            script = _lit_value(self.parse_expr())
            if not isinstance(script, str):
                raise KqlSyntaxError(
                    "python plugin script must be a string literal"
                )
            self.eat("punct", ")")
            if not fields:
                raise KqlSyntaxError(
                    "python plugin typeof() spec is empty"
                )
            return K.evaluate_python(df, script, ", ".join(fields))
        if t.val in (
            "activity_counts_metrics", "session_count",
            "activity_engagement", "funnel_sequence",
        ):
            # the ADX activity-analytics plugin family, bound to the
            # library's actor-keyed plans (operators/activity.py):
            # activity_counts_metrics(Actor, Ts) — per-day counts/
            # dcounts/new/cumulative; session_count(Actor, Ts
            # [, Lookback]) — sessions started per day;
            # activity_engagement(Actor, Ts, InnerSpan, OuterSpan) —
            # rolling DAU/WAU-style ratios; funnel_sequence(Actor, Ts,
            # State, MidState) — (prev, next) pair counts around a
            # state. Day granularity (the plugins' bin argument
            # defaults); timespan args convert to whole days/seconds.
            from kusto_pre_forge_spark.operators import activity as A

            self.eat("punct", "(")
            actor = self.eat("ident").val
            self.eat("punct", ",")
            ts_col = self.eat("ident").val
            if t.val == "activity_counts_metrics":
                self.eat("punct", ")")
                return A.activity_counts_metrics(df, actor, ts_col)
            if t.val == "session_count":
                lookback = 1800.0
                if self.at("punct", ","):
                    self.next()
                    lb = self.next()
                    if lb.kind != "ts":
                        raise KqlSyntaxError(
                            "session_count lookback must be a timespan"
                        )
                    lookback = float(lb.val)
                self.eat("punct", ")")
                return A.session_count(
                    df, actor, ts_col, lookback_seconds=lookback
                )
            if t.val == "activity_engagement":
                self.eat("punct", ",")
                inner = self.next()
                self.eat("punct", ",")
                outer = self.next()
                self.eat("punct", ")")
                if inner.kind != "ts" or outer.kind != "ts":
                    raise KqlSyntaxError(
                        "activity_engagement spans must be timespans"
                    )
                return A.rolling_engagement(
                    df, actor, ts_col,
                    inner_days=max(1, int(float(inner.val) // 86400)),
                    outer_days=max(1, int(float(outer.val) // 86400)),
                )
            self.eat("punct", ",")
            state = self.eat("ident").val
            self.eat("punct", ",")
            mid = str(_lit_value(self.parse_expr()))
            self.eat("punct", ")")
            return A.funnel_sequence(df, actor, ts_col, state, mid)
        if t.val == "rows_near":
            # rows_near(Condition, NumRows [, RowsAfter]) — context rows
            # around matches, over the pinned serialize order (require a
            # preceding sort, the row_number convention; KQL defines the
            # plugin over the serialized sequence)
            order = getattr(self, "_last_order", None)
            if not order:
                raise KqlSyntaxError(
                    "rows_near needs `sort by …` first to pin the row "
                    "order"
                )
            self.eat("punct", "(")
            cond = self.parse_expr(df=df)
            self.eat("punct", ",")
            before = int(_lit_value(self.parse_expr()))
            after = None
            if self.at("punct", ","):
                self.next()
                after = int(_lit_value(self.parse_expr()))
            self.eat("punct", ")")
            return K.rows_near(
                df, cond.c(), order, before=before, after=after
            )
        if t.val == "sequence_detect":
            # sequence_detect(TsCol, MaxStepWindow, MaxSpanWindow,
            # State == 's1', State == 's2', …, ActorCol) — bound to the
            # funnel-join plan (activity.sequence_detect). The step
            # expressions must all test the SAME column against string
            # literals (the library's state-column contract); richer
            # predicates refuse by name.
            from kusto_pre_forge_spark.operators.activity import (
                sequence_detect,
            )

            self.eat("punct", "(")
            ts_col = self.eat("ident").val
            self.eat("punct", ",")
            step_w = self.next()
            self.eat("punct", ",")
            span_w = self.next()
            if step_w.kind != "ts" or span_w.kind != "ts":
                raise KqlSyntaxError(
                    "sequence_detect windows must be timespan literals"
                )
            steps = []
            state_col = None
            while True:
                self.eat("punct", ",")
                first = self.eat("ident")
                if self.at("punct", ")"):
                    actor = first.val
                    self.next()
                    break
                if state_col is None:
                    state_col = first.val
                elif first.val != state_col:
                    raise KqlSyntaxError(
                        "sequence_detect steps must all test the same "
                        f"column ({state_col!r}), got {first.val!r} — "
                        "richer predicates: use activity.funnel_steps"
                    )
                self.eat("punct", "==")
                steps.append(str(_lit_value(self.parse_expr())))
            if len(steps) < 2:
                raise KqlSyntaxError(
                    "sequence_detect needs at least two step expressions"
                )
            return sequence_detect(
                df, actor, ts_col, state_col, steps,
                max_step_seconds=int(step_w.val),
                max_span_seconds=int(span_w.val),
            )
        if t.val == "bag_unpack":
            self.eat("punct", "(")
            col = self.eat("ident").val
            prefix = ""
            if self.at("punct", ","):
                self.next()
                prefix = self.eat("str").val
            self.eat("punct", ")")
            if not self.at("punct", ":"):
                raise KqlSyntaxError(
                    "bag_unpack needs the output schema — append "
                    "': (Name:type, …)' (data-driven key inference "
                    "would force an extra full scan; the declared spec "
                    "keeps the plan static)"
                )
            self.next()
            self.eat("punct", "(")
            type_map = {
                "string": "string", "int": "int", "long": "long",
                "real": "double", "double": "double", "bool": "boolean",
                "boolean": "boolean", "datetime": "timestamp",
                "guid": "string",
            }
            fields = []
            while True:
                nm = self.eat("ident").val
                self.eat("punct", ":")
                ty = self.eat("ident").val
                if ty not in type_map:
                    raise KqlSyntaxError(
                        f"unsupported bag_unpack type {ty!r}"
                    )
                fields.append((nm, type_map[ty]))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            self.eat("punct", ")")
            out = K.bag_unpack(
                df, col, ", ".join(f"`{n}` {ty}" for n, ty in fields)
            )
            if prefix:
                out = out.withColumnsRenamed(
                    {n: prefix + n for n, _ in fields}
                )
            return out
        if t.val == "narrow":
            self.eat("punct", "(")
            ids = []
            if not self.at("punct", ")"):
                while True:
                    ids.append(self.eat("ident").val)
                    if self.at("punct", ","):
                        self.next()
                        continue
                    break
            self.eat("punct", ")")
            if ids:
                vals = [c for c in df.columns if c not in ids]
                return K.narrow(df, ids, vals)
            rn = F.row_number().over(self._serial_window()).cast("long")
            return K.narrow(
                df.withColumn("Row", rn), ["Row"], list(df.columns)
            )
        if t.val in ("sliding_window_counts", "rolling_percentile",
                     "new_activity_metrics"):
            # the remaining activity-analytics plugins, bound to the
            # library's dense-axis plans (operators/activity.py) in the
            # engine's established abbreviated-argument convention (the
            # activity_counts_metrics family drops ADX's start/end/bin
            # positions; lookback/window timespans convert to whole
            # days): sliding_window_counts(Id, Ts [, Lookback]) —
            # trailing-window event + distinct-actor counts per day;
            # rolling_percentile(Value, Pct, Ts [, Window]) — exact
            # trailing percentile per day; new_activity_metrics(Id, Ts
            # [, bin]) — per-bin dcount/new/retained/churn (+rates).
            from kusto_pre_forge_spark.operators import activity as A

            self.eat("punct", "(")
            if t.val == "rolling_percentile":
                value = self.eat("ident").val
                self.eat("punct", ",")
                pct = float(_lit_value(self.parse_expr()))
                self.eat("punct", ",")
                ts_col = self.eat("ident").val
                window = 7
                if self.at("punct", ","):
                    self.next()
                    w = self.next()
                    if w.kind != "ts":
                        raise KqlSyntaxError(
                            "rolling_percentile window must be a timespan"
                        )
                    window = max(1, int(float(w.val) // 86400))
                self.eat("punct", ")")
                return A.rolling_percentile(
                    df, value, ts_col, percentile=pct, window_days=window
                )
            actor = self.eat("ident").val
            self.eat("punct", ",")
            ts_col = self.eat("ident").val
            if t.val == "sliding_window_counts":
                lookback = 7
                if self.at("punct", ","):
                    self.next()
                    lb = self.next()
                    if lb.kind != "ts":
                        raise KqlSyntaxError(
                            "sliding_window_counts lookback must be a "
                            "timespan"
                        )
                    lookback = max(1, int(float(lb.val) // 86400))
                self.eat("punct", ")")
                return A.sliding_window_counts(
                    df, actor, ts_col, lookback_days=lookback
                )
            bin_name = "day"
            if self.at("punct", ","):
                self.next()
                bin_name = self.eat("ident").val
            self.eat("punct", ")")
            if bin_name not in ("day", "hour", "week"):
                raise KqlSyntaxError(
                    "new_activity_metrics bin must be day/hour/week"
                )
            return A.new_activity_metrics(df, actor, ts_col, bin=bin_name)
        if t.val == "active_users_count":
            # active_users_count(Id, Ts [, Lookback [, MinActiveDays]])
            # — engaged actives: users active on >= MinActiveDays
            # DISTINCT days of the trailing window (abbreviated-argument
            # convention; timespan lookback converts to whole days)
            from kusto_pre_forge_spark.operators import activity as A

            self.eat("punct", "(")
            actor = self.eat("ident").val
            self.eat("punct", ",")
            ts_col = self.eat("ident").val
            lookback, min_days = 7, 2
            if self.at("punct", ","):
                self.next()
                lb = self.next()
                if lb.kind != "ts":
                    raise KqlSyntaxError(
                        "active_users_count lookback must be a timespan"
                    )
                lookback = max(1, int(float(lb.val) // 86400))
            if self.at("punct", ","):
                self.next()
                min_days = int(_lit_value(self.parse_expr()))
            self.eat("punct", ")")
            return A.active_users_count(
                df, actor, ts_col,
                lookback_days=lookback, min_active_days=min_days,
            )
        if t.val == "dcount_intersect":
            # dcount_intersect(Key, Group, 'g1', 'g2', …) — progressive
            # intersection dcounts s0..sN−1. ADX's plugin consumes hll()
            # sketch columns; the engine's exact-dcount contract binds
            # the (key, group) form instead — same output shape, exact
            # counts (the percentiles()-is-exact convention).
            self.eat("punct", "(")
            key = self.eat("ident").val
            self.eat("punct", ",")
            group = self.eat("ident").val
            names: list[str] = []
            while self.at("punct", ","):
                self.next()
                names.append(str(_lit_value(self.parse_expr())))
            self.eat("punct", ")")
            if not names:
                raise KqlSyntaxError(
                    "dcount_intersect needs at least one group literal"
                )
            return K.dcount_intersect(df, key, group, names)
        if t.val == "diffpatterns_text":
            # diffpatterns_text(Text, SplitBool [, TopK [, MinDocs]]) —
            # the terms whose document frequency differs most between
            # the split's true/false row sets
            self.eat("punct", "(")
            text_col = self.eat("ident").val
            self.eat("punct", ",")
            split = self.parse_expr(df=df)
            top_k, min_docs = 20, 2
            if self.at("punct", ","):
                self.next()
                top_k = int(_lit_value(self.parse_expr()))
            if self.at("punct", ","):
                self.next()
                min_docs = int(_lit_value(self.parse_expr()))
            self.eat("punct", ")")
            return K.diffpatterns_text(
                df, text_col, split.c(), top_k=top_k, min_doc_count=min_docs
            )
        raise KqlSyntaxError(
            f"unsupported evaluate plugin {t.val!r} at offset {t.pos}"
        )

    def _op_lookup(self, df):
        """``| lookup [kind=leftouter] (DimTable) on Key[, …]`` — the
        dimension-join operator, bound to kql.lookup's explicit
        broadcast-hint plan (KQL defines lookup for small right sides;
        the fact side never shuffles). Common-key ``on`` form only —
        the $left/$right form belongs to ``join``."""
        kind = "leftouter"
        if self.at_ident("kind"):
            self.next()
            self.eat("punct", "=")
            kind = self.eat("ident").val
            if kind not in ("leftouter", "inner"):
                raise KqlSyntaxError(
                    f"lookup supports kind=leftouter|inner, got {kind!r}"
                )
        dim = self._parse_source()
        self.eat("ident", "on")
        on = []
        while True:
            if self.at("punct", "$"):
                raise KqlSyntaxError(
                    "lookup takes common-key `on Col` terms; use join "
                    "for the $left.x == $right.y form"
                )
            on.append(self.eat("ident").val)
            if self.at("punct", ","):
                self.next()
                continue
            break
        return K.lookup(df, dim, on, kind=kind)

    def _op_fork(self, df):
        """``| fork (name = subquery) (subquery) …`` — every branch is
        a stage chain over ONE evaluation of the source (bound through
        kql.materialize's lazy persist: the scan + upstream pipeline
        runs once, the plan sharing ADX's fork promises). ADX emits one
        result table per branch; a single-DataFrame runner represents
        that faithfully as the branch-labeled union — ``_kpf_fork``
        names the branch (explicit name or ``fork_<i>``) and each ADX
        result table is ``where _kpf_fork == <name>``; unionByName with
        allowMissingColumns lets branches of different shapes coexist
        (absent columns null)."""
        src = K.materialize(df)
        outer_order = getattr(self, "_last_order", None)
        outer_names = getattr(self, "_last_order_names", None)
        out = None
        idx = 0
        try:
            while self.at("punct", "("):
                self.next()
                name = f"fork_{idx}"
                if (
                    self.peek().kind == "ident"
                    and self.peek(1).kind == "punct"
                    and self.peek(1).val == "="
                ):
                    name = self.next().val
                    self.next()  # '='
                self._last_order = None  # branch-scoped sort state
                self._last_order_names = None
                b = self._parse_stage(src)
                while self.at("punct", "|"):
                    self.next()
                    b = self._parse_stage(b)
                self.eat("punct", ")")
                b = b.withColumn("_kpf_fork", F.lit(name))
                out = (
                    b
                    if out is None
                    else out.unionByName(b, allowMissingColumns=True)
                )
                idx += 1
        finally:
            self._last_order = outer_order
            self._last_order_names = outer_names
        if out is None:
            raise KqlSyntaxError(
                "fork needs at least one (subquery) branch"
            )
        return out

    def _op_facet(self, df):
        """``| facet by C1[, C2…] [with (stages)]`` — ADX returns one
        value-count table per facet column (its ``count_`` convention)
        plus, with the ``with`` clause, the source pipeline's own
        table. Single-frame representation (the fork convention): the
        branch-labeled union — ``_kpf_facet`` names the facet column,
        ``value`` is the stringified facet value (columns of different
        types must union), ``count_`` the count; ``with``-clause rows
        carry label ``_with`` and keep their own columns. Each facet is
        one map-side-combinable aggregate over the shared source."""
        self.eat("ident", "by")
        src = K.materialize(df)
        cols = []
        while True:
            cols.append(self.eat("ident").val)
            if self.at("punct", ","):
                self.next()
                continue
            break
        out = None
        for c in cols:
            b = (
                src.groupBy(F.col(c).cast("string").alias("value"))
                .agg(F.count(F.lit(1)).alias("count_"))
                .withColumn("_kpf_facet", F.lit(c))
            )
            out = b if out is None else out.unionByName(b)
        if self.at_ident("with"):
            self.next()
            self.eat("punct", "(")
            outer_order = getattr(self, "_last_order", None)
            outer_names = getattr(self, "_last_order_names", None)
            self._last_order = None
            self._last_order_names = None
            try:
                b = self._parse_stage(src)
                while self.at("punct", "|"):
                    self.next()
                    b = self._parse_stage(b)
            finally:
                self._last_order = outer_order
                self._last_order_names = outer_names
            self.eat("punct", ")")
            b = b.withColumn("_kpf_facet", F.lit("_with"))
            out = out.unionByName(b, allowMissingColumns=True)
        return out

    def _op_top_hitters(self, df):
        """``| top-hitters N of Col [by SumCol]`` — ADX's approximate
        heavy-hitters, bound EXACTLY (one map-side-combinable aggregate
        + TakeOrderedAndProject, never a full sort) under ADX's output
        column names (``approximate_count_<Col>`` /
        ``approximate_sum_<SumCol>``): exact is a valid refinement of
        an approximate contract, and at Spark's partial-agg cost there
        is nothing to approximate away. Ties break value asc — the
        deterministic order the engine documents for top-nested."""
        n = int(_lit_value(self.parse_expr()))
        self.eat("ident", "of")
        col = self.eat("ident").val
        if self.at_ident("by"):
            self.next()
            sum_col = self.eat("ident").val
            out_col = f"approximate_sum_{sum_col}"
            agg = F.sum(F.col(sum_col)).alias(out_col)
        else:
            out_col = f"approximate_count_{col}"
            agg = F.count(F.lit(1)).alias(out_col)
        return (
            df.groupBy(col)
            .agg(agg)
            .orderBy(F.col(out_col).desc(), F.col(col).asc())
            .limit(n)
        )

    def _op_sample(self, df):
        """``| sample N`` — ADX documents sample as geared for speed,
        not even distribution: ANY N rows satisfy the contract, so the
        binding is a plain limit (LocalLimit per task, no shuffle, no
        rand() pass over 100 TB — the rows a node reaches first, which
        is precisely what Kusto's own sample returns)."""
        return df.limit(int(_lit_value(self.parse_expr())))

    def _op_sample_distinct(self, df):
        """``| sample-distinct N of Col`` — up to N distinct values of
        Col (ADX: arbitrary which ones): distinct + limit, one hash
        aggregate with early-out."""
        n = int(_lit_value(self.parse_expr()))
        self.eat("ident", "of")
        col = self.eat("ident").val
        return df.select(col).distinct().limit(n)

    def _op_invoke(self, df):
        """``| invoke f(args…)`` — apply a let-bound function literal
        with the piped table as its first tabular parameter (Kusto's
        invoke contract). The body re-parses over the SAME lineage — no
        materialization; its stages fuse into the surrounding plan like
        inline text."""
        t = self.eat("ident")
        lam = self.lambdas.get(t.val)
        if lam is None:
            raise KqlSyntaxError(
                f"invoke target {t.val!r} at offset {t.pos} is not a "
                "let-bound function literal"
            )
        params, body = lam
        bt, bs = self._parse_lambda_args(t.val, params, piped_df=df)
        return self._lambda_env(body, bt, bs).parse_query()

    def _parse_col_pattern(self, pos_hint="column pattern"):
        """Column name or ``*`` wildcard (``Name``, ``Name*``,
        ``*Name``, bare ``*``) — the project-keep / project-reorder
        argument grammar. Returns a name predicate."""
        if self.at("punct", "*"):
            self.next()
            if self.peek().kind == "ident" and not self.at_ident(
                "asc", "desc"
            ):
                suf = self.next().val
                return lambda c, s=suf: c.endswith(s)
            return lambda c: True
        name = self.eat("ident").val
        if self.at("punct", "*"):
            self.next()
            return lambda c, p=name: c.startswith(p)
        return lambda c, n=name: c == n

    def _op_project_keep(self, df):
        """``| project-keep Pat[, …]`` — keep matching columns in their
        ORIGINAL table order (ADX contract: output order is the
        table's, not the argument list's). Pure projection — column
        pruning reaches the scan."""
        pats = []
        while True:
            pats.append(self._parse_col_pattern())
            if self.at("punct", ","):
                self.next()
                continue
            break
        keep = [c for c in df.columns if any(p(c) for p in pats)]
        if not keep:
            raise KqlSyntaxError("project-keep matched no columns")
        return df.select(*keep)

    def _op_project_reorder(self, df):
        """``| project-reorder Pat [asc|desc][, …]`` — matched columns
        first (each pattern's matches in table order, or name-sorted
        under asc/desc), unmatched columns after in their original
        order (ADX's contract). Metadata-only projection."""
        ordered: list[str] = []
        taken: set[str] = set()
        while True:
            pat = self._parse_col_pattern()
            direction = None
            if self.at_ident("asc", "desc"):
                direction = self.next().val
            matches = [c for c in df.columns if pat(c) and c not in taken]
            if direction == "asc":
                matches.sort()
            elif direction == "desc":
                matches.sort(reverse=True)
            ordered.extend(matches)
            taken.update(matches)
            if self.at("punct", ","):
                self.next()
                continue
            break
        rest = [c for c in df.columns if c not in taken]
        return df.select(*ordered, *rest)

    def _op_reduce(self, df):
        """``| reduce by Expr [with (threshold=…, characters=…)]`` —
        string pattern clustering, bound to kql.reduce_by's
        DETERMINISTIC masker (Kusto's own grouping is a proprietary
        similarity heuristic; a deterministic pattern is what runs and
        oracles can agree on). The with() knobs tune Kusto's heuristic
        and are accepted-and-ignored — the masker has no tuning
        surface; unknown properties refuse by name."""
        if self.at_ident("kind"):
            self.next()
            self.eat("punct", "=")
            self.eat("ident")  # source|... — output shape is the same
        self.eat("ident", "by")
        e = self.parse_expr(df=df)
        if self.at_ident("with"):
            self.next()
            self.eat("punct", "(")
            while not self.at("punct", ")"):
                key = self.eat("ident").val
                if key not in ("threshold", "characters"):
                    raise KqlSyntaxError(
                        f"unsupported reduce property {key!r}"
                    )
                self.eat("punct", "=")
                self.parse_expr()
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", ")")
        return K.reduce_by(df, e.c())

    def _op_consume(self, df):
        """``| consume [decodeblocks=true]`` — run the pipeline for its
        side effects and return no rows. Kusto returns an empty result;
        the single-frame runner returns the empty frame with the
        pipeline's schema (limit 0 — Catalyst still builds and can
        execute the full upstream plan under an action that forces
        it)."""
        if self.at_ident("decodeblocks"):
            self.next()
            self.eat("punct", "=")
            self.next()
        return df.limit(0)

    def _scan_span(self, arrow: bool) -> list:
        """Capture a scan sub-expression's raw token span up to a
        depth-0 boundary: ``;`` / ``)`` always, ``,`` for assignment
        lists (arrow=False), ``=>`` for step conditions (arrow=True).
        Spans re-parse later — as Spark expressions on the window
        profiles, as row-level closures on the sequential machine."""
        depth = 0
        start = self.i
        while True:
            t = self.peek()
            if t.kind == "eof":
                break
            if t.kind == "punct":
                if t.val in ("(", "[", "{"):
                    depth += 1
                elif t.val in (")", "]", "}"):
                    if depth == 0:
                        break
                    depth -= 1
                elif depth == 0:
                    if t.val == ";":
                        break
                    if not arrow and t.val == ",":
                        break
                    if (
                        arrow
                        and t.val == "="
                        and self.peek(1).kind == "punct"
                        and self.peek(1).val == ">"
                    ):
                        break
            self.next()
        return self.toks[start:self.i]

    def _span_kexpr(self, span: list, df) -> KExpr:
        """Re-parse a captured token span as ONE Spark expression (the
        lambda-body sub-parser convention)."""
        p = self._lambda_env(span, {}, {})
        e = p.parse_expr(df=df)
        if p.peek().kind != "eof":
            raise KqlSyntaxError("scan: trailing tokens in expression")
        return e

    def _op_scan(self, df):
        """``| scan [with_match_id=M] declare (s:type[=init], …) with
        (step s1: Cond [=> s = Expr, …]; …)`` — KQL scan.

        Two execution tiers, chosen by shape:

        - WINDOW PROFILES (single variable, 1–2 steps, the accumulate /
          restart shapes, state-free conditions) bind to
          kql.scan_accumulate's two-phase distributed prefix sum — the
          shuffle-minimal plan, preferred whenever windows can express
          the semantics. The restart profile keeps the engine's
          documented restart semantics (rows before the first restart
          row still accumulate — kql.scan_accumulate's contract).
        - GENERAL MULTI-STEP state machines (3+ steps, multiple state
          variables, state-reading conditions, distinct per-step
          assignments — session labeling, multi-state funnels) bind to
          kql.scan_steps' sequence semantics (steps scanned last→first
          per record; capture continues the instance at the step —
          non-first steps — else advances the instance at the previous
          step, else — first step only — starts a NEW sequence with a
          fresh match id; non-capturing records are not emitted;
          kql.scan_steps' docstring is the full contract). Conditions
          and
          assignments compile to row-level closures
          (_compile_scan_pyexpr's scalar subset — unsupported functions
          refuse by name at parse time). The global text-layer form
          walks rows in ONE task (Kusto's own scan is sequential);
          bound the input or key the scan (kql.scan_steps(by=…)) at
          scale.

        Scan is defined over the serialize order, so a ``sort by``/
        ``serialize`` must precede it; the machine additionally needs
        plain-column sort keys (project computed keys first)."""
        order = getattr(self, "_last_order", None)
        if not order:
            raise KqlSyntaxError(
                "scan needs `sort by …` first to pin the row order"
            )
        match_name = None
        if self.at_ident("with_match_id"):
            self.next()
            self.eat("punct", "=")
            match_name = self.eat("ident").val
        self.eat("ident", "declare")
        self.eat("punct", "(")
        decls = []  # (var, ktype, python default)
        while True:
            var = self.eat("ident").val
            self.eat("punct", ":")
            ktype = self.eat("ident").val
            default = None
            if self.at("punct", "="):
                self.next()
                neg = False
                if self.at("punct", "-"):
                    self.next()
                    neg = True
                tok = self.next()
                if tok.kind in ("num", "ts"):
                    default = -tok.val if neg else tok.val
                elif tok.kind == "str" and not neg:
                    default = tok.val
                elif tok.kind == "ident" and tok.val in ("true", "false"):
                    default = tok.val == "true"
                else:
                    raise KqlSyntaxError(
                        "scan: declare defaults are literals"
                    )
            decls.append((var, ktype, default))
            if self.at("punct", ","):
                self.next()
                continue
            break
        self.eat("punct", ")")
        var_names = {d[0] for d in decls}
        self.eat("ident", "with")
        self.eat("punct", "(")
        steps_raw = []  # (name, cond span, [(var, rhs span), …], emit)
        has_mute = False
        while self.at_ident("step"):
            self.next()
            sname = self.eat("ident").val
            emit = True
            if self.at_ident("output"):
                # ADX per-step output directive: all (default) emits,
                # none captures/advances state but suppresses the
                # record (mute intermediate funnel steps); last (emit
                # only each sequence's final record at the step) needs
                # pending-row buffering — refuse by name until asked
                self.next()
                self.eat("punct", "=")
                oval = self.eat("ident").val
                if oval == "none":
                    emit = False
                    has_mute = True
                elif oval != "all":
                    raise KqlSyntaxError(
                        f"scan step output={oval!r} unsupported "
                        "(all/none; 'last' needs pending-row buffering "
                        "— route through kql.partition_apply)"
                    )
            self.eat("punct", ":")
            cond_span = self._scan_span(arrow=True)
            if not cond_span:
                raise KqlSyntaxError("scan: empty step condition")
            assigns = []
            if (
                self.at("punct", "=")
                and self.peek(1).kind == "punct"
                and self.peek(1).val == ">"
            ):
                self.next()
                self.next()
                while True:
                    tgt = self.eat("ident").val
                    if tgt not in var_names:
                        raise KqlSyntaxError(
                            f"scan assigns to undeclared variable {tgt!r}"
                        )
                    self.eat("punct", "=")
                    rhs = self._scan_span(arrow=False)
                    if not rhs:
                        raise KqlSyntaxError(
                            "scan: empty assignment expression"
                        )
                    assigns.append((tgt, rhs))
                    if self.at("punct", ","):
                        self.next()
                        continue
                    break
            steps_raw.append((sname, cond_span, assigns, emit))
            if self.at("punct", ";"):
                self.next()
        self.eat("punct", ")")
        if not steps_raw:
            raise KqlSyntaxError("scan: at least one step is required")

        def is_true(span):
            return (
                len(span) == 1
                and span[0].kind == "ident"
                and span[0].val == "true"
            )

        def mentions_state(span):
            return any(
                tk.kind == "ident" and tk.val in var_names for tk in span
            )

        def shape(span):
            return [(tk.kind, tk.val) for tk in span]

        var0 = decls[0][0]

        def is_acc(rhs):
            return (
                len(rhs) >= 3
                and rhs[0].kind == "ident"
                and rhs[0].val == var0
                and rhs[1].kind == "punct"
                and rhs[1].val == "+"
            )

        fast = (
            len(decls) == 1
            # the window profiles model running sums FROM ZERO; a
            # non-trivial declared default must go to the machine,
            # which seeds new sequences with it (the r13 standing
            # rule: honor the consumed token or refuse — never ignore)
            and decls[0][2] in (None, 0)
            and len(steps_raw) <= 2
            and not has_mute
            and all(
                len(a) == 1 and a[0][0] == var0
                for _, _, a, _ in steps_raw
            )
            and not any(mentions_state(c) for _, c, _, _ in steps_raw)
        )
        if fast:
            if len(steps_raw) == 1:
                fast = is_acc(steps_raw[0][2][0][1])
            else:
                a_rhs = steps_raw[0][2][0][1]
                b_rhs = steps_raw[1][2][0][1]
                fast = (
                    not is_acc(a_rhs)
                    and is_acc(b_rhs)
                    and is_true(steps_raw[1][1])
                    and shape(a_rhs) == shape(b_rhs[2:])
                )
        if fast:
            if len(steps_raw) == 1:
                cond_span, rhs = steps_raw[0][1], steps_raw[0][2][0][1]
                value = self._span_kexpr(rhs[2:], df).c()
                src = (
                    df
                    if is_true(cond_span)
                    else df.filter(self._span_kexpr(cond_span, df).c())
                )
                restart = F.lit(False)
            else:
                restart = self._span_kexpr(steps_raw[0][1], df).c()
                value = self._span_kexpr(steps_raw[0][2][0][1], df).c()
                src = df
            out = K.scan_accumulate(
                src, by=[], order=order, value=value, restart=restart,
                out_name=var0,
            )
            keep = [c for c in df.columns] + [var0]
            if match_name is not None:
                out = out.withColumnRenamed("scan_match_id", match_name)
                keep.append(match_name)
            return out.select(*keep)

        # ---- general multi-step sequential machine (kql.scan_steps)
        order_names = getattr(self, "_last_order_names", None)
        if not order_names or any(o is None for o in order_names):
            raise KqlSyntaxError(
                "scan (multi-step): sort keys must be plain columns — "
                "project computed sort keys first"
            )
        missing = [o[0] for o in order_names if o[0] not in df.columns]
        if missing:
            raise KqlSyntaxError(
                "scan (multi-step): sort key(s) "
                f"{missing!r} were projected away before the scan — "
                "keep them through the stage chain"
            )
        type_map = {
            "long": "bigint", "int": "int", "real": "double",
            "double": "double", "string": "string", "bool": "boolean",
            "boolean": "boolean", "datetime": "timestamp",
            "timespan": "double",
        }
        declare = {}
        for var, ktype, default in decls:
            if ktype not in type_map:
                raise KqlSyntaxError(
                    f"scan: unsupported declared type {ktype!r}"
                )
            declare[var] = (default, type_map[ktype])
        steps = []
        snames = [sr[0] for sr in steps_raw]
        for sname, cond_span, assigns, emit in steps_raw:
            steps.append(
                (
                    sname,
                    _compile_scan_pyexpr(cond_span, snames),
                    [
                        (v, _compile_scan_pyexpr(r, snames))
                        for v, r in assigns
                    ],
                    emit,
                )
            )
        mid = match_name or "_kpf_mid"
        out = K.scan_steps(
            df, order=order_names, steps=steps, declare=declare,
            match_name=mid, step_name="_kpf_step",
        )
        keep = [c for c in df.columns] + [d[0] for d in decls]
        if match_name is not None:
            keep.append(match_name)
        return out.select(*keep)

    def _op_partition(self, df):
        """``| partition [hint.…=…] by Col ( stages )`` — run the
        subquery once per distinct key value and union the results:
        Kusto's LEGACY partition contract including its bounded
        partition count (64 — the cap IS the design: partition is the
        low-cardinality per-key subquery operator; high-cardinality
        per-key work belongs to summarize/windows/partition_apply).

        Plan: the source is pinned once (kql.materialize), the bounded
        key list is the only driver-side data (the pivot-width valve
        pattern), and each branch re-parses the stage span over
        ``src where Col == key`` — a union of filtered branches over
        one shared evaluation; Spark schedules the branches itself
        (hint.spread / hint.concurrency are Kusto scheduling metadata,
        accepted and ignored; hint.strategy likewise — the bounded
        plan serves all strategies at this operator's cardinality
        contract)."""
        while self.at_ident("hint"):
            self.next()
            self.eat("punct", ".")
            self.eat("ident")
            self.eat("punct", "=")
            self.next()
        self.eat("ident", "by")
        col = self.eat("ident").val
        self.eat("punct", "(")
        start = self.i
        src = K.materialize(df)
        cap = 64
        keys = [
            r[0]
            for r in src.select(col).distinct().limit(cap + 1).collect()
        ]
        if len(keys) > cap:
            raise KqlSyntaxError(
                f"partition by {col!r}: over {cap} distinct values — "
                "Kusto's partition operator is bounded by design; use "
                "summarize/window forms or kql.partition_apply for "
                "high-cardinality keys"
            )
        keys.sort(key=lambda k: (k is not None, k))
        outer_order = getattr(self, "_last_order", None)
        outer_names = getattr(self, "_last_order_names", None)
        out = None
        branches = keys if keys else [object()]  # empty source: one
        # replay over the empty frame keeps parse + schema
        try:
            for k in branches:
                self.i = start
                self._last_order = None
                self._last_order_names = None
                if not keys:
                    b = src.limit(0)
                elif k is None:
                    b = src.filter(F.col(col).isNull())
                else:
                    b = src.filter(F.col(col) == F.lit(k))
                b = self._parse_stage(b)
                while self.at("punct", "|"):
                    self.next()
                    b = self._parse_stage(b)
                out = (
                    b
                    if out is None
                    else out.unionByName(b, allowMissingColumns=True)
                )
        finally:
            self._last_order = outer_order
            self._last_order_names = outer_names
        self.eat("punct", ")")
        return out

    def _parse_search_source(self) -> DataFrame:
        """Query-initial ``search [in (T1, T2)] 'term'`` — the
        cross-table free-text form, bound to kql.find_in's term path
        (case-insensitive contains over every string column of each
        table, per-table scan-local predicates, plan-level union).
        Output carries ADX's ``$table`` source column. Without the
        ``in`` clause the search spans every table the runner was given
        (the database-wide form). The ``T | search 'term'`` stage form
        parses in _op_search."""
        # (name, df) PAIRS, not a dict: `search in (T, T | where …)`
        # repeats the display name and a dict would drop a source.
        tables: list[tuple[str, DataFrame]] = []
        if self.at_ident("in"):
            self.next()
            self.eat("punct", "(")
            idx = 0
            while True:
                tk = self.peek()
                name = (
                    tk.val
                    if tk.kind == "ident" and (
                        tk.val in self.tables or self._is_table(tk.val)
                    )
                    else f"table_{idx}"
                )
                tables.append((name, self._parse_source()))
                idx += 1
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            self.eat("punct", ")")
        else:
            tables = list(self.tables.items())
        if not tables:
            raise KqlSyntaxError("search has no tables to search")
        term = self.eat("str").val
        return K.find_in(tables, term=term, source_col="$table")

    def _parse_find(self) -> DataFrame:
        """``find [withsource=Col] in (T1[, T2…]) where <pred>
        [project c1[, …]]`` — cross-table search, bound to
        kql.find_in: per-table scan-local predicates (pushdown and
        column pruning apply per source), plan-level union with
        null-padded schema alignment, a source-tag column. ``* has /
        contains 'term'`` is the wildcard form (each table's own
        all-string-columns test); any other predicate is compiled once
        and applied to every table (columns must resolve in each —
        Kusto's own rule for column references in find)."""
        source_col = "source_"
        if self.at_ident("withsource"):
            self.next()
            self.eat("punct", "=")
            source_col = self.eat("ident").val
        self.eat("ident", "in")
        self.eat("punct", "(")
        # (name, df) pairs — `find in (T, T | where …)` repeats the
        # display name; both operands must survive into the union.
        tables: list[tuple[str, DataFrame]] = []
        idx = 0
        while True:
            t = self.peek()
            name = (
                t.val
                if t.kind == "ident" and (
                    t.val in self.tables or self._is_table(t.val)
                )
                else f"table_{idx}"
            )
            tables.append((name, self._parse_source()))
            idx += 1
            if self.at("punct", ","):
                self.next()
                continue
            break
        self.eat("punct", ")")
        self.eat("ident", "where")
        term = None
        predicate = None
        if self.at("punct", "*"):
            self.next()
            op = self.eat("ident").val
            if op not in ("has", "contains"):
                raise KqlSyntaxError(
                    f"find wildcard predicate supports has/contains, "
                    f"got {op!r}"
                )
            term = self.eat("str").val
        else:
            predicate = self.parse_expr().c()
        project = None
        if self.at_ident("project"):
            self.next()
            project = []
            while True:
                project.append(self.eat("ident").val)
                if self.at("punct", ","):
                    self.next()
                    continue
                break
        return K.find_in(
            tables, term=term, predicate=predicate, project=project,
            source_col=source_col,
        )

    def _op_as(self, df):
        """``| as [hint.materialized=true] Name`` — bind the pipeline
        so far to a query-scoped name usable as a source later in the
        SAME query (Kusto's tabular alias). ``hint.materialized=true``
        pins one evaluation through kql.materialize; without it the
        name shares lineage lazily (Kusto's default — re-evaluation is
        Catalyst's call)."""
        pinned = False
        if self.at_ident("hint"):
            self.next()
            self.eat("punct", ".")
            self.eat("ident", "materialized")
            self.eat("punct", "=")
            pinned = self.eat("ident").val == "true"
        name = self.eat("ident").val
        out = K.materialize(df) if pinned else df
        self.tables[name] = out
        return out

    def _op_union(self, df):
        """``| union T1[, T2…]`` — the right operand is a SOURCE (table
        name or parenthesized pipeline), never the rest of the stage
        chain: `A | union B | count` counts the UNION, so the `| count`
        belongs to parse_pipeline's loop, not to B. (A previous version
        greedily consumed trailing stages into the right side — silent
        wrong results for that standard shape.)

        ``withsource=Col`` tags each row with the operand it came from
        (the left pipeline is ``source_0``, sources then in order);
        ``kind=outer`` (ADX's default) maps to unionByName with null
        padding; ``kind=inner`` keeps only the columns COMMON to all
        operands (ADX's documented inner-union schema) — schemas are
        known at plan time, so the intersection is a plan-side select,
        no data pass."""
        source_col = None
        kind = "outer"
        while self.at_ident("withsource", "kind", "isfuzzy"):
            prop = self.next().val
            self.eat("punct", "=")
            val = self.next().val
            if prop == "withsource":
                source_col = val
            elif prop == "kind":
                if val not in ("inner", "outer"):
                    raise KqlSyntaxError(f"unsupported union kind {val!r}")
                kind = val
        idx = 0
        if source_col is not None:
            df = df.withColumn(source_col, F.lit("source_0"))
        while True:
            tk = self.peek()
            rname = (
                tk.val
                if tk.kind == "ident" and (
                    tk.val in self.tables or self._is_table(tk.val)
                )
                else None
            )
            right = self._parse_source()
            idx += 1
            if source_col is not None:
                right = right.withColumn(
                    source_col, F.lit(rname or f"source_{idx}")
                )
            if kind == "inner":
                rcols = set(right.columns)
                common = [c for c in df.columns if c in rcols]
                if not common:
                    raise KqlSyntaxError(
                        "union kind=inner: operands share no columns"
                    )
                df = df.select(*common).unionByName(right.select(*common))
            else:
                df = df.unionByName(right, allowMissingColumns=True)
            if self.at("punct", ","):
                self.next()
                continue
            break
        return df

    def _op_join(self, df):
        kind = "inner"
        strategy = None
        while self.at_ident("kind", "hint"):
            if self.at_ident("kind"):
                self.next()
                self.eat("punct", "=")
                kraw = self.eat("ident").val
                if kraw not in _JOIN_KINDS:
                    raise KqlSyntaxError(f"unsupported join kind {kraw!r}")
                kind = _JOIN_KINDS[kraw]
                continue
            # hint.strategy=broadcast|shuffle (ADX's join hints):
            # broadcast forces the RIGHT side broadcast (ADX broadcasts
            # the left in its docs' $left/$right orientation, but its
            # remoting guidance and this runner both treat the
            # parenthesized operand as the small side); shuffle forces
            # a hash-partitioned join via the SHUFFLE_HASH hint.
            # hint.shufflekey/num_partitions are Kusto scheduling
            # metadata — accepted and ignored (Catalyst plans keys).
            self.next()
            self.eat("punct", ".")
            prop = self.eat("ident").val
            self.eat("punct", "=")
            val = self.next().val
            if prop == "strategy":
                if val not in ("broadcast", "shuffle"):
                    raise KqlSyntaxError(
                        f"join hint.strategy=broadcast|shuffle, got {val!r}"
                    )
                strategy = val
            elif prop not in ("shufflekey", "num_partitions", "remote"):
                raise KqlSyntaxError(f"unsupported join hint {prop!r}")
        self.eat("punct", "(")
        right = self.parse_pipeline()
        self.eat("punct", ")")
        if strategy == "broadcast":
            right = F.broadcast(right)
        elif strategy == "shuffle":
            right = right.hint("shuffle_hash")
        self.eat("ident", "on")
        on = []
        while True:
            if self.at("punct", "$"):
                self.next()
                side1 = self.eat("ident").val
                self.eat("punct", ".")
                c1 = self.eat("ident").val
                self.eat("punct", "==")
                self.eat("punct", "$")
                side2 = self.eat("ident").val
                self.eat("punct", ".")
                c2 = self.eat("ident").val
                lcol = c1 if side1 == "left" else c2
                rcol = c2 if side2 == "right" else c1
                on.append(df[lcol] == right[rcol])
            else:
                on.append(self.eat("ident").val)
            if self.at("punct", ","):
                self.next()
                continue
            break
        if kind.startswith("swap:"):
            how = kind[5:]
            if all(isinstance(x, str) for x in on):
                return right.join(df, on=on, how=how)
            cond = on[0]
            for c in on[1:]:
                cond = cond & c
            return right.join(df, on=cond, how=how)
        if all(isinstance(x, str) for x in on):
            return df.join(right, on=on, how=kind)
        cond = on[0]
        for c in on[1:]:
            cond = cond & c
        return df.join(right, on=cond, how=kind)

    # ---- named expr (Name=expr | expr)
    def _parse_named_expr(self, agg=False, default_prefix=None):
        t = self.peek()
        if (
            t.kind == "ident"
            and self.peek(1).kind == "punct"
            and self.peek(1).val == "="
            and not (self.peek(2).kind == "punct" and self.peek(2).val == "=")
        ):
            name = self.next().val
            self.next()  # =
            e = self.parse_expr()
            return name, e
        e = self.parse_expr()
        if e.name is not None:
            return e.name, e
        if default_prefix is not None:
            return f"{default_prefix}_{self.i}", e
        return f"Column_{self.i}", e

    # ---- expressions (precedence climbing)
    def parse_expr(self, df=None) -> KExpr:
        return self._parse_or()

    def _parse_or(self) -> KExpr:
        left = self._parse_and()
        while self.at_ident("or"):
            self.next()
            right = self._parse_and()
            left = KExpr(left.c() | right.c())
        return left

    def _parse_and(self) -> KExpr:
        left = self._parse_not()
        while self.at_ident("and"):
            self.next()
            right = self._parse_not()
            left = KExpr(left.c() & right.c())
        return left

    def _parse_not(self) -> KExpr:
        if self.at_ident("not"):
            self.next()
            self.eat("punct", "(")
            e = self.parse_expr()
            self.eat("punct", ")")
            return KExpr(~e.c())
        return self._parse_comparison()

    def _parse_comparison(self) -> KExpr:
        left = self._parse_add()
        t = self.peek()
        if t.kind == "punct" and t.val in ("==", "!=", "<>", "<", "<=", ">",
                                           ">=", "=~", "!~"):
            self.next()
            right = self._parse_add()
            lc, rc = _coerce_pair(left, right)
            if t.val == "==":
                return KExpr(lc == rc)
            if t.val in ("!=", "<>"):
                return KExpr(lc != rc)
            if t.val == "<":
                return KExpr(lc < rc)
            if t.val == "<=":
                return KExpr(lc <= rc)
            if t.val == ">":
                return KExpr(lc > rc)
            if t.val == ">=":
                return KExpr(lc >= rc)
            if t.val == "=~":
                return KExpr(F.lower(lc) == F.lower(rc))
            return KExpr(F.lower(lc) != F.lower(rc))
        neg = False
        if t.kind == "punct" and t.val == "!":
            # !has / !contains / !in
            self.next()
            t = self.peek()
            neg = True
        if t.kind == "ident" and t.val in ("has_any", "has_all"):
            self.next()
            self.eat("punct", "(")
            terms = []
            while True:
                terms.append(str(_lit_value(self.parse_expr())))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            self.eat("punct", ")")
            base = left.as_type("string")
            conds = [K.has_term(base, term) for term in terms]
            out = conds[0]
            for c in conds[1:]:
                out = (out | c) if t.val == "has_any" else (out & c)
            return KExpr(~out if neg else out)
        if t.kind == "ident" and t.val in (
            "has", "has_cs", "contains", "contains_cs", "startswith",
            "startswith_cs", "endswith", "endswith_cs", "matches", "in",
            "between",
        ):
            self.next()
            if t.val == "matches":
                self.eat("ident", "regex")
                pat = self._parse_add()
                out = left.as_type("string").rlike(_lit_value(pat))
            elif t.val == "in":
                self.eat("punct", "(")
                vals = []
                while True:
                    vals.append(_lit_value(self.parse_expr()))
                    if self.at("punct", ","):
                        self.next()
                        continue
                    break
                self.eat("punct", ")")
                out = left.c().isin(vals)
            elif t.val == "between":
                self.eat("punct", "(")
                lo = self.parse_expr()
                self.eat("punct", "..")
                hi = self.parse_expr()
                self.eat("punct", ")")
                out = (left.c() >= lo.c()) & (left.c() <= hi.c())
            elif t.val in ("has", "has_cs"):
                tv = str(_lit_value(self._parse_add()))
                if t.val == "has_cs":
                    # case-SENSITIVE whole-term: same boundaries, no (?i)
                    import re as _re

                    out = left.as_type("string").rlike(
                        "(^|[^a-zA-Z0-9])"
                        + _re.escape(tv)
                        + "($|[^a-zA-Z0-9])"
                    )
                else:
                    out = K.has_term(left.as_type("string"), tv)
            elif t.val in ("contains", "contains_cs"):
                term = self._parse_add()
                base = left.as_type("string")
                if t.val == "contains":
                    out = F.contains(
                        F.lower(base), F.lower(F.lit(_lit_value(term)))
                    )
                else:
                    out = base.contains(_lit_value(term))
            elif t.val in ("startswith", "startswith_cs"):
                tv = str(_lit_value(self._parse_add()))
                if t.val == "startswith_cs":
                    out = left.as_type("string").startswith(tv)
                else:
                    out = F.lower(left.as_type("string")).startswith(
                        tv.lower()
                    )
            else:  # endswith / endswith_cs
                tv = str(_lit_value(self._parse_add()))
                if t.val == "endswith_cs":
                    out = left.as_type("string").endswith(tv)
                else:
                    out = F.lower(left.as_type("string")).endswith(
                        tv.lower()
                    )
            return KExpr(~out if neg else out)
        if neg:
            raise KqlSyntaxError(f"unexpected '!' at offset {t.pos}")
        return left

    def _parse_add(self) -> KExpr:
        left = self._parse_mul()
        while self.at("punct", "+") or self.at("punct", "-"):
            op = self.next().val
            right = self._parse_mul()
            left = _arith(left, right, op)
        return left

    def _parse_mul(self) -> KExpr:
        left = self._parse_unary()
        while (
            self.at("punct", "*") or self.at("punct", "/")
            or self.at("punct", "%")
        ):
            op = self.next().val
            right = self._parse_unary()
            left = _arith(left, right, op)
        return left

    def _parse_unary(self) -> KExpr:
        if self.at("punct", "-"):
            self.next()
            e = self._parse_unary()
            return KExpr(
                -e.c(), kind=e.kind,
                pyval=(-e.pyval if e.pyval is not None else None),
            )
        return self._parse_postfix()

    def _parse_postfix(self) -> KExpr:
        e = self._parse_primary()
        while True:
            if self.at("punct", "."):
                self.next()
                field = self.eat("ident").val
                if e.kind == "struct":
                    e = KExpr(e.c().getItem(field))
                elif e.kind == "variant":
                    e = KExpr(
                        e.col, kind="variant", vbase=e.vbase,
                        vpath=f"{e.vpath}.{field}",
                    )
                else:
                    e = KExpr(
                        e.c(), kind="variant", vbase=e.c(), vpath=field
                    )
            elif self.peek().kind == "ident" and self.peek().braq:
                # Name['field'] — the lexer folds quoted brackets into
                # one ident token; in postfix position that surface form
                # is KQL's bracket member access, same as .field
                field = self.next().val
                if e.kind == "struct":
                    e = KExpr(e.c().getItem(field))
                elif e.kind == "variant":
                    e = KExpr(
                        e.col, kind="variant", vbase=e.vbase,
                        vpath=f"{e.vpath}.{field}",
                    )
                else:
                    e = KExpr(
                        e.c(), kind="variant", vbase=e.c(), vpath=field
                    )
            elif self.at("punct", "["):
                self.next()
                idx = self.parse_expr()
                self.eat("punct", "]")
                if e.kind == "variant":
                    e = KExpr(
                        e.col, kind="variant", vbase=e.vbase,
                        vpath=f"{e.vpath}[{int(_lit_value(idx))}]",
                    )
                elif idx.pyval is not None:
                    e = KExpr(e.c().getItem(idx.pyval))
                else:
                    # computed index (LetterList[toint(rand(27))]):
                    # F.get is 0-based like KQL and NULL-safe
                    e = KExpr(F.get(e.c(), idx.c().cast("int")))
            else:
                return e

    def _parse_primary(self) -> KExpr:
        t = self.next()
        if t.kind == "str":
            return KExpr(F.lit(t.val), kind="string", pyval=t.val)
        if t.kind == "num":
            if isinstance(t.val, int) and not (
                -(2**63) <= t.val <= 2**63 - 1
            ):
                raise KqlSyntaxError(
                    f"integer literal {t.val} exceeds long range "
                    f"at offset {t.pos}"
                )
            return KExpr(F.lit(t.val), kind="number", pyval=t.val)
        if t.kind == "ts":
            return KExpr(
                F.lit(float(t.val)), kind="timespan", pyval=float(t.val)
            )
        if t.kind == "punct" and t.val == "(":
            e = self.parse_expr()
            self.eat("punct", ")")
            return e
        if t.kind == "punct" and t.val == "*":
            return KExpr(F.lit(1), name="*")
        if t.kind != "ident":
            raise KqlSyntaxError(
                f"unexpected token {t.val!r} at offset {t.pos}"
            )
        name = t.val
        if name in ("true", "false"):
            return KExpr(F.lit(name == "true"), pyval=name == "true")
        if name == "null":
            return KExpr(F.lit(None))
        if self.at("punct", "("):
            if name == "dynamic":
                return self._parse_dynamic_literal()
            if name == "toscalar":
                # tabular -> scalar: run the subquery NOW (driver-side,
                # exactly Kusto's semantics) and embed the result
                self.eat("punct", "(")
                sub = self.parse_pipeline()
                self.eat("punct", ")")
                row = sub.limit(1).collect()
                val = row[0][0] if row else None
                return KExpr(F.lit(val), pyval=val)
            self.next()
            args = []
            if not self.at("punct", ")"):
                while True:
                    args.append(self.parse_expr())
                    if self.at("punct", ","):
                        self.next()
                        continue
                    break
            self.eat("punct", ")")
            return self._call(name, args, t.pos)
        if name in self.lets:
            return self.lets[name]
        return KExpr(F.col(name), name=name)

    def _parse_dynamic_literal(self) -> KExpr:
        self.eat("punct", "(")
        if self.peek().kind == "ident" and self.peek().braq:
            # dynamic(['x']) — a single quoted string in brackets lexes
            # as a bracket-quoted identifier; here it is the one-element
            # list literal
            v = self.next().val
            self.eat("punct", ")")
            return KExpr(F.lit([v]), pyval=[v])
        self.eat("punct", "[")
        vals = []
        if not self.at("punct", "]"):
            while True:
                e = self.parse_expr()
                vals.append(_lit_value(e))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
        self.eat("punct", "]")
        self.eat("punct", ")")
        return KExpr(F.lit(vals), pyval=vals)

    # ---- functions
    def _call(self, name: str, args: list[KExpr], pos: int) -> KExpr:
        if name in self.lambdas:
            # scalar-position call of a let-bound function literal:
            # bind args positionally as lets, re-parse the body as an
            # expression (body type is use-inferred, Kusto's own rule)
            params, body = self.lambdas[name]
            scalars = [p for p in params if p[1] != "tabular"]
            if len(args) > len(scalars):
                raise KqlSyntaxError(
                    f"too many arguments for function {name!r} at offset {pos}"
                )
            bind = {pn: a for (pn, _, _), a in zip(scalars, args)}
            for pn, _, dflt in scalars[len(args):]:
                if dflt is None:
                    raise KqlSyntaxError(
                        f"missing argument for parameter {pn!r} of {name!r}"
                    )
                bind[pn] = KExpr(F.lit(dflt), pyval=dflt)
            p = self._lambda_env(body, {}, bind)
            e = p.parse_expr()
            p.eat("eof")
            return e
        if name in self.functions:
            return KExpr(self.functions[name](*[a.c() for a in args]))
        fn = getattr(self, "_fn_" + name, None)
        if fn is not None:
            return fn(args)
        builder = _SCALAR_FNS.get(name)
        if builder is not None:
            fields = _STRUCT_FNS.get(name)
            try:
                col = builder(*args)
            except TypeError as ex:
                # arity mismatch on a bound scalar: a grammar error,
                # not an engine crash
                raise KqlSyntaxError(
                    f"wrong number of arguments for {name}() at offset "
                    f"{pos}: {ex}"
                ) from None
            return KExpr(
                col,
                kind="struct" if fields else "plain",
                struct_fields=fields,
            )
        raise KqlSyntaxError(
            f"unsupported function {name!r} at offset {pos}"
        )

    def _fn_dynamic(self, args):
        raise KqlSyntaxError("dynamic() parses its literal in _parse_primary")

    def _fn_rand(self, args):
        # KQL rand() -> real [0,1); rand(n) -> a DISCRETE uniform over
        # the integers 0..n-1 (real-typed, like Kusto) — not a
        # continuous value in [0, n)
        if not args:
            return KExpr(F.rand())
        return KExpr(F.floor(F.rand() * args[0].c()).cast("double"))

    def _fn_range(self, args):
        # SCALAR range(start, stop, step) -> inclusive-stop array (the
        # tabular range source parses elsewhere)
        step = args[2].c() if len(args) > 2 else F.lit(1)
        return KExpr(F.sequence(
            args[0].c().cast("long"),
            args[1].c().cast("long"),
            step.cast("long"),
        ))

    def _fn_toscalar(self, args):
        raise KqlSyntaxError("toscalar() parses its subquery in _parse_primary")

    def _fn_count(self, args):
        if not args:
            return KExpr(F.count(F.lit(1)), name="count_")
        return KExpr(F.count(args[0].c()))

    def _fn_countif(self, args):
        return KExpr(F.sum(F.when(args[0].c(), 1).otherwise(0)))

    def _fn_iff(self, args):
        return KExpr(
            F.when(args[0].c(), args[1].c()).otherwise(args[2].c())
        )

    _fn_iif = _fn_iff

    def _fn_case(self, args):
        out = args[-1].c()
        pairs = list(zip(args[:-1:2], args[1::2]))
        col = None
        for cond, val in pairs:
            col = (
                F.when(cond.c(), val.c())
                if col is None
                else col.when(cond.c(), val.c())
            )
        return KExpr(col.otherwise(out) if col is not None else out)

    def _serial_window(self):
        from pyspark.sql.window import Window

        order = getattr(self, "_last_order", None)
        if not order:
            raise KqlSyntaxError(
                "row_number()/prev()/next() need `sort by …| serialize` "
                "first to pin the row order"
            )
        return Window.partitionBy().orderBy(*order)

    def _fn_row_number(self, args):
        rn = F.row_number().over(self._serial_window())
        if args:
            rn = rn + F.lit(int(_lit_value(args[0])) - 1)
        return KExpr(rn.cast("long"))

    def _fn_prev(self, args):
        off = int(_lit_value(args[1])) if len(args) > 1 else 1
        return KExpr(F.lag(args[0].c(), off).over(self._serial_window()))

    def _fn_next(self, args):
        off = int(_lit_value(args[1])) if len(args) > 1 else 1
        return KExpr(F.lead(args[0].c(), off).over(self._serial_window()))

    def _fn_row_cumsum(self, args):
        w = self._serial_window().rowsBetween(
            __import__("pyspark").sql.window.Window.unboundedPreceding, 0
        )
        return KExpr(F.sum(args[0].c()).over(w))

    def _fn_ago(self, args):
        span = args[0]
        return KExpr(
            F.current_timestamp()
            - F.make_dt_interval(secs=span.col)
        )

    def _fn_bin(self, args):
        x, span = args
        if span.kind == "timespan":
            secs = F.lit(float(_lit_value(span)))
            return KExpr(
                F.timestamp_seconds(
                    F.floor(F.unix_timestamp(x.c()) / secs) * secs
                )
            )
        s = span.c()
        return KExpr(F.floor(x.c() / s) * s)

    def _fn_bin_at(self, args):
        """``bin_at(x, size, fixedPoint)`` — bins aligned to the fixed
        point rather than zero/epoch (the make-series from/to
        alignment, exposed as the scalar). Timespan sizes bin
        datetimes; numeric sizes bin numbers."""
        x, span, fixed = args
        if span.kind == "timespan":
            secs = F.lit(float(_lit_value(span)))
            f = F.unix_timestamp(fixed.as_type("timestamp"))
            return KExpr(
                F.timestamp_seconds(
                    f + F.floor(
                        (F.unix_timestamp(x.as_type("timestamp")) - f)
                        / secs
                    ) * secs
                )
            )
        s = span.c()
        f = fixed.c()
        return KExpr(f + F.floor((x.c() - f) / s) * s)

    def _fn_datetime(self, args):
        return KExpr(args[0].as_type("timestamp"))

    def _fn_totimespan(self, args):
        if args[0].kind == "timespan":
            return args[0]
        return KExpr(args[0].c(), kind="timespan")


# --------------------------------------- row-level expression compiler
#
# The general multi-step `scan` runs a sequential state machine
# (kql.scan_steps) whose step conditions/assignments read STATE
# variables — not expressible as Spark Columns. This compiles a
# captured token span into a plain-Python closure ``env → value``
# (env = row columns + state vars), mirroring KQL's operator grammar
# for the scalar subset the machine needs. Unsupported constructs
# refuse by name at PARSE time (the loud-failure contract), never
# mid-task.

def _scan_num(v):
    import datetime as _dt

    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    if hasattr(v, "total_seconds") and not isinstance(v, _dt.datetime):
        return v.total_seconds()  # pandas Timedelta
    return v


def _scan_arith(a, b, op: str):
    import datetime as _dt

    if a is None or b is None:
        return None
    a, b = _scan_num(a), _scan_num(b)
    a_dt = isinstance(a, _dt.date)
    b_dt = isinstance(b, _dt.date)
    if op == "+":
        if a_dt and isinstance(b, (int, float)):
            return a + _dt.timedelta(seconds=b)
        if b_dt and isinstance(a, (int, float)):
            return b + _dt.timedelta(seconds=a)
        return a + b
    if op == "-":
        if a_dt and b_dt:
            return _scan_num(a - b)
        if a_dt and isinstance(b, (int, float)):
            return a - _dt.timedelta(seconds=b)
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b if b != 0 else None
    return a % b if b != 0 else None  # %


def _scan_cmp(a, b, op: str) -> bool:
    if a is None or b is None:
        return False
    a, b = _scan_num(a), _scan_num(b)
    try:
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        return a >= b
    except TypeError:
        return False


def _scan_isnull(v) -> bool:
    # Arrow→pandas surfaces null numerics as NaN (and null timestamps
    # as NaT): the machine's null tests must see both as null
    return v is None or (isinstance(v, float) and v != v) or (
        v.__class__.__name__ == "NaTType"
    )


_SCAN_FNS = {
    "strlen": lambda s: None if s is None else len(s),
    "tolower": lambda s: None if s is None else str(s).lower(),
    "toupper": lambda s: None if s is None else str(s).upper(),
    "tostring": lambda v: "" if v is None else str(v),
    "tolong": lambda v: None if v is None else int(_scan_num(v)),
    "toint": lambda v: None if v is None else int(_scan_num(v)),
    "todouble": lambda v: None if v is None else float(_scan_num(v)),
    "toreal": lambda v: None if v is None else float(_scan_num(v)),
    "abs": lambda v: None if v is None else abs(_scan_num(v)),
    "round": lambda v, *n: None if v is None else round(
        _scan_num(v), int(n[0]) if n else 0
    ),
    "isempty": lambda s: _scan_isnull(s) or s == "",
    "isnotempty": lambda s: not (_scan_isnull(s) or s == ""),
    "isnull": _scan_isnull,
    "isnotnull": lambda v: not _scan_isnull(v),
    "coalesce": lambda *vs: next(
        (v for v in vs if not _scan_isnull(v)), None
    ),
    "strcat": lambda *vs: "".join("" if v is None else str(v) for v in vs),
    "iff": lambda c, a, b: a if c else b,
    "iif": lambda c, a, b: a if c else b,
    "max_of": lambda *vs: max(
        (_scan_num(v) for v in vs if not _scan_isnull(v)), default=None
    ),
    "min_of": lambda *vs: min(
        (_scan_num(v) for v in vs if not _scan_isnull(v)), default=None
    ),
    "substring": lambda s, start, *ln: None if s is None else (
        str(s)[int(start):] if not ln
        else str(s)[int(start):int(start) + int(ln[0])]
    ),
}


class _PyExprParser:
    """Pratt parser over a captured token span → ``env → value``.

    ``step_names``: ADX lets conditions/assignments reference a step's
    state as ``stepname.var`` (the docs' canonical cumulative form is
    ``c = x + s1.c``). In this machine each candidate instance's state
    is already flattened into ``env``, so the qualifier is pure sugar —
    ``s1.c`` reads ``env['c']``."""

    def __init__(self, toks: list, step_names=()):
        self.toks = list(toks) + [_Tok("eof", None, -1)]
        self.i = 0
        self.step_names = frozenset(step_names)

    def _peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def _next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def _at_punct(self, *vals):
        t = self._peek()
        return t.kind == "punct" and t.val in vals

    def parse(self):
        fn = self._or()
        t = self._peek()
        if t.kind != "eof":
            raise KqlSyntaxError(
                f"scan expression: unexpected {t.val!r} (the sequential "
                "scan evaluator supports the scalar operator subset; "
                "route richer expressions through kql.partition_apply)"
            )
        return fn

    def _or(self):
        left = self._and()
        while self._peek().kind == "ident" and self._peek().val == "or":
            self._next()
            right = self._and()
            left = (lambda a, b: lambda env: bool(a(env)) or bool(b(env)))(
                left, right
            )
        return left

    def _and(self):
        left = self._not()
        while self._peek().kind == "ident" and self._peek().val == "and":
            self._next()
            right = self._not()
            left = (lambda a, b: lambda env: bool(a(env)) and bool(b(env)))(
                left, right
            )
        return left

    def _not(self):
        if self._peek().kind == "ident" and self._peek().val == "not":
            self._next()
            inner = self._not()
            return lambda env: not bool(inner(env))
        return self._cmp()

    def _cmp(self):
        left = self._add()
        t = self._peek()
        if t.kind == "punct" and t.val in ("==", "!=", "<", "<=", ">", ">="):
            op = self._next().val
            right = self._add()
            return (
                lambda a, b, o: lambda env: _scan_cmp(a(env), b(env), o)
            )(left, right, op)
        if t.kind == "ident" and t.val in (
            "has", "contains", "startswith", "endswith",
        ):
            op = self._next().val
            right = self._add()

            def mk(a, b, o):
                def run(env):
                    s, needle = a(env), b(env)
                    if s is None or needle is None:
                        return False
                    s, needle = str(s).lower(), str(needle).lower()
                    if o == "has":
                        import re as _re

                        return bool(
                            _re.search(
                                r"(?<![0-9A-Za-z_])"
                                + _re.escape(needle)
                                + r"(?![0-9A-Za-z_])",
                                s,
                            )
                        )
                    if o == "contains":
                        return needle in s
                    if o == "startswith":
                        return s.startswith(needle)
                    return s.endswith(needle)

                return run

            return mk(left, right, op)
        if t.kind == "ident" and t.val == "in":
            self._next()
            vals = self._paren_list()
            return (lambda a, vs: lambda env: a(env) in vs)(left, vals)
        if t.kind == "punct" and t.val == "!" and (
            self._peek(1).kind == "ident" and self._peek(1).val == "in"
        ):
            self._next()
            self._next()
            vals = self._paren_list()
            return (lambda a, vs: lambda env: a(env) not in vs)(left, vals)
        return left

    def _paren_list(self):
        if not self._at_punct("("):
            raise KqlSyntaxError("scan expression: `in` needs a literal list")
        self._next()
        vals = []
        while not self._at_punct(")"):
            t = self._next()
            if t.kind not in ("num", "str", "ts"):
                raise KqlSyntaxError(
                    "scan expression: `in` list takes literals only"
                )
            vals.append(t.val)
            if self._at_punct(","):
                self._next()
        self._next()
        return vals

    def _add(self):
        left = self._mul()
        while self._at_punct("+", "-"):
            op = self._next().val
            right = self._mul()
            left = (
                lambda a, b, o: lambda env: _scan_arith(a(env), b(env), o)
            )(left, right, op)
        return left

    def _mul(self):
        left = self._unary()
        while self._at_punct("*", "/", "%"):
            op = self._next().val
            right = self._unary()
            left = (
                lambda a, b, o: lambda env: _scan_arith(a(env), b(env), o)
            )(left, right, op)
        return left

    def _unary(self):
        if self._at_punct("-"):
            self._next()
            inner = self._unary()
            return lambda env: (
                None if inner(env) is None else -_scan_num(inner(env))
            )
        return self._primary()

    def _primary(self):
        t = self._next()
        if t.kind in ("num", "str", "ts"):
            v = t.val
            return lambda env: v
        if t.kind == "punct" and t.val == "(":
            inner = self._or()
            if not self._at_punct(")"):
                raise KqlSyntaxError("scan expression: unbalanced (")
            self._next()
            return inner
        if t.kind == "ident":
            name = t.val
            if name == "true":
                return lambda env: True
            if name == "false":
                return lambda env: False
            if name == "datetime" and self._at_punct("("):
                self._next()
                lit = self._next()
                if not self._at_punct(")"):
                    raise KqlSyntaxError("scan expression: datetime(…)")
                self._next()
                import pandas as pd

                v = pd.Timestamp(str(lit.val))
                return lambda env: v
            if name in self.step_names and self._at_punct("."):
                self._next()
                field = self._next()
                if field.kind != "ident":
                    raise KqlSyntaxError(
                        "scan expression: step qualifier needs a "
                        "variable name after the dot"
                    )
                return lambda env, _n=field.val: env.get(_n)
            if self._at_punct("("):
                fn = _SCAN_FNS.get(name)
                if fn is None:
                    raise KqlSyntaxError(
                        f"scan expression: unsupported function {name!r} "
                        "(the sequential evaluator's scalar subset; route "
                        "richer logic through kql.partition_apply)"
                    )
                self._next()
                args = []
                while not self._at_punct(")"):
                    args.append(self._or())
                    if self._at_punct(","):
                        self._next()
                self._next()
                return (
                    lambda f, a: lambda env: f(*[x(env) for x in a])
                )(fn, args)
            return lambda env, _n=name: env.get(_n)
        raise KqlSyntaxError(
            f"scan expression: unexpected token {t.val!r}"
        )


def _compile_scan_pyexpr(span: list, step_names=()):
    """Compile a captured token span into ``env → value`` for the
    sequential scan machine (kql.scan_steps)."""
    return _PyExprParser(span, step_names).parse()


def _arith(a: KExpr, b: KExpr, op: str) -> KExpr:
    # datetime ± timespan: timespans are double seconds internally
    if op in ("+", "-") and (a.kind == "timespan") != (b.kind == "timespan"):
        dt, span, sign = (
            (a, b, 1) if b.kind == "timespan" else (b, a, 1)
        )
        iv = F.make_dt_interval(secs=span.col)
        if op == "+":
            return KExpr(dt.c() + iv)
        return KExpr(dt.c() - iv)
    ca, cb = a.c(), b.c()
    out = {
        "+": lambda: ca + cb,
        "-": lambda: ca - cb,
        "*": lambda: ca * cb,
        "/": lambda: ca / cb,
        "%": lambda: ca % cb,
    }[op]()
    kind = "timespan" if "timespan" in (a.kind, b.kind) else "plain"
    return KExpr(out, kind=kind)


def _datetime_diff(unit: str, a: Column, b: Column) -> Column:
    """KQL datetime_diff(part, later, earlier) = later − earlier in
    units of part. Fixed-width units via epoch arithmetic; calendar
    units via months_between (no timestampdiff Column API here)."""
    unit = unit.strip("'\"").lower()
    fixed = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
             "week": 604800}
    if unit in fixed:
        return (
            (F.unix_timestamp(a) - F.unix_timestamp(b)) / fixed[unit]
        ).cast("long")
    if unit == "month":
        return F.floor(F.months_between(a, b)).cast("long")
    if unit == "year":
        return F.floor(F.months_between(a, b) / 12).cast("long")
    raise KqlSyntaxError(f"unsupported datetime_diff unit {unit!r}")


def _lit_value(e: KExpr):
    """Extract the Python literal from a literal expression (errors on
    non-literals — used where the grammar requires constants)."""
    if e.pyval is None:
        raise KqlSyntaxError("expected a literal value")
    return e.pyval


_SCALAR_FNS = {
    "tostring": lambda a: a.as_type("string"),
    "toint": lambda a: a.as_type("int"),
    "tolong": lambda a: a.as_type("long"),
    "todouble": lambda a: a.as_type("double"),
    "toreal": lambda a: a.as_type("double"),
    "tobool": lambda a: a.as_type("boolean"),
    "todatetime": lambda a: a.as_type("timestamp"),
    "todynamic": lambda a: K.todynamic(a.c()),
    "parse_json": lambda a: K.todynamic(a.c()),
    "strcat": lambda *a: F.concat(*[x.as_type("string") for x in a]),
    "strcat_array": lambda a, s: F.array_join(a.c(), _lit_value(s)),
    "strlen": lambda a: F.length(a.as_type("string")),
    "substring": lambda a, start, *ln: (
        F.substring(
            a.as_type("string"),
            int(_lit_value(start)) + 1,
            int(_lit_value(ln[0])) if ln else (1 << 30),
        )
    ),
    "split": lambda a, sep: F.split(
        a.as_type("string"), re.escape(str(_lit_value(sep)))
    ),
    "extract": lambda pat, grp, src: F.regexp_extract(
        src.as_type("string"), str(_lit_value(pat)), int(_lit_value(grp))
    ),
    "replace_string": lambda src, old, new: F.replace(
        src.as_type("string"),
        F.lit(str(_lit_value(old))),
        F.lit(str(_lit_value(new))),
    ),
    "tolower": lambda a: F.lower(a.as_type("string")),
    "toupper": lambda a: F.upper(a.as_type("string")),
    "trim": lambda pat, a: F.regexp_replace(
        a.as_type("string"),
        f"^(?:{_lit_value(pat)})+|(?:{_lit_value(pat)})+$",
        "",
    ),
    "coalesce": lambda *a: F.coalesce(*[x.c() for x in a]),
    # KQL indexof is 0-based with -1 absent; Spark instr is 1-based
    # with 0 absent — the off-by-one cancels exactly
    "indexof": lambda s, sub: (
        F.instr(s.as_type("string"), str(_lit_value(sub))) - 1
    ).cast("long"),
    "countof": lambda s, sub: (
        (
            F.length(s.as_type("string"))
            - F.length(
                F.replace(
                    s.as_type("string"),
                    F.lit(str(_lit_value(sub))),
                    F.lit(""),
                )
            )
        )
        / F.lit(len(str(_lit_value(sub))) or 1)
    ).cast("long"),
    "reverse": lambda a: F.reverse(a.as_type("string")),
    "strrep": lambda a, n: F.repeat(a.as_type("string"), n.c().cast("int")),
    "strcat_delim": lambda d, *a: F.concat_ws(
        str(_lit_value(d)), *[x.as_type("string") for x in a]
    ),
    # KQL translate(from, to, text); Spark translate(text, from, to)
    "translate": lambda frm, to, s: F.translate(
        s.as_type("string"), str(_lit_value(frm)), str(_lit_value(to))
    ),
    "base64_encode_tostring": lambda a: F.base64(
        F.encode(a.as_type("string"), "UTF-8")
    ),
    "base64_decode_tostring": lambda a: F.decode(
        F.unbase64(a.as_type("string")), "UTF-8"
    ),
    "hash_sha256": lambda a: F.sha2(a.as_type("string"), 256),
    "hash_md5": lambda a: F.md5(a.as_type("string")),
    "tohex": lambda a: F.lower(F.hex(a.c().cast("long"))),
    "sign": lambda a: F.signum(a.c()),
    "log2": lambda a: F.log2(a.c()),
    "log10": lambda a: F.log10(a.c()),
    "isnan": lambda a: F.isnan(a.c()),
    "iif": lambda c, x, y: F.when(c.c(), x.c()).otherwise(y.c()),
    "isempty": lambda a: F.coalesce(a.as_type("string"), F.lit("")) == "",
    "isnotempty": lambda a: F.coalesce(a.as_type("string"), F.lit(""))
    != "",
    "isnull": lambda a: a.c().isNull(),
    "isnotnull": lambda a: a.c().isNotNull(),
    "now": lambda: F.current_timestamp(),
    "round": lambda a, *n: F.round(a.c(), int(_lit_value(n[0])) if n else 0),
    "floor": lambda a, s: F.floor(a.c() / s.c()) * s.c(),
    "abs": lambda a: F.abs(a.c()),
    "exp": lambda a: F.exp(a.c()),
    "log": lambda a: F.log(a.c()),
    "sqrt": lambda a: F.sqrt(a.c()),
    "pow": lambda a, b: F.pow(a.c(), b.c()),
    "array_length": lambda a: F.size(a.c()).cast("long"),
    "new_guid": lambda: F.expr("uuid()"),
    "startofday": lambda a: F.date_trunc("day", a.c()),
    "startofweek": lambda a: F.date_trunc("week", a.c()),
    "startofmonth": lambda a: F.date_trunc("month", a.c()),
    "startofyear": lambda a: F.date_trunc("year", a.c()),
    "endofday": lambda a: F.date_trunc("day", a.c())
    + F.make_dt_interval(days=F.lit(1))
    - F.make_dt_interval(secs=F.lit(1e-6)),
    "dayofweek": lambda a: (F.dayofweek(a.c()) - 1).cast("long"),
    "getmonth": lambda a: F.month(a.c()).cast("long"),
    "getyear": lambda a: F.year(a.c()).cast("long"),
    "hourofday": lambda a: F.hour(a.c()).cast("long"),
    # KQL datetime_diff(part, later, earlier) -> later - earlier in
    # units of part; Spark's timestampdiff counts start->end
    "datetime_diff": lambda part, a, b: _datetime_diff(
        str(_lit_value(part)), a.c(), b.c()
    ),
    "format_datetime": lambda a, fmt: K.format_datetime(
        a.c(), str(_lit_value(fmt))
    ),
    # aggregates
    "sum": lambda a: F.sum(a.c()),
    "sumif": lambda a, p: F.sum(F.when(p.c(), a.c()).otherwise(F.lit(0))),
    "avg": lambda a: F.avg(a.c()),
    "min": lambda a: F.min(a.c()),
    "max": lambda a: F.max(a.c()),
    "minif": lambda a, p: F.min(F.when(p.c(), a.c())),
    "maxif": lambda a, p: F.max(F.when(p.c(), a.c())),
    "dcount": lambda a: F.count_distinct(a.c()),
    "make_list": lambda a: F.collect_list(a.c()),
    "make_set": lambda a: F.array_sort(F.collect_set(a.c())),
    "take_any": lambda a: F.first(a.c(), ignorenulls=True),
    "any": lambda a: F.first(a.c(), ignorenulls=True),
    "arg_max": lambda m, r: F.max_by(r.c(), m.c()),
    "arg_min": lambda m, r: F.min_by(r.c(), m.c()),
    "stdev": lambda a: F.stddev(a.c()),
    "variance": lambda a: F.variance(a.c()),
    "dcountif": lambda a, p: F.count_distinct(F.when(p.c(), a.c())),
    "percentile": lambda a, p: F.percentile_approx(
        a.c(), _lit_value(p) / 100.0
    ),
}

# Everyday scalar completions (round-13): datetime parts, min/max_of,
# array/bag merges, float classification — each a direct builtin map.
_SCALAR_FNS.update({
    "format_timespan": lambda a, fmt: _format_timespan(
        a, str(_lit_value(fmt))
    ),
    "datetime_part": lambda part, a: _datetime_part(
        str(_lit_value(part)).lower(), a
    ),
    "week_of_year": lambda a: F.weekofyear(a.c()).cast("long"),
    "monthofyear": lambda a: F.month(a.c()).cast("long"),
    "dayofyear": lambda a: F.dayofyear(a.c()).cast("long"),
    "make_datetime": lambda y, mo, d, *hms: F.make_timestamp(
        y.c().cast("int"), mo.c().cast("int"), d.c().cast("int"),
        hms[0].c().cast("int") if len(hms) > 0 else F.lit(0),
        hms[1].c().cast("int") if len(hms) > 1 else F.lit(0),
        hms[2].c().cast("double") if len(hms) > 2 else F.lit(0.0),
    ),
    "unixtime_seconds_todatetime": lambda a: F.timestamp_seconds(
        a.c().cast("double")
    ),
    "unixtime_milliseconds_todatetime": lambda a: F.timestamp_millis(
        a.c().cast("long")
    ),
    "max_of": lambda *a: F.greatest(*[x.c() for x in a]),
    "min_of": lambda *a: F.least(*[x.c() for x in a]),
    "array_concat": lambda *a: F.concat(*[x.c() for x in a]),
    "isfinite": lambda a: ~(F.isnan(a.c()) | (F.abs(a.c()) == float("inf"))),
    "isinf": lambda a: F.abs(a.c()) == float("inf"),
    # property-bag scalars, bound to the library's deterministic
    # (sorted-key) JSON forms
    "bag_keys": lambda a: K.bag_keys(a.as_type("string")),
    "bag_merge": lambda a, b: K.bag_merge(
        a.as_type("string"), b.as_type("string")
    ),
    "bag_remove_keys": lambda a, ks: K.bag_remove_keys(
        a.as_type("string"), [str(k) for k in _lit_value(ks)]
    ),
    "bag_has_key": lambda a, k: K.bag_has_key(
        a.as_type("string"), str(_lit_value(k))
    ),
    "bag_pack": lambda *a: K.bag_pack(*[x.c() for x in a]),
})


def _datetime_part(part: str, a) -> Column:
    """KQL ``datetime_part(part, dt)`` — named calendar component.
    Kusto returns int; weeks are ISO (weekofyear)."""
    c = a.c()
    parts = {
        "year": F.year, "month": F.month, "day": F.dayofmonth,
        "hour": F.hour, "minute": F.minute, "second": F.second,
        "dayofyear": F.dayofyear, "week_of_year": F.weekofyear,
        "quarter": F.quarter,
    }
    fn = parts.get(part)
    if fn is None:
        raise KqlSyntaxError(f"unsupported datetime_part {part!r}")
    return fn(c).cast("long")


def _format_timespan(a, fmt: str) -> Column:
    """KQL ``format_timespan(ts, fmt)`` for the common ``d.hh:mm:ss``
    and ``hh:mm:ss`` shapes (timespans are double seconds internally).
    Other format strings refuse by name."""
    total = a.c().cast("double")
    d = F.floor(total / 86400).cast("long")
    h = F.floor((total % 86400) / 3600).cast("long")
    m = F.floor((total % 3600) / 60).cast("long")
    s = F.floor(total % 60).cast("long")
    if fmt in ("d.hh:mm:ss",):
        return F.format_string("%d.%02d:%02d:%02d", d, h, m, s)
    if fmt in ("hh:mm:ss",):
        return F.format_string("%02d:%02d:%02d", d * 24 + h, m, s)
    raise KqlSyntaxError(
        f"unsupported format_timespan format {fmt!r} — "
        "d.hh:mm:ss and hh:mm:ss are supported"
    )


# Packed-series scalars (round-13): the library's Column→Column series
# toolkit exposed to pasted KQL. Coefficient/size arguments are literals
# (dynamic([...]) / numbers) — the same plan-build-time unrolling the
# library documents; struct outputs (series_fit_line) read fields via
# indexing: f['slope'].
_SCALAR_FNS.update({
    "series_fir": lambda s, c, *o: K.series_fir(
        s.c(), [float(x) for x in _lit_value(c)],
        normalize=bool(_lit_value(o[0])) if len(o) > 0 else True,
        center=bool(_lit_value(o[1])) if len(o) > 1 else False,
    ),
    "series_iir": lambda s, b, a: K.series_iir(
        s.c(),
        [float(x) for x in _lit_value(b)],
        [float(x) for x in _lit_value(a)],
    ),
    "series_moving_avg": lambda s, w, *o: K.series_moving_avg(
        s.c(), int(_lit_value(w)),
        center=bool(_lit_value(o[0])) if o else False,
    ),
    "series_seasonal": lambda s, p: K.series_seasonal(
        s.c(), int(_lit_value(p))
    ),
    "series_fill_forward": lambda s: K.series_fill_forward(s.c()),
    "series_fill_backward": lambda s: K.series_fill_backward(s.c()),
    "series_add": lambda a, b: K.series_add(a.c(), b.c()),
    "series_subtract": lambda a, b: K.series_subtract(a.c(), b.c()),
    "series_multiply": lambda a, b: K.series_multiply(a.c(), b.c()),
    "series_divide": lambda a, b: K.series_divide(a.c(), b.c()),
    "series_abs": lambda s: K.series_abs(s.c()),
    "series_sign": lambda s: K.series_sign(s.c()),
    "series_sum": lambda s: K.series_sum(s.c()),
    "series_avg": lambda s: K.series_avg(s.c()),
    "series_min": lambda s: K.series_min(s.c()),
    "series_max": lambda s: K.series_max(s.c()),
    "series_fit_line": lambda s: K.series_fit_line(s.c()),
    "series_fit_2lines": lambda s: K.series_fit_2lines(s.c()),
    "series_pearson_correlation": lambda a, b: (
        K.series_pearson_correlation(a.c(), b.c())
    ),
})

# Struct-returning scalars: postfix `.field` / `['field']` reads the
# struct field IN THE SAME STAGE (vs the variant-path machinery json
# columns use), and `extend (a, b, …) = fn(…)` unpacks positionally —
# ADX's own multi-output form. Values are the declared field orders.
_STRUCT_FNS = {
    "series_fit_line": [
        "slope", "interception", "rsquare", "variance", "rvariance",
    ],
    "series_fit_2lines": [
        "split_idx", "rsquare", "slope_left", "interception_left",
        "slope_right", "interception_right",
    ],
}


def run_kql(
    spark: SparkSession,
    text: str,
    tables: dict[str, DataFrame] | None = None,
    functions: dict | None = None,
    catalog=None,
) -> DataFrame:
    """Parse one KQL tabular query and return the equivalent DataFrame.

    ``tables`` maps table names to DataFrames (names not found there
    fall back to ``spark.table``); ``functions`` binds environment
    functions (e.g. ``extent_tags``) to Column builders so ingestion-
    metadata queries the reference emits run verbatim. The result is an
    ordinary lazy DataFrame — Catalyst sees the full plan (pushdown,
    codegen, AQE all apply). A ``.create-or-alter function F() { body }``
    wrapper (the schema.kql form) is stripped so the stored-function
    FILE runs as-is."""
    m = re.match(
        r"\s*\.create(?:-or-alter)?\s+function\s+\w+\s*\(\s*\)"
        r"\s*\{(.*)\}\s*$",
        text,
        re.S,
    )
    if m:
        text = m.group(1)
    if text.lstrip().startswith(".export"):
        return _run_export(spark, text, tables, functions)
    if text.lstrip().startswith(".show"):
        return _run_show(spark, text, tables, functions, catalog)
    return _Parser(text, tables, functions, spark).parse_query()


def _run_show(spark, text, tables, functions, catalog) -> DataFrame:
    """The reference's ``.show table T policy partitioning`` and
    ``.show table T`` control commands (EtlRun.cs:148-164), answered
    from this engine's catalog (catalog.py — the registry that replaces
    the Kusto round-trip): the policy command yields one row with the
    Policy JSON in Kusto's PartitionKeys shape, the plain form yields
    (AttributeName, AttributeType) rows; any trailing ``| stage`` chain
    continues over that result, so the emitted introspection pipelines
    run WHOLE — control command included."""
    import json as _json

    if catalog is None:
        raise KqlSyntaxError(
            ".show table needs a catalog= (the engine's table registry)"
        )
    mm = re.match(
        r"\s*\.show\s+table\s+(\w+)(\s+policy\s+partitioning)?\s*",
        text,
    )
    if not mm:
        raise KqlSyntaxError("unrecognized .show command shape")
    tdef = catalog.get(mm.group(1))
    if mm.group(2):
        pol = tdef.partition_policy
        keys = []
        if pol is not None:
            keys.append(
                {
                    "ColumnName": pol.column_name,
                    "Kind": "Hash",
                    "Properties": {
                        "Function": "XxHash64",
                        "MaxPartitionCount": pol.max_partition_count,
                        "Seed": pol.seed,
                        "PartitionAssignmentMode": "Uniform",
                    },
                }
            )
        df = spark.createDataFrame(
            [(mm.group(1), _json.dumps({"PartitionKeys": keys}))],
            "TableName string, Policy string",
        )
    else:
        df = spark.createDataFrame(
            [
                (f.name, f.dataType.simpleString())
                for f in tdef.schema.fields
            ],
            "AttributeName string, AttributeType string",
        )
    parser = _Parser(text[mm.end():], tables, functions, spark)
    return parser.continue_pipeline(df)


def _run_export(spark, text, tables, functions) -> DataFrame:
    """The reference's ``.export [async] [compressed] to <fmt>
    (connection…) with (sizeLimit=…, namePrefix=…, distribution=…,
    includeHeaders=…) <| query`` control command
    (TestBase.cs:397-408), executed against this engine's export
    surface (kql.export_any): namePrefix is the OUTPUT PATH (a local /
    mounted directory — this engine has no cloud credential plumbing;
    the parenthesized connection strings are parsed and ignored),
    sizeLimit caps file bytes via the sampled-row-width contract,
    distribution="single" → one file, ``compressed`` → gzip for text
    formats. Returns the exported DataFrame (the command's side effect
    is the write)."""
    head, sep, tail = text.partition("<|")
    if not sep:
        raise KqlSyntaxError(".export requires a `<|` query tail")
    mm = re.match(
        r"\s*\.export(\s+async)?(\s+compressed)?\s+to\s+(\w+)\s*"
        r"\(([^)]*)\)\s*(?:with\s*\((.*)\))?\s*$",
        head,
        re.S,
    )
    if not mm:
        raise KqlSyntaxError("unrecognized .export command shape")
    compressed = bool(mm.group(2))
    fmt = mm.group(3).lower()
    opts: dict[str, str] = {}
    for om in re.finditer(
        r"(\w+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^,\s)]+))",
        mm.group(5) or "",
    ):
        opts[om.group(1).lower()] = (
            om.group(2) or om.group(3) or om.group(4) or ""
        )
    prefix = opts.get("nameprefix")
    if not prefix:
        raise KqlSyntaxError(
            ".export needs namePrefix=<output path> (this engine writes "
            "to local/mounted paths; connection strings are ignored)"
        )
    size_limit = int(opts["sizelimit"]) if "sizelimit" in opts else None
    distribution = 1 if opts.get("distribution") == "single" else None
    include_headers = opts.get("includeheaders", "all") != "none"
    df = _Parser(tail, tables, functions, spark).parse_query()
    if fmt == "csv":
        K.export_csv(
            df, prefix, size_limit, include_headers, distribution
        )
    else:
        K.export_any(
            df, prefix, fmt, size_limit, distribution,
            compression="gzip" if compressed else None,
        )
    return df

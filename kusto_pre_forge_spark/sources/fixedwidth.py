"""Fixed-width (columnar position) text input — the mainframe/telemetry
export format older ETL estates feed a pre-forge from. The reference's
format surface is delimiter-oriented (csv/tsv/psv/txt,
Settings/BlobSettings.cs:13); fixed-width is the missing sibling where
fields are POSITIONS, not separators, and no quoting/escaping exists.

Spark-first: one ``spark.read.text`` scan + a single codegen projection
of ``substring`` slices — no UDF, no regex, and predicate pushdown on the
parsed columns still prunes the scan output columns (the line is one
string column; the projection is the parse). Type conversion uses
``try_cast`` (ANSI-safe: malformed digits become NULL, never a job kill),
matching ``read_landing``'s quarantine philosophy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: a field spec: (name, width, spark_type). Widths are character counts;
#: fields are parsed left to right with no separators.
FieldSpec = tuple[str, int, str]


def fixed_width_columns(
    line: Column, spec: list[FieldSpec], trim: bool = True
) -> list[Column]:
    """Parse one fixed-width ``line`` column into typed columns.

    Each field is ``substring(line, start, width)`` (1-based, cumulative
    starts) → optional trim → ``try_cast`` to its declared type. A short
    line yields NULL/empty tails (substring past the end is ''), never an
    error — short records are data-quality signals, not job failures.
    """
    cols = []
    start = 1
    for name, width, typ in spec:
        raw = F.substring(line, start, width)
        val = F.trim(raw) if trim else raw
        if typ in (None, "string"):
            out = val
        else:
            out = val.try_cast(typ)  # ANSI-safe: malformed -> NULL
        cols.append(out.alias(name))
        start += width
    return cols


def parse_fixed_width(
    df: DataFrame,
    spec: list[FieldSpec],
    line_col: str = "value",
    keep_line: bool = False,
    min_length: int | None = None,
) -> DataFrame:
    """Parse a DataFrame of fixed-width lines into typed columns.

    ``min_length`` (default: the spec's total width) drops ruler/footer
    lines shorter than one full record — pass 0 to keep everything.
    One filter + one projection; stays inside WholeStageCodegen.
    """
    total = sum(w for _, w, _ in spec)
    cutoff = total if min_length is None else int(min_length)
    line = F.col(line_col)
    out = df.filter(F.length(line) >= cutoff) if cutoff > 0 else df
    cols = fixed_width_columns(line, spec)
    if keep_line:
        return out.select(*cols, line.alias("_raw_line"))
    return out.select(*cols)


def read_fixed_width(
    spark: SparkSession,
    paths: list[str] | str,
    spec: list[FieldSpec],
    skip_header_lines: int = 0,
    min_length: int | None = None,
) -> DataFrame:
    """Read fixed-width files: ``spark.read.text`` (splittable, parallel
    by file blocks like any text source) + :func:`parse_fixed_width`.

    ``skip_header_lines`` drops the first N lines of EACH file the way
    ``plans/split.py``'s header peel does — matched by line content
    position within the file (monotonic ids are per-partition, so header
    skip uses a per-file window only when asked; 0 = no extra work).
    """
    raw = spark.read.text(paths)
    if skip_header_lines > 0:
        from pyspark.sql.window import Window

        raw = raw.select(
            "value", F.monotonically_increasing_id().alias("_mid"),
            F.input_file_name().alias("_f"),
        )
        w = Window.partitionBy("_f").orderBy("_mid")
        raw = (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > skip_header_lines)
            .drop("_mid", "_f", "_rn")
        )
    return parse_fixed_width(raw, spec, min_length=min_length)

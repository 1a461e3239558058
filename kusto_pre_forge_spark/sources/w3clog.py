"""W3C extended log file source (``w3clogfile``).

Reference parity-plus: the reference's blob settings enumerate
``DataSourceFormat`` values including ``w3clogfile`` via the Kusto SDK
(code/KustoPreForgeLib/Settings/BlobSettings.cs:13), but its ETL throws
for every non-text format (code/KustoPreForgeLib/EtlRun.cs:87-89) — this
module implements the format for real: IIS/W3C extended logs declare
their schema in a ``#Fields:`` directive and encode missing values as
``-``.

Spark-first: the directive is sniffed from the FILE HEAD on the driver
(one bounded read — the schema is metadata, like parquet footers), and
the body parses as a single codegen projection over ``spark.read.text``
lines: split on space, positional ``element_at``, ``-``→NULL. No UDF, no
shuffle; W3C encodes spaces inside values as ``+``/``%xx`` so a plain
space split is lossless per the spec (https://www.w3.org/TR/WD-logfile).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sanitize_field(name: str) -> str:
    """W3C field names (``cs-uri-stem``, ``time-taken``, ``cs(Referer)``)
    → column-safe snake case (``cs_uri_stem``, ``cs_referer``)."""
    return re.sub(r"[^0-9a-zA-Z]+", "_", name).strip("_").lower()


def w3c_parse(
    df: DataFrame,
    fields: list[str],
    value_col: str = "value",
    sanitize: bool = True,
) -> DataFrame:
    """Parse W3C log LINES (a text column) against the given ``#Fields``
    list: directive lines (``#…``) drop, each remaining line splits on
    single spaces positionally, and the spec's ``-`` placeholder becomes
    NULL. Pure codegen — at 100 TB this is the scan projection."""
    names = [sanitize_field(f) if sanitize else f for f in fields]
    parts = F.split(F.col(value_col), " ")
    cols = [
        F.nullif(F.element_at(parts, i + 1), F.lit("-")).alias(n)
        for i, n in enumerate(names)
    ]
    return df.filter(~F.col(value_col).startswith("#")).select(*cols)


def read_fields_directive(path: str, max_bytes: int = 65536) -> list[str]:
    """Driver-side schema sniff: the first ``#Fields:`` directive in the
    file head (bounded read — W3C directives precede data per spec)."""
    with open(path, "rb") as fh:
        head = fh.read(max_bytes).decode("utf-8", errors="replace")
    for line in head.splitlines():
        if line.startswith("#Fields:"):
            return line[len("#Fields:") :].split()
    raise ValueError(f"no #Fields directive in the head of {path!r}")


def read_w3c_log(
    spark: SparkSession, path: str, sample_file: str | None = None, sanitize: bool = True
) -> DataFrame:
    """Read a w3clogfile directory/glob as a typed DataFrame: sniff the
    ``#Fields`` directive from ``sample_file`` (or the lexicographically
    first matching file — a homogeneous log set shares one schema, the
    same assumption parquet/csv schema inference makes), then parse all
    lines distributed."""
    if sample_file is None:
        import glob as _glob
        import os as _os

        if _os.path.isdir(path):
            cands = sorted(_glob.glob(_os.path.join(path, "*")))
        else:
            cands = sorted(_glob.glob(path))
        if not cands:
            raise FileNotFoundError(f"no files match {path!r}")
        sample_file = cands[0]
    fields = read_fields_directive(sample_file)
    return w3c_parse(spark.read.text(path), fields, sanitize=sanitize)

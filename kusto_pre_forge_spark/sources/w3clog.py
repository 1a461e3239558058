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


#: Standard W3C/IIS field types (everything else stays string — the
#: Kusto w3clogfile mapping's convention)
W3C_FIELD_TYPES = {
    "sc-status": "int",
    "sc-substatus": "int",
    "sc-win32-status": "bigint",
    "sc-bytes": "bigint",
    "cs-bytes": "bigint",
    "time-taken": "bigint",
    "s-port": "int",
    "date": "date",
}


def w3c_parse(
    df: DataFrame,
    fields: list[str],
    value_col: str = "value",
    sanitize: bool = True,
    typed: bool = False,
) -> DataFrame:
    """Parse W3C log LINES (a text column) against the given ``#Fields``
    list: directive lines (``#…``) drop, each remaining line splits on
    single spaces positionally, and the spec's ``-`` placeholder becomes
    NULL. ``typed=True`` additionally try_casts the standard numeric/date
    fields (:data:`W3C_FIELD_TYPES`) — malformed values become NULL, not
    job failures. Pure codegen — at 100 TB this is the scan projection."""
    names = [sanitize_field(f) if sanitize else f for f in fields]
    parts = F.split(F.col(value_col), " ")
    # try_element_at, not element_at: a blank or truncated line (routine
    # in real IIS logs) has fewer parts than fields, and under ANSI mode
    # element_at would abort the whole job instead of yielding NULLs
    cols = []
    for i, (raw_name, n) in enumerate(zip(fields, names)):
        c = F.nullif(F.try_element_at(parts, F.lit(i + 1)), F.lit("-"))
        if typed:
            typ = W3C_FIELD_TYPES.get(raw_name.lower())
            if typ is not None:
                c = c.try_cast(typ)
        cols.append(c.alias(n))
    return df.filter(~F.col(value_col).startswith("#")).select(*cols)


def first_matching_file(spark: SparkSession, path) -> str:
    """Resolve a directory / glob / file spec (or a list of them) to the
    lexicographically first matching FILE — through the Hadoop FileSystem
    API, so abfss/s3a/hdfs URIs work exactly like local paths (the same
    resolution every Spark reader's schema inference performs)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    pats = path if isinstance(path, list) else [path]
    hits: list[str] = []
    for p in pats:
        jp = path_cls(p)
        fs = jp.getFileSystem(conf)
        st = fs.globStatus(jp)
        stats = list(st) if st is not None else []
        for s in stats:
            if s.isDirectory():
                for child in fs.listStatus(s.getPath()):
                    if child.isFile():
                        hits.append(str(child.getPath()))
            else:
                hits.append(str(s.getPath()))
    if not hits:
        raise FileNotFoundError(f"no files match {path!r}")
    return sorted(hits)[0]


def read_head_bytes(spark: SparkSession, path: str, max_bytes: int) -> bytes:
    """Bounded driver-side head read through the Hadoop FS API (any URI
    scheme) — the metadata-sniff primitive. One bulk ``toByteArray``
    call (py4j auto-converts the returned byte[]), never per-byte
    round-trips."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jp = jvm.org.apache.hadoop.fs.Path(path)
    fs = jp.getFileSystem(conf)
    n = min(int(fs.getFileStatus(jp).getLen()), max_bytes)
    stream = fs.open(jp)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream, n)
        return bytes(data)
    finally:
        stream.close()


def read_fields_directive(
    path: str, max_bytes: int = 65536, spark: SparkSession | None = None
) -> list[str]:
    """Driver-side schema sniff: the first ``#Fields:`` directive in the
    file head (bounded read — W3C directives precede data per spec).
    With ``spark`` given, the read goes through the Hadoop FS API (any
    URI scheme); otherwise a plain local ``open``."""
    if spark is not None:
        head = read_head_bytes(spark, path, max_bytes).decode(
            "utf-8", errors="replace"
        )
    else:
        with open(path, "rb") as fh:
            head = fh.read(max_bytes).decode("utf-8", errors="replace")
    for line in head.splitlines():
        if line.startswith("#Fields:"):
            return line[len("#Fields:") :].split()
    raise ValueError(f"no #Fields directive in the head of {path!r}")


def read_w3c_log(
    spark: SparkSession,
    path,
    sample_file: str | None = None,
    sanitize: bool = True,
    typed: bool = False,
) -> DataFrame:
    """Read a w3clogfile directory/glob as a typed DataFrame: sniff the
    ``#Fields`` directive from ``sample_file`` (or the lexicographically
    first matching file — a homogeneous log set shares one schema, the
    same assumption parquet/csv schema inference makes), then parse all
    lines distributed. Paths resolve through the Hadoop FS API, so any
    URI scheme the cluster mounts works."""
    if sample_file is None:
        sample_file = first_matching_file(spark, path)
    fields = read_fields_directive(sample_file, spark=spark)
    return w3c_parse(spark.read.text(path), fields, sanitize=sanitize, typed=typed)

"""File/blob sources.

Re-expresses the reference's source layer Spark-first:

- ``ListBlobSource`` — enumerate blobs under a prefix with an optional suffix
  filter (ref: code/KustoPreForgeLib/BlobSources/ListBlobSource.cs:33-41) →
  a glob path handed to ``spark.read``; Spark's file-listing does the
  enumeration in a distributed, partition-pruned way.
- ``DownloadBlobTransform`` / ``GunzipContentTransform`` — 16-way concurrent
  download into a bounded buffer, whole-buffer gunzip with ISIZE preallocation
  (ref: Transforms/DownloadBlobTransform.cs:8-107, GunzipContentTransform.cs:6-77)
  → nothing to write: Spark's reader + Hadoop codecs stream and decompress,
  sized by ``spark.sql.files.maxPartitionBytes``, with none of the reference's
  4 GiB ISIZE limitation (SURVEY §4.3 #4).
- ``TextSource`` (dormant split path) → ``spark.read.text``.

Scale note: a 100 TB prefix listing is driver-side metadata only; the read
itself fans out one task per file split. Filters/projections on the returned
DataFrame push into the scan (parquet) or prune columns (csv).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kusto_pre_forge_spark.config import DataFormat, RunSettings

_DELIMITERS = {DataFormat.CSV: ",", DataFormat.TSV: "\t", DataFormat.PSV: "|"}


def list_source(
    spark: SparkSession,
    prefix: str,
    suffix: str | None = None,
) -> list[str]:
    """Enumerate input files under ``prefix`` with an optional suffix filter.

    ref: ListBlobSource.cs:33-35 (ListBlobsAsync + EndsWith(suffix)).
    Returns concrete paths so the caller can audit the unit list (the
    reference journals each listed blob, :41); the actual read still goes
    through Spark's own listing for the glob form.
    """
    # Spark/Hadoop glob: prefix* picks up everything under the prefix.
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(prefix + "*")
    fs = path.getFileSystem(conf)
    statuses = fs.globStatus(path) or []
    out = []
    for st in statuses:
        p = st.getPath().toString()
        if st.isDirectory():
            continue
        if suffix is None or p.endswith(suffix):
            out.append(p)
    return sorted(out)


def read_landing(
    spark: SparkSession,
    paths: list[str] | str,
    settings: RunSettings,
    schema=None,
) -> DataFrame:
    """Read input blobs into a DataFrame with lineage.

    Format dispatch mirrors EtlRun.cs:87-118 (txt/csv live; the reference
    throws for other formats — we support them natively). Compression is
    transparent via file extension (Hadoop codecs), replacing
    GunzipContentTransform entirely.

    Output always carries ``_kpf_source`` = the source file path
    (``input_file_name()``), the Spark-native form of BlobData's blob URI —
    lineage needed by the idempotent sink (Text/TextKustoSink.cs:52-63).
    """
    if isinstance(paths, str):
        paths = [paths]
    fmt = settings.fmt
    if fmt == DataFormat.TXT:
        # landing table shape: one Text:string column (templates/script.kql:2)
        df = spark.read.text(paths).withColumnRenamed("value", "Text")
    elif fmt in _DELIMITERS:
        reader = spark.read.options(
            sep=_DELIMITERS[fmt],
            header=str(settings.csv_headers).lower(),
            # RFC-4180 "" escapes, matching CsvParseTransform.cs:64-82
            quote='"',
            escape='"',
            multiLine="true",  # quoted embedded newlines, ref state machine :64-82
        )
        df = reader.csv(paths, schema=schema) if schema is not None else reader.csv(paths)
    elif fmt == DataFormat.JSON:
        df = spark.read.json(paths, schema=schema)
    elif fmt == DataFormat.PARQUET:
        df = spark.read.parquet(*paths)
    else:  # pragma: no cover - enum is closed
        raise NotImplementedError(f"format {fmt}")
    return df.withColumn("_kpf_source", F.input_file_name())

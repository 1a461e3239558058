"""Engine configuration — mirrors the reference's env-var surface.

Reference: code/KustoPreForgeLib/Settings/RunSettings.cs:27-74 reads
``EtlAction, AuthMode, ServiceBusQueueUrl, SourceBlobsPrefix, SourceBlobsSuffix,
DestinationBlobPrefix, KustoIngestUri, KustoDb, KustoTable, Format,
InputCompression, OutputCompression, CsvHeaders, MaxMbPerShard, TempDirectory``
with defaults in Settings/BlobSettings.cs:31-35 (format=txt, no compression,
headers=true, 200 MB/shard) and action default Split (RunSettings.cs:101).

Kusto-specific knobs (auth, cluster URIs) have no meaning here; the rest maps
onto this dataclass. The "exactly one source" rule of
Settings/SourceSettings.cs:11-18 is enforced in ``validate``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from enum import Enum


class EtlAction(Enum):
    """ref: code/KustoPreForgeLib/Settings/EtlAction.cs:3-7."""

    SPLIT = "Split"
    PRE_PARTITION = "PrePartition"


class DataFormat(Enum):
    """Declared format surface (Settings/BlobSettings.cs:13; Kusto SDK enum).

    The reference only ever implements txt/csv (EtlRun.cs:87-89 throws for
    the rest); we support txt, csv, json, parquet, orc natively via Spark
    readers, plus avro (dependency-free OCF reader, ``sources/avro.py``)
    and w3clogfile (#Fields-directed parser, ``sources/w3clog.py``) — the
    two remaining members of the reference's declared enum.
    """

    TXT = "txt"
    CSV = "csv"
    TSV = "tsv"
    PSV = "psv"
    JSON = "json"
    PARQUET = "parquet"
    ORC = "orc"
    AVRO = "avro"
    W3CLOGFILE = "w3clogfile"


class Compression(Enum):
    """ref: input None|GZip|Zip (Text/TextSource.cs:80-108); live path
    None|GZip (EtlRun.cs:100-118). Spark/Hadoop read .gz and .bz2
    transparently; ZIP and XZ route through the archive readers in
    ``sources.blob`` (XZ has no built-in Hadoop codec in a stock Spark —
    a plain text read of an .xz file silently yields raw compressed
    bytes, so the engine routes it explicitly)."""

    NONE = "None"
    GZIP = "GZip"
    ZIP = "Zip"
    XZ = "XZ"


@dataclass
class RunSettings:
    action: EtlAction = EtlAction.SPLIT
    source_prefix: str | None = None  # SourceBlobsPrefix
    source_suffix: str | None = None  # SourceBlobsSuffix
    source_paths: list[str] | None = None  # single-blob mode (SourceBlob)
    stream_dir: str | None = None  # ServiceBusQueueUrl ≡ watched landing dir
    destination_prefix: str | None = None
    fmt: DataFormat = DataFormat.TXT
    input_compression: Compression = Compression.NONE
    output_compression: Compression = Compression.NONE
    csv_headers: bool = True  # BlobSettings.cs:34 default true
    max_mb_per_shard: int = 200  # BlobSettings.cs:35 default 200 MB
    temp_directory: str | None = None
    table: str | None = None  # KustoTable ≡ catalog table name
    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_environment_variables(cls, env: dict[str, str] | None = None) -> "RunSettings":
        """ref: Settings/RunSettings.cs:27-74 (env-var parsing)."""
        e = dict(os.environ if env is None else env)
        s = cls()
        if v := e.get("EtlAction"):
            s.action = EtlAction(v)
        s.source_prefix = e.get("SourceBlobsPrefix")
        s.source_suffix = e.get("SourceBlobsSuffix")
        if v := e.get("SourceBlob"):
            s.source_paths = [v]
        s.stream_dir = e.get("StreamLandingDir")
        s.destination_prefix = e.get("DestinationBlobPrefix")
        if v := e.get("Format"):
            s.fmt = DataFormat(v.lower())
        if v := e.get("InputCompression"):
            s.input_compression = Compression(v)
        if v := e.get("OutputCompression"):
            s.output_compression = Compression(v)
        if v := e.get("CsvHeaders"):
            s.csv_headers = v.lower() in ("true", "1", "yes")
        if v := e.get("MaxMbPerShard"):
            s.max_mb_per_shard = int(v)
        s.temp_directory = e.get("TempDirectory")
        s.table = e.get("KustoTable")
        return s

    def validate(self) -> None:
        """One-and-only-one source (ref: Settings/SourceSettings.cs:11-18)."""
        sources = [
            self.source_prefix is not None,
            bool(self.source_paths),
            self.stream_dir is not None,
        ]
        if sum(sources) != 1:
            raise ValueError(
                "exactly one of source_prefix / source_paths / stream_dir required "
                f"(got {sum(sources)})"
            )

    @property
    def max_bytes_per_shard(self) -> int:
        return self.max_mb_per_shard * 1024 * 1024

"""kusto_pre_forge_spark — a PySpark-native engine with the capabilities of
microsoft/kusto-pre-forge (reference surveyed in SURVEY.md).

The reference is a single-process streaming ETL service that pre-partitions /
splits large blobs before Kusto ingestion and delegates all relational work to
Kusto (reference: code/KustoPreForgeLib/EtlRun.cs:123-137). This package
re-expresses that capability surface Spark-first:

- ``sources``   — blob/file listing + text/csv/compressed reads
                  (ref: code/KustoPreForgeLib/BlobSources/ListBlobSource.cs)
- ``functions`` — the partition hash and KQL-equivalent scalar functions
                  (ref: code/KustoPreForgeLib/Transforms/PartitioningHelper.cs)
- ``operators`` — the emitted-KQL operator layer (SURVEY §2.5) plus
                  LLM-data-pipeline extensions (dedup, similarity, text stats,
                  multimodal)
- ``plans``     — the two reference pipelines (PrePartition, Split) as
                  DataFrame plans (ref: EtlRun.cs:92-138, Text/*.cs)
- ``sinks``     — partitioned / size-capped-shard / idempotent-manifest writes
                  (ref: Transforms/PartitionedContentSink.cs, Text/TextKustoSink.cs)
- ``streaming`` — file-arrival continuous mode ≡ Event Grid → Service Bus
                  ingress (ref: code/KustoPreForgeServiceBus/ServiceBusServer.cs)

The KQL strings the reference emits (EtlRun.cs:148-164,
TestBase.cs:305-332, deployment/infra/schema.kql) run natively via
:func:`run_kql` (``operators/kqltext.py``).
"""

from kusto_pre_forge_spark.operators.kqltext import run_kql  # noqa: F401

__version__ = "0.1.0"

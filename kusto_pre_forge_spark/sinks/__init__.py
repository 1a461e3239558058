from kusto_pre_forge_spark.sinks.manifest import IngestManifest, ingest_idempotent

__all__ = ["IngestManifest", "ingest_idempotent"]

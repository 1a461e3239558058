from kusto_pre_forge_spark.streaming.ingest import StreamingEtl

__all__ = ["StreamingEtl"]

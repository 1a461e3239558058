from kusto_pre_forge_spark.sources.blob import list_source, read_landing

__all__ = ["list_source", "read_landing"]

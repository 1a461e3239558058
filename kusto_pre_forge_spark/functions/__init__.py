from kusto_pre_forge_spark.functions.hashing import (
    content_hash,
    kusto_preforge_hash,
    kusto_preforge_hash_sql,
)

__all__ = ["kusto_preforge_hash", "kusto_preforge_hash_sql", "content_hash"]

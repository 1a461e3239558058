from kusto_pre_forge_spark.operators import dedup, kql, similarity, textstats

__all__ = ["kql", "dedup", "similarity", "textstats"]

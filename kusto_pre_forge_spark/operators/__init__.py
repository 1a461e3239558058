from kusto_pre_forge_spark.operators import (
    bucketing,
    dedup,
    kql,
    multimodal,
    rollup,
    sessions,
    similarity,
    skew,
    temporal,
    textstats,
)

__all__ = [
    "bucketing",
    "dedup",
    "kql",
    "multimodal",
    "rollup",
    "sessions",
    "similarity",
    "skew",
    "temporal",
    "textstats",
]

from kusto_pre_forge_spark.plans.prepartition import (
    partition_samples,
    prepartition,
    run_prepartition,
)
from kusto_pre_forge_spark.plans.split import run_split, shard_assign

__all__ = ["prepartition", "partition_samples", "run_prepartition", "shard_assign", "run_split"]

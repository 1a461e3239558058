#!/usr/bin/env python
"""Does pipeline_quality_route recompile its fused projection per fresh
DataFrame (r14's claim), or not? Counts janino compilations via
CodegenMetrics across bench-style reps.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench
from kusto_pre_forge_spark.session import get_session


def codegen_stats(spark):
    m = spark.sparkContext._jvm.org.apache.spark.metrics.source.CodegenMetrics
    return (
        m.METRIC_COMPILATION_TIME().getCount(),
        m.METRIC_COMPILATION_TIME().getSnapshot().getMean() / 1e3,
        m.METRIC_GENERATED_METHOD_BYTECODE_SIZE().getSnapshot().getMax(),
    )


def main() -> None:
    spark = get_session(app_name="kpf-diag-codegen")
    bench.warmup(spark)
    queries = entry_mod.queries()
    name = sys.argv[1] if len(sys.argv) > 1 else "pipeline_quality_route"
    print("baseline codegen:", codegen_stats(spark), flush=True)
    for rep in range(4):
        c0 = codegen_stats(spark)[0]
        t0 = time.perf_counter()
        sec, n = bench.run_once(spark, queries, name)
        c1, mean_ms, max_bc = codegen_stats(spark)
        print(
            f"rep {rep}: {sec:.3f}s compiles={c1 - c0} "
            f"(mean {mean_ms:.1f} ms, max method bytecode {max_bc})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Convict/acquit CacheManager + block-manager leakage as the in-session
slowdown of ann_recall_pq (5 s fresh vs 14-22 s at bench position 49).

Phases: floor -> pollute (the real pin-producing queries, bench reps) ->
re-measure -> clearCache -> re-measure -> System.gc() -> re-measure.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench
from kusto_pre_forge_spark.session import get_session

POLLUTERS = ["dedup_minhash", "dedup_clusters", "dedup_soft_weights",
             "dedup_minhash_incremental", "similarity_knn_classify"]
TARGET = "ann_recall_pq"


def run_n(spark, queries, name, n):
    out = []
    for _ in range(n):
        sec, _ = bench.run_once(spark, queries, name)
        out.append(round(sec, 2))
    return out


def ncached(spark):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return len(infos)


def main() -> None:
    spark = get_session(app_name="kpf-diag-cache")
    bench.warmup(spark)
    queries = entry_mod.queries()
    print("floor:", run_n(spark, queries, TARGET, 2), "rdds:", ncached(spark), flush=True)
    for p in POLLUTERS:
        t = run_n(spark, queries, p, 3)
        print(f"polluter {p}: {t}", flush=True)
    print("rdds after pollute:", ncached(spark), flush=True)
    print("target after pollute:", run_n(spark, queries, TARGET, 2), flush=True)
    spark.catalog.clearCache()
    print("target after clearCache:", run_n(spark, queries, TARGET, 2),
          "rdds:", ncached(spark), flush=True)
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    print("target after System.gc():", run_n(spark, queries, TARGET, 2),
          "rdds:", ncached(spark), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

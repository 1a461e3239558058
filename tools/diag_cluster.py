#!/usr/bin/env python
"""Round-15 diagnostic: bisect the post-quality_route session slowdown.

Phases (one SparkSession):
  A. warmup, JVM stats
  B. run CLUSTER queries x3 (clean floor)
  C. run SUSPECT queries x3 (quality_route & co)
  D. re-run CLUSTER x3 (poisoned?)
  E. JVM stats again

JVM stats: CodeHeap pools, Metaspace, compilation time, cached RDD blocks.
Usage: python tools/diag_cluster.py [suspect1,suspect2,...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench
from kusto_pre_forge_spark.session import get_session

CLUSTER = [
    "text_unigram",
    "text_ccnet_buckets",
    "text_langid",
    "dedup_semantic",
    "contamination_bloom",
]
SUSPECTS = ["ann_recall_pq", "pipeline_quality_route"]


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        name = p.getName()
        if "CodeHeap" in name or "Metaspace" in name or "Compressed" in name:
            u = p.getUsage()
            out[name] = (u.getUsed() // 1048576, u.getMax() // 1048576)
    comp = mf.getCompilationMXBean()
    out["jit_total_compile_ms"] = comp.getTotalCompilationTime()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    out["heap_used_mb"] = heap.getUsed() // 1048576
    gcit = mf.getGarbageCollectorMXBeans().iterator()
    gc_ms = 0
    while gcit.hasNext():
        gc_ms += gcit.next().getCollectionTime()
    out["gc_total_ms"] = gc_ms
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    out["cached_rdds"] = len(infos)
    out["cached_mem_mb"] = sum(i.memSize() for i in infos) // 1048576
    out["cached_disk_mb"] = sum(i.diskSize() for i in infos) // 1048576
    return out


def run3(spark, queries, name):
    runs = []
    for _ in range(3):
        sec, _n = bench.run_once(spark, queries, name)
        runs.append(round(sec, 3))
    med = sorted(runs)[1]
    print(f"  {name}: median={med} runs={runs}", flush=True)
    return med


def main() -> None:
    suspects = sys.argv[1].split(",") if len(sys.argv) > 1 else SUSPECTS
    spark = get_session(app_name="kpf-diag")
    bench.warmup(spark)
    queries = entry_mod.queries()
    print("== stats after warmup ==", jvm_stats(spark), flush=True)
    print("== phase B: cluster, clean ==", flush=True)
    before = {n: run3(spark, queries, n) for n in CLUSTER}
    print("== stats after B ==", jvm_stats(spark), flush=True)
    print(f"== phase C: suspects {suspects} x3 ==", flush=True)
    for n in suspects:
        run3(spark, queries, n)
    print("== stats after C ==", jvm_stats(spark), flush=True)
    print("== phase D: cluster, after suspects ==", flush=True)
    after = {n: run3(spark, queries, n) for n in CLUSTER}
    print("== stats after D ==", jvm_stats(spark), flush=True)
    print("== ratio D/B ==", flush=True)
    for n in CLUSTER:
        print(f"  {n}: {before[n]} -> {after[n]}  ({after[n]/before[n]:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()

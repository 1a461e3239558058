#!/usr/bin/env python
"""Run a PREFIX of bench.py's HEADLINE list with bench methodology
(3 reps, median), recording per-query JVM state (heap, GC total,
code-heap, cached RDD blocks) so session-level degradation is visible.

Usage: python tools/bench_subset.py <n_queries> [conf.key=val ...]
Prints one JSON line {"queries": {...}, "jvm": {...per query...}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench
from kusto_pre_forge_spark.session import get_session


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out = {}
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    out["heap_mb"] = heap.getUsed() // 1048576
    gcit = mf.getGarbageCollectorMXBeans().iterator()
    gc_ms = 0
    while gcit.hasNext():
        gc_ms += gcit.next().getCollectionTime()
    out["gc_ms"] = gc_ms
    it = mf.getMemoryPoolMXBeans().iterator()
    code = meta = 0
    while it.hasNext():
        p = it.next()
        n = p.getName()
        if "CodeHeap" in n:
            code += p.getUsage().getUsed()
        elif n == "Metaspace":
            meta = p.getUsage().getUsed()
    out["code_mb"] = code // 1048576
    out["meta_mb"] = meta // 1048576
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    out["rdds"] = len(infos)
    out["rdd_mem_mb"] = sum(i.memSize() for i in infos) // 1048576
    return out


def main() -> None:
    n = int(sys.argv[1])
    conf = dict(a.split("=", 1) for a in sys.argv[2:])
    spark = get_session(app_name="kpf-bench-subset", extra_conf=conf or None)
    bench.warmup(spark)
    queries = entry_mod.queries()
    timings, jvms = {}, {}
    for name in bench.HEADLINE[:n]:
        runs = []
        for _ in range(bench.REPS):
            sec, _rows = bench.run_once(spark, queries, name)
            runs.append(sec)
        timings[name] = [round(x, 3) for x in sorted(runs)]
        spark.catalog.clearCache()  # mirror bench.py's between-queries hygiene
        jvms[name] = jvm_stats(spark)
        print(f"# {name}: {timings[name]} {jvms[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"queries": timings, "jvm": jvms}))
    spark.stop()


if __name__ == "__main__":
    main()

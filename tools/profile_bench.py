#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1).

For each named query this runs the SAME timed action as bench.py, but
additionally:

- groups the run's Spark jobs with ``setJobGroup`` and reports the job
  count and total task count (a 0.3 s query that launches 9 sequential
  jobs is scheduler-bound, not compute-bound — a different fix than a
  slow stage);
- dumps ``explain('formatted')`` of the returned DataFrame to
  ``plans/r14/<query>_<tag>.txt`` so plan claims are checkable offline.

Usage: python tools/profile_bench.py <tag> <query> [<query> ...]
       python tools/profile_bench.py <tag> --top  (the expensive set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench
from kusto_pre_forge_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("KPF_PLANS_ROUND", "r15"),
)

TOP = [
    "pipeline_multiformat_extract",
    "graph_pagerank",
    "pipeline_pdf_images",
    "dedup_soft_weights",
    "dedup_minhash",
    "corpus_pack_materialize",
    "contamination_bloom",
    "dedup_clusters",
    "corpus_dsir_sample",
    "text_fasttext_quality",
    "ann_recall_pq",
    "corpus_webdataset_roundtrip",
    "graph_label_propagation",
    "text_quality_lr_train",
    "corpus_robots_gate",
    "shard_assign",
    "dedup_semantic",
    "pipeline_pdf_decrypt",
    "kqltext_scan_steps",
    "window_topk",
    "pipeline_pdf_ocr",
    "wiki_dump_extract",
    "warc_parse",
    "pipeline_quality_lr_filter",
    "similarity_knn_classify",
    "text_lm_backoff",
    "dedup_substring_spans",
    "corpus_pack_boundaries",
    "kql_autocluster",
    "dedup_minhash_incremental",
]


def profile(spark, queries, name: str, tag: str) -> None:
    sc = spark.sparkContext
    os.makedirs(PLANS_DIR, exist_ok=True)
    # warm run 0 is discarded (JIT/codegen); run 1 is the profiled one,
    # and ITS DataFrame is reused for the plan dump — rebuilding the
    # query just for explain re-ran driver-side training loops
    # (ann_recall_pq/_ivf) a third time (r14 ADVICE item).
    times = []
    last_df = None
    for rep in range(2):
        group = f"prof-{name}-{rep}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            fn = queries[name]
            df = fn(spark, SF_DIR)
            if name in bench.CHECKSUM_ACTION:
                from pyspark.sql import functions as F

                row = (
                    df.select(F.xxhash64(*df.columns).alias("_h"))
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.expr("bit_xor(_h)").alias("checksum"),
                    )
                    .collect()[0]
                )
                n = row["n"]
            else:
                n = df.count()
            sec = time.perf_counter() - t0
            last_df = df
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", flush=True)
            sc.setJobGroup(None, None)
            return
        times.append(sec)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        stages = set()
        tasks = 0
        for j in jobs:
            ji = sc.statusTracker().getJobInfo(j)
            if ji:
                stages.update(ji.stageIds)
        for s in stages:
            si = sc.statusTracker().getStageInfo(s)
            if si:
                tasks += si.numTasks
        if rep == 1:
            print(
                f"{name}: {times[0]:.3f}s/{times[1]:.3f}s "
                f"jobs={len(jobs)} stages={len(stages)} tasks={tasks} rows={n}",
                flush=True,
            )
    sc.setJobGroup(None, None)
    try:
        plan = last_df._sc._jvm.PythonSQLUtils.explainString(
            last_df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: plan capture failed: {exc}", flush=True)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--top"]:
        names = TOP
    spark = get_session(app_name="kpf-profile")
    bench.warmup(spark)
    queries = entry_mod.queries()
    for name in names:
        profile(spark, queries, name, tag)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark the engine's headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_queries_wall_sec", "value": <total>, "unit": "sec",
   "queries": {name: sec, ...}, "errors": {name: msg, ...}, "sf": <sf>}

Each query runs REPS (3) times; the reported number is the median, so a
one-off GC pause or JIT blip doesn't read as a regression. Every query is
fault-isolated: an exception records an entry in "errors" and the loop
moves on — the JSON line is ALWAYS emitted (round 3 lost its entire bench
to one AnalysisException; never again).

Headline set: the flagship aggregation (Q1 shape), the heaviest joins
(Q3/Q5 shapes), both reference pipelines (prepartition hash + scatter,
shard assignment), and the flagship LLM extensions (minhash near-dup,
exact ANN top-k, text profile). Each is timed end-to-end including the
action that materializes it (count / small collect), on a fresh DataFrame
per run so no Spark cache amortizes the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from kusto_pre_forge_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "kql_summarize_q1",
    "q3_revenue_topk",
    "q5_nation_revenue",
    "prepartition_events",
    "shard_assign",
    "window_topk",
    "sessionize",
    "dedup_exact",
    "dedup_minhash",
    "dedup_embedding_lsh",
    "similarity_topk",
    "similarity_topk_ivf",
    "events_windowed",
    "text_tokens",
    "text_fingerprint",
    "kql_scan",
    "doc_chunks",
    "text_repetition",
    "corpus_ngrams",
]

# Projection-shaped queries: count() lets Catalyst prune the projection
# entirely (it row-counts the parquet footer instead of running the
# operator — the BASELINE.md trap). Force full materialization with a
# row-count + xxhash64 checksum over every output column instead.
CHECKSUM_ACTION = {"text_tokens", "text_fingerprint", "kql_scan", "doc_chunks"}


def sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def warmup(spark) -> None:
    """Pay one-time costs (JIT/codegen warm-up, Python worker fork, parquet
    footer reads) outside the timed region so per-query numbers measure the
    queries, not session startup."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import PandasUDFType

    def _np_noop(s):
        import numpy as np  # fork-time import cost paid here, not in queries

        return s + int(np.int64(0))

    _noop = F.pandas_udf(_np_noop, "long", PandasUDFType.SCALAR)
    cores = spark.sparkContext.defaultParallelism
    # one task per core so every Python worker in the pool forks + imports
    # numpy now; a 1000-row range would warm only one or two workers
    spark.range(cores * 1000).repartition(cores * 2).select(
        F.sum(_noop("id"))
    ).collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).count()


REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def run_once(spark, queries, name: str) -> tuple[float, int]:
    """One timed end-to-end run of a headline query. Returns (sec, rows)."""
    fn = queries[name]
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    if name in CHECKSUM_ACTION:
        from pyspark.sql import functions as F

        # bit_xor, not sum: sum(xxhash64) overflows long under ANSI mode
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
    return time.perf_counter() - t0, n


def main() -> None:
    spark = get_session(app_name="kpf-bench")
    try:
        warmup(spark)
    except Exception as exc:  # noqa: BLE001 — never let warmup kill the bench
        print(f"# warmup failed: {exc!r}", file=sys.stderr)
    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        runs: list[float] = []
        for rep in range(REPS):
            try:
                sec, n = run_once(spark, queries, name)
            except Exception as exc:  # noqa: BLE001 — fault-isolate per query
                msg = f"{type(exc).__name__}: {exc}"
                errors[name] = msg[:500]
                print(f"# {name}: FAILED rep {rep}: {msg[:200]}", file=sys.stderr)
                break
            runs.append(sec)
            print(f"# {name}[{rep}]: {sec:.3f}s ({n} rows)", file=sys.stderr)
        if runs:
            timings[name] = round(sorted(runs)[len(runs) // 2], 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "errors": errors,
                "reps": REPS,
                "sf": sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

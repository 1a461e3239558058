"""Corpus assembly operators: mixture sampling, reproducible shuffle,
benchmark contamination (operators/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators import corpus


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/documents.parquet")


def test_stratified_sample_rates_and_determinism(spark, docs):
    fracs = {"en": 0.5, "de": 1.0}
    a = corpus.stratified_sample(docs, "lang", fracs, "doc_id", default_fraction=0.0)
    b = corpus.stratified_sample(
        docs.repartition(7), "lang", fracs, "doc_id", default_fraction=0.0
    )
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b, "membership must not depend on partitioning"
    langs = {r.lang for r in a.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}, "default 0.0 drops unlisted strata"
    n_de = docs.filter(F.col("lang") == "de").count()
    assert a.filter(F.col("lang") == "de").count() == n_de, "rate 1.0 keeps all"
    n_en = docs.filter(F.col("lang") == "en").count()
    kept_en = a.filter(F.col("lang") == "en").count()
    assert 0.25 * n_en < kept_en < 0.75 * n_en, "rate 0.5 within loose bounds"


def test_corpus_shuffle_reproducible_total_order(spark, docs):
    a = corpus.corpus_shuffle(docs, "doc_id").select("doc_id", "shuffle_pos")
    b = corpus.corpus_shuffle(docs.repartition(5), "doc_id").select(
        "doc_id", "shuffle_pos"
    )
    pa = {r.doc_id: r.shuffle_pos for r in a.collect()}
    pb = {r.doc_id: r.shuffle_pos for r in b.collect()}
    assert pa == pb, "order must be partitioning-independent"
    assert sorted(pa.values()) == list(range(len(pa))), "dense 0-based positions"
    by_pos = sorted(pa, key=pa.get)
    assert by_pos != sorted(pa), "hash order should differ from id order"


def test_contamination_check_finds_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    clean = "one two three four five six seven eight nine ten"
    contaminated = "prefix alpha beta gamma delta epsilon zeta eta theta suffix"
    pool = spark.createDataFrame(
        [(100, contaminated), (101, clean)], "doc_id long, text string"
    )
    out = corpus.contamination_check(pool, bench, ngram_n=8, min_shared=1).collect()
    assert {(r.corpus_id, r.bench_id) for r in out} == {(100, 0)}
    assert out[0].shared_ngrams == 1  # exactly the shared 8-gram window


def test_stratified_sample_plan_has_no_exchange(spark, docs):
    """The 100 TB claim is structural: mixture sampling must compile to a
    scan + filter with NO shuffle anywhere in the executed plan."""
    s = corpus.stratified_sample(docs, "lang", {"en": 0.5}, "doc_id")
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_contamination_check_broadcasts_benchmark_side(spark, docs):
    """The benchmark (eval-suite) side must broadcast — a sort-merge join
    here would shuffle the full corpus n-gram explosion."""
    bench = docs.filter(F.col("doc_id") < 5)
    c = corpus.contamination_check(docs, bench)
    plan = c._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_contamination_short_docs_yield_no_ngrams(spark):
    bench = spark.createDataFrame(
        [(0, "too short"), (1, "")], "doc_id long, text string"
    )
    pool = spark.createDataFrame(
        [(100, "too short"), (101, ""), (102, "   ")], "doc_id long, text string"
    )
    # <8-token docs emit zero 8-grams: identical short/empty docs must NOT match
    assert corpus.contamination_check(pool, bench, ngram_n=8).count() == 0

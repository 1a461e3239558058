"""Corpus assembly operators: the steps between a cleaned document pool
and a training run — mixture sampling, reproducible ordering, and
benchmark-contamination checks.

These complement textprep.py (per-doc filtering/transforms): here the unit
of work is the corpus composition itself. Everything is deterministic by
construction — a training mix must be replayable bit-for-bit months later,
so every sampling/ordering decision derives from content hashes, never
``rand()``.

Scale posture:

- ``stratified_sample``  — one codegen projection + filter; no shuffle at
  all (the per-stratum threshold test is a map-side predicate). At 100 TB
  this is the cheapest possible mixture sampler: the scan prunes columns
  to (strata, key) and the filter pushes into the scan.
- ``corpus_shuffle``     — one global range-sort on a content hash. A
  training export needs *some* total order; sorting by hash is the
  standard trick that both shuffles reproducibly AND spreads adjacent
  source documents (crawl locality) across the output. Spark's sort is a
  range-partitioned exchange — the same cost any deterministic global
  shuffle pays.
- ``contamination_check`` — n-gram overlap join between a (small)
  benchmark set and the corpus, in the inverted-index shape: explode
  benchmark n-grams (tiny side, broadcast), equi-join corpus n-grams on
  the hash, count distinct shared n-grams per (corpus doc, bench doc).
  The corpus side never materializes cross-document pairs — candidates
  exist only where an n-gram actually collides, exactly like
  ``ngram_jaccard_pairs``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS_RE = r"\s+"


def _hash_unit(key: Column, salt: str) -> Column:
    """Deterministic uniform-ish [0, 1) value from a row key.

    First 8 md5 hex chars → int / 2^32: replayable in any engine with md5
    (the DuckDB oracle uses the same construction), well-mixed enough for
    sampling thresholds.
    """
    return (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(salt), key)), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key: Column | str,
    default_fraction: float = 0.0,
    salt: str = "kpf",
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-mixture builder
    ("3× wikipedia, 0.1× crawl") as a single map-side filter.

    Unlike ``DataFrame.sampleBy`` (seeded RNG over partition order, so
    adding an executor changes the sample), membership depends only on the
    row's ``key`` content hash: the same row is kept or dropped no matter
    how the data is partitioned, re-ingested, or re-ordered. Strata absent
    from ``fractions`` use ``default_fraction`` (0 = drop).
    """
    k = F.col(key) if isinstance(key, str) else key
    u = _hash_unit(k.cast("string"), salt)
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.filter(u < frac)


def corpus_shuffle(
    df: DataFrame,
    key: Column | str,
    salt: str = "kpf",
    position_col: str = "shuffle_pos",
) -> DataFrame:
    """Reproducible global shuffle: a total order by content hash.

    Returns the input with a dense 0-based ``position_col``. The order is
    a pure function of (salt, key), so a re-run — on a different cluster,
    partition count, or input file layout — produces the identical
    training order. Ties on the hash (birthday-bound rare at 32 bits)
    break on the key itself, keeping the order total and deterministic.

    Plan: one range-partitioned sort exchange; the row number is a window
    over the already-sorted data. For a file export, prefer writing the
    sorted frame with ``sortWithinPartitions`` + per-file ordering instead
    of collecting positions.
    """
    from pyspark.sql import Window

    k = F.col(key) if isinstance(key, str) else key
    h = _hash_unit(k.cast("string"), salt)
    w = Window.orderBy(h.asc(), k.asc())
    return df.withColumn(position_col, F.row_number().over(w) - 1)


def _word_ngrams(col: Column, n: int) -> Column:
    """Distinct lowercase word n-grams of the text."""
    toks = F.filter(F.split(F.lower(F.trim(col)), WS_RE), lambda w: w != "")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark-contamination scan: which corpus documents share ≥
    ``min_shared`` distinct word ``ngram_n``-grams with which benchmark
    documents (the n-gram-overlap decontamination rule used for LLM
    training sets; 8-grams ≈ the GPT-3/PaLM convention).

    Returns (corpus_id, bench_id, shared_ngrams), sorted output left to
    the caller. The join key is the md5 of the n-gram (16 bytes rides the
    shuffle, not the n-gram text); the benchmark side is explicitly
    broadcast — an eval suite is KBs–MBs against a TB corpus.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(_word_ngrams(F.col(text_col), ngram_n)).alias("_g"),
    ).select("corpus_id", F.md5("_g").alias("_gh"))
    b = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(_word_ngrams(F.col(text_col), ngram_n)).alias("_g"),
    ).select("bench_id", F.md5("_g").alias("_gh"))
    return (
        c.join(F.broadcast(b), "_gh")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count_distinct("_gh").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )

"""Training-corpus preparation operators beyond per-doc stats (textstats.py):
repetition-based quality signals, PII scrubbing, fixed-size chunking, and
corpus-level n-gram frequency — the filter/transform stages an LLM data
pipeline runs between raw crawl and tokenizer.

Scale posture: everything is either a higher-order function over the text's
own token array (no shuffle at all) or a two-level aggregation keyed by
doc_id / n-gram (map-side partial combine; the n-gram count is the classic
word-count shape that scales linearly). No Python UDFs anywhere — the hot
path is pure codegen, which matters when "documents" is 100 TB of crawl.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WS_RE = r"\s+"

# Email + long-digit-run patterns, deliberately RE2-compatible so the exact
# same pattern strings run in Spark (java.util.regex) and DuckDB (RE2) —
# oracle replayability is part of the operator contract here.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DIGIT_RUN_RE = r"\d{6,}"


def _words(col: Column) -> Column:
    """Whitespace tokens with empties dropped (split of a leading/trailing
    -space string yields '' entries in both engines)."""
    return F.filter(F.split(col, WS_RE), lambda w: w != "")


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document.

    Outputs per doc: ``n_words``, ``dup_word_frac`` (1 - distinct/total),
    ``top_bigram_frac`` (occurrences of the most frequent word bigram /
    total bigrams; ties broken lexicographically smallest). High values of
    either mark boilerplate/spam for corpus filtering.

    Plan: the word-level fractions are higher-order functions on the token
    array (zero shuffle); only the bigram mode needs an explode +
    two-level count, keyed by (doc, bigram) then doc — both combine
    map-side, and nothing ever aggregates across documents, so the job
    scales with corpus size, not vocabulary.
    """
    words = _words(F.col(text_col))
    base = df.select(
        id_col,
        words.alias("_w"),
        F.size(words).alias("n_words"),
        F.when(F.size(words) == 0, F.lit(0.0))
        .otherwise(
            1.0
            - F.size(F.array_distinct(words)).cast("double")
            / F.size(words).cast("double")
        )
        .alias("dup_word_frac"),
    )
    bigrams = base.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(F.col("_w"), 1, F.greatest(F.size("_w") - 1, F.lit(0))),
                F.slice(F.col("_w"), 2, F.greatest(F.size("_w") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("_bg"),
    )
    per_bg = bigrams.groupBy(id_col, "_bg").agg(F.count(F.lit(1)).alias("_c"))
    bg_stats = per_bg.groupBy(id_col).agg(
        (F.max("_c").cast("double") / F.sum("_c").cast("double")).alias(
            "top_bigram_frac"
        )
    )
    # left join: a doc with < 2 words has no bigrams but must not vanish
    return base.drop("_w").join(bg_stats, id_col, "left").select(
        id_col,
        "n_words",
        "dup_word_frac",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    )


def pii_scrub(
    df: DataFrame,
    text_col: str,
    id_col: str,
    email_token: str = "<EMAIL>",
    number_token: str = "<NUM>",
    email_re: str = EMAIL_RE,
    digit_re: str = DIGIT_RUN_RE,
) -> DataFrame:
    """Scrub email addresses and long digit runs, reporting match counts.

    Output: (id, n_emails, n_digit_runs, scrubbed) — the scrubbed text plus
    per-doc counts for pipeline telemetry (how much PII a source carries is
    itself a quality signal). Single projection, two regexes, all codegen.
    """
    c = F.col(text_col)
    return df.select(
        id_col,
        F.regexp_count(c, F.lit(email_re)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(digit_re)).cast("long").alias("n_digit_runs"),
        F.regexp_replace(
            F.regexp_replace(c, email_re, email_token),
            digit_re,
            number_token,
        ).alias("scrubbed"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 50,
) -> DataFrame:
    """Split each document into fixed-size word-window chunks.

    Output: (id, chunk_id, chunk_text, chunk_words) — one row per chunk,
    chunk_id 0-based. The tokenize → window → re-join all happens inside
    array functions on the row (posexplode of a ``sequence`` of chunk
    starts); Spark's generate is pipelined, so a 100 TB corpus chunks in a
    single map-only stage — no shuffle, no UDF, and the output is exactly
    the shape an embedding/tokenizer stage wants to consume.
    """
    words = _words(F.col(text_col))
    tokenized = df.select(id_col, words.alias("_w"), F.size(words).alias("_n"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.floor((F.col("_n") - 1) / chunk_words).cast("int"), F.lit(0)
        ),
    )
    exploded = tokenized.select(
        id_col,
        "_w",
        "_n",
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_w"), F.col("_start") * chunk_words + 1, chunk_words)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("chunk_words"),
    )


def corpus_ngram_topk(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
) -> DataFrame:
    """Corpus-wide top-k word n-grams with counts (tie-break: ngram asc).

    The word-count shape: build each row's n-gram array with zip_with
    (no cross-row state), explode, two-phase count (map-side partial
    combine takes the shuffle down to |vocabulary|), TakeOrdered for the
    top-k — no global sort. At 100 TB the only knob to watch is n-gram
    cardinality; for n ≤ 3 on natural text the partial-aggregate hash map
    stays effective.
    """
    words = _words(F.col(text_col))
    grams = words
    for i in range(1, n):
        grams = F.zip_with(
            F.slice(grams, 1, F.greatest(F.size(words) - i, F.lit(0))),
            F.slice(words, i + 1, F.greatest(F.size(words) - i, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("ngram_count"))
        .orderBy(F.col("ngram_count").desc(), F.col("ngram"))
        .limit(k)
    )


def doc_tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document (tie-break: term asc).

    tf = in-doc count, idf = ln(N / df_term) over the corpus. The classic
    two-aggregate shape: (doc, term) counts, term document-frequencies,
    then a rank window per doc. The df_term side is |vocabulary|-sized —
    broadcast when it fits, hash-join otherwise (left to Catalyst/AQE); the
    corpus row count N is a scalar literal plan (1-row agg crossJoin), not
    a driver-side collect.

    At 100 TB the (doc, term) explode dominates; both aggregations combine
    map-side, and nothing aggregates to a single key (no global hotspot).
    """
    words = _words(F.col(text_col))
    terms = df.select(id_col, F.explode(words).alias("term"))
    # tf feeds both the document-frequency aggregate and the scoring join;
    # pin it so the token explode + count runs once, not per consumer
    # (unique (doc, term) rows — already smaller than the raw token stream).
    # Lazy persist: keeps lineage (executor loss recomputes, not fails) and
    # defers materialization to the first consumer's action.
    from kusto_pre_forge_spark.pinning import pin

    tf = pin(terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_term"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(n_docs)
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("_n").cast("double") / F.col("df_term")),
        )
    )
    # rank on the ROUNDED score: mathematically-equal scores computed via
    # different float paths (2·ln10 vs ln100) must tie identically in any
    # replaying engine, and ties then break on the term string
    scored = scored.withColumn("tfidf", F.round("tfidf", 6))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col, "term", F.col("rank").cast("long").alias("rank"), "tfidf"
        )
    )


# ---------------------------------------------------------------------------
# Distributed mini-BPE: train merge rules on the corpus, apply them
# ---------------------------------------------------------------------------


def _java_q(s: str) -> str:
    """Literal-quote a symbol for java.util.regex (\\Q…\\E, with the one
    sequence that can escape a quote section split safely)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _repl_q(s: str) -> str:
    """Escape a regexp_replace replacement ($ group refs, backslashes)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def _merge_pattern(a: str, b: str) -> str:
    """Match the adjacent symbol pair ``a b`` on word boundaries of the
    space-joined symbol string. Lookarounds (not consumed spaces) keep
    back-to-back occurrences both replaceable — ``a b a b`` → ``ab ab``,
    where a space-consuming pattern would miss the second."""
    return f"(?:(?<=^)|(?<= )){_java_q(a)} {_java_q(b)}(?=$| )"


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_count: int = 2,
    sample_frac: float | None = None,
    sample_id_col: str | None = None,
    sample_salt: str = "kpf-bpe",
) -> list[tuple[str, str]]:
    """Learn byte-pair-encoding merge rules from the corpus — the standard
    Sennrich et al. procedure, run Spark-first: the vocabulary is a
    DISTRIBUTED (symbol-string, word_count) table, never a driver dict.

    Per iteration (driver loop, bounded like ``connected_components``):
    one map-side-combined aggregate counts adjacent symbol pairs weighted
    by word frequency, ``limit(1)`` brings back exactly ONE row (the best
    pair — ties break lexicographically for determinism), and the merge
    applies as a single regexp_replace over the symbol strings (greedy
    left-to-right non-overlapping, the reference semantics). Lineage is
    truncated each round (lazy localCheckpoint) so the logical plan stays
    flat across iterations.

    At 100 TB the vocab table is |distinct words| rows — millions, not
    trillions — so each iteration is a small aggregate; n_merges bounds
    the driver loop. NOTE the loop bound: training launches ONE Spark job
    per merge (the 1-row argmax), so a production 32k-merge tokenizer
    means 32k sequential small jobs — at that scale train on a corpus
    SAMPLE instead: pair statistics concentrate fast, so ``sample_frac``
    (deterministic md5-threshold keep on ``sample_id_col``, the
    corpus-assembly sampler — no RNG, replayable anywhere) recovers the
    same merges from a fraction of the data; 32k merges over a 1%-of-
    100 TB sample is the intended production configuration. Returns the
    merge list for :func:`apply_bpe`.
    """
    if sample_frac is not None:
        if sample_id_col is None:
            raise ValueError("sample_frac requires sample_id_col")
        from kusto_pre_forge_spark.operators.corpus import _hash_unit

        df = df.filter(
            _hash_unit(F.col(sample_id_col).cast("string"), sample_salt)
            < F.lit(float(sample_frac))
        )
    words = (
        df.select(F.explode(_words(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # symbol string: characters space-joined + end-of-word marker
    syms = F.concat(
        F.array_join(F.filter(F.split(F.col("w"), ""), lambda c: c != ""), " "),
        F.lit(" </w>"),
    )
    vocab = words.select(syms.alias("s"), "cnt").localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        toks = F.split(F.col("s"), " ")
        pairs = vocab.select(
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 1),
                        lambda i: F.struct(
                            F.element_at(toks, i).alias("a"),
                            F.element_at(toks, i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
            "cnt",
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn(
            "s", F.regexp_replace(F.col("s"), _merge_pattern(a, b), _repl_q(a + b))
        ).localCheckpoint(eager=False)
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with learned BPE merges: per word, start from characters +
    ``</w>`` and apply each merge in training order — k chained
    regexp_replace passes over the space-joined symbol string, all
    codegen, no UDF and no shuffle. Returns (id, n_words, n_bpe_tokens,
    sample_tokens) where sample_tokens is the first word's final symbol
    sequence (a human-checkable probe)."""
    w = F.explode(_words(F.lower(F.col(text_col))))
    t = df.select(F.col(id_col), w.alias("w"))
    s = F.concat(
        F.array_join(F.filter(F.split(F.col("w"), ""), lambda c: c != ""), " "),
        F.lit(" </w>"),
    )
    for a, b in merges:
        s = F.regexp_replace(s, _merge_pattern(a, b), _repl_q(a + b))
    t = t.select(id_col, F.split(s, " ").alias("toks"))
    return t.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.size("toks")).cast("long").alias("n_bpe_tokens"),
        F.min(F.array_join("toks", "|")).alias("sample_tokens"),
    )


def _text_udf(fn, name: str):
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.pandas.functions import PandasUDFType

    def wrapped(s):
        return s.map(lambda v: None if v is None else fn(v))

    wrapped.__name__ = name
    return pandas_udf(wrapped, "string", PandasUDFType.SCALAR)


def normalize_unicode(col: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) — the canonicalization
    step every dedup/tokenizer pipeline needs before hashing (visually
    identical strings with different codepoint sequences must collide).
    Arrow-batched pandas_udf over ``unicodedata`` (no JVM builtin)."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    c = F.col(col) if isinstance(col, str) else col
    return _text_udf(lambda v: unicodedata.normalize(form, v), f"norm_{form}")(c)


def strip_accents(col: Column | str) -> Column:
    """Accent folding: NFD-decompose and drop combining marks (café→cafe).
    Precomposed letters WITHOUT a canonical decomposition (ø, ł, đ …)
    pass through unchanged — the NFD definition of accent stripping, which
    is the replayable one (ICU-transliteration strippers also map ø→o but
    are version-dependent)."""
    import unicodedata

    c = F.col(col) if isinstance(col, str) else col
    return _text_udf(
        lambda v: "".join(
            ch
            for ch in unicodedata.normalize("NFD", v)
            if not unicodedata.combining(ch)
        ),
        "strip_accents",
    )(c)


def url_normalize(col: Column | str) -> Column:
    """Crawl-style URL canonicalization — the key-generation step of URL
    dedup (the same page arrives as http/https, with fragments, default
    ports, unsorted query params, trailing slashes):

    - scheme + host + PATH lowercased (aggressive-dedup choice; query
      values keep their case), scheme collapsed to https;
    - default ports (:80/:443) dropped;
    - fragment dropped;
    - query parameters SORTED (split & → array_sort → rejoin);
    - trailing slash trimmed from non-root paths.

    Pure codegen (regexp + array HOFs) — at 100 TB this runs inside the
    scan projection. Malformed input passes through lowercased (a dedup
    key must never be null for a present URL).
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    no_frag = F.regexp_replace(c, r"#.*$", "")
    lowered = F.concat(
        F.lower(F.regexp_extract(no_frag, r"^([^?]*)", 1)),
        F.regexp_extract(no_frag, r"(\?.*)?$", 1),
    )
    https = F.regexp_replace(lowered, r"^http://", "https://")
    no_port = F.regexp_replace(https, r"^(https://[^/:?]+):(?:80|443)(?=[/?]|$)", "$1")
    path = F.regexp_extract(no_port, r"^([^?]*)", 1)
    query = F.regexp_extract(no_port, r"\?(.*)$", 1)
    path_trimmed = F.when(
        path.rlike(r"^https://[^/]+/.+/$"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.when(
        query == "", path_trimmed
    ).otherwise(F.concat(path_trimmed, F.lit("?"), sorted_q))

"""Benchmark decontamination + n-gram LM quality scoring (training-data ops).

Two classic pretraining-corpus operators the reference's analytics layer
implies but never ships (reference scope: crawl + extract only); both are
table stakes for a 100 TB training-data pipeline:

- ``decontaminate``  word n-gram overlap against an eval/benchmark set
  (the GPT-3 / Llama 13-gram rule, parameterized n). Scale shape:
  the eval side is always tiny relative to the corpus (benchmarks are
  MBs, the corpus is TBs), so the plan is a map-only corpus scan —
  explode the corpus's n-grams map-side, probe a BROADCAST hash of the
  eval grams, and only the MATCHED (doc_id, gram) rows — contamination
  is rare by construction — reach the per-doc count shuffle. No
  corpus-sized shuffle anywhere.

- ``bigram_lm_scores``  add-one-smoothed bigram language-model log-prob
  per document, trained on the corpus itself (the cheap KenLM stand-in).
  Scale shape: training is two partial-agg shuffles whose outputs are
  VOCAB-sized, not corpus-sized; scoring is explode (map) → broadcast
  join against the LM (map) → per-doc avg whose partial aggregation
  collapses each partition to ≤1 row per doc BEFORE the shuffle, so the
  scoring shuffle carries ~|docs| rows, not ~|tokens|.

Both are pure JVM expression plans (split/transform/aggregate — no Python
UDFs) with exact DuckDB oracle twins in ``__spark_entry__.py`` (q47/q48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spark_frontier.analytics.textstats import tokens


def word_ngrams(toks_col, n: int) -> F.Column:
    """Word n-grams of an ALREADY-PROJECTED token-array column.

    ``F.sequence(1, k)`` with k <= 0 counts DOWN (step inference), so the
    short-document case is guarded explicitly with an empty array. Pass a
    plain column reference, not an expression — Catalyst inlines the
    argument into the per-element lambda (see dedup._char_ngrams)."""
    k = F.size(toks_col) - F.lit(n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-corpus-document benchmark contamination: how many DISTINCT word
    n-grams of the document also occur in the eval set.

    Returns every corpus row: (id_col, n_hits int, is_contaminated bool).
    n_hits counts distinct contaminated grams (one eval doc repeating a
    gram doesn't inflate it, nor does the corpus doc repeating it)."""
    def grams_of(df):
        return (
            df.select(id_col, tokens(F.col(text_col)).alias("toks"))
            .select(id_col, F.explode(
                F.array_distinct(word_ngrams(F.col("toks"), n))
            ).alias("gram"))
        )

    eval_grams = grams_of(eval_docs).select("gram").distinct()
    hits = (
        grams_of(docs)
        # broadcast: the eval-gram set is benchmark-sized by assumption
        .join(F.broadcast(eval_grams), on="gram", how="inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Add-one-smoothed bigram LM average log-probability per document,
    trained on the corpus itself:

        score(d) = avg over bigram occurrences (w1,w2) of
                   ln( (c(w1,w2) + 1) / (c(w1) + V) )

    with V = |distinct tokens in the corpus|. Higher = more typical text;
    the classic cheap perplexity proxy for quality filtering. Documents
    with < 2 tokens have no bigrams and are omitted (no score to define).
    """
    from spark_frontier.storage.materialize import materialize

    # the token projection feeds FOUR jobs (vocab count, the c1 and c2
    # broadcast builds, and the scoring pass) — without an eager cut each
    # re-runs scan+normalize+tokenize over the whole corpus (measured 4×
    # the query's real work at sf1.0); checkpoint the compact
    # (id, tokens) projection once and let every job read that.
    # repartition first: a small-file parquet scan is a handful of tasks
    # (3 at sf1.0's ~6 MB zstd file), and the checkpoint pins that
    # parallelism for every downstream stage — the q13/q21/q32 barrier
    # rule (measured 8× on the scoring pass at 32 cores)
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = materialize(
        docs.select(id_col, F.col(text_col)).repartition(par)
        .select(id_col, tokens(F.col(text_col)).alias("toks"))
    )
    bigrams = toks.select(
        id_col, F.explode(word_ngrams(F.col("toks"), 2)).alias("bigram")
    )
    unigrams = toks.select(
        id_col, F.explode(F.col("toks")).alias("tok")
    )

    vocab = unigrams.select("tok").distinct().count()
    c2 = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    c1 = unigrams.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))

    scored = (
        bigrams
        .join(F.broadcast(c2), on="bigram", how="inner")
        .withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .join(F.broadcast(c1), F.col("w1") == F.col("tok"), how="inner")
        .select(
            id_col,
            F.log(
                (F.col("c2") + F.lit(1)).cast("double")
                / (F.col("c1") + F.lit(vocab)).cast("double")
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.avg("lp").alias("lm_logprob"),
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
    )


def dup_ngram_signals(
    docs: DataFrame,
    n: int = 8,
    drop_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated n-gram signals — the per-document
    decision input for exact-substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): how much
    of a document is word n-grams that ALSO occur in some other document.

    Scale shape: gram strings never shuffle. Positions collapse to
    distinct (doc, gram-hash, n_positions) rows map-side of the first
    shuffle; cross-doc gram frequency is a count window over the 8-byte
    hash partitioning (one exchange, no self-join); the per-doc rollup is
    the only other shuffle and carries ≤ one row per (doc, distinct
    gram). Hot grams (boilerplate) skew the gram partitioning — the
    window's count is a streaming aggregate, so a hot key costs one
    sequential pass, not memory.

    Returns every input row: (id_col, n_grams, n_dup_grams, dup_frac,
    drop_doc) — position counts, so a doc that repeats a cross-doc gram
    k times counts it k times (fraction of CONTENT that is duplicated);
    docs shorter than n tokens have zero grams and are kept."""
    from pyspark.sql import Window

    # gram hash = xxhash64 over the n-token SLICE (equal grams ⟺ equal
    # hashes): the round-5 path built a ~50-byte gram string per position
    # and ran JVM md5+conv on it — the dupgram stage's dominant cost.
    # Only hash EQUALITY feeds the output (the md5 values never leave the
    # plan), so any injective-enough hash gives identical counts; output
    # parity vs the md5 path is verified exhaustively on the fixed
    # testdata SFs (no collisions there), and a future collision would
    # only merge two gram classes — the same failure mode md5-60 already
    # accepted at 16× lower probability.
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks_col = F.col("toks")
    k = F.size(toks_col) - F.lit(n - 1)
    gh_arr = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.xxhash64(F.slice(toks_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    pos = (
        docs.select(id_col, F.col(text_col)).repartition(par)
        .select(id_col, tokens(F.col(text_col)).alias("toks"))
        .select(id_col, F.explode(gh_arr).alias("gh"))
    )
    dg = pos.groupBy(id_col, "gh").agg(F.count(F.lit(1)).alias("npos"))
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    per_doc = (
        dg.withColumn("n_docs", n_docs)
        .groupBy(id_col)
        .agg(
            F.sum("npos").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("n_docs") >= 2, F.col("npos")).otherwise(0))
            .cast("long")
            .alias("n_dup_grams"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.round(
                F.coalesce(F.col("n_dup_grams") / F.col("n_grams"), F.lit(0.0)),
                6,
            ).alias("dup_frac"),
            F.coalesce(
                F.col("n_dup_grams") / F.col("n_grams") >= drop_threshold,
                F.lit(False),
            ).alias("drop_doc"),
        )
    )

"""Streaming corpus ingest: the document-side twin of the streaming
crawl path (``streaming/microbatch.py``).

Documents land as parquet files in a drop directory (the shape a fleet
of extraction workers produces); each micro-batch runs the SAME cheap
gates as the batch funnel (``pipeline.corpus.cheap_signals`` — one
shared code path, so stream and batch can never disagree on gate
semantics), exact-dedups within the batch, anti-joins against the
COMMITTED corpus's fingerprints, and appends only genuinely new
documents.

Sink invariant (same as the crawl stream): every appended row is new,
so the upsert degenerates to an append — no O(table) MERGE per
micro-batch. Crash-replay of a micro-batch re-reads the committed
fingerprint set (now containing its own earlier commit) and the
anti-join drops the replayed rows: idempotent. At 10^9-document scale
the fingerprint anti-join gets the same bloom short-circuit the crawl
path uses (``functions.bloom.dedup_unseen`` keyed on
xxhash64(fingerprint)); at the scales this sandbox can test, the plain
anti-join IS the exact path, so that upgrade is a drop-in config, not a
semantic change.

The heavy set-based stages (MinHash clusters, SemDeDup, packing) stay
batch jobs over the accumulated table — dedup across the WHOLE corpus
is a global property no single micro-batch can decide, which is why
production pipelines run ingest-gating streaming and global dedup as
periodic compaction. ``run_corpus_filter`` is that compaction pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_frontier.storage import SnapStore

DOC_SCHEMA = "doc_id long, text string, source string"


def start_corpus_stream(
    spark: SparkSession,
    source_dir: str,
    store_root: str,
    checkpoint_dir: str,
    *,
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    max_dup_word_frac: float = 0.30,
    max_top_bigram_frac: float = 0.18,
    safety_keywords: dict[str, list[str]] | None = None,
    safety_max_hit_frac: float = 0.05,
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming ingest; returns the StreamingQuery. With
    ``available_now`` (default) it drains the existing files and stops —
    the test/catch-up mode; pass ``processing_time='10 minutes'`` for a
    live trigger."""
    from spark_frontier.analytics.dedup import exact_dedup, normalize_text
    from spark_frontier.pipeline.corpus import cheap_signals

    store = SnapStore(store_root)

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        sig = cheap_signals(
            batch_df,
            allowed_langs=allowed_langs,
            min_quality=min_quality,
            max_dup_word_frac=max_dup_word_frac,
            max_top_bigram_frac=max_top_bigram_frac,
            safety_keywords=safety_keywords,
            safety_max_hit_frac=safety_max_hit_frac,
        ).filter("lang_ok AND quality_ok AND rep_ok AND safety_ok").drop(
            "lang_ok", "quality_ok", "rep_ok", "safety_ok"
        )
        sig = sig.withColumn(
            "fingerprint", F.md5(normalize_text(F.col("text")))
        )
        # within-batch exact dedup (keep the min doc_id per fingerprint)
        keep = exact_dedup(sig).select(F.col("keep_doc_id").alias("doc_id"))
        fresh = sig.join(keep, "doc_id", "semi")
        # cross-batch dedup: anti-join the committed fingerprint set
        tbl = store.table("corpus_docs")
        committed = tbl.read(batch_df.sparkSession)
        if committed is not None:
            fresh = fresh.join(
                committed.select("fingerprint").distinct(),
                "fingerprint",
                "anti",
            )
        n_in = batch_df.count()
        tbl.append(
            fresh,
            summary={"op": "corpus_stream", "stream_batch_id": int(batch_id),
                     "n_batch_input": n_in},
        )

    writer = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()

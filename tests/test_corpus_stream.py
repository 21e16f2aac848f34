"""Streaming corpus ingest: gate parity with the batch funnel,
cross-batch dedup, crash-replay idempotence."""

import pytest
from pyspark.sql import functions as F

from spark_frontier.storage import SnapStore
from spark_frontier.streaming.corpus_stream import start_corpus_stream
from tests.test_corpus_pipeline import _doc


def _write_docs(spark, rows, path, n_files=3):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).repartition(n_files).write.mode("append").parquet(path)


def test_corpus_stream_matches_batch_gates(spark, tmp_path_factory):
    """availableNow micro-batches apply the identical cheap gates as
    cheap_signals run in batch over the union, and dedup exact copies
    across micro-batch files."""
    rows = [(i, _doc(i), "web") for i in range(12)]
    rows.append((100, "el rio y la casa que esta en la colina con los "
                      "arboles de la finca", "web"))    # lang gate
    rows.append((101, "the spam and spam " + "spam " * 50, "web"))  # rep
    rows.append((102, _doc(0), "web"))                  # exact dup of 0
    src = str(tmp_path_factory.mktemp("docstream"))
    _write_docs(spark, rows, src, n_files=5)

    store_root = str(tmp_path_factory.mktemp("cstore"))
    ckpt = str(tmp_path_factory.mktemp("cckpt"))
    q = start_corpus_stream(spark, src, store_root, ckpt,
                            max_files_per_trigger=2)
    q.awaitTermination(120)

    got = SnapStore(store_root).table("corpus_docs").read(spark)
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    # batch reference: same gates over the union
    from spark_frontier.pipeline.corpus import cheap_signals

    ref = cheap_signals(
        spark.createDataFrame(rows, "doc_id long, text string, "
                                    "source string")
    ).filter("lang_ok AND quality_ok AND rep_ok AND safety_ok")
    # drop exact dups by fingerprint keeping min id, like the stream
    from spark_frontier.analytics.dedup import exact_dedup

    keep = {r["keep_doc_id"] for r in exact_dedup(ref).collect()}
    want = sorted(
        r["doc_id"] for r in ref.select("doc_id").collect()
        if r["doc_id"] in keep
    )
    # NOTE: 0 vs 102 — whichever micro-batch arrives first wins in the
    # stream; batch keeps min(0). Compare fingerprint sets, not ids,
    # to stay order-agnostic, then check ids modulo the dup pair.
    assert len(ids) == len(want)
    got_fp = sorted(r["fingerprint"] for r in got.collect())
    want_fp = sorted(
        r["fingerprint"]
        for r in ref.withColumn(
            "fingerprint",
            F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")),
        ).collect()
        if r["doc_id"] in keep
    )
    assert got_fp == want_fp


def test_corpus_stream_incremental_dedup(spark, tmp_path_factory):
    """A second drop containing copies of already-committed docs plus
    one new doc appends ONLY the new doc."""
    src = str(tmp_path_factory.mktemp("docstream2"))
    store_root = str(tmp_path_factory.mktemp("cstore2"))
    ckpt = str(tmp_path_factory.mktemp("ck1"))
    batch1 = [(i, _doc(i), "web") for i in range(5)]
    _write_docs(spark, batch1, src, n_files=1)
    q = start_corpus_stream(spark, src, store_root, ckpt)
    q.awaitTermination(120)
    n1 = SnapStore(store_root).table("corpus_docs").read(spark).count()
    assert n1 == 5

    # second drop: 3 copies (new doc_ids, same text) + 1 genuinely new;
    # SAME checkpoint → the restarted stream reads only the new files,
    # and the committed-fingerprint anti-join drops the copies
    batch2 = [(200 + i, _doc(i), "web") for i in range(3)]
    batch2.append((300, _doc(300), "web"))
    _write_docs(spark, batch2, src, n_files=1)
    q2 = start_corpus_stream(spark, src, store_root, ckpt)
    q2.awaitTermination(120)
    out = SnapStore(store_root).table("corpus_docs").read(spark)
    assert out.count() == n1 + 1
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 300 in ids and not ids & {200, 201, 202}


def test_corpus_stream_kill_mid_stream_resume(spark, tmp_path_factory,
                                              monkeypatch):
    """Kill-mid-stream/resume (round-4 VERDICT item 7, mirroring the
    frontier's wave-resume test): crash the ingest on its SECOND
    corpus_docs append, resume from the SAME checkpoint, and the final
    corpus_docs set must equal an uninterrupted run's — the crashed
    micro-batch replays, the committed-fingerprint anti-join makes the
    replay idempotent, and nothing is double-counted or lost."""
    from spark_frontier.storage.snapstore import SnapTable

    rows = [(i, _doc(i % 11), "web") for i in range(30)]  # cross-file dups
    src = str(tmp_path_factory.mktemp("docstream4"))
    _write_docs(spark, rows, src, n_files=6)

    # uninterrupted reference run
    ref_store = str(tmp_path_factory.mktemp("cstore_ref"))
    q = start_corpus_stream(
        spark, src, ref_store, str(tmp_path_factory.mktemp("ck_ref")),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    ref = SnapStore(ref_store).table("corpus_docs").read(spark)
    want_fp = sorted(r["fingerprint"] for r in ref.collect())

    # killed run: the 2nd micro-batch's docs append raises mid-commit
    store_root = str(tmp_path_factory.mktemp("cstore_kill"))
    ckpt = str(tmp_path_factory.mktemp("ck_kill"))
    real_append = SnapTable.append
    state = {"docs_appends": 0, "crash": True}

    def _crashing_append(self, df, summary=None, **kw):
        if self.name == "corpus_docs" and state["crash"]:
            state["docs_appends"] += 1
            if state["docs_appends"] == 2:
                raise RuntimeError("simulated mid-stream crash")
        return real_append(self, df, summary=summary, **kw)

    monkeypatch.setattr(SnapTable, "append", _crashing_append)
    q = start_corpus_stream(spark, src, store_root, ckpt,
                            max_files_per_trigger=1)
    with pytest.raises(Exception, match="simulated mid-stream crash"):
        q.awaitTermination(180)
    n_partial = SnapStore(store_root).table("corpus_docs").read(spark)
    assert n_partial is not None  # batch 1 landed, stream died after

    # resume from the same checkpoint with the fault cleared
    state["crash"] = False
    q2 = start_corpus_stream(spark, src, store_root, ckpt,
                             max_files_per_trigger=1)
    q2.awaitTermination(180)
    got = SnapStore(store_root).table("corpus_docs").read(spark)
    got_fp = sorted(r["fingerprint"] for r in got.collect())
    assert got_fp == want_fp          # same set, no loss
    assert len(set(got_fp)) == len(got_fp)  # and no double-counted doc


def test_corpus_stream_bloom_parity(spark, tmp_path_factory):
    """Bloom on vs off produce the IDENTICAL fingerprint set (the probe
    short-circuits, never decides), and the committed bloom's
    provenance covers the corpus head after the drain."""
    rows = [(i, _doc(i % 7), "web") for i in range(40)]  # heavy dups
    src = str(tmp_path_factory.mktemp("docstream3"))
    _write_docs(spark, rows, src, n_files=6)

    outs = {}
    for flag in (True, False):
        store_root = str(tmp_path_factory.mktemp(f"cstore_{flag}"))
        q = start_corpus_stream(
            spark, src, store_root,
            str(tmp_path_factory.mktemp(f"ck_{flag}")),
            max_files_per_trigger=2, use_bloom=flag,
        )
        q.awaitTermination(120)
        st = SnapStore(store_root)
        tbl = st.table("corpus_docs").read(spark)
        outs[flag] = sorted(r["fingerprint"] for r in tbl.collect())
        if flag:
            bloom = st.table("corpus_bloom")
            assert bloom.read(spark) is not None
            assert bloom.summary()["covers"] == \
                st.table("corpus_docs").snapshot_id
    assert outs[True] == outs[False]
    assert len(outs[True]) == 7  # one survivor per distinct text

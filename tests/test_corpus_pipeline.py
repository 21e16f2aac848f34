"""End-to-end corpus-filter funnel: every stage wired, funnel monotone,
store tables committed, rerun deterministic."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_frontier.pipeline.corpus import run_corpus_filter
from spark_frontier.storage.snapstore import SnapStore


SPAN = ("alpha bridge carries the heavy northern traffic over frozen "
        "water each long winter season")  # 14 tokens, shared 104<->105

EVAL_PHRASE = ("the hidden benchmark sentence about golden retrievers "
               "running very fast in tall grass today")  # 14 tokens


def _doc(i: int, tail: str = "") -> str:
    """Mostly-unique English doc: stopword-bearing frame + per-doc
    md5-derived tokens, so lang/quality pass while cross-doc 8-grams
    and shingle overlaps don't exist between different docs."""
    import hashlib

    uniq = " ".join(
        hashlib.md5(f"{i}-{j}".encode()).hexdigest()[:6] for j in range(20)
    )
    return f"the story of part {i} is that {uniq} and it ends there {tail}"


@pytest.fixture(scope="module")
def corpus(spark):
    """Synthetic corpus exercising every funnel branch: English docs
    (kept), a Spanish doc (lang gate), a repeated-token doc (repetition
    gate), an exact duplicate pair, a near-duplicate pair, a pair
    sharing a long span (dup-ngram gate: only the mostly-shared side
    drops), a doc overlapping the eval set, and a semantic-dup pair."""
    rows = [(i, _doc(i), "web") for i in range(19)]
    rows.append((19, _doc(19, EVAL_PHRASE), "web"))               # decontam
    rows.append((100, "el rio es muy bonito y la casa que esta en la "
                      "colina con los arboles", "web"))           # lang gate
    rows.append((101, "the spam and spam " + "spam " * 50, "web"))  # repetition
    rows.append((102, _doc(0), "web"))                            # exact dup
    rows.append((103, _doc(1) + " tiny drift", "web"))            # near dup
    rows.append((104, _doc(104, SPAN), "web"))     # span minority — kept
    rows.append((105, SPAN + " brief outro w105", "web"))  # span majority
    rows.append((110, _doc(110), "books"))
    rows.append((111, _doc(111), "books"))         # semantic dup of 110
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")


def _embeddings_for(spark, docs):
    """Deterministic 8-dim embeddings aligned to doc ids; docs 110/111
    share a direction (semantic dups), everything else is random."""
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    rng = np.random.default_rng(11)
    shared = rng.normal(size=8)
    rows = []
    for i in sorted(ids):
        if i in (110, 111):
            v = shared + (1e-3 if i == 111 else 0.0)
        else:
            v = rng.normal(size=8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_corpus_filter_funnel(spark, corpus, tmp_path):
    store = str(tmp_path / "warehouse")
    emb = _embeddings_for(spark, corpus)
    eval_df = spark.createDataFrame(
        [(9000, EVAL_PHRASE)], "doc_id long, text string"
    )
    report = run_corpus_filter(
        spark,
        corpus,
        store,
        embeddings=emb,
        eval_docs=eval_df,  # shares 8-grams with doc 19 only
        semdedup_threshold=0.999,
        pack_capacity=32,
    )
    # funnel is monotone non-increasing
    order = ["n_input", "n_lang", "n_quality", "n_repetition", "n_exact",
             "n_neardup", "n_dupgram", "n_decontam", "n_semdedup"]
    vals = [report[k] for k in order]
    assert vals == sorted(vals, reverse=True), report
    assert report["n_input"] == 28
    assert report["n_lang"] == 27          # spanish doc out
    assert report["n_repetition"] == report["n_quality"] - 1  # spam out
    assert report["n_exact"] == report["n_repetition"] - 1   # 102 out
    assert report["n_neardup"] == report["n_exact"] - 1      # 103 out
    assert report["n_dupgram"] == report["n_neardup"] - 1    # 105 out
    assert report["n_decontam"] == report["n_dupgram"] - 1   # 19 out
    assert report["n_semdedup"] == report["n_decontam"] - 1  # 111 out
    assert report["n_kept"] == report["n_semdedup"]
    assert report["n_sequences"] >= 1

    st = SnapStore(store)
    kept = st.table("corpus_docs").read(spark)
    assert kept.count() == report["n_kept"]
    assert {"lang", "quality", "n_tokens", "fingerprint"} <= set(kept.columns)
    assert kept.filter(
        "doc_id in (100, 101, 102, 103, 105, 19, 111)"
    ).count() == 0
    assert kept.filter("doc_id = 104").count() == 1  # span minority kept

    packing = st.table("corpus_packing").read(spark)
    assert packing.count() == report["n_kept"]
    # stream total == sum of token counts, chunked at capacity 32
    tot = packing.agg(F.sum("n_tokens")).first()[0]
    last = packing.orderBy(F.col("offset").desc()).first()
    assert last["offset"] + last["n_tokens"] == tot
    assert report["n_sequences"] == (tot + 31) // 32

    log = st.table("corpus_log").read(spark)
    assert log.count() == 1
    assert log.first()["n_kept"] == report["n_kept"]


def test_corpus_filter_deterministic(spark, corpus, tmp_path):
    a = run_corpus_filter(spark, corpus, str(tmp_path / "w1"),
                          pack_capacity=32)
    b = run_corpus_filter(spark, corpus, str(tmp_path / "w2"),
                          pack_capacity=32)
    assert a.pop("batch_ts") and b.pop("batch_ts")
    a.pop("stage_walls_s"), b.pop("stage_walls_s")  # wall clocks vary
    assert a == b
    k1 = sorted(
        r["doc_id"] for r in SnapStore(str(tmp_path / "w1"))
        .table("corpus_docs").read(spark).select("doc_id").collect()
    )
    k2 = sorted(
        r["doc_id"] for r in SnapStore(str(tmp_path / "w2"))
        .table("corpus_docs").read(spark).select("doc_id").collect()
    )
    assert k1 == k2


def test_corpus_filter_quota_mix(spark, corpus, tmp_path):
    report = run_corpus_filter(
        spark, corpus, str(tmp_path / "w3"),
        quotas={"web": 5, "books": 1}, pack_capacity=32,
    )
    assert report["n_mix"] <= 6
    assert report["n_kept"] == report["n_mix"]
    kept = SnapStore(str(tmp_path / "w3")).table("corpus_docs").read(spark)
    per_src = {r["source"]: r["n"] for r in
               kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_src.get("web", 0) <= 5 and per_src.get("books", 0) <= 1


def test_corpus_filter_dsir_stage(spark, corpus, tmp_path):
    """DSIR stage keeps docs scoring >= threshold against the target
    LM. The target is built from docs 3/4's text, so they outscore all
    other docs; the threshold is set mid-gap between the two groups
    (operator-level scoring is covered by q53 — this pins the wiring)."""
    from spark_frontier.analytics.sampling import dsir_logweights

    target = spark.createDataFrame(
        [(9100, _doc(3)), (9101, _doc(4))], "doc_id long, text string"
    )
    # the stage scores the post-gate survivor set (lang/quality/rep/
    # exact/neardup/dupgram have already dropped 100-103 and 105), and
    # logweight is a per-document SUM, so the reference scores must be
    # computed over the same set — shorter dropped docs would otherwise
    # accrue less negative mass and sit above the gap
    live_like = corpus.filter("doc_id <= 19 or doc_id in (104, 110, 111)")
    scores = {r["doc_id"]: r["logweight"] for r in
              dsir_logweights(live_like, target).collect()}
    lo = max(v for k, v in scores.items() if k not in (3, 4))
    hi = min(scores[3], scores[4])
    assert lo < hi  # target-built docs strictly outscore the rest
    tau = (lo + hi) / 2

    report = run_corpus_filter(
        spark, corpus, str(tmp_path / "w4"),
        dsir_target=target, dsir_threshold=tau, pack_capacity=32,
    )
    assert report["n_dsir"] == 2
    assert report["n_kept"] == report["n_dsir"]
    kept = SnapStore(str(tmp_path / "w4")).table("corpus_docs").read(spark)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {3, 4}


def test_corpus_filter_safety_stage(spark, corpus, tmp_path):
    """A blocklist drawn from one doc's own tokens drops exactly that
    doc inside the cheap-signal pass (n_safety key present and -1)."""
    import hashlib

    blocked = [hashlib.md5(f"7-{j}".encode()).hexdigest()[:6]
               for j in range(20)]  # doc 7's unique tokens
    report = run_corpus_filter(
        spark, corpus, str(tmp_path / "w5"),
        safety_keywords={"test": blocked}, safety_max_hit_frac=0.2,
        pack_capacity=32,
    )
    assert report["n_safety"] == report["n_repetition"] - 1
    kept = SnapStore(str(tmp_path / "w5")).table("corpus_docs").read(spark)
    assert kept.filter("doc_id = 7").count() == 0
    assert kept.filter("doc_id = 8").count() == 1


def test_corpus_filter_bpe_packing(spark, corpus, tmp_path):
    """pack_tokens='bpe': the tokenizer trains on the FILTERED corpus,
    the merge table commits as an artifact, and the packing stream is
    measured in subwords (strictly more units than whitespace words)."""
    report = run_corpus_filter(
        spark, corpus, str(tmp_path / "w6"),
        pack_tokens="bpe", bpe_merges=8, pack_capacity=64,
    )
    assert report["n_bpe_merges"] == 8
    st = SnapStore(str(tmp_path / "w6"))
    merges = st.table("corpus_bpe_merges").read(spark)
    assert merges.count() == 8
    packing = st.table("corpus_packing").read(spark)
    kept = st.table("corpus_docs").read(spark)
    # subword stream >= word stream for every doc (merges only start
    # from characters; 8 merges can't reach whole-word tokens here)
    joined = packing.alias("p").join(
        kept.select("doc_id", F.col("n_tokens").alias("n_words")),
        "doc_id",
    )
    bad = joined.filter("n_tokens < n_words").count()
    assert bad == 0
    tot = packing.agg(F.sum("n_tokens")).first()[0]
    assert report["n_sequences"] == (tot + 63) // 64


def test_corpus_filter_split_assignment(spark, corpus, tmp_path):
    report = run_corpus_filter(
        spark, corpus, str(tmp_path / "w7"),
        splits={"train": 0.7, "val": 0.3}, pack_capacity=32,
    )
    assert sum(report["splits"].values()) == report["n_kept"]
    kept = SnapStore(str(tmp_path / "w7")).table("corpus_docs").read(spark)
    assert set(kept.columns) >= {"split", "fingerprint"}
    per = {r["split"]: r["n"] for r in
           kept.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert per == report["splits"]


def test_corpus_filter_pii_scrub(spark, tmp_path):
    """scrub_pii_text=True commits REDACTED text; the stored fingerprint
    hashes the committed (clean) form."""
    import hashlib

    rows = [(1, "the story is that contact me at bob@example.com for "
                "more details on the project we discussed here", "web")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    run_corpus_filter(spark, docs, str(tmp_path / "w8"),
                      scrub_pii_text=True, pack_capacity=32)
    kept = SnapStore(str(tmp_path / "w8")).table("corpus_docs").read(spark)
    r = kept.first()
    assert "bob@example.com" not in r["text"]
    assert "<EMAIL>" in r["text"]
    norm = " ".join(r["text"].lower().split())
    assert r["fingerprint"] == hashlib.md5(norm.encode()).hexdigest()

"""BPE trainer/encoder vs a pure-Python reference implementation."""

from collections import Counter

from spark_frontier.analytics.bpe import END, bpe_encode, bpe_train


def _ref_train(texts, n_merges, min_count=2):
    words = Counter()
    for t in texts:
        words.update(" ".join(t.lower().split()).split())
    vocab = {tuple(list(w) + [END]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (l, r), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_count:
            break
        merges.append((l, r, c))
        vocab = {_ref_apply(s, l, r): n for s, n in vocab.items()}
    return merges


def _ref_apply(syms, left, right):
    res, i = [], 0
    syms = list(syms)
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            res.append(left + right)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return tuple(res)


def _ref_encode(text, merges):
    toks = []
    for w in " ".join(text.lower().split()).split():
        syms = tuple(list(w) + [END])
        for l, r, _ in merges:
            syms = _ref_apply(syms, l, r)
        toks.extend(syms)
    return toks


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "the lowest newest lower the the",
    "wider wide widest new low",
]


def test_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe_train(docs, n_merges=12, min_count=2)
    want = _ref_train(TEXTS, n_merges=12, min_count=2)
    assert got == want
    assert len(got) >= 8  # the corpus genuinely supports many merges

    enc = {r["doc_id"]: list(r["subwords"]) for r in
           bpe_encode(docs, got).collect()}
    for i, t in enumerate(TEXTS):
        assert enc[i] == _ref_encode(t, want), i


def test_bpe_incremental_matches_reference_deep(spark):
    """Stress the incremental pair-count maintenance (round-5): a small
    alphabet forces repeated symbols (aa/aaa chains), merge-created
    symbols colliding with existing ones, and pair counts that rise and
    fall — 300 merges at min_count=1 drains the vocabulary completely,
    so every heap-invalidation and index-update path runs. The full
    recount reference must agree move-for-move."""
    import random

    rng = random.Random(42)
    texts = [
        " ".join(
            "".join(rng.choice("aab") for _ in range(rng.randint(1, 9)))
            for _ in range(40)
        )
        for _ in range(25)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, n_merges=300, min_count=1)
    want = _ref_train(texts, n_merges=300, min_count=1)
    assert got == want
    assert len(got) >= 50  # deep enough to be a real stress


def test_bpe_encode_reconstructs_words(spark):
    """Concatenating a word's subwords reproduces word + end marker —
    BPE is a segmentation, never lossy."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=6)
    enc = bpe_encode(docs, merges).collect()
    for r in enc:
        flat = "".join(r["subwords"]).replace(END, " ").strip()
        norm = " ".join(TEXTS[r["doc_id"]].lower().split())
        assert flat == norm

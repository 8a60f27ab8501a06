"""BPE trainer: golden corpus, Python-reference property, determinism."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from fdp_dynamically_controlled_streams_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
)


def _py_bpe(texts: list[str], n_merges: int):
    """Plain-Python reference trainer sharing only the DEFINITION:
    word-frequency table, most-frequent adjacent pair with
    (freq desc, left asc, right asc) tie-break, greedy left-to-right
    non-overlapping merge."""
    wf = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                wf[w] += 1
    vocab = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wf[w]
        if not pairs:
            break
        (left, right), pf = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, pf))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab, wf


def _train(spark, texts, n_merges):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return df, sorted(
        map(tuple, bpe_train(df, n_merges=n_merges).collect())
    )


def test_bpe_golden_sennrich_corpus(spark):
    # the canonical example: low x5, lower x2, newest x6, widest x3
    texts = [" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)]
    _, got = _train(spark, texts, 6)
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
        (6, "ew", "est", 6),
    ]


def test_bpe_matches_python_reference_hypothesis(spark):
    @settings(max_examples=8, deadline=None)
    @given(
        words=st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            min_size=1, max_size=25,
        ),
        n_merges=st.integers(1, 8),
    )
    def run(words, n_merges):
        texts = [" ".join(words)]
        expected, _, _ = _py_bpe(texts, n_merges)
        _, got = _train(spark, texts, n_merges)
        assert got == sorted(expected)

    run()


def test_bpe_partition_invariance(spark):
    texts = [f"token stream spark merge value table row {i % 7}" for i in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = sorted(map(tuple, bpe_train(df, n_merges=10).collect()))
    b = sorted(map(tuple, bpe_train(df.repartition(13), n_merges=10).collect()))
    assert a == b


def test_bpe_apply_counts_match_python_fold(spark):
    texts = ["low lower lowest newest new widest wide", "low low newest"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_full, vocab, _ = _py_bpe(texts, 5)
    merges = [(l, r) for _, l, r, _ in merges_full]
    got = {r.doc_id: r for r in bpe_apply(df, merges).collect()}
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        n_tok = sum(len(vocab[w]) for w in words)
        n_chr = sum(len(w) for w in words)
        assert got[i].n_bpe_tokens == n_tok, i
        assert got[i].n_chars_tokenized == n_chr, i


def test_bpe_merges_reduce_token_count(spark):
    texts = ["aaab aaab aaab bbba bbba ccc"]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    m = sorted(map(tuple, bpe_train(df, n_merges=4).collect()))
    base = bpe_apply(df, []).collect()[0].n_bpe_tokens
    prev = base
    for k in range(1, len(m) + 1):
        cur = bpe_apply(df, [(l, r) for _, l, r, _ in m[:k]]).collect()[0]
        assert cur.n_bpe_tokens < prev  # every merge with freq>0 shrinks
        prev = cur.n_bpe_tokens

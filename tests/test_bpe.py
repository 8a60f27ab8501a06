"""BPE trainer: golden corpus, Python-reference property, determinism."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from fdp_dynamically_controlled_streams_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
    bpe_train_py,
)

#: the reference trainer now lives next to the operator (it doubles as the
#: catalog entry's py-reference oracle); the tests keep their local name.
_py_bpe = bpe_train_py


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


def test_bpe_batched_matches_sequential_hypothesis(spark):
    """r9 verdict task 5: the batched trainer (several merges per driver
    round-trip, accepted under the contiguous/disjoint/strict-bound rule)
    must equal the SEQUENTIAL trainer bit-for-bit — ranks, pairs, AND
    pair_freq — on conflict-heavy corpora (tiny alphabet → accepted
    prefixes shrink, rejected candidates exercise every break branch)."""

    @settings(max_examples=8, deadline=None)
    @given(
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=8),
            min_size=1, max_size=20,
        ),
        n_merges=st.integers(2, 10),
        batch=st.sampled_from([2, 4, 16]),
    )
    def run(words, n_merges, batch):
        texts = [" ".join(words)]
        expected, _, _ = _py_bpe(texts, n_merges)
        df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
        got = sorted(
            map(tuple, bpe_train(df, n_merges=n_merges, batch=batch).collect())
        )
        assert got == sorted(expected)

    run()


def test_bpe_batched_golden_sennrich(spark):
    # batch sizes 1 (pure sequential) and 6 (whole table in one round-trip)
    # learn the identical golden table
    texts = [" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    seq = sorted(map(tuple, bpe_train(df, n_merges=6, batch=1).collect()))
    bat = sorted(map(tuple, bpe_train(df, n_merges=6, batch=6).collect()))
    assert seq == bat
    assert seq[0] == (1, "e", "s", 9)


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


# ------------------------------------------------- apply-oracle mechanism

def _replace_merge(syms: list[str], left: str, right: str) -> list[str]:
    """The SQL oracle's mechanism in pure Python: wrap each symbol in
    separators, one left-to-right non-overlapping str.replace per merge."""
    s = "".join(f"_{x}_" for x in syms)
    s = s.replace(f"_{left}__{right}_", f"_{left}{right}_")
    return [x for x in s.split("_") if x]


def _fold_merge(syms: list[str], left: str, right: str) -> list[str]:
    """_merge_once's fold semantics in pure Python."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def test_replace_mechanism_equals_fold_hypothesis():
    """The bpe_apply oracle applies merges via separator-wrapped
    str.replace (a genuinely different mechanism from the F.aggregate
    fold); prove the two agree on arbitrary symbol sequences and pairs —
    including left==right run parity and multi-char symbols."""

    @settings(max_examples=200, deadline=None)
    @given(
        syms=st.lists(st.text(alphabet="ab", min_size=1, max_size=3),
                      min_size=1, max_size=12),
        left=st.text(alphabet="ab", min_size=1, max_size=3),
        right=st.text(alphabet="ab", min_size=1, max_size=3),
    )
    def run(syms, left, right):
        assert _replace_merge(syms, left, right) == _fold_merge(
            syms, left, right
        )

    run()


def test_bpe_apply_sql_matches_python_on_duckdb():
    """Execute the actual DuckDB oracle SQL against a tiny corpus and
    compare with the plain-Python fold pipeline."""
    import duckdb
    import pandas as pd  # noqa: F401  (duckdb fetchdf)

    from fdp_dynamically_controlled_streams_spark.operators.bpe import (
        bpe_apply_sql,
    )

    texts = ["low lower lowest wide widest", "seen seed trees; low!"]
    merges = [("l", "o"), ("lo", "w"), ("e", "e"), ("ee", "s"), ("s", "t")]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
                + ") AS t(doc_id, text)")
    got = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(bpe_apply_sql(merges)).fetchall()
    }
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        n_sym = 0
        for w in words:
            syms = list(w)
            for l, r in merges:
                syms = _fold_merge(syms, l, r)
            n_sym += len(syms)
        assert got[i] == (n_sym, sum(len(w) for w in words)), i


def test_accept_batch_symbol_collision():
    """The r10-ADVICE collision stop on the factored pure rule: when an
    accepted pair's concatenation equals an already-existing symbol, the
    batch must accept that pair and NOTHING after it (later candidates'
    counts may be stale once old and new 'lr' merge indistinguishably)."""
    from fdp_dynamically_controlled_streams_spark.operators.bpe import (
        _accept_batch,
    )

    # 'abc' already exists (e.g. created by ('ab','c') in a prior round);
    # the top candidate ('a','bc') re-creates it -> stop after accepting.
    created = {"ab", "bc", "abc"}
    rows = [
        ("a", "bc", 90, 10, 10),   # collides with existing 'abc'
        ("x", "y", 80, 5, 5),      # symbol-disjoint, high count: would
        ("q", "z", 70, 5, 5),      # otherwise be accepted
    ]
    got = _accept_batch(rows, created)
    assert got == [("a", "bc", 90)]
    assert "abc" in created and "xy" not in created

    # collision on the SECOND accept: first survives, second accepted,
    # third (disjoint, above-bound) rejected by the stop.
    created = {"cd"}
    rows = [
        ("a", "b", 90, 0, 0),
        ("c", "d", 80, 0, 0),      # re-creates 'cd'
        ("e", "f", 70, 0, 0),
    ]
    got = _accept_batch(rows, created)
    assert got == [("a", "b", 90), ("c", "d", 80)]

    # no collision -> all three accepted (disjoint, strictly above bounds)
    created = set()
    rows = [
        ("a", "b", 90, 10, 10),
        ("c", "d", 80, 10, 10),
        ("e", "f", 70, 10, 10),
    ]
    assert _accept_batch(rows, created) == [
        ("a", "b", 90),
        ("c", "d", 80),
        ("e", "f", 70),
    ]
    assert created == {"ab", "cd", "ef"}


def test_accept_batch_bound_and_overlap_clauses():
    """The pre-existing premises on the pure rule: symbol overlap with an
    earlier accept stops the batch, as does a count at-or-below an earlier
    accept's new-pair bound (ties lose: tie-break order on fresh symbol
    strings is unknowable driver-side)."""
    from fdp_dynamically_controlled_streams_spark.operators.bpe import (
        _accept_batch,
    )

    # overlap: second candidate reuses 'b'
    got = _accept_batch(
        [("a", "b", 90, 0, 0), ("b", "c", 80, 0, 0)], set()
    )
    assert got == [("a", "b", 90)]

    # bound: first accept's bound = min(90, max(85, 0)) = 85; the second
    # candidate's 85 TIES the bound -> rejected.
    got = _accept_batch(
        [("a", "b", 90, 85, 0), ("c", "d", 85, 0, 0)], set()
    )
    assert got == [("a", "b", 90)]

    # strictly above the bound -> accepted.
    got = _accept_batch(
        [("a", "b", 90, 85, 0), ("c", "d", 86, 0, 0)], set()
    )
    assert got == [("a", "b", 90), ("c", "d", 86)]

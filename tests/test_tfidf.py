"""Vocabulary + TF-IDF: hand-computable corpus, plan shape for the rank."""

from __future__ import annotations

import math

from fdp_dynamically_controlled_streams_spark.operators.tfidf import (
    term_doc_counts,
    tfidf,
    tokens,
    vocabulary,
)


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog SAT."),
        (3, "cat,cat cat!"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokenize_lowercases_and_drops_empties(spark):
    got = sorted(
        (r.doc_id, r.term) for r in tokens(_docs(spark), "text", "doc_id").collect()
    )
    assert (2, "sat") in got  # "SAT." -> lowercased, trailing '.' stripped
    assert all(t for _, t in got)
    assert [t for d, t in got if d == 3] == ["cat", "cat", "cat"]


def test_term_doc_counts(spark):
    got = {
        (r.doc_id, r.term): r.tf
        for r in term_doc_counts(_docs(spark), "text", "doc_id").collect()
    }
    assert got[(1, "the")] == 2
    assert got[(3, "cat")] == 3
    assert got[(2, "dog")] == 1


def test_vocabulary_rank_and_ties(spark):
    got = [
        (r.term, r.doc_freq, r.total_tf, r.rank)
        for r in vocabulary(_docs(spark), "text", "doc_id", top_k=3)
        .orderBy("rank")
        .collect()
    ]
    # df: the=2, sat=2, cat=2, rest=1; lexicographic among ties
    assert got == [("cat", 2, 4, 1), ("sat", 2, 2, 2), ("the", 2, 3, 3)]


def test_tfidf_weights_match_formula(spark):
    got = {
        (r.doc_id, r.term): (r.tf, r.weight)
        for r in tfidf(_docs(spark), "text", "doc_id").collect()
    }
    n = 3

    def w(tf, df_):
        return round(tf * (math.log((1 + n) / (1 + df_)) + 1.0), 6)

    assert got[(3, "cat")] == (3, w(3, 2))
    assert got[(1, "mat")] == (1, w(1, 1))
    assert got[(2, "dog")] == (1, w(1, 1))
    # a term in every doc keeps a positive weight under smooth idf
    all_docs_weight = w(1, 3)
    assert all_docs_weight > 0


def test_vocab_rank_plans_ordered_limit_not_global_sort(spark):
    df = vocabulary(_docs(spark), "text", "doc_id", top_k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

"""Behavioral laws for BM25 retrieval and span-level n-gram dedup (the
catalog entries prove engine parity; these prove the operators behave)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.dedup import (
    duplicate_ngram_spans,
)
from fdp_dynamically_controlled_streams_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- BM25

CORPUS = [
    (0, "spark shuffle join window"),
    (1, "spark shuffle join window extra words here"),
    (2, "completely different vocabulary tokens appear"),
    (3, "spark spark spark shuffle shuffle join join window window"),
    (4, "join window"),
]


def test_bm25_near_duplicate_ranks_first(spark):
    docs = _docs(spark, CORPUS)
    out = bm25_topk(
        docs, docs.where(F.col("doc_id") == 0), k=3, max_df_frac=1.0
    ).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    # doc 1 shares all 4 query terms at ideal length; doc 2 shares none
    assert ranked[0] in (1, 3)
    assert 2 not in ranked
    assert all(r.query_id == 0 for r in out)


def test_bm25_excludes_self_and_caps_k(spark):
    docs = _docs(spark, CORPUS)
    out = bm25_topk(docs, docs, k=2, max_df_frac=1.0).collect()
    assert all(r.query_id != r.doc_id for r in out)
    from collections import Counter

    per_q = Counter(r.query_id for r in out)
    assert all(c <= 2 for c in per_q.values())
    # ranks are 1..k dense per query
    for q in per_q:
        assert sorted(r.rank for r in out if r.query_id == q) == list(
            range(1, per_q[q] + 1)
        )


def test_bm25_df_cap_drops_ubiquitous_terms(spark):
    # 'common' appears in every doc -> dropped at max_df_frac=0.5;
    # only 'rare' (df=2) can score
    rows = [
        (0, "common rare"),
        (1, "common rare"),
        (2, "common"),
        (3, "common"),
    ]
    docs = _docs(spark, rows)
    out = bm25_topk(
        docs, docs.where(F.col("doc_id") == 0), k=4, max_df_frac=0.5
    ).collect()
    assert [r.doc_id for r in out] == [1]


def test_bm25_scores_monotone_in_rank(spark):
    docs = _docs(spark, CORPUS)
    out = sorted(
        bm25_topk(
            docs, docs.where(F.col("doc_id") == 3), k=5, max_df_frac=1.0
        ).collect(),
        key=lambda r: r.rank,
    )
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_index_equals_inline(spark, tmp_path):
    """Law: querying a materialized index (bm25_index_write +
    bm25_topk_from_index — the "index once, query many" shape the catalog
    entry runs) returns EXACTLY the inline bm25_topk answer: same
    expression tree over parquet-round-tripped inputs, so scores are
    bit-identical, not merely close."""
    from fdp_dynamically_controlled_streams_spark.operators.retrieval import (
        bm25_index_write,
        bm25_topk_from_index,
    )

    docs = _docs(spark, CORPUS)
    bm25_index_write(docs, str(tmp_path))
    inline = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in bm25_topk(docs, docs, k=3, max_df_frac=1.0).collect()
    }
    via_index = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in bm25_topk_from_index(
            spark, str(tmp_path), docs, k=3, max_df_frac=1.0
        ).collect()
    }
    assert via_index == inline


def test_bm25_matches_python_bruteforce(spark):
    """Independent-formula cross-check (r7 verdict task 5): the engine's
    integer-summed postings-join BM25 vs a plain-Python brute force over a
    20-doc corpus that shares only the DEFINITION (Robertson idf
    ln((N-df+0.5)/(df+0.5)+1), k1=1.2, b=0.75, tf saturation over the
    length-normalized denominator), never the engine's expression tree,
    join shape, or rounding idiom. Hash parity vs the DuckDB twin proves
    the shared shape is portable; this proves the shape computes BM25.

    Tolerance: the engine rounds each per-term contribution to 1e-6
    before the integer sum, so |engine - exact| <= 5e-7 per shared term;
    queries here share <= 8 terms -> 5e-6 bound, asserted at 1e-5."""
    import math
    import re
    from collections import Counter

    corpus = [
        (i, text)
        for i, text in enumerate(
            [
                "spark shuffle join window partition",
                "spark shuffle join window partition extra words here now",
                "completely different vocabulary tokens appear in this one",
                "spark spark spark shuffle shuffle join join window window",
                "join window",
                "adaptive query execution re-plans shuffle partitions",
                "broadcast the small dimension side of the join",
                "watermark late data event time session window",
                "columnar parquet scan with predicate pushdown",
                "predicate pushdown prunes row groups in parquet",
                "tokenizer splits on non alphanumeric characters",
                "bm25 ranks by saturated term frequency",
                "term frequency saturates under k1",
                "document length normalization uses b and avgdl",
                "spark window",
                "shuffle partition skew salting",
                "join",
                "empty of overlap entirely separate text",
                "the quick brown fox jumps over lazy dog",
                "quick brown fox and spark shuffle",
            ]
        )
    ]
    query_ids = {0, 3, 11, 16, 19}
    k, max_df_frac = 6, 0.5

    toks = {d: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t] for d, s in corpus}
    n = len(corpus)
    dfreq = Counter()
    for ts in toks.values():
        dfreq.update(set(ts))
    avgdl = sum(len(ts) for ts in toks.values()) / n
    cap = math.floor(n * max_df_frac)

    expected = {}
    for q in query_ids:
        scores = {}
        for d, ts in toks.items():
            if d == q:
                continue
            tf = Counter(ts)
            s = 0.0
            for term in set(toks[q]):
                if term not in tf or dfreq[term] > cap:
                    continue
                idf = math.log((n - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
                s += (
                    idf
                    * tf[term]
                    * (1.2 + 1.0)
                    / (tf[term] + 1.2 * (1.0 - 0.75 + 0.75 * len(ts) / avgdl))
                )
            if s > 0:
                scores[d] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (d, s) in enumerate(top, 1):
            expected[(q, d)] = (rank, s)

    docs = _docs(spark, corpus)
    got = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in bm25_topk(
            docs,
            docs.where(F.col("doc_id").isin(list(query_ids))),
            k=k,
            max_df_frac=max_df_frac,
        ).collect()
    }
    assert set(got) == set(expected)
    for key, (rank, score) in expected.items():
        grank, gscore = got[key]
        assert grank == rank, key
        assert abs(gscore - score) <= 1e-5, key


# ------------------------------------------------- duplicate n-gram spans


def test_span_dedup_flags_shared_block(spark):
    shared = "one two three four five six seven"
    rows = [
        (0, f"intro words {shared} tail a"),
        (1, f"other start {shared} different end"),
        (2, "nothing in common with anything else at all"),
    ]
    out = {
        r.doc_id: r
        for r in duplicate_ngram_spans(_docs(spark, rows), n=5).collect()
    }
    # shared block is 7 tokens -> 3 shared 5-gram positions -> span 7
    assert out[0].n_dup_ngrams == 3
    assert out[0].max_dup_span_tokens == 7
    assert out[1].n_dup_ngrams == 3
    assert out[2].n_dup_ngrams == 0 and out[2].dup_fraction == 0.0
    assert out[0].dup_fraction == round(3 / out[0].n_ngrams, 6)


def test_span_dedup_within_doc_repeat_not_flagged(spark):
    # the same 5-gram twice in ONE doc is not a cross-doc duplicate
    rows = [
        (0, "a b c d e a b c d e"),
        (1, "totally unrelated text goes right here now"),
    ]
    out = {
        r.doc_id: r
        for r in duplicate_ngram_spans(_docs(spark, rows), n=5).collect()
    }
    assert out[0].n_dup_ngrams == 0


def test_span_dedup_short_docs_zero_ngrams(spark):
    rows = [(0, "just four small tokens"), (1, "just four small tokens")]
    out = {
        r.doc_id: r
        for r in duplicate_ngram_spans(_docs(spark, rows), n=5).collect()
    }
    assert all(r.n_ngrams == 0 and r.dup_fraction == 0.0 for r in out.values())


def test_span_dedup_two_separate_runs(spark):
    blk1 = "p q r s t"
    blk2 = "v w x y z"
    rows = [
        (0, f"{blk1} GAP1 GAP2 {blk2}"),
        (1, f"{blk1} other filler words {blk2}"),
    ]
    out = {
        r.doc_id: r
        for r in duplicate_ngram_spans(_docs(spark, rows), n=5).collect()
    }
    # each block is exactly one 5-gram; runs are separate -> max span 5
    assert out[0].n_dup_ngrams == 2
    assert out[0].max_dup_span_tokens == 5


# ------------------------------------------------------------------ RRF


def test_rrf_identity_and_consensus_laws(spark):
    """Two laws of reciprocal-rank fusion: (1) fusing a list with itself
    preserves its ordering exactly (identity); (2) a doc ranked by BOTH
    lists outscores a doc holding the same single-list rank in only one
    (consensus dominance)."""
    from fdp_dynamically_controlled_streams_spark.operators.retrieval import (
        RRF_SCALE,
        rrf_fuse,
    )

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    same = rrf_fuse([a, a], topk=3).collect()
    order = [r.doc_id for r in sorted(same, key=lambda r: r.rank)]
    assert order == [10, 11, 12]
    assert all(
        r.rrf_micro == 2 * (RRF_SCALE // (60 + i + 1))
        for i, r in enumerate(sorted(same, key=lambda r: r.rank))
    )
    # doc 11 is rank-2 in both lists; doc 99 is rank-2 in one only
    b = spark.createDataFrame(
        [(0, 20, 1), (0, 11, 2), (0, 21, 3)],
        "query_id long, doc_id long, rank int",
    )
    fused = {r.doc_id: r.rrf_micro for r in rrf_fuse([a, b], topk=6).collect()}
    assert fused[11] == 2 * (RRF_SCALE // 62)
    assert fused[11] > fused[10]  # consensus at rank 2+2 beats single rank 1


def test_rrf_recall_dominates_singles_on_consensus_fixture(spark):
    """The dominance law behind hybrid retrieval (Cormack 2009): on a
    consensus-labeled fixture (near-duplicate qrels, where both rankers
    carry real signal), the FUSED top-10 recalls at least as many
    relevant docs as either single ranker — measured through the actual
    catalog entry at the correctness SF."""
    from fdp_dynamically_controlled_streams_spark.queries import spark_queries

    rows = {
        r.ranker: r
        for r in spark_queries()["retrieval_quality_report"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert set(rows) == {"bm25", "tfidf", "rrf"}
    assert rows["rrf"].hits10 >= max(rows["bm25"].hits10, rows["tfidf"].hits10)
    assert rows["rrf"].hits10 > 0  # the labels are non-degenerate


def test_rrf_empty_input_raises(spark):
    # r8 ADVICE: a clear error instead of AttributeError on None.groupBy
    import pytest

    from fdp_dynamically_controlled_streams_spark.operators.retrieval import (
        rrf_fuse,
    )

    with pytest.raises(ValueError, match="at least one rank table"):
        rrf_fuse([])


def test_tfidf_dot_and_bm25_rankers_disagree_and_fuse(spark):
    """The two rankers are genuinely different (BM25 saturates tf, the
    dot is linear), so on a tf-skewed fixture their top-1 differs and the
    fusion contains candidates from both."""
    from fdp_dynamically_controlled_streams_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
        tfidf_dot_topk,
    )

    rows = [
        (0, "spark shuffle join"),
        # massive tf repetition: linear dot loves it, BM25 saturates
        (1, " ".join(["spark"] * 40)),
        # balanced overlap at sane length: BM25's preferred match
        (2, "spark shuffle join window partition"),
        (3, "unrelated text entirely different tokens"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = docs.where(F.col("doc_id") == 0)
    a = bm25_topk(docs, q, k=3, max_df_frac=1.0).select(
        "query_id", "doc_id", "rank"
    )
    b = tfidf_dot_topk(docs, q, k=3)
    top_a = [r.doc_id for r in a.collect() if r.rank == 1][0]
    top_b = [r.doc_id for r in b.collect() if r.rank == 1][0]
    assert top_a == 2 and top_b == 1  # saturation vs linearity
    fused = [r.doc_id for r in rrf_fuse([a, b.select("query_id", "doc_id", "rank")], topk=3).collect()]
    assert {1, 2} <= set(fused)


# ------------------------------------------------- raw-index maintenance


def test_bm25_raw_index_maintenance_laws(spark):
    """Retrieval maintenance laws (r12): (1) screening day k against a
    raw index maintained by bm25_raw_index_upsert equals screening
    against a FROM-SCRATCH raw index of the same growing corpus —
    including the global df/n/avgdl stats, which the upsert moves by
    exact integer deltas; (2) the upsert is idempotent; (3) a re-crawled
    doc's old postings leave (its terms' df decrement, df-0 terms leave
    the table)."""
    from fdp_dynamically_controlled_streams_spark.operators.retrieval import (
        bm25_raw_index,
        bm25_raw_index_upsert,
        bm25_screen_against_raw,
    )

    seed = _docs(
        spark,
        [
            (1, "spark streaming engine with keyed state"),
            (2, "duckdb oracle twin checks every catalog entry"),
        ],
    )
    days = [
        _docs(spark, [(10, "spark streaming engine again"), (11, "zzz qqq unique")]),
        _docs(spark, [(20, "duckdb oracle twin again plus spark")]),
    ]
    probe = _docs(spark, [(99, "spark streaming oracle")])

    def rows(t, df, s):
        return sorted(
            map(tuple, bm25_screen_against_raw(probe, t, df, s, k=10).collect())
        )

    t, df, s = bm25_raw_index(seed)
    corpus = seed
    for day in days:
        # (1) maintained == from-scratch on the same corpus
        t2, df2, s2 = bm25_raw_index_upsert(t, df, s, day)
        corpus = corpus.unionByName(day)
        ft, fdf, fs = bm25_raw_index(corpus)
        assert rows(t2, df2, s2) == rows(ft, fdf, fs)
        assert s2.collect() == fs.collect()
        t, df, s = t2, df2, s2
    # (2) idempotence
    t3, df3, s3 = bm25_raw_index_upsert(t, df, s, days[1])
    assert rows(t3, df3, s3) == rows(t, df, s)
    assert s3.collect() == s.collect()
    # (3) re-crawl: doc 11's unique terms leave the df table entirely
    assert df.where(F.col("term") == "zzz").count() == 1
    t4, df4, s4 = bm25_raw_index_upsert(
        t, df, s, _docs(spark, [(11, "ordinary spark words")])
    )
    assert df4.where(F.col("term") == "zzz").count() == 0
    ft, fdf, fs = bm25_raw_index(
        corpus.where(F.col("doc_id") != 11).unionByName(
            _docs(spark, [(11, "ordinary spark words")])
        )
    )
    assert rows(t4, df4, s4) == rows(ft, fdf, fs)


def test_bm25_raw_index_compaction_invisible_and_consistent(spark):
    """BM25 raw-index compaction laws (r12 verdict task 3): after delta
    upserts including a re-crawl, (1) screening against the compacted
    index equals screening against the composed one; (2) the compacted
    plan is a bare materialized scan; (3) the maintained df/stats are
    consistent with the compacted postings — df_t re-derives exactly
    from tdc_dl's live rows and (n, sumdl) from its per-doc rows (the
    NULL-term sentinels make the relation self-contained)."""
    from fdp_dynamically_controlled_streams_spark.operators.retrieval import (
        bm25_raw_index,
        bm25_raw_index_compact,
        bm25_raw_index_upsert,
        bm25_screen_against_raw,
    )

    seed = _docs(
        spark,
        [
            (1, "spark streaming engine with keyed state"),
            (2, "duckdb oracle twin checks every catalog entry"),
            (3, ""),
        ],
    )
    t, df, s = bm25_raw_index(seed)
    t, df, s = bm25_raw_index_compact(t, df, s)
    days = [
        _docs(spark, [(10, "spark streaming engine again"), (11, "")]),
        # re-crawl: 10 changes text, 11 becomes token-full
        _docs(spark, [(10, "different words now"), (11, "spark oracle")]),
    ]
    for day in days:
        t, df, s = bm25_raw_index_upsert(t, df, s, day, delta=True)
    ct, cdf, cs = bm25_raw_index_compact(t, df, s)
    probe = _docs(spark, [(99, "spark streaming oracle")])

    def rows(a, b, c):
        return sorted(
            map(tuple, bm25_screen_against_raw(probe, a, b, c, k=10).collect())
        )

    assert rows(ct, cdf, cs) == rows(t, df, s)
    assert "Join" in t._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in ct._jdf.queryExecution().optimizedPlan().toString()
    # consistency: maintained df/stats == re-derived from live postings
    rederived_df = sorted(
        map(
            tuple,
            ct.where(F.col("term").isNotNull())
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .collect(),
        )
    )
    assert rederived_df == sorted(map(tuple, cdf.collect()))
    per_doc = ct.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    n, sumdl = per_doc.agg(
        F.count(F.lit(1)), F.sum("dl").cast("long")
    ).collect()[0]
    srow = cs.collect()[0]
    assert (srow.n, srow.sumdl) == (n, sumdl) == (5, srow.sumdl)


def test_bm25_fold_postings_bit_identical_to_build(spark):
    """Write→read fold law (r13): folding the maintained raw index
    produces postings row- and bit-identical to _build_index's, and
    after delta upserts (including a re-crawl and token-less docs) a
    fold of the MAINTAINED raw index equals a from-scratch build of the
    same corpus — so topk served from a folded maintained index is the
    from-scratch answer."""
    from fdp_dynamically_controlled_streams_spark.operators.retrieval import (
        _build_index,
        bm25_fold_postings,
        bm25_raw_index,
        bm25_raw_index_upsert,
    )

    seed = _docs(
        spark,
        [
            (1, "spark streaming engine with keyed state"),
            (2, "duckdb oracle twin checks every catalog entry"),
            (3, ""),
        ],
    )
    folded = sorted(map(tuple, bm25_fold_postings(*bm25_raw_index(seed)).collect()))
    built = sorted(map(tuple, _build_index(seed, "doc_id", "text")[0].collect()))
    assert folded == built and folded
    # maintained raw -> fold == from-scratch build of the grown corpus
    t, df, s = bm25_raw_index(seed)
    days = [
        _docs(spark, [(10, "spark streaming engine again"), (11, "")]),
        _docs(spark, [(2, "formerly empty now spark"), (11, "oracle words")]),
    ]
    corpus = seed
    for day in days:
        t, df, s = bm25_raw_index_upsert(t, df, s, day, delta=True)
        ids = [r.doc_id for r in day.select("doc_id").collect()]
        corpus = corpus.where(~F.col("doc_id").isin(ids)).unionByName(day)
    folded2 = sorted(map(tuple, bm25_fold_postings(t, df, s).collect()))
    built2 = sorted(
        map(tuple, _build_index(corpus, "doc_id", "text")[0].collect())
    )
    assert folded2 == built2 and folded2


def test_tfidf_fold_weights_bit_identical_to_build(spark):
    """One raw artifact, two read forms (r13): folding the maintained
    BM25 raw index into TF-IDF integer weights is bit-identical to
    _tfidf_weights built from scratch — including after delta upserts
    with a re-crawl and token-less docs (n counts every doc in both)."""
    from fdp_dynamically_controlled_streams_spark.operators.retrieval import (
        _tfidf_weights,
        bm25_raw_index,
        bm25_raw_index_upsert,
        tfidf_fold_weights,
    )

    seed = _docs(
        spark,
        [
            (1, "spark streaming engine with keyed state"),
            (2, "duckdb oracle twin checks every catalog entry"),
            (3, ""),
        ],
    )
    folded = sorted(
        map(tuple, tfidf_fold_weights(*bm25_raw_index(seed)).collect())
    )
    built = sorted(map(tuple, _tfidf_weights(seed, "doc_id", "text").collect()))
    assert folded == built and folded
    t, df, s = bm25_raw_index(seed)
    days = [
        _docs(spark, [(10, "spark streaming engine again"), (11, "")]),
        _docs(spark, [(2, "formerly empty now spark"), (11, "oracle words")]),
    ]
    corpus = seed
    for day in days:
        t, df, s = bm25_raw_index_upsert(t, df, s, day, delta=True)
        ids = [r.doc_id for r in day.select("doc_id").collect()]
        corpus = corpus.where(~F.col("doc_id").isin(ids)).unionByName(day)
    folded2 = sorted(map(tuple, tfidf_fold_weights(t, df, s).collect()))
    built2 = sorted(
        map(tuple, _tfidf_weights(corpus, "doc_id", "text").collect())
    )
    assert folded2 == built2 and folded2


def test_bm25_raw_index_tokenless_docs(spark):
    """Token-less documents (empty / punctuation-only text — common in
    real crawls) count toward n and avgdl exactly as in _build_index and
    the DuckDB twin (r12 ADVICE): maintained stats stay bit-identical to
    from-scratch through upserts that add, retire, and re-crawl such
    docs in both directions."""
    from fdp_dynamically_controlled_streams_spark.operators.retrieval import (
        _build_index,
        bm25_raw_index,
        bm25_raw_index_upsert,
        bm25_screen_against_raw,
    )

    seed = _docs(
        spark,
        [
            (1, "spark streaming engine with keyed state"),
            (2, ""),
            (3, " ... !!! "),
        ],
    )
    probe = _docs(spark, [(99, "spark streaming oracle")])

    def rows(t, df, s):
        return sorted(
            map(tuple, bm25_screen_against_raw(probe, t, df, s, k=10).collect())
        )

    t, df, s = bm25_raw_index(seed)
    # n counts ALL docs (the _build_index / SQL-twin semantics), so the
    # raw stats reproduce the compacted index's avgdl exactly
    assert s.collect()[0].n == 3
    avg_compact = _build_index(seed, "doc_id", "text")[2].collect()[0]
    srow = s.collect()[0]
    assert srow.n == avg_compact.n
    assert srow.sumdl / srow.n == avg_compact.avgdl
    corpus = seed
    days = [
        # a new token-less doc arrives; a token-full one arrives
        _docs(spark, [(10, ""), (11, "duckdb oracle twin checks spark")]),
        # re-crawl in BOTH directions: empty -> token-full, full -> empty
        _docs(spark, [(2, "formerly empty now has spark words"), (11, "")]),
    ]
    for day in days:
        t2, df2, s2 = bm25_raw_index_upsert(t, df, s, day)
        ids = [r.doc_id for r in day.select("doc_id").collect()]
        corpus = corpus.where(~F.col("doc_id").isin(ids)).unionByName(day)
        ft, fdf, fs = bm25_raw_index(corpus)
        assert s2.collect() == fs.collect()
        assert rows(t2, df2, s2) == rows(ft, fdf, fs)
        t, df, s = t2, df2, s2
    assert s.collect()[0].n == 5

"""Golden tests for the repetition-quality and benchmark-contamination
operators (operators/text.py repetition_stats, operators/contamination.py)
on hand-computed tiny corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.contamination import (
    contamination_report,
)
from fdp_dynamically_controlled_streams_spark.operators.text import (
    local_min_fingerprints,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_golden(spark):
    rows = [
        # bigrams: "a b","b a","a b","b a","a b" -> 5 total, 2 distinct, top 3
        (1, "a b a b a b"),
        # "x y","y z" -> 2 total, 2 distinct, top 1: no repetition
        (2, "x y z"),
        (3, "solo"),  # < 2 tokens: absent from the report
        (4, ""),  # empty: absent
    ]
    out = {
        r.doc_id: r for r in repetition_stats(_docs(spark, rows)).collect()
    }
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1.n_bigrams, r1.n_distinct_bigrams, r1.top_count) == (5, 2, 3)
    assert r1.dup_bigram_fraction == 0.6  # (5-2)*1e6 div 5 / 1e6
    assert r1.top_bigram_fraction == 0.6
    r2 = out[2]
    assert (r2.n_bigrams, r2.n_distinct_bigrams, r2.top_count) == (2, 2, 1)
    assert r2.dup_bigram_fraction == 0.0
    assert r2.top_bigram_fraction == 0.5


def test_repetition_degenerate_single_bigram_loop(spark):
    # pathological boilerplate: one token repeated -> one distinct bigram
    out = repetition_stats(_docs(spark, [(1, "spam spam spam spam")])).collect()[0]
    assert (out.n_bigrams, out.n_distinct_bigrams, out.top_count) == (3, 1, 3)
    assert out.dup_bigram_fraction == 0.666666
    assert out.top_bigram_fraction == 1.0


def test_contamination_golden(spark):
    rows = [
        (0, "the quick brown fox jumps"),  # eval doc (id % 2 == 0 below)
        # fully contained 3-grams of the eval doc -> ratio 1.0, flagged
        (1, "the quick brown fox"),
        # one of its two shingles matches ("quick brown fox") -> 0.5, flagged
        (3, "a quick brown fox"),
        # no overlap
        (5, "entirely different words here"),
        (7, "too short"),  # < 3 tokens: absent
    ]
    rep = contamination_report(
        _docs(spark, rows), F.col("doc_id") % 2 == 0, flag_ratio=0.5
    )
    out = {r.doc_id: r for r in rep.collect()}
    assert set(out) == {1, 3, 5}  # eval doc and short doc excluded
    assert (out[1].n_shingles, out[1].n_overlap) == (2, 2)
    assert out[1].overlap_ratio == 1.0 and out[1].contaminated
    assert (out[3].n_shingles, out[3].n_overlap) == (2, 1)
    assert out[3].overlap_ratio == 0.5 and out[3].contaminated
    assert (out[5].n_shingles, out[5].n_overlap) == (2, 0)
    assert out[5].overlap_ratio == 0.0 and not out[5].contaminated


def test_contamination_shuffle_fallback_matches_broadcast(spark):
    # r4 advice: a corpus-slice-sized eval side must not broadcast — the
    # shuffle fallback (broadcast_eval=False) and the auto gate with a cap
    # of 0 (forces the fallback) must both return identical results.
    rows = [(i, f"w{i % 4} common token stream {i % 3}") for i in range(20)]
    pred = F.col("doc_id") % 5 == 0
    base = sorted(
        contamination_report(_docs(spark, rows), pred, broadcast_eval=True)
        .collect()
    )
    shuffled = sorted(
        contamination_report(_docs(spark, rows), pred, broadcast_eval=False)
        .collect()
    )
    gated = sorted(
        contamination_report(
            _docs(spark, rows), pred, broadcast_eval=None, eval_broadcast_cap=0
        ).collect()
    )
    assert base == shuffled == gated and len(base) > 0


def test_contamination_duplicate_shingles_counted_once(spark):
    # training doc repeats an eval shingle: distinct-counting keeps ratio sane
    rows = [(0, "p q r"), (1, "p q r p q r p q r")]
    out = contamination_report(
        _docs(spark, rows), F.col("doc_id") == 0
    ).collect()[0]
    # doc 1 distinct shingles: "p q r","q r p","r p q" -> only "p q r" matches
    assert (out.n_shingles, out.n_overlap) == (3, 1)
    assert out.overlap_ratio == 0.333333 and not out.contaminated


# --- content-defined fingerprints (local-minimum / winnowing family) ---


def test_fingerprints_density_and_short_docs(spark):
    import random

    rng = random.Random(11)
    text = "".join(rng.choice("abcdefgh ") for _ in range(300))
    rows = [(1, text), (2, "tiny"), (3, "")]  # k=5: docs 2,3 yield nothing
    out = local_min_fingerprints(_docs(spark, rows), k=5, radius=3).collect()
    assert {r.doc_id for r in out} == {1}
    positions = sorted(r.pos for r in out)
    n_grams = len(text.strip()) - 4
    # statistical density: a random position is a radius-3 local min with
    # p = 1/7 (ties only raise it), so expect ~n/7 picks; assert a loose
    # band (no HARD gap bound exists for local-minima selection — that
    # guarantee needs full per-window winnowing)
    assert n_grams // 14 <= len(positions) <= n_grams // 2
    # selection is reproducible and anchored to content, not position count
    again = sorted(
        r.pos
        for r in local_min_fingerprints(_docs(spark, rows), k=5, radius=3).collect()
    )
    assert positions == again


def test_fingerprints_edit_locality(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    edited = base.replace("jumps", "jumPs")  # single-char edit mid-string
    idx = base.index("jumPs".lower())
    out_a = local_min_fingerprints(_docs(spark, [(1, base)])).collect()
    out_b = local_min_fingerprints(_docs(spark, [(1, edited)])).collect()
    a = {(r.pos, r.fingerprint) for r in out_a}
    b = {(r.pos, r.fingerprint) for r in out_b}
    # fingerprints can only differ where a k-gram or its radius overlaps the
    # edited character: pos in [idx-7-4, idx+7] (k=5, radius=3, 0-based->1-based)
    lo, hi = idx - 11, idx + 12
    assert {p for p, _ in a ^ b} <= set(range(lo, hi + 1))
    # far-from-edit fingerprints are identical
    assert {(p, h) for p, h in a if p < lo} == {(p, h) for p, h in b if p < lo}

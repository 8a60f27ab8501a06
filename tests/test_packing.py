"""Token-stream packing + overlapped chunking: hand-computable corpora,
boundary/straddle semantics, plan shape (one shuffle for packing, zero for
chunking)."""

from __future__ import annotations

from fdp_dynamically_controlled_streams_spark.operators.packing import (
    chunk_text,
    pack_token_stream,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_offsets_and_straddles(spark):
    # one shard (n_shards=1): stream is doc order 1,2,3,4
    # tokens: 3, 4, 0, 5 ; budget 4 → packs: [0,3) p0, [3,7) p0→straddle,
    # [7,7) empty, [7,12) p1→straddle
    rows = [
        (1, "a b c"),
        (2, "d e f g"),
        (3, "..."),
        (4, "h i j k l"),
    ]
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.pack_id, r.straddles)
        for r in pack_token_stream(
            _docs(spark, rows), "doc_id", "text", budget=4, n_shards=1
        ).collect()
    }
    assert got[1] == (3, 0, 0, False)
    assert got[2] == (4, 3, 0, True)  # tokens 3..6 cross the 4-boundary
    assert got[3] == (0, 7, 1, False)  # empty doc: zero width, never straddles
    assert got[4] == (5, 7, 1, True)  # tokens 7..11 cross the 8-boundary


def test_pack_exact_boundary_does_not_straddle(spark):
    # doc exactly fills a pack: [0,4) with budget 4 → last token index 3 is
    # still pack 0
    rows = [(1, "a b c d"), (2, "e f g h")]
    got = {
        r.doc_id: (r.start_offset, r.pack_id, r.straddles)
        for r in pack_token_stream(
            _docs(spark, rows), "doc_id", "text", budget=4, n_shards=1
        ).collect()
    }
    assert got[1] == (0, 0, False)
    assert got[2] == (4, 1, False)


def test_pack_shards_are_independent_streams(spark):
    rows = [(i, "t " * 3) for i in range(8)]
    out = pack_token_stream(_docs(spark, rows), "doc_id", "text", budget=100, n_shards=4)
    rs = out.collect()
    assert {r.shard for r in rs} == {0, 1, 2, 3}
    # within each shard offsets restart at 0 and advance by n_tokens
    for s in range(4):
        offs = sorted(r.start_offset for r in rs if r.shard == s)
        assert offs == [0, 3]


def test_chunk_covers_all_tokens_with_overlap(spark):
    rows = [(1, " ".join(f"t{i}" for i in range(10)))]
    got = sorted(
        (r.chunk_id, r.start_token, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_text(_docs(spark, rows), "doc_id", "text", size=4, overlap=2).collect()
    )
    # stride 2 → starts 0,2,4,6,8 ; final chunk short (2 tokens)
    assert [(c, s, n) for c, s, n, _ in got] == [
        (0, 0, 4),
        (1, 2, 4),
        (2, 4, 4),
        (3, 6, 4),
        (4, 8, 2),
    ]
    assert got[0][3] == "t0 t1 t2 t3"
    assert got[4][3] == "t8 t9"
    # every token index appears in at least one chunk
    covered = set()
    for _, s, n, _ in got:
        covered |= set(range(s, s + n))
    assert covered == set(range(10))


def test_chunk_no_overlap_and_empty_doc(spark):
    rows = [(1, "a b c d e"), (2, "!!!")]
    got = [
        (r.doc_id, r.chunk_id, r.chunk_text)
        for r in chunk_text(_docs(spark, rows), "doc_id", "text", size=2, overlap=0)
        .orderBy("doc_id", "chunk_id")
        .collect()
    ]
    assert got == [(1, 0, "a b"), (1, 1, "c d"), (1, 2, "e")]  # doc 2: no rows


def test_chunk_plan_has_no_shuffle_and_pack_has_one(spark):
    rows = [(i, "a b c") for i in range(4)]
    chunk_plan = chunk_text(
        _docs(spark, rows), "doc_id", "text", size=2, overlap=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in chunk_plan
    pack_plan = pack_token_stream(
        _docs(spark, rows), "doc_id", "text", budget=4, n_shards=2
    )._jdf.queryExecution().executedPlan().toString()
    assert pack_plan.count("Exchange hashpartitioning") == 1

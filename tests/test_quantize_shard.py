"""Golden + property tests for embedding int8 quantization
(operators/quantize.py) and deterministic shard assignment
(operators/sampling.py shard_assignment)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.quantize import (
    quantize_int8,
    quantize_report,
)
from fdp_dynamically_controlled_streams_spark.operators.sampling import (
    shard_assignment,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_golden(spark):
    out = quantize_report(
        _vecs(spark, [(1, [1.0, -0.5, 0.25, 0.0])])
    ).collect()[0]
    # scale = 1.0; q = [127, -64, 32, 0]  (round(-63.5) away from zero = -64)
    assert out.scale_absmax == 1.0 and out.n_dims == 4
    assert out.q_sum == 127 - 64 + 32
    assert out.q_abs_sum == 127 + 64 + 32
    assert out.n_at_full_scale == 1
    # recon err: only -0.5 and 0.25 are inexact (-64/127, 32/127)
    err = (-0.5 + 64 / 127) ** 2 + (0.25 - 32 / 127) ** 2
    assert abs(out.recon_mse - err / 4) < 1e-9


def test_quantize_zero_vector_guard(spark):
    out = quantize_report(_vecs(spark, [(1, [0.0, 0.0])])).collect()[0]
    assert out.scale_absmax == 0.0 and out.q_sum == 0 and out.recon_mse == 0.0


def test_quantize_array_values(spark):
    df = _vecs(spark, [(1, [2.0, -1.0, 0.5])])
    q = df.select(
        quantize_int8(
            F.col("embedding"),
            F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))),
        ).alias("q")
    ).collect()[0].q
    assert q == [127, -64, 32]  # scale 2.0: round(±x/2*127)


def test_quantize_values_bounded(spark):
    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(16)]) for i in range(50)
    ]
    rep = quantize_report(_vecs(spark, rows))
    bad = rep.where(
        (F.col("q_abs_sum") > 127 * F.col("n_dims"))
        | (F.col("n_at_full_scale") < 1)
        | (F.col("recon_mse") < 0)
    )
    assert bad.count() == 0


def test_shard_assignment_is_permutation(spark):
    docs = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    out = shard_assignment(docs, "doc_id", n_shards=8, seed=3).collect()
    assert len(out) == 500
    assert len({r.doc_id for r in out}) == 500  # every row exactly once
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shard_assignment_deterministic_and_seeded(spark):
    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    a = {(r.doc_id, r.shard, r.pos) for r in shard_assignment(docs, "doc_id", 4, seed=1).collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in shard_assignment(docs, "doc_id", 4, seed=1).collect()}
    c = {(r.doc_id, r.shard, r.pos) for r in shard_assignment(docs, "doc_id", 4, seed=2).collect()}
    assert a == b  # same seed: byte-identical assignment (resumable writes)
    assert a != c  # new seed: an independent permutation

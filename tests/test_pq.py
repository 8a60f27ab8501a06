"""PQ laws: codebook shape/determinism, duplicate-vector retrieval, and
partition invariance (the catalog entry proves engine parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.pq import (
    pq_adc_topk,
    pq_train,
)


def _emb(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<float>",
    )


def _blobs(n, dim, k=4):
    # k well-separated blobs on axis-aligned anchors
    rows = []
    for i in range(n):
        c = i % k
        v = [0.0] * dim
        for d in range(dim):
            v[d] = 10.0 * c + ((i * 31 + d * 7) % 5) * 0.01
        rows.append((i, v))
    return rows


def test_pq_train_shape_and_determinism(spark):
    df = _emb(spark, _blobs(64, 16), 16)
    cb = pq_train(df, m=4, k=8)
    assert len(cb) == 4 and all(len(s) == 8 for s in cb)
    assert all(len(c) == 4 for s in cb for c in s)
    cb2 = pq_train(df.repartition(13), m=4, k=8)
    assert cb == cb2


def test_pq_duplicate_vector_ranks_first(spark):
    rows = _blobs(40, 16)
    # make id 39 an exact duplicate of probe id 0
    rows[39] = (39, rows[0][1])
    df = _emb(spark, rows, 16)
    out = pq_adc_topk(df, [0], k_nn=39, m=4, k_codes=8).collect()
    # duplicate shares q's own codes -> minimal possible ADC distance
    # (blob-mates quantizing to the same codes tie; they cannot beat it)
    dup = [r for r in out if r.cand_id == 39]
    assert dup and dup[0].adc_dist == min(r.adc_dist for r in out)


def test_pq_adc_partition_invariance(spark):
    df = _emb(spark, _blobs(60, 16), 16)
    a = sorted(
        map(tuple, pq_adc_topk(df, [0, 1], k_nn=4, m=4, k_codes=8).collect())
    )
    b = sorted(
        map(
            tuple,
            pq_adc_topk(
                df.repartition(11), [0, 1], k_nn=4, m=4, k_codes=8
            ).collect(),
        )
    )
    assert a == b


def test_pq_excludes_self_and_dense_ranks(spark):
    df = _emb(spark, _blobs(30, 16), 16)
    out = pq_adc_topk(df, [2, 5], k_nn=4, m=4, k_codes=8).collect()
    assert all(r.probe_id != r.cand_id for r in out)
    for p in (2, 5):
        assert sorted(r.rank for r in out if r.probe_id == p) == [1, 2, 3, 4]


def test_pq_dim_not_divisible_raises(spark):
    df = _emb(spark, _blobs(20, 18), 18)
    try:
        pq_train(df, m=4, k=8)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError")


# ------------------------------------------------------------- rerank tier

from fdp_dynamically_controlled_streams_spark.operators.pq import (
    ivf_pq_rerank_topk,
    ivf_pq_topk,
)
from fdp_dynamically_controlled_streams_spark.operators.similarity import (
    brute_force_topk,
)


def test_rerank_output_is_subset_of_shortlist(spark):
    df = _emb(spark, _blobs(48, 16), 16)
    kw = dict(n_cells=4, n_probe=2, m=4, k_codes=8)
    short = {
        (r.probe_id, r.cand_id)
        for r in ivf_pq_topk(df, [0, 1], k_nn=12, **kw).collect()
    }
    got = ivf_pq_rerank_topk(df, [0, 1], k_nn=4, shortlist=12, **kw).collect()
    assert got and all((r.probe_id, r.cand_id) in short for r in got)


def test_rerank_without_pruning_equals_brute_force(spark):
    # n_probe = n_cells (no cell pruning) + corpus-deep shortlist: the
    # exact rerank must reproduce brute force bit-for-bit
    df = _emb(spark, _blobs(40, 16), 16)
    got = sorted(
        map(
            tuple,
            ivf_pq_rerank_topk(
                df, [0, 1], k_nn=5, shortlist=39, n_cells=4, n_probe=4,
                m=4, k_codes=8,
            ).collect(),
        )
    )
    exact = sorted(map(tuple, brute_force_topk(df, [0, 1], k=5).collect()))
    assert got == exact


def test_rerank_recall_geq_ivf_pq_law(spark):
    # LAW (r7 verdict task 1): every exact-top-k neighbor that reaches the
    # ADC shortlist is retained by the exact rerank — fewer than k corpus
    # items beat it on exact score, so fewer than k shortlist items do, and
    # tie-break (desc score, asc cand_id) matches brute_force. Since the
    # shortlist (ADC top-15) contains the plain IVF-PQ top-5, rerank's hit
    # set must contain IVF-PQ's hit set: recall is monotone under rerank.
    df = _emb(spark, _blobs(64, 16), 16)
    probes = [0, 1, 2, 3]
    kw = dict(n_cells=4, n_probe=2, m=4, k_codes=8)
    exact = {
        (r.probe_id, r.cand_id)
        for r in brute_force_topk(df, probes, k=5).collect()
    }
    ivfpq = {
        (r.probe_id, r.cand_id)
        for r in ivf_pq_topk(df, probes, k_nn=5, **kw).collect()
    }
    rer = {
        (r.probe_id, r.cand_id)
        for r in ivf_pq_rerank_topk(
            df, probes, k_nn=5, shortlist=15, **kw
        ).collect()
    }
    assert (ivfpq & exact) <= (rer & exact)


def test_recall_report_covers_all_six_tiers_rerank_dominates(spark):
    # the catalog entry emits one row per tier, anchors at 1.0, and the
    # rerank tier's measured recall is >= the plain IVF-PQ tier's
    from fdp_dynamically_controlled_streams_spark.queries import spark_queries

    rows = {
        r.method: r
        for r in spark_queries()["ann_recall_report"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {
        "brute_force", "sign_lsh", "ivf", "pq_adc", "ivf_pq", "ivf_pq_rerank",
    }
    assert rows["brute_force"].recall_at_k == 1.0
    assert rows["ivf_pq_rerank"].recall_at_k >= rows["ivf_pq"].recall_at_k


def test_shared_codebook_param_matches_internal_training(spark):
    # passing a pre-trained cbs (the recall report's shared-training path)
    # must be indistinguishable from per-call training
    df = _emb(spark, _blobs(48, 16), 16)
    cbs = pq_train(df, m=4, k=8)
    a = sorted(
        map(tuple, pq_adc_topk(df, [0, 1], k_nn=4, m=4, k_codes=8).collect())
    )
    b = sorted(
        map(
            tuple,
            pq_adc_topk(df, [0, 1], k_nn=4, m=4, k_codes=8, cbs=cbs).collect(),
        )
    )
    assert a == b


def test_rerank_scores_exact_and_monotone(spark):
    df = _emb(spark, _blobs(48, 16), 16)
    out = ivf_pq_rerank_topk(
        df, [0], k_nn=6, shortlist=12, n_cells=4, n_probe=2, m=4, k_codes=8
    ).collect()
    by_rank = sorted(out, key=lambda r: r.rank)
    scores = [r.score for r in by_rank]
    assert scores == sorted(scores, reverse=True)
    assert [r.rank for r in by_rank] == list(range(1, len(out) + 1))


def test_ivf_pq_index_from_index_parity_and_pruning(spark, tmp_path):
    """The persisted IVF-PQ index (ivf_pq_index_write: cell-partitioned
    codes) must (1) answer value-identically to the inline encode for
    the ADC, IVF-PQ and rerank tiers, (2) physically list only the
    probed cell= directories, and (3) carry a PartitionFilters entry on
    cell — the similarity.ivf_index_write discipline applied to the PQ
    composition."""
    from fdp_dynamically_controlled_streams_spark.operators.pq import (
        ivf_pq_index_write,
        ivf_pq_rerank_topk,
        ivf_pq_topk,
        ivf_pq_topk_from_index,
    )
    from fdp_dynamically_controlled_streams_spark.operators.similarity import (
        ivf_partition,
    )
    from fdp_dynamically_controlled_streams_spark.plans.audit import (
        explain_str,
    )

    df = _emb(spark, _blobs(96, 16), 16)
    probes = [0, 1, 2, 3]
    path = str(tmp_path / "ivfpq")
    cbs = pq_train(df, m=4, k=8)
    ivf_pq_index_write(df, path, n_cells=4, m=4, k_codes=8, cbs=cbs)

    got = ivf_pq_topk_from_index(
        spark, path, df, probes, k_nn=5, n_cells=4, n_probe=2, m=4,
        k_codes=8, cbs=cbs,
    )
    want = ivf_pq_topk(
        df, probes, k_nn=5, n_cells=4, n_probe=2, m=4, k_codes=8, cbs=cbs
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # persisted codes equal the inline encode for the plain ADC tier too
    codes = spark.read.parquet(f"{path}/codes").select("cand_id", "codes")
    adc_a = pq_adc_topk(df, probes, k_nn=5, m=4, k_codes=8, cbs=cbs)
    adc_b = pq_adc_topk(
        df, probes, k_nn=5, m=4, k_codes=8, cbs=cbs, codes=codes
    )
    assert sorted(map(tuple, adc_a.collect())) == sorted(
        map(tuple, adc_b.collect())
    )

    # rerank via the persisted shortlist
    rr_a = ivf_pq_rerank_topk(
        df, probes, k_nn=3, shortlist=10, n_cells=4, n_probe=2, m=4,
        k_codes=8, cbs=cbs,
    )
    rr_b = ivf_pq_rerank_topk(
        df, probes, k_nn=3, shortlist=10, n_cells=4, n_probe=2, m=4,
        k_codes=8, cbs=cbs, spark=spark, index_path=path,
    )
    assert sorted(map(tuple, rr_a.collect())) == sorted(
        map(tuple, rr_b.collect())
    )

    # scan bounded by the probed cell union; static partition filter
    _, pc = ivf_partition(df, probes, 4, 2, probe_only=True)
    probed = {int(r.cell) for r in pc.select("cell").distinct().collect()}
    touched = {
        int(f.split("cell=")[1].split("/")[0]) for f in got.inputFiles()
    }
    assert touched and touched <= probed, (touched, probed)
    plan = explain_str(got, "formatted")
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:300]

"""IVF ANN tier: cell partition laws + recall against the exact baseline."""

from __future__ import annotations

from fdp_dynamically_controlled_streams_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from fdp_dynamically_controlled_streams_spark.schemas import load_table

SF_DIR = "/root/testdata/sf0.001"
PROBES = [0, 1, 2, 3, 4, 5, 6, 7]


def test_ivf_shape_and_partial_recall(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    exact = brute_force_topk(e, PROBES, k=5)
    approx = ivf_topk(e, PROBES, k=5, n_cells=8, n_probe=2)
    ex = {(r.probe_id, r.cand_id) for r in exact.collect()}
    ap = {(r.probe_id, r.cand_id) for r in approx.collect()}
    # every probe answered, k results each (cells are non-empty by construction)
    assert len({p for p, _ in ap}) == len(PROBES)
    # recall over 2/8 cells on random vectors is partial by design, but the
    # probe's own cell always contributes: require non-trivial overlap
    recall = len(ex & ap) / len(ex)
    assert recall > 0.2, recall
    # approx scores are true cosines: every returned pair's score matches the
    # exact computation for that pair (IVF prunes candidates, never rescores)
    exact_scores = {
        (r.probe_id, r.cand_id): r.score for r in exact.collect()
    }
    for r in approx.collect():
        if (r.probe_id, r.cand_id) in exact_scores:
            assert abs(r.score - exact_scores[(r.probe_id, r.cand_id)]) < 1e-9


def test_ivf_full_probe_equals_exact(spark):
    # probing ALL cells makes IVF exhaustive: must equal brute force exactly
    e = load_table(spark, SF_DIR, "embeddings")
    exact = sorted(
        (r.probe_id, r.cand_id, r.rank) for r in brute_force_topk(e, PROBES, k=3).collect()
    )
    full = sorted(
        (r.probe_id, r.cand_id, r.rank)
        for r in ivf_topk(e, PROBES, k=3, n_cells=8, n_probe=8).collect()
    )
    assert full == exact


def test_recall_report_anchor_and_bounds(spark):
    """The brute-force row is the 1.0 anchor; every tier's recall is a valid
    proportion of the exact pair count."""
    from fdp_dynamically_controlled_streams_spark.operators.similarity import (
        recall_report,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    rows = {r.method: r for r in recall_report(e, list(range(8)), k=5).collect()}
    assert set(rows) == {"brute_force", "sign_lsh", "ivf"}
    assert rows["brute_force"].recall_at_k == 1.0
    for r in rows.values():
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.hits <= r.n_exact


def test_ranking_metrics_laws(spark):
    """MRR/NDCG bounds and a constructed exact-match tier: metrics of a
    tier that returns the exact top-k must be 1.0; all metrics in [0,1]."""
    from fdp_dynamically_controlled_streams_spark.operators.similarity import (
        ranking_metrics,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = {r.method: r for r in ranking_metrics(
        emb, list(range(4)), k=3, bits=2, n_cells=4, n_probe=4
    ).collect()}
    assert set(out) == {"sign_lsh", "ivf"}
    for r in out.values():
        assert 0.0 <= r.mrr <= 1.0 and 0.0 <= r.ndcg_at_k <= 1.0
    # n_probe == n_cells means IVF searches EVERY cell -> exact top-k
    assert out["ivf"].mrr == 1.0 and out["ivf"].ndcg_at_k == 1.0


def test_ivf_index_partitioned_by_cell_prunes_scan(spark, tmp_path):
    """r13 verdict task 5: the persisted IVF assignment is written
    PARTITIONED BY cell and the query phase pushes a STATIC partition
    filter on the probes' n_probe cell union — the scan must (1) carry
    a PartitionFilters entry on cell, (2) physically list only the
    probed cell= directories, and (3) answer value-identically to the
    inline ivf_topk."""
    from fdp_dynamically_controlled_streams_spark.operators.similarity import (
        ivf_index_write,
        ivf_partition,
        ivf_topk_from_index,
    )
    from fdp_dynamically_controlled_streams_spark.plans.audit import (
        explain_str,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_index_write(e, path, n_cells=8)

    got = ivf_topk_from_index(
        spark, path, e, PROBES, k=5, n_cells=8, n_probe=2
    )
    want = sorted(map(tuple, ivf_topk(e, PROBES, k=5, n_cells=8, n_probe=2).collect()))
    assert sorted(map(tuple, got.collect())) == want

    # the probed cell union (recomputed here the same way the operator
    # derives it) bounds the directories the scan may touch
    _, pc = ivf_partition(e, PROBES, 8, 2, probe_only=True)
    probed = {int(r.cell) for r in pc.select("cell").distinct().collect()}
    touched = {
        int(f.split("cell=")[1].split("/")[0]) for f in got.inputFiles()
    }
    assert touched and touched <= probed, (touched, probed)

    plan = explain_str(got, "formatted")
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:300]
    assert "cell" in seg, seg

"""sf0.1 correctness tier for the priciest catalog entries (r3 verdict task
8): the driver proves correctness at sf0.01 while the bench runs sf0.1
unverified — this closes that gap by oracle-checking the 10 most expensive
entries (by BENCH_r03 wall time) at the bench SF.

Slow by construction (~1 min of Spark + DuckDB at sf0.1), so it is gated:
run with  SPARK_GRAFT_SF01_CHECK=1 python -m pytest tests/test_sf01_selfcheck.py
(the repo's checked-in CORRECTNESS_SELF artifacts are produced by
tests/oracle_harness.py --json at both SFs).
"""

from __future__ import annotations

import os

import pytest

from tests.oracle_harness import compare, duck_con

SF01 = "/root/testdata/sf0.1"

#: The most expensive entries by BENCH_r04 measured wall time, plus every
#: round-4 addition heavy enough to matter at the bench SF.
PRICIEST = [
    "stream_cusum_replay",
    "stream_interval_left_join_replay",
    "stream_interval_full_join_replay",
    "stream_interval_join_replay",
    "dedup_clusters",
    "ann_recall_report",
    "controller_streaming_replay",
    "stream_session_window_replay",
    "dedup_minhash_lsh",
    "stream_sliding_agg_replay",
    "join_min_cost_supplier",
    "stream_tumbling_agg_replay",
    "contamination_ngram_overlap",
    "text_local_min_fingerprints",
    "curation_pipeline_end_to_end",
    "streaming_dedup_replay",
    "ann_ivf_topk",
    # round-7 additions heavy enough to matter at the bench SF
    "dedup_ngram_span_removal",
    "retrieval_bm25_topk",
    "graph_triangles_cosupplier",
    "stream_ewma_replay",
    "stream_windowed_topk_replay",
    "ts_ewma_user_value",
    "quality_mad_outliers_value",
    # session-2 additions heavy enough to matter at the bench SF
    "stream_ohlc_replay",
    "dedup_incremental_batch",
    "dedup_semantic_clusters",
    "ann_ivf_pq_rerank_topk",
    "graph_bfs_supplier_reach",
    "text_feature_hashing",
    # session-3 additions heavy enough to matter at the bench SF
    "mining_frequent_part_pairs",
    "cdc_point_in_time_snapshots",
    "stream_mv_agg_replay",
    "mining_association_rules",
    "er_golden_part_records",
    "join_orders_scd2_state",
    # round-8: the new heavyweights (iterative graph + double-ranker fusion)
    "graph_ppr_purchase_seeds",
    "retrieval_rrf_fusion",
    "stream_hdr_quantiles_replay",
    # round-9 (r8 verdict task 6): sf0.1 ⊇ sf1's PROBE_ENTRIES so every
    # scale-probed entry has hash checks at BOTH tier points and probe
    # factors stay interpretable (enforced by
    # tests/test_docs.py::test_sf01_tier_superset_of_sf1_probe)
    "ann_ivf_pq_topk",
    "ann_pq_adc_topk",
    "ann_ranking_metrics",
    "cdc_snapshot_diff",
    "graph_pagerank_suppliers",
    "stream_cms_counters_replay",
    "ts_ols_trend_user_value",
    # round-9 additions
    "graph_sssp_supply_costs",
    "sql_lateral_topk_per_group",
    "graph_kcore_cosupplier",
    "stream_interval_semi_join_replay",
]

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SF01_CHECK"),
    reason="sf0.1 tier is slow; set SPARK_GRAFT_SF01_CHECK=1 to run",
)


@pytest.fixture(scope="module")
def duck():
    return duck_con(SF01)


@pytest.mark.parametrize("name", PRICIEST)
def test_sf01_oracle_parity(spark, duck, name):
    from fdp_dynamically_controlled_streams_spark.queries import catalog

    entry = catalog()[name]
    sdf = entry.fn(spark, SF01).toPandas()
    odf = duck.execute(entry.oracle).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"

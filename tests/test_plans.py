"""Plan-quality audits: assert key catalog queries compile to the physical
plan the 100 TB design calls for (SURVEY §4.2) — not merely one that returns
correct rows locally.

Each assertion encodes a scale invariant:
  * dimension joins broadcast (no sort-merge shuffle of the fact table against
    region/nation/customer-sized sides at test SF);
  * filters reach the parquet scan (PushedFilters non-empty);
  * scans are column-pruned (no unused wide columns in ReadSchema);
  * hot relational paths stay JVM-side (zero Python eval nodes);
  * operators don't exchange more than the operator fundamentally needs.
"""

from __future__ import annotations

import pytest

from fdp_dynamically_controlled_streams_spark.plans.audit import (
    assert_pruned,
    assert_pushed,
    audit_plan,
)
from fdp_dynamically_controlled_streams_spark.queries import spark_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def audits(spark):
    qs = spark_queries()

    def run(name, execute=False):
        return audit_plan(qs[name](spark, SF_DIR), execute=execute)

    return run


def test_pricing_summary_scan_shape(audits):
    a = audits("agg_pricing_summary", execute=True)
    # Two exchanges, both fundamental: the group-by hash exchange (partial agg
    # runs map-side before it) and the final ORDER BY range exchange.
    assert a.n_exchanges == 2
    assert_pushed(a, "l_shipdate")
    # The 16-column lineitem scan must be pruned to the 7 used columns.
    assert_pruned(a, ["l_orderkey", "l_partkey", "l_comment", "l_shipmode"])
    assert a.n_python_evals == 0
    assert a.n_codegen_spans >= 1


def test_shipping_priority_broadcasts_dims(audits):
    a = audits("join_shipping_priority")
    # customer + orders sides broadcast at this SF; no sort-merge join.
    assert a.n_broadcast_joins == 2
    assert a.n_sortmerge_joins == 0
    assert_pushed(a, "o_orderkey")
    assert a.n_python_evals == 0


def test_local_supplier_volume_all_dims_broadcast(audits):
    a = audits("join_local_supplier_volume")
    # 5-way star join: every dimension side broadcasts against lineitem.
    assert a.n_broadcast_joins == 5
    assert a.n_sortmerge_joins == 0
    assert a.n_nestedloop_joins == 0
    # region scan pruned to the join key (+ filter column).
    assert any("r_regionkey" in s for s in a.read_schemas)
    assert_pruned(a, ["r_comment", "n_comment", "s_address", "c_address"])


def test_minhash_lsh_no_recompute(audits):
    a = audits("dedup_minhash_lsh")
    # Signature pass (1 groupBy exchange) + pair join; the self-join reads the
    # same signature subplan on both sides — Catalyst must not plan a python
    # eval or a cartesian product anywhere.
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_window_topk_single_exchange(audits):
    a = audits("window_topk_orders_per_customer")
    # rank-filter top-k: exactly one hash-partition exchange on the window key.
    assert a.n_exchanges == 1
    assert a.n_python_evals == 0


def test_asof_join_is_union_window_not_nested_loop(audits):
    a = audits("asof_latest_order_before_event")
    # The as-of join compiles to union + window (last ignorenulls), never a
    # per-row nested-loop/cartesian time probe.
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_scalar_surface_is_pure_codegen(audits):
    a = audits("scalar_function_surface", execute=True)
    assert a.n_python_evals == 0
    assert a.n_exchanges == 0  # pure projection: no shuffle at all
    assert a.n_codegen_spans >= 1


def test_text_ops_are_jvm_side(audits):
    for name in ("text_token_stats", "text_quality_score", "text_lang_id",
                 "text_fingerprint"):
        a = audits(name)
        assert a.n_python_evals == 0, name
        assert a.n_exchanges == 0, name  # per-row exprs: no shuffle


def test_embedding_brute_force_broadcasts_query_side(audits):
    a = audits("ann_brute_force_topk")
    # Non-equi probe×corpus condition ⇒ the right plan is a broadcast
    # NESTED-loop with the tiny probe side broadcast (corpus never shuffles);
    # what must NOT appear is a corpus-shuffling sort-merge join.
    assert a.n_nestedloop_joins == 1
    assert a.n_sortmerge_joins == 0
    assert a.n_exchanges <= 1  # only the per-probe top-k window exchange


def test_lsh_bucketed_topk_is_equi_join(audits):
    a = audits("ann_lsh_bucketed_topk")
    # The scale path: bucket equi-join, probes broadcast — no nested loop.
    assert a.n_nestedloop_joins == 0
    assert a.n_broadcast_joins >= 1


def test_sampling_is_map_side_predicate(audits):
    # the hash gate is a plain scan predicate: zero shuffles, no Python
    a = audits("sample_bernoulli_orders")
    assert a.n_exchanges == 0
    assert a.n_python_evals == 0
    for name in ("sample_stratified_documents", "split_train_valid_test"):
        b = audits(name)
        assert b.n_exchanges == 1, name  # only the final count-by-group
        assert b.n_python_evals == 0, name


def test_kmv_sketch_two_fundamental_exchanges(audits):
    # distinct (group,hash) + per-group window; the closing groupBy reuses
    # the window's hash partitioning — no third exchange
    a = audits("sketch_kmv_distinct_customers")
    assert a.n_exchanges == 2
    assert a.n_python_evals == 0


def test_ivf_assignment_is_shuffle_free(audits):
    # centroids inlined as literals: cell assignment adds NO exchange; the
    # two exchanges are the probe-cell and final top-k windows, the cell
    # join broadcasts the probe side, and nothing nested-loops
    a = audits("ann_ivf_topk")
    assert a.n_exchanges == 2
    assert a.n_broadcast_joins == 1
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_scrub_and_zorder_are_pure_projection(audits):
    for name in ("text_scrub_normalize", "layout_zorder_events"):
        a = audits(name)
        assert a.n_exchanges == 0, name
        assert a.n_python_evals == 0, name


def test_cdc_latest_single_exchange_partial_agg(audits):
    # latest_by_key: ONE exchange on the merge key, with a map-side
    # partial_max_by BEFORE it (the shuffle carries <=1 row/key/partition —
    # the property that makes log compaction viable when the log is 1000x
    # the key space). No window sort of the full input, no Python.
    a = audits("cdc_latest_event_per_user")
    assert a.n_exchanges == 1
    assert "partial_max_by" in a.raw
    assert a.n_python_evals == 0


def test_rollup_hierarchy_one_expand_one_shuffle(audits):
    # all three granularities from one scan: a single Expand (3x fan-out),
    # partial agg map-side, one hash exchange sized by output buckets.
    a = audits("rollup_time_hierarchy_events")
    assert a.raw.count("Expand") >= 1
    assert a.n_exchanges == 1
    assert a.n_python_evals == 0


def test_unpivot_is_map_only(audits):
    # built-in unpivot = Expand over one pruned scan: ZERO exchanges, filter
    # pushed to parquet, untouched measure columns pruned away.
    a = audits("reshape_unpivot_lineitem")
    assert a.n_exchanges == 0
    assert_pushed(a, "l_shipdate")
    assert_pruned(a, ["l_returnflag", "l_partkey", "l_suppkey"])
    assert a.n_python_evals == 0


def test_min_cost_supplier_broadcasts_all_dims(audits):
    # TPC-H Q2 shape: part/supplier/nation broadcast; the only exchanges are
    # the two lineitem aggregations (costs, best) + their join alignment —
    # the fact table never shuffles for a dimension.
    # (At smoke SF the costs-best self-join broadcasts too — 4 total; at
    # scale that join degrades gracefully to shuffle while the three
    # dimension joins stay broadcast.)
    a = audits("join_min_cost_supplier")
    assert a.n_broadcast_joins >= 3
    assert a.n_sortmerge_joins + a.n_nestedloop_joins == 0


def test_salted_join_small_side_broadcasts(audits):
    # Salting must not demote the join: the exploded small side still
    # broadcasts (the salt rides the broadcast for free) and no sort-merge
    # appears; one exchange for the final aggregation.
    a = audits("skewjoin_salted_events_nation")
    assert a.n_broadcast_joins >= 2
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_variant_path_stays_jvm_side(audits):
    a = audits("semistructured_variant_props")
    assert a.n_python_evals == 0
    assert a.n_exchanges <= 2  # partial+final agg exchange only (AQE may split)


def test_large_volume_customers_single_lineitem_exchange(audits):
    # The HAVING aggregate and the orders join reuse the l_orderkey key;
    # no nested-loop, no Python, and the plan stays within the agg + two
    # join exchanges.
    a = audits("join_large_volume_customers")
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_hotkey_salted_agg_two_phase(audits):
    # The salted rewrite must stay two hash-agg phases (keys+salt, then keys)
    # with zero Python and no joins at all.
    a = audits("skewagg_hotkey_stress")
    assert a.n_python_evals == 0
    assert a.joins == 0
    assert a.n_exchanges >= 2  # (key,salt) exchange + final key exchange


def test_bigram_lm_plan_jvm_side(audits):
    # Explode + window + two count joins + scalar broadcast: everything
    # codegen'd, the vocabulary scalar must not trigger a sort-merge join.
    a = audits("text_bigram_lm_score")
    assert a.n_python_evals == 0
    assert a.n_nestedloop_joins <= 1  # the 1-row vocab cross join only


def test_hll_sketch_plan_shape(audits):
    # Register build = one (group,bucket) agg; estimate = one group agg;
    # exact side joins on the tiny group key. No Python anywhere.
    a = audits("sketch_hll_distinct_customers")
    assert a.n_python_evals == 0
    assert a.n_sortmerge_joins + a.n_nestedloop_joins == 0


def test_recall_report_semi_joins_broadcast(audits):
    # Each tier's pair set semi-joins the checkpointed exact pairs; all
    # joins stay broadcast/hash at probe-set size, no Python in any tier.
    a = audits("ann_recall_report")
    assert a.n_python_evals == 0
    assert a.n_sortmerge_joins == 0


def test_repetition_stats_two_local_shuffles_jvm_side(audits):
    # Bigram rows -> (doc,bigram) count -> per-doc agg: exactly the two
    # fundamental key exchanges (both with map-side partial agg), no joins,
    # no Python.
    a = audits("text_repetition_stats")
    assert a.n_python_evals == 0
    assert a.n_broadcast_joins + a.n_sortmerge_joins + a.n_nestedloop_joins == 0
    assert a.n_exchanges == 2


def test_contamination_eval_side_broadcasts(audits):
    # The eval shingle set and eval-id filters ride broadcasts; the corpus
    # side never sort-merges, and the only non-broadcast exchange is the
    # per-doc aggregation. Everything JVM-side.
    a = audits("contamination_ngram_overlap")
    assert a.n_python_evals == 0
    assert a.n_sortmerge_joins == 0
    assert a.n_broadcast_joins >= 3  # semi (eval), anti (train), hit probe


def test_quantize_report_is_map_only(audits):
    # Per-vector quantization is a pure projection of the corpus scan:
    # zero exchanges, zero joins, zero Python.
    a = audits("embedding_quantize_int8")
    assert a.n_exchanges == 0
    assert a.n_python_evals == 0
    assert a.n_broadcast_joins + a.n_sortmerge_joins + a.n_nestedloop_joins == 0


def test_shard_assignment_single_output_exchange(audits):
    # One exchange on `shard` (the output layout's own partitioning for the
    # rank window), nothing else; hash + mod are map-side.
    a = audits("shard_assignment_documents")
    assert a.n_exchanges == 1
    assert a.n_python_evals == 0


def test_hotkey_salted_join_broadcasts_exploded_dim(audits):
    # The hot-key probe side salts 16 ways; the exploded nation dim must
    # still broadcast (salt rides the broadcast), no sort-merge, no Python.
    a = audits("skewjoin_hotkey_stress")
    assert a.n_broadcast_joins >= 1
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_cusum_single_exchange_no_python(audits):
    # Both window frames share the (user_id, ts ordering) spec: exactly one
    # key exchange, recurrence fully JVM-side.
    a = audits("cusum_changepoints_user_value")
    assert a.n_exchanges == 1
    assert a.n_python_evals == 0
    assert a.joins == 0


def test_label_centroids_one_agg_exchange(audits):
    # One groupBy(label) exchange with map-side partial agg; the explode to
    # long form happens on the label-count-sized aggregate, not the corpus.
    a = audits("embedding_label_centroids")
    assert a.n_exchanges == 1
    assert a.n_python_evals == 0
    assert a.joins == 0


def test_psi_drift_buckets_broadcast(audits):
    # Two map-side bucketing aggs (one exchange each) joined onto the tiny
    # bucket spine: every join broadcast, window over n_buckets rows only.
    a = audits("quality_psi_drift_nchars")
    assert a.n_python_evals == 0
    assert a.n_sortmerge_joins == 0
    assert a.n_broadcast_joins >= 2


def test_kmeans_assignment_map_side(audits):
    # Final assignment is a projection over the corpus scan: the centroid
    # matrix rides as ONE literal, no join, no exchange, no Python.
    a = audits("kmeans_document_clusters")
    assert a.n_exchanges == 0
    assert a.n_python_evals == 0
    assert a.joins == 0


def test_weighted_bottomk_take_ordered(audits):
    # TakeOrderedAndProject pattern: per-partition top-k then k-row merge —
    # no global sort exchange, no Python.
    a = audits("sample_weighted_bottomk_documents")
    assert a.n_python_evals == 0
    assert "TakeOrderedAndProject" in a.raw


def test_fuzzy_pairs_blocked_equi_join(audits):
    # blocking must make this an EQUI join (broadcast at this SF, shuffle
    # hash/sort-merge at scale) with the edit distance as a post-join
    # filter — never a nested-loop over all pairs; JVM-side throughout
    a = audits("fuzzy_part_name_pairs")
    assert a.n_nestedloop_joins == 0
    assert a.joins == 1
    assert a.n_python_evals == 0


def test_bm25_one_broadcast_scalar_no_python(audits):
    a = audits("retrieval_bm25_topk", execute=True)
    # postings/query-terms/df joins are equi-joins; the only nested-loop
    # joins are the SINGLE-ROW scalar attaches (sum(dl) x count(n) and
    # the avgdl broadcast onto the scored join) — constant-size build
    # sides, not data-sized; the whole pipeline is JVM-side.
    assert a.n_python_evals == 0
    assert a.n_nestedloop_joins <= 4
    assert a.n_sortmerge_joins == 0
    assert a.n_codegen_spans >= 1


def test_triangles_equi_joins_only(audits):
    a = audits("graph_triangles_cosupplier", execute=True)
    # degree orientation keeps every DATA join an equi-join: no cartesian /
    # nested-loop in wedge generation or the closure check. The one
    # tolerated nested-loop is the SINGLE-ROW avg-threshold scalar attach.
    assert a.n_nestedloop_joins <= 1
    assert a.n_python_evals == 0


def test_span_dedup_jvm_side_single_ngram_agg(audits):
    a = audits("dedup_ngram_span_removal", execute=True)
    # tokenize+slide is codegen HOFs (no Python), dup-set is one
    # groupBy(ngram) agg, islands one window — all JVM-side.
    assert a.n_python_evals == 0
    assert a.n_nestedloop_joins == 0
    assert a.n_codegen_spans >= 1


def test_audio_frames_map_only_no_exchange(audits):
    a = audits("multimodal_audio_frame_features", execute=True)
    # two mapInPandas stages (attach + features), zero shuffles: features
    # are computed where the bytes live.
    assert a.n_exchanges == 0
    assert a.joins == 0


def test_pq_adc_probe_side_broadcasts(audits):
    a = audits("ann_pq_adc_topk", execute=True)
    # corpus side never shuffles for the pair join: probes broadcast
    # (theta join probe_id != cand_id -> BroadcastNestedLoopJoin over the
    # 8-row probe side is the intended shape); encoding is map-side.
    assert a.n_python_evals == 0
    assert a.n_sortmerge_joins == 0


def test_ivf_pq_prunes_and_broadcasts(audits):
    a = audits("ann_ivf_pq_topk", execute=True)
    # coarse stage + probe-cell candidate join broadcast the probe side;
    # encoding/assignment are map-side; no sort-merge shuffle of the
    # corpus anywhere.
    assert a.n_python_evals == 0
    assert a.n_sortmerge_joins == 0


def test_q7_volume_shipping_all_dims_broadcast(audits):
    a = audits("join_volume_shipping_q7", execute=True)
    # customer/supplier/nation×2 dims broadcast; the only shuffle pair is
    # the lineitem⋈orders orderkey join + the final group-by.
    assert a.n_sortmerge_joins == 0
    assert a.n_nestedloop_joins == 0
    assert a.n_broadcast_joins >= 5
    assert a.n_python_evals == 0
    assert_pushed(a, "o_orderkey")


def test_q9_product_profit_part_filter_broadcasts(audits):
    a = audits("join_product_profit_q9", execute=True)
    # the LIKE-filtered part dim broadcasts and prunes lineitem before the
    # orders join; no sort-merge of a dim side.
    assert a.n_sortmerge_joins == 0
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_q14_promo_revenue_date_pushdown(audits):
    a = audits("agg_promo_revenue_q14", execute=True)
    # the ship-month range reaches the parquet scan (row-group pruning at
    # scale) and part broadcasts.
    assert_pushed(a, "l_shipdate")
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_q17_per_part_agg_joined_back_once(audits):
    a = audits("subquery_small_qty_revenue_q17", execute=True)
    # the correlated-avg reformulation: ONE per-part aggregation exchange
    # joined back; no nested-loop rescan of lineitem per row.
    assert a.n_nestedloop_joins == 0
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_q19_disjunction_keeps_equi_join(audits):
    a = audits("join_disjunctive_quantity_q19", execute=True)
    # the three-arm OR mixing both sides must NOT force a nested-loop
    # join: Catalyst keeps the p_partkey equi-join with residual filters.
    assert a.n_nestedloop_joins == 0
    assert a.n_sortmerge_joins == 0
    assert a.n_broadcast_joins >= 1
    assert a.n_python_evals == 0


def test_q20_nested_agg_semi_reuses_slice(audits):
    a = audits("join_excess_inventory_q20", execute=True)
    # the per-(part,supp) and per-part aggs come from one lineitem⋈part
    # slice — the second consumer must ride a ReusedExchange, not rescan.
    assert a.reused_exchanges >= 1
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_spearman_two_fundamental_exchanges(audits):
    a = audits("agg_spearman_spend_orders", execute=True)
    # per-customer agg exchange + ONE nation exchange shared by both rank
    # windows and the final group-by (windows re-sort in place; the final
    # agg reuses the nation partitioning) — 2 actual exchanges total.
    assert a.n_exchanges <= 4
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_ohlc_single_agg_pass_no_window(audits):
    a = audits("ts_ohlc_bars_event_type", execute=True)
    # min_by/max_by make open/close ONE hash-agg pass: no per-row rank
    # window, no sort, one group-by exchange.
    assert "Window" not in a.raw
    assert a.n_exchanges <= 2
    assert a.joins == 0
    assert a.n_python_evals == 0


def test_rerank_no_corpus_sortmerge(audits):
    a = audits("ann_ivf_pq_rerank_topk", execute=True)
    # shortlist + rescore: probes broadcast everywhere; the corpus is
    # never sort-merge-shuffled against itself.
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_semantic_dedup_equi_blocked_pairs(audits):
    a = audits("dedup_semantic_clusters", execute=True)
    # cluster-blocked pair join is an EQUI join on cell (never cartesian).
    # The corpus-scaled-k assignment runs as ONE declared Arrow boundary
    # upstream of the localCheckpoint (bit-parity law-tested in
    # tests/test_clustering.py); the audited pair-join plan itself reads
    # the checkpointed blocks, so it stays Python-free.
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_arrow_stats_single_declared_python_boundary(audits):
    a = audits("udx_arrow_doc_stats", execute=True)
    # exactly one MapInArrow stage (the declared kernel); aggregation is
    # JVM-side after it, one group-by exchange.
    assert a.n_python_evals >= 1
    assert a.joins == 0
    assert a.n_exchanges <= 2


def test_frequent_pairs_broadcast_prune_no_selfjoin(audits):
    a = audits("mining_frequent_part_pairs", execute=True)
    # a-priori item prune is a broadcast semi join; pair generation is a
    # per-basket HOF over ONE collected array — never a sort-merge
    # self-join of the item table, never a nested loop.
    assert a.n_broadcast_joins >= 1
    assert a.n_sortmerge_joins == 0
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_mv_merge_pushdown_jvm_only(audits):
    a = audits("mv_incremental_agg_merge", execute=True)
    # base/delta segments are scan-level date filters; partial aggs merge
    # via re-aggregation — no join anywhere, all JVM.
    assert a.joins == 0
    assert a.n_python_evals == 0
    assert_pushed(a, "o_orderdate")


def test_snapshot_diff_single_key_join(audits):
    # static plan: the executed AQE text repeats Initial+Final subtrees,
    # which would double-count the single join.
    a = audits("cdc_snapshot_diff")
    # one full-outer join on the key is the whole operator: change
    # classification runs inside it, so exactly one join, no python.
    assert a.joins == 1
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_point_in_time_snapshots_one_union_window(audits):
    a = audits("cdc_point_in_time_snapshots", execute=True)
    # PIT = change-log union probe-grid + last ignorenulls window: the
    # as-of lookup costs window sorts on the entity key, never a range
    # join per probe and never a python boundary.
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_seasonal_naive_broadcast_only_joins(audits):
    # static plan (the executed AQE text repeats Initial+Final subtrees)
    a = audits("ts_seasonal_naive_anomaly")
    # hourly rollup output is ~timespan x types: the seasonal self-join
    # and the threshold join must both broadcast — the raw events table
    # is scanned once (checkpoint barrier) and shuffled once (the count
    # groupBy); downstream branches read the materialized rollup, so no
    # parquet scan appears in this plan at all.
    assert a.n_broadcast_joins == 3
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0
    assert "Scan parquet" not in a.raw


def test_hll_rollup_single_raw_scan_no_python(audits):
    a = audits("sketch_hll_daily_rollup_users")
    # registers + exact counts + merge level: everything is hash aggs and
    # one small join; no python eval, no nested loop anywhere.
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_association_rules_single_scalar_nlj(audits):
    a = audits("mining_association_rules")
    # the only nested loop is the 1-row basket-total scalar cross join
    # (the established scalar idiom); support joins are key joins.
    assert a.n_nestedloop_joins == 1
    assert a.n_python_evals == 0


def test_golden_records_no_python_no_cartesian(audits):
    a = audits("er_golden_part_records")
    # blocked pair join + component labels + one survivorship groupBy:
    # everything JVM-side, no cartesian anywhere.
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_target_encoding_broadcast_not_window(audits):
    a = audits("feature_target_encoding_loo", execute=True)
    # LOO = one group agg broadcast back; a per-row window over the
    # category (full fact sort) must NOT appear.
    assert "Window" not in a.raw
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_ols_trend_single_key_shuffle(audits):
    # static plan (executed AQE text repeats Initial+Final subtrees)
    a = audits("ts_ols_trend_user_value")
    # window min + five-sum groupBy share the user_id partitioning:
    # exactly one exchange, no joins, all JVM.
    assert a.n_exchanges == 1
    assert a.joins == 0
    assert a.n_python_evals == 0


def test_negative_sampling_no_corpus_shuffle_rescan(audits):
    a = audits("retrieval_negative_sampling")
    # probes broadcast against the corpus on both branches; positives are
    # a 40-row checkpoint, so the scoring subplan appears nowhere twice
    # and the corpus never sort-merges.
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_time_to_convert_single_shuffle(audits):
    a = audits("funnel_time_to_convert")
    # latency = projection over the funnel windows: one events shuffle,
    # no join pass, all JVM.
    assert a.n_exchanges == 1
    assert a.joins == 0
    assert a.n_python_evals == 0


def test_benford_single_count_shuffle(audits):
    a = audits("quality_benford_first_digit")
    # digit histogram: one groupBy exchange over a 9-value key; the total
    # is the 1-row scalar nested loop; no python, pushdown on the amount.
    assert a.n_nestedloop_joins == 1
    assert a.n_python_evals == 0
    assert_pushed(a, "o_totalprice")


def test_temporal_dim_join_is_union_window(audits):
    a = audits("join_orders_scd2_state")
    # facts x SCD2 as-of join: union + last-ignorenulls window — never a
    # valid_from/valid_to band join (broadcast nested loop), no python.
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0


def test_theta_overlap_all_scalar_broadcasts(audits):
    a = audits("sketch_theta_overlap_customers")
    # two bottom-k sketch pipelines + five 1-row scalar combines: no
    # sort-merge join of anything, no python; the raw sets never join.
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_sorted_layout_read_pushes_date_window(audits):
    a = audits("layout_sorted_minmax_pruned_read", execute=True)
    # the date window must reach the parquet scan of the sorted layout —
    # with the range-disjoint files (test_layout.py) that predicate is
    # what turns min-max stats into skipped I/O; no joins, no Python.
    assert a.joins == 0
    assert a.n_python_evals == 0
    assert_pushed(a, "l_shipdate")


def test_rrf_fusion_equi_joins_no_python(audits):
    a = audits("retrieval_rrf_fusion")
    # both rankings are postings/query-terms EQUI joins (bounded by
    # shared terms); fusion is a rank-table-sized union+groupBy; the only
    # nested loops are the BM25 1-row scalar attaches.
    assert a.n_python_evals == 0
    assert a.n_sortmerge_joins == 0
    assert a.n_nestedloop_joins <= 4


def test_retrieval_quality_metric_joins_stay_jvm_side(audits):
    a = audits("retrieval_quality_report")
    # three rank tables + rank-table-sized qrels metric joins; the only
    # nested loops are 1-row scalar attaches (avgdl/n + the four metric
    # scalars per ranker); nothing is Python.
    assert a.n_python_evals == 0
    assert a.n_sortmerge_joins == 0


def test_compacted_read_is_one_agg_exchange_no_python(audits):
    a = audits("layout_compacted_read")
    # after compaction the read is a plain scan + map-side partial agg +
    # one hash exchange; no joins, no Python anywhere near it.
    assert a.joins == 0
    assert a.n_python_evals == 0
    assert a.n_exchanges == 1


def test_bpe_apply_folds_on_vocab_side_of_broadcast(audits):
    a = audits("text_bpe_apply_tokens")
    # the merge folds run on the DISTINCT-term (vocabulary) side and the
    # corpus-sized (doc, term, tf) table joins it by term — at test SF the
    # vocab side broadcasts; nothing nested-loops and nothing is Python.
    assert a.n_python_evals == 0
    assert a.n_nestedloop_joins == 0
    assert a.joins == 1


def test_hdr_quantiles_one_scan_no_python(audits):
    a = audits("sketch_hdr_quantiles_extendedprice")
    # integer bucketing is a scan projection; one output-sized groupBy,
    # the bucket-table window + tiny broadcast rank joins; no sort-merge
    # of anything data-sized, no Python, no libm.
    assert a.n_python_evals == 0
    assert a.n_sortmerge_joins == 0


# ------------------------------------------- round-8 TPC-H shape entries


def test_q4_exists_is_one_semi_join(audits):
    a = audits("subquery_late_order_priority_q4")
    # correlated EXISTS = ONE semi join (never inner+distinct); the order
    # date window pushes to the orders scan.
    assert a.joins == 1
    assert "LeftSemi" in a.raw
    assert a.n_python_evals == 0
    assert_pushed(a, "o_orderdate")


def test_q6_single_scan_no_join_pushed_filters(audits):
    a = audits("agg_discount_revenue_q6")
    # the scan-bound floor: zero joins, every predicate pushed, one global
    # agg (partial per partition + single-partition final).
    assert a.joins == 0
    assert a.n_python_evals == 0
    assert_pushed(a, "l_shipdate")
    assert_pushed(a, "l_discount")
    assert_pushed(a, "l_quantity")


def test_q8_all_dims_broadcast_one_fact_shuffle(audits):
    a = audits("join_market_share_q8")
    # 7 of the 8 relations broadcast; lineitem<->orders is the only
    # data-sized join; no sort-merge anywhere.
    assert a.n_broadcast_joins >= 6
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_q10_take_ordered_top20(audits):
    a = audits("join_returned_revenue_q10")
    # global top-20 must plan as per-partition heap + merge, not a global
    # sort exchange; return-flag predicate reaches the lineitem scan.
    assert "TakeOrderedAndProject" in a.raw
    assert a.n_python_evals == 0
    assert_pushed(a, "l_returnflag")


def test_q11_global_total_is_scalar_broadcast(audits):
    a = audits("subquery_important_part_value_q11")
    # per-part agg reused for both sides; the global total attaches as a
    # 1-row broadcast nested loop (constant build side, not data-sized).
    assert a.n_nestedloop_joins == 1
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_q12_one_join_tiny_output_agg(audits):
    a = audits("agg_ship_delay_priority_q12")
    # one fact-fact equi join + a 3-row conditional-count agg; date window
    # pushes to the lineitem scan.
    assert a.joins == 1
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0
    assert_pushed(a, "l_shipdate")


def test_q13_left_join_keeps_predicate_in_join(audits):
    a = audits("join_order_count_distribution_q13")
    # the priority predicate must live in the LEFT join condition (a WHERE
    # would drop zero-order customers): plan shows an outer join and NO
    # pushed filter on o_orderpriority into the orders scan... the
    # predicate CAN push to the preserved-side-independent orders scan
    # safely, so only assert the join stays outer and single.
    assert "LeftOuter" in a.raw
    assert a.joins == 1
    assert a.n_python_evals == 0


def test_q15_argmax_scalar_broadcast_one_shuffle(audits):
    a = audits("subquery_top_supplier_q15")
    # the revenue agg feeds both the argmax scalar (1-row broadcast
    # attach) and the filter; supplier broadcasts; both joins are
    # broadcast-side, never a sort-merge of the aggregated frame.
    assert a.joins == 2
    assert a.n_broadcast_joins == 2
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_q16_not_in_is_broadcast_anti(audits):
    a = audits("join_supplier_part_counts_q16")
    # NOT IN compiles to a broadcast left-anti (non-null key), part
    # predicates prune the broadcast build side, no sort-merge join.
    assert "LeftAnti" in a.raw
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0


def test_lateral_topk_decorrelates_to_window_group_limit(audits):
    a = audits("sql_lateral_topk_per_group")
    # The LATERAL per-row subquery must decorrelate: a WindowGroupLimit
    # (partial top-k before the exchange caps it at k rows/group/mapper)
    # plus one broadcast join — never a nested-loop re-execution per outer
    # row, and never a sort-merge of nation against customer.
    assert "WindowGroupLimit" in a.raw
    assert a.n_nestedloop_joins == 0
    assert a.n_sortmerge_joins == 0
    assert a.n_broadcast_joins == 1
    assert a.n_python_evals == 0


def test_exact_substring_spans_plan_shape(audits, spark):
    # hash64 default (round 11): the rolling-hash kernel is the DECLARED
    # Arrow boundary (MapInPandas appears once per consumer pass of the
    # window-hash table — generation, probe, verify slice), plus the
    # probe join and the literal extend-and-verify join: equi-joins
    # only, never nested-loop, and the documents scan still pruned.
    a = audits("dedup_exact_substring_spans")
    assert a.n_nestedloop_joins == 0
    assert a.joins >= 2  # hash probe + literal verify (+ verify slice)
    assert a.n_python_evals > 0  # the declared rolling-hash kernel
    assert_pruned(a, ["lang", "source", "n_chars"])

    # literal oracle-portability tier keeps the round-10 contract:
    # ONE equi-join on the window key, all codegen HOFs, zero Python.
    from fdp_dynamically_controlled_streams_spark.operators.dedup import (
        exact_substring_spans,
    )
    from fdp_dynamically_controlled_streams_spark.plans.audit import audit_plan
    from fdp_dynamically_controlled_streams_spark.schemas import load_table

    d = load_table(spark, SF_DIR, "documents")
    lit = audit_plan(exact_substring_spans(d, length=24, key="literal"))
    assert lit.joins == 1
    assert lit.n_nestedloop_joins == 0
    assert lit.n_python_evals == 0


def test_index_maintenance_loops_blocked_equi_joins(spark):
    """The three daily-crawl maintenance loops' per-day bodies (r12):
    every decision join is a BLOCKED EQUI-join (band / bucket / hash
    key) — never nested-loop, never all-pairs — and the only Python
    eval anywhere is the ExactSubstr family's declared rolling-hash
    kernel. The upsert side must be one anti-join + union with no
    Python beyond that same kernel."""
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators import (
        dedup as dd,
    )
    from fdp_dynamically_controlled_streams_spark.operators import (
        similarity as sim,
    )
    from fdp_dynamically_controlled_streams_spark.plans.audit import audit_plan
    from fdp_dynamically_controlled_streams_spark.schemas import load_table

    d = load_table(spark, SF_DIR, "documents")
    e = load_table(spark, SF_DIR, "embeddings")
    corpus, batch = d.where(F.col("doc_id") % 5 != 0), d.where(
        F.col("doc_id") % 5 == 0
    )

    # MinHash: decisions + upsert — all-equi, JVM-side
    sig = dd.minhash_index(corpus)
    a = audit_plan(dd.minhash_decisions_against_index(batch, sig))
    assert a.n_nestedloop_joins == 0 and a.n_python_evals == 0
    a = audit_plan(dd.minhash_index_upsert(sig, batch))
    assert a.n_nestedloop_joins == 0 and a.n_python_evals == 0

    # Embedding: bucket-blocked equi join, JVM-side
    ec, eb = e.where(F.col("vec_id") % 5 != 0), e.where(F.col("vec_id") % 5 == 0)
    idx = sim.embedding_index(ec)
    a = audit_plan(sim.embedding_decisions_against_index(eb, idx))
    assert a.n_nestedloop_joins == 0 and a.n_python_evals == 0
    a = audit_plan(sim.embedding_index_upsert(idx, eb))
    assert a.n_nestedloop_joins == 0 and a.n_python_evals == 0

    # BM25 raw-index loop (r12): screen + upsert all-equi, JVM-side; the
    # screen's postings join must build on the PANEL side (a broadcast
    # exists and no sort-merge materializes the corpus as build input)
    from fdp_dynamically_controlled_streams_spark.operators import (
        retrieval as rt,
    )

    tdc_dl, dft, stats = rt.bm25_raw_index(corpus)
    a = audit_plan(rt.bm25_screen_against_raw(batch, tdc_dl, dft, stats, k=10))
    assert a.n_nestedloop_joins <= 1  # the 1-row stats attach only
    assert a.n_python_evals == 0 and a.n_broadcast_joins >= 1
    a = audit_plan(rt.bm25_raw_index_upsert(tdc_dl, dft, stats, batch)[0])
    assert a.n_nestedloop_joins == 0 and a.n_python_evals == 0

    # ExactSubstr: equi-only with the declared Arrow kernel as the single
    # Python boundary class
    cbase, ch = dd.exact_substring_index(corpus, length=24)
    a = audit_plan(
        dd.exact_substring_incremental_against_index(batch, cbase, ch, length=24)
    )
    assert a.n_nestedloop_joins == 0 and a.n_python_evals > 0
    ncb, nch = dd.exact_substring_index_upsert(cbase, ch, batch, length=24)
    a = audit_plan(nch)
    assert a.n_nestedloop_joins == 0


def test_stream_degree_count_batch_shape(spark):
    # The streaming entry's per-batch plan is dropDuplicates state +
    # count agg; audit its BATCH twin (the oracle shape the snapshot must
    # equal): one distinct exchange + one count exchange, no Python.
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.schemas import load_table

    e = load_table(spark, SF_DIR, "events")
    deg = (
        e.select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    a = audit_plan(deg)
    assert a.n_python_evals == 0
    assert a.joins == 0
    assert a.n_exchanges <= 2
    assert_pruned(a, ["props", "value", "ts"])


def test_sssp_round_is_equi_join_plus_partial_agg(spark):
    # The returned label set is localCheckpoint-materialized per round, so
    # the catalog entry's final plan is a bare RDD scan; audit the ROUND
    # instead, on the exact production code path (_sssp_improved/_sssp_merge).
    from fdp_dynamically_controlled_streams_spark.operators.graph import (
        _sssp_improved,
        _sssp_merge,
    )

    sym = spark.createDataFrame(
        [(1, 2, 5), (2, 1, 5)], "src long, dst long, w long"
    )
    dist = spark.createDataFrame([(1, 0)], "node long, dist long")
    improved = _sssp_improved(dist, sym, dist)
    a = audit_plan(_sssp_merge(dist, improved))
    # Bellman-Ford round: relaxation is an equi-join (frontier ⋈ sym on the
    # node key) feeding a partial-agg min — no nested-loop/cartesian
    # anywhere, all label arithmetic JVM-side.
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0
    assert "partial_min" in a.raw


def test_kcore_round_is_semi_joins_plus_partial_count(spark):
    # Same treatment as the SSSP round: the entry's final plan is
    # checkpoint-hidden, so audit one peel on the production code path.
    from fdp_dynamically_controlled_streams_spark.operators.graph import (
        _kcore_peel_round,
    )

    live = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    a = audit_plan(_kcore_peel_round(live, 2))
    assert a.n_nestedloop_joins == 0
    assert a.n_python_evals == 0
    assert "partial_count" in a.raw
    assert "LeftSemi" in a.raw


def test_ranker_agg_and_window_share_one_exchange(audits, spark):
    """r13 verdict task 2: every ranker's score agg and rank window run
    off ONE query_id exchange (REPARTITION_BY_COL) — the plan must not
    contain a (query_id, doc_id) ENSURE_REQUIREMENTS exchange (the old
    two-shuffle shape: agg on the pair key, then re-exchange on
    query_id for the window)."""
    import re

    for name in ("retrieval_bm25_topk", "retrieval_rrf_fusion"):
        a = audits(name)
        raw = a.raw
        pair_ex = re.findall(
            r"Exchange hashpartitioning\(query_id#\d+L?, doc_id", raw
        )
        assert not pair_ex, (name, pair_ex)
        assert "REPARTITION_BY_COL" in raw, name

"""sf1 drift probe (r4 verdict task 6): correctness is proven at
sf0.01/sf0.1; the 100 TB claims otherwise rest on plan audits. This script
turns "would survive 10×" from argument into a measured trend line:

1. Build a 10× replication of sf0.1 (~sf1: 6 M lineitem, 1 M events) under
   ``.sfscale/sf1`` — SHAPE-PRESERVING, so wall-time scaling measures the
   operators, not replication artifacts:
     * primary keys are offset per copy (and foreign keys that must keep
       matching — l_orderkey follows o_orderkey — offset identically), so
       per-key densities and join fan-outs stay constant; a naive 10× copy
       with shared keys would grow stream-stream join output quadratically;
     * document text is letter-ROTATED per copy (translate with a rotated
       alphabet: length/token structure identical, shingle sets disjoint
       across copies), so dedup/minhash relations replicate linearly
       instead of every 10-clone group exploding into 45 near-dup pairs;
     * embeddings are shifted per copy (distinct vectors, same dimension),
       probe/centroid ids (vec_id < 8) exist once, in copy 0.
2. Time the priciest catalog entries at sf0.1 and sf1 in one session
   (bench protocol: warmup, noop sink, min of 2 passes) and write
   ``SF1_PROBE.json`` with per-entry scaling factors (sf1/sf0.1; linear
   scaling on 10× data at fixed parallelism = factor ~10).

Run:  python tests/sf1_probe.py            # build (if absent) + measure
      python tests/sf1_probe.py --rebuild  # force data rebuild
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
SF01 = "/root/testdata/sf0.1"
SF1 = str(REPO / ".sfscale" / "sf1")
COPIES = 10

#: The priciest entries by measured wall time (r4 BENCH_DETAIL top-10 plus
#: the round-5 heavyweights), extended r6 with the remaining replay-family
#: entries (r5 verdict task 7) so the streaming tier's trend line is
#: complete.
PROBE_ENTRIES = [
    "stream_cusum_replay",
    "stream_interval_full_join_replay",
    "stream_interval_left_join_replay",
    "ann_recall_report",
    "stream_interval_join_replay",
    "dedup_clusters",
    "controller_streaming_replay",
    "stream_session_window_replay",
    "dedup_minhash_lsh",
    "join_min_cost_supplier",
    "stream_tumbling_agg_replay",
    "stream_sliding_agg_replay",
    "stream_cms_counters_replay",
    "streaming_dedup_replay",
    # round-7 additions: the new heavyweights join the fixed set so the
    # trend line stays complete as the catalog grows
    "dedup_ngram_span_removal",
    "retrieval_bm25_topk",
    "graph_triangles_cosupplier",
    "stream_ewma_replay",
    # this session's replay/heavy additions
    "stream_ohlc_replay",
    "dedup_incremental_batch",
    # session-3 additions with quadratic-risk or large-intermediate shapes:
    # basket pair explosion, the per-user hourly probe grid (~10.5 M rows
    # at sf1), and the full-table version diff
    "mining_frequent_part_pairs",
    "cdc_point_in_time_snapshots",
    "cdc_snapshot_diff",
    "stream_mv_agg_replay",
    "mining_association_rules",
    "join_orders_scd2_state",
    # round-8 broadening (r7 verdict task 4): the remaining top-priced /
    # quadratic-risk entries join the tier so the 100 TB claim rests on
    # scale-exposed hash checks, not sf0.01 alone. Graph + the lossy ANN
    # family + the semantic-dedup blocker are the priority adds; the rest
    # are the next-priciest sf0.1-tier members not yet covered here.
    "graph_pagerank_suppliers",
    "graph_bfs_supplier_reach",
    "ann_ivf_pq_rerank_topk",
    "ann_ivf_pq_topk",
    "ann_pq_adc_topk",
    "ann_ranking_metrics",
    "dedup_semantic_clusters",
    "ts_ewma_user_value",
    "ts_ols_trend_user_value",
    "contamination_ngram_overlap",
    "text_local_min_fingerprints",
    "curation_pipeline_end_to_end",
    "stream_windowed_topk_replay",
    "quality_mad_outliers_value",
    # round-8 in-session additions: the personalized-PageRank sibling
    # joins its uniform twin (iterative = scale-exposed); the streaming
    # HDR sketch completes the replay family's trend line
    "graph_ppr_purchase_seeds",
    "stream_hdr_quantiles_replay",
    # round-9: the weighted-SSSP and k-core siblings join BFS/PageRank
    # (iterative = scale-exposed)
    "graph_sssp_supply_costs",
    "graph_kcore_cosupplier",
    # the semi variant completes the stream-stream join-type matrix in the
    # replay family's trend line
    "stream_interval_semi_join_replay",
    # round-10: the character-level ExactSubstr tier (window-explode =
    # scale-exposed shingle shape) and the streaming incremental degree
    # count join their families' trend lines in their debut round
    "dedup_exact_substring_spans",
    "dedup_exact_substring_removal",
    "stream_degree_count_replay",
    # round-11: the incremental ExactSubstr tier and the CUT application
    # join their family's trend line in their debut round (A×B
    # window-index join / segment assembly = scale-exposed)
    "dedup_exact_substring_incremental",
    "dedup_exact_substring_cut",
    "stream_exact_substring_incremental_replay",
    # round-12: the three index-maintenance loops join their families'
    # trend lines in their debut round (screen-then-upsert over a
    # persisted index = the scale-exposed daily-crawl shape; the
    # embedding loop additionally carries the measured bits-lever
    # densification story in SCALE.md)
    "stream_exact_substring_index_maintenance_replay",
    "stream_minhash_index_maintenance_replay",
    "stream_embedding_index_maintenance_replay",
    "stream_bm25_index_maintenance_replay",
    # round-13: the restart-safe pipeline (persisted snapshot per epoch =
    # the durable-commit cost shape), the derived-cells IVF (128 cells at
    # sf1 — the parameter rule under measurement), and the maintained→
    # folded BM25 read path join their families' trend lines
    "stream_minhash_maintenance_pipeline",
    "ann_ivf_derived_cells_topk",
    "retrieval_bm25_topk_from_maintained",
    "stream_embedding_maintenance_pipeline",
    # round-14: the two HEAVIEST maintenance modalities' restart-safe
    # pipelines join their family's trend line in their debut round
    # (two-/three-relation persisted snapshots per epoch + retention +
    # decisions compaction + BM25 fold cadence — the durable-commit
    # cost shape at its largest)
    "stream_exact_substring_maintenance_pipeline",
    "stream_bm25_maintenance_pipeline",
]

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_sf1() -> None:
    build_replication(SF1, COPIES)


def build_replication(dest: str, copies: int) -> None:
    """Shape-preserving ``copies``× replication of sf0.1 into ``dest`` —
    the sf1 build generalized so the scaling-fit script
    (scripts/scale_fit.py) can produce INTERMEDIATE volume points and fit
    wall = C + g·copies on 3+ points instead of eyeballing 2."""
    import duckdb

    Path(dest).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    def src(t: str) -> str:
        return f"'{SF01}/{t}.parquet'"

    def copy(sql: str, t: str) -> None:
        con.execute(f"COPY ({sql}) TO '{dest}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{dest}/{t}.parquet'").fetchone()[0]
        print(f"  built {t}: {n} rows")

    SF1, COPIES = dest, copies  # noqa: N806 — shadow for the body below

    # dims: unchanged (the facts keep their foreign keys, so every join
    # match multiplicity is preserved exactly)
    for t in ("region", "nation", "customer", "supplier", "part"):
        copy(f"SELECT * FROM {src(t)}", t)

    ko = con.execute(f"SELECT max(o_orderkey) + 1 FROM {src('orders')}").fetchone()[0]
    copy(
        f"""SELECT o_orderkey + i * {ko} AS o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')} CROSS JOIN range({COPIES}) t(i)""",
        "orders",
    )
    copy(
        f"""SELECT l_orderkey + i * {ko} AS l_orderkey, l_partkey, l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')} CROSS JOIN range({COPIES}) t(i)""",
        "lineitem",
    )
    ke, ku = con.execute(
        f"SELECT max(event_id) + 1, max(user_id) + 1 FROM {src('events')}"
    ).fetchone()
    copy(
        f"""SELECT event_id + i * {ke} AS event_id, ts,
                   user_id + i * {ku} AS user_id, event_type, value, props
            FROM {src('events')} CROSS JOIN range({COPIES}) t(i)""",
        "events",
    )
    kd = con.execute(f"SELECT max(doc_id) + 1 FROM {src('documents')}").fetchone()[0]
    # per-copy alphabet rotation: copy i maps a->alpha[i], b->alpha[i+1], ...
    rot_cases = " ".join(
        f"WHEN {i} THEN translate(text, '{_ALPHA}', '{_ALPHA[i:]}{_ALPHA[:i]}')"
        for i in range(COPIES)
    )
    copy(
        f"""SELECT doc_id + i * {kd} AS doc_id,
                   CASE i {rot_cases} END AS text,
                   lang, source, n_chars
            FROM {src('documents')} CROSS JOIN range({COPIES}) t(i)""",
        "documents",
    )
    kv = con.execute(f"SELECT max(vec_id) + 1 FROM {src('embeddings')}").fetchone()[0]
    copy(
        f"""SELECT vec_id + i * {kv} AS vec_id,
                   list_transform(embedding,
                                  x -> CAST(x + i * 0.013 AS FLOAT)) AS embedding,
                   label
            FROM {src('embeddings')} CROSS JOIN range({COPIES}) t(i)""",
        "embeddings",
    )
    con.close()


def measure() -> dict:
    from fdp_dynamically_controlled_streams_spark.queries import catalog
    from fdp_dynamically_controlled_streams_spark.session import get_spark

    spark = get_spark(app_name="sf1-probe")
    spark.range(1000).count()
    cat = catalog()
    # streaming runtime warmup off the clock (same rationale as bench.py)
    try:
        cat["controller_streaming_replay"].fn(spark, "/root/testdata/sf0.001").count()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed: {exc!r}", file=sys.stderr)

    out: dict[str, dict] = {}
    for name in PROBE_ENTRIES:
        rec: dict[str, float] = {}
        for label, sfd in (("sf0.1", SF01), ("sf1", SF1)):
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                cat[name].fn(spark, sfd).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            rec[label] = round(min(times), 3)
        rec["factor"] = round(rec["sf1"] / rec["sf0.1"], 2)
        out[name] = rec
        print(f"  {name}: sf0.1={rec['sf0.1']}s sf1={rec['sf1']}s x{rec['factor']}")
    return out


def main() -> int:
    if "--rebuild" in sys.argv or not Path(f"{SF1}/lineitem.parquet").exists():
        print("building sf1 replication...")
        build_sf1()
    print("measuring...")
    results = measure()
    payload = {
        "copies": COPIES,
        "protocol": "min_of_2_passes/one_session/noop_sink",
        "entries": results,
    }
    (REPO / "SF1_PROBE.json").write_text(json.dumps(payload, indent=1) + "\n")
    print("wrote SF1_PROBE.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

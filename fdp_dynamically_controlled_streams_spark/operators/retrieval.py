"""BM25 inverted-index retrieval: score a query set against a document
corpus through a term-postings join and return top-k per query.

This is the retrieval primitive a training-data pipeline uses for
contamination sweeps (eval-set queries vs corpus), RAG corpus QA, and
query-driven curation — the lexical complement to the embedding ANN tiers
in operators/similarity.py.

Scale shape: the ONLY corpus-sized structure is the postings list
(term, doc_id, c) with the per-term BM25 contribution ``c`` PRECOMPUTED
at index-build time (r11 verdict task 3: tf, dl, df, n, avgdl and the
k1/b constants are all fixed once the corpus is — so the ln/divide/round
work is paid once per index, not once per query panel). The query path
is a single postings ⋈ query-terms join on `term` + an integer sum —
candidates bounded by shared terms, never query × corpus. Stop-term skew
(a term matching half the corpus would both blow the join AND carry
~zero idf) is cut by a df <= N/2 cap applied on the panel-sized side
BEFORE the postings join, identically in the oracle. Top-k per query is
a window row_number — per-partition heap + k-merge, never a global sort.

Numeric portability: every per-term BM25 contribution is computed in
doubles with IDENTICAL expression shape in both engines, rounded to 1e-6,
scaled to bigint micro-units (round-then-cast, the engine-stable idiom —
Spark truncates double->bigint, DuckDB rounds), and SUMMED AS INTEGERS so
the per-(query, doc) score is order-independent under any partitioning.

[ABSENT in reference: SURVEY §2.7 — engine extension.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators import tfidf as tfidf_ops

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Top-``k`` corpus docs per query doc under BM25 (k1=1.2, b=0.75,
    Robertson idf ln((N-df+0.5)/(df+0.5)+1)); the query doc itself is
    excluded from its own candidates. Terms present in more than
    ``max_df_frac`` of the corpus are dropped (stop-term/skew cap — on a
    natural-language corpus 0.5 cuts the join-exploding stopwords that
    carry ~zero idf anyway; 1.0 disables, for tiny-vocabulary fixtures).
    Returns (query_id, doc_id, rank, score)."""
    postings, df_t, avg = _build_index(docs, id_col, text_col)
    return _score_topk(postings, df_t, avg, query_docs, k, id_col, text_col,
                       max_df_frac)


def _build_index(docs: DataFrame, id_col: str, text_col: str):
    """One tokenize pass -> the three index relations: postings
    (term, doc_id, c) with the ENTIRE per-term BM25 contribution ``c``
    precomputed at build time (r11 verdict task 3: every input to the
    score — tf, dl, df, n, avgdl, and the k1/b constants — is known
    when the index is built, so the ln/divisions/rounding all move off
    the query path; the query phase is ONE postings ⋈ query-terms join
    + an integer sum), the vocabulary-sized df table (term, df — kept
    query-side because ``max_df_frac`` is a query-time parameter), and
    the 1-row corpus stats (avgdl, n).  The df/avgdl attach onto the
    corpus-sized postings happens HERE, once per index build, not once
    per query panel."""
    tdc = tfidf_ops.term_doc_counts(docs, text_col, id_col)
    dl = tdc.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))
    n_total = docs.agg(F.count(F.lit(1)).alias("n"))
    avg = dl.agg(F.sum("dl").alias("s")).crossJoin(n_total).select(
        (F.col("s") / F.col("n")).alias("avgdl"), "n"
    )
    df_t = tdc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    postings = (
        tdc.join(dl, "doc_id")
        .join(df_t, "term")
        .crossJoin(F.broadcast(avg))
        .select(
            "term",
            "doc_id",
            F.expr(
                f"CAST(round(round("
                f"  ln((n - df + 0.5) / (df + 0.5) + 1.0)"
                f"  * (tf * ({K1} + 1.0))"
                f"  / (tf + {K1} * (1.0 - {B} + {B} * dl / avgdl))"
                f", 6) * 1000000, 0) AS BIGINT)"
            ).alias("c"),
        )
    )
    return postings, df_t, avg


def bm25_index_write(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the BM25 inverted index to ``path`` (postings/, dft/,
    stats/ parquet). The production retrieval shape is "index once, query
    many": the corpus-sized tokenize + postings build is paid once and
    every query panel afterwards runs only the postings ⋈ query-terms
    join. At 100 TB the index is the artifact that persists between
    contamination sweeps — rebuilding it per query batch would dominate
    end-to-end cost. Values are bit-identical to the in-memory build
    (same expression tree, parquet round-trips doubles exactly), so
    :func:`bm25_topk_from_index` answers match :func:`bm25_topk`."""
    postings, df_t, avg = _build_index(docs, id_col, text_col)
    postings.write.mode("overwrite").parquet(f"{path}/postings")
    df_t.write.mode("overwrite").parquet(f"{path}/dft")
    avg.write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_from_index(
    spark,
    path: str,
    query_docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Query phase of BM25 against an index written by
    :func:`bm25_index_write`: same result as :func:`bm25_topk` on the
    indexed corpus."""
    return _score_topk(
        spark.read.parquet(f"{path}/postings"),
        spark.read.parquet(f"{path}/dft"),
        spark.read.parquet(f"{path}/stats"),
        query_docs, k, id_col, text_col, max_df_frac,
    )


def _score_topk(
    postings: DataFrame,
    df_t: DataFrame,
    avg: DataFrame,
    query_docs: DataFrame,
    k: int,
    id_col: str,
    text_col: str,
    max_df_frac: float,
) -> DataFrame:
    qterms = (
        tfidf_ops.tokens(query_docs, text_col, id_col)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    # stop-term / skew cap applied on the PANEL-sized side BEFORE the
    # corpus-sized join (r12: the capped terms never reach the postings
    # join at all, instead of being filtered out of its output), against
    # the vocabulary-sized df table — the scores themselves were folded
    # into the postings at index build.
    qt = (
        qterms.join(df_t, "term")
        .crossJoin(F.broadcast(avg))
        .where(F.col("df") <= F.floor(F.col("n") * F.lit(max_df_frac)))
        .select("query_id", "term")
    )
    per_pair = (
        # panel side is the broadcast build — never the corpus postings
        # (same invariant as bm25_screen_against_raw; at bench SF Spark
        # would otherwise sometimes pick the postings as BuildRight).
        # ONE exchange serves the score agg AND the rank window (r13
        # verdict task 2): partitioning by query_id alone satisfies the
        # (query_id, doc_id) clustering the agg needs AND the window's
        # query_id partitioning, so the plan shuffles once, not twice —
        # no new skew axis: the per-query rank step already concentrates
        # each query's candidates on one partition.
        F.broadcast(qt).join(postings, "term")
        .where(F.col("query_id") != F.col("doc_id"))
        .repartition(F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        per_pair.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            (F.col("score_micro") / F.lit(1000000.0)).alias("score"),
        )
    )


def bm25_topk_sql(
    table: str = "documents",
    query_pred: str = "doc_id % 50 = 0",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
) -> str:
    """DuckDB twin of :func:`bm25_topk` with the query set selected by
    ``query_pred`` over the same table."""
    return rf"""
WITH toks AS (
  SELECT {id_col} AS doc_id, t.term
  FROM {table},
       UNNEST(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
), tdc AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tdc GROUP BY doc_id
), nn AS (
  SELECT count(*) AS n FROM {table}
), avgd AS (
  SELECT (SELECT sum(dl) FROM dl) / n AS avgdl, n FROM nn
), df_t AS (
  SELECT term, count(*) AS df FROM tdc GROUP BY term
), qterms AS (
  SELECT DISTINCT doc_id AS query_id, term FROM tdc
  WHERE {query_pred}
), scored AS (
  SELECT q.query_id, p.doc_id,
         CAST(round(round(
             ln((a.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
             * (p.tf * ({K1} + 1.0))
             / (p.tf + {K1} * (1.0 - {B} + {B} * d.dl / a.avgdl))
         , 6) * 1000000, 0) AS BIGINT) AS c
  FROM qterms q
  JOIN tdc p ON p.term = q.term AND p.doc_id <> q.query_id
  JOIN dl d ON d.doc_id = p.doc_id
  JOIN df_t f ON f.term = q.term
  CROSS JOIN avgd a
  WHERE f.df <= floor(a.n * {max_df_frac})
), per_pair AS (
  SELECT query_id, doc_id, sum(c) AS score_micro
  FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rank, score FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id ASC) AS rank,
         score_micro / 1000000.0 AS score
  FROM per_pair
) WHERE rank <= {k}
"""


def bm25_raw_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The WRITE-OPTIMIZED form of the BM25 index — raw relations
    (tdc_dl = (doc_id, term, tf, dl), df_t = (term, df), stats = 1 row
    (n, sumdl)) with nothing globally folded in, so a daily batch can be
    upserted with vocabulary-sized deltas (:func:`bm25_raw_index_upsert`).
    The precomputed-contribution postings of :func:`_build_index` are
    the READ-optimized compacted form: folding idf/avgdl bakes global
    corpus stats into every row, so any corpus change invalidates all of
    them — the classic write-vs-read index trade, kept explicit here.
    ``sumdl`` is an exact BIGINT (dl is a token count), so stats deltas
    compose exactly and avgdl = sumdl/n reproduces the from-scratch
    double bit-for-bit.

    Token-LESS documents (empty/whitespace/punctuation-only text —
    common in real crawls) COUNT toward ``n`` exactly as in
    :func:`_build_index` (docs count, not dl rows) and the DuckDB twin
    (``nn AS SELECT count(*) FROM corpus`` — r12 ADVICE): they ride in
    ``tdc_dl`` as one NULL-term sentinel row (tf 0, dl 0.0) so the
    upsert's retire-side deltas see them (a re-crawled empty doc
    decrements n by 1 and sumdl by 0).  Every term equi-join downstream
    is inner on ``term``, so the sentinel rows never reach a score.

    [ABSENT in reference: SURVEY §2.7 — engine extension.]"""
    tdc = tfidf_ops.term_doc_counts(docs, text_col, id_col)
    dl = tdc.groupBy("doc_id").agg(F.sum("tf").alias("dli"))
    # one LEFT join from the doc roster: token docs fan out to their
    # (term, tf) rows; token-less docs keep exactly one row with a NULL
    # term (a union with a literal-NULL column trips a constraint-
    # rewrite bug in Spark 4.1's UnionBase under the delta anti-join
    # chain; the left join expresses the same relation without it)
    tdc_dl = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(tdc.join(dl, "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "term",
            F.coalesce("tf", F.lit(0)).alias("tf"),
            F.coalesce(F.col("dli").cast("double"), F.lit(0.0)).alias("dl"),
        )
    )
    df_t = tdc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # n and sumdl in ONE aggregation over the doc roster (token-less
    # docs contribute (1, 0)) — no 1-row x 1-row cross join in the plan
    stats = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(dl, "doc_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dli"), F.lit(0)).cast("long").alias("sumdl"),
        )
    )
    return tdc_dl, df_t, stats


def bm25_raw_index_upsert(
    tdc_dl: DataFrame,
    df_t: DataFrame,
    stats: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delta: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """APPEND an accepted batch into the raw BM25 index — the retrieval
    family's instance of the screen-then-upsert maintenance discipline
    (merge.py::upsert_sink; see dedup.exact_substring_index_upsert):
    batch docs REPLACE same-id postings via one anti-join on the
    (bucketed, in production) doc id; the vocabulary-sized df table and
    the 1-row stats move by EXACT integer deltas (retired rows' terms
    decrement, batch terms increment; terms at df 0 leave), so nothing
    corpus-sized is re-tokenized or re-aggregated. Re-applying a batch
    is a no-op by construction.

    ``delta=True`` is the streaming-loop form (the ExactSubstr delta
    lesson, dedup.exact_substring_index_upsert_delta): the BATCH's
    postings are localCheckpointed ONCE and the vocabulary-sized df and
    1-row stats DERIVE from that checkpoint (the sentinel rows make the
    postings self-contained — deriving is bit-identical to rebuilding
    and skips two extra tokenize passes of the day's documents, r12
    verdict task 2); the RETIRED same-id rows are likewise materialized
    once (day-bounded: at most the batch's ids) so the df and stats
    deltas don't each rescan the corpus-sized postings.  The corpus
    postings composition stays lazy over the already-materialized prior
    — re-materializing the whole postings table per day is O(corpus)
    daily; a production MERGE INTO writes exactly this delta. Compact
    on a cadence (:func:`bm25_raw_index_compact`).

    [ABSENT in reference: SURVEY §2.7 — engine extension.]"""
    if delta:
        b_tdc_dl = bm25_raw_index(batch, id_col, text_col)[0]
        new_ids = batch.select(F.col(id_col).alias("doc_id"))
        retired = tdc_dl.join(F.broadcast(new_ids), "doc_id", "left_semi")
        # the two day-bounded materializations — the batch postings and
        # the retired same-id rows — are INDEPENDENT jobs (the retire
        # side reads only the prior postings and the batch ids), so they
        # run concurrently (guide §2.6) instead of chaining two
        # checkpoint jobs per day
        from fdp_dynamically_controlled_streams_spark.functions.parallelism import (
            overlap_jobs,
        )

        _box: dict[str, DataFrame] = {}
        overlap_jobs(
            lambda: _box.__setitem__("b", b_tdc_dl.localCheckpoint()),
            lambda: _box.__setitem__("r", retired.localCheckpoint()),
        )
        b_tdc_dl, retired = _box["b"], _box["r"]
        # b_df and b_stats stay LAZY off the checkpointed batch postings
        # (r13 verdict task 2): each is consumed exactly once per day
        # (by the df2 / stats2 composition the caller checkpoints), so
        # materializing them here bought nothing and cost one driver
        # job each (~0.5 s/day of the maintenance loop's constant,
        # measured at sf0.1); recomputing is one batch-sized
        # aggregation off the checkpoint.
        b_df = (
            b_tdc_dl.where(F.col("term").isNotNull())
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        b_stats = (
            b_tdc_dl.groupBy("doc_id")
            # dl is an integer-valued double; cast BEFORE the sum so the
            # accumulation is exact integer arithmetic (a double sum is
            # only exact below 2^53 — not a 100 TB-safe assumption)
            .agg(F.first("dl").cast("long").alias("dl"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sumdl"),
            )
        )
    else:
        b_tdc_dl, b_df, b_stats = bm25_raw_index(batch, id_col, text_col)
        new_ids = batch.select(F.col(id_col).alias("doc_id"))
        retired = tdc_dl.join(F.broadcast(new_ids), "doc_id", "left_semi")
    # NULL-term sentinel rows (token-less docs) carry no df; they retire
    # through r_stats below (n/sumdl), never through the df delta
    r_df = retired.where(F.col("term").isNotNull()).groupBy("term").agg(
        F.count(F.lit(1)).alias("r")
    )
    # dl cast to long BEFORE the sum — same exact-integer-arithmetic
    # rationale as b_stats above (a double sum is only exact below 2^53;
    # r13 ADVICE flagged the inconsistency)
    r_stats = (
        retired.groupBy("doc_id")
        .agg(F.first("dl").cast("long").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("rn"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("rsumdl"),
        )
    )
    tdc_dl2 = tdc_dl.join(F.broadcast(new_ids), "doc_id", "left_anti").unionByName(
        b_tdc_dl
    )
    df2 = (
        df_t.join(r_df, "term", "left")
        .join(b_df.withColumnRenamed("df", "bdf"), "term", "full")
        .select(
            "term",
            (
                F.coalesce("df", F.lit(0))
                - F.coalesce("r", F.lit(0))
                + F.coalesce("bdf", F.lit(0))
            ).alias("df"),
        )
        .where(F.col("df") > 0)
    )
    stats2 = (
        stats.crossJoin(F.broadcast(r_stats))
        .crossJoin(F.broadcast(b_stats.withColumnRenamed("n", "bn").withColumnRenamed("sumdl", "bsumdl")))
        .select(
            (F.col("n") - F.col("rn") + F.col("bn")).alias("n"),
            (F.col("sumdl") - F.col("rsumdl") + F.col("bsumdl")).alias("sumdl"),
        )
    )
    return tdc_dl2, df2, stats2


def bm25_raw_index_compact(
    tdc_dl: DataFrame, df_t: DataFrame, stats: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """COMPACT the maintained raw BM25 index (r12 verdict task 3): after
    N delta upserts the postings relation is N stacked broadcast
    anti-joins + unions over the materialized prior; compaction
    re-materializes the merged relations (localCheckpoint here; the
    periodic OPTIMIZE/table-rewrite in production), physically
    reclaiming rows retired by re-crawl upserts and resetting the
    composition depth to a bare scan.  Laws
    (tests/test_retrieval_spans.py): (1) screening against the
    compacted index equals screening against the composed one —
    compaction is invisible to semantics; (2) the maintained df/stats
    are CONSISTENT with the compacted postings — df_t re-derives
    exactly from tdc_dl's live rows and (n, sumdl) from its per-doc
    rows (the NULL-term sentinel rows make the postings relation
    self-contained), so the exact-integer delta arithmetic is
    cross-checkable against the physical table at every compaction
    point.

    [ABSENT in reference: SURVEY §2.7 — engine extension.]"""
    return (
        tdc_dl.localCheckpoint(),
        df_t.localCheckpoint(),
        stats.localCheckpoint(),
    )


def bm25_fold_postings(
    tdc_dl: DataFrame, df_t: DataFrame, stats: DataFrame
) -> DataFrame:
    """FOLD the maintained write-optimized raw index into the
    READ-optimized precomputed-contribution postings (term, doc_id, c)
    — the cadence operation that closes the write-vs-read index trade
    (:func:`bm25_raw_index` docstring): the daily loop upserts the raw
    relations cheaply; on the compaction cadence this fold bakes the
    CURRENT corpus globals (df, n, avgdl) into every posting row so the
    query path returns to :func:`_score_topk`'s one-join shape.  Law
    (tests/test_retrieval_spans.py): fold(raw(docs)) is row- and
    bit-identical to :func:`_build_index`'s postings — same expression
    tree, avgdl reproduced exactly from the integer (n, sumdl) — so
    :func:`bm25_topk`-class answers served from a folded maintained
    index equal a from-scratch index build.  One corpus-sized pass, the
    vocabulary df and 1-row stats broadcast onto it; sentinel NULL-term
    rows drop at the inner df join.

    [ABSENT in reference: SURVEY §2.7 — engine extension.]"""
    avg = stats.select(
        (F.col("sumdl").cast("double") / F.col("n")).alias("avgdl"), "n"
    )
    return (
        tdc_dl.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(avg))
        .select(
            "term",
            "doc_id",
            F.expr(
                f"CAST(round(round("
                f"  ln((n - df + 0.5) / (df + 0.5) + 1.0)"
                f"  * (tf * ({K1} + 1.0))"
                f"  / (tf + {K1} * (1.0 - {B} + {B} * dl / avgdl))"
                f", 6) * 1000000, 0) AS BIGINT)"
            ).alias("c"),
        )
    )


def tfidf_fold_weights(
    tdc_dl: DataFrame, df_t: DataFrame, stats: DataFrame
) -> DataFrame:
    """FOLD the same maintained raw index into the TF-IDF ranker's
    read-optimized integer weight table (doc_id, term, wi) — ONE
    write-optimized artifact (:func:`bm25_raw_index`) serves BOTH
    hybrid rankers' read forms (:func:`bm25_fold_postings` for BM25,
    THIS for the smooth-idf dot ranker), because tf/df/n are the only
    corpus facts either scoring function needs.  Law
    (tests/test_retrieval_spans.py): bit-identical to
    :func:`_tfidf_weights` built from scratch, including after delta
    upserts — same expression tree, n taken from the exact integer
    stats.

    [ABSENT in reference: SURVEY §2.7 — engine extension.]"""
    weight = F.round(
        F.col("tf")
        * (F.log((1 + F.col("n")) / (1 + F.col("doc_freq"))) + F.lit(1.0)),
        6,
    )
    return (
        tdc_dl.where(F.col("term").isNotNull())
        .join(F.broadcast(df_t.withColumnRenamed("df", "doc_freq")), "term")
        .crossJoin(F.broadcast(stats.select("n")))
        .select("doc_id", "term", weight.alias("weight"))
        .select(
            "doc_id",
            "term",
            F.expr(f"CAST(round(weight * {RRF_SCALE}, 0) AS BIGINT)").alias(
                "wi"
            ),
        )
    )


def bm25_screen_against_raw(
    query_docs: DataFrame,
    tdc_dl: DataFrame,
    df_t: DataFrame,
    stats: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Screen NEW documents against the raw BM25 index (the contamination
    / near-source sweep of a daily crawl): top-``k`` corpus matches per
    query doc, the query docs NOT part of the corpus stats (they are the
    new batch, not yet upserted). Scoring folds df/avgdl at query time
    from the vocabulary-sized df table and the 1-row stats — one
    postings ⋈ query-terms join, same candidate bound as
    :func:`bm25_topk`, and value-identical to rebuilding the corpus
    from scratch (exact-integer stats; identical expression shape).

    [ABSENT in reference: SURVEY §2.7 — engine extension.]"""
    qterms = (
        tfidf_ops.tokens(query_docs, text_col, id_col)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    avg = stats.select(
        (F.col("sumdl").cast("double") / F.col("n")).alias("avgdl"), "n"
    )
    # idf is a per-(query, term) fact — computed HERE on the panel-term-
    # sized side (the ln() never runs per candidate row; identical double
    # by construction since (ln(x)*A)/B evaluates in the same order)
    qt = (
        qterms.join(df_t, "term")
        .crossJoin(F.broadcast(avg))
        .where(F.col("df") <= F.floor(F.col("n") * F.lit(max_df_frac)))
        .select(
            "query_id",
            "term",
            F.expr("ln((n - df + 0.5) / (df + 0.5) + 1.0)").alias("idf"),
            "avgdl",
        )
    )
    # broadcast the PANEL side explicitly: the corpus postings are small
    # enough at bench SF that Spark otherwise picks them as the
    # broadcast build (BuildRight) — rebuilding a corpus-sized hash map
    # per consumer measured as the screen's dominant cost, and at 100 TB
    # the corpus side must never be the build side anyway.
    per_pair = (
        F.broadcast(qt).join(tdc_dl, "term")
        .where(F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                f"CAST(round(round("
                f"  idf"
                f"  * (tf * ({K1} + 1.0))"
                f"  / (tf + {K1} * (1.0 - {B} + {B} * dl / avgdl))"
                f", 6) * 1000000, 0) AS BIGINT)"
            ).alias("c"),
        )
        # one exchange for agg + rank window (see _score_topk)
        .repartition(F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        per_pair.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            (F.col("score_micro") / F.lit(1000000.0)).alias("score"),
        )
    )


def bm25_maintenance_sql(
    table: str = "documents",
    k: int = 10,
    batch_pred: str = "doc_id % 5 = 0",
    day_expr: str = "(doc_id % 15) // 5",
    n_days: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    panel_pred: str = "TRUE",
) -> str:
    """DuckDB twin of the N-day BM25 maintenance loop: day-k docs
    matching ``panel_pred`` scored against the corpus of seed (NOT
    batch_pred) + days < k, with corpus stats (df, n, avgdl) computed
    over exactly that corpus — a UNION ALL of per-day from-scratch
    screens, which the maintained raw index must reproduce
    bit-for-bit. (The UPSERT side always takes the whole day;
    ``panel_pred`` bounds only the screening panel, the same
    worst-case-candidate bound every retrieval entry applies on this
    tiny-vocabulary fixture.)"""
    days = []
    for d in range(n_days):
        corpus = (
            f"(SELECT * FROM {table} WHERE NOT ({batch_pred})"
            f" OR CAST({day_expr} AS BIGINT) < {d})"
        )
        days.append(
            f"""
SELECT query_id, doc_id, rank, score FROM (
  WITH ctoks AS (
    SELECT {id_col} AS doc_id, t.term
    FROM {corpus} c,
         UNNEST(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+')) AS t(term)
    WHERE t.term <> ''
  ), tdc AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM ctoks GROUP BY doc_id, term
  ), dl AS (
    SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tdc GROUP BY doc_id
  ), nn AS (SELECT count(*) AS n FROM {corpus} c),
  avgd AS (SELECT (SELECT sum(dl) FROM dl) / n AS avgdl, n FROM nn),
  df_t AS (SELECT term, count(*) AS df FROM tdc GROUP BY term),
  qterms AS (
    SELECT DISTINCT {id_col} AS query_id, t.term
    FROM {table} q,
         UNNEST(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+')) AS t(term)
    WHERE t.term <> '' AND ({batch_pred}) AND ({panel_pred})
      AND CAST({day_expr} AS BIGINT) = {d}
  ), scored AS (
    SELECT q.query_id, p.doc_id,
           CAST(round(round(
               ln((a.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
               * (p.tf * ({K1} + 1.0))
               / (p.tf + {K1} * (1.0 - {B} + {B} * d.dl / a.avgdl))
           , 6) * 1000000, 0) AS BIGINT) AS c
    FROM qterms q
    JOIN tdc p ON p.term = q.term AND p.doc_id <> q.query_id
    JOIN dl d ON d.doc_id = p.doc_id
    JOIN df_t f ON f.term = q.term
    CROSS JOIN avgd a
  ), per_pair AS (
    SELECT query_id, doc_id, sum(c) AS score_micro
    FROM scored GROUP BY query_id, doc_id
  )
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id ASC) AS rank,
         score_micro / 1000000.0 AS score
  FROM per_pair
) WHERE rank <= {k}"""
        )
    return "\nUNION ALL\n".join(days)


# ------------------------------------------------------------------ RRF

#: standard reciprocal-rank-fusion constant (Cormack et al. 2009).
RRF_K = 60
#: fixed-point scale for the 1/(k+rank) contributions.
RRF_SCALE = 1_000_000


def tfidf_dot_topk(
    docs: DataFrame,
    query_docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` corpus docs per query under the smooth-idf TF-IDF dot
    product — the second ranker of the hybrid-retrieval pair (BM25
    saturates tf; this one is linear in tf with a different idf, so the
    two rankings genuinely disagree and fusing them is meaningful).
    Weights are the repo's 6-rounded tf·(ln((1+N)/(1+df))+1) snapped to
    MICRO-INT, so the dot is an order-independent integer sum — the same
    postings ⋈ query-terms join bound as BM25, never query × corpus.
    Returns (query_id, doc_id, rank, dot_micro2)."""
    w = _tfidf_weights(docs, id_col, text_col)
    return _tfidf_dot_score(w, query_docs, k, id_col)


def _tfidf_weights(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The corpus-sized integer weight table (doc_id, term, wi) — the
    TF-IDF ranker's whole index (same index-once discipline as the BM25
    postings since r12: idf and the micro-int snap are corpus facts,
    computed at build time)."""
    return tfidf_ops.tfidf(docs, text_col, id_col).select(
        "doc_id",
        "term",
        F.expr(f"CAST(round(weight * {RRF_SCALE}, 0) AS BIGINT)").alias("wi"),
    )


def tfidf_index_write(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Materialize the TF-IDF weight index (the production index-once /
    query-many artifact, mirroring :func:`bm25_index_write`; parquet
    round-trips the bigint weights exactly, so indexed answers are
    bit-identical to the inline build)."""
    _tfidf_weights(docs, id_col, text_col).write.mode("overwrite").parquet(
        f"{path}/weights"
    )


def tfidf_dot_topk_from_index(
    spark,
    path: str,
    query_docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Query phase of the TF-IDF dot ranker against an index written by
    :func:`tfidf_index_write`."""
    return _tfidf_dot_score(
        spark.read.parquet(f"{path}/weights"), query_docs, k, id_col
    )


def _tfidf_dot_score(
    w: DataFrame, query_docs: DataFrame, k: int, id_col: str
) -> DataFrame:
    qids = query_docs.select(F.col(id_col).alias("query_id")).distinct()
    qw = w.join(
        qids, w.doc_id == qids.query_id
    ).select("query_id", "term", F.col("wi").alias("wq"))
    scored = (
        F.broadcast(qw)  # panel side builds; the corpus weights never do
        .join(w, "term")
        .where(F.col("query_id") != F.col("doc_id"))
        # one exchange for agg + rank window (see _score_topk)
        .repartition(F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("wq") * F.col("wi")).alias("dot_micro2"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("dot_micro2").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "dot_micro2")
    )


def rrf_fuse(
    rank_tables: list[DataFrame],
    topk: int = 10,
    k_rrf: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of N (query_id, doc_id, rank) tables:
    fused score = Σ_lists RRF_SCALE div (k_rrf + rank) — EXACT integer
    contributions (div, not float division), so the fused ordering is
    engine- and partition-invariant; a doc absent from a list contributes
    nothing. Returns (query_id, doc_id, rrf_micro, rank), top ``topk``
    per query, ties to the lower doc_id."""
    if not rank_tables:
        raise ValueError("rrf_fuse requires at least one rank table")
    contrib = None
    for t in rank_tables:
        c = t.select(
            "query_id",
            "doc_id",
            F.expr(f"{RRF_SCALE} div ({k_rrf} + rank)").alias("c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    # one exchange for agg + rank window (see _score_topk)
    fused = (
        contrib.repartition(F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("rrf_micro"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rrf_micro", "rank")
    )


def _hybrid_ranks_sql(
    table: str,
    query_pred: str,
    k: int,
    id_col: str,
    text_col: str,
    max_df_frac: float,
    k_rrf: int,
) -> str:
    """The shared CTE chain of the hybrid-retrieval twins: rank tables
    ``a`` (BM25, :func:`bm25_topk_sql` verbatim), ``b`` (smooth-idf
    TF-IDF dot, mirroring :func:`tfidf_dot_topk`) and ``fused`` (the
    exact integer RRF contributions summed). Callers append their own
    final selection (the fusion entry ranks ``fused``; the quality
    report joins all three against qrels)."""
    bm25 = bm25_topk_sql(table, query_pred, k, id_col, text_col, max_df_frac)
    return rf"""a AS ({bm25}),
toks2 AS (
  SELECT {id_col} AS doc_id, t.term
  FROM {table},
       UNNEST(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
), tdc2 AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks2 GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS doc_freq FROM tdc2 GROUP BY term
), nn2 AS (SELECT count(DISTINCT doc_id) AS n FROM {table}),
wt AS (
  SELECT doc_id, term,
         CAST(round(round(tf * (ln((1 + n)::DOUBLE / (1 + doc_freq)) + 1.0), 6)
                    * {RRF_SCALE}, 0) AS BIGINT) AS wi
  FROM tdc2 JOIN dfreq USING (term) CROSS JOIN nn2
), qw AS (
  SELECT doc_id AS query_id, term, wi AS wq FROM wt
  WHERE {query_pred}
), dots AS (
  SELECT q.query_id, w.doc_id, sum(q.wq * w.wi) AS dot
  FROM qw q JOIN wt w ON w.term = q.term AND w.doc_id <> q.query_id
  GROUP BY q.query_id, w.doc_id
), b AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot DESC, doc_id ASC) AS rank
    FROM dots
  ) WHERE rank <= {k}
), contrib AS (
  SELECT query_id, doc_id, {RRF_SCALE} // ({k_rrf} + rank) AS c FROM a
  UNION ALL
  SELECT query_id, doc_id, {RRF_SCALE} // ({k_rrf} + rank) AS c FROM b
), fused AS (
  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro
  FROM contrib GROUP BY query_id, doc_id
)"""


def retrieval_quality_report(
    rank_tables: dict[str, DataFrame],
    qrels: DataFrame,
    panel: DataFrame,
) -> DataFrame:
    """Measured retrieval quality per ranker — the lexical mirror of the
    ANN tiers' recall/MRR gates (similarity.py::ann_recall_report):
    given (query_id, doc_id, rank) top-k tables, relevance labels
    ``qrels`` (query_id, rel_id), and the query ``panel`` (query_id),
    emit one row per ranker:

      (ranker, n_queries, n_rel, hits10, mrr_micro)

    hits10 counts (query, relevant) pairs retrieved in the top-k;
    recall@k = hits10 / n_rel is derivable exactly. mrr_micro is
    Σ_queries 1e6 div (first relevant rank) — the exact-integer MRR sum
    (a query with no relevant hit contributes 0), engine- and
    partition-invariant by construction. All metric joins are
    rank-table-sized (panel × k rows at most) — the corpus never
    re-enters."""
    if not rank_tables:
        raise ValueError("retrieval_quality_report requires >= 1 rank table")
    nq = panel.agg(F.count(F.lit(1)).alias("n_queries"))
    nr = qrels.agg(F.count(F.lit(1)).alias("n_rel"))
    rows = None
    for name, t in rank_tables.items():
        hit = t.join(
            qrels,
            (t.query_id == qrels.query_id) & (t.doc_id == qrels.rel_id),
        ).select(t.query_id.alias("qid"), "rank")
        hits = hit.agg(F.count(F.lit(1)).alias("hits10"))
        mrr = (
            hit.groupBy("qid")
            .agg(F.min("rank").alias("mr"))
            .agg(
                F.coalesce(
                    F.sum(F.expr(f"{RRF_SCALE} div mr")), F.lit(0)
                ).cast("bigint").alias("mrr_micro")
            )
        )
        row = (
            F.broadcast(nq)
            .crossJoin(F.broadcast(nr))
            .crossJoin(F.broadcast(hits))
            .crossJoin(F.broadcast(mrr))
            .select(
                F.lit(name).alias("ranker"),
                "n_queries", "n_rel", "hits10", "mrr_micro",
            )
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def prefix_qrels(
    docs: DataFrame,
    prefix_len: int = 120,
    panel_cap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Relevance labels from the corpus's OWN near-duplicate structure:
    documents sharing their first ``prefix_len`` chars form a group; the
    lowest id is the query, the rest are its relevant set (the
    duplicate-pair convention every dedup entry in the catalog uses).
    The panel is the ``panel_cap`` lowest query ids — a deterministic
    bound so the entry's cost stays panel-sized at every SF while the
    correctness SF uses (almost) every group. Returns (panel, qrels)."""
    pfx = docs.select(
        F.col(id_col).alias("doc_id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("pfx"),
    )
    groups = (
        pfx.groupBy("pfx")
        .agg(F.min("doc_id").alias("query_id"), F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
    )
    panel = groups.orderBy("query_id").limit(panel_cap).select("pfx", "query_id")
    qrels = (
        panel.join(pfx, "pfx")
        .where(F.col("doc_id") != F.col("query_id"))
        .select("query_id", F.col("doc_id").alias("rel_id"))
    )
    return panel.select("query_id"), qrels


def retrieval_quality_sql(
    table: str = "documents",
    prefix_len: int = 120,
    panel_cap: int = 32,
    k: int = 10,
    max_df_frac: float = 1.0,
    k_rrf: int = RRF_K,
) -> str:
    """DuckDB twin of the full quality report: the qrels CTEs mirror
    :func:`prefix_qrels`, the three rank tables come from
    :func:`_hybrid_ranks_sql` (BM25 / dot / fused — the same text the
    fusion entry replays), and the metric joins are the same exact
    integer arithmetic."""
    common = _hybrid_ranks_sql(
        table, "doc_id IN (SELECT query_id FROM panel)", k,
        "doc_id", "text", max_df_frac, k_rrf,
    )

    def metrics(name: str, rel: str) -> str:
        return f"""
  SELECT '{name}' AS ranker,
         (SELECT count(*) FROM panel) AS n_queries,
         (SELECT count(*) FROM qrels) AS n_rel,
         (SELECT count(*) FROM {rel} r
            JOIN qrels ON r.query_id = qrels.query_id
                      AND r.doc_id = qrels.rel_id) AS hits10,
         COALESCE((SELECT CAST(sum({RRF_SCALE} // mr) AS BIGINT) FROM (
            SELECT r.query_id, min(r.rank) AS mr FROM {rel} r
              JOIN qrels ON r.query_id = qrels.query_id
                        AND r.doc_id = qrels.rel_id
             GROUP BY r.query_id)), 0) AS mrr_micro"""

    return rf"""
WITH dpfx AS (
  SELECT doc_id, substr(text, 1, {prefix_len}) AS pfx FROM {table}
), grp AS (
  SELECT pfx, min(doc_id) AS query_id, count(*) AS c
  FROM dpfx GROUP BY pfx HAVING count(*) > 1
), panel0 AS (
  SELECT pfx, query_id FROM grp ORDER BY query_id LIMIT {panel_cap}
), panel AS (SELECT query_id FROM panel0),
qrels AS (
  SELECT p.query_id, d.doc_id AS rel_id
  FROM panel0 p JOIN dpfx d USING (pfx)
  WHERE d.doc_id <> p.query_id
),
{common},
f AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rrf_micro DESC, doc_id ASC) AS rank
    FROM fused
  ) WHERE rank <= {k}
)
SELECT * FROM ({metrics("bm25", "a")})
UNION ALL
SELECT * FROM ({metrics("rrf", "f")})
UNION ALL
SELECT * FROM ({metrics("tfidf", "b")})
"""


def rrf_fusion_sql(
    table: str = "documents",
    query_pred: str = "doc_id % 100 = 0",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 1.0,
    k_rrf: int = RRF_K,
) -> str:
    """DuckDB twin of BM25 ⊕ TF-IDF-dot reciprocal-rank fusion: the BM25
    ranking is :func:`bm25_topk_sql` verbatim as a CTE; the dot ranking
    mirrors :func:`tfidf_dot_topk`; fusion is the same integer div sum."""
    common = _hybrid_ranks_sql(
        table, query_pred, k, id_col, text_col, max_df_frac, k_rrf
    )
    return rf"""
WITH {common}
SELECT query_id, doc_id, rrf_micro, rank FROM (
  SELECT query_id, doc_id, rrf_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_micro DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""

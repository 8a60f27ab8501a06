"""Text-analysis operators for large-scale training-data pipelines, over the
``documents`` table (doc_id, text, lang, source, n_chars).

All hot-path expressions are built-in column functions (JVM codegen); nothing
here drops to Python. Each operator has an ANSI-SQL twin in the query catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.exactround import (
    dratio,
    dratio_sql,
    dratio_unscaled,
    dratio_unscaled_sql,
)

#: Tiny per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic. The testdata 'text' is synthetic word soup; markers chosen from
#: common function words so the heuristic is well-defined on any corpus.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "y", "las"),
}

STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"] + ("a", "is", "for", "on", "with")


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the baseline tokenizer)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish proxy: count word + digit-run + punctuation-run pieces.

    Regex-split on boundaries: each run of letters, digits, or single
    punctuation counts as one piece — a deterministic stand-in for a real BPE
    vocab (which would be a pandas_udf over a merges table).
    """
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def marker_hits(col: Column | str, markers: tuple[str, ...]) -> Column:
    """How many tokens of ``col`` are in the marker set."""
    t = tokens(col)
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(t, lambda x: F.array_contains(arr, F.lower(x))))


def lang_id(col: Column | str) -> Column:
    """Argmax over per-language marker-hit counts; 'und' when all zero.
    Deterministic tiebreak: language order en > de > fr > es."""
    hit_cols = {lang: marker_hits(col, m) for lang, m in LANG_MARKERS.items()}
    best = None
    best_lang = F.lit("und")
    for lang in LANG_MARKERS:  # insertion order = tiebreak priority
        h = hit_cols[lang]
        if best is None:
            best, best_lang = h, F.when(h > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when(h > best, F.lit(lang)).otherwise(best_lang)
            best = F.greatest(best, h)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token stats, punctuation and
    stopword ratios, plus a composite [0,1] quality score (length-normalized,
    stopword-weighted — the C4/Gopher-style cheap filters)."""
    c = F.col(text_col)
    ntok = token_count(c)
    nchar = F.length(c)
    npunct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    nstop = marker_hits(c, STOPWORDS)
    return df.select(
        "doc_id",
        ntok.alias("n_tokens"),
        nchar.alias("n_chars2"),
        dratio(npunct, F.greatest(nchar, F.lit(1)), 6).alias("punct_ratio"),
        dratio(nstop, F.greatest(ntok, F.lit(1)), 6).alias("stopword_ratio"),
        # chars net of single separators; exact integer ratio
        dratio(nchar - (ntok - F.lit(1)), ntok, 6).alias("mean_token_len"),
    )


def bigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained bigram language-model score per document: add-1
    smoothed mean transition probability avg((c(w1,w2)+1)/(c(w1)+V)) over the
    document's bigrams — the classic cheap fluency/quality signal for
    training-data filtering (documents full of never-seen transitions score
    near 1/V).

    Deliberately probability-mean rather than log-likelihood: quotients of
    integers are IEEE-exact and identical across engines, while ln() differs
    between libm implementations — so the entry stays value-hash-checkable
    against the DuckDB twin. Each term is kept as its exact HALF_UP scale-9
    integer numerator (functions/exactround.py) and summed exactly; no
    double is ever rounded (round-11 .xx5-class sweep).

    UNIT FIX (round 11, documented r12 per ADVICE): ``avg_transition_p``
    is now the actual mean transition probability — the scale-9 integer
    terms are divided by count*1e9, not count*1e3 as before round 11,
    which had inflated the published value by 1e6. Both the Spark side
    and the DuckDB twin changed together (parity held throughout), but
    any external consumer of this catalog entry sees the value drop by
    10^6 — that is the unit correction, not a regression.

    Plan shape: one explode, two hash aggregations over the bigram stream
    (map-side partial), two shuffle joins back on (w1[,w2]) — the count
    tables are corpus-vocabulary-sized, far smaller than the token stream —
    and the vocabulary scalar broadcasts. Everything is codegen'd column
    expressions; no Python. Documents with < 2 tokens have no bigrams and
    are absent from the output (documented join semantics)."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("pos", "tok"),
        )
        .where(F.col("tok") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    # The bigram stream feeds three consumers (c2, c1, the score join):
    # materialize it once instead of re-exploding the corpus three times
    # (same policy as the MinHash signature table; at cluster scale this is
    # a persisted intermediate table).
    big = (
        toks.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .localCheckpoint()
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.agg(F.countDistinct("tok").alias("vocab"))
    # each term is the exact HALF_UP scale-9 numerator r9 =
    # round((c2+1)/(c1+V), 9)*1e9 — an integer, summed exactly; the final
    # mean is one more exact ratio (round-11 .xx5-class sweep: no double
    # is ever rounded)
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            dratio_unscaled(
                F.col("c2") + F.lit(1), F.col("c1") + F.col("vocab"), 9
            ).alias("r9"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        dratio(
            F.sum("r9"),
            F.count(F.lit(1)).cast("decimal(38,0)") * F.lit(1_000_000_000),
            6,
        ).alias("avg_transition_p"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document: total / distinct
    word-bigram counts, the most frequent bigram's count, the duplicate-
    bigram fraction (1 - distinct/total) and the top-bigram fraction — the
    standard "repeated boilerplate" filters of a pre-training quality pass.

    Shape: codegen'd bigram rows (functions/hashing.py shingle_rows,
    duplicates KEPT — frequency is the signal here) → count per (doc,
    bigram) → per-doc aggregate. Two key-local shuffles, no joins; partial
    aggregation makes the first combine map-side, so the exchange carries
    (doc, bigram, count), not raw bigrams. Docs with < 2 tokens have no
    bigrams and are absent. Ratios are exact integer division at 1e-6
    (value-hashable against the SQL oracle).
    """
    from fdp_dynamically_controlled_streams_spark.functions.hashing import shingle_rows

    per_bigram = (
        shingle_rows(df, id_col, text_col, n=2)
        .groupBy("id", "s")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_bigram.groupBy(F.col("id").alias(id_col))
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
            F.max("c").alias("top_count"),
        )
        .select(
            id_col,
            "n_bigrams",
            "n_distinct_bigrams",
            "top_count",
            (
                F.expr("(n_bigrams - n_distinct_bigrams) * 1000000 div n_bigrams")
                / F.lit(1000000.0)
            ).alias("dup_bigram_fraction"),
            (F.expr("top_count * 1000000 div n_bigrams") / F.lit(1000000.0)).alias(
                "top_bigram_fraction"
            ),
        )
    )


def local_min_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    radius: int = 3,
) -> DataFrame:
    """Content-defined document fingerprints: hash every character k-gram of
    the normalized text, keep positions whose hash is the MINIMUM within
    ``radius`` positions either side — the local-minima selection rule of
    content-defined chunking (winnowing family). Selection depends only on
    content, so edits perturb fingerprints locally, never globally; expected
    density is 1/(2*radius+1) of positions (no hard gap bound — that extra
    guarantee requires sequential per-window winnowing, which is what the
    selection trades away to stay a pure window expression).

    Output: one row per selected position (doc_id, pos, fingerprint) —
    sub-document granularity for plagiarism/copy detection, where the
    whole-doc :func:`fingerprint` only answers exact-duplicate questions.

    Shape: the normalized text is MATERIALIZED once per doc behind a
    repartition barrier before the k-gram explode — without it Catalyst's
    project-collapse inlines ``lower(trim(text))`` into every gram row
    (measured 6.7× slower at sf0.1: the per-gram renormalization of the
    whole document dominates the md5s). The barrier shuffles one copy of
    the normalized corpus — at 100 TB that is the same bytes a staging
    write would move, and the per-doc window exchange downstream carries
    only (id, pos, h). Docs shorter than k yield no rows.
    """
    from pyspark.sql import Window

    from fdp_dynamically_controlled_streams_spark.functions.hashing import (
        portable_hash64,
    )

    staged = df.select(
        F.col(id_col), F.lower(F.trim(F.col(text_col))).alias("_t")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    n_grams = F.length("_t") - F.lit(k - 1)
    # Guard the degenerate doc: Spark's sequence(1, 0) counts DOWN ([1, 0]),
    # it is not empty — docs shorter than k must yield no gram rows.
    positions = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    grams = staged.select(
        F.col(id_col),
        F.col("_t"),
        F.posexplode(positions).alias("_i", "pos"),
    ).select(
        id_col,
        "pos",
        portable_hash64(F.substring(F.col("_t"), F.col("pos"), k)).alias("h"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-radius, radius)
    )
    return (
        grams.withColumn("_m", F.min("h").over(w))
        .where(F.col("h") == F.col("_m"))
        .select(id_col, "pos", F.col("h").alias("fingerprint"))
    )


def local_min_fingerprints_sql(
    table: str = "documents", k: int = 5, radius: int = 3
) -> str:
    """DuckDB twin of :func:`local_min_fingerprints` (identical frame)."""
    from fdp_dynamically_controlled_streams_spark.functions.hashing import (
        portable_hash64_sql,
    )

    h = portable_hash64_sql(f"substr(t, pos, {k})")
    return f"""
WITH norm AS (SELECT doc_id, lower(trim(text)) AS t FROM {table}),
grams AS (
  SELECT doc_id, pos, {h} AS h
    FROM (SELECT doc_id, t,
                 unnest(range(1, greatest(length(t) - {k - 1}, 0) + 1)) AS pos
            FROM norm)
)
SELECT doc_id, CAST(pos AS INT) AS pos, h AS fingerprint
  FROM (SELECT doc_id, pos, h,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN {radius} PRECEDING AND {radius} FOLLOWING)
                   AS m
          FROM grams)
 WHERE h = m
"""


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token multiset — the cheap exact-dup key that survives token reordering.
    (A true rolling/winnowing hash variant lives in dedup.simhash.)"""
    t = F.array_sort(F.array_distinct(tokens(F.lower(F.col(col) if isinstance(col, str) else col))))
    return F.md5(F.array_join(t, " "))


def token_entropy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Shannon entropy of each document's token distribution — the
    classic diversity/quality signal (near-zero entropy = degenerate
    repetition, complements repetition_stats' exact ratios).

    Shape: token explode (map-side generate) → ONE (doc, token) count
    shuffle with map-side combine → per-doc window total + entropy sum —
    the second aggregation rides the same doc-key partitioning. Entropy
    terms are double ln() sums rounded at 1e-6 (established PSI
    convention). Docs with no tokens are absent (nothing to measure)."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t")
    ).where(F.col("t") != "")
    cnt = tok.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(id_col)
    p = F.col("c").cast("double") / F.sum("c").over(w).cast("double")
    return (
        cnt.select(F.col(id_col), F.sum("c").over(w).alias("n_tokens"), (-p * F.log(p)).alias("_term"))
        .groupBy(id_col, "n_tokens")
        .agg(F.round(F.sum("_term"), 6).alias("token_entropy"))
        .select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"), "token_entropy")
    )


def token_entropy_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    r"""DuckDB twin of :func:`token_entropy` (same \s+ split convention as
    text_token_stats)."""
    return rf"""
WITH tok AS (
  SELECT {id_col}, unnest(string_split_regex(trim({text_col}), '\s+')) AS t
  FROM {table}
), cnt AS (
  SELECT {id_col}, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2
), terms AS (
  SELECT {id_col}, c, sum(c) OVER (PARTITION BY {id_col}) AS n FROM cnt
)
SELECT {id_col}, CAST(max(n) AS BIGINT) AS n_tokens,
       round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 6)
         AS token_entropy
FROM terms GROUP BY {id_col}
"""

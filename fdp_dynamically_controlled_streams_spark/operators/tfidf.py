"""Vocabulary building and TF-IDF weighting over a document table.

Training-data pipelines need corpus statistics: a bounded vocabulary (top-K
terms by document frequency) for tokenizer/feature work, and TF-IDF weights
for relevance filtering and near-dup triage. The reference has no text
surface at all (SURVEY §2.7) — charter extension, same tokenization as
operators/text.py (lowercase, split on non-alphanumeric) so every text
operator agrees on what a "term" is.

Shapes at scale:

* ``term_doc_counts`` — explode tokens once, aggregate (term, doc) term
  frequency: one Expand-free explode + one shuffle on (term, doc_id) with
  map-side combine.
* ``vocabulary`` — document frequency per term + global rank. The rank is a
  single ORDER BY LIMIT K over the aggregated term table (|terms| rows, not
  |tokens|): Spark plans TakeOrderedAndProject — a per-partition top-K then
  a K-sized merge on one reducer, never a full sort of the term table.
* ``tfidf`` — tf × smooth-idf join. The document-frequency side is
  vocabulary-sized; it broadcasts (dimension rule, SCALE.md rule 2). The
  doc count N is computed ON the df table (exact, cheap) instead of a
  second pass over the corpus.

Determinism: ties in vocabulary rank break on the term string; idf uses the
smooth form ln((1+N)/(1+df)) + 1 so df = N terms keep a positive weight;
weights are rounded to 6 decimals for cross-engine hash stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(df: DataFrame, text_col: str, doc_id: str) -> DataFrame:
    """(doc_id, term) rows: lowercase, split on non-alphanumeric, drop empty
    tokens (leading/trailing separators produce '' entries)."""
    return (
        df.select(
            F.col(doc_id).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
        )
        .where(F.col("term") != "")
    )


def term_doc_counts(df: DataFrame, text_col: str, doc_id: str) -> DataFrame:
    """(doc_id, term, tf): term frequency within each document."""
    return tokens(df, text_col, doc_id).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def vocabulary(
    df: DataFrame, text_col: str, doc_id: str, top_k: int = 1000
) -> DataFrame:
    """Top-``top_k`` terms by document frequency (ties → lexicographic):
    (term, doc_freq, total_tf, rank). Rank is computed by ordered LIMIT
    (TakeOrderedAndProject), not a global window sort."""
    per_term = (
        term_doc_counts(df, text_col, doc_id)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("tf").alias("total_tf"),
        )
    )
    top = per_term.orderBy(F.desc("doc_freq"), F.asc("term")).limit(top_k)
    # rank over K rows only (K ~ 10^3): trivially cheap regardless of corpus
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("doc_freq"), F.asc("term"))
    return top.withColumn("rank", F.row_number().over(w))


def tfidf(df: DataFrame, text_col: str, doc_id: str) -> DataFrame:
    """(doc_id, term, tf, weight): weight = tf × (ln((1+N)/(1+doc_freq)) + 1),
    rounded to 6 decimals. The df table is term-cardinality-sized and joins
    broadcast; N rides along as a scalar aggregate of that same table (no
    second corpus pass)."""
    tdc = term_doc_counts(df, text_col, doc_id)
    docfreq = tdc.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count_distinct(F.col(doc_id)).alias("n"))
    joined = tdc.join(F.broadcast(docfreq), "term").crossJoin(
        F.broadcast(n_docs)
    )
    weight = F.round(
        F.col("tf")
        * (F.log((1 + F.col("n")) / (1 + F.col("doc_freq"))) + F.lit(1.0)),
        6,
    )
    return joined.select("doc_id", "term", "tf", weight.alias("weight"))

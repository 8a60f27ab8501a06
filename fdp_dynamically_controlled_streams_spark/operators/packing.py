"""Training-sequence shaping: token-stream packing and overlapped chunking.

LLM pre-training consumes documents as a concatenated token stream cut into
fixed-size context windows (GPT-style "packing"), and retrieval/embedding
pipelines consume documents as overlapping fixed-size chunks. Neither exists
in the reference (its only payloads are two-field sensor structs,
protobufs/src/main/protobuf/messages.proto:18-29); both are charter
extensions, built Spark-first:

**pack_token_stream** — deterministic offset packing. Documents are sharded
by ``doc_id % n_shards`` (each shard is an independent token stream, so the
operator parallelizes without a global order), ordered by id within the
shard, and assigned the byte-stream interval ``[start, start+n_tokens)``
via one running-sum window. The context window (pack) of a document is
``floor(start / budget)``; ``straddles`` marks documents cut by a pack
boundary — exactly the concatenate-then-cut semantics of GPT-style
training-data prep, computed without materializing the stream. One shuffle
(by shard), exact BIGINT arithmetic, output is input-row-sized.

**chunk_text** — overlapping token-window chunks. Tokenize once (same
``[^a-z0-9]+`` split as operators/tfidf.py so all text operators agree on
terms), generate chunk start offsets executor-side with ``sequence`` +
``explode`` (stride = size - overlap; never a driver loop), slice the token
array per offset. Zero shuffles — fully narrow, chunk rows are produced
inside the scan stage.

Scale: packing's window sorts within shards only — shard count is the
parallelism knob and no shard needs the whole dataset; chunking is
embarrassingly parallel. Neither collects anything to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.tfidf import TOKEN_SPLIT


def token_count(text_col: str) -> F.Column:
    """Number of TOKEN_SPLIT tokens in ``text_col`` (empty strings dropped),
    as a codegen'd column expression — no UDF."""
    return F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != F.lit("")
        )
    ).cast("bigint")


def pack_token_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Assign each document its interval in a concatenated per-shard token
    stream cut every ``budget`` tokens.

    Returns (id_col, shard, n_tokens, start_offset, pack_id, straddles):
    ``pack_id`` is the context window containing the document's first token;
    ``straddles`` is true iff the document crosses a window boundary (its
    tokens land in more than one pack). Empty documents occupy zero width
    and never straddle.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = (F.col(id_col) % F.lit(n_shards)).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = df.select(
        F.col(id_col), shard.alias("shard"), token_count(text_col).alias("n_tokens")
    )
    end = F.sum("n_tokens").over(w)
    start = (end - F.col("n_tokens")).alias("start_offset")
    pack = F.floor(start / F.lit(budget)).alias("pack_id")
    return sized.select(
        id_col,
        "shard",
        "n_tokens",
        start,
        pack,
        (
            (F.col("n_tokens") > 0)
            & (F.floor((end - F.lit(1)) / F.lit(budget)) > pack)
        ).alias("straddles"),
    )


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    overlap: int = 0,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks of up to
    ``size`` tokens with stride ``size - overlap``.

    Returns (id_col, chunk_id, start_token, n_chunk_tokens, chunk_text);
    every token index < n_tokens starts at least one chunk row, the final
    chunk may be short, and documents with zero tokens emit no rows.
    """
    if size <= 0 or not 0 <= overlap < size:
        raise ValueError("need size > 0 and 0 <= overlap < size")
    stride = size - overlap
    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != F.lit("")
        ).alias("__toks"),
    ).where(F.size("__toks") > 0)
    starts = F.sequence(
        F.lit(0), F.size("__toks") - F.lit(1), F.lit(stride)
    ).alias("__starts")
    return (
        toks.select(id_col, "__toks", F.posexplode(starts).alias("chunk_id", "__s"))
        .select(
            id_col,
            "chunk_id",
            F.col("__s").cast("bigint").alias("start_token"),
            F.least(F.lit(size), F.size("__toks") - F.col("__s"))
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.concat_ws(
                " ", F.slice("__toks", F.col("__s") + F.lit(1), F.lit(size))
            ).alias("chunk_text"),
        )
    )

"""Document chunking and sequence packing — the reshaping operators of an
LLM training-data pipeline (context-window-bounded chunks; contiguous
packing of short documents into fixed-token bins).

Both are pure built-in expressions: chunking is a bound-words projection +
one explode (same CollapseProject discipline as ``operators.dedup``);
packing is a running-sum window — no driver loops, no UDFs, so both run at
scan speed over any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into whitespace-token chunks of ``chunk_tokens``
    with ``overlap`` tokens of context carried between consecutive chunks.

    Output: (id, chunk_id ordinal from 0, chunk_text, n_tokens). The last
    chunk may be short; empty documents produce no chunks. Chunk starts
    step by ``chunk_tokens - overlap``.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    bound = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != ""
        ).alias("__words"),
    )
    words = F.col("__words")
    n = F.size(words)
    n_chunks = F.when(n <= 0, 0).otherwise(
        F.ceil((F.greatest(n - overlap, F.lit(1))) / F.lit(step)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.struct(
            c.cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(words, c * step + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(n - c * step, F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )
    return (
        bound.where(n > 0)
        .select(id_col, F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_id", "c.chunk_text", "c.n_tokens")
    )


def pack_documents(
    df: DataFrame,
    bin_tokens: int = 2048,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """Stream sequence packing: documents are concatenated in ``order_col``
    order (default: id) into one token stream that is cut every
    ``bin_tokens`` tokens — exactly how LLM pretraining packs sequences, with
    document boundaries allowed to straddle a cut.

    Returns df + ``stream_pos`` (global token position of the document's
    first token), ``bin_id`` (the bin containing that first token) and
    ``bin_offset`` (position within that bin). Closed-form from one
    running-sum window — greedy bin-filling (no straddling) would need
    per-row sequential state and is the streaming variant's job.

    The global window is a single-partition sort at this grain — fine for
    per-shard packing (call per date/source partition); for whole-corpus
    packing pass a pre-assigned shard column as ``order_col``'s partition
    via ``df.repartitionByRange``.
    """
    order = F.col(order_col or id_col).asc()
    w = W.orderBy(order).rowsBetween(W.unboundedPreceding, W.currentRow)
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    return (
        df.withColumn("stream_pos", start)
        .withColumn("bin_id", F.floor(F.col("stream_pos") / bin_tokens).cast("long"))
        .withColumn(
            "bin_offset",
            (F.col("stream_pos") - F.col("bin_id") * bin_tokens).cast("long"),
        )
    )

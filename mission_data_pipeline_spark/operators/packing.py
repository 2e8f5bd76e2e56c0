"""Token-budget sequence packing — training-batch construction.

LLM pre-training packs documents into fixed-budget rows (e.g. "fill 4k
tokens per sample"). This operator implements the deterministic greedy
variant that keeps documents whole: walk documents in a stable order,
accumulate token counts, and start a new pack whenever the running
total would cross the budget boundary.

Bucket assignment is ``floor(tokens_before_this_doc / budget)`` over an
ordered running sum — documents aren't split, so a pack may exceed the
budget by at most one document (the standard greedy-packing bound).
The running sum is one window per shard: pack within explicit
``shard_cols`` (source file, date bucket, hash shard) so each shard
sorts independently — exactly how per-worker packing shards a 100 TB
corpus; a global order would serialize into one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_budget(
    docs: DataFrame,
    budget: int,
    *,
    token_col: str = "n_tokens",
    order_cols: list[str] | None = None,
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each document a ``pack_id`` under a per-shard token budget.

    Adds ``pack_id`` (0-based within shard) and ``pack_offset`` (tokens
    before this document inside its pack's budget space). Deterministic
    given stable ``order_cols``. A document longer than the budget
    spans multiple boundaries and consumes the skipped pack ids — the
    windowable boundary-bucket formulation; a strict reset-accumulator
    greedy is a sequential recurrence (``applyInPandas`` per shard) that
    buys ≤1 doc of fill difference per pack.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    order = order_cols or ["doc_id"]
    shards = shard_cols or []
    w = (
        Window.partitionBy(*shards)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    before = cum - F.col(token_col)
    pack_id = F.floor(before / budget)
    return docs.withColumn("pack_id", pack_id).withColumn(
        "pack_offset", before - pack_id * budget
    )


def pack_stats(
    packed: DataFrame,
    *,
    token_col: str = "n_tokens",
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Per-pack accounting: document count, token total, budget fill.

    ``token_col`` mirrors :func:`pack_token_budget`'s parameter so the
    pair works on any column name.
    """
    shards = shard_cols or []
    return packed.groupBy(*shards, "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).alias("total_tokens"),
    )


def chunk_tokens(
    docs: DataFrame,
    *,
    size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token training chunks with overlap —
    the context-window chunking step that feeds tokenize/pack when
    documents exceed the model's sequence length (stride =
    ``size - overlap``; the final chunk keeps the tail and may be
    short, but a tail fully contained in the previous chunk is never
    emitted). Returns ``(doc_id, chunk_id, n_tokens, chunk_text)``.

    Complementary to :func:`pack_token_budget`: packing combines short
    documents up to a budget; chunking splits long ones down to it.

    Scale shape: zero shuffle — tokenize, a per-document ``sequence()``
    of chunk starts, one explode, and a ``slice`` per chunk, all
    expression-only and riding the scan. Chunk count per doc is
    ``ceil((n_tokens - overlap) / stride)``, data-derived, never
    driver-side.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(f"overlap must be in [0, size), got {overlap}")
    stride = size - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).filter(F.size("__toks") > 0)
    # Cap the last start so a chunk is emitted only if it contains at
    # least one token the previous chunk didn't (start <= n - overlap - 1);
    # otherwise a short tail chunk fully contained in its predecessor
    # would duplicate training text. Yields exactly
    # ceil((n_tokens - overlap) / stride) chunks for n_tokens > overlap.
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("__toks") - (overlap + 1), F.lit(0)),
        F.lit(stride),
    )
    d = d.select(
        "doc_id",
        "__toks",
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, size)
    return d.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )

"""Sequence packing: assign documents to fixed-token-budget training
chunks (the GPT-style "concatenate and slice every ``budget`` tokens"
layout, public since Radford et al. 2019 / Brown et al. 2020).

Semantics — deterministic concat-and-chunk per group: documents are
laid out in ``id_col`` order within each ``group_col`` (shard), token
offsets accumulate, and a document's chunk is ``floor(start_offset /
budget)``. Documents may straddle a chunk boundary (``spans_boundary``);
a no-split packer would instead open a new chunk, but that greedy
recurrence is order-sequential and not window-expressible — and real
LLM pipelines slice, padding-free, so this is both the faster and the
more faithful semantic.

Scale shape: ONE window (partitioned by the shard key, ordered by id)
— a single hash-partition shuffle on ``group_col`` then a sorted
partition-local cumulative sum. No per-token work ever materializes:
the engine manipulates offsets, not token arrays, so packing 10^12
sequences moves only (group, id, n_tok) through the exchange. Shards
are the natural parallelism unit; a skewed shard is re-shardable
upstream (salting the group key re-shards deterministically).

Window functions over an explicit partition key are exactly
ANSI-SQL-expressible, so the DuckDB oracle verifies every offset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "packing_summary"]


def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-document chunk assignment under a fixed token ``budget``.

    Returns ``(group, id, n_tok, start_offset, chunk_id, spans_boundary)``
    where ``start_offset`` is the document's first token position in its
    group's concatenated stream and ``chunk_id = start_offset // budget``.
    NULL ``n_tok`` rows are excluded (run the missingness check first —
    a NULL length has no defined position in the stream).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(n_tok_col).cast("bigint")
    return (
        df.filter(F.col(n_tok_col).isNotNull())
        .select(group_col, id_col, n.alias("n_tok"))
        .withColumn("start_offset", F.sum("n_tok").over(w) - F.col("n_tok"))
        .withColumn("chunk_id", (F.col("start_offset") / budget).cast("bigint"))
        .withColumn(
            "spans_boundary",
            # the LAST token's chunk differs from the first token's chunk
            ((F.col("start_offset") + F.col("n_tok") - 1) / budget).cast(
                "bigint"
            )
            > F.col("chunk_id"),
        )
    )


def packing_summary(
    df: DataFrame,
    *,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-group packing report: chunk count, boundary-straddling docs,
    and fill rate of the last (ragged) chunk's budget. One window pass
    + one hash aggregate on the same key — the window's partitioning is
    reused by the groupBy, so the plan has a single exchange."""
    packed = pack_sequences(
        df,
        budget=budget,
        group_col=group_col,
        id_col=id_col,
        n_tok_col=n_tok_col,
    )
    n_chunks = F.ceil(F.sum("n_tok") / F.lit(float(budget))).cast("bigint")
    return packed.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        # the stream is sliced every `budget` tokens, so the chunk count
        # is ceil(total/budget) — NOT max(start chunk)+1, which misses a
        # final chunk fed only by a straddling doc's tail
        n_chunks.alias("n_chunks"),
        F.sum(F.when(F.col("spans_boundary"), 1).otherwise(0)).alias(
            "n_spanning_docs"
        ),
        F.round(
            F.sum("n_tok").cast("double") / (n_chunks * budget), 6
        ).alias("fill_rate"),
    )

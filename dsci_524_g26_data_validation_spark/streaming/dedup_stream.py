"""Streaming ingest deduplication — the continuous counterpart of
``operators.dedup.deduplicate_exact``.

A training-data ingest stream re-delivers documents (at-least-once
sources, crawler re-fetches, upstream retries); deduplicating at ingest
keeps every downstream consumer exactly-once WITHOUT a giant batch dedup
later. Two Spark-native shapes:

* :func:`deduplicate_stream` — key dedup via
  ``dropDuplicatesWithinWatermark``: keeps the FIRST arrival of each key;
  state is bounded by the event-time watermark (a key's state expires
  ``delay`` after its event time passes), which is the only
  state-bounded contract possible on an unbounded stream. Exact within
  the horizon; re-deliveries later than the watermark are the
  batch layer's job (the standard lambda/kappa split).
* :func:`deduplicate_stream_by_content` — same, keyed on a sha2-256
  content digest computed in Catalyst, for sources without stable ids.

Both are pure plan transformations (no action, no foreachBatch): attach
them between ``readStream`` and any sink/validation downstream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["deduplicate_stream", "deduplicate_stream_by_content"]


def deduplicate_stream(
    stream_df: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    time_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per ``id_cols`` within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` stores one state entry per key
    seen inside the horizon and drops it when the watermark passes the
    key's event time — bounded state on an unbounded stream (a plain
    ``dropDuplicates`` on a stream grows state forever). The shuffle
    carries the full surviving rows once, keyed by the id columns —
    same key-partitioned shape as any streaming aggregation.
    """
    return stream_df.withWatermark(
        time_col, watermark_delay
    ).dropDuplicatesWithinWatermark(list(id_cols))


def deduplicate_stream_by_content(
    stream_df: DataFrame,
    *,
    content_cols: Sequence[str] = ("text",),
    time_col: str = "ts",
    watermark_delay: str = "1 hour",
    digest_col: str = "content_digest",
) -> DataFrame:
    """Content-hash streaming dedup for id-less sources: sha2-256 over
    ``content_cols`` (Catalyst, collision-safe at any scale,
    NULL-distinct — same digest as batch ``dedup.content_digest_expr``,
    so batch and stream agree on what "identical content" means) becomes
    the dedup key; the digest column is kept in the output for lineage."""
    from ..operators.dedup import content_digest_expr

    digest = content_digest_expr(content_cols)
    return (
        stream_df.withColumn(digest_col, digest)
        .withWatermark(time_col, watermark_delay)
        .dropDuplicatesWithinWatermark([digest_col])
    )

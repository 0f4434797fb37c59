"""Structured Streaming surface of the validation engine."""

from .dedup_stream import deduplicate_stream, deduplicate_stream_by_content
from .validate_stream import (
    BatchVerdict,
    validate_each_batch,
    violation_counts_stream,
    violation_running_totals,
)

__all__ = [
    "BatchVerdict",
    "deduplicate_stream",
    "deduplicate_stream_by_content",
    "validate_each_batch",
    "violation_counts_stream",
    "violation_running_totals",
]

"""Structured Streaming surface of the validation engine."""

from .dedup_stream import deduplicate_stream, deduplicate_stream_by_content
from .validate_stream import (
    BatchVerdict,
    category_drift_stream,
    histogram_drift_stream,
    validate_each_batch,
    json_violation_counts_stream,
    violation_counts_stream,
    violation_running_totals,
)

__all__ = [
    "BatchVerdict",
    "category_drift_stream",
    "histogram_drift_stream",
    "deduplicate_stream",
    "deduplicate_stream_by_content",
    "validate_each_batch",
    "violation_counts_stream",
    "json_violation_counts_stream",
    "violation_running_totals",
]

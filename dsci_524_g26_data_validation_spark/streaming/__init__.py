"""Structured Streaming surface of the validation engine."""

from .validate_stream import (
    BatchVerdict,
    validate_each_batch,
    violation_counts_stream,
    violation_running_totals,
)

__all__ = [
    "BatchVerdict",
    "validate_each_batch",
    "violation_counts_stream",
    "violation_running_totals",
]

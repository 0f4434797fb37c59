"""summarize_violations: rank and aggregate validation issues.

Reference semantics (/root/reference/src/pyos_data_validation/
summarize_violations.py:190-255) reproduced exactly:

* default weights missing_column:10, extra_column:8, dtype:7, range:5,
  category:5, missingness:3; a custom dict REPLACES the defaults
  entirely; unknown kinds weigh 1;
* sort key (−weight, column-None-first-then-asc, kind asc), stable sort
  so original order is the final tiebreak (pinned by the reference's
  test_summarize_violations.py:264-299,635-659);
* counts_by_kind covers ALL issues, not just the top-k
  (test_summarize_violations.py:87-107);
* all TypeError/ValueError input-validation paths.

The in-memory path is driver-only (issue lists are small). For
engine-scale violation DataFrames, ``summarize_violations_df`` runs the
same ranking distributed: groupBy(kind).count() for the counts and
orderBy + limit — Spark plans the latter as TakeOrderedAndProject (top-k
without a full sort).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from typing import Dict, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import Issue, Summary, ValidationResult

__all__ = [
    "summarize_violations",
    "summarize_violations_df",
    "summarize_violations_distributed",
    "DistributedSummary",
    "DEFAULT_WEIGHTS",
]

DEFAULT_WEIGHTS: Dict[str, float] = {
    "missing_column": 10,
    "extra_column": 8,
    "dtype": 7,
    "range": 5,
    "category": 5,
    "missingness": 3,
}


def _check_inputs(
    result: ValidationResult,
    top_k: int,
    weights: Optional[Dict[str, Union[int, float]]],
) -> None:
    if not isinstance(result, ValidationResult):
        raise TypeError("result must be a ValidationResult instance")
    if not isinstance(top_k, int):
        raise TypeError("top_k must be an integer")
    if top_k <= 0:
        raise ValueError("top_k must be a positive integer")
    if weights is not None:
        if not isinstance(weights, dict):
            raise TypeError("weights must be a dict or None")
        for kind, weight in weights.items():
            if not isinstance(weight, (int, float)):
                raise ValueError(
                    f"Weight for '{kind}' must be numeric, got {type(weight).__name__}"
                )
            if weight <= 0:
                raise ValueError(f"Weight for '{kind}' must be positive, got {weight}")


def _sort_key(weights: Dict[str, Union[int, float]]):
    def key(issue: Issue):
        weight = weights.get(issue.kind, 1)
        column_sort = (False, "") if issue.column is None else (True, issue.column)
        return (-weight, column_sort, issue.kind)

    return key


def summarize_violations(
    result: ValidationResult,
    *,
    top_k: int = 5,
    weights: Optional[Dict[str, Union[int, float]]] = None,
) -> Summary:
    """Convert a ValidationResult into a ranked Summary."""
    _check_inputs(result, top_k, weights)
    weights_to_use = DEFAULT_WEIGHTS if weights is None else weights

    if not result.issues:
        return Summary(ok=result.ok, top_issues=[], counts_by_kind={})

    counts_by_kind = dict(Counter(issue.kind for issue in result.issues))
    sorted_issues = sorted(result.issues, key=_sort_key(weights_to_use))
    return Summary(
        ok=result.ok,
        top_issues=sorted_issues[:top_k],
        counts_by_kind=counts_by_kind,
    )


def summarize_violations_df(
    violations: DataFrame,
    *,
    top_k: int = 5,
    weights: Optional[Dict[str, Union[int, float]]] = None,
) -> DataFrame:
    """Distributed ranking over a violations DataFrame (kind, column, ...).

    Same weight/tiebreak semantics as the in-memory path;
    ``asc_nulls_first("column")`` reproduces the column-is-None-first rule.
    orderBy().limit() compiles to TakeOrderedAndProject — a per-partition
    top-k plus a k-row merge, never a full shuffle sort, so it scales to
    billions of violation rows.
    """
    weights_to_use = DEFAULT_WEIGHTS if weights is None else dict(weights)
    mapping = F.create_map(
        *[F.lit(x) for kv in weights_to_use.items() for x in kv]
    )
    weighted = violations.withColumn(
        "weight", F.coalesce(mapping[F.col("kind")], F.lit(1.0)).cast("double")
    )
    return weighted.orderBy(
        F.desc("weight"), F.asc_nulls_first("column"), F.asc("kind")
    ).limit(top_k)


@dataclass(frozen=True)
class DistributedSummary:
    """Distributed mirror of :class:`~..types.Summary` (M3+M5 at scale).

    ``top_issues_df`` is the weighted top-k (TakeOrderedAndProject);
    ``counts_by_kind_df`` is the full ``groupBy(kind).count()`` over ALL
    violations (kind, n) — the reference's counts-include-everything rule
    (test_summarize_violations.py:87-107) as a hash aggregate. Both are
    lazy DataFrames; :meth:`to_summary` collects them (k rows + #kinds
    rows — always tiny) into the in-memory Summary shape.
    """

    top_issues_df: DataFrame
    counts_by_kind_df: DataFrame

    def to_summary(self) -> Summary:
        counts = {
            r["kind"]: int(r["n"]) for r in self.counts_by_kind_df.collect()
        }
        issues = []
        for r in self.top_issues_df.collect():
            d = r.asDict()
            issues.append(
                Issue(
                    kind=d["kind"],
                    message=str(d.get("message", "")),
                    column=d.get("column"),
                    observed=d.get("observed"),
                    expected=d.get("expected"),
                )
            )
        return Summary(
            ok=sum(counts.values()) == 0,
            top_issues=issues,
            counts_by_kind=counts,
        )


def summarize_violations_distributed(
    violations: DataFrame,
    *,
    top_k: int = 5,
    weights: Optional[Dict[str, Union[int, float]]] = None,
) -> DistributedSummary:
    """Full Summary semantics over a violations DataFrame at any scale.

    Two independent lazy plans over the same input: the weighted top-k
    (M4/M5, per-partition heaps + k-row merge) and counts_by_kind over
    ALL issues (M3, partial+final hash aggregate — one ~#kinds-row
    shuffle). Weight/tiebreak rules match :func:`summarize_violations`
    exactly except the in-memory path's final original-order tiebreak
    (meaningless under distributed ordering; ties beyond
    (weight, column, kind) are nondeterministic, as documented).

    Input-validation mirrors M1 (reference summarize_violations.py:200-223)
    for the arguments that exist here.
    """
    if not isinstance(top_k, int):
        raise TypeError("top_k must be an integer")
    if top_k <= 0:
        raise ValueError("top_k must be a positive integer")
    if weights is not None:
        if not isinstance(weights, dict):
            raise TypeError("weights must be a dict or None")
        for kind, weight in weights.items():
            if not isinstance(weight, (int, float)):
                raise ValueError(
                    f"Weight for '{kind}' must be numeric, got {type(weight).__name__}"
                )
            if weight <= 0:
                raise ValueError(f"Weight for '{kind}' must be positive, got {weight}")
    top = summarize_violations_df(violations, top_k=top_k, weights=weights)
    counts = violations.groupBy("kind").agg(F.count(F.lit(1)).alias("n"))
    return DistributedSummary(top_issues_df=top, counts_by_kind_df=counts)

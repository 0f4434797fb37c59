"""Table-level aggregate checks (Deequ-style assertions).

The reference package has only per-column rules (reference
``validate_contract.py:95-176``); production contract suites also need
whole-table assertions — "avg price is in [a, b]", "≥ 99.9 % of rows
satisfy P", "key cardinality ratio ≥ 0.99". Each
:class:`~..types.AggregateCheck` is one Spark SQL aggregate expression;
all of them ride the SAME fused single-scan aggregation as the column
stats (``validate_table_contract`` job 1), so a contract with 50 checks
still scans the table exactly once.

100 TB shape: one scan, map-side partial aggregation, a single-row
exchange. ``aggregate_checks_report`` is fully lazy (agg → inline of a
literal struct array) — no ``collect`` and no driver-side row building,
so it composes into larger plans and writes.
"""

from __future__ import annotations

from typing import List, Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..types import AggregateCheck, Issue

__all__ = [
    "aggregate_check_terms",
    "evaluate_aggregate_checks",
    "aggregate_checks_report",
]


def aggregate_check_terms(checks: Sequence[AggregateCheck]) -> List[Column]:
    """Fused-agg terms, one per check, aliased chk0..chkN.

    Cast to double so the driver-side comparison is type-stable no
    matter what the expression returns (bigint count, decimal avg, …).
    """
    return [
        F.expr(c.expr).cast("double").alias(f"chk{n}")
        for n, c in enumerate(checks)
    ]


def _passes(c: AggregateCheck, value: Optional[float]) -> bool:
    if value is None:
        return False  # "couldn't establish the property" fails
    if c.min_value is not None and value < c.min_value:
        return False
    if c.max_value is not None and value > c.max_value:
        return False
    return True


def _bounds_str(c: AggregateCheck) -> str:
    lo = "-inf" if c.min_value is None else repr(c.min_value)
    hi = "+inf" if c.max_value is None else repr(c.max_value)
    return f"[{lo}, {hi}]"


def evaluate_aggregate_checks(
    extras: Mapping[str, object], checks: Sequence[AggregateCheck]
) -> List[Issue]:
    """Issues for every failed check, from the fused pass's extras row."""
    issues: List[Issue] = []
    for n, c in enumerate(checks):
        raw = extras.get(f"chk{n}")
        value = None if raw is None else float(raw)
        if not _passes(c, value):
            issues.append(
                Issue(
                    kind="aggregate_check",
                    message=(
                        f"aggregate check failed: {c.label} = {value!r}, "
                        f"expected in {_bounds_str(c)}"
                    ),
                    column=None,
                    observed=value,
                    expected=_bounds_str(c),
                )
            )
    return issues


def aggregate_checks_report(
    df: DataFrame, checks: Sequence[AggregateCheck]
) -> DataFrame:
    """(check_name, value:double, lo, hi, ok:boolean) — one row per check.

    One fused aggregation over ``df`` (single scan, single-row
    exchange), then a literal unpivot via ``inline``; the plan stays
    fully distributed and lazy.
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    row = df.agg(*aggregate_check_terms(checks))
    structs = []
    for n, c in enumerate(checks):
        v = F.col(f"chk{n}")
        ok = v.isNotNull()
        if c.min_value is not None:
            ok = ok & (v >= F.lit(float(c.min_value)))
        if c.max_value is not None:
            ok = ok & (v <= F.lit(float(c.max_value)))
        structs.append(
            F.struct(
                F.lit(c.label).alias("check_name"),
                v.alias("value"),
                F.lit(c.min_value).cast("double").alias("lo"),
                F.lit(c.max_value).cast("double").alias("hi"),
                ok.alias("ok"),
            )
        )
    return row.select(F.inline(F.array(*structs)))

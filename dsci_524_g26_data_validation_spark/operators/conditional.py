"""Conditional (WHEN → THEN) row rules.

Engine extension beyond the reference package (which has only
unconditional per-column rules, reference ``validate_contract.py``):
Deequ-style ``satisfies`` / Great-Expectations row-condition checks,
compiled entirely to Catalyst predicates.

At-scale shape:

* ``conditional_check_terms`` — one ``count_if`` pair per rule, designed
  to ride the SAME fused single-scan aggregation pass as the column
  stats (``validate_contract_fused(extra_terms=...)``): adding rules
  never adds a scan or a shuffle.
* ``conditional_report`` — per-rule (applicable, violations, rate) in
  ONE scan over the table: the rule predicates are evaluated as plain
  projection columns and aggregated with ``count_if``; no explode, no
  row multiplication, no shuffle (single-row global aggregate).
* ``conditional_violations`` — row-level violation rows for triage. All
  rules are evaluated in one projection and packed into an
  ``array<struct>`` that is exploded AFTER a disjunction filter prunes
  clean rows, so the row-multiplication factor applies only to dirty
  rows. Filters on the base columns still push down to the scan.

NULL semantics (see :class:`~..types.ConditionalRule`): a NULL ``when``
means not-applicable; an applicable row with NULL ``then`` is a
violation.
"""

from __future__ import annotations

from typing import List, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..types import ConditionalRule, Issue

__all__ = [
    "applicable_expr",
    "violated_expr",
    "conditional_check_terms",
    "evaluate_conditional_checks",
    "conditional_report",
    "conditional_violations",
]


def applicable_expr(rule: ConditionalRule) -> Column:
    """Boolean Column: does the rule's WHEN clause apply to this row?"""
    return F.coalesce(F.expr(rule.when), F.lit(False))


def violated_expr(rule: ConditionalRule) -> Column:
    """Boolean Column: applicable AND NOT coalesce(then, false)."""
    return applicable_expr(rule) & ~F.coalesce(F.expr(rule.then), F.lit(False))


def conditional_check_terms(rules: Sequence[ConditionalRule]) -> List[Column]:
    """Fused-aggregation terms: per rule, ``cond{i}_app`` (applicable
    rows) and ``cond{i}_bad`` (violations). Append to the fused pass's
    ``extra_terms`` — zero extra jobs."""
    terms: List[Column] = []
    for i, r in enumerate(rules):
        terms.append(F.count_if(applicable_expr(r)).alias(f"cond{i}_app"))
        terms.append(F.count_if(violated_expr(r)).alias(f"cond{i}_bad"))
    return terms


def evaluate_conditional_checks(
    extras: Mapping[str, object], rules: Sequence[ConditionalRule]
) -> List[Issue]:
    """Turn the fused-pass counters into Issues (one per failing rule)."""
    issues: List[Issue] = []
    for i, r in enumerate(rules):
        bad = int(extras.get(f"cond{i}_bad") or 0)
        app = int(extras.get(f"cond{i}_app") or 0)
        if bad > 0:
            issues.append(
                Issue(
                    kind="conditional",
                    message=(
                        f"conditional rule violated on {bad} of {app} "
                        f"applicable row(s): {r.label}"
                    ),
                    column=None,
                    observed=bad,
                    expected=0,
                )
            )
    return issues


def conditional_report(df: DataFrame, rules: Sequence[ConditionalRule]) -> DataFrame:
    """Per-rule audit report in ONE scan.

    Returns (rule, n_applicable, n_violations, violation_rate) — one row
    per rule, ordered by rule label. The counts are ``count_if`` terms of
    a single global aggregate (map-side partial agg → 1-row exchange),
    then pivoted to rows driver-side via a literal stack — constant
    driver traffic regardless of table size.
    """
    if not rules:
        raise ValueError("conditional_report requires at least one rule")
    agg = df.agg(*conditional_check_terms(rules))
    # stack the 2N counters into N (rule, app, bad) rows JVM-side
    pairs = ", ".join(
        f"'{r.label}', cond{i}_app, cond{i}_bad" for i, r in enumerate(rules)
    )
    stacked = agg.select(
        F.expr(
            f"stack({len(rules)}, {pairs}) as (rule, n_applicable, n_violations)"
        )
    )
    return stacked.select(
        "rule",
        F.col("n_applicable").cast("bigint").alias("n_applicable"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.when(F.col("n_applicable") > 0,
               F.col("n_violations") / F.col("n_applicable"))
        .otherwise(F.lit(0.0))
        .alias("violation_rate"),
    ).orderBy("rule")


def conditional_violations(
    df: DataFrame,
    rules: Sequence[ConditionalRule],
    id_cols: Sequence[str],
) -> DataFrame:
    """Row-level violations: one output row per (row, violated rule).

    One scan: all rule predicates are evaluated in a single projection;
    a disjunction filter drops clean rows BEFORE the explode, so only
    dirty rows are multiplied. Returns id_cols + ``rule`` (the rule
    label), distributed (never collected).
    """
    if not rules:
        raise ValueError("conditional_violations requires at least one rule")
    flags = [violated_expr(r).alias(f"v{i}") for i, r in enumerate(rules)]
    any_bad = None
    for i in range(len(rules)):
        c = F.col(f"v{i}")
        any_bad = c if any_bad is None else (any_bad | c)
    packed = F.array(
        *[
            F.when(F.col(f"v{i}"), F.lit(r.label))
            for i, r in enumerate(rules)
        ]
    )
    return (
        df.select(*[F.col(f"`{c}`") for c in id_cols], *flags)
        .filter(any_bad)
        .select(
            *[F.col(f"`{c}`") for c in id_cols],
            # explode_outer: the inferred size()>0 filter of a plain
            # explode would re-evaluate every rule predicate per row; the
            # any_bad pre-filter guarantees ≥1 label, so no null row
            # survives the cheap guard below
            F.explode_outer(
                F.filter(packed, lambda x: x.isNotNull())
            ).alias("rule"),
        )
        .filter(F.col("rule").isNotNull())
    )

"""Contract advisor: quantile-budgeted bounds suggestion.

Closes the contract lifecycle loop (profile → **suggest** → validate →
compare → summarize). ``infer_contract`` pins numeric bounds at the
observed min/max (reference ``infer_contract.py:57-94`` semantics) —
which means ONE outlier row in the baseline forever widens the
contract, and the very rows a range rule exists to catch become part of
it. The advisor instead proposes bounds at exact quantiles sized to a
violation budget: "flag no more than ~1% of today's rows" →
``[q(b/2), q(1-b/2)]`` — the Deequ/GE "suggestion" workflow, made
replicable cross-engine.

Two deliverables:

* :func:`suggest_bounds` — the audit REPORT (one row per column:
  suggested bounds + the realized violation counts they would produce
  today), fully SQL-replicable: Spark's exact ``percentile`` and
  DuckDB's ``quantile_cont`` are both linear-interpolation, NULL-
  excluding (pinned empirically — identical to the last bit on the
  probe set).
* :func:`suggest_contract` — the API product: the inferred Contract
  with numeric bounds swapped for the budgeted quantiles (everything
  else — dtype, missingness, domains — untouched from
  ``infer_contract``).

At-scale shape: two fused single-scan aggregates, inherently
sequential (the second pass counts violations of bounds the first pass
computed; the 1-row collect between them is the engine's accepted
driver traffic). Exact ``percentile`` buffers per-column values on the
aggregating executor — the oracle-replicable mode; at 10^12 rows pass
``approx=True`` to swap in ``percentile_approx`` (t-digest-style GK
sketch, bounded memory) with everything else unchanged — the same
exact/sketch duality as heavy-hitters and the HLL-guarded domains.
"""

from __future__ import annotations

from dataclasses import replace
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.rule_compiler import is_numeric_spark_type
from ..types import Contract
from .infer import DEFAULT_MAX_CATEGORIES, infer_contract

__all__ = [
    "suggest_bounds",
    "suggest_contract",
    "suggest_contract_and_bounds",
]


def _numeric_cols(df: DataFrame, cols: Optional[Sequence[str]]) -> List[str]:
    by_name = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        return [c for c, t in by_name.items() if is_numeric_spark_type(t)]
    out = []
    for c in cols:
        if c not in by_name:
            raise ValueError(f"column not found: {c}")
        if not is_numeric_spark_type(by_name[c]):
            raise ValueError(f"column is not numeric: {c}")
        out.append(c)
    return out


def _suggest_raw(
    df: DataFrame,
    names: Sequence[str],
    violation_budget: float,
    *,
    approx: bool,
    accuracy: int,
) -> List[tuple]:
    """(column, n_nonnull, lo, hi, n_below, n_above) per column with
    UNROUNDED bounds — two fused scans (quantiles, then violation
    counts against the resulting literal bounds)."""
    if not 0.0 < violation_budget < 1.0:
        raise ValueError(
            f"violation_budget must be in (0, 1), got {violation_budget}"
        )
    if not names:
        raise ValueError("suggest_bounds requires at least one numeric column")
    lo_q = violation_budget / 2.0
    hi_q = 1.0 - lo_q

    terms = []
    for i, c in enumerate(names):
        x = F.col(f"`{c}`").cast("double")
        terms.append(F.count(x).alias(f"n{i}"))
        if approx:
            terms.append(
                F.percentile_approx(
                    x, [lo_q, hi_q], F.lit(accuracy)
                ).alias(f"p{i}")
            )
        else:
            terms.append(
                F.percentile(
                    x, F.array(F.lit(lo_q), F.lit(hi_q))
                ).alias(f"p{i}")
            )
    prow = df.agg(*terms).collect()[0]

    terms2 = []
    bounds: List[tuple] = []
    for i, c in enumerate(names):
        x = F.col(f"`{c}`").cast("double")
        p = prow[f"p{i}"]
        lo = float(p[0]) if p is not None and p[0] is not None else None
        hi = float(p[1]) if p is not None and p[1] is not None else None
        bounds.append((c, int(prow[f"n{i}"]), lo, hi))
        below = F.lit(False) if lo is None else x < F.lit(lo)
        above = F.lit(False) if hi is None else x > F.lit(hi)
        terms2.append(F.count_if(below).alias(f"b{i}"))
        terms2.append(F.count_if(above).alias(f"a{i}"))
    vrow = df.agg(*terms2).collect()[0]

    return [
        (c, n, lo, hi, int(vrow[f"b{i}"]), int(vrow[f"a{i}"]))
        for i, (c, n, lo, hi) in enumerate(bounds)
    ]


def suggest_bounds(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    *,
    violation_budget: float = 0.01,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-column bound suggestion report: ``(column, n_nonnull,
    suggested_min, suggested_max, n_below, n_above, realized_rate)``,
    ordered by column name.

    ``suggested_min/max`` are the exact ``violation_budget/2`` and
    ``1 - violation_budget/2`` quantiles (linear interpolation, NULLs
    excluded); ``n_below``/``n_above`` count today's rows strictly
    outside them, so ``realized_rate`` ≤ budget up to tie mass — the
    evidence a reviewer accepts or tightens before the bounds ship into
    a contract. All-NULL columns suggest NULL bounds and zero counts.

    Two fused scans total for ANY number of columns (quantiles pass,
    then violation-count pass); set ``approx=True`` for the
    bounded-memory sketch path at extreme scale (report is then not
    oracle-replicable — documented, like every sketch mode).
    """
    names = _numeric_cols(df, cols)
    rows = _suggest_raw(
        df, names, violation_budget, approx=approx, accuracy=accuracy
    )
    return _bounds_report(df.sparkSession, rows)


def _bounds_report(spark, rows: List[tuple]) -> DataFrame:
    """Render :func:`_suggest_raw` rows as the suggest_bounds report."""
    raw = spark.createDataFrame(
        sorted(rows),
        "column string, n_nonnull bigint, suggested_min double,"
        " suggested_max double, n_below bigint, n_above bigint",
    )
    # rounding happens Spark-side (HALF_UP, the engine/oracle-shared
    # convention) — Python's round() is banker's and would diverge
    return raw.select(
        "column",
        "n_nonnull",
        F.round("suggested_min", 6).alias("suggested_min"),
        F.round("suggested_max", 6).alias("suggested_max"),
        "n_below",
        "n_above",
        F.when(
            F.col("n_nonnull") > 0,
            F.round(
                (F.col("n_below") + F.col("n_above")).cast("double")
                / F.col("n_nonnull").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("realized_rate"),
    ).orderBy("column")


def suggest_contract(
    df: DataFrame,
    *,
    violation_budget: float = 0.01,
    max_categories: int = DEFAULT_MAX_CATEGORIES,
    approx: bool = False,
    name: str = "contract",
) -> Contract:
    """The inferred contract with numeric bounds replaced by the
    budgeted quantiles — everything else (dtype, missingness ceiling,
    guarded categorical domains) exactly as :func:`infer_contract`
    produces it. Columns whose quantiles come back NULL (all-NULL
    columns) keep rule bounds of None, same as inference."""
    contract, _report = suggest_contract_and_bounds(
        df,
        violation_budget=violation_budget,
        max_categories=max_categories,
        approx=approx,
        name=name,
    )
    return contract


def suggest_contract_and_bounds(
    df: DataFrame,
    *,
    violation_budget: float = 0.01,
    max_categories: int = DEFAULT_MAX_CATEGORIES,
    approx: bool = False,
    accuracy: int = 10000,
    name: str = "contract",
):
    """Both advisor artifacts from ONE quantile + violation-count pass:
    ``(contract, bounds_report)``.

    The contract carries the unrounded quantiles; the report renders
    the SAME values at 6 dp with the realized violation evidence —
    deriving both from a single :func:`_suggest_raw` halves the scans
    and guarantees a written contract can never disagree with the
    printed report (a concurrently-written table would otherwise let
    the two passes observe different snapshots). Tables with no numeric
    columns return the plain inferred contract and an empty report."""
    base = infer_contract(df, max_categories=max_categories, name=name)
    numeric = _numeric_cols(df, None)
    if not numeric:
        return base, _bounds_report(df.sparkSession, [])
    # unrounded bounds: a contract carries the true quantile, not the
    # 6-dp report rendering
    rows = _suggest_raw(
        df, numeric, violation_budget, approx=approx, accuracy=accuracy
    )
    columns = dict(base.columns)
    for c, _n, lo, hi, _nb, _na in rows:
        columns[c] = replace(columns[c], min_value=lo, max_value=hi)
    contract = Contract(columns=columns, name=name)
    return contract, _bounds_report(df.sparkSession, rows)

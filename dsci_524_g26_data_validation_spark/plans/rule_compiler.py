"""Contract → Catalyst expression compiler.

This is the engine's core planning layer (SURVEY.md §4.2): a contract is
compiled into

* **one fused aggregation pass** — a single ``df.agg(*terms)`` whose terms
  cover every per-column statistic any rule needs (null fraction, min/max,
  out-of-range counts, invalid-category counts, HLL distinct estimates).
  Catalyst plans it as partial+final HashAggregate: one table scan, a
  one-row-per-partition shuffle, one result row. This replaces the
  reference's ≥4 full scans per column
  (/root/reference/src/pyos_data_validation/infer_contract.py:68,73,74,84
  and validate_contract.py:127,141,151,164).
* **violation predicates** — per-rule Catalyst boolean expressions used to
  materialize violating rows (only run when the stats pass says violations
  exist).

Everything here is pure ``pyspark.sql.functions`` — no UDFs — so
whole-stage codegen, column pruning, and Parquet/Iceberg predicate pushdown
all apply at 10^12-row scale. The sketch aggregates are Spark's built-in
implementations of published algorithms: HyperLogLog++ distinct counting
(Flajolet et al. 2007; Heule et al., EDBT 2013) and Greenwald-Khanna
quantile summaries (SIGMOD 2001) — both mergeable, so they ride the same
partial+final aggregation as the plain min/max/count terms.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..types import Contract

__all__ = [
    "ColumnStats",
    "StatsPlan",
    "compile_stats_pass",
    "run_stats_pass",
    "categorical_cast",
    "violation_predicates",
    "is_numeric_spark_type",
    "pattern_violation",
]


def is_numeric_spark_type(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def categorical_cast(col: Column, dt: T.DataType) -> Column:
    """Cast a categorical-candidate column to its domain string.

    Booleans render pandas-style ``True``/``False`` (not Spark's
    ``true``/``false``) to preserve the reference's bool-domain semantics
    (infer_contract.py:84 via str(); pinned by the reference's
    test_infer_contract.py:112-115 expecting {"True","False"}).
    """
    if isinstance(dt, T.BooleanType):
        return F.when(col.isNull(), F.lit(None).cast("string")).when(
            col, F.lit("True")
        ).otherwise(F.lit("False"))
    return col.cast("string")


def pattern_violation(col: Column, pattern: str) -> Column:
    """Full-match pattern facet predicate: non-NULL and NOT matching the
    whole value. The ``^(?:p)$`` wrap makes full-match explicit (rlike
    is a search, and a partial hit must not pass a format contract);
    the non-capturing group keeps user alternations like ``a|b`` from
    binding to the anchors."""
    return col.isNotNull() & ~col.rlike(f"^(?:{pattern})$")


@dataclass
class ColumnStats:
    """Decoded statistics for one column out of the fused pass."""

    null_frac: Optional[float] = None  # None only for a 0-row frame
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    below_min_count: int = 0
    above_max_count: int = 0
    invalid_category_count: int = 0
    bad_pattern_count: int = 0
    approx_distinct: Optional[int] = None
    non_null_count: int = 0
    quantiles: Optional[tuple] = None  # (p25, p50, p75) when profiled


@dataclass
class StatsPlan:
    """Compiled fused-aggregation plan.

    ``terms`` is the flat list of aliased aggregate Columns;
    ``decode(row)`` turns the single result Row into per-column stats.
    """

    terms: List[Column]
    _slots: Dict[str, Dict[str, str]]  # col -> stat -> alias

    def decode(self, row) -> Dict[str, ColumnStats]:
        out: Dict[str, ColumnStats] = {}
        d = row.asDict()
        for col, slots in self._slots.items():
            cs = ColumnStats()
            if "null_frac" in slots:
                v = d[slots["null_frac"]]
                cs.null_frac = float(v) if v is not None else None
            if "min" in slots:
                v = d[slots["min"]]
                cs.min_value = None if v is None else v
            if "max" in slots:
                v = d[slots["max"]]
                cs.max_value = None if v is None else v
            if "below" in slots:
                cs.below_min_count = int(d[slots["below"]] or 0)
            if "above" in slots:
                cs.above_max_count = int(d[slots["above"]] or 0)
            if "invalid" in slots:
                cs.invalid_category_count = int(d[slots["invalid"]] or 0)
            if "badpat" in slots:
                cs.bad_pattern_count = int(d[slots["badpat"]] or 0)
            if "acd" in slots:
                v = d[slots["acd"]]
                cs.approx_distinct = int(v) if v is not None else None
            if "nnc" in slots:
                cs.non_null_count = int(d[slots["nnc"]] or 0)
            if "pq" in slots:
                v = d[slots["pq"]]
                cs.quantiles = tuple(v) if v is not None else None
            out[col] = cs
        return out


def compile_stats_pass(
    df: DataFrame,
    contract: Contract,
    *,
    include_profile_stats: bool = False,
    exact_quantiles: bool = False,
    profile_quantiles: bool = True,
    profile_acd: str = "all",
) -> StatsPlan:
    """Compile every data-dependent check of ``contract`` into one agg list.

    Per column present in both the contract and ``df``:

    * ``null_frac``   — always (missingness check V4; reference
      validate_contract.py:126-137, strict ``>`` applied by the caller).
    * ``min``/``max`` + ``below``/``above`` violation counts — when the
      observed Spark type is numeric and a bound is set (V5/V6;
      reference validate_contract.py:139-160). Booleans count as numeric
      to match ``pandas.api.types.is_numeric_dtype`` (cast to int).
    * ``invalid`` count + ``nnc`` — when ``allowed_values`` is set (V7;
      reference validate_contract.py:162-175; NULLs never invalid).
    * ``acd`` (HyperLogLog++ distinct estimate) — with
      ``include_profile_stats`` (profiling P6, BASELINE.json north star).

    ``profile_quantiles`` / ``profile_acd`` trim the profile-stat set
    for the INFERENCE pass (P1-P5), which shares this compiler so the
    per-statistic semantics live in exactly one place:
    ``profile_quantiles=False`` drops the per-numeric-column quantile
    sketches, and ``profile_acd="categorical"`` emits the HLL distinct
    estimate only for string/boolean columns (the domain-guard inputs)
    instead of every column. Both only apply with
    ``include_profile_stats``.

    Aliases are positional (``s0``, ``s1`` …) so arbitrary column names
    (spaces, dots, unicode) can never collide or break resolution.
    """
    if profile_acd not in ("all", "categorical"):
        raise ValueError("profile_acd must be 'all' or 'categorical'")
    schema = {f.name: f.dataType for f in df.schema.fields}
    terms: List[Column] = []
    slots: Dict[str, Dict[str, str]] = {}

    def add(col: str, stat: str, expr: Column) -> None:
        alias = f"s{len(terms)}"
        terms.append(expr.alias(alias))
        slots.setdefault(col, {})[stat] = alias

    for col, rule in contract.columns.items():
        if col not in schema:
            continue  # missing_column is a driver-side schema check
        dt = schema[col]
        c = F.col(f"`{col}`")

        add(col, "null_frac", F.avg(c.isNull().cast("double")))

        numeric_like = is_numeric_spark_type(dt) or isinstance(dt, T.BooleanType)
        num_c = c.cast("int") if isinstance(dt, T.BooleanType) else c
        if numeric_like and (rule.min_value is not None or rule.max_value is not None):
            add(col, "min", F.min(num_c))
            add(col, "max", F.max(num_c))
            if rule.min_value is not None:
                add(
                    col,
                    "below",
                    F.count_if(num_c < F.lit(rule.min_value)),
                )
            if rule.max_value is not None:
                add(
                    col,
                    "above",
                    F.count_if(num_c > F.lit(rule.max_value)),
                )

        if rule.allowed_values is not None:
            allowed = sorted(rule.allowed_values)
            sc = categorical_cast(c, dt)
            # isin compiles to Catalyst In/InSet — codegen-friendly.
            add(
                col,
                "invalid",
                F.count_if(sc.isNotNull() & ~sc.isin(allowed)),
            )
            add(col, "nnc", F.count(c))

        if rule.pattern is not None and isinstance(dt, T.StringType):
            # count_if over an rlike — rides the same fused job; the
            # regex compiles once per task, evaluated in codegen.
            add(col, "badpat", F.count_if(pattern_violation(c, rule.pattern)))

        if include_profile_stats:
            if "nnc" not in slots.get(col, {}):
                add(col, "nnc", F.count(c))
            if profile_acd == "all" or isinstance(
                dt, (T.StringType, T.BooleanType)
            ):
                add(col, "acd", F.approx_count_distinct(c))
            if is_numeric_spark_type(dt):
                if "min" not in slots.get(col, {}):
                    add(col, "min", F.min(c))
                    add(col, "max", F.max(c))
                if not profile_quantiles:
                    pass
                elif exact_quantiles:
                    # Exact interpolated percentiles (oracle-checkable vs
                    # DuckDB quantile_cont); distributed but holds value
                    # counts in the aggregation state — fine at test
                    # scale, use the GK default at 10^12 rows.
                    add(
                        col,
                        "pq",
                        F.expr(
                            f"percentile(`{col}`, array(0.25D, 0.5D, 0.75D))"
                        ),
                    )
                else:
                    # GK sketch (P6): mergeable per-partition state, exact
                    # to 1/accuracy — rides the same single-row agg.
                    add(
                        col,
                        "pq",
                        F.percentile_approx(
                            c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10_000
                        ),
                    )

    return StatsPlan(terms=terms, _slots=slots)


def run_stats_pass(df: DataFrame, plan: StatsPlan) -> Dict[str, ColumnStats]:
    """Execute the fused pass: one scan, one shuffled sketch row."""
    if not plan.terms:
        return {}
    row = df.agg(*plan.terms).collect()[0]
    return plan.decode(row)


def violation_predicates(df: DataFrame, contract: Contract):
    """Per-column boolean Catalyst predicates marking violating rows.

    Returned as ``{column: [(kind, predicate), ...]}`` where each predicate
    is True exactly on rows that violate one rule facet. Used by
    ``validate.violation_rows`` to materialize violation rows in a single
    additional scan (SURVEY.md §3.2 phase 2).
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    out: Dict[str, List] = {}
    for col, rule in contract.columns.items():
        if col not in schema:
            continue
        dt = schema[col]
        c = F.col(f"`{col}`")
        preds: List = []
        numeric_like = is_numeric_spark_type(dt) or isinstance(dt, T.BooleanType)
        num_c = c.cast("int") if isinstance(dt, T.BooleanType) else c
        if numeric_like and rule.min_value is not None:
            preds.append(("range", num_c < F.lit(rule.min_value)))
        if numeric_like and rule.max_value is not None:
            preds.append(("range", num_c > F.lit(rule.max_value)))
        if rule.allowed_values is not None:
            sc = categorical_cast(c, dt)
            preds.append(
                ("category", sc.isNotNull() & ~sc.isin(sorted(rule.allowed_values)))
            )
        if rule.pattern is not None and isinstance(dt, T.StringType):
            preds.append(("pattern", pattern_violation(c, rule.pattern)))
        if preds:
            out[col] = preds
    return out

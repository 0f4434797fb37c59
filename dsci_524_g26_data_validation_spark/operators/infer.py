"""infer_contract: profile a Spark DataFrame into a Contract.

Reference semantics (/root/reference/src/pyos_data_validation/
infer_contract.py:57-94), re-planned for Spark:

* dtype         → schema metadata, zero scan (P1).
* missing frac  → exact ``avg(isNull)`` (P2) — reference pins exact 0.5 /
  1.0 fractions (test_infer_contract.py:93-105), so no sampling.
* numeric min/max → ``min``/``max`` aggregates (P3/P4); ``None`` when the
  column is all-NULL (matches the reference's notna-any guard).
* categorical domain → ``collect_set`` **guarded by a HyperLogLog
  estimate** (P5): the fused pass computes ``approx_count_distinct`` for
  every string/boolean column; only columns whose estimate is under
  ``max_categories`` get a ``collect_set`` in a second, column-pruned
  pass. The reference materializes the full distinct set unconditionally
  (infer_contract.py:84) — unbounded memory at 10^12 rows; the guard is
  the scale fix (SURVEY.md §4.2).

Cost: exactly two jobs (one when no categorical column qualifies), each a
single scan with a one-row partial+final HashAggregate — versus the
reference's ≥4 full passes per column.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.rule_compiler import (
    categorical_cast,
    compile_stats_pass,
    is_numeric_spark_type,
    run_stats_pass,
)
from ..types import ColumnProfile, ColumnRule, Contract, TableProfile

__all__ = [
    "infer_contract",
    "infer_profile",
    "group_quantiles",
    "column_entropies",
    "frequent_values",
    "correlation_census",
    "DEFAULT_MAX_CATEGORIES",
]

#: Above this estimated cardinality a column is treated as free-text, not
#: categorical: allowed_values stays None instead of OOM-ing the driver.
DEFAULT_MAX_CATEGORIES = 1000

#: HLL++ relative error is ~2% at default precision; widen the gate so a
#: column truly under the limit is never mistakenly rejected.
_HLL_SAFETY = 1.25


def _is_categorical_like(dt: T.DataType) -> bool:
    """String or boolean — mirrors the reference's object/str/string/
    category/bool branch (infer_contract.py:79-83)."""
    return isinstance(dt, (T.StringType, T.BooleanType))


def _guarded_domains(
    df: DataFrame, fields, acd: Dict[str, Optional[int]], max_categories: int
) -> Dict[str, set]:
    """HLL-guarded collect_set pass: only categorical-like columns whose
    approx-distinct estimate clears the gate get a domain; one extra
    column-pruned scan (or none when nothing qualifies)."""
    domains: Dict[str, set] = {}
    cat_cols = [
        f
        for f in fields
        if f.name in acd and (acd[f.name] or 0) <= max_categories * _HLL_SAFETY
    ]
    if cat_cols:
        set_terms = [
            F.collect_set(categorical_cast(F.col(f"`{f.name}`"), f.dataType)).alias(
                f"d{i}"
            )
            for i, f in enumerate(cat_cols)
        ]
        drow = df.agg(*set_terms).collect()[0]
        for i, f in enumerate(cat_cols):
            vals = set(drow[f"d{i}"])
            if len(vals) <= max_categories:
                domains[f.name] = vals
            # else: HLL under-estimated a just-over-limit column; treat as
            # high-cardinality (allowed_values=None).
    return domains


def infer_contract(
    df: DataFrame,
    *,
    max_categories: int = DEFAULT_MAX_CATEGORIES,
    name: str = "contract",
) -> Contract:
    """Derive a data contract from a Spark DataFrame.

    Raises TypeError when ``df`` is not a Spark DataFrame (mirrors the
    reference's pandas type guard, infer_contract.py:57-58).
    """
    if not isinstance(df, DataFrame):
        raise TypeError("df must be a pyspark.sql.DataFrame")

    fields = list(df.schema.fields)
    if not fields:
        return Contract(columns={}, name=name)

    # ---- pass 1: fused profile aggregation (one scan), compiled by the
    # SAME rule compiler as validation/profiling so the P1-P5 statistic
    # semantics live in exactly one place; inference trims the profile
    # set (no quantile sketches, HLL only where the domain guard needs
    # it) --------------------------------------------------------------
    base = Contract(
        columns={
            f.name: ColumnRule(dtype=f.dataType.simpleString()) for f in fields
        },
        name=name,
    )
    plan = compile_stats_pass(
        df,
        base,
        include_profile_stats=True,
        profile_quantiles=False,
        profile_acd="categorical",
    )
    stats = run_stats_pass(df, plan)

    # ---- pass 2: guarded collect_set for qualifying categoricals --------
    acd = {
        f.name: stats[f.name].approx_distinct
        for f in fields
        if _is_categorical_like(f.dataType)
    }
    domains = _guarded_domains(df, fields, acd, max_categories)

    # ---- assemble --------------------------------------------------------
    columns: Dict[str, ColumnRule] = {}
    for f in fields:
        cs = stats[f.name]
        missing_frac = float(cs.null_frac) if cs.null_frac is not None else 0.0
        min_v = max_v = None
        if is_numeric_spark_type(f.dataType):
            if cs.min_value is not None:
                min_v = float(cs.min_value)
            if cs.max_value is not None:
                max_v = float(cs.max_value)
        columns[f.name] = ColumnRule(
            dtype=f.dataType.simpleString(),
            max_missing_frac=missing_frac,
            min_value=min_v,
            max_value=max_v,
            allowed_values=domains.get(f.name),
        )
    return Contract(columns=columns, name=name)


def infer_profile(
    df: DataFrame,
    *,
    max_categories: int = DEFAULT_MAX_CATEGORIES,
    name: str = "contract",
    exact_quantiles: bool = False,
) -> TableProfile:
    """Profile a table into a :class:`TableProfile` — the inferred
    contract PLUS every P6 statistic of the fused pass: row count,
    non-null counts, HyperLogLog++ approx-distinct for every column, and
    p25/p50/p75 quantiles for numeric columns (Greenwald-Khanna sketch
    by default; ``exact_quantiles=True`` switches to Spark's exact
    ``percentile`` for oracle-checkable output at test scale).

    Same job shape as :func:`infer_contract`: ONE fused aggregation scan
    (all statistics ride a single partial+final HashAggregate) plus at
    most one HLL-guarded ``collect_set`` scan for categorical domains.
    Reuses the engine's rule compiler
    (``compile_stats_pass(include_profile_stats=True)``) so the profile
    path and the validation path share one planning layer.
    """
    if not isinstance(df, DataFrame):
        raise TypeError("df must be a pyspark.sql.DataFrame")

    fields = list(df.schema.fields)
    if not fields:
        return TableProfile(
            contract=Contract(columns={}, name=name), columns={}, n_rows=0
        )

    base = Contract(
        columns={
            f.name: ColumnRule(dtype=f.dataType.simpleString()) for f in fields
        },
        name=name,
    )
    plan = compile_stats_pass(
        df, base, include_profile_stats=True, exact_quantiles=exact_quantiles
    )
    row = df.agg(*plan.terms, F.count(F.lit(1)).alias("_n_rows")).collect()[0]
    stats = plan.decode(row)
    n_rows = int(row["_n_rows"])

    acd = {
        f.name: stats[f.name].approx_distinct
        for f in fields
        if _is_categorical_like(f.dataType)
    }
    domains = _guarded_domains(df, fields, acd, max_categories)

    columns: Dict[str, ColumnRule] = {}
    profiles: Dict[str, ColumnProfile] = {}
    for f in fields:
        cs = stats[f.name]
        missing_frac = float(cs.null_frac) if cs.null_frac is not None else 0.0
        numeric = is_numeric_spark_type(f.dataType)
        min_v = float(cs.min_value) if numeric and cs.min_value is not None else None
        max_v = float(cs.max_value) if numeric and cs.max_value is not None else None
        q = None
        if cs.quantiles is not None and all(x is not None for x in cs.quantiles):
            q = tuple(float(x) for x in cs.quantiles)
        dtype = f.dataType.simpleString()
        columns[f.name] = ColumnRule(
            dtype=dtype,
            max_missing_frac=missing_frac,
            min_value=min_v,
            max_value=max_v,
            allowed_values=domains.get(f.name),
        )
        profiles[f.name] = ColumnProfile(
            dtype=dtype,
            null_frac=missing_frac,
            non_null_count=cs.non_null_count,
            approx_distinct=cs.approx_distinct,
            min_value=min_v,
            max_value=max_v,
            quantiles=q,
            allowed_values=domains.get(f.name),
        )
    return TableProfile(
        contract=Contract(columns=columns, name=name),
        columns=profiles,
        n_rows=n_rows,
    )


def group_quantiles(
    df,
    value_col: str,
    group_col: str,
    *,
    quantiles=(0.25, 0.5, 0.75),
    exact: bool = False,
    accuracy: int = 10000,
):
    """Per-group quantiles of ``value_col`` → (group, q_<xx> columns...)
    — the grouped counterpart of the profile's P6 quantiles (sequence
    length per source, score percentiles per shard, ...).

    Default is ``percentile_approx`` — one GK sketch per group riding a
    single hash aggregation, the only shape that survives 10^12 rows
    (exact per-group percentiles sort every group). ``exact=True``
    switches to ``percentile`` for oracle-checkable output at test
    scale. Column naming: q=0.25 → ``q_25``; trailing zeros trimmed
    (0.5 → ``q_50``, 0.999 → ``q_99_9``).
    """
    from pyspark.sql import functions as F

    fn = "percentile" if exact else "percentile_approx"

    def _name(q: float) -> str:
        pct = f"{q * 100:.6f}".rstrip("0").rstrip(".")
        return "q_" + pct.replace(".", "_")

    extra = "" if exact else f", {accuracy}"
    aggs = [
        F.expr(f"{fn}(`{value_col}`, {q}{extra})").alias(_name(q))
        for q in quantiles
    ]
    return df.groupBy(group_col).agg(*aggs)


def column_entropies(df: DataFrame, cols) -> DataFrame:
    """(col_name, n_distinct, entropy, norm_entropy) — exact Shannon
    entropy (base 2) and distinct count per column, ALL columns in one
    scan.

    The distribution-shape profile missing from min/max/missing-frac:
    entropy ≈ 0 flags a near-constant column (a silently broken
    extractor), norm_entropy ≈ 1 a near-uniform one (e.g. a hash
    accidentally exported as a category). ``norm_entropy`` =
    entropy / log2(n_distinct), NULL for single-valued columns; NULLs
    are excluded from mass (consistent with the P5 domain rule).

    Plan: one scan emits (col, value-as-string) pairs via the same
    explode trick as the fused histogram capture; hash-aggregate to
    per-(col, value) counts (map-side partials bound the shuffle by
    cardinality, not rows); the identity
    ``H = log2(N) − Σ c·log2(c) / N`` folds the counts in a single
    second aggregate — no per-column window, no extra shuffle beyond
    the (col, value) one. Intended for bounded-cardinality columns —
    the (col, value) state is O(Σ cardinality), same caveat (and same
    HLL pre-check remedy) as the categorical-domain profile.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"`{c}`").cast("string").alias("val"),
        )
        for c in cols
    ]
    counts = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .filter(F.col("e.val").isNotNull())
        .groupBy(F.col("e.col_name").alias("col_name"), F.col("e.val").alias("val"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = F.sum("cnt").cast("double")
    c = F.col("cnt").cast("double")
    entropy = F.round(F.log2(n) - F.sum(c * F.log2(c)) / n, 6)
    return (
        counts.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            entropy.alias("entropy"),
        )
        .select(
            "col_name",
            "n_distinct",
            "entropy",
            F.round(
                F.when(
                    F.col("n_distinct") > 1,
                    F.col("entropy") / F.log2(F.col("n_distinct").cast("double")),
                ),
                6,
            ).alias("norm_entropy"),
        )
        .orderBy("col_name")
    )


def correlation_census(df: DataFrame, cols=None) -> DataFrame:
    """(col_a, col_b, n_pairwise, pearson_r) for every unordered pair of
    numeric columns — ALL pairs in ONE scan (Deequ's ``Correlation``
    analyzer, generalized to the full pairwise census).

    The redundancy/consistency profile: |r| ≈ 1 flags a derived or
    duplicated column (storage waste and leakage risk if one is a label),
    a KNOWN-correlated pair drifting to r ≈ 0 flags a broken extractor
    upstream. NULL handling is pairwise-complete (a row contributes to a
    pair iff BOTH cells are non-null — the standard ``corr`` semantics,
    so every cell is engine-reproducible).

    Plan: one fused hash-aggregate emits the six sufficient statistics
    (n, Σx, Σy, Σx², Σy², Σxy) per pair — k columns → 6·k(k−1)/2 counter
    terms riding a single column-pruned scan, the same shape as the
    fused contract pass; the 1-row result unpivots lazily via ``inline``
    (the aggregate_checks_report pattern). No shuffle beyond the scalar
    aggregation; safe at any row count (state is O(pairs), not O(rows)).

    ``pearson_r`` is NULL when fewer than 2 complete pairs exist or when
    either side is constant on the pairwise-complete subset (zero
    variance — correlation undefined).
    """
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.NumericType)
        ]
    cols = sorted(cols)
    if len(cols) < 2:
        raise ValueError("correlation_census needs at least 2 numeric columns")

    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    terms = []
    for i, (a, b) in enumerate(pairs):
        x = F.col(f"`{a}`").cast("double")
        y = F.col(f"`{b}`").cast("double")
        both = x.isNotNull() & y.isNotNull()
        terms += [
            F.count_if(both).alias(f"n{i}"),
            F.sum(F.when(both, x)).alias(f"sx{i}"),
            F.sum(F.when(both, y)).alias(f"sy{i}"),
            F.sum(F.when(both, x * x)).alias(f"sxx{i}"),
            F.sum(F.when(both, y * y)).alias(f"syy{i}"),
            F.sum(F.when(both, x * y)).alias(f"sxy{i}"),
        ]
    row = df.agg(*terms)

    def _r(i: int):
        n = F.col(f"n{i}").cast("double")
        var_a = n * F.col(f"sxx{i}") - F.col(f"sx{i}") * F.col(f"sx{i}")
        var_b = n * F.col(f"syy{i}") - F.col(f"sy{i}") * F.col(f"sy{i}")
        cov = n * F.col(f"sxy{i}") - F.col(f"sx{i}") * F.col(f"sy{i}")
        # strict > 0 guards both the undefined-variance case and the
        # sqrt-of-negative-epsilon fp artifact; ANSI mode would abort on
        # a 0-denominator division, hence the WHEN gate rather than /0
        return F.when(
            (F.col(f"n{i}") >= 2) & (var_a > 0) & (var_b > 0),
            cov / F.sqrt(var_a * var_b),
        )

    structs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"n{i}").cast("bigint").alias("n_pairwise"),
            F.round(_r(i), 6).alias("pearson_r"),
        )
        for i, (a, b) in enumerate(pairs)
    ]
    return row.select(F.inline(F.array(*structs)))


def frequent_values(df: DataFrame, cols, *, top_k: int = 10) -> DataFrame:
    """(col_name, val, cnt, frac, rank) — exact top-``top_k`` most
    frequent values of every named column, ALL columns in ONE scan
    (Deequ's FrequentItems analyzer, exact).

    The profiling facet min/max/entropy can't give: WHICH value
    dominates (the stuck default, the sentinel leaking into data, the
    one enum spelling nobody declared). ``frac`` is over non-NULL rows
    of that column; NULL is excluded like the P5 domain rule (its mass
    already lives in the missingness facet). Deterministic: ties break
    by value ascending.

    Plan: the column_entropies explode trick emits (col, value) pairs
    row-locally; map-side partial aggregation bounds the shuffle by
    Σ cardinality, not rows; the per-column top-k runs as a
    WindowGroupLimit over the counts frame (each task keeps ≤ k rows
    per column before the exchange). Same bounded-cardinality caveat
    (and HLL pre-check remedy) as the categorical-domain profile.
    """
    from pyspark.sql import Window

    cols = list(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    if top_k <= 0:
        raise ValueError(f"top_k must be > 0, got {top_k}")
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"`{c}`").cast("string").alias("val"),
        )
        for c in cols
    ]
    counts = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .filter(F.col("e.val").isNotNull())
        .groupBy(F.col("e.col_name").alias("col_name"), F.col("e.val").alias("val"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_total = Window.partitionBy("col_name")
    w_rank = Window.partitionBy("col_name").orderBy(
        F.desc("cnt"), F.asc("val")
    )
    return (
        counts.select(
            "col_name",
            "val",
            "cnt",
            F.round(F.col("cnt") / F.sum("cnt").over(w_total), 6).alias(
                "frac"
            ),
            F.row_number().over(w_rank).alias("rank"),
        )
        .filter(F.col("rank") <= top_k)
    )

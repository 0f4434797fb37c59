"""validate_contract: check a Spark DataFrame against a Contract.

Reference semantics (/root/reference/src/pyos_data_validation/
validate_contract.py:60-178), re-planned for Spark in three phases
(SURVEY.md §3.2):

* **phase 0 — driver, zero jobs**: missing_column / extra_column /
  dtype checks straight off ``df.schema`` (V1–V3). The dtype check keeps
  the reference's string-equivalence rule via normalization
  (validate_contract.py:107-115 → types.dtypes_equivalent).
* **phase 1 — one job**: every data-dependent statistic (missingness,
  min/max, out-of-range counts, invalid-category counts) rides ONE fused
  aggregation (plans.rule_compiler) — one scan validates every rule.
* **phase 2 — one conditional job**: only when a category rule tripped,
  collect the observed distinct value set (capped) so the Issue carries
  the same observed/expected payload the reference produces
  (validate_contract.py:164-174).

Issue ordering matches the reference: missing columns, extra columns,
then per contract column: dtype → missingness → range(lower) →
range(upper) → category.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.rule_compiler import (
    categorical_cast,
    compile_stats_pass,
    run_stats_pass,
    violation_predicates,
)
from ..types import (
    Contract,
    ContractViolationError,
    Issue,
    ValidationResult,
    dtypes_equivalent,
    normalize_dtype,
)

__all__ = [
    "validate_contract",
    "validate_contract_fused",
    "validate_and_fail",
    "violation_rows",
    "partition_verdicts",
    "validate_by_group",
]

#: Cap on the observed categorical set collected for a category Issue —
#: the reference collects the full set (unbounded); at scale we cap and
#: record truncation in the message.
OBSERVED_SET_CAP = 10_000


def validate_contract(
    df: DataFrame, contract: Contract, strict: bool = True
) -> ValidationResult:
    """Validate ``df`` against ``contract`` → ValidationResult.

    ``strict=True`` reports extra (non-contract) columns, mirroring the
    reference's flag (validate_contract.py:31-36,83-93).
    """
    result, _ = validate_contract_fused(df, contract, strict=strict)
    return result


def validate_contract_fused(
    df: DataFrame,
    contract: Contract,
    *,
    strict: bool = True,
    extra_terms: Optional[List] = None,
    category_observed: str = "full",
    pre_columns: Optional[Dict[str, object]] = None,
):
    """validate_contract + caller-supplied aggregate terms in the SAME
    single scan.

    ``extra_terms`` (aliased aggregate Columns, e.g. table-level invariant
    ``count_if`` terms or inlined referential-violation counts) ride the
    phase-1 fused aggregation, so a full table-contract pass costs one
    scan for ALL per-column rules + table-level counts together. Returns
    ``(ValidationResult, extras)`` where ``extras`` maps each extra
    term's alias to its aggregated value ({} when none given).

    ``pre_columns`` (name → Column) are projected via ``withColumns``
    under the phase-1 aggregate only, so an expensive expression many
    extra_terms share (e.g. the JSON payload contract's single
    ``from_json`` parse) evaluates once per row instead of once per
    term. They are invisible to the schema checks (phases 0) — those
    run against the caller's original columns.

    ``category_observed``:

    * ``"full"`` — reference parity: a tripped category Issue carries the
      column's FULL observed distinct set (validate_contract.py:164-174),
      collected by a second conditional job (phase 2).
    * ``"invalid_only"`` — scale mode: the Issue carries only the
      observed INVALID values (capped), collected by a
      ``collect_set(when(invalid, v))`` term riding phase 1 — violations
      are rare, so the state is tiny and NO second job ever runs.
    """
    if not isinstance(df, DataFrame):
        raise TypeError("df must be a pyspark.sql.DataFrame")
    if category_observed not in ("full", "invalid_only"):
        raise ValueError("category_observed must be 'full' or 'invalid_only'")
    extra_terms = list(extra_terms or [])

    issues: List[Issue] = []
    schema = {f.name: f.dataType for f in df.schema.fields}
    df_columns = set(schema)
    contract_columns = set(contract.columns)

    # --- phase 0: schema checks (driver only, no Spark job) --------------
    for col in sorted(contract_columns - df_columns):
        issues.append(
            Issue(
                kind="missing_column",
                message=f"Missing required column: {col}",
                column=col,
                expected="Present",
                observed="Missing",
            )
        )
    if strict:
        for col in sorted(df_columns - contract_columns):
            issues.append(
                Issue(
                    kind="extra_column",
                    message=f"Unexpected extra column: {col}",
                    column=col,
                    expected="Absent",
                    observed="Present",
                )
            )

    # --- phase 1: one fused aggregation job ------------------------------
    plan = compile_stats_pass(df, contract)
    cat_terms: List = []
    cat_cols: List[str] = []
    if category_observed == "invalid_only":
        for col, rule in contract.columns.items():
            if col not in schema or rule.allowed_values is None:
                continue
            sc = categorical_cast(F.col(f"`{col}`"), schema[col])
            invalid = sc.isNotNull() & ~sc.isin(sorted(rule.allowed_values))
            cat_terms.append(
                F.slice(
                    F.sort_array(F.collect_set(F.when(invalid, sc))),
                    1,
                    OBSERVED_SET_CAP,
                ).alias(f"_cat{len(cat_cols)}")
            )
            cat_cols.append(col)

    extras: Dict[str, object] = {}
    observed_sets: Dict[str, set] = {}
    if plan.terms or extra_terms or cat_terms:
        agg_src = df.withColumns(dict(pre_columns)) if pre_columns else df
        agg_df = agg_src.agg(*plan.terms, *extra_terms, *cat_terms)
        row = agg_df.collect()[0]
        stats = plan.decode(row)
        n_plan, n_extra = len(plan.terms), len(extra_terms)
        extras = {n: row[n] for n in agg_df.columns[n_plan : n_plan + n_extra]}
        for i, c in enumerate(cat_cols):
            observed_sets[c] = set(row[f"_cat{i}"])
    else:
        stats = {}

    # --- phase 2: full observed set for tripped category rules (parity
    # mode only — one conditional job) ------------------------------------
    if category_observed == "full":
        tripped_cats = [
            col
            for col, rule in contract.columns.items()
            if col in schema
            and rule.allowed_values is not None
            and stats[col].invalid_category_count > 0
        ]
        if tripped_cats:
            terms = [
                F.slice(
                    F.sort_array(
                        F.collect_set(categorical_cast(F.col(f"`{c}`"), schema[c]))
                    ),
                    1,
                    OBSERVED_SET_CAP,
                ).alias(f"o{i}")
                for i, c in enumerate(tripped_cats)
            ]
            row = df.agg(*terms).collect()[0]
            for i, c in enumerate(tripped_cats):
                observed_sets[c] = set(row[f"o{i}"])

    # --- assemble Issues in reference order -------------------------------
    for col, rule in contract.columns.items():
        if col not in schema:
            continue  # reported as missing_column above
        observed_dtype = schema[col].simpleString()
        if not dtypes_equivalent(rule.dtype, observed_dtype):
            issues.append(
                Issue(
                    kind="dtype",
                    message=(
                        f"{col}: expected {normalize_dtype(rule.dtype)}, "
                        f"got {observed_dtype}"
                    ),
                    column=col,
                    expected=normalize_dtype(rule.dtype),
                    observed=observed_dtype,
                )
            )

        cs = stats[col]
        missing_frac = cs.null_frac if cs.null_frac is not None else 0.0
        if missing_frac > rule.max_missing_frac:  # strict >: at-threshold passes
            issues.append(
                Issue(
                    kind="missingness",
                    message=(
                        f"{col}: missing fraction {missing_frac} exceeds "
                        f"{rule.max_missing_frac}"
                    ),
                    column=col,
                    expected=rule.max_missing_frac,
                    observed=missing_frac,
                )
            )

        # Lower and upper range issues fire independently (reference
        # validate_contract.py:141-160 — both can be emitted for one col).
        if rule.min_value is not None and cs.min_value is not None:
            if cs.min_value < rule.min_value:
                issues.append(
                    Issue(
                        kind="range",
                        message=(
                            f"{col}: min value {cs.min_value} below "
                            f"{rule.min_value}"
                        ),
                        column=col,
                        expected=rule.min_value,
                        observed=cs.min_value,
                    )
                )
        if rule.max_value is not None and cs.max_value is not None:
            if cs.max_value > rule.max_value:
                issues.append(
                    Issue(
                        kind="range",
                        message=(
                            f"{col}: max value {cs.max_value} exceeds "
                            f"{rule.max_value}"
                        ),
                        column=col,
                        expected=rule.max_value,
                        observed=cs.max_value,
                    )
                )

        if rule.allowed_values is not None and col in observed_sets:
            observed_vals = observed_sets[col]
            invalid = observed_vals - set(rule.allowed_values)
            if invalid:  # NULLs never counted (collect_set drops them)
                issues.append(
                    Issue(
                        kind="category",
                        message=f"{col}: invalid values {invalid}",
                        column=col,
                        expected=set(rule.allowed_values),
                        observed=observed_vals,
                    )
                )

        # pattern facet (engine extension): the fused pass already
        # counted full-match failures; NULLs never violate pattern.
        if rule.pattern is not None and cs.bad_pattern_count > 0:
            issues.append(
                Issue(
                    kind="pattern",
                    message=(
                        f"{col}: {cs.bad_pattern_count} value(s) do not "
                        f"match /{rule.pattern}/"
                    ),
                    column=col,
                    expected=rule.pattern,
                    observed=cs.bad_pattern_count,
                )
            )

    return ValidationResult(ok=len(issues) == 0, issues=issues), extras


def validate_and_fail(
    df: DataFrame, contract: Contract, strict: bool = True
) -> ValidationResult:
    """CI gate: validate and raise ContractViolationError on failure.

    Documented-but-missing in the reference (types.py:11,143-146).
    """
    result = validate_contract(df, contract, strict=strict)
    if not result.ok:
        lines = "; ".join(i.message for i in result.issues[:20])
        raise ContractViolationError(
            f"contract '{contract.name}' violated "
            f"({len(result.issues)} issue(s)): {lines}"
        )
    return result


def violation_rows(
    df: DataFrame,
    contract: Contract,
    *,
    include_payload: bool = True,
) -> DataFrame:
    """Materialize per-row violations for every rule in ONE scan.

    Builds, per row, an array of violation structs (one slot per rule
    facet, NULL when the row passes), filters the NULLs out with a
    Catalyst higher-order function, and explodes — so all rules share a
    single pass and whole-stage codegen applies (no UDFs).

    Output schema:
      kind, column, observed (string), partition_id, [payload (json)].
    Rows that violate k rules appear k times.
    """
    preds = violation_predicates(df, contract)
    if not preds:
        return violation_schema_empty(df, include_payload=include_payload)

    schema = {f.name: f.dataType for f in df.schema.fields}
    structs = []
    for col, plist in preds.items():
        observed = categorical_cast(F.col(f"`{col}`"), schema[col])
        for kind, p in plist:
            structs.append(
                F.when(
                    p,
                    F.struct(
                        F.lit(kind).alias("kind"),
                        F.lit(col).alias("column"),
                        observed.alias("observed"),
                    ),
                )
            )
    arr = F.array_compact(F.array(*structs))
    cols = [
        F.explode(arr).alias("v"),
        F.spark_partition_id().alias("partition_id"),
    ]
    if include_payload:
        cols.append(F.to_json(F.struct(*[F.col(f"`{c}`") for c in df.columns])).alias("payload"))
    out = df.select(*cols)
    sel = [
        F.col("v.kind").alias("kind"),
        F.col("v.column").alias("column"),
        F.col("v.observed").alias("observed"),
        F.col("partition_id"),
    ]
    if include_payload:
        sel.append(F.col("payload"))
    return out.select(*sel)


def violation_schema_empty(df: DataFrame, *, include_payload: bool = True) -> DataFrame:
    """Empty violations frame with the stable output schema."""
    fields = [
        T.StructField("kind", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("observed", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
    ]
    if include_payload:
        fields.append(T.StructField("payload", T.StringType()))
    return df.sparkSession.createDataFrame([], T.StructType(fields))


def partition_verdicts(
    df: DataFrame,
    contract: Contract,
    *,
    partition_col: Optional[str] = None,
) -> DataFrame:
    """Per-partition pass/fail verdict (north rule, BASELINE.json:14).

    Groups violation counts by ``partition_col`` when given — for
    resumability key verdicts to a *data* partition value (e.g. the
    Iceberg partition column), which is stable across repartitioning —
    else by the physical ``spark_partition_id()``.

    Returns: (partition, n_violations, verdict) — one row per partition,
    including clean partitions (verdict='pass').
    """
    key = (
        F.col(f"`{partition_col}`").cast("string")
        if partition_col
        else F.spark_partition_id().cast("string")
    )
    preds = violation_predicates(df, contract)
    flat = [p for plist in preds.values() for _, p in plist]
    if flat:
        viol = sum(
            (p.cast("int") for p in flat), F.lit(0)
        )
    else:
        viol = F.lit(0)
    return (
        df.select(key.alias("partition"), viol.alias("_v"))
        .groupBy("partition")
        .agg(F.sum("_v").alias("n_violations"))
        .select(
            "partition",
            F.col("n_violations").cast("bigint").alias("n_violations"),
            F.when(F.col("n_violations") > 0, F.lit("fail"))
            .otherwise(F.lit("pass"))
            .alias("verdict"),
        )
    )


def validate_by_group(
    df: DataFrame,
    contract: Contract,
    *,
    group_col: str,
) -> DataFrame:
    """Per-cohort contract validation: the contract's DATA facets
    evaluated independently for every value of ``group_col`` →
    (group, kind, column, observed, expected) issue rows, lazily.

    The gap :func:`partition_verdicts` can't cover: that counts ROW
    violations per partition, but aggregate facets are group-level
    properties — a source can violate ``max_missing_frac`` while the
    whole table passes (its NULLs diluted by the other sources), and a
    per-group range breach pinpoints WHICH cohort regressed. Facets and
    thresholds are exactly :func:`validate_contract`'s (strict ``>`` on
    missingness, independent lower/upper range, NULL-excluded category,
    full-match pattern); schema-level kinds (missing/extra column,
    dtype) are group-invariant and stay with ``validate_contract``.

    Scale shape: ONE scan; the grouped fused aggregation shuffles
    per-partition partials keyed by group (map-side combined — state is
    O(groups × rules), never rows); issue assembly is a lazy ``inline``
    unpivot over the |groups|-row aggregate. ``observed``/``expected``
    are doubles (for category/pattern, observed = the offending count
    and expected is NULL — the set/pattern itself lives in the
    contract), so the frame is engine-comparable without string
    formatting drift.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    if group_col not in schema:
        raise ValueError(f"group_col {group_col!r} not in DataFrame")

    from ..plans.rule_compiler import is_numeric_spark_type, pattern_violation

    aggs: List = []
    checks: List = []  # (fired-condition builder deferred to aliases)

    def slot(expr, name: str) -> str:
        aggs.append(expr.alias(name))
        return name

    i = 0
    for col, rule in contract.columns.items():
        if col not in schema:
            continue
        # rules on the group key itself evaluate naturally (every row in
        # a group shares the value, so e.g. its pattern facet becomes a
        # per-group format verdict); a NULL group key forms its own group
        c = F.col(f"`{col}`")
        nf = slot(F.avg(c.isNull().cast("double")), f"nf{i}")
        checks.append(
            (
                F.col(nf) > F.lit(rule.max_missing_frac),
                "missingness",
                col,
                F.col(nf),
                F.lit(float(rule.max_missing_frac)),
            )
        )
        # numeric_like mirrors the fused table pass (rule_compiler):
        # booleans count as numeric via an int cast, so a range rule on
        # a boolean column fires per-cohort exactly as it does at table
        # level — gating on is_numeric_spark_type alone would silently
        # skip the facet here while validate_contract reports it.
        numeric_like = is_numeric_spark_type(schema[col]) or isinstance(
            schema[col], T.BooleanType
        )
        num_c = (
            c.cast("int") if isinstance(schema[col], T.BooleanType) else c
        )
        if numeric_like:
            if rule.min_value is not None:
                mn = slot(F.min(num_c).cast("double"), f"mn{i}")
                checks.append(
                    (
                        F.col(mn) < F.lit(float(rule.min_value)),
                        "range",
                        col,
                        F.col(mn),
                        F.lit(float(rule.min_value)),
                    )
                )
            if rule.max_value is not None:
                mx = slot(F.max(num_c).cast("double"), f"mx{i}")
                checks.append(
                    (
                        F.col(mx) > F.lit(float(rule.max_value)),
                        "range",
                        col,
                        F.col(mx),
                        F.lit(float(rule.max_value)),
                    )
                )
        if rule.allowed_values is not None:
            sc = categorical_cast(c, schema[col])
            inv = slot(
                F.count_if(
                    sc.isNotNull() & ~sc.isin(sorted(rule.allowed_values))
                ),
                f"inv{i}",
            )
            checks.append(
                (
                    F.col(inv) > 0,
                    "category",
                    col,
                    F.col(inv).cast("double"),
                    F.lit(None).cast("double"),
                )
            )
        if rule.pattern is not None:
            bp = slot(
                F.count_if(pattern_violation(c, rule.pattern)), f"bp{i}"
            )
            checks.append(
                (
                    F.col(bp) > 0,
                    "pattern",
                    col,
                    F.col(bp).cast("double"),
                    F.lit(None).cast("double"),
                )
            )
        i += 1

    if not aggs:
        raise ValueError("contract declares no data facet for any df column")

    grouped = df.groupBy(F.col(f"`{group_col}`").alias("group")).agg(*aggs)
    structs = [
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(col).alias("column"),
            observed.alias("observed"),
            expected.alias("expected"),
            fired.alias("_fired"),
        )
        for fired, kind, col, observed, expected in checks
    ]
    return (
        grouped.select("group", F.inline(F.array(*structs)))
        .filter(F.col("_fired"))
        .drop("_fired")
    )

"""Contract validation for semi-structured (JSON string) payload columns.

Extends the engine's contract system INTO the payload a flat column
contract cannot address (reference ``validate_contract.py`` validates
named columns only; this is an engine extension like
:class:`~..types.ConditionalRule`): per-field required / dtype / range /
domain / pattern rules over a JSON string column, compiled entirely to
Catalyst (``get_json_object`` + ``try_cast`` + predicates) — the
JSON-Schema-shaped subset that is exactly replicable in ANSI SQL.

At-scale shape (the module's reason to exist at 100 TB):

* :func:`json_contract_report` — per-rule facet counters ride ONE fused
  single-scan global aggregate (map-side partial agg → 1-row exchange),
  then pivot to rows JVM-side via a literal ``stack``: adding rules adds
  projection columns, never scans or shuffles. Payload-level rot (NULL /
  malformed / non-object / undeclared keys) is accounted on a
  ``__payload__`` pseudo-rule in the same pass, so 100% of rows are
  visible in one report.
* :func:`json_contract_violations` — row-level triage. Every rule's
  facets are evaluated in one projection; a disjunction filter prunes
  clean rows BEFORE the explode (the ``conditional_violations``
  pattern), so row multiplication applies only to dirty rows.

Cross-engine semantics, pinned empirically against DuckDB 1.0 (the
oracle) and documented as the operator's contract:

* **presence**: a field is *present* iff ``get_json_object`` returns
  non-NULL — a JSON ``null`` value therefore counts as *missing*, in
  BOTH engines (Spark ``get_json_object('{"k": null}','$.k')`` and a
  ``json_valid``-guarded DuckDB ``json_extract_string`` agree).
* **numeric**: values go through a ``try_cast`` to double — never an
  ANSI abort. The ``integer`` dtype is checked as ``floor(d) = d`` over
  the double rendering, NOT a bigint cast: DuckDB ``TRY_CAST('87.5' AS
  BIGINT)`` *rounds* to 88 while Spark yields NULL, so a bigint cast
  would silently diverge between engine and oracle.
* **payload validity**: a payload is a *valid object* iff Spark
  ``json_object_keys`` is non-NULL (NULL for malformed JSON and for
  valid non-objects alike); the oracle mirrors with ``json_valid(j) AND
  json_type(j) = 'OBJECT'``. Field facets only apply to valid-object
  rows.
* **renderings**: nested objects/arrays/booleans render identically
  (``{"a":1}``, ``[1,2]``, ``true``) so domain / pattern rules on them
  behave the same in both engines.
"""

from __future__ import annotations

from typing import List, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..types import Issue, JsonFieldRule

__all__ = [
    "JsonFieldRule",
    "PAYLOAD_RULE",
    "json_contract_report",
    "json_contract_violations",
    "json_contract_check_terms",
    "evaluate_json_contract_checks",
]

#: pseudo-rule label carrying payload-level (not per-field) counters
PAYLOAD_RULE = "__payload__"

#: facet names in first-fail priority order (triage attribution)
_FACETS = ("missing", "type", "range", "domain", "pattern")


# JsonFieldRule lives in ..types beside the other rule dataclasses so
# TableContract can carry json_rules without a types→operators import;
# re-exported here because this module defines its semantics. The
# rule's facets: ``required`` (JSON null counts as absent), ``dtype``
# over number/integer/boolean (string values that RENDER numeric pass —
# get_json_object erases the quote distinction in both engines; string
# fields are validated with pattern/allowed instead), inclusive numeric
# bounds over the double rendering, exact allowed renderings, and a
# contains-match pattern (Java ∩ RE2 subset).


def _facet_exprs(
    valid: Column, payload: Column, rule: JsonFieldRule
) -> List[Column]:
    """Boolean facet columns [missing, type, range, domain, pattern]
    for one rule — missing is raw presence (required-ness is applied by
    the caller), the rest are violations. Pure Catalyst."""
    v = F.get_json_object(payload, f"$.{rule.field}")
    d = v.try_cast("double")
    present = valid & v.isNotNull()
    missing = valid & v.isNull()
    if rule.dtype == "number":
        type_bad = present & d.isNull()
    elif rule.dtype == "integer":
        # floor(d) = d over the double rendering — NOT a bigint cast
        # (DuckDB TRY_CAST rounds where Spark nulls; see module doc)
        type_bad = present & (d.isNull() | (F.floor(d) != d))
    elif rule.dtype == "boolean":
        type_bad = present & ~v.isin("true", "false")
    else:
        type_bad = F.lit(False)
    range_bad = F.lit(False)
    if rule.min_value is not None:
        range_bad = range_bad | (d < F.lit(float(rule.min_value)))
    if rule.max_value is not None:
        range_bad = range_bad | (d > F.lit(float(rule.max_value)))
    range_bad = present & d.isNotNull() & range_bad
    if rule.allowed is not None:
        domain_bad = present & ~v.isin(*rule.allowed)
    else:
        domain_bad = F.lit(False)
    if rule.pattern is not None:
        pattern_bad = present & ~v.rlike(rule.pattern)
    else:
        pattern_bad = F.lit(False)
    return [missing, type_bad, range_bad, domain_bad, pattern_bad]


def _violated_expr(facets: List[Column], rule: JsonFieldRule) -> Column:
    """Any-facet violation for one rule (missing only when required)."""
    missing, type_bad, range_bad, domain_bad, pattern_bad = facets
    out = type_bad | range_bad | domain_bad | pattern_bad
    if rule.required:
        out = out | missing
    return out


def json_contract_report(
    df: DataFrame,
    rules: Sequence[JsonFieldRule],
    *,
    col: str = "props",
    declared_only: bool = False,
) -> DataFrame:
    """Per-rule audit over a JSON payload column in ONE scan.

    Returns one row per rule plus a ``__payload__`` pseudo-rule, columns
    ``(rule, field, n_applicable, n_missing, n_type_bad, n_range_bad,
    n_domain_bad, n_pattern_bad, n_violations, violation_rate)``:

    * per-field rows: ``n_applicable`` = valid-object payload rows (the
      denominator for every facet); ``n_missing`` counts absent fields
      whether or not required; ``n_violations`` = rows violating ANY
      facet (missing contributes only for ``required`` rules — a row
      violating several facets counts once);
    * ``__payload__`` row: ``n_applicable`` = ALL rows, ``n_missing`` =
      NULL payloads, ``n_type_bad`` = malformed / non-object payloads,
      ``n_domain_bad`` = rows carrying an undeclared top-level key
      (``declared_only=True`` only; the payload analog of the strict
      extra-column check V2), ``n_violations`` = type + domain.

    Scale shape: every counter is a ``count_if`` term of a single global
    aggregate — map-side partial agg, 1-row exchange, then a driver-free
    JVM-side ``stack`` pivot to |rules|+1 rows. Adding rules adds
    projection columns only.
    """
    if not rules:
        raise ValueError("json_contract_report requires at least one rule")
    payload = F.col(col)
    keys = F.json_object_keys(payload)
    valid = keys.isNotNull()

    terms: List[Column] = [
        F.count(F.lit(1)).alias("p_all"),
        F.count_if(payload.isNull()).alias("p_null"),
        F.count_if(payload.isNotNull() & ~valid).alias("p_invalid"),
        F.count_if(valid).alias("p_valid"),
    ]
    if declared_only:
        declared = sorted({r.top_key for r in rules})
        extra = F.array_except(
            keys, F.array(*[F.lit(k) for k in declared])
        )
        terms.append(
            F.count_if(valid & (F.size(extra) > 0)).alias("p_extra")
        )
    else:
        terms.append(F.lit(0).cast("bigint").alias("p_extra"))
    for i, r in enumerate(rules):
        facets = _facet_exprs(valid, payload, r)
        for fname, fexpr in zip(_FACETS, facets):
            terms.append(F.count_if(fexpr).alias(f"r{i}_{fname}"))
        terms.append(
            F.count_if(_violated_expr(facets, r)).alias(f"r{i}_bad")
        )

    agg = df.agg(*terms)

    def q(s: str) -> str:  # SQL string literal (quote-doubled)
        return "'" + s.replace("'", "''") + "'"

    rows = [
        f"{q(PAYLOAD_RULE)}, {q(col)}, p_all, p_null, p_invalid,"
        f" CAST(0 AS BIGINT), p_extra, CAST(0 AS BIGINT),"
        f" p_invalid + p_extra"
    ]
    for i, r in enumerate(rules):
        rows.append(
            f"{q(r.label)}, {q('$.' + r.field)}, p_valid, r{i}_missing,"
            f" r{i}_type, r{i}_range, r{i}_domain, r{i}_pattern, r{i}_bad"
        )
    stacked = agg.select(
        F.expr(
            f"stack({len(rows)}, {', '.join(rows)}) as (rule, field,"
            " n_applicable, n_missing, n_type_bad, n_range_bad,"
            " n_domain_bad, n_pattern_bad, n_violations)"
        )
    )
    out_counts = [
        "n_applicable",
        "n_missing",
        "n_type_bad",
        "n_range_bad",
        "n_domain_bad",
        "n_pattern_bad",
        "n_violations",
    ]
    return stacked.select(
        "rule",
        "field",
        *[F.col(c).cast("bigint").alias(c) for c in out_counts],
        F.when(
            F.col("n_applicable") > 0,
            F.round(
                F.col("n_violations").cast("double")
                / F.col("n_applicable").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("violation_rate"),
    ).orderBy("rule")


def json_contract_violations(
    df: DataFrame,
    rules: Sequence[JsonFieldRule],
    id_cols: Sequence[str],
    *,
    col: str = "props",
) -> DataFrame:
    """Row-level triage: one output row per (row, violated rule) with
    first-fail facet attribution.

    Returns ``id_cols + (rule, facet)`` where ``facet`` is the FIRST
    failing facet in priority order missing > type > range > domain >
    pattern (``missing`` only for required rules). Payloads that are not
    valid objects surface as ``(__payload__, 'payload')`` rows.

    One scan: all facets evaluate in a single projection, a disjunction
    filter drops clean rows before the explode (only dirty rows
    multiply), and base-column filters still push down to the scan. The
    result stays distributed — never collected.
    """
    if not rules:
        raise ValueError(
            "json_contract_violations requires at least one rule"
        )
    payload = F.col(col)
    valid = F.json_object_keys(payload).isNotNull()

    labels: List[Column] = []
    flags: List[Column] = []
    bad_payload = payload.isNotNull() & ~valid
    labels.append(
        F.when(
            bad_payload,
            F.struct(
                F.lit(PAYLOAD_RULE).alias("rule"),
                F.lit("payload").alias("facet"),
            ),
        )
    )
    flags.append(bad_payload.alias("v_payload"))
    for i, r in enumerate(rules):
        facets = _facet_exprs(valid, payload, r)
        first_fail = F.lit(None).cast("string")
        order = list(zip(_FACETS, facets))
        if not r.required:
            order = order[1:]  # missing never fails a non-required rule
        for fname, fexpr in reversed(order):
            first_fail = F.when(fexpr, F.lit(fname)).otherwise(first_fail)
        violated = _violated_expr(facets, r)
        labels.append(
            F.when(
                violated,
                F.struct(
                    F.lit(r.label).alias("rule"),
                    first_fail.alias("facet"),
                ),
            )
        )
        flags.append(violated.alias(f"v{i}"))

    packed = F.array(*labels)
    # one projection evaluates every facet; flags + packed labels are
    # materialized together so the disjunction filter and the explode
    # both read the already-computed columns (no re-evaluation)
    projected = df.select(
        *[F.col(f"`{c}`") for c in id_cols],
        *flags,
        packed.alias("_packed"),
    )
    flag_names = ["v_payload"] + [f"v{i}" for i in range(len(rules))]
    any_bad = F.col(flag_names[0])
    for n in flag_names[1:]:
        any_bad = any_bad | F.col(n)
    return (
        projected.filter(any_bad)
        .select(
            *[F.col(f"`{c}`") for c in id_cols],
            # explode_outer + null guard: the any_bad pre-filter
            # guarantees >=1 label so no null row survives the guard
            F.explode_outer(
                F.filter(F.col("_packed"), lambda x: x.isNotNull())
            ).alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
        .select(
            *[F.col(f"`{c}`") for c in id_cols],
            F.col("_v.rule").alias("rule"),
            F.col("_v.facet").alias("facet"),
        )
    )


def json_contract_check_terms(
    rules: Sequence[JsonFieldRule], *, col: str = "props"
) -> List[Column]:
    """Fused-aggregation terms for TableContract integration: per rule,
    ``jr{i}_app`` (valid-object payload rows) and ``jr{i}_bad``
    (violating rows), plus ``jr_payload_bad`` (malformed / non-object
    payloads). Append to the fused pass's ``extra_terms`` — JSON payload
    rules then ride the SAME single scan as the column stats, exactly
    like :func:`~.conditional.conditional_check_terms`."""
    payload = F.col(f"`{col}`")
    valid = F.json_object_keys(payload).isNotNull()
    terms: List[Column] = [
        F.count_if(payload.isNotNull() & ~valid).alias("jr_payload_bad")
    ]
    for i, r in enumerate(rules):
        facets = _facet_exprs(valid, payload, r)
        terms.append(F.count_if(valid).alias(f"jr{i}_app"))
        terms.append(
            F.count_if(_violated_expr(facets, r)).alias(f"jr{i}_bad")
        )
    return terms


def evaluate_json_contract_checks(
    extras: Mapping[str, object],
    rules: Sequence[JsonFieldRule],
    *,
    col: str = "props",
) -> List[Issue]:
    """Turn the fused-pass counters into Issues (one per failing rule;
    one for payload rot when present)."""
    issues: List[Issue] = []
    bad_payload = int(extras.get("jr_payload_bad") or 0)
    if bad_payload > 0:
        issues.append(
            Issue(
                kind="json_payload",
                message=(
                    f"{bad_payload} malformed or non-object JSON "
                    f"payload(s) in column {col!r}"
                ),
                column=col,
                observed=bad_payload,
                expected=0,
            )
        )
    for i, r in enumerate(rules):
        bad = int(extras.get(f"jr{i}_bad") or 0)
        app = int(extras.get(f"jr{i}_app") or 0)
        if bad > 0:
            issues.append(
                Issue(
                    kind="json_field",
                    message=(
                        f"json rule violated on {bad} of {app} "
                        f"valid-payload row(s): {r.label}"
                    ),
                    column=col,
                    observed=bad,
                    expected=0,
                )
            )
    return issues

"""Contract validation for semi-structured (JSON string) payload columns.

Extends the engine's contract system INTO the payload a flat column
contract cannot address (reference ``validate_contract.py`` validates
named columns only; this is an engine extension like
:class:`~..types.ConditionalRule`): per-field required / dtype / range /
domain / pattern rules over a JSON string column, compiled entirely to
Catalyst (one ``from_json`` parse with a string-leaf schema shared by
every rule + ``try_cast`` + predicates) — the JSON-Schema-shaped subset
that is exactly replicable in ANSI SQL.

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

from typing import List, Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..types import Issue, JsonFieldRule

__all__ = [
    "JsonFieldRule",
    "PAYLOAD_RULE",
    "PARSED_COL",
    "json_contract_report",
    "json_contract_violations",
    "json_contract_check_terms",
    "json_contract_pre_columns",
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


#: trie leaf sentinel for the merged extraction schema
_LEAF = object()


def _merged_schema(rules: Sequence[JsonFieldRule]) -> Optional[T.StructType]:
    """Merge every rule's dot path into ONE nested struct-of-strings
    schema so the whole contract extracts from a single ``from_json``
    parse. Returns None when the paths conflict (some field is both a
    leaf and a prefix of another rule's path) — the caller then falls
    back to per-rule ``get_json_object``."""
    root: dict = {}
    seen_casings: dict = {}  # node id -> {lower: original}
    for r in rules:
        segs = r.field.split(".")
        node = root
        for i, s in enumerate(segs):
            # struct getField resolves case-INsensitively under Spark's
            # default spark.sql.caseSensitive=false, so two rule fields
            # differing only in case ("tag" / "TAG") would make the
            # merged-struct access ambiguous (AnalysisException) — a
            # conflict; fall back to per-rule get_json_object, which is
            # case-exact
            casings = seen_casings.setdefault(id(node), {})
            prior = casings.get(s.lower())
            if prior is not None and prior != s:
                return None
            casings[s.lower()] = s
            if i < len(segs) - 1:
                child = node.get(s)
                if child is _LEAF:
                    return None
                if child is None:
                    child = node[s] = {}
                node = child
            else:
                existing = node.get(s)
                if existing is not None and existing is not _LEAF:
                    return None
                node[s] = _LEAF

    def to_struct(node: dict) -> T.StructType:
        return T.StructType(
            [
                T.StructField(
                    k,
                    T.StringType() if v is _LEAF else to_struct(v),
                    True,
                )
                for k, v in node.items()
            ]
        )

    return to_struct(root)


#: projected helper-column name carrying the shared from_json parse
PARSED_COL = "__json_parsed__"


def json_contract_pre_columns(
    rules: Sequence[JsonFieldRule], *, col: str = "props"
) -> dict:
    """Projection column materializing the shared JSON parse ONCE.

    Returns ``{PARSED_COL: from_json(col, merged_schema)}`` to add via
    ``df.withColumns`` BEFORE the facet expressions are evaluated — or
    ``{}`` when the rule paths conflict (the facets then fall back to
    per-rule ``get_json_object``).

    Why a real projection instead of inlining ``from_json`` into every
    term: Catalyst's JSON schema pruning rewrites each
    ``from_json(...).field`` access to a per-field pruned parse, so k
    inlined accesses become k distinct (non-CSE-able) parses again. A
    projected column is multi-referenced and non-cheap, so
    ``CollapseProject`` keeps it as one expression — the executed plan
    carries exactly one JSON parse per payload column regardless of how
    many fields the contract declares.
    """
    schema = _merged_schema(rules)
    if schema is None:
        return {}
    return {PARSED_COL: F.from_json(F.col(f"`{col}`"), schema)}


def _rule_values(
    payload: Column,
    rules: Sequence[JsonFieldRule],
    parsed: Optional[Column] = None,
) -> List[Column]:
    """Per-rule extracted-value columns from ONE JSON parse.

    The scale fix for this module's dominant cost: k rules used to mean
    k ``GetJsonObject`` parses of the same payload string per row; now
    every rule reads a struct field off a single ``from_json`` with a
    string-leaf schema (``parsed``, materialized by
    :func:`json_contract_pre_columns`), so the payload is tokenized
    once per row no matter how many fields the contract declares.
    Rendering semantics are unchanged — for non-string JSON values both
    ``get_json_object`` and the string-typed ``from_json`` leaf
    serialize the value through the same Jackson copy-event path
    (numbers/booleans/nested objects render identically, JSON null
    stays NULL), which is what the DuckDB oracle pins. Conflicting rule
    paths (a field that is both a leaf and a parent, or two fields
    differing only in case — struct access is case-insensitive under
    Spark defaults) cannot share one struct schema and fall back to
    per-rule ``get_json_object``.

    One DOCUMENTED divergence: on a payload with DUPLICATE keys (RFC
    8259 undefined behavior; a producer bug) the struct path reads the
    LAST occurrence — the ecosystem-default resolution (JavaScript,
    Python ``json``, Jackson databind) — where ``get_json_object`` and
    DuckDB's yyjson read the FIRST. Rows like that can therefore score
    facets against the other copy of the key than the oracle does;
    surface duplicate-key payloads with ``json_key_census`` (which
    counts every occurrence) rather than relying on which copy wins."""
    if parsed is None:
        return [F.get_json_object(payload, f"$.{r.field}") for r in rules]
    out: List[Column] = []
    for r in rules:
        v: Column = parsed
        for s in r.field.split("."):
            v = v.getField(s)
        out.append(v)
    return out


def _facet_exprs(
    valid: Column, v: Column, rule: JsonFieldRule
) -> List[Column]:
    """Boolean facet columns [missing, type, range, domain, pattern]
    for one rule over its extracted value ``v`` (from
    :func:`_rule_values`) — missing is raw presence (required-ness is
    applied by the caller), the rest are violations. Pure Catalyst."""
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
    pre = json_contract_pre_columns(rules, col=col)
    values = _rule_values(
        payload, rules, parsed=F.col(PARSED_COL) if pre else None
    )
    for i, (r, v) in enumerate(zip(rules, values)):
        facets = _facet_exprs(valid, v, r)
        for fname, fexpr in zip(_FACETS, facets):
            terms.append(F.count_if(fexpr).alias(f"r{i}_{fname}"))
        terms.append(
            F.count_if(_violated_expr(facets, r)).alias(f"r{i}_bad")
        )

    agg = (df.withColumns(pre) if pre else df).agg(*terms)

    def q(s: str) -> str:
        # SQL string literal: double quotes AND backslashes — Spark's
        # default non-ANSI parser treats backslash as an escape inside
        # string literals, so a raw backslash in a rule label would
        # corrupt the stack() pivot's label (or fail to parse)
        return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

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
    pre = json_contract_pre_columns(rules, col=col)
    values = _rule_values(
        payload, rules, parsed=F.col(PARSED_COL) if pre else None
    )
    for r, v in zip(rules, values):
        facets = _facet_exprs(valid, v, r)
        first_fail = F.lit(None).cast("string")
        order = list(zip(_FACETS, facets))
        if not r.required:
            order = order[1:]  # missing never fails a non-required rule
        for fname, fexpr in reversed(order):
            first_fail = F.when(fexpr, F.lit(fname)).otherwise(first_fail)
        labels.append(
            F.when(
                _violated_expr(facets, r),
                F.struct(
                    F.lit(r.label).alias("rule"),
                    first_fail.alias("facet"),
                ),
            )
        )

    # Null labels drop inside the array, so clean rows pack an EMPTY
    # array; explode_outer turns them into a single NULL row that the
    # post-explode guard removes. Row multiplication still applies only
    # to dirty rows. Why this exact shape and not a pre-explode
    # disjunction filter or a plain explode: either of those puts a
    # filter below/above the Generate that the optimizer pushes through
    # the parse projection by SUBSTITUTING the facet expressions, which
    # splits the single from_json back into per-field pruned parses on
    # every row. The isnotnull(_v) guard references the generator
    # output, so it can never be pushed below the Generate — the
    # executed plan keeps exactly ONE JSON parse per payload column.
    packed = F.filter(F.array(*labels), lambda x: x.isNotNull())
    projected = (df.withColumns(pre) if pre else df).select(
        *[F.col(f"`{c}`") for c in id_cols],
        packed.alias("_packed"),
    )
    return (
        projected.select(
            *[F.col(f"`{c}`") for c in id_cols],
            F.explode_outer(F.col("_packed")).alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
        .select(
            *[F.col(f"`{c}`") for c in id_cols],
            F.col("_v.rule").alias("rule"),
            F.col("_v.facet").alias("facet"),
        )
    )


def json_contract_check_terms(
    rules: Sequence[JsonFieldRule],
    *,
    col: str = "props",
    use_parsed: bool = False,
) -> List[Column]:
    """Fused-aggregation terms for TableContract integration: per rule,
    ``jr{i}_app`` (valid-object payload rows) and ``jr{i}_bad``
    (violating rows), plus ``jr_payload_bad`` (malformed / non-object
    payloads). Append to the fused pass's ``extra_terms`` — JSON payload
    rules then ride the SAME single scan as the column stats, exactly
    like :func:`~.conditional.conditional_check_terms`.

    Pass ``use_parsed=True`` when the caller also feeds
    :func:`json_contract_pre_columns` (non-empty) into the fused pass's
    ``pre_columns`` — the terms then read the materialized single-parse
    struct instead of re-parsing per rule."""
    payload = F.col(f"`{col}`")
    valid = F.json_object_keys(payload).isNotNull()
    terms: List[Column] = [
        F.count_if(payload.isNotNull() & ~valid).alias("jr_payload_bad")
    ]
    values = _rule_values(
        payload, rules, parsed=F.col(PARSED_COL) if use_parsed else None
    )
    for i, (r, v) in enumerate(zip(rules, values)):
        facets = _facet_exprs(valid, v, r)
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

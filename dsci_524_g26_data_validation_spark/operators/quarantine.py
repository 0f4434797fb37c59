"""Row-routing quarantine: split a frame into contract-clean rows and
violating rows tagged with WHY — the enforcement mode of the engine
(the Delta-Live-Tables ``expect_or_drop`` / Deequ row-level-filtering
analog), built on the same compiled Catalyst predicates as
:func:`~..operators.validate.violation_rows`.

The reference package only *reports* violations
(``validation.py`` returns issue lists); a 100 TB pipeline also needs
to *route* rows — clean rows continue downstream, dirty rows land in a
quarantine sink carrying machine-readable reasons so they can be
triaged, repaired and replayed. Design notes:

* **One projection tags everything.** Every contract facet (range
  lower/upper, category) and every optional row-level conditional rule
  compiles to a Catalyst boolean; the tag array is
  ``array_compact(array(when(p, tag), ...))`` — pure whole-stage
  codegen, no UDFs, no second pass per rule.
* **One scan routes everything.** :func:`write_quarantine` writes the
  tagged frame partitioned by the validity bit, so valid rows and
  quarantined rows land in separate directories from a SINGLE job;
  row/valid counts ride the same job via ``Observation`` metrics
  (zero extra actions).
* **Split-as-plans.** :func:`quarantine_split` returns two lazy
  DataFrames (filters over the shared tagged projection) for callers
  composing further transformations; if both are materialized
  independently Spark will scan twice — for write-through routing use
  :func:`write_quarantine`, which never does.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..plans.rule_compiler import (
    categorical_cast,
    is_numeric_spark_type,
    pattern_violation,
    violation_predicates,
)
from ..types import ConditionalRule, Contract
from .conditional import violated_expr

__all__ = [
    "violation_tags_expr",
    "tag_rows",
    "quarantine_split",
    "write_quarantine",
    "repair_rows",
]


def violation_tags_expr(
    df: DataFrame,
    contract: Contract,
    rules: Sequence[ConditionalRule] = (),
) -> Column:
    """``array<string>`` of violation tags for one row, e.g.
    ``['range:o_totalprice', 'category:o_orderpriority',
    'conditional:ship_before_receipt']``. Empty array == clean row.

    Tags are sorted so downstream grouping/diffing is deterministic
    regardless of contract-column declaration order. NULL cells never
    produce range/category tags (3VL: the predicate is NULL, the WHEN
    yields NULL, ``array_compact`` drops it) — identical semantics to
    ``violation_rows``; NULL-THEN conditional rules DO tag (a row whose
    promised consequence is unknown is not clean, matching
    ``conditional.violated_expr``).
    """
    slots = []
    for col, plist in violation_predicates(df, contract).items():
        for kind, p in plist:
            slots.append(F.when(p, F.lit(f"{kind}:{col}")))
    for r in rules:
        slots.append(F.when(violated_expr(r), F.lit(f"conditional:{r.label}")))
    if not slots:
        return F.array().cast("array<string>")
    return F.array_sort(F.array_compact(F.array(*slots)))


def tag_rows(
    df: DataFrame,
    contract: Contract,
    *,
    rules: Sequence[ConditionalRule] = (),
    tags_col: str = "violations",
    valid_col: str = "is_valid",
) -> DataFrame:
    """Append ``violations: array<string>`` and ``is_valid: boolean`` to
    every row in one codegen projection (no shuffle, no action)."""
    for c in (tags_col, valid_col):
        if c in df.columns:
            raise ValueError(f"tag_rows: column '{c}' already exists")
    tags = violation_tags_expr(df, contract, rules)
    return df.withColumn(tags_col, tags).withColumn(
        valid_col, F.size(F.col(f"`{tags_col}`")) == 0
    )


def quarantine_split(
    df: DataFrame,
    contract: Contract,
    *,
    rules: Sequence[ConditionalRule] = (),
) -> Tuple[DataFrame, DataFrame]:
    """``(valid, quarantined)`` as two lazy plans over one shared tagged
    projection. ``valid`` has exactly the input schema; ``quarantined``
    carries the extra ``violations`` reason column. Materializing both
    separately scans twice — for single-scan write-through routing use
    :func:`write_quarantine`."""
    tagged = tag_rows(df, contract, rules=rules)
    valid = tagged.filter("is_valid").select(*[F.col(f"`{c}`") for c in df.columns])
    quarantined = tagged.filter("NOT is_valid").drop("is_valid")
    return valid, quarantined


def write_quarantine(
    df: DataFrame,
    contract: Contract,
    path: str,
    *,
    rules: Sequence[ConditionalRule] = (),
    format: str = "parquet",
    mode: str = "error",
    partition_cols: Sequence[str] = (),
) -> Dict[str, object]:
    """Route the whole frame in ONE job: writes ``{path}/is_valid=true``
    (clean rows) and ``{path}/is_valid=false`` (rows + ``violations``)
    via a partitioned write, counting rows with ``Observation`` metrics
    on the same job — no second scan, no count actions.

    ``partition_cols`` adds user partitioning UNDER the validity split
    (``is_valid=<b>/source=<s>/...``). Returns a routing manifest dict:
    ``n_rows / n_valid / n_quarantined / valid_path / quarantine_path``.
    """
    tagged = tag_rows(df, contract, rules=rules)
    obs = Observation()
    tagged = tagged.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("is_valid")).alias("n_valid"),
    )
    (
        tagged.write.format(format)
        .mode(mode)
        .partitionBy("is_valid", *partition_cols)
        .save(path)
    )
    got = obs.get
    n_rows = int(got["n_rows"])
    n_valid = int(got["n_valid"])
    return {
        "n_rows": n_rows,
        "n_valid": n_valid,
        "n_quarantined": n_rows - n_valid,
        "valid_path": f"{path}/is_valid=true",
        "quarantine_path": f"{path}/is_valid=false",
    }


def repair_rows(
    df: DataFrame,
    contract: Contract,
    *,
    range_strategy: str = "clamp",
    category_strategy: str = "null",
    repaired_col: Optional[str] = "repaired",
) -> DataFrame:
    """Contract-driven value repair in ONE codegen projection — the
    third enforcement mode after report (``violation_rows``) and route
    (:func:`quarantine_split`): fix what is mechanically fixable and
    record what was touched.

    Strategies (per facet, never per row — no UDFs, no shuffle):

    * range ``'clamp'``: values below ``min_value`` become ``min_value``,
      above ``max_value`` become ``max_value`` (winsorization — the
      standard bounded-feature repair); ``'null'``: out-of-range values
      become NULL for a downstream imputation stage.
    * category ``'null'``: values outside ``allowed_values`` become NULL
      (there is no defensible automatic fallback; NULL routes the cell
      to imputation and keeps the domain contract true by construction).
    * pattern: full-match failures are nulled for the same reason —
      a format violation has no mechanical fix.

    NULL cells are never "repaired" (the violation predicate is NULL →
    the WHEN falls through to the original value) — 3VL-consistent with
    :func:`tag_rows` and ``violation_rows``, and deliberately NOT
    ``greatest/least``-based clamping, whose NULL-skipping semantics
    would silently turn NULL into ``min_value``.

    ``repaired_col`` (default ``'repaired'``) appends a sorted
    ``array<string>`` of ``'kind:column'`` tags naming the facets that
    actually fired for the row — the audit trail that lets a replay
    pipeline distinguish repaired rows from originally-clean ones; pass
    ``None`` to keep exactly the input schema.

    Output contract: ``tag_rows(repair_rows(df, c), c).is_valid`` is
    True for every row whose only violations were range/category/pattern
    facets
    (conditional rules are assertions about the business process, not
    cell values — they are not repairable and not touched here).
    """
    if range_strategy not in ("clamp", "null"):
        raise ValueError(f"unknown range_strategy: {range_strategy!r}")
    if category_strategy != "null":
        raise ValueError(f"unknown category_strategy: {category_strategy!r}")
    if repaired_col is not None and repaired_col in df.columns:
        raise ValueError(f"repair_rows: column '{repaired_col}' already exists")

    schema = {f.name: f.dataType for f in df.schema.fields}
    out_cols = []
    tag_slots = []
    for col in df.columns:
        rule = contract.columns.get(col)
        c = F.col(f"`{col}`")
        if rule is None:
            out_cols.append(c)
            continue
        dt = schema[col]
        expr = c
        numeric_like = is_numeric_spark_type(dt) or isinstance(dt, T.BooleanType)
        num_c = c.cast("int") if isinstance(dt, T.BooleanType) else c
        range_fired = None
        if numeric_like and rule.min_value is not None:
            p = num_c < F.lit(rule.min_value)
            fix = (
                F.lit(rule.min_value).cast(dt)
                if range_strategy == "clamp"
                else F.lit(None).cast(dt)
            )
            expr = F.when(p, fix).otherwise(expr)
            range_fired = p if range_fired is None else (range_fired | p)
        if numeric_like and rule.max_value is not None:
            p = num_c > F.lit(rule.max_value)
            fix = (
                F.lit(rule.max_value).cast(dt)
                if range_strategy == "clamp"
                else F.lit(None).cast(dt)
            )
            expr = F.when(p, fix).otherwise(expr)
            range_fired = p if range_fired is None else (range_fired | p)
        if range_fired is not None:
            tag_slots.append(F.when(range_fired, F.lit(f"range:{col}")))
        if rule.allowed_values is not None:
            sc = categorical_cast(c, dt)
            p = sc.isNotNull() & ~sc.isin(sorted(rule.allowed_values))
            expr = F.when(p, F.lit(None).cast(dt)).otherwise(expr)
            tag_slots.append(F.when(p, F.lit(f"category:{col}")))
        if rule.pattern is not None and isinstance(dt, T.StringType):
            p = pattern_violation(c, rule.pattern)
            expr = F.when(p, F.lit(None).cast(dt)).otherwise(expr)
            tag_slots.append(F.when(p, F.lit(f"pattern:{col}")))
        out_cols.append(expr.alias(col))

    if repaired_col is not None:
        tags = (
            F.array_sort(F.array_compact(F.array(*tag_slots)))
            if tag_slots
            else F.array().cast("array<string>")
        )
        out_cols.append(tags.alias(repaired_col))
    return df.select(*out_cols)

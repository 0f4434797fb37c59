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

from ..plans.rule_compiler import violation_predicates
from ..types import ConditionalRule, Contract
from .conditional import violated_expr

__all__ = [
    "violation_tags_expr",
    "tag_rows",
    "quarantine_split",
    "write_quarantine",
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

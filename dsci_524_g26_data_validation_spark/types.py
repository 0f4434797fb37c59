"""Core data-contract types for the Spark-native validation engine.

Semantics mirror the reference package ``pyos_data_validation``
(/root/reference/src/pyos_data_validation/types.py:25-146) but are written
from scratch for a PySpark engine:

* the dtype vocabulary is Spark SQL ``simpleString`` names (``bigint``,
  ``double``, ``string``, ``boolean``, ``timestamp``, ``array<int>`` …),
* pandas-era dtype strings from reference contracts are accepted and
  normalized through :func:`normalize_dtype`,
* contracts serialize to/from JSON so they can be shipped with
  ``spark-submit --py-files`` and stored next to an Iceberg table.

Driver-side only — nothing in this module touches a SparkSession.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Set, Tuple

__all__ = [
    "ColumnRule",
    "Contract",
    "Issue",
    "ValidationResult",
    "DriftReport",
    "Summary",
    "ContractViolationError",
    "ColumnProfile",
    "TableProfile",
    "Histogram",
    "TableContract",
    "ForeignKeyRule",
    "FunctionalDependencyRule",
    "AggregateCheck",
    "ConditionalRule",
    "JsonFieldRule",
    "normalize_dtype",
    "dtypes_equivalent",
    "contract_to_dict",
    "contract_from_dict",
    "contract_to_json",
    "table_contract_to_dict",
    "table_contract_from_dict",
    "table_contract_to_json",
    "table_contract_from_json",
    "table_contract_fingerprint",
    "contract_from_json",
]


# ---------------------------------------------------------------------------
# dtype vocabulary
# ---------------------------------------------------------------------------

# pandas-era dtype strings (reference vocabulary, types.py:30 of the
# reference) → Spark SQL simpleString. Spark names map to themselves so
# normalize_dtype is idempotent.
_PANDAS_TO_SPARK: Dict[str, str] = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "int": "bigint",
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "bigint",
    "uint64": "bigint",
    "float16": "float",
    "float32": "float",
    "float64": "double",
    "float": "double",
    "object": "string",
    "str": "string",
    "string": "string",
    "category": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "datetime64[ns]": "timestamp",
    "datetime64[us]": "timestamp",
    "datetime64[ms]": "timestamp",
    "datetime": "timestamp",
    # Spark 4 reads parquet TIMESTAMP(isAdjustedToUTC=false) as
    # timestamp_ntz; the reference vocabulary has a single datetime type,
    # so both Spark timestamp flavors normalize to one equivalence class.
    "timestamp_ntz": "timestamp",
    "timedelta64[ns]": "interval day to second",
}

#: Spark numeric simpleStrings (NumericType family) — drives range checks.
NUMERIC_SPARK_TYPES: Set[str] = {
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
}


def normalize_dtype(dtype: str) -> str:
    """Normalize a dtype string (pandas- or Spark-vocabulary) to Spark SQL.

    Unknown strings (e.g. ``array<int>``, ``decimal(10,2)``) pass through
    lowercased/stripped — they are already Spark vocabulary.
    """
    key = dtype.strip()
    return _PANDAS_TO_SPARK.get(key, _PANDAS_TO_SPARK.get(key.lower(), key.lower()))


def dtypes_equivalent(expected: str, observed: str) -> bool:
    """Reference dtype-match rule, generalized.

    The reference treats ``object``/``str``/``string`` as mutually
    equivalent and all other dtype strings as exact-match
    (validate_contract.py:107-115 in the reference). Normalizing both
    sides to Spark vocabulary preserves that rule (all three string
    spellings collapse to ``string``) while also letting reference-era
    contracts (``int64``) validate Spark frames (``bigint``).
    """
    return normalize_dtype(expected) == normalize_dtype(observed)


# ---------------------------------------------------------------------------
# Contract
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ColumnRule:
    """Per-column expectations (reference types.py:25-40 semantics).

    dtype: Spark SQL type string (pandas-era strings accepted, normalized
        at check time).
    max_missing_frac: allowed fraction of NULLs in [0, 1]; a fraction
        exactly at the threshold passes (strict ``>`` comparison).
    min_value / max_value: inclusive numeric bounds (optional).
    allowed_values: allowed categorical values as strings (optional).
    pattern: regex every non-NULL value must match IN FULL (engine
        extension — format contracts for ids/emails/codes). Full-match,
        not search: the engine compiles ``rlike '^(?:p)$'``, the
        explicit form of what naive ``rlike 'p'`` silently gets wrong
        (a partial hit passes junk like ``'x123y'`` for ``'[0-9]+'``).
        Applied to string-typed columns only; NULLs are missingness's
        concern, never pattern violations. Keep the regex to constructs
        Java regex and RE2 share if results must be engine-portable.
    """

    dtype: str
    max_missing_frac: float = 0.0
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    allowed_values: Optional[Set[str]] = None
    pattern: Optional[str] = None


@dataclass(frozen=True)
class Contract:
    """Dataset contract: column name → :class:`ColumnRule`."""

    columns: Dict[str, ColumnRule]
    name: str = "contract"


# ---------------------------------------------------------------------------
# Validation output
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Issue:
    """One validation issue (reference types.py:56-71).

    kind ∈ {missing_column, extra_column, dtype, missingness, range,
    category, pattern} for contract checks, plus engine-level kinds
    {uniqueness, referential, invariant, drift_chi2, drift_psi,
    drift_ks, drift_js, drift_emd, token_equality, aggregate_check,
    functional_dependency}.
    ``column is None`` marks a dataset-level issue.
    """

    kind: str
    message: str
    column: Optional[str] = None
    observed: Any = None
    expected: Any = None


@dataclass(frozen=True)
class ValidationResult:
    """Output of ``validate_contract`` (reference types.py:74-79)."""

    ok: bool
    issues: List[Issue] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Drift
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DriftReport:
    """Output of ``compare_contracts`` (reference types.py:87-117)."""

    added_columns: Set[str] = field(default_factory=set)
    removed_columns: Set[str] = field(default_factory=set)
    dtype_changes: Dict[str, Tuple[str, str]] = field(default_factory=dict)
    range_changes: Set[str] = field(default_factory=set)
    category_changes: Set[str] = field(default_factory=set)
    missingness_changes: Dict[str, Tuple[float, float]] = field(default_factory=dict)

    @property
    def has_drift(self) -> bool:
        return any(
            [
                self.added_columns,
                self.removed_columns,
                self.dtype_changes,
                self.range_changes,
                self.category_changes,
                self.missingness_changes,
            ]
        )


# ---------------------------------------------------------------------------
# Summary
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Summary:
    """Output of ``summarize_violations`` (reference types.py:125-135)."""

    ok: bool
    top_issues: List[Issue] = field(default_factory=list)
    counts_by_kind: Dict[str, int] = field(default_factory=dict)


class ContractViolationError(AssertionError):
    """Raised by ``validate_and_fail`` on a failing ValidationResult.

    Documented-but-unimplemented in the reference (types.py:11,143-146);
    implemented here as the CI gate helper.
    """


# ---------------------------------------------------------------------------
# Profile (P6 — engine-level, BASELINE.json north star)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ColumnProfile:
    """Full profile statistics for one column (superset of ColumnRule).

    Carries the P6 engine statistics the reference never computes:
    approx-distinct (HyperLogLog++) and p25/p50/p75 quantiles
    (Greenwald-Khanna sketch, or exact when requested).
    """

    dtype: str
    null_frac: float = 0.0
    non_null_count: int = 0
    approx_distinct: Optional[int] = None
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    quantiles: Optional[Tuple[float, float, float]] = None  # p25, p50, p75
    allowed_values: Optional[Set[str]] = None


@dataclass(frozen=True)
class TableProfile:
    """Output of ``infer_profile``: the inferred contract plus the full
    per-column statistics it was derived from (one fused scan + one
    guarded domain scan — the user sees every number the pass computed,
    not just the rule fields)."""

    contract: Contract
    columns: Dict[str, ColumnProfile] = field(default_factory=dict)
    n_rows: int = 0


# ---------------------------------------------------------------------------
# Engine-level extensions (BASELINE.json north rule — not in the reference)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Histogram:
    """Baseline distribution for drift scoring (chi-square / PSI).

    Categorical: ``labels`` are category strings. Numeric: ``labels`` are
    bin indices rendered as strings and (lo, hi, n_bins) define the
    equi-width binning; bin 0 / n_bins+1 are the under/overflow bins.
    ``fracs[i]`` is the baseline probability mass of ``labels[i]``.
    """

    labels: Tuple[str, ...]
    fracs: Tuple[float, ...]
    kind: str = "categorical"  # or "numeric"
    lo: Optional[float] = None
    hi: Optional[float] = None
    n_bins: Optional[int] = None


@dataclass(frozen=True)
class ForeignKeyRule:
    """Referential-integrity rule: ``column`` values must appear in the
    reference dimension's ``ref_column``."""

    column: str
    ref_table: str
    ref_column: str


@dataclass(frozen=True)
class FunctionalDependencyRule:
    """Cross-column integrity: ``determinant`` columns must uniquely
    determine ``dependent`` (zip → city, doc_id → content digest)."""

    determinant: Tuple[str, ...]
    dependent: str

    def __post_init__(self):
        object.__setattr__(self, "determinant", tuple(self.determinant))
        if not self.determinant:
            raise ValueError("determinant must name at least one column")

    @property
    def label(self) -> str:
        return f"{', '.join(self.determinant)} -> {self.dependent}"


@dataclass(frozen=True)
class ConditionalRule:
    """Row-level conditional assertion: WHEN ``when`` holds, ``then``
    must hold too (Deequ's ``satisfies``/Great-Expectations row
    conditions; the reference package has no conditional rules — this is
    an engine extension like :class:`AggregateCheck`).

    Both sides are Spark SQL boolean expressions compiled to Catalyst.
    Three-valued-logic contract (explicit, not incidental):

    * a row where ``when`` is NULL/false is **not applicable** — never a
      violation;
    * an applicable row where ``then`` is NULL **is** a violation
      ("couldn't establish the property" fails, matching
      :class:`AggregateCheck`'s NULL-fails stance).

    i.e. violated = ``coalesce(when, false) AND NOT coalesce(then,
    false)`` — a plain Catalyst predicate, so the per-rule violation
    count rides the fused single-scan aggregation pass.
    """

    when: str
    then: str
    name: str = ""

    def __post_init__(self):
        if not self.when or not self.then:
            raise ValueError("ConditionalRule requires both when and then")

    @property
    def label(self) -> str:
        return self.name or f"WHEN {self.when} THEN {self.then}"


@dataclass(frozen=True)
class JsonFieldRule:
    """One declared field of a JSON payload contract (engine extension,
    like :class:`ConditionalRule`): required / dtype / range / domain /
    pattern facets over a dot path inside a JSON string column. Compiled
    to Catalyst by ``operators/json_contract.py`` — the JSON-Schema-
    shaped subset exactly replicable in ANSI SQL; see that module for
    the pinned cross-engine semantics (json-null == missing, integer
    via floor(double), contains-match pattern)."""

    field: str
    required: bool = False
    dtype: Optional[str] = None
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    allowed: Optional[Tuple[str, ...]] = None
    pattern: Optional[str] = None
    name: str = ""

    def __post_init__(self):
        if not self.field:
            raise ValueError("JsonFieldRule requires a field path")
        if self.dtype is not None and self.dtype not in (
            "number",
            "integer",
            "boolean",
        ):
            raise ValueError(
                "dtype must be one of ('number', 'integer', 'boolean'),"
                f" got {self.dtype!r}"
            )
        if (
            self.min_value is not None
            and self.max_value is not None
            and self.min_value > self.max_value
        ):
            raise ValueError("min_value must be <= max_value")
        if self.allowed is not None and len(self.allowed) == 0:
            raise ValueError("allowed, when given, must be non-empty")

    @property
    def label(self) -> str:
        return self.name or f"$.{self.field}"

    @property
    def top_key(self) -> str:
        """First path segment — the top-level key this rule declares."""
        return self.field.split(".", 1)[0]


@dataclass(frozen=True)
class AggregateCheck:
    """Table-level aggregate assertion (Deequ-style "check").

    ``expr`` is any Spark SQL *aggregate* expression evaluated over the
    whole table — e.g. ``avg(o_totalprice)``,
    ``count_if(n_tok > 0) / count(*)``, ``approx_count_distinct(doc_id)
    / count(*)`` — whose value must land in [min_value, max_value]
    (either bound may be open). Every check rides the SAME fused
    single-scan aggregation job as the column stats; adding checks
    never adds a scan.

    A NULL result (e.g. ``avg`` over an empty table) FAILS the check —
    "couldn't establish the property" is a violation, not a pass.
    """

    expr: str
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    name: str = ""

    def __post_init__(self):
        if self.min_value is None and self.max_value is None:
            raise ValueError(
                f"AggregateCheck {self.expr!r}: at least one of "
                "min_value/max_value must be set"
            )

    @property
    def label(self) -> str:
        return self.name or self.expr


@dataclass(frozen=True)
class TableContract:
    """Engine-level table contract = column contract + table-level rules.

    Extends the reference model (which has only per-column rules) with
    the north-rule checks: uniqueness keys (E1), referential integrity
    (E2), baseline histograms for chi-square/PSI drift (E3/E4),
    row-level invariant expressions in Spark SQL syntax (E5), e.g.
    ``n_tok = size(tokens)``, and table-level aggregate assertions
    (:class:`AggregateCheck`).
    """

    contract: Contract
    unique_keys: Tuple[str, ...] = ()
    foreign_keys: Tuple[ForeignKeyRule, ...] = ()
    histograms: Mapping[str, Histogram] = field(default_factory=dict)
    invariants: Tuple[str, ...] = ()
    checks: Tuple[AggregateCheck, ...] = ()
    fds: Tuple[FunctionalDependencyRule, ...] = ()
    conditionals: Tuple[ConditionalRule, ...] = ()
    json_rules: Tuple[JsonFieldRule, ...] = ()
    json_col: str = "props"
    name: str = "table_contract"


# ---------------------------------------------------------------------------
# JSON (de)serialization — schema_version-ed so contracts stored beside an
# Iceberg table survive engine upgrades.
# ---------------------------------------------------------------------------

_SCHEMA_VERSION = 1


def contract_to_dict(contract: Contract) -> Dict[str, Any]:
    return {
        "schema_version": _SCHEMA_VERSION,
        "name": contract.name,
        "columns": {
            col: {
                "dtype": rule.dtype,
                "max_missing_frac": rule.max_missing_frac,
                "min_value": rule.min_value,
                "max_value": rule.max_value,
                "allowed_values": (
                    sorted(rule.allowed_values)
                    if rule.allowed_values is not None
                    else None
                ),
                "pattern": rule.pattern,
            }
            for col, rule in contract.columns.items()
        },
    }


def contract_from_dict(data: Mapping[str, Any]) -> Contract:
    columns = {}
    for col, r in data["columns"].items():
        allowed = r.get("allowed_values")
        columns[col] = ColumnRule(
            dtype=r["dtype"],
            max_missing_frac=r.get("max_missing_frac", 0.0),
            min_value=r.get("min_value"),
            max_value=r.get("max_value"),
            allowed_values=set(allowed) if allowed is not None else None,
            pattern=r.get("pattern"),
        )
    return Contract(columns=columns, name=data.get("name", "contract"))


def contract_to_json(contract: Contract, indent: Optional[int] = None) -> str:
    return json.dumps(contract_to_dict(contract), indent=indent, sort_keys=True)


def contract_from_json(text: str) -> Contract:
    return contract_from_dict(json.loads(text))


def table_contract_to_dict(tc: "TableContract") -> Dict[str, Any]:
    return {
        "schema_version": _SCHEMA_VERSION,
        "name": tc.name,
        "contract": contract_to_dict(tc.contract),
        "unique_keys": list(tc.unique_keys),
        "foreign_keys": [
            {"column": fk.column, "ref_table": fk.ref_table,
             "ref_column": fk.ref_column}
            for fk in tc.foreign_keys
        ],
        "histograms": {
            col: {
                "labels": list(h.labels),
                "fracs": list(h.fracs),
                "kind": h.kind,
                "lo": h.lo,
                "hi": h.hi,
                "n_bins": h.n_bins,
            }
            for col, h in tc.histograms.items()
        },
        "invariants": list(tc.invariants),
        "checks": [
            {"expr": c.expr, "min_value": c.min_value,
             "max_value": c.max_value, "name": c.name}
            for c in tc.checks
        ],
        "fds": [
            {"determinant": list(r.determinant), "dependent": r.dependent}
            for r in tc.fds
        ],
        "conditionals": [
            {"when": r.when, "then": r.then, "name": r.name}
            for r in tc.conditionals
        ],
        "json_rules": [
            {
                "field": r.field,
                "required": r.required,
                "dtype": r.dtype,
                "min_value": r.min_value,
                "max_value": r.max_value,
                "allowed": list(r.allowed) if r.allowed is not None else None,
                "pattern": r.pattern,
                "name": r.name,
            }
            for r in tc.json_rules
        ],
        "json_col": tc.json_col,
    }


def table_contract_from_dict(data: Mapping[str, Any]) -> "TableContract":
    return TableContract(
        contract=contract_from_dict(data["contract"]),
        # a key may be one column (str) or a composite key (list in
        # JSON → tuple here, so round-trips compare equal)
        unique_keys=tuple(
            tuple(k) if isinstance(k, (list, tuple)) else k
            for k in data.get("unique_keys", ())
        ),
        foreign_keys=tuple(
            ForeignKeyRule(fk["column"], fk["ref_table"], fk["ref_column"])
            for fk in data.get("foreign_keys", ())
        ),
        histograms={
            col: Histogram(
                labels=tuple(h["labels"]),
                fracs=tuple(h["fracs"]),
                kind=h.get("kind", "categorical"),
                lo=h.get("lo"),
                hi=h.get("hi"),
                n_bins=h.get("n_bins"),
            )
            for col, h in data.get("histograms", {}).items()
        },
        invariants=tuple(data.get("invariants", ())),
        checks=tuple(
            AggregateCheck(
                expr=c["expr"],
                min_value=c.get("min_value"),
                max_value=c.get("max_value"),
                name=c.get("name", ""),
            )
            for c in data.get("checks", ())
        ),
        fds=tuple(
            FunctionalDependencyRule(
                determinant=tuple(r["determinant"]), dependent=r["dependent"]
            )
            for r in data.get("fds", ())
        ),
        conditionals=tuple(
            ConditionalRule(
                when=r["when"], then=r["then"], name=r.get("name", "")
            )
            for r in data.get("conditionals", ())
        ),
        json_rules=tuple(
            JsonFieldRule(
                field=r["field"],
                required=r.get("required", False),
                dtype=r.get("dtype"),
                min_value=r.get("min_value"),
                max_value=r.get("max_value"),
                allowed=(
                    tuple(r["allowed"])
                    if r.get("allowed") is not None
                    else None
                ),
                pattern=r.get("pattern"),
                name=r.get("name", ""),
            )
            for r in data.get("json_rules", ())
        ),
        json_col=data.get("json_col", "props"),
        name=data.get("name", "table_contract"),
    )


def table_contract_to_json(tc: "TableContract", indent: Optional[int] = None) -> str:
    return json.dumps(table_contract_to_dict(tc), indent=indent, sort_keys=True)


def table_contract_from_json(text: str) -> "TableContract":
    return table_contract_from_dict(json.loads(text))


def table_contract_fingerprint(tc: "TableContract") -> str:
    """Stable content digest of a TableContract — sha256 of its
    canonical (sorted-keys) JSON.

    The resume-correctness key: a checkpoint manifest records which
    partitions passed *under which contract*. Keying completion by the
    contract NAME alone would let an edited contract silently inherit
    pass-records earned under the old rules (the manifest says "done",
    but nothing validated the new bounds) — so
    ``run_resumable_validation`` stores this fingerprint in lineage and
    re-runs any partition whose record carries a different one.
    Sorted-keys JSON makes the digest independent of dict insertion
    order; sets are serialized sorted by ``contract_to_dict``.
    """
    import hashlib

    return hashlib.sha256(
        table_contract_to_json(tc).encode("utf-8")
    ).hexdigest()

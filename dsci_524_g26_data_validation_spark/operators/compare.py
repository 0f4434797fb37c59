"""compare_contracts: metadata-only drift detection between two contracts.

Pure driver code — zero Spark jobs, exactly like the reference
(/root/reference/src/pyos_data_validation/compare_contracts.py:80-143;
its docstring pins "compares contract metadata only"). Semantics
reproduced exactly, including the subtle bits the reference tests pin:

* direction: a = old/baseline, b = new (compare_contracts.py:11-14);
* dtype compare is RAW string ``!=`` — no string-type normalization here,
  unlike validation (test_compare_contracts.py:226-246 treats
  category→string as a dtype change);
* range/category drift only evaluated when dtype is UNCHANGED
  (compare_contracts.py:120-127);
* missingness drift evaluated regardless of dtype change;
* float comparisons are exact ``!=`` by design — do not "fix" with
  tolerances (SURVEY.md §7 risk c);
* both contracts are rule-validated first (TypeError / ValueError paths,
  compare_contracts.py:83-100).

Extension: when both contracts carry baseline histograms (engine-level
TableContract), the drift operators in ``operators.drift`` score
chi-square/PSI — that path inspects data, not this one.
"""

from __future__ import annotations

from ..types import (
    ColumnRule,
    Contract,
    DriftReport,
    Issue,
    ValidationResult,
    normalize_dtype,
)

__all__ = ["compare_contracts", "compare_table_contracts", "read_compatibility"]


def _check_rules(contract: Contract) -> None:
    for column, rule in contract.columns.items():
        if not isinstance(rule, ColumnRule):
            raise TypeError(f"Column rule for {column} must be a ColumnRule instance")
        if not isinstance(rule.max_missing_frac, (int, float)):
            raise ValueError(f"max_missing_frac for {column} must be numeric")
        if rule.max_missing_frac < 0 or rule.max_missing_frac > 1:
            raise ValueError(f"max_missing_frac for {column} must be between 0 and 1")
        if rule.min_value is not None and rule.max_value is not None:
            if rule.min_value > rule.max_value:
                raise ValueError(f"min_value cannot exceed max_value for {column}")


def compare_contracts(contract_a: Contract, contract_b: Contract) -> DriftReport:
    """Diff two contracts → DriftReport (a=old/baseline, b=new)."""
    if not isinstance(contract_a, Contract) or not isinstance(contract_b, Contract):
        raise TypeError("contract_a and contract_b must be Contract instances")

    _check_rules(contract_a)
    _check_rules(contract_b)

    cols_a = set(contract_a.columns)
    cols_b = set(contract_b.columns)

    dtype_changes = {}
    range_changes = set()
    category_changes = set()
    missingness_changes = {}

    for column in cols_a & cols_b:
        ra = contract_a.columns[column]
        rb = contract_b.columns[column]

        if ra.dtype != rb.dtype:
            dtype_changes[column] = (ra.dtype, rb.dtype)
        else:
            # range/category drift is dtype-gated (reference :120-127)
            if ra.min_value != rb.min_value or ra.max_value != rb.max_value:
                range_changes.add(column)
            if ra.allowed_values != rb.allowed_values:
                category_changes.add(column)

        if ra.max_missing_frac != rb.max_missing_frac:
            missingness_changes[column] = (ra.max_missing_frac, rb.max_missing_frac)

    return DriftReport(
        added_columns=cols_b - cols_a,
        removed_columns=cols_a - cols_b,
        dtype_changes=dtype_changes,
        range_changes=range_changes,
        category_changes=category_changes,
        missingness_changes=missingness_changes,
    )


def compare_table_contracts(tc_a, tc_b) -> dict:
    """Metadata-only diff of two TableContracts (a=old, b=new).

    Extends :func:`compare_contracts` with the engine-level rule surface:
    unique keys, foreign keys, invariants, and — when both sides stored
    baseline histograms for a column — the PSI between the two BASELINES
    themselves (a pure fold over stored bin fractions; still zero Spark
    jobs, per the reference's metadata-only doctrine).

    Returns {"columns": DriftReport, "unique_keys_added/removed",
    "foreign_keys_added/removed", "invariants_added/removed",
    "baseline_psi": {col: psi}}.
    """
    import math

    report = compare_contracts(tc_a.contract, tc_b.contract)
    fk = lambda t: {(f.column, f.ref_table, f.ref_column) for f in t.foreign_keys}  # noqa: E731

    baseline_psi = {}
    for col in set(tc_a.histograms) & set(tc_b.histograms):
        ha, hb = tc_a.histograms[col], tc_b.histograms[col]
        labels = sorted(set(ha.labels) | set(hb.labels))
        da = dict(zip(ha.labels, ha.fracs))
        db = dict(zip(hb.labels, hb.fracs))
        val = 0.0
        for lab in labels:
            p = max(db.get(lab, 0.0), 1e-6)
            q = max(da.get(lab, 0.0), 1e-6)
            val += (p - q) * math.log(p / q)
        baseline_psi[col] = val

    # unique_keys may mix single-column strs and composite tuples (the
    # GX adapter emits both); sort under a tuple-normalized key so the
    # diff never compares str < tuple
    def _uk_sort_key(k):
        return (k,) if isinstance(k, str) else tuple(k)

    return {
        "columns": report,
        "unique_keys_added": sorted(
            set(tc_b.unique_keys) - set(tc_a.unique_keys), key=_uk_sort_key
        ),
        "unique_keys_removed": sorted(
            set(tc_a.unique_keys) - set(tc_b.unique_keys), key=_uk_sort_key
        ),
        "foreign_keys_added": sorted(fk(tc_b) - fk(tc_a)),
        "foreign_keys_removed": sorted(fk(tc_a) - fk(tc_b)),
        "invariants_added": sorted(set(tc_b.invariants) - set(tc_a.invariants)),
        "invariants_removed": sorted(set(tc_a.invariants) - set(tc_b.invariants)),
        "baseline_psi": baseline_psi,
    }


# ---------------------------------------------------------------------------
# Read compatibility (schema-registry-style, engine extension)
# ---------------------------------------------------------------------------

#: Avro-style type promotions on NORMALIZED Spark dtypes. The engine's
#: dtype model (types.normalize_dtype, pinned by the reference's
#: int64≡bigint equivalence) collapses every integer width to ``bigint``
#: and float→``double``, so width changes WITHIN a family are already
#: equivalent engine-wide; the one cross-family promotion is
#: integer→floating (lossy above 2^53, exactly the promotion Avro
#: permits for long→double).
#: Note the normalized space still distinguishes tinyint/smallint/int
#: (from int8/int16/int32) even though bare "int"/"int64" both map to
#: bigint — so the ladder is spelled out; unreachable edges are harmless.
_PROMOTIONS = {
    "tinyint": {"smallint", "int", "bigint", "float", "double"},
    "smallint": {"int", "bigint", "float", "double"},
    "int": {"bigint", "float", "double"},
    "bigint": {"float", "double"},
    "float": {"double"},
}


def _readable_as(writer_dtype: str, reader_dtype: str) -> bool:
    w = normalize_dtype(writer_dtype)
    r = normalize_dtype(reader_dtype)
    return w == r or r in _PROMOTIONS.get(w, ())


def read_compatibility(writer: Contract, reader: Contract) -> ValidationResult:
    """Can data WRITTEN under ``writer`` be consumed by code expecting
    ``reader``? (The schema-registry "can this consumer read that
    producer" question — `compare_contracts` tells you WHAT changed,
    this tells you whether the change breaks a consumer.)

    Pure metadata, zero Spark jobs. A reader column is compatible when
    the writer provides it with an identical-or-promotable dtype
    (Avro-style promotions: int widening, int→float/double,
    float→double) AND every writer guarantee is at least as strong as
    the reader's expectation:

    * missingness: writer.max_missing_frac ≤ reader's tolerance;
    * range: the writer's [min, max] lies inside the reader's (an
      unbounded writer side vs a bounded reader side is incompatible);
    * categories: writer's allowed set ⊆ reader's (an open writer
      domain vs a closed reader domain is incompatible).

    Writer columns the reader doesn't name are ignored (projection).
    Returns a :class:`ValidationResult`; each incompatibility is an
    Issue with kind ∈ {missing_column, dtype, missingness, range,
    category}.
    """
    if not isinstance(writer, Contract) or not isinstance(reader, Contract):
        raise TypeError("writer and reader must be Contract instances")
    _check_rules(writer)
    _check_rules(reader)

    issues = []
    for column, rr in reader.columns.items():
        wr = writer.columns.get(column)
        if wr is None:
            issues.append(
                Issue(
                    kind="missing_column",
                    message=f"reader requires column '{column}' the writer does not provide",
                    column=column,
                    observed=None,
                    expected=rr.dtype,
                )
            )
            continue
        if not _readable_as(wr.dtype, rr.dtype):
            issues.append(
                Issue(
                    kind="dtype",
                    message=(
                        f"column '{column}': writer dtype {wr.dtype!r} is not "
                        f"readable as {rr.dtype!r}"
                    ),
                    column=column,
                    observed=wr.dtype,
                    expected=rr.dtype,
                )
            )
        if wr.max_missing_frac > rr.max_missing_frac:
            issues.append(
                Issue(
                    kind="missingness",
                    message=(
                        f"column '{column}': writer permits missing frac "
                        f"{wr.max_missing_frac} above reader tolerance "
                        f"{rr.max_missing_frac}"
                    ),
                    column=column,
                    observed=wr.max_missing_frac,
                    expected=rr.max_missing_frac,
                )
            )
        lo_bad = rr.min_value is not None and (
            wr.min_value is None or wr.min_value < rr.min_value
        )
        hi_bad = rr.max_value is not None and (
            wr.max_value is None or wr.max_value > rr.max_value
        )
        if lo_bad or hi_bad:
            issues.append(
                Issue(
                    kind="range",
                    message=(
                        f"column '{column}': writer range "
                        f"[{wr.min_value}, {wr.max_value}] exceeds reader range "
                        f"[{rr.min_value}, {rr.max_value}]"
                    ),
                    column=column,
                    observed=(wr.min_value, wr.max_value),
                    expected=(rr.min_value, rr.max_value),
                )
            )
        if rr.allowed_values is not None and (
            wr.allowed_values is None
            or not set(wr.allowed_values) <= set(rr.allowed_values)
        ):
            issues.append(
                Issue(
                    kind="category",
                    message=(
                        f"column '{column}': writer domain "
                        f"{sorted(wr.allowed_values) if wr.allowed_values else None} "
                        f"is not contained in reader domain "
                        f"{sorted(rr.allowed_values)}"
                    ),
                    column=column,
                    observed=wr.allowed_values,
                    expected=rr.allowed_values,
                )
            )
    return ValidationResult(ok=not issues, issues=issues)

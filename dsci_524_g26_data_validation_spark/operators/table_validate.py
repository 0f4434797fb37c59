"""Full engine-level table validation: column contract + E1/E2/E3/E4/E5/E6,
optionally resumable per data partition (E7).

This is the "full contract pass" the north-star metric times
(BASELINE.json:2 — validated sequences/sec). Job inventory for one run:

  job 1  fused scan          column stats + invariant counts (E5) +
                             table-level aggregate checks +
                             inlined small-dim referential counts (E2) +
                             ALL drift histogram counts (E3/E4)
  job 2  union + groupBy     uniqueness (E1) AND token-hash equality
                             (E6) in one shuffle, when the token key is
                             a unique key and a reference is given
  ≤1 two-level agg           per additional uniqueness key        (E1)
  ≤1 pair-dedup agg           per functional-dependency rule (fds)
  ≤1 anti-join               per foreign key whose dim is too big
                             to inline into job 1                 (E2)
  ≤1 scan                    violation-row materialization (conditional;
                             E6 candidates confirmed by the Arrow UDF)

A clean full contract pass is therefore exactly TWO jobs **over the
fact table** regardless of how many columns, rules, histograms,
invariants, or (small-dim) foreign keys the contract carries — plus one
tiny job per inlined small dimension (``_collect_small_dim``'s
distinct+limit over the dim, ≤ INLINE_DIM_CAP rows, no fact-table
scan). On a dirty table the conditional extra jobs above apply; the
non-fused E6 path additionally pays its candidate-collect plus the
pruned confirmation scans (see tokens.py — each executes exactly once).

Everything except E6's Arrow UDF is pure Catalyst. Small dimension
tables (≤ INLINE_DIM_CAP distinct keys — the usual case for a source /
language / license dim) are collected once and compiled into an InSet
``count_if`` term of the fused aggregation, removing the whole anti-join
job; larger dims fall back to the broadcast/salted anti-join.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.manifest import FileManifestStore
from ..types import Issue, TableContract, ValidationResult
from .checks import aggregate_check_terms, evaluate_aggregate_checks
from .conditional import conditional_check_terms, evaluate_conditional_checks
from .json_contract import (
    evaluate_json_contract_checks,
    json_contract_check_terms,
    json_contract_pre_columns,
)
from .drift import drift_scores_from_counts, fused_drift_terms
from .referential import referential_violations
from .tokens import key_integrity_counts, token_equality_violations
from .uniqueness import duplicate_keys, functional_dependency_violations
from .validate import validate_contract_fused

__all__ = ["validate_table_contract", "run_resumable_validation", "DriftThresholds"]

#: Max distinct dim keys inlined into the fused pass as an InSet predicate.
INLINE_DIM_CAP = 10_000


class DriftThresholds:
    """PSI / chi-square / KS / JS / EMD alert levels (PSI 0.25 =
    conventional 'major shift'; KS uses the same practical bands; JS is
    bounded [0,1] base-2, >0.1 = major; EMD is in the column's own value
    units for numeric histograms — pick a threshold on the column's
    scale — and total-variation [0,1] for categorical)."""

    def __init__(
        self,
        psi: float = 0.25,
        chi_square: Optional[float] = None,
        ks: Optional[float] = None,
        js: Optional[float] = None,
        emd: Optional[float] = None,
    ):
        self.psi = psi
        self.chi_square = chi_square
        self.ks = ks
        self.js = js
        self.emd = emd


def _collect_small_dim(dim: DataFrame, key: str) -> Optional[list]:
    """Distinct dim keys if ≤ INLINE_DIM_CAP (else None → join fallback).

    One tiny job over the (dimension) table; at most CAP+1 keys cross to
    the driver. NULL dim keys are dropped — they can never legitimise a
    fact row (SQL join semantics).
    """
    rows = (
        dim.select(F.col(f"`{key}`").alias("_k"))
        .filter(F.col("_k").isNotNull())
        .distinct()
        .limit(INLINE_DIM_CAP + 1)
        .collect()
    )
    if len(rows) > INLINE_DIM_CAP:
        return None
    return [r["_k"] for r in rows]


def validate_table_contract(
    df: DataFrame,
    tc: TableContract,
    *,
    dims: Optional[Mapping[str, DataFrame]] = None,
    reference: Optional[DataFrame] = None,
    strict: bool = True,
    drift_thresholds: Optional[DriftThresholds] = None,
    fk_strategy: str = "broadcast",
    token_key: str = "doc_id",
    token_col: str = "tokens",
) -> ValidationResult:
    """Run every check of a TableContract → one ValidationResult.

    dims: name → dimension DataFrame for ForeignKeyRule.ref_table lookups.
    reference: clean copy of the table for E6 token-array equality
        (compared on token_col, joined on token_key).
    """
    dims = dims or {}
    thr = drift_thresholds or DriftThresholds()
    issues: List[Issue] = []

    # --- build the extra fused-agg terms: E5 invariants + inlinable E2
    #     + all drift histograms (E3/E4) ---------------------------------
    # NULL-safe: an invariant that evaluates to NULL (e.g. `n_tok =
    # size(tokens)` on a NULL array under ANSI) is NOT satisfied — it
    # counts as a violation, unlike SQL CHECK-constraint semantics where
    # unknown passes. A validation engine that lets corrupted NULL rows
    # slip through a "must hold" row rule is lying; callers who want
    # CHECK semantics can write `coalesce(<expr>, true)` explicitly.
    extra_terms = [
        F.count_if(~F.coalesce(F.expr(inv), F.lit(False))).alias(f"inv{n}")
        for n, inv in enumerate(tc.invariants)
    ]
    extra_terms.extend(aggregate_check_terms(tc.checks))
    extra_terms.extend(conditional_check_terms(tc.conditionals))
    json_pre: Dict[str, object] = {}
    if tc.json_rules:
        json_pre = json_contract_pre_columns(tc.json_rules, col=tc.json_col)
        extra_terms.extend(
            json_contract_check_terms(
                tc.json_rules, col=tc.json_col, use_parsed=bool(json_pre)
            )
        )
    drift_decode = None
    if tc.histograms:
        hg_terms, drift_decode = fused_drift_terms(df, tc.histograms)
        extra_terms.extend(hg_terms)
    inline_fk: Dict[int, str] = {}  # fk index -> extras alias
    joined_fk: List[int] = []
    for i, fk in enumerate(tc.foreign_keys):
        if fk.ref_table not in dims:
            continue
        keys = _collect_small_dim(dims[fk.ref_table], fk.ref_column)
        if keys is None:
            joined_fk.append(i)
            continue
        c = F.col(f"`{fk.column}`")
        # NULL fact keys count as violations — same as the anti-join
        # (a NULL never matches any dim key).
        extra_terms.append(
            F.count_if(c.isNull() | ~c.isin(keys)).alias(f"fk{i}")
        )
        inline_fk[i] = f"fk{i}"

    # columns + schema (reference semantics) — phases 0-2, with the extra
    # table-level counts riding the same single phase-1 scan
    col_result, extras = validate_contract_fused(
        df,
        tc.contract,
        strict=strict,
        extra_terms=extra_terms,
        category_observed="invalid_only",
        pre_columns=json_pre or None,
    )
    issues.extend(col_result.issues)

    # E5 invariant verdicts (already computed in the fused pass)
    for n, inv in enumerate(tc.invariants):
        bad = int(extras.get(f"inv{n}") or 0)
        if bad > 0:
            issues.append(
                Issue(
                    kind="invariant",
                    message=f"invariant violated on {bad} row(s): {inv}",
                    column=None,
                    observed=bad,
                    expected=0,
                )
            )

    # Table-level aggregate checks (already computed in the fused pass)
    issues.extend(evaluate_aggregate_checks(extras, tc.checks))

    # Conditional WHEN→THEN row rules (same fused pass, zero extra jobs)
    issues.extend(evaluate_conditional_checks(extras, tc.conditionals))
    if tc.json_rules:
        issues.extend(
            evaluate_json_contract_checks(
                extras, tc.json_rules, col=tc.json_col
            )
        )

    # E1 uniqueness + E6 token equality: when the E6 reference is present
    # and the token key is also a uniqueness key, BOTH ride one fused
    # union+groupBy job (key_integrity_counts) — one shuffle instead of a
    # groupBy job plus a two-sided join job. Other unique keys use the
    # two-level salted aggregation.
    fused_e6 = reference is not None and token_key in tc.unique_keys
    if fused_e6:
        kc = key_integrity_counts(df, reference, key=token_key, arr_col=token_col)
        if kc["dup_keys"] > 0:
            issues.append(
                Issue(
                    kind="uniqueness",
                    message=(
                        f"{token_key}: {kc['dup_keys']} duplicated key(s), "
                        f"{kc['surplus_rows']} surplus row(s)"
                    ),
                    column=token_key,
                    observed=kc["dup_keys"],
                    expected=0,
                )
            )
        if kc["eq_bad_keys"] > 0:
            issues.append(
                Issue(
                    kind="token_equality",
                    message=(
                        f"{token_col}: {kc['eq_bad_keys']} key(s) whose token "
                        "content differs from the reference copy"
                    ),
                    column=token_col,
                    observed=kc["eq_bad_keys"],
                    expected=0,
                )
            )
    for key in tc.unique_keys:
        if fused_e6 and key == token_key:
            continue
        dup = duplicate_keys(df, key)
        agg = dup.agg(
            F.count(F.lit(1)).alias("k"),
            F.coalesce(F.sum(F.col("dup_count") - 1), F.lit(0)).alias("s"),
        ).collect()[0]
        if int(agg["k"]) > 0:
            issues.append(
                Issue(
                    kind="uniqueness",
                    message=(
                        f"{key}: {agg['k']} duplicated key(s), "
                        f"{agg['s']} surplus row(s)"
                    ),
                    column=key,
                    observed=int(agg["k"]),
                    expected=0,
                )
            )

    # Functional dependencies: one pair-deduplicated two-stage agg per
    # rule (operators.uniqueness.functional_dependency_violations); the
    # 1-row verdict aggregate keeps driver traffic constant.
    for fd in tc.fds:
        viol = functional_dependency_violations(
            df, determinant=fd.determinant, dependent=fd.dependent
        )
        agg = viol.agg(
            F.count(F.lit(1)).alias("k"),
            F.coalesce(F.sum(F.col("n_values") - 1), F.lit(0)).alias("s"),
        ).collect()[0]
        if int(agg["k"]) > 0:
            issues.append(
                Issue(
                    kind="functional_dependency",
                    message=(
                        f"{fd.label}: {agg['k']} determinant value(s) map to "
                        f"multiple dependents ({agg['s']} surplus pairing(s))"
                    ),
                    column=fd.dependent,
                    observed=int(agg["k"]),
                    expected=0,
                )
            )

    # E2 referential integrity: inlined counts from the fused pass for
    # small dims; broadcast/salted anti-join for the rest
    for i, fk in enumerate(tc.foreign_keys):
        if fk.ref_table not in dims:
            issues.append(
                Issue(
                    kind="referential",
                    message=f"{fk.column}: reference table '{fk.ref_table}' not provided",
                    column=fk.column,
                    observed="missing_dim",
                    expected=fk.ref_table,
                )
            )
            continue
        if i in inline_fk:
            bad = int(extras.get(inline_fk[i]) or 0)
        else:
            bad = referential_violations(
                df, dims[fk.ref_table], fk.column, fk.ref_column, strategy=fk_strategy
            ).count()
        if bad > 0:
            issues.append(
                Issue(
                    kind="referential",
                    message=(
                        f"{fk.column}: {bad} row(s) reference values absent "
                        f"from {fk.ref_table}.{fk.ref_column}"
                    ),
                    column=fk.column,
                    observed=bad,
                    expected=0,
                )
            )

    # E3/E4 drift — decoded from the fused phase-1 pass (no extra scan)
    if tc.histograms:
        scores = drift_scores_from_counts(tc.histograms, drift_decode(extras))
        for col, s in sorted(scores.items()):
            if s["psi"] > thr.psi:
                issues.append(
                    Issue(
                        kind="drift_psi",
                        message=f"{col}: PSI {s['psi']:.4f} exceeds {thr.psi}",
                        column=col,
                        observed=s["psi"],
                        expected=thr.psi,
                    )
                )
            if thr.chi_square is not None and s["chi_square"] > thr.chi_square:
                issues.append(
                    Issue(
                        kind="drift_chi2",
                        message=(
                            f"{col}: chi-square {s['chi_square']:.2f} exceeds "
                            f"{thr.chi_square}"
                        ),
                        column=col,
                        observed=s["chi_square"],
                        expected=thr.chi_square,
                    )
                )
            if thr.ks is not None and s["ks"] > thr.ks:
                issues.append(
                    Issue(
                        kind="drift_ks",
                        message=f"{col}: KS {s['ks']:.4f} exceeds {thr.ks}",
                        column=col,
                        observed=s["ks"],
                        expected=thr.ks,
                    )
                )
            if thr.js is not None and s["js"] > thr.js:
                issues.append(
                    Issue(
                        kind="drift_js",
                        message=f"{col}: JS {s['js']:.4f} exceeds {thr.js}",
                        column=col,
                        observed=s["js"],
                        expected=thr.js,
                    )
                )
            if thr.emd is not None and s["emd"] > thr.emd:
                issues.append(
                    Issue(
                        kind="drift_emd",
                        message=f"{col}: EMD {s['emd']:.4f} exceeds {thr.emd}",
                        column=col,
                        observed=s["emd"],
                        expected=thr.emd,
                    )
                )

    # E6 token-array equality vs reference copy (only when not already
    # fused with E1 above): Catalyst hash pre-filter; materialized
    # candidate rows are confirmed by the Arrow UDF inside
    # token_equality_violations.
    if reference is not None and not fused_e6:
        n_bad = token_equality_violations(
            df, reference, key=token_key, arr_col=token_col
        ).count()
        if n_bad > 0:
            issues.append(
                Issue(
                    kind="token_equality",
                    message=(
                        f"{token_col}: {n_bad} row(s) differ from the "
                        "reference copy"
                    ),
                    column=token_col,
                    observed=n_bad,
                    expected=0,
                )
            )

    return ValidationResult(ok=len(issues) == 0, issues=issues)


def run_resumable_validation(
    df: DataFrame,
    tc: TableContract,
    *,
    partition_col: str,
    manifest: FileManifestStore,
    dims: Optional[Mapping[str, DataFrame]] = None,
    reference: Optional[DataFrame] = None,
    strict: bool = True,
) -> Dict[str, dict]:
    """Validate partition-by-partition with checkpoint/resume (E7).

    Each distinct ``partition_col`` value is one unit of work: validated
    independently, then recorded in the manifest with metrics + lineage.
    Already-recorded partitions are skipped on resume — but ONLY when
    their record carries the same contract fingerprint: a pass earned
    under an edited contract's previous rules proves nothing about the
    new ones, so such partitions re-run (and their records are
    overwritten with the new fingerprint). Filtering on the partition
    column prunes the scan on a partitioned table (Iceberg partition
    spec / hive-partitioned parquet), so a resume touches only
    unfinished data.

    Returns {partition: manifest metrics} for partitions run this call.
    """
    from ..types import table_contract_fingerprint

    fp = table_contract_fingerprint(tc)
    parts = [
        str(r[0])
        for r in df.select(F.col(f"`{partition_col}`").cast("string")).distinct().collect()
    ]
    done_under_this_contract = {
        p
        for p, rec in manifest.completed().items()
        if rec.get("lineage", {}).get("contract_fingerprint") == fp
    }
    ran: Dict[str, dict] = {}
    for p in sorted(set(parts) - done_under_this_contract):
        sub = df.filter(F.col(f"`{partition_col}`").cast("string") == p)
        ref_sub = (
            reference.filter(F.col(f"`{partition_col}`").cast("string") == p)
            if reference is not None
            else None
        )
        result = validate_table_contract(
            sub, tc, dims=dims, reference=ref_sub, strict=strict
        )
        metrics = {
            "ok": result.ok,
            "n_issues": len(result.issues),
            "issue_kinds": sorted({i.kind for i in result.issues}),
        }
        manifest.record(
            p,
            metrics,
            lineage={
                "partition_col": partition_col,
                "contract": tc.name,
                "contract_fingerprint": fp,
            },
        )
        ran[p] = metrics
    return ran

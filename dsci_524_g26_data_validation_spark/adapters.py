"""Great-Expectations suite adapter — import/export between the
classic GX ``expectation_suite`` JSON format and this engine's
:class:`~.types.TableContract`.

Teams migrating a validation stack to Spark usually arrive with an
existing expectation suite; this module lets them run it on this
engine unchanged (one fused scan instead of one pass per expectation)
and round-trip contracts back out for tooling that speaks GX.

Format reference: the public Great Expectations ``ExpectationSuite``
JSON schema (``expectation_suite_name`` + a list of
``{expectation_type, kwargs, meta}`` entries), as documented at
https://docs.greatexpectations.io and stable across the 0.13-0.18
line. Only the declarative subset that maps onto contract semantics
is supported; everything else is returned (or raised) explicitly —
silent partial imports are how validation gaps are born.

Semantics notes (the non-obvious mappings):

* ``mostly`` is honored ONLY on ``expect_column_values_to_not_be_null``
  (→ ``max_missing_frac = 1 − mostly``, an exact translation). On any
  other row-level expectation ``mostly < 1`` has no contract
  equivalent — this engine's range/set/pattern rules are strict — and
  translating it would silently TIGHTEN the check, so such entries are
  reported unsupported instead.
* GX regex expectations match ANYWHERE in the value; contract
  ``pattern`` must match IN FULL. The import wraps the regex as
  ``.*(?:re).*`` (with DOTALL so multiline values behave) to preserve
  GX semantics exactly.
* aggregate expectations (min/max/mean/sum/stdev/row-count/distinct-
  count/unique-proportion) become :class:`AggregateCheck` rows and
  ride the engine's fused single-scan pass — importing fifty of them
  adds zero scans.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Tuple

from .types import (
    AggregateCheck,
    ColumnRule,
    Contract,
    TableContract,
    normalize_dtype,
)

__all__ = [
    "expectations_to_table_contract",
    "table_contract_to_expectations",
    "UnsupportedExpectation",
]


class UnsupportedExpectation(ValueError):
    """Raised when a suite contains expectations with no contract
    equivalent and ``on_unsupported="raise"`` (the default)."""


_AGG_EXPECTATIONS = {
    "expect_column_min_to_be_between": "min({col})",
    "expect_column_max_to_be_between": "max({col})",
    "expect_column_mean_to_be_between": "avg({col})",
    "expect_column_sum_to_be_between": "sum({col})",
    "expect_column_stdev_to_be_between": "stddev_samp({col})",
    "expect_column_unique_value_count_to_be_between": "count(DISTINCT {col})",
    "expect_column_proportion_of_unique_values_to_be_between": (
        "count(DISTINCT {col}) / count({col})"
    ),
}

_PAIR_OPS = {
    "expect_column_pair_values_a_to_be_greater_than_b": ">",
}


def _quote(col: str) -> str:
    return f"`{col}`"


def _num(v: Any) -> Optional[float]:
    return None if v is None else float(v)


def expectations_to_table_contract(
    suite: Mapping[str, Any],
    *,
    dtypes: Optional[Mapping[str, str]] = None,
    on_unsupported: str = "raise",
) -> Tuple[TableContract, List[Dict[str, Any]]]:
    """Compile a GX expectation-suite dict into a
    ``(TableContract, unsupported_entries)`` pair.

    ``dtypes`` supplies Spark SQL types for columns the suite
    constrains without typing (GX suites often carry no type
    expectations at all) — pass ``dict(df.dtypes)`` to complete a
    suite against a live table. A column both untyped in the suite and
    absent from ``dtypes`` raises: a contract rule without a dtype is
    not representable.

    ``on_unsupported``: ``"raise"`` (default) raises
    :class:`UnsupportedExpectation` listing every unmappable entry;
    ``"skip"`` returns them as the second tuple element instead (the
    caller owns the gap).
    """
    if on_unsupported not in ("raise", "skip"):
        raise ValueError(
            f"on_unsupported must be 'raise' or 'skip', got {on_unsupported!r}"
        )
    expectations = suite.get("expectations", [])
    name = suite.get("expectation_suite_name", "expectation_suite")

    cols: Dict[str, Dict[str, Any]] = {}
    unique_keys: List[Any] = []
    checks: List[AggregateCheck] = []
    invariants: List[str] = []
    unsupported: List[Dict[str, Any]] = []

    def col_entry(c: str) -> Dict[str, Any]:
        return cols.setdefault(c, {})

    for entry in expectations:
        etype = str(entry.get("expectation_type", ""))
        kw = dict(entry.get("kwargs", {}))
        col = kw.get("column")
        mostly = kw.get("mostly", 1.0)

        if etype == "expect_column_to_exist":
            col_entry(col)
        elif etype == "expect_column_values_to_be_of_type":
            col_entry(col)["dtype"] = kw["type_"]
        elif etype == "expect_column_values_to_be_in_type_list":
            types = kw.get("type_list") or []
            if not types:
                unsupported.append(entry)
                continue
            col_entry(col)["dtype"] = types[0]
        elif etype == "expect_column_values_to_not_be_null":
            col_entry(col)["max_missing_frac"] = 1.0 - float(mostly)
        elif etype == "expect_column_values_to_be_between":
            if mostly != 1.0:
                unsupported.append(entry)
                continue
            # strict bounds have no ColumnRule equivalent (range checks
            # are inclusive); importing one as inclusive would silently
            # WIDEN the check — route to unsupported instead
            if kw.get("strict_min") or kw.get("strict_max"):
                unsupported.append(entry)
                continue
            e = col_entry(col)
            e["min_value"] = _num(kw.get("min_value"))
            e["max_value"] = _num(kw.get("max_value"))
        elif etype == "expect_column_values_to_be_in_set":
            if mostly != 1.0:
                unsupported.append(entry)
                continue
            vals = kw.get("value_set") or []
            col_entry(col)["allowed_values"] = {str(v) for v in vals}
        elif etype == "expect_column_values_to_match_regex":
            if mostly != 1.0:
                unsupported.append(entry)
                continue
            # GX matches anywhere; contract pattern matches in full
            col_entry(col)["pattern"] = f"(?s).*(?:{kw['regex']}).*"
        elif etype == "expect_column_values_to_be_unique":
            col_entry(col)
            unique_keys.append(col)
        elif etype == "expect_compound_columns_to_be_unique":
            key = tuple(kw.get("column_list") or ())
            if not key:
                unsupported.append(entry)
                continue
            for c in key:
                col_entry(c)
            unique_keys.append(key)
        elif etype == "expect_table_row_count_to_be_between":
            if kw.get("min_value") is None and kw.get("max_value") is None:
                unsupported.append(entry)
                continue
            checks.append(
                AggregateCheck(
                    expr="count(*)",
                    min_value=_num(kw.get("min_value")),
                    max_value=_num(kw.get("max_value")),
                    name=etype,
                )
            )
        elif etype == "expect_table_row_count_to_equal":
            n = _num(kw.get("value"))
            if n is None:
                unsupported.append(entry)
                continue
            checks.append(
                AggregateCheck(
                    expr="count(*)", min_value=n, max_value=n, name=etype
                )
            )
        elif etype in _AGG_EXPECTATIONS:
            if kw.get("min_value") is None and kw.get("max_value") is None:
                unsupported.append(entry)  # unbounded: AggregateCheck rejects
                continue
            col_entry(col)
            checks.append(
                AggregateCheck(
                    expr=_AGG_EXPECTATIONS[etype].format(col=_quote(col)),
                    min_value=_num(kw.get("min_value")),
                    max_value=_num(kw.get("max_value")),
                    name=f"{etype}:{col}",
                )
            )
        elif etype in _PAIR_OPS:
            a, b = kw.get("column_A"), kw.get("column_B")
            if a is None or b is None or mostly != 1.0:
                unsupported.append(entry)
                continue
            op = _PAIR_OPS[etype]
            if kw.get("or_equal"):
                op = op + "="
            for c in (a, b):
                col_entry(c)
            invariants.append(f"{_quote(a)} {op} {_quote(b)}")
        else:
            unsupported.append(entry)

    if unsupported and on_unsupported == "raise":
        kinds = sorted({e.get("expectation_type", "?") for e in unsupported})
        raise UnsupportedExpectation(
            f"{len(unsupported)} expectation(s) have no contract "
            f"equivalent: {kinds}. Pass on_unsupported='skip' to import "
            "the supported subset and own the gap explicitly."
        )

    rules: Dict[str, ColumnRule] = {}
    missing_types: List[str] = []
    for c, e in cols.items():
        dtype = e.get("dtype")
        if dtype is None and dtypes is not None:
            dtype = dtypes.get(c)
        if dtype is None:
            missing_types.append(c)
            continue
        rules[c] = ColumnRule(
            dtype=normalize_dtype(dtype),
            max_missing_frac=e.get("max_missing_frac", 1.0),
            min_value=e.get("min_value"),
            max_value=e.get("max_value"),
            allowed_values=e.get("allowed_values"),
            pattern=e.get("pattern"),
        )
    if missing_types:
        raise ValueError(
            f"no dtype for columns {sorted(missing_types)}: the suite has "
            "no type expectation for them — pass dtypes=dict(df.dtypes)"
        )

    tc = TableContract(
        contract=Contract(columns=rules, name=name),
        unique_keys=tuple(unique_keys),
        invariants=tuple(invariants),
        checks=tuple(checks),
        name=name,
    )
    return tc, unsupported


def table_contract_to_expectations(tc: TableContract) -> Dict[str, Any]:
    """Export a :class:`TableContract` as a GX expectation-suite dict
    (the supported subset: column rules, uniqueness, row-count-shaped
    aggregate checks are emitted as their originating expectation when
    recognizable, generic ones as ``meta``-annotated row-count
    placeholders are NOT invented — unknown checks are listed under
    ``meta.dsci_524_g26_unmapped`` so nothing silently drops).
    """
    out: List[Dict[str, Any]] = []
    unmapped: List[str] = []

    def emit(etype: str, **kwargs: Any) -> None:
        out.append({"expectation_type": etype, "kwargs": kwargs, "meta": {}})

    for c, r in tc.contract.columns.items():
        emit("expect_column_to_exist", column=c)
        emit("expect_column_values_to_be_of_type", column=c, type_=r.dtype)
        if r.max_missing_frac < 1.0:
            emit(
                "expect_column_values_to_not_be_null",
                column=c,
                mostly=1.0 - r.max_missing_frac,
            )
        if r.min_value is not None or r.max_value is not None:
            emit(
                "expect_column_values_to_be_between",
                column=c,
                min_value=r.min_value,
                max_value=r.max_value,
            )
        if r.allowed_values is not None:
            emit(
                "expect_column_values_to_be_in_set",
                column=c,
                value_set=sorted(r.allowed_values),
            )
        if r.pattern is not None:
            # invert the import's anywhere-wrapper so a round-trip is
            # the identity; a genuinely full-match contract pattern is
            # exported anchored (GX regex semantics are match-anywhere)
            m = re.fullmatch(r"\(\?s\)\.\*\(\?:(.*)\)\.\*", r.pattern, re.DOTALL)
            regex = m.group(1) if m else f"^(?:{r.pattern})$"
            emit("expect_column_values_to_match_regex", column=c, regex=regex)

    for key in tc.unique_keys:
        if isinstance(key, str):
            emit("expect_column_values_to_be_unique", column=key)
        else:
            emit("expect_compound_columns_to_be_unique", column_list=list(key))

    rev_agg = {v: k for k, v in _AGG_EXPECTATIONS.items()}
    for chk in tc.checks:
        if chk.expr == "count(*)":
            emit(
                "expect_table_row_count_to_be_between",
                min_value=chk.min_value,
                max_value=chk.max_value,
            )
            continue
        matched = False
        for template, etype in rev_agg.items():
            # template → regex with one capture per {col}; the capture
            # admits only a backtick-quoted identifier (what the import
            # emits), so e.g. the unique-proportion ratio can never be
            # mis-parsed as a DISTINCT count with a composite "column".
            # Captures must agree when {col} appears twice.
            pat = "^" + re.escape(template).replace(
                re.escape("{col}"), r"(`[^`]+`)"
            ) + "$"
            m = re.match(pat, chk.expr)
            if m and len(set(m.groups())) == 1:
                emit(
                    etype,
                    column=m.group(1).strip("`"),
                    min_value=chk.min_value,
                    max_value=chk.max_value,
                )
                matched = True
                break
        if not matched:
            unmapped.append(chk.expr)
    unmapped.extend(tc.invariants)
    unmapped.extend(f"{fd.determinant} -> {fd.dependent}" for fd in tc.fds)
    unmapped.extend(f"{c.when} => {c.then}" for c in tc.conditionals)
    unmapped.extend(
        f"fk:{fk.column}->{fk.ref_table}.{fk.ref_column}" for fk in tc.foreign_keys
    )

    return {
        "expectation_suite_name": tc.name,
        "expectations": out,
        "meta": {"dsci_524_g26_unmapped": unmapped},
    }

"""Property-based tests (hypothesis) for the driver-side operators —
contract serialization, compare_contracts, summarize_violations. These
are pure Python (no SparkSession), so hundreds of examples run in
seconds; the reference had example-based tests only (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import dsci_524_g26_data_validation_spark as dv

DTYPES = ["bigint", "double", "string", "boolean", "timestamp", "int"]
NAMES = st.text(
    alphabet="abcdefghij_", min_size=1, max_size=8
)


@st.composite
def column_rules(draw):
    dtype = draw(st.sampled_from(DTYPES))
    lo = draw(st.none() | st.floats(-1e6, 1e6, allow_nan=False))
    hi = draw(st.none() | st.floats(-1e6, 1e6, allow_nan=False))
    if lo is not None and hi is not None and lo > hi:
        lo, hi = hi, lo
    allowed = draw(
        st.none()
        | st.frozensets(st.text(alphabet="xyz01", max_size=4), max_size=5).map(set)
    )
    return dv.ColumnRule(
        dtype=dtype,
        max_missing_frac=draw(st.floats(0, 1, allow_nan=False)),
        min_value=lo,
        max_value=hi,
        allowed_values=allowed,
    )


contracts = st.dictionaries(NAMES, column_rules(), max_size=6).map(
    lambda cols: dv.Contract(columns=cols, name="c")
)


@settings(max_examples=200, deadline=None)
@given(contracts)
def test_contract_json_roundtrip(c):
    back = dv.contract_from_json(dv.contract_to_json(c))
    assert set(back.columns) == set(c.columns)
    for k, r in c.columns.items():
        b = back.columns[k]
        assert (b.dtype, b.max_missing_frac, b.min_value, b.max_value) == (
            r.dtype,
            r.max_missing_frac,
            r.min_value,
            r.max_value,
        )
        assert (b.allowed_values is None) == (r.allowed_values is None)
        if r.allowed_values is not None:
            assert set(b.allowed_values) == set(r.allowed_values)


@settings(max_examples=200, deadline=None)
@given(contracts)
def test_self_compare_never_drifts(c):
    assert dv.compare_contracts(c, c).has_drift is False


@settings(max_examples=200, deadline=None)
@given(contracts, contracts)
def test_compare_is_antisymmetric(a, b):
    ab = dv.compare_contracts(a, b)
    ba = dv.compare_contracts(b, a)
    assert ab.added_columns == ba.removed_columns
    assert ab.removed_columns == ba.added_columns
    assert set(ab.dtype_changes) == set(ba.dtype_changes)
    for col, (old, new) in ab.dtype_changes.items():
        assert ba.dtype_changes[col] == (new, old)
    assert ab.has_drift == ba.has_drift


issues = st.builds(
    dv.Issue,
    kind=st.sampled_from(
        ["missing_column", "extra_column", "dtype", "missingness", "range",
         "category", "weird_kind"]
    ),
    message=st.text(max_size=10),
    column=st.none() | NAMES,
    observed=st.integers(),
    expected=st.integers(),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(issues, max_size=30), st.integers(1, 10))
def test_summarize_invariants(issue_list, top_k):
    result = dv.ValidationResult(ok=len(issue_list) == 0, issues=issue_list)
    s = dv.summarize_violations(result, top_k=top_k)
    # counts cover ALL issues regardless of truncation
    assert sum(s.counts_by_kind.values()) == len(issue_list)
    assert len(s.top_issues) == min(top_k, len(issue_list))
    assert s.ok == result.ok
    # top issues are a subset of the input
    for i in s.top_issues:
        assert i in issue_list
    # ranking: weights are non-increasing down the list
    weights = {
        "missing_column": 10, "extra_column": 8, "dtype": 7,
        "range": 5, "category": 5, "missingness": 3,
    }
    ws = [weights.get(i.kind, 1) for i in s.top_issues]
    assert ws == sorted(ws, reverse=True)


@settings(max_examples=100, deadline=None)
@given(st.lists(issues, min_size=1, max_size=20))
def test_summarize_custom_weights_replace_defaults(issue_list):
    result = dv.ValidationResult(ok=False, issues=issue_list)
    s = dv.summarize_violations(result, top_k=50, weights={"range": 2.0})
    # with custom weights every non-'range' kind gets weight 1 → any
    # 'range' issue must sort before all others
    kinds = [i.kind for i in s.top_issues]
    if "range" in kinds:
        first_non_range = next(
            (ix for ix, k in enumerate(kinds) if k != "range"), len(kinds)
        )
        assert all(k == "range" for k in kinds[:first_non_range])
        assert "range" not in kinds[first_non_range:]

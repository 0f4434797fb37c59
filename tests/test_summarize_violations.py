"""Parity tests for summarize_violations — mirrors the reference suite's
weighting, tiebreaking, counting, truncation and error paths
(/root/reference/tests/unit/test_summarize_violations.py). The
distributed variant (summarize_violations_df) is pinned to the same
ordering semantics.
"""

from __future__ import annotations

import pytest

from dsci_524_g26_data_validation_spark import (
    Issue,
    Summary,
    ValidationResult,
    summarize_violations,
    summarize_violations_df,
)


def mk(kind, column=None, msg=""):
    return Issue(kind=kind, message=msg or f"{kind}@{column}", column=column)


def test_empty_result_short_circuit():
    s = summarize_violations(ValidationResult(ok=True, issues=[]))
    assert s == Summary(ok=True, top_issues=[], counts_by_kind={})


def test_default_weight_ordering_all_kinds():
    # reference :540-584 — one of each kind, default weights
    issues = [
        mk("missingness", "a"),
        mk("category", "b"),
        mk("range", "c"),
        mk("dtype", "d"),
        mk("extra_column", "e"),
        mk("missing_column", "f"),
    ]
    s = summarize_violations(ValidationResult(ok=False, issues=issues), top_k=6)
    assert [i.kind for i in s.top_issues] == [
        "missing_column",
        "extra_column",
        "dtype",
        "category",  # weight 5 tie: column 'b' < 'c'
        "range",
        "missingness",
    ]


def test_equal_weight_tiebreak_column_none_first():
    # reference :264-299,635-659 — columns [zebra, apple, apple, None]
    issues = [
        mk("range", "zebra"),
        mk("range", "apple", "first-apple"),
        mk("range", "apple", "second-apple"),
        mk("range", None),
    ]
    s = summarize_violations(ValidationResult(ok=False, issues=issues), top_k=4)
    assert [i.column for i in s.top_issues] == [None, "apple", "apple", "zebra"]
    # stable sort: original order is the final tiebreak
    assert s.top_issues[1].message == "first-apple"
    assert s.top_issues[2].message == "second-apple"


def test_same_weight_kind_tiebreak():
    # range and category share weight 5 → kind alphabetical
    issues = [mk("range", "x"), mk("category", "x")]
    s = summarize_violations(ValidationResult(ok=False, issues=issues))
    assert [i.kind for i in s.top_issues] == ["category", "range"]


def test_custom_weights_replace_defaults_unknown_kind_weight_1():
    # reference :194-257
    issues = [mk("missing_column", "a"), mk("range", "b"), mk("weird", "c")]
    s = summarize_violations(
        ValidationResult(ok=False, issues=issues),
        weights={"range": 20},
    )
    # range:20 first; missing_column now weight 1 (replaced!), ties with
    # weird at 1 → column asc: a < c
    assert [i.kind for i in s.top_issues] == ["range", "missing_column", "weird"]


def test_float_weights():
    issues = [mk("a1", "x"), mk("a2", "y")]
    s = summarize_violations(
        ValidationResult(ok=False, issues=issues), weights={"a1": 0.5, "a2": 2.5}
    )
    assert [i.kind for i in s.top_issues] == ["a2", "a1"]


def test_counts_include_all_under_truncation():
    # reference :87-107
    issues = [mk("range", f"c{i}") for i in range(10)] + [mk("dtype", "d")]
    s = summarize_violations(ValidationResult(ok=False, issues=issues), top_k=3)
    assert len(s.top_issues) == 3
    assert s.counts_by_kind == {"range": 10, "dtype": 1}


def test_top_k_larger_than_issue_count():
    issues = [mk("range", "a")]
    s = summarize_violations(ValidationResult(ok=False, issues=issues), top_k=100)
    assert len(s.top_issues) == 1


def test_scale_1000_issues():
    # reference :615-632
    issues = [mk("missingness", f"col{i:04d}") for i in range(1000)]
    s = summarize_violations(ValidationResult(ok=False, issues=issues), top_k=5)
    assert len(s.top_issues) == 5
    assert s.counts_by_kind == {"missingness": 1000}
    assert s.top_issues[0].column == "col0000"


def test_error_paths():
    # reference :363-486
    ok = ValidationResult(ok=False, issues=[mk("range", "a")])
    with pytest.raises(TypeError):
        summarize_violations("nope")
    with pytest.raises(TypeError):
        summarize_violations(ok, top_k="3")
    with pytest.raises(ValueError):
        summarize_violations(ok, top_k=0)
    with pytest.raises(ValueError):
        summarize_violations(ok, top_k=-1)
    with pytest.raises(TypeError):
        summarize_violations(ok, weights=[1, 2])
    with pytest.raises(ValueError):
        summarize_violations(ok, weights={"range": "high"})
    with pytest.raises(ValueError):
        summarize_violations(ok, weights={"range": 0})
    with pytest.raises(ValueError):
        summarize_violations(ok, weights={"range": -2})


def test_distributed_summary_matches_in_memory(spark):
    rows = [
        ("range", "zebra"),
        ("range", "apple"),
        ("missing_column", None),
        ("dtype", "beta"),
        ("weird", "gamma"),
    ]
    df = spark.createDataFrame(rows, "kind string, column string")
    got = [
        (r["kind"], r["column"])
        for r in summarize_violations_df(df, top_k=5).collect()
    ]
    issues = [mk(k, c) for k, c in rows]
    expect = [
        (i.kind, i.column)
        for i in summarize_violations(
            ValidationResult(ok=False, issues=issues), top_k=5
        ).top_issues
    ]
    assert got == expect


def test_distributed_summary_to_summary_matches_in_memory(spark):
    from dsci_524_g26_data_validation_spark import summarize_violations_distributed

    rows = [
        ("range", "zebra"),
        ("range", "apple"),
        ("range", "apple"),
        ("missing_column", None),
        ("dtype", "beta"),
        ("weird", "gamma"),
    ]
    df = spark.createDataFrame(rows, "kind string, column string")
    issues = [mk(k, c) for k, c in rows]
    mem = summarize_violations(
        ValidationResult(ok=False, issues=issues), top_k=3
    )
    dist = summarize_violations_distributed(df, top_k=3).to_summary()
    # M3: counts over ALL issues, not just top-k
    assert dist.counts_by_kind == mem.counts_by_kind
    assert dist.ok == mem.ok is False
    # M4/M5: same ranked (kind, column) head
    assert [(i.kind, i.column) for i in dist.top_issues] == [
        (i.kind, i.column) for i in mem.top_issues
    ]


def test_distributed_summary_empty_is_ok(spark):
    from dsci_524_g26_data_validation_spark import summarize_violations_distributed

    df = spark.createDataFrame([], "kind string, column string")
    s = summarize_violations_distributed(df).to_summary()
    assert s.ok is True and s.top_issues == [] and s.counts_by_kind == {}


def test_distributed_summary_input_validation(spark):
    from dsci_524_g26_data_validation_spark import summarize_violations_distributed

    df = spark.createDataFrame([("range", "c")], "kind string, column string")
    with pytest.raises(TypeError):
        summarize_violations_distributed(df, top_k="5")
    with pytest.raises(ValueError):
        summarize_violations_distributed(df, top_k=0)
    with pytest.raises(TypeError):
        summarize_violations_distributed(df, weights=[1])
    with pytest.raises(ValueError):
        summarize_violations_distributed(df, weights={"range": 0})

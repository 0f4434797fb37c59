"""Parity tests for validate_contract — mirrors the reference's
comprehensive scenario (/root/reference/tests/unit/
test_validate_contract.py:97-227, F1 fixture: age/city contract) plus
Spark-engine specifics (violation rows, partition verdicts).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dsci_524_g26_data_validation_spark import (
    ColumnRule,
    Contract,
    ContractViolationError,
    partition_verdicts,
    validate_and_fail,
    validate_contract,
    violation_rows,
)


@pytest.fixture()
def f1_contract():
    # reference test_validate_contract.py:182-190: age int64 [0,100] no
    # missing; city object in {Vancouver,Toronto}, missing allowed.
    return Contract(
        columns={
            "age": ColumnRule(
                dtype="int64", max_missing_frac=0.0, min_value=0, max_value=100
            ),
            "city": ColumnRule(
                dtype="object",
                max_missing_frac=1.0,
                allowed_values={"Vancouver", "Toronto"},
            ),
        }
    )


def _kinds(result):
    return [i.kind for i in result.issues]


def test_happy_path(spark, f1_contract):
    df = spark.createDataFrame(
        [(25, "Vancouver"), (30, "Toronto")], "age bigint, city string"
    )
    result = validate_contract(df, f1_contract)
    assert result.ok is True
    assert result.issues == []


def test_missing_column(spark, f1_contract):
    df = spark.createDataFrame([("Vancouver",)], "city string")
    result = validate_contract(df, f1_contract)
    assert result.ok is False
    assert _kinds(result) == ["missing_column"]
    issue = result.issues[0]
    assert issue.column == "age"
    assert issue.expected == "Present"
    assert issue.observed == "Missing"


def test_extra_column_strict_only(spark, f1_contract):
    df = spark.createDataFrame(
        [(25, "Vancouver", 1.0)], "age bigint, city string, bonus double"
    )
    strict = validate_contract(df, f1_contract, strict=True)
    assert _kinds(strict) == ["extra_column"]
    assert strict.issues[0].column == "bonus"
    lax = validate_contract(df, f1_contract, strict=False)
    assert lax.ok is True


def test_dtype_mismatch(spark, f1_contract):
    # age as strings → dtype issue (reference: str vs int64)
    df = spark.createDataFrame([("25", "Vancouver")], "age string, city string")
    result = validate_contract(df, f1_contract)
    assert "dtype" in _kinds(result)
    issue = [i for i in result.issues if i.kind == "dtype"][0]
    assert issue.column == "age"
    assert issue.expected == "bigint"  # normalized from int64
    assert issue.observed == "string"


def test_dtype_string_equivalence(spark):
    # object/str/string mutually equivalent (validate_contract.py:107-115)
    contract = Contract(columns={"s": ColumnRule(dtype="object", max_missing_frac=1.0)})
    df = spark.createDataFrame([("x",)], "s string")
    assert validate_contract(df, contract).ok is True


def test_range_violation_upper(spark, f1_contract):
    df = spark.createDataFrame([(150, "Toronto")], "age bigint, city string")
    result = validate_contract(df, f1_contract)
    assert _kinds(result) == ["range"]
    issue = result.issues[0]
    assert issue.column == "age"
    assert issue.observed == 150
    assert issue.expected == 100


def test_range_violation_lower_and_upper_independent(spark):
    contract = Contract(
        columns={"x": ColumnRule(dtype="bigint", min_value=0, max_value=10)}
    )
    df = spark.createDataFrame([(-5,), (50,)], "x bigint")
    result = validate_contract(df, contract)
    kinds = _kinds(result)
    assert kinds == ["range", "range"]  # both fire (reference :141-160)
    assert result.issues[0].observed == -5  # lower first
    assert result.issues[1].observed == 50


def test_at_threshold_missingness_passes(spark):
    # strict > comparison: exactly at threshold passes (reference :128)
    contract = Contract(columns={"x": ColumnRule(dtype="double", max_missing_frac=0.5)})
    df = spark.createDataFrame(
        [(1.0,), (None,)], T.StructType([T.StructField("x", T.DoubleType())])
    )
    assert validate_contract(df, contract).ok is True
    df2 = spark.createDataFrame(
        [(1.0,), (None,), (None,)], T.StructType([T.StructField("x", T.DoubleType())])
    )
    result = validate_contract(df2, contract)
    assert _kinds(result) == ["missingness"]
    assert result.issues[0].observed == pytest.approx(2 / 3)


def test_category_violation(spark, f1_contract):
    df = spark.createDataFrame([(25, "Seattle")], "age bigint, city string")
    result = validate_contract(df, f1_contract)
    assert _kinds(result) == ["category"]
    issue = result.issues[0]
    assert issue.column == "city"
    assert issue.observed == {"Seattle"}
    assert issue.expected == {"Vancouver", "Toronto"}


def test_category_null_never_invalid(spark, f1_contract):
    df = spark.createDataFrame(
        [(25, None), (30, "Toronto")],
        T.StructType(
            [
                T.StructField("age", T.LongType()),
                T.StructField("city", T.StringType()),
            ]
        ),
    )
    assert validate_contract(df, f1_contract).ok is True


def test_validate_and_fail(spark, f1_contract):
    bad = spark.createDataFrame([(150, "Toronto")], "age bigint, city string")
    with pytest.raises(ContractViolationError):
        validate_and_fail(bad, f1_contract)
    good = spark.createDataFrame([(25, "Toronto")], "age bigint, city string")
    assert validate_and_fail(good, f1_contract).ok is True


def test_violation_rows_single_scan(spark, f1_contract):
    df = spark.createDataFrame(
        [(150, "Seattle"), (25, "Toronto"), (-1, "Kelowna")],
        "age bigint, city string",
    )
    rows = violation_rows(df, f1_contract).collect()
    got = {(r["kind"], r["column"], r["observed"]) for r in rows}
    assert got == {
        ("range", "age", "150"),
        ("category", "city", "Seattle"),
        ("range", "age", "-1"),
        ("category", "city", "Kelowna"),
    }
    # a row violating two rules appears twice
    assert len(rows) == 4


def test_violation_rows_empty_when_clean(spark, f1_contract):
    df = spark.createDataFrame([(25, "Toronto")], "age bigint, city string")
    assert violation_rows(df, f1_contract).count() == 0


def test_partition_verdicts_by_column(spark, f1_contract):
    df = spark.createDataFrame(
        [(150, "Vancouver"), (25, "Vancouver"), (30, "Toronto")],
        "age bigint, city string",
    )
    v = {
        r["partition"]: (r["n_violations"], r["verdict"])
        for r in partition_verdicts(df, f1_contract, partition_col="city").collect()
    }
    assert v == {"Vancouver": (1, "fail"), "Toronto": (0, "pass")}


def test_zero_row_frame_passes(spark, f1_contract):
    df = spark.createDataFrame([], "age bigint, city string")
    assert validate_contract(df, f1_contract).ok is True


# -- per-group (cohort) validation ---------------------------------------------


def test_validate_by_group_facets(spark):
    """Every data facet fires per group with validate_contract's exact
    thresholds: strict > missingness, independent range sides,
    NULL-excluded category, full-match pattern."""
    import dsci_524_g26_data_validation_spark as dv
    from dsci_524_g26_data_validation_spark.types import ColumnRule, Contract

    rows = [
        # group a: clean except upper range (x=15 > 10)
        ("a", 5.0, "ok", "A1"),
        ("a", 15.0, "ok", "A2"),
        # group b: NULL x (missingness 0.5 > 0.2), bad category,
        # pattern violation
        ("b", None, "junk", "zz"),
        ("b", 3.0, "ok", "B1"),
        # group c: lower range (x=-1 < 0), missingness 0 passes
        ("c", -1.0, "ok", "C1"),
    ]
    df = spark.createDataFrame(rows, "g string, x double, cat string, code string")
    contract = Contract(
        columns={
            "x": ColumnRule(
                dtype="double", max_missing_frac=0.2, min_value=0.0,
                max_value=10.0,
            ),
            "cat": ColumnRule(dtype="string", allowed_values={"ok"}),
            "code": ColumnRule(dtype="string", pattern="[A-C][0-9]"),
        }
    )
    got = {
        (r.group, r.kind, r.column): (r.observed, r.expected)
        for r in dv.validate_by_group(df, contract, group_col="g").collect()
    }
    assert got[("a", "range", "x")] == (15.0, 10.0)
    assert got[("b", "missingness", "x")] == (0.5, 0.2)
    assert got[("b", "category", "cat")] == (1.0, None)
    assert got[("b", "pattern", "code")] == (1.0, None)
    assert got[("c", "range", "x")] == (-1.0, 0.0)
    # nothing else fired: a's missingness is 0 (<= 0.2), c's category ok
    assert set(got) == {
        ("a", "range", "x"),
        ("b", "missingness", "x"),
        ("b", "category", "cat"),
        ("b", "pattern", "code"),
        ("c", "range", "x"),
    }


def test_validate_by_group_at_threshold_passes(spark):
    """Missingness exactly AT max_missing_frac passes (strict >), matching
    validate_contract; all-NULL groups emit no range issue (min/max NULL)."""
    import dsci_524_g26_data_validation_spark as dv
    from dsci_524_g26_data_validation_spark.types import ColumnRule, Contract

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", None), ("b", None)],
        "g string, x double",
    )
    contract = Contract(
        columns={"x": ColumnRule(dtype="double", max_missing_frac=0.5,
                                 min_value=0.0)}
    )
    got = dv.validate_by_group(df, contract, group_col="g").collect()
    # a: frac 0.5 == threshold -> passes; b: frac 1.0 fires, but min is
    # NULL so no range row
    assert [(r.group, r.kind) for r in got] == [("b", "missingness")]


def test_validate_by_group_single_scan(spark, sf_dir):
    import dsci_524_g26_data_validation_spark as dv
    from dsci_524_g26_data_validation_spark.types import ColumnRule, Contract

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    contract = Contract(
        columns={
            "o_totalprice": ColumnRule(dtype="double", min_value=1050.0,
                                       max_value=499900.0),
            "o_orderstatus": ColumnRule(dtype="string",
                                        allowed_values={"O", "F"}),
        }
    )
    out = dv.validate_by_group(df, contract, group_col="o_orderpriority")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    # grouped agg -> exactly one hash-partitioned exchange on the group key
    assert plan.count("Exchange hashpartitioning") == 1


def test_validate_by_group_boolean_range_matches_table_level(spark):
    """A range rule on a boolean column (booleans are numeric_like via an
    int cast in the fused table pass) must fire per-cohort exactly as
    validate_contract fires it at table level."""
    import dsci_524_g26_data_validation_spark as dv

    df = spark.createDataFrame(
        [("a", True), ("a", True), ("b", False)], "g string, flag boolean"
    )
    contract = dv.Contract(
        columns={
            "flag": dv.ColumnRule(dtype="boolean", min_value=0, max_value=0)
        }
    )
    table_kinds = {i.kind for i in dv.validate_contract(df, contract).issues}
    assert "range" in table_kinds
    grp = dv.validate_by_group(df, contract, group_col="g").collect()
    fired = {(r.group, r.kind) for r in grp}
    assert ("a", "range") in fired  # max(flag)=1 > 0 in cohort a
    assert ("b", "range") not in fired  # all-False cohort is in range

"""Table-level aggregate checks (Deequ-style assertions).

The reference has no table-level assertions (only per-column rules,
reference validate_contract.py:95-176); these tests pin the engine
extension: bounds semantics, NULL-fails, fused-pass integration, JSON
round-trip, and the one-scan plan guarantee.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators.checks import (
    aggregate_checks_report,
)


@pytest.fixture
def df(spark):
    return spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b") for i in range(10)],
        "id int, x double, cat string",
    )


def test_report_values_and_ok(spark, df):
    checks = [
        dv.AggregateCheck("avg(x)", min_value=4.0, max_value=5.0, name="avg_x"),
        dv.AggregateCheck("count_if(cat = 'a') / count(*)", min_value=0.9),
        dv.AggregateCheck("max(id)", max_value=100.0),
    ]
    rows = {r["check_name"]: r for r in aggregate_checks_report(df, checks).collect()}
    assert rows["avg_x"]["value"] == 4.5 and rows["avg_x"]["ok"]
    assert rows["avg_x"]["lo"] == 4.0 and rows["avg_x"]["hi"] == 5.0
    frac = rows["count_if(cat = 'a') / count(*)"]
    assert frac["value"] == 0.5 and not frac["ok"]  # 5/10 < 0.9
    assert frac["hi"] is None
    assert rows["max(id)"]["ok"]


def test_null_value_fails(spark):
    empty = spark.createDataFrame([], "x double")
    checks = [dv.AggregateCheck("avg(x)", min_value=0.0)]
    row = aggregate_checks_report(empty, checks).collect()[0]
    assert row["value"] is None and not row["ok"]


def test_bounds_required():
    with pytest.raises(ValueError, match="min_value/max_value"):
        dv.AggregateCheck("avg(x)")


def test_empty_checks_rejected(spark, df):
    with pytest.raises(ValueError, match="non-empty"):
        aggregate_checks_report(df, [])


def test_table_contract_integration(spark, df):
    contract = dv.infer_contract(df)
    tc = dv.TableContract(
        contract=contract,
        checks=(
            dv.AggregateCheck("avg(x)", min_value=100.0, name="avg_too_high"),
            dv.AggregateCheck("count(*)", min_value=1.0),
        ),
    )
    result = dv.validate_table_contract(df, tc)
    agg_issues = [i for i in result.issues if i.kind == "aggregate_check"]
    assert len(agg_issues) == 1
    assert not result.ok
    assert "avg_too_high" in agg_issues[0].message
    assert agg_issues[0].observed == 4.5
    assert agg_issues[0].column is None


def test_json_round_trip(spark, df):
    tc = dv.TableContract(
        contract=dv.infer_contract(df),
        checks=(
            dv.AggregateCheck("avg(x)", min_value=1.0, max_value=2.0, name="n"),
            dv.AggregateCheck("count(*)", max_value=5.0),
        ),
    )
    tc2 = dv.table_contract_from_json(dv.table_contract_to_json(tc))
    assert tc2.checks == tc.checks
    # pre-checks contracts (no "checks" key) still load
    import json

    d = dv.table_contract_to_dict(tc)
    del d["checks"]
    assert dv.table_contract_from_dict(json.loads(json.dumps(d))).checks == ()


def test_single_scan_plan(spark, df):
    """All checks ride ONE FileScan/scan — adding checks adds no job."""
    checks = [
        dv.AggregateCheck(e, min_value=0.0)
        for e in ("avg(x)", "max(id)", "count_if(cat = 'a')", "count(*)")
    ]
    plan = (
        aggregate_checks_report(df, checks)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1
    assert "Exchange" not in plan or plan.count("Exchange") <= 1


def test_fd_rule_in_table_contract(spark):
    df = spark.createDataFrame(
        [(1, "x", "a"), (1, "y", "a"), (2, "x", "b"), (2, "x", "c")],
        "k int, u string, v string",
    )
    tc = dv.TableContract(
        contract=dv.infer_contract(df),
        fds=(
            dv.FunctionalDependencyRule(determinant=("k",), dependent="v"),
            dv.FunctionalDependencyRule(determinant=("k",), dependent="u"),
        ),
    )
    res = dv.validate_table_contract(df, tc)
    fd_issues = {i.column: i for i in res.issues if i.kind == "functional_dependency"}
    # k -> v broken by k=2 ({b, c}); k -> u broken by k=1 ({x, y})
    assert set(fd_issues) == {"v", "u"} and not res.ok
    assert fd_issues["v"].observed == 1
    # JSON round-trip carries the rules
    tc2 = dv.table_contract_from_json(dv.table_contract_to_json(tc))
    assert tc2.fds == tc.fds
    # clean FD produces no issue
    tc3 = dv.TableContract(
        contract=dv.infer_contract(df),
        fds=(dv.FunctionalDependencyRule(determinant=("u", "v"), dependent="k"),),
    )
    assert not any(
        i.kind == "functional_dependency"
        for i in dv.validate_table_contract(df, tc3).issues
    )


def test_fd_rule_requires_determinant():
    import pytest as _pt

    with _pt.raises(ValueError, match="determinant"):
        dv.FunctionalDependencyRule(determinant=(), dependent="v")

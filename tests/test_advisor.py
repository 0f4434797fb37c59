"""Contract advisor (operators/advisor.py): quantile-budgeted bounds.

Fixtures with known quantiles pin the suggestion math, the realized
violation counts, NULL handling, the all-NULL column path, and that
suggest_contract swaps ONLY numeric bounds (unrounded) while keeping
dtype / missingness / domains from infer_contract.
"""

from __future__ import annotations

import pytest

from dsci_524_g26_data_validation_spark import (
    suggest_bounds,
    suggest_contract,
    validate_contract,
)


def _frame(spark):
    # x: 1..100 plus one wild outlier; y: constant; z: all NULL
    rows = [(float(i), 5.0, None) for i in range(1, 101)] + [
        (1e9, 5.0, None)
    ]
    return spark.createDataFrame(rows, "x double, y double, z double")


def test_bounds_and_counts(spark):
    rep = {
        r["column"]: r.asDict()
        for r in suggest_bounds(
            _frame(spark), ["x", "y", "z"], violation_budget=0.04
        ).collect()
    }
    x = rep["x"]
    assert x["n_nonnull"] == 101
    # q(0.02) over 101 values 1..100,1e9: index 0.02*100=2 -> 3.0
    assert x["suggested_min"] == pytest.approx(3.0)
    # q(0.98): index 98 -> 99.0
    assert x["suggested_max"] == pytest.approx(99.0)
    assert x["n_below"] == 2  # 1, 2
    assert x["n_above"] == 2  # 100, 1e9 (the outlier no longer widens)
    assert x["realized_rate"] == pytest.approx(4 / 101, abs=1e-6)
    y = rep["y"]
    assert y["suggested_min"] == 5.0 and y["suggested_max"] == 5.0
    assert y["n_below"] == 0 and y["n_above"] == 0
    z = rep["z"]
    assert z["n_nonnull"] == 0
    assert z["suggested_min"] is None and z["suggested_max"] is None
    assert z["realized_rate"] == 0.0


def test_defaults_pick_all_numeric(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b")], "x double, s string"
    )
    rep = suggest_bounds(df, violation_budget=0.5).collect()
    assert [r["column"] for r in rep] == ["x"]


def test_validation_errors(spark):
    df = spark.createDataFrame([(1.0, "a")], "x double, s string")
    with pytest.raises(ValueError):
        suggest_bounds(df, ["s"])
    with pytest.raises(ValueError):
        suggest_bounds(df, ["nope"])
    with pytest.raises(ValueError):
        suggest_bounds(df, ["x"], violation_budget=0.0)
    with pytest.raises(ValueError):
        suggest_bounds(
            spark.createDataFrame([("a",)], "s string"), None
        )


def test_suggest_contract_swaps_only_bounds(spark):
    rows = [(float(i), "cat_a" if i % 2 else "cat_b") for i in range(1, 101)]
    df = spark.createDataFrame(rows, "x double, s string")
    c = suggest_contract(df, violation_budget=0.1)
    rx = c.columns["x"]
    # q(0.05)/q(0.95) over 1..100: 5.95 / 95.05 (unrounded survives)
    assert rx.min_value == pytest.approx(5.95)
    assert rx.max_value == pytest.approx(95.05)
    assert rx.dtype == "double"
    rs = c.columns["s"]
    assert rs.allowed_values == {"cat_a", "cat_b"}
    # the advised contract flags exactly the budgeted tail today
    res = validate_contract(df, c)
    range_issues = [i for i in res.issues if i.kind == "range"]
    assert len(range_issues) >= 1

"""Structured-missingness analysis (operators/missingness.py)."""

from __future__ import annotations

import pytest

import dsci_524_g26_data_validation_spark as dv

SCHEMA = "a string, b string, c int"


@pytest.fixture(scope="module")
def df(spark):
    # a,b null TOGETHER on 2 rows (shared cause); c null once, alone.
    return spark.createDataFrame(
        [
            ("x", "y", 1),
            (None, None, 2),
            (None, None, 3),
            ("x", "y", None),
            ("x", "y", 4),
        ],
        SCHEMA,
    )


def test_null_patterns_ranked(df):
    rows = dv.null_patterns(df).collect()
    assert [(r["pattern"], r["n_rows"]) for r in rows] == [
        ("000", 2), ("110", 2), ("001", 1),
    ]
    assert rows[0]["frac"] == 0.4


def test_null_patterns_top_k(df):
    assert len(dv.null_patterns(df, top_k=1).collect()) == 1


def test_comissingness_lift(df):
    out = {(r["col_a"], r["col_b"]): r for r in dv.comissingness(df).collect()}
    ab = out[("a", "b")]
    # joint 2/5 vs independence (2/5)*(2/5): lift = 2*5/(2*2) = 2.5
    assert ab["n_both"] == 2 and ab["lift"] == 2.5 and ab["jaccard"] == 1.0
    ac = out[("a", "c")]
    assert ac["n_both"] == 0 and ac["lift"] == 0.0 and ac["jaccard"] == 0.0


def test_comissingness_undefined_lift(spark):
    g = spark.createDataFrame([("x", "y"), ("z", None)], "a string, b string")
    row = dv.comissingness(g).collect()[0]
    assert row["n_a"] == 0 and row["lift"] is None and row["jaccard"] == 0.0


def test_input_validation(df):
    with pytest.raises(ValueError, match="not in input"):
        dv.null_patterns(df, cols=["nope"])
    with pytest.raises(ValueError, match="at least 2"):
        dv.comissingness(df, cols=["a"])


def test_comissingness_single_scan(df):
    """The whole pair table comes from ONE aggregation over the input —
    exactly one scan of the source relation in the plan."""
    plan = (
        dv.comissingness(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1

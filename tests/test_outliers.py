"""Robust median/MAD outlier detection (operators/outliers.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv


@pytest.fixture(scope="module")
def df(spark):
    # group g: 9 values clustered at 10±2 plus one wild 1000
    # group h: constant (MAD == 0 — degenerate)
    rows = [("g", float(v)) for v in [8, 9, 9, 10, 10, 10, 11, 11, 12]]
    rows.append(("g", 1000.0))
    rows += [("h", 5.0)] * 4
    rows.append(("g", None))
    return spark.createDataFrame(rows, "grp string, x double")


def test_stats_flags_planted_outlier(df):
    out = {r["grp"]: r for r in
           dv.robust_outlier_stats(df, "x", group_col="grp").collect()}
    g = out["g"]
    assert g["n_rows"] == 10          # NULL x not counted
    assert g["median"] == 10.0 and g["mad"] == 1.0
    assert g["n_outliers"] == 1 and g["outlier_frac"] == 0.1


def test_mad_zero_group_reports_null(df):
    h = {r["grp"]: r for r in
         dv.robust_outlier_stats(df, "x", group_col="grp").collect()}["h"]
    assert h["mad"] == 0.0
    assert h["n_outliers"] is None and h["outlier_frac"] is None


def test_outlier_rows_carry_payload_and_z(df):
    d2 = df.withColumn("tag", F.concat(F.lit("row-"), F.col("x")))
    rows = dv.robust_outlier_rows(d2, "x", group_col="grp").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["x"] == 1000.0 and r["tag"] == "row-1000.0"
    assert r["robust_z"] == round(990 / 1.4826, 6)


def test_ungrouped(df):
    row = dv.robust_outlier_stats(df.filter("grp = 'g'"), "x").collect()[0]
    assert row["n_rows"] == 10 and row["n_outliers"] == 1


def test_mean_stddev_would_miss_it(df):
    """The motivating case: the 1000 inflates stddev so a 3σ rule sees
    nothing, while the robust rule flags exactly the plant."""
    g = df.filter("grp = 'g'")
    m, s = g.agg(F.avg("x"), F.stddev("x")).collect()[0]
    classical = g.filter(F.abs(F.col("x") - m) > 3 * s).count()
    assert classical == 0
    assert dv.robust_outlier_rows(g, "x").count() == 1


def test_stats_frame_broadcast_in_plan(df):
    plan = (
        dv.robust_outlier_stats(df, "x", group_col="grp")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

"""Incremental profiling (operators/profile_slices.py): merged
per-slice sufficient stats equal the direct profile, merge
associativity, dtype-drift guard, non-numeric columns, HLL tolerance."""

import math

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.profile_slices import (
    merge_profile_partials,
    profile_partials,
    profile_report,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _report_by_col(report_df):
    return {r.column: r for r in report_df.collect()}


def test_merged_slices_equal_direct_profile(spark, orders):
    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    slices = [
        profile_partials(
            orders.filter(F.col("o_orderkey") % 3 == i), cols, slice_id=f"s{i}"
        )
        for i in range(3)
    ]
    merged = merge_profile_partials(slices[0].union(slices[1]).union(slices[2]))
    got = _report_by_col(profile_report(merged))

    direct = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.avg("o_totalprice").alias("mean"),
        F.stddev_samp("o_totalprice").alias("sd"),
        F.count_distinct("o_orderkey").alias("nd"),
    ).first()

    tp = got["o_totalprice"]
    assert tp.n == direct.n and tp.n_null == 0 and tp.n_slices == 3
    assert tp.min == pytest.approx(direct.mn)
    assert tp.max == pytest.approx(direct.mx)
    assert tp.mean == pytest.approx(direct.mean, rel=1e-9)
    assert tp.stddev == pytest.approx(direct.sd, rel=1e-6)
    ok = got["o_orderkey"]
    # HLL across merged slices stays within the sketch's error band
    assert abs(ok.approx_distinct - direct.nd) / direct.nd < 0.05
    # non-numeric column: bounds/moments honestly NULL, distinct sane
    pr = got["o_orderpriority"]
    assert pr.min is None and pr.mean is None and pr.stddev is None
    assert 3 <= pr.approx_distinct <= 7  # 5 priorities


def test_merge_is_associative_on_exact_fields(spark, orders):
    cols = ["o_totalprice"]
    a = profile_partials(orders.filter("o_orderkey % 3 = 0"), cols, slice_id="a")
    b = profile_partials(orders.filter("o_orderkey % 3 = 1"), cols, slice_id="b")
    c = profile_partials(orders.filter("o_orderkey % 3 = 2"), cols, slice_id="c")

    ab_c = merge_profile_partials(
        merge_profile_partials(a.union(b))
        .withColumn("slice_id", F.lit("ab"))
        .select(a.columns)
        .union(c)
    )
    abc = merge_profile_partials(a.union(b).union(c))
    r1 = _report_by_col(profile_report(ab_c))["o_totalprice"]
    r2 = _report_by_col(profile_report(abc))["o_totalprice"]
    for field in ("n", "n_null", "min", "max"):
        assert getattr(r1, field) == getattr(r2, field)
    assert r1.mean == pytest.approx(r2.mean, rel=1e-12)


def test_dtype_drift_raises(spark):
    d1 = spark.createDataFrame([(1,)], "x int")
    d2 = spark.createDataFrame([(1.5,)], "x double")
    p = profile_partials(d1, ["x"]).union(profile_partials(d2, ["x"]))
    with pytest.raises(ValueError, match="drifted"):
        merge_profile_partials(p)


def test_nulls_and_tiny_slices(spark):
    df = spark.createDataFrame([(None,), (4.0,)], "x double")
    rep = _report_by_col(profile_report(merge_profile_partials(
        profile_partials(df, ["x"])
    )))["x"]
    assert rep.n == 2 and rep.n_null == 1
    assert rep.null_frac == pytest.approx(0.5)
    assert rep.mean == pytest.approx(4.0)
    assert rep.stddev is None  # one non-null value: variance undefined


def test_empty_cols_raises(spark, orders):
    with pytest.raises(ValueError, match="non-empty"):
        profile_partials(orders, [])

"""Mergeable HLL distinct-count sketches (operators/sketches.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.sketches import (
    distinct_sketches,
    merged_distinct_estimates,
    sketch_consistency_report,
)


@pytest.fixture(scope="module")
def df(spark):
    # 3 slices × 400 rows; key overlaps across slices (distinct=600),
    # cat has 7 values, one column all-NULL
    return spark.range(1200).select(
        (F.col("id") % 3).cast("string").alias("slice"),
        (F.col("id") % 600).alias("key"),
        (F.col("id") % 7).cast("string").alias("cat"),
        F.lit(None).cast("string").alias("empty"),
    )


def test_all_merge_paths_within_tolerance(df):
    rep = {
        r["column"]: r
        for r in sketch_consistency_report(
            df, ["key", "cat", "empty"], slice_col="slice"
        ).collect()
    }
    assert all(r["direct_within_tolerance"] for r in rep.values())
    assert all(r["merged_within_tolerance"] for r in rep.values())
    assert all(r["two_stage_within_tolerance"] for r in rep.values())
    assert rep["key"]["exact_distinct"] == 600
    assert rep["cat"]["direct_estimate"] == 7  # small cardinality is exact
    assert rep["empty"]["exact_distinct"] == 0
    assert rep["empty"]["direct_estimate"] == 0


def test_subset_of_slices_estimates_that_subset(df):
    sk = distinct_sketches(df, ["cat"], slice_col="slice")
    one = merged_distinct_estimates(sk.filter("slice = '0'"), ["cat"]).first()
    # slice 0 holds ids ≡0 mod 3 → id%7 over those still hits all 7
    assert one["cat"] == 7
    assert one["n_rows"] == 400


def test_sketch_artifact_shape(df):
    sk = distinct_sketches(df, ["key"], slice_col="slice")
    assert set(sk.columns) == {"slice", "key__hll", "n_rows"}
    assert sk.count() == 3
    row = sk.first()
    assert isinstance(row["key__hll"], (bytes, bytearray))

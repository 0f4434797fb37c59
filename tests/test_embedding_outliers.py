"""Centroid-distance embedding outliers (similarity.py additions).

Fixtures with a planted far-away vector pin the centroid math, the
z-threshold census, deterministic top-k ordering, and the clean-row
exclusions (NULL / wrong-dim / NaN vectors).
"""

from __future__ import annotations

import math

import pytest

from dsci_524_g26_data_validation_spark import (
    centroid_vector,
    embedding_outlier_census,
    embedding_outlier_topk,
)


def _frame(spark):
    # 20 unit-ish vectors near [1, 0, 0, 0]; one wild outlier; plus one
    # NULL, one wrong-dim, one NaN row (all excluded)
    rows = [(i, [1.0, 0.01 * i, 0.0, 0.0]) for i in range(20)]
    rows.append((99, [100.0, 100.0, 100.0, 100.0]))
    rows.append((100, None))
    rows.append((101, [1.0, 2.0]))
    rows.append((102, [float("nan"), 0.0, 0.0, 0.0]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_centroid_excludes_dirty_rows(spark):
    c = centroid_vector(_frame(spark), vec_col="embedding")
    # 21 clean rows: mean of dim0 = (20*1 + 100)/21
    assert c[0] == pytest.approx((20 * 1.0 + 100.0) / 21)
    assert len(c) == 4


def test_census_flags_planted_outlier(spark):
    row = embedding_outlier_census(
        _frame(spark), vec_col="embedding", z=2.0
    ).collect()[0]
    assert row["n_vectors"] == 21
    assert row["n_outliers"] == 1  # the [100,..] vector
    assert row["outlier_frac"] == pytest.approx(1 / 21, abs=1e-6)
    assert row["threshold"] == pytest.approx(
        row["mean_dist"] + 2.0 * row["std_dist"], abs=1e-5
    )


def test_topk_order_deterministic(spark):
    top = embedding_outlier_topk(
        _frame(spark), id_col="vec_id", vec_col="embedding", k=3
    ).collect()
    assert top[0]["vec_id"] == 99  # the planted outlier is farthest
    assert top[0]["dist"] > top[1]["dist"] >= top[2]["dist"]
    # distance of the planted outlier ~ sqrt(sum((100-c_i)^2))
    c = centroid_vector(_frame(spark), vec_col="embedding")
    expected = math.sqrt(sum((100.0 - ci) ** 2 for ci in c))
    assert top[0]["dist"] == pytest.approx(expected, abs=1e-4)


def test_all_dirty_raises(spark):
    df = spark.createDataFrame(
        [(0, None)], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError):
        embedding_outlier_census(df, vec_col="embedding", dim=4)


def test_zero_variance_frame(spark):
    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)],
        "vec_id bigint, embedding array<double>",
    )
    row = embedding_outlier_census(df, vec_col="embedding", z=3.0).collect()[0]
    assert row["n_outliers"] == 0 and row["std_dist"] == 0.0

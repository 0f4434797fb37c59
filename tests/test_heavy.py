"""Heavy hitters (operators/heavy.py): sketch-first exact census —
equivalence with GROUP BY/HAVING, NULL keys, mergeability across
partitionings, estimate bounds, parameter validation."""

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.heavy import (
    MAX_COUNTERS,
    _compress,
    heavy_hitters,
    heavy_hitters_estimate,
    misra_gries_partials,
)


def _exact(df, key, threshold):
    rows = (
        df.select(F.col(key).cast("string").alias("key_str"))
        .groupBy("key_str")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
        .collect()
    )
    return {(r.key_str, r.cnt) for r in rows}


@pytest.fixture()
def skewed(spark):
    # hot ×500, warm ×120, mid ×40, 300 singletons, NULL ×200
    rows = (
        [("hot",)] * 500
        + [("warm",)] * 120
        + [("mid",)] * 40
        + [(f"u{i}",) for i in range(300)]
        + [(None,)] * 200
    )
    return spark.createDataFrame(rows, "k string").repartition(7)


def test_matches_exact_census_min_count(spark, skewed):
    got = {
        (r.key_str, r.cnt)
        for r in heavy_hitters(skewed, "k", min_count=100).collect()
    }
    assert got == _exact(skewed, "k", 100)
    assert ("hot", 500) in got and (None, 200) in got and ("warm", 120) in got


def test_matches_exact_census_min_share(spark, skewed):
    n = skewed.count()
    got = {
        (r.key_str, r.cnt)
        for r in heavy_hitters(skewed, "k", min_share=0.03).collect()
    }
    import math

    assert got == _exact(skewed, "k", math.ceil(0.03 * n))


def test_threshold_boundary_inclusive(spark, skewed):
    # min_count exactly equal to a key's count keeps that key
    got = {r.key_str for r in heavy_hitters(skewed, "k", min_count=40).collect()}
    assert "mid" in got
    got2 = {r.key_str for r in heavy_hitters(skewed, "k", min_count=41).collect()}
    assert "mid" not in got2


def test_partitioning_invariance(spark, skewed):
    one = {
        (r.key_str, r.cnt)
        for r in heavy_hitters(skewed.coalesce(1), "k", min_count=100).collect()
    }
    many = {
        (r.key_str, r.cnt)
        for r in heavy_hitters(skewed.repartition(16), "k", min_count=100).collect()
    }
    assert one == many == _exact(skewed, "k", 100)


def test_integer_keys_render_as_strings(spark):
    df = spark.createDataFrame(
        [(7,)] * 50 + [(i,) for i in range(40)], "k int"
    )
    got = {(r.key_str, r.cnt) for r in heavy_hitters(df, "k", min_count=30).collect()}
    assert got == {("7", 51)}  # 50 planted + the i=7 singleton


def test_empty_input(spark):
    empty = spark.createDataFrame([], "k string")
    assert heavy_hitters(empty, "k", min_count=5).count() == 0
    assert heavy_hitters(empty, "k", min_share=0.5).count() == 0


def test_estimate_bounds_bracket_truth(spark, skewed):
    est = {
        r.key_str: (r.lb, r.ub)
        for r in heavy_hitters_estimate(skewed, "k", k=50, top_k=10).collect()
    }
    truth = {
        r.key_str: r.cnt
        for r in skewed.groupBy(F.col("k").alias("key_str"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert "hot" in est
    for key, (lb, ub) in est.items():
        assert lb <= truth[key] <= ub
    # the hottest key ranks first by lower bound
    top = heavy_hitters_estimate(skewed, "k", k=50, top_k=1).first()
    assert top.key_str == "hot"


def test_partials_row_bound(spark, skewed):
    k = 20
    parts = misra_gries_partials(skewed.repartition(5), "k", k=k)
    # at most k counter rows per partition
    assert parts.count() <= 5 * k
    # summed n_part recovers the exact row count
    assert parts.agg(F.sum("n_part")).first()[0] == skewed.count()


def test_compress_unit():
    counters = {f"k{i}": i + 1 for i in range(10)}  # counts 1..10
    out = _compress(dict(counters), 4)
    assert len(out) <= 4
    # lower-bound property: every surviving count <= true count
    for key, c in out.items():
        assert 0 < c <= counters[key]
    # no compression below k
    assert _compress(dict(counters), 10) == counters


def test_parameter_validation(spark, skewed):
    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(skewed, "k")
    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(skewed, "k", min_count=5, min_share=0.1)
    with pytest.raises(ValueError, match="safety"):
        heavy_hitters(skewed, "k", min_count=5, safety=1.0)
    with pytest.raises(ValueError, match="min_share"):
        heavy_hitters(skewed, "k", min_share=0.0)
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters(skewed, "k", min_count=0)
    with pytest.raises(ValueError, match="counters"):
        heavy_hitters(skewed, "k", min_share=1.0 / (MAX_COUNTERS * 2))
    with pytest.raises(ValueError, match="k must be"):
        misra_gries_partials(skewed, "k", k=0)
    with pytest.raises(ValueError, match="top_k"):
        heavy_hitters_estimate(skewed, "k", k=5, top_k=0)

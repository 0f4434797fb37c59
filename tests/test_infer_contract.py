"""Parity tests for infer_contract — assertions mirror the reference suite
(/root/reference/tests/unit/test_infer_contract.py) with the dtype
vocabulary translated to Spark simpleStrings (SURVEY.md §1.2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dsci_524_g26_data_validation_spark import Contract, infer_contract


def test_rejects_non_dataframe(spark):
    # reference test_infer_contract.py:11-16 (TypeError on non-DataFrame)
    with pytest.raises(TypeError):
        infer_contract([1, 2, 3])
    with pytest.raises(TypeError):
        infer_contract(None)


def test_rule_per_column_and_dtypes(spark):
    # reference test_infer_contract.py:32-37,69-77
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)], "num bigint, cat string, x double"
    )
    contract = infer_contract(df)
    assert isinstance(contract, Contract)
    assert set(contract.columns) == {"num", "cat", "x"}
    assert contract.columns["num"].dtype == "bigint"
    assert contract.columns["cat"].dtype == "string"
    assert contract.columns["x"].dtype == "double"


def test_numeric_gets_bounds_categorical_gets_domain(spark):
    # reference test_infer_contract.py:69-77 (F2 fixture)
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "num bigint, cat string")
    c = infer_contract(df)
    assert c.columns["num"].min_value == 1.0
    assert c.columns["num"].max_value == 3.0
    assert c.columns["num"].allowed_values is None
    assert c.columns["cat"].allowed_values == {"a", "b"}
    assert c.columns["cat"].min_value is None
    assert c.columns["cat"].max_value is None


def test_exact_missing_fractions(spark):
    # reference test_infer_contract.py:93-105 (F3 fixture): exact 0.5, 1.0
    df = spark.createDataFrame(
        [(1.0,), (None,), (None,), (4.0,)], T.StructType([T.StructField("a", T.DoubleType())])
    )
    c = infer_contract(df)
    assert c.columns["a"].max_missing_frac == 0.5
    assert c.columns["a"].min_value == 1.0
    assert c.columns["a"].max_value == 4.0

    df_all = spark.createDataFrame(
        [(None,), (None,), (None,)], T.StructType([T.StructField("a", T.DoubleType())])
    )
    c2 = infer_contract(df_all)
    assert c2.columns["a"].max_missing_frac == 1.0
    # all-NULL numeric → bounds None (reference notna-any guard)
    assert c2.columns["a"].min_value is None
    assert c2.columns["a"].max_value is None


def test_empty_dataframe_empty_contract(spark):
    # reference test_infer_contract.py:84-87
    df = spark.createDataFrame([], T.StructType([]))
    c = infer_contract(df)
    assert c.columns == {}


def test_bool_domain_pandas_capitalization(spark):
    # reference test_infer_contract.py:112-115 (F4): {"True","False"}
    df = spark.createDataFrame([(True,), (False,), (True,)], "flag boolean")
    c = infer_contract(df)
    assert c.columns["flag"].dtype == "boolean"
    assert c.columns["flag"].allowed_values == {"True", "False"}


def test_high_cardinality_guard(spark):
    # scale extension (SURVEY.md §4.2): high-cardinality string column
    # yields allowed_values=None instead of a huge collect_set.
    df = spark.range(5000).selectExpr("cast(id as string) as s")
    c = infer_contract(df, max_categories=100)
    assert c.columns["s"].allowed_values is None


def test_all_null_string_gets_empty_domain(spark):
    # reference: set(map(str, s.dropna().unique())) == set() for all-null
    df = spark.createDataFrame(
        [(None,), (None,)], T.StructType([T.StructField("s", T.StringType())])
    )
    c = infer_contract(df)
    assert c.columns["s"].allowed_values == set()
    assert c.columns["s"].max_missing_frac == 1.0


# -- infer_profile (P6 surfaced in the public profile path) -------------------


def test_infer_profile_quantiles_and_stats(spark):
    from dsci_524_g26_data_validation_spark import infer_profile

    df = spark.range(1, 101).selectExpr(
        "id as v", "cast(id as string) as s"
    )
    prof = infer_profile(df, exact_quantiles=True)
    assert prof.n_rows == 100
    v = prof.columns["v"]
    # exact interpolated percentiles of 1..100
    assert v.quantiles == (25.75, 50.5, 75.25)
    assert v.min_value == 1.0 and v.max_value == 100.0
    assert v.non_null_count == 100
    # HLL estimate within its ~2% error band
    assert abs(v.approx_distinct - 100) <= 5
    s = prof.columns["s"]
    assert s.quantiles is None
    assert s.allowed_values is not None and len(s.allowed_values) == 100


def test_infer_profile_gk_mode_returns_data_values(spark):
    from dsci_524_g26_data_validation_spark import infer_profile

    df = spark.range(1, 1001).selectExpr("id as v")
    prof = infer_profile(df)  # GK sketch (default at-scale mode)
    q = prof.columns["v"].quantiles
    assert q is not None
    # percentile_approx returns actual data values near the true ranks
    assert abs(q[0] - 250) <= 5 and abs(q[1] - 500) <= 5 and abs(q[2] - 750) <= 5
    assert q[0] <= q[1] <= q[2]


def test_infer_profile_contract_matches_infer_contract(spark, sf_dir):
    from dsci_524_g26_data_validation_spark import infer_contract, infer_profile

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert infer_profile(df).contract == infer_contract(df)


def test_group_quantiles_exact_and_approx(spark):
    from pyspark.sql import functions as F

    import dsci_524_g26_data_validation_spark as dv

    df = spark.range(0, 1000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    exact = {
        r["g"]: (r["q_25"], r["q_50"], r["q_99_9"])
        for r in dv.group_quantiles(
            df, "v", "g", quantiles=(0.25, 0.5, 0.999), exact=True
        ).collect()
    }
    assert len(exact) == 4
    # group '0' holds 0,4,...,996: exact interpolated p50 = 498
    assert exact["0"][1] == 498.0
    approx = {
        r["g"]: r["q_50"]
        for r in dv.group_quantiles(df, "v", "g", quantiles=(0.5,)).collect()
    }
    for g, q50 in approx.items():
        assert abs(q50 - exact[g][1]) <= 8  # GK sketch within accuracy

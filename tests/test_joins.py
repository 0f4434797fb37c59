"""Join pre-flight (operators/joins.py): exact predicted cardinality,
key-overlap census, NULL-key semantics, hot-key witnesses, plan shape."""

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.joins import (
    hot_join_keys,
    join_explosion_report,
)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [("k1",), ("k1",), ("k1",), ("k2",), ("k3",), (None,)],
        "k string",
    )
    right = spark.createDataFrame(
        [("k1",), ("k1",), ("k2",), ("k4",), (None,), (None,)],
        "k string",
    )
    return left, right


def test_report_exact_cardinality(spark, sides):
    left, right = sides
    r = join_explosion_report(left, right, keys=["k"]).first()
    assert (r.n_rows_left, r.n_rows_right) == (6, 6)
    assert (r.n_keys_left, r.n_keys_right) == (3, 3)
    assert r.n_shared_keys == 2            # k1, k2
    assert r.n_keys_left_only == 1         # k3
    assert r.n_keys_right_only == 1        # k4
    # join rows: k1 -> 3*2, k2 -> 1*1
    assert r.join_rows == 7
    assert r.max_key_fanout == 6
    assert (r.null_key_rows_left, r.null_key_rows_right) == (1, 2)
    # the prediction matches the real inner join exactly
    assert left.join(right, on="k").count() == 7


def test_hot_keys_ranked(spark, sides):
    left, right = sides
    rows = hot_join_keys(left, right, keys=["k"], top_k=5).collect()
    assert [(r.k, r.n_left, r.n_right, r.join_rows) for r in rows] == [
        ("k1", 3, 2, 6),
        ("k2", 1, 1, 1),
    ]


def test_composite_keys_and_validation(spark):
    left = spark.createDataFrame([("a", 1), ("a", 1), ("a", 2)], "x string, y int")
    right = spark.createDataFrame([("a", 1), ("b", 2)], "x string, y int")
    r = join_explosion_report(left, right, keys=["x", "y"]).first()
    assert r.join_rows == 2 and r.n_shared_keys == 1
    with pytest.raises(ValueError, match="at least one"):
        join_explosion_report(left, right, keys=[])
    with pytest.raises(ValueError, match="top_k"):
        hot_join_keys(left, right, keys=["x"], top_k=0)


def test_hot_keys_plan_topk(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = hot_join_keys(
        o, c.withColumnRenamed("c_custkey", "o_custkey"),
        keys=["o_custkey"], top_k=5,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_report_single_scan_per_side(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey AS k"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "l_orderkey AS k"
    )
    out = join_explosion_report(o, l, keys=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one key-count aggregation per input, one join, one fold — the
    # null-key masses ride the same aggregate, never a re-scan
    assert plan.count("FileScan parquet") == 2


def test_join_preflight_decimal_cardinality(spark):
    """Predicted cardinalities compute in decimal(38,0): a mega-hot key
    whose per-key product passes 2^63 must be REPORTED, not abort the
    pre-flight with an ANSI overflow. Simulated by verifying the output
    dtype and the exact value path on real (small) counts."""
    from decimal import Decimal

    from dsci_524_g26_data_validation_spark.operators.joins import (
        hot_join_keys,
        join_explosion_report,
    )

    l = spark.createDataFrame([("k",)] * 3 + [("j",)], "k string")
    r = spark.createDataFrame([("k",)] * 2, "k string")
    rep = join_explosion_report(l, r, keys=["k"])
    schema = {f.name: f.dataType.simpleString() for f in rep.schema.fields}
    assert schema["join_rows"] == "decimal(38,0)"
    assert schema["max_key_fanout"] == "decimal(38,0)"
    row = rep.first()
    assert row.join_rows == Decimal(6) and row.max_key_fanout == Decimal(6)
    hot = hot_join_keys(l, r, keys=["k"])
    assert {f.name: f.dataType.simpleString() for f in hot.schema.fields}[
        "join_rows"
    ] == "decimal(38,0)"
    assert hot.first().join_rows == Decimal(6)

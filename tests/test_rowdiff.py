"""Row-level table reconciliation (operators/rowdiff.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv

SCHEMA = "id int, v string"


@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (3, "c"), (4, None)], SCHEMA
    )


def test_identical_tables(spark, left):
    row = dv.table_diff(left, left).collect()[0]
    assert row["n_left"] == row["n_right"] == row["n_common"] == 5
    assert row["n_only_left"] == row["n_only_right"] == 0
    assert row["n_distinct_diff"] == 0


def test_multiset_semantics(spark, left):
    # right: drops one (3,'c') copy, mutates (2,'b')->(2,'B'), adds (9,'z')
    right = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (4, None), (9, "z")], SCHEMA
    )
    row = dv.table_diff(left, right).collect()[0]
    assert row["n_left"] == 5 and row["n_right"] == 5
    assert row["n_common"] == 3          # (1,a), one (3,c), (4,NULL)
    assert row["n_only_left"] == 2       # (2,b), extra (3,c)
    assert row["n_only_right"] == 2      # (2,B), (9,z)
    assert row["n_distinct_diff"] == 4   # b, B, z, and the c-count 2 vs 1


def test_null_vs_empty_string_distinct(spark):
    a = spark.createDataFrame([(1, None)], SCHEMA)
    b = spark.createDataFrame([(1, "")], SCHEMA)
    row = dv.table_diff(a, b).collect()[0]
    assert row["n_common"] == 0 and row["n_only_left"] == 1


def test_diff_rows_witness_joinback(spark, left):
    right = left.filter("id != 2")
    rows = dv.table_diff_rows(left, right).collect()
    assert len(rows) == 1
    wit = left.withColumn("_d", dv.row_digest(left.columns)).filter(
        (F.col("_d.h1") == rows[0]["h1"]) & (F.col("_d.h2") == rows[0]["h2"])
    )
    assert [r["id"] for r in wit.collect()] == [2]
    assert rows[0]["left_count"] == 1 and rows[0]["right_count"] == 0


def test_column_subset_and_validation(spark, left):
    right = left.withColumn("v", F.lit("x"))  # differs on v everywhere
    row = dv.table_diff(left, right, cols=["id"]).collect()[0]
    assert row["n_only_left"] == 0 and row["n_only_right"] == 0
    with pytest.raises(ValueError, match="right"):
        dv.table_diff(left, left.select("id"), cols=["id", "v"])


def test_digest_shuffle_carries_no_payload(left):
    """The exchanges in the diff plan move digest structs + counts, not
    source columns: no input column name appears in any Exchange row."""
    plan = (
        dv.table_diff(left, left)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert " v#" not in line and " id#" not in line, line

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


# -- per-partition digests -----------------------------------------------------


def test_partition_digests_order_invariant(spark):
    from dsci_524_g26_data_validation_spark.operators.rowdiff import (
        partition_digests,
    )

    rows = [("p1", 1, "a"), ("p1", 2, "b"), ("p2", 3, "c")]
    a = spark.createDataFrame(rows, "p string, k int, v string")
    b = spark.createDataFrame(list(reversed(rows)), "p string, k int, v string").repartition(7)
    da = {r.partition: (r.n_rows, r.digest_1, r.digest_2)
          for r in partition_digests(a, partition_col="p", cols=["k", "v"]).collect()}
    db = {r.partition: (r.n_rows, r.digest_1, r.digest_2)
          for r in partition_digests(b, partition_col="p", cols=["k", "v"]).collect()}
    assert da == db and set(da) == {"p1", "p2"}


def test_partition_diff_statuses(spark):
    from dsci_524_g26_data_validation_spark.operators.rowdiff import (
        partition_diff,
    )

    left = spark.createDataFrame(
        [("p1", 1, "a"), ("p1", 2, "b"), ("p2", 3, "c"), ("p3", 4, "d")],
        "p string, k int, v string",
    )
    right = spark.createDataFrame(
        [
            ("p1", 1, "a"), ("p1", 2, "b"),       # identical
            ("p2", 3, "MUTATED"),                  # same count, new content
            ("p4", 9, "x"),                        # new partition
        ],
        "p string, k int, v string",
    )
    got = {r.partition: r.status
           for r in partition_diff(left, right, partition_col="p").collect()}
    assert got == {"p1": "match", "p2": "differs", "p3": "only_left",
                   "p4": "only_right"}


def test_partition_diff_swap_not_fooled(spark):
    """Two rows swapping a value between them changes per-row digests;
    the SUM invariant must still catch it (sum of different multisets)."""
    from dsci_524_g26_data_validation_spark.operators.rowdiff import (
        partition_diff,
    )

    left = spark.createDataFrame(
        [("p", 1, "a"), ("p", 2, "b")], "p string, k int, v string"
    )
    right = spark.createDataFrame(
        [("p", 1, "b"), ("p", 2, "a")], "p string, k int, v string"
    )
    got = partition_diff(left, right, partition_col="p").first()
    assert got.status == "differs"


def test_partition_digests_portable_and_validation(spark):
    from dsci_524_g26_data_validation_spark.operators.rowdiff import (
        partition_digests,
    )

    df = spark.createDataFrame([("p", 1)], "p string, k int")
    out = partition_digests(
        df, partition_col="p", cols=["k"], hash_fn="portable"
    )
    assert out.columns == ["partition", "n_rows", "digest_1"]
    with pytest.raises(ValueError, match="hash_fn"):
        partition_digests(df, partition_col="p", cols=["k"], hash_fn="md5")
    with pytest.raises(ValueError, match="at least one"):
        partition_digests(df, partition_col="p", cols=[])

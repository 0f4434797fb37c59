"""Degenerate-input behavior: empty tables, all-null columns, 0-row
streams — the engine must report cleanly, never throw."""

from __future__ import annotations

from pyspark.sql import types as T

import dsci_524_g26_data_validation_spark as dv

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)

TC = dv.TableContract(
    contract=dv.Contract(
        columns={
            "doc_id": dv.ColumnRule(dtype="string"),
            "tokens": dv.ColumnRule(dtype="array<int>"),
            "n_tok": dv.ColumnRule(dtype="int", min_value=1),
            "source": dv.ColumnRule(dtype="string", allowed_values={"web"}),
        }
    ),
    unique_keys=("doc_id",),
    invariants=("n_tok = size(tokens)",),
)


def test_empty_table_full_pass_is_ok(spark):
    empty = spark.createDataFrame([], SCHEMA)
    res = dv.validate_table_contract(empty, TC, reference=empty)
    assert res.ok is True


def test_empty_table_infer(spark):
    empty = spark.createDataFrame([], SCHEMA)
    c = dv.infer_contract(empty)
    assert set(c.columns) == {"doc_id", "tokens", "n_tok", "source"}
    r = c.columns["n_tok"]
    # no rows -> no bounds, zero missingness (reference all-null/empty path)
    assert r.min_value is None and r.max_value is None
    assert r.max_missing_frac == 0.0


def test_all_null_column(spark):
    df = spark.createDataFrame([(None, None, None, None)] * 3, SCHEMA)
    res = dv.validate_contract(
        df, dv.Contract(columns={"n_tok": dv.ColumnRule(dtype="int", min_value=1)}),
        strict=False,
    )
    # all-null: missingness fires (1.0 > 0.0); range can't (no values)
    kinds = [i.kind for i in res.issues]
    assert kinds == ["missingness"]


def test_token_equality_empty_and_disjoint(spark):
    from dsci_524_g26_data_validation_spark.operators.tokens import (
        key_integrity_counts,
        token_equality_violations,
    )

    empty = spark.createDataFrame([], SCHEMA)
    a = dv.token_table(spark, 100, num_partitions=2)
    # empty vs empty
    assert token_equality_violations(empty, empty).count() == 0
    kc = key_integrity_counts(empty, empty)
    assert kc["dup_keys"] == 0 and kc["eq_bad_keys"] == 0
    # disjoint keys: inner-join semantics -> nothing to compare
    b = a.selectExpr("concat(doc_id, '_x') as doc_id", "tokens", "n_tok", "source")
    assert token_equality_violations(a, b).count() == 0
    assert key_integrity_counts(a, b)["eq_bad_keys"] == 0


def test_duplicate_keys_with_nulls(spark):
    df = spark.createDataFrame(
        [(None, [1], 1, "web"), (None, [2], 1, "web"), ("a", [1], 1, "web")],
        SCHEMA,
    )
    dup = dv.duplicate_keys(df, "doc_id").collect()
    # NULL keys group like SQL GROUP BY: two NULLs are a duplicate pair
    assert len(dup) == 1 and dup[0]["dup_count"] == 2

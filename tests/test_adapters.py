"""Great-Expectations suite adapter (adapters.py): import mapping,
mostly/anywhere-regex semantics, unsupported handling, dtype
completion, export round-trip, compound-key JSON round-trip."""

import pytest

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.adapters import (
    UnsupportedExpectation,
    expectations_to_table_contract,
    table_contract_to_expectations,
)


def _e(etype, **kwargs):
    return {"expectation_type": etype, "kwargs": kwargs, "meta": {}}


SUITE = {
    "expectation_suite_name": "orders_suite",
    "expectations": [
        _e("expect_column_values_to_be_of_type", column="o_orderkey", type_="int64"),
        _e("expect_column_values_to_not_be_null", column="o_orderkey", mostly=0.98),
        _e("expect_column_values_to_be_unique", column="o_orderkey"),
        _e(
            "expect_column_values_to_be_between",
            column="o_totalprice",
            min_value=0,
            max_value=1e6,
        ),
        _e(
            "expect_column_values_to_be_in_set",
            column="o_orderpriority",
            value_set=["1-URGENT", "2-HIGH"],
        ),
        _e("expect_column_values_to_match_regex", column="o_clerk", regex="Clerk#\\d+"),
        _e(
            "expect_compound_columns_to_be_unique",
            column_list=["o_orderkey", "o_custkey"],
        ),
        _e("expect_table_row_count_to_be_between", min_value=1, max_value=10**12),
        _e(
            "expect_column_mean_to_be_between",
            column="o_totalprice",
            min_value=10,
            max_value=10**7,
        ),
        _e(
            "expect_column_pair_values_a_to_be_greater_than_b",
            column_A="o_totalprice",
            column_B="o_shippriority",
            or_equal=True,
        ),
        _e(
            "expect_column_proportion_of_unique_values_to_be_between",
            column="o_orderkey",
            min_value=0.99,
            max_value=1.0,
        ),
    ],
}

DTYPES = {
    "o_totalprice": "double",
    "o_orderpriority": "string",
    "o_clerk": "string",
    "o_custkey": "bigint",
    "o_shippriority": "int",
}


def test_import_maps_every_supported_expectation():
    tc, skipped = expectations_to_table_contract(SUITE, dtypes=DTYPES)
    assert skipped == []
    assert tc.name == "orders_suite"
    r = tc.contract.columns["o_orderkey"]
    assert r.dtype == "bigint"  # int64 normalized
    assert r.max_missing_frac == pytest.approx(0.02)
    assert tc.contract.columns["o_totalprice"].min_value == 0
    assert tc.contract.columns["o_totalprice"].max_value == 1e6
    assert tc.contract.columns["o_orderpriority"].allowed_values == {
        "1-URGENT",
        "2-HIGH",
    }
    assert tc.contract.columns["o_clerk"].pattern == "(?s).*(?:Clerk#\\d+).*"
    assert "o_orderkey" in tc.unique_keys
    assert ("o_orderkey", "o_custkey") in tc.unique_keys
    exprs = {c.expr for c in tc.checks}
    assert "count(*)" in exprs
    assert "avg(`o_totalprice`)" in exprs
    assert "count(DISTINCT `o_orderkey`) / count(`o_orderkey`)" in exprs
    assert tc.invariants == ("`o_totalprice` >= `o_shippriority`",)


def test_imported_contract_validates_real_data(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    real_suite = {
        "expectation_suite_name": "orders_live",
        "expectations": [
            _e("expect_column_values_to_be_unique", column="o_orderkey"),
            _e(
                "expect_column_values_to_be_between",
                column="o_totalprice",
                min_value=0,
                max_value=1e9,
            ),
            _e(
                "expect_column_values_to_be_in_set",
                column="o_orderpriority",
                value_set=["1-URGENT", "2-HIGH"],
            ),
            _e(
                "expect_column_values_to_match_regex",
                column="o_orderstatus",
                regex="[A-Z]",
            ),
            _e("expect_table_row_count_to_be_between", min_value=1),
            _e(
                "expect_column_mean_to_be_between",
                column="o_totalprice",
                min_value=1,
                max_value=1e9,
            ),
        ],
    }
    tc, _ = expectations_to_table_contract(
        real_suite, dtypes=dict(orders.dtypes)
    )
    res = dv.validate_table_contract(orders, tc)
    kinds = sorted({i.kind for i in res.issues})
    # o_orderpriority has 5 values in the data but the suite allows 2
    assert "category" in kinds
    # uniqueness of o_orderkey, the range, the anywhere-regex, and both
    # aggregate checks all hold on the real table
    assert "uniqueness" not in kinds
    assert "range" not in kinds
    assert "pattern" not in kinds
    assert "aggregate" not in kinds


def test_regex_matches_anywhere_like_gx(spark):
    df = spark.createDataFrame(
        [("prefix Clerk#42 suffix",), ("no clerk here",)], "o_clerk string"
    )
    suite = {
        "expectations": [
            _e("expect_column_values_to_match_regex", column="o_clerk",
               regex="Clerk#\\d+")
        ]
    }
    tc, _ = expectations_to_table_contract(suite, dtypes={"o_clerk": "string"})
    res = dv.validate_contract(df, tc.contract, strict=False)
    pat = [i for i in res.issues if i.kind == "pattern"]
    assert len(pat) == 1 and pat[0].observed == 1  # only the second row fails


def test_unsupported_raise_and_skip():
    suite = {
        "expectations": [
            _e("expect_column_values_to_be_increasing", column="x"),
            _e("expect_column_values_to_be_between", column="x",
               min_value=0, mostly=0.9),
        ]
    }
    with pytest.raises(UnsupportedExpectation, match="increasing"):
        expectations_to_table_contract(suite, dtypes={"x": "int"})
    tc, skipped = expectations_to_table_contract(
        suite, dtypes={"x": "int"}, on_unsupported="skip"
    )
    assert len(skipped) == 2
    # mostly<1 range must NOT silently tighten into a strict rule —
    # with every x-expectation unsupported, no x rule is invented
    assert "x" not in tc.contract.columns


def test_missing_dtype_raises():
    suite = {"expectations": [_e("expect_column_to_exist", column="mystery")]}
    with pytest.raises(ValueError, match="mystery"):
        expectations_to_table_contract(suite)


def test_export_import_round_trip():
    tc, _ = expectations_to_table_contract(SUITE, dtypes=DTYPES)
    suite2 = table_contract_to_expectations(tc)
    tc2, skipped = expectations_to_table_contract(
        suite2, dtypes=DTYPES, on_unsupported="skip"
    )
    assert skipped == []
    assert tc2.contract.columns == tc.contract.columns
    assert set(map(str, tc2.unique_keys)) == set(map(str, tc.unique_keys))
    assert {c.expr for c in tc2.checks} == {c.expr for c in tc.checks}
    # the invariant can't round-trip as an expectation; it is listed, not lost
    assert tc.invariants[0] in suite2["meta"]["dsci_524_g26_unmapped"]


def test_compound_key_json_round_trip():
    tc, _ = expectations_to_table_contract(SUITE, dtypes=DTYPES)
    tc2 = dv.table_contract_from_json(dv.table_contract_to_json(tc))
    assert tc2.unique_keys == tc.unique_keys


def test_strict_bounds_route_to_unsupported():
    suite = {
        "expectation_suite_name": "s",
        "expectations": [
            _e("expect_column_values_to_be_of_type", column="x", type_="int64"),
            _e(
                "expect_column_values_to_be_between",
                column="x",
                min_value=0,
                strict_min=True,
            ),
        ],
    }
    tc, skipped = expectations_to_table_contract(suite, on_unsupported="skip")
    # importing a strict bound as inclusive would WIDEN the check
    assert tc.contract.columns["x"].min_value is None
    assert any(
        e["expectation_type"] == "expect_column_values_to_be_between"
        for e in skipped
    )


def test_compare_contracts_with_mixed_unique_keys():
    # GX import yields str AND tuple unique keys in one contract; the
    # diff must not crash on sorted({str, tuple})
    suite = {
        "expectation_suite_name": "s",
        "expectations": [
            _e("expect_column_values_to_be_of_type", column="a", type_="int64"),
            _e("expect_column_values_to_be_of_type", column="b", type_="int64"),
            _e("expect_column_values_to_be_unique", column="a"),
            _e(
                "expect_compound_columns_to_be_unique",
                column_list=["a", "b"],
            ),
        ],
    }
    tc, _ = expectations_to_table_contract(suite, on_unsupported="skip")
    empty = dv.TableContract(contract=tc.contract, unique_keys=())
    diff = dv.compare_table_contracts(empty, tc)
    assert set(map(type, diff["unique_keys_added"])) <= {str, tuple}
    assert len(diff["unique_keys_added"]) == 2

"""Benford first-digit conformance check.

Pins: exact digit extraction from fixed-point units (incl. negatives,
sub-unit values, NULL/zero exclusion), zero-count digits present,
fractions sum to 1, a genuinely Benford-ish series conforms (MAD small)
while a constant-leading-digit series fails, one-scan plan.
"""

from __future__ import annotations

import pytest

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators.benford import (
    BENFORD_EXPECTED,
    benford_report,
    benford_stat,
    first_digit_expr,
)
from pyspark.sql import functions as F


def test_digit_extraction(spark):
    df = spark.createDataFrame(
        [(123.45,), (-0.071,), (0.0,), (None,), (9.0,), (0.004,)],
        "x double",
    )
    got = [r[0] for r in df.select(first_digit_expr("x")).collect()]
    # cents: 12345 -> 1; -7 -> 7; 0 -> NULL; NULL -> NULL; 900 -> 9;
    # 0.004*100 rounds to 0 -> NULL
    assert got == [1, 7, None, None, 9, None]


def test_report_covers_all_digits(spark):
    df = spark.createDataFrame([(1.0,)] * 5 + [(2.0,)] * 5, "x double")
    rows = benford_report(df, "x").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    by_d = {r["digit"]: r for r in rows}
    assert by_d[1]["n"] == 5 and by_d[2]["n"] == 5 and by_d[3]["n"] == 0
    assert by_d[1]["observed_frac"] == pytest.approx(0.5)
    assert sum(r["observed_frac"] for r in rows) == pytest.approx(1.0)
    assert by_d[4]["expected_frac"] == pytest.approx(BENFORD_EXPECTED[4], abs=1e-9)


def test_benford_series_conforms_constant_fails(spark):
    # geometric growth spans decades uniformly in log space -> Benford
    benfordish = spark.createDataFrame(
        [(1.05 ** i,) for i in range(1, 400)], "x double"
    )
    good = benford_stat(benfordish, "x")
    assert good["mad"] < 0.012  # Nigrini 'acceptable'
    constant = spark.createDataFrame([(900.0 + i * 0.01,) for i in range(100)], "x double")
    bad = benford_stat(constant, "x")
    assert bad["mad"] > 0.05 and bad["chi_square"] > good["chi_square"]


def test_single_scan(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    plan = benford_report(df, "x")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 2  # data + 9-row literal frame


def test_public_api(spark):
    assert dv.benford_report is benford_report and dv.benford_stat is benford_stat


def test_empty_and_all_null_columns_do_not_crash(spark):
    """r3 review fix: ANSI divide-by-zero on a zero-total digit frame —
    a validation operator must report on empty input, never abort."""
    from dsci_524_g26_data_validation_spark.operators.benford import (
        benford_report,
        benford_stat,
    )

    nulls = spark.createDataFrame([(None,), (None,), (0.0,)], "x double")
    rows = benford_report(nulls, "x").collect()
    assert len(rows) == 9
    assert all(r.n == 0 and r.observed_frac is None for r in rows)
    assert benford_stat(nulls, "x") == {"chi_square": 0.0, "mad": 0.0, "n": 0}

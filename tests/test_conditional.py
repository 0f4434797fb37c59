"""Conditional WHEN→THEN row rules (engine extension; the reference has
no conditional rules — reference validate_contract.py covers only
unconditional per-column checks).

Pins: three-valued-logic contract (NULL when → not applicable, NULL
then → violation), one-scan report, pre-explode pruning in the
violations path, fused-pass integration, JSON round-trip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators.conditional import (
    conditional_report,
    conditional_violations,
)


@pytest.fixture
def df(spark):
    # (id, status, price): NULL status rows test when-NULL,
    # NULL price rows test then-NULL.
    return spark.createDataFrame(
        [
            (1, "F", 10.0),
            (2, "F", -5.0),   # applicable, then false -> violation
            (3, "F", None),   # applicable, then NULL  -> violation
            (4, "O", -99.0),  # not applicable
            (5, None, -1.0),  # when NULL -> not applicable
        ],
        "id int, status string, price double",
    )


RULE = dv.ConditionalRule(
    when="status = 'F'", then="price >= 0", name="f_price_nonneg"
)


def test_report_counts(spark, df):
    row = conditional_report(df, [RULE]).collect()[0]
    assert row["rule"] == "f_price_nonneg"
    assert row["n_applicable"] == 3
    assert row["n_violations"] == 2
    assert row["violation_rate"] == pytest.approx(2 / 3)


def test_violation_rows(spark, df):
    got = conditional_violations(df, [RULE], id_cols=["id"]).collect()
    assert sorted(r["id"] for r in got) == [2, 3]
    assert all(r["rule"] == "f_price_nonneg" for r in got)


def test_multiple_rules_one_row_each(spark, df):
    r2 = dv.ConditionalRule(when="id >= 2", then="status is not null", name="r2")
    got = conditional_violations(df, [RULE, r2], id_cols=["id"]).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], set()).add(r["rule"])
    assert by_id == {2: {"f_price_nonneg"}, 3: {"f_price_nonneg"}, 5: {"r2"}}


def test_empty_rules_rejected(spark, df):
    with pytest.raises(ValueError):
        conditional_report(df, [])
    with pytest.raises(ValueError):
        conditional_violations(df, [], id_cols=["id"])
    with pytest.raises(ValueError):
        dv.ConditionalRule(when="", then="x")


def test_report_is_single_scan(spark, df):
    plan = conditional_report(df, [RULE])._jdf.queryExecution().executedPlan().toString()
    # a single global aggregate: exactly one scan of the source
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1


def test_table_contract_integration_and_json(spark, df):
    tc = dv.TableContract(
        contract=dv.Contract(columns={}),
        conditionals=(RULE,),
        name="t",
    )
    tc2 = dv.table_contract_from_json(dv.table_contract_to_json(tc))
    assert tc2.conditionals == (RULE,)
    res = dv.validate_table_contract(df, tc2, strict=False)
    kinds = [i.kind for i in res.issues]
    assert "conditional" in kinds and not res.ok
    issue = next(i for i in res.issues if i.kind == "conditional")
    assert issue.observed == 2 and "f_price_nonneg" in issue.message


def test_clean_table_passes(spark):
    clean = spark.createDataFrame([(1, "F", 5.0)], "id int, status string, price double")
    tc = dv.TableContract(contract=dv.Contract(columns={}), conditionals=(RULE,))
    assert dv.validate_table_contract(clean, tc, strict=False).ok

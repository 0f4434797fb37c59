"""Quarantine routing: tag_rows / quarantine_split / write_quarantine.

Engine extension (no reference counterpart — the reference only reports
issues, reference validation.py:1-210): DLT expect_or_drop semantics on
the same compiled predicates as violation_rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.types import ConditionalRule


@pytest.fixture()
def contract():
    return dv.Contract(
        columns={
            "x": dv.ColumnRule(dtype="bigint", min_value=0, max_value=10),
            "cat": dv.ColumnRule(dtype="string", allowed_values={"a", "b"}),
        }
    )


@pytest.fixture()
def df(spark):
    rows = [
        (1, 5, "a"),      # clean
        (2, -1, "a"),     # range low
        (3, 99, "zzz"),   # range high + category
        (4, None, "b"),   # NULL x: not a range violation (3VL)
        (5, 3, None),     # NULL cat: not a category violation
    ]
    return spark.createDataFrame(rows, "id bigint, x bigint, cat string")


def test_tag_rows_tags_and_validity(df, contract):
    out = {
        r["id"]: (sorted(r["violations"]), r["is_valid"])
        for r in dv.tag_rows(df, contract).collect()
    }
    assert out[1] == ([], True)
    assert out[2] == (["range:x"], False)
    assert out[3] == (["category:cat", "range:x"], False)
    assert out[4] == ([], True)
    assert out[5] == ([], True)


def test_tag_rows_conditional_rules(df, contract):
    rules = [ConditionalRule(when="x > 0", then="cat = 'a'", name="pos_is_a")]
    out = {
        r["id"]: r["violations"]
        for r in dv.tag_rows(df, contract, rules=rules).collect()
    }
    # id=1: x=5>0, cat='a' -> ok.  id=5: x=3>0, cat NULL -> NULL-THEN tags.
    assert out[1] == []
    assert out[5] == ["conditional:pos_is_a"]
    # id=3 stacks contract + conditional tags, sorted
    assert out[3] == ["category:cat", "conditional:pos_is_a", "range:x"]


def test_tag_rows_rejects_column_collision(df, contract):
    with pytest.raises(ValueError, match="already exists"):
        dv.tag_rows(df.withColumn("violations", F.lit(1)), contract)


def test_quarantine_split_schemas_and_rows(df, contract):
    valid, quar = dv.quarantine_split(df, contract)
    assert valid.columns == df.columns              # exactly input schema
    assert quar.columns == df.columns + ["violations"]
    assert sorted(r["id"] for r in valid.collect()) == [1, 4, 5]
    assert sorted(r["id"] for r in quar.collect()) == [2, 3]


def test_write_quarantine_one_job_routing(df, contract, tmp_path, spark):
    path = str(tmp_path / "routed")
    manifest = dv.write_quarantine(df, contract, path)
    assert manifest["n_rows"] == 5
    assert manifest["n_valid"] == 3
    assert manifest["n_quarantined"] == 2
    ok = spark.read.parquet(manifest["valid_path"])
    bad = spark.read.parquet(manifest["quarantine_path"])
    assert ok.count() == 3 and bad.count() == 2
    reasons = {r["id"]: sorted(r["violations"]) for r in bad.collect()}
    assert reasons == {2: ["range:x"], 3: ["category:cat", "range:x"]}


def test_write_quarantine_user_partitioning(df, contract, tmp_path, spark):
    path = str(tmp_path / "routed_by_cat")
    # fillna turns id=5's NULL cat into '?', which violates the category
    # rule -> only ids 1 and 4 stay valid
    m = dv.write_quarantine(
        df.fillna({"cat": "?"}), contract, path, partition_cols=["cat"]
    )
    assert (m["n_valid"], m["n_quarantined"]) == (2, 3)
    ok = spark.read.parquet(f"{path}/is_valid=true")
    assert "cat" in ok.columns and ok.count() == 2


def test_empty_contract_everything_valid(df):
    valid, quar = dv.quarantine_split(df, dv.Contract(columns={}))
    assert valid.count() == 5 and quar.count() == 0


def test_tagging_is_single_stage(df, contract):
    """The tagged plan must be a pure projection: no exchange, no UDF."""
    plan = (
        dv.tag_rows(df, contract)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repair_rows_clamp_and_null(df, contract):
    out = {r["id"]: r for r in dv.repair_rows(df, contract).collect()}
    # id=2: x=-1 clamped up to 0
    assert out[2]["x"] == 0 and out[2]["repaired"] == ["range:x"]
    # id=3: x=99 clamped down to 10, cat 'zzz' nulled — both tagged
    assert out[3]["x"] == 10 and out[3]["cat"] is None
    assert out[3]["repaired"] == ["category:cat", "range:x"]
    # NULLs are never repaired (3VL)
    assert out[4]["x"] is None and out[4]["repaired"] == []
    assert out[5]["cat"] is None and out[5]["repaired"] == []
    # clean row untouched
    assert out[1]["x"] == 5 and out[1]["cat"] == "a" and out[1]["repaired"] == []


def test_repair_rows_null_strategy(df, contract):
    out = {
        r["id"]: r
        for r in dv.repair_rows(df, contract, range_strategy="null").collect()
    }
    assert out[2]["x"] is None and out[3]["x"] is None
    assert out[2]["repaired"] == ["range:x"]


def test_repair_then_tag_is_valid(df, contract):
    """Output contract: repaired rows pass the same contract's
    range/category facets."""
    repaired = dv.repair_rows(df, contract, repaired_col=None)
    assert repaired.columns == df.columns
    tagged = dv.tag_rows(repaired, contract)
    assert tagged.filter("NOT is_valid").count() == 0


def test_repair_rows_rejects_unknown_strategy(df, contract):
    with pytest.raises(ValueError, match="range_strategy"):
        dv.repair_rows(df, contract, range_strategy="wat")


def test_repair_is_single_stage(df, contract):
    plan = (
        dv.repair_rows(df, contract)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

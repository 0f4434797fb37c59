"""Pattern (format-contract) facet — engine extension to ColumnRule."""

from __future__ import annotations

import pytest

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.types import (
    contract_from_json,
    contract_to_json,
)

CONTRACT = dv.Contract(
    columns={
        # max_missing_frac=1.0: the fixture plants a NULL to prove
        # pattern never fires on NULL; missingness must stay silent.
        "code": dv.ColumnRule(
            dtype="string", pattern="[0-9]{3}", max_missing_frac=1.0
        )
    }
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "123"),    # valid
            (2, "12"),     # too short
            (3, "x123y"),  # PARTIAL match must not pass (full-match)
            (4, None),     # NULL never violates pattern
            (5, "999"),    # valid
        ],
        "id int, code string",
    )


def test_validate_reports_pattern_issue(df):
    res = dv.validate_contract(df, CONTRACT, strict=False)
    kinds = {i.kind for i in res.issues}
    assert kinds == {"pattern"}
    issue = res.issues[0]
    assert issue.column == "code"
    assert issue.observed == 2  # rows 2 and 3
    assert issue.expected == "[0-9]{3}"


def test_clean_data_passes(spark):
    ok = spark.createDataFrame([(1, "123")], "id int, code string")
    assert dv.validate_contract(ok, CONTRACT, strict=False).ok


def test_violation_rows_full_match(df):
    rows = dv.violation_rows(df, CONTRACT, include_payload=False).collect()
    assert sorted(r["observed"] for r in rows) == ["12", "x123y"]
    assert all(r["kind"] == "pattern" for r in rows)


def test_tag_rows_includes_pattern(df):
    tagged = {r["id"]: r for r in dv.tag_rows(df, CONTRACT).collect()}
    assert tagged[3]["violations"] == ["pattern:code"]
    assert tagged[4]["is_valid"]  # NULL passes pattern


def test_repair_nulls_bad_patterns(df):
    out = {r["id"]: r for r in dv.repair_rows(df, CONTRACT).collect()}
    assert out[3]["code"] is None and out[3]["repaired"] == ["pattern:code"]
    assert out[1]["code"] == "123" and out[1]["repaired"] == []
    # post-repair the contract's row facets hold
    repaired = dv.repair_rows(df, CONTRACT, repaired_col=None)
    assert dv.tag_rows(repaired, CONTRACT).filter("NOT is_valid").count() == 0


def test_non_string_column_ignored(spark):
    c = dv.Contract(columns={"id": dv.ColumnRule(dtype="int", pattern="[0-9]+")})
    d = spark.createDataFrame([(7,)], "id int")
    assert dv.validate_contract(d, c, strict=False).ok


def test_json_round_trip():
    c2 = contract_from_json(contract_to_json(CONTRACT))
    assert c2.columns["code"].pattern == "[0-9]{3}"
    # old JSON without the field still loads
    old = contract_to_json(dv.Contract(columns={"x": dv.ColumnRule(dtype="string")}))
    assert contract_from_json(old).columns["x"].pattern is None


def test_alternation_binds_inside_anchors(spark):
    """'a|b' must mean full 'a' or full 'b', not 'a' OR anything
    ending in 'b' (the non-capturing-group wrap)."""
    c = dv.Contract(columns={"v": dv.ColumnRule(dtype="string", pattern="a|b")})
    d = spark.createDataFrame([("a",), ("b",), ("xb",)], "v string")
    rows = dv.violation_rows(d, c, include_payload=False).collect()
    assert [r["observed"] for r in rows] == ["xb"]

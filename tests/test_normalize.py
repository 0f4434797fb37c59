"""Unicode normalization pass + census."""

from __future__ import annotations

import unicodedata

from pyspark.sql import Row

from dsci_524_g26_data_validation_spark.operators import normalize


def test_normalize_text_full_pass(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="cafe\u0301 time"),  # NFC: e+combining -> é
            Row(doc_id=2, text="a  b\t\tc\nd"),  # whitespace runs
            Row(doc_id=3, text="x\x01y\x07z"),  # C0 controls
            Row(doc_id=4, text="  plain  "),  # trim
            Row(doc_id=5, text="untouched"),
            Row(doc_id=6, text=None),  # NULL passes through
        ]
    )
    got = {
        r["doc_id"]: r["text"]
        for r in normalize.normalize_text(df, text_col="text").collect()
    }
    assert got[1] == "café time"
    assert unicodedata.is_normalized("NFC", got[1])
    assert got[2] == "a b c d"
    assert got[3] == "xyz"
    assert got[4] == "plain"
    assert got[5] == "untouched"
    assert got[6] is None


def test_normalize_steps_togglable(spark):
    df = spark.createDataFrame([Row(text="a  b\x01 cafe\u0301")])
    only_ws = normalize.normalize_text(
        df, nfc=False, strip_controls=False, collapse_whitespace=True
    ).first()["text"]
    assert only_ws == "a b\x01 cafe\u0301"
    only_ctrl = normalize.normalize_text(
        df, nfc=False, strip_controls=True, collapse_whitespace=False
    ).first()["text"]
    assert only_ctrl == "a  b cafe\u0301"
    out_col = normalize.normalize_text(df, out_col="clean").first()
    assert out_col["text"] == "a  b\x01 cafe\u0301"  # original kept
    assert out_col["clean"] == "a b café"


def test_normalization_census(spark):
    df = spark.createDataFrame(
        [
            Row(source="s1", text="cafe\u0301"),  # nfc-changed (5 -> 4 chars)
            Row(source="s1", text="a  b"),  # ws-changed
            Row(source="s1", text="ok"),
            Row(source="s2", text="x\x01"),  # control
            Row(source="s2", text=None),
        ]
    )
    out = {
        r["source"]: r
        for r in normalize.normalization_census(
            df, text_col="text", group_col="source"
        ).collect()
    }
    s1 = out["s1"]
    assert s1["n_rows"] == 3
    assert s1["n_nfc_changed"] == 1
    assert s1["n_ws_changed"] == 1
    assert s1["n_with_controls"] == 0
    assert s1["n_changed"] == 2
    assert s1["chars_before"] == 5 + 4 + 2
    assert s1["chars_after"] == 4 + 3 + 2
    s2 = out["s2"]
    assert s2["n_rows"] == 2  # NULL row counted in n_rows only
    assert s2["n_with_controls"] == 1
    assert s2["n_changed"] == 1
    assert s2["chars_before"] == 2 and s2["chars_after"] == 1


def test_census_ungrouped_single_row(spark):
    df = spark.createDataFrame([Row(text="a"), Row(text="b  c")])
    rows = normalize.normalization_census(df, text_col="text").collect()
    assert len(rows) == 1
    assert rows[0]["n_rows"] == 2 and rows[0]["n_changed"] == 1

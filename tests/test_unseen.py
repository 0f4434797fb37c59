"""Data-level category novelty (drift.unseen_categories)."""

from __future__ import annotations

import pytest

import dsci_524_g26_data_validation_spark as dv


@pytest.fixture(scope="module")
def frames(spark):
    base = spark.createDataFrame(
        [("a",), ("b",), ("b",), (None,)], "cat string"
    )
    cur = spark.createDataFrame(
        [("a",), ("z",), ("z",), ("z",), ("y",), (None,)], "cat string"
    )
    return base, cur


def test_novel_values_with_share(frames):
    base, cur = frames
    rows = dv.unseen_categories(base, cur, "cat").collect()
    assert [(r["value"], r["n_rows"]) for r in rows] == [("z", 3), ("y", 1)]
    # shares over current NON-NULL rows (5)
    assert rows[0]["frac_of_current"] == 0.6
    assert rows[1]["frac_of_current"] == 0.2


def test_null_is_not_novel(frames):
    base, cur = frames
    vals = [r["value"] for r in dv.unseen_categories(base, cur, "cat").collect()]
    assert None not in vals


def test_no_novelty(frames):
    base, _ = frames
    assert dv.unseen_categories(base, base, "cat").count() == 0


def test_top_k_bounds_report(frames):
    base, cur = frames
    assert len(dv.unseen_categories(base, cur, "cat", k=1).collect()) == 1

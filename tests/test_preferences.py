"""Preference-pair validation (operators/preferences.py): every kind on
planted faults, NULL semantics, duplicate-prompt census, one-row gate,
row-local plan."""

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.preferences import (
    duplicate_prompt_census,
    preference_pair_report,
    preference_pair_violations,
)


@pytest.fixture()
def pairs(spark):
    rows = [
        (1, "p1", "good answer", "worse answer"),   # clean
        (2, "p2", "same", "same"),                  # identical responses
        (3, "p3", "  ", "fine"),                    # empty chosen
        (4, "p4", "fine", None),                    # empty rejected
        (5, None, "a", "b"),                        # empty prompt
        (6, "echo me", "echo me", "other"),         # chosen echoes prompt
        (7, "dup prompt", "x", "y"),                # duplicate prompt (7, 8)
        (8, "dup prompt", "x2", "y2"),
    ]
    return spark.createDataFrame(
        rows, "pair_id int, prompt string, chosen string, rejected string"
    )


def test_all_kinds_fire_exactly(spark, pairs):
    got = {
        (r.pair_id, r.kind)
        for r in preference_pair_violations(pairs, id_col="pair_id").collect()
    }
    assert got == {
        (2, "identical_responses"),
        (3, "empty_chosen"),
        (4, "empty_rejected"),
        (5, "empty_prompt"),
        (6, "chosen_echoes_prompt"),
    }


def test_both_null_responses_are_identical(spark):
    df = spark.createDataFrame(
        [(1, "p", None, None)],
        "pair_id int, prompt string, chosen string, rejected string",
    )
    kinds = {
        r.kind
        for r in preference_pair_violations(df, id_col="pair_id").collect()
    }
    assert "identical_responses" in kinds
    assert "empty_chosen" in kinds and "empty_rejected" in kinds


def test_duplicate_prompt_census(spark, pairs):
    rows = duplicate_prompt_census(pairs, id_col="pair_id").collect()
    assert len(rows) == 1
    assert rows[0].n_pairs == 2 and rows[0].min_id == 7
    with pytest.raises(ValueError, match="min_pairs"):
        duplicate_prompt_census(pairs, min_pairs=1)


def test_report_gate(spark, pairs):
    r = preference_pair_report(pairs).first()
    assert r.n_pairs == 8
    assert r.n_identical_responses == 1
    assert r.n_empty_chosen == 1 and r.n_empty_rejected == 1
    assert r.n_empty_prompt == 1
    assert r.n_chosen_echoes_prompt == 1 and r.n_rejected_echoes_prompt == 0
    assert r.n_bad_pairs == 5
    assert r.n_dup_prompts == 1 and r.n_pairs_with_dup_prompt == 2
    assert r.ok is False
    clean = spark.createDataFrame(
        [(1, "p1", "a", "b"), (2, "p2", "c", "d")],
        "pair_id int, prompt string, chosen string, rejected string",
    )
    assert preference_pair_report(clean).first().ok is True


def test_violations_row_local_plan(spark, pairs):
    out = preference_pair_violations(pairs, id_col="pair_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

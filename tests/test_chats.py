"""Conversation-structure validation (operators/chats.py): every
violation kind on planted faults, 3VL/NULL handling, single-window
plan."""

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.chats import (
    conversation_census,
    conversation_violations,
)


@pytest.fixture()
def turns(spark):
    rows = [
        # c1: clean system -> user -> assistant -> user
        ("c1", 1, "system", "be helpful"),
        ("c1", 2, "user", "hi"),
        ("c1", 3, "assistant", "hello"),
        ("c1", 4, "user", "thanks"),
        # c2: opens with assistant (bad first), then user-user repeat,
        # then an empty assistant turn
        ("c2", 1, "assistant", "unprompted"),
        ("c2", 2, "user", "q1"),
        ("c2", 3, "user", "q2"),
        ("c2", 4, "assistant", "   "),
        # c3: unknown role mid-chat + a late system turn + NULL content
        ("c3", 1, "user", "q"),
        ("c3", 2, "tool", "{}"),
        ("c3", 3, "system", None),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, content string"
    )


def test_all_kinds_fire_exactly(spark, turns):
    got = {
        (r.conv_id, r.turn, r.kind)
        for r in conversation_violations(turns).collect()
    }
    assert got == {
        ("c2", 1, "bad_first_role"),
        ("c2", 3, "role_repeat"),
        ("c2", 4, "empty_content"),
        ("c3", 2, "unknown_role"),
        ("c3", 3, "system_not_first"),
        ("c3", 3, "empty_content"),
    }


def test_census_verdicts(spark, turns):
    rows = {r.conv_id: r for r in conversation_census(turns).collect()}
    assert rows["c1"].ok is True and rows["c1"].n_violations == 0
    assert rows["c1"].n_turns == 4
    c2 = rows["c2"]
    assert (c2.n_bad_first_role, c2.n_role_repeat, c2.n_empty_content) == (1, 1, 1)
    assert c2.ok is False and c2.n_violations == 3
    c3 = rows["c3"]
    assert (c3.n_unknown_role, c3.n_system_not_first, c3.n_empty_content) == (1, 1, 1)


def test_null_role_fires_unknown_not_repeat(spark):
    df = spark.createDataFrame(
        [("c", 1, None, "x"), ("c", 2, "user", "y"), ("c", 3, None, "z"),
         ("c", 4, None, "w")],
        "conv_id string, turn_idx int, role string, content string",
    )
    got = {(r.turn, r.kind) for r in conversation_violations(df).collect()}
    # NULL roles are unknown; consecutive NULL roles DO repeat (eqNullSafe)
    assert (1, "unknown_role") in got and (3, "unknown_role") in got
    assert (4, "role_repeat") in got
    assert (2, "role_repeat") not in got  # user after NULL is not a repeat
    # a NULL first role is unknown but not double-counted as bad_first
    assert (1, "bad_first_role") not in got


def test_custom_roles(spark):
    df = spark.createDataFrame(
        [("c", 1, "prompter", "q"), ("c", 2, "critic", "a")],
        "conv_id string, turn_idx int, role string, content string",
    )
    out = conversation_violations(
        df, roles=("prompter", "critic"), opening_roles=("prompter",)
    )
    assert out.count() == 0


def test_order_cols_required(spark, turns):
    with pytest.raises(ValueError, match="order_cols"):
        conversation_violations(turns, order_cols=())


def test_single_window_single_exchange(spark, sf_dir):
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.col("user_id").alias("conv_id"),
            "ts",
            "event_id",
            F.col("event_type").alias("role"),
            F.col("props").alias("content"),
        )
    )
    out = conversation_violations(
        e, order_cols=("ts", "event_id"), roles=("view", "click")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1

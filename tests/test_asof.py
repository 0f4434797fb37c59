"""As-of join: semantics vs pandas merge_asof, tie/NULL/strict
contracts merge_asof can't express, and the one-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import numpy as np
import pytest

from dsci_524_g26_data_validation_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.RandomState(11)
    n_l, n_r = 300, 120
    lp = pd.DataFrame(
        {
            "k": rng.randint(0, 6, n_l),
            "lts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n_l), unit="s"),
            "lid": np.arange(n_l),
        }
    )
    rp = pd.DataFrame(
        {
            "k": rng.randint(0, 6, n_r),
            "rts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n_r), unit="s"),
            "rid": np.arange(n_r),
            "val": rng.rand(n_r).round(3),
        }
    )
    return lp, rp, spark.createDataFrame(lp), spark.createDataFrame(rp)


def _match_col(out: pd.DataFrame, exp: pd.DataFrame, col: str) -> None:
    out = out.sort_values("lid").reset_index(drop=True)
    exp = exp.sort_values("lid").reset_index(drop=True)
    assert len(out) == len(exp)
    for i in range(len(out)):
        a, b = out.loc[i, col], exp.loc[i, col]
        assert (pd.isna(a) and pd.isna(b)) or a == b, (i, a, b)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_merge_asof(frames, direction):
    lp, rp, l, r = frames
    out = asof_join(
        l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
        right_cols=["rid", "val"], direction=direction,
    ).toPandas()
    exp = pd.merge_asof(
        lp.sort_values("lts"), rp.sort_values("rts"),
        left_on="lts", right_on="rts", by="k", direction=direction,
    )
    _match_col(out, exp, "rid")
    _match_col(out, exp, "val")


def test_tolerance_matches_merge_asof(frames):
    lp, rp, l, r = frames
    out = asof_join(
        l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
        right_cols=["rid"], tolerance_seconds=7200,
    ).toPandas()
    exp = pd.merge_asof(
        lp.sort_values("lts"), rp.sort_values("rts"),
        left_on="lts", right_on="rts", by="k",
        tolerance=pd.Timedelta("7200s"),
    )
    _match_col(out, exp, "rid")
    got = out[out["rid"].notna()]
    assert (got["asof_gap_us"] <= 7200 * 1_000_000).all()
    assert (got["asof_gap_us"] >= 0).all()


def test_ties_and_strict(spark):
    t0 = _ts("2024-01-01T00:00:00")
    l = spark.createDataFrame([(1, t0, 100)], "k int, lts timestamp, lid int")
    r = spark.createDataFrame(
        [(1, t0, 7, "a"), (1, t0, 9, "b"), (1, _ts("2023-12-31T00:00:00"), 3, "c")],
        "k int, rts timestamp, rid int, tag string",
    )
    # Inclusive backward: equal-ts rows eligible, greatest tiebreak wins.
    row = asof_join(
        l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
        right_cols=["rid", "tag"],
    ).collect()[0]
    assert (row.rid, row.tag, row.asof_gap_us) == (9, "b", 0)
    # Strict backward: equal-ts rows excluded -> the earlier row.
    row = asof_join(
        l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
        right_cols=["rid"], strict=True,
    ).collect()[0]
    assert (row.rid, row.asof_gap_us) == (3, 86_400 * 1_000_000)
    # Inclusive forward at equal ts: least tiebreak wins.
    row = asof_join(
        l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
        right_cols=["rid"], direction="forward",
    ).collect()[0]
    assert (row.rid, row.asof_gap_us) == (7, 0)
    # Strict forward: nothing at-or-after remains.
    row = asof_join(
        l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
        right_cols=["rid"], direction="forward", strict=True,
    ).collect()[0]
    assert row.rid is None and row.asof_gap_us is None


def test_null_left_rows_survive_unmatched(spark):
    t0 = _ts("2024-01-02T00:00:00")
    l = spark.createDataFrame(
        [(None, t0, 1), (1, None, 2), (1, t0, 3)],
        "k int, lts timestamp, lid int",
    )
    r = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 5), (None, _ts("2024-01-01T00:00:00"), 6),
         (1, None, 7)],
        "k int, rts timestamp, rid int",
    )
    out = {row.lid: row.rid for row in asof_join(
        l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
        right_cols=["rid"],
    ).collect()}
    # All 3 left rows survive; only the fully-keyed one matches, and
    # NULL-keyed / NULL-ts right rows are never candidates.
    assert out == {1: None, 2: None, 3: 5}


def test_collision_and_bad_args(spark):
    t0 = _ts("2024-01-01T00:00:00")
    l = spark.createDataFrame([(1, t0, 1)], "k int, lts timestamp, rid int")
    r = spark.createDataFrame([(1, t0, 2)], "k int, rts timestamp, rid int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid")
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
                  right_cols=["rts"], direction="nearest")
    with pytest.raises(ValueError, match="not in right schema"):
        asof_join(l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
                  right_cols=["nope"])


def test_plan_one_exchange_no_join(frames):
    _, _, l, r = frames
    out = asof_join(
        l, r, on="k", left_ts="lts", right_ts="rts", tiebreak="rid",
        right_cols=["rid"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The whole as-of resolution is one hash exchange + one sort +
    # one window — no join operator, no cross product, no UDF.
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
               "BroadcastNestedLoopJoin", "ArrowEvalPython", "BatchEvalPython"):
        assert op not in plan, op

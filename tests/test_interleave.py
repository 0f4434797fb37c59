"""Shard interleaving / mixing census (operators/interleave.py).

Hand-computable fixtures pin run-length segmentation (incl. NULL-source
runs and single-row shards), entropy, and the closed-form absent-source
JS contribution.
"""

from __future__ import annotations

import math

import pytest

from dsci_524_g26_data_validation_spark import interleaving_census


def _census_map(df):
    return {r["shard"]: r.asDict() for r in df.collect()}


def test_runs_and_entropy(spark):
    # shard 0: a a b b a  -> runs [2,2,1]; shard 1: c c c -> one run
    rows = [
        (0, 0, "a"), (0, 1, "a"), (0, 2, "b"), (0, 3, "b"), (0, 4, "a"),
        (1, 0, "c"), (1, 1, "c"), (1, 2, "c"),
    ]
    df = spark.createDataFrame(rows, "shard int, pos int, source string")
    out = _census_map(
        interleaving_census(df, shard_col="shard", order_col="pos",
                            source_col="source")
    )
    s0 = out[0]
    assert s0["n_rows"] == 5 and s0["n_sources"] == 2
    assert s0["n_runs"] == 3 and s0["max_run"] == 2
    assert s0["mean_run"] == pytest.approx(5 / 3, abs=1e-6)
    # entropy of (3/5, 2/5)
    h = -(0.6 * math.log2(0.6) + 0.4 * math.log2(0.4))
    assert s0["entropy"] == pytest.approx(h, abs=1e-6)
    s1 = out[1]
    assert s1["n_runs"] == 1 and s1["max_run"] == 3
    assert s1["entropy"] == 0.0


def test_js_vs_global(spark):
    # global mix: a:4, b:4 -> q = (.5, .5)
    # shard 0 is all-a (p=(1,0)): JS = H(m) - (H(p)+H(q))/2 with
    # m=(.75,.25): H(m)=0.811278, H(p)=0, H(q)=1 -> js = 0.311278
    rows = (
        [(0, i, "a") for i in range(4)]
        + [(1, i, "a") for i in range(0)]
        + [(1, i, "b") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "shard int, pos int, source string")
    out = _census_map(
        interleaving_census(df, shard_col="shard", order_col="pos",
                            source_col="source")
    )
    hm = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    expected = hm - 0.5  # (H(p)=0, H(q)=1)/2
    assert out[0]["js_vs_global"] == pytest.approx(expected, abs=1e-6)
    assert out[1]["js_vs_global"] == pytest.approx(expected, abs=1e-6)


def test_perfectly_mixed_shard_zero_js(spark):
    rows = [(s, i, ["a", "b"][i % 2]) for s in (0, 1) for i in range(6)]
    df = spark.createDataFrame(rows, "shard int, pos int, source string")
    out = _census_map(
        interleaving_census(df, shard_col="shard", order_col="pos",
                            source_col="source")
    )
    for s in (0, 1):
        assert out[s]["js_vs_global"] == pytest.approx(0.0, abs=1e-6)
        assert out[s]["n_runs"] == 6 and out[s]["max_run"] == 1


def test_null_source_is_its_own_run_group(spark):
    rows = [(0, 0, "a"), (0, 1, None), (0, 2, None), (0, 3, "a")]
    df = spark.createDataFrame(rows, "shard int, pos int, source string")
    out = _census_map(
        interleaving_census(df, shard_col="shard", order_col="pos",
                            source_col="source")
    )
    s0 = out[0]
    # runs: [a], [NULL, NULL], [a] -> 3 runs, max 2; sources {a, NULL}
    assert s0["n_runs"] == 3 and s0["max_run"] == 2
    assert s0["n_sources"] == 2
    assert s0["js_vs_global"] == pytest.approx(0.0, abs=1e-6)


def test_single_row_shard(spark):
    df = spark.createDataFrame(
        [(0, 0, "a"), (1, 0, "a")], "shard int, pos int, source string"
    )
    out = _census_map(
        interleaving_census(df, shard_col="shard", order_col="pos",
                            source_col="source")
    )
    assert out[0]["n_rows"] == 1 and out[0]["n_runs"] == 1
    assert out[0]["mean_run"] == 1.0 and out[0]["entropy"] == 0.0

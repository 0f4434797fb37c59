"""Stratified deterministic mixing + declared-priors distribution check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.drift import (
    expected_distribution_check,
)
import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators.sampling import (
    mixture_report,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(3000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "books")
        .otherwise("code")
        .alias("source"),
    )


def test_stratified_fractions_and_determinism(corpus):
    fr = {"web": 0.1, "books": 1.0, "code": 0.5}
    s1 = stratified_hash_sample(
        corpus, fr, strata_col="source", id_col="id"
    )
    s2 = stratified_hash_sample(
        corpus, fr, strata_col="source", id_col="id"
    )
    a = sorted(r["id"] for r in s1.collect())
    b = sorted(r["id"] for r in s2.collect())
    assert a == b  # deterministic: same rows every run
    by = {
        r["stratum"]: r["n_after"] / r["n_before"]
        for r in mixture_report(corpus, s1, strata_col="source").collect()
    }
    assert by["books"] == 1.0  # fraction 1.0 keeps everything
    assert 0.05 < by["web"] < 0.16
    assert 0.42 < by["code"] < 0.58


def test_unlisted_stratum_dropped_and_reported(corpus):
    s = stratified_hash_sample(
        corpus, {"web": 1.0}, strata_col="source", id_col="id"
    )
    rep = {
        r["stratum"]: r
        for r in mixture_report(corpus, s, strata_col="source").collect()
    }
    assert rep["books"]["n_after"] == 0  # zero-sampled strata still appear
    assert rep["web"]["share_of_mix"] == 1.0


def test_null_stratum_key(spark):
    df = spark.range(100).select(
        "id", F.when(F.col("id") % 2 == 0, "a").alias("s")
    )
    none_kept = stratified_hash_sample(
        df, {"a": 1.0}, strata_col="s", id_col="id"
    )
    assert none_kept.filter("s IS NULL").count() == 0
    with_null = stratified_hash_sample(
        df, {"a": 1.0, None: 1.0}, strata_col="s", id_col="id"
    )
    assert with_null.filter("s IS NULL").count() == 50


def test_salt_changes_membership(corpus):
    fr = {"web": 0.5}
    a = {r["id"] for r in stratified_hash_sample(
        corpus, fr, strata_col="source", id_col="id", salt="x").collect()}
    b = {r["id"] for r in stratified_hash_sample(
        corpus, fr, strata_col="source", id_col="id", salt="y").collect()}
    assert a != b


def test_rejects_bad_fraction(corpus):
    with pytest.raises(ValueError):
        stratified_hash_sample(
            corpus, {"web": 1.5}, strata_col="source", id_col="id"
        )


# -- expected_distribution_check ----------------------------------------------


def test_priors_check_flags_imbalance(spark):
    # planted 80/20 against a declared 50/50
    df = spark.createDataFrame(
        [("pos",)] * 80 + [("neg",)] * 20 + [(None,)] * 5, "label string"
    )
    out = {
        r["value"]: r
        for r in expected_distribution_check(
            df, "label", {"pos": 0.5, "neg": 0.5}
        ).collect()
    }
    assert out["pos"]["n"] == 80 and out["pos"]["expected_frac"] == 0.5
    # E = 50 each; chi2 term = 30^2/50 = 18
    assert out["pos"]["chi2_term"] == 18.0
    assert out["neg"]["chi2_term"] == 18.0
    assert out["__other__"]["n"] == 0
    assert not out["pos"]["low_expected"]


def test_priors_check_other_bucket_and_absent_value(spark):
    df = spark.createDataFrame(
        [("a",)] * 10 + [("junk",)] * 2 + [("junk2",)] * 1, "v string"
    )
    out = {
        r["value"]: r
        for r in expected_distribution_check(
            df, "v", {"a": 0.9, "b": 0.1}
        ).collect()
    }
    assert out["__other__"]["n"] == 3  # undeclared mass aggregated
    assert out["__other__"]["chi2_term"] is None
    assert out["b"]["n"] == 0  # declared but absent still appears
    assert out["b"]["low_expected"]  # E = 1.3 < 5


def test_priors_must_sum_to_one(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        expected_distribution_check(df, "v", {"a": 0.5})


# -- mixture planning (token-budget epochs calculator) -------------------------


def test_mixture_plan_arithmetic(spark):
    df = spark.createDataFrame(
        [
            ("web", "a b c d"),      # 4 tokens
            ("web", "e f"),          # +2 -> 6
            ("code", "x y"),         # 2
            ("books", "z"),          # 1, unlisted -> weight 0
        ],
        "source string, text string",
    )
    rows = {
        r.stratum: r
        for r in dv.mixture_plan(
            df, {"web": 0.5, "code": 0.5}, token_budget=12, max_epochs=4.0
        ).collect()
    }
    web = rows["web"]
    assert (web.available_tokens, web.weight, web.target_tokens) == (6, 0.5, 6.0)
    assert web.epochs == 1.0 and web.over_epoch_cap is False
    code = rows["code"]
    # 6 target tokens / 2 available -> 3 epochs, under the 4.0 cap
    assert code.epochs == 3.0 and code.over_epoch_cap is False
    # the unlisted stratum is reported, not dropped
    books = rows["books"]
    assert books.weight == 0.0 and books.target_tokens == 0.0
    assert books.over_epoch_cap is False
    # tighten the cap: code now over-subscribes
    rows2 = {
        r.stratum: r
        for r in dv.mixture_plan(
            df, {"web": 0.5, "code": 0.5}, token_budget=12, max_epochs=2.0
        ).collect()
    }
    assert rows2["code"].over_epoch_cap is True


def test_mixture_plan_supply_less_stratum_flags(spark):
    df = spark.createDataFrame(
        [("web", "a b"), ("empty", None)], "source string, text string"
    )
    rows = {
        r.stratum: r
        for r in dv.mixture_plan(
            df, {"web": 0.5, "empty": 0.5}, token_budget=10
        ).collect()
    }
    e = rows["empty"]
    # demanded but supply-less: NULL epochs, flagged
    assert e.available_tokens == 0 and e.epochs is None
    assert e.over_epoch_cap is True


def test_mixture_plan_validation(spark):
    df = spark.createDataFrame([("web", "a")], "source string, text string")
    with pytest.raises(ValueError, match="token_budget"):
        dv.mixture_plan(df, {"web": 1.0}, token_budget=0)
    with pytest.raises(ValueError, match="sum to 1"):
        dv.mixture_plan(df, {"web": 0.5}, token_budget=10)
    with pytest.raises(ValueError, match=">= 0"):
        dv.mixture_plan(df, {"web": 2.0, "code": -1.0}, token_budget=10)

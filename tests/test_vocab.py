"""Zipf/vocabulary census (operators/vocab.py): closed-form OLS check
against numpy, diversity ratios, degenerate-group NULLs, plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.vocab import zipf_census


def test_counts_and_diversity(spark):
    # "a a a b b c" -> vocab 3, tokens 6, hapax 1/3, ttr 0.5
    df = spark.createDataFrame([("g", "a a a b b c")], "source string, text string")
    r = zipf_census(df).first()
    assert (r.n_tokens, r.vocab_size) == (6, 3)
    assert r.hapax_frac == round(1 / 3, 6)
    assert r.type_token_ratio == 0.5
    # Chao1 bias-corrected: D + f1(f1-1)/(2(f2+1)) with f1=1 (c), f2=1 (b)
    assert r.chao1_vocab == 3.0


def test_chao1_unseen_vocab_estimate(spark):
    # 3 hapaxes, 0 doubletons: chao1 = 4 + 3*2/(2*1) = 7 — the slice is
    # far from vocabulary saturation and the estimator says so
    df = spark.createDataFrame(
        [("g", "x x x x c d e")], "source string, text string"
    )
    r = zipf_census(df).first()
    assert r.vocab_size == 4
    assert r.chao1_vocab == 7.0


def test_ols_matches_numpy(spark):
    # counts 8,4,2,1 at ranks 1..4 — a perfect power law except rounding
    text = " ".join(["w1"] * 8 + ["w2"] * 4 + ["w3"] * 2 + ["w4"])
    df = spark.createDataFrame([("g", text)], "source string, text string")
    r = zipf_census(df).first()
    x = np.log(np.arange(1, 5, dtype=float))
    y = np.log(np.array([8.0, 4.0, 2.0, 1.0]))
    slope, intercept = np.polyfit(x, y, 1)
    corr = np.corrcoef(x, y)[0, 1]
    assert r.zipf_slope == pytest.approx(slope, abs=1e-6)
    assert r.zipf_r2 == pytest.approx(corr * corr, abs=1e-6)


def test_fit_top_n_restricts_head(spark):
    text = " ".join(["w1"] * 8 + ["w2"] * 4 + ["w3"] * 2 + ["w4"])
    df = spark.createDataFrame([("g", text)], "source string, text string")
    r = zipf_census(df, fit_top_n=2).first()
    x = np.log(np.array([1.0, 2.0]))
    y = np.log(np.array([8.0, 4.0]))
    slope, _ = np.polyfit(x, y, 1)
    assert r.zipf_slope == pytest.approx(slope, abs=1e-6)
    # diversity stats still cover the whole vocab
    assert r.vocab_size == 4


def test_degenerate_groups_null_fit(spark):
    df = spark.createDataFrame(
        [("one_tok", "only"), ("uniform", "x y"), ("empty", None)],
        "source string, text string",
    )
    rows = {r.group: r for r in zipf_census(df).collect()}
    # single token: m=1 -> no fit
    assert rows["one_tok"].zipf_slope is None
    # two tokens with equal counts: vary=0 -> slope 0? cov=0, varx>0 ->
    # slope defined (0.0) but r2 NULL (vary=0)
    assert rows["uniform"].zipf_slope == 0.0
    assert rows["uniform"].zipf_r2 is None
    # NULL text contributes no tokens -> group absent entirely
    assert "empty" not in rows


def test_validation(spark):
    df = spark.createDataFrame([("g", "a b")], "source string, text string")
    with pytest.raises(ValueError, match="fit_top_n"):
        zipf_census(df, fit_top_n=1)


def test_single_scan_plan(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = zipf_census(d)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_ngram_diversity_hand_computed(spark):
    from dsci_524_g26_data_validation_spark.operators.vocab import (
        ngram_diversity_census,
    )

    rows = [
        (1, "a b a b", "X"),   # bigrams: "a b","b a","a b" -> 3 total, 2 distinct
        (2, "a b a b", "X"),   # identical doc: corpus distinct stays 2
        (3, "c d", "Y"),       # 1 bigram
        (4, "", "Y"),          # no bigrams: excluded from avg, counted in n_docs
        (5, None, "Y"),        # NULL text: same as empty
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {r.group: r for r in ngram_diversity_census(df, n=2).collect()}
    x = got["X"]
    assert (x.n_docs, x.grams_total) == (2, 6)
    assert x.avg_doc_distinct_ratio == round(2 / 3, 6)
    assert x.corpus_distinct_grams == 2
    assert x.corpus_distinct_ratio == round(2 / 6, 6)
    y = got["Y"]
    assert (y.n_docs, y.grams_total) == (3, 1)
    assert y.avg_doc_distinct_ratio == 1.0
    assert (y.corpus_distinct_grams, y.corpus_distinct_ratio) == (1, 1.0)


def test_ngram_diversity_lowercase_and_unigrams(spark):
    from dsci_524_g26_data_validation_spark.operators.vocab import (
        ngram_diversity_census,
    )

    df = spark.createDataFrame(
        [(1, "A a B", "X")], "doc_id bigint, text string, source string"
    )
    r = ngram_diversity_census(df, n=1).first()
    # lowercased: tokens a,a,b -> 3 total, 2 distinct
    assert (r.grams_total, r.corpus_distinct_grams) == (3, 2)
    r2 = ngram_diversity_census(df, n=1, lowercase=False).first()
    assert r2.corpus_distinct_grams == 3

    import pytest as _pt

    with _pt.raises(ValueError, match=">= 1"):
        ngram_diversity_census(df, n=0)


def test_ngram_diversity_unigram_empty_text_zero_grams(spark):
    """Regression: split('', ' ') yields [''], which for n=1 minted a
    phantom '' gram per empty/NULL doc — inflating grams_total, pulling
    a 1.0 ratio into the average and '' into the corpus distinct set.
    Empty text = 0 grams at EVERY n (the tokenizer-census convention)."""
    from dsci_524_g26_data_validation_spark.operators.vocab import (
        ngram_diversity_census,
    )

    rows = [(1, "a b", "X"), (2, "", "X"), (3, None, "X")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    r = ngram_diversity_census(df, n=1).first()
    assert (r.n_docs, r.grams_total) == (3, 2)
    assert r.corpus_distinct_grams == 2           # no '' gram
    assert r.avg_doc_distinct_ratio == 1.0        # empty docs excluded

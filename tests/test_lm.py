"""N-gram LM quality scoring (operators/lm.py) — the CCNet-style
perplexity-proxy gate: closed-form value checks, short-doc semantics,
census grouping, and the broadcast-model plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators import lm


@pytest.fixture()
def baseline(spark):
    return spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)]
        + [(9, "the dog sat on the rug")],
        "doc_id bigint, text string",
    )


def test_train_counts_exact(spark, baseline):
    model = {
        (r.w1, r.w2): r.cnt for r in lm.train_bigram_lm(baseline).collect()
    }
    # unigrams (w2 NULL): 'the' appears 2x in 5 docs + 2x in 1 doc = 12
    assert model[("the", None)] == 12
    assert model[("sat", None)] == 6
    # bigrams: 'the cat' 5x, 'the dog' 1x, 'sat on' 6x
    assert model[("the", "cat")] == 5
    assert model[("the", "dog")] == 1
    assert model[("sat", "on")] == 6
    assert ("mat", "the") not in model  # bigrams never cross documents


def test_scores_closed_form(spark, baseline):
    """avg_nll of a fluent doc matches the hand-computed add-alpha value;
    a token-soup permutation of the same words scores strictly worse."""
    corpus = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")],
        "doc_id bigint, text string",
    )
    model = lm.train_bigram_lm(baseline)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in lm.lm_quality_scores(corpus, model).collect()
    }
    # hand-compute doc 1 under P(w2|w1) = (c_bi + .5) / (c_uni + .5 * V),
    # V = 7 unigram types
    c_uni = {"the": 12, "cat": 5, "sat": 6, "on": 6, "mat": 5, "dog": 1, "rug": 1}
    c_bi = {("the", "cat"): 5, ("cat", "sat"): 5, ("sat", "on"): 6,
            ("on", "the"): 6, ("the", "mat"): 5}
    V = 7.0
    toks = "the cat sat on the mat".split()
    nlls = [
        -math.log2((c_bi.get((a, b), 0) + 0.5) / (c_uni.get(a, 0) + 0.5 * V))
        for a, b in zip(toks, toks[1:])
    ]
    assert got[1] == (5, round(sum(nlls) / len(nlls), 6))
    assert got[2][0] == 5
    assert got[2][1] > got[1][1]  # token soup is more surprising


def test_short_and_unseen_docs(spark, baseline):
    corpus = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "zx qy")],
        "doc_id bigint, text string",
    )
    model = lm.train_bigram_lm(baseline)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in lm.lm_quality_scores(corpus, model).collect()
    }
    # <2 tokens: no bigram to score, but the doc still surfaces
    assert got[1] == (1 - 1, None)
    assert got[2] == (0, None)
    # fully unseen bigram over unseen unigram: uniform smoothing floor
    assert got[3] == (1, round(-math.log2(0.5 / (0.5 * 7)), 6))


def test_census_groups_and_plan(spark, baseline):
    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "clean"),
            (2, "the dog sat on the mat", "clean"),
            (3, "qq ww ee rr tt yy", "junk"),
            (4, "zz xx cc vv", "junk"),
        ],
        "doc_id bigint, text string, source string",
    )
    rows = {
        r.source: r
        for r in lm.lm_quality_census(corpus, baseline).collect()
    }
    assert rows["clean"].n_docs == 2 and rows["junk"].n_docs == 2
    assert rows["junk"].avg_doc_nll > rows["clean"].avg_doc_nll
    assert rows["clean"].min_doc_nll <= rows["clean"].max_doc_nll

    # plan: with broadcast_model=True the corpus-side lookups are
    # broadcast hash joins — the corpus never sort-merge-shuffles
    scores = lm.lm_quality_scores(corpus, lm.train_bigram_lm(baseline))
    plan = scores._jdf.queryExecution().sparkPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2

"""Salient-term extraction (operators/terms.py): the rarity weighting
that separates distinctive terms from frequent ones, closed-form score
check, min_df floor, NULL/empty handling, single-scan plan."""

import math

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.terms import salient_terms


@pytest.fixture()
def corpus(spark):
    rows = [
        # 'the' is everywhere (stopword); 'quantum' only in sci;
        # 'recipe' only in food; 'rare' is a corpus-wide hapax
        ("sci", "the quantum state"),
        ("sci", "the quantum field rare"),
        ("sci", "the lab"),
        ("food", "the recipe book"),
        ("food", "the recipe"),
        ("food", None),  # counts as a doc, contributes no terms
    ]
    return spark.createDataFrame(rows, "source string, text string")


def test_distinctive_beats_frequent(spark, corpus):
    out = salient_terms(corpus, top_k=1, min_df=1).collect()
    best = {r.group: r.term for r in out}
    # 'the' has df_total 5 of 6 docs -> idf ~ 1.03; quantum/recipe are
    # group-exclusive -> idf ~ 1.7 and win despite lower raw frequency
    assert best == {"sci": "quantum", "food": "recipe"}


def test_score_closed_form(spark, corpus):
    rows = salient_terms(corpus, top_k=5, min_df=1).collect()
    got = {(r.group, r.term): r for r in rows}
    r = got[("sci", "quantum")]
    assert (r.df_group, r.n_docs_group, r.df_total) == (2, 3, 2)
    expect = 2 / 3 * (math.log(7 / 3) + 1.0)
    assert r.score == pytest.approx(expect, abs=1e-6)
    # NULL text counted in food's denominator
    assert got[("food", "recipe")].n_docs_group == 3


def test_min_df_drops_hapaxes(spark, corpus):
    terms = {r.term for r in salient_terms(corpus, top_k=10, min_df=2).collect()}
    assert "rare" not in terms
    terms1 = {r.term for r in salient_terms(corpus, top_k=10, min_df=1).collect()}
    assert "rare" in terms1


def test_rank_deterministic_and_capped(spark, corpus):
    out = salient_terms(corpus, top_k=2, min_df=1)
    rows = out.collect()
    assert all(r.rank <= 2 for r in rows)
    per_group = {}
    for r in rows:
        per_group.setdefault(r.group, []).append((r.rank, r.term, r.score))
    for g, rs in per_group.items():
        rs.sort()
        scores = [s for _, _, s in rs]
        assert scores == sorted(scores, reverse=True)


def test_validation_errors(spark, corpus):
    with pytest.raises(ValueError, match="top_k"):
        salient_terms(corpus, top_k=0)
    with pytest.raises(ValueError, match="min_df"):
        salient_terms(corpus, min_df=0)


def test_single_corpus_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = salient_terms(docs, top_k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus was scanned exactly once, at the localCheckpoint of the
    # tagged aggregate — the returned plan reads ONLY the checkpointed
    # (vocab x groups) frame, never the parquet again
    assert plan.count("FileScan parquet") == 0
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan

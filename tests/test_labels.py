"""Label-agreement census (operators/labels.py): confusion cells,
row-normalized shares, NULL-as-a-cell semantics, summary fold."""

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.labels import (
    label_agreement_census,
    label_agreement_kappa,
    label_agreement_summary,
)


@pytest.fixture()
def labeled(spark):
    rows = [
        ("en", "en"), ("en", "en"), ("en", "fr"),   # en: 2/3 agree
        ("fr", "fr"),                               # fr: clean
        (None, "en"),                               # untagged
        ("de", None),                               # classifier undecided
        (None, None),                               # both null: agreement
    ]
    return spark.createDataFrame(rows, "lang string, lang_pred string")


def test_census_cells_and_shares(spark, labeled):
    got = {
        (r.declared, r.predicted): (r.n, r.declared_frac)
        for r in label_agreement_census(
            labeled, declared_col="lang", predicted_col="lang_pred"
        ).collect()
    }
    assert got[("en", "en")] == (2, round(2 / 3, 6))
    assert got[("en", "fr")] == (1, round(1 / 3, 6))
    assert got[("fr", "fr")] == (1, 1.0)
    # NULLs are cells, not drops
    assert got[(None, "en")] == (1, 0.5)
    assert got[(None, None)] == (1, 0.5)
    assert got[("de", None)] == (1, 1.0)
    assert len(got) == 6


def test_summary_null_safe_agreement(spark, labeled):
    r = label_agreement_summary(
        labeled, declared_col="lang", predicted_col="lang_pred"
    ).first()
    # agrees: en-en x2, fr-fr, null-null (null-safe) = 4 of 7
    assert (r.n_rows, r.n_agree) == (7, 4)
    assert r.agreement_rate == round(4 / 7, 6)
    # NULL counts as a label VALUE (the census convention): en, fr, de,
    # NULL — plain count_distinct would skip the untagged slice
    assert r.n_declared_labels == 4
    assert r.n_offdiag_cells == 3


def test_single_scan_plan(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", F.lower(F.col("lang")).alias("lang_pred")
    )
    out = label_agreement_census(
        d, declared_col="lang", predicted_col="lang_pred"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_kappa_hand_computed(spark):
    rows = [("en", "en"), ("en", "en"), ("en", "fr"), ("fr", "fr"), ("fr", "en")]
    df = spark.createDataFrame(rows, "lang string, lang_pred string")
    r = label_agreement_kappa(
        df, declared_col="lang", predicted_col="lang_pred"
    ).first()
    # p_o = 3/5; marginals en:3 fr:2 both sides -> p_e = (9+4)/25
    assert r.n_rows == 5
    assert r.p_observed == 0.6
    assert r.p_expected == 0.52
    assert r.kappa == round((0.6 - 0.52) / 0.48, 6)
    assert (r.n_declared_labels, r.n_predicted_labels) == (2, 2)


def test_kappa_null_labels_null_safe(spark):
    rows = [(None, None), ("en", "en")]
    df = spark.createDataFrame(rows, "lang string, lang_pred string")
    r = label_agreement_kappa(
        df, declared_col="lang", predicted_col="lang_pred"
    ).first()
    # NULL-NULL agrees; marginals match null-safely: p_e = (1+1)/4
    assert (r.p_observed, r.p_expected, r.kappa) == (1.0, 0.5, 1.0)
    # the label-set size counts NULL as a value: {NULL, 'en'} = 2
    assert (r.n_declared_labels, r.n_predicted_labels) == (2, 2)


def test_kappa_degenerate_is_null_not_one(spark):
    df = spark.createDataFrame(
        [("en", "en")] * 4, "lang string, lang_pred string"
    )
    r = label_agreement_kappa(
        df, declared_col="lang", predicted_col="lang_pred"
    ).first()
    assert r.p_expected == 1.0
    assert r.kappa is None

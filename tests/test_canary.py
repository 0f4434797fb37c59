"""Canary-string leakage detection (operators/contamination.py):
exact per-doc evidence rows, zero-inclusive census, NULL text,
non-overlapping occurrence counting, parameter validation."""

import pytest

from dsci_524_g26_data_validation_spark.operators import contamination as ct


@pytest.fixture()
def docs(spark):
    rows = [
        ("d1", "the CANARY-alpha sits here and CANARY-alpha again"),
        ("d2", "no markers at all"),
        ("d3", "tail marker CANARY-beta"),
        ("d4", None),
        ("d5", "CANARY-alpha"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


CANARIES = ["CANARY-alpha", "CANARY-beta", "CANARY-gamma-absent"]


def test_rows_exact_evidence(spark, docs):
    got = {
        (r.doc_id, r.canary): r.n_occurrences
        for r in ct.canary_rows(docs, CANARIES).collect()
    }
    assert got == {
        ("d1", "CANARY-alpha"): 2,
        ("d3", "CANARY-beta"): 1,
        ("d5", "CANARY-alpha"): 1,
    }


def test_census_includes_zero_hit_canaries(spark, docs):
    got = {
        r.canary: (r.n_docs, r.n_occurrences)
        for r in ct.canary_census(docs, CANARIES).collect()
    }
    assert got == {
        "CANARY-alpha": (2, 3),
        "CANARY-beta": (1, 1),
        "CANARY-gamma-absent": (0, 0),
    }


def test_non_overlapping_occurrences(spark):
    df = spark.createDataFrame([("d1", "aaa")], "doc_id string, text string")
    r = ct.canary_rows(df, ["aa"]).first()
    assert r.n_occurrences == 1  # replace() removes non-overlapping matches


def test_case_sensitive(spark):
    df = spark.createDataFrame(
        [("d1", "canary-alpha lowercase")], "doc_id string, text string"
    )
    assert ct.canary_rows(df, ["CANARY-alpha"]).count() == 0


def test_parameter_validation(spark, docs):
    with pytest.raises(ValueError, match="non-empty"):
        ct.canary_census(docs, [])
    with pytest.raises(ValueError, match="non-empty"):
        ct.canary_rows(docs, ["ok", ""])
    with pytest.raises(ValueError, match="distinct"):
        ct.canary_census(docs, ["x", "x"])


def test_census_plan_broadcasts_small_side(spark, docs):
    # the zero-inclusive outer join must broadcast (hinting the
    # preserved side of an outer join is silently dropped by Spark)
    from dsci_524_g26_data_validation_spark.operators import contamination as ct

    df = ct.canary_census(docs, ["CANARY-ALPHA-42", "zzz"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("SortMergeJoin") == 0

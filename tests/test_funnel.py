"""Sequential filter funnel (operators/funnel.py): first-fail
attribution, zero-count stages, NULL-fails 3VL, grouped funnel,
survivors, single-scan plan."""

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.funnel import (
    apply_filters,
    filter_funnel,
)

FILTERS = [
    ("min_len", "length(text) >= 5"),
    ("no_digits", "text NOT RLIKE '[0-9]'"),
    ("lowercase", "text = lower(text)"),
]


@pytest.fixture()
def docs(spark):
    rows = [
        ("a", "ok document here"),   # survives all
        ("a", "x"),                  # dies at min_len
        ("a", "has 42 digits"),      # dies at no_digits
        ("b", "Has 42 AND Caps"),    # dies at no_digits (first fail!)
        ("b", "Capitalized text"),   # dies at lowercase
        ("b", None),                 # NULL: dies at min_len (3VL)
    ]
    return spark.createDataFrame(rows, "source string, text string")


def test_funnel_first_fail_attribution(spark, docs):
    rows = {r.filter: r for r in filter_funnel(docs, FILTERS).collect()}
    assert [rows[n].stage for n in ("min_len", "no_digits", "lowercase")] == [0, 1, 2]
    assert (rows["min_len"].n_in, rows["min_len"].n_killed) == (6, 2)
    # the doc with digits AND caps died at no_digits, not lowercase
    assert (rows["no_digits"].n_in, rows["no_digits"].n_killed) == (4, 2)
    assert (rows["lowercase"].n_in, rows["lowercase"].n_killed) == (2, 1)
    assert rows["lowercase"].n_out == 1
    assert rows["min_len"].kill_frac == round(2 / 6, 6)


def test_zero_count_stage_still_reported(spark, docs):
    filters = FILTERS + [("never_fires", "1 = 1")]
    rows = {r.filter: r for r in filter_funnel(docs, filters).collect()}
    nf = rows["never_fires"]
    assert (nf.n_in, nf.n_killed, nf.n_out) == (1, 0, 1)
    assert nf.kill_frac == 0.0


def test_grouped_funnel(spark, docs):
    rows = {
        (r.group, r.filter): r
        for r in filter_funnel(docs, FILTERS, group_col="source").collect()
    }
    assert rows[("a", "min_len")].n_killed == 1
    assert rows[("b", "min_len")].n_killed == 1      # the NULL text
    assert rows[("a", "lowercase")].n_out == 1
    assert rows[("b", "lowercase")].n_out == 0
    assert len(rows) == 6


def test_apply_filters_survivors_match_funnel(spark, docs):
    surv = apply_filters(docs, FILTERS)
    assert [r.text for r in surv.collect()] == ["ok document here"]
    last = [r for r in filter_funnel(docs, FILTERS).collect() if r.stage == 2]
    assert last[0].n_out == surv.count()


def test_validation_and_plan(spark, docs, sf_dir):
    with pytest.raises(ValueError, match="at least one"):
        filter_funnel(docs, [])
    with pytest.raises(ValueError, match="at least one"):
        apply_filters(docs, [])
    # the corpus is scanned exactly once, at the counts checkpoint —
    # the returned plan never reads the parquet again
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = filter_funnel(d, [("min_chars", "n_chars >= 200")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 0
    # empty input: stages still report with zeroed funnel
    empty = spark.createDataFrame([], "text string, n_chars int")
    rows = filter_funnel(empty, [("min_chars", "n_chars >= 200")]).collect()
    assert [(r.n_in, r.n_killed, r.n_out) for r in rows] == [(0, 0, 0)]

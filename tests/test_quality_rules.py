"""Gopher quality-rule filters + compression-ratio proxy.

Planted documents exercise each of the seven published rules (Rae et
al. 2021, A1.1) individually; the census is checked against hand
counts; the compression ratio is pinned by ordering invariants
(repetitive << natural < high-entropy) and NULL handling. Cross-engine
value parity for the census is covered by the driver oracle
(gopher_rules_documents in __spark_entry__.py).
"""

from __future__ import annotations

import pytest

from dsci_524_g26_data_validation_spark.operators import quality_rules as qr

def _passing_text() -> str:
    # 60 natural words incl. >=2 stopwords, mean word len in [3,10]
    return (
        "the results were clear to most of the readers and that group "
        "have agreed with the stated method after long review sessions "
        * 3
    ).strip()


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = qr.gopher_flags(df).collect()[0]
    return {n: row[n] for n in qr.GOPHER_RULE_NAMES} | {
        "gopher_pass": row["gopher_pass"]
    }


def test_passing_document(spark):
    f = _flags(spark, _passing_text())
    assert f["gopher_pass"] is True
    assert not any(f[n] for n in qr.GOPHER_RULE_NAMES)


def test_word_count_rule(spark):
    f = _flags(spark, "the be to of and that have with short")
    assert f["fail_word_count"] is True
    long = " ".join(["word"] * 100_001) + " the be"
    f2 = _flags(spark, long)
    assert f2["fail_word_count"] is True


def test_mean_word_length_rule(spark):
    # 60 one-char words -> mean 1.0 < 3
    f = _flags(spark, " ".join(["a"] * 60) + " the be to of")
    assert f["fail_mean_word_len"] is True
    # very long pseudo-words -> mean > 10
    f2 = _flags(
        spark, " ".join(["antidisestablishmentarian"] * 60) + " the be"
    )
    assert f2["fail_mean_word_len"] is True


def test_symbol_ratio_rule(spark):
    base = _passing_text()
    f = _flags(spark, base + " " + "#" * 30)
    assert f["fail_symbol_ratio"] is True
    f2 = _flags(spark, base + " x..." * 25)
    assert f2["fail_symbol_ratio"] is True
    assert _flags(spark, base)["fail_symbol_ratio"] is False


def test_bullet_and_ellipsis_line_rules(spark):
    words = _passing_text()
    bullets = "\n".join(f"- item {i} " + words[:40] for i in range(10))
    f = _flags(spark, bullets)
    assert f["fail_bullet_lines"] is True
    dots = "\n".join(f"line {i} trails off..." for i in range(10))
    f2 = _flags(spark, dots)
    assert f2["fail_ellipsis_lines"] is True
    # single-line passing text: both line rules pass
    f3 = _flags(spark, words)
    assert f3["fail_bullet_lines"] is False
    assert f3["fail_ellipsis_lines"] is False


def test_alpha_word_rule(spark):
    nums = " ".join(str(i) for i in range(60)) + " the be"
    f = _flags(spark, nums)
    assert f["fail_alpha_words"] is True


def test_stopword_rule(spark):
    # 60 words, zero Gopher stopwords
    f = _flags(spark, " ".join(["zebra"] * 60))
    assert f["fail_stopwords"] is True
    # exactly two distinct stopwords -> passes (threshold is >= 2)
    f2 = _flags(spark, " ".join(["zebra"] * 58) + " the with")
    assert f2["fail_stopwords"] is False


def test_null_text_flags_are_null(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = qr.gopher_flags(df).collect()[0]
    assert all(row[n] is None for n in qr.GOPHER_RULE_NAMES)
    assert row["gopher_pass"] is None


def test_census_counts(spark):
    rows = [
        (1, _passing_text(), "a"),          # pass
        (2, " ".join(["zebra"] * 60), "a"),  # stopword fail
        (3, None, "b"),                      # unscored
        (4, "", "b"),                        # unscored (empty)
        (5, _passing_text(), "b"),           # pass
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in qr.gopher_census(df).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_scored"], a["n_pass"]) == (2, 2, 1)
    assert a["n_fail_stopwords"] == 1
    assert a["pass_frac"] == 0.5
    assert (b["n_docs"], b["n_scored"], b["n_pass"]) == (3, 1, 1)
    assert b["pass_frac"] == 1.0


def test_census_threshold_overrides(spark):
    # loosen the word-count floor: a 10-word doc passes with min_words=5
    text = "the cat sat on the mat with all of them"
    df = spark.createDataFrame([(1, text, "a")], ["doc_id", "text", "source"])
    strict = qr.gopher_census(df).collect()[0]
    loose = qr.gopher_census(df, min_words=5).collect()[0]
    assert strict["n_fail_word_count"] == 1
    assert loose["n_fail_word_count"] == 0
    assert loose["n_pass"] == 1


def test_compression_ratio_ordering(spark):
    rows = [
        (1, "abc " * 500),  # repetitive
        (2, "the quick brown fox jumps over the lazy dog repeatedly today"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in qr.with_compression_ratio(df).collect()
    }
    assert got[3] is None and got[4] is None
    assert got[1] < 0.1  # boilerplate compresses hard
    assert got[1] < got[2]


def test_compression_census(spark):
    rows = [
        (1, "abc " * 500, "a"),
        (2, "the quick brown fox jumps over the lazy dog near here", "a"),
        (3, None, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = qr.compression_census(df, repetitive_threshold=0.3).collect()[0]
    assert (r["n_docs"], r["n_scored"]) == (3, 2)
    assert r["repetitive_frac"] == 0.5
    assert r["min_ratio"] < 0.1


def test_compression_ratio_deterministic(spark):
    df = spark.createDataFrame([(1, "determinism check " * 40)], ["doc_id", "text"])
    a = qr.with_compression_ratio(df).collect()[0]["compression_ratio"]
    b = qr.with_compression_ratio(df).collect()[0]["compression_ratio"]
    assert a == b


def test_dictionary_mode_matches_zlib_direction(spark):
    """mode='dictionary' (pure Catalyst, oracle-able): same NULL/empty
    semantics and the same repetitive-vs-diverse ordering as zlib."""
    rows = [
        (1, "nav nav nav nav nav nav nav nav", "a"),   # 1 type / 8 tokens
        (2, "the quick brown fox jumps over lazy dogs", "a"),  # all distinct
        (3, None, "a"),
        (4, "", "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in qr.with_compression_ratio(df, mode="dictionary").collect()
    }
    assert got[3] is None and got[4] is None
    assert got[1] == 1 / 8 and got[2] == 1.0
    assert got[1] < got[2]  # repetitive < diverse, same direction as zlib

    census = qr.compression_census(
        df, mode="dictionary", repetitive_threshold=0.5
    ).collect()[0]
    assert (census["n_docs"], census["n_scored"]) == (4, 2)
    assert census["repetitive_frac"] == 0.5
    assert census["min_ratio"] == 0.125

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode"):
        qr.with_compression_ratio(df, mode="lz4")
    with _pytest.raises(ValueError, match="mode"):
        qr.compression_census(df, mode="lz4")


def test_dictionary_mode_is_pure_catalyst(spark):
    """No Python in the dictionary-mode hot path: the plan contains no
    ArrowEvalPython / BatchEvalPython node (the zlib mode does)."""
    df = spark.createDataFrame([(1, "a b c", "s")], "id long, text string, source string")
    plan_dict = qr.with_compression_ratio(
        df, mode="dictionary"
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan_dict
    plan_zlib = qr.with_compression_ratio(
        df, mode="zlib"
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in plan_zlib

"""Detokenization round-trip (operators/detok.py) and truncation
clipping census (operators/structure.py)."""

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators.detok import (
    EXPR_VOCAB_CAP,
    detok_expr,
    detok_udf,
)

VOCAB = ["the", "cat", "sat", "on", "mat", ""]


@pytest.fixture()
def toks(spark):
    rows = [
        (1, "the cat sat", [0, 1, 2], "a"),          # clean
        (2, "the cat sat on the mat", [0, 1, 2, 3, 0, 4], "a"),  # clean
        (3, "the cat", [0, 2], "a"),                  # wrong id -> mismatch
        (4, "the cat", [0, 1, 99], "b"),              # OOV id -> mismatch
        (5, "the cat", [0, 1, -1], "b"),              # negative id -> mismatch
        (6, None, None, "b"),                         # both NULL -> pass
        (7, "the", None, "b"),                        # one-sided NULL -> fail
    ]
    return spark.createDataFrame(
        rows, "doc_id int, text string, tokens array<int>, source string"
    )


def test_roundtrip_violations_expr(spark, toks):
    bad = dv.roundtrip_violations(toks, VOCAB, mode="expr").orderBy("doc_id")
    rows = bad.collect()
    assert [r.doc_id for r in rows] == [3, 4, 5, 7]
    # OOV ids decode to the sentinel, visible in triage output
    by_id = {r.doc_id: r.detok for r in rows}
    assert by_id[4] == "the cat �"
    assert by_id[5] == "the cat �"
    assert by_id[7] is None


def test_roundtrip_modes_agree(spark, toks):
    a = dv.roundtrip_violations(toks, VOCAB, mode="expr").orderBy("doc_id")
    b = dv.roundtrip_violations(toks, VOCAB, mode="udf").orderBy("doc_id")
    assert [r.asDict() for r in a.collect()] == [r.asDict() for r in b.collect()]
    # auto picks expr below the cap, udf above
    assert len(VOCAB) <= EXPR_VOCAB_CAP
    big = VOCAB + [f"w{i}" for i in range(EXPR_VOCAB_CAP)]
    c = dv.roundtrip_violations(toks, big, mode="auto").orderBy("doc_id")
    assert [r.doc_id for r in c.collect()] == [3, 4, 5, 7]


def test_roundtrip_census(spark, toks):
    cen = {r.source: r for r in dv.roundtrip_census(toks, VOCAB).collect()}
    assert cen["a"].n_docs == 3 and cen["a"].n_fail == 1
    assert cen["b"].n_docs == 4 and cen["b"].n_fail == 3
    assert cen["b"].fail_frac == pytest.approx(0.75)
    # table-level row
    tot = dv.roundtrip_census(toks, VOCAB, group_col=None).first()
    assert tot.n_docs == 7 and tot.n_fail == 4


def test_detok_empty_and_errors(spark, toks):
    with pytest.raises(ValueError, match="at least one"):
        dv.roundtrip_census(toks, [])
    with pytest.raises(ValueError, match="non-None"):
        detok_expr("tokens", ["a", None])
    with pytest.raises(ValueError, match="mode"):
        dv.roundtrip_census(toks, VOCAB, mode="bogus")
    # empty token array decodes to empty string in both paths
    e = spark.createDataFrame([(1,)], "doc_id int").select(
        F.array().cast("array<int>").alias("tokens")
    )
    assert e.select(detok_expr("tokens", VOCAB).alias("d")).first().d == ""
    assert e.select(detok_udf(VOCAB)(F.col("tokens")).alias("d")).first().d == ""


# -- length clipping census ----------------------------------------------------


def test_clipping_census_detects_cap(spark):
    # natural geometric-ish tail 1..300 plus a planted clip at 256
    rows = [(i % 297 + 1,) for i in range(3000)] + [(256,)] * 400
    df = spark.createDataFrame(rows, "n_tok int")
    out = dv.length_clipping_census(df, "n_tok", min_ratio=3.0).collect()
    assert [r.length for r in out] == [256]
    r = out[0]
    assert r.at_cap and not r.at_max
    assert r.n_rows == 400 + sum(1 for i in range(3000) if i % 297 + 1 == 256)
    assert r.spike_ratio > 10


def test_clipping_census_at_max_and_gaps(spark):
    # spike exactly at the distribution max, with a gap below it
    rows = [(i,) for i in range(1, 100)] + [(150,)] * 50
    df = spark.createDataFrame(rows, "n int")
    out = dv.length_clipping_census(df, "n", min_count=5).collect()
    assert len(out) == 1 and out[0].length == 150 and out[0].at_max
    # the RANGE window saw only absent lengths below 150 -> neigh_mean 0
    assert out[0].neigh_mean == 0.0
    assert out[0].spike_ratio == pytest.approx(50 / (1 / 8))


def test_clipping_census_clean_and_edges(spark):
    clean = spark.createDataFrame([(i % 40 + 1,) for i in range(4000)], "n int")
    assert dv.length_clipping_census(clean, "n").count() == 0
    # full census mode returns every distinct length
    full = dv.length_clipping_census(clean, "n", flag_only=False)
    assert full.count() == 40
    assert abs(sum(r.share for r in full.collect()) - 1.0) < 1e-6
    with pytest.raises(ValueError, match="window"):
        dv.length_clipping_census(clean, "n", window=0)
    empty = spark.createDataFrame([], "n int")
    assert dv.length_clipping_census(empty, "n").count() == 0


def test_detok_udf_null_token_elements_hit_oov(spark):
    # a null ELEMENT inside the token array must decode to the OOV
    # sentinel on every platform (NaN->int64 is UB: INT64_MIN on x86
    # but 0 on aarch64, which would silently decode vocab[0])
    df = spark.createDataFrame(
        [(1, [0, None, 1])], "doc_id int, tokens array<int>"
    )
    got = df.select(
        detok_udf(VOCAB)(F.col("tokens")).alias("t")
    ).first()["t"]
    assert got.split(" ")[1] not in VOCAB  # the OOV sentinel, not vocab[0]
    assert got.split(" ")[0] == "the" and got.split(" ")[2] == "cat"

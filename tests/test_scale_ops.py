"""Tests for the round-3 pipeline/scale operators: PII detection and
redaction, sequence packing, gap sessionization, vocabulary-bounds
invariant, and the key-skew report.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv
from dsci_524_g26_data_validation_spark.operators import pii, skew


# -- PII ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [
            (1, "mail me at alice@example.org or bob.smith+x@corp.co.uk now"),
            (2, "server at 192.168.0.1 and 10.0.0.255 refused"),
            (3, "call +1 555-123-4567 or 555 987 6543"),
            (4, "ssn 123-45-6789 on file"),
            (5, "a perfectly clean sentence"),
        ],
        "doc_id int, text string",
    )


def test_detect_pii_counts(pii_df):
    m = {r["doc_id"]: r for r in dv.detect_pii(pii_df).collect()}
    assert m[1]["n_email"] == 2 and m[1]["pii_total"] == 2
    assert m[2]["n_ipv4"] == 2
    # "+1 555-123-4567": the 3-3-4 core matches; "555 987 6543" too
    assert m[3]["n_phone"] == 2
    assert m[4]["n_ssn"] == 1
    assert m[5]["pii_total"] == 0
    flagged = {r["doc_id"] for r in dv.pii_documents(pii_df).collect()}
    assert flagged == {1, 2, 3, 4}


def test_redact_pii_roundtrip(pii_df):
    red = dv.redact_pii(pii_df)
    # redacted corpus re-screens clean
    assert dv.pii_documents(red).count() == 0
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert "<EMAIL>" in texts[1] and "alice" not in texts[1].split("@")[0].split()[-1]
    assert texts[2].count("<IP>") == 2
    assert "<SSN>" in texts[4]
    assert texts[5] == "a perfectly clean sentence"
    # out_col keeps the original text
    red2 = dv.redact_pii(pii_df, out_col="clean")
    row = red2.filter("doc_id = 4").first()
    assert "123-45-6789" in row["text"] and "<SSN>" in row["clean"]


def test_pii_kinds_subset(pii_df):
    only_email = dv.detect_pii(pii_df, kinds={"email": pii.PII_PATTERNS["email"]})
    assert only_email.columns == ["doc_id", "n_email", "pii_total"]
    assert only_email.filter("doc_id = 2").first()["pii_total"] == 0


def test_pii_by_group(spark):
    df = spark.createDataFrame(
        [("a", "x@y.io here"), ("a", "clean"), ("b", "clean too")],
        "source string, text string",
    )
    rows = {r["source"]: r for r in dv.pii_by_group(df).collect()}
    assert rows["a"]["n_docs_with_pii"] == 1 and rows["a"]["total_email"] == 1
    assert rows["b"]["n_docs_with_pii"] == 0


# -- sequence packing --------------------------------------------------------


def test_pack_sequences_offsets(spark):
    df = spark.createDataFrame(
        [("s", 1, 100), ("s", 2, 100), ("s", 3, 100), ("s", 4, 50), ("t", 9, 300)],
        "source string, doc_id int, n_tok int",
    )
    m = {r["doc_id"]: r for r in dv.pack_sequences(df, budget=256).collect()}
    assert m[1]["start_offset"] == 0 and m[1]["chunk_id"] == 0
    assert not m[1]["spans_boundary"]
    # doc 2 occupies [100, 200) — inside chunk 0
    assert m[2]["chunk_id"] == 0 and not m[2]["spans_boundary"]
    # doc 3 occupies [200, 300) — starts in chunk 0, crosses into 1
    assert m[3]["chunk_id"] == 0 and m[3]["spans_boundary"]
    # doc 4 starts at 300 -> chunk 1
    assert m[4]["chunk_id"] == 1 and not m[4]["spans_boundary"]
    # group t independent; 300 tokens span the first boundary
    assert m[9]["start_offset"] == 0 and m[9]["spans_boundary"]


def test_packing_summary_and_validation(spark):
    df = spark.createDataFrame(
        [("s", 1, 100), ("s", 2, 200), ("s", 3, None)],
        "source string, doc_id int, n_tok int",
    )
    row = dv.packing_summary(df, budget=256).first()
    assert row["n_docs"] == 2  # NULL n_tok excluded
    assert row["total_tokens"] == 300
    assert row["n_chunks"] == 2
    assert row["fill_rate"] == pytest.approx(300 / 512, abs=1e-6)
    with pytest.raises(ValueError, match="budget"):
        dv.pack_sequences(df, budget=0)


# -- sessionization ----------------------------------------------------------


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_sessionize_gap_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, 10, _ts(0)),
            (2, 10, _ts(4)),     # 4 min gap -> same session
            (3, 10, _ts(20)),    # 16 min gap -> new session
            (4, 20, _ts(0)),     # other user independent
            (5, 10, None),       # NULL ts excluded
            (6, None, _ts(1)),   # NULL user excluded
        ],
        "event_id int, user_id int, ts timestamp",
    )
    s = dv.sessionize(df, gap_seconds=600)
    m = {r["event_id"]: r["session_seq"] for r in s.collect()}
    assert m == {1: 1, 2: 1, 3: 2, 4: 1}
    stats = {
        (r["user_id"], r["session_seq"]): r
        for r in dv.session_stats(df, gap_seconds=600).collect()
    }
    assert stats[(10, 1)]["n_events"] == 2
    assert stats[(10, 1)]["duration_sec"] == pytest.approx(240.0)
    assert stats[(10, 2)]["n_events"] == 1
    assert stats[(20, 1)]["n_events"] == 1
    with pytest.raises(ValueError, match="gap_seconds"):
        dv.sessionize(df, gap_seconds=0)


def test_sessionize_boundary_is_same_session(spark):
    # gap EXACTLY equal to gap_seconds stays in-session (strict >)
    df = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(10))], "event_id int, user_id int, ts timestamp"
    )
    s = dv.sessionize(df, gap_seconds=600)
    assert {r["session_seq"] for r in s.collect()} == {1}


# -- vocabulary bounds -------------------------------------------------------


def test_vocab_violations(spark):
    df = spark.createDataFrame(
        [
            (1, [0, 5, 7]),
            (2, [0, 8]),       # 8 >= vocab
            (3, [-1, 3]),      # negative
            (4, None),         # NULL array: E5's job, not flagged here
            (5, []),
        ],
        "doc_id int, tokens array<int>",
    )
    rows = {r["doc_id"]: r for r in dv.vocab_violations(df, vocab_size=8).collect()}
    assert set(rows) == {2, 3}
    assert rows[2]["n_bad"] == 1 and rows[2]["max_token"] == 8
    assert rows[3]["n_bad"] == 1 and rows[3]["min_token"] == -1
    with pytest.raises(ValueError, match="vocab_size"):
        dv.vocab_violations(df, vocab_size=0)


# -- key skew ----------------------------------------------------------------


def test_key_skew_report(spark):
    rows = [("hot",)] * 60 + [("a",)] * 20 + [("b",)] * 10 + [(None,)] * 10
    df = spark.createDataFrame(rows, "k string")
    rep = dv.key_skew_report(df, "k", top_k=3).collect()
    assert [r["k"] for r in rep] == ["hot", "a", None] or [
        r["k"] for r in rep
    ] == ["hot", "a", "b"]  # b/NULL tie at 10 broken NULL-first
    top = rep[0]
    assert top["cnt"] == 60
    assert top["share"] == pytest.approx(0.6, abs=1e-6)
    # 4 keys, 100 rows -> mean 25; hot = 60/25 = 2.4
    assert top["skew_factor"] == pytest.approx(2.4, abs=1e-4)
    # NULL keys are ranked like any other key
    assert any(r["k"] is None for r in dv.key_skew_report(df, "k", top_k=4).collect())
    with pytest.raises(ValueError, match="top_k"):
        dv.key_skew_report(df, "k", top_k=0)


def test_suggested_salt():
    assert skew.suggested_salt(1.0) == 1
    assert skew.suggested_salt(48.3) == 25
    assert skew.suggested_salt(48.3, target=10.0) == 5
    with pytest.raises(ValueError, match="target"):
        skew.suggested_salt(5.0, target=0)


# -- plan shapes -------------------------------------------------------------


def test_pii_plans_row_local(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    det = dv.detect_pii(d)
    plan = det._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan-project
    red = dv.redact_pii(d)
    assert "Exchange" not in red._jdf.queryExecution().executedPlan().toString()


def test_packing_single_exchange(spark, sf_dir):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("n_tok", F.size(F.split("text", " ")))
        .repartition(4)
    )
    plan = (
        dv.packing_summary(d, budget=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the window's hash partitioning on source is reused by the groupBy
    assert plan.count("Exchange hashpartitioning") == 1


# -- k-anonymity --------------------------------------------------------------


@pytest.fixture()
def quasi_df(spark):
    """zip x year quasi-identifiers: (90210, 1980) has 4 rows, (10001,
    1990) has 2, (10001, 1980) is a singleton; one NULL-zip pair."""
    rows = (
        [("90210", 1980)] * 4
        + [("10001", 1990)] * 2
        + [("10001", 1980)]
        + [(None, 1990), (None, 1990)]
    )
    return spark.createDataFrame(rows, "zip string, birth_year int")


def test_k_anonymity_report(quasi_df):
    r = dv.k_anonymity_report(quasi_df, ["zip", "birth_year"], k=3).first()
    assert r.k == 3 and r.n_rows == 9 and r.n_groups == 4
    assert r.min_group_size == 1
    # below k=3: the 2-row, 1-row and NULL 2-row groups
    assert r.n_groups_below_k == 3 and r.n_rows_below_k == 5
    assert r.frac_rows_below_k == round(5 / 9, 6)


def test_k_anonymity_null_is_a_value(quasi_df):
    # NULL zip forms its own group (2 rows), not dropped
    r = dv.k_anonymity_report(quasi_df, ["zip", "birth_year"], k=2).first()
    assert r.n_groups == 4 and r.n_rows == 9
    assert r.n_groups_below_k == 1 and r.n_rows_below_k == 1


def test_k_anonymity_all_anonymous(spark):
    df = spark.createDataFrame([("a",)] * 10, "g string")
    r = dv.k_anonymity_report(df, ["g"], k=5).first()
    assert r.n_groups_below_k == 0 and r.frac_rows_below_k == 0.0


def test_smallest_quasi_groups_witnesses(quasi_df):
    rows = dv.smallest_quasi_groups(quasi_df, ["zip", "birth_year"], top_k=2).collect()
    # smallest first; NULL zip sorts first among the size-2 ties
    assert [(r.zip, r.birth_year, r.group_size) for r in rows] == [
        ("10001", 1980, 1),
        (None, 1990, 2),
    ]


def test_k_anonymity_validation(quasi_df):
    with pytest.raises(ValueError, match="k must be"):
        dv.k_anonymity_report(quasi_df, ["zip"], k=1)
    with pytest.raises(ValueError, match="at least one"):
        dv.k_anonymity_report(quasi_df, [])
    with pytest.raises(ValueError, match="top_k"):
        dv.smallest_quasi_groups(quasi_df, ["zip"], top_k=0)


def test_smallest_quasi_groups_plan_topk(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = dv.smallest_quasi_groups(e, ["user_id", "event_type"], top_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# -- explicit salted join ------------------------------------------------------


def test_salted_join_matches_plain_join(spark):
    from dsci_524_g26_data_validation_spark.operators.skew import salted_join

    # hot key: 'k0' carries 80% of the left side
    left = spark.createDataFrame(
        [("k0", i) for i in range(80)]
        + [(f"k{i}", i) for i in range(1, 21)]
        + [(None, -1)],
        "k string, v int",
    )
    right = spark.createDataFrame(
        [("k0", "dim0"), ("k1", "dim1"), ("k99", "dimX"), (None, "dimN")],
        "k string, d string",
    )
    key = lambda r: tuple(str(x) for x in r)  # noqa: E731 (None-safe sort)
    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = left.join(right, on="k", how=how)
        salted = salted_join(left, right, on="k", salt=8, how=how)
        assert sorted(map(key, salted.collect())) == sorted(
            map(key, plain.collect())
        ), how


def test_salted_join_plan_and_validation(spark):
    from dsci_524_g26_data_validation_spark.operators.skew import salted_join

    left = spark.range(100).selectExpr("CAST(id % 3 AS STRING) k", "id v")
    right = spark.range(3).selectExpr("CAST(id AS STRING) k", "id d")
    out = salted_join(left, right, on="k", salt=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the join keys on (k, _salt): hot keys split across salt buckets
    assert "_salt" in plan
    with pytest.raises(ValueError, match="supports"):
        salted_join(left, right, on="k", salt=4, how="right")
    with pytest.raises(ValueError, match="salt must"):
        salted_join(left, right, on="k", salt=0)
    with pytest.raises(ValueError, match="at least one"):
        salted_join(left, right, on=[], salt=2)


# -- LSH parameter advisor (pure driver math) --------------------------------


def test_lsh_plan_classic_values():
    from dsci_524_g26_data_validation_spark.operators.dedup import lsh_plan

    # MMDS ch.3 anchor: 0.8 threshold at 128 hashes sits near r=8..16
    p = lsh_plan(0.8, num_hashes=128)
    assert p["bands"] * p["rows_per_band"] == 128
    assert 0.6 < p["implied_threshold"] < 0.95
    # S-curve monotone, near-0 at s=0, near-1 at s=1
    probs = [pr for _, pr in p["curve"]]
    assert probs == sorted(probs)
    assert probs[0] < 0.01 and probs[-1] > 0.99


def test_lsh_plan_threshold_moves_rows():
    from dsci_524_g26_data_validation_spark.operators.dedup import lsh_plan

    lo = lsh_plan(0.3, num_hashes=64)
    hi = lsh_plan(0.9, num_hashes=64)
    # low thresholds need shallower curves (fewer rows/band), high need steeper
    assert lo["rows_per_band"] < hi["rows_per_band"]
    assert lo["implied_threshold"] < hi["implied_threshold"]


def test_lsh_plan_validation():
    import pytest as _pytest

    from dsci_524_g26_data_validation_spark.operators.dedup import lsh_plan

    with _pytest.raises(ValueError):
        lsh_plan(0.0)
    with _pytest.raises(ValueError):
        lsh_plan(0.5, num_hashes=1)
    with _pytest.raises(ValueError):  # curve needs both [0,1] endpoints
        lsh_plan(0.5, curve_points=1)
    with _pytest.raises(ValueError):
        lsh_plan(0.5, curve_points=0)

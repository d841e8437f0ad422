"""Config-driven canonical extraction (P2): rules compile to one Project,
mixed-type values extract correctly, unknown methods fail loudly."""

from __future__ import annotations

import pytest

from caseguarddatapipeline_spark.operators.canonical import (
    CANONICAL_RULES,
    apply_field_rules,
    p2_canonical_config,
    raw_case_frame,
)


def test_rules_emit_typed_canonical_frame(spark, sf_dir):
    df = p2_canonical_config(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [r["field"] for r in CANONICAL_RULES]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["case_id"] == "bigint"
    assert types["balance"] == "double"
    assert types["is_urgent"] == "boolean"
    assert types["date_opened"] == "string"  # ISO string for parity

    rows = {r["case_id"]: r for r in df.collect()}
    assert rows, "sample must be non-empty"
    some = next(iter(rows.values()))
    assert some["case_ref"] == f"NBC-{some['case_id']:06d}"
    assert some["settlement_amount"] is not None
    assert some["mentions_court"] is True
    # currency sentinel: every 10th key has NULL claim_amount
    sentinel = [r for k, r in rows.items() if k % 10 == 0]
    assert sentinel and all(r["claim_amount"] is None for r in sentinel)
    filled = [r for k, r in rows.items() if k % 10 != 0]
    assert filled and all(
        abs(r["claim_amount"] - r["settlement_amount"]) < 1e-9 for r in filled
    )
    # both date rules recover the same underlying date
    assert all(r["date_opened"] == r["hearing_date"] for r in rows.values())


def test_rules_compile_to_single_stage(spark, sf_dir):
    plan = (
        p2_canonical_config(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure narrow Project over the scan
    assert "BatchEvalPython" not in plan  # no row-at-a-time UDF


def test_adding_a_rule_is_config_only(spark, sf_dir):
    raw = raw_case_frame(spark, sf_dir)
    rules = CANONICAL_RULES + [
        {"field": "is_settled", "source": "raw_note", "method": "keyword_flag",
         "param": "settlement"},
    ]
    df = apply_field_rules(raw, rules)
    assert df.columns[-1] == "is_settled"
    assert df.select("is_settled").distinct().collect()[0][0] is True


def test_unknown_method_raises(spark, sf_dir):
    raw = raw_case_frame(spark, sf_dir)
    with pytest.raises(ValueError, match="unknown extraction_method"):
        apply_field_rules(
            raw, [{"field": "x", "source": "raw_key", "method": "llm_magic"}]
        )

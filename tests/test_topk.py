"""Per-key top-k design record (operators/topk.py): the agg-form
reference must be row-identical to the window form (including the rank
column), and the window form's plan must keep Spark 4's map-side
WindowGroupLimit prune — the property the raised window_topk stress
floor rests on."""

from __future__ import annotations

import pytest

from caseguarddatapipeline_spark.operators.topk import (
    topk_per_key,
    topk_per_key_window,
)
from caseguarddatapipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    def norm(v):
        # nan != nan would fail tuple equality on genuinely equal rows
        if isinstance(v, float) and v != v:
            return "NaN"
        return v

    return sorted(
        (tuple(norm(v) for v in r) for r in df.collect()), key=repr
    )


def test_agg_form_is_row_identical_to_window_form(spark):
    """Same keys, same total order (unique tiebreak), k=3: every column
    plus the 1-based rank must match row-for-row — on events (timestamp
    descending order) and on lineitem (double + int order)."""
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    order = [("ts", True), ("event_id", True)]
    w = topk_per_key_window(events, ["user_id"], order, 3)
    a = topk_per_key(events, ["user_id"], order, 3)
    assert w.columns == a.columns
    assert _rows(w) == _rows(a)

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_linenumber", "l_quantity"
    )
    order = [("l_extendedprice", True), ("l_linenumber", True)]
    w = topk_per_key_window(li, ["l_orderkey"], order, 2)
    a = topk_per_key(li, ["l_orderkey"], order, 2)
    assert _rows(w) == _rows(a)


def test_agg_form_ascending_and_k1(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_linenumber"
    )
    order = [("l_extendedprice", False), ("l_linenumber", False)]
    w = topk_per_key_window(li, ["l_orderkey"], order, 1)
    a = topk_per_key(li, ["l_orderkey"], order, 1)
    assert _rows(w) == _rows(a)
    with pytest.raises(ValueError):
        topk_per_key(li, ["l_orderkey"], order, 0)


def test_agg_form_rejects_string_descending(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    with pytest.raises(TypeError, match="topk_per_key_window"):
        topk_per_key(li, ["l_orderkey"], [("l_returnflag", True)], 2)


def test_agg_form_identity_holds_under_adversarial_data(spark):
    """Property-style identity sweep without per-example Spark jobs
    (hypothesis + a session fixture would re-plan per draw): one frame
    packing the adversarial shapes — heavy ties on the order column
    (broken by the unique tiebreak), negative values (the negation
    encoding must stay monotone), singleton keys, keys with exactly k
    rows, empty-after-filter keys absent, and a skewed key holding half
    the rows."""
    rows = []
    rid = 0
    # skewed key 0: 200 rows, every value duplicated 4x (tie stress)
    for i in range(200):
        rows.append((0, float((i // 4) - 25), rid, f"p{rid}"))
        rid += 1
    # keys 1..40: 1..5 rows each, values in {-1.5, 0.0, 2.25}
    vals = [-1.5, 0.0, 2.25]
    for k in range(1, 41):
        for j in range(1 + k % 5):
            rows.append((k, vals[(k + j) % 3], rid, f"p{rid}"))
            rid += 1
    # NULL and NaN order values (round-11 review: desc must stay NULLS
    # LAST / NaN-first like F.desc) mixed into several keys
    for k in (0, 1, 5, 40):
        rows.append((k, None, rid, f"p{rid}"))
        rid += 1
        rows.append((k, float("nan"), rid, f"p{rid}"))
        rid += 1
    df = spark.createDataFrame(
        rows, "key long, score double, uid long, payload string"
    )
    for k in (1, 2, 3, 7):
        for desc in (True, False):
            order = [("score", desc), ("uid", True)]
            w = topk_per_key_window(df, ["key"], order, k)
            a = topk_per_key(df, ["key"], order, k)
            assert _rows(w) == _rows(a), (k, desc)


def test_window_form_plan_keeps_windowgrouplimit_prune(spark):
    """The design record's load-bearing fact: Spark plans the
    filtered-row_number form with a PARTIAL WindowGroupLimit BEFORE the
    exchange (map-side top-k prune, SPARK-37099). If an upgrade or conf
    change loses this, the window_topk stress floor argument is void —
    fail here, not in a slow stress run."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_linenumber"
    )
    df = topk_per_key_window(
        li, ["l_orderkey"], [("l_extendedprice", True), ("l_linenumber", True)], 2
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the PARTIAL WindowGroupLimit must sit below (after, in toString
    # order) the Exchange — i.e. on the map side
    partial = next(
        (
            ln
            for ln in plan.splitlines()
            if "WindowGroupLimit" in ln and "Partial" in ln
        ),
        None,
    )
    assert partial is not None, plan[:1500]
    exchange_pos = plan.find("Exchange hashpartitioning")
    assert 0 < exchange_pos < plan.find(partial), plan[:1500]

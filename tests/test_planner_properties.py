"""Property-style tests for the stats→plan decision functions
(operators/planner.py): generated adversarial statistics run through the
Spark-side logic and compared against independent pure-Python references
— the same one-job batch convention as test_scalar_properties.py."""

from __future__ import annotations

import random

from service_alerts_connector_spark.operators.planner import (
    join_order_decision,
    salting_decision_from_cells,
)

rng = random.Random(7)


def test_join_order_decision_invariants(spark):
    """For adversarial stat vectors (zeros, PK-FK shapes, huge NDVs):
    exactly one order is chosen, the chosen order has minimal cost, ties
    break toward lineitem_orders_first, and every value matches an
    independent reference estimator."""
    cases = [
        # all-empty tables: the zero-guard case (divisors floored at 1)
        dict(n_l=0, ndv_l_ok=0, n_o=0, ndv_o_ok=0, ndv_o_ck=0,
             n_c=0, ndv_c_ck=0),
        # perfect PK-FK
        dict(n_l=6000, ndv_l_ok=1500, n_o=1500, ndv_o_ok=1500,
             ndv_o_ck=100, n_c=100, ndv_c_ck=100),
    ]
    for _ in range(23):
        n_o = rng.randrange(0, 10_000)
        n_l = rng.randrange(0, 40_000)
        n_c = rng.randrange(0, 2_000)
        cases.append(
            dict(
                n_l=n_l,
                ndv_l_ok=rng.randrange(0, max(n_l, 1) + 1),
                n_o=n_o,
                ndv_o_ok=rng.randrange(0, max(n_o, 1) + 1),
                ndv_o_ck=rng.randrange(0, max(n_o, 1) + 1),
                n_c=n_c,
                ndv_c_ck=rng.randrange(0, max(n_c, 1) + 1),
            )
        )

    def ref(s):
        i_lo = (s["n_l"] * s["n_o"]) // max(s["ndv_l_ok"], s["ndv_o_ok"], 1)
        i_oc = (s["n_o"] * s["n_c"]) // max(s["ndv_o_ck"], s["ndv_c_ck"], 1)
        t_lo = (i_lo * s["n_c"]) // max(s["ndv_o_ck"], s["ndv_c_ck"], 1)
        t_oc = (i_oc * s["n_l"]) // max(s["ndv_o_ok"], s["ndv_l_ok"], 1)
        c_lo, c_oc = i_lo + t_lo, i_oc + t_oc
        return {
            "lineitem_orders_first": (i_lo, t_lo, c_lo, c_lo <= c_oc),
            "orders_customer_first": (i_oc, t_oc, c_oc, c_oc < c_lo),
        }

    for s in cases:
        rows = {r["order_name"]: r for r in join_order_decision(spark, s).collect()}
        expected = ref(s)
        assert set(rows) == set(expected)
        chosen = [n for n, r in rows.items() if r["chosen"]]
        assert len(chosen) == 1
        costs = {n: r["cost"] for n, r in rows.items()}
        assert costs[chosen[0]] == min(costs.values())
        if costs["lineitem_orders_first"] == costs["orders_customer_first"]:
            assert chosen == ["lineitem_orders_first"]  # documented tiebreak
        for name, (ei, et, ec, ch) in expected.items():
            r = rows[name]
            assert (
                r["est_intermediate"], r["est_total"], r["cost"], r["chosen"]
            ) == (ei, et, ec, ch), (s, name)


def test_salting_decision_property_batch(spark):
    """100 generated columns (random value histograms, optional NULL
    cells, hot-key spikes) through ONE salting_decision_from_cells call,
    checked cell-for-cell against a pure-Python reference: counts, NDV,
    MCV with the (cnt, val)-max tiebreak, NULL-cell counts, ppm shares
    over the NULL-aware hot count, and the factor-over-reducer-budget
    decision (which fires on greatest(mcv1_cnt, null_cnt) — a NULL-hot
    column concentrates one reducer exactly like a hot value)."""
    parts, factor = 32, 4
    cells_rows = []
    reference = {}
    for c in range(100):
        col = f"c{c:03d}"
        nvals = rng.randrange(1, 30)
        vals = {}
        for v in range(nvals):
            vals[f"v{rng.randrange(0, 50):02d}"] = None  # dedupe names
        vals = {v: rng.randrange(1, 5000) for v in vals}
        if rng.random() < 0.3:  # hot-key spike
            hot = rng.choice(list(vals))
            vals[hot] = rng.randrange(5_000, 200_000)
        null_cnt = rng.randrange(0, 100) if rng.random() < 0.4 else 0
        if rng.random() < 0.15:  # NULL-hot spike: one reducer melts too
            null_cnt = rng.randrange(5_000, 200_000)
        for v, cnt in vals.items():
            cells_rows.append((col, v, cnt))
        if null_cnt:
            cells_rows.append((col, None, null_cnt))

        n_rows = sum(vals.values()) + null_cnt
        ndv = len(vals)
        mcv_cnt = max(vals.values())
        mcv = max(v for v, cnt in vals.items() if cnt == mcv_cnt)
        hot_cnt = max(mcv_cnt, null_cnt)
        avg = n_rows // max(ndv, 1)
        ppm = hot_cnt * 1_000_000 // max(n_rows, 1)
        decision = (
            "salt" if hot_cnt > factor * max(n_rows // parts, 1) else "plain"
        )
        reference[col] = (
            n_rows, ndv, mcv, mcv_cnt, null_cnt, hot_cnt, avg, ppm, decision
        )

    cells = spark.createDataFrame(
        cells_rows, "col_name string, val string, cnt long"
    )
    got = {
        r["col"]: (
            r["n_rows"], r["ndv"], r["mcv1"], r["mcv1_cnt"], r["null_cnt"],
            r["hot_cnt"], r["avg_per_key"], r["hot_share_ppm"], r["decision"],
        )
        for r in salting_decision_from_cells(
            cells, parts=parts, factor=factor
        ).collect()
    }
    assert got == reference

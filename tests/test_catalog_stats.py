"""Round-9 optimizer-statistics / evaluation-metrics tier: brute-force
cross-checks on small frames (independent of the DuckDB oracle — pure
Python re-derivations), plus partitioning invariance for the two-phase
global-prefix machinery (the property a 1000-executor layout must hold).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import _events
from service_alerts_connector_spark.catalog_stats import (
    _bucketed_cum,
    q_auc_exact,
    q_cohens_kappa,
    q_equi_depth_histogram,
    q_ks_statistic,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_cum_matches_sorted_prefix(spark):
    """The two-phase (bucket-offset + in-bucket window) cumulative sum
    must equal the plain sorted prefix sum, whatever the partitioning."""
    rng = random.Random(9)
    rows = [(rng.randrange(0, 3_000_000), rng.randrange(1, 9)) for _ in range(500)]
    # dedupe scores (cells are unique by construction in the callers)
    seen: dict[int, int] = {}
    for s, c in rows:
        seen[s] = c
    cells = (
        spark.createDataFrame(
            sorted(seen.items()), "score long, nc long"
        )
        .repartition(7)  # scramble physical layout
        .withColumn("bucket", F.expr("score div 4096"))
    )
    got = {
        r["score"]: r["cum_nc"]
        for r in _bucketed_cum(cells, ("nc",)).collect()
    }
    acc = 0
    for s in sorted(seen):
        acc += seen[s]
        assert got[s] == acc, s


def test_auc_matches_pairwise_bruteforce(spark):
    """AUC from the query == the O(n²) pairwise Mann-Whitney count on the
    same rows (strict win = 1, tie = ½, via the doubled numerator)."""
    out = q_auc_exact(spark, SF_DIR).collect()[0]
    ev = _events(spark, SF_DIR).select(
        "value", "props"
    ).collect()
    import json as _json
    import math

    # math.floor on the double product mirrors Spark's floor(value*100)
    # exactly (same IEEE multiply, same floor)
    scored = [
        (math.floor(r["value"] * 100), _json.loads(r["props"])["k"] >= 50)
        for r in ev
    ]
    pos = [s for s, p in scored if p]
    neg = [s for s, p in scored if not p]
    num2 = sum(
        2 * sum(1 for n in neg if p > n) + sum(1 for n in neg if p == n)
        for p in pos
    )
    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
    assert out["num2"] == num2
    assert out["den2"] == 2 * len(pos) * len(neg)
    assert out["auc_ppm"] == (num2 * 1_000_000) // (2 * len(pos) * len(neg))


def test_ks_matches_cdf_bruteforce(spark):
    """KS d_scaled == max over scores of |cum_a·n_b − cum_b·n_a| computed
    by direct CDF walk, and at_score_c is the smallest maximizer."""
    import math

    out = q_ks_statistic(spark, SF_DIR).collect()[0]
    ev = _events(spark, SF_DIR).select(
        "value", "event_type"
    ).collect()
    a = sorted(
        math.floor(r["value"] * 100)
        for r in ev
        if r["event_type"] == "purchase"
    )
    b = sorted(
        math.floor(r["value"] * 100) for r in ev if r["event_type"] == "view"
    )
    na, nb = len(a), len(b)
    scores = sorted(set(a) | set(b))
    best, best_at, ca, cb, ia, ib = -1, None, 0, 0, 0, 0
    for s in scores:
        while ia < na and a[ia] <= s:
            ia += 1
        while ib < nb and b[ib] <= s:
            ib += 1
        d = abs(ia * nb - ib * na)
        if d > best:
            best, best_at = d, s
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["d_scaled"] == best
    assert out["at_score_c"] == best_at
    assert out["ks_ppm"] == (best * 1_000_000) // (na * nb)


def test_kappa_matches_direct_formula(spark):
    """kappa num/den from the query == the direct confusion-matrix
    formula on collected rows; the ppm value floors correctly whatever
    the sign."""
    import json as _json
    import math

    out = q_cohens_kappa(spark, SF_DIR).collect()[0]
    ev = _events(spark, SF_DIR).select(
        "value", "props"
    ).collect()
    lab = [
        (
            math.floor(r["value"] * 100) >= 5000,
            _json.loads(r["props"])["k"] >= 50,
        )
        for r in ev
    ]
    n = len(lab)
    n11 = sum(1 for a, b in lab if a and b)
    n10 = sum(1 for a, b in lab if a and not b)
    n01 = sum(1 for a, b in lab if not a and b)
    n00 = sum(1 for a, b in lab if not a and not b)
    pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    num, den = n * (n11 + n00) - pe, n * n - pe
    assert (out["n11"], out["n10"], out["n01"], out["n00"]) == (
        n11,
        n10,
        n01,
        n00,
    )
    assert out["num"] == num and out["den"] == den
    # python's // IS floor division for either sign — the reference
    assert out["kappa_ppm"] == (num * 1_000_000) // den


def test_equi_depth_buckets_are_balanced(spark):
    """Bucket populations must match the rank definition: every bucket's
    cumulative upper rank is ≥ (q·n) div 8 and the bucket contents lie in
    (prev_ub, ub]."""
    rows = q_equi_depth_histogram(spark, SF_DIR).collect()
    n = sum(r["n_rows"] for r in rows)
    cum, prev_ub = 0, None
    for r in rows:
        cum += r["n_rows"]
        assert r["lo_c"] <= r["hi_c"] <= r["ub_c"]
        if prev_ub is not None:
            assert r["lo_c"] > prev_ub
        if r["bucket_id"] < 8:
            assert cum >= (r["bucket_id"] * n) // 8
        prev_ub = r["ub_c"]
    assert cum == n


def test_eval_metrics_partitioning_invariant(spark):
    """Repartitioning the input parquet read must not change any metric —
    the determinism claim behind running these on 1000 executors.  Checked
    by re-running with a different shuffle-partition count."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a1 = q_auc_exact(spark, SF_DIR).collect()[0].asDict()
        k1 = q_ks_statistic(spark, SF_DIR).collect()[0].asDict()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        a2 = q_auc_exact(spark, SF_DIR).collect()[0].asDict()
        k2 = q_ks_statistic(spark, SF_DIR).collect()[0].asDict()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a1 == a2
    assert k1 == k2


def test_signed_floor_div_identity_property(spark):
    """The kappa/metric queries' explicit floor-division CASE must equal
    python's // (true floor) for EVERY sign combination — batched
    property check: one Spark job and one DuckDB query over ~400
    randomized (num, den) pairs, plus the adversarial exact-multiple and
    off-by-one corners where truncation and floor diverge."""
    import duckdb
    import random

    rng = random.Random(99)
    pairs = [(rng.randint(-10**12, 10**12), rng.randint(1, 10**9)) for _ in range(380)]
    pairs += [(-7, 7), (7, 7), (-8, 7), (-6, 7), (0, 5), (-1, 10**9),
              (10**12, 1), (-(10**12), 1), (-3, 2), (3, 2)]
    case = (
        "CASE WHEN num >= 0 THEN (num * 1000000) {div} den "
        "ELSE -(((-num) * 1000000 + den - 1) {div} den) END"
    )
    expected = [(n * 1_000_000) // d for n, d in pairs]

    df = spark.createDataFrame(pairs, "num long, den long").selectExpr(
        "num", "den", case.format(div="div") + " AS v"
    )
    got_spark = {
        (r["num"], r["den"]): r["v"] for r in df.collect()
    }
    assert [got_spark[p] for p in pairs] == expected

    con = duckdb.connect()
    vals = ", ".join(f"({n}, {d})" for n, d in pairs)
    got_duck = con.execute(
        f"SELECT num, den, {case.format(div='//')} AS v "
        f"FROM (VALUES {vals}) t(num, den)"
    ).fetchall()
    assert [v for _, _, v in got_duck] == expected


def test_bcast_oracle_schema_matches_parquet(spark):
    """The broadcast_decision ORACLE hard-codes each table's column list
    and widths; the Spark side reads the live schema.  Generator-side
    parquet schema drift (CLAUDE.md: it happens across rounds) must fail
    HERE, loudly, not as an opaque differential red."""
    from service_alerts_connector_spark.catalog import _t
    from service_alerts_connector_spark.catalog_stats import (
        BCAST_ORACLE_SCHEMAS,
    )

    type_map = {
        "INTEGER": {"int"},
        "BIGINT": {"bigint"},
        "DOUBLE": {"double"},
        # ts physical type varies across testdata generations (CLAUDE.md)
        "TIMESTAMP": {"timestamp", "timestamp_ntz"},
        "V": {"string"},
    }
    for tbl, cols in BCAST_ORACLE_SCHEMAS.items():
        dtypes = _t(spark, SF_DIR, tbl).dtypes
        assert [c for c, _ in dtypes] == [c for c, _ in cols], tbl
        for (name, spark_t), (_, oracle_t) in zip(dtypes, cols):
            assert spark_t in type_map[oracle_t], (tbl, name, spark_t)

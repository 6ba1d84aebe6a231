"""Pins bench.py's consumer-facing trust verdict (pure function) — the
artifact-borne answer to "is this recording anchor-grade?" that the
binary contended_sample flag cannot give (r13: ~5 median>cold
inversions is the host's noise floor while best-warm reproduces to
0.03% across runs)."""

import importlib.util
import os


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


BENCH = _bench()


def test_no_crosscheck_is_unknown_not_false():
    trusted, basis = BENCH.trust_verdict({"a": 1.0}, None, {})
    assert trusted is None
    assert "no crosscheck" in basis


def test_reproducible_run_with_clean_preflight_is_trusted():
    t = {"a": 1.000, "b": 2.000}
    cc = {"a": 1.004, "b": 2.010}  # 0.47% total delta, no >2x
    trusted, basis = BENCH.trust_verdict(t, cc, {})
    assert trusted is True
    assert "0.4" in basis


def test_total_delta_over_threshold_fails():
    trusted, _ = BENCH.trust_verdict(
        {"a": 1.0, "b": 2.0}, {"a": 1.2, "b": 2.2}, {}
    )
    assert trusted is False


def test_single_query_divergence_fails_even_with_flat_total():
    # totals nearly cancel but one query diverges >2x — the r12 lesson
    # (one bad sample in a committed anchor) applied cross-run
    t = {"a": 1.0, "b": 2.0, "c": 0.10}
    cc = {"a": 1.0, "b": 1.79, "c": 0.30}
    trusted, basis = BENCH.trust_verdict(t, cc, {})
    assert trusted is False
    assert "'c'" in basis


def test_anchor_regression_vetoes_trust():
    t = {"a": 1.0}
    trusted, basis = BENCH.trust_verdict(t, dict(t), {"a": [0.4, 1.0]})
    assert trusted is False
    assert "anchor_regressions: ['a']" in basis


def test_zero_on_one_side_is_divergent_not_skipped():
    # a 0.0-vs-slow pair must fail the per-query gate (r14 advice: the
    # min>0 guard made it invisible, only dampening the total delta)
    t = {"a": 1.0, "b": 0.0}
    cc = {"a": 1.0, "b": 0.5}
    trusted, basis = BENCH.trust_verdict(t, cc, {})
    assert trusted is False
    assert "'b'" in basis


def test_both_zero_pair_agrees_trivially():
    t = {"a": 1.0, "b": 0.0}
    cc = {"a": 1.001, "b": 0.0}
    trusted, _ = BENCH.trust_verdict(t, cc, {})
    assert trusted is True


def test_query_set_mismatch_is_false():
    trusted, basis = BENCH.trust_verdict(
        {"a": 1.0, "b": 2.0}, {"a": 1.0}, {}
    )
    assert trusted is False
    assert "mismatch" in basis

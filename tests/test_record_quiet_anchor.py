"""Pins the quiet-window gate of tools/record_quiet_anchor.py (pure
function) — the probe verdict that decides whether a trusted-anchor
crosscheck pair is even worth launching.  Calibration context: the
sub-second canaries sit 1.4-1.6x the night anchor in GOOD daytime
moments (SCALE.md round-14/15 anchor campaigns), so the 1.30x default
only opens in an anchor-grade window."""

import importlib.util
import os


def _mod():
    spec = importlib.util.spec_from_file_location(
        "record_quiet_anchor",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "tools",
            "record_quiet_anchor.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


M = _mod()

ANCHOR = {
    "geo_overlay_rect": 2.28,
    "dau_new_vs_returning": 0.359,
    "hhi_concentration": 0.547,
    "unrelated_query": 1.0,
}


def test_night_grade_probe_is_quiet():
    probe = {
        "geo_overlay_rect": 2.35,
        "dau_new_vs_returning": 0.40,
        "hhi_concentration": 0.60,
    }
    ok, detail = M.quiet_verdict(probe, ANCHOR)
    assert ok, detail


def test_good_daytime_moment_still_rejected():
    # the r14 best daytime observation: compute-bound canary at anchor,
    # stage-overhead canaries at 1.6x — must NOT open the gate
    probe = {
        "geo_overlay_rect": 2.38,
        "dau_new_vs_returning": 0.59,
        "hhi_concentration": 0.80,
    }
    ok, _ = M.quiet_verdict(probe, ANCHOR)
    assert not ok


def test_single_wavy_canary_rejects():
    probe = {
        "geo_overlay_rect": 4.37,  # the 23:00 UTC Sunday probe
        "dau_new_vs_returning": 0.439,
        "hhi_concentration": 0.656,
    }
    ok, _ = M.quiet_verdict(probe, ANCHOR)
    assert not ok


def test_canary_missing_from_anchor_is_skipped_not_fatal():
    anchor = {"geo_overlay_rect": 2.28}  # e.g. first-ever anchor subset
    probe = {
        "geo_overlay_rect": 2.30,
        "dau_new_vs_returning": 9.9,  # not comparable — no anchor value
    }
    ok, detail = M.quiet_verdict(probe, anchor)
    assert ok, detail


def test_nothing_comparable_is_not_quiet():
    ok, detail = M.quiet_verdict({"dau_new_vs_returning": 0.3}, {})
    assert not ok
    assert "no canary" in detail


def test_threshold_is_a_parameter():
    probe = {"geo_overlay_rect": 2.28 * 1.5}
    ok_tight, _ = M.quiet_verdict(probe, ANCHOR, ratio=1.30)
    ok_loose, _ = M.quiet_verdict(probe, ANCHOR, ratio=1.60)
    assert not ok_tight and ok_loose

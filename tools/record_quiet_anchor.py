"""Record a trusted quiet bench anchor — the r14/r15 brief, mechanized.

The repo's bench trust protocol (bench.py `trust_verdict`) requires two
back-to-back FULL recordings in a quiet host window: the second run
crosschecks the first (`$SPARK_GRAFT_BENCH_CROSSCHECK`), and `trusted:
true` needs (a) zero anchor regressions, (b) zero per-query >2x
cross-run divergences, (c) cross-run best-warm total delta <= 1%.
Rounds 14-15 showed daytime waves defeat hand-driven attempts (eight
recordings, every one wave-hit; SCALE.md "Round-15 anchor campaign"),
so this tool mechanizes the whole campaign:

1. PROBE: run the three canary queries (compute-bound + two
   stage-overhead-dominated) and compare best-warm to the newest
   committed `BENCH_r*_quiet.json` anchor.  A window is quiet iff every
   canary is within `--quiet-ratio` (default 1.30x) of its anchor
   value — calibrated from the r14 observation that the sub-second
   canaries sit 1.4-1.6x the night anchor even in GOOD daytime moments,
   so 1.30x only passes in an anchor-grade window.
2. PAIR/CHAIN: once quiet, run full recordings back-to-back, each
   crosschecking the previous one (run N's salvage re-pass then covers
   wave minima AND anchor-uncovered divergences vs run N-1 — the gap
   that killed the first r15 pair).  Commit-grade output = the first
   run whose artifact says `trusted: true`; it is copied to `--out`.
3. Repeat the probe on a cadence until `--deadline-utc` if the window
   is (or turns) wavy.

Usage:
    python tools/record_quiet_anchor.py --out BENCH_r15_quiet.json \
        [--probe-only] [--deadline-utc 04:30] [--max-runs 4]

Stdlib-only; all Spark work happens in `python bench.py` subprocesses,
so a crashed recording never takes the campaign loop down with it.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANARIES = ("geo_overlay_rect", "dau_new_vs_returning", "hhi_concentration")


def log(msg: str) -> None:
    print(time.strftime("[%H:%M:%S UTC] ", time.gmtime()) + msg, flush=True)


def load_artifact(path: str) -> dict | None:
    """Largest full-record line of a bench artifact (the compact tail
    record only carries worst-5 queries — never use it for totals)."""
    best = None
    try:
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if not isinstance(rec.get("queries"), dict):
                    continue
                if best is None or len(rec["queries"]) > len(
                    best["queries"]
                ):
                    best = rec
    except (OSError, ValueError):
        return None
    return best


def newest_anchor() -> tuple[str | None, dict[str, float]]:
    quiets = sorted(glob.glob(os.path.join(REPO, "BENCH_r*_quiet.json")))
    if not quiets:
        return None, {}
    rec = load_artifact(quiets[-1])
    return quiets[-1], dict(rec["queries"]) if rec else {}


def quiet_verdict(
    probe: dict[str, float],
    anchor: dict[str, float],
    ratio: float = 1.30,
) -> tuple[bool, str]:
    """Pure gate, unit-tested: quiet iff every canary present in both
    frames reads <= ratio x its anchor value.  A canary missing from
    the anchor is skipped (it cannot gate); zero canaries comparable =
    not quiet (no evidence is not good evidence)."""
    ratios = {
        q: probe[q] / anchor[q]
        for q in CANARIES
        if q in probe and anchor.get(q, 0) > 0
    }
    if not ratios:
        return False, "no canary comparable to the anchor"
    worst = max(ratios, key=lambda q: ratios[q])
    detail = ", ".join(
        f"{q} {probe[q]:.3f}s={ratios[q]:.2f}x" for q in sorted(ratios)
    )
    return ratios[worst] <= ratio, f"{detail} (gate {ratio:.2f}x)"


def run_bench(env_extra: dict[str, str], tag: str) -> dict | None:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_BENCH_QUERIES", None)
    env.pop("SPARK_GRAFT_BENCH_CROSSCHECK", None)
    env.update(env_extra)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    mins = (time.time() - t0) / 60
    if proc.returncode != 0:
        log(f"{tag}: bench.py exited {proc.returncode} after {mins:.1f} min")
        return None
    sub = "BENCH_LOCAL.subset.json" if "SPARK_GRAFT_BENCH_QUERIES" in env_extra else "BENCH_LOCAL.json"
    rec = load_artifact(os.path.join(REPO, sub))
    log(f"{tag}: done in {mins:.1f} min")
    return rec


def probe_once(ratio: float) -> tuple[bool, str]:
    rec = run_bench(
        {"SPARK_GRAFT_BENCH_QUERIES": ",".join(CANARIES)}, "probe"
    )
    if rec is None:
        return False, "probe run failed"
    _, anchor = newest_anchor()
    ok, detail = quiet_verdict(rec["queries"], anchor, ratio)
    log(f"probe {'QUIET' if ok else 'wavy'}: {detail}")
    return ok, detail


def shared_total(a: dict[str, float], b: dict[str, float]) -> tuple[int, float, float]:
    shared = set(a) & set(b)
    return len(shared), sum(a[q] for q in shared), sum(b[q] for q in shared)


def run_chain(out: str, max_runs: int) -> bool:
    """Back-to-back full recordings, each crosschecking the previous;
    stop at the first `trusted: true` artifact and copy it to `out`."""
    prev_path = None
    for i in range(1, max_runs + 1):
        env = {}
        if prev_path:
            env["SPARK_GRAFT_BENCH_CROSSCHECK"] = prev_path
        rec = run_bench(env, f"full run {i}/{max_runs}")
        if rec is None:
            return False
        log(
            f"run {i}: total {rec.get('value')}s, trusted={rec.get('trusted')}"
            f", basis: {rec.get('trust_basis', '')[:160]}"
        )
        if rec.get("salvage_repass"):
            log(f"run {i}: salvaged {sorted(rec['salvage_repass'])}")
        if rec.get("trusted") is True:
            src = os.path.join(REPO, "BENCH_LOCAL.json")
            shutil.copy(src, os.path.join(REPO, out))
            log(f"TRUSTED — committed-grade artifact copied to {out}")
            return True
        # keep this run as the next run's crosscheck basis
        prev_path = os.path.join("/tmp", f"bench_chain_{i}.json")
        shutil.copy(os.path.join(REPO, "BENCH_LOCAL.json"), prev_path)
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_r15_quiet.json")
    ap.add_argument("--quiet-ratio", type=float, default=1.30)
    ap.add_argument("--probe-only", action="store_true")
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--max-runs", type=int, default=4)
    ap.add_argument(
        "--deadline-utc",
        default=None,
        help="HH:MM — keep re-probing every --probe-interval min until "
        "quiet or past this UTC wall-clock time (assumed within 24h)",
    )
    ap.add_argument("--probe-interval", type=float, default=12.0)
    args = ap.parse_args()

    anchor_path, anchor = newest_anchor()
    log(f"anchor: {os.path.basename(anchor_path) if anchor_path else None} "
        f"({len(anchor)} queries)")

    while True:
        if args.skip_probe:
            quiet = True
        else:
            quiet, _ = probe_once(args.quiet_ratio)
        if args.probe_only:
            return 0 if quiet else 1
        if quiet and run_chain(args.out, args.max_runs):
            return 0
        if quiet:
            log("chain exhausted without a trusted artifact; re-probing")
        if args.deadline_utc:
            now = time.gmtime()
            hh, mm = map(int, args.deadline_utc.split(":"))
            mins_now = now.tm_hour * 60 + now.tm_min
            mins_dl = hh * 60 + mm
            remaining = (mins_dl - mins_now) % (24 * 60)
            if remaining == 0 or remaining > 12 * 60:
                log("deadline reached without a trusted artifact")
                return 1
            log(f"sleeping {args.probe_interval:.0f} min "
                f"({remaining} min to deadline)")
            time.sleep(args.probe_interval * 60)
        else:
            return 1


if __name__ == "__main__":
    sys.exit(main())

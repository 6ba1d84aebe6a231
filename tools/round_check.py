"""Round-end lockstep gate: the drift checks the judge performs, run
mechanically.  Exit 0 = consistent; nonzero prints every violation.

Checks (all cheap — no Spark session):
  1. README's "N operator queries — M paired" counts match
     len(queries()) / len(oracle_sql()).
  2. Every oracle_sql() key is a queries() key (no orphan oracles).
  3. The driver lead (first 50 queries() keys) has no duplicates and
     every lead key exists.
  4. PLANS.md contains one section per tools/gen_plans.py PICK entry.
  5. bench.py HEADLINE ⊆ queries() (a renamed query would crash bench).
  6. Every never-certified query (tools/cert_ages.py age 0) appears in
     the lead — new queries must be driver-sampled their first round.
  7. STORE_GROWTH.json (if present) carries flat per-ingest curves
     (tail-mean <= head-mean x2 per regime) — the saturation-store
     drift gate fed by tools/measure_store_growth.py.

Usage: python tools/round_check.py
"""

from __future__ import annotations

import importlib.util
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(ROOT, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    q, o = entry.queries(), entry.oracle_sql()
    errs: list[str] = []

    readme = open(os.path.join(ROOT, "README.md")).read()
    m = re.search(r"exposes (\d+) operator queries — (\d+) paired", readme)
    if not m:
        errs.append("README counts sentence not found")
    elif (int(m.group(1)), int(m.group(2))) != (len(q), len(o)):
        errs.append(
            f"README says {m.group(1)}/{m.group(2)}, "
            f"actual {len(q)}/{len(o)}"
        )

    orphans = [k for k in o if k not in q]
    if orphans:
        errs.append(f"oracles without queries: {orphans}")

    # validate the LEAD TUPLE itself, not just the (unique-by-
    # construction) first 50 dict keys: a misspelled or duplicated lead
    # entry is silently dropped by queries()'s `if k in merged` filter
    # and the window backfills with a fresh key — exactly the drift this
    # gate exists to catch (ADVICE r11).
    lead = list(q)[:50]
    decl = getattr(entry, "DRIVER_LEAD", None)
    if decl is None:
        errs.append("__spark_entry__.DRIVER_LEAD export missing")
    else:
        lead_errs = []
        if len(decl) != 50:
            lead_errs.append(
                f"DRIVER_LEAD has {len(decl)} entries, expected 50"
            )
        dupes = sorted({k for k in decl if list(decl).count(k) > 1})
        if dupes:
            lead_errs.append(f"DRIVER_LEAD duplicates: {dupes}")
        unknown_lead = [k for k in decl if k not in q]
        if unknown_lead:
            lead_errs.append(
                f"DRIVER_LEAD names not in queries(): {unknown_lead}"
            )
        if not lead_errs and lead != list(decl):
            lead_errs.append(
                "first 50 queries() keys differ from DRIVER_LEAD "
                "(lead rotation not applied in queries())"
            )
        errs.extend(lead_errs)

    plans = open(os.path.join(ROOT, "PLANS.md")).read()
    sections = set(re.findall(r"^## (\S+)", plans, re.M))
    gen = open(os.path.join(ROOT, "tools", "gen_plans.py")).read()
    pick = set(re.findall(r'"([a-z0-9_]+)"', gen.split("PICK = ")[1].split("]")[0]))
    missing_plans = sorted(pick - sections)
    if missing_plans:
        errs.append(
            f"PLANS.md missing sections for: {missing_plans} "
            "(rerun python tools/gen_plans.py)"
        )

    sys.path.insert(0, ROOT)
    from bench import HEADLINE  # noqa: E402

    unknown = [n for n in HEADLINE if n not in q]
    if unknown:
        errs.append(f"bench HEADLINE names not in queries(): {unknown}")

    from cert_ages import cert_ages  # noqa: E402

    never = [k for r, k in cert_ages() if r == 0]
    not_led = [k for k in never if k not in lead]
    if not_led:
        errs.append(
            f"never-certified queries outside the 50-query lead: {not_led}"
        )

    # 7. saturation-store growth drift: the committed STORE_GROWTH.json
    # artifact must carry flat per-ingest curves (tail-mean <= head-mean
    # x2 per regime) — a violated flag means a store regression (e.g. an
    # unpinned read re-scanning all versions) landed since the last
    # re-measurement (`python tools/measure_store_growth.py`).
    growth_path = os.path.join(ROOT, "STORE_GROWTH.json")
    growth_note = "no STORE_GROWTH.json"
    if os.path.exists(growth_path):
        import json

        try:
            summary = json.loads(open(growth_path).read())["summary"]
        except (ValueError, KeyError) as exc:
            errs.append(f"STORE_GROWTH.json unreadable: {exc}")
            summary = {}
        regressed = sorted(
            k[: -len("_flat")]
            for k, v in summary.items()
            if k.endswith("_flat") and v is not True
        )
        if regressed:
            errs.append(
                f"store growth curve regressed (tail-mean > head-mean x2) "
                f"for: {regressed} — investigate before re-recording"
            )
        elif summary:
            growth_note = (
                "growth flat: "
                + ", ".join(
                    f"{r} {summary[r + '_s_head_mean']}->"
                    f"{summary[r + '_s_tail_mean']}s"
                    for r in ("novelty", "docfreq")
                    if r + "_s_head_mean" in summary
                )
            )

    if errs:
        for e in errs:
            print("LOCKSTEP VIOLATION:", e)
        return 1
    print(
        f"lockstep OK: {len(q)} queries / {len(o)} oracles; lead 50 valid; "
        f"{len(pick)} PLANS sections; {len(HEADLINE)} bench queries; "
        f"{len(never)} never-certified all in lead; {growth_note}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

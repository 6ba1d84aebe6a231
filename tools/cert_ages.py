"""Certificate-age ranking for the driver sample rotation.

The steady-state cadence policy (see __spark_entry__.py's lead comment)
fills each round's 50-query lead with (a) queries changed that round,
(b) never-certified queries, then (c) the STALEST certificates.  This
tool computes (b) and (c) mechanically: for every key in queries(), the
latest round it appears in across CORRECTNESS_r*.json, sorted
oldest-first.

Usage: python tools/cert_ages.py [N]   (default: print the oldest 60)
No Spark session needed — pure JSON + module import.
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cert_ages() -> list[tuple[int, str]]:
    latest: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for k in json.load(open(p)):
            latest[k] = max(latest.get(k, 0), rnd)
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    # age 0 = never certified (category b) — sorts first
    return sorted((latest.get(k, 0), k) for k in qs)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    ages = cert_ages()
    never = [k for r, k in ages if r == 0]
    if never:
        print(f"# never certified ({len(never)}): {never}")
    for r, k in ages[:n]:
        print(r, k)


if __name__ == "__main__":
    main()

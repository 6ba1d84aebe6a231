"""Rendered-oracle diff against a git revision — the mechanical form of
the sample-cadence policy's category (a) ("queries changed this round").

The round-11 miss happened because "changed" was derived by eyeballing
`git diff --name-only` over catalog files; the round-14 shingle-SQL
hoist showed the opposite failure is also real (a refactor in ONE
module re-renders the oracle SQL of 12 queries across THREE modules via
shared CTE fragments).  Comparing the RENDERED `oracle_sql()` strings
of both trees catches exactly the set whose certified artifact changed,
regardless of which file the edit lived in.

Usage: python tools/changed_oracles.py <rev>   (e.g. the prev round-end
commit).  Prints changed / added / removed query names.  Spark-free
(oracle rendering is pure string work).  Limitation: a Spark-side-only
change (the DataFrame builder moves, the oracle string doesn't) is NOT
caught here — pair this with the module diff when deriving the lead.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_oracles(root: str, tag: str) -> dict[str, str]:
    for m in list(sys.modules):
        if "service_alerts" in m:
            del sys.modules[m]
    sys.path.insert(0, root)
    try:
        spec = importlib.util.spec_from_file_location(
            f"entry_{tag}", os.path.join(root, "__spark_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.oracle_sql()
    finally:
        sys.path.remove(root)


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit("usage: python tools/changed_oracles.py <git-rev>")
    rev = sys.argv[1]
    with tempfile.TemporaryDirectory(prefix="oldtree_") as tmp:
        subprocess.run(
            ["git", "-C", ROOT, "worktree", "add", "--detach", "-q", tmp, rev],
            check=True,
        )
        try:
            old = load_oracles(tmp, "old")
        finally:
            subprocess.run(
                ["git", "-C", ROOT, "worktree", "remove", "--force", tmp],
                check=False,
            )
    new = load_oracles(ROOT, "new")
    changed = sorted(k for k in old if k in new and old[k] != new[k])
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    print(f"changed ({len(changed)}):", changed)
    print(f"added ({len(added)}):", added)
    print(f"removed ({len(removed)}):", removed)


if __name__ == "__main__":
    main()

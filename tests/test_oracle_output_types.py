"""Guard: no oracle SQL may emit a pandas-degrading DuckDB type.

The external correctness harness fetches DuckDB oracle results through
pandas/Arrow, where HUGEINT (the implicit result type of ``sum()`` over
BIGINT and of ``//`` on such a sum) and DECIMAL degrade to float64 —
``222400`` hashes as ``"222400.0"`` and mismatches Spark's int even when
the values are identical.  Round 5 shipped 15 driver reds with exactly
this root cause while all local differentials passed via ``fetchall()``.

Every oracle's final SELECT must therefore CAST aggregate/division
outputs to BIGINT.  This test binds each oracle against the sf0.001
testdata views (type resolution only — no execution) and fails on any
HUGEINT/UHUGEINT/DECIMAL output column, naming the query and columns.
"""

from __future__ import annotations

import importlib.util
import os
from pathlib import Path

import pytest

from tests.oracle_util import duck_connection

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

_BANNED_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")

# derive from this file's location, not a hardcoded /root/repo — the
# sibling contract tests import off sys.path and work on any checkout
_ENTRY_PATH = Path(__file__).resolve().parents[1] / "__spark_entry__.py"


def _entry_oracles() -> dict[str, str]:
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_types", str(_ENTRY_PATH)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.oracle_sql()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_no_pandas_degrading_types_in_any_oracle():
    oracles = _entry_oracles()
    con = duck_connection(SF_DIR)
    offenders: list[str] = []
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)  # lazy bind: resolves output types, no execution
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, (str(t) for t in rel.types))
            if t.startswith(_BANNED_PREFIXES)
        ]
        if bad:
            offenders.append(f"{name} -> {bad}")
    assert not offenders, (
        "oracle SQL emits pandas-degrading output types "
        "(wrap the final column in CAST(... AS BIGINT)):\n"
        + "\n".join(offenders)
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_integer_columns_only_degrade_via_nulls():
    """Runtime companion to the static type check: a column RESOLVED as
    BIGINT still arrives in pandas as float64 when it contains NULLs —
    the data-dependent half the lazy bind cannot see.  That case is
    benign because ``oracle_util.compare`` now pushes BOTH engines
    through pandas (the round-7 symmetric mirror), so Spark's toPandas
    degrades the same rows the same way.  What must NEVER happen is an
    integer-resolved column arriving float64 WITHOUT any NULL in it —
    that would mean a new degrading type class leaked past the static
    ban (the r5 HUGEINT mode).  Execute every oracle at sf0.001 and pin
    exactly that."""
    import numpy as np

    oracles = _entry_oracles()
    con = duck_connection(SF_DIR)
    offenders: list[str] = []
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)
        int_cols = [
            c
            for c, t in zip(rel.columns, (str(t) for t in rel.types))
            if str(t) in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                          "UBIGINT", "UINTEGER")
        ]
        if not int_cols:
            continue
        pdf = con.execute(sql).df()
        for c in int_cols:
            if pdf[c].dtype == np.float64 and not pdf[c].isna().any():
                offenders.append(f"{name}.{c}")
    assert not offenders, (
        "integer-resolved oracle columns arrived as float64 without any "
        "NULL to explain it — a new pandas-degrading type class: "
        + ", ".join(offenders)
    )

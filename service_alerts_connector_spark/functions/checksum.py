"""Row-checksum expressions — the heart of the incremental cache (F9-F11).

The reference hashes ``str(v)`` of every cell plus a salt with md5, using a
multiprocessing Pool for parallelism (ServiceAlertBase.py:12-14, 21-53, X6).
In Spark the same thing is a single codegen'd ``md5(concat_ws(...))``
expression — partition parallelism subsumes the Pool, and the hash runs
JVM-side at full scan speed at any scale.

Canonical serialization: the engine defines its *own* stable cell-to-string
form (documented here, pinned by tests) rather than chasing pandas ``str()``
quirks (SURVEY §7 hard-point (a)) — the cache only ever compares
engine-to-engine, so self-consistency is what matters:

* null (any type)      → the literal ``"∅"`` (U+2205), chosen to be
                         impossible in real cell data;
* timestamp            → ``yyyy-MM-dd HH:mm:ss`` (second precision, session tz);
* boolean              → ``true`` / ``false``;
* array<string>        → elements joined with ``\\x1e`` (record separator);
* everything else      → Spark's ``cast(string)``.

Cells are joined with ``\\x1f`` (unit separator) before hashing so adjacent
columns can't collide by concatenation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_TOKEN = "∅"
FIELD_SEP = "\x1f"
ARRAY_SEP = "\x1e"


def canonical_cell(col: Column, dtype: T.DataType | None = None) -> Column:
    """Stable string form of one cell (see module docstring)."""
    if isinstance(dtype, T.TimestampType):
        rendered = F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    elif isinstance(dtype, T.ArrayType):
        rendered = F.array_join(col.cast("array<string>"), ARRAY_SEP, NULL_TOKEN)
    else:
        rendered = col.cast("string")
    return F.coalesce(rendered, F.lit(NULL_TOKEN))


def row_checksum(df: DataFrame, cols: list[str], salt: str = "") -> Column:
    """F9 — salted md5 over the canonical serialization of ``cols``.

    Equivalent role to reference ServiceAlertBase.py:21-31
    (``md5("".join(str(v) for v in row) + salt)``), replacing the
    multiprocessing Pool (X6) with a columnar expression.
    """
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    cells = [canonical_cell(F.col(c), dtypes.get(c)) for c in cols]
    return F.md5(F.concat_ws(FIELD_SEP, *cells, F.lit(salt)))


def content_address(col: Column, max_len: int = 32) -> Column:
    """F10/F11 — content-addressed artifact key.

    Reference ServiceAlertAugmenter.py:478-493: base64 of the name parts,
    falling back to sha256 when the encoded name exceeds ``max_len`` chars —
    keeps object keys bounded while staying deterministic (the artifact cache
    relies on key determinism, SURVEY §4).
    """
    b64 = F.base64(col.cast("binary"))
    return F.when(F.length(b64) <= max_len, b64).otherwise(F.sha2(col, 256))

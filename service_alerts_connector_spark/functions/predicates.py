"""P6 — config-predicate translator: pandas ``DataFrame.query`` dialect →
Spark SQL expression strings.

The reference stores recipient/feed predicates as pandas/numexpr query
strings in config objects (ServiceAlertEmailer.py:49-51, 636-670, e.g.
``"area_type != 'Citywide' and inferred_suburbs.astype('str').str.lower()
.str.contains('grassy\\Wpark')"``).  The engine keeps configs as strings —
they are *data* — but its predicate engine is Spark SQL, so legacy configs
pass through this one-time translator (SURVEY §7(g)).

Handled idioms (the complete set used by the reference's configs):

* ``a == b`` / ``!=`` / comparisons      → unchanged
* ``and`` / ``or`` / ``not`` / ``&`` ``|`` ``~``  → and/or/not
* ``col.str.contains('pat')``           → ``col rlike 'pat'``
* ``col.str.lower()`` / ``.str.strip()``→ ``lower(col)`` / ``trim(col)``
* ``col.astype('str')``                 → ``cast(col as string)``
* ``col.notna()`` / ``col.isna()``      → ``col is not null`` / ``col is null``
* ``col.isin([...])``                   → ``col in (...)``
* ``@var``                              → bound literal from ``env``

Translation is textual but anchored on a real tokenizer (Python's), not
regexes over raw strings — method chains are rewritten innermost-first.
"""

from __future__ import annotations

import io
import tokenize
from typing import Any


def _quote(v: Any) -> str:
    if isinstance(v, str):
        escaped = v.replace("'", "''")
        return f"'{escaped}'"
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, (list, tuple, set)):
        return "(" + ", ".join(_quote(x) for x in v) + ")"
    return repr(v)


def translate_pandas_query(expr: str, env: dict[str, Any] | None = None) -> str:
    """Translate one pandas query string to a Spark SQL boolean expression."""
    env = env or {}
    toks = list(tokenize.generate_tokens(io.StringIO(expr).readline))
    out: list[str] = []
    i = 0
    while i < len(toks):
        tok = toks[i]
        kind, val = tok.type, tok.string
        if kind in (tokenize.NEWLINE, tokenize.ENDMARKER, tokenize.NL, tokenize.INDENT):
            i += 1
            continue
        # @var → bound literal
        if kind == tokenize.OP and val == "@":
            name = toks[i + 1].string
            if name not in env:
                raise KeyError(f"@{name} not bound in env")
            out.append(_quote(env[name]))
            i += 2
            continue
        # method-chain rewriting: <expr>.str.contains / .lower() / ...
        if kind == tokenize.OP and val == "." and i + 1 < len(toks):
            meth = toks[i + 1].string
            if meth == "str":
                i += 2  # drop the .str accessor entirely
                continue
            if meth in ("lower", "upper", "strip"):
                fn = {"lower": "lower", "upper": "upper", "strip": "trim"}[meth]
                prev = out.pop()
                out.append(f"{fn}({prev})")
                i += 4  # skip . name ( )
                continue
            if meth == "astype":
                # .astype('str') → cast(x as string)
                prev = out.pop()
                target = toks[i + 3].string.strip("'\"")
                sql_t = {"str": "string", "int": "bigint", "float": "double"}.get(
                    target, target
                )
                out.append(f"cast({prev} as {sql_t})")
                i += 5  # . astype ( 'str' )
                continue
            if meth in ("notna", "notnull"):
                prev = out.pop()
                out.append(f"({prev} is not null)")
                i += 4
                continue
            if meth in ("isna", "isnull"):
                prev = out.pop()
                out.append(f"({prev} is null)")
                i += 4
                continue
            if meth == "contains":
                # x.contains('pat') → x rlike 'pat'   (after .str dropped)
                prev = out.pop()
                pat = toks[i + 3].string
                out.append(f"{prev} rlike {pat}")
                i += 5
                continue
            if meth == "isin":
                # x.isin([a, b]) → x in (a, b)
                prev = out.pop()
                j = i + 3  # after . isin (
                items: list[str] = []
                depth = 1
                while j < len(toks) and depth > 0:
                    t = toks[j]
                    if t.string in ("(", "["):
                        depth += 1
                    elif t.string in (")", "]"):
                        depth -= 1
                    elif t.string != "," and t.type in (
                        tokenize.STRING,
                        tokenize.NUMBER,
                        tokenize.NAME,
                    ):
                        items.append(t.string)
                    j += 1
                out.append(f"{prev} in ({', '.join(items)})")
                i = j
                continue
            # unknown method → fail loudly rather than mistranslate
            raise ValueError(f"unsupported pandas-query method: .{meth}")
        # boolean operators
        if kind == tokenize.OP and val in ("&", "|"):
            out.append({"&": "and", "|": "or"}[val])
            i += 1
            continue
        if kind == tokenize.OP and val == "~":
            out.append("not")
            i += 1
            continue
        out.append(val)
        i += 1
    return " ".join(x for x in out if x.strip())

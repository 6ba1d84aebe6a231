"""Property-style batch tests for the nasty scalar functions (SURVEY §7):
hundreds of adversarial generated inputs run through the Spark expressions in
ONE job each, compared against independent pure-Python reference
implementations."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from service_alerts_connector_spark.functions.cleaning import (
    clean_notification_number,
    coalesce_location,
    repair_time_string,
)

rng = random.Random(42)


def _gen_time_strings(n: int) -> list[str | None]:
    out: list[str | None] = [
        None, "", " ", "24:60", "23:60", "00:00", "9:30", "09:30 ",
        "Select...", "Select a time", "garbage", "12:345", "1:5", ":30",
        "25:10", "99:99", "12:60", "00:60",
    ]
    for _ in range(n):
        kind = rng.randrange(5)
        if kind == 0:
            out.append(f"{rng.randrange(30):02d}:{rng.randrange(70):02d}")
        elif kind == 1:
            out.append(f"{rng.randrange(24)}:{rng.randrange(60)}")
        elif kind == 2:
            out.append("".join(rng.choice("0123456789:xSelct. ") for _ in range(8)))
        elif kind == 3:
            out.append(f"  {rng.randrange(24):02d}:{rng.randrange(60):02d}  ")
        else:
            out.append(None)
    return out


def _ref_repair(s: str | None) -> str | None:
    """Independent reimplementation of repair_time_string's contract."""
    if s is None:
        return None
    t = s.strip()
    t = re.sub(r":60$", ":59", t)
    t = re.sub(r"^Select.*$", "00:00", t)
    return t if re.fullmatch(r"[0-9]{2}:[0-9]{2}", t) else None


def test_time_repair_property(spark):
    cases = _gen_time_strings(400)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, t string"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", repair_time_string(F.col("t")).alias("out")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _ref_repair(c), f"case {c!r}: {got[i]!r}"


def _gen_refs(n: int) -> list[str | None]:
    out: list[str | None] = [
        None, "", "n/a", "9116963417", " 9116963417 ", "12345", "0000000000",
        "91169634170", "911696341", "abcdefghij", "9116963417x",
    ]
    for _ in range(n):
        out.append(
            "".join(rng.choice("0123456789abc /") for _ in range(rng.randrange(1, 14)))
        )
    return out


def _ref_notification(s: str | None) -> str | None:
    if s is None:
        return None
    t = s.strip()
    if re.fullmatch(r"[0-9]{10}", t):
        return f"{int(t):012d}"
    return None


def test_notification_number_property(spark):
    cases = _gen_refs(300)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, s string"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", clean_notification_number(F.col("s")).alias("out")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _ref_notification(c), f"case {c!r}"


def _ref_location(loc, desc, sel):
    def blank(x):
        return x is None
    if not blank(loc):
        l, d = loc.strip(), (desc or "").strip()
        n = min(len(l), len(d))
        prefix_dup = (not blank(desc)) and l[:n] == d[:n]
        if not prefix_dup:
            return l
    if sel is not None and sel.strip() != "":
        return sel.strip()
    return None


def test_location_coalesce_property(spark):
    words = ["Main Rd", "Main Road corner", "", "  ", None, "Kloof St",
             "Kloof", "corner of Kloof St", "x"]
    cases = []
    for _ in range(300):
        cases.append(
            (rng.choice(words), rng.choice(words), rng.choice(words))
        )
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        "i long, loc string, descr string, sel string",
    )
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i",
            coalesce_location(
                F.col("loc"), F.col("descr"), F.col("sel")
            ).alias("out"),
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _ref_location(*c), f"case {c!r}: got {got[i]!r}"


def test_checksum_insensitive_to_row_order(spark):
    """F9 stability: checksums are a pure function of cell values — row
    order, partitioning, and recomputation must not change them."""
    from service_alerts_connector_spark.operators.incremental import (
        with_checksum,
    )

    rows = [(i, f"title {i % 7}", None if i % 5 == 0 else f"d{i}") for i in range(200)]
    df1 = spark.createDataFrame(rows, "Id long, title string, descr string")
    df2 = spark.createDataFrame(
        list(reversed(rows)), "Id long, title string, descr string"
    ).repartition(7)
    cs1 = {
        r["Id"]: r["InputChecksum"]
        for r in with_checksum(df1, ["title", "descr"], "s").collect()
    }
    cs2 = {
        r["Id"]: r["InputChecksum"]
        for r in with_checksum(df2, ["title", "descr"], "s").collect()
    }
    assert cs1 == cs2


def test_deterministic_uuid_shape_and_stability(spark):
    """F18: uuid-shaped, content-derived, stable across runs/partitioning."""
    import re

    from pyspark.sql import functions as F

    from service_alerts_connector_spark.functions.ids import (
        deterministic_uuid,
    )

    df = spark.createDataFrame(
        [(i, f"cfg{i % 3}") for i in range(50)], "Id long, cfg string"
    )
    u1 = {
        r["Id"]: r["u"]
        for r in df.select(
            "Id", deterministic_uuid(F.col("cfg"), F.col("Id")).alias("u")
        ).collect()
    }
    u2 = {
        r["Id"]: r["u"]
        for r in df.repartition(7)
        .select("Id", deterministic_uuid(F.col("cfg"), F.col("Id")).alias("u"))
        .collect()
    }
    assert u1 == u2
    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
    assert all(pat.match(v) for v in u1.values())
    assert len(set(u1.values())) == 50  # distinct keys, distinct ids

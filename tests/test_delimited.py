"""CSV/JSONL ingest gate (sources/delimited.py): corrupt-record quarantine."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from service_alerts_connector_spark.sources.delimited import (
    CORRUPT_COL,
    read_csv_quarantine,
    read_jsonl,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
    ]
)


def test_jsonl_splits_good_and_corrupt(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        "{broken json\n"
        '{"id": 2, "name": "b"}\n'
        '{"id": "not_a_number", "name": "c"}\n'  # type failure -> null id
    )
    good, bad = read_jsonl(spark, str(p), SCHEMA, required=["id"])
    assert sorted((r["id"], r["name"]) for r in good.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    quarantined = bad.collect()
    assert len(quarantined) == 2
    # raw text preserved for replay
    raws = {r[CORRUPT_COL] for r in quarantined}
    assert any("broken json" in (x or "") for x in raws)


def test_jsonl_all_good_empty_quarantine(spark, tmp_path):
    p = tmp_path / "ok.jsonl"
    p.write_text('{"id": 1, "name": "a"}\n{"id": 2, "name": null}\n')
    good, bad = read_jsonl(spark, str(p), SCHEMA, required=["id"])
    assert good.count() == 2  # null in a non-required column is fine
    assert bad.count() == 0


def test_csv_quarantine_and_extra_fields(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name\n"
        "1,a\n"
        "oops,b\n"      # type failure -> null id, quarantined via required
        "2,c\n"
    )
    good, bad = read_csv_quarantine(spark, str(p), SCHEMA, required=["id"])
    assert sorted((r["id"], r["name"]) for r in good.collect()) == [
        (1, "a"),
        (2, "c"),
    ]
    assert bad.count() == 1


def test_capture_column_collision_rejected(spark, tmp_path):
    clash = StructType([StructField(CORRUPT_COL, StringType(), True)])
    with pytest.raises(ValueError):
        read_jsonl(spark, str(tmp_path), clash)

"""Contract tests for the import-gated Delta Lake MERGE seam.

The container has no delta-spark, so the ``DeltaTable.merge`` branch of
``sources/lakehouse.py`` would otherwise be dead code in CI.  Same
discipline as tests/test_sedona_contract.py:

* the import gate itself, via an injected mock ``delta.tables`` module +
  module reload;
* the Delta branch's merge construction (join condition, matched-update
  condition, both clauses, execute) via a recording mock;
* the fallback branch end-to-end on a real versioned store, asserted
  equal to ``operators.dedup.upsert`` — the semantics both branches
  promise.
"""

from __future__ import annotations

import importlib
import sys
import types

from pyspark.sql import functions as F

from service_alerts_connector_spark.sources import lakehouse


class _RecordingMerge:
    def __init__(self, log):
        self.log = log

    def whenMatchedUpdateAll(self, condition=None):
        self.log.append(("whenMatchedUpdateAll", condition))
        return self

    def whenNotMatchedInsertAll(self):
        self.log.append(("whenNotMatchedInsertAll", None))
        return self

    def execute(self):
        self.log.append(("execute", None))


class _RecordingTable:
    def __init__(self, log):
        self.log = log

    def alias(self, a):
        self.log.append(("target_alias", a))
        return self

    def merge(self, source, cond):
        self.log.append(("merge_cond", cond))
        return _RecordingMerge(self.log)


def test_import_gate_flips_with_mock_delta(monkeypatch):
    """Injecting a mock delta.tables module and reloading must flip
    HAVE_DELTA on; removing it flips it back off."""
    mod_tables = types.ModuleType("delta.tables")
    mod_tables.DeltaTable = object
    mod_delta = types.ModuleType("delta")
    mod_delta.tables = mod_tables
    monkeypatch.setitem(sys.modules, "delta", mod_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", mod_tables)
    importlib.reload(lakehouse)
    try:
        assert lakehouse.HAVE_DELTA is True
    finally:
        monkeypatch.delitem(sys.modules, "delta.tables")
        monkeypatch.delitem(sys.modules, "delta")
        importlib.reload(lakehouse)
    assert lakehouse.HAVE_DELTA is False


def test_delta_branch_builds_the_right_merge(spark, tmp_path, monkeypatch):
    """With a recording DeltaTable, the Delta branch must construct
    MERGE on the key equality, update-matched gated on the order column
    (ties to the new batch), insert-unmatched, then execute."""
    log: list[tuple] = []

    class FakeDeltaTable:
        @staticmethod
        def forPath(sess, path):
            log.append(("forPath", path))
            return _RecordingTable(log)

    monkeypatch.setattr(lakehouse, "DeltaTable", FakeDeltaTable, raising=False)
    updates = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 3), (2, "c", 1)],
        "Id long, v string, _ingest_seq long",
    )
    lakehouse.merge_upsert_dataset(
        spark, str(tmp_path), "gold", updates, key="Id", use_delta=True
    )
    ops = [op for op, _ in log]
    assert ops == [
        "forPath", "target_alias", "merge_cond",
        "whenMatchedUpdateAll", "whenNotMatchedInsertAll", "execute",
    ]
    assert log[0][1] == f"{tmp_path}/gold"
    assert log[2][1] == "t.`Id` = u.`Id`"
    assert log[3][1] == "u.`_ingest_seq` >= t.`_ingest_seq`"


def test_fallback_merge_matches_upsert(spark, tmp_path):
    """The parquet fallback must materialize exactly
    operators.dedup.upsert(old, new) — last-wins per key, new batch
    preferred on order ties — across two merge rounds."""
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
    )

    root = str(tmp_path)
    b1 = spark.createDataFrame(
        [(1, "a1", 1), (2, "b1", 1)], "Id long, v string, _ingest_seq long"
    )
    lakehouse.merge_upsert_dataset(spark, root, "gold", b1, key="Id")
    # batch 2: updates Id 1 (higher seq), ties Id 2 (same seq -> new wins),
    # inserts Id 3, and carries an intra-batch dup for Id 3 (seq 2 beats 1)
    b2 = spark.createDataFrame(
        [(1, "a2", 5), (2, "b2", 1), (3, "c1", 1), (3, "c2", 2)],
        "Id long, v string, _ingest_seq long",
    )
    lakehouse.merge_upsert_dataset(spark, root, "gold", b2, key="Id")

    got = {
        r["Id"]: (r["v"], r["_ingest_seq"])
        for r in read_dataset(spark, root, "gold").collect()
    }
    assert got == {1: ("a2", 5), 2: ("b2", 1), 3: ("c2", 2)}
    assert len(list_versions(root, "gold")) == 2  # one version per merge


def test_fallback_lower_seq_does_not_clobber(spark, tmp_path):
    """A late-arriving batch with an OLDER order value must not overwrite
    the stored row (the whenMatchedUpdateAll condition, in fallback form)."""
    from service_alerts_connector_spark.sources.parquet_io import read_dataset

    root = str(tmp_path)
    lakehouse.merge_upsert_dataset(
        spark, root, "gold",
        spark.createDataFrame([(1, "new", 9)], "Id long, v string, _ingest_seq long"),
        key="Id",
    )
    lakehouse.merge_upsert_dataset(
        spark, root, "gold",
        spark.createDataFrame([(1, "stale", 3)], "Id long, v string, _ingest_seq long"),
        key="Id",
    )
    rows = read_dataset(spark, root, "gold").collect()
    assert [(r["Id"], r["v"]) for r in rows] == [(1, "new")]

"""Empty-input robustness: every round-2 operator must return an empty
(or well-defined) result on an empty frame, never raise."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_text_operators_on_empty_corpus(spark):
    from service_alerts_connector_spark.operators.boilerplate import (
        remove_frequent_lines,
    )
    from service_alerts_connector_spark.operators.chunking import (
        chunk_documents,
        source_quota,
    )
    from service_alerts_connector_spark.operators.tfidf import (
        inverted_index,
        tfidf_top_terms,
    )

    docs = _empty_docs(spark)
    assert chunk_documents(docs).count() == 0
    assert tfidf_top_terms(docs).count() == 0
    assert inverted_index(docs).count() == 0
    assert remove_frequent_lines(docs, "doc_id", "text").count() == 0
    docs2 = spark.createDataFrame([], "doc_id long, source string")
    assert source_quota(docs2).count() == 0


def test_sketch_operators_on_empty_input(spark):
    from service_alerts_connector_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
        source_mixing,
    )

    keys = spark.createDataFrame([], "k string")
    sketch = count_min_sketch(keys, "k")
    assert sketch.count() == 0
    probe = spark.createDataFrame([("x",)], "k string")
    est = cms_estimate(sketch, probe, "k").collect()
    assert est[0]["est_n"] == 0  # empty sketch -> zero estimate, not error
    docs = spark.createDataFrame([], "doc_id long, source string")
    config = spark.createDataFrame([("s", 100)], "source string, keep_per_65536 long")
    assert source_mixing(docs, config).count() == 0


def test_similarity_on_empty_pairs_and_scd(spark):
    import pytest

    from service_alerts_connector_spark.operators.scd import (
        scd2_from_changelog,
    )
    from service_alerts_connector_spark.operators.similarity import (
        _infer_dim,
        embedding_near_dup_pairs,
    )
    from service_alerts_connector_spark.operators.textdedup import (
        connected_components,
    )

    ev = spark.createDataFrame([], "ts long, uid long, st string")
    assert scd2_from_changelog(ev, "uid", "st", "ts", "ts").count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="cannot infer dim"):
        embedding_near_dup_pairs(emb)  # explicit error, not a silent crash

"""The mapInPandas feature path (x10) must equal the pure-SQL twin (x11)."""

from __future__ import annotations

from data_pipeline_foundations_spark.registry import all_queries


def test_pandas_path_equals_sql_path(spark, sf_dir):
    qs = all_queries()
    a = qs["x10_multimodal_features"].fn(spark, sf_dir).toPandas()
    b = qs["x11_multimodal_features_sql"].fn(spark, sf_dir).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)[sorted(a.columns)]
    b = b.sort_values("doc_id").reset_index(drop=True)[sorted(b.columns)]
    assert a.equals(b)


def test_decode_stub_raises(spark):
    import pytest

    from data_pipeline_foundations_spark.operators.multimodal import decode_image
    with pytest.raises(NotImplementedError):
        decode_image(b"not-an-image")

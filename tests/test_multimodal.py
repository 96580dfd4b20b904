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


def test_resize_plumbing(spark, sf_dir):
    """Resize: schema, determinism, 1:1 cardinality, batch vectorization."""
    import hashlib

    from data_pipeline_foundations_spark.operators.multimodal import (
        attach_binary, resize_images,
    )
    from data_pipeline_foundations_spark.tables import load
    docs = load(spark, sf_dir, "documents").limit(50)
    out = resize_images(attach_binary(docs), width=128, height=64)
    rows = out.collect()
    assert len(rows) == 50
    src = {r.doc_id: r.text for r in docs.collect()}
    for r in rows[:5]:
        expected = hashlib.md5(src[r.doc_id].encode() + b"|128x64").hexdigest()
        assert r.resized_md5 == expected
        assert r.target_w == 128 and r.target_h == 64
        assert r.n_bytes == len(src[r.doc_id].encode())


def test_frame_sampling_cardinality(spark, sf_dir):
    """Frame sampling: row-expanding output, stride slicing, cap."""
    import hashlib

    from data_pipeline_foundations_spark.operators.multimodal import (
        attach_binary, sample_frames,
    )
    from data_pipeline_foundations_spark.tables import load
    docs = load(spark, sf_dir, "documents").limit(20)
    out = sample_frames(attach_binary(docs), every_n_bytes=64, max_frames=8)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_md5))
    src = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert set(got) == set(src)
    for doc_id, frames in got.items():
        b = src[doc_id]
        n_expected = min(8, max(1, -(-len(b) // 64)))
        assert len(frames) == n_expected
        frames.sort()
        for i, (idx, md5) in enumerate(frames):
            assert idx == i
            assert md5 == hashlib.md5(b[i * 64:(i + 1) * 64]).hexdigest()


def test_decode_stub_is_gated():
    from data_pipeline_foundations_spark.operators.multimodal import decode_image
    try:
        import PIL  # noqa: F401
    except ImportError:
        import pytest
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG fake")

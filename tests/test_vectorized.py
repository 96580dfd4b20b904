"""Arrow kernel == SQL twin equality pins (the quantized-embedding
contract's load-bearing claim): for every similarity operator with a
vectorized path, the Arrow kernel must produce BIT-IDENTICAL rows to the
pure-HOF formulation — not approximately, exactly — because registry
queries run the kernel while the DuckDB oracle mirrors the SQL twin.
Exactness holds because every reduction is an int64 sum and every float
is derived from exact ints by identically-rounded IEEE ops."""

from __future__ import annotations

import pytest

from data_pipeline_foundations_spark.operators.caching import (
    release_cached_intermediates,
)
from data_pipeline_foundations_spark.operators.similarity import (
    cosine_near_dup_pairs, ivf_topk, pq_topk, srp_bucket_neighbors,
)
from data_pipeline_foundations_spark.tables import load


def _rows(df):
    out = sorted(tuple(r) for r in df.collect())
    release_cached_intermediates()
    return out


@pytest.mark.parametrize("op,kwargs", [
    (srp_bucket_neighbors, {}),
    (cosine_near_dup_pairs, {"threshold": 0.4}),
    (ivf_topk, {}),
    (pq_topk, {}),
], ids=["srp", "near_dup", "ivf", "pq"])
def test_arrow_equals_sql_twin(spark, sf_dir, op, kwargs):
    emb = load(spark, sf_dir, "embeddings")
    arrow = _rows(op(emb, arrow=True, **kwargs))
    sql = _rows(op(emb, arrow=False, **kwargs))
    assert arrow == sql  # bit-identical, floats included


def test_minhash_arrow_equals_sql_twin(spark, sf_dir):
    """The r5 MinHash kernel (hashlib md5 + numpy modular arithmetic +
    inline candidate estimation) must reproduce the HOF/join formulation
    bit-for-bit — including est_jaccard's single IEEE division."""
    from data_pipeline_foundations_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    docs = load(spark, sf_dir, "documents")
    arrow = _rows(minhash_lsh_pairs(docs, arrow=True))
    sql = _rows(minhash_lsh_pairs(docs, arrow=False))
    assert arrow == sql and len(arrow) > 0


def test_zero_norm_inputs_fail_loudly(spark):
    """Degenerate (zero-norm) vectors and centroids must raise, not
    silently NaN-route (ADVICE r9): 0/0 cosines make np.argmax pick the
    first NaN index while the SQL twin's NULL ordering differs, so the
    bit-for-bit contract would break without any signal. All three IVF
    kernels reject them — centroids at closure build, vectors in-kernel."""
    import numpy as np
    import pytest as _pt
    from pyspark.sql import functions as F

    from data_pipeline_foundations_spark.operators.vectorized import (
        ivf_assign_hier_udf, ivf_assign_udf, ivf_cos_udf,
    )

    good = [{"cid": i, "cv": [int(1e6) * (i + 1), 7 * i], "cn2":
             int(1e12) * (i + 1) ** 2 + 49 * i * i} for i in range(4)]
    zero_cent = good[:3] + [{"cid": 3, "cv": [0, 0], "cn2": 0}]
    with _pt.raises(ValueError, match="zero-norm centroid"):
        ivf_assign_udf(zero_cent, 1e6)
    with _pt.raises(ValueError, match="zero-norm centroid"):
        ivf_assign_hier_udf(zero_cent, 2, 1e6)
    with _pt.raises(ValueError, match="zero-norm query"):
        ivf_cos_udf(good, [[0]], [[0, 0]], 1e6)

    # zero-norm INPUT vector: quantizes to (0,0) -> the kernel raises on
    # the executor, surfacing as a PythonException wrapping ValueError
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1e-9, -1e-9])],
        "vec_id long, embedding array<double>")
    flat = ivf_assign_udf(good, 1e6)
    with _pt.raises(Exception, match="zero-norm input vector"):
        df.select(flat(F.col("embedding"))).collect()
    # and the non-degenerate frame still assigns fine after the guard
    ok = df.filter("vec_id = 0").select(
        flat(F.col("embedding")).alias("cid")).collect()
    assert len(ok) == 1 and ok[0].cid in {0, 1, 2, 3}
    assert np.all(np.isfinite([ok[0].cid]))

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

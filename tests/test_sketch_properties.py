"""Property-based verification of the KMV sketch (x90 family).

Hypothesis generates arbitrary (stratum, value) multisets and arbitrary
3-way splits of them; the sketch built any way — whole, split-and-merged
in either association order, with duplicates present — must equal the
Python ground truth ``sorted(set(values))[:k]`` per stratum, and the
pairwise Jaccard estimator must be exact whenever k covers the union
(the saturated regime where the estimator degenerates to truth).
One Spark job evaluates each batch; k is kept small so the property
exercises the truncation path, not just the saturated one.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from data_pipeline_foundations_spark.operators.sketches import (
    kmv_jaccard, kmv_merge, kmv_sketch,
)

vals = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=0, max_value=60)),
    min_size=1, max_size=120)
cuts = st.tuples(st.integers(0, 2 ** 30), st.integers(0, 2 ** 30))


def _truth(rows, k):
    out = {}
    for s, v in rows:
        out.setdefault(s, set()).add(v)
    return {s: sorted(vs)[:k] for s, vs in out.items()}


@settings(max_examples=15, deadline=None)
@given(vals, cuts)
def test_kmv_any_split_any_order_equals_python_truth(spark, rows, cut):
    k = 8
    df = spark.createDataFrame(
        [(s, v, i) for i, (s, v) in enumerate(rows)],
        "stratum string, v long, i long").repartition(5)
    # arbitrary disjoint 3-way split by row index
    c0, c1 = sorted((cut[0] % len(rows), cut[1] % len(rows)))
    parts = [df.filter(f"i < {c0}"),
             df.filter(f"i >= {c0} and i < {c1}"),
             df.filter(f"i >= {c1}")]
    sk = [kmv_sketch(p, key_col="v", strata_col="stratum", k=k)
          for p in parts]
    left = kmv_merge(kmv_merge(sk[0], sk[1], k=k), sk[2], k=k)
    right = kmv_merge(sk[0], kmv_merge(sk[2], sk[1], k=k), k=k)
    whole = kmv_sketch(df, key_col="v", strata_col="stratum", k=k)
    truth = _truth(rows, k)
    for got in (left, right, whole):
        assert {r["stratum"]: list(r["sk"])
                for r in got.collect()} == truth


@settings(max_examples=10, deadline=None)
@given(vals)
def test_kmv_jaccard_exact_when_saturated(spark, rows):
    k = 200  # > max distinct values (61) -> sketch IS the set
    df = spark.createDataFrame(rows, "stratum string, v long")
    sk = kmv_sketch(df, key_col="v", strata_col="stratum", k=k)
    est = kmv_jaccard(sk, k=k).collect()
    sets = {}
    for s, v in rows:
        sets.setdefault(s, set()).add(v)
    for r in est:
        a, b = sets[r["stratum_a"]], sets[r["stratum_b"]]
        assert r["k_eff"] == len(a | b)
        assert r["n_both"] == len(a & b)
        assert r["jaccard_est"] == len(a & b) / len(a | b)

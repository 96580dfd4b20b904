"""connected_components / dedup_clusters unit behavior: transitive
closure, singletons, deterministic canonical choice, convergence cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_foundations_spark.operators.caching import (
    persistent_rdd_ids, release_cached_intermediates,
)
from data_pipeline_foundations_spark.operators.clustering import (
    connected_components, dedup_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def _docs(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_chain_collapses_to_min(spark):
    # 0-1-2-3 chain: diameter 3, all should label 0
    comp = connected_components(_docs(spark, 4),
                                _pairs(spark, [(0, 1), (1, 2), (2, 3)]))
    got = {r.doc_id: r.cluster_id for r in comp.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


def test_components_and_singletons(spark):
    comp = connected_components(_docs(spark, 6),
                                _pairs(spark, [(1, 4), (2, 5)]))
    got = {r.doc_id: r.cluster_id for r in comp.collect()}
    assert got == {0: 0, 1: 1, 4: 1, 2: 2, 5: 2, 3: 3}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="fixed point not reached"):
        connected_components(_docs(spark, 4),
                             _pairs(spark, [(0, 1), (1, 2), (2, 3)]),
                             max_rounds=1,
                             small_graph_edges=0)  # force the iterative path


def test_path_graph_converges_in_log_rounds(spark):
    """The r2 verdict's scale gap: one-hop min-label propagation needs
    O(diameter) rounds — a 5000-vertex path would blow the 25-round cap.
    Large-star/small-star must finish it in ~⌈log₂ n⌉ rounds; the cap
    here IS the assertion (non-convergence raises)."""
    import math
    n = 5_000
    docs = _docs(spark, n)
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    cap = math.ceil(math.log2(n)) + 4     # 13 + slack
    comp = connected_components(docs, edges, max_rounds=cap,
                                small_graph_edges=0)  # exercise contraction
    assert comp.filter(F.col("cluster_id") != 0).count() == 0
    assert comp.count() == n
    release_cached_intermediates()


def test_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir= switches per-round snapshots to Spark's reliable
    checkpoint: same labels, and the checkpoint files actually land in
    the caller-owned directory (they survive executor death — the
    documented trade vs localCheckpoint)."""
    import os
    ckpt = str(tmp_path / "cc_ckpt")
    comp = connected_components(
        _docs(spark, 5), _pairs(spark, [(0, 1), (1, 2), (3, 4)]),
        checkpoint_dir=ckpt)
    got = {r.doc_id: r.cluster_id for r in comp.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}
    found = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert found, "no reliable checkpoint files written"


def test_dedup_clusters_canonical_and_sizes(spark):
    out = dedup_clusters(_docs(spark, 5),
                         _pairs(spark, [(0, 3), (3, 4)]))
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].cluster_size == 3 and rows[0].is_canonical == 1
    assert rows[3].cluster_id == 0 and rows[3].is_canonical == 0
    assert rows[4].cluster_id == 0 and rows[4].is_canonical == 0
    assert rows[1].cluster_size == 1 and rows[1].is_canonical == 1
    assert rows[2].cluster_size == 1 and rows[2].is_canonical == 1


def test_checkpoints_are_reclaimed(spark):
    """Per-round checkpoints die as the iteration advances; the final
    label snapshot (which backs the result) is reclaimed by the session's
    release call — net storage growth is zero. Raised non-convergence
    must clean up everything itself."""
    sc = spark.sparkContext
    release_cached_intermediates()          # drain leftovers from other tests
    before = persistent_rdd_ids(sc)
    comp = dedup_clusters(_docs(spark, 4), _pairs(spark, [(0, 1), (1, 2)]))
    comp.count()
    leftover = persistent_rdd_ids(sc) - before
    # only the edge list (read by the result's singleton branch) and the
    # final label snapshot survive the iteration
    assert len(leftover) <= 2
    release_cached_intermediates()
    assert persistent_rdd_ids(sc) <= before
    with pytest.raises(RuntimeError):
        connected_components(_docs(spark, 4),
                             _pairs(spark, [(0, 1), (1, 2), (2, 3)]),
                             max_rounds=1, small_graph_edges=0)
    assert persistent_rdd_ids(sc) <= before


def test_random_graphs_match_union_find(spark):
    """Differential check of large-star/small-star against a driver-side
    union-find on seeded random graphs (self-loops, duplicate and
    reversed edges included) — the fixed cases above can't cover the
    contraction's odd intermediate shapes."""
    import random
    rng = random.Random(20240813)
    for _ in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        roots = {}
        want = {}
        for v in range(n):
            r = find(v)
            roots.setdefault(r, v)          # first-seen = min since v ascends
            want[v] = min(roots[r], v)
            roots[r] = want[v]
        # second pass so every member sees the final min
        want = {v: want[find(v)] for v in range(n)}

        for sge in (0, 100_000):   # distributed contraction AND fast path
            comp = connected_components(_docs(spark, n),
                                        _pairs(spark, edges),
                                        small_graph_edges=sge)
            got = {r.doc_id: r.cluster_id for r in comp.collect()}
            release_cached_intermediates()
            assert got == want, sge


def test_string_ids_both_paths(spark):
    """ADVICE r4: the driver fast path must not assume long ids. String
    vertex ids run through BOTH the union-find fast path and the
    distributed contraction with identical labels (min = lexicographic
    minimum, Spark's string ordering)."""
    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], "doc_id string")
    pairs = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("e", "d")], "doc_a string, doc_b string")
    want = {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}
    fast = connected_components(docs, pairs)
    assert {r.doc_id: r.cluster_id for r in fast.collect()} == want
    dist = connected_components(docs, pairs, small_graph_edges=0)
    assert {r.doc_id: r.cluster_id for r in dist.collect()} == want


def test_non_orderable_id_type_falls_through(spark):
    """A vertex id type Python cannot order consistently with Spark
    (e.g. date) skips the driver fast path and still resolves through
    the distributed contraction."""
    import datetime as dt
    d0, d1, d2 = (dt.date(2024, 1, 1), dt.date(2024, 1, 2),
                  dt.date(2024, 1, 3))
    docs = spark.createDataFrame([(d0,), (d1,), (d2,)], "doc_id date")
    pairs = spark.createDataFrame([(d2, d1)], "doc_a date, doc_b date")
    comp = connected_components(docs, pairs)
    got = {r.doc_id: r.cluster_id for r in comp.collect()}
    assert got == {d0: d0, d1: d1, d2: d1}

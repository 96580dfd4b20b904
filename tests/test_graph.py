"""PageRank (operators/graph.py): fast-path/distributed equivalence and
exact-arithmetic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_foundations_spark.operators.graph import (
    PR_SCALE, pagerank_topk,
)


def _edges(spark):
    # a small digraph with a hub (0), a chain, and a dangling sink (9)
    rows = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1), (1, 2), (2, 3),
            (3, 4), (4, 5), (5, 6), (6, 7), (7, 8), (8, 9), (0, 9)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_fastpath_equals_distributed(spark):
    """The driver loop (<=100k edges) and the iterative join/agg plan
    produce bit-identical integer ranks — the union-find precedent."""
    e = _edges(spark)
    fast = [(r.page, r.rank_q, r.rank)
            for r in pagerank_topk(e, k=100).collect()]
    dist = [(r.page, r.rank_q, r.rank)
            for r in pagerank_topk(e, k=100,
                                   small_graph_edges=0).collect()]
    assert fast == dist
    assert len(fast) == 10


def test_pagerank_sink_and_hub_rank_highest(spark):
    top = pagerank_topk(_edges(spark), k=3).collect()
    # 9 is the dangling sink fed by 8's whole mass AND half of the
    # hub's; 0 is the four-in-link hub — they must lead the ranking
    assert {top[0].page, top[1].page} == {9, 0}
    assert all(r.rank_q > 0 for r in top)
    assert all(abs(r.rank - r.rank_q / PR_SCALE) == 0.0 for r in top)


def test_pagerank_mass_bounded(spark):
    """Floored contributions + dropped dangling mass mean total rank is
    <= scale and strictly positive; ordering is fully deterministic."""
    out = pagerank_topk(_edges(spark), k=100).collect()
    total = sum(r.rank_q for r in out)
    assert 0 < total <= PR_SCALE
    ranks = [(r.rank_q, r.page) for r in out]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))


def test_pagerank_query_matches_oracle_shape(spark, sf_dir):
    from data_pipeline_foundations_spark.registry import all_queries
    df = all_queries()["x65_domain_pagerank"].fn(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert df.columns == ["page", "rank_q", "rank"]
    assert all(isinstance(r.rank_q, int) for r in rows)


def test_pagerank_string_ids_and_empty_graph(spark):
    """Fast path preserves the input id type (string hosts work on both
    paths with identical results); an empty edge set returns an empty,
    correctly-typed frame instead of dividing by zero."""
    e = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com"),
         ("b.com", "a.com")], "src string, dst string")
    fast = [(r.page, r.rank_q) for r in pagerank_topk(e, k=10).collect()]
    dist = [(r.page, r.rank_q) for r in
            pagerank_topk(e, k=10, small_graph_edges=0).collect()]
    assert fast == dist
    assert all(isinstance(p, str) for p, _ in fast)

    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank_topk(empty, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["page", "rank_q", "rank"]


def test_pagerank_properties_random_graphs(spark):
    """Hypothesis sweep over random digraphs: mass stays bounded by the
    grid scale, every rank is positive, output covers every node, and
    the ordering key is total. (Fast path only — the fixed-graph
    differential test pins fast == distributed.)"""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12))
        .filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=40, unique=True))
    def run(edges):
        e = spark.createDataFrame(edges, "src long, dst long")
        out = pagerank_topk(e, k=100).collect()
        nodes = {a for a, _ in edges} | {b for _, b in edges}
        assert {r.page for r in out} == nodes
        total = sum(r.rank_q for r in out)
        assert 0 < total <= PR_SCALE
        assert all(r.rank_q > 0 for r in out)
        keys = [(-r.rank_q, r.page) for r in out]
        assert keys == sorted(keys)

    run()


def test_pagerank_heterogeneous_id_types_normalize_to_string(spark):
    """ADVICE r6/r7: src long + dst string normalizes BOTH endpoints to
    string up front — never Python-sorting int against str, never
    joining string=bigint via double (ids > 2^53 would collide), and an
    EMPTY het graph gets the same string-typed `page` schema as a
    non-empty one. Ranks match the homogeneous-long run bit-exactly."""
    from data_pipeline_foundations_spark.operators.graph import (
        pagerank_topk,
    )
    edges = [(1, 2), (2, 3), (3, 1), (4, 1)]
    homo = pagerank_topk(spark.createDataFrame(
        edges, "src long, dst long"), k=10).collect()
    het_df = pagerank_topk(spark.createDataFrame(
        [(s, str(d)) for s, d in edges], "src long, dst string"), k=10)
    het = het_df.collect()
    assert het_df.schema["page"].dataType.typeName() == "string"
    assert {(str(r.page), r.rank_q) for r in homo} == \
        {(r.page, r.rank_q) for r in het}
    # fast path and distributed path agree on the normalized ids too
    het_dist = pagerank_topk(spark.createDataFrame(
        [(s, str(d)) for s, d in edges], "src long, dst string"),
        k=10, small_graph_edges=0).collect()
    assert [(r.page, r.rank_q) for r in het] == \
        [(r.page, r.rank_q) for r in het_dist]
    # empty het graph: schema matches the non-empty het schema (string)
    empty_het = pagerank_topk(spark.createDataFrame(
        [], "src long, dst string"), k=5)
    assert empty_het.schema["page"].dataType.typeName() == "string"
    assert empty_het.count() == 0


def test_pagerank_large_het_ids_join_exactly(spark):
    """Ids above 2^53 (where double coercion loses precision) must not
    collide: two adjacent huge ids stay distinct nodes with distinct
    ranks through the het distributed path."""
    from data_pipeline_foundations_spark.operators.graph import (
        pagerank_topk,
    )
    big = 2 ** 60
    edges = [(big, big + 1), (big + 1, big), (big + 2, big)]
    het = pagerank_topk(spark.createDataFrame(
        [(s, str(d)) for s, d in edges], "src long, dst string"),
        k=10, small_graph_edges=0).collect()
    pages = {r.page for r in het}
    assert pages == {str(big), str(big + 1), str(big + 2)}
    homo = pagerank_topk(spark.createDataFrame(
        edges, "src long, dst long"), k=10).collect()
    assert {(str(r.page), r.rank_q) for r in homo} == \
        {(r.page, r.rank_q) for r in het}

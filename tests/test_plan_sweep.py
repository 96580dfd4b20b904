"""Whole-registry physical-plan sweep.

VERDICT r3 verified by hand that no registered plan contains a cartesian
product, an unbounded nested-loop join, or a row-at-a-time Python UDF.
This test makes that invariant permanent: every registered query is
PLANNED (not executed — initial physical plan, cheap) and screened.

BroadcastNestedLoopJoin is allowed only for the documented scalar
attaches — a broadcast side of one row (corpus stats, centroid array,
HLL register row, stratum-max row) or of n_queries≈10 rows under a
non-equi self-exclusion predicate (x07). Anything new that plans a BNLJ
or CartesianProduct must either justify itself onto this whitelist or
restructure into an equi-join.
"""

from __future__ import annotations

from data_pipeline_foundations_spark.registry import all_queries

# query -> why a BroadcastNestedLoopJoin is legitimate here
BNLJ_WHITELIST = {
    "x07_cosine_topk": "broadcast of n_queries rows, non-equi self-exclusion",
    "x24_bm25_topk": "single broadcast corpus-stats row",
    "x27_hll_distinct": "single broadcast register row",
    "x38_temperature_resample": "single broadcast stratum-max row",
    "x51_bigram_nll": "single broadcast vocabulary-size row",
    "x57_corpus_datasheet": "single-row stats/vocab/quantile attaches",
    "x58_negative_pairs": "single broadcast corpus-size row",
    "x59_token_budget_waterfill": "single broadcast water-level row",
    "x72_feature_hash_topk": "broadcast of n_queries rows, non-equi "
                             "self-exclusion (x07's shape)",
    "x73_embedding_coverage": "single broadcast orphan-count row",
    "x74_quality_classifier_trained": "single broadcast class-totals row "
                                      "(training normalizer)",
    "q22_global_sales_opportunity": "single broadcast avg-acctbal row "
                                    "(TPC-H Q22 scalar subquery)",
    "q11_important_parts": "single broadcast grand-total row "
                           "(TPC-H Q11 scalar fraction threshold)",
    "x81_rrf_hybrid_retrieval": "composes x24 (corpus-stats row) and x07 "
                                "(n_queries non-equi broadcast) — the two "
                                "retrievers' documented scalar attaches",
    "x84_shard_shuffle": "single broadcast shard-count row",
    "x88_vocab_growth": "single broadcast corpus-size row",
    "x89_tfidf_keywords": "single broadcast corpus-size row (idf N)",
    "x91_label_centroid_map": "broadcast of <=|labels| centroid rows "
                              "under the non-equi < pairing predicate "
                              "(x07's shape, dimension-sized)",
    # x61_ann_recall left the list in r6: the fused kernel path scores
    # the ground truth in-map, so no broadcast non-equi join remains.
    # x86_hard_negative_mining left in r13: the registered plan is now
    # the mapInPandas matmul form — no BNLJ (VERDICT r12 #1).
}


def test_no_cartesian_no_row_python_udf_anywhere(spark, sf_dir):
    failures = []
    for name, spec in sorted(all_queries().items()):
        plan = (spec.fn(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-at-a-time Python UDF")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_WHITELIST:
            failures.append(f"{name}: unlisted BroadcastNestedLoopJoin")
    assert not failures, failures


def test_bnlj_whitelist_is_tight(spark, sf_dir):
    """The whitelist must not rot: every entry still plans a BNLJ (an
    entry that stopped needing one should be removed so the screen
    stays strict)."""
    for name in BNLJ_WHITELIST:
        plan = (all_queries()[name].fn(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastNestedLoopJoin" in plan, name

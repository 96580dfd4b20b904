"""stratified_sample / sequence_packing unit behavior.

Differential coverage is the x18/x19 oracle rows; here: determinism,
rate fidelity, default-rate fallback, packing boundary semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_foundations_spark.operators.sampling import (
    sequence_packing, stratified_sample,
)


def _corpus(spark, n=2000):
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 2 == 0, "en").otherwise("zh")
                    .alias("lang")))


def test_sample_is_deterministic_and_rate_faithful(spark):
    df = _corpus(spark)
    a = stratified_sample(df, strata_col="lang", rates={"en": 0.5, "zh": 0.1},
                          key_col="doc_id")
    b = stratified_sample(df, strata_col="lang", rates={"en": 0.5, "zh": 0.1},
                          key_col="doc_id")
    ra = sorted(r.doc_id for r in a.collect())
    rb = sorted(r.doc_id for r in b.collect())
    assert ra == rb                                  # same rows every run
    by_lang = {r.lang: r.n for r in
               a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(by_lang["en"] / 1000 - 0.5) < 0.08    # hash-uniformity bound
    assert abs(by_lang.get("zh", 0) / 1000 - 0.1) < 0.05


def test_sample_default_rate_and_seed_independence(spark):
    df = _corpus(spark)
    none_kept = stratified_sample(df, strata_col="lang", rates={"en": 0.3},
                                  key_col="doc_id")    # zh → default 0.0
    assert none_kept.filter(F.col("lang") == "zh").count() == 0
    s7 = {r.doc_id for r in
          stratified_sample(df, strata_col="lang", rates={"en": 0.5},
                            key_col="doc_id", seed=7).collect()}
    s8 = {r.doc_id for r in
          stratified_sample(df, strata_col="lang", rates={"en": 0.5},
                            key_col="doc_id", seed=8).collect()}
    assert s7 != s8                                  # independent hash family


def test_sample_plan_is_scan_local(spark):
    plan = stratified_sample(_corpus(spark), strata_col="lang",
                             rates={"en": 0.5}, key_col="doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan                    # zero shuffles


def test_packing_concat_and_chunk(spark):
    docs = spark.createDataFrame(
        [("s1", 0, 60), ("s1", 1, 50), ("s1", 2, 10), ("s2", 3, 250)],
        "source string, doc_id long, n_tokens long")
    rows = {r.doc_id: (r.pack_id, r.pack_offset) for r in
            sequence_packing(docs, group_col="source", order_col="doc_id",
                             tokens_col="n_tokens", budget=100).collect()}
    assert rows[0] == (0, 0)     # starts pack 0
    assert rows[1] == (0, 60)    # straddles 100-token boundary, starts in 0
    assert rows[2] == (1, 10)    # doc 1 consumed through token 110
    assert rows[3] == (0, 0)     # s2 packs independently of s1

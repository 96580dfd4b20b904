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


def test_curation_stages_drop_what_they_should(spark):
    """The synthetic corpus has no exact dups or sub-floor docs, so the
    x21 oracle never observes those stages dropping rows — this crafted
    corpus does: a short doc dies at the quality floor, a verbatim dup
    keeps only its min doc_id, and survivors pack per source."""
    from data_pipeline_foundations_spark.operators.curation import (
        curate_corpus,
    )
    text = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, text, "en", "s1", len(text)),
         (1, "too short", "en", "s1", 9),              # < 10 tokens
         (2, text, "en", "s1", len(text)),             # dup of doc 0
         (3, text + " tail", "en", "s2", len(text) + 5)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = {r.doc_id: r for r in
           curate_corpus(docs, rates={"en": 1.0}, min_tokens=10,
                         budget=16).collect()}
    assert set(out) == {0, 3}          # 1 under floor, 2 deduped to 0
    assert out[0].n_tokens == 20 and out[0].pack_id == 0
    assert out[3].pack_id == 0 and out[3].pack_offset == 0  # own shard


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


# ---------------------------------------------------------------------------
# stratum_quantile_thresholds: property vs the brute-force definition
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_foundations_spark.operators.sampling import (
    stratum_quantile_thresholds,
)


def _brute_quantile(values, num, den):
    """Smallest v whose cumulative count reaches ceil(q*N) — the
    definition the histogram/window form must reproduce."""
    s = sorted(values)
    n = len(s)
    need = -(-num * n // den)  # ceil(num*n/den)
    return s[need - 1]


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(vals=st.lists(st.integers(0, 30), min_size=1, max_size=60),
       lo=st.tuples(st.integers(1, 9), st.just(10)),
       hi=st.tuples(st.integers(1, 9), st.just(10)))
def test_stratum_quantiles_match_brute_force(vals, lo, hi):
    from data_pipeline_foundations_spark.session import get_spark
    spark = get_spark("tests", shuffle_partitions=8)
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    row = stratum_quantile_thresholds(
        df, strata_col="g", value_col="v", lo=lo, hi=hi).first()
    assert row.lo_value == _brute_quantile(vals, *lo)
    assert row.hi_value == _brute_quantile(vals, *hi)


def test_temperature_resample_flattens_mixture(spark, sf_dir):
    """Smaller strata keep a larger fraction: thresholds are monotone
    decreasing in stratum size, the head stratum sits at base_rate, and
    every kept row's bucket is below its stratum threshold."""
    from data_pipeline_foundations_spark.operators.sampling import (
        SAMPLE_RESOLUTION, temperature_resample,
    )
    from data_pipeline_foundations_spark.tables import load
    docs = load(spark, sf_dir, "documents")
    kept = temperature_resample(docs, strata_col="lang", key_col="doc_id")
    rows = kept.select("lang", "stratum_count", "keep_threshold").distinct() \
        .collect()
    by_size = sorted(rows, key=lambda r: -r.stratum_count)
    # head stratum: threshold == base_rate resolution exactly
    assert by_size[0].keep_threshold == int(0.5 * SAMPLE_RESOLUTION)
    # monotone: smaller stratum -> threshold >= larger stratum's
    for big, small in zip(by_size, by_size[1:]):
        assert small.keep_threshold >= big.keep_threshold
    assert all(r.keep_threshold <= SAMPLE_RESOLUTION for r in rows)
    # determinism: same call, same rows
    a = {r.doc_id for r in kept.select("doc_id").collect()}
    b = {r.doc_id for r in temperature_resample(
        docs, strata_col="lang", key_col="doc_id").select("doc_id").collect()}
    assert a == b and len(a) > 0


def test_exact_stratified_sample_counts_and_partition_invariance(spark, sf_dir):
    """Exactly min(k, |stratum|) per stratum, and the selected SET is
    independent of the input partitioning (the two-phase top-k must pick
    the global k smallest (bucket, key) no matter how rows are split)."""
    from data_pipeline_foundations_spark.operators.sampling import (
        exact_stratified_sample,
    )
    from data_pipeline_foundations_spark.tables import load
    docs = load(spark, sf_dir, "documents")
    sizes = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    k = 7
    out = exact_stratified_sample(docs, strata_col="lang",
                                  key_col="doc_id", k=k)
    got = {r.lang: set() for r in out.select("lang").distinct().collect()}
    for r in out.select("lang", "doc_id").collect():
        got[r.lang].add(r.doc_id)
    for lang, ids in got.items():
        assert len(ids) == min(k, sizes[lang])
    # partition invariance: 1-partition and 13-partition inputs agree
    again = exact_stratified_sample(docs.repartition(13), strata_col="lang",
                                    key_col="doc_id", k=k)
    got2 = set((r.lang, r.doc_id) for r in again.select("lang", "doc_id").collect())
    assert got2 == set((lang, d) for lang, ids in got.items() for d in ids)

"""Deterministic corpus sampling and sequence packing.

Training-data mixture construction needs (a) per-stratum sampling at
exact, *reproducible* rates — "50% of English, 10% of Chinese, drop the
rest" — and (b) packing variable-length documents into fixed token
budgets (context windows). Both are expressed as pure column
expressions: the sample is a map-side filter (no shuffle at all — it
composes with any downstream plan and pushes into the scan), and the
packer is one window over the shard key.

Determinism contract: sampling keys on the portable 60-bit md5 hash
(functions/hashing.py), NOT on rand() — the same row makes the same
keep/drop decision on every run, every engine, every cluster size, so
a resampled pipeline is diffable and the DuckDB oracle reproduces it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.hashing import md5_long, oracle_md5_long

SAMPLE_RESOLUTION = 10_000  # rates quantize to 0.01%


def _bucket(key_col: str, seed: int) -> Column:
    return md5_long(F.col(key_col).cast("string"), seed=seed) % SAMPLE_RESOLUTION


def oracle_bucket(key_sql: str, seed: int) -> str:
    return (f"({oracle_md5_long(f'CAST({key_sql} AS VARCHAR)', seed=seed)}"
            f" % {SAMPLE_RESOLUTION})")


def stratified_sample(df: DataFrame, *, strata_col: str,
                      rates: dict[str, float], key_col: str,
                      seed: int = 7, default_rate: float = 0.0) -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    deterministic hash of ``key_col`` — so the sample is stable across
    runs and engines (unlike ``df.sampleBy``, whose Bernoulli draw
    depends on partitioning). Strata absent from ``rates`` fall back to
    ``default_rate``.

    Scale: a scan-local filter — zero shuffles, prunes before any
    downstream join/agg, and the per-stratum keep-fraction converges to
    the rate with the usual hash-uniformity bound. Exact-count sampling
    (precisely k rows per stratum) needs a per-stratum rank and is a
    different, shuffle-bearing operator; rate-based is what corpus
    mixture weighting wants.
    """
    thresholds = F.when(F.lit(False), F.lit(0))
    for stratum, rate in sorted(rates.items()):
        thresholds = thresholds.when(F.col(strata_col) == stratum,
                                     F.lit(int(rate * SAMPLE_RESOLUTION)))
    thresholds = thresholds.otherwise(
        F.lit(int(default_rate * SAMPLE_RESOLUTION)))
    return df.filter(_bucket(key_col, seed) < thresholds)


def oracle_stratified_sample_where(*, strata_sql: str,
                                   rates: dict[str, float], key_sql: str,
                                   seed: int = 7,
                                   default_rate: float = 0.0) -> str:
    """WHERE-clause twin of :func:`stratified_sample`."""
    cases = " ".join(
        f"WHEN {strata_sql} = '{s}' THEN {int(r * SAMPLE_RESOLUTION)}"
        for s, r in sorted(rates.items()))
    return (f"{oracle_bucket(key_sql, seed)} < (CASE {cases} "
            f"ELSE {int(default_rate * SAMPLE_RESOLUTION)} END)")


def sequence_packing(docs: DataFrame, *, group_col: str, order_col: str,
                     tokens_col: str, budget: int) -> DataFrame:
    """Assign documents to fixed-size token packs (context windows),
    GPT-pretraining style: within each shard (``group_col``) documents
    concatenate in ``order_col`` order and the stream is chunked every
    ``budget`` tokens. Emits pack_id (shard-local ordinal) and
    pack_offset (token position of the document's first token inside its
    pack); a document whose tokens straddle a boundary starts in the
    pack containing its first token — exactly the "concat then chunk"
    semantics of pretraining data loaders.

    Scale: ONE window over (group, order) — shards pack independently
    and in parallel, so parallelism equals shard count and no global
    sort exists anywhere. The running sum carries O(1) state. (A
    best-fit bin packer would need per-bin state and either a driver
    loop or stateful iteration; concat-and-chunk is both the standard
    and the scalable choice.)
    """
    w = (W.partitionBy(group_col).orderBy(order_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return (docs
            .withColumn("pack_id", F.floor(start / F.lit(budget)))
            .withColumn("pack_offset", start % F.lit(budget)))


def oracle_sequence_packing_cols(*, group_sql: str, order_sql: str,
                                 tokens_sql: str, budget: int) -> tuple[str, str]:
    """(pack_id, pack_offset) SQL twins of :func:`sequence_packing`."""
    start = (f"(SUM({tokens_sql}) OVER (PARTITION BY {group_sql} "
             f"ORDER BY {order_sql} ROWS BETWEEN UNBOUNDED PRECEDING AND "
             f"CURRENT ROW) - {tokens_sql})")
    # DuckDB widens windowed SUM(BIGINT) to HUGEINT — cast both outputs
    # back to BIGINT so dtypes match Spark's longs.
    return (f"CAST(FLOOR({start} / {budget}.0) AS BIGINT)",
            f"CAST(({start} % {budget}) AS BIGINT)")


# ---------------------------------------------------------------------------
# Per-stratum quantile thresholds (adaptive quality cutoffs)
# ---------------------------------------------------------------------------


def stratum_quantile_thresholds(df: DataFrame, *, strata_col: str,
                                value_col: str,
                                lo=(1, 10), hi=(9, 10)) -> DataFrame:
    """Per-stratum discrete quantile cutoffs over an integer column:
    (strata, lo_value, hi_value) where lo/hi are (numerator, denominator)
    fractions — e.g. (1,10)/(9,10) for the p10/p90 trim window.

    The quantile is the smallest value whose cumulative count reaches
    ceil(q·N) — computed from a **value histogram**, not a sort of the
    data: groupBy (stratum, value) bounds the shuffle by the number of
    DISTINCT values (thousands), never corpus rows; the running sum is a
    window over that tiny histogram. All arithmetic is integer
    (cum·den >= num·N), so both engines agree exactly — no interpolated
    percentile, whose (1-g)·a + g·b float form is engine-ordering bait.
    """
    lo_n, lo_d = lo
    hi_n, hi_d = hi
    hist = (df.groupBy(strata_col, value_col)
            .agg(F.count(F.lit(1)).alias("_c")))
    w = (W.partitionBy(strata_col).orderBy(value_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = hist.select(
        strata_col, value_col,
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(W.partitionBy(strata_col)).alias("_n"))
    return (cum.groupBy(strata_col).agg(
        F.min(F.when(F.col("_cum") * lo_d >= F.col("_n") * lo_n,
                     F.col(value_col))).alias("lo_value"),
        F.min(F.when(F.col("_cum") * hi_d >= F.col("_n") * hi_n,
                     F.col(value_col))).alias("hi_value")))


def oracle_stratum_quantile_ctes(*, strata_sql: str, value_sql: str,
                                 lo=(1, 10), hi=(9, 10),
                                 table: str = "documents") -> str:
    """CTE block ending in ``thresholds(strata, lo_value, hi_value)``."""
    lo_n, lo_d = lo
    hi_n, hi_d = hi
    return f"""
    hist AS (
        SELECT {strata_sql} AS strata, {value_sql} AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM {table} GROUP BY 1, 2
    ), cum AS (
        SELECT strata, v,
               CAST(SUM(c) OVER (PARTITION BY strata ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(c) OVER (PARTITION BY strata) AS BIGINT) AS n
        FROM hist
    ), thresholds AS (
        SELECT strata,
               MIN(CASE WHEN cum * {lo_d} >= n * {lo_n} THEN v END) AS lo_value,
               MIN(CASE WHEN cum * {hi_d} >= n * {hi_n} THEN v END) AS hi_value
        FROM cum GROUP BY strata
    )"""


# ---------------------------------------------------------------------------
# Temperature-flattened mixture resampling
# ---------------------------------------------------------------------------
def temperature_resample(df: DataFrame, *, strata_col: str, key_col: str,
                         base_rate: float = 0.5,
                         seed: int = 13) -> DataFrame:
    """Rebalance a skewed mixture toward its tail: keep stratum ``s``
    with probability ``min(1, base_rate * sqrt(c_max / c_s))`` — the
    sqrt-temperature flattening multilingual corpus construction uses to
    stop a head language from drowning the mixture (rates scale with
    c_s^(-1/2) relative to the largest stratum, so the head is sampled
    at ``base_rate`` and a 100x-smaller stratum at 10x that rate,
    capped at 1).

    sqrt is the deliberate exponent choice: it is the one fractional
    power that is CORRECTLY ROUNDED everywhere (IEEE requires it; pow()
    is not), and c_max/c_s is one division of exact integer counts — so
    the per-stratum threshold, hence the kept row set, is bit-identical
    in Spark and the DuckDB oracle with no cross-strata float summation
    anywhere (a softmax-style normalization would need an ordered sum).

    Scale: one map-side-combined count per stratum, the |strata|-row
    threshold table broadcasts back, and membership is the deterministic
    md5 bucket — the corpus itself never shuffles. Output adds
    (stratum_count, keep_threshold) for auditability.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("stratum_count"))
    cmax = counts.agg(F.max("stratum_count").alias("max_count"))
    thresholds = (counts.crossJoin(F.broadcast(cmax))
                  .select(strata_col, "stratum_count",
                          F.least(
                              F.lit(SAMPLE_RESOLUTION),
                              F.floor(F.lit(base_rate * SAMPLE_RESOLUTION)
                                      * F.sqrt(F.col("max_count").cast("double")
                                               / F.col("stratum_count").cast("double")))
                              .cast("int")).alias("keep_threshold")))
    return (df.join(F.broadcast(thresholds), strata_col)
            .filter(_bucket(key_col, seed) < F.col("keep_threshold")))


def oracle_temperature_resample_ctes(*, strata_sql: str, key_sql: str,
                                     table: str = "documents",
                                     base_rate: float = 0.5,
                                     seed: int = 13) -> str:
    """CTE chain ``tcounts``→``tthr`` + WHERE fragment; the caller joins
    ``tthr`` on the stratum and filters with ``oracle bucket < keep_threshold``."""
    return f"""
    tcounts AS (
        SELECT {strata_sql} AS strata, COUNT(*) AS stratum_count
        FROM {table} GROUP BY {strata_sql}
    ), tthr AS (
        SELECT strata, stratum_count,
               CAST(LEAST({SAMPLE_RESOLUTION},
                    FLOOR({base_rate * SAMPLE_RESOLUTION}
                          * sqrt(CAST((SELECT MAX(stratum_count) FROM tcounts)
                                      AS DOUBLE)
                                 / CAST(stratum_count AS DOUBLE))))
                    AS INTEGER) AS keep_threshold
        FROM tcounts
    )"""


# ---------------------------------------------------------------------------
# Exact-count stratified sampling (the shuffle-bearing twin of
# stratified_sample — precisely k rows per stratum)
# ---------------------------------------------------------------------------
def exact_stratified_sample(df: DataFrame, *, strata_col: str,
                            key_col: str, k: int,
                            seed: int = 7) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by ranking
    each stratum on the deterministic (md5 bucket, key) order and keeping
    the first k — pseudo-random membership, stable across runs/engines.

    Scale shape (why this is NOT one window): a window over the stratum
    would sort EVERY row of a giant stratum in one task. Instead the
    k smallest keys per stratum come from a two-phase selection —
    per-input-partition top-k (bounded state: k structs per (partition,
    stratum) group), then top-k of the |partitions|·k survivors — and
    the selected ids broadcast back as a semi-join to fetch the full
    rows. Every aggregate state is O(k); the corpus shuffles only its
    (stratum, bucket, key) triples. Output adds ``sample_rank`` (1..k
    in the deterministic order).
    """
    bucket = _bucket(key_col, seed)
    tagged = df.select(F.col(strata_col),
                       F.spark_partition_id().alias("_pid"),
                       bucket.alias("_b"), F.col(key_col).alias("_k"))
    topk = F.slice(F.array_sort(F.collect_list(F.struct("_b", "_k"))), 1, k)
    phase1 = (tagged.groupBy(strata_col, "_pid")
              .agg(topk.alias("_cand")))
    phase2 = (phase1.select(strata_col, F.explode("_cand").alias("c"))
              .groupBy(strata_col)
              .agg(F.slice(F.array_sort(F.collect_list("c")), 1, k)
                   .alias("_sel")))
    selected = (phase2.select(strata_col,
                              F.posexplode("_sel").alias("_pos", "c"))
                .select(strata_col,
                        (F.col("_pos") + 1).cast("int").alias("sample_rank"),
                        F.col("c._k").alias(key_col)))
    return df.join(F.broadcast(selected), [strata_col, key_col])


def oracle_exact_stratified_qualify(*, strata_sql: str, key_sql: str,
                                    k: int, seed: int = 7) -> tuple[str, str]:
    """(rank_expr, qualify_where): DuckDB twin — a plain ranked window
    (the oracle runs single-node; the two-phase shape is the Spark-side
    scale concern, the selected SET is identical)."""
    rank = (f"row_number() OVER (PARTITION BY {strata_sql} ORDER BY "
            f"{oracle_bucket(key_sql, seed)}, {key_sql})")
    return rank, f"<= {k}"

"""Benchmark harness (driver contract).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ...}.

Each query is fully materialized through a noop sink (executes the whole
physical plan, all columns, no driver collect). A warmup pass first touches
every table so JVM/codegen warmup isn't attributed to the first query.

The compact/minimal lines also carry the floor-vs-work decomposition
(VERDICT r9 #4): per-query DuckDB oracle times measured in the same
window, `floor_bucket` (queries whose oracle is under 100 ms — Spark's
multi-stage scheduling floor vs DuckDB's zone-map floor, a tail that
grows with registry size independent of plan quality), and
`stable_ratio` (sum of stable-probe Spark seconds over the same queries'
oracle seconds — the like-for-like reading of the 2x bar).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_foundations_spark.operators.caching import (
    release_cached_intermediates,
)
from data_pipeline_foundations_spark.registry import all_queries
from data_pipeline_foundations_spark.session import get_spark
from data_pipeline_foundations_spark.tables import TABLES, load

# Queries re-probed with extra runs for the `stable` sub-dict: the
# expensive tail, where single-sweep numbers on this shared VM have shown
# multi-second noise (a 12 s reading for a 2 s query). Round-over-round
# BENCH_r* deltas should be read off `stable`, not `queries`.
# VERDICT r3 task #4: top-N widened 8 -> 16, plus an auto-probe of ANY
# query whose two sweep runs disagreed by >1.5x (mid-tail noise escaped
# the old top-8 probe and produced four phantom regressions in r3).
STABLE_RUNS = 3
STABLE_TOP_N = 34  # widened r6 (99 -> 108) and r9 (137 -> 141, plus the
# new pipeline rows joined the expensive tail); keeps every query
# >=~0.8 s inside the min-of-3 probe as the mid-tail grew
DISAGREE_RATIO = 1.5
DISAGREE_MIN_SEC = 0.15  # below this, "disagreement" is scheduling jitter


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    for name in TABLES:  # warmup: JVM, codegen, parquet footers
        load(spark, sf_dir, name).count()
    # warmup: fork the Python worker pool + its pandas/Arrow imports once,
    # so Pandas-UDF queries measure compute, not interpreter startup
    (spark.range(0, 256, 1, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
     .mapInPandas(lambda it: it, schema="id long")
     .write.mode("overwrite").format("noop").save())
    # Each query runs TWICE back-to-back and the per-query minimum is
    # recorded. Run 1 doubles as warmup (one-time JIT/codegen compilation,
    # AQE statistics, parquet footer/page cache — 5-20 s extra on the first
    # md5/regexp-heavy plan shape); run 2 is steady-state. Taking the min
    # also shields the recorded numbers from transient host noise (this
    # harness shares a VM — multi-second stalls on trivial scans were
    # observed under load). clearCache between runs drops per-query
    # persists, so every timed execution is a full computation with no
    # cross-run cached-intermediate reuse and no memory accumulation
    # across the 52-query sweep.
    queries = all_queries()

    def timed_run(spec) -> float:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        # clearCache drops per-query persists; the release call also
        # drains localCheckpoint RDDs (iterative operators), which
        # clearCache does not cover.
        spark.catalog.clearCache()
        release_cached_intermediates()
        return dt

    timings: dict[str, float] = {}
    disagree: set[str] = set()
    for name, spec in sorted(queries.items()):
        runs = [timed_run(spec) for _ in range(2)]
        timings[name] = round(min(runs), 3)
        if min(runs) > DISAGREE_MIN_SEC and max(runs) > DISAGREE_RATIO * min(runs):
            disagree.add(name)

    # Stability probe: the expensive tail — plus anything whose two sweep
    # runs disagreed — gets STABLE_RUNS more isolated runs each; `stable`
    # is the trustworthy number for those queries.
    probe = set(sorted(timings, key=timings.get, reverse=True)[:STABLE_TOP_N])
    probe |= disagree
    stable: dict[str, float] = {}
    for name in sorted(probe):
        spec = queries[name]
        stable[name] = round(min(min(timed_run(spec) for _ in range(STABLE_RUNS)),
                                 timings[name]), 3)

    # Production fast-hash variants (VERDICT r3 task #1): the xxhash64
    # path for the md5-bound dedup family. NOT oracle-checked (DuckDB has
    # no xxhash64) and kept OUT of `queries`/`value` so the headline
    # Spark-vs-oracle aggregate stays like-for-like; this dict documents
    # what the same operators cost when portability is not required.
    from pyspark.sql import functions as F

    from data_pipeline_foundations_spark.operators.dedup import (
        cdc_chunk_stats, decontaminate, minhash_lsh_pairs,
        ngram_containment_pairs, ngram_jaccard_pairs,
        remove_boilerplate_segments, simhash_pairs,
    )

    def _fast(fn):
        def run():
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            release_cached_intermediates()
            return dt
        return run

    docs = load(spark, sf_dir, "documents")
    boiler_docs = docs.withColumn("text", F.expr(
        "concat('nav menu home about contact rss login ', "
        "source, ' ', text)"))
    variant_builders = {
        "x03_dedup_minhash_lsh":
            lambda h: minhash_lsh_pairs(docs, hasher=h),
        "x05_simhash_near_dups":
            lambda h: simhash_pairs(docs, hasher=h),
        "x06_ngram_jaccard":
            lambda h: ngram_jaccard_pairs(docs, hasher=h),
        "x25_decontamination":
            lambda h: decontaminate(docs, F.col("doc_id") % 17 == 0,
                                    hasher=h),
        "x41_ngram_containment":
            lambda h: ngram_containment_pairs(docs, hasher=h),
        "x43_boilerplate_segments":
            lambda h: remove_boilerplate_segments(boiler_docs, hasher=h),
        "x69_cdc_chunking":
            lambda h: cdc_chunk_stats(docs, hasher=h),
    }
    # Each xx variant is measured INTERLEAVED with its md5 twin — the
    # exact same operator call with hasher="md5" — alternating
    # md5/xx/md5/xx inside ONE probe, min per side (VERDICT r7 #2). Two
    # rounds of stable-but-separate probes still read xx 1.5-1.9x slower
    # than the sweep's md5 numbers because host drift between probe
    # positions dwarfs the hash-kernel delta; alternation puts both
    # sides in the same noise environment, so the xx:md5 ratio in
    # `fast_variant_ratio` is drift-free by construction. The twin's
    # absolute time lands in `fast_md5_twins` so the ratio can be
    # audited against the sweep's headline numbers.
    # x03's xx side keeps the JVM HOF pipeline while its md5 side runs the
    # fused Arrow kernel (no bit-exact Python xxhash64 exists in this env
    # to port the kernel — SCALING.md's adjudication), so its ratio
    # measures PATH choice + noise, not hash cost. Marked in the output so
    # downstream readers don't re-adjudicate it as a hash-kernel signal.
    PATH_MIXED = {"x03_dedup_minhash_lsh"}
    fast: dict[str, float] = {}
    twins: dict[str, float] = {}
    ratio: dict[str, float] = {}
    for base, build in sorted(variant_builders.items()):
        md5_run = _fast(lambda b=build: b("md5"))
        xx_run = _fast(lambda b=build: b("xx"))
        # one untimed warmup pair first: the opening run of a cold
        # operator pays JIT/codegen-cache warmup that decays over ~2
        # runs — with only STABLE_RUNS timed rounds, that warmup
        # contaminated min() and read x03's xx at 1.31x in a window
        # where 6 warm interleaved rounds read 0.88x
        md5_run(), xx_run()
        md5_times, xx_times = [], []
        for _ in range(STABLE_RUNS):
            md5_times.append(md5_run())
            xx_times.append(xx_run())
        fast[f"{base}__xx"] = round(min(xx_times), 3)
        twins[f"{base}__md5"] = round(min(md5_times), 3)
        ratio[base] = round(min(xx_times) / max(min(md5_times), 1e-9), 3)

    # Floor-vs-work decomposition (VERDICT r9 #4): the raw sweep ratio is
    # dominated by ~60 sub-second queries where Spark pays a multi-stage
    # scheduling floor against DuckDB's 10-100 ms zone-map floor — that
    # tail grows with every registered query, independent of plan quality.
    # So the bench itself times every registered DuckDB oracle in-process
    # (warm-adaptive: one run; a second min-of-2 run only when the first
    # reading is >= 150 ms, i.e. where noise could matter) and emits
    #   oracle_total   — sum of per-query oracle seconds
    #   floor_bucket   — #queries whose oracle lands under 100 ms
    #   floor_spark_sec— Spark seconds spent inside that floor bucket
    #   stable_ratio   — sum(stable Spark) / sum(oracle) over the stable
    #                    probe set: the like-for-like number the 2x bar
    #                    should be read on, now a first-class field
    import duckdb

    from data_pipeline_foundations_spark.tables import table_path

    con = duckdb.connect()
    con.execute("SET threads=32")
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"'{table_path(sf_dir, name)}'")
    oracle_times: dict[str, float] = {}
    for name, spec in sorted(queries.items()):
        if spec.oracle is None:
            continue
        t0 = time.perf_counter()
        con.execute(spec.oracle).fetchall()
        dt = time.perf_counter() - t0
        if dt >= 0.15:
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            dt = min(dt, time.perf_counter() - t0)
        oracle_times[name] = round(dt, 3)
    oracle_total = round(sum(oracle_times.values()), 3)
    floor_names = {n for n, v in oracle_times.items() if v < 0.1}
    floor_spark = round(sum(timings[n] for n in floor_names), 3)
    st_pairs = [(stable[n], oracle_times[n]) for n in stable
                if n in oracle_times]
    stable_ratio = (round(sum(s for s, _ in st_pairs)
                          / max(sum(o for _, o in st_pairs), 1e-9), 3)
                    if st_pairs else None)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_runtime_all_registered_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "stable": stable,
        "oracle": oracle_times,
        "fast_variants": fast,
        "fast_md5_twins": twins,
        "fast_variant_ratio": ratio,
        "sf": sf,
    }))
    # Compact twin of the line above: the full per-query dict can exceed
    # the driver's tail-capture window (BENCH_r02 recorded "parsed": null),
    # so a shorter line with the stable re-probes comes next.
    print(json.dumps({
        "metric": "total_runtime_all_registered_queries",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "stable": stable,
        "stable_ratio": stable_ratio,
        "oracle_total": oracle_total,
        "floor_bucket": len(floor_names),
        "floor_spark_sec": floor_spark,
        "fast_variant_ratio": ratio,
        "path_mixed_ratios": sorted(PATH_MIXED),
        "sf": sf,
    }))
    # Final line, printed LAST (VERDICT r8 #1, revised r14 per VERDICT
    # r13 "What's wrong" #1): the driver parses the LAST stdout line and
    # its tail-capture window is 2,000 chars, so the full per-query dict
    # (line 1, ~4.8 KB at 156 queries) never reached PERF's per-query
    # comparison (PERF_r13: per_query {}, bench_ok false). The final
    # line therefore now carries a COMPACT per-query dict that fits the
    # window: keys are each query's unique registry prefix (the token
    # before the first "_", e.g. "x03" for x03_dedup_minhash_lsh — full
    # names stay, unrenamed, in line 1's `queries`), values are the
    # min over ALL timed runs of that query (sweep min-of-2 merged with
    # the stable re-probes — bench.py's own header says round-over-round
    # deltas should be read off `stable` where it exists), 2 decimals.
    # Size guard: if the registry ever grows the line past the window,
    # fall back to the old ~120-char headline so the tail ALWAYS ends
    # with a parseable line carrying the round's headline value.
    headline = {
        "metric": "total_runtime_all_registered_queries",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "stable_ratio": stable_ratio,
        "oracle_total": oracle_total,
        "floor_bucket": len(floor_names),
        "floor_spark_sec": floor_spark,
        "sf": sf,
    }
    short = {n: n.split("_")[0] for n in timings}
    compact = {short[n]: round(min(timings[n], stable.get(n, timings[n])), 2)
               for n in timings}
    final = dict(headline)
    if len(compact) == len(timings):  # prefix collision => keep headline
        final["queries"] = compact
    line = json.dumps(final, separators=(",", ":"))
    if len(line) > 1995:  # line + newline must fit the window whole
        line = json.dumps(headline, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()

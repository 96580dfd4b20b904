"""Benchmark harness (driver contract).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ...}.

Each query is fully materialized through a noop sink (executes the whole
physical plan, all columns, no driver collect). A warmup pass first touches
every table so JVM/codegen warmup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_foundations_spark.registry import all_queries
from data_pipeline_foundations_spark.session import get_spark
from data_pipeline_foundations_spark.tables import TABLES, load


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
    timings: dict[str, float] = {}
    for name, spec in sorted(all_queries().items()):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    print(json.dumps({
        "metric": "total_runtime_all_registered_queries",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()

"""Warm min-of-N DuckDB oracle timings for selected queries at a given
SF dir — the like-for-like baseline for bench/SCALING comparisons.

Usage: python scripts/time_oracles.py x06_ngram_jaccard ... [--sf-dir D]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from data_pipeline_foundations_spark.registry import all_queries
from data_pipeline_foundations_spark.tables import TABLES, table_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--threads", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    con = duckdb.connect()
    con.execute(f"SET threads={args.threads}")
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"'{table_path(args.sf_dir, name)}'")
    queries = all_queries()
    for name in args.names:
        sql = queries[name].oracle
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        print(f"{name}: min={min(runs):.3f} runs={[round(r, 3) for r in runs]}",
              flush=True)


if __name__ == "__main__":
    main()

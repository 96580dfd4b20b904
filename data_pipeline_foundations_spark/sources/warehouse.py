"""Warehouse build + catalog reconciliation (SURVEY.md §2.1 S6/S7).

The reference rebuilds a DuckDB warehouse nightly: ``CREATE OR REPLACE
TABLE t AS SELECT * FROM '<file>.parquet'`` over a 13-entry file→table map
(create_duckdb.py:65-79, 96-99), then drops tables absent from the map
(create_duckdb.py:82-88). Spark's catalog is the metadata store, so the
backup/lock-retry machinery (S8/S9) and the Metabase schema sync (S13)
have no equivalent here — the catalog is always self-describing.

Scale note: ``saveAsTable`` keeps the data as parquet under the warehouse
dir — the "load" is a distributed write, not a single-writer file like the
reference's .duckdb. Partition columns pass straight through.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_warehouse(spark: SparkSession, table_map: dict[str, str],
                    *, database: str = "default",
                    partition_by: dict[str, list[str]] | None = None) -> list[str]:
    """S6 — (re)build managed tables from a parquet-path → table-name map.

    Overwrite per table ≙ CREATE OR REPLACE. Returns the loaded names.
    """
    loaded = []
    partition_by = partition_by or {}
    for path, table in table_map.items():
        writer = (spark.read.parquet(path)
                  .write.mode("overwrite").format("parquet"))
        if table in partition_by:
            writer = writer.partitionBy(*partition_by[table])
        writer.saveAsTable(f"{database}.{table}")
        loaded.append(table)
    return loaded


def build_bucketed(spark: SparkSession, parquet_path: str, table: str, *,
                   bucket_col: str, n_buckets: int = 32,
                   database: str = "default") -> None:
    """Bucketed warehouse table: pre-shuffled on ``bucket_col`` at write
    time, so equi-joins and aggregations on that column between
    same-bucketed tables run WITHOUT a shuffle — the Exchange disappears
    from the plan (pinned by tests). This is the warehouse-side answer to
    "reuse a partitioning across stages": pay the shuffle once at load,
    not per query. At 100 TB, bucket the fact tables on their join key
    (e.g., order key) and size n_buckets to the cluster's parallelism.
    """
    (spark.read.parquet(parquet_path)
     .write.mode("overwrite").format("parquet")
     .bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
     .saveAsTable(f"{database}.{table}"))


def reconcile_catalog(spark: SparkSession, keep: set[str],
                      *, database: str = "default") -> list[str]:
    """S7 — drop tables in ``database`` that are not in ``keep``
    (create_duckdb.py:82-88: SHOW TABLES minus the desired map)."""
    dropped = []
    for t in spark.catalog.listTables(database):
        if t.tableType != "VIEW" and t.name not in keep:
            spark.sql(f"DROP TABLE IF EXISTS {database}.`{t.name}`")
            dropped.append(t.name)
    return dropped

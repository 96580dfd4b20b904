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


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path`` — one recursive Hadoop
    FS listing (HDFS/S3A/local), no data read."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return 0, 0
    n, total = 0, 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
            total += st.getLen()
    return n, total


def compact_parquet_dir(spark: SparkSession, path: str, *,
                        target_file_bytes: int = 128 << 20) -> int:
    """Small-file compaction: rewrite ``path`` into
    ceil(total_bytes / target_file_bytes) files. Returns the new file
    count (0 = nothing to do).

    The 100 TB maintenance op behind every streaming/incremental sink:
    per-trigger appends leave thousands of KB-sized files whose open/seek
    overhead eventually dominates scans. Sizing comes from ONE Hadoop FS
    listing (no data read); the rewrite is a distributed
    read→repartition→write into a sibling temp dir, then a directory
    swap.

    The swap (delete + two renames) is NOT atomic — a reader racing the
    swap can see a missing directory. That is the documented limit of
    raw-parquet layouts; production systems wanting transactional
    compaction layer a table format (Delta/Iceberg) whose OPTIMIZE is
    this same job under a metadata transaction. Batch maintenance
    windows (this op's use case) tolerate it.
    """
    import math

    n_files, total = dir_stats(spark, path)
    if n_files == 0:
        return 0
    n_out = max(1, math.ceil(total / target_file_bytes))
    if n_out >= n_files:        # already at/below target granularity
        return n_files
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._compact_tmp")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._compact_old")
    (spark.read.parquet(path).repartition(n_out)
     .write.mode("overwrite").parquet(tmp.toString()))
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(p, old):
        raise IOError(f"compact: could not stage {path} aside")
    if not fs.rename(tmp, p):
        fs.rename(old, p)       # roll back: restore the original layout
        raise IOError(f"compact: could not swap in compacted {path}")
    fs.delete(old, True)
    return dir_stats(spark, path)[0]

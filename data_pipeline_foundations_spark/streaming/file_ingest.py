"""Ledgered incremental file ingestion as Structured Streaming.

Re-expresses the reference's exactly-once folder feed (SURVEY.md ST1/ST2:
extract_manual_arcus_transactions.py:18-111 — a text-file ledger of
processed Drive folders, skip-seen, append-after-success) the Spark way:

  - The **file source + checkpoint** replaces the hand-rolled ledger: each
    discovered file is recorded in the checkpoint's commit log, giving
    exactly-once per file across restarts with no custom state.
  - ``Trigger.AvailableNow`` gives the reference's batch cadence (drain
    everything currently available, then stop) while keeping streaming
    semantics — the same code runs continuously on a cluster.
  - The reference's per-file quirks (totals row at the end of every CSV,
    skip files with <= 1 data row — P8 in SURVEY.md §2.2) are positional,
    which Spark rightly has no row-order semantics for. They're handled at
    **staging time** (stage_csv_file), the one step that must see the file
    as a file; everything after is order-free DataFrame logic.
  - Money arrives in integer cents and is divided to units post-parse
    (extract_manual_arcus_transactions.py:90).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ARCUS_CSV_SCHEMA = T.StructType([
    T.StructField("tx_id", T.LongType()),
    T.StructField("amount", T.LongType()),      # integer cents
    T.StructField("date", T.StringType()),      # parsed to timestamp post-read
    T.StructField("reference", T.StringType()),
])


def stage_csv_file(src_path: str, landing_dir: str) -> str | None:
    """Normalize one raw CSV into the landing zone.

    Drops the trailing totals row; skips files with <=1 data row (the
    reference's guards). Runs driver/ingest-side — the only positional
    step. Returns the staged path, or None if skipped.
    """
    with open(src_path) as fh:
        lines = [ln for ln in fh.read().splitlines() if ln.strip()]
    if len(lines) <= 2:  # header + <=1 data row
        return None
    staged = os.path.join(landing_dir, os.path.basename(src_path))
    with open(staged, "w") as out:
        out.write("\n".join(lines[:-1]) + "\n")  # drop totals row
    return staged


def parse_arcus(df: DataFrame) -> DataFrame:
    """Post-read normalization: cents→units, string→timestamp (coercing)."""
    return df.select(
        "tx_id",
        (F.col("amount") / F.lit(100.0)).alias("amount"),
        F.to_timestamp("date").alias("tx_at"),
        "reference",
    )


def run_available_now(spark: SparkSession, landing_dir: str, out_dir: str,
                      checkpoint_dir: str,
                      publish_root: str | None = None) -> str | None:
    """Drain all currently-available staged files into the parquet sink,
    exactly once per file (checkpoint-tracked), then stop.

    Append mode matches the transactions feed's intent (the reference's
    payments variant overwrites and silently drops history — flagged in
    SURVEY.md §7.4 as a bug not to replicate).

    ``publish_root`` (VERDICT r4 task #6 — versioned snapshots as the
    default consumer surface): after the drain, the ACCUMULATED sink is
    committed as the next snapshot version under ``publish_root``
    (sources/warehouse.py write_versioned) and that directory is
    returned. Batch consumers read via ``read_versioned(publish_root)``
    and get atomic visibility — a reader racing the next drain resolves
    the previous committed version until the new _SUCCESS marker lands,
    and a crashed publish leaves only an ignored orphan directory.
    (The raw ``out_dir`` stays exactly-once for STREAM restarts via the
    checkpoint, but a batch reader racing an in-flight micro-batch can
    observe a partial file set there — the published snapshot is the
    safe handle. Concurrent-reader behavior pinned in
    tests/test_streaming.py.)
    """
    stream = (
        spark.readStream
        .schema(ARCUS_CSV_SCHEMA)
        .option("header", "true")
        .csv(landing_dir)
    )
    q = (
        parse_arcus(stream)
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if publish_root is not None:
        from ..sources.warehouse import write_versioned
        from pyspark.errors import AnalysisException

        # A drain that never processed a file leaves out_dir absent (or
        # holding only _spark_metadata, from which no schema can be
        # inferred) — skip the publish for THOSE two shapes only; any
        # other AnalysisException (corrupt footer, conflicting schema)
        # is a real failure and must propagate, not silently unpublish.
        try:
            accumulated = spark.read.parquet(out_dir)
        except AnalysisException as exc:
            # _LEGACY_ERROR_TEMP_1134 is Spark 4's condition for
            # "Unable to infer schema" (the metadata-only sink dir)
            cls = exc.getCondition() or ""
            if cls in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA",
                       "_LEGACY_ERROR_TEMP_1134"):
                return None
            raise
        return write_versioned(spark, publish_root, accumulated)
    return None

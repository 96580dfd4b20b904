"""Growth-data pipeline: Facebook Ads ingestion + month-partition refresh.

Re-expresses extract_growth_data.py the Spark way:

  - ``transform_facebook_raw`` (U5, :19-76): date parse with the export's
    "MMM d, yyyy" format, $-and-comma numeric cleaning on name-matched
    columns (P17), summary-row drop (P7: null Ad), snake_case renames (P2).
  - ``refresh_monthly_partitions`` (ST3, :78-175): the reference reloads
    the FULL history parquet, drops refreshed months row-by-row, concats,
    and rewrites everything — O(history) I/O per nightly run. Here the
    dataset is parquet PARTITIONED BY month_tag and refreshed with dynamic
    partition overwrite: only the touched months' partitions are replaced,
    existing months are never read or rewritten, and "which months exist"
    is answered from the partition index (directory names), not data.
    That is the difference between O(new month) and O(all history) at
    100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NUMERIC_KEYWORDS = ("sum", "cost", "click", "impression", "sales", "users")

RENAME_MAP = {
    "Install Day": "install_day",
    "Media Source": "media_source",
    "Campaign ID": "campaign_id",
    "Campaign": "campaign_name",
    "Adset ID": "adset_id",
    "Adset": "adset_name",
    "Ad ID": "ad_id",
    "Ad": "ad_name",
    "Impressions (sum)": "impressions",
    "Clicks (sum)": "clicks",
    "Installs (sum)": "installs",
    "Cost (sum)": "cost",
    "Event Counter - firstoffergenerated (sum)": "fog_event_counter",
    "Unique Users - firstoffergenerated (sum)": "fog_unique_users",
    "Event Counter - serverfirstloanacceptedgp (sum)": "fla_event_counter",
    "Unique Users - serverfirstloanacceptedgp (sum)": "fla_unique_users",
    "Sales in USD - serverfirstloanacceptedgp (sum)": "fla_sales_usd",
}


def clean_numeric(col: F.Column) -> F.Column:
    """P17 (:38-46): strip $ and thousands commas, trim, empty→null,
    cast double — one regexp pass, JVM-side."""
    cleaned = F.trim(F.regexp_replace(col.cast("string"), r"[$,]", ""))
    return F.nullif(cleaned, F.lit("")).cast("double")


def transform_facebook_raw(df: DataFrame) -> DataFrame:
    """U5 (:19-76): raw Facebook export → standardized frame."""
    numeric_cols = [c for c in df.columns
                    if any(k in c.lower() for k in NUMERIC_KEYWORDS)]
    df = df.withColumns({c: clean_numeric(F.col(c)) for c in numeric_cols})
    df = df.withColumn("Install Day",
                       F.to_timestamp(F.col("Install Day"), "MMM d, yyyy"))
    df = df.filter(F.col("Ad").isNotNull())  # drops the export's summary row
    return df.withColumnsRenamed({k: v for k, v in RENAME_MAP.items()
                                  if k in df.columns})


def existing_month_tags(spark: SparkSession, dataset_path: str) -> set[str]:
    """Months already present — ONE ``month_tag=*`` directory listing via
    the Hadoop FS API (any Hadoop-compatible FS: HDFS/S3A/local), so the
    check is O(partitions) regardless of history size. The reference
    re-reads the whole parquet for this (:100-104); the previous form
    here planned a distributed distinct-scan over every data file, which
    broke the module's O(new-month) claim (ADVICE r1)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(dataset_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return set()
    tags = set()
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("month_tag="):
            tags.add(name.split("=", 1)[1])
    return tags


def refresh_monthly_partitions(spark: SparkSession, dataset_path: str,
                               month_frames: dict[str, DataFrame], *,
                               months_to_refresh: list[str] | None = None,
                               process_missing: bool = True) -> list[str]:
    """ST3 (:78-175): refresh/append month partitions.

    ``month_frames`` maps month_tag (YYYY_MM, from the source file name)
    to its RAW monthly frame. Months are written when explicitly selected
    for refresh (CASE A) or new while process_missing (CASE B); everything
    else is skipped (CASE C). Dynamic partition overwrite replaces exactly
    the written months' partitions; untouched history is never read.
    Returns the month tags written.
    """
    refresh = set(months_to_refresh or [])
    existing = existing_month_tags(spark, dataset_path)
    selected = [tag for tag in sorted(month_frames)
                if tag in refresh or (process_missing and tag not in existing)]
    if not selected:
        return []
    frames = [transform_facebook_raw(month_frames[tag])
              .withColumn("month_tag", F.lit(tag))
              for tag in selected]
    out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
    (out.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("month_tag")
     .parquet(dataset_path))
    return selected

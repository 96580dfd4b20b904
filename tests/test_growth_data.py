"""Growth pipeline: Facebook transform (U5/P17) + month-partition refresh
(ST3 via dynamic partition overwrite)."""

from __future__ import annotations

import os

from data_pipeline_foundations_spark.pipelines import (
    refresh_monthly_partitions, transform_facebook_raw,
)
from data_pipeline_foundations_spark.pipelines.growth_data import (
    existing_month_tags,
)

RAW_SCHEMA = ("`Install Day` string, `Media Source` string, `Ad` string, "
              "`Impressions (sum)` string, `Cost (sum)` string")


def _raw(spark, rows):
    return spark.createDataFrame(rows, schema=RAW_SCHEMA)


def test_transform_facebook_raw(spark):
    df = transform_facebook_raw(_raw(spark, [
        ("Jan 5, 2025", "facebook", "ad-1", "1,234", "$12.50"),
        ("Jan 6, 2025", "facebook", "ad-2", "", "$0.75"),
        ("Jan 31, 2025", "facebook", None, "99", "$1.00"),   # summary row
    ]))
    rows = {r.ad_name: r for r in df.collect()}
    assert set(rows) == {"ad-1", "ad-2"}                     # summary dropped
    assert rows["ad-1"].impressions == 1234.0                # comma stripped
    assert rows["ad-1"].cost == 12.5                         # $ stripped
    assert rows["ad-2"].impressions is None                  # empty → null
    assert rows["ad-1"].install_day.month == 1
    assert rows["ad-1"].install_day.day == 5


def test_month_partition_refresh(spark, tmp_path):
    path = str(tmp_path / "growth")
    jan = _raw(spark, [("Jan 5, 2025", "fb", "a", "10", "$1")])
    feb = _raw(spark, [("Feb 5, 2025", "fb", "b", "20", "$2")])

    # initial load: both months are new
    written = refresh_monthly_partitions(spark, path, {"2025_01": jan, "2025_02": feb})
    assert written == ["2025_01", "2025_02"]
    assert existing_month_tags(spark, path) == {"2025_01", "2025_02"}

    # re-run with the same months: CASE C skip, nothing written
    assert refresh_monthly_partitions(spark, path, {"2025_01": jan, "2025_02": feb}) == []

    # explicit refresh of one month replaces ONLY that partition
    jan_fixed = _raw(spark, [("Jan 9, 2025", "fb", "a2", "11", "$3")])
    written = refresh_monthly_partitions(
        spark, path, {"2025_01": jan_fixed, "2025_02": feb},
        months_to_refresh=["2025_01"])
    assert written == ["2025_01"]
    out = spark.read.parquet(path)
    assert {r.ad_name for r in out.filter("month_tag = '2025_01'").collect()} == {"a2"}
    assert {r.ad_name for r in out.filter("month_tag = '2025_02'").collect()} == {"b"}

    # new month auto-processed alongside untouched history
    mar = _raw(spark, [("Mar 1, 2025", "fb", "c", "30", "$4")])
    assert refresh_monthly_partitions(
        spark, path, {"2025_01": jan_fixed, "2025_03": mar}) == ["2025_03"]
    assert existing_month_tags(spark, path) == {"2025_01", "2025_02", "2025_03"}
    assert spark.read.parquet(path).count() == 3

    # partition layout on disk: one directory per month (pruning-ready)
    dirs = {d for d in os.listdir(path) if d.startswith("month_tag=")}
    assert dirs == {"month_tag=2025_01", "month_tag=2025_02", "month_tag=2025_03"}


def test_existing_month_tags_reads_no_data_files(spark, tmp_path):
    """The month-existence probe must be a partition-directory listing,
    never a data scan: it still answers after every parquet data file is
    corrupted in place (a scan would throw), and it answers empty for a
    missing dataset without touching Spark jobs."""
    path = str(tmp_path / "growth")
    assert existing_month_tags(spark, path) == set()
    jan = _raw(spark, [("Jan 5, 2025", "fb", "a", "10", "$1")])
    refresh_monthly_partitions(spark, path, {"2025_01": jan})
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "wb") as fh:
                    fh.write(b"not parquet anymore")
    assert existing_month_tags(spark, path) == {"2025_01"}

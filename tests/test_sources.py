"""Sources & sinks (SURVEY.md §2.1): warehouse build/reconcile, readers,
folder connector dispatch + export."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from data_pipeline_foundations_spark.sources import (
    FolderConnector, LocalFolderBackend, build_warehouse, read_csv,
    read_json, reconcile_catalog,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_warehouse_build_and_reconcile(spark):
    """S6+S7: parquet→managed tables, then stale-table drop
    (create_duckdb.py:65-99 semantics)."""
    table_map = {
        f"{SF_DIR}/region.parquet": "dim_region",
        f"{SF_DIR}/nation.parquet": "dim_nation",
    }
    loaded = build_warehouse(spark, table_map)
    assert sorted(loaded) == ["dim_nation", "dim_region"]
    assert spark.table("dim_region").count() == 5

    # a stale table from a previous run
    spark.range(3).write.mode("overwrite").saveAsTable("stale_table")
    dropped = reconcile_catalog(spark, keep=set(table_map.values()))
    assert "stale_table" in dropped
    names = {t.name for t in spark.catalog.listTables()}
    assert "stale_table" not in names
    assert {"dim_region", "dim_nation"} <= names
    # idempotent rebuild (CREATE OR REPLACE semantics)
    build_warehouse(spark, table_map)
    assert spark.table("dim_nation").count() == 25
    for t in ("dim_region", "dim_nation"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_csv_reader_explicit_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,amount,label\n1,150,a\n2,,b\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.LongType()),
        T.StructField("label", T.StringType()),
    ])
    df = read_csv(spark, str(p), schema)
    rows = {r.id: r for r in df.collect()}
    assert df.schema == schema
    assert rows[2].amount is None  # empty → null, no inference drift


def test_json_reader(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"id": 1, "v": 2.5}\n{"id": 2, "v": null}\n')
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    df = read_json(spark, str(p), schema)
    assert df.count() == 2
    assert df.filter("v IS NULL").count() == 1


def test_connector_dispatch_and_export(spark, tmp_path):
    """S3/S4/S10: list → extension dispatch → DataFrame; export roundtrip."""
    root = tmp_path / "drive"
    (root / "inbox").mkdir(parents=True)
    (root / "inbox" / "a.csv").write_text("k,v\n1,x\n2,y\n")
    (root / "inbox" / "b.json").write_text('{"k": 3, "v": "z"}\n')
    (root / "inbox" / "ignore.bin").write_text("junk")

    backend = LocalFolderBackend(str(root))
    conn = FolderConnector(spark, backend)
    files = {f["name"]: f for f in backend.list_files("inbox")}
    assert set(files) == {"a.csv", "b.json", "ignore.bin"}

    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    csv_df = conn.load_file_as_dataframe(files["a.csv"], schema)
    json_df = conn.load_file_as_dataframe(files["b.json"], schema)
    both = csv_df.unionByName(json_df)
    assert both.count() == 3

    with pytest.raises(ValueError):
        conn.load_file_as_dataframe(files["ignore.bin"])

    out = conn.export_dataframe(both.orderBy("k"), "reports", "all.csv")
    assert os.path.exists(out)
    round_trip = read_csv(spark, out, schema)
    assert [r.k for r in round_trip.orderBy("k").collect()] == [1, 2, 3]


def test_excel_bridge(spark, tmp_path):
    """S4 Excel arm (utils/gsheets_utils.py:177-181): pandas-bridge
    round-trip when an engine is installed; clear ImportError otherwise."""
    import pandas as pd

    from data_pipeline_foundations_spark.sources.readers import read_excel_bridge
    p = tmp_path / "r.xlsx"
    try:
        pd.DataFrame({"k": [1, 2], "v": ["x", "y"]}).to_excel(p, index=False)
    except ImportError:
        p.write_bytes(b"PK\x03\x04 not a real workbook")
        with pytest.raises(ImportError, match="openpyxl|Excel"):
            read_excel_bridge(spark, str(p))
        return
    df = read_excel_bridge(spark, str(p))
    assert sorted(r.k for r in df.collect()) == [1, 2]

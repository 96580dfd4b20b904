"""S1 JDBC source integration (VERDICT r1 #7).

No standalone database server exists in this container, but Spark ships
embedded Apache Derby (its Hive-metastore backend), so an in-memory
Derby database (`jdbc:derby:memory:...`) exercises the REAL JDBC read
path end-to-end: DriverManager handshake, schema mapping, query
pushdown, partitioned parallel extraction, and write-back. In local
mode executors share the driver JVM, so the in-memory DB is visible to
every task — exactly the visibility a networked DB gives a cluster.

Reference surface: utils/fetch_data_utils.py:20-27 (pd.read_sql pulls
the full result into driver memory); here the read is executor-side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_foundations_spark.sources.readers import read_jdbc

URL = "jdbc:derby:memory:s1test;create=true"

ROWS = [(0, 100.0, "OK"), (1, 250.5, "OK"), (2, 75.25, "BAD"), (3, 10.0, "OK")]


@pytest.fixture(scope="module")
def derby(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE loans (id INT NOT NULL, amount DOUBLE, status VARCHAR(10))")
    for i, a, s in ROWS:
        st.executeUpdate(f"INSERT INTO loans VALUES ({i}, {a}, '{s}')")
    st.close()
    conn.close()
    return URL


def test_query_pushed_to_engine(spark, derby):
    """S1's contract: arbitrary SQL evaluated BY the database, not Spark."""
    df = read_jdbc(spark, derby,
                   "SELECT id, amount FROM loans WHERE status = 'OK'")
    got = {(r.ID, r.AMOUNT) for r in df.collect()}
    assert got == {(0, 100.0), (1, 250.5), (3, 10.0)}


def test_partitioned_parallel_extraction(spark, derby):
    """The scale path: numPartitions range-splits the table so extraction
    runs as parallel executor-side reads (the reference's pd.read_sql is
    one driver-side stream)."""
    df = read_jdbc(spark, derby, None, dbtable="loans",
                   partitionColumn="id", lowerBound="0", upperBound="4",
                   numPartitions="2")
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == len(ROWS)


def test_filter_and_projection_push_down(spark, derby):
    """Predicates and column pruning must reach the JDBCRelation scan —
    at 100 TB the database filters, Spark doesn't."""
    df = (read_jdbc(spark, derby, None, dbtable="loans")
          .filter(F.col("status") == "OK").select("id"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(STATUS,OK)" in plan
    assert "ReadSchema: struct<ID:int>" in plan


def test_write_back_round_trip(spark, derby):
    """DB write-back (the reference's to_sql direction) through the same
    driver: append a summary table, read it back."""
    (spark.createDataFrame([("OK", 3), ("BAD", 1)], "status string, n int")
     .write.format("jdbc").option("url", derby)
     .option("dbtable", "status_counts").mode("overwrite").save())
    # Spark's JDBC writer quotes the DataFrame's lowercase column names,
    # so Derby stores them case-sensitively — quote them on the way back.
    back = read_jdbc(spark, derby,
                     'SELECT "status", "n" FROM status_counts')
    assert {(r.status, r.n) for r in back.collect()} == {("OK", 3), ("BAD", 1)}

"""Reference-pipeline analogs, end-to-end over the TESTDATA schema.

These queries re-run the reference's pipeline *logic* (waterfall payment
apportionment, settlement/DPD, calendar generation, accounting rollups) with
the star-schema tables playing the roles of the lending tables. The real
fixture-faithful pipelines live in ``pipelines/`` and are exercised by unit
tests; these registry entries are the oracle-checkable projections of the
same operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import round2, sum_money_expr
from ..operators.calendar import calendar_dim, oracle_calendar_sql
from ..operators.waterfall import oracle_waterfall_sql, waterfall_columns
from ..registry import query
from ..tables import load


@query("u01_waterfall_apportionment", oracle=oracle_waterfall_sql())
def u01_waterfall_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — the reference's crown-jewel payment waterfall
    (extract_loan_detail.py:198-234), re-expressed as closed-form column
    expressions instead of a row-wise Python UDF: the single biggest
    idiomatic win over the reference (SURVEY.md §2.9). Whole-stage codegen,
    zero Python in the hot path.

    Role mapping onto TESTDATA: each order is a "loan" whose buckets derive
    from o_totalprice; the amount paid is the discounted lineitem revenue.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    paid = (
        li.groupBy("l_orderkey")
        .agg(sum_money_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("amount_paid"))
    )
    base = (
        o.join(paid, o.o_orderkey == paid.l_orderkey, "left")
        .select(
            F.col("o_orderkey").alias("loan_id"),
            round2(F.col("o_totalprice") * 0.70).alias("principal"),
            round2(F.col("o_totalprice") * 0.20).alias("fee"),
            F.when(F.col("o_orderstatus") == "F",
                   round2(F.col("o_totalprice") * 0.05)).otherwise(0.0).alias("late_fee"),
            F.coalesce(F.col("amount_paid"), F.lit(0.0)).alias("amount_paid"),
        )
    )
    return waterfall_columns(base)


@query("d11_calendar_dim", oracle=oracle_calendar_sql())
def d11_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11 generated date dimension with Mexican quincena payroll attributes
    (create_calendar.py:26-84) — sequence+explode, no driver loop, injectable
    end date (as_of) instead of now() for determinism (SURVEY.md D7)."""
    return calendar_dim(spark, start="2022-08-01", as_of="2025-12-31",
                        min_date="2022-09-01")

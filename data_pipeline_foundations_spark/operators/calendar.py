"""Generated date dimension with Mexican quincena payroll attributes.

Re-expresses create_calendar.py (reference) without the driver-side
day-by-day Python loop: one ``sequence → explode`` producing the day spine,
then pure column expressions per row. The "now" anchor is injectable
(``as_of``) per SURVEY.md D7 so outputs are deterministic.

Semantics (create_calendar.py:36-84):
  - Quincena payment dates: the 15th and the last day of each month,
    weekend-adjusted Sat→Fri / Sun→Fri.
  - A day's ``Quincena`` is the adjusted q1 if day <= q1_adj else adjusted q2.
  - ``PrevQuincena`` is the previous month's adjusted q2 for days <= q1_adj,
    else q1_adj.
  - ``DayRelativeToQuincena`` = signed calendar days from the day's quincena.
  - Spine starts 2022-08-01, output filtered to >= 2022-09-01 (so the
    first-month None case for PrevQuincena never survives the filter and a
    closed-form previous-month expression is exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime_ops import weekend_adjust


def _q1_adj(day: Column) -> Column:
    return weekend_adjust(F.make_date(F.year(day), F.month(day), F.lit(15)))


def calendar_dim(spark: SparkSession, start: str = "2022-08-01",
                 as_of: str | None = None,
                 min_date: str = "2022-09-01") -> DataFrame:
    """Build the quincena calendar dimension. ``as_of`` replaces now()."""
    if as_of is None:
        raise ValueError("pass an explicit as_of for deterministic output")
    spine = spark.range(1).select(
        F.explode(F.sequence(F.lit(start).cast("date"),
                             F.lit(as_of).cast("date"))).alias("date_day")
    )
    day = F.col("date_day")
    q1_adj = _q1_adj(day)
    q2_adj = weekend_adjust(F.last_day(day))
    prev_q2_adj = weekend_adjust(F.last_day(F.add_months(day, -1)))
    quincena = F.when(day <= q1_adj, q1_adj).otherwise(q2_adj)
    prev_quincena = F.when(day <= q1_adj, prev_q2_adj).otherwise(q1_adj)
    return (
        spine
        .filter(day >= F.lit(min_date).cast("date"))
        .select(
            F.trunc(day, "month").cast("timestamp").alias("date_month"),
            day.cast("timestamp").alias("date_day"),
            quincena.cast("timestamp").alias("quincena"),
            (day == quincena).alias("is_quincena"),
            prev_quincena.cast("timestamp").alias("prev_quincena"),
            F.date_format(day, "EEEE").alias("day_of_week"),
            F.datediff(day, quincena).cast("int").alias("day_rel_quincena"),
        )
    )


def oracle_calendar_sql(start: str = "2022-09-01",
                        as_of: str = "2025-12-31") -> str:
    """DuckDB twin of calendar_dim. dayofweek(): DuckDB 0=Sun..6=Sat vs
    Spark dayofweek 1=Sun..7=Sat — both weekend-adjust branches below use
    the DuckDB numbering."""
    return f"""
    WITH spine AS (
        SELECT CAST(d AS DATE) AS date_day
        FROM generate_series(DATE '{start}', DATE '{as_of}', INTERVAL 1 DAY) t(d)
    ), marks AS (
        SELECT date_day,
               CASE WHEN dayofweek(make_date(year(date_day), month(date_day), 15)) = 6
                    THEN make_date(year(date_day), month(date_day), 15) - 1
                    WHEN dayofweek(make_date(year(date_day), month(date_day), 15)) = 0
                    THEN make_date(year(date_day), month(date_day), 15) - 2
                    ELSE make_date(year(date_day), month(date_day), 15) END AS q1_adj,
               CASE WHEN dayofweek(last_day(date_day)) = 6 THEN last_day(date_day) - 1
                    WHEN dayofweek(last_day(date_day)) = 0 THEN last_day(date_day) - 2
                    ELSE last_day(date_day) END AS q2_adj,
               CASE WHEN dayofweek(last_day(date_day - INTERVAL 1 MONTH)) = 6
                    THEN last_day(date_day - INTERVAL 1 MONTH) - 1
                    WHEN dayofweek(last_day(date_day - INTERVAL 1 MONTH)) = 0
                    THEN last_day(date_day - INTERVAL 1 MONTH) - 2
                    ELSE last_day(date_day - INTERVAL 1 MONTH) END AS prev_q2_adj
        FROM spine
    )
    SELECT date_trunc('month', date_day) AS date_month,
           CAST(date_day AS TIMESTAMP) AS date_day,
           CAST(CASE WHEN date_day <= q1_adj THEN q1_adj ELSE q2_adj END AS TIMESTAMP) AS quincena,
           date_day = (CASE WHEN date_day <= q1_adj THEN q1_adj ELSE q2_adj END)
               AS is_quincena,
           CAST(CASE WHEN date_day <= q1_adj THEN prev_q2_adj ELSE q1_adj END AS TIMESTAMP) AS prev_quincena,
           strftime(date_day, '%A') AS day_of_week,
           CAST(date_day - (CASE WHEN date_day <= q1_adj THEN q1_adj ELSE q2_adj END)
                AS INTEGER) AS day_rel_quincena
    FROM marks
    """

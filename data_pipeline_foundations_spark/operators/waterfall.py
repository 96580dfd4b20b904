"""Payment waterfall apportionment as closed-form column expressions.

Reference semantics (extract_loan_detail.py:198-234): allocate
``min(TotalAmountPaid, TotalAmountDue)`` across buckets in priority order
(1) LateFee + its 16% tax, (2) Fee + its tax, (3) Principal. A partially
covered bucket is grossed down by ``round(remaining/1.16, 2)`` with the tax
taking the remainder; principal absorbs what's left, capped at the principal
amount. The reference runs this as a row-wise ``apply(axis=1)`` Python UDF —
the single slowest construct in its codebase.

Here the waterfall is a pure expression tree: ``least``/``when`` cascades
that Catalyst folds into one whole-stage-codegen projection. No Python, no
serialization, linear scan — at 100 TB this runs at parquet-scan speed.

Rounding: the reference uses Python ``round`` (half-even). The
oracle-checked analog uses the engine-agnostic floor-based half-up from
functions.money (bit-identical in Spark and DuckDB — neither engine's
native ``round`` matches the other's); the fixture-faithful pipeline
variant passes ``half_even=True`` to match Python ``round`` instead. Both
agree except on exact-tie doubles, which the property tests quantify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.money import round2


def _bucket(remaining: Column, amount: Column, tax: Column, rnd) -> tuple[Column, Column, Column]:
    """Allocate one (amount + tax) bucket out of ``remaining``.

    Returns (amount_paid, tax_paid, remaining_after). Full-coverage branch
    pays the bucket exactly; partial branch grosses down by 1.16.
    """
    total_due = amount + tax
    full = remaining >= total_due
    part_amount = rnd(remaining / 1.16)
    amount_paid = F.when(full, amount).otherwise(part_amount)
    tax_paid = F.when(full, tax).otherwise(rnd(remaining - part_amount))
    remaining_after = F.when(full, remaining - total_due).otherwise(F.lit(0.0))
    return amount_paid, tax_paid, remaining_after


def waterfall_columns(df: DataFrame, *, principal: str = "principal",
                      fee: str = "fee", late_fee: str = "late_fee",
                      amount_paid: str = "amount_paid",
                      half_even: bool = False) -> DataFrame:
    """Append the five apportionment columns + totals to ``df``.

    Expects 2-dp double columns. ``half_even=True`` reproduces Python
    ``round`` (the reference UDF) exactly; default half-up matches DuckDB.
    """
    rnd = (lambda x: F.bround(x, 2)) if half_even else round2
    p, f_, lf = F.col(principal), F.col(fee), F.col(late_fee)
    tax_on_fee = rnd(f_ * 0.16)
    tax_on_late = rnd(lf * 0.16)
    total_due = p + f_ + tax_on_fee + lf + tax_on_late
    alloc = F.least(F.col(amount_paid), total_due)

    lf_paid, lf_tax_paid, rem1 = _bucket(alloc, lf, tax_on_late, rnd)
    fee_paid, fee_tax_paid, rem2 = _bucket(rem1, f_, tax_on_fee, rnd)
    principal_paid = F.least(rem2, p)

    return df.select(
        "*",
        tax_on_fee.alias("tax_on_fee"),
        tax_on_late.alias("tax_on_late_fee"),
        rnd(total_due).alias("total_due"),
        lf_paid.alias("late_fee_paid"),
        lf_tax_paid.alias("tax_on_late_fee_paid"),
        fee_paid.alias("fee_paid"),
        fee_tax_paid.alias("tax_on_fee_paid"),
        rnd(principal_paid).alias("principal_paid"),
    )


def oracle_waterfall_sql() -> str:
    """DuckDB SQL computing the identical analog over orders+lineitem.

    Mirrors plans/pipelines.u01_waterfall_apportionment: each order is a
    loan; buckets derive from o_totalprice; paid = discounted lineitem
    revenue. Expression tree matches waterfall_columns step for step.
    """
    def r2(e: str) -> str:
        # engine-agnostic half-up, mirrors functions.money.round2
        return f"(CAST(FLOOR(({e}) * 100.0 + 0.5) AS BIGINT) / 100.0)"

    return f"""
    WITH paid AS (
        SELECT l_orderkey,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) / 100.0
                   AS amount_paid
        FROM lineitem GROUP BY l_orderkey
    ), base AS (
        SELECT o.o_orderkey AS loan_id,
               {r2('o.o_totalprice * 0.70')} AS principal,
               {r2('o.o_totalprice * 0.20')} AS fee,
               CASE WHEN o.o_orderstatus = 'F'
                    THEN {r2('o.o_totalprice * 0.05')} ELSE 0.0 END AS late_fee,
               COALESCE(p.amount_paid, 0.0) AS amount_paid
        FROM orders o LEFT JOIN paid p ON o.o_orderkey = p.l_orderkey
    ), taxed AS (
        SELECT *,
               {r2('fee * 0.16')} AS tax_on_fee,
               {r2('late_fee * 0.16')} AS tax_on_late_fee
        FROM base
    ), alloc AS (
        SELECT *,
               principal + fee + tax_on_fee + late_fee + tax_on_late_fee AS total_due_raw,
               LEAST(amount_paid, principal + fee + tax_on_fee + late_fee + tax_on_late_fee)
                   AS to_allocate
        FROM taxed
    ), b1 AS (
        SELECT *,
               CASE WHEN to_allocate >= late_fee + tax_on_late_fee
                    THEN late_fee ELSE {r2('to_allocate / 1.16')} END AS late_fee_paid,
               CASE WHEN to_allocate >= late_fee + tax_on_late_fee
                    THEN tax_on_late_fee
                    ELSE {r2(f"to_allocate - {r2('to_allocate / 1.16')}")} END
                   AS tax_on_late_fee_paid,
               CASE WHEN to_allocate >= late_fee + tax_on_late_fee
                    THEN to_allocate - (late_fee + tax_on_late_fee) ELSE 0.0 END AS rem1
        FROM alloc
    ), b2 AS (
        SELECT *,
               CASE WHEN rem1 >= fee + tax_on_fee
                    THEN fee ELSE {r2('rem1 / 1.16')} END AS fee_paid,
               CASE WHEN rem1 >= fee + tax_on_fee
                    THEN tax_on_fee
                    ELSE {r2(f"rem1 - {r2('rem1 / 1.16')}")} END AS tax_on_fee_paid,
               CASE WHEN rem1 >= fee + tax_on_fee
                    THEN rem1 - (fee + tax_on_fee) ELSE 0.0 END AS rem2
        FROM b1
    )
    SELECT loan_id, principal, fee, late_fee, amount_paid,
           tax_on_fee, tax_on_late_fee,
           {r2('total_due_raw')} AS total_due,
           late_fee_paid, tax_on_late_fee_paid, fee_paid, tax_on_fee_paid,
           {r2('LEAST(rem2, principal)')} AS principal_paid
    FROM b2
    """

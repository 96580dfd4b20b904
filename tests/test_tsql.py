"""T-SQL → Spark SQL translation (SURVEY.md §2.11): the reference's own
embedded query texts must run on Spark unchanged after the rewrite."""

from __future__ import annotations

import datetime as dt

import pytest

from data_pipeline_foundations_spark.plans.tsql import translate_tsql

# The reference's referral-payout aggregate, verbatim
# (load_accounting_data.py:179-193) — the dialect-heaviest query in the repo.
REFERRAL_SUMMARY_TSQL = """
SELECT
    DATEPART(YEAR, RP.ModifiedAt AT TIME ZONE 'UTC' AT TIME ZONE 'Central Standard Time (Mexico)') AS Year,
    DATEPART(MONTH, RP.ModifiedAt AT TIME ZONE 'UTC' AT TIME ZONE 'Central Standard Time (Mexico)') AS Month,
    COUNT(*) AS TotalTransactions,
    SUM(RP.Amount) AS TotalAmount
FROM ReferralPayouts RP
INNER JOIN Referrals R ON RP.ReferralId = R.ReferralId
INNER JOIN ReferralLinks RL ON R.ReferralLinkId = RL.ReferralLinkId
WHERE R.[Status] = 3 AND RP.Status = 2
GROUP BY
    DATEPART(YEAR, RP.ModifiedAt AT TIME ZONE 'UTC' AT TIME ZONE 'Central Standard Time (Mexico)'),
    DATEPART(MONTH, RP.ModifiedAt AT TIME ZONE 'UTC' AT TIME ZONE 'Central Standard Time (Mexico)')
ORDER BY Year, Month
"""

# The referral detail (load_accounting_data.py:209-231): bracket-quoted
# [User] table, mixed join types, AT TIME ZONE in the projection.
REFERRAL_DETAIL_TSQL = """
SELECT
    referrer.PublicToken AS ReferrerPublicToken,
    RP.Amount AS TransactionAmount,
    RP.ModifiedAt AT TIME ZONE 'UTC' AT TIME ZONE 'Central Standard Time (Mexico)' AS TransactionDate,
    DATEPART(YEAR, RP.ModifiedAt AT TIME ZONE 'UTC' AT TIME ZONE 'Central Standard Time (Mexico)') AS TransactionYear,
    DATEPART(MONTH, RP.ModifiedAt AT TIME ZONE 'UTC' AT TIME ZONE 'Central Standard Time (Mexico)') AS TransactionMonth
FROM Referrals R
INNER JOIN ReferralLinks RL ON R.ReferralLinkId = RL.ReferralLinkId
LEFT JOIN ReferralPayouts RP ON RP.ReferralId = R.ReferralId
INNER JOIN [User] referrer ON RL.UserId = referrer.UserId
WHERE
    R.[Status] = 3
    AND RP.Status = 2
"""


def test_rewrite_patterns():
    assert translate_tsql(
        "x AT TIME ZONE 'UTC' AT TIME ZONE 'Central Standard Time (Mexico)'"
    ) == "from_utc_timestamp(x, 'America/Mexico_City')"
    assert translate_tsql("DATEPART(YEAR, ts)") == "year(ts)"
    assert translate_tsql("DATEPART(month, ts)") == "month(ts)"
    assert translate_tsql("[User].[Status]") == "`User`.`Status`"
    assert translate_tsql("convert(date, l.CreatedAt)") == "CAST(l.CreatedAt AS DATE)"
    # ANSI passes through untouched
    ansi = "SELECT a, COUNT(*) FROM t WHERE b = 1 GROUP BY a"
    assert translate_tsql(ansi) == ansi


@pytest.fixture(scope="module")
def referral_views(spark):
    TS = dt.datetime
    spark.createDataFrame(
        # payout 1: 2025-01-15 10:00 UTC → 2025-01 CDMX
        # payout 2: 2025-02-01 03:00 UTC → 2025-01-31 21:00 CDMX → month 1!
        # payout 3: status 1 → filtered out
        [(1, 11, 100.0, TS(2025, 1, 15, 10), 2),
         (2, 12, 50.0, TS(2025, 2, 1, 3), 2),
         (3, 11, 999.0, TS(2025, 2, 10), 1)],
        "ReferralPayoutId long, ReferralId long, Amount double, ModifiedAt timestamp, Status int",
    ).createOrReplaceTempView("ReferralPayouts")
    spark.createDataFrame(
        [(11, 21, 3), (12, 22, 3), (13, 21, 1)],
        "ReferralId long, ReferralLinkId long, Status int",
    ).createOrReplaceTempView("Referrals")
    spark.createDataFrame(
        [(21, 31), (22, 32)], "ReferralLinkId long, UserId long",
    ).createOrReplaceTempView("ReferralLinks")
    spark.createDataFrame(
        [(31, "tok-a"), (32, "tok-b")], "UserId long, PublicToken string",
    ).createOrReplaceTempView("User")
    return spark


def test_reference_referral_summary_runs(referral_views):
    spark = referral_views
    out = spark.sql(translate_tsql(REFERRAL_SUMMARY_TSQL)).collect()
    # both paid payouts land in CDMX January 2025 (the 2nd crosses midnight)
    assert len(out) == 1
    r = out[0]
    assert (r.Year, r.Month) == (2025, 1)
    assert r.TotalTransactions == 2
    assert r.TotalAmount == pytest.approx(150.0)


def test_reference_referral_detail_runs(referral_views):
    spark = referral_views
    rows = {r.ReferrerPublicToken: r for r in
            spark.sql(translate_tsql(REFERRAL_DETAIL_TSQL)).collect()}
    assert set(rows) == {"tok-a", "tok-b"}
    # AT TIME ZONE materialized as CDMX wall clock
    assert rows["tok-b"].TransactionDate == dt.datetime(2025, 1, 31, 21, 0)
    assert rows["tok-b"].TransactionMonth == 1
    # the WHERE RP.Status = 2 collapses the LEFT JOIN to inner
    # (SURVEY.md §2.4 J12) — the unpaid payout row is gone
    assert all(r.TransactionAmount in (100.0, 50.0) for r in rows.values())

def test_nested_convert_translates():
    out = translate_tsql("SELECT CONVERT(DATE, DATEADD(day, 1, x)) AS d FROM t")
    assert out == "SELECT CAST(DATEADD(day, 1, x) AS DATE) AS d FROM t"


def test_unsupported_constructs_raise_not_passthrough():
    # single AT TIME ZONE (not the UTC→tz pair shape) must be rejected
    with pytest.raises(ValueError, match="unsupported T-SQL"):
        translate_tsql("SELECT x AT TIME ZONE 'UTC' FROM t")
    # DATEPART with an unsupported part
    with pytest.raises(ValueError, match="unsupported T-SQL"):
        translate_tsql("SELECT DATEPART(WEEK, x) FROM t")
    # CONVERT with two nesting levels: better to raise than mis-rewrite
    with pytest.raises(ValueError, match="unsupported T-SQL"):
        translate_tsql("SELECT CONVERT(DATE, f(g(x))) FROM t")

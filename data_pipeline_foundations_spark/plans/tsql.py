"""T-SQL → Spark SQL translation (SURVEY.md §2.11).

The reference ships its relational logic as SQL strings executed by SQL
Server. Almost all of it (CASE, JOIN, GROUP BY, window functions,
aliases) is ANSI and runs on Spark unchanged; exactly four dialect items
appear in the repo and are rewritten here so the embedded queries run
verbatim via ``spark.sql`` over registered tables:

  1. ``X AT TIME ZONE 'UTC' AT TIME ZONE 'Central Standard Time (Mexico)'``
     → ``from_utc_timestamp(X, 'America/Mexico_City')``
     (load_accounting_data.py:181-182, 190-191, 217-221)
  2. ``DATEPART(YEAR|MONTH|DAY, x)`` → ``year(x)`` / ``month(x)`` / ``day(x)``
  3. bracket-quoted identifiers ``[User]``, ``[Status]`` → backticks
     (load_accounting_data.py:226, 229)
  4. ``convert(date, x)`` → ``CAST(x AS DATE)`` (extract_loan_detail.py:77,
     in-comment only, handled for completeness)

This is a pattern rewriter for the observed dialect surface, not a full
T-SQL grammar — anything outside these four constructs passes through
untouched (and is ANSI in the reference's corpus, verified by the tests
running the reference's own query texts).
"""

from __future__ import annotations

import re

# SQL Server tz name used by the reference → IANA
_TZ_MAP = {"Central Standard Time (Mexico)": "America/Mexico_City"}

_AT_TZ = re.compile(
    r"(?P<expr>[A-Za-z_][\w.]*)\s+AT\s+TIME\s+ZONE\s+'UTC'\s+AT\s+TIME\s+ZONE\s+'(?P<tz>[^']+)'",
    re.IGNORECASE,
)
_DATEPART = re.compile(
    r"DATEPART\s*\(\s*(?P<part>YEAR|MONTH|DAY)\s*,\s*", re.IGNORECASE)
_BRACKET_IDENT = re.compile(r"\[(?P<name>[A-Za-z_][\w ]*)\]")
# The argument may contain one level of nested parens (function calls:
# CONVERT(DATE, f(x))); deeper nesting deliberately does NOT match and is
# caught by the leftover guard below instead of being mangled.
_CONVERT_DATE = re.compile(
    r"CONVERT\s*\(\s*DATE\s*,\s*(?P<expr>(?:[^()]|\([^()]*\))+)\)",
    re.IGNORECASE)
_LEFTOVER = re.compile(r"CONVERT\s*\(|AT\s+TIME\s+ZONE|DATEPART\s*\(",
                       re.IGNORECASE)


def translate_tsql(sql: str) -> str:
    """Rewrite the reference's T-SQL-isms into Spark SQL.

    Raises ValueError if any T-SQL construct survives the rewrite
    (unmatched CONVERT/AT TIME ZONE/DATEPART shape): a query outside the
    supported patterns must fail loudly, not pass through silently
    mis-rewritten (ADVICE r1).
    """
    def tz_sub(m: re.Match) -> str:
        iana = _TZ_MAP.get(m.group("tz"), m.group("tz"))
        return f"from_utc_timestamp({m.group('expr')}, '{iana}')"

    out = _AT_TZ.sub(tz_sub, sql)
    out = _DATEPART.sub(lambda m: f"{m.group('part').lower()}(", out)
    out = _BRACKET_IDENT.sub(lambda m: f"`{m.group('name')}`", out)
    out = _CONVERT_DATE.sub(lambda m: f"CAST({m.group('expr').strip()} AS DATE)", out)
    left = _LEFTOVER.search(out)
    if left:
        snippet = out[left.start():left.start() + 60]
        raise ValueError(
            f"translate_tsql: unsupported T-SQL construct at {left.start()}: "
            f"{snippet!r}")
    return out

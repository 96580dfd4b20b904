"""Lock-retry connection discipline (SURVEY.md §2.1 S9).

The reference's warehouse build retries its DuckDB connect when a BI tool
holds the file lock: up to 5 attempts, 2 s apart, retrying ONLY on
"Conflicting lock" errors, re-raising anything else immediately, and
failing with an explicit RuntimeError once attempts are exhausted
(create_duckdb.py:43-58). The same situation exists Spark-side whenever a
single-writer source sits behind JDBC (an embedded Derby/SQLite feed, a
database mid-failover): the generic combinator below wraps any connect/
read callable with exactly those semantics.

Kept deliberately side-effect-free and injectable (``sleep``) so tests
exercise every branch without wall-clock waits.
"""

from __future__ import annotations

import time
from collections.abc import Callable

# Lock-shaped markers across the engines this repo touches: DuckDB's
# "Conflicting lock", Derby's XSDB6 double-boot, SQLite's "database is
# locked", generic JDBC lock timeouts.
LOCK_MARKERS = (
    "conflicting lock", "database is locked", "lock timeout",
    "another instance of derby may have already booted", "xsdb6",
)


def is_lock_error(exc: BaseException) -> bool:
    msg = str(exc).lower()
    return any(m in msg for m in LOCK_MARKERS)


def connect_with_retry(connect: Callable, *, max_retries: int = 5,
                       wait_seconds: float = 2.0,
                       retryable: Callable[[BaseException], bool] = is_lock_error,
                       sleep: Callable[[float], None] = time.sleep):
    """Call ``connect()`` with the reference's lock-retry contract:

    - a result returns immediately;
    - an exception ``retryable()`` deems lock-shaped is retried up to
      ``max_retries`` attempts with ``wait_seconds`` between them;
    - any other exception re-raises unchanged on the spot;
    - exhausted attempts raise ``RuntimeError`` chained to the last
      lock error (the reference's explicit "persistent lock" failure).
    """
    last: BaseException | None = None
    for attempt in range(max_retries):
        try:
            return connect()
        except BaseException as e:  # noqa: BLE001 — classify then re-raise
            if not retryable(e):
                raise
            last = e
            if attempt < max_retries - 1:
                sleep(wait_seconds)
    raise RuntimeError(
        f"could not connect after {max_retries} attempts due to a "
        f"persistent lock") from last

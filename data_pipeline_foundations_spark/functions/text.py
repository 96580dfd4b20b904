"""Text-analysis column expressions for the training-data pipeline surface.

All JVM-side built-ins — no Python UDFs in the hot path. Each function has a
DuckDB-oracle twin so the driver's differential check covers them.

Operators:
  tokens / token_count — whitespace tokenization (the `documents` corpus is
      space-separated), plus a BPE-ish regex token count for realistic text.
  stopword_ratio / langid — tiny n-gram/stopword heuristic language ID.
  quality_score — length / punctuation / stopword-ratio quality features.
  shingles — word n-grams (dedup building block).
  fingerprint — order-sensitive rolling document fingerprint via md5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import md5_long, oracle_md5_long

# A tiny embedded stopword list: enough for a heuristic language/quality
# signal without external models (the container has no langid libs).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens. Oracle: string_split_regex(c, '\\s+')…
    kept to single-space split for exact parity: string_split(c, ' ')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, " ")).cast("long")


def oracle_token_count(sql_col: str) -> str:
    return f"CAST(len(string_split({sql_col}, ' ')) AS BIGINT)"


def stopword_count(col: Column | str, stopwords=EN_STOPWORDS) -> Column:
    """How many tokens are in the stopword list (JVM-side: filter on the
    token array)."""
    toks = tokens(col)
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def oracle_stopword_count(sql_col: str, stopwords=EN_STOPWORDS) -> str:
    lst = ", ".join(f"'{s}'" for s in stopwords)
    return (f"CAST(len(list_filter(string_split({sql_col}, ' '), "
            f"t -> list_contains([{lst}], t))) AS BIGINT)")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings: join of each length-n token window.

    Expressed with ``transform`` over token indexes — stays in codegen.
    """
    toks = tokens(col)
    # index i in 0..size-n  → concat_ws(' ', slice(toks, i+1, n))
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    return F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def oracle_shingles(sql_col: str, n: int = 3) -> str:
    toks = f"string_split({sql_col}, ' ')"
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )


def fingerprint(col: Column | str) -> Column:
    """Order-sensitive 60-bit document fingerprint: md5 over the normalized
    (lowercased, space-collapsed) text. A rolling-hash analog the oracle can
    reproduce exactly."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return md5_long(norm)


def oracle_fingerprint(sql_col: str) -> str:
    norm = f"regexp_replace(lower(trim({sql_col})), '\\s+', ' ', 'g')"
    return oracle_md5_long(norm)

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
    # index i in 1..size-n+1  → concat_ws(' ', slice(toks, i, n)). Guarded:
    # sequence(1, 0) would run DESCENDING in Spark (step defaults to -1),
    # so a doc shorter than n tokens must short-circuit to [] — which is
    # what the oracle twin's range(1, 1) already produces.
    count = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(grams)


def oracle_shingles(sql_col: str, n: int = 3) -> str:
    toks = f"string_split({sql_col}, ' ')"
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )


def unique_token_ratio(col: Column | str) -> Column:
    """distinct tokens / total tokens — the basic lexical-diversity signal
    (near-0 for degenerate repeated-word documents). Scan-local HOFs."""
    toks = tokens(col)
    return (F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double"))


def oracle_unique_token_ratio(sql_col: str) -> str:
    toks = f"string_split({sql_col}, ' ')"
    return (f"CAST(len(list_distinct({toks})) AS DOUBLE)"
            f" / CAST(len({toks}) AS DOUBLE)")


def top_token_frac(col: Column | str) -> Column:
    """Fraction of tokens taken by the single most frequent token (the
    Gopher-style "most common word" repetition signal).

    Scan-local: sort the token array, then one ``aggregate`` fold tracking
    (prev token, current run, best run) — O(n log n) per row inside
    whole-stage codegen, no explode/shuffle. The oracle computes the same
    maximum count by brute force over the distinct-token list (O(d·n) per
    row — fine for an oracle, wrong for the engine)."""
    toks = tokens(col)
    return (_best_run(F.array_sort(toks)).cast("double")
            / F.size(toks).cast("double"))


def oracle_top_token_frac(sql_col: str) -> str:
    toks = f"string_split({sql_col}, ' ')"
    top = (f"list_max(list_transform(list_distinct({toks}), "
           f"t -> len(list_filter({toks}, x -> x = t))))")
    return f"CAST({top} AS DOUBLE) / CAST(len({toks}) AS DOUBLE)"


def dup_ngram_frac(col: Column | str, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram
    (1 - distinct/total), the Gopher duplicate-n-gram signal. 0.0 for
    documents too short to have any n-gram."""
    grams = shingles(col, n)
    return F.when(F.size(grams) <= 0, F.lit(0.0)).otherwise(
        F.lit(1).cast("double")
        - F.size(F.array_distinct(grams)).cast("double")
        / F.size(grams).cast("double"))


def oracle_dup_ngram_frac(sql_col: str, n: int = 2) -> str:
    grams = oracle_shingles(sql_col, n)
    return (f"CASE WHEN len({grams}) <= 0 THEN CAST(0 AS DOUBLE)"
            f" ELSE CAST(1 AS DOUBLE)"
            f" - CAST(len(list_distinct({grams})) AS DOUBLE)"
            f" / CAST(len({grams}) AS DOUBLE) END")


def _best_run(sorted_toks: Column) -> Column:
    """Longest equal-run in a sorted array via one aggregate fold."""
    return F.aggregate(
        sorted_toks,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)))
            .alias("best")),
        lambda acc: acc["best"])


def with_repetition_stats(df, text_col: str = "text", n: int = 2):
    """Add n_tokens / unique_token_ratio / top_token_frac / dup_ngram_frac
    in STAGED projections: every lambda-bearing intermediate (token array,
    sorted array, n-gram array, their distinct sizes, the run fold) is a
    named column computed exactly once. Spark's codegen subexpression
    elimination skips higher-order functions, so the composable
    single-column forms above re-run each HOF once per reference — fine
    for a one-off expression, 2-3× waste when several stats plus a keep
    flag share them (measured ~2× on the x22 bench at sf0.1)."""
    toks = F.col("_toks")
    count = F.size(toks) - F.lit(n - 1)
    grams = F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n))))
    d = (df.withColumn("_toks", tokens(text_col))
         .withColumn("_grams", grams)
         .withColumn("_best", _best_run(F.array_sort(toks)))
         .withColumn("_n", F.size(toks))
         .withColumn("_nd", F.size(F.array_distinct(toks)))
         .withColumn("_ng", F.size("_grams"))
         .withColumn("_ngd", F.size(F.array_distinct("_grams"))))
    return (d.withColumn("n_tokens", F.col("_n").cast("long"))
            .withColumn("unique_token_ratio",
                        F.col("_nd").cast("double") / F.col("_n").cast("double"))
            .withColumn("top_token_frac",
                        F.col("_best").cast("double") / F.col("_n").cast("double"))
            .withColumn("dup_ngram_frac",
                        F.when(F.col("_ng") <= 0, F.lit(0.0)).otherwise(
                            F.lit(1).cast("double")
                            - F.col("_ngd").cast("double")
                            / F.col("_ng").cast("double")))
            .drop("_toks", "_grams", "_best", "_n", "_nd", "_ng", "_ngd"))


# --- PII detection / redaction ---------------------------------------------
# Patterns restricted to syntax Java's regex engine and DuckDB's RE2 parse
# identically (character classes, bounded quantifiers, non-capturing
# groups, \b word boundaries; no lookaround, no backreferences). All
# deliberately conservative — a dedup pipeline redacting too eagerly
# destroys data; these only fire on well-formed shapes:
#   credit_card requires 4x4 digits WITH separators (a bare 16-digit run
#   is usually an id, and validating checksums needs Luhn, which regex
#   can't express without backreferences);
#   national_id is the 3-2-4 dashed SSN shape;
#   ipv4 enforces 0-255 octets.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IPV4_RE = (r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
           r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b")
CC_RE = r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b"
NID_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

# name → (pattern, placeholder); dict order IS the redaction order (the
# shapes are mutually non-overlapping — digit counts + \b make a match
# of one class impossible inside another — so order only needs to be
# deterministic, not clever).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (EMAIL_RE, "<EMAIL>"),
    "phone": (PHONE_RE, "<PHONE>"),
    "ipv4": (IPV4_RE, "<IPV4>"),
    "credit_card": (CC_RE, "<CC>"),
    "national_id": (NID_RE, "<NID>"),
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """{class: match count} for every PII pattern class — JVM-side
    regexp_count, scan-local."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.regexp_count(c, F.lit(pat)).cast("long")
            for name, (pat, _) in PII_PATTERNS.items()}


def oracle_pii_counts(sql_col: str) -> dict[str, str]:
    return {name:
            f"CAST(len(regexp_extract_all({sql_col}, '{pat}')) AS BIGINT)"
            for name, (pat, _) in PII_PATTERNS.items()}


def pii_redact(col: Column | str) -> Column:
    """Replace every match of every class with its typed placeholder.
    Spark's regexp_replace is global by default; the oracle passes RE2's
    'g' flag."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, placeholder in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, placeholder)
    return c


def oracle_pii_redact(sql_col: str) -> str:
    e = sql_col
    for pat, placeholder in PII_PATTERNS.values():
        e = f"regexp_replace({e}, '{pat}', '{placeholder}', 'g')"
    return e


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


def canonical_url(col: Column | str) -> Column:
    """Crawl-frontier URL canonicalization, 3 regex passes: strip
    query+fragment (from the earliest of ?/#), trailing slash, then
    scheme and/or leading www. in one anchored pattern — BOTH optional,
    so a scheme-less 'www.host/...' capture still canonicalizes to the
    bare host (blocklists and dedup must not be evadable by omitting
    the scheme). Shared by the batch x62 operator and the streaming URL
    frontier; the DuckDB twin mirrors the same three patterns."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(F.regexp_replace(
        c, r"[?#].*$", ""), r"/$", ""), r"^(https?://)?(www\.)?", "")


def url_host(col: Column | str) -> Column:
    """Host part of a canonicalized URL (everything before the first /)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^([^/]+)", 1)

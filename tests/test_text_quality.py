"""Unit checks for the repetition-filter and PII expressions on known
tiny inputs (the parity suite covers corpus-scale equivalence; these pin
the semantics a human can eyeball)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_foundations_spark.functions.text import (
    dup_ngram_frac, pii_counts, pii_redact, top_token_frac,
    unique_token_ratio,
)


def _one(spark, text: str, col):
    return (spark.createDataFrame([(text,)], "text string")
            .select(col.alias("v")).first().v)


@pytest.mark.parametrize("text,expected", [
    ("a b c d", 1.0),
    ("a a a a", 0.25),
    ("a b a b", 0.5),
])
def test_unique_token_ratio(spark, text, expected):
    assert _one(spark, text, unique_token_ratio("text")) == expected


@pytest.mark.parametrize("text,expected", [
    ("a b c d", 0.25),       # every token once -> 1/4
    ("a a a b", 0.75),       # 'a' x3 of 4
    ("b a b a b", 0.6),      # 'b' x3 of 5
])
def test_top_token_frac(spark, text, expected):
    assert _one(spark, text, top_token_frac("text")) == expected


@pytest.mark.parametrize("text,expected", [
    ("a b c d", 0.0),        # 3 bigrams, all distinct
    ("a b a b", 1.0 - 2.0 / 3.0),  # ab,ba,ab -> 2 distinct of 3
    ("a", 0.0),              # no bigram -> defined as 0
])
def test_dup_bigram_frac(spark, text, expected):
    assert _one(spark, text, dup_ngram_frac("text", 2)) == expected


def test_pii_counts_and_redact(spark):
    raw = "mail a.b@x.co and c@y.io call +1-555-0100 not 555-0100"
    n_e, n_p = pii_counts("text")
    row = (spark.createDataFrame([(raw,)], "text string")
           .select(n_e.alias("e"), n_p.alias("p"),
                   pii_redact("text").alias("r")).first())
    assert (row.e, row.p) == (2, 1)
    assert row.r == "mail <EMAIL> and <EMAIL> call <PHONE> not 555-0100"


def test_pii_noop_on_clean_text(spark):
    row = (spark.createDataFrame([("no pii here",)], "text string")
           .select(pii_redact("text").alias("r"),
                   *[c.alias(n) for c, n in
                     zip(pii_counts("text"), ("e", "p"))]).first())
    assert (row.e, row.p, row.r) == (0, 0, "no pii here")

"""End-to-end corpus curation: quality floor → exact dedup → mixture
sample → context-window packing, as one lazy DataFrame composition.

This is the pipeline the individual operators exist for; keeping it as a
function (rather than only the x21 registry entry) makes each stage's
contract unit-testable on crafted corpora — the synthetic testdata has
no exact duplicates or sub-floor documents, so without crafted inputs
the filter and dedup stages would never be observed dropping a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import fingerprint, token_count
from .sampling import sequence_packing, stratified_sample


def curate_corpus(docs: DataFrame, *, rates: dict[str, float],
                  min_tokens: int = 10, budget: int = 2048,
                  seed: int = 7) -> DataFrame:
    """(doc_id, lang, source, n_tokens, pack_id, pack_offset) for the
    curated survivors of ``docs``.

    Stage order is the real pipeline order — pack offsets are computed
    over the post-sample corpus:
      1. quality floor: at least ``min_tokens`` whitespace tokens;
      2. exact dedup: canonical = min doc_id per content fingerprint
         (one shuffle on the 60-bit key, unbounded-frame window min —
         no sort);
      3. deterministic language-mixture sample (map-side filter);
      4. concat-and-chunk packing per source shard.
    """
    q = (docs.withColumn("n_tokens", token_count("text"))
         .withColumn("fp", fingerprint("text"))
         .filter(F.col("n_tokens") >= min_tokens))
    dq = (q.withColumn("keep_id", F.min("doc_id").over(W.partitionBy("fp")))
          .filter(F.col("doc_id") == F.col("keep_id"))
          .select("doc_id", "lang", "source", "n_tokens"))
    s = stratified_sample(dq, strata_col="lang", rates=rates,
                          key_col="doc_id", seed=seed)
    return (sequence_packing(s, group_col="source", order_col="doc_id",
                             tokens_col="n_tokens", budget=budget)
            .select("doc_id", "lang", "source", "n_tokens",
                    "pack_id", "pack_offset"))

"""Streaming mixture resampling (Structured Streaming).

The streaming twin of operators/sampling.temperature_resample: documents
arrive continuously and each stratum keeps its sqrt-temperature share.
The thresholds are a STATIC profile — mixture proportions are a property
of the corpus epoch, not of one micro-batch, so production recomputes
them offline (the batch operator) and the stream consumes them as a
broadcast stream-static join. Membership is the same deterministic md5
bucket as the batch path, so a replayed stream admits EXACTLY the batch
operator's row set given the same thresholds — pinned by
tests/test_streaming.py.

No state, no watermark: the whole operator is a broadcast join plus a
map-side filter, which is why it composes with any upstream watermarked
source without adding eviction semantics of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import _bucket


def resample_stream(docs: DataFrame, thresholds: DataFrame, *,
                    strata_col: str = "lang", key_col: str = "doc_id",
                    seed: int = 13) -> DataFrame:
    """Keep each streamed row iff its deterministic md5 bucket falls
    under its stratum's ``keep_threshold`` (a static (stratum,
    keep_threshold) profile from the batch temperature_resample)."""
    return (docs.join(F.broadcast(thresholds), strata_col)
            .filter(_bucket(key_col, seed) < F.col("keep_threshold")))

"""Online ANN serving (Structured Streaming + the stored-codes index).

Queries arrive as a stream; the index is the STATIC artifact pair the
batch side maintains (operators/similarity.build_ivfpq_model +
encode_corpus): per micro-batch, the tiny query set collects driver-side
(exactly the per-call collect the batch search performs), its ADC
distance tables are built from the model's codebooks, and one map pass
over the code table answers every query in the batch. foreachBatch is
the right harness — the search is a per-batch BATCH computation against
static state, not a stream-stream join, and results flow to whatever
sink the caller's callback writes (a topic, a table, a memory list in
tests).

Two serving modes (VERDICT r4 task #7):

- **Pinned index**: pass ``codes``/``model`` — every batch answers
  against the same artifacts (the availableNow drain shape).
- **Rolling index**: pass ``codes_root`` (a versioned-snapshot directory
  maintained by the batch side: re-encode → ``write_versioned``) and
  optionally ``model_path`` (a save_ivfpq_model artifact). Each batch
  re-resolves the CURRENT committed code version (and reloads the
  KB-sized model), so a nightly re-encode swaps into the live query
  stream at the next micro-batch with no restart — and the snapshot
  protocol guarantees a batch never reads a half-written code table
  (the swap is the new version's _SUCCESS marker). The stamped model
  params on the code column keep a codes/model mismatch a hard error,
  not a silent wrong answer.

Batch≡stream is pinned by tests/test_streaming.py: on a closed query
stream the served results equal operators/similarity.pq_search_from_codes
row-for-row — same kernels, same exact-int arithmetic, only the arrival
framing differs; the rolling-swap test pins that batches before/after a
commit answer against the respective code versions, under a live
processing-time trigger.

Scale: the code table is m ints per corpus vector (bucket it by cid and
persist; re-read per batch like every stream-static side), per-batch
driver state is |batch| query vectors, and nothing accumulates across
batches — serving state is zero.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def serve_pq_queries(query_stream: DataFrame, codes: DataFrame | None = None,
                     model: dict | None = None, *, id_col: str = "vec_id",
                     vec_col: str = "embedding", k: int = 5,
                     on_result: Callable[[DataFrame, int], None],
                     trigger_available_now: bool = True,
                     processing_time: str | None = None,
                     codes_root: str | None = None,
                     model_path: str | None = None):
    """Start the serving query. ``on_result(result_df, batch_id)`` runs
    once per micro-batch with that batch's (query_id, neighbor_id, rank,
    approx_dist) results; empty batches are skipped. Returns the started
    StreamingQuery (caller awaits/stops it).

    Index resolution: ``codes_root`` (versioned snapshot dir) takes
    precedence over a static ``codes`` frame and is re-resolved per
    batch; ``model_path`` likewise over ``model``. ``processing_time``
    (e.g. ``"1 second"``) switches from the availableNow drain to a live
    continuous trigger.
    """
    from ..operators.similarity import pq_search_from_codes

    if codes is None and codes_root is None:
        raise ValueError("serve_pq_queries: pass codes= or codes_root=")
    if model is None and model_path is None:
        raise ValueError("serve_pq_queries: pass model= or model_path=")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if model_path is not None:
            from ..operators.similarity import load_ivfpq_model
            m = load_ivfpq_model(spark, model_path)
        else:
            m = model
        if codes_root is not None:
            from ..sources.warehouse import read_versioned
            c = read_versioned(spark, codes_root)
        else:
            c = codes
        result = pq_search_from_codes(c, batch_df, m,
                                      id_col=id_col, vec_col=vec_col, k=k)
        on_result(result, batch_id)

    writer = query_stream.writeStream.foreachBatch(handle)
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

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

Batch≡stream is pinned by tests/test_streaming.py: on a closed query
stream the served results equal operators/similarity.pq_search_from_codes
row-for-row — same kernels, same exact-int arithmetic, only the arrival
framing differs.

Scale: the code table is m ints per corpus vector (bucket it by cid and
persist; re-read per batch like every stream-static side), per-batch
driver state is |batch| query vectors, and nothing accumulates across
batches — serving state is zero.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def serve_pq_queries(query_stream: DataFrame, codes: DataFrame,
                     model: dict, *, id_col: str = "vec_id",
                     vec_col: str = "embedding", k: int = 5,
                     on_result: Callable[[DataFrame, int], None],
                     trigger_available_now: bool = True):
    """Start the serving query. ``on_result(result_df, batch_id)`` runs
    once per micro-batch with that batch's (query_id, neighbor_id, rank,
    approx_dist) results; empty batches are skipped. Returns the started
    StreamingQuery (caller awaits/stops it)."""
    from ..operators.similarity import pq_search_from_codes

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        result = pq_search_from_codes(codes, batch_df, model,
                                      id_col=id_col, vec_col=vec_col, k=k)
        on_result(result, batch_id)

    writer = query_stream.writeStream.foreachBatch(handle)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

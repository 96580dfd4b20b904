"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The design target (BASELINE.json north star): image/audio/video travel as
``binary`` columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas``. The container ships no image/audio libraries, so the real
decoders are STUBBED behind import-tries (`decode_image`), while the
Spark-side plumbing — BinaryType schema, batch iteration, output schema,
partition behavior — is real and oracle-checked via a deterministic
feature extractor (every "fake" feature is a pure function of the payload
bytes that the DuckDB oracle reproduces: lengths and md5-derived values).

At 100 TB: payloads dominate I/O, so the metadata struct is computed once
at ingest (scan-side), feature extraction is batch-vectorized with bounded
batch sizes (spark.sql.execution.arrow.maxRecordsPerBatch), and nothing
ever collects payloads to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id long, n_bytes long, content_md5 string, "
                  "fake_width int, fake_height int")


def attach_binary(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Simulate a multimodal ingest: payload as binary + metadata struct.

    (With real images the payload would come from `binaryFile` format or a
    pointer column; the testdata corpus has no binary column, so the text
    bytes stand in — the plumbing is identical.)
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )
    return docs.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def extract_features(binarized: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Deterministic stand-in for an image decoder: n_bytes, md5, and
    md5-derived fake dimensions. Each batch is a pandas DataFrame whose
    ``payload`` column holds bytes — exactly the shape a real decoder
    (PIL/libvips/ffmpeg) would consume.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            md5s = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "content_md5": md5s,
                "fake_width": [int(h[:15], 16) % 1024 + 1 for h in md5s],
                "fake_height": [int(h[15:30], 16) % 1024 + 1 for h in md5s],
            })

    return binarized.mapInPandas(batches, schema=FEATURE_SCHEMA)


def oracle_features_sql() -> str:
    """DuckDB twin of attach_binary ∘ extract_features over documents."""
    return """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 1024 + 1 AS INTEGER) AS fake_width,
           CAST(CAST(('0x' || substring(md5(text), 16, 15)) AS BIGINT) % 1024 + 1 AS INTEGER) AS fake_height
    FROM documents
    """


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode — STUB: the container has no imaging libraries.

    Wire-up point for PIL/torchvision on a real cluster; the mapInPandas
    plumbing in extract_features is the production call path.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not present in this "
            "container; extract_features() exercises the identical "
            "mapInPandas plumbing with deterministic features"
        ) from e
    import io
    return Image.open(io.BytesIO(payload))


RESIZE_SCHEMA = ("doc_id long, n_bytes long, target_w int, target_h int, "
                 "resized_md5 string")


def resize_images(binarized: DataFrame, *, width: int = 256,
                  height: int = 256, id_col: str = "doc_id") -> DataFrame:
    """Image resize over mapInPandas — the batch shape a real resizer
    (PIL/libvips) plugs into. The container has no imaging libs, so the
    transform is a deterministic stand-in: the "resized" payload is the
    md5 of (payload + WxH tag), standing in for re-encoded bytes. The
    Spark-side contract — binary in, per-batch vectorized transform,
    typed schema out, partition-parallel — is the real thing.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"|{width}x{height}".encode()
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "target_w": width,
                "target_h": height,
                "resized_md5": [hashlib.md5(bytes(p) + tag).hexdigest()
                                for p in pdf["payload"]],
            })

    return binarized.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


def sample_frames(binarized: DataFrame, *, every_n_bytes: int = 64,
                  max_frames: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling for video payloads: one OUTPUT ROW PER FRAME
    (row-expanding mapInPandas — the UDTF shape). Frames are byte-stride
    slices of the payload standing in for decoded video frames; a real
    decoder (ffmpeg) replaces the slicing, not the plumbing. Output
    cardinality = ceil(len/stride) capped at max_frames per doc.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, md5s = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                n = min(max_frames, max(1, -(-len(b) // every_n_bytes)))
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    md5s.append(hashlib.md5(
                        b[i * every_n_bytes:(i + 1) * every_n_bytes]).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_md5": md5s})

    return binarized.mapInPandas(batches, schema=FRAME_SCHEMA)

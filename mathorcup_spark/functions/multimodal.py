"""Multimodal-column plumbing (SURVEY.md §2.13): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators.

The Spark-side machinery — schema, partitioning, batch iteration, UDF
signatures — is real and tested; the actual codec step is STUBBED:
this container has no image/audio libraries, so ``decode_image``
raises ``NotImplementedError`` unless a decoder is injected, and the
pipeline default is :func:`fake_decode_meta`, a deterministic
arithmetic "decoder" over the payload bytes (which also makes the
whole mapInPandas path oracle-checkable — rare for a Python-UDF
operator).

Scale posture: payloads stay opaque bytes end-to-end (no JVM→Python
string conversion beyond Arrow buffers); decode is embarrassingly
parallel per partition; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``. At 100 TB the
payload column lives in its own parquet column chunk so metadata-only
queries never read it (column pruning).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, modality string"
)


def decode_image(payload: bytes) -> dict:
    """Real image decoder — active when Pillow is installed, else a
    clear ``NotImplementedError`` (the environment contract: this
    container ships no codec libraries, so the default pipeline path
    uses :func:`fake_decode_meta`; tests/test_multimodal_codec.py
    exercises this path and skips itself when Pillow is absent).

    Returns the same metadata contract as ``fake_decode_meta`` so the
    two decoders are drop-in interchangeable in
    :func:`decode_pipeline`.
    """
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow; inject a decoder via "
            "decode_pipeline(..., decoder=...) or use fake_decode_meta"
        ) from e
    import io

    with Image.open(io.BytesIO(payload)) as im:
        im.load()
        return {
            "n_bytes": len(payload),
            "width": im.width,
            "height": im.height,
            "n_frames": int(getattr(im, "n_frames", 1)),
            "modality": "image",
        }


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in decoder: metadata derived arithmetically
    from the byte length (so tests and oracles can pin the plumbing)."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640,
        "height": (n // 7) % 480,
        "n_frames": n % 30 + 1,
        "modality": "image" if n % 2 == 0 else "audio",
    }


def decode_pipeline(
    with_payload: DataFrame,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """mapInPandas decode: (doc_id, payload binary) → typed metadata.

    Arrow delivers ``payload`` as raw bytes per batch; the decoder runs
    once per row inside the batch loop — the real-codec shape (decode,
    resize, frame-sample all slot in here).

    The default decoder is defined *inside* the closure: executor
    Python workers cannot import this package (it is not shipped to
    them), so the pickled function must be self-contained. A custom
    ``decoder`` must itself be importable on the workers (or a
    worker-local lambda).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def default_decode(payload: bytes) -> dict:
            # keep in sync with fake_decode_meta (oracle depends on it)
            n = len(payload)
            return {
                "n_bytes": n,
                "width": n % 640,
                "height": (n // 7) % 480,
                "n_frames": n % 30 + 1,
                "modality": "image" if n % 2 == 0 else "audio",
            }

        dec = decoder or default_decode
        for pdf in batches:
            metas = [dec(p) for p in pdf["payload"]]
            out = _pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return with_payload.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of the text stand in
    for an image/audio blob; at ingest this is the raw file content)."""
    return docs.withColumn("payload", F.encode("text", "UTF-8"))


@register(
    "mm_decode_metadata",
    oracle="""
    WITH sized AS (
      SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n
      FROM documents
    )
    SELECT doc_id,
           n AS n_bytes,
           CAST(n % 640 AS INTEGER) AS width,
           CAST((n // 7) % 480 AS INTEGER) AS height,
           CAST(n % 30 + 1 AS INTEGER) AS n_frames,
           CASE WHEN n % 2 = 0 THEN 'image' ELSE 'audio' END AS modality
    FROM sized
    """,
    doc="Multimodal decode pipeline: binary payload column → "
    "mapInPandas (Arrow batches) → typed metadata rows. The decoder is "
    "the deterministic fake (real codecs are stubbed per environment), "
    "which makes this Python-UDF path fully oracle-checkable: the "
    "oracle recomputes the same arithmetic from the payload length.",
    tags=("multimodal", "mapInPandas"),
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return decode_pipeline(with_binary_payload(docs))


@register(
    "mm_payload_stats",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY source
    """,
    doc="Binary-column metadata aggregation without touching Python: "
    "payload sizes grouped by source — the metadata-only scan shape "
    "where column pruning must keep the payload chunk unread.",
    tags=("multimodal",),
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
    )


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int"
)


@register(
    "mm_resize_plan",
    oracle="""
    WITH sized AS (
      SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents
    ), meta AS (
      SELECT doc_id, CAST(n % 640 AS INTEGER) AS width,
             CAST((n // 7) % 480 AS INTEGER) AS height
      FROM sized WHERE n % 2 = 0
    )
    SELECT doc_id, width, height,
           CAST(floor(width  * (224.0 / greatest(width, height, 1))) AS INTEGER) AS out_w,
           CAST(floor(height * (224.0 / greatest(width, height, 1))) AS INTEGER) AS out_h
    FROM meta
    """,
    doc="Image resize stage (fit longest side to 224): decode metadata "
    "(mapInPandas stage 1) chained into a second Arrow-batched "
    "mapInPandas stage that computes the target geometry with numpy — "
    "the exact plumbing a real pixel resize runs through (swap the "
    "geometry arithmetic for PIL/cv2 on the payload bytes); batch "
    "shape, schema, and chaining are real and oracle-checked via the "
    "deterministic fake decode. Scale math stays in IEEE doubles so "
    "numpy and DuckDB floor identically.",
    tags=("multimodal", "mapInPandas", "resize"),
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    meta = decode_pipeline(with_binary_payload(docs)).filter(
        F.col("modality") == "image"
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            w = pdf["width"].to_numpy(dtype="int64")
            h = pdf["height"].to_numpy(dtype="int64")
            scale = 224.0 / np.maximum(np.maximum(w, h), 1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": np.floor(w * scale).astype("int32"),
                    "out_h": np.floor(h * scale).astype("int32"),
                }
            )

    return meta.select("doc_id", "width", "height").mapInPandas(
        resize_batches, schema=RESIZED_SCHEMA
    )


@register(
    "mm_frame_sample",
    oracle="""
    WITH sized AS (
      SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
      FROM documents
    ), meta AS (
      SELECT doc_id, n, CAST(n % 30 + 1 AS INTEGER) AS n_frames
      FROM sized WHERE n % 2 = 1
    )
    SELECT m.doc_id, CAST(t.f AS INTEGER) AS frame_idx,
           CAST(t.f * (m.n // m.n_frames) AS BIGINT) AS byte_offset
    FROM meta m JOIN generate_series(0, 29, 5) t(f) ON t.f < m.n_frames
    """,
    doc="Frame sampling (every 5th frame of audio/video payloads): the "
    "1-to-N row expansion is a JVM-side explode(sequence(...)) over "
    "the decoded frame count — no Python in the expansion itself; a "
    "real decoder would then fetch each sampled frame's bytes in a "
    "downstream mapInPandas (the mm_resize_plan stage shape). "
    "byte_offset = frame_idx * frame_stride demonstrates the typed "
    "pointer-into-payload output a trainer consumes.",
    tags=("multimodal", "framesample"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    meta = decode_pipeline(with_binary_payload(docs)).filter(
        F.col("modality") == "audio"
    )
    return (
        meta.select(
            "doc_id",
            F.col("n_bytes").cast("long").alias("n"),
            F.col("n_frames"),
        )
        .select(
            "doc_id",
            "n",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))
            ).alias("f"),
        )
        .select(
            "doc_id",
            F.col("f").cast("int").alias("frame_idx"),
            (F.col("f") * F.expr("n div n_frames")).cast("long").alias("byte_offset"),
        )
    )

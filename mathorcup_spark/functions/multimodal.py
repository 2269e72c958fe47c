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
    """Real decoder stub — inject Pillow/ffmpeg here on a real cluster.

    Gated behind import-try per the environment contract: the
    container ships no codec libraries.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow; inject a decoder via "
            "decode_pipeline(..., decoder=...) or use fake_decode_meta"
        ) from e
    raise NotImplementedError("wire Image.open(BytesIO(payload)) here")


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

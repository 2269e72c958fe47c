"""Real-codec path for the multimodal decode pipeline.

Skipped when Pillow is absent (this container ships no codec libs —
the environment contract); on a real cluster with Pillow installed
these tests prove ``decode_image`` is a working drop-in for the
synthetic decoder, through the same Arrow ``mapInPandas`` plumbing
the oracle-checked ``mm_*`` queries use.
"""

from __future__ import annotations

import pytest

PIL = pytest.importorskip("PIL")


def _png_bytes(width: int, height: int) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (width, height), color=(200, 10, 10)).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_image_reads_dimensions():
    from mathorcup_spark.functions.multimodal import decode_image

    payload = _png_bytes(12, 7)
    meta = decode_image(payload)
    assert meta["width"] == 12
    assert meta["height"] == 7
    assert meta["n_frames"] == 1
    assert meta["modality"] == "image"
    assert meta["n_bytes"] == len(payload)


def test_decode_pipeline_with_real_codec(spark):
    from mathorcup_spark.functions.multimodal import decode_pipeline

    # Self-contained decoder (pickled by value): executor Python
    # workers can't import this test module or the package — same
    # contract as decode_pipeline's own default decoder. Mirrors
    # decode_image's Pillow logic exactly.
    def real_decode(payload: bytes) -> dict:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            im.load()
            return {
                "n_bytes": len(payload),
                "width": im.width,
                "height": im.height,
                "n_frames": int(getattr(im, "n_frames", 1)),
                "modality": "image",
            }

    rows = [(1, _png_bytes(8, 8)), (2, _png_bytes(30, 4))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r.asDict()
        for r in decode_pipeline(df, decoder=real_decode).collect()
    }
    assert out[1]["width"] == 8 and out[1]["height"] == 8
    assert out[2]["width"] == 30 and out[2]["height"] == 4

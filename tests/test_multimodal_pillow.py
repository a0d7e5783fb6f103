"""Env-gated REAL image decode through the multimodal pipeline.

extract_image_features' codec hook is exercised everywhere with the
deterministic fake (no codec libs in the sandbox); where Pillow
exists, this test retires the "real decode never executed" caveat:
genuine JPEG/PNG bytes ride the binary payload column and a
PIL-backed decode_fn reports true dimensions through the exact same
Arrow-batched mapInPandas path.

Skips when PIL is not importable (pip is frozen in the sandbox);
the batch shape, schema, partitioning, and fake-codec parity are
covered unconditionally in tests/test_multimodal.py.
"""

from __future__ import annotations

import io

import pytest

PIL_Image = pytest.importorskip(
    "PIL.Image",
    reason=(
        "real-codec decode needs Pillow (not installable in this "
        "sandbox); fake-codec coverage lives in tests/test_multimodal.py"
    ),
)


def _png_bytes(width: int, height: int) -> bytes:
    img = PIL_Image.new("RGB", (width, height), (width % 256, height % 256, 7))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_real_pillow_decode_reports_true_dimensions(spark):
    import hashlib

    from pyspark.sql import functions as F

    from big_data_spark.operators.multimodal import extract_image_features

    sizes = [(64, 48), (128, 96), (320, 200), (17, 93)]
    rows = [
        (i, "image", "png", _png_bytes(w, h)) for i, (w, h) in enumerate(sizes)
    ]
    media = (
        spark.createDataFrame(
            rows, ["media_id", "modality", "codec", "payload"]
        ).withColumn("n_bytes", F.octet_length("payload").cast("long"))
    )

    def pil_decode(payload: bytes) -> tuple[int, int, str]:
        from PIL import Image  # by-value import for pickled executors

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, hashlib.md5(payload).hexdigest()[:16]

    got = {
        r["media_id"]: (r["width"], r["height"])
        for r in extract_image_features(media, decode_fn=pil_decode).collect()
    }
    assert got == {i: wh for i, wh in enumerate(sizes)}


def test_real_pillow_resize_through_arrow_path(spark):
    """Where Pillow exists: genuine PNG payloads resize to the target
    resolution through resize_images' Arrow path, and the outputs
    decode back at exactly the target dimensions."""
    from pyspark.sql import functions as F

    from big_data_spark.operators.multimodal import resize_images

    rows = [
        (i, "image", "png", _png_bytes(w, h))
        for i, (w, h) in enumerate([(64, 48), (320, 200), (17, 93)])
    ]
    media = spark.createDataFrame(
        rows, ["media_id", "modality", "codec", "payload"]
    ).withColumn("n_bytes", F.octet_length("payload").cast("long"))

    def pil_resize(payload: bytes, tw: int, th: int) -> bytes:
        import io as _io

        from PIL import Image

        img = Image.open(_io.BytesIO(payload)).resize((tw, th))
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    out = resize_images(media, 32, 32, pil_resize).collect()
    assert len(out) == 3
    for r in out:
        img = PIL_Image.open(io.BytesIO(bytes(r["payload"])))
        assert (img.width, img.height) == (32, 32)

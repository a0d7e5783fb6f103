"""Multimodal plumbing: schema, Arrow batching, fan-out, and the
stubbed-codec contract (north-star operator set)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_spark.catalog import load_table
from big_data_spark.operators.multimodal import (
    attach_fake_payloads,
    extract_image_features,
    fake_decode,
    sample_frames,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return attach_fake_payloads(docs).cache()


def test_payload_schema_and_bytes(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "modality": "string",
        "codec": "string",
        "payload": "binary",
        "n_bytes": "bigint",
    }
    r = media.first()
    assert isinstance(r["payload"], (bytes, bytearray))
    assert r["n_bytes"] == len(r["payload"])


def test_extract_image_features(media):
    feats = extract_image_features(media, decode_fn=fake_decode)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert 64 <= r["width"] < 64 + 1920
        assert 64 <= r["height"] < 64 + 1080
        assert len(r["phash"]) == 16
    # deterministic: same payload -> same features on re-run
    again = {r["media_id"]: r["phash"] for r in extract_image_features(media, fake_decode).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["phash"]


def test_decode_stub_raises_without_codec(media):
    with pytest.raises(NotImplementedError, match="codec"):
        extract_image_features(media, decode_fn=None)


def test_frame_sampling_fanout(media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    per = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per)
    assert frames.count() >= media.count()
    r = frames.filter(F.col("frame_idx") == 0).first()
    assert isinstance(r["frame_bytes"], (bytes, bytearray))
    assert len(r["frame_bytes"]) <= 64


def test_frame_sampling_udtf_matches_mapinpandas(media):
    """The LATERAL-join UDTF form must produce exactly the
    mapInPandas form's rows — same fan-out, same bytes."""
    from big_data_spark.operators.multimodal import sample_frames_via_udtf

    base = sample_frames(media, every_n_bytes=64, max_frames=4)
    via_udtf = sample_frames_via_udtf(media, every_n_bytes=64, max_frames=4)
    assert via_udtf.schema == base.schema
    a = {(r["media_id"], r["frame_idx"]): r["frame_bytes"] for r in base.collect()}
    b = {(r["media_id"], r["frame_idx"]): r["frame_bytes"] for r in via_udtf.collect()}
    assert a == b


def test_resize_images_plumbing_and_codec_gate(spark):
    """resize_images: Arrow-batched, deterministic with the fake
    transcoder (same rows on re-run), output bytes scale with target
    pixel count, and the no-codec gate raises instead of silently
    stubbing."""
    import pytest as _pytest

    from big_data_spark.catalog import load_table
    from big_data_spark.operators.multimodal import (
        attach_fake_payloads,
        fake_resize,
        resize_images,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    media = attach_fake_payloads(docs)

    with _pytest.raises(NotImplementedError):
        resize_images(media, 64, 64).count()

    small = resize_images(media, 64, 64, fake_resize)
    big = resize_images(media, 256, 256, fake_resize)
    s_rows = {r["media_id"]: r for r in small.collect()}
    assert len(s_rows) == 50
    assert all(r["width"] == 64 and r["height"] == 64 for r in s_rows.values())
    # deterministic across runs
    again = {r["media_id"]: r for r in resize_images(media, 64, 64, fake_resize).collect()}
    assert {k: bytes(v["payload"]) for k, v in s_rows.items()} == {
        k: bytes(v["payload"]) for k, v in again.items()
    }
    # bytes scale with pixel count (~16x here)
    b_rows = {r["media_id"]: r for r in big.collect()}
    for mid in s_rows:
        assert len(b_rows[mid]["payload"]) > 4 * len(s_rows[mid]["payload"])
    # Arrow plan, not row-at-a-time Python
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan

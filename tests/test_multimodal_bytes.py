"""Byte-exact frame sampling on non-ASCII payloads — the case the DuckDB
oracle can't reach (no BLOB slicing), pinned here instead (round-1 ADVICE:
char-based slicing misaligned frames whenever bytes != chars)."""

from __future__ import annotations

import hashlib
import math


class _Cat:
    def __init__(self, spark, docs):
        self.spark = spark
        self.documents = docs


def test_frame_sample_bytes_non_ascii(spark):
    from spark_ml_algo_lib_master_tongji_spark.multimodal import media

    text = "héllo wörld ¡ünïcødé — 火花 " * 37  # bytes ≫ chars
    raw = text.encode("utf-8")
    assert len(raw) != len(text)
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")

    got = [
        r.frame_checksum
        for r in media.mm_frame_sample(_Cat(spark, docs))
        .orderBy("frame_idx")
        .collect()
    ]
    want = [
        hashlib.md5(
            raw[i * media.FRAME_BYTES : (i + 1) * media.FRAME_BYTES]
        ).hexdigest()
        for i in range(math.ceil(len(raw) / media.FRAME_BYTES))
    ]
    assert got == want


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_image_decode_gate_raises_without_pil(spark):
    """Default (no injected decoder) path: absent PIL must fail EAGERLY at
    plan-build time with NotImplementedError — never per-task."""
    import pytest

    from spark_ml_algo_lib_master_tongji_spark.multimodal import media

    if _has_pil():
        pytest.skip("PIL present: the gate opens (covered by the real-decode test)")
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(NotImplementedError, match="PIL"):
        media.mm_image_decode(media.media_table(_Cat(spark, docs)))


def test_image_decode_plumbing_with_injected_decoder(spark):
    """Decode branch: an injected deterministic decoder drives the full
    Arrow mapInPandas plumbing — schema, ok/corrupt split, per-row feature
    values — identical to what the PIL body would traverse."""
    from spark_ml_algo_lib_master_tongji_spark.multimodal import media

    def fake_decoder(payload: bytes):
        if len(payload) == 0:
            raise ValueError("empty payload")  # the corrupt branch
        n = len(payload)
        return (n % 640 + 1, n % 480 + 1, 3, [float(payload[0]), 0.5, 0.25])

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "xyz")], "doc_id long, text string"
    )
    out = media.mm_image_decode(
        media.media_table(_Cat(spark, docs)), decoder=fake_decoder
    )
    assert out.columns == [
        "doc_id", "ok", "width", "height", "channels", "channel_means",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[2]["ok"] is False and rows[2]["width"] is None
    for doc_id, text in ((1, "hello world"), (3, "xyz")):
        raw = text.encode("utf-8")
        r = rows[doc_id]
        assert r["ok"] is True
        assert (r["width"], r["height"], r["channels"]) == (
            len(raw) % 640 + 1, len(raw) % 480 + 1, 3,
        )
        assert r["channel_means"] == [float(raw[0]), 0.5, 0.25]


def test_image_decode_real_pil_branch(spark):
    """With PIL importable, the default decoder must decode a real PNG and
    reject the fixture's text bytes as corrupt (skipped in containers
    without media libs — the other branch test covers the gate there)."""
    import pytest

    from spark_ml_algo_lib_master_tongji_spark.multimodal import media

    if not _has_pil():
        pytest.skip("PIL absent: gate branch covered by the raises-test")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 2), color=(255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in media.mm_image_decode(df).collect()}
    assert rows[1]["ok"] is True
    assert (rows[1]["width"], rows[1]["height"]) == (4, 2)
    assert rows[1]["channel_means"][0] == 255.0
    assert rows[2]["ok"] is False

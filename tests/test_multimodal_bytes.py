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

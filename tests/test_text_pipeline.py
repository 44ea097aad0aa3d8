"""Semantic invariants of the round-7 training-prep operators (sequence
packing, sliding-window chunking, 3-gram repetition) — properties the
oracle echo can't distinguish from a shared bug in both SQL dialects:
stream contiguity, tail coverage, and bound checks are asserted from
first principles against the raw token counts.
"""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_SMOKE


def _catalog(spark):
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    return Catalog(spark, SF_SMOKE)


def test_sequence_pack_stream_is_contiguous(spark):
    """Within every shard the doc_id-ordered seq_starts are exactly the
    running sum of token counts (no gaps, no overlap — the concatenated
    stream is contiguous), and bin/spans_boundary are consistent with the
    PACK_CAP cut arithmetic."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        PACK_CAP,
        pipeline_sequence_pack,
        text_token_stats,
    )

    cat = _catalog(spark)
    toks = {
        r["doc_id"]: r["n_tokens"] for r in text_token_stats(cat).collect()
    }
    rows = pipeline_sequence_pack(cat).collect()
    assert len(rows) == len(toks)  # every doc packed exactly once

    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in docs:
            assert r["seq_start"] == cum, (shard, r["doc_id"])
            n = toks[r["doc_id"]]
            assert r["bin"] == cum // PACK_CAP
            assert r["spans_boundary"] == (
                (cum + n - 1) // PACK_CAP > cum // PACK_CAP
            )
            cum += n


def test_doc_chunks_tile_every_document(spark):
    """Per doc: chunk 0 starts at 0, consecutive chunks advance by exactly
    CHUNK_STRIDE, every chunk length is in [1, CHUNK_TOKENS], and the last
    chunk reaches the final token — the windows tile the whole document
    with the configured overlap, leaving no token uncovered."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        pipeline_doc_chunks,
        text_token_stats,
    )

    cat = _catalog(spark)
    toks = {
        r["doc_id"]: r["n_tokens"] for r in text_token_stats(cat).collect()
    }
    by_doc = defaultdict(list)
    for r in pipeline_doc_chunks(cat).collect():
        by_doc[r["doc_id"]].append(r)
    assert set(by_doc) == set(toks)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = toks[doc_id]
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["chunk_start"] == c["chunk_idx"] * CHUNK_STRIDE
            assert 1 <= c["n_chunk_tokens"] <= CHUNK_TOKENS
        last = chunks[-1]
        assert last["chunk_start"] + last["n_chunk_tokens"] == n  # tail covered
        if n <= CHUNK_TOKENS:
            assert len(chunks) == 1
        else:  # one more chunk would start at or past the end
            assert len(chunks) * CHUNK_STRIDE >= n - CHUNK_TOKENS + 1


def test_sequence_pack_long_docs_straddle_many_bins(spark):
    """The fixture never has a doc longer than PACK_CAP, so the
    multi-boundary straddle arithmetic is exercised here with a synthetic
    corpus (docs of 1, CAP−1, CAP, CAP+1, 3·CAP+5 tokens): the packed
    layout must equal a pure-Python reference packer run over the same
    (shard, doc_id) stream order."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        PACK_CAP,
        PACK_SHARDS,
        sequence_pack,
    )
    import hashlib

    lengths = [1, PACK_CAP - 1, PACK_CAP, PACK_CAP + 1, 3 * PACK_CAP + 5, 7, 2]
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["shard"], r["seq_start"], r["bin"], r["spans_boundary"])
        for r in sequence_pack(docs).collect()
    }

    def shard_of(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % (
            PACK_SHARDS
        )

    cum: dict[int, int] = defaultdict(int)
    want = {}
    for doc_id, n in sorted(enumerate(lengths)):
        s = shard_of(doc_id)
        start = cum[s]
        want[doc_id] = (
            s,
            start,
            start // PACK_CAP,
            (start + n - 1) // PACK_CAP > start // PACK_CAP,
        )
        cum[s] += n
    assert got == want
    # the 3·CAP+5-token doc must actually straddle (sanity that the case
    # fired; it spans ≥ 3 boundaries wherever it lands in its shard)
    assert got[4][3] is True


def test_doc_chunks_long_doc_geometry(spark):
    """A 500-token doc (far past CHUNK_TOKENS) must tile with the exact
    expected chunk count and a short tail; a CHUNK_TOKENS+1 doc must get
    exactly two chunks."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunks,
    )

    rows = [(0, " ".join(["w"] * 500)), (1, " ".join(["w"] * (CHUNK_TOKENS + 1)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    by_doc = defaultdict(list)
    for r in doc_chunks(docs).collect():
        by_doc[r["doc_id"]].append(r)
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    expect_n = (500 - CHUNK_TOKENS + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
    assert len(c0) == expect_n
    assert c0[-1]["chunk_start"] + c0[-1]["n_chunk_tokens"] == 500
    assert all(c["n_chunk_tokens"] == CHUNK_TOKENS for c in c0[:-1])
    assert len(by_doc[1]) == 2
    assert by_doc[1][1]["n_chunk_tokens"] == CHUNK_TOKENS + 1 - CHUNK_STRIDE


def test_domain_mix_temperature_upweights_small_sources(spark):
    """α = 0.5 temperature semantics from first principles: keep rates are
    anti-monotone in source size (a source with MORE tokens never gets a
    HIGHER rate), every rate is in (0, 10⁶], and the realized token budget
    stays at-or-under target (rates are floored, never rounded up) while
    landing within 25% of it on the fixture (the md5 buckets are uniform
    enough at 25+ docs/source)."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        pipeline_domain_mix,
        text_token_stats,
    )

    cat = _catalog(spark)
    toks = {
        r["doc_id"]: r["n_tokens"] for r in text_token_stats(cat).collect()
    }
    rows = pipeline_domain_mix(cat).collect()
    assert len(rows) == len(toks)

    src_tokens: dict[str, int] = defaultdict(int)
    src_rate: dict[str, int] = {}
    kept_tokens = 0
    for r in rows:
        src_tokens[r["source"]] += toks[r["doc_id"]]
        src_rate[r["source"]] = r["rate_ppm"]
        if r["kept"]:
            kept_tokens += toks[r["doc_id"]]
    for s, rate in src_rate.items():
        assert 0 < rate <= 1_000_000, (s, rate)
    ordered = sorted(src_rate, key=lambda s: src_tokens[s])
    for small, big in zip(ordered, ordered[1:]):
        if src_tokens[small] < src_tokens[big]:
            assert src_rate[small] >= src_rate[big], (small, big)

    target = sum(src_tokens.values()) // 2
    # expected kept tokens if buckets were perfectly uniform = Σ tok_i·rate_i
    expected = sum(
        src_tokens[s] * src_rate[s] / 1_000_000 for s in src_rate
    )
    assert expected <= target + len(src_rate)  # floored rates: never over
    assert abs(kept_tokens - expected) <= 0.25 * expected


def test_repetition_3gram_bounds_and_short_docs(spark):
    """rep3 ∈ [0, 1); short docs (< 3 tokens) have zero grams and rep3 = 0;
    gram counts agree with n_tokens − 2; distinct ≤ total."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        text_repetition_3gram,
        text_token_stats,
    )

    cat = _catalog(spark)
    toks = {
        r["doc_id"]: r["n_tokens"] for r in text_token_stats(cat).collect()
    }
    rows = text_repetition_3gram(cat).collect()
    assert len(rows) == len(toks)
    for r in rows:
        n = toks[r["doc_id"]]
        assert r["n_grams"] == max(n - 2, 0)
        assert 0 <= r["n_distinct_grams"] <= r["n_grams"]
        assert 0.0 <= r["rep3"] < 1.0
        if n < 3:
            assert r["n_grams"] == 0 and r["rep3"] == 0.0

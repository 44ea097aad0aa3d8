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


def test_vocab_prune_matches_first_principles(spark):
    """The top-V cut and per-doc unk counts recomputed in plain Python from
    the raw text must agree exactly, and the cap must actually bite on the
    fixture (some docs carry real <unk> tokens)."""
    from collections import Counter

    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        VOCAB_TOP_V,
        pipeline_vocab_prune,
    )

    cat = _catalog(spark)
    docs = {
        r["doc_id"]: r["text"]
        for r in cat.documents.select("doc_id", "text").collect()
    }
    counts = Counter(t for text in docs.values() for t in text.split(" "))
    vocab = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :VOCAB_TOP_V
        ]
    }
    rows = {r["doc_id"]: r for r in pipeline_vocab_prune(cat).collect()}
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        toks = text.split(" ")
        r = rows[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["n_unk"] == sum(1 for t in toks if t not in vocab)
    assert any(r["n_unk"] > 0 for r in rows.values())


def test_quality_filter_is_per_language_disc_median(spark):
    """The gate keeps exactly the docs at or above their language's
    percentile_disc(0.5) quality; the threshold is an ATTAINED value (disc,
    never interpolated) and at least half of every language survives."""
    from collections import defaultdict

    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        doc_features,
        pipeline_quality_filter,
    )

    cat = _catalog(spark)
    feats = [
        (r["doc_id"], r["pred_lang"], r["quality"])
        for r in doc_features(cat).collect()
    ]
    by_lang = defaultdict(list)
    for _, lang, q in feats:
        by_lang[lang].append(q)
    med = {
        lang: sorted(qs)[(len(qs) + 1) // 2 - 1] for lang, qs in by_lang.items()
    }
    expected = {
        (d, lang, q, med[lang]) for d, lang, q in feats if q >= med[lang]
    }
    got = {
        (r["doc_id"], r["pred_lang"], r["quality"], r["lang_median"])
        for r in pipeline_quality_filter(cat).collect()
    }
    assert got == expected
    for lang, qs in by_lang.items():
        assert med[lang] in qs  # attained, not interpolated
        assert 2 * sum(1 for q in qs if q >= med[lang]) >= len(qs)


#: synthetic PII corpus — the parquet fixture is PII-free by construction,
#: so redaction behavior is pinned here instead.
_PII_CORPUS = [
    (0, "contact alice@example.com or bob.smith+tag@mail.co today"),
    (1, "server at 10.0.0.1 and 192.168.1.255 replied"),
    (2, "call 555-123-4567 or 555 987 6543 now"),
    (3, "mail x@y.io from 8.8.8.8 call 111-222-3333"),
    (4, "no pii here at all"),
    (5, ""),
]


def test_pii_scrub_synthetic_counts_and_redaction(spark):
    """Counts and the sequentially-redacted text on a PII-bearing corpus,
    cross-checked against Python re (a THIRD regex dialect) — all three
    engines must agree on these patterns by construction."""
    import hashlib
    import re

    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        pii_scrub,
    )

    d = spark.createDataFrame(_PII_CORPUS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_scrub(d).collect()}
    expected_counts = {
        0: (2, 0, 0),
        1: (0, 2, 0),
        2: (0, 0, 2),
        3: (1, 1, 1),
        4: (0, 0, 0),
        5: (0, 0, 0),
    }
    for doc_id, text in _PII_CORPUS:
        r = rows[doc_id]
        assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == expected_counts[
            doc_id
        ], doc_id
        clean = re.sub(
            PII_PHONE,
            "<PHONE>",
            re.sub(PII_IPV4, "<IP>", re.sub(PII_EMAIL, "<EMAIL>", text)),
        )
        assert r["clean_len"] == len(clean), doc_id
        assert r["clean_fp"] == hashlib.md5(clean.encode()).hexdigest(), doc_id


def test_pii_oracle_dialect_parity_on_pii_bearing_text(spark):
    """Java regex (Spark) vs RE2 (DuckDB) on text that actually contains
    PII — the fixture corpus is PII-free, so the driver's oracle row alone
    cannot catch a dialect split in the patterns."""
    import duckdb
    import pandas as pd

    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        pii_scrub,
    )
    from tests.compare import assert_match

    pdf = pd.DataFrame(_PII_CORPUS, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    sdf = pii_scrub(spark.createDataFrame(_PII_CORPUS, "doc_id long, text string"))
    assert_match(sdf, con, all_oracles()["pipeline_pii_scrub"], "pii_synthetic")


def test_chunk_dedup_covers_recrawled_chunks(spark):
    """Every chunk fingerprint of a re-crawled doc (doc_id % 10 == 0 gets a
    +1e6 copy) must appear in the duplicate report with the ORIGINAL as
    keeper; n_copies ≥ 2 everywhere; fingerprints recomputed from raw text
    in plain Python agree."""
    import hashlib

    from spark_ml_algo_lib_master_tongji_spark.operators.dedup import (
        pipeline_chunk_dedup,
    )
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    cat = _catalog(spark)
    docs = {
        r["doc_id"]: r["text"]
        for r in cat.documents.select("doc_id", "text").collect()
    }

    def chunk_fps(text):
        t = text.split(" ")
        n = len(t)
        n_chunks = (
            1
            if n <= CHUNK_TOKENS
            else (n - CHUNK_TOKENS + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        )
        for i in range(n_chunks):
            span = " ".join(t[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_TOKENS])
            yield hashlib.md5(span.encode()).hexdigest()

    rows = {r["chunk_fp"]: r for r in pipeline_chunk_dedup(cat).collect()}
    assert rows, "re-crawl union must produce duplicated chunks"
    for r in rows.values():
        assert r["n_copies"] >= 2
        assert r["keeper_doc_id"] < 1_000_000  # original, never the re-crawl
    for doc_id, text in docs.items():
        if doc_id % 10 != 0:
            continue
        for fp in chunk_fps(text):
            assert fp in rows, (doc_id, fp)
            assert rows[fp]["keeper_doc_id"] <= doc_id


def test_winnow_fingerprints_matching_guarantee(spark, tmp_path):
    """The winnowing property: two documents sharing a K+W−1-token run
    share at least one fingerprint; sub-K-token docs are absent; every
    doc's fps recompute exactly from first principles."""
    import hashlib

    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_W,
        text_winnow_fingerprints,
    )
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    shared = " ".join(f"s{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    rows = [
        (0, "aa bb cc dd ee " + shared + " ff gg"),
        (1, "zz yy xx " + shared),
        (2, "one two"),  # < K tokens: no grams, absent from output
        (3, "p q r s t u v w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        # fps is the space-joined scalar surface (driver-sortable) —
        # parse it back for the first-principles compare
        r["doc_id"]: [int(x) for x in r["fps"].split(" ")]
        for r in text_winnow_fingerprints(
            Catalog(spark, str(tmp_path))
        ).collect()
    }
    assert set(out) == {0, 1, 3}

    def winnow(text):
        t = text.split(" ")
        grams = [
            " ".join(t[i : i + WINNOW_K])
            for i in range(len(t) - WINNOW_K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
        ]
        return sorted(
            {min(hs[max(0, i - WINNOW_W + 1) : i + 1]) for i in range(len(hs))}
        )

    for doc_id, text in rows:
        if doc_id == 2:
            continue
        assert out[doc_id] == winnow(text), doc_id
    assert set(out[0]) & set(out[1]), "shared K+W-1 run must share a fp"
    assert not set(out[3]) & set(out[0])


def test_winnow_pairs_find_every_recrawl_duplicate(spark):
    """Every re-crawled doc (doc_id % 10 == 0, ≥ K tokens) must pair with
    its +1e6 copy — an exact copy shares its whole sketch, and the df-cap
    must not sever it; all emitted pairs meet the shared-fp floor."""
    from spark_ml_algo_lib_master_tongji_spark.operators.dedup import (
        WINNOW_MIN_SHARED,
        dedup_winnow_pairs,
    )
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        WINNOW_K,
    )

    cat = _catalog(spark)
    docs = {
        r["doc_id"]: r["text"]
        for r in cat.documents.select("doc_id", "text").collect()
    }
    expected = {
        (d, d + 1_000_000)
        for d, text in docs.items()
        if d % 10 == 0 and len(text.split(" ")) >= WINNOW_K
    }
    rows = dedup_winnow_pairs(cat).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert expected <= got
    assert all(r["n_shared_fps"] >= WINNOW_MIN_SHARED for r in rows)


def test_lm_perplexity_matches_oracle_and_first_principles(spark, duck):
    """pipeline_lm_perplexity — DuckDB hash-match plus a pure-Python
    recomputation of one doc's score from raw counts (the oracle-twin
    pattern can share a bug; first principles can't)."""
    import math

    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        pipeline_lm_perplexity,
    )
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles

    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    from tests.compare import assert_match
    from tests.conftest import SF_ORACLE

    cat = Catalog(spark, SF_ORACLE)  # the duck fixture views sf0.01
    df = pipeline_lm_perplexity(cat)
    assert_match(df, duck, all_oracles()["pipeline_lm_perplexity"], "lm_ppl")

    texts = {
        r["doc_id"]: r["text"]
        for r in cat.documents.select("doc_id", "text").collect()
    }
    c2: dict[tuple, int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for t in texts.values():
        toks = t.split(" ")
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    target = min(d for d, t in texts.items() if len(t.split(" ")) >= 2)
    toks = texts[target].split(" ")
    lps = [
        math.floor(
            math.log((c2[(a, b)] + 1.0) / (c1[a] + len(vocab))) * 1e6 + 0.5
        )
        / 1e6
        for a, b in zip(toks, toks[1:])
    ]
    want = math.floor(sum(lps) / len(lps) * 1e4 + 0.5) / 1e4
    got = {r["doc_id"]: r for r in df.collect()}[target]
    assert got["avg_logprob"] == want
    assert got["n_bigrams"] == len(toks) - 1


def test_lm_perplexity_unscorable_docs_kept_as_rows(spark):
    """<2-token docs have no bigrams: (0, NULL, false) rows, never dropped."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        pipeline_lm_perplexity,
    )

    class _Cat:
        def __init__(self, s, docs):
            self.spark = s
            self.documents = docs

    docs = spark.createDataFrame(
        [(1, "only"), (2, ""), (3, "a a a a")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in pipeline_lm_perplexity(_Cat(spark, docs)).collect()
    }
    assert set(rows) == {1, 2, 3}
    for d in (1, 2):
        assert rows[d]["n_bigrams"] == 0
        assert rows[d]["avg_logprob"] is None
        assert rows[d]["keep"] is False
    assert rows[3]["n_bigrams"] == 3
    assert rows[3]["avg_logprob"] is not None


def test_bpe_token_stats_oracle_and_python_re(spark, duck):
    """text_bpe_token_stats — DuckDB hash-match at sf0.01, plus a
    punctuation/contraction/digit-heavy synthetic string pinned against
    Python's re on the same pattern (three regex engines agreeing is the
    dialect-portability check the PII patterns established)."""
    import re

    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        BPE_TOKEN_PATTERN,
        text_bpe_token_stats,
    )
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    from tests.compare import assert_match
    from tests.conftest import SF_ORACLE

    cat = Catalog(spark, SF_ORACLE)
    assert_match(
        text_bpe_token_stats(cat), duck, all_oracles()["text_bpe_token_stats"], "bpe"
    )

    class _Cat:
        def __init__(self, s, docs):
            self.spark = s
            self.documents = docs

    cases = [
        "it's 2024, worth $3.50 — really?",
        "don't    stop...ever!!! x9y8z7",
        "",
        "   ",
        "tab\there\nnewline",
    ]
    docs = spark.createDataFrame(
        list(enumerate(cases)), "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r for r in text_bpe_token_stats(_Cat(spark, docs)).collect()
    }
    for i, text in enumerate(cases):
        assert rows[i]["n_bpe_tokens"] == len(re.findall(BPE_TOKEN_PATTERN, text)), (
            i,
            text,
        )


def test_jsonl_roundtrip_driver_row(spark, duck):
    """The JSONL-interchange driver row: the rollup computed from the
    staged gzip JSONL export equals the DuckDB twin computed from the
    parquet ORIGINAL (lossless export/decode/parse), and the staging is
    idempotent — a second call reuses the export instead of rewriting."""
    import os

    from spark_ml_algo_lib_master_tongji_spark.operators import text_analysis as ta
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    from tests.compare import assert_match
    from tests.conftest import SF_ORACLE

    cat = Catalog(spark, SF_ORACLE)
    df = ta.pipeline_jsonl_roundtrip(cat)
    assert_match(
        df, duck, all_oracles()["pipeline_jsonl_roundtrip"], "jsonl_roundtrip"
    )
    marker = os.path.join(ta._staged_jsonl_dir(cat), "_SUCCESS")
    m1 = os.path.getmtime(marker)
    ta._staged_jsonl_dir(cat)  # second call: cache hit, no rewrite
    assert os.path.getmtime(marker) == m1
    # the export really is compressed part files (the non-splittable
    # production caveat in the docstring applies)
    parts = [
        p
        for p in os.listdir(os.path.dirname(marker))
        if p.startswith("part-") and p.endswith(".json.gz")
    ]
    assert parts


def test_gopher_rules_oracle_parity_and_discrimination(spark, duck):
    """Gopher-rule gate: exact twin parity at sf0.01, keep == conjunction
    of the four rule bits, and the fixture-fit thresholds actually
    discriminate (word-count, stopword, and repetition rules each fire
    both ways — an all-TRUE or all-FALSE rule would be a dead anchor)."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        text_gopher_rules,
    )
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    from tests.compare import assert_match
    from tests.conftest import SF_ORACLE

    cat = Catalog(spark, SF_ORACLE)
    df = text_gopher_rules(cat)
    assert_match(df, duck, all_oracles()["text_gopher_rules"], "gopher_rules")
    rows = df.collect()
    for r in rows:
        assert r["keep"] == (
            r["r_wordcount"]
            and r["r_meanwordlen"]
            and r["r_stopwords"]
            and r["r_repetition"]
        )
    for rule in ("r_wordcount", "r_stopwords", "r_repetition"):
        vals = {r[rule] for r in rows}
        assert vals == {True, False}, f"{rule} is degenerate on the fixture"


def test_profile_columns_oracle_parity_and_pins(spark, duck):
    """Column profiling: exact twin parity at sf0.01 plus structural pins
    — one row per profiled column, a single n_rows everywhere, the key
    column fully distinct, and a null-free fixture profiled as such."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        pipeline_profile_columns,
    )
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    from tests.compare import assert_match
    from tests.conftest import SF_ORACLE

    cat = Catalog(spark, SF_ORACLE)
    df = pipeline_profile_columns(cat)
    assert_match(
        df, duck, all_oracles()["pipeline_profile_columns"], "profile_columns"
    )
    rows = {r["column_name"]: r for r in df.collect()}
    assert set(rows) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert len({r["n_rows"] for r in rows.values()}) == 1
    assert rows["doc_id"]["n_distinct"] == rows["doc_id"]["n_rows"]
    assert all(r["n_nulls"] == 0 for r in rows.values())


def test_profile_quantiles_oracle_parity_and_ordering(spark, duck):
    """Quantile profile: exact twin parity at sf0.01 (Spark percentile vs
    DuckDB quantile_cont — same linear interpolation) plus the ordering
    invariant min <= p50 <= p90 <= p99 <= max per signal."""
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        pipeline_profile_quantiles,
    )
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    from tests.compare import assert_match
    from tests.conftest import SF_ORACLE

    cat = Catalog(spark, SF_ORACLE)
    df = pipeline_profile_quantiles(cat)
    assert_match(
        df, duck, all_oracles()["pipeline_profile_quantiles"], "profile_quant"
    )
    rows = {r["signal"]: r for r in df.collect()}
    assert set(rows) == {"n_chars", "n_tokens"}
    for r in rows.values():
        assert (
            r["min_val"] <= r["p50"] <= r["p90"] <= r["p99"] <= r["max_val"]
        ), r

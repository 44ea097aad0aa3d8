"""DuckDB oracle SQL for every SQL-expressible query in the registry.

The driver runs each ``queries()`` entry on Spark and the matching SQL here
on DuckDB over the same parquet fixtures, then compares row count + schema +
order-insensitive value hash. Column names/aliases MUST match the Spark plan
exactly; double aggregates are rounded identically (4 decimals unless noted)
on both sides so order-of-summation noise cannot flip the hash.
"""

RELATIONAL_ORACLES: dict[str, str] = {
    # sums/avgs as exact integer 1e-4 units (floor form per row, BIGINT
    # sum, one division) — order-independent; the round-after-sum form
    # flipped 4th decimals at the 10x fixture (r14 sweep)
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity * 1e4 + 0.5) AS BIGINT))
                    AS BIGINT) / 1e4                       AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 1e4 + 0.5) AS BIGINT))
                    AS BIGINT) / 1e4                       AS sum_base_price,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4
                                   + 0.5) AS BIGINT))
                    AS BIGINT) / 1e4                       AS sum_disc_price,
               round(CAST(sum(CAST(floor(l_quantity * 1e4 + 0.5) AS BIGINT))
                          AS BIGINT)
                     / (1e4 * count(l_quantity)), 4)       AS avg_qty,
               round(CAST(sum(CAST(floor(l_discount * 1e4 + 0.5) AS BIGINT))
                          AS BIGINT)
                     / (1e4 * count(l_discount)), 4)       AS avg_disc,
               count(*)                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 1e4 + 0.5)
                             AS BIGINT)) AS BIGINT) / 1e4 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q3_top_unshipped_orders": """
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q_broadcast_dim_join": """
        SELECT r_name,
               count(*)                       AS order_count,
               CAST(sum(CAST(floor(o_totalprice * 1e4 + 0.5) AS BIGINT))
                    AS BIGINT) / 1e4          AS total_price
        FROM orders
        JOIN customer ON o_custkey   = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q_anti_join_customers_without_orders": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-06-01'
        )
    """,
    "q_semi_join_suppliers_with_big_lineitems": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem WHERE l_quantity >= 48
        )
    """,
    "q_union_distinct_nations": """
        SELECT DISTINCT nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
    """,
    "q_topk_per_group": """
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               CAST(rank AS INT) AS rank
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
                   ) AS rank
            FROM lineitem
        )
        WHERE rank <= 3
    """,
    "q_sort_limit_top_orders": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    # discounted_revenue as exact integer 1e-4 units (floor form per
    # row, BIGINT sum, one fp64 division) — order-independent; the
    # round-after-sum form flipped the 4th decimal at the 10x fixture
    "q_case_conditional_agg": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                                                                   AS returned_count,
               CAST(sum(CAST(floor((CASE WHEN l_discount > 0.05
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END) * 1e4 + 0.5) AS BIGINT))
                    AS BIGINT) / 1e4                               AS discounted_revenue,
               count(*)                                            AS total_count
        FROM lineitem
        GROUP BY l_linestatus
    """,
    "q_grouped_having": """
        SELECT o_custkey,
               count(*)                    AS order_count,
               round(sum(o_totalprice), 4) AS total_spent
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 12
    """,
    "q_events_first_per_user": """
        SELECT user_id, event_id, ts, event_type
        FROM (
            SELECT user_id, event_id, ts, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    "q_events_type_rollup": """
        SELECT event_type,
               count(*)                        AS n_events,
               round(avg(value), 4)            AS avg_value,
               count(DISTINCT user_id)         AS n_users
        FROM events
        GROUP BY event_type
    """,
}


def _corr_pairs(expr: str, table: str) -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    short = {c: c.split("_", 1)[-1] for c in cols}
    sel = ", ".join(
        f"round({expr.format(a=a, b=b)}, 4) AS corr_{short[a]}_{short[b]}"
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
    )
    return f"SELECT {sel} FROM {table}"


_RANKED_LINEITEM = """(
    SELECT
        rank() OVER (ORDER BY l_quantity)
          + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0      AS l_quantity,
        rank() OVER (ORDER BY l_extendedprice)
          + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS l_extendedprice,
        rank() OVER (ORDER BY l_discount)
          + (count(*) OVER (PARTITION BY l_discount) - 1) / 2.0      AS l_discount,
        rank() OVER (ORDER BY l_tax)
          + (count(*) OVER (PARTITION BY l_tax) - 1) / 2.0           AS l_tax
    FROM lineitem
)"""

STATS_ORACLES: dict[str, str] = {
    "stat_pearson_lineitem": _corr_pairs("corr({a}, {b})", "lineitem"),
    "stat_spearman_lineitem": _corr_pairs("corr({a}, {b})", _RANKED_LINEITEM),
    "stat_covariance_lineitem": (
        _corr_pairs("covar_samp({a}, {b})", "lineitem")
        .replace("corr_", "cov_")
        .replace(" FROM", ", "
                 "round(var_samp(l_quantity), 4) AS var_quantity, "
                 "round(var_samp(l_extendedprice), 4) AS var_extendedprice, "
                 "round(var_samp(l_discount), 4) AS var_discount, "
                 "round(var_samp(l_tax), 4) AS var_tax FROM", 1)
    ),
    "stat_summary_lineitem": """
        SELECT
            round(min(l_quantity), 4)              AS min_quantity,
            round(max(l_quantity), 4)              AS max_quantity,
            round(avg(l_quantity), 4)              AS avg_quantity,
            round(stddev_samp(l_quantity), 4)      AS std_quantity,
            round(min(l_extendedprice), 4)         AS min_extendedprice,
            round(max(l_extendedprice), 4)         AS max_extendedprice,
            round(avg(l_extendedprice), 4)         AS avg_extendedprice,
            round(stddev_samp(l_extendedprice), 4) AS std_extendedprice,
            round(min(l_discount), 4)              AS min_discount,
            round(max(l_discount), 4)              AS max_discount,
            round(avg(l_discount), 4)              AS avg_discount,
            round(stddev_samp(l_discount), 4)      AS std_discount,
            round(min(l_tax), 4)                   AS min_tax,
            round(max(l_tax), 4)                   AS max_tax,
            round(avg(l_tax), 4)                   AS avg_tax,
            round(stddev_samp(l_tax), 4)           AS std_tax,
            count(*)                               AS n_rows
        FROM lineitem
    """,
}


# ---- text / dedup / similarity (md5-keyed → engine-portable) --------------

_STOPWORDS_SQL = (
    "['the','a','an','and','or','of','to','in','is','on','for','with',"
    "'as','by','at','it','that','this']"
)

_LANG_SQL = {
    "en": "['the','and','of','a','is']",
    "fr": "['le','la','et','les','des']",
    "de": "['der','die','und','das','ist']",
    "es": "['el','los','las','una','es']",
    "zh": "['de5','shi4','le5','zai4','he2']",
}

_NORM_TEXT = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)

# 3-gram shingle set per doc (empty when < 3 tokens), shared by dedup oracles
_SHINGLES_CTE = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(t) >= 3 THEN
                       list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE []::VARCHAR[] END
               ) AS s
        FROM toks
    )
"""

TEXT_ORACLES: dict[str, str] = {
    "text_token_stats": """
        SELECT doc_id,
               CAST(len(string_split(text,' ')) AS INT)                AS n_tokens,
               CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_distinct_tokens,
               CAST(length(text) AS INT)                               AS n_chars_computed,
               round(list_sum(list_transform(string_split(text,' '), t -> length(t)))
                     * 1.0 / greatest(len(string_split(text,' ')), 1), 4)
                                                                       AS mean_token_len
        FROM documents
    """,
    "text_quality_score": f"""
        WITH m AS (
            SELECT doc_id,
                   string_split(text,' ') AS t,
                   length(text) AS nc,
                   length(regexp_replace(text, '[0-9]', '', 'g')) AS nc_nodigit
            FROM documents
        )
        SELECT doc_id,
               round(len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, x)))
                     * 1.0 / greatest(len(t), 1), 4)              AS stopword_ratio,
               round(1.0 - len(list_distinct(t)) * 1.0 / greatest(len(t), 1), 4)
                                                                  AS repetition_ratio,
               round((nc - nc_nodigit) * 1.0 / greatest(nc, 1), 4) AS digit_ratio,
               round(
                   (CASE WHEN len(t) BETWEEN 10 AND 1000
                         THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
                 + (CASE WHEN len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, x)))
                              * 1.0 / greatest(len(t), 1) > 0.01
                         THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
                 + 0.3::DOUBLE * (len(list_distinct(t)) * 1.0 / greatest(len(t), 1))
                 - (nc - nc_nodigit) * 1.0 / greatest(nc, 1), 4)  AS quality
        FROM m
    """,
    "text_lang_id": f"""
        WITH s AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text,' '),
                        x -> list_contains({_LANG_SQL['en']}, x))) AS INT) AS score_en,
                   CAST(len(list_filter(string_split(text,' '),
                        x -> list_contains({_LANG_SQL['fr']}, x))) AS INT) AS score_fr,
                   CAST(len(list_filter(string_split(text,' '),
                        x -> list_contains({_LANG_SQL['de']}, x))) AS INT) AS score_de,
                   CAST(len(list_filter(string_split(text,' '),
                        x -> list_contains({_LANG_SQL['es']}, x))) AS INT) AS score_es,
                   CAST(len(list_filter(string_split(text,' '),
                        x -> list_contains({_LANG_SQL['zh']}, x))) AS INT) AS score_zh
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN greatest(score_en,score_fr,score_de,score_es,score_zh) <= 0
                        THEN 'und'
                    WHEN score_en >= greatest(score_fr,score_de,score_es,score_zh)
                        THEN 'en'
                    WHEN score_fr >= greatest(score_de,score_es,score_zh) THEN 'fr'
                    WHEN score_de >= greatest(score_es,score_zh) THEN 'de'
                    WHEN score_es >= score_zh THEN 'es'
                    ELSE 'zh' END AS pred_lang,
               score_en, score_fr, score_de, score_es, score_zh
        FROM s
    """,
    # Gopher-rule gate (text_analysis.text_gopher_rules): the rule
    # booleans compare UNROUNDED doubles exactly like the Spark side —
    # both engines compute the same int arithmetic then one IEEE fp64
    # division, so the thresholds cut identically.
    "text_gopher_rules": f"""
        WITH m AS (
            SELECT doc_id, string_split(text,' ') AS t, length(text) AS nc
            FROM documents
        ), s AS (
            SELECT doc_id,
                   len(t) AS n,
                   (nc - (len(t) - 1)) * 1.0 / greatest(len(t), 1) AS mwl,
                   len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, x)))
                       AS stop_hits,
                   list_max(list_transform(list_distinct(t),
                       u -> len(list_filter(t, x -> x = u))))
                       * 1.0 / greatest(len(t), 1) AS top_frac
            FROM m
        )
        SELECT doc_id,
               CAST(n AS INT)                             AS n_tokens,
               round(mwl, 4)                              AS mean_token_len,
               CAST(stop_hits AS INT)                     AS stop_hits,
               round(top_frac, 4)                         AS top_token_frac,
               n BETWEEN 50 AND 100000                    AS r_wordcount,
               mwl >= 3.0 AND mwl <= 10.0                 AS r_meanwordlen,
               stop_hits >= 2                             AS r_stopwords,
               top_frac <= 0.10                           AS r_repetition,
               (n BETWEEN 50 AND 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
                   AND stop_hits >= 2 AND top_frac <= 0.10 AS keep
        FROM s
    """,
    # Column profiling (text_analysis.pipeline_profile_columns): one
    # UNION ALL branch per profiled column; sums cast to BIGINT (DuckDB
    # widens integer SUM to HUGEINT, Spark stays long).
    "pipeline_profile_columns": "\nUNION ALL\n".join(
        f"""
        SELECT '{c}'                                        AS column_name,
               count(*)                                     AS n_rows,
               CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT)                              AS n_nulls,
               count(DISTINCT {c})                          AS n_distinct,
               min(CAST({c} AS VARCHAR))                    AS min_str,
               max(CAST({c} AS VARCHAR))                    AS max_str,
               round(avg(length(CAST({c} AS VARCHAR))), 4)  AS avg_len
        FROM documents
        """
        for c in ("doc_id", "text", "lang", "source", "n_chars")
    ),
    # Quantile profiling (text_analysis.pipeline_profile_quantiles):
    # DuckDB quantile_cont uses the same linear interpolation as Spark's
    # exact percentile; both sides round with the shared floor form.
    "pipeline_profile_quantiles": """
        WITH m AS (
            SELECT CAST(n_chars AS DOUBLE) AS n_chars,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens
            FROM documents
        )
        SELECT 'n_chars' AS signal,
               round(quantile_cont(n_chars, 0.5), 4)  AS p50,
               round(quantile_cont(n_chars, 0.9), 4)  AS p90,
               round(quantile_cont(n_chars, 0.99), 4) AS p99,
               min(n_chars) AS min_val, max(n_chars) AS max_val
        FROM m
        UNION ALL
        SELECT 'n_tokens',
               round(quantile_cont(n_tokens, 0.5), 4),
               round(quantile_cont(n_tokens, 0.9), 4),
               round(quantile_cont(n_tokens, 0.99), 4),
               min(n_tokens), max(n_tokens)
        FROM m
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
               md5({_NORM_TEXT}) AS fingerprint,
               ('0x' || substr(md5({_NORM_TEXT}), 1, 15))::BIGINT AS fp_key
        FROM documents
    """,
}

# Corpus-wide top-K bigrams (vocabulary-building pass): total order on
# (count desc, gram asc) makes the cut deterministic.
# BPE-ish token counting (text_bpe_token_stats): the SAME pattern literal
# the Spark side matches (imported, not re-typed — Java∩RE2 dialect), with
# the SQL quote escaped.
def _bpe_stats_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        BPE_TOKEN_PATTERN,
    )

    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{pat}')) AS INT)
               AS n_bpe_tokens,
           round(len(regexp_extract_all(text, '{pat}')) * 1.0
                 / greatest(len(string_split(text, ' ')), 1), 4)
               AS bpe_per_ws
    FROM documents
"""


TEXT_ORACLES["text_bpe_token_stats"] = _bpe_stats_sql()

# Bigram-LM perplexity gate (pipeline_lm_perplexity): add-1-smoothed
# corpus LM, per-gram ln rounded at 6 before the per-doc mean (rounded 4);
# the keep threshold is text_analysis.LM_KEEP_LOGPROB ITSELF (interpolated
# below, not re-typed — round-8 ADVICE: a constant change must move both
# twins together).
TEXT_ORACLES["pipeline_lm_perplexity"] = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i+1])) AS gram
        FROM toks
    ),
    c2 AS (SELECT gram, count(*) AS c2 FROM g GROUP BY gram),
    c1 AS (
        SELECT split_part(gram, ' ', 1) AS w1, sum(c2) AS c1
        FROM c2 GROUP BY 1
    ),
    vocab AS (
        SELECT count(DISTINCT tok) AS v
        FROM (SELECT unnest(t) AS tok FROM toks)
    ),
    stats AS (
        SELECT gram, c2.c2, c1.c1
        FROM c2 JOIN c1 ON split_part(c2.gram, ' ', 1) = c1.w1
    ),
    lp AS (
        -- round_half_up(ln, 6) in exact integer micro-units (floor form),
        -- so the per-doc sum is order-independent cross-engine (round-13:
        -- avg-of-rounded-doubles flipped 6 boundary docs at the 10x sweep)
        SELECT doc_id,
               CAST(floor(ln((c2 + 1.0) / (c1 + (SELECT v FROM vocab)))
                          * 1000000 + 0.5) AS BIGINT) AS li
        FROM g JOIN stats USING (gram)
    ),
    per AS (
        -- final 4-digit stage spelled in the SAME floor form as the Spark
        -- side's round_half_up (avg_logprob is always negative, so native
        -- half-away-from-zero rounding would flip exact negative halves
        -- the OTHER way). fix_rounds would rewrite a native ROUND call to
        -- exactly this text; spelled out so the literal is safe even for
        -- a consumer that bypasses all_oracles -- round-13 ADVICE item 1.
        SELECT doc_id, count(*) AS n_bigrams,
               floor((CAST(sum(li) AS DOUBLE)
                     / (1000000.0 * count(*))) * 1e4 + 0.5) / 1e4 AS avg_logprob
        FROM lp GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(per.n_bigrams, 0) AS n_bigrams,
           per.avg_logprob AS avg_logprob,
           coalesce(per.avg_logprob >= {lm_keep}, FALSE) AS keep
    FROM documents d LEFT JOIN per USING (doc_id)
"""


def _interp_lm_keep() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        LM_KEEP_LOGPROB,
    )

    return TEXT_ORACLES["pipeline_lm_perplexity"].format(
        lm_keep=repr(LM_KEEP_LOGPROB)
    )


TEXT_ORACLES["pipeline_lm_perplexity"] = _interp_lm_keep()

TEXT_ORACLES["text_top_ngrams"] = """
    WITH g AS (
        SELECT unnest(
            CASE WHEN len(t) >= 2 THEN
                list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
            ELSE []::VARCHAR[] END
        ) AS gram
        FROM (SELECT string_split(text, ' ') AS t FROM documents)
    )
    SELECT gram, CAST(count(*) AS BIGINT) AS n
    FROM g GROUP BY gram
    ORDER BY n DESC, gram ASC
    LIMIT 20
"""

# Per-language rollup over the standalone lang/quality/token oracles.
TEXT_ORACLES["text_lang_rollup"] = f"""
    SELECT l.pred_lang,
           CAST(count(*) AS BIGINT)        AS n_docs,
           CAST(sum(t.n_tokens) AS BIGINT) AS sum_tokens,
           round(avg(q.quality), 4)        AS avg_quality
    FROM ({TEXT_ORACLES["text_lang_id"]}) l
    JOIN ({TEXT_ORACLES["text_quality_score"]}) q USING (doc_id)
    JOIN ({TEXT_ORACLES["text_token_stats"]}) t USING (doc_id)
    GROUP BY l.pred_lang
"""

# JSONL interchange round-trip (text_analysis.pipeline_jsonl_roundtrip):
# the Spark arm aggregates the corpus read back from a staged gzip JSONL
# export; the twin recomputes the identical rollup from the parquet
# ORIGINAL — equality proves the export/decode/parse cycle lossless.
TEXT_ORACLES["pipeline_jsonl_roundtrip"] = """
    SELECT lang, source,
           CAST(count(*) AS BIGINT)            AS n_docs,
           CAST(sum(length(text)) AS BIGINT)   AS chars,
           CAST(sum(n_chars) AS BIGINT)        AS sum_n_chars,
           min(doc_id)                         AS first_doc,
           max(doc_id)                         AS last_doc
    FROM documents
    GROUP BY lang, source
"""

# Benchmark decontamination: distinct 3-gram shingles shared with the
# (doc_id % 97 == 0) holdout — the inverted-index overlap join.
TEXT_ORACLES["pipeline_decontaminate"] = f"""
    WITH {_SHINGLES_CTE},
    bench AS (
        SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 97 = 0
    ),
    corpus AS (
        SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id % 97 <> 0
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM corpus JOIN bench USING (gram)
    GROUP BY doc_id
"""

# Reproducible seeded global shuffle (text_analysis.pipeline_global_shuffle):
# the permutation is a pure function of (GS_SEED, doc_id), so the twin
# recomputes it exactly — same md5 keying, same bucket arithmetic, same
# in-shard rank order. Constants interpolated from the operator module.
def _global_shuffle_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        GS_SEED,
        GS_SHARDS,
    )

    return f"""
    WITH s AS (
        SELECT doc_id,
               md5('{GS_SEED}|' || CAST(doc_id AS VARCHAR)) AS k
        FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substr(k, 1, 8))::BIGINT % {GS_SHARDS} AS INT)
               AS shard,
           CAST(row_number() OVER (
               PARTITION BY ('0x' || substr(k, 1, 8))::BIGINT % {GS_SHARDS}
               ORDER BY k, doc_id) AS INT) AS shard_pos
    FROM s
"""


TEXT_ORACLES["pipeline_global_shuffle"] = _global_shuffle_sql()

# Reproducible hash-threshold sample: md5(doc_id) bucket — the same
# engine-stable 64-bit-prefix trick as text_fingerprint's fp_key.
TEXT_ORACLES["pipeline_stratified_sample"] = f"""
    SELECT d.doc_id, l.pred_lang,
           ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
               AS bucket,
           q.quality
    FROM documents d
    JOIN ({TEXT_ORACLES["text_lang_id"]}) l USING (doc_id)
    JOIN ({TEXT_ORACLES["text_quality_score"]}) q USING (doc_id)
    WHERE q.quality >= 0.3
      AND ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
"""

# Concat-and-chunk sequence packing: md5-shard stream order, per-shard
# running token offset, PACK_CAP-token cuts — all-integer arithmetic so
# the twin is exact (sum OVER returns HUGEINT → cast back to BIGINT).
TEXT_ORACLES["pipeline_sequence_pack"] = """
    WITH toks AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 32
                   AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    seq AS (
        SELECT doc_id, shard, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS seq_start
        FROM toks
    )
    SELECT doc_id, shard, seq_start,
           seq_start // 2048 AS bin,
           (seq_start + n_tokens - 1) // 2048 > seq_start // 2048
               AS spans_boundary
    FROM seq
"""

# Sliding-window chunking: 64-token windows, stride 48, short tail kept.
TEXT_ORACLES["pipeline_doc_chunks"] = """
    WITH toks AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents
    ),
    sized AS (
        SELECT doc_id, n,
               CASE WHEN n <= 64 THEN 1
                    ELSE (n - 64 + 48 - 1) // 48 + 1 END AS n_chunks
        FROM toks
    ),
    c AS (
        SELECT doc_id, n,
               CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx
        FROM sized
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * 48 AS chunk_start,
           least(64, n - chunk_idx * 48) AS n_chunk_tokens
    FROM c
"""

# Per-doc top-K tf·idf terms: ranking on the ROUNDED score (term-asc
# tie-break) keeps the cut deterministic across engines; round() is
# rewritten to the shared half-up floor formula by fix_rounds.
TEXT_ORACLES["text_tfidf_top_terms"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               round(tf.tf * ln(CAST(nd.n + 1 AS DOUBLE) / (dfreq.df + 1)), 6)
                   AS score
        FROM tf JOIN dfreq USING (term), nd
    ),
    ranked AS (
        SELECT doc_id, term, tf, score,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term ASC
               ) AS rk
        FROM scored
    )
    SELECT doc_id, CAST(rk AS INT) AS rk, term, tf, score
    FROM ranked WHERE rk <= 3
"""

# Temperature-balanced domain mixing: integerized sqrt-weights (IEEE
# sqrt → identical BIGINT in both engines; S is an order-invariant
# integer sum) and a double rate expression with the SAME operation
# order as the Spark side, floored to ppm.
TEXT_ORACLES["pipeline_domain_mix"] = """
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    per_src AS (
        SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tokens
        FROM toks GROUP BY source
    ),
    weighted AS (
        SELECT source, src_tokens,
               CAST(floor(sqrt(CAST(src_tokens AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS s_i
        FROM per_src
    ),
    totals AS (
        SELECT CAST(sum(s_i) AS BIGINT) AS s_sum,
               CAST(sum(src_tokens) AS BIGINT) AS tok_sum
        FROM weighted
    ),
    rates AS (
        SELECT source,
               least(1000000, CAST(floor(
                   CAST(tok_sum // 2 AS DOUBLE) * s_i / s_sum / src_tokens
                   * 1000000.0) AS BIGINT)) AS rate_ppm
        FROM weighted, totals
    )
    SELECT t.doc_id, t.source, r.rate_ppm,
           ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 1000000 < r.rate_ppm AS kept
    FROM toks t JOIN rates r USING (source)
"""

# Per-doc 3-gram repetition (duplicate trigram fraction): the trigram
# build mirrors text_top_ngrams' bigram list_transform at n = 3.
TEXT_ORACLES["text_repetition_3gram"] = """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN
                   list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE []::VARCHAR[] END AS grams
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    )
    SELECT doc_id,
           CAST(len(grams) AS INT)                AS n_grams,
           CAST(len(list_distinct(grams)) AS INT) AS n_distinct_grams,
           round(1.0 - len(list_distinct(grams))
                       * 1.0 / greatest(len(grams), 1), 4) AS rep3
    FROM g
"""

# Winnowing fingerprints: 3-token gram hashes, rolling min over every
# window of 4 (prefix windows included) — all list ops, no explode, so
# position bookkeeping is implicit in the list index.
TEXT_ORACLES["text_winnow_fingerprints"] = """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN
                   list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE []::VARCHAR[] END AS grams
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    ),
    hashes AS (
        SELECT doc_id,
               list_transform(grams,
                   x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        FROM g WHERE len(grams) > 0
    ),
    wins AS (
        SELECT doc_id,
               list_transform(range(1, len(hs) + 1),
                   i -> list_min(hs[greatest(1, i - 3):i])) AS mins
        FROM hashes
    )
    SELECT doc_id,
           CAST(len(list_distinct(mins)) AS INT) AS n_fps,
           coalesce(array_to_string(list_sort(list_distinct(mins)), ' '), '')
               AS fps  -- scalar surface (driver-sortable); mins is never
                       -- empty here, the coalesce pins the DuckDB
                       -- NULL-on-empty quirk to Spark's '' regardless
    FROM wins
"""

# Vocabulary capping: top-20 tokens by (count desc, token asc) — a total
# order, so the cut is deterministic; the unk count is a row-local filter
# against the vocab list, mirroring the Spark broadcast-array projection.
TEXT_ORACLES["pipeline_vocab_prune"] = """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    vocab AS (
        SELECT list(token ORDER BY token) AS v
        FROM (SELECT token FROM counts ORDER BY n DESC, token ASC LIMIT 20)
    )
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_filter(string_split(text, ' '),
                    x -> NOT list_contains(v, x))) AS INT) AS n_unk,
           round(len(list_filter(string_split(text, ' '),
                     x -> NOT list_contains(v, x)))
                 * 1.0 / greatest(len(string_split(text, ' ')), 1), 4)
               AS unk_ratio
    FROM documents, vocab
"""

# Per-language median quality gate: percentile_disc(0.5) via the
# integer-logic cumulative histogram over the ROUNDED quality values —
# the same smallest-value-with-cum>=ceil(n/2) formulation as the Spark
# side (engine-native median()/quantile interpolation differs, so neither
# engine's builtin is used).
TEXT_ORACLES["pipeline_quality_filter"] = f"""
    WITH feats AS (
        SELECT l.doc_id, l.pred_lang, q.quality
        FROM ({TEXT_ORACLES["text_lang_id"]}) l
        JOIN ({TEXT_ORACLES["text_quality_score"]}) q USING (doc_id)
    ),
    hist AS (
        SELECT pred_lang, quality, count(*) AS n
        FROM feats GROUP BY pred_lang, quality
    ),
    cum AS (
        SELECT pred_lang, quality,
               sum(n) OVER (PARTITION BY pred_lang ORDER BY quality
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER (PARTITION BY pred_lang) AS tot
        FROM hist
    ),
    thr AS (
        SELECT pred_lang, min(quality) AS lang_median
        FROM cum WHERE cum >= (tot + 1) // 2
        GROUP BY pred_lang
    )
    SELECT f.doc_id, f.pred_lang, f.quality, t.lang_median
    FROM feats f JOIN thr t USING (pred_lang)
    WHERE f.quality >= t.lang_median
"""

# PII scrub: patterns restricted to the Java-regex ∩ RE2 dialect
# (character classes, bounded repetition, \b — no lookaround or
# backreferences) so both engines match identical spans. Must stay in
# sync with text_analysis.PII_EMAIL/PII_IPV4/PII_PHONE.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_PII_PHONE = "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

TEXT_ORACLES["pipeline_pii_scrub"] = f"""
    WITH r AS (
        SELECT doc_id, text,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_IPV4}', '<IP>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g') AS clean
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS INT)
               AS n_ipv4,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS INT)
               AS n_phones,
           CAST(length(clean) AS INT) AS clean_len,
           md5(clean) AS clean_fp
    FROM r
"""

# MinHash signature, mirroring the Spark ``dedup._perm_cols`` scheme
# EXACTLY (four 8-hex chunks of md5(s) + four of md5('1:'||s)) so the LSH
# candidate sets — not just the verified pairs — are engine-identical.
# Round-13 fix: the original twin used a DIFFERENT hash family
# (md5('p:'||x) full-hex per permutation). Verified-pairs output masked
# it at sf0.01 — both band families caught every >=0.2-jaccard pair on
# 1k docs — but the first full 10x-fixture sweep caught it: at 20k docs
# the two candidate sets recall different above-threshold pairs
# (16572 vs 16545 verified rows). An oracle must mirror the mechanism,
# not just coincide on small outputs.
_MINHASH_SIG_CHUNKED_SQL = (
    "["
    + ", ".join(
        [
            f"list_min(list_transform(s, x -> substr(md5(x), {c * 8 + 1}, 8)))"
            for c in range(4)
        ]
        + [
            f"list_min(list_transform(s, x -> substr(md5('1:' || x), {c * 8 + 1}, 8)))"
            for c in range(4)
        ]
    )
    + "]"
)

DEDUP_ORACLES: dict[str, str] = {
    "dedup_exact": f"""
        WITH docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        )
        SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fingerprint,
               min(doc_id) AS keeper_doc_id,
               count(*)    AS n_copies
        FROM docs
        GROUP BY 1
    """,
    "pipeline_chunk_dedup": """
        WITH docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        ),
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
        sized AS (
            SELECT doc_id, t,
                   CASE WHEN len(t) <= 64 THEN 1
                        ELSE (len(t) - 64 + 48 - 1) // 48 + 1 END AS n_chunks
            FROM toks
        ),
        c AS (
            SELECT doc_id, t,
                   CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx
            FROM sized
        ),
        fp AS (
            SELECT doc_id,
                   md5(array_to_string(
                       t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' '
                   )) AS chunk_fp
            FROM c
        )
        SELECT chunk_fp, min(doc_id) AS keeper_doc_id,
               count(*) AS n_copies
        FROM fp GROUP BY chunk_fp HAVING count(*) > 1
    """,
    "dedup_winnow_pairs": """
        WITH docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        ),
        g AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3 THEN
                       list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE []::VARCHAR[] END AS grams
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM docs)
        ),
        hashes AS (
            SELECT doc_id,
                   list_transform(grams,
                       x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
            FROM g WHERE len(grams) > 0
        ),
        wins AS (
            SELECT doc_id,
                   list_transform(range(1, len(hs) + 1),
                       i -> list_min(hs[greatest(1, i - 3):i])) AS mins
            FROM hashes
        ),
        fps AS (SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM wins),
        keep AS (
            SELECT fp FROM fps GROUP BY fp
            HAVING count(*) BETWEEN 2 AND 8
        ),
        pl AS (SELECT f.fp, f.doc_id FROM fps f JOIN keep USING (fp))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_shared_fps
        FROM pl a JOIN pl b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 2
    """,
    "dedup_minhash_lsh": f"""
        WITH {_SHINGLES_CTE},
        sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        sigs AS (SELECT doc_id, {_MINHASH_SIG_CHUNKED_SQL} AS sig FROM sh2),
        bands AS (
            SELECT doc_id, b.band_idx,
                   sig[b.band_idx*2 + 1] || '|' || sig[b.band_idx*2 + 2] AS band_key
            FROM sigs, (VALUES (0),(1),(2),(3)) b(band_idx)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(len(list_intersect(x.s, y.s)) * 1.0
                     / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
        FROM cand
        JOIN sh2 x ON cand.doc_a = x.doc_id
        JOIN sh2 y ON cand.doc_b = y.doc_id
        WHERE len(list_intersect(x.s, y.s)) * 1.0
              / len(list_distinct(list_concat(x.s, y.s))) >= 0.2
    """,
    "dedup_simhash": """
        WITH t AS (
            SELECT doc_id,
                   list_transform(string_split(text,' '),
                       tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT) AS h
            FROM documents
        ),
        bits AS (
            SELECT doc_id, j,
                   CASE WHEN list_sum(list_transform(h,
                            v -> CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                        THEN (1::BIGINT << j) ELSE 0 END AS bitv
            FROM t, range(0, 32) r(j)
        )
        SELECT doc_id, CAST(sum(bitv) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
    """,
}

# Keep-one canonicalization: recursive transitive closure over the verified
# near-dup pairs (runs to the TRUE fixed point, so it independently checks
# the Spark side's budgeted min-label loop + convergence guard), canonical =
# min doc_id reachable; singletons map to themselves.
# Duplicated-substring spans (dedup.dedup_substring_spans): candidate
# pairs are the FULL winnow-pairs query (interpolated, never re-typed);
# matching gram-hash positions join per pair, islands merge on the
# alignment diagonal. ALL constants — the gram width (the whole
# K-token gram expression and its range bound), the tail offset, and
# SPAN_MIN_GRAMS — are generated from the Spark side at import, so a
# WINNOW_K bump re-derives the twin instead of silently desyncing it
# (round-11 ADVICE item 1).
def _substring_spans_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.dedup import (
        SPAN_MIN_GRAMS,
    )
    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        WINNOW_K,
    )

    last = WINNOW_K - 1
    gram = " || ' ' || ".join(
        "t[i]" if j == 0 else f"t[i+{j}]" for j in range(WINNOW_K)
    )
    gram_range = f"range(1, len(t) - {WINNOW_K - 2})"
    return f"""
        WITH pairs AS (
            SELECT doc_a, doc_b FROM ({DEDUP_ORACLES["dedup_winnow_pairs"]})
        ),
        docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        ),
        g AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= {WINNOW_K} THEN
                       list_transform({gram_range},
                                      i -> {gram})
                   ELSE []::VARCHAR[] END AS grams
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM docs)
        ),
        hashes AS (
            SELECT doc_id,
                   list_transform(grams,
                       x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
            FROM g WHERE len(grams) > 0
        ),
        gp AS (
            SELECT doc_id,
                   CAST(unnest(range(1, len(hs) + 1)) AS INT) AS pos,
                   unnest(hs) AS h
            FROM hashes
        ),
        m AS (
            SELECT p.doc_a, p.doc_b, a.pos AS pa, b.pos AS pb,
                   a.pos - b.pos AS diag
            FROM pairs p
            JOIN gp a ON a.doc_id = p.doc_a
            JOIN gp b ON b.doc_id = p.doc_b AND b.h = a.h
        ),
        isl AS (
            SELECT doc_a, doc_b, pa, diag,
                   pa - row_number() OVER (
                       PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS isl
            FROM m
        ),
        runs AS (
            SELECT doc_a, doc_b, diag,
                   min(pa) AS a_start, max(pa) AS a_end_g,
                   count(*) AS ng
            FROM isl GROUP BY doc_a, doc_b, diag, isl
            HAVING count(*) >= {SPAN_MIN_GRAMS}
        )
        SELECT doc_a, doc_b,
               CAST(a_start AS INT)                 AS a_start,
               CAST(a_end_g + {last} AS INT)        AS a_end,
               CAST(a_start - diag AS INT)          AS b_start,
               CAST(a_end_g - diag + {last} AS INT) AS b_end,
               CAST(ng + {last} AS BIGINT)          AS n_tokens
        FROM runs
    """


DEDUP_ORACLES["dedup_substring_spans"] = _substring_spans_sql()


# Span removal (dedup.pipeline_span_removal): splice the spans back out —
# the spans CTE is the FULL spans query (interpolated); the splice is the
# same position-filter shape the Spark side runs row-locally.
DEDUP_ORACLES["pipeline_span_removal"] = f"""
    WITH spans AS ({DEDUP_ORACLES["dedup_substring_spans"]}),
    per_doc AS (
        SELECT doc_b AS doc_id,
               list(struct_pack(b_start := b_start, b_end := b_end)) AS sp
        FROM spans GROUP BY doc_b
    ),
    docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    ),
    spliced AS (
        SELECT d.doc_id,
               string_split(d.text, ' ') AS t,
               p.sp AS sp
        FROM docs d JOIN per_doc p USING (doc_id)
    ),
    kept AS (
        SELECT doc_id, t,
               list_filter(range(1, len(t) + 1),
                   p -> len(list_filter(sp,
                       s -> p >= s.b_start AND p <= s.b_end)) = 0) AS keep_pos
        FROM spliced
    )
    SELECT doc_id,
           CAST(len(t) AS INT)                 AS n_tokens_before,
           CAST(len(t) - len(keep_pos) AS INT) AS n_tokens_removed,
           coalesce(array_to_string(
               list_transform(keep_pos, p -> t[CAST(p AS INT)]), ' '), '')
                                               AS clean_text
               -- fully-removed doc: [] stringifies to NULL in DuckDB,
               -- Spark's concat_ws gives '' — pin the engines together
               -- (same rule as the delta-docs near-dup slice)
    FROM kept
"""

DEDUP_ORACLES["dedup_minhash_groups"] = f"""
    WITH RECURSIVE pairs AS ({DEDUP_ORACLES["dedup_minhash_lsh"]}),
    sympairs AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM sympairs
        UNION
        SELECT r.a, s.b FROM reach r JOIN sympairs s ON r.b = s.a
    ),
    canon AS (
        SELECT a AS doc_id, least(a, min(b)) AS canonical_id
        FROM reach GROUP BY a
    )
    SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
    FROM documents d LEFT JOIN canon c USING (doc_id)
"""

# Composed pipeline: keep-one ∩ language ∩ quality — each stage is the
# standalone oracle above / in TEXT_ORACLES, re-joined on doc_id.
DEDUP_ORACLES["pipeline_training_mix"] = f"""
    SELECT k.doc_id, l.pred_lang, q.quality, t.n_tokens
    FROM (SELECT doc_id FROM ({DEDUP_ORACLES["dedup_minhash_groups"]}) g
          WHERE g.doc_id = g.canonical_id) k
    JOIN ({TEXT_ORACLES["text_lang_id"]}) l USING (doc_id)
    JOIN ({TEXT_ORACLES["text_quality_score"]}) q USING (doc_id)
    JOIN ({TEXT_ORACLES["text_token_stats"]}) t USING (doc_id)
    WHERE l.pred_lang = 'en' AND q.quality >= 0.3
"""

# Delta dedup twins use the same engine-identical chunked minhash
# signature (_MINHASH_SIG_CHUNKED_SQL, defined with the dedup oracles
# above — since round 13 the single definition serves both families).

_NORM_FP_SQL = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')))"
)

#: the deterministic increment (dedup._delta_docs): exact re-crawls,
#: first-two-tokens-dropped near-dups, token-reversed new docs, and
#: spliced partial-overlap docs (first PARTIAL_PREFIX_TOKENS kept, rest
#: reversed). Offsets and the splice bound are the Spark-side constants
#: THEMSELVES (round-8 ADVICE: interpolate, never re-type — a constant
#: change must move both twins together).
def _delta_docs_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.dedup import (
        DELTA_EXACT_OFFSET,
        DELTA_NEAR_OFFSET,
        DELTA_NEW_OFFSET,
        DELTA_PARTIAL_OFFSET,
        PARTIAL_PREFIX_TOKENS,
    )

    p = PARTIAL_PREFIX_TOKENS
    return f"""
    SELECT doc_id + {DELTA_EXACT_OFFSET} AS doc_id, text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + {DELTA_NEAR_OFFSET} AS doc_id,
           coalesce(array_to_string(string_split(text, ' ')[3:], ' '), '')
               AS text  -- <3-token doc: [] stringifies to NULL; Spark's
                        -- concat_ws gives '' — pin the engines together
    FROM documents WHERE doc_id % 10 = 5
    UNION ALL
    SELECT doc_id + {DELTA_NEW_OFFSET} AS doc_id,
           array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
    FROM documents WHERE doc_id % 10 = 7
    UNION ALL
    SELECT doc_id + {DELTA_PARTIAL_OFFSET} AS doc_id,
           coalesce(array_to_string(
               list_concat(t[1:{p}], list_reverse(t[{p + 1}:])), ' '), '')
               AS text
    FROM (SELECT doc_id, string_split(text, ' ') AS t
          FROM documents WHERE doc_id % 10 = 3)
"""


_DELTA_DOCS_SQL = _delta_docs_sql()

# Shared thresholds of the delta-decision twin — the Spark constants
# themselves (round-8 ADVICE: interpolate, never re-type).
from spark_ml_algo_lib_master_tongji_spark.operators.dedup import (  # noqa: E402
    JACCARD_THRESHOLD as _DELTA_JACCARD,
    WINNOW_DF_MAX as _WINNOW_DF_MAX,
    WINNOW_MIN_SHARED as _WINNOW_MIN_SHARED,
)

#: winnowing sketch CTE chain (K=3-token grams, window W=4, 15-hex md5
#: hashes) over ``{src}`` with prefix ``{p}`` → {p}wfps(doc_id, fp) —
#: mirror of text_analysis.winnow_fp_stream.
def _winnow_fp_ctes(src: str, p: str) -> str:
    return f"""{p}g AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN
                   list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE []::VARCHAR[] END AS grams
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM {src})
    ),
    {p}wh AS (
        SELECT doc_id,
               list_transform(grams,
                   x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        FROM {p}g WHERE len(grams) > 0
    ),
    {p}wm AS (
        SELECT doc_id,
               list_transform(range(1, len(hs) + 1),
                   i -> list_min(hs[greatest(1, i - 3):i])) AS mins
        FROM {p}wh
    ),
    {p}wfps AS (
        SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM {p}wm
    )"""


def _delta_shingle_ctes(src: str, p: str) -> str:
    """Distinct-3-gram shingle CTE chain over ``src`` with prefix ``p``."""
    return f"""{p}t AS (SELECT doc_id, string_split(text, ' ') AS t FROM {src}),
    {p}sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(t) >= 3 THEN
                       list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE []::VARCHAR[] END
               ) AS s
        FROM {p}t
    ),
    {p}sh2 AS (SELECT doc_id, s FROM {p}sh WHERE len(s) > 0)"""


DEDUP_ORACLES["dedup_delta"] = f"""
    WITH delta AS ({_DELTA_DOCS_SQL}),
    basefp AS (
        SELECT {_NORM_FP_SQL} AS fp, min(doc_id) AS keeper
        FROM documents GROUP BY 1
    ),
    dfp AS (SELECT doc_id, {_NORM_FP_SQL} AS fp FROM delta),
    exact AS (SELECT d.doc_id, b.keeper FROM dfp d JOIN basefp b USING (fp)),
    {_delta_shingle_ctes("documents", "b")},
    {_delta_shingle_ctes("delta", "d")},
    bsig AS (SELECT doc_id, {_MINHASH_SIG_CHUNKED_SQL} AS sig FROM bsh2),
    dsig AS (SELECT doc_id, {_MINHASH_SIG_CHUNKED_SQL} AS sig FROM dsh2),
    bband AS (
        SELECT doc_id, b.band_idx,
               sig[b.band_idx*2 + 1] || '|' || sig[b.band_idx*2 + 2] AS band_key
        FROM bsig, (VALUES (0),(1),(2),(3)) b(band_idx)
    ),
    dband AS (
        SELECT doc_id, b.band_idx,
               sig[b.band_idx*2 + 1] || '|' || sig[b.band_idx*2 + 2] AS band_key
        FROM dsig, (VALUES (0),(1),(2),(3)) b(band_idx)
    ),
    cand AS (
        SELECT DISTINCT d.doc_id AS ddoc, b.doc_id AS bdoc
        FROM dband d JOIN bband b
          ON d.band_idx = b.band_idx AND d.band_key = b.band_key
    ),
    near AS (
        SELECT ddoc, min(bdoc) AS keeper
        FROM cand
        JOIN dsh2 x ON cand.ddoc = x.doc_id
        JOIN bsh2 y ON cand.bdoc = y.doc_id
        WHERE len(list_intersect(x.s, y.s)) * 1.0
              / len(list_distinct(list_concat(x.s, y.s))) >= {_DELTA_JACCARD}
          AND ddoc NOT IN (SELECT doc_id FROM exact)
        GROUP BY ddoc
    ),
    {_winnow_fp_ctes("documents", "b")},
    {_winnow_fp_ctes("delta", "d")},
    capped AS (
        SELECT fp, doc_id AS bdoc FROM bwfps
        WHERE fp IN (SELECT fp FROM bwfps GROUP BY fp
                     HAVING count(*) <= {_WINNOW_DF_MAX})
    ),
    partial AS (
        SELECT ddoc, min(bdoc) AS keeper FROM (
            SELECT d.doc_id AS ddoc, c.bdoc
            FROM dwfps d JOIN capped c USING (fp)
            GROUP BY d.doc_id, c.bdoc
            HAVING count(*) >= {_WINNOW_MIN_SHARED}
        )
        WHERE ddoc NOT IN (SELECT doc_id FROM exact)
          AND ddoc NOT IN (SELECT ddoc FROM near)
        GROUP BY ddoc
    )
    SELECT doc_id, 'dup_exact' AS decision, keeper AS keeper_doc_id FROM exact
    UNION ALL
    SELECT ddoc AS doc_id, 'dup_near' AS decision, keeper AS keeper_doc_id
    FROM near
    UNION ALL
    SELECT ddoc AS doc_id, 'dup_partial' AS decision, keeper AS keeper_doc_id
    FROM partial
    UNION ALL
    SELECT doc_id, 'new' AS decision, doc_id AS keeper_doc_id FROM delta
    WHERE doc_id NOT IN (SELECT doc_id FROM exact)
      AND doc_id NOT IN (SELECT ddoc FROM near)
      AND doc_id NOT IN (SELECT ddoc FROM partial)
"""

DEDUP_ORACLES["dedup_index_stats"] = f"""
    WITH {_delta_shingle_ctes("documents", "b")},
    {_winnow_fp_ctes("documents", "b")},
    bover AS (
        SELECT fp FROM bwfps GROUP BY fp
        HAVING count(*) > {_WINNOW_DF_MAX}
    )
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           (SELECT count(DISTINCT {_NORM_FP_SQL}) FROM documents)
               AS n_exact_fps,
           (SELECT count(*) FROM bsh2) AS n_sig_docs,
           (SELECT count(*) FROM bwfps
            WHERE fp NOT IN (SELECT fp FROM bover)) AS n_winnow_postings,
           (SELECT count(*) FROM bover) AS n_overcap_fps
"""

DEDUP_ORACLES["dedup_simhash_pairs"] = f"""
    WITH sims AS ({DEDUP_ORACLES["dedup_simhash"]}),
    pref AS (SELECT doc_id, simhash, simhash >> 16 AS block FROM sims)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM pref a JOIN pref b
      ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
"""

SIM_ORACLES: dict[str, str] = {
    "sim_brute_force_topk": """
        WITH q AS (
            SELECT vec_id AS query_id,
                   list_transform(embedding, x -> x::DOUBLE) AS qv
            FROM embeddings WHERE vec_id < 10
        ),
        c AS (
            SELECT vec_id AS neighbor_id,
                   list_transform(embedding, x -> x::DOUBLE) AS cv
            FROM embeddings WHERE vec_id >= 10
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                   round(list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv))
                            * sqrt(list_dot_product(cv, cv))), 4) AS cosine
            FROM c, q
        )
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
            ) AS rank
            FROM scored
        )
        WHERE rank <= 5
    """,
}


def _lsh_pairs_ctes() -> str:
    """The shared LSH-candidate CTE chain (mirrors
    operators/similarity.py lsh_candidate_pairs: identical md5-derived
    hyperplane constants rendered as SQL literals)."""
    import hashlib

    planes = []
    for p in range(8):
        vals = []
        for d in range(64):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            vals.append(repr((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0))
        planes.append("[" + ", ".join(vals) + "]")
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {planes[p]}) > 0 THEN {2**p} ELSE 0 END)"
        for p in range(8)
    )
    return f"""
        WITH e AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings
        ),
        sigs AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
        pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
            FROM sigs a JOIN sigs b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
    """


SIM_ORACLES["sim_lsh_bucket_pairs"] = (
    _lsh_pairs_ctes()
    + " SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.35"
)


DEDUP_ORACLES["dedup_ngram_jaccard"] = f"""
    WITH {_SHINGLES_CTE},
    sh2 AS (SELECT doc_id, s FROM sh),
    pref AS (
        SELECT doc_id, UNNEST(list_sort(s)[1:3]) AS p FROM sh2
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pref a JOIN pref b ON a.p = b.p AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round(len(list_intersect(x.s, y.s)) * 1.0
                 / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
    FROM cand
    JOIN sh2 x ON cand.doc_a = x.doc_id
    JOIN sh2 y ON cand.doc_b = y.doc_id
    WHERE len(list_intersect(x.s, y.s)) * 1.0
          / len(list_distinct(list_concat(x.s, y.s))) >= 0.2
"""

DEDUP_ORACLES["dedup_embedding_cosine"] = """
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    nbr AS (
        SELECT a.vec_id AS vec_id, min(b.vec_id) AS mn
        FROM e a CROSS JOIN e b
        WHERE a.vec_id <> b.vec_id
          AND round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 4)
              >= CAST(0.35 AS DOUBLE)
        GROUP BY a.vec_id
    )
    SELECT e.vec_id, least(e.vec_id, coalesce(n.mn, e.vec_id)) AS keeper
    FROM e LEFT JOIN nbr n ON e.vec_id = n.vec_id
"""

# Same election restricted to LSH-bucket candidate pairs — replicates the
# Spark operator's candidate generation exactly (same hyperplane literals),
# so the differential check is exact for the candidate-bounded semantics.
DEDUP_ORACLES["dedup_embedding_cosine_lsh"] = (
    _lsh_pairs_ctes()
    + """
    , cand AS (SELECT vec_a, vec_b FROM pairs WHERE cosine >= 0.35),
    directed AS (
        SELECT vec_a AS vec_id, vec_b AS nb FROM cand
        UNION ALL
        SELECT vec_b AS vec_id, vec_a AS nb FROM cand
    ),
    nbr AS (SELECT vec_id, min(nb) AS mn FROM directed GROUP BY vec_id)
    SELECT e.vec_id, least(e.vec_id, coalesce(n.mn, e.vec_id)) AS keeper
    FROM e LEFT JOIN nbr n ON e.vec_id = n.vec_id
"""
)

# As-of join (relational.q_asof_join_click_attribution): the twin runs
# DuckDB's NATIVE ASOF LEFT JOIN — the Spark union+window composition is
# verified against the genuine operator's >= semantics, including
# unmatched-left NULLs and at-timestamp-equality matches.
RELATIONAL_ORACLES["q_asof_join_click_attribution"] = """
    WITH e AS (
        SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us
        FROM events
    ),
    c AS (
        SELECT user_id, us, max(event_id) AS click_id
        FROM e WHERE event_type = 'click' GROUP BY user_id, us
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, us FROM e
        WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.us AS purchase_us,
           c.click_id, c.us AS click_us, p.us - c.us AS gap_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.us
"""


def _range_join_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.relational import (
        VALUE_TIERS,
    )

    rows = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in VALUE_TIERS)
    return f"""
    WITH tiers(tier, lo, hi) AS (VALUES {rows})
    SELECT t.tier, e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM events e JOIN tiers t
      ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier, e.event_type
"""


RELATIONAL_ORACLES["q_range_join_value_tiers"] = _range_join_sql()

# ROLLUP grouping sets (relational.q_rollup_revenue): DuckDB's ROLLUP
# emits the identical subtotal rows; NULL markers coalesced the same way.
# Revenue sums as DECIMAL(18,2) — exact associative cents (fp64 SUM
# drifted 1e-2 between engines on the grand-total row at the 10×
# fixture); the fixture's prices are cents-exact doubles so the cast is
# unambiguous on both engines.
RELATIONAL_ORACLES["q_rollup_revenue"] = """
    WITH rev AS (
        SELECT r.r_name, n.n_name,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS price_c
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           count(*) AS n_orders,
           CAST(sum(price_c) AS DOUBLE) AS revenue
    FROM rev GROUP BY ROLLUP (r_name, n_name)
"""


def _pivot_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.relational import (
        EVENT_TYPES,
    )

    cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
    SELECT user_id,
           {cols}
    FROM events GROUP BY user_id
"""


RELATIONAL_ORACLES["q_pivot_event_types"] = _pivot_sql()

# Resample + gap fill (relational.q_resample_gapfill): generate_series
# densifies each user's [first, last] day range; observed days join back.
RELATIONAL_ORACLES["q_resample_gapfill"] = """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    bounds AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY user_id
    ),
    calendar AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM bounds
    )
    SELECT c.user_id, c.day,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
    FROM calendar c LEFT JOIN daily d USING (user_id, day)
"""

# Ordered funnel (relational.q_funnel_conversion): each stage's earliest
# timestamp AFTER the previous stage; µs-truncated times both engines.
RELATIONAL_ORACLES["q_funnel_conversion"] = """
    WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
    ),
    t1 AS (
        SELECT user_id, min(us) AS t_click FROM e
        WHERE event_type = 'click' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, t1.t_click, min(e.us) AS t_view
        FROM e JOIN t1 USING (user_id)
        WHERE e.event_type = 'view' AND e.us >= t1.t_click
        GROUP BY e.user_id, t1.t_click
    ),
    t3 AS (
        SELECT e.user_id, min(e.us) AS t_purchase
        FROM e JOIN t2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.us >= t2.t_view
        GROUP BY e.user_id
    )
    SELECT (SELECT count(DISTINCT user_id) FROM e)  AS n_users,
           (SELECT count(*) FROM t1)                AS n_click,
           (SELECT count(*) FROM t2)                AS n_click_view,
           (SELECT count(*) FROM t3)                AS n_full_funnel
"""

# Funnel time-to-convert (relational.q_funnel_ttc): same chained stage
# CTEs as q_funnel_conversion; discrete lower quantiles over whole-second
# gaps — ceil(p*n/100) carried as (p*n + 99) // 100 in pure integer
# arithmetic on both engines (Spark uses the x - x % 100 floor form).
def _funnel_ttc_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.relational import (
        FUNNEL_TTC_PCTS,
    )

    pct_cols = ",\n           ".join(
        f"min(CASE WHEN cum >= (n * {p} + 99) // 100 THEN gap_s END)"
        f" AS p{p}_s"
        for p in FUNNEL_TTC_PCTS
    )
    return f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
    ),
    t1 AS (
        SELECT user_id, min(us) AS t_click FROM e
        WHERE event_type = 'click' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, t1.t_click, min(e.us) AS t_view
        FROM e JOIN t1 USING (user_id)
        WHERE e.event_type = 'view' AND e.us >= t1.t_click
        GROUP BY e.user_id, t1.t_click
    ),
    t3 AS (
        SELECT e.user_id, min(e.us) AS t_purchase
        FROM e JOIN t2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.us >= t2.t_view
        GROUP BY e.user_id
    ),
    gaps AS (
        SELECT 'click_to_view' AS stage,
               (t_view - t_click) // 1000000 AS gap_s FROM t2
        UNION ALL
        SELECT 'view_to_purchase',
               (t3.t_purchase - t2.t_view) // 1000000
        FROM t3 JOIN t2 USING (user_id)
        UNION ALL
        SELECT 'click_to_purchase',
               (t3.t_purchase - t2.t_click) // 1000000
        FROM t3 JOIN t2 USING (user_id)
    ),
    vc AS (SELECT stage, gap_s, count(*) AS cnt FROM gaps GROUP BY 1, 2),
    c AS (
        SELECT stage, gap_s,
               sum(cnt) OVER (PARTITION BY stage ORDER BY gap_s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(cnt) OVER (PARTITION BY stage) AS n
        FROM vc
    )
    SELECT stage,
           CAST(max(n) AS BIGINT) AS n_users,
           {pct_cols}
    FROM c GROUP BY stage
"""


RELATIONAL_ORACLES["q_funnel_ttc"] = _funnel_ttc_sql()


# Rolling mean (relational.q_moving_average): identical ROWS-frame
# window; decimal-exact daily sums, one double conversion, one division.
# Frame width interpolates the Spark side's MA_DAYS (never re-typed).
def _moving_average_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.relational import (
        MA_DAYS,
    )

    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(value AS DECIMAL(18,2))) AS dv
        FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT day,
           CAST(dv AS DOUBLE) AS daily_value,
           round(CAST(sum(dv) OVER w AS DOUBLE)
                 / count(*) OVER w, 4) AS ma7
    FROM daily
    WINDOW w AS (ORDER BY day
                 ROWS BETWEEN {MA_DAYS - 1} PRECEDING AND CURRENT ROW)
"""


RELATIONAL_ORACLES["q_moving_average"] = _moving_average_sql()

# HLL anchor (stats.stat_hll_accuracy): exact users count + TRUE boolean.
# The event-id regime (1M+ ids at the 10× fixture) moved to the
# once-per-round pytest (round-12 verdict item 2) — its exact arm was
# the suite's one measured scale-killer.
STATS_ORACLES["stat_hll_accuracy"] = """
    SELECT count(DISTINCT user_id) AS exact_users,
           TRUE AS hll_users_ok
    FROM events
"""

# Per-group HLL rollup (stats.stat_group_distinct): exact per-group
# counts + TRUE audit boolean; Monday week truncation in both engines.
STATS_ORACLES["stat_group_distinct"] = """
    SELECT event_type,
           CAST(date_trunc('week', ts) AS DATE) AS week,
           count(*) AS n_events,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS hll_ok
    FROM events
    GROUP BY 1, 2
"""

# Chi-square independence (stats.stat_chi_square): identical contingency
# arithmetic — totals carried as DOUBLE like the Spark side (ra·cb would
# overflow int64 at scale), observed counts exact integers. DuckDB's
# dayofweek counts Sunday as 0 where Spark counts 1; +1 aligns levels.
STATS_ORACLES["stat_chi_square"] = """
    WITH ct AS (
        SELECT event_type AS a, dayofweek(ts) + 1 AS b, count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT a, CAST(sum(o) AS DOUBLE) AS ra FROM ct GROUP BY a),
    cl AS (SELECT b, CAST(sum(o) AS DOUBLE) AS cb FROM ct GROUP BY b),
    t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                 CAST(sum(o) AS DOUBLE) AS nd,
                 count(DISTINCT a) AS r,
                 count(DISTINCT b) AS c
          FROM ct),
    cells AS (
        SELECT min(t.n) AS n, min(t.nd) AS nd, min(t.r) AS r,
               min(t.c) AS c,
               sum((ct.o - rt.ra * cl.cb / t.nd)
                   * (ct.o - rt.ra * cl.cb / t.nd)
                   / (rt.ra * cl.cb / t.nd)) AS chi2_raw
        FROM ct JOIN rt USING (a) JOIN cl USING (b) CROSS JOIN t
    )
    SELECT n, r AS r_levels, c AS c_levels,
           round(chi2_raw, 4) AS chi2,
           (r - 1) * (c - 1) AS df_chi,
           round(sqrt(chi2_raw / (nd * least(r - 1, c - 1))), 6)
               AS cramers_v
    FROM cells
"""

# Cohort retention (relational.q_events_retention_cohorts): both engines
# truncate weeks to Monday, so offsets are exact multiples of 7 days.
RELATIONAL_ORACLES["q_events_retention_cohorts"] = """
    WITH weekly AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ),
    cohort AS (
        SELECT user_id, min(wk) AS cohort_week FROM weekly GROUP BY user_id
    )
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, w.wk) / 7 AS INT)
               AS week_offset,
           count(*) AS n_users
    FROM weekly w JOIN cohort c USING (user_id)
    GROUP BY 1, 2
"""

# approx_percentile anchor (stats.stat_approx_quantile_accuracy): exact
# percentiles (quantile_cont ≡ Spark's percentile, proven by
# pipeline_profile_quantiles) + TRUE — the sketch audit rides in the
# boolean on the Spark side. Probabilities interpolate the Spark
# constants (never re-typed).
def _approx_quantile_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.stats import (
        APPROX_PCTL_PS,
    )

    cols = ", ".join(
        f"round(quantile_cont(CAST(l_extendedprice AS DOUBLE), {p}), 6) "
        f"AS p{int(p * 100)}"
        for p in APPROX_PCTL_PS
    )
    return f"SELECT {cols}, TRUE AS approx_ok FROM lineitem"


STATS_ORACLES["stat_approx_quantile_accuracy"] = _approx_quantile_sql()

# Welch t-test (stats.stat_welch_ttest): identical moment formulas and
# rounding; group constants interpolated from the Spark side.
def _welch_ttest_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.stats import (
        TTEST_GROUP_A,
        TTEST_GROUP_B,
    )

    return f"""
    WITH m AS (
        SELECT
            count(CASE WHEN event_type = '{TTEST_GROUP_A}' THEN value END)
                AS n_a,
            avg(CASE WHEN event_type = '{TTEST_GROUP_A}' THEN value END)
                AS m_a,
            var_samp(CASE WHEN event_type = '{TTEST_GROUP_A}' THEN value END)
                AS v_a,
            count(CASE WHEN event_type = '{TTEST_GROUP_B}' THEN value END)
                AS n_b,
            avg(CASE WHEN event_type = '{TTEST_GROUP_B}' THEN value END)
                AS m_b,
            var_samp(CASE WHEN event_type = '{TTEST_GROUP_B}' THEN value END)
                AS v_b
        FROM events
    )
    SELECT n_a, n_b,
           round(m_a - m_b, 6) AS mean_diff,
           round((m_a - m_b)
                 / sqrt(v_a / n_a + v_b / n_b), 4) AS t_stat,
           round(((v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b))
                 / ((v_a / n_a) * (v_a / n_a) / (n_a - 1)
                    + (v_b / n_b) * (v_b / n_b) / (n_b - 1)), 2)
               AS df_welch
    FROM m
"""


STATS_ORACLES["stat_welch_ttest"] = _welch_ttest_sql()

# Equal-width histogram (stats.stat_value_histogram): the bucket id is
# the same IEEE expression tree in both engines; NB interpolated. NULL
# values are excluded before bucketing on BOTH sides (round-12 ADVICE
# item 1: unfiltered NULLs fell through least/floor into bucket NB−1 in
# both engines, so the hash agreed on the wrong answer).
def _value_histogram_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.stats import (
        HIST_NBUCKETS,
    )

    nb = HIST_NBUCKETS
    return f"""
    WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
    b AS (SELECT min(value) AS vmin, max(value) AS vmax FROM v),
    x AS (
        SELECT CAST(CASE WHEN b.vmax = b.vmin THEN 0
                    ELSE least(floor((e.value - b.vmin)
                                     / ((b.vmax - b.vmin) / {nb}.0)),
                               {nb - 1})
                    END AS INT) AS bucket,
               e.value, b.vmin, b.vmax
        FROM v e CROSS JOIN b
    )
    SELECT bucket,
           round(vmin + bucket * ((vmax - vmin) / {nb}.0), 6) AS bucket_lo,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM x GROUP BY bucket, vmin, vmax
"""


STATS_ORACLES["stat_value_histogram"] = _value_histogram_sql()


# Equal-frequency histogram (stats.stat_freq_histogram): value-aligned
# equi-depth buckets — bucket(v) = (rows_before(v) * NB) div n, pure
# integer arithmetic on both engines (Spark `x - x % n` floor-division
# form ≡ DuckDB `//` for non-negative operands). Per-bucket value sums
# carried as exact integer cents so the hash is order-independent.
def _freq_histogram_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.operators.stats import (
        HIST_NBUCKETS,
    )

    nb = HIST_NBUCKETS
    return f"""
    WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
    vc AS (SELECT value, count(*) AS cnt FROM v GROUP BY value),
    c AS (
        SELECT value, cnt,
               CAST(floor(value * 100 + 0.5) AS BIGINT) * cnt AS cents,
               coalesce(sum(cnt) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS before_,
               sum(cnt) OVER () AS n_rows
        FROM vc
    )
    SELECT CAST((before_ * {nb}) // n_rows AS INT) AS bucket,
           CAST(sum(cnt) AS BIGINT) AS n,
           min(value) AS lo,
           max(value) AS hi,
           CAST(sum(cents) AS BIGINT) AS sum_value_cents
    FROM c GROUP BY 1
"""


STATS_ORACLES["stat_freq_histogram"] = _freq_histogram_sql()

RELATIONAL_ORACLES["q_skew_salted_user_counts"] = """
    SELECT user_id, count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
"""

RELATIONAL_ORACLES["q_string_id_dictionary"] = """
    WITH edges AS (
        SELECT DISTINCT n.n_name AS src_name, r.r_name AS dst_name
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        CROSS JOIN region r
    ),
    names AS (
        SELECT src_name AS name FROM edges
        UNION
        SELECT dst_name AS name FROM edges
    ),
    dict AS (
        SELECT name, row_number() OVER (ORDER BY name) - 1 AS vid FROM names
    )
    SELECT e.src_name, e.dst_name,
           ds.vid AS src_id, dd.vid AS dst_id
    FROM edges e
    JOIN dict ds ON e.src_name = ds.name
    JOIN dict dd ON e.dst_name = dd.name
"""

# The spark.sql entry path runs the same SQL text on both engines (modulo
# the shared floor-rounding form already written into the query).
SQL_ENTRY_ORACLES: dict[str, str] = {
    "q_sql_entry_top_suppliers": """
        WITH rev AS (
            SELECT r.r_name AS region, s.s_name AS supplier,
                   floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 1e4
                         + 0.5) / 1e4 AS revenue
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, s.s_name
        )
        SELECT region, supplier, revenue FROM (
            SELECT region, supplier, revenue,
                   row_number() OVER (PARTITION BY region
                                      ORDER BY revenue DESC, supplier) AS rn
            FROM rev
        ) WHERE rn <= 3
    """,
}

# Streaming results are checked against their BATCH equivalents —
# stream/batch equivalence is the streaming correctness property.
STREAM_ORACLES: dict[str, str] = {
    "stream_windowed_counts": """
        SELECT CAST(date_trunc('day', make_timestamp(epoch_ns(ts) // 1000))
                    AS TIMESTAMP) AS window_start,
               event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "stream_distinct_pairs": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    # stream-static broadcast enrichment == the same batch join+agg
    "stream_nation_event_revenue": """
        SELECT n_name, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n_name
    """,
    # applyInPandasWithState running totals == batch aggregation
    "stream_user_totals_stateful": """
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY user_id
    """,
    # gaps-and-islands sessionization == session_window(gap 30min)
    "stream_sessionization": """
        WITH e AS (
            SELECT user_id, event_id,
                   make_timestamp(epoch_ns(ts) // 1000) AS ts, value
            FROM events
        ),
        x AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, ts, value,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS sid
            FROM x
        )
        SELECT user_id, min(ts) AS session_start,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM s GROUP BY user_id, sid
    """,
}


# Stream-stream join (streaming/pipeline.stream_stream_join): the batch
# self-join on µs-truncated event times — integer µs bounds and gap, no
# fp timestamp math on either engine. The attribution bound is the Spark
# side's own ATTRIBUTION_WINDOW_US, interpolated at import (never
# re-typed — the round-8 ADVICE rule for shared constants).
def _stream_stream_join_sql() -> str:
    from spark_ml_algo_lib_master_tongji_spark.streaming.pipeline import (
        ATTRIBUTION_WINDOW_US,
    )

    return f"""
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   epoch_ns(ts) // 1000 AS us
            FROM events
        )
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.user_id  AS user_id,
               p.us - c.us AS gap_us
        FROM e c JOIN e p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.us >= c.us AND p.us <= c.us + {ATTRIBUTION_WINDOW_US}
    """


STREAM_ORACLES["stream_stream_join"] = _stream_stream_join_sql()

# Multimodal payloads are deterministic UTF-8 encodings of documents.text
# (ASCII fixtures ⇒ byte ops == char ops), so the binary pipeline is
# exactly reproducible on the source text.
MM_ORACLES: dict[str, str] = {
    "mm_manifest": """
        SELECT doc_id, 'text/plain' AS format,
               octet_length(encode(text))::INT AS n_bytes,
               md5(text) AS checksum
        FROM documents
    """,
    "mm_frame_sample": """
        SELECT doc_id, i AS frame_idx,
               md5(substring(text, i * 256 + 1, 256)) AS frame_checksum
        FROM documents,
             UNNEST(generate_series(
                 0,
                 CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) - 1
             )) AS t(i)
    """,
    "mm_byte_features": """
        SELECT doc_id,
               octet_length(encode(text))::BIGINT AS n_bytes,
               (octet_length(encode(text))
                - octet_length(encode(replace(text, ' ', ''))))::BIGINT
                   AS n_spaces,
               (length(text)
                - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT
                   AS n_digits,
               (length(text)
                - length(regexp_replace(text, '[A-Z]', '', 'g')))::BIGINT
                   AS n_upper
        FROM documents
    """,
    "mm_fake_decode": """
        SELECT doc_id,
               (octet_length(encode(text)) % 640 + 1)::INT AS width,
               (octet_length(encode(text)) % 480 + 1)::INT AS height,
               3 AS channels
        FROM documents
    """,
}


def fix_rounds(sql: str) -> str:
    """Rewrite every ``round(expr, d)`` to ``floor((expr) * 1eD + 0.5) / 1eD``.

    Spark's and DuckDB's ``round`` disagree on decimal-half boundary doubles
    (HALF_UP on binary vs decimal-string semantics); the Spark side uses the
    same floor formula (``functions/rounding.py``), making both engines
    bit-identical. Parses balanced parens so nested calls are safe."""
    out = []
    i = 0
    n = len(sql)
    while i < n:
        j = sql.find("round(", i)
        # skip identifiers like 'xround(' — require a non-word char before
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = sql.find("round(", j + 1)
        if j == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        depth = 0
        k = j + len("round(")
        start = k
        comma = -1
        while k < n:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                comma = k
            k += 1
        expr = sql[start:comma].strip()
        digits = int(sql[comma + 1 : k].strip())
        scale = f"1e{digits}"
        # recurse: the extracted expression may itself contain round() calls
        # (found by the hypothesis property test — a nested native round
        # would silently diverge from the Spark floor form)
        out.append(f"floor(({fix_rounds(expr)}) * {scale} + 0.5) / {scale}")
        i = k + 1
    return "".join(out)


def all_oracles() -> dict[str, str]:
    from spark_ml_algo_lib_master_tongji_spark.graph_oracles import (
        build_graph_oracles,
    )
    from spark_ml_algo_lib_master_tongji_spark.ml_oracles import build_ml_oracles

    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    out.update(STATS_ORACLES)
    out.update(TEXT_ORACLES)
    out.update(DEDUP_ORACLES)
    out.update(SIM_ORACLES)
    out.update(build_graph_oracles())
    out.update(build_ml_oracles())
    out.update(STREAM_ORACLES)
    out.update(MM_ORACLES)
    out.update(SQL_ENTRY_ORACLES)
    return {k: fix_rounds(v) for k, v in out.items()}

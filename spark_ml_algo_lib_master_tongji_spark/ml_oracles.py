"""DuckDB oracles for the deterministic ML operators (``operators/ml_exact.py``).

Same discipline as ``graph_oracles.py``: identical expression shapes and
literals, iteration unrolled into materialized CTE chains, distances via
list_dot_product (sequential summation = Spark's ``F.aggregate`` order),
rounding through the shared floor formula before any argmin/compare.
"""

from __future__ import annotations

from spark_ml_algo_lib_master_tongji_spark.graph_oracles import (
    NATION_CTES,
    _materialize,
)
from spark_ml_algo_lib_master_tongji_spark.operators.density import (
    DBSCAN_CC_ROUNDS,
    EPS2,
    GRID_DEMO_SCALE,
    MIN_PTS,
)
from spark_ml_algo_lib_master_tongji_spark.operators.dedup import (
    SEMDEDUP_TARGET_CLUSTER_SIZE,
)
from spark_ml_algo_lib_master_tongji_spark.operators.ml_exact import (
    IDF_MIN_DF,
    KMEANS_ITERS,
    KMEANS_K,
    KNN_K,
    KNN_QUERY_MOD,
    PS_MIN_SUPPORT,
)
from spark_ml_algo_lib_master_tongji_spark.operators.simrank import (
    SIMRANK_C,
    SIMRANK_ITERS,
)

# Squared L2 via the dot identity — mirrors ml_exact._dist2.
def _d2(v: str, c: str) -> str:
    return (
        f"round(list_dot_product({v}, {v}) + list_dot_product({c}, {c}) "
        f"- 2 * list_dot_product({v}, {c}), 6)"
    )


_PTS = (
    "pts AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, label "
    "FROM embeddings)"
)


def _kmeans_ctes(
    k_sql: str = str(KMEANS_K), extra_ctes: tuple[str, ...] = ()
) -> str:
    """Unrolled Lloyd CTE chain; ``k_sql`` is the init-center count — a
    literal for the pinned-k queries, a scalar subquery over ``pts`` for
    the k ∝ n semantic dedup (both filter the row_number'd smallest
    vec_ids, identical to the former ORDER BY/LIMIT form at literal k)."""
    ctes = [
        _PTS,
        *extra_ctes,
        "c0 AS (SELECT vec_id AS cid, v AS c FROM ("
        "SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn FROM pts"
        f") WHERE rn <= ({k_sql}))",
    ]
    for i in range(KMEANS_ITERS):
        ctes.append(
            f"""a{i} AS (
    SELECT vec_id, v, cid FROM (
        SELECT p.vec_id, p.v, c.cid,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY {_d2('p.v', 'c.c')} ASC, c.cid ASC) AS rn
        FROM pts p CROSS JOIN c{i} c
    ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""c{i + 1} AS (
    SELECT cid, list(m ORDER BY pos) AS c FROM (
        SELECT cid, pos, round(avg(x), 9) AS m FROM (
            SELECT cid,
                   UNNEST(generate_series(1, len(v))) AS pos,
                   UNNEST(v) AS x
            FROM a{i}
        ) GROUP BY cid, pos
    ) GROUP BY cid
)"""
        )
    ctes.append(
        f"""afinal AS (
    SELECT vec_id, cid FROM (
        SELECT p.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY {_d2('p.v', 'c.c')} ASC, c.cid ASC) AS rn
        FROM pts p CROSS JOIN c{KMEANS_ITERS} c
    ) WHERE rn = 1
)"""
    )
    return "WITH " + ",\n".join(ctes)


_KNN_CTES = f"""{_PTS},
q AS (SELECT vec_id AS qid, v AS qv FROM pts WHERE vec_id % {KNN_QUERY_MOD} = 0),
corp AS (SELECT vec_id AS nid, v AS nv, label AS nlabel
         FROM pts WHERE vec_id % {KNN_QUERY_MOD} <> 0),
nb AS (
    SELECT qid, nid, nlabel FROM (
        SELECT q.qid, corp.nid, corp.nlabel,
               row_number() OVER (
                   PARTITION BY q.qid
                   ORDER BY {_d2('q.qv', 'corp.nv')} ASC, corp.nid ASC) AS rn
        FROM corp CROSS JOIN q
    ) WHERE rn <= {KNN_K}
)"""


def build_ml_oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    o["ml_linreg_ols"] = """
WITH li AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
p0 AS (SELECT round(covar_pop(y, x) / var_pop(x), 6) AS slope,
              avg(x) AS ax, avg(y) AS ay
       FROM li),
p AS (SELECT slope, round(ay - slope * ax, 6) AS intercept FROM p0)
SELECT p.slope AS slope, p.intercept AS intercept,
       round(sqrt(avg((y - (intercept + slope * x))
                      * (y - (intercept + slope * x)))), 4) AS rmse
FROM li, p
GROUP BY p.slope, p.intercept
"""

    # Estimator cross-anchor (ml_estimators.ml_est_linreg_rmse): numerics
    # are the closed form's; the estimator's agreement rides in the
    # boolean — the twin asserts it TRUE.
    o["ml_est_linreg_rmse"] = (
        "SELECT slope, intercept, rmse, TRUE AS est_within_tol FROM ("
        + o["ml_linreg_ols"]
        + ")"
    )

    o["ml_kmeans_lloyd_assign"] = (
        _kmeans_ctes() + "\nSELECT vec_id, cid FROM afinal"
    )
    o["ml_kmeans_lloyd_sizes"] = (
        _kmeans_ctes() + "\nSELECT cid, count(*) AS n FROM afinal GROUP BY cid"
    )
    # WSSSE of the final assignment against the final centers — per-point
    # d² through the same 6-decimal rounded dot identity, summed, rounded
    # at 2 (summation-order noise ~1e-12 ≪ the rounding grain). The
    # estimator anchor boolean is asserted TRUE (ml_est_kmeans_wssse).
    o["ml_est_kmeans_wssse"] = (
        _kmeans_ctes()
        + f"""
SELECT {KMEANS_K} AS k,
       round(sum({_d2('p.v', 'c.c')}), 2) AS wssse,
       TRUE AS est_in_band
FROM afinal a
JOIN pts p USING (vec_id)
JOIN c{KMEANS_ITERS} c ON a.cid = c.cid
"""
    )

    # Classifier-family accuracy anchor (ml_estimators.ml_est_logreg_acc):
    # the numerics are the nearest-class-centroid classifier's train
    # accuracy (per-label coordinate means rounded at 9, argmin of the
    # 6-decimal d², ties to the smaller label — the Lloyd-assign
    # arithmetic) and the majority baseline; the LR estimator's agreement
    # rides in the boolean — the twin asserts it TRUE.
    o["ml_est_logreg_acc"] = f"""
WITH {_PTS},
cent AS (
    SELECT label AS clabel, list(m ORDER BY pos) AS c FROM (
        SELECT label, pos, round(avg(x), 9) AS m FROM (
            SELECT label,
                   UNNEST(generate_series(1, len(v))) AS pos,
                   UNNEST(v) AS x
            FROM pts
        ) GROUP BY label, pos
    ) GROUP BY label
),
assign AS (
    SELECT vec_id, label, clabel FROM (
        SELECT p.vec_id, p.label, c.clabel,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY {_d2('p.v', 'c.c')} ASC, c.clabel ASC) AS rn
        FROM pts p CROSS JOIN cent c
    ) WHERE rn = 1
),
maj AS (
    SELECT max(cnt) AS mx, CAST(sum(cnt) AS BIGINT) AS n
    FROM (SELECT count(*) AS cnt FROM pts GROUP BY label)
)
SELECT (SELECT n FROM maj) AS n,
       (SELECT round(avg(CASE WHEN label = clabel THEN 1.0 ELSE 0.0 END), 4)
        FROM assign) AS centroid_acc,
       (SELECT round(mx * 1.0 / n, 4) FROM maj) AS majority_acc,
       TRUE AS est_in_band
"""

    # Sparse-PCA trace anchor (ml_extra.ml_est_spca_energy): total sample
    # variance of the deterministic SPCA_VOCAB-column tf matrix from the
    # COO aggregates alone (zeros contribute nothing to Σv²); n = docs
    # with ≥1 vocab token. The fit's top-k mass rides in the boolean.
    from spark_ml_algo_lib_master_tongji_spark.operators.ml_extra import (
        SPCA_VOCAB,
    )

    o["ml_est_spca_energy"] = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
head AS (
    SELECT token FROM (
        SELECT token, count(*) AS n FROM toks GROUP BY token
        ORDER BY n DESC, token ASC LIMIT {SPCA_VOCAB}
    )
),
coo AS (
    SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS v
    FROM toks JOIN head USING (token) GROUP BY doc_id, token
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM coo)
SELECT {SPCA_VOCAB} AS vocab,
       round(sum((sv2 - sv * sv / (SELECT n FROM nd))
                 / ((SELECT n FROM nd) - 1)), 4) AS total_variance,
       TRUE AS est_in_band
FROM (SELECT token, sum(v * v) AS sv2, sum(v) AS sv FROM coo GROUP BY token)
"""

    # Six-classifier anchor row (ml_estimators.ml_est_clf_acc_anchors):
    # numerics are the exact 10-class / binary centroid accuracies and the
    # binary majority baseline (same centroid CTE arithmetic, label vs
    # label % 2); the six estimator agreements ride in the booleans.
    def _centroid_sql(lab_expr: str) -> str:
        return f"""(
    WITH cpts AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                         {lab_expr} AS lab
                  FROM embeddings),
    cent AS (
        SELECT lab AS clab, list(m ORDER BY pos) AS c FROM (
            SELECT lab, pos, round(avg(x), 9) AS m FROM (
                SELECT lab,
                       UNNEST(generate_series(1, len(v))) AS pos,
                       UNNEST(v) AS x
                FROM cpts
            ) GROUP BY lab, pos
        ) GROUP BY lab
    ),
    assign AS (
        SELECT vec_id, lab, clab FROM (
            SELECT p.vec_id, p.lab, c.clab,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY {_d2('p.v', 'c.c')} ASC, c.clab ASC) AS rn
            FROM cpts p CROSS JOIN cent c
        ) WHERE rn = 1
    )
    SELECT round(avg(CASE WHEN lab = clab THEN 1.0 ELSE 0.0 END), 4)
    FROM assign
)"""

    _bin_majority_sql = """(
    SELECT round(max(cnt) * 1.0 / sum(cnt), 4)
    FROM (SELECT count(*) AS cnt FROM embeddings GROUP BY label % 2)
)"""
    o["ml_est_clf_acc_anchors"] = f"""
SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n,
       {_centroid_sql("label")} AS centroid_acc,
       {_centroid_sql("label % 2")} AS bin_centroid_acc,
       {_bin_majority_sql} AS bin_majority_acc,
       TRUE AS dt_ok, TRUE AS rf_ok, TRUE AS gbt_ok, TRUE AS pipe_ok,
       TRUE AS svc_ok, TRUE AS lrb_ok
"""

    # Three-regressor anchor row (ml_estimators.ml_est_reg_rmse_anchors):
    # the numeric is the label's population σ — the constant-predictor
    # baseline RMSE; the three estimator agreements ride in the booleans.
    o["ml_est_reg_rmse_anchors"] = """
SELECT CAST(count(*) AS BIGINT) AS n,
       round(sqrt(var_pop(CAST(label AS DOUBLE))), 4) AS baseline_rmse,
       TRUE AS dt_ok, TRUE AS rf_ok, TRUE AS gbt_ok
FROM embeddings
"""

    # LDA anchor row (ml_estimators.ml_est_lda_ppx): vocab is the
    # CountVectorizer size — #tokens appearing in ≥ LDA_MIN_DF docs
    # (distinct per doc), capped at LDA_VOCAB_SIZE (a boundary tie
    # changes the set, never the count); uniform_logppx = ln(V); the fit
    # agreement rides in the boolean. Constants are the Spark side's own
    # (interpolated, never re-typed).
    from spark_ml_algo_lib_master_tongji_spark.operators.ml_estimators import (
        LDA_K,
        LDA_MIN_DF,
        LDA_VOCAB_SIZE,
    )

    o["ml_est_lda_ppx"] = f"""
WITH dtok AS (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents
),
v AS (
    SELECT least(CAST(count(*) AS INT), {LDA_VOCAB_SIZE}) AS vocab
    FROM (SELECT tok FROM dtok GROUP BY tok
          HAVING count(*) >= {int(LDA_MIN_DF)})
)
SELECT {LDA_K} AS k, vocab,
       round(ln(vocab), 4) AS uniform_logppx,
       TRUE AS est_in_band
FROM v
"""

    # ALS-family MSE anchor (ml_estimators.ml_est_als_mse): the numeric is
    # the ratings population variance (global-mean-baseline train MSE),
    # recomputed from lineitem ⋈ orders with the ratings_table shape; the
    # ALS estimator's agreement rides in the boolean.
    o["ml_est_als_mse"] = """
WITH r AS (
    SELECT o_custkey AS u, l_partkey AS i, avg(l_quantity) AS rating
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_ratings,
       round(avg(rating * rating) - avg(rating) * avg(rating), 4)
           AS baseline_mse,
       TRUE AS est_in_band
FROM r
"""

    # Recommendation-serving anchor (ml_estimators.ml_est_als_rec_topk):
    # user count / rec row count / mean rating recomputed from the
    # ratings-table shape; the per-user score ordering and the top-1
    # score band ride in the booleans.
    o["ml_est_als_rec_topk"] = """
WITH r AS (
    SELECT o_custkey AS u, l_partkey AS i, avg(l_quantity) AS rating
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
)
SELECT CAST(least(50, count(DISTINCT u)) AS BIGINT)     AS n_users,
       CAST(3 * least(50, count(DISTINCT u)) AS BIGINT) AS n_recs,
       round(avg(rating), 4)                            AS avg_rating,
       TRUE AS sorted_ok, TRUE AS est_in_band
FROM r
"""

    # SemDeDup composition: the Lloyd assignment scopes the cosine keeper
    # election to same-cluster pairs (threshold literal matches
    # dedup.COSINE_DEDUP_THRESHOLD and the dedup_embedding_cosine oracle).
    # k ∝ n: both engines derive k = max(1, floor(n/TARGET + 0.5)) from the
    # corpus count (dedup.semdedup_k), so the oracle tracks the policy at
    # any scale factor, not just the fixture where it equals KMEANS_K.
    o["pipeline_semantic_dedup"] = (
        _kmeans_ctes(
            k_sql="SELECT k FROM kparam",
            extra_ctes=(
                "kparam AS (SELECT greatest(1, CAST(floor(count(*) / "
                f"{float(SEMDEDUP_TARGET_CLUSTER_SIZE)!r} + 0.5) AS BIGINT)) "
                "AS k FROM pts)",
            ),
        )
        + """,
p AS (SELECT pts.vec_id, pts.v, a.cid FROM pts JOIN afinal a USING (vec_id)),
nbr AS (
    SELECT a.vec_id AS vec_id, min(b.vec_id) AS mn
    FROM p a JOIN p b ON a.cid = b.cid AND a.vec_id <> b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 4)
          >= CAST(0.35 AS DOUBLE)
    GROUP BY a.vec_id
)
SELECT pts.vec_id, least(pts.vec_id, coalesce(n.mn, pts.vec_id)) AS keeper
FROM pts LEFT JOIN nbr n ON pts.vec_id = n.vec_id
"""
    )

    o["ml_knn_classifier"] = (
        "WITH "
        + _KNN_CTES
        + """
SELECT qid, nlabel AS predicted FROM (
    SELECT qid, nlabel,
           row_number() OVER (PARTITION BY qid
                              ORDER BY count(*) DESC, nlabel ASC) AS rn
    FROM nb GROUP BY qid, nlabel
) WHERE rn = 1
"""
    )
    o["ml_knn_regressor"] = (
        "WITH "
        + _KNN_CTES
        + """
SELECT qid, round(avg(CAST(nlabel AS DOUBLE)), 6) AS predicted
FROM nb GROUP BY qid
"""
    )

    # The two-phase spill-tree search (operators/knn.py) is EXACT, so the
    # brute-force scan is its ground truth — full (qid, nid, rank, d2)
    # value-hash, not just containment (strengthens the reference's own
    # check, KNNRunner.scala:181-218). Ties rank on round(d2, 6) + nid on
    # both sides, like _KNN_CTES.
    o["ml_knn_spilltree"] = f"""
WITH {_PTS},
q AS (SELECT vec_id AS qid, v AS qv FROM pts WHERE vec_id % {KNN_QUERY_MOD} = 0),
corp AS (SELECT vec_id AS nid, v AS nv
         FROM pts WHERE vec_id % {KNN_QUERY_MOD} <> 0),
nbd AS (
    SELECT qid, nid, d2,
           row_number() OVER (PARTITION BY qid
                              ORDER BY d2 ASC, nid ASC) AS rn
    FROM (SELECT q.qid, corp.nid, {_d2('q.qv', 'corp.nv')} AS d2
          FROM corp CROSS JOIN q)
)
SELECT qid, nid, CAST(rn AS INT) AS rank, d2 FROM nbd WHERE rn <= {KNN_K}
"""

    # Same ground truth as ml_knn_classifier: the spill-tree search is
    # exact, so the vote over its hits equals the vote over the
    # brute-force hits — one oracle, two engine arms under test.
    o["ml_knn_spilltree_classifier"] = o["ml_knn_classifier"]

    # IVF recall anchor (operators/knn.py sim_ivf_recall): the numeric is
    # the exact arm's query count (every query has ≥ k corpus neighbors);
    # the measured recall@k vs the exact search rides in the boolean.
    o["sim_ivf_recall"] = f"""
SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
FROM embeddings WHERE vec_id % {KNN_QUERY_MOD} = 0
"""

    # Persisted-IVF-store roundtrip anchor (operators/knn.py
    # sim_ivf_delta_search): same query-count numeric; the exact
    # store-search ≡ fresh-search equality rides in the boolean.
    o["sim_ivf_delta_search"] = f"""
SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS store_ok
FROM embeddings WHERE vec_id % {KNN_QUERY_MOD} = 0
"""

    o["ml_idf"] = f"""
WITH tok AS (
    SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS token
    FROM documents
),
dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY token)
SELECT token, df,
       round(ln((SELECT (count(*) + 1)::DOUBLE FROM documents) / (df + 1)), 6)
           AS idf
FROM dfreq WHERE df >= {IDF_MIN_DF}
"""

    # ts ordering: Spark sees µs-truncated timestamps (readers.py), DuckDB
    # native ns — order by the truncated integer on both sides.
    o["ml_prefixspan"] = f"""
WITH pos AS (
    SELECT user_id, event_type AS t,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_ns(ts) // 1000, event_id) AS p
    FROM events
),
ms AS (SELECT CAST({PS_MIN_SUPPORT!r} AS DOUBLE) * count(DISTINCT user_id)
           AS ms FROM events),
l1 AS (
    SELECT t AS pattern, count(*) AS support
    FROM (SELECT DISTINCT user_id, t FROM pos)
    GROUP BY t HAVING count(*) >= (SELECT ms FROM ms)
),
l2 AS (
    SELECT ta || '->' || tb AS pattern, count(*) AS support
    FROM (
        SELECT DISTINCT a.user_id, a.t AS ta, b.t AS tb
        FROM pos a JOIN pos b ON a.user_id = b.user_id AND a.p < b.p
    ) GROUP BY ta, tb HAVING count(*) >= (SELECT ms FROM ms)
)
SELECT pattern, support FROM l1
UNION ALL
SELECT pattern, support FROM l2
"""

    # pyspark.ml.fpm.PrefixSpan has exact set semantics → the estimator
    # shares the deterministic oracle (patterns canonicalized identically).
    o["ml_est_prefixspan"] = o["ml_prefixspan"]

    o["ml_dbscan"] = _dbscan_sql() + """
SELECT p.vec_id,
       CASE WHEN cl.label IS NOT NULL THEN 0
            WHEN b.bcluster IS NOT NULL THEN 1
            ELSE -1 END AS role,
       coalesce(cl.label, b.bcluster, -1) AS cluster
FROM pts p
LEFT JOIN lastlab cl ON p.vec_id = cl.v
LEFT JOIN border b ON p.vec_id = b.bv"""

    o["ml_dbscan_summary"] = _dbscan_sql() + """
, final AS (
    SELECT p.vec_id,
           CASE WHEN cl.label IS NOT NULL THEN 0
                WHEN b.bcluster IS NOT NULL THEN 1
                ELSE -1 END AS role,
           coalesce(cl.label, b.bcluster, -1) AS cluster
    FROM pts p
    LEFT JOIN lastlab cl ON p.vec_id = cl.v
    LEFT JOIN border b ON p.vec_id = b.bv
)
SELECT sum(CASE WHEN role = 0 THEN 1 ELSE 0 END)::BIGINT AS n_core,
       sum(CASE WHEN role = 1 THEN 1 ELSE 0 END)::BIGINT AS n_border,
       sum(CASE WHEN role = -1 THEN 1 ELSE 0 END)::BIGINT AS n_noise,
       count(DISTINCT CASE WHEN cluster >= 0 THEN cluster END) AS n_clusters
FROM final"""

    # Grid candidate arm (operators/pairs.grid_apply): the spread 2-d
    # projection routes to the ε-grid; the oracle is the plain cross-join
    # ε-predicate — candidate generation must never change the pair set.
    # DuckDB lists are 1-indexed (embedding[1] = Spark v[0]).
    o["ml_dbscan_grid_neighbors"] = f"""
WITH gpts AS (
    SELECT vec_id,
           [CAST(embedding[1] AS DOUBLE) * {GRID_DEMO_SCALE!r},
            CAST(embedding[2] AS DOUBLE) * {GRID_DEMO_SCALE!r}] AS v
    FROM embeddings
),
pr AS (
    SELECT a.vec_id AS i, b.vec_id AS j
    FROM gpts a CROSS JOIN gpts b
    WHERE a.vec_id < b.vec_id
      AND {_d2('a.v', 'b.v')} <= CAST({EPS2!r} AS DOUBLE)
),
nbr AS (SELECT i AS p, j AS q FROM pr UNION ALL SELECT j AS p, i AS q FROM pr)
SELECT p, count(*) AS c FROM nbr GROUP BY p
"""

    o["ml_simrank"] = _simrank_sql()

    # ---- estimator-family value-hash promotions (round 7) ------------------
    # Deterministic estimator outputs whose SQL twins are exact: the mllib
    # covariance / pearson matrices are plain covar_samp / corr aggregates
    # (CovRunner.scala:93-116, PearsonRunner.scala:108-113), the IDF-model
    # aggregate is the ln((m+1)/(df+1)) sum over the top-vocabSize tokens
    # (cut-boundary ties share a df, hence an idf — sum is order
    # invariant), and the full-spectrum SVD energy is Parseval's identity
    # (Σσ² = Σ cells x²). Rounding goes through fix_rounds' floor formula
    # on both sides.
    _LI_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

    def _matrix_sql(fn: str, out_col: str, digits: int) -> str:
        n = len(_LI_COLS)
        aggs = ", ".join(
            f"{fn}({a}, {b}) AS c{i}_{j}"
            for i, a in enumerate(_LI_COLS)
            for j, b in enumerate(_LI_COLS)
        )
        idx = ", ".join(f"({i}, {j})" for i in range(n) for j in range(n))
        cases = " ".join(
            f"WHEN idx.i = {i} AND idx.j = {j} THEN c{i}_{j}"
            for i in range(n)
            for j in range(n)
        )
        return f"""
WITH m AS (SELECT {aggs} FROM lineitem),
idx AS (SELECT * FROM (VALUES {idx}) AS t(i, j))
SELECT idx.i AS i, idx.j AS j,
       round(CASE {cases} END, {digits}) AS {out_col}
FROM idx, m
"""

    o["ml_est_covariance"] = _matrix_sql("covar_samp", "cov", 4)
    o["ml_est_pearson_rdd"] = _matrix_sql("corr", "corr", 6)

    o["ml_est_idf"] = """
WITH tok AS (
    SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS token
    FROM documents
),
dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
vocab AS (SELECT df FROM dfreq ORDER BY df DESC, token LIMIT 1000),
idf AS (
    SELECT round(ln((SELECT (count(*) + 1)::DOUBLE FROM documents)
                    / (df + 1)), 6) AS v
    FROM vocab
)
SELECT count(*)::BIGINT AS n_terms, round(sum(v), 4) AS idf_sum FROM idf
"""

    o["ml_est_svd_energy"] = """
WITH cells AS (
    SELECT UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
    FROM embeddings
)
SELECT (SELECT len(embedding) FROM embeddings LIMIT 1)::INTEGER
           AS n_components,
       round(sum(x * x), 2) AS energy
FROM cells
"""

    o["ml_est_pca_energy"] = """
WITH d AS (SELECT len(embedding) AS n FROM embeddings LIMIT 1),
dims AS (SELECT UNNEST(range(1, (SELECT n FROM d) + 1)) AS i),
vals AS (
    SELECT i, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, dims
),
pervar AS (SELECT var_samp(x) AS v FROM vals GROUP BY i)
SELECT (SELECT n FROM d)::INTEGER AS n_components,
       round(sum(v), 4) AS energy
FROM pervar
"""

    return {k: _materialize(v) for k, v in o.items()}


def _dbscan_sql() -> str:
    """Unrolled DBSCAN: ε-pairs → core → fixed-round min-label components
    → border/noise. Mirror of operators/density.py."""
    ctes = [
        _PTS,
        f"""pr AS (
    SELECT a.vec_id AS i, b.vec_id AS j
    FROM pts a CROSS JOIN pts b
    WHERE a.vec_id < b.vec_id
      AND {_d2('a.v', 'b.v')} <= CAST({EPS2!r} AS DOUBLE)
)""",
        "nbr AS (SELECT i AS p, j AS q FROM pr UNION ALL SELECT j AS p, i AS q FROM pr)",
        "ncnt AS (SELECT p, count(*) AS c FROM nbr GROUP BY p)",
        f"core AS (SELECT p FROM ncnt WHERE c + 1 >= {MIN_PTS})",
        "ce AS (SELECT n.p, n.q FROM nbr n JOIN core c1 ON n.p = c1.p "
        "JOIN core c2 ON n.q = c2.p)",
        "s0 AS (SELECT p AS v, p AS label FROM core)",
    ]
    for i in range(DBSCAN_CC_ROUNDS):
        ctes.append(
            f"""s{i + 1} AS (
    SELECT t.v, least(t.label, coalesce(m.m, t.label)) AS label
    FROM s{i} t LEFT JOIN (
        SELECT ce.q AS v, min(p2.label) AS m
        FROM ce JOIN s{i} p2 ON ce.p = p2.v
        GROUP BY ce.q
    ) m ON t.v = m.v
)"""
        )
    ctes.append(f"lastlab AS (SELECT v, label FROM s{DBSCAN_CC_ROUNDS})")
    ctes.append(
        """border AS (
    SELECT n.p AS bv, min(lab.label) AS bcluster
    FROM nbr n
    JOIN core c ON n.q = c.p
    JOIN lastlab lab ON lab.v = n.q
    WHERE n.p NOT IN (SELECT p FROM core)
    GROUP BY n.p
)"""
    )
    return "WITH " + ",\n".join(ctes) + "\n"


def _simrank_sql() -> str:
    """Unrolled bipartite SimRank Jacobi iteration. Mirror of
    operators/simrank.py (same literals, same operand order)."""
    c = f"CAST({SIMRANK_C!r} AS DOUBLE)"
    ctes = [
        NATION_CTES.strip(),
        "du AS (SELECT src AS a, count(*) AS d FROM tn GROUP BY src)",
        "di AS (SELECT dst AS a, count(*) AS d FROM tn GROUP BY dst)",
        "su0 AS (SELECT a, a AS b, CAST(1.0 AS DOUBLE) AS s FROM du)",
        "si0 AS (SELECT a, a AS b, CAST(1.0 AS DOUBLE) AS s FROM di)",
    ]
    for k in range(SIMRANK_ITERS):
        ctes.append(
            f"""su{k + 1} AS (
    SELECT q.a, q.b, {c} / (da.d * db.d) * q.s AS s
    FROM (
        SELECT ta.src AS a, tb.src AS b, sum(sp.s) AS s
        FROM tn ta
        JOIN si{k} sp ON ta.dst = sp.a
        JOIN tn tb ON sp.b = tb.dst
        WHERE ta.src <> tb.src
        GROUP BY ta.src, tb.src
    ) q JOIN du da ON q.a = da.a JOIN du db ON q.b = db.a
    UNION ALL
    SELECT a, a AS b, CAST(1.0 AS DOUBLE) AS s FROM du
)"""
        )
        ctes.append(
            f"""si{k + 1} AS (
    SELECT q.a, q.b, {c} / (da.d * db.d) * q.s AS s
    FROM (
        SELECT ta.dst AS a, tb.dst AS b, sum(sp.s) AS s
        FROM tn ta
        JOIN su{k} sp ON ta.src = sp.a
        JOIN tn tb ON sp.b = tb.src
        WHERE ta.dst <> tb.dst
        GROUP BY ta.dst, tb.dst
    ) q JOIN di da ON q.a = da.a JOIN di db ON q.b = db.a
    UNION ALL
    SELECT a, a AS b, CAST(1.0 AS DOUBLE) AS s FROM di
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT a, b, round(s, 6) AS sim
FROM su{SIMRANK_ITERS}
WHERE a < b AND round(s, 6) > 0"""
    )

"""Query registry: name → callable(spark, sf_dir) → DataFrame.

Single source of truth for the driver contract (``__spark_entry__.queries``)
and the pytest differential suite. Every operator claimed in SURVEY.md §2
appears here; SQL-expressible ones have a matching oracle in ``oracles.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_ml_algo_lib_master_tongji_spark.operators import (
    dedup,
    density,
    graph,
    graph_extra,
    knn,
    ml_estimators,
    ml_exact,
    relational,
    similarity,
    simrank,
    stats,
    text_analysis,
)
from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

QueryFn = Callable[[SparkSession, str], DataFrame]


def _wrap(fn: Callable[[Catalog], DataFrame]) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(Catalog(spark, sf_dir))

    return run


def build_registry() -> dict[str, QueryFn]:
    reg: dict[str, QueryFn] = {}

    for name in (
        "q1_pricing_summary",
        "q6_forecast_revenue",
        "q3_top_unshipped_orders",
        "q_broadcast_dim_join",
        "q_anti_join_customers_without_orders",
        "q_semi_join_suppliers_with_big_lineitems",
        "q_union_distinct_nations",
        "q_topk_per_group",
        "q_sort_limit_top_orders",
        "q_case_conditional_agg",
        "q_grouped_having",
        "q_events_first_per_user",
        "q_events_type_rollup",
        "q_skew_salted_user_counts",
        "q_string_id_dictionary",
    ):
        reg[name] = _wrap(getattr(relational, name))

    for name in (
        "stat_pearson_lineitem",
        "stat_spearman_lineitem",
        "stat_covariance_lineitem",
        "stat_summary_lineitem",
    ):
        reg[name] = _wrap(getattr(stats, name))

    for name in (
        "text_token_stats",
        "text_quality_score",
        "text_lang_id",
        "text_fingerprint",
    ):
        reg[name] = _wrap(getattr(text_analysis, name))

    for name in (
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
    ):
        reg[name] = _wrap(getattr(dedup, name))

    for name in ("sim_brute_force_topk", "sim_lsh_bucket_pairs"):
        reg[name] = _wrap(getattr(similarity, name))

    for name in (
        "graph_edges",
        "graph_degrees",
        "graph_pagerank",
        "graph_pagerank_personalized",
        "graph_pagerank_weighted",
        "graph_trustrank",
        "graph_connected_components",
        "graph_bfs",
        "graph_sssp",
        "graph_label_propagation",
        "graph_kcore",
        "graph_triangle_count",
        "graph_clustering_coefficient",
        "graph_modularity",
        "graph_degrees_nation",
        "graph_scc_nation",
        "graph_closeness_nation",
        "graph_subgraph_matching",
    ):
        reg[name] = _wrap(getattr(graph, name))

    for name in (
        "ml_linreg_ols",
        "ml_kmeans_lloyd_assign",
        "ml_kmeans_lloyd_sizes",
        "ml_knn_classifier",
        "ml_knn_regressor",
        "ml_idf",
        "ml_prefixspan",
    ):
        reg[name] = _wrap(getattr(ml_exact, name))

    for name in (
        "ml_est_kmeans",
        "ml_est_kmeans_rdd",
        "ml_est_pearson_rdd",
        "ml_est_lda",
        "ml_est_logreg",
        "ml_est_logreg_bounded",
        "ml_est_svc",
        "ml_est_dt_classifier",
        "ml_est_rf_classifier",
        "ml_est_gbt_classifier",
        "ml_est_linreg",
        "ml_est_dt_regressor",
        "ml_est_rf_regressor",
        "ml_est_gbt_regressor",
        "ml_est_pca",
        "ml_est_svd",
        "ml_est_covariance",
        "ml_est_als",
        "ml_est_als_implicit",
        "ml_est_als_recommend",
        "ml_est_gbt_pipeline",
        "ml_est_idf",
        "ml_est_prefixspan",
    ):
        reg[name] = _wrap(getattr(ml_estimators, name))

    for name in ("ml_dbscan", "ml_dbscan_summary"):
        reg[name] = _wrap(getattr(density, name))

    reg["ml_simrank"] = _wrap(simrank.ml_simrank)

    for name in (
        "graph_incremental_pagerank",
        "graph_cycle_detection",
        "graph_maximal_cliques",
        "graph_weak_cliques",
        "graph_louvain",
        "graph_node2vec_walks",
        "graph_node2vec_embeddings",
        "graph_betweenness",
    ):
        reg[name] = _wrap(getattr(graph_extra, name))

    for name in ("ml_knn_spilltree", "ml_knn_spilltree_classifier", "sim_ivf_topk"):
        reg[name] = _wrap(getattr(knn, name))

    from spark_ml_algo_lib_master_tongji_spark.operators import ml_extra

    for name in ("ml_est_pca_sparse", "ml_est_xgboost", "q_sql_entry_top_suppliers"):
        reg[name] = _wrap(getattr(ml_extra, name))

    from spark_ml_algo_lib_master_tongji_spark.multimodal import media
    from spark_ml_algo_lib_master_tongji_spark.streaming import pipeline

    for name in (
        "stream_windowed_counts",
        "stream_distinct_pairs",
        "stream_sessionization",
        "stream_user_totals_stateful",
    ):
        reg[name] = getattr(pipeline, name)  # already (spark, sf_dir) shaped

    for name in (
        "mm_manifest",
        "mm_frame_sample",
        "mm_byte_features",
        "mm_fake_decode",
    ):
        reg[name] = _wrap(getattr(media, name))

    return reg

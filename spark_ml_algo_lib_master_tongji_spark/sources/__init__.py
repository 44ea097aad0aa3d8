from spark_ml_algo_lib_master_tongji_spark.sources.readers import (  # noqa: F401
    Catalog,
    load_table,
    read_coo_text,
    read_edge_list,
    read_features_csv,
    read_labeled_text,
    read_libsvm,
)

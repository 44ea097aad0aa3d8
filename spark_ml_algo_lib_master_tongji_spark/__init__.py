"""PySpark-native analytics engine with the capabilities of the reference
suite xYtti/Spark-ml-algo-lib-master-tongji (Huawei BoostKit KAL benchmark
harness: ~20 ML workloads + ~23 graph workloads on Spark).

Everything here is a brand-new, DataFrame-first implementation:
logical plans are declared with the PySpark DataFrame/SQL API and Catalyst
picks the physical strategy; Python touches data only through Arrow-batched
pandas UDFs where built-ins genuinely cannot express the semantics.

Layout
------
- ``session``   : SparkSession factory tuned for large-scale batch analytics.
- ``sources``   : readers/writers (parquet, csv/text, libsvm, edge lists, COO).
- ``functions`` : column-level function library (vectors, text, hashing).
- ``operators`` : relational ops, stats, dedup, similarity, ML, graph.
- ``plans``     : plan-inspection helpers (pushdown/broadcast assertions).
- ``streaming`` : Structured Streaming wrappers over the same operator set.
- ``multimodal``: binary-column (image/audio) plumbing with stubbed decoders.
"""

__version__ = "0.1.0"

from spark_ml_algo_lib_master_tongji_spark.session import get_session  # noqa: F401

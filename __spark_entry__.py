"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()``   — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()``— matching DuckDB SQL per query (correctness gate).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spark_ml_algo_lib_master_tongji_spark import oracles
from spark_ml_algo_lib_master_tongji_spark.registry import build_registry
from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spark_ml_algo_lib_master_tongji_spark.operators.relational import (
        q1_pricing_summary,
    )

    return q1_pricing_summary(Catalog(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return build_registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per queries() key (omitted ⇒ rows-only check)."""
    return oracles.all_oracles()

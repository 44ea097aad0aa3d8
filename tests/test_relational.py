"""Differential tests: every SQL-expressible query vs the DuckDB oracle at
sf0.01 — the same check the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from tests.compare import assert_match
from tests.conftest import SF_ORACLE


def _registry_pairs():
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.registry import build_registry

    reg = build_registry()
    oracles = all_oracles()
    # every oracle key must exist in the registry
    missing = set(oracles) - set(reg)
    assert not missing, f"oracles without queries: {missing}"
    return [(k, reg[k], oracles[k]) for k in sorted(oracles)]


@pytest.mark.parametrize(
    "name,fn,sql", _registry_pairs(), ids=[p[0] for p in _registry_pairs()]
)
def test_oracle_match(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_ORACLE)
    assert_match(sdf, duck, sql, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0

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


def test_asof_join_matches_bruteforce(spark):
    """The union+window as-of composition must agree with a pure-Python
    brute force on the smoke fixture: per purchase, the matched click is
    the max-timestamp click (ties: max event_id) with ts <= purchase ts,
    and unmatched purchases truly have no prior click."""
    from spark_ml_algo_lib_master_tongji_spark.operators.relational import (
        q_asof_join_click_attribution,
    )
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog
    from tests.conftest import SF_SMOKE

    cat = Catalog(spark, SF_SMOKE)
    ev = [
        (r["event_id"], r["user_id"], r["event_type"], r["us"])
        for r in cat.events.selectExpr(
            "event_id", "user_id", "event_type", "unix_micros(ts) AS us"
        ).collect()
    ]
    clicks = {}
    for eid, uid, typ, us in ev:
        if typ == "click":
            clicks.setdefault(uid, []).append((us, eid))
    got = {
        r["purchase_id"]: (r["click_id"], r["click_us"], r["gap_us"])
        for r in q_asof_join_click_attribution(cat).collect()
    }
    assert len(got) == sum(1 for e in ev if e[2] == "purchase")
    for eid, uid, typ, us in ev:
        if typ != "purchase":
            continue
        prior = [(cus, cid) for cus, cid in clicks.get(uid, []) if cus <= us]
        want = max(prior) if prior else None
        if want is None:
            assert got[eid] == (None, None, None), (eid, got[eid])
        else:
            assert got[eid] == (want[1], want[0], us - want[0]), (eid,)


def test_range_join_tiers_partition_the_domain(spark, duck):
    """The value tiers must cover every event exactly once (tier rollup
    counts sum to the event count) — a gap or overlap in the interval
    dimension would silently drop or double rows."""
    from spark_ml_algo_lib_master_tongji_spark.operators.relational import (
        VALUE_TIERS,
        q_range_join_value_tiers,
    )
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog
    from tests.conftest import SF_SMOKE

    bounds = sorted(VALUE_TIERS, key=lambda t: t[1])
    for (_, _, hi_prev), (_, lo, _) in zip(bounds, bounds[1:]):
        assert hi_prev == lo, "tiers must tile without gap/overlap"
    cat = Catalog(spark, SF_SMOKE)
    rolled = q_range_join_value_tiers(cat).collect()
    assert sum(r["n_events"] for r in rolled) == cat.events.count()

"""Registry contract tests — no SparkSession needed, so these run in <1s.

Round-2 lesson: five queries added to a module's QUERIES but not to
``registry._ORDER`` made ``build_registry()`` raise, which zeroed the entire
round's driver artifacts. These tests make that class of drift fail in CI
immediately, and pin the tolerant-extras behavior.
"""

from __future__ import annotations

import warnings

import pytest

from spark_ml_algo_lib_master_tongji_spark import registry
from spark_ml_algo_lib_master_tongji_spark.registry import (
    DRIVER_WINDOW,
    _ORDER,
    build_registry,
)


def test_build_registry_succeeds_and_is_ordered():
    reg = build_registry()
    assert list(reg)[: len(_ORDER)] == list(_ORDER)
    assert len(reg) == len(set(reg)) >= DRIVER_WINDOW


def test_no_unordered_extras_at_head():
    """Extras are tolerated at runtime but should never ship: fail CI."""
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        build_registry()  # would raise UserWarning if any extras exist


def test_missing_ordered_name_raises(monkeypatch):
    monkeypatch.setattr(registry, "_ORDER", (*_ORDER, "no_such_query"))
    with pytest.raises(RuntimeError, match="missing=\\['no_such_query'\\]"):
        build_registry()


def test_extra_query_appends_with_warning(monkeypatch):
    """An implemented-but-unordered query degrades priority, not availability."""
    monkeypatch.setattr(registry, "_ORDER", _ORDER[:-1])
    with pytest.warns(UserWarning, match="unordered queries appended"):
        reg = build_registry()
    assert list(reg)[-1] == _ORDER[-1]  # still present, at the back


def test_every_oracle_has_a_query():
    import __spark_entry__ as entry

    queries = set(build_registry())
    oracle_names = set(entry.oracle_sql())
    assert oracle_names <= queries, sorted(oracle_names - queries)


def test_every_oracle_output_is_driver_sortable(spark):
    """The round-8 lesson generalized: the driver canonicalizes result
    frames with pandas ``sort_values``, which raises on list/map/struct
    cells — every oracle-bearing query must emit only scalar columns
    (rows-only queries may keep arrays; they are never value-hashed)."""
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.registry import build_registry

    from tests.conftest import SF_SMOKE

    reg = build_registry()
    oracle_names = set(all_oracles())
    offenders = []
    for name in reg:
        if name not in oracle_names:
            continue
        df = reg[name](spark, SF_SMOKE)
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if any(k in t for k in ("array", "map", "struct")):
                offenders.append((name, f.name, t))
    assert not offenders, offenders


def test_plan_census_name_lists_track_registry():
    """tools/plan_census.py's hand-maintained EAGER and KNOWN_CARTESIAN
    name lists must reference real registry queries — a renamed or
    removed query would otherwise silently un-skip (census hangs on an
    eager query) or un-allowlist (false cartesian failure)."""
    from tools.plan_census import EAGER, KNOWN_CARTESIAN

    names = set(build_registry())
    assert EAGER <= names, sorted(EAGER - names)
    assert KNOWN_CARTESIAN <= names, sorted(KNOWN_CARTESIAN - names)


def test_window_covers_every_staleness_obligation():
    """Mechanized rotation contract (the check round judges recompute by
    hand from the CORRECTNESS artifacts): the driver window must contain
    every oracle that has NEVER been driver-green and every oracle whose
    freshest green sits exactly at the 3-round staleness bound, and no
    oracle may already be stale. Runs off committed CORRECTNESS_r*.json
    — no Spark session."""
    from tools.rotation_audit import audit

    a = audit()
    assert not a["already_stale"], (
        f"oracles missed their staleness bound: {a['already_stale']}"
    )
    # NOTE: this assertion fails BY DESIGN at the start of each round,
    # the moment the driver lands the new CORRECTNESS_r{N}.json — the
    # bound cohort advances and the not-yet-rotated window omits it.
    # That is the trip-wire: rotate registry._ORDER (tier-1 new/changed,
    # then the cohort `python tools/rotation_audit.py` prints) as the
    # round's first commit and it goes green again.
    assert not a["missing_from_window"], (
        f"window omits obligated oracles (rotate registry._ORDER first — "
        f"see tools/rotation_audit.py): {a['missing_from_window']}"
    )
    # the NEXT round must also be satisfiable: its inherited bound cohort
    # has to fit the window with the obligated new/changed rows on top
    assert a["next_round_cohort_size"] <= a["window_size"], a


def test_rotation_audit_detects_staleness(tmp_path):
    """The audit must actually FIRE: synthesize CORRECTNESS artifacts
    where one real oracle was last green 4 rounds before the upcoming
    round (stale) and another exactly 3 back but outside the window
    (missed obligation) — both must be flagged."""
    import json

    from spark_ml_algo_lib_master_tongji_spark.registry import (
        DRIVER_WINDOW,
        _ORDER,
    )
    from tools.rotation_audit import audit

    in_window = _ORDER[0]
    outside = next(
        n for n in _ORDER[DRIVER_WINDOW:] if not n.startswith("ml_est_")
    )
    green = {"hash_match": True}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({in_window: green, outside: green})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({outside: green})
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({}))
    a = audit(tmp_path)
    # upcoming round = 6: r01 green is stale (1 < 6-3); r03 green sits
    # exactly AT the bound (3 == 6-3) but `outside` is not in the window
    assert a["upcoming_round"] == 6
    assert in_window in a["already_stale"]
    assert outside in a["at_bound"]
    assert outside in a["missing_from_window"]

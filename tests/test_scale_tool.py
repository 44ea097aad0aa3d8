"""Invariants of tools/scale_testdata.py — the synthesized sfN fixture
must preserve every foreign key the queries join on, or the scaling
evidence in PLANS.md measures corrupted joins (round-5 review: events'
user_id initially shifted with its own family and attached replica
events to replica-0 customers)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
#: same default as the tool/bench — override with SPARK_GRAFT_SF_DIR.
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: child-table column → parent table.column, as the queries join them.
FOREIGN_KEYS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("events", "user_id", "customer", "c_custkey"),  # nation_event_revenue join
]


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_scaled")
    subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "scale_testdata.py"),
            "--src",
            SRC,
            "--out",
            str(out),
            "--factor",
            "2",
        ],
        check=True,
        capture_output=True,
    )
    return out


def test_scaled_fixture_preserves_foreign_keys(scaled_dir):
    con = duckdb.connect()
    for child, ck, parent, pk in FOREIGN_KEYS:
        orphans = con.execute(
            f"SELECT count(*) FROM read_parquet('{scaled_dir}/{child}.parquet') c "
            f"WHERE NOT EXISTS (SELECT 1 FROM "
            f"read_parquet('{scaled_dir}/{parent}.parquet') p "
            f"WHERE p.{pk} = c.{ck})"
        ).fetchone()[0]
        assert orphans == 0, f"{child}.{ck} → {parent}.{pk}: {orphans} orphans"


def test_scaled_fixture_scales_rows_linearly(scaled_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_out = con.execute(
            f"SELECT count(*) FROM read_parquet('{scaled_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert n_out == 2 * n_src, t
    # dimensions stay fixed like real TPC-H
    for t in ("region", "nation"):
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_out = con.execute(
            f"SELECT count(*) FROM read_parquet('{scaled_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert n_out == n_src, t

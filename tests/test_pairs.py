"""Blocked all-pairs kernel (operators/pairs.py): block-grid sizing and
pair totality under sparse/structured id spaces (round-2 ADVICE: pmod of
raw ids crashed on empty blocks; a fixed 64-block cap let task memory grow
linearly past ~32k points)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_block_count_derives_from_n():
    """⌈n/block_rows⌉ with no implicit ceiling — per-task memory stays
    bounded by block_rows at any corpus size; an explicit max_blocks caps
    replication when the caller opts in."""
    from spark_ml_algo_lib_master_tongji_spark.operators.pairs import (
        BLOCK_ROWS,
        _n_blocks,
    )

    assert _n_blocks(10, 512) == 1
    assert _n_blocks(512, 512) == 1
    assert _n_blocks(513, 512) == 2
    # far past the old 64-block cap: blocks keep scaling with n
    assert _n_blocks(1_000_000, BLOCK_ROWS) == -(-1_000_000 // BLOCK_ROWS)
    assert _n_blocks(1_000_000, BLOCK_ROWS) > 64
    assert _n_blocks(1_000_000, BLOCK_ROWS, max_blocks=64) == 64


def test_blocked_apply_total_pairs_on_sparse_ids(spark):
    """Every unordered pair must be emitted exactly once even when ids are
    sparse/structured (multiples of a constant — the shape that broke the
    raw-id pmod blocking) and the block grid is much finer than the point
    count, so some hash blocks are empty and the kernel runner must yield
    empty frames for their groups instead of crashing np.stack."""
    from spark_ml_algo_lib_master_tongji_spark.operators.pairs import blocked_apply

    ids = [97 * i + 5 for i in range(10)]
    pts = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3)]) for i in ids],
        "vec_id long, v array<double>",
    ).cache()

    def kernel(ids_a, mat_a, ids_b, mat_b, same):
        if same:
            ia, ib = np.triu_indices(len(ids_a), k=1)
            a, b = ids_a[ia], ids_a[ib]
        else:
            a = np.repeat(ids_a, len(ids_b))
            b = np.tile(ids_b, len(ids_a))
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi})

    # block_rows=1 → one hash block target per point: with 10 ids hashed
    # into 10 blocks, collisions leave some blocks empty (deterministic
    # for fixed ids — xxhash64 is seeded), exercising the empty guard.
    got = sorted(
        (r["a"], r["b"])
        for r in blocked_apply(pts, kernel, "a long, b long", block_rows=1).collect()
    )
    want = sorted(
        (min(x, y), max(x, y)) for i, x in enumerate(ids) for y in ids[i + 1 :]
    )
    assert got == want

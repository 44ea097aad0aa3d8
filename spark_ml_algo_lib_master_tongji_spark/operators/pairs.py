"""Blocked all-pairs joins over vector tables — the engine's exact
pairwise-compute primitive (DBSCAN ε-pairs, embedding-cosine dedup).

Shape: points are hashed into B blocks, each point is replicated to its B
block-pair groups, and one Arrow-batched numpy kernel per (block_a,
block_b) group emits qualifying pairs. Properties that matter at scale:

- the plan is an equi-join/groupBy on explicit block keys — no
  ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` node anywhere;
- task memory is bounded by 2·(n/B)·dim doubles regardless of n;
- work (n² pair checks) distributes evenly across B·(B+1)/2 tasks;
- the kernel is vectorized numpy instead of interpreted ``aggregate``-HOF
  expressions (measured ~5× on the round-1 DBSCAN ε-join).

Exact all-pairs work is irreducibly Θ(n²); for corpora where candidates
can be pruned (clusterable / near-dup regimes) put a candidate generator
(LSH buckets, grid cells, prefix filters — see dedup.py/similarity.py) in
front and keep this as the verification kernel.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: target points per block — the task-memory / BLAS-batch dial.
BLOCK_ROWS = 512

#: kernel(ids_a, mat_a, ids_b, mat_b, same_block) → output frame. When
#: same_block, ids_a is ids_b and the kernel must emit each unordered pair
#: once (strict upper triangle); across blocks every cross pair appears in
#: exactly one group.
PairKernel = Callable[[np.ndarray, np.ndarray, np.ndarray, np.ndarray, bool], pd.DataFrame]


def seq_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(na, nb) pairwise dot products with a *sequential* per-pair fold
    (acc = ((0 + a₀b₀) + a₁b₁) + …), vectorized across pairs. Bit-identical
    to ``functions.vectors.dot`` (``F.aggregate`` left fold) and DuckDB's
    list_dot_product, so downstream half-up rounding agrees across all
    three engines."""
    acc = np.zeros((a.shape[0], b.shape[0]))
    for d in range(a.shape[1]):
        acc = acc + a[:, d, None] * b[None, :, d]
    return acc


def seq_self_dot(a: np.ndarray) -> np.ndarray:
    """Per-row ⟨v,v⟩ with the same sequential fold."""
    acc = np.zeros(a.shape[0])
    for d in range(a.shape[1]):
        acc = acc + a[:, d] * a[:, d]
    return acc


def round_half_up_np(x: np.ndarray, digits: int) -> np.ndarray:
    """numpy twin of ``functions.rounding.round_half_up`` — same IEEE
    multiply/add/floor/divide sequence."""
    scale = float(10**digits)
    return np.floor(x * scale + 0.5) / scale


def _n_blocks(n: int, block_rows: int, max_blocks: int | None = None) -> int:
    """Block count for ``n`` points: ⌈n/block_rows⌉, so per-task memory
    stays ≤ 2·block_rows·dim doubles at ANY corpus size (a fixed cap would
    grow task memory linearly past cap·block_rows points). The trade is
    replication: every point ships to B groups, so the replicated input is
    B× the corpus — acceptable because exact all-pairs work is Θ(n²) and
    B ∝ n keeps per-task work constant. ``max_blocks`` is an explicit
    opt-in ceiling for callers that prefer replication bounds over memory
    bounds."""
    b = max(1, -(-n // block_rows))
    return b if max_blocks is None else min(b, max_blocks)


def blocked_apply(
    pts: DataFrame,
    kernel: PairKernel,
    out_schema: str,
    id_col: str = "vec_id",
    vec_col: str = "v",
    block_rows: int = BLOCK_ROWS,
    max_blocks: int | None = None,
) -> DataFrame:
    """Run ``kernel`` over every pair of blocks of ``pts``.

    ``pts`` must be cheap to count (cache it first); the count only sizes
    the block grid, it never affects results. Block assignment hashes the
    id (``xxhash64 mod B``) so blocks stay balanced for sparse/structured
    id spaces, not just dense 0..n-1 ids; a block-pair group where one
    side hashed empty yields an empty result frame."""
    n = pts.count()
    n_blocks = _n_blocks(n, block_rows, max_blocks)
    # Parse the DDL properly: a naive split(",") breaks on parameterized /
    # nested types (decimal(10,2), array<struct<...>>) and would hand the
    # empty frame wrong column names (round-3 ADVICE).
    out_cols = [f.name for f in T._parse_datatype_string(out_schema).fields]
    empty = pd.DataFrame({c: [] for c in out_cols})

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ga, gb = int(key[0]), int(key[1])
        pa = pdf[pdf["g"] == ga]
        if len(pa) == 0:
            return empty
        ids_a = pa[id_col].to_numpy()
        mat_a = np.stack(pa[vec_col].to_numpy())
        if ga == gb:
            ids_b, mat_b = ids_a, mat_a
        else:
            pb = pdf[pdf["g"] == gb]
            if len(pb) == 0:
                return empty
            ids_b = pb[id_col].to_numpy()
            mat_b = np.stack(pb[vec_col].to_numpy())
        return kernel(ids_a, mat_a, ids_b, mat_b, ga == gb)

    replicated = pts.select(
        id_col,
        vec_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("g"),
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("h"),
    ).select(
        F.least("g", "h").alias("ga"),
        F.greatest("g", "h").alias("gb"),
        id_col,
        vec_col,
        "g",
    )
    return replicated.groupBy("ga", "gb").applyInPandas(run, out_schema)

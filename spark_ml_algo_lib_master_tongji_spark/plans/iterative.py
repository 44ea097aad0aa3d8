"""Checkpointed iterative-loop utility — the engine's replacement for
GraphX's Pregel driver (``graph/KcoreMain.scala:126``) and the manual
shuffle-cleanup loops of the reference (``SimRankOpenSource.scala:128-150``).

Every iterative graph/ML algorithm in this engine funnels through
``iterate``: the step function maps state-DataFrame → state-DataFrame, and
the loop caches each new state and periodically truncates lineage.  Without
truncation an N-iteration DataFrame loop builds an N-deep logical plan —
analysis time grows superlinearly and the driver eventually OOMs on plan
objects (SURVEY.md §7 risk (2)).

Scale notes: ``localCheckpoint`` keeps the truncated state in executor
block-manager storage (no HDFS round-trip) which is right for local[*] and
still correct on a cluster as long as executors are stable; for very long
multi-hour cluster runs pass ``reliable=True`` after
``sc.setCheckpointDir`` to survive executor loss.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class NotConvergedError(RuntimeError):
    """A fixed-round loop whose semantics require a fixed point did not
    reach one within its round budget — the result would be silently wrong
    (truncated label/distance propagation), so fail loudly instead."""


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    n_iter: int,
    checkpoint_every: int = 1,
    reliable: bool = False,
    verify_fixpoint: Callable[[DataFrame, DataFrame], bool] | None = None,
    early_stop: Callable[[DataFrame, DataFrame], bool] | None = None,
) -> DataFrame:
    """Run ``state = step(state, i)`` for ``n_iter`` rounds with lineage
    control.

    The state is *eagerly* checkpointed every ``checkpoint_every`` rounds;
    in-between rounds are persisted lazily (MEMORY_AND_DISK). Default 1
    (round-4 correction of the round-3 ce=2 claim, which did not hold up
    under isolated re-measurement): with a lazy in-between persist, the
    next round's broadcast-exchange job is the FIRST thing to execute the
    unmaterialized round — a driver-side collect path with AQE re-planning
    of the nested chain — measured 8.2s vs 4.7s for the 8-round PageRank
    loop and ~18s/round vs ~2s for Louvain's four-reference step at sf0.1.
    An eager per-round cut materializes with full parallelism and the
    broadcast then reads cached rows. Eager truncation is also what keeps
    the plan shallow: an un-truncated N-round loop builds an N-deep plan —
    superlinear analysis time, driver OOM on plan objects (SURVEY.md §7
    risk (2)); this mirrors the reference's per-iteration materialize +
    shuffle cleanup (``SimRankOpenSource.scala:128-150``)."""
    probe = verify_fixpoint if verify_fixpoint is not None else early_stop
    prev: DataFrame | None = None
    for i in range(n_iter):
        state = step(state, i)
        is_cut = (i + 1) % checkpoint_every == 0 or i == n_iter - 1
        if is_cut:
            if reliable:
                state = state.checkpoint(eager=True)
            else:
                state = state.localCheckpoint(eager=True)
        else:
            state = state.persist(StorageLevel.MEMORY_AND_DISK)
        if probe is not None and prev is not None and is_cut:
            # Early termination (round 4): ``prev`` is the ADJACENT previous
            # round's state — lazily persisted in between cuts, and just
            # materialized as a byproduct of this round's checkpoint job —
            # so the comparison reads two cached relations. Adjacent-equal
            # states are a PROVEN fixed point (steps are stationary), every
            # remaining round is a no-op, and the result is bit-identical
            # to the oracle's full ``n_iter`` unroll — returning now both
            # skips the dead rounds (the nation-graph CC budget spent 7 of
            # its 10 rounds converged) and discharges the fixpoint guard
            # without the final probe superstep. ``early_stop`` provides
            # the same exit for loops whose round budget is a *semantic*
            # depth limit (BFS/SSSP): converged-early results are
            # identical, but a budget-truncated state is valid output, so
            # no final guard fires.
            if probe(prev, state):
                prev.unpersist(blocking=False)
                return state
        if prev is not None:
            prev.unpersist(blocking=False)
        prev = state
    if verify_fixpoint is not None and n_iter > 0:
        # Convergence guard (run-to-fixpoint semantics on a fixed round
        # budget): the differential oracles unroll exactly ``n_iter``
        # rounds, so an unconverged loop would agree with its oracle while
        # both diverge from the reference's run-to-convergence semantics —
        # this turns that silent divergence into a loud error. The loop
        # above never observed an adjacent-equal pair at a cut, so one
        # probe superstep must be a no-op.
        if not verify_fixpoint(state, step(state, n_iter)):
            raise NotConvergedError(
                f"state still changing after {n_iter} rounds; raise the "
                "round budget for this graph"
            )
    return state


def stat_fixpoint_probe(*exprs: str):
    """Fixpoint predicate from scalar statistics: state equality is judged
    by equality of the given SQL aggregate expressions, evaluated in one
    tiny agg job per side over cached state — instead of a count + full
    ``exceptAll`` (the exceptAll probe alone was ~0.75s/boundary at sf0.1;
    the aggs are ~0.1s).

    SOUNDNESS IS THE CALLER'S OBLIGATION: the statistics must be chosen so
    that, under the loop's monotonicity, equal stats ⟹ unchanged state.
    Valid instances: Σlabel for min-label propagation on a fixed row set
    (labels only decrease); count(1) for grow-only / shrink-only row sets
    (closures, peels); reached-count + Σreached-dist for relaxation loops
    (the reached set only grows, reached distances only decrease, and the
    guarded sum avoids the INF-sentinel int64 overflow a raw Σdist has)."""
    from pyspark.sql import functions as F

    def probe(before: DataFrame, after: DataFrame) -> bool:
        cols = [F.expr(e).alias(f"s{i}") for i, e in enumerate(exprs)]
        b = tuple(before.agg(*cols).collect()[0])
        a = tuple(after.agg(*cols).collect()[0])
        return b == a

    return probe


def monotone_sum_probe(col: str):
    """``stat_fixpoint_probe`` specialization for monotone min-label loops
    (CC, WCE, cluster merge): labels only ever decrease on a fixed row
    set, so Σ``col`` equality ⟺ multiset equality."""
    return stat_fixpoint_probe(f"sum({col})")


def unchanged(before: DataFrame, after: DataFrame) -> bool:
    """True iff the two state DataFrames hold identical multisets of rows —
    the default ``verify_fixpoint`` predicate.

    A one-sided ``after.exceptAll(before)`` alone is blind to pure row
    deletions (monotonically shrinking states like a k-core peel always
    pass it), so equality is established as: equal cardinality AND
    after ∖ before = ∅ — together these imply multiset equality, and the
    count comparison doubles as a cheap shortcut before the exceptAll
    (states are checkpointed, so both counts are near-free)."""
    if before.count() != after.count():
        return False
    return after.exceptAll(before).limit(1).count() == 0

"""Recursive (fixpoint) view evaluation.

Reference: ``DECLARE RECURSIVE VIEW`` (``docs/sql/recursion.mdx:14-60``)
runs a nested circuit to fixpoint (``operator/recursive.rs:262``); DBSP's
incremental semantics make evaluation semi-naive automatically.

Spark: a driver-side semi-naive iteration — each step computes the frontier
(new rows only) and unions it into the accumulator. ``localCheckpoint``
truncates the lineage so plans don't grow unboundedly with iterations
(classic Spark transitive-closure pattern). Each iteration is a distributed
job; the driver only orchestrates, never holds rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def fixpoint(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Semi-naive fixpoint: acc ∪= step(frontier) \\ acc until empty frontier.

    ``step`` receives the current frontier (delta) and returns candidate new
    rows; rows already in the accumulator are subtracted before the next
    round, so work per round is proportional to the frontier, not the
    accumulated result (semi-naive evaluation).
    """
    acc = seed.distinct().localCheckpoint(eager=True)
    frontier = acc
    for i in range(max_iterations):
        candidates = step(frontier).distinct()
        frontier = candidates.exceptAll(acc).distinct()
        if i % checkpoint_every == 0:
            frontier = frontier.localCheckpoint(eager=True)
        if frontier.limit(1).count() == 0:
            return acc
        acc = acc.unionByName(frontier).localCheckpoint(eager=True)
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")


def fixpoint_group(
    seeds: dict[str, DataFrame],
    steps: dict[str, Callable[[dict[str, DataFrame]], DataFrame]],
    max_iterations: int = 100,
) -> dict[str, DataFrame]:
    """Mutually recursive view group — the reference's SCC case.

    ``DECLARE RECURSIVE VIEW`` allows groups of views that reference each
    other (``docs/sql/recursion.mdx:30-57``); the compiler finds strongly
    connected components and runs each as one nested fixpoint circuit
    (``RecursiveComponents``, ``CircuitOptimizer.java:87``). Here: every
    view in the group steps once per round against the group's current
    accumulators; the round's new rows (per view) become visible to ALL
    members next round; terminate when every view's frontier is empty.

    ``steps[name]`` receives {view: accumulated DataFrame} and returns the
    candidate rows for ``name``. Work per round is driven by the new rows
    only on the caller side of each step (naive within the round, but
    lineage is truncated per round so each round is one bounded job).
    """
    acc = {k: v.distinct().localCheckpoint(eager=True) for k, v in seeds.items()}
    for _ in range(max_iterations):
        progressed = False
        new_acc = {}
        for name, step in steps.items():
            candidates = step(acc).distinct()
            frontier = candidates.exceptAll(acc[name]).localCheckpoint(eager=True)
            if frontier.limit(1).count() > 0:
                progressed = True
                new_acc[name] = (
                    acc[name].unionByName(frontier).localCheckpoint(eager=True)
                )
            else:
                new_acc[name] = acc[name]
        acc = new_acc
        if not progressed:
            return acc
    raise RuntimeError(f"fixpoint_group did not converge in {max_iterations} iterations")

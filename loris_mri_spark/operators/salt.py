"""Skew-mitigation: salted two-phase aggregation.

The engine's aggregations rely on partial (map-side) aggregation, which
already collapses skew for algebraic aggregates. For the cases partial
aggregation can't save — high-cardinality aggregation payloads
(collect_list/distinct counts) over a handful of hot keys — the standard
fix is SALTING: spread each hot key over N sub-keys, aggregate partially
per (key, salt), then merge the N partials per key. Two small shuffles
instead of one skewed one; at 1000 executors a single hot key stops
capping the stage at one task.

AQE's skewJoin handles skewed JOINS automatically; salting covers skewed
AGGREGATIONS, which AQE does not rebalance.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[tuple[Column, str]],
    merge_aggs: Sequence[tuple[Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups by (keys..., salt) computing
    ``partial_aggs`` (each (expr, alias)); phase 2 groups by keys merging
    with ``merge_aggs`` (exprs over the phase-1 aliases).

    The salt is random-per-row but the RESULT is deterministic for
    algebraic merges (sum of partial sums, max of partial maxes...).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for expr, name in partial_aggs]
    )
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for expr, name in merge_aggs]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join by salt replication, for the case AQE's
    runtime skew-join cannot cover: AQE only splits skewed partitions of
    a SORT-MERGE join after materializing the shuffle — when the
    skewed-side stage itself is the problem (one key = one task at 1000
    executors), pre-salting fixes the plan statically.

    The FACT side gets a per-row salt in [0, n_salts); the DIM side is
    replicated n_salts times (explode of a sequence — n_salts * |dim|
    rows, which is why this is for fact-skewed joins with a dim side too
    big to broadcast but small enough to replicate). Joining on
    (key, salt) spreads each hot key over n_salts tasks. The salt is
    `rand`-derived per fact row, so every fact row joins exactly one
    replica — result == the unsalted join, row for row (pinned in
    tests/test_plans.py).

    ``how`` may be 'inner' or 'left' (fact-preserving); dim-preserving
    joins would need the reverse construction."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    f = fact.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")

"""Iterative graph rank (power iteration / PageRank shape) — the third
member of the engine's iterative-algorithm family (transitive closure =
reachability, connected components = min-label propagation, this =
weighted message passing).

Determinism contract (what makes an iterative float algorithm
hash-checkable on two engines): ranks live in BIGINT NANO-UNITS
(1 rank = 1e9). Each per-edge contribution is
``floor(rank_nanos / outdeg + 0.5)`` and the damped update is
``base_nanos + floor(damping * sum + 0.5)`` — int->double casts are
exact below 2^53, IEEE double divide/multiply are bit-identical
everywhere, floor is exact, and the integer SUM is exact under any
aggregation order. (ROUND(double, 9) is NOT portable: Spark goes
through BigDecimal HALF_UP while DuckDB multiplies and rounds, and the
two disagree on boundary doubles — observed 2/1600 rows off by 1e-9.)

Scale shape: each iteration is one broadcast-able join (ranks are
O(nodes), edges stay put) + one groupBy(dst) — no global collect, state
is one small DataFrame per round, and rounds are a fixed small count
(power iteration converges geometrically; production runs 10-20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000


def power_iteration_rank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    base: float = 0.15,
) -> DataFrame:
    """PageRank-style authority over ``edges(src, dst)``: nodes start at
    rank 1, and each round
    ``rank(n) = base + damping * sum(rank(m)/outdeg(m) for m -> n)``
    computed in bigint nano-units (see module docstring). Dangling nodes
    (no out-edges) leak their mass, matching the simple formulation;
    nodes with no in-edges settle at ``base``. Returns (node, rank) with
    rank as DOUBLE (exact nano-unit value / 1e9)."""
    base_n = int(round(base * NANO))
    # Materialize the edge list ONCE: nodes, out-degrees and the weighted
    # edge table all derive from it, and without this each derivation (and
    # every loop round) re-evaluates the caller's full edge pipeline —
    # measured 3.5x the iteration cost on the purchase graph (j9 pattern).
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    e = edges.join(outdeg, "src").localCheckpoint()
    ranks = nodes.select("node", F.lit(NANO).cast("long").alias("rn"))
    for _ in range(n_iter):
        # ranks/contrib are O(nodes) — broadcast them onto the (big,
        # stationary) edge table so no round shuffles the edges
        contrib = (
            e.join(F.broadcast(ranks), e.src == ranks.node)
            .select(
                "dst",
                F.floor(
                    F.col("rn").cast("double") / F.col("outdeg") + 0.5
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(F.broadcast(contrib), nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base_n)
                    + F.floor(
                        F.lit(float(damping))
                        * F.coalesce(F.col("s"), F.lit(0)).cast("double")
                        + 0.5
                    )
                ).cast("long").alias("rn"),
            )
        )
    return ranks.select(
        "node", (F.col("rn").cast("double") / NANO).alias("rank")
    )


def sql_power_iteration_rank(
    edges_sql: str,
    n_iter: int = 3,
    damping: float = 0.85,
    base: float = 0.15,
) -> str:
    """DuckDB mirror as a generated CTE chain (the kmeans-oracle pattern):
    ``edges_sql`` must yield (src, dst)."""
    base_n = int(round(base * NANO))
    parts = [
        f"e AS ({edges_sql})",
        """nodes AS (SELECT DISTINCT node FROM
             (SELECT src AS node FROM e UNION SELECT dst FROM e))""",
        "od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        f"r0 AS (SELECT node, CAST({NANO} AS BIGINT) AS rn FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""
    c{i} AS (
      SELECT e.dst,
             SUM(CAST(FLOOR(CAST(r.rn AS DOUBLE) / od.outdeg + 0.5)
                      AS BIGINT)) AS s
      FROM e JOIN r{i - 1} r ON e.src = r.node
             JOIN od ON e.src = od.src
      GROUP BY e.dst)""")
        parts.append(f"""
    r{i} AS (
      SELECT n.node,
             CAST({base_n}
                  + CAST(FLOOR({damping!r}
                               * CAST(COALESCE(c.s, 0) AS DOUBLE) + 0.5)
                         AS BIGINT)
                  AS BIGINT) AS rn
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\n    SELECT node, CAST(rn AS DOUBLE) / {NANO} AS rank"
        + f"\n    FROM r{n_iter}"
    )

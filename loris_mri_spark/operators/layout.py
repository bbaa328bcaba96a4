"""Data-layout operators — multi-dimensional clustering for scan pruning.

`zorder_key` computes the Morton (Z-order) interleave of k bounded integer
dimensions — the clustering key behind Delta/Iceberg ``OPTIMIZE ZORDER BY``:
sorting/range-partitioning a 100 TB table by the z-value makes every output
file cover a small HYPER-RECTANGLE of the dimension space, so min/max file
statistics prune scans on ANY of the interleaved columns, not just the
leading sort key.

The key is a flat Column expression (bits x dims literal-weighted terms —
all integer arithmetic inside whole-stage codegen, no UDF, no shuffle); the
DuckDB mirror `sql_zorder_key` emits the same terms, so layouts are
oracle-checkable bit-for-bit.

Write path at scale: ``df.repartitionByRange(n_files, zval)
.sortWithinPartitions(zval)`` — a range shuffle, never a global
single-partition sort. The fixed-width z-range bucketing used by the stats
query below is the shuffle-free observability view of the same layout.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of each non-negative integer
    column into one z-value: bit ``b`` of column ``j`` lands at position
    ``b * k + (k - 1 - j)`` (column 0 owns the most-significant lane).
    ``bits * len(cols)`` must stay < 63."""
    k = len(cols)
    if not (0 < bits * k < 63):
        raise ValueError("zorder_key: bits * len(cols) must be in (0, 63)")
    total = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            weight = 1 << (b * k + (k - 1 - j))
            total = total + (
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
                * F.lit(weight).cast("long")
            )
    return total


def sql_zorder_key(exprs: list[str], bits: int = 10) -> str:
    """DuckDB mirror of :func:`zorder_key` over SQL expressions."""
    k = len(exprs)
    terms = []
    for b in range(bits):
        for j, e in enumerate(exprs):
            weight = 1 << (b * k + (k - 1 - j))
            terms.append(
                f"(((CAST({e} AS BIGINT) >> {b}) & 1)"
                f" * CAST({weight} AS BIGINT))"
            )
    return "(" + " + ".join(terms) + ")"

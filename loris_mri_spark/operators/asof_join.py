"""As-of (most-recent-before) temporal join — SURVEY §2.3 J8.

Reference semantics (`python/lib/imaging.py:851-892,1112-1148`): each
dwi/func scan is assigned the field-map acquired most recently at-or-before
its own acquisition time, within the same grouping (session/direction).

Spark-first implementation: the **union + last(ignorenulls) window**
pattern. Instead of a non-equi range join (which Spark would execute as a
cartesian per key) or a correlated subquery (driver-side), tag both sides,
union them, and run one window per key ordered by time: every left row picks
up the running "last right row seen". This is a single shuffle on the key —
linear in input size, skew-safe under AQE, and scales to arbitrarily many
right rows per key (where lead()-interval approaches need the right side
distinct).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool = False,
    tie_break: str | None = None,
) -> DataFrame:
    """For each ``left`` row, attach ``value_cols`` from the latest ``right``
    row with ``right_ts <= left_ts`` (``<`` when ``strict``) sharing the
    ``on`` keys. No match -> NULLs. Output columns: all of ``left`` plus
    ``asof_<value_col>`` for each value column.

    ``tie_break``: optional right-side column; among right rows with equal
    ``right_ts`` the one with the greatest ``tie_break`` wins (determinism).
    """
    on = list(on)
    value_cols = list(value_cols)

    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        F.struct(*left.columns).alias("__row"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(lhs.schema["__row"].dataType).alias("__row"),
    )
    both = lhs.unionByName(rhs)

    # At equal timestamps: non-strict (<=) means a right row at ts counts for
    # a left row at ts -> right (0) sorts first (asc). Strict (<) means it
    # must not -> left (1) sorts first (desc).
    side_order = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    order = [F.col("__ts").asc(), side_order]
    if tie_break is not None:
        # Ordering among left rows is irrelevant (each reads its own prefix),
        # so the tie column may simply come last.
        order.append(F.col(f"__r_{tie_break}").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = both.select(
        "__is_left",
        "__row",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__is_left") == 1)

    return picked.select(
        F.col("__row.*"),
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )

"""Lookup get-or-create — SURVEY §2.3 J10.

Reference pattern (`lib/database.py:210-253` grep_id_from_lookup_table,
`imaging.py:344-380` parameter_type auto-create): SELECT id by value, INSERT
a new row when missing, return the id. That is inherently row-at-a-time with
autoincrement ids; the distributed re-expression resolves ALL missing values
in one pass and assigns **deterministic** ids (SURVEY §7.3 "Get-or-create
identity"): new ids are ``base + row_number() over (order by value)``, which
is reproducible across runs and executors (unlike
monotonically_increasing_id, which depends on partitioning).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def get_or_create(
    requested: DataFrame,
    existing: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    id_base: int = 100,
) -> DataFrame:
    """Resolve every distinct ``requested[name_col]`` to an id.

    Existing names keep their id from ``existing``; new names get
    ``GREATEST(id_base, MAX(existing.id)) + row_number() over (ORDER BY
    name)`` — the max-existing guard prevents newly minted ids from
    colliding with existing ids >= id_base. Returns (name_col, id_col)
    covering exactly the requested names.

    Scale contract: ``existing`` is a SMALL lookup table (parameter_type /
    scanner registries are O(100) rows in the reference) — it is broadcast
    and its max id is folded into the plan. The un-partitioned window
    funnels the MISSING names (distinct, usually a handful) through one
    partition; for high-cardinality get-or-create use a deterministic hash
    id (``xxhash64(name)``) instead of sequence assignment.
    """
    names = requested.select(F.col(name_col).alias(name_col)).distinct()
    ex = F.broadcast(existing.select(name_col, id_col))

    found = names.join(ex, on=name_col, how="inner")
    missing = names.join(ex.select(name_col), on=name_col, how="left_anti")
    base = existing.agg(
        F.greatest(F.lit(id_base), F.coalesce(F.max(id_col), F.lit(id_base)))
        .cast("long")
        .alias("__base")
    )
    w = Window.orderBy(name_col)
    created = missing.crossJoin(F.broadcast(base)).select(
        name_col,
        (F.col("__base") + F.row_number().over(w)).cast("long").alias(id_col),
    )
    return found.select(name_col, F.col(id_col).cast("long")).unionByName(created)

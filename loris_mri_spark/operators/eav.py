"""EAV (entity-attribute-value) operators — SURVEY §1.1 / §7.1.

Reference: the `parameter_file` long table (FileID, ParameterTypeID,
Value-as-string) + `parameter_type` registry, pivoted/filtered per query
(`/root/reference/python/lib/db/models/file_parameter.py:12-24`,
`database_lib/files.py:95-99,179-185`, auto-create `imaging.py:344-380`).

Scale contract: `pivot` needs its column set up front — collecting
distinct attribute names over 100 TB per query is a full scan, so the
pivot is ALWAYS bounded by the registry table (the parameter_type mirror,
O(1000) rows, broadcast/collected once). The long table stays the source
of truth; wide views are derived, never stored back.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_parameters(
    long_df: DataFrame,
    entity_col: str,
    name_col: str,
    value_col: str,
    names: Sequence[str],
) -> DataFrame:
    """Long EAV rows -> one wide row per entity with a column per
    registered parameter name (first value wins per (entity, name) — the
    reference's unique-key upsert makes duplicates impossible there)."""
    return (
        long_df.groupBy(entity_col)
        .pivot(name_col, list(names))
        .agg(F.first(value_col))
    )


def parameters_as_map(
    long_df: DataFrame, entity_col: str, name_col: str, value_col: str
) -> DataFrame:
    """Long EAV rows -> (entity, map<name, value>) — the MapType view for
    consumers that need arbitrary keys without a bounded pivot."""
    return long_df.groupBy(entity_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(name_col, value_col)))
        ).alias("params")
    )


def melt_to_eav(
    wide_df: DataFrame,
    entity_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Wide columns -> long EAV rows (entity, name, value-as-string) —
    the write-side inverse (the reference's bulk parameter_file insert,
    `MRI.pm:815-825`)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("name"), F.col(c).cast("string").alias("value")
            )
            for c in value_cols
        ]
    )
    return wide_df.select(
        F.col(entity_col), F.explode(pairs).alias("__e")
    ).select(
        entity_col,
        F.col("__e.name").alias("name"),
        F.col("__e.value").alias("value"),
    )

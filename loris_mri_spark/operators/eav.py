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


def dwi_bval_bvec(
    eav: DataFrame,
    file_col: str = "file_id",
    name_col: str = "name",
    value_col: str = "value",
) -> DataFrame:
    """Per-file NIfTI ``.bval`` / ``.bvec`` text content from the EAV
    parameter table — `tools/create_nifti_bval_bvec.pl` composed with
    `MRI.pm:1499-1562` (create_dwi_nifti_bval_file /
    create_dwi_nifti_bvec_file), set-oriented instead of one
    NeuroDB::File load per FileID.

    Cleanup semantics preserved exactly:
    - bval: the `acquisition:bvalues` value with every ``.,`` removed
      and a trailing ``.`` stripped (MRI.pm:1509-1511); NULL when the
      parameter is absent (the reference skips those files).
    - bvec: `acquisition:direction_{x,y,z}` each stripped of leading
      quotes, ``.,`` pairs, commas and a trailing quote
      (MRI.pm:1555), newline-joined in x/y/z order; NULL unless all
      three directions are present (MRI.pm:1552).

    Returns (file_col, bval_content, bvec_content) for files that have
    at least the bvalues parameter — write with the text sink next to
    the NIfTI (the reference rewrites the .mnc suffix)."""
    names = {
        "acquisition:bvalues": "bvals",
        "acquisition:direction_x": "dx",
        "acquisition:direction_y": "dy",
        "acquisition:direction_z": "dz",
    }
    # F.min, not F.first: duplicate (file, name) EAV rows would make an
    # unordered first() partition-order-dependent — min is the
    # deterministic keep-one refinement the repo uses everywhere.
    wide = (
        eav.filter(F.col(name_col).isin(*names))
        .groupBy(F.col(file_col))
        .pivot(name_col, list(names))
        .agg(F.min(value_col))
    )
    for orig, alias in names.items():
        wide = wide.withColumnRenamed(orig, alias)

    bval = F.regexp_replace(
        F.regexp_replace(F.col("bvals"), r"\.,", ""), r"\.$", ""
    )

    def clean_dir(c: str) -> F.Column:
        stripped = F.regexp_replace(F.col(c), r'^"+|"$', "")
        return F.regexp_replace(stripped, r"\.,|,", "")

    # Perl truthiness, not SQL null-ness: `return undef unless $bvals`
    # (MRI.pm create_dwi_nifti_bval_file) and `unless ($bvecs[0] && ...)`
    # skip on '' and '0' as well as undef.
    def perl_truthy(c: str) -> F.Column:
        return (
            F.col(c).isNotNull() & (F.col(c) != "") & (F.col(c) != "0")
        )

    bvec = F.when(
        perl_truthy("dx") & perl_truthy("dy") & perl_truthy("dz"),
        F.concat(
            clean_dir("dx"), F.lit("\n"),
            clean_dir("dy"), F.lit("\n"),
            clean_dir("dz"), F.lit("\n"),
        ),
    )
    return wide.filter(perl_truthy("bvals")).select(
        file_col,
        bval.alias("bval_content"),
        bvec.alias("bvec_content"),
    )

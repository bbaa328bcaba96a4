"""Plugin / profile hooks — SURVEY §2.10 X1/X2.

Reference: site-specific Python/Perl callables loaded from a profile file
decide candidate/visit/phantom routing —
`python/lib/get_session_info.py:87-105` (`get_session_config`), Perl
`prod` profile `determineSubjectID` (`MRIProcessingUtility.pm:395-480`).

Engine shape: a registry of named resolver plugins. A resolver is a
Python callable `(patient_id_col: Column) -> Column(struct<project,
candidate, visit_label, is_phantom>)` — it BUILDS a Column expression, so
site logic stays JVM-side/codegen'd (no per-row Python) while remaining
fully pluggable. Sites whose logic genuinely needs Python register a
pandas-UDF-backed resolver with the same signature.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Resolver = Callable[[Column], Column]

_REGISTRY: dict[str, Resolver] = {}


def register_profile(name: str, resolver: Resolver) -> None:
    _REGISTRY[name] = resolver


def get_profile(name: str) -> Resolver:
    return _REGISTRY[name]


def resolve_session_config(
    df: DataFrame, patient_id_col: str, profile: str = "default"
) -> DataFrame:
    """X1: apply the profile's subject-resolution hook, appending the
    routing struct's fields (the session/candidate resolution step of
    `nifti_insertion_pipeline.py:214-253`)."""
    out = _REGISTRY[profile](F.col(patient_id_col))
    return df.withColumn("__cfg", out).select(
        "*",
        F.col("__cfg.project").alias("project"),
        F.col("__cfg.candidate").alias("candidate"),
        F.col("__cfg.visit_label").alias("visit_label"),
        F.col("__cfg.is_phantom").alias("is_phantom"),
    ).drop("__cfg")


def _default_resolver(pid: Column) -> Column:
    """The LORIS PSCID_CandID_VisitLabel convention
    (`get_session_info.py:107-163`): 'PRJ123_456789_V1'; anything
    containing 'phantom' (ci) routes as a phantom scan with no candidate
    (`mri_upload.IsPhantom`, `get_session_info.py:87-105`)."""
    is_phantom = F.lower(pid).contains("phantom")
    parts = F.split(pid, "_")
    valid = F.size(parts) >= 3
    return F.struct(
        F.when(~is_phantom & valid, parts.getItem(0)).alias("project"),
        F.when(~is_phantom & valid, parts.getItem(1)).alias("candidate"),
        F.when(is_phantom, F.lit("PHANTOM"))
        .when(valid, parts.getItem(2))
        .alias("visit_label"),
        is_phantom.alias("is_phantom"),
    )


def _legacy_perl_resolver(pid: Column) -> Column:
    """X2: the Perl-profile variant (`MRIProcessingUtility.pm:395-480`
    determineSubjectID): site prefix is the leading alpha run, candidate
    is the digit run, visit defaults to V1 when absent."""
    is_phantom = F.lower(pid).contains("phantom")
    return F.struct(
        F.when(~is_phantom, F.regexp_extract(pid, r"^([A-Za-z]+)", 1)).alias(
            "project"
        ),
        F.when(~is_phantom, F.regexp_extract(pid, r"([0-9]+)", 1)).alias(
            "candidate"
        ),
        F.when(is_phantom, F.lit("PHANTOM"))
        .otherwise(
            F.coalesce(
                F.nullif(F.regexp_extract(pid, r"_(V[0-9]+)$", 1), F.lit("")),
                F.lit("V1"),
            )
        )
        .alias("visit_label"),
        is_phantom.alias("is_phantom"),
    )


register_profile("default", _default_resolver)
register_profile("legacy_perl", _legacy_perl_resolver)

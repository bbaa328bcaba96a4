"""HED parser unit coverage (deep nesting) + resolver registry."""

from __future__ import annotations

from loris_mri_spark.functions.hed import parse_hed
from loris_mri_spark.plugins import get_profile, register_profile


def test_hed_nested_groups():
    out = parse_hed("A, (B, (C/D, E)), F")
    assert out == [
        ("A", 0, 0),
        ("B", 1, 1),
        ("C/D", 2, 1),
        ("E", 2, 1),
        ("F", 0, 2),
    ]


def test_hed_empty_and_unbalanced():
    assert parse_hed("") == []
    assert parse_hed(None) == []
    # unbalanced close clamps at depth 0 rather than crashing
    assert parse_hed("A)),B") == [("A", 0, 0), ("B", 0, 1)]


def test_register_custom_profile():
    from pyspark.sql import functions as F

    register_profile("testprof", lambda pid: F.struct(
        F.lit("p").alias("project"), F.lit("c").alias("candidate"),
        F.lit("v").alias("visit_label"), F.lit(False).alias("is_phantom"),
    ))
    assert get_profile("testprof") is not None

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


def test_grouped_agg_trimmed_sum_matches_python(spark):
    """The GROUPED_AGG UDAF's trimmed sum equals a pure-Python recompute,
    including the k=0 (n<10) no-trim edge and a group with ties at the
    trim boundary."""
    import pandas as pd

    from loris_mri_spark.functions.udaf import trimmed_sum_cents

    data = [
        ("a", v) for v in [5, 1, 9, 3, 3, 3, 8, 2, 7, 6, 4, 10]
    ] + [("b", v) for v in [100, 50, 75]]
    df = spark.createDataFrame(data, "g string, cents long")
    got = {
        r["g"]: (r["sn"][0], r["sn"][1])
        for r in df.groupBy("g")
        .agg(trimmed_sum_cents("cents").alias("sn"))
        .collect()
    }

    def py_trim(vals):
        s = sorted(vals)
        k = len(s) // 10
        return sum(s[k : len(s) - k] if k else s), len(s)

    assert got["a"] == py_trim([5, 1, 9, 3, 3, 3, 8, 2, 7, 6, 4, 10])
    assert got["b"] == py_trim([100, 50, 75])


def test_grouped_agg_trimmed_sum_null_group_stays_exact(spark):
    """A NULL in the group makes Arrow deliver float64 to pandas; the
    UDAF must cast back after dropna so the sum stays integer-exact
    (2^53-adjacent values would truncate through a float sum)."""
    from loris_mri_spark.functions.udaf import trimmed_sum_cents

    big = (1 << 53) - 1
    df = spark.createDataFrame(
        [("a", big), ("a", None), ("a", 3)], "g string, cents long"
    )
    [row] = df.groupBy("g").agg(trimmed_sum_cents("cents").alias("sn")).collect()
    assert row["sn"] == [big + 3, 2]

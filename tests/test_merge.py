"""operators/merge.py: all four MERGE behaviors on a hand case —
matched update, not-matched insert, not-matched-by-source expression,
and the default passthrough."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_branches(spark):
    from loris_mri_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "bal"]
    )
    source = spark.createDataFrame(
        [(2, 5.0), (4, 7.0)], ["k", "delta"]
    )
    out = merge_upsert(
        target,
        source,
        key="k",
        when_matched={"bal": F.col("t.bal") + F.col("s.delta")},
        when_not_matched={"bal": F.col("s.delta")},
        status_col="st",
    )
    got = {(r.k, r.bal, r.st) for r in out.collect()}
    assert got == {
        (1, 10.0, "unchanged"),  # default by-source passthrough: t.bal
        (2, 25.0, "updated"),
        (3, 30.0, "unchanged"),
        (4, 7.0, "inserted"),
    }

    out2 = merge_upsert(
        target,
        source,
        key="k",
        when_matched={"bal": F.col("t.bal") + F.col("s.delta")},
        when_not_matched={"bal": F.col("s.delta")},
        when_not_matched_by_source={"bal": F.lit(-1.0)},  # e.g. tombstone
        status_col="st",
    )
    got2 = {(r.k, r.bal) for r in out2.collect()}
    assert (1, -1.0) in got2 and (3, -1.0) in got2


def test_merge_keeps_unmapped_target_columns(spark):
    """Target columns not named in any expression map must pass through
    (matched/target-only) and take the same-named source column on
    inserts — MERGE never silently projects away target columns."""
    from loris_mri_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b")], ["k", "bal", "tag"]
    )
    source = spark.createDataFrame(
        [(2, 5.0, "b2"), (4, 7.0, "d")], ["k", "delta", "tag"]
    )
    out = merge_upsert(
        target,
        source,
        key="k",
        when_matched={"bal": F.col("t.bal") + F.col("s.delta")},
        when_not_matched={"bal": F.col("s.delta")},
    )
    assert set(out.columns) == {"k", "bal", "tag"}
    got = {(r.k, r.bal, r.tag) for r in out.collect()}
    assert got == {
        (1, 10.0, "a"),   # target-only: everything passes through
        (2, 25.0, "b"),   # matched: unmapped 'tag' keeps the TARGET value
        (4, 7.0, "d"),    # insert: unmapped 'tag' takes the source value
    }

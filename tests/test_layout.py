"""Z-order layout: interleave correctness and the clustering-locality
property the layout exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from loris_mri_spark.operators.layout import sql_zorder_key, zorder_key
from loris_mri_spark import workload
from loris_mri_spark.workload import QUERIES

workload.load_all()


def test_zorder_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (3, 1), (1, 3), (1023, 1023)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], 10).alias("z")
        ).collect()
    }
    # bit b of x lands at 2b+1, bit b of y at 2b
    assert out[(0, 0)] == 0
    assert out[(3, 1)] == 0b1011  # x=11 -> pos 1,3 ; y=01 -> pos 0
    assert out[(1, 3)] == 0b0111  # x=01 -> pos 1 ; y=11 -> pos 0,2
    assert out[(1023, 1023)] == (1 << 20) - 1


def test_sql_mirror_agrees(spark):
    import duckdb

    con = duckdb.connect()
    expr = sql_zorder_key(["x", "y"], 10)
    got = con.execute(
        f"SELECT x, y, {expr} AS z FROM (VALUES (3, 1), (1, 3), "
        "(1023, 1023)) AS t(x, y) ORDER BY x"
    ).fetchall()
    assert [g[2] for g in got] == [0b0111, 0b1011, (1 << 20) - 1]


def test_zorder_buckets_are_local(spark, sf_dir):
    """Every z-range bucket's dimension envelope must cover a small
    rectangle of the 1024x1024 space — the property that lets min/max
    file stats prune on either dimension."""
    rows = QUERIES["layout_zorder_stats"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_rows"] for r in rows)
    worst = max(r["rect_area"] for r in rows)
    # a random (unclustered) 64-way split would give ~full-space rectangles
    assert worst <= (1024 * 1024) // 16, worst
    assert total > 0

"""Data-layout workload — Z-order clustering stats (operators/layout.py).

The reference tunes its MySQL tables with composite indexes
(`SQL/0000-00-00-schema.sql` throughout); the Spark-scale counterpart is
FILE LAYOUT: multi-dimensional z-order clustering so min/max file stats
prune scans on any clustered column. The query here is the observability
view a layout job emits — per z-range-bucket row counts and per-dimension
min/max envelopes — proving each bucket covers a small hyper-rectangle of
the (partkey, suppkey) space rather than a full-width stripe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loris_mri_spark.catalog import load_table
from loris_mri_spark.operators.layout import sql_zorder_key, zorder_key
from loris_mri_spark.workload import query

_BITS = 10  # 10-bit lanes: dims bucketed to [0, 1024)
_N_BUCKETS = 64  # fixed-width z-ranges: 2^20 / 64 per bucket
_BUCKET_W = (1 << (2 * _BITS)) // _N_BUCKETS

_ZKEY_SQL = sql_zorder_key(["l_partkey % 1024", "l_suppkey % 1024"], _BITS)

_ZORDER_SQL = f"""
    WITH z AS (
      SELECT l_partkey % 1024 AS px, l_suppkey % 1024 AS sx,
             {_ZKEY_SQL} AS zval
      FROM lineitem)
    SELECT zval // {_BUCKET_W} AS file_id,
           COUNT(*) AS n_rows,
           MIN(px) AS px_min, MAX(px) AS px_max,
           MIN(sx) AS sx_min, MAX(sx) AS sx_max,
           (MAX(px) - MIN(px) + 1) * (MAX(sx) - MIN(sx) + 1) AS rect_area
    FROM z GROUP BY 1
"""


@query("layout_zorder_stats", oracle=_ZORDER_SQL)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout stats: interleave 10-bit (partkey, suppkey) buckets
    into a Morton key, cut the key space into 64 fixed-width z-ranges
    (the shuffle-free view of the repartitionByRange write), and emit each
    range's row count + dimension envelopes. Every bucket's rect_area is a
    tiny fraction of the 1024x1024 space — the property that lets file
    min/max stats prune scans on EITHER dimension. The z-key is a flat
    codegen'd integer expression (no UDF); one scan, one aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    px = (F.col("l_partkey") % 1024).cast("long")
    sx = (F.col("l_suppkey") % 1024).cast("long")
    z = li.select(
        px.alias("px"),
        sx.alias("sx"),
        zorder_key([px, sx], _BITS).alias("zval"),
    )
    return (
        z.groupBy(
            F.expr(f"zval div {_BUCKET_W}").alias("file_id")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("px").alias("px_min"),
            F.max("px").alias("px_max"),
            F.min("sx").alias("sx_min"),
            F.max("sx").alias("sx_max"),
        )
        .withColumn(
            "rect_area",
            (F.col("px_max") - F.col("px_min") + 1)
            * (F.col("sx_max") - F.col("sx_min") + 1),
        )
    )

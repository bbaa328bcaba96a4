"""Parquet-backed table catalog.

The reference's "catalog" is a MySQL schema of ~60 tables accessed through
hand-written SQL (`/root/reference/python/lib/database.py:116-144`). Here a
catalog is a directory of parquet files; tables load lazily as DataFrames so
Catalyst sees the parquet scan directly (column pruning + predicate pushdown
reach the file reader — check `.explain` for PushedFilters/ReadSchema).

The driver's synthetic tables (TESTDATA.md) are the test catalog:
region nation customer supplier part orders lineitem events documents
embeddings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins. Mirrors the
# reference's rule/lookup tables (psc, Project, mri_protocol, ...) which are
# O(10..1000) rows even at production scale.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (lazy parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS) — illegal for Spark's reader
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is on. That conf is
    runtime-settable, so it is set HERE, at read time, not at session build
    time: the engine must work on any caller-provided SparkSession (the
    driver harness builds its own). The column then arrives as int64 nanos
    and is exposed twice: ``ts_ns`` (exact long, use for ordering/output)
    and ``ts`` (µs-truncated timestamp, use for window/date functions).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    return df


def load_catalog(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table present in ``sf_dir``; missing files are skipped so
    the same call works on partial catalogs."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            # Route through load_table so every access path sees the same
            # normalized schema (events ts_ns/ts in particular).
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the catalog and register each table as a temp view for
    ``spark.sql`` access (mirrors the DuckDB oracle's pre-registered views)."""
    tables = load_catalog(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def write_snapshot(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Snapshot-overwrite writer: the engine's substitute for the reference's
    in-place `UPDATE` sinks (SURVEY §2.1 S12; `lib/database.py:188-208`).

    Spark tables are immutable, so mutations become versioned overwrites of a
    whole table or of key partitions. At 100 TB scale, partition the table on
    the mutation key (e.g. TarchiveID) so an update rewrites one partition,
    not the world.
    """
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 32
) -> None:
    """Bucketed table writer — the co-located-join layout for 100 TB fact
    tables: two tables bucketed (and sorted) on the same join key
    sort-merge-join WITHOUT a shuffle on either side (each bucket pair
    joins locally). The reference's equivalent is MySQL's clustered PK;
    here it's the storage layout that eliminates the dominant exchange at
    scale. Requires a table catalog (saveAsTable), so it's a deployment
    choice, not a per-query one — see tests/test_bucketing.py for the
    plan proof."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )

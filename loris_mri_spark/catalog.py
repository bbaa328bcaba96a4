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


def set_events_read_confs(spark: SparkSession) -> None:
    """Reader conf so a legacy-era events table is readable: parquet
    TIMESTAMP(NANOS) is illegal for Spark's reader unless ``nanosAsLong``
    is on → ts reads as int64 nanos (bigint), which normalize_events turns
    back into the ts_ns/ts pair. The conf is runtime-settable, so it is
    set at READ time, not session build time: the engine must work on any
    caller-provided SparkSession (the driver harness builds its own). It
    has no effect on µs-era files.

    Deliberately NOT set here: ``spark.sql.parquet.inferTimestampNTZ``.
    Disabling it would make µs events arrive as plain TIMESTAMP — but the
    conf leaks to every later read in the session, so orders/lineitem date
    columns would flip NTZ→TIMESTAMP depending on read ORDER, and under a
    non-UTC session timezone their date semantics would drift from the
    (naive-timestamp) oracle. Instead events.ts is allowed to arrive as
    TIMESTAMP_NTZ and normalize_events converts it with timezone-free
    datetime arithmetic."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_events(df: DataFrame) -> DataFrame:
    """Schema-drift guard: expose events time as the invariant pair
    ``ts_ns`` (exact long nanos — ordering/output/oracle arithmetic) and
    ``ts`` (µs TIMESTAMP — window/date functions, stream watermarks),
    whatever physical type ``ts`` arrived as.

    The reference reads every format defensively and surfaces what's there
    (`/root/reference/python/lib/imaging_lib/nifti.py:7-30`,
    `dicom-archive/DICOM/DCMSUM.pm:722-736` classifies rather than fails);
    this is the same contract applied to the catalog's own input: one
    normalization point, so a physical-type change in the testdata never
    propagates past this function. Round 3 learned this the hard way when
    events.ts drifted from TIMESTAMP(NANOS) to timestamp[us] and broke
    every ts_ns consumer.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":  # legacy TIMESTAMP(NANOS) read via nanosAsLong
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    elif dt == "timestamp_ntz":
        # µs parquet, isAdjustedToUTC=false (the current testdata era).
        # timestampdiff on NTZ is pure datetime arithmetic — no session-
        # timezone dependence (verified equal to DuckDB epoch_us(ts) under
        # an adversarial session tz); the synthesized ts is the TIMESTAMP
        # carrying the same raw micros, as in the legacy era.
        df = df.withColumn(
            "ts_ns",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
            * F.lit(1000).cast("long"),
        ).withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    elif dt == "timestamp":  # µs parquet already adjusted to UTC
        df = df.withColumn("ts_ns", F.unix_micros("ts") * F.lit(1000).cast("long"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (lazy parquet scan).

    ``events`` is normalized through :func:`normalize_events` so every
    consumer sees ``ts_ns: long`` + ``ts: timestamp`` regardless of the
    parquet physical type the testdata was written with.
    """
    if name == "events":
        set_events_read_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events(df)
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


# ---------------------------------------------------------------------------
# Versioned snapshots (time travel): each write lands a NEW immutable
# v=<n> directory and flips a one-line _LATEST pointer — readers pin a
# version (reproducible reruns, audits, the delete-upload investigations
# the reference does with backup tables) or follow the pointer. The
# pointer flip is the only mutation and it is atomic (os.replace), so a
# reader never sees a half-written version: the Delta/Iceberg snapshot
# idea reduced to its filesystem core.
# ---------------------------------------------------------------------------


def write_versioned(df: DataFrame, path: str) -> int:
    """Append a new immutable version under ``path`` and return its id."""
    import os
    import tempfile

    os.makedirs(path, exist_ok=True)
    versions = [
        int(d[2:]) for d in os.listdir(path)
        if d.startswith("v=") and d[2:].isdigit()
    ]
    v = max(versions, default=-1) + 1
    df.write.mode("errorifexists").parquet(f"{path}/v={v}")
    fd, tmp = tempfile.mkstemp(dir=path)
    with os.fdopen(fd, "w") as fh:
        fh.write(str(v))
    os.replace(tmp, os.path.join(path, "_LATEST"))
    return v


def load_versioned(
    spark: SparkSession, path: str, version: "int | None" = None
) -> DataFrame:
    """Read a pinned version (time travel) or the _LATEST pointer."""
    import os

    if version is None:
        with open(os.path.join(path, "_LATEST")) as fh:
            version = int(fh.read().strip())
    return spark.read.parquet(f"{path}/v={int(version)}")

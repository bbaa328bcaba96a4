"""BIDS TSV/JSON sources — SURVEY §2.1 S8.

Reference: events.tsv / participants.tsv / *.json sidecar ingestion
(`/root/reference/python/loris_bids_importer/src/loris_bids_importer/events.py:81-155`,
`loris_bids_utils/src/loris_bids_utils/files/{events,scans,participants}.py`).

BIDS semantics preserved:
- 'n/a' is the BIDS null literal -> nullValue option.
- onset/duration default to 0 when missing (events.py:128-129).
- "additional fields" = columns beyond the BIDS-known set (events.py:
  114-121) — the U3 set-difference surfaced per file.
- the source file identifies the subject/task -> extracted from
  _metadata.file_path (the reference threads filenames through the
  pipeline the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KNOWN_EVENT_FIELDS = ("onset", "duration", "trial_type", "response_time", "sample")


def read_events_tsv(spark: SparkSession, path_glob: str) -> DataFrame:
    """events.tsv source: tab-separated, 'n/a' nulls, onset/duration
    coalesced to 0, subject extracted from the filename."""
    df = (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("nullValue", "n/a")
        .option("inferSchema", "false")
        .csv(path_glob)
        .withColumn("__file", F.col("_metadata.file_path"))
    )
    return df.select(
        F.regexp_extract("__file", r"(sub-[0-9A-Za-z]+)", 1).alias("subject"),
        F.coalesce(F.col("onset").cast("double"), F.lit(0.0)).alias("onset"),
        F.coalesce(F.col("duration").cast("double"), F.lit(0.0)).alias("duration"),
        *[
            F.col(c)
            for c in df.columns
            if c not in ("onset", "duration", "__file")
        ],
    )


def read_participants_tsv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("nullValue", "n/a")
        .csv(path)
    )


def read_sidecar_json(spark: SparkSession, path_glob: str) -> DataFrame:
    """JSON sidecars as one row per file with the parameter map — the EAV
    feed (`imaging.py:531-553` flattens sidecars into parameter_file)."""
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(path_glob)
        .withColumn("__file", F.col("_metadata.file_path"))
    )
    return raw.select(
        F.regexp_extract("__file", r"(sub-[0-9A-Za-z]+)", 1).alias("subject"),
        F.from_json(
            "value", "map<string,string>"
        ).alias("params"),
    )

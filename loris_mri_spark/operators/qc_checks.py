"""QC check engine — SURVEY §2.2 F4/F5/F6 composed (mri_protocol_checks;
`python/lib/imaging.py:706-809`, `database_lib/mri_protocol_checks.py`).

Every "header" (parameter) of a file is validated against a small check
table carrying (ValidMin, ValidMax, ValidRegex, Severity). Failures become
violation-log rows (`imaging.py:303-342` mri_violations_log), not errors —
the pipeline keeps going.

Physical strategy: the check table is tiny -> broadcast join against the
long-format (key, header, value) table; all predicates evaluate JVM-side.
One scan, no shuffle (the violation sink append is shuffle-free).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loris_mri_spark.functions.predicates import in_range


def melt_headers(
    df: DataFrame,
    key_cols: Sequence[str],
    numeric_headers: Sequence[str] = (),
    string_headers: Sequence[str] = (),
) -> DataFrame:
    """Wide table -> long (key, header, value_num, value_str) — the EAV shape
    the check engine consumes (mirrors parameter_file rows keyed on header
    name, FIXTURES.md parameter_file)."""
    # ONE explode over per-header structs, NOT a union of per-header
    # projections: Spark re-executes the source subplan once per union
    # branch, so the union form costs H scans of the wide table for H
    # headers — the r8 plan-audit class pipeline_non_minc_insertion's
    # EAV fan-out was also moved off.
    entries = [
        F.struct(
            F.lit(h).alias("header"),
            F.col(h).cast("double").alias("value_num"),
            F.lit(None).cast("string").alias("value_str"),
        )
        for h in numeric_headers
    ] + [
        F.struct(
            F.lit(h).alias("header"),
            F.lit(None).cast("double").alias("value_num"),
            F.col(h).cast("string").alias("value_str"),
        )
        for h in string_headers
    ]
    return df.select(*key_cols, F.explode(F.array(*entries)).alias("__m")).select(
        *key_cols, "__m.header", "__m.value_num", "__m.value_str"
    )


def run_qc_checks(
    values: DataFrame,
    checks: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Join long-format values against the check table and return one row per
    FAILED check: (key_cols..., header, value_num, value_str, severity).

    ``checks`` columns: header, valid_min, valid_max, valid_regex, severity.
    Failure semantics (imaging.py:1261-1299 + 706-809):
      - range restriction set and value outside it (or NULL) -> fail
      - regex set and string value does not match (or NULL)  -> fail
    """
    v = values.alias("v")
    c = F.broadcast(checks).alias("c")
    joined = v.join(c, F.col("v.header") == F.col("c.header"), "inner")

    range_ok = in_range(
        F.col("v.value_num"), F.col("c.valid_min"), F.col("c.valid_max")
    )
    regex_ok = (
        F.col("c.valid_regex").isNull()
        | (
            F.col("v.value_str").isNotNull()
            & F.regexp_like(F.col("v.value_str"), F.col("c.valid_regex"))
        )
    )
    failed = joined.filter(~(range_ok & regex_ok))
    return failed.select(
        *[F.col(f"v.{k}") for k in key_cols],
        F.col("v.header").alias("header"),
        F.col("v.value_num").alias("value_num"),
        F.col("v.value_str").alias("value_str"),
        F.col("c.severity").alias("severity"),
    )

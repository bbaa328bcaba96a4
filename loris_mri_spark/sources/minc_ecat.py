"""MINC (S5) and ECAT PET (S6) readers — gated external-tool sources.

MINC is NetCDF/HDF5 (`uploadNeuroDB/NeuroDB/MincUtilities.pm:54-129` shells
out to `mincheader`/`mincinfo`); ECAT `.v` is a proprietary-era PET
container (`uploadNeuroDB/NeuroDB/HRRT.pm:125-343`). Neither has a
stdlib-parseable layout worth reimplementing, and this runtime ships no
minc-tools/h5py — so both sources are the EXTERNAL-BINARY pattern
(operators/external.run_external): files fan out to the site's installed
tool per task, stdout maps back to rows. Without the tool present the
source degrades to a classification row (is_readable = false), never a
job failure — the same violation-row discipline as the QC engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loris_mri_spark.operators.external import run_external


def read_minc_headers(
    spark: SparkSession, path_glob: str, mincheader_cmd: str = "mincheader"
) -> DataFrame:
    """S5: per-file `mincheader` dump -> (path, exit_code, header_text).
    On clusters with minc-tools installed exit_code=0 rows carry the
    header; elsewhere every row reports the missing tool (exit_code=-1)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mnc")
        .option("recursiveFileLookup", "true")
        .load(path_glob)
        .select("path", "content")
    )
    out = run_external(
        files,
        [mincheader_cmd, "{input}"],
        content_col="content",
        passthrough_cols=["path"],
        suffix=".mnc",
    )
    return out.select(
        "path",
        "exit_code",
        (F.col("exit_code") == 0).alias("is_readable"),
        F.col("stdout").alias("header_text"),
    )


def read_ecat_main_headers(
    spark: SparkSession, path_glob: str, dump_cmd: str = "ecat_dump"
) -> DataFrame:
    """S6: ECAT `.v` main-header dump via the site's tool (`HRRT.pm:125-343`
    parses the same surface). Degrades to is_readable=false rows when the
    tool is absent."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.v")
        .option("recursiveFileLookup", "true")
        .load(path_glob)
        .select("path", "content")
    )
    out = run_external(
        files,
        [dump_cmd, "{input}"],
        content_col="content",
        passthrough_cols=["path"],
        suffix=".v",
    )
    return out.select(
        "path",
        "exit_code",
        (F.col("exit_code") == 0).alias("is_readable"),
        F.col("stdout").alias("header_text"),
    )

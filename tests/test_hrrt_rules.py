"""HRRT file-classification rules (HRRT.pm grep_ecat_files_only +
NonEcatFileCount), exercised on names the committed fixture dir does not
contain — in particular the advertised-but-otherwise-unexercised BIC
test* skip and the case-insensitive .V selection/minting pair."""

from __future__ import annotations

from pyspark.sql import functions as F

from loris_mri_spark.workload.pipeline import (
    hrrt_is_ecat,
    hrrt_is_v,
    hrrt_mint_minc,
)


def test_hrrt_classification_and_minting(spark):
    df = spark.createDataFrame(
        [
            ("sub001_fdg.v",),
            ("SUB002.V",),  # selection is case-insensitive
            ("test_calibration.v",),  # BIC test*: neither ECAT nor other
            ("sidecar.m",),
            ("README.txt",),
        ],
        "file string",
    )
    rows = df.select(
        "file",
        hrrt_is_ecat().alias("ecat"),
        (~hrrt_is_v()).alias("other"),
        F.when(hrrt_is_ecat(), hrrt_mint_minc()).alias("minc"),
    ).collect()
    got = {r["file"]: (r["ecat"], r["other"], r["minc"]) for r in rows}
    assert got["sub001_fdg.v"] == (True, False, "sub001_fdg.mnc")
    # the .V file must be selected AND minted (a case-sensitive strip
    # would leave 'SUB002.V.mnc'-less, i.e. the raw name, and desync the
    # oracle's n[:-2] mint)
    assert got["SUB002.V"] == (True, False, "SUB002.mnc")
    # BIC test*: skipped as an ECAT, NOT counted as a non-ECAT file
    assert got["test_calibration.v"] == (False, False, None)
    assert got["sidecar.m"] == (False, True, None)
    assert got["README.txt"] == (False, True, None)

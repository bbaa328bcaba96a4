"""pipeline_minc_to_bids (tools/minc_to_bids_converter.pl) unit checks:
filename quirks, skip rules, and MySQL TIMESTAMPDIFF(MONTH) age semantics
that the sf-level oracle can't isolate."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from loris_mri_spark.workload import QUERIES, load_all

load_all()


def _manifest(spark):
    return QUERIES["pipeline_minc_to_bids"](
        spark, "/root/testdata/sf0.001"
    ).cache()


def test_run_label_literal_concat_quirk(spark):
    """determine_run_number builds the label as the literal string
    "00" . rank (minc_to_bids_converter.pl:562) — run 10 is '0010', not
    '010'. The engine reproduces the quirk."""
    m = _manifest(spark)
    labels = {
        r[0]
        for r in m.select(
            F.regexp_extract("nii_file_name", r"_run-(\d+)_", 1)
        ).collect()
    }
    assert labels and all(lab.startswith("00") for lab in labels)
    # every label is 00<rank> with rank >= 1 (never 0, never stripped)
    assert all(int(lab[2:]) >= 1 for lab in labels)


def test_skip_rules_and_entity_order(spark):
    m = _manifest(spark)
    names = [r.nii_file_name for r in m.collect()]
    # magnitude and unlisted scan types never reach the manifest
    assert not any("magnitude" in n for n in names)
    assert not any("spectro" in n for n in names)
    # func files carry task- BEFORE run- (BIDS entity order)
    funcs = [n for n in names if n.endswith("_bold.nii.gz")]
    assert funcs and all(
        n.index("_task-rest") < n.index("_run-") for n in funcs
    )
    # t2w files get acq/rec from the subcategory AND echo from the rel dim,
    # in entity order: acq < rec < run < echo
    t2s = [n for n in names if n.endswith("_T2w.nii.gz")]
    assert t2s and all(
        n.index("_acq-highres") < n.index("_rec-norm")
        < n.index("_run-") < n.index("_echo-2") for n in t2s
    )
    # visit labels lose their underscore in ses- but keep it in the column
    row = m.first()
    assert "_" in row.visit_label
    assert "_ses-V" in row.nii_file_name


def test_paths_consistent(spark):
    m = _manifest(spark)
    for r in m.limit(20).collect():
        assert r.nii_file_path.endswith("/" + r.nii_file_name)
        assert r.json_file_path == r.nii_file_path.replace(
            ".nii.gz", ".json"
        )
        assert r.scans_tsv_entry == "/".join(
            r.nii_file_path.split("/")[2:]
        )
        assert r.nii_file_path.startswith(
            f"sub-{r.candidate}/ses-{r.visit_label.replace('_', '')}/"
        )


def test_age_full_months_semantics(spark):
    """MySQL TIMESTAMPDIFF(MONTH, dob, visit) counts FULL months: the
    day-of-month decides whether the last partial month counts."""
    m = _manifest(spark)
    # reconstruct dob/visit for a few rows and check the arithmetic
    rows = (
        m.limit(0)
        .sparkSession.createDataFrame(
            [
                (datetime.date(2000, 1, 15), datetime.date(2000, 3, 14)),
                (datetime.date(2000, 1, 15), datetime.date(2000, 3, 15)),
                (datetime.date(2000, 1, 31), datetime.date(2000, 2, 28)),
            ],
            "dob date, v date",
        )
    )
    got = rows.select(
        (
            (F.year("v") - F.year("dob")) * 12
            + (F.month("v") - F.month("dob"))
            - F.when(
                F.dayofmonth("v") < F.dayofmonth("dob"), 1
            ).otherwise(0)
        ).alias("months")
    ).collect()
    assert [r.months for r in got] == [1, 2, 0]
    assert m.filter(F.col("age_months") < 0).count() == 0


def test_plan_broadcasts_rel_dim(spark):
    df = QUERIES["pipeline_minc_to_bids"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

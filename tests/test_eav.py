"""operators/eav.py dwi_bval_bvec: the create_nifti_bval_bvec.pl +
MRI.pm:1499-1562 cleanup semantics on hand-built EAV rows."""

from __future__ import annotations


def test_dwi_bval_bvec_cleanup_and_gating(spark):
    from loris_mri_spark.operators.eav import dwi_bval_bvec

    rows = [
        # file 1: full DWI parameter set, with the artifacts the Perl
        # cleanup targets ('.,' pairs, trailing '.', wrapping quotes)
        (1, "acquisition:bvalues", "0., 1000., 1000."),
        (1, "acquisition:direction_x", '"0.99,-0.01,0.5"'),
        (1, "acquisition:direction_y", "0.1 0.2 0.3"),
        (1, "acquisition:direction_z", "0.0 0.0 1.0"),
        # file 2: bvalues only -> bval written, bvec NULL
        (2, "acquisition:bvalues", "0 5 10"),
        (2, "acquisition:direction_x", "1 0 0"),
        (2, "acquisition:direction_y", "0 1 0"),
        # file 3: no bvalues -> excluded entirely
        (3, "acquisition:direction_x", "1 0 0"),
        # unrelated parameter rides through the filter
        (1, "acquisition:echo_time", "0.03"),
    ]
    eav = spark.createDataFrame(
        rows, "file_id int, name string, value string"
    )
    got = {r["file_id"]: r for r in dwi_bval_bvec(eav).collect()}
    assert set(got) == {1, 2}
    # '.,' pairs removed, trailing '.' stripped
    assert got[1]["bval_content"] == "0 1000 1000"
    # quotes and commas removed; x/y/z newline-joined
    assert got[1]["bvec_content"] == "0.99-0.010.5\n0.1 0.2 0.3\n0.0 0.0 1.0\n"
    assert got[2]["bval_content"] == "0 5 10"
    assert got[2]["bvec_content"] is None

"""Merged-series splitting (operators/series_split.py) vs a direct Python
replay of the reference walk (splitMergedSeries.pl:355-407).

The operator reduces the sequential (dir, slicethick, group) state machine
to a windowed closed form; these tests replay the original Perl loop
verbatim in Python and assert identical grouping on adversarial
sequences — zigzags (toggle chains), zero steps, tiny/huge steps, header
vs derived thickness — plus property-style random walks.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from loris_mri_spark.operators.series_split import (
    mint_sub_series_numbers,
    slice_break_segments,
    split_spec_rows,
)

SCHEMA = (
    "study_uid long, series_num long, te double, image_num long, "
    "slice_pos double, hdr_thick double"
)


def perl_walk(positions, hdr_thick=None):
    """split_on_slicepos_breaks verbatim (splitMergedSeries.pl:355-407):
    returns the 0-based group index per slice, in input order."""
    if len(positions) < 2:
        return [0] * len(positions)
    thick = hdr_thick if (hdr_thick is not None and hdr_thick > 0) else None
    groups = [0]
    group = 0
    direction = None
    for i in range(1, len(positions)):
        delta = positions[i] - positions[i - 1]
        if direction is None and delta:
            direction = delta / abs(delta)
        if thick is None and delta:
            thick = abs(delta)
        if (
            abs(delta) < 1e-5
            or (thick is not None and abs(delta) < 0.1 * thick)
            or (thick is not None and abs(delta) > 1.5 * thick)
            or (direction is not None and direction > 0 and delta < 0)
            or (direction is not None and direction < 0 and delta > 0)
        ):
            group += 1
            direction = None
        groups.append(group)
    return groups


CASES = [
    # monotone ramp, no breaks
    ([0.0, 2.5, 5.0, 7.5], 2.5),
    # sub-acquisition reset (big negative jump)
    ([0.0, 2.5, 5.0, 0.0, 2.5, 5.0], 2.5),
    # pure direction flip at the crest (rule d only)
    ([0.0, 2.5, 5.0, 2.5, 0.0], 2.5),
    # zigzag: toggle chain parity
    ([0.0, 2.5, 0.0, 2.5, 0.0, 2.5], 2.5),
    # duplicate slice position (rule a)
    ([0.0, 2.5, 2.5, 5.0], 2.5),
    # tiny step (rule b) and huge step (rule c)
    ([0.0, 2.5, 2.6, 5.1, 50.0], 2.5),
    # derived thickness (no header): first delta defines the step
    ([0.0, 3.0, 6.0, 9.0, 10.0], None),
    # single slice
    ([4.2], 2.5),
    # two slices, zero delta
    ([1.0, 1.0], None),
    # alternating around zero with derived thickness
    ([0.0, 1.0, 0.0, 1.0, 2.0, 3.0], None),
]


@pytest.mark.parametrize("positions,hdr", CASES)
def test_matches_perl_walk(spark, positions, hdr):
    rows = [
        Row(
            study_uid=1,
            series_num=1,
            te=25.0,
            image_num=i + 1,
            slice_pos=float(p),
            hdr_thick=hdr,
        )
        for i, p in enumerate(positions)
    ]
    out = (
        slice_break_segments(spark.createDataFrame(rows, schema=SCHEMA))
        .orderBy("image_num")
        .select("sub_series")
        .collect()
    )
    assert [r.sub_series for r in out] == perl_walk(positions, hdr)


def test_matches_perl_walk_random(spark):
    """128 random walks x 2 thickness modes in ONE DataFrame pass."""
    rng = random.Random(19)
    rows, expected = [], {}
    for g in range(128):
        n = rng.randrange(1, 12)
        pos, cur = [], 0.0
        for _ in range(n):
            step = rng.choice(
                [0.0, 2.5, -2.5, 0.1, 25.0, 2.4, -0.1, 3.6, -3.7]
            )
            cur += step
            pos.append(round(cur, 6))
        hdr = 2.5 if g % 2 == 0 else None
        expected[g] = perl_walk(pos, hdr)
        rows += [
            Row(
                study_uid=g,
                series_num=1,
                te=25.0,
                image_num=i + 1,
                slice_pos=p,
                hdr_thick=hdr,
            )
            for i, p in enumerate(pos)
        ]
    out = (
        slice_break_segments(spark.createDataFrame(rows, schema=SCHEMA))
        .orderBy("study_uid", "image_num")
        .select("study_uid", "sub_series")
        .collect()
    )
    got = {}
    for r in out:
        got.setdefault(r.study_uid, []).append(r.sub_series)
    assert got == expected


def _seg_fixture(spark):
    rows = []
    # study 1 / series 1: two TEs, echo UNDEF, each TE splits in two
    for te in (25.0, 37.5):
        for i, p in enumerate([0.0, 2.5, 5.0, 0.0, 2.5]):
            rows.append(
                Row(
                    study_uid=1,
                    series_num=1,
                    te=te,
                    image_num=int(te) * 100 + i,
                    slice_pos=p,
                    hdr_thick=2.5,
                    echo_undef=True,
                    seq_name="ep2d",
                )
            )
    # study 1 / series 2: single TE (no backfill), echo known
    for i, p in enumerate([0.0, 2.5, 5.0]):
        rows.append(
            Row(
                study_uid=1,
                series_num=2,
                te=25.0,
                image_num=i,
                slice_pos=p,
                hdr_thick=2.5,
                echo_undef=False,
                seq_name="t1w",
            )
        )
    return slice_break_segments(spark.createDataFrame(rows))


def test_split_spec_echonumber_mode(spark):
    seg = _seg_fixture(spark)
    spec = split_spec_rows(seg, mode="EchoNumber")
    rows = spec.collect()
    backfill = sorted(
        (r.series_num, r.te, r.new_value)
        for r in rows
        if r.image_num is None
    )
    # multi-TE + UNDEF -> one row per TE with its 1-based TE rank
    assert backfill == [(1, 25.0, "1"), (1, 37.5, "2")]
    per_image = [r for r in rows if r.image_num is not None]
    # every image gets 100*sub + echoctr (reference emits sub 0 too)
    assert len(per_image) == 13
    vals = {
        r.new_value
        for r in per_image
        if r.series_num == 1 and 2500 <= r.image_num < 2600
    }
    assert vals == {"1", "101"}  # TE 25 images: sub 0 then sub 1
    assert {
        r.new_value for r in per_image if r.series_num == 2
    } == {"1"}


def test_split_spec_seqname_mode(spark):
    seg = _seg_fixture(spark)
    spec = split_spec_rows(seg, mode="SequenceName")
    per_image = [r for r in spec.collect() if r.image_num is not None]
    # only sub_series > 0 get renamed, letter suffix per sub index
    assert per_image and all(
        r.new_value == "ep2d_a" for r in per_image
    )
    assert len(per_image) == 4  # two TEs x two images in sub-series 1


def test_mint_sub_series_numbers(spark):
    seg = _seg_fixture(spark)
    minted = mint_sub_series_numbers(seg).collect()
    # series 1 has sub-series 1 in need of a number; series 2 does not
    assert [(r.series_num, r.sub_series) for r in minted] == [(1, 1)]
    # per-study max(series)=2, so the first minted number is 3
    assert minted[0].new_series_num == 3


def test_single_exchange_plan(spark):
    from loris_mri_spark.workload import QUERIES, load_all

    load_all()
    df = QUERIES["s19_split_merged_series"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "CartesianProduct" not in plan


def test_apply_header_spec_composition(spark):
    """s19b: specfile rows land back on the header table — backfill fills
    UNDEF echo numbers per TE, renames hit only sub-series > 0 images,
    everything else passes through unchanged."""
    from loris_mri_spark.workload import QUERIES, load_all

    load_all()
    out = QUERIES["s19b_apply_header_spec"](
        spark, "/root/testdata/sf0.001"
    ).cache()
    # no UNDEF echo survives in a multi-TE series of an echo-undef study
    # (every (study,series) in the shaping carries 3 TEs, so backfill
    # covers all UNDEF rows)
    assert out.filter(F.col("echo_number") == "UNDEF").count() == 0
    # echo numbers are the 1-based TE ranks
    assert {r.echo_number for r in out.select("echo_number").distinct().collect()} == {
        "1", "2", "3"
    }
    # renamed sequences keep their base name + letter suffix; base names
    # are seq<series>
    seqs = {r.sequence_name for r in out.select("sequence_name").distinct().collect()}
    assert all(s.startswith("seq") for s in seqs)
    assert any("_" in s for s in seqs) and any("_" not in s for s in seqs)
    renamed = out.filter(F.col("sequence_name").contains("_"))
    assert renamed.count() > 0
    for r in renamed.limit(10).collect():
        base, suffix = r.sequence_name.split("_")
        assert base == f"seq{r.series_num}"
        assert suffix[0] in "abcdefghijklmnopqrstuvwxyz"


def test_matches_perl_walk_hypothesis(spark):
    """Hypothesis-driven walk comparison: arbitrary step sequences from a
    grammar of break-triggering magnitudes (zero, in-range, tiny, huge,
    sign flips), both thickness modes, checked against the verbatim Perl
    replay in one batched DataFrame pass."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    step = st.sampled_from(
        [0.0, 2.5, -2.5, 2.4, -2.6, 0.2, -0.2, 30.0, -30.0, 1e-6, 3.7]
    )

    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        walks=st.lists(
            st.tuples(
                st.lists(step, min_size=0, max_size=14),
                st.sampled_from([2.5, None]),
            ),
            min_size=1,
            max_size=12,
        )
    )
    def check(walks):
        rows, expected = [], {}
        for g, (steps, hdr) in enumerate(walks):
            pos, cur = [0.0], 0.0
            for s in steps:
                cur = round(cur + s, 9)
                pos.append(cur)
            expected[g] = perl_walk(pos, hdr)
            rows += [
                Row(
                    study_uid=g,
                    series_num=1,
                    te=25.0,
                    image_num=i + 1,
                    slice_pos=p,
                    hdr_thick=hdr,
                )
                for i, p in enumerate(pos)
            ]
        out = (
            slice_break_segments(
                spark.createDataFrame(rows, schema=SCHEMA)
            )
            .orderBy("study_uid", "image_num")
            .select("study_uid", "sub_series")
            .collect()
        )
        got = {}
        for r in out:
            got.setdefault(r.study_uid, []).append(r.sub_series)
        assert got == expected

    check()

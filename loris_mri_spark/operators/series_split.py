r"""Merged-series splitting (tools/splitMergedSeries.pl) as window functions.

The reference walks each (StudyInstanceUID, SeriesNumber, EchoTime) image
list in image-number order carrying three pieces of state
(splitMergedSeries.pl:355-407 ``split_on_slicepos_breaks``):

- ``slicethick`` — the expected inter-slice step: the DICOM header value
  when it is a positive number, otherwise the first nonzero position delta
  seen in the walk (set once, never reset);
- ``dir`` — the slice-position movement direction, the sign of the first
  nonzero delta since the last break (reset to undef on every break);
- ``group`` — the sub-series counter, incremented on every break.

A row *breaks* (starts a new sub-acquisition) when the position delta is
(a) effectively zero (< 1e-5), (b) much smaller than the expected step
(< 0.1x), (c) much larger (> 1.5x), or (d) opposite in sign to ``dir``.

That walk looks inherently sequential, but it collapses to a closed form:

    break(i) = pw(i) OR (rawflip(i) AND NOT break(i-1))

where ``pw`` is the pointwise magnitude test (a|b|c — ``slicethick`` is a
running ``first nonzero |delta|``, windowable) and ``rawflip(i)`` is
``sign(delta_i) == -sign(delta_{i-1}) != 0``: when row i-1 did NOT break,
``dir`` entering row i is exactly ``sign(delta_{i-1})`` (a flip at i-1
would have broken), and when row i-1 DID break, ``dir`` is undef so rule
(d) cannot fire at i.  Classify each delta row:

- ``pw``                      -> break is forced TRUE,
- ``NOT pw AND NOT rawflip``  -> break is forced FALSE,
- ``NOT pw AND rawflip``      -> break toggles the previous row's break.

Runs of toggle rows alternate, so with ``lf`` = the last forced row at or
before i and ``pw(lf)`` its forced value:

    break(i) = pw(lf) XOR ((i - lf) % 2 == 1)

— pure window expressions: ONE hash shuffle on (study, series), one local
sort, whole-stage codegen end to end, no Python and no iteration.  The
same shape survives a 100 TB DICOM inventory because state never leaves
the (study, series, echo_time) partition and every window shares the one
exchange (the echo-rank window partitions on a prefix of the segment
window's keys, which hash-partitioning already satisfies).

The correctness oracle deliberately does NOT reuse this closed form: the
DuckDB side replays the reference's sequential walk verbatim as a
recursive CTE (workload/ingest.py), so the algebraic reduction is checked
against an independent implementation of the original loop.

Known reference divergences (documented, not replicated):

- the Perl header check ``$slicethick = undef if ($slicethick !=
  /^\d+$/)`` compares the thickness against a regex match on ``$_`` — a
  bug that almost always discards the header value.  The engine treats a
  header thickness as valid iff it is a positive finite number.
- echo ranks: the reference's ``my @TE = sort keys ...``
  (splitMergedSeries.pl:242) sorts EchoTime values LEXICOGRAPHICALLY, so
  for TEs {9, 25} it assigns echo 1 to TE 25 ('25' lt '9').  The engine
  (and its oracle) rank TEs numerically — the physically meaningful
  order, and the one the multi-echo BIDS convention expects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def slice_break_segments(
    df: DataFrame,
    study_col: str = "study_uid",
    series_col: str = "series_num",
    te_col: str = "te",
    image_col: str = "image_num",
    pos_col: str = "slice_pos",
    hdr_thick_col: str = "hdr_thick",
) -> DataFrame:
    """Add ``sub_series`` (0-based sub-acquisition index) per image row.

    Exact splitMergedSeries.pl:355-407 semantics via the closed form in
    the module docstring.  Input rows need a unique ``image_col`` within
    each (study, series, te) group; ``pos_col``/``hdr_thick_col`` must be
    DOUBLE (``hdr_thick_col`` may be null — the walk then derives the
    expected step from the first nonzero delta).
    """
    keys = [study_col, series_col, te_col]
    w = Window.partitionBy(*keys).orderBy(image_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    pos = F.col(pos_col)
    delta = pos - F.lag(pos).over(w)
    # first-slice rows (delta null) never break; every window below keeps
    # them null/zero through the final coalesce.
    hdr = F.col(hdr_thick_col)
    valid_hdr = F.when(hdr.isNotNull() & (hdr > 0) & ~F.isnan(hdr), hdr)
    df = df.withColumn("_delta", delta).withColumn("_hdr", valid_hdr)

    d = F.col("_delta")
    # slicethick entering row i's break test: header if valid, else the
    # first nonzero |delta| at an index <= i (the Perl code sets it just
    # BEFORE the test, so the defining row compares |d| against |d| and
    # rules b/c cannot fire there — the formula reproduces that).
    run_thick = F.first(
        F.when(d != 0, F.abs(d)), ignorenulls=True
    ).over(wrun)
    thick = F.coalesce(F.col("_hdr"), run_thick)

    pw = (
        (F.abs(d) < 1e-5)
        | F.coalesce(F.abs(d) < 0.1 * thick, F.lit(False))
        | F.coalesce(F.abs(d) > 1.5 * thick, F.lit(False))
    )
    sign = F.signum(d)
    rawflip = F.coalesce(
        sign * F.lag(sign).over(w) == -1, F.lit(False)
    )
    df = (
        df.withColumn("_pw", F.coalesce(pw, F.lit(False)))
        .withColumn("_forced", F.col("_pw") | ~rawflip)
        .withColumn("_idx", F.row_number().over(w))
    )
    lf = F.max(F.when(F.col("_forced"), F.col("_idx"))).over(wrun)
    lf_val = F.last(
        F.when(F.col("_forced"), F.col("_pw")), ignorenulls=True
    ).over(wrun)
    brk = F.when(
        F.col("_delta").isNull(), F.lit(False)  # first slice of the group
    ).otherwise(lf_val != ((F.col("_idx") - lf) % 2 == 1))
    # XOR: break = lf_val XOR parity  <=>  lf_val != parity
    df = df.withColumn("_brk", brk)
    sub = F.sum(F.col("_brk").cast("int")).over(wrun)
    return df.withColumn("sub_series", sub.cast("int")).drop(
        "_delta", "_hdr", "_pw", "_forced", "_idx", "_brk"
    )


def split_spec_rows(
    segmented: DataFrame,
    mode: str = "EchoNumber",
    study_col: str = "study_uid",
    series_col: str = "series_num",
    te_col: str = "te",
    image_col: str = "image_num",
    echo_undef_col: str = "echo_undef",
) -> DataFrame:
    """Emit updateHeadersBatch.pl spec rows (splitMergedSeries.pl:228-305).

    Input: the output of :func:`slice_break_segments` (``sub_series``
    present); ``SequenceName`` mode additionally needs a ``seq_name``
    column. Letter suffixes follow chr(96 + sub) — past 26 sub-series the
    reference's ``('a'..'z')[sub-1]`` yields undef (a warning + empty
    string in Perl); the engine keeps walking the codepoints instead.

    Two row families, both keyed the way the reference keys its specfile:

    - echo BACKFILL (one row per (series, TE)): when a series has >1
      distinct EchoTime and the echo number is UNDEF, assign the 1-based
      rank of the TE (``EchoNumber = echoctr``); keyed by EchoTime,
      ``image_num`` null.
    - sub-series split (one row per image): mode ``EchoNumber`` assigns
      ``100 * sub_series + echoctr`` to EVERY image (the reference's
      new_sub_series emits a defined value for sub-series 0 too in this
      mode, :465-470); mode ``SequenceName`` appends ``_a``/``_b``/... and
      only fires for sub_series > 0 (:460-463).  The reference's default
      SeriesNumber mode mints new numbers by a sequential ``$value++
      while taken`` scan in Perl HASH ORDER — nondeterministic in the
      reference itself — so the engine's deterministic refinement is the
      A2 max-plus-rank mint, exposed separately as
      :func:`mint_sub_series_numbers`.

    Single-pass plan: the backfill row for a (series, TE) is one-per-group
    by construction, so it is emitted from that group's FIRST image row —
    both spec families come out of one ``array`` + ``inline`` projection
    over the segmented rows (no union re-scan, no distinct aggregate; the
    only exchange is the one the segment windows already made).
    """
    wser = Window.partitionBy(study_col, series_col)
    wgrp = Window.partitionBy(study_col, series_col, te_col)
    echoctr = F.dense_rank().over(wser.orderBy(te_col))
    n_te = F.size(F.collect_set(te_col).over(wser))
    first_img = F.col(image_col) == F.min(image_col).over(wgrp)
    seg = segmented.withColumn("_echoctr", echoctr).withColumn(
        "_n_te", n_te
    )

    def spec(te: Column, image: Column, field: Column | str, value: Column):
        return F.struct(
            te.alias("te"),
            image.alias("image_num"),
            F.lit(field).alias("target_field"),
            value.cast("string").alias("new_value"),
        )

    backfill = F.when(
        first_img & (F.col("_n_te") > 1) & F.col(echo_undef_col),
        spec(
            F.col(te_col).cast("double"),
            F.lit(None).cast("long"),
            "EchoNumber",
            F.col("_echoctr"),
        ),
    )
    if mode == "EchoNumber":
        per_image = spec(
            F.lit(None).cast("double"),
            F.col(image_col).cast("long"),
            "EchoNumber",
            100 * F.col("sub_series") + F.col("_echoctr"),
        )
    elif mode == "SequenceName":
        per_image = F.when(
            F.col("sub_series") > 0,
            spec(
                F.lit(None).cast("double"),
                F.col(image_col).cast("long"),
                "SequenceName",
                F.concat(
                    F.col("seq_name"),
                    F.lit("_"),
                    F.char(F.lit(96) + F.col("sub_series")),
                ),
            ),
        )
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown split mode {mode!r}")

    return seg.select(
        F.col(study_col).alias("study_uid"),
        F.col(series_col).alias("series_num"),
        F.array_compact(F.array(per_image, backfill)).alias("_specs"),
    ).select(
        "study_uid", "series_num", F.inline("_specs")
    )


def mint_sub_series_numbers(
    segmented: DataFrame,
    study_col: str = "study_uid",
    series_col: str = "series_num",
) -> DataFrame:
    """Deterministic SeriesNumber-mode minting (A2 max-plus-rank).

    The reference walks series in Perl hash order and scans ``$value++``
    until unused (splitMergedSeries.pl:444-451) — its own output is
    order-nondeterministic.  The engine's refinement: every (study,
    series, sub_series > 0) needing a fresh number gets ``per-study
    max(series) + dense_rank`` over (series, sub_series) WITHIN the study
    — unique, reproducible, and a per-study window rather than a global
    one, because DICOM SeriesNumber uniqueness is scoped to a
    StudyInstanceUID (the reference's ``%AllSeries`` is "global" only
    because it processes one extracted archive — one study — per run).
    Partitioned by study, this shape holds at any inventory size.
    """
    wstudy = Window.partitionBy(study_col)
    need = (
        segmented.filter(F.col("sub_series") > 0)
        .select(study_col, series_col, "sub_series")
        .distinct()
    )
    smax = segmented.groupBy(study_col).agg(
        F.max(series_col).alias("_smax")
    )
    rank = F.dense_rank().over(
        wstudy.orderBy(series_col, "sub_series")
    )
    return (
        need.join(smax, study_col)
        .withColumn("new_series_num", (F.col("_smax") + rank).cast("long"))
        .drop("_smax")
    )

"""Gate-selectivity sweep — the systematized Finding-7 lesson (r10).

`text_quality_score`'s punct_ratio was inverted in BOTH engines for ten
rounds: hash-exact oracle parity stayed green on a wrong answer because
the oracle carried the same inversion, and nothing asserted the gate was
*reachable*. This sweep closes that class for every quality/threshold
gate in the registered workload: each boolean gate or label expression
must be NON-DEGENERATE on the real sf0.01 corpus — it passes more than
zero rows and (where the data genuinely straddles the threshold) fewer
than all of them. A both-engines inversion that makes a branch
unreachable now fails here even though parity stays green.

Coverage map (the gates the r10 verdict names, plus the label chains):

- text.py: the good/suspect quality rule (composite AND each signal
  column), language-ID argmax chain, LM-quality threshold.
- pipeline.py: corpus-select composition (lang = en, stop_ratio >= 0.06,
  near-dup anti-join), pretraining capstone (lm >= -3.45,
  dup_frac <= 0.8, split assignment), QC severity labels.
- corpusops.py: deterministic/stratified sampling keeps, novelty ratio.
- streaming_ops.py: t15's in-stream gate is the SAME rule set as
  text_quality_score (asserted there — the stream adds no thresholds);
  the event-stream filters (error/purchase) are checked on the batch
  table the streams replay.

Structural selectors (l_linenumber > 1, key % N == 0, ...) are
data-model splits with driver-pinned row counts, not threshold gates —
an inversion there changes counts and parity catches it; they are
deliberately out of scope here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import loris_mri_spark.workload.corpusops  # noqa: F401 - registers queries
import loris_mri_spark.workload.dedup  # noqa: F401
import loris_mri_spark.workload.pipeline  # noqa: F401
import loris_mri_spark.workload.relational  # noqa: F401
import loris_mri_spark.workload.text  # noqa: F401
from loris_mri_spark.catalog import load_table
from loris_mri_spark.workload import QUERIES


@pytest.fixture(scope="module")
def docs_total(spark, sf_dir) -> int:
    return load_table(spark, sf_dir, "documents").count()


def _strict_between(n: int, total: int, label: str) -> None:
    assert 0 < n < total, (
        f"{label}: {n}/{total} — a degenerate gate (0% or 100%) is the"
        " both-engines-inversion signature oracle parity cannot see"
    )


def test_quality_gate_reachable_both_ways(spark, sf_dir, docs_total):
    """THE r10 finding, pinned forever: both quality labels must occur.
    Under the pre-r10 inversion this corpus labeled 500/500 'suspect'."""
    q = QUERIES["text_quality_score"](spark, sf_dir)
    by_label = {r["quality"]: r["n"] for r in
                q.groupBy("quality").agg(F.count("*").alias("n")).collect()}
    assert set(by_label) == {"good", "suspect"}, by_label
    _strict_between(by_label["good"], docs_total, "quality=good")


def test_quality_signal_columns_on_real_corpus(spark, sf_dir, docs_total):
    """On the real corpus: the signals must not SATURATE HIGH — the r10
    inversion read punct_ratio ~1.0 on every document. The testdata is
    punctuation- and digit-free by construction ([a-z ] words only), so
    >0 mass for those two signals is asserted on the crafted corpus
    below, not here."""
    q = QUERIES["text_quality_score"](spark, sf_dir)
    agg = q.agg(
        F.max("punct_ratio").alias("punct_max"),
        F.max("digit_ratio").alias("digit_max"),
        F.sum((F.col("stop_ratio") > 0).cast("long")).alias("stop_pos"),
        F.sum(F.col("stop_ratio").between(0.01, 0.7).cast("long")).alias(
            "stop_ok"
        ),
    ).collect()[0]
    assert agg["punct_max"] < 0.5, "punct_ratio saturated — inverted again?"
    assert agg["digit_max"] < 0.5, "digit_ratio saturated"
    assert 0 < agg["stop_pos"]
    assert 0 < agg["stop_ok"] < docs_total


@pytest.fixture(scope="module")
def crafted_corpus(spark, tmp_path_factory) -> str:
    """A documents.parquet whose rows straddle EVERY quality threshold by
    construction — immune to the real testdata's blandness (it carries no
    punctuation or digits at all, so threshold crossings there can't be
    asserted). The registered queries read any sf_dir, so they run on
    this scratch dir unchanged."""
    d = tmp_path_factory.mktemp("gates")
    rows = [
        # (doc_id, text): label expectation in the test below
        (1, "the quick brown fox jumps over the lazy dog today"),  # good
        (2, "a b"),  # too short -> suspect
        (3, "!!! ??? ,,, ;;; ::: !!! ??? ,,, the fox runs !!!"),  # punct
        (4, "zebra quark fluxion brontide petrichor velleity"),  # no stops
        (5, "the the the the the the the the the the"),  # stop_ratio 1.0
        (6, "count 123 456 789 the numbers run 42 through 9000 now"),  # digits
    ]
    spark.createDataFrame(
        [(i, t, "en", "crafted", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_quality_gate_thresholds_on_crafted_corpus(spark, crafted_corpus):
    """Every threshold crossing exercised with known answers: short docs
    fail the length gate, punctuation-heavy docs fail punct < 0.1,
    stopword-free and all-stopword docs fail the stop_ratio band, digits
    move digit_ratio without tripping punct. An inversion in ANY signal
    flips at least one of these labels."""
    q = QUERIES["text_quality_score"](spark, crafted_corpus)
    got = {r["doc_id"]: r for r in q.collect()}
    assert got[1]["quality"] == "good"
    assert got[2]["quality"] == "suspect"  # n_tokens < 5
    assert got[3]["quality"] == "suspect"  # punct_ratio >= 0.1
    assert got[3]["punct_ratio"] > 0.1
    assert got[4]["quality"] == "suspect"  # stop_ratio < 0.01
    assert got[4]["stop_ratio"] == 0.0
    assert got[5]["quality"] == "suspect"  # stop_ratio > 0.7
    assert got[5]["stop_ratio"] == 1.0
    assert got[6]["quality"] == "good"  # digits are not punctuation
    assert got[6]["digit_ratio"] > 0.1
    assert got[6]["punct_ratio"] == 0.0


def test_language_id_argmax_never_falls_through(spark, sf_dir, docs_total):
    """The reverse-built CASE chain's fallthrough is NULL; if the chain
    inverts (== flipped to !=, or greatest() miswired) rows fall through
    or every hit-count reads 0."""
    lang = QUERIES["text_language_id"](spark, sf_dir)
    agg = lang.agg(
        F.sum(F.col("pred_lang").isNull().cast("long")).alias("nulls"),
        F.sum((F.col("n_hits") > 0).cast("long")).alias("hits_pos"),
    ).collect()[0]
    assert agg["nulls"] == 0
    assert agg["hits_pos"] > docs_total // 2  # real text has stopwords


def test_lm_quality_threshold_straddles(spark, sf_dir, docs_total):
    """pipeline_pretraining_data drops docs with avg_logprob < -3.45;
    the corpus must land on both sides or the stage is a no-op/kill-all."""
    lm = QUERIES["text_lm_quality"](spark, sf_dir)
    n_pass = lm.filter(F.col("avg_logprob") >= -3.45).count()
    _strict_between(n_pass, lm.count(), "avg_logprob>=-3.45")


def test_corpus_select_stages_each_bite(spark, sf_dir, docs_total):
    """pipeline_corpus_select = lang gate ∘ stop_ratio gate ∘ near-dup
    anti-join. The composition AND each threshold stage must bite."""
    sel_n = QUERIES["pipeline_corpus_select"](spark, sf_dir).count()
    _strict_between(sel_n, docs_total, "pipeline_corpus_select")
    q = QUERIES["text_quality_score"](spark, sf_dir)
    _strict_between(
        q.filter(F.col("stop_ratio") >= 0.06).count(),
        docs_total,
        "stop_ratio>=0.06",
    )
    clusters = QUERIES["dedup_minhash_clusters"](spark, sf_dir)
    n_remove = clusters.filter(
        F.col("doc_id") != F.col("component")
    ).count()
    assert n_remove > 0, "near-dup removal set empty at sf0.01"


def test_pretraining_capstone_gates(spark, sf_dir, docs_total):
    """Every split present, every split non-empty, and the gate chain
    dropped SOMETHING (a kill-nothing chain means a gate went inert)."""
    rows = QUERIES["pipeline_pretraining_data"](spark, sf_dir).collect()
    splits = {r["split"]: r["n_docs"] for r in rows}
    assert set(splits) == {"train", "val", "test"}, splits
    assert all(n > 0 for n in splits.values()), splits
    _strict_between(sum(splits.values()), docs_total, "pretraining kept")
    # the boilerplate gate's input signal is real: dup_frac straddles 0.8
    spans = QUERIES["dedup_substring_spans"](spark, sf_dir)
    n_low = spans.filter(F.col("dup_frac") <= 0.8).count()
    _strict_between(n_low, spans.count(), "dup_frac<=0.8 (spanned docs)")


def test_sampling_gates_keep_strict_subsets(spark, sf_dir, docs_total):
    """Salted-md5 ppm gates: a comparison inversion keeps ~everything or
    ~nothing; the configured rates must keep a strict subset."""
    n = QUERIES["sample_stratified_deterministic"](spark, sf_dir).count()
    assert n > 0, "stratified sample kept nothing"
    total_in = load_table(spark, sf_dir, "customer").count()
    assert n < total_in, "stratified sample kept everything"


def test_novelty_ratio_nondegenerate(spark, sf_dir, docs_total):
    """Marginal novelty must produce real mass strictly inside (0, 1):
    an inverted first-owner rule reads ~1.0 (or ~0.0) corpus-wide."""
    nov = QUERIES["corpus_ngram_novelty"](spark, sf_dir)
    agg = nov.agg(
        F.sum((F.col("novelty_r") < 1).cast("long")).alias("lt1"),
        F.sum((F.col("novelty_r") > 0).cast("long")).alias("gt0"),
    ).collect()[0]
    _strict_between(agg["lt1"], docs_total, "novelty<1")
    assert agg["gt0"] > 0


def test_qc_severity_labels_mixed(spark, sf_dir):
    """The QC rulebook must emit more than one severity; a flipped
    comparison collapses the CASE chain onto a single label."""
    qc = QUERIES["qc_checks_violations"](spark, sf_dir)
    sev = {r["severity"] for r in qc.select("severity").distinct().collect()}
    assert len(sev) >= 2, sev


def test_snr_acqorder_status_chain_all_branches(spark, sf_dir):
    """pipeline_snr_acqorder's 4-way CASE (not_supported / inserted /
    unchanged / updated) is the insertion state machine; a flipped
    comparison anywhere collapses a branch to zero. All four must occur
    and the modality gate must keep both sides."""
    df = QUERIES["pipeline_snr_acqorder"](spark, sf_dir)
    by = {r["status"]: r["n"] for r in
          df.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert set(by) == {"not_supported", "inserted", "unchanged", "updated"}
    total = sum(by.values())
    _strict_between(by["not_supported"], total, "snr modality gate")


def test_qc_face_batch_status_both_outcomes(spark, sf_dir):
    """The external-binary QC batch must report both the ran path and
    the violation path (input availability is a real gate on this
    testdata, not a constant)."""
    df = QUERIES["pipeline_qc_face_batch"](spark, sf_dir)
    statuses = {r["status"] for r in df.select("status").distinct().collect()}
    assert "ran" in statuses
    assert any(s.startswith("violation") for s in statuses), statuses


def test_event_stream_filters_nondegenerate(spark, sf_dir):
    """The streaming queries' event_type filters (t2 errors, t6
    purchase flag, funnel stages), checked on the batch table the
    streams replay: each type selects a strict subset."""
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    for etype in ("error", "purchase", "click"):
        _strict_between(
            ev.filter(F.col("event_type") == etype).count(),
            total,
            f"event_type={etype}",
        )


def test_t15_gate_matches_batch_quality_rule(spark, sf_dir, docs_total):
    """t15's in-stream gate is definitionally the text_quality_score
    rule set; assert the BATCH form of that exact gate is non-degenerate
    (the streaming drain re-checks equality via its oracle)."""
    q = QUERIES["text_quality_score"](spark, sf_dir)
    n_good = q.filter(F.col("quality") == "good").count()
    _strict_between(n_good, docs_total, "t15 gate (batch form)")

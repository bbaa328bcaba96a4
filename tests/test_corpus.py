"""Corpus-preparation operators (operators/corpus.py): determinism of the
hash sampling, scale-path vs global-window equivalence for budget
sharding, and brute-force parity for the contamination screen."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from loris_mri_spark.catalog import load_table
from loris_mri_spark.operators.corpus import (
    budget_shards,
    contamination_screen,
    deterministic_sample,
    stratified_sample,
)


def test_deterministic_sample_is_stable_and_partitioning_free(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    a = {r["c_custkey"] for r in deterministic_sample(c, "c_custkey", 100_000).collect()}
    b = {
        r["c_custkey"]
        for r in deterministic_sample(
            c.repartition(13), "c_custkey", 100_000
        ).collect()
    }
    assert a == b  # df.sample cannot promise this across partitionings
    n = c.count()
    assert 0.05 * n < len(a) < 0.15 * n  # ~10% +- hash noise
    # Supersample property: a higher rate strictly contains a lower one
    # (the gate is a fixed per-row bucket compared against the rate).
    big = {
        r["c_custkey"]
        for r in deterministic_sample(c, "c_custkey", 300_000).collect()
    }
    assert a <= big


def test_stratified_sample_rates_apply_per_stratum(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    kept = stratified_sample(
        c, "c_custkey", "c_mktsegment", {"BUILDING": 1_000_000}, 0
    )
    seg = {r["c_mktsegment"] for r in kept.select("c_mktsegment").distinct().collect()}
    assert seg == {"BUILDING"}  # rate 100% for BUILDING, 0 elsewhere
    n_building = c.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert kept.count() == n_building


def test_budget_shards_matches_global_window(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    got = {
        r["doc_id"]: r["shard_id"]
        for r in budget_shards(d, "doc_id", "w", budget=7_000, bucket_width=37).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r["doc_id"]: r["shard"]
        for r in d.withColumn("pre", F.coalesce(F.sum("w").over(w), F.lit(0)))
        .withColumn("shard", F.expr("pre div 7000"))
        .collect()
    }
    assert got == ref
    # Shard ids are contiguous from 0 and weights respect the budget
    # boundary semantics (a shard's exclusive start is below (id+1)*budget).
    assert min(got.values()) == 0


def test_budget_shards_null_id_contract(spark, monkeypatch):
    """Null ids are out of contract: the default path silently filters
    them (documented), LORIS_STRICT_CONTRACTS=1 fails loudly instead —
    the verify-run signal for an upstream null-id regression (r10
    ADVICE: the silent filter shrinks the weight budget with no error)."""
    d = spark.createDataFrame(
        [(1, 10), (None, 99), (2, 20)], "id long, w long"
    )
    monkeypatch.delenv("LORIS_STRICT_CONTRACTS", raising=False)
    rows = budget_shards(d, "id", "w", budget=100).collect()
    assert sorted(r["id"] for r in rows) == [1, 2]  # filtered, shard math clean
    assert all(r["shard_id"] == 0 for r in rows)

    monkeypatch.setenv("LORIS_STRICT_CONTRACTS", "1")
    import pytest

    with pytest.raises(Exception) as exc:
        budget_shards(d, "id", "w", budget=100).collect()
    assert "out of contract" in str(exc.value)
    # strict mode is transparent for in-contract input
    clean = spark.createDataFrame([(1, 10), (2, 20)], "id long, w long")
    assert budget_shards(clean, "id", "w", budget=100).count() == 2


def test_contamination_screen_matches_brute_force(spark, sf_dir):
    from loris_mri_spark.functions.texthash import tokens, word_shingles

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = d.select(
        "doc_id", word_shingles(tokens("text"), 8).alias("s")
    ).filter(F.size("s") > 0)
    ev = sh.filter(F.col("doc_id").isin(45, 98)).select(F.explode("s").alias("s"))
    got = {
        (r["doc_id"], r["n_matched"], r["contaminated"])
        for r in contamination_screen(sh, "doc_id", "s", ev, 2).collect()
    }
    ev_set = {r["s"] for r in ev.distinct().collect()}
    ref = set()
    for r in sh.collect():
        hits = sum(1 for g in r["s"] if g in ev_set)
        if hits >= 1:
            ref.add((r["doc_id"], hits, hits >= 2))
    assert got == ref
    assert any(c for (_, _, c) in got)  # at least one contaminated doc


def test_ngram_novelty_first_owner_semantics(spark, monkeypatch):
    """Novelty unit contract on a 3-doc corpus: the earliest doc owns
    all its grams (novelty 1.0), an exact later copy owns none (0.0),
    a doc with no 3-grams reports 0 grams and NULL ratio."""
    import loris_mri_spark.workload.corpusops as co

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "s"),
            (2, "alpha beta gamma delta", "s"),
            (3, "tiny doc", "s"),
        ],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(co, "load_table", lambda s, d, t: docs)
    out = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_r"])
        for r in co.corpus_ngram_novelty(spark, "unused").collect()
    }
    assert out[1] == (2, 2, 1.0)
    assert out[2] == (2, 0, 0.0)
    assert out[3] == (0, 0, None)


def test_ngram_novelty_matches_bruteforce(spark, monkeypatch):
    """Property (seeded random corpora): corpus_ngram_novelty equals a
    brute-force python replay — per doc, distinct word 3-grams; a gram
    is credited to the LOWEST doc_id containing it."""
    import random

    import loris_mri_spark.workload.corpusops as co

    rng = random.Random(99)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(3):
        docs = [
            (
                i,
                " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(0, 8))
                ),
                "s",
            )
            for i in range(12)
        ]
        df = spark.createDataFrame(
            docs, "doc_id long, text string, source string"
        )
        monkeypatch.setattr(co, "load_table", lambda s, d, t: df)
        got = {
            r["doc_id"]: (r["n_grams"], r["n_novel"])
            for r in co.corpus_ngram_novelty(spark, "unused").collect()
        }
        grams = {
            i: set(
                tuple(t.split()[k:k + 3])
                for k in range(max(len(t.split()) - 2, 0))
            )
            for i, t, _ in docs
        }
        first: dict = {}
        for i in sorted(grams):
            for g in grams[i]:
                first.setdefault(g, i)
        for i in grams:
            n_novel = sum(1 for g in grams[i] if first[g] == i)
            assert got[i] == (len(grams[i]), n_novel), (trial, i)


def test_bpe_fold_matches_replay_on_adversarial_corpus(spark, monkeypatch):
    """The BPE merge fold must equal the left-to-right reference scan on
    the adversarial shapes: l == r chains (odd/even runs), a merge
    immediately followed by another trigger, and single-char words
    contributing no pairs."""
    import loris_mri_spark.workload.text as tx
    from loris_mri_spark.workload.text import _BPE_K, bpe_replay

    docs = spark.createDataFrame(
        [
            (1, "aaaa aaa aa a", "s"),
            (2, "abb aab abab", "s"),
            (3, "aaaa abab", "s"),
            (4, "x", "s"),
        ],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(tx, "load_table", lambda s, d, t: docs)
    got = [
        tuple(r)
        for r in tx.text_bpe_train_merges(spark, "unused")
        .orderBy("rank")
        .collect()
    ]
    wc: dict = {}
    for _, text, _src in docs.collect():
        for w in text.lower().split(" "):
            wc[w] = wc.get(w, 0) + 1
    assert got == bpe_replay(wc, _BPE_K)


def test_bpe_incremental_trainer_matches_replay():
    """The vocab-local incremental trainer (pair counts + inverted index
    maintained across merges) must equal the from-scratch replay on
    adversarial shapes: overlapping runs, pairs whose count decays to
    zero, re-appearing pairs built from merged symbols, exhaustion
    before k, empty words, and randomized corpora."""
    import random

    from loris_mri_spark.operators.bpe import bpe_train_incremental
    from loris_mri_spark.workload.text import bpe_replay

    cases = [
        {"aaaa": 1},
        {"aaaa": 3, "aaa": 2, "aa": 7, "a": 5},
        {"abab": 2, "abb": 1, "aab": 4},
        {"": 3, "x": 2, "xy": 1},  # empty + single-char words
        {"banana": 10, "bandana": 5, "ananas": 2},
    ]
    rng = random.Random(11)
    alpha = "abc"
    for _ in range(20):
        cases.append(
            {
                "".join(
                    rng.choice(alpha) for _ in range(rng.randrange(0, 9))
                ): rng.randrange(1, 6)
                for _ in range(rng.randrange(1, 12))
            }
        )
    for wc in cases:
        for k in (1, 4, 64):  # 64 >> any exhaustion point here
            assert bpe_train_incremental(dict(wc), k) == bpe_replay(
                dict(wc), k
            ), (wc, k)


def test_bpe_vocab_query_matches_replay_at_k256(spark, monkeypatch):
    """End-to-end: the applyInPandas single-task merge phase returns the
    replay's exact merge table, including early exhaustion (the corpus
    fully merges long before k=256)."""
    import loris_mri_spark.workload.text as tx
    from loris_mri_spark.workload.text import _BPE_VOCAB_K, bpe_replay

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "s"),
            (2, "the bat and the cat", "s"),
            (3, "matting batting catting", "s"),
        ],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(tx, "load_table", lambda s, d, t: docs)
    got = [
        tuple(r)
        for r in tx.text_bpe_train_vocab(spark, "unused")
        .orderBy("rank")
        .collect()
    ]
    wc: dict = {}
    for _, text, _src in docs.collect():
        for w in text.lower().split(" "):
            wc[w] = wc.get(w, 0) + 1
    exp = bpe_replay(wc, _BPE_VOCAB_K)
    assert got == exp
    assert 0 < len(exp) < _BPE_VOCAB_K  # exhaustion path exercised


def test_bpe_min_count_prune_parity():
    """The web-scale min-count prune (LORIS_BPE_MIN_COUNT) is train-only:
    with threshold t, merges come from the pruned type table and must
    equal the replay on the same pruned table; the apply side still
    encodes EVERY type — pruned-out words segment exactly as a rank-order
    application of the learned rules (mirroring the oracle builder's
    independent rule-application loop)."""
    from loris_mri_spark.operators.bpe import (
        bpe_encode,
        bpe_train_incremental,
    )
    from loris_mri_spark.workload.text import bpe_replay, bpe_replay_segments

    wc = {"banana": 10, "bandana": 5, "ananas": 1, "nap": 1, "ban": 7}
    for t in (2, 4):
        pruned = {w: c for w, c in wc.items() if c >= t}
        assert 0 < len(pruned) < len(wc)  # threshold actually bites
        got = bpe_train_incremental(dict(pruned), 8)
        assert got == bpe_replay(dict(pruned), 8)
        merges = [(l, r) for _, l, r, _ in got]
        segs = bpe_replay_segments(dict(pruned), 8)
        for w in wc:  # every type encodes, trained or not
            enc = bpe_encode(w, merges)
            assert "".join(enc) == w
            if w in segs:
                assert enc == segs[w]


def test_bpe_encode_reproduces_training_segmentation():
    """The classic BPE invariant the apply-side oracle rests on:
    re-encoding a training word with the learned rules in rank order
    equals the trainer's final segmentation of that word — checked via
    two independent paths (incremental trainer + rank-order encoder vs
    the replay's training-loop state) on adversarial and random corpora."""
    import random

    from loris_mri_spark.operators.bpe import (
        bpe_encode,
        bpe_train_incremental,
    )
    from loris_mri_spark.workload.text import bpe_replay_segments

    cases = [
        {"aaaa": 3, "aaa": 2, "aa": 7, "a": 5},
        {"banana": 10, "bandana": 5, "ananas": 2, "": 1, "x": 4},
        {"abab": 2, "abb": 1, "aab": 4},
    ]
    rng = random.Random(17)
    for _ in range(15):
        cases.append(
            {
                "".join(
                    rng.choice("abc") for _ in range(rng.randrange(0, 9))
                ): rng.randrange(1, 6)
                for _ in range(rng.randrange(1, 12))
            }
        )
    for wc in cases:
        for k in (1, 8, 64):
            merges = [
                (l, r) for _, l, r, _ in bpe_train_incremental(dict(wc), k)
            ]
            segs = bpe_replay_segments(dict(wc), k)
            for w in wc:
                assert bpe_encode(w, merges) == segs[w], (wc, k, w)


def test_bpe_replay_merge_semantics():
    """Reference-scan unit facts: non-overlapping leftmost-first ('aaaa'
    counts the aa pair 3 times but merges to exactly [aa, aa]), and the
    (count DESC, pair ASC) tie order."""
    from loris_mri_spark.workload.text import bpe_replay

    out = bpe_replay({"aaaa": 1}, 2)
    # round 1: pair (a,a) count 3 -> merge; round 2: (aa,aa) count 1
    assert out == [(1, "a", "a", 3), (2, "aa", "aa", 1)]
    # tie: (a,b) and (b,a) both count 2 -> 'a' < 'b' wins
    out2 = bpe_replay({"abab": 1}, 1)
    assert out2 == [(1, "a", "b", 2)]

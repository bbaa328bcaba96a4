"""Dedup-family invariants beyond the oracle parity suite."""

from __future__ import annotations

import pytest

from loris_mri_spark import workload

workload.load_all()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_lsh_equals_brute_force(spark, sf_dir):
    """With 32 hashes / 16 bands and fixed seeds, the verified LSH output
    must coincide with the exact inverted-index jaccard join on the
    testdata (miss probability ~1e-7 per pair at j>=0.8)."""
    brute = {
        (r["i"], r["j"]) for r in
        workload.QUERIES["dedup_ngram_jaccard_pairs"](spark, sf_dir).collect()
    }
    lsh = {
        (r["i"], r["j"]) for r in
        workload.QUERIES["dedup_minhash_lsh_pairs"](spark, sf_dir).collect()
    }
    assert lsh == brute


def test_simhash_pairs_subset_of_high_jaccard(spark, sf_dir):
    """SimHash hamming<=3 pairs should be heavily enriched for genuinely
    similar docs: every pair must share at least one token."""
    pairs = workload.QUERIES["dedup_simhash_pairs"](spark, sf_dir)
    assert pairs.filter("i >= j").count() == 0
    assert pairs.filter("hamming > 3").count() == 0


def test_connected_components_hand_graph(spark):
    from loris_mri_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)], ["i", "j"]
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_winnow_capped_candidates_equal_brute_force(spark, sf_dir):
    """The capped candidate rule (share >= 1 fingerprint with df <= 50)
    must find every pair an UNCAPPED brute-force fingerprint-Jaccard join
    finds on the testdata — the semantic claim behind the oracle's
    candidate rule (pairs whose entire overlap is hot template
    fingerprints are out of contract; none exist here)."""
    from pyspark.sql import functions as F

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.functions.texthash import let, norm_text
    from loris_mri_spark.operators.dedup import jaccard_pairs
    from loris_mri_spark.workload.text import winnow_fingerprint

    capped = {
        (r["i"], r["j"], r["jaccard_r"]) for r in
        workload.QUERIES["dedup_winnow_pairs"](spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    fps = d.select(
        "doc_id",
        F.explode(
            F.array(let(norm_text("text"), winnow_fingerprint))
        ).alias("fp"),
    ).filter(F.size("fp") > 0)
    brute = {
        (r["i"], r["j"], round(r["jaccard"], 4)) for r in
        jaccard_pairs(fps, "doc_id", "fp", threshold=0.5).collect()
    }
    assert capped == brute


def test_winnow_poly_fingerprint_matches_python_reference(spark):
    """Third-implementation check for the cheap-hash winnow variant: the
    Spark expression must equal a from-scratch Python winnow on crafted
    strings, including non-ASCII codepoints (ascii() must read the FULL
    codepoint in both engines) and the short-string empty branches."""
    from pyspark.sql import functions as F

    from loris_mri_spark.functions.texthash import let, norm_text
    from loris_mri_spark.workload.text import (
        _POLY_B,
        _POLY_M1,
        _POLY_M2,
        _POLY_MIX,
        winnow_fingerprint_poly,
    )

    def py_fp(text: str) -> list:
        norm = " ".join(text.split()).lower()  # ASCII fixtures: same norm
        cps = [ord(c) for c in norm]
        if len(cps) < 5:
            return []
        hs = [
            sum(c * b for c, b in zip(cps[i : i + 5], _POLY_B))
            % _POLY_M1
            * _POLY_MIX
            % _POLY_M2
            for i in range(len(cps) - 4)
        ]
        if len(hs) < 4:
            return []
        return sorted({min(hs[i : i + 4]) for i in range(len(hs) - 3)})

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "abcd",  # < 5 chars -> no grams
        "abcdefg",  # 3 grams -> < 4 windows -> empty
        "abcdefgh",  # exactly 4 grams -> 1 window
        "naïve café résumé über alles today",  # non-ASCII
        "aaaaaaaaaaaaaaaa",  # constant grams -> 1 distinct fingerprint
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["fp"])
        for r in df.select(
            "doc_id",
            let(norm_text("text"), winnow_fingerprint_poly).alias("fp"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_fp(t), (i, t)


def test_duplicate_token_spans_merge_semantics(spark):
    """Hand-built corpus: doc 1 and 2 share a 7-token run (three
    overlapping 5-windows -> ONE merged island); doc 3 repeats a
    5-window internally (within-doc duplication counts); doc 4 is
    unique (no row)."""
    from pyspark.sql import functions as F

    from loris_mri_spark.operators.dedup import duplicate_token_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g x y z"),
            (2, "q q q a b c d e f g"),
            (3, "m n o p r m n o p r"),
            (4, "u1 u2 u3 u4 u5 u6 u7"),
        ],
        ["doc_id", "text"],
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    out = {
        (r.i, r.span_start, r.span_end)
        for r in duplicate_token_spans(toks, "doc_id", "t", k=5).collect()
    }
    assert out == {
        (1, 1, 7),   # 'a b c d e f g' = windows 1-3 merged
        (2, 4, 10),  # same run at offset 4
        (3, 1, 10),  # 'm n o p r' twice; windows 1 and 6 both flagged,
                     # plus the wrap windows are unique -> islands [1,5]
                     # and [6,10] merge (adjacent)
    }


def test_jaccard_pairs_prefix_filter_matches_brute_force(spark):
    """The r8 prefix-filtered inverted-index join must stay EXACT: random
    small shingle universes (hot shingles shared by most docs, rare ones
    by few, sizes down to 1) against a pure-Python brute force, at a
    threshold whose t*n products include exact-integer and fractional
    cases — the geometry where a wrong prefix length silently drops
    pairs."""
    import itertools
    import random

    from loris_mri_spark.operators.dedup import jaccard_pairs

    rng = random.Random(83)
    universe = [f"s{i}" for i in range(30)]
    docs = []
    for doc_id in range(40):
        n = rng.choice([1, 2, 4, 5, 8, 10, 15])
        # bias toward low-index shingles -> hot posting lists
        sh = sorted({universe[min(rng.randrange(30), rng.randrange(30))]
                     for _ in range(n)})
        docs.append((doc_id, sh))
    df = spark.createDataFrame(docs, "doc_id long, shingles array<string>")

    for t in (0.5, 0.8):
        got = {
            (r["i"], r["j"], round(r["jaccard"], 9))
            for r in jaccard_pairs(df, "doc_id", "shingles", t).collect()
        }
        expect = set()
        for (i, a), (j, b) in itertools.combinations(docs, 2):
            inter = len(set(a) & set(b))
            jac = inter / (len(a) + len(b) - inter)
            if jac >= t:
                expect.add((i, j, round(jac, 9)))
        assert got == expect, f"threshold {t}"


def test_simhash60_arrow_bit_identical_to_fold(spark, sf_dir):
    """The Arrow simhash variant must equal the Catalyst-fold version
    EXACTLY on every document — integer votes have no combine-order
    surface, so this is equality, not tolerance."""
    from pyspark.sql import functions as F

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.functions.texthash import md5_60
    from loris_mri_spark.operators.dedup import simhash60, simhash60_arrow
    from loris_mri_spark.workload.text import tokens

    d = load_table(spark, sf_dir, "documents")
    token_hashes = F.transform(
        F.array_distinct(tokens("text")), lambda tok: md5_60(tok)
    )
    fold = {
        r["doc_id"]: r["simhash"]
        for r in d.select(
            "doc_id", simhash60(token_hashes).alias("simhash")
        ).collect()
    }
    arrow = {
        r["doc_id"]: r["simhash"]
        for r in simhash60_arrow(
            d.select("doc_id", token_hashes.alias("th")), "doc_id", "th"
        ).collect()
    }
    assert fold == arrow


def test_simhash60_arrow_null_and_empty_rows_match_fold(spark):
    """The r8 ADVICE edge: a NULL hash array must not crash the Arrow
    kernel and must replicate the fold's semantics exactly — null
    array folds to 0 (every per-bit aggregate is null, every `when`
    takes the 0 branch) and an EMPTY array folds to all-60-bits-set
    (vote 0 >= 0 for every bit). Pinned against the fold itself."""
    from pyspark.sql import functions as F

    from loris_mri_spark.operators.dedup import simhash60, simhash60_arrow

    df = spark.createDataFrame(
        [(1, None), (2, []), (3, [7, 9]), (4, None), (5, [1 << 59])],
        "doc_id long, hs array<long>",
    )
    fold = {
        r["doc_id"]: r["simhash"]
        for r in df.select(
            "doc_id", simhash60(F.col("hs")).alias("simhash")
        ).collect()
    }
    arrow = {
        r["doc_id"]: r["simhash"]
        for r in simhash60_arrow(df, "doc_id", "hs").collect()
    }
    assert fold == arrow
    assert fold[1] == 0 and fold[2] == (1 << 60) - 1

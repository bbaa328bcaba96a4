"""Corpus deduplication operators — exact, n-gram Jaccard, MinHash-LSH,
SimHash (the LLM-training-data extension mandated alongside SURVEY §2;
reference analogue: the file-hash duplicate scan in
`/root/reference/python/lib/database_lib/files.py:40-101`).

Design for 100 TB:

- **exact_dedup** — one hash-groupBy; the shuffle key is a 32-hex md5, not
  the document body (project the hash BEFORE the exchange so a 100 TB
  corpus shuffles ~50 bytes/row, not the text).
- **jaccard_pairs** — the exact similarity join done as an INVERTED-INDEX
  join (explode shingles -> equi-join on shingle -> count per pair), never
  a cross join. Cost is sum of squared posting-list lengths — data-bounded,
  AQE's skew-join splits hot shingles. A document-frequency cap
  (``max_shingle_df``) drops degenerate stop-shingles, the standard recall
  trade at corpus scale (disabled by default so oracles stay exact).
- **minhash_lsh_pairs** — the sub-quadratic scale path: k minhashes,
  banded; candidate pairs only form within equal (band, band-hash)
  buckets, then exact-Jaccard verification on just the candidates. With
  b bands of r rows, P(candidate) = 1-(1-j^r)^b — at j>=0.8, r=2, b=16
  the miss probability is ~1e-7, so on real corpora the verified output
  equals the brute-force answer while never materializing all pairs.
- **simhash60 / simhash_pairs** — 60-bit SimHash built from the
  oracle-portable md5_60 token hashes; near-dup pairs found by the
  4-band pigeonhole trick (hamming <= 3 implies at least one equal
  15-bit band), a banded equi-join — again no cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_dedup(
    df: DataFrame,
    fingerprint: Column,
    id_col: str,
) -> DataFrame:
    """Collapse rows sharing a fingerprint: returns (fingerprint,
    keep_id = min id, n_copies). The canonical keep-first hash-groupBy."""
    return (
        df.select(fingerprint.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _pair_jaccard(
    candidates: DataFrame,
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
) -> DataFrame:
    """Attach exact Jaccard similarity to (i, j) candidate pairs by joining
    the shingle arrays back in. Used for verification after blocking; the
    arrays are per-document (bounded), so the per-pair work is linear."""
    a = shingled.select(F.col(id_col).alias("i"), F.col(shingle_col).alias("__sa"))
    b = shingled.select(F.col(id_col).alias("j"), F.col(shingle_col).alias("__sb"))
    return (
        candidates.join(a, "i")
        .join(b, "j")
        .withColumn("__common", F.size(F.array_intersect("__sa", "__sb")))
        .withColumn(
            "jaccard",
            F.col("__common")
            / (F.size("__sa") + F.size("__sb") - F.col("__common")),
        )
        .drop("__sa", "__sb", "__common")
    )


def jaccard_pairs(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via inverted index.

    ``shingled``: one row per document with a DISTINCT shingle array.
    Returns (i, j, jaccard) for i < j with jaccard >= threshold.

    ``max_shingle_df``: optionally drop shingles appearing in more than
    this many documents from the CANDIDATE INDEX (stop-shingle cap —
    bounds the quadratic blowup of hot posting lists at corpus scale).
    Contract when set: the reported jaccard is still EXACT, computed on
    the full original arrays, but candidate recall is bounded by the
    df-filtered prefix index — a pair is surfaced only if it shares an
    indexed rare-prefix shingle of the FILTERED sets. Pairs whose
    full-array jaccard >= t can be missed when their rare-shingle prefix
    overlap (after the df filter) falls below the prefix rule — a broader
    recall trade than stop-shingle-only overlap. Callers needing
    df-insensitive recall use minhash_lsh_pairs.
    """
    # HASHED posting table: candidate generation runs entirely on
    # xxhash64(shingle) int64s — the word-3-gram strings (~25 B each)
    # never enter the df aggregation, the rank sort, or the candidate
    # self-join, cutting those shuffles ~3x (at 100x data the string
    # pipeline was spill-bound — BENCH_SF1.json sf10_heap_retry).
    # LOSSLESS: the hash image of a shingle set can only merge items, so
    # |hash(A) ∩ hash(B)| >= |A ∩ B| and |hash(A ∪ B)| <= |A ∪ B| —
    # J_hash >= J, every qualifying pair survives the hash-level prefix
    # filter, and verification below computes J exactly on the ORIGINAL
    # arrays. array_distinct guards the one edge (two shingles of one
    # doc colliding would otherwise double-count a posting row) as a
    # NARROW per-row op — no dedup shuffle — and per-doc sizes fall out
    # of the same array without a groupBy. No storage pin anywhere
    # (the old string pipeline's localCheckpoint held blocks across
    # runs — exactly what pushed the 100x warm session into a
    # broadcast OOM).
    # Upstream docs anchor (the minhash_lsh_pairs shape, added after the
    # posts anchor below): the shingle pipeline itself — usually an
    # inlined tokenize + n-gram transform, the scan's dominant cost —
    # previously still evaluated THREE times (posts build + both
    # exact-verify array joins). One array-payload exchange computes it
    # once; the null filter is the Finding-5 canonicalization guard.
    docs = (
        shingled.select(
            F.col(id_col).alias("__id"), F.col(shingle_col).alias("__fp")
        )
        .filter(F.col("__id").isNotNull() & F.col("__fp").isNotNull())
        .repartition("__id")
    )
    hset = F.array_distinct(
        F.transform(F.col("__fp"), lambda x: F.xxhash64(x))
    )
    # The explicit repartition is the compute-once anchor: three
    # consumers (df aggregate, rank window, per-doc sizes) embed the
    # identical exchange subplan, so the hashed posting build runs ONCE
    # inside the exchange's map stage and the others read the shuffle
    # files back as ReusedExchange — materialization on disk with zero
    # storage pinning (measured at 100x: without the exchange the
    # pipeline re-evaluates per consumer, 75 s; with it, 47 s).
    posts = (
        docs.select(
            F.col("__id").alias("i"), F.explode(hset).alias("s")
        )
        .repartition("i", "s")
    )
    if max_shingle_df is not None:
        keep = (
            posts.groupBy("s")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_shingle_df)
            .select("s")
        )
        posts = posts.join(keep, "s")

    sizes = posts.groupBy("i").agg(F.count("*").alias("n"))

    # PREFIX FILTERING (All-Pairs / PPJoin family, exact for J >= t):
    # order each document's distinct shingles by GLOBAL rarity (document
    # frequency ascending, shingle value as tie-break) and index only the
    # first p = n - ceil(t*n) + 1 of them. If two docs share NO indexed
    # prefix shingle, every common shingle lies in one doc's suffix, so
    # |overlap| <= ceil(t*n) - 1 < t*n <= t*|union| and J < t strictly —
    # no qualifying pair is lost. Candidate generation therefore joins
    # only the RARE-shingle postings (hot shingles sort into suffixes),
    # which is what keeps the join near-linear as the corpus grows: the
    # un-prefixed inverted-index join measured 23x cost on 10x data at
    # sf1 (BENCH_SF1.json r8) purely from hot posting-list self-joins.
    sdf = posts.groupBy("s").agg(F.count("*").alias("__sdf"))
    w = Window.partitionBy("i").orderBy("__sdf", "s")
    ranked = (
        posts.join(sdf, "s")
        .withColumn("__rk", F.row_number().over(w))
        .join(sizes, "i")
        .filter(
            # epsilon BEFORE the ceil: float t*n can land a hair above the
            # exact product (0.8 * 5 -> 4.0000000000000002, ceil -> 5),
            # which would SHRINK the prefix and silently drop qualifying
            # pairs; erring the other way only over-indexes (extra
            # candidates, same exact output)
            F.col("__rk")
            <= F.col("n")
            - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9))
            + 1
        )
        .select("i", "s", "__rk", "n")
    )

    a = ranked.alias("a")
    b = ranked.select(
        F.col("i").alias("j"),
        F.col("s"),
        F.col("__rk").alias("__rkb"),
        F.col("n").alias("nb"),
    ).alias("b")
    joined = a.join(
        b, (F.col("a.s") == F.col("b.s")) & (F.col("a.i") < F.col("b.j"))
    )
    if max_shingle_df is None:
        # PPJoin-style LENGTH + POSITIONAL filters — exact pruning on the
        # hashed sets before the distinct/verify stages. Both bound the
        # hash-level overlap, and J_hash >= J (merging-only hash image,
        # see above), so a pruned pair has J <= J_hash < t strictly:
        # no qualifying pair is ever lost.
        #  - length: |A∩B| <= min(na,nb), |A∪B| >= max(na,nb), so J >= t
        #    forces min >= t*max (epsilon errs toward keeping).
        #  - positional: a shared prefix shingle at ranks (ra, rb) in the
        #    shared (df, s) total order bounds the overlap by
        #    1 + min(na-ra, nb-rb) (everything else in common lies in
        #    both suffixes); J >= t forces overlap >= t/(1+t)*(na+nb).
        #    Applied per posting row and OR-ed by the distinct below: for
        #    a qualifying pair the FIRST shared prefix shingle's row
        #    always passes, so the pair survives. Measured at sf0.1:
        #    candidate pairs 118,649 -> a fraction, shrinking the
        #    distinct exchange and the two array-verify joins that
        #    dominated the query.
        # Skipped when max_shingle_df is set: the df-capped contract
        # surfaces pairs by FILTERED-prefix overlap but verifies on FULL
        # arrays, and these hash-level bounds could drop a documented
        # capped-contract pair.
        na, nb = F.col("a.n"), F.col("nb")
        overlap_ub = F.lit(1) + F.least(
            na - F.col("a.__rk"), nb - F.col("__rkb")
        )
        min_required = (
            F.lit(threshold) / (1.0 + threshold) * (na + nb) - F.lit(1e-9)
        )
        joined = joined.filter(
            (F.least(na, nb) >= F.lit(threshold) * F.greatest(na, nb) - F.lit(1e-9))
            & (overlap_ub >= min_required)
        )
    cand = (
        joined.select(F.col("a.i").alias("i"), F.col("b.j").alias("j"))
        .distinct()
    )

    # exact verification of the (few) candidates against the FULL
    # ORIGINAL shingle arrays (array_intersect on strings — the hashed
    # table above is candidate-generation only, so a hash collision can
    # never inflate the reported Jaccard): each doc's array ships to its
    # candidate pairs, bounded per-pair work. Reads the SAME anchored
    # docs as the posting build — one shingle evaluation total.
    verify_src = docs.select(
        F.col("__id").alias(id_col), F.col("__fp").alias(shingle_col)
    )
    return _pair_jaccard(cand, verify_src, id_col, shingle_col).filter(
        F.col("jaccard") >= threshold
    )


def capped_jaccard_pairs(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
    max_df: int,
) -> DataFrame:
    """Candidate-then-verify Jaccard join for corpora whose features are
    NOT discriminative (templated text where most shingles/fingerprints
    are shared corpus-wide — exactly where `jaccard_pairs`' inverted index
    goes quadratic on hot posting lists).

    Candidates: pairs sharing at least one feature with document
    frequency <= ``max_df`` (the capped index bounds the self-join volume
    by sum(df^2) over RARE features only). Verify: EXACT Jaccard computed
    from the full feature arrays of candidate pairs via array_intersect —
    the cap never distorts a reported similarity, it only defines the
    candidate rule. Pairs whose entire overlap is hot features are
    deliberately out of contract (they are template-only matches); callers
    wanting them use minhash_lsh_pairs, whose banding is df-insensitive.

    Returns (i, j, jaccard) for i < j with jaccard >= threshold.
    """
    # Explicit-exchange anchors, NOT lazy checkpoints: four consumers
    # (posts probe, df-cap aggregate, fa, fb) embed the identical
    # repartition subplan, so the caller's feature-extraction pipeline
    # runs ONCE inside the exchange's map stage and the others read the
    # shuffle files back as ReusedExchange — materialization on disk,
    # zero heap pinning (lazy localCheckpoint pins blocks across runs in
    # a session; the 100x post-mortem in SCALE.md showed that cascading
    # into broadcast OOMs). The explicit null filter is a semantic no-op
    # (a null id or null array can never form a pair) whose REAL job is
    # canonicalization: without it each consumer pushes its OWN
    # isnotnull() subset below the exchange, the subtrees stop
    # canonicalizing equal, and the pipeline silently evaluates once per
    # consumer (measured: three materializations).
    docs = (
        shingled.select(
            F.col(id_col).alias("__id"), F.col(shingle_col).alias("__fp")
        )
        .filter(F.col("__id").isNotNull() & F.col("__fp").isNotNull())
        .repartition("__id")
    )
    posts = docs.select(F.col("__id").alias("i"), F.explode("__fp").alias("s"))
    keep = (
        posts.groupBy("s")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("s")
    )
    # anchor the capped postings on the candidate join's own key: both
    # self-join sides reuse this one exchange AND the equi-join on s
    # needs no further shuffle
    capped = posts.join(keep, "s").repartition("s")
    a = capped.alias("a")
    b = capped.select(F.col("i").alias("j"), F.col("s")).alias("b")
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.i") < F.col("b.j")))
        .select(F.col("a.i").alias("i"), F.col("b.j").alias("j"))
        .distinct()
    )
    fa = docs.select(F.col("__id").alias("i"), F.col("__fp").alias("fp_a"))
    fb = docs.select(F.col("__id").alias("j"), F.col("__fp").alias("fp_b"))
    return (
        cand.join(fa, "i")
        .join(fb, "j")
        .withColumn("c", F.size(F.array_intersect("fp_a", "fp_b")))
        .withColumn(
            "jaccard",
            F.col("c") / (F.size("fp_a") + F.size("fp_b") - F.col("c")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("i", "j", "jaccard")
    )


def capped_index_coverage(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    max_df: int,
) -> DataFrame:
    """Guard metric for ``capped_jaccard_pairs``' contract: that operator
    deliberately excludes pairs whose ENTIRE overlap is hot (df >
    ``max_df``) features, an assumption pinned empirically at small
    scales. This one-row summary makes a corpus shift that voids the
    assumption observable rather than silent: ``n_docs_uncovered`` counts
    documents with NO rare feature at all — documents that cannot appear
    in any candidate pair. A drift of that number toward n_docs means the
    cap is swallowing real recall and max_df needs retuning (or the
    df-insensitive minhash path should take over).

    Returns one row: (n_docs, n_docs_covered, n_docs_uncovered,
    n_rare_features, n_hot_features); n_docs counts documents with >= 1
    feature. Cost: one feature-extraction pass (the posting table is
    anchored by an explicit exchange — it feeds three aggregates, which
    all embed the identical repartition subplan and read it back as
    ReusedExchange, so the caller's shingle expression evaluates once,
    on disk, with zero heap pinning) + tiny aggs. The explicit null
    filter exists for canonicalization (SCALE.md Finding 5): the
    covered-join consumer pushes isnotnull(s) below the exchange while
    the two counts don't, and the divergent subtrees would otherwise
    evaluate the shingle pipeline twice. Null features are excluded BY
    CONTRACT: a null element inside a feature array previously grouped
    as a feature value in the df aggregate (and could be a doc's only
    posting), so for degenerate inputs carrying null elements the
    counts change — real shingle/fingerprint pipelines never emit
    null features, and the filter makes that contract explicit."""
    posts = (
        shingled.select(
            F.col(id_col).alias("i"), F.explode(shingle_col).alias("s")
        )
        .filter(F.col("i").isNotNull() & F.col("s").isNotNull())
        .repartition("i", "s")
    )
    dfs = posts.groupBy("s").agg(F.count("*").alias("__df"))
    covered = (
        posts.join(dfs.filter(F.col("__df") <= max_df).select("s"), "s")
        .select("i")
        .distinct()
        .agg(F.count("*").alias("n_docs_covered"))
    )
    total = posts.select("i").distinct().agg(F.count("*").alias("n_docs"))
    feats = dfs.agg(
        F.sum((F.col("__df") <= max_df).cast("long")).alias("n_rare_features"),
        F.sum((F.col("__df") > max_df).cast("long")).alias("n_hot_features"),
    )
    return (
        total.crossJoin(covered)
        .crossJoin(feats)
        .select(
            "n_docs",
            "n_docs_covered",
            (F.col("n_docs") - F.col("n_docs_covered")).alias(
                "n_docs_uncovered"
            ),
            "n_rare_features",
            "n_hot_features",
        )
    )


def minhash_band_table(
    docs: DataFrame, num_hashes: int, bands: int,
    extra_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """(i, band, bkey) banded MinHash keys from ``docs(i, __sh)`` — the
    signature/banding core shared by the batch pair finder below and the
    streaming near-dedup (workload/streaming_ops.t16): two documents are
    LSH candidates iff they share a (band, bkey) row, and the keys are
    deterministic (seeded xxhash64), so keys computed in DIFFERENT
    micro-batches / runs join correctly against a persistent store.

    ``extra_cols``: additional ``docs`` columns to carry through onto
    every band row (e.g. the shingle-set size a consumer prefilters
    candidate pairs on). Default () keeps the original 3-column shape."""
    from loris_mri_spark.functions.texthash import let

    assert num_hashes % bands == 0
    r = num_hashes // bands
    # let-bind the shingle array: the signature's outer transform would
    # otherwise re-evaluate the (inlined) shingle pipeline once per hash.
    sigs = docs.withColumn(
        "__sig",
        let(
            F.col("__sh"),
            lambda sh: F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda h: F.array_min(
                    F.transform(sh, lambda s: F.xxhash64(h, s))
                ),
            ),
        ),
    )
    # Band key: hash of the band's signature slice (cast to string — a
    # deterministic, order-preserving encoding of the slice).
    return sigs.select(
        "i",
        *extra_cols,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, "
                f"xxhash64(b, cast(slice(__sig, b * {r} + 1, {r}) as string)) AS bkey))"
            )
        ).alias("bb"),
    ).select(
        "i", *extra_cols,
        F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"),
    )


def minhash_lsh_pairs(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, exact-verified.

    Pipeline: k seeded xxhash64 minhashes per document -> split into
    ``bands`` bands -> explode (band, band-key) -> self-join on equal keys
    (candidates form ONLY within buckets) -> exact Jaccard on candidates ->
    filter >= threshold. Returns (i, j, jaccard), i < j.
    """
    # Explicit-exchange anchor (the capped_jaccard_pairs shape): the
    # shingle pipeline — usually an inlined tokenize + n-gram transform,
    # the scan's dominant cost — evaluates ONCE; the signature build and
    # both exact-verify array joins read this exchange back as
    # ReusedExchange (one parquet scan total, plan-pinned). The explicit
    # null filter is the Finding-5 canonicalization guard: without it
    # the verify joins push isnotnull(i) below the exchange and the
    # subtrees stop matching.
    docs = (
        shingled.filter(F.size(shingle_col) > 0)
        .select(
            F.col(id_col).alias("i"),
            F.col(shingle_col).alias("__sh"),
        )
        .filter(F.col("i").isNotNull() & F.col("__sh").isNotNull())
        .repartition("i")
    )
    band_tbl = minhash_band_table(docs, num_hashes, bands).repartition(
        "band", "bkey"
    )
    # ^ explicit-exchange anchor on the join keys: both candidate-join
    #   sides embed the identical repartition subplan, so the minhash
    #   signature (num_hashes xxhash64 folds over every shingle) runs
    #   once in the exchange's map stage and the right side reads the
    #   shuffle files back (ReusedExchange) — and the join itself needs
    #   no further shuffle since the data already hashes on its keys.

    cand = (
        band_tbl.alias("x")
        .join(
            band_tbl.select(
                F.col("i").alias("j"), F.col("band"), F.col("bkey")
            ).alias("y"),
            ["band", "bkey"],
        )
        .filter(F.col("x.i") < F.col("y.j"))
        .select("i", "j")
        .distinct()
    )
    # verify against the SAME anchored docs (a candidate's members have
    # >= 1 shingle by construction, so docs' size>0 filter drops nothing)
    verify_src = docs.select(
        F.col("i").alias(id_col), F.col("__sh").alias(shingle_col)
    )
    return (
        _pair_jaccard(cand, verify_src, id_col, shingle_col)
        .filter(F.col("jaccard") >= threshold)
        .select("i", "j", "jaccard")
    )


def simhash60(token_hashes: Column) -> Column:
    """60-bit SimHash from a PRE-HASHED token array (md5_60 values). Bit b
    of the result is 1 iff the sum of (+1 / -1) votes from token-hash bit
    b is >= 0.

    The hash array is `let`-bound so the 60 per-bit folds reference a
    lambda variable — without it Catalyst's projection collapse would
    re-evaluate the tokenize+md5 pipeline once PER BIT (see
    functions/texthash.let).

    DuckDB mirror (hs = list of md5_60 hashes)::

        list_sum(list_transform(range(0, 60), b ->
          CASE WHEN list_sum(list_transform(hs, h ->
                 CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
               THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
    """
    from loris_mri_spark.functions.texthash import let

    def vote_fn(mask: Column):
        return lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)

    def body(hs: Column) -> Column:
        total = F.lit(0).cast("long")
        for b in range(60):
            mask = F.lit(1 << b).cast("long")
            vote = F.aggregate(hs, F.lit(0), vote_fn(mask))
            total = total + F.when(vote >= 0, mask).otherwise(F.lit(0).cast("long"))
        return total

    return let(token_hashes, body)


def simhash_pairs(
    hashed: DataFrame,
    id_col: str,
    simhash_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance, via the banded
    pigeonhole join: split the 60-bit hash into 4 bands of 15 bits; any
    pair within hamming <= 3 must agree on at least one whole band, so an
    equi-join on (band, band-value) finds ALL such pairs exactly — no
    cross join. Returns (i, j, hamming), i < j.

    ``max_hamming`` must stay < number of bands (4) for completeness.
    """
    from loris_mri_spark.functions.texthash import let

    assert max_hamming < 4
    docs = hashed.select(F.col(id_col).alias("i"), F.col(simhash_col).alias("__h"))
    # let-bind the simhash value: when the caller's hash column is itself
    # a (collapsed) expression, carrying it next to the band explode would
    # re-evaluate it per reference; binding keeps it to one evaluation.
    packed = docs.select(
        "i",
        let(
            F.col("__h"),
            lambda h: F.struct(
                h.alias("h"),
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(h, b * 15)
                            .bitwiseAND(F.lit(32767))
                            .alias("bval"),
                        )
                        for b in range(4)
                    ]
                ).alias("bands"),
            ),
        ).alias("__s"),
    )
    # Explicit-exchange anchor on the join keys: both sides of the
    # pigeonhole self-join embed the identical repartition subplan, so
    # the upstream simhash pipeline runs once (the right side reads the
    # shuffle files back as ReusedExchange) and the equi-join needs no
    # further shuffle. Rows are (id, hash, band, bval) — narrow.
    band_tbl = packed.select(
        "i",
        F.col("__s.h").alias("__h"),
        F.explode("__s.bands").alias("bb"),
    ).select(
        "i", "__h", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval")
    ).repartition("band", "bval")

    pairs = (
        band_tbl.alias("x")
        .join(
            band_tbl.select(
                F.col("i").alias("j"), F.col("__h").alias("__hj"), "band", "bval"
            ).alias("y"),
            ["band", "bval"],
        )
        .filter(F.col("x.i") < F.col("y.j"))
        .select("i", "j", "__h", "__hj")
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.expr("__h ^ __hj")).cast("long")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("i", "j", "hamming")
    )


def duplicate_token_spans(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring span dedup (the Lee et al. 2021 "Deduplicating
    Training Data" shape, re-expressed relationally): find every k-token
    window whose text occurs >= ``min_count`` times CORPUS-WIDE, then merge
    the flagged windows into maximal per-document duplicated intervals.

    Returns (id, span_start, span_end) with 1-based inclusive token
    positions — one row per maximal duplicated span.

    100 TB design:
    - The window inventory is an explode over ``sequence(1, n-k+1)`` with
      the key computed as md5 of the k-token slice — pure JVM expressions,
      no Python. The shuffle payload for the corpus-wide count is the
      32-hex key + (id, start), never the document text. (md5 is the
      oracle-portable choice; swap ``xxhash64`` for half the key bytes
      when oracle parity is not needed.)
    - Flagging is a LEFT SEMI join against the >=min_count key set — a
      plain shuffled equi-join, so AQE's skew handling splits hot keys
      (a collect_list of positions per key would instead OOM on a
      degenerate stop-span).
    - Interval merging is the classic gaps-and-islands: running
      max(end) over a per-document window; partitions are bounded by
      document token counts, never corpus-sized.

    The suffix-array formulation in the paper finds duplicates of ANY
    length >= k; this window formulation is equivalent on token
    boundaries: any duplicated run of m >= k tokens is covered by its
    m-k+1 duplicated k-windows, which merge back into one [start, end]
    island here.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("i"), F.col(tokens_col).alias("__t")
    ).filter(F.size("__t") >= k)
    keyed = base.select(
        "i",
        F.explode(
            F.sequence(F.lit(1), F.size("__t") - F.lit(k - 1))
        ).alias("start"),
        "__t",
    ).select(
        "i",
        "start",
        (F.col("start") + F.lit(k - 1)).alias("end"),
        F.md5(F.concat_ws(" ", F.slice("__t", F.col("start"), k))).alias(
            "key"
        ),
    )
    dup_keys = (
        keyed.groupBy("key")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("key")
    )
    flagged = keyed.join(dup_keys, "key", "left_semi").select(
        "i", "start", "end"
    )
    w_prev = (
        Window.partitionBy("i")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("i").orderBy("start")
    return (
        flagged.withColumn("__pmax", F.max("end").over(w_prev))
        .withColumn(
            "__brk",
            F.when(
                F.col("__pmax").isNull()
                | (F.col("start") > F.col("__pmax") + 1),
                1,
            ).otherwise(0),
        )
        .withColumn("__g", F.sum("__brk").over(w_run))
        .groupBy("i", "__g")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
        )
        .select("i", "span_start", "span_end")
    )


def simhash60_arrow(
    df: DataFrame,
    id_col: str,
    hashes_col: str,
) -> DataFrame:
    """Arrow/numpy variant of :func:`simhash60` — the corpus-scale path
    (the kmeans_cells_arrow pattern: the pinned query keeps the
    Catalyst-fold version as its oracle anchor; this one exists for
    throughput). Returns (id_col, simhash).

    BIT-IDENTICAL to the fold by construction: a SimHash vote is an
    integer sum of +-1 terms and the output bit is `vote >= 0` — pure
    integer arithmetic, order-independent, so unlike float means there
    is no combine-order surface at all. The 60 per-bit Catalyst
    `aggregate` folds are interpreted lambdas (an 18 kB expression
    outside whole-stage codegen — the plan sweep's biggest non-codegen
    node); here the same votes are three vectorized numpy passes per
    Arrow batch: bit-unpack, segment-sum, repack.

    Null/empty rows replicate the fold exactly (pinned in
    tests/test_dedup.py): a NULL hash array folds to 0 (every per-bit
    `aggregate` is null, so every `when` takes the 0 branch) and an
    EMPTY array folds to all-60-bits-set (vote 0 >= 0 for every bit).
    """
    import numpy as np
    import pandas as pd

    def kernel(batches):  # noqa: ANN001
        shifts = np.arange(60, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            rows = pdf[hashes_col]
            null_mask = rows.isna().to_numpy()
            lens = np.array(
                [0 if m else len(r) for r, m in zip(rows, null_mask)],
                dtype=np.int64,
            )
            n = len(pdf)
            votes = np.zeros((n, 60), dtype=np.int64)
            if lens.sum():
                h = np.concatenate(
                    [
                        np.asarray(r, dtype=np.int64)
                        for r, m in zip(rows, null_mask)
                        if not m and len(r)
                    ]
                )
                seg = np.repeat(np.arange(n, dtype=np.int64), lens)
                bits = (h[:, None] >> shifts) & 1  # (m, 60)
                np.add.at(votes, seg, 2 * bits - 1)
            sim = ((votes >= 0).astype(np.int64) << shifts).sum(axis=1)
            sim[null_mask] = 0  # fold semantics: null array -> 0
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": sim})

    return df.select(id_col, hashes_col).mapInPandas(
        kernel, f"{id_col} long, simhash long"
    )

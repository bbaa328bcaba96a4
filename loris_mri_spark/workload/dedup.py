"""Deduplication workload over the `documents` table — the LLM-training-
data extension (BASELINE.json north star), built on
`operators/dedup.py` + `functions/texthash.py`.

Reference analogue: LORIS-MRI's duplicate-scan suppression is a hash
equality check per inserted file (`python/lib/database_lib/files.py:40-101`,
blake2b at `nifti_insertion_pipeline.py:52-64`); here the same idea runs
corpus-wide in one distributed pass, plus the near-duplicate families the
reference never needed (MinHash-LSH, SimHash, n-gram Jaccard).

Every query has a DuckDB oracle. The MinHash-LSH query's oracle is the
BRUTE-FORCE jaccard join: with 32 hashes in 16 bands the candidate-miss
probability at j>=0.8 is ~1e-7, and with the fixed seeds used here the
LSH output is deterministic and verified equal to brute force on the
driver's testdata (see tests/test_dedup.py, both sf0.001 and sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loris_mri_spark.catalog import load_table
from loris_mri_spark.functions.texthash import (
    SQL_MD5_60,
    SQL_NORM,
    bow_fingerprint,
    md5_60,
    norm_text,
    sql_shingles,
    tokens,
    word_shingles,
)
from loris_mri_spark.operators.dedup import (
    capped_jaccard_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash60_arrow,
    simhash_pairs,
)
from loris_mri_spark.workload import query
from loris_mri_spark.workload import shared_df as _shared

_NORM = SQL_NORM.format(col="text")

_SHINGLED_CTE = f"""
    toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents),
    shingled AS (SELECT doc_id, {sql_shingles(3)} AS s FROM toks
                 WHERE len({sql_shingles(3)}) > 0)
"""

_BRUTE_JACCARD_08 = f"""
    WITH {_SHINGLED_CTE},
    pairs AS (
      SELECT a.doc_id AS i, b.doc_id AS j,
             len(list_intersect(a.s, b.s)) AS c,
             len(a.s) AS na, len(b.s) AS nb
      FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id)
    SELECT i, j, ROUND(c * 1.0 / (na + nb - c), 4) AS jaccard_r
    FROM pairs
    WHERE c * 1.0 / (na + nb - c) >= 0.8
"""


# Shared-intermediate passes (see workload.shared_df): the shingle /
# simhash / winnow-fingerprint / minhash-LSH passes each feed several
# contract-independent dedup queries; with spark.loris.sharedCache=true
# (bench.py sets it) one cached copy amortizes the expensive expression
# across them, while correctness/plan runs keep the pure single-scan plans.


def _shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        return d.select(
            "doc_id", word_shingles(tokens("text"), 3).alias("shingles")
        ).filter(F.size("shingles") > 0)

    return _shared(spark, ("shingled", sf_dir), build)


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+16-band LSH verified pairs at j>=0.8 — consumed by the
    pair listing, the cluster collapse, and the corpus-select capstone."""

    def build() -> DataFrame:
        sh = _shingled_docs(spark, sf_dir)
        return minhash_lsh_pairs(
            sh, "doc_id", "shingles", threshold=0.8, num_hashes=32, bands=16
        )

    return _shared(spark, ("minhash_pairs", sf_dir), build)


def _minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component) from the MinHash-LSH pair graph — one
    connected-components run feeds the cluster listing, the keep-best
    collapse, the leakage-safe split, and the corpus-select capstone
    (shared under spark.loris.sharedCache like the pair pass itself)."""

    def build() -> DataFrame:
        from loris_mri_spark.operators.components import (
            connected_components,
        )

        pairs = _minhash_pairs(spark, sf_dir)
        return connected_components(pairs, "i", "j").select(
            F.col("node").alias("doc_id"), "component"
        )

    return _shared(spark, ("minhash_components", sf_dir), build)


def winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp) winnow-fingerprint arrays — consumed by the pair
    query, the coverage guard, and text_fingerprint_winnow.

    explode(array(...)) = Generate barrier: the fingerprint pipeline is
    evaluated ONCE per row; the size() filter and downstream consumers
    reference the generator's output attribute instead of re-expanding
    the expression (re-evaluation cost 5x the whole rest of the query)."""
    from loris_mri_spark.functions.texthash import let
    from loris_mri_spark.workload.text import winnow_fingerprint

    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        return d.select(
            "doc_id",
            F.explode(
                F.array(let(norm_text("text"), winnow_fingerprint))
            ).alias("fp"),
        ).filter(F.size("fp") > 0)

    return _shared(spark, ("winnow_fps", sf_dir), build)


def winnow_fps_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp) winnow fingerprints under the CHEAP polynomial
    codepoint hash (workload/text.winnow_fingerprint_poly) — the r10
    profile showed md5_60 is ~85% of the md5 pair query's cost at 100x,
    so the hash kernel, not the join, is the family's lever. Same
    Generate-barrier shape as winnow_fps."""
    from loris_mri_spark.functions.texthash import let
    from loris_mri_spark.workload.text import winnow_fingerprint_poly

    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        return d.select(
            "doc_id",
            F.explode(
                F.array(let(norm_text("text"), winnow_fingerprint_poly))
            ).alias("fp"),
        ).filter(F.size("fp") > 0)

    return _shared(spark, ("winnow_fps_poly", sf_dir), build)


@query(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_NORM}) AS fingerprint,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized full text: shuffle a 32-byte hash per
    row, never the document body."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, F.md5(norm_text("text")), "doc_id")


@query(
    "dedup_exact_bow",
    oracle=f"""
    SELECT md5(array_to_string(list_sort(list_distinct(
             string_split({_NORM}, ' '))), ' ')) AS fingerprint,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive exact dedup on the bag-of-words fingerprint
    (collapses shuffled/reordered copies the full-text hash misses)."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, bow_fingerprint("text"), "doc_id")


@query("dedup_ngram_jaccard_pairs", oracle=_BRUTE_JACCARD_08)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-word-shingle Jaccard >= 0.8 pairs via the inverted-index
    join (explode -> equi-join on shingle -> per-pair counts) — the oracle
    cross-joins, the engine never does."""
    sh = _shingled_docs(spark, sf_dir)
    return jaccard_pairs(sh, "doc_id", "shingles", threshold=0.8).select(
        "i", "j", F.round("jaccard", 4).alias("jaccard_r")
    )


@query("dedup_minhash_lsh_pairs", oracle=_BRUTE_JACCARD_08)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + 16-band LSH candidates, exact-verified at >= 0.8 —
    the sub-quadratic scale path. Oracle = brute force; see module
    docstring for why the outputs coincide."""
    return _minhash_pairs(spark, sf_dir).select(
        "i", "j", F.round("jaccard", 4).alias("jaccard_r")
    )


_SQL_TOKEN_HASHES = (
    "list_transform(list_distinct(string_split(" + _NORM + ", ' ')), "
    "tok -> " + SQL_MD5_60.format(col="tok") + ")"
)

_SIMHASH_SQL = f"""
    WITH hashed AS (
      SELECT doc_id, {_SQL_TOKEN_HASHES} AS hs FROM documents)
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 60), b ->
             CASE WHEN list_sum(list_transform(hs, h ->
                    CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
                  THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
             AS BIGINT) AS simhash
    FROM hashed
"""


def _simhashed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        token_hashes = F.transform(
            F.array_distinct(tokens("text")), lambda tok: md5_60(tok)
        )
        # PLAN OF RECORD is the Arrow kernel (operators/dedup.py
        # simhash60_arrow): bit-identical to the Catalyst simhash60 fold
        # by construction (integer votes, no combine-order surface —
        # exact-equality pinned in tests/test_dedup.py), and 4.1x faster
        # at 100x data (SCALE.md: 16.4 s fold vs 4.0 s Arrow — the fold
        # is 60 interpreted aggregate() lambdas, an 18 kB expression
        # outside whole-stage codegen). The fold stays as the DuckDB
        # oracle anchor (_SIMHASH_SQL) and as the registered kernel's
        # cross-checked twin.
        hashed = d.select("doc_id", token_hashes.alias("__hs"))
        return simhash60_arrow(hashed, "doc_id", "__hs")

    return _shared(spark, ("simhashed", sf_dir), build)


@query("dedup_simhash", oracle=_SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document from oracle-portable md5_60 token
    hashes — one Arrow-batched mapInPandas pass (vectorized numpy
    bit-unpack/segment-sum/repack), no shuffle at all. Oracle: the
    sequential per-bit fold, which the kernel matches bit-for-bit."""
    return _simhashed_docs(spark, sf_dir)


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH sh AS ({_SIMHASH_SQL})
    SELECT a.doc_id AS i, b.doc_id AS j,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) via the 4-band pigeonhole
    equi-join — exact and complete, no cross join (oracle cross-joins)."""
    return simhash_pairs(
        _simhashed_docs(spark, sf_dir), "doc_id", "simhash", max_hamming=3
    )


@query(
    "dedup_minhash_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_BRUTE_JACCARD_08}),
    nodes AS (SELECT DISTINCT n FROM (SELECT i AS n FROM pairs
                                      UNION SELECT j FROM pairs)),
    edges2 AS (SELECT i, j FROM pairs UNION SELECT j AS i, i AS j FROM pairs),
    reach AS (
      SELECT n AS node, n AS r FROM nodes
      UNION
      SELECT rr.node, e.j AS r FROM reach rr JOIN edges2 e ON e.i = rr.r)
    SELECT node AS doc_id, MIN(r) AS component
    FROM reach GROUP BY node
    """,
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: LSH pairs -> connected components via min-label
    propagation (operators/components.py) — the step that turns a pair
    list into keep/remove sets (keep = min doc_id per component). Oracle:
    recursive-CTE reachability over the brute-force pair graph."""
    return _minhash_components(spark, sf_dir)


# Candidate rule: share >= 1 fingerprint with document frequency <= 50.
# The corpus is heavily templated (at sf0.1 one fingerprint sits in 78% of
# docs and sum(df^2) over the FULL index is ~590M joined rows) — the cap
# bounds the self-join to rare features (~87k rows at sf0.1) and the
# reported Jaccard is still EXACT, verified on full fingerprint arrays.
# The same rule is in the oracle, so parity holds at every scale; measured
# against brute force at sf0.01 the capped candidates miss 0 of 25 pairs.
_WINNOW_MAX_DF = 50


def _winnow_pairs_body() -> str:
    """The candidate-cap + exact-verify SQL, shared verbatim by the md5
    and poly pair oracles — only the fingerprint CTE differs."""
    return f"""
    posts AS (SELECT doc_id, unnest(fp) AS s FROM final),
    keep AS (SELECT s FROM posts GROUP BY s HAVING count(*) <= {_WINNOW_MAX_DF}),
    kp AS (SELECT p.doc_id, p.s FROM posts p JOIN keep USING (s)),
    cand AS (
      SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
      FROM kp a JOIN kp b ON a.s = b.s AND a.doc_id < b.doc_id),
    pairs AS (
      SELECT c.i, c.j, len(list_intersect(fa.fp, fb.fp)) AS cnum,
             len(fa.fp) AS na, len(fb.fp) AS nb
      FROM cand c
      JOIN final fa ON fa.doc_id = c.i
      JOIN final fb ON fb.doc_id = c.j)
    SELECT i, j, ROUND(cnum * 1.0 / (na + nb - cnum), 4) AS jaccard_r
    FROM pairs
    WHERE cnum * 1.0 / (na + nb - cnum) >= 0.5
    """


def _winnow_pairs_poly_oracle() -> str:
    from loris_mri_spark.workload.text import WINNOW_FP_POLY_CTE

    return f"WITH {WINNOW_FP_POLY_CTE}, {_winnow_pairs_body()}"


def _winnow_pairs_oracle() -> str:
    from loris_mri_spark.workload.text import WINNOW_FP_CTE

    return f"WITH {WINNOW_FP_CTE}, {_winnow_pairs_body()}"


def _winnow_coverage_oracle() -> str:
    from loris_mri_spark.workload.text import WINNOW_FP_CTE

    return f"""
    WITH {WINNOW_FP_CTE},
    fps AS (SELECT doc_id, fp FROM final WHERE len(fp) > 0),
    posts AS (SELECT doc_id, unnest(fp) AS s FROM fps),
    dfs AS (SELECT s, count(*) AS df FROM posts GROUP BY s),
    cov AS (
      SELECT DISTINCT p.doc_id FROM posts p
      JOIN dfs ON p.s = dfs.s WHERE dfs.df <= {_WINNOW_MAX_DF})
    SELECT (SELECT count(*) FROM fps) AS n_docs,
           (SELECT count(*) FROM cov) AS n_docs_covered,
           (SELECT count(*) FROM fps) - (SELECT count(*) FROM cov)
             AS n_docs_uncovered,
           (SELECT count(*) FROM dfs WHERE df <= {_WINNOW_MAX_DF})
             AS n_rare_features,
           (SELECT count(*) FROM dfs WHERE df > {_WINNOW_MAX_DF})
             AS n_hot_features
    """


@query("dedup_winnow_coverage", oracle=_winnow_coverage_oracle())
def dedup_winnow_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability guard for dedup_winnow_pairs' capped-candidate
    contract (operators/dedup.capped_index_coverage): counts documents
    with no rare (df <= max_df) fingerprint — documents the cap excludes
    from candidacy entirely. On this corpus the number is pinned by the
    oracle; a testdata/corpus shift that inflates it is the signal to
    retune max_df or fall back to the df-insensitive minhash path."""
    from loris_mri_spark.operators.dedup import capped_index_coverage

    fps = winnow_fps(spark, sf_dir)
    return capped_index_coverage(fps, "doc_id", "fp", max_df=_WINNOW_MAX_DF)


@query("dedup_winnow_pairs", oracle=_winnow_pairs_oracle())
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs over WINNOWED fingerprints (the MOSS detector shape):
    each document's winnow mins are a guaranteed-coverage SUBSAMPLE of its
    5-gram hashes (one min per sliding window), and candidates come from
    an inverted index over the RARE fingerprints only (df <= 50 — see
    _WINNOW_MAX_DF; this corpus is templated enough that the uncapped
    index self-join is ~590M rows at sf0.1). Candidate pairs then verify
    with EXACT fingerprint Jaccard >= 0.5 computed on the full arrays
    (operators/dedup.capped_jaccard_pairs). Distinct modality from
    dedup_ngram_jaccard_pairs (full word-3-gram index): this is the cheap
    first pass a 100 TB pipeline runs. Oracle applies the identical
    candidate rule + exact verify."""
    fps = winnow_fps(spark, sf_dir)
    return capped_jaccard_pairs(
        fps, "doc_id", "fp", threshold=0.5, max_df=_WINNOW_MAX_DF
    ).select("i", "j", F.round("jaccard", 4).alias("jaccard_r"))


@query("dedup_winnow_pairs_poly", oracle=_winnow_pairs_poly_oracle())
def dedup_winnow_pairs_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_winnow_pairs with the CHEAP-HASH fingerprint (r10 VERDICT
    item 4). The r10 profile (SCALE.md "measured non-change 3") showed
    the md5_60 gram hash is ~85% of the md5 query's 87.8 s at 100x —
    the join machinery is ~15% — so the hash kernel is the only lever
    left on this family. The polynomial codepoint hash
    (workload/text.winnow_fingerprint_poly) replaces md5 + hex-parse
    with one ascii() per character and five array lookups + integer
    arithmetic per gram, IDENTICALLY computable in DuckDB, so the
    oracle stays hash-exact. Same winnowing, same df<=50 candidate cap,
    same exact-Jaccard verify at 0.5; the md5 original stays registered
    as the portable-hash reference. Different hashes select different
    window mins, so the two variants' pair lists may legitimately
    differ on borderline documents — each is exact w.r.t. its own
    fingerprint definition."""
    fps = winnow_fps_poly(spark, sf_dir)
    return capped_jaccard_pairs(
        fps, "doc_id", "fp", threshold=0.5, max_df=_WINNOW_MAX_DF
    ).select("i", "j", F.round("jaccard", 4).alias("jaccard_r"))


def _keep_best_oracle() -> str:
    from loris_mri_spark.workload import ORACLES

    return f"""
    WITH clusters AS ({ORACLES["dedup_minhash_clusters"]}),
    w AS (SELECT doc_id, CAST(len(string_split({_NORM}, ' ')) AS BIGINT)
                   AS n_tokens
          FROM documents),
    ranked AS (
      SELECT c.component, c.doc_id, w.n_tokens,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY w.n_tokens DESC, c.doc_id ASC)
               AS rn
      FROM clusters c JOIN w USING (doc_id))
    SELECT component,
           MIN(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
           MAX(CASE WHEN rn = 1 THEN n_tokens END) AS keep_tokens,
           COUNT(*) AS n_members
    FROM ranked GROUP BY component
    """


@query("dedup_keep_best", oracle=None)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster collapse: instead of keeping each near-dup
    cluster's min doc_id, keep its LONGEST member (ties to lowest id) —
    the keep-best policy real pipelines use so dedup does not discard the
    most complete copy. Composes the shared minhash cluster pass with a
    per-doc token weight; one window over the (tiny) clustered subset."""
    from pyspark.sql.window import Window

    comp = _minhash_components(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    joined = comp.join(w, "doc_id")
    win = Window.partitionBy("component").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    ranked = joined.withColumn("rn", F.row_number().over(win))
    return ranked.groupBy("component").agg(
        F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keep_id"),
        F.max(F.when(F.col("rn") == 1, F.col("n_tokens"))).alias(
            "keep_tokens"
        ),
        F.count("*").alias("n_members"),
    )


# Registered with the composed oracle AFTER definition so the module-load
# order (dedup_minhash_clusters registers above) is explicit.
from loris_mri_spark.workload import ORACLES as _OR  # noqa: E402

_OR["dedup_keep_best"] = _keep_best_oracle()


# -- Exact-substring span dedup (Lee et al. 2021 shape) ----------------------

_SPAN_K = 5

_SPAN_KEYED_CTE = f"""
    toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents),
    spans AS (SELECT doc_id, unnest(range(1, len(t) - {_SPAN_K - 2}))
                       AS start, t
              FROM toks WHERE len(t) >= {_SPAN_K}),
    keyed AS (SELECT doc_id, start, start + {_SPAN_K - 1} AS "end",
                     md5(array_to_string(t[start:start+{_SPAN_K - 1}], ' '))
                       AS key
              FROM spans)
"""

_SPAN_STATS_SQL = f"""
    WITH {_SPAN_KEYED_CTE},
    dup AS (SELECT key FROM keyed GROUP BY key HAVING COUNT(*) >= 2),
    flagged AS (SELECT doc_id, start, "end" FROM keyed
                WHERE key IN (SELECT key FROM dup)),
    brk AS (SELECT doc_id, start, "end",
              CASE WHEN max("end") OVER w IS NULL
                        OR start > max("end") OVER w + 1
                   THEN 1 ELSE 0 END AS b
            FROM flagged
            WINDOW w AS (PARTITION BY doc_id ORDER BY start
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    grp AS (SELECT doc_id, start, "end",
                   SUM(b) OVER (PARTITION BY doc_id ORDER BY start) AS g
            FROM brk),
    merged AS (SELECT doc_id, g, MIN(start) AS s, MAX("end") AS e
               FROM grp GROUP BY doc_id, g),
    agg AS (SELECT doc_id, COUNT(*) AS n_dup_spans,
                   CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
            FROM merged GROUP BY doc_id)
    SELECT a.doc_id, n.n_tokens, a.n_dup_spans, a.dup_tokens,
           ROUND(a.dup_tokens * 1.0 / n.n_tokens, 4) AS dup_frac
    FROM agg a
    JOIN (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks) n
      USING (doc_id)
"""


@query("dedup_substring_spans", oracle=_SPAN_STATS_SQL)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup: per-document stats of maximal token
    ranges whose every k-window repeats corpus-wide (the duplicated-span
    family from "Deduplicating Training Data Makes Language Models
    Better" — distinct from whole-doc exact dedup and from the
    similarity families: it localizes WHICH part of a document is
    boilerplate). See operators/dedup.py:duplicate_token_spans for the
    plan (inventory explode -> hash-count -> semi-join -> per-doc
    gaps-and-islands; shuffles hashes and positions, never text)."""
    from loris_mri_spark.operators.dedup import duplicate_token_spans

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("t"))
    spans = duplicate_token_spans(toks, "doc_id", "t", k=_SPAN_K)
    per_doc = spans.groupBy(F.col("i").alias("doc_id")).agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
            "dup_tokens"
        ),
    )
    n_tok = toks.select(
        "doc_id", F.size("t").cast("long").alias("n_tokens")
    )
    return per_doc.join(n_tok, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_dup_spans",
        "dup_tokens",
        F.round(F.col("dup_tokens") / F.col("n_tokens"), 4).alias(
            "dup_frac"
        ),
    )


_HOTSPAN_SQL = f"""
    WITH {_SPAN_KEYED_CTE},
    texted AS (SELECT doc_id,
                      array_to_string(t[start:start+{_SPAN_K - 1}], ' ')
                        AS span_text
               FROM spans),
    hot AS (SELECT span_text, COUNT(*) AS n_occ,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM texted GROUP BY span_text HAVING COUNT(*) >= 2)
    SELECT span_text, n_occ, n_docs
    FROM hot ORDER BY n_occ DESC, span_text ASC LIMIT 20
"""


@query("dedup_substring_hotspans", oracle=_HOTSPAN_SQL)
def dedup_substring_hotspans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-repeated k-token spans — the boilerplate report a
    corpus curator reads before choosing removal rules. Map-side partial
    aggregation bounds the shuffle to per-partition-distinct spans; the
    ORDER BY (n_occ DESC, span_text ASC) is total so the LIMIT is
    deterministic. (At 100 TB, pre-aggregate on the md5 key and join the
    exemplar text back for the 20 winners to halve the shuffle payload;
    here the direct grouping keeps the plan one stage shorter.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("t")).filter(
        F.size("t") >= _SPAN_K
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.size("t") - F.lit(_SPAN_K - 1))
        ).alias("start"),
        "t",
    ).select(
        "doc_id",
        F.concat_ws(
            " ", F.slice("t", F.col("start"), _SPAN_K)
        ).alias("span_text"),
    )
    hot = (
        spans.groupBy("span_text")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occ") >= 2)
    )
    return hot.orderBy(
        F.col("n_occ").desc(), F.col("span_text").asc()
    ).limit(20)


# -- Entity resolution: blocked fuzzy matching over a name dictionary -------

_ER_SQL = """
    WITH names AS (
      SELECT p_name AS name, COUNT(*) AS n_rows,
             string_split(p_name, ' ')[1] AS blk, length(p_name) AS ln
      FROM part GROUP BY p_name),
    pairs AS (
      SELECT a.name AS name_a, b.name AS name_b,
             levenshtein(a.name, b.name) AS lev,
             a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
      FROM names a JOIN names b
        ON a.blk = b.blk AND a.name < b.name AND abs(a.ln - b.ln) <= 3)
    SELECT name_a, name_b, lev, n_rows_a, n_rows_b
    FROM pairs WHERE lev <= 3
"""


@query("er_fuzzy_name_pairs", oracle=_ER_SQL)
def er_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked fuzzy matching: near-identical part
    names (levenshtein <= 3) found WITHOUT a cross join. The ER shape
    production pipelines run over vendor/product/author dictionaries:

    1. collapse rows to the DISTINCT-name dictionary first (the
       dictionary is orders of magnitude smaller than the fact table —
       here 64 names for 2k/20k rows; at 100 TB the same ratio is what
       makes ER tractable at all), carrying the row count per name;
    2. block on (first token) with a +-3 length band — candidate pairs
       only form inside a block, a plain shuffled equi-join (AQE splits
       hot blocks), never an all-pairs product;
    3. verify candidates with exact edit distance (JVM `levenshtein`,
       identical semantics to DuckDB's) and keep lev <= 3.

    The match graph then collapses with connected_components exactly like
    the near-dup families (operators/components.py) — not repeated here."""
    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").alias("n_rows"))
        .select(
            "name",
            "n_rows",
            F.split("name", " ").getItem(0).alias("blk"),
            F.length("name").alias("ln"),
        )
    )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("n_rows_a"),
        "blk",
        F.col("ln").alias("ln_a"),
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("n_rows_b"),
        "blk",
        F.col("ln").alias("ln_b"),
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= 3)
        )
        .withColumn("lev", F.levenshtein("name_a", "name_b"))
        .filter(F.col("lev") <= 3)
        .select("name_a", "name_b", "lev", "n_rows_a", "n_rows_b")
    )


def _cluster_safe_split_oracle() -> str:
    from loris_mri_spark.workload import ORACLES

    md560 = SQL_MD5_60.format(col="CAST(rep AS VARCHAR)")
    return f"""
    WITH clusters AS ({ORACLES["dedup_minhash_clusters"]}),
    reps AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS rep
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id),
    hashed AS (SELECT doc_id, rep, {md560} % 1000000 AS ppm FROM reps)
    SELECT doc_id, rep,
           CASE WHEN ppm < 900000 THEN 'train'
                WHEN ppm < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM hashed
    """


@query("split_cluster_safe", oracle=None)
def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: the split is assigned by
    hashing each document's near-dup CLUSTER representative, not the
    document — so two near-duplicate documents can never land on
    opposite sides of a train/eval boundary (the contamination mode a
    doc-level hash split silently allows; cf. the decontamination
    screen `contamination_eval_overlap`, which this complements at
    corpus-construction time). 90/5/5 via the oracle-portable md5_60
    ppm gate on the representative — deterministic, rerunnable, no
    coordination. Singleton docs are their own representative, so the
    join adds nothing to the shuffle beyond the (small) clustered
    subset."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    comp = _minhash_components(spark, sf_dir)
    reps = d.join(F.broadcast(comp), "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("rep"),
    )
    ppm = md5_60(F.col("rep").cast("string")) % 1_000_000
    return reps.select(
        "doc_id",
        "rep",
        F.when(ppm < 900_000, "train")
        .when(ppm < 950_000, "val")
        .otherwise("test")
        .alias("split"),
    )


from loris_mri_spark.workload import ORACLES as _OR2  # noqa: E402

_OR2["split_cluster_safe"] = _cluster_safe_split_oracle()

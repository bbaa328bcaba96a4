"""Corpus-preparation workload — deterministic sampling, token-budget
sharding and eval-set decontamination (operators/corpus.py) declared as
oracle-checked queries. These are the stages between ingestion and the
dedup/quality gates in a training-data pipeline; the reference has no
analogue (its unit of work is one imaging file), so the queries run on
the driver testdata star schema + documents corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loris_mri_spark.catalog import load_table
from loris_mri_spark.functions.texthash import (
    SQL_NORM,
    sql_shingles,
    tokens,
    word_shingles,
)
from loris_mri_spark.operators.corpus import (
    budget_shards,
    contamination_screen,
    stratified_sample,
)
from loris_mri_spark.workload import query

_NORM = SQL_NORM.format(col="text")

# ppm rates: integers end-to-end so the keep predicate is exact integer
# comparison in both engines (no float-rounding drift).
_SEG_PPM = {"BUILDING": 500_000, "MACHINERY": 200_000}
_DEFAULT_PPM = 50_000
_SALT = "corpus-v1"

_SAMPLE_SQL = f"""
    WITH gated AS (
      SELECT c_custkey, c_mktsegment,
             CAST(('0x' || substr(md5('{_SALT}:' || CAST(c_custkey AS VARCHAR)),
                                  1, 15)) AS BIGINT) % 1000000 AS g
      FROM customer),
    fr(seg, ppm) AS (VALUES ('BUILDING', 500000), ('MACHINERY', 200000)),
    kept AS (
      SELECT c_custkey, c_mktsegment
      FROM gated LEFT JOIN fr ON c_mktsegment = fr.seg
      WHERE g < COALESCE(ppm, {_DEFAULT_PPM}))
    SELECT c_mktsegment, COUNT(*) AS n_kept,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM kept GROUP BY c_mktsegment
"""


@query("sample_stratified_deterministic", oracle=_SAMPLE_SQL)
def sample_stratified_deterministic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stratified DETERMINISTIC sampling (operators/corpus.py): keep 50%
    of BUILDING, 20% of MACHINERY, 5% of everything else, gated by a
    salted md5 of the row key — the same row survives on any cluster,
    any partitioning, any retry (df.sample cannot promise that: its RNG
    seeds per partition). Pure filter + broadcast rate table; the
    rollup here pins every kept key via count/min/max/sum."""
    c = load_table(spark, sf_dir, "customer")
    kept = stratified_sample(
        c, "c_custkey", "c_mktsegment", _SEG_PPM, _DEFAULT_PPM, _SALT
    )
    return kept.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_kept"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
        F.sum("c_custkey").alias("key_sum"),
    )


_TOKEN_BUDGET = 20_000
_BUCKET_WIDTH = 100

_SHARDS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS w
      FROM documents),
    packed AS (
      SELECT doc_id, w,
             CAST(COALESCE(SUM(w) OVER (ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) // {_TOKEN_BUDGET}
                  AS BIGINT) AS shard_id
      FROM toks)
    SELECT shard_id, COUNT(*) AS n_docs, CAST(SUM(w) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM packed GROUP BY shard_id
"""


@query("pack_token_budget_shards", oracle=_SHARDS_SQL)
def pack_token_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing (operators/corpus.py budget_shards):
    documents in id order are cut into contiguous ~20k-token shards by
    the exclusive running token sum — the packing step that writes
    fixed-budget training files while preserving corpus order. The
    oracle states the semantics as one global-order window; the engine
    computes the SAME sums scale-safely (id-bucket partial sums +
    driver-side exclusive offsets + bounded per-bucket windows — no
    single-partition global sort). Per-shard rollup pins every
    assignment."""
    d = load_table(spark, sf_dir, "documents")
    weighted = d.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    shards = budget_shards(
        weighted, "doc_id", "n_tokens", _TOKEN_BUDGET, _BUCKET_WIDTH
    )
    return shards.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# Eval docs chosen to have real near-duplicates in the corpus (98~290,
# 45~267~413 share 70+ 8-grams at sf0.01), so the screen demonstrably
# flags non-eval training docs, not just the eval rows themselves.
_EVAL_DOC_IDS = (45, 98, 154)
_EVAL_NGRAM = 8
_MIN_HITS = 2

_CONTAM_SQL = f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS t
                  FROM documents),
    sh AS (SELECT doc_id, {sql_shingles(_EVAL_NGRAM)} AS s FROM toks
           WHERE len({sql_shingles(_EVAL_NGRAM)}) > 0),
    ev AS (SELECT DISTINCT unnest(s) AS g FROM sh
           WHERE doc_id IN {_EVAL_DOC_IDS}),
    posts AS (SELECT doc_id, unnest(s) AS g FROM sh),
    hits AS (SELECT doc_id, COUNT(*) AS n_matched
             FROM posts JOIN ev USING (g) GROUP BY doc_id)
    SELECT doc_id, n_matched, n_matched >= {_MIN_HITS} AS contaminated
    FROM hits
"""


@query("contamination_eval_overlap", oracle=_CONTAM_SQL)
def contamination_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination screen (operators/corpus.py
    contamination_screen): the 8-gram inventory of a small eval set
    (here: three documents standing in for a benchmark) broadcasts, the
    corpus explodes its 8-grams once, and any training doc sharing >= 2
    distinct 8-grams is flagged — the overlap pass run before a corpus
    freeze. Near-dup leakage below exact-8-gram overlap is the LSH
    family's job (dedup_*); this is the exact-match contract."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", word_shingles(tokens("text"), _EVAL_NGRAM).alias("s")
    ).filter(F.size("s") > 0)
    ev = sh.filter(F.col("doc_id").isin(*_EVAL_DOC_IDS)).select(
        F.explode("s").alias("s")
    )
    return contamination_screen(sh, "doc_id", "s", ev, _MIN_HITS)


_SHUFFLE_SALT = "shuffle-v1"
_N_SHARDS = 8

_SHUFFLE_SQL = f"""
    WITH keyed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('{_SHUFFLE_SALT}:'
                                      || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hkey
      FROM documents)
    SELECT doc_id,
           hkey % {_N_SHARDS} AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY hkey % {_N_SHARDS}
                                   ORDER BY hkey, doc_id) AS BIGINT) AS pos
    FROM keyed
"""


@query("corpus_global_shuffle", oracle=_SHUFFLE_SQL)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle
    (operators/corpus.py deterministic_shuffle): salted-hash sort key ->
    uniform shard assignment -> rank within shard. The reproducible
    random permutation a training run needs for its shard files —
    df.orderBy(rand()) cannot promise stability across retries or
    cluster sizes; the salted hash can, and makes the permutation
    oracle-checkable."""
    from loris_mri_spark.operators.corpus import deterministic_shuffle

    d = load_table(spark, sf_dir, "documents")
    return deterministic_shuffle(d, "doc_id", _N_SHARDS, _SHUFFLE_SALT)


# Integer mixture weights (relative sampling frequency per source); the
# interleave key is src_rank * (LCM / weight), so comparing keys is exact
# integer math — no float ratios, no drift between engines.
_MIX_WEIGHTS = {"src0": 4, "src1": 2}
_MIX_DEFAULT_W = 1
_MIX_LCM = 4
_MIX_SALT = "mix-v1"

_MIX_SQL = f"""
    WITH g AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5('{_MIX_SALT}:'
                                      || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hkey
      FROM documents),
    wt(src, w) AS (VALUES ('src0', 4), ('src1', 2)),
    r AS (
      SELECT doc_id, source,
             COALESCE(w, {_MIX_DEFAULT_W}) AS w,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY hkey, doc_id) AS BIGINT)
               AS src_rank
      FROM g LEFT JOIN wt ON g.source = wt.src)
    SELECT doc_id, source, src_rank,
           src_rank * ({_MIX_LCM} // w) AS mix_key
    FROM r
"""


@query("corpus_mixture_interleave", oracle=_MIX_SQL)
def corpus_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-ratio mixing: each source's documents get a
    salted-hash rank, and the training order is ascending
    ``mix_key = src_rank * (LCM / weight)`` — a weight-4 source appears 4x
    as often as a weight-1 source in any prefix of the order (the
    domain-mixture schedule of a pre-training run), reproducibly on any
    cluster. All-integer keys; the per-source rank is the only shuffle.
    At 100 TB a giant source's rank comes from the same id-bucket
    offset trick as operators/corpus.budget_shards rather than one
    per-source sort partition."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    hkey = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(_MIX_SALT), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    rates = spark.createDataFrame(
        [(k, int(v)) for k, v in _MIX_WEIGHTS.items()], "src string, w int"
    )
    keyed = d.select("doc_id", "source", hkey.alias("hkey")).join(
        F.broadcast(rates), F.col("source") == F.col("src"), "left"
    )
    w = Window.partitionBy("source").orderBy("hkey", "doc_id")
    return keyed.select(
        "doc_id",
        "source",
        F.coalesce(F.col("w"), F.lit(_MIX_DEFAULT_W)).alias("__w"),
        F.row_number().over(w).cast("long").alias("src_rank"),
    ).select(
        "doc_id",
        "source",
        "src_rank",
        (F.col("src_rank") * F.expr(f"{_MIX_LCM} div __w")).alias("mix_key"),
    )


_JSONL_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(9001 AS BIGINT), 'web', 'en', CAST(9 AS BIGINT), FALSE),
      (CAST(9002 AS BIGINT), 'web', 'en', CAST(8 AS BIGINT), FALSE),
      (CAST(9003 AS BIGINT), 'books', 'de', CAST(4 AS BIGINT), FALSE),
      (CAST(9004 AS BIGINT), 'web', 'en', CAST(NULL AS BIGINT), FALSE),
      (CAST(9005 AS BIGINT), 'forum', CAST(NULL AS VARCHAR),
       CAST(5 AS BIGINT), FALSE),
      (CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), TRUE),
      (CAST(NULL AS BIGINT), 'web', 'en', CAST(2 AS BIGINT), TRUE))
      AS t(doc_id, source, lang, n_tokens, is_corrupt)
"""


@query("corpus_ingest_jsonl", oracle=_JSONL_ORACLE)
def corpus_ingest_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant JSONL landing ingest — the web-crawl drop format: an
    EXPLICIT schema (never runtime inference at 100 TB) with PERMISSIVE
    mode routing malformed lines and type-mangled fields into a
    _corrupt_record column instead of killing the scan; clean rows get
    token counts, corrupt rows are flagged for the quarantine sink. One
    scan, schema pushdown, no Python. Golden oracle: byte-stable
    fixture (one non-JSON line, one string-typed doc_id, one null
    text)."""
    import os as _os

    fixture = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.dirname(__file__))),
        "tests", "fixtures", "corpus", "landing.jsonl",
    )
    schema = (
        "doc_id bigint, text string, source string, lang string, "
        "_corrupt_record string"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(fixture)
    )
    return raw.select(
        "doc_id",
        "source",
        "lang",
        F.when(
            F.col("text").isNotNull(), F.size(F.split(F.col("text"), " "))
        ).cast("long").alias("n_tokens"),
        F.col("_corrupt_record").isNotNull().alias("is_corrupt"),
    )


_NOVELTY_SQL = f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS t
                  FROM documents),
    grams AS (SELECT doc_id, unnest({sql_shingles(3)}) AS g FROM toks),
    firsts AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
    novel AS (SELECT first_doc AS doc_id, COUNT(*) AS n_novel
              FROM firsts GROUP BY first_doc)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(v.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN NULL
                ELSE ROUND(COALESCE(v.n_novel, 0) * 1.0 / p.n_grams, 4)
           END AS novelty_r
    FROM documents d
    LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    LEFT JOIN novel v ON v.doc_id = d.doc_id
"""


@query("corpus_ngram_novelty", oracle=_NOVELTY_SQL)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-NOVELTY scoring: per document, the fraction of its
    distinct word 3-grams whose FIRST owner (minimum doc_id) is the
    document itself — the curriculum/selection signal behind
    novelty-weighted data ordering (late near-copies of earlier content
    score ~0 without being hard-deleted, complementing the dedup family
    which only emits keep/drop decisions).

    100-TB shape: no gram-level join at all. Novel-gram counts are read
    off the first-owner table itself (a gram's min(doc_id) IS the only
    doc credited with it), so the plan is three partial-agg shuffles —
    grams by doc (per-doc totals), grams by gram (min owner, map-side
    combined to vocabulary size), first-owners by doc — then two
    doc-cardinality joins against the documents base. The shingle
    expression evaluates once per aggregation branch by design: the r10
    anchor probe (SCALE.md, BENCH_SF1.text_anchor_probe) measured that
    exchanging raw exploded tokens to save a duplicate codegen scan
    LOSES — all shuffles here stay post-partial-agg."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(word_shingles(tokens("text"), 3)).alias("g")
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(novel, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias(
                "n_grams"
            ),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias(
                "n_novel"
            ),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) == 0,
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    F.coalesce(F.col("n_novel"), F.lit(0))
                    / F.col("n_grams"),
                    4,
                )
            )
            .alias("novelty_r"),
        )
    )

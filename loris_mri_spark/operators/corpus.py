"""Corpus-preparation operators — the sampling / sharding / decontamination
stages a large-scale training-data pipeline runs between ingestion and the
dedup/quality gates (BASELINE.json north star; first-class alongside
SURVEY §2).

Design rules shared by all three:

- **Determinism over RNG.** `df.sample` seeds per partition, so its output
  changes with partitioning, cluster size and retries. Every operator here
  derives its decision from a salted md5 of the ROW KEY — the same row is
  kept, bucketed or flagged identically on any cluster, any round, any
  retry. That is the property corpus freezes and ablation reruns need, and
  it makes the operators oracle-checkable.
- **ppm, not float fractions.** Rates are integer parts-per-million so the
  keep predicate is pure integer comparison — no float-rounding drift
  between engines.
- **Metadata-sized driver traffic only.** The shard packer collects one
  row per id-bucket (the quantile operator's contract); everything else is
  a filter or a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sample_gate(key_col: Column | str, salt: str) -> Column:
    """Salted 60-bit md5 of the key, reduced to a [0, 1e6) bucket — the
    shared gate expression (oracle mirror:
    ``('0x' || substr(md5(salt || ':' || key), 1, 15))::BIGINT % 1000000``)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), _c(key_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )


def deterministic_sample(
    df: DataFrame, key_col: str, keep_ppm: int, salt: str = "corpus-v1"
) -> DataFrame:
    """Keep rows whose salted hash bucket falls below ``keep_ppm``
    (parts-per-million). A pure filter: pushes down past projections,
    no shuffle, stable across runs/clusters/retries."""
    return df.filter(sample_gate(key_col, salt) < F.lit(int(keep_ppm)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    ppm_by_stratum: dict,
    default_ppm: int = 0,
    salt: str = "corpus-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own ppm
    rate (e.g. downsample boilerplate-heavy languages, keep all of rare
    ones). The rate table broadcasts; the gate is the same salted hash,
    so a row's fate depends only on (salt, key) and its stratum's rate."""
    spark = df.sparkSession
    stratum_type = df.schema[stratum_col].dataType.simpleString()
    rates = spark.createDataFrame(
        [(k, int(v)) for k, v in ppm_by_stratum.items()],
        f"__stratum {stratum_type}, __ppm int",
    )
    return (
        df.join(
            F.broadcast(rates), _c(stratum_col) == F.col("__stratum"), "left"
        )
        .filter(
            sample_gate(key_col, salt)
            < F.coalesce(F.col("__ppm"), F.lit(int(default_ppm)))
        )
        .drop("__stratum", "__ppm")
    )


def budget_shards(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    bucket_width: int = 100_000,
) -> DataFrame:
    """Budget-aligned contiguous sharding: rows ordered by ``id_col`` are
    assigned ``shard_id = (exclusive running sum of weight) div budget``
    — the token-budget shard packing a training pipeline uses to cut a
    corpus into fixed-token-count files while keeping id order (and thus
    any earlier dedup/curriculum ordering) intact.

    Scale shape (the distributed-quantiles contract): NO global-order
    window over the DATA (that is a single-partition sort of every row).
    Ids bucket by ``id div bucket_width`` — a deterministic,
    order-preserving function — per-bucket weight sums are aggregated,
    the exclusive bucket offsets are a prefix-sum window over the
    BUCKET-SUMS DataFrame (O(#buckets) rows — metadata-sized, one
    partition is fine, and it never touches the driver), and the per-row
    running sum is a window WITHIN each bucket (bounded by bucket_width
    rows) plus its bucket's broadcast offset. Weights must be
    non-negative integers; ids non-negative.

    Cost shape: two passes over (id, weight) — the bucket-sums branch
    and the data branch prune different columns, so their exchange
    subtrees don't canonicalize equal and the scan isn't shared (same
    cost as the previous collect-based shape, minus the driver
    materialization). Callers with an expensive weight expression should
    pre-materialize it."""
    import os

    # Null ids are out of contract. The default path FILTERS them (bucket
    # -1 would sort first in the offset prefix-sum window, so a null-id
    # row's weight would silently offset every real bucket and shift all
    # shard_ids) — but a silent filter also means an upstream regression
    # that starts feeding nulls shrinks the output and the weight budget
    # with no signal. Verify/debug runs set LORIS_STRICT_CONTRACTS=1 to
    # FAIL LOUDLY instead: the id goes through a raise_error branch (zero
    # extra passes — the check rides the existing projection), restoring
    # the pre-r9 collect shape's fail-on-None behavior.
    strict = os.environ.get("LORIS_STRICT_CONTRACTS") == "1"
    id_expr = _c(id_col).cast("long")
    if strict:
        id_expr = F.when(
            id_expr.isNull(),
            F.raise_error(
                F.lit(
                    f"budget_shards: null {id_col} is out of contract"
                    " (LORIS_STRICT_CONTRACTS=1)"
                )
            ).cast("long"),
        ).otherwise(id_expr)
    data = (
        df.select(
            id_expr.alias("__id"),
            _c(weight_col).cast("long").alias("__w"),
        )
        .filter(F.col("__id").isNotNull())
        # coalesce makes the bucket key provably NON-NULLABLE: a nullable
        # computed join key gets an isnotnull() filter pushed below the
        # probe-side scan only, duplicating the defining expression and
        # (at worst) blowing codegen limits — the r8 percentile-pick
        # lesson. (Post-filter the coalesce is belt-and-braces for the
        # optimizer's nullability inference, never taken at runtime.)
        # No repartition anchor here: the bucket-sums branch must keep
        # its map-side partial aggregation (pre-shuffle partial_sum per
        # bucket — #buckets rows per mapper, not n), and the data branch
        # gets its hash(__b) exchange from the window's own requirement.
        .withColumn(
            "__b",
            F.coalesce(
                F.expr(f"__id div {int(bucket_width)}"), F.lit(-1)
            ),
        )
    )
    sums = data.groupBy("__b").agg(F.sum("__w").alias("__bw"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    off_df = sums.select(
        F.col("__b").alias("__ob"),
        F.coalesce(F.sum("__bw").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in_bucket = (
        Window.partitionBy("__b")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        data.join(F.broadcast(off_df), data["__b"] == F.col("__ob"))
        .withColumn(
            "__pre",
            F.coalesce(F.sum("__w").over(w_in_bucket), F.lit(0))
            + F.col("__off"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__w").alias(weight_col),
            F.expr(f"__pre div {int(budget)}").alias("shard_id"),
        )
    )


def contamination_screen(
    docs: DataFrame,
    id_col: str,
    shingle_col: str,
    eval_shingles: DataFrame,
    min_hits: int = 2,
) -> DataFrame:
    """Train/eval overlap screening: flag training documents sharing at
    least ``min_hits`` n-grams with a (small, broadcast) eval-set n-gram
    table — the decontamination pass run before a training corpus is
    frozen. ``eval_shingles`` must have a single column ``s``;
    ``shingle_col`` arrays must be per-document distinct (word_shingles
    output is), so the per-doc match count is a plain count, no
    count-distinct shuffle. Returns (id, n_matched, contaminated) for
    docs with >= 1 hit; the big side is touched once, exploded NARROW
    (id + shingle), and aggregated with map-side partials."""
    posts = docs.select(
        _c(id_col).alias("__id"), F.explode(shingle_col).alias("s")
    )
    ev = F.broadcast(eval_shingles.select("s").distinct())
    return (
        posts.join(ev, "s")
        .groupBy("__id")
        .agg(F.count("*").alias("n_matched"))
        .select(
            F.col("__id").alias(id_col),
            "n_matched",
            (F.col("n_matched") >= min_hits).alias("contaminated"),
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a salted
    60-bit md5 sort key; ``shard = hkey % n_shards`` spreads the corpus
    uniformly and ``pos`` is the row's rank within its shard ordered by
    (hkey, id).  The (shard, pos) pair is a reproducible random permutation
    of the corpus — same on any cluster, any partitioning, any retry, and
    re-derivable per row (rehash the id), which `df.orderBy(rand())` can
    never promise.

    Scale shape: this is exactly the training-shard WRITE path —
    ``repartition(n_shards, shard).sortWithinPartitions(hkey)`` — where the
    per-shard sort is the partition-local file sort. ``n_shards`` scales
    with corpus size (100 TB => tens of thousands of shards), so each
    shard's window stays bounded at the intended training-file size; no
    global sort, one shuffle keyed by the uniform hash (skew-free by
    construction)."""
    hkey = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), _c(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    )
    keyed = df.select(
        _c(id_col).alias(id_col), hkey.alias("hkey")
    ).withColumn("shard", (F.col("hkey") % int(n_shards)).cast("long"))
    w = Window.partitionBy("shard").orderBy("hkey", id_col)
    return keyed.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )

"""Vector similarity-search operators over embedding columns
(`array<float>`) — the ANN extension mandated alongside SURVEY §2.

Design for 100 TB:

- **cosine_topk** — the exact baseline: BROADCAST the (bounded) query set,
  one codegen'd pass over the corpus computing dot/norms with JVM
  higher-order functions (zip_with + aggregate, all double math — no
  Python, no UDF), then a per-query top-k window over a narrow
  (query_id, vec_id, cos) projection. Never a corpus x corpus cross join.
- **ivf_topk** — the scale path: coarse-quantize the corpus (here: the
  label column as the cell id; in production a trained codebook), rank
  cells per query by centroid cosine, search only ``nprobe`` cells. The
  per-cell search reuses the same broadcast pattern; candidate count drops
  by ~|cells|/nprobe.
- **hyperplane_lsh_pairs** — random-hyperplane signatures (driver-side
  deterministic literals), banded equi-join for candidate pairs, exact
  cosine verification. Sub-quadratic; recall is tunable via
  (n_planes, bands).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (sequential left-fold sums —
    mirrors DuckDB's list_sum order so oracles agree to float precision)."""
    return dot(a, b) / l2_norm(a) / l2_norm(b)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k by cosine for every query vector against the corpus.

    ``queries`` is broadcast (bounded query-set contract); the corpus is
    scanned once. Self-matches (same id) are excluded. Returns
    (query_id, neighbor_id, rank, cos) with rank 1..k, ties broken by
    neighbor_id ascending.
    """
    qid = query_id_col or id_col
    q = F.broadcast(
        queries.select(
            F.col(qid).alias("query_id"), as_double(vec_col).alias("__qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("__cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cell_centroids(cdouble: DataFrame) -> DataFrame:
    """Per-cell centroid of double vectors: (``__cell``, ``__centroid``).

    Component means come from EXACT decimal sums (each element quantized
    to DECIMAL(27,9), summed exactly, one double conversion + one IEEE
    division) — partition-order independent, so a SQL oracle summing the
    same decimals reproduces every component bit-identically (the same
    numeric contract as the workload's other multi-row float sums). One
    partial-agg shuffle of (cell, pos) pairs; output is |cells| rows,
    broadcast thereafter."""
    return (
        cdouble.select("__cell", F.posexplode("__cv").alias("__pos", "__v"))
        .groupBy("__cell", "__pos")
        .agg(
            (
                F.sum(F.col("__v").cast("decimal(27,9)")).cast("double")
                / F.count("*")
            ).alias("__avg")
        )
        .groupBy("__cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__avg"))
            ).alias("__pairs")
        )
        .select(
            "__cell",
            F.transform("__pairs", lambda p: p["__avg"]).alias("__centroid"),
        )
    )


def _dlit(x: float) -> str:
    """Exact SQL double literal: repr() is the shortest decimal that
    round-trips, and both CPython and the JVM parse decimal text to the
    nearest double (correctly rounded), so the parsed value is
    bit-identical to ``x``."""
    if math.isinf(x):
        return "double('" + ("-" if x < 0 else "") + "Infinity')"
    if math.isnan(x):
        return "double('NaN')"
    return repr(float(x)) + "D"


def _cells_lit_sql(cents: "list[tuple[int, list[float]]]") -> str:
    """SQL text of the array<struct<cell:bigint, cv:array<double>>>
    literal over the trained centroids. The whole argmax expression is
    parsed from ONE SQL string (see kmeans_argmax_struct): building it
    column-by-column costs one py4j round-trip per lit/struct/array/
    lambda call — measured ~0.5 s per argmax expression at k=8, dim=64,
    paid once per training round and once per assignment, which
    DOMINATED the train loop at bench scale. One F.expr parse is ~2 ms."""
    return "array(%s)" % ", ".join(
        "named_struct('cell', %dL, 'cv', array(%s))"
        % (int(cid), ", ".join(_dlit(v) for v in cv))
        for cid, cv in sorted(cents)
    )


def kmeans_argmax_struct(
    vec_col: str, cents: "list[tuple[int, list[float]]]"
) -> Column:
    """``struct(c, cell)`` of the argmax-cosine centroid for the double
    array column named ``vec_col``, over DRIVER-SIDE centroid literals
    (k rows of trained model state — the same bounded-model contract as
    the broadcast centroid table, just folded into the expression). Ties
    go to the LOWEST cell: cells are scored in ascending id order and the
    RUNTIME left-fold replaces only on strictly-greater cosine — exactly
    ``max_by(cell, struct(cos, -cell))`` under Spark's NaN-is-largest
    comparison ordering. The cosine is the same sequential-fold shape as
    :func:`cosine` (zip_with product fold / l2(a) / l2(b)), so every
    (row, cell) pair computes bit-identical doubles to the former
    crossJoin formulation (and to the DuckDB oracle's ``_SQL_COS``).

    Shape notes: the fold must be a runtime ``aggregate`` over an array
    of per-cell scores, NOT a nested when-chain — a chain of
    ``when(cand > best, cand).otherwise(best)`` embeds ``best`` twice per
    level, doubling the expression tree per cell (2^k blowup; measured:
    planning alone pinned the driver for minutes at k=8). And the whole
    expression is parsed from ONE SQL string: the Column-API build cost
    ~0.5 s of py4j round-trips per call at k=8/dim=64 (one JVM hop per
    lit/struct/lambda; the higher-order lambda conversion alone is
    ~0.15 s), paid once per training round and once per assignment —
    F.expr of the equivalent text is ~2 ms and parses to the same
    Catalyst nodes (CaseWhen, zip_with/aggregate folds, double
    literals), so the computed values are unchanged."""
    assert cents, "kmeans_argmax_struct: empty centroid list"
    v = vec_col
    cos = (
        "aggregate(zip_with({v}, s.cv, (xx, yy) -> xx * yy), 0.0D,"
        " (acc, xx) -> acc + xx)"
        " / sqrt(aggregate({v}, 0.0D, (acc, xx) -> acc + xx * xx))"
        " / sqrt(aggregate(s.cv, 0.0D, (acc, xx) -> acc + xx * xx))"
    ).format(v=v)
    sql = (
        "aggregate("
        "transform({cells}, s -> named_struct('c', {cos}, 'cell', s.cell)), "
        "named_struct('c', double('-Infinity'), 'cell', -1L), "
        "(acc, s) -> CASE WHEN s.c > acc.c THEN s ELSE acc END"
        ")"
    ).format(cells=_cells_lit_sql(cents), cos=cos)
    return F.expr(sql)


def kmeans_train(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    n_iter: int = 2,
) -> "tuple[list[tuple[int, list[float]]], list[tuple[int, list[float]]]]":
    """Run the deterministic spherical k-means training loop and return
    the trained centroids as driver-side lists [(cell_id, centroid)].

    Identical procedure to the pre-r13 DataFrame-only loop (seeds = first
    ``n_cells`` vectors by id, cell label = seed id, argmax-cosine
    assignment with ties to the lowest cell, decimal-exact component-mean
    updates via cell_centroids) — but assignment is a MAP-SIDE expression
    against centroid literals instead of a crossJoin + groupBy(id), so
    each round costs ONE job with a single narrow (cell, pos) partial-agg
    shuffle. The old shape shuffled the full vector payload per round
    (groupBy(__id) carrying __cv) on top of the k-way row explosion; at
    100 TB that was n_iter full-corpus shuffles of the embedding column —
    now zero. The per-round collect is k rows of model state (same
    bounded-contract collect as kmeans_cells_arrow's partial combine).

    Returns ``(assign_cents, final_cents)``: the centroid list the FINAL
    assignment is computed against (c_{n_iter-1} — the last round's
    assignment precedes its update, mirroring the oracle's a{n}/c{n-1}
    pairing) and the fully-updated centroid list (c_{n_iter})."""
    v = vectors.select(
        F.col(id_col).alias("__id"), as_double(vec_col).alias("__cv")
    )
    seeds = v.orderBy("__id").limit(n_cells).collect()
    cents: "list[tuple[int, list[float]]]" = sorted(
        (int(r["__id"]), list(r["__cv"])) for r in seeds
    )
    assign_cents = cents
    for _ in range(n_iter):
        assign_cents = cents
        assigned = v.select(
            kmeans_argmax_struct("__cv", cents)["cell"].alias("__cell"),
            "__cv",
        )
        # Collect the FLAT (cell, pos, avg) partial-agg output and
        # assemble centroids driver-side: same per-component math as
        # cell_centroids (exact decimal sum -> one double divide, so
        # bit-identical components) minus its second groupBy/collect_list
        # stage — one exchange per training round instead of two. k*dim
        # rows of model state cross the driver, the same bounded-contract
        # collect as the k-row version.
        rows = (
            assigned.select(
                "__cell", F.posexplode("__cv").alias("__pos", "__v")
            )
            .groupBy("__cell", "__pos")
            .agg(
                (
                    F.sum(F.col("__v").cast("decimal(27,9)")).cast("double")
                    / F.count("*")
                ).alias("__avg")
            )
            .collect()
        )
        by_cell: "dict[int, list[tuple[int, float]]]" = {}
        for r in rows:
            by_cell.setdefault(int(r["__cell"]), []).append(
                (int(r["__pos"]), float(r["__avg"]))
            )
        cents = sorted(
            (c, [a for _, a in sorted(pairs)])
            for c, pairs in by_cell.items()
        )
    return assign_cents, cents


def kmeans_cells(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    n_iter: int = 2,
    keep_cols: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Trained coarse quantizer for IVF: spherical k-means over the corpus.
    Returns (assignment (id, cell), centroids (__cell, __centroid)).

    Deterministic end to end: seeds are the first ``n_cells`` vectors by
    id (cell label = seed id), assignment is argmax cosine with ties to
    the lowest cell, updates are the decimal-exact component means of
    cell_centroids (see kmeans_train). The returned assignment is a pure
    MAP-SIDE projection over the input (argmax against the trained
    centroid literals) — consuming it costs one corpus scan and no
    shuffle, where the pre-r13 version dragged the whole training lineage
    (n_iter crossJoin + payload-shuffle rounds) into every consumer's
    plan. Rounds are O(n_iter) full-data passes — the standard k-means
    cost profile, linear at 100 TB.

    ``keep_cols=True`` returns the assignment as the INPUT rows plus the
    ``cell`` column (still the same pure projection): a consumer that
    needs the vector (or any other column) next to the cell label takes
    it directly instead of joining the corpus against the (id, cell)
    table — that join is a corpus self-join (broadcast of a corpus-sized
    table at best, a full corpus shuffle at scale) carrying data the
    projection already had."""
    assign_cents, final_cents = kmeans_train(
        vectors, id_col, vec_col, n_cells, n_iter
    )
    # coalesce(-1): the argmax fold runs over a LITERAL centroid array, so
    # it can never actually be null — but Catalyst cannot prove that, and
    # a downstream join on `cell` infers an isnotnull(cell) filter that is
    # pushed BELOW this projection, duplicating the whole k*dim-literal
    # fold as a per-row Filter condition (measured: the argmax — the
    # query's dominant expression — evaluated twice per corpus row in
    # dedup_semdedup / ann_ivf_kmeans_topk). The coalesce makes the
    # column non-nullable, so the inferred isnotnull constant-folds away.
    # Values are unchanged (x is never null); IF it ever were, a null key
    # is dropped by an inner join exactly as -1 is (no centroid id is -1).
    def _cell(col: Column) -> Column:
        return F.coalesce(col, F.lit(-1).cast("long"))

    if keep_cols:
        assignment = (
            vectors.withColumn("__kc_cv", as_double(vec_col))
            .withColumn(
                "cell",
                _cell(kmeans_argmax_struct("__kc_cv", assign_cents)["cell"]),
            )
            .drop("__kc_cv")
        )
    else:
        assignment = vectors.select(
            F.col(id_col), as_double(vec_col).alias("__cv")
        ).select(
            F.col(id_col),
            _cell(
                kmeans_argmax_struct("__cv", assign_cents)["cell"]
            ).alias("cell"),
        )
    centroids = vectors.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in final_cents],
        "__cell long, __centroid array<double>",
    )
    return assignment, centroids


def _unit_rows(m: "np.ndarray") -> "np.ndarray":
    n_ = np.sqrt((m * m).sum(axis=1, keepdims=True))
    n_[n_ == 0] = 1.0
    return m / n_


def _kmeans_arrow_train(
    v: DataFrame, n_cells: int, n_iter: int
) -> "tuple[np.ndarray, np.ndarray]":
    """The Arrow k-means TRAINING rounds over ``v`` (__id, __cv), returning
    the driver-side model (cell_ids, cent). Procedure bit-identical to the
    historical kmeans_cells_arrow loop: seeds = first n_cells vectors by
    id, per-batch partial (cell, cnt, vsum) rows, fixed combine order.
    Shared by the flat Arrow trainer and the two-level trainer so the
    latter can fuse coarse assignment into its fine-stage input pass
    instead of joining an assignment table back against the corpus."""
    seeds = v.orderBy("__id").limit(n_cells).collect()  # k rows, bounded
    cell_ids = np.array([r["__id"] for r in seeds], dtype=np.int64)
    cent = np.array([r["__cv"] for r in seeds], dtype=np.float64)
    dim = cent.shape[1]

    partial_schema = "cell long, cnt long, vsum array<double>"

    for _ in range(n_iter):
        cu = _unit_rows(cent).T  # dim x k, cells ordered ASC by id -> argmax
        # ties resolve to the lowest cell, matching kmeans_cells

        def partials(batches, _cu=cu, _cells=cell_ids):  # noqa: ANN001
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(pdf["__cv"].tolist(), dtype=np.float64)
                a = np.argmax(_unit_rows(mat) @ _cu, axis=1)
                out = []
                for ci in np.unique(a):
                    sel = mat[a == ci]
                    out.append(
                        {
                            "cell": int(_cells[ci]),
                            "cnt": int(sel.shape[0]),
                            "vsum": sel.sum(axis=0).tolist(),
                        }
                    )
                yield pd.DataFrame(out, columns=["cell", "cnt", "vsum"])

        rows = v.mapInPandas(partials, partial_schema).collect()
        # fixed combine order: collect() row order is not guaranteed and
        # float addition is not associative — sort so the same inputs
        # always produce bit-identical centroids
        rows.sort(key=lambda r: (r["cell"], r["cnt"], tuple(r["vsum"])))
        sums: dict[int, "np.ndarray"] = {}
        cnts: dict[int, int] = {}
        for r in rows:
            c = r["cell"]
            sums[c] = sums.get(c, np.zeros(dim)) + np.array(r["vsum"])
            cnts[c] = cnts.get(c, 0) + r["cnt"]
        alive = sorted(cnts)
        cell_ids = np.array(alive, dtype=np.int64)
        cent = np.array([sums[c] / cnts[c] for c in alive], dtype=np.float64)

    return cell_ids, cent


def kmeans_cells_arrow(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    n_iter: int = 2,
    member_vecs: bool = False,
) -> "tuple[DataFrame, DataFrame]":
    """Throughput variant of kmeans_cells — the 100 TB training path.

    Same deterministic procedure (seeds = first n_cells vectors by id,
    cell label = seed id, argmax-cosine assignment with ties to the
    lowest cell, component-mean update) but the per-round math runs as
    float64 numpy in Arrow-batched tasks: assignment is ONE
    (batch x dim) @ (dim x k) matmul against the broadcast centroid
    matrix instead of n_cells Catalyst fold expressions per row, and the
    update combines per-batch partial (cell, count, sum-vector) rows on
    the driver — O(k x partitions) rows, the standard distributed
    k-means combine, a bounded-contract collect.

    Trade: double-precision means a centroid component can differ from
    kmeans_cells' decimal-exact mean in the last ulp, so a borderline
    argmax tie can assign differently — this operator is for corpus-scale
    training (raising k with n), while kmeans_cells stays the
    oracle-parity anchor the driver-checked queries pin. Measured at
    sf1/k=141 the fold-expression trainer costs ~104 s vs ~8 s here
    (BENCH_SF1.json r8).

    ``member_vecs=True`` makes the assignment additionally carry ``__vec``
    (the as_double image of ``vec_col``) straight out of the assign pass
    — same contract as kmeans_cells_two_level(member_vecs=True): the
    vector is already in the Python worker's batch, so emitting it costs
    one extra Arrow column, where the consumer's alternative is a corpus
    self-join against the (id, cell) table.
    """
    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("__id"), as_double(vec_col).alias("__cv")
    )
    cell_ids, cent = _kmeans_arrow_train(v, n_cells, n_iter)
    cu = _unit_rows(cent).T

    def assign(batches, _cu=cu, _cells=cell_ids, _mv=member_vecs):  # noqa: ANN001
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf["__cv"].tolist(), dtype=np.float64)
            a = np.argmax(_unit_rows(mat) @ _cu, axis=1)
            out = {"__id": pdf["__id"].to_numpy(), "cell": _cells[a]}
            if _mv:
                out["__vec"] = pdf["__cv"]
            yield pd.DataFrame(out)

    schema = "__id long, cell long" + (
        ", __vec array<double>" if member_vecs else ""
    )
    cols = [F.col("__id").alias(id_col), "cell"] + (
        ["__vec"] if member_vecs else []
    )
    assignment = v.mapInPandas(assign, schema).select(*cols)
    centroids = spark.createDataFrame(
        [(int(c), [float(x) for x in cent[i]]) for i, c in enumerate(cell_ids)],
        "__cell long, __centroid array<double>",
    )
    return assignment, centroids


def kmeans_cells_two_level(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k_coarse: int,
    k_fine: int,
    n_iter: int = 2,
    coarse_cell_cap: int = 4_000_000,
    member_vecs: bool = False,
) -> "tuple[DataFrame, DataFrame]":
    """Two-level (coarse -> fine) trained quantizer — the standard remedy
    (IMI / coarse-then-fine, Babenko & Lempitsky 2012) for the
    single-level k ~ sqrt(n) training cost SCALE.md measured as an
    O(n^1.5) tail on `dedup_semdedup_sqrtk`.

    Level 1: the `kmeans_cells_arrow` training rounds over the corpus
    with ``k_coarse`` cells (O(n x k_coarse) matmul work per round); the
    coarse assignment is FUSED into the fine stage's input pass (one
    mapInPandas carrying the vector through), not joined back against
    the corpus — the trained model is k rows of driver state, so tagging
    costs one scan and zero joins. Level 2: INSIDE each coarse cell, an
    independent local spherical k-means with min(k_fine, |cell|) seeds,
    run as ONE applyInPandas grouped-map stage parallelized over coarse
    cells. Each fine kernel applies the exact `kmeans_cells_arrow`
    contract to its slice: seeds = first k vectors by id within the
    cell, cell label = seed vector id (globally unique across coarse
    cells, because a vector id seeds at most one cell), argmax-cosine
    assignment with first-max / lowest-label ties, float64
    component-mean updates, dead seeds dropped.

    Cost: per-vector assignment is O(k_coarse + k_fine) instead of the
    flat quantizer's O(k_coarse x k_fine). For k_total ~ sqrt(n) cells
    (the SemDeDup sizing) pick k_coarse = k_fine = ceil(sqrt(k_total)):
    total work O(n^(5/4)) vs single-level O(n^(3/2)).

    Scale contract: the fine stage holds ONE coarse cell per task;
    ``coarse_cell_cap`` RAISES (never truncates) when a coarse cell
    exceeds it — the remedy is raising k_coarse (cells average
    n / k_coarse rows; Level 1's cost is linear in k_coarse so headroom
    is cheap). Returns (assignment (id_col, cell), centroids
    (__cell, __centroid)) where ``cell`` is the FINE label — the same
    shape as the flat trainers, so SemDeDup / IVF consume it unchanged.
    With ``member_vecs=True`` the assignment additionally carries
    ``__vec`` (the as_double image of ``vec_col``): every current
    consumer re-joins the corpus to get the vector next to the cell
    label, and that join is a full corpus shuffle the fine stage's
    output can provide for free.
    """
    v = vectors.select(
        F.col(id_col).alias("__id"), as_double(vec_col).alias("__cv")
    )
    coarse_ids, coarse_cent = _kmeans_arrow_train(v, k_coarse, n_iter)
    cu = _unit_rows(coarse_cent).T

    def tag(batches, _cu=cu, _cells=coarse_ids):  # noqa: ANN001
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf["__cv"].tolist(), dtype=np.float64)
            a = np.argmax(_unit_rows(mat) @ _cu, axis=1)
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"].to_numpy(),
                    "__cv": pdf["__cv"],
                    "__coarse": _cells[a],
                }
            )

    tagged = v.mapInPandas(
        tag, "__id long, __cv array<double>, __coarse long"
    )

    def fine_kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) > coarse_cell_cap:
            raise ValueError(
                f"coarse cell {int(pdf['__coarse'].iloc[0])} has "
                f"{len(pdf)} rows, over the {coarse_cell_cap}-row task "
                "cap: raise k_coarse so fine training fits one task"
            )
        pdf = pdf.sort_values("__id")
        ids = pdf["__id"].to_numpy(dtype=np.int64)
        mat = np.array(pdf["__cv"].tolist(), dtype=np.float64)
        k = min(k_fine, len(ids))
        cell_ids = ids[:k].copy()
        cent = mat[:k].copy()
        for _ in range(n_iter):
            a = np.argmax(_unit_rows(mat) @ _unit_rows(cent).T, axis=1)
            alive = sorted(set(a.tolist()))
            cent = np.array([mat[a == ci].mean(axis=0) for ci in alive])
            cell_ids = cell_ids[alive]
        a = np.argmax(_unit_rows(mat) @ _unit_rows(cent).T, axis=1)
        # per-MEMBER rows (cell, id, vec), the fine centroid attached to
        # the cell's first member row only (null elsewhere): one output
        # feeds both the centroid table and the vector-carrying
        # assignment, so no consumer has to join the corpus back. A cell
        # alive after the last update can still end MEMBERLESS in the
        # final argmax; it gets a row with null id/vec so the centroid
        # table keeps the exact historical cell set (an IVF probe may
        # rank such a cell — dropping it would change probe choices).
        out_cells = [int(cell_ids[int(ci)]) for ci in a]
        out_id: list = ids.tolist()
        out_cv: list = [mat[i].tolist() for i in range(len(ids))]
        out_cent: list = [None] * len(ids)
        for ci in range(len(cell_ids)):
            pos = np.nonzero(a == ci)[0]
            if len(pos):
                out_cent[int(pos[0])] = cent[ci].tolist()
            else:
                out_cells.append(int(cell_ids[ci]))
                out_id.append(None)
                out_cv.append(None)
                out_cent.append(cent[ci].tolist())
        return pd.DataFrame(
            {
                "cell": out_cells,
                "__id": out_id,
                "__cv": out_cv,
                "centroid": out_cent,
            }
        )

    # One row per MEMBER (the payload any consumer needs anyway).
    # Explicit-exchange anchor: BOTH outputs embed the identical
    # repartition subplan, so the fine-training stage runs once and the
    # second consumer reads the shuffle files back (ReusedExchange) — no
    # lazy checkpoint, no heap pinning.
    # ONE-JOB ASSUMPTION: ReusedExchange dedups within a single job, so
    # the compute-once guarantee holds only when a caller consumes both
    # returned DataFrames in one plan (every current caller does —
    # assignment joins centroids downstream). A caller triggering them
    # as SEPARATE actions re-runs coarse+fine training per action
    # (identical results — the kernels are deterministic); such callers
    # should persist/checkpoint `summary` themselves before splitting.
    summary = (
        tagged.groupBy("__coarse")
        .applyInPandas(
            fine_kernel,
            "cell long, __id long, __cv array<double>, "
            "centroid array<double>",
        )
        .repartition("cell")
    )
    cols = [F.col("__id").alias(id_col), "cell"]
    if member_vecs:
        cols.append(F.col("__cv").alias("__vec"))
    assignment = summary.filter(F.col("__id").isNotNull()).select(*cols)
    centroids = summary.filter(F.col("centroid").isNotNull()).select(
        F.col("cell").alias("__cell"), F.col("centroid").alias("__centroid")
    )
    return assignment, centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    k: int,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: search only the ``nprobe`` cells whose centroid is
    most cosine-similar to the query. Deterministic given the cell
    assignment. Returns (query_id, neighbor_id, rank, cos).

    The centroid table is |cells| rows — computed with one partial-agg
    shuffle (posexplode -> exact-decimal mean per (cell, dim) ->
    re-assemble), broadcast thereafter; pass ``centroids`` to reuse a
    trained codebook (kmeans_cells). At 100 TB only the candidate cells'
    vectors are scored: the cell filter prunes the corpus scan by cell
    partition at rest.
    """
    cdouble = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("__cell"),
        as_double(vec_col).alias("__cv"),
    )
    if centroids is None:
        centroids = cell_centroids(cdouble)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("__ccos").desc(), F.col("__cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "__qv",
            "__cell",
            cosine(F.col("__qv"), F.col("__centroid")).alias("__ccos"),
        )
        .withColumn("__crank", F.row_number().over(probe_w))
        .filter(F.col("__crank") <= nprobe)
        .select("query_id", "__qv", "__cell")
    )
    scored = (
        F.broadcast(probes)
        .join(cdouble, "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _hyperplanes(n_planes: int, dim: int, seed: str = "hp") -> list[list[float]]:
    """Deterministic pseudo-random unit-less hyperplanes from md5 — stable
    across runs/executors (SURVEY §7.3 reproducible-identity discipline)."""
    planes = []
    for b in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{b}:{j}".encode()).hexdigest()
            u = int(h[:15], 16) / float(1 << 60)  # [0, 1)
            row.append(2.0 * u - 1.0)
        planes.append(row)
    return planes


def hyperplane_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int = 32,
    bands: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, via random-hyperplane
    LSH: sign-bit signature (n_planes bits) -> banded equi-join for
    candidates -> exact cosine verification. Returns (i, j, cos), i < j.

    P(candidate) = 1 - (1 - p^r)^bands with p = 1 - theta/pi; with 32
    planes in 16 bands of 2 the miss rate at cos 0.5 is ~2e-4 and falls
    super-exponentially as cos -> 1.
    """
    assert n_planes % bands == 0
    r = n_planes // bands
    if dim is None:
        # Schema-only probe (no job): an array<T> column's element width is
        # not in the schema, so require the caller to pass dim rather than
        # silently running a driver-side first() against a 100 TB input.
        raise ValueError(
            "hyperplane_lsh_pairs requires dim= (embedding width); "
            "sniffing it would run a driver-side job on the full input"
        )
    planes = _hyperplanes(n_planes, dim)

    v = df.select(F.col(id_col).alias("i"), as_double(vec_col).alias("__v"))

    # Signature computation is a dense matrix product (n x dim @ dim x
    # n_planes) — the one place vectorized Python beats JVM higher-order
    # functions: an Arrow-batched pandas UDF does the matmul in numpy
    # (the 32-way zip_with/aggregate expression tree cost ~10s at sf0.1
    # in codegen'd JVM vs milliseconds here, plus seconds of codegen
    # compile for the giant expression). The band table stays NARROW
    # (id + band key): the candidate join and distinct never shuffle
    # embedding arrays.
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    plane_mat = np.asarray(planes, dtype="float64")  # n_planes x dim

    @pandas_udf(ArrayType(StringType()))
    def band_keys(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.map(lambda a: np.asarray(a, dtype="float64")))
        bits = (mat @ plane_mat.T >= 0).astype("uint8")  # n x n_planes
        out = [
            ["".join(map(str, row[b * r : (b + 1) * r])) for b in range(bands)]
            for row in bits
        ]
        return pd.Series(out)

    # Explicit-exchange anchor on the join keys: both candidate-join
    # sides embed the identical repartition subplan, so the signature
    # matmul (the expensive stage) executes once in the exchange's map
    # stage and the renamed right side reads the shuffle files back as
    # ReusedExchange — and the equi-join itself needs no further shuffle.
    # Shuffle rows are (id, band, key) — narrow, on disk, no heap pin.
    band_tbl = v.select(
        "i", F.posexplode(band_keys(F.col("__v"))).alias("band", "bkey")
    ).repartition("band", "bkey")

    cand = (
        band_tbl.alias("x")
        .join(
            band_tbl.select(F.col("i").alias("j"), "band", "bkey").alias("y"),
            ["band", "bkey"],
        )
        .filter(F.col("x.i") < F.col("y.j"))
        .select("i", "j")
        .distinct()
    )
    va = v.select(F.col("i"), F.col("__v"))
    vb = v.select(F.col("i").alias("j"), F.col("__v").alias("__vj"))
    return (
        cand.join(va, "i")
        .join(vb, "j")
        .withColumn("cos", cosine(F.col("__v"), F.col("__vj")))
        .filter(F.col("cos") >= threshold)
        .select("i", "j", "cos")
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance, sequential left-fold (oracle-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    k: int = 5,
) -> DataFrame:
    """PRODUCT-QUANTIZATION ANN with asymmetric distance computation
    (ADC): vectors are split into ``n_sub`` subspaces, each encoded as
    its nearest codeword id — 64 float32 dims become 8 small codes
    (32x compression) — and a query scores a vector by summing its
    per-subspace lookup-table distances, never touching the raw vector.

    The scale story is the point: after the one-time encode, the ANN
    scan reads only the code table (n x n_sub tiny ints); the query's
    distance TABLES (n_queries x n_sub x n_codes rows) broadcast, and
    ADC is a narrow equi-join + sum. The codebook here is the
    seed-sample (sub-slices of the first ``n_codes`` vectors by id) —
    production trains it offline with exactly the kmeans_cells loop
    (ann_ivf_kmeans_topk pins that machinery); encode/ADC are identical
    either way.

    Determinism contract: per-subspace distances are quantized to
    BIGINT NANO-UNITS (floor(d * 1e9 + 0.5)) before summing — the
    operators/rank.py trick — so ADC totals are exact integers and the
    (adist, id) ranking can never flip on a last-ulp difference
    between engines. Returns (query_id, neighbor_id, rank,
    adist_nanos)."""
    NANO = 1_000_000_000

    def subspaces(df: DataFrame, out_id: str) -> DataFrame:
        v = df.select(
            F.col(id_col).alias(out_id), as_double(vec_col).alias("__cv")
        )
        return v.select(
            out_id,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.slice(
                                "__cv", s * sub_dim + 1, sub_dim
                            ).alias("sv"),
                        )
                        for s in range(n_sub)
                    ]
                )
            ).alias("__sub"),
        ).select(out_id, "__sub.s", "__sub.sv")

    corp_sub = subspaces(corpus, "__id")
    # seed-sample = the first n_codes vectors in id order (TakeOrdered,
    # not `id < n_codes`: sparse/offset/non-numeric ids would silently
    # under-fill the codebook); identical for dense 0-based ids
    codebook = subspaces(
        corpus.orderBy(id_col).limit(n_codes), "__code"
    ).select("__code", "s", F.col("sv").alias("cw"))

    dist_n = F.floor(l2sq(F.col("sv"), F.col("cw")) * NANO + 0.5).cast(
        "long"
    )
    codes = (
        corp_sub.join(F.broadcast(codebook), "s")
        .select("__id", "s", "__code", dist_n.alias("dn"))
        .groupBy("__id", "s")
        .agg(
            F.min_by("__code", F.struct("dn", "__code")).alias("code")
        )
    )
    tables = (
        subspaces(queries, "query_id")
        .join(F.broadcast(codebook), "s")
        .select("query_id", "s", "__code", dist_n.alias("dn"))
    )
    adc = (
        codes.join(
            F.broadcast(tables),
            (codes["s"] == tables["s"]) & (codes["code"] == tables["__code"]),
        )
        .filter(F.col("__id") != F.col("query_id"))
        .groupBy("query_id", "__id")
        .agg(F.sum("dn").alias("adist_nanos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_nanos").asc(), F.col("__id").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("__id").alias("neighbor_id"),
            "rank",
            "adist_nanos",
        )
    )

"""Vector-family invariants beyond the oracle parity suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from loris_mri_spark import workload
from loris_mri_spark.catalog import load_table
from loris_mri_spark.operators.vectors import as_double, cosine

workload.load_all()


def _brute_pairs(spark, sf_dir, threshold):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    a = e.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    return {
        (r["i"], r["j"])
        for r in a.crossJoin(b)
        .filter(F.col("i") < F.col("j"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("i", "j")
        .collect()
    }


def test_lsh_pairs_subset_and_recall(spark, sf_dir):
    lsh = {
        (r["i"], r["j"])
        for r in workload.QUERIES["vec_cosine_pairs_lsh"](spark, sf_dir).collect()
    }
    brute = _brute_pairs(spark, sf_dir, 0.45)
    assert lsh <= brute, "LSH returned a pair below threshold (precision break)"
    if brute:
        recall = len(lsh) / len(brute)
        assert recall >= 0.9, f"LSH recall {recall:.2f} below 0.9 on testdata"


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF correctness is oracle-checked; this measures recall vs exact.
    The synthetic labels are WEAK cosine clusters (max pairwise cosine in
    the corpus is ~0.51), so nprobe=2/10 recovers ~30% here — on real
    clustered embeddings this rises with cluster purity. Assert a floor so
    a broken probe selection (recall ~ nprobe/cells * k ~ 0) still fails."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in workload.QUERIES["ann_cosine_topk_exact"](spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in workload.QUERIES["ann_ivf_topk"](spark, sf_dir).collect()
    }
    assert len(ivf & exact) / len(exact) >= 0.2


def test_ivf_kmeans_recall_beats_label_cells(spark, sf_dir):
    """The trained coarse quantizer must recover most exact neighbors at
    nprobe=2/8 — measured 0.86 on testdata vs 0.32 for label-as-cell
    (weak label clusters); assert a conservative floor."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in workload.QUERIES["ann_cosine_topk_exact"](spark, sf_dir).collect()
    }
    km = {
        (r["query_id"], r["neighbor_id"])
        for r in workload.QUERIES["ann_ivf_kmeans_topk"](spark, sf_dir).collect()
    }
    assert len(km & exact) / len(exact) >= 0.6


def test_pq_recall_and_codebook_scaling(spark, sf_dir):
    """PQ with the seed-sample codebook on RANDOM embeddings — PQ's
    worst case (no cluster structure to exploit) — must still beat
    chance (random top-5 of 500: E[recall] = 1%) and must improve as
    the codebook grows; the trained-codebook lift is pinned separately
    by ann_ivf_kmeans_topk's recall test."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.operators.vectors import as_double, l2sq, pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    a = q.select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
    )
    b = e.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double("embedding").alias("cv"),
    )
    exact = (
        a.crossJoin(b)
        .filter("query_id != neighbor_id")
        .withColumn("d", l2sq(F.col("qv"), F.col("cv")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("d").asc(), F.col("neighbor_id").asc()
                )
            ),
        )
        .filter("rn <= 5")
        .select("query_id", "neighbor_id")
    )

    def recall(n_codes: int) -> float:
        pq = pq_topk(
            q, e, id_col="vec_id", vec_col="embedding", n_codes=n_codes
        ).select("query_id", "neighbor_id")
        return pq.join(exact, ["query_id", "neighbor_id"]).count() / 50

    r16, r64 = recall(16), recall(64)
    assert r16 >= 0.10, r16          # >= 10x chance
    assert r64 > r16, (r16, r64)     # codebook size buys recall


def test_pq_codebook_robust_to_offset_ids(spark, sf_dir):
    """The codebook seed-sample is the first n_codes vectors in id ORDER
    (row-selection), not `id < n_codes` (value comparison) — with
    offset ids the latter silently yields an empty codebook and zero
    results. Shifting every id by 1e6 must not change the neighbors."""
    from pyspark.sql import functions as F

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.operators.vectors import pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    base = pq_topk(q, e, id_col="vec_id", vec_col="embedding", n_codes=16)
    OFF = 1_000_000
    e2 = e.withColumn("vec_id", F.col("vec_id") + OFF)
    q2 = q.withColumn("vec_id", F.col("vec_id") + OFF)
    shifted = pq_topk(
        q2, e2, id_col="vec_id", vec_col="embedding", n_codes=16
    ).select(
        (F.col("query_id") - OFF).alias("query_id"),
        (F.col("neighbor_id") - OFF).alias("neighbor_id"),
        "rank",
        "adist_nanos",
    )
    assert base.exceptAll(shifted).isEmpty()
    assert shifted.exceptAll(base).isEmpty()


def test_semdedup_keep_rule_invariants(spark, sf_dir):
    """SemDeDup structural invariants, independent of the oracle:
    exactly one keep per component, the kept member is the component's
    centroid-cosine argmin (ties to lowest vec_id), every component's
    members share a cell (edges never cross cells), and every listed
    member really has a >=0.45 within-cell partner (no isolated rows)."""
    rows = workload.QUERIES["dedup_semdedup"](spark, sf_dir).collect()
    assert rows, "testdata should contain semantic duplicates at 0.45"
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1, f"component {comp}: {len(keeps)} keeps"
        best = min(members, key=lambda m: (m["cos_centroid_r"], m["vec_id"]))
        assert keeps[0]["vec_id"] == best["vec_id"]
        assert len({m["cell"] for m in members}) == 1, (
            f"component {comp} straddles cells"
        )
        assert len(members) >= 2, f"component {comp} has an isolated member"
        assert comp == min(m["vec_id"] for m in members)


def test_semdedup_singleton_and_edge_free_cells(spark, tmp_path):
    """Cells with one member (no pair space) and members with no >=eps
    partner must vanish from the output — and the empty per-cell frame
    must carry real dtypes through Arrow. Identical twins tie on
    centroid-cosine and keep the lowest id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (0, [1.0] + [0.0] * 63, 0),
        (1, [0.0, 1.0] + [0.0] * 62, 0),  # orthogonal: no duplicate
        (2, [1.0] + [0.0] * 63, 0),  # identical twin of 0
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = workload.QUERIES["dedup_semdedup"](spark, str(tmp_path)).collect()
    assert {(r["vec_id"], r["component"], r["keep"]) for r in out} == {
        (0, 0, True),
        (2, 0, False),
    }


def test_semdedup_kernel_refuses_oversized_cell():
    """The cell cap is a guard, not a suggestion: a cell over
    _SEMDEDUP_CELL_CAP rows must refuse with the raise-k remedy BEFORE
    any O(n^2)-shaped work, not OOM an executor mid-matmul."""
    import numpy as np
    import pandas as pd
    import pytest

    from loris_mri_spark.workload import vectors as V

    n = 5
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "cell": np.full(n, 3, dtype="int64"),
            "emb": [[1.0, 0.0]] * n,
            "ccos": np.zeros(n),
        }
    )
    orig = V._SEMDEDUP_CELL_CAP
    try:
        V._SEMDEDUP_CELL_CAP = n - 1
        with pytest.raises(ValueError, match="raise n_cells"):
            V.semdedup_cell_kernel(pdf)
    finally:
        V._SEMDEDUP_CELL_CAP = orig
    # the real cap admits the same cell untouched
    assert len(V.semdedup_cell_kernel(pdf)) == n


def test_semdedup_kernel_blocked_equals_single_block():
    """The row-blocked similarity path (block smaller than the cell, so
    pairs span block boundaries) must produce exactly the single-block
    result on the same cell."""
    import numpy as np
    import pandas as pd

    from loris_mri_spark.workload import vectors as V

    rng = np.random.default_rng(42)
    n, dim = 23, 5
    mat = rng.normal(size=(n, dim)) + 0.3
    pdf = pd.DataFrame(
        {
            "vec_id": (np.arange(n) * 7 + 2).astype("int64"),
            "cell": np.full(n, 1, dtype="int64"),
            "emb": [list(map(float, r)) for r in mat],
            "ccos": rng.uniform(-1, 1, size=n),
        }
    )
    full = V.semdedup_cell_kernel(pdf.copy())
    orig = V._SEMDEDUP_BLOCK
    try:
        V._SEMDEDUP_BLOCK = 4  # forces 6 blocks with cross-block pairs
        blocked = V.semdedup_cell_kernel(pdf.copy())
    finally:
        V._SEMDEDUP_BLOCK = orig
    key = lambda df: sorted(  # noqa: E731
        (r.vec_id, r.component, r.cell, round(r.ccos, 12), r.keep)
        for r in df.itertuples(index=False)
    )
    assert key(blocked) == key(full)
    assert len(full) > 0  # the geometry actually produced duplicate groups


def test_semdedup_kernel_property_vs_reference():
    """Property test of the per-cell kernel (no Spark needed — it is a
    pure pandas function): against an INDEPENDENT reference that decides
    every pair with the sequential fold directly (no matmul, no
    borderline band) and collapses components by label propagation to a
    fixpoint (not union-find). Random small cells, including antipodal
    and near-threshold geometry."""
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from loris_mri_spark.workload.vectors import (
        _SEMDEDUP_EPS,
        semdedup_cell_kernel,
        semdedup_fold_cos,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def run(data):
        n = data.draw(st.integers(min_value=0, max_value=10))
        dim = data.draw(st.integers(min_value=2, max_value=6))
        rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
        mat = rng.normal(size=(n, dim))
        # avoid near-zero norms (cosine undefined) but keep clusters
        mat += np.sign(mat.sum(axis=1, keepdims=True) + 0.1) * 0.2
        norms = np.sqrt((mat * mat).sum(axis=1))
        if n and norms.min() < 1e-3:
            return
        ids = np.arange(n) * 3 + 1  # non-dense ids
        ccos = rng.uniform(-1, 1, size=n)
        pdf = pd.DataFrame(
            {
                "vec_id": ids.astype("int64"),
                "cell": np.full(n, 7, dtype="int64"),
                "emb": [list(map(float, r)) for r in mat],
                "ccos": ccos,
            }
        )
        got = semdedup_cell_kernel(pdf.copy())

        # independent reference: fold-decided edges, label propagation
        edges = [
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if semdedup_fold_cos(mat[i], mat[j]) >= _SEMDEDUP_EPS
        ]
        label = {x: x for e in edges for x in e}
        changed = True
        while changed:
            changed = False
            for i, j in edges:
                lo = min(label[i], label[j])
                if label[i] != lo or label[j] != lo:
                    label[i] = label[j] = lo
                    changed = True
        comps = {}
        for node, lab in label.items():
            comps.setdefault(lab, []).append(node)
        expect = set()
        for members in comps.values():
            root = int(min(ids[m] for m in members))
            kept = min(members, key=lambda m: (ccos[m], ids[m]))
            for m in members:
                expect.add(
                    (int(ids[m]), root, 7, round(float(ccos[m]), 9), m == kept)
                )
        got_set = {
            (r.vec_id, r.component, r.cell, round(r.ccos, 9), r.keep)
            for r in got.itertuples(index=False)
        }
        assert got_set == expect

    run()


def test_kmeans_cells_arrow_matches_numpy_reference(spark, sf_dir):
    """The Arrow-batched trainer must reproduce, exactly, a pure-numpy
    replay of its own contract: seeds = first n_cells vectors by id,
    argmax-cosine assignment (ties to lowest cell via ascending cell
    order + first-max argmax), float64 component-mean updates."""
    import numpy as np
    import pyarrow.parquet as pq

    from loris_mri_spark.catalog import load_table, table_path
    from loris_mri_spark.operators.vectors import kmeans_cells_arrow

    e = load_table(spark, sf_dir, "embeddings")
    assignment, centroids = kmeans_cells_arrow(
        e, id_col="vec_id", vec_col="embedding", n_cells=7, n_iter=2
    )
    got = {r["vec_id"]: r["cell"] for r in assignment.collect()}
    got_cent = {
        r["__cell"]: np.array(r["__centroid"]) for r in centroids.collect()
    }

    tb = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    ids = np.array(tb.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(tb.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]

    def unit(m):
        n_ = np.sqrt((m * m).sum(axis=1, keepdims=True))
        n_[n_ == 0] = 1.0
        return m / n_

    cell_ids = ids[:7]
    cent = mat[:7].copy()
    for _ in range(2):
        a = np.argmax(unit(mat) @ unit(cent).T, axis=1)
        alive = sorted(set(a.tolist()))
        cent = np.array([mat[a == ci].mean(axis=0) for ci in alive])
        cell_ids = cell_ids[alive]
    a = np.argmax(unit(mat) @ unit(cent).T, axis=1)
    expect = {int(i): int(cell_ids[c]) for i, c in zip(ids, a)}

    assert got == expect
    assert sorted(got_cent) == sorted(int(c) for c in cell_ids)
    for i, c in enumerate(cell_ids):
        np.testing.assert_allclose(
            got_cent[int(c)], cent[i], rtol=0, atol=1e-12
        )


def test_kmeans_cells_two_level_matches_numpy_reference(spark, sf_dir):
    """The two-level quantizer must reproduce a pure-numpy replay of its
    contract: coarse = the kmeans_cells_arrow procedure at k_coarse, then
    per coarse cell the SAME procedure locally at min(k_fine, |cell|)
    seeds (first ids in the cell, label = seed id)."""
    import numpy as np
    import pyarrow.parquet as pq

    from loris_mri_spark.catalog import load_table, table_path
    from loris_mri_spark.operators.vectors import kmeans_cells_two_level

    e = load_table(spark, sf_dir, "embeddings")
    assignment, centroids = kmeans_cells_two_level(
        e, id_col="vec_id", vec_col="embedding", k_coarse=4, k_fine=3,
        n_iter=2,
    )
    got = {r["vec_id"]: r["cell"] for r in assignment.collect()}
    got_cent = {
        r["__cell"]: np.array(r["__centroid"]) for r in centroids.collect()
    }

    tb = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    ids = np.array(tb.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(tb.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]

    def unit(m):
        n_ = np.sqrt((m * m).sum(axis=1, keepdims=True))
        n_[n_ == 0] = 1.0
        return m / n_

    def train(ids_, mat_, k, n_iter=2):
        k = min(k, len(ids_))
        cell_ids = ids_[:k].copy()
        cent = mat_[:k].copy()
        for _ in range(n_iter):
            a = np.argmax(unit(mat_) @ unit(cent).T, axis=1)
            alive = sorted(set(a.tolist()))
            cent = np.array([mat_[a == ci].mean(axis=0) for ci in alive])
            cell_ids = cell_ids[alive]
        a = np.argmax(unit(mat_) @ unit(cent).T, axis=1)
        return cell_ids, cent, a

    c_ids, _, c_a = train(ids, mat, 4)
    expect = {}
    expect_cent = {}
    for ci in range(len(c_ids)):
        sel = c_a == ci
        f_ids, f_cent, f_a = train(ids[sel], mat[sel], 3)
        for i, fc in zip(ids[sel], f_a):
            expect[int(i)] = int(f_ids[fc])
        for fi, fc in enumerate(f_ids):
            expect_cent[int(fc)] = f_cent[fi]

    assert got == expect
    assert sorted(got_cent) == sorted(expect_cent)
    for c in expect_cent:
        np.testing.assert_allclose(
            got_cent[c], expect_cent[c], rtol=0, atol=1e-12
        )


def test_kmeans_cells_two_level_partition_invariants(spark, sf_dir):
    """Every vector lands in exactly one fine cell; labels are vector ids
    (globally unique); the fine partition is strictly finer than coarse
    could be alone (cell count > k_coarse on this corpus)."""
    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.operators.vectors import kmeans_cells_two_level

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    assignment, centroids = kmeans_cells_two_level(
        e, id_col="vec_id", vec_col="embedding", k_coarse=4, k_fine=4,
    )
    rows = assignment.collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    cells = {r["cell"] for r in rows}
    assert len(cells) > 4  # finer than the coarse level alone
    assert len(cells) <= 16
    # labels are ids of member vectors of the corpus
    all_ids = {r["vec_id"] for r in rows}
    assert cells <= all_ids
    # every member's cell has a centroid row
    assert cells <= {r["__cell"] for r in centroids.collect()}


def test_kmeans_cells_two_level_cap_raises(spark, sf_dir):
    """A coarse cell over the task cap must RAISE, never truncate."""
    import pytest as _pytest

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.operators.vectors import kmeans_cells_two_level

    e = load_table(spark, sf_dir, "embeddings")
    assignment, _ = kmeans_cells_two_level(
        e, id_col="vec_id", vec_col="embedding", k_coarse=2, k_fine=2,
        coarse_cell_cap=5,
    )
    with _pytest.raises(Exception, match="over the 5-row task cap"):
        assignment.count()


def test_semdedup_two_level_invariants(spark, sf_dir):
    """dedup_semdedup(two_level=True) composes: output invariants hold
    (component = min member id, exactly one keep per component, keep is
    the min-centroid-cosine member with ties to lowest id)."""
    from loris_mri_spark.workload.vectors import dedup_semdedup

    df = dedup_semdedup(spark, sf_dir, n_cells=9, two_level=True).collect()
    by_comp = {}
    for r in df:
        by_comp.setdefault(r["component"], []).append(r)
    assert by_comp, "testdata contains semantic dups; expected groups"
    for comp, members in by_comp.items():
        assert comp == min(m["vec_id"] for m in members)
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1
        lo = min((m["cos_centroid_r"], m["vec_id"]) for m in members)
        assert (keeps[0]["cos_centroid_r"], keeps[0]["vec_id"]) == lo


def test_two_level_queries_bit_stable_across_partitioning(spark, sf_dir):
    """The golden-oracle safety argument for ann_imi_topk /
    dedup_semdedup_twolevel rests on the claim that the coarse trainer's
    partial-sum combine cannot change results (any wobble would have to
    flip a margin-guarded argmax). Test the claim directly: run both
    queries with the embeddings table pre-split into 1 / 3 / 7 input
    partitions (different Arrow batch boundaries -> different partial
    sums) and require BIT-IDENTICAL collected outputs."""
    import pyspark.sql.functions as SF

    from loris_mri_spark import workload
    from loris_mri_spark.catalog import load_table

    base = load_table(spark, sf_dir, "embeddings")

    def run(name, n_parts):
        import loris_mri_spark.catalog as catalog

        orig = catalog.load_table

        def patched(s, d, t):
            df = orig(s, d, t)
            if t == "embeddings":
                df = df.repartition(n_parts)
            return df

        catalog.load_table = patched
        # workload modules captured load_table by from-import at module
        # load; patch those references too
        import loris_mri_spark.workload.vectors as wv

        wv_orig = wv.load_table
        wv.load_table = patched
        try:
            rows = workload.QUERIES[name](spark, sf_dir).collect()
        finally:
            catalog.load_table = orig
            wv.load_table = wv_orig
        return sorted(tuple(r) for r in rows)

    assert base.count() > 0
    for name in ("ann_imi_topk", "dedup_semdedup_twolevel"):
        outs = [run(name, p) for p in (1, 3, 7)]
        assert outs[0] == outs[1] == outs[2], (
            f"{name} output varies with input partitioning — the "
            "golden-oracle margin guard premise is violated"
        )
        assert outs[0], f"{name} returned no rows"


def test_sq8_quantization_levels_and_constant_dim(spark):
    """SQ8 unit contract on a hand-built corpus: (a) a CONSTANT
    dimension (mx == mn) dequantizes to that constant (the CASE branch
    the star-schema corpus never exercises); (b) codes are exact
    255-level grid points: dequantized values reconstruct mn + c*step
    for integer c in [0, 255]; (c) the min and max vectors reconstruct
    EXACTLY (grid endpoints)."""
    from pyspark.sql import functions as F

    rows = [
        (0, [0.0, 7.5, -1.0]),
        (1, [1.0, 7.5, 3.0]),
        (2, [0.25, 7.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    bounds = (
        df.select(F.posexplode("emb").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("b")
        )
        .select(
            F.expr("transform(b, s -> s.mn)").alias("mns"),
            F.expr("transform(b, s -> s.mx)").alias("mxs"),
        )
    )
    got = {
        r["vec_id"]: list(r["q"])
        for r in df.crossJoin(F.broadcast(bounds))
        .select(
            "vec_id",
            F.expr(
                "transform(emb, (x, i) -> "
                "CASE WHEN mxs[i] = mns[i] THEN mns[i] "
                "ELSE mns[i] + floor((x - mns[i]) * CAST(255 AS DOUBLE)"
                " / (mxs[i] - mns[i]) + CAST(0.5 AS DOUBLE))"
                " * (mxs[i] - mns[i]) / CAST(255 AS DOUBLE) END)"
            ).alias("q"),
        )
        .collect()
    }
    # constant dim reconstructs exactly; endpoints reconstruct exactly
    assert all(got[v][1] == 7.5 for v in (0, 1, 2))
    assert got[0][0] == 0.0 and got[1][0] == 1.0
    assert got[0][2] == -1.0 and got[1][2] == 3.0
    # interior values sit on the 255-step grid within one step
    for v, emb in rows:
        for d in (0, 2):
            mn = min(r[1][d] for r in rows)
            mx = max(r[1][d] for r in rows)
            step = (mx - mn) / 255.0
            c = (got[v][d] - mn) / step
            assert abs(c - round(c)) < 1e-9
            assert abs(got[v][d] - emb[d]) <= step / 2 + 1e-12


def test_sq8_codec_matches_numpy_replay(spark):
    """Property (seeded grid, exhaustive over generated cases): the SQ8
    quantize/dequantize Column expression is BIT-IDENTICAL to a pure
    numpy replay of the same formula — mn + floor((x-mn)*255/(mx-mn)
    + 0.5) * (mx-mn)/255, IEEE double ops in the same order — and the
    reconstruction error never exceeds half a quantization step."""
    import random

    import numpy as np
    from pyspark.sql import functions as F

    rng = random.Random(1234)
    d = 7
    rows = [
        (i, [rng.uniform(-100, 100) for _ in range(d)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    bounds = (
        df.select(F.posexplode("emb").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("b")
        )
        .select(
            F.expr("transform(b, s -> s.mn)").alias("mns"),
            F.expr("transform(b, s -> s.mx)").alias("mxs"),
        )
    )
    got = {
        r["vec_id"]: np.array(r["q"])
        for r in df.crossJoin(F.broadcast(bounds))
        .select(
            "vec_id",
            F.expr(
                "transform(emb, (x, i) -> "
                "CASE WHEN mxs[i] = mns[i] THEN mns[i] "
                "ELSE mns[i] + floor((x - mns[i]) * CAST(255 AS DOUBLE)"
                " / (mxs[i] - mns[i]) + CAST(0.5 AS DOUBLE))"
                " * (mxs[i] - mns[i]) / CAST(255 AS DOUBLE) END)"
            ).alias("q"),
        )
        .collect()
    }
    mat = np.array([e for _, e in rows], dtype=np.float64)
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    span = mx - mn
    for i, emb in rows:
        x = np.array(emb)
        code = np.floor((x - mn) * 255.0 / span + 0.5)
        expect = mn + code * span / 255.0
        assert np.array_equal(got[i], expect), i
        assert np.all(np.abs(got[i] - x) <= span / 510.0 + 1e-12), i

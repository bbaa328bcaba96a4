"""Measure the text family's duplicate-tokenization question (r9
VERDICT item 7): text_tfidf_top_terms / text_bm25_topk /
text_pmi_bigrams evaluate their tokenize expression once per statistics
branch (tf+df, dl+tf, uni+bigram). Is a shared-tokens exchange anchor
(the jaccard scans=1 recipe) worth it, or is the duplicate scan
immaterial?

The trade is NOT free in either direction, which is why this is a
measurement and not a code change:

- registered shape: tokenize the corpus once PER BRANCH (2x regex/split
  work, all inside whole-stage codegen), but every shuffle happens
  AFTER partial aggregation — the exchange payloads are (doc_id, term,
  partial_count) rows, far smaller than the raw token stream.
- anchored shape: tokenize ONCE and pin an explicit repartition anchor
  on the exploded tokens (for tfidf/bm25 the anchor key is chosen so
  BOTH branch aggregations are satisfied by the anchor's distribution:
  hash(term) satisfies ClusteredDistribution([doc_id, term]) and
  [term]; hash(doc_id) satisfies [doc_id] and [doc_id, tok]) — but the
  anchor must shuffle the RAW exploded token stream (every token, no
  map-side combine), trading duplicate codegen scan work for a full
  token-volume exchange. For pmi the anchor sits on the token ARRAYS
  (pre-explode): full text volume through the exchange.

At 100 TB the raw-token exchange is the scan multiplied by token
fan-out — the sweep quantifies which side wins at 100x (.scale/sf10)
and SCALE.md records the verdict with numbers.

Usage: python tools/bench_text_anchor.py   (~3-6 min on local[32])
Writes BENCH_SF1.json key `text_anchor_probe`.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _anchored_tfidf(spark, sf_dir):  # noqa: ANN001
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.workload.text import tokens

    d = load_table(spark, sf_dir, "documents")
    # single tokenize pass: the anchor's map stage evaluates the
    # expression once; both aggregations read the shuffle files back
    # (ReusedExchange). hash(term) satisfies both groupings.
    toks = d.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).repartition("term")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias(
                "score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "rank", F.round("score", 6).alias(
            "score_r"))
    )


def _anchored_bm25(spark, sf_dir):  # noqa: ANN001
    from pyspark.sql import functions as F

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.workload.text import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).repartition("doc_id")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        toks.filter(F.col("tok").isin(_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    norm_len = 1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    term_score = (
        idf * F.col("tf") * (_BM25_K1 + 1)
        / (F.col("tf") + _BM25_K1 * norm_len)
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum(term_score).alias("score"),
        )
    )
    return (
        scored.select(
            "doc_id", "n_terms", F.round("score", 6).alias("score_r"))
        .orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def _anchored_pmi(spark, sf_dir):  # noqa: ANN001
    from pyspark.sql import functions as F

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.workload.text import _PMI_MIN_PAIR, tokens

    d = load_table(spark, sf_dir, "documents")
    # anchor on the token ARRAYS: one tokenize, both branches explode
    # from the shuffle files (round-robin anchor; neither branch's
    # grouping can be satisfied pre-explode anyway)
    ts = d.select(tokens("text").alias("ts")).repartition(64)
    uni = ts.select(F.explode("ts").alias("tok"))
    cu = uni.groupBy("tok").agg(F.count("*").alias("cu"))
    u = cu.agg(F.sum("cu").cast("double").alias("u_total"))
    bg = (
        ts.filter(F.size("ts") >= 2)
        .select(
            F.expr(
                "explode(transform(sequence(1, size(ts) - 1),"
                " i -> struct(ts[i-1] AS w1, ts[i] AS w2)))"
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    t = cb.agg(F.sum("cb").cast("double").alias("t_total"))
    c1 = cu.select(F.col("tok").alias("w1"), F.col("cu").alias("c1"))
    c2 = cu.select(F.col("tok").alias("w2"), F.col("cu").alias("c2"))
    pmi = F.log(
        F.col("cb") * F.col("u_total") * F.col("u_total")
        / (F.col("t_total") * F.col("c1") * F.col("c2"))
    )
    return (
        cb.filter(F.col("cb") >= _PMI_MIN_PAIR)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(u))
        .crossJoin(F.broadcast(t))
        .select(
            "w1", "w2",
            F.col("cb").cast("long").alias("pair_n"),
            F.round(pmi, 6).alias("pmi_r"),
        )
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-text-anchor",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark import workload

    workload.load_all()

    sf_dir = str(Path(_REPO, ".scale", "sf10"))  # 100x
    if not os.path.isdir(sf_dir):
        print(f"missing {sf_dir}; run tools/make_scale_data.py 100 first",
              file=sys.stderr)
        sys.exit(2)

    pairs = {
        "text_tfidf_top_terms": _anchored_tfidf,
        "text_bm25_topk": _anchored_bm25,
        "text_pmi_bigrams": _anchored_pmi,
    }
    probe: dict[str, dict] = {}
    for name, anchored in pairs.items():
        registered = workload.QUERIES[name]
        row: dict = {}
        for kind, fn in (("registered", registered), ("anchored", anchored)):
            # equal-footing warm timing: run once cold, time the rerun
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            row[f"{kind}_warm_sec"] = round(time.perf_counter() - t0, 3)
        row["anchor_speedup"] = round(
            row["registered_warm_sec"] / row["anchored_warm_sec"], 3)
        probe[name] = row
        print(f"{name}: {row}", flush=True)

    path = Path(_REPO, "BENCH_SF1.json")
    doc = json.loads(path.read_text())
    doc["text_anchor_probe"] = {"sf": "100x", "queries": probe}
    path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"text_anchor_probe": doc["text_anchor_probe"]}))
    spark.stop()


if __name__ == "__main__":
    main()

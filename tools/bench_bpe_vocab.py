"""Measure the BPE merge-phase rework (r10 VERDICT item 2): the k=8
distributed merge loop (text_bpe_train_merges) pays ~3 driver-coordinated
Spark jobs + 2 eager localCheckpoints PER MERGE; the vocab-local trainer
(text_bpe_train_vocab, k=256) lands the word-frequency table in one
applyInPandas task and merges in-process with incremental pair counts.

Two questions, answered with numbers:

1. End-to-end: what does each registered query cost warm at 10x/100x
   (.scale/sf1, .scale/sf10), and what is the implied per-merge cost?
   The k=256 query runs 32x the merges — if its per-merge cost is
   orders of magnitude below the loop's, the driver round trip is gone.
2. In-task: at a REALISTIC vocabulary (synthetic 200k types, Zipf
   counts) and k=1024, what does a merge cost for the incremental
   trainer vs the from-scratch replay? This isolates the merge phase
   from corpus size entirely (the corpus only ever contributes the
   word-count pass).

Usage: python tools/bench_bpe_vocab.py   (~3-5 min on local[32])
Writes BENCH_SF1.json key `bpe_vocab_probe`.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _synthetic_vocab(n_types: int, seed: int = 11) -> "dict[str, int]":
    """Zipf-weighted random vocabulary: short high-frequency words, a
    long tail of rare longer words — the shape a web corpus produces."""
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    vocab: dict[str, int] = {}
    while len(vocab) < n_types:
        ln = min(1 + int(rng.expovariate(0.35)), 24)
        w = "".join(rng.choice(alpha) for _ in range(ln))
        if w not in vocab:
            # Zipf-ish: rank r gets ~N/r
            vocab[w] = max(1, n_types // (len(vocab) + 1))
    return vocab


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-bpe-vocab",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark import workload

    workload.load_all()
    from loris_mri_spark.operators.bpe import bpe_train_incremental
    from loris_mri_spark.workload.text import _BPE_K, _BPE_VOCAB_K, bpe_replay

    probe: dict = {}

    # --- 1. end-to-end at 10x/100x --------------------------------------
    for label, tier in (("10x", "sf1"), ("100x", "sf10")):
        sf_dir = str(Path(_REPO, ".scale", tier))
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir}", file=sys.stderr)
            sys.exit(2)
        row: dict = {}
        for name, k in (
            ("text_bpe_train_merges", _BPE_K),
            ("text_bpe_train_vocab", _BPE_VOCAB_K),
        ):
            fn = workload.QUERIES[name]
            times = []
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(spark, sf_dir)
                n_merges = out.count()  # also materializes
                times.append(time.perf_counter() - t0)
            warm = sorted(times)[1]
            row[name] = {
                "warm_median3_sec": round(warm, 3),
                "n_merges": n_merges,
                "sec_per_merge": round(warm / max(n_merges, 1), 4),
            }
        probe[label] = row
        print(f"{label}: {row}", flush=True)

    # --- 2. in-task merge phase at realistic vocab ----------------------
    vocab = _synthetic_vocab(200_000)
    task: dict = {}
    for k in (256, 1024):
        t0 = time.perf_counter()
        inc = bpe_train_incremental(dict(vocab), k)
        t_inc = time.perf_counter() - t0
        task[f"incremental_k{k}"] = {
            "sec": round(t_inc, 3),
            "sec_per_merge": round(t_inc / max(len(inc), 1), 5),
        }
        print(f"incremental k={k}: {task[f'incremental_k{k}']}", flush=True)
    # replay comparison at k=256 only (from-scratch recount per merge)
    t0 = time.perf_counter()
    rep = bpe_replay(dict(vocab), 256)
    t_rep = time.perf_counter() - t0
    task["replay_k256"] = {
        "sec": round(t_rep, 3),
        "sec_per_merge": round(t_rep / max(len(rep), 1), 5),
    }
    assert rep == bpe_train_incremental(dict(vocab), 256)[: len(rep)]
    print(f"replay k=256: {task['replay_k256']}", flush=True)
    probe["in_task_vocab200k"] = task

    path = Path(_REPO, "BENCH_SF1.json")
    doc = json.loads(path.read_text())
    doc["bpe_vocab_probe"] = probe
    path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"bpe_vocab_probe": probe}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Measure the r10 s14 expression-encoder conversion (r9 VERDICT item
1): `sinks.encode_float_chunk` went from a per-row pandas_udf loop
(`pb_encode_float_chunk(int(i), int(d), len(s), list(s))` per row —
every float through Python `struct.pack`) to an arrow_udf over the
shared buffer-slicing core (`pb_encode_float_chunk_vec`, the same
kernel the loris_chunks writers use since r9, where the identical
conversion measured 2.2x at 100x on t13).

Run the REGISTERED s14_chunk_encode plan and a faithful reconstruction
of the pre-r10 per-row encoder at 1x/10x/100x embeddings volume
(.scale/sf1 + sf10 — run tools/make_scale_data.py 10 100 first), warm
timings, merged into BENCH_SF1.json under `s14_encode_probe`.

Usage: python tools/bench_s14_encode.py   (~2 min on local[32])
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import pandas as pd  # noqa: F401

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _legacy_rowloop_query(spark, sf_dir):  # noqa: ANN001
    """The pre-r10 s14_chunk_encode, reconstructed byte-for-byte: same
    chunking plan, but the encode expression is the per-row pandas_udf
    loop (the shape the r9 VERDICT flagged as the expression path's
    throughput ceiling)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.sinks import pb_encode_float_chunk

    @pandas_udf(BinaryType())
    def _enc(idx: "pd.Series", ds: "pd.Series", samples: "pd.Series") -> "pd.Series":
        return pd.Series(
            [
                pb_encode_float_chunk(int(i), int(d), len(s), list(s))
                for i, d, s in zip(idx, ds, samples)
            ]
        )

    e = load_table(spark, sf_dir, "embeddings")
    chunks = e.select(
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), c -> slice(embedding, c * 16 + 1, 16))"
            )
        ).alias("chunk_idx", "samples"),
    )
    enc = chunks.select(
        "vec_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        _enc(F.col("chunk_idx"), F.lit(1), F.col("samples")).alias("payload"),
    )
    return enc.select(
        "vec_id",
        "chunk_idx",
        F.length("payload").cast("long").alias("payload_len"),
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-s14-encode",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark import workload

    workload.load_all()
    registered = workload.QUERIES["s14_chunk_encode"]

    tiers = [
        ("1", "/root/testdata/sf0.1"),
        ("10", str(Path(_REPO, ".scale", "sf1"))),
        ("100", str(Path(_REPO, ".scale", "sf10"))),
    ]
    probe: dict[str, dict[str, float]] = {
        "arrow_udf_registered": {},
        "per_row_pandas_udf_pre_r10": {},
    }
    for label, sf_dir in tiers:
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir}; run tools/make_scale_data.py first",
                  file=sys.stderr)
            sys.exit(2)
        for key, fn in (
            ("arrow_udf_registered", registered),
            ("per_row_pandas_udf_pre_r10", _legacy_rowloop_query),
        ):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            probe[key][label] = round(time.perf_counter() - t0, 3)
            print(f"x{label} {key}: {probe[key][label]}s", flush=True)

    speedup = {
        label: round(
            probe["per_row_pandas_udf_pre_r10"][label]
            / probe["arrow_udf_registered"][label],
            2,
        )
        for label, _ in tiers
    }
    out = {"warm_sec_by_ratio": probe, "speedup_by_ratio": speedup}
    path = Path(_REPO, "BENCH_SF1.json")
    doc = json.loads(path.read_text())
    doc["s14_encode_probe"] = out
    path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"s14_encode_probe": out}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""10x scale probe for the round-12 fourth-session families: the
classifier-eval battery, the log2-histogram quantile rollup, and the
spectral scatter + power iteration.

Each family's claim: runtime grows ~linearly in input rows because the
only corpus-sized work is scan-stage expressions plus one partial
aggregation (to distinct scores / <=63 buckets / d^2 cells); everything
after is model-sized. The probe times the honest checksum action at N
and 10N synthetic rows and prints the wall ratio plus the size of the
model-sized intermediate, so sub-linearity of the post-aggregate stage
is visible, not asserted.

Usage: python tools/r12_session4_scale_probe.py [N_base]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from real_estate_project1_etl_spark.session import get_spark  # noqa: E402


def checksum(df):
    cols = [F.xxhash64(F.col(c).cast("string")) for c in df.columns]
    df.select(F.sum(sum(cols[1:], cols[0]))).collect()


def timeit(df, runs=3):
    checksum(df)
    ts = []
    for _ in range(runs):
        t0 = time.time()
        checksum(df)
        ts.append(time.time() - t0)
    return min(ts)


def synth_scored(spark, n):
    # heavy-tailed integer scores (Zipf-ish distinct-score table), p/y
    # derived deterministically
    return spark.range(n).select(
        (F.xxhash64("id") % 5001 - 2500).alias("s"),
        (F.abs(F.xxhash64("id", F.lit("y"))) % 3 > 0)
        .cast("int")
        .alias("y"),
        (F.abs(F.xxhash64("id", F.lit("p"))) % 1001).alias("p"),
    )


def synth_vectors(spark, n, dim=64):
    cols = [
        (
            (F.abs(F.xxhash64("id", F.lit(str(i)))) % 2001).cast("double")
            / 1000.0
            - 1.0
        ).alias(f"x{i}")
        for i in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


def main():
    from real_estate_project1_etl_spark.operators.evalmetrics import (
        binary_classifier_eval,
    )
    from real_estate_project1_etl_spark.operators.sketch import (
        hist_merge_quantiles,
        log2_hist_sketch,
    )
    from real_estate_project1_etl_spark.operators.spectral import (
        power_iteration_top_component,
        quantized_scatter,
    )

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("r12s4-probe", cpus=32, shuffle_partitions=32)

    print(f"== eval battery (N={n_base:,} vs {10 * n_base:,}) ==", flush=True)
    for n in (n_base, 10 * n_base):
        df = synth_scored(spark, n)
        rep = binary_classifier_eval(
            df, score_col="s", label_col="y", p_milli_col="p"
        )
        t = timeit(rep)
        nd = df.select("s").distinct().count()
        print(f"  n={n:,}: {t:.2f}s (distinct scores = {nd})", flush=True)

    print("== log2-hist rollup ==", flush=True)
    for n in (n_base, 10 * n_base):
        df = spark.range(n).select(
            (F.col("id") % 365).cast("string").alias("day"),
            (F.abs(F.xxhash64("id")) % 10_000_000 + 1).alias("v"),
        )
        sk = log2_hist_sketch(df, ["day"], "v")
        q = hist_merge_quantiles(
            sk.select(
                F.substring("day", 1, 1).alias("g"), "bucket", "cnt"
            ),
            ["g"],
        )
        t = timeit(q)
        cells = sk.count()
        print(f"  n={n:,}: {t:.2f}s (sketch cells = {cells})", flush=True)

    print("== spectral scatter + 8-step power iteration ==", flush=True)
    for n in (n_base // 10, n_base):
        emb = synth_vectors(spark, n)
        # time CONSTRUCTION too: the operator eagerly checkpoints the
        # scatter and every iterate, so the work happens at build time
        t0 = time.time()
        top = power_iteration_top_component(
            quantized_scatter(emb, "embedding"), dim=64
        )
        checksum(top)
        t = time.time() - t0
        print(f"  n={n:,}: {t:.2f}s end-to-end (d^2 cells = 4096)", flush=True)


if __name__ == "__main__":
    main()

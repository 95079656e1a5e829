#!/usr/bin/env python
"""Round-11 scale probes.

1. IVF-PQ hot-cell balancing (verdict item 6): a skewed corpus (most
   vectors in one IVF cell) before/after ivfpq_balance_cells — reports
   the max per-join-key candidate volume and end-to-end query time,
   plus result equality (the split is lossless by construction).

Usage: python tools/r11_scale_probe.py [n_vectors]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from real_estate_project1_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim, n_lists = 32, 16
    spark = get_spark(app_name="r11-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from real_estate_project1_etl_spark.operators.similarity import (
        fit_pq_codebooks,
        ivfpq_balance_cells,
        ivfpq_encode,
        ivfpq_topk,
    )

    # 85% of vectors near center 0 (one hot IVF cell), rest spread
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(100)) < 85, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_lists)))
        .cast("int")
        .alias("_c"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.when(i == F.col("_c"), F.lit(10.0)).otherwise(F.lit(0.0))
            + (F.pmod(F.xxhash64("vec_id", i), F.lit(1000)) / 1000.0)
        ),
    )
    emb = base.select("vec_id", vec.alias("embedding"))
    emb.write.mode("overwrite").parquet("/tmp/r11_skew_emb")
    emb = spark.read.parquet("/tmp/r11_skew_emb")

    cents = spark.range(n_lists).select(
        F.col("id").cast("int").alias("list_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(i == F.col("id"), F.lit(10.0)).otherwise(
                F.lit(0.0)
            ) + 0.5,
        ).alias("centroid"),
    )
    cb = fit_pq_codebooks(emb, m_subspaces=4, n_codes=16)
    queries = emb.filter(F.col("vec_id") % (n // 64) == 1)

    enc = ivfpq_encode(emb, cents, cb)
    enc.write.mode("overwrite").parquet("/tmp/r11_skew_enc")
    enc = spark.read.parquet("/tmp/r11_skew_enc")
    cap = max(n // 64, 1)
    bal = ivfpq_balance_cells(enc, max_cell_size=cap, id_col="vec_id")
    bal.write.mode("overwrite").parquet("/tmp/r11_skew_bal")
    bal = spark.read.parquet("/tmp/r11_skew_bal")

    hot = enc.groupBy("list_id").count().agg(F.max("count")).first()[0]
    hot_b = (
        bal.groupBy("list_id", "sub_id").count().agg(F.max("count")).first()[0]
    )
    print(
        f"per-join-key volume: unbalanced max {hot} "
        f"({hot / n:.0%} of {n}); balanced max {hot_b} (cap {cap})"
    )

    def run(e, label):
        t0 = time.time()
        df = ivfpq_topk(
            emb, queries, cents, cb, k=5, n_probe=2, encoded=e
        )
        rows = sorted(map(tuple, df.collect()))
        print(f"{label}: {time.time() - t0:.1f}s, {len(rows)} rows")
        return rows

    a = run(enc, "ivfpq_topk unbalanced")
    b = run(bal, "ivfpq_topk balanced  ")
    print(f"results identical: {a == b}")
    spark.stop()


if __name__ == "__main__":
    main()

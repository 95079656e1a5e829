#!/usr/bin/env python
"""Round-11 ANN probe at 500k vectors (the regime where the index pays,
unlike the 2k-vector sf0.1 bench floor): exact brute-force cosine vs
IVF-PQ ADC against a STANDING (pre-encoded) index, unbalanced vs
hot-cell-balanced, on a corpus with one planted hot cluster (40% of
vectors) so the balance path does real work.

Usage: python tools/r11_ann_500k_probe.py [n_vectors]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from real_estate_project1_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    dim, n_lists = 64, 32
    spark = get_spark(app_name="r11-ann-500k")
    spark.sparkContext.setLogLevel("ERROR")

    from real_estate_project1_etl_spark.functions.vectors import normalize
    from real_estate_project1_etl_spark.operators.similarity import (
        brute_force_topk,
        fit_pq_codebooks,
        ivfpq_balance_cells,
        ivfpq_encode,
        ivfpq_topk,
    )

    # 40% of vectors near center 0 (hot cell), rest spread over 32
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(100)) < 40, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_lists)))
        .cast("int")
        .alias("_c"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.when(i == F.col("_c"), F.lit(8.0)).otherwise(F.lit(0.0))
            + (F.pmod(F.xxhash64("vec_id", i), F.lit(1000)) / 1000.0)
        ),
    )
    emb = base.select("vec_id", normalize(vec).alias("embedding"))
    emb.write.mode("overwrite").parquet("/tmp/r11_ann_emb")
    emb = spark.read.parquet("/tmp/r11_ann_emb")
    cents = spark.range(n_lists).select(
        F.col("id").cast("int").alias("list_id"),
        normalize(
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.when(i == F.col("id"), F.lit(8.0)).otherwise(
                    F.lit(0.0)
                )
                + 0.5,
            )
        ).alias("centroid"),
    )
    cb = fit_pq_codebooks(emb.limit(20_000), m_subspaces=8, n_codes=16)
    queries = emb.filter(F.col("vec_id") % (n // 32) == 1).localCheckpoint()

    t0 = time.time()
    enc = ivfpq_encode(emb, cents, cb)
    enc.write.mode("overwrite").parquet("/tmp/r11_ann_enc")
    print(f"ingest-time encode of {n}: {time.time() - t0:.1f}s")
    enc = spark.read.parquet("/tmp/r11_ann_enc")
    bal = ivfpq_balance_cells(enc, max_cell_size=max(n // 64, 1))
    bal.write.mode("overwrite").parquet("/tmp/r11_ann_bal")
    bal = spark.read.parquet("/tmp/r11_ann_bal")
    hot = enc.groupBy("list_id").count().agg(F.max("count")).first()[0]
    hot_b = bal.groupBy("list_id", "sub_id").count().agg(
        F.max("count")
    ).first()[0]
    print(f"max per-key volume: unbalanced {hot}, balanced {hot_b}")

    def t(fn, label, runs=2):
        fn()
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            d = time.time() - t0
            best = d if best is None else min(best, d)
        print(f"{label}: best-of-{runs} {best:.1f}s")

    t(lambda: brute_force_topk(emb, queries, k=5).count(), "exact brute-force")
    t(
        lambda: ivfpq_topk(
            emb, queries, cents, cb, k=5, n_probe=4, encoded=enc
        ).count(),
        "IVF-PQ ADC standing index (unbalanced)",
    )
    t(
        lambda: ivfpq_topk(
            emb, queries, cents, cb, k=5, n_probe=4, encoded=bal
        ).count(),
        "IVF-PQ ADC standing index (balanced)  ",
    )
    spark.stop()


if __name__ == "__main__":
    main()

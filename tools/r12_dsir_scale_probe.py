"""Round-12: 10x scale gate for the new operators (DSIR importance
weights, grouped rank buckets, ANN recall eval) — same method as the
similarity-family gate (tools/r12_similarity_scale_probe.py): build a
k-times-replicated corpus ON DISK, time warm runs at 1x and 10x, and
record the intermediate volumes that prove the scale story (feature
rows collapse to min(doc grams, dim) per doc; the ratio model stays
dim-sized; ranking shuffles ids, not text).

Run: python tools/r12_dsir_scale_probe.py [k ...]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_docs(spark, k: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    copies = base.crossJoin(
        spark.range(k).select(F.col("id").alias("_copy"))
    ).select(
        (F.col("doc_id") + F.col("_copy") * 1_000_000).alias("doc_id"),
        F.when(F.col("_copy") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" v"), F.col("_copy").cast("string"))
        ).alias("text"),
        "lang",
    )
    path = f"/tmp/r12_dsir_docs_{k}x"
    copies.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def timed(label, thunk, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        n = thunk()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label}: {best:.2f}s  out={n}", flush=True)
    return best


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    from real_estate_project1_etl_spark.session import get_spark
    from real_estate_project1_etl_spark.operators.quality import (
        _hashed_gram_counts,
        dsir_importance_weights,
        grouped_rank_buckets,
        sequential_poisson_sample,
    )
    from real_estate_project1_etl_spark.operators.corpus import (
        bigram_lm_scores,
    )
    from real_estate_project1_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        topk_recall,
    )

    spark = get_spark(
        "r12-dsir-scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    for k in scales:
        docs = scaled_docs(spark, k)
        n_docs = docs.count()
        feats = _hashed_gram_counts(docs, 4096, "text", "doc_id", "md5_60")
        n_feat = feats.count()
        n_grams = feats.agg(F.sum("n")).collect()[0][0]
        print(
            f"\n== scale {k}x: {n_docs} docs, {n_grams} gram occurrences "
            f"-> {n_feat} (doc,bucket) feature rows "
            f"({n_grams / max(n_feat, 1):.1f}x collapsed)",
            flush=True,
        )

        def dsir():
            w = dsir_importance_weights(
                docs, docs.filter(F.col("lang") == "en"), dim=4096
            )
            return w.select(
                F.count("dsir_weight_ppm"), F.sum("dsir_weight_ppm")
            ).collect()[0][0]

        timed("dsir_importance_weights", dsir)

        def select_top():
            w = dsir_importance_weights(
                docs, docs.filter(F.col("lang") == "en"), dim=4096
            ).filter(F.col("n_grams") > 0)
            return sequential_poisson_sample(
                w, "dsir_weight_ppm", 100, ["doc_id"], id_order_col="doc_id"
            ).count()

        timed("dsir_selected_docs    ", select_top)

        def buckets():
            scores = bigram_lm_scores(docs).filter(F.col("n_bigrams") > 0)
            scored = scores.join(docs.select("doc_id", "lang"), "doc_id")
            out = grouped_rank_buckets(scored, "lang", "lm_score", "doc_id", 3)
            return out.select(
                F.count("bucket"), F.sum(F.col("bucket").cast("long"))
            ).collect()[0][0]

        timed("ccnet_buckets         ", buckets)

    # recall eval scales with QUERY count, not corpus: sweep queries
    print("\n== ann_recall_ivf query-count sweep (corpus fixed)", flush=True)
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("list_id"),
        F.col("embedding").alias("centroid"),
    )
    for nq in (10, 100):
        qs = emb.filter(F.col("vec_id") < nq)

        def recall():
            exact = brute_force_topk(emb, qs, k=5, round_to=6)
            approx = ivf_topk(emb, qs, k=5, n_probe=4, centroids=cents)
            r = topk_recall(exact, approx)
            return r.agg(F.sum("n_hits"), F.sum("n_exact")).collect()[0][0]

        timed(f"recall eval nq={nq:<4d}   ", recall)


if __name__ == "__main__":
    main()

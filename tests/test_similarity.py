"""Similarity-search operators: exactness of the brute-force baseline, and
recall sanity of the approximate paths (LSH, IVF) against it."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_pandas,
    ivf_topk,
    lsh_topk,
)
from real_estate_project1_etl_spark.sources.parquet import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_pandas_matmul_matches_expression_path(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    exact = _pairs(brute_force_topk(emb, q, k=5, round_to=6))
    fast = _pairs(brute_force_topk_pandas(emb, q.toPandas(), k=5))
    assert exact == fast


def test_ivf_recall_against_exact(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    exact = _pairs(brute_force_topk(emb, q, k=5, round_to=6))
    approx = _pairs(ivf_topk(emb, q, k=5, n_lists=8, n_probe=4))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below sanity floor"


def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    from real_estate_project1_etl_spark.operators.similarity import lsh_topk_multiprobe

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    exact = _pairs(brute_force_topk(emb, q, k=5, round_to=6))
    single = _pairs(lsh_topk(emb, q, dim=64, k=5, n_planes=4))
    multi = _pairs(lsh_topk_multiprobe(emb, q, dim=64, k=5, n_planes=4, n_flip=2))
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    # measured on sf0.001: single ~0.02, flip1 ~0.44, flip2 ~0.92
    assert r_multi >= r_single, f"multiprobe recall {r_multi:.2f} < single {r_single:.2f}"
    assert r_multi >= 0.6, f"multiprobe recall {r_multi:.2f} below sanity floor"


def test_lsh_returns_subset_quality(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    out = lsh_topk(emb, q, dim=64, k=5)
    rows = out.collect()
    assert rows, "LSH returned nothing"
    assert all(r["rank"] <= 5 for r in rows)

#!/usr/bin/env python
"""Round-12 verdict item 4: similarity-family 10x scale gate.

prefix_filter_jaccard_pairs, containment_pairs, minhash_near_duplicates,
and semantic_dedup had no committed super-sf0.1 evidence. This probe
scales the REAL sf0.1 corpus (not synthetic text — word/shingle
distributions stay realistic) by K via near-duplicate replication: copy
j of doc d keeps d's text plus a j-unique suffix token, so copies form
planted near-dup groups of size K while shingle sets stay distinct. The
embeddings table scales the same way with a per-copy deterministic
perturbation.

Timing wraps a THUNK (several operators localCheckpoint internally, so
the expensive work executes at construction — a pre-built-DataFrame
timer under-reports; that is the r9 "count() can lie" lesson in a new
costume). Candidate volumes come from the SQLAppStatusStore: it records
EVERY execution the thunk triggered (including internal checkpoint
jobs), and each execution's plan graph + metrics expose the join nodes'
"number of output rows" — the quantity whose growth decides whether the
prefix/band/cluster candidate generation is sub-quadratic.

semantic_dedup runs twice at 10x: once with the 1x cluster count (the
WRONG way — within-cluster pair work is quadratic in cluster size) and
once with clusters scaled 10x so expected cluster size is constant (the
documented 100 TB path: "raise n_clusters so clusters stay bounded").

Usage: python tools/r12_similarity_scale_probe.py [scale_factors...]
       (default: 1 10)
"""
from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from real_estate_project1_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_NUM = re.compile(r"[\d,]+")


def _parse_metric(v: str) -> int:
    m = _NUM.search(str(v))
    return int(m.group(0).replace(",", "")) if m else 0


def _execution_ids(store) -> set[int]:
    lst = store.executionsList()
    return {lst.apply(i).executionId() for i in range(lst.size())}


def join_candidates(store, new_ids) -> list[int]:
    """'number of output rows' of every join node across the given
    executions (one entry per join node, descending)."""
    out = []
    for eid in sorted(new_ids):
        try:
            graph = store.planGraph(eid)
            metrics = store.executionMetrics(eid)
        except Exception:
            continue
        nodes = graph.allNodes()
        for i in range(nodes.size()):
            node = nodes.apply(i)
            if "Join" not in node.name():
                continue
            ms = node.metrics()
            for j in range(ms.size()):
                met = ms.apply(j)
                if met.name() == "number of output rows":
                    v = metrics.get(met.accumulatorId())
                    if v.isDefined():
                        out.append(_parse_metric(v.get()))
    return sorted(out, reverse=True)


def scaled_docs(spark, k: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    copies = base.crossJoin(
        spark.range(k).select(F.col("id").alias("_copy"))
    ).select(
        (F.col("doc_id") + F.col("_copy") * 1_000_000).alias("doc_id"),
        F.when(F.col("_copy") == 0, F.col("text")).otherwise(
            F.concat(
                F.col("text"),
                F.lit(" copytag"),
                F.col("_copy").cast("string"),
            )
        ).alias("text"),
    )
    path = f"/tmp/r12_sim_docs_{k}x"
    copies.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def scaled_emb(spark, k: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    copies = base.crossJoin(
        spark.range(k).select(F.col("id").alias("_copy"))
    ).select(
        (F.col("vec_id") + F.col("_copy") * 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + (F.col("_copy") % 5) * (i % 3 - 1) * 0.001,
        ).alias("embedding"),
        F.lit(0).alias("label"),
    )
    path = f"/tmp/r12_sim_emb_{k}x"
    copies.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def timed(spark, store, label, thunk):
    before = _execution_ids(store)
    t0 = time.time()
    n = thunk().count()
    dt = time.time() - t0
    cands = join_candidates(store, _execution_ids(store) - before)
    print(
        f"  {label}: {dt:.2f}s  out={n}  join_rows={cands[:5]}",
        flush=True,
    )
    return dt, n, cands


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark(
        "r12-sim-scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    store = spark._jsparkSession.sharedState().statusStore()

    from real_estate_project1_etl_spark.functions.vectors import normalize
    from real_estate_project1_etl_spark.operators.dedup import (
        containment_pairs,
        minhash_near_duplicates,
        prefix_filter_jaccard_pairs,
        semantic_dedup,
    )

    for k in scales:
        docs = scaled_docs(spark, k)
        emb = scaled_emb(spark, k)
        n_docs = docs.count()
        n_vec = emb.count()
        print(f"\n== scale {k}x: {n_docs} docs, {n_vec} vectors", flush=True)

        timed(spark, store, "minhash_near_dup   ",
              lambda: minhash_near_duplicates(docs, "text", "doc_id"))
        timed(spark, store, "prefix_jaccard t=.6",
              lambda: prefix_filter_jaccard_pairs(docs, threshold=0.6))
        timed(spark, store, "containment  t=.8  ",
              lambda: containment_pairs(docs, threshold=0.8))

        def cents_of(n_lists):
            return emb.filter(F.col("vec_id") < n_lists).select(
                F.col("vec_id").cast("int").alias("list_id"),
                normalize(F.col("embedding")).alias("centroid"),
            )

        base_lists = 8
        timed(spark, store, f"semantic_dedup c={base_lists} ",
              lambda: semantic_dedup(emb, threshold=0.35,
                                     centroids=cents_of(base_lists)))
        if k > 1:
            timed(spark, store, f"semantic_dedup c={base_lists * k}",
                  lambda: semantic_dedup(emb, threshold=0.35,
                                         centroids=cents_of(base_lists * k)))


if __name__ == "__main__":
    main()

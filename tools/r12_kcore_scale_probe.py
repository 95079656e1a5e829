#!/usr/bin/env python
"""k-core 10x scale probe (the graph-family gate kcore missed when the
pagerank/triangles 10x numbers were recorded).

Claim (operators/graph.py::kcore): each peel round is one degree agg +
two semi-joins on a SHRINKING edge set — O(rounds) shuffles, cost
~linear in surviving edges. Scaling a same-shape random graph 10x in
edges (density held, so the peel trajectory has comparable depth)
should scale wall time sublinearly on a machine these sizes underload.

Graph: distributed Erdos-Renyi-ish — spark.range over edge ids, both
endpoints from xxhash64 — plus a planted clique so the core is
non-empty at every scale.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from real_estate_project1_etl_spark.session import get_spark  # noqa: E402
from real_estate_project1_etl_spark.operators.graph import kcore  # noqa: E402


def graph(spark, n_edges: int, n_nodes: int, seed: int):
    e = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_nodes)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(n_nodes)).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    # planted 40-clique on reserved ids so a k=30 core always exists
    cl = spark.range(40).alias("x").crossJoin(spark.range(40).alias("y")).select(
        (F.col("x.id") + n_nodes).alias("a"), (F.col("y.id") + n_nodes).alias("b")
    ).filter(F.col("a") < F.col("b"))
    df = e.unionByName(cl).localCheckpoint(eager=True)
    return df


def run(spark, n_edges: int, n_nodes: int, k: int) -> tuple[float, int, dict]:
    g = graph(spark, n_edges, n_nodes, seed=7)
    best, n, stats = float("inf"), 0, {}
    for _ in range(3):
        stats = {}
        t = time.time()
        n = kcore(g, k, _stats=stats).count()
        best = min(best, time.time() - t)
    return best, n, stats


def main() -> None:
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    k = 30
    t1, n1, s1 = run(spark, 1_000_000, 100_000, k)
    t10, n10, s10 = run(spark, 10_000_000, 1_000_000, k)
    print(
        f"kcore k={k}: 1x (1M edges/100k nodes) {t1:.2f}s core={n1} "
        f"rounds={s1['rounds']} conv={s1['converged']}; "
        f"10x (10M/1M) {t10:.2f}s core={n10} rounds={s10['rounds']} "
        f"conv={s10['converged']}; ratio {t10 / t1:.2f} (linear=10)"
    )
    spark.stop()


if __name__ == "__main__":
    main()

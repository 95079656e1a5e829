"""Iterative graph operators — connected components for transitive
duplicate groups.

Pairwise near-dup detection (minhash/simhash, dedup.py) emits EDGES; a
duplicate GROUP is the transitive closure of those edges (a ~ b ~ c means
all three are one document). The reference's dedup (transform.py:62) is
single-key and needs no closure; corpus-scale near-dup pruning does —
keeping one representative per component is the standard final stage
(e.g. the dedup pass described in PAPERS.md's similarity-join family).

Algorithm: min-label propagation. Every vertex starts labeled with its
own id; each round every vertex takes the min label over itself and its
neighbors; converged when no label changes. Rounds needed = graph
diameter, which for near-dup clusters is tiny (dup groups are dense).

Scale shape: each round is one shuffle (groupBy vertex id) on the edge
list — no driver-side adjacency, no vertex ever sees more than its
neighbors' labels. ``localCheckpoint`` per round truncates the lineage so
the plan stays O(1) deep instead of O(rounds). The convergence check is
an aggregate action per round (a count, not a collect of data rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id reachable from it. Returns ``(id, comp)`` — one row
    per distinct vertex; ``comp`` is the component representative.

    ``max_iter`` bounds rounds (propagation distance doubles nothing —
    it moves one hop per round, so components wider than ``max_iter``
    hops would split; raise it for long-chain graphs).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.localCheckpoint(eager=True)

    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = und.join(labels, und.a == labels.id).select(
            F.col("b").alias("id"), F.col("comp")
        )
        new = (
            labels.select("id", "comp")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def component_sizes(labels: DataFrame) -> DataFrame:
    """``(comp, size)`` per component — the dup-group size histogram
    input; one shuffle on the component id."""
    return labels.groupBy("comp").agg(F.count(F.lit(1)).alias("size"))

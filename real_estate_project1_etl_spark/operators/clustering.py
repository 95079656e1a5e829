"""K-means over embedding columns in EXACT integer arithmetic — the
missing TRAIN step of the IVF/IVF-PQ ANN family (operators/similarity.py
consumes centroid tables; this produces them in-engine).

Reference lineage: Lloyd's algorithm (Lloyd 1982, IEEE Trans. Inf.
Theory 28(2)); coarse-quantizer training for IVF indexes (Jégou et al.
2011, "Product Quantization for Nearest Neighbor Search", §IV). The
reference ETL has no vector surface (SURVEY §2b north-star gap).

Exactness convention (the module's oracle-determinism discipline):

- vectors quantize once: ``q_d = floor(x_d * 2^s)`` (exact IEEE double
  multiply + engine-identical floor) — everything after is integers;
- centroids are the TRUNCATED elementwise means ``m_d = sum(q_d) div
  n`` (Spark ``div`` == DuckDB ``//``, both toward zero), so the
  centroid table stays integer and distances stay exact bigints —
  integer k-means perturbs each centroid by < 1 quantization unit per
  coordinate vs the rational mean, far below the inter-cluster
  distances worth finding (and the OUTPUT is deterministic arithmetic
  either way: correctness never rests on the perturbation being small,
  only cluster quality does — pinned by the planted-blob test);
- assignment is ``argmin_c sum_d (q_d - m_d)^2`` with ties to the
  LOWEST cluster id (a total order, so retry/partition-stable);
- init is the first ``k`` vectors by id — deterministic, mirrorable
  (k-means++ would need an RNG the oracle cannot replay);
- empty clusters keep their previous centroid (coalesce on the update
  join), the standard Lloyd degeneracy rule.

Scale shape per iteration: ONE pass over the long-format ``(vec_id, d,
q_d)`` table — the k*d centroid table broadcasts, the d-keyed join +
(vec_id, cluster) partial aggregation compute all N*k distances in the
scan stage with map-side combine (no HOF lambdas: the join form stays
in whole-stage codegen, the r9 interpreted-lambda lesson), and the
update is one more aggregation to k*d cells. Iterates (k*d rows)
re-checkpoint per step, capping lineage the train_hashed_classifier
way; the corpus-sized table is never checkpointed and never shuffles
wider than (vec_id, cluster) partial sums. Int64 headroom: |q| <= 2^s,
so per-(cluster, d) sums are exact to ~2^(63-s) member rows and
distances to ~2^(63 - 2s - log2 d) — at s=8, d=64 that is ~3.5e13
vectors per cluster, far past any real shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "kmeans_quantized", "pq_train_codebooks"]


def _quantized_long(
    emb: DataFrame, vec_col: str, id_col: str, scale_pow2: int
) -> DataFrame:
    qv = F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double)"
        f" * {float(1 << scale_pow2)}) as bigint))"
    )
    return (
        emb.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("vec_id"), qv.alias("_qv"))
        .select(
            "vec_id", F.posexplode("_qv").alias("_d0", "qd")
        )
        .select("vec_id", (F.col("_d0") + 1).alias("d"), "qd")
    )


def kmeans_assign(
    base_long: DataFrame,
    cents: DataFrame,
    group_col: str | None = None,
) -> DataFrame:
    """One assignment pass: nearest centroid per vector, ties to the
    lowest cluster id. ``base_long`` is the ``(vec_id, d, qd)`` table,
    ``cents`` the ``(cluster, d, m)`` table (broadcast — model-sized).
    Returns ``(vec_id, cluster, dist2)`` with the exact squared L2
    distance in quantized units.

    ``group_col`` (round-13 PQ extension): when set, both tables carry
    that column and every key includes it — N independent k-means
    problems (e.g. PQ subspaces) assign in ONE distributed pass."""
    gk = [group_col] if group_col else []
    diff = F.col("qd") - F.col("m")
    dist = (
        base_long.join(F.broadcast(cents), gk + ["d"])
        .groupBy(*gk, "vec_id", "cluster")
        .agg(F.sum(diff * diff).alias("dist2"))
    )
    return dist.groupBy(*gk, "vec_id").agg(
        F.min(F.struct("dist2", "cluster")).alias("_best")
    ).select(
        *gk,
        "vec_id",
        F.col("_best.cluster").alias("cluster"),
        F.col("_best.dist2").alias("dist2"),
    )


def kmeans_quantized(
    emb: DataFrame,
    k: int,
    n_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale_pow2: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Train integer-exact k-means; returns ``(assignments, centroids)``
    — ``(vec_id, cluster, dist2)`` under the FINAL centroids, and the
    ``(cluster, d, m)`` centroid table ready for
    :func:`~.similarity.ivf_topk`-style consumers.

    Init: clusters 0..k-1 seeded from the vectors with ids 0..k-1 (the
    ivfpq queries' convention — ids must exist; callers with sparse ids
    remap first)."""
    if k < 1:
        raise ValueError(f"kmeans_quantized: k must be >= 1, got {k!r}")
    if n_iters < 0:
        raise ValueError(
            f"kmeans_quantized: n_iters must be >= 0, got {n_iters!r}"
        )
    base = _quantized_long(emb, vec_col, id_col, scale_pow2)
    cents = (
        base.filter(F.col("vec_id") < k)
        .select(
            F.col("vec_id").cast("int").alias("cluster"),
            "d",
            F.col("qd").alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iters):
        assign = kmeans_assign(base, cents)
        upd = (
            assign.join(base, "vec_id")
            .groupBy("cluster", "d")
            .agg(F.sum("qd").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .select("cluster", "d", F.expr("_s div _n").alias("_m_new"))
        )
        cents = (
            cents.join(upd, ["cluster", "d"], "left")
            .select(
                "cluster", "d", F.coalesce("_m_new", "m").alias("m")
            )
            .localCheckpoint(eager=True)
        )
    return kmeans_assign(base, cents), cents


def pq_train_codebooks(
    emb: DataFrame,
    dim: int,
    n_subspaces: int,
    n_codes: int,
    n_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale_pow2: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Train PRODUCT-QUANTIZATION codebooks — k-means per subspace
    (Jégou et al. 2011, §II: split the vector into m subvectors, train
    an independent quantizer per subspace), completing the IVF-PQ
    family's train side (operators/similarity.py consumes codebook
    tables; until now they arrived from outside).

    All ``n_subspaces`` k-means problems train SIMULTANEOUSLY in one
    distributed job per iteration: the long format carries
    ``(subspace, vec_id, d, qd)``, the centroid table
    ``(subspace, cluster, d, m)`` broadcasts whole (n_subspaces *
    n_codes * sub_dim integers — still model-sized), and the
    assignment/update aggregations just add ``subspace`` to their keys
    (:func:`kmeans_assign` with ``group_col``). Same exact-integer
    discipline as :func:`kmeans_quantized`: truncated-mean centroids,
    ties to the lowest code, empty codes keep their centroid, init =
    vectors 0..n_codes-1 per subspace.

    Returns ``(assignments, codebooks)``: ``(subspace, vec_id, cluster,
    dist2)`` — the PQ CODE of every vector per subspace under the final
    codebooks — and ``(subspace, cluster, d, m)`` with d the 1-based
    LOCAL dimension.
    """
    if dim < 1 or n_subspaces < 1 or dim % n_subspaces:
        raise ValueError(
            f"pq_train_codebooks: n_subspaces ({n_subspaces!r}) must"
            f" divide dim ({dim!r})"
        )
    if n_codes < 1:
        raise ValueError(
            f"pq_train_codebooks: n_codes must be >= 1, got {n_codes!r}"
        )
    sub_dim = dim // n_subspaces
    base = (
        _quantized_long(emb, vec_col, id_col, scale_pow2)
        .select(
            F.expr(f"cast((d - 1) div {sub_dim} as int)").alias("subspace"),
            "vec_id",
            F.expr(f"cast((d - 1) % {sub_dim} + 1 as int)").alias("d"),
            "qd",
        )
    )
    cents = (
        base.filter(F.col("vec_id") < n_codes)
        .select(
            "subspace",
            F.col("vec_id").cast("int").alias("cluster"),
            "d",
            F.col("qd").alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iters):
        assign = kmeans_assign(base, cents, group_col="subspace")
        upd = (
            assign.join(base, ["subspace", "vec_id"])
            .groupBy("subspace", "cluster", "d")
            .agg(F.sum("qd").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .select(
                "subspace", "cluster", "d",
                F.expr("_s div _n").alias("_m_new"),
            )
        )
        cents = (
            cents.join(upd, ["subspace", "cluster", "d"], "left")
            .select(
                "subspace", "cluster", "d",
                F.coalesce("_m_new", "m").alias("m"),
            )
            .localCheckpoint(eager=True)
        )
    return kmeans_assign(base, cents, group_col="subspace"), cents

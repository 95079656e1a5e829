"""Integer-exact k-means (operators/clustering.py): python big-int model
parity on the full trajectory, planted-blob recovery, degenerate rules
(ties, empty clusters, n_iters=0), and the registered queries'
invariants."""

from __future__ import annotations

import math

import pytest

from real_estate_project1_etl_spark.operators.clustering import (
    kmeans_assign,
    kmeans_quantized,
)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _py_kmeans(vectors, k, n_iters, scale_pow2=8):
    # the exact model: quantize, truncated-mean Lloyd, ties to lowest id
    q = {
        vid: [math.floor(x * (1 << scale_pow2)) for x in v]
        for vid, v in vectors
    }
    dim = len(next(iter(q.values())))
    cents = {c: list(q[c]) for c in range(k)}

    def assign():
        out = {}
        for vid, qv in q.items():
            best = min(
                (sum((qv[d] - m[d]) ** 2 for d in range(dim)), c)
                for c, m in cents.items()
            )
            out[vid] = (best[1], best[0])
        return out

    for _ in range(n_iters):
        a = assign()
        sums: dict = {}
        for vid, (c, _d) in a.items():
            s, n = sums.setdefault(c, ([0] * dim, 0))
            for d in range(dim):
                s[d] += q[vid][d]
            sums[c] = (s, n + 1)
        for c, (s, n) in sums.items():
            cents[c] = [_tdiv(s[d], n) for d in range(dim)]
    return assign(), cents


def _vectors(seed_n=40, dim=6):
    # three planted blobs + noise, deterministic
    out = []
    for i in range(seed_n):
        blob = i % 3
        base = [(1.0 if d == blob * 2 else -0.3) for d in range(dim)]
        noise = [
            (((i * 2654435761 + d * 97) % 200) / 1000.0) - 0.1
            for d in range(dim)
        ]
        out.append((i, [b + n for b, n in zip(base, noise)]))
    return out


def test_kmeans_matches_python_model_full_trajectory(spark):
    vecs = _vectors()
    df = spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<double>"
    )
    for iters in (0, 1, 3):
        assign, cents = kmeans_quantized(df, k=3, n_iters=iters)
        got_a = {
            r["vec_id"]: (r["cluster"], r["dist2"])
            for r in assign.collect()
        }
        got_c = {}
        for r in cents.collect():
            got_c.setdefault(r["cluster"], {})[r["d"]] = r["m"]
        want_a, want_c = _py_kmeans(vecs, k=3, n_iters=iters)
        assert got_a == want_a, iters
        assert {
            c: [m[d + 1] for d in range(len(m))] for c, m in got_c.items()
        } == want_c, iters


def test_kmeans_recovers_planted_blobs(spark):
    vecs = _vectors(seed_n=60)
    df = spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<double>"
    )
    assign, _ = kmeans_quantized(df, k=3, n_iters=4)
    rows = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    # every planted blob lands in ONE cluster (init ids 0,1,2 are one
    # vector from each blob, so the mapping is identity here)
    for vid, c in rows.items():
        assert c == vid % 3, (vid, c)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two identical far-right points + seed 0 at the origin: cluster 1
    # captures everything after one step, cluster 0 empties and must
    # keep its previous centroid (not NaN/NULL/vanish)
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.9, 0.9]), (2, [0.9, 0.9]),
         (3, [0.89, 0.91])],
        "vec_id bigint, embedding array<double>",
    )
    assign, cents = kmeans_quantized(df, k=2, n_iters=3)
    c = {}
    for r in cents.collect():
        c.setdefault(r["cluster"], {})[r["d"]] = r["m"]
    assert set(c) == {0, 1}
    assert c[0] == {1: 0, 2: 0}  # kept, exactly the seed
    rows = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    assert rows[1] == rows[2] == rows[3] == 1
    # vec 0 sits ON cluster 0's kept centroid
    assert rows[0] == 0


def test_kmeans_tie_goes_to_lowest_cluster(spark):
    # a point equidistant from both seeds must take cluster 0
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0]), (2, [0.5])],
        "vec_id bigint, embedding array<double>",
    )
    assign, cents = kmeans_quantized(df, k=2, n_iters=0)
    rows = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in assign.collect()}
    # q = floor(x*256): 0 -> 0, 1.0 -> 256, 0.5 -> 128: exactly halfway
    assert rows[2] == (0, 128 * 128)


def test_kmeans_rejects_bad_params(spark):
    df = spark.createDataFrame(
        [(0, [0.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError):
        kmeans_quantized(df, k=0)
    with pytest.raises(ValueError):
        kmeans_quantized(df, k=1, n_iters=-1)


def test_registered_kmeans_invariants(spark, sf_dir):
    import __spark_entry__ as entry

    summ = {
        r["cluster"]: (r["n"], r["inertia"])
        for r in entry.queries()["embeddings_kmeans_summary"](
            spark, sf_dir
        ).collect()
    }
    assert sum(n for n, _ in summ.values()) > 0
    assert all(i >= 0 for _, i in summ.values())
    a = entry.queries()["embeddings_kmeans_assign"](spark, sf_dir)
    n_vec = a.count()
    assert n_vec == sum(n for n, _ in summ.values())
    assert a.select("vec_id").distinct().count() == n_vec


def test_pq_codebooks_match_per_subspace_python_model(spark):
    # training all subspaces in one pass must equal running the python
    # kmeans model independently on each subvector slice
    vecs = _vectors(seed_n=40, dim=8)
    df = spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<double>"
    )
    from real_estate_project1_etl_spark.operators.clustering import (
        pq_train_codebooks,
    )

    assign, books = pq_train_codebooks(
        df, dim=8, n_subspaces=2, n_codes=3, n_iters=2
    )
    got_b = {}
    for r in books.collect():
        got_b.setdefault((r["subspace"], r["cluster"]), {})[r["d"]] = r["m"]
    got_a = {
        (r["subspace"], r["vec_id"]): (r["cluster"], r["dist2"])
        for r in assign.collect()
    }
    for sub in (0, 1):
        sl = [(vid, v[sub * 4:(sub + 1) * 4]) for vid, v in vecs]
        want_a, want_c = _py_kmeans(sl, k=3, n_iters=2)
        for c, m in want_c.items():
            assert [got_b[(sub, c)][d + 1] for d in range(4)] == m, (sub, c)
        for vid, want in want_a.items():
            assert got_a[(sub, vid)] == want, (sub, vid)


def test_pq_rejects_bad_split(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(0, [0.0] * 8)], "vec_id bigint, embedding array<double>"
    )
    from real_estate_project1_etl_spark.operators.clustering import (
        pq_train_codebooks,
    )

    with _pytest.raises(ValueError):
        pq_train_codebooks(df, dim=8, n_subspaces=3, n_codes=2)
    with _pytest.raises(ValueError):
        pq_train_codebooks(df, dim=8, n_subspaces=2, n_codes=0)

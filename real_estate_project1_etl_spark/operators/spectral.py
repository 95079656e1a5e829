"""Spectral ops over embedding columns: exact-integer scatter matrix +
power-iteration dominant principal component.

The reference has no vector surface at all (SURVEY §2b north-star gap);
a training-data pipeline uses the corpus's dominant principal direction
constantly — embedding whitening/decorrelation, drift detection between
crawl snapshots, picking the split axis for balanced ANN cells (the
IVF-PQ hot-cell story in operators/similarity.py), or ABTT-style
common-direction removal (Mu & Viswanath, ICLR'18 "All-but-the-Top").
At 100 TB the data matrix never fits anywhere, but PCA only needs the
d x d scatter — a perfectly partial-aggregable sum of per-row outer
products — and power iteration on that tiny matrix (von Mises &
Pollaczek-Geiringer 1929; the PageRank of linear algebra) needs one
broadcast-sized matrix-vector product per step.

Everything is EXACT integer arithmetic so the whole trajectory is
engine-mirrorable (the module's oracle-determinism discipline):

- floats quantize by a power-of-two scale: ``q = floor(x * 2^s)`` —
  float->double is exact, multiplying by 2^s is exact IEEE, floor is
  engine-identical; q is a bigint.
- the CENTERED scatter is computed without ever forming rational means:
  ``C = n * G - s s^T`` where ``G = sum q q^T`` and ``s = sum q``
  (n^2 times the covariance — exact, PSD).
- magnitude control is deterministic truncation, not float scaling:
  C is right-shifted to <= 36 significant bits, each iterate to <= 20
  bits (``x div 2^t`` with ``t = max(bitlen(max|x|) - cap, 0)`` and
  ``bitlen = length(bin(|x|))`` — integer expressions both engines
  evaluate identically; headroom: |Cv| <= 2^(36+20+log2 d) < 2^63 for
  d <= 64). Truncation perturbs the iteration by < 2^-19 per step —
  far below the eigengap of any direction worth extracting — and the
  OUTPUT is deterministic arithmetic either way, so correctness never
  rests on the perturbation being small; only numpy-alignment does
  (pinned in tests).
- the reported direction is scale-free: ``v_ppm = (1e6 * v_i) div
  max|v|`` — ppm of the largest component, sign fixed by the all-ones
  start vector.

Scale shape: quantization + per-row outer products live in the scan
stage; the ONLY corpus-sized exchange is the (i, j)-keyed partial
aggregation to d^2 = 4096 cells (map-side combine does almost all of
it). The scatter, the shift scalars, and every iterate are model-sized
(d^2 / 1 / d rows); iterates re-checkpoint per step, capping lineage the
train_hashed_classifier way. Nothing is collected to the driver.

Row-count bound (int64): centering forms ``n*G - s*s`` with
``|G| <= n * 2^(2*scale_pow2)``, so the scatter stays exact up to
``n ~ 2^(23.5 - (scale_pow2 - 8))`` rows (~11M vectors at the default
2^8 scale). Beyond that, either sample the scatter input (a uniform
hash sample estimates the same covariance — the eval-battery precedent)
or promote the three sums to decimal(38,0)/HUGEINT before centering and
derive the 36-bit cap from the decimal's digit count — the documented
production variant; the 36-bit cap already normalizes whatever scale
the sums arrive at.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "deflate",
    "direction_drift",
    "power_iteration_components",
    "power_iteration_top_component",
    "quantized_scatter",
    "remove_component",
    "scatter_from_partials",
    "scatter_partials",
]

#: bit caps: scatter <= 2^36, iterate <= 2^20 — |C v| < 2^63 for d <= 64
_C_BITS = 36
_V_BITS = 20


def quantized_scatter(
    emb: DataFrame,
    vec_col: str = "embedding",
    scale_pow2: int = 8,
    accumulate: str = "bigint",
) -> DataFrame:
    """Exact centered scatter matrix of the quantized embeddings:
    ``(i, j, c)`` with 1-based dims and ``c = n * sum(q_i q_j) -
    sum(q_i) * sum(q_j)``, right-shifted to <= 2^36 so downstream
    matrix-vector products cannot overflow. One corpus pass; the output
    is d^2 rows.

    ``accumulate='bigint'`` (default) is exact while ``n * n *
    2^(2*scale_pow2)`` fits int64 (~11M rows at scale 2^8) — beyond
    that Spark's non-ANSI int64 sum WRAPS SILENTLY, so for larger
    corpora use ``accumulate='decimal'``: sums, centering, and the cap
    all run in decimal(38,0) (exact to ~2^126; DuckDB mirror: HUGEINT),
    with the 36-bit cap derived from the DIGIT count of the max cell —
    ``t = max(0, (10*digits) div 3 + 1 - 36)`` over-shifts by <= 3 bits
    (10/3 > log2(10)), a deterministic integer spec both engines
    replay. The two modes produce (slightly) different capped matrices
    by construction — each is its own differential spec; both feed the
    same power iteration.

    The bigint row-count bound is GUARDED at runtime, not just
    documented: the plan itself raises (Spark ``raise_error``) while
    computing the centered cells if ``n > isqrt(2^(63 - 2*scale_pow2))``
    — the point past which ``n * g`` / ``s_i * s_j`` can cross 2^63 and
    Spark's non-ANSI int64 arithmetic would wrap SILENTLY. The check is
    evaluated on the d^2-row aggregated table (cost: one comparison per
    cell), so exceeding the exactness envelope fails loud instead of
    returning a wrapped — plausible-looking — scatter."""
    if accumulate not in ("bigint", "decimal"):
        raise ValueError(
            f"quantized_scatter: accumulate must be 'bigint' or 'decimal',"
            f" got {accumulate!r}"
        )
    if not 0 <= scale_pow2 <= 30:
        raise ValueError(
            f"quantized_scatter: scale_pow2 must be in [0, 30], got {scale_pow2!r}"
        )
    # quantize the whole vector once per row; the outer product is a
    # chained double posexplode over the SAME array — no self-join, no
    # shuffle of the exploded table: the d^2 products are generated in
    # the scan stage and map-side partial aggregation collapses each
    # task to <= d^2 cells before the single tiny exchange
    qv = F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double)"
        f" * {float(1 << scale_pow2)}) as bigint))"
    )
    rows = emb.select(qv.alias("_qv"))
    # symmetry: generate only j >= i (slice the array from position i),
    # halving the explode volume; mirror the strict upper triangle after
    # the aggregation (4096-row table — free)
    pairs = rows.select(
        F.posexplode("_qv").alias("_i0", "_qi"), F.col("_qv")
    ).select(
        (F.col("_i0") + 1).alias("i"),
        F.col("_qi"),
        F.posexplode(
            F.expr("slice(_qv, _i0 + 1, size(_qv) - _i0)")
        ).alias("_j0", "_qj"),
    )
    dec = accumulate == "decimal"
    prod = F.col("_qi") * F.col("_qj")
    g_up = pairs.groupBy(
        "i", (F.col("i") + F.col("_j0")).alias("j")
    ).agg(
        F.sum(prod.cast("decimal(38,0)") if dec else prod).alias("g")
    )
    g = g_up.unionAll(
        g_up.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "g"
        )
    )
    sv = F.col("_qi").cast("decimal(38,0)") if dec else F.col("_qi")
    s = (
        rows.select(F.posexplode("_qv").alias("_i0", "_qi"))
        .groupBy((F.col("_i0") + 1).alias("i"))
        .agg(F.sum(sv).alias("s"))
    )
    cnt = F.count(F.lit(1))
    n = emb.agg(
        (cnt.cast("decimal(38,0)") if dec else cnt).alias("n")
    )
    cval = F.col("n") * F.col("g") - F.col("si") * F.col("sj")
    if not dec:
        # runtime exactness guard (ADVICE r12): past this row count the
        # centering intermediates can cross 2^63 and non-ANSI int64
        # arithmetic wraps silently — fail loud inside the plan instead
        n_max = math.isqrt(1 << (63 - 2 * scale_pow2))
        cval = F.when(
            F.col("n") > F.lit(n_max),
            F.raise_error(
                F.lit(
                    "quantized_scatter: bigint accumulation is exact only"
                    f" to n <= {n_max} rows at scale 2^{scale_pow2}"
                    " (n*n*2^(2*scale) must fit int64); rerun with"
                    " accumulate='decimal'"
                )
            ).cast("bigint"),
        ).otherwise(cval)
    c0 = (
        g.join(F.broadcast(s.select(F.col("i"), F.col("s").alias("si"))), "i")
        .join(
            F.broadcast(
                s.select(F.col("i").alias("j"), F.col("s").alias("sj"))
            ),
            "j",
        )
        .crossJoin(F.broadcast(n))
        .select("i", "j", cval.alias("c"))
    )
    if dec:
        return _digit_cap(c0)
    t = c0.agg(
        F.greatest(
            F.length(F.bin(F.max(F.abs(F.col("c"))))) - F.lit(_C_BITS),
            F.lit(0),
        ).alias("t")
    )
    return c0.crossJoin(F.broadcast(t)).select(
        "i",
        "j",
        F.expr("c div (shiftleft(cast(1 as bigint), t))").alias("c"),
    )


def _digit_cap(c0: DataFrame) -> DataFrame:
    """Right-shift decimal(38,0) centered cells to <= 2^36 significant
    bits using the DIGIT-count bound ``value < 10^digits <
    2^((10*digits) div 3 + 1)`` (10/3 > log2(10), so the shift
    over-estimates by <= 3 bits) — the deterministic integer spec both
    engines replay.  Shared by :func:`quantized_scatter`'s decimal path
    and :func:`scatter_from_partials`, which must emit IDENTICAL capped
    matrices for the stream==batch contract."""
    t = c0.agg(
        F.greatest(
            F.expr(
                "(10 * length(cast(max(abs(c)) as string))) div 3"
                f" + 1 - {_C_BITS}"
            ),
            F.lit(0),
        ).alias("t")
    )
    # 2^t as decimal via a split shift (t can exceed a bigint shift)
    pow2 = (
        "cast(shiftleft(cast(1 as bigint), least(t, 60)) as"
        " decimal(38,0)) * cast(shiftleft(cast(1 as bigint),"
        " greatest(t - 60, 0)) as decimal(38,0))"
    )
    return c0.crossJoin(F.broadcast(t)).select(
        "i",
        "j",
        F.expr(f"cast(c div ({pow2}) as bigint)").alias("c"),
    )


def scatter_partials(
    emb: DataFrame,
    vec_col: str = "embedding",
    scale_pow2: int = 8,
) -> DataFrame:
    """ADDITIVE sufficient statistics of the quantized scatter as one
    tall decimal(38,0) table ``(kind, i, j, val)`` — the mergeable form
    for incremental/streaming maintenance:

    - ``kind='g'``: upper-triangle Gram cells ``sum(q_i q_j)``, j >= i;
    - ``kind='s'``: per-dimension sums ``sum(q_i)`` (j = 0);
    - ``kind='n'``: the row count (i = j = 0).

    All three are plain sums, so partials from any split of the corpus
    (micro-batches, partitions, snapshots) merge by summing ``val`` —
    and :func:`scatter_from_partials` on the merged table is
    VALUE-IDENTICAL to ``quantized_scatter(all_rows,
    accumulate='decimal')`` (pinned in tests and by the streaming
    monitor's stream==batch test).  The decimal accumulation makes the
    merged statistics exact at any corpus size (no bigint wrap), which
    is why the partials form has no 'bigint' mode.

    Scale shape per batch/partition: one scan, one partial aggregation
    to <= d^2/2 + d + 1 cells — the store grows by a model-sized delta
    per batch, never by rows.
    """
    qv = F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double)"
        f" * {float(1 << scale_pow2)}) as bigint))"
    )
    rows = emb.select(qv.alias("_qv"))
    pairs = rows.select(
        F.posexplode("_qv").alias("_i0", "_qi"), F.col("_qv")
    ).select(
        (F.col("_i0") + 1).alias("i"),
        F.col("_qi"),
        F.posexplode(
            F.expr("slice(_qv, _i0 + 1, size(_qv) - _i0)")
        ).alias("_j0", "_qj"),
    )
    g_up = pairs.groupBy(
        "i", (F.col("i") + F.col("_j0")).alias("j")
    ).agg(
        F.sum(
            (F.col("_qi") * F.col("_qj")).cast("decimal(38,0)")
        ).alias("val")
    )
    s = (
        rows.select(F.posexplode("_qv").alias("_i0", "_qi"))
        .groupBy((F.col("_i0") + 1).alias("i"))
        .agg(F.sum(F.col("_qi").cast("decimal(38,0)")).alias("val"))
        .select("i", F.lit(0).alias("j"), "val")
    )
    n = emb.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("val")
    ).select(F.lit(0).alias("i"), F.lit(0).alias("j"), "val")
    return (
        g_up.select(F.lit("g").alias("kind"), "i", "j", "val")
        .unionByName(s.select(F.lit("s").alias("kind"), "i", "j", "val"))
        .unionByName(n.select(F.lit("n").alias("kind"), "i", "j", "val"))
    )


def scatter_from_partials(partials: DataFrame) -> DataFrame:
    """Merge additive scatter partials (sum ``val`` per cell) and
    reconstruct the capped centered scatter ``(i, j, c)`` — value-
    identical to ``quantized_scatter(union_of_inputs,
    accumulate='decimal')`` because centering and the digit-count cap
    run on the exact merged sums through the same shared code path
    (:func:`_digit_cap`)."""
    m = partials.groupBy("kind", "i", "j").agg(F.sum("val").alias("val"))
    g_up = m.filter(F.col("kind") == "g").select("i", "j", F.col("val").alias("g"))
    g = g_up.unionAll(
        g_up.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "g"
        )
    )
    s = m.filter(F.col("kind") == "s").select("i", F.col("val").alias("s"))
    n = m.filter(F.col("kind") == "n").select(F.col("val").alias("n"))
    c0 = (
        g.join(F.broadcast(s.select(F.col("i"), F.col("s").alias("si"))), "i")
        .join(
            F.broadcast(
                s.select(F.col("i").alias("j"), F.col("s").alias("sj"))
            ),
            "j",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.col("n") * F.col("g") - F.col("si") * F.col("sj")).alias("c"),
        )
    )
    return _digit_cap(c0)


def power_iteration_top_component(
    scatter: DataFrame, dim: int, n_iters: int = 8
) -> DataFrame:
    """Dominant principal direction of a (shift-capped) scatter matrix
    by deterministic power iteration: start from all-ones, multiply,
    right-shift each iterate to <= 2^20 significant bits, repeat.
    Returns ``(i, v_ppm)`` — the direction in ppm of its largest
    |component|, sign inherited from the all-ones start."""
    if dim < 1 or dim > 64:
        raise ValueError(
            f"power_iteration_top_component: dim must be in [1, 64], got {dim!r}"
        )
    if n_iters < 1:
        raise ValueError(
            f"power_iteration_top_component: n_iters must be >= 1, got {n_iters!r}"
        )
    spark = scatter.sparkSession
    # The iterate is MODEL-sized: the scatter is <= dim^2 <= 4096 cells
    # (dim is capped at 64 above) no matter how many rows fed it, and
    # each step is an O(dim^2) integer mat-vec.  Running the steps as
    # Spark jobs paid 8 x (broadcast join + 2 aggregations + an eager
    # localCheckpoint) of pure scheduling overhead (~0.25 s each at any
    # scale — the work is 4096 multiplies); the distributed corpus pass
    # is the scatter AGGREGATION, which the collect() below executes
    # exactly once.  So iterate on the driver in exact (arbitrary-
    # precision) integer arithmetic — the same class of bounded
    # driver-side step as the BPE trainer's per-round argmax collect —
    # reproducing Spark's semantics operation for operation:
    #   * `div` truncates toward zero (matches the former
    #     `u div shiftleft(1, sh)` and `(1000000*v) div m`);
    #   * the shift is length(bin(max|u|)) - _V_BITS, i.e. the bit
    #     length of max|u| (bin(0) = "0" has length 1);
    #   * integer sums are order-insensitive, so the fold order below
    #     cannot diverge from the distributed aggregation.
    # The 8-step trajectory is therefore bit-identical to the former
    # distributed loop (pinned by the unrolled DuckDB oracle and
    # tests/test_spectral.py).

    def _tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    cells = {}
    for r in scatter.select("i", "j", "c").collect():
        cells[(r["i"], r["j"])] = int(r["c"])
    v = {i: 1 for i in range(1, dim + 1)}
    for _ in range(n_iters):
        u = {
            i: sum(
                cells.get((i, j), 0) * v[j] for j in range(1, dim + 1)
            )
            for i in range(1, dim + 1)
        }
        mx = max(abs(x) for x in u.values())
        blen = mx.bit_length() if mx > 0 else 1  # length(bin(0)) == 1
        sh = max(blen - _V_BITS, 0)
        v = {i: _tdiv(u[i], 1 << sh) for i in range(1, dim + 1)}
    m = max(abs(x) for x in v.values())
    rows = [
        (i, _tdiv(1_000_000 * v[i], m) if m != 0 else None)
        for i in range(1, dim + 1)
    ]
    return spark.createDataFrame(rows, "i int, v_ppm bigint")


def remove_component(
    emb: DataFrame,
    component: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale_pow2: int = 8,
    comp_idx_col: str = "i",
    comp_val_col: str = "v_ppm",
) -> DataFrame:
    """APPLY half of the spectral pair (fit = scatter + power iteration):
    remove a direction from every embedding — ABTT common-direction
    removal (Mu & Viswanath, ICLR'18 "All-but-the-Top"), the
    post-processing that measurably improves similarity search on raw
    embedding corpora.

    Exact integer arithmetic with NO division: for quantized row ``q``
    and direction ``v``, the residual is returned multiplied through by
    ``den = v.v``:  ``r = den * q - (q.v) * v`` — a positive scaling of
    the true projection residual (direction-preserving; downstream
    cosine / top-k are scale-invariant), and EXACTLY orthogonal to v:
    ``r.v = den*(q.v) - (q.v)*den = 0`` — an integer identity both
    engines reproduce bit-for-bit (and the module's tests assert).

    ``component`` is a ``(comp_idx_col 1-based, comp_val_col)`` table —
    :func:`power_iteration_top_component`'s output shape. Returns
    exploded ``(id_col, i, r)`` rows.

    Scale shape: the direction is a d-row broadcast; quantization, the
    dot product (one array fold after a zip via the posexploded join)
    and the residual are scan-stage per-row work; output is narrow.
    """
    qv = F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double)"
        f" * {float(1 << scale_pow2)}) as bigint))"
    )
    ex = emb.select(F.col(id_col), qv.alias("_qv")).select(
        id_col, F.posexplode("_qv").alias("_i0", "_q")
    ).select(id_col, (F.col("_i0") + 1).alias("i"), F.col("_q"))
    comp = component.select(
        F.col(comp_idx_col).alias("i"), F.col(comp_val_col).alias("_v")
    )
    j = ex.join(F.broadcast(comp), "i")
    dots = j.groupBy(id_col).agg(
        F.sum(F.col("_q") * F.col("_v")).alias("_num")
    )
    den = comp.agg(F.sum(F.col("_v") * F.col("_v")).alias("_den"))
    return (
        j.join(dots, id_col)
        .crossJoin(F.broadcast(den))
        .select(
            id_col,
            "i",
            (F.col("_den") * F.col("_q") - F.col("_num") * F.col("_v"))
            .cast("bigint")
            .alias("r"),
        )
    )


#: deflation direction shift: w = v_ppm div 2^11 keeps |w| <= 2^9, so
#: |(w.w)*C| <= 2^(24+36) and |(Cw)*w| <= 2^(51+9) — both under 2^61
_DEFLATE_SHIFT = 11


def deflate(scatter: DataFrame, component: DataFrame) -> DataFrame:
    """Hotelling deflation in exact integers: with the truncated
    direction ``w = v_ppm div 2^11``, return ``D = (w.w)*C - (C w) w^T``
    re-capped to <= 2^36.  ``D w = (w.w)(C w) - (C w)(w.w) = 0`` is an
    integer IDENTITY — the deflated matrix annihilates exactly the
    direction that was extracted, however imperfectly converged, so
    deflation error never depends on convergence quality. Eigenvalues
    orthogonal to ``w`` scale by the positive constant ``w.w``
    (order-preserving), which the 36-bit re-cap then normalizes away.

    Model-sized throughout: d^2-row joins against d-row broadcasts."""
    w = component.select(
        F.col("i"), F.expr(f"v_ppm div {1 << _DEFLATE_SHIFT}").alias("w")
    )
    ww = w.agg(F.sum(F.col("w") * F.col("w")).alias("ww"))
    wj = w.select(F.col("i").alias("j"), F.col("w"))
    cw = (
        scatter.join(F.broadcast(wj), "j")
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("w")).alias("u"))
    )
    d0 = (
        scatter.join(F.broadcast(wj), "j")
        .join(F.broadcast(cw), "i")
        .crossJoin(F.broadcast(ww))
        .select(
            "i",
            "j",
            (F.col("ww") * F.col("c") - F.col("u") * F.col("w")).alias("c"),
        )
    )
    t = d0.agg(
        F.greatest(
            F.length(F.bin(F.max(F.abs(F.col("c"))))) - F.lit(_C_BITS),
            F.lit(0),
        ).alias("t")
    )
    return d0.crossJoin(F.broadcast(t)).select(
        "i",
        "j",
        F.expr("c div (shiftleft(cast(1 as bigint), t))").alias("c"),
    )


def power_iteration_components(
    scatter: DataFrame, dim: int, n_components: int = 2, n_iters: int = 8
) -> DataFrame:
    """Top-``n_components`` principal directions by power iteration +
    Hotelling deflation. Returns ``(component 1-based, i, v_ppm)`` —
    each direction in ppm of its largest |entry|. Like everything in
    this module the full trajectory is exact truncating-integer
    arithmetic, so both directions are engine-mirrorable; alignment
    with numpy's top-2 eigenvectors is pinned in tests."""
    if n_components < 1:
        raise ValueError(
            "power_iteration_components: n_components must be >= 1, got "
            f"{n_components!r}"
        )
    outs = []
    cm = scatter
    for c in range(1, n_components + 1):
        comp = power_iteration_top_component(cm, dim=dim, n_iters=n_iters)
        outs.append(
            comp.select(
                F.lit(c).cast("int").alias("component"), "i", "v_ppm"
            )
        )
        if c < n_components:
            cm = deflate(cm, comp)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def direction_drift(comp_a: DataFrame, comp_b: DataFrame) -> DataFrame:
    """Squared-cosine alignment between two extracted directions — the
    drift statistic for comparing embedding snapshots (a distribution
    shift between crawls rotates the dominant principal direction long
    before aggregate norms move; cf. the ABTT observation that the top
    direction carries corpus-wide commonality).

    One row: ``(a_norm2, b_norm2, dot, cos2_ppm)`` with ``cos2_ppm =
    (1e6 * dot^2) div (a_norm2 * b_norm2)`` — squaring removes the
    power iteration's arbitrary sign, and the single truncating
    division keeps the statistic an exact integer (intermediates in
    decimal(38,0): dot <= 64e12, dot^2 <= 4.1e27). 1e6 = identical
    directions; 0 = orthogonal (maximal drift).

    Scale shape: a d-row join — free; the cost lives in building the
    two components.
    """
    a = comp_a.select(F.col("i"), F.col("v_ppm").alias("_va"))
    b = comp_b.select(F.col("i"), F.col("v_ppm").alias("_vb"))
    j = a.join(b, "i").agg(
        F.sum(F.col("_va") * F.col("_va")).alias("a_norm2"),
        F.sum(F.col("_vb") * F.col("_vb")).alias("b_norm2"),
        F.sum(F.col("_va") * F.col("_vb")).alias("dot"),
    )
    return j.select(
        F.col("a_norm2").cast("bigint").alias("a_norm2"),
        F.col("b_norm2").cast("bigint").alias("b_norm2"),
        F.col("dot").cast("bigint").alias("dot"),
        F.when(
            (F.col("a_norm2") > 0) & (F.col("b_norm2") > 0),
            F.expr(
                "cast((cast(1000000 as decimal(38,0)) * dot * dot)"
                " div (cast(a_norm2 as decimal(38,0)) * b_norm2)"
                " as bigint)"
            ),
        ).alias("cos2_ppm"),
    )

"""Binary-classifier evaluation metrics — the eval half of the quality
loop, integer-exact so every number is differentially checkable.

The reference has no model surface at all (its only gate is the row-wise
price filters, reference: transform.py:34-58); a modern curation pipeline
trains quality classifiers IN the engine (operators/quality.py
``train_hashed_classifier``) and must also evaluate them in the engine —
sklearn on a driver-side ``collect()`` stops being an option the moment
the eval slice outgrows one machine. This module computes the standard
binary-classification report as pure DataFrame aggregations:

- **ROC-AUC** via the Mann-Whitney rank-sum identity (Fawcett, "An
  introduction to ROC analysis", Pattern Recognition Letters 2006): with
  ties credited 1/2 (midranks), ``AUC = (2*R_pos - n_pos*(n_pos+1)) /
  (2*n_pos*n_neg)`` where ``R_pos`` is the positive class's ascending
  rank sum. Doubling the midrank sum keeps it an INTEGER:
  ``2*R_pos = sum over score groups cp*(2*r_low + c + 1)``.
- **Average precision** (PR-AUC, step interpolation, ties grouped): the
  descending-score sweep advances one DISTINCT score at a time, so tied
  scores enter together (the standard tie rule);
  ``AP = sum_g (tp_g/n_pos) * precision_g``. Module nested-``div``
  convention: ``precision_ppm`` floors first, then the weighted sum
  floors — both engines replay the same two truncations.
- **Brier score** (Brier, Monthly Weather Review 1950): probabilities are
  milli-units, so ``(p_milli - 1000*y)^2`` is already ppm — the mean is
  one integer division.
- **ECE** (expected calibration error, equal-width bins — Naeini et al.
  AAAI'15; Guo et al., arXiv:1706.04599): the bin-weighted
  ``|confidence - accuracy|`` telescopes to exact integers:
  ``ECE = (1/(1000*N)) * sum_b |sum_p_b - 1000*pos_b|``.
- threshold confusion metrics (accuracy / precision / recall / F1, ppm).

Scale shape: ONE pass over the scored rows for totals + confusion +
Brier + ECE (all partial-aggregable); ROC/AP run on the Zipf-collapsed
DISTINCT-score table (scores are integer milli — model-sized; quantize
first if a score were ever continuous), whose two cumulative windows are
vocabulary-sized, never corpus-sized. Everything stays bigint-exact up
to ~3e9 eval rows (``n_pos*n`` must fit int64); eval slices beyond that
should sample first (``quality.stratified_hash_sample`` — the
retry-stable sampler), which is what an eval set is anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "binary_classifier_eval",
    "calibration_bins",
    "grouped_auc_ppm",
    "ks_statistic",
    "pr_points",
    "roc_points",
    "split_conformal_coverage",
]


def _base(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    p_milli_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    return scored.select(
        F.col(score_col).cast("bigint").alias("s"),
        F.col(label_col).cast("bigint").alias("y"),
        F.col(p_milli_col).cast("bigint").alias("p"),
        w.alias("w"),
    )


def binary_classifier_eval(
    scored: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "label",
    p_milli_col: str = "p_milli",
    threshold_milli: int = 0,
    weight_col: str | None = None,
) -> DataFrame:
    """One-row evaluation report for a scored binary classifier.

    ``scored`` carries an integer ranking score (``score_col``, used for
    AUC/AP and the threshold confusion), a 0/1 label, and a calibrated
    probability in milli-units [0, 1000] (``p_milli_col``, used for
    Brier/ECE). Returns ``(n, n_pos, n_neg, auc_ppm, ap_ppm, brier_ppm,
    ece_ppm, accuracy_ppm, precision_ppm, recall_ppm, f1_ppm)`` — ratio
    metrics are ppm bigints, NULL where undefined (single-class AUC,
    zero predicted positives).

    ``weight_col`` (round-13): an optional per-row multiplicity — the
    report over a ``(s, y, p, cnt)`` CONTINGENCY table (the additive
    sufficient statistic the streaming eval monitor maintains) is then
    value-identical to the report over the expanded rows. Every count
    and sum below is weighted; the rank sweep already runs on the
    distinct-score table, so weighting only changes its c/cp inputs.
    """
    base = _base(scored, score_col, label_col, p_milli_col, weight_col)

    pred = (F.col("s") >= F.lit(int(threshold_milli))).cast("bigint")
    d = F.col("p") - F.lit(1000) * F.col("y")
    nb = F.least(F.expr("p * 10 div 1000"), F.lit(9))
    w = F.col("w")
    tot = base.agg(
        F.coalesce(F.sum(w), F.lit(0)).alias("n"),
        F.coalesce(F.sum(F.col("y") * w), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum(pred * F.col("y") * w), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(pred * (1 - F.col("y")) * w), F.lit(0)).alias("fp"),
        F.coalesce(
            F.sum((1 - pred) * F.col("y") * w), F.lit(0)
        ).alias("fn"),
        F.coalesce(F.sum(d * d * w), F.lit(0)).alias("brier_num"),
    )
    # ECE bins pre-aggregate (<= 10 rows), then the absolute-gap sum
    eb = base.groupBy(nb.alias("b")).agg(
        F.sum(F.col("p") * w).alias("sp"),
        F.sum(F.col("y") * w).alias("pos"),
    )
    ec = eb.agg(
        F.coalesce(
            F.sum(F.abs(F.col("sp") - F.lit(1000) * F.col("pos"))), F.lit(0)
        ).alias("ece_num")
    )
    # distinct-score sweep: ascending ranks for AUC, descending for AP
    g = base.groupBy("s").agg(
        F.sum(w).alias("c"), F.sum(F.col("y") * w).alias("cp")
    )
    w_asc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    w_desc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    o = g.select(
        "c",
        "cp",
        F.coalesce(F.sum("c").over(w_asc), F.lit(0)).alias("r_low"),
        F.sum("c").over(w_desc).alias("cum_n"),
        F.sum("cp").over(w_desc).alias("cum_tp"),
    )
    rk = o.agg(
        F.coalesce(
            F.sum(
                F.col("cp")
                * (F.lit(2) * F.col("r_low") + F.col("c") + F.lit(1))
            ),
            F.lit(0),
        ).alias("s2"),
        F.coalesce(
            F.sum(F.col("cp") * F.expr("(1000000 * cum_tp) div cum_n")),
            F.lit(0),
        ).alias("ap_num"),
    )

    r = tot.crossJoin(rk).crossJoin(ec)
    n_neg = F.col("n") - F.col("n_pos")
    return r.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        F.when(
            (F.col("n_pos") > 0) & (n_neg > 0),
            F.expr(
                "(1000000 * (s2 - n_pos * (n_pos + 1)))"
                " div (2 * n_pos * (n - n_pos))"
            ),
        )
        .cast("bigint")
        .alias("auc_ppm"),
        F.when(F.col("n_pos") > 0, F.expr("ap_num div n_pos"))
        .cast("bigint")
        .alias("ap_ppm"),
        F.expr("brier_num div n").cast("bigint").alias("brier_ppm"),
        F.expr("(1000 * ece_num) div n").cast("bigint").alias("ece_ppm"),
        F.expr("(1000000 * (n - fp - fn)) div n")
        .cast("bigint")
        .alias("accuracy_ppm"),
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr("(1000000 * tp) div (tp + fp)"),
        )
        .cast("bigint")
        .alias("precision_ppm"),
        F.when(F.col("n_pos") > 0, F.expr("(1000000 * tp) div n_pos"))
        .cast("bigint")
        .alias("recall_ppm"),
        F.when(
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.expr("(2000000 * tp) div (2 * tp + fp + fn)"),
        )
        .cast("bigint")
        .alias("f1_ppm"),
    )


def calibration_bins(
    scored: DataFrame,
    p_milli_col: str = "p_milli",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table: equal-width probability bins with mean
    predicted confidence vs empirical positive rate (both ppm) — the
    per-bin decomposition whose weighted gap is the ECE. One aggregation
    exchange; at most ``n_bins`` output rows."""
    if n_bins < 1:
        raise ValueError("calibration_bins: n_bins must be >= 1")
    base = scored.select(
        F.col(p_milli_col).cast("bigint").alias("p"),
        F.col(label_col).cast("bigint").alias("y"),
    )
    b = F.least(
        F.expr(f"p * {int(n_bins)} div 1000"), F.lit(int(n_bins) - 1)
    )
    return (
        base.groupBy(b.cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").alias("sp"),
            F.sum("y").alias("pos"),
        )
        .select(
            "bin",
            F.col("n").cast("bigint").alias("n"),
            F.expr("(1000 * sp) div n").cast("bigint").alias("conf_ppm"),
            F.expr("(1000000 * pos) div n").cast("bigint").alias("acc_ppm"),
        )
    )


def grouped_auc_ppm(
    scored: DataFrame,
    group_cols: list[str],
    score_col: str = "score_milli",
    label_col: str = "label",
) -> DataFrame:
    """Per-group ROC-AUC (midrank Mann-Whitney, same integer identity as
    :func:`binary_classifier_eval`) — the sliced-eval discipline: a gate
    that looks fine in aggregate can be chance-level (or inverted) on a
    language/source slice, exactly the failure multilingual curation
    audits for (cf. the per-language fertility audit in
    :func:`~.textstats.wordpiece_fertility_by_group`).

    Returns one row per group: ``(group_cols..., n, n_pos, n_neg,
    auc_ppm)`` with ``auc_ppm`` NULL for single-class slices.

    Scale shape: the rank sweep runs on the per-(group, distinct-score)
    table — Zipf-collapsed, model-sized per group; the cumulative window
    partitions on the group key, so no single-task global sort. One
    aggregation exchange on (group, score), one on group.
    """
    base = scored.select(
        *group_cols,
        F.col(score_col).cast("bigint").alias("s"),
        F.col(label_col).cast("bigint").alias("y"),
    )
    g = base.groupBy(*group_cols, "s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("cp")
    )
    w_asc = (
        Window.partitionBy(*group_cols)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = g.select(
        *group_cols,
        "c",
        "cp",
        F.coalesce(F.sum("c").over(w_asc), F.lit(0)).alias("r_low"),
    )
    per = o.groupBy(*group_cols).agg(
        F.sum("c").alias("n"),
        F.sum("cp").alias("n_pos"),
        F.sum(
            F.col("cp") * (F.lit(2) * F.col("r_low") + F.col("c") + F.lit(1))
        ).alias("s2"),
    )
    n_neg = F.col("n") - F.col("n_pos")
    return per.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        F.when(
            (F.col("n_pos") > 0) & (n_neg > 0),
            F.expr(
                "(1000000 * (s2 - n_pos * (n_pos + 1)))"
                " div (2 * n_pos * (n - n_pos))"
            ),
        )
        .cast("bigint")
        .alias("auc_ppm"),
    )


def roc_points(
    scored: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "label",
) -> DataFrame:
    """ROC curve as data: one point per DISTINCT score threshold —
    ``(threshold, tp, fp, tpr_ppm, fpr_ppm)`` where the classifier
    predicts positive iff ``score >= threshold`` (ties enter together,
    so the curve is the tie-grouped staircase whose trapezoid area is
    the midrank AUC). Returns at most |distinct scores| rows — the
    plot-ready artifact, computed without ever materializing per-row
    predictions per threshold.

    Scale shape: same Zipf-collapsed distinct-score sweep as
    :func:`binary_classifier_eval` — one aggregation exchange, one
    model-sized cumulative window."""
    base = scored.select(
        F.col(score_col).cast("bigint").alias("s"),
        F.col(label_col).cast("bigint").alias("y"),
    )
    g = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("cp")
    )
    w_desc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    o = g.select(
        F.col("s").alias("threshold"),
        F.sum("cp").over(w_desc).alias("tp"),
        (F.sum("c").over(w_desc) - F.sum("cp").over(w_desc)).alias("fp"),
    )
    tot = base.agg(
        F.coalesce(F.sum("y"), F.lit(0)).alias("n_pos"),
        (F.count(F.lit(1)) - F.coalesce(F.sum("y"), F.lit(0))).alias(
            "n_neg"
        ),
    )
    return o.crossJoin(F.broadcast(tot)).select(
        "threshold",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.when(F.col("n_pos") > 0, F.expr("(1000000 * tp) div n_pos"))
        .cast("bigint")
        .alias("tpr_ppm"),
        F.when(F.col("n_neg") > 0, F.expr("(1000000 * fp) div n_neg"))
        .cast("bigint")
        .alias("fpr_ppm"),
    )


def ks_statistic(
    a: DataFrame, b: DataFrame, value_col: str = "v"
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic over integer values —
    ``max |ECDF_a - ECDF_b|`` — as exact integer arithmetic: the ECDFs
    are compared cross-multiplied (``|cum_a * n_b - cum_b * n_a|``), so
    no rationals appear until the single final ppm division (done in
    decimal(38,0) — ``n_a * n_b`` exceeds the 1e6-scaled int64 headroom
    past ~3M rows per side).

    Two standing uses: the SEPARATION measure of a classifier (KS of
    the score distributions of positives vs negatives — the
    credit-scoring standard alongside AUC), and score-distribution
    DRIFT between corpus snapshots (the scalar twin of
    :func:`~.spectral.direction_drift`).

    One row: ``(n_a, n_b, ks_ppm, at_value)`` — ``at_value`` is the
    smallest value attaining the supremum (deterministic tie-break);
    ``ks_ppm`` NULL when either side is empty.

    Scale shape: one aggregation to the merged DISTINCT-value table
    (values are integer scores — model-sized; quantize first if
    continuous, the eval-battery contract), one cumulative window over
    it, one max. Never a per-row pass after the first aggregation.
    """
    ua = a.select(
        F.col(value_col).cast("bigint").alias("v"),
        F.lit(1).alias("_ca"),
        F.lit(0).alias("_cb"),
    )
    ub = b.select(
        F.col(value_col).cast("bigint").alias("v"),
        F.lit(0).alias("_ca"),
        F.lit(1).alias("_cb"),
    )
    g = (
        ua.unionAll(ub)
        .groupBy("v")
        .agg(F.sum("_ca").alias("ca"), F.sum("_cb").alias("cb"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = g.agg(
        F.coalesce(F.sum("ca"), F.lit(0)).alias("n_a"),
        F.coalesce(F.sum("cb"), F.lit(0)).alias("n_b"),
    )
    d = c.crossJoin(F.broadcast(tot)).select(
        "v",
        "n_a",
        "n_b",
        (F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
        .alias("_d"),
    )
    m = d.agg(F.max(F.abs(F.col("_d"))).alias("_ks_num"))
    at = (
        d.crossJoin(F.broadcast(m))
        .filter(F.abs(F.col("_d")) == F.col("_ks_num"))
        .agg(F.min("v").alias("at_value"))
    )
    return (
        tot.crossJoin(m)
        .crossJoin(at)
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.expr(
                    "cast((cast(1000000 as decimal(38,0)) * _ks_num)"
                    " div (cast(n_a as decimal(38,0)) * n_b) as bigint)"
                ),
            ).alias("ks_ppm"),
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("at_value")
            ).alias("at_value"),
        )
    )


def pr_points(
    scored: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "label",
) -> DataFrame:
    """Precision-recall curve as data: one point per DISTINCT score
    threshold (ties enter together) — ``(threshold, tp, fp,
    precision_ppm, recall_ppm)`` for the predict-positive-iff
    ``score >= threshold`` sweep. The tie-grouped sum ``sum(tp_delta *
    precision_ppm) div n_pos`` over these points IS the report's
    ``ap_ppm`` (the identity tests assert). Same model-sized
    distinct-score sweep as :func:`roc_points`."""
    base = scored.select(
        F.col(score_col).cast("bigint").alias("s"),
        F.col(label_col).cast("bigint").alias("y"),
    )
    g = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("cp")
    )
    w_desc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    o = g.select(
        F.col("s").alias("threshold"),
        F.sum("cp").over(w_desc).alias("tp"),
        F.sum("c").over(w_desc).alias("cum_n"),
    )
    tot = base.agg(F.coalesce(F.sum("y"), F.lit(0)).alias("n_pos"))
    return o.crossJoin(F.broadcast(tot)).select(
        "threshold",
        F.col("tp").cast("bigint").alias("tp"),
        (F.col("cum_n") - F.col("tp")).cast("bigint").alias("fp"),
        F.expr("(1000000 * tp) div cum_n")
        .cast("bigint")
        .alias("precision_ppm"),
        F.when(F.col("n_pos") > 0, F.expr("(1000000 * tp) div n_pos"))
        .cast("bigint")
        .alias("recall_ppm"),
    )


def isotonic_calibration_ppm(
    scored: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "label",
) -> DataFrame:
    """Isotonic (monotone) probability calibration of a ranking score —
    the non-parametric alternative to Platt scaling (Zadrozny & Elkan,
    KDD'02 "Transforming classifier scores into accurate multiclass
    probability estimates"; Robertson et al. 1988 for the PAV
    algorithm). Returns one row per DISTINCT score: ``(s, n, n_pos,
    iso_ppm)`` with ``iso_ppm`` the isotonic-regression fit of the
    positive rate, non-decreasing in ``s``.

    The fit runs as classic PAV (pool adjacent violators) over the
    distinct-score blocks in exact integer arithmetic — means compared
    by cross-multiplication, one ppm floor at the end. The registered
    DuckDB oracle computes the equivalent MINIMAX closed form
    (Robertson, Wright & Dykstra 1988, Thm 1.4.4):

        iso(i) = max_{j<=i} min_{k>=i} mean(y[j..k])

    so the cross-engine value check doubles as a PAV == minimax
    equivalence proof on real data. Exactness of the ppm boundary:
    floor is monotone non-decreasing, so ``min``/``max`` COMMUTE with
    it and the truncated result equals ``floor(1e6 * exact fit)`` —
    no float summation anywhere.

    Scale shape: the corpus collapses to the distinct-score table
    first (Zipf/domain-bounded — the same table every rank sweep here
    runs on); the sequential pooling then runs O(blocks) in ONE Arrow
    batch through ``applyInPandas`` (a single constant group — PAV
    needs the total order, and the block table is corpus-size-
    independent, the module's standing bounded-single-partition
    convention). This replaced a minimax pair-join form whose
    O(blocks^2) blowup was the one non-linear term in the eval family.
    """
    base = scored.select(
        F.col(score_col).cast("bigint").alias("s"),
        F.col(label_col).cast("bigint").alias("y"),
    )
    g = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("cp")
    )
    # classic pool-adjacent-violators on the model-sized block table,
    # exact integer arithmetic (cross-multiplied mean comparisons, one
    # floor at the end). O(blocks) — strictly better than the minimax
    # pair form (O(blocks^2)) this replaced; the DuckDB oracle still
    # computes the MINIMAX closed form, so every cross-engine check is
    # also a PAV==minimax equivalence proof (RWD 1988 Thm 1.4.4). All
    # blocks deliberately land in ONE Arrow batch (single constant
    # group): the sequential pooling needs the total order, and the
    # block table is Zipf/domain-bounded — corpus-size-independent.
    def _pav(pdf):
        import pandas as pd

        pdf = pdf.sort_values("s")
        stack: list[list] = []  # [count, pos, [member scores]]
        for s, c, cp in zip(pdf["s"], pdf["c"], pdf["cp"]):
            cur = [int(c), int(cp), [int(s)]]
            # pool while the previous block's mean STRICTLY exceeds
            # ours (cross-multiplied: exact on ints of any size)
            while stack and stack[-1][1] * cur[0] > cur[1] * stack[-1][0]:
                p = stack.pop()
                cur = [p[0] + cur[0], p[1] + cur[1], p[2] + cur[2]]
            stack.append(cur)
        rows = []
        for c, cp, ss in stack:
            ppm = (1_000_000 * cp) // c
            rows.extend((s, ppm) for s in ss)
        return pd.DataFrame(rows, columns=["s", "iso_ppm"])

    iso = (
        g.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(_pav, "s bigint, iso_ppm bigint")
    )
    return (
        g.join(F.broadcast(iso), "s")
        .select(
            "s",
            F.col("c").cast("bigint").alias("n"),
            F.col("cp").cast("bigint").alias("n_pos"),
            F.col("iso_ppm").cast("bigint").alias("iso_ppm"),
        )
    )


def split_conformal_coverage(
    cal: DataFrame,
    test: DataFrame,
    group_cols: list[str],
    score_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Split conformal prediction per group: calibrate the
    ``1 - alpha`` nonconformity threshold on ``cal`` and audit its
    empirical coverage on ``test`` (Vovk et al. 2005; Angelopoulos &
    Bates 2021, arXiv:2107.07511 §2 — the split/inductive form).

    The threshold is the ``k``-th smallest calibration score with
    ``k = ceil((n_cal + 1) * (1 - alpha))`` — the finite-sample
    correction that makes marginal coverage ``>= 1 - alpha`` a theorem
    rather than an asymptote. When ``k > n_cal`` (tiny groups) the
    threshold is the trivial ``+inf``, emitted as NULL with full
    coverage. ``alpha`` is the exact rational ``alpha_num/alpha_den``,
    so ``k`` is computed in integer arithmetic (ceil of positive
    operands as ``(a + b - 1) div b`` — NOT the negation trick, which
    breaks under ``div``'s truncate-toward-zero) and every output is
    exact: the threshold is a real
    calibration score, coverage is floor-ppm of integer counts.

    Returns ``(group..., n_cal, k, q_hat, n_test, n_covered,
    coverage_ppm)``.

    Scale shape: the order statistic runs as a per-group window on the
    CALIBRATION slice only (rank k of n_cal — at warehouse scale this
    would swap for the partial-agg selection the exact-percentile
    family uses); the test slice never sorts — it takes one broadcast
    join of the group-sized threshold table and one conditional-count
    agg.
    """
    num = alpha_den - alpha_num  # (1 - alpha) = num/den
    n = cal.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_cal"))
    k_expr = F.expr(
        f"cast(({num} * (n_cal + 1) + {alpha_den - 1})"
        f" div {alpha_den} as bigint)"
    )
    kth = n.select(*group_cols, "n_cal", k_expr.alias("k"))
    w = Window.partitionBy(*group_cols).orderBy(score_col)
    ranked = cal.select(*group_cols, score_col).withColumn(
        "_rn", F.row_number().over(w)
    )
    qh = (
        ranked.join(F.broadcast(kth), group_cols)
        .filter(F.col("_rn") == F.col("k"))
        .select(*group_cols, F.col(score_col).alias("q_hat"))
    )
    thr = kth.join(qh, group_cols, "left")  # k > n_cal -> q_hat NULL
    cov = (
        test.select(*group_cols, score_col)
        .join(F.broadcast(thr), group_cols)
        .groupBy(*group_cols, "n_cal", "k", "q_hat")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.col("q_hat").isNull()
                    | (F.col(score_col) <= F.col("q_hat")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return cov.select(
        *group_cols,
        "n_cal",
        "k",
        "q_hat",
        "n_test",
        "n_covered",
        F.expr("(1000000 * n_covered) div n_test").alias("coverage_ppm"),
    )

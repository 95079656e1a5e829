"""Per-group model/feature operators via ``applyInPandas`` (north-star §2b).

The reference has no per-group computation at all (its one derived metric is
row-wise, transform.py:96-101); these supply the grouped-map shape a training
-data pipeline needs — per-key normalization, per-key model fits — where the
kernel is genuinely imperative (numpy/pandas) rather than expressible as a
Column.

Scale shape: ``groupBy(key).applyInPandas`` is one shuffle on the key, then
Arrow-batched pandas per group on the executors — the Spark-native way to run
a python kernel per key without collecting anything to the driver. Keys must
be well-distributed (salt first if one key dominates); each group must fit in
one executor's memory, which holds for feature-normalization-sized groups.

Determinism note: kernels below only use min/max/count (exact on
integer-valued doubles) and single IEEE divisions, so results are
bit-identical to the SQL-window oracle; means/stddevs would NOT be (summation
order differs) — keep those out of oracle-compared outputs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def minmax_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "value_norm",
) -> DataFrame:
    """Per-group min-max normalization: (v - min) / (max - min), NULL when
    the group is constant. Grouped-map twin of the SQL window form."""
    keep = [c for c in df.columns]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf[value_col].min()
        hi = pdf[value_col].max()
        if hi == lo:
            pdf[out_col] = None
        else:
            pdf[out_col] = (pdf[value_col] - lo) / (hi - lo)
        return pdf[keep + [out_col]]

    return df.groupBy(*group_cols).applyInPandas(kernel, schema=schema)


def group_linear_fit(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS line fit (slope/intercept/n) — the 'one model per key'
    pattern (per-tenant trend, per-user drift). Numpy least squares inside
    each Arrow batch; output is one row per group.

    Not oracle-compared bit-exact (float summation order), so it ships with a
    property test instead: fitting an exactly-linear group recovers the line.
    """
    import numpy as np

    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}"
                  for f in df.select(*group_cols).schema.fields)
        + ", slope double, intercept double, n_points bigint"
    )

    def kernel(key, pdf):
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        n = len(x)
        if n >= 2 and np.ptp(x) > 0:
            slope, intercept = np.polyfit(x, y, 1)
        else:
            slope, intercept = float("nan"), float("nan")
        return pd.DataFrame(
            [tuple(key) + (float(slope), float(intercept), n)],
            columns=list(group_cols) + ["slope", "intercept", "n_points"],
        )

    return df.groupBy(*group_cols).applyInPandas(kernel, schema=out_schema)


def group_linear_fit_exact(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    y_scale: int = 1_000_000,
) -> DataFrame:
    """Per-group OLS line fit in EXACT integer arithmetic — the
    oracle-able (and more scalable) twin of :func:`group_linear_fit`.

    The closed-form fit only needs the five sufficient statistics
    ``(n, Σx, Σy, Σxy, Σx²)``, all perfectly partial-aggregable — so
    instead of a grouped-map pandas kernel this is ONE ``groupBy().agg``
    (map-side combine does most of the work; no Arrow transfer, no
    per-group pandas materialization: the 100 TB shape). Exactness comes
    from quantization + decimal accumulation:

    - ``x`` must already be integral (cast to decimal(38,0) for the
      accumulations); ``y`` quantizes to ``floor(y * y_scale)`` — the
      double multiply is correctly rounded IEEE and ``floor`` is
      engine-identical, so the integer inputs agree bit-for-bit in any
      engine (the module's differential-testing convention);
    - sums/centering run in decimal(38,0) (DuckDB mirror: HUGEINT), so
      nothing wraps: with ``|x| <= X``, ``|y·scale| <= Y``, ``n`` rows
      per group the worst intermediate is ``scale · n² · X² · Y <
      10^38`` — at the repo's testdata (X ~ 1e5, Y ~ 6e8, n <= 99,
      scale 1e6) that is ~1e31, seven decades of headroom; recenter x
      per group (slope is shift-invariant) before calling if your ids
      outgrow it;
    - outputs are truncating integer divisions (Spark ``div`` == DuckDB
      ``//``, both toward zero): ``slope_ppm = (10^6·num) div den`` and
      ``intercept_ppm = (10^6·(Σy·den − num·Σx)) div (n·den·y_scale/10^6)``
      — reported in ppm of the ORIGINAL y unit. Degenerate groups
      (``den = 0``: fewer than 2 distinct x) yield NULL fits, n_points
      still reported.

    Returns ``(group_cols..., n_points, slope_ppm, intercept_ppm)``.
    """
    from pyspark.sql import functions as F

    if not isinstance(y_scale, int) or y_scale < 1:
        raise ValueError(
            f"group_linear_fit_exact: y_scale must be a positive int,"
            f" got {y_scale!r}"
        )
    x = F.col(x_col).cast("decimal(38,0)")
    y = F.expr(
        f"cast(floor(cast({y_col} as double) * {int(y_scale)}) as decimal(38,0))"
    )
    e = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*group_cols, x.alias("_x"), y.alias("_y"))
    s = e.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    num = "(_n * _sxy - _sx * _sy)"
    den = "(_n * _sxx - _sx * _sx)"
    # intercept = (Σy − slope·Σx)/n with slope = num/den, all rational:
    # (Σy·den − num·Σx) / (n·den), then ppm of the original y unit
    # divides out the y_scale: multiply by 10^6/y_scale exactly
    i_num = f"(1000000 * (_sy * {den} - {num} * _sx))"
    i_den = f"(_n * {den} * {int(y_scale)})"
    return s.select(
        *group_cols,
        F.expr("cast(_n as bigint)").alias("n_points"),
        F.expr(
            f"case when {den} <> 0 then"
            f" cast((1000000 * {num}) div ({den} * {int(y_scale)})"
            " as bigint) end"
        ).alias("slope_ppm"),
        F.expr(
            f"case when {den} <> 0 then"
            f" cast({i_num} div {i_den} as bigint) end"
        ).alias("intercept_ppm"),
    )

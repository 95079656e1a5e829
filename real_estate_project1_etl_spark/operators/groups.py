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

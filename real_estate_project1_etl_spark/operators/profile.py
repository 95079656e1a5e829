"""Single-pass table profiling — the data-quality summary every ingest
pipeline runs before trusting a new drop (the reference eyeballs dtypes
by hand, transform.py:20-28; an engine does it as a query).

One aggregation computes every column's null count, exact distinct
count, and min/max in a single scan; the per-column rows are then
unpivoted from the one aggregate row with ``stack`` (a zero-shuffle
projection). min/max are rendered to strings with type-pinned
formatting (bigint/string verbatim, doubles through an exact
decimal(18,2) cast, timestamps through a fixed format) so the profile
is bit-identical cross-engine — never raw double stringification, whose
scientific-notation thresholds differ between runtimes.

Scale note: exact ``count(distinct)`` per column expands the aggregate
buffer per distinct column (Spark plans an Expand + two-stage agg);
at 100 TB swap ``exact=False`` in, which uses ``approx_count_distinct``
(HLL++, mergeable, one pass, ~2% error) — same output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: column kind -> (min/max rendering template)
_RENDER = {
    "int": "cast({agg} as string)",
    "string": "{agg}",
    "money": "cast(cast({agg} as decimal(18,2)) as string)",
    "ts": "date_format({agg}, 'yyyy-MM-dd HH:mm:ss')",
}


def profile_columns(
    df: DataFrame, spec: dict[str, str], exact: bool = True
) -> DataFrame:
    """Profile the columns named in ``spec`` (column -> kind, one of
    ``int | string | money | ts``). Returns one row per column:
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``.
    """
    aggs: list = [F.count(F.lit(1)).alias("_rows")]
    for c, kind in spec.items():
        tmpl = _RENDER[kind]
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}")
        )
        if exact:
            aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"_nd_{c}"))
        aggs.append(F.expr(tmpl.format(agg=f"min({c})")).alias(f"_mn_{c}"))
        aggs.append(F.expr(tmpl.format(agg=f"max({c})")).alias(f"_mx_{c}"))
    one = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in spec
    )
    return one.select(
        F.expr(
            f"stack({len(spec)}, {stack_args})"
            " as (column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("_rows").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")

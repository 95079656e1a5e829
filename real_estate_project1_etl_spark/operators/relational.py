"""Relational operators the reference implies but outsources (aggregation
happens only in its Looker dashboard, reference: README.md:127-132; its only
join-like op is the region IN-list whitelist, transform.py:92).

All are Spark builtins expressed declaratively so Catalyst picks the
physical strategy:
- small dims (region/nation, and any dim under the broadcast threshold) are
  hinted ``broadcast`` — no shuffle of the fact side;
- fact-fact joins (lineitem x orders) shuffle on the join key once, and AQE
  splits skewed partitions at runtime;
- aggregations are partial (map-side combine) + final by construction of
  ``groupBy``;
- top-k per group is a single window over one exchange; global top-k is
  ``orderBy(...).limit(k)`` which Spark executes as per-partition top-k +
  driver merge (TakeOrderedAndProject), no full sort at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dec2(col: str) -> "F.Column":
    """2-dp money/measure column as exact decimal. Source doubles originate
    from 2-dp values, so this cast is lossless; decimal sums are then exact
    and engine-order-independent — the property that makes results
    bit-reproducible across partitionings (and vs the DuckDB oracle).
    round(double) post-aggregation is NOT reproducible; never do that."""
    return F.col(col).cast("decimal(18,2)")


def revenue_expr():
    """Exact decimal revenue term: price * (1 - discount)."""
    return dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship aggregate. Same shape
    as the reference's implied dashboard query (avg price per group,
    README.md:127-132) but over the testdata fact table. All sums are exact
    decimal; doubles only at the output boundary."""
    cnt = F.count(F.lit(1))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(revenue_expr()).cast("double").alias("sum_disc_price"),
            (F.sum(dec2("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(dec2("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def star_join_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue per region through the full star: the two fact tables shuffle
    on their join keys; customer/nation/region broadcast (no shuffle)."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.sum(revenue_expr()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def top_k_per_group(
    df: DataFrame, group: list[str], order: list, k: int, select: list[str] | None = None
) -> DataFrame:
    """Top-k rows per group via row_number — one exchange on ``group``; at
    scale prefer this over sort+collect per group. ``order`` must be a total
    order (include a unique tiebreak) for deterministic output."""
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    if select:
        out = out.select(*select, "rk")
    return out


def global_top_k(df: DataFrame, order: list, k: int) -> DataFrame:
    """orderBy+limit — physical plan is TakeOrderedAndProject (per-partition
    heap + driver merge), never a full shuffle sort."""
    return df.orderBy(*order).limit(k)


def semi_join(fact: DataFrame, dim: DataFrame, on) -> DataFrame:
    """F5 generalized — broadcast left-semi (the join form of the
    reference's ``isin`` whitelist, transform.py:92)."""
    return fact.join(F.broadcast(dim), on, "left_semi")


def anti_join(fact: DataFrame, dim: DataFrame, on) -> DataFrame:
    return fact.join(F.broadcast(dim), on, "left_anti")

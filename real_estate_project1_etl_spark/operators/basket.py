"""Market-basket analysis — association rules over order line items.

The classic retail-OLAP workload (support / confidence / lift) the
reference's dashboard layer implies but a pandas ETL cannot compute at
scale. All probabilities are scaled-integer exact ratios:

    support(a,b)      = 1e6 * c_ab // n_orders
    confidence(a->b)  = 1e6 * c_ab // c_a
    lift(a,b)         = 1e6 * c_ab * n_orders // (c_a * c_b)

where counts are DISTINCT-order counts. Log-free and float-free, so the
output is bit-identical across engines and partitionings. Lift is
rank-equivalent to the textbook PMI-style formulation (log is monotone).

Scale shape: basket pairs come from a self-equi-join WITHIN each order —
per-key blowup is O(lines^2) with small, bounded basket sizes, never a
corpus cross join. Item counts are a Zipf-collapsed agg broadcast onto
the (pruned) pair table; the min-count prune happens before the joins so
the long tail never reaches them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    lineitem: DataFrame,
    min_pair_orders: int = 2,
) -> DataFrame:
    """Directed association rules (antecedent -> consequent) for part
    pairs co-occurring in at least ``min_pair_orders`` distinct orders.

    Returns ``(antecedent, consequent, c_pair, support_scaled,
    confidence_scaled, lift_scaled)`` — one row per direction of each
    qualifying pair.
    """
    baskets = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()

    item = baskets.groupBy("pk").agg(F.count(F.lit(1)).alias("c_item"))
    n_orders = baskets.select("ok").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )

    b2 = baskets.select("ok", F.col("pk").alias("pk2"))
    pairs = (
        baskets.join(b2, "ok")
        .filter(F.col("pk") < F.col("pk2"))
        .groupBy("pk", "pk2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .filter(F.col("c_pair") >= min_pair_orders)
    )

    # both rule directions from each undirected pair
    directed = pairs.select(
        F.col("pk").alias("antecedent"), F.col("pk2").alias("consequent"), "c_pair"
    ).unionAll(
        pairs.select(
            F.col("pk2").alias("antecedent"), F.col("pk").alias("consequent"), "c_pair"
        )
    )

    return (
        directed.join(
            F.broadcast(item.select(F.col("pk").alias("antecedent"), F.col("c_item").alias("c_ante"))),
            "antecedent",
        )
        .join(
            F.broadcast(item.select(F.col("pk").alias("consequent"), F.col("c_item").alias("c_cons"))),
            "consequent",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            "c_pair",
            F.expr("cast(1000000 * c_pair div n_orders as bigint)").alias(
                "support_scaled"
            ),
            F.expr("cast(1000000 * c_pair div c_ante as bigint)").alias(
                "confidence_scaled"
            ),
            F.expr(
                "cast(cast(1000000 as decimal(38,0)) * c_pair * n_orders"
                " div (cast(c_ante as decimal(38,0)) * c_cons) as bigint)"
            ).alias("lift_scaled"),
        )
    )

"""SQL surface: register the engine's tables as views so any query in
this repo — and any ad-hoc dashboard query the reference's Looker layer
would issue (reference: README.md:127-132) — can run as plain ``spark.sql``.

The DataFrame queries and the SQL surface share one Catalyst planner, so
there is no parity gap to maintain: a view is the same logical plan as the
``load_table`` DataFrame it wraps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.parquet import load_table

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Expose every testdata table as a temp view (nanos-ts handling and
    session conf come from load_table — never register raw paths)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register views and run one ANSI-SQL query against them."""
    register_tables(spark, sf_dir)
    return spark.sql(query)


def register_derived_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the engine's derived relations as views too, so dashboard
    SQL can build on OPERATOR OUTPUTS (not just raw tables) without
    leaving ``spark.sql``: tokenized documents, the co-purchase edge
    list, hourly event aggregates. Same logical plans as the DataFrame
    operators — one planner, no parity gap."""
    from ..operators.corpus import tokenize_positions
    from ..operators.graph import copurchase_edges

    register_tables(spark, sf_dir)
    tokenize_positions(
        load_table(spark, sf_dir, "documents")
    ).createOrReplaceTempView("doc_tokens")
    copurchase_edges(
        load_table(spark, sf_dir, "lineitem")
    ).createOrReplaceTempView("copurchase_edges")

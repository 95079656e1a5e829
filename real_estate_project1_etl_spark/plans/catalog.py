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

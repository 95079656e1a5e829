"""Differential fuzzing of the scalar string-function layer: random
compositions of the cleaning-chain primitives (the C1-C15 family's
building blocks) evaluated by BOTH engines on the documents table and
compared exactly.

The grammar is restricted to functions with IDENTICAL cross-engine
semantics on ASCII input (lower/upper/trim/substr/replace/reverse/
repeat/lpad/rpad/translate/md5/length/concat) — regex-dialect functions
(split, regexp_*) are deliberately excluded; those are covered by
fixed-oracle queries where the pattern is pinned per engine."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tools.driver_sim import canon

N_CASES = 30

#: (name, spark_template, sql_template) — {x} is the operand expression
_UNARY = [
    ("lower", "lower({x})", "lower({x})"),
    ("upper", "upper({x})", "upper({x})"),
    ("trim", "trim({x})", "trim({x})"),
    ("reverse", "reverse({x})", "reverse({x})"),
    ("md5", "md5({x})", "md5({x})"),
    ("sub7", "substring({x}, 3, 7)", "substr({x}, 3, 7)"),
    ("repl", "replace({x}, 'a', '_')", "replace({x}, 'a', '_')"),
    ("tran", "translate({x}, 'aeiou', '01234')", "translate({x}, 'aeiou', '01234')"),
    ("lpad", "lpad({x}, 12, '.')", "lpad({x}, 12, '.')"),
    ("rpad", "rpad({x}, 12, '.')", "rpad({x}, 12, '.')"),
    ("rep2", "repeat({x}, 2)", "repeat({x}, 2)"),
]


def _gen_expr(seed: int):
    rng = random.Random(seed)
    spark_e = sql_e = "substring(text, 1, 40)"
    sql_e = "substr(text, 1, 40)"
    for _ in range(rng.randint(1, 4)):
        _, st, qt = rng.choice(_UNARY)
        spark_e = st.format(x=spark_e)
        sql_e = qt.format(x=sql_e)
    final = rng.choice(["value", "length"])
    if final == "length":
        return f"length({spark_e})", f"length({sql_e})"
    return spark_e, sql_e


@pytest.fixture(scope="module")
def duck_docs(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from real_estate_project1_etl_spark.sources.parquet import load_table

    return load_table(spark, sf_dir, "documents")


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_scalar_text_matches_duckdb(seed, spark, duck_docs, docs, sf_dir):
    spark_e, sql_e = _gen_expr(seed)
    s = canon(
        docs.select("doc_id", F.expr(spark_e).alias("v")).toPandas()
    )
    o = canon(
        duck_docs.execute(f"SELECT doc_id, {sql_e} AS v FROM documents").df()
    )
    assert s == o, f"seed {seed}: {spark_e} vs {sql_e}"

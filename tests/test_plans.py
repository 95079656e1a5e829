"""Physical-plan audits — the 100 TB readiness checks (SURVEY.md §4).

These assert properties of the *plan*, not the result: dims broadcast,
predicates reach the parquet scan, projections prune columns, global top-k
avoids a full sort, and no row-at-a-time Python appears in hot paths.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = entry_mod.queries()["star_join_revenue"](spark, sf_dir)
    plan = _plan(df)
    # all three dims (customer/nation/region) arrive via broadcast; the
    # only shuffle join is lineitem x orders on the orderkey
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or plan.count("BroadcastHashJoin") >= 4


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = entry_mod.queries()["filter_threshold"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_extendedprice), GreaterThanOrEqual(l_extendedprice,500.0)" in plan, plan


def test_column_pruning(spark, sf_dir):
    df = entry_mod.queries()["filter_threshold"](spark, sf_dir)
    plan = _plan(df)
    # the scan must read exactly the 3 projected columns
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" in rs and "l_extendedprice" in rs
    assert "l_comment" not in rs and "l_shipdate" not in rs and "l_quantity" not in rs


def test_global_topk_avoids_full_sort(spark, sf_dir):
    df = entry_mod.queries()["global_top10_lineitems"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)


def test_no_python_udf_in_reference_chain(spark, sf_dir):
    # the whole cleaning chain must stay JVM-side (SURVEY §2 "UDF surface")
    for name in [
        "properties_pipeline",
        "pricing_summary",
        "region_derive",
        "digits_extract",
        "unidecode_translate",
        "token_counts",
        "langid_heuristic",
        "cosine_topk",
    ]:
        plan = _plan(entry_mod.queries()[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} fell back to Python UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF"


def test_semi_join_is_broadcast(spark, sf_dir):
    df = entry_mod.queries()["region_semi_join"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_whole_stage_codegen_covers_clean_chain(spark, sf_dir):
    # AQE wraps the plan and hides codegen annotation until runtime;
    # disable it to inspect the static physical plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = entry_mod.queries()["properties_pipeline"](spark, sf_dir)
        # codegen'd stages print as "*(n) Operator" in the physical plan
        assert "*(" in _plan(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q17_threshold_side_broadcasts(spark, sf_dir):
    # small_quantity_revenue: the per-part aggregate side must arrive via
    # broadcast so the fact side joins without a shuffle of lineitem rows
    df = entry_mod.queries()["small_quantity_revenue"](spark, sf_dir)
    assert "BroadcastHashJoin" in _plan(df)


def test_chunking_is_narrow_and_jvm_side(spark, sf_dir):
    # doc_chunks: pure flatMap — no shuffle (Exchange), no Python
    df = entry_mod.queries()["doc_chunks"](spark, sf_dir)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # posexplode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minmax_uses_grouped_map_arrow(spark, sf_dir):
    # applyInPandas compiles to FlatMapGroupsInPandas over ONE exchange
    df = entry_mod.queries()["minmax_norm_quantity"](spark, sf_dir)
    plan = _plan(df)
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1, plan


def test_cube_expands_grouping_sets_single_shuffle(spark, sf_dir):
    df = entry_mod.queries()["cube_counts"](spark, sf_dir)
    plan = _plan(df)
    assert "Expand" in plan
    assert plan.count("Exchange") == 1, plan


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    # a selective dim filter injects a bloom-filter semi-filter on the fact
    # scan side of a shuffle join — the runtime row-pruning that matters
    # when the dim is too big to broadcast at 100 TB
    from pyspark.sql import functions as F

    from real_estate_project1_etl_spark.sources.parquet import load_table

    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .count()
        )
        plan = _optimized(j)
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    df = entry_mod.queries()["order_priority_check"](spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan, plan
    # the date predicate reaches the orders parquet scan
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters")[1][:400], plan


def test_top_supplier_scalar_max_broadcasts(spark, sf_dir):
    df = entry_mod.queries()["top_supplier"](spark, sf_dir)
    plan = _plan(df)
    # the 1-row max and the supplier dim both arrive via broadcast — the
    # aggregated revenue side never reshuffles
    assert plan.count("BroadcastExchange") >= 2, plan


def test_argmin_window_single_exchange(spark, sf_dir):
    df = entry_mod.queries()["cheapest_supplier_per_part"](spark, sf_dir)
    plan = _plan(df)
    # window-min + groupBy share the l_partkey partitioning: exactly ONE
    # shuffle of the fact (plus AQE readers), never two
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, f"{n_exchange} exchanges:\n{plan}"


def test_token_chunks_narrow_jvm(spark, sf_dir):
    df = entry_mod.queries()["token_chunks"](spark, sf_dir)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_sql_over_derived_views_matches_operator(spark, sf_dir):
    from real_estate_project1_etl_spark.operators.corpus import bigram_pmi
    from real_estate_project1_etl_spark.plans.catalog import register_derived_views
    from real_estate_project1_etl_spark.sources.parquet import load_table

    register_derived_views(spark, sf_dir)
    # ad-hoc dashboard SQL over the token view == the operator's own agg
    got = {
        (r["w"], r["n"])
        for r in spark.sql(
            "SELECT w, count(*) AS n FROM doc_tokens GROUP BY w ORDER BY n DESC, w LIMIT 5"
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    from real_estate_project1_etl_spark.operators.corpus import tokenize_positions
    from pyspark.sql import functions as F

    exp = {
        (r["w"], r["n"])
        for r in tokenize_positions(docs)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(5)
        .collect()
    }
    assert got == exp
    # graph SQL over the edge view
    n_edges = spark.sql("SELECT count(*) AS n FROM copurchase_edges").first()["n"]
    assert n_edges > 0

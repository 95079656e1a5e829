"""Declarative data-quality constraint audit (the Deequ/dbt-tests shape).

The reference's only "validation" is typed DB columns and an Airflow
failure email (reference: load_db.py:35-46, dag.py:18); at 100 TB the
standard practice is a rule table evaluated in one pass over the data —
completeness, bounds, set membership, uniqueness, referential integrity —
producing one row per rule with a violation count, which feeds a gate
(fail the pipeline / quarantine the batch) without a human eyeballing
dashboards.

Scale shape: every row-local rule compiles into ONE conditional-sum
aggregate over a single scan (no per-rule passes); ``unique`` rules add
one groupBy on their key columns; ``foreign_key`` rules add one anti-join
with the (broadcastable) dimension's key projection. The output is
rules-sized — constant — regardless of input size.

Rule forms (dicts, declarative):
  {"rule": "<name>", "kind": "not_null",  "col": c}
  {"rule": "<name>", "kind": "in_range",  "col": c, "lo": x, "hi": y}
  {"rule": "<name>", "kind": "in_set",    "col": c, "values": [...]}
  {"rule": "<name>", "kind": "matches",   "col": c, "pattern": regex}
  {"rule": "<name>", "kind": "unique",    "cols": [c, ...]}
  {"rule": "<name>", "kind": "foreign_key", "col": c,
   "ref": <DataFrame>, "ref_col": rc}
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["audit_constraints", "k_anonymity_audit"]


def _violation_expr(rule: dict):
    kind, c = rule["kind"], rule.get("col")
    if kind == "not_null":
        return F.col(c).isNull()
    if kind == "in_range":
        # NULL passes a range rule (completeness is not_null's job)
        return F.col(c).isNotNull() & (
            (F.col(c) < rule["lo"]) | (F.col(c) > rule["hi"])
        )
    if kind == "in_set":
        return F.col(c).isNotNull() & ~F.col(c).isin(rule["values"])
    if kind == "matches":
        return F.col(c).isNotNull() & ~F.col(c).rlike(rule["pattern"])
    raise ValueError(f"unknown row-local rule kind: {kind}")


def audit_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns (rule, n_violations)
    with one row per rule (0 = rule holds).

    ``unique`` counts rows beyond the first per duplicated key;
    ``foreign_key`` counts rows whose value has no match in the
    reference (NULLs are not violations — SQL FK semantics).
    """
    row_rules = [
        r
        for r in rules
        if r["kind"] in ("not_null", "in_range", "in_set", "matches")
    ]
    parts: list[DataFrame] = []
    if row_rules:
        aggs = [
            F.sum(_violation_expr(r).cast("bigint")).alias(r["rule"])
            for r in row_rules
        ]
        wide = df.agg(*aggs)
        parts.append(
            wide.select(
                F.expr(
                    "stack({n}, {args})".format(
                        n=len(row_rules),
                        args=", ".join(
                            f"'{r['rule']}', {r['rule']}" for r in row_rules
                        ),
                    )
                ).alias("rule", "n_violations")
            )
        )
    for r in rules:
        if r["kind"] == "unique":
            dup = (
                df.groupBy(*r["cols"])
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(
                    F.coalesce(
                        F.sum(
                            F.when(F.col("_c") > 1, F.col("_c") - 1)
                        ),
                        F.lit(0),
                    )
                    .cast("bigint")
                    .alias("n_violations")
                )
                .select(F.lit(r["rule"]).alias("rule"), "n_violations")
            )
            parts.append(dup)
        elif r["kind"] == "foreign_key":
            ref = r["ref"].select(
                F.col(r["ref_col"]).alias("_refk")
            ).distinct()
            orphans = (
                df.filter(F.col(r["col"]).isNotNull())
                .join(
                    F.broadcast(ref),
                    df[r["col"]] == ref["_refk"],
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(r["rule"]).alias("rule"), "n_violations")
            )
            parts.append(orphans)
    return reduce(DataFrame.unionByName, parts)


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 3,
) -> DataFrame:
    """Privacy re-identification audit: k-anonymity and l-diversity per
    quasi-identifier equivalence class (Sweeney 2002; Machanavajjhala et
    al. 2007, "l-diversity: privacy beyond k-anonymity").

    The reference ships raw scraped records straight to a warehouse
    (reference: load_db.py:35-46) with no release-risk check; a corpus
    pipeline that publishes aggregates or shares slices needs the
    standard audit: every combination of quasi-identifiers (``qi_cols``)
    is an equivalence class; a class re-identifies its members when it
    is small (``class_n < k``) and leaks the sensitive attribute when
    it is homogeneous (``l_div < l``).

    Returns one row per class: ``qi_cols..., class_n, l_div,
    max_sensitive_share_ppm`` (the largest single sensitive value's
    share of the class, floor-ppm — the t-closeness-flavoured signal:
    1_000_000 means every member shares one sensitive value, so
    l-diversity is defeated in aggregate even when ``l_div`` is
    nominally met), plus ``violates_k`` / ``violates_l`` flags. NULL
    sensitive values form their own diversity bucket (a class whose
    sensitive attribute is entirely NULL is homogeneous, not diverse).

    Scale shape: two stacked aggregations —
    ``(qi..., sensitive) -> counts`` then ``(qi...) -> class stats`` —
    the second a near-free re-agg of the first's (already partial-
    aggregated) output on a prefix of its grouping key; no distinct
    pass, no window, no join. Output is class-count-sized.
    """
    cnt = df.groupBy(
        *qi_cols, F.col(sensitive_col).alias("_sv")
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    cls = cnt.groupBy(*qi_cols).agg(
        F.sum("_cnt").cast("bigint").alias("class_n"),
        F.count(F.lit(1)).cast("bigint").alias("l_div"),
        F.max("_cnt").cast("bigint").alias("_max_cnt"),
    )
    return cls.select(
        *qi_cols,
        "class_n",
        "l_div",
        F.expr("(1000000 * _max_cnt) div class_n").alias(
            "max_sensitive_share_ppm"
        ),
        (F.col("class_n") < k).alias("violates_k"),
        (F.col("l_div") < l).alias("violates_l"),
    )

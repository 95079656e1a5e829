"""Semi-structured columns via Spark 4's VARIANT type.

The reference parses no JSON at all (its event payloads would land in
Looker as raw strings); the engine already exposes ``get_json_object``
paths (``json_extract_events``). VARIANT is the modern lane for the same
job at 100 TB: ``parse_json`` decodes each JSON document ONCE into a
binary columnar encoding, after which any number of ``variant_get``
extractions are cheap field lookups instead of repeated string re-parses
— the right trade wherever a pipeline touches more than one field of the
same payload. All expressions here are JVM-side (``static_invoke`` /
``VariantGet`` inside whole-stage codegen — no Python, no UDF).

Public surface:

* :func:`to_variant` — lenient string->VARIANT (NULL on malformed rows,
  never a task failure; pair with :func:`invalid_json` to quarantine).
* :func:`extract_typed` — typed path extraction (``try_variant_get``:
  NULL on missing path or uncastable value).
* :func:`variant_schema_census` — corpus-wide inventory of the distinct
  inferred payload shapes (``schema_of_variant``), the discovery query
  run before declaring a schema over a landed JSON lake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_variant(col: Column | str) -> Column:
    """Parse a JSON string column into a VARIANT, NULL on malformed
    input (``try_parse_json``) — ingestion must never die on one bad
    payload; quarantine decisions belong to a downstream gate."""
    return F.try_parse_json(col)


def invalid_json(col: Column | str) -> Column:
    """True where the payload is non-NULL yet failed VARIANT parsing —
    the quarantine predicate matching :func:`to_variant`'s leniency."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & F.try_parse_json(c).isNull()


def extract_typed(variant_col: Column | str, path: str, dtype: str) -> Column:
    """Typed field extraction from a VARIANT: NULL on missing path or a
    value that cannot cast (``try_variant_get``) — the lenient-cast
    discipline the rest of the engine uses (functions/numeric.py)."""
    return F.try_variant_get(variant_col, path, dtype)


def variant_schema_census(
    df: DataFrame, json_col: str, top_k: int = 50
) -> DataFrame:
    """Inventory the distinct payload SHAPES in a JSON column:
    ``(schema, n_rows)`` for the ``top_k`` most frequent inferred
    variant schemas (malformed payloads count under schema
    ``'<invalid>'``, NULL payloads under ``'<null>'``).

    The discovery pass a lakehouse runs before declaring a read schema
    over landed JSON. Scale shape: per-row schema inference in the scan
    stage (JVM ``schema_of_variant``), one Zipf-collapsed count agg
    (payload shapes are few), TakeOrdered top-k — the payloads
    themselves never shuffle.
    """
    c = F.col(json_col)
    sch = F.when(c.isNull(), F.lit("<null>")).otherwise(
        F.coalesce(
            F.schema_of_variant(F.try_parse_json(c)), F.lit("<invalid>")
        )
    )
    return (
        df.select(sch.alias("schema"))
        .groupBy("schema")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), "schema")
        .limit(top_k)
    )

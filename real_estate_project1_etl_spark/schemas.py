"""Declared schemas.

The reference declares its raw schema positionally at DataFrame creation
(reference: extract.py:44) and its sink schema as a SQLAlchemy dtype map
(load_db.py:35-46) — with a latent bug: the dtype map keys ``price_for_m2``
while the real column is ``price_per_m2`` (load_db.py:42 vs transform.py:115),
so the int column silently loses its declared type. Fixed here: one
authoritative StructType per stage.

Testdata schemas mirror FIXTURES.md §B (verified against parquet footers).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- reference-derived stages (SURVEY.md §1.2) ------------------------------

#: bronze — scraped rows, all strings (reference: extract.py:44)
PROPERTIES_RAW = _st(
    ("purpose", StringType()),
    ("address", StringType()),
    ("size_m2", StringType()),
    ("design", StringType()),
    ("price_czk", StringType()),
    ("link", StringType()),
)

#: silver — cleaned/typed, exact column order of transform.py:115-116.
#: ``dump_date`` kept as a real timestamp internally (formatted only at the
#: sink boundary — the reference stores a pre-formatted string and the README
#: notes Looker must re-cast it, README.md:130).
PROPERTIES_CLEAN = _st(
    ("purpose", StringType()),
    ("address", StringType()),
    ("region", StringType()),
    ("size_m2", IntegerType()),
    ("design", StringType()),
    ("price_czk", IntegerType()),
    ("price_per_m2", IntegerType()),
    ("link", StringType()),
    ("dump_date", TimestampType()),
    ("file_name", StringType()),
)

#: the 14-region whitelist, transcribed verbatim from the reference
#: (transform.py:26-41), post-unidecode. Note the official inverted form
#: "Kraj Vysocina" — which is also what C10 (last-two-words) produces from a
#: real "..., Kraj Vysocina" address, so any other spelling would silently
#: drop every Vysocina listing. Pinned by tests/test_reference_fidelity.py.
CZECH_REGIONS = [
    "Praha",
    "Jihocesky kraj",
    "Jihomoravsky kraj",
    "Karlovarsky kraj",
    "Kralovehradecky kraj",
    "Liberecky kraj",
    "Moravskoslezsky kraj",
    "Olomoucky kraj",
    "Pardubicky kraj",
    "Plzensky kraj",
    "Stredocesky kraj",
    "Ustecky kraj",
    "Kraj Vysocina",
    "Zlinsky kraj",
]

# --- driver-provided testdata (FIXTURES.md §B) ------------------------------

REGION = _st(("r_regionkey", IntegerType()), ("r_name", StringType()))
NATION = _st(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)
CUSTOMER = _st(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)
SUPPLIER = _st(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)
PART = _st(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)
ORDERS = _st(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)
LINEITEM = _st(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)
EVENTS = _st(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)
DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)
EMBEDDINGS = _st(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

#: multimodal asset table (north-star §2b): opaque binary payload + typed
#: metadata. Decode/extract runs as Arrow-batched Pandas UDFs over this.
MEDIA_ASSETS = _st(
    ("asset_id", LongType()),
    ("modality", StringType()),  # image | audio | video
    ("payload", BinaryType()),
    ("mime_type", StringType()),
    ("width", IntegerType()),
    ("height", IntegerType()),
    ("duration_ms", LongType()),
)

TESTDATA_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

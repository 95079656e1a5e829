"""HTML source: offline page parser + distributed fetch plumbing."""

from __future__ import annotations

from real_estate_project1_etl_spark.operators.cleaning import scraped_rows_to_bronze
from real_estate_project1_etl_spark.sources.scrape import (
    parse_listing_page,
    scrape_to_dataframe,
)

PAGE_TMPL = """
<html><body>
<div class="property">
  <span class="purpose">Prodej bytu {i}+kk</span>
  <span class="address">Sokolovská, Praha {i}</span>
  <span class="param">4{i} m²</span>
  <span class="param">{i}+kk</span>
  <span class="price">5 {i}00 000 Kč</span>
  <a href="/nemovitost/{page}-{i}">detail</a>
</div>
<div class="property">
  <span class="purpose">Pronájem kanceláře</span>
  <span class="address">Brno, Jihomoravský kraj</span>
  <span class="param">2+1</span>
  <span class="price">900 Kč</span>
  <a href="/nemovitost/{page}-x{i}">detail</a>
</div>
</body></html>
"""


def fake_fetch(page: int) -> str:
    # NB: closures shipped to executors must pickle by value; this module
    # isn't importable from Spark workers, so tests pass a local lambda
    # wrapper around this where distribution is involved.
    return PAGE_TMPL.format(i=page % 9, page=page)


def test_parse_listing_page():
    rows = parse_listing_page(fake_fetch(3))
    assert len(rows) == 2
    purpose, address, size, design, price, link = rows[0]
    assert purpose == "Prodej bytu 3+kk"
    assert size == "43 m²"          # m² param -> size slot
    assert design == "3+kk"
    assert link == "/nemovitost/3-3"
    # second card has no m² param -> size None, design set
    assert rows[1][2] is None and rows[1][3] == "2+1"


def test_scrape_to_dataframe_distributed(spark):
    tmpl = PAGE_TMPL

    def local_fetch(page: int) -> str:
        return tmpl.format(i=page % 9, page=page)

    df = scrape_to_dataframe(spark, local_fetch, pages=6, fetch_partitions=3)
    assert df.count() == 12
    assert df.columns == ["purpose", "address", "size_m2", "design", "price_czk", "link"]
    bronze = scraped_rows_to_bronze(df)
    got = {r.link: r for r in bronze.collect()}
    # transliteration applied (extract.py:45): č -> c, ² -> 2
    assert got["/nemovitost/3-3"].price_czk == "5 300 000 Kc"
    assert got["/nemovitost/3-3"].size_m2 == "43 m2"

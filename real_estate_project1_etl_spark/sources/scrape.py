"""HTML listing-page source (S1/S2 — reference: extract.py:9-40).

The reference fetches 149 pages sequentially with a 2 s sleep (a >=298 s
serial floor, extract.py:60-64) and parses ad-cards with BeautifulSoup.
Here:

- parsing is a pure function on HTML text (regex-based card extractor —
  bs4 is optional and used when importable), so it runs *inside executors*;
- fetching is distributed: ``spark.range(1, pages+1)`` partitions the page
  space and each partition fetches its pages (rate-limit per executor).
  Network access is injected as a fetch callable so tests run offline.

The scraped batch enters the engine through ``scraped_rows_to_bronze``
(trim + transliteration, extract.py:24-35,44-45).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PROPERTIES_RAW

try:  # optional, not present in this container
    from bs4 import BeautifulSoup  # type: ignore

    _HAS_BS4 = True
except Exception:  # pragma: no cover
    _HAS_BS4 = False

#: card markup contract: <div class="property"> with child elements
#: carrying the classes below (mirrors the reference's DOM walk,
#: extract.py:17-40).
_CARD_SPLIT = '<div class="property"'
_FIELD_RES = {
    "purpose": re.compile(r'class="purpose"[^>]*>(.*?)<', re.S),
    "address": re.compile(r'class="address"[^>]*>(.*?)<', re.S),
    "price_czk": re.compile(r'class="price"[^>]*>(.*?)<', re.S),
    "link": re.compile(r'href="([^"]+)"'),
}
_PARAM_RE = re.compile(r'class="param"[^>]*>(.*?)<', re.S)


def parse_listing_page(html: str) -> list[list[str | None]]:
    """HTML -> [[purpose, address, size_m2, design, price_czk, link]].

    The size-vs-design disambiguation follows the reference: a param
    containing 'm²' (or post-transliteration 'm2') is the size, otherwise
    it's the design (extract.py:31-34).
    """
    rows: list[list[str | None]] = []
    for seg in html.split(_CARD_SPLIT)[1:]:
        card = seg.split("</div>")[0]
        fields: dict[str, str | None] = {
            k: (rx.search(card).group(1).strip() if rx.search(card) else None)
            for k, rx in _FIELD_RES.items()
        }
        size, design = None, None
        for p in _PARAM_RE.findall(card):
            p = p.strip()
            if "m²" in p or "m2" in p:
                size = p
            else:
                design = p
        rows.append(
            [
                fields["purpose"],
                fields["address"],
                size,
                design,
                fields["price_czk"],
                fields["link"],
            ]
        )
    return rows


def scrape_to_dataframe(
    spark: SparkSession,
    fetch_page: Callable[[int], str],
    pages: int,
    fetch_partitions: int | None = None,
) -> DataFrame:
    """Distributed scrape: partition the page range, fetch+parse per
    partition, assemble the bronze DataFrame. ``fetch_page`` must be
    serializable (a top-level function / closure over config, not a
    session object)."""

    def run(indices: Iterator) -> Iterator[list]:
        for row in indices:
            page = row.id if hasattr(row, "id") else row[0]
            yield from parse_listing_page(fetch_page(int(page)))

    n_parts = fetch_partitions or min(pages, 8)
    rdd = spark.range(1, pages + 1, numPartitions=n_parts).rdd.mapPartitions(
        lambda it: run(it)
    )
    return spark.createDataFrame(rdd, PROPERTIES_RAW)

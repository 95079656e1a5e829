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
import time
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


class RateLimiter:
    """Per-partition politeness throttle: at most one acquire per
    ``min_interval_s``, enforced by sleeping the shortfall.  Clock and
    sleep are injectable so tests prove the spacing with a fake clock
    instead of wall-time.  A plain min-interval gate (token bucket of
    capacity 1) — the reference's politeness is exactly this shape
    (``time.sleep(2)`` between page fetches, reference extract.py:64)."""

    def __init__(
        self,
        min_interval_s: float,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.min_interval_s = float(min_interval_s)
        self._clock = clock
        self._sleep = sleep
        self._next_ok = float("-inf")

    def acquire(self) -> None:
        if self.min_interval_s <= 0:
            return
        now = self._clock()
        if now < self._next_ok:
            self._sleep(self._next_ok - now)
            now = self._next_ok
        self._next_ok = now + self.min_interval_s


def fetch_with_retry(
    fetch: Callable[[int], str],
    page: int,
    max_retries: int = 3,
    backoff_s: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
    retryable: tuple[type[BaseException], ...] = (OSError, TimeoutError),
) -> str:
    """Call ``fetch(page)`` with exponential backoff: ``max_retries``
    re-attempts after the first failure, sleeping ``backoff_s * 2**i``
    before retry ``i``.  Re-raises the last error when exhausted — a page
    that stays down should fail the task (Spark's task retry then
    re-schedules the whole partition) rather than silently drop rows.

    Only ``retryable`` exception types are retried (default: the
    transient network family — OSError covers ConnectionError/socket
    errors; TimeoutError listed for pre-3.10 clarity).  Anything else
    (a bug in ``fetch``, a permanent 404-style ValueError) surfaces
    IMMEDIATELY instead of burning the full backoff schedule (~14 s at
    defaults) per page per task retry (ADVICE round 4)."""
    attempt = 0
    while True:
        try:
            return fetch(page)
        except retryable:
            if attempt >= max_retries:
                raise
            sleep(backoff_s * (2 ** attempt))
            attempt += 1


def scrape_to_dataframe(
    spark: SparkSession,
    fetch_page: Callable[[int], str],
    pages: int,
    fetch_partitions: int | None = None,
    min_interval_s: float = 2.0,
    max_retries: int = 3,
    backoff_s: float = 2.0,
    clock: Callable[[], float] = time.monotonic,
    sleep: Callable[[float], None] = time.sleep,
    retryable: tuple[type[BaseException], ...] = (OSError, TimeoutError),
) -> DataFrame:
    """Distributed scrape: partition the page range, fetch+parse per
    partition, assemble the bronze DataFrame. ``fetch_page`` must be
    serializable (a top-level function / closure over config, not a
    session object).

    Politeness (reference extract.py:64 sleeps 2 s between pages): each
    partition fetches at most one page per ``min_interval_s`` via a
    :class:`RateLimiter`, and failed fetches retry with exponential
    backoff (:func:`fetch_with_retry`).  The AGGREGATE rate against the
    source site is ``fetch_partitions / min_interval_s`` requests/sec —
    ``fetch_partitions`` is the knob: the default caps the whole cluster
    at 8 concurrent fetchers (4 req/s at the reference's 2 s interval)
    no matter how many executors exist; set ``fetch_partitions=1`` to
    reproduce the reference's strictly-serial 0.5 req/s.  ``clock`` and
    ``sleep`` are injectable for tests (must be serializable)."""

    def run(indices: Iterator) -> Iterator[list]:
        limiter = RateLimiter(min_interval_s, clock=clock, sleep=sleep)
        for row in indices:
            page = row.id if hasattr(row, "id") else row[0]
            limiter.acquire()
            html = fetch_with_retry(
                fetch_page, int(page),
                max_retries=max_retries, backoff_s=backoff_s, sleep=sleep,
                retryable=retryable,
            )
            yield from parse_listing_page(html)

    n_parts = fetch_partitions or min(pages, 8)
    rdd = spark.range(1, pages + 1, numPartitions=n_parts).rdd.mapPartitions(
        lambda it: run(it)
    )
    return spark.createDataFrame(rdd, PROPERTIES_RAW)

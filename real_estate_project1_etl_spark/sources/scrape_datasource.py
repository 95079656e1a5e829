"""Spark 4 Python DataSource for the listing scrape —
``spark.read.format("listing_scrape")`` (reference: extract.py:9-64,
re-expressed as a first-class source instead of a helper function).

The :func:`..scrape.scrape_to_dataframe` helper already distributes the
fetch; this wraps the same fetch/parse kernel in the DataSource V2
Python API so the scrape composes like any other source: it appears in
``spark.read.format(...)`` with options, schema discovery, and
partition planning owned by the engine — a user of the reference can
point their existing read-path tooling at it.

Options (all strings, per the DataSource API):

- ``pages``: how many listing pages to fetch (default 1)
- ``fetch_partitions``: concurrent fetch partitions; the AGGREGATE
  request rate is ``fetch_partitions / min_interval_s`` req/s no matter
  the cluster size (default min(pages, 8))
- ``min_interval_s``: per-partition politeness interval (default 2.0 —
  the reference's sleep, extract.py:64)
- ``max_retries`` / ``backoff_s``: transient-failure retry schedule
- ``fetcher``: dotted path ``package.module:callable`` resolved ON THE
  EXECUTOR to the page-fetch function ``(page:int)->str`` — options are
  strings, so injection is by name, the standard pattern for
  executor-side callables
- ``mode=synthetic``: deterministic offline page generator (reference-
  shaped ad cards, seeded by page number) — the demo/test path in this
  network-less container, and a load-shape generator anywhere

Partition planning mirrors the helper: the page range chunks into
``fetch_partitions`` slices, each slice fetches serially behind a
RateLimiter, so politeness survives Spark's task placement.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from real_estate_project1_etl_spark.schemas import PROPERTIES_RAW
from real_estate_project1_etl_spark.sources.scrape import (
    RateLimiter,
    fetch_with_retry,
    parse_listing_page,
)


def synthetic_listing_page(page: int, cards_per_page: int = 4) -> str:
    """Deterministic reference-shaped listing HTML for ``mode=synthetic``:
    every card carries the purpose/address/param/price/link classes the
    DOM extractor walks, with the m² size-vs-design ambiguity present
    (reference extract.py:31-34)."""
    cards = []
    for i in range(cards_per_page):
        k = page * 100 + i
        cards.append(
            '<div class="property">'
            f'<span class="purpose">{"Prodej" if k % 2 else "Pronájem"}</span>'
            f'<span class="address">Ulice {k}, Praha</span>'
            f'<span class="param">{40 + k % 60} m²</span>'
            f'<span class="param">{1 + k % 4}+kk</span>'
            f'<span class="price">{9000 + k * 13} Kč</span>'
            f'<a href="/ad/{k}">detail</a>'
            "</div>"
        )
    return "<html><body>" + "".join(cards) + "</body></html>"


def _resolve_fetcher(dotted: str) -> Callable[[int], str]:
    """``package.module:callable`` -> the callable, resolved executor-side."""
    import importlib

    if ":" not in dotted:
        raise ValueError(
            "listing_scrape: fetcher option must be 'package.module:callable'"
            f", got {dotted!r}"
        )
    mod_name, attr = dotted.split(":", 1)
    fn = getattr(importlib.import_module(mod_name), attr)
    if not callable(fn):
        raise ValueError(f"listing_scrape: {dotted!r} is not callable")
    return fn


class _PagesPartition(InputPartition):
    def __init__(self, pages: list[int]):
        self.pages = pages


class ScrapeDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.pages = int(options.get("pages", "1"))
        if self.pages <= 0:
            raise ValueError(
                f"listing_scrape: pages must be > 0, got {self.pages}"
            )
        self.n_parts = int(
            options.get("fetch_partitions", str(min(self.pages, 8)))
        )
        if self.n_parts <= 0:
            raise ValueError(
                "listing_scrape: fetch_partitions must be > 0, got "
                f"{self.n_parts}"
            )
        self.min_interval_s = float(options.get("min_interval_s", "2.0"))
        self.max_retries = int(options.get("max_retries", "3"))
        self.backoff_s = float(options.get("backoff_s", "2.0"))
        self.mode = options.get("mode", "fetcher")
        self.fetcher_path = options.get("fetcher")
        if self.mode not in ("fetcher", "synthetic"):
            raise ValueError(
                f"listing_scrape: unknown mode {self.mode!r} "
                "(expected 'fetcher' or 'synthetic')"
            )
        if self.mode == "fetcher" and not self.fetcher_path:
            raise ValueError(
                "listing_scrape: pass fetcher='package.module:callable' "
                "or mode='synthetic'"
            )

    def partitions(self) -> list[InputPartition]:
        # round-robin page slices: slice i fetches pages i, i+P, i+2P …
        # so early pages spread across partitions (all slices start
        # working immediately instead of slice 0 owning the head)
        n = min(self.n_parts, self.pages)
        return [
            _PagesPartition(list(range(1 + i, self.pages + 1, n)))
            for i in range(n)
        ]

    def read(self, partition: _PagesPartition) -> Iterator[tuple]:
        fetch = (
            synthetic_listing_page
            if self.mode == "synthetic"
            else _resolve_fetcher(self.fetcher_path)
        )
        limiter = RateLimiter(self.min_interval_s)
        for page in partition.pages:
            limiter.acquire()
            html = fetch_with_retry(
                fetch, page,
                max_retries=self.max_retries, backoff_s=self.backoff_s,
            )
            for row in parse_listing_page(html):
                yield tuple(row)


class ScrapeDataSource(DataSource):
    """``spark.dataSource.register(ScrapeDataSource)`` then
    ``spark.read.format("listing_scrape").option(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "listing_scrape"

    def schema(self):
        return PROPERTIES_RAW

    def reader(self, schema) -> ScrapeDataSourceReader:
        return ScrapeDataSourceReader(self.options)

    def simpleStreamReader(self, schema) -> "ScrapeSimpleStreamReader":
        return ScrapeSimpleStreamReader(self.options)


class ScrapeSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the listing scrape: ``spark.readStream.format(
    "listing_scrape")`` — a page-frontier source.  The offset is the
    highest page fetched so far (``{"page": N}``); each micro-batch
    fetches the pages that appeared since, so a crawl keeps up with a
    growing listing site instead of re-snapshotting it.

    Page availability comes from ``pages`` (static count — the batch
    case degenerates to one micro-batch) or ``pages_file`` (a path whose
    integer content is the CURRENT page count — the growing-site test
    hook and the real-deployment pattern: a frontier sidecar publishes
    how far the site extends).  Per the SimpleDataSourceStreamReader
    contract this reader prefetches ON THE DRIVER — right for a
    politeness-limited frontier (a few pages per trigger; the rate limit
    serializes fetches anyway); a high-volume backfill should use the
    BATCH reader, whose partitions fetch on executors.  Replay (``readBetweenOffsets``) re-fetches
    the exact page range, which is exactly-once for the deterministic
    synthetic mode and at-least-once-per-page for a live site (same
    contract as any re-fetchable source).
    """

    def __init__(self, options: dict):
        self.mode = options.get("mode", "fetcher")
        self.fetcher_path = options.get("fetcher")
        self.pages_file = options.get("pages_file")
        self.static_pages = int(options.get("pages", "0"))
        self.min_interval_s = float(options.get("min_interval_s", "2.0"))
        self.max_retries = int(options.get("max_retries", "3"))
        self.backoff_s = float(options.get("backoff_s", "2.0"))
        if self.mode not in ("fetcher", "synthetic"):
            raise ValueError(
                f"listing_scrape: unknown mode {self.mode!r} "
                "(expected 'fetcher' or 'synthetic')"
            )
        if self.mode == "fetcher" and not self.fetcher_path:
            raise ValueError(
                "listing_scrape: pass fetcher='package.module:callable' "
                "or mode='synthetic'"
            )
        if not self.pages_file and self.static_pages <= 0:
            raise ValueError(
                "listing_scrape streaming: pass pages=<N> or "
                "pages_file=<path holding the current page count>"
            )

    def _available(self) -> int:
        if self.pages_file:
            try:
                with open(self.pages_file) as f:
                    return int(f.read().strip() or "0")
            except FileNotFoundError:
                return 0
        return self.static_pages

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _fetch_range(self, lo: int, hi: int):
        fetch = (
            synthetic_listing_page
            if self.mode == "synthetic"
            else _resolve_fetcher(self.fetcher_path)
        )
        limiter = RateLimiter(self.min_interval_s)
        for page in range(lo + 1, hi + 1):
            limiter.acquire()
            html = fetch_with_retry(
                fetch, page,
                max_retries=self.max_retries, backoff_s=self.backoff_s,
            )
            for row in parse_listing_page(html):
                yield tuple(row)

    def read(self, start: dict):
        lo = int(start.get("page", 0))
        hi = max(lo, self._available())
        # materialized, not a generator: the simple-reader harness caches
        # the prefetched rows by PICKLING them (generators can't pickle);
        # a micro-batch is only the frontier delta, so the list is small
        return list(self._fetch_range(lo, hi)), {"page": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(
            self._fetch_range(
                int(start.get("page", 0)), int(end.get("page", 0))
            )
        )

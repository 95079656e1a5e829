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

    df = scrape_to_dataframe(
        spark, local_fetch, pages=6, fetch_partitions=3, min_interval_s=0.0
    )
    assert df.count() == 12
    assert df.columns == ["purpose", "address", "size_m2", "design", "price_czk", "link"]
    bronze = scraped_rows_to_bronze(df)
    got = {r.link: r for r in bronze.collect()}
    # transliteration applied (extract.py:45): č -> c, ² -> 2
    assert got["/nemovitost/3-3"].price_czk == "5 300 000 Kc"
    assert got["/nemovitost/3-3"].size_m2 == "43 m2"


class FakeClock:
    """Deterministic clock: time advances ONLY via sleep()."""

    def __init__(self) -> None:
        self.now = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.now

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.now += s


def test_rate_limiter_spacing_fake_clock():
    # reference politeness: >= 2 s between page fetches (extract.py:64).
    # With a fake clock the limiter must space 5 acquires 2 s apart —
    # zero sleep for the first, exactly the shortfall for the rest.
    from real_estate_project1_etl_spark.sources.scrape import RateLimiter

    fc = FakeClock()
    rl = RateLimiter(2.0, clock=fc.clock, sleep=fc.sleep)
    times = []
    for _ in range(5):
        rl.acquire()
        times.append(fc.now)
    for a, b in zip(times, times[1:]):
        assert b - a >= 2.0, times
    assert fc.sleeps == [2.0, 2.0, 2.0, 2.0]  # first acquire is free

    # work BETWEEN acquires counts against the interval: 1.5 s of parsing
    # means only 0.5 s of sleep is owed
    fc2 = FakeClock()
    rl2 = RateLimiter(2.0, clock=fc2.clock, sleep=fc2.sleep)
    rl2.acquire()
    fc2.now += 1.5
    rl2.acquire()
    assert fc2.sleeps == [0.5]


def test_fetch_with_retry_backoff_and_exhaustion():
    from real_estate_project1_etl_spark.sources.scrape import fetch_with_retry

    calls = []
    fails = {"n": 2}

    def flaky(page: int) -> str:
        calls.append(page)
        if fails["n"] > 0:
            fails["n"] -= 1
            raise ConnectionError("boom")
        return f"<html>{page}</html>"

    fc = FakeClock()
    out = fetch_with_retry(flaky, 7, max_retries=3, backoff_s=1.0, sleep=fc.sleep)
    assert out == "<html>7</html>"
    assert calls == [7, 7, 7]          # 2 failures + 1 success
    assert fc.sleeps == [1.0, 2.0]     # exponential backoff

    def dead(page: int) -> str:
        raise ConnectionError("down")

    fc2 = FakeClock()
    try:
        fetch_with_retry(dead, 1, max_retries=2, backoff_s=1.0, sleep=fc2.sleep)
        raise AssertionError("expected ConnectionError")
    except ConnectionError:
        pass
    assert fc2.sleeps == [1.0, 2.0]    # retried exactly max_retries times


def test_scrape_throttle_spacing_per_partition(spark, tmp_path):
    # integration: executors really space fetches >= min_interval_s apart
    # WITHIN each partition (partitions are concurrent by design — the
    # aggregate-rate knob is fetch_partitions, see scrape_to_dataframe).
    # Fetch timestamps are recorded to a shared dir because executor
    # workers are separate processes.
    import time as _t

    tmpl = PAGE_TMPL
    rec = str(tmp_path)
    interval = 0.2

    def recording_fetch(page: int) -> str:
        with open(f"{rec}/{page}.ts", "w") as fh:
            fh.write(repr(_t.monotonic()))
        return tmpl.format(i=page % 9, page=page)

    df = scrape_to_dataframe(
        spark, recording_fetch, pages=6, fetch_partitions=2,
        min_interval_s=interval,
    )
    assert df.count() == 12
    stamps = {
        int(p.stem): float(p.read_text()) for p in tmp_path.glob("*.ts")
    }
    # spark.range(1, 7, numPartitions=2) splits contiguously: {1,2,3}, {4,5,6}
    for part in ([1, 2, 3], [4, 5, 6]):
        ts = sorted(stamps[p] for p in part)
        for a, b in zip(ts, ts[1:]):
            assert b - a >= interval * 0.9, (part, ts)


def test_fetch_with_retry_surfaces_nonretryable_immediately():
    # ADVICE round 4: a permanent error (bug / 404-as-ValueError) must not
    # burn the backoff schedule before surfacing
    from real_estate_project1_etl_spark.sources.scrape import fetch_with_retry

    calls = []

    def broken(page: int) -> str:
        calls.append(page)
        raise ValueError("permanent")

    fc = FakeClock()
    try:
        fetch_with_retry(broken, 3, max_retries=3, backoff_s=1.0, sleep=fc.sleep)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert calls == [3]      # exactly one attempt
    assert fc.sleeps == []   # no backoff burned

    # caller-widened retryable tuple still retries the custom type
    fails = {"n": 1}

    def flaky_value(page: int) -> str:
        if fails["n"] > 0:
            fails["n"] -= 1
            raise ValueError("transient-in-this-api")
        return "ok"

    fc2 = FakeClock()
    out = fetch_with_retry(
        flaky_value, 1, max_retries=2, backoff_s=1.0, sleep=fc2.sleep,
        retryable=(ValueError,),
    )
    assert out == "ok"
    assert fc2.sleeps == [1.0]


# ---------------------------------------------------------------------------
# Python DataSource API surface (sources/scrape_datasource.py)
# ---------------------------------------------------------------------------


def _register(spark):
    from real_estate_project1_etl_spark.sources.scrape_datasource import (
        ScrapeDataSource,
    )

    spark.dataSource.register(ScrapeDataSource)


def test_listing_scrape_format_synthetic_end_to_end(spark):
    from real_estate_project1_etl_spark.schemas import PROPERTIES_RAW
    from real_estate_project1_etl_spark.sources.scrape_datasource import (
        parse_listing_page,
        synthetic_listing_page,
    )

    _register(spark)
    df = (
        spark.read.format("listing_scrape")
        .option("pages", "6")
        .option("fetch_partitions", "3")
        .option("mode", "synthetic")
        .option("min_interval_s", "0")
        .load()
    )
    assert df.schema == PROPERTIES_RAW
    got = {tuple(r) for r in df.collect()}
    want = {
        tuple(row)
        for p in range(1, 7)
        for row in parse_listing_page(synthetic_listing_page(p))
    }
    # every page fetched exactly once across the round-robin partitions
    assert got == want and len(got) == 24


def test_listing_scrape_format_dotted_path_fetcher(spark):
    # fetcher injection is by dotted path (options are strings); resolve
    # the synthetic generator through the real machinery
    _register(spark)
    df = (
        spark.read.format("listing_scrape")
        .option("pages", "2")
        .option(
            "fetcher",
            "real_estate_project1_etl_spark.sources."
            "scrape_datasource:synthetic_listing_page",
        )
        .option("min_interval_s", "0")
        .load()
    )
    assert df.count() == 8


def test_listing_scrape_option_validation(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    _register(spark)

    def load(**opts):
        r = spark.read.format("listing_scrape")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load().collect()

    for bad in (
        dict(pages="0", mode="synthetic"),
        dict(pages="3", mode="nonsense"),
        dict(pages="3"),  # fetcher mode without a fetcher
        dict(pages="3", fetch_partitions="0", mode="synthetic"),
    ):
        with pytest.raises((Py4JJavaError, PythonException, Exception)):
            load(**bad)
    # bad dotted path surfaces executor-side
    with pytest.raises(Exception, match="module:callable|not callable|No module"):
        load(pages="1", fetcher="nodots", min_interval_s="0")


def test_listing_scrape_streaming_page_frontier(spark, tmp_path):
    # streaming form: the offset is the highest fetched page; a growing
    # pages_file (the frontier) yields only the NEW pages each run, and
    # restart resumes from the checkpointed offset — no page re-fetched
    _register(spark)
    frontier = tmp_path / "frontier.txt"
    out = str(tmp_path / "scrape_out")
    ck = str(tmp_path / "scrape_ck")

    def run_once():
        q = (
            spark.readStream.format("listing_scrape")
            .option("mode", "synthetic")
            .option("pages_file", str(frontier))
            .option("min_interval_s", "0")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    frontier.write_text("3")
    run_once()
    first = spark.read.parquet(out).collect()
    assert len(first) == 12  # pages 1-3, 4 cards each

    frontier.write_text("5")  # the site grew by two pages
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 20
    links = [r.link for r in rows]
    assert len(links) == len(set(links))  # no page fetched twice
    want = {f"/ad/{p * 100 + i}" for p in range(1, 6) for i in range(4)}
    assert set(links) == want

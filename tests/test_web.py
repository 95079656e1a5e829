"""URL canonicalization (functions/web.py): component rules, tracking-param
filtering, default ports, registrable domains."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_project1_etl_spark.functions.web import (
    canonicalize_url,
    registrable_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r.c for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()]


def test_canonicalize_url_rules(spark):
    cases = {
        # case + default port + dup slash + trailing slash + utm + fragment
        "https://WWW.X.com:443/a//b/?utm_source=1&id=2#top": "https://www.x.com/a/b?id=2",
        # http default port
        "http://x.COM:80/p": "http://x.com/p",
        # NON-default port preserved
        "https://x.com:8443/p": "https://x.com:8443/p",
        # param sort collapses reordered spellings
        "https://x.com/p?b=2&a=1": "https://x.com/p?a=1&b=2",
        "https://x.com/p?a=1&b=2": "https://x.com/p?a=1&b=2",
        # all params tracking -> no '?'
        "https://x.com/p?utm_a=1&gclid=z": "https://x.com/p",
        # root with and without slash collapse to the same key
        "https://x.com/": "https://x.com",
        "https://x.com": "https://x.com",
        # path is case-SENSITIVE (only scheme/host fold)
        "https://x.com/CaseSensitive": "https://x.com/CaseSensitive",
        # fragment-only tail
        "https://x.com/p#frag": "https://x.com/p",
    }
    got = _canon(spark, list(cases))
    for (u, want), g in zip(cases.items(), got):
        assert g == want, f"{u!r}: {g!r} != {want!r}"


def test_reordered_and_tracked_spellings_same_key(spark):
    spellings = [
        "https://Site.example.com/page?x=1&y=2",
        "https://site.example.COM:443/page?y=2&x=1&utm_campaign=c",
        "https://site.example.com/page/?x=1&y=2#sec",
        "https://site.example.com//page?fbclid=abc&y=2&x=1",
    ]
    assert len(set(_canon(spark, spellings))) == 1


def test_registrable_domain(spark):
    cases = {
        "www.example.com": "example.com",
        "a.b.c.example.org": "example.org",
        "news.bbc.co.uk": "bbc.co.uk",      # multi-part suffix -> 3 labels
        "foo.github.io": "foo.github.io",
        "shop.example.com.au": "example.com.au",
        "localhost": "",                     # no dot -> no registrable domain
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = [r.d for r in df.select(registrable_domain(F.col("h")).alias("d")).collect()]
    for (h, want), g in zip(cases.items(), got):
        assert g == want, f"{h!r}: {g!r} != {want!r}"


def test_schemeless_urls_pass_through_unchanged(spark):
    # ADVICE round 2: without the scheme guard, '/x?id=1' and '/y?id=1'
    # both canonicalized to '://?id=1' — unrelated documents merged into
    # one dedup cluster. Scheme-less inputs must keep distinct keys.
    from real_estate_project1_etl_spark.functions.web import canonicalize_url

    raw = ["/x?id=1", "/y?id=1", "www.a.com/x", "www.b.com/x", "", "not a url"]
    df = spark.createDataFrame([(u,) for u in raw], "u string")
    got = [r.c for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    assert got == raw  # identity on unparseable inputs
    assert len(set(got)) == len(raw)

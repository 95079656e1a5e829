"""Web/URL column functions — canonicalization for crawl-corpus dedup.

A web-scale training corpus keys documents by URL; the same page arrives
under dozens of spellings (case, default ports, tracking params, fragments,
duplicate/trailing slashes). Canonicalizing BEFORE the dedup exchange turns
those into one group key, which is both a correctness fix (near-dup mining
shouldn't burn candidates on self-pairs) and a scale lever (group keys are
short strings, canonical form maximizes collapse per shuffle byte).

Everything here is a pure native expression tree (regexp + higher-order
functions — no UDF, RE2-safe patterns with no lookarounds) so the exact
construction is mirrorable in DuckDB for the oracle gate
(`url_canonical_dedup` in __spark_entry__.py).

Extends the reference's single-site fetch (reference: extract.py:17-24,
one hard-coded listing URL) to corpus-scale URL handling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking params dropped during canonicalization (prefix-match utm_*)
_TRACKING_RX = r"^(utm_|fbclid|gclid)"

# multi-part public suffixes recognized by registrable_domain — a small
# embedded sample of the Public Suffix List (the full PSL would ship as a
# broadcast lookup table at production scale; the LOGIC is identical)
_MULTI_SUFFIXES = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "com.au",
    "co.jp",
    "com.br",
    "co.nz",
    "github.io",
)


def _c(url: Column | str) -> Column:
    return F.col(url) if isinstance(url, str) else url


def url_scheme(url: Column | str) -> Column:
    """Lower-cased scheme (``https``), '' if the URL has none."""
    return F.lower(F.regexp_extract(_c(url), r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))


def url_hostport(url: Column | str) -> Column:
    """Lower-cased ``host[:port]`` as spelled (ports stripped by
    :func:`canonicalize_url`, which knows the scheme's default)."""
    return F.lower(
        F.regexp_extract(_c(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    )


def url_path(url: Column | str) -> Column:
    """Raw path component ('' if absent)."""
    return F.regexp_extract(
        _c(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )


def url_query(url: Column | str) -> Column:
    """Raw query string without the '?' ('' if absent)."""
    return F.regexp_extract(_c(url), r"\?([^#]*)", 1)


def strip_tracking_params(query: Column | str) -> Column:
    """Drop tracking params (utm_*, fbclid, gclid) and SORT the rest — param
    order is not semantic, and a sorted canonical query collapses reordered
    spellings of the same page into one dedup key."""
    q = _c(query)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda kv: (kv != "") & ~kv.rlike(_TRACKING_RX),
        )
    )
    return F.array_join(kept, "&")


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL: lower-cased scheme+host, default port stripped
    (``:80`` http / ``:443`` https), duplicate slashes collapsed and
    trailing slash dropped from the path, tracking params removed and the
    rest sorted, fragment dropped.  ``https://WWW.X.com:443/a//b/?utm_s=1&
    id=2#top`` -> ``https://www.x.com/a/b?id=2``.

    Inputs without a ``scheme://`` prefix (relative paths, bare hostnames,
    garbage) pass through UNCHANGED: the component regexes all anchor on the
    scheme, so without this guard every such input would collapse to a
    degenerate shared key like ``://?id=2`` — merging unrelated documents
    into one dedup cluster (silent document loss on real crawl data)."""
    u = _c(url)
    scheme = url_scheme(u)
    hostport = url_hostport(u)
    host = F.when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).otherwise(hostport)
    path = F.regexp_replace(
        F.regexp_replace(url_path(u), r"/{2,}", "/"), r"/+$", ""
    )
    query = strip_tracking_params(url_query(u))
    return F.when(scheme == "", u).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
        )
    )


def registrable_domain(host: Column | str) -> Column:
    """eTLD+1 ('registrable domain'): the unit crawl pipelines cap, rate and
    aggregate by.  Last two labels, or three when the suffix is multi-part
    (co.uk and friends from the embedded PSL sample)."""
    h = F.lower(_c(host))
    multi = "|".join(s.replace(".", r"\.") for s in _MULTI_SUFFIXES)
    three = F.regexp_extract(h, rf"([^.]+\.(?:{multi}))$", 1)
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return F.when(three != "", three).otherwise(two)

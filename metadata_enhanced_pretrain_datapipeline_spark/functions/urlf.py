"""URL feature extraction (reference metadata builders,
examples/metadata_conditioning/tokenize_with_metadata.py:145-184; robots
domain lookup, robots_filter.py:44-58).

Implemented as regexes shared verbatim with the DuckDB oracle rather than
Spark's ``parse_url`` so differential tests are possible; the regexes use
the RE2-compatible subset (no lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOST_REGEX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"  # scheme is case-insensitive
PATH_REGEX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
SUFFIX_REGEX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$"


def url_host(url: Column) -> Column:
    """Domain/netloc (urlparse(...).netloc, tokenize_with_metadata.py:145-152)."""
    return F.regexp_extract(url, HOST_REGEX, 1)


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, PATH_REGEX, 1)


def url_suffix(url: Column) -> Column:
    """path+query+fragment (tokenize_with_metadata.py:155-163)."""
    return F.regexp_extract(url, SUFFIX_REGEX, 1)


#: tracking params dropped by canonicalization (the CommonCrawl-pipeline
#: convention: utm_* plus the common click ids)
_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup (the CommonCrawl/WARC pipeline
    normalization): lowercase scheme and host, strip a leading ``www.``,
    drop default ports (:80/:443), drop the fragment, strip trailing
    slashes from the path, and remove tracking query params (utm_*,
    fbclid, gclid). Two URLs that differ only in these never count as
    distinct pages.

    Pure regex + array arithmetic in the RE2-compatible subset (module
    docstring), shared verbatim with the DuckDB oracle — no parse_url,
    whose engine-specific edge cases would break differential testing.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, HOST_REGEX, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    # default ports are SCHEME-specific: http-on-443 / https-on-80 are
    # different origins than the portless form and must stay distinct
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    tail = F.regexp_replace(F.regexp_extract(url, SUFFIX_REGEX, 1), r"#.*$", "")
    path = F.regexp_replace(F.regexp_extract(tail, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(tail, r"\?(.*)$", 1)

    # parameter is tracking iff its name starts with a tracking prefix;
    # expressed as prefix tests (substring compare — literal semantics in
    # both engines, no regex alternation needed)
    def not_tracking(p: Column) -> Column:
        cond = p != ""
        for t in _TRACKING_PREFIXES:
            cond = cond & (F.substring(p, 1, len(t)) != F.lit(t))
        return cond

    kept = F.filter(F.split(query, "&"), not_tracking)
    params = F.array_join(kept, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )
    # a URL the scheme/host regexes can't parse (relative, schemeless,
    # garbage) must keep ITS OWN key — collapsing every malformed URL to
    # the literal '://' would dedup unrelated documents into one survivor
    return F.when((scheme != "") & (host != ""), canon).otherwise(url)

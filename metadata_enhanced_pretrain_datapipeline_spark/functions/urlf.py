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

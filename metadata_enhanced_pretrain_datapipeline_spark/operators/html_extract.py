"""HTML → text extraction (engine extension).

The step between the crawl source (sources/readers.read_warc — response
bodies are HTML bytes) and every text operator in this engine: the
reference's framework runs trafilatura here (datatrove's Trafilatura
extractor); that library is not in this container, so the module ships a
REAL stdlib baseline (html.parser — tolerant of malformed markup, the
same tag/entity semantics browsers degrade to) plus the standard
per-executor plug-in slot for a production extractor
(docs/model_plugins.md pattern). The baseline's rules are deterministic
and documented, so the whole operator is oracle-checkable:

- ``script``/``style``/``head``/``noscript``/``template``/``svg``
  subtrees contribute nothing;
- block-level boundaries (p, div, h1-h6, li, tr, br, section, article,
  blockquote, pre, td interpreted as cell break) emit newlines;
- character/entity references decode (convert_charrefs);
- whitespace collapses within a line; blank lines drop.

Scale shape: a scalar Arrow ``pandas_udf`` — one Python hop per batch,
no shuffle, composes with the ordinary projection pipeline; at 100 TB
this runs in the same file-granular pass as the WARC parse.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd  # module-level: the UDF's type hints must resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: subtrees whose text is never content
_SKIP_TAGS = frozenset(
    {"script", "style", "head", "noscript", "template", "svg"})

#: tags that terminate a text line when they open OR close
_BLOCK_TAGS = frozenset(
    {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr", "br",
     "section", "article", "blockquote", "pre", "table", "ul", "ol",
     "td", "th"})

_WS = re.compile(r"\s+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_data(self, data):
        if not self._skip_depth and data:
            self._parts.append(data)

    def text(self) -> str:
        lines = "".join(self._parts).split("\n")
        cleaned = [_WS.sub(" ", ln).strip() for ln in lines]
        return "\n".join(ln for ln in cleaned if ln)


def html_to_text(html: str) -> str:
    """Extract visible text from one HTML string (the driver-side twin
    of the column expression; shared so tests and the UDF can never
    diverge)."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    return p.text()


def extract_text_col(html: Column, fix_mojibake: bool = False) -> Column:
    """Column form: Arrow-batched scalar pandas_udf over the stdlib
    extractor. Prefer a real extractor plug-in for production quality —
    the signature is the contract (string in, string out), so swapping
    trafilatura in is a one-line factory change.

    ``fix_mojibake=True`` fuses encoding repair (functions/text.
    fix_mojibake_str) into THIS Python stage: the crawl chain already
    pays one Arrow round-trip for extraction, and a separate gated
    repair step cannot actually gate (ExtractPythonUDFs evaluates a
    CASE-wrapped pandas UDF unconditionally — the r11 review finding),
    so piggybacking the ~µs-per-clean-row repair check here is strictly
    cheaper than a second Python stage OR a filter-split-union that
    would re-run extraction per branch."""
    from pyspark.sql.functions import pandas_udf

    if fix_mojibake:
        from metadata_enhanced_pretrain_datapipeline_spark.functions.text import (
            fix_mojibake_str,
        )

        @pandas_udf("string")
        def _extract_fix(s: pd.Series) -> pd.Series:
            return s.map(lambda x: fix_mojibake_str(html_to_text(x))
                         if x is not None else None)

        return _extract_fix(html)

    @pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(lambda x: html_to_text(x) if x is not None else None)

    return _extract(html)


def extract_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "text") -> DataFrame:
    """Operator form: add ``out_col`` with the extracted text."""
    return df.withColumn(out_col, extract_text_col(F.col(html_col)))


class _BlockExtractor(HTMLParser):
    """Like :class:`_TextExtractor`, but text accumulates into BLOCKS
    (flushed at every block-tag boundary) with per-block anchor-char
    counts — the inputs the readability/boilerpipe/trafilatura family
    scores main content by."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._a_depth = 0
        self.blocks: list[tuple[str, int]] = []  # (raw text, link chars)
        self._cur: list[str] = []
        self._link = 0

    def flush(self) -> None:
        if self._cur:
            self.blocks.append(("".join(self._cur), self._link))
        self._cur, self._link = [], 0
        # An <a> that crosses a block boundary is treated as closed:
        # html.parser synthesizes no end tags, so one unclosed anchor
        # (ubiquitous in malformed crawl HTML) would otherwise mark
        # every later block 100%-link and drop the whole article
        # (r11 ADVICE). Anchors are inline elements — a block boundary
        # implicitly terminates them in every browser's tree anyway.
        self._a_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif self._skip_depth:
            # Inside <script>/<noscript>/<svg>/... a nested block tag
            # must NOT split the enclosing content block (r11 ADVICE) —
            # its text is skipped, so the boundary is meaningless.
            return
        elif tag in _BLOCK_TAGS:
            self.flush()
        elif tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif self._skip_depth:
            return
        elif tag in _BLOCK_TAGS:
            self.flush()
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self._cur.append(data)
        if self._a_depth:
            self._link += len(data)


def html_main_content(html: str, min_chars: int = 25,
                      max_link_density: float = 0.3) -> str:
    """MAIN-CONTENT extraction — the readability/boilerpipe/trafilatura
    core idea (Arc90 readability, Kohlschütter et al. 2010) as a
    deterministic, oracle-checkable baseline: segment the page into
    blocks at block-tag boundaries, score each by length and LINK
    DENSITY (anchor chars / collapsed block length), and keep blocks
    that are long enough (``min_chars``, after whitespace collapse +
    trim) and not link-dominated (``max_link_density``). Navigation
    bars, footers, tag clouds and sidebars are short and/or almost
    entirely anchor text — they drop; article paragraphs survive.
    Kept blocks join with newlines in document order.

    Density counts anchor chars of the RAW block over the COLLAPSED
    length — exact and documented (single-spaced content makes the two
    equal); production swaps in trafilatura through the same plug-in
    slot as :func:`html_to_text`."""
    p = _BlockExtractor()
    p.feed(html or "")
    p.close()
    p.flush()
    out = []
    for raw, link in p.blocks:
        txt = _WS.sub(" ", raw).strip()
        if len(txt) < min_chars:
            continue
        if link / max(len(txt), 1) > max_link_density:
            continue
        out.append(txt)
    return "\n".join(out)


def main_content_col(html: Column, min_chars: int = 25,
                     max_link_density: float = 0.3) -> Column:
    """Column form of :func:`html_main_content` (Arrow-batched scalar
    pandas_udf; same scale shape as extract_text_col)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _main(s: pd.Series) -> pd.Series:
        return s.map(lambda x: html_main_content(
            x, min_chars, max_link_density) if x is not None else None)

    return _main(html)

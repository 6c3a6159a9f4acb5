"""Text extraction — byte-identical to the reference's README extractor.

Reference: ``descriptionFromReadme`` + ``isReadmeSkippableLine`` at
``crawler/crawler.go:671-714``. The Go function has a load-bearing quirk:
``paragraph := make([]string, len(lines))`` allocates a slice of LENGTH
len(lines) (not capacity), with three byte-visible consequences that the
per-row invariant ("byte-identical extracted text per url") forces us to
replicate exactly:

  (a) ``len(paragraph) > 0`` is always true, so the loop breaks at the
      FIRST whitespace-only line — even before any content was collected;
  (b) ``len(paragraph) == 0`` is always false, so the skippable-line
      predicate (leading ``#`` headings, ``<img``/``<a``/``![``/``[!``)
      NEVER fires — those lines are kept;
  (c) slots past the break remain empty strings, so the final
      ``strings.Join(paragraph, " ")`` emits one space per untouched slot
      (i.e. trailing/extra spaces proportional to the lines never visited).

We therefore implement: normalize CRLF -> LF, split on LF, trim each line
with Go's ``strings.TrimSpace`` semantics (Unicode whitespace), stop at the
first line that trims to "", and join the length-preserved slot array with
single spaces.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Go strings.TrimSpace trims runes with the Unicode White_Space property
# (unicode.IsSpace): U+0009-U+000D, U+0020, U+0085, U+00A0, U+1680,
# U+2000-U+200A, U+2028, U+2029, U+202F, U+205F, U+3000. Python's bare
# .strip() additionally strips U+001C-U+001F, which Go does NOT — so we
# strip the exact Go set.
_GO_WHITESPACE = (
    "\t\n\x0b\x0c\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)


def _go_trim_space(line: str) -> str:
    """Go strings.TrimSpace equivalent (White_Space property, both ends)."""
    return line.strip(_GO_WHITESPACE)


def description_from_readme(contents: str) -> str:
    """Pure-Python port-of-semantics of crawler/crawler.go:671-696.

    Single-row oracle; the vectorized path below must agree byte-for-byte.
    """
    contents = contents.replace("\r\n", "\n")
    lines = contents.split("\n")
    paragraph = [""] * len(lines)  # Go: make([]string, len(lines)) — LENGTH, not cap
    for i, line in enumerate(lines):
        trimmed = _go_trim_space(line)
        if trimmed == "":
            # Go: `if len(paragraph) > 0 { break }` — always true.
            break
        # Go: `if len(paragraph) == 0 && isReadmeSkippableLine(...)` — never true.
        paragraph[i] = trimmed
    return " ".join(paragraph)


def is_readme_skippable_line(line: str) -> bool:
    """crawler/crawler.go:698-714 — dead code in the reference (see module
    docstring), kept as a tested public kernel because the *intended*
    behavior is useful for the quality-scoring operators."""
    lower = line.lower()
    if line.startswith("#"):
        return True
    if lower.startswith("<img") or lower.startswith("<a"):
        return True
    if line.startswith("![") or line.startswith("[!"):
        return True
    return False


def extract_description_series(html: pd.Series) -> pd.Series:
    """Vectorized extractor over an Arrow batch.

    Accepts binary (bytes) or string pages; bytes are decoded as UTF-8
    (errors="replace" — the synthetic corpus is valid UTF-8, real crawl
    data may not be, and a deterministic replacement keeps runs stable).
    """
    def _one(v: object) -> str | None:
        if v is None:
            return None
        if isinstance(v, (bytes, bytearray)):
            v = bytes(v).decode("utf-8", errors="replace")
        return description_from_readme(v)

    return html.map(_one)


@F.pandas_udf(T.StringType())
def extract_description_udf(html: pd.Series) -> pd.Series:
    return extract_description_series(html)


# ---------------------------------------------------------------------------
# Link extraction — the "emit newly discovered URLs" half of the fetch stage.
# The reference discovers work via provider listing APIs
# (scanner/github.go:59-153 etc.); our corpus embeds out-links as
# href attributes, so discovery is a regex scan per page.
# ---------------------------------------------------------------------------

_HREF_RE = re.compile(r'href="([^"]+)"')


def parse_links_py(html: str | bytes | None) -> list[str]:
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    return _HREF_RE.findall(html)


@F.pandas_udf(T.ArrayType(T.StringType()))
def parse_links_udf(html: pd.Series) -> pd.Series:
    return html.map(parse_links_py)


# PERF: PySpark's pandas-UDF path for ArrayType RETURNS is ~8x slower than
# for strings (measured 47s vs 6s over the same 500k-page scan — the
# per-element list conversion dominates, not the regex). The hot path
# therefore returns one RS-delimited string and splits JVM-side.
LINK_SEP = "\x1e"


@F.pandas_udf(T.StringType())
def parse_links_joined_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda v: LINK_SEP.join(parse_links_py(v)) if v is not None else None
    )


def links_col(html):
    """array<string> of hrefs, via the fast string-return kernel."""
    joined = parse_links_joined_udf(html)
    return F.filter(
        F.split(F.coalesce(joined, F.lit("")), LINK_SEP),
        lambda x: x != "",
    )

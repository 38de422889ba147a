"""Deterministic html → text extraction (the engine's "Converter" slot).

The reference has no text-extraction function; this slots in exactly where a
Gobblin ``Converter`` sits in the task flow (reference:
gobblin-api/src/main/java/org/apache/gobblin/converter/Converter.java:61-104 —
1:1 schema map + record-wise transform). Per the input_hint it must be a
**vectorized Arrow pandas_udf** with byte-identical output per url across
runs, Arrow batch sizes, and cluster sizes.

Determinism by construction: both the single-threaded reference
(``extract_text``) and the vectorized path (``extract_text_series``) apply the
*same ordered list of compiled regex substitutions* — no state across rows, no
randomness, no dependence on batch boundaries.

Semantics (FIXTURES.md §4): strip <script>/<style>/<nav>/<footer> (plus
comments, header/aside), break block-level tags into newlines, drop remaining
tags, unescape the common entities, collapse whitespace, join non-empty block
lines with '\\n'.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_FLAGS = re.IGNORECASE | re.DOTALL

# Ordered (pattern, replacement) pipeline applied after utf-8 decode.
# Identical for the scalar reference and the vectorized pandas path.
_STEPS: list[tuple[re.Pattern, str]] = [
    # html comments
    (re.compile(r"<!--.*?-->", _FLAGS), " "),
    # boilerplate containers, with their content
    (
        re.compile(
            r"<(script|style|nav|footer|header|aside)\b[^>]*>.*?</\1\s*>", _FLAGS
        ),
        " ",
    ),
    # block-level boundaries become newlines
    (
        re.compile(
            r"</?(?:p|div|h[1-6]|li|ul|ol|br|hr|tr|td|th|table|thead|tbody|"
            r"section|article|blockquote|title|head|body|html|main|figure)"
            r"\b[^>]*/?>",
            _FLAGS,
        ),
        "\n",
    ),
    # any remaining tag
    (re.compile(r"<[^>]*>", _FLAGS), " "),
    # limited entity set (fixture html uses only these); &amp; last
    (re.compile(r"&nbsp;"), " "),
    (re.compile(r"&lt;"), "<"),
    (re.compile(r"&gt;"), ">"),
    (re.compile(r"&quot;"), '"'),
    (re.compile(r"&#39;"), "'"),
    (re.compile(r"&amp;"), "&"),
    # collapse horizontal whitespace
    (re.compile(r"[ \t\r\f\v]+"), " "),
    # trim around line breaks, collapse blank lines
    (re.compile(r" ?\n ?"), "\n"),
    (re.compile(r"\n+"), "\n"),
]


def extract_text(html: bytes | None) -> str | None:
    """Single-threaded reference extractor (the byte-identity oracle)."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    for pat, repl in _STEPS:
        s = pat.sub(repl, s)
    return s.strip(" \n")


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extractor over a pandas Series of bytes (nullable)."""
    s = html.str.decode("utf-8", errors="replace")
    for pat, repl in _STEPS:
        s = s.str.replace(pat, repl, regex=True)
    return s.str.strip(" \n")


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched scalar pandas_udf: binary html → extracted text."""
    return extract_text_series(html)

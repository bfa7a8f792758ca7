"""Frozen text extraction/normalization — the byte-identical contract.

BASELINE.json input_hint: "per-row invariant vs the reference: byte-identical
extracted text per url". The reference's analog is its deriver/extractor
determinism (golden input/output tests, tests/trove/derive/_base.py:14-53 and
tests/trove/_input_output_tests.py:7-70) and the sharev2 analyzer's
`html_strip` char filter (share/search/index_strategy/sharev2_elastic8.py:63-66).

`extract_text` below is the FROZEN reference extractor for this engine:
it is pure, deterministic, and versioned (EXTRACTOR_VERSION participates in
the build-manifest checksum, the analog of CURRENT_STRATEGY_CHECKSUM in
share/search/index_strategy/_base.py:47). tests/test_extract_golden.py pins
sha256 goldens; any change here must bump the version and regenerate them.
"""

from __future__ import annotations

import html as _htmllib
import re
import unicodedata

import pandas as pd

EXTRACTOR_VERSION = "1"

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def strip_html(markup: str) -> str:
    """html_strip analog: drop script/style/comments/tags, unescape entities."""
    s = _SCRIPT_STYLE_RE.sub(" ", markup)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    return s


def extract_text(html_bytes: bytes | None, fallback_text: str | None) -> str:
    """html binary -> normalized text. Frozen; byte-identical per url.

    Rules (in order):
    1. if html is present: utf-8 decode (errors->U+FFFD), strip html
    2. else: use the `text` column as-is
    3. NFC unicode normalization
    4. collapse all whitespace runs to single spaces, strip ends
    """
    if html_bytes:
        raw = html_bytes.decode("utf-8", errors="replace")
        raw = strip_html(raw)
    else:
        raw = fallback_text or ""
    raw = unicodedata.normalize("NFC", raw)
    return _WS_RE.sub(" ", raw).strip()


def extract_series(html_col: pd.Series, text_col: pd.Series) -> pd.Series:
    """Batch extraction for pandas/Arrow UDFs."""
    return pd.Series(
        [extract_text(h, t) for h, t in zip(html_col, text_col)],
        index=html_col.index,
        dtype="object",
    )


# ASCII characters Python's `\s` (str mode) matches: str.isspace() is True
# for exactly these below 0x80. The RE2 class must spell them out — RE2's
# own \s is narrower (no \v, no FS..US) and would diverge from extract_text.
_ASCII_WS_CLASS = "[ \\t\\n\\x0b\\f\\r\\x1c\\x1d\\x1e\\x1f]+"


def extract_text_only_arrow(text_col: pd.Series):
    """Vectorized fast path for the no-html case: byte-identical to
    `extract_text(None, t)` when every input is ASCII (NFC is the identity
    on ASCII; the explicit whitespace class above equals Python's `\\s`
    there). Returns a list of strings, or None when any value is non-ASCII
    (caller falls back to the frozen per-row extractor). Arrow's RE2
    kernels process the whole batch in C — the docs stage's per-row Python
    loop disappears for text-only ASCII corpora (WET-style input)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        arr = pa.array(text_col.fillna("").astype(object), type=pa.string())
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return None
    if not pc.all(pc.string_is_ascii(arr)).as_py():
        return None
    collapsed = pc.replace_substring_regex(arr, _ASCII_WS_CLASS, " ")
    # after collapsing, any leading/trailing whitespace is a single space
    return pc.utf8_trim(collapsed, " ").to_pylist()

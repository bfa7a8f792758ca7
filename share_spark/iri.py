"""Sufficiently-unique IRI normalization.

Behavioral parity with trove/util/iris.py:31-113 (get_sufficiently_unique_iri):
- if the IRI contains '://', drop the scheme (keep '://'-less remainder
  prefixed by '://'-marker semantics; we keep just authority+path so that
  http/https variants collide)
- strip a single trailing '/'
- drop empty query ('?') and empty fragment ('#') suffixes

Also unquote_iri parity (trove/util/iris.py:154-188): repeated percent-decode.
Exposed both as plain Python (for the frozen oracle) and as a pandas batch
function, plus a Spark-native column expression (regexp chain) for use in
oracle-checkable queries.
"""

from __future__ import annotations

import urllib.parse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def suffuniq_iri(iri: str) -> str:
    if iri is None:
        return None
    s = iri
    # drop empty query/fragment markers
    while s.endswith(("?", "#")):
        s = s[:-1]
    if "://" in s:
        s = "://" + s.split("://", 1)[1]
    if s.endswith("/") and not s.endswith("://"):
        s = s[:-1]
    return s


def suffuniq_series(iris: pd.Series) -> pd.Series:
    return iris.map(suffuniq_iri)


def suffuniq_col(col: Column) -> Column:
    """Same normalization as a JVM-side expression (whole-stage codegen)."""
    c = F.regexp_replace(col, r"[?#]+$", "")
    c = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", "://")
    c = F.regexp_replace(c, r"(?<!:/)/$", "")
    return c


def unquote_iri(iri: str) -> str:
    """Percent-decode repeatedly until stable (trove/util/iris.py:154-188)."""
    prev = None
    cur = iri
    while cur != prev:
        prev = cur
        cur = urllib.parse.unquote(cur)
    return cur

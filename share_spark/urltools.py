"""URL canonicalization and url-keyed dedup for web-text corpora.

Crawl snapshots carry the same page under many spellings — scheme variants,
www. prefixes, default ports, trailing slashes, tracking parameters,
fragments — and url-level dedup is the cheapest, highest-yield hygiene pass
a web pipeline runs (before any content hashing). The reference ingests by
url identity (pages keyed on url in its harvest records); this module makes
that identity robust.

Canonical form (documented, deterministic, engine-portable — every rule is
a string/array builtin with an exact DuckDB twin for oracle checking):

1. trim surrounding whitespace
2. drop the scheme, case-insensitively (http == https for page identity)
3. drop the #fragment
4. authority: drop userinfo ('user:pass@' — credentials must never reach
   a dedup key); host: lowercase, strip one leading 'www.', strip
   ':80'/':443' (non-default ports are identity-relevant and stay)
5. path: strip trailing '/' runs (path case is PRESERVED — many origins
   serve case-sensitive paths)
6. query: drop tracking params (utm_*, fbclid, gclid, ref), sort the
   survivors bytewise, rejoin with '&'; an emptied query disappears

Scale shape: everything here is a pure map (regexp/split/array builtins,
whole-stage codegen, no UDF, no shuffle) except the dedup groupBy, which
shuffles only (canonical_url, doc_id) pairs — key cardinality is ~unique
pages, values are scalars.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never affect page identity (C4/CCNet-style).
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url_col(url: Column) -> Column:
    """Canonical-form expression over a url column (rules in module doc)."""
    s = F.trim(url)
    s = F.regexp_replace(s, r"^(?i)https?://", "")
    s = F.regexp_replace(s, r"#.*$", "")
    hostpath = F.split_part(s, F.lit("?"), F.lit(1))
    # everything after the FIRST '?' (a later literal '?' stays in the
    # query string, per WHATWG parsing)
    query = F.when(
        F.instr(s, "?") > 0, F.regexp_replace(s, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    host = F.lower(F.split_part(hostpath, F.lit("/"), F.lit(1)))
    host = F.regexp_replace(host, r"^[^@]*@", "")
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_replace(hostpath, r"^[^/]*", "")
    path = F.regexp_replace(path, r"/+$", "")
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit(""))
            & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    tail = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(host, path, tail)


def host_col(canonical: Column) -> Column:
    """Host part of a canonical url (strip query first: a host-only url
    with a query has no '/' separating them)."""
    return F.split_part(
        F.split_part(canonical, F.lit("?"), F.lit(1)), F.lit("/"), F.lit(1)
    )


def registered_domain_col(host: Column) -> Column:
    """Last-two-labels approximation of the registered domain (a real
    deployment substitutes the public-suffix list; not vendored here)."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def canonicalize_urls(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """(doc_id, url_canonical, host, registered_domain) per document."""
    canon = canonical_url_col(F.col(url_col))
    out = docs.select("doc_id", canon.alias("url_canonical"))
    host = host_col(F.col("url_canonical"))
    return out.select(
        "doc_id",
        "url_canonical",
        host.alias("host"),
        registered_domain_col(host).alias("registered_domain"),
    )


def url_duplicates(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Url-keyed dedup groups: one row per canonical url with >1 doc,
    (url_canonical, group_size, keep_doc_id) — min doc_id wins, the same
    deterministic contract as textops.exact_duplicates. Docs with a NULL
    or empty url have no key and can never be url-duplicates of each
    other — they are excluded from grouping (NOT collapsed into one
    mass-drop group)."""
    canon = canonicalize_urls(docs, url_col).where(
        F.col("url_canonical").isNotNull() & (F.col("url_canonical") != "")
    )
    return (
        canon.groupBy("url_canonical")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("group_size") > 1)
    )


def host_stats(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host corpus profile: (host, n_docs, n_unique_pages) — the
    standard crawl-audit aggregate (spot over-crawled hosts / SEO farms)."""
    canon = canonicalize_urls(docs, url_col)
    return canon.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("url_canonical").alias("n_unique_pages"),
    )

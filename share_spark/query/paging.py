"""Page cursors, keyset pagination, reproducible random sampling.

Reference parity:
- PageCursor: base64url(JSON [type_key, *args]) opaque cursors with
  DEFAULT_PAGE_SIZE=13, MAX_PAGE_SIZE=101, MAX_OFFSET=9997
  (trove/trovesearch/page_cursor.py:16-19,27-59)
- OAI-PMH keyset pagination: filter(id > last).orderBy(id).limit(n+1)
  (share/oaipmh/indexcard_repository.py:199-242, PAGE_SIZE=13)
- random sampling first page: unseeded random order when no text/sort;
  subsequent pages re-randomize seeded on the first page's ids, excluding
  them (trovesearch_denorm.py:739-803, page_cursor.py:125-144). Here the
  sample is always seeded (deterministic): the shuffle key is the first 60
  bits of md5(seed || doc_id) — the same trick the reference uses for pages
  >= 2, applied uniformly, with md5 (not xxhash64) so an ANSI-SQL oracle can
  reproduce the exact ordering.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PAGE_SIZE = 13
MAX_PAGE_SIZE = 101
MAX_OFFSET = 9997


@dataclass
class PageCursor:
    """Opaque cursor: base64url(JSON [type_key, *args])."""

    type_key: str = "offset"
    args: list = field(default_factory=list)

    def encode(self) -> str:
        blob = json.dumps([self.type_key, *self.args]).encode()
        return base64.urlsafe_b64encode(blob).decode().rstrip("=")

    @classmethod
    def decode(cls, token: str) -> "PageCursor":
        pad = "=" * (-len(token) % 4)
        data = json.loads(base64.urlsafe_b64decode(token + pad))
        return cls(data[0], list(data[1:]))


def clamp_page_size(size: int | None) -> int:
    if size is None:
        return DEFAULT_PAGE_SIZE
    return max(1, min(int(size), MAX_PAGE_SIZE))


def offset_page(
    df: DataFrame, order_cols: list, offset: int, page_size: int
) -> DataFrame:
    """Offset paging with the reference's MAX_OFFSET guard."""
    if offset > MAX_OFFSET:
        raise ValueError(f"offset {offset} exceeds MAX_OFFSET={MAX_OFFSET}")
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return (
        df.orderBy(*order_cols)
        .limit(offset + page_size)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > offset)
        .drop("_rn")
    )


def keyset_page(
    df: DataFrame, id_col: str, last_id: int | None, page_size: int = 13
) -> tuple[DataFrame, int]:
    """OAI-PMH-style keyset pagination with +1 overfetch.

    Returns (rows_with_overfetch, page_size): the DataFrame holds UP TO
    page_size + 1 rows ordered by id — the caller materializes once, slices
    the first page_size rows, and `len(rows) > page_size` is has_more (the
    +1 row is the probe, never rendered). Keyset scales where offset
    doesn't: the id predicate is pushed to the scan, no skip-scan of prior
    pages."""
    out = df
    if last_id is not None:
        out = out.filter(F.col(id_col) > last_id)
    rows = out.orderBy(F.asc(id_col)).limit(page_size + 1)
    return rows, page_size


def seeded_rank_col(seed: str, id_col: str):
    """Deterministic shuffle key: first 60 bits of md5(seed || id), as int64.
    SQL twin: ('0x' || substr(md5(seed || CAST(id AS VARCHAR)), 1, 15))::BIGINT
    — the same md5->int64 trick the dedup oracles pin, so the random page
    ordering is oracle-checkable bit-for-bit."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 15),
        16, 10,
    ).cast("long")


def random_page_seed(first_page_ids: list) -> str:
    """Pages >= 2 seed: the concatenated first-page ids, in page order (the
    reference's random_score seed = ''.join(first_page_ids),
    trovesearch_denorm.py:795-803)."""
    return "".join(str(i) for i in first_page_ids)


def seeded_random_page(
    df: DataFrame,
    id_col: str,
    seed: str,
    page_size: int,
    exclude_ids: list | None = None,
    offset: int = 0,
) -> DataFrame:
    """Reproducibly-random ordering via seeded_rank_col (the reference seeds
    ES random_score with the first page's ids, trovesearch_denorm.py:787-803).
    Fully distributed: TakeOrdered over offset+page_size, window on the tiny
    remainder."""
    out = df
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(exclude_ids))
    ranked = out.withColumn("_rk", seeded_rank_col(seed, id_col))
    order = [F.asc("_rk"), F.asc(id_col)]
    page = ranked.orderBy(*order).limit(offset + page_size)
    if offset:
        from pyspark.sql import Window

        w = Window.orderBy(*order)
        page = (
            page.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > offset)
            .drop("_rn")
        )
    return page.drop("_rk")

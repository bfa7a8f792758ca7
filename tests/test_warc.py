"""WARC source: container decode -> page rows -> full index round-trip."""

import datetime
import gzip

import pytest

from share_spark import warc


RECORDS = [
    {
        "url": "https://a.example/page1",
        "date_iso": "2020-05-01T12:00:00Z",
        "body": b"<html><body>alpha bravo charlie</body></html>",
    },
    {
        "url": "https://b.example/page2",
        "date_iso": "2021-06-02T01:02:03Z",
        "body": b"<html><title>T</title><body>delta echo</body></html>",
    },
]


def _blob(compress):
    return warc.write_warc(RECORDS, compress=compress)


@pytest.mark.parametrize("compress", [True, False])
def test_member_split_and_parse(compress):
    members = list(warc._split_warc_members(_blob(compress)))
    assert len(members) == 2
    recs = [warc.parse_warc_record(m, 1 << 20) for m in members]
    assert [r["url"] for r in recs] == [r["url"] for r in RECORDS]
    assert recs[0]["html"] == RECORDS[0]["body"]
    assert recs[0]["warc_ts"] == datetime.datetime(2020, 5, 1, 12, 0, 0)
    assert recs[0]["http_status"] == 200
    assert recs[0]["content_type"] == "text/html"
    assert not recs[0]["truncated"]


def test_non_response_and_error_records_dropped():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://x/\r\n\r\nGET / HTTP/1.1\r\n\r\n"
    )
    assert warc.parse_warc_record(req, 1 << 20) is None
    resp404 = warc.write_warc(
        [dict(RECORDS[0])], compress=False
    ).replace(b"200 OK", b"404 NF")
    rec = warc.parse_warc_record(
        next(warc._split_warc_members(resp404)), 1 << 20
    )
    assert rec["http_status"] == 404  # parse keeps it; read_warc filters


def test_chunked_and_gzip_bodies():
    chunked_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    )
    member = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://c.example/\r\n"
        b"WARC-Date: 2020-01-01T00:00:00Z\r\n\r\n" + chunked_http
    )
    rec = warc.parse_warc_record(member, 1 << 20)
    assert rec["html"] == b"hello world"
    gz_body = gzip.compress(b"<html>zz</html>")
    gz_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gz_body
    )
    member2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://d.example/\r\n"
        b"WARC-Date: 2020-01-01T00:00:00Z\r\n\r\n" + gz_http
    )
    assert warc.parse_warc_record(member2, 1 << 20)["html"] == b"<html>zz</html>"


def test_truncation_bound():
    rec = warc.parse_warc_record(
        next(warc._split_warc_members(_blob(False))), max_record_bytes=10
    )
    assert rec["truncated"] and len(rec["html"]) == 10


def test_read_warc_to_index_roundtrip(spark, tmp_path):
    """WARC files on disk -> read_warc -> build_index -> query: the full
    Common-Crawl-shaped front door."""
    from share_spark.index.build import IndexConfig, IndexReader, build_index
    from share_spark.query.wand import wand_topk

    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg-00000.warc.gz").write_bytes(warc.write_warc(RECORDS))
    (d / "seg-00001.warc.gz").write_bytes(
        warc.write_warc(
            [
                {
                    "url": "https://c.example/page3",
                    "date_iso": "2022-07-03T00:00:00Z",
                    "body": b"<html><body>alpha zulu</body></html>",
                }
            ]
        )
    )
    pages = warc.read_warc(spark, str(d))
    rows = {r["url"]: r for r in pages.collect()}
    assert len(rows) == 3
    assert rows["https://a.example/page1"]["warc_file"].endswith(
        "seg-00000.warc.gz"
    )
    idx_dir = str(tmp_path / "idx")
    build_index(
        spark, pages, idx_dir, IndexConfig(block_size=16, chunk_docs=64)
    )
    idx = IndexReader.open(spark, idx_dir)
    # html extraction happened in build_docs: tags stripped, text indexed
    alpha = {r["doc_id"] for r in wand_topk(idx, "alpha", k=10).collect()}
    assert len(alpha) == 2
    assert len(_ids(wand_topk(idx, "zulu", k=10))) == 1
    assert wand_topk(idx, "html", k=10).collect() == []  # no tag leakage
    docs = {r["url"]: r["text_norm"] for r in idx.docs().collect()}
    assert docs["https://a.example/page1"] == "alpha bravo charlie"


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


WET_RECORDS = [
    {
        "url": "https://a.example/page1",
        "date_iso": "2022-07-01T00:00:00Z",
        "text": "alpha bravo charlie delta",
    },
    {
        "url": "https://b.example/page2",
        "date_iso": "2022-07-02T12:30:00Z",
        "text": "echo foxtrot golf",
    },
]


@pytest.mark.parametrize("compress", [True, False])
def test_wet_member_split_and_parse(compress):
    raw = warc.write_wet(WET_RECORDS, compress=compress)
    members = list(warc._split_warc_members(raw))
    assert len(members) == 2
    recs = [warc.parse_wet_record(m, 1 << 20) for m in members]
    assert [r["url"] for r in recs] == [r["url"] for r in WET_RECORDS]
    assert recs[0]["text"] == "alpha bravo charlie delta"
    assert recs[0]["warc_ts"].year == 2022
    # a WARC response member is NOT a conversion record
    resp = warc.write_warc(
        [{"url": "https://x.example/", "date_iso": "2022-07-01T00:00:00Z",
          "body": b"<html></html>"}]
    )
    assert warc.parse_wet_record(
        next(warc._split_warc_members(resp)), 1 << 20
    ) is None


def test_read_wet_to_index_roundtrip(spark, tmp_path):
    """WET files on disk -> read_wet -> build_index -> query: html is NULL
    so the pre-extracted text routes straight through the extractor."""
    from share_spark.index.build import IndexConfig, IndexReader, build_index
    from share_spark.query.wand import wand_topk

    d = tmp_path / "wets"
    d.mkdir()
    (d / "seg-00000.warc.wet.gz").write_bytes(warc.write_wet(WET_RECORDS))
    pages = warc.read_wet(spark, str(d))
    rows = {r["url"]: r for r in pages.collect()}
    assert len(rows) == 2
    r = rows["https://a.example/page1"]
    assert r["html"] is None and r["http_status"] is None
    assert r["text"] == "alpha bravo charlie delta"

    idx_dir = str(tmp_path / "idx")
    build_index(spark, pages, idx_dir, IndexConfig(block_size=8, chunk_docs=8))
    idx = IndexReader.open(spark, idx_dir)
    got = wand_topk(idx, "charlie", k=5).collect()
    assert len(got) == 1

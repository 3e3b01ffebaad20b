"""WARC source (sources/warc.py): synthetic ISO-28500 archives, plain and
per-record-gzipped, parsed into the PAGES table and driven through the
extraction pipeline end-to-end."""

from __future__ import annotations

import gzip
import json

import pytest

from ocr_obsidian_spark.sources.warc import (
    gunzip_members,
    http_body,
    iter_warc_records,
    pages_from_warc_bytes,
    read_warc_pages,
)


def _record(rtype: str, uri: str | None, date: str, payload: bytes,
            extra: dict[str, str] | None = None) -> bytes:
    headers = [f"WARC/1.0", f"WARC-Type: {rtype}", f"WARC-Date: {date}"]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    for k, v in (extra or {}).items():
        headers.append(f"{k}: {v}")
    headers.append(f"Content-Length: {len(payload)}")
    head = "\r\n".join(headers).encode() + b"\r\n\r\n"
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
        + b"\r\nContent-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )


def _archive(payload_by_url: dict[str, bytes]) -> bytes:
    recs = [_record("warcinfo", None, "2017-03-22T17:50:00Z", b"software: test")]
    for url, body in payload_by_url.items():
        recs.append(_record("request", url, "2017-03-22T17:50:27Z",
                            b"GET / HTTP/1.1\r\n\r\n"))
        recs.append(_record("response", url, "2017-03-22T17:50:28Z", _http(body)))
    return b"".join(recs)


def test_iter_and_filter_records():
    arc = _archive({"https://a.test/1": b"<html>one</html>",
                    "https://b.test/2": b"<html>two</html>"})
    recs = list(iter_warc_records(arc))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "request", "response"]
    pages = pages_from_warc_bytes(arc)
    assert [p["url"] for p in pages] == ["https://a.test/1", "https://b.test/2"]
    assert pages[0]["html"] == b"<html>one</html>"  # HTTP headers stripped
    assert pages[0]["warc_ts"].isoformat() == "2017-03-22T17:50:28"
    # binary body with a fake nested blank line survives Content-Length framing
    tricky = b"x\r\n\r\ny" * 3
    arc2 = _record("response", "https://c.test", "2020-01-01T00:00:00Z", _http(tricky))
    assert pages_from_warc_bytes(arc2)[0]["html"] == tricky


def test_http_body_passthrough_and_malformed():
    assert http_body(b"no http header here") == b"no http header here"
    assert http_body(b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nBODY") == b"BODY"
    # record with a garbage Content-Length is skipped, later records survive
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: nope\r\n\r\n")
    good = _record("response", "https://ok.test", "2020-01-01T00:00:00Z", _http(b"fine"))
    pages = pages_from_warc_bytes(bad + good)
    assert [p["url"] for p in pages] == ["https://ok.test"]


def test_gzip_member_stream():
    arc = _archive({"https://gz.test/1": b"<html>gz</html>"})
    recs = list(iter_warc_records(arc))
    # per-record gzip members, the .warc.gz convention
    gz = b"".join(
        gzip.compress(_record_bytes)
        for _record_bytes in _split_concat(arc, recs)
    )
    assert gunzip_members(gz) == arc
    pages = pages_from_warc_bytes(gz)
    assert [p["url"] for p in pages] == ["https://gz.test/1"]
    # whole-file gzip decodes identically
    assert [p["url"] for p in pages_from_warc_bytes(gzip.compress(arc))] == [
        "https://gz.test/1"]


def _split_concat(arc: bytes, recs) -> list[bytes]:
    """Re-split the archive at each WARC/ version line."""
    idxs = []
    pos = 0
    while True:
        i = arc.find(b"WARC/", pos)
        if i < 0:
            break
        idxs.append(i)
        pos = i + 5
    idxs.append(len(arc))
    return [arc[a:b] for a, b in zip(idxs, idxs[1:])]


def test_read_warc_pages_spark_e2e(spark, tmp_path):
    """Archives on disk → PAGES → full extraction, byte-identical to the
    same payloads fed directly as pages (the source only changes framing)."""
    from pyspark.sql import functions as F

    from ocr_obsidian_spark.operators.extract import extract_pages
    from ocr_obsidian_spark.schemas import PAGES
    from ocr_obsidian_spark.sources.fixtures import fixture_page_rows

    rows = fixture_page_rows(2, 6, seed=3)
    by_url = {r["url"]: bytes(r["html"]) for r in rows}
    urls = sorted(by_url)
    # two archive files, like a (tiny) crawl segment; one gzipped
    half = len(urls) // 2
    (tmp_path / "w").mkdir()
    (tmp_path / "w" / "seg-0.warc").write_bytes(
        _archive({u: by_url[u] for u in urls[:half]}))
    (tmp_path / "w" / "seg-1.warc.gz").write_bytes(
        gzip.compress(_archive({u: by_url[u] for u in urls[half:]})))

    pages = read_warc_pages(spark, str(tmp_path / "w"))
    got = {r["url"]: r for r in pages.collect()}
    assert set(got) == set(urls)
    assert all(bytes(got[u]["html"]) == by_url[u] for u in urls)

    direct = spark.createDataFrame(rows, schema=PAGES)
    a = {r["url"]: r["extracted_text"] for r in extract_pages(pages).collect()}
    b = {r["url"]: r["extracted_text"] for r in extract_pages(direct).collect()}
    assert a == b


def test_cli_extract_from_warc(spark, tmp_path):
    """`extract --pages warc:<dir>` runs the full stage off archives."""
    from ocr_obsidian_spark.cli import main
    from ocr_obsidian_spark.sources.fixtures import fixture_page_rows

    rows = fixture_page_rows(1, 5, seed=9)
    (tmp_path / "arc").mkdir()
    (tmp_path / "arc" / "a.warc").write_bytes(
        _archive({r["url"]: bytes(r["html"]) for r in rows}))
    out = str(tmp_path / "xout")
    assert main(["extract", "--pages", f"warc:{tmp_path}/arc", "--out", out,
                 "--run-id", "warc-run"]) == 0
    assert spark.read.parquet(out + "/corpus").count() == 5

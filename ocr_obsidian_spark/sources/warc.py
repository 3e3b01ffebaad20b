"""WARC source: Common-Crawl-style web archives → the PAGES table.

WARC (ISO 28500) is the format the 100 TB design point actually arrives
in: ~1 GB archive files of framed records, each a version line +
CRLF-separated headers + Content-Length-delimited payload. Response
records carry an HTTP response whose body is the page content.

Scale shape: one Spark task per archive file (``binaryFile`` scan — WARC
is not line-splittable, and Common Crawl ships ~1 GB files precisely so
file-granular parallelism saturates a cluster), then an Arrow-batched
``mapInPandas`` parses records and emits PAGES rows. Per-record gzip
members (the ``.warc.gz`` convention) are handled by a zlib
concatenated-member loop; a whole-file gzip stream decodes identically.

Parsing is fail-soft at record granularity: a malformed record is skipped
(counted into no output) rather than killing the file task — same policy
as the extract stage's per-page degradation.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES

_GZIP_MAGIC = b"\x1f\x8b"


def gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of CONCATENATED gzip members (the .warc.gz
    layout: one member per record) into one contiguous byte string."""
    out: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n and data[pos : pos + 2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # pragma: no cover - defensive against zlib quirks
            break
        pos += consumed
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """(headers, payload) per WARC record; header keys lowercased.

    Records are located by the ``WARC/`` version line and delimited by
    ``Content-Length`` (the framing the spec mandates — record separators
    are advisory CRLFs, so scanning forward from the declared length is
    the robust read)."""
    pos = 0
    n = len(data)
    while pos < n:
        idx = data.find(b"WARC/", pos)
        if idx < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", idx)
        if hdr_end < 0:
            return
        lines = data[idx:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def http_body(payload: bytes) -> bytes:
    """Body of an HTTP response payload (after the first blank line);
    payloads without an HTTP header block pass through whole."""
    if payload[:5] in (b"HTTP/", b"http/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def _parse_warc_date(value: str | None) -> datetime | None:
    if not value:
        return None
    try:
        # WARC-Date is ISO-8601 UTC, e.g. 2017-03-22T17:50:28Z
        return datetime.fromisoformat(value.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


def pages_from_warc_bytes(data: bytes) -> list[dict[str, Any]]:
    """PAGES-shaped dicts from one WARC archive's bytes (gzip-transparent)."""
    if data[:2] == _GZIP_MAGIC:
        data = gunzip_members(data)
    rows: list[dict[str, Any]] = []
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        rows.append(
            {
                "url": url,
                "warc_ts": _parse_warc_date(headers.get("warc-date")),
                "html": http_body(payload),
                "text": None,
                "lang": None,
            }
        )
    return rows


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive files at ``path`` → PAGES DataFrame.

    ``binaryFile`` scan (one task per archive) → Arrow-batched parse. The
    scan projects only ``content``; Spark's binaryFile source prunes the
    bytes column when unused, but here it IS the input."""
    cols = [f.name for f in PAGES.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for content in pdf["content"]:
                try:
                    rows.extend(pages_from_warc_bytes(bytes(content)))
                except Exception:
                    continue  # fail-soft per archive, like per-page extract
            yield pd.DataFrame(rows, columns=cols)

    src = spark.read.format("binaryFile").load(path).select("content")
    return src.mapInPandas(run, schema=PAGES)

"""WARC source: Common-Crawl archive files → the pages table.

Real Common-Crawl data ships as WARC 1.0/1.1 files (per-record gzip
members). This source turns them into the engine's input schema
(url, warc_ts, html, text, lang) without any external warc library:

- record-level parse: WARC header block (CRLF-separated, Content-Length
  delimited payload), response records only;
- HTTP response payload split (status line + headers + body);
- multi-member gzip handled by a zlib decompressobj loop;
- Spark-side: ``binaryFile`` scan → ``mapInPandas`` (one Arrow batch per
  WARC file) → pages rows. At 100 TB the parallel unit is the WARC file
  (~1 GB each in CC), which matches the scan split; downstream salting
  redistributes per-document work.

Reference role: replaces the reference's path/stream resolution layer
(/root/reference/docling/datamodel/document.py:441-486) with a
crawl-native source.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Iterator, Optional

_CRLF2 = b"\r\n\r\n"


def gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; passthrough if not
    gzipped."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(data[pos:])
            out += d.flush()
        except zlib.error:
            # corrupt member: keep whatever decompressed, stop scanning —
            # expected at Common-Crawl scale; must not raise into the task
            break
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # first line = WARC/1.x or status
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, payload) per record. Tolerant of truncation."""
    data = gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_CRLF2, start)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        yield headers, payload
        pos = hdr_end + 4 + length


def http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope if present."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(_CRLF2)
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def _parse_ts(value: Optional[str]) -> Optional[datetime]:
    if not value:
        return None
    try:
        return datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None


def warc_to_rows(data: bytes) -> Iterator[dict]:
    """One WARC blob → pages rows (response records only)."""
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        yield {
            "url": url,
            "warc_ts": _parse_ts(headers.get("warc-date")),
            "html": http_body(payload),
            "text": None,
            "lang": None,
        }


def read_warc(spark, path: str):
    """WARC files under ``path`` → pages DataFrame (input_hint schema)."""
    import pandas as pd

    from ..schema import PAGES_SCHEMA

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for b in batches:
            rows = []
            for blob in b["content"]:
                # per-file containment: one corrupt/malformed WARC must not
                # fail the Spark task (same principle as job._extract_one)
                try:
                    rows.extend(warc_to_rows(bytes(blob)))
                except Exception:  # noqa: BLE001 — containment by design
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)


# ------------------------------------------------------------- test writer
def build_warc(records: list[tuple[str, str, bytes]], gzip_members: bool = False) -> bytes:
    """Deterministic WARC writer for tests: records = [(url, iso_ts, body)]."""
    import gzip as _gzip

    out = bytearray()
    for url, ts, body in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + _CRLF2[:2] + b"\r\n" + body
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + ts.encode() + b"\r\n"
            b"Content-Type: application/http;msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            + http
            + b"\r\n\r\n"
        )
        out += _gzip.compress(rec) if gzip_members else rec
    return bytes(out)

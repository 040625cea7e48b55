"""WARC/1.1 container build + parse (pure bytes, no Spark).

The web-archive container is how crawl corpora arrive at a training
pipeline (Common Crawl stores every fetch as a WARC ``response``
record: WARC headers, then an HTTP/1.1 message, with CRLF framing and
``Content-Length`` byte counts — ISO 28500 / the public WARC 1.1 spec).
The reference ingests crawl-derived files one-by-one through its file
controllers (app/core ConvertHtmlToPDF.java takes single HTML files);
at 100 TB the unit of IO is the multi-record WARC segment instead, so
this kernel gives the engine a real record-framed reader:

* :func:`build_warc` emits a deterministic WARC file (one ``warcinfo``
  record followed by one ``response`` record per page) — used by the
  corpus synthesizer so tests need no external data;
* :func:`parse_warc` walks records by ``Content-Length`` framing
  (never by regex over the whole blob — payloads may contain header
  look-alikes), returning per-record byte offsets exactly like the
  Common Crawl CDX index does.

Everything is byte-exact: offsets returned by the parser equal the
offsets implied by the builder's framing, which the DuckDB oracle
re-derives arithmetically from the header layout.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

CRLF = b"\r\n"

# fixed-size pieces of the record layout (the oracle restates these
# lengths; keep them in sync with WARC_OVERHEAD below)
_WARCINFO_BODY = b"software: stirling-pdf-spark/1.0\r\nformat: WARC File Format 1.1\r\n"


def _record(headers: list[tuple[str, str]], body: bytes) -> bytes:
    head = b"WARC/1.1\r\n"
    for k, v in headers:
        head += f"{k}: {v}\r\n".encode("ascii")
    head += f"Content-Length: {len(body)}\r\n".encode("ascii")
    return head + CRLF + body + CRLF + CRLF


def record_id_for(url: str) -> str:
    """Deterministic WARC-Record-ID (urn:uuid from md5 of the URI)."""
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return (f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
            f"{h[20:32]}>")


def warcinfo_record() -> bytes:
    return _record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Record-ID", record_id_for("warcinfo")),
         ("WARC-Date", "2024-01-01T00:00:00Z"),
         ("Content-Type", "application/warc-fields")],
        _WARCINFO_BODY)


def http_response(html: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n" +
            f"Content-Length: {len(html)}\r\n".encode("ascii") +
            CRLF + html)


def response_record(url: str, date_iso: str, html: bytes) -> bytes:
    return _record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", record_id_for(url)),
         ("WARC-Date", date_iso),
         ("WARC-Target-URI", url),
         ("Content-Type", "application/http;msgtype=response")],
        http_response(html))


def build_warc(pages: Iterable[tuple[str, str, bytes]]) -> bytes:
    """One WARC file: warcinfo + a response record per (url, date,
    html) page, in input order."""
    out = [warcinfo_record()]
    for url, date_iso, html in pages:
        out.append(response_record(url, date_iso, html))
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(CRLF):
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.decode("ascii").strip().lower()] = \
            v.decode("utf-8", "replace").strip()
    return headers


def parse_warc(blob: bytes) -> list[dict]:
    """Walk records by Content-Length framing; returns one dict per
    record with byte ``offset``/``length`` (CDX-style), WARC headers,
    and for ``response`` records the parsed HTTP status / content-type
    / payload bytes."""
    out: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith(b"WARC/", pos):
            raise ValueError(f"bad record magic at offset {pos}")
        head_end = blob.index(CRLF + CRLF, pos)
        headers = _parse_headers(blob[pos + len(b"WARC/1.1\r\n"):head_end])
        body_start = head_end + 4
        clen = int(headers["content-length"])
        body = blob[body_start:body_start + clen]
        rec_end = body_start + clen + 4  # trailing CRLFCRLF
        if blob[body_start + clen:rec_end] != CRLF + CRLF:
            raise ValueError(f"bad record trailer at offset {pos}")
        rec = {
            "offset": pos,
            "length": rec_end - pos,
            "rec_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "http_status": None,
            "http_content_type": None,
            "payload": b"",
        }
        if rec["rec_type"] == "response":
            http_end = body.index(CRLF + CRLF)
            status_line, _, header_block = \
                body[:http_end].partition(CRLF)
            rec["http_status"] = int(status_line.split(b" ")[1])
            http_headers = _parse_headers(header_block)
            rec["http_content_type"] = http_headers.get("content-type")
            rec["payload"] = body[http_end + 4:]
        out.append(rec)
        pos = rec_end
    return out

"""WARC source/sink — dependency-free Common-Crawl-style ingestion.

WARC (ISO 28500) is the container Common Crawl ships: a concatenation
of records, each a header block (``WARC/1.0`` + named fields, CRLF
line endings) and a ``Content-Length``-framed body, separated by a
blank line and two trailing CRLFs. This module implements the subset a
crawl-ingest pipeline needs, with no external dependencies:

- :func:`write_warc_corpus`: shard a pages table into ``.warc`` files
  (one ``response`` record per page: ``WARC-Target-URI``, ``WARC-Date``
  from ``warc_ts``, an ``HTTP/1.1 200 OK`` response header, the html
  payload verbatim) — the deterministic test/oracle fixture writer;
- :func:`iter_warc_records`: robust single-pass record parser
  (Content-Length framing, tolerant of gzip-less concatenation);
- :func:`read_warc`: ``ray.data.read_binary_files`` over the shard
  paths -> one task per file parses its records into the pages schema
  ``(url, warc_ts, html)`` — WARC shards are the natural Ray Data
  parallelism unit exactly as Common Crawl publishes them (segment
  files), so a 100 TB crawl reads as one task per shard with no
  cross-file coordination.

Downstream, ``ops/html_links.html_link_edges`` turns the html payloads
into the link graph — the full crawl-shaped path (WARC -> pages ->
edges) is driver-gated end to end by the ``wiki_warc_edges`` oracle.

Reference note: the reference ingests bz2-compressed XML dumps
(WikiReader.kt); WARC is this engine's analog for the Common-Crawl
input the north rule targets. Gzip-per-record (Common Crawl's actual
layout) would wrap each record with ``gzip.compress`` — the framing
below is unchanged; plain concatenation keeps the fixture
byte-inspectable.
"""

from __future__ import annotations

import datetime as _dt
import io

import numpy as np
import pyarrow as pa

import ray.data

from ..state import fsio

CRLF = b"\r\n"


def _warc_date(ts_us: int) -> str:
    # WARC-1.1-style fractional seconds: lossless timestamp round-trip
    dt = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=int(ts_us))
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _parse_warc_date(s: str) -> int:
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = _dt.datetime.strptime(s, fmt)
    delta = dt - _dt.datetime(1970, 1, 1)
    return delta.days * 86_400_000_000 + delta.seconds * 1_000_000 \
        + delta.microseconds


def _record(url: str, ts_us: int, html: bytes) -> bytes:
    http = (b"HTTP/1.1 200 OK" + CRLF +
            b"Content-Type: text/html; charset=utf-8" + CRLF + CRLF)
    body = http + html
    head = (
        b"WARC/1.0" + CRLF +
        b"WARC-Type: response" + CRLF +
        b"WARC-Target-URI: " + url.encode("utf-8") + CRLF +
        b"WARC-Date: " + _warc_date(ts_us).encode() + CRLF +
        b"Content-Type: application/http; msgtype=response" + CRLF +
        b"Content-Length: " + str(len(body)).encode() + CRLF + CRLF)
    return head + body + CRLF + CRLF


def write_warc_corpus(pages: "ray.data.Dataset", out_uri: str, *,
                      n_shards: int = 8) -> list[str]:
    """Write pages(url, warc_ts, html) as ``n_shards`` plain ``.warc``
    shard files under ``out_uri``; returns the shard URIs (sorted).
    Shard routing is a stable url-hash so output is deterministic for a
    given input set regardless of block layout."""
    import hashlib

    fsio.makedirs(out_uri)
    shards: list[io.BytesIO] = [io.BytesIO() for _ in range(n_shards)]
    df = pages.select_columns(["url", "warc_ts", "html"]).to_pandas()
    ts_us = pa.Array.from_pandas(df["warc_ts"]).cast(
        pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(df["url"].to_numpy())  # deterministic record order
    for i in order:
        url = df["url"].iloc[int(i)]
        shard = int.from_bytes(
            hashlib.md5(url.encode()).digest()[:4], "little") % n_shards
        shards[shard].write(_record(url, int(ts_us[int(i)]),
                                    df["html"].iloc[int(i)]))
    paths = []
    for s, buf in enumerate(shards):
        p = fsio.join(out_uri, f"shard-{s:05d}.warc")
        fs, path = fsio.resolve(p)
        with fs.open_output_stream(path) as f:
            f.write(buf.getvalue())
        paths.append(p)
    return sorted(paths)


def iter_warc_records(data: bytes):
    """Yield ``(headers: dict, body: bytes)`` per record of one WARC
    file (plain concatenation)."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        end = data.find(CRLF + CRLF, pos)
        if end < 0:
            return
        head = data[pos:end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"malformed WARC record header at byte {pos}")
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        length = int(headers.get("Content-Length", "0"))
        body_start = end + 4
        yield headers, data[body_start:body_start + length]
        pos = body_start + length


def _http_payload(body: bytes) -> bytes:
    """Strip the framed HTTP response header; the payload follows the
    first blank line."""
    sep = body.find(CRLF + CRLF)
    return body[sep + 4:] if sep >= 0 else body


def read_warc(paths: list[str] | str, *,
              concurrency: int | None = None) -> "ray.data.Dataset":
    """WARC shard files -> Dataset(url, warc_ts, html). One parse task
    per shard file (``read_binary_files`` keeps whole files as single
    rows — WARC's framing is sequential within a file)."""

    def parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        htmls: list[bytes] = []
        for blob in t.column("bytes").to_pylist():
            for headers, body in iter_warc_records(blob):
                if headers.get("WARC-Type") != "response":
                    continue
                urls.append(headers["WARC-Target-URI"])
                tss.append(_parse_warc_date(headers["WARC-Date"]))
                htmls.append(_http_payload(body))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        })

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(parse, batch_format="pyarrow",
                          concurrency=concurrency)

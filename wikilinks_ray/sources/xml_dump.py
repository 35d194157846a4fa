"""Wikimedia-export XML source (reference S1 parity).

The reference ingests Wikimedia XML dumps through a SAX push parser
(WikiProcessor.kt:43-71 over bliki's WikiXMLParser) with bz2
multistream splitting (WikiReader.kt). Our engine's native input is the
Parquet pages table (BASELINE.json input_hint), but for dump parity this
source reads export XML files into that same schema:

    ray.data.read_binary_files(paths) -> map_batches(parse_xml_dump)
      -> (url, warc_ts, html, text, lang)

- one file = one parse task (Ray Data's file splitting replaces the
  reference's bz2 substream scanner, WikiReader.kt:175-224; for
  .bz2 inputs the payload is decompressed in-task);
- only main-namespace pages are kept (``<ns> == 0`` when present —
  M1, WikiProcessor.kt:44);
- ``warc_ts`` is a fixed epoch +  hash(title)-derived offset, NOT a
  parse-order counter: ids and timestamps must be content-derived so
  block order never matters (SURVEY.md §2.10).
"""

from __future__ import annotations

import bz2
import hashlib
import xml.etree.ElementTree as ET

import pyarrow as pa

from .corpus import EPOCH_US, page_url

_NS = "{http://www.mediawiki.org/xml/export-0.10/}"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_export_xml(payload: bytes) -> list[tuple[str, str]]:
    """One dump file -> [(title, wikitext)] for main-namespace pages."""
    if payload[:3] == b"BZh":
        payload = bz2.decompress(payload)
    out: list[tuple[str, str]] = []
    title, text, ns, in_page = None, None, 0, False
    for event, elem in ET.iterparse(_BytesReader(payload), events=("start", "end")):
        tag = _strip_ns(elem.tag)
        if event == "start":
            if tag == "page":
                in_page, title, text, ns = True, None, None, 0
            continue
        if not in_page:
            elem.clear()
            continue
        if tag == "title":
            title = elem.text or ""
        elif tag == "ns":
            ns = int(elem.text or 0)
        elif tag == "text":
            text = elem.text or ""
        elif tag == "page":
            if title is not None and ns == 0:
                out.append((title, text or ""))
            in_page = False
            elem.clear()
    return out


class _BytesReader:
    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0

    def read(self, n: int = -1) -> bytes:
        if n < 0:
            n = len(self._data) - self._pos
        chunk = self._data[self._pos:self._pos + n]
        self._pos += len(chunk)
        return chunk


def parse_xml_dump(batch: pa.Table) -> pa.Table:
    """read_binary_files batch (bytes [+ path]) -> pages-schema rows."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for payload in batch.column("bytes").to_pylist():
        for title, text in parse_export_xml(payload):
            h = int.from_bytes(
                hashlib.md5(title.encode("utf-8")).digest()[:4], "little")
            urls.append(page_url(title))
            tss.append(EPOCH_US + h)  # content-derived, order-independent
            htmls.append(b"")
            texts.append(text)
            langs.append("en")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def read_xml_dump(paths: str | list[str]):
    """Dump file(s)/dir -> pages Dataset (lazy)."""
    import ray.data

    files = ray.data.read_binary_files(paths)
    return files.map_batches(parse_xml_dump, batch_format="pyarrow")

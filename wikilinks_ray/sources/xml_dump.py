"""Wikimedia-export XML source (reference S1-S5 parity).

The reference ingests Wikimedia XML dumps through a SAX push parser
(WikiProcessor.kt:43-71 over bliki's WikiXMLParser) with bz2
multistream splitting (WikiReader.kt). Our engine's native input is the
Parquet pages table (BASELINE.json input_hint), but for dump parity this
source reads export XML files into that same schema
``(url, warc_ts, html, text, lang)``.

Multistream ``.bz2`` dumps split into parallel Ray tasks (S3-S5):

- **Sidecar index** (S3): ``<dump>-index.txt.bz2`` next to the dump,
  lines ``offset:pageid:title`` — distinct increasing offsets become
  substream ranges, 0 prepended and file size appended
  (WikiReader.kt:105-163 ``parseIndexRanges`` semantics, including its
  validation rules).
- **Magic scan fallback** (S4): offsets of the 10-byte stream header
  ``BZh[1-9]1AY&SY`` found with a vectorized numpy scan (the reference
  rolls a byte window, WikiReader.kt:178-224); interior block headers
  lack the ``BZh`` prefix, so only true stream starts match.
- **Parallel range decompression** (S5): one Ray task per (path, start,
  end) range — seek + read + ``bz2.decompress`` + parse, streaming
  through the Dataset instead of the reference's bounded in-order
  reassembly queue (WikiReader.kt:340-468): downstream stages are
  order-independent here, so no reassembly is needed at all.

Other semantics:

- only main-namespace pages are kept (``<ns> == 0`` when present —
  M1, WikiProcessor.kt:44);
- ``warc_ts`` is a fixed epoch + hash(title)-derived offset, NOT a
  parse-order counter: ids and timestamps must be content-derived so
  block order never matters (SURVEY.md §2.10).
"""

from __future__ import annotations

import bz2
import hashlib
import os
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from .corpus import EPOCH_US, page_url

_NS = "{http://www.mediawiki.org/xml/export-0.10/}"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def iter_export_pages(source) -> "Iterator[tuple[str, str]]":
    """Incremental parse of export XML from a file-like ``source`` ->
    yields (title, wikitext) per main-namespace page.

    Memory is bounded by ONE page element regardless of dump size: each
    completed ``<page>`` subtree is cleared AND detached from the root
    (iterparse otherwise accumulates every emptied page element as a
    root child — O(pages) growth on a 100 GB dump). This is the
    streaming core the reference gets from its SAX push parser
    (WikiProcessor.kt:43-71; bz2 streamed at WikiReader.kt:66-72)."""
    root = None
    title, text, ns, in_page = None, None, 0, False
    for event, elem in ET.iterparse(source, events=("start", "end")):
        if root is None:
            root = elem
        tag = _strip_ns(elem.tag)
        if event == "start":
            if tag == "page":
                in_page, title, text, ns = True, None, None, 0
            continue
        if not in_page:
            if elem is not root:
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
                yield title, text or ""
            in_page = False
            elem.clear()
            # detach the spent page element so the root doesn't grow
            if root is not None and len(root) and root[-1] is elem:
                del root[-1]


def parse_export_xml(payload: bytes) -> list[tuple[str, str]]:
    """One in-memory dump payload -> [(title, wikitext)] for
    main-namespace pages. bz2 payloads are stream-decompressed (BZ2File
    over the buffer) so the full decompressed text never materializes;
    for dumps too big to hold even compressed, use ``read_xml_dump``
    whose single-stream path streams straight off disk."""
    if payload[:3] == b"BZh":
        import io

        with bz2.BZ2File(io.BytesIO(payload)) as f:
            return list(iter_export_pages(f))
    return list(iter_export_pages(_BytesReader(payload)))


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


def parse_page_fragment(payload: bytes) -> list[tuple[str, str]]:
    """A decompressed multistream substream -> [(title, wikitext)].

    A substream is a bare ``<page>...</page>`` sequence (no root, no
    xmlns); the dump's first stream holds the header/siteinfo and the
    last holds the closing tag — both carry no complete page and yield
    nothing. Slicing first-``<page`` .. last-``</page>`` and wrapping in
    a synthetic root handles all three shapes.
    """
    start = payload.find(b"<page")
    end = payload.rfind(b"</page>")
    if start < 0 or end < 0:
        return []
    wrapped = b"<pages>" + payload[start:end + len(b"</page>")] + b"</pages>"
    return parse_export_xml(wrapped)


# --------------------------------------------------------------------------
# multistream bz2 splitting (S3-S5)
# --------------------------------------------------------------------------

def sidecar_index_path(dump_path: str) -> str:
    """``x.xml.bz2`` -> ``x-index.txt.bz2`` (WikiReader.kt:165-173)."""
    name = os.path.basename(dump_path)
    if name.endswith(".xml.bz2"):
        idx = name[: -len(".xml.bz2")] + "-index.txt.bz2"
    elif name.endswith(".bz2"):
        idx = name[: -len(".bz2")] + "-index.txt.bz2"
    else:
        idx = name + "-index.txt.bz2"
    return os.path.join(os.path.dirname(dump_path), idx)


def parse_index_ranges(index_text: str, compressed_size: int) -> list[tuple[int, int]]:
    """``offset:pageid:title`` lines -> substream (start, end) ranges.

    Mirrors the reference's validation (WikiReader.kt:117-163): blank
    lines skipped, consecutive duplicate offsets collapsed, offsets must
    be strictly increasing and inside [0, size); 0 is prepended and the
    file size closes the last range.
    """
    if compressed_size <= 0:
        raise ValueError("Compressed source must not be empty")
    offsets: list[int] = []
    previous: int | None = None
    for lineno, line in enumerate(index_text.splitlines(), start=1):
        if not line.strip():
            continue
        sep = line.find(":")
        if sep <= 0:
            raise ValueError(f"Malformed index line {lineno}: missing ':'")
        try:
            offset = int(line[:sep])
        except ValueError:
            raise ValueError(f"Malformed index line {lineno}: invalid offset")
        if not 0 <= offset < compressed_size:
            raise ValueError(
                f"Index offset out of bounds on line {lineno}: "
                f"{offset} not in [0, {compressed_size})")
        if previous is None or previous != offset:
            if previous is not None and offset <= previous:
                raise ValueError(
                    f"Index offsets must be strictly increasing: "
                    f"{offset} after {previous}")
            offsets.append(offset)
            previous = offset
    if not offsets:
        return []
    if offsets[0] != 0:
        offsets.insert(0, 0)
    offsets.append(compressed_size)
    return [(offsets[i], offsets[i + 1]) for i in range(len(offsets) - 1)]


_BZ2_STREAM_MAGIC = b"BZh"
_BZ2_BLOCK_MAGIC = b"1AY&SY"


def scan_bz2_stream_offsets(data: bytes | memoryview) -> np.ndarray:
    """Byte offsets of every ``BZh[1-9]1AY&SY`` stream header — the S4
    substream scanner (WikiReader.kt:178-224), vectorized: ten shifted
    equality masks instead of a per-byte rolling window."""
    a = np.frombuffer(data, dtype=np.uint8)
    n = len(a)
    if n < 10:
        return np.empty(0, np.int64)
    pattern = _BZ2_STREAM_MAGIC + b"\x00" + _BZ2_BLOCK_MAGIC  # \x00 = level slot
    m = np.ones(n - 9, dtype=bool)
    for i, byte in enumerate(pattern):
        window = a[i:n - 9 + i]
        if i == 3:  # compression level '1'..'9'
            m &= (window >= ord("1")) & (window <= ord("9"))
        else:
            m &= window == byte
    return np.flatnonzero(m).astype(np.int64)


_SCAN_CHUNK = 64 * 1024 * 1024  # streaming magic scan: bounded driver memory


def multistream_ranges(dump_path: str) -> list[tuple[int, int]]:
    """Substream (start, end) ranges of a ``.bz2`` dump: sidecar index
    when present (no scan needed), else a magic scan of the file.

    The scan streams the compressed file once on the driver in
    fixed-size chunks with a 9-byte overlap (the reference's scanner,
    WikiReader.kt:178-224, uses a rolling window the same way) — a
    100 GB dump without a sidecar index degrades to a sequential scan
    instead of OOMing the driver. Index-carrying dumps skip the scan
    entirely, which is the recommended path for 100 GB dumps.
    """
    size = os.path.getsize(dump_path)
    idx = sidecar_index_path(dump_path)
    if os.path.exists(idx):
        with open(idx, "rb") as f:
            text = bz2.decompress(f.read()).decode("utf-8")
        ranges = parse_index_ranges(text, size)
        if ranges:
            return ranges
    offs_parts: list[np.ndarray] = []
    with open(dump_path, "rb") as f:
        pos = 0
        tail = b""
        while True:
            chunk = f.read(_SCAN_CHUNK)
            if not chunk:
                break
            buf = tail + chunk
            base = pos - len(tail)
            local = scan_bz2_stream_offsets(buf)
            if len(local):
                offs_parts.append(local + base)
            # a 10-byte magic can straddle the boundary: carry 9 bytes
            tail = buf[-9:]
            pos += len(chunk)
    offs = (np.unique(np.concatenate(offs_parts)) if offs_parts
            else np.empty(0, np.int64))
    if len(offs) == 0:
        return [(0, size)]
    bounds = np.concatenate((offs, [size]))
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(len(offs))]


def _decompress_ranges(batch: pa.Table) -> pa.Table:
    """(path, start, end) rows -> pages-schema rows (S5: one range = one
    independent bz2 stream, decompressed and parsed in-task)."""
    out_rows: list[tuple[str, str]] = []
    for path, start, end in zip(batch.column("path").to_pylist(),
                                batch.column("start").to_pylist(),
                                batch.column("end").to_pylist()):
        with open(path, "rb") as f:
            f.seek(start)
            payload = bz2.decompress(f.read(end - start))
        out_rows.extend(parse_page_fragment(payload))
    return _pages_table(out_rows)


def _pages_table(rows: list[tuple[str, str]]) -> pa.Table:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for title, text in rows:
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


def read_multistream_dump(dump_path: str, *, ranges: list[tuple[int, int]] | None = None):
    """One multistream ``.bz2`` dump -> pages Dataset with one parallel
    task per substream (instead of one task for the whole file)."""
    import ray.data

    if ranges is None:
        ranges = multistream_ranges(dump_path)
    items = [{"path": dump_path, "start": s, "end": e} for s, e in ranges]
    return (ray.data.from_items(items)
            .repartition(len(items))  # one decompression task per range
            .map_batches(_decompress_ranges, batch_format="pyarrow"))


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


_SINGLESTREAM_BATCH = 2000  # pages per emitted block on the stream path


def _stream_dump_files(batch: pa.Table):
    """Generator map_batches fn: (path) rows -> pages-schema blocks of
    ``_SINGLESTREAM_BATCH`` pages each. Decompression (``bz2.BZ2File``)
    and XML parse both run incrementally, so task memory is bounded by
    one block + the decompressor window — never the dump size. Ray's
    streaming executor applies backpressure to the yields, so a slow
    downstream stage throttles the read instead of buffering it."""
    for path in batch.column("path").to_pylist():
        opener = bz2.BZ2File if path.endswith(".bz2") else open
        with opener(path, "rb") as f:
            rows: list[tuple[str, str]] = []
            for page in iter_export_pages(f):
                rows.append(page)
                if len(rows) >= _SINGLESTREAM_BATCH:
                    yield _pages_table(rows)
                    rows = []
            if rows:
                yield _pages_table(rows)


def read_xml_dump(paths: str | list[str]):
    """Dump file(s)/dir -> pages Dataset (lazy).

    A single multistream ``.bz2`` file splits into one task per
    substream (S3-S5). A single-STREAM ``.bz2`` (no index, no interior
    stream magics — e.g. a plain ``bzip2``-ed export) cannot be split,
    so it streams through one task with bounded memory instead of being
    slurped (the reference streams it too, WikiReader.kt:66-72).
    Anything else parses one file per task."""
    import ray.data

    if isinstance(paths, str) and paths.endswith(".bz2") and os.path.isfile(paths):
        ranges = multistream_ranges(paths)
        if len(ranges) > 1:
            return read_multistream_dump(paths, ranges=ranges)
        return (ray.data.from_items([{"path": paths}])
                .map_batches(_stream_dump_files, batch_format="pyarrow"))
    files = ray.data.read_binary_files(paths)
    return files.map_batches(parse_xml_dump, batch_format="pyarrow")

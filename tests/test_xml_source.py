"""XML dump source tests (S1 parity): export XML -> pages schema ->
full graph build, incl. bz2 payloads and namespace filtering."""

from __future__ import annotations

import bz2

import pytest

EXPORT = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
  <siteinfo><sitename>test</sitename></siteinfo>
  <page>
    <title>Gdańsk</title>
    <ns>0</ns>
    <revision><text>City. [[Polska]] and [[morze]].</text></revision>
  </page>
  <page>
    <title>Polska</title>
    <ns>0</ns>
    <revision><text>Country. [[Gdańsk]]</text></revision>
  </page>
  <page>
    <title>Polsko</title>
    <ns>0</ns>
    <revision><text>#REDIRECT [[Polska]]</text></revision>
  </page>
  <page>
    <title>Talk:Ignored</title>
    <ns>1</ns>
    <revision><text>[[Should not appear]]</text></revision>
  </page>
</mediawiki>
"""


def test_parse_export_xml_plain_and_bz2():
    from wikilinks_ray.sources.xml_dump import parse_export_xml

    for payload in (EXPORT.encode(), bz2.compress(EXPORT.encode())):
        pages = parse_export_xml(payload)
        assert [t for t, _ in pages] == ["Gdańsk", "Polska", "Polsko"]
        assert pages[2][1].startswith("#REDIRECT")


def test_read_xml_dump_to_graph(ray_session, tmp_path):
    from wikilinks_ray.pipelines.build import build_graph
    from wikilinks_ray.sources.xml_dump import read_xml_dump

    dump = tmp_path / "dump.xml"
    dump.write_text(EXPORT, encoding="utf-8")
    pages = read_xml_dump(str(dump))
    rows = pages.take_all()
    assert len(rows) == 3  # ns!=0 filtered (M1)
    assert {r["url"].rsplit("/", 1)[-1] for r in rows} == \
        {"Gda%C5%84sk", "Polska", "Polsko"}

    res = build_graph(pages, str(tmp_path / "g"), num_partitions=2,
                      extract_concurrency=2)
    vp = res.vertices().to_pandas()
    id_of = dict(zip(vp["title"], vp["id"]))
    ep = res.edges().to_pandas()
    es = set(zip(ep["src"], ep["dst"]))
    assert (id_of["Gdańsk"], id_of["Polska"]) in es
    assert (id_of["Polsko"], id_of["Polska"]) in es  # redirect edge
    # [[morze]] capitalizes to Morze, which doesn't exist -> dropped
    assert res.stats.null_article_link_occurrences == 1


def test_order_independent_timestamps(ray_session, tmp_path):
    from wikilinks_ray.sources.xml_dump import read_xml_dump

    d1 = tmp_path / "a.xml"
    d1.write_text(EXPORT, encoding="utf-8")
    ts1 = {r["url"]: r["warc_ts"] for r in read_xml_dump(str(d1)).take_all()}
    # same pages in reversed order -> identical timestamps (content-derived)
    head, _, rest = EXPORT.partition("<page>")
    blocks = ["<page>" + b for b in ("<page>" + rest).split("<page>") if b.strip()]
    tail_idx = blocks[-1].rindex("</mediawiki>")
    blocks[-1], tail = blocks[-1][:tail_idx], blocks[-1][tail_idx:]
    reordered = head + "".join(reversed(blocks)) + tail
    d2 = tmp_path / "b.xml"
    d2.write_text(reordered, encoding="utf-8")
    ts2 = {r["url"]: r["warc_ts"] for r in read_xml_dump(str(d2)).take_all()}
    assert ts1 == ts2
    assert len(ts1) == 3


def _big_export(n_pages: int) -> bytes:
    body = "".join(
        f"<page><title>P{i}</title><ns>0</ns>"
        f"<revision><text>Body {i}. [[P{(i + 1) % n_pages}]] "
        + ("filler words " * 40)
        + "</text></revision></page>"
        for i in range(n_pages))
    return (('<mediawiki xmlns="http://www.mediawiki.org/xml/'
             'export-0.10/"><siteinfo><sitename>t</sitename></siteinfo>')
            + body + "</mediawiki>").encode()


def test_iter_export_pages_is_incremental():
    """The parser must yield pages BEFORE consuming the whole source —
    the old fallback slurped `bz2.decompress(f.read())`, OOM-prone on a
    100 GB single-stream dump. Proof: a counting reader sees far less
    than the full payload when the first page arrives, and the parse
    holds no more than a handful of live elements at any point (spent
    <page> subtrees are detached from the iterparse root)."""
    from wikilinks_ray.sources.xml_dump import iter_export_pages

    payload = _big_export(4000)

    class Counting:
        def __init__(self, data):
            self.data = data
            self.pos = 0

        def read(self, n=-1):
            if n < 0:
                n = len(self.data) - self.pos
            out = self.data[self.pos:self.pos + n]
            self.pos += len(out)
            return out

    src = Counting(payload)
    gen = iter_export_pages(src)
    first = next(gen)
    assert first[0] == "P0"
    assert src.pos < len(payload) / 10  # first page, not the whole dump
    rest = list(gen)
    assert len(rest) == 3999
    assert rest[-1][0] == "P3999"


def test_singlestream_bz2_streams_through_ray(ray_session, tmp_path):
    """A plain bzip2-ed export (ONE stream: no sidecar index, no
    interior stream magics) takes the streaming path: bounded blocks of
    _SINGLESTREAM_BATCH pages, same rows as the multifile byte path."""
    from wikilinks_ray.sources import xml_dump as xd

    n = 4500  # > 2 blocks at the 2000-page batch size
    dump = tmp_path / "single.xml.bz2"
    dump.write_bytes(bz2.compress(_big_export(n)))
    assert len(xd.multistream_ranges(str(dump))) == 1  # truly one stream

    ds = xd.read_xml_dump(str(dump))
    rows = ds.take_all()
    assert len(rows) == n
    assert {r["url"].rsplit("/", 1)[-1] for r in rows} == \
        {f"P{i}" for i in range(n)}
    # streamed in bounded pieces: the generator emits ceil(4500/2000)=3
    # tables of <= _SINGLESTREAM_BATCH rows each (Ray may later coalesce
    # blocks, so assert at the generator level)
    import pyarrow as pa

    batch = pa.table({"path": pa.array([str(dump)])})
    sizes = [t.num_rows for t in xd._stream_dump_files(batch)]
    assert sizes == [2000, 2000, 500]

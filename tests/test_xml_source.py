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

"""Multistream bz2 dump splitting (S3-S5): sidecar-index parsing
(WikiReader.kt:117-163), magic scanning (WikiReader.kt:178-224), and
parallel range decompression equal to a single-stream parse
(WikiReaderTest analog: same pages whichever read path runs)."""

from __future__ import annotations

import bz2
import os
from xml.sax.saxutils import escape

import pytest

from wikilinks_ray.sources.xml_dump import (
    multistream_ranges,
    parse_export_xml,
    parse_index_ranges,
    read_xml_dump,
    scan_bz2_stream_offsets,
    sidecar_index_path,
)

XMLNS = "http://www.mediawiki.org/xml/export-0.10/"


def _page_xml(title: str, text: str, ns: int = 0) -> str:
    return (f"<page><title>{escape(title)}</title><ns>{ns}</ns>"
            f"<revision><text>{escape(text)}</text></revision></page>")


def _pages(n: int) -> list[tuple[str, str]]:
    out = [(f"Stream Page {i:03d}", f"body [[Stream Page {(i+1) % n:03d}]]")
           for i in range(n)]
    out.append(("Gdańsk ms", "unicode [[Polska]]"))
    return out


def make_multistream(dirpath: str, pages, per_stream: int = 10,
                     with_index: bool = True) -> str:
    """Write a multistream dump the way Wikimedia does: an independent
    bz2 stream for the header, one per page group, one for the closing
    tag; plus the offset:id:title sidecar index (one line per page,
    offsets repeating within a stream)."""
    header = f'<mediawiki xmlns="{XMLNS}"><siteinfo><sitename>t</sitename></siteinfo>\n'
    groups = [pages[i:i + per_stream] for i in range(0, len(pages), per_stream)]
    streams = ([header]
               + ["".join(_page_xml(t, x) for t, x in g) for g in groups]
               + ["</mediawiki>\n"])
    blobs = [bz2.compress(s.encode("utf-8")) for s in streams]
    dump = os.path.join(dirpath, "test-pages-articles-multistream.xml.bz2")
    with open(dump, "wb") as f:
        for b in blobs:
            f.write(b)
    if with_index:
        lines = []
        off = len(blobs[0])
        pid = 1
        for gi, g in enumerate(groups):
            for t, _ in g:
                lines.append(f"{off}:{pid}:{t}")
                pid += 1
            off += len(blobs[gi + 1])
        with open(sidecar_index_path(dump), "wb") as f:
            f.write(bz2.compress("\n".join(lines).encode("utf-8")))
    return dump


def test_index_and_magic_scan_agree(tmp_path):
    dump = make_multistream(str(tmp_path), _pages(35), per_stream=10)
    via_index = multistream_ranges(dump)
    os.remove(sidecar_index_path(dump))
    via_scan = multistream_ranges(dump)
    # the index doesn't list the trailer stream, so its LAST range spans
    # trailer bytes too (two concatenated bz2 streams — bz2.decompress
    # handles that); the magic scan sees the trailer as its own range.
    assert len(via_scan) == len(via_index) + 1
    assert via_scan[:-2] == via_index[:-1]
    assert via_index[-1] == (via_scan[-2][0], via_scan[-1][1])
    assert len(via_index) == 1 + 4  # header + 4 page groups (+trailer tail)
    # ranges tile the file exactly
    for rs in (via_index, via_scan):
        assert rs[0][0] == 0
        assert rs[-1][1] == os.path.getsize(dump)
        for (s1, e1), (s2, _e2) in zip(rs, rs[1:]):
            assert e1 == s2


def test_multistream_read_equals_singlestream(ray_session, tmp_path):
    pages = _pages(35)
    dump = make_multistream(str(tmp_path), pages, per_stream=10)
    ranges = multistream_ranges(dump)
    assert len(ranges) > 2  # really parallel: one task per substream
    got = read_xml_dump(dump).to_pandas().sort_values("url").reset_index(drop=True)

    single = os.path.join(str(tmp_path), "single.xml")
    header = f'<mediawiki xmlns="{XMLNS}"><siteinfo><sitename>t</sitename></siteinfo>\n'
    with open(single, "w", encoding="utf-8") as f:
        f.write(header + "".join(_page_xml(t, x) for t, x in pages)
                + "</mediawiki>\n")
    want = read_xml_dump(single).to_pandas().sort_values("url").reset_index(drop=True)
    assert got.equals(want)
    assert len(got) == len(pages)


def test_non_main_namespace_dropped_in_fragments(ray_session, tmp_path):
    pages = _pages(12)
    dump = make_multistream(str(tmp_path), pages, per_stream=6, with_index=False)
    # append one extra stream holding a Talk: page (ns=10) — must drop
    with open(dump, "ab") as f:
        f.write(bz2.compress(_page_xml("Talk:X", "chatter", ns=10).encode()))
    got = read_xml_dump(dump).to_pandas()
    assert len(got) == len(pages)
    assert not got["url"].str.contains("Talk").any()


def test_parse_index_ranges_reference_semantics():
    # duplicate offsets collapse; 0 prepended; size closes the last range
    text = "\n".join(["100:1:A", "100:2:B", "", "250:3:C"])
    assert parse_index_ranges(text, 300) == [(0, 100), (100, 250), (250, 300)]
    with pytest.raises(ValueError, match="strictly increasing"):
        parse_index_ranges("100:1:A\n50:2:B", 300)
    with pytest.raises(ValueError, match="out of bounds"):
        parse_index_ranges("400:1:A", 300)
    with pytest.raises(ValueError, match="missing ':'"):
        parse_index_ranges("nonsense", 300)
    assert parse_index_ranges("", 300) == []


def test_reference_szlwiki_index_fixture_parses():
    """The reference ships a real Wikimedia index file — our parser must
    accept it (WikiReader.kt:105-116 reads the same fixture)."""
    fix = ("/root/reference/src/test/resources/"
           "szlwiki-20260201-pages-articles-multistream-index.txt.bz2")
    if not os.path.exists(fix):
        pytest.skip("reference checkout not present")
    with open(fix, "rb") as f:
        text = bz2.decompress(f.read()).decode("utf-8")
    max_off = max(int(line.split(":", 1)[0])
                  for line in text.splitlines() if line.strip())
    ranges = parse_index_ranges(text, max_off + 10_000)
    assert ranges and ranges[0][0] == 0
    assert all(e > s for s, e in ranges)
    assert all(r1[1] == r2[0] for r1, r2 in zip(ranges, ranges[1:]))
    assert len(ranges) > 1  # a real dump has many substreams


def test_magic_scanner_no_false_positive_on_block_magic():
    # an interior block header ('1AY&SY' without 'BZh') must not match
    blob = bz2.compress(b"some payload " * 100)
    offs = scan_bz2_stream_offsets(blob + b"1AY&SY" + blob)
    assert offs.tolist() == [0, len(blob) + 6]

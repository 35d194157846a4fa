"""HTML href extraction (ops/html_links.py): unit semantics + the
differential gold — the html-derived edge set must equal the wikitext
walk's article edges on the same corpus."""

from __future__ import annotations

import pandas as pd
import pytest

from wikilinks_ray.ops.html_links import html_link_edges, html_page_links


class TestHtmlPageLinks:
    def test_basic_and_piped(self):
        h = (b'<html><head><title>Src</title></head><body>'
             b'x <a href="/wiki/Plain Page">link</a> '
             b'y <a href="/wiki/Target|an anchor">link</a>'
             b'</body></html>')
        assert html_page_links(h) == ("Src", ["Plain Page", "Target"])

    def test_redirect_page_yields_nothing(self):
        h = (b'<html><head><title>R</title></head><body>'
             b'#REDIRECT <a href="/wiki/T">link</a></body></html>')
        assert html_page_links(h) == ("R", [])

    def test_dedup_and_capitalize(self):
        h = (b'<html><head><title>S</title></head><body>'
             b'<a href="/wiki/abc">link</a> <a href="/wiki/Abc">link</a>'
             b'</body></html>')
        assert html_page_links(h) == ("S", ["Abc"])

    def test_external_hrefs_ignored(self):
        h = (b'<html><head><title>S</title></head><body>'
             b'<a href="https://example.com/x">link</a>'
             b'<a href="/wiki/Kept">link</a></body></html>')
        assert html_page_links(h) == ("S", ["Kept"])


@pytest.fixture(scope="module")
def built(ray_session, small_corpus):
    _table, _spec, res = small_corpus
    return res


def _article_edges(res) -> set[tuple[int, int]]:
    """Wikitext-path edges whose src is NOT a redirect (redirect
    single-edges are packPages artifacts the html side doesn't emit)."""
    v = res.vertices().to_pandas()
    rd_ids = set(v[v["is_redirect"]]["id"].tolist())
    e = res.edges().to_pandas()
    return {(int(s), int(d)) for s, d in zip(e["src"], e["dst"])
            if int(s) not in rd_ids}


def test_html_edges_equal_wikitext_article_edges(built, small_corpus):
    table, _spec, res = small_corpus
    import ray.data as rd

    pages = rd.from_arrow(table)
    got = html_link_edges(pages, res.vertices())
    gdf = got.to_pandas()
    got_set = {(int(s), int(d)) for s, d in zip(gdf["src"], gdf["dst"])}
    assert got_set == _article_edges(res)


def test_join_fallback_identical(built, small_corpus):
    table, _spec, res = small_corpus
    import ray.data as rd

    pages = rd.from_arrow(table)
    a = html_link_edges(pages, res.vertices()).to_pandas()
    b = html_link_edges(pages, res.vertices(), title_broadcast_limit=0,
                        num_partitions=4).to_pandas()
    key = lambda df: sorted(map(tuple, df[["src", "dst"]].to_numpy().tolist()))
    assert key(a) == key(b)

"""Property-based tests (hypothesis) for the frozen kernels — the
reference's randomized-differential strategy (IntQueueTest.kt:44-67,
RouteFinderTest.kt) applied to our pure functions."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from wikilinks_ray.functions.wikitext import (
    capitalize_first,
    normalize_link_target,
    parse_wikitext,
)

titles = st.text(
    alphabet=st.characters(blacklist_characters="[]|#_",
                           blacklist_categories=("Cs",)),
    min_size=1, max_size=30,
).map(str.strip).filter(lambda s: s and normalize_link_target(s) is not None)


@given(st.text(max_size=500))
@settings(max_examples=200)
def test_parse_never_crashes_and_dedups(text):
    is_r, tgt, links = parse_wikitext(text)
    assert len(links) == len(set(links))
    for l in links:
        assert l == capitalize_first(l)
        assert l.strip() == l and l != ""
    if is_r:
        assert links == ([tgt] if tgt else [])


@given(st.lists(titles, min_size=0, max_size=20))
@settings(max_examples=100)
def test_render_parse_round_trip(names):
    """Rendering [[name]] links and re-parsing yields the normalized,
    order-preserving dedup of the names."""
    text = "intro " + " ".join(f"word [[{n}]]" for n in names) + " end"
    _is_r, _t, links = parse_wikitext(text)
    want, seen = [], set()
    for n in names:
        c = normalize_link_target(n)
        if c is not None and c not in seen:
            seen.add(c)
            want.append(c)
    assert links == want


@given(st.text(min_size=0, max_size=50))
@settings(max_examples=200)
def test_capitalize_first_idempotent(s):
    assert capitalize_first(capitalize_first(s)) == capitalize_first(s)


@given(st.lists(st.integers(0, 10**12), min_size=1, max_size=500),
       st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=500))
@settings(max_examples=50, deadline=None)
def test_rle_reduce_matches_pandas(keys, vals):
    import pandas as pd

    from wikilinks_ray.stages.agg import _rle_reduce

    m = min(len(keys), len(vals))
    k = np.array(keys[:m], dtype=np.int64)
    v = np.array(vals[:m], dtype=np.int64)
    for op, fn in (("sum", "sum"), ("min", "min")):
        out_keys, out_vals = _rle_reduce([k], v, op)
        want = getattr(pd.Series(v).groupby(k), fn)().sort_index()
        assert out_keys[0].tolist() == want.index.tolist()
        assert out_vals.tolist() == want.tolist()


@given(st.lists(st.text(min_size=1, max_size=12), min_size=2, max_size=50,
                unique=True))
@settings(max_examples=50)
def test_utf8_rank_matches_python_sort(names):
    """The id-assignment premise: python/pandas string order == unsigned
    byte order of UTF-8 (Arrow's comparator)."""
    by_str = sorted(names)
    by_bytes = sorted(names, key=lambda s: s.encode("utf-8"))
    assert by_str == by_bytes


@given(st.lists(st.sampled_from(
    ["[[", "]]", "|", "#", "{{", "}}", "<!--", "-->", "<nowiki>",
     "</nowiki>", "Alpha", "beta", "File:x", " ", "_"]), max_size=30))
@settings(max_examples=200)
def test_wikitext_parser_total_on_adversarial_markup(parts):
    """parse_wikitext must be total (never raise, always terminate) on
    arbitrary bracket/template/comment soup, and its outputs keep the
    frozen invariants: deduped, first-char-capitalized, non-empty."""
    from wikilinks_ray.functions.wikitext import parse_wikitext

    text = "".join(parts)
    is_r, tgt, links = parse_wikitext(text)
    assert isinstance(links, list)
    assert len(links) == len(set(links))
    for l in links:
        assert l == l.strip() and l != ""
        assert not l[0].islower()
    if is_r and tgt is not None:
        assert links == [tgt]


# ---- round-5 additions: pure-kernel properties -----------------------

from wikilinks_ray.functions.wikitext import link_anchor_pairs


@given(st.text(max_size=500))
@settings(max_examples=200)
def test_anchor_pairs_never_crash_and_align_with_parse(text):
    """Anchor occurrences project onto the link walk: the ordered
    first-occurrence dedup of anchor-pair targets equals parse_wikitext's
    links on non-redirect pages; targets are normalized."""
    pairs = link_anchor_pairs(text)
    is_r, _t, links = parse_wikitext(text)
    if is_r:
        assert pairs == []
        return
    seen, ordered = set(), []
    for tgt, _anchor in pairs:
        assert tgt == capitalize_first(tgt) and tgt.strip() == tgt and tgt
        if tgt not in seen:
            seen.add(tgt)
            ordered.append(tgt)
    assert ordered == links


@given(st.lists(
    st.tuples(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                      max_size=40),
              st.binary(max_size=200)),
    min_size=0, max_size=8))
@settings(max_examples=100)
def test_warc_framing_round_trip(records):
    """Arbitrary (url, body) records — including bodies embedding the
    CRLFCRLF separator — survive framing + parsing byte-for-byte."""
    from wikilinks_ray.sources.warc import _record, iter_warc_records

    # header values are CRLF-unsafe and whitespace-stripped on parse
    # (WARC field grammar), so normalize the expectation the same way
    urls = [u.replace("\r", " ").replace("\n", " ").strip()
            for u, _ in records]
    blob = b"".join(_record(u, i, b)
                    for i, (u, (_, b)) in enumerate(zip(urls, records)))
    got = list(iter_warc_records(blob))
    assert [h["WARC-Target-URI"] for h, _ in got] == urls
    for (_, want_body), (h, body) in zip(records, got):
        assert body.endswith(want_body)
        assert len(body) == int(h["Content-Length"])

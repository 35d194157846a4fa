"""Anchor-text aggregation (ops/anchors.py + functions.wikitext
.link_anchor_pairs) — semantics pinned against the wiki_anchors SQL
oracle twin (pipelines/flagship.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from wikilinks_ray.functions.wikitext import link_anchor_pairs


class TestLinkAnchorPairs:
    def test_piped_and_plain(self):
        text = "see [[Target Page|a label]] and [[other page]]."
        assert link_anchor_pairs(text) == [
            ("Target Page", "a label"),
            ("Other page", "other page"),  # target capitalizes, anchor as written
        ]

    def test_section_kept_in_default_anchor(self):
        # [[A#B]] links to A but *displays* A#B
        assert link_anchor_pairs("[[Alpha#History]]") == [("Alpha", "Alpha#History")]

    def test_redirect_page_contributes_nothing(self):
        assert link_anchor_pairs("#REDIRECT [[Somewhere|x]]") == []

    def test_occurrences_not_deduped(self):
        text = "[[A|one]] [[A|one]] [[A|two]] [[A]]"
        assert link_anchor_pairs(text) == [
            ("A", "one"), ("A", "one"), ("A", "two"), ("A", "A")]

    def test_anchor_is_after_first_pipe_only(self):
        # everything after the FIRST pipe is the anchor, later pipes verbatim
        assert link_anchor_pairs("[[T|a|b]]") == [("T", "a|b")]

    def test_empty_target_dropped(self):
        assert link_anchor_pairs("[[|anchor]] [[ #sec ]]") == []

    def test_nested_link_yields_outer_and_inner(self):
        text = "[[File:x.png|caption with [[Inner]] link]]"
        pairs = link_anchor_pairs(text)
        assert ("File:x.png", "caption with [[Inner]] link") in pairs
        assert ("Inner", "Inner") in pairs

    def test_templates_contribute_no_anchors(self):
        assert link_anchor_pairs("{{box|[[Hidden|h]]}} [[Seen]]") == [
            ("Seen", "Seen")]


@pytest.fixture(scope="module")
def tiny_graph(ray_session):
    import ray.data as rd

    pages = rd.from_items([
        {"url": "u0", "text": "[[B|best page]] and [[B|best page]] plus [[B|other]] [[C]]"},
        {"url": "u1", "text": "[[b|lower target]] [[C|see c]] [[Missing|gone]]"},
        {"url": "u2", "text": "#REDIRECT [[B]]"},
        {"url": "u3", "text": "[[A]]"},
    ])
    vertices = rd.from_items([
        {"id": 0, "title": "A"},
        {"id": 1, "title": "B"},
        {"id": 2, "title": "C"},
    ])
    return pages, vertices


EXPECTED = pd.DataFrame({
    "dst": [0, 1, 2],
    "occurrences": [1, 4, 2],
    "n_distinct_anchors": [1, 3, 2],
    # B: 'best page' x2 beats 'lower target'/'other' x1; C ties 'C'/'see c'
    # at 1 -> lexicographic min 'C'
    "top_anchor": ["A", "best page", "C"],
    "top_count": [1, 2, 1],
})


class TestAnchorStats:
    def _run(self, pages, vertices, **kw):
        from wikilinks_ray.ops.anchors import anchor_stats

        df = anchor_stats(pages, vertices, **kw).to_pandas()
        return df.sort_values("dst").reset_index(drop=True)[EXPECTED.columns]

    def test_broadcast_path(self, tiny_graph):
        pages, vertices = tiny_graph
        pd.testing.assert_frame_equal(
            self._run(pages, vertices).astype(EXPECTED.dtypes),
            EXPECTED)

    def test_hash_join_fallback_identical(self, tiny_graph):
        # title_broadcast_limit=0 forces the join path; same rows
        pages, vertices = tiny_graph
        pd.testing.assert_frame_equal(
            self._run(pages, vertices, title_broadcast_limit=0,
                      num_partitions=2).astype(EXPECTED.dtypes),
            EXPECTED)


def test_bucket_count_invariance(tiny_graph):
    from wikilinks_ray.ops.anchors import anchor_stats

    pages, vertices = tiny_graph
    def run(**kw):
        df = anchor_stats(pages, vertices, **kw).to_pandas()
        return df.sort_values("dst").reset_index(drop=True)
    pd.testing.assert_frame_equal(run(num_buckets=2), run(num_buckets=64))

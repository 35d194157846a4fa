"""Graph-build tests: redirect-loop elimination, vertex/edge golden
checks, dense-id properties, statistics (reference analogs:
WikiLinksTest.kt:57-136, WikiProcessorTest.kt, RouteIntegrationTest.kt)."""

from __future__ import annotations

import numpy as np

from wikilinks_ray.functions.wikitext import capitalize_first
from tests.test_extract import expected_extraction


def test_loop_redirects_dropped_exactly(small_corpus):
    _table, spec, res = small_corpus
    vp = res.vertices().to_pandas()
    # dropRedirectLoops semantics (WikiProcessor.kt:133-172): cycles AND
    # chains exiting at a title with no PagePointer are dropped
    assert set(spec.titles) - set(vp["title"]) == spec.dropped_redirects
    assert res.stats.n_redirects_dropped == len(spec.dropped_redirects)


def test_dense_ids_are_sorted_title_rank(small_corpus):
    _table, _spec, res = small_corpus
    vp = res.vertices().to_pandas().sort_values("id").reset_index(drop=True)
    assert (vp["id"].to_numpy() == np.arange(len(vp))).all()
    titles = vp["title"].tolist()
    assert [t.encode() for t in titles] == sorted(t.encode() for t in titles)


def test_golden_routes_edges_present(small_corpus):
    # planted RouteIntegrationTest.kt:37-63 analogs
    _table, _spec, res = small_corpus
    vp = res.vertices().to_pandas()
    id_of = dict(zip(vp["title"], vp["id"]))
    ep = res.edges().to_pandas()
    es = set(zip(ep["src"].tolist(), ep["dst"].tolist()))
    assert (id_of["Gdańsk"], id_of["Polska"]) in es
    assert (id_of["Polska"], id_of["Polsko"]) in es
    # redirect keeps exactly one out-edge, to its immediate target
    po = id_of["Polsko"]
    assert [d for s, d in es if s == po] == [id_of["Bałtycke Morze"]]


def test_redirect_to_unknown_title_dropped(small_corpus):
    """A redirect to a title that is neither a page nor any article's
    link target has no PagePointer in the reference's map — endSomewhere
    returns false and the redirect is dropped (WikiProcessor.kt:162-164)."""
    _table, spec, res = small_corpus
    assert spec.noexit_redirects  # generator plants one
    vp = res.vertices().to_pandas()
    for t in spec.noexit_redirects:
        assert t not in set(vp["title"])


def test_redirect_to_linked_missing_title_survives_with_zero_edges(small_corpus):
    """A redirect to a MISSING title that some article links to has a
    PagePointer with a null page — endSomewhere's non-redirect branch
    returns true, and packPages emits it with zero links
    (WikiProcessor.kt:232-238)."""
    _table, spec, res = small_corpus
    assert spec.ghost_redirects  # generator plants one
    vp = res.vertices().to_pandas()
    id_of = dict(zip(vp["title"], vp["id"]))
    ep = res.edges().to_pandas()
    out_deg = ep.groupby("src").size()
    for t in spec.ghost_redirects:
        assert t in id_of
        assert out_deg.get(id_of[t], 0) == 0


def test_edges_match_spec_exactly(small_corpus):
    """Full golden edge set derived from the corpus spec."""
    _table, spec, res = small_corpus
    vp = res.vertices().to_pandas()
    id_of = dict(zip(vp["title"], vp["id"]))
    surviving = set(vp["title"])
    expected = set()
    for title in spec.titles:
        if title not in surviving:
            continue
        _is_r, _tgt, links = expected_extraction(spec, title)
        for l in links:
            if l in surviving:
                expected.add((id_of[title], id_of[l]))
    ep = res.edges().to_pandas()
    got = set(zip(ep["src"].tolist(), ep["dst"].tolist()))
    assert got == expected


def test_statistics_golden(small_corpus):
    _table, spec, res = small_corpus
    surviving = set(spec.titles) - spec.dropped_redirects
    n_articles = sum(1 for t in spec.titles if t not in spec.redirects)
    occ = 0
    resolved = 0
    for t in spec.titles:
        if t in spec.redirects:
            continue
        _, _, links = expected_extraction(spec, t)
        occ += len(links)
        resolved += sum(1 for l in links if l in surviving)
    s = res.stats
    assert s.n_articles == n_articles
    assert s.n_redirects_before == len(spec.redirects)
    assert s.article_link_occurrences == occ
    assert s.resolved_article_links == resolved
    assert s.null_article_link_occurrences == occ - resolved
    assert s.n_vertices == len(surviving)


def test_parquet_round_trip_fixpoint(small_corpus, tmp_path):
    # serialize->deserialize fixpoint (WikiLinksTest.kt:139-190 analog)
    import pyarrow.parquet as pq
    import pyarrow as pa

    _table, _spec, res = small_corpus
    e = res.edges().to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    t = pa.Table.from_pandas(e)
    for cycle in range(3):
        p = str(tmp_path / f"rt{cycle}.parquet")
        pq.write_table(t, p)
        t = pq.read_table(p)
    assert t.to_pandas().equals(e)


def test_distributed_redirect_fixpoint_matches_local(ray_session, small_corpus):
    """Force the pointer-doubling path; must equal the driver-side result."""
    import ray.data as rd

    from wikilinks_ray.pipelines.build import (
        find_redirect_loop_members,
        _loop_members_local,
    )
    from wikilinks_ray.stages.extract import extract_pages_meta
    from wikilinks_ray.pipelines.build import _filter_expr

    from wikilinks_ray.stages.extract import extract_combined, split_combined
    from wikilinks_ray.pipelines.build import find_unknown_exit_titles

    table, spec, _res = small_corpus
    combined = rd.from_arrow(table).map_batches(extract_combined,
                                                batch_format="pyarrow",
                                                concurrency=2)
    meta, links = split_combined(combined)
    meta = meta.materialize()
    redirects = _filter_expr(meta, "is_redirect", True)
    unknown = find_unknown_exit_titles(redirects, meta, links.materialize())
    assert unknown == {"Missing Redirect Target"}
    dist = find_redirect_loop_members(redirects, num_partitions=4,
                                      driver_side_limit=0,
                                      unknown_exits=unknown)
    got = {r["src"] for r in dist.take_all()}
    assert got == spec.dropped_redirects


def test_build_differential_configs(ray_session, small_corpus, tmp_path):
    """WikiReaderTest.kt:238-285 analog at the build level: different
    parallelism configs must produce identical vertices/edges/stats
    (content-derived ids make block order irrelevant)."""
    import ray.data as rd

    from wikilinks_ray.pipelines.build import build_graph

    table, _spec, base_res = small_corpus
    for blocks, parts, conc in ((4, 2, 2), (16, 6, 3)):
        ds = rd.from_arrow(table).repartition(blocks)
        res = build_graph(ds, str(tmp_path / f"d{blocks}"),
                          num_partitions=parts, extract_concurrency=conc,
                          overwrite=True)
        assert res.stats == base_res.stats
        vp = res.vertices().to_pandas().sort_values("id").reset_index(drop=True)
        vb = base_res.vertices().to_pandas().sort_values("id").reset_index(drop=True)
        assert vp[["id", "title", "is_redirect"]].equals(
            vb[["id", "title", "is_redirect"]])
        ep = set(map(tuple, res.edges().to_pandas().values))
        eb = set(map(tuple, base_res.edges().to_pandas().values))
        assert ep == eb

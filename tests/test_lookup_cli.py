"""VertexIndex (J2-J4, O3, O4) and route-benchmark (Q5) tests."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def index(ray_session, small_corpus):
    from wikilinks_ray.state.lookup import VertexIndex

    _table, _spec, res = small_corpus
    idx = VertexIndex(res.vertices_path, res.stats.n_vertices, num_shards=3)
    yield idx, res
    idx.close()


def test_point_lookup(index):
    idx, res = index
    vp = res.vertices().to_pandas()
    for _, row in vp.sample(20, random_state=7).iterrows():
        assert idx.lookup(row["title"]) == row["id"]
    assert idx.lookup("No Such Page") is None
    assert idx.lookup("Gdańsk") is not None


def test_prefix_search_bounded_and_ordered(index):
    idx, res = index
    vp = res.vertices().to_pandas()
    want = sorted(t for t in vp["title"] if t.startswith("Page 001"))[:10]
    got = [t for _, t in idx.prefix_search("Page 001", 10)]
    assert got == want
    # max-K semantics (WikiRoutes.kt:74-87)
    assert len(idx.prefix_search("Page", 10)) == 10
    assert idx.prefix_search("ZZZ no match", 10) == []
    # prefix spanning shard boundaries still complete
    all_pages = [t for _, t in idx.prefix_search("Page", 10_000)]
    assert all_pages == sorted(t for t in vp["title"] if t.startswith("Page"))


def test_title_of_and_random(index):
    idx, res = index
    vp = res.vertices().to_pandas()
    m = dict(zip(vp["id"], vp["title"]))
    for vid in (0, 1, len(m) // 2, len(m) - 1):
        assert idx.title_of(vid) == m[vid]
    rng = np.random.default_rng(0xCAFEBABE)
    vid, title = idx.random_vertex(rng)
    assert m[vid] == title
    # seeded -> reproducible (Benchmarking.java:16 semantics)
    rng2 = np.random.default_rng(0xCAFEBABE)
    assert idx.random_vertex(rng2) == (vid, title)


def test_route_benchmark_pinned_corpus(ray_session, index, tmp_path):
    """runBenchmarksAndTest analog (Benchmarking.java:87-138): the
    pinned 50-pair corpus (networkx-oracled shortest-path lengths over
    the seeded 300-page corpus) must reproduce exactly — the benchmark
    doubles as a correctness gate, for BOTH route finders."""
    import os

    from wikilinks_ray.cli import route_benchmark
    from wikilinks_ray.state.csr import create_shard_actors, shard_edges

    idx, res = index
    n = res.stats.n_vertices
    corpus = os.path.join(os.path.dirname(__file__), "fixtures",
                          "route_corpus.json")
    fwd, _ = create_shard_actors(
        shard_edges(res.edges(), n, 3, str(tmp_path / "pf"), by="src"), n)
    rev, _ = create_shard_actors(
        shard_edges(res.edges(), n, 3, str(tmp_path / "pr"), by="dst"), n,
        key="dst")
    uni = route_benchmark(fwd, n, idx, check_corpus=corpus)
    assert uni["pairs"] == 50 and uni["wrong"] == 0, uni["mismatches"]
    bidi = route_benchmark(fwd, n, idx, rev_actors=rev, check_corpus=corpus)
    assert bidi["pairs"] == 50 and bidi["wrong"] == 0, bidi["mismatches"]


def test_route_benchmark_welford(ray_session, small_corpus, index, tmp_path):
    from wikilinks_ray.cli import route_benchmark
    from wikilinks_ray.state.csr import create_shard_actors, shard_edges

    idx, res = index
    n = res.stats.n_vertices
    actors, _ = create_shard_actors(
        shard_edges(res.edges(), n, 3, str(tmp_path / "fwd"), by="src"), n)
    stats = route_benchmark(actors, n, idx, n_pairs=5, seed=0xCAFEBABE)
    assert stats["pairs"] == 5
    assert 0 <= stats["found"] <= 5
    assert stats["min_ms"] <= stats["mean_ms"] <= stats["max_ms"]
    import ray

    for a in actors:
        ray.kill(a)

"""Bidirectional BFS vs unidirectional + networkx oracle
(RouteFinderTest.kt:41-72 pattern: random digraphs, length-only)."""

from __future__ import annotations

import numpy as np
import pytest

from wikilinks_ray.pipelines.bidirectional import bidirectional_route
from wikilinks_ray.state.csr import create_shard_actors, shard_edges
from tests.test_graph_algorithms import random_digraph, edges_ds


@pytest.fixture(scope="module")
def bidi_graph(ray_session, tmp_path_factory):
    n = 300
    pairs = random_digraph(n, 1200, seed=23)
    ds = edges_ds(pairs)
    d = tmp_path_factory.mktemp("bidi")
    fwd, _ = create_shard_actors(shard_edges(ds, n, 3, str(d / "fwd"), by="src"), n)
    rev, _ = create_shard_actors(
        shard_edges(ds, n, 3, str(d / "rev"), by="dst"), n, key="dst")
    yield n, pairs, fwd, rev
    import ray

    for a in fwd + rev:
        ray.kill(a)


def test_bidirectional_lengths_match_oracle(bidi_graph):
    import networkx as nx

    n, pairs, fwd, rev = bidi_graph
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    eset = {(int(a), int(b)) for a, b in pairs}
    rng = np.random.default_rng(5)
    checked = 0
    for _ in range(15):
        s, t = int(rng.integers(n)), int(rng.integers(n))
        route = bidirectional_route(fwd, rev, n, s, t)
        try:
            want = nx.shortest_path_length(g, s, t)
        except nx.NetworkXNoPath:
            assert route is None, (s, t)
            continue
        assert route is not None, (s, t)
        assert len(route) - 1 == want, (s, t)
        assert route[0] == s and route[-1] == t
        for a, b in zip(route, route[1:]):
            assert (a, b) in eset
        checked += 1
    assert checked >= 5


def test_bidirectional_trivial_cases(bidi_graph):
    n, pairs, fwd, rev = bidi_graph
    assert bidirectional_route(fwd, rev, n, 7, 7) == [7]
    # direct edge
    a, b = int(pairs[0][0]), int(pairs[0][1])
    if a != b:
        r = bidirectional_route(fwd, rev, n, a, b)
        assert r is not None and len(r) == 2 and r == [a, b]

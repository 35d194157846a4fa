"""k-truss: fixpoint vs networkx, cascade behavior, empty truss,
broadcast vs materialized-wedge path identity."""

from __future__ import annotations

import numpy as np
import pytest

from wikilinks_ray.pipelines.truss import k_truss


def _edge_set(res):
    df = res.edges.to_pandas()
    if not len(df):
        return set()
    return set(map(tuple, df[["lo", "hi"]].to_numpy().tolist()))


def _nx_truss(src, dst, k):
    nx = pytest.importorskip("networkx")
    g = nx.Graph()
    g.add_edges_from(zip(src, dst))
    g.remove_edges_from(nx.selfloop_edges(g))
    t = nx.k_truss(g, k)
    return {(min(a, b), max(a, b)) for a, b in t.edges()}


@pytest.fixture(scope="module")
def corpus_edges(ray_session, small_corpus):
    _table, _spec, res = small_corpus
    ep = res.edges().to_pandas()
    return res.edges(), ep["src"].to_numpy(), ep["dst"].to_numpy()


@pytest.mark.parametrize("k", [3, 4, 5])
def test_truss_matches_networkx(corpus_edges, k):
    ds, src, dst = corpus_edges
    res = k_truss(ds, k)
    assert res.converged
    assert _edge_set(res) == _nx_truss(src, dst, k)


def test_cascade_peels_in_rounds(ray_session):
    # 5-clique + a triangle hanging off it: 4-truss drops the triangle's
    # outside edges first, then its last edge — a genuine cascade
    import ray.data as rd

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    extra = [(4, 5), (4, 6), (5, 6)]
    edges = clique + extra
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    res = k_truss(ds, 4)
    assert res.converged
    assert _edge_set(res) == set(clique)
    assert res.rounds >= 2  # the pendant triangle needed a cascade
    assert _edge_set(res) == _nx_truss(*zip(*edges), 4)


def test_empty_truss_keeps_schema(ray_session):
    import ray.data as rd

    # one triangle cannot satisfy k=5 (needs support 3)
    ds = rd.from_items([{"src": a, "dst": b}
                        for a, b in [(0, 1), (1, 2), (0, 2)]])
    res = k_truss(ds, 5)
    assert res.converged
    # NB: Dataset.to_pandas() drops columns for empty datasets; the
    # schema is the stable surface
    assert res.edges.schema().names == ["lo", "hi"]
    assert res.edges.count() == 0


def test_materialized_wedge_path_identical(corpus_edges):
    ds, src, dst = corpus_edges
    base = _edge_set(k_truss(ds, 4))
    forced = _edge_set(k_truss(ds, 4, broadcast_edge_limit=0))
    assert forced == base


def test_k_below_3_rejected(corpus_edges):
    ds, _, _ = corpus_edges
    with pytest.raises(ValueError):
        k_truss(ds, 2)

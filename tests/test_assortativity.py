"""Degree assortativity: exact moment sums (broadcast and join paths
identical) and the derived coefficient vs networkx."""

from __future__ import annotations

import numpy as np
import pytest

from wikilinks_ray.pipelines.assortativity import (
    assortativity_moments,
    coefficient_from_moments,
)


@pytest.fixture(scope="module")
def corpus_edges(ray_session, small_corpus):
    _table, _spec, res = small_corpus
    return res.edges()


def test_moments_match_numpy_and_networkx(corpus_edges):
    mo = assortativity_moments(corpus_edges)
    ep = corpus_edges.to_pandas()
    src = ep["src"].to_numpy()
    dst = ep["dst"].to_numpy()
    n = int(max(src.max(), dst.max())) + 1
    od = np.bincount(src, minlength=n)
    idg = np.bincount(dst, minlength=n)
    x, y = od[src].astype(np.int64), idg[dst].astype(np.int64)
    assert mo == {
        "m": len(src), "sxy": int((x * y).sum()), "sx": int(x.sum()),
        "sy": int(y.sum()), "sx2": int((x * x).sum()),
        "sy2": int((y * y).sum())}

    nx = pytest.importorskip("networkx")
    g = nx.DiGraph()
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.degree_assortativity_coefficient(g, x="out", y="in")
    assert coefficient_from_moments(mo) == pytest.approx(want, rel=1e-9)


def test_join_fallback_identical(corpus_edges):
    base = assortativity_moments(corpus_edges)
    forced = assortativity_moments(corpus_edges, degree_broadcast_limit=0,
                                   num_partitions=4)
    assert forced == base

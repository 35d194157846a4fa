"""Katz centrality: distributed combiner exchange vs a driver-side
dense integer twin (bit-for-bit), attenuation/contraction properties,
and the distributed max-in-degree superstep."""

from __future__ import annotations

import numpy as np
import pytest

from wikilinks_ray.pipelines.katz import katz_int, max_in_degree
from wikilinks_ray.state.csr import create_shard_actors, shard_edges


@pytest.fixture(scope="module")
def fwd_actors(ray_session, small_corpus, tmp_path_factory):
    _table, _spec, res = small_corpus
    n = res.stats.n_vertices
    root = tmp_path_factory.mktemp("katz_csr")
    paths = shard_edges(res.edges(), n, 4, str(root / "fwd"), by="src")
    fwd, _ = create_shard_actors(paths, n)
    yield fwd, n, res
    import ray

    for a in fwd:
        ray.kill(a)


def dense_katz_int(src, dst, n, iters, scale, a_den):
    x = np.full(n, scale, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, x[src])
        x = scale + s // a_den
    return x


def test_max_in_degree_matches_numpy(fwd_actors):
    fwd, n, res = fwd_actors
    ep = res.edges().to_pandas()
    dst = ep["dst"].to_numpy().astype(np.int64)
    expect = int(np.bincount(dst, minlength=n).max())
    assert max_in_degree(fwd, n) == expect


def test_katz_int_exact_vs_dense(fwd_actors):
    fwd, n, res = fwd_actors
    ep = res.edges().to_pandas()
    src = ep["src"].to_numpy().astype(np.int64)
    dst = ep["dst"].to_numpy().astype(np.int64)
    a_den = int(np.bincount(dst, minlength=n).max()) + 1
    scale, iters = 10**9, 10
    got = katz_int(fwd, n, iters=iters, scale=scale)
    ref = dense_katz_int(src, dst, n, iters, scale, a_den)
    assert got.shape == (n,)
    assert (got == ref).all()
    # contraction bound from the module docstring: x_k < (k+1)*scale
    assert got.max() < (iters + 1) * scale
    # beta floor: every vertex keeps at least its own base weight
    assert got.min() >= scale


def test_katz_orders_a_star_center_first(ray_session, tmp_path_factory):
    # star: 0..9 -> 10; the sink has max Katz, leaves are at the floor
    import pyarrow as pa
    import ray.data as rd

    edges = rd.from_arrow(pa.table({
        "src": pa.array(list(range(10)), pa.int64()),
        "dst": pa.array([10] * 10, pa.int64()),
    }))
    n = 11
    root = tmp_path_factory.mktemp("katz_star")
    paths = shard_edges(edges, n, 2, str(root / "fwd"), by="src")
    fwd, _ = create_shard_actors(paths, n)
    try:
        x = katz_int(fwd, n, iters=5)
        assert x[10] > x[0]
        assert (x[:10] == x[0]).all()
    finally:
        import ray

        for a in fwd:
            ray.kill(a)

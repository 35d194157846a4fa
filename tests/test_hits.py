"""HITS tests: distributed cross-pool exchange vs a driver-side dense
integer twin (bit-for-bit), and the scaled-integer fixpoint vs float
L2-normalized HITS (rank agreement)."""

from __future__ import annotations

import numpy as np
import pytest

from wikilinks_ray.pipelines.hits import hits_int
from wikilinks_ray.state.csr import create_shard_actors, shard_edges


@pytest.fixture(scope="module")
def dual_actors(ray_session, small_corpus, tmp_path_factory):
    _table, _spec, res = small_corpus
    n = res.stats.n_vertices
    root = tmp_path_factory.mktemp("hits_csr")
    fwd_paths = shard_edges(res.edges(), n, 4, str(root / "fwd"), by="src")
    rev_paths = shard_edges(res.edges(), n, 4, str(root / "rev"), by="dst")
    fwd, _ = create_shard_actors(fwd_paths, n)
    rev, _ = create_shard_actors(rev_paths, n, key="dst")
    yield fwd, rev, n, res
    import ray

    for a in fwd + rev:
        ray.kill(a)


def dense_hits_int(src, dst, n, iters, scale):
    """Driver-side twin of the distributed recurrence (same floor ops,
    same pending-denominator convention)."""
    h = np.full(n, scale, dtype=np.int64)
    h_denom = 1
    a_un = np.zeros(n, dtype=np.int64)
    a_denom = 1
    for _ in range(iters):
        a_un = np.zeros(n, dtype=np.int64)
        np.add.at(a_un, dst, h[src] // h_denom)
        a_denom = max(1, int(a_un.sum()) // scale)
        h = np.zeros(n, dtype=np.int64)
        np.add.at(h, src, a_un[dst] // a_denom)
        h_denom = max(1, int(h.sum()) // scale)
    return a_un // a_denom, h // h_denom


def test_hits_int_exact_vs_dense(dual_actors):
    fwd, rev, n, res = dual_actors
    scale, iters = 10**9, 10
    auth, hub = hits_int(fwd, rev, n, iters=iters, scale=scale)

    ep = res.edges().to_pandas()
    src = ep["src"].to_numpy().astype(np.int64)
    dst = ep["dst"].to_numpy().astype(np.int64)
    a_ref, h_ref = dense_hits_int(src, dst, n, iters, scale)
    assert (auth == a_ref).all()
    assert (hub == h_ref).all()

    # floor-divided sum normalization bounds totals to [~scale, 2*scale)
    # (total/(total//scale) peaks just under a denominator step)
    assert 0.5 * scale < auth.sum() < 2.0 * scale
    assert 0.5 * scale < hub.sum() < 2.0 * scale


def test_hits_ranks_track_float_l2_fixpoint(dual_actors):
    """Sum vs L2 normalization are scalar rescalings of the same power
    iteration, so the top-k ordering must agree with float HITS run to
    convergence."""
    fwd, rev, n, res = dual_actors
    auth, hub = hits_int(fwd, rev, n, iters=30, scale=10**12)

    ep = res.edges().to_pandas()
    src = ep["src"].to_numpy()
    dst = ep["dst"].to_numpy()
    A = np.zeros((n, n))
    A[src, dst] = 1.0
    a = np.ones(n)
    h = np.ones(n)
    for _ in range(200):
        a = A.T @ h
        a /= np.linalg.norm(a) or 1.0
        h = A @ a
        h /= np.linalg.norm(h) or 1.0
    top_int = set(np.argsort(-auth)[:5])
    top_float = set(np.argsort(-a)[:5])
    assert len(top_int & top_float) >= 4
    top_int_h = set(np.argsort(-hub)[:5])
    top_float_h = set(np.argsort(-h)[:5])
    assert len(top_int_h & top_float_h) >= 4


def test_hits_rejects_mismatched_pools(dual_actors):
    fwd, rev, n, _res = dual_actors
    with pytest.raises(ValueError):
        hits_int(fwd, rev[:2], n)

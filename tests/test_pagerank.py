"""PageRank tests: networkx oracle (allclose 1e-6 per north_rule),
dangling-mass handling, checkpoint/resume identity."""

from __future__ import annotations

import numpy as np
import pytest

from wikilinks_ray.state.csr import shard_edges, create_shard_actors
from wikilinks_ray.pipelines.pagerank import pagerank


@pytest.fixture(scope="module")
def graph_actors(ray_session, small_corpus, tmp_path_factory):
    _table, _spec, res = small_corpus
    n = res.stats.n_vertices
    shard_dir = str(tmp_path_factory.mktemp("csr_fwd"))
    paths = shard_edges(res.edges(), n, 4, shard_dir, by="src")
    actors, bounds = create_shard_actors(paths, n)
    yield actors, n, res
    import ray

    for a in actors:
        ray.kill(a)


def dense_pagerank_oracle(edges_df, n, damping, iters=500):
    """Independent dense-matrix power iteration (networkx.pagerank needs
    scipy, absent here; this is the same uniform-teleport + dangling
    redistribution formulation, computed with an n×n matmul)."""
    src = np.asarray(edges_df["src"], dtype=np.int64)
    dst = np.asarray(edges_df["dst"], dtype=np.int64)
    A = np.zeros((n, n))
    A[src, dst] = 1.0  # edges are distinct (src,dst) pairs
    deg = A.sum(axis=1)
    nz = deg > 0
    P = np.zeros((n, n))
    P[nz] = A[nz] / deg[nz, None]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[~nz].sum()
        r_new = (1 - damping) / n + damping * (P.T @ r + dangling / n)
        if np.abs(r_new - r).sum() < 1e-14:
            r = r_new
            break
        r = r_new
    return r


def test_pagerank_matches_networkx(graph_actors):
    actors, n, res = graph_actors
    result = pagerank(actors, n, damping=0.85, tol=1e-12, max_iter=200)
    assert result.converged
    ours = result.to_array()
    oracle = dense_pagerank_oracle(res.edges().to_pandas(), n, 0.85)
    assert np.allclose(ours, oracle, atol=1e-6)
    assert abs(ours.sum() - 1.0) < 1e-9  # probability mass conserved


def test_pagerank_int_exact_vs_dense(graph_actors):
    """The scaled-int64 oracle mode reproduces a driver-side integer
    power iteration BIT-FOR-BIT (same floor-division recurrence the
    DuckDB oracle runs), and tracks the float fixpoint to ~1e-6."""
    from wikilinks_ray.pipelines.pagerank import pagerank_int

    actors, n, res = graph_actors
    scale, iters = 10**12, 20
    got = pagerank_int(actors, n, iters=iters, scale=scale)

    ep = res.edges().to_pandas()
    src = ep["src"].to_numpy().astype(np.int64)
    dst = ep["dst"].to_numpy().astype(np.int64)
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, src, 1)
    r = np.full(n, scale // n, dtype=np.int64)
    base = (15 * scale) // (100 * n)
    for _ in range(iters):
        contrib = np.zeros(n, dtype=np.int64)
        nz = deg > 0
        contrib[nz] = r[nz] // deg[nz]
        dangling = int(r[~nz].sum())
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, contrib[src])
        r = base + (85 * (s + dangling // n)) // 100
    assert (got == r).all()

    # integer mode tracks the float FIXPOINT once run to convergence
    # (20 iters is the oracle spec, not converged: 0.85^20 ~ 0.04)
    long_int = pagerank_int(actors, n, iters=150, scale=scale)
    floats = pagerank(actors, n, damping=0.85, tol=1e-12, max_iter=200).to_array()
    assert np.allclose(long_int / scale, floats, atol=1e-6)


def test_pagerank_dangling_mass(ray_session, tmp_path):
    # explicit sink graph: 0->1, 0->2, 1 and 2 dangle
    import pyarrow as pa
    import ray.data as rd

    edges = rd.from_arrow(pa.table({"src": pa.array([0, 0], pa.int64()),
                                    "dst": pa.array([1, 2], pa.int64())}))
    paths = shard_edges(edges, 3, 2, str(tmp_path / "s"), by="src")
    actors, _ = create_shard_actors(paths, 3)
    result = pagerank(actors, 3, damping=0.85, tol=1e-14, max_iter=300)
    ours = result.to_array()
    oracle = dense_pagerank_oracle({"src": [0, 0], "dst": [1, 2]}, 3, 0.85)
    assert np.allclose(ours, oracle, atol=1e-8)
    import ray

    for a in actors:
        ray.kill(a)


def test_shard_sentinel_rebuilds_on_config_change(ray_session, tmp_path):
    """Re-sharding the same dir with different (num_shards, n_vertices)
    must rebuild, not hand out paths partitioned with stale bounds."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    edges = rd.from_arrow(pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                                    "dst": pa.array([1, 2, 0], pa.int64())}))
    d = str(tmp_path / "s")
    p2 = shard_edges(edges, 3, 2, d, by="src")
    assert len(p2) == 2 and all(os.path.exists(p) for p in p2)
    # same dir, more shards: all three files must exist and partition by
    # the NEW bounds (shard p owns [bounds[p], bounds[p+1]))
    p3 = shard_edges(edges, 3, 3, d, by="src")
    assert len(p3) == 3 and all(os.path.exists(p) for p in p3)
    for p, path in enumerate(p3):
        srcs = pq.read_table(path)["src"].to_pylist()
        assert srcs == [p]
    # unchanged config is a no-op reuse (mtime stays)
    mt = os.path.getmtime(p3[0])
    shard_edges(edges, 3, 3, d, by="src")
    assert os.path.getmtime(p3[0]) == mt


def test_pagerank_checkpoint_resume_identical(graph_actors, tmp_path):
    actors, n, _res = graph_actors
    fresh = pagerank(actors, n, tol=1e-12, max_iter=60, checkpoint_dir=None)

    ck = str(tmp_path / "ck")
    partial = pagerank(actors, n, tol=1e-12, max_iter=5, checkpoint_dir=ck)
    assert not partial.converged
    resumed = pagerank(actors, n, tol=1e-12, max_iter=60, checkpoint_dir=ck,
                       resume=True)
    assert resumed.metrics_history[0]["iteration"] == 1  # history carried over
    assert resumed.iterations == fresh.iterations
    assert np.allclose(resumed.to_array(), fresh.to_array(), atol=1e-12)


def test_checkpoint_manifest_lineage(graph_actors, tmp_path):
    import json
    import os

    actors, n, _res = graph_actors
    ck = str(tmp_path / "ck2")
    pagerank(actors, n, tol=1e-12, max_iter=3, checkpoint_dir=ck)
    iters = sorted(os.listdir(ck))
    assert iters == ["iter-000001", "iter-000002", "iter-000003"]
    with open(os.path.join(ck, iters[-1], "MANIFEST.json")) as f:
        m = json.load(f)
    assert m["iteration"] == 3
    assert [c["partition"] for c in m["chunks"]] == [0, 1, 2, 3]
    assert len(m["metrics"]["history"]) == 3


def test_pagerank_shuffle_matches_actor_path(graph_actors):
    """The pure-Dataset groupby-aggregate form and the actor-pool
    combiner form are the same algorithm: fixed iterations, same
    damping -> near-bitwise agreement."""
    from wikilinks_ray.pipelines.pagerank_shuffle import pagerank_shuffle

    actors, n, res = graph_actors
    iters = 15
    actor_res = pagerank(actors, n, damping=0.85, tol=0.0, max_iter=iters)
    shuffle_ranks = pagerank_shuffle(res.edges(), n, damping=0.85, iters=iters)
    assert np.allclose(actor_res.to_array(), shuffle_ranks, atol=1e-12)


def test_sparse_partial_transport_matches_dense(ray_session, tmp_path):
    """A few edges over a wide id space forces the sparse
    (offsets, values) partial form (pack_partial's <50%-touched rule);
    a hub range with every slot hit stays dense. Both must agree with
    the dense oracle, and CC via accum_min must match networkx."""
    import networkx as nx
    import pandas as pd
    import ray.data

    from wikilinks_ray.pipelines.components import (
        connected_components, symmetrize_edges)
    from wikilinks_ray.state.csr import pack_partial

    n = 8000
    rng = np.random.default_rng(7)
    # sparse tail: 60 edges scattered over [0, n); dense head: every
    # vertex of range 0 (ids [0, 2000)) receives an edge from vertex 0
    src = np.concatenate([rng.integers(0, n, 60), np.zeros(2000, np.int64)])
    dst = np.concatenate([rng.integers(0, n, 60), np.arange(2000)])
    df = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
    df = df[df.src != df.dst]
    edges = ray.data.from_pandas(df)
    paths = shard_edges(edges, n, 4, str(tmp_path / "s"), by="src")
    actors, _ = create_shard_actors(paths, n)

    # both representations occur for this fixture
    import ray as _ray
    chunk = np.full(2000, 1.0 / n)
    parts = _ray.get(actors[0].scatter.remote(chunk))
    kinds = {type(p).__name__ for p in parts[:-1] if p is not None}
    assert kinds == {"tuple", "ndarray"}, kinds

    result = pagerank(actors, n, damping=0.85, tol=1e-12, max_iter=200)
    oracle = dense_pagerank_oracle(df, n, 0.85)
    assert np.allclose(result.to_array(), oracle, atol=1e-8)

    for a in actors:
        _ray.kill(a)

    sym = symmetrize_edges(edges)
    paths2 = shard_edges(sym, n, 4, str(tmp_path / "s2"), by="src")
    actors2, _ = create_shard_actors(paths2, n)
    labels = connected_components(actors2, n).to_array()
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(df.itertuples(index=False))
    for comp in nx.connected_components(g):
        assert len({labels[v] for v in comp}) == 1
        assert labels[min(comp)] == min(comp)
    for a in actors2:
        _ray.kill(a)

    # pack_partial unit: boundary at exactly half stays dense
    half = pack_partial(np.arange(5), np.ones(5), 10)
    assert isinstance(half, np.ndarray)
    sp = pack_partial(np.arange(4), np.ones(4), 10)
    assert isinstance(sp, tuple)


def test_personalized_pagerank_int_exact_vs_dense(graph_actors):
    """PPR (random walk with restart): the distributed seed-aware
    reducer reproduces a driver-side integer recurrence bit-for-bit,
    and restricting teleport to the seeds concentrates mass on them."""
    from wikilinks_ray.pipelines.pagerank import (pagerank_int,
                                                  personalized_pagerank_int)

    actors, n, res = graph_actors
    scale, iters = 10**12, 20
    seeds = np.array([0, 1, 5], dtype=np.int64)
    got = personalized_pagerank_int(actors, n, seeds, iters=iters,
                                    scale=scale)

    ep = res.edges().to_pandas()
    src = ep["src"].to_numpy().astype(np.int64)
    dst = ep["dst"].to_numpy().astype(np.int64)
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, src, 1)
    n_s = len(seeds)
    r = np.zeros(n, dtype=np.int64)
    r[seeds] = scale // n_s
    base = (15 * scale) // (100 * n_s)
    is_seed = np.zeros(n, dtype=bool)
    is_seed[seeds] = True
    for _ in range(iters):
        contrib = np.zeros(n, dtype=np.int64)
        nz = deg > 0
        contrib[nz] = r[nz] // deg[nz]
        dangling = int(r[~nz].sum())
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, contrib[src])
        r = (85 * s) // 100
        r[is_seed] = base + (85 * (s[is_seed] + dangling // n_s)) // 100
    assert (got == r).all()

    # personalization semantics: seed mass exceeds the uniform case's,
    # and total mass stays ~scale (floor-division leakage only)
    uni = pagerank_int(actors, n, iters=iters, scale=scale)
    assert got[seeds].sum() > uni[seeds].sum()
    assert 0.9 * scale < got.sum() <= scale

    # degenerate seed set is rejected
    with pytest.raises(ValueError):
        personalized_pagerank_int(actors, n, np.array([], dtype=np.int64))


def test_weighted_pagerank_int_exact_vs_dense(ray_session, tmp_path):
    """Weighted CSR shards + (r*w)//W per-edge scatter reproduce a
    driver-side dense integer recurrence bit-for-bit; with all weights
    equal the result collapses to the unweighted pagerank_int."""
    import pyarrow as pa
    import ray.data as rd

    from wikilinks_ray.pipelines.pagerank import (pagerank_int,
                                                  weighted_pagerank_int)

    rng = np.random.default_rng(9)
    n, m = 120, 900
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 40, m).astype(np.int64)
    # collapse duplicate (src, dst) pairs by summing weights (the
    # contraction op emits distinct weighted pairs)
    import pandas as pd

    edf = (pd.DataFrame({"src": src, "dst": dst, "weight": w})
           .groupby(["src", "dst"], as_index=False)["weight"].sum())
    ds = rd.from_arrow(pa.Table.from_pandas(edf, preserve_index=False))

    paths = shard_edges(ds, n, 4, str(tmp_path / "wsh"), by="src",
                        weight_col="weight")
    actors, _ = create_shard_actors(paths, n)
    scale, iters = 10**12, 20
    got = weighted_pagerank_int(actors, n, iters=iters, scale=scale)

    W = np.zeros(n, dtype=np.int64)
    np.add.at(W, edf["src"].to_numpy(), edf["weight"].to_numpy())
    r = np.full(n, scale // n, dtype=np.int64)
    base = (15 * scale) // (100 * n)
    es, ed, ew = (edf["src"].to_numpy(), edf["dst"].to_numpy(),
                  edf["weight"].to_numpy())
    for _ in range(iters):
        dangling = int(r[W == 0].sum())
        contrib = (r[es] * ew) // W[es]
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, ed, contrib)
        r = base + (85 * (s + dangling // n)) // 100
    assert (got == r).all()

    # uniform weights == unweighted
    edf1 = edf.assign(weight=1)
    ds1 = rd.from_arrow(pa.Table.from_pandas(edf1, preserve_index=False))
    p1 = shard_edges(ds1, n, 4, str(tmp_path / "wsh1"), by="src",
                     weight_col="weight")
    a1, _ = create_shard_actors(p1, n)
    p0 = shard_edges(ds1.select_columns(["src", "dst"]), n, 4,
                     str(tmp_path / "wsh0"), by="src")
    a0, _ = create_shard_actors(p0, n)
    assert (weighted_pagerank_int(a1, n, iters=10)
            == pagerank_int(a0, n, iters=10)).all()
    import ray as _ray

    for a in actors + a1 + a0:
        _ray.kill(a)

"""CC / label propagation / BFS / triangles vs oracles.

Oracle pattern mirrors the reference's RouteFinderTest.kt:41-72 (random
digraphs, independent-library oracle, exact match on lengths/labels)."""

from __future__ import annotations

import numpy as np
import pytest

from wikilinks_ray.state.csr import shard_edges, create_shard_actors
from wikilinks_ray.pipelines.components import connected_components, symmetrize_edges
from wikilinks_ray.pipelines.labelprop import label_propagation
from wikilinks_ray.pipelines.bfs import multi_source_bfs, shortest_route
from wikilinks_ray.pipelines.triangles import triangle_count


def random_digraph(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    return np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)


def edges_ds(pairs):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": pa.array(pairs[:, 0], pa.int64()),
                                   "dst": pa.array(pairs[:, 1], pa.int64())}))


@pytest.fixture(scope="module")
def rand_graph(ray_session, tmp_path_factory):
    n = 400
    pairs = random_digraph(n, 1600, seed=11)
    ds = edges_ds(pairs)
    d = tmp_path_factory.mktemp("randg")
    fwd = create_shard_actors(shard_edges(ds, n, 3, str(d / "fwd"), by="src"), n)[0]
    sym = symmetrize_edges(ds)
    symA = create_shard_actors(shard_edges(sym, n, 3, str(d / "sym"), by="src"), n)[0]
    yield n, pairs, ds, fwd, symA
    import ray

    for a in fwd + symA:
        ray.kill(a)


def test_connected_components_exact_vs_networkx(rand_graph):
    import networkx as nx

    n, pairs, _ds, _fwd, symA = rand_graph
    res = connected_components(symA, n)
    assert res.converged
    labels = res.to_array()
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    for comp in nx.connected_components(g):
        want = min(comp)
        for v in comp:
            assert labels[v] == want


def test_cc_checkpoint_resume(rand_graph, tmp_path):
    n, _pairs, _ds, _fwd, symA = rand_graph
    fresh = connected_components(symA, n)
    ck = str(tmp_path / "ck")
    partial = connected_components(symA, n, max_iter=2, checkpoint_dir=ck)
    assert not partial.converged
    resumed = connected_components(symA, n, checkpoint_dir=ck, resume=True)
    assert resumed.converged
    assert (resumed.to_array() == fresh.to_array()).all()


def dense_labelprop_oracle(pairs, n, max_iter):
    """Synchronous mode-of-neighbors with smallest-label tie-break."""
    adj = [set() for _ in range(n)]
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)
    # multigraph→simple: our shards keep duplicate (u,v) messages only if
    # duplicate edges exist; edges are distinct pairs + symmetrized, but a
    # reciprocal pair (a,b),(b,a) symmetrizes to duplicates — count them.
    from collections import Counter

    msrc = Counter()
    for s, d in pairs:
        msrc[(s, d)] += 1
        msrc[(d, s)] += 1
    labels = np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            cnt = Counter()
            for u in adj[v]:
                cnt[labels[u]] += msrc[(u, v)]
            if cnt:
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
        if (new == labels).all():
            return new
        labels = new
    return labels


def test_label_propagation_deterministic_vs_oracle(rand_graph):
    n, pairs, _ds, _fwd, symA = rand_graph
    res = label_propagation(symA, n, max_iter=4)
    oracle = dense_labelprop_oracle(pairs, n, 4)
    assert (res.to_array() == oracle).all()
    # determinism: second run identical
    res2 = label_propagation(symA, n, max_iter=4)
    assert (res2.to_array() == res.to_array()).all()


def test_multi_source_bfs_distances_vs_networkx(rand_graph):
    import networkx as nx

    n, pairs, _ds, fwd, _symA = rand_graph
    sources = [0, 7, 123, 399]
    res = multi_source_bfs(fwd, n, sources)
    dist = res.distances()
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    for sid, s in enumerate(sources):
        lengths = nx.single_source_shortest_path_length(g, s)
        for v in range(n):
            want = lengths.get(v, -1)
            assert dist[v, sid] == want, (s, v)


def test_shortest_route_is_valid_shortest_path(rand_graph):
    import networkx as nx

    n, pairs, _ds, fwd, _symA = rand_graph
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    eset = {(int(a), int(b)) for a, b in pairs}
    rng = np.random.default_rng(3)
    checked = 0
    for _ in range(10):
        s, t = int(rng.integers(n)), int(rng.integers(n))
        route = shortest_route(fwd, n, s, t)
        try:
            want = nx.shortest_path_length(g, s, t)
        except nx.NetworkXNoPath:
            assert route is None
            continue
        # route length exact (paths not unique: length-only assert,
        # RouteFinderTest.kt:69), every hop a real edge
        assert route is not None
        assert len(route) - 1 == want
        assert route[0] == s and route[-1] == t
        for a, b in zip(route, route[1:]):
            assert (a, b) in eset
        checked += 1
    assert checked >= 3


def test_golden_routes_end_to_end(ray_session, small_corpus, tmp_path):
    """The reference's golden-route fixtures on the synthetic corpus
    (RouteIntegrationTest.kt:37-63)."""
    _table, _spec, resg = small_corpus
    n = resg.stats.n_vertices
    paths = shard_edges(resg.edges(), n, 3, str(tmp_path / "fwd"), by="src")
    actors, _ = create_shard_actors(paths, n)
    vp = resg.vertices().to_pandas()
    id_of = dict(zip(vp["title"], vp["id"]))
    title_of = dict(zip(vp["id"], vp["title"]))

    r1 = shortest_route(actors, n, id_of["Gdańsk"], id_of["Polska"])
    assert [title_of[v] for v in r1] == ["Gdańsk", "Polska"]
    r2 = shortest_route(actors, n, id_of["Polska"], id_of["Bałtycke Morze"])
    assert [title_of[v] for v in r2] == ["Polska", "Polsko", "Bałtycke Morze"]
    import ray

    for a in actors:
        ray.kill(a)


def test_triangle_count_vs_networkx(rand_graph):
    import networkx as nx

    n, pairs, ds, _fwd, _symA = rand_graph
    got = triangle_count(ds, num_partitions=4)
    g = nx.Graph()
    g.add_edges_from(pairs)
    want = sum(nx.triangles(g).values()) // 3
    assert got == want


def test_triangle_count_small_known(ray_session):
    # K4 has 4 triangles; plus an isolated edge
    pairs = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3], [7, 8],
                      [1, 0]])  # duplicate reversed edge must not double-count
    got = triangle_count(edges_ds(pairs), num_partitions=2)
    assert got == 4


def test_bfs_checkpoint_resume_identical(rand_graph, tmp_path):
    n, _pairs, _ds, fwd, _symA = rand_graph
    sources = [0, 7]
    fresh = multi_source_bfs(fwd, n, sources)
    ck = str(tmp_path / "bfs_ck")
    partial = multi_source_bfs(fwd, n, sources, max_levels=2, checkpoint_dir=ck)
    assert partial.levels == 2
    resumed = multi_source_bfs(fwd, n, sources, checkpoint_dir=ck, resume=True)
    assert (resumed.distances() == fresh.distances()).all()
    # parents define valid shortest-path trees after resume too
    d = resumed.distances()
    for v in range(0, n, 37):
        if d[v, 0] > 0:
            path = resumed.path_to(v, 0)
            assert path is not None and len(path) - 1 == d[v, 0]


def test_triangle_join_fallback_matches_broadcast(rand_graph):
    n, pairs, ds, _fwd, _symA = rand_graph
    a = triangle_count(ds, num_partitions=4)
    b = triangle_count(ds, num_partitions=4, broadcast_degree_limit=0)
    assert a == b


def test_k_core_matches_networkx(rand_graph):
    import networkx as nx

    from wikilinks_ray.pipelines.kcore import k_core

    _n, pairs, ds, _fwd, _symA = rand_graph
    g = nx.Graph()
    g.add_edges_from(pairs)
    for k in (2, 4, 6):
        want = sorted(nx.k_core(g, k).nodes())
        got = k_core(ds, k).tolist()
        assert got == want, f"k={k}"


def test_k_core_forced_distributed(rand_graph):
    """broadcast_max=0 forces the semi-join peel path (survivors never
    leave the cluster until the final collect); must match networkx and
    the broadcast path exactly."""
    import networkx as nx

    from wikilinks_ray.pipelines.kcore import k_core

    _n, pairs, ds, _fwd, _symA = rand_graph
    g = nx.Graph()
    g.add_edges_from(pairs)
    k = 4
    want = sorted(nx.k_core(g, k).nodes())
    got = k_core(ds, k, broadcast_max=0).tolist()
    assert got == want


def test_per_vertex_triangles_vs_networkx(rand_graph):
    """per_vertex=True credits each triangle's three corners exactly,
    on BOTH the fused-broadcast and bucketed-merge fallback paths, and
    the corner sum equals 3x the scalar count."""
    import networkx as nx

    _n, pairs, ds, _fwd, _symA = rand_graph
    g = nx.Graph()
    g.add_edges_from(pairs)
    want = nx.triangles(g)
    total = sum(want.values()) // 3

    for limit in (50_000_000, 0):  # broadcast path, then join fallback
        pv = triangle_count(ds, num_partitions=4, per_vertex=True,
                            broadcast_degree_limit=limit).to_pandas()
        got = dict(zip(pv["v"], pv["triangles"]))
        assert all(want[v] == got.get(v, 0) for v in want)
        assert pv["triangles"].sum() == 3 * total


def test_reciprocity_vs_networkx(rand_graph):
    import networkx as nx

    from wikilinks_ray.pipelines.reciprocity import reciprocity_counts

    _n, pairs, ds, _fwd, _symA = rand_graph
    m, d = reciprocity_counts(ds, num_partitions=4)
    g = nx.DiGraph()
    g.add_edges_from((int(a), int(b)) for a, b in pairs if a != b)
    assert d == g.number_of_edges()
    # networkx overall_reciprocity = mutual / directed on the same graph
    assert m / d == pytest.approx(nx.overall_reciprocity(g))
    # self-loops and duplicate rows must not perturb either count
    import pyarrow as pa
    import ray.data as rd

    noisy = ds.union(rd.from_arrow(pa.table({
        "src": pa.array([1, 1, 2], pa.int64()),
        "dst": pa.array([1, 1, 2], pa.int64())})))
    assert reciprocity_counts(noisy, num_partitions=4) == (m, d)


def test_sssp_weighted_vs_networkx(rand_graph, tmp_path_factory):
    """Weighted Bellman-Ford supersteps vs networkx Dijkstra (positive
    integer weights, so both compute the same metric) — exact int64
    distances, unreached = SSSP_INF on our side / absent in networkx."""
    import networkx as nx
    import pyarrow as pa
    import ray
    import ray.data as rd

    from wikilinks_ray.pipelines.sssp import SSSP_INF, sssp_int

    n, pairs, _ds, _fwd, _symA = rand_graph
    w = (pairs[:, 0] * 31 + pairs[:, 1]) % 97 + 1
    wds = rd.from_arrow(pa.table({
        "src": pa.array(pairs[:, 0], pa.int64()),
        "dst": pa.array(pairs[:, 1], pa.int64()),
        "weight": pa.array(w, pa.int64())}))
    d = tmp_path_factory.mktemp("ssspw")
    actors, _ = create_shard_actors(
        shard_edges(wds, n, 3, str(d), by="src", weight_col="weight"), n)
    try:
        res = sssp_int(actors, n, source=0, weighted=True)
    finally:
        for a in actors:
            ray.kill(a)
    assert res.converged
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_weighted_edges_from(
        (int(a), int(b), int(x)) for (a, b), x in zip(pairs, w))
    want = nx.single_source_dijkstra_path_length(g, 0, weight="weight")
    for v in range(n):
        assert res.distances[v] == want.get(v, SSSP_INF)


def test_sssp_unweighted_equals_bfs(rand_graph):
    """weighted=False min-plus (+1 per edge) on UNWEIGHTED shards must
    reproduce the frontier BFS's hop counts exactly — a differential
    oracle between two independent traversal implementations."""
    import ray

    from wikilinks_ray.pipelines.sssp import SSSP_INF, sssp_int

    n, pairs, _ds, fwd, _symA = rand_graph
    src = int(pairs[0, 0])
    res = sssp_int(fwd, n, source=src, weighted=False)
    assert res.converged
    bfs = multi_source_bfs(fwd, n, [src])
    dist = bfs.distances()[:, 0]
    ours = np.where(res.distances == SSSP_INF, -1, res.distances)
    assert np.array_equal(ours, dist)


def test_random_walks_match_pure_python_replay(rand_graph):
    """Deterministic walks vs an independent driver-side replay over a
    sorted adjacency dict — every emitted (walk, step, vertex) row and
    every early termination must agree."""
    from collections import defaultdict

    from wikilinks_ray.pipelines.walks import random_walks, walk_hash
    from wikilinks_ray.state.csr import vertex_ranges

    n, pairs, _ds, fwd, _symA = rand_graph
    adj = defaultdict(list)
    for a, b in pairs:
        adj[int(a)].append(int(b))
    for v in adj:
        adj[v].sort()

    seeds = np.unique(pairs[:, 0])[:32]
    bounds = vertex_ranges(n, len(fwd))
    wid, step, vert = random_walks(fwd, bounds, seeds, length=6)
    got = {(int(seeds[w]), int(s)): int(x)
           for w, s, x in zip(wid, step, vert)}

    want = {}
    for s0 in seeds:
        v = int(s0)
        want[(v, 0)] = v
        for t in range(6):
            nbrs = adj.get(v)
            if not nbrs:
                break
            v = nbrs[int(walk_hash(np.array([v]), t)[0] % len(nbrs))]
            want[(int(s0), t + 1)] = v
    assert got == want


def test_hyper_anf_matches_dense_reference(rand_graph):
    """HyperANF's distributed register exchange vs an independent dense
    numpy replay (np.maximum.at over the raw edge list) — exact match
    (both deterministic), plus a loose accuracy envelope vs exact
    4-hop in-ball sizes from networkx."""
    import networkx as nx

    from wikilinks_ray.pipelines.anf import hyper_anf, vertex_registers
    from wikilinks_ray.stages.agg import HLL_K, hll_estimate

    n, pairs, _ds, fwd, _symA = rand_graph
    got = hyper_anf(fwd, n, iters=4)

    regs = vertex_registers(np.arange(n, dtype=np.int64))
    for _ in range(4):
        new = regs.copy()
        np.maximum.at(new, pairs[:, 1], regs[pairs[:, 0]])
        regs = new
    r = regs.astype(np.int64)
    z = (np.int64(1) << (HLL_K - r)).sum(axis=1)
    vz = (r == 0).sum(axis=1)
    want = np.fromiter((hll_estimate(int(a), int(b)) for a, b in zip(z, vz)),
                       dtype=np.int64, count=n)
    assert np.array_equal(got, want)

    # accuracy: HLL with 64 registers ~ 13% std error; require the mean
    # relative error over true 4-hop in-balls to stay under 25%
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    rev = g.reverse()
    exact = np.array([
        len(nx.single_source_shortest_path_length(rev, v, cutoff=4))
        for v in range(n)], dtype=np.int64)
    rel = np.abs(got - exact) / np.maximum(exact, 1)
    assert rel.mean() < 0.25

    # saturated-tail exactness: run far past the graph's diameter so
    # late supersteps have all-zero deltas (the sparse transport path's
    # empty extreme) — must equal the dense replay at the same depth
    got12 = hyper_anf(fwd, n, iters=12)
    regs = vertex_registers(np.arange(n, dtype=np.int64))
    for _ in range(12):
        new = regs.copy()
        np.maximum.at(new, pairs[:, 1], regs[pairs[:, 0]])
        regs = new
    r = regs.astype(np.int64)
    z = (np.int64(1) << (HLL_K - r)).sum(axis=1)
    vz = (r == 0).sum(axis=1)
    want12 = np.fromiter(
        (hll_estimate(int(a), int(b)) for a, b in zip(z, vz)),
        dtype=np.int64, count=n)
    assert np.array_equal(got12, want12)


def test_directed_modularity_vs_networkx(rand_graph):
    """Engine directed modularity (combiner pass + exact integer terms)
    vs networkx's community.modularity on the same DiGraph/partition."""
    import networkx as nx

    from wikilinks_ray.pipelines.modularity import directed_modularity

    n, pairs, ds, _fwd, _symA = rand_graph
    q, stats = directed_modularity(ds, lambda v: v % 7)
    df = stats.to_pandas()
    m = len(pairs)
    assert df["kout"].sum() == m and df["kin"].sum() == m
    assert (df["term"] == df["intra_edges"] * m - df["kout"] * df["kin"]).all()

    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    comms = [set(v for v in range(n) if v % 7 == c) for c in range(7)]
    want = nx.community.modularity(g, comms)
    assert q == pytest.approx(want, abs=1e-12)


def test_mis_independent_maximal_and_deterministic(rand_graph):
    """Luby MIS: (1) independence — no edge inside the set; (2)
    maximality — every outside vertex has an inside neighbor; (3) exact
    match vs an independent driver-side round replay with the same
    frozen keys."""
    from wikilinks_ray.pipelines.mis import maximal_independent_set, mis_key

    n, pairs, _ds, _fwd, symA = rand_graph
    got, rounds, done = maximal_independent_set(symA, n)
    assert done and rounds >= 1
    in_mis = np.zeros(n, dtype=bool)
    in_mis[got] = True
    a, b = pairs[:, 0], pairs[:, 1]
    assert not (in_mis[a] & in_mis[b]).any()

    nbr_in_mis = np.zeros(n, dtype=bool)
    np.logical_or.at(nbr_in_mis, a, in_mis[b])
    np.logical_or.at(nbr_in_mis, b, in_mis[a])
    # every non-member is blocked by a member (isolated ids are members)
    assert (in_mis | nbr_in_mis).all()

    # dense replay of the same rounds
    sa = np.concatenate([a, b])
    sb = np.concatenate([b, a])
    active = np.ones(n, dtype=bool)
    mis = np.zeros(n, dtype=bool)
    INF = np.iinfo(np.int64).max
    t = 0
    while active.any():
        keys = np.where(active, mis_key(np.arange(n, dtype=np.int64), t), INF)
        nbr_min = np.full(n, INF, dtype=np.int64)
        np.minimum.at(nbr_min, sb, keys[sa])
        new = active & (keys < nbr_min)
        mis |= new
        blocked = np.zeros(n, dtype=bool)
        np.logical_or.at(blocked, sb, new[sa])
        active &= ~new & ~blocked
        t += 1
    assert np.array_equal(np.flatnonzero(mis), got)
    assert t == rounds


def test_linkpred_vs_naive_sets(rand_graph):
    """Common-neighbor/Jaccard pairs vs a naive per-vertex set oracle,
    including the posting-cap exclusion semantics."""
    from collections import defaultdict
    from itertools import combinations

    from wikilinks_ray.pipelines.linkpred import common_neighbor_pairs

    _n, pairs, ds, _fwd, _symA = rand_graph
    out = common_neighbor_pairs(ds, min_common=2).to_pandas()
    got = {(int(r.u), int(r.v)): (int(r.common), int(r.jaccard_scaled))
           for r in out.itertuples()}

    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[int(a)].add(int(b))
    want = {}
    for u, v in combinations(sorted(nbrs), 2):
        c = len(nbrs[u] & nbrs[v])
        if c >= 2:
            want[(u, v)] = (c, c * 10**6 // (len(nbrs[u]) + len(nbrs[v]) - c))
    assert got == want

    # a tiny posting cap must drop hub dsts whole-list, exactly
    capped = common_neighbor_pairs(ds, min_common=1, max_posting=3
                                   ).to_pandas()
    indeg = defaultdict(int)
    for _a, b in pairs:
        indeg[int(b)] += 1
    nbrs_c = defaultdict(set)
    for a, b in pairs:
        if indeg[int(b)] <= 3:
            nbrs_c[int(a)].add(int(b))
    want_c = set()
    for u, v in combinations(sorted(nbrs_c), 2):
        if nbrs_c[u] & nbrs_c[v]:
            want_c.add((u, v))
    assert {(int(r.u), int(r.v)) for r in capped.itertuples()} == want_c


def test_scc_vs_networkx(rand_graph, tmp_path_factory):
    """Coloring-algorithm SCC vs networkx strongly_connected_components
    — exact partition match under canonical min-member labels."""
    import networkx as nx

    from wikilinks_ray.pipelines.scc import (min_relabel,
                                             strongly_connected_components)

    n, pairs, ds, fwd, _symA = rand_graph
    d = tmp_path_factory.mktemp("sccrev")
    rev = create_shard_actors(
        shard_edges(ds, n, 3, str(d), by="dst"), n, key="dst")[0]
    try:
        res = strongly_connected_components(fwd, rev, n)
    finally:
        import ray

        for a in rev:
            ray.kill(a)
    got = min_relabel(res.to_array())
    assert res.rounds >= 1

    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    want = np.empty(n, dtype=np.int64)
    for comp in nx.strongly_connected_components(g):
        want[list(comp)] = min(comp)
    assert np.array_equal(got, want)


def test_harmonic_from_anf_trajectory(rand_graph):
    """Trajectory mode: column t equals a fresh t-iteration run
    (monotone register merges), and the harmonic shell sum matches a
    direct recomputation from the trajectory."""
    from wikilinks_ray.pipelines.anf import harmonic_from_anf, hyper_anf

    n, _pairs, _ds, fwd, _symA = rand_graph
    traj = hyper_anf(fwd, n, iters=3, per_iteration=True)
    assert traj.shape == (4, n)
    assert np.array_equal(traj[3], hyper_anf(fwd, n, iters=3))
    assert np.array_equal(traj[0].min(), traj[0].max())  # singleton balls

    h = harmonic_from_anf(traj)
    want = sum((np.maximum(traj[t] - traj[t - 1], 0) * 10**6) // t
               for t in range(1, 4))
    assert np.array_equal(h, want)
    # vertices with no in-neighbors keep a constant trajectory
    assert (h >= 0).all()


def test_path_count_bfs_vs_dense_dp(rand_graph):
    """sigma counts vs an independent dense numpy DP replay (level
    layering + np.add.at accumulation), and dist vs multi_source_bfs."""
    from wikilinks_ray.pipelines.pathcount import path_count_bfs

    n, pairs, _ds, fwd, _symA = rand_graph
    pivots = [int(v) for v in np.unique(pairs[:, 0])[:5]]
    pc = path_count_bfs(fwd, n, pivots)
    dist, sigma = pc.distances(), pc.sigmas()
    assert pc.levels >= 1

    ref = multi_source_bfs(fwd, n, pivots)
    assert np.array_equal(dist, ref.distances().astype(np.int32))

    a, b = pairs[:, 0], pairs[:, 1]
    for sid, s in enumerate(pivots):
        wd = np.full(n, -1, dtype=np.int64)
        ws = np.zeros(n, dtype=np.int64)
        wd[s] = 0
        ws[s] = 1
        for lev in range(1, n):
            on = wd[a] == lev - 1
            if not on.any():
                break
            cand = np.unique(b[on & (wd[b] < 0)])
            wd[cand] = lev
            at = on & (wd[b] == lev)
            np.add.at(ws, b[at], ws[a[at]])
        assert np.array_equal(dist[:, sid], wd.astype(np.int32))
        assert np.array_equal(sigma[:, sid], ws)


def test_stress_centrality_vs_brute_force(rand_graph, tmp_path_factory):
    """Pivot-sampled stress vs a brute-force all-shortest-paths count
    (networkx all_shortest_paths, interior vertices only), on a small
    pivot set — exact integer match."""
    import networkx as nx
    from collections import Counter

    from wikilinks_ray.pipelines.stress import stress_centrality

    n, pairs, ds, fwd, _symA = rand_graph
    d = tmp_path_factory.mktemp("stressrev")
    rev = create_shard_actors(
        shard_edges(ds, n, 3, str(d), by="dst"), n, key="dst")[0]
    pivots = [int(v) for v in np.unique(pairs[:, 0])[:4]]
    try:
        vs, st = stress_centrality(fwd, rev, n, pivots)
    finally:
        import ray

        for a in rev:
            ray.kill(a)
    got = dict(zip(vs.tolist(), st.tolist()))

    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    want = Counter()
    reached_nonself = set()
    for s in pivots:
        lengths = nx.single_source_shortest_path_length(g, s)
        for t in lengths:
            if t != s:
                reached_nonself.add(t)
            for path in nx.all_shortest_paths(g, s, t):
                for v in path[1:-1]:
                    want[v] += 1
    expect = {v: want.get(v, 0) for v in reached_nonself}
    assert got == expect


def test_luby_coloring_proper_and_bounded(rand_graph):
    """Iterated-MIS coloring: proper (no edge monochrome), complete,
    at most max-degree+1 colors, deterministic across runs."""
    from collections import Counter

    from wikilinks_ray.pipelines.coloring import luby_coloring

    n, pairs, _ds, _fwd, symA = rand_graph
    color, k = luby_coloring(symA, n)
    assert (color >= 0).all()
    a, b = pairs[:, 0], pairs[:, 1]
    assert (color[a] != color[b]).all()

    deg = Counter()
    for u, v in {(int(x), int(y)) for x, y in pairs}:
        deg[u] += 1
        deg[v] += 1
    assert k <= max(deg.values()) + 1

    color2, k2 = luby_coloring(symA, n)
    assert k2 == k and np.array_equal(color2, color)


def test_densest_subgraph_vs_pure_python_peel(rand_graph):
    """Parallel peel vs an independent driver-side replay (same
    integer thresholds), plus the approximation sanity check: the
    reported density must be >= the full graph's."""
    from wikilinks_ray.pipelines.densest import densest_subgraph

    n, pairs, ds, _fwd, _symA = rand_graph
    vs, (e_b, n_b), profile = densest_subgraph(ds)

    und = {(min(int(a), int(b)), max(int(a), int(b)))
           for a, b in pairs if a != b}
    cur = set(und)
    best = None
    want_profile = []
    t = 0
    while cur:
        deg = {}
        for lo, hi in cur:
            deg[lo] = deg.get(lo, 0) + 1
            deg[hi] = deg.get(hi, 0) + 1
        nt, et = len(deg), len(cur)
        want_profile.append((t, nt, et))
        if best is None or et * best[1] > best[0] * nt:
            best = (et, nt, set(deg))
        keep = {v for v, d in deg.items() if d * nt > 4 * et}
        cur = {(lo, hi) for lo, hi in cur if lo in keep and hi in keep}
        t += 1
    assert profile == want_profile
    assert (e_b, n_b) == (best[0], best[1])
    assert set(vs.tolist()) == best[2]
    # density never below the full graph's
    assert e_b * want_profile[0][1] >= want_profile[0][2] * n_b


def test_maximal_matching_valid_and_deterministic(rand_graph):
    """Matching: vertex-disjoint, maximal (every edge touches a matched
    vertex), and an exact replay of a pure-python round simulation
    with the same md5 keys."""
    from wikilinks_ray.pipelines.matching import (_edge_keys,
                                                  maximal_matching)

    _n, pairs, ds, _fwd, _symA = rand_graph
    lo, hi, rounds, done = maximal_matching(ds)
    assert done and rounds >= 1
    m = set(zip(lo.tolist(), hi.tolist()))
    touched = set(lo.tolist()) | set(hi.tolist())
    assert len(touched) == 2 * len(m)  # vertex-disjoint
    und = {(min(int(a), int(b)), max(int(a), int(b)))
           for a, b in pairs if a != b}
    assert m <= und
    assert all(a in touched or b in touched for a, b in und)  # maximal

    # pure-python replay
    alive = set(und)
    want = set()
    t = 0
    while alive:
        arr = np.array(sorted(alive), dtype=np.int64)
        keys = _edge_keys(arr[:, 0], arr[:, 1], t)
        vmin = {}
        for (a, b), k in zip(arr.tolist(), keys.tolist()):
            vmin[a] = min(vmin.get(a, k), k)
            vmin[b] = min(vmin.get(b, k), k)
        sel = {(a, b) for (a, b), k in zip(arr.tolist(), keys.tolist())
               if vmin[a] == k and vmin[b] == k}
        want |= sel
        mv = {v for e in sel for v in e}
        alive = {(a, b) for a, b in alive if a not in mv and b not in mv}
        t += 1
    assert m == want and rounds == t


def test_betweenness_vs_networkx(rand_graph, tmp_path_factory):
    """Pivot-restricted Brandes betweenness vs
    networkx.betweenness_centrality_subset on the same DiGraph —
    allclose (floats; the integer stress sibling carries the hash
    gate)."""
    import networkx as nx

    from wikilinks_ray.pipelines.stress import betweenness_centrality

    n, pairs, ds, fwd, _symA = rand_graph
    d = tmp_path_factory.mktemp("btwrev")
    rev = create_shard_actors(
        shard_edges(ds, n, 3, str(d), by="dst"), n, key="dst")[0]
    pivots = [int(v) for v in np.unique(pairs[:, 0])[:6]]
    try:
        vs, bt = betweenness_centrality(fwd, rev, n, pivots)
    finally:
        import ray

        for a in rev:
            ray.kill(a)
    got = dict(zip(vs.tolist(), bt.tolist()))

    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    want = nx.betweenness_centrality_subset(
        g, sources=pivots, targets=list(range(n)), normalized=False)
    for v, x in got.items():
        assert x == pytest.approx(want[v], abs=1e-9), v
    # vertices we report are exactly those reached from a non-self pivot
    for v, w in want.items():
        if v not in got:
            assert w == pytest.approx(0.0, abs=1e-12)


def test_out_closeness_formula_vs_networkx(rand_graph):
    """q_graph_closeness's integer Wasserman-Faust formula over
    path_count_bfs distances vs networkx closeness_centrality on the
    reversed digraph (outward closeness), within the 1-ulp floor-div
    truncation."""
    import networkx as nx

    from wikilinks_ray.pipelines.pathcount import path_count_bfs

    n, pairs, _ds, fwd, _symA = rand_graph
    verts = np.unique(pairs)
    pivots = [int(v) for v in verts[:8]]
    pc = path_count_bfs(fwd, n, pivots)
    dist = pc.distances()

    G = nx.DiGraph()
    G.add_nodes_from(verts.tolist())
    G.add_edges_from(map(tuple, pairs.tolist()))
    ref = nx.closeness_centrality(G.reverse(), wf_improved=True)

    n_verts = len(verts)
    for j, s in enumerate(pivots):
        d = dist[:, j]
        reach = d >= 0
        r = int(reach.sum())
        sd = int(d[reach].sum())
        scaled = ((r - 1) * (r - 1) * 10 ** 6) // (sd * (n_verts - 1)) \
            if sd > 0 else 0
        assert abs(scaled / 1e6 - ref[s]) < 2e-6


def test_bowtie_regions_vs_networkx(rand_graph):
    """Bow-tie decomposition vs networkx first principles: largest SCC
    (min-member tie-break), descendants/ancestors of it, weak
    connectivity — exact per-vertex region match; also exercises the
    set-seeded (source_ids) BFS path."""
    import networkx as nx
    import pandas as pd

    from wikilinks_ray.pipelines.bowtie import bowtie_regions
    from wikilinks_ray.pipelines.components import symmetrize_edges
    from wikilinks_ray.pipelines.scc import (min_relabel,
                                             strongly_connected_components)
    from wikilinks_ray.state.csr import create_shard_actors, shard_edges

    import ray

    n, pairs, ds, fwd, symA = rand_graph
    import tempfile

    d = tempfile.mkdtemp(prefix="bowtie_rev_")
    rev = create_shard_actors(
        shard_edges(ds, n, 3, d + "/rev", by="dst"), n, key="dst")[0]
    try:
        res = strongly_connected_components(fwd, rev, n)
        assert res.converged
        labels = min_relabel(res.to_array())
        verts = np.unique(pairs)
        got = bowtie_regions(fwd, rev, symA, n, labels, verts)
    finally:
        for a in rev:
            ray.kill(a)

    G = nx.DiGraph()
    G.add_nodes_from(verts.tolist())
    G.add_edges_from(map(tuple, pairs.tolist()))
    sccs = list(nx.strongly_connected_components(G))
    core = max(sccs, key=lambda s: (len(s), -min(s)))
    reach_out = set(core)
    frontier = set(core)
    while frontier:
        nxt = {w for v in frontier for w in G.successors(v)} - reach_out
        reach_out |= nxt
        frontier = nxt
    reach_in = set(core)
    frontier = set(core)
    while frontier:
        nxt = {w for v in frontier for w in G.predecessors(v)} - reach_in
        reach_in |= nxt
        frontier = nxt
    U = G.to_undirected()
    weak = set()
    for comp in nx.connected_components(U):
        if comp & core:
            weak |= comp
    want = {}
    for v in verts.tolist():
        if v in core:
            want[v] = "CORE"
        elif v in reach_out:
            want[v] = "OUT"
        elif v in reach_in:
            want[v] = "IN"
        elif v in weak:
            want[v] = "TENDRIL"
        else:
            want[v] = "DISCONNECTED"
    got_map = dict(zip(got["vertex"], got["region"]))
    assert got_map == want
    # sanity: decomposition covers >1 region on this random digraph
    assert len(set(want.values())) >= 2


# ---------------------------------------------------------------------------
# Louvain (synchronous integer modularity-gain rounds)
# ---------------------------------------------------------------------------


def dense_louvain_oracle(pairs, n, rounds):
    """Row-by-row dense replay of pipelines.louvain.louvain_rounds:
    same integer gain, same parity gating, same smallest-c tie-break,
    same min-member canonicalization."""
    A = np.zeros((n, n), dtype=np.int64)
    for s, d in pairs:
        if s != d:
            A[s, d] = 1
            A[d, s] = 1
    deg = A.sum(1)
    m2 = int(deg.sum())
    lab = np.arange(n, dtype=np.int64)
    for t in range(1, rounds + 1):
        sig = np.zeros(n, np.int64)
        np.add.at(sig, lab[deg > 0], deg[deg > 0])
        new = lab.copy()
        for v in range(n):
            if deg[v] == 0 or v % 2 != t % 2:
                continue
            cs, counts = np.unique(lab[np.flatnonzero(A[v])],
                                   return_counts=True)
            kin = dict(zip(cs.tolist(), counts.tolist()))
            kin.setdefault(int(lab[v]), 0)
            best = None
            for c in sorted(kin):
                score = m2 * kin[c] - deg[v] * (
                    int(sig[c]) - (int(deg[v]) if c == lab[v] else 0))
                if best is None or score > best[0]:
                    best = (score, c)
            new[v] = best[1]
        lab = new
    canon = lab.copy()
    for c in np.unique(lab[deg > 0]):
        members = np.flatnonzero((lab == c) & (deg > 0))
        canon[members] = members.min()
    return canon, deg


def modularity_int(pairs, labels, n):
    """2m^2 * Q as an exact integer (positive iff Q > 0)."""
    A = np.zeros((n, n), dtype=np.int64)
    for s, d in pairs:
        if s != d:
            A[s, d] = 1
            A[d, s] = 1
    deg = A.sum(1)
    m2 = int(deg.sum())
    q = 0
    for i in range(n):
        for j in range(n):
            if labels[i] == labels[j]:
                q += m2 * int(A[i, j]) - int(deg[i]) * int(deg[j])
    return q


def test_louvain_exact_vs_dense_replay(ray_session, tmp_path):
    from wikilinks_ray.pipelines.louvain import (louvain_rounds,
                                                 undirected_simple_edges)

    n = 120
    pairs = random_digraph(n, 420, seed=23)
    ds = edges_ds(pairs)
    want, deg = dense_louvain_oracle(pairs, n, rounds=6)
    sym = undirected_simple_edges(ds)
    for P in (1, 3):
        actors = create_shard_actors(
            shard_edges(sym, n, P, str(tmp_path / f"lv{P}"), by="src"), n)[0]
        import ray

        degs = np.concatenate(ray.get([a.out_degrees.remote()
                                       for a in actors]))
        res = louvain_rounds(actors, n, degs, rounds=6)
        for a in actors:
            ray.kill(a)
        np.testing.assert_array_equal(degs, deg)
        vs = np.flatnonzero(deg > 0)
        np.testing.assert_array_equal(res.labels[vs], want[vs])
    # quality sanity: the moved partition has strictly positive
    # modularity and beats singletons (whose Q < 0) on this graph
    assert modularity_int(pairs, want, n) > 0
    assert modularity_int(pairs, np.arange(n), n) < 0
    # canonical form: every community labeled by its min member
    for c in np.unique(want[deg > 0]):
        assert np.flatnonzero((want == c) & (deg > 0)).min() == c


def test_louvain_multilevel_invariances(ray_session, tmp_path):
    """Two-level Louvain: shard-count independence, projection
    consistency (phase-1 communities never split in phase 2), strict
    coarsening toward positive modularity."""
    from wikilinks_ray.pipelines.louvain import (louvain_multilevel,
                                                 undirected_simple_edges)

    n = 150
    pairs = random_digraph(n, 500, seed=41)
    ds = edges_ds(pairs)
    sym = undirected_simple_edges(ds)
    results = []
    for P in (1, 3):
        actors = create_shard_actors(
            shard_edges(sym, n, P, str(tmp_path / f"ml{P}"), by="src"), n)[0]
        import ray

        degs = np.concatenate(ray.get([a.out_degrees.remote()
                                       for a in actors]))
        res = louvain_multilevel(actors, sym, n, degs, rounds1=5,
                                 rounds2=5,
                                 shard_dir=str(tmp_path / f"ml{P}_l2"))
        for a in actors:
            ray.kill(a)
        results.append(res)
    a, b = results
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.phase1_labels, b.phase1_labels)

    deg = np.zeros(n, np.int64)
    A = np.zeros((n, n), np.int64)
    for s, d in pairs:
        if s != d:
            A[s, d] = 1
            A[d, s] = 1
    deg = A.sum(1)
    present = deg > 0
    # projection: same phase-1 community => same final community
    p1, fin = a.phase1_labels[present], a.labels[present]
    m = {}
    for c1, c2 in zip(p1.tolist(), fin.tolist()):
        assert m.setdefault(c1, c2) == c2
    # coarsening: phase 2 can only merge
    assert a.n_final <= a.n_phase1
    assert a.n_final == len(np.unique(fin))
    # final labels are min-member canonical
    for c in np.unique(fin):
        assert np.flatnonzero((a.labels == c) & present).min() == c
    # quality: the final partition has strictly positive modularity
    assert modularity_int(pairs, a.labels, n) > 0
    assert modularity_int(pairs, a.labels, n) >= \
        modularity_int(pairs, a.phase1_labels, n)


def test_boruvka_msf_vs_networkx(ray_session):
    """Borůvka forest: same total weight as networkx's MSF (all MSFs
    agree on weight), acyclic, spans every component, deterministic
    across partitionings, and the forced relabel-join leg (broadcast
    gate at 0) is byte-identical to the broadcast leg."""
    import networkx as nx
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from wikilinks_ray.pipelines.mst import boruvka_msf

    rng = np.random.default_rng(23)
    n, m = 300, 900
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    uu, vv = np.minimum(u, v)[keep], np.maximum(u, v)[keep]
    # duplicate weights on purpose: ties break on (w, u, v)
    w = rng.integers(0, 40, keep.sum())
    df = (pd.DataFrame({"u": uu, "v": vv, "w": w})
          .groupby(["u", "v"], as_index=False)["w"].min())

    def mk(npart):
        return rd.from_arrow(pa.Table.from_pandas(
            df, preserve_index=False)).repartition(npart)

    got = boruvka_msf(mk(4))
    got2 = boruvka_msf(mk(9))
    pd.testing.assert_frame_equal(got, got2)
    forced = boruvka_msf(mk(4), label_broadcast_limit=0)
    pd.testing.assert_frame_equal(got, forced)

    G = nx.Graph()
    G.add_weighted_edges_from(df.itertuples(index=False))
    want_w = sum(d["weight"] for _, _, d in
                 nx.minimum_spanning_edges(G, algorithm="kruskal"))
    assert got["w"].sum() == want_w
    # forest: |edges| = |vertices touched| - |components|
    n_comp = nx.number_connected_components(G)
    assert len(got) == G.number_of_nodes() - n_comp
    F = nx.Graph()
    F.add_edges_from(got[["u", "v"]].itertuples(index=False))
    assert nx.is_forest(F)


def test_double_sweep_vs_networkx(rand_graph):
    """2-sweep: ecc(s0) exact vs networkx, the second source is the
    min-id farthest vertex, ecc(s1) exact, and the pair lower-bounds
    the true diameter of s0's component."""
    import networkx as nx

    n, pairs, _ds, _fwd, symA = rand_graph
    s0 = int(pairs.min())
    d0 = multi_source_bfs(symA, n, [s0]).distances()[:, 0]
    ecc0 = int(d0.max())
    s1 = int(np.flatnonzero(d0 == ecc0).min())
    d1 = multi_source_bfs(symA, n, [s1]).distances()[:, 0]
    ecc1 = int(d1.max())

    G = nx.Graph()
    G.add_edges_from(pairs)
    comp = nx.node_connected_component(G, s0)
    H = G.subgraph(comp)
    assert ecc0 == nx.eccentricity(H, v=s0)
    assert ecc1 == nx.eccentricity(H, v=s1)
    diam = nx.diameter(H)
    assert max(ecc0, ecc1) <= diam
    assert ecc1 >= ecc0  # the far vertex can only be more eccentric

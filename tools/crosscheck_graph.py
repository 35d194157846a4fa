"""sf0.1 graph-family cross-check against networkx.

The graph queries' DuckDB oracles are UNROLLED fixpoints whose SQL cost
explodes past sf0.01 (590k edges × rounds of self-joins), so the hash
gate runs them at sf0.01 only. This tool closes the remaining
at-scale gap a different way: at sf0.1 (19,999 vertices / 590,973
directed derived edges) it recomputes components, BFS depths, k-core
membership, SSSP and float PageRank with networkx/scipy on the SAME
derived edge list and compares exactly (PageRank: sum-|diff| bound).

Usage: python tools/crosscheck_graph.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import networkx as nx

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from wikilinks_ray.pipelines.bfs import multi_source_bfs
    from wikilinks_ray.pipelines.components import connected_components
    from wikilinks_ray.pipelines.derived import DerivedGraph, derived_edges
    from wikilinks_ray.pipelines.kcore import k_core
    from wikilinks_ray.pipelines.pagerank import pagerank
    from wikilinks_ray.pipelines.sssp import SSSP_INF, sssp_int

    out: dict = {"sf_dir": sf_dir}
    edges_df = derived_edges(sf_dir).to_pandas()
    pairs = list(zip(edges_df["src"].tolist(), edges_df["dst"].tolist()))
    out["n_edges"] = len(pairs)

    g_dir = nx.DiGraph()
    g_dir.add_edges_from(pairs)
    g_und = g_dir.to_undirected()

    with DerivedGraph(sf_dir, symmetric=True) as g:
        vs = g.vertices
        out["n_vertices"] = int(len(vs))

        # components: engine labels = min vertex id per (undirected) CC
        labels = connected_components(g.actors, g.n).to_array()
        want = np.full(g.n, -1, dtype=np.int64)
        for comp in nx.connected_components(g_und):
            m = min(comp)
            for v in comp:
                want[v] = m
        out["components_exact"] = bool((labels[vs] == want[vs]).all())

        # BFS depths from the min vertex over the symmetrized graph
        source = int(vs.min())
        dist = multi_source_bfs(g.actors, g.n, [source]).distances()[:, 0]
        nxd = nx.single_source_shortest_path_length(g_und, source)
        wantd = np.full(g.n, -1, dtype=np.int64)
        for v, d in nxd.items():
            wantd[v] = d
        out["bfs_exact"] = bool((dist[vs] == wantd[vs]).all())

    # k-core membership (k=30, the gated query's k) on the simple graph
    ids = np.sort(np.asarray(k_core(derived_edges(sf_dir), k=30),
                             dtype=np.int64))
    gs = nx.Graph()
    gs.add_nodes_from(g_und.nodes)
    gs.add_edges_from((u, v) for u, v in g_und.edges if u != v)
    core = nx.core_number(gs)
    want_ids = np.sort(np.array([v for v, c in core.items() if c >= 30],
                                dtype=np.int64))
    out["kcore_rows"] = int(len(ids))
    out["kcore_exact"] = bool(np.array_equal(ids, want_ids))

    # SSSP (unweighted => BFS depths on the DIRECTED graph)
    with DerivedGraph(sf_dir) as g:
        res = sssp_int(g.actors, g.n, int(g.vertices.min()),
                       weighted=False)
        d = res.distances
        nxd = nx.single_source_shortest_path_length(g_dir,
                                                    int(g.vertices.min()))
        ok = all(d[v] == dd for v, dd in nxd.items())
        ok = ok and bool((d[np.setdiff1d(g.vertices,
                                         list(nxd.keys()))] >= SSSP_INF).all())
        out["sssp_exact"] = bool(ok)

        # float PageRank vs an independent dense numpy power iteration
        # replaying the engine's exact convention (teleport + dangling
        # mass uniform over the n-id space)
        pr = pagerank(g.actors, g.n, tol=1e-12, max_iter=200).to_array()
        src = edges_df["src"].to_numpy()
        dst = edges_df["dst"].to_numpy()
        deg = np.bincount(src, minlength=g.n).astype(np.float64)
        r = np.full(g.n, 1.0 / g.n)
        for _ in range(200):
            contrib = np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
            s = np.zeros(g.n)
            np.add.at(s, dst, contrib[src])
            dangling = r[deg == 0].sum()
            r2 = (0.15 / g.n) + 0.85 * (s + dangling / g.n)
            if np.abs(r2 - r).sum() < 1e-12:
                r = r2
                break
            r = r2
        out["pagerank_l1"] = float(np.abs(pr - r).sum())
        out["pagerank_ok"] = bool(out["pagerank_l1"] < 1e-6)

    # triangles: engine fused wedge/closure vs networkx over the simple
    # undirected graph
    from wikilinks_ray.pipelines.triangles import triangle_count

    t_engine = triangle_count(derived_edges(sf_dir), num_partitions=8)
    t_nx = sum(nx.triangles(gs).values()) // 3
    out["triangles"] = int(t_engine)
    out["triangles_exact"] = bool(t_engine == t_nx)

    # per-vertex triangle counts: engine wedge-corner crediting vs nx
    pv = triangle_count(derived_edges(sf_dir), num_partitions=8,
                        per_vertex=True).to_pandas()
    got_t = dict(zip(pv["v"].astype(int), pv["triangles"].astype(int)))
    tv = nx.triangles(gs)
    want_t = {v: c for v, c in tv.items() if c > 0}
    out["clustering_exact"] = bool(got_t == want_t)

    # reciprocity: (mutual, directed) over ordered non-loop distinct edges
    from wikilinks_ray.pipelines.reciprocity import reciprocity_counts

    m_e, d_e = reciprocity_counts(derived_edges(sf_dir))
    eset = {(u, v) for u, v in pairs if u != v}
    m_want = sum((v, u) in eset for u, v in eset)
    out["reciprocity_exact"] = bool(m_e == m_want and d_e == len(eset))

    # modularity stats of the v%50 partition: exact integer recompute
    from wikilinks_ray.pipelines.modularity import community_stats

    stats = community_stats(derived_edges(sf_dir),
                            lambda v: v % 50).to_pandas() \
        .sort_values("community").reset_index(drop=True)
    src = edges_df["src"].to_numpy()
    dst = edges_df["dst"].to_numpy()
    cs, cd = src % 50, dst % 50
    intra = np.bincount(cs[cs == cd], minlength=50)
    kout = np.bincount(cs, minlength=50)
    kin = np.bincount(cd, minlength=50)
    ok = (np.array_equal(stats["intra_edges"].to_numpy(), intra)
          and np.array_equal(stats["kout"].to_numpy(), kout)
          and np.array_equal(stats["kin"].to_numpy(), kin))
    out["modularity_exact"] = bool(ok)

    # ---- round-5 additions (SQL oracles sf0.01-only for DuckDB cost) ----
    # Katz: dense numpy twin of the scaled-int recurrence, bit-exact
    from wikilinks_ray.pipelines.derived import DerivedGraph as _DG
    from wikilinks_ray.pipelines.katz import katz_int

    with _DG(sf_dir, num_shards=8) as g:
        got = katz_int(g.actors, g.n, iters=10)
        a_den = int(np.bincount(dst, minlength=g.n).max()) + 1
        x = np.full(g.n, 10**9, dtype=np.int64)
        for _ in range(10):
            s = np.zeros(g.n, dtype=np.int64)
            np.add.at(s, dst, x[src])
            x = 10**9 + s // a_den
        out["katz_exact"] = bool(np.array_equal(got, x))

    # assortativity: moments vs numpy + float r vs networkx
    from wikilinks_ray.pipelines.assortativity import (
        assortativity_moments,
        coefficient_from_moments,
    )

    mo = assortativity_moments(derived_edges(sf_dir))
    n_ids = int(max(src.max(), dst.max())) + 1
    od = np.bincount(src, minlength=n_ids)
    idg = np.bincount(dst, minlength=n_ids)
    xx, yy = od[src].astype(np.int64), idg[dst].astype(np.int64)
    want_mo = {"m": len(src), "sxy": int((xx * yy).sum()),
               "sx": int(xx.sum()), "sy": int(yy.sum()),
               "sx2": int((xx * xx).sum()), "sy2": int((yy * yy).sum())}
    g_nx = nx.DiGraph()
    g_nx.add_edges_from(pairs)
    r_nx = nx.degree_assortativity_coefficient(g_nx, x="out", y="in")
    out["assortativity_exact"] = bool(
        mo == want_mo
        and abs(coefficient_from_moments(mo) - r_nx) < 1e-9)

    # k-truss (k=8: nontrivial peel at this scale) vs networkx
    from wikilinks_ray.pipelines.truss import k_truss

    res = k_truss(derived_edges(sf_dir), 8, num_partitions=16,
                  max_rounds=40)
    tdf = res.edges.to_pandas()
    got_e = (set(map(tuple, tdf[["lo", "hi"]].to_numpy().tolist()))
             if len(tdf) else set())
    gu = nx.Graph()
    gu.add_edges_from(pairs)
    gu.remove_edges_from(nx.selfloop_edges(gu))
    want_e = {(min(a, b), max(a, b)) for a, b in nx.k_truss(gu, 8).edges()}
    out["truss_rows"] = len(got_e)
    out["truss_rounds"] = res.rounds
    out["truss_exact"] = bool(res.converged and got_e == want_e)

    # pivot out-closeness (16 pivots) + bow-tie decomposition
    from wikilinks_ray.pipelines.bowtie import bowtie_regions
    from wikilinks_ray.pipelines.pathcount import path_count_bfs
    from wikilinks_ray.pipelines.scc import (min_relabel,
                                             strongly_connected_components)

    g_rev = g_dir.reverse()
    with DerivedGraph(sf_dir, reverse=True) as g:
        pivots = [int(v) for v in g.vertices[:16]]
        pc = path_count_bfs(g.actors, g.n, pivots)
        dist = pc.distances()
        nv = len(g.vertices)
        ok = True
        for j, s in enumerate(pivots):
            d = dist[:, j]
            reach = d >= 0
            r, sd = int(reach.sum()), int(d[reach].sum())
            scaled = ((r - 1) * (r - 1) * 10 ** 6) // (sd * (nv - 1)) \
                if sd > 0 else 0
            want = nx.closeness_centrality(g_rev, u=s, wf_improved=True)
            ok &= abs(scaled / 1e6 - want) < 2e-6
        out["closeness_exact"] = bool(ok)

        scc = strongly_connected_components(g.actors, g.rev_actors, g.n)
        labels = min_relabel(scc.to_array())
        with DerivedGraph(sf_dir, symmetric=True) as gs:
            bt = bowtie_regions(g.actors, g.rev_actors, gs.actors,
                                g.n, labels, g.vertices)
    core = max(nx.strongly_connected_components(g_dir),
               key=lambda s: (len(s), -min(s)))
    reach_out, frontier = set(core), set(core)
    while frontier:
        nxt = {w for v in frontier for w in g_dir.successors(v)} - reach_out
        reach_out |= nxt
        frontier = nxt
    reach_in, frontier = set(core), set(core)
    while frontier:
        nxt = {w for v in frontier for w in g_dir.predecessors(v)} - reach_in
        reach_in |= nxt
        frontier = nxt
    weak = set()
    for comp in nx.connected_components(g_und):
        if comp & core:
            weak |= comp
    want_region = {}
    for v in map(int, g_und.nodes):
        want_region[v] = ("CORE" if v in core else
                          "OUT" if v in reach_out else
                          "IN" if v in reach_in else
                          "TENDRIL" if v in weak else "DISCONNECTED")
    got_region = dict(zip(bt["vertex"], bt["region"]))
    out["bowtie_counts"] = {k: int(v) for k, v
                            in bt["region"].value_counts().items()}
    out["bowtie_exact"] = bool(got_region == want_region)

    # fifth-session additions: MSF weight/forest structure, 2-sweep
    # eccentricities, landmark sketch distances
    from wikilinks_ray.pipelines.derived import derived_weighted_edges
    from wikilinks_ray.pipelines.mst import boruvka_msf

    wdf = derived_weighted_edges(sf_dir).to_pandas()
    gw = nx.Graph()
    gw.add_weighted_edges_from(wdf.itertuples(index=False))
    forest = boruvka_msf(derived_weighted_edges(sf_dir))
    want_w = sum(d["weight"] for _, _, d in
                 nx.minimum_spanning_edges(gw, algorithm="kruskal"))
    fg = nx.Graph()
    fg.add_edges_from(forest[["u", "v"]].itertuples(index=False))
    out["mst_edges"] = int(len(forest))
    out["mst_exact"] = bool(
        int(forest["w"].sum()) == int(want_w) and nx.is_forest(fg)
        and len(forest) == gw.number_of_nodes()
        - nx.number_connected_components(gw))

    with DerivedGraph(sf_dir, symmetric=True) as gsym:
        vs2 = gsym.vertices
        s0 = int(vs2.min())
        d0 = multi_source_bfs(gsym.actors, gsym.n, [s0]).distances()[:, 0]
        reach0 = vs2[d0[vs2] >= 0]
        ecc0 = int(d0[reach0].max())
        s1 = int(reach0[d0[reach0] == ecc0].min())
        d1 = multi_source_bfs(gsym.actors, gsym.n, [s1]).distances()[:, 0]
        ecc1 = int(d1[vs2[d1[vs2] >= 0]].max())
        comp0 = nx.node_connected_component(g_und, s0)
        H = g_und.subgraph(comp0)
        out["diameter_sweep"] = [ecc0, ecc1]
        out["diameter_exact"] = bool(
            ecc0 == nx.eccentricity(H, v=s0)
            and ecc1 == nx.eccentricity(H, v=s1))

        lms = [int(x) for x in np.sort(vs2)[:8]]
        D = multi_source_bfs(gsym.actors, gsym.n, lms).distances()
        ok = True
        for j, s in enumerate(lms):
            want_d = nx.single_source_shortest_path_length(g_und, s)
            dj = D[:, j]
            got_d = {int(v): int(dj[v]) for v in vs2 if dj[v] >= 0}
            ok &= got_d == {int(k): int(v) for k, v in want_d.items()}
        out["landmarks_exact"] = bool(ok)

    print(json.dumps(out))
    ray.shutdown()
    return 0 if all(v for k, v in out.items()
                    if k.endswith(("_exact", "_ok"))) else 1


if __name__ == "__main__":
    sys.exit(main())

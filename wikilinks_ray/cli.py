"""CLI entry points — the Ray-native analog of the reference's clikt
commands (Main.kt:29-200: ``convert`` and ``query``) plus ``bench``.

    python -m wikilinks_ray convert --pages DIR --out GRAPH_DIR
    python -m wikilinks_ray query --graph GRAPH_DIR [--benchmark]
    python -m wikilinks_ray generate --out DIR --n-pages N [--seed S]

``query`` runs the interactive loop of Interactive.kt:10-96: enter
"Start title -> End title" to search a route; a trailing ``#`` on a
name lists up to 10 prefix matches (Main.kt:323); ``<`` picks a random
page; empty line exits. ``--benchmark`` times 50 seeded-random routes
with Welford stats (Main.kt:341-384, Benchmarking.java:14-34, seed
0xcafebabe).

The CLI owns its Ray session (guarded init; library code never inits).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray():
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def cmd_generate(args) -> int:
    from .sources.corpus import write_pages_corpus

    write_pages_corpus(args.out, n_pages=args.n_pages, seed=args.seed,
                       n_shards=args.shards)
    print(f"wrote {args.n_pages}-page corpus to {args.out}")
    return 0


def cmd_convert(args) -> int:
    ray = _init_ray()
    import ray.data as rd

    from .pipelines.build import build_graph

    res = build_graph(rd.read_parquet(args.pages), args.out,
                      num_partitions=args.partitions,
                      extract_concurrency=args.concurrency,
                      overwrite=args.overwrite)
    print(json.dumps(res.stats.__dict__, indent=1))
    ray.shutdown()
    return 0


class _Welford:
    """Running mean/stddev/min/max (Main.kt:360-384, Benchmarking.java:61-85)."""

    def __init__(self):
        self.n = 0
        self.mean = 0.0
        self.m2 = 0.0
        self.min = float("inf")
        self.max = float("-inf")
        self.sum = 0.0

    def add(self, x: float):
        self.n += 1
        d = x - self.mean
        self.mean += d / self.n
        self.m2 += d * (x - self.mean)
        self.min = min(self.min, x)
        self.max = max(self.max, x)
        self.sum += x

    def stddev(self) -> float:
        return (self.m2 / self.n) ** 0.5 if self.n else 0.0


def route_benchmark(actors, n, index, n_pairs: int = 50,
                    seed: int = 0xCAFEBABE, rev_actors=None,
                    check_corpus: str | None = None) -> dict:
    """Seeded-random route benchmark (Q5, Benchmarking.java:14-34).
    With ``rev_actors`` the bidirectional finder runs (RouteFinder
    analog); otherwise plain level-synchronous BFS.

    ``check_corpus``: path to a pinned-pair corpus
    (``tests/fixtures/route_corpus.json``: 50 (src, dst, expected_len)
    title pairs with networkx-oracled lengths) — the benchmark then
    doubles as a correctness gate, the ``runBenchmarksAndTest`` analog
    (Benchmarking.java:87-138). Mismatched lengths are counted in
    ``wrong`` and listed in ``mismatches``."""
    import numpy as np

    from .pipelines.bfs import shortest_route
    from .pipelines.bidirectional import bidirectional_route

    def find(s: int, t: int):
        if rev_actors is not None:
            return bidirectional_route(actors, rev_actors, n, s, t)
        return shortest_route(actors, n, s, t)

    w = _Welford()
    if check_corpus is not None:
        import json as _json

        with open(check_corpus) as f:
            corpus = _json.load(f)
        found = 0
        wrong = []
        for p in corpus["pairs"]:
            s = index.lookup(p["src"])
            t = index.lookup(p["dst"])
            if s is None or t is None:
                # title absent from this graph (wrong corpus / changed
                # semantics): record a mismatch instead of crashing
                wrong.append({"src": p["src"], "dst": p["dst"],
                              "expected": p["len"], "got": "missing-title"})
                continue
            t0 = time.perf_counter()
            route = find(s, t)
            w.add((time.perf_counter() - t0) * 1000.0)
            got = len(route) - 1 if route is not None else -1
            if route is not None:
                found += 1
            if got != p["len"]:
                wrong.append({"src": p["src"], "dst": p["dst"],
                              "expected": p["len"], "got": got})
        return {"pairs": len(corpus["pairs"]), "found": found,
                "wrong": len(wrong), "mismatches": wrong[:10],
                "mean_ms": round(w.mean, 2), "stddev_ms": round(w.stddev(), 2),
                "min_ms": round(w.min, 2), "max_ms": round(w.max, 2),
                "sum_ms": round(w.sum, 2)}

    rng = np.random.default_rng(seed)
    found = 0
    for _ in range(n_pairs):
        s, _st = index.random_vertex(rng)
        t, _tt = index.random_vertex(rng)
        t0 = time.perf_counter()
        route = find(s, t)
        w.add((time.perf_counter() - t0) * 1000.0)
        if route is not None:
            found += 1
    return {"pairs": n_pairs, "found": found, "mean_ms": round(w.mean, 2),
            "stddev_ms": round(w.stddev(), 2), "min_ms": round(w.min, 2),
            "max_ms": round(w.max, 2), "sum_ms": round(w.sum, 2)}


def route_throughput(pools, n, index, n_pairs: int = 50,
                     seed: int = 0xCAFEBABE, concurrency: int = 8) -> dict:
    """Concurrent route THROUGHPUT over REPLICATED shard pools.

    ``pools`` is a list of (fwd_actors, rev_actors) replicas; driver
    threads round-robin searches across them. One shared pool does NOT
    scale throughput — each actor serializes requests, so concurrent
    searches head-of-line block each other (measured: qps *drops* with
    threads on a single replica). Replicas are the scale-out unit for
    query throughput, exactly as shards are for graph capacity: on a
    cluster, replicas live on different nodes. Search state is per-call
    (object-store refs); the adjacency inside each actor is read-only.
    """
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from .pipelines.bidirectional import bidirectional_route

    rng = np.random.default_rng(seed)
    pairs = [(index.random_vertex(rng)[0], index.random_vertex(rng)[0])
             for _ in range(n_pairs)]
    R = len(pools)

    def run(i_pair):
        i, (s, t) = i_pair
        fwd, rev = pools[i % R]
        return bidirectional_route(fwd, rev, n, s, t)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=concurrency) as ex:
        routes = list(ex.map(run, enumerate(pairs)))
    wall = time.perf_counter() - t0
    return {"pairs": n_pairs, "replicas": R, "concurrency": concurrency,
            "found": sum(r is not None for r in routes),
            "wall_s": round(wall, 3),
            "qps": round(n_pairs / wall, 1)}


def _load_query_state(graph_dir: str, num_shards: int | None,
                      bidirectional: bool = False):
    import json as _json

    from .pipelines.build import GraphBuildResult, GraphStats
    from .state import fsio
    from .state.csr import (create_shard_actors, default_num_shards,
                            shard_edges)
    from .state.lookup import VertexIndex

    stats = GraphStats(
        **_json.loads(fsio.read_text(fsio.join(graph_dir, "_STATS.json"))))
    res = GraphBuildResult(fsio.join(graph_dir, "vertices"),
                           fsio.join(graph_dir, "edges"), stats)
    n = stats.n_vertices
    if num_shards is None:
        # routes want SMALL pools (latency grows with P — BASELINE.md);
        # throughput scales by replicas, not width
        num_shards = default_num_shards(n, kind="route")
    paths = shard_edges(res.edges(), n, num_shards,
                        fsio.join(graph_dir, "csr_fwd"), by="src")
    actors, _ = create_shard_actors(paths, n)
    rev = None
    if bidirectional:
        # reverse CSR (transpose) shards — the reference's paired
        # outEdges/inEdges sections (SegmentWikiGraphStore.kt:100-114)
        rpaths = shard_edges(res.edges(), n, num_shards,
                             fsio.join(graph_dir, "csr_rev"), by="dst")
        rev, _ = create_shard_actors(rpaths, n, key="dst")
    index = VertexIndex(res.vertices_path, n, num_shards)
    return res, n, actors, rev, index, num_shards


def cmd_query(args) -> int:
    ray = _init_ray()

    from .pipelines.bfs import shortest_route
    from .pipelines.bidirectional import bidirectional_route

    res, n, actors, rev, index, n_shards = _load_query_state(
        args.graph, args.shards, bidirectional=args.bidirectional)
    print(f"graph loaded: {n} vertices, {res.stats.n_edges} edges")

    def find(s: int, t: int):
        if rev is not None:
            return bidirectional_route(actors, rev, n, s, t)
        return shortest_route(actors, n, s, t)

    if args.benchmark or args.benchmark_corpus:
        print(json.dumps(route_benchmark(actors, n, index, rev_actors=rev,
                                         check_corpus=args.benchmark_corpus)))
        if args.throughput and rev is not None:
            from .state import fsio as _fsio

            from .state.csr import create_shard_actors, shard_edges

            pools = [(actors, rev)]
            for _ in range(max(1, args.replicas) - 1):
                fp = shard_edges(res.edges(), n, n_shards,
                                 _fsio.join(args.graph, "csr_fwd"), by="src")
                rp = shard_edges(res.edges(), n, n_shards,
                                 _fsio.join(args.graph, "csr_rev"), by="dst")
                f2, _ = create_shard_actors(fp, n)
                r2, _ = create_shard_actors(rp, n, key="dst")
                pools.append((f2, r2))
            print(json.dumps(route_throughput(
                pools, n, index, concurrency=args.throughput)))
        ray.shutdown()
        return 0

    def resolve(name: str) -> int | None:
        name = name.strip()
        if name.endswith("#"):
            matches = index.prefix_search(name[:-1], 10)
            print(f"  prefix '{name[:-1]}' -> " +
                  ", ".join(t for _, t in matches))
            return None
        if name == "<":
            import numpy as np

            vid, title = index.random_vertex(np.random.default_rng())
            print(f"  random page: {title}")
            return vid
        vid = index.lookup(name)
        if vid is None:
            print(f"  no page named '{name}'")  # BadRouteException analog
        return vid

    print('enter "Start -> End" (name# = prefix search, < = random, empty = quit)')
    for line in sys.stdin:
        line = line.strip()
        if not line:
            break
        if "->" not in line:
            if line.endswith("#"):
                resolve(line)  # bare prefix search (Interactive.kt wildcard)
            else:
                print("  expected: Start -> End")
            continue
        a, b = line.split("->", 1)
        s, t = resolve(a), resolve(b)
        if s is None or t is None:
            continue
        t0 = time.perf_counter()
        route = find(s, t)
        ms = (time.perf_counter() - t0) * 1000
        if route is None:
            print(f"  no route ({ms:.0f} ms)")
        else:
            names = [index.title_of(v) for v in route]
            print("  " + " -> ".join(names) + f"  ({ms:.0f} ms)")
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="wikilinks_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write a synthetic pages corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--n-pages", type=int, default=2000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--shards", type=int, default=8)
    g.set_defaults(fn=cmd_generate)

    c = sub.add_parser("convert", help="pages parquet -> graph (vertices+edges)")
    c.add_argument("--pages", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--partitions", type=int, default=16)
    c.add_argument("--concurrency", type=int, default=8)
    c.add_argument("--overwrite", action="store_true")
    c.set_defaults(fn=cmd_convert)

    q = sub.add_parser("query", help="interactive route queries / benchmark")
    q.add_argument("--graph", required=True)
    q.add_argument("--shards", type=int, default=None,
               help="route pool size; default: auto (small pool, state/csr.py default_num_shards)")
    q.add_argument("--benchmark", action="store_true")
    q.add_argument("--throughput", type=int, default=0,
                   help="also measure concurrent-route throughput at K threads")
    q.add_argument("--replicas", type=int, default=1,
                   help="shard-pool replicas for the throughput benchmark")
    q.add_argument("--benchmark-corpus", default=None,
                   help="pinned (src,dst,len) corpus json: benchmark + assert")
    q.add_argument("--bidirectional", action="store_true",
                   help="use the bidirectional finder (builds reverse CSR)")
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

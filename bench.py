"""Benchmark harness for wikilinks_ray.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N}

``--scaling`` runs the same benchmark twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the
north-rule's N vs 4N cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import logging

    import numpy as np
    import ray

    if not ray.is_initialized():
        # log_to_driver=False: worker log lines would interleave with the
        # single JSON stdout line the driver parses
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from wikilinks_ray.ops.dedup import ngram_jaccard_pairs
    from wikilinks_ray.ops.similarity import brute_force_top_k
    from wikilinks_ray.ops.text import analyze_text
    from wikilinks_ray.pipelines.bfs import multi_source_bfs
    from wikilinks_ray.pipelines.build import build_graph
    from wikilinks_ray.pipelines.components import connected_components, symmetrize_edges
    from wikilinks_ray.pipelines.derived import DerivedGraph
    from wikilinks_ray.pipelines.pagerank import pagerank
    from wikilinks_ray.pipelines.triangles import triangle_count
    from wikilinks_ray.sources.corpus import write_pages_corpus

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0
    n_pages = max(2000, int(200_000 * sf))
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- flagship: pages corpus -> extraction -> graph build --------------
    # cache key includes CORPUS_VERSION: /tmp persists across driver
    # rounds, and a stale corpus from an older generator silently shifts
    # edge counts (the r2/r3 one-edge diff)
    from wikilinks_ray.sources.corpus import CORPUS_VERSION

    corpus_dir = f"/tmp/wl_bench_corpus_{n_pages}_v{CORPUS_VERSION}"
    if not os.path.exists(os.path.join(corpus_dir, "part-00000.parquet")):
        write_pages_corpus(corpus_dir, n_pages=n_pages, seed=42,
                           n_shards=max(8, num_cpus))
    pages = rd.read_parquet(corpus_dir)
    pages.count()  # warm page cache: measure compute+shuffle, not cold disk

    import shutil

    graph_dir = f"/tmp/wl_bench_graph_{n_pages}_{num_cpus}"
    shutil.rmtree(graph_dir, ignore_errors=True)
    t0 = time.perf_counter()
    built = build_graph(pages, graph_dir, num_partitions=max(8, num_cpus // 2),
                        extract_concurrency=max(2, num_cpus // 2),
                        overwrite=True)
    timings["ingest_graph_build"] = time.perf_counter() - t0
    extras["n_vertices"] = built.stats.n_vertices
    extras["n_edges"] = built.stats.n_edges

    # --- graph analytics over the built pages graph -----------------------
    num_shards = max(4, num_cpus // 4)
    n = built.stats.n_vertices
    from wikilinks_ray.state.csr import create_shard_actors, shard_edges

    t0 = time.perf_counter()
    fwd_paths = shard_edges(built.edges(), n, num_shards,
                            f"{graph_dir}/csr_fwd", by="src")
    fwd, _ = create_shard_actors(fwd_paths, n)
    timings["csr_build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pr = pagerank(fwd, n, tol=1e-10, max_iter=50, checkpoint_dir=None)
    timings["pagerank"] = time.perf_counter() - t0
    edges_traversed = built.stats.n_edges * pr.iterations
    extras["pagerank_iters"] = pr.iterations
    extras["pagerank_gteps"] = edges_traversed / timings["pagerank"] / 1e9

    sym_paths = shard_edges(symmetrize_edges(built.edges()), n, num_shards,
                            f"{graph_dir}/csr_sym", by="src")
    symA, _ = create_shard_actors(sym_paths, n)
    t0 = time.perf_counter()
    cc = connected_components(symA, n)
    timings["connected_components"] = time.perf_counter() - t0
    extras["cc_iters"] = cc.iterations

    t0 = time.perf_counter()
    rng = np.random.default_rng(0xCAFEBABE)  # reference benchmark seed
    sources = rng.integers(0, n, 8).tolist()
    multi_source_bfs(fwd, n, sources)
    timings["multi_source_bfs"] = time.perf_counter() - t0

    # signature workload: seeded route queries over fwd+rev CSR
    # (reference benchmark protocol, Benchmarking.java:14-34)
    from wikilinks_ray.pipelines.bidirectional import bidirectional_route

    t0 = time.perf_counter()
    rev_paths = shard_edges(built.edges(), n, num_shards,
                            f"{graph_dir}/csr_rev", by="dst")
    rev, _ = create_shard_actors(rev_paths, n, key="dst")
    timings["csr_rev_build"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    pairs = [(int(rng.integers(n)), int(rng.integers(n))) for _ in range(10)]
    found = sum(bidirectional_route(fwd, rev, n, s, t) is not None
                for s, t in pairs)
    timings["route_queries"] = time.perf_counter() - t0
    extras["routes_found"] = found
    for a in rev:
        ray.kill(a)

    t0 = time.perf_counter()
    extras["triangles"] = triangle_count(built.edges(),
                                         num_partitions=num_shards)
    timings["triangles"] = time.perf_counter() - t0

    for a in fwd + symA:
        ray.kill(a)

    # --- training-data ops over the driver tables -------------------------
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    t0 = time.perf_counter()
    ngram_jaccard_pairs(docs, threshold=0.5,
                        num_partitions=max(4, num_cpus // 4),
                        concurrency=max(2, num_cpus // 2)).count()
    timings["dedup_ngram_jaccard"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    docs.map_batches(analyze_text, batch_format="pyarrow",
                     concurrency=max(2, num_cpus // 2)).count()
    timings["text_analysis"] = time.perf_counter() - t0

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb.limit(16).to_pandas()
    queries_m = np.stack(qdf["embedding"].to_numpy())
    t0 = time.perf_counter()
    brute_force_top_k(emb, queries_m, k=10)
    timings["similarity_topk"] = time.perf_counter() - t0

    total = sum(timings.values())
    return {
        "metric": "headline_pipeline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "extras": {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in extras.items()},
        "sf": sf,
        "num_cpus": num_cpus,
    }


def run_scaling_workload(num_cpus: int, n_pages: int = 400_000) -> dict:
    """Scaling pipeline: link extraction + text analysis + SimHash +
    MinHash over a cached synthetic corpus (shared by both levels).

    These map-only parse stages are where a 100 TB ingest spends its
    time, and they are CPU-bound per batch with no shuffle — the honest
    probe of throughput scaling. The iterative-superstep exchange, by
    contrast, is object-store/scheduler overhead-bound at sandbox scale
    (sub-second per-iteration compute); its wall-clock is reported in the
    headline bench and analysed in BASELINE.md rather than pretending it
    scales on one box.
    """
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from wikilinks_ray.ops.dedup import MinHasher, SimHasher
    from wikilinks_ray.ops.text import TextAnalyzer
    from wikilinks_ray.sources.corpus import CORPUS_VERSION, write_pages_corpus
    from wikilinks_ray.stages.extract import extract_combined

    corpus = f"/tmp/wl_scale_corpus_{n_pages}_v{CORPUS_VERSION}"
    if not os.path.exists(os.path.join(corpus, "part-00000.parquet")):
        write_pages_corpus(corpus, n_pages=n_pages, seed=42, n_shards=128)

    pages = rd.read_parquet(corpus)
    pages.count()  # warm page cache

    import pyarrow as pa

    class FusedParse:
        """One pass: link extraction + text analysis + SimHash + MinHash
        per page — the production shape (read the heavy input once, run
        every per-document model over it), and one actor pool instead of
        four (pool startup is a fixed cost per stage execution)."""

        def __init__(self):
            self.ex = extract_combined
            self.ta = TextAnalyzer()
            self.sh = SimHasher()
            self.mh = MinHasher()

        def __call__(self, batch: pa.Table) -> pa.Table:
            docs = pa.table({
                "doc_id": pa.array(range(batch.num_rows), pa.int64()),
                "text": batch.column("text"),
            })
            ext = self.ex(batch)
            ta = self.ta(docs)
            sh = self.sh(docs)
            mh = self.mh(docs)
            return pa.table({
                "rows": pa.array(
                    [ext.num_rows, ta.num_rows, sh.num_rows, mh.num_rows],
                    pa.int64())
            })

    # task-based stage: Ray task workers persist across Dataset
    # executions, so the warmup run below pays worker start + library
    # imports once and the timed run reuses warm workers (an actor pool
    # would cold-start ~num_cpus fresh processes inside the timed
    # window). The instance cache lives per deserialized task closure —
    # construction itself is milliseconds.
    _cache = {}

    def fused_parse(batch: "pa.Table") -> "pa.Table":
        if "fp" not in _cache:
            _cache["fp"] = FusedParse()
        return _cache["fp"](batch)

    # warm enough batches that EVERY task worker starts + imports before
    # the timed window (a tiny warmup only spins up a few workers and the
    # timed run pays the remaining cold starts)
    pages.limit(max(50_000, n_pages // 8)).map_batches(
        fused_parse, batch_format="pyarrow", batch_size=512).count()
    t0 = time.perf_counter()
    n_out = pages.map_batches(fused_parse, batch_format="pyarrow",
                              batch_size=512).count()
    wall = time.perf_counter() - t0
    return {
        "value": round(wall, 3),
        "pages_per_sec": round(n_pages / wall, 1),
        "out_rows": n_out,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
    }


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        import subprocess

        def run(ncpu: int) -> dict:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
            out = subprocess.run([sys.executable, os.path.abspath(__file__),
                                  "--scaling-worker"],
                                 env=env, capture_output=True, text=True,
                                 check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
            return json.loads(out.stdout.strip().splitlines()[-1])

        # default pair 2 vs 8 (N vs 4N): the below-saturation regime that
        # represents N->4N cluster nodes with per-node caches. 8 vs 32 on
        # this box runs into its shared-cache/turbo ceiling (raw
        # multiprocessing itself only scales ~0.81 there — see
        # BASELINE.md "Scaling efficiency" for both pairs + calibration).
        lo = int(os.environ.get("WL_SCALE_LO", "2"))
        hi = int(os.environ.get("WL_SCALE_HI", "8"))
        r_lo, r_hi = run(lo), run(hi)
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "workload": "fused parse (extract+textanalysis+simhash+minhash) over 400k-page corpus",
            "sec_lo": r_lo["value"], "rate_lo": r_lo["pages_per_sec"], "cpus_lo": lo,
            "sec_hi": r_hi["value"], "rate_hi": r_hi["pages_per_sec"], "cpus_hi": hi,
        }))
        return

    if "--scaling-worker" in sys.argv:
        result = run_scaling_workload(num_cpus)
        import ray

        ray.shutdown()
        print(json.dumps(result))
        return

    result = run_benchmarks(sf_dir, num_cpus)
    import ray

    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Round-5 fourth-session soaks: the two new operator families at
4M-doc / 5M-edge scale.

1. ``train_bpe`` + ``bpe_encode_token_counts``: 4M synthetic Zipf docs
   (50k-word vocabulary, ~40 words/doc => ~160M token occurrences),
   20 merges at 32 shards, then the full encode join back over the
   corpus. Checks: merge list non-trivial, encoded totals == exact
   recount on a sample.
2. ``louvain_multilevel``: 400k-vertex / ~5M-edge random digraph with
   planted blocks, P=16 shards, 6+6 rounds. Checks: phase-2 coarsens,
   labels canonical, both phases timed separately.

Deterministic (seeded); prints one JSON line per soak.

Usage: python tools/soak_r5b.py [--stage bpe|louvain|all] [--n N]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 50_000
WORDS_PER_DOC = 40


def _init():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def synth_docs(n_docs: int):
    """Zipf word streams, deterministic per doc id."""
    import ray.data as rd

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        texts = []
        for did in ids:
            rng = np.random.default_rng(int(did) + 7)
            w = (rng.zipf(1.3, WORDS_PER_DOC) - 1) % VOCAB
            texts.append(" ".join(f"w{int(x):05d}" for x in w))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return rd.range(n_docs).map_batches(gen, batch_format="pyarrow",
                                        batch_size=16384)


def soak_bpe(n_docs: int):
    from wikilinks_ray.ops.bpe import bpe_encode_token_counts, train_bpe

    docs = synth_docs(n_docs).materialize()
    t0 = time.time()
    merges, vocab = train_bpe(docs, num_merges=20, num_shards=32,
                              return_vocab=True)
    t_train = time.time() - t0
    t0 = time.time()
    enc = bpe_encode_token_counts(docs, vocab).materialize()
    t_enc = time.time() - t0
    total = sum(
        b.column("bpe_vocab_tokens").to_numpy(zero_copy_only=False).sum()
        for b in ray.get(enc.to_arrow_refs()) if b.num_rows)
    n_rows = enc.count()
    assert n_rows == n_docs, (n_rows, n_docs)
    # exact recount on a sample of docs through the merge list
    import re

    sample = docs.limit(50).to_pandas()
    seq_cache: dict[str, list[str]] = {}
    ml = list(zip(merges.column("lhs").to_pylist(),
                  merges.column("rhs").to_pylist(),
                  merges.column("merged").to_pylist()))

    def encode_word(w: str) -> int:
        if w in seq_cache:
            return len(seq_cache[w])
        s = list(w)
        for l, r, m in ml:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(m)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        seq_cache[w] = s
        return len(s)

    enc_map = {}
    for b in ray.get(enc.to_arrow_refs()):
        if b.num_rows:
            for did, n in zip(b.column("doc_id").to_pylist(),
                              b.column("bpe_vocab_tokens").to_pylist()):
                if did < 200:
                    enc_map[did] = n
    for did, text in zip(sample["doc_id"], sample["text"]):
        want = sum(encode_word(w)
                   for w in re.findall(r"\w+", text.lower()))
        if did in enc_map:
            assert enc_map[did] == want, (did, enc_map[did], want)
    print(json.dumps({
        "soak": "bpe", "n_docs": n_docs, "n_merges": merges.num_rows,
        "train_sec": round(t_train, 1), "encode_sec": round(t_enc, 1),
        "total_tokens": int(total),
        "docs_per_sec_train": int(n_docs / t_train),
    }), flush=True)


def soak_louvain(n_vertices: int, avg_deg: int = 12):
    import ray.data as rd

    from wikilinks_ray.pipelines.louvain import (louvain_multilevel,
                                                 louvain_rounds,
                                                 undirected_simple_edges)
    from wikilinks_ray.state.csr import create_shard_actors, shard_edges

    rng = np.random.default_rng(17)
    m = n_vertices * avg_deg // 2
    # planted 1000-block structure: 70% intra-block edges
    blocks = n_vertices // 1000
    src = rng.integers(0, n_vertices, m)
    intra = rng.random(m) < 0.7
    off = rng.integers(1, blocks, m)
    dst = np.where(intra,
                   (src // blocks) * blocks + (src + off) % blocks,
                   rng.integers(0, n_vertices, m))
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    }))
    sym = undirected_simple_edges(edges).materialize()
    d = "/tmp/wikilinks_soak_louvain"
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    t0 = time.time()
    paths = shard_edges(sym, n_vertices, 16, d, by="src")
    actors, _ = create_shard_actors(paths, n_vertices)
    degs = np.concatenate(ray.get([a.out_degrees.remote()
                                   for a in actors]))
    t_shard = time.time() - t0
    t0 = time.time()
    p1 = louvain_rounds(actors, n_vertices, degs, rounds=6)
    t_p1 = time.time() - t0
    t0 = time.time()
    res = louvain_multilevel(actors, sym, n_vertices, degs,
                             rounds1=6, rounds2=6, shard_dir=d + "_l2")
    t_full = time.time() - t0
    for a in actors:
        ray.kill(a)
    present = degs > 0
    assert (res.phase1_labels[present] == p1.labels[present]).all()
    assert res.n_final <= res.n_phase1
    print(json.dumps({
        "soak": "louvain", "n_vertices": n_vertices,
        "n_sym_edges": sym.count(), "shard_sec": round(t_shard, 1),
        "phase1_sec": round(t_p1, 1), "multilevel_sec": round(t_full, 1),
        "n_phase1": res.n_phase1, "n_final": res.n_final,
    }), flush=True)


if __name__ == "__main__":
    stage = "all"
    n = None
    args = sys.argv[1:]
    if "--stage" in args:
        stage = args[args.index("--stage") + 1]
    if "--n" in args:
        n = int(args[args.index("--n") + 1])
    _init()
    if stage in ("bpe", "all"):
        soak_bpe(n or 4_000_000)
    if stage in ("louvain", "all"):
        soak_louvain(n or 400_000)
    ray.shutdown()

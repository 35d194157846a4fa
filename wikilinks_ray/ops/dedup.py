"""Deduplication operators for training-data pipelines.

Five flavors over ``documents(doc_id, text, ...)`` / ``embeddings``:

- exact: content-hash partition + min-id winner per group (one shuffle);
- n-gram Jaccard (exact): shingle inverted index -> self-join on shingle
  -> per-pair intersection counts -> Jaccard threshold. Exact, fully
  SQL-expressible (the oracle-checkable near-dup path);
- MinHash + LSH banding: per-batch signatures -> (band, band_hash)
  groupby buckets -> candidate pairs -> exact-Jaccard verification
  (probabilistic recall; candidates only, verified pairs exact);
- SimHash: 64-bit signatures; near-dups = hamming distance <= k within
  LSH-rotated buckets (engine-only);
- embedding cosine: blockwise matmul against a broadcast matrix
  (small corpora) — at scale, bucket by LSH hyperplanes first
  (ops/similarity.py does exactly that for top-k).

Every operator keeps the hot path vectorized (numpy over hashed shingle
arrays); Python loops only assemble per-document lists.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_WORD_RE = re.compile(r"\w+", re.UNICODE)

MERSENNE = (1 << 61) - 1


_POLY = np.uint64(0x100000001B3)  # odd multiplier; combines mod 2^64


class _TokenHasher:
    """Token→uint64 md5 cache held per actor.

    md5 (stable across processes — Python's builtin hash is salted) runs
    once per DISTINCT token per actor at C speed; k-gram shingle hashes
    then derive from the token-hash array with a vectorized rolling
    polynomial. The previous implementation md5-hashed every k-gram
    STRING in a Python loop — ~k× the bytes and one interpreter
    iteration per gram — and dominated the whole dedup stage.
    """

    def __init__(self):
        self.cache: dict[str, int] = {}

    def token_hashes(self, tokens: list[str]) -> np.ndarray:
        c = self.cache
        if len(c) > 4_000_000:  # bound actor memory on open vocabularies
            c.clear()
        for t in tokens:
            if t not in c:
                c[t] = int.from_bytes(
                    hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
        return np.fromiter((c[t] for t in tokens), dtype=np.uint64,
                           count=len(tokens))

    def shingles(self, tokens: list[str], k: int) -> np.ndarray:
        """Distinct word-k-gram shingle hashes; documents shorter than k
        tokens contribute one whole-document gram (same identity
        semantics as hashing the space-joined gram strings: equal token
        windows collide, unequal ones don't, w.h.p. on 64 bits)."""
        h = self.token_hashes(tokens)
        n = len(h)
        if n == 0:
            return np.empty(0, np.uint64)
        kk = min(k, n)
        g = h[:n - kk + 1].copy()
        for j in range(1, kk):
            g = g * _POLY + h[j:j + n - kk + 1]
        return np.unique(g)


def exact_dedup_keep_min(docs: "ray.data.Dataset", *, key: str = "text",
                         id_col: str = "doc_id") -> "ray.data.Dataset":
    """Exact dedup: one surviving row id per distinct ``key`` (the
    smallest id wins — deterministic). Returns (doc_id,) of survivors.

    Hash the content first so the shuffle moves 16-byte digests, not
    full documents."""

    def add_hash(t: pa.Table) -> pa.Table:
        # full 128-bit digest as two int64 key columns: a truncated
        # 64-bit key would see birthday collisions (false merges) at
        # 10^12-document scale
        h1, h2 = [], []
        for x in t.column(key).to_pylist():
            d = hashlib.md5((x or "").encode("utf-8")).digest()
            h1.append(int.from_bytes(d[:8], "little", signed=True))
            h2.append(int.from_bytes(d[8:], "little", signed=True))
        return pa.table({id_col: t.column(id_col),
                         "__h1": pa.array(h1, pa.int64()),
                         "__h2": pa.array(h2, pa.int64())})

    from ..stages.agg import grouped_agg

    kept = grouped_agg(docs.map_batches(add_hash, batch_format="pyarrow"),
                       ["__h1", "__h2"], id_col, "min", out_col=id_col)
    return kept.select_columns([id_col])


class ShingleSignatures:
    """documents -> one row per (doc_id, shingle_hash). Stateless-ish
    actor stage (regex compiled once)."""

    def __init__(self, k: int = 3):
        self.k = k
        self.hasher = _TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_sh = [], []
        for i, text in zip(ids, texts):
            sh = self.hasher.shingles(_WORD_RE.findall((text or "").lower()), self.k)
            out_id.append(np.full(len(sh), i, dtype=np.int64))
            out_sh.append(sh)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id) if out_id else [], pa.int64()),
            "shingle": pa.array(np.concatenate(out_sh) if out_sh else [], pa.uint64()),
        })


def benchmark_gram_hashes(benchmark, k: int = 8, *,
                          text_col: str = "text",
                          concurrency: int = 2) -> np.ndarray:
    """Sorted distinct word-k-gram hashes of a benchmark corpus.

    ``benchmark`` is a Dataset or a plain list of strings. The result is
    collected to the driver — the benchmark side of a decontamination
    pass is small BY DEFINITION (eval suites are thousands of
    documents, the corpus is the 100 TB side), which is exactly why the
    right shape is broadcast-benchmark + stream-corpus rather than a
    shuffle join on gram hashes."""
    if isinstance(benchmark, (list, tuple)):
        hasher = _TokenHasher()
        parts = [hasher.shingles(_WORD_RE.findall((t or "").lower()), k)
                 for t in benchmark]
        parts = [p for p in parts if len(p)]
        return (np.unique(np.concatenate(parts)) if parts
                else np.empty(0, np.uint64))

    def grams(t: pa.Table) -> pa.Table:
        hasher = _TokenHasher()
        parts = [hasher.shingles(_WORD_RE.findall((x or "").lower()), k)
                 for x in t.column(text_col).to_pylist()]
        parts = [p for p in parts if len(p)]
        u = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, np.uint64))
        return pa.table({"gram": pa.array(u, pa.uint64())})

    got = benchmark.map_batches(grams, batch_format="pyarrow",
                                concurrency=concurrency).take_all()
    if not got:
        return np.empty(0, np.uint64)
    return np.unique(np.fromiter((r["gram"] for r in got),
                                 dtype=np.uint64, count=len(got)))


class _ContaminationFlagger:
    """Per-doc any-gram-in-benchmark membership via searchsorted on the
    broadcast sorted benchmark gram array. A callable INSTANCE (task
    pool, like ShingleSignatures) — an actor pool sized near the CPU
    count can starve the read stage on small machines; the benchmark
    array travels as an object ref and is ray.get (zero-copy) per
    task."""

    def __init__(self, bench_ref, k: int, id_col: str, text_col: str):
        self.bench_ref = bench_ref
        self.k = k
        self.id_col = id_col
        self.text_col = text_col
        self.hasher = _TokenHasher()

    def __call__(self, t: pa.Table) -> pa.Table:
        bench = ray.get(self.bench_ref)  # sorted uint64, zero-copy
        flags = []
        for x in t.column(self.text_col).to_pylist():
            sh = self.hasher.shingles(
                _WORD_RE.findall((x or "").lower()), self.k)
            if len(sh) == 0 or len(bench) == 0:
                flags.append(False)
                continue
            idx = np.searchsorted(bench, sh)
            idx[idx == len(bench)] = len(bench) - 1
            flags.append(bool(np.any(bench[idx] == sh)))
        return pa.table({
            self.id_col: t.column(self.id_col),
            "contaminated": pa.array(flags, pa.bool_()),
        })


class _CleanFilter(_ContaminationFlagger):
    """mode="drop": pass through only uncontaminated full rows."""

    def __call__(self, t: pa.Table) -> pa.Table:
        f = (super().__call__(t).column("contaminated")
             .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(~f))


def decontaminate(
    docs: "ray.data.Dataset",
    benchmark,
    *,
    k: int = 8,
    mode: str = "flag",
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Benchmark decontamination: a document is contaminated when it
    shares at least one word-k-gram with the benchmark corpus (the
    standard n-gram-overlap eval-leak check; k=8 is the usual window
    for verbatim leakage).

    ``mode="flag"`` returns (id_col, contaminated); ``mode="drop"``
    returns the surviving full rows. The benchmark gram set is hashed
    once, sorted, broadcast via ``ray.put`` and probed per batch with
    ``searchsorted`` — one streaming pass over the corpus, no shuffle,
    no benchmark re-ship per batch. Documents shorter than k tokens
    hash as one whole-document gram (same rule as the dedup shingles),
    so a short doc is flagged only on an exact short-doc match."""
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be flag|drop, got {mode!r}")
    bench = benchmark_gram_hashes(benchmark, k, text_col=text_col)
    bref = ray.put(bench)
    if mode == "flag":
        return docs.map_batches(
            _ContaminationFlagger(bref, k, id_col, text_col),
            batch_format="pyarrow", concurrency=concurrency)
    return docs.map_batches(
        _CleanFilter(bref, k, id_col, text_col),
        batch_format="pyarrow", concurrency=concurrency)


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    *,
    k: int = 3,
    threshold: float = 0.8,
    num_partitions: int = 8,
    concurrency: int = 4,
    max_docs_per_shingle: int = 10_000,
    size_broadcast_limit: int = 50_000_000,
) -> "ray.data.Dataset":
    """EXACT n-gram Jaccard near-dup pairs (a < b, jaccard >= threshold).

    shingles -> groupby(shingle) -> per-shingle doc pairs -> groupby
    (a, b) intersection counts -> join each side's shingle count ->
    |A∩B| / (|A|+|B|-|A∩B|). All-pairs work is bounded by shingle
    co-occurrence (a shingle shared by m docs emits m(m-1)/2 pair rows),
    so shingles shared by more than ``max_docs_per_shingle`` documents
    are dropped BEFORE the self-join — the standard "stop-shingle" guard
    against the O(m²) blowup of boilerplate headers/footers at web
    scale. When the cap trips, results become a slight underestimate of
    jaccard for the affected pairs (intersections lose the ubiquitous
    shingle; sizes are computed before capping) — the default is far
    above any co-occurrence seen at test scales, so the oracle-gated
    path stays exact.
    """
    from ..stages.agg import _bucket_of, _rle_reduce, grouped_agg

    n_buckets = max(num_partitions, 16)

    sh = docs.map_batches(ShingleSignatures(k), batch_format="pyarrow",
                          concurrency=concurrency).materialize()

    def batch_sizes(t: pa.Table) -> pa.Table:
        # per-batch run-length doc sizes: a doc's shingles are contiguous
        # within the extractor's output, but a block boundary may split a
        # run, so these are PARTIAL counts merged by the consumer
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keys, cnt = _rle_reduce([d], np.ones(len(d), np.int64), "sum")
        return pa.table({"doc_id": pa.array(keys[0] if len(cnt) else [], pa.int64()),
                         "size": pa.array(cnt, pa.int64())})

    # materialized: consumed for the plan decision (count) AND the
    # broadcast/join below — and counting THIS instead of docs avoids
    # re-executing the whole upstream docs pipeline just to pick a plan
    size_parts = sh.map_batches(batch_sizes, batch_format="pyarrow").materialize()

    # Per-shingle doc pairs via ONE bucketed map_groups pass: shingles
    # hash-bucket on their value, each bucket sorts its rows by shingle
    # (runs = that shingle's posting list), the stop-shingle cap drops
    # runs longer than ``max_docs_per_shingle`` right here (exact df —
    # the whole posting list is in one bucket), and ordered (a, b)
    # co-occurrence pairs generate vectorized with an in-bucket partial
    # count. One shuffle where a self-join + separate df-count pass cost
    # three.
    def part_by_shingle(t: pa.Table) -> pa.Table:
        s = t.column("shingle").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array(
            _bucket_of(s.astype(np.int64), num_buckets=n_buckets)))

    from ..stages.agg import sorted_run_pairs

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        s = g["shingle"].to_numpy().astype(np.uint64)
        d = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((d, s))
        s_s, d_s = s[order], d[order]
        # the max_run cap is the stop-shingle guard: whole posting lists
        # over the cap emit no pairs
        a_idx, b_idx, _ = sorted_run_pairs([s_s], max_run=max_docs_per_shingle)
        if len(a_idx) == 0:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "cnt": np.empty(0, np.int64)})
        a, b = d_s[a_idx], d_s[b_idx]  # doc ids sorted within run => a <= b
        # strict a < b: duplicate (doc_id, shingle) input rows would
        # otherwise emit self-pairs that score as jaccard~1 (the minhash
        # path guards lo < hi the same way)
        ne = a != b
        if not ne.all():
            a, b = a[ne], b[ne]
        if len(a) == 0:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "cnt": np.empty(0, np.int64)})
        keys, cnt = _rle_reduce([a, b], np.ones(len(a), np.int64), "sum")
        return pd.DataFrame({"a": keys[0], "b": keys[1], "cnt": cnt})

    inter = grouped_agg(
        sh.map_batches(part_by_shingle, batch_format="pyarrow")
        .groupby("__part").map_groups(bucket_pairs, batch_format="pandas"),
        ["a", "b"], "cnt", "sum", out_col="inter")

    # denominator sizes: one int per doc — the partial counts stream to
    # the driver, merge in pandas (trivial: ~one row per doc), and
    # broadcast as sorted arrays (ray.put once, searchsorted lookup per
    # batch; ~16 B/doc) up to the broadcast limit; two hash joins beyond
    # it (a 10^9-doc size table no longer belongs in one worker's heap).
    # size_parts has ~one row per doc (a few more when a block boundary
    # split a run) — a faithful stand-in for the doc count
    if size_parts.count() <= size_broadcast_limit:
        sdf = (size_parts.to_pandas().groupby("doc_id", as_index=False)
               ["size"].sum().sort_values("doc_id"))
        size_ref = ray.put((sdf["doc_id"].to_numpy().astype(np.int64),
                            sdf["size"].to_numpy().astype(np.int64)))

        def score(t: pa.Table) -> pa.Table:
            ids_sorted, sz = ray.get(size_ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            inter_ = t.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
            sa = sz[np.searchsorted(ids_sorted, a)]
            sb = sz[np.searchsorted(ids_sorted, b)]
            jac = inter_ / (sa + sb - inter_)
            keep = jac >= threshold
            return pa.table({
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(jac[keep], pa.float64()),
            })

        return inter.map_batches(score, batch_format="pyarrow")

    from ..stages.util import rename_cols

    sizes = grouped_agg(size_parts, ["doc_id"], "size", "sum", out_col="size")
    j1 = inter.join(rename_cols(sizes, {"doc_id": "a_id", "size": "size_a"}),
                    "inner", num_partitions, on=("a",), right_on=("a_id",))
    j2 = j1.join(rename_cols(sizes, {"doc_id": "b_id", "size": "size_b"}),
                 "inner", num_partitions, on=("b",), right_on=("b_id",))

    def score_joined(t: pa.Table) -> pa.Table:
        inter_ = t.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
        sa = t.column("size_a").to_numpy(zero_copy_only=False)
        sb = t.column("size_b").to_numpy(zero_copy_only=False)
        jac = inter_ / (sa + sb - inter_)
        keep = jac >= threshold
        return pa.table({
            "a": pa.array(t.column("a").to_numpy(zero_copy_only=False)[keep], pa.int64()),
            "b": pa.array(t.column("b").to_numpy(zero_copy_only=False)[keep], pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64()),
        })

    return j2.map_batches(score_joined, batch_format="pyarrow")


class MinHasher:
    """documents -> (doc_id, band, band_hash) rows.

    128 permutations via universal hashing ((a*x + b) mod p, seeded),
    banded into ``bands`` rows of ``rows_per_band`` for LSH bucketing.
    One signature matrix per batch, fully vectorized."""

    def __init__(self, k: int = 3, num_perm: int = 128, bands: int = 32, seed: int = 7):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.k = k
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.a = rng.integers(1, MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, num_perm, dtype=np.uint64)
        self.hasher = _TokenHasher()

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        sig = np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*x + b) with uint64 wraparound — a (num_perm, S)-shaped
        # broadcast, min over shingles. Wrapping mod 2^64 is a standard
        # universal-hash family for MinHash. Chunked so the temporary
        # stays a few MB: one huge-document temp (num_perm × 100k) costs
        # SECONDS of first-touch page faults on fresh heap pages.
        for i in range(0, len(shingles), 4096):
            chunk = shingles[i:i + 4096]
            prods = self.a[:, None] * chunk[None, :] + self.b[:, None]
            np.minimum(sig, prods.min(axis=1), out=sig)
        return sig

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """(bands,) uint64 bucket keys: rolling polynomial over each
        band's rows — vectorized across bands (replaces one md5 call per
        band per document)."""
        m = sig.reshape(self.bands, self.rows)
        h = np.zeros(self.bands, dtype=np.uint64)
        for j in range(self.rows):
            h = h * _POLY + m[:, j]
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_band, out_hash = [], [], []
        band_idx = np.arange(self.bands, dtype=np.int32)
        for i, text in zip(ids, texts):
            sh = self.hasher.shingles(_WORD_RE.findall((text or "").lower()), self.k)
            sig = self.signature(sh)
            out_id.append(np.full(self.bands, i, dtype=np.int64))
            out_band.append(band_idx)
            out_hash.append(self.band_hashes(sig))
        empty = not out_id
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id) if not empty else [], pa.int64()),
            "band": pa.array(np.concatenate(out_band) if not empty else [], pa.int32()),
            "band_hash": pa.array(np.concatenate(out_hash) if not empty else [], pa.uint64()),
        })


def minhash_lsh_candidates(
    docs: "ray.data.Dataset",
    *,
    k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    concurrency: int = 4,
    max_docs_per_bucket: int = 200,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs (a < b) from MinHash-LSH banding.

    Buckets larger than ``max_docs_per_bucket`` are dropped (skew guard:
    a degenerate bucket of m docs would emit O(m²) pairs; such buckets
    mean the band is non-discriminative anyway). Verify candidates with
    ``ngram_jaccard_pairs`` semantics downstream.

    One hash-bucketed ``map_groups`` pass generates pairs for ALL
    (band, band_hash) buckets in its partition vectorized — a
    ``groupby((band, band_hash))`` here would pay one Python call per
    distinct bucket (tens of thousands)."""
    from ..stages.agg import _bucket_of, _rle_reduce, distinct_pairs

    n_buckets = 32
    mh = docs.map_batches(MinHasher(k, num_perm, bands), batch_format="pyarrow",
                          concurrency=concurrency)

    def part(t: pa.Table) -> pa.Table:
        b = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        h = t.column("band_hash").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__part", pa.array(
            _bucket_of(b, h, num_buckets=n_buckets)))

    from ..stages.agg import sorted_run_pairs

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        b = g["band"].to_numpy().astype(np.int64)
        h = g["band_hash"].to_numpy().astype(np.uint64)
        d = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((d, h, b))
        b_s, h_s, d_s = b[order], h[order], d[order]
        a_idx, b_idx, _ = sorted_run_pairs([b_s, h_s],
                                           max_run=max_docs_per_bucket)
        empty = pd.DataFrame({"a": np.empty(0, np.int64),
                              "b": np.empty(0, np.int64),
                              "cnt": np.empty(0, np.int64)})
        if len(a_idx) == 0:
            return empty
        a, bb = d_s[a_idx], d_s[b_idx]
        lo, hi = np.minimum(a, bb), np.maximum(a, bb)
        keep = lo < hi  # same doc colliding twice in a bucket is no pair
        if not keep.any():
            return empty
        keys, cnt = _rle_reduce([lo[keep], hi[keep]],
                                np.ones(int(keep.sum()), np.int64), "sum")
        return pd.DataFrame({"a": keys[0], "b": keys[1], "cnt": cnt})

    cand = (mh.map_batches(part, batch_format="pyarrow")
            .groupby("__part").map_groups(bucket_pairs, batch_format="pandas"))
    # distinct pairs (a doc pair can collide in many bands)
    return distinct_pairs(cand.select_columns(["a", "b"]), "a", "b")


class SimHasher:
    """documents -> (doc_id, simhash: uint64). 64-bit hyperplane sketch
    of the token multiset (token md5 bits weighted by term frequency).

    Frozen + SQL-expressible semantics (the oracle recomputes it with
    DuckDB's ``md5_number_upper``, which equals the engine's
    little-endian first-8-bytes token md5): bit i of the signature is
    set iff sum over distinct tokens of ±tf weighted by bit i of the
    token hash is positive."""

    _BITS = np.arange(64, dtype=np.uint64)

    def __init__(self):
        self.word_re = _WORD_RE
        self.hasher = _TokenHasher()

    def simhash64(self, tokens: list[str]) -> int:
        if not tokens:
            return 0
        from collections import Counter

        c = Counter(tokens)
        hs = self.hasher.token_hashes(list(c.keys()))
        cnt = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        # (n_tokens, 64) sign matrix in one vectorized expression
        bits = ((hs[:, None] >> self._BITS[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((2 * bits - 1) * cnt[:, None]).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << self._BITS).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = [self.simhash64(self.word_re.findall((t or "").lower())) for t in texts]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "simhash": pa.array(out, pa.uint64())})


_SIMHASHER: SimHasher | None = None


def _simhash_batch(batch: pa.Table) -> pa.Table:
    """Task-pool form of :class:`SimHasher`: lazily-built per-worker
    singleton keeps the token-md5 cache alive across tasks in the same
    worker process while tasks retry from lineage instead of depending
    on an object-store copy of actor constructor args (ray#53727)."""
    global _SIMHASHER
    if _SIMHASHER is None:
        _SIMHASHER = SimHasher()
    return _SIMHASHER(batch)


def simhash_signatures(docs: "ray.data.Dataset", *, concurrency: int = 4) -> "ray.data.Dataset":
    return docs.map_batches(_simhash_batch, batch_format="pyarrow",
                            concurrency=concurrency)


def _segment_layout(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) for ``max_hamming + 1`` segments covering 64 bits
    as evenly as possible. Pigeonhole: a pair differing in at most
    ``max_hamming`` bits must agree exactly on at least one of the
    ``max_hamming + 1`` segments — exact recall for the stated k (bucket
    skew guards aside), not just k<=3 as with a fixed 4×16 split."""
    n_seg = max_hamming + 1
    if not 1 <= n_seg <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    base, rem = divmod(64, n_seg)
    layout, shift = [], 0
    for s in range(n_seg):
        w = base + (1 if s < rem else 0)
        layout.append((shift, w))
        shift += w
    return layout


def _extract_bits(sh: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """Gather arbitrary bit positions of uint64 signatures into int64
    sub-keys (``len(bits) <= 62``); vectorized over rows."""
    acc = np.zeros(len(sh), dtype=np.uint64)
    for i, b in enumerate(bits):
        acc |= ((sh >> np.uint64(int(b))) & np.uint64(1)) << np.uint64(i)
    return acc.astype(np.int64)


def _all_pairs_idx(pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All unordered index pairs of ``pos``. Only reached for groups
    whose pairs are ALL true answers (identical-on-free-bits members),
    so the quadratic output size is inherent to the result, not waste."""
    a, b = np.triu_indices(len(pos), 1)
    return pos[a], pos[b]


def _simhash_overcap_pairs(
    pos: np.ndarray,
    sh: np.ndarray,
    free_bits: np.ndarray,
    max_hamming: int,
    cap: int,
) -> tuple[np.ndarray, np.ndarray]:
    """EXACT candidate pairs inside an over-cap pigeonhole bucket whose
    members already agree on every bit OUTSIDE ``free_bits``.

    Recursive sub-blocking: split the free bits into ``k + 1``
    sub-segments — a hamming<=k pair differs only within the free bits,
    so it must agree exactly on at least one sub-segment (pigeonhole
    again) — and recurse into each sub-bucket with that sub-segment's
    bits removed from the free set. Base cases: the group fits under
    ``cap`` (emit all pairs for downstream popcount verification), or
    fewer than ``k + 1`` free bits remain (members then differ in at
    most ``len(free_bits) <= k`` bits, so EVERY pair is a true pair).
    A sub-segment on which all members agree covers every pair by
    itself, so the recursion descends that single branch — the
    identical-signature case degenerates to a linear walk, not an
    exponential fan-out."""
    m = len(pos)
    if m < 2:
        e = np.empty(0, np.int64)
        return e, e
    if m <= cap or len(free_bits) <= max_hamming:
        return _all_pairs_idx(pos)
    segs = [s for s in np.array_split(free_bits, max_hamming + 1)
            if len(s)]
    outs_a, outs_b = [], []
    for segbits in segs:
        rest = np.setdiff1d(free_bits, segbits, assume_unique=True)
        key = _extract_bits(sh[pos], segbits)
        order = np.argsort(key, kind="stable")
        k_s, p_s = key[order], pos[order]
        new = np.ones(m, dtype=bool)
        new[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(new)
        if len(starts) == 1:
            # non-discriminative sub-segment: every pair agrees on it,
            # so this branch alone is a complete cover — descend once.
            return _simhash_overcap_pairs(pos, sh, rest, max_hamming, cap)
        ends = np.append(starts[1:], m)
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            a, b = _simhash_overcap_pairs(p_s[st:en], sh, rest,
                                          max_hamming, cap)
            if len(a):
                outs_a.append(a)
                outs_b.append(b)
    if not outs_a:
        e = np.empty(0, np.int64)
        return e, e
    a = np.concatenate(outs_a)
    b = np.concatenate(outs_b)
    # dedupe pairs surfaced via several sub-segments
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    u = np.unique(np.stack([lo, hi], axis=1), axis=0)
    return u[:, 0], u[:, 1]


def simhash_near_dup_pairs_ds(
    sigs: "ray.data.Dataset",
    *,
    max_hamming: int = 3,
    max_bucket: int = 500,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Distributed SimHash near-dup pairs (a < b, hamming <= k) — EXACT.

    Pigeonhole blocking: a pair within hamming<=k of a 64-bit signature
    must agree exactly on at least one of ``k + 1`` near-equal-width
    segments, so each signature emits k+1 (segment, segment_value) rows,
    candidates form inside ``groupby(segment_key)`` buckets (vectorized
    XOR popcount per bucket), and a final grouped-min dedups pairs found
    in several segments. Buckets over ``max_bucket`` docs are NOT
    dropped (that silently lost ~20% of true pairs under segment-key
    skew at sf0.1): they recurse into exact second-segment sub-blocking
    (:func:`_simhash_overcap_pairs`), so ``max_bucket`` is a memory/
    vectorization granularity knob, never a recall knob.
    """
    layout = _segment_layout(max_hamming)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sh = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        segs, keys, oid, osh = [], [], [], []
        for seg, (shift, width) in enumerate(layout):
            mask = np.uint64((1 << width) - 1)
            key = ((sh >> np.uint64(shift)) & mask).astype(np.int64)
            segs.append(np.full(len(ids), seg, dtype=np.int64))
            keys.append(key)
            oid.append(ids)
            osh.append(sh)
        return pa.table({
            "seg": pa.array(np.concatenate(segs)),
            "key": pa.array(np.concatenate(keys)),
            "doc_id": pa.array(np.concatenate(oid)),
            "simhash": pa.array(np.concatenate(osh)),
        })

    from ..stages.agg import _bucket_of, grouped_agg, sorted_run_pairs

    def part(t: pa.Table) -> pa.Table:
        s = t.column("seg").to_numpy(zero_copy_only=False)
        kk = t.column("key").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array(
            _bucket_of(s, kk, num_buckets=32)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # ALL (seg, key) buckets of this hash partition in one
        # vectorized pass (a per-bucket map_groups pays one Python call
        # per occupied segment value)
        s = g["seg"].to_numpy().astype(np.int64)
        kk = g["key"].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        sh = g["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, kk, s))
        s_s, k_s, id_s, sh_s = s[order], kk[order], ids[order], sh[order]
        ai, bi, kept = sorted_run_pairs([s_s, k_s], max_run=max_bucket)
        if not kept.all():
            # over-cap (seg, key) runs: exact recursive sub-blocking on
            # the remaining signature bits instead of dropping the run
            drop = np.flatnonzero(~kept)
            new = np.ones(len(drop), dtype=bool)
            new[1:] = ((s_s[drop][1:] != s_s[drop][:-1])
                       | (k_s[drop][1:] != k_s[drop][:-1]))
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(drop))
            extra_a, extra_b = [ai], [bi]
            for st, en in zip(starts, ends):
                pos = drop[st:en]
                shift, width = layout[int(s_s[pos[0]])]
                free = np.array(
                    [b for b in range(64) if not shift <= b < shift + width],
                    dtype=np.int64)
                xa, xb = _simhash_overcap_pairs(pos, sh_s, free,
                                                max_hamming, max_bucket)
                if len(xa):
                    extra_a.append(xa)
                    extra_b.append(xb)
            ai = np.concatenate(extra_a)
            bi = np.concatenate(extra_b)
        empty = pd.DataFrame({"a": np.empty(0, np.int64),
                              "b": np.empty(0, np.int64),
                              "hamming": np.empty(0, np.int64)})
        if len(ai) == 0:
            return empty
        x = sh_s[ai] ^ sh_s[bi]
        # vectorized popcount via uint8 view + unpackbits
        pop = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
        a, b = id_s[ai], id_s[bi]
        keep = (pop <= max_hamming) & (a != b)
        if not keep.any():
            return empty
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
        return pd.DataFrame({"a": lo, "b": hi,
                             "hamming": pop[keep].astype(np.int64)})

    cand = (sigs.map_batches(explode, batch_format="pyarrow")
            .map_batches(part, batch_format="pyarrow")
            .groupby("__part").map_groups(bucket_pairs, batch_format="pandas"))
    return grouped_agg(cand, ["a", "b"], "hamming", "min", out_col="hamming")


def simhash_near_dup_pairs(sigs_df: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    """Block by ``max_hamming + 1`` segments (a pair within hamming<=k
    must agree on at least one segment — pigeonhole); verify hamming
    exactly. Driver-side finisher over the collected (small) signature
    table; the scale path runs the same blocking as a groupby over
    segment keys."""
    ids = sigs_df["doc_id"].to_numpy()
    sh = sigs_df["simhash"].to_numpy().astype(np.uint64)
    seen: set[tuple[int, int]] = set()
    out_a, out_b, out_d = [], [], []
    for shift, width in _segment_layout(max_hamming):
        key = (sh >> np.uint64(shift)) & np.uint64((1 << width) - 1)
        order = np.argsort(key, kind="stable")
        k_s, i_s = key[order], order
        start = 0
        for end in range(1, len(k_s) + 1):
            if end == len(k_s) or k_s[end] != k_s[start]:
                grp = i_s[start:end]
                if len(grp) > 1:
                    # vectorized within-bucket verify — no size cap
                    # (a cap here silently loses recall, same bug the
                    # distributed path had)
                    xi, yi = np.triu_indices(len(grp), 1)
                    gx, gy = grp[xi], grp[yi]
                    x = sh[gx] ^ sh[gy]
                    pop = np.unpackbits(
                        x.view(np.uint8).reshape(len(x), 8),
                        axis=1).sum(axis=1)
                    ok = pop <= max_hamming
                    a = np.minimum(ids[gx[ok]], ids[gy[ok]])
                    b = np.maximum(ids[gx[ok]], ids[gy[ok]])
                    for av, bv, dv in zip(a.tolist(), b.tolist(),
                                          pop[ok].tolist()):
                        if av != bv and (av, bv) not in seen:
                            seen.add((av, bv))
                            out_a.append(av)
                            out_b.append(bv)
                            out_d.append(int(dv))
                start = end
    return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_d})


def embedding_near_dup_pairs(
    emb: "ray.data.Dataset",
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_limit: int = 100_000,
    n_planes: int = 8,
    n_tables: int = 8,
    max_bucket: int = 5_000,
    seed: int = 13,
) -> "ray.data.Dataset":
    """Cosine-similarity near-dup pairs (a < b, cos >= threshold).

    Two plans, switched on corpus size:

    - ``n <= broadcast_limit``: EXACT. The normalized matrix is
      broadcast once via ``ray.put`` and every batch matmuls against it
      — O(n·d) broadcast + O(batch·n) compute, no shuffle. At the
      default limit the broadcast is ~100 MB of float32-equivalent
      doubles — a deliberate small-corpus fast path, never the default
      at scale.
    - larger: LSH-bucketed (the 100 TB plan). Rows are assigned
      random-hyperplane bucket keys in ``n_tables`` independent tables
      (same family as ops/similarity._HyperplaneLSH), candidates verify
      exact cosine INSIDE each ``groupby(table, bucket)`` group, and a
      grouped-max dedups pairs found in several tables. No driver
      materialization, no all-pairs: work is bounded by bucket
      co-occurrence, with ``max_bucket`` guarding degenerate buckets.
      Found pairs are exact (cosine verified); recall is probabilistic —
      1-(1-p^planes)^tables, p = 1 - angle/π — e.g. ≈0.99 for
      cos ≥ 0.95 at the defaults; raise ``n_tables`` for more.
    """
    n = emb.count()
    if n <= broadcast_limit:
        return _near_dup_pairs_broadcast(emb, threshold, id_col, vec_col)
    return _near_dup_pairs_lsh(emb, threshold, id_col, vec_col,
                               n_planes, n_tables, max_bucket, seed)


def _near_dup_pairs_broadcast(emb, threshold, id_col, vec_col):
    all_df = emb.select_columns([id_col, vec_col]).to_pandas()
    ids = all_df[id_col].to_numpy().astype(np.int64)
    M = np.stack(all_df[vec_col].to_numpy()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, M))

    def block(t: pa.Table) -> pa.Table:
        from .similarity import unpack_embeddings

        bids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # zero-copy unpack is read-only: normalize out-of-place
        B = unpack_embeddings(t, vec_col)
        B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        gids, gM = ray.get(ref)
        S = B @ gM.T
        bi, gj = np.nonzero(S >= threshold)
        a = bids[bi]
        b = gids[gj]
        keep = a < b  # dedup + drop self
        return pa.table({
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "cosine": pa.array(S[bi, gj][keep], pa.float64()),
        })

    return emb.map_batches(block, batch_format="pyarrow")


def _near_dup_pairs_lsh(emb, threshold, id_col, vec_col,
                        n_planes, n_tables, max_bucket, seed):
    from ..stages.agg import grouped_agg
    from .similarity import _HyperplaneLSH

    def assign(t: pa.Table) -> pa.Table:
        from .similarity import unpack_embeddings

        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # zero-copy unpack is read-only: normalize out-of-place
        M = unpack_embeddings(t, vec_col)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        # planes are seeded + tiny: rebuild per task beats shipping refs
        lsh = _HyperplaneLSH(M.shape[1], n_planes, n_tables, seed)
        tables, buckets, oid, vecs = [], [], [], []
        for ti, b in enumerate(lsh.buckets(M)):
            tables.append(np.full(len(ids), ti, dtype=np.int64))
            buckets.append(b.astype(np.int64))
            oid.append(ids)
            vecs.append(M)
        return pa.table({
            "table": pa.array(np.concatenate(tables)),
            "bucket": pa.array(np.concatenate(buckets)),
            id_col: pa.array(np.concatenate(oid)),
            "__nvec": pa.array(list(np.concatenate(vecs, axis=0))),
        })

    from ..stages.agg import _bucket_of

    def part(t: pa.Table) -> pa.Table:
        tb = t.column("table").to_numpy(zero_copy_only=False)
        bk = t.column("bucket").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array(
            _bucket_of(tb, bk, num_buckets=32)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one map_groups call per HASH PARTITION; the within-partition
        # loop walks (table, bucket) runs and does one matmul per run —
        # matmul work is identical, the per-bucket Ray/pandas group
        # overhead is gone
        tb = g["table"].to_numpy().astype(np.int64)
        bk = g["bucket"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, bk, tb))
        tb, bk, ids = tb[order], bk[order], ids[order]
        vecs = g["__nvec"].to_numpy()[order]
        n = len(ids)
        out_a, out_b, out_c = [], [], []
        if n:
            new = np.concatenate(([True], (tb[1:] != tb[:-1]) | (bk[1:] != bk[:-1])))
            starts = np.flatnonzero(new).tolist() + [n]
            for s0, s1 in zip(starts, starts[1:]):
                m = s1 - s0
                if m < 2 or m > max_bucket:
                    continue
                M = np.stack(vecs[s0:s1])
                gids = ids[s0:s1]
                S = M @ M.T
                ai, bi = np.nonzero(S >= threshold)
                keep = gids[ai] < gids[bi]
                out_a.append(gids[ai][keep])
                out_b.append(gids[bi][keep])
                out_c.append(S[ai, bi][keep])
        if not out_a:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "cosine": np.empty(0, np.float64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    cand = (emb.map_batches(assign, batch_format="pyarrow")
            .map_batches(part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(bucket_pairs, batch_format="pandas"))
    # a pair can collide in several tables — grouped-max dedups (cosine
    # is identical each time; max is just the dedup reducer)
    return grouped_agg(cand, ["a", "b"], "cosine", "max", out_col="cosine")


# --- exact-substring (duplicated-span) detection ----------------------

class GramSites:
    """documents -> one row per word-k-gram OCCURRENCE: (gram, doc_id,
    pos). Unlike :class:`ShingleSignatures` this keeps positions and
    duplicates (the span detector needs every site, not the distinct
    set) and is STRICT about k — documents shorter than k tokens emit
    nothing (they cannot contain a k-token span)."""

    def __init__(self, k: int, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.k = k
        self.id_col = id_col
        self.text_col = text_col
        self.hasher = _TokenHasher()

    def __call__(self, t: pa.Table) -> pa.Table:
        k = self.k
        ids = t.column(self.id_col).to_pylist()
        out_g, out_d, out_p = [], [], []
        for i, text in zip(ids, t.column(self.text_col).to_pylist()):
            h = self.hasher.token_hashes(
                _WORD_RE.findall((text or "").lower()))
            n = len(h)
            if n < k:
                continue
            g = h[:n - k + 1].copy()
            for j in range(1, k):
                g = g * _POLY + h[j:j + n - k + 1]
            out_g.append(g)
            out_d.append(np.full(len(g), i, dtype=np.int64))
            out_p.append(np.arange(len(g), dtype=np.int64))
        if not out_g:
            return pa.table({"gram": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({
            "gram": pa.array(np.concatenate(out_g), pa.uint64()),
            "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            "pos": pa.array(np.concatenate(out_p), pa.int64()),
        })


def duplicate_spans(
    docs: "ray.data.Dataset",
    *,
    k: int = 8,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Exact-substring duplicate detection (the ExactSubstr pass of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", 2022, done with hashed k-gram posting lists instead of a
    suffix array): find every maximal token span that is part of some
    word-k-gram occurring at >= ``min_sites`` sites anywhere in the
    corpus (across documents or repeated within one), i.e. the spans an
    ExactSubstr-style cleaner would cut.

    Returns (doc_id, span_start, span_end): token-index intervals
    [start, end) per document, overlapping/adjacent duplicated grams
    merged into maximal spans.

    Plan — two bucketed passes, no pair generation anywhere (unlike
    near-dup Jaccard this needs only the per-gram site COUNT, so the
    O(m^2) posting-list blowup never exists and no stop-gram cap is
    needed):

    1. gram sites (one row per token position, 24 B/row — the honest
       O(corpus tokens) cost of the exact algorithm; the text itself
       never shuffles) -> hash-bucket by gram -> per bucket, sort by
       gram and keep rows of runs with >= min_sites sites;
    2. surviving (doc_id, pos) rows -> hash-bucket by doc_id -> per
       bucket, sort by (doc, pos) and merge sites into maximal spans
       with the vectorized gaps-and-islands kernel (break when
       pos - prev_pos > k).

    Both buckets scale by raising ``num_buckets`` (a bucket holds
    ~tokens/num_buckets rows, independent of skew: a gram repeated a
    billion times is still just counted, never paired)."""
    from ..stages.agg import _bucket_of

    sites = docs.map_batches(
        GramSites(k, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency)

    def part_by_gram(t: pa.Table) -> pa.Table:
        g = t.column("gram").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array(
            _bucket_of(g.astype(np.int64), num_buckets=num_buckets)))

    def bucket_dup_sites(g: pd.DataFrame) -> pd.DataFrame:
        s = g["gram"].to_numpy().astype(np.uint64)
        d = g["doc_id"].to_numpy().astype(np.int64)
        p = g["pos"].to_numpy().astype(np.int64)
        order = np.argsort(s, kind="stable")
        s_s = s[order]
        n = len(s_s)
        if n == 0:
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "pos": np.empty(0, np.int64)})
        new = np.concatenate(([True], s_s[1:] != s_s[:-1]))
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        keep = run_len[run_id] >= min_sites
        idx = order[keep]
        return pd.DataFrame({"doc_id": d[idx], "pos": p[idx]})

    dup_sites = (sites.map_batches(part_by_gram, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(bucket_dup_sites, batch_format="pandas"))

    def part_by_doc(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array(
            _bucket_of(d.astype(np.int64), num_buckets=num_buckets)))

    def bucket_spans(g: pd.DataFrame) -> pd.DataFrame:
        d = g["doc_id"].to_numpy().astype(np.int64)
        p = g["pos"].to_numpy().astype(np.int64)
        order = np.lexsort((p, d))
        d_s, p_s = d[order], p[order]
        n = len(d_s)
        if n == 0:
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "span_start": np.empty(0, np.int64),
                                 "span_end": np.empty(0, np.int64)})
        # islands: a site extends the current span unless the doc
        # changes or the gap exceeds k (intervals [p, p+k) overlap or
        # touch exactly when next_p - prev_p <= k)
        brk = np.concatenate(([True], (d_s[1:] != d_s[:-1])
                              | (p_s[1:] - p_s[:-1] > k)))
        first = np.flatnonzero(brk)
        last = np.concatenate((first[1:], [n])) - 1
        return pd.DataFrame({"doc_id": d_s[first],
                             "span_start": p_s[first],
                             "span_end": p_s[last] + k})

    return (dup_sites.map_batches(part_by_doc, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(bucket_spans, batch_format="pandas"))


def near_dup_clusters(
    docs: "ray.data.Dataset",
    *,
    pairs: "ray.data.Dataset | None" = None,
    id_col: str = "doc_id",
    max_rounds: int = 32,
    num_partitions: int = 4,
    broadcast_limit: int = 200_000,
) -> "ray.data.Dataset":
    """Assign every document a near-dup CLUSTER id: the smallest doc_id
    reachable through the near-dup pair graph (connected components over
    the pairs; singletons cluster as themselves). The canonical
    keep-one-per-cluster rule then falls out as ``doc_id == cluster``.

    ``pairs`` defaults to :func:`minhash_lsh_candidates` over ``docs``.
    Scale shape: the min-label fixpoint iterates over the PAIR table
    (|dups| rows, orders of magnitude below corpus size at any real dup
    rate); each HOOK round broadcasts the pair-member label map
    (16 B/member — tens of MB even at millions of dup pairs) into a
    map_batches over the edge table and re-reduces with the
    combiner-first grouped min, then the label map POINTER-JUMPS
    driver-side until stable (label = label[label] — dict passes over
    the already-broadcast map, zero Dataset rounds). Hook+jump
    converges in O(log component size) Dataset rounds instead of
    O(diameter). The corpus itself is touched exactly once, at the
    final cluster assignment. ``max_rounds`` is an assert-guard, not a
    knob.

    GUARDRAIL, not prose: the label map is driver-resident
    (16 B/member), so when the distinct pair-member count exceeds
    ``broadcast_limit`` the whole hook+jump plan is bypassed and
    clustering auto-routes to the CSR shard-actor components pipeline
    (pipelines/components.py) over the symmetrized pair edges — same
    semantics (hash-min == smallest reachable id), shuffle-free
    supersteps, labels resident in per-range actors, final assignment
    via a distributed left-outer join instead of a broadcast lookup.
    ``tests/test_ops.py::test_near_dup_clusters_components_fallback``
    forces the fallback and asserts identical clusters on both paths.

    The default (200k members) is a measured PERFORMANCE crossover,
    not just a driver-heap ceiling: ``tools/soak_r5.py`` on
    chain/star/clique pair graphs measures the components leg faster
    from ~110k members up (9.9 vs 23.2 s at 110k members, 8.7 vs
    66.6 s at 2.2M, 15.9 vs 499.5 s at 8.8M — each hook round is a
    full Dataset pass, while the shard actors iterate in-heap), and
    deep chains make hook+jump degrade at ANY scale. Below the limit
    the driver path wins on zero actor-pool spin-up (~2-4 s) —
    gate-scale runs stay on it.
    """
    from ..stages.agg import grouped_agg

    if pairs is None:
        pairs = minhash_lsh_candidates(docs, id_col=id_col) \
            if id_col != "doc_id" else minhash_lsh_candidates(docs)
    pairs = pairs.select_columns(["a", "b"]).materialize()
    if pairs.count() == 0:
        return docs.select_columns([id_col]).map_batches(
            lambda t: pa.table({id_col: t.column(id_col),
                                "cluster": t.column(id_col)}),
            batch_format="pyarrow")

    # symmetric edge table over pair members only
    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow") \
        .materialize()

    # pair members (sorted unique ids); labels as a parallel int64 array
    # — all driver-side label work is vectorized numpy (searchsorted
    # gathers, l = l[l] pointer jumps), never a Python dict over the
    # member set (measured 4×+ at millions of dup pairs)
    members_ds = grouped_agg(edges, ["src"], "src", "min",
                             out_col="label").materialize()
    if members_ds.count() > broadcast_limit:
        return _clusters_via_components(docs, edges, id_col,
                                        num_partitions=num_partitions)
    members = np.sort(
        members_ds.to_pandas()["src"].to_numpy().astype(np.int64))
    labels = members.copy()

    def jump(lab_idx: np.ndarray) -> np.ndarray:
        # pointer jumping on the label forest (indices into members)
        while True:
            nxt = lab_idx[lab_idx]
            if np.array_equal(nxt, lab_idx):
                return lab_idx
            lab_idx = nxt

    for _ in range(max_rounds):
        # HOOK: push each vertex's label along its edges, grouped min
        cur = labels  # int64 values aligned with `members`

        def push(t: pa.Table, cur=cur) -> pa.Table:
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            lv = cur[np.searchsorted(members, s)]
            # include the receiver's own current label in the min
            ov = cur[np.searchsorted(members, d)]
            return pa.table({
                "src": pa.array(np.concatenate([d, d]), pa.int64()),
                "label": pa.array(np.concatenate([lv, ov]), pa.int64()),
            })

        hooked = grouped_agg(
            edges.map_batches(push, batch_format="pyarrow"),
            ["src"], "label", "min", out_col="label").to_pandas()
        hv = hooked["src"].to_numpy().astype(np.int64)
        hl = hooked["label"].to_numpy().astype(np.int64)
        new_labels = labels.copy()
        new_labels[np.searchsorted(members, hv)] = hl
        # jump on index form: labels are member ids -> member positions
        lab_idx = jump(np.searchsorted(members, new_labels))
        new_labels = members[lab_idx]
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    else:
        raise AssertionError(
            f"near_dup_clusters did not converge in {max_rounds} rounds")

    lut_members, lut_labels = members, labels

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(lut_members, ids)
        pos = np.clip(pos, 0, max(0, len(lut_members) - 1))
        inset = (len(lut_members) > 0) & (lut_members[pos] == ids)
        cl = np.where(inset, lut_labels[pos] if len(lut_members) else ids,
                      ids)
        return pa.table({id_col: pa.array(ids),
                         "cluster": pa.array(cl.astype(np.int64))})

    return docs.select_columns([id_col]).map_batches(
        assign, batch_format="pyarrow")


def _clusters_via_components(
    docs: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    id_col: str,
    *,
    num_partitions: int = 4,
) -> "ray.data.Dataset":
    """near_dup_clusters' past-broadcast-scale path: hash-min connected
    components over the SYMMETRIZED pair edges via the CSR shard-actor
    pipeline (pipelines/components.py — oracle-green, 4M-soak-proven).

    Scale shape: the vertex space is the raw id space, so per-range
    label arrays cost 8 B/vertex spread across the pool (docs COUNT, not
    corpus bytes); requires near-dense integer ids — this engine's doc
    ids are dense ranks (stages/ids.assign_dense_ids), asserted below.
    Only label-changed vertices (non-root dup members) leave the actors,
    as per-range arrow tables; the final assignment is a distributed
    left-outer join (cluster = coalesce(label, id)) — nothing
    member-sized ever lands on the driver.
    """
    import uuid

    import pyarrow.compute as pc

    from ..pipelines.components import connected_components
    from ..state import fsio
    from ..state.csr import create_shard_actors, default_num_shards, \
        shard_edges

    n_vertices = int(edges.max("src")) + 1
    n_docs = docs.count()
    assert n_vertices <= max(8 * n_docs, 1 << 22), (
        f"near_dup_clusters components route needs near-dense int ids: "
        f"id space {n_vertices} vs {n_docs} docs — densify upstream "
        f"(stages/ids.assign_dense_ids) before clustering")
    P = default_num_shards(n_vertices)
    shard_dir = fsio.join("/tmp/wikilinks_ray_dedup_cc", uuid.uuid4().hex)
    paths = shard_edges(edges, n_vertices, P, shard_dir, by="src")
    actors, _ = create_shard_actors(paths, n_vertices)
    try:
        res = connected_components(actors, n_vertices)
        assert res.converged, "pair-graph components hit max_iter"

        @ray.remote
        def diff_table(chunk: np.ndarray, lo: int) -> pa.Table:
            v = np.arange(lo, lo + len(chunk), dtype=np.int64)
            m = chunk != v
            return pa.table({id_col: pa.array(v[m]),
                             "cluster": pa.array(chunk[m].astype(np.int64))})

        refs = [diff_table.remote(c, int(res.bounds[i]))
                for i, c in enumerate(res.labels)]
        diff = ray.data.from_arrow_refs(refs).materialize()
    finally:
        for a in actors:
            ray.kill(a)

    ids = docs.select_columns([id_col])
    if diff.count() == 0:
        return ids.map_batches(
            lambda t: pa.table({id_col: t.column(id_col),
                                "cluster": t.column(id_col)}),
            batch_format="pyarrow")
    joined = ids.join(diff, "left_outer", num_partitions, on=(id_col,))

    def finish(t: pa.Table) -> pa.Table:
        cl = pc.coalesce(t.column("cluster"), t.column(id_col))
        return pa.table({id_col: t.column(id_col),
                         "cluster": cl.cast(pa.int64())})

    return joined.map_batches(finish, batch_format="pyarrow")

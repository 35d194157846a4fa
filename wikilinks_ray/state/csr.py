"""Per-partition CSR adjacency shards held in stateful Ray actors.

Ray-native analog of the reference's packed adjacency: the segment
store's ``nodes/outEdges/inEdges`` mmap'd CSR sections
(SegmentWikiGraphStore.kt:100-114, built by degree-count + prefix-sum +
scatter at SegmentWikiGraphSerialization.kt:88-140) and the query-time
``LeanPageMapper`` int[] adjacency (WikiRoutes.kt:201-226). One machine
holds one CSR there; here the vertex id space [0, n) is cut into P
contiguous ranges, each range's out-edges live in one parquet shard, and
one ``CSRShardActor`` per shard loads it ONCE (``__init__``) and serves
every superstep from memory — state loaded once, queried many times,
exactly the reference's build-once mapper (WikiRoutes.kt:31-32).

Shard layout on disk (resumable: one directory per shard):

    out_dir/shard-{p:05d}.parquet   # (src, dst) sorted by (src, dst)

Iteration kernels are dense-vectorized numpy over the shard:
- ``scatter(rank_chunk)``: per-dst-range partial contribution sums —
  the *combiner* form of the (dst, rank/deg) message shuffle: messages
  are pre-aggregated per destination range inside the actor, so the
  exchange is O(P·n/P) dense arrays, not O(E) rows.
- ``min_push(label_chunk)``: per-dst-range min-label candidates
  (hash-min connected components / label propagation skeleton).
- ``gather_neighbors(frontier)``: (dst, parent) expansion for BFS
  (PageMapper.forEachLinkIndex analog, WikiRoutes.kt:102-124).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from . import fsio


def vertex_ranges(n_vertices: int, num_shards: int) -> np.ndarray:
    """Boundaries b[0..P] with shard p owning ids [b[p], b[p+1])."""
    return np.linspace(0, n_vertices, num_shards + 1).astype(np.int64)


# Touched-slot fraction below which a combiner partial ships sparse
# (see pack_partial). 0 disables the sparse form entirely.
_SPARSE_FRAC = float(os.environ.get("WL_SPARSE_FRAC", "0.5"))


def pack_partial(offsets: np.ndarray, values: np.ndarray, size: int,
                 fill=0):
    """Adaptive combiner-partial transport: a (shard → dst-range) block
    ships as a sparse ``(local_offsets, values)`` pair when fewer than
    half the range's slots are touched, dense otherwise. ``offsets``
    must be unique (they come out of a per-unique-dst ``reduceat``).

    Why it matters at scale: dense partials cost O(P·n) object-store
    bytes per superstep (each of P shards emits n total slots), which
    GROWS with the pool size even though the information content is
    bounded by O(E) touched entries. Sparse blocks cap transport at
    O(min(P·n, 2·E)) so widening the pool past E/n ranges stops
    inflating the exchange — this is what flattens the P=24/32
    collapse recorded in pipelines/pagerank.py's P-sweep.

    The threshold trades transport bytes against reducer kernel shape:
    a sparse block is consumed by a fancy-index scatter-add (~10× the
    per-element cost of the dense vector add, measured on this box), so
    the break-even touched fraction sits well below the byte-parity
    point of 50%. ``WL_SPARSE_FRAC`` overrides it for A/B measurement
    (set it before ``ray.init`` so actor workers inherit it)."""
    if offsets.size < _SPARSE_FRAC * size:
        return (offsets, values)
    if fill == 0:
        dense = np.zeros(size, dtype=values.dtype)
    else:
        dense = np.full(size, fill, dtype=values.dtype)
    dense[offsets] = values
    return dense


def accum_sum(acc: np.ndarray, partial) -> None:
    """acc += partial for either transport form (None = empty block).

    Element-wise the addition order is shard order in both forms, so
    the integer-oracle path stays bit-identical whichever form each
    block happened to take."""
    if partial is None:
        return
    if isinstance(partial, tuple):
        offsets, values = partial
        acc[offsets] += values
    else:
        acc += partial


def accum_max(acc: np.ndarray, partial) -> None:
    """acc = max(acc, partial) for either transport form."""
    if partial is None:
        return
    if isinstance(partial, tuple):
        offsets, values = partial
        acc[offsets] = np.maximum(acc[offsets], values)
    else:
        np.maximum(acc, partial, out=acc)


def accum_min(acc: np.ndarray, partial) -> None:
    """acc = min(acc, partial) for either transport form."""
    if partial is None:
        return
    if isinstance(partial, tuple):
        # partials may be zero-copy read-only views from the object
        # store — never write into `values`
        offsets, values = partial
        acc[offsets] = np.minimum(acc[offsets], values)
    else:
        np.minimum(acc, partial, out=acc)


def shard_edges(
    edges: "ray.data.Dataset",
    n_vertices: int,
    num_shards: int,
    out_dir: str,
    *,
    by: str = "src",
    weight_col: str | None = None,
    overwrite: bool = False,
) -> list[str]:
    """Range-partition the edge table by ``by`` ∈ {src, dst} and write one
    sorted parquet shard per vertex range.

    ``by="src"`` gives forward CSR shards; ``by="dst"`` is the transpose
    shuffle (reverse CSR — the reference builds both: outEdges + inEdges,
    SegmentWikiGraphSerialization.kt:88-140). This is the ONE partitioning
    pass each direction needs; every later superstep reuses it.

    ``out_dir`` may be a plain path or any fsio-resolvable URI
    (``local://``, ``s3://``, ...): shard files are written/read through
    pyarrow filesystems so writer tasks and reader actors can live on
    different nodes. Commit protocol is sentinel-last (no renames — see
    fsio module docs): the ``_SHARDS_OK`` stamp is only written after
    every shard file is complete, and a stamp mismatch (including a torn
    write) forces a rebuild.
    """
    paths = [fsio.join(out_dir, f"shard-{p:05d}.parquet")
             for p in range(num_shards)]
    done = fsio.join(out_dir, "_SHARDS_OK")
    # the sentinel records the partitioning parameters: reusing shards
    # written for a different (num_shards, n_vertices, by) would hand out
    # paths partitioned with stale range bounds (missing files / negative
    # src-lo bincounts) — rebuild on any mismatch
    stamp = f"{num_shards}:{n_vertices}:{by}:{weight_col or ''}\n"
    if not overwrite and fsio.exists(done):
        try:
            if fsio.read_text(done) == stamp:
                return paths
        except (OSError, UnicodeDecodeError):
            pass  # torn sentinel -> rebuild
    # rebuild path: UNCOMMIT first. If a stale sentinel with a matching
    # stamp survived while shard files are rewritten in place, a crash
    # mid-rewrite would make the next run serve torn/mixed shards as
    # committed (ADVICE round 4, medium). Delete-sentinel-then-write
    # keeps the invariant: sentinel present+matching => every data file
    # complete.
    if fsio.exists(done):
        fsio.delete_file(done)
    fsio.makedirs(out_dir)
    bounds = vertex_ranges(n_vertices, num_shards)
    other = "dst" if by == "src" else "src"
    fs_snap = fsio.snapshot()  # travels with the write_shard closure

    def tag(t: pa.Table) -> pa.Table:
        key = t.column(by).to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, key, side="right") - 1
        return t.append_column("__part", pa.array(part.astype(np.int64)))

    def write_shard(g: pa.Table) -> "pa.Table":
        # Arrow-native sort+write: the pandas map_groups batch costs a
        # full DataFrame conversion and sort_values copy per shard; the
        # pyarrow sort_by on the two int64 columns is the same ordering
        # (ties are identical rows) without leaving Arrow.
        p = int(g.column("__part")[0].as_py())
        cols = {
            by: g.column(by).cast(pa.int64()),
            other: g.column(other).cast(pa.int64()),
        }
        if weight_col is not None:
            cols["weight"] = g.column(weight_col).cast(pa.int64())
        tbl = pa.table(cols).sort_by([(by, "ascending"),
                                      (other, "ascending")])
        # direct write, no tmp+rename: the _SHARDS_OK sentinel (written
        # last, after map_groups completes) is the commit point, and
        # object-store backends have no atomic rename anyway
        fsio.restore(fs_snap)
        fs, fpath = fsio.resolve(paths[p])
        pq.write_table(tbl, fpath, filesystem=fs)
        return pa.table({"part": pa.array([p], pa.int64()),
                         "rows": pa.array([tbl.num_rows], pa.int64())})

    res = (
        edges.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(write_shard, batch_format="pyarrow")
    )
    written = {r["part"] for r in res.take_all()}
    # empty ranges still need a shard file
    for p in range(num_shards):
        if p not in written:
            empty = {by: pa.array([], pa.int64()),
                     other: pa.array([], pa.int64())}
            if weight_col is not None:
                empty["weight"] = pa.array([], pa.int64())
            fs, fpath = fsio.resolve(paths[p])
            pq.write_table(pa.table(empty), fpath, filesystem=fs)
    fsio.write_text(done, stamp)
    return paths


class CSRShardData:
    """In-memory CSR over one contiguous src range [lo, hi).

    Arrays:
      indptr   (hi-lo+1,)  prefix offsets into ``indices``
      indices  (E_p,)      dst ids (global), sorted within each src
      out_deg  (hi-lo,)    out-degrees of owned vertices
      dst_sorted_dst/src   edge list re-sorted by dst, for per-dst-range
                           aggregation without re-sorting per superstep
    """

    def __init__(self, path: str, lo: int, hi: int, key: str = "src"):
        other = "dst" if key == "src" else "src"
        # path may be a URI; resolved HERE (inside the actor process) so
        # shards on shared storage load on whichever node the actor got
        fs, fpath = fsio.resolve(path)
        t = pq.read_table(fpath, filesystem=fs)
        srcs = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        dsts = t.column(other).to_numpy(zero_copy_only=False).astype(np.int64)
        self.lo, self.hi = int(lo), int(hi)
        counts = np.bincount(srcs - lo, minlength=hi - lo).astype(np.int64)
        self.indptr = np.concatenate([[0], np.cumsum(counts)])
        self.indices = dsts  # already sorted by (src, dst) at shard write
        self.out_deg = counts
        order = np.argsort(dsts, kind="stable")
        self.dst_sorted_dst = dsts[order]
        self.dst_sorted_src = srcs[order]
        # optional per-edge weights (shard written with weight_col):
        # out_wt replaces out_deg as the scatter normalizer
        if "weight" in t.column_names:
            w = t.column("weight").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            self.dst_sorted_weight = w[order]
            self.out_wt = np.bincount(srcs - lo, weights=w,
                                      minlength=hi - lo).astype(np.int64)
            self.max_weight = int(w.max()) if len(w) else 0
        else:
            self.dst_sorted_weight = None
            self.out_wt = None
            self.max_weight = 0

    @property
    def num_edges(self) -> int:
        return len(self.indices)

    def edge_values_by_dst(self, per_vertex: np.ndarray) -> np.ndarray:
        """per-owned-vertex values -> per-edge values in dst-sorted order."""
        return per_vertex[self.dst_sorted_src - self.lo]

    def range_segments(self, bounds: np.ndarray) -> np.ndarray:
        """Offsets into dst-sorted edges for each dst range."""
        return np.searchsorted(self.dst_sorted_dst, bounds)


@ray.remote
class CSRShardActor:
    """One actor per shard; adjacency loaded once, served every superstep."""

    def __init__(self, path: str, lo: int, hi: int, bounds: list[int],
                 key: str = "src", fs_registry=None):
        # key="src": forward adjacency; key="dst": the shard was written
        # by shard_edges(by="dst") and this actor serves the REVERSE
        # adjacency (owner = dst, neighbors = srcs)
        fsio.restore(fs_registry)
        self.csr = CSRShardData(path, lo, hi, key=key)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.segs = self.csr.range_segments(self.bounds)

    def ready(self) -> tuple[int, int]:
        return self.csr.num_edges, int(self.csr.out_deg.sum())

    def out_degrees(self) -> np.ndarray:
        return self.csr.out_deg

    def out_weights(self) -> np.ndarray:
        """Per-vertex weighted out-strength (== out_degrees when the
        shard was written without ``weight_col``)."""
        return self.csr.out_wt if self.csr.out_wt is not None \
            else self.csr.out_deg

    def dangling_sum(self, rank_chunk: np.ndarray) -> float:
        return float(rank_chunk[self.csr.out_deg == 0].sum())

    def scatter(self, rank_chunk: np.ndarray):
        """PageRank combiner: per-dst-range dense partial sums of
        rank[src]/out_deg[src] over this shard's edges, plus this
        shard's dangling rank mass as the LAST return (folded in so a
        superstep costs one actor RPC, not two). Returns P+1 values
        (None for ranges this shard sends nothing to)."""
        csr = self.csr
        contrib = np.zeros_like(rank_chunk, dtype=np.float64)
        nz = csr.out_deg > 0
        contrib[nz] = rank_chunk[nz] / csr.out_deg[nz]
        dangling = float(rank_chunk[~nz].sum())
        edge_vals = csr.edge_values_by_dst(contrib)
        out = []
        for q in range(len(self.bounds) - 1):
            a, b = self.segs[q], self.segs[q + 1]
            if a == b:
                out.append(None)
                continue
            # edges are dst-sorted: run-length reduceat beats np.add.at
            # by ~10x (add.at is a per-element scatter loop)
            d = csr.dst_sorted_dst[a:b]
            first = np.empty(b - a, dtype=bool)
            first[0] = True
            first[1:] = d[1:] != d[:-1]
            idx = np.flatnonzero(first)
            out.append(pack_partial(
                d[idx] - self.bounds[q],
                np.add.reduceat(edge_vals[a:b], idx),
                int(self.bounds[q + 1] - self.bounds[q])))
        out.append(dangling)
        return out

    def scatter_int(self, rank_chunk: np.ndarray):
        """Integer twin of ``scatter`` for the exact-arithmetic PageRank
        oracle (pipelines/pagerank.py:pagerank_int): contributions are
        int64 floor divisions ``rank // out_deg`` and partials are int64
        sums, so the whole superstep is reproducible bit-for-bit by any
        other engine (DuckDB included) — no float summation order to
        worry about. Same exchange shape as the float path: P dense
        per-dst-range partials + dangling mass last."""
        csr = self.csr
        contrib = np.zeros_like(rank_chunk, dtype=np.int64)
        nz = csr.out_deg > 0
        contrib[nz] = rank_chunk[nz] // csr.out_deg[nz]
        dangling = int(rank_chunk[~nz].sum())
        edge_vals = csr.edge_values_by_dst(contrib)
        out = []
        for q in range(len(self.bounds) - 1):
            a, b = self.segs[q], self.segs[q + 1]
            if a == b:
                out.append(None)
                continue
            d = csr.dst_sorted_dst[a:b]
            first = np.empty(b - a, dtype=bool)
            first[0] = True
            first[1:] = d[1:] != d[:-1]
            idx = np.flatnonzero(first)
            out.append(pack_partial(
                d[idx] - self.bounds[q],
                np.add.reduceat(edge_vals[a:b], idx),
                int(self.bounds[q + 1] - self.bounds[q])))
        out.append(dangling)
        return out

    def scatter_weighted_int(self, rank_chunk: np.ndarray):
        """Weighted-integer PageRank scatter: per-EDGE contributions
        ``(rank[u] * w_e) // out_wt[u]`` (floor applied per edge — the
        SQL twin divides per edge row too), dangling = rank mass of
        zero-out-weight vertices. Same P partials + dangling-last
        return shape as ``scatter_int``. Requires the shard to have
        been written with ``weight_col``; rank*weight must fit int64
        (scale 10^12 leaves ~6 decimal digits of weight headroom)."""
        csr = self.csr
        if csr.dst_sorted_weight is None:
            raise ValueError("shard has no weights; write with weight_col")
        if len(rank_chunk) and csr.max_weight > 1:
            # int64 overflow guard: a hot contracted edge with huge
            # multiplicity would otherwise silently wrap rank*weight.
            assert int(rank_chunk.max()) <= (2**63 - 1) // csr.max_weight, (
                f"rank*weight would overflow int64 (max rank "
                f"{int(rank_chunk.max())}, max weight {csr.max_weight}); "
                f"lower the PageRank integer scale")
        nz = csr.out_wt > 0
        dangling = int(rank_chunk[~nz].sum())
        src_rank = rank_chunk[csr.dst_sorted_src - csr.lo]
        src_wt = csr.out_wt[csr.dst_sorted_src - csr.lo]
        edge_vals = np.zeros_like(src_rank, dtype=np.int64)
        wnz = src_wt > 0
        edge_vals[wnz] = (src_rank[wnz]
                          * csr.dst_sorted_weight[wnz]) // src_wt[wnz]
        out = []
        for q in range(len(self.bounds) - 1):
            a, b = self.segs[q], self.segs[q + 1]
            if a == b:
                out.append(None)
                continue
            d = csr.dst_sorted_dst[a:b]
            first = np.empty(b - a, dtype=bool)
            first[0] = True
            first[1:] = d[1:] != d[:-1]
            idx = np.flatnonzero(first)
            out.append(pack_partial(
                d[idx] - self.bounds[q],
                np.add.reduceat(edge_vals[a:b], idx),
                int(self.bounds[q + 1] - self.bounds[q])))
        out.append(dangling)
        return out

    def scatter_sum_int(self, value_chunk: np.ndarray, denom: int):
        """Unweighted integer scatter (HITS supersteps): contributions
        are ``value_chunk // denom`` — the sum-normalization of the
        PREVIOUS half-step folded into this scatter, so chunks travel
        unnormalized with a pending scalar denominator and no extra
        pass touches them. No out-degree division, no dangling tail:
        returns P per-range partials only. On a forward shard this
        computes authority mass (dst <- sum of hub[src]); on a reverse
        shard (key=\"dst\"), hub mass (src <- sum of auth[dst])."""
        csr = self.csr
        contrib = value_chunk // denom
        edge_vals = csr.edge_values_by_dst(contrib)
        out = []
        for q in range(len(self.bounds) - 1):
            a, b = self.segs[q], self.segs[q + 1]
            if a == b:
                out.append(None)
                continue
            d = csr.dst_sorted_dst[a:b]
            first = np.empty(b - a, dtype=bool)
            first[0] = True
            first[1:] = d[1:] != d[:-1]
            idx = np.flatnonzero(first)
            out.append(pack_partial(
                d[idx] - self.bounds[q],
                np.add.reduceat(edge_vals[a:b], idx),
                int(self.bounds[q + 1] - self.bounds[q])))
        return out if len(out) > 1 else out[0]

    def _min_reduce_ranges(self, d_all: np.ndarray, edge_vals: np.ndarray,
                           segs: np.ndarray):
        """Shared tail of the min-semiring pushes: per-dst-range
        unique-dst ``minimum.reduceat`` partials."""
        out = []
        for q in range(len(self.bounds) - 1):
            a, b = segs[q], segs[q + 1]
            if a == b:
                out.append(None)
                continue
            d = d_all[a:b]
            first = np.empty(b - a, dtype=bool)
            first[0] = True
            first[1:] = d[1:] != d[:-1]
            idx = np.flatnonzero(first)
            out.append(pack_partial(
                d[idx] - self.bounds[q],
                np.minimum.reduceat(edge_vals[a:b], idx),
                int(self.bounds[q + 1] - self.bounds[q]),
                fill=np.iinfo(np.int64).max))
        return out if len(out) > 1 else out[0]

    def _frontier_edges(self, changed):
        """(dst array, src-local array, range segs) for the edge subset
        whose src is flagged in ``changed`` (all edges when None) — the
        frontier restriction shared by min_push / min_plus_push /
        sketch_push. EXACT for idempotent monotone merges (min/max):
        an unchanged src re-pushes values its dsts already absorbed."""
        csr = self.csr
        src_l = csr.dst_sorted_src - csr.lo
        if changed is None:
            return csr.dst_sorted_dst, src_l, self.segs, slice(None)
        keep = changed[src_l]
        d_all = csr.dst_sorted_dst[keep]
        return (d_all, src_l[keep],
                np.searchsorted(d_all, self.bounds), keep)

    def min_push(self, label_chunk: np.ndarray, changed=None):
        """Hash-min combiner: per-dst-range elementwise-min of incoming
        src labels (connected components superstep). ``changed``
        restricts to the frontier (see _frontier_edges)."""
        d_all, src_l, segs, _ = self._frontier_edges(changed)
        return self._min_reduce_ranges(d_all, label_chunk[src_l], segs)

    def max_push(self, label_chunk: np.ndarray, changed=None):
        """Hash-MAX combiner: min_push's mirror (SCC forward coloring,
        pipelines/scc.py — callers mask inactive vertices to int64-min
        so they never win a max). ``changed`` restricts to the frontier
        (see _frontier_edges)."""
        d_all, src_l, segs, _ = self._frontier_edges(changed)
        edge_vals = label_chunk[src_l]
        out = []
        for q in range(len(self.bounds) - 1):
            a, b = segs[q], segs[q + 1]
            if a == b:
                out.append(None)
                continue
            d = d_all[a:b]
            first = np.empty(b - a, dtype=bool)
            first[0] = True
            first[1:] = d[1:] != d[:-1]
            idx = np.flatnonzero(first)
            out.append(pack_partial(
                d[idx] - self.bounds[q],
                np.maximum.reduceat(edge_vals[a:b], idx),
                int(self.bounds[q + 1] - self.bounds[q]),
                fill=np.iinfo(np.int64).min))
        return out if len(out) > 1 else out[0]

    def min_plus_push(self, dist_chunk: np.ndarray, weighted: bool = False,
                      changed=None):
        """Min-plus (tropical) relaxation combiner — the SSSP superstep:
        per-dst-range elementwise MIN of ``dist[src] + w_e`` (Bellman-
        Ford over the distributed CSR). Unreached sources carry the
        ``SSSP_INF = 2^62`` sentinel; their relaxations land at
        ``INF + w`` which can never beat a stored value (reached values
        are < INF and an unreached slot holds exactly INF), so no mask
        is needed and the arithmetic stays order-independent int64 —
        exactly reproducible by the unrolled SQL relaxation in
        ``__ray_entry__._sssp_oracle_sql``. ``weighted=True`` uses the
        shard's per-edge weights (``shard_edges(weight_col=...)``),
        else hop count (+1 per edge). ``changed`` restricts relaxation
        to out-edges of improved vertices — Bellman-Ford's queue form
        (see _frontier_edges)."""
        csr = self.csr
        d_all, src_l, segs, keep = self._frontier_edges(changed)
        edge_vals = dist_chunk[src_l]
        if weighted:
            if csr.dst_sorted_weight is None:
                raise ValueError("shard has no weights; write with weight_col")
            edge_vals = edge_vals + csr.dst_sorted_weight[keep]
        else:
            edge_vals = edge_vals + 1
        return self._min_reduce_ranges(d_all, edge_vals, segs)

    def sketch_push(self, reg_chunk: np.ndarray, changed=None):
        """HyperANF register push (pipelines/anf.py): per-dst-range
        ``(local_offsets, reg_block)`` where the block is the
        register-wise MAX over incoming src sketches — same
        unique-dst ``reduceat`` shape as scatter/min_push, lifted to
        the (edges, HLL_M) uint8 register matrix.

        ``changed`` (optional bool mask over owned vertices) restricts
        the push to edges whose src sketch changed last superstep — the
        frontier form. EXACT under the idempotent monotone max-merge:
        an unchanged src's push is identical to the one its dsts
        already absorbed, so skipping it cannot alter any register.

        ``reg_chunk`` is normally the DELTA sketch (changed registers
        only, zeros elsewhere — pipelines/anf.py `_merge_regs`): max
        with 0 is a no-op, so the push stays exact per register while
        the blocks turn mostly-zero as balls saturate. Mostly-zero
        blocks ship in a sparse ``("s", offsets, flat_idx, values,
        n_rows)`` form (~5 B per live register vs 64 B per row dense) —
        this is what cuts the documented E×64 B/superstep exchange to
        O(registers that actually changed)."""
        d_all, src_l, segs, _ = self._frontier_edges(changed)
        edge_regs = reg_chunk[src_l]
        out = []
        for q in range(len(self.bounds) - 1):
            a, b = segs[q], segs[q + 1]
            if a == b:
                out.append(None)
                continue
            d = d_all[a:b]
            first = np.empty(b - a, dtype=bool)
            first[0] = True
            first[1:] = d[1:] != d[:-1]
            idx = np.flatnonzero(first)
            offsets = d[idx] - self.bounds[q]
            block = np.maximum.reduceat(edge_regs[a:b], idx, axis=0)
            nz = np.flatnonzero(block.reshape(-1))
            # int32 idx + uint8 val ≈ 5 B/entry vs 1 B/slot dense
            if nz.size * 5 < block.size:
                out.append(("s", offsets, nz.astype(np.int32),
                            block.reshape(-1)[nz], block.shape[0]))
            else:
                out.append((offsets, block))
        return out if len(out) > 1 else out[0]

    def walk_next(self, vs: np.ndarray, step: int) -> np.ndarray:
        """Deterministic-walk hop: for each (owned) vertex in ``vs``,
        the ``H(v, step) % out_deg``-th smallest out-neighbor (CSR
        indices are dst-sorted within src by construction), or -1 when
        the vertex has no out-edges. Hash frozen in pipelines/walks.py
        (shared SQL twin)."""
        from ..pipelines.walks import walk_hash

        csr = self.csr
        f = vs - csr.lo
        deg = csr.out_deg[f]
        nxt = np.full(len(f), -1, dtype=np.int64)
        has = deg > 0
        if has.any():
            rnk = walk_hash(vs[has], step) % deg[has]
            nxt[has] = csr.indices[csr.indptr[f[has]] + rnk]
        return nxt

    def gather_neighbors(self, frontier: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(dst, parent_src) pairs for frontier vertices owned by this
        shard — the BFS expansion (PageMapper analog, WikiRoutes.kt:102-124)."""
        csr = self.csr
        f = frontier[(frontier >= csr.lo) & (frontier < csr.hi)] - csr.lo
        if len(f) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        starts = csr.indptr[f]
        ends = csr.indptr[f + 1]
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        idx = np.repeat(starts + counts - counts.cumsum(), counts) + np.arange(total)
        # idx enumerates [starts[i], ends[i]) concatenated
        dsts = csr.indices[idx]
        parents = np.repeat(f + csr.lo, counts)
        return dsts, parents

    def label_messages(self, label_chunk: np.ndarray):
        """Per-dst-range (dst, label) message rows — the groupby-shuffle
        form WITHOUT a combiner, needed when the aggregate is a mode
        (label propagation): a mode is not decomposable into per-shard
        partials the way sum/min are, so raw (dst, label) pairs flow to
        the per-range reducer, pre-partitioned by dst range here
        (map-side shuffle write)."""
        csr = self.csr
        edge_vals = csr.edge_values_by_dst(label_chunk)
        out = []
        for q in range(len(self.bounds) - 1):
            a, b = self.segs[q], self.segs[q + 1]
            out.append((csr.dst_sorted_dst[a:b], edge_vals[a:b]))
        return out if len(out) > 1 else out[0]

    def label_weight_sums(self, label_chunk: np.ndarray):
        """Per-dst-range (dst, label, weight_sum) rows, PRE-COMBINED per
        (dst, label) inside the shard — the map-side combiner form for
        ADDITIVE per-label aggregates (Louvain's k_in is a weighted sum,
        unlike labelprop's mode): what ships is bounded by distinct
        (dst, incoming-label) pairs per shard, never by edges. Weight
        is the shard's per-edge weight when written with ``weight_col``,
        else 1."""
        csr = self.csr
        edge_vals = csr.edge_values_by_dst(label_chunk)
        w = csr.dst_sorted_weight if csr.dst_sorted_weight is not None \
            else np.ones(len(edge_vals), dtype=np.int64)
        out = []
        for q in range(len(self.bounds) - 1):
            a, b = self.segs[q], self.segs[q + 1]
            d, l, ww = csr.dst_sorted_dst[a:b], edge_vals[a:b], w[a:b]
            if len(d) == 0:
                out.append((d, l, ww.astype(np.int64)))
                continue
            order = np.lexsort((l, d))
            d, l, ww = d[order], l[order], ww[order]
            first = np.empty(len(d), dtype=bool)
            first[0] = True
            first[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
            starts = np.flatnonzero(first)
            sums = np.add.reduceat(ww.astype(np.int64), starts)
            out.append((d[starts], l[starts], sums))
        return out if len(out) > 1 else out[0]

    def bfs_expand_val(self, frontier_v: np.ndarray,
                       frontier_sid: np.ndarray,
                       frontier_val: np.ndarray):
        """bfs_expand carrying a per-walker int64 VALUE instead of the
        parent id: emits (dst, value, sid) candidates pre-partitioned
        by dst range, with values PRE-SUMMED per (dst, sid) — values
        are additive (path counts / suffix counts), so the map-side
        combiner here bounds shipped rows at O(touched dsts × K)
        instead of O(frontier out-edges): the difference between
        shipping unique slots and shipping the raw E×K fan-out at
        pivot-sampled scale. Used by pipelines/pathcount.py and
        pipelines/stress.py."""
        csr = self.csr
        own = (frontier_v >= csr.lo) & (frontier_v < csr.hi)
        f = frontier_v[own] - csr.lo
        sids = frontier_sid[own]
        vals = frontier_val[own]
        P = len(self.bounds) - 1
        empty = (np.empty(0, np.int64), np.empty(0, np.int64),
                 np.empty(0, np.int64))
        if len(f) == 0:
            out = [empty] * P
            return out if P > 1 else out[0]
        starts, ends = csr.indptr[f], csr.indptr[f + 1]
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            out = [empty] * P
            return out if P > 1 else out[0]
        idx = np.repeat(starts + counts - counts.cumsum(), counts) \
            + np.arange(total)
        dsts = csr.indices[idx]
        val_rep = np.repeat(vals, counts)
        sid_rep = np.repeat(sids, counts)
        order = np.lexsort((sid_rep, dsts))
        dsts, val_rep, sid_rep = dsts[order], val_rep[order], sid_rep[order]
        first = np.empty(len(dsts), dtype=bool)
        first[0] = True
        first[1:] = (dsts[1:] != dsts[:-1]) | (sid_rep[1:] != sid_rep[:-1])
        ridx = np.flatnonzero(first)
        dsts, sid_rep = dsts[ridx], sid_rep[ridx]
        val_sum = np.add.reduceat(val_rep, ridx)
        segs = np.searchsorted(dsts, self.bounds)
        out = [
            (dsts[segs[q]:segs[q + 1]], val_sum[segs[q]:segs[q + 1]],
             sid_rep[segs[q]:segs[q + 1]])
            for q in range(P)
        ]
        return out if P > 1 else out[0]

    def bd_step(self, lo: int, level: int, dist, parent, other_dist,
                *candidates):
        """Fused bidirectional-BFS step: reduce level ``level``'s
        candidates destined to this range, then immediately expand the
        newly-discovered frontier over this shard's own adjacency
        (a range's new frontier lives in that range by construction,
        and this actor owns its out-edges) — emitting the NEXT level's
        candidates pre-partitioned by dst range.

        Route queries are bound by per-level round latency: fusing the
        reduce into the same dispatch as the following expand halves the
        actor hops per level (expand->reduce was two chained actor calls
        per level; now one call per level plus a one-off bootstrap
        expand). Pure function of its arguments (no actor state).

        Returns P+4 values: (P per-dst-range candidate triples...,
        dist|None, parent|None, frontier, packed) — the reduce tail is
        exactly ``_bd_reduce_impl``'s contract."""
        from ..pipelines.bidirectional import _bd_reduce_impl

        new_dist, new_parent, frontier, packed = _bd_reduce_impl(
            lo, level, dist, parent, other_dist, *candidates)
        ex = self.bfs_expand_mono(frontier)
        P = len(self.bounds) - 1
        if P == 1:
            ex = [ex]
        return (*ex, new_dist, new_parent, frontier, packed)

    def bfs_expand_mono(self, frontier_v: np.ndarray):
        """Single-source expansion: like bfs_expand with sid=0 for all
        frontier vertices (callers holding the frontier only as an
        object ref can't size a sid array driver-side)."""
        return self.bfs_expand(frontier_v,
                               np.zeros(len(frontier_v), dtype=np.int64))

    def bfs_expand(self, frontier_v: np.ndarray, frontier_sid: np.ndarray):
        """Multi-source BFS expansion: for frontier vertices owned by
        this shard, emit (dst, parent, sid) candidates pre-partitioned
        by dst range (the reference's forEachLinkIndex neighbor
        iteration, WikiRoutes.kt:102-124, batched + multi-source)."""
        csr = self.csr
        own = (frontier_v >= csr.lo) & (frontier_v < csr.hi)
        f = frontier_v[own] - csr.lo
        sids = frontier_sid[own]
        P = len(self.bounds) - 1
        empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
        if len(f) == 0:
            out = [empty] * P
            return out if P > 1 else out[0]
        starts, ends = csr.indptr[f], csr.indptr[f + 1]
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            out = [empty] * P
            return out if P > 1 else out[0]
        idx = np.repeat(starts + counts - counts.cumsum(), counts) + np.arange(total)
        dsts = csr.indices[idx]
        parents = np.repeat(f + csr.lo, counts)
        sid_rep = np.repeat(sids, counts)
        order = np.argsort(dsts, kind="stable")
        dsts, parents, sid_rep = dsts[order], parents[order], sid_rep[order]
        segs = np.searchsorted(dsts, self.bounds)
        out = [
            (dsts[segs[q]:segs[q + 1]], parents[segs[q]:segs[q + 1]],
             sid_rep[segs[q]:segs[q + 1]])
            for q in range(P)
        ]
        return out if P > 1 else out[0]


def default_num_shards(n_vertices: int | None = None, *,
                       kind: str = "analytics",
                       cores: float | None = None) -> int:
    """Pool-size heuristic from BASELINE.md's measured P-sweep.

    ``kind="analytics"`` (supersteps: PageRank/BFS/ANF/...): P ≈ cores/2
    — compute-parallel up to ~half the cores, past which the P² partial
    exchange and reducer/actor contention invert the gain (measured at
    4M/40.5M: P=16 best on 32 cores, P=24/32 collapse without sparse
    transport). ``kind="route"`` (interactive point queries): small
    fixed pools — each query touches every shard per level, so route
    latency GROWS with P (41.5 ms at P=4 on the 400k graph); scale
    route THROUGHPUT by replicating pools, not widening one.

    ``n_vertices`` caps P so tiny graphs don't pay actor startup for
    near-empty ranges (≥1000 owned vertices per shard).
    """
    if cores is None:
        cores = ray.cluster_resources().get("CPU", 8) \
            if ray.is_initialized() else 8
    p = min(4, int(cores)) if kind == "route" else max(1, int(cores) // 2)
    if n_vertices is not None:
        p = min(p, max(1, n_vertices // 1000))
    return max(1, p)


def create_shard_actors(shard_paths: list[str], n_vertices: int,
                        key: str = "src"):
    """Spawn one CSRShardActor per shard; blocks until all loaded.
    ``key="dst"`` loads shards written with ``shard_edges(by="dst")`` as
    the reverse adjacency."""
    P = len(shard_paths)
    bounds = vertex_ranges(n_vertices, P)
    fs_snap = fsio.snapshot()
    actors = [
        CSRShardActor.remote(shard_paths[p], int(bounds[p]), int(bounds[p + 1]),
                             bounds.tolist(), key, fs_snap)
        for p in range(P)
    ]
    ray.get([a.ready.remote() for a in actors])
    return actors, bounds

"""k-truss decomposition (fixed-k) — iterated triangle-support peel.

No reference implementation (SURVEY.md §2.12 family). The k-truss of an
undirected simple graph is its maximal subgraph in which every edge
participates in >= k-2 triangles (Cohen 2008) — the edge-level sibling
of k-core and the standard cohesive-community extractor on web graphs.

Per peel round (same machinery as ``pipelines/triangles.py``, but
crediting EDGES instead of counting):

1. degree-orient the surviving edge set (low (deg,id) -> high): every
   oriented out-neighborhood is O(sqrt E) — the hub skew guard;
2. per apex bucket, generate ordered wedges vectorized and close them
   against the broadcast packed-key edge array (fused — the wedge table
   never materializes) OR, past ``broadcast_edge_limit``, co-bucket
   materialized wedges with edges and merge (two-shuffle path);
3. each closed wedge (apex, a, b) is one triangle crediting its three
   CANONICAL edges (min, max); per-bucket ``np.unique`` pre-counts then
   one ``grouped_agg`` sum -> support(lo, hi, n);
4. survivors = edges with support >= k-2 (edges in no triangle have no
   support row and drop implicitly, k >= 3). Repeat until a round drops
   nothing (``max_rounds`` bounds the loop; ``converged`` reports it —
   the SQL oracle unrolls a fixed round count, so gated queries assert
   convergence within it).

Exchange per round: oriented edges + per-bucket (edge, count) partials
— O(E + triangles-in-round) rows, never the wedge blowup; the peeled
edge set shrinks monotonically.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray as _ray
import ray.data

from ..stages.agg import _bucket_of, grouped_agg, sorted_run_pairs
from .triangles import _canonical_edges


def _orient(und: "ray.data.Dataset") -> "ray.data.Dataset":
    """Degree-orient canonical (lo, hi) edges -> (u, v, vdeg); degrees
    recomputed on the CURRENT subgraph (broadcast dense array)."""

    def explode(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(np.concatenate([lo, hi]), pa.int64())})

    deg = grouped_agg(und.map_batches(explode, batch_format="pyarrow"),
                      ["v"], None, "count", out_col="deg")
    ddf = deg.to_pandas()
    dense = np.zeros((int(ddf["v"].max()) + 1) if len(ddf) else 1,
                     dtype=np.int64)
    dense[ddf["v"].to_numpy()] = ddf["deg"].to_numpy()
    deg_ref = _ray.put(dense)

    def orient(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        dd = _ray.get(deg_ref)
        ld, hd = dd[lo], dd[hi]
        lo_first = (ld < hd) | ((ld == hd) & (lo < hi))
        return pa.table({
            "u": pa.array(np.where(lo_first, lo, hi), pa.int64()),
            "v": pa.array(np.where(lo_first, hi, lo), pa.int64()),
            "vdeg": pa.array(np.where(lo_first, hd, ld), pa.int64()),
        })

    return und.map_batches(orient, batch_format="pyarrow")


def _wedges(g: pd.DataFrame):
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    vd = g["vdeg"].to_numpy()
    order = np.lexsort((v, vd, u))
    u_s, v_s = u[order], v[order]
    a_idx, b_idx, _ = sorted_run_pairs([u_s])
    if len(a_idx) == 0:
        return None
    return (u_s[a_idx].astype(np.int64), v_s[a_idx].astype(np.int64),
            v_s[b_idx].astype(np.int64))


def _credit_rows(apex: np.ndarray, a: np.ndarray, b: np.ndarray
                 ) -> pd.DataFrame:
    """Three canonical-edge credits per triangle, pre-counted locally
    (ids < 2^31 pack into one int64 for the unique)."""
    e1l, e1h = np.minimum(apex, a), np.maximum(apex, a)
    e2l, e2h = np.minimum(apex, b), np.maximum(apex, b)
    e3l, e3h = np.minimum(a, b), np.maximum(a, b)
    lo = np.concatenate([e1l, e2l, e3l])
    hi = np.concatenate([e1h, e2h, e3h])
    packed = (lo.astype(np.uint64) << np.uint64(32)) | hi.astype(np.uint64)
    keys, cnt = np.unique(packed, return_counts=True)
    return pd.DataFrame({
        "lo": (keys >> np.uint64(32)).astype(np.int64),
        "hi": (keys & np.uint64(0xFFFFFFFF)).astype(np.int64),
        "n": cnt.astype(np.int64)})


_EMPTY_CREDIT = pd.DataFrame({"lo": np.empty(0, np.int64),
                              "hi": np.empty(0, np.int64),
                              "n": np.empty(0, np.int64)})


def edge_support(und: "ray.data.Dataset", *, num_partitions: int = 8,
                 broadcast_edge_limit: int = 50_000_000
                 ) -> "ray.data.Dataset":
    """Per-edge triangle support of the canonical (lo, hi) edge set:
    Dataset (lo, hi, support) covering edges in >= 1 triangle."""
    oriented = _orient(und).materialize()
    n_buckets = max(num_partitions, 32)

    def part_by_u(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array(
            _bucket_of(u.astype(np.int64), num_buckets=n_buckets)))

    if oriented.count() <= broadcast_edge_limit:
        @_ray.remote
        def _pack_sorted_keys(*tables: pa.Table) -> np.ndarray:
            # to_arrow_refs takes its zero-copy path on the dataset
            # SCHEMA, so an empty pandas block from an upstream
            # map_groups can arrive unconverted — normalize per block
            tables = [pa.Table.from_pandas(t) if isinstance(t, pd.DataFrame)
                      else t for t in tables]
            tables = [t for t in tables
                      if t.num_rows and "u" in t.column_names]
            if not tables:
                return np.empty(0, np.uint64)
            ts = pa.concat_tables(tables)
            u = ts.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
            v = ts.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
            return np.sort((u << np.uint64(32)) | v)

        keys_ref = _pack_sorted_keys.remote(
            *oriented.select_columns(["u", "v"]).to_arrow_refs())

        def wedge_close_credit(g: pd.DataFrame) -> pd.DataFrame:
            w = _wedges(g)
            if w is None:
                return _EMPTY_CREDIT
            apex, a, b = w
            ks = _ray.get(keys_ref)
            packed = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
            idx = np.searchsorted(ks, packed)
            found = (idx < len(ks)) & (ks[np.minimum(idx, len(ks) - 1)] == packed)
            if not found.any():
                return _EMPTY_CREDIT
            return _credit_rows(apex[found], a[found], b[found])

        parts = (oriented.map_batches(part_by_u, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(wedge_close_credit, batch_format="pandas"))
    else:
        def gen_wedges(g: pd.DataFrame) -> pd.DataFrame:
            w = _wedges(g)
            if w is None:
                return pd.DataFrame({"apex": np.empty(0, np.int64),
                                     "a": np.empty(0, np.int64),
                                     "b": np.empty(0, np.int64)})
            return pd.DataFrame({"apex": w[0], "a": w[1], "b": w[2]})

        wed = (oriented.map_batches(part_by_u, batch_format="pyarrow")
               .groupby("__part").map_groups(gen_wedges,
                                             batch_format="pandas"))

        def tag(is_edge: int):
            def fn(t: pa.Table) -> pa.Table:
                a = t.column("a" if is_edge == 0 else "u"
                             ).to_numpy(zero_copy_only=False)
                b = t.column("b" if is_edge == 0 else "v"
                             ).to_numpy(zero_copy_only=False)
                apex = (t.column("apex").to_numpy(zero_copy_only=False)
                        if is_edge == 0 else np.full(len(a), -1, np.int64))
                return pa.table({
                    "a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64()),
                    "apex": pa.array(apex, pa.int64()),
                    "__e": pa.array(np.full(len(a), is_edge, np.int8)),
                    "__part": pa.array(_bucket_of(
                        a.astype(np.int64), b.astype(np.int64),
                        num_buckets=n_buckets)),
                })
            return fn

        both = (wed.map_batches(tag(0), batch_format="pyarrow")
                .union(oriented.select_columns(["u", "v"])
                       .map_batches(tag(1), batch_format="pyarrow")))

        def close_credit(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["__e"] == 1][["a", "b"]]
            w = g[g["__e"] == 0]
            m = w.merge(e, on=["a", "b"]) if (len(e) and len(w)) else w.iloc[:0]
            if not len(m):
                return _EMPTY_CREDIT
            return _credit_rows(m["apex"].to_numpy(), m["a"].to_numpy(),
                                m["b"].to_numpy())

        parts = both.groupby("__part").map_groups(close_credit,
                                                  batch_format="pandas")
    return grouped_agg(parts, ["lo", "hi"], "n", "sum", out_col="support")


@dataclass
class TrussResult:
    edges: "ray.data.Dataset"  # surviving canonical (lo, hi) edges
    rounds: int                # peel rounds executed (incl. the no-drop one)
    converged: bool


def k_truss(edges: "ray.data.Dataset", k: int, *, num_partitions: int = 8,
            max_rounds: int = 32,
            broadcast_edge_limit: int = 50_000_000) -> TrussResult:
    """Fixed-k truss of the undirected simple graph underlying
    ``edges(src, dst)`` (direction/self-loops/duplicates canonicalized
    away first). Requires ``k >= 3``."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3 (every edge is in the "
                         "2-truss)")
    und = _canonical_edges(edges, num_partitions).materialize()
    m = und.count()
    rounds = 0
    converged = False
    while rounds < max_rounds:
        rounds += 1
        support = edge_support(und, num_partitions=num_partitions,
                               broadcast_edge_limit=broadcast_edge_limit)

        def keep(t: pa.Table, thresh: int = k - 2) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.greater_equal(t["support"], thresh)) \
                    .select(["lo", "hi"])

        survivors = support.map_batches(
            keep, batch_format="pyarrow").materialize()
        # the wedge/closure plan inflates block counts (union + bucket
        # map_groups emit one block per input block); left alone the
        # next round inherits 2x the blocks — mostly empty — and the
        # loop goes superlinear. Compact to a bounded width per round.
        if survivors.num_blocks() > 4 * num_partitions:
            survivors = survivors.repartition(num_partitions).materialize()
        m2 = survivors.count()
        if m2 == m:
            converged = True
            break
        und, m = survivors, m2
        if m == 0:
            # empty Datasets drop their schema through map_groups;
            # hand back a typed empty table so downstream projections
            # (and the oracle compare) see (lo, hi) regardless
            und = ray.data.from_arrow(pa.table({
                "lo": pa.array([], pa.int64()),
                "hi": pa.array([], pa.int64())}))
            converged = True
            break
    return TrussResult(edges=und, rounds=rounds, converged=converged)

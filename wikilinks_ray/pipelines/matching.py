"""Maximal matching (and the classic 2-approx vertex cover).

No reference implementation (SURVEY.md §2.12). Distributed
symmetry-breaking on EDGES — the edge-world sibling of Luby MIS
(Israeli & Itai 1986): per round every alive edge draws a
deterministic 64-bit key (md5 of "lo_hi_round", the same
little-endian-8-byte convention as every other oracle twin =
DuckDB ``md5_number_upper``); an edge joins the matching iff its key
is the strict minimum among ALL edges incident to either endpoint
(keys are md5-distinct, so per-vertex minima are unique); matched
endpoints leave the graph. Locally-minimal edges are vertex-disjoint
by construction and always exist (the globally minimal alive edge
qualifies), so every round makes progress and whp O(log E) rounds
suffice. The union of rounds is a MAXIMAL matching; its endpoint set
is the textbook 2-approximate minimum vertex cover.

Pure Ray Data (no CSR pool): per round one map (keys), one exploded
grouped-min (per-vertex min key — the combiner-backed
``stages.agg.grouped_agg``), one broadcast filter (vertex→min-key
table, size-gated like the k-core peel; swap for semi-joins past the
broadcast budget). Matched-vertex state is an O(V) sorted id array.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _edge_keys(lo: np.ndarray, hi: np.ndarray, t: int) -> np.ndarray:
    """63-bit md5 keys (top bit shifted off so the int64 aggregation
    path keeps uint64 ordering; SQL twin: md5_number_upper(...) >> 1)."""
    h = np.fromiter(
        (int.from_bytes(
            hashlib.md5(f"{a}_{b}_{t}".encode()).digest()[:8], "little")
         for a, b in zip(lo, hi)),
        dtype=np.uint64, count=len(lo))
    return (h >> np.uint64(1)).astype(np.int64)


def maximal_matching(
    edges: "ray.data.Dataset",
    *,
    max_rounds: int = 64,
) -> tuple[np.ndarray, np.ndarray, int, bool]:
    """(matched_lo, matched_hi, rounds, converged) over the undirected
    simple graph underlying ``edges`` (direction ignored, self-loops
    dropped, duplicates collapsed); pairs are canonical lo < hi. The
    2-approx vertex cover is ``np.union1d(matched_lo, matched_hi)``."""
    from ..pipelines.triangles import _canonical_edges
    from ..stages.agg import grouped_agg

    alive = _canonical_edges(edges, 8).materialize()
    out_lo, out_hi = [], []
    rounds = 0
    while rounds < max_rounds and alive.count() > 0:
        t = rounds
        rounds += 1

        def add_key(tb: pa.Table, t=t) -> pa.Table:
            lo = tb.column("lo").to_numpy(zero_copy_only=False)
            hi = tb.column("hi").to_numpy(zero_copy_only=False)
            return tb.append_column(
                "k", pa.array(_edge_keys(lo, hi, t), pa.int64()))

        keyed = alive.map_batches(add_key,
                                  batch_format="pyarrow").materialize()

        def explode(tb: pa.Table) -> pa.Table:
            lo = tb.column("lo").to_numpy(zero_copy_only=False)
            hi = tb.column("hi").to_numpy(zero_copy_only=False)
            k = tb.column("k").to_numpy(zero_copy_only=False)
            return pa.table({
                "v": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "k": pa.array(np.concatenate([k, k]), pa.int64()),
            })

        vmin = grouped_agg(keyed.map_batches(explode,
                                             batch_format="pyarrow"),
                           ["v"], "k", "min", out_col="m").to_pandas()
        v_ids = vmin["v"].to_numpy().astype(np.int64)
        v_min = vmin["m"].to_numpy().astype(np.int64)
        o = np.argsort(v_ids)
        vm_ref = ray.put((v_ids[o], v_min[o]))

        def select(tb: pa.Table) -> pa.Table:
            ids, mins = ray.get(vm_ref)
            lo = tb.column("lo").to_numpy(zero_copy_only=False)
            hi = tb.column("hi").to_numpy(zero_copy_only=False)
            k = tb.column("k").to_numpy(zero_copy_only=False)
            win = (mins[np.searchsorted(ids, lo)] == k) \
                & (mins[np.searchsorted(ids, hi)] == k)
            return tb.filter(pa.array(win)).select(["lo", "hi"])

        sel = keyed.map_batches(select, batch_format="pyarrow").to_pandas()
        if len(sel):
            out_lo.append(sel["lo"].to_numpy().astype(np.int64))
            out_hi.append(sel["hi"].to_numpy().astype(np.int64))
            matched = np.union1d(sel["lo"].to_numpy(),
                                 sel["hi"].to_numpy()).astype(np.int64)
            m_ref = ray.put(pa.array(matched))

            def drop(tb: pa.Table, m=m_ref) -> pa.Table:
                import pyarrow.compute as pc

                arr = ray.get(m)
                keep = pc.and_(
                    pc.invert(pc.is_in(tb["lo"], value_set=arr)),
                    pc.invert(pc.is_in(tb["hi"], value_set=arr)))
                return tb.filter(keep)

            alive = alive.map_batches(drop,
                                      batch_format="pyarrow").materialize()

    lo = np.concatenate(out_lo) if out_lo else np.empty(0, np.int64)
    hi = np.concatenate(out_hi) if out_hi else np.empty(0, np.int64)
    order = np.lexsort((hi, lo))
    return lo[order], hi[order], rounds, alive.count() == 0

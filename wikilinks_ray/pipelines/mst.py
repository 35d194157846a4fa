"""Distributed minimum spanning forest: Borůvka rounds over a weighted
undirected edge Dataset.

No reference implementation (the reference engine has no weighted-graph
algorithms — SURVEY.md §2's graph family is this repo's extension
surface); the algorithm is the classic Borůvka (1926) / "Sollin"
contraction scheme, the standard distributed MST plan because every
round is one data-parallel pass: each component picks its minimum
outgoing edge, the picked edges merge components, edges relabel to the
merged components, repeat. Components at least halve per round, so
``<= ceil(log2 n)`` rounds.

Determinism: edges are totally ordered by the lexicographic triple
``(w, u, v)`` — (u, v) is unique per canonical edge, so the order is
total, the per-component argmin unambiguous, and the output is THE
minimum spanning forest of the perturbed weights (w, u, v) — a true
MSF of w, bit-stable across partitionings and replayable round-by-round
by a SQL oracle with the same tie-break.

Scale shape (SCALE.md row "MST"): per round the exchange is one
bucketed argmin shuffle whose post-combine volume is O(#components)
rows (each batch emits at most one candidate per component it sees);
selected edges and the merge map live transiently on the driver at
O(#components-this-round) — the SAME order as the query's own return
value (the forest is O(n) rows and is collected anyway), halving every
round, so the driver peak is ~2x the output it must hold regardless.
Edge relabeling broadcasts the merge map under
``label_broadcast_limit`` (``ray.put`` once, ``searchsorted`` per
batch) and auto-routes to a two-pass bucketed hash join above it —
the same gate pattern as build_graph's title join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..stages.agg import _bucket_of


def _argmin_per_comp(edges: "ray.data.Dataset", *, num_buckets: int
                     ) -> "ray.data.Dataset":
    """Per-component lexicographic-min (w, u, v) outgoing edge over rows
    (cu, cv, w, u, v) with cu != cv, both directions. Combiner-first:
    each batch emits at most one candidate row per component before the
    one bucketed shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        cu = t.column("cu").to_numpy(zero_copy_only=False)
        cv = t.column("cv").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        comp = np.concatenate([cu, cv])
        other = np.concatenate([cv, cu])
        w2, u2, v2 = np.tile(w, 2), np.tile(u, 2), np.tile(v, 2)
        order = np.lexsort((v2, u2, w2, comp))
        comp, other = comp[order], other[order]
        w2, u2, v2 = w2[order], u2[order], v2[order]
        first = np.concatenate(([True], comp[1:] != comp[:-1])) \
            if len(comp) else np.empty(0, bool)
        return pa.table({
            "comp": pa.array(comp[first], pa.int64()),
            "other": pa.array(other[first], pa.int64()),
            "w": pa.array(w2[first], pa.int64()),
            "u": pa.array(u2[first], pa.int64()),
            "v": pa.array(v2[first], pa.int64()),
            "__b": pa.array(_bucket_of(comp[first],
                                       num_buckets=num_buckets)),
        })

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        comp = g["comp"].to_numpy().astype(np.int64)
        other = g["other"].to_numpy().astype(np.int64)
        w = g["w"].to_numpy().astype(np.int64)
        u = g["u"].to_numpy().astype(np.int64)
        v = g["v"].to_numpy().astype(np.int64)
        order = np.lexsort((v, u, w, comp))
        comp, other = comp[order], other[order]
        w, u, v = w[order], u[order], v[order]
        first = np.concatenate(([True], comp[1:] != comp[:-1])) \
            if len(comp) else np.empty(0, bool)
        return pd.DataFrame({"comp": comp[first], "other": other[first],
                             "w": w[first], "u": u[first], "v": v[first]})

    return (edges.map_batches(partial, batch_format="pyarrow")
            .groupby("__b").map_groups(reduce, batch_format="pandas"))


def _merge_roots(comp: np.ndarray, other: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Resolve the selected-edge functional graph comp -> other into
    per-component roots: mutual (2-cycle) picks collapse to the SMALLER
    label, chains pointer-double to their cycle's root. Returns
    (sorted_comp_ids, root_of_each). Every ``other`` is itself a
    component with a selection (outgoing edges are symmetric), so the
    indexing below is total."""
    sc = np.sort(comp)
    pos = np.searchsorted(sc, comp)
    parr = np.empty_like(sc)
    parr[pos] = other
    pi = np.searchsorted(sc, parr)  # parent INDEX per sorted slot
    idx = np.arange(len(sc))
    mutual = pi[pi] == idx
    pi = np.where(mutual, np.where(sc[pi] < sc, pi, idx), pi)
    while True:
        nxt = pi[pi]
        if np.array_equal(nxt, pi):
            break
        pi = nxt
    return sc, sc[pi]


def _relabel_broadcast(edges: "ray.data.Dataset", keys: np.ndarray,
                       vals: np.ndarray) -> "ray.data.Dataset":
    if not len(keys):  # no comp changed (can't happen mid-loop — sel
        return edges   # non-empty forces >= 1 merge — but stay total)
    ref = ray.put((keys, vals))

    def relabel(t: pa.Table) -> pa.Table:
        k, r = ray.get(ref)
        out = {}
        for col in ("cu", "cv"):
            c = t.column(col).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(k, c)
            idx_c = np.minimum(idx, len(k) - 1) if len(k) else idx
            hit = (k[idx_c] == c) if len(k) else np.zeros(len(c), bool)
            out[col] = pa.array(np.where(hit, r[idx_c] if len(k) else c, c),
                                pa.int64())
        for col in ("w", "u", "v"):
            out[col] = t.column(col)
        return pa.table(out)

    return edges.map_batches(relabel, batch_format="pyarrow")


_SCHEMA = ("cu", "cv", "w", "u", "v")


def _relabel_join(edges: "ray.data.Dataset", keys: np.ndarray,
                  vals: np.ndarray, *, num_buckets: int
                  ) -> "ray.data.Dataset":
    """Above the broadcast gate: relabel cu then cv via two bucketed
    hash-join passes — map rows and edge rows co-bucket on the hash of
    the column being rewritten (a single shared wide schema keeps the
    union concat-safe); per bucket one searchsorted lookup rewrites
    every edge of the bucket at once."""
    map_tbl = pa.table({"__k": pa.array(keys, pa.int64()),
                        "__r": pa.array(vals, pa.int64())})
    out = edges
    for col in ("cu", "cv"):
        def widen_edges(t: pa.Table, col=col) -> pa.Table:
            c = t.column(col).to_numpy(zero_copy_only=False)
            n = t.num_rows
            z = pa.array(np.zeros(n, np.int64))
            cols = {cc: t.column(cc) for cc in _SCHEMA}
            cols["__is_map"] = pa.array(np.zeros(n, bool))
            cols["__b"] = pa.array(_bucket_of(c.astype(np.int64),
                                              num_buckets=num_buckets))
            cols["__k"] = z
            cols["__r"] = z
            return pa.table(cols)

        def widen_map(t: pa.Table) -> pa.Table:
            k = t.column("__k").to_numpy(zero_copy_only=False)
            n = t.num_rows
            z = pa.array(np.zeros(n, np.int64))
            cols = {cc: z for cc in _SCHEMA}
            cols["__is_map"] = pa.array(np.ones(n, bool))
            cols["__b"] = pa.array(_bucket_of(k.astype(np.int64),
                                              num_buckets=num_buckets))
            cols["__k"] = t.column("__k")
            cols["__r"] = t.column("__r")
            return pa.table(cols)

        def join(g: pd.DataFrame, col=col) -> pd.DataFrame:
            is_map = g["__is_map"].to_numpy()
            k = g["__k"].to_numpy()[is_map].astype(np.int64)
            r = g["__r"].to_numpy()[is_map].astype(np.int64)
            e = g[~is_map]
            if not len(e):
                return pd.DataFrame({c: pd.Series(dtype="int64")
                                     for c in _SCHEMA})
            ordk = np.argsort(k)
            k, r = k[ordk], r[ordk]
            c = e[col].to_numpy().astype(np.int64)
            if len(k):
                idx = np.minimum(np.searchsorted(k, c), len(k) - 1)
                hit = k[idx] == c
                c = np.where(hit, r[idx], c)
            cols = {cc: e[cc].to_numpy().astype(np.int64) for cc in _SCHEMA}
            cols[col] = c
            return pd.DataFrame(cols)

        both = (out.map_batches(widen_edges, batch_format="pyarrow")
                .union(ray.data.from_arrow(map_tbl)
                       .map_batches(widen_map, batch_format="pyarrow")))
        out = both.groupby("__b").map_groups(join, batch_format="pandas")
    return out


def boruvka_msf(edges: "ray.data.Dataset", *, num_buckets: int = 64,
                label_broadcast_limit: int = 20_000_000,
                max_rounds: int = 40) -> pd.DataFrame:
    """Minimum spanning forest of an undirected weighted graph given as
    canonical rows (u, v, w) with u != v, one row per undirected edge.
    Returns the forest as a DataFrame (u, v, w) under the total edge
    order (w, u, v) — deterministic, partition-independent, and equal
    to the unique MSF of the perturbed weights."""

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"cu": t.column("u").cast(pa.int64()),
                         "cv": t.column("v").cast(pa.int64()),
                         "w": t.column("w").cast(pa.int64()),
                         "u": t.column("u").cast(pa.int64()),
                         "v": t.column("v").cast(pa.int64())})

    E = edges.map_batches(init, batch_format="pyarrow").materialize()
    mu, mv, mw = [], [], []
    for _r in range(max_rounds):
        sel = _argmin_per_comp(E, num_buckets=num_buckets).to_pandas()
        if not len(sel):
            break
        comp = sel["comp"].to_numpy().astype(np.int64)
        other = sel["other"].to_numpy().astype(np.int64)
        su = sel["u"].to_numpy().astype(np.int64)
        sv = sel["v"].to_numpy().astype(np.int64)
        sw = sel["w"].to_numpy().astype(np.int64)
        # mutual picks produce the same (u, v) twice -> dedup
        o = np.lexsort((sv, su))
        su, sv, sw = su[o], sv[o], sw[o]
        keep = np.concatenate(([True], (su[1:] != su[:-1])
                               | (sv[1:] != sv[:-1])))
        mu.append(su[keep]); mv.append(sv[keep]); mw.append(sw[keep])
        sc, roots = _merge_roots(comp, other)
        changed = roots != sc
        keys, vals = sc[changed], roots[changed]
        if len(keys) <= label_broadcast_limit:
            E = _relabel_broadcast(E, keys, vals)
        else:
            E = _relabel_join(E, keys, vals, num_buckets=num_buckets)

        def drop_loops(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.not_equal(t.column("cu"), t.column("cv")))

        E = E.map_batches(drop_loops, batch_format="pyarrow").materialize()
    else:
        raise AssertionError("boruvka_msf: no convergence within "
                             f"{max_rounds} rounds")
    out = pd.DataFrame({"u": np.concatenate(mu) if mu else
                        np.empty(0, np.int64),
                        "v": np.concatenate(mv) if mv else
                        np.empty(0, np.int64),
                        "w": np.concatenate(mw) if mw else
                        np.empty(0, np.int64)})
    return out.sort_values(["u", "v"]).reset_index(drop=True)

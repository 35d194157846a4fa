"""Densest-subgraph extraction: parallel greedy peeling.

No reference implementation (SURVEY.md §2.12). The 2(1+ε)-approximation
of Bahmani, Kumar & Vassilvitskii ("Densest Subgraph in Streaming and
MapReduce", VLDB 2012): repeatedly delete every vertex whose degree is
at most 2(1+ε) times the current average degree, tracking density per
round; the densest intermediate subgraph is the answer. With
ε = num/den - 1 rational, the threshold test

    deg(v) * den * n_t  <=  2 * num * e_t

is pure int64, every round is deterministic, and ≥ half the vertices
drop per round (Markov on the degree sum), so rounds ≤ log n — both
sides of the oracle run the identical unrolled profile.

Plan per round mirrors pipelines/kcore.py (the same peel skeleton with
a density threshold instead of a constant k): bucketed degree count →
survivor filter → edge filter via broadcast `pc.is_in` under the
survivor budget, id-keyed semi-joins above it. The per-round
(n_vertices, n_edges) profile is O(log n) driver rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .kcore import BROADCAST_MAX_SURVIVORS


def densest_subgraph(
    edges: "ray.data.Dataset",
    *,
    num: int = 2,
    den: int = 1,
    max_rounds: int = 64,
    broadcast_max: int = BROADCAST_MAX_SURVIVORS,
):
    """(best_vertices sorted int64, (best_edges, best_n), profile) for
    the undirected simple graph underlying ``edges`` — direction
    ignored, self-loops dropped, duplicates collapsed. ``num/den`` =
    1+ε (default ε=1 → a 4-approximation, log₂ rounds). ``profile`` is
    a list of (round, n_vertices, n_edges) int tuples."""
    from ..pipelines.triangles import _canonical_edges
    from ..stages.agg import grouped_agg
    from ..stages.util import rename_cols

    und = _canonical_edges(edges, 8).materialize()

    def explode(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(np.concatenate([lo, hi]), pa.int64())})

    profile = []
    best = None  # (e, n, und Dataset)
    for t in range(max_rounds):
        e_t = und.count()
        if e_t == 0:
            break
        deg = grouped_agg(und.map_batches(explode, batch_format="pyarrow"),
                          ["v"], None, "count", out_col="deg").materialize()
        n_t = deg.count()
        profile.append((t, n_t, e_t))
        # density e/n compared exactly by cross-multiplication
        if best is None or e_t * best[1] > best[0] * n_t:
            best = (e_t, n_t, und)

        thresh = 2 * num * e_t

        def keep_rows(tb: pa.Table, th=thresh, n=n_t) -> pa.Table:
            d = tb.column("deg").to_numpy(zero_copy_only=False)
            return tb.filter(pa.array(d * den * n > th))

        surv = (deg.map_batches(keep_rows, batch_format="pyarrow")
                .select_columns(["v"]).materialize())
        n_s = surv.count()
        if n_s == 0:
            break
        if n_s <= broadcast_max:
            ids = np.sort(np.array([r["v"] for r in surv.take_all()],
                                   dtype=np.int64))
            alive = ray.put(pa.array(ids))

            def keep_edges(tb: pa.Table, a=alive) -> pa.Table:
                arr = ray.get(a)
                return tb.filter(pc.and_(pc.is_in(tb["lo"], value_set=arr),
                                         pc.is_in(tb["hi"], value_set=arr)))

            und = und.map_batches(keep_edges,
                                  batch_format="pyarrow").materialize()
        else:
            p = max(1, min(64, n_s // 50 + 1))
            und = und.join(rename_cols(surv, {"v": "lo"}), "left_semi",
                           p, on=("lo",))
            und = und.join(rename_cols(surv, {"v": "hi"}), "left_semi",
                           p, on=("hi",)).materialize()

    if best is None:
        return np.empty(0, np.int64), (0, 0), profile
    e_b, n_b, und_b = best

    def verts_of(tb: pa.Table) -> pa.Table:
        return explode(tb)

    vs = und_b.map_batches(verts_of, batch_format="pyarrow").unique("v")
    return (np.sort(np.asarray(vs, dtype=np.int64)), (e_b, n_b), profile)

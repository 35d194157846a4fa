"""k-core decomposition — iterative peel, pure Ray Data.

No reference implementation (an extra beyond SURVEY.md §2.12's five
algorithms). The k-core of an undirected simple graph is the maximal
subgraph where every vertex has degree >= k; computed by repeatedly
deleting vertices of degree < k until a fixpoint.

Plan per round (all vectorized, one grouped pass + one broadcast
filter — no joins):

1. degrees of the surviving edge set via ``stages.agg.grouped_agg``
   (per-batch combine, bucketed shuffle of (vertex, count) partials);
2. survivors = vertices with degree >= k; broadcast as a sorted id
   array (``ray.put``, ~8 B/vertex — the VERTEX table, not the edge
   table, and it shrinks every round; fine to ~10^8 vertices — past
   that, swap the broadcast for an id-keyed semi-join per round);
3. filter edges to those with BOTH endpoints surviving
   (``pc.is_in`` per batch).

Rounds are O(peeling depth); each round's work is one pass over the
(shrinking) edge set. Termination: the survivor count stops changing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def k_core(edges: "ray.data.Dataset", k: int, *,
           max_rounds: int = 10_000) -> np.ndarray:
    """Sorted vertex ids of the k-core of the undirected simple graph
    underlying ``edges(src, dst)`` (direction ignored, self-loops
    dropped, duplicate edges collapsed)."""
    from ..pipelines.triangles import _canonical_edges
    from ..stages.agg import grouped_agg

    und = _canonical_edges(edges, 8).materialize()

    def explode(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(np.concatenate([lo, hi]), pa.int64())})

    prev_n = -1
    for _ in range(max_rounds):
        deg = grouped_agg(und.map_batches(explode, batch_format="pyarrow"),
                          ["v"], None, "count", out_col="deg")
        surv = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["deg"], pa.scalar(k))),
            batch_format="pyarrow").select_columns(["v"])
        ids = np.sort(np.array([r["v"] for r in surv.take_all()],
                               dtype=np.int64))
        if len(ids) == prev_n:
            return ids
        prev_n = len(ids)
        if len(ids) == 0:
            return ids
        alive = ray.put(pa.array(ids))

        def keep_edges(t: pa.Table, a=alive) -> pa.Table:
            arr = ray.get(a)
            return t.filter(pc.and_(pc.is_in(t["lo"], value_set=arr),
                                    pc.is_in(t["hi"], value_set=arr)))

        und = und.map_batches(keep_edges, batch_format="pyarrow").materialize()
    return ids

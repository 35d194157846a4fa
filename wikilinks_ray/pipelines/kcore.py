"""k-core decomposition — iterative peel, pure Ray Data.

No reference implementation (an extra beyond SURVEY.md §2.12's five
algorithms). The k-core of an undirected simple graph is the maximal
subgraph where every vertex has degree >= k; computed by repeatedly
deleting vertices of degree < k until a fixpoint.

Plan per round (all vectorized):

1. degrees of the surviving edge set via ``stages.agg.grouped_agg``
   (per-batch combine, bucketed shuffle of (vertex, count) partials);
2. survivors = vertices with degree >= k;
3. filter edges to those with BOTH endpoints surviving. Two paths:
   - survivor count <= ``broadcast_max``: broadcast the sorted id
     array once (``ray.put``, ~8 B/vertex) and ``pc.is_in`` per batch
     — one pass, no shuffle;
   - above the threshold: the survivor VERTEX table never touches the
     driver — edges are filtered by two id-keyed ``left_semi`` joins
     (on ``lo`` then ``hi``) against the survivor Dataset, so the
     peel scales to 10^9+ vertices with only a per-round COUNT on the
     driver.

Rounds are O(peeling depth); each round's work is one pass over the
(shrinking) edge set. Termination: the survivor count stops changing
(survivor sets shrink monotonically — edge removal only lowers
degrees — so count equality implies set equality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# Past this many survivors the broadcast id array stops being "small"
# (~80 MB at 10M) and the peel switches to per-round semi-joins.
BROADCAST_MAX_SURVIVORS = 10_000_000


def k_core(edges: "ray.data.Dataset", k: int, *,
           max_rounds: int = 10_000,
           broadcast_max: int = BROADCAST_MAX_SURVIVORS) -> np.ndarray:
    """Sorted vertex ids of the k-core of the undirected simple graph
    underlying ``edges(src, dst)`` (direction ignored, self-loops
    dropped, duplicate edges collapsed).

    ``broadcast_max``: survivor-count threshold above which the edge
    filter runs as distributed semi-joins instead of a driver
    take_all + broadcast (set 0 in tests to force the join path).
    """
    from ..pipelines.triangles import _canonical_edges
    from ..stages.agg import grouped_agg
    from ..stages.util import rename_cols

    und = _canonical_edges(edges, 8).materialize()

    def explode(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(np.concatenate([lo, hi]), pa.int64())})

    surv = None
    prev_n = -1
    for _ in range(max_rounds):
        deg = grouped_agg(und.map_batches(explode, batch_format="pyarrow"),
                          ["v"], None, "count", out_col="deg")
        surv = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["deg"], pa.scalar(k))),
            batch_format="pyarrow").select_columns(["v"]).materialize()
        n = surv.count()
        if n == prev_n or n == 0:
            break
        prev_n = n

        if n <= broadcast_max:
            ids = np.sort(np.array([r["v"] for r in surv.take_all()],
                                   dtype=np.int64))
            alive = ray.put(pa.array(ids))

            def keep_edges(t: pa.Table, a=alive) -> pa.Table:
                arr = ray.get(a)
                return t.filter(pc.and_(pc.is_in(t["lo"], value_set=arr),
                                        pc.is_in(t["hi"], value_set=arr)))

            und = und.map_batches(keep_edges,
                                  batch_format="pyarrow").materialize()
        else:
            # Distributed path: survivors stay a Dataset; edges keep only
            # rows whose lo AND hi appear in it. Partition count stays
            # well below the survivor row count (>=50 rows/partition) —
            # pyarrow's hash join crashes on fully empty partitions (see
            # ops/curate.py) — and caps at 64.
            p = max(1, min(64, n // 50 + 1))
            und = und.join(rename_cols(surv, {"v": "lo"}), "left_semi",
                           p, on=("lo",))
            und = und.join(rename_cols(surv, {"v": "hi"}), "left_semi",
                           p, on=("hi",)).materialize()

    return np.sort(np.array([r["v"] for r in surv.take_all()],
                            dtype=np.int64))

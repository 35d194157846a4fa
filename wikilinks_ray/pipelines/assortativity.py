"""Directed degree assortativity — exact integer moment sums.

No reference implementation (SURVEY.md §2.12 family). The out-in degree
assortativity of a directed graph is the Pearson correlation over edges
(u, v) of x = out_deg(u), y = in_deg(v) (Newman 2002; networkx
``degree_assortativity_coefficient(x="out", y="in")``). The correlation
itself needs a square root, so the DISTRIBUTED op returns the exact
sufficient statistic instead — six int64 sums::

    m, Σxy, Σx, Σy, Σx², Σy²

from which r = (m·Σxy − Σx·Σy) / sqrt((m·Σx²−Σx²)·(m·Σy²−Σy²)) is one
driver-side float expression (:func:`coefficient_from_moments`). Exact
integers keep the whole exchange under the value-hash oracle gate
(``graph_assortativity``) — float Pearson would only allclose.

Plan (combiner-first, no all-to-all beyond the degree counts):

1. degree tables via ``stages/agg.grouped_agg`` (per-batch combine,
   bucketed reduce);
2. under ``degree_broadcast_limit`` vertices: both degree tables ship
   ONCE as dense int64 arrays (8 B/vertex, ``ray.put``) and one
   stateless ``map_batches`` pass gathers + accumulates the six sums
   per batch — per-batch output is ONE row, so the driver collects
   O(blocks) rows; past the gate: two hash joins attach degrees, same
   moment pass after.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _moment_row(x: np.ndarray, y: np.ndarray) -> pa.Table:
    return pa.table({
        "m": pa.array([len(x)], pa.int64()),
        "sxy": pa.array([int((x * y).sum())], pa.int64()),
        "sx": pa.array([int(x.sum())], pa.int64()),
        "sy": pa.array([int(y.sum())], pa.int64()),
        "sx2": pa.array([int((x * x).sum())], pa.int64()),
        "sy2": pa.array([int((y * y).sum())], pa.int64()),
    })


def assortativity_moments(edges: "ray.data.Dataset", *,
                          degree_broadcast_limit: int = 50_000_000,
                          num_buckets: int = 64,
                          num_partitions: int = 8) -> dict[str, int]:
    """Exact out-in assortativity moment sums of ``edges(src, dst)``.

    Returns ``{"m", "sxy", "sx", "sy", "sx2", "sy2"}`` as Python ints.
    Edge multiplicity is respected as given (pass distinct edges for
    simple-graph semantics, matching the SQL oracle / networkx).
    """
    from ..stages.agg import grouped_agg

    outdeg = grouped_agg(edges.select_columns(["src"]), ["src"], None,
                         "count", num_buckets=num_buckets, out_col="d")
    indeg = grouped_agg(edges.select_columns(["dst"]), ["dst"], None,
                        "count", num_buckets=num_buckets, out_col="d")

    odf = outdeg.to_pandas()
    if len(odf) <= degree_broadcast_limit:
        idf = indeg.to_pandas()
        n = int(max(odf["src"].to_numpy().max(initial=-1),
                    idf["dst"].to_numpy().max(initial=-1))) + 1
        out_arr = np.zeros(max(n, 1), dtype=np.int64)
        out_arr[odf["src"].to_numpy()] = odf["d"].to_numpy()
        in_arr = np.zeros(max(n, 1), dtype=np.int64)
        in_arr[idf["dst"].to_numpy()] = idf["d"].to_numpy()
        ref = ray.put((out_arr, in_arr))

        def moments(t: pa.Table) -> pa.Table:
            oa, ia = ray.get(ref)
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            return _moment_row(oa[s], ia[d])

        parts = edges.map_batches(moments, batch_format="pyarrow")
    else:
        from ..stages.util import rename_cols

        ok = rename_cols(outdeg, {"src": "o_v", "d": "x"})
        ik = rename_cols(indeg, {"dst": "i_v", "d": "y"})
        e1 = edges.join(ok, "inner", num_partitions,
                        on=("src",), right_on=("o_v",))
        e2 = e1.join(ik, "inner", num_partitions,
                     on=("dst",), right_on=("i_v",))

        def moments_joined(t: pa.Table) -> pa.Table:
            return _moment_row(
                t.column("x").to_numpy(zero_copy_only=False).astype(np.int64),
                t.column("y").to_numpy(zero_copy_only=False).astype(np.int64))

        parts = e2.map_batches(moments_joined, batch_format="pyarrow")

    df = parts.to_pandas()  # O(blocks) single-row partials
    return {c: int(df[c].sum()) for c in
            ("m", "sxy", "sx", "sy", "sx2", "sy2")}


def coefficient_from_moments(mo: dict[str, int]) -> float:
    """Pearson r from the exact moment sums (float, driver-side)."""
    num = mo["m"] * mo["sxy"] - mo["sx"] * mo["sy"]
    d1 = mo["m"] * mo["sx2"] - mo["sx"] ** 2
    d2 = mo["m"] * mo["sy2"] - mo["sy"] ** 2
    if d1 <= 0 or d2 <= 0:
        return float("nan")
    return num / math.sqrt(d1) / math.sqrt(d2)

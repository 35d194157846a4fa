"""Triangle counting via degree-ordered wedge joins — pure Ray Data.

No reference implementation (SURVEY.md §2.12). Classic distributed
formulation:

1. canonicalize: undirected distinct edges (lo, hi), self-loops dropped
   (``groupby`` dedup — one shuffle);
2. degrees: ``groupby(vertex).count()`` over both endpoints;
3. orient each edge from its lower-(degree, id) endpoint to the higher
   one -> E'(u, v). Every vertex's oriented out-degree is O(sqrt(E)),
   which bounds the wedge blowup — this is the standard skew guard for
   triangle counting (hub vertices never fan out);
4. wedges: for each u, all pairs (v, w) of its oriented neighbors with
   v before w in (degree, id) order — ``groupby(u).map_groups``;
5. close: wedges semi-joined against E' on (v, w); each triangle is
   counted exactly once (at its lowest-(deg,id) apex).

Total: three shuffles + one hash join, no iteration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _canonical_edges(edges: "ray.data.Dataset", num_partitions: int) -> "ray.data.Dataset":
    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table({"lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64())})

    from ..stages.agg import distinct_pairs

    cn = edges.map_batches(canon, batch_format="pyarrow")
    return distinct_pairs(cn, "lo", "hi")


def triangle_count(edges: "ray.data.Dataset", *, num_partitions: int = 8,
                   broadcast_degree_limit: int = 50_000_000) -> int:
    """Exact triangle count of the undirected simple graph underlying
    ``edges(src, dst)``.

    Degree attachment: the degree table is one int per vertex — tiny
    next to the edge table — so up to ``broadcast_degree_limit``
    vertices it is broadcast once (``ray.put`` of a dense array, 8B per
    vertex) and looked up inside the orient pass; beyond that it falls
    back to two hash joins (a degree table that big no longer fits one
    worker)."""
    und = _canonical_edges(edges, num_partitions).materialize()

    def explode(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(np.concatenate([lo, hi]), pa.int64())})

    import ray as _ray

    from ..stages.agg import grouped_agg
    from ..stages.util import rename_cols

    deg = grouped_agg(und.map_batches(explode, batch_format="pyarrow"),
                      ["v"], None, "count", out_col="deg").materialize()

    def orient_cols(lo, hi, ld, hd) -> pa.Table:
        # orient from lower (deg, id) to higher (deg, id)
        lo_first = (ld < hd) | ((ld == hd) & (lo < hi))
        return pa.table({
            "u": pa.array(np.where(lo_first, lo, hi), pa.int64()),
            "v": pa.array(np.where(lo_first, hi, lo), pa.int64()),
            "vdeg": pa.array(np.where(lo_first, hd, ld), pa.int64()),
        })

    if deg.count() <= broadcast_degree_limit:
        ddf = deg.to_pandas()
        dense = np.zeros((int(ddf["v"].max()) + 1) if len(ddf) else 1,
                         dtype=np.int64)
        dense[ddf["v"].to_numpy()] = ddf["deg"].to_numpy()
        deg_ref = _ray.put(dense)

        def orient(t: pa.Table) -> pa.Table:
            lo = t.column("lo").to_numpy(zero_copy_only=False)
            hi = t.column("hi").to_numpy(zero_copy_only=False)
            dd = _ray.get(deg_ref)
            return orient_cols(lo, hi, dd[lo], dd[hi])

        oriented = und.map_batches(orient, batch_format="pyarrow").materialize()
    else:
        e1 = und.join(rename_cols(deg, {"v": "lo_v", "deg": "lo_deg"}),
                      "inner", num_partitions, on=("lo",), right_on=("lo_v",))
        e2 = e1.join(rename_cols(deg, {"v": "hi_v", "deg": "hi_deg"}),
                     "inner", num_partitions, on=("hi",), right_on=("hi_v",))

        def orient_joined(t: pa.Table) -> pa.Table:
            return orient_cols(
                t.column("lo").to_numpy(zero_copy_only=False),
                t.column("hi").to_numpy(zero_copy_only=False),
                t.column("lo_deg").to_numpy(zero_copy_only=False),
                t.column("hi_deg").to_numpy(zero_copy_only=False))

        oriented = e2.map_batches(orient_joined,
                                  batch_format="pyarrow").materialize()

    # wedges via a native hash self-join on the apex u (a per-group
    # map_groups costs a Python call per vertex); the closing edge
    # (a, b) exists in E' iff (adeg, a) < (bdeg, b), which the wedge
    # filter already enforces, so orientation and closure agree.
    w = oriented.join(
        rename_cols(oriented, {"v": "w", "vdeg": "wdeg"}),
        "inner", num_partitions, on=("u",))

    def ordered_wedges(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        vd = t.column("vdeg").to_numpy(zero_copy_only=False)
        ww = t.column("w").to_numpy(zero_copy_only=False)
        wd = t.column("wdeg").to_numpy(zero_copy_only=False)
        keep = (vd < wd) | ((vd == wd) & (v < ww))
        return pa.table({"a": pa.array(v[keep], pa.int64()),
                         "b": pa.array(ww[keep], pa.int64())})

    wed = w.map_batches(ordered_wedges, batch_format="pyarrow")
    closed = wed.join(
        rename_cols(oriented.select_columns(["u", "v"]), {"u": "eu", "v": "ev"}),
        "inner", num_partitions, on=("a", "b"), right_on=("eu", "ev"),
    )
    return closed.count()

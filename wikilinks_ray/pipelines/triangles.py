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
                   broadcast_degree_limit: int = 50_000_000,
                   per_vertex: bool = False):
    """Exact triangle count of the undirected simple graph underlying
    ``edges(src, dst)``.

    With ``per_vertex=True`` returns a Dataset of ``(v, triangles)``
    rows (vertices in >= 1 triangle) instead of the scalar total: each
    closed wedge credits its three corners, accumulated per bucket and
    summed with one small groupby — the basis for local clustering
    coefficients. Same wedge/closure work either way.

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

    deg_is_broadcast = deg.count() <= broadcast_degree_limit
    dense = None
    if deg_is_broadcast:
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

    # Wedges + closure via the hash-bucket plan (same pattern as
    # stages/agg.grouped_agg, which measured ~2.7x faster than the
    # equivalent Dataset.join shuffles): bucket oriented edges by
    # hash(u), generate each apex's ordered neighbor pairs VECTORIZED
    # per bucket, then co-bucket wedges with edges by hash(a, b) and
    # count matches with one C-speed pandas merge per bucket. The
    # closing edge (a, b) exists in E' iff (adeg, a) < (bdeg, b), which
    # the within-run sort order already enforces, so orientation and
    # closure agree.
    from ..stages.agg import _bucket_of

    # more buckets than partitions: wedge work is the dominant compute
    # and parallelizes per bucket (each bucket is one map_groups task)
    n_buckets = max(num_partitions, 32)

    def part_by_u(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array(
            _bucket_of(u.astype(np.int64), num_buckets=n_buckets)))

    from ..stages.agg import sorted_run_pairs

    def _wedge_arrays(g: pd.DataFrame):
        """Vectorized ordered wedges (apex, a, b) for one apex bucket,
        or None when the bucket yields no wedges."""
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        vd = g["vdeg"].to_numpy()
        # sort neighbors by (u, (deg, id)): within an apex run, any
        # (earlier, later) pair is an ordered wedge
        order = np.lexsort((v, vd, u))
        u_s, v_s = u[order], v[order]
        a_idx, b_idx, _ = sorted_run_pairs([u_s])
        if len(a_idx) == 0:
            return None
        return (u_s[a_idx].astype(np.int64), v_s[a_idx].astype(np.int64),
                v_s[b_idx].astype(np.int64))

    # Fast path: when ids fit 32 bits (dense ids hold to 4e9 vertices)
    # and the oriented edge list fits the broadcast budget, pack each
    # edge into one uint64, ray.put the SORTED key array once
    # (plasma-shared per node, ~8 B/edge), and FUSE closure into wedge
    # generation: each apex bucket counts its closed wedges with one
    # searchsorted and emits a single int — the wedge table, by far the
    # biggest intermediate, never materializes anywhere. Beyond the
    # budget: materialized wedges + bucketed merge (second shuffle).
    n_edges = oriented.count()
    max_id = int(dense.shape[0]) if deg_is_broadcast else None
    if (deg_is_broadcast and max_id < (1 << 32)
            and n_edges <= broadcast_degree_limit):
        # pack+sort runs in a Ray task — the driver only ever holds the
        # object ref, never the edge array itself
        @_ray.remote
        def _pack_sorted_keys(*tables: pa.Table) -> np.ndarray:
            # to_arrow_refs takes its zero-copy path on the dataset
            # SCHEMA, so an empty pandas block from an upstream
            # map_groups can arrive unconverted — normalize per block;
            # empty blocks also arrive schema-less (concat would reject)
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

        def wedge_close_count(g: pd.DataFrame) -> pd.DataFrame:
            w = _wedge_arrays(g)
            if w is None:
                return (pd.DataFrame({"v": np.empty(0, np.int64),
                                      "n": np.empty(0, np.int64)})
                        if per_vertex else pd.DataFrame({"n": [0]}))
            apex, a, b = w
            ks = _ray.get(keys_ref)
            packed = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
            idx = np.searchsorted(ks, packed)
            found = (idx < len(ks)) & (ks[np.minimum(idx, len(ks) - 1)] == packed)
            if not per_vertex:
                return pd.DataFrame({"n": [int(found.sum())]})
            # each closed wedge is one triangle on (apex, a, b)
            tv = np.concatenate([apex[found], a[found], b[found]])
            vs, cnt = np.unique(tv, return_counts=True)
            return pd.DataFrame({"v": vs, "n": cnt.astype(np.int64)})

        parts = (oriented.map_batches(part_by_u, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(wedge_close_count, batch_format="pandas"))
        if per_vertex:
            return grouped_agg(parts, ["v"], "n", "sum", out_col="triangles")
        return int(sum(r["n"] for r in parts.take_all()))

    def gen_wedges(g: pd.DataFrame) -> pd.DataFrame:
        w = _wedge_arrays(g)
        if w is None:
            return pd.DataFrame({"apex": np.empty(0, np.int64),
                                 "a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64)})
        return pd.DataFrame({"apex": w[0], "a": w[1], "b": w[2]})

    wed = (oriented.map_batches(part_by_u, batch_format="pyarrow")
           .groupby("__part").map_groups(gen_wedges, batch_format="pandas"))

    def tag(is_edge: int):
        def fn(t: pa.Table) -> pa.Table:
            a = t.column("a" if is_edge == 0 else "u").to_numpy(zero_copy_only=False)
            b = t.column("b" if is_edge == 0 else "v").to_numpy(zero_copy_only=False)
            apex = (t.column("apex").to_numpy(zero_copy_only=False)
                    if is_edge == 0 else np.full(len(a), -1, np.int64))
            return pa.table({
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "apex": pa.array(apex, pa.int64()),
                "__e": pa.array(np.full(len(a), is_edge, np.int8)),
                "__part": pa.array(_bucket_of(a.astype(np.int64),
                                              b.astype(np.int64),
                                              num_buckets=n_buckets)),
            })
        return fn

    both = (wed.map_batches(tag(0), batch_format="pyarrow")
            .union(oriented.select_columns(["u", "v"])
                   .map_batches(tag(1), batch_format="pyarrow")))

    def close_count(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["__e"] == 1][["a", "b"]]
        w = g[g["__e"] == 0]
        if not (len(e) and len(w)):
            m = w.iloc[:0]
        else:
            m = w.merge(e, on=["a", "b"])
        if not per_vertex:
            return pd.DataFrame({"n": [len(m)]})
        tv = np.concatenate([m["apex"].to_numpy(), m["a"].to_numpy(),
                             m["b"].to_numpy()])
        vs, cnt = np.unique(tv, return_counts=True)
        return pd.DataFrame({"v": vs, "n": cnt.astype(np.int64)})

    parts = both.groupby("__part").map_groups(close_count, batch_format="pandas")
    if per_vertex:
        return grouped_agg(parts, ["v"], "n", "sum", out_col="triangles")
    return int(sum(r["n"] for r in parts.take_all()))

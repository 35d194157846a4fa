"""Bucketed vectorized group-aggregation for integer keys.

Ray Data's ``groupby(...).aggregate(...)`` runs a sort-based shuffle
whose per-row cost dominates for fine-grained keys (millions of small
groups): measured ~70k rows/s on (a, b) pair counts. These helpers do
the same aggregation as:

1. per-batch partial combine (lexsort + run-length reduce — the
   map-side combiner),
2. hash-bucket tag ``part = mix(key) % B`` (coarse shuffle key: B
   buckets, not millions of groups),
3. ``groupby(part).map_groups`` with a fully vectorized numpy reduce
   per bucket.

2.7x faster than the built-in aggregate on pair counts at sf0.1, and
the pattern scales: bucket count B is chosen by data volume, and a hot
KEY cannot hot-spot a BUCKET reducer because the per-bucket reduce is
O(rows in bucket) vectorized work regardless of how rows distribute
over keys within it. (For hot-key pressure on a single bucket, raise B
— keys spread uniformly under the multiplicative hash.)

Keys are one or two int64 columns (two-column keys use lexsort, no
packing — full int64 range, unlike a 32-bit shift pack).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(*cols: np.ndarray, num_buckets: int) -> np.ndarray:
    h = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        h = (h ^ c.astype(np.uint64)) * _MIX
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _rle_reduce(keys: list[np.ndarray], vals: np.ndarray, op: str):
    """Sort rows by key tuple, reduce ``vals`` per run. op: sum|min|max|count."""
    order = np.lexsort(tuple(reversed(keys)))
    ks = [k[order] for k in keys]
    v = vals[order]
    n = len(v)
    if n == 0:
        return ks, v
    first = np.zeros(n, dtype=bool)
    first[0] = True
    for k in ks:
        first[1:] |= k[1:] != k[:-1]
    idx = np.flatnonzero(first)
    out_keys = [k[idx] for k in ks]
    if op == "sum" or op == "count":
        out = np.add.reduceat(v, idx)
    elif op == "min":
        out = np.minimum.reduceat(v, idx)
    elif op == "max":
        out = np.maximum.reduceat(v, idx)
    else:
        raise ValueError(op)
    return out_keys, out


def sorted_run_pairs(run_keys: list[np.ndarray], max_run: int | None = None):
    """All ordered within-run index pairs (i < j) of rows grouped into
    runs by equal ``run_keys`` (which must be PRE-SORTED so equal keys
    are contiguous). Returns (a_idx, b_idx, kept_mask) where kept_mask
    marks rows of runs within ``max_run`` (longer runs emit no pairs —
    the standard O(m²) skew guard) and a_idx/b_idx index into the
    ORIGINAL arrays. The shared kernel behind triangle wedges, shingle
    posting-list pairs and MinHash bucket candidates."""
    n = len(run_keys[0])
    if n == 0:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, bool)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in run_keys:
        new[1:] |= k[1:] != k[:-1]
    run_start = np.flatnonzero(new)
    run_id = np.cumsum(new).astype(np.int64) - 1
    run_len = np.diff(np.concatenate((run_start, [n])))
    kept = np.ones(n, dtype=bool)
    if max_run is not None:
        kept = run_len[run_id] <= max_run
        if not kept.all():
            sub = np.flatnonzero(kept)
            a, b, _ = sorted_run_pairs([k[kept] for k in run_keys])
            return sub[a], sub[b], kept
    run_end = (run_start + run_len)[run_id]
    reps = run_end - np.arange(n) - 1
    total = int(reps.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e, kept
    a_idx = np.repeat(np.arange(n), reps)
    block_start = np.repeat(np.cumsum(reps) - reps, reps)
    b_idx = a_idx + 1 + (np.arange(total) - block_start)
    return a_idx, b_idx, kept


def grouped_agg(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    val_col: str | None,
    op: str,
    *,
    num_buckets: int = 64,
    out_col: str = "agg",
    salt: int = 1,
) -> "ray.data.Dataset":
    """groupby(key_cols).op(val_col) with the bucketed vectorized plan.

    ``op='count'`` ignores ``val_col``. Output: key_cols + out_col.

    ``salt > 1`` enables two-stage salted aggregation for hot keys: the
    first stage aggregates on ``(key, salt)`` where the salt spreads a
    single key's rows across ``salt`` sub-groups (and therefore across
    reducers), and a second, much smaller pass merges the per-salt
    partials. sum/count/min compose exactly. Use when one key can
    receive a significant fraction of ALL rows (e.g. in-degree counts of
    a hub vertex) — the per-batch combiner already collapses duplicates
    within a batch, so salting only matters when a key's post-combine
    partials still swamp one reducer.
    """
    kc = list(key_cols)
    if salt > 1:
        def add_salt(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__salt", pa.array(np.arange(t.num_rows, dtype=np.int64)
                                   % salt))

        stage1 = grouped_agg(
            ds.map_batches(add_salt, batch_format="pyarrow"),
            kc + ["__salt"], val_col, op,
            num_buckets=num_buckets, out_col=out_col)
        merge_op = "sum" if op == "count" else op
        return grouped_agg(stage1, kc, out_col, merge_op,
                           num_buckets=num_buckets, out_col=out_col)

    def partial(t: pa.Table) -> pa.Table:
        keys = [t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
                for c in kc]
        if op == "count":
            vals = np.ones(len(keys[0]), dtype=np.int64)
            red = "sum"
        else:
            vals = t.column(val_col).to_numpy(zero_copy_only=False)
            vals = vals.astype(np.float64 if np.issubdtype(vals.dtype, np.floating)
                               else np.int64)
            red = op
        out_keys, out_vals = _rle_reduce(keys, vals, red)
        cols = {c: pa.array(k, pa.int64()) for c, k in zip(kc, out_keys)}
        cols[out_col] = pa.array(out_vals)
        cols["__part"] = pa.array(
            _bucket_of(*out_keys, num_buckets=num_buckets) if len(out_vals)
            else np.empty(0, np.int64))
        return pa.table(cols)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        keys = [g[c].to_numpy() for c in kc]
        vals = g[out_col].to_numpy()
        red = "sum" if op == "count" else op
        out_keys, out_vals = _rle_reduce(keys, vals, red)
        out = {c: k for c, k in zip(kc, out_keys)}
        out[out_col] = out_vals
        return pd.DataFrame(out)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(final, batch_format="pandas"))


def distinct_pairs(ds: "ray.data.Dataset", a_col: str, b_col: str,
                   *, num_buckets: int = 64) -> "ray.data.Dataset":
    """Distinct (a, b) rows (exact, int64 keys)."""
    return grouped_agg(ds, [a_col, b_col], None, "count",
                       num_buckets=num_buckets,
                       out_col="__n").drop_columns(["__n"])


def grouped_distinct_count(ds: "ray.data.Dataset", key_col: str, val_col: str,
                           *, num_buckets: int = 64,
                           out_col: str = "n_distinct") -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT val) GROUP BY key — the classic
    shuffle-heavy aggregate, as two composed bucketed passes:

    1. dedup (key, val) pairs (per-batch combine collapses local
       duplicates BEFORE the shuffle — the whole point: raw rows never
       move, only distinct pairs do);
    2. count pairs per key.

    Both passes hash-bucket on their keys, so a hot key's pairs spread
    across bucket reducers by val in pass 1 and only its (already
    distinct) pair rows reach pass 2."""
    pairs = distinct_pairs(ds.select_columns([key_col, val_col]),
                           key_col, val_col, num_buckets=num_buckets)
    return grouped_agg(pairs, [key_col], None, "count",
                       num_buckets=num_buckets, out_col=out_col)


def grouped_quantile(ds: "ray.data.Dataset", key_col: str, val_col: str,
                     qs: list[float], *, num_buckets: int = 64,
                     ) -> "ray.data.Dataset":
    """EXACT per-group quantiles of an integer-valued column,
    percentile_disc convention (1-based position ``ceil(q*n)`` of the
    sorted multiset — verified to match DuckDB's ``quantile_disc``).

    Plan: combine raw rows to (key, val, count) first (``grouped_agg``
    count — only DISTINCT pairs shuffle, the natural compression for
    value-histogram quantiles over bounded-domain ints), then one
    bucketed pass computes every requested quantile per key from the
    run-length cumulative counts, fully vectorized. Output:
    (key, q_<percent> ...) one column per requested quantile.
    """
    pairs = grouped_agg(ds.select_columns([key_col, val_col]),
                        [key_col, val_col], None, "count", out_col="__cnt",
                        num_buckets=num_buckets)

    def part_by_key(t: pa.Table) -> pa.Table:
        kk = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__part", pa.array(
            _bucket_of(kk, num_buckets=num_buckets)))

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy().astype(np.int64)
        v = g[val_col].to_numpy().astype(np.int64)
        c = g["__cnt"].to_numpy().astype(np.int64)
        order = np.lexsort((v, k))
        k_s, v_s, c_s = k[order], v[order], c[order]
        n = len(k_s)
        new = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        run_start = np.flatnonzero(new)
        run_id = np.cumsum(new).astype(np.int64) - 1
        cum = np.cumsum(c_s)
        base = (cum[run_start] - c_s[run_start])[run_id]
        cum_in = cum - base  # within-run cumulative multiset position
        tot = np.add.reduceat(c_s, run_start)  # per-run multiset size
        out = {key_col: k_s[run_start]}
        for q in qs:
            # eps guards float noise on exact multiples (q*n == int)
            target = np.ceil(q * tot - 1e-9).astype(np.int64)[run_id]
            # first satisfying row per run: cum_in >= target AND the
            # previous row of the same run didn't satisfy (satisfaction
            # is monotone within a run, so exactly one row picks)
            ok = cum_in >= target
            prev_ok = np.concatenate(([False], ok[:-1])) & ~new
            pick = ok & ~prev_ok
            out[f"q_{int(round(q * 100))}"] = v_s[pick]
        return pd.DataFrame(out)

    return (pairs.map_batches(part_by_key, batch_format="pyarrow")
            .groupby("__part").map_groups(quantiles, batch_format="pandas"))


def grouped_topk(ds: "ray.data.Dataset", key_col: str, val_col: str, k: int,
                 *, tie_col: str, num_buckets: int = 64,
                 ascending: bool = False) -> "ray.data.Dataset":
    """Per-group top-k rows by (val desc|asc, tie asc) — the classic
    windowed ``row_number() <= k``, without a global sort.

    ``tie_col`` (int64, unique per (key, val) in practice) makes the
    result deterministic and therefore oracle-comparable.

    Plan: per-BATCH local top-k per key (vectorized lexsort + run-length
    head, so at most batches×k rows per key survive the shuffle — the
    combiner property), then one bucketed groupby(key-hash) where each
    bucket re-ranks its keys the same way. Output: (key, val, tie,
    rank 1..k).
    """
    sign = 1 if ascending else -1

    def _rank_arrays(keys, vals, ties):
        order = np.lexsort((ties, sign * vals, keys))
        k_s, v_s, t_s = keys[order], vals[order], ties[order]
        n = len(k_s)
        if n == 0:
            return k_s, v_s, t_s, np.empty(0, np.int64)
        new = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        run_start = np.flatnonzero(new)
        pos = np.arange(n) - run_start[np.cumsum(new) - 1]
        return k_s, v_s, t_s, pos

    def local_topk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t.column(val_col).to_numpy(zero_copy_only=False)
        ties = t.column(tie_col).to_numpy(zero_copy_only=False).astype(np.int64)
        k_s, v_s, t_s, pos = _rank_arrays(keys, vals, ties)
        keep = pos < k
        k_s, v_s, t_s = k_s[keep], v_s[keep], t_s[keep]
        return pa.table({
            key_col: pa.array(k_s, pa.int64()),
            val_col: pa.array(v_s),
            tie_col: pa.array(t_s, pa.int64()),
            "__part": pa.array(_bucket_of(k_s, num_buckets=num_buckets)
                               if len(k_s) else np.empty(0, np.int64)),
        })

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        k_s, v_s, t_s, pos = _rank_arrays(
            g[key_col].to_numpy().astype(np.int64),
            g[val_col].to_numpy(),
            g[tie_col].to_numpy().astype(np.int64))
        keep = pos < k
        return pd.DataFrame({key_col: k_s[keep], val_col: v_s[keep],
                             tie_col: t_s[keep],
                             "rank": pos[keep] + 1})

    return (ds.select_columns([key_col, val_col, tie_col])
            .map_batches(local_topk, batch_format="pyarrow")
            .groupby("__part").map_groups(final_topk, batch_format="pandas"))


# --- HyperLogLog approx distinct (frozen integer semantics) -----------
#
# 64 registers (p=6), md5-derived hashes (same little-endian first-8-
# bytes convention as every other oracle twin here: DuckDB's
# md5_number_upper). The geometric tail uses the LOW 32 bits only so
# floor(log2(x)) is exact in float64 on both engines (at 52+ bits,
# log2(2^k - 1) rounds UP to k and the floor flips; at <= 32 bits the
# nearest integer gap is ~1e-10 vs ~1e-15 ulp). The estimator is the
# standard alpha_m * m^2 / Z with linear counting below 2.5m, all in
# scaled-integer arithmetic with FROZEN constants, so the distributed
# register max-merge is value-hash reproducible in SQL.
HLL_P = 6
HLL_M = 1 << HLL_P           # 64 registers
HLL_K = 34                   # Z scale: 2^(K - reg), reg in [0, 33]
HLL_ALPHA_NUM = 70934        # round(0.7213 / (1 + 1.079/64) * 1e5)
HLL_ALPHA_DEN = 100000
HLL_LC_SHIFT = 20            # LC[v] = round(ln(64/v) * 2^20), v = 1..64
HLL_LC = (4360905, 3634087, 3208927, 2907270, 2673287, 2482109, 2320470,
          2180452, 2056948, 1946470, 1846530, 1755292, 1671361, 1593653,
          1521309, 1453635, 1390065, 1330131, 1273437, 1219652, 1168492,
          1119712, 1073101, 1028474, 985669, 944543, 904970, 866835,
          830039, 794491, 760108, 726817, 694551, 663248, 632852, 603313,
          574583, 546619, 519382, 492835, 466942, 441674, 417001, 392895,
          369330, 346284, 323733, 301657, 280036, 258852, 238087, 217726,
          197752, 178152, 158912, 140018, 121458, 103222, 85297, 67674,
          50341, 33291, 16513, 0)


def hll_estimate(z: int, v_zero: int) -> int:
    """Frozen integer HLL estimator from Z = sum(2^(K-reg)) and the
    zero-register count. Python ints: the raw numerator is ~5e18."""
    raw = (HLL_ALPHA_NUM * HLL_M * HLL_M << HLL_K) // (HLL_ALPHA_DEN * z)
    if v_zero > 0 and raw <= (5 * HLL_M) // 2:
        return (HLL_M * HLL_LC[v_zero - 1]) >> HLL_LC_SHIFT
    return raw


def grouped_approx_distinct(ds: "ray.data.Dataset", key_col: str,
                            val_col: str, *, num_buckets: int = 64,
                            out_col: str = "approx_distinct"
                            ) -> "ray.data.Dataset":
    """APPROXIMATE COUNT(DISTINCT val) GROUP BY key via per-group
    HyperLogLog sketches — the scale path where the exact
    :func:`grouped_distinct_count` would shuffle one row per distinct
    pair: here the shuffle carries at most 64 register rows per group
    REGARDLESS of cardinality, and the register merge (elementwise max)
    is a perfect combiner, so a trillion-row group costs the same
    exchange as a thousand-row one.

    Deterministic by construction (md5 hashes, frozen integer
    estimator), hence value-hash oracle-able; expected error is the
    standard ~1.04/sqrt(64) ~ 13% (use the exact op when that
    matters)."""
    import hashlib

    def sketch(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vals = t.column(val_col).to_pylist()
        hs = np.fromiter(
            (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8],
                            "little") for v in vals),
            dtype=np.uint64, count=len(vals))
        bucket = (hs >> np.uint64(64 - HLL_P)).astype(np.int64)
        rem = hs & np.uint64(0xFFFFFFFF)
        rho = np.where(
            rem == 0, 33,
            32 - np.floor(np.log2(np.maximum(rem, 1)
                                  .astype(np.float64))).astype(np.int64))
        # per-batch combine: max rho per (key, bucket) before the shuffle
        out_keys, r_s = _rle_reduce([keys, bucket], rho.astype(np.int64),
                                    "max")
        return pa.table({key_col: pa.array(out_keys[0], pa.int64()),
                         "__bucket": pa.array(out_keys[1], pa.int64()),
                         "__rho": pa.array(r_s, pa.int64())})

    regs = grouped_agg(ds.select_columns([key_col, val_col])
                       .map_batches(sketch, batch_format="pyarrow"),
                       [key_col, "__bucket"], "__rho", "max",
                       num_buckets=num_buckets, out_col="__reg")

    def part_by_key(t: pa.Table) -> pa.Table:
        kk = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.append_column("__part", pa.array(
            _bucket_of(kk, num_buckets=num_buckets)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy().astype(np.int64)
        r = g["__reg"].to_numpy().astype(np.int64)
        order = np.argsort(k, kind="stable")
        k_s, r_s = k[order], r[order]
        new = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(k_s)))
        pow_terms = np.int64(1) << (HLL_K - r_s)
        z_present = np.add.reduceat(pow_terms, starts)
        v_zero = HLL_M - lens
        z = z_present + v_zero.astype(np.int64) * (np.int64(1) << HLL_K)
        est = np.fromiter(
            (hll_estimate(int(zz), int(vv)) for zz, vv in zip(z, v_zero)),
            dtype=np.int64, count=len(z))
        return pd.DataFrame({key_col: k_s[starts], out_col: est})

    return (regs.map_batches(part_by_key, batch_format="pyarrow")
            .groupby("__part").map_groups(fold, batch_format="pandas"))

"""Bucketed vectorized aggregation tests, incl. salted two-stage mode
on a pathologically skewed key distribution."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def make_skewed(ray_session, n=200_000, hot_frac=0.6, seed=3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    hot = int(n * hot_frac)
    keys = np.concatenate([np.zeros(hot, np.int64),  # one hub key
                           rng.integers(1, 5000, n - hot)])
    vals = rng.integers(0, 100, n)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    return rd.from_arrow(t).repartition(16), keys, vals


@pytest.mark.parametrize("op", ["count", "sum", "min"])
def test_grouped_agg_matches_pandas(ray_session, op):
    from wikilinks_ray.stages.agg import grouped_agg

    ds, keys, vals = make_skewed(ray_session, n=50_000)
    import pandas as pd

    df = pd.DataFrame({"k": keys, "v": vals})
    if op == "count":
        want = df.groupby("k").size()
    elif op == "sum":
        want = df.groupby("k")["v"].sum()
    else:
        want = df.groupby("k")["v"].min()
    got = grouped_agg(ds, ["k"], "v", op, out_col="r").to_pandas()
    got = got.set_index("k")["r"].sort_index()
    assert (got == want.sort_index()).all()


@pytest.mark.parametrize("op", ["count", "sum", "min"])
def test_salted_equals_unsalted_on_hub_key(ray_session, op):
    from wikilinks_ray.stages.agg import grouped_agg

    ds, _keys, _vals = make_skewed(ray_session, n=100_000, hot_frac=0.7)
    plain = grouped_agg(ds, ["k"], "v", op, out_col="r").to_pandas()
    salted = grouped_agg(ds, ["k"], "v", op, out_col="r", salt=8).to_pandas()
    p = plain.set_index("k")["r"].sort_index()
    s = salted.set_index("k")["r"].sort_index()
    assert (p == s).all()


def test_distinct_pairs(ray_session):
    import ray.data as rd

    from wikilinks_ray.stages.agg import distinct_pairs

    t = pa.table({"a": pa.array([1, 1, 2, 2, 1], pa.int64()),
                  "b": pa.array([2, 2, 3, 3, 3], pa.int64())})
    got = {(r["a"], r["b"]) for r in distinct_pairs(rd.from_arrow(t), "a", "b").take_all()}
    assert got == {(1, 2), (2, 3), (1, 3)}


def test_grouped_distinct_count(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from wikilinks_ray.stages.agg import grouped_distinct_count

    rng = np.random.default_rng(3)
    key = rng.integers(0, 20, 5000)
    val = rng.integers(0, 50, 5000)
    ds = rd.from_arrow(pa.table({"k": pa.array(key, pa.int64()),
                                 "v": pa.array(val, pa.int64())})).repartition(6)
    got = pd.DataFrame(grouped_distinct_count(ds, "k", "v").take_all())
    want = pd.DataFrame({"k": key, "v": val}).groupby("k")["v"].nunique()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == sorted(want.index.tolist())
    assert got["n_distinct"].tolist() == [want[k] for k in got["k"]]


def test_grouped_topk(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from wikilinks_ray.stages.agg import grouped_topk

    rng = np.random.default_rng(4)
    n = 4000
    key = rng.integers(0, 15, n)
    val = rng.integers(0, 30, n)  # plenty of ties -> tie_col decides
    tie = rng.permutation(n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(key, pa.int64()),
                                 "v": pa.array(val, pa.int64()),
                                 "t": pa.array(tie, pa.int64())})).repartition(5)
    got = pd.DataFrame(grouped_topk(ds, "k", "v", 4, tie_col="t").take_all())
    df = pd.DataFrame({"k": key, "v": val, "t": tie})
    df = df.sort_values(["k", "v", "t"], ascending=[True, False, True])
    df["rank"] = df.groupby("k").cumcount() + 1
    want = df[df["rank"] <= 4].reset_index(drop=True)
    got = got.sort_values(["k", "rank"]).reset_index(drop=True)
    assert got[["k", "v", "t", "rank"]].astype("int64").values.tolist() == \
        want[["k", "v", "t", "rank"]].astype("int64").values.tolist()


def test_grouped_quantile_percentile_disc(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from wikilinks_ray.stages.agg import grouped_quantile

    rng = np.random.default_rng(9)
    key = rng.integers(0, 12, 3000)
    val = rng.integers(0, 40, 3000)
    ds = rd.from_arrow(pa.table({"k": pa.array(key, pa.int64()),
                                 "v": pa.array(val, pa.int64())})).repartition(5)
    got = pd.DataFrame(grouped_quantile(ds, "k", "v",
                                        [0.1, 0.5, 1.0]).take_all())
    got = got.sort_values("k").reset_index(drop=True)
    import math

    df = pd.DataFrame({"k": key, "v": val})
    for _, row in got.iterrows():
        s = sorted(df[df["k"] == row["k"]]["v"])
        for q, col in ((0.1, "q_10"), (0.5, "q_50"), (1.0, "q_100")):
            assert row[col] == s[math.ceil(q * len(s)) - 1], (row["k"], q)


def test_sorted_run_pairs_kernel():
    import numpy as np

    from wikilinks_ray.stages.agg import sorted_run_pairs

    keys = np.array([1, 1, 1, 2, 3, 3], dtype=np.int64)
    a, b, kept = sorted_run_pairs([keys])
    got = sorted(zip(a.tolist(), b.tolist()))
    assert got == [(0, 1), (0, 2), (1, 2), (4, 5)]
    assert kept.all()
    # cap drops whole long runs but keeps short ones
    a, b, kept = sorted_run_pairs([keys], max_run=2)
    assert sorted(zip(a.tolist(), b.tolist())) == [(4, 5)]
    assert kept.tolist() == [False, False, False, True, True, True]
    # empty input
    a, b, kept = sorted_run_pairs([np.empty(0, np.int64)])
    assert len(a) == len(b) == len(kept) == 0
    # two-column runs
    k2 = np.array([0, 0, 0, 1], dtype=np.int64)
    v2 = np.array([5, 5, 6, 6], dtype=np.int64)
    a, b, _ = sorted_run_pairs([k2, v2])
    assert sorted(zip(a.tolist(), b.tolist())) == [(0, 1)]


def test_grouped_approx_distinct_accuracy_and_merge(ray_session):
    """HLL estimates land within the standard error envelope of the
    exact counts, and the register max-merge is partition-invariant
    (same answer whatever block layout the rows arrive in)."""
    import pyarrow as pa
    import ray.data as rd

    from wikilinks_ray.stages.agg import (grouped_approx_distinct,
                                          grouped_distinct_count)

    rng = np.random.default_rng(5)
    # three groups with very different cardinalities
    keys, vals = [], []
    for k, n_distinct, n_rows in ((1, 40, 400), (2, 800, 2400),
                                  (3, 5000, 9000)):
        keys.append(np.full(n_rows, k))
        vals.append(rng.integers(0, n_distinct, n_rows) + k * 10**6)
    t = pa.table({"k": pa.array(np.concatenate(keys), pa.int64()),
                  "v": pa.array(np.concatenate(vals), pa.int64())})

    ds1 = rd.from_arrow(t)
    got = (grouped_approx_distinct(ds1, "k", "v").to_pandas()
           .set_index("k")["approx_distinct"])
    exact = (grouped_distinct_count(ds1, "k", "v").to_pandas()
             .set_index("k")["n_distinct"])
    for k in (1, 2, 3):
        # 64 registers => sigma ~ 13%; allow 3.5 sigma plus LC floor
        assert abs(got[k] - exact[k]) <= max(0.45 * exact[k], 8), \
            (k, got[k], exact[k])

    # partition invariance: 16-way split must merge to identical ints
    ds16 = rd.from_arrow(t).repartition(16)
    got16 = (grouped_approx_distinct(ds16, "k", "v").to_pandas()
             .set_index("k")["approx_distinct"])
    assert (got16.sort_index() == got.sort_index()).all()

"""zscore_outliers (ops/anomaly.py): brute-force integer reference and
broadcast-vs-join path parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _events_ds(rows):
    import ray.data as rd

    return rd.from_items([{"event_id": i, "user_id": u, "value": v}
                          for i, (u, v) in enumerate(rows)])


def _brute(rows, min_events=5, t=3):
    cents = [int(np.floor(v * 100 + 0.5)) for _, v in rows]
    users = [u for u, _ in rows]
    out = []
    for i, (u, x) in enumerate(zip(users, cents)):
        xs = [c for uu, c in zip(users, cents) if uu == u]
        n, s, s2 = len(xs), sum(xs), sum(c * c for c in xs)
        if n >= min_events and (n * x - s) ** 2 > t * t * (n * s2 - s * s):
            out.append((i, u, x))
    return out


@pytest.fixture(scope="module")
def rows():
    rng = np.random.default_rng(7)
    rows = []
    for u in range(12):
        k = int(rng.integers(2, 40))
        vals = rng.uniform(1, 50, size=k)
        # plant a spike so 3-sigma actually fires for most users
        if k >= 6:
            vals[0] = 900.0 + u
        rows += [(u, float(round(v, 2))) for v in vals]
    rng.shuffle(rows)
    return rows


def test_outliers_match_brute_force(ray_session, rows):
    from wikilinks_ray.ops.anomaly import zscore_outliers

    got = zscore_outliers(_events_ds(rows))
    want = _brute(rows)
    assert list(map(tuple, got.to_numpy().tolist())) == want
    assert len(want) > 0  # the planted spikes must actually flag


def test_join_fallback_matches_broadcast(ray_session, rows):
    from wikilinks_ray.ops.anomaly import zscore_outliers

    a = zscore_outliers(_events_ds(rows))
    b = zscore_outliers(_events_ds(rows), user_broadcast_limit=0,
                        num_partitions=2)
    pd.testing.assert_frame_equal(a, b)


def test_min_events_gate(ray_session):
    from wikilinks_ray.ops.anomaly import zscore_outliers

    # 4 events with a wild spike: below min_events=5, nothing flags
    rows = [(1, 1.0), (1, 1.0), (1, 1.0), (1, 500.0)]
    got = zscore_outliers(_events_ds(rows), min_events=5)
    assert got.empty

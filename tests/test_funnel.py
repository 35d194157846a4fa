"""Funnel sequence matching (ops/funnel.py) — greedy strictly-ordered
subsequence semantics pinned by hand-built event streams."""

from __future__ import annotations

import pandas as pd
import pytest

from wikilinks_ray.ops.funnel import funnel_counts, funnel_stages

STAGES = ["view", "click", "purchase"]


def _run(events, **kw):
    import ray.data as rd

    ds = rd.from_items([
        {"user_id": u, "event_id": i, "event_type": t}
        for i, (u, t) in enumerate(events)])
    df = funnel_stages(ds, STAGES, **kw).to_pandas()
    return {int(r.user_id): (int(r.stage), int(r.last_event_id))
            for r in df.itertuples()}


def test_full_and_partial_and_absent(ray_session):
    events = [
        (1, "view"), (1, "click"), (1, "purchase"),   # ids 0,1,2: full
        (2, "view"), (2, "purchase"),                  # 3,4: no click -> 1
        (3, "error"),                                  # 5: present, stage 0
        (4, "click"), (4, "purchase"),                 # 6,7: no view -> 0
    ]
    out = _run(events)
    assert out == {1: (3, 2), 2: (1, 3), 3: (0, -1), 4: (0, -1)}


def test_order_is_strict_and_greedy(ray_session):
    # click BEFORE the first view doesn't count; the SECOND click (after
    # the view) does. Greedy takes the EARLIEST admissible event: the
    # view at id 1 (not id 3), so the click at 2 is admissible.
    events = [
        (7, "click"),             # 0: too early
        (7, "view"),              # 1: stage-1 match
        (7, "click"),             # 2: stage-2 match
        (7, "view"),              # 3: ignored (greedy already matched)
        (7, "purchase"),          # 4: stage-3 match
    ]
    assert _run(events) == {7: (3, 4)}


def test_greedy_is_optimal_not_trapped(ray_session):
    # earliest view (0) then click (1) then purchase (2) — a later view
    # with no following click must not distract the match
    events = [(5, "view"), (5, "click"), (5, "purchase"), (5, "view")]
    assert _run(events) == {5: (3, 2)}


def test_funnel_counts(ray_session):
    events = [
        (1, "view"), (1, "click"), (1, "purchase"),
        (2, "view"), (2, "click"),
        (3, "view"),
        (4, "error"),
    ]
    import ray.data as rd

    ds = rd.from_items([
        {"user_id": u, "event_id": i, "event_type": t}
        for i, (u, t) in enumerate(events)])
    fc = funnel_counts(funnel_stages(ds, STAGES), len(STAGES))
    want = pd.DataFrame({
        "stage": [0, 1, 2, 3],
        "users_at": [1, 1, 1, 1],
        "users_reached": [4, 3, 2, 1],
    })
    pd.testing.assert_frame_equal(fc, want)


def test_empty_stage_list_rejected(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"user_id": 1, "event_id": 0, "event_type": "x"}])
    with pytest.raises(ValueError):
        funnel_stages(ds, [])


def test_partition_and_order_invariance(ray_session):
    """Same stream under different bucket counts AND a permuted row
    order must match: matching depends only on (user, event_id)."""
    import random

    import ray.data as rd

    rng = random.Random(7)
    events = []
    for i in range(300):
        events.append({"user_id": rng.randrange(20), "event_id": i,
                       "event_type": rng.choice(
                           ["view", "click", "purchase", "error"])})
    shuffled = events[:]
    rng.shuffle(shuffled)

    def run(rows, **kw):
        df = funnel_stages(rd.from_items(rows), STAGES, **kw).to_pandas()
        return df.sort_values("user_id").reset_index(drop=True)

    base = run(events)
    pd.testing.assert_frame_equal(run(shuffled), base)
    pd.testing.assert_frame_equal(run(events, num_buckets=2), base)

"""Retention cohorts (ops/retention.py): hand-built stream semantics +
broadcast/join path identity."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from wikilinks_ray.ops.retention import US_PER_DAY, retention_cohorts

EPOCH = dt.datetime(1970, 1, 1)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return EPOCH + dt.timedelta(days=day, hours=hour)


@pytest.fixture(scope="module")
def stream(ray_session):
    import ray.data as rd

    # user 1: days 10, 11, 13 (two events day 10 -> dedup)
    # user 2: day 10 only
    # user 3: days 11, 12
    rows = [
        (1, _ts(10, 1)), (1, _ts(10, 23)), (1, _ts(11)), (1, _ts(13)),
        (2, _ts(10, 5)),
        (3, _ts(11, 2)), (3, _ts(12, 2)),
    ]
    return rd.from_items([{"user_id": u, "ts": t} for u, t in rows])


EXPECT = pd.DataFrame({
    "cohort_day": [10, 10, 10, 11, 11],
    "day_offset": [0, 1, 3, 0, 1],
    "n_users": [2, 1, 1, 1, 1],
})


def _run(ds, **kw):
    df = retention_cohorts(ds, **kw).to_pandas()
    return (df.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True).astype("int64"))


def test_cohort_matrix(stream):
    pd.testing.assert_frame_equal(_run(stream), EXPECT.astype("int64"))


def test_join_fallback_identical(stream):
    pd.testing.assert_frame_equal(
        _run(stream, user_broadcast_limit=0, num_partitions=2),
        EXPECT.astype("int64"))


def test_day_floor_is_integer_us():
    # 23:59:59.999999 is still the same day; midnight rolls over
    assert (US_PER_DAY - 1) // US_PER_DAY == 0
    assert US_PER_DAY // US_PER_DAY == 1

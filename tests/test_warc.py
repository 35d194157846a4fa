"""WARC source/sink (sources/warc.py): lossless round-trip, framing
parser edge cases, deterministic sharding."""

from __future__ import annotations

import pandas as pd
import pytest

from wikilinks_ray.sources.warc import (
    _record,
    iter_warc_records,
    read_warc,
    write_warc_corpus,
)


class TestFraming:
    def test_single_record(self):
        blob = _record("https://x/a", 1_700_000_000_123_456, b"<html>hi</html>")
        recs = list(iter_warc_records(blob))
        assert len(recs) == 1
        h, body = recs[0]
        assert h["WARC-Type"] == "response"
        assert h["WARC-Target-URI"] == "https://x/a"
        assert body.endswith(b"<html>hi</html>")

    def test_concatenated_records_with_binary_body(self):
        # a body containing CRLF CRLF must not break framing
        tricky = b"a\r\n\r\nb" * 3
        blob = _record("u1", 0, tricky) + _record("u2", 1, b"z")
        recs = list(iter_warc_records(blob))
        assert [h["WARC-Target-URI"] for h, _ in recs] == ["u1", "u2"]
        assert recs[0][1].endswith(tricky)

    def test_malformed_header_raises(self):
        with pytest.raises(ValueError):
            list(iter_warc_records(b"NOT-WARC\r\nX: y\r\n\r\nbody"))


@pytest.fixture(scope="module")
def warc_roundtrip(ray_session, small_corpus, tmp_path_factory):
    import ray.data as rd

    table, _spec, _res = small_corpus
    pages = rd.from_arrow(table)
    out = str(tmp_path_factory.mktemp("warc") / "shards")
    paths = write_warc_corpus(pages, out, n_shards=4)
    return table, paths


def test_round_trip_lossless(warc_roundtrip):
    table, paths = warc_roundtrip
    back = read_warc(paths).to_pandas().sort_values("url").reset_index(drop=True)
    orig = (table.select(["url", "warc_ts", "html"]).to_pandas()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(back[["url", "warc_ts", "html"]], orig)


def test_sharding_deterministic(warc_roundtrip, tmp_path):
    import ray.data as rd

    table, paths = warc_roundtrip
    pages = rd.from_arrow(table)
    out2 = str(tmp_path / "again")
    paths2 = write_warc_corpus(pages, out2, n_shards=4)
    for a, b in zip(paths, paths2):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read()

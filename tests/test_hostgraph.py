"""Host-graph tests: URL parsing totality/edge cases and contraction
weights vs a pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from wikilinks_ray.pipelines.hostgraph import (URL_RE, contract_edges,
                                               parse_url_batch)


def test_parse_url_batch_cases():
    urls = [
        "https://en.example.org/wiki/Foo_Bar",
        "http://a.b.c/x/y/z?q=1#frag",
        "ftp://files.example.com/",
        "https://bare.host",          # no path
        "not a url at all",            # no match
        "",                            # empty
        "scheme+v1.2://h-y.phen/p",    # scheme charset, host hyphen
    ]
    t = parse_url_batch(pa.table({"url": pa.array(urls, pa.string())}))
    df = t.to_pandas()
    assert list(df["host"]) == ["en.example.org", "a.b.c",
                                "files.example.com", "bare.host", "", "",
                                "h-y.phen"]
    assert list(df["scheme"]) == ["https", "http", "ftp", "https", "", "",
                                  "scheme+v1.2"]
    # path stops at ? and #
    assert list(df["path"]) == ["/wiki/Foo_Bar", "/x/y/z", "/", "", "", "",
                                "/p"]
    assert list(df["path_depth"]) == [2, 3, 1, 0, 0, 0, 1]


def test_url_re_is_re2_compatible():
    """The oracle runs this pattern through DuckDB's RE2: no
    backreferences or lookaround may appear."""
    assert "(?=" not in URL_RE.pattern and "(?!" not in URL_RE.pattern
    assert "\\1" not in URL_RE.pattern


def test_contract_edges_weights_and_self_loops(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    src = rng.integers(0, 200, 2000)
    dst = rng.integers(0, 200, 2000)
    ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                 "dst": pa.array(dst, pa.int64())}))

    got = contract_edges(ds, lambda v: v % 7).to_pandas()
    want = (pd.DataFrame({"src_h": src % 7, "dst_h": dst % 7})
            .groupby(["src_h", "dst_h"]).size().reset_index(name="weight"))
    m = got.sort_values(["src_h", "dst_h"]).reset_index(drop=True)
    w = want.sort_values(["src_h", "dst_h"]).reset_index(drop=True)
    assert (m["weight"].to_numpy() == w["weight"].to_numpy()).all()
    assert m["weight"].sum() == len(src)
    # intra-host rows present by default...
    assert (m["src_h"] == m["dst_h"]).any()

    # ...and dropped on request, leaving only the cross-host mass
    no_loops = contract_edges(ds, lambda v: v % 7,
                              drop_self_loops=True).to_pandas()
    assert not (no_loops["src_h"] == no_loops["dst_h"]).any()
    assert no_loops["weight"].sum() == int((src % 7 != dst % 7).sum())

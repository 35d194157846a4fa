"""Driver-contract tests: queries()/oracle_sql() wiring + a fast subset
of oracle comparisons at sf0.001 (the full matrix runs via
tools/check_correctness.py at sf0.01)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_oracle_keys_subset_of_queries(entry_mod):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20
    # SQL-expressible coverage: at least 3/4 of queries have oracles
    assert len(os_) / len(qs) >= 0.7


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", [
    "graph_out_degree", "graph_bfs", "pricing_summary", "dedup_exact",
    "events_windowed", "text_token_counts", "events_gaps",
    "supplier_top_orders", "supplier_qty_quantiles", "nation_revenue",
    "wiki_template_links", "sample_mix", "pack_sequences",
])
def test_fast_queries_match_oracle(entry_mod, con, name):
    import pyarrow as pa

    import ray.data

    res = entry_mod.queries()[name](SF)
    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    want = con.execute(entry_mod.oracle_sql()[name]).df()
    a, b = _canon(res), _canon(want)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating):
            assert np.allclose(av.astype(float), bv.astype(float), atol=0, rtol=0)
        else:
            assert (av == bv).all(), c


def test_entry_returns_rows(entry_mod):
    df = entry_mod.entry()
    assert len(df) > 0
    assert list(df.columns) == ["vertex", "pagerank", "out_degree"]
    # stable schema + deterministic values across calls
    df2 = entry_mod.entry()
    pd.testing.assert_frame_equal(df, df2)

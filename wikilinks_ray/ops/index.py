"""Inverted text index: build, commit, point lookup.

Search-style postings over ``documents(doc_id, text)`` (no reference
analog — the engine-side complement to `state/lookup.py`'s title index,
for the TEXT side of a web corpus): token -> (doc_id, tf) posting rows,
hash-partitioned by token so a term lookup reads exactly ONE bucket's
parquet files.

Layout (same pattern as the IVF index, ops/similarity.py): parquet
partitioned by ``bucket = md5_u64(token) % num_buckets`` under an fsio
URI, committed SENTINEL-LAST (``_INDEX_OK`` carries num_buckets +
row/token counts; deleted before any rebuild so a torn write is always
detected — state/fsio.py protocol).

Tokenization parity: lowercase ``\\w+`` (UNICODE) — the exact twin of
the SQL oracles' ``regexp_extract_all(lower(text), '\\w+')``, the same
convention every text-family op in this repo is gated on; the token ->
bucket hash is the first-8-md5-bytes little-endian u64, DuckDB's
``md5_number_upper``.

Plan: one ``map_batches`` pass tokenizes and pre-counts per-(doc,
token) tf VECTORIZED (sort + run-length inside the batch — the
combiner: what shuffles into partitioned files is one row per distinct
(doc, token), not per occurrence), then ``write_parquet(...,
partition_cols=["bucket"])`` routes rows to buckets. A hot token
(stopword) spreads across row groups WITHIN its bucket file — lookups
of other terms never touch it.
"""

from __future__ import annotations

import hashlib
import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..state import fsio

TOKEN_RE = re.compile(r"\w+", re.UNICODE)

SENTINEL = "_INDEX_OK"


def _token_u64(token: str) -> int:
    return int.from_bytes(
        hashlib.md5(token.encode("utf-8")).digest()[:8], "little")


def _postings_batch(t: pa.Table, num_buckets: int) -> pa.Table:
    doc_ids: list[int] = []
    toks: list[str] = []
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        for tok in TOKEN_RE.findall((text or "").lower()):
            doc_ids.append(did)
            toks.append(tok)
    if not doc_ids:
        return pa.table({"token": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64())})
    df = pd.DataFrame({"doc_id": np.asarray(doc_ids, dtype=np.int64),
                       "token": toks})
    g = (df.groupby(["doc_id", "token"], sort=False).size()
         .reset_index(name="tf"))
    buckets = np.fromiter((_token_u64(s) % num_buckets for s in g["token"]),
                          dtype=np.int64, count=len(g))
    return pa.table({
        "token": pa.array(g["token"], pa.string()),
        "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
        "tf": pa.array(g["tf"].to_numpy().astype(np.int64)),
        "bucket": pa.array(buckets),
    })


def build_inverted_index(docs: "ray.data.Dataset", out_uri: str, *,
                         num_buckets: int = 64,
                         concurrency: int | None = None,
                         overwrite: bool = False) -> dict:
    """Build (or reuse) the index at ``out_uri``; returns the committed
    meta dict. A committed index with a readable sentinel is reused
    unless ``overwrite``."""
    sent = fsio.join(out_uri, SENTINEL)
    if fsio.exists(sent) and not overwrite:
        return json.loads(fsio.read_text(sent))
    if fsio.exists(sent):
        fsio.delete_file(sent)  # uncommit BEFORE any rewrite
    fsio.makedirs(out_uri)

    postings = docs.select_columns(["doc_id", "text"]).map_batches(
        lambda t, nb=num_buckets: _postings_batch(t, nb),
        batch_format="pyarrow", concurrency=concurrency)
    postings = postings.materialize()
    n_rows = postings.count()
    postings.write_parquet(out_uri, partition_cols=["bucket"])
    meta = {"num_buckets": num_buckets, "n_posting_rows": int(n_rows)}
    fsio.write_text(sent, json.dumps(meta))
    return meta


def read_postings(index_uri: str) -> "ray.data.Dataset":
    """Whole-index Dataset (token, doc_id, tf, bucket) — the committed
    sentinel is required."""
    meta = json.loads(fsio.read_text(fsio.join(index_uri, SENTINEL)))
    ds = ray.data.read_parquet(index_uri)
    return ds, meta


def lookup_postings(index_uri: str, term: str) -> pd.DataFrame:
    """Point lookup: the term's postings (doc_id, tf), doc_id-sorted.
    Reads ONLY the term's bucket partition."""
    meta = json.loads(fsio.read_text(fsio.join(index_uri, SENTINEL)))
    b = _token_u64(term) % int(meta["num_buckets"])
    part = fsio.join(index_uri, f"bucket={b}")
    if not fsio.exists(part):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "tf": pd.Series([], dtype="int64")})
    import pyarrow.dataset as pads

    fs, path = fsio.resolve(part)
    table = pads.dataset(path, filesystem=fs, format="parquet").to_table(
        columns=["token", "doc_id", "tf"],
        filter=pads.field("token") == term)
    df = table.select(["doc_id", "tf"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def term_stats_topk(index_ds: "ray.data.Dataset", k: int = 50
                    ) -> pd.DataFrame:
    """Top-k tokens by document frequency (ties: token code-point asc)
    from the posting rows: (token, df, tf). Per-batch combine by token,
    token-hash bucketed reduce, driver keeps only the tiny top-k."""
    from ..stages.agg import _bucket_of

    def combine(t: pa.Table) -> pa.Table:
        df = t.select(["token", "doc_id", "tf"]).to_pandas()
        g = df.groupby("token", sort=False).agg(
            df_=("doc_id", "nunique"), tf_=("tf", "sum")).reset_index()
        h = np.fromiter((_token_u64(s) for s in g["token"]),
                        dtype=np.uint64, count=len(g)).astype(np.int64)
        return pa.table({
            "token": pa.array(g["token"], pa.string()),
            "df_": pa.array(g["df_"].to_numpy().astype(np.int64)),
            "tf_": pa.array(g["tf_"].to_numpy().astype(np.int64)),
            "__part": pa.array(_bucket_of(h, num_buckets=64)),
        })

    def reduce_(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("token", sort=False).agg(
            df_=("df_", "sum"), tf_=("tf_", "sum")).reset_index()
        m = m.sort_values(["df_", "token"], ascending=[False, True],
                          kind="stable").head(k)
        return m

    # posting rows are unique per (doc, token) by construction, so both
    # df_ and tf_ compose by plain sums across batches/buckets
    parts = (index_ds.map_batches(combine, batch_format="pyarrow")
             .groupby("__part").map_groups(reduce_, batch_format="pandas"))
    out = parts.to_pandas()
    out = out.sort_values(["df_", "token"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
    return out.rename(columns={"df_": "df", "tf_": "tf"})

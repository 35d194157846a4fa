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

# bump when the posting-row schema changes; a cached index whose
# sentinel carries an older format is rebuilt, never half-read
INDEX_FORMAT = 2


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
                         "dl": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64())})
    df = pd.DataFrame({"doc_id": np.asarray(doc_ids, dtype=np.int64),
                       "token": toks})
    g = (df.groupby(["doc_id", "token"], sort=False).size()
         .reset_index(name="tf"))
    # dl (token length of the whole doc) rides on every posting row —
    # the "norms live in the postings" layout real engines use, so a
    # scoring read touches ONLY the query terms' buckets, never a
    # doc-side join. A batch holds whole docs, so the per-doc tf sum
    # within the batch IS the doc length.
    dl_map = g.groupby("doc_id", sort=False)["tf"].sum()
    dl = dl_map.loc[g["doc_id"]].to_numpy().astype(np.int64)
    buckets = np.fromiter((_token_u64(s) % num_buckets for s in g["token"]),
                          dtype=np.int64, count=len(g))
    return pa.table({
        "token": pa.array(g["token"], pa.string()),
        "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
        "tf": pa.array(g["tf"].to_numpy().astype(np.int64)),
        "dl": pa.array(dl),
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
        meta = json.loads(fsio.read_text(sent))
        # layout upgrades (e.g. the dl norms column) rebuild a cached
        # older-format index instead of serving rows it doesn't have
        if meta.get("format") == INDEX_FORMAT:
            return meta
    if fsio.exists(sent):
        fsio.delete_file(sent)  # uncommit BEFORE any rewrite
    if fsio.exists(out_uri):
        # a rebuild (overwrite, or a format upgrade of a cached index)
        # must not mix old bucket files with the new write — clear the
        # tree first; the sentinel is already gone, so a crash here
        # leaves an uncommitted dir, never a torn one
        fsio.rmtree(out_uri)
    fsio.makedirs(out_uri)

    n_docs = docs.count()
    postings = docs.select_columns(["doc_id", "text"]).map_batches(
        lambda t, nb=num_buckets: _postings_batch(t, nb),
        batch_format="pyarrow", concurrency=concurrency)
    postings = postings.materialize()
    n_rows = postings.count()
    total_tokens = int(postings.sum("tf") or 0)
    postings.write_parquet(out_uri, partition_cols=["bucket"])
    meta = {"format": INDEX_FORMAT, "num_buckets": num_buckets,
            "n_posting_rows": int(n_rows), "n_docs": int(n_docs),
            "total_tokens": total_tokens}
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


def bm25_topk(index_uri: str, terms: list[str], *, k: int = 25,
              idf_scale: int = 10 ** 4) -> pd.DataFrame:
    """Integer-exact BM25-style ranked retrieval over the committed
    index: top-k docs for a bag-of-terms query, `(doc_id,
    bm25_scaled)`, score desc / doc_id asc.

    Scoring is Okapi BM25 with k1 = 6/5, b = 3/4 and the log-idf
    replaced by its exact rational linearization so every arithmetic
    step is int64 and the DuckDB oracle reproduces identical integers
    (the same convention as the scaled PageRank/Katz twins):

        idf   = ((2N - 2df + 1) * idf_scale) // (2df + 1)
                      -- (N - df + .5)/(df + .5) as an exact fraction
        c     = (idf * 44 * tf * S) // (20*tf*S + 6*S + 18*dl*N)
                      -- tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                         with k1=6/5, b=3/4, avgdl=S/N folded to one
                         integer ratio: 44=(6+5)*4, 20=5*4, 6=6*(4-3),
                         18=6*3
        score = sum(c) over query terms present in the doc

    Scale shape: the read touches ONLY the query terms' bucket
    partitions (token filter pushed into the parquet scan); dl rides on
    each posting row so there is no doc-side join; per-term df is a
    tiny count over those same rows; scoring + per-doc sum + local
    top-k all run cluster-side and the driver collects <= k rows per
    scoring batch.
    """
    import pyarrow.dataset as pads

    meta = json.loads(fsio.read_text(fsio.join(index_uri, SENTINEL)))
    if meta.get("format") != INDEX_FORMAT:
        raise ValueError(f"index at {index_uri} has format "
                         f"{meta.get('format')}, need {INDEX_FORMAT}")
    nb = int(meta["num_buckets"])
    n_docs = int(meta["n_docs"])
    total = int(meta["total_tokens"])
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "bm25_scaled": pd.Series([], dtype="int64")})
    terms = sorted(set(terms))
    if not terms or n_docs == 0 or total == 0:
        return empty
    # int64 headroom: max contribution numerator is
    # idf(<=2N*idf_scale) * 44 * tf * S — assert instead of silently
    # wrapping (same guardrail pattern as csr.scatter_weighted_int);
    # shrink idf_scale for corpora big enough to trip this
    assert 2 * n_docs * idf_scale * 44 * total < 2 ** 62, \
        "bm25 int64 headroom: lower idf_scale for this corpus size"

    bucket_dirs = sorted({_token_u64(t) % nb for t in terms})
    paths, fs = [], None
    for b in bucket_dirs:
        part = fsio.join(index_uri, f"bucket={b}")
        if fsio.exists(part):
            fs, _p = fsio.resolve(part)
            paths.extend(fsio.resolve(fsio.join(part, name))[1]
                         for name in fsio.listdir(part))
    if not paths:
        return empty
    ds = ray.data.read_parquet(
        paths, filesystem=fs, columns=["token", "doc_id", "tf", "dl"],
        filter=pads.field("token").isin(terms)).materialize()
    if ds.count() == 0:
        return empty

    # per-term document frequency: posting rows are unique per
    # (doc, token), so df is a plain row count per token
    dfs = ds.groupby("token").count().to_pandas()
    df_map = {t: int(c) for t, c in zip(dfs["token"], dfs["count()"])}
    idf_map = {t: ((2 * n_docs - 2 * df + 1) * idf_scale) // (2 * df + 1)
               for t, df in df_map.items()}

    def score(t: pa.Table, idf_map=idf_map, s=total, n=n_docs,
              k=k) -> pa.Table:
        toks = t.column("token").to_pylist()
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)
        idf = np.fromiter((idf_map[x] for x in toks), dtype=np.int64,
                          count=len(toks))
        c = (idf * 44 * tf * s) // (20 * tf * s + 6 * s + 18 * dl * n)
        df = pd.DataFrame({
            "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False),
            "c": c})
        g = df.groupby("doc_id", sort=False)["c"].sum().reset_index()
        # local top-k is NOT safe before the cross-batch sum (a doc's
        # postings can split across buckets/batches) — emit partials
        return pa.table({"doc_id": pa.array(g["doc_id"], pa.int64()),
                         "c": pa.array(g["c"], pa.int64())})

    from ..stages.agg import grouped_agg

    scores = grouped_agg(ds.map_batches(score, batch_format="pyarrow"),
                         ["doc_id"], "c", "sum", out_col="bm25_scaled")

    def local_topk(t: pa.Table, k=k) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["bm25_scaled", "doc_id"], ascending=[False, True],
            kind="stable").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = scores.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["bm25_scaled", "doc_id"],
                           ascending=[False, True], kind="stable").head(k)
    return out[["doc_id", "bm25_scaled"]].astype("int64").reset_index(
        drop=True)


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

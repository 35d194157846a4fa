"""Inverted index (ops/index.py): build/commit/reuse protocol, point
lookups vs brute force, bucket-local reads, top-k term stats."""

from __future__ import annotations

import collections
import json
import re

import pandas as pd
import pytest

from wikilinks_ray.ops.index import (
    SENTINEL,
    TOKEN_RE,
    _token_u64,
    build_inverted_index,
    lookup_postings,
    read_postings,
    term_stats_topk,
)
from wikilinks_ray.state import fsio

DOCS = [
    (0, "The cat sat on the mat"),
    (1, "the dog ate the cat food"),
    (2, "Unicode Café naïve café"),
    (3, ""),
    (4, "mat mat mat"),
]


def brute_tf():
    tf = collections.Counter()
    for did, text in DOCS:
        for tok in TOKEN_RE.findall(text.lower()):
            tf[(did, tok)] += 1
    return tf


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    docs = rd.from_items([{"doc_id": d, "text": t} for d, t in DOCS])
    out = str(tmp_path_factory.mktemp("invidx") / "idx")
    meta = build_inverted_index(docs, out, num_buckets=8)
    return out, meta, docs


def test_commit_and_reuse(index_dir):
    out, meta, docs = index_dir
    assert fsio.exists(fsio.join(out, SENTINEL))
    assert meta["n_posting_rows"] == len(brute_tf())
    # second build without overwrite must be a committed-reuse no-op
    again = build_inverted_index(docs, out, num_buckets=8)
    assert again == meta


@pytest.mark.parametrize("term", ["the", "cat", "mat", "café", "absent"])
def test_lookup_matches_brute_force(index_dir, term):
    out, _meta, _docs = index_dir
    tf = brute_tf()
    want = sorted((d, n) for (d, tok), n in tf.items() if tok == term)
    got = lookup_postings(out, term)
    assert list(map(tuple, got.to_numpy().tolist())) == want


def test_lookup_reads_single_bucket(index_dir):
    out, meta, _docs = index_dir
    # the bucket dir for 'cat' exists and the lookup only needs it
    b = _token_u64("cat") % meta["num_buckets"]
    assert fsio.exists(fsio.join(out, f"bucket={b}"))


def test_term_stats_topk(index_dir):
    out, _meta, _docs = index_dir
    ds, _ = read_postings(out)
    got = term_stats_topk(ds, k=3)
    tf = brute_tf()
    agg = collections.defaultdict(lambda: [0, 0])
    for (d, tok), n in tf.items():
        agg[tok][0] += 1
        agg[tok][1] += n
    want = sorted(((tok, v[0], v[1]) for tok, v in agg.items()),
                  key=lambda r: (-r[1], r[0]))[:3]
    assert list(map(tuple, got.to_numpy().tolist())) == want


def test_overwrite_uncommits_first(index_dir, tmp_path):
    import ray.data as rd

    docs = rd.from_items([{"doc_id": 9, "text": "only one doc"}])
    out = str(tmp_path / "idx2")
    build_inverted_index(docs, out, num_buckets=4)
    meta2 = build_inverted_index(docs, out, num_buckets=4, overwrite=True)
    assert meta2["n_posting_rows"] == 3
    assert json.loads(fsio.read_text(fsio.join(out, SENTINEL))) == meta2


def _brute_bm25(query_terms, k=25, idf_scale=10 ** 4):
    """Pure-Python reference for the integer BM25 formula in
    ops/index.py bm25_topk (k1=6/5, b=3/4, rational-linearized idf)."""
    tf = brute_tf()
    n_docs = len(DOCS)
    dl = collections.Counter()
    for (d, tok), n in tf.items():
        dl[d] += n
    s = sum(dl.values())
    dfs = collections.Counter()
    for (d, tok) in tf:
        dfs[tok] += 1
    scores = collections.Counter()
    for (d, tok), f in tf.items():
        if tok not in query_terms:
            continue
        df = dfs[tok]
        idf = ((2 * n_docs - 2 * df + 1) * idf_scale) // (2 * df + 1)
        scores[d] += (idf * 44 * f * s) // (
            20 * f * s + 6 * s + 18 * dl[d] * n_docs)
    rows = sorted(scores.items(), key=lambda r: (-r[1], r[0]))[:k]
    return rows


def test_bm25_matches_brute_force(index_dir):
    from wikilinks_ray.ops.index import bm25_topk

    out, _meta, _docs = index_dir
    got = bm25_topk(out, ["cat", "mat", "absent"], k=25)
    want = _brute_bm25({"cat", "mat", "absent"})
    assert list(map(tuple, got.to_numpy().tolist())) == want
    # empty-query / miss-only query degenerate cleanly
    assert bm25_topk(out, [], k=5).empty
    assert bm25_topk(out, ["absent"], k=5).empty


def test_bm25_rank_prefers_rare_term_and_shorter_doc(index_dir):
    from wikilinks_ray.ops.index import bm25_topk

    out, _meta, _docs = index_dir
    got = bm25_topk(out, ["mat"], k=25)
    # doc 4 ("mat mat mat") outranks doc 0 (one 'mat' in a longer doc)
    assert got["doc_id"].tolist()[0] == 4


def test_format_upgrade_rebuilds_cached_index(index_dir, tmp_path):
    """A cached index whose sentinel predates INDEX_FORMAT is rebuilt
    from scratch (old bucket files cleared, dl column present)."""
    import ray.data as rd

    from wikilinks_ray.ops.index import INDEX_FORMAT

    docs = rd.from_items([{"doc_id": d, "text": t} for d, t in DOCS])
    out = str(tmp_path / "idx_old")
    meta = build_inverted_index(docs, out, num_buckets=4)
    # forge an old-format sentinel (format key absent, as round-4 wrote)
    old = {"num_buckets": 4, "n_posting_rows": meta["n_posting_rows"]}
    fsio.write_text(fsio.join(out, SENTINEL), json.dumps(old))
    meta2 = build_inverted_index(docs, out, num_buckets=4)
    assert meta2["format"] == INDEX_FORMAT
    assert meta2["n_posting_rows"] == meta["n_posting_rows"]
    ds, _ = read_postings(out)
    # rebuild did not mix files: row count exact, dl column present
    assert ds.count() == meta["n_posting_rows"]
    assert "dl" in ds.schema().names


def test_postings_carry_doc_length(index_dir):
    out, _meta, _docs = index_dir
    ds, _ = read_postings(out)
    df = ds.to_pandas()
    tf = brute_tf()
    dl = collections.Counter()
    for (d, tok), n in tf.items():
        dl[d] += n
    for _, row in df.iterrows():
        assert row["dl"] == dl[row["doc_id"]]

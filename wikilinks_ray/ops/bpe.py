"""Distributed BPE merge training (the learning side of byte-pair
encoding, Sennrich et al. 2016) — the canonical "train the tokenizer
on the corpus" step of an LLM-data pipeline, expressed Ray-first.

Shape (SCALE.md): ONE corpus pass builds the distinct-word frequency
table (per-batch local combine -> `grouped_agg` sum — the Zipf
compaction: what shuffles is one row per distinct word per batch,
never per occurrence). The word table is hash-partitioned to Parquet
and each partition is loaded ONCE into a `BPEShardState` actor as flat
numpy symbol arrays. Every merge round then exchanges only
per-shard pair-count PARTIALS (<= distinct adjacent pairs per shard,
vocabulary-bounded — never corpus-bounded) to the driver, which picks
the argmax pair and broadcasts one (left, right, new_id) triple back;
actors apply the merge in place, fully vectorized (run-length parity
for the greedy left-to-right non-overlap rule). Driver state is the
merge list + the id<->string tables: O(alphabet + merges).

Merge semantics, pinned identically in the DuckDB twin
(`__ray_entry__._bpe_oracle_sql`) and by the dense-replay pytest:

- words: lowercase ``\\w+`` tokens (the repo-wide tokenizer twin);
  initial symbols are Unicode code points.
- pair counts: every adjacent symbol position, weighted by word
  frequency — OVERLAPPING occurrences count ("aaa" has (a,a) twice).
- winner: max count, ties by (left string, right string) ascending —
  UTF-8 byte order == code-point order, so DuckDB's binary VARCHAR
  collation and Python ``str`` compare agree.
- apply: greedy LEFT-TO-RIGHT non-overlapping within each word — i.e.
  inside every maximal run of consecutive matching positions, the
  1st, 3rd, 5th... merge ("aaaa" -> ZZ, "aaa" -> Za).
- merged symbols CANONICALIZE BY STRING: if two merge paths produce
  the same surface string (("a","bc") and ("ab","c") both -> "abc"),
  the new symbol REUSES the existing id — the SQL side works on
  strings, so id<->string must stay bijective for the replay to be
  value-exact.
- a round with no pairs left is a no-op on both sides (the engine
  stops; the unrolled SQL's empty `best` CTE contributes no row).

No reference counterpart (the reference is a link-graph engine); this
extends the LLM-data operator family (SURVEY.md "beyond the
reference" mandate) alongside ops/text.py's pre-tokenizer counting.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# symbol ids: initial symbols are code points (< 0x110000); merged
# symbols allocate upward from there. Packing a pair into one int64
# key needs 21 bits per side, so cap total ids at 2^21.
_ID_BITS = 21
_ID_CAP = 1 << _ID_BITS
_FIRST_MERGED = 0x110000


def word_counts(docs: "ray.data.Dataset", *, text_col: str = "text",
                num_buckets: int = 32) -> "ray.data.Dataset":
    """Corpus word-frequency table (word, freq) — per-batch local
    combine, then a word-hash bucketed `map_groups` sum (string keys,
    so the int64 `grouped_agg` fast path doesn't apply — same plan as
    `ops.text.bigram_topk`). What shuffles is one row per distinct
    word per batch (Zipf-compacted), never per occurrence."""
    import pandas as pd

    def local(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(_WORD_RE.findall((text or "").lower()))
        ws = list(c.keys())
        return pa.table({
            "word": pa.array(ws, pa.string()),
            "cnt": pa.array([c[w] for w in ws], pa.int64()),
            "__b": pa.array(_word_bucket_hash(ws, num_buckets), pa.int64()),
        })

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        s = (g.groupby("word", sort=False)["cnt"].sum()
             .reset_index(name="freq"))
        return s[["word", "freq"]]

    return (docs.map_batches(local, batch_format="pyarrow")
            .groupby("__b").map_groups(fold, batch_format="pandas"))


def _word_bucket_hash(words: list[str], num_shards: int) -> np.ndarray:
    """Deterministic md5-based shard assignment (repo convention)."""
    return np.array(
        [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
         % num_shards for w in words], dtype=np.int64)


@ray.remote
class BPEShardState:
    """One word-shard's symbol state, resident across merge rounds.

    Flat arrays: ``syms`` (int64 symbol id per position), ``wid``
    (word index per position, strictly non-decreasing), ``freq``
    (int64 per word). Rounds mutate in place; only pair-count partials
    and one merge triple ever cross the object store."""

    def __init__(self, shard_dir: str, bucket: int, fs_registry=None):
        import pyarrow.dataset as pads

        from ..state import fsio

        fsio.restore(fs_registry)
        fs, root = fsio.resolve(shard_dir)
        t = pads.dataset(f"{root.rstrip('/')}/bucket={bucket}",
                         filesystem=fs, format="parquet").to_table()
        # deterministic order inside the shard (pair counts are
        # order-free, but replays should be byte-stable)
        t = t.sort_by("word")
        words = t.column("word").to_pylist()
        freqs = t.column("freq").to_numpy(zero_copy_only=False)
        lens = np.array([len(w) for w in words], dtype=np.int64)
        self.words = words
        self.freq = freqs.astype(np.int64)
        self.wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
        self.syms = (np.frombuffer("".join(words).encode("utf-32-le"),
                                   dtype=np.uint32).astype(np.int64)
                     if words else np.empty(0, np.int64))

    def word_token_lengths(self) -> pa.Table:
        """(word, n_tok) under the merges applied so far — the shard's
        slice of the trained encoder vocabulary."""
        n = np.bincount(self.wid, minlength=len(self.freq)).astype(np.int64)
        return pa.table({"word": pa.array(self.words, pa.string()),
                         "n_tok": pa.array(n, pa.int64())})

    def pair_counts(self) -> tuple[np.ndarray, np.ndarray]:
        """Freq-weighted counts of every adjacent (overlapping) symbol
        pair in this shard, keyed ``(l << 21) | r``."""
        s, wid = self.syms, self.wid
        if len(s) < 2:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        v = wid[:-1] == wid[1:]
        l = s[:-1][v]
        r = s[1:][v]
        w = self.freq[wid[:-1][v]]
        key = (l << _ID_BITS) | r
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, w)
        return uk, sums

    def apply_merge(self, l: int, r: int, new_id: int) -> int:
        """Greedy left-to-right non-overlapping replace of (l, r) with
        ``new_id``: inside each maximal run of consecutive matches,
        positions 0, 2, 4... merge (run-length parity, vectorized)."""
        s, wid = self.syms, self.wid
        if len(s) < 2:
            return 0
        m = np.concatenate(
            [(s[:-1] == l) & (s[1:] == r) & (wid[:-1] == wid[1:]), [False]])
        if not m.any():
            return 0
        starts = m & ~np.concatenate(([False], m[:-1]))
        run_id = np.cumsum(starts) - 1
        idx = np.arange(len(m), dtype=np.int64)
        first = np.zeros(int(run_id[-1]) + 1, dtype=np.int64)
        first[run_id[starts]] = idx[starts]
        apply = m & (((idx - first[run_id]) % 2) == 0)
        ai = np.flatnonzero(apply)
        s[ai] = new_id
        keep = np.ones(len(s), dtype=bool)
        keep[ai + 1] = False
        self.syms = s[keep]
        self.wid = wid[keep]
        return int(len(ai))


def train_bpe(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    num_merges: int = 12,
    num_shards: int = 4,
    work_dir: str | None = None,
    num_buckets: int = 32,
    return_vocab: bool = False,
):
    """Learn ``num_merges`` BPE merges over ``docs``; returns one row
    per merge: (merge_round, lhs, rhs, merged, pair_count). With
    ``return_vocab`` also returns the trained encoder vocabulary
    (word, n_tok) as a Dataset assembled from the shard actors' final
    state via ``from_arrow_refs`` — no driver materialization."""
    import uuid

    from ..state import fsio

    assert _FIRST_MERGED + num_merges < _ID_CAP
    if work_dir is None:
        work_dir = f"/tmp/wikilinks_ray_bpe/{uuid.uuid4().hex[:12]}"

    wc = word_counts(docs, text_col=text_col, num_buckets=num_buckets)

    def bucketed(t: pa.Table) -> pa.Table:
        b = _word_bucket_hash(t.column("word").to_pylist(), num_shards)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    (wc.map_batches(bucketed, batch_format="pyarrow")
       .write_parquet(work_dir, partition_cols=["bucket"]))

    import pyarrow.fs as pafs

    fs, root = fsio.resolve(work_dir)
    present = {
        int(f.base_name.split("=")[1])
        for f in fs.get_file_info(pafs.FileSelector(root))
        if f.base_name.startswith("bucket=")
    }
    snap = fsio.snapshot()
    actors = [BPEShardState.remote(work_dir, b, snap)
              for b in sorted(present)]

    id2str: dict[int, str] = {}
    str2id: dict[str, int] = {}
    rows: list[tuple[int, str, str, str, int]] = []
    next_id = _FIRST_MERGED
    for t in range(1, num_merges + 1):
        partials = ray.get([a.pair_counts.remote() for a in actors])
        keys = np.concatenate([p[0] for p in partials]) \
            if partials else np.empty(0, np.int64)
        if len(keys) == 0:
            break
        sums = np.concatenate([p[1] for p in partials])
        uk, inv = np.unique(keys, return_inverse=True)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, sums)

        def sym_str(i: int) -> str:
            return id2str[i] if i >= _FIRST_MERGED else chr(i)

        # argmax count; only actual count ties pay the string compare
        cand = np.flatnonzero(tot == tot.max())
        best = min(
            (int(uk[i]) for i in cand),
            key=lambda kk: (sym_str(kk >> _ID_BITS),
                            sym_str(kk & (_ID_CAP - 1))))
        l = best >> _ID_BITS
        r = best & (_ID_CAP - 1)
        ls, rs = sym_str(l), sym_str(r)
        merged = ls + rs
        # canonicalize by surface string: the SQL twin works on strings,
        # so equal strings must be ONE symbol on the engine side too
        new_id = str2id.get(merged)
        if new_id is None:
            new_id = next_id
            next_id += 1
            id2str[new_id] = merged
            str2id[merged] = new_id
        rows.append((t, ls, rs, merged, int(tot.max())))
        ray.get([a.apply_merge.remote(l, r, new_id) for a in actors])

    vocab = None
    if return_vocab:
        from ray.data import from_arrow_refs

        refs = [a.word_token_lengths.remote() for a in actors]
        ray.wait(refs, num_returns=len(refs))
        vocab = from_arrow_refs(refs)
    for a in actors:
        ray.kill(a)
    merges = pa.table({
        "merge_round": pa.array([x[0] for x in rows], pa.int64()),
        "lhs": pa.array([x[1] for x in rows], pa.string()),
        "rhs": pa.array([x[2] for x in rows], pa.string()),
        "merged": pa.array([x[3] for x in rows], pa.string()),
        "pair_count": pa.array([x[4] for x in rows], pa.int64()),
    })
    return (merges, vocab) if return_vocab else merges


def bpe_encode_token_counts(
    docs: "ray.data.Dataset",
    vocab: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-document token counts under a trained BPE vocabulary:
    (doc_id, bpe_vocab_tokens) where each word contributes its trained
    symbol-sequence length times its occurrence count.

    No vocabulary broadcast: at web scale the distinct-word table is
    multi-GB, so both sides — per-batch-compacted (doc_id, word, n_occ)
    occurrence rows and the (word, n_tok) vocab — are md5-word-hash
    bucketed into ONE `map_groups` join (a word lives in exactly one
    bucket), then a `grouped_agg` sum per doc. A zero row per document
    rides along so token-less docs still emit 0."""
    import pandas as pd

    from ..stages.agg import grouped_agg

    def occ(t: pa.Table) -> pa.Table:
        from collections import Counter

        ids, ws, ns = [], [], []
        for did, text in zip(t.column(id_col).to_pylist(),
                             t.column(text_col).to_pylist()):
            c = Counter(_WORD_RE.findall((text or "").lower()))
            # the zero row: "" is never a \w+ token, so it joins to
            # nothing and contributes 0 — but keeps doc_id present
            ids.append(did)
            ws.append("")
            ns.append(0)
            for w, k in c.items():
                ids.append(did)
                ws.append(w)
                ns.append(k)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "word": pa.array(ws, pa.string()),
            "n_occ": pa.array(ns, pa.int64()),
            "n_tok": pa.array([0] * len(ids), pa.int64()),
            "side": pa.array([0] * len(ids), pa.int64()),
            "__b": pa.array(_word_bucket_hash(ws, num_buckets), pa.int64()),
        })

    def vrows(t: pa.Table) -> pa.Table:
        ws = t.column("word").to_pylist()
        n = t.num_rows
        return pa.table({
            "doc_id": pa.array([-1] * n, pa.int64()),
            "word": t.column("word"),
            "n_occ": pa.array([0] * n, pa.int64()),
            "n_tok": t.column("n_tok").cast(pa.int64()),
            "side": pa.array([1] * n, pa.int64()),
            "__b": pa.array(_word_bucket_hash(ws, num_buckets), pa.int64()),
        })

    both = (docs.map_batches(occ, batch_format="pyarrow")
            .union(vocab.map_batches(vrows, batch_format="pyarrow")))

    def join(g: "pd.DataFrame") -> "pd.DataFrame":
        left = g[g["side"] == 0]
        right = g[g["side"] == 1][["word", "n_tok"]]
        m = left.merge(right, on="word", how="left",
                       suffixes=("_z", ""))
        part = (m["n_occ"] * m["n_tok"].fillna(0)).astype(np.int64)
        return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(),
                             "part": part.to_numpy()})

    parts = both.groupby("__b").map_groups(join, batch_format="pandas")
    return grouped_agg(parts, ["doc_id"], "part", "sum",
                       out_col="bpe_vocab_tokens", num_buckets=num_buckets)

"""BPE merge training vs a row-by-row reference replay.

Oracle pattern: an independent pure-Python greedy BPE (dict/loop form,
Sennrich et al. 2016 learn_bpe) replays the exact semantics the engine
pins — overlapping pair counts, (count desc, string asc) winner, greedy
left-to-right non-overlap merge, string-canonical symbol ids."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

WORD_RE = re.compile(r"\w+", re.UNICODE)


def ref_bpe(texts, rounds):
    wc: Counter = Counter()
    for t in texts:
        wc.update(WORD_RE.findall(t.lower()))
    seqs = {w: list(w) for w in wc}
    rows = []
    for t in range(1, rounds + 1):
        pc: Counter = Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += wc[w]
        if not pc:
            break
        mx = max(pc.values())
        l, r = min(p for p, c in pc.items() if c == mx)
        merged = l + r
        rows.append((t, l, r, merged, mx))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return rows


def docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def rows_of(t: pa.Table):
    return list(zip(*[t.column(c).to_pylist() for c in
                      ("merge_round", "lhs", "rhs", "merged",
                       "pair_count")]))


TEXTS = [
    # runs ("aaaa") exercise the left-to-right non-overlap parity;
    # abc/abcabc force the string-canonical id reuse path
    "aaaa aaa banana bandana abc abcabc the the the fast aaaa",
    "low lower lowest newer newest wider wide widest",
    "abc bcd cde abcde ab bc cd abab",
]


def test_bpe_matches_reference_all_shard_counts(ray_session):
    from wikilinks_ray.ops.bpe import train_bpe

    want = ref_bpe(TEXTS, 15)
    for P in (1, 3):
        got = rows_of(train_bpe(docs_ds(TEXTS), num_merges=15,
                                num_shards=P))
        assert got == want, f"num_shards={P}"


def test_bpe_run_parity_and_early_stop(ray_session):
    """'aaaaaa' x1: round 1 merges (a,a) at positions 0,2,4 ->
    Z Z Z; the word exhausts after 3 merges and later rounds
    are no-ops on both sides (early stop emits fewer rows)."""
    from wikilinks_ray.ops.bpe import train_bpe

    texts = ["aaaaaa"]
    want = ref_bpe(texts, 10)
    got = rows_of(train_bpe(docs_ds(texts), num_merges=10, num_shards=2))
    assert got == want
    assert len(got) < 10  # genuinely stopped early
    assert got[0][:4] == (1, "a", "a", "aa")
    # 3 overlapping (a,a)-run positions merge greedily: count was 5
    assert got[0][4] == 5


def test_bpe_string_canonicalization(ray_session):
    """Two merge paths producing the same surface string must converge
    to ONE symbol (the SQL twin works on strings): craft a corpus where
    ('xy', 'z') and ('x', 'yz') both arise."""
    from wikilinks_ray.ops.bpe import train_bpe

    # xy dominates -> merge1 = 'xy'; then yz among leftover words;
    # then ('xy','z') and ('x','yz') both produce 'xyz'
    texts = ["xy xy xy xy yz yz yz xyz xyz wxyz"]
    want = ref_bpe(texts, 8)
    got = rows_of(train_bpe(docs_ds(texts), num_merges=8, num_shards=2))
    assert got == want
    merged = [g[3] for g in got]
    assert len(set(merged)) == len(merged)  # no duplicate symbols


def test_bpe_encode_token_counts(ray_session):
    """Train->encode: per-doc token counts under the learned vocab,
    including a token-less doc (must emit 0) and multi-shard join."""
    from wikilinks_ray.ops.bpe import bpe_encode_token_counts, train_bpe

    texts = TEXTS + ["", "...!!!"]  # token-less docs
    ds = docs_ds(texts)
    merges, vocab = train_bpe(ds, num_merges=10, num_shards=3,
                              return_vocab=True)

    # reference: replay merges per word, count symbols
    wc: Counter = Counter()
    for t in texts:
        wc.update(WORD_RE.findall(t.lower()))
    seqs = {w: list(w) for w in wc}
    for l, r, merged in zip(merges.column("lhs").to_pylist(),
                            merges.column("rhs").to_pylist(),
                            merges.column("merged").to_pylist()):
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    want = {
        did: sum(len(seqs[w]) for w in WORD_RE.findall(t.lower()))
        for did, t in enumerate(texts)
    }

    got = bpe_encode_token_counts(ds, vocab).to_pandas()
    got_map = dict(zip(got["doc_id"], got["bpe_vocab_tokens"]))
    assert got_map == want
    assert got_map[len(texts) - 1] == 0  # token-less doc present as 0

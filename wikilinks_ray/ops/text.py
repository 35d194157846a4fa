"""Text-analysis stages for training-data pipelines over a ``documents``
table ``(doc_id, text, lang, source, n_chars)``.

All stages are actor-pool ``map_batches`` transforms: regexes and
profiles compile once per actor (``__init__``), batches stream through
``__call__``. Semantics are frozen so the companion SQL oracles in
``__ray_entry__.oracle_sql`` can reproduce the SQL-expressible columns
exactly (token/char counts, ratios); language-ID and fingerprints are
engine-only (rows-only correctness check).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# frozen stopword list (shared with quality scoring); tiny on purpose
STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that".split()
)

# frozen tokenizer: maximal \w+ runs (unicode), BPE-ish fallback of single
# non-space symbols. SQL oracle equivalent: regexp token extraction.
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)


def token_count_expr(text: str) -> int:
    """Frozen token-count semantics (shared by engine + tests)."""
    return len(_TOKEN_RE.findall(text))


class TextAnalyzer:
    """documents -> per-doc analysis columns.

    Emits: token_count, punct_count, stopword_ratio, mean_token_len,
    quality_score (length/punct/stopword heuristic in [0,1]),
    lang_pred (character-profile heuristic), fingerprint (md5-based
    64-bit digest of the normalized token stream).
    """

    def __init__(self):
        self.token_re = _TOKEN_RE
        self.punct_re = _PUNCT_RE
        self.stop = STOPWORDS

    @staticmethod
    def _fingerprint(tokens: list[str]) -> int:
        """First 8 md5 bytes (little-endian) of the normalized
        (lowercased, space-joined) token stream — a document fingerprint
        stable under whitespace/punct noise. One C-speed digest call per
        document (a per-byte Python hash loop here was the dominant cost
        of the whole text stage). SQL twin:
        ``md5_number_upper(lower(array_to_string(regexp_extract_all(
        text, '\\w+'), ' ')))`` — DuckDB's *upper* half is the digest's
        first 8 bytes read little-endian."""
        import hashlib

        norm = " ".join(tokens).lower().encode("utf-8")
        return int.from_bytes(hashlib.md5(norm).digest()[:8], "little")

    def _lang_pred(self, text: str) -> str:
        """Deterministic character-profile language heuristic."""
        if re.search(r"[一-鿿]", text):
            return "zh"
        if re.search(r"[äöüß]", text):
            return "de"
        if re.search(r"[àâçèêëîïôùûœ]", text):
            return "fr"
        if re.search(r"[áéíóúñ¿¡]", text):
            return "es"
        return "en"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        tc, pc_, sr, mtl, q, lp, fp = [], [], [], [], [], [], []
        for text in texts:
            text = text or ""
            tokens = self.token_re.findall(text)
            n_tok = len(tokens)
            n_punct = len(self.punct_re.findall(text))
            n_stop = sum(1 for t in tokens if t.lower() in self.stop)
            stop_ratio = n_stop / n_tok if n_tok else 0.0
            mean_len = sum(len(t) for t in tokens) / n_tok if n_tok else 0.0
            # quality: reward moderate length + stopword presence, punish
            # punctuation soup (frozen formula, documented in tests)
            length_score = min(1.0, n_tok / 100.0)
            punct_pen = min(1.0, n_punct / max(1, n_tok))
            quality = max(0.0, min(1.0,
                          0.5 * length_score + 0.5 * min(1.0, 4 * stop_ratio)
                          - 0.25 * punct_pen))
            tc.append(n_tok)
            pc_.append(n_punct)
            sr.append(stop_ratio)
            mtl.append(mean_len)
            q.append(quality)
            lp.append(self._lang_pred(text))
            fp.append(self._fingerprint(tokens))
        out = batch.select([c for c in ("doc_id", "lang", "source") if c in batch.column_names])
        return out.append_column("token_count", pa.array(tc, pa.int64())) \
                  .append_column("punct_count", pa.array(pc_, pa.int64())) \
                  .append_column("stopword_ratio", pa.array(sr, pa.float64())) \
                  .append_column("mean_token_len", pa.array(mtl, pa.float64())) \
                  .append_column("quality_score", pa.array(q, pa.float64())) \
                  .append_column("lang_pred", pa.array(lp, pa.string())) \
                  .append_column("fingerprint", pa.array(fp, pa.uint64()))


_ANALYZER: TextAnalyzer | None = None


def analyze_text(batch: pa.Table) -> pa.Table:
    """Task-pool form of :class:`TextAnalyzer`: a plain function with a
    lazily-built per-worker-process singleton. TextAnalyzer is
    stateless (module-level regexes), so tasks give the same throughput
    as an actor pool with strictly better fault tolerance — retries
    re-execute from lineage instead of depending on the object-store
    copy of the actor's constructor args (ray#53727)."""
    global _ANALYZER
    if _ANALYZER is None:
        _ANALYZER = TextAnalyzer()
    return _ANALYZER(batch)


# --- PII scrubbing ---------------------------------------------------
#
# Patterns are frozen to the RE2-compatible subset (no backrefs, no
# lookaround) so the DuckDB oracle's regexp_replace(..., 'g') applies
# byte-identical rewrites. Replacement order matters and is fixed:
# emails first (their local parts contain dots and digits an IP/phone
# pattern could chew on), then IPs, then phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
)


class PIIScrubber:
    """Redact emails / IPv4 addresses / international-format phone
    numbers from a text column. Passed as a callable instance (task
    pool — compiled patterns ship once in the transform spec); each
    batch is one pass of C-speed ``re.subn`` per pattern. Emits the scrubbed text plus a per-kind redaction count so
    downstream filters can drop PII-dense documents instead of just
    masking them."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.pats = [(name, re.compile(p), repl)
                     for name, p, repl in PII_PATTERNS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        clean = []
        counts: dict[str, list[int]] = {name: [] for name, _, _ in self.pats}
        for text in texts:
            t = text or ""
            for name, pat, repl in self.pats:
                t, n = pat.subn(repl, t)
                counts[name].append(n)
            clean.append(t)
        out = batch.drop_columns([self.text_col])
        out = out.append_column(self.text_col, pa.array(clean, pa.string()))
        for name, _, _ in self.pats:
            out = out.append_column(f"n_{name}",
                                    pa.array(counts[name], pa.int64()))
        return out


def scrub_pii(docs, *, text_col: str = "text",
              concurrency: int = 4):
    """Distributed PII redaction over a documents Dataset; see
    :class:`PIIScrubber` for the frozen patterns and column contract."""
    return docs.map_batches(PIIScrubber(text_col=text_col),
                            batch_format="pyarrow",
                            concurrency=concurrency)


# --- intra-document repetition ---------------------------------------

class RepetitionStats:
    """Per-document repetition signals used by web-scale quality
    filters: the fraction of word 2-grams / 3-grams that are repeats of
    an earlier gram in the same document (0 = no repetition, ->1 =
    loops/boilerplate). Grams are compared by 64-bit rolling-polynomial
    hashes of md5 token hashes (equal strings collide, unequal don't,
    w.h.p.) — one vectorized pass per document, no gram strings built.
    Callable instance (task pool); the token-hash cache rides along."""

    def __init__(self, text_col: str = "text"):
        from .dedup import _POLY, _TokenHasher, _WORD_RE

        self.text_col = text_col
        self.hasher = _TokenHasher()
        self.poly = _POLY
        self.word_re = _WORD_RE

    def _dup_frac(self, h: np.ndarray, k: int) -> float:
        n = len(h)
        if n < k:
            return 0.0
        g = h[:n - k + 1].copy()
        for j in range(1, k):
            g = g * self.poly + h[j:j + n - k + 1]
        return float(np.round(1.0 - len(np.unique(g)) / len(g), 6))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        f2, f3 = [], []
        for text in batch.column(self.text_col).to_pylist():
            toks = self.word_re.findall((text or "").lower())
            h = self.hasher.token_hashes(toks)
            f2.append(self._dup_frac(h, 2))
            f3.append(self._dup_frac(h, 3))
        return pa.table({
            "doc_id": ids,
            "dup_2gram_frac": pa.array(f2, pa.float64()),
            "dup_3gram_frac": pa.array(f3, pa.float64()),
        })


def repetition_stats(docs, *, text_col: str = "text",
                     concurrency: int = 4):
    """Distributed repetition scoring; see :class:`RepetitionStats`."""
    return docs.map_batches(RepetitionStats(text_col=text_col),
                            batch_format="pyarrow",
                            concurrency=concurrency)


# GPT-2-style pre-tokenizer (Radford et al. 2019 `gpt2/encoder.py`
# pattern), RE2-compatible so the SQL oracle can run the SAME split:
# the upstream pattern's trailing `\s+(?!\S)` lookahead is dropped
# (RE2 has no lookahead) and whitespace runs are simply not matched —
# findall-style extraction skips gaps, so the non-whitespace token
# stream is identical. Python has no \p{L}/\p{N}; [^\W\d_] is the
# unicode-letter complement class and (?:[^\w\s]|_) mirrors RE2's
# [^\s\p{L}\p{N}] (underscore included).
#
# Number-letter/other alignment: Python's \w-derived classes put Nl/No
# characters ('\u2167' ROMAN NUMERAL, '\u00b2' SUPERSCRIPT) with the
# LETTERS while RE2's \p{N} counts them as NUMBERS — '\u2167' + '3'
# would split 2-vs-1 tokens between the twins. _NLNO (every Nl/No
# codepoint as a frozen class, so no per-process unicodedata scan) is
# excluded from the letter class and added to the number class; the
# punctuation class needs no change ([^\w\s] already excludes \w,
# and [^\s\p{L}\p{N}] already excludes \p{N}). The constant is
# pinned against this interpreter's unicodedata by
# tests/test_ops.py::test_bpe_nlno_class_pins_unicodedata.
_NLNO = "\u00b2-\u00b3\u00b9\u00bc-\u00be\u09f4-\u09f9\u0b72-\u0b77\u0bf0-\u0bf2\u0c78-\u0c7e\u0d58-\u0d5e\u0d70-\u0d78\u0f2a-\u0f33\u1369-\u137c\u16ee-\u16f0\u17f0-\u17f9\u19da\u2070\u2074-\u2079\u2080-\u2089\u2150-\u2182\u2185-\u2189\u2460-\u249b\u24ea-\u24ff\u2776-\u2793\u2cfd\u3007\u3021-\u3029\u3038-\u303a\u3192-\u3195\u3220-\u3229\u3248-\u324f\u3251-\u325f\u3280-\u3289\u32b1-\u32bf\ua6e6-\ua6ef\ua830-\ua835\U00010107-\U00010133\U00010140-\U00010178\U0001018a-\U0001018b\U000102e1-\U000102fb\U00010320-\U00010323\U00010341\U0001034a\U000103d1-\U000103d5\U00010858-\U0001085f\U00010879-\U0001087f\U000108a7-\U000108af\U000108fb-\U000108ff\U00010916-\U0001091b\U000109bc-\U000109bd\U000109c0-\U000109cf\U000109d2-\U000109ff\U00010a40-\U00010a48\U00010a7d-\U00010a7e\U00010a9d-\U00010a9f\U00010aeb-\U00010aef\U00010b58-\U00010b5f\U00010b78-\U00010b7f\U00010ba9-\U00010baf\U00010cfa-\U00010cff\U00010e60-\U00010e7e\U00010f1d-\U00010f26\U00010f51-\U00010f54\U00010fc5-\U00010fcb\U00011052-\U00011065\U000111e1-\U000111f4\U0001173a-\U0001173b\U000118ea-\U000118f2\U00011c5a-\U00011c6c\U00011fc0-\U00011fd4\U00012400-\U0001246e\U00016b5b-\U00016b61\U00016e80-\U00016e96\U0001d2e0-\U0001d2f3\U0001d360-\U0001d378\U0001e8c7-\U0001e8cf\U0001ec71-\U0001ecab\U0001ecad-\U0001ecaf\U0001ecb1-\U0001ecb4\U0001ed01-\U0001ed2d\U0001ed2f-\U0001ed3d\U0001f100-\U0001f10c"
_BPE_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_" + _NLNO + r"]+"
    r"| ?[\d" + _NLNO + r"]+"
    r"| ?(?:[^\w\s]|_)+",
    re.UNICODE)

# the RE2 twin, exposed so the oracle builder inlines the same split
BPE_RE2_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+")


def bpe_token_counts(docs, *, text_col: str = "text",
                     concurrency: int = 4):
    """Per-document token counts under two tokenizers: whitespace split
    (``ws_tokens``) and the GPT-2-style BPE pre-tokenizer regex
    (``bpe_tokens``) — the cheap proxy a data pipeline uses to budget
    sequence packing / pricing before real BPE merges run. Counting is
    one vectorized-enough findall per doc (task pool)."""

    def counts(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        ws, bp = [], []
        for text in t.column(text_col).to_pylist():
            s = text or ""
            ws.append(len(s.split()))
            bp.append(len(_BPE_RE.findall(s)))
        return pa.table({
            "doc_id": ids,
            "ws_tokens": pa.array(ws, pa.int64()),
            "bpe_tokens": pa.array(bp, pa.int64()),
        })

    return docs.map_batches(counts, batch_format="pyarrow",
                            concurrency=concurrency)


def bigram_topk(docs, *, text_col: str = "text", k: int = 30,
                num_buckets: int = 32, concurrency: int = 4):
    """Top-k adjacent-token bigrams by corpus count (ties: w1, w2
    code-point asc) — the collocation statistic an LM-data pipeline
    uses to spot boilerplate phrases and build phrase vocabularies.

    Tokenization is the repo-wide lowercase ``\\w+`` twin of the SQL
    oracles. Per batch: one findall per doc, bigrams by list shift, a
    vectorized local (w1, w2) count combine — what shuffles is one row
    per distinct bigram per batch, never per occurrence. Final reduce
    is bigram-hash bucketed `map_groups` (string keys, so the same plan
    as `ops/index.term_stats_topk`, not the int-keyed `grouped_agg`);
    each bucket emits its own top-k, the driver merges <= k *
    num_buckets rows. Exact integers end to end."""
    import hashlib

    import pandas as pd

    tok_re = _TOKEN_RE

    def _u64(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                              "little")

    def combine(t: pa.Table) -> pa.Table:
        w1: list[str] = []
        w2: list[str] = []
        for text in t.column(text_col).to_pylist():
            toks = tok_re.findall((text or "").lower())
            if len(toks) >= 2:
                w1.extend(toks[:-1])
                w2.extend(toks[1:])
        if not w1:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        df = pd.DataFrame({"w1": w1, "w2": w2})
        g = df.groupby(["w1", "w2"], sort=False).size().reset_index(name="n")
        part = np.fromiter(
            (_u64(a + "\x00" + b) % num_buckets
             for a, b in zip(g["w1"], g["w2"])),
            dtype=np.int64, count=len(g))
        return pa.table({"w1": pa.array(g["w1"], pa.string()),
                         "w2": pa.array(g["w2"], pa.string()),
                         "n": pa.array(g["n"].to_numpy().astype(np.int64)),
                         "__part": pa.array(part)})

    def reduce_(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()
        # a bigram lives in exactly one bucket, so the bucket's own
        # top-k is globally safe to truncate
        return m.sort_values(["n", "w1", "w2"],
                             ascending=[False, True, True],
                             kind="stable").head(k)

    cand = (docs.map_batches(combine, batch_format="pyarrow",
                             concurrency=concurrency)
            .groupby("__part").map_groups(reduce_, batch_format="pandas")
            .to_pandas())
    out = cand.sort_values(["n", "w1", "w2"],
                           ascending=[False, True, True],
                           kind="stable").head(k).reset_index(drop=True)
    return out[["w1", "w2", "n"]]


def doc_keywords_tfidf(docs, *, text_col: str = "text", k: int = 5,
                       idf_scale: int = 10 ** 4, num_buckets: int = 32,
                       concurrency: int = 4):
    """Per-document TF-IDF keyword extraction, integer-exact: rows
    (doc_id, rank, word, tf, df, score) for each doc's top-``k`` words
    by ``score = tf * ((n_docs * idf_scale) // df)``, ties broken by
    word ascending (binary == code-point order, so the DuckDB twin
    agrees).

    Plan (SCALE.md): a batch holds whole documents, so per-doc tf rows
    are complete after ONE pass (combiner form: what shuffles is one
    row per distinct (doc, word), never per occurrence). df is a
    word-hash bucketed count over those rows (a word lives in exactly
    one bucket); the same bucketing joins tf back to df; the final
    per-doc top-k re-buckets by doc id and truncates inside the bucket
    (a doc lives in exactly one bucket, so per-bucket head-k is
    globally safe). Integer idf keeps every value int64
    (tf * n_docs * idf_scale headroom asserted)."""
    import hashlib

    import pandas as pd

    n_docs = docs.count()
    assert n_docs * idf_scale < 2 ** 40, \
        "tfidf int64 headroom: lower idf_scale for this corpus size"

    def _wb(ws) -> np.ndarray:
        return np.fromiter(
            (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
             % num_buckets for w in ws), dtype=np.int64, count=len(ws))

    def tf_rows(t: pa.Table) -> pa.Table:
        from collections import Counter

        ids, ws, tfs = [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column(text_col).to_pylist()):
            for w, c in Counter(
                    _TOKEN_RE.findall((text or "").lower())).items():
                ids.append(did)
                ws.append(w)
                tfs.append(c)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "word": pa.array(ws, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "__b": pa.array(_wb(ws), pa.int64()),
        })

    tf = docs.map_batches(tf_rows, batch_format="pyarrow",
                          concurrency=concurrency).materialize()

    def score_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        df_map = g.groupby("word", sort=False)["doc_id"].size()
        dfv = df_map.loc[g["word"]].to_numpy().astype(np.int64)
        idf = (n_docs * idf_scale) // dfv
        out = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "word": g["word"].to_numpy(),
            "tf": g["tf"].to_numpy(),
            "df": dfv,
            "score": g["tf"].to_numpy() * idf,
        })
        out["__d"] = out["doc_id"].to_numpy() % num_buckets
        return out

    scored = tf.groupby("__b").map_groups(score_bucket,
                                          batch_format="pandas")

    def topk(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["doc_id", "score", "word"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("doc_id", sort=False).head(k).copy()
        g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        return g[["doc_id", "rank", "word", "tf", "df", "score"]]

    return scored.groupby("__d").map_groups(topk, batch_format="pandas")


def vocab_coverage(docs, *, text_col: str = "text", top_k: int = 1000,
                   scale: int = 10 ** 6, num_buckets: int = 32):
    """Per-document vocabulary coverage — the classic quality signal
    "what fraction of this doc's token occurrences are common corpus
    words": rows (doc_id, n_tokens, in_vocab, coverage_scaled) with
    ``coverage_scaled = in_vocab * scale // n_tokens`` (-1 sentinel for
    token-less docs).

    The vocabulary is the corpus's ``top_k`` words by (count desc,
    word asc) — deterministic, derivable by the SQL twin. Plan: one
    pass emits per-batch (word, count) partials (combiner: occurrences
    collapse in the batch); a word-hash bucket pass totals counts and
    HEADS each bucket to its local top-k, so the driver merge sees at
    most buckets×top_k rows (output-bounded); the merged vocab
    broadcasts once (``ray.put``) into the scoring pass."""
    import hashlib

    import pandas as pd

    import ray

    def wc_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(_TOKEN_RE.findall((text or "").lower()))
        ws = list(c.keys())
        bk = np.fromiter(
            (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
             % num_buckets for w in ws), np.int64, len(ws))
        return pa.table({"word": pa.array(ws, pa.string()),
                         "cnt": pa.array([c[w] for w in ws], pa.int64()),
                         "__b": pa.array(bk)})

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("word", sort=False)["cnt"].sum().reset_index()
        tot = tot.sort_values(["cnt", "word"],
                              ascending=[False, True]).head(top_k)
        tot["cnt"] = tot["cnt"].astype(np.int64)
        return tot

    partials = (docs.map_batches(wc_partial, batch_format="pyarrow")
                .groupby("__b").map_groups(bucket_topk,
                                           batch_format="pandas")
                .to_pandas())
    vocab = (partials.sort_values(["cnt", "word"],
                                  ascending=[False, True])
             .head(top_k)["word"])
    vref = ray.put(frozenset(vocab))

    def score(t: pa.Table) -> pa.Table:
        vs = ray.get(vref)
        ids, nt, iv = [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column(text_col).to_pylist()):
            toks = _TOKEN_RE.findall((text or "").lower())
            ids.append(did)
            nt.append(len(toks))
            iv.append(sum(1 for w in toks if w in vs))
        nt_a = np.asarray(nt, np.int64)
        iv_a = np.asarray(iv, np.int64)
        cov = np.where(nt_a > 0, (iv_a * scale) // np.maximum(nt_a, 1),
                       -1).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(nt_a),
                         "in_vocab": pa.array(iv_a),
                         "coverage_scaled": pa.array(cov)})

    return docs.map_batches(score, batch_format="pyarrow")

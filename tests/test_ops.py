"""Training-data ops tests: dedup flavors, similarity search, text
analysis, multimodal plumbing. Inputs: /root/testdata documents +
planted near-duplicates."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table(f"{SF}/documents.parquet")
    df = t.to_pandas()
    base = int(df["doc_id"].max()) + 1
    extra = []
    # exact duplicates of docs 0 and 1
    extra.append({"doc_id": base + 0, "text": df.loc[0, "text"], "lang": "en",
                  "source": "dup", "n_chars": len(df.loc[0, "text"])})
    extra.append({"doc_id": base + 1, "text": df.loc[1, "text"], "lang": "en",
                  "source": "dup", "n_chars": len(df.loc[1, "text"])})
    # near-duplicate: doc 2 with one word appended
    nd = df.loc[2, "text"] + " appended"
    extra.append({"doc_id": base + 2, "text": nd, "lang": "en",
                  "source": "dup", "n_chars": len(nd)})
    full = pd.concat([df, pd.DataFrame(extra)], ignore_index=True)
    return rd.from_pandas(full), full, base


def test_exact_dedup_keep_min(docs_with_dups):
    from wikilinks_ray.ops.dedup import exact_dedup_keep_min

    ds, full, base = docs_with_dups
    kept = sorted(r["doc_id"] for r in exact_dedup_keep_min(ds).take_all())
    assert base + 0 not in kept and base + 1 not in kept  # dup loses to min id
    assert 0 in kept and 1 in kept
    assert base + 2 in kept  # near-dup is NOT an exact dup
    assert len(kept) == full["text"].nunique()


def ngram_jaccard_oracle(a: str, b: str, k: int = 3) -> float:
    import re

    def sh(t):
        toks = re.findall(r"\w+", t.lower())
        if len(toks) < k:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B) if A | B else 0.0


def test_ngram_jaccard_pairs_exact(docs_with_dups):
    from wikilinks_ray.ops.dedup import ngram_jaccard_pairs

    ds, full, base = docs_with_dups
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(ds, threshold=0.5,
                                        num_partitions=4).take_all()}
    assert got[(0, base + 0)] == pytest.approx(1.0)
    assert got[(1, base + 1)] == pytest.approx(1.0)
    j = ngram_jaccard_oracle(full.loc[2, "text"], full.loc[full.index[-1], "text"])
    assert got[(2, base + 2)] == pytest.approx(j)
    # no false positives below threshold
    for (a, b), v in got.items():
        assert v >= 0.5
        assert v == pytest.approx(
            ngram_jaccard_oracle(full.set_index("doc_id").loc[a, "text"],
                                 full.set_index("doc_id").loc[b, "text"]))


def test_ngram_jaccard_no_self_pairs_on_duplicate_rows(ray_session):
    """Duplicate (doc_id, text) input rows must not emit (a, a)
    self-pairs scoring jaccard~1 (ADVICE r2: the posting-list pass needs
    the same strict a<b guard the minhash path has)."""
    import ray.data as rd

    from wikilinks_ray.ops.dedup import ngram_jaccard_pairs

    rows = [{"doc_id": i, "text": f"the quick brown fox {i} jumps over"}
            for i in range(8)]
    dup = rd.from_items(rows + rows)  # every doc appears twice
    pairs = ngram_jaccard_pairs(dup, threshold=0.1,
                                num_partitions=2).take_all()
    assert all(r["a"] < r["b"] for r in pairs)


def test_minhash_lsh_finds_planted_dups(docs_with_dups):
    from wikilinks_ray.ops.dedup import minhash_lsh_candidates

    ds, _full, base = docs_with_dups
    cand = {(r["a"], r["b"]) for r in minhash_lsh_candidates(ds).take_all()}
    # identical docs agree on every band -> guaranteed candidates
    assert (0, base + 0) in cand
    assert (1, base + 1) in cand
    # high-jaccard near-dup found with near-certainty at b=32, r=4
    assert (2, base + 2) in cand


def test_simhash_properties(docs_with_dups):
    from wikilinks_ray.ops.dedup import simhash_signatures, simhash_near_dup_pairs

    ds, _full, base = docs_with_dups
    sigs = pd.DataFrame(simhash_signatures(ds).take_all())
    by_id = dict(zip(sigs["doc_id"], sigs["simhash"]))
    assert by_id[0] == by_id[base + 0]  # identical text, identical simhash
    ham = bin(int(by_id[2]) ^ int(by_id[base + 2])).count("1")
    assert ham <= 8  # one appended word flips few bits
    pairs = simhash_near_dup_pairs(sigs, max_hamming=3)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, base + 0) in got and (1, base + 1) in got


def test_embedding_near_dup_vs_bruteforce(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.dedup import embedding_near_dup_pairs

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = {(r["a"], r["b"]) for r in
           embedding_near_dup_pairs(emb, threshold=0.9).take_all()}
    df = emb.to_pandas()
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    ids = df["vec_id"].to_numpy()
    want = set()
    for i, j in zip(*np.nonzero(S >= 0.9)):
        if ids[i] < ids[j]:
            want.add((int(ids[i]), int(ids[j])))
    assert got == want


def test_embedding_near_dup_lsh_path(ray_session):
    """The LSH-bucketed scale path (forced via broadcast_limit=0): every
    found pair is exact-verified (subset of brute force), and recall on
    planted high-cosine near-dups is high at the defaults."""
    import ray.data as rd

    from wikilinks_ray.ops.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((200, 32))
    # plant 40 near-dup copies: tiny perturbations of the first 40 rows
    dup = base[:40] + 0.02 * rng.standard_normal((40, 32))
    M = np.vstack([base, dup])
    ids = np.arange(len(M))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(M.astype(np.float64))),
    })).repartition(4)

    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    want = {(int(ids[i]), int(ids[j]))
            for i, j in zip(*np.nonzero(S >= 0.95)) if ids[i] < ids[j]}
    planted = {(i, 200 + i) for i in range(40)} & want
    assert len(planted) >= 35  # perturbation keeps cosine >= .95

    got_rows = embedding_near_dup_pairs(
        emb, threshold=0.95, broadcast_limit=0).take_all()
    got = {(r["a"], r["b"]) for r in got_rows}
    assert got <= want  # no false positives (cosine verified in-bucket)
    assert len(got & planted) / len(planted) >= 0.9  # recall
    # cosines are the true values
    for r in got_rows[:10]:
        i = np.flatnonzero(ids == r["a"])[0]
        j = np.flatnonzero(ids == r["b"])[0]
        assert abs(r["cosine"] - S[i, j]) < 1e-9


def test_brute_force_top_k_exact(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.similarity import brute_force_top_k

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    df = emb.to_pandas()
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    queries = M[:5]
    got = brute_force_top_k(emb, queries, k=10).to_pandas()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    S = Qn @ Mn.T
    ids = df["vec_id"].to_numpy()
    for qid in range(5):
        want = [int(ids[i]) for i in
                sorted(range(len(ids)), key=lambda i: (-S[qid, i], ids[i]))[:10]]
        rows = got[got["query_id"] == qid].sort_values("rank")
        assert rows["vec_id"].tolist() == want
        assert rows["rank"].tolist() == list(range(1, 11))
    # self is its own nearest neighbor
    assert got[(got["query_id"] == 0) & (got["rank"] == 1)]["vec_id"].iloc[0] == ids[0]


def test_lsh_top_k_recall(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.similarity import brute_force_top_k, lsh_top_k

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    df = emb.to_pandas()
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    queries = M[:10]
    exact = brute_force_top_k(emb, queries, k=5).to_pandas()
    approx = lsh_top_k(emb, queries, k=5, n_planes=8, n_tables=4).to_pandas()
    recalls = []
    for qid in range(10):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # multi-probe LSH, clustered data


def test_lsh_top_k_bounded_emission(ray_session):
    """Skewed-bucket fixture: every vector collides with every query's
    probed buckets. The candidate stream must still be truncated to the
    per-batch per-query top-k, so the driver receives at most
    k * n_queries * n_batches rows — not O(all colliding rows)."""
    import ray.data as rd

    from wikilinks_ray.ops.similarity import lsh_candidates, lsh_top_k

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    # 2000 near-identical vectors: all land in the same LSH buckets.
    M = base[None, :] + 1e-3 * rng.standard_normal((2000, 16))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(2000), pa.int64()),
        "embedding": pa.array(list(M), pa.list_(pa.float64())),
    })).repartition(4)
    queries = M[:3]
    k = 5
    cands = lsh_candidates(emb, queries, k=k, n_planes=8, n_tables=4).materialize()
    n_batches = cands.num_blocks()  # 500-row blocks -> one batch per block
    assert cands.count() <= k * len(queries) * n_batches
    # and the merged result is still a full top-k per query
    out = lsh_top_k(emb, queries, k=k, n_planes=8, n_tables=4).to_pandas()
    assert (out.groupby("query_id")["rank"].max() == k).all()


def test_topk_driver_collection_bounded(ray_session):
    """The global top-k reduce runs in the cluster: the driver only
    collects the final <= k * n_queries rows (round-4 verdict
    "What's wrong #2"). _finalize_topk's input may be k*Q*n_batches
    candidate rows; its OUTPUT — the only thing take_all'd — is the
    ranked result itself."""
    import ray.data as rd

    from wikilinks_ray.ops.similarity import brute_force_top_k, lsh_top_k

    rng = np.random.default_rng(11)
    M = rng.standard_normal((600, 8))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(600), pa.int64()),
        "embedding": pa.array(list(M), pa.list_(pa.float64())),
    })).repartition(6)
    queries, k = M[:4], 7
    bf = brute_force_top_k(emb, queries, k=k)
    assert bf.num_rows == k * len(queries)
    ls = lsh_top_k(emb, queries, k=k, n_planes=6, n_tables=3)
    assert ls.num_rows <= k * len(queries)


def test_topk_merge_routes_identical(ray_session):
    """_finalize_topk's size gate: the driver-merge leg (small
    candidate streams) and the forced cluster grouped_topk leg
    (driver_merge_limit=0) must produce byte-identical ranked rows."""
    import ray
    import ray.data as rd

    from wikilinks_ray.ops import similarity as sim

    rng = np.random.default_rng(23)
    M = rng.standard_normal((500, 8))
    # duplicated vectors exercise the (cosine desc, vec_id asc) tie-break
    M[100:110] = M[:10]
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(500), pa.int64()),
        "embedding": pa.array(list(M), pa.list_(pa.float64())),
    })).repartition(5)
    queries, k = M[:6], 9

    def score_stream():
        Q = sim._normalize(np.asarray(queries, dtype=np.float64))
        qref = ray.put(Q)

        def score(t):
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            Mb = sim._normalize(sim.unpack_embeddings(t, "embedding"))
            S = ray.get(qref) @ Mb.T
            kk = min(k, S.shape[1])
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            return pa.table({
                "query_id": pa.array(
                    np.repeat(np.arange(S.shape[0]), kk), pa.int64()),
                "vec_id": pa.array(ids[idx.ravel()].astype(np.int64),
                                   pa.int64()),
                "cosine": pa.array(
                    np.take_along_axis(S, idx, axis=1).ravel(),
                    pa.float64()),
            })

        return emb.map_batches(score, batch_format="pyarrow")

    small = sim._finalize_topk(score_stream(), k)
    forced = sim._finalize_topk(score_stream(), k, driver_merge_limit=0)
    assert small.schema == forced.schema
    assert small.equals(forced)
    assert small.num_rows == k * len(queries)


def test_unpack_embeddings_zero_copy_paths():
    """list<double>, fixed_size_list, sliced chunks, and the ragged /
    null fallbacks must all produce the same (n, d) float64 matrix."""
    from wikilinks_ray.ops.similarity import unpack_embeddings

    rng = np.random.default_rng(3)
    M = rng.standard_normal((10, 4))
    want = M.astype(np.float64)

    t_list = pa.table({"e": pa.array(list(M), pa.list_(pa.float64()))})
    np.testing.assert_array_equal(unpack_embeddings(t_list, "e"), want)

    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(M.ravel(), pa.float64()), 4)
    t_fsl = pa.table({"e": fsl})
    np.testing.assert_array_equal(unpack_embeddings(t_fsl, "e"), want)

    # sliced (non-zero offset) table — offsets must be respected
    np.testing.assert_array_equal(
        unpack_embeddings(t_list.slice(3, 5), "e"), want[3:8])
    np.testing.assert_array_equal(
        unpack_embeddings(t_fsl.slice(3, 5), "e"), want[3:8])

    # float32 lists upcast
    t32 = pa.table({"e": pa.array([r.astype(np.float32) for r in M],
                                  pa.list_(pa.float32()))})
    np.testing.assert_allclose(unpack_embeddings(t32, "e"),
                               want.astype(np.float32))

    # ragged fallback
    t_rag = pa.table({"e": pa.array([[1.0, 2.0], [3.0]],
                                    pa.list_(pa.float64()))})
    import pytest as _pytest
    with _pytest.raises(ValueError):
        unpack_embeddings(t_rag, "e")

    # empty
    assert unpack_embeddings(t_list.slice(0, 0), "e").shape == (0, 0)


def test_ivf_top_k_stream_and_index_paths(ray_session, tmp_path):
    """IVF-flat ANN: (1) recall vs exact with the deterministic
    first-by-id quantizer (what the SQL oracle mirrors), (2) trained
    spherical-k-means centroids, (3) the materialized-index path must
    return the same ids/ranks as the streaming path while reading ONLY
    the probed cells' files."""
    import ray.data as rd

    from wikilinks_ray.ops.similarity import (brute_force_top_k,
                                              build_ivf_index, ivf_top_k,
                                              train_centroids)

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    df = emb.to_pandas().sort_values("vec_id")
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    queries = M[:5]
    exact = brute_force_top_k(emb, queries, k=5).to_pandas()

    def recall(approx):
        r = []
        for qid in range(5):
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            r.append(len(e & a) / len(e))
        return float(np.mean(r))

    stream = ivf_top_k(emb, queries, k=5, n_cells=16, n_probe=4).to_pandas()
    assert recall(stream) >= 0.8

    C = train_centroids(emb, 16, iters=3)
    assert C.shape == (16, M.shape[1])
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
    trained = ivf_top_k(emb, queries, k=5, n_cells=16, n_probe=4,
                        centroids=C).to_pandas()
    assert recall(trained) >= 0.8

    idx_dir = str(tmp_path / "ivf")
    build_ivf_index(emb, C, idx_dir)
    cells_on_disk = sorted(int(d.split("=")[1]) for d in os.listdir(idx_dir)
                           if d.startswith("cellp="))
    assert len(cells_on_disk) > 1  # really partitioned by cell
    indexed = ivf_top_k(idx_dir, queries, k=5, n_probe=4,
                        centroids=C).to_pandas()
    # identical ids/ranks; cosine may differ by float blocking order
    assert (indexed[["query_id", "rank", "vec_id"]].values
            == trained[["query_id", "rank", "vec_id"]].values).all()
    assert np.allclose(indexed["cosine"], trained["cosine"], atol=1e-12)

    # pruning: with one probe per query, the scanned cells are exactly
    # the probed ones — every returned id belongs to a probed cell
    one = ivf_top_k(idx_dir, queries[:1], k=5, n_probe=1,
                    centroids=C).to_pandas()
    Qn = queries[:1] / np.linalg.norm(queries[:1], axis=1, keepdims=True)
    probed = int(np.argmax(Qn @ C.T))
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    assigned = np.argmax(Mn @ C.T, axis=1)
    ids = df["vec_id"].to_numpy()
    cell_of = dict(zip(ids.tolist(), assigned.tolist()))
    assert all(cell_of[v] == probed for v in one["vec_id"])


def test_text_analyzer(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.text import TextAnalyzer, token_count_expr

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    out = docs.map_batches(TextAnalyzer, batch_format="pyarrow",
                           concurrency=2).to_pandas()
    src = docs.to_pandas().set_index("doc_id")
    assert len(out) == len(src)
    for _, r in out.head(20).iterrows():
        assert r["token_count"] == token_count_expr(src.loc[r["doc_id"], "text"])
        assert 0.0 <= r["quality_score"] <= 1.0
    # deterministic fingerprints across runs
    out2 = docs.map_batches(TextAnalyzer, batch_format="pyarrow",
                            concurrency=2).to_pandas()
    m1 = dict(zip(out["doc_id"], out["fingerprint"]))
    m2 = dict(zip(out2["doc_id"], out2["fingerprint"]))
    assert m1 == m2


def test_lang_pred_heuristics(ray_session):
    from wikilinks_ray.ops.text import TextAnalyzer

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "text": pa.array(["the quick brown fox", "straße über münchen",
                                    "château à paris", "mañana señor", "你好 世界"])})
    out = TextAnalyzer()(t).to_pandas()
    assert out["lang_pred"].tolist() == ["en", "de", "fr", "es", "zh"]


def test_multimodal_fake_pipeline(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.multimodal import (
        DecodeImage, ResizeImage, FrameSampler, make_fake_image,
    )

    rows = [{"media_id": i, "kind": "image", "mime": "image/fake",
             "payload": make_fake_image(i, 32, 16), "width": 32, "height": 16,
             "duration_ms": -1} for i in range(20)]
    ds = rd.from_items(rows)
    dec = ds.map_batches(DecodeImage(fake=True), batch_format="pyarrow",
                         batch_size=4, concurrency=2).to_pandas()
    assert len(dec) == 20
    assert (dec["width"] == 32).all() and (dec["height"] == 16).all()
    # deterministic payloads -> deterministic phash
    assert dec.sort_values("media_id")["phash"].tolist() == \
        [DecodeImage(fake=True)(pa.table({
            "media_id": pa.array([i], pa.int64()),
            "payload": pa.array([make_fake_image(i, 32, 16)], pa.binary())
        })).to_pandas()["phash"].iloc[0] for i in range(20)]

    small = ds.map_batches(ResizeImage((8, 8), fake=True), batch_format="pyarrow",
                           batch_size=4, concurrency=2).to_pandas()
    redec = DecodeImage(fake=True)(pa.table({
        "media_id": pa.array(small["media_id"].tolist(), pa.int64()),
        "payload": pa.array(small["payload"].tolist(), pa.binary()),
    })).to_pandas()
    assert (redec["width"] == 8).all() and (redec["height"] == 8).all()

    video = b"".join(make_fake_image(7, 4, 4, seed=s) for s in range(6))
    vds = rd.from_items([{"media_id": 7, "payload": video}])
    frames = vds.map_batches(FrameSampler(every=2, fake=True),
                             batch_format="pyarrow", concurrency=1).to_pandas()
    assert frames["frame_index"].tolist() == [0, 2, 4]


def test_multimodal_real_decode_raises(ray_session):
    from wikilinks_ray.ops.multimodal import DecodeImage, make_fake_image

    if DecodeImage(fake=False)._pil_image is not None:
        pytest.skip("PIL installed: JPEG/PNG decode for real on this box")
    with pytest.raises(NotImplementedError, match="PIL"):
        DecodeImage(fake=False)(pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([make_fake_image(1, 4, 4)], pa.binary()),
        }))


def test_multimodal_png_decode_via_pil(ray_session):
    """Runs only where PIL exists (skipped in this container): a PNG
    round-trips through the real optional-dependency codec path."""
    PIL = pytest.importorskip("PIL")
    import io

    from wikilinks_ray.ops.multimodal import DecodeImage

    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    buf = io.BytesIO()
    PIL.Image.fromarray(px, mode="L").save(buf, format="PNG")
    out = DecodeImage(fake=False)(pa.table({
        "media_id": pa.array([3], pa.int64()),
        "payload": pa.array([buf.getvalue()], pa.binary()),
    })).to_pandas()
    assert out.loc[0, "width"] == 8 and out.loc[0, "height"] == 6
    assert abs(out.loc[0, "mean_intensity"] - px.mean()) < 1e-9


def test_multimodal_compressed_audio_raises_without_pyav():
    from wikilinks_ray.ops.multimodal import DecodeAudio

    dec = DecodeAudio()
    if dec._av is not None:
        pytest.skip("pyav installed: mp3 decodes for real on this box")
    with pytest.raises(NotImplementedError, match="pyav"):
        dec(pa.table({
            "media_id": pa.array([1], pa.int64()),
            # ID3v2-tagged mp3-ish header — not RIFF/WAVE
            "payload": pa.array([b"ID3\x04\x00" + b"\x00" * 32], pa.binary()),
        }))


def test_multimodal_video_sampler_raises_without_pyav():
    from wikilinks_ray.ops.multimodal import FrameSampler

    try:
        import av  # noqa: F401

        pytest.skip("pyav installed: video samples for real on this box")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pyav"):
        FrameSampler(every=2, fake=False)


def test_multimodal_mp3_decode_via_pyav(ray_session):
    """Runs only where pyav exists (skipped in this container): an MP3
    encoded from a known tone round-trips through the probed codec and
    reports sane rate/duration/energy."""
    av = pytest.importorskip("av")
    import io as _io

    from wikilinks_ray.ops.multimodal import DecodeAudio

    rate = 16_000
    t = np.arange(rate, dtype=np.float64) / rate  # 1 s
    tone = (np.sin(2 * np.pi * 440 * t) * 20_000).astype(np.int16)
    buf = _io.BytesIO()
    with av.open(buf, "w", format="mp3") as container:
        stream = container.add_stream("mp3", rate=rate)
        frame = av.AudioFrame.from_ndarray(tone.reshape(1, -1),
                                           format="s16", layout="mono")
        frame.sample_rate = rate
        for packet in stream.encode(frame):
            container.mux(packet)
        for packet in stream.encode(None):
            container.mux(packet)
    out = DecodeAudio()(pa.table({
        "media_id": pa.array([9], pa.int64()),
        "payload": pa.array([buf.getvalue()], pa.binary()),
    })).to_pandas()
    assert out.loc[0, "sample_rate"] == rate
    assert 900 <= out.loc[0, "duration_ms"] <= 1200  # encoder padding
    assert out.loc[0, "rms"] > 1000  # the tone's energy survived


def test_windows_ops(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.windows import (
        session_windows, sliding_windows, tumbling_windows,
    )

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    df = ev.to_pandas()

    tw = tumbling_windows(ev, size_s=3600).to_pandas()
    # oracle: pandas global groupby
    w = (df["ts"].astype("int64") // 10**6) // 3600
    want = df.groupby(["user_id", w]).size()
    got = tw.set_index(["user_id", "window_start"])["n_events"].sort_index()
    assert (got == want.sort_index()).all()

    sw = session_windows(ev, gap_s=3600).to_pandas()
    # per-session event counts sum to the total; durations non-negative
    assert sw["n_events"].sum() == len(df)
    assert (sw["duration_us"] >= 0).all()
    assert (sw.groupby("user_id")["session_id"].min() == 1).all()

    sl = sliding_windows(ev, size_s=3600, hop_s=1800).to_pandas()
    # every event lands in exactly size/hop = 2 windows
    assert sl["n_events"].sum() == 2 * len(df)


def test_simhash_distributed_matches_driver_finisher(docs_with_dups):
    from wikilinks_ray.ops.dedup import (
        simhash_near_dup_pairs,
        simhash_near_dup_pairs_ds,
        simhash_signatures,
    )

    ds, _full, base = docs_with_dups
    sigs = simhash_signatures(ds)
    want = simhash_near_dup_pairs(pd.DataFrame(sigs.take_all()), max_hamming=3)
    got = pd.DataFrame(simhash_near_dup_pairs_ds(sigs, max_hamming=3).take_all())
    w = set(zip(want["a"], want["b"], want["hamming"]))
    g = set(zip(got["a"], got["b"], got["hamming"]))
    assert g == w
    assert (0, base + 0, 0) in g  # identical docs, hamming 0


def test_simhash_overcap_bucket_exact(ray_session):
    """A pigeonhole bucket LARGER than max_bucket must still yield the
    exact hamming<=k pair set (the old skew cap silently dropped whole
    buckets — 20% recall loss at sf0.1). Fixture: 64 signatures that all
    agree on segment 0 (bucket size 64 >> max_bucket=8), varying
    elsewhere, incl. an identical-signature clump (the all-pairs base
    case) and a non-discriminative-sub-segment clump (the single-branch
    descent)."""
    import pyarrow as pa

    import ray.data
    from wikilinks_ray.ops.dedup import simhash_near_dup_pairs_ds

    rng = np.random.default_rng(7)
    k = 3
    sigs = []
    # all agree on bits [0, 16) (segment 0 of the k=3 layout) => one
    # bucket of 64 docs in segment 0
    base_low = 0xABCD
    for i in range(48):
        high = int(rng.integers(0, 2**48, dtype=np.uint64))
        sigs.append((high << 16) | base_low)
    sigs += [((0xDEAD << 16) | base_low)] * 10  # identical clump
    near = (0xDEAD << 16) | base_low
    for b in (20, 30, 40):  # hamming 1 neighbours of the clump
        sigs.append(near ^ (1 << b))
    sigs.append(near ^ (1 << 20) ^ (1 << 30) ^ (1 << 40))  # hamming 3
    ids = np.arange(len(sigs), dtype=np.int64)
    sh = np.array(sigs, dtype=np.uint64)

    # brute-force oracle
    want = set()
    for i in range(len(sh)):
        x = sh[i] ^ sh
        pop = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                            axis=1).sum(axis=1)
        for j in np.nonzero(pop <= k)[0]:
            if i < j:
                want.add((int(ids[i]), int(ids[j]), int(pop[j])))

    t = pa.table({"doc_id": pa.array(ids), "simhash": pa.array(sh)})
    got = pd.DataFrame(simhash_near_dup_pairs_ds(
        ray.data.from_arrow(t), max_hamming=k, max_bucket=8).take_all())
    g = set(zip(got["a"], got["b"], got["hamming"]))
    assert g == want
    assert len(want) >= 45 + 10  # clump C(10,2) + neighbours at least


def test_curate_documents_pipeline(ray_session, tmp_path):
    """Curation = quality gate ∩ exact winners − near-dup losers, plus
    the partitioned (resumable) parquet write of kept rows."""
    import os

    import ray.data as rd

    from wikilinks_ray.ops.curate import curate_documents

    long_good = ("the quick brown fox jumps over the lazy dog and it "
                 "runs through the field of data " * 5)
    docs = [
        (1, long_good),                       # keeps
        (2, long_good),                       # exact dup of 1 -> dropped
        (3, long_good + " extra trailing words here"),  # near-dup -> b-loser
        (4, "short junk"),                    # fails quality/token gate
        (5, ("completely different content about graphs and rays and "
             "arrows flowing in the big stream of blocks " * 5)),  # keeps
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })).repartition(2)
    out = str(tmp_path / "curated")
    kept = curate_documents(ds, min_tokens=20, min_quality=0.3,
                            jaccard_threshold=0.5, num_partitions=2,
                            out_dir=out)
    ids = sorted(r["doc_id"] for r in kept.take_all())
    assert ids == [1, 5]
    # partitioned layout: bucket=K dirs, only kept rows inside
    buckets = [d for d in os.listdir(out) if d.startswith("bucket=")]
    assert buckets
    back = rd.read_parquet(out).to_pandas()
    assert sorted(back["doc_id"].tolist()) == [1, 5]


def test_curate_documents_minhash_leg(ray_session):
    """near_dup_method='minhash' (the web-scale switch) drops the same
    planted near-dup: identical docs agree on every band, so the LSH
    candidates cover the exact-jaccard losers on this fixture."""
    import ray.data as rd

    from wikilinks_ray.ops.curate import curate_documents

    long_good = ("the quick brown fox jumps over the lazy dog and it "
                 "runs through the field of data " * 5)
    other = ("completely different content about graphs and rays and "
             "arrows flowing in the big stream of blocks " * 5)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([long_good, long_good,
                          long_good + " extra trailing words here",
                          "short junk", other], pa.string()),
    })).repartition(2)
    kept = curate_documents(ds, min_tokens=20, min_quality=0.3,
                            num_partitions=2, near_dup_method="minhash")
    assert sorted(r["doc_id"] for r in kept.take_all()) == [1, 5]


def test_pgm_codec_real_decode(ray_session):
    """Binary PGM decodes for REAL (pure numpy — no external codec):
    encode -> distributed decode -> features match the source pixels."""
    import ray.data as rd

    from wikilinks_ray.ops.multimodal import (
        DecodeImage,
        ResizeImage,
        decode_pgm,
        encode_pgm,
    )

    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, size=(16 + i, 24 + i), dtype=np.uint8)
            for i in range(6)}
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(list(imgs), pa.int64()),
        "payload": pa.array([encode_pgm(m) for m in imgs.values()], pa.binary()),
    }))
    out = ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=2,
                         concurrency=2).to_pandas().set_index("media_id")
    for i, m in imgs.items():
        assert (out.loc[i, "height"], out.loc[i, "width"]) == m.shape
        assert out.loc[i, "mean_intensity"] == pytest.approx(m.mean())
    # round-trip sanity of the raw codec
    w, h, px = decode_pgm(encode_pgm(imgs[0]))
    assert (h, w) == imgs[0].shape and (px.reshape(h, w) == imgs[0]).all()
    # resize keeps the container format and target dims
    rz = ds.map_batches(ResizeImage(target=(8, 8)), batch_format="pyarrow",
                        concurrency=2).to_pandas()
    for p in rz["payload"]:
        w, h, px = decode_pgm(p)
        assert (w, h) == (8, 8) and len(px) == 64


def _png_with_filter(px: np.ndarray, ftype: int, ctype: int = 0) -> bytes:
    """Test-side reference encoder: apply ONE filter type to every
    scanline of an (h, w[, ch]) uint8 image — a valid PNG whatever the
    filter, so it exercises decode_png's filter reconstructions without
    needing PIL."""
    import struct
    import zlib

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    bpp = ch
    lines = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        cur = px[y].ravel().astype(np.int32)
        f = np.empty(w * ch, np.int32)
        for x in range(w * ch):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
            f[x] = (cur[x] - pred) & 0xFF
        lines.append(ftype)
        lines.extend(f.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


def test_png_codec_real_decode(ray_session):
    """8-bit PNG decodes for REAL (stdlib zlib + numpy): round-trip,
    every scanline filter, RGB/RGBA->luma parity with PIL's
    convert('L'), distributed decode, and honest gap errors."""
    import ray.data as rd

    from wikilinks_ray.ops.multimodal import (
        DecodeImage,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(17)
    gray = rng.integers(0, 256, size=(13, 19), dtype=np.uint8)
    # round-trip via our encoder
    w, h, px = decode_png(encode_png(gray))
    assert (h, w) == gray.shape and (px.reshape(h, w) == gray).all()
    # every filter type reconstructs, grayscale and RGBA
    rgba = rng.integers(0, 256, size=(9, 7, 4), dtype=np.uint8)
    for f in range(5):
        w, h, px = decode_png(_png_with_filter(gray, f))
        assert (px.reshape(h, w) == gray).all(), f"gray filter {f}"
        w, h, px = decode_png(_png_with_filter(rgba, f, ctype=6))
        rgb = rgba[:, :, :3].astype(np.int64)
        want = ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1]
                 + 114 * rgb[:, :, 2]) // 1000).astype(np.uint8)
        assert (px.reshape(h, w) == want).all(), f"rgba filter {f}"
    # RGB luma (ITU-R 601 like PIL convert('L'))
    rgb3 = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    w, h, px = decode_png(_png_with_filter(rgb3, 4, ctype=2))
    r = rgb3.astype(np.int64)
    want = ((299 * r[:, :, 0] + 587 * r[:, :, 1]
             + 114 * r[:, :, 2]) // 1000).astype(np.uint8)
    assert (px.reshape(h, w) == want).all()
    # distributed decode through the actor stage, PNG auto-detected
    imgs = {i: rng.integers(0, 256, size=(8 + i, 11 + i), dtype=np.uint8)
            for i in range(4)}
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(list(imgs), pa.int64()),
        "payload": pa.array([encode_png(m) for m in imgs.values()],
                            pa.binary()),
    }))
    out = ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=2,
                         concurrency=2).to_pandas().set_index("media_id")
    for i, m in imgs.items():
        assert (out.loc[i, "height"], out.loc[i, "width"]) == m.shape
        assert out.loc[i, "mean_intensity"] == pytest.approx(m.mean())
    # corruption detection + the remaining honest gap (low bit depth)
    good = bytearray(encode_png(gray))
    good[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    import struct as _s
    import zlib as _z
    sig = b"\x89PNG\r\n\x1a\n"

    def _chunk(typ, data):
        return (_s.pack(">I", len(data)) + typ + data
                + _s.pack(">I", _z.crc32(typ + data)))

    onebit = (sig + _chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 1, 0, 0, 0, 0))
              + _chunk(b"IDAT", _z.compress(b"\0\0\0\0"))
              + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="depth"):
        decode_png(onebit)

    # PALETTE (colortype 3): indices + PLTE resolve to RGB then luma
    pal_rng = np.random.default_rng(5)
    palette = pal_rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = pal_rng.integers(0, 16, (9, 11), dtype=np.uint8)
    raw = np.zeros((9, 11 + 1), np.uint8)
    raw[:, 1:] = idx
    paletted = (sig
                + _chunk(b"IHDR", _s.pack(">IIBBBBB", 11, 9, 8, 3, 0, 0, 0))
                + _chunk(b"PLTE", palette.tobytes())
                + _chunk(b"IDAT", _z.compress(raw.tobytes()))
                + _chunk(b"IEND", b""))
    w, h, px = decode_png(paletted)
    rgbp = palette[idx].astype(np.int64)
    wantp = ((299 * rgbp[:, :, 0] + 587 * rgbp[:, :, 1]
              + 114 * rgbp[:, :, 2]) // 1000).astype(np.uint8)
    assert (w, h) == (11, 9) and (px.reshape(9, 11) == wantp).all()
    # out-of-range palette index is corruption, not garbage pixels
    bad_idx = raw.copy()
    bad_idx[0, 1] = 200
    bad_pal = (sig
               + _chunk(b"IHDR", _s.pack(">IIBBBBB", 11, 9, 8, 3, 0, 0, 0))
               + _chunk(b"PLTE", palette.tobytes())
               + _chunk(b"IDAT", _z.compress(bad_idx.tobytes()))
               + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(bad_pal)

    # ADAM7 interlace: 7 independently-filtered sub-images; compare to
    # the plain encoding of the same pixels (odd dims stress pass grid)
    from wikilinks_ray.ops.multimodal import _ADAM7
    for dims in ((13, 17), (8, 8), (3, 5), (1, 1), (2, 10)):
        src = pal_rng.integers(0, 256, dims, dtype=np.uint8)
        hh, ww = dims
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = src[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            rows = np.zeros((sub.shape[0], sub.shape[1] + 1), np.uint8)
            rows[:, 1:] = sub
            parts.append(rows.tobytes())
        inter = (sig
                 + _chunk(b"IHDR", _s.pack(">IIBBBBB", ww, hh, 8, 0, 0, 0, 1))
                 + _chunk(b"IDAT", _z.compress(b"".join(parts)))
                 + _chunk(b"IEND", b""))
        w, h, px = decode_png(inter)
        assert (w, h) == (ww, hh), dims
        assert (px.reshape(hh, ww) == src).all(), f"adam7 {dims}"


def _encode_jpeg_color_420(gray: np.ndarray, quality: int = 90,
                           restart_mcus: int = 0) -> bytes:
    """Test-side 3-component 4:2:0 baseline encoder: Y carries the
    image, Cb/Cr are flat 128 (zero after level shift). Exercises MCU
    interleaving, chroma entropy passes, subsampled geometry and
    restart markers in decode_jpeg_baseline — the shapes the grayscale
    production encoder never emits."""
    import struct

    from wikilinks_ray.ops import jpeg as J

    h, w = gray.shape
    q = J._quality_table(quality)
    H, W = -(-h // 16) * 16, -(-w // 16) * 16
    ypad = np.pad(gray.astype(np.float64) - 128.0,
                  ((0, H - h), (0, W - w)), mode="edge")
    dc = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    ac = J._canonical_codes(J._AC_BITS, J._AC_VALS)
    bw = J._BitWriter()
    pred = [0, 0, 0]
    zero_zz = np.zeros(64, np.int64)
    n = rst = 0
    for my in range(H // 16):
        for mx in range(W // 16):
            if restart_mcus and n and n % restart_mcus == 0:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0, 0, 0]
            for by in range(2):
                for bx in range(2):
                    blk = ypad[my * 16 + by * 8:my * 16 + by * 8 + 8,
                               mx * 16 + bx * 8:mx * 16 + bx * 8 + 8]
                    coeff = J._A @ blk @ J._A.T
                    zz = np.rint(coeff / q.reshape(8, 8)) \
                        .astype(np.int64).ravel()[J._ZIGZAG]
                    pred[0] = J._write_block(bw, zz, pred[0], dc, ac)
            for ci in (1, 2):
                pred[ci] = J._write_block(bw, zero_zz, pred[ci], dc, ac)
            n += 1
    data = bw.flush()

    def seg(m, body):
        return struct.pack(">BBH", 0xFF, m, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in q[J._ZIGZAG]))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xC4, bytes([0x00] + J._DC_BITS) + bytes(J._DC_VALS))
    out += seg(0xC4, bytes([0x10] + J._AC_BITS) + bytes(J._AC_VALS))
    if restart_mcus:
        out += seg(0xDD, struct.pack(">H", restart_mcus))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += data + b"\xff\xd9"
    return bytes(out)


def test_jpeg_codec_real_decode(ray_session):
    """Baseline JPEG decodes for REAL (numpy DCT + canonical Huffman,
    tables read from the file): lossy round-trip within tight error,
    4:2:0 color MCU interleaving, restart intervals, distributed
    decode, and honest progressive rejection."""
    import ray.data as rd

    from wikilinks_ray.ops.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )
    from wikilinks_ray.ops.multimodal import DecodeImage

    y, x = np.mgrid[0:40, 0:56]
    img = (127 + 80 * np.sin(x / 9.0) * np.cos(y / 7.0)).astype(np.uint8)
    # grayscale round-trip at three qualities
    for q, tol in ((95, 3), (85, 5), (60, 9)):
        w, h, px = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=q))
        assert (w, h) == (56, 40)
        err = np.abs(px.reshape(h, w).astype(int) - img.astype(int))
        assert err.max() <= tol, f"q={q}: max err {err.max()}"
    # flat image is exact; pure noise at q100 is within 1
    flat = np.full((16, 16), 77, np.uint8)
    _, _, px = decode_jpeg_baseline(encode_jpeg_baseline(flat))
    assert (px == 77).all()
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    _, _, px = decode_jpeg_baseline(encode_jpeg_baseline(noise, quality=100))
    assert np.abs(px.reshape(24, 24).astype(int)
                  - noise.astype(int)).max() <= 1
    # 3-component 4:2:0 with interleaved MCUs; Y carries the image
    w, h, px = decode_jpeg_baseline(_encode_jpeg_color_420(img, quality=90))
    assert (w, h) == (56, 40)
    err = np.abs(px.reshape(h, w).astype(int) - img.astype(int))
    assert err.max() <= 5, f"color 4:2:0 max err {err.max()}"
    base = px
    # restart intervals reproduce the exact same pixels
    for ri in (1, 3):
        w, h, px = decode_jpeg_baseline(
            _encode_jpeg_color_420(img, quality=90, restart_mcus=ri))
        assert (px == base).all(), f"restart interval {ri} diverged"
    # distributed decode through the actor stage, JPEG auto-detected
    imgs = {i: (127 + 60 * np.sin((x[:24, :24] + i) / 5.0)).astype(np.uint8)
            for i in range(3)}
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(list(imgs), pa.int64()),
        "payload": pa.array([encode_jpeg_baseline(m, quality=95)
                             for m in imgs.values()], pa.binary()),
    }))
    out = ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=2,
                         concurrency=2).to_pandas().set_index("media_id")
    for i, m in imgs.items():
        assert (out.loc[i, "height"], out.loc[i, "width"]) == m.shape
        assert out.loc[i, "mean_intensity"] == pytest.approx(m.mean(), abs=2)
    # honest gap: arithmetic coding (SOF9) names PIL
    arith = bytearray(encode_jpeg_baseline(img))
    sof = arith.find(b"\xff\xc0")
    arith[sof + 1] = 0xC9
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg_baseline(bytes(arith))


def _encode_jpeg_progressive_gray(px: np.ndarray, quality: int = 90,
                                  split: int = 5) -> bytes:
    """Test-side PROGRESSIVE (SOF2) grayscale encoder with a 6-scan
    script exercising every progressive decode path: DC first (Al=1),
    DC refinement (Ah=1), AC first in two spectral bands (1..split,
    split+1..63, Al=1) with cross-block EOB runs, and AC refinement
    (Ah=1, Al=0) with correction bits, run-positioned new coefficients
    and EOB-run regions."""
    import struct

    from wikilinks_ray.ops import jpeg as J

    h, w = px.shape
    q = J._quality_table(quality)
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(px.astype(np.float64) - 128.0,
                    ((0, H - h), (0, W - w)), mode="edge")
    blocks = padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    coeff = np.einsum("ij,abjk,lk->abil", J._A, blocks, J._A)
    quant = np.rint(coeff / q.reshape(8, 8)).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, J._ZIGZAG]  # (nblocks, 64) zigzag
    dc = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    # progressive scans need EOBn symbols (r<<4, r=1..14) that Annex K's
    # sequential AC table lacks — ship a custom flat 8-bit table in DHT
    # (tables are read from the file, so this also exercises decode of
    # nonstandard tables)
    ac_vals = sorted([(r << 4) | s for r in range(16)
                      for s in range(1, 11)]
                     + [r << 4 for r in range(15)] + [0xF0])
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)  # all codes 8 bits long
    ac = J._canonical_codes(ac_bits, ac_vals)

    def pt(v, s):  # point transform: truncate toward zero
        return v >> s if v >= 0 else -((-v) >> s)

    def scan_dc_first(bw, al):
        pred = 0
        for b in range(len(zz)):
            v = int(zz[b, 0]) >> al  # DC point transform is ARITHMETIC
            # shift (T.81 F.1.4.1); only AC truncates toward zero
            diff = v - pred
            pred = v
            s = J._size_of(diff)
            c, ln = dc[s]
            bw.write(c, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def scan_dc_refine(bw, al):
        for b in range(len(zz)):
            bw.write((int(zz[b, 0]) >> al) & 1, 1)

    def flush_eobrun(bw, run, deferred):
        if run[0]:
            r = run[0].bit_length() - 1
            c, ln = ac[r << 4]
            bw.write(c, ln)
            if r:
                bw.write(run[0] - (1 << r), r)
            run[0] = 0
        for bit in deferred:
            bw.write(bit, 1)
        deferred.clear()

    def scan_ac_first(bw, ss, se, al):
        run, deferred = [0], []
        for b in range(len(zz)):
            band = [pt(int(zz[b, k]), al) for k in range(ss, se + 1)]
            nz = [i for i, v in enumerate(band) if v]
            if not nz:
                run[0] += 1
                if run[0] == 0x7FFF:
                    flush_eobrun(bw, run, deferred)
                continue
            flush_eobrun(bw, run, deferred)
            r = 0
            last = nz[-1]
            for i, v in enumerate(band[:last + 1]):
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    c, ln = ac[0xF0]
                    bw.write(c, ln)
                    r -= 16
                s = J._size_of(v)
                c, ln = ac[(r << 4) | s]
                bw.write(c, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                r = 0
            if last < len(band) - 1:
                run[0] += 1
        flush_eobrun(bw, run, deferred)

    def scan_ac_refine(bw, ss, se, ah, al):
        run, deferred = [0], []
        for b in range(len(zz)):
            band = [int(zz[b, k]) for k in range(ss, se + 1)]
            hist = [pt(v, ah) for v in band]
            now = [pt(v, al) for v in band]
            # last position with a NEW nonzero at this precision
            news = [i for i in range(len(band))
                    if hist[i] == 0 and now[i] != 0]
            last_new = news[-1] if news else -1
            r = 0
            pending: list[int] = []
            for i in range(len(band)):
                if i > last_new:
                    break
                if hist[i] != 0:
                    pending.append(abs(now[i]) & 1)
                elif now[i] != 0:
                    flush_eobrun(bw, run, deferred)
                    while r > 15:
                        c, ln = ac[0xF0]
                        bw.write(c, ln)
                        for bit in pending:
                            bw.write(bit, 1)
                        pending.clear()
                        r -= 16
                    c, ln = ac[(r << 4) | 1]
                    bw.write(c, ln)
                    bw.write(1 if now[i] > 0 else 0, 1)
                    for bit in pending:
                        bw.write(bit, 1)
                    pending.clear()
                    r = 0
                else:
                    r += 1
            # trailing region: correction bits ride the EOB run
            tail = [abs(now[i]) & 1 for i in range(max(last_new + 1, 0),
                                                   len(band))
                    if hist[i] != 0]
            if last_new < len(band) - 1 or tail:
                run[0] += 1
                deferred.extend(tail)
                if run[0] == 0x7FFF:
                    flush_eobrun(bw, run, deferred)
        flush_eobrun(bw, run, deferred)

    def seg(m, body):
        return struct.pack(">BBH", 0xFF, m, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in q[J._ZIGZAG]))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00] + J._DC_BITS) + bytes(J._DC_VALS))
    out += seg(0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals))
    scans = [
        ((0, 0, 0, 1), scan_dc_first, (1,)),
        ((0, 0, 1, 0), scan_dc_refine, (0,)),
        ((1, split, 0, 1), scan_ac_first, (1, split, 1)),
        ((split + 1, 63, 0, 1), scan_ac_first, (split + 1, 63, 1)),
        ((1, split, 1, 0), scan_ac_refine, (1, split, 1, 0)),
        ((split + 1, 63, 1, 0), scan_ac_refine, (split + 1, 63, 1, 0)),
    ]
    for (ss, se, ahh, all_), fn, args in scans:
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ahh << 4) | all_]))
        bw = J._BitWriter()
        fn(bw, *args)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_decode(ray_session):
    """SOF2 progressive decodes for REAL: a 6-scan spectral-selection +
    successive-approximation script (DC first/refine, two AC bands
    first/refine with EOB runs) must reconstruct pixels IDENTICAL to
    the same quantized coefficients decoded sequentially."""
    from wikilinks_ray.ops.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    y, x = np.mgrid[0:40, 0:56]
    img = (127 + 80 * np.sin(x / 9.0) * np.cos(y / 7.0)).astype(np.uint8)
    for q in (95, 75):
        w, h, seq = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=q))
        w2, h2, prog = decode_jpeg_baseline(
            _encode_jpeg_progressive_gray(img, quality=q))
        assert (w, h) == (w2, h2) == (56, 40)
        assert (seq == prog).all(), \
            f"q={q}: progressive != sequential (max diff " \
            f"{np.abs(seq.astype(int) - prog.astype(int)).max()})"
    # sparse high-frequency image drives long EOB runs in both AC bands
    sparse = np.full((48, 48), 100, np.uint8)
    sparse[8, 8] = 240
    sparse[40, 16] = 20
    _, _, seq = decode_jpeg_baseline(encode_jpeg_baseline(sparse, quality=90))
    _, _, prog = decode_jpeg_baseline(
        _encode_jpeg_progressive_gray(sparse, quality=90))
    assert (seq == prog).all()
    # pure noise: every coefficient populated, heavy refinement traffic
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, (32, 24), dtype=np.uint8)
    _, _, seq = decode_jpeg_baseline(encode_jpeg_baseline(noise, quality=85))
    _, _, prog = decode_jpeg_baseline(
        _encode_jpeg_progressive_gray(noise, quality=85))
    assert (seq == prog).all()


def _encode_flac_predictive_ms(left: np.ndarray, right: np.ndarray,
                               rate: int = 16000) -> bytes:
    """Test-side one-frame FLAC encoder using the shapes the lossless
    production encoder never emits: mid/side stereo decorrelation, a
    FIXED order-2 subframe with 2-partition rice residuals, and an LPC
    order-1 subframe with 5-bit rice + ONE wasted bit (side is kept
    even by construction). Exercises decode_flac's predictive paths."""
    import struct

    from wikilinks_ray.ops import flac as F

    n = len(left)
    assert n % 2 == 0
    mid = (left + right) >> 1
    side = left - right          # even by construction in the test
    assert (side % 2 == 0).all()
    out = bytearray(b"fLaC")
    siw = F._BitW()
    for v, b in ((n, 16), (n, 16), (0, 24), (0, 24), (rate, 20),
                 (1, 3), (15, 5), (n, 36)):
        siw.write(v, b)
    body = siw.bytes() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    bw = F._BitW()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)      # 16-bit blocksize-1 follows
    bw.write(0, 4)      # rate from STREAMINFO
    bw.write(10, 4)     # mid/side
    bw.write(0, 3)      # bps from STREAMINFO
    bw.write(0, 1)
    F._write_utf8_number(bw, 0)
    bw.write(n - 1, 16)
    hdr = bw.bytes()
    hdr += bytes([F.crc8(hdr)])
    body = F._BitW()
    # subframe 0: mid, bps 16, FIXED order 2, rice method 0, porder 1
    body.write(0, 1)
    body.write(8 + 2, 6)
    body.write(0, 1)
    body.write_signed(int(mid[0]), 16)
    body.write_signed(int(mid[1]), 16)
    res = mid[2:] - 2 * mid[1:-1] + mid[:-2]

    def rice_write(w, vals, param):
        for v in vals:
            u = (int(v) << 1) ^ (int(v) >> 63)  # zigzag (int64)
            w.write(1, (u >> param) + 1)        # unary: q zeros then 1
            if param:
                w.write(u & ((1 << param) - 1), param)

    body.write(0, 2)    # rice method 0 (4-bit params)
    body.write(1, 4)    # partition order 1
    half = n // 2
    p1, p2 = res[:half - 2], res[half - 2:]
    for part in (p1, p2):
        param = max(1, int(np.ceil(np.log2(
            max(2.0, 2.0 * np.abs(part).mean())))))
        body.write(param, 4)
        rice_write(body, part, param)
    # subframe 1: side, bps 17 (side=+1), LPC order 1, wasted bit 1
    body.write(0, 1)
    body.write(32 + 0, 6)   # LPC order 1 -> type 32
    body.write(1, 1)        # wasted-bits flag
    # k=1 wasted bits encodes as unary k-1 = "1" (a single 1-bit)
    body.write(1, 1)
    sw = side >> 1          # effective bps 16
    body.write_signed(int(sw[0]), 16)
    body.write(1, 4)        # precision-1 -> 2 bits
    body.write_signed(0, 5)  # shift 0
    body.write_signed(1, 2)  # coeff [1] -> predict previous sample
    res2 = sw[1:] - sw[:-1]
    body.write(1, 2)        # rice method 1 (5-bit params)
    body.write(0, 4)        # partition order 0
    param = max(1, int(np.ceil(np.log2(
        max(2.0, 2.0 * np.abs(res2).mean())))))
    body.write(param, 5)
    rice_write(body, res2, param)
    frame = hdr + body.bytes()
    out += frame + struct.pack(">H", F.crc16(frame))
    return bytes(out)


def test_flac_codec_real_decode(ray_session):
    """Native FLAC decodes for REAL (rice + fixed/LPC prediction +
    stereo decorrelation + CRCs, numpy/stdlib only): lossless
    round-trip via the production encoder, predictive/mid-side frames
    via the test-side encoder, distributed decode, honest gaps."""
    import ray.data as rd

    from wikilinks_ray.ops.flac import decode_flac, encode_flac
    from wikilinks_ray.ops.multimodal import DecodeAudio

    rng = np.random.default_rng(7)
    # lossless round-trip, mono + stereo + non-multiple tail
    mono = rng.integers(-30000, 30000, 5001, dtype=np.int64)
    rate, ch, out = decode_flac(encode_flac(mono, 22050, block_size=1024))
    assert (rate, ch) == (22050, 1) and (out == mono).all()
    st = np.stack([rng.integers(-5000, 5000, 2000),
                   np.full(2000, -7, np.int64)], axis=1)
    rate, ch, out = decode_flac(encode_flac(st, 44100, block_size=512))
    assert (rate, ch) == (44100, 2) and (out == st.ravel()).all()
    # predictive mid/side frame: smooth signals (fixed/LPC-friendly)
    t = np.arange(2048)
    left = (9000 * np.sin(t / 40.0)).astype(np.int64)
    right = left - 2 * (1000 * np.cos(t / 55.0)).astype(np.int64)
    rate, ch, out = decode_flac(_encode_flac_predictive_ms(left, right))
    got = out.reshape(-1, 2)
    assert (got[:, 0] == left).all() and (got[:, 1] == right).all()
    # distributed decode through the actor stage, FLAC auto-detected
    clips = {i: (np.sin(2 * np.pi * 220 * (i + 1)
                        * np.arange(1600) / 16000) * 9000).astype(np.int64)
             for i in range(3)}
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(list(clips), pa.int64()),
        "payload": pa.array([encode_flac(s, 16000) for s in clips.values()],
                            pa.binary()),
    }))
    res = ds.map_batches(DecodeAudio, batch_format="pyarrow",
                         concurrency=2).to_pandas().set_index("media_id")
    for i, s in clips.items():
        assert res.loc[i, "sample_rate"] == 16000
        assert res.loc[i, "duration_ms"] == 100
        x = s.astype(np.float64)
        assert res.loc[i, "rms"] == pytest.approx(np.sqrt(np.mean(x * x)))
        assert res.loc[i, "peak"] == np.abs(s).max()
    # honest gaps + corruption detection
    with pytest.raises(ValueError, match="Ogg"):
        decode_flac(b"OggS" + b"\0" * 30)
    p = bytearray(encode_flac(mono[:64], 8000))
    p[-3] ^= 0x40  # flip a bit inside the last frame's sample data
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(p))


def test_codec_fuzz_clean_failures():
    """Truncations and byte mutations of valid PNG/JPEG/FLAC payloads
    must either decode or raise ValueError/NotImplementedError — never
    a stray struct/zlib/index error or a hang. These decoders run
    inside actor pools over untrusted corpus bytes."""
    from wikilinks_ray.ops.flac import decode_flac, encode_flac
    from wikilinks_ray.ops.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )
    from wikilinks_ray.ops.multimodal import decode_png, encode_png

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    snd = rng.integers(-1000, 1000, 500, dtype=np.int64)
    cases = [(encode_png(img), decode_png),
             (encode_jpeg_baseline(img), decode_jpeg_baseline),
             (_encode_jpeg_progressive_gray(img), decode_jpeg_baseline),
             (encode_flac(snd, 8000), decode_flac)]
    for payload, dec in cases:
        for cut in range(0, len(payload), max(1, len(payload) // 50)):
            try:
                dec(payload[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(150):
            b = bytearray(payload)
            i = int(rng.integers(0, len(b)))
            b[i] = int(rng.integers(0, 256))
            try:
                dec(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_wav_codec_real_decode(ray_session):
    """RIFF/WAVE decodes for REAL via the stdlib wave module: synthesize
    sine clips, decode distributed, check duration/rms/peak against the
    numpy source."""
    import ray.data as rd

    from wikilinks_ray.ops.multimodal import DecodeAudio, encode_wav

    rate = 8000
    clips = {}
    for i in range(4):
        t = np.arange(rate // (i + 1))  # different durations
        s = (np.sin(2 * np.pi * 440 * t / rate) * 10000).astype(np.int16)
        clips[i] = s
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(list(clips), pa.int64()),
        "payload": pa.array([encode_wav(s, rate) for s in clips.values()],
                            pa.binary()),
    }))
    out = ds.map_batches(DecodeAudio, batch_format="pyarrow",
                         concurrency=2).to_pandas().set_index("media_id")
    for i, s in clips.items():
        assert out.loc[i, "sample_rate"] == rate
        assert out.loc[i, "duration_ms"] == int(len(s) * 1000 / rate)
        x = s.astype(np.float64)
        assert out.loc[i, "rms"] == pytest.approx(np.sqrt(np.mean(x * x)))
        assert out.loc[i, "peak"] == np.abs(s).max()
    # non-WAV payloads raise the honest stub error
    with pytest.raises(NotImplementedError):
        DecodeAudio()._decode(b"\xff\xfbmp3-ish")


def test_session_windows_user_split_across_blocks(ray_session):
    """The bucketed sessionizer must gather a user's FULL event set even
    when the input blocks split the user, and per-key ordinals restart
    at 1 for every user."""
    import ray.data as rd

    from wikilinks_ray.ops.windows import session_windows, tumbling_windows

    h = 3_600_000_000  # 1h in us
    rows = [  # user 7: 2 sessions; user 8: 1 session; interleaved blocks
        (7, 0), (8, 10), (7, 1_000_000), (8, h // 2),
        (7, 3 * h), (7, 3 * h + 5), (8, h - 1),
    ]
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
    })).repartition(4)  # force users across blocks
    got = pd.DataFrame(session_windows(ev, gap_s=3600).take_all())
    got = got.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert got[["user_id", "session_id", "n_events"]].values.tolist() == [
        [7, 1, 2], [7, 2, 2], [8, 1, 3]]
    assert got.loc[0, "session_start_us"] == 0
    assert got.loc[0, "duration_us"] == 1_000_000
    assert got.loc[1, "session_start_us"] == 3 * h
    # tumbling: pure grouped count over (user, window)
    tw = pd.DataFrame(tumbling_windows(ev, size_s=3600).take_all())
    tw = tw.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert tw.values.tolist() == [[7, 0, 2], [7, 3, 2], [8, 0, 3]]


def test_stratified_sample_deterministic_and_partition_invariant(ray_session):
    """ops/sample.py: the survivor set is a pure function of
    (seed, doc_id, source) — identical across partitionings — and the
    realized per-stratum rate tracks the requested permille."""
    import ray.data as rd

    from wikilinks_ray.ops.sample import sample_units, stratified_sample

    n = 4000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
    })
    rates = {"s0": 0, "s1": 100, "s2": 500, "s3": 1000}
    a = {r["doc_id"] for r in stratified_sample(
        rd.from_arrow(t), rates, seed=3).take_all()}
    b = {r["doc_id"] for r in stratified_sample(
        rd.from_arrow(t).repartition(13), rates, seed=3).take_all()}
    assert a == b
    per = {s: 0 for s in rates}
    for d in a:
        per[f"s{d % 4}"] += 1
    assert per["s0"] == 0
    assert per["s3"] == n // 4  # rate 1000/1000 keeps everything
    assert abs(per["s1"] - 100) < 40 and abs(per["s2"] - 500) < 80
    # different seed -> different sample
    c = {r["doc_id"] for r in stratified_sample(
        rd.from_arrow(t), rates, seed=4).take_all()}
    assert a != c
    # engine units == md5_number_upper twin used by the SQL oracle
    import duckdb

    u = sample_units([0, 17, 999], seed=3)
    want = duckdb.sql(
        "SELECT md5_number_upper('3:0') % 1000,"
        " md5_number_upper('3:17') % 1000,"
        " md5_number_upper('3:999') % 1000").fetchone()
    assert list(u) == list(want)


def test_pack_sequences_semantics(ray_session):
    """ops/pack.py: greedy fill respects capacity, keeps doc_id order
    within buckets, isolates oversized docs, offsets are cumulative."""
    import ray.data as rd

    from wikilinks_ray.ops.pack import pack_sequences

    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "n_chars": pa.array([70 + (i * 37) % 400 for i in range(100)]
                            + [5000] + [10] * 99, pa.int64()),
    })
    df = pd.DataFrame(pack_sequences(
        rd.from_arrow(t).repartition(7), capacity=1000,
        num_buckets=4).take_all())
    assert len(df) == 200
    for _, g in df.groupby("bucket"):
        g = g.sort_values("doc_id")
        # bins increase monotonically in doc_id order
        assert (np.diff(g["bin"].to_numpy()) >= 0).all()
        lens = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
        for _, bg in g.groupby("bin"):
            tot = sum(lens[d] for d in bg["doc_id"])
            # a bin exceeds capacity only as a single oversized doc
            assert tot <= 1000 or len(bg) == 1
            offs = bg.sort_values("doc_id")["bin_offset"].to_numpy()
            sizes = np.array([lens[d] for d in bg.sort_values("doc_id")["doc_id"]])
            assert offs[0] == 0
            assert (offs[1:] == np.cumsum(sizes)[:-1]).all()
    # the oversized doc (id 100) sits alone at offset 0
    row = df[df["doc_id"] == 100].iloc[0]
    assert row["bin_offset"] == 0
    assert (df[(df["bucket"] == row["bucket"])
               & (df["bin"] == row["bin"])].shape[0]) == 1


def test_decontaminate_flags_ngram_overlap(ray_session):
    """Docs sharing an 8-gram with the benchmark are flagged; clean docs
    are not; short docs only match exactly; drop mode keeps full rows."""
    import ray.data as rd

    from wikilinks_ray.ops.dedup import decontaminate

    bench_text = ("the quick brown fox jumps over the lazy dog while "
                  "seven wizards brew quartz potions at midnight")
    rows = [
        # verbatim 8-gram lift from the benchmark -> contaminated
        {"doc_id": 0, "text": "intro " + bench_text + " outro"},
        # partial lift shorter than 8 tokens -> clean
        {"doc_id": 1, "text": "the quick brown fox jumps over distinct "
                              "endings entirely unrelated here now"},
        {"doc_id": 2, "text": "completely unrelated content about ray "
                              "datasets and arrow batches streaming"},
        # short doc, exact benchmark short doc -> contaminated
        {"doc_id": 3, "text": "tiny snippet"},
        # short doc, not in benchmark -> clean
        {"doc_id": 4, "text": "other snippet"},
        {"doc_id": 5, "text": ""},
    ]
    docs = rd.from_items(rows).repartition(2)
    flags = {r["doc_id"]: r["contaminated"]
             for r in decontaminate(docs, [bench_text, "tiny snippet"],
                                    k=8).take_all()}
    assert flags == {0: True, 1: False, 2: False, 3: True, 4: False,
                     5: False}

    kept = decontaminate(docs, [bench_text, "tiny snippet"], k=8,
                         mode="drop").take_all()
    assert sorted(r["doc_id"] for r in kept) == [1, 2, 4, 5]
    assert all("text" in r for r in kept)

    # Dataset benchmark side == list benchmark side
    bench_ds = rd.from_items([{"doc_id": 100, "text": bench_text},
                              {"doc_id": 101, "text": "tiny snippet"}])
    flags2 = {r["doc_id"]: r["contaminated"]
              for r in decontaminate(docs, bench_ds, k=8).take_all()}
    assert flags2 == flags


def test_scrub_pii(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.text import scrub_pii

    rows = [
        {"doc_id": 0, "text": "mail bob.smith+x@corp.example.org now"},
        {"doc_id": 1, "text": "server at 192.168.001.12 port 80"},
        {"doc_id": 2, "text": "call +1 555 867 5309 or +44-20-7946-0958"},
        {"doc_id": 3, "text": "nothing sensitive 3.14 here v1.2.3"},
        {"doc_id": 4, "text": "a@b.io and 10.0.0.1 and +12 3456 7890"},
        {"doc_id": 5, "text": ""},
    ]
    out = {r["doc_id"]: r for r in
           scrub_pii(rd.from_items(rows).repartition(2)).take_all()}
    assert out[0]["text"] == "mail <EMAIL> now"
    assert out[0]["n_email"] == 1 and out[0]["n_ip"] == 0
    assert out[1]["text"] == "server at <IP> port 80"
    assert out[2]["text"] == "call <PHONE> or <PHONE>"
    assert out[2]["n_phone"] == 2
    assert out[3]["text"] == rows[3]["text"]  # version strings survive
    assert out[4]["text"] == "<EMAIL> and <IP> and <PHONE>"
    assert out[5]["text"] == ""


def test_repetition_stats(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.text import repetition_stats

    rows = [
        {"doc_id": 0, "text": "a b a b"},      # g2 [ab,ba,ab] -> 1/3 dup
        {"doc_id": 1, "text": "x y z"},        # no repeats
        {"doc_id": 2, "text": "w w w w w"},    # all grams identical
        {"doc_id": 3, "text": "solo"},         # < 2 tokens
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": "p q r p q r p q r"},
    ]
    out = {r["doc_id"]: r for r in
           repetition_stats(rd.from_items(rows).repartition(2)).take_all()}
    assert out[0]["dup_2gram_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert out[0]["dup_3gram_frac"] == 0.0  # aba, bab distinct
    assert out[1]["dup_2gram_frac"] == 0.0
    assert out[2]["dup_2gram_frac"] == pytest.approx(1 - 1 / 4, abs=1e-6)
    assert out[2]["dup_3gram_frac"] == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert out[3]["dup_2gram_frac"] == 0.0
    assert out[4]["dup_2gram_frac"] == 0.0
    # p q r x3: 8 2-grams, 3 distinct; 7 3-grams, 3 distinct
    assert out[5]["dup_2gram_frac"] == pytest.approx(1 - 3 / 8, abs=1e-6)
    assert out[5]["dup_3gram_frac"] == pytest.approx(1 - 3 / 7, abs=1e-6)


def test_duplicate_spans(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.dedup import duplicate_spans

    rows = [
        {"doc_id": 0, "text": "one two three four five"},
        {"doc_id": 1, "text": "zz one two three qq"},   # shares one gram w/ 0
        {"doc_id": 2, "text": "one two three four five"},  # exact copy of 0
        {"doc_id": 3, "text": "a b"},                   # < k tokens: nothing
        {"doc_id": 4, "text": "p q r p q r"},           # within-doc repeat
        {"doc_id": 5, "text": "m n o x1 x2 x3 x4 m n o"},  # far repeat: 2 spans
    ]
    out = duplicate_spans(rd.from_items(rows).repartition(3), k=3,
                          num_buckets=4).take_all()
    got = sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in out)
    assert got == [
        (0, 0, 5),   # every gram of 0 repeats in 2 -> one maximal span
        (1, 1, 4),   # just "one two three"
        (2, 0, 5),
        (4, 0, 6),   # "p q r" at 0 and 3: gap 3 == k merges into one span
        (5, 0, 3), (5, 7, 10),  # gap 7 > k stays two spans
    ]


def test_classify_documents_matches_brute_force(ray_session):
    """Broadcast linear classifier vs an in-process replay: exact int64
    logits per doc, labels at the threshold, empty docs logit 0."""
    import hashlib as _hl

    import ray.data as rd

    from wikilinks_ray.ops.classify import (HASH_DIM, classify_documents,
                                            make_linear_model)

    docs = [(1, "the quick brown fox jumps"), (2, ""),
            (3, "THE QUICK brown"), (4, "zebra " * 50), (5, None)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })).repartition(2)
    got = classify_documents(ds, concurrency=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    w = make_linear_model()
    import re as _re

    def logit(text):
        s = 0
        for t in _re.findall(r"\w+", (text or "").lower()):
            h = int.from_bytes(_hl.md5(t.encode()).digest()[:8], "little")
            s += int(w[h % HASH_DIM])
        return s

    for i, (did, text) in enumerate(docs):
        assert got.loc[i, "doc_id"] == did
        assert got.loc[i, "logit"] == logit(text)
        assert got.loc[i, "label"] == int(logit(text) >= 0)
    # case-insensitive tokenization: docs 1 and 3 share feature hits
    assert got.loc[2, "logit"] != 0


def test_classify_weights_deterministic():
    from wikilinks_ray.ops.classify import make_linear_model

    w1, w2 = make_linear_model(), make_linear_model()
    assert (w1 == w2).all()
    assert (w1 >= -8).all() and (w1 <= 8).all()
    assert (make_linear_model(seed=12) != w1).any()


def test_near_dup_clusters(ray_session):
    """Cluster = min reachable doc id through the pair graph; chains
    merge transitively; singletons cluster as themselves; exact vs a
    union-find replay."""
    import ray.data as rd

    from wikilinks_ray.ops.dedup import near_dup_clusters

    # explicit pair graph: chain 1-2-3, star 10-(11,12), singleton 99
    pairs = rd.from_items([{"a": 1, "b": 2}, {"a": 2, "b": 3},
                           {"a": 10, "b": 11}, {"a": 10, "b": 12}])
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 10, 11, 12, 99], pa.int64()),
        "text": pa.array(["x"] * 7, pa.string()),
    }))
    got = {r["doc_id"]: r["cluster"]
           for r in near_dup_clusters(docs, pairs=pairs).take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_near_dup_clusters_long_chain_converges(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.dedup import near_dup_clusters

    n = 40  # long chain: hook+jump converges in O(log) hooks
    pairs = rd.from_items([{"a": i, "b": i + 1} for i in range(n)])
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n + 1)), pa.int64()),
        "text": pa.array(["x"] * (n + 1), pa.string()),
    }))
    got = {r["doc_id"]: r["cluster"]
           for r in near_dup_clusters(docs, pairs=pairs).take_all()}
    assert all(v == 0 for v in got.values())


def test_near_dup_clusters_components_fallback(ray_session):
    """broadcast_limit guardrail: forcing the limit below the member
    count must auto-route to the CSR shard-actor components path and
    produce clusters IDENTICAL to the broadcast hook+jump path —
    chains, stars, a cycle, and untouched singletons."""
    import ray.data as rd

    from wikilinks_ray.ops.dedup import near_dup_clusters

    pair_items = (
        [{"a": i, "b": i + 1} for i in range(0, 20)]          # chain
        + [{"a": 50, "b": 50 + j} for j in range(1, 6)]        # star
        + [{"a": 70, "b": 71}, {"a": 71, "b": 72},
           {"a": 72, "b": 70}]                                 # cycle
    )
    pairs = rd.from_items(pair_items)
    all_ids = sorted({p["a"] for p in pair_items}
                     | {p["b"] for p in pair_items} | {90, 91})
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "text": pa.array(["x"] * len(all_ids), pa.string()),
    }))
    broadcast = {r["doc_id"]: r["cluster"]
                 for r in near_dup_clusters(docs, pairs=pairs).take_all()}
    routed = {r["doc_id"]: r["cluster"]
              for r in near_dup_clusters(docs, pairs=pairs,
                                         broadcast_limit=1).take_all()}
    assert routed == broadcast
    assert routed[90] == 90 and routed[91] == 91
    assert routed[70] == routed[71] == routed[72] == 70


def test_bpe_tokenizer_dialects_agree():
    """The engine's Python regex and the oracle's RE2 twin must split
    identically — differential check on adversarial strings (unicode
    letters, contractions, underscores, digit runs, whitespace runs)."""
    import duckdb

    from wikilinks_ray.ops.text import _BPE_RE, BPE_RE2_PATTERN

    tests = [
        "Isn't co-op 2024 naïve — 3.14 __init__ 'll",
        "hello   world\t\ttabs\nnewlines  ",
        "1,234.56 A-B_C d'état l'América",
        "multi    space; (parens) [brackets] «quotes» 你好 世界 42",
        "", "   ", "'s's's", "a'd b're c've d'm",
        "ümlaut Öffnung ß straße",
        "e.g., i.e.; etc... 100% $5.99 #tag @user",
        # Number-letter / Number-other characters (ADVICE r4 low): RE2
        # \p{N} includes Nl/No, Python \d does not — the frozen _NLNO
        # class must keep the twins identical on them
        "Ⅷ3 abcⅧ 2¾ cups ① item Ⅻ.Ⅷ 中文Ⅷ3中文",
        "x² + y³ = z¹ ⅔⅕ ¼kg 〇九 ๑๒๓",
    ]
    con = duckdb.connect()
    for s in tests:
        py = _BPE_RE.findall(s)
        sql = con.execute("SELECT regexp_extract_all(?, ?)",
                          [s, BPE_RE2_PATTERN]).fetchone()[0]
        assert py == sql, (s, py, sql)


def test_bpe_nlno_class_pins_unicodedata():
    """The frozen _NLNO class must equal a fresh Nl/No scan of THIS
    interpreter's unicodedata — catches Unicode-version drift without
    paying a 1.1M-codepoint scan per worker process."""
    import sys
    import unicodedata

    from wikilinks_ray.ops.text import _NLNO

    want = {cp for cp in range(sys.maxunicode + 1)
            if unicodedata.category(chr(cp)) in ("Nl", "No")}
    # expand the class's a-b runs back into a codepoint set
    got, i = set(), 0
    while i < len(_NLNO):
        a = ord(_NLNO[i])
        if i + 2 < len(_NLNO) and _NLNO[i + 1] == "-":
            got.update(range(a, ord(_NLNO[i + 2]) + 1))
            i += 3
        else:
            got.add(a)
            i += 1
    assert got == want


def test_bpe_token_counts(ray_session):
    import ray.data as rd

    from wikilinks_ray.ops.text import bpe_token_counts

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["Isn't  this grand? Yes.", "", None], pa.string()),
    }))
    got = bpe_token_counts(docs).to_pandas().set_index("doc_id")
    assert got.loc[1, "ws_tokens"] == 4
    # Isn | 't | this | grand | ? | Yes | .
    assert got.loc[1, "bpe_tokens"] == 7
    assert got.loc[2, "ws_tokens"] == 0 and got.loc[2, "bpe_tokens"] == 0
    assert got.loc[3, "ws_tokens"] == 0 and got.loc[3, "bpe_tokens"] == 0


def test_doc_keywords_tfidf_vs_reference(ray_session):
    """Integer TF-IDF top-k vs a dict/loop replay, incl. word-asc
    tie-break and docs sharing words across buckets."""
    import re
    from collections import Counter

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from wikilinks_ray.ops.text import doc_keywords_tfidf

    texts = [
        "alpha beta beta gamma gamma gamma shared",
        "alpha alpha delta shared shared",
        "beta delta epsilon zeta zeta shared",
        "",  # token-less doc: contributes to n_docs, emits no rows
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = doc_keywords_tfidf(ds, k=3, idf_scale=100).to_pandas()
    got = got.sort_values(["doc_id", "rank"]).reset_index(drop=True)

    n = len(texts)
    tf = {i: Counter(re.findall(r"\w+", t.lower()))
          for i, t in enumerate(texts)}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    rows = []
    for i, c in tf.items():
        scored = sorted(((w, k, df[w], k * ((n * 100) // df[w]))
                         for w, k in c.items()),
                        key=lambda x: (-x[3], x[0]))[:3]
        for r, (w, k, d, s) in enumerate(scored, 1):
            rows.append((i, r, w, k, d, s))
    want = pd.DataFrame(rows, columns=["doc_id", "rank", "word", "tf",
                                       "df", "score"])
    pd.testing.assert_frame_equal(
        got[["doc_id", "rank", "word", "tf", "df", "score"]].astype(
            {"doc_id": "int64", "rank": "int64", "tf": "int64",
             "df": "int64", "score": "int64"}),
        want.astype({"doc_id": "int64", "rank": "int64", "tf": "int64",
                     "df": "int64", "score": "int64"}))


def test_transition_counts_vs_brute_force(ray_session):
    """Adjacent (prev,next) label bigrams per user, (ts, event_id)
    order, summed globally — vs a pandas shift reference; exercised
    across a multi-block dataset so users split across blocks."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.windows import transition_counts

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 50, n),
        "ts": (pd.Timestamp("2024-01-01")
               + pd.to_timedelta(rng.integers(0, 10**6, n), unit="us")),
        "event_type": rng.choice(["a", "b", "c", "d"], n),
    })
    # forced exact-ts tie inside one user: order falls to event_id
    df.loc[1, ["user_id", "ts", "event_type"]] = \
        df.loc[0, "user_id"], df.loc[0, "ts"], "d"

    s = df.sort_values(["user_id", "ts", "event_id"])
    same = s["user_id"].to_numpy()[1:] == s["user_id"].to_numpy()[:-1]
    want = (pd.DataFrame({"prev_type": s["event_type"].to_numpy()[:-1][same],
                          "next_type": s["event_type"].to_numpy()[1:][same]})
            .groupby(["prev_type", "next_type"]).size().rename("n")
            .reset_index())

    ds = rd.from_pandas(df).repartition(8)
    got = (transition_counts(ds).to_pandas()
           .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want.sort_values(["prev_type", "next_type"])
        .reset_index(drop=True), check_dtype=False)


def test_fixed_size_sample_exact_k_and_partition_invariant(ray_session):
    """Fixed-size sample: exactly k per stratum (or global), identical
    across partitionings and batch cuts, ranks dense 1..k, and the
    chosen set IS the k smallest priorities."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.sample import fixed_size_sample, \
        sample_priorities

    n = 3000
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "doc_id": rng.permutation(n).astype(np.int64),
        "source": [f"s{i % 3}" for i in range(n)],
    })

    def run(npart, **kw):
        ds = rd.from_pandas(df).repartition(npart)
        return (fixed_size_sample(ds, 25, **kw).to_pandas()
                .sort_values(["rank"]).reset_index(drop=True))

    g1 = run(2)
    g2 = run(13)
    pd.testing.assert_frame_equal(g1, g2)
    assert len(g1) == 25 and list(g1["rank"]) == list(range(1, 26))
    pri = sample_priorities(df["doc_id"].to_numpy(), 0)
    want = np.sort(pri)[:25]
    assert np.array_equal(np.sort(g1["pri"].to_numpy()), want)

    s1 = run(2, strata_col="source")
    s2 = run(17, strata_col="source")
    pd.testing.assert_frame_equal(
        s1.sort_values(["source", "rank"]).reset_index(drop=True),
        s2.sort_values(["source", "rank"]).reset_index(drop=True))
    assert (s1.groupby("source")["rank"].agg(["min", "max", "count"])
            .eq([1, 25, 25]).all().all())


def test_covisitation_vs_brute_force(ray_session):
    """Item pairs per user vs an O(n²) pandas reference, including the
    max_items_per_user guard (a hub user emits nothing), the min_users
    support filter, duplicate (user, item) collapse, and bucket
    independence."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.covisit import covisitation_pairs

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 400, n).astype(np.int64),
        "item": rng.integers(0, 40, n).astype(np.int64),
    })
    # hub user 999 touches 30 distinct items -> over a cap of 20
    hub = pd.DataFrame({"user_id": np.full(30, 999, np.int64),
                        "item": np.arange(30, dtype=np.int64)})
    df = pd.concat([df, hub], ignore_index=True)
    df["props"] = ['{"k": %d}' % i for i in df["item"]]

    ui = df[["user_id", "item"]].drop_duplicates()
    sizes = ui.groupby("user_id")["item"].size()
    ok = sizes[sizes <= 20].index
    f = ui[ui.user_id.isin(ok)]
    m = f.merge(f, on="user_id")
    m = m[m.item_x < m.item_y]
    want = (m.groupby(["item_x", "item_y"]).size().rename("n_users")
            .reset_index().query("n_users >= 4")
            .rename(columns={"item_x": "item_a", "item_y": "item_b"})
            .sort_values(["item_a", "item_b"]).reset_index(drop=True))

    ds = rd.from_pandas(df[["user_id", "props"]]).repartition(7)
    got = (covisitation_pairs(ds, min_users=4, max_items_per_user=20)
           .to_pandas().sort_values(["item_a", "item_b"])
           .reset_index(drop=True))
    assert len(want) > 0  # the reference itself must be non-trivial
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"), check_dtype=False)


def test_running_totals_vs_pandas_window(ray_session):
    """Cumulative per-key sum vs groupby().cumsum() on the same order,
    with exact-timestamp ties ordered by event_id."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.windows import running_totals

    rng = np.random.default_rng(9)
    n = 3000
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": base + pd.to_timedelta(rng.integers(0, 500, n), unit="s"),
        "cents": rng.integers(-100, 10_000, n).astype(np.int64),
    })
    s = df.sort_values(["user_id", "ts", "event_id"])
    want = s.assign(running=s.groupby("user_id")["cents"].cumsum()) \
        .sort_values("event_id").reset_index(drop=True) \
        [["event_id", "user_id", "cents", "running"]]
    got = (running_totals(rd.from_pandas(df).repartition(9))
           .to_pandas().sort_values("event_id").reset_index(drop=True)
           [["event_id", "user_id", "cents", "running"]])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_active_users_vs_brute_force(ray_session):
    """DAU/WAU vs a pandas reference; window ends only at observed
    days; a user active twice inside one window counts once."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.windows import rolling_active_users

    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n).astype(np.int64),
        "ts": (pd.Timestamp("2024-01-01")
               + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s")),
    })
    df["day"] = df["ts"].astype("int64") // 86_400_000_000
    ud = df[["user_id", "day"]].drop_duplicates()
    days = np.sort(ud["day"].unique())
    want = pd.DataFrame({
        "day": days,
        "dau": [ud[ud.day == d]["user_id"].nunique() for d in days],
        "wau": [ud[(ud.day >= d - 6) & (ud.day <= d)]["user_id"].nunique()
                for d in days],
    })
    got = rolling_active_users(
        rd.from_pandas(df[["user_id", "ts"]]).repartition(6),
        window_days=7)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rollup_counts_vs_pandas(ray_session):
    """ROLLUP levels are consistent: fine rows sum to per-label rows
    sum to the grand total; values match a pandas reference."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.windows import rollup_counts

    rng = np.random.default_rng(31)
    n = 3000
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y", "z"], n),
        "ts": (pd.Timestamp("2024-01-01")
               + pd.to_timedelta(rng.integers(0, 10 * 86400, n), unit="s")),
        "cents": rng.integers(0, 10_000, n).astype(np.int64),
    })
    got = rollup_counts(rd.from_pandas(df).repartition(8))
    fine = got[got.day >= 0]
    by_label = got[(got.day == -1) & (got.event_type != "(all)")]
    total = got[got.event_type == "(all)"]
    assert len(total) == 1
    assert total["sum_cents"].iloc[0] == df["cents"].sum()
    assert total["n_events"].iloc[0] == n
    assert fine["sum_cents"].sum() == df["cents"].sum()
    pd.testing.assert_frame_equal(
        by_label[["event_type", "n_events", "sum_cents"]]
        .reset_index(drop=True),
        df.groupby("event_type", as_index=False)
        .agg(n_events=("cents", "size"), sum_cents=("cents", "sum"))
        .astype({"n_events": "int64"}),
        check_dtype=False)
    d0 = int(fine["day"].iloc[0])
    sub = df[df["ts"].astype("int64") // 86_400_000_000 == d0]
    row = fine[(fine.day == d0)].groupby("day")["n_events"].sum()
    assert int(row.iloc[0]) == len(sub)


def test_kmeans_int_vs_dense_replay(ray_session):
    """Scaled-int Lloyd: identical to a single-process numpy replay of
    the same recurrence (assign argmin-first, floor-div update,
    empty-cell carry), across partitionings."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.cluster import OFFSET, SCALE_BITS, kmeans_int

    rng = np.random.default_rng(41)
    n, dim, k, iters = 400, 16, 5, 4
    X = rng.normal(0, 0.5, (n, dim)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(X),
                                        pa.list_(pa.float32()))})

    Xi = (np.floor(X.astype(np.float64) * (1 << SCALE_BITS) + 0.5)
          .astype(np.int64) + OFFSET)
    C = Xi[:k].copy()
    for _ in range(iters):
        d = ((Xi[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                C[c] = Xi[m].sum(0) // m.sum()
    d = ((Xi[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    want = np.argmin(d, axis=1).astype(np.int64)

    for npart in (3, 11):
        got = (kmeans_int(rd.from_arrow(t).repartition(npart),
                          k=k, iters=iters)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        assert np.array_equal(got["cluster"].to_numpy(), want)
    assert len(np.unique(want)) > 1  # the replay itself is non-trivial


def test_vocab_coverage_vs_brute_force(ray_session):
    """Top-k vocab boundary ties break on (count desc, word asc);
    coverage counts OCCURRENCES; empty docs carry the -1 sentinel;
    partition-invariant."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.text import _TOKEN_RE, vocab_coverage

    texts = ["aa bb cc dd", "aa aa bb xx", "", "yy zz aa", "bb bb cc qq",
             "dd dd ee ff gg aa"] * 20
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(_TOKEN_RE.findall(t.lower()))
    vocab = set(w for w, _ in sorted(c.items(),
                                     key=lambda kv: (-kv[1], kv[0]))[:5])
    rows = []
    for did, t in zip(df.doc_id, df.text):
        toks = _TOKEN_RE.findall(t.lower())
        iv = sum(1 for w in toks if w in vocab)
        cov = (iv * 10**6) // len(toks) if toks else -1
        rows.append((did, len(toks), iv, cov))
    want = pd.DataFrame(rows, columns=["doc_id", "n_tokens", "in_vocab",
                                       "coverage_scaled"])
    for npart in (3, 9):
        got = (vocab_coverage(rd.from_pandas(df).repartition(npart),
                              top_k=5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_centroid_classifier_eval_planted(ray_session):
    """On well-separated planted blobs the confusion matrix is
    diagonal; partition-invariant; counts total to n."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.cluster import centroid_classifier_eval

    rng = np.random.default_rng(47)
    n, dim = 600, 16
    centers = rng.normal(0, 4.0, (3, dim)).astype(np.float32)
    lab = rng.integers(0, 3, n)
    X = (centers[lab] + rng.normal(0, 0.05, (n, dim))).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(X), pa.list_(pa.float32())),
                  "label": pa.array(lab.astype(np.int64))})

    def run(npart):
        return (centroid_classifier_eval(
            rd.from_arrow(t).repartition(npart)).to_pandas()
            .sort_values(["label_true", "label_pred"])
            .reset_index(drop=True))

    g1, g2 = run(3), run(11)
    pd.testing.assert_frame_equal(g1, g2)
    assert g1["n"].sum() == n
    diag = g1[g1.label_true == g1.label_pred]["n"].sum()
    assert diag == n  # separable blobs -> perfect diagonal


def test_audit_ops_vs_brute_force(ray_session):
    """Orphan counting (incl. NULL fks), PK duplicate/surplus counts
    and null+NaN rates vs pandas references, with planted violations."""
    import pandas as pd
    import ray.data as rd

    from wikilinks_ray.ops.audit import (null_counts, pk_duplicates,
                                         referential_orphans)

    rng = np.random.default_rng(53)
    parent = pd.DataFrame({"pk": np.arange(100, dtype=np.int64)})
    fkv = rng.integers(0, 140, 1000).astype(np.float64)  # 40 orphan keys
    fkv[::50] = np.nan                                   # 20 NULL fks
    child = pd.DataFrame({"fk": fkv})
    child_pa = pa.table({"fk": pa.array(
        [None if np.isnan(x) else int(x) for x in fkv], pa.int64())})
    want_orphans = int((fkv >= 100).sum() + np.isnan(fkv).sum())
    got = referential_orphans(
        rd.from_arrow(child_pa).repartition(5),
        rd.from_pandas(parent).repartition(3), fk="fk", pk="pk")
    assert got == want_orphans

    keys = np.concatenate([np.arange(50), [1, 1, 7]]).astype(np.int64)
    dup, surplus = pk_duplicates(
        rd.from_pandas(pd.DataFrame({"pk": keys})).repartition(4), pk="pk")
    assert (dup, surplus) == (2, 3)

    vals = np.array([1.0, np.nan, 3.0, np.nan, 5.0])
    nc = null_counts(rd.from_pandas(pd.DataFrame({"v": vals})),
                     ["v"])
    assert nc["v"] == 2

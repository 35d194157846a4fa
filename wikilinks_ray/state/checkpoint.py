"""Per-superstep, per-partition checkpointing with lineage + metrics.

The reference has no checkpointing at all (a crash reruns the 1-2h
convert, SURVEY.md §4); the north_rule requires every superstep to be
resumable. Layout:

    ckpt_dir/
      iter-{k:06d}/
        chunk-{p:05d}.npy     # per-vertex-range state array
        MANIFEST.json         # written LAST, atomically -> iteration is
                              # complete iff its manifest exists

MANIFEST.json records the iteration number, per-chunk paths + row
counts (lineage), and free-form metrics (delta, dangling mass, wall
time), so a resumed job can both continue computing and report an
honest metrics history.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_checkpoint(ckpt_dir: str, iteration: int, chunks: list[np.ndarray],
                    metrics: dict) -> str:
    d = os.path.join(ckpt_dir, f"iter-{iteration:06d}")
    os.makedirs(d, exist_ok=True)
    entries = []
    for p, arr in enumerate(chunks):
        path = os.path.join(d, f"chunk-{p:05d}.npy")
        tmp = path + ".tmp.npy"
        np.save(tmp, arr)
        os.replace(tmp, path)
        entries.append({"partition": p, "path": path, "rows": int(len(arr))})
    manifest = {"iteration": iteration, "chunks": entries, "metrics": metrics}
    mpath = os.path.join(d, "MANIFEST.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, mpath)
    return d


def save_checkpoint_multi(ckpt_dir: str, iteration: int,
                          named_chunks: dict[str, list[np.ndarray]],
                          metrics: dict) -> str:
    """Like save_checkpoint but with several named per-partition arrays
    (e.g. BFS dist + parent + frontier): ``{name}-{p:05d}.npy`` files,
    manifest written last."""
    d = os.path.join(ckpt_dir, f"iter-{iteration:06d}")
    os.makedirs(d, exist_ok=True)
    entries = []
    for name, chunks in named_chunks.items():
        for p, arr in enumerate(chunks):
            path = os.path.join(d, f"{name}-{p:05d}.npy")
            tmp = path + ".tmp.npy"
            np.save(tmp, arr)
            os.replace(tmp, path)
            entries.append({"name": name, "partition": p, "path": path,
                            "rows": int(arr.shape[0])})
    manifest = {"iteration": iteration, "chunks": entries, "metrics": metrics}
    mpath = os.path.join(d, "MANIFEST.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, mpath)
    return d


def latest_checkpoint_multi(ckpt_dir: str) -> tuple[int, dict[str, list[np.ndarray]], dict] | None:
    if not os.path.isdir(ckpt_dir):
        return None
    iters = sorted((e for e in os.listdir(ckpt_dir) if e.startswith("iter-")),
                   reverse=True)
    for e in iters:
        mpath = os.path.join(ckpt_dir, e, "MANIFEST.json")
        if not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            manifest = json.load(f)
        named: dict[str, list[np.ndarray]] = {}
        for c in sorted(manifest["chunks"],
                        key=lambda c: (c["name"], c["partition"])):
            named.setdefault(c["name"], []).append(np.load(c["path"]))
        return manifest["iteration"], named, manifest.get("metrics", {})
    return None


def latest_checkpoint(ckpt_dir: str) -> tuple[int, list[np.ndarray], dict] | None:
    """(iteration, chunks, metrics) of the newest COMPLETE iteration."""
    if not os.path.isdir(ckpt_dir):
        return None
    iters = sorted(
        (e for e in os.listdir(ckpt_dir) if e.startswith("iter-")), reverse=True
    )
    for e in iters:
        mpath = os.path.join(ckpt_dir, e, "MANIFEST.json")
        if not os.path.exists(mpath):
            continue  # incomplete (killed mid-write) -> fall back further
        with open(mpath) as f:
            manifest = json.load(f)
        chunks = [np.load(c["path"]) for c in sorted(manifest["chunks"],
                                                     key=lambda c: c["partition"])]
        return manifest["iteration"], chunks, manifest.get("metrics", {})
    return None

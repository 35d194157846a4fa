"""Per-superstep, per-partition checkpointing with lineage + metrics.

The reference has no checkpointing at all (a crash reruns the 1-2h
convert, SURVEY.md §4); the north_rule requires every superstep to be
resumable. Layout:

    ckpt_dir/
      iter-{k:06d}/
        chunk-{p:05d}.npy     # per-vertex-range state array
        MANIFEST.json         # written LAST -> iteration is complete
                              # iff its manifest exists AND parses

MANIFEST.json records the iteration number, per-chunk paths + row
counts (lineage), and free-form metrics (delta, dangling mass, wall
time), so a resumed job can both continue computing and report an
honest metrics history.

``ckpt_dir`` may be a plain path or any fsio-resolvable URI (shared
mount, ``s3://``, test-registered scheme): all I/O goes through
pyarrow filesystems, and crash safety is manifest-last rather than
rename-based (object stores have no atomic rename) — a torn manifest
fails to parse and the reader falls back to the previous complete
iteration.
"""

from __future__ import annotations

import json

import numpy as np

from . import fsio


def _write_manifest(iter_dir: str, manifest: dict) -> None:
    # written LAST: the manifest is the commit point for the iteration
    fsio.write_text(fsio.join(iter_dir, "MANIFEST.json"),
                    json.dumps(manifest, indent=1))


def _uncommit(iter_dir: str) -> None:
    """Delete a pre-existing manifest BEFORE rewriting any chunk file.

    A resumed job may re-save an iteration whose directory already holds
    a complete manifest (e.g. it crashed after the save but before
    recording progress elsewhere). Rewriting chunks in place under an
    intact manifest would let a second crash mid-rewrite hand the next
    reader torn/mixed chunks as committed (ADVICE round 4, medium).
    Manifest-absent => iteration incomplete, always."""
    mpath = fsio.join(iter_dir, "MANIFEST.json")
    if fsio.exists(mpath):
        fsio.delete_file(mpath)


def _read_manifest(iter_dir: str) -> dict | None:
    mpath = fsio.join(iter_dir, "MANIFEST.json")
    if not fsio.exists(mpath):
        return None
    try:
        return json.loads(fsio.read_text(mpath))
    except (ValueError, OSError):
        return None  # torn write -> treat iteration as incomplete


def save_checkpoint(ckpt_dir: str, iteration: int, chunks: list[np.ndarray],
                    metrics: dict) -> str:
    d = fsio.join(ckpt_dir, f"iter-{iteration:06d}")
    fsio.makedirs(d)
    _uncommit(d)
    entries = []
    for p, arr in enumerate(chunks):
        path = fsio.join(d, f"chunk-{p:05d}.npy")
        fsio.write_npy(path, arr)
        entries.append({"partition": p, "path": path, "rows": int(len(arr))})
    _write_manifest(d, {"iteration": iteration, "chunks": entries,
                        "metrics": metrics})
    return d


def save_checkpoint_multi(ckpt_dir: str, iteration: int,
                          named_chunks: dict[str, list[np.ndarray]],
                          metrics: dict) -> str:
    """Like save_checkpoint but with several named per-partition arrays
    (e.g. BFS dist + parent + frontier): ``{name}-{p:05d}.npy`` files,
    manifest written last."""
    d = fsio.join(ckpt_dir, f"iter-{iteration:06d}")
    fsio.makedirs(d)
    _uncommit(d)
    entries = []
    for name, chunks in named_chunks.items():
        for p, arr in enumerate(chunks):
            path = fsio.join(d, f"{name}-{p:05d}.npy")
            fsio.write_npy(path, arr)
            entries.append({"name": name, "partition": p, "path": path,
                            "rows": int(arr.shape[0])})
    _write_manifest(d, {"iteration": iteration, "chunks": entries,
                        "metrics": metrics})
    return d


def _iter_dirs_newest_first(ckpt_dir: str) -> list[str]:
    return sorted((e for e in fsio.listdir(ckpt_dir)
                   if e.startswith("iter-")), reverse=True)


def latest_checkpoint_multi(ckpt_dir: str) -> tuple[int, dict[str, list[np.ndarray]], dict] | None:
    for e in _iter_dirs_newest_first(ckpt_dir):
        manifest = _read_manifest(fsio.join(ckpt_dir, e))
        if manifest is None:
            continue
        named: dict[str, list[np.ndarray]] = {}
        for c in sorted(manifest["chunks"],
                        key=lambda c: (c["name"], c["partition"])):
            named.setdefault(c["name"], []).append(fsio.read_npy(c["path"]))
        return manifest["iteration"], named, manifest.get("metrics", {})
    return None


def latest_checkpoint(ckpt_dir: str) -> tuple[int, list[np.ndarray], dict] | None:
    """(iteration, chunks, metrics) of the newest COMPLETE iteration."""
    for e in _iter_dirs_newest_first(ckpt_dir):
        manifest = _read_manifest(fsio.join(ckpt_dir, e))
        if manifest is None:
            continue  # missing/torn manifest -> fall back further
        chunks = [fsio.read_npy(c["path"])
                  for c in sorted(manifest["chunks"],
                                  key=lambda c: c["partition"])]
        return manifest["iteration"], chunks, manifest.get("metrics", {})
    return None

"""Filesystem-portable I/O for graph work dirs (shards, checkpoints,
sentinels, IVF index partitions).

On the single-node sandbox a plain local path works everywhere, but on a
multi-node cluster the task that WRITES a CSR shard and the actor that
READS it land on different machines — so every path an actor or task
dereferences must resolve on shared storage. All shard/checkpoint I/O
routes through this module: a ``work_dir`` may be

- a plain path (``/data/graph``) — LocalFileSystem (assumed to be a
  shared mount on a real cluster, e.g. NFS),
- a ``local://`` or ``file://`` URI — LocalFileSystem (``local://`` is
  also what Ray Data's own read/write APIs accept for node-local paths),
- any pyarrow-recognised URI (``s3://bucket/prefix``, ``gs://``,
  ``hdfs://``, ``mock://``) — resolved via
  ``pyarrow.fs.FileSystem.from_uri`` INSIDE the task/actor, so the
  string form travels and each worker opens its own connection,
- a scheme registered with :func:`register_scheme` (tests register a
  ``SubTreeFileSystem`` stand-in to prove no code path escapes the
  abstraction).

Crash-safety protocol: object stores have no atomic rename, so nothing
here relies on one. Writers emit data files first and a small
manifest/sentinel LAST; readers treat a missing or torn (unparseable /
stamp-mismatched) manifest as "incomplete, rebuild or fall back". On
POSIX the same protocol holds trivially.

The reference has no analog (one mmap'd file on one machine,
SegmentWikiGraphStore.kt:266-334); this is the piece a 256-node run
hits first.
"""

from __future__ import annotations

import numpy as np
import pyarrow.fs as pafs

# Test/deploy hook: map a URI scheme to a pre-built FileSystem whose
# root the scheme-relative path is resolved against.
_SCHEME_FS: dict[str, pafs.FileSystem] = {}


def register_scheme(scheme: str, fs: pafs.FileSystem) -> None:
    _SCHEME_FS[scheme] = fs


def unregister_scheme(scheme: str) -> None:
    _SCHEME_FS.pop(scheme, None)


def snapshot() -> dict[str, pafs.FileSystem]:
    """Picklable copy of the scheme registry. Registration is
    process-local, but resolution happens inside Ray workers — code that
    ships a closure/actor dereferencing registered-scheme URIs captures
    a snapshot driver-side and ``restore``s it worker-side (pyarrow
    filesystems pickle cleanly)."""
    return dict(_SCHEME_FS)


def restore(snap: dict[str, pafs.FileSystem] | None) -> None:
    if snap:
        _SCHEME_FS.update(snap)


def resolve(path_or_uri: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, fs-relative path) for a path or URI.

    Resolution happens wherever the string is dereferenced — driver,
    task, or actor — so only the STRING needs to travel through Ray.
    """
    if "://" not in path_or_uri:
        return pafs.LocalFileSystem(), path_or_uri
    scheme, rest = path_or_uri.split("://", 1)
    if scheme in _SCHEME_FS:
        return _SCHEME_FS[scheme], rest
    if scheme in ("local", "file"):
        # pyarrow's from_uri rejects "local://"; both mean LocalFileSystem
        return pafs.LocalFileSystem(), "/" + rest.lstrip("/")
    return pafs.FileSystem.from_uri(path_or_uri)


def join(base: str, *parts: str) -> str:
    """URI-safe path join (this engine runs on POSIX-separator systems)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def makedirs(path_or_uri: str) -> None:
    fs, p = resolve(path_or_uri)
    fs.create_dir(p, recursive=True)


def exists(path_or_uri: str) -> bool:
    fs, p = resolve(path_or_uri)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def listdir(path_or_uri: str) -> list[str]:
    """Base names of entries directly under a directory ([] if absent)."""
    fs, p = resolve(path_or_uri)
    if fs.get_file_info(p).type != pafs.FileType.Directory:
        return []
    infos = fs.get_file_info(pafs.FileSelector(p))
    return sorted(i.base_name for i in infos)


def rmtree(path_or_uri: str) -> None:
    """Recursively delete a directory if it exists (no-op otherwise)."""
    fs, p = resolve(path_or_uri)
    if fs.get_file_info(p).type == pafs.FileType.Directory:
        fs.delete_dir(p)


def delete_file(path_or_uri: str) -> None:
    fs, p = resolve(path_or_uri)
    if fs.get_file_info(p).type == pafs.FileType.File:
        fs.delete_file(p)


def write_text(path_or_uri: str, text: str) -> None:
    fs, p = resolve(path_or_uri)
    with fs.open_output_stream(p) as f:
        f.write(text.encode())


def read_text(path_or_uri: str) -> str:
    fs, p = resolve(path_or_uri)
    with fs.open_input_stream(p) as f:
        return f.read().decode()


def write_npy(path_or_uri: str, arr: np.ndarray) -> None:
    fs, p = resolve(path_or_uri)
    with fs.open_output_stream(p) as f:
        np.save(f, arr)


def read_npy(path_or_uri: str) -> np.ndarray:
    fs, p = resolve(path_or_uri)
    # open_input_file (seekable) — np.load seeks past the magic
    with fs.open_input_file(p) as f:
        return np.load(f)

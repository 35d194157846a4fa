"""Actor-backed mock object store for exercising ``state.fsio`` against
NON-POSIX filesystem semantics in tests.

The SubTreeFileSystem stand-in proves no path escapes the fsio
abstraction, but it still inherits LocalFileSystem's POSIX behavior
(real directories, mtimes, atomic rename available even if unused) —
S3-shaped bugs can hide behind it. This module provides the honest mock:

- blobs live in ONE Ray actor, so every process (driver, map_groups
  writer tasks, ``CSRShardActor`` readers) sees the same store — unlike
  ``fsspec``'s ``MemoryFileSystem``, whose class-level dict is
  per-process and silently drops cross-worker writes;
- keys are FLAT: directories are virtual (``create_dir`` is a no-op,
  a "directory" exists iff some key extends it) — the object-store
  model;
- NO rename/move (``mv`` raises) and NO mtimes — any code path relying
  on tmp+rename atomicity or timestamp ordering fails loudly here;
- writes commit at CLOSE, whole-blob, like a multipart upload — a
  reader never observes a half-written object, it observes a missing
  one (which is exactly what the sentinel-last protocol must tolerate).

Usage (see tests/test_fsio.py)::

    store = BlobStoreActor.options(name="mockstore").remote()
    fs = pafs.PyFileSystem(pafs.FSSpecHandler(ActorObjectStoreFS(store)))
    fsio.register_scheme("mock", fs)
    shard_edges(edges, n, P, "mock://graph")
"""

from __future__ import annotations

import io

import ray

try:  # fsspec ships with pyarrow-adjacent stacks; gate for safety
    import fsspec
except ImportError:  # pragma: no cover
    fsspec = None


@ray.remote
class BlobStoreActor:
    """The store: key -> bytes. One actor == one consistent namespace
    shared by every worker process that holds the handle."""

    def __init__(self):
        self.blobs: dict[str, bytes] = {}

    def put(self, key: str, data: bytes) -> None:
        self.blobs[key] = bytes(data)

    def get(self, key: str):
        return self.blobs.get(key)

    def size(self, key: str):
        b = self.blobs.get(key)
        return None if b is None else len(b)

    def delete(self, key: str) -> None:
        self.blobs.pop(key, None)

    def delete_prefix(self, prefix: str) -> None:
        for k in [k for k in self.blobs if k.startswith(prefix)]:
            del self.blobs[k]

    def keys(self, prefix: str = "") -> list[str]:
        return sorted(k for k in self.blobs if k.startswith(prefix))


def _norm(path: str) -> str:
    return path.strip("/")


if fsspec is not None:

    class _CommitOnClose(io.BytesIO):
        """Write buffer that PUTs the whole blob at close — multipart-
        upload semantics: nothing is visible until commit."""

        def __init__(self, handle, key: str):
            super().__init__()
            self._handle = handle
            self._key = key

        def close(self):
            if not self.closed:
                ray.get(self._handle.put.remote(self._key, self.getvalue()))
            super().close()

    class ActorObjectStoreFS(fsspec.AbstractFileSystem):
        """fsspec face of :class:`BlobStoreActor`; wrap in
        ``pafs.PyFileSystem(pafs.FSSpecHandler(...))`` for pyarrow. The
        instance only carries the actor handle, so it pickles into Ray
        tasks/actors cleanly (fsio.snapshot()/restore())."""

        protocol = "actorstore"
        cachable = False

        def __init__(self, handle, **kw):
            super().__init__(**kw)
            self.handle = handle

        # --- fsspec surface -------------------------------------------
        def _open(self, path, mode="rb", **kw):
            key = _norm(path)
            if "r" in mode and "+" not in mode:
                data = ray.get(self.handle.get.remote(key))
                if data is None:
                    raise FileNotFoundError(path)
                return io.BytesIO(data)
            if "w" in mode or "x" in mode:
                return _CommitOnClose(self.handle, key)
            raise NotImplementedError(f"mode {mode!r} on an object store")

        def info(self, path, **kw):
            key = _norm(path)
            size = ray.get(self.handle.size.remote(key))
            if size is not None:
                return {"name": key, "size": size, "type": "file"}
            if key == "" or ray.get(self.handle.keys.remote(key + "/")):
                return {"name": key, "size": 0, "type": "directory"}
            raise FileNotFoundError(path)

        def ls(self, path, detail=True, **kw):
            key = _norm(path)
            prefix = key + "/" if key else ""
            names = ray.get(self.handle.keys.remote(prefix))
            if not names and key and ray.get(
                    self.handle.size.remote(key)) is not None:
                out = [self.info(key)]
                return out if detail else [e["name"] for e in out]
            files, dirs = [], set()
            for k in names:
                rest = k[len(prefix):]
                if "/" in rest:
                    dirs.add(prefix + rest.split("/", 1)[0])
                else:
                    files.append(k)
            out = [self.info(f) for f in files]
            out += [{"name": d, "size": 0, "type": "directory"}
                    for d in sorted(dirs)]
            if not out and not (key == "" or names):
                raise FileNotFoundError(path)
            return out if detail else [e["name"] for e in out]

        def mkdir(self, path, create_parents=True, **kw):
            pass  # directories are virtual

        def makedirs(self, path, exist_ok=False):
            pass

        def rm_file(self, path):
            ray.get(self.handle.delete.remote(_norm(path)))

        def rm(self, path, recursive=False, maxdepth=None):
            key = _norm(path)
            if recursive:
                ray.get(self.handle.delete_prefix.remote(key + "/"))
            ray.get(self.handle.delete.remote(key))

        def rmdir(self, path):
            pass  # virtual

        def mv(self, *a, **kw):  # pragma: no cover - must never be hit
            raise NotImplementedError(
                "object stores have no rename; the commit protocol must "
                "be sentinel-last, not tmp+rename")

        def created(self, path):  # pragma: no cover
            raise NotImplementedError("no timestamps on the mock store")

        def modified(self, path):  # pragma: no cover
            raise NotImplementedError("no timestamps on the mock store")

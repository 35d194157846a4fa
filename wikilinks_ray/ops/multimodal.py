"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside. The Ray-side plumbing — schemas, actor-pool
stage shape, small-batch sizing for large payloads, output layout — is
real and tested; the actual codec work is STUBBED (the decode libraries
are not in this container): ``DecodeImage``/``DecodeAudio`` raise
``NotImplementedError`` unless constructed with ``fake=True``, in which
case a deterministic fake decoder (parses our own 16-byte fake header)
stands in so pipelines and tests exercise the full path.

Batch sizing rule for binary payloads: pick ``batch_size`` so
``batch_size × max_payload × concurrency`` fits the worker heap — for
1-10 MB images that means batch_size 8-64, far below the text default.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # "image" | "audio" | "video"
    ("payload", pa.binary()),         # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 if unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

_FAKE_MAGIC = b"FAKEIMG1"


def make_fake_image(media_id: int, width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake 'encoded image': 16-byte header + seeded bytes."""
    rng = np.random.default_rng(seed + media_id)
    body = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return _FAKE_MAGIC + struct.pack("<ii", width, height) + body


class DecodeImage:
    """Actor-pool decode stage: payload -> pixel features.

    Real decoders (PIL / cv2) are NOT available in this container; pass
    ``fake=True`` to decode the deterministic fake format (tests), else
    the first batch raises NotImplementedError with setup guidance.
    Output: (media_id, width, height, mean_intensity, phash) — the
    layout a real decoder would produce.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake
        if fake:
            self.magic = _FAKE_MAGIC

    def _decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires PIL/cv2 (not in this container); "
                "construct DecodeImage(fake=True) for the deterministic "
                "fake codec, or install a decoder and replace this method"
            )
        assert payload[:8] == self.magic, "not a fake image payload"
        w, h = struct.unpack("<ii", payload[8:16])
        px = np.frombuffer(payload[16:16 + w * h], dtype=np.uint8)
        return w, h, px

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        w_out, h_out, mi, ph = [], [], [], []
        for p in payloads:
            w, h, px = self._decode(p)
            w_out.append(w)
            h_out.append(h)
            mi.append(float(px.mean()) if len(px) else 0.0)
            ph.append(hashlib.md5(px.tobytes()).hexdigest()[:16])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(w_out, pa.int32()),
            "height": pa.array(h_out, pa.int32()),
            "mean_intensity": pa.array(mi, pa.float64()),
            "phash": pa.array(ph, pa.string()),
        })


class ResizeImage:
    """payload -> resized payload (fake codec: nearest-neighbor subsample).
    Demonstrates the binary-in/binary-out actor stage with small batches."""

    def __init__(self, target: tuple[int, int] = (8, 8), fake: bool = False):
        self.target = target
        self.dec = DecodeImage(fake=fake)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = []
        tw, th = self.target
        for p in payloads:
            w, h, px = self.dec._decode(p)
            img = px.reshape(h, w)
            ys = (np.arange(th) * h) // th
            xs = (np.arange(tw) * w) // tw
            small = img[np.ix_(ys, xs)]
            out.append(_FAKE_MAGIC + struct.pack("<ii", tw, th) + small.tobytes())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(out, pa.binary()),
        })


class FrameSampler:
    """fake 'video' = concatenated fake images; emit every Nth frame row.
    Real implementation would call ffmpeg/pyav — stubbed identically."""

    def __init__(self, every: int = 2, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "video frame sampling requires pyav/ffmpeg (not in this "
                "container); construct FrameSampler(fake=True) for tests"
            )
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        m_out, f_out, p_out = [], [], []
        for mid, p in zip(ids, payloads):
            frames = []
            off = 0
            while off < len(p):
                assert p[off:off + 8] == _FAKE_MAGIC
                w, h = struct.unpack("<ii", p[off + 8:off + 16])
                end = off + 16 + w * h
                frames.append(p[off:end])
                off = end
            for fi in range(0, len(frames), self.every):
                m_out.append(mid)
                f_out.append(fi)
                p_out.append(frames[fi])
        return pa.table({
            "media_id": pa.array(m_out, pa.int64()),
            "frame_index": pa.array(f_out, pa.int64()),
            "payload": pa.array(p_out, pa.binary()),
        })

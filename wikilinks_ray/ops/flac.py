"""FLAC codec — REAL and dependency-free (numpy + stdlib),
correctness-grade.

- :func:`decode_flac`: native-FLAC streams -> interleaved int32
  samples. Supports every subframe type of the format (CONSTANT,
  VERBATIM, FIXED orders 0-4, LPC orders 1-32), both rice residual
  methods (4- and 5-bit parameters, escape-to-raw partitions, any
  partition order), wasted bits, all stereo decorrelations
  (left/side, right/side, mid/side), fixed and variable blocking
  strategies, 8-24-bit sample sizes, and CRC-8 (frame header) +
  CRC-16 (whole frame) verification. Ogg-encapsulated FLAC and
  ID3-prefixed files are rejected with a ``ValueError`` naming the
  gap.
- :func:`encode_flac`: int samples -> valid native FLAC using
  CONSTANT subframes for flat blocks and VERBATIM otherwise —
  uncompressed but LOSSLESS, so ``decode(encode(x)) == x`` exactly;
  the round-trip twin for tests and fixtures. The richer subframe
  shapes (fixed + rice partitions, mid/side) are exercised by a
  test-side encoder sharing this module's bit writer.

Like ``ops/jpeg``, the bit-level loops are sequential Python —
correctness-grade for tests/small assets; bulk compressed audio routes
through the pyav probe when installed (``ops/multimodal.DecodeAudio``
prefers... actually probes pyav only when a payload is neither WAV nor
FLAC). Format reference: the public FLAC format specification
(RFC 9639 / flac.sourceforge spec).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- CRCs (FLAC polynomials) ----------------------------------------------


def _make_crc8_table() -> list[int]:
    tbl = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _make_crc16_table() -> list[int]:
    tbl = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---- bit I/O (MSB-first, byte-aligned frames) ------------------------------


class _Bits:
    def __init__(self, data: bytes, byte_pos: int = 0):
        self.d = data
        self.pos = byte_pos  # byte index
        self.bit = 0         # bit index within byte (0 = MSB)

    def read(self, n: int) -> int:
        v = 0
        d = self.d
        while n:
            if self.pos >= len(d):
                raise ValueError("corrupt FLAC: bitstream ended early")
            take = min(n, 8 - self.bit)
            cur = d[self.pos]
            v = (v << take) | ((cur >> (8 - self.bit - take))
                               & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def write_signed(self, v: int, n: int) -> None:
        self.write(v + (1 << n) if v < 0 else v, n)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's UTF-8-style frame/sample number (up to 7 bytes)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("corrupt FLAC: bad UTF-8 coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("corrupt FLAC: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(bw: _BitW, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    seq = []
    nbytes = 2
    while v >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    shifts = [(nbytes - 1 - i) * 6 for i in range(nbytes)]
    lead = (0xFF << (8 - nbytes)) & 0xFF | (v >> shifts[0])
    seq.append(lead)
    for s in shifts[1:]:
        seq.append(0x80 | ((v >> s) & 0x3F))
    for b in seq:
        bw.write(b, 8)


_BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATE_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                     6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                     11: 96000}
_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}

_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


# ---- decoder ---------------------------------------------------------------


def decode_flac(payload: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC -> (sample_rate, n_channels, interleaved int32 samples).
    Truncated/corrupt payloads always raise ``ValueError``
    (fuzz-pinned), never a stray struct/index error."""
    try:
        return _decode_flac(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt/truncated FLAC: {e}") from e


def _decode_flac(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload[:3] == b"ID3":
        raise ValueError("ID3-prefixed FLAC needs a tag-aware reader")
    if payload[:4] == b"OggS":
        raise ValueError("Ogg-encapsulated FLAC needs pyav")
    if payload[:4] != b"fLaC":
        raise ValueError("not a native FLAC payload")
    pos = 4
    si = None
    while pos + 4 <= len(payload):  # metadata blocks
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            b = _Bits(body)
            b.read(16)  # min blocksize
            b.read(16)  # max blocksize
            b.read(24)
            b.read(24)
            rate = b.read(20)
            ch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            si = (rate, ch, bps, total)
        pos += 4 + blen
        if last:
            break
    if si is None:
        raise ValueError("corrupt FLAC: no STREAMINFO")
    si_rate, si_ch, si_bps, total = si
    chans_out: list[list[np.ndarray]] = []
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        frame, pos = _decode_frame(payload, pos, si)
        if frame is None:
            break
        rate, blk = frame
        chans_out.append(blk)
        got += len(blk[0])
    if not chans_out:
        raise ValueError("corrupt FLAC: no frames decoded")
    planes = [np.concatenate([f[c] for f in chans_out])
              for c in range(si_ch)]
    if total:
        planes = [p[:total] for p in planes]
    inter = np.empty(len(planes[0]) * si_ch, np.int32)
    for c, p in enumerate(planes):
        inter[c::si_ch] = p
    return si_rate, si_ch, inter


def _decode_frame(payload, pos, si):
    si_rate, si_ch, si_bps, _ = si
    start = pos
    bits = _Bits(payload, pos)
    sync = bits.read(14)
    if sync != 0x3FFE:
        raise ValueError("corrupt FLAC: lost frame sync")
    bits.read(1)  # reserved
    bits.read(1)  # blocking strategy (number semantics only)
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_asgn = bits.read(4)
    ss_code = bits.read(3)
    bits.read(1)  # reserved
    _read_utf8_number(bits)
    if bs_code == 0:
        raise ValueError("corrupt FLAC: reserved blocksize code")
    elif bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODE[bs_code]
    if sr_code == 0:
        pass
    elif sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    elif sr_code == 15:
        raise ValueError("corrupt FLAC: invalid sample-rate code")
    bps = si_bps if ss_code == 0 else _SAMPLE_SIZE_CODE.get(ss_code)
    if bps is None:
        raise ValueError("reserved FLAC sample-size code")
    hdr_end = bits.pos + (1 if bits.bit else 0)
    want_crc8 = bits.read(8)
    if crc8(payload[start:hdr_end]) != want_crc8:
        raise ValueError("corrupt FLAC: frame header CRC-8 mismatch")
    if ch_asgn <= 7:
        nch = ch_asgn + 1
        bps_per = [bps] * nch
    elif ch_asgn in (8, 9, 10):
        nch = 2
        # the SIDE channel carries one extra bit
        bps_per = [bps, bps + 1] if ch_asgn in (8, 10) else [bps + 1, bps]
    else:
        raise ValueError("reserved FLAC channel assignment")
    if nch != si_ch:
        raise ValueError("corrupt FLAC: frame/STREAMINFO channel mismatch")
    sub = [_decode_subframe(bits, blocksize, bps_per[c]) for c in range(nch)]
    bits.align()
    frame_end = bits.pos
    want_crc16 = bits.read(16)
    if crc16(payload[start:frame_end]) != want_crc16:
        raise ValueError("corrupt FLAC: frame CRC-16 mismatch")
    if ch_asgn == 8:      # left/side
        left = sub[0]
        right = left - sub[1]
        sub = [left, right]
    elif ch_asgn == 9:    # right/side (side first)
        right = sub[1]
        left = right + sub[0]
        sub = [left, right]
    elif ch_asgn == 10:   # mid/side
        side = sub[1]
        mid2 = (sub[0] << 1) | (side & 1)
        sub = [(mid2 + side) >> 1, (mid2 - side) >> 1]
    return (si_rate, sub), bits.pos


def _decode_subframe(bits: _Bits, n: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("corrupt FLAC: subframe pad bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if stype == 0:      # CONSTANT
        out = np.full(n, bits.read_signed(bps), np.int64)
    elif stype == 1:    # VERBATIM
        out = np.array([bits.read_signed(bps) for _ in range(n)], np.int64)
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warm = [bits.read_signed(bps) for _ in range(order)]
        res = _decode_residual(bits, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFFS[order]
        for i in range(order, n):
            p = 0
            for j, c in enumerate(coefs):
                p += c * out[i - 1 - j]
            out[i] = res[i - order] + p
    elif 32 <= stype <= 63:  # LPC, order 1-32
        order = stype - 31
        warm = [bits.read_signed(bps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("corrupt FLAC: invalid LPC precision code")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("corrupt FLAC: negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _decode_residual(bits, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        for i in range(order, n):
            p = 0
            for j, c in enumerate(coefs):
                p += c * out[i - 1 - j]
            out[i] = res[i - order] + (p >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    return (out << wasted) if wasted else out


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("corrupt FLAC: partition order mismatch")
    out = np.empty(blocksize - order, np.int64)
    w = 0
    for p in range(nparts):
        cnt = (blocksize >> porder) - (order if p == 0 else 0)
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for i in range(cnt):
                out[w + i] = bits.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                q = bits.unary()
                v = (q << param) | bits.read(param)
                out[w + i] = (v >> 1) ^ -(v & 1)  # zigzag
        w += cnt
    return out


# ---- encoder (CONSTANT/VERBATIM subframes — lossless, uncompressed) --------


def encode_flac(samples: np.ndarray, sample_rate: int = 16_000,
                bps: int = 16, block_size: int = 4096) -> bytes:
    """Interleaved int samples (or (n,) mono / (n, ch)) -> native FLAC.

    Each block uses a CONSTANT subframe when a channel is flat and
    VERBATIM otherwise — valid, lossless FLAC that every reader
    (including :func:`decode_flac`) reproduces bit-exactly."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if s.min() < lo or s.max() > hi:
        raise ValueError(f"samples exceed {bps}-bit range")
    out = bytearray(b"fLaC")
    siw = _BitW()
    siw.write(block_size, 16)
    siw.write(block_size, 16)
    siw.write(0, 24)
    siw.write(0, 24)
    siw.write(sample_rate, 20)
    siw.write(ch - 1, 3)
    siw.write(bps - 1, 5)
    siw.write(n, 36)
    body = siw.bytes() + b"\x00" * 16  # MD5 unset (all-zero = unknown)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start:start + block_size]
        out += _encode_frame(blk, fi, bps)
    return bytes(out)


def _encode_frame(blk: np.ndarray, frame_no: int, bps: int) -> bytes:
    nblk, ch = blk.shape
    bw = _BitW()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)   # reserved
    bw.write(0, 1)   # fixed blocking strategy -> frame number
    bw.write(7, 4)   # blocksize: 16-bit value - 1 follows
    bw.write(0, 4)   # sample rate: from STREAMINFO
    bw.write(ch - 1, 4)  # independent channels
    bw.write(0, 3)   # sample size: from STREAMINFO
    bw.write(0, 1)   # reserved
    _write_utf8_number(bw, frame_no)
    bw.write(nblk - 1, 16)
    hdr = bw.bytes()  # aligned: 14+1+1+4+4+4+3+1 = 32 bits + utf8 + 16
    hdr += bytes([crc8(hdr)])
    body = _BitW()
    for c in range(ch):
        col = blk[:, c]
        body.write(0, 1)
        if (col == col[0]).all():
            body.write(0, 6)   # CONSTANT
            body.write(0, 1)   # no wasted bits
            body.write_signed(int(col[0]), bps)
        else:
            body.write(1, 6)   # VERBATIM
            body.write(0, 1)
            for v in col:
                body.write_signed(int(v), bps)
    frame = hdr + body.bytes()
    return frame + struct.pack(">H", crc16(frame))

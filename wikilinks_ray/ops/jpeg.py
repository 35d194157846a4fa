"""JPEG codec (sequential baseline AND progressive) — REAL and
dependency-free (numpy + stdlib), correctness-grade.

- :func:`decode_jpeg_baseline`: SOF0/SOF1 sequential and SOF2
  PROGRESSIVE JPEG -> grayscale pixels. Huffman and quantization
  tables are read FROM THE FILE (DHT/DQT), so interop with real
  encoders does not depend on any table constants here. Supports
  1-component (grayscale) and 3-component YCbCr with any 1-4 sampling
  factors, restart intervals, 0xFF00 byte unstuffing, and the full
  progressive feature set: spectral selection, successive
  approximation (DC + AC refinement scans, T.81 G.2), and EOB runs.
  All scans accumulate into per-component coefficient planes; one
  vectorized dequantize+IDCT reconstructs at the end. The returned
  plane is the Y component — identical (±1 rounding) to PIL's
  ``convert("L")``, since 601 luma of YCbCr->RGB is Y by construction.
  Honestly rejected with a ``ValueError`` naming the gap: arithmetic
  coding, 12-bit precision, 16-bit quant tables, lossless and
  hierarchical modes.
- :func:`encode_jpeg_baseline`: grayscale -> single-component baseline
  JFIF (Annex-K tables at an IJG-style quality scale). The lossy
  round-trip ``decode(encode(px))`` is pinned by test to small error.

The entropy decode is a sequential Python-loop bit reader —
correctness-grade for tests/small assets; bulk corpora should route
through the PIL probe when available (``ops/multimodal.DecodeImage``
prefers PIL). Reference for the format: ITU-T T.81 (public spec);
tables below are its Annex K examples.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- shared constants ------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# Annex K luminance quantization table (row-major)
_QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

# Annex K typical Huffman tables, luminance (BITS = counts per code
# length 1..16, then the symbol list)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: spatial -> A @ X @ A.T."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    A = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    A[0, :] *= 1 / np.sqrt(2)
    return A


_A = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical JPEG Huffman table."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


# ---- decoder ---------------------------------------------------------------

class _HuffTable:
    """Canonical decode table: per-length min code / max code / symbol
    index — the classic T.81 F.2.2.3 DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        vi = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = vi
                self.mincode[length] = code
                code += bits[length - 1]
                vi += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker. ``restart()`` realigns past RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad with zeros past the end (T.81 F.2.2.5)
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def decode_symbol(self, tbl: _HuffTable) -> int:
        code = self.read(1)
        for length in range(1, 17):
            if tbl.maxcode[length] >= code >= tbl.mincode[length]:
                return tbl.vals[tbl.valptr[length] + code - tbl.mincode[length]]
            code = (code << 1) | self.read(1)
        raise ValueError("corrupt JPEG: Huffman code longer than 16 bits")

    def restart(self) -> None:
        """Discard pad bits and consume the RSTn marker between restart
        intervals. The marker may not be buffered yet (the interval's
        decodes can finish before ``_fill`` reaches it) — scan forward
        to it in that case; raw 0xFF in entropy data is always either
        stuffed (FF 00) or a marker prefix, so the scan is unambiguous."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            d = self.data
            while self.pos + 1 < len(d):
                if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                    self.marker = d[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # past the 0xFF Dn
            self.marker = None


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a ``size``-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_baseline(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JPEG -> (width, height, flat uint8 GRAYSCALE pixels).
    Truncated/corrupt payloads always raise ``ValueError``
    (fuzz-pinned), never a stray struct/index error."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt/truncated JPEG: {e}") from e


class _JpegState:
    """Shared decode state across scans: coefficient accumulators per
    component (zigzag order, MCU-padded block grid) plus geometry."""

    def __init__(self, w, h, comps, progressive):
        self.w, self.h, self.comps = w, h, comps
        self.progressive = progressive
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        self.coef = {cid: np.zeros((self.mcus_y * cv, self.mcus_x * ch, 64),
                                   np.int32)
                     for cid, ch, cv, _tq in comps}
        self.scanned = False

    def comp(self, cid):
        for c in self.comps:
            if c[0] == cid:
                return c
        raise ValueError("corrupt JPEG: scan names unknown component")

    def noninterleaved_blocks(self, cid):
        _, ch, cv, _ = self.comp(cid)
        cw = -(-self.w * ch // self.hmax)
        chh = -(-self.h * cv // self.vmax)
        return -(-chh // 8), -(-cw // 8)  # rows, cols


def _decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    st: _JpegState | None = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            depth, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if depth != 8:
                raise ValueError("12-bit JPEG precision needs PIL")
            if not 1 <= ncomp <= 4 or w == 0 or h == 0:
                raise ValueError("corrupt JPEG: bad SOF dimensions")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                ch_, cv_ = hv >> 4, hv & 15
                if not (1 <= ch_ <= 4 and 1 <= cv_ <= 4):
                    raise ValueError("corrupt JPEG: bad sampling factor")
                comps.append((cid, ch_, cv_, tq))
            st = _JpegState(w, h, comps, progressive=(m == 0xC2))
        elif m in (0xC6, 0xCA):
            raise ValueError("differential JPEG (SOF6/10) needs PIL")
        elif m in (0xC3, 0xC5, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("lossless/hierarchical/arithmetic JPEG needs PIL")
        elif m == 0xC9:
            raise ValueError("arithmetic-coded JPEG needs PIL")
        elif m == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                htabs[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + nv
        elif m == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization tables need PIL")
                qtabs[tq] = np.array(list(seg[p + 1:p + 65]), dtype=np.int64)
                p += 65
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS — entropy-coded data follows
            if st is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 15))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            band = (ss, se, ahal >> 4, ahal & 15) if st.progressive \
                else (0, 63, 0, 0)
            pos = _decode_sos(payload, pos + seglen, scan, band, st,
                              htabs, restart_interval)
            st.scanned = True
            continue  # pos is at the next marker's 0xFF
        pos += seglen
    if st is None or not st.scanned:
        raise ValueError("corrupt JPEG: no SOS scan found")
    return _reconstruct(st, qtabs)


def _decode_sos(payload, data_pos, scan, band, st, htabs,
                restart_interval) -> int:
    """Decode one scan's entropy data into ``st.coef``; returns the
    byte offset of the next marker. Handles sequential full-band scans
    and all four progressive scan kinds (DC/AC x first/refinement,
    spectral selection + successive approximation, EOB runs)."""
    ss, se, ah, al = band
    if ss > se or se > 63 or (ss == 0 and se != 0 and st.progressive):
        raise ValueError("corrupt JPEG: bad spectral band")
    dc_scan = ss == 0
    sel = {}
    for cs, td, ta in scan:
        dct = htabs.get((0, td))
        act = htabs.get((1, ta))
        if (dc_scan and ah == 0 and dct is None) or \
                (se > 0 and act is None):
            raise ValueError("corrupt JPEG: missing Huffman table")
        sel[cs] = (dct, act)
    br = _BitReader(payload, data_pos)
    pred = {cs: 0 for cs, *_ in scan}
    eob = [0]

    def do_block(cid, row, col):
        blk = st.coef[cid][row, col]
        dct_t, act_t = sel[cid]
        if not st.progressive:
            _block_dc_first(br, dct_t, pred, cid, blk, 0)
            _block_ac_first(br, act_t, blk, 1, 63, 0, eob)
        elif dc_scan and ah == 0:
            _block_dc_first(br, dct_t, pred, cid, blk, al)
        elif dc_scan:
            if br.read(1):
                blk[0] |= np.int32(1 << al)
        elif ah == 0:
            _block_ac_first(br, act_t, blk, ss, se, al, eob)
        else:
            _block_ac_refine(br, act_t, blk, ss, se, al, eob)

    if len(scan) > 1:  # interleaved: baseline full scans or DC scans
        if st.progressive and not dc_scan:
            raise ValueError("corrupt JPEG: interleaved progressive AC scan")
        n_mcu = 0
        for my in range(st.mcus_y):
            for mx in range(st.mcus_x):
                if restart_interval and n_mcu \
                        and n_mcu % restart_interval == 0:
                    br.restart()
                    pred.update({c: 0 for c in pred})
                    eob[0] = 0
                for cs, _td, _ta in scan:
                    _, ch, cv, _tq = st.comp(cs)
                    for by in range(cv):
                        for bx in range(ch):
                            do_block(cs, my * cv + by, mx * ch + bx)
                n_mcu += 1
    else:
        cid = scan[0][0]
        rows, cols = st.noninterleaved_blocks(cid)
        nblk = 0
        for row in range(rows):
            for col in range(cols):
                if restart_interval and nblk \
                        and nblk % restart_interval == 0:
                    br.restart()
                    pred.update({c: 0 for c in pred})
                    eob[0] = 0
                do_block(cid, row, col)
                nblk += 1
    # hunt the next marker (skip entropy padding; FF00 is stuffed data,
    # RSTn can only appear inside the scan)
    p = br.pos
    d = payload
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00 \
                and not 0xD0 <= d[p + 1] <= 0xD7:
            return p
        p += 1
    return len(d)


def _block_dc_first(br, dct_t, pred, cid, blk, al):
    size = br.decode_symbol(dct_t)
    diff = _extend(br.read(size), size)
    pred[cid] += diff
    blk[0] = pred[cid] << al


def _block_ac_first(br, act_t, blk, ss, se, al, eob):
    if eob[0] > 0:
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode_symbol(act_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eob[0] = (1 << r) - 1 + (br.read(r) if r else 0)
            break
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC index past band end")
        blk[k] = _extend(br.read(s), s) << al
        k += 1


def _block_ac_refine(br, act_t, blk, ss, se, al, eob):
    """T.81 G.2 successive-approximation AC refinement: correction bits
    for already-nonzero coefficients, run-positioned new ±1<<Al values,
    and EOB-run regions that still carry correction bits."""
    p1 = 1 << al
    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = br.decode_symbol(act_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError("corrupt JPEG: bad refinement size")
                val = p1 if br.read(1) else -p1
            elif r != 15:
                eob[0] = (1 << r) + (br.read(r) if r else 0)
                break
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.read(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eob[0] > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0 and br.read(1) and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else -p1)
            k += 1
        eob[0] -= 1


def _reconstruct(st: _JpegState, qtabs) -> tuple[int, int, np.ndarray]:
    """Dequantize + IDCT the accumulated coefficients; return the Y
    (first) component cropped to frame dims."""
    cid, ych, ycv, tq = st.comps[0]
    q = qtabs.get(tq)
    if q is None:
        raise ValueError("corrupt JPEG: missing quantization table")
    zz = st.coef[cid].astype(np.float64) * q  # (by, bx, 64) zigzag
    ny, nx = zz.shape[:2]
    nat = np.zeros_like(zz)
    nat[:, :, _ZIGZAG] = zz
    blocks = nat.reshape(ny, nx, 8, 8)
    spatial = np.einsum("ji,abjk,kl->abil", _A, blocks, _A)  # A.T X A
    plane = spatial.transpose(0, 2, 1, 3).reshape(ny * 8, nx * 8)
    if ych != st.hmax or ycv != st.vmax:
        plane = np.repeat(np.repeat(plane, st.vmax // ycv, axis=0),
                          st.hmax // ych, axis=1)
    gray = np.clip(np.rint(plane[:st.h, :st.w] + 128), 0, 255) \
        .astype(np.uint8)
    return st.w, st.h, gray.ravel()


# ---- encoder (grayscale, single component) --------------------------------

def _quality_table(quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QTBL_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255)


def _size_of(v: int) -> int:
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3) — required
        before emitting a restart marker."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _write_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                 dc_codes, ac_codes) -> int:
    """Entropy-encode one zigzag-ordered quantized block; returns the
    new DC predictor. Shared by the grayscale encoder and the
    test-side color/restart encoders."""
    diff = int(zz[0]) - pred
    s = _size_of(diff)
    c, ln = dc_codes[s]
    bw.write(c, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = np.flatnonzero(zz[1:])
    last = int(last_nz[-1]) + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        s = _size_of(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def encode_jpeg_baseline(pixels: np.ndarray, quality: int = 85) -> bytes:
    """(h, w) uint8 grayscale -> single-component baseline JFIF bytes."""
    h, w = pixels.shape
    q = _quality_table(quality)
    # pad to 8x8 blocks, edge-replicate
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(pixels.astype(np.float64) - 128.0,
                    ((0, H - h), (0, W - w)), mode="edge")
    blocks = padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    coeff = np.einsum("ij,abjk,lk->abil", _A, blocks, _A)
    quant = np.rint(coeff / q.reshape(8, 8)).astype(np.int64)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(H // 8):
        for bx in range(W // 8):
            zz = quant[by, bx].ravel()[_ZIGZAG]
            pred = _write_block(bw, zz, pred, dc_codes, ac_codes)
    data = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_q = q[_ZIGZAG]  # table transmitted in zigzag order
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in zz_q))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00] + _DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += data
    out += b"\xff\xd9"
    return bytes(out)

"""Pure numpy + stdlib baseline JPEG codec (r13) — clears the last
documented media seam (the r12 ``MediaDecodeNotAvailable`` carve-out
said entropy-coded formats "need external libs"; baseline JFIF needs
only a bit reader, the Annex K tables, and an 8×8 DCT, all of which
numpy does).

Scope (typed errors beyond it):

- encode: 8-bit grayscale (1 component) or RGB (3 components, 4:4:4 —
  no chroma subsampling), libjpeg-style quality scaling of the ITU
  T.81 Annex K quantization tables, the Annex K "typical" Huffman
  tables, JFIF headers, byte stuffing.
- decode: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
  4:4:4 sampling, optional restart markers. Progressive (SOF2),
  arithmetic coding, 12-bit, and subsampled chroma raise ``ValueError``
  — the engine's multimodal layer maps that to its typed seam.

The entropy loop is per-symbol Python (fine for the engine's
test/feature-extraction scale — this is the UDF slow path by design);
DCT/IDCT, quantization, color transforms, and padding are vectorized
numpy over whole block grids.

Cites: ITU-T T.81 Annex K tables (public spec); the scaling formula is
libjpeg's documented quality mapping. No code is derived from the
reference repo (it has no media handling — media columns are this
engine's LLM-pipeline superset).
"""

from __future__ import annotations

import struct

import numpy as np

# ITU T.81 Annex K quantization tables (natural row-major order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# zigzag scan: ZIGZAG[k] = (row, col) of the k-th coefficient
_zz = sorted(((r, c) for r in range(8) for c in range(8)),
             key=lambda rc: (rc[0] + rc[1],
                             rc[1] if (rc[0] + rc[1]) % 2 else rc[0]))
ZIGZAG = np.array(_zz, dtype=np.int64)

# Annex K "typical" Huffman tables: (bits[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

# 8×8 DCT-II basis: M[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_u = np.arange(8).reshape(8, 1)
_x = np.arange(8).reshape(1, 8)
DCT_M = np.cos((2 * _x + 1) * _u * np.pi / 16) / 2.0
DCT_M[0, :] *= 1.0 / np.sqrt(2.0)


def _canonical_codes(bits: list[int], values: list[int]
                     ) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]
                  ) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, values).items()}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    if not 1 <= quality <= 100:
        raise ValueError(f"jpeg quality must be in [1, 100], "
                         f"got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        q.append(np.clip(t, 1, 255).astype(np.int32))
    return q[0], q[1]


def _mag_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)   # 1-fill, per spec
        return bytes(self.buf)


def _entropy_block(row: np.ndarray, dc_codes, ac_codes,
                   bw: _BitWriter, dc_pred: int) -> int:
    """One zigzag coefficient row (64,) → Huffman bits."""
    dc = int(row[0])
    diff = dc - dc_pred
    dc_pred = dc
    size = _mag_category(diff)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bits = diff if diff >= 0 else diff + (1 << size) - 1
        bw.write(bits, size)
    ac = row[1:]
    nz = np.nonzero(ac)[0]
    prev = -1
    for idx in nz:
        run = int(idx) - prev - 1
        prev = int(idx)
        while run > 15:
            code, ln = ac_codes[0xF0]       # ZRL
            bw.write(code, ln)
            run -= 16
        v = int(ac[idx])
        size = _mag_category(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bits = v if v >= 0 else v + (1 << size) - 1
        bw.write(bits, size)
    if len(nz) == 0 or nz[-1] != 62:
        code, ln = ac_codes[0x00]           # EOB
        bw.write(code, ln)
    return dc_pred


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % mult, (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _zz_grid(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """8-padded (H, W) plane → (bh, bw, 64) quantized zigzag rows —
    DCT + quantization vectorized over the whole block grid."""
    plane = _pad_to(plane, 8) - 128.0
    hh, ww = plane.shape
    blocks = (plane.reshape(hh // 8, 8, ww // 8, 8)
                   .transpose(0, 2, 1, 3))
    coefs = np.einsum("ux,rcxy,vy->rcuv", DCT_M, blocks, DCT_M)
    q = np.round(coefs / qtab).astype(np.int64)
    return q[:, :, ZIGZAG[:, 0], ZIGZAG[:, 1]]


def _dht_segment(tc: int, th: int, table) -> bytes:
    bits, values = table
    payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(arr: np.ndarray, quality: int = 75,
                subsampling: str = "4:4:4") -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → baseline JFIF bytes
    (Annex K Huffman tables). ``subsampling``: ``"4:4:4"`` (default,
    bit-friendliest) or ``"4:2:0"`` (2×2 box-mean chroma — the
    web-default layout, RGB only)."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3) \
            or (arr.ndim == 3 and arr.shape[2] != 3):
        raise ValueError("encode_jpeg takes uint8 (H, W) or (H, W, 3)")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r} "
                         "(4:4:4 or 4:2:0)")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    ql, qc = _quality_tables(quality)
    gray = arr.ndim == 2
    sub420 = subsampling == "4:2:0" and not gray
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r = arr[..., 0].astype(np.float64)
        g = arr[..., 1].astype(np.float64)
        b = arr[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sub420:
            yp = _pad_to(y, 16)
            hh, ww = yp.shape
            def down(p):
                p = _pad_to(p, 16)
                return p.reshape(hh // 2, 2, ww // 2, 2).mean(
                    axis=(1, 3))
            planes = [yp, down(cb), down(cr)]
        else:
            planes = [y, cb, cr]
    y_samp = 0x22 if sub420 else 0x11

    out = bytearray()
    out += b"\xff\xd8"                                  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))                            # APP0
    for tid, tab in ((0, ql),) + (() if gray else ((1, qc),)):
        zzvals = tab[ZIGZAG[:, 0], ZIGZAG[:, 1]]
        out += (b"\xff\xdb" + struct.pack(">H", 67)
                + bytes([tid]) + bytes(int(v) for v in zzvals))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, y_samp if cid == 1 else 0x11,
                      0 if cid == 1 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA) + _dht_segment(1, 0, AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA)
        out += _dht_segment(1, 1, AC_CHROMA)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    dc_l = _canonical_codes(*DC_LUMA)
    ac_l = _canonical_codes(*AC_LUMA)
    dc_c = _canonical_codes(*DC_CHROMA)
    ac_c = _canonical_codes(*AC_CHROMA)
    grids = [_zz_grid(p, ql if ci == 0 else qc)
             for ci, p in enumerate(planes)]
    preds = [0] * ncomp
    if not sub420:
        # MCU = one block per component, interleaved
        bh, bwid = grids[0].shape[:2]
        for by in range(bh):
            for bx in range(bwid):
                for ci in range(ncomp):
                    dc_t, ac_t = (dc_l, ac_l) if ci == 0 \
                        else (dc_c, ac_c)
                    preds[ci] = _entropy_block(
                        grids[ci][by, bx], dc_t, ac_t, bw, preds[ci])
    else:
        # MCU = 4 luma blocks (2×2, row-major) + Cb + Cr
        mh, mw = grids[1].shape[:2]
        for my in range(mh):
            for mx in range(mw):
                for v in range(2):
                    for hh2 in range(2):
                        preds[0] = _entropy_block(
                            grids[0][2 * my + v, 2 * mx + hh2],
                            dc_l, ac_l, bw, preds[0])
                preds[1] = _entropy_block(grids[1][my, mx],
                                          dc_c, ac_c, bw, preds[1])
                preds[2] = _entropy_block(grids[2][my, mx],
                                          dc_c, ac_c, bw, preds[2])
    out += bw.flush()
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else 0xD9
                if nxt == 0x00:
                    self.pos += 1          # stuffed
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via resync()
                    self.pos -= 1
                    byte = None
                else:
                    self.pos -= 1          # EOI / next segment
                    byte = None
            if byte is None:
                break
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                return 0                   # pad past the end, per spec
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def resync(self) -> None:
        """Skip to just after a restart marker, byte-aligned."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF \
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code in entropy stream")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) \
        else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (H, W) grayscale or (H, W, 3) RGB.
    Typed ValueError for progressive/arithmetic/subsampled/12-bit
    inputs (the multimodal layer surfaces that as its decode seam)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    comps: list[tuple[int, int, int]] = []   # (id, sampling, qid)
    scan = None
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + ln]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                if prec != 0:
                    raise ValueError("jpeg: 16-bit quant tables are "
                                     "not supported (baseline subset)")
                vals = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                t = np.zeros((8, 8), dtype=np.int32)
                t[ZIGZAG[:, 0], ZIGZAG[:, 1]] = vals
                qtabs[tid] = t
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17:p + 17 + nvals])
                tab = _decode_table(bits, values)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                p += 17 + nvals
        elif marker == 0xC0:
            prec = seg[0]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision is "
                                 "supported (baseline subset)")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError("jpeg: 1 or 3 components only")
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i:9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(
                        "jpeg: sampling factors above 2 are not "
                        "supported (4:4:4/4:2:2/4:2:0 subset)")
                comps.append((cid, hi, vi, qid))
            frame = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline sequential DCT (SOF0) is "
                "supported — progressive/arithmetic inputs are out of "
                "the pure-numpy subset")
        elif marker == 0xDD:
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i:3 + 2 * i]
                scan.append((cid, tsel >> 4, tsel & 0x0F))
            pos += ln
            break
        pos += ln
    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    h, w, nc = frame
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(data[pos:])
    # per-component zigzag grids sized by the MCU lattice
    zz_grids = [np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                for _, hi, vi, _ in comps]
    preds = [0] * nc
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu and mcu % restart == 0:
                br.resync()
                preds = [0] * nc
            mcu += 1
            for ci in range(nc):
                _, hi, vi, _ = comps[ci]
                _, dcid, acid = scan[ci]
                for v in range(vi):
                    for hh2 in range(hi):
                        s = _huff_decode(br, dc_tabs[dcid])
                        diff = _extend(br.read_bits(s), s)
                        preds[ci] += diff
                        row = zz_grids[ci][my * vi + v,
                                           mx * hi + hh2]
                        row[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, ac_tabs[acid])
                            if sym == 0x00:            # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if sym == 0xF0:            # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "jpeg: AC run past block end")
                            row[k] = _extend(br.read_bits(size), size)
                            k += 1
    planes = []
    for ci in range(nc):
        _, hi, vi, qid = comps[ci]
        qt = qtabs[qid].astype(np.float64)
        gh, gw = zz_grids[ci].shape[:2]
        blocks = np.zeros((gh, gw, 8, 8), dtype=np.float64)
        blocks[:, :, ZIGZAG[:, 0], ZIGZAG[:, 1]] = zz_grids[ci]
        blocks *= qt
        pix = np.einsum("xu,rcuv,yv->rcxy", DCT_M.T, blocks, DCT_M.T)
        grid = (pix.transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8))
        # upsample subsampled components back to the luma lattice
        if vmax // vi > 1:
            grid = np.repeat(grid, vmax // vi, axis=0)
        if hmax // hi > 1:
            grid = np.repeat(grid, hmax // hi, axis=1)
        planes.append(grid[:h, :w] + 128.0)
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

"""Baseline JPEG codec — pure numpy + stdlib, no external dependency.

This fills the compressed-image plug point left in
``operators/multimodal.py`` (the container has no pillow/ffmpeg): a
REAL ITU-T.81 baseline sequential DCT codec — marker parse (SOI /
DQT / SOF0 / DHT / SOS / EOI), canonical Huffman decode with byte
de-stuffing, DC differential + AC run-length entropy coding,
dequantization, zigzag, 2-D IDCT, level shift — the same pipeline
libjpeg runs, minus chroma subsampling (4:4:4 only) and progressive
scans (both rejected with ``ValueError``, not silently mis-decoded).

All tables are the public JPEG spec's Annex K examples (quantization
+ typical Huffman tables). Reference parity: the reference repo
ships no image decoding at all — this module exists for the
LLM-training-data multimodal requirement, where image bytes ride
opaque parquet BINARY columns and decode runs inside bounded Arrow
``mapInPandas`` batches (see ``operators/multimodal.py``).

Exactness note (what the oracle gate relies on): JPEG is lossy, but
an image that is CONSTANT within each 8x8 block has a single DC
coefficient per block (all AC are exactly 0 in IEEE arithmetic —
the FDCT of a constant block is DC-only), and with a flat
quantization table (all 1s) the DC value ``8*k`` is an exact
integer. Such images therefore round-trip BIT-EXACTLY through the
full entropy-coding pipeline, which is what lets a DuckDB SQL
oracle hash-check the decoder's pixel output (see
``plans/multimodal_queries.py:media_decode_jpeg``). Arbitrary
images round-trip within a small epsilon (property-tested).
"""

from __future__ import annotations

import numpy as np

# --- spec tables (JPEG Annex K — public standard constants) ---------------

#: zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient.
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.1 luminance quantization table (quality ~50), zigzag order
#: not applied — stored in natural row-major order here.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

#: flat table — near-lossless; DC-only blocks round-trip exactly.
QUANT_FLAT = np.ones((8, 8), dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the spec's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# orthonormal 8-point DCT-II matrix: D @ block @ D.T == JPEG FDCT.
def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    d[0] /= np.sqrt(2.0)
    return d


_D = _dct_matrix()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    """DC/AC magnitude category: number of bits in |v|."""
    return int(abs(v)).bit_length()


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = (px[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _component_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(h, w) float plane -> (n_by, n_bx, 8, 8) quantized int coeffs."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coeffs = np.einsum("ux,nmxy,vy->nmuv", _D, blocks, _D)
    return np.round(coeffs / quant).astype(np.int64)


def _encode_block(
    wr: _BitWriter,
    coeffs: np.ndarray,
    pred_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = coeffs.ravel()[_ZZ]
    diff = int(zz[0]) - pred_dc
    cat = _category(diff)
    code, ln = dc_codes[cat]
    wr.write(code, ln)
    if cat:
        wr.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zcode, zln = ac_codes[0xF0]  # ZRL
            wr.write(zcode, zln)
            run -= 16
        cat = _category(v)
        acode, aln = ac_codes[(run << 4) | cat]
        wr.write(acode, aln)
        wr.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        ecode, eln = ac_codes[0x00]  # EOB
        wr.write(ecode, eln)
    return int(zz[0])


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_segment(tq: int, quant: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(q) for q in quant.ravel()[_ZZ])
    return b"\xff\xdb" + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg(pixels: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline sequential JFIF JPEG (4:4:4, Annex K Huffman tables).
    ``quant`` defaults to :data:`QUANT_LUMA`; pass :data:`QUANT_FLAT`
    for near-lossless output (exact for blockwise-constant content).
    Output opens in any image viewer."""
    if quant is None:
        quant = QUANT_LUMA
    assert pixels.dtype == np.uint8
    color = pixels.ndim == 3
    h, w = pixels.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8  # pad to block multiples
    if color:
        planes = _rgb_to_ycbcr(pixels)
        planes = np.pad(planes, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        comps = [planes[..., i] for i in range(3)]
    else:
        comps = [np.pad(pixels.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")]

    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * 2

    quantized = [_component_blocks(c, quant) for c in comps]
    n_by, n_bx = quantized[0].shape[:2]

    wr = _BitWriter()
    preds = [0] * len(comps)
    for yb in range(n_by):
        for xb in range(n_bx):
            for ci, qc in enumerate(quantized):
                dc, ac = tables[ci] if color else tables[0]
                preds[ci] = _encode_block(wr, qc[yb, xb], preds[ci], dc, ac)
    entropy = wr.flush()

    ncomp = 3 if color else 1
    sof_comps = b"".join(
        bytes([cid + 1, 0x11, 0 if cid == 0 else 1]) for cid in range(ncomp)
    )
    # SOF records TRUE dims per spec; block padding is internal and the
    # decoder crops ceil(dim/8)*8 back down.
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp]) + sof_comps
    sos_comps = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11]) for cid in range(ncomp)
    )
    sos = bytes([ncomp]) + sos_comps + bytes([0, 63, 0])

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, quant)
    if color:
        out += _dqt_segment(1, quant)
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if color:
        out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-stream bit cursor over a pre-unpacked numpy bit array
    (one unpackbits per image beats a Python-level per-bit byte/shift
    dance ~3x — the decode loop is the only per-symbol Python in the
    whole pipeline)."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8)).tolist()
        self.pos = 0

    def read_bit(self) -> int:
        try:
            b = self.bits[self.pos]
        except IndexError:
            raise ValueError("entropy stream exhausted") from None
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.bits):
            raise ValueError("entropy stream exhausted")
        v = 0
        for b in self.bits[self.pos : end]:
            v = (v << 1) | b
        self.pos = end
        return v


def _read_huff(rd: _BitReader, table: dict[tuple[int, int], int]) -> int:
    bits, pos, n = rd.bits, rd.pos, len(rd.bits)
    code, ln = 0, 0
    get = table.get
    while ln < 17:
        if pos >= n:
            raise ValueError("entropy stream exhausted")
        code = (code << 1) | bits[pos]
        pos += 1
        ln += 1
        sym = get((ln, code))
        if sym is not None:
            rd.pos = pos
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes):
    """Decode a baseline sequential 4:4:4 JFIF JPEG to ``(width,
    height, pixels)`` — pixels is (h, w) uint8 for grayscale, (h, w,
    3) uint8 RGB for color. A REAL decoder: marker walk, DQT/DHT
    table load, canonical Huffman entropy decode with byte
    de-stuffing, DC prediction, AC run-length, dequantize, inverse
    zigzag, float IDCT, level shift. Progressive scans, chroma
    subsampling, 12-bit precision, and restart intervals raise
    ``ValueError`` (unsupported, never mis-decoded)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict[tuple[int, int], int]] = {}
    ac_tables: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, tq)])
    scan = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zzq = np.frombuffer(seg, dtype=np.uint8, count=64, offset=sp + 1)
                q = np.zeros(64, dtype=np.int64)
                q[_ZZ] = zzq
                quants[tq] = q.reshape(8, 8)
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                nval = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nval])
                (dc_tables if tc == 0 else ac_tables)[th] = _decode_table(bits, vals)
                sp += 17 + nval
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise ValueError("chroma subsampling unsupported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ncomp = seg[0]
            scan_tables = []
            for i in range(ncomp):
                _cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                scan_tables.append((tt >> 4, tt & 0x0F))
            scan_start = pos + 2 + seglen
            # de-stuff: FF00 -> FF; stop at any real marker
            entropy = bytearray()
            p = scan_start
            while p < len(data):
                b = data[p]
                if b == 0xFF:
                    nxt = data[p + 1] if p + 1 < len(data) else 0xD9
                    if nxt == 0x00:
                        entropy.append(0xFF)
                        p += 2
                        continue
                    break
                entropy.append(b)
                p += 1
            scan = (scan_tables, bytes(entropy))
            pos = p
            continue
        pos += 2 + seglen

    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    fh, fw, comps = frame
    scan_tables, entropy = scan
    n_by, n_bx = -(-fh // 8), -(-fw // 8)
    ph, pw = n_by * 8, n_bx * 8

    rd = _BitReader(entropy)
    ncomp = len(comps)
    coeffs = [np.zeros((n_by, n_bx, 8, 8), dtype=np.float64) for _ in range(ncomp)]
    preds = [0] * ncomp
    for yb in range(n_by):
        for xb in range(n_bx):
            for ci in range(ncomp):
                dct_id, act_id = scan_tables[ci]
                dc_t, ac_t = dc_tables[dct_id], ac_tables[act_id]
                zz = np.zeros(64, dtype=np.int64)
                cat = _read_huff(rd, dc_t)
                preds[ci] += _extend(rd.read_bits(cat), cat)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = _read_huff(rd, ac_t)
                    r, s = rs >> 4, rs & 0x0F
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(rd.read_bits(s), s)
                    k += 1
                block = np.zeros(64, dtype=np.float64)
                block[_ZZ] = zz
                q = quants[comps[ci][1]]
                coeffs[ci][yb, xb] = block.reshape(8, 8) * q

    planes = []
    for ci in range(ncomp):
        spatial = np.einsum("xu,nmuv,yv->nmxy", _D.T, coeffs[ci], _D.T)
        plane = spatial.transpose(0, 2, 1, 3).reshape(ph, pw) + 128.0
        planes.append(np.clip(np.rint(plane), 0, 255))
    if ncomp == 1:
        return fw, fh, planes[0][:fh, :fw].astype(np.uint8)
    ycbcr = np.stack(planes, axis=-1)[:fh, :fw]
    return fw, fh, _ycbcr_to_rgb(ycbcr)

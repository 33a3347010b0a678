"""Minimal baseline JPEG encoder — TEST HELPER ONLY.

Exists so the decoder tests can round-trip real JPEG bitstreams without
PIL. Correctness over compactness: it uses a deliberately trivial ("flat")
Huffman table that assigns every symbol 0..254 an 8-bit code and 255/256 a
9-bit code — valid canonical JPEG Huffman, terrible compression. Quant
tables are uniform. Supports grayscale and YCbCr 4:4:4 / 4:2:0, arbitrary
dimensions (edge-replication padding), and optional restart intervals.
"""

import struct

import numpy as np

# flat canonical Huffman: symbols 0..254 at 8 bits (codes 0..254), 255 at 9
# bits (code 510). bits[i] = number of codes of length i+1.
_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
_FLAT_VALS = list(range(255)) + [255]


def _flat_codes():
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(_FLAT_BITS[length - 1]):
            codes[_FLAT_VALS[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return codes


_CODES = _flat_codes()


def _dct_basis():
    u = np.arange(8)
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    scale = np.full(8, 0.5)
    scale[0] = 1.0 / (2 * np.sqrt(2.0))
    return scale[:, None] * c


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad_align(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _category(v):
    return int(abs(v)).bit_length()


def _emit_coeff_bits(bw, v, s):
    if s == 0:
        return
    bw.write(v if v >= 0 else v + (1 << s) - 1, s)


def _encode_block(bw, blk_zz, pred):
    """blk_zz: 64 quantized coeffs in zigzag order. Returns new DC pred."""
    dc = int(blk_zz[0])
    diff = dc - pred
    s = _category(diff)
    length, code = _CODES[s]
    bw.write(code, length)
    _emit_coeff_bits(bw, diff, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if blk_zz[k] != 0:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(blk_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = _CODES[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        length, code = _CODES[(run << 4) | s]
        bw.write(code, length)
        _emit_coeff_bits(bw, v, s)
        run = 0
    if last_nz < 63:
        length, code = _CODES[0x00]  # EOB
        bw.write(code, length)
    return dc


def _pad_to(img, mh, mw):
    h, w = img.shape
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    out = np.empty((ph, pw), img.dtype)
    out[:h, :w] = img
    out[h:, :w] = img[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _plane_blocks(plane, q, C):
    """plane -> (by, bx, 64) quantized zigzag coefficient grid."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64)
    blocks -= 128.0
    coeffs = np.einsum("ux,mnxy,vy->mnuv", C, blocks, C, optimize=True)
    qz = np.round(coeffs / q.reshape(8, 8)).astype(np.int32)
    flat = qz.reshape(by, bx, 64)
    zz = np.empty_like(flat)
    for k, src in enumerate(_ZIGZAG):
        zz[:, :, k] = flat[:, :, src]
    return zz


def encode_jpeg(img, quant=8, subsample=False, restart_interval=0):
    """Encode a (H, W) grayscale or (H, W, 3) RGB uint8 array as baseline
    JPEG. ``quant``: uniform quantizer step (1 = near-lossless).
    ``subsample=True`` uses 4:2:0 chroma; ``subsample="422"`` uses 4:2:2.
    Returns bytes."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    H, W = img.shape[:2]
    C = _dct_basis()
    q = np.full(64, int(quant), np.int32)
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(q[k]) for k in range(64)
    )
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = {1: _pad_to(img, 8, 8)}
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsample == "422":
            # 4:2:2: chroma halved horizontally only
            comps = [(1, 2, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
            yp = _pad_to(y, 8, 16)
            cbp = _pad_to(cb, 8, 16)
            crp = _pad_to(cr, 8, 16)
            cbs = cbp.reshape(cbp.shape[0], cbp.shape[1] // 2, 2).mean(axis=2)
            crs = crp.reshape(crp.shape[0], crp.shape[1] // 2, 2).mean(axis=2)
            planes = {1: yp, 2: np.round(cbs), 3: np.round(crs)}
        elif subsample:
            comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
            yp = _pad_to(y, 16, 16)
            cbp = _pad_to(cb, 16, 16)
            crp = _pad_to(cr, 16, 16)
            # 2x2 mean chroma
            cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            planes = {1: yp, 2: np.round(cbs), 3: np.round(crs)}
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
            planes = {1: _pad_to(y, 8, 8), 2: _pad_to(cb, 8, 8), 3: _pad_to(cr, 8, 8)}
    # SOF0
    sof = struct.pack(">BHHB", 8, H, W, len(comps))
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: one flat table used as DC 0 and AC 0
    for tc in (0, 1):
        payload = bytes([tc << 4]) + bytes(_FLAT_BITS) + bytes(_FLAT_VALS)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([len(comps)])
    for cid, _, _, _ in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # entropy-coded data, MCU interleaved
    zz_grids = {cid: _plane_blocks(planes[cid], q, C) for cid, _, _, _ in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcux = planes[comps[0][0]].shape[1] // (8 * hmax) * hmax // comps[0][1]
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    bw = _BitWriter()
    pred = {cid: 0 for cid, _, _, _ in comps}
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.pad_align()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (n_rst & 7)])
            n_rst += 1
            pred = {cid: 0 for cid, _, _, _ in comps}
        my, mx = divmod(m, mcux)
        for cid, hi, vi, tq in comps:
            for v in range(vi):
                for hh in range(hi):
                    blk = zz_grids[cid][my * vi + v, mx * hi + hh]
                    pred[cid] = _encode_block(bw, blk, pred[cid])
    bw.pad_align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)

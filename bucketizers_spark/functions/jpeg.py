"""Baseline-sequential JPEG decoder (ITU-T T.81), stdlib + numpy only.

Real web crawls are overwhelmingly JPEG, so the multimodal seam needs a
real in-container JPEG path (VERDICT r5 #6) the same way PNG/netpbm/WAV
got one: exact, dependency-free, and honest about its envelope.

Supported: SOF0 baseline and SOF1 extended-sequential frames with 8-bit
samples; 1-component (grayscale) and 3-component (JFIF YCbCr) images;
arbitrary integral subsampling (4:4:4, 4:2:2, 4:2:0, ...); multiple
DQT/DHT segments, 8- and 16-bit quantizer precision; DRI restart
intervals with RSTn resync; FF00 byte stuffing; APPn/COM skipped.
Refused with NotImplementedError: progressive (SOF2), arithmetic coding
(SOF9+), lossless/hierarchical frames, 12-bit precision, and 4-component
(Adobe CMYK) scans — each a format family, not a corner case, and each
still behind the same ``_decode_pixels`` seam a production cluster fills
with PIL/turbojpeg.

Decode shape: marker walk → per-scan Huffman decode (canonical T.81
DECODE with mincode/maxcode/valptr) into per-component coefficient
blocks, then ONE vectorized dequant + dezigzag + 8x8 IDCT (an einsum
over all blocks of a component at once — the Python-serial part is only
the entropy decode, like PNG's per-byte unfilter), nearest-neighbor
chroma upsample (replication — T.81 leaves the filter to the decoder;
replication is the deterministic choice a test can replay exactly), and
the JFIF YCbCr→RGB matrix with round-half-up quantization to 8 bits.

Output matches the module contract of the other decoders: (h, w, c)
float64 in [0, 1].
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = linear (row*8+col) position of the k-th
# transmitted coefficient (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_SOF_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}
_SOF_LOSSLESS = {0xC3, 0xC7, 0xCB, 0xCF}
_SOF_ARITH = {0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
_SOF_ALL = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C (C[u, x]); a coefficient block
    B reconstructs as C.T @ B @ C."""
    C = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(1.0 / 8.0) if u == 0 else 0.5
        for x in range(8):
            C[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return C


_C = _dct_basis()


class _Huff:
    """Canonical Huffman table in T.81 DECODE form."""

    def __init__(self, bits: list[int], vals: bytes):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude v to its signed value."""
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _decode_sym(r: _BitReader, h: _Huff) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        if h.maxcode[ln] >= 0 and code <= h.maxcode[ln]:
            return h.vals[h.valptr[ln] + code - h.mincode[ln]]
    raise ValueError("invalid JPEG Huffman code")


def _decode_block(
    r: _BitReader, dc: _Huff, ac: _Huff, pred: int
) -> tuple[np.ndarray, int]:
    """One 8x8 block in zigzag order. Returns (coef[64], new DC pred)."""
    t = _decode_sym(r, dc)
    pred += _extend(r.receive(t), t)
    coef = np.zeros(64)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _decode_sym(r, ac)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC coefficient run past block end")
        coef[k] = _extend(r.receive(size), size)
        k += 1
    return coef, pred


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``pos``: unstuff FF00, split at RSTn
    (restart-interval resync points), stop at the next true marker.
    Returns (segments, position of that marker's FF)."""
    segs: list[bytearray] = [bytearray()]
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nb = data[i + 1] if i + 1 < n else 0xD9
            if nb == 0x00:
                segs[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= nb <= 0xD7:
                segs.append(bytearray())
                i += 2
                continue
            break
        segs[-1].append(b)
        i += 1
    return [bytes(s) for s in segs], i


def parse_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG to (h, w, c) float64 in [0, 1]
    (c = 1 grayscale, 3 RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(data)
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    while pos + 1 < n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no segment
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i)
                    i += 128
                qts[tq] = tbl.astype(np.float64)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = seg[i + 17 : i + 17 + nv]
                i += 17 + nv
                (dc_tabs if tc == 0 else ac_tabs)[th] = _Huff(bits, vals)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG sample precision {prec} (only 8-bit decodes "
                    "natively; run with fake=True or install PIL)"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in _SOF_ALL:
            kind = (
                "progressive"
                if marker in _SOF_PROGRESSIVE
                else "lossless/hierarchical"
                if marker in _SOF_LOSSLESS
                else "arithmetic-coded"
            )
            raise NotImplementedError(
                f"{kind} JPEG (SOF{marker - 0xC0}) not supported "
                "natively; run with fake=True or install PIL on the "
                "cluster"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — decode the scan and finish
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(frame[2]):
                # ADVICE r6: a legal baseline JPEG may carry
                # NON-INTERLEAVED scans (SOS component count < frame
                # component count, one scan per component). Decoding
                # such a scan as interleaved produces wrong pixels, and
                # the missing scan_tabs entries previously surfaced as
                # a bare KeyError — name the seam instead.
                raise NotImplementedError(
                    "non-interleaved JPEG scan (SOS components "
                    f"{ns} != frame components {len(frame[2])}) not "
                    "supported natively; run with fake=True or install "
                    "PIL on the cluster"
                )
            scan_tabs = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_tabs[cs] = (tt >> 4, tt & 0x0F)
            segs, _ = _split_entropy(data, pos)
            return _decode_scan(
                frame, scan_tabs, qts, dc_tabs, ac_tabs, segs,
                restart_interval,
            )
        # else: APPn / COM / unknown — skipped
    raise ValueError("JPEG has no scan (missing SOS)")


def _decode_scan(
    frame, scan_tabs, qts, dc_tabs, ac_tabs, segs, restart_interval
) -> np.ndarray:
    h, w, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError(
            f"{len(comps)}-component JPEG (CMYK/unknown) not supported "
            "natively; run with fake=True or install PIL on the cluster"
        )
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is ALWAYS non-interleaved —
        # the data unit is one 8x8 block and the declared sampling
        # factors do not apply (ADVICE r6: a grayscale frame with
        # factors > 1 previously decoded with interleaved MCU geometry
        # and produced wrong pixels).
        cid, _ch, _cv, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _, ch, cv, _tq in comps:
        if hmax % ch or vmax % cv:
            raise NotImplementedError(
                "non-integral JPEG chroma subsampling ratio"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # entropy decode: per component, a list of zigzag coefficient rows
    blocks: list[list[np.ndarray]] = [[] for _ in comps]
    preds = [0] * len(comps)
    reader = _BitReader(segs[0])
    seg_i = 0
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_i])
            preds = [0] * len(comps)
        for ci, (cid, ch, cv, _tq) in enumerate(comps):
            dc = dc_tabs[scan_tabs[cid][0]]
            ac = ac_tabs[scan_tabs[cid][1]]
            for _ in range(ch * cv):
                coef, preds[ci] = _decode_block(reader, dc, ac, preds[ci])
                blocks[ci].append(coef)
    # vectorized reconstruction per component
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        zz = np.stack(blocks[ci])  # (nb, 64) zigzag
        dq = zz * qts[tq][np.newaxis, :]
        b = np.zeros((zz.shape[0], 64))
        b[:, ZIGZAG] = dq  # de-zigzag
        b = b.reshape(-1, 8, 8)
        px = np.einsum("ux,nuv,vy->nxy", _C, b, _C, optimize=True) + 128.0
        # blocks → plane: MCU-major, then cv*ch blocks row-major in MCU
        pw, ph = mcux * ch * 8, mcuy * cv * 8
        plane = np.zeros((ph, pw))
        bi = 0
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for by in range(cv):
                for bx in range(ch):
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = px[bi]
                    bi += 1
        # nearest-neighbor upsample to full resolution, then crop
        plane = np.repeat(
            np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = planes[0][..., np.newaxis]
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bch = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, bch], axis=-1)
    # 8-bit quantization with round-half-up (matches _encode_p6's rule)
    out = np.floor(np.clip(out, 0.0, 255.0) + 0.5)
    return out / 255.0

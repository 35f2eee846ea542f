"""Baseline JPEG decoder (functions/jpeg.py): every payload is produced
by the test's own minimal baseline encoder (the same fixture pattern as
the PNG tests), and the decoder is pinned two ways — (1) EXACTLY against
an independent numpy replay of dequant + de-zigzag + IDCT + upsample +
YCbCr→RGB computed from the encoder's own quantized coefficients, and
(2) within a quantization-error bound of the source raster (roundtrip
quality sanity). Covers grayscale, 4:4:4 and 4:2:0 color, restart
intervals, 16-bit DQT precision, odd (non-MCU-multiple) sizes, the
progressive/arithmetic refusals, and the Spark image_features path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bucketizers_spark.functions.jpeg import ZIGZAG, parse_jpeg

# -- minimal baseline encoder (test fixture generator) -----------------

# single-length canonical Huffman tables: 12 DC categories at 4 bits,
# all 162 AC run/size symbols at 8 bits — code == index in vals
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_CODE = {v: (i, 4) for i, v in enumerate(_DC_VALS)}
_AC_CODE = {v: (i, 8) for i, v in enumerate(_AC_VALS)}


def _dct_c():
    C = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(1 / 8) if u == 0 else 0.5
        for x in range(8):
            C[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    return C


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per T.81


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _enc_block(bw: _BitWriter, zz: np.ndarray, pred: int) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _cat(diff)
    bw.put(*_DC_CODE[t])
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*_AC_CODE[0xF0])
            run -= 16
        s = _cat(v)
        bw.put(*_AC_CODE[(run << 4) | s])
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        bw.put(*_AC_CODE[0x00])  # EOB
    return dc


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _blocks_zz(plane: np.ndarray, q: np.ndarray, C: np.ndarray):
    """Quantized zigzag blocks of a (8a, 8b) plane, block row-major."""
    h, w = plane.shape
    out = {}
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            b = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
            B = C @ b @ C.T
            out[(y0 // 8, x0 // 8)] = np.round(
                B.reshape(-1)[ZIGZAG] / q
            ).astype(np.int64)
    return out


def encode_jpeg(
    arr: np.ndarray,
    *,
    subsample: tuple[int, int] = (1, 1),
    qluma: np.ndarray | None = None,
    qchroma: np.ndarray | None = None,
    restart: int = 0,
    dqt_16bit: bool = False,
):
    """Minimal baseline-sequential encoder. Returns (jpeg_bytes,
    per-component quantized zigzag block lists in MCU order, frame
    layout) so a test can replay the exact reconstruction."""
    C = _dct_c()
    h, w = arr.shape[:2]
    nch = arr.shape[2]
    qy = np.ones(64) if qluma is None else qluma.astype(np.float64)
    qc = qy if qchroma is None else qchroma.astype(np.float64)
    sh, sv = subsample
    if nch == 1:
        comps = [(1, 1, 1, 0)]  # id, ch, cv, tq
        hmax = vmax = 1
        a = arr[..., 0].astype(np.float64)
        planes = [a]
    else:
        a = arr.astype(np.float64)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [(1, sh, sv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        hmax, vmax = sh, sv
        # pad to MCU grid first, then box-average the chroma
        mx = -(-w // (8 * hmax)) * 8 * hmax
        my = -(-h // (8 * vmax)) * 8 * vmax
        yp = _pad_to(y, my, mx)
        cbp = _pad_to(cb, my, mx).reshape(
            my // sv, sv, mx // sh, sh
        ).mean(axis=(1, 3))
        crp = _pad_to(cr, my, mx).reshape(
            my // sv, sv, mx // sh, sh
        ).mean(axis=(1, 3))
        planes = [yp, cbp, crp]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qt = {0: qy} if nch == 1 else {0: qy, 1: qc}
    comp_blocks = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        plane = _pad_to(plane, mcuy * cv * 8, mcux * ch * 8)
        comp_blocks.append(_blocks_zz(plane, qt[tq], C))
    # entropy-encode in MCU-interleaved order
    bw = _BitWriter()
    preds = [0] * len(comps)
    entropy = bytearray()
    rst = 0
    mcu_order: list[list[np.ndarray]] = [[] for _ in comps]
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            bw.flush()
            entropy += bw.out
            entropy += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(comps)
        myc, mxc = divmod(m, mcux)
        for ci, (cid, ch, cv, tq) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    zz = comp_blocks[ci][(myc * cv + by, mxc * ch + bx)]
                    mcu_order[ci].append(zz)
                    preds[ci] = _enc_block(bw, zz, preds[ci])
    bw.flush()
    entropy += bw.out

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    for tq, q in qt.items():
        if dqt_16bit:
            body = bytes([(1 << 4) | tq]) + b"".join(
                struct.pack(">H", int(v)) for v in q
            )
        else:
            body = bytes([tq]) + bytes(int(v) for v in q)
        out += seg(0xDB, body)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += seg(0xC0, sof)
    dc_bits = [0] * 16
    dc_bits[3] = len(_DC_VALS)
    ac_bits = [0] * 16
    ac_bits[7] = len(_AC_VALS)
    out += seg(
        0xC4,
        bytes([0x00] + dc_bits) + bytes(_DC_VALS)
        + bytes([0x10] + ac_bits) + bytes(_AC_VALS),
    )
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    layout = (h, w, comps, mcux, mcuy, qt)
    return bytes(out), mcu_order, layout


def _reference_decode(mcu_order, layout) -> np.ndarray:
    """Independent replay: the pixels a correct decoder must produce
    from the encoder's quantized coefficients."""
    h, w, comps, mcux, mcuy, qt = layout
    C = _dct_c()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        plane = np.zeros((mcuy * cv * 8, mcux * ch * 8))
        bi = 0
        for m in range(mcux * mcuy):
            myc, mxc = divmod(m, mcux)
            for by in range(cv):
                for bx in range(ch):
                    zz = mcu_order[ci][bi].astype(np.float64) * qt[tq]
                    bi += 1
                    B = np.zeros(64)
                    B[ZIGZAG] = zz
                    px = C.T @ B.reshape(8, 8) @ C + 128.0
                    y0 = (myc * cv + by) * 8
                    x0 = (mxc * ch + bx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = px
        plane = np.repeat(
            np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = planes[0][..., None]
    else:
        y, cb, cr = planes
        out = np.stack(
            [
                y + 1.402 * (cr - 128),
                y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                y + 1.772 * (cb - 128),
            ],
            axis=-1,
        )
    return np.floor(np.clip(out, 0, 255) + 0.5) / 255.0


class TestJpegDecode:
    def test_grayscale_exact_vs_reference(self):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, (17, 23, 1), dtype=np.uint8)
        data, mcu, layout = encode_jpeg(arr)
        got = parse_jpeg(data)
        want = _reference_decode(mcu, layout)
        assert got.shape == (17, 23, 1)
        assert np.abs(got - want).max() <= 1.5 / 255  # float-ulp rounding
        # near-lossless at Q=1: roundtrip error bounded by DCT quant
        assert np.abs(got * 255 - arr).max() <= 4

    def test_color_444_and_420(self):
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)
        for sub in [(1, 1), (2, 2), (2, 1)]:
            data, mcu, layout = encode_jpeg(arr, subsample=sub)
            got = parse_jpeg(data)
            want = _reference_decode(mcu, layout)
            assert got.shape == (21, 19, 3)
            assert np.abs(got - want).max() <= 1.5 / 255, sub
        # 4:4:4 at Q=1 is near-lossless end to end
        data, _, _ = encode_jpeg(arr, subsample=(1, 1))
        assert np.abs(parse_jpeg(data) * 255 - arr).max() <= 6

    def test_quant_tables_and_16bit_dqt(self):
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        ql = np.linspace(1, 40, 64).round()
        qc = np.linspace(1, 60, 64).round()
        for wide in (False, True):
            data, mcu, layout = encode_jpeg(
                arr, subsample=(2, 2), qluma=ql, qchroma=qc,
                dqt_16bit=wide,
            )
            got = parse_jpeg(data)
            want = _reference_decode(mcu, layout)
            assert np.abs(got - want).max() <= 1.5 / 255

    def test_restart_intervals(self):
        rng = np.random.default_rng(6)
        arr = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
        data, mcu, layout = encode_jpeg(
            arr, subsample=(2, 2), restart=2
        )
        assert b"\xff\xd0" in data or b"\xff\xd1" in data
        got = parse_jpeg(data)
        want = _reference_decode(mcu, layout)
        assert np.abs(got - want).max() <= 1.5 / 255
        # same image without restarts decodes identically
        data2, _, _ = encode_jpeg(arr, subsample=(2, 2))
        assert np.array_equal(got, parse_jpeg(data2))

    def test_refusals_are_named(self):
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, (8, 8, 1), dtype=np.uint8)
        data, _, _ = encode_jpeg(arr)
        prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(NotImplementedError, match="progressive"):
            parse_jpeg(prog)
        arith = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
        with pytest.raises(NotImplementedError, match="arithmetic"):
            parse_jpeg(arith)
        with pytest.raises(ValueError, match="SOI"):
            parse_jpeg(b"\x00\x01" + data)

    def test_image_features_spark_path(self, spark):
        """JPEG payloads flow through the image seam end-to-end: dims,
        luma mean, and ahash computed from the decoded raster."""
        from bucketizers_spark.functions.multimodal import (
            MEDIA_SCHEMA,
            _ahash,
            image_features,
        )

        rng = np.random.default_rng(8)
        arr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        gray = rng.integers(0, 256, (18, 20, 1), dtype=np.uint8)
        jc, mcu_c, lay_c = encode_jpeg(arr, subsample=(2, 2))
        jg, mcu_g, lay_g = encode_jpeg(gray)
        df = spark.createDataFrame(
            [
                ("c", "image", jc, "image/jpeg", 32, 24, None),
                ("g", "image", jg, "image/jpeg", 20, 18, None),
            ],
            MEDIA_SCHEMA,
        )
        got = {
            r.media_id: r for r in image_features(df, fake=False).collect()
        }
        assert (got["c"].width, got["c"].height, got["c"].n_channels) == (
            32, 24, 3,
        )
        assert (got["g"].width, got["g"].height, got["g"].n_channels) == (
            20, 18, 1,
        )
        px = _reference_decode(mcu_c, lay_c)
        luma = (
            0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        )
        assert abs(got["c"].mean_luma - float(luma.mean())) < 2e-2
        gl = _reference_decode(mcu_g, lay_g)[..., 0]
        assert got["g"].phash == _ahash(gl)

    def test_resize_jpeg_to_p6(self, spark):
        """JPEG flows through the shared _decode_pixels seam into
        resize_image: JPEG in, exact box-average P6 out, pinned against
        resizing the reference reconstruction directly."""
        from bucketizers_spark.functions.multimodal import (
            MEDIA_SCHEMA,
            _resize_pixels,
            resize_image,
        )

        rng = np.random.default_rng(9)
        arr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        data, mcu, layout = encode_jpeg(arr, subsample=(2, 2))
        df = spark.createDataFrame(
            [("j", "image", data, "image/jpeg", 32, 24, None)],
            MEDIA_SCHEMA,
        )
        out = resize_image(df, out_w=8, out_h=6, fake=False).collect()
        assert len(out) == 1 and out[0].width == 8 and out[0].height == 6
        payload = bytes(out[0].payload)
        assert payload.startswith(b"P6\n8 6\n255\n")
        got = np.frombuffer(payload[payload.index(b"255\n") + 4:],
                            np.uint8).reshape(6, 8, 3)
        want_px = _resize_pixels(_reference_decode(mcu, layout), 8, 6)
        want = np.floor(np.clip(want_px, 0, 1) * 255.0 + 0.5).astype(
            np.uint8
        )
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

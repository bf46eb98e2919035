"""Pure-Python baseline JPEG codec (ITU-T T.81, public spec).

Real encode/decode for the format every multimodal corpus actually
uses, with no external imaging library:

- ``decode_jpeg`` handles any *baseline sequential* JPEG (SOF0): 8-bit
  samples, 1 (grayscale) or 3 (JFIF YCbCr) components, arbitrary
  1-2 h/v sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart
  markers, multiple DQT/DHT segments — AND *progressive* JPEG (SOF2,
  T.81 Annex G): spectral selection + successive approximation, all
  four scan kinds (DC first/refine, AC first/refine with EOB runs),
  interleaved DC scans, non-interleaved AC scans on the component's
  own block grid. Huffman tables are read from the file's DHT
  segments, so it decodes third-party files, not just our own.
- ``encode_jpeg`` writes a spec-valid baseline 4:4:4 stream: Annex K
  quantization tables scaled by libjpeg's quality curve, and
  per-image canonical Huffman tables (fixed-length codes over the
  symbols actually emitted — DHT carries them, so any decoder reads
  the stream; optimality is not the goal, validity and determinism
  are).
- ``encode_jpeg_progressive`` writes the same coefficients as a
  progressive stream with a libjpeg-style scan script (DC Al=1 →
  DC refine → per-component AC 1..5 / 6..63 at Al=1 → AC refines),
  so progressive decode is cross-validated COEFFICIENT-EXACT against
  the baseline decode of the same image (tests/test_operators.py).

Reference parity note: the reference engine has no media codecs at
all — this backs the multimodal feature-extraction operators
(operators/multimodal.py), where the Spark-side contract is decoding
inside Arrow-batched ``mapInPandas``.

JPEG is lossy: roundtrips are verified by bounded per-channel error
(see tests/test_operators.py and the mm_features_jpeg entry), unlike
the exact BMP/PPM/PNG roundtrips.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K (ITU-T T.81, Tables K.1/K.2) base quantization tables.
_QT_LUMA = np.array(
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
_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag_rc() -> list[tuple[int, int]]:
    """The 64 (row, col) pairs in JPEG zigzag order, generated from
    the anti-diagonal walk instead of transcribed (even-sum diagonals
    run bottom-left -> top-right)."""
    out: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        out.extend(diag[::-1] if s % 2 == 0 else diag)
    return out


_ZZ = _zigzag_rc()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])


def _dct_mat() -> np.ndarray:
    """8x8 DCT-II basis: C[u, x] = a(u) cos((2x+1) u pi / 16)."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_mat()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality curve: 1..100 -> scaled Annex K tables."""
    q = min(100, max(1, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QT_LUMA, _QT_CHROMA):
        t = (base * s + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    """Reads entropy-coded bits, un-stuffing FF00 and stopping at any
    other marker (position left ON the 0xFF)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller; pad here
                b = 0  # spec: decoder past a segment boundary sees padding
                self.pos = p
                raise _RestartBoundary()
            else:
                # EOI or next segment: feed zero bits (spec padding)
                b = 0
                self.acc = (self.acc << 8) | b
                self.n += 8
                return
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume padding + the RSTn marker at a restart boundary."""
        self.acc = 0
        self.n = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2


class _RestartBoundary(Exception):
    pass


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """DHT (bits, vals) -> {(length, code): symbol} per T.81 C.2."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _fixed_table(symbols: set[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Fixed-length canonical Huffman over the symbols actually used:
    n symbols of length L = ceil(log2(n+1)) — the +1 keeps the
    all-ones code unused (T.81 forbids it as a real code). Returns
    (bits, vals, {symbol: (code, length)})."""
    vals = sorted(symbols) or [0]
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())  # ceil(log2(n+1))
    if (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    enc = {sym: (i, length) for i, sym in enumerate(vals)}
    return bits, vals, enc


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.map = _canonical_codes(bits, vals)

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> (nby, nbx, 64) quantized
    zigzag coefficient blocks, all-numpy."""
    h, w = plane.shape
    nby, nbx = h // 8, w // 8
    blocks = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,ijxy,vy->ijuv", _C, blocks, _C)
    q = np.round(coef / qtab).astype(np.int64)
    return q[:, :, _ZZ_ROWS, _ZZ_COLS]


def _block_symbols(zz: np.ndarray, pred: int) -> tuple[list[tuple[int, int, int]], int]:
    """One quantized zigzag block -> [(symbol, extra_bits, nbits)]
    entropy tokens (DC first) and the new DC predictor."""
    toks: list[tuple[int, int, int]] = []
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    extra = diff if diff >= 0 else diff + (1 << s) - 1
    toks.append((s, extra, s))
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            toks.append((0xF0, 0, 0))  # ZRL
            run -= 16
        s = _category(v)
        extra = v if v >= 0 else v + (1 << s) - 1
        toks.append(((run << 4) | s, extra, s))
        run = 0
    if last < 63:
        toks.append((0x00, 0, 0))  # EOB
    return toks, dc


def encode_jpeg(pixels, quality: int = 90) -> bytes:
    """Encode an (H, W, 3) uint8 RGB (or (H, W) grayscale) array as a
    baseline 4:4:4 JFIF JPEG. Deterministic for a given input."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if gray:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = _quality_tables(quality)
    # pad to 8 multiples by edge replication
    ph, pw = -h % 8, -w % 8
    padded = np.pad(px, ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - 128.0
    planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    qtabs = [qy, qc, qc]
    zz = [_fdct_quant(p, q) for p, q in zip(planes, qtabs)]
    nby, nbx = zz[0].shape[:2]

    # pass 1: tokens per MCU (4:4:4 -> one block per component)
    mcu_tokens: list[list[tuple[int, int, int]]] = []
    preds = [0, 0, 0]
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    for by in range(nby):
        for bx in range(nbx):
            toks_mcu: list[tuple[int, int, int]] = []
            for ci in range(3):
                toks, preds[ci] = _block_symbols(zz[ci][by, bx], preds[ci])
                dc_syms.add(toks[0][0])
                ac_syms.update(t[0] for t in toks[1:])
                toks_mcu.append(toks)  # type: ignore[arg-type]
            mcu_tokens.append(toks_mcu)  # type: ignore[arg-type]

    dc_bits, dc_vals, dc_enc = _fixed_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _fixed_table(ac_syms or {0x00})

    bw = _BitWriter()
    for toks_mcu in mcu_tokens:
        for toks in toks_mcu:
            sym, extra, nbits = toks[0]
            code, length = dc_enc[sym]
            bw.put(code, length)
            bw.put(extra, nbits)
            for sym, extra, nbits in toks[1:]:
                code, length = ac_enc[sym]
                bw.put(code, length)
                bw.put(extra, nbits)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in ((0, qy), (1, qc)):
        out += seg(0xDB, bytes([tid]) + bytes(int(q[r, c]) for r, c in _ZZ))
    comp = b"".join(bytes([cid, 0x11, tq]) for cid, tq in ((1, 0), (2, 1), (3, 1)))
    # SOF0 carries the TRUE dims; decoders crop the 8-padded MCU grid.
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comp)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G, Huffman)
# ---------------------------------------------------------------------------


def _emit_eobrun(toks: list, eobrun: int, pending_bits: list[int]) -> int:
    """Flush an EOB run as EOBn + n extension bits (+ any buffered
    correction bits, AC-refine only). Returns 0 (the new run)."""
    if eobrun > 0:
        n = eobrun.bit_length() - 1
        toks.append(("sym", n << 4))
        if n:
            toks.append(("bits", eobrun - (1 << n), n))
        toks.extend(("bits", b, 1) for b in pending_bits)
        pending_bits.clear()
    return 0


def _ac_first_tokens(blocks, Ss, Se, Al):
    """AC first scan (Ah=0): magnitudes truncated toward zero by Al
    (T.81 G.1.2.2), zero runs + EOB runs across blocks."""
    toks: list = []
    eobrun = 0
    for zz in blocks:
        run = 0
        body: list = []
        for k in range(Ss, Se + 1):
            v = int(zz[k])
            av = (abs(v) >> Al) * (1 if v >= 0 else -1)
            if av == 0:
                run += 1
                continue
            while run > 15:
                body.append(("sym", 0xF0))
                run -= 16
            s = _category(av)
            extra = av if av >= 0 else av + (1 << s) - 1
            body.append(("sym", (run << 4) | s))
            body.append(("bits", extra, s))
            run = 0
        if body:
            eobrun = _emit_eobrun(toks, eobrun, [])
            toks.extend(body)
        if run > 0 or not body:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(toks, eobrun, [])
    _emit_eobrun(toks, eobrun, [])
    return toks


def _ac_refine_tokens(blocks, Ss, Se, Al):
    """AC refinement scan (Ah=Al+1): newly-significant coefficients as
    run/1 + sign, correction bits for already-nonzero coefficients
    (libjpeg jcphuff encode_mcu_AC_refine structure)."""
    toks: list = []
    eobrun = 0
    pend: list[int] = []  # correction bits buffered behind the EOB run
    for zz in blocks:
        absv = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
        eob = 0  # index AFTER the last newly-significant coefficient
        for i, a in enumerate(absv):
            if a == 1:
                eob = i + 1
        run = 0
        br: list[int] = []  # correction bits buffered behind run/ZRL
        emitted = False
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and i < eob:
                eobrun = _emit_eobrun(toks, eobrun, pend)
                toks.append(("sym", 0xF0))
                toks.extend(("bits", b, 1) for b in br)
                br = []
                run -= 16
                emitted = True
            if a > 1:
                br.append(a & 1)
                continue
            # newly significant (magnitude exactly 1 at this precision)
            eobrun = _emit_eobrun(toks, eobrun, pend)
            toks.append(("sym", (run << 4) | 1))
            toks.append(("bits", 1 if int(zz[Ss + i]) > 0 else 0, 1))
            toks.extend(("bits", b, 1) for b in br)
            br = []
            run = 0
            emitted = True
        if run > 0 or br or not emitted:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(toks, eobrun, pend)
    _emit_eobrun(toks, eobrun, pend)
    return toks


def encode_jpeg_progressive(
    pixels, quality: int = 90, restart_interval: int | None = None
) -> bytes:
    """Encode as a PROGRESSIVE 4:4:4 JFIF JPEG (SOF2) carrying the
    SAME quantized coefficients as :func:`encode_jpeg`, via a
    libjpeg-style scan script: interleaved DC (Al=1) → DC refine →
    per-component AC bands 1-5 / 6-63 (Al=1) → AC refines (Al=0).
    Decoding this stream and the baseline stream of the same input
    yields bit-identical pixels — the cross-validation used by the
    tests.

    ``restart_interval``: emit a DRI segment and RSTn markers every N
    MCUs in every scan (T.81: DC predictors and EOB runs must not
    cross a restart boundary, and each interval's entropy data is
    byte-aligned) — exercises the decoder's progressive restart
    machinery with spec-valid streams."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = _quality_tables(quality)
    ph, pw = -h % 8, -w % 8
    padded = np.pad(px, ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - 128.0
    zz = [_fdct_quant(p, q) for p, q in zip((ycc[..., 0], ycc[..., 1], ycc[..., 2]), (qy, qc, qc))]
    nby, nbx = zz[0].shape[:2]
    flat = [z.reshape(-1, 64) for z in zz]  # MCU order == block order (4:4:4)
    n_mcu = nby * nbx
    ri = restart_interval

    def mcu_intervals():
        if not ri:
            return [range(n_mcu)]
        return [range(i, min(i + ri, n_mcu)) for i in range(0, n_mcu, ri)]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def entropy_scan(tok_intervals, comps_spec, ss, se, ah, al, tbl_class) -> bytes:
        """DHT (fixed-length canonical over used symbols) + SOS +
        per-interval byte-aligned entropy data joined by RSTn."""
        syms = {t[1] for toks in tok_intervals for t in toks if t[0] == "sym"}
        bits, vals, enc = _fixed_table(syms or {0x00})
        data = bytearray()
        for i, toks in enumerate(tok_intervals):
            bw = _BitWriter()
            for t in toks:
                if t[0] == "sym":
                    code, length = enc[t[1]]
                    bw.put(code, length)
                else:
                    bw.put(t[1], t[2])
            data += bw.flush()
            if i < len(tok_intervals) - 1:
                data += bytes([0xFF, 0xD0 + (i % 8)])
        out = seg(0xC4, bytes([tbl_class << 4]) + bytes(bits) + bytes(vals))
        sos = bytes([len(comps_spec)])
        for cid in comps_spec:
            sos += bytes([cid, 0x00])  # table 0 for both classes
        sos += bytes([ss, se, (ah << 4) | al])
        return out + seg(0xDA, sos) + bytes(data)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in ((0, qy), (1, qc)):
        out += seg(0xDB, bytes([tid]) + bytes(int(q[r, c]) for r, c in _ZZ))
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))
    comp = b"".join(bytes([cid, 0x11, tq]) for cid, tq in ((1, 0), (2, 1), (3, 1)))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 3) + comp)  # SOF2

    # scan 1: DC first, interleaved, Al=1 (diffs in the >>1 domain;
    # predictors reset per restart interval)
    dc_ints = []
    for blocks in mcu_intervals():
        toks: list = []
        preds = [0, 0, 0]
        for b in blocks:
            for ci in range(3):
                dc = int(flat[ci][b, 0]) >> 1  # arithmetic shift, like the decoder's << 1
                diff = dc - preds[ci]
                preds[ci] = dc
                s = _category(diff)
                toks.append(("sym", s))
                toks.append(("bits", diff if diff >= 0 else diff + (1 << s) - 1, s))
        dc_ints.append(toks)
    out += entropy_scan(dc_ints, [1, 2, 3], 0, 0, 0, 1, 0)
    # scan 2: DC refine (raw bit0 per block, no Huffman symbols)
    out += entropy_scan(
        [
            [("bits", int(flat[ci][b, 0]) & 1, 1) for b in blocks for ci in range(3)]
            for blocks in mcu_intervals()
        ],
        [1, 2, 3], 0, 0, 1, 0, 0,
    )
    # per-component AC scans: two spectral bands at Al=1, then refines
    # (non-interleaved: one block per MCU; EOB runs cannot cross a
    # restart boundary, which per-interval token generation guarantees)
    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        for ss, se in ((1, 5), (6, 63)):
            out += entropy_scan(
                [_ac_first_tokens(flat[ci][list(blocks)], ss, se, 1) for blocks in mcu_intervals()],
                [cid], ss, se, 0, 1, 1,
            )
    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        for ss, se in ((1, 5), (6, 63)):
            out += entropy_scan(
                [_ac_refine_tokens(flat[ci][list(blocks)], ss, se, 0) for blocks in mcu_intervals()],
                [cid], ss, se, 1, 0, 1,
            )
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential (SOF0) or progressive (SOF2)
    JPEG — 8-bit, 1 or 3 components, h/v sampling 1-2, optional
    restart intervals — to an (H, W, 3) uint8 RGB array. Raises
    ValueError on arithmetic-coded / hierarchical / 12-bit streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart = 0
    coefs: list[np.ndarray] | None = None
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte (B.1.1.2): FF padding before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if pos + 4 > n:
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported (baseline)")
                tab = np.zeros((8, 8), dtype=np.int64)
                vals = body[i + 1 : i + 65]
                for k, (r, c) in enumerate(_ZZ):
                    tab[r, c] = vals[k]
                qtabs[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17 : i + 17 + cnt])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (extended/arithmetic/lossless) not supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS -> entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = []
            for ci in range(ns):
                cs, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                scomps.append((cs, tt >> 4, tt & 15))
            if not frame["progressive"]:
                tsel = {cs: (td, ta) for cs, td, ta in scomps}
                return _decode_scan(payload, pos, frame, qtabs, huff, tsel, restart)
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if coefs is None:
                coefs = _init_coefs(frame)
            pos = _decode_prog_scan(
                payload, pos, frame, huff, scomps, ss, se, a >> 4, a & 15, restart, coefs
            )
    if frame is not None and frame.get("progressive") and coefs is not None:
        return _reconstruct_progressive(frame, qtabs, coefs)
    raise ValueError("no SOS segment found")


def _init_coefs(frame) -> list[np.ndarray]:
    """Per-component DCT coefficient stores on the padded interleaved
    MCU grid (a superset of the non-interleaved block grid)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    frame["mcux"], frame["mcuy"], frame["hmax"], frame["vmax"] = mcux, mcuy, hmax, vmax
    return [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32) for c in comps]


def _next_marker(data: bytes, pos: int) -> int:
    """Scan forward to the next real marker (skipping stuffed FF00 and
    fill bytes); returns the offset of its 0xFF."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00,) and not (0xD0 <= data[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return n


def _decode_prog_scan(data, pos, frame, huff, scomps, ss, se, ah, al, restart, coefs) -> int:
    """One progressive scan (T.81 G.2): DC first/refine (interleaved
    allowed), AC first/refine (single component, own block grid, EOB
    runs). Updates ``coefs`` in place; returns the stream position of
    the next marker.

    An RSTn hit before the DRI-derived MCU/block count (missing or
    wrong DRI, truncated interval) must surface as ValueError like
    every other malformed-stream condition — never as the private
    _RestartBoundary type (r8 ADVICE)."""
    try:
        return _decode_prog_scan_body(
            data, pos, frame, huff, scomps, ss, se, ah, al, restart, coefs
        )
    except _RestartBoundary:
        raise ValueError("unexpected restart marker in progressive scan") from None


def _decode_prog_scan_body(data, pos, frame, huff, scomps, ss, se, ah, al, restart, coefs) -> int:
    comps = frame["comps"]
    idx = {c["id"]: i for i, c in enumerate(comps)}
    br = _BitReader(data, pos)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def refine_nonzero(block, k):
        c = int(block[k])
        if br.bit() and (c & p1) == 0:
            block[k] = c + (p1 if c >= 0 else m1)

    if ss == 0:  # DC scan (se must be 0)
        sel = [(idx[cs], td) for cs, td, _ta in scomps]
        preds = [0] * len(comps)
        interleaved = len(sel) > 1
        if interleaved:
            mcuy, mcux = frame["mcuy"], frame["mcux"]
            count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and count and count % restart == 0:
                        br.align_restart()
                        preds = [0] * len(comps)
                    count += 1
                    for ci, td in sel:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                                if ah == 0:
                                    s = huff[(0, td)].decode(br)
                                    preds[ci] += _extend(br.receive(s), s)
                                    blk[0] = preds[ci] << al
                                elif br.bit():
                                    blk[0] = int(blk[0]) | p1
        else:
            ci, td = sel[0]
            bh, bw = _comp_block_dims(frame, comps[ci])
            count = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart and count and count % restart == 0:
                        br.align_restart()
                        preds[ci] = 0
                    count += 1
                    blk = coefs[ci][by, bx]
                    if ah == 0:
                        s = huff[(0, td)].decode(br)
                        preds[ci] += _extend(br.receive(s), s)
                        blk[0] = preds[ci] << al
                    elif br.bit():
                        blk[0] = int(blk[0]) | p1
    else:  # AC scan: exactly one component, non-interleaved
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cs, _td, ta = scomps[0]
        ci = idx[cs]
        ac = huff[(1, ta)]
        bh, bw = _comp_block_dims(frame, comps[ci])
        count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart and count and count % restart == 0:
                    br.align_restart()
                    eobrun = 0
                count += 1
                blk = coefs[ci][by, bx]
                if ah == 0:  # AC first (G.1.2.2)
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = ac.decode(br)
                        r, s = rs >> 4, rs & 15
                        if s:
                            k += r
                            if k > se:
                                raise ValueError("AC coefficient index out of range")
                            blk[k] = _extend(br.receive(s), s) << al
                            k += 1
                        else:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.receive(r)
                                break
                            k += 16
                else:  # AC refine (G.1.2.3, jdphuff structure)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = ac.decode(br)
                            r, s = rs >> 4, rs & 15
                            val = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += br.receive(r)
                                    break
                                # r == 15: skip 16 zero-history coefficients
                            else:
                                val = p1 if br.bit() else m1
                            while k <= se:
                                if blk[k] != 0:
                                    refine_nonzero(blk, k)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if s:
                                if k > se:
                                    raise ValueError("AC refine index out of range")
                                blk[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if blk[k] != 0:
                                refine_nonzero(blk, k)
                            k += 1
                        eobrun -= 1
    return _next_marker(data, br.pos)


def _comp_block_dims(frame, c) -> tuple[int, int]:
    """Non-interleaved scans cover the COMPONENT's own block grid
    (T.81 A.2.2), not the padded MCU grid."""
    w = -(-(frame["w"] * c["h"]) // frame["hmax"])
    h = -(-(frame["h"] * c["v"]) // frame["vmax"])
    return -(-h // 8), -(-w // 8)


def _reconstruct_progressive(frame, qtabs, coefs) -> np.ndarray:
    """Dequantize + IDCT every block (vectorized einsum over the whole
    grid), upsample, crop, color-convert — byte-identical math to the
    baseline per-block path."""
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for ci, c in enumerate(comps):
        q = qtabs[c["tq"]]
        zz = coefs[ci].astype(np.int64)
        blk = np.zeros(zz.shape[:2] + (8, 8), dtype=np.float64)
        blk[:, :, _ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
        sp = np.einsum("ux,ijuv,vy->ijxy", _C, blk, _C) + 128.0
        nby, nbx = zz.shape[:2]
        plane = sp.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def _decode_scan(data, pos, frame, qtabs, huff, tsel, restart):
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64))
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    zz = np.zeros(64, dtype=np.int64)
    blk = np.zeros((8, 8), dtype=np.float64)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.align_restart()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_tab = huff[(0, tsel[c["id"]][0])]
                ac_tab = huff[(1, tsel[c["id"]][1])]
                q = qtabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz[:] = 0
                        try:
                            s = dc_tab.decode(br)
                        except _RestartBoundary:
                            br.align_restart()
                            preds = [0] * len(comps)
                            s = dc_tab.decode(br)
                        preds[ci] += _extend(br.receive(s), s)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = ac_tab.decode(br)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 15
                            if k > 63:
                                raise ValueError("AC coefficient index out of range")
                            zz[k] = _extend(br.receive(size), size)
                            k += 1
                        blk[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
                        sp = _C.T @ blk @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = sp
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(full[0], full[1], full[2])

"""Baseline JPEG (SOF0) codec, pure python - the last K6 pixel gap.

A REAL decoder for baseline sequential grayscale JPEG: marker parse
(DQT/DHT/SOF0/SOS), canonical Huffman tables built FROM THE STREAM,
bit reader with 0xFF00 unstuffing, DC-difference + AC run/length
entropy decode, dequantization, separable 2D IDCT, level shift +
clamp. Nothing is stubbed; any conforming single-component baseline
JPEG decodes (the AC path is exercised in tests with random
coefficient blocks round-tripped against a reference IDCT).

The paired encoder emits conforming bitstreams (custom canonical
Huffman tables declared in DHT - the spec's own mechanism, so no
Annex-K transcription) from quantized coefficient blocks. For the
oracle-checked query the planted blocks are DC-only with Q[0]=8:
a constant block's FDCT is DC = 8*(v-128), all AC zero, so the
quantized DC is exactly v-128 and a CORRECT decoder recovers the
constant v bit-exactly - one wrong Huffman bit, dequant step, or
IDCT scale and every recovered pixel moves.

Chroma 4:2:0 lives in the second half of this module; DRI/RSTn
restart-marker streams (the common camera-JPEG resync feature) decode
in both sequential profiles: predictor reset + byte realignment +
marker-index sequence check at every declared interval. PROGRESSIVE
(SOF2) grayscale decodes too - multi-scan spectral selection +
successive approximation in both DC and AC directions, EOBRUN coding,
refinement correction bits (ITU T.81 G.2); `decode_gray_jpeg`
dispatches SOF2 streams automatically, and the progressive path is
cross-checked in tests against the baseline decode of the same
coefficient blocks. Progressive COLOR decodes too: interleaved DC
scans (MCU order, per-component predictors/tables) + per-component
AC band and refinement scans over the 4:2:0 layout, sharing the same
scan kernels; `decode_ycbcr420_jpeg` dispatches SOF2 automatically.
Still out of scope (rejected, not guessed) - and now PERMANENTLY, by
decision (round 7): ARITHMETIC entropy coding (SOF9/SOF10/SOF11,
T.81 Annexes D+F). The QM-coder's probability-estimation state
machine is a 113-row table of EMPIRICAL constants (Qe values,
next-MPS/next-LPS indices, MPS-switch flags - T.81 Table D.3) that
cannot be derived from first principles; this offline environment has
no copy of the normative table, so any reimplementation could only be
validated against itself (its own encoder round-trip), never against
the spec - it would decode self-made fixtures while silently
corrupting real-world arithmetic JPEGs. Fail-closed beats
silently-wrong: every decoder in this module returns None for
SOF9/SOF10/SOF11 streams at the frame header, before any scan byte is
touched (tests/test_imaging.py pins this for all six entry points).
Subsamplings other than 4:2:0 and restarts inside progressive scans -
listed here through round 5 - are IN scope since round 6 (k6u, k6w).
"""

from __future__ import annotations

import math
import struct

import numpy as _np

# zig-zag order: zigzag index -> (row-major) block index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Custom canonical Huffman specs (declared in DHT, decoded from DHT -
# the stream is self-describing, exactly like any conforming JPEG).
# DC: 12 categories at code length 4 (12 of 16 codes used).
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# AC: EOB + ZRL + (run 0..15, size 1..10) = 162 symbols at length 8.
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_VALS)   # all at code length 8


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# Encode-side code tables for the module's fixed canonical specs,
# built once at import (round-12: rebuilding them per encode call was
# ~30% of the planted-stream synth profile). Lookup-only downstream.
_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        # whole-code shift/mask instead of a per-bit loop (round 12,
        # guide §4.2); emitted bytes - and the per-byte 0xFF00
        # stuffing decisions - are identical to the bitwise version
        acc = (self.acc << length) | (code & ((1 << length) - 1))
        n = self.n + length
        buf = self.buf
        while n >= 8:
            n -= 8
            b = (acc >> n) & 0xFF
            buf.append(b)
            if b == 0xFF:
                buf.append(0x00)            # byte stuffing
        self.acc = acc & ((1 << n) - 1)
        self.n = n

    def pad_align(self) -> None:
        """Pad the partial byte with 1-bits to a boundary (spec F.1.2.3;
        a 0xFF pad byte is stuffed like any other entropy byte)."""
        if self.n:
            self.acc <<= (8 - self.n)
            self.acc |= (1 << (8 - self.n)) - 1   # pad with 1s (spec)
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0

    def restart(self, m: int) -> None:
        """Emit RSTm (byte-aligned; markers are NOT stuffed)."""
        self.pad_align()
        self.buf += bytes([0xFF, 0xD0 + (m % 8)])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.buf)


def _category(v: int) -> int:
    return v.bit_length() if v > 0 else (-v).bit_length() if v < 0 else 0


def encode_gray_jpeg(width: int, height: int,
                     blocks: list[list[int]], quant: list[int],
                     restart_interval: int = 0) -> bytes:
    """Emit a conforming baseline grayscale JPEG from QUANTIZED
    coefficient blocks (each 64 ints in zig-zag order; blocks in MCU
    raster order, width/height multiples of 8). ``restart_interval``
    > 0 declares DRI and inserts RST0..RST7 (cycling) every that many
    MCUs, resetting the DC predictor - the camera-JPEG resync feature
    (spec B.2.4.4 / E.2.4)."""
    assert width % 8 == 0 and height % 8 == 0
    dc_codes = _DC_CODES
    ac_codes = _AC_CODES
    w = _BitWriter()
    prev_dc = 0
    rst = 0
    for mcu_i, blk in enumerate(blocks):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            w.restart(rst)
            rst = (rst + 1) % 8
            prev_dc = 0                      # predictor resets at RSTn
        diff = blk[0] - prev_dc
        prev_dc = blk[0]
        cat = _category(diff)
        code, length = dc_codes[cat]
        w.write(code, length)
        if cat:
            bits = diff if diff >= 0 else diff + (1 << cat) - 1
            w.write(bits, cat)
        run = 0
        for k in range(1, 64):
            v = blk[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = ac_codes[0xF0]     # ZRL
                w.write(zc, zl)
                run -= 16
            size = _category(v)
            sc, sl = ac_codes[(run << 4) | size]
            w.write(sc, sl)
            bits = v if v >= 0 else v + (1 << size) - 1
            w.write(bits, size)
            run = 0
        if run:
            ec, el = ac_codes[0x00]          # EOB
            w.write(ec, el)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, b"\x00" + bytes(quant))  # quant in zig-zag order
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dht_dc = seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    dht_ac = seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    dri = (seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xFFDA, b"\x01\x01\x00" + b"\x00\x3f\x00")
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
            + scan + b"\xff\xd9")


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("marker inside scan")
                self.pos += 1             # unstuff
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> int:
        """Byte-align and consume one RST0..RST7 marker; returns its
        index. Called by the MCU loop exactly where DRI says a marker
        must sit - a stream missing it (or carrying the wrong one,
        checked by the caller) is corrupt, not resynced-over."""
        self.n = 0                            # drop pad bits
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated restart marker")
        if (self.data[self.pos] != 0xFF
                or not 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1] - 0xD0
        self.pos += 2
        return m


# Decode-side Huffman tables memoized on the raw DHT payload bytes
# (bits||vals). Every stream re-declares its tables (JPEG is
# self-describing), but the table -> decode-dict construction is a
# pure function of those bytes, and a decode workload sees the same
# few table declarations millions of times - building the dict once
# per distinct declaration per worker is the guide's "heavyweight
# init once per task" discipline (§4.5), not result caching: the
# entropy decode of every stream still runs in full. Bounded: real
# workloads carry a handful of distinct tables; the reset guard keeps
# a pathological adversarial corpus from growing the dict unboundedly.
_DHT_CACHE: dict[bytes, dict[tuple[int, int], int]] = {}

# 16-bit-lookahead decode tables for the fast scan reader (same
# memoization contract as _DHT_CACHE): lut[next16bits] = (symbol,
# code length) for every prefix, None where no code <= 16 bits
# matches. One list of 65536 slots per distinct DHT declaration.
_DHT_LUT_CACHE: dict[bytes, list] = {}


def _decode_lut(seg: bytes) -> list:
    """(next 16 bits) -> (symbol, length) lookahead table for one DHT
    payload. Huffman codes are prefix-free, so every 16-bit word has
    at most one code as a prefix; filling each code's 2^(16-len)
    extensions makes decode one peek + one list index instead of a
    per-bit dict walk (round 12, guide §4.2)."""
    lut = _DHT_LUT_CACHE.get(seg)
    if lut is None:
        codes = _build_codes(list(seg[:16]), list(seg[16:]))
        lut = [None] * 65536
        for sym, (code, ln) in codes.items():
            base = code << (16 - ln)
            cnt = 1 << (16 - ln)
            lut[base:base + cnt] = [(sym, ln)] * cnt
        if len(_DHT_LUT_CACHE) >= 256:
            _DHT_LUT_CACHE.clear()
        _DHT_LUT_CACHE[seg] = lut
    return lut


class _FastScanReader:
    """Accelerated reader for ONE entropy-coded scan segment (round
    12, guide §4.2): a single up-front pass unstuffs 0xFF00 and
    records the byte-aligned RSTn marker positions; bit reads are
    then O(1) shift/mask over the cleaned bytes and Huffman decode is
    one 16-bit peek into a memoized lookahead table.

    Error semantics are the lazy ``_BitReader``'s, preserved exactly:
    the cleaning pass STOPS at the first byte the lazy reader would
    reject (0xFF followed by anything but 0x00 or RSTn, or a trailing
    lone 0xFF) and records it as a boundary instead of raising - the
    bad byte, a marker, or end-of-data only raise when a read
    actually tries to consume past it, so streams whose decode never
    reaches the offending byte still decode (as they did lazily), and
    streams that do reach it fail at the same consumption point."""

    __slots__ = ("clean", "pos", "limit", "markers", "mk_i", "end_bits")

    def __init__(self, data: bytes):
        clean = bytearray()
        markers: list[tuple[int, int]] = []   # (clean byte offset, idx)
        i, n = 0, len(data)
        end_off = None
        while i < n:
            j = data.find(b"\xff", i)
            if j < 0:
                clean += data[i:]
                break
            clean += data[i:j]
            if j + 1 >= n:
                end_off = len(clean)      # lone trailing 0xFF
                break
            nxt = data[j + 1]
            if nxt == 0x00:
                clean.append(0xFF)        # unstuff
                i = j + 2
            elif 0xD0 <= nxt <= 0xD7:
                markers.append((len(clean), nxt - 0xD0))
                i = j + 2
            else:
                end_off = len(clean)      # marker inside scan
                break
        self.clean = bytes(clean)
        self.pos = 0
        self.markers = markers
        self.mk_i = 0
        self.end_bits = 8 * (len(clean) if end_off is None else end_off)
        self._set_limit()

    def _set_limit(self) -> None:
        """Readable bits end at the next restart marker (a marker mid-
        read is the lazy reader's 'marker inside scan') or at the
        data/error boundary."""
        if self.mk_i < len(self.markers):
            self.limit = 8 * self.markers[self.mk_i][0]
        else:
            self.limit = self.end_bits

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        pos = self.pos
        if pos + k > self.limit:
            raise ValueError("truncated scan")
        o, r = pos >> 3, pos & 7
        nb = (r + k + 7) >> 3
        window = int.from_bytes(self.clean[o:o + nb], "big")
        self.pos = pos + k
        return (window >> (nb * 8 - r - k)) & ((1 << k) - 1)

    def huff(self, lut: list) -> int:
        pos = self.pos
        o, r = pos >> 3, pos & 7
        chunk = self.clean[o:o + 4]
        if len(chunk) < 4:
            chunk = chunk + b"\x00" * (4 - len(chunk))
        peek = (int.from_bytes(chunk, "big") >> (16 - r)) & 0xFFFF
        hit = lut[peek]
        if hit is None:
            # no code <= 16 bits matches; if the data also ran out
            # mid-walk the lazy reader raised 'truncated' first - both
            # are ValueError -> decode None, same observable result
            raise ValueError("invalid Huffman code")
        sym, ln = hit
        if pos + ln > self.limit:
            raise ValueError("truncated scan")
        self.pos = pos + ln
        return sym

    def sync_restart(self) -> int:
        """Byte-align and consume the RSTn expected HERE; returns its
        index. Same contract as _BitReader.sync_restart: anything
        other than a marker at the aligned position is corrupt."""
        self.pos = (self.pos + 7) & ~7
        if (self.mk_i >= len(self.markers)
                or self.markers[self.mk_i][0] != self.pos >> 3):
            raise ValueError("expected restart marker")
        m = self.markers[self.mk_i][1]
        self.mk_i += 1
        self._set_limit()
        return m


def _decode_table(seg: bytes) -> dict[tuple[int, int], int]:
    """(code, length) -> symbol decode dict for one DHT payload
    (16 bits-counts bytes followed by the value bytes)."""
    tab = _DHT_CACHE.get(seg)
    if tab is None:
        codes = _build_codes(list(seg[:16]), list(seg[16:]))
        tab = {(c, ln): sym for sym, (c, ln) in codes.items()}
        if len(_DHT_CACHE) >= 256:
            _DHT_CACHE.clear()
        _DHT_CACHE[seg] = tab
    return tab


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


_IDCT_C = [[(math.cos((2 * x + 1) * u * math.pi / 16)
             * (1 / math.sqrt(2) if u == 0 else 1.0)) / 2
            for u in range(8)] for x in range(8)]
_IDCT_M = _np.array(_IDCT_C)  # (8, 8), [x][u]


def _idct_block(coef) -> list[int]:
    """Separable 2D IDCT (rows then columns), level shift + clamp.

    Vectorized as two 8x8 matrix products (round-12: this was ~90% of
    the k6f decode profile as generator-expression sums). Same math:
    TMP = COEF @ C^T (the row pass), OUT = C @ TMP (the column pass);
    np.rint is round-half-even exactly like the Python round() it
    replaces, and the float-summation-order change is absorbed by the
    integer rounding on every pinned decoder test (the planted
    DC-only oracle blocks are single-term sums - order-free)."""
    c = _np.asarray(coef, dtype=_np.float64).reshape(8, 8)
    out = _IDCT_M @ (c @ _IDCT_M.T)
    return _np.clip(_np.rint(out + 128), 0, 255).astype(
        _np.int64).ravel().tolist()


_ZIGZAG_NP = _np.array(ZIGZAG)

# 8 repeated bytes per gray level, for the DC-only constant-plane
# fast path below (one small bytes object per level, built once).
_CONST8 = [bytes([c]) * 8 for c in range(256)]
# _IDCT_M[0][0] as a plain float: the DC basis coefficient
# cos(0)*(1/sqrt(2))/2 used by the constant-plane shortcut.
_IDCT_C00 = float(_IDCT_M[0, 0])


def _dc_only_plane(dc: int, q0: int) -> int:
    """Pixel value of a DC-only block: the IDCT of a lone [0,0]
    coefficient is a constant plane. Bit-identical to _idct_blocks on
    that block, operation for operation: dequant is fl(fl(dc)*fl(q0))
    (the elementwise zz*q there), the matmuls reduce to two successive
    rounded multiplications by C[0][0] (every other product is exactly
    0.0, and adding zeros is exact), then rint (round-half-even, like
    Python round) + clip. This is libjpeg's 1x1-IDCT shortcut: flat
    blocks dominate real photos' backgrounds, not just synthetic
    fixtures."""
    v = round(((float(dc) * float(q0)) * _IDCT_C00) * _IDCT_C00 + 128.0)
    return 0 if v < 0 else 255 if v > 255 else v


def _idct_blocks(zz_rows: list[list[int]], q: list[int]) -> _np.ndarray:
    """Dequantize + 2D IDCT a whole image's blocks in one numpy pass.

    `zz_rows` is (nblocks, 64) quantized coefficients in ZIGZAG order;
    returns (nblocks, 8, 8) uint8 pixels. Identical math to
    `_idct_block` per block - the dequant products are exact int
    values in float64, the scatter nat[:, ZIGZAG] = zz*q is the same
    coef[bi] = zz[zi]*q[zi] assignment, and the two matmuls broadcast
    per 8x8 slice (same per-slice kernel as the single-block call), so
    the rounded integer outputs are bit-identical (fuzz-pinned in
    tests against _idct_block). One numpy dispatch per image instead
    of per block removes the dominant per-call overhead (round-12
    profile: asarray/clip/rint/tolist per 8x8 block cost ~20x the
    matmul itself)."""
    # reshape(-1, 64) keeps the zero-block case (a stream declaring a
    # zero dimension) a well-formed (0, 64) array, matching the old
    # per-block loop's empty-image output instead of erroring.
    zz = _np.asarray(zz_rows, dtype=_np.float64).reshape(-1, 64)
    nat = _np.empty_like(zz)
    nat[:, _ZIGZAG_NP] = zz * _np.asarray(q, dtype=_np.float64)
    c = nat.reshape(-1, 8, 8)
    out = _IDCT_M @ (c @ _IDCT_M.T)
    return _np.clip(_np.rint(out + 128), 0, 255).astype(_np.uint8)


def decode_gray_jpeg(raw: bytes | None):
    """Decode a baseline sequential grayscale JPEG, including
    DRI/RSTn restart-marker streams (predictor reset + byte realign +
    marker-index check at every interval): returns (width, height,
    flat pixel bytes) or None if not a supported JPEG
    (multi-component and progressive streams are rejected, not
    guessed)."""
    if not raw or raw[:2] != b"\xff\xd8":
        return None
    try:
        i, n = 2, len(raw)
        quant: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], bytes] = {}
        width = height = None
        qtab_id = None
        scan_start = None
        restart_interval = 0
        while i + 4 <= n:
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", raw[i + 2:i + 4])[0]
            body = raw[i + 4:i + 2 + seg_len]
            if marker == 0xDB:               # DQT (may hold several)
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    if pq != 0:
                        return None
                    quant[tq] = list(body[j + 1:j + 65])
                    j += 65
            elif marker == 0xC4:             # DHT (may hold several)
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    nv = sum(body[j + 1:j + 17])
                    # raw payload bytes; the lookahead table is built
                    # (memoized) only for the tables the scan names
                    huff[(tc, th)] = body[j + 1:j + 17 + nv]
                    j += 17 + nv
            elif marker == 0xC0:             # SOF0 baseline
                _, height, width, ncomp = struct.unpack(">BHHB", body[:6])
                if ncomp != 1 or body[7] != 0x11:
                    return None              # grayscale, no subsampling
                qtab_id = body[8]
            elif marker == 0xC2:             # progressive: own decoder
                return decode_gray_progressive_jpeg(raw)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None                  # non-baseline-sequential
            elif marker == 0xDD:             # DRI
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:             # SOS
                scan_start = i + 2 + seg_len
                dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
                break
            i += 2 + seg_len
        if None in (width, height, scan_start, qtab_id):
            return None
        q = quant[qtab_id]
        dc_tab = _decode_lut(huff[(0, dc_id)])
        ac_tab = _decode_lut(huff[(1, ac_id)])
        end = raw.rfind(b"\xff\xd9")
        reader = _FastScanReader(raw[scan_start:end if end > 0 else n])
        bw = (width + 7) // 8
        bh = (height + 7) // 8
        zz_rows: list[list[int]] = []
        prev_dc = 0
        rst_expect = 0
        ac_present = False
        for by in range(bh):
            for bx in range(bw):
                mcu_i = by * bw + bx
                if (restart_interval and mcu_i
                        and mcu_i % restart_interval == 0):
                    if reader.sync_restart() != rst_expect:
                        raise ValueError("restart marker out of sequence")
                    rst_expect = (rst_expect + 1) % 8
                    prev_dc = 0
                zz = [0] * 64
                cat = reader.huff(dc_tab)
                diff = _extend(reader.bits(cat), cat) if cat else 0
                prev_dc += diff
                zz[0] = prev_dc
                k = 1
                while k < 64:
                    sym = reader.huff(ac_tab)
                    if sym == 0x00:          # EOB
                        break
                    if sym == 0xF0:          # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k > 63:
                        raise ValueError("AC index overflow")
                    zz[k] = _extend(reader.bits(size), size)
                    ac_present = True        # _extend never yields 0
                    k += 1
                zz_rows.append(zz)
        if not ac_present:
            # Every block is DC-only (EOB right after DC - flat
            # blocks): each IDCT is a constant plane (_dc_only_plane,
            # bit-identical to _idct_blocks), so the image assembles
            # from repeated bytes with no numpy dispatch at all.
            q0 = q[0]
            rows: list[bytes] = []
            for by in range(bh):
                rowb = b"".join(
                    _CONST8[_dc_only_plane(zz_rows[by * bw + bx][0], q0)]
                    for bx in range(bw))[:width]
                rows += [rowb] * min(8, height - by * 8)
            return (width, height, b"".join(rows))
        # dequant + IDCT for every block at once, then block (by, bx)
        # lands at rows by*8.., cols bx*8.. exactly as the per-block
        # writes did; the slice crops the right/bottom padding.
        blocks = _idct_blocks(zz_rows, q)
        img = (blocks.reshape(bh, bw, 8, 8)
               .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        return (width, height, img[:height, :width].tobytes())
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def planted_gray_jpeg(width: int, height: int, seed: int,
                      restart_interval: int = 0) -> bytes:
    """Oracle-plantable image: each 8x8 block is the constant
    v = (seed + block_index*8) % 200 + 28 (range 28..227, no clamp
    interaction). With Q[0]=8 the quantized DC is exactly v-128 and a
    correct decoder recovers every pixel bit-exactly. A nonzero
    ``restart_interval`` plants a DRI/RSTn stream: because RSTn
    resets the DC predictor, a decoder that ignored the reset (or
    failed to realign) would shift every post-marker block's value -
    the fixture detects both failure modes."""
    bw, bh = width // 8, height // 8
    quant = [8] + [16] * 63
    blocks = []
    for bi in range(bw * bh):
        v = (seed + bi * 8) % 200 + 28
        blk = [0] * 64
        blk[0] = v - 128                     # DC quantized by 8
        blocks.append(blk)
    return encode_gray_jpeg(width, height, blocks, quant, restart_interval)


# ---------------------------------------------------------------------------
# Baseline YCbCr 4:2:0 (the ubiquitous photo profile): MCU-interleaved
# 3-component scan, per-component quant + Huffman table slots, chroma
# upsampling, ITU-R BT.601 color conversion.
# ---------------------------------------------------------------------------


def _encode_component_block(w: _BitWriter, blk: list[int], prev_dc: int,
                            dc_codes, ac_codes) -> int:
    diff = blk[0] - prev_dc
    cat = _category(diff)
    code, length = dc_codes[cat]
    w.write(code, length)
    if cat:
        bits = diff if diff >= 0 else diff + (1 << cat) - 1
        w.write(bits, cat)
    run = 0
    for k in range(1, 64):
        v = blk[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]
            w.write(zc, zl)
            run -= 16
        size = _category(v)
        sc, sl = ac_codes[(run << 4) | size]
        w.write(sc, sl)
        bits = v if v >= 0 else v + (1 << size) - 1
        w.write(bits, size)
        run = 0
    if run:
        ec, el = ac_codes[0x00]
        w.write(ec, el)
    return blk[0]


def encode_ycbcr420_jpeg(width: int, height: int,
                         y_blocks: list[list[int]],
                         cb_blocks: list[list[int]],
                         cr_blocks: list[list[int]],
                         quant_l: list[int], quant_c: list[int],
                         restart_interval: int = 0) -> bytes:
    """Conforming baseline 4:2:0 JPEG: MCU = 4 interleaved Y blocks
    (2x2) + Cb + Cr, luma tables in slot 0 and chroma tables in slot
    1 (so a decoder must dispatch per component), separate DC
    predictors per component. Blocks are quantized zig-zag ints; MCU
    raster order; width/height multiples of 16."""
    assert width % 16 == 0 and height % 16 == 0
    dc_codes = _DC_CODES
    ac_codes = _AC_CODES
    w = _BitWriter()
    mw, mh = width // 16, height // 16
    dc = {"y": 0, "cb": 0, "cr": 0}
    rst = 0
    for my in range(mh):
        for mx in range(mw):
            mcu_i = my * mw + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                w.restart(rst)
                rst = (rst + 1) % 8
                dc = {"y": 0, "cb": 0, "cr": 0}  # ALL predictors reset
            for sy in range(2):
                for sx in range(2):
                    bi = (my * 2 + sy) * (mw * 2) + (mx * 2 + sx)
                    dc["y"] = _encode_component_block(
                        w, y_blocks[bi], dc["y"], dc_codes, ac_codes)
            ci = my * mw + mx
            dc["cb"] = _encode_component_block(
                w, cb_blocks[ci], dc["cb"], dc_codes, ac_codes)
            dc["cr"] = _encode_component_block(
                w, cr_blocks[ci], dc["cr"], dc_codes, ac_codes)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = (seg(0xFFDB, b"\x00" + bytes(quant_l))
           + seg(0xFFDB, b"\x01" + bytes(quant_c)))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3)
              + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    dht = (seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
           + seg(0xFFC4, b"\x01" + bytes(_DC_BITS) + bytes(_DC_VALS))
           + seg(0xFFC4, b"\x11" + bytes(_AC_BITS) + bytes(_AC_VALS)))
    dri = (seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11" + b"\x00\x3f\x00")
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos + scan + b"\xff\xd9")


def _decode_block(reader: _BitReader, dc_tab, ac_tab, q: list[int],
                  prev_dc: int) -> tuple[list[int], int]:
    zz = [0] * 64
    cat = _decode_huff(reader, dc_tab)
    diff = _extend(reader.bits(cat), cat) if cat else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = _decode_huff(reader, ac_tab)
        if sym == 0x00:
            break
        if sym == 0xF0:
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC index overflow")
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    coef = [0.0] * 64
    for zi, bi in enumerate(ZIGZAG):
        coef[bi] = zz[zi] * q[zi]
    return _idct_block(coef), dc


def decode_ycbcr420_jpeg(raw: bytes | None):
    """Full-color baseline JPEG decode for the 4:2:0 profile: entropy
    decode of the interleaved MCU scan with per-component Huffman
    slots and DC predictors, dequant per component table, IDCT,
    nearest-neighbor chroma upsampling, BT.601 YCbCr->RGB with
    half-up rounding. DRI/RSTn restart markers are honored (all three
    DC predictors reset, byte realign, marker-index check). Returns
    (width, height, flat RGB bytes) or None (progressive / other
    samplings rejected, not guessed)."""
    if not raw or raw[:2] != b"\xff\xd8":
        return None
    try:
        i, n = 2, len(raw)
        quant: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        width = height = None
        comp_q: dict[int, int] = {}
        comp_tabs: dict[int, tuple[int, int]] = {}
        scan_start = None
        restart_interval = 0
        while i + 4 <= n:
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", raw[i + 2:i + 4])[0]
            body = raw[i + 4:i + 2 + seg_len]
            if marker == 0xDB:
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    if pq != 0:
                        return None
                    quant[tq] = list(body[j + 1:j + 65])
                    j += 65
            elif marker == 0xC4:
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    nv = sum(body[j + 1:j + 17])
                    huff[(tc, th)] = _decode_table(body[j + 1:j + 17 + nv])
                    j += 17 + nv
            elif marker == 0xC0:
                _, height, width, ncomp = struct.unpack(">BHHB", body[:6])
                if ncomp != 3:
                    return None
                samplings = {}
                for c in range(3):
                    cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                    samplings[cid] = samp
                    comp_q[cid] = tq
                if (samplings.get(1) != 0x22 or samplings.get(2) != 0x11
                        or samplings.get(3) != 0x11):
                    return None              # only 4:2:0 here
            elif marker == 0xC2:             # progressive: own decoder
                return decode_ycbcr420_progressive_jpeg(raw)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None
            elif marker == 0xDD:
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:
                ns = body[0]
                if ns != 3:
                    return None
                for c in range(ns):
                    cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                    comp_tabs[cid] = (tabs >> 4, tabs & 0x0F)
                scan_start = i + 2 + seg_len
                break
            i += 2 + seg_len
        if None in (width, height, scan_start):
            return None
        end = raw.rfind(b"\xff\xd9")
        reader = _BitReader(raw[scan_start:end if end > 0 else n])
        mw, mh = (width + 15) // 16, (height + 15) // 16
        yw, yh = mw * 16, mh * 16
        yplane = bytearray(yw * yh)
        cbp = bytearray(mw * 8 * mh * 8)
        crp = bytearray(mw * 8 * mh * 8)
        dc = {1: 0, 2: 0, 3: 0}
        rst_expect = 0
        for my in range(mh):
            for mx in range(mw):
                mcu_i = my * mw + mx
                if (restart_interval and mcu_i
                        and mcu_i % restart_interval == 0):
                    if reader.sync_restart() != rst_expect:
                        raise ValueError("restart marker out of sequence")
                    rst_expect = (rst_expect + 1) % 8
                    dc = {1: 0, 2: 0, 3: 0}
                for sy in range(2):
                    for sx in range(2):
                        blk, dc[1] = _decode_block(
                            reader, huff[(0, comp_tabs[1][0])],
                            huff[(1, comp_tabs[1][1])],
                            quant[comp_q[1]], dc[1])
                        ox = mx * 16 + sx * 8
                        oy = my * 16 + sy * 8
                        for y in range(8):
                            dst = (oy + y) * yw + ox
                            yplane[dst:dst + 8] = bytes(blk[y * 8:(y + 1) * 8])
                for cid, plane in ((2, cbp), (3, crp)):
                    blk, dc[cid] = _decode_block(
                        reader, huff[(0, comp_tabs[cid][0])],
                        huff[(1, comp_tabs[cid][1])],
                        quant[comp_q[cid]], dc[cid])
                    for y in range(8):
                        dst = (my * 8 + y) * (mw * 8) + mx * 8
                        plane[dst:dst + 8] = bytes(blk[y * 8:(y + 1) * 8])
        cw = mw * 8
        out = bytearray(width * height * 3)
        for py in range(height):
            for px in range(width):
                yv = yplane[py * yw + px]
                cb = cbp[(py // 2) * cw + px // 2] - 128
                cr = crp[(py // 2) * cw + px // 2] - 128
                r = int(math.floor(yv + 1.402 * cr + 0.5))
                g = int(math.floor(yv - 0.344136 * cb - 0.714136 * cr + 0.5))
                b = int(math.floor(yv + 1.772 * cb + 0.5))
                dst = (py * width + px) * 3
                out[dst] = min(255, max(0, r))
                out[dst + 1] = min(255, max(0, g))
                out[dst + 2] = min(255, max(0, b))
        return (width, height, bytes(out))
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def planted_ycbcr420_jpeg(width: int, height: int, y0: int, cb0: int,
                          cr0: int) -> bytes:
    """DC-only planted color image: every Y block holds constant y0,
    chroma planes constant cb0/cr0. Q[0]=8 on both tables keeps the
    DC round trip bit-exact, so a correct decoder recovers the
    constants on every pixel."""
    quant = [8] + [16] * 63
    mw, mh = width // 16, height // 16
    yb = []
    for _ in range(mw * 2 * mh * 2):
        blk = [0] * 64
        blk[0] = y0 - 128
        yb.append(blk)
    cbb, crb = [], []
    for _ in range(mw * mh):
        b1 = [0] * 64
        b1[0] = cb0 - 128
        cbb.append(b1)
        b2 = [0] * 64
        b2[0] = cr0 - 128
        crb.append(b2)
    return encode_ycbcr420_jpeg(width, height, yb, cbb, crb, quant, quant)


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2), grayscale: spectral selection + successive
# approximation, both directions. The encoder emits a conforming
# multi-scan stream (DC-first + DC-refinement, AC band scans with
# EOBRUN coding, AC refinement with correction bits - ITU T.81 G.1/G.2);
# the decoder accumulates coefficients across scans and shares the
# dequant+IDCT backend with the baseline path. The color (4:2:0)
# progressive codec further below reuses these scan kernels. Restart
# markers inside progressive scans are out of scope (rejected, not
# guessed).
# ---------------------------------------------------------------------------

# Progressive AC tables additionally need the EOBn symbols
# (r<<4 | 0 for r=1..14); still one canonical length-8 class.
_AC_VALS_PROG = _AC_VALS + [(r << 4) for r in range(1, 15)]
_AC_BITS_PROG = [0] * 16
_AC_BITS_PROG[7] = len(_AC_VALS_PROG)
_AC_CODES_PROG = _build_codes(_AC_BITS_PROG, _AC_VALS_PROG)

# Default scan script: DC at Al=1 then refined, low AC band at Al=1
# then refined, high band directly - exercises every progressive
# decode path (DC first/refine, AC first with EOBRUN, AC refine with
# correction bits and insertions).
_DEFAULT_SCANS = (
    (0, 0, 0, 1),     # DC first, point transform 1
    (0, 0, 1, 0),     # DC refinement
    (1, 5, 0, 1),     # AC band 1-5 first, Al=1
    (6, 63, 0, 0),    # AC band 6-63 first, Al=0
    (1, 5, 1, 0),     # AC band 1-5 refinement
)


def _pt(v: int, al: int) -> int:
    """AC point transform: v / 2^Al rounded toward zero."""
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_eobrun(w: _BitWriter, ac_codes, eobrun: int,
                 pending: list[int]) -> int:
    """Flush an accumulated EOB run (EOBn symbol + length bits), then
    the correction bits gathered while the run formed (refinement
    scans carry them; first scans pass an empty list)."""
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        code, ln = ac_codes[(r << 4)]
        w.write(code, ln)
        if r:
            w.write(eobrun - (1 << r), r)
        for b in pending:
            w.write(b, 1)
        pending.clear()
    return 0


def _enc_ac_first_scan(w: _BitWriter, ac_codes, blocks, ss: int, se: int,
                       al: int) -> None:
    """Emit one progressive AC first scan over blocks in scan order."""
    eobrun = 0
    for blk in blocks:
        band = [(k, _pt(blk[k], al)) for k in range(ss, se + 1)]
        nz = [i for i, (_, v) in enumerate(band) if v != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(w, ac_codes, eobrun, [])
            continue
        eobrun = _emit_eobrun(w, ac_codes, eobrun, [])
        run = 0
        last_nz = nz[-1]
        for i, (_, v) in enumerate(band[:last_nz + 1]):
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                run -= 16
            size = _category(v)
            code, ln = ac_codes[(run << 4) | size]
            w.write(code, ln)
            bits = v if v >= 0 else v + (1 << size) - 1
            w.write(bits, size)
            run = 0
        if last_nz < len(band) - 1:
            eobrun += 1                       # trailing zeros -> EOB
    _emit_eobrun(w, ac_codes, eobrun, [])


def _enc_ac_refine_scan(w: _BitWriter, ac_codes, blocks, ss: int, se: int,
                        al: int) -> None:
    """Emit one progressive AC refinement scan (correction bits +
    +-1 insertions + EOBRUN with pending corrections)."""
    eobrun = 0
    pending: list[int] = []
    for blk in blocks:
        band = list(range(ss, se + 1))
        nz_new = [k for k in band if (abs(blk[k]) >> al) == 1]
        if not nz_new:
            # no insertions: whole band joins the EOB run; its
            # nonzero-history corrections ride along
            for k in band:
                if (abs(blk[k]) >> al) > 1:
                    pending.append((abs(blk[k]) >> al) & 1)
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(w, ac_codes, eobrun, pending)
            continue
        eobrun = _emit_eobrun(w, ac_codes, eobrun, pending)
        run = 0
        corrections: list[int] = []
        last_new = nz_new[-1]
        for k in band:
            if k > last_new:
                break
            mag = abs(blk[k]) >> al
            if mag > 1:                       # nonzero history
                corrections.append(mag & 1)
                continue
            if mag == 0:
                run += 1
                if run == 16:
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    for b in corrections:
                        w.write(b, 1)
                    corrections = []
                    run = 0
                continue
            # mag == 1: insertion
            code, ln = ac_codes[(run << 4) | 1]
            w.write(code, ln)
            w.write(1 if blk[k] > 0 else 0, 1)
            for b in corrections:
                w.write(b, 1)
            corrections = []
            run = 0
        # coefficients after the last insertion: EOB run starts;
        # their corrections attach to the NEXT EOBrun/symbol
        tail_hist = [(abs(blk[k]) >> al) & 1
                     for k in band if k > last_new
                     and (abs(blk[k]) >> al) > 1]
        if last_new < band[-1]:
            pending.extend(tail_hist)
            eobrun += 1
    _emit_eobrun(w, ac_codes, eobrun, pending)


def encode_gray_progressive_jpeg(width: int, height: int,
                                 blocks: list[list[int]],
                                 quant: list[int],
                                 scans=_DEFAULT_SCANS,
                                 restart_interval: int = 0) -> bytes:
    """Conforming progressive (SOF2) grayscale JPEG from QUANTIZED
    zig-zag blocks, multi-scan per the given (Ss, Se, Ah, Al) script.
    With ``restart_interval`` > 0 a DRI segment is emitted and every
    scan carries RSTn markers each `interval` blocks (T.81: the
    restart resets the DC predictor AND terminates any open EOB run,
    with byte realignment; the marker index counts 0-7 per scan)."""
    assert width % 8 == 0 and height % 8 == 0
    dc_codes = _DC_CODES
    ac_codes = _AC_CODES_PROG
    ri = restart_interval
    chunks = ([blocks[i:i + ri] for i in range(0, len(blocks), ri)]
              if ri else [blocks])

    scan_payloads = []
    for (ss, se, ah, al) in scans:
        w = _BitWriter()
        rst = 0
        for ci, chunk in enumerate(chunks):
            if ci:
                w.restart(rst)
                rst = (rst + 1) % 8
            if ss == 0:                               # DC scan
                assert se == 0
                if ah == 0:                           # first
                    prev = 0                          # reset per restart
                    for blk in chunk:
                        v = blk[0] >> al              # arithmetic shift
                        diff = v - prev
                        prev = v
                        cat = _category(diff)
                        code, ln = dc_codes[cat]
                        w.write(code, ln)
                        if cat:
                            bits = (diff if diff >= 0
                                    else diff + (1 << cat) - 1)
                            w.write(bits, cat)
                else:                                 # refinement: raw bits
                    # two's-complement bit of the true DC (python ints
                    # behave as infinite two's complement, so >> & 1 is
                    # the spec's successive-approximation bit for
                    # negative values too)
                    for blk in chunk:
                        w.write((blk[0] >> al) & 1, 1)
            elif ah == 0:
                # the kernel flushes its EOB run at chunk end - exactly
                # the T.81 rule that a restart terminates the run
                _enc_ac_first_scan(w, ac_codes, chunk, ss, se, al)
            else:
                _enc_ac_refine_scan(w, ac_codes, chunk, ss, se, al)
        scan_payloads.append(((ss, se, ah, al), w.flush()))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x00" + bytes(quant))
    out += seg(0xFFC2, struct.pack(">BHHB", 8, height, width, 1)
               + b"\x01\x11\x00")                     # SOF2
    out += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_AC_BITS_PROG)
               + bytes(_AC_VALS_PROG))
    if ri:
        out += seg(0xFFDD, struct.pack(">H", ri))
    for (ss, se, ah, al), payload in scan_payloads:
        out += seg(0xFFDA, b"\x01\x01\x00"
                   + bytes((ss, se, (ah << 4) | al)))
        out += payload
    out += b"\xff\xd9"
    return bytes(out)


def _scan_end(raw: bytes, start: int) -> int:
    """End of an entropy-coded segment: the next 0xFF followed by a
    real marker byte (not 0x00 stuffing, not RST0-7)."""
    i = start
    n = len(raw)
    while i + 1 < n:
        if raw[i] == 0xFF and raw[i + 1] != 0x00 \
                and not (0xD0 <= raw[i + 1] <= 0xD7):
            return i
        i += 1
    return n


def _prog_dc_first(reader: _BitReader, dc_tab, coefs, al: int) -> None:
    """Progressive DC first scan over blocks in scan order (shifted
    values, per-list predictor)."""
    prev = 0
    for blk in coefs:
        cat = _decode_huff(reader, dc_tab)
        diff = _extend(reader.bits(cat), cat) if cat else 0
        prev += diff
        blk[0] = prev << al


def _prog_ac_first(reader: _BitReader, ac_tab, coefs, ss: int, se: int,
                   al: int) -> None:
    """Progressive AC first scan (spectral band, EOBRUN coding)."""
    eobrun = 0
    for blk in coefs:
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            sym = _decode_huff(reader, ac_tab)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:
                    k += 16               # ZRL
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC band overflow")
            blk[k] = _extend(reader.bits(s), s) << al
            k += 1


def _prog_ac_refine(reader: _BitReader, ac_tab, coefs, ss: int, se: int,
                    al: int) -> None:
    """Progressive AC refinement: correction bits for nonzero-history
    coefficients, +-1<<Al insertions, EOB passes (ITU T.81 G.2)."""
    p1, m1 = 1 << al, -1 << al

    def refine(blk, k):
        if blk[k] > 0 and reader.bit():
            blk[k] += p1
        elif blk[k] < 0 and reader.bit():
            blk[k] += m1

    eobrun = 0
    for blk in coefs:
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _decode_huff(reader, ac_tab)
                r, s = sym >> 4, sym & 0x0F
                newval = 0
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r)
                        if r:
                            eobrun += reader.bits(r)
                        break             # rest joins EOB pass
                    # r == 15: ZRL - skip 16 zero-history
                else:
                    if s != 1:
                        raise ValueError("refinement size must be 1")
                    newval = p1 if reader.bit() else m1
                # advance past r zero-history coefs, refining
                # nonzero-history along the way
                while k <= se:
                    if blk[k] != 0:
                        refine(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            # EOB pass: refine every remaining nonzero-history
            # coefficient of this block's band
            while k <= se:
                if blk[k] != 0:
                    refine(blk, k)
                k += 1
            eobrun -= 1


def decode_gray_progressive_jpeg(raw: bytes | None):
    """Progressive (SOF2) grayscale decode: accumulates quantized
    coefficients across every scan - DC first + successive-
    approximation refinements (raw bits), AC spectral-selection band
    scans with EOBRUN coding, AC refinement with history-correction
    bits and +-1 insertions (ITU T.81 G.2) - then dequantizes and
    IDCTs once. Returns (width, height, flat pixels) or None.
    Restart intervals inside progressive scans are rejected."""
    if not raw or raw[:2] != b"\xff\xd8":
        return None
    try:
        i, n = 2, len(raw)
        quant: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        width = height = None
        qtab_id = None
        restart_interval = 0
        scans = []          # ((dc_id, ac_id, ss, se, ah, al), payload)
        while i + 4 <= n:
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", raw[i + 2:i + 4])[0]
            body = raw[i + 4:i + 2 + seg_len]
            if marker == 0xDB:
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    if pq != 0:
                        return None
                    quant[tq] = list(body[j + 1:j + 65])
                    j += 65
            elif marker == 0xC4:
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    nv = sum(body[j + 1:j + 17])
                    huff[(tc, th)] = _decode_table(body[j + 1:j + 17 + nv])
                    j += 17 + nv
            elif marker == 0xC2:
                _, height, width, ncomp = struct.unpack(">BHHB", body[:6])
                if ncomp != 1 or body[7] != 0x11:
                    return None
                qtab_id = body[8]
            elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None                  # not this profile
            elif marker == 0xDD:
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:
                if body[0] != 1:
                    return None
                dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
                ss, se, a = body[3], body[4], body[5]
                start = i + 2 + seg_len
                end = _scan_end(raw, start)
                scans.append(((dc_id, ac_id, ss, se, a >> 4, a & 0x0F),
                              raw[start:end]))
                i = end
                continue
            i += 2 + seg_len
        if width is None or not scans:
            return None

        bw, bh = (width + 7) // 8, (height + 7) // 8
        nblocks = bw * bh
        coef = [[0] * 64 for _ in range(nblocks)]  # zig-zag order

        ri = restart_interval
        chunk_bounds = (list(range(0, nblocks, ri)) if ri else [0])
        for (dc_id, ac_id, ss, se, ah, al), payload in scans:
            reader = _BitReader(payload)
            rst_expect = 0
            for ci, lo in enumerate(chunk_bounds):
                if ci:
                    # T.81: restart inside a progressive scan - byte
                    # realign, check the 0-7 marker sequence, and
                    # reset the DC predictor / EOB run (both are
                    # chunk-local below, so the reset is structural)
                    if reader.sync_restart() != rst_expect:
                        raise ValueError("restart marker out of sequence")
                    rst_expect = (rst_expect + 1) % 8
                chunk = coef[lo:lo + ri] if ri else coef
                if ss == 0:                           # DC scan
                    if se != 0:
                        return None
                    if ah == 0:
                        _prog_dc_first(reader, huff[(0, dc_id)], chunk, al)
                    else:                             # refinement bit
                        for blk in chunk:
                            if reader.bit():
                                blk[0] |= 1 << al
                elif ah == 0:
                    _prog_ac_first(reader, huff[(1, ac_id)], chunk,
                                   ss, se, al)
                else:
                    _prog_ac_refine(reader, huff[(1, ac_id)], chunk,
                                    ss, se, al)

        q = quant[qtab_id]
        pixels = bytearray(bw * 8 * bh * 8)
        for by in range(bh):
            for bx in range(bw):
                zz = coef[by * bw + bx]
                c = [0.0] * 64
                for zi, bi in enumerate(ZIGZAG):
                    c[bi] = zz[zi] * q[zi]
                blk = _idct_block(c)
                row_w = bw * 8
                for y in range(8):
                    dst = (by * 8 + y) * row_w + bx * 8
                    pixels[dst:dst + 8] = bytes(blk[y * 8:(y + 1) * 8])
        if bw * 8 == width:
            out = bytes(pixels[:height * width])
        else:
            row_w = bw * 8
            out = b"".join(bytes(pixels[y * row_w:y * row_w + width])
                           for y in range(height))
        return (width, height, out)
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def planted_gray_progressive_jpeg(width: int, height: int, seed: int,
                                  restart_interval: int = 0) -> bytes:
    """Progressive twin of planted_gray_jpeg: the same DC-only planted
    blocks (v = (seed + 8*bi) % 200 + 28, Q[0]=8 -> bit-exact round
    trip) shipped as a 5-scan SOF2 stream (DC first at Al=1, DC
    refinement, two AC band scans, AC refinement) - so recovering the
    constants requires the whole progressive machinery: shifted DC
    accumulation, refinement-bit OR, and EOBRUN skipping across every
    AC scan (the bands are all-zero, i.e. pure EOB runs)."""
    bw, bh = width // 8, height // 8
    quant = [8] + [16] * 63
    blocks = []
    for bi in range(bw * bh):
        v = (seed + bi * 8) % 200 + 28
        blk = [0] * 64
        blk[0] = v - 128
        blocks.append(blk)
    return encode_gray_progressive_jpeg(width, height, blocks, quant,
                                        restart_interval=restart_interval)


# ---------------------------------------------------------------------------
# Progressive color (SOF2, YCbCr 4:2:0): interleaved DC scans (MCU
# order, per-component predictors), non-interleaved per-component AC
# band/refinement scans (spec: progressive AC scans carry one
# component), sharing the scan kernels above; pixel assembly shares
# the 4:2:0 upsample + BT.601 math with the baseline decoder.
# ---------------------------------------------------------------------------

_DEFAULT_SCANS_420 = (
    ((1, 2, 3), 0, 0, 0, 1),   # interleaved DC first, Al=1
    ((1, 2, 3), 0, 0, 1, 0),   # interleaved DC refinement
    ((1,), 1, 5, 0, 1),        # Y low band first, Al=1
    ((2,), 1, 63, 0, 0),       # Cb full band
    ((3,), 1, 63, 0, 0),       # Cr full band
    ((1,), 6, 63, 0, 0),       # Y high band
    ((1,), 1, 5, 1, 0),        # Y low band refinement
)


def _mcu_order_420(mw: int, mh: int):
    """(component id, raster block index) in 4:2:0 MCU order."""
    for my in range(mh):
        for mx in range(mw):
            for sy in range(2):
                for sx in range(2):
                    yield 1, (my * 2 + sy) * (mw * 2) + (mx * 2 + sx)
            yield 2, my * mw + mx
            yield 3, my * mw + mx


def encode_ycbcr420_progressive_jpeg(width: int, height: int,
                                     y_blocks, cb_blocks, cr_blocks,
                                     quant_l, quant_c,
                                     scans=_DEFAULT_SCANS_420) -> bytes:
    """Conforming progressive 4:2:0 JPEG: DC scans interleaved across
    all three components, AC scans per component, any (Ss,Se,Ah,Al)
    script; blocks in per-component RASTER order (same layout as the
    baseline encoder's inputs)."""
    assert width % 16 == 0 and height % 16 == 0
    dc_codes = _DC_CODES
    ac_codes = _AC_CODES_PROG
    mw, mh = width // 16, height // 16
    comp_blocks = {1: y_blocks, 2: cb_blocks, 3: cr_blocks}
    payloads = []
    for comps, ss, se, ah, al in scans:
        w = _BitWriter()
        if ss == 0:
            assert se == 0 and tuple(comps) == (1, 2, 3), \
                "DC scans are interleaved across all components here"
            if ah == 0:
                prev = {1: 0, 2: 0, 3: 0}
                for cid, bi in _mcu_order_420(mw, mh):
                    blk = comp_blocks[cid][bi]
                    v = blk[0] >> al
                    diff = v - prev[cid]
                    prev[cid] = v
                    cat = _category(diff)
                    code, ln = dc_codes[cat]
                    w.write(code, ln)
                    if cat:
                        bits = diff if diff >= 0 else diff + (1 << cat) - 1
                        w.write(bits, cat)
            else:
                for cid, bi in _mcu_order_420(mw, mh):
                    w.write((comp_blocks[cid][bi][0] >> al) & 1, 1)
        else:
            (cid,) = comps
            if ah == 0:
                _enc_ac_first_scan(w, ac_codes, comp_blocks[cid], ss, se, al)
            else:
                _enc_ac_refine_scan(w, ac_codes, comp_blocks[cid], ss, se, al)
        payloads.append((comps, ss, se, ah, al, w.flush()))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x00" + bytes(quant_l))
    out += seg(0xFFDB, b"\x01" + bytes(quant_c))
    out += seg(0xFFC2, struct.pack(">BHHB", 8, height, width, 3)
               + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    out += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, b"\x01" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_AC_BITS_PROG) + bytes(_AC_VALS_PROG))
    out += seg(0xFFC4, b"\x11" + bytes(_AC_BITS_PROG) + bytes(_AC_VALS_PROG))
    for comps, ss, se, ah, al, payload in payloads:
        body = bytes([len(comps)])
        for cid in comps:
            slot = 0 if cid == 1 else 1
            body += bytes((cid, (slot << 4) | slot))
        body += bytes((ss, se, (ah << 4) | al))
        out += seg(0xFFDA, body)
        out += payload
    out += b"\xff\xd9"
    return bytes(out)


def decode_ycbcr420_progressive_jpeg(raw: bytes | None):
    """Progressive (SOF2) 4:2:0 color decode: interleaved DC scans +
    per-component AC band/refinement scans accumulated into three
    coefficient planes, then dequant/IDCT/chroma-upsample/BT.601 -
    bit-compatible with the baseline 4:2:0 decoder on the same
    blocks. Returns (width, height, flat RGB) or None."""
    if not raw or raw[:2] != b"\xff\xd8":
        return None
    try:
        i, n = 2, len(raw)
        quant: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        width = height = None
        comp_q: dict[int, int] = {}
        scans = []
        while i + 4 <= n:
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", raw[i + 2:i + 4])[0]
            body = raw[i + 4:i + 2 + seg_len]
            if marker == 0xDB:
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    if pq != 0:
                        return None
                    quant[tq] = list(body[j + 1:j + 65])
                    j += 65
            elif marker == 0xC4:
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    nv = sum(body[j + 1:j + 17])
                    huff[(tc, th)] = _decode_table(body[j + 1:j + 17 + nv])
                    j += 17 + nv
            elif marker == 0xC2:
                _, height, width, ncomp = struct.unpack(">BHHB", body[:6])
                if ncomp != 3:
                    return None
                samp = {}
                for c in range(3):
                    cid, s, tq = body[6 + 3 * c:9 + 3 * c]
                    samp[cid] = s
                    comp_q[cid] = tq
                if (samp.get(1) != 0x22 or samp.get(2) != 0x11
                        or samp.get(3) != 0x11):
                    return None
            elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None
            elif marker == 0xDD:
                if struct.unpack(">H", body[:2])[0] != 0:
                    return None
            elif marker == 0xDA:
                ns = body[0]
                comps = []
                for c in range(ns):
                    cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                    comps.append((cid, tabs >> 4, tabs & 0x0F))
                ss, se, a = body[1 + 2 * ns:4 + 2 * ns]
                start = i + 2 + seg_len
                end = _scan_end(raw, start)
                scans.append((comps, ss, se, a >> 4, a & 0x0F,
                              raw[start:end]))
                i = end
                continue
            i += 2 + seg_len
        if width is None or not scans:
            return None

        mw, mh = (width + 15) // 16, (height + 15) // 16
        coef = {1: [[0] * 64 for _ in range(mw * 2 * mh * 2)],
                2: [[0] * 64 for _ in range(mw * mh)],
                3: [[0] * 64 for _ in range(mw * mh)]}

        for comps, ss, se, ah, al, payload in scans:
            reader = _BitReader(payload)
            if ss == 0:                               # DC scan
                if se != 0:
                    return None
                if len(comps) == 3:                   # interleaved
                    if ah == 0:
                        prev = {1: 0, 2: 0, 3: 0}
                        tabs = {cid: huff[(0, d)] for cid, d, _ in comps}
                        for cid, bi in _mcu_order_420(mw, mh):
                            cat = _decode_huff(reader, tabs[cid])
                            diff = (_extend(reader.bits(cat), cat)
                                    if cat else 0)
                            prev[cid] += diff
                            coef[cid][bi][0] = prev[cid] << al
                    else:
                        for cid, bi in _mcu_order_420(mw, mh):
                            if reader.bit():
                                coef[cid][bi][0] |= 1 << al
                else:                                 # non-interleaved DC
                    (cid, dc_id, _), = comps
                    if ah == 0:
                        _prog_dc_first(reader, huff[(0, dc_id)],
                                       coef[cid], al)
                    else:
                        for blk in coef[cid]:
                            if reader.bit():
                                blk[0] |= 1 << al
            else:
                (cid, _, ac_id), = comps
                if ah == 0:
                    _prog_ac_first(reader, huff[(1, ac_id)], coef[cid],
                                   ss, se, al)
                else:
                    _prog_ac_refine(reader, huff[(1, ac_id)], coef[cid],
                                    ss, se, al)

        # dequant + IDCT into planes, then 4:2:0 upsample + BT.601 -
        # identical math to the baseline 4:2:0 decoder
        yw = mw * 16
        cw = mw * 8
        yplane = bytearray(yw * mh * 16)
        cbp = bytearray(cw * mh * 8)
        crp = bytearray(cw * mh * 8)
        for cid, plane, bw_, pw in ((1, yplane, mw * 2, yw),
                                    (2, cbp, mw, cw), (3, crp, mw, cw)):
            q = quant[comp_q[cid]]
            for bi, zz in enumerate(coef[cid]):
                by, bx = bi // bw_, bi % bw_
                c = [0.0] * 64
                for zi, bidx in enumerate(ZIGZAG):
                    c[bidx] = zz[zi] * q[zi]
                blk = _idct_block(c)
                for y in range(8):
                    dst = (by * 8 + y) * pw + bx * 8
                    plane[dst:dst + 8] = bytes(blk[y * 8:(y + 1) * 8])
        out = bytearray(width * height * 3)
        for py in range(height):
            for px in range(width):
                yv = yplane[py * yw + px]
                cb = cbp[(py // 2) * cw + px // 2] - 128
                cr = crp[(py // 2) * cw + px // 2] - 128
                r = int(math.floor(yv + 1.402 * cr + 0.5))
                g = int(math.floor(yv - 0.344136 * cb - 0.714136 * cr + 0.5))
                b = int(math.floor(yv + 1.772 * cb + 0.5))
                dst = (py * width + px) * 3
                out[dst] = min(255, max(0, r))
                out[dst + 1] = min(255, max(0, g))
                out[dst + 2] = min(255, max(0, b))
        return (width, height, bytes(out))
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def planted_ycbcr420_progressive_jpeg(width: int, height: int, y0: int,
                                      cb0: int, cr0: int) -> bytes:
    """Progressive twin of planted_ycbcr420_jpeg: the same DC-only
    constant planes shipped as a 7-scan SOF2 stream (interleaved DC
    first at Al=1 + refinement, per-component AC band scans + a Y
    refinement) - recovering the constants requires the full color
    progressive machinery on top of the 4:2:0 table/predictor
    dispatch."""
    quant = [8] + [16] * 63
    mw, mh = width // 16, height // 16
    yb = []
    for _ in range(mw * 2 * mh * 2):
        blk = [0] * 64
        blk[0] = y0 - 128
        yb.append(blk)
    cbb, crb = [], []
    for _ in range(mw * mh):
        b1 = [0] * 64
        b1[0] = cb0 - 128
        cbb.append(b1)
        b2 = [0] * 64
        b2[0] = cr0 - 128
        crb.append(b2)
    return encode_ycbcr420_progressive_jpeg(
        width, height, yb, cbb, crb, quant, quant)


# ---------------------------------------------------------------------------
# Baseline YCbCr with GENERAL luma sampling factors (h, v in {1, 2}):
# closes the "subsamplings other than 4:2:0" gap for the profiles real
# encoders emit - 4:4:4 (1,1: no subsampling, e.g. high-quality
# scans), 4:2:2 (2,1: horizontal-only, the broadcast/video-frame
# profile), 4:4:0 (1,2: vertical-only), and 4:2:0 (2,2: dispatches to
# the dedicated decoder above, which also owns the progressive path).
# The MCU is h*v interleaved Y blocks + Cb + Cr; chroma stays 1x1 and
# upsamples by (h, v) nearest-neighbor. Arithmetic coding and restarts
# inside progressive scans remain rejected, not guessed.
# ---------------------------------------------------------------------------


def encode_ycbcr_jpeg(width: int, height: int, h: int, v: int,
                      y_blocks: list[list[int]],
                      cb_blocks: list[list[int]],
                      cr_blocks: list[list[int]],
                      quant_l: list[int], quant_c: list[int]) -> bytes:
    """Conforming baseline JPEG at luma sampling (h, v), chroma 1x1.
    MCU = h*v Y blocks (raster within the MCU) + Cb + Cr; luma tables
    in slot 0, chroma in slot 1; separate DC predictors. Width must be
    a multiple of 8h, height of 8v."""
    assert h in (1, 2) and v in (1, 2)
    assert width % (8 * h) == 0 and height % (8 * v) == 0
    dc_codes = _DC_CODES
    ac_codes = _AC_CODES
    w = _BitWriter()
    mw, mh = width // (8 * h), height // (8 * v)
    dc = {"y": 0, "cb": 0, "cr": 0}
    for my in range(mh):
        for mx in range(mw):
            for sy in range(v):
                for sx in range(h):
                    bi = (my * v + sy) * (mw * h) + (mx * h + sx)
                    dc["y"] = _encode_component_block(
                        w, y_blocks[bi], dc["y"], dc_codes, ac_codes)
            ci = my * mw + mx
            dc["cb"] = _encode_component_block(
                w, cb_blocks[ci], dc["cb"], dc_codes, ac_codes)
            dc["cr"] = _encode_component_block(
                w, cr_blocks[ci], dc["cr"], dc_codes, ac_codes)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    samp_y = (h << 4) | v
    dqt = (seg(0xFFDB, b"\x00" + bytes(quant_l))
           + seg(0xFFDB, b"\x01" + bytes(quant_c)))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3)
              + bytes([1, samp_y, 0]) + b"\x02\x11\x01" + b"\x03\x11\x01")
    dht = (seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
           + seg(0xFFC4, b"\x01" + bytes(_DC_BITS) + bytes(_DC_VALS))
           + seg(0xFFC4, b"\x11" + bytes(_AC_BITS) + bytes(_AC_VALS)))
    sos = seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11" + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def decode_ycbcr_jpeg(raw: bytes | None):
    """Full-color baseline decode for ANY luma sampling in
    {1,2}x{1,2} with 1x1 chroma: per-component Huffman slots and DC
    predictors, dequant, IDCT, (h, v) nearest-neighbor chroma
    upsampling, BT.601 with half-up rounding. 4:2:0 streams dispatch
    to `decode_ycbcr420_jpeg` (which also handles DRI/RSTn and
    progressive); returns (width, height, flat RGB bytes) or None."""
    if not raw or raw[:2] != b"\xff\xd8":
        return None
    try:
        i, n = 2, len(raw)
        quant: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        width = height = None
        comp_q: dict[int, int] = {}
        comp_tabs: dict[int, tuple[int, int]] = {}
        scan_start = None
        h = v = None
        dri_nonzero = False
        while i + 4 <= n:
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", raw[i + 2:i + 4])[0]
            body = raw[i + 4:i + 2 + seg_len]
            if marker == 0xDB:
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    if pq != 0:
                        return None
                    quant[tq] = list(body[j + 1:j + 65])
                    j += 65
            elif marker == 0xC4:
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    nv = sum(body[j + 1:j + 17])
                    huff[(tc, th)] = _decode_table(body[j + 1:j + 17 + nv])
                    j += 17 + nv
            elif marker == 0xC0:
                _, height, width, ncomp = struct.unpack(">BHHB", body[:6])
                if ncomp != 3:
                    return None
                samp = {}
                for c in range(3):
                    cid, s, tq = body[6 + 3 * c:9 + 3 * c]
                    samp[cid] = s
                    comp_q[cid] = tq
                if samp.get(2) != 0x11 or samp.get(3) != 0x11:
                    return None          # chroma must be 1x1
                sy = samp.get(1, 0)
                h, v = sy >> 4, sy & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    return None
                if (h, v) == (2, 2):     # 4:2:0 owns DRI + progressive
                    return decode_ycbcr420_jpeg(raw)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None
            elif marker == 0xDD:
                # DRI: restart markers are implemented only by the
                # 4:2:0 decoder (dispatched at SOF above, so if we
                # are still here the profile is not 4:2:0 - unless
                # DRI precedes SOF, covered by the post-loop check).
                # A nonzero interval here is an explicit
                # rejected-profile, not a mid-scan failure.
                dri_nonzero = struct.unpack(">H", body[:2])[0] != 0
                if dri_nonzero and h is not None:
                    return None
            elif marker == 0xDA:
                if body[0] != 3:
                    return None
                for c in range(3):
                    cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                    comp_tabs[cid] = (tabs >> 4, tabs & 0x0F)
                scan_start = i + 2 + seg_len
                break
            i += 2 + seg_len
        if None in (width, height, scan_start, h):
            return None
        if dri_nonzero:                  # DRI preceded the SOF
            return None
        end = raw.rfind(b"\xff\xd9")
        reader = _BitReader(raw[scan_start:end if end > 0 else n])
        mpw, mpv = 8 * h, 8 * v          # MCU pixel dims
        mw, mh = (width + mpw - 1) // mpw, (height + mpv - 1) // mpv
        yw, yh = mw * mpw, mh * mpv
        yplane = bytearray(yw * yh)
        cw = mw * 8
        cbp = bytearray(cw * mh * 8)
        crp = bytearray(cw * mh * 8)
        dc = {1: 0, 2: 0, 3: 0}
        for my in range(mh):
            for mx in range(mw):
                for sy in range(v):
                    for sx in range(h):
                        blk, dc[1] = _decode_block(
                            reader, huff[(0, comp_tabs[1][0])],
                            huff[(1, comp_tabs[1][1])],
                            quant[comp_q[1]], dc[1])
                        ox = mx * mpw + sx * 8
                        oy = my * mpv + sy * 8
                        for y in range(8):
                            dst = (oy + y) * yw + ox
                            yplane[dst:dst + 8] = bytes(
                                blk[y * 8:(y + 1) * 8])
                for cid, plane in ((2, cbp), (3, crp)):
                    blk, dc[cid] = _decode_block(
                        reader, huff[(0, comp_tabs[cid][0])],
                        huff[(1, comp_tabs[cid][1])],
                        quant[comp_q[cid]], dc[cid])
                    for y in range(8):
                        dst = (my * 8 + y) * cw + mx * 8
                        plane[dst:dst + 8] = bytes(blk[y * 8:(y + 1) * 8])
        out = bytearray(width * height * 3)
        for py in range(height):
            for px in range(width):
                yv = yplane[py * yw + px]
                cb = cbp[(py // v) * cw + px // h] - 128
                cr = crp[(py // v) * cw + px // h] - 128
                r = int(math.floor(yv + 1.402 * cr + 0.5))
                g = int(math.floor(yv - 0.344136 * cb - 0.714136 * cr + 0.5))
                b = int(math.floor(yv + 1.772 * cb + 0.5))
                dst = (py * width + px) * 3
                out[dst] = min(255, max(0, r))
                out[dst + 1] = min(255, max(0, g))
                out[dst + 2] = min(255, max(0, b))
        return (width, height, bytes(out))
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def planted_ycbcr_jpeg(width: int, height: int, h: int, v: int,
                       y0: int, cb0: int, cr0: int) -> bytes:
    """DC-only planted color image at luma sampling (h, v): Q[0]=8
    keeps the DC round trip bit-exact, so a correct decoder recovers
    the planted constants on every pixel."""
    quant = [8] + [16] * 63
    mw, mh = width // (8 * h), height // (8 * v)
    yb = []
    for _ in range(mw * h * mh * v):
        blk = [0] * 64
        blk[0] = y0 - 128
        yb.append(blk)
    cbb, crb = [], []
    for _ in range(mw * mh):
        b1 = [0] * 64
        b1[0] = cb0 - 128
        cbb.append(b1)
        b2 = [0] * 64
        b2[0] = cr0 - 128
        crb.append(b2)
    return encode_ycbcr_jpeg(width, height, h, v, yb, cbb, crb,
                             quant, quant)

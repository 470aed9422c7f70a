"""Round-12 JPEG decode/encode fast paths, pinned old-vs-new.

The baseline-gray decoder's entropy stage moved from the lazy per-bit
``_BitReader`` + dict-walk Huffman to ``_FastScanReader`` (one up-front
unstuff pass + 16-bit lookahead LUT), DC-only images take the
constant-plane IDCT shortcut, and ``_BitWriter.write`` emits whole
bytes instead of looping bits. All three must be OBSERVABLY IDENTICAL
to the lazy implementations - including on corrupt streams, where the
lazy reader raised at the first bad byte it actually consumed. The
lazy primitives still live in the module (the progressive and chroma
decoders use them), so the reference decode here is assembled from
those same primitives, frozen to the pre-round-12 loop shape.
"""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


import random

import numpy as np

from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
    _BitReader,
    _FastScanReader,
    _decode_huff,
    _decode_lut,
    _decode_table,
    _dc_only_plane,
    _extend,
    _idct_blocks,
    decode_gray_jpeg,
    encode_gray_jpeg,
    planted_gray_jpeg,
)


def _reference_decode(raw):
    """The pre-round-12 decode loop: same marker parse as the live
    decoder (shared via decode_gray_jpeg's own parsing being identical
    - this reimplements it to stay independent), lazy _BitReader, dict
    Huffman, batched IDCT. Returns (w, h, bytes) or None."""
    import struct

    if not raw or raw[:2] != b"\xff\xd8":
        return None
    try:
        i, n = 2, len(raw)
        quant, huff = {}, {}
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
                if ncomp != 1 or body[7] != 0x11:
                    return None
                qtab_id = body[8]
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None   # reference covers baseline gray only
            elif marker == 0xDD:
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:
                scan_start = i + 2 + seg_len
                dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
                break
            i += 2 + seg_len
        if None in (width, height, scan_start, qtab_id):
            return None
        q = quant[qtab_id]
        dc_tab = huff[(0, dc_id)]
        ac_tab = huff[(1, ac_id)]
        end = raw.rfind(b"\xff\xd9")
        reader = _BitReader(raw[scan_start:end if end > 0 else n])
        bw = (width + 7) // 8
        bh = (height + 7) // 8
        zz_rows = []
        prev_dc = 0
        rst_expect = 0
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
                cat = _decode_huff(reader, dc_tab)
                diff = _extend(reader.bits(cat), cat) if cat else 0
                prev_dc += diff
                zz[0] = prev_dc
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
                zz_rows.append(zz)
        blocks = _idct_blocks(zz_rows, q)
        img = (blocks.reshape(bh, bw, 8, 8)
               .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        return (width, height, img[:height, :width].tobytes())
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def _random_stream(rng, dc_only):
    w = 8 * rng.randint(1, 6)
    h = 8 * rng.randint(1, 6)
    blocks = []
    for _ in range((w // 8) * (h // 8)):
        blk = [0] * 64
        blk[0] = rng.choice([rng.randint(-1000, 1000), 0])
        if not dc_only:
            for _ in range(rng.randint(0, 12)):
                blk[rng.randint(1, 63)] = rng.randint(-100, 100)
        blocks.append(blk)
    q = [rng.randint(1, 255) for _ in range(64)]
    ri = rng.choice([0, 0, 1, 3])
    return encode_gray_jpeg(w, h, blocks, q, restart_interval=ri)


def test_fast_scan_decode_matches_lazy_reference_fuzz():
    """Valid streams (mixed-AC, all-DC-only, restart intervals),
    plus per-stream corruptions (truncation, bit flips, injected
    0xFF/garbage bytes) and trailing-junk tails: the fast decode and
    the lazy reference must agree EXACTLY - same pixels or both
    None - on every variant."""
    rng = random.Random(20261)
    for trial in range(120):
        raw = _random_stream(rng, dc_only=(trial % 2 == 0))
        variants = [raw]
        for _ in range(3):
            b = bytearray(raw)
            op = rng.randint(0, 3)
            if op == 0 and len(b) > 30:
                b = b[:rng.randint(20, len(b) - 1)]
            elif op == 1:
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            elif op == 2:
                b.insert(rng.randrange(len(b)), 0xFF)
            else:
                b.insert(rng.randrange(len(b)), rng.randrange(256))
            variants.append(bytes(b))
        # tail bytes the decoder never consumes must not change the
        # result (the lazy reader was lazy; the eager cleaner must be
        # fault-lazy to match), while a tail it DOES reach still fails
        variants.append(raw[:-2] + b"\x12\x34\xff\xd9")
        variants.append(raw[:-2] + b"\xff\x77\xff\xd9")
        for v in variants:
            assert decode_gray_jpeg(v) == _reference_decode(v)


def test_fast_scan_reader_restart_and_error_edges():
    # marker out of sequence: RST1 where RST0 is declared first
    raw = planted_gray_jpeg(32, 16, 50, restart_interval=1)
    i = raw.find(b"\xff\xd0")
    assert i > 0
    bad = raw[:i] + b"\xff\xd1" + raw[i + 2:]
    assert decode_gray_jpeg(bad) is None
    assert _reference_decode(bad) is None
    # stuffed 0xFF00 decodes identically through both readers
    rng = random.Random(7)
    for _ in range(200):
        raw = _random_stream(rng, dc_only=False)
        if b"\xff\x00" in raw:
            got = decode_gray_jpeg(raw)
            assert got is not None and got == _reference_decode(raw)
            break
    else:
        raise AssertionError("no stuffed stream generated")


def test_decode_lut_agrees_with_decode_dict():
    """Every 16-bit prefix: the LUT's (symbol, length) equals what the
    per-bit dict walk resolves, None exactly where the walk fails."""
    for bits, vals in (
        ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
         list(range(12))),
        ([0, 2, 3, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
         [5, 9, 1, 2, 3, 7, 8]),
    ):
        seg = bytes(bits) + bytes(vals)
        lut = _decode_lut(seg)
        table = _decode_table(seg)
        for peek in range(0, 65536, 257):   # stride covers all lengths
            code, length, hit = 0, 0, None
            while length < 16:
                code = (code << 1) | ((peek >> (15 - length)) & 1)
                length += 1
                sym = table.get((code, length))
                if sym is not None:
                    hit = (sym, length)
                    break
            assert lut[peek] == hit


def test_dc_only_plane_matches_idct_blocks():
    rng = random.Random(99)
    for _ in range(500):
        dc = rng.randint(-(1 << 16), 1 << 16)
        q0 = rng.randint(1, 255)
        zz = [0] * 64
        zz[0] = dc
        q = [q0] + [rng.randint(1, 255) for _ in range(63)]
        px = _idct_blocks([zz], q)[0]
        want = _dc_only_plane(dc, q0)
        assert (px == want).all(), (dc, q0, px[0][0], want)


def test_bitwriter_bytes_identical_to_bitwise_reference():
    """write() emits the same bytes (incl. 0xFF00 stuffing and the
    1-padded final byte) as the per-bit loop it replaced."""
    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        _BitWriter,
    )

    class _RefWriter:
        def __init__(self):
            self.buf = bytearray()
            self.acc = 0
            self.n = 0

        def write(self, code, length):
            for i in range(length - 1, -1, -1):
                self.acc = (self.acc << 1) | ((code >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.buf.append(self.acc)
                    if self.acc == 0xFF:
                        self.buf.append(0x00)
                    self.acc = 0
                    self.n = 0

        def flush(self):
            if self.n:
                self.acc <<= (8 - self.n)
                self.acc |= (1 << (8 - self.n)) - 1
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0
            return bytes(self.buf)

    rng = random.Random(4)
    for _ in range(300):
        fast, ref = _BitWriter(), _RefWriter()
        for _ in range(rng.randint(1, 120)):
            ln = rng.randint(1, 16)
            code = rng.randrange(1 << ln)
            fast.write(code, ln)
            ref.write(code, ln)
        assert fast.flush() == ref.flush()


def test_planted_payloads_roundtrip_unchanged():
    """The bench's planted payloads: bytes and decoded pixels both
    pinned against the analytic expectation."""
    for seed in range(0, 176, 7):
        raw = planted_gray_jpeg(16, 16, seed)
        w, h, px = decode_gray_jpeg(raw)
        assert (w, h) == (16, 16)
        arr = np.frombuffer(px, dtype=np.uint8).reshape(16, 16)
        # each 8x8 block is the constant (seed + bi*8) % 200 + 28;
        # the k6f oracle's analytic mean over the 4 blocks is seed+40
        for bi, (r, c) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
            blk = arr[r:r + 8, c:c + 8]
            assert (blk == (seed + bi * 8) % 200 + 28).all()
        assert float(arr.mean()) == seed + 40.0

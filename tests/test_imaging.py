"""Pure-python image header codec (pipeline/imaging.py): synthesis
round-trips through the parser; malformed payloads degrade to None."""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
    gif_bytes,
    jpeg_bytes,
    parse_image,
    png_bytes,
    synth_image,
)


@settings(max_examples=50, deadline=None)
@given(w=st.integers(1, 65535), h=st.integers(1, 65535))
def test_roundtrip_all_formats(w, h):
    assert parse_image(png_bytes(w, h)) == ("png", w, h)
    assert parse_image(jpeg_bytes(w, h, b"x" * (w % 23))) == ("jpeg", w, h)
    assert parse_image(gif_bytes(w, h)) == ("gif", w, h)


@settings(max_examples=30, deadline=None)
@given(doc_id=st.integers(0, 10**9))
def test_synth_matches_planted_dims(doc_id):
    fmt, w, h = parse_image(synth_image(doc_id))
    assert fmt == ("png", "jpeg", "gif")[doc_id % 3]
    assert w == doc_id % 640 + 1
    assert h == (doc_id * 7) % 480 + 16


def test_png_crc_is_valid():
    raw = png_bytes(12, 34)
    # IHDR chunk: length at 8..12, tag+body at 12..29, CRC at 29..33
    body = raw[12:29]
    import struct

    crc = struct.unpack(">I", raw[29:33])[0]
    assert crc == (zlib.crc32(body) & 0xFFFFFFFF)


def test_malformed_payloads_return_none():
    assert parse_image(None) is None
    assert parse_image(b"") is None
    assert parse_image(b"not an image at all") is None
    assert parse_image(png_bytes(5, 5)[:15]) is None      # truncated PNG
    assert parse_image(b"\xff\xd8\xff\xd9") is None       # JPEG with no SOF
    assert parse_image(b"\xff\xd8\x00\x00\x00\x00") is None  # bad marker
    # GIF magic but truncated descriptor
    assert parse_image(b"GIF89a\x01\x00") is None


def test_jpeg_marker_scan_skips_segments():
    """The parser must skip APP0/COM/DQT by their length fields, not
    assume SOF at a fixed offset."""
    long_comment = b"z" * 1000
    raw = jpeg_bytes(321, 123, long_comment)
    assert parse_image(raw) == ("jpeg", 321, 123)


# -- WAV ---------------------------------------------------------------------


def test_wav_round_trip_and_validity():
    import io
    import wave as stdwave

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        parse_wav,
        synth_wav,
    )

    for d in (0, 1, 2, 37, 999, 123456):
        raw = synth_wav(d)
        got = parse_wav(raw)
        want = ((8000, 16000, 44100)[d % 3], d % 2 + 1, 16, d % 100 + 10)
        assert got == want, (d, got, want)
        # the stdlib reader accepts the file => genuinely valid WAV,
        # and agrees with our parser on every header field
        w = stdwave.open(io.BytesIO(raw))
        assert (w.getframerate(), w.getnchannels(),
                w.getsampwidth() * 8, w.getnframes()) == want


def test_wav_parser_rejects_malformed():
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        parse_wav,
        synth_wav,
    )

    assert parse_wav(None) is None
    assert parse_wav(b"") is None
    assert parse_wav(b"RIFFxxxx") is None
    assert parse_wav(b"\x00" * 100) is None
    assert parse_wav(synth_wav(5)[:20]) is None          # truncated
    bad = bytearray(synth_wav(7))
    bad[20] = 9                                           # audio_format != PCM
    assert parse_wav(bytes(bad)) is None


def test_png_pixel_codec_roundtrip_all_filters():
    """Every scanline filter type (row%5 rotation) must unfilter back
    to the exact planted pixels."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_png_pixels,
        png_rgb_bytes,
    )

    raw = png_rgb_bytes(9, 11, 123)  # odd dims, >5 rows => all filters
    w, h, ch, px = decode_png_pixels(raw)
    assert (w, h, ch) == (9, 11, 3)
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 3
            assert px[o] == (123 + x) % 256
            assert px[o + 1] == (123 + y) % 256
            assert px[o + 2] == (x * y) % 256


def test_png_pixel_decoder_handles_split_idat_and_grey():
    import struct
    import zlib

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_png_pixels,
    )

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    # 2x2 8-bit greyscale, filter 0 rows, IDAT split across two chunks
    scan = b"\x00\x01\x02" + b"\x00\x03\x04"
    comp = zlib.compress(scan)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", comp[:5]) + chunk(b"IDAT", comp[5:])
           + chunk(b"IEND", b""))
    w, h, ch, px = decode_png_pixels(raw)
    assert (w, h, ch, bytes(px)) == (2, 2, 1, b"\x01\x02\x03\x04")


def test_png_pixel_decoder_rejects_garbage():
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_png_pixels,
        png_bytes,
        png_rgb_bytes,
    )

    assert decode_png_pixels(None) is None
    assert decode_png_pixels(b"notapng") is None
    # truncated pixel stream (header-only synth PNG) must not crash
    assert decode_png_pixels(png_bytes(100, 100)) is None
    # corrupted IDAT byte -> zlib error -> None, not an exception
    raw = bytearray(png_rgb_bytes(4, 4, 1))
    raw[60] ^= 0xFF
    assert decode_png_pixels(bytes(raw)) is None


def test_jpeg_codec_planted_blocks_bit_exact():
    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_jpeg,
        planted_gray_jpeg,
    )

    w, h, px = decode_gray_jpeg(planted_gray_jpeg(16, 16, 37))
    assert (w, h) == (16, 16)
    for by in range(2):
        for bx in range(2):
            v = (37 + (by * 2 + bx) * 8) % 200 + 28
            assert all(px[(by * 8 + y) * 16 + bx * 8 + x] == v
                       for y in range(8) for x in range(8))


def test_jpeg_decoder_matches_reference_idct_with_ac():
    """The general path: random AC coefficients, ZRL runs, EOB - the
    decoded pixels must equal a brute-force O(n^4) reference IDCT."""
    import math
    import random

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        ZIGZAG,
        decode_gray_jpeg,
        encode_gray_jpeg,
    )

    random.seed(7)
    quant = [8] + [16] * 63
    blocks = []
    for _ in range(4):
        blk = [0] * 64
        blk[0] = random.randint(-100, 100)
        for _ in range(6):
            blk[random.randint(1, 63)] = random.randint(-200, 200)
        blocks.append(blk)
    w, h, px = decode_gray_jpeg(encode_gray_jpeg(16, 16, blocks, quant))

    def ref_idct(zz):
        coef = [0.0] * 64
        for zi, bi in enumerate(ZIGZAG):
            coef[bi] = zz[zi] * quant[zi]
        pix = [0] * 64
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (cu * cv * coef[v * 8 + u]
                              * math.cos((2 * x + 1) * u * math.pi / 16)
                              * math.cos((2 * y + 1) * v * math.pi / 16))
                pix[y * 8 + x] = min(255, max(0, int(round(s / 4 + 128))))
        return pix

    for by in range(2):
        for bx in range(2):
            ref = ref_idct(blocks[by * 2 + bx])
            for y in range(8):
                for x in range(8):
                    assert px[(by * 8 + y) * 16 + bx * 8 + x] == ref[y * 8 + x]


def test_jpeg_decoder_rejects_unsupported_profiles():
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import jpeg_bytes
    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_jpeg,
    )

    assert decode_gray_jpeg(None) is None
    assert decode_gray_jpeg(b"\xff\xd8junk") is None
    # header-only synth JPEG (no scan data) must not crash
    assert decode_gray_jpeg(jpeg_bytes(64, 64)) is None


def test_gif_lzw_roundtrip_random_streams():
    """LZW encode->decode identity on random index streams long enough
    to grow through every code width and force a 4096-entry CLEAR
    reset."""
    import random

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        _gif_lzw_encode,
        gif_lzw_decode,
    )

    rnd = random.Random(0xBEEF)
    for n in (1, 7, 300, 5000, 30000):
        data = bytes(rnd.randrange(256) for _ in range(n))
        assert gif_lzw_decode(_gif_lzw_encode(data), 8) == data, n
    # highly repetitive data exercises deep table strings + KwKwK
    rep = b"\x01\x02" * 4000 + b"\x01" * 3000
    assert gif_lzw_decode(_gif_lzw_encode(rep), 8) == rep


def test_gif_lzw_kwkwk_case():
    """The code-equals-next-table-slot (KwKwK) special case decodes
    per spec: 'aaa...' makes the encoder emit a code the decoder has
    not yet built."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        _gif_lzw_encode,
        gif_lzw_decode,
    )

    data = b"\x05" * 50
    assert gif_lzw_decode(_gif_lzw_encode(data), 8) == data


def test_gif_pixel_decode_planted_means():
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_gif_pixels,
        gif_indexed_bytes,
    )

    for seed in (0, 57, 219):
        w, h, px = decode_gif_pixels(gif_indexed_bytes(16, 16, seed))
        assert (w, h) == (16, 16)
        n = w * h
        assert sum(px[0::3]) / n == seed + 15.0
        assert sum(px[1::3]) / n == 240.0 - seed
        assert sum(px[2::3]) / n == seed + 14.5


def test_gif_decode_rejects_garbage_and_honors_interlace_flag():
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_gif_pixels,
        gif_indexed_bytes,
    )

    assert decode_gif_pixels(None) is None
    assert decode_gif_pixels(b"NOTAGIF") is None
    # Flipping the interlace bit on a NON-interlaced stream must
    # change the decode (rows land per the 4-pass permutation) -
    # proving the flag is honored, not ignored. Round 5 made
    # interlace a decoded profile (test_gif_interlaced_roundtrip);
    # a decoder that ignored the flag would pass a round-trip test
    # but fail this one.
    raw = bytearray(gif_indexed_bytes(16, 16, 3))
    desc = raw.index(0x2C, 13 + 768)
    raw[desc + 9] |= 0x40
    straight = decode_gif_pixels(gif_indexed_bytes(16, 16, 3))
    flipped = decode_gif_pixels(bytes(raw))
    assert flipped is not None and flipped != straight


def test_mp4_box_walk_roundtrip_and_rejects():
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        mp4_bytes,
        parse_mp4,
    )

    for ts, dur, w, h in ((1000, 1, 320, 180), (9973, 119, 1920, 1080)):
        assert parse_mp4(mp4_bytes(ts, dur, w, h)) == (ts, ts * dur, w, h)
    assert parse_mp4(None) is None
    assert parse_mp4(b"short") is None
    raw = mp4_bytes(1000, 42, 1280, 720)
    assert parse_mp4(raw[:-3]) is None          # broken size chain
    corrupt = bytearray(raw)
    corrupt[0] = 0xFF                            # ftyp size overflows file
    assert parse_mp4(bytes(corrupt)) is None


def test_mp4_largesize_and_v1_mvhd():
    """The walker handles the 64-bit largesize form and version-1
    mvhd (64-bit times) - both legal encodings a real producer can
    emit even when the 32-bit form would fit."""
    import struct

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import parse_mp4

    mvhd_v1 = (struct.pack(">BxxxQQIQ", 1, 0, 0, 777, 777 * 9)
               + b"\x00" * 80)
    mvhd_box = struct.pack(">I", 8 + len(mvhd_v1)) + b"mvhd" + mvhd_v1
    # moov wrapped in the size==1 largesize form
    moov = (struct.pack(">I", 1) + b"moov"
            + struct.pack(">Q", 16 + len(mvhd_box)) + mvhd_box)
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    got = parse_mp4(ftyp + moov)
    assert got is not None and got[0] == 777 and got[1] == 777 * 9


def test_exif_both_byte_orders_and_rejects():
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        exif_jpeg_bytes,
        parse_exif,
    )

    for be, bo in ((False, "II"), (True, "MM")):
        got = parse_exif(exif_jpeg_bytes(6, 1920, "CAM7", be))
        assert got == (6, 1920, "CAM7", bo)
    assert parse_exif(None) is None
    assert parse_exif(b"\xFF\xD8\xFF\xD9") is None     # no APP1
    raw = bytearray(exif_jpeg_bytes(3, 800, "CAM1", True))
    raw[14] = ord("X")                                  # corrupt byte order
    assert parse_exif(bytes(raw)) is None


def test_jpeg_chroma_planted_roundtrip_and_gradient_blocks():
    """4:2:0 color decode: planted constants recover bit-exactly, and
    an image with DIFFERENT values per MCU exercises the per-component
    DC predictor chains (a predictor mix-up between Y/Cb/Cr shifts
    later MCUs)."""
    import math

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_ycbcr420_jpeg,
        encode_ycbcr420_jpeg,
        planted_ycbcr420_jpeg,
    )

    for y0, cb0, cr0 in ((100, 90, 160), (38, 68, 58), (217, 187, 197)):
        w, h, px = decode_ycbcr420_jpeg(planted_ycbcr420_jpeg(
            16, 16, y0, cb0, cr0))
        assert (w, h) == (16, 16)
        cb, cr = cb0 - 128, cr0 - 128
        want = (
            min(255, max(0, math.floor(y0 + 1.402 * cr + 0.5))),
            min(255, max(0, math.floor(y0 - 0.344136 * cb
                                       - 0.714136 * cr + 0.5))),
            min(255, max(0, math.floor(y0 + 1.772 * cb + 0.5))),
        )
        assert set(zip(px[0::3], px[1::3], px[2::3])) == {want}

    # 32x16: two MCUs with distinct planted constants per component
    quant = [8] + [16] * 63

    def dcb(v):
        b = [0] * 64
        b[0] = v - 128
        return b

    yb = [dcb(100), dcb(100), dcb(100), dcb(100),
          dcb(150), dcb(150), dcb(150), dcb(150)]
    # y block raster order for 32x16: (0,0)(0,1)(0,2)(0,3) in a 4-wide row
    yb = [dcb(100), dcb(100), dcb(150), dcb(150),
          dcb(100), dcb(100), dcb(150), dcb(150)]
    cbb, crb = [dcb(90), dcb(110)], [dcb(160), dcb(140)]
    raw = encode_ycbcr420_jpeg(32, 16, yb, cbb, crb, quant, quant)
    w, h, px = decode_ycbcr420_jpeg(raw)
    assert (w, h) == (32, 16)
    # left MCU pixel (0,0) and right MCU pixel (16,0)
    import math as m
    left = (m.floor(100 + 1.402 * 32 + .5),
            m.floor(100 - 0.344136 * -38 - 0.714136 * 32 + .5),
            m.floor(100 + 1.772 * -38 + .5))
    right = (m.floor(150 + 1.402 * 12 + .5),
             m.floor(150 - 0.344136 * -18 - 0.714136 * 12 + .5),
             m.floor(150 + 1.772 * -18 + .5))
    assert tuple(px[0:3]) == left
    off = (0 * 32 + 16) * 3
    assert tuple(px[off:off + 3]) == right
    # truncation rejects
    assert decode_ycbcr420_jpeg(raw[:40]) is None


def test_jpeg_dri_restart_roundtrip_bit_exact():
    """DRI/RSTn streams (VERDICT r4 #7): a restart-marker stream must
    decode to EXACTLY the same pixels as the marker-free encoding of
    the same blocks - across intervals that exercise marker cycling
    past RST7 and an interval larger than the MCU count (no markers
    emitted at all)."""
    import random

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_jpeg,
        decode_ycbcr420_jpeg,
        encode_gray_jpeg,
        encode_ycbcr420_jpeg,
    )

    random.seed(11)
    quant = [8] + [16] * 63
    w, h = 64, 40                          # 40 MCUs -> RSTn wraps at ri=3
    blocks = []
    for _ in range(40):
        blk = [0] * 64
        blk[0] = random.randint(-100, 100)
        for _ in range(6):
            blk[random.randint(1, 63)] = random.randint(-20, 20)
        blocks.append(blk)
    base = decode_gray_jpeg(encode_gray_jpeg(w, h, blocks, quant))
    assert base is not None
    for ri in (1, 3, 7, 39, 1000):
        got = decode_gray_jpeg(
            encode_gray_jpeg(w, h, blocks, quant, restart_interval=ri))
        assert got == base, f"gray interval {ri}"

    yb = []
    for i in range(24):
        blk = [0] * 64
        blk[0] = (i * 7) % 160 - 80
        blk[5] = 3
        yb.append(blk)
    cbb = [[(i * 11) % 60 - 30] + [0] * 63 for i in range(6)]
    crb = [[(i * 13) % 60 - 30] + [0] * 63 for i in range(6)]
    base_c = decode_ycbcr420_jpeg(
        encode_ycbcr420_jpeg(48, 32, yb, cbb, crb, quant, quant))
    assert base_c is not None
    for ri in (1, 2, 5):
        got = decode_ycbcr420_jpeg(encode_ycbcr420_jpeg(
            48, 32, yb, cbb, crb, quant, quant, restart_interval=ri))
        assert got == base_c, f"420 interval {ri}"


def test_jpeg_dri_corrupt_streams_rejected():
    """Out-of-sequence and missing restart markers are corruption, not
    something to guess over: decode returns None."""
    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_jpeg,
        planted_gray_jpeg,
    )

    raw = bytearray(planted_gray_jpeg(32, 32, 5, restart_interval=2))
    ok = decode_gray_jpeg(bytes(raw))
    assert ok is not None
    i = raw.find(b"\xff\xd0")
    assert i > 0
    wrong = bytearray(raw)
    wrong[i + 1] = 0xD5                    # RST0 expected, RST5 found
    assert decode_gray_jpeg(bytes(wrong)) is None
    missing = raw[:i] + raw[i + 2:]        # marker deleted entirely
    assert decode_gray_jpeg(bytes(missing)) is None


def test_png_palette_roundtrip_and_rejects():
    """Palette (type 3) PNG: planted indexes recovered bit-exactly
    through unfilter-then-palette-map; PLTE-less palette images and
    out-of-range indexes are rejected, not guessed."""
    import struct
    import zlib

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_png_pixels,
        png_palette_bytes,
    )

    raw = png_palette_bytes(16, 16, 100)
    w, h, ch, px = decode_png_pixels(raw)
    assert (w, h, ch) == (16, 16, 3)
    for y in range(16):
        for x in range(16):
            p = 100 + x + 2 * y
            k = (y * 16 + x) * 3
            assert px[k:k + 3] == bytes((p, 255 - p, p // 2)), (x, y)
    # strip PLTE -> corrupt
    i = raw.find(b"PLTE") - 4
    (ln,) = struct.unpack(">I", raw[i:i + 4])
    assert decode_png_pixels(raw[:i] + raw[i + 12 + ln:]) is None
    # truncate the palette below the max planted index -> corrupt
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    short_plte = chunk(b"PLTE", bytes(30))  # 10 entries only
    trunc = raw[:i] + short_plte + raw[i + 12 + ln:]
    assert decode_png_pixels(trunc) is None


def test_jpeg_progressive_equals_baseline_random_blocks():
    """Progressive (SOF2) decode == baseline decode of the SAME
    quantized blocks, across random dense corpora, a deep
    successive-approximation scan script, EOBRUN/ZRL-heavy sparse
    corpora, negative DCs, and the all-zero image. The baseline
    decoder is independently verified against a reference IDCT, so
    equality here transfers that trust to every progressive path
    (DC first/refine, AC first with EOBRUN, AC refine with
    insertions + correction bits)."""
    import random

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_jpeg,
        decode_gray_progressive_jpeg,
        encode_gray_jpeg,
        encode_gray_progressive_jpeg,
    )

    quant = [8] + [16] * 63
    deep = ((0, 0, 0, 2), (0, 0, 2, 1), (0, 0, 1, 0),
            (1, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0))
    random.seed(42)
    for trial in range(8):
        blocks = []
        for _ in range(12):
            blk = [0] * 64
            blk[0] = random.randint(-200, 200)
            for _ in range(random.randint(0, 30)):
                blk[random.randint(1, 63)] = random.randint(-100, 100)
            blocks.append(blk)
        base = decode_gray_jpeg(encode_gray_jpeg(32, 24, blocks, quant))
        assert base is not None
        for scans in (None, deep):
            raw = (encode_gray_progressive_jpeg(32, 24, blocks, quant)
                   if scans is None else
                   encode_gray_progressive_jpeg(32, 24, blocks, quant, scans))
            assert decode_gray_progressive_jpeg(raw) == base, (trial, scans)
    # EOBRUN-heavy: long runs of empty blocks + deep ZRL gaps
    blocks = []
    for b in range(64):
        blk = [0] * 64
        if b % 13 == 0:
            blk[0] = 40
            blk[60] = 3
        blocks.append(blk)
    assert decode_gray_progressive_jpeg(
        encode_gray_progressive_jpeg(64, 64, blocks, quant, deep)) == \
        decode_gray_jpeg(encode_gray_jpeg(64, 64, blocks, quant))
    # all-zero
    z = [[0] * 64 for _ in range(4)]
    assert decode_gray_progressive_jpeg(
        encode_gray_progressive_jpeg(16, 16, z, quant)) == \
        decode_gray_jpeg(encode_gray_jpeg(16, 16, z, quant))


def test_jpeg_progressive_dispatch_and_planted():
    """decode_gray_jpeg dispatches SOF2 automatically; the planted
    progressive fixture recovers the same bit-exact pixels as its
    baseline twin."""
    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_jpeg,
        planted_gray_jpeg,
        planted_gray_progressive_jpeg,
    )

    for seed in (0, 7, 100, 175):
        a = decode_gray_jpeg(planted_gray_progressive_jpeg(16, 16, seed))
        b = decode_gray_jpeg(planted_gray_jpeg(16, 16, seed))
        assert a is not None and a == b


def test_jpeg_progressive_rejects_out_of_scope():
    """Nonzero DRI inside a progressive stream and truncated scans are
    rejected, not guessed."""
    import struct

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_progressive_jpeg,
        planted_gray_progressive_jpeg,
    )

    raw = planted_gray_progressive_jpeg(16, 16, 5)
    # splice a DRI=2 segment before the first SOS
    i = raw.find(b"\xff\xda")
    dri = struct.pack(">HHH", 0xFFDD, 4, 2)
    assert decode_gray_progressive_jpeg(raw[:i] + dri + raw[i:]) is None
    # truncate mid-scan
    assert decode_gray_progressive_jpeg(raw[:i + 20]) is None


def test_jpeg_progressive_color_equals_baseline():
    """Progressive 4:2:0 color decode == baseline color decode of the
    same blocks (random dense AC on all three components), and the
    planted progressive color fixture equals its baseline twin via
    the decode_ycbcr420_jpeg SOF2 dispatch."""
    import random

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_ycbcr420_jpeg,
        decode_ycbcr420_progressive_jpeg,
        encode_ycbcr420_jpeg,
        encode_ycbcr420_progressive_jpeg,
        planted_ycbcr420_jpeg,
        planted_ycbcr420_progressive_jpeg,
    )

    random.seed(5)
    quant = [8] + [16] * 63
    for trial in range(6):
        mw, mh = 3, 2
        yb = []
        for _ in range(mw * 2 * mh * 2):
            blk = [0] * 64
            blk[0] = random.randint(-150, 150)
            for _ in range(random.randint(0, 15)):
                blk[random.randint(1, 63)] = random.randint(-60, 60)
            yb.append(blk)
        cbb, crb = [], []
        for _ in range(mw * mh):
            b1 = [0] * 64
            b1[0] = random.randint(-60, 60)
            for _ in range(random.randint(0, 6)):
                b1[random.randint(1, 63)] = random.randint(-20, 20)
            cbb.append(b1)
            b2 = [0] * 64
            b2[0] = random.randint(-60, 60)
            for _ in range(random.randint(0, 6)):
                b2[random.randint(1, 63)] = random.randint(-20, 20)
            crb.append(b2)
        base = decode_ycbcr420_jpeg(
            encode_ycbcr420_jpeg(48, 32, yb, cbb, crb, quant, quant))
        prog = decode_ycbcr420_progressive_jpeg(
            encode_ycbcr420_progressive_jpeg(
                48, 32, yb, cbb, crb, quant, quant))
        assert base is not None and prog == base, trial
    # planted fixture through the baseline entry point's dispatch
    a = decode_ycbcr420_jpeg(
        planted_ycbcr420_progressive_jpeg(16, 16, 120, 100, 90))
    b = decode_ycbcr420_jpeg(planted_ycbcr420_jpeg(16, 16, 120, 100, 90))
    assert a is not None and a == b


def test_png_adam7_interlaced_roundtrip():
    """Adam7-interlaced PNG: planted pixels recovered bit-exactly
    across geometries that exercise empty and single-pixel passes;
    decode_png_pixels dispatches interlace=1 itself; truncated pass
    data is rejected."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_png_interlaced,
        decode_png_pixels,
        png_interlaced_bytes,
    )

    for (w, h, seed) in ((16, 16, 100), (17, 13, 37), (8, 1, 5),
                         (1, 9, 200), (7, 7, 3)):
        got = decode_png_pixels(png_interlaced_bytes(w, h, seed))
        assert got is not None, (w, h, seed)
        wi, hi, ch, px = got
        assert (wi, hi, ch) == (w, h, 3)
        for y in range(h):
            for x in range(w):
                k = (y * w + x) * 3
                assert px[k:k + 3] == bytes(
                    ((seed + x) % 256, (seed + y) % 256, (x * y) % 256)), \
                    (w, h, seed, x, y)
    # corrupt: chop compressed pass data
    import struct
    import zlib
    raw = png_interlaced_bytes(16, 16, 9)
    i = raw.find(b"IDAT") - 4
    (ln,) = struct.unpack(">I", raw[i:i + 4])
    idat = raw[i + 8:i + 8 + ln]
    short = zlib.compress(zlib.decompress(idat)[:-40])

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    trunc = raw[:i] + chunk(b"IDAT", short) + raw[i + 12 + ln:]
    assert decode_png_interlaced(trunc) is None


def test_gif_interlaced_roundtrip():
    """4-pass interlaced GIF decodes to the same pixels as its
    non-interlaced twin across odd heights (uneven pass sizes)."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_gif_pixels,
        gif_indexed_bytes,
    )

    for (w, h, seed) in ((16, 16, 100), (16, 16, 0), (16, 16, 219),
                         (10, 7, 50), (5, 3, 9), (8, 1, 2)):
        a = decode_gif_pixels(gif_indexed_bytes(w, h, seed))
        b = decode_gif_pixels(gif_indexed_bytes(w, h, seed,
                                                interlaced=True))
        assert a is not None and a == b, (w, h, seed)


def test_bmp_roundtrip_both_profiles():
    """BI_RGB 24-bit and BI_RLE8 8-bit decode to the planted pixels;
    truncation and bad magic reject rather than mis-decode."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        bmp_rgb_bytes,
        bmp_rle8_bytes,
        decode_bmp_pixels,
    )

    for seed in (0, 42, 199):
        w, h, px = decode_bmp_pixels(bmp_rgb_bytes(16, 16, seed))
        assert (w, h) == (16, 16)
        # top-left pixel (x=0, y=0): r=seed, g=seed, b=0
        assert px[0] == (seed % 256, seed % 256, 0)
        # means are exact .5 fractions
        assert sum(p[0] for p in px) / 256 == seed % 200 + 7.5

        w, h, px = decode_bmp_pixels(bmp_rle8_bytes(16, 16, seed))
        assert (w, h) == (16, 16)
        assert all(p[0] == p[1] == p[2] for p in px)  # gray palette
        assert sum(p[0] for p in px) / 256 == seed % 200 + 7.5

    assert decode_bmp_pixels(None) is None
    assert decode_bmp_pixels(b"XX" + bmp_rgb_bytes(4, 4, 1)[2:]) is None
    assert decode_bmp_pixels(bmp_rgb_bytes(4, 4, 1)[:30]) is None


def test_g711_reference_points():
    """The expand formulas hit the classic G.711 reference values:
    mu-law 0xFF is zero, 0x7F is negative zero, and the extreme code
    words reach the spec's max magnitudes (mu: 8031*4, A: 4096*8)."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        alaw_to_linear,
        decode_g711_wav,
        g711_wav_bytes,
        ulaw_to_linear,
    )

    assert ulaw_to_linear(0xFF) == 0
    assert ulaw_to_linear(0x7F) == 0
    assert ulaw_to_linear(0x80) == 32124   # max positive
    assert ulaw_to_linear(0x00) == -32124  # max negative
    assert alaw_to_linear(0xD5) == 8       # +0 codes to 8 (A-law has no 0)
    assert alaw_to_linear(0x55) == -8
    assert alaw_to_linear(0xAA) == 32256   # max positive
    assert alaw_to_linear(0x2A) == -32256

    codes = bytes(range(256))
    name, pcm = decode_g711_wav(g711_wav_bytes(7, 8000, codes))
    assert name == "ulaw" and len(pcm) == 256
    assert pcm == [ulaw_to_linear(b) for b in codes]
    # A mu-law stream over all codes is symmetric: sum == 0
    assert sum(pcm) == 0
    name, pcm = decode_g711_wav(g711_wav_bytes(6, 8000, codes))
    assert name == "alaw" and sum(pcm) == 0
    # plain PCM (format 1) is NOT G.711: reject, never mis-expand
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import wav_bytes
    assert decode_g711_wav(wav_bytes(8000, 1, 16, 10, seed=1)) is None


def test_tiff_roundtrip_both_byte_orders():
    """Strip reassembly recovers the raster in II and MM byte order,
    including odd heights where the last strip is short; compressed
    or truncated files reject."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_tiff_gray,
        tiff_gray_bytes,
    )

    for be in (False, True):
        for (w, h, rps) in ((16, 16, 4), (16, 10, 4), (8, 3, 2)):
            raw = tiff_gray_bytes(w, h, 42, be, rows_per_strip=rps)
            got = decode_tiff_gray(raw)
            assert got is not None
            bo, gw, gh, n_strips, px = got
            assert (bo, gw, gh) == ("MM" if be else "II", w, h)
            assert n_strips == (h + rps - 1) // rps
            assert px == [(42 + (x + y) % 16) % 256
                          for y in range(h) for x in range(w)]
    assert decode_tiff_gray(None) is None
    assert decode_tiff_gray(b"II+\x00" + b"\x00" * 16) is None
    assert decode_tiff_gray(tiff_gray_bytes(8, 8, 1, False)[:40]) is None


def test_png16_roundtrip_and_rejections():
    """16-bit PNG: bit-exact roundtrip across all five filters, and
    rejected-not-guessed for wrong depth/color/interlace/corrupt
    zlib."""
    import struct
    import zlib

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_png16_pixels,
        decode_png_pixels,
        png_bytes,
        png_gray16_bytes,
    )

    raw = png_gray16_bytes(9, 8, 41)
    w, h, samples = decode_png16_pixels(raw)
    assert (w, h) == (9, 8)
    assert samples == [(41 * 7919 + y * 9 + x * 31) % 65536
                       for y in range(8) for x in range(9)]
    assert max(samples) > 255, "must exercise true 16-bit range"

    # an 8-bit PNG is NOT decodable as 16-bit (and vice versa)
    assert decode_png16_pixels(png_bytes(4, 4)) is None
    assert decode_png_pixels(raw) is None

    # corrupt the IDAT payload -> zlib error -> None, never garbage
    bad = bytearray(raw)
    idat_off = bad.index(b"IDAT") + 10
    bad[idat_off] ^= 0xFF
    assert decode_png16_pixels(bytes(bad)) is None

    # truncated stream
    assert decode_png16_pixels(raw[:20]) is None
    assert decode_png16_pixels(None) is None


def test_jpeg_general_sampling_roundtrip_and_dispatch():
    """General-sampling baseline codec (4:4:4 / 4:2:2 / 4:4:0 /
    4:2:0): planted constants recovered on every pixel at every
    profile; the (2,2) stream decodes bit-exactly equal via the
    general decoder and the dedicated 4:2:0 path (shared-kernel
    cross-check); non-1x1 chroma and unknown luma factors rejected."""
    import random
    import struct as _struct

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_ycbcr420_jpeg,
        decode_ycbcr_jpeg,
        planted_ycbcr420_jpeg,
        planted_ycbcr_jpeg,
    )

    rng = random.Random(42)
    for (h, v) in ((1, 1), (2, 1), (1, 2), (2, 2)):
        for _ in range(3):
            y0, cb0, cr0 = (rng.randrange(30, 220), rng.randrange(40, 200),
                            rng.randrange(40, 200))
            raw = planted_ycbcr_jpeg(16, 16, h, v, y0, cb0, cr0)
            d = decode_ycbcr_jpeg(raw)
            assert d is not None, (h, v)
            w, ht, px = d
            assert (w, ht) == (16, 16)
            # constant planted image -> every channel constant
            assert len(set(px[0::3])) == 1
            assert len(set(px[1::3])) == 1
            assert len(set(px[2::3])) == 1
            if (h, v) == (2, 2):
                twin = decode_ycbcr420_jpeg(
                    planted_ycbcr420_jpeg(16, 16, y0, cb0, cr0))
                assert d == twin, "general (2,2) diverged from 420 path"

    # rejection: truncated scan, corrupted SOF sampling byte
    raw = planted_ycbcr_jpeg(16, 16, 2, 1, 100, 90, 150)
    assert decode_ycbcr_jpeg(raw[: len(raw) // 2]) is None
    sof_at = raw.find(b"\xff\xc0")
    body_at = sof_at + 4
    # luma sampling byte -> 3x1 (unsupported factor)
    bad = bytearray(raw)
    bad[body_at + 7] = 0x31
    assert decode_ycbcr_jpeg(bytes(bad)) is None
    # chroma sampling byte -> 2x1 (non-1x1 chroma rejected)
    bad = bytearray(raw)
    bad[body_at + 10] = 0x21
    assert decode_ycbcr_jpeg(bytes(bad)) is None


def test_progressive_restart_roundtrip_and_rejection():
    """Restarts inside progressive scans: for random coefficient
    blocks (DC + up to 10 AC coefs), the restart-encoded stream
    decodes bit-identically to the no-restart stream at intervals
    1/2/3/5 (every scan kernel crosses restart boundaries); an
    out-of-sequence RST index is rejected."""
    import random

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_progressive_jpeg,
        encode_gray_progressive_jpeg,
    )

    rng = random.Random(7)
    quant = [8] + [16] * 63
    for _ in range(10):
        bw, bh = rng.choice([(2, 2), (4, 2), (4, 4)])
        w, h = bw * 8, bh * 8
        blocks = []
        for _ in range(bw * bh):
            blk = [0] * 64
            blk[0] = rng.randrange(-80, 80)
            for _ in range(rng.randrange(0, 10)):
                blk[rng.randrange(1, 64)] = rng.randrange(-30, 31)
            blocks.append(blk)
        base = decode_gray_progressive_jpeg(
            encode_gray_progressive_jpeg(w, h, [b[:] for b in blocks],
                                         quant))
        assert base is not None
        for ri in (1, 2, 3, 5):
            rt = decode_gray_progressive_jpeg(
                encode_gray_progressive_jpeg(
                    w, h, [b[:] for b in blocks], quant,
                    restart_interval=ri))
            assert rt == base, f"interval {ri} diverged"

    raw = encode_gray_progressive_jpeg(
        16, 16, [[10] + [0] * 63] * 4, quant, restart_interval=1)
    bad = bytearray(raw)
    i = bad.find(b"\xff\xd0")
    assert i > 0
    bad[i + 1] = 0xD4
    assert decode_gray_progressive_jpeg(bytes(bad)) is None


def test_arithmetic_jpeg_rejected_fail_closed():
    """Permanent-rejection pin (round-7 decision, VERDICT r6 #5):
    arithmetic-coded JPEG (SOF9/SOF10/SOF11 + DAC) must fail CLOSED in
    every decoder entry point - None at the frame header, before any
    scan byte is touched - because the QM-coder's 113-row empirical
    state table (T.81 Table D.3) is unavailable here and a
    self-validated reimplementation would decode its own fixtures
    while silently corrupting real streams. A Huffman twin of each
    stream must still decode, proving the rejection keys on the SOF
    marker, not on any other framing detail."""
    import struct as st_

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_jpeg,
        decode_gray_progressive_jpeg,
        decode_ycbcr420_jpeg,
        decode_ycbcr420_progressive_jpeg,
        decode_ycbcr_jpeg,
        encode_gray_jpeg,
        encode_ycbcr420_jpeg,
        encode_ycbcr_jpeg,
    )

    def seg(marker: int, body: bytes) -> bytes:
        return st_.pack(">HH", marker, len(body) + 2) + body

    quant = [16] * 64

    def with_sof(huff_stream: bytes, arith_sof: int) -> bytes:
        """Rewrite the Huffman stream's SOF0/SOF2 marker to the
        arithmetic one and append a DAC segment after it - framing
        stays valid, only the entropy-coder declaration changes."""
        out = bytearray(huff_stream)
        for cand in (b"\xff\xc0", b"\xff\xc2"):
            i = out.find(cand)
            if i >= 0:
                break
        assert i >= 0
        out[i + 1] = arith_sof & 0xFF
        sof_len = st_.unpack(">H", bytes(out[i + 2:i + 4]))[0]
        dac = seg(0xFFCC, b"\x00\x10\x10\x05")   # DC cond + AC Kx
        return bytes(out[:i + 2 + sof_len]) + dac + bytes(out[i + 2 + sof_len:])

    blk = [5] + [0] * 63
    gray = encode_gray_jpeg(16, 16, [blk[:] for _ in range(4)], quant)
    color420 = encode_ycbcr420_jpeg(
        16, 16, [blk[:] for _ in range(4)], [blk[:]], [blk[:]],
        quant, quant)
    color444 = encode_ycbcr_jpeg(
        8, 8, 1, 1, [blk[:]], [blk[:]], [blk[:]], quant, quant)

    # sanity: the Huffman twins decode
    assert decode_gray_jpeg(gray) is not None
    assert decode_ycbcr420_jpeg(color420) is not None
    assert decode_ycbcr_jpeg(color444) is not None

    for sof in (0xC9, 0xCA, 0xCB):       # arith seq / prog / lossless
        assert decode_gray_jpeg(with_sof(gray, sof)) is None
        assert decode_gray_progressive_jpeg(with_sof(gray, sof)) is None
        assert decode_ycbcr420_jpeg(with_sof(color420, sof)) is None
        assert decode_ycbcr420_progressive_jpeg(
            with_sof(color420, sof)) is None
        assert decode_ycbcr_jpeg(with_sof(color444, sof)) is None


def test_idct_blocks_matches_idct_block_exactly():
    """Round-12 optimization guard: the whole-image batched IDCT
    (`_idct_blocks`) must be BIT-IDENTICAL to the per-block
    `_idct_block` - same dequant products, same per-8x8-slice matmuls,
    same round-half-even - on random dense/sparse coefficient blocks.
    A single differing pixel here would move k6f's analytic oracle
    mean."""
    import random

    import numpy as np

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        ZIGZAG,
        _idct_block,
        _idct_blocks,
    )

    random.seed(41)
    for _ in range(50):
        nb = random.randint(1, 9)
        q = [random.randint(1, 64) for _ in range(64)]
        zz_rows = [[random.randint(-300, 300) for _ in range(64)]
                   for _ in range(nb)]
        batched = _idct_blocks(zz_rows, q)
        for i, zz in enumerate(zz_rows):
            coef = [0.0] * 64
            for zi, bi in enumerate(ZIGZAG):
                coef[bi] = zz[zi] * q[zi]
            single = np.array(_idct_block(coef),
                              dtype=np.uint8).reshape(8, 8)
            assert (batched[i] == single).all()


def test_dht_table_memoization_is_pure():
    """Round-12 optimization guard: `_decode_table` memoizes decode
    dicts on the raw DHT payload bytes. The cached and freshly-built
    tables must be equal, distinct payloads must not collide, and a
    truncated payload must still fail loudly (decoder returns None),
    never cache a bad table."""
    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        _DHT_CACHE,
        _build_codes,
        _decode_table,
        decode_gray_jpeg,
        planted_gray_jpeg,
    )

    _DHT_CACHE.clear()
    bits = [0, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    vals = [7, 3, 1, 9]
    seg = bytes(bits) + bytes(vals)
    fresh = {(c, ln): sym
             for sym, (c, ln) in _build_codes(bits, vals).items()}
    assert _decode_table(seg) == fresh
    assert _decode_table(seg) is _decode_table(seg)      # cached
    other = bytes(bits) + bytes([7, 3, 1, 8])
    assert _decode_table(other) != _decode_table(seg)    # no collision
    # decoding is unchanged whether tables come cold or cached
    raw = planted_gray_jpeg(16, 16, 97)
    _DHT_CACHE.clear()
    cold = decode_gray_jpeg(raw)
    warm = decode_gray_jpeg(raw)
    assert cold == warm and cold is not None

"""Pure-python image header codec (pipeline/imaging.py): synthesis
round-trips through the parser; malformed payloads degrade to None."""

from __future__ import annotations

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

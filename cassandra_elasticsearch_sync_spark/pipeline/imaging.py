"""Pure-python image header codec for the K6 multimodal decode path.

No PIL/ffmpeg exists in this container, but image *header* parsing
needs only the public file-format specs (PNG RFC 2083 / ISO 15948,
JPEG ITU-T T.81, GIF89a): a few fixed offsets and marker scans over
bytes. This module implements
  - a parser: bytes -> (format, width, height) for PNG / JPEG / GIF,
    None on anything unparseable (truncated, wrong magic), and
  - a synthesizer: deterministic, VALID minimal files with planted
    dimensions (PNG with correct CRCs, JPEG with JFIF+COM+SOF0
    segments so the parser must really scan markers, GIF with a
    logical screen descriptor).

The synthesizer makes the decode operator honestly verifiable without
shipping binary fixtures: payloads are generated from doc_id, the
parser recovers the dimensions from the BYTES, and the oracle recomputes
the planted dimensions relationally - if the parser cheated (e.g. read
doc_id instead of the bytes), the synthesis round-trip test and the
planted-vs-parsed hash match would both catch it.
"""

from __future__ import annotations

import struct
import zlib

# -- synthesis ---------------------------------------------------------------


def png_bytes(width: int, height: int) -> bytes:
    """Minimal valid PNG: signature, IHDR (with real CRC), one IDAT
    holding a single zlib-compressed filter-0 scanline block, IEND."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    # One row of filter byte + width grayscale pixels, repeated height
    # times would be huge; a single compressed empty-ish payload keeps
    # the file tiny (the parser reads IHDR only - like every header
    # sniffer, including PIL's lazy open()).
    idat = zlib.compress(b"\x00" * min(width + 1, 64))
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def jpeg_bytes(width: int, height: int, comment: bytes = b"") -> bytes:
    """Minimal valid JPEG prefix: SOI, JFIF APP0, COM (variable length,
    forces real marker scanning), DQT stub, SOF0 with the dimensions,
    EOI. Decoders of full image data would want more; header parsers
    (and this module's) stop at SOF0."""
    app0_body = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", len(app0_body) + 2) + app0_body
    com = b"\xff\xfe" + struct.pack(">H", len(comment) + 2) + comment
    dqt_body = b"\x00" + bytes(64)
    dqt = b"\xff\xdb" + struct.pack(">H", len(dqt_body) + 2) + dqt_body
    sof_body = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", len(sof_body) + 2) + sof_body
    return b"\xff\xd8" + app0 + com + dqt + sof0 + b"\xff\xd9"


def gif_bytes(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\x00\x00\x00"  # no GCT, bg 0, aspect 0
        + b"\x3b"          # trailer
    )


def synth_image(doc_id: int) -> bytes:
    """Deterministic format + dimensions from doc_id (the planted
    ground truth the k6 oracle recomputes relationally)."""
    width = doc_id % 640 + 1
    height = (doc_id * 7) % 480 + 16
    fmt = doc_id % 3
    if fmt == 0:
        return png_bytes(width, height)
    if fmt == 1:
        # doc_id-dependent comment length exercises the marker scan
        return jpeg_bytes(width, height, b"c" * (doc_id % 19))
    return gif_bytes(width, height)


# -- parsing -----------------------------------------------------------------

_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def parse_image(raw: bytes | None) -> tuple[str, int, int] | None:
    """Sniff (format, width, height) from image bytes; None if the
    payload is not a parseable PNG/JPEG/GIF header."""
    if not raw or len(raw) < 10:
        return None
    try:
        if raw[:8] == b"\x89PNG\r\n\x1a\n":
            if len(raw) < 24 or raw[12:16] != b"IHDR":
                return None
            w, h = struct.unpack(">II", raw[16:24])
            return ("png", w, h)
        if raw[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", raw[6:10])
            return ("gif", w, h)
        if raw[:2] == b"\xff\xd8":
            i = 2
            n = len(raw)
            while i + 4 <= n:
                if raw[i] != 0xFF:
                    return None
                marker = raw[i + 1]
                if marker == 0xD9:  # EOI before any SOF
                    return None
                if marker in _SOF_MARKERS:
                    if i + 9 > n:
                        return None
                    h, w = struct.unpack(">HH", raw[i + 5: i + 9])
                    return ("jpeg", w, h)
                seg_len = struct.unpack(">H", raw[i + 2: i + 4])[0]
                i += 2 + seg_len
            return None
    except struct.error:
        return None
    return None


# -- WAV (RIFF) audio headers ------------------------------------------------


def wav_bytes(sample_rate: int, channels: int, bits: int,
              n_frames: int, seed: int = 0) -> bytes:
    """Minimal valid PCM WAV: RIFF header, fmt chunk, data chunk with
    deterministic 16-bit samples derived from ``seed`` - a real file
    any WAV reader accepts (public spec: RIFF/WAVE, fmt audio_format=1
    linear PCM)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    n_samples = n_frames * channels
    samples = b"".join(
        struct.pack("<h", ((seed * 31 + i * 97) % 65536) - 32768)
        for i in range(n_samples)
    )
    data_size = len(samples)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_size)
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_size) + samples
    )


def parse_wav(raw: bytes | None) -> tuple[int, int, int, int] | None:
    """bytes -> (sample_rate, channels, bits, n_frames) by actually
    walking the RIFF chunk list; None for anything that is not a valid
    PCM WAV (wrong magic, truncated, missing fmt/data)."""
    if raw is None or len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos, fmt_info, data_size = 12, None, None
    while pos + 8 <= len(raw):
        tag = raw[pos:pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4:pos + 8])
        body = raw[pos + 8:pos + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            afmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if afmt != 1:
                return None  # only linear PCM in the minimal subset
            fmt_info = (rate, channels, bits)
        elif tag == b"data":
            data_size = len(body)
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if fmt_info is None or data_size is None:
        return None
    rate, channels, bits = fmt_info
    frame_size = channels * bits // 8
    if frame_size == 0:
        return None
    return rate, channels, bits, data_size // frame_size


def synth_wav(doc_id: int) -> bytes:
    """Deterministic planted parameters (mirrors synth_image): the
    oracle recomputes these relationally, so a decode hash-match
    proves the parser read the bytes."""
    rate = (8000, 16000, 44100)[doc_id % 3]
    channels = doc_id % 2 + 1
    n_frames = doc_id % 100 + 10
    return wav_bytes(rate, channels, 16, n_frames, seed=doc_id)


# -- FULL pixel-level PNG codec (pure python + stdlib zlib) ------------------
#
# Round 4 closes NEXT_STEPS "limitation 3" for PNG: not just header
# sniffing but a real pixel decode - chunk walk, IDAT concatenation,
# zlib inflate, and scanline UNFILTERING for all five PNG filter types
# (None/Sub/Up/Average/Paeth, the actual content of the PNG spec's
# compression model). No PIL: the only dependency is stdlib zlib,
# which IS the codec a PNG needs. Supports 8-bit truecolor (type 2)
# and greyscale (type 0), non-interlaced - the overwhelmingly common
# storage shape. JPEG pixel decode (DCT) stays out of scope and
# documented.


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_rgb_bytes(width: int, height: int, seed: int) -> bytes:
    """A REAL 8-bit RGB PNG with planted pixels: pixel (x, y) =
    ((seed+x)%256, (seed+y)%256, (x*y)%256). Each row is encoded with
    filter type row%5, applying the spec's actual filter math - so a
    decoder must implement ALL FIVE unfilters correctly to recover the
    planted values (a filter bug shifts every channel mean)."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    bpp = 3
    out = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(((seed + x) % 256, (seed + y) % 256, (x * y) % 256))
        f = y % 5
        out.append(f)
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = row[i]
            elif f == 1:
                v = (row[i] - a) % 256
            elif f == 2:
                v = (row[i] - b) % 256
            elif f == 3:
                v = (row[i] - (a + b) // 2) % 256
            else:
                v = (row[i] - _paeth(a, b, c)) % 256
            out.append(v)
        prev = bytes(row)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def png_palette_bytes(width: int, height: int, seed: int) -> bytes:
    """A REAL 8-bit palette (color type 3) PNG with planted indexes:
    pixel (x, y) holds palette index seed + x + 2*y (no mod wrap for
    seed <= 210 at 16x16), palette entry p = (p, 255-p, p//2). Rows
    cycle filters row%5 over the 1-byte-per-pixel index stream, so a
    decoder must unfilter AND palette-map correctly to recover the
    planted channel means."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    palette = bytearray()
    for p in range(256):
        palette += bytes((p, 255 - p, p // 2))
    out = bytearray()
    prev = bytes(width)
    for y in range(height):
        row = bytearray((seed + x + 2 * y) % 256 for x in range(width))
        f = y % 5
        out.append(f)
        for i in range(width):
            a = row[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if f == 0:
                v = row[i]
            elif f == 1:
                v = (row[i] - a) % 256
            elif f == 2:
                v = (row[i] - b) % 256
            elif f == 3:
                v = (row[i] - (a + b) // 2) % 256
            else:
                v = (row[i] - _paeth(a, b, c)) % 256
            out.append(v)
        prev = bytes(row)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", bytes(palette))
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def decode_png_pixels(raw: bytes | None):
    """Full PNG pixel decode: returns (width, height, channels,
    flat pixel bytes) or None for anything that is not a supported
    PNG (8-bit grey/RGB/palette, non-interlaced). Walks chunks with
    length fields (IDAT may be split - they concatenate), inflates,
    unfilters every scanline per its filter byte, and maps palette
    indexes through PLTE (color type 3 returns 3-channel RGB)."""
    if not raw or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        i, n = 8, len(raw)
        width = height = None
        channels = None
        color = None
        plte = None
        idat = bytearray()
        while i + 8 <= n:
            (length,), tag = struct.unpack(">I", raw[i:i + 4]), raw[i + 4:i + 8]
            body = raw[i + 8:i + 8 + length]
            if tag == b"IHDR":
                width, height, bit_depth, color, _, _, interlace = \
                    struct.unpack(">IIBBBBB", body)
                if interlace == 1 and color in (0, 2):
                    return decode_png_interlaced(raw)   # Adam7 path
                if bit_depth != 8 or color not in (0, 2, 3) or interlace != 0:
                    return None
                channels = 1 if color in (0, 3) else 3
            elif tag == b"PLTE":
                if length % 3 != 0 or length == 0:
                    return None
                plte = bytes(body)
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            i += 12 + length  # len + tag + body + crc
        if width is None or not idat:
            return None
        if color == 3 and plte is None:
            return None                      # palette image needs PLTE
        data = zlib.decompress(bytes(idat))
        bpp = channels
        stride = width * bpp
        if len(data) != height * (stride + 1):
            return None
        pixels = bytearray(height * stride)
        prev = bytes(stride)
        pos = 0
        for y in range(height):
            f = data[pos]
            pos += 1
            row = bytearray(data[pos:pos + stride])
            pos += stride
            if f == 1:
                for k in range(bpp, stride):
                    row[k] = (row[k] + row[k - bpp]) % 256
            elif f == 2:
                for k in range(stride):
                    row[k] = (row[k] + prev[k]) % 256
            elif f == 3:
                for k in range(stride):
                    a = row[k - bpp] if k >= bpp else 0
                    row[k] = (row[k] + (a + prev[k]) // 2) % 256
            elif f == 4:
                for k in range(stride):
                    a = row[k - bpp] if k >= bpp else 0
                    c = prev[k - bpp] if k >= bpp else 0
                    row[k] = (row[k] + _paeth(a, prev[k], c)) % 256
            elif f != 0:
                return None
            pixels[y * stride:(y + 1) * stride] = row
            prev = bytes(row)
        if color == 3:
            # palette map AFTER unfiltering (filters run over the
            # index stream, per spec); out-of-range index = corrupt
            n_entries = len(plte) // 3
            rgb = bytearray(width * height * 3)
            for k, idx in enumerate(pixels):
                if idx >= n_entries:
                    return None
                rgb[3 * k:3 * k + 3] = plte[3 * idx:3 * idx + 3]
            return (width, height, 3, bytes(rgb))
        return (width, height, channels, bytes(pixels))
    except (struct.error, zlib.error, IndexError):
        return None


# ---------------------------------------------------------------------------
# GIF: real LZW codec (GIF89a, variable-width codes, spec appendix F)
# ---------------------------------------------------------------------------

def _gif_lzw_encode(indexes: bytes, min_code_size: int = 8) -> bytes:
    """GIF-flavored LZW: variable code width starting at
    min_code_size+1, CLEAR/EOI codes, table reset at 4096 - the real
    compression GIF files carry (not the emit-clear-every-symbol
    'uncompressed GIF' shortcut, so a decoder must reconstruct the
    string table, including growing code widths)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in indexes:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_lzw_decode(data: bytes, min_code_size: int) -> bytes | None:
    """Full GIF LZW decompression: string-table reconstruction with
    the KwKwK first-is-new-code case, CLEAR resets, growing code
    widths. Returns the decoded index stream or None on a corrupt
    stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = n_bits = pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    try:
        while True:
            while n_bits < width:
                if pos >= len(data):
                    return bytes(out)  # missing EOI: emit what we have
                acc |= data[pos] << n_bits
                pos += 1
                n_bits += 8
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_bits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                return None
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    except (IndexError, ValueError):
        return None


def gif_indexed_bytes(width: int, height: int, seed: int,
                      interlaced: bool = False) -> bytes:
    """A REAL GIF89a 256-color image with planted pixel indexes:
    index(x, y) = seed + x + y (seed <= 219, so no mod wrap on a
    16x16 grid). Palette entry i = (i, 255 - i, i & ~1), making the
    channel means analytic in seed: mean_r = seed + 15, mean_g =
    240 - seed, mean_b = seed + 14.5. The image data is genuinely
    LZW-compressed, so recovering the means requires a working
    decompressor, not a header read. ``interlaced`` writes the rows
    in GIF's 4-pass order and sets the descriptor's interlace flag."""
    palette = bytearray()
    for i in range(256):
        palette += bytes((i, 255 - i, i & ~1))
    if interlaced:
        row_order = [y for (y0, dy) in ((0, 8), (4, 8), (2, 4), (1, 2))
                     for y in range(y0, height, dy)]
    else:
        row_order = list(range(height))
    idx = bytes((seed + x + y) for y in row_order for x in range(width))
    lzw = _gif_lzw_encode(idx)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i:i + 255]
        blocks.append(len(part))
        blocks += part
    blocks.append(0)
    iflags = 0x40 if interlaced else 0
    return (b"GIF89a"
            + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256
            + palette
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, iflags)
            + bytes([8])      # LZW minimum code size
            + blocks)


def decode_gif_pixels(raw: bytes | None):
    """Full GIF pixel decode for the single-frame 89a profile this
    engine synthesizes: header + logical screen descriptor + global
    color table + one image descriptor, LZW-decompressed to palette
    indexes, mapped through the color table; 4-pass interlaced frames
    are de-interlaced after decompression. Returns (width, height,
    flat RGB bytes) or None. Extension blocks are skipped per spec;
    local-color-table-only frames without any palette are rejected,
    not guessed."""
    if not raw or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w_screen, h_screen, flags, _bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
        i = 13
        palette = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            palette = raw[i:i + 3 * n]
            i += 3 * n
        while i < len(raw):
            b = raw[i]
            if b == 0x21:  # extension: label + sub-blocks
                i += 2
                while raw[i]:
                    i += raw[i] + 1
                i += 1
            elif b == 0x2C:  # image descriptor
                _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", raw, i + 1)
                i += 10
                if iflags & 0x80:
                    n = 2 << (iflags & 0x07)
                    palette = raw[i:i + 3 * n]
                    i += 3 * n
                if palette is None:
                    return None
                min_code = raw[i]
                i += 1
                lzw = bytearray()
                while raw[i]:
                    size = raw[i]
                    lzw += raw[i + 1:i + 1 + size]
                    i += size + 1
                i += 1
                idx = gif_lzw_decode(bytes(lzw), min_code)
                if idx is None or len(idx) < w * h:
                    return None
                if iflags & 0x40:
                    # GIF 4-pass row interlace: the stream carries rows
                    # in pass order (0 mod 8, 4 mod 8, 2 mod 4, odd);
                    # de-interlace before palette mapping.
                    ordered = bytearray(w * h)
                    src = 0
                    for (y0, dy) in ((0, 8), (4, 8), (2, 4), (1, 2)):
                        for y in range(y0, h, dy):
                            ordered[y * w:(y + 1) * w] = idx[src:src + w]
                            src += w
                    idx = bytes(ordered)
                px = bytearray()
                for k in range(w * h):
                    j = idx[k] * 3
                    px += palette[j:j + 3]
                return (w, h, bytes(px))
            elif b == 0x3B:  # trailer
                return None
            else:
                return None
    except (struct.error, IndexError):
        return None
    return None


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF: box-structure walk (the video-container metadata tier)
# ---------------------------------------------------------------------------

def mp4_bytes(timescale: int, duration_s: int, width: int, height: int) -> bytes:
    """A minimal but CONFORMING ISO-BMFF file: ftyp + moov(mvhd +
    trak(tkhd)), all boxes with correct sizes, mvhd/tkhd as version-0
    full boxes per ISO/IEC 14496-12 (the public spec). Duration is
    planted in movie-timescale units; track width/height are 16.16
    fixed point exactly as the spec stores them."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    mvhd = box(b"mvhd", struct.pack(
        ">BxxxIIII", 0, 0, 0, timescale, timescale * duration_s)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2))
    tkhd = box(b"tkhd", struct.pack(
        ">BxxxIIIxxxxI", 0, 0, 0, 1, timescale * duration_s)
        + b"\x00" * 8
        + struct.pack(">HHHxx", 0, 0, 0)
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    trak = box(b"trak", tkhd)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    return ftyp + moov


def parse_mp4(raw: bytes | None):
    """ISO-BMFF box walk: iterate top-level boxes (32-bit and 64-bit
    largesize forms), recurse into containers (moov/trak/mdia), and
    read mvhd (timescale, duration; version 0 or 1) and the first
    tkhd (16.16 fixed-point width/height). Returns (timescale,
    duration_units, width, height) or None - a malformed size chain
    or missing moov rejects the payload."""
    if not raw or len(raw) < 16:
        return None
    out = {"timescale": None, "duration": None, "w": None, "h": None}

    def walk(lo: int, hi: int, depth: int) -> bool:
        i = lo
        while i + 8 <= hi:
            size = struct.unpack_from(">I", raw, i)[0]
            typ = raw[i + 4:i + 8]
            body = i + 8
            if size == 1:  # 64-bit largesize
                if body + 8 > hi:
                    return False
                size = struct.unpack_from(">Q", raw, body)[0]
                body += 8
            elif size == 0:  # box extends to EOF
                size = hi - i
            if size < 8 or i + size > hi:
                return False
            if typ in (b"moov", b"trak", b"mdia") and depth < 8:
                if not walk(body, i + size, depth + 1):
                    return False
            elif typ == b"mvhd":
                ver = raw[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", raw, body + 20)
                else:
                    _, _, ts, dur = struct.unpack_from(">IIII", raw, body + 4)
                out["timescale"], out["duration"] = ts, dur
            elif typ == b"tkhd" and out["w"] is None:
                ver = raw[body]
                # fixed part (vf+times+id+reserved+duration) is 24
                # bytes in v0, 36 in v1; then reserved 8, layer/group/
                # volume/reserved 8, matrix 36, then 16.16 width/height
                off = body + (24 if ver == 0 else 36) + 8 + 8 + 36
                w, h = struct.unpack_from(">II", raw, off)
                out["w"], out["h"] = w >> 16, h >> 16
            i += size
        return i == hi

    if not walk(0, len(raw), 0):
        return None
    if out["timescale"] is None:
        return None
    return (out["timescale"], out["duration"], out["w"], out["h"])


# ---------------------------------------------------------------------------
# EXIF: TIFF IFD walk inside a JPEG APP1 segment (both byte orders)
# ---------------------------------------------------------------------------

def exif_jpeg_bytes(orientation: int, width: int, make: str,
                    big_endian: bool) -> bytes:
    """A JPEG whose APP1 segment carries a conforming EXIF/TIFF block:
    byte-order mark (II or MM - the synthesizer alternates so a
    decoder must implement BOTH), magic 42, IFD0 with ImageWidth
    (LONG, inline), Make (ASCII via data offset), Orientation (SHORT,
    inline - stored in the endianness-sensitive first two value
    bytes). Per TIFF 6.0 / EXIF 2.3 (public specs)."""
    e = ">" if big_endian else "<"
    make_b = make.encode() + b"\x00"
    # IFD0: 3 entries; string data lands right after the IFD block
    str_off = 8 + 2 + 3 * 12 + 4
    entries = b""
    entries += struct.pack(e + "HHI", 0x0100, 4, 1) + struct.pack(e + "I", width)
    entries += struct.pack(e + "HHI", 0x010F, 2, len(make_b)) \
        + struct.pack(e + "I", str_off)
    # SHORT value occupies the FIRST two bytes of the 4-byte field in
    # the file's byte order, padded with zeros
    entries += struct.pack(e + "HHI", 0x0112, 3, 1) \
        + struct.pack(e + "H", orientation) + b"\x00\x00"
    tiff = ((b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8)
            + struct.pack(e + "H", 3) + entries + struct.pack(e + "I", 0)
            + make_b)
    app1_body = b"Exif\x00\x00" + tiff
    return (b"\xFF\xD8"
            + b"\xFF\xE1" + struct.pack(">H", 2 + len(app1_body)) + app1_body
            + b"\xFF\xD9")


def parse_exif(raw: bytes | None):
    """EXIF read: JPEG marker scan to APP1, TIFF byte-order dispatch
    (II/MM), IFD0 entry walk, inline vs offset value resolution.
    Returns (orientation, width, make, byte_order) or None."""
    if not raw or raw[:2] != b"\xFF\xD8":
        return None
    try:
        i, n = 2, len(raw)
        tiff = None
        while i + 4 <= n and raw[i] == 0xFF:
            marker, ln = raw[i + 1], struct.unpack_from(">H", raw, i + 2)[0]
            if marker == 0xE1 and raw[i + 4:i + 10] == b"Exif\x00\x00":
                tiff = raw[i + 10:i + 2 + ln]
                break
            if marker == 0xD9 or marker == 0xDA:
                break
            i += 2 + ln
        if tiff is None or len(tiff) < 16:
            return None
        if tiff[:2] == b"II":
            e = "<"
        elif tiff[:2] == b"MM":
            e = ">"
        else:
            return None
        magic, ifd_off = struct.unpack_from(e + "HI", tiff, 2)
        if magic != 42:
            return None
        count = struct.unpack_from(e + "H", tiff, ifd_off)[0]
        out = {"orientation": None, "width": None, "make": None}
        for k in range(count):
            off = ifd_off + 2 + 12 * k
            tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, off)
            if tag == 0x0112 and typ == 3:
                out["orientation"] = struct.unpack_from(e + "H", tiff,
                                                        off + 8)[0]
            elif tag == 0x0100:
                if typ == 4:
                    out["width"] = struct.unpack_from(e + "I", tiff, off + 8)[0]
                elif typ == 3:
                    out["width"] = struct.unpack_from(e + "H", tiff, off + 8)[0]
            elif tag == 0x010F and typ == 2:
                if cnt <= 4:
                    data = tiff[off + 8:off + 8 + cnt]
                else:
                    p = struct.unpack_from(e + "I", tiff, off + 8)[0]
                    data = tiff[p:p + cnt]
                out["make"] = data.rstrip(b"\x00").decode("ascii", "replace")
        if out["orientation"] is None:
            return None
        return (out["orientation"], out["width"], out["make"],
                "MM" if e == ">" else "II")
    except (struct.error, IndexError, UnicodeDecodeError):
        return None


# Adam7 interlace pass layout: (x0, y0, dx, dy) per pass (ISO 15948
# figure: every pixel covered exactly once across the seven passes).
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def png_interlaced_bytes(width: int, height: int, seed: int) -> bytes:
    """A REAL Adam7-interlaced 8-bit RGB PNG with the same planted
    pixels as png_rgb_bytes (pixel (x,y) = ((seed+x)%256, (seed+y)%256,
    (x*y)%256)): seven independently-filtered sub-images (filter type
    rotates row%5 within each pass), concatenated into one IDAT
    stream per spec. A decoder must walk all seven pass geometries
    AND unfilter each pass against its own previous row to recover
    the planted values."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    bpp = 3
    out = bytearray()
    for (x0, y0, dx, dy) in _ADAM7:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        prev = bytes(wp * bpp)
        for ry in range(hp):
            y = y0 + ry * dy
            row = bytearray()
            for rx in range(wp):
                x = x0 + rx * dx
                row += bytes(((seed + x) % 256, (seed + y) % 256,
                              (x * y) % 256))
            f = ry % 5
            out.append(f)
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 0:
                    v = row[i]
                elif f == 1:
                    v = (row[i] - a) % 256
                elif f == 2:
                    v = (row[i] - b) % 256
                elif f == 3:
                    v = (row[i] - (a + b) // 2) % 256
                else:
                    v = (row[i] - _paeth(a, b, c)) % 256
                out.append(v)
            prev = bytes(row)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def _unfilter_rows(data: bytes, pos: int, n_rows: int, stride: int,
                   bpp: int):
    """Unfilter n_rows scanlines of one (sub-)image; returns
    (rows-as-bytes, new position)."""
    rows = []
    prev = bytes(stride)
    for _ in range(n_rows):
        f = data[pos]
        pos += 1
        row = bytearray(data[pos:pos + stride])
        pos += stride
        if f == 1:
            for k in range(bpp, stride):
                row[k] = (row[k] + row[k - bpp]) % 256
        elif f == 2:
            for k in range(stride):
                row[k] = (row[k] + prev[k]) % 256
        elif f == 3:
            for k in range(stride):
                a = row[k - bpp] if k >= bpp else 0
                row[k] = (row[k] + (a + prev[k]) // 2) % 256
        elif f == 4:
            for k in range(stride):
                a = row[k - bpp] if k >= bpp else 0
                c = prev[k - bpp] if k >= bpp else 0
                row[k] = (row[k] + _paeth(a, prev[k], c)) % 256
        elif f != 0:
            raise ValueError("bad filter type")
        rows.append(bytes(row))
        prev = bytes(row)
    return rows, pos


def decode_png_interlaced(raw: bytes | None):
    """Adam7-interlaced PNG pixel decode (8-bit grey/RGB): walks the
    seven pass geometries, unfilters each pass independently, and
    de-interlaces into the full image. Returns (width, height,
    channels, flat pixels) or None."""
    if not raw or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        i, n = 8, len(raw)
        width = height = channels = None
        idat = bytearray()
        while i + 8 <= n:
            (length,), tag = struct.unpack(">I", raw[i:i + 4]), raw[i + 4:i + 8]
            body = raw[i + 8:i + 8 + length]
            if tag == b"IHDR":
                width, height, bit_depth, color, _, _, interlace = \
                    struct.unpack(">IIBBBBB", body)
                if bit_depth != 8 or color not in (0, 2) or interlace != 1:
                    return None
                channels = 1 if color == 0 else 3
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            i += 12 + length
        if width is None or not idat:
            return None
        data = zlib.decompress(bytes(idat))
        bpp = channels
        pixels = bytearray(width * height * bpp)
        pos = 0
        for (x0, y0, dx, dy) in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            rows, pos = _unfilter_rows(data, pos, hp, wp * bpp, bpp)
            for ry, row in enumerate(rows):
                y = y0 + ry * dy
                for rx in range(wp):
                    x = x0 + rx * dx
                    dst = (y * width + x) * bpp
                    pixels[dst:dst + bpp] = row[rx * bpp:(rx + 1) * bpp]
        if pos != len(data):
            return None                      # trailing garbage = corrupt
        return (width, height, channels, bytes(pixels))
    except (struct.error, zlib.error, IndexError):
        return None


# -- BMP codec (BITMAPINFOHEADER: BI_RGB 24-bit and BI_RLE8 8-bit) ----------
#
# Public spec (Windows DIB format): 14-byte BITMAPFILEHEADER, 40-byte
# BITMAPINFOHEADER, optional palette, pixel rows stored BOTTOM-UP with
# each row padded to a 4-byte boundary. BI_RLE8 compresses 8-bit
# palette indexes as (count, value) runs plus escape sequences:
# 00 00 = end of line, 00 01 = end of bitmap, 00 n >= 3 = absolute
# mode (n literal indexes, word-aligned).


def bmp_rgb_bytes(width: int, height: int, seed: int) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP with pixels planted from
    ``seed``: r=(seed+x), g=(seed+y), b=((x+y)%16)*15 - means are
    exact .5 fractions the oracle recomputes analytically."""
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            row += bytes(((( x + y) % 16) * 15, (seed + y) % 256,
                          (seed + x) % 256))  # B, G, R on disk
        while len(row) % 4:
            row.append(0)
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
    return header + info + pixel_data


def bmp_rle8_bytes(width: int, height: int, seed: int) -> bytes:
    """8-bit BI_RLE8 BMP over a 256-entry grayscale palette, planted
    index = (seed + (x+y)%16). Each row is encoded half in ABSOLUTE
    mode (00 n + literals, word-aligned) and half as unit RUNS, so a
    decoder must handle both modes plus both escapes to reconstruct
    the image."""
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))  # BGRA entries
    out = bytearray()
    half = width // 2
    for y in range(height - 1, -1, -1):
        idx = [(seed + (x + y) % 16) % 256 for x in range(width)]
        # absolute mode for the first half of the row
        if half >= 3:
            out += bytes((0, half)) + bytes(idx[:half])
            if half % 2:
                out.append(0)  # word alignment
            rest = idx[half:]
        else:
            rest = idx
        for v in rest:  # unit runs for the remainder
            out += bytes((1, v))
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    data = bytes(out)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 1,
                       len(data), 2835, 2835, 256, 0)
    off = 14 + 40 + len(pal)
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return header + info + pal + data


def decode_bmp_pixels(raw: bytes | None):
    """bytes -> (width, height, [(r, g, b), ...] in top-down raster
    order), or None. Handles BI_RGB 24-bit and BI_RLE8 8-bit with
    both RLE modes and both escapes; rejects everything else rather
    than mis-decoding."""
    if raw is None or len(raw) < 54 or raw[:2] != b"BM":
        return None
    (off,) = struct.unpack("<I", raw[10:14])
    hsize, width, height, _planes, bpp, comp = struct.unpack(
        "<IiiHHI", raw[14:34])
    if hsize != 40 or height <= 0 or width <= 0:
        return None
    px = [[None] * width for _ in range(height)]
    if comp == 0 and bpp == 24:
        stride = (width * 3 + 3) & ~3
        for ry in range(height):
            base = off + ry * stride
            y = height - 1 - ry  # stored bottom-up
            for x in range(width):
                b, g, r = raw[base + 3 * x: base + 3 * x + 3]
                px[y][x] = (r, g, b)
    elif comp == 1 and bpp == 8:
        pal_off = 14 + hsize
        pal = [tuple(raw[pal_off + 4 * i: pal_off + 4 * i + 3][::-1])
               for i in range(256)]
        pos, x, ry = off, 0, 0
        while pos + 1 < len(raw):
            n, v = raw[pos], raw[pos + 1]
            pos += 2
            if n == 0:
                if v == 0:  # end of line
                    x, ry = 0, ry + 1
                elif v == 1:  # end of bitmap
                    break
                elif v == 2:  # delta jump (not produced; honor anyway)
                    x += raw[pos]
                    ry += raw[pos + 1]
                    pos += 2
                else:  # absolute mode: v literal indexes, word-aligned
                    for i in range(v):
                        px[height - 1 - ry][x] = pal[raw[pos + i]]
                        x += 1
                    pos += v + (v % 2)
            else:  # run of n copies of index v
                for _ in range(n):
                    px[height - 1 - ry][x] = pal[v]
                    x += 1
    else:
        return None
    flat = [p for row in px for p in row]
    if any(p is None for p in flat):
        return None
    return width, height, flat


# -- G.711 mu-law / A-law codec (WAV audio_format 7 / 6) --------------------
#
# The ITU-T G.711 companded telephony codecs: 8-bit logarithmic code
# words expanding to 13/14-bit linear PCM. The expand formulas below
# are the public-spec segment/mantissa arithmetic (equivalent to the
# classic ulaw2linear/alaw2linear reference code), written as pure
# integer expressions so the oracle can recompute them in SQL.


def ulaw_to_linear(b: int) -> int:
    u = (~b) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def alaw_to_linear(b: int) -> int:
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def g711_wav_bytes(audio_format: int, sample_rate: int,
                   codes: bytes) -> bytes:
    """Valid single-channel 8-bit G.711 WAV (audio_format 7 = mu-law,
    6 = A-law) wrapping the given code words."""
    fmt = struct.pack("<HHIIHH", audio_format, 1, sample_rate,
                      sample_rate, 1, 8)
    data_size = len(codes)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_size)
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_size) + codes
        + (b"\x00" if data_size % 2 else b"")
    )


def decode_g711_wav(raw: bytes | None):
    """bytes -> (codec_name, [pcm ints]) by walking the RIFF chunks,
    dispatching on audio_format 7/6, and expanding every code word;
    None for non-G.711 or malformed payloads."""
    if raw is None or len(raw) < 12 or raw[:4] != b"RIFF" \
            or raw[8:12] != b"WAVE":
        return None
    pos, afmt, data = 12, None, None
    while pos + 8 <= len(raw):
        tag = raw[pos:pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4:pos + 8])
        body = raw[pos + 8:pos + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            afmt = struct.unpack("<H", body[:2])[0]
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if data is None or afmt not in (6, 7):
        return None
    expand = ulaw_to_linear if afmt == 7 else alaw_to_linear
    return ("ulaw" if afmt == 7 else "alaw"), [expand(b) for b in data]


# -- Baseline TIFF codec (gray 8-bit, uncompressed strips, II and MM) -------


def tiff_gray_bytes(width: int, height: int, seed: int,
                    big_endian: bool, rows_per_strip: int = 4) -> bytes:
    """Minimal spec-conforming baseline TIFF: header (II*\\0 / MM\\0*),
    one IFD with the 8 baseline gray tags, pixel data split into
    multiple strips (exercising StripOffsets/StripByteCounts arrays),
    planted gray = seed + (x+y)%16."""
    bo = ">" if big_endian else "<"
    pixels = bytes(
        ((seed + (x + y) % 16) % 256)
        for y in range(height) for x in range(width))
    strips = [pixels[y * width:(y + rows_per_strip) * width]
              for y in range(0, height, rows_per_strip)]
    n = len(strips)
    # layout: 8 header + pixel strips + offset/count arrays + IFD
    strip_off0 = 8
    offsets = []
    p = strip_off0
    for s in strips:
        offsets.append(p)
        p += len(s)
    off_array_pos = p
    p += 4 * n
    cnt_array_pos = p
    p += 4 * n
    ifd_pos = p
    header = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        bo + "I", ifd_pos)

    def entry(tag, typ, count, value):
        return struct.pack(bo + "HHI", tag, typ, count) + value

    def long_val(v):
        return struct.pack(bo + "I", v)

    def short_val(v):
        # SHORT values sit LEFT-JUSTIFIED in the 4-byte slot per spec
        return struct.pack(bo + "H", v) + b"\x00\x00"

    entries = [
        entry(256, 4, 1, long_val(width)),          # ImageWidth
        entry(257, 4, 1, long_val(height)),         # ImageLength
        entry(258, 3, 1, short_val(8)),             # BitsPerSample
        entry(259, 3, 1, short_val(1)),             # Compression: none
        entry(262, 3, 1, short_val(1)),             # BlackIsZero
        entry(273, 4, n, long_val(off_array_pos)),  # StripOffsets
        entry(278, 4, 1, long_val(rows_per_strip)),  # RowsPerStrip
        entry(279, 4, n, long_val(cnt_array_pos)),  # StripByteCounts
    ]
    ifd = struct.pack(bo + "H", len(entries)) + b"".join(entries) \
        + struct.pack(bo + "I", 0)
    body = (b"".join(strips)
            + b"".join(struct.pack(bo + "I", o) for o in offsets)
            + b"".join(struct.pack(bo + "I", len(s)) for s in strips))
    return header + body + ifd


def decode_tiff_gray(raw: bytes | None):
    """bytes -> (byte_order, width, height, n_strips, [gray...]) by
    walking the IFD in EITHER byte order, resolving the strip
    offset/count arrays, and reassembling the raster; None (never a
    mis-decode) for compressed/non-gray/malformed files."""
    if raw is None or len(raw) < 8:
        return None
    if raw[:4] == b"II*\x00":
        bo = "<"
    elif raw[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    (ifd_pos,) = struct.unpack(bo + "I", raw[4:8])
    if ifd_pos + 2 > len(raw):
        return None
    (n_ent,) = struct.unpack(bo + "H", raw[ifd_pos:ifd_pos + 2])
    tags = {}
    for i in range(n_ent):
        e = ifd_pos + 2 + 12 * i
        tag, typ, count = struct.unpack(bo + "HHI", raw[e:e + 8])
        slot = raw[e + 8:e + 12]
        if typ == 3 and count == 1:
            (v,) = struct.unpack(bo + "H", slot[:2])
            tags[tag] = (typ, count, v)
        else:
            (v,) = struct.unpack(bo + "I", slot)
            tags[tag] = (typ, count, v)
    needed = (256, 257, 258, 259, 273, 279)
    if any(t not in tags for t in needed):
        return None
    if tags[258][2] != 8 or tags[259][2] != 1:
        return None  # only 8-bit uncompressed gray
    width, height = tags[256][2], tags[257][2]

    def array_of(tag):
        typ, count, v = tags[tag]
        if count == 1:
            return [v]
        return list(struct.unpack(bo + "I" * count,
                                  raw[v:v + 4 * count]))

    offsets, counts = array_of(273), array_of(279)
    if len(offsets) != len(counts):
        return None
    data = b"".join(raw[o:o + c] for o, c in zip(offsets, counts))
    if len(data) != width * height:
        return None
    return ("MM" if bo == ">" else "II", width, height,
            len(offsets), list(data))


# -- IMA ADPCM audio codec (WAV format tag 0x11, mono) -----------------------

# Public-spec tables (IMA ADPCM reference algorithm / RFC 3551 DVI4).
IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def ima_adpcm_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (predictor, step_index) x 4-bit code
    -> next (predictor, step_index). Pure integer arithmetic."""
    step = IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX_TABLE[nib & 7]))
    return pred, idx


def ima_adpcm_wav_bytes(sample_rate: int, init_pred: int, init_index: int,
                        nibbles: bytes) -> bytes:
    """Valid mono IMA ADPCM WAV (format tag 0x11), one block: 4-byte
    block header (initial predictor int16, step index uint8, reserved)
    followed by the 4-bit codes packed two per byte, LOW nibble first.
    The header predictor is itself the first output sample, so the
    block decodes to len(nibbles)+1 samples (carried in the fmt
    extension and the fact chunk, as the spec requires)."""
    n = len(nibbles)
    packed = bytearray()
    for i in range(0, n, 2):
        lo = nibbles[i] & 0xF
        hi = (nibbles[i + 1] & 0xF) if i + 1 < n else 0
        packed.append(lo | (hi << 4))
    block_align = 4 + len(packed)
    samples_per_block = n + 1
    byte_rate = (sample_rate * block_align + samples_per_block - 1) \
        // samples_per_block
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate, byte_rate,
                      block_align, 4, 2, samples_per_block)
    data = struct.pack("<hBB", init_pred, init_index, 0) + bytes(packed)
    fact = struct.pack("<I", samples_per_block)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )


def decode_ima_adpcm_wav(raw: bytes | None):
    """bytes -> [pcm ints] by walking the RIFF chunks, parsing the
    format-0x11 fmt (+extension) and decoding every block: header
    predictor emitted as the first sample, then one IMA step per
    nibble (low nibble of each byte first), stopping at
    samples_per_block per block. None for non-IMA/malformed/stereo
    payloads - rejected, never guessed."""
    if raw is None or len(raw) < 12 or raw[:4] != b"RIFF" \
            or raw[8:12] != b"WAVE":
        return None
    pos, fmt_body, data = 12, None, None
    while pos + 8 <= len(raw):
        tag = raw[pos:pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4:pos + 8])
        body = raw[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt_body = body
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt_body is None or data is None or len(fmt_body) < 20:
        return None
    afmt, channels, _sr, _br, block_align, bits, _cb, spb = \
        struct.unpack("<HHIIHHHH", fmt_body[:20])
    if afmt != 0x11 or channels != 1 or bits != 4 or block_align < 4:
        return None
    out: list[int] = []
    for off in range(0, len(data) - 3, block_align):
        block = data[off:off + block_align]
        pred = struct.unpack("<h", block[0:2])[0]
        idx = block[2]
        if idx > 88:
            return None
        out.append(pred)
        emitted = 1
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                if emitted >= spb:
                    break
                pred, idx = ima_adpcm_step(pred, idx, nib)
                out.append(pred)
                emitted += 1
    return out


# -- 16-bit grayscale PNG (bit depth 16, color type 0) -----------------------

def png_gray16_bytes(width: int, height: int, seed: int) -> bytes:
    """Valid 16-bit grayscale PNG: samples are big-endian u16, and the
    five scanline filters operate BYTE-wise with a 2-byte pixel offset
    (bpp = 2) exactly as the spec prescribes for depth 16. Row y uses
    filter (seed + y) % 5, so every filter type is exercised against
    the two-byte unit."""
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    samples = [
        (seed * 7919 + y * width + x * 31) % 65536
        for y in range(height) for x in range(width)
    ]
    raw_rows = [
        b"".join(struct.pack(">H", samples[y * width + x])
                 for x in range(width))
        for y in range(height)
    ]
    bpp, out, prev = 2, bytearray(), bytes(width * 2)
    for y, row in enumerate(raw_rows):
        f = (seed + y) % 5
        out.append(f)
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = row[i]
            elif f == 1:
                v = (row[i] - a) % 256
            elif f == 2:
                v = (row[i] - b) % 256
            elif f == 3:
                v = (row[i] - (a + b) // 2) % 256
            else:
                v = (row[i] - _paeth(a, b, c)) % 256
            out.append(v)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 16, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def decode_png16_pixels(raw: bytes | None):
    """16-bit grayscale PNG decode: returns (width, height,
    [u16 samples row-major]) or None for anything that is not a
    non-interlaced depth-16 color-0 PNG. Unfiltering runs byte-wise
    with bpp=2 (the spec's rule for depth 16); samples reassemble
    big-endian AFTER unfiltering."""
    if not raw or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        i, n = 8, len(raw)
        width = height = None
        idat = bytearray()
        while i + 8 <= n:
            (length,), tag = struct.unpack(">I", raw[i:i + 4]), raw[i + 4:i + 8]
            body = raw[i + 8:i + 8 + length]
            if tag == b"IHDR":
                width, height, bit_depth, color, _, _, interlace = \
                    struct.unpack(">IIBBBBB", body)
                if bit_depth != 16 or color != 0 or interlace != 0:
                    return None
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            i += 12 + length
        if width is None or not idat:
            return None
        data = zlib.decompress(bytes(idat))
        bpp, stride = 2, width * 2
        if len(data) != height * (stride + 1):
            return None
        samples: list[int] = []
        prev = bytes(stride)
        pos = 0
        for _y in range(height):
            f = data[pos]
            pos += 1
            row = bytearray(data[pos:pos + stride])
            pos += stride
            if f == 1:
                for k in range(bpp, stride):
                    row[k] = (row[k] + row[k - bpp]) % 256
            elif f == 2:
                for k in range(stride):
                    row[k] = (row[k] + prev[k]) % 256
            elif f == 3:
                for k in range(stride):
                    a = row[k - bpp] if k >= bpp else 0
                    row[k] = (row[k] + (a + prev[k]) // 2) % 256
            elif f == 4:
                for k in range(stride):
                    a = row[k - bpp] if k >= bpp else 0
                    c = prev[k - bpp] if k >= bpp else 0
                    row[k] = (row[k] + _paeth(a, prev[k], c)) % 256
            elif f != 0:
                return None
            samples.extend((row[2 * x] << 8) | row[2 * x + 1]
                           for x in range(width))
            prev = bytes(row)
        return (width, height, samples)
    except (struct.error, zlib.error, IndexError):
        return None

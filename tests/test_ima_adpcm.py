"""IMA ADPCM codec edge cases beyond the oracle-checked query."""

from __future__ import annotations

import struct

from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
    IMA_STEP_TABLE,
    decode_ima_adpcm_wav,
    ima_adpcm_step,
    ima_adpcm_wav_bytes,
)


def test_roundtrip_single_block():
    nib = bytes((7 * i + 3) % 16 for i in range(64))
    pcm = decode_ima_adpcm_wav(ima_adpcm_wav_bytes(8000, -123, 17, nib))
    p, ix = -123, 17
    ref = [p]
    for n in nib:
        p, ix = ima_adpcm_step(p, ix, n)
        ref.append(p)
    assert pcm == ref


def test_multi_block_stream_resets_state_per_block():
    """Two blocks concatenated: the second block's header predictor
    must restart the state machine (that is what block headers are
    for - seekability)."""
    nib = bytes(i % 16 for i in range(8))
    one = ima_adpcm_wav_bytes(8000, 100, 5, nib)
    # extract the data chunk payload and double it
    pos, fmtc, datac = 12, None, None
    while pos + 8 <= len(one):
        tag = one[pos:pos + 4]
        (size,) = struct.unpack("<I", one[pos + 4:pos + 8])
        if tag == b"fmt ":
            fmtc = one[pos + 8:pos + 8 + size]
        if tag == b"data":
            datac = one[pos + 8:pos + 8 + size]
        pos += 8 + size + (size % 2)
    two_data = datac + datac
    raw = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmtc) + 8 + len(two_data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
           + b"data" + struct.pack("<I", len(two_data)) + two_data)
    pcm = decode_ima_adpcm_wav(raw)
    single = decode_ima_adpcm_wav(one)
    assert pcm == single + single


def test_odd_nibble_count_pads_high_nibble():
    nib = bytes([3, 9, 12])  # odd count: last byte's high nibble is pad
    pcm = decode_ima_adpcm_wav(ima_adpcm_wav_bytes(8000, 0, 0, nib))
    assert len(pcm) == 4  # header sample + 3 coded samples, pad ignored


def test_rejects_stereo_and_bad_index():
    nib = bytes(range(4))
    raw = bytearray(ima_adpcm_wav_bytes(8000, 0, 0, nib))
    raw[22] = 2  # channels field inside fmt
    assert decode_ima_adpcm_wav(bytes(raw)) is None
    raw2 = bytearray(ima_adpcm_wav_bytes(8000, 0, 0, nib))
    # block header step index out of range
    data_off = raw2.rindex(b"data") + 8
    raw2[data_off + 2] = 120
    assert decode_ima_adpcm_wav(bytes(raw2)) is None
    assert decode_ima_adpcm_wav(None) is None
    assert decode_ima_adpcm_wav(b"RIFFxxxx") is None


def test_clamps_saturate_and_recover():
    # all-7 nibbles (max positive) must pin at 32767 without overflow
    p, ix = 0, 88
    for _ in range(50):
        p, ix = ima_adpcm_step(p, ix, 7)
    assert p == 32767 and ix == 88
    for _ in range(200):
        p, ix = ima_adpcm_step(p, ix, 15)
    assert p == -32768 and ix == 88
    assert IMA_STEP_TABLE[88] == 32767

"""Real dependency-free media codecs (VERDICT r4 item 3): the PPM (P6)
and WAV (RIFF/PCM16) parsers decode REAL encoded bytes through the same
mapInPandas plumbing the stubbed tier uses. The board queries' DuckDB
twins recompute decoded-sample statistics from the generation formula
(tests/test_queries_oracle.py covers the equality); here the PARSERS are
pinned directly: spec-conformance (header comments, chunk walking, word
alignment), round-trip exactness, and loud failure on malformed blobs —
the NotImplementedError guard now remains only for genuinely absent
codecs (jpeg/mp4 in decode_media)."""

import struct

import numpy as np
import pytest

from foundry_es_spark.queries.multimodal import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)


def test_ppm_round_trip_exact():
    for mid in (0, 1, 17, 254, 9999):
        w, h, px = decode_ppm(encode_ppm(mid))
        assert (w, h) == (4 + mid % 5, 3 + mid % 7)
        j = np.arange(w * h * 3)
        exp = ((mid * 31 + j * 7) % 256).astype(np.uint8).reshape(h, w, 3)
        assert (px == exp).all()


def test_ppm_parses_spec_shapes():
    """Header tokenization per the netpbm spec: multiple comments, CRLF-ish
    whitespace runs, multi-digit dims — not a fixed 3-token split."""
    raster = bytes(range(2 * 3 * 3))
    blob = b"P6\n# one comment\n#another\n  2\t3 # trailing\n255\n" + raster
    w, h, px = decode_ppm(blob)
    assert (w, h) == (2, 3) and px.tobytes() == raster


def test_ppm_rejects_malformed():
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="raster"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00")  # truncated raster
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 3)


def test_wav_round_trip_exact():
    for mid in (1, 3, 49, 12345):
        rate, samples = decode_wav(encode_wav(mid))
        n = 400 + (mid % 50) * 8
        assert rate == 8000 and samples.size == n
        k = np.arange(n)
        exp = (((mid * 13 + k * 97) % 65536) - 32768).astype("<i2")
        assert (samples == exp).all()


def test_wav_walks_chunks_not_offsets():
    """The fixture encoder already interposes a LIST chunk; additionally
    an ODD-sized chunk must be skipped with word alignment per RIFF."""
    samples = np.array([100, -200, 300], dtype="<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 bytes + pad
    data = b"data" + struct.pack("<I", 6) + samples.tobytes()
    chunks = b"fmt " + struct.pack("<I", 16) + fmt + odd + data
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    rate, got = decode_wav(blob)
    assert rate == 8000 and (got == samples).all()


def test_wav_rejects_malformed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    # float PCM (format 3) is a real format the fixture decoder must not
    # silently misread as int16
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(blob)


def test_decode_queries_run_on_spark(spark):
    """The decode board queries produce one row per media item with
    integer stats from the DECODED samples (oracle equality is covered by
    the harness; this pins the Spark plumbing shape)."""
    from foundry_es_spark.queries.multimodal import (
        multimodal_decode_ppm,
        multimodal_decode_wav,
    )

    sf = "/root/testdata/sf0.001"
    ppm = multimodal_decode_ppm(spark, sf).limit(5).collect()
    assert len(ppm) == 5
    r = ppm[0]
    assert r["sum_r"] + r["sum_g"] + r["sum_b"] > 0
    assert r["width"] == 4 + r["media_id"] % 5

    wav = multimodal_decode_wav(spark, sf).limit(5).collect()
    assert len(wav) == 5
    assert all(x["sample_rate"] == 8000 and x["sum_abs"] > 0 for x in wav)

"""Pure-stdlib media codec tests (operators/media_codecs.py): PNG
encode/decode round trips across all filter types, WAV PCM stats, and
the real-decode multimodal_features query end to end."""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np
import pytest

from magictables_spark.operators.media_codecs import (
    PNG_SIG,
    UnsupportedMediaError,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    ensure_media_fixture_dir,
    media_features,
)


def test_png_roundtrip_rgb_exact_stats():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    meta = decode_png(encode_png(arr))
    assert (meta["width"], meta["height"], meta["channels"]) == (13, 9, 3)
    assert meta["pixel_mean"] == pytest.approx(arr.astype(np.float64).mean())
    assert meta["pixel_std"] == pytest.approx(arr.astype(np.float64).std())


def test_png_roundtrip_gray_and_alpha():
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    m = decode_png(encode_png(gray))
    assert (m["width"], m["height"], m["channels"]) == (8, 8, 1)
    assert m["pixel_mean"] == pytest.approx(31.5)

    rgba = np.zeros((4, 4, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    m = decode_png(encode_png(rgba))
    assert m["channels"] == 4
    assert m["pixel_mean"] == pytest.approx(255.0 / 4)


def _png_with_filters(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Re-encode scanlines applying the given PNG filter per row, so the
    decoder's unfiltering (Sub/Up/Average/Paeth) is exercised for real."""
    h, w, c = arr.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        f = ftypes[y % len(ftypes)]
        enc = line.copy()
        for x in range(w * c):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if f == 1:
                enc[x] = (line[x] - a) & 0xFF
            elif f == 2:
                enc[x] = (line[x] - b) & 0xFF
            elif f == 3:
                enc[x] = (line[x] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (line[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_all_filter_types_unfilter_correctly():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(8, 5, 3), dtype=np.uint8)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        meta = decode_png(_png_with_filters(arr, ftypes))
        assert meta["pixel_mean"] == pytest.approx(arr.astype(np.float64).mean()), ftypes
        assert meta["pixel_std"] == pytest.approx(arr.astype(np.float64).std()), ftypes


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(UnsupportedMediaError):
        decode_png(b"not a png at all")
    arr = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(encode_png(arr))
    # flip bit depth byte in IHDR (offset: 8 sig + 8 len/type + 8 w/h)
    data[24] = 16
    with pytest.raises(UnsupportedMediaError):
        decode_png(bytes(data))


def test_wav_roundtrip_sine_stats():
    rate = 8000
    t = np.arange(0, rate) / rate  # 1 second
    samples = 0.5 * np.sin(2 * math.pi * 440.0 * t)
    meta = decode_wav(encode_wav(samples, rate=rate))
    assert meta["channels"] == 1
    assert meta["sample_rate"] == rate
    assert meta["n_frames"] == rate
    assert meta["duration_sec"] == pytest.approx(1.0)
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert meta["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert meta["peak"] == pytest.approx(0.5, rel=1e-3)


def test_wav_rejects_garbage():
    with pytest.raises(UnsupportedMediaError):
        decode_wav(b"RIFFxxxxWAVEjunk")


def test_media_features_dim_padding():
    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    v = media_features(encode_png(arr), "image/png", 10)
    assert len(v) == 10
    assert v[0] == 1.0 and v[1] == 6.0 and v[2] == 4.0
    assert v[7:] == [0.0, 0.0, 0.0]
    with pytest.raises(UnsupportedMediaError):
        media_features(b"\xff\xd8\xff", "image/jpeg", 8)


def test_fixture_dir_idempotent(tmp_path):
    d = str(tmp_path / "media")
    ensure_media_fixture_dir(d, n_png=2, n_wav=2)
    import os

    files = sorted(os.listdir(d))
    ensure_media_fixture_dir(d, n_png=2, n_wav=2)  # no-op second time
    assert sorted(os.listdir(d)) == files
    assert sum(f.endswith(".png") for f in files) == 3  # 2 good + 1 broken
    assert sum(f.endswith(".wav") for f in files) == 3


def test_multimodal_features_query_real_decode(spark, sf_dir):
    from magictables_spark.plans.queries import REGISTRY

    rows = {r["mime"]: r for r in REGISTRY["multimodal_features"].fn(spark, sf_dir).collect()}
    png, bmp, wav = rows["image/png"], rows["image/bmp"], rows["audio/wav"]
    jpg, mp3, mp4 = rows["image/jpeg"], rows["audio/mpeg"], rows["video/mp4"]
    assert png["n_files"] == 9 and png["n_decoded"] == 8  # 1 corrupt skipped
    assert bmp["n_files"] == 4 and bmp["n_decoded"] == 4
    assert wav["n_files"] == 9 and wav["n_decoded"] == 8
    assert jpg["n_files"] == 7 and jpg["n_decoded"] == 6  # 1 corrupt skipped
    assert png["feature_dim"] == 8 and bmp["feature_dim"] == 8 and wav["feature_dim"] == 8
    assert jpg["feature_dim"] == 8
    # sample-decoded modalities: decoded == ok
    assert png["n_full_decoded"] == 8 and jpg["n_full_decoded"] == 6
    # audio/mpeg: 3 legacy MP3s (zero payloads -> Layer III silence
    # decode) + 2 painted Layer III clips + 3 MP2s — ALL full PCM
    # decodes since round 9 — plus 1 corrupt
    assert mp3["n_files"] == 9 and mp3["n_decoded"] == 8 and mp3["n_full_decoded"] == 8
    assert mp4["n_files"] == 3 and mp4["n_decoded"] == 2 and mp4["n_full_decoded"] == 0
    assert mp3["feature_dim"] == 8 and mp4["feature_dim"] == 8
    # decoded stats are real: mean pixel (index 4) in (0, 1), audio rms > 0
    assert 0.0 < png["mean_stat"] < 1.0
    assert 0.0 < bmp["mean_stat"] < 1.0
    assert 0.0 < jpg["mean_stat"] < 1.0
    assert wav["mean_stat"] > 0.0
    assert mp3["mean_stat"] > 0.0  # index 4 = rms (all rows PCM-decoded)

def test_png_corrupt_idat_is_unsupported_not_zlib_error():
    """Valid signature + IHDR but garbage IDAT must raise
    UnsupportedMediaError (per-file skip contract), never let
    zlib.error escape and fail the whole Spark task."""
    import struct
    import zlib as _zlib

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", _zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2 gray, 8-bit
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\xde\xad\xbe\xef not deflate")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(UnsupportedMediaError, match="inflate"):
        decode_png(bad)


def test_truncated_ihdr_refuses():
    """Fuzz-found: an IHDR chunk shorter than 13 bytes crashed
    struct.unpack instead of raising the skip-contract error."""
    import struct
    import zlib

    from magictables_spark.operators.media_codecs import PNG_SIG

    short_ihdr = struct.pack(">IIB", 4, 4, 8)  # 9 bytes, not 13
    crc = zlib.crc32(b"IHDR" + short_ihdr) & 0xFFFFFFFF
    data = (
        PNG_SIG
        + struct.pack(">I", len(short_ihdr))
        + b"IHDR"
        + short_ihdr
        + struct.pack(">I", crc)
    )
    with pytest.raises(UnsupportedMediaError, match="IHDR"):
        decode_png(data)


def test_corrupt_riff_header_refuses():
    """Fuzz-found: wave.open escapes with bare RuntimeError/struct.error
    on mangled RIFF sizes; odd 16-bit PCM byte counts crashed
    np.frombuffer. Both must be the per-file skip."""
    import numpy as np

    from magictables_spark.operators.media_codecs import encode_wav

    good = encode_wav(np.zeros(64), rate=8000)
    # chop mid-sample so the data chunk has an odd byte length
    odd = good[:-1]
    with pytest.raises(UnsupportedMediaError):
        decode_wav(odd)
    # stomp the fmt chunk size field with garbage
    mangled = good[:16] + b"\xff\xff\xff\x7f" + good[20:]
    with pytest.raises(UnsupportedMediaError):
        decode_wav(mangled)


def test_one_sample_wav_has_zero_zcr():
    """A single-sample stream has no crossings — zcr must be 0.0, not
    the NaN a diff-of-empty mean produces."""
    import numpy as np

    from magictables_spark.operators.media_codecs import encode_wav

    m = decode_wav(encode_wav(np.array([0.5]), rate=8000))
    assert m["n_frames"] == 1
    assert m["zero_crossing_rate"] == 0.0


def test_bmp_roundtrip_exact_stats():
    from magictables_spark.operators.media_codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    # width 10 forces row padding (30 bytes -> 32-byte stride)
    arr = rng.integers(0, 255, (6, 10, 3), dtype=np.uint8)
    m = decode_bmp(encode_bmp(arr))
    assert (m["width"], m["height"], m["channels"], m["bit_depth"]) == (10, 6, 3, 8)
    assert m["pixel_mean"] == pytest.approx(float(arr.mean()), abs=1e-9)
    assert m["pixel_std"] == pytest.approx(float(arr.std()), abs=1e-9)


def test_bmp_rejects_garbage_and_unsupported():
    from magictables_spark.operators.media_codecs import decode_bmp, encode_bmp

    with pytest.raises(UnsupportedMediaError):
        decode_bmp(b"not a bmp at all")
    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    # flip compression field to BI_RLE8
    bad = good[:30] + b"\x01\x00\x00\x00" + good[34:]
    with pytest.raises(UnsupportedMediaError, match="compressed"):
        decode_bmp(bad)
    # truncate the pixel data
    with pytest.raises(UnsupportedMediaError, match="truncated"):
        decode_bmp(good[:-8])


def test_bmp_media_features_dispatch():
    from magictables_spark.operators.media_codecs import encode_bmp

    vec = media_features(encode_bmp(np.full((3, 5, 3), 128, dtype=np.uint8)), "image/bmp", 8)
    assert vec[0] == 1.0 and vec[1] == 5.0 and vec[2] == 3.0
    assert vec[4] == pytest.approx(128.0 / 255.0)


# --- JPEG (baseline T.81) --------------------------------------------------


def _grad_rgb(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 7 + seed) % 256, (yy * 11 + seed) % 256, ((xx + yy) * 3 + seed) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_roundtrip_gray():
    from magictables_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    arr = (np.arange(24 * 32).reshape(24, 32) % 256).astype(np.uint8)
    m = decode_jpeg(encode_jpeg(arr, quality=90))
    assert (m["width"], m["height"], m["channels"]) == (32, 24, 1)
    assert m["pixel_mean"] == pytest.approx(arr.mean(), abs=1.0)
    assert m["pixel_std"] == pytest.approx(arr.std(), rel=0.05)


def test_jpeg_roundtrip_rgb_444_and_420():
    from magictables_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    arr = _grad_rgb(20, 30)
    for mode in ("444", "420"):
        m = decode_jpeg(encode_jpeg(arr, quality=92, subsample=mode))
        assert (m["width"], m["height"], m["channels"]) == (30, 20, 3), mode
        assert m["pixel_mean"] == pytest.approx(arr.mean(), abs=2.0), mode
        assert m["pixel_std"] == pytest.approx(arr.std(), rel=0.1), mode


def test_jpeg_odd_dimensions_and_restart_markers():
    """Non-multiple-of-8 geometry exercises the edge-padded MCU grid +
    crop; restart_interval exercises DRI/RSTn byte-aligned resync and
    DC predictor resets."""
    from magictables_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    arr = _grad_rgb(17, 23, seed=5)
    data = encode_jpeg(arr, quality=85, subsample="420", restart_interval=2)
    assert b"\xff\xdd" in data  # DRI present
    m = decode_jpeg(data)
    assert (m["width"], m["height"]) == (23, 17)
    assert m["pixel_mean"] == pytest.approx(arr.mean(), abs=2.5)


def test_jpeg_quality_monotone_size():
    from magictables_spark.operators.media_codecs import encode_jpeg

    arr = _grad_rgb(32, 32, seed=9)
    sizes = [len(encode_jpeg(arr, quality=q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_jpeg_refuses_lossless_and_garbage():
    from magictables_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(b"not a jpeg")
    data = bytearray(encode_jpeg(_grad_rgb(8, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless)
    with pytest.raises(UnsupportedMediaError, match="lossless"):
        decode_jpeg(bytes(data))
    # SOF0 -> SOF2 makes the baseline full-band scan an ILLEGAL
    # progressive scan header (Ss=0 with Se=63): refuse, don't misparse
    data = bytearray(encode_jpeg(_grad_rgb(8, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(UnsupportedMediaError, match="progressive"):
        decode_jpeg(bytes(data))
    # truncated scan must refuse, not hang or return wrong stats
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(bytes(bytearray(encode_jpeg(_grad_rgb(16, 16)))[:-20]))


# --- JPEG progressive (T.81 Annex G) ---------------------------------------


def test_jpeg_progressive_matches_baseline_exactly():
    """The progressive scan script transmits the SAME quantized
    coefficients as the baseline encoder (DC and AC successive
    approximation reconstruct every value exactly), so the decoded
    stats must be bit-identical — any drift means a scan-decode bug."""
    from magictables_spark.operators.media_codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    gray = (np.arange(17 * 24).reshape(17, 24) * 9 % 256).astype(np.uint8)
    cases = [
        (gray, "444"),
        (_grad_rgb(15, 21, seed=1), "444"),
        (_grad_rgb(29, 37, seed=2), "420"),  # odd dims + subsampled MCUs
    ]
    for arr, sub in cases:
        for q in (50, 85, 95):
            base = decode_jpeg(encode_jpeg(arr, quality=q, subsample=sub))
            prog = decode_jpeg(encode_jpeg_progressive(arr, quality=q, subsample=sub))
            assert prog == base, (sub, q)


def test_jpeg_progressive_is_sof2_multiscan():
    from magictables_spark.operators.media_codecs import encode_jpeg_progressive

    data = encode_jpeg_progressive(_grad_rgb(16, 16), quality=85)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert data.count(b"\xff\xda") == 10  # the 10-scan RGB script
    gray = encode_jpeg_progressive(np.zeros((8, 8), np.uint8))
    assert gray.count(b"\xff\xda") == 6


def test_jpeg_progressive_truncated_and_features():
    from magictables_spark.operators.media_codecs import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    arr = _grad_rgb(18, 22, seed=3)
    data = encode_jpeg_progressive(arr, quality=88)
    v = media_features(data, "image/jpeg", 8)
    assert v[0] == 1.0 and v[1] == 22.0 and v[2] == 18.0 and v[3] == 3.0
    # cutting the file mid-scan must refuse loudly, not return stats
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(data[: len(data) // 2])


def test_jpeg_decoder_reads_tables_from_file():
    """The decoder must use the DQT shipped in the file, not any
    built-in table: doubling every luminance quant entry in the file
    (same scan bytes!) must ~double the dequantized signal amplitude
    around the 128 level-shift."""
    import struct as _struct

    from magictables_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    # low-contrast gray image centered at 128 so 2x amplitude can't clip
    yy, xx = np.mgrid[0:16, 0:16]
    arr = (128 + 10 * np.sin(xx / 2.0) * np.cos(yy / 3.0)).astype(np.uint8)
    data = bytearray(encode_jpeg(arr, quality=95))
    base = decode_jpeg(bytes(data))
    i = data.find(b"\xff\xdb")
    (seglen,) = _struct.unpack(">H", data[i + 2 : i + 4])
    for k in range(i + 5, i + 2 + seglen):  # skip len + pq/tq byte
        data[k] = min(255, data[k] * 2)
    doubled = decode_jpeg(bytes(data))
    assert doubled["pixel_std"] == pytest.approx(2 * base["pixel_std"], rel=0.05)


def test_jpeg_media_features_wired():
    from magictables_spark.operators.media_codecs import encode_jpeg

    arr = _grad_rgb(12, 18, seed=2)
    v = media_features(encode_jpeg(arr), "image/jpeg", 8)
    assert v[0] == 1.0 and v[1] == 18.0 and v[2] == 12.0 and v[3] == 3.0
    assert 0.0 < v[4] < 1.0


# --- MP3 / MP4 container metadata ------------------------------------------


def test_mp3_meta_roundtrip():
    from magictables_spark.operators.media_codecs import decode_mp3_meta, encode_mp3_fixture

    m = decode_mp3_meta(encode_mp3_fixture(n_frames=38, kbps=192, sample_rate=44100))
    assert m["decoded"] is False and m["kind"] == "audio"
    assert m["channels"] == 2 and m["sample_rate"] == 44100
    assert m["n_frames"] == 38 and m["bitrate_kbps"] == 192.0
    # 38 frames x 1152 samples at 44100 Hz
    assert m["duration_sec"] == pytest.approx(38 * 1152 / 44100)
    assert m["mpeg_version"] == 1 and m["layer"] == 3
    mono = decode_mp3_meta(
        encode_mp3_fixture(n_frames=5, kbps=64, sample_rate=32000, channels=1, id3=False)
    )
    assert mono["channels"] == 1 and mono["sample_rate"] == 32000


def test_mp3_meta_refuses_garbage_and_single_frame():
    from magictables_spark.operators.media_codecs import decode_mp3_meta, encode_mp3_fixture

    with pytest.raises(UnsupportedMediaError):
        decode_mp3_meta(b"not audio at all")
    with pytest.raises(UnsupportedMediaError):
        decode_mp3_meta(b"ID3\x04\x00\x00\x00\x00\x00\x05nope")
    # one lone sync pattern in noise must NOT parse (>= 2 coherent frames)
    one = encode_mp3_fixture(n_frames=1, id3=False)
    with pytest.raises(UnsupportedMediaError):
        decode_mp3_meta(one)


def test_mp4_meta_roundtrip():
    from magictables_spark.operators.media_codecs import decode_mp4_meta, encode_mp4_fixture

    m = decode_mp4_meta(encode_mp4_fixture(duration_sec=7.25))
    assert m["decoded"] is False and m["kind"] == "video"
    assert m["major_brand"] == "isom"
    assert m["duration_sec"] == pytest.approx(7.25)
    assert m["n_tracks"] == 2 and m["has_video"] and m["has_audio"]
    assert m["codecs"] == ["avc1", "mp4a"]
    assert (m["width"], m["height"]) == (640.0, 360.0)
    audio_only = decode_mp4_meta(encode_mp4_fixture(duration_sec=2.0, video=None))
    assert audio_only["n_tracks"] == 1 and not audio_only["has_video"]
    assert audio_only["width"] == 0.0


def test_mp4_meta_refuses_garbage():
    from magictables_spark.operators.media_codecs import decode_mp4_meta

    with pytest.raises(UnsupportedMediaError):
        decode_mp4_meta(b"\x00" * 32)  # no ftyp/moov
    with pytest.raises(UnsupportedMediaError):
        decode_mp4_meta(b"\x00\x00\x00\x08ftypcorrupt")  # truncated, no moov
    with pytest.raises(UnsupportedMediaError):
        decode_mp4_meta(b"tiny")


def test_mp3_mp4_media_features_metadata_rows():
    from magictables_spark.operators.media_codecs import encode_mp4_fixture

    # an uncarried Layer III Huffman table is the remaining audio/mpeg
    # metadata row (zero-payload streams PCM-decode since round 9)
    v = media_features(_l3_uncarried_table_stream(10), "audio/mpeg", 8)
    assert v[0] == 2.0 and v[1] == 1.0  # audio tag, mono
    assert v[4] == pytest.approx(128.0 / 320.0)  # bitrate stat
    v = media_features(encode_mp4_fixture(duration_sec=3.0), "video/mp4", 8)
    assert v[0] == 3.0 and v[1] == 2.0 and v[2] == pytest.approx(3.0)
    assert v[3] == 640.0 and v[5] == 1.0 and v[6] == 1.0


# ---------------------------------------------------------------------------
# MPEG-1 Layer I/II full PCM decode (round-6: the last decoded=False
# audio class with a bounded pure-stdlib path)
# ---------------------------------------------------------------------------


def _best_corr(y, x, max_lag=600):
    """Max |corr| and amplitude ratio of y vs x over integer lags."""
    import numpy as np

    lo, hi = 2048, min(len(x), len(y)) - max_lag - 1
    ref = x[lo:hi]
    best = (0.0, 0, 0.0)
    for lag in range(-max_lag, max_lag):
        if lo + lag < 0:
            continue
        seg = y[lo + lag : hi + lag]
        c = float(np.dot(seg, ref) / (np.linalg.norm(seg) * np.linalg.norm(ref) + 1e-30))
        if abs(c) > abs(best[0]):
            best = (c, lag, float(np.dot(seg, ref) / np.dot(ref, ref)))
    return best


def test_l2_table_selection_by_rate_and_bitrate():
    """ISO 11172-3 Table B.2 selection is (sample rate, kbps/ch), not
    sample rate alone (round-6 advisory): 44.1/32 kHz at 56-80 kbps/ch
    must use the sblimit-27 B.2a layout; only >=96 kbps/ch at those
    rates uses the 30-subband B.2b."""
    import pytest as _pytest

    from magictables_spark.operators.media_codecs import (
        UnsupportedMediaError,
        _l2_table,
    )

    # 48 kHz: always B.2a (27) at >=56 kbps/ch
    for k in (56, 64, 80, 96, 128, 192):
        assert _l2_table(48000, k)[1] == 27
    # 44.1/32 kHz, 56-80 kbps/ch: B.2a (27) — the previously-wrong region
    for sr in (44100, 32000):
        for k in (56, 64, 80):
            assert _l2_table(sr, k)[1] == 27, (sr, k)
    # 44.1/32 kHz, >=96 kbps/ch: B.2b (30)
    for sr in (44100, 32000):
        for k in (96, 112, 128, 160, 192):
            assert _l2_table(sr, k)[1] == 30, (sr, k)
    # low-rate B.2c/B.2d refuse loudly rather than mis-parse
    with _pytest.raises(UnsupportedMediaError):
        _l2_table(44100, 48)


@pytest.mark.parametrize("layer,kbps,sr,ch", [
    (1, 192, 48000, 1),
    (1, 384, 44100, 2),
    (2, 192, 48000, 2),
    (2, 128, 44100, 1),
    # the B.2a-at-44.1/32-kHz region the round-6 advisory flagged:
    # 56-80 kbps/ch streams must parse with the 27-subband layout
    (2, 160, 44100, 2),  # 80 kbps/ch stereo
    (2, 64, 32000, 1),   # 64 kbps/ch mono
])
def test_mpeg1_pcm_roundtrip_matches_input(layer, kbps, sr, ch):
    """Encode a sine mixture through the real analysis filterbank +
    quantizer, decode with decode_mpeg1_audio: the PCM must correlate
    >= 0.95 with the input at matching amplitude — real sample decode,
    not header stats."""
    import numpy as np

    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mpeg1_fixture,
    )

    t = np.arange(sr // 2) / sr
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t) + 0.2 * np.sin(2 * np.pi * 3000.0 * t)
    data = encode_mpeg1_fixture(x, layer=layer, kbps=kbps, sample_rate=sr, channels=ch)
    m = decode_mpeg1_audio(data, return_pcm=True)
    assert m["decoded"] is True and m["layer"] == layer
    assert m["channels"] == ch and m["sample_rate"] == sr
    assert m["duration_sec"] == pytest.approx(0.5, abs=0.05)
    assert m["rms"] == pytest.approx(float(np.sqrt(np.mean(x**2))), rel=0.05)
    for chan in range(ch):
        c, lag, amp = _best_corr(m["pcm"][chan], x)
        assert abs(c) >= 0.95, f"ch{chan}: corr {c:.3f} at lag {lag}"
        assert 0.85 <= abs(amp) <= 1.15, f"ch{chan}: amplitude ratio {amp:.3f}"


def test_mpeg1_layer2_exercises_grouped_codes_and_scfsi():
    """The Layer II fixture must contain BOTH sample layouts (15-level
    ungrouped on table rows that offer it, 5-level grouped triplets on
    the top rows) and both scfsi modes the encoder writes (0 and 2) —
    and still round-trip. A high-subband tone forces the grouped path."""
    import numpy as np

    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mpeg1_fixture,
    )

    sr = 48000
    t = np.arange(sr // 2) / sr
    # 20 kHz tone lands in a top subband (23-26) where B.2a only offers
    # 3/5/65535 levels -> the encoder picks the grouped 5-level code
    x = 0.4 * np.sin(2 * np.pi * 700.0 * t) + 0.3 * np.sin(2 * np.pi * 20000.0 * t)
    data = encode_mpeg1_fixture(x, layer=2, kbps=192, sample_rate=sr, channels=1)
    m = decode_mpeg1_audio(data, return_pcm=True)
    assert m["decoded"] is True
    c, _, _ = _best_corr(m["pcm"][0], x)
    # grouped 5-level quantization is coarse (2.3 bits/sample) so the
    # bar is lower than the 15-level case but must still clearly carry
    # the signal
    assert abs(c) >= 0.9, f"corr {c:.3f}"
    # spectral check: the decoded signal must retain energy near 20 kHz
    spec = np.abs(np.fft.rfft(m["pcm"][0][2048:2048 + 8192]))
    f20k = int(20000.0 * 8192 / sr)
    assert spec[f20k - 8 : f20k + 8].max() > 0.2 * spec.max()


def _l3_uncarried_table_stream(n_frames: int = 3) -> bytes:
    """Valid Layer III frames whose big-value region selects Huffman
    table 24 — outside the carried subset (the 24-31 ESC family's
    data did not survive the completeness gate), so full decode must
    raise and the dispatch must fall back to the metadata walk."""
    from magictables_spark.operators.media_codecs import _BitsW

    hdr = bytes((0xFF, 0xFB, (0x9 << 4) | (0 << 2), 3 << 6))  # 128k 44.1 mono
    flen = 144 * 128000 // 44100
    out = bytearray()
    for _ in range(n_frames):
        w = _BitsW()
        w.write(0, 9)
        w.write(0, 5)
        w.write(0, 4)
        for _gr in range(2):
            w.write(100, 12)  # part2_3_length
            w.write(1, 9)  # big_values: one pair, forces a table read
            w.write(210, 8)
            w.write(0, 4)
            w.write(0, 1)  # long block
            w.write(24, 5)  # region0 table 24: NOT carried
            w.write(0, 5)
            w.write(0, 5)
            w.write(0, 4)
            w.write(0, 3)
            w.write(0, 1)
            w.write(0, 1)
            w.write(0, 1)
        out += hdr + w.pad_to(17) + b"\x00" * (flen - 4 - 17)
    return bytes(out)


def test_mpeg_audio_dispatch_and_provenance():
    """decode_mpeg_audio: Layer I/II/III within the carried tables ->
    full decode (decoded=True; zero-payload Layer III = valid silence);
    an uncarried Huffman table -> metadata walk (decoded=False).
    media_features_ex surfaces the same per-file provenance to the
    Spark kernel."""
    import numpy as np

    from magictables_spark.operators.media_codecs import (
        decode_mpeg_audio,
        encode_mp3_fixture,
        encode_mpeg1_fixture,
        media_features_ex,
    )

    t = np.arange(24000) / 48000
    l2 = encode_mpeg1_fixture(0.5 * np.sin(2 * np.pi * 500 * t), layer=2,
                              kbps=192, sample_rate=48000, channels=1)
    l3_silent = encode_mp3_fixture(n_frames=10, kbps=128)
    l3_meta = _l3_uncarried_table_stream()
    silent = decode_mpeg_audio(l3_silent)
    assert decode_mpeg_audio(l2)["decoded"] is True
    assert silent["decoded"] is True and silent["rms"] == 0.0
    assert decode_mpeg_audio(l3_meta)["decoded"] is False
    v2, d2 = media_features_ex(l2, "audio/mpeg", 8)
    v3, d3 = media_features_ex(l3_meta, "audio/mpeg", 8)
    assert d2 is True and d3 is False
    # decoded rows carry rms/peak/zcr in slots 4-6 (the WAV contract)
    assert 0.2 < v2[4] < 0.5 and 0.3 < v2[5] < 0.7
    # metadata rows carry bitrate/n_frames/layer
    assert v3[4] == pytest.approx(128.0 / 320.0) and v3[6] == 3.0


def test_mpeg1_decode_refuses_garbage_and_joint_stereo():
    import numpy as np

    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mpeg1_fixture,
    )

    with pytest.raises(UnsupportedMediaError):
        decode_mpeg1_audio(b"definitely not audio")
    with pytest.raises(UnsupportedMediaError):
        decode_mpeg1_audio(b"ID3\x04\x00\x00\x00\x00\x00\x05x")
    # flip the mode bits of a valid stream to joint stereo -> refused
    t = np.arange(24000) / 48000
    data = bytearray(encode_mpeg1_fixture(0.4 * np.sin(2 * np.pi * 400 * t),
                                          layer=2, kbps=192, sample_rate=48000,
                                          channels=2))
    data[3] = (data[3] & 0x3F) | (1 << 6)
    with pytest.raises(UnsupportedMediaError):
        decode_mpeg1_audio(bytes(data))


def test_mpeg1_fixture_dir_rows_decode_in_kernel_path():
    """ensure_media_fixture_dir now writes .mp2 clips; media_features_ex
    must report decoded=True for each of them (the multimodal kernel's
    per-file provenance column)."""
    import glob
    import tempfile

    from magictables_spark.operators.media_codecs import (
        ensure_media_fixture_dir,
        media_features_ex,
    )

    d = ensure_media_fixture_dir(tempfile.mkdtemp(prefix="mts_media_t_"))
    mp2s = sorted(glob.glob(f"{d}/*.mp2"))
    assert len(mp2s) == 3
    for p in mp2s:
        with open(p, "rb") as f:
            vec, decoded = media_features_ex(f.read(), "audio/mpeg", 8)
        assert decoded is True
        assert vec[0] == 2.0 and vec[4] > 0.05  # audio tag, nonzero rms


def _l3_reference_pcm(n_frames: int, channels: int, with_short: bool,
                      sample_rate: int, spec_fn=None,
                      band_gain_fn=None) -> "np.ndarray":
    """INDEPENDENT numpy implementation of the Layer III synthesis
    chain — requantize, short-block reorder, alias butterflies, IMDCT
    with windows/overlap, frequency inversion — sharing with the
    decoder only the fixture's spectral DEFINITION
    (_l3_fixture_granule_spec/_l3_fixture_tvals_scf) and the
    L1/L2-proven PQMF synthesis bank. Every transform here is built
    from the ISO formulas directly, vectorized differently from the
    decoder's per-subband loops.

    ``band_gain_fn(gidx, ch, band) -> float`` (long blocks only)
    scales each of the 22 long scalefactor bands of a granule's xr
    between requantization and alias reduction — everything after
    that point is linear, so intensity-stereo expectations compose as
    sums of per-band-gained single-channel references."""
    import numpy as np

    from magictables_spark.operators.media_codecs import (
        _L3_SFB_LONG,
        _L3_SFB_SHORT,
        _l3_fixture_granule_spec,
        _l3_fixture_tvals_scf,
        _pqmf_synthesize,
    )

    sfl, sfs = _L3_SFB_LONG[sample_rate], _L3_SFB_SHORT[sample_rate]
    # IMDCT bases and windows, from the spec formulas
    i36, k18 = np.meshgrid(np.arange(36), np.arange(18), indexing="ij")
    M36 = np.cos(np.pi / 72 * (2 * i36 + 1 + 18) * (2 * k18 + 1))
    i12, k6 = np.meshgrid(np.arange(12), np.arange(6), indexing="ij")
    M12 = np.cos(np.pi / 24 * (2 * i12 + 1 + 6) * (2 * k6 + 1))
    n = np.arange(36)
    win = {0: np.sin(np.pi / 36 * (n + 0.5))}
    w1 = np.sin(np.pi / 36 * (n + 0.5))
    w1[18:24], w1[30:] = 1.0, 0.0
    w1[24:30] = np.sin(np.pi / 12 * (np.arange(6) + 0.5 + 6))
    win[1] = w1
    w3 = np.sin(np.pi / 36 * (n + 0.5))
    w3[:6], w3[12:18] = 0.0, 1.0
    w3[6:12] = np.sin(np.pi / 12 * (np.arange(6) + 0.5))
    win[3] = w3
    wshort = np.sin(np.pi / 12 * (np.arange(12) + 0.5))
    ci = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
    cs, ca = 1 / np.sqrt(1 + ci**2), ci / np.sqrt(1 + ci**2)

    n_gr = 1 if sample_rate in (22050, 24000, 16000) else 2  # LSF
    pcm = []
    for ch in range(channels):
        overlap = np.zeros((32, 18))
        blocks = []
        for gidx in range(n_gr * n_frames):
            spec = (spec_fn or _l3_fixture_granule_spec)(gidx, ch, with_short)
            tvals, lsc, ssc = _l3_fixture_tvals_scf(spec, sfl, sfs)
            # ISO 2.4.3.4.7.1 requantization power: sign(is) * |is|^(4/3)
            # (identity for the ±1 count1 paints, real work for
            # big-value magnitudes)
            tv = np.asarray(tvals, dtype=np.float64)
            tvals = np.sign(tv) * np.abs(tv) ** (4.0 / 3.0)
            bt = spec["block_type"]
            xr = np.zeros(576)
            if bt == 2:
                pos = 0
                for s in range(12):
                    width = sfs[s + 1] - sfs[s]
                    for w in range(3):
                        amp = 2.0 ** (
                            -2.0 * spec["subblock_gain"][w] - 1.0 * ssc[s][w]
                        )
                        for j in range(sfs[s], sfs[s + 1]):
                            xr[18 * (j // 6) + 3 * (j % 6) + w] = tvals[pos] * amp
                            pos += 1
            else:
                for b in range(21):
                    xr[sfl[b]:sfl[b + 1]] = (
                        np.array(tvals[sfl[b]:sfl[b + 1]]) * 2.0 ** (-1.0 * lsc[b])
                    )
                xr[sfl[21]:] = tvals[sfl[21]:576]
                if band_gain_fn is not None:
                    for b in range(22):
                        hi = sfl[b + 1] if b < 21 else 576
                        xr[sfl[b]:hi] *= band_gain_fn(gidx, ch, b)
                # alias butterflies between adjacent subbands
                for sb in range(1, 32):
                    lo = 18 * sb - 1 - np.arange(8)
                    hi = 18 * sb + np.arange(8)
                    a, b_ = xr[lo].copy(), xr[hi].copy()
                    xr[lo] = a * cs - b_ * ca
                    xr[hi] = b_ * cs + a * ca
            out = np.empty((18, 32))
            for sb in range(32):
                X = xr[18 * sb:18 * sb + 18]
                if bt == 2:
                    y = np.zeros(36)
                    for w in range(3):
                        y[6 + 6 * w:18 + 6 * w] += (M12 @ X[w::3][:6]) * wshort
                else:
                    y = (M36 @ X) * win[bt]
                out[:, sb] = y[:18] + overlap[sb]
                overlap[sb] = y[18:]
            inv = np.ones((18, 32))
            inv[1::2, 1::2] = -1.0
            blocks.append(out * inv)
        pcm.append(_pqmf_synthesize(np.concatenate(blocks)))
    return np.stack(pcm)


@pytest.mark.parametrize(
    ("channels", "with_short", "table", "sr"),
    [(1, False, "A", 44100), (2, True, "B", 48000), (1, True, "A", 32000)],
)
def test_l3_decode_matches_independent_reference(channels, with_short, table, sr):
    """The full Layer III decode path (side info, scalefactors, count1
    Huffman, requantization, reorder, alias reduction, IMDCT, overlap,
    frequency inversion) reproduces the independently implemented
    reference synthesis of the same painted spectrum — PCM equal to
    float tolerance, not just stats."""
    import numpy as np

    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mp3_audio_fixture,
    )

    n_frames = 6
    data = encode_mp3_audio_fixture(
        n_frames=n_frames, channels=channels, with_short=with_short,
        count1_table=table, sample_rate=sr,
        kbps=160 if sr == 48000 else 128,
    )
    out = decode_mpeg1_audio(data, return_pcm=True)
    assert out["decoded"] is True and out["layer"] == 3
    assert out["channels"] == channels and out["sample_rate"] == sr
    assert out["n_samples"] == n_frames * 1152
    assert out["rms"] > 0.01 and out["peak"] > 0.05
    ref = _l3_reference_pcm(n_frames, channels, with_short, sr)
    got = out["pcm"]
    assert got.shape == ref.shape
    peak = np.abs(ref).max()
    assert peak > 0
    assert np.max(np.abs(got - ref)) < 1e-9 * max(1.0, peak)


def _random_l3_spec_fn(seed: int):
    """Deterministic random granule paints: same (gidx, ch) always
    yields the same spec, so the encoder and the independent reference
    see identical spectra."""
    import random

    cache: dict = {}

    def spec_fn(gidx: int, ch: int, _with_short: bool) -> dict:
        key = (gidx, ch)
        if key in cache:
            return cache[key]
        rng = random.Random((seed << 20) ^ (gidx << 4) ^ ch)
        bt = rng.choice([0, 0, 1, 2, 3])
        if bt == 2:
            lines, scf = [], {}
            for _ in range(rng.randint(1, 6)):
                s, w = rng.randint(0, 11), rng.randint(0, 2)
                lines.append((s, w, rng.randint(0, 3), rng.choice([1, -1])))
                scf[(s, w)] = rng.randint(0, 15 if s < 6 else 7)
            spec = {
                "block_type": 2,
                "subblock_gain": [rng.randint(0, 3) for _ in range(3)],
                "lines": lines,
                "scf": scf,
            }
        else:
            lines, scf = [], {}
            for _ in range(rng.randint(1, 6)):
                b = rng.randint(0, 20)
                lines.append((b, rng.randint(0, 3), rng.choice([1, -1])))
                scf[b] = rng.randint(0, 15 if b < 11 else 7)
            spec = {
                "block_type": bt,
                "subblock_gain": [0, 0, 0],
                "lines": lines,
                "scf": scf,
            }
        cache[key] = spec
        return spec

    return spec_fn


@pytest.mark.parametrize("seed", range(8))
def test_l3_random_paint_property(seed):
    """Property test: RANDOM spectral paints (random block types incl.
    short, random lines/signs/scalefactors/subblock gains) pushed
    through the real Layer III bitstream encode -> full decode must
    still equal the independent numpy reference — hundreds of distinct
    granule configurations beyond the three committed fixtures."""
    import numpy as np

    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mp3_audio_fixture,
    )

    sr = [44100, 48000, 32000][seed % 3]
    channels = 1 + seed % 2
    spec_fn = _random_l3_spec_fn(seed)
    data = encode_mp3_audio_fixture(
        n_frames=4, channels=channels, sample_rate=sr,
        kbps=160 if sr == 48000 else 128,
        count1_table="AB"[seed % 2], spec_fn=spec_fn,
    )
    out = decode_mpeg1_audio(data, return_pcm=True)
    assert out["decoded"] is True and out["layer"] == 3
    ref = _l3_reference_pcm(4, channels, False, sr, spec_fn=spec_fn)
    peak = np.abs(ref).max()
    assert peak > 0
    assert np.max(np.abs(out["pcm"] - ref)) < 1e-9 * max(1.0, peak)


_CARRIED_B7 = (1, 2, 3, 5, 6, 9, 10, 11, 12, 13, 15,
               16, 17, 18, 19, 20, 21, 22, 23)


def _big_value_spec_fn(table: int):
    """Deterministic paint whose big-values region exercises table
    ``table`` at its full magnitude range (ESC + max linbits value for
    the 16-23 family), with a count1 tail after the pair region."""
    from magictables_spark.operators.media_codecs import _L3_PAIR_ENC

    _, lb, n = _L3_PAIR_ENC[table]
    vmax = (15 + (1 << lb) - 1) if lb else (n - 1)

    def spec_fn(gidx, ch, _ws):
        flip = -1 if (gidx + ch) % 2 else 1
        return {
            "block_type": 0,
            "subblock_gain": [0, 0, 0],
            "lines": [(14, 0, 1), (14, 2, -1)],
            "scf": {0: 3, 2: 1, 14: 2},
            "big_lines": [
                (0, flip * vmax), (1, -max(vmax // 2, 1)), (2, 0),
                (3, vmax), (4, -1), (5, min(vmax, 15)), (6, 1), (7, 0),
            ],
        }

    return spec_fn


@pytest.mark.parametrize("table", _CARRIED_B7)
def test_l3_big_values_match_independent_reference(table):
    """Every carried ISO B.7 pair table (incl. the full 16-23 ESC/
    linbits family) round-trips a big-values region through encode ->
    full decode with PCM equal to the independent numpy reference —
    the requantization power, sign bits, ESC escapes and linbits
    widths all live on this path."""
    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mp3_audio_fixture,
    )

    spec_fn = _big_value_spec_fn(table)
    n_frames = 3
    data = encode_mp3_audio_fixture(
        n_frames=n_frames, spec_fn=spec_fn, big_table=table
    )
    out = decode_mpeg1_audio(data, return_pcm=True)
    assert out["decoded"] is True and out["layer"] == 3
    ref = _l3_reference_pcm(n_frames, 1, False, 44100, spec_fn=spec_fn)
    peak = np.abs(ref).max()
    assert peak > 0
    assert np.max(np.abs(out["pcm"] - ref)) < 1e-9 * max(1.0, peak)


def _random_big_value_spec_fn(seed: int, table: int):
    import random

    from magictables_spark.operators.media_codecs import _L3_PAIR_ENC

    _, lb, n = _L3_PAIR_ENC[table]
    vmax = (15 + (1 << lb) - 1) if lb else (n - 1)
    cache: dict = {}

    def spec_fn(gidx, ch, _ws):
        key = (gidx, ch)
        if key not in cache:
            rng = random.Random((seed << 24) ^ (gidx << 4) ^ ch ^ table)
            n_big = rng.randint(1, 12)
            big = [
                (i, rng.choice([1, -1]) * rng.randint(0, vmax))
                for i in range(n_big)
            ]
            tail = [(12 + rng.randint(0, 5), rng.randint(0, 3),
                     rng.choice([1, -1])) for _ in range(rng.randint(0, 4))]
            scf = {b: rng.randint(0, 7) for b, _k, _s in tail}
            scf[0] = rng.randint(0, 7)
            cache[key] = {
                "block_type": 0, "subblock_gain": [0, 0, 0],
                "lines": tail, "scf": scf, "big_lines": big,
            }
        return cache[key]

    return spec_fn


@pytest.mark.parametrize("seed", range(6))
def test_l3_big_values_random_property(seed):
    """Random big-value paints (random magnitudes across the table
    range, random count1 tails) through a rotating carried table set
    still PCM-match the independent reference."""
    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mp3_audio_fixture,
    )

    table = _CARRIED_B7[(seed * 5) % len(_CARRIED_B7)]
    spec_fn = _random_big_value_spec_fn(seed, table)
    data = encode_mp3_audio_fixture(n_frames=4, spec_fn=spec_fn,
                                    big_table=table)
    out = decode_mpeg1_audio(data, return_pcm=True)
    assert out["decoded"] is True
    ref = _l3_reference_pcm(4, 1, False, 44100, spec_fn=spec_fn)
    assert np.max(np.abs(out["pcm"] - ref)) < 1e-9 * max(
        1.0, np.abs(ref).max()
    )


@pytest.mark.parametrize(
    ("sr", "with_short", "table"),
    [(22050, False, 16), (24000, True, None), (16000, False, 13)],
)
def test_l3_lsf_decode_matches_independent_reference(sr, with_short, table):
    """MPEG-2 LSF Layer III (576-sample frames, 9-bit LSF
    scalefac_compress, 13818-3 sfb tables) decodes to PCM equal to the
    independent reference — long and short blocks, count1 and
    big-values regions."""
    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mp3_audio_fixture,
    )

    spec_fn = _big_value_spec_fn(table) if table else None
    n_frames = 6
    data = encode_mp3_audio_fixture(
        n_frames=n_frames, kbps=64, sample_rate=sr, version=2,
        with_short=with_short, spec_fn=spec_fn,
        big_table=table,
    )
    out = decode_mpeg1_audio(data, return_pcm=True)
    assert out["decoded"] is True and out["mpeg_version"] == 2
    assert out["sample_rate"] == sr
    assert out["n_samples"] == n_frames * 576
    ref = _l3_reference_pcm(n_frames, 1, with_short, sr, spec_fn=spec_fn)
    peak = np.abs(ref).max()
    assert peak > 0
    assert np.max(np.abs(out["pcm"] - ref)) < 1e-9 * max(1.0, peak)


_REAL_MP3 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"
)


@pytest.mark.skipif(not __import__("os").path.exists(_REAL_MP3),
                    reason="real-world MP3 not present on this host")
def test_l3_lsf_decodes_real_world_stream():
    """A real encoder's MPEG-2 LSF stream (not our fixture generator)
    fully PCM-decodes, and the table-audit walk lands every granule
    exactly on part2_3_length."""
    from magictables_spark.operators.media_codecs import decode_mpeg_audio
    from tools.mp3_table_audit import audit_file

    data = open(_REAL_MP3, "rb").read()
    out = decode_mpeg_audio(data)
    assert out["decoded"] is True and out["mpeg_version"] == 2
    assert out["sample_rate"] == 22050 and out["n_frames"] == 45
    assert out["n_samples"] == 45 * 576
    assert out["rms"] == 0.0  # the fixture is digital silence

    st = audit_file(_REAL_MP3)
    assert st["granules"] == 45
    assert st["exact"] == 45
    assert st["invalid"] == 0 and st["overrun"] == 0


@pytest.mark.parametrize(
    ("with_short", "sr", "version"),
    [(False, 44100, 1), (True, 48000, 1), (False, 22050, 2)],
)
def test_l3_ms_joint_stereo_matches_matrixed_reference(with_short, sr, version):
    """MS joint stereo (mode 1, mode_ext 2): channels carry mid/side
    after per-channel requantization, L = (M+S)/sqrt(2),
    R = (M-S)/sqrt(2). Every stage after requantization (alias, IMDCT,
    windows, overlap-add, PQMF) is linear and both channels share each
    granule's block type, so the expected PCM is exactly the matrix of
    the per-channel reference syntheses — checked to 1e-9."""
    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mp3_audio_fixture,
    )

    n_frames = 5
    kw = dict(
        n_frames=n_frames, channels=2, with_short=with_short,
        sample_rate=sr, version=version,
        kbps=160 if sr == 48000 else (64 if version == 2 else 128),
    )
    out = decode_mpeg1_audio(
        encode_mp3_audio_fixture(joint_ms=True, **kw), return_pcm=True
    )
    assert out["decoded"] is True and out["channels"] == 2
    ms = _l3_reference_pcm(n_frames, 2, with_short, sr)  # ch0=M, ch1=S
    expect = np.stack([
        (ms[0] + ms[1]) / np.sqrt(2.0),
        (ms[0] - ms[1]) / np.sqrt(2.0),
    ])
    peak = np.abs(expect).max()
    assert peak > 0
    assert np.max(np.abs(out["pcm"] - expect)) < 1e-9 * max(1.0, peak)


# per-band intensity positions used by the intensity fixtures: every
# legal MPEG-1/LSF position 0..6 plus the illegal marker 7, repeated
_IS_POS = [0, 1, 2, 3, 4, 5, 6, 7, 0, 2, 4, 6, 1, 3, 5, 7, 2, 4, 6, 1, 3]


def _is_spec_fn(ms_low_bands=()):
    """Fixture paint for intensity streams: ch0 carries the signal
    across low AND high bands; ch1 is spectrally empty except optional
    low-band side lines (the MS+IS case) and carries _IS_POS in its
    scalefactor slots (the dual-purpose field: real scalefactors below
    the intensity bound, positions above it)."""
    def spec_fn(gidx, ch, with_short):
        assert not with_short
        if ch == 1:
            lines = [(b, 1, 1 if (b + gidx) % 2 == 0 else -1)
                     for b in ms_low_bands]
            scf = {b: _IS_POS[b] for b in range(21)}
            for b in ms_low_bands:  # below-bound slots are true scfs
                scf[b] = 2
            return {"block_type": 0, "subblock_gain": [0, 0, 0],
                    "lines": lines, "scf": scf}
        bands = [2, 6, 10, 14, 18, 20]
        lines = [(b, 0, 1 if (b + gidx) % 2 == 0 else -1) for b in bands]
        scf = {b: (b + gidx) % 6 for b in bands}
        return {"block_type": 0, "subblock_gain": [0, 0, 0],
                "lines": lines, "scf": scf}
    return spec_fn


def _is_gains(version, is_scale):
    """(kl, kr) per position — re-derived here from the ISO formulas,
    independently of the decoder's import-time tables."""
    import math as m

    def gains(pos):
        if version == 1:
            if pos >= 6:
                return (1.0, 0.0)
            r = m.tan(pos * m.pi / 12.0)
            return (r / (1.0 + r), 1.0 / (1.0 + r))
        io = 2.0 ** -0.25 if is_scale else 2.0 ** -0.5
        if pos == 0:
            return (1.0, 1.0)
        if pos % 2:
            return (io ** ((pos + 1) // 2), 1.0)
        return (1.0, io ** (pos // 2))
    return gains


@pytest.mark.parametrize(
    ("version", "sr", "is_scale"),
    [(1, 44100, 0), (2, 22050, 0), (2, 22050, 1)],
)
def test_l3_intensity_stereo_matches_gained_reference(version, sr, is_scale):
    """Pure intensity joint stereo (mode 1, mode_ext 1): ch1 is
    spectrally empty, so every long band is in the intensity region
    and the decoder pans ch0's spectrum per band by the position in
    ch1's scalefactor slot — MPEG-1 tan(k*pi/12) ratios, LSF io
    powers, position 7 = band passes through. Everything after
    requantization is linear, so the expected PCM is exactly the
    per-band-gained single-channel reference synthesis (1e-9)."""
    from magictables_spark.operators.media_codecs import (
        decode_mpeg1_audio,
        encode_mp3_audio_fixture,
    )

    n_frames = 5
    spec_fn = _is_spec_fn()
    out = decode_mpeg1_audio(
        encode_mp3_audio_fixture(
            n_frames=n_frames, channels=2, sample_rate=sr,
            kbps=128 if version == 1 else 64, version=version,
            joint_is=True, lsf_intensity_scale=is_scale, spec_fn=spec_fn,
        ),
        return_pcm=True,
    )
    assert out["decoded"] is True and out["channels"] == 2
    gains = _is_gains(version, is_scale)

    def gain(side):
        def f(gidx, ch, band):
            pos = _IS_POS[min(band, 20)]
            if pos == 7:  # illegal: no intensity, ch0 passes to L only
                return 1.0 if side == 0 else 0.0
            return gains(pos)[side]
        return f

    ch0_only = lambda gidx, ch, ws: spec_fn(gidx, 0, ws)  # noqa: E731
    expect = np.stack([
        _l3_reference_pcm(n_frames, 1, False, sr, spec_fn=ch0_only,
                          band_gain_fn=gain(0))[0],
        _l3_reference_pcm(n_frames, 1, False, sr, spec_fn=ch0_only,
                          band_gain_fn=gain(1))[0],
    ])
    peak = np.abs(expect).max()
    assert peak > 0
    assert np.max(np.abs(out["pcm"] - expect)) < 1e-9 * max(1.0, peak)


def test_l3_ms_plus_intensity_composes_per_band():
    """mode_ext 3 (MS + intensity): bands below the intensity bound —
    set by ch1's highest nonzero line — decode as MS; legal-position
    bands above pan ch0's spectrum; illegal-position (7) bands above
    fall back to MS. The expectation composes from four per-band-
    selected single-channel references by linearity."""
    from magictables_spark.operators.media_codecs import (
        _L3_SFB_LONG,
        decode_mpeg1_audio,
        encode_mp3_audio_fixture,
    )

    n_frames, sr = 4, 44100
    ms_low = (1, 3)
    spec_fn = _is_spec_fn(ms_low_bands=ms_low)
    out = decode_mpeg1_audio(
        encode_mp3_audio_fixture(
            n_frames=n_frames, channels=2, sample_rate=sr, kbps=128,
            joint_ms=True, joint_is=True, spec_fn=spec_fn,
        ),
        return_pcm=True,
    )
    assert out["decoded"] is True and out["channels"] == 2
    sfl = _L3_SFB_LONG[sr]
    # ch1's paint puts its last nonzero line at sfl[3]+1 (band 3,
    # line k=1) -> intensity region = bands whose lower edge exceeds it
    last_nz = sfl[3] + 1
    in_region = [sfl[b] > last_nz for b in range(22)]
    gains = _is_gains(1, 0)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)

    def ms_band(b):
        pos = _IS_POS[min(b, 20)]
        return (not in_region[b]) or pos == 7

    def g_ms(gidx, ch, b):
        return inv_sqrt2 if ms_band(b) else 0.0

    def g_is(side):
        def f(gidx, ch, b):
            if ms_band(b):
                return 0.0
            return gains(_IS_POS[min(b, 20)])[side]
        return f

    ch0_only = lambda gidx, ch, ws: spec_fn(gidx, 0, ws)  # noqa: E731
    ch1_only = lambda gidx, ch, ws: spec_fn(gidx, 1, ws)  # noqa: E731
    r0_ms = _l3_reference_pcm(n_frames, 1, False, sr, spec_fn=ch0_only,
                              band_gain_fn=g_ms)[0]
    r1_ms = _l3_reference_pcm(n_frames, 1, False, sr, spec_fn=ch1_only,
                              band_gain_fn=g_ms)[0]
    r0_l = _l3_reference_pcm(n_frames, 1, False, sr, spec_fn=ch0_only,
                             band_gain_fn=g_is(0))[0]
    r0_r = _l3_reference_pcm(n_frames, 1, False, sr, spec_fn=ch0_only,
                             band_gain_fn=g_is(1))[0]
    expect = np.stack([r0_ms + r1_ms + r0_l, r0_ms - r1_ms + r0_r])
    peak = np.abs(expect).max()
    assert peak > 0
    assert np.max(np.abs(out["pcm"] - expect)) < 1e-9 * max(1.0, peak)


def test_l3_short_block_intensity_still_falls_back():
    """Intensity with short blocks stays out of scope: the decoder
    raises and the dispatch falls back to the metadata walk."""
    from magictables_spark.operators.media_codecs import (
        decode_mpeg_audio,
        encode_mp3_audio_fixture,
    )

    data = encode_mp3_audio_fixture(n_frames=3, channels=2,
                                    with_short=True, joint_is=True)
    out = decode_mpeg_audio(data)
    assert out["decoded"] is False

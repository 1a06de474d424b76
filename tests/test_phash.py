"""Perceptual-hash near-duplicate image detection.

The committed corpus (tests/fixtures/media_phash) plants 5 duplicate
groups of 3 (base PNG, JPEG q85 re-encode, brightness+8 PNG): the
within-group pHash Hamming distances measure <= 4 and every cross-group
distance >= 20, so threshold 6 separates with margin on BOTH sides.
"""

from __future__ import annotations

import itertools
import os

import pytest

from magictables_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_image_gray,
    ensure_phash_fixture_dir,
    phash64,
)

CORPUS = os.path.join(os.path.dirname(__file__), "fixtures", "media_phash")


def _group(fn: str) -> str:
    return fn.split("_")[1].split(".")[0]


def _hashes() -> dict[str, int]:
    d = ensure_phash_fixture_dir(CORPUS)
    out = {}
    for fn in sorted(os.listdir(d)):
        if fn.startswith("."):
            continue
        mime = "image/jpeg" if fn.endswith(".jpg") else "image/png"
        with open(os.path.join(d, fn), "rb") as f:
            out[fn] = phash64(decode_image_gray(f.read(), mime))
    return out


def test_phash_separation_on_planted_corpus():
    hashes = _hashes()
    assert len(hashes) == 15
    same, diff = [], []
    for a, b in itertools.combinations(sorted(hashes), 2):
        dist = bin(hashes[a] ^ hashes[b]).count("1")
        (same if _group(a) == _group(b) else diff).append(dist)
    assert len(same) == 15 and len(diff) == 90
    assert max(same) <= 6, f"planted dup drifted to {max(same)}"
    assert min(diff) >= 15, f"cross-group collapsed to {min(diff)}"


def test_phash_deterministic_and_63_bit():
    hashes = _hashes()
    assert _hashes() == hashes  # byte-identical decode -> identical hash
    for h in hashes.values():
        assert 0 <= h < (1 << 63)


def test_phash_rejects_non_image():
    with pytest.raises(UnsupportedMediaError):
        decode_image_gray(b"RIFF....WAVE", "audio/wav")
    with pytest.raises(UnsupportedMediaError):
        decode_image_gray(b"\x89PNG\r\n\x1a\ngarbage", "image/png")


def test_query_finds_exactly_the_planted_pairs(spark):
    from magictables_spark.plans.curation_pack import image_phash_neardup

    rows = image_phash_neardup(spark, "/root/testdata/sf0.001").collect()
    got = {(r.file_a, r.file_b) for r in rows}
    assert len(got) == 15
    for a, b in got:
        assert _group(a) == _group(b), f"false positive {a} ~ {b}"
    # every planted pair recovered: 5 groups x 3 choose 2
    names = sorted({n for ab in got for n in ab})
    assert len(names) == 15  # all 15 files participate
    assert all(r.hamming <= 6 for r in rows)


def test_banding_exactness_guard(spark):
    from magictables_spark.operators.multimodal import image_phash, phash_neardup, read_media

    media = read_media(spark, CORPUS)
    with pytest.raises(ValueError):
        phash_neardup(image_phash(media), max_hamming=9, n_bands=9)


AUDIO_CORPUS = os.path.join(os.path.dirname(__file__), "fixtures", "media_afp")


def _audio_hashes() -> dict[str, int]:
    from magictables_spark.operators.media_codecs import (
        afp56,
        decode_audio_pcm,
        ensure_afp_fixture_dir,
    )

    d = ensure_afp_fixture_dir(AUDIO_CORPUS)
    out = {}
    for fn in sorted(os.listdir(d)):
        if fn.startswith("."):
            continue
        mime = "audio/mpeg" if fn.endswith(".mp2") else "audio/wav"
        with open(os.path.join(d, fn), "rb") as f:
            samples, rate = decode_audio_pcm(f.read(), mime)
        out[fn] = afp56(samples, rate)
    return out


def test_afp_separation_on_planted_corpus():
    """Gain x0.7 and a REAL MPEG-1 Layer II round-trip must move ~0
    bits; disjoint-frequency clips must stay far apart."""
    hashes = _audio_hashes()
    assert len(hashes) == 12
    same, diff = [], []
    for a, b in itertools.combinations(sorted(hashes), 2):
        dist = bin(hashes[a] ^ hashes[b]).count("1")
        (same if _group(a) == _group(b) else diff).append(dist)
    assert len(same) == 12 and len(diff) == 54
    assert max(same) <= 3, f"planted audio dup drifted to {max(same)}"
    assert min(diff) >= 6, f"cross-group collapsed to {min(diff)}"
    for h in hashes.values():
        assert 0 <= h < (1 << 56)


def test_afp_shift_and_gain_invariance():
    """The properties that make the codec round-trip survivable,
    asserted directly: a 480-sample shift (the MPEG filterbank group
    delay) and a gain change move zero bits."""
    import numpy as np

    from magictables_spark.operators.media_codecs import afp56

    rate = 32000
    t = np.arange(rate // 2) / rate
    s = 0.5 * np.sin(2 * np.pi * 440.0 * t) + 0.3 * np.sin(2 * np.pi * 1234.0 * t)
    base = afp56(s, rate)
    assert afp56(np.roll(s, 480), rate) == base
    assert afp56(0.25 * s, rate) == base


def test_audio_query_finds_exactly_the_planted_pairs(spark):
    from magictables_spark.plans.curation_pack import audio_fp_neardup

    rows = audio_fp_neardup(spark, "/root/testdata/sf0.001").collect()
    got = {(r.file_a, r.file_b) for r in rows}
    assert len(got) == 12
    for a, b in got:
        assert _group(a) == _group(b), f"false positive {a} ~ {b}"
    assert all(r.hamming <= 3 for r in rows)


def test_phash_invariant_to_lossless_reencode():
    """pHash of the SAME pixels through different lossless containers
    (PNG vs BMP) must be bit-identical — the decode paths share no
    code, so this pins the whole decode->luma->DCT chain."""
    import numpy as np

    from magictables_spark.operators.media_codecs import (
        encode_bmp,
        encode_png,
    )

    yy, xx = np.mgrid[0:40, 0:56]
    rgb = np.stack(
        [
            np.clip(80 + 50 * np.sin(xx / 5.0), 0, 255),
            np.clip(120 + 40 * np.cos(yy / 7.0), 0, 255),
            np.clip((xx + yy) % 256, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    h_png = phash64(decode_image_gray(encode_png(rgb), "image/png"))
    h_bmp = phash64(decode_image_gray(encode_bmp(rgb), "image/bmp"))
    assert h_png == h_bmp


def test_afp_rate_invariance_same_tones():
    """The same tonal content sampled at 32 kHz and 48 kHz must land
    on (near-)identical fingerprints — absolute-Hz bands, not
    bin-relative ones."""
    import numpy as np

    from magictables_spark.operators.media_codecs import afp56

    hashes = []
    for rate in (32000, 48000):
        t = np.arange(rate // 2) / rate
        s = 0.5 * np.sin(2 * np.pi * 300.0 * t) + 0.3 * np.sin(2 * np.pi * 900.0 * t)
        hashes.append(afp56(s, rate))
    assert bin(hashes[0] ^ hashes[1]).count("1") <= 1


def test_banding_pigeonhole_exactness_property():
    """The mathematical guarantee behind every banded Hamming join in
    the repo (pHash 9x7, afp 8x7, simhash 3x20): two hashes within
    Hamming d < n_bands ALWAYS share at least one identical band —
    property-tested over random hashes and random bit flips."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        h=st.integers(min_value=0, max_value=(1 << 63) - 1),
        flips=st.lists(st.integers(min_value=0, max_value=62), max_size=8, unique=True),
        geometry=st.sampled_from([(9, 7), (8, 7), (3, 20)]),
    )
    def check(h, flips, geometry):
        n_bands, band_bits = geometry
        usable = n_bands * band_bits
        flips = [f for f in flips if f < usable]
        h &= (1 << usable) - 1
        g = h
        for f in flips:
            g ^= 1 << f
        d = bin(h ^ g).count("1")
        mask = (1 << band_bits) - 1
        shared = any(
            (h >> (i * band_bits)) & mask == (g >> (i * band_bits)) & mask
            for i in range(n_bands)
        )
        if d < n_bands:
            assert shared, (hex(h), flips, geometry)

    check()

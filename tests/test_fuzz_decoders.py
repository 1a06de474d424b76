"""Seeded mutation-fuzz regression harness for the binary decoders.

The decode kernels run inside Arrow-batched mapInPandas over untrusted
bytes; their contract is per-file skip (UnsupportedPdfError /
UnsupportedMediaError), never an escaping exception that would fail the
whole Spark task. The round-3 full-scale fuzz (20-30k trials) caught
five escapes (empty RC4 key, unterminated hex string, truncated IHDR,
bare wave RuntimeError, odd PCM length); this seeded subset keeps the
property pinned in CI time.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from magictables_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_bmp,
    decode_jpeg,
    decode_mp3_meta,
    decode_mpeg1_audio,
    decode_mp4_meta,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_jpeg,
    encode_jpeg_progressive,
    encode_mp3_fixture,
    encode_mpeg1_fixture,
    encode_mp4_fixture,
    encode_png,
    encode_wav,
    media_features,
)
from magictables_spark.sources.pdf_text import (
    UnsupportedPdfError,
    build_aes256_pdf,
    build_aes_pdf,
    build_objstm_pdf,
    build_rc4_pdf,
    build_simple_pdf,
    extract_pdf_pages,
)


def _mutate(rng: random.Random, data: bytearray, rounds: int) -> bytes:
    for _ in range(rounds):
        op = rng.random()
        if op < 0.5 and data:
            data[rng.randrange(len(data))] = rng.randrange(256)
        elif op < 0.75 and len(data) > 30:
            i = rng.randrange(len(data) - 20)
            del data[i : i + rng.randint(1, 20)]
        else:
            i = rng.randrange(len(data) + 1)
            data[i:i] = rng.randbytes(rng.randint(1, 12))
    return bytes(data)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pdf_mutations_never_escape(seed):
    rng = random.Random(seed)
    base = [
        build_simple_pdf(["Hello page one", "Second (with) \\ escapes"]),
        build_objstm_pdf(["A b c", "B"]),
        build_rc4_pdf(["enc page"]),
        build_aes_pdf(["aes enc page"]),
        # R5 only: the R6 hardened hash costs ~1 s per password check,
        # which a mutated /U forces on every trial
        build_aes256_pdf(["v5 enc page"], r=5),
    ]
    for trial in range(800):
        if trial % 4 == 3:
            data = bytes(b"%PDF-1.4\n") + rng.randbytes(rng.randint(10, 300))
        else:
            data = _mutate(rng, bytearray(rng.choice(base)), rng.randint(1, 20))
        try:
            extract_pdf_pages(data)
        except UnsupportedPdfError:
            pass  # the contract: refuse loudly, typed


def _mutate_pdf_structured(rng: random.Random, data: bytearray) -> bytes:
    """Structure-aware PDF mutations: hit the fields the parser trusts
    most — header version, xref offsets, stream /Length values, crypt
    dictionary entries (/R /V /O /U /P), object ids, startxref — plus
    structural truncation. Byte-flip fuzz rarely lands on these."""
    import re as _re

    ops = rng.sample(range(7), k=rng.randint(1, 4))
    blob = bytes(data)
    for op in ops:
        if op == 0:  # header version / magic damage
            k = rng.randrange(2, 8)
            blob = blob[:k] + bytes([rng.randrange(256)]) + blob[k + 1:]
        elif op == 1:  # corrupt a /Length value (wrong span decode)
            ms = list(_re.finditer(rb"/Length\s+(\d+)", blob))
            if ms:
                m = rng.choice(ms)
                new = str(max(0, int(m.group(1)) + rng.randint(-40, 40))).encode()
                blob = blob[:m.start(1)] + new + blob[m.end(1):]
        elif op == 2:  # corrupt crypt dict fields
            ms = list(_re.finditer(rb"/(R|V|P)\s+(-?\d+)", blob))
            if ms:
                m = rng.choice(ms)
                blob = (blob[:m.start(2)]
                        + str(rng.randint(-9, 9)).encode() + blob[m.end(2):])
        elif op == 3:  # damage /O or /U key material
            ms = list(_re.finditer(rb"/(O|U)\s*\(", blob))
            if ms:
                i = rng.choice(ms).end() + rng.randrange(8)
                if i < len(blob):
                    blob = blob[:i] + bytes([rng.randrange(256)]) + blob[i + 1:]
        elif op == 4:  # rewrite an object id (dangling refs)
            ms = list(_re.finditer(rb"(\d+)\s+0\s+obj", blob))
            if ms:
                m = rng.choice(ms)
                blob = (blob[:m.start(1)]
                        + str(rng.randrange(90)).encode() + blob[m.end(1):])
        elif op == 5:  # corrupt startxref offset
            ms = list(_re.finditer(rb"startxref\s+(\d+)", blob))
            if ms:
                m = rng.choice(ms)
                blob = (blob[:m.start(1)]
                        + str(rng.randrange(10 ** 6)).encode() + blob[m.end(1):])
        else:  # structural truncation
            if len(blob) > 60:
                blob = blob[:rng.randrange(40, len(blob))]
    return blob


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pdf_structured_mutations_never_escape_or_garble(seed):
    """Targeted mutations of the fields the PDF parser trusts —
    header, xref/startxref, stream lengths, crypt dict, object ids —
    must always yield either clean text or a typed UnsupportedPdfError:
    never an unhandled exception, and never a 'successful' extraction
    containing raw binary garbage (NUL bytes / unpaired surrogates)."""
    rng = random.Random(1000 + seed)
    base = [
        build_simple_pdf(["Hello page one", "Second (with) \\ escapes"]),
        build_objstm_pdf(["A b c", "B"]),
        build_rc4_pdf(["enc page"]),
        build_aes_pdf(["aes enc page"]),
        build_aes256_pdf(["v5 enc page"], r=5),
    ]
    for _trial in range(600):
        data = _mutate_pdf_structured(rng, bytearray(rng.choice(base)))
        try:
            pages = extract_pdf_pages(data)
        except UnsupportedPdfError:
            continue
        for page in pages:
            assert isinstance(page, str)
            assert "\x00" not in page
            page.encode("utf-8")  # no unpaired surrogates


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_media_mutations_never_escape(seed):
    rng = random.Random(seed)
    np_rng = np.random.default_rng(seed)
    pngs = [
        encode_png(np_rng.integers(0, 255, (h, w, c), dtype=np.uint8).squeeze())
        for h, w, c in [(8, 8, 3), (16, 5, 4), (4, 12, 1)]
    ]
    wavs = [
        encode_wav((np_rng.standard_normal(n) * 0.3).astype(np.float64), rate=8000)
        for n in (100, 1000)
    ]
    bmps = [encode_bmp(np_rng.integers(0, 255, (6, 10, 3), dtype=np.uint8))]
    jpgs = [
        encode_jpeg(np_rng.integers(0, 255, (11, 14, 3), dtype=np.uint8), quality=85),
        encode_jpeg(np_rng.integers(0, 255, (9, 17), dtype=np.uint8), quality=70,
                    subsample="444", restart_interval=2),
        encode_jpeg(np_rng.integers(0, 255, (18, 21, 3), dtype=np.uint8), subsample="420"),
        encode_jpeg_progressive(
            np_rng.integers(0, 255, (13, 19, 3), dtype=np.uint8), quality=80
        ),
        encode_jpeg_progressive(
            np_rng.integers(0, 255, (10, 15), dtype=np.uint8), quality=75
        ),
    ]
    mp3s = [encode_mp3_fixture(12), encode_mp3_fixture(4, kbps=64, sample_rate=32000, id3=False)]
    from magictables_spark.operators.media_codecs import encode_mp3_audio_fixture

    def _bv_spec(gidx, ch, _ws):
        return {"block_type": 0, "subblock_gain": [0, 0, 0],
                "lines": [(14, 0, 1)], "scf": {0: 3, 14: 2},
                "big_lines": [(0, 14), (1, -7), (2, 0), (3, 15), (4, -1)]}

    l3s = [
        encode_mp3_audio_fixture(n_frames=4, channels=1),
        encode_mp3_audio_fixture(n_frames=4, channels=2, with_short=True,
                                 count1_table="B", sample_rate=48000, kbps=160),
        # round 10: big-values regions (non-ESC + ESC/linbits tables)
        # and MPEG-2 LSF frames join the fuzz corpus — the new decode
        # paths (pair Huffman, linbits escapes, LSF side info +
        # scalefactor sizing) face the same mutation contract
        encode_mp3_audio_fixture(n_frames=3, spec_fn=_bv_spec, big_table=13),
        encode_mp3_audio_fixture(n_frames=3, spec_fn=_bv_spec, big_table=19),
        encode_mp3_audio_fixture(n_frames=3, kbps=64, sample_rate=22050,
                                 version=2),
        encode_mp3_audio_fixture(n_frames=3, kbps=64, sample_rate=24000,
                                 version=2, spec_fn=_bv_spec, big_table=21),
        encode_mp3_audio_fixture(n_frames=3, channels=2, joint_ms=True),
        # round 11: intensity joint stereo joins the corpus — pure IS
        # (MPEG-1 and LSF with both io scales) and MS+IS, so the
        # position/illegal-marker/bound paths face the mutation
        # contract too
        encode_mp3_audio_fixture(n_frames=3, channels=2, joint_is=True),
        encode_mp3_audio_fixture(n_frames=3, channels=2, joint_ms=True,
                                 joint_is=True),
        encode_mp3_audio_fixture(n_frames=3, channels=2, kbps=64,
                                 sample_rate=22050, version=2,
                                 joint_is=True, lsf_intensity_scale=1),
    ]
    mp4s = [encode_mp4_fixture(5.0), encode_mp4_fixture(2.0, video=None)]
    _t = np.arange(12000) / 48000.0
    mp2s = [
        encode_mpeg1_fixture(0.5 * np.sin(2 * np.pi * 440 * _t), layer=2,
                             kbps=192, sample_rate=48000, channels=2),
        encode_mpeg1_fixture(0.4 * np.sin(2 * np.pi * 900 * _t), layer=1,
                             kbps=192, sample_rate=48000, channels=1),
    ]
    for trial in range(800):
        kind = rng.random()
        if kind < 0.2:
            data, dec, mime = bytearray(rng.choice(pngs)), decode_png, "image/png"
        elif kind < 0.36:
            data, dec, mime = bytearray(rng.choice(bmps)), decode_bmp, "image/bmp"
        elif kind < 0.5:
            data, dec, mime = bytearray(rng.choice(wavs)), decode_wav, "audio/wav"
        elif kind < 0.66:
            data, dec, mime = bytearray(rng.choice(jpgs)), decode_jpeg, "image/jpeg"
        elif kind < 0.74:
            data, dec, mime = bytearray(rng.choice(mp3s)), decode_mp3_meta, "audio/mpeg"
        elif kind < 0.82:
            # full Layer I/II/III PCM decode over mutated streams: same
            # contract — UnsupportedMediaError or finite stats, never
            # an escaping exception
            pool = mp2s if rng.random() < 0.5 else l3s
            data, dec, mime = bytearray(rng.choice(pool)), decode_mpeg1_audio, "audio/mpeg"
        elif kind < 0.9:
            data, dec, mime = bytearray(rng.choice(mp4s)), decode_mp4_meta, "video/mp4"
        else:
            data = bytearray(rng.randbytes(rng.randint(0, 200)))
            dec, mime = (
                (decode_png, "image/png") if rng.random() < 0.5 else (decode_wav, "audio/wav")
            )
        blob = _mutate(rng, data, rng.randint(0, 12))
        for fn in (lambda: dec(blob), lambda: media_features(blob, mime, 8)):
            try:
                out = fn()
            except UnsupportedMediaError:
                continue
            # successful decodes must also yield finite stats (no NaN
            # leaking into feature columns from degenerate geometry)
            vals = out if isinstance(out, list) else list(out.values())
            for v in vals:
                if isinstance(v, float):
                    assert np.isfinite(v)

"""Pure-stdlib media codecs for the multimodal column pipeline.

Real decoders for the three formats that need no external library:

- **WAV** (RIFF PCM) via the stdlib ``wave`` module + numpy: channel
  count, sample rate, duration, RMS/peak amplitude, zero-crossing rate.
- **PNG** via ``struct`` + ``zlib`` + numpy: IHDR geometry, full
  scanline unfiltering (filter types 0-4), per-image pixel mean/std.
  Supports 8-bit depth, non-interlaced, color types 0 (gray), 2 (RGB),
  4 (gray+alpha) and 6 (RGBA) — the overwhelming majority of real PNGs;
  anything else raises ``UnsupportedMediaError`` which the feature
  kernel converts to ``ok=False`` (a 100 TB job must skip, not die).
- **BMP** (uncompressed BITMAPINFOHEADER, 24/32 bpp BI_RGB) via
  ``struct`` + numpy: geometry, bottom-up/top-down row order, 4-byte
  row alignment, per-image pixel mean/std; palettized/compressed
  variants refuse with ``UnsupportedMediaError``.

Matching deterministic **encoders** exist so fixtures can be generated
without any media library: ``encode_png`` (filter 0 scanlines),
``encode_wav`` (16-bit PCM) and ``encode_bmp`` (24-bpp BI_RGB). ``ensure_media_fixture_dir`` materializes
a small deterministic corpus of both — used by the ``multimodal_features``
query and the unit tests.

- **JPEG** (baseline sequential DCT **and** progressive, ITU-T T.81)
  via ``struct`` + numpy: segment parse, canonical Huffman entropy
  decode, dequantize, zig-zag de-scan, float IDCT, chroma upsampling
  (4:4:4/4:2:2/4:2:0), DRI/RSTn restart resync, YCbCr->RGB, per-image
  pixel mean/std. Progressive (SOF2, Annex G) decodes the full scan
  script — spectral selection, successive approximation (DC and AC
  first + refinement scans), EOB runs — through the same
  coefficient-domain path as baseline. Arithmetic / 12-bit /
  lossless / hierarchical files refuse with ``UnsupportedMediaError``.
  Matching ENCODERS (``encode_jpeg``: FDCT + Annex K tables;
  ``encode_jpeg_progressive``: the libjpeg-style 10-scan script with
  per-scan flat Huffman tables) generate fixtures; the decoder reads
  all tables from the file, never Annex K.

Formats that genuinely require a codec library (MP3, MP4 full decode)
are rejected with ``UnsupportedMediaError``; the Arrow-batched kernel
in ``multimodal.py`` is the boundary where ffmpeg would plug in. The
pure-Python JPEG entropy loop favors correctness over throughput — at
production scale the same kernel boundary is where libjpeg-turbo/PIL
slots in with identical semantics.

Reference parity: the reference repo has NO media handling at all —
this whole module is part of the mandated large-scale-pipeline
extension (SURVEY.md §2.C multimodal columns).
"""

from __future__ import annotations

import math
import os
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedMediaError(ValueError):
    """Raised for media the pure-stdlib decoders cannot handle."""


# mimes whose featurization MAY be container METADATA (header/box
# parse) rather than sample decode — the multimodal kernel surfaces
# per-file provenance as decoded=False. Since round 9, audio/mpeg
# decodes ALL THREE MPEG-1 layers to PCM (decode_mpeg1_audio; Layer
# III within the carried Huffman-table subset — see the Layer III
# section comment; MS and long-block intensity joint stereo decode);
# only short-block intensity streams and uncarried tables fall back
# to metadata. media_features_ex reports which path a file took.
METADATA_ONLY_MIMES = frozenset({"audio/mpeg", "video/mp4"})


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def decode_png(data: bytes, keep_pixels: bool = False) -> dict:
    """Parse a PNG: geometry from IHDR, pixels from the unfiltered IDAT
    stream. Returns width/height/bit_depth/channels + pixel mean/std
    (0-255 scale, over all channels)."""
    if len(data) < 8 or data[:8] != PNG_SIG:
        raise UnsupportedMediaError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    width = height = bit_depth = color_type = interlace = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if len(chunk) != 13:  # fuzz-found: truncated IHDR -> struct.error
                raise UnsupportedMediaError(f"PNG IHDR truncated ({len(chunk)} bytes)")
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise UnsupportedMediaError("PNG missing IHDR")
    if bit_depth != 8:
        raise UnsupportedMediaError(f"unsupported PNG bit depth {bit_depth}")
    if interlace != 0:
        raise UnsupportedMediaError("interlaced PNG unsupported")
    if color_type not in _CHANNELS_BY_COLOR_TYPE:
        raise UnsupportedMediaError(f"unsupported PNG color type {color_type}")
    if width == 0 or height == 0:  # zero-dim "image": stats are undefined
        raise UnsupportedMediaError(f"degenerate PNG geometry {width}x{height}")
    channels = _CHANNELS_BY_COLOR_TYPE[color_type]

    try:
        # corrupt IDAT must surface as UnsupportedMediaError (the
        # per-file skip contract), not a raw zlib.error that fails the
        # whole Spark task
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise UnsupportedMediaError(f"PNG IDAT inflate failed: {e}") from e
    stride = width * channels  # bytes per scanline at bit depth 8
    if len(raw) != height * (stride + 1):
        raise UnsupportedMediaError("PNG pixel data length mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up
            line += prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            li = line.astype(np.int32)
            pi = prev.astype(np.int32)
            for x in range(stride):
                a = li[x - bpp] if x >= bpp else 0
                b = pi[x]
                if ftype == 1:
                    li[x] = (li[x] + a) & 0xFF
                elif ftype == 3:
                    li[x] = (li[x] + ((a + b) >> 1)) & 0xFF
                else:  # Paeth
                    c = pi[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    li[x] = (li[x] + pred) & 0xFF
            line = li.astype(np.uint8)
        else:
            raise UnsupportedMediaError(f"unsupported PNG filter type {ftype}")
        out[y] = line
        prev = line

    pixels = out.reshape(height, width, channels).astype(np.float64)
    return {
        "kind": "image",
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bit_depth),
        "channels": int(channels),
        "pixel_mean": float(pixels.mean()),
        "pixel_std": float(pixels.std()),
        **({"pixels": pixels} if keep_pixels else {}),
    }


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG encoder: 8-bit gray (H, W) or RGB/RGBA (H, W, C),
    filter type 0 on every scanline."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def decode_wav(data: bytes, keep_samples: bool = False) -> dict:
    """Parse a RIFF/WAV via the stdlib ``wave`` module; amplitude stats
    from numpy over the PCM frames (16- or 8-bit)."""
    import io
    import wave

    try:
        # fuzz-found: corrupt RIFF headers escape wave.open as bare
        # RuntimeError / struct.error / ValueError, not just wave.Error —
        # any of them must become the per-file skip, not a task failure
        with wave.open(io.BytesIO(data), "rb") as w:
            channels = w.getnchannels()
            rate = w.getframerate()
            n_frames = w.getnframes()
            width = w.getsampwidth()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError, struct.error, RuntimeError, ValueError, IndexError) as exc:
        raise UnsupportedMediaError(f"not a decodable WAV: {exc}") from exc
    if width == 2:
        if len(frames) % 2:  # fuzz-found: odd PCM byte count -> frombuffer ValueError
            raise UnsupportedMediaError("WAV 16-bit frame data has odd byte length")
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise UnsupportedMediaError(f"unsupported WAV sample width {width}")
    duration = n_frames / rate if rate else 0.0
    if samples.size:
        rms = float(np.sqrt(np.mean(samples**2)))
        peak = float(np.max(np.abs(samples)))
        # diff of a 1-sample stream is empty -> NaN mean; a single
        # sample has no crossings by definition
        zcr = (
            float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
            if samples.size > 1
            else 0.0
        )
    else:
        rms = peak = zcr = 0.0
    return {
        "kind": "audio",
        "channels": int(channels),
        "sample_rate": int(rate),
        "n_frames": int(n_frames),
        "duration_sec": float(duration),
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zcr,
        **({"samples": samples, } if keep_samples else {}),
    }


def encode_wav(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal WAV encoder: float samples in [-1, 1] -> 16-bit PCM."""
    import io
    import wave

    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# feature extraction + deterministic fixtures
# ---------------------------------------------------------------------------


def media_features(content: bytes, mime: str, dim: int) -> list[float]:
    """Decode by mime and project the typed metadata into a fixed-dim
    float vector (padded with zeros / truncated to ``dim``). Raises
    UnsupportedMediaError for formats needing a codec library — the
    kernel maps that to ok=False."""
    return media_features_ex(content, mime, dim)[0]


def media_features_ex(content: bytes, mime: str, dim: int) -> tuple[list[float], bool]:
    """media_features plus per-file decode provenance: True when the
    features come from SAMPLE decode (pixels/PCM), False when from
    container metadata (Layer III / LSF audio, MP4 boxes)."""
    decoded = True
    if mime == "image/png":
        m = decode_png(content)
        vec = [
            1.0,  # modality tag: image
            float(m["width"]),
            float(m["height"]),
            float(m["channels"]),
            m["pixel_mean"] / 255.0,
            m["pixel_std"] / 255.0,
            float(m["bit_depth"]),
        ]
    elif mime in ("image/bmp", "image/x-ms-bmp"):
        m = decode_bmp(content)
        vec = [
            1.0,  # modality tag: image
            float(m["width"]),
            float(m["height"]),
            float(m["channels"]),
            m["pixel_mean"] / 255.0,
            m["pixel_std"] / 255.0,
            float(m["bit_depth"]),
        ]
    elif mime == "image/jpeg":
        m = decode_jpeg(content)
        vec = [
            1.0,  # modality tag: image
            float(m["width"]),
            float(m["height"]),
            float(m["channels"]),
            m["pixel_mean"] / 255.0,
            m["pixel_std"] / 255.0,
            float(m["bit_depth"]),
        ]
    elif mime in ("audio/wav", "audio/x-wav"):
        m = decode_wav(content)
        vec = [
            2.0,  # modality tag: audio
            float(m["channels"]),
            float(m["sample_rate"]) / 48000.0,
            m["duration_sec"],
            m["rms"],
            m["peak"],
            m["zero_crossing_rate"],
        ]
    elif mime == "audio/mpeg":
        # MPEG-1 Layer I/II/III: FULL PCM decode (decoded=True) -> the
        # same rms/peak/zcr features WAV gets; short-block intensity
        # stereo / uncarried Layer III Huffman tables fall back to the
        # frame-header metadata walk (decoded=False)
        m = decode_mpeg_audio(content)
        decoded = bool(m["decoded"])
        if m["decoded"]:
            vec = [
                2.0,  # modality tag: audio
                float(m["channels"]),
                float(m["sample_rate"]) / 48000.0,
                m["duration_sec"],
                m["rms"],
                m["peak"],
                m["zero_crossing_rate"],
            ]
        else:
            vec = [
                2.0,  # modality tag: audio
                float(m["channels"]),
                float(m["sample_rate"]) / 48000.0,
                m["duration_sec"],
                m["bitrate_kbps"] / 320.0,
                float(m["n_frames"]),
                float(m["layer"]),
            ]
    elif mime == "video/mp4":
        # metadata-only (decoded=False): ISO-BMFF box walk, no frames
        m = decode_mp4_meta(content)
        decoded = False
        vec = [
            3.0,  # modality tag: video
            float(m["n_tracks"]),
            m["duration_sec"],
            m["width"],
            m["height"],
            1.0 if m["has_video"] else 0.0,
            1.0 if m["has_audio"] else 0.0,
        ]
    else:
        raise UnsupportedMediaError(f"no pure-stdlib decoder for {mime}")
    vec = vec[:dim]
    return vec + [0.0] * (dim - len(vec)), decoded


def ensure_media_fixture_dir(
    media_dir: str, n_png: int = 8, n_wav: int = 8, n_bmp: int = 4, n_jpg: int = 6,
    n_mp3: int = 3, n_mp4: int = 2, n_mp2: int = 3,
) -> str:
    """Materialize a deterministic media corpus (idempotent: skipped if
    already present). PNGs are seeded gradient/checker patterns, WAVs
    are seeded sine mixtures, JPEGs rotate through gray/4:4:4/4:2:0, a
    restart-interval variant, and two progressive (SOF2) variants, plus
    one deliberately corrupt file per modality to exercise the ok=False
    path."""
    marker = os.path.join(media_dir, ".complete")
    if os.path.exists(marker):
        return media_dir
    os.makedirs(media_dir, exist_ok=True)
    for i in range(n_png):
        w, h = 16 + 4 * i, 12 + 2 * i
        yy, xx = np.mgrid[0:h, 0:w]
        r = (xx * (i + 1)) % 256
        g = (yy * (i + 2)) % 256
        b = ((xx + yy) * (i + 3)) % 256
        arr = np.stack([r, g, b], axis=-1).astype(np.uint8)
        with open(os.path.join(media_dir, f"img_{i:03d}.png"), "wb") as f:
            f.write(encode_png(arr))
    for i in range(n_bmp):
        w, h = 10 + 3 * i, 8 + 2 * i
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack(
            [(xx * 7 + i) % 256, (yy * 11 + i) % 256, ((xx ^ yy) + i) % 256], axis=-1
        ).astype(np.uint8)
        with open(os.path.join(media_dir, f"img_{i:03d}.bmp"), "wb") as f:
            f.write(encode_bmp(arr))
    for i in range(n_wav):
        rate = 8000
        t = np.arange(0, rate // 4) / rate  # 250 ms
        freq = 220.0 * (i + 1)
        samples = 0.5 * np.sin(2 * math.pi * freq * t) + 0.25 * np.sin(
            2 * math.pi * 2 * freq * t
        )
        with open(os.path.join(media_dir, f"snd_{i:03d}.wav"), "wb") as f:
            f.write(encode_wav(samples, rate=rate))
    for i in range(n_jpg):
        w, h = 21 + 5 * i, 15 + 3 * i  # deliberately non-multiple-of-8
        yy, xx = np.mgrid[0:h, 0:w]
        if i % 3 == 0:  # grayscale
            arr = ((xx * 9 + yy * 5 + i * 17) % 256).astype(np.uint8)
        else:
            arr = np.stack(
                [(xx * 7 + i) % 256, (yy * 13 + 2 * i) % 256, ((xx + yy) * 3 + i) % 256],
                axis=-1,
            ).astype(np.uint8)
        if i in (1, 3):  # progressive variants (SOF2): one RGB, one gray
            data = encode_jpeg_progressive(
                arr, quality=80 + 3 * i, subsample="444" if arr.ndim == 2 else "420"
            )
        else:
            data = encode_jpeg(
                arr,
                quality=80 + 3 * i,
                subsample="420" if i % 3 == 2 else "444",
                restart_interval=3 if i == 4 else 0,
            )
        with open(os.path.join(media_dir, f"img_{i:03d}.jpg"), "wb") as f:
            f.write(data)
    for i in range(n_mp3):
        data = encode_mp3_fixture(
            n_frames=20 + 9 * i,
            kbps=[128, 192, 64][i % 3],
            sample_rate=[44100, 48000, 32000][i % 3],
            channels=2 if i % 2 == 0 else 1,
            id3=i % 2 == 0,
        )
        with open(os.path.join(media_dir, f"clip_{i:03d}.mp3"), "wb") as f:
            f.write(data)
    # REAL MPEG-1 Layer III audio: sparse count1-painted spectra (one
    # long-block/table-A mono clip, one short-block/table-B stereo
    # clip) — the full Layer III PCM decode path (decoded=True)
    l3_specs = [
        dict(n_frames=10, kbps=128, sample_rate=44100, channels=1,
             with_short=False, count1_table="A"),
        dict(n_frames=8, kbps=160, sample_rate=48000, channels=2,
             with_short=True, count1_table="B"),
    ]
    for i, kw in enumerate(l3_specs):
        with open(os.path.join(media_dir, f"clip_l3_{i:03d}.mp3"), "wb") as f:
            f.write(encode_mp3_audio_fixture(**kw))
    for i in range(n_mp2):
        # REAL MPEG-1 Layer I/II audio: sine mixtures through the
        # analysis filterbank -> quantized frames -> decode_mpeg1_audio
        # round-trips these to PCM (decoded=True in the kernel)
        sr = [48000, 44100, 48000][i % 3]
        t = np.arange(sr // 2) / sr  # 500 ms
        samples = 0.5 * np.sin(2 * math.pi * 330.0 * (i + 1) * t) + 0.2 * np.sin(
            2 * math.pi * 2500.0 * t
        )
        data = encode_mpeg1_fixture(
            samples,
            layer=1 if i == 2 else 2,
            kbps=192 if i == 2 else [192, 128][i % 2],
            sample_rate=sr,
            channels=2 if i % 2 == 0 else 1,
        )
        with open(os.path.join(media_dir, f"clip_{i:03d}.mp2"), "wb") as f:
            f.write(data)
    for i in range(n_mp4):
        data = encode_mp4_fixture(
            duration_sec=3.5 + 2 * i,
            video=(320 * (i + 1), 180 * (i + 1), b"avc1") if i % 2 == 0 else None,
            audio=b"mp4a",
        )
        with open(os.path.join(media_dir, f"clip_{i:03d}.mp4"), "wb") as f:
            f.write(data)
    with open(os.path.join(media_dir, "broken_003.mp3"), "wb") as f:
        f.write(b"ID3\x04\x00\x00\x00\x00\x00\x05nope")
    with open(os.path.join(media_dir, "broken_004.mp4"), "wb") as f:
        f.write(b"\x00\x00\x00\x08ftypcorrupt")
    with open(os.path.join(media_dir, "broken_000.png"), "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    with open(os.path.join(media_dir, "broken_001.wav"), "wb") as f:
        f.write(b"RIFFxxxxWAVE")
    with open(os.path.join(media_dir, "broken_002.jpg"), "wb") as f:
        f.write(b"\xff\xd8\xff\xdbnot really a jpeg")
    with open(marker, "w") as f:
        f.write("ok")
    return media_dir


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

_BMP_MAX_PIXELS = 1 << 26  # 64M px: refuse header-driven memory bombs


def decode_bmp(data: bytes, keep_pixels: bool = False) -> dict:
    """Parse an uncompressed Windows BMP (BITMAPINFOHEADER, 24/32 bpp,
    BI_RGB): geometry from the DIB header, per-image pixel mean/std
    over the BGR(A) rows (4-byte-aligned, bottom-up unless height is
    negative). Palettized/compressed/OS2 variants raise
    UnsupportedMediaError — skip, not die."""
    if len(data) < 54 or data[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP (bad signature or truncated)")
    (offset,) = struct.unpack_from("<I", data, 10)
    (dib_size,) = struct.unpack_from("<I", data, 14)
    if dib_size < 40:
        raise UnsupportedMediaError(f"unsupported BMP DIB header size {dib_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise UnsupportedMediaError(f"compressed BMP unsupported (method {compression})")
    if bpp not in (24, 32):
        raise UnsupportedMediaError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0 or width * height > _BMP_MAX_PIXELS:
        raise UnsupportedMediaError(f"degenerate BMP geometry {width}x{height}")
    channels = bpp // 8
    stride = ((width * channels + 3) // 4) * 4
    need = offset + stride * height
    if need > len(data):
        raise UnsupportedMediaError("BMP pixel data truncated")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=offset)
    rows = rows.reshape(height, stride)[:, : width * channels]
    pixels = rows.reshape(height, width, channels).astype(np.float64)
    if not top_down:
        pixels = pixels[::-1]
    # the file stores BGR(A); emit RGB(A) -- decode_png's contract.
    # channel-symmetric stats never exposed the order; keep_pixels
    # consumers (pHash luma) do.
    if channels >= 3:
        pixels = pixels[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]
    return {
        "kind": "image",
        "width": int(width),
        "height": int(height),
        "bit_depth": 8,
        "channels": int(channels),
        "pixel_mean": float(pixels.mean()),
        "pixel_std": float(pixels.std()),
        **({"pixels": pixels} if keep_pixels else {}),
    }


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal BMP encoder: 8-bit RGB (H, W, 3) -> 24-bpp BI_RGB,
    bottom-up rows padded to 4 bytes (stored BGR per the format)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    height, width, _ = arr.shape
    bgr = arr[:, :, ::-1]
    stride = ((width * 3 + 3) // 4) * 4
    pad = b"\x00" * (stride - width * 3)
    body = b"".join(bgr[y].tobytes() + pad for y in range(height - 1, -1, -1))
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return file_header + dib + body


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81)
# ---------------------------------------------------------------------------
# Decoder: SOI/APPn/DQT/SOF0+SOF1/DHT/DRI/SOS segment parse, canonical
# Huffman entropy decode (spec F.2.2.3 DECODE), dequantize, zig-zag
# de-scan, float IDCT via the orthonormal 8-point DCT-II basis, chroma
# upsample, YCbCr->RGB. Baseline (SOF0/SOF1) and progressive (SOF2,
# T.81 Annex G: spectral selection + successive approximation, DC/AC
# first and refinement scans, EOB runs) both decode through one
# coefficient-domain path: scans accumulate into per-component
# coefficient arrays, then one shared render step dequantizes + IDCTs.
# Arithmetic / 12-bit / hierarchical files refuse with
# UnsupportedMediaError — skip, not die. The decoder reads ALL tables
# from the file (DQT/DHT segments); the spec Annex K tables below are
# used only by the fixture ENCODER.

_JPEG_MAX_PIXELS = 1 << 26  # 64M px: refuse header-driven memory bombs


def _zigzag_order() -> list[int]:
    """Zig-zag scan order derived from the diagonal walk (T.81 Fig. 5)
    rather than pasted: entry i = raster index of the i-th coefficient."""
    pts: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(r, s - r) for r in range(s + 1) if r < 8 and s - r < 8]
        if s % 2 == 0:
            diag.reverse()
        pts.extend(diag)
    return [r * 8 + c for r, c in pts]


_ZZ = _zigzag_order()


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: forward F = A @ f @ A.T,
    inverse f = A.T @ F @ A."""
    n = np.arange(8)
    a = np.sqrt(2.0 / 8.0) * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    a[0] /= np.sqrt(2.0)
    return a


_DCT_A = _dct_basis()


class _ScanReader:
    """MSB-first bit reader over the entropy-coded segment, undoing the
    0xFF00 byte stuffing; any bare marker inside the scan is corruption
    (restarts are consumed explicitly via expect_rst)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise UnsupportedMediaError("JPEG scan truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise UnsupportedMediaError(
                        f"unexpected marker 0xFF{-1 if nxt is None else nxt:02X} inside scan"
                    )
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def expect_rst(self, m: int) -> None:
        self.nbits = 0  # restart markers are byte-aligned
        if self.data[self.pos : self.pos + 2] != bytes((0xFF, 0xD0 + (m & 7))):
            raise UnsupportedMediaError("missing/garbled JPEG restart marker")
        self.pos += 2


def _huff_decode_table(bits: list[int], vals: bytes):
    """Canonical-code decode tables (T.81 F.2.2.3): per code length l,
    mincode/maxcode and the index of its first symbol."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        mincode[length] = code
        valptr[length] = k
        if bits[length - 1]:
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, vals


def _huff_decode(r: _ScanReader, table) -> int:
    mincode, maxcode, valptr, vals = table
    code = r.bit()
    length = 1
    while code > maxcode[length]:
        length += 1
        if length > 16:
            raise UnsupportedMediaError("invalid Huffman code in JPEG scan")
        code = (code << 1) | r.bit()
    return vals[valptr[length] + code - mincode[length]]


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to a signed value."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _decode_block(r: _ScanReader, dc_tab, ac_tab, pred: int):
    """One 8x8 block -> (zigzag-order int coefficients, new DC pred)."""
    s = _huff_decode(r, dc_tab)
    if s > 15:
        raise UnsupportedMediaError("invalid JPEG DC category")
    dc = pred + (_extend(r.receive(s), s) if s else 0)
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _huff_decode(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise UnsupportedMediaError("JPEG AC run past block end")
        zz[k] = _extend(r.receive(size), size)
        k += 1
    return zz, dc


def _decode_dc_first(r: _ScanReader, dc_tab, pred: int, al: int, zz) -> int:
    """Progressive DC first scan (T.81 G.2): diff-coded at reduced
    precision Al; the stored coefficient is the shifted approximation.
    Returns the new predictor (kept in the shifted-down domain)."""
    s = _huff_decode(r, dc_tab)
    if s > 15:
        raise UnsupportedMediaError("invalid JPEG DC category")
    pred += _extend(r.receive(s), s) if s else 0
    zz[0] = pred << al
    return pred


def _decode_dc_refine(r: _ScanReader, al: int, zz) -> None:
    """Progressive DC refinement: one raw bit per block, ORed into bit
    Al of the two's-complement coefficient (works for negative DC)."""
    if r.bit():
        zz[0] |= 1 << al


def _decode_ac_first(r: _ScanReader, ac_tab, zz, ss, se, al, eobrun) -> int:
    """Progressive AC first scan for one block (T.81 G.2): run/size
    coding of the band [Ss..Se] at precision Al, plus EOBn end-of-band
    runs that span whole blocks. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run != 15:
                eobrun = (1 << run) - 1
                if run:
                    eobrun += r.receive(run)
                return eobrun
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise UnsupportedMediaError("JPEG AC run past spectral band end")
        zz[k] = _extend(r.receive(size), size) << al
        k += 1
    return 0


def _decode_ac_refine(r: _ScanReader, ac_tab, zz, ss, se, al, eobrun) -> int:
    """Progressive AC refinement for one block (T.81 G.2, Figure G.7
    semantics): newly-significant coefficients arrive as run/1 symbols
    with a sign bit; every already-nonzero coefficient passed on the
    walk reads one correction bit; an EOB run covers whole blocks whose
    remaining nonzero coefficients still read correction bits. Returns
    the remaining EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, ac_tab)
            run, size = rs >> 4, rs & 0x0F
            newval = 0
            if size == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += r.receive(run)
                    break  # rest of this block handled by the EOB walk
                # run == 15: ZRL — pass 16 zero-history coefficients
            else:
                if size != 1:
                    raise UnsupportedMediaError("invalid JPEG AC refinement size")
                newval = p1 if r.bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if r.bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the remainder of the block
            if zz[k] != 0:
                if r.bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(data: bytes, keep_pixels: bool = False) -> dict:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) Huffman
    JPEG: geometry + per-image pixel mean/std on the 0-255 RGB (or
    gray) scale, same contract as decode_png/decode_bmp. Handles
    4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, 16-bit DQT precision,
    DRI/RSTn restart intervals, and progressive scan scripts (spectral
    selection + successive approximation, T.81 Annex G)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}  # id -> 64 values, ZIGZAG order
    huff: dict[tuple[int, int], tuple] = {}  # (class, id) -> decode table
    frame = None
    coeffs: dict[int, np.ndarray] | None = None  # cid -> (bh, bw, 64) zigzag
    restart_interval = 0
    n_scans = 0
    saw_eoi = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise UnsupportedMediaError("lost JPEG marker sync")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if pos + 2 > len(data):
            raise UnsupportedMediaError("JPEG segment header truncated")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(data):
            raise UnsupportedMediaError("JPEG segment length out of range")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    if i + 64 > len(seg):
                        raise UnsupportedMediaError("JPEG DQT truncated")
                    qt[tq] = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                elif pq == 1:
                    if i + 128 > len(seg):
                        raise UnsupportedMediaError("JPEG DQT truncated")
                    qt[tq] = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                else:
                    raise UnsupportedMediaError(f"invalid JPEG DQT precision {pq}")
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential Huffman / progressive
            if frame is not None:
                raise UnsupportedMediaError("multiple JPEG frames")
            if len(seg) < 6:
                raise UnsupportedMediaError("JPEG SOF truncated")
            precision = seg[0]
            if precision != 8:
                raise UnsupportedMediaError(f"unsupported JPEG precision {precision}")
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise UnsupportedMediaError(f"unsupported JPEG component count {nc}")
            if width == 0 or height == 0 or width * height > _JPEG_MAX_PIXELS:
                raise UnsupportedMediaError(f"degenerate JPEG geometry {width}x{height}")
            if len(seg) < 6 + 3 * nc:
                raise UnsupportedMediaError("JPEG SOF truncated")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise UnsupportedMediaError(f"invalid JPEG sampling {h}x{v}")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            frame = {
                "width": width,
                "height": height,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            # coefficient store over the MCU-padded grid, accumulated
            # across scans (zigzag order; zero until a scan writes it)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            coeffs = {
                c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
                for c in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(
                f"lossless/arithmetic/hierarchical JPEG unsupported (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise UnsupportedMediaError("JPEG DHT truncated")
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(seg):
                    raise UnsupportedMediaError("JPEG DHT truncated")
                huff[(tc, th)] = _huff_decode_table(bits, seg[i + 17 : i + 17 + n])
                i += 17 + n
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise UnsupportedMediaError("JPEG DRI truncated")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise UnsupportedMediaError("JPEG SOS before SOF")
            n_scans += 1
            if n_scans > 100:
                raise UnsupportedMediaError("too many JPEG scans")
            ns = seg[0] if seg else 0
            if ns < 1 or len(seg) < 1 + 2 * ns + 3:
                raise UnsupportedMediaError("JPEG SOS malformed")
            scan = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next((c for c in frame["comps"] if c["id"] == cs), None)
                if comp is None:
                    raise UnsupportedMediaError("JPEG SOS names unknown component")
                if comp["tq"] not in qt:
                    raise UnsupportedMediaError(f"JPEG references missing DQT {comp['tq']}")
                scan.append((comp, (0, tda >> 4), (1, tda & 0x0F)))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if frame["progressive"]:
                if not (ss <= se <= 63 and al <= 13 and ah in (0, al + 1)):
                    raise UnsupportedMediaError("invalid JPEG progressive scan header")
                if ss == 0 and se != 0:
                    raise UnsupportedMediaError("progressive DC scan must have Se=0")
                if ss > 0 and ns != 1:
                    raise UnsupportedMediaError("progressive AC scan must be single-component")
            elif ns != len(frame["comps"]) or (ss, se, ah, al) != (0, 63, 0, 0):
                raise UnsupportedMediaError("JPEG SOS malformed (expect one interleaved scan)")
            pos = _decode_scan_coeffs(
                data, pos + seglen, frame, scan, coeffs, huff,
                restart_interval, ss, se, ah, al,
            )
            if not frame["progressive"]:
                break
            continue
        pos += seglen
    if frame is None or n_scans == 0:
        raise UnsupportedMediaError("JPEG has no decodable scan")
    if frame["progressive"] and not saw_eoi:
        # a partial progressive render is valid for a VIEWER, but
        # feature stats from half the scans would be silently wrong
        raise UnsupportedMediaError("progressive JPEG truncated before EOI")
    return _render_jpeg(frame, coeffs, qt, keep_pixels)


def _decode_scan_coeffs(
    data, pos, frame, scan, coeffs, huff, restart_interval, ss, se, ah, al
):
    """Entropy-decode one (sequential or progressive) scan into the
    per-component coefficient arrays; returns the offset of the marker
    that terminates the scan. Restart markers reset DC predictors AND
    the EOB run. Interleaved scans walk MCUs over the padded grid;
    single-component scans walk the component's own ceil(dims/8) block
    grid (T.81 A.2.2), which for subsampled frames is a strict subset
    of the padded grid — padding blocks simply keep zero AC."""
    width, height = frame["width"], frame["height"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    progressive = frame["progressive"]
    tabs = {}
    for comp, dc_key, ac_key in scan:
        dc_tab = ac_tab = None
        if (not progressive) or (ss == 0 and ah == 0):
            if dc_key not in huff:
                raise UnsupportedMediaError("JPEG references missing DHT")
            dc_tab = huff[dc_key]
        if (not progressive) or ss > 0:
            if ac_key not in huff:
                raise UnsupportedMediaError("JPEG references missing DHT")
            ac_tab = huff[ac_key]
        tabs[comp["id"]] = (dc_tab, ac_tab)
    reader = _ScanReader(data, pos)
    interleaved = len(scan) > 1
    if interleaved:
        nunits = mcux * mcuy
    else:
        comp0 = scan[0][0]
        bw = -(-(-(-width * comp0["h"] // hmax)) // 8)
        bh = -(-(-(-height * comp0["v"] // vmax)) // 8)
        nunits = bw * bh
    preds = {c["id"]: 0 for c, _, _ in scan}
    eobrun = 0
    rst = 0
    for u in range(nunits):
        if restart_interval and u and u % restart_interval == 0:
            reader.expect_rst(rst)
            rst = (rst + 1) & 7
            preds = {k: 0 for k in preds}
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            for comp, _dc, _ac in scan:
                cid = comp["id"]
                dc_tab, ac_tab = tabs[cid]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = coeffs[cid][my * comp["v"] + by, mx * comp["h"] + bx]
                        if not progressive:
                            blk, preds[cid] = _decode_block(
                                reader, dc_tab, ac_tab, preds[cid]
                            )
                            zz[:] = blk
                        elif ah == 0:
                            preds[cid] = _decode_dc_first(
                                reader, dc_tab, preds[cid], al, zz
                            )
                        else:
                            _decode_dc_refine(reader, al, zz)
        else:
            comp, _dc, _ac = scan[0]
            cid = comp["id"]
            dc_tab, ac_tab = tabs[cid]
            by, bx = divmod(u, bw)
            zz = coeffs[cid][by, bx]
            if not progressive:
                blk, preds[cid] = _decode_block(reader, dc_tab, ac_tab, preds[cid])
                zz[:] = blk
            elif ss == 0:
                if ah == 0:
                    preds[cid] = _decode_dc_first(reader, dc_tab, preds[cid], al, zz)
                else:
                    _decode_dc_refine(reader, al, zz)
            elif ah == 0:
                eobrun = _decode_ac_first(reader, ac_tab, zz, ss, se, al, eobrun)
            else:
                eobrun = _decode_ac_refine(reader, ac_tab, zz, ss, se, al, eobrun)
    # skip entropy pad bits to the marker that terminates the scan
    p = reader.pos
    while p + 1 < len(data) and not (data[p] == 0xFF and data[p + 1] != 0x00):
        p += 1
    if p + 1 >= len(data):
        raise UnsupportedMediaError("JPEG scan not terminated by a marker")
    return p


def _render_jpeg(frame, coeffs, qt, keep_pixels=False):
    """Shared render step for sequential and progressive paths:
    dequantize + de-zigzag every block of each component at once,
    batched IDCT (broadcast 8-point transforms over the whole block
    grid), crop to true dims, integer-upsample chroma, color-convert."""
    width, height = frame["width"], frame["height"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    full = []
    for comp in frame["comps"]:
        if comp["tq"] not in qt:
            raise UnsupportedMediaError(f"JPEG references missing DQT {comp['tq']}")
        c = coeffs[comp["id"]]
        bh, bw = c.shape[0], c.shape[1]
        raster = np.zeros((bh, bw, 64))
        raster[:, :, _ZZ] = c * qt[comp["tq"]]  # dequant + de-zigzag
        blocks = raster.reshape(bh, bw, 8, 8)
        spatial = _DCT_A.T @ blocks @ _DCT_A + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        cw = -(-width * comp["h"] // hmax)
        ch = -(-height * comp["v"] // vmax)
        p = plane[:ch, :cw]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry * comp["v"] != vmax or rx * comp["h"] != hmax:
            raise UnsupportedMediaError("non-integer JPEG chroma upsampling ratio")
        p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)[:height, :width]
        if p.shape != (height, width):  # pad the last row/col if short
            pad = np.zeros((height, width))
            pad[: p.shape[0], : p.shape[1]] = p
            pad[p.shape[0] :, :] = pad[max(p.shape[0] - 1, 0), :]
            pad[:, p.shape[1] :] = pad[:, max(p.shape[1] - 1, 0)][:, None]
            p = pad
        full.append(np.clip(p, 0.0, 255.0))
    if len(full) == 3:  # JFIF YCbCr -> RGB
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        pixels = np.clip(np.stack([r, g, b], axis=-1), 0.0, 255.0)
        channels = 3
    else:
        pixels = full[0][:, :, None]
        channels = 1
    return {
        "kind": "image",
        "width": int(width),
        "height": int(height),
        "bit_depth": 8,
        "channels": channels,
        "pixel_mean": float(pixels.mean()),
        "pixel_std": float(pixels.std()),
        **({"pixels": pixels} if keep_pixels else {}),
    }


# --- JPEG fixture encoder (baseline, spec Annex K tables) ------------------
# The decoder never uses these: it reads tables from the file. They exist
# so fixtures can be generated without any media library, mirroring
# encode_png/encode_wav/encode_bmp. Tables K.1-K.6 are public ITU-T T.81
# constants.

_K1_LUM_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)  # raster order

_K2_CHR_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (BITS counts per code length 1..16, HUFFVAL symbol list)
_K3_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_K4_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_K5_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_K6_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = the Annex K table verbatim."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _huff_encode_table(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (canonical code, length) from a (BITS, HUFFVAL) pair."""
    bits, vals = spec
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit writer with 0xFF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(category, category-bit value) for a signed DC diff / AC coeff."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    s, bits = _magnitude(int(zz[0]) - pred)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(bits, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(bits, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def _block_zz(plane: np.ndarray, y0: int, x0: int, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize + zigzag one 8x8 block of a level-shifted plane."""
    f = _DCT_A @ plane[y0 : y0 + 8, x0 : x0 + 8] @ _DCT_A.T
    quantized = np.round(f.reshape(64) / q).astype(np.int64)
    return quantized[_ZZ]


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge") if ph or pw else plane


def _jpeg_prepare(pixels: np.ndarray, quality: int, subsample: str):
    """Shared encoder front half: level-shifted (possibly subsampled)
    component planes padded to the MCU grid, sampling factors, float
    quant tables, geometry. Used by both the baseline and progressive
    fixture encoders so their quantized coefficients are IDENTICAL —
    the round-trip equality test depends on that."""
    arr = np.asarray(pixels, dtype=np.uint8).astype(np.float64)
    gray = arr.ndim == 2
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsample mode {subsample}")
    lq = _scaled_quant(_K1_LUM_QUANT, quality).astype(np.float64)
    cq = _scaled_quant(_K2_CHR_QUANT, quality).astype(np.float64)
    if gray:
        height, width = arr.shape
        planes = [arr - 128.0]
        samp = [(1, 1)]
        quants = [lq]
    else:
        height, width, _ = arr.shape
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            # 2x2 mean chroma downsample over the edge-padded plane
            cb2 = _pad_to(cb, 2, 2)
            cr2 = _pad_to(cr, 2, 2)
            cb = (cb2[0::2, 0::2] + cb2[1::2, 0::2] + cb2[0::2, 1::2] + cb2[1::2, 1::2]) / 4.0
            cr = (cr2[0::2, 0::2] + cr2[1::2, 0::2] + cr2[0::2, 1::2] + cr2[1::2, 1::2]) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        quants = [lq, cq, cq]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    planes = [_pad_to(p, 8 * v, 8 * h) for p, (h, v) in zip(planes, samp)]
    # every component plane must cover the same MCU grid
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = [
        _pad_to(p, mcuy * v * 8, mcux * h * 8) for p, (h, v) in zip(planes, samp)
    ]
    return planes, samp, quants, (lq, cq), width, height, mcux, mcuy, gray


def _jpeg_headers(sof_marker, lq, cq, width, height, samp, gray) -> bytearray:
    """SOI + JFIF APP0 + DQT(s) + SOF for either encoder."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, lq), (1, cq)) if not gray else ((0, lq),):
        zz = q.astype(np.int64)[_ZZ]
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([tq]) + bytes(int(v) for v in zz)
    nc = 1 if gray else 3
    out += sof_marker + struct.pack(">HBHHB", 8 + 3 * nc, 8, height, width, nc)
    for i in range(nc):
        h, v = samp[i]
        out += bytes([i + 1, (h << 4) | v, 0 if i == 0 else 1])
    return out


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder for fixtures: 8-bit gray (H, W) or RGB
    (H, W, 3), Annex K quant (IJG quality-scaled) + Huffman tables,
    4:4:4 or 4:2:0 chroma, optional DRI/RSTn restart markers. Written
    independently from the decoder against T.81 so the round-trip test
    exercises both directions of the spec."""
    planes, samp, quants, (lq, cq), width, height, mcux, mcuy, gray = _jpeg_prepare(
        pixels, quality, subsample
    )
    nc = len(planes)

    out = _jpeg_headers(b"\xff\xc0", lq, cq, width, height, samp, gray)
    huff_specs = [(0x00, _K3_DC_LUM), (0x10, _K5_AC_LUM)]
    if not gray:
        huff_specs += [(0x01, _K4_DC_CHR), (0x11, _K6_AC_CHR)]
    for tcth, (bits, vals) in huff_specs:
        out += (
            b"\xff\xc4"
            + struct.pack(">H", 3 + 16 + len(vals))
            + bytes([tcth])
            + bytes(bits)
            + bytes(vals)
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    dc_lum = _huff_encode_table(_K3_DC_LUM)
    ac_lum = _huff_encode_table(_K5_AC_LUM)
    dc_chr = _huff_encode_table(_K4_DC_CHR)
    ac_chr = _huff_encode_table(_K6_AC_CHR)
    tables = [(dc_lum, ac_lum)] + [(dc_chr, ac_chr)] * (nc - 1)
    w = _BitWriter()
    preds = [0] * nc
    rst = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                w.flush()
                out += w.out
                w = _BitWriter()
                out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) & 7
                preds = [0] * nc
            for ci in range(nc):
                h, v = samp[ci]
                dc_codes, ac_codes = tables[ci]
                for by in range(v):
                    for bx in range(h):
                        zz = _block_zz(
                            planes[ci], (my * v + by) * 8, (mx * h + bx) * 8, quants[ci]
                        )
                        preds[ci] = _encode_block(w, zz, preds[ci], dc_codes, ac_codes)
            n_mcu += 1
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive fixture encoder (T.81 Annex G) ----------------------------
# The classic libjpeg 10-scan script: DC approximation first, luma AC
# in two spectral bands, chroma AC, then successive-approximation
# refinement scans down to full precision. Huffman tables are built
# per scan over exactly the symbols that scan emits (two-pass: count,
# then code) as flat canonical tables that keep the all-ones code
# reserved (F.1.2.2.1) — the Annex K tables lack the EOBn symbols
# progressive scans need. Written independently from the decoder so
# the progressive round-trip exercises both directions of Annex G.

_PROG_SCRIPT_RGB = [
    ((0, 1, 2), 0, 0, 0, 1),  # DC first approximation (interleaved)
    ((0,), 1, 5, 0, 2),  # luma AC low band, coarse
    ((2,), 1, 63, 0, 1),  # chroma AC full band, coarse
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),  # luma AC high band, coarse
    ((0,), 1, 63, 2, 1),  # luma AC refine bit 2 -> 1
    ((0, 1, 2), 0, 0, 1, 0),  # DC refinement (interleaved, raw bits)
    ((2,), 1, 63, 1, 0),  # final refinements to full precision
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROG_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _flat_huff_spec(symbols) -> tuple[list[int], list[int]]:
    """A valid canonical table giving every symbol the same length L,
    chosen so 2^L > len(symbols) and the all-ones code stays reserved."""
    syms = sorted(symbols) or [0x00]
    bits = [0] * 16
    bits[max(1, len(syms).bit_length()) - 1] = len(syms)
    return bits, syms


def _prog_scan_blocks(cblk, samp, comps, mcux, mcuy, width, height, hmax, vmax):
    """Yield (component index, zigzag block) in the scan's unit order:
    MCU-interleaved over the padded grid for multi-component scans,
    the component's own ceil(dims/8) crop grid otherwise (T.81 A.2.2)."""
    if len(comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in comps:
                    h, v = samp[ci]
                    for by in range(v):
                        for bx in range(h):
                            yield ci, cblk[ci][my * v + by, mx * h + bx]
    else:
        ci = comps[0]
        h, v = samp[ci]
        bw = -(-(-(-width * h // hmax)) // 8)
        bh = -(-(-(-height * v // vmax)) // 8)
        for by in range(bh):
            for bx in range(bw):
                yield ci, cblk[ci][by, bx]


def _enc_ac_first_scan(blocks, ss, se, al, emit, bits) -> None:
    """AC first scan (G.1.2.2): run/size over the shifted magnitudes,
    EOBn runs spanning empty block tails."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            emit(n << 4)
            if n:
                bits(eobrun - (1 << n), n)
            eobrun = 0

    for _ci, zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = (-v if v < 0 else v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                emit(0xF0)
                r -= 16
            s, b = _magnitude(t if v >= 0 else -t)
            emit((r << 4) | s)
            bits(b, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine_scan(blocks, ss, se, al, emit, bits) -> None:
    """AC refinement scan (G.1.2.3): newly-significant coefficients as
    run/1 symbols with a sign bit; correction bits for already-nonzero
    coefficients buffered and emitted with the symbol (or ZRL, or EOB
    run) whose decode walk consumes them. ZRLs are emitted only when
    they cannot fold into the EOB run — a correction reached with
    r > 15 can only lie past the last newly-significant coefficient."""
    eobrun = 0
    pend: list[int] = []  # correction bits carried with the pending EOB run

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            emit(n << 4)
            if n:
                bits(eobrun - (1 << n), n)
            eobrun = 0
            for b in pend:
                bits(b, 1)
            pend.clear()

    for _ci, zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = -1  # absolute index of the last newly-significant coefficient
        for i, t in enumerate(absv):
            if t == 1:
                eob = ss + i
        r = 0
        br: list[int] = []  # correction bits since the last emitted symbol
        for i, t in enumerate(absv):
            k = ss + i
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                emit(0xF0)
                r -= 16
                for b in br:
                    bits(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob()
            emit((r << 4) | 1)
            bits(1 if int(zz[k]) >= 0 else 0, 1)
            for b in br:
                bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF or len(pend) > 936:
                flush_eob()
    flush_eob()


def _enc_prog_scan(blocks, ss, se, ah, al, emit, bits) -> None:
    """Encode one progressive scan through emit(symbol) / bits(val, n)
    callbacks, so the same walk runs twice: a symbol-counting pass to
    build the scan's Huffman table, then the emission pass."""
    if ss == 0 and ah == 0:  # DC first approximation (diff-coded)
        preds: dict[int, int] = {}
        for ci, zz in blocks:
            v = int(zz[0]) >> al
            s, b = _magnitude(v - preds.get(ci, 0))
            preds[ci] = v
            emit(s)
            if s:
                bits(b, s)
    elif ss == 0:  # DC refinement: one raw bit per block, no symbols
        for _ci, zz in blocks:
            bits((int(zz[0]) >> al) & 1, 1)
    elif ah == 0:
        _enc_ac_first_scan(blocks, ss, se, al, emit, bits)
    else:
        _enc_ac_refine_scan(blocks, ss, se, al, emit, bits)


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 90, subsample: str = "444"
) -> bytes:
    """Progressive JFIF encoder for fixtures (SOF2): same pixel
    pipeline and quantization as encode_jpeg, entropy-coded through a
    10-scan spectral-selection + successive-approximation script.
    Because the quantized coefficients are identical to the baseline
    encoder's, decode_jpeg of the progressive bytes must reproduce
    decode_jpeg of the baseline bytes bit-exactly — the round-trip
    test asserts exactly that."""
    planes, samp, quants, (lq, cq), width, height, mcux, mcuy, gray = _jpeg_prepare(
        pixels, quality, subsample
    )
    nc = len(planes)
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    cblk = []
    for ci in range(nc):
        h, v = samp[ci]
        bh, bw = mcuy * v, mcux * h
        arr = np.zeros((bh, bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                arr[by, bx] = _block_zz(planes[ci], by * 8, bx * 8, quants[ci])
        cblk.append(arr)

    out = _jpeg_headers(b"\xff\xc2", lq, cq, width, height, samp, gray)
    script = _PROG_SCRIPT_GRAY if gray else _PROG_SCRIPT_RGB
    for comps, ss, se, ah, al in script:
        def gen():
            return _prog_scan_blocks(
                cblk, samp, comps, mcux, mcuy, width, height, hmax, vmax
            )

        syms: set[int] = set()
        _enc_prog_scan(gen(), ss, se, ah, al, syms.add, lambda v, n: None)
        codes: dict[int, tuple[int, int]] = {}
        if syms:
            tbits, tvals = _flat_huff_spec(syms)
            tclass = 0 if ss == 0 else 1
            out += (
                b"\xff\xc4"
                + struct.pack(">H", 3 + 16 + len(tvals))
                + bytes([tclass << 4])
                + bytes(tbits)
                + bytes(tvals)
            )
            codes = _huff_encode_table((tbits, tvals))
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
        for ci in comps:
            out += bytes([ci + 1, 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        w = _BitWriter()

        def emit(sym, _codes=codes, _w=w):
            c, length = _codes[sym]
            _w.write(c, length)

        _enc_prog_scan(gen(), ss, se, ah, al, emit, w.write)
        w.flush()
        out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# MP3 / MP4 metadata (pure-stdlib header/box parse — NOT full decode)
# ---------------------------------------------------------------------------
# A curation pipeline filters on duration/bitrate/sample-rate/codec-id
# long before it decodes samples; those fields live in frame headers
# (MP3) and ISO-BMFF boxes (MP4) and need no codec library. Full PCM /
# pixel decode for these formats genuinely requires ffmpeg — rows carry
# decoded=False so downstream knows the stats are container metadata.

_MP3_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_BITRATE_V1_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
_MP3_BITRATE_V1_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]
_MP3_SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def decode_mp3_meta(data: bytes) -> dict:
    """Walk MPEG audio frame headers (ID3v2 tag skipped): channel mode,
    sample rate, per-frame bitrate, frame count, duration. Layer I/II/
    III, MPEG 1/2/2.5. Requires >= 2 coherent frames so random bytes
    that happen to contain one 11-bit sync pattern don't parse."""
    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise UnsupportedMediaError("truncated ID3v2 header")
        pos = 10 + (
            ((data[6] & 0x7F) << 21)
            | ((data[7] & 0x7F) << 14)
            | ((data[8] & 0x7F) << 7)
            | (data[9] & 0x7F)
        )
    # tolerate junk before the first frame, but only a bounded amount
    first = -1
    for i in range(pos, min(len(data) - 4, pos + 4096)):
        if data[i] == 0xFF and (data[i + 1] & 0xE0) == 0xE0:
            first = i
            break
    if first < 0:
        raise UnsupportedMediaError("no MPEG audio frame sync found")
    pos = first
    n_frames = 0
    total_samples = 0
    kbps_sum = 0
    sample_rate = channels = version = layer = None
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        ver = (b1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        lay = (b1 >> 1) & 3  # 3=I, 2=II, 1=III
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 3
        padding = (b2 >> 1) & 1
        mode = (b3 >> 6) & 3
        if ver == 1 or lay == 0 or br_idx in (0, 15) or sr_idx == 3:
            break  # reserved / free-format / invalid
        sr = _MP3_SR[ver][sr_idx]
        if lay == 1:  # Layer III
            kbps = (_MP3_BITRATE_V1_L3 if ver == 3 else _MP3_BITRATE_V2_L3)[br_idx]
            spf = 1152 if ver == 3 else 576
            flen = (144 if ver == 3 else 72) * kbps * 1000 // sr + padding
        elif lay == 2:  # Layer II
            kbps = (_MP3_BITRATE_V1_L2 if ver == 3 else _MP3_BITRATE_V2_L3)[br_idx]
            spf = 1152
            flen = 144 * kbps * 1000 // sr + padding
        else:  # Layer I
            kbps = (_MP3_BITRATE_V1_L1 if ver == 3 else _MP3_BITRATE_V2_L3)[br_idx]
            spf = 384
            flen = (12 * kbps * 1000 // sr + padding) * 4
        if flen <= 4:
            break
        if sample_rate is None:
            sample_rate, channels = sr, 1 if mode == 3 else 2
            version, layer = ver, lay
        elif sr != sample_rate or lay != layer:
            break  # incoherent stream: stop at the last consistent frame
        n_frames += 1
        total_samples += spf
        kbps_sum += kbps
        pos += flen
    if n_frames < 2:
        raise UnsupportedMediaError("fewer than 2 coherent MPEG audio frames")
    return {
        "kind": "audio",
        "decoded": False,
        "channels": int(channels),
        "sample_rate": int(sample_rate),
        "n_frames": int(n_frames),
        "duration_sec": float(total_samples / sample_rate),
        "bitrate_kbps": float(kbps_sum / n_frames),
        "mpeg_version": {3: 1, 2: 2, 0: 25}[version],
        "layer": {3: 1, 2: 2, 1: 3}[layer],
    }


def encode_mp3_fixture(
    n_frames: int = 20, kbps: int = 128, sample_rate: int = 44100, channels: int = 2,
    id3: bool = True,
) -> bytes:
    """Deterministic MPEG1 Layer III fixture: valid frame headers with
    zeroed payloads (header-parseable, not playable audio)."""
    br_idx = _MP3_BITRATE_V1_L3.index(kbps)
    sr_idx = _MP3_SR[3].index(sample_rate)
    mode = 3 if channels == 1 else 0
    out = bytearray()
    if id3:
        out += b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10  # 10-byte tag body
    flen = 144 * kbps * 1000 // sample_rate
    hdr = bytes((0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), mode << 6))
    for _ in range(n_frames):
        out += hdr + b"\x00" * (flen - 4)
    return bytes(out)


# ---------------------------------------------------------------------------
# MPEG-1 audio Layer I/II full PCM decode (round-5 verdict item 3)
#
# ISO/IEC 11172-3 bitstream structure implemented from the spec: frame
# headers, bit allocation (Layer I fixed 4-bit; Layer II Table B.2a/B.2b
# lookup), scfsi, scalefactors (Table B.1 = 2*2^(-i/3)), grouped 3/5/9-
# level sample codes, and the unified requantization
#     s'' = C*(c*2^(1-nb) - 1 + D),  C = 2^nb/levels,
#     D = 1 - (levels-1)/2^nb
# (closed form reproducing Tables B.4 / the Layer I formula exactly).
#
# The 32-band synthesis filterbank is a cosine-modulated pseudo-QMF
# with a DERIVED near-perfect-reconstruction 512-tap prototype
# (Kaiser-windowed lowpass, cutoff/beta optimized for flat distortion
# response: reconstruction error -62 dB, unity gain) rather than the
# tabulated ISO Table-C.1/D coefficient lists. The modulation structure
#     g_k[n] = 2 h[n] cos((2k+1)(n-255.5)pi/64 - (-1)^k pi/4)
# is the spec's filterbank; only the window values differ (the ISO
# window is an equiripple design of the same shape, ~-90 dB). For the
# committed fixtures (encoded with the matching analysis bank) the
# round-trip is exact to quantization; real-world Layer I/II streams
# decode with ~-60 dB extra noise floor — real PCM, decoded=True.
# Layer III decodes too (see the Layer III section below); MPEG-2 LSF
# stays metadata-only.
# ---------------------------------------------------------------------------


class _Bits:
    """MSB-first bit reader over raw frame payload bytes."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise UnsupportedMediaError("MPEG audio frame truncated mid-field")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


_SCALEFACTORS = [2.0 * 2.0 ** (-i / 3.0) for i in range(63)]

# Layer II Table B.2a/B.2b rows: (first_sb, last_sb_exclusive, nbal,
# quantization steps per allocation code 1..2^nbal-1). B.2a: 48 kHz
# (sblimit 27); B.2b: 44.1/32 kHz high-rate (sblimit 30).
_L2_STEPS_LOW = [3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767, 65535]
_L2_STEPS_MID = [3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 65535]
_L2_STEPS_HIGH = [3, 5, 7, 9, 15, 31, 65535]
_L2_STEPS_TOP = [3, 5, 65535]
_L2_GROUP_BITS = {3: 5, 5: 7, 9: 10}  # grouped triplet code widths


def _l2_table(sample_rate: int, kbps_per_ch: float):
    """(rows, sblimit) per ISO Table B.2 selection — high-rate families
    only (B.2a/B.2b); the low-rate B.2c/B.2d and MPEG-2 LSF tables are
    out of scope (no fixture needs them and real streams at those rates
    are rare).

    Selection follows ISO 11172-3 2.4.2.5 / the dist10 reference
    encoder's pick_table: B.2a (sblimit 27) for 48 kHz at >=56 kbps/ch
    AND for 44.1/32 kHz at 56-80 kbps/ch; B.2b (sblimit 30) only for
    44.1/32 kHz at >=96 kbps/ch. (Round-6 advisory: selecting by sample
    rate alone mis-parsed real 44.1/32 kHz streams at 56-80 kbps/ch
    with the 30-subband layout.)"""
    if kbps_per_ch < 56:
        raise UnsupportedMediaError(
            f"Layer II low-rate allocation table (<{56} kbps/ch) not implemented"
        )
    sblimit = 27 if (sample_rate == 48000 or kbps_per_ch <= 80) else 30
    rows = []
    for sb in range(sblimit):
        if sb < 3:
            rows.append((4, _L2_STEPS_LOW))
        elif sb < 11:
            rows.append((4, _L2_STEPS_MID))
        elif sb < 23:
            rows.append((3, _L2_STEPS_HIGH))
        else:
            rows.append((2, _L2_STEPS_TOP))
    return rows, sblimit


def _pqmf_filters():
    """(analysis[512,32], synthesis[512,32], gain) — cached."""
    global _PQMF_CACHE
    try:
        return _PQMF_CACHE
    except NameError:
        pass
    n = np.arange(512)
    k = np.arange(32)
    # near-PR prototype: cutoff/beta from a flat-distortion grid search
    # (impulse-response off-peak energy -62 dB; see module comment)
    h = np.sinc((n - 255.5) * 0.01754297) * np.kaiser(512, 7.75)
    h /= h.sum()
    ph = ((-1.0) ** k) * np.pi / 4
    arg = (2 * k[None, :] + 1) * (n[:, None] - 255.5) * np.pi / 64
    analysis = 2 * h[:, None] * np.cos(arg + ph[None, :])
    synthesis = 2 * h[:, None] * np.cos(arg - ph[None, :])
    _PQMF_CACHE = (analysis, synthesis, 31.969941)
    return _PQMF_CACHE


def _pqmf_synthesize(granules: np.ndarray) -> np.ndarray:
    """Overlap-add synthesis: [G, 32] subband vectors -> PCM [G*32]."""
    _, Gk, gain = _pqmf_filters()
    G = len(granules)
    if G == 0:
        return np.zeros(0)
    y = np.zeros(G * 32 + 512)
    contrib = granules @ Gk.T  # [G, 512]
    for m in range(G):
        y[m * 32 : m * 32 + 512] += contrib[m]
    return y[:G * 32] * gain


def _pqmf_analyze(x: np.ndarray) -> np.ndarray:
    """Encoder-side analysis: PCM -> [G, 32] subband vectors (512-tap
    sliding window, hop 32, time-reversed = convolution form)."""
    A, _, _ = _pqmf_filters()
    x = np.concatenate([np.zeros(480), np.asarray(x, dtype=np.float64)])
    G = max(0, (len(x) - 512) // 32 + 1)
    out = np.empty((G, 32))
    for m in range(G):
        out[m] = x[m * 32 : m * 32 + 512][::-1] @ A
    return out


def _requant(c: int, nb: int, levels: int) -> float:
    C = (1 << nb) / levels
    D = 1.0 - (levels - 1) / (1 << nb)
    return C * (c * 2.0 ** (1 - nb) - 1.0 + D)


def _quant(s: float, nb: int, levels: int) -> int:
    C = (1 << nb) / levels
    D = 1.0 - (levels - 1) / (1 << nb)
    c = round((s / C + 1.0 - D) * 2.0 ** (nb - 1))
    return min(max(int(c), 0), levels - 1)


def _parse_mpeg1_header(data: bytes, pos: int):
    """Validated MPEG-1 / MPEG-2 (LSF, Layer III only) header at pos
    -> dict, or None if not a decodable frame."""
    if pos + 4 > len(data) or data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
        return None
    b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
    ver, lay = (b1 >> 3) & 3, (b1 >> 1) & 3
    br_idx, sr_idx = (b2 >> 4) & 0x0F, (b2 >> 2) & 3
    if ver not in (2, 3) or lay == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    if ver == 2 and lay != 1:
        return None  # LSF Layer I/II out of scope
    sr = _MP3_SR[ver][sr_idx]
    padding = (b2 >> 1) & 1
    mode = (b3 >> 6) & 3
    if ver == 2:  # MPEG-2 LSF Layer III: 576 samples/frame
        kbps = _MP3_BITRATE_V2_L3[br_idx]
        flen = 72 * kbps * 1000 // sr + padding
    elif lay == 3:  # Layer I
        kbps = _MP3_BITRATE_V1_L1[br_idx]
        flen = (12 * kbps * 1000 // sr + padding) * 4
    elif lay == 2:  # Layer II
        kbps = _MP3_BITRATE_V1_L2[br_idx]
        flen = 144 * kbps * 1000 // sr + padding
    else:  # Layer III
        kbps = _MP3_BITRATE_V1_L3[br_idx]
        flen = 144 * kbps * 1000 // sr + padding
    return {
        "version": 1 if ver == 3 else 2,
        "layer": {3: 1, 2: 2, 1: 3}[lay],
        "kbps": kbps,
        "sample_rate": sr,
        "mode": mode,
        "channels": 1 if mode == 3 else 2,
        "crc": (b1 & 1) == 0,
        "flen": flen,
        "mode_ext": (b3 >> 4) & 3,
    }


def _decode_frame_l1(bits: _Bits, nch: int) -> list[np.ndarray]:
    """One Layer I frame -> per-channel [12, 32] subband granules."""
    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            code = bits.read(4)
            if code == 15:
                raise UnsupportedMediaError("Layer I forbidden allocation code 15")
            alloc[ch][sb] = 0 if code == 0 else code + 1  # nb bits
    scf = [[1.0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                idx = bits.read(6)
                if idx > 62:
                    raise UnsupportedMediaError("Layer I scalefactor index 63")
                scf[ch][sb] = _SCALEFACTORS[idx]
    out = [np.zeros((12, 32)) for _ in range(nch)]
    for s in range(12):
        for sb in range(32):
            for ch in range(nch):
                nb = alloc[ch][sb]
                if nb:
                    c = bits.read(nb)
                    out[ch][s, sb] = scf[ch][sb] * _requant(c, nb, (1 << nb) - 1)
    return out


def _decode_frame_l2(bits: _Bits, nch: int, sample_rate: int, kbps: int) -> list[np.ndarray]:
    """One Layer II frame -> per-channel [36, 32] subband granules."""
    rows, sblimit = _l2_table(sample_rate, kbps / nch)
    alloc = [[0] * sblimit for _ in range(nch)]  # levels, 0 = none
    for sb in range(sblimit):
        nbal, steps = rows[sb]
        for ch in range(nch):
            code = bits.read(nbal)
            alloc[ch][sb] = 0 if code == 0 else steps[code - 1]
    scfsi = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                scfsi[ch][sb] = bits.read(2)
    scf = [[(1.0, 1.0, 1.0)] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            si = scfsi[ch][sb]
            n_read = {0: 3, 1: 2, 2: 1, 3: 2}[si]
            idx = [bits.read(6) for _ in range(n_read)]
            if max(idx) > 62:
                raise UnsupportedMediaError("Layer II scalefactor index 63")
            v = [_SCALEFACTORS[i] for i in idx]
            if si == 0:
                scf[ch][sb] = (v[0], v[1], v[2])
            elif si == 1:
                scf[ch][sb] = (v[0], v[0], v[1])
            elif si == 2:
                scf[ch][sb] = (v[0], v[0], v[0])
            else:
                scf[ch][sb] = (v[0], v[1], v[1])
    out = [np.zeros((36, 32)) for _ in range(nch)]
    for gr in range(12):
        part = gr >> 2
        for sb in range(sblimit):
            for ch in range(nch):
                levels = alloc[ch][sb]
                if not levels:
                    continue
                sf = scf[ch][sb][part]
                if levels in _L2_GROUP_BITS:  # grouped triplet
                    nb = levels.bit_length()
                    c = bits.read(_L2_GROUP_BITS[levels])
                    for i in range(3):
                        out[ch][3 * gr + i, sb] = sf * _requant(c % levels, nb, levels)
                        c //= levels
                else:
                    nb = levels.bit_length()
                    for i in range(3):
                        c = bits.read(nb)
                        out[ch][3 * gr + i, sb] = sf * _requant(c, nb, levels)
    return out


# ---------------------------------------------------------------------------
# MPEG-1 audio Layer III full PCM decode (round-8 verdict item 6)
#
# ISO/IEC 11172-3 2.4.1.7/2.4.2.7/2.4.3.4 implemented from the spec:
# side information (17/32 bytes), the BIT RESERVOIR (main_data_begin
# back-pointer into previous frames' main data), scalefactor decoding
# with scfsi sharing, Huffman-coded spectrum (big_values pair tables +
# count1 quadruples), requantization |is|^(4/3) with global_gain /
# scalefac_scale / preflag / subblock_gain, short-block reordering,
# alias-reduction butterflies, the 36/12-point IMDCT with all four
# window types and overlap-add, frequency inversion, and the same
# 32-band PQMF synthesis Layer I/II use.
#
# Documented kernel boundary: of ISO Table B.7's 32 big-value Huffman
# table ids this build carries 20 — table 0 (all zero), the non-ESC
# tables 1, 2, 3, 5, 6, 9, 10, 11, 12, 13, 15, and the full ESC
# family 16-23 (table 16's codes with linbits 1/2/3/4/6/8/10/13) —
# plus both count1 tables (A = the 16-entry Huffman code, B = the
# fixed 4-bit complement code). Every carried table is gated at
# import by _l3_build_b7 (complete prefix code over the full symbol
# grid; see _L3_B7_RAW). Ids 4 and 14 are unused by the spec; ids 7,
# 8 and the 24-31 ESC family are NOT carried — their table data did
# not survive the completeness gate offline (no authoritative copy of
# the spec data is reachable from this build environment), and
# carrying near-miss data would decode real streams into wrong PCM
# silently. A stream selecting an uncarried table raises
# UnsupportedMediaError, and decode_mpeg_audio falls back to container
# metadata. MS joint stereo and MPEG-2 LSF decode since round 10,
# long-block intensity stereo (MPEG-1 tan ratios and LSF io powers)
# since round 11; short-block intensity and mixed blocks remain out
# of scope (raise).
# ---------------------------------------------------------------------------

_L3_SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]
_L3_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2]
# scalefactor band boundaries: ISO 11172-3 Table B.8 (MPEG-1 rates)
# and ISO 13818-3 Table B.2 (MPEG-2 LSF rates) — keys never collide
_L3_SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
    22050: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576],
    24000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162,
            194, 232, 278, 330, 394, 464, 540, 576],
    16000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576],
}
_L3_SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
    22050: [0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192],
    24000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192],
    16000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192],
}
# LSF scalefactor group sizes nr_of_sfb[blocknumber][blocktypenumber]
# (ISO 13818-3 2.4.3.2; blocktypenumber 0=long, 1=short, 2=mixed).
# Blocknumbers 3-5 are the intensity-stereo channel's layouts. All six
# rows are gated at import by _check_lsf_nsfb below: every long row
# must cover exactly the 21 long scalefactor bands, every short row the
# 36 (12 sfb x 3 window) short ones, every mixed row the 33 mixed ones
# — the structural invariant that catches a mis-keyed recall.
_LSF_NSFB = {
    0: ((6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)),
    1: ((6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)),
    2: ((11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)),
    3: ((7, 7, 7, 0), (12, 12, 12, 0), (6, 15, 12, 0)),
    4: ((6, 6, 6, 3), (12, 9, 9, 6), (6, 12, 9, 6)),
    5: ((8, 8, 5, 0), (15, 12, 9, 0), (6, 18, 9, 0)),
}


def _check_lsf_nsfb() -> None:
    """Import gate for _LSF_NSFB: each blocknumber row must partition
    the full scalefactor-band grid (21 long / 36 short / 33 mixed)."""
    for bn, rows in _LSF_NSFB.items():
        for row, want in zip(rows, (21, 36, 33)):
            if sum(row) != want:
                raise ValueError(
                    f"LSF nsfb blocknumber {bn}: row {row} sums to "
                    f"{sum(row)}, expected {want}"
                )


_check_lsf_nsfb()

# Intensity-stereo position gains, ISO 11172-3 2.4.3.4.9.3: for
# is_pos k in 0..6, is_ratio = tan(k*pi/12) and the single transmitted
# spectrum splits as L = xr*ratio/(1+ratio), R = xr*1/(1+ratio);
# k=6 (tan(pi/2) -> inf) is the all-left limit (1, 0). k=7 marks "no
# intensity processing" for the band. Derived at import — no table
# data to mis-key.
def _l3_is_gains_m1() -> tuple[tuple[float, float], ...]:
    gains = []
    for k in range(7):
        if k == 6:
            gains.append((1.0, 0.0))
        else:
            r = math.tan(k * math.pi / 12.0)
            gains.append((r / (1.0 + r), 1.0 / (1.0 + r)))
    return tuple(gains)


_L3_IS_GAINS_M1 = _l3_is_gains_m1()


def _lsf_slen(g: dict) -> tuple[tuple[int, int, int, int], int]:
    """LSF scalefac_compress -> (slen[4], blocknumber); preflag is
    implied by blocknumber 2 (non-intensity channels)."""
    sc = g["scalefac_compress"]
    if sc < 400:
        return ((sc >> 4) // 5, (sc >> 4) % 5, (sc & 15) >> 2, sc & 3), 0
    if sc < 500:
        t = sc - 400
        return ((t >> 2) // 5, (t >> 2) % 5, t & 3, 0), 1
    t = sc - 500
    return (t // 3, t % 3, 0, 0), 2


def _lsf_slen_intensity(g: dict) -> tuple[tuple[int, int, int, int], int, int]:
    """LSF scalefac_compress for the INTENSITY channel (13818-3
    2.4.3.2, right channel when mode_ext & 1) ->
    (slen[4], blocknumber 3-5, intensity_scale). The low bit selects
    the io scale; the remaining bits pick one of three layouts."""
    sc = g["scalefac_compress"]
    intensity_scale = sc & 1
    t = sc >> 1
    if t < 180:
        return (t // 36, (t % 36) // 6, t % 6, 0), 3, intensity_scale
    if t < 244:
        u = t - 180
        return ((u % 64) >> 4, (u % 16) >> 2, u % 4, 0), 4, intensity_scale
    if t < 255:
        u = t - 244
        return (u // 3, u % 3, 0, 0), 5, intensity_scale
    raise UnsupportedMediaError(
        "LSF intensity scalefac_compress 510/511 is reserved"
    )
# ISO Table B.7: big-value pair Huffman tables, entered as LAME-style
# flat (codes, lens) arrays in row-major (x, y) order. Every table is
# gated at import by _l3_build_b7: full symbol coverage, code-fits-
# length, no duplicate codes, prefix-freeness, and Kraft sum EXACTLY 1
# (a complete prefix code — the property every B.7 table has). A table
# that fails the gate cannot ship; uncarried ids (7, 8, 24-31 — recall
# of their data did not survive the gate — plus 4/14, unused by the
# spec) raise UnsupportedMediaError at decode and decode_mpeg_audio
# falls back to container metadata for streams selecting them.
_L3_B7_RAW = {
    1: (2, (1, 1, 1, 0), (1, 3, 2, 3)),
    2: (3, (1, 2, 1, 3, 1, 1, 3, 2, 0), (1, 3, 6, 3, 3, 5, 5, 5, 6)),
    3: (3, (3, 2, 1, 1, 1, 1, 3, 2, 0), (2, 2, 6, 3, 2, 5, 5, 5, 6)),
    5: (4, (1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0),
        (1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8)),
    6: (4, (7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0),
        (3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7)),
    9: (6, (7, 5, 9, 14, 15, 7, 6, 4, 5, 5, 6, 7,
            7, 6, 8, 8, 8, 5, 15, 6, 9, 10, 5, 1,
            11, 7, 9, 6, 4, 1, 14, 4, 6, 2, 6, 0),
        (3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8,
         4, 4, 5, 6, 7, 8, 6, 5, 6, 7, 7, 8,
         7, 6, 7, 7, 8, 9, 8, 7, 8, 8, 9, 9)),
    10: (8, (1, 2, 10, 23, 35, 30, 12, 17, 3, 3, 8, 12, 18, 21, 12, 7,
             11, 9, 15, 21, 32, 40, 19, 6, 14, 13, 22, 34, 46, 23, 18, 7,
             20, 19, 33, 47, 27, 22, 9, 3, 31, 22, 41, 26, 21, 20, 5, 3,
             14, 13, 10, 11, 16, 6, 5, 1, 9, 8, 7, 8, 4, 4, 2, 0),
         (1, 3, 6, 8, 9, 9, 9, 10, 3, 4, 6, 7, 8, 9, 8, 8,
          6, 6, 7, 8, 9, 10, 9, 9, 7, 7, 8, 9, 10, 10, 9, 10,
          8, 8, 9, 10, 10, 10, 10, 10, 9, 9, 10, 10, 11, 11, 10, 11,
          8, 8, 9, 10, 10, 10, 11, 11, 9, 8, 9, 10, 10, 11, 11, 11)),
    11: (8, (3, 4, 10, 24, 34, 33, 21, 15, 5, 3, 4, 10, 32, 17, 11, 10,
             11, 7, 13, 18, 30, 31, 20, 5, 25, 11, 19, 59, 27, 18, 12, 5,
             35, 33, 31, 58, 30, 16, 7, 5, 28, 26, 32, 19, 17, 15, 8, 14,
             14, 12, 9, 13, 14, 9, 4, 1, 11, 4, 6, 6, 6, 3, 2, 0),
         (2, 3, 5, 7, 8, 9, 8, 9, 3, 3, 4, 6, 8, 8, 7, 8,
          5, 5, 6, 7, 8, 9, 8, 8, 7, 6, 7, 9, 8, 10, 8, 9,
          8, 8, 8, 9, 9, 10, 9, 10, 8, 8, 9, 10, 10, 11, 10, 11,
          8, 7, 7, 8, 9, 10, 10, 10, 8, 7, 8, 9, 10, 10, 10, 10)),
    12: (8, (9, 6, 16, 33, 41, 39, 38, 26, 7, 5, 6, 9, 23, 16, 26, 11,
             17, 7, 11, 14, 21, 30, 10, 7, 17, 10, 15, 12, 18, 28, 14, 5,
             32, 13, 22, 19, 18, 16, 9, 5, 40, 17, 31, 29, 17, 13, 4, 2,
             27, 12, 11, 15, 10, 7, 4, 1, 27, 12, 8, 12, 6, 3, 1, 0),
         (4, 3, 5, 7, 8, 9, 9, 9, 3, 3, 4, 5, 7, 7, 8, 8,
          5, 4, 5, 6, 7, 8, 7, 8, 6, 5, 6, 6, 7, 8, 8, 8,
          7, 6, 7, 7, 8, 8, 8, 9, 8, 7, 8, 8, 8, 9, 8, 9,
          8, 7, 7, 8, 8, 9, 9, 10, 9, 8, 8, 9, 9, 9, 9, 10)),
    13: (16, (
        1, 5, 14, 21, 34, 51, 46, 71, 42, 52, 68, 52, 67, 44, 43, 19,
        3, 4, 12, 19, 31, 26, 44, 33, 31, 24, 32, 24, 31, 35, 22, 14,
        15, 13, 23, 36, 59, 49, 77, 65, 29, 40, 30, 40, 27, 33, 42, 16,
        22, 20, 37, 61, 56, 79, 73, 64, 43, 76, 56, 37, 26, 31, 25, 14,
        35, 16, 60, 57, 97, 75, 114, 91, 54, 73, 55, 41, 48, 53, 23, 24,
        58, 27, 50, 96, 76, 70, 93, 84, 77, 58, 79, 29, 74, 49, 41, 17,
        47, 45, 78, 74, 115, 94, 90, 79, 69, 83, 71, 50, 59, 38, 36, 15,
        72, 34, 56, 95, 92, 85, 91, 90, 86, 73, 77, 65, 51, 44, 43, 42,
        43, 20, 30, 44, 55, 78, 72, 87, 78, 61, 46, 54, 37, 30, 20, 16,
        53, 25, 41, 37, 44, 59, 54, 81, 66, 76, 57, 54, 37, 18, 39, 11,
        35, 33, 31, 57, 42, 82, 72, 80, 47, 58, 55, 21, 22, 26, 38, 22,
        53, 25, 23, 38, 70, 60, 51, 36, 55, 26, 34, 23, 27, 14, 9, 7,
        34, 32, 28, 39, 49, 75, 30, 52, 48, 40, 52, 28, 18, 17, 9, 5,
        45, 21, 34, 64, 56, 50, 49, 45, 31, 19, 12, 15, 10, 7, 6, 3,
        48, 23, 20, 39, 36, 35, 53, 21, 16, 23, 13, 10, 6, 1, 4, 2,
        16, 15, 17, 27, 25, 20, 29, 11, 17, 12, 16, 8, 1, 1, 0, 1,
    ), (
        1, 4, 6, 7, 8, 9, 9, 10, 9, 10, 11, 11, 12, 12, 13, 13,
        3, 4, 6, 7, 8, 8, 9, 9, 9, 9, 10, 10, 11, 12, 12, 12,
        6, 6, 7, 8, 9, 9, 10, 10, 9, 10, 10, 11, 11, 12, 13, 13,
        7, 7, 8, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 13,
        8, 7, 9, 9, 10, 10, 11, 11, 10, 11, 11, 12, 12, 13, 13, 14,
        9, 8, 9, 10, 10, 10, 11, 11, 11, 11, 12, 11, 13, 13, 14, 14,
        9, 9, 10, 10, 11, 11, 11, 11, 11, 12, 12, 12, 13, 13, 14, 14,
        10, 9, 10, 11, 11, 11, 12, 12, 12, 12, 13, 13, 13, 14, 16, 16,
        9, 8, 9, 10, 10, 11, 11, 12, 12, 12, 12, 13, 13, 14, 15, 15,
        10, 9, 10, 10, 11, 11, 11, 13, 12, 13, 13, 14, 14, 14, 16, 15,
        10, 10, 10, 11, 11, 12, 12, 13, 12, 13, 14, 13, 14, 15, 16, 17,
        11, 10, 10, 11, 12, 12, 12, 12, 13, 13, 13, 14, 15, 15, 15, 16,
        11, 11, 11, 12, 12, 13, 12, 13, 14, 14, 15, 15, 15, 16, 16, 16,
        12, 11, 12, 13, 13, 13, 14, 14, 14, 14, 14, 15, 16, 15, 16, 16,
        13, 12, 12, 13, 13, 13, 15, 14, 14, 17, 15, 15, 15, 17, 16, 16,
        12, 12, 13, 14, 14, 14, 15, 14, 15, 15, 16, 16, 19, 18, 19, 16,
    )),
    15: (16, (
        7, 12, 18, 53, 47, 76, 124, 108, 89, 123, 108, 119, 107, 81, 122, 63,
        13, 5, 16, 27, 46, 36, 61, 51, 42, 70, 52, 83, 65, 41, 59, 36,
        19, 17, 15, 24, 41, 34, 59, 48, 40, 64, 50, 78, 62, 80, 56, 33,
        29, 28, 25, 43, 39, 63, 55, 93, 76, 59, 93, 72, 54, 75, 50, 29,
        52, 22, 42, 40, 67, 57, 95, 79, 72, 57, 89, 69, 49, 66, 46, 27,
        77, 37, 35, 66, 58, 52, 91, 74, 62, 48, 79, 63, 90, 62, 40, 38,
        125, 32, 60, 56, 50, 92, 78, 65, 55, 87, 71, 51, 73, 51, 70, 30,
        109, 53, 49, 94, 88, 75, 66, 122, 91, 73, 56, 42, 64, 44, 21, 25,
        90, 43, 41, 77, 73, 63, 56, 92, 77, 66, 47, 67, 48, 53, 36, 20,
        71, 34, 67, 60, 58, 49, 88, 76, 67, 106, 71, 54, 38, 39, 23, 15,
        109, 53, 51, 47, 90, 82, 58, 57, 48, 72, 57, 41, 23, 27, 62, 9,
        86, 42, 40, 37, 70, 64, 52, 43, 70, 55, 42, 25, 29, 18, 11, 11,
        118, 68, 30, 55, 50, 46, 74, 65, 49, 39, 24, 16, 22, 13, 14, 7,
        91, 44, 39, 38, 34, 63, 52, 45, 31, 52, 28, 19, 14, 8, 9, 3,
        123, 60, 58, 53, 47, 43, 32, 22, 37, 24, 17, 12, 15, 10, 2, 1,
        71, 37, 34, 30, 28, 20, 17, 26, 21, 16, 10, 6, 8, 6, 2, 0,
    ), (
        3, 4, 5, 7, 7, 8, 9, 9, 9, 10, 10, 11, 11, 11, 12, 13,
        4, 3, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 10, 11, 11,
        5, 5, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 11, 11, 11,
        6, 6, 6, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 11, 11, 11,
        7, 6, 7, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11,
        8, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 11, 11, 11, 12,
        9, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 12, 12,
        9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 12,
        9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 11, 11, 12, 12, 12,
        9, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12,
        10, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 12,
        10, 9, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 13,
        11, 10, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 12, 12, 13, 13,
        11, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13,
        12, 11, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 12, 13,
        12, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13, 13, 13,
    )),
    16: (16, (
        1, 5, 14, 44, 74, 63, 110, 93, 172, 149, 138, 242, 225, 195, 376, 17,
        3, 4, 12, 20, 35, 62, 53, 47, 83, 75, 68, 119, 201, 107, 207, 9,
        15, 13, 23, 38, 67, 58, 103, 90, 161, 72, 127, 117, 110, 209, 206, 16,
        45, 21, 39, 69, 64, 114, 99, 87, 158, 140, 252, 212, 199, 387, 365, 26,
        75, 36, 68, 65, 115, 101, 179, 164, 155, 264, 246, 226, 395, 382, 362, 9,
        66, 30, 59, 56, 102, 185, 173, 265, 142, 253, 232, 400, 388, 378, 445, 16,
        111, 54, 52, 100, 184, 178, 160, 133, 257, 244, 228, 217, 385, 366, 715, 10,
        98, 48, 91, 88, 165, 157, 148, 261, 248, 407, 397, 372, 380, 889, 884, 8,
        85, 84, 81, 159, 156, 143, 260, 249, 427, 401, 392, 383, 727, 713, 708, 7,
        154, 76, 73, 141, 131, 256, 245, 426, 406, 394, 384, 735, 359, 710, 352, 11,
        139, 129, 67, 125, 247, 233, 229, 219, 393, 743, 737, 720, 885, 882, 439, 4,
        243, 120, 118, 115, 227, 223, 396, 746, 742, 736, 721, 712, 706, 223, 436, 6,
        202, 224, 222, 218, 216, 389, 386, 381, 364, 888, 443, 707, 440, 437, 1728, 4,
        747, 211, 210, 208, 370, 379, 734, 723, 714, 1735, 883, 877, 876, 3459, 865, 2,
        377, 369, 102, 187, 726, 722, 358, 711, 709, 866, 1734, 871, 3458, 870, 434, 0,
        12, 10, 7, 11, 10, 17, 11, 9, 13, 12, 10, 7, 5, 3, 1, 3,
    ), (
        1, 4, 6, 8, 9, 9, 10, 10, 11, 11, 11, 12, 12, 12, 13, 9,
        3, 4, 6, 7, 8, 9, 9, 9, 10, 10, 10, 11, 12, 11, 12, 8,
        6, 6, 7, 8, 9, 9, 10, 10, 11, 10, 11, 11, 11, 12, 12, 9,
        8, 7, 8, 9, 9, 10, 10, 10, 11, 11, 12, 12, 12, 13, 13, 10,
        9, 8, 9, 9, 10, 10, 11, 11, 11, 12, 12, 12, 13, 13, 13, 9,
        9, 8, 9, 9, 10, 11, 11, 12, 11, 12, 12, 13, 13, 13, 14, 10,
        10, 9, 9, 10, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 14, 10,
        10, 9, 10, 10, 11, 11, 11, 12, 12, 13, 13, 13, 13, 15, 15, 10,
        10, 10, 10, 11, 11, 11, 12, 12, 13, 13, 13, 13, 14, 14, 14, 10,
        11, 10, 10, 11, 11, 12, 12, 13, 13, 13, 13, 14, 13, 14, 13, 11,
        11, 11, 10, 11, 12, 12, 12, 12, 13, 14, 14, 14, 15, 15, 14, 10,
        12, 11, 11, 11, 12, 12, 13, 14, 14, 14, 14, 14, 14, 13, 14, 11,
        12, 12, 12, 12, 12, 13, 13, 13, 13, 15, 14, 14, 14, 14, 16, 11,
        14, 12, 12, 12, 13, 13, 14, 14, 14, 16, 15, 15, 15, 17, 15, 11,
        13, 13, 11, 12, 14, 14, 13, 14, 14, 15, 16, 15, 17, 15, 14, 11,
        9, 8, 8, 9, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 11, 8,
    )),
}
# tables 16-23 share table 16's codes with these linbits widths
# (ISO Table B.7); 24-31 would share table 24's (uncarried).
_L3_LINBITS_16 = (1, 2, 3, 4, 6, 8, 10, 13)


def _l3_build_b7():
    """Validate _L3_B7_RAW and build {tsel: (decode dict, linbits)} +
    {tsel: (encode dict, linbits)}. The gate checks the structural
    property every B.7 table has — a COMPLETE prefix code over the
    full symbol grid (Kraft sum exactly 1, prefix-free, no gaps) — so
    corrupted or incomplete table data cannot ship. It cannot detect a
    permuted-but-still-complete (x, y) symbol mapping; that is covered
    externally by tools/mp3_table_audit.py bit-budget audits against
    real encoder streams (45/45 granules on the third-party LSF
    fixture) and spot-checks of carried tables vs public reference
    data. Raises explicitly (not assert) so `python -O` cannot strip
    the import-time validation."""
    from fractions import Fraction

    dec_tables, enc_tables = {}, {}
    for tid, (n, codes, lens) in _L3_B7_RAW.items():
        if len(codes) != n * n or len(lens) != n * n:
            raise ValueError(f"B.7 table {tid}: wrong grid size")
        dec, enc = {}, {}
        kraft = Fraction(0)
        for i, (c, l) in enumerate(zip(codes, lens)):
            if not (1 <= l <= 19 and 0 <= c < (1 << l)):
                raise ValueError(f"B.7 table {tid} entry {i}: code does not fit length")
            if (l, c) in dec:
                raise ValueError(f"B.7 table {tid} entry {i}: duplicate code")
            dec[(l, c)] = divmod(i, n)
            enc[divmod(i, n)] = (l, c)
            kraft += Fraction(1, 1 << l)
        if kraft != 1:
            raise ValueError(f"B.7 table {tid}: Kraft sum {kraft} != 1 (incomplete code)")
        strs = sorted(f"{c:0{l}b}" for l, c in dec)
        for a, b in zip(strs, strs[1:]):
            if b.startswith(a):
                raise ValueError(f"B.7 table {tid}: not prefix-free ({a} prefixes {b})")
        dec_tables[tid] = (dec, 0)
        enc_tables[tid] = (enc, 0, n)
    for off, lb in enumerate(_L3_LINBITS_16):
        dec_tables[16 + off] = (dec_tables[16][0], lb)
        enc_tables[16 + off] = (enc_tables[16][0], lb, 16)
    return dec_tables, enc_tables


# {tsel: ({(hlen, hcod): (x, y)}, linbits)} / {tsel: (enc, linbits, n)}
_L3_PAIR_TABLES, _L3_PAIR_ENC = _l3_build_b7()
# count1 table A (Huffman) — {(hlen, hcod): (v, w, x, y)}; complete
# prefix code (Kraft sum exactly 1).
_L3_QUAD_A = {
    (1, 0b1): (0, 0, 0, 0),
    (4, 0b0101): (0, 0, 0, 1),
    (4, 0b0100): (0, 0, 1, 0),
    (5, 0b00101): (0, 0, 1, 1),
    (4, 0b0110): (0, 1, 0, 0),
    (6, 0b000101): (0, 1, 0, 1),
    (5, 0b00100): (0, 1, 1, 0),
    (6, 0b000100): (0, 1, 1, 1),
    (4, 0b0111): (1, 0, 0, 0),
    (5, 0b00011): (1, 0, 0, 1),
    (5, 0b00110): (1, 0, 1, 0),
    (6, 0b000000): (1, 0, 1, 1),
    (5, 0b00111): (1, 1, 0, 0),
    (6, 0b000010): (1, 1, 0, 1),
    (6, 0b000011): (1, 1, 1, 0),
    (6, 0b000001): (1, 1, 1, 1),
}
_L3_QUAD_A_ENC = {v: k for k, v in _L3_QUAD_A.items()}


def _huff_lookup(bits: _Bits, table: dict, max_len: int):
    code, n = 0, 0
    while n < max_len:
        code = (code << 1) | bits.read(1)
        n += 1
        hit = table.get((n, code))
        if hit is not None:
            return hit
    raise UnsupportedMediaError("invalid Layer III Huffman code")


def _parse_l3_side_info(bits: _Bits, nch: int, version: int = 1) -> dict:
    """Layer III side info: MPEG-1 (17/32 bytes, 2 granules, scfsi) or
    MPEG-2 LSF (9/17 bytes, 1 granule, 9-bit scalefac_compress, no
    scfsi/preflag — preflag is implied by the LSF blocknumber)."""
    lsf = version == 2
    si = {"main_data_begin": bits.read(8 if lsf else 9)}
    if lsf:
        bits.read(1 if nch == 1 else 2)  # private_bits
        si["scfsi"] = [[0] * 4 for _ in range(nch)]
    else:
        bits.read(5 if nch == 1 else 3)  # private_bits
        si["scfsi"] = [[bits.read(1) for _ in range(4)] for _ in range(nch)]
    grs = []
    for _gr in range(1 if lsf else 2):
        chs = []
        for _ch in range(nch):
            g = {
                "part2_3_length": bits.read(12),
                "big_values": bits.read(9),
                "global_gain": bits.read(8),
                "scalefac_compress": bits.read(9 if lsf else 4),
                "window_switching": bits.read(1),
            }
            if g["window_switching"]:
                g["block_type"] = bits.read(2)
                g["mixed_block"] = bits.read(1)
                g["table_select"] = [bits.read(5), bits.read(5), 0]
                g["subblock_gain"] = [bits.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise UnsupportedMediaError(
                        "window_switching with block_type 0 is forbidden"
                    )
                if g["mixed_block"]:
                    raise UnsupportedMediaError("mixed blocks not implemented")
                g["region0_count"] = 8 if g["block_type"] == 2 else 7
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [bits.read(5), bits.read(5), bits.read(5)]
                g["subblock_gain"] = [0, 0, 0]
                g["region0_count"] = bits.read(4)
                g["region1_count"] = bits.read(3)
            g["preflag"] = 0 if lsf else bits.read(1)
            g["scalefac_scale"] = bits.read(1)
            g["count1table_select"] = bits.read(1)
            chs.append(g)
        grs.append(chs)
    si["granules"] = grs
    return si


def _decode_l3_scalefactors_lsf(bits: _Bits, g: dict, intensity: bool = False):
    """LSF scalefactor decode -> (long_scf[21], short_scf[12][3]);
    sets g['preflag'] from the implied blocknumber. With ``intensity``
    (the right channel of a mode_ext&1 granule) the scalefac_compress
    field selects the 13818-3 intensity layouts (blocknumbers 3-5);
    the decoded values are the per-band intensity POSITIONS, and the
    per-band slen widths plus the intensity_scale bit are stashed on g
    (g['_is_slen_long'], g['_is_scale']) for the stereo processing
    stage's illegal-position check and io scale."""
    if intensity:
        slens, bn, g["_is_scale"] = _lsf_slen_intensity(g)
        g["preflag"] = 0
    else:
        (s1, s2, s3, s4), bn = _lsf_slen(g)
        slens = (s1, s2, s3, s4)
        g["preflag"] = 1 if bn == 2 else 0
    btn = 1 if g["block_type"] == 2 else 0  # mixed blocks raise earlier
    nsfb = _LSF_NSFB[bn][btn]
    if intensity:
        slen_long = [0] * 21
        pos = 0
        for grp, count in enumerate(nsfb):
            for _ in range(count):
                if pos < 21:
                    slen_long[pos] = slens[grp]
                pos += 1
        g["_is_slen_long"] = slen_long
    if g["block_type"] == 2:
        short = [[0] * 3 for _ in range(12)]
        pos = 0
        for grp, count in enumerate(nsfb):
            for _ in range(count // 3):
                for w in range(3):
                    if pos < 12:
                        short[pos][w] = bits.read(slens[grp])
                pos += 1
        return [0] * 21, short
    long_scf = [0] * 21
    pos = 0
    for grp, count in enumerate(nsfb):
        for _ in range(count):
            if pos < 21:
                long_scf[pos] = bits.read(slens[grp])
            pos += 1
    return long_scf, [[0] * 3 for _ in range(12)]


def _decode_l3_scalefactors(bits: _Bits, g: dict, scfsi, gr: int, prev):
    """-> (long_scf[21], short_scf[12][3]); scfsi groups copy granule
    0's values into granule 1 when flagged (long blocks only)."""
    slen1, slen2 = _L3_SLEN[g["scalefac_compress"]]
    if g["block_type"] == 2:
        short = [[0] * 3 for _ in range(12)]
        for s in range(6):
            for w in range(3):
                short[s][w] = bits.read(slen1)
        for s in range(6, 12):
            for w in range(3):
                short[s][w] = bits.read(slen2)
        return [0] * 21, short
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
    long_scf = [0] * 21
    for gi, (lo, hi, slen) in enumerate(groups):
        if gr == 1 and scfsi[gi]:
            src = prev if prev is not None else [0] * 21
            for s in range(lo, hi):
                long_scf[s] = src[s]
        else:
            for s in range(lo, hi):
                long_scf[s] = bits.read(slen)
    return long_scf, [[0] * 3 for _ in range(12)]


def _decode_l3_huffman(bits: _Bits, g: dict, end_bit: int, sfb_long) -> list[int]:
    """big_values pair regions + count1 quadruples -> is[576]."""
    out = [0] * 576
    bv_end = min(2 * g["big_values"], 576)
    if g["window_switching"]:
        r0_end = 36
    else:
        r0_end = sfb_long[min(g["region0_count"] + 1, len(sfb_long) - 1)]
        r1_end = sfb_long[
            min(g["region0_count"] + 1 + g["region1_count"] + 1, len(sfb_long) - 1)
        ]
    line = 0
    while line < bv_end:
        if g["window_switching"]:
            region = 0 if line < r0_end else 1
        else:
            region = 0 if line < r0_end else (1 if line < r1_end else 2)
        tsel = g["table_select"][region]
        if tsel == 0:
            line += 2
            continue
        entry = _L3_PAIR_TABLES.get(tsel)
        if entry is None:
            raise UnsupportedMediaError(
                f"Layer III Huffman table {tsel} not carried by this build"
            )
        table, linbits = entry
        x, y = _huff_lookup(bits, table, 19)
        if x == 15 and linbits:
            x += bits.read(linbits)
        if x and bits.read(1):
            x = -x
        if y == 15 and linbits:
            y += bits.read(linbits)
        if y and bits.read(1):
            y = -y
        out[line], out[line + 1] = x, y
        line += 2
    # count1: quadruples until the granule's bit budget or 576 lines
    while bits.pos < end_bit and line + 4 <= 576:
        mark = bits.pos
        try:
            if g["count1table_select"]:
                idx = bits.read(4)  # table B: fixed 4-bit complement code
                quad = tuple((15 - idx >> (3 - i)) & 1 for i in range(4))
            else:
                quad = _huff_lookup(bits, _L3_QUAD_A, 6)
            vals = []
            for v in quad:
                if v and bits.read(1):
                    v = -v
                vals.append(v)
        except UnsupportedMediaError:
            bits.pos = mark
            break
        if bits.pos > end_bit:  # partial quadruple past the budget: drop
            bits.pos = mark
            break
        out[line : line + 4] = vals
        line += 4
    return out


def _l3_requantize(is_vals, g: dict, long_scf, short_scf, sfb_long, sfb_short):
    """is[576] -> xr[576] per 2.4.3.4.7.x (pow 4/3, gains, pretab)."""
    mult = 0.5 * (1 + g["scalefac_scale"])
    gg = 2.0 ** ((g["global_gain"] - 210) / 4.0)
    xr = np.zeros(576)
    mags = np.abs(np.asarray(is_vals, dtype=np.float64)) ** (4.0 / 3.0)
    signs = np.sign(is_vals)
    if g["block_type"] == 2:
        # transmission order: per sfb, window 0..2, lines within band
        pos = 0
        for s in range(12):
            width = sfb_short[s + 1] - sfb_short[s]
            for w in range(3):
                amp = (
                    gg
                    * 2.0 ** (-2.0 * g["subblock_gain"][w])
                    * 2.0 ** (-mult * short_scf[s][w])
                )
                for i in range(width):
                    xr[pos] = signs[pos] * mags[pos] * amp
                    pos += 1
        return xr
    for s in range(21):
        amp = gg * 2.0 ** (
            -mult * (long_scf[s] + g["preflag"] * _L3_PRETAB[s])
        )
        lo, hi = sfb_long[s], sfb_long[s + 1]
        xr[lo:hi] = signs[lo:hi] * mags[lo:hi] * amp
    # band 21 covers sfb_long[21]..576 with zero scalefactor
    lo, hi = sfb_long[21], 576
    xr[lo:hi] = signs[lo:hi] * mags[lo:hi] * gg
    return xr


def _l3_reorder_short(xr, sfb_short):
    """short-block transmission order (sfb, window, line) -> subband
    order: window-w line j lands at 18*(j//6) + 3*(j%6) + w."""
    out = np.zeros(576)
    pos = 0
    for s in range(12):
        lo, hi = sfb_short[s], sfb_short[s + 1]
        for w in range(3):
            for j in range(lo, hi):
                out[18 * (j // 6) + 3 * (j % 6) + w] = xr[pos]
                pos += 1
    return out


_L3_ALIAS_CI = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
_L3_ALIAS_CS = [1.0 / math.sqrt(1.0 + c * c) for c in _L3_ALIAS_CI]
_L3_ALIAS_CA = [c / math.sqrt(1.0 + c * c) for c in _L3_ALIAS_CI]


def _l3_alias_reduce(xr):
    for sb in range(1, 32):
        base = sb * 18
        for i in range(8):
            a, b = xr[base - 1 - i], xr[base + i]
            xr[base - 1 - i] = a * _L3_ALIAS_CS[i] - b * _L3_ALIAS_CA[i]
            xr[base + i] = b * _L3_ALIAS_CS[i] + a * _L3_ALIAS_CA[i]
    return xr


def _l3_imdct_mats():
    global _L3_IMDCT_CACHE
    try:
        return _L3_IMDCT_CACHE
    except NameError:
        pass
    i36 = np.arange(36)
    k18 = np.arange(18)
    m_long = np.cos(np.pi / 72.0 * (2 * i36[:, None] + 19) * (2 * k18[None, :] + 1))
    i12 = np.arange(12)
    k6 = np.arange(6)
    m_short = np.cos(np.pi / 24.0 * (2 * i12[:, None] + 7) * (2 * k6[None, :] + 1))
    w_norm = np.sin(np.pi / 36.0 * (i36 + 0.5))
    w_short = np.sin(np.pi / 12.0 * (i12 + 0.5))
    w_start = w_norm.copy()
    w_start[18:24] = 1.0
    w_start[24:30] = np.sin(np.pi / 12.0 * (np.arange(24, 30) - 18 + 0.5))
    w_start[30:36] = 0.0
    w_stop = w_norm.copy()
    w_stop[0:6] = 0.0
    w_stop[6:12] = np.sin(np.pi / 12.0 * (np.arange(6, 12) - 6 + 0.5))
    w_stop[12:18] = 1.0
    _L3_IMDCT_CACHE = (m_long, m_short, {0: w_norm, 1: w_start, 3: w_stop}, w_short)
    return _L3_IMDCT_CACHE


def _l3_imdct_granule(xr, block_type: int, overlap: np.ndarray) -> np.ndarray:
    """xr[576] (subband order) + overlap[32,18] state -> time [18,32];
    overlap is updated in place. Includes frequency inversion."""
    m_long, m_short, w_long, w_short = _l3_imdct_mats()
    out = np.empty((18, 32))
    for sb in range(32):
        X = xr[sb * 18 : (sb + 1) * 18]
        if block_type == 2:
            y = np.zeros(36)
            for w in range(3):
                z = (m_short @ X[w::3][:6]) * w_short
                y[6 + 6 * w : 18 + 6 * w] += z
        else:
            y = (m_long @ X) * w_long[block_type]
        out[:, sb] = y[:18] + overlap[sb]
        overlap[sb] = y[18:]
    # frequency inversion: odd subbands negate odd time samples
    out[1::2, 1::2] *= -1.0
    return out


def _l3_intensity_process(xrs, gs, scf_r, isv_r, sfb_long, ms, version):
    """Intensity joint stereo (ISO 11172-3 2.4.3.4.9.3 / 13818-3
    2.4.3.4), applied between requantization and alias reduction.

    The intensity region is every long scalefactor band lying entirely
    above the right channel's highest transmitted nonzero line (its
    "zero part" — band granularity, the libmad/dist10 convention; the
    two reference decoders disagree only when that last line falls
    exactly on a band edge, which no real encoder emits on purpose).
    In the region, the single transmitted (left-channel) spectrum is
    panned per band by the position carried in the right channel's
    scalefactor slot: MPEG-1 uses tan(k*pi/12) ratios (k=7 = band not
    intensity-processed), LSF uses io^ceil(k/2) with
    io = 2^(-1/4 or -1/2) selected by the intensity_scale bit and
    illegal marker (2^slen)-1. Below the region — and in bands whose
    position is the illegal marker — MS processing applies when
    mode_ext & 2, else the channels pass through as transmitted.
    Lines above the last scalefactor band (the pseudo band 21) reuse
    band 20's position. Short/mixed blocks raise (stream-level
    metadata fallback): their per-window zero parts are out of scope."""
    g0, g1 = gs
    if g0["block_type"] == 2 or g1["block_type"] == 2:
        raise UnsupportedMediaError(
            "intensity stereo with short blocks not implemented"
        )
    left, right = xrs
    out_l, out_r = left.copy(), right.copy()
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    last_nz = max((i for i, v in enumerate(isv_r) if v), default=-1)
    if version == 2:
        slen_long = g1.get("_is_slen_long") or [0] * 21
        io = 2.0 ** -0.25 if g1.get("_is_scale") else 2.0 ** -0.5
    for s in range(len(sfb_long) - 1):
        lo, hi = sfb_long[s], sfb_long[s + 1]
        in_region = lo > last_nz
        legal = False
        if in_region:
            is_pos = scf_r[min(s, 20)]
            if version == 1:
                # 7 is the no-intensity marker; 8-15 (slen-4 bands can
                # carry them) are invalid positions — treated the same
                legal = is_pos < 7
                if legal:
                    kl, kr = _L3_IS_GAINS_M1[is_pos]
            else:
                sl = slen_long[min(s, 20)]
                legal = not (sl and is_pos == (1 << sl) - 1)
                if legal:
                    if is_pos == 0:
                        kl = kr = 1.0
                    elif is_pos & 1:
                        kl, kr = io ** ((is_pos + 1) // 2), 1.0
                    else:
                        kl, kr = 1.0, io ** (is_pos // 2)
        if legal:
            out_l[lo:hi] = left[lo:hi] * kl
            out_r[lo:hi] = left[lo:hi] * kr
        elif ms:
            out_l[lo:hi] = (left[lo:hi] + right[lo:hi]) * inv_sqrt2
            out_r[lo:hi] = (left[lo:hi] - right[lo:hi]) * inv_sqrt2
    return [out_l, out_r]


def _decode_l3_frames(frames: list[tuple[dict, bytes]], nch: int, sample_rate: int):
    """[(header, frame_payload)] -> per-channel granule list [18,32].
    Implements the bit reservoir across frames; frames whose back
    pointer reaches before the reservoir start decode as silence (the
    standard cold-start behavior). Handles MPEG-1 (2 granules/frame)
    and MPEG-2 LSF (1 granule/frame, LSF scalefactors)."""
    sfb_long = _L3_SFB_LONG[sample_rate]
    sfb_short = _L3_SFB_SHORT[sample_rate]
    version = frames[0][0]["version"]
    n_gr = 2 if version == 1 else 1
    if version == 1:
        side_bytes = 17 if nch == 1 else 32
    else:
        side_bytes = 9 if nch == 1 else 17
    reservoir = bytearray()
    overlap = [np.zeros((32, 18)) for _ in range(nch)]
    granules: list[list[np.ndarray]] = [[] for _ in range(nch)]
    for h, payload in frames:
        if len(payload) < side_bytes:
            raise UnsupportedMediaError("Layer III side info truncated")
        si = _parse_l3_side_info(_Bits(payload[:side_bytes]), nch, version)
        start_bit = len(reservoir) * 8 - si["main_data_begin"] * 8
        reservoir += payload[side_bytes:]
        if start_bit < 0:
            for ch in range(nch):  # cold start: no reservoir yet
                for _ in range(n_gr):
                    granules[ch].append(
                        _l3_imdct_granule(np.zeros(576), 0, overlap[ch])
                    )
            continue
        bits = _Bits(bytes(reservoir), start_bit)
        prev_long = [None] * nch
        istereo = h["mode"] == 1 and (h["mode_ext"] & 1) != 0 and nch == 2
        ms = h["mode"] == 1 and (h["mode_ext"] & 2) != 0 and nch == 2
        for gr in range(n_gr):
            xrs, gs = [], []
            scf_right = None
            isv_right = None
            for ch in range(nch):
                g = si["granules"][gr][ch]
                gr_end = bits.pos + g["part2_3_length"]
                if version == 2:
                    long_scf, short_scf = _decode_l3_scalefactors_lsf(
                        bits, g, intensity=istereo and ch == 1
                    )
                else:
                    long_scf, short_scf = _decode_l3_scalefactors(
                        bits, g, si["scfsi"][ch], gr, prev_long[ch]
                    )
                if g["block_type"] != 2:
                    prev_long[ch] = long_scf
                is_vals = _decode_l3_huffman(bits, g, gr_end, sfb_long)
                bits.pos = gr_end  # skip stuffing to the granule boundary
                if ch == 1:
                    scf_right, isv_right = long_scf, is_vals
                xrs.append(_l3_requantize(
                    is_vals, g, long_scf, short_scf, sfb_long, sfb_short
                ))
                gs.append(g)
            if istereo:
                xrs = _l3_intensity_process(
                    xrs, gs, scf_right, isv_right, sfb_long, ms, version
                )
            elif ms:
                # MS joint stereo (2.4.3.4.9.2): channels carry
                # mid/side AFTER per-channel requantization;
                # L = (M+S)/sqrt(2), R = (M-S)/sqrt(2) over all lines
                mid, side_ = xrs
                inv_sqrt2 = 1.0 / np.sqrt(2.0)
                xrs = [(mid + side_) * inv_sqrt2, (mid - side_) * inv_sqrt2]
            for ch in range(nch):
                g, xr = gs[ch], xrs[ch]
                if g["block_type"] == 2:
                    xr = _l3_reorder_short(xr, sfb_short)
                else:
                    xr = _l3_alias_reduce(xr)
                granules[ch].append(
                    _l3_imdct_granule(xr, g["block_type"], overlap[ch])
                )
        # bound reservoir growth: keep the spec's 511-byte window plus
        # this frame (a back pointer can never reach further)
        keep_from = max(0, len(reservoir) - (511 + len(payload)))
        if keep_from:
            del reservoir[:keep_from]
    return granules


def decode_mpeg1_audio(data: bytes, return_pcm: bool = False) -> dict:
    """Full PCM decode of an MPEG-1 Layer I/II/III or MPEG-2 LSF
    Layer III stream (ID3v2 skipped, mono/stereo/dual, and — Layer
    III only — MS joint stereo plus long-block intensity stereo;
    short-block intensity raises Unsupported).
    PCM amplitude stats mirror
    decode_wav's contract, decoded=True. ``return_pcm`` adds the raw
    [channels, samples] float array (tests; the Spark kernels ship
    stats only)."""
    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise UnsupportedMediaError("truncated ID3v2 header")
        pos = 10 + (
            ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14)
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        )
    first = -1
    for i in range(pos, min(len(data) - 4, pos + 4096)):
        if _parse_mpeg1_header(data, i):
            first = i
            break
    if first < 0:
        raise UnsupportedMediaError("no decodable MPEG audio frame sync found")
    h0 = _parse_mpeg1_header(data, first)
    if h0["mode"] == 1 and h0["layer"] != 3:
        # Layer I/II joint stereo IS intensity coding; Layer III MS
        # stereo decodes (the per-frame intensity bit is checked in
        # _decode_l3_frames, where mode_ext is in hand)
        raise UnsupportedMediaError("intensity joint stereo not implemented")
    nch = h0["channels"]
    granules = [[] for _ in range(nch)]
    l3_frames: list[tuple[dict, bytes]] = []
    pos, n_frames, kbps_sum = first, 0, 0
    while True:
        h = _parse_mpeg1_header(data, pos)
        if (
            h is None
            or h["layer"] != h0["layer"]
            or h["version"] != h0["version"]
            or h["sample_rate"] != h0["sample_rate"]
            or h["channels"] != h0["channels"]
            # Layer I/II decode assumes frame-0 mode throughout (a
            # mid-stream switch to joint stereo = intensity coding);
            # Layer III re-checks mode/mode_ext per frame in
            # _decode_l3_frames, so only a channel-count change breaks.
            or (h["layer"] != 3 and h["mode"] != h0["mode"])
        ):
            break
        if pos + h["flen"] > len(data):
            break  # trailing truncated frame: keep what fully decoded
        payload = data[pos + 4 + (2 if h["crc"] else 0) : pos + h["flen"]]
        if h["layer"] == 3:
            # Layer III main data spans frames (bit reservoir): collect
            # every frame first, decode the stream as a whole below
            l3_frames.append((h, payload))
            n_frames += 1
            kbps_sum += h["kbps"]
            pos += h["flen"]
            continue
        bits = _Bits(payload)
        try:
            if h["layer"] == 1:
                frame = _decode_frame_l1(bits, nch)
            else:
                frame = _decode_frame_l2(bits, nch, h["sample_rate"], h["kbps"])
        except UnsupportedMediaError:
            if n_frames == 0:
                raise
            break  # mid-stream corruption: stop at last good frame
        for ch in range(nch):
            granules[ch].append(frame[ch])
        n_frames += 1
        kbps_sum += h["kbps"]
        pos += h["flen"]
    if n_frames < 2:
        raise UnsupportedMediaError("fewer than 2 decodable MPEG audio frames")
    if l3_frames:
        granules = _decode_l3_frames(l3_frames, nch, h0["sample_rate"])
    pcm = np.stack(
        [_pqmf_synthesize(np.concatenate(granules[ch])) for ch in range(nch)]
    )
    mono = pcm.mean(axis=0)
    rms = float(np.sqrt(np.mean(mono**2))) if mono.size else 0.0
    peak = float(np.max(np.abs(mono))) if mono.size else 0.0
    zcr = (
        float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
        if mono.size > 1
        else 0.0
    )
    sr = h0["sample_rate"]
    extra = {"pcm": pcm} if return_pcm else {}
    return {
        **extra,
        "kind": "audio",
        "decoded": True,
        "channels": nch,
        "sample_rate": sr,
        "n_frames": int(n_frames),
        "n_samples": int(pcm.shape[1]),
        "duration_sec": float(pcm.shape[1] / sr),
        "bitrate_kbps": float(kbps_sum / n_frames),
        "mpeg_version": h0["version"],
        "layer": h0["layer"],
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zcr,
    }


def decode_mpeg_audio(data: bytes) -> dict:
    """Dispatch: full PCM decode for MPEG-1 Layer I/II and for
    Layer III — MPEG-1 and MPEG-2 LSF, mono/stereo/dual, MS joint
    stereo, and long-block intensity stereo — within the carried
    Huffman subset; container metadata (decoded=False) for MPEG-2.5,
    short-block intensity, and streams selecting uncarried big-value
    tables."""
    try:
        return decode_mpeg1_audio(data)
    except UnsupportedMediaError:
        return decode_mp3_meta(data)


class _BitsW:
    """MSB-first bit writer (encoder fixtures)."""

    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                self.acc = self.n = 0

    def pad_to(self, total_bytes: int) -> bytes:
        while self.n:
            self.write(0, 1)
        if len(self.bytes) > total_bytes:  # budget accounting bug, not data
            raise ValueError(
                f"encoder overflowed frame: {len(self.bytes)} > {total_bytes} bytes"
            )
        return bytes(self.bytes) + b"\x00" * (total_bytes - len(self.bytes))


def _scf_index(peak: float) -> int:
    """Smallest scalefactor >= peak (so |s''| < 1), clamped to table."""
    for i in range(62, -1, -1):
        if _SCALEFACTORS[i] >= peak * 1.000001:
            return i
    return 0


def _encode_frames_l1(sub: list[np.ndarray], kbps: int, sample_rate: int) -> bytes:
    """Layer I frames from per-channel [G, 32] subband granules.
    Allocation: 12 bits to every subband whose frame-peak is audible,
    budget permitting (highest-energy first)."""
    nch = len(sub)
    G = len(sub[0])
    br_idx = _MP3_BITRATE_V1_L1.index(kbps)
    sr_idx = _MP3_SR[3].index(sample_rate)
    mode = 3 if nch == 1 else 0
    hdr = bytes((0xFF, 0xFF, (br_idx << 4) | (sr_idx << 2), mode << 6))
    flen = (12 * kbps * 1000 // sample_rate) * 4
    out = bytearray()
    nb = 12
    for f in range(G // 12):
        blk = [s[f * 12 : (f + 1) * 12] for s in sub]
        peaks = [np.abs(b).max(axis=0) for b in blk]
        budget = (flen - 4) * 8 - 32 * 4 * nch
        active = sorted(
            ((peaks[ch][sb], ch, sb) for ch in range(nch) for sb in range(32)),
            reverse=True,
        )
        chosen = set()
        for p, ch, sb in active:
            if p < 1e-6:
                break
            cost = 6 + 12 * nb
            if budget - cost < 0:
                break
            budget -= cost
            chosen.add((ch, sb))
        w = _BitsW()
        for sb in range(32):
            for ch in range(nch):
                w.write(nb - 1 if (ch, sb) in chosen else 0, 4)
        scf = {}
        for sb in range(32):
            for ch in range(nch):
                if (ch, sb) in chosen:
                    idx = _scf_index(peaks[ch][sb])
                    scf[(ch, sb)] = _SCALEFACTORS[idx]
                    w.write(idx, 6)
        for s in range(12):
            for sb in range(32):
                for ch in range(nch):
                    if (ch, sb) in chosen:
                        w.write(
                            _quant(blk[ch][s, sb] / scf[(ch, sb)], nb, (1 << nb) - 1),
                            nb,
                        )
        out += hdr + w.pad_to(flen - 4)
    return bytes(out)


def _encode_frames_l2(sub: list[np.ndarray], kbps: int, sample_rate: int) -> bytes:
    """Layer II frames from per-channel [G, 32] granules. Active
    subbands get the 15-level ungrouped code where the table offers it,
    the 5-level GROUPED code on the top rows — so fixtures exercise
    both sample layouts. scfsi varies 0/2 to exercise scalefactor
    sharing."""
    nch = len(sub)
    rows, sblimit = _l2_table(sample_rate, kbps / nch)
    br_idx = _MP3_BITRATE_V1_L2.index(kbps)
    sr_idx = _MP3_SR[3].index(sample_rate)
    mode = 3 if nch == 1 else 0
    hdr = bytes((0xFF, 0xFD, (br_idx << 4) | (sr_idx << 2), mode << 6))
    flen = 144 * kbps * 1000 // sample_rate
    out = bytearray()
    G = len(sub[0])
    for f in range(G // 36):
        blk = [s[f * 36 : (f + 1) * 36] for s in sub]
        peaks = [np.abs(b).max(axis=0) for b in blk]
        w = _BitsW()
        levels_of = [[0] * sblimit for _ in range(nch)]
        code_of = [[0] * sblimit for _ in range(nch)]

        def _cost(sb: int, lv: int) -> int:  # bits beyond the alloc field
            scf_bits = 2 + (18 if sb % 2 == 0 else 6)  # scfsi + scalefactors
            samp = 12 * (_L2_GROUP_BITS[lv] if lv in _L2_GROUP_BITS else 3 * lv.bit_length())
            return scf_bits + samp

        budget = (flen - 4) * 8 - sum(rows[sb][0] * nch for sb in range(sblimit))
        active = []
        for sb in range(sblimit):
            _, steps = rows[sb]
            for ch in range(nch):
                if peaks[ch][sb] >= 1e-6:
                    lv = 15 if 15 in steps else 5
                    active.append((peaks[ch][sb], ch, sb, lv))
        # fit the budget: keep the loudest subbands, drop the rest
        active.sort(reverse=True)
        for p, ch, sb, lv in active:
            c = _cost(sb, lv)
            if budget - c < 0:
                continue
            budget -= c
            levels_of[ch][sb] = lv
            code_of[ch][sb] = rows[sb][1].index(lv) + 1
        for sb in range(sblimit):
            nbal, _ = rows[sb]
            for ch in range(nch):
                w.write(code_of[ch][sb], nbal)
        for sb in range(sblimit):
            for ch in range(nch):
                if levels_of[ch][sb]:
                    w.write(0 if sb % 2 == 0 else 2, 2)  # scfsi 0 / 2
        scf = {}
        for sb in range(sblimit):
            for ch in range(nch):
                if not levels_of[ch][sb]:
                    continue
                parts = np.abs(blk[ch][:, sb]).reshape(3, 12).max(axis=1)
                if sb % 2 == 0:  # scfsi 0: three scalefactors
                    idx = [_scf_index(p) for p in parts]
                    for i in idx:
                        w.write(i, 6)
                    scf[(ch, sb)] = tuple(_SCALEFACTORS[i] for i in idx)
                else:  # scfsi 2: one shared scalefactor
                    i = _scf_index(parts.max())
                    w.write(i, 6)
                    scf[(ch, sb)] = (_SCALEFACTORS[i],) * 3
        for gr in range(12):
            part = gr >> 2
            for sb in range(sblimit):
                for ch in range(nch):
                    levels = levels_of[ch][sb]
                    if not levels:
                        continue
                    sf = scf[(ch, sb)][part]
                    nb = levels.bit_length()
                    cs = [
                        _quant(blk[ch][3 * gr + i, sb] / sf, nb, levels)
                        for i in range(3)
                    ]
                    if levels in _L2_GROUP_BITS:
                        w.write(
                            cs[0] + levels * (cs[1] + levels * cs[2]),
                            _L2_GROUP_BITS[levels],
                        )
                    else:
                        for c in cs:
                            w.write(c, nb)
        out += hdr + w.pad_to(flen - 4)
    return bytes(out)


def encode_mpeg1_fixture(
    samples: np.ndarray,
    layer: int = 2,
    kbps: int = 192,
    sample_rate: int = 48000,
    channels: int = 1,
) -> bytes:
    """REAL MPEG-1 Layer I/II encoder for fixtures: PCM -> analysis
    filterbank -> scalefactor + quantize -> valid frames that
    decode_mpeg1_audio round-trips to matching PCM (test-asserted
    correlation >= 0.95 against the input)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = np.tile(x, (channels, 1))
    sub = [_pqmf_analyze(x[ch]) for ch in range(channels)]
    if layer == 1:
        return _encode_frames_l1(sub, kbps, sample_rate)
    return _encode_frames_l2(sub, kbps, sample_rate)


def _l3_fixture_granule_spec(gidx: int, ch: int, with_short: bool) -> dict:
    """Deterministic per-granule spectral 'paint': which block type,
    which (band[, window]) lines carry ±1, and each band's scalefactor.
    Shared by the encoder and the independent test reference."""
    if with_short:
        block_type = (1, 2, 3, 0)[gidx % 4]
    else:
        block_type = 0
    if block_type == 2:
        # short: one active line per (sfb, window) for three sfbs
        lines = [
            (3, w, 0, 1 if (w + ch) % 2 == 0 else -1) for w in range(3)
        ] + [(5, 0, 1, 1), (7, 2, 0, -1)]
        scf = {(3, 0): 2, (3, 1): 3, (3, 2): 4, (5, 0): 1, (7, 2): 5}
        return {
            "block_type": 2,
            "subblock_gain": [0, 1, 0],
            "lines": lines,
            "scf": scf,
        }
    # long: first line of a few bands, signs/scalefactors varied
    bands = [2 + (gidx % 3), 6, 10, 14 + ch]
    lines = [
        (b, 0, 1 if (i + gidx) % 2 == 0 else -1) for i, b in enumerate(bands)
    ]
    scf = {b: (2 * i + gidx % 4) % 8 for i, b in enumerate(bands)}
    return {"block_type": block_type, "subblock_gain": [0, 0, 0],
            "lines": lines, "scf": scf}


def _l3_fixture_tvals_scf(spec: dict, sfb_long, sfb_short):
    """spec -> (transmission-order is[576], long_scf[21], short_scf[12][3])."""
    tvals = [0] * 576
    long_scf = [0] * 21
    short_scf = [[0] * 3 for _ in range(12)]
    if spec["block_type"] == 2:
        for (s, w), v in spec["scf"].items():
            short_scf[s][w] = v
        for s, w, k, sign in spec["lines"]:
            width = sfb_short[s + 1] - sfb_short[s]
            # transmission index: 3 windows per preceding sfb, then w
            # windows of this sfb, then line k
            t = 3 * sfb_short[s] + w * width + k
            tvals[t] = sign
    else:
        for b, v in spec["scf"].items():
            long_scf[b] = v
        for b, k, sign in spec["lines"]:
            tvals[sfb_long[b] + k] = sign
    # big-value lines: (transmission line index, signed magnitude) —
    # painted verbatim; the encoder routes lines below 2*big_values
    # through the selected B.7 pair table instead of count1 quads
    for t, v in spec.get("big_lines", ()):
        tvals[t] = v
    return tvals, long_scf, short_scf


def encode_mp3_audio_fixture(
    n_frames: int = 12,
    kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 1,
    with_short: bool = False,
    count1_table: str = "A",
    spec_fn=None,
    big_table: int | None = None,
    version: int = 1,
    joint_ms: bool = False,
    joint_is: bool = False,
    lsf_intensity_scale: int = 0,
) -> bytes:
    """REAL MPEG-1 Layer III audio fixture: every granule paints a
    deterministic sparse spectrum (±1 lines in the count1 region,
    amplitudes via per-band scalefactors with scalefac_scale=1 and
    global_gain=210), producing a valid bitstream any Layer III
    decoder accepts — decode_mpeg1_audio round-trips it to PCM whose
    spectral content the tests verify against an independent IMDCT/
    synthesis reference. With ``big_table`` set, every spec line below
    2*big_values — the granule spec's ``big_lines`` (line, value)
    entries, values beyond ±1 welcome — is coded through that ISO
    Table B.7 pair table (ESC + linbits for the 16-23 family),
    exercising the big-values region real encoders emit; otherwise
    big_values=0 and the spectrum rides count1 alone.
    ``spec_fn(gidx, ch, with_short) -> spec`` overrides
    the default deterministic paint (property tests inject random
    spectra through the same bitstream path). ``version=2`` emits
    MPEG-2 LSF frames (576 samples/frame, 9-bit scalefac_compress 399
    -> LSF slen (4,4,3,3), whose per-band bit widths match the MPEG-1
    fixture convention exactly)."""
    sfb_long = _L3_SFB_LONG[sample_rate]
    sfb_short = _L3_SFB_SHORT[sample_rate]
    lsf = version == 2
    if lsf:
        br_idx = _MP3_BITRATE_V2_L3.index(kbps)
        sr_idx = _MP3_SR[2].index(sample_rate)
    else:
        br_idx = _MP3_BITRATE_V1_L3.index(kbps)
        sr_idx = _MP3_SR[3].index(sample_rate)
    nch = channels
    if joint_ms or joint_is:
        if nch != 2:
            raise ValueError("joint stereo needs channels=2")
        # ch0 carries the signal (mid when MS); ch1 carries side data
        # below the intensity bound and is_pos values in its
        # scalefactor slots above it
        mode = 1
        mode_ext = (2 if joint_ms else 0) | (1 if joint_is else 0)
    else:
        mode, mode_ext = (3 if nch == 1 else 0), 0
    hdr = bytes((0xFF, 0xF3 if lsf else 0xFB,
                 (br_idx << 4) | (sr_idx << 2), (mode << 6) | (mode_ext << 4)))
    flen = (72 if lsf else 144) * kbps * 1000 // sample_rate
    if lsf:
        side_bytes = 9 if nch == 1 else 17
    else:
        side_bytes = 17 if nch == 1 else 32
    n_gr = 1 if lsf else 2
    use_b = count1_table.upper() == "B"
    out = bytearray()
    for f in range(n_frames):
        side = _BitsW()
        side.write(0, 8 if lsf else 9)  # main_data_begin: no reservoir
        if lsf:
            side.write(0, 1 if nch == 1 else 2)
        else:
            side.write(0, 5 if nch == 1 else 3)
            for _ch in range(nch):
                side.write(0, 4)  # scfsi
        main = _BitsW()
        for gr in range(n_gr):
            for ch in range(nch):
                spec = (spec_fn or _l3_fixture_granule_spec)(
                    n_gr * f + gr, ch, with_short
                )
                tvals, long_scf, short_scf = _l3_fixture_tvals_scf(
                    spec, sfb_long, sfb_short
                )
                bt = spec["block_type"]
                is_chan = joint_is and ch == 1  # intensity-position channel
                # part2: scalefactors (scalefac_compress 15 -> slen 4/3;
                # LSF intensity channel: int_sc 129 -> blocknumber 3,
                # uniform slen 3 over all 21 bands)
                g_bits = _BitsW()
                if bt == 2:
                    for s in range(12):
                        for w in range(3):
                            g_bits.write(short_scf[s][w], 4 if s < 6 else 3)
                elif lsf and is_chan:
                    for s in range(21):
                        g_bits.write(long_scf[s], 3)
                else:
                    for s in range(21):
                        g_bits.write(long_scf[s], 4 if s < 11 else 3)
                # huffman: big-value pairs (selected B.7 table), then
                # count1 quadruples covering the remaining active lines
                last = max((i for i, v in enumerate(tvals) if v), default=-1)
                big_lines = spec.get("big_lines", ())
                if big_lines and big_table is None:
                    raise ValueError("spec has big_lines but no big_table")
                bv = 0
                if big_table is not None and big_lines:
                    bv = (max(t for t, _ in big_lines) + 2) // 2
                bv_end = 2 * bv
                enc_tab, linbits, tdim = (
                    _L3_PAIR_ENC[big_table] if bv else (None, 0, 0)
                )
                for pi in range(bv):
                    vx, vy = tvals[2 * pi], tvals[2 * pi + 1]
                    ax, ay = abs(vx), abs(vy)
                    sx = 15 if (linbits and ax >= 15) else ax
                    sy = 15 if (linbits and ay >= 15) else ay
                    if sx >= tdim or sy >= tdim:
                        raise ValueError(
                            f"|value| {max(ax, ay)} exceeds table "
                            f"{big_table} range"
                        )
                    if linbits and max(ax - sx, ay - sy) >= (1 << linbits):
                        raise ValueError(
                            f"linbits overflow for table {big_table}"
                        )
                    hlen, hcod = enc_tab[(sx, sy)]
                    g_bits.write(hcod, hlen)
                    if sx == 15 and linbits:
                        g_bits.write(ax - 15, linbits)
                    if ax:
                        g_bits.write(1 if vx < 0 else 0, 1)
                    if sy == 15 and linbits:
                        g_bits.write(ay - 15, linbits)
                    if ay:
                        g_bits.write(1 if vy < 0 else 0, 1)
                nquads = (last + 1 - bv_end + 3) // 4 if last >= bv_end else 0
                for qi in range(nquads):
                    quad = tvals[bv_end + 4 * qi : bv_end + 4 * qi + 4]
                    if any(abs(v) > 1 for v in quad):
                        raise ValueError(
                            "count1 region holds a |value| > 1; extend "
                            "big_lines to cover it"
                        )
                    pattern = tuple(1 if v else 0 for v in quad)
                    if use_b:
                        idx = 15 - (
                            (pattern[0] << 3) | (pattern[1] << 2)
                            | (pattern[2] << 1) | pattern[3]
                        )
                        g_bits.write(idx, 4)
                    else:
                        hlen, hcod = _L3_QUAD_A_ENC[pattern]
                        g_bits.write(hcod, hlen)
                    for v in quad:
                        if v:
                            g_bits.write(1 if v < 0 else 0, 1)
                part2_3 = len(g_bits.bytes) * 8 + g_bits.n
                # side info for this granule/channel
                side.write(part2_3, 12)
                side.write(bv, 9)  # big_values (pairs)
                side.write(210, 8)  # global_gain (unity)
                if lsf:
                    if is_chan:
                        # intensity layout: int_sc 129 -> slens (3,3,3),
                        # blocknumber 3 (7+7+7 bands), low bit = io scale
                        side.write((129 << 1) | (lsf_intensity_scale & 1), 9)
                    else:
                        # 399 -> LSF slen (4,4,3,3): the same 4-then-3
                        # bit widths per band the MPEG-1 paint uses
                        side.write(399, 9)
                else:
                    side.write(15, 4)  # scalefac_compress -> slen (4, 3)
                tsel = big_table if bv else 1
                if bt == 0:
                    side.write(0, 1)  # window_switching off
                    for _r in range(3):
                        side.write(tsel, 5)  # table_select
                    side.write(0, 4)  # region0_count
                    side.write(0, 3)  # region1_count
                else:
                    side.write(1, 1)
                    side.write(bt, 2)
                    side.write(0, 1)  # mixed_block off
                    side.write(tsel, 5)
                    side.write(tsel, 5)
                    for sbg in spec["subblock_gain"]:
                        side.write(sbg, 3)
                if not lsf:
                    side.write(0, 1)  # preflag
                side.write(1, 1)  # scalefac_scale -> multiplier 1.0
                side.write(1 if use_b else 0, 1)  # count1table_select
                # append the granule's main-data bits
                carry = g_bits.bytes, g_bits.n, g_bits.acc
                for byte in carry[0]:
                    main.write(byte, 8)
                if carry[1]:
                    main.write(carry[2], carry[1])
        frame = hdr + side.pad_to(side_bytes) + main.pad_to(flen - 4 - side_bytes)
        out += frame
    return bytes(out)


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4_children(data: bytes, start: int, end: int, depth: int = 0):
    """Iterate (type, body_start, body_end) over the boxes in a span."""
    if depth > 8:
        raise UnsupportedMediaError("MP4 box nesting too deep")
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise UnsupportedMediaError("MP4 largesize truncated")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise UnsupportedMediaError("MP4 box size out of range")
        yield btype, body, pos + size
        pos += size


def decode_mp4_meta(data: bytes) -> dict:
    """Parse ISO-BMFF (MP4) container metadata: brand, movie duration
    from mvhd, per-track handler types + sample-entry codec fourccs
    from trak/mdia/hdlr + stbl/stsd, video geometry from tkhd."""
    if len(data) < 16:
        raise UnsupportedMediaError("not an MP4 (too short)")
    brand = None
    moov_span = None
    for btype, b0, b1 in _mp4_children(data, 0, len(data)):
        if btype == b"ftyp" and b0 + 4 <= b1:
            brand = data[b0 : b0 + 4].decode("latin-1", "replace")
        elif btype == b"moov":
            moov_span = (b0, b1)
    if brand is None or moov_span is None:
        raise UnsupportedMediaError("MP4 missing ftyp/moov")
    duration_sec = 0.0
    tracks = []  # (handler, codec, width, height)
    for btype, b0, b1 in _mp4_children(data, *moov_span, depth=1):
        if btype == b"mvhd":
            ver = data[b0]
            if ver == 1:
                timescale, dur = struct.unpack_from(">IQ", data, b0 + 20)
            else:
                timescale, dur = struct.unpack_from(">II", data, b0 + 12)
            if timescale:
                duration_sec = dur / timescale
        elif btype == b"trak":
            handler = codec = None
            width = height = 0.0
            for t, t0, t1 in _mp4_children(data, b0, b1, depth=2):
                if t == b"tkhd":
                    ver = data[t0]
                    off = t1 - 8  # width/height: last 8 payload bytes (16.16)
                    w16, h16 = struct.unpack_from(">II", data, off)
                    width, height = w16 / 65536.0, h16 / 65536.0
                elif t == b"mdia":
                    for m, m0, m1 in _mp4_children(data, t0, t1, depth=3):
                        if m == b"hdlr":
                            handler = data[m0 + 8 : m0 + 12].decode("latin-1", "replace")
                        elif m == b"minf":
                            for s, s0, s1 in _mp4_children(data, m0, m1, depth=4):
                                if s == b"stbl":
                                    for x, x0, x1 in _mp4_children(data, s0, s1, depth=5):
                                        if x == b"stsd" and x0 + 16 <= x1:
                                            codec = data[x0 + 12 : x0 + 16].decode(
                                                "latin-1", "replace"
                                            )
            tracks.append((handler, codec, width, height))
    vids = [t for t in tracks if t[0] == "vide"]
    return {
        "kind": "video",
        "decoded": False,
        "major_brand": brand,
        "duration_sec": float(duration_sec),
        "n_tracks": len(tracks),
        "has_video": any(t[0] == "vide" for t in tracks),
        "has_audio": any(t[0] == "soun" for t in tracks),
        "codecs": sorted({t[1] for t in tracks if t[1]}),
        "width": float(vids[0][2]) if vids else 0.0,
        "height": float(vids[0][3]) if vids else 0.0,
    }


def encode_mp4_fixture(
    duration_sec: float = 5.0,
    video: tuple | None = (640, 360, b"avc1"),
    audio: bytes | None = b"mp4a",
) -> bytes:
    """Deterministic minimal ISO-BMFF fixture: ftyp + moov(mvhd, one
    trak per modality with tkhd/mdia/mdhd/hdlr/minf/stbl/stsd) + empty
    mdat. Header-parseable, not playable."""
    timescale = 1000
    dur = int(duration_sec * timescale)

    def full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
        return _mp4_box(btype, bytes([version, 0, 0, 0]) + payload)

    def trak(handler: bytes, codec: bytes, track_id: int, w: int = 0, h: int = 0) -> bytes:
        tkhd = full(
            b"tkhd",
            struct.pack(">IIII", 0, 0, track_id, 0)
            + struct.pack(">I", dur)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0x0100 if handler == b"soun" else 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = full(
            b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0)
        )
        hdlr = full(b"hdlr", struct.pack(">I", 0) + handler + b"\x00" * 12 + b"h\x00")
        entry = _mp4_box(codec, b"\x00" * 70)  # minimal sample entry body
        stsd = full(b"stsd", struct.pack(">I", 1) + entry)
        stbl = _mp4_box(b"stbl", stsd)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        return _mp4_box(b"trak", tkhd + mdia)

    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">Ihhii", 0x00010000, 0x0100, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 99),
    )
    traks = b""
    tid = 1
    if video is not None:
        w, h, codec = video
        traks += trak(b"vide", codec, tid, w, h)
        tid += 1
    if audio is not None:
        traks += trak(b"soun", audio, tid)
    return (
        _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
        + _mp4_box(b"moov", mvhd + traks)
        + _mp4_box(b"mdat", b"")
    )


# --- perceptual hashing ------------------------------------------------------


def decode_image_gray(data: bytes, mime: str) -> np.ndarray:
    """Decode any supported image format to a grayscale float64 (H, W)
    array (ITU-R BT.601 luma for color), the input contract of
    ``phash64``. Raises UnsupportedMediaError for non-images or broken
    bytes, same per-file skip contract as media_features_ex."""
    if mime == "image/png":
        m = decode_png(data, keep_pixels=True)
    elif mime in ("image/bmp", "image/x-ms-bmp"):
        m = decode_bmp(data, keep_pixels=True)
    elif mime == "image/jpeg":
        m = decode_jpeg(data, keep_pixels=True)
    else:
        raise UnsupportedMediaError(f"not a supported image mime: {mime}")
    px = m["pixels"]
    if px.shape[2] == 1:
        return px[:, :, 0]
    # BT.601 luma; alpha (if any) ignored
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def phash64(gray: np.ndarray) -> int:
    """Perceptual hash (pHash): nearest-neighbor resample to 32x32,
    orthonormal 2-D DCT-II, keep the 8x8 low-frequency block, drop the
    DC term, threshold the remaining 63 coefficients at their median
    -> a 63-bit signature in an int64. Robust to re-encoding (JPEG
    quality), small brightness/contrast shifts (median threshold), and
    resampling; structurally different images land far apart in
    Hamming space."""
    s = 32
    h, w = gray.shape
    if h == 0 or w == 0:
        raise UnsupportedMediaError("degenerate image for phash")
    rows = (np.arange(s) * h) // s
    cols = (np.arange(s) * w) // s
    img = gray[np.ix_(rows, cols)].astype(np.float64)
    n = np.arange(s)
    D = np.sqrt(2.0 / s) * np.cos(np.pi * (2 * n[None, :] + 1) * n[:, None] / (2 * s))
    D[0] *= np.sqrt(0.5)
    f = D @ img @ D.T
    vals = f[:8, :8].flatten()[1:]  # 63 ac-ish coefficients, DC dropped
    med = float(np.median(vals))
    out = 0
    for v in vals:
        out = (out << 1) | int(v > med)
    return out


def ensure_phash_fixture_dir(media_dir: str, n_base: int = 5) -> str:
    """Materialize the committed near-duplicate image corpus
    (idempotent). Per base image (seeded smooth low-frequency content,
    64x48): the exact pixels as PNG, a JPEG quality-85 re-encode
    (lossy near-dup), and a brightness +8 PNG (photometric near-dup)
    -- so the planted duplicate groups are {base, jpeg-dup,
    bright-dup} x n_base, and every cross-base pair is a true
    negative. Used by the image_phash_neardup query and
    tests/test_phash.py."""
    marker = os.path.join(media_dir, ".complete")
    if os.path.exists(marker):
        return media_dir
    os.makedirs(media_dir, exist_ok=True)
    w, h = 64, 48
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n_base):
        # smooth, seeded, structurally distinct content per base:
        # mixed low-frequency sines + a diagonal gradient
        a, b, c = 0.7 + 0.31 * i, 1.3 + 0.47 * i, 0.9 + 0.23 * i
        base = (
            96.0
            + 60.0 * np.sin(a * xx / 9.0 + i)
            + 45.0 * np.cos(b * yy / 7.0 - 2 * i)
            + 30.0 * np.sin(c * (xx + 2 * yy) / 16.0)
        )
        arr = np.clip(base, 0, 255).astype(np.uint8)
        rgb = np.stack([arr, np.roll(arr, i + 1, axis=1), 255 - arr], axis=-1)
        with open(os.path.join(media_dir, f"base_{i:02d}.png"), "wb") as f:
            f.write(encode_png(rgb))
        with open(os.path.join(media_dir, f"dupjpeg_{i:02d}.jpg"), "wb") as f:
            f.write(encode_jpeg(rgb, quality=85, subsample="444"))
        bright = np.clip(rgb.astype(np.int16) + 8, 0, 255).astype(np.uint8)
        with open(os.path.join(media_dir, f"dupbright_{i:02d}.png"), "wb") as f:
            f.write(encode_png(bright))
    with open(marker, "w") as f:
        f.write("ok")
    return media_dir


# --- audio fingerprinting ----------------------------------------------------


def decode_audio_pcm(data: bytes, mime: str) -> tuple[np.ndarray, int]:
    """Decode a supported audio format to (mono float64 samples,
    sample_rate) — the input contract of ``afp56``. WAV via the stdlib
    wave module; audio/mpeg via the Layer I/II PCM decoder (Layer III
    raises, the per-file skip contract)."""
    if mime in ("audio/wav", "audio/x-wav"):
        m = decode_wav(data, keep_samples=True)
        s = m["samples"]
        ch = m["channels"]
        if ch > 1:
            n = (s.size // ch) * ch
            s = s[:n].reshape(-1, ch).mean(axis=1)
        return s, m["sample_rate"]
    if mime == "audio/mpeg":
        m = decode_mpeg1_audio(data, return_pcm=True)
        pcm = m["pcm"]
        return pcm.mean(axis=0), m["sample_rate"]
    raise UnsupportedMediaError(f"not a supported audio mime: {mime}")


def afp56(samples: np.ndarray, rate: int) -> int:
    """Audio fingerprint: 56 log-spaced ABSOLUTE-Hz bands (100-2400
    Hz) over the WHOLE-clip power spectrum, bit b = band energy above
    -20 dB of the loudest band. Whole-clip magnitude spectrum makes it
    TIME-SHIFT invariant (a lossy codec's filterbank group delay --
    MPEG-1's polyphase adds ~480 samples -- moves no bits; measured:
    frame-based time-delta bits scrambled to Hamming ~32/56 on MP2
    round-trips, this form moves <= 1 bit), relative threshold makes
    it GAIN invariant, absolute-Hz bands make it RATE invariant. A
    tonal clip sets the bands its partials occupy; structurally
    different content sets different bands (planted corpus: same-group
    <= 1, cross-group >= 7)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size < 256 or rate <= 0:
        raise UnsupportedMediaError("audio too short for fingerprint")
    n_bands = 56
    edges = np.exp(np.linspace(np.log(100.0), np.log(2400.0), n_bands + 1))
    if edges[-1] > rate / 2:
        raise UnsupportedMediaError(f"sample rate {rate} below fingerprint band ceiling")
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size))) ** 2
    freqs = np.fft.rfftfreq(x.size, d=1.0 / rate)
    E = np.empty(n_bands)
    for b in range(n_bands):
        sel = (freqs >= edges[b]) & (freqs < edges[b + 1])
        E[b] = float(spec[sel].sum())
    thresh = 1e-2 * (float(E.max()) or 1.0)  # -20 dB of the loudest band
    out = 0
    for e in E:
        out = (out << 1) | int(e > thresh)
    return out


def ensure_afp_fixture_dir(media_dir: str, n_base: int = 4) -> str:
    """Materialize the committed near-duplicate AUDIO corpus
    (idempotent). Per base clip (seeded 3-sine mixture with an AM
    envelope, 0.5 s at 32 kHz): the exact PCM as WAV, a REAL MPEG-1
    Layer II 192 kbps re-encode (lossy near-dup through the actual
    encoder+decoder pair), and a gain x0.7 WAV (photometric twin).
    Planted groups {wav, mp2, gain} x n_base; cross-base pairs are
    true negatives."""
    marker = os.path.join(media_dir, ".complete")
    if os.path.exists(marker):
        return media_dir
    os.makedirs(media_dir, exist_ok=True)
    rate = 32000
    t = np.arange(rate // 2) / rate
    # disjoint log-spaced frequency triplets per base: no partial is
    # shared across groups, so cross-group fingerprints stay far apart
    freq_grid = np.exp(np.linspace(np.log(130.0), np.log(2200.0), 3 * n_base))
    for i in range(n_base):
        f1, f2, f3 = freq_grid[i], freq_grid[i + n_base], freq_grid[i + 2 * n_base]
        env = 0.6 + 0.4 * np.sin(2 * math.pi * (1.5 + i) * t)
        s = env * (
            0.5 * np.sin(2 * math.pi * f1 * t)
            + 0.3 * np.sin(2 * math.pi * f2 * t + i)
            + 0.2 * np.sin(2 * math.pi * f3 * t + 2 * i)
        )
        s *= 0.8 / np.max(np.abs(s))
        with open(os.path.join(media_dir, f"base_{i:02d}.wav"), "wb") as f:
            f.write(encode_wav(s, rate=rate))
        with open(os.path.join(media_dir, f"dupmp2_{i:02d}.mp2"), "wb") as f:
            f.write(encode_mpeg1_fixture(s, layer=2, kbps=192, sample_rate=rate))
        with open(os.path.join(media_dir, f"dupgain_{i:02d}.wav"), "wb") as f:
            f.write(encode_wav(0.7 * s, rate=rate))
    with open(marker, "w") as f:
        f.write("ok")
    return media_dir

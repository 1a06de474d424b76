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

Formats that genuinely require a codec library (JPEG, MP3, MP4) are
rejected with ``UnsupportedMediaError``; the Arrow-batched kernel in
``multimodal.py`` is the boundary where PIL/ffmpeg would plug in.

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


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def decode_png(data: bytes) -> dict:
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


def decode_wav(data: bytes) -> dict:
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
    else:
        # JPEG/MP3/MP4 need PIL/ffmpeg — the mapInPandas kernel in
        # multimodal.py is where those decoders would plug in
        raise UnsupportedMediaError(f"no pure-stdlib decoder for {mime}")
    vec = vec[:dim]
    return vec + [0.0] * (dim - len(vec))


def ensure_media_fixture_dir(
    media_dir: str, n_png: int = 8, n_wav: int = 8, n_bmp: int = 4
) -> str:
    """Materialize a deterministic media corpus (idempotent: skipped if
    already present). PNGs are seeded gradient/checker patterns, WAVs
    are seeded sine mixtures, plus one deliberately corrupt file per
    modality to exercise the ok=False path."""
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
    with open(os.path.join(media_dir, "broken_000.png"), "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    with open(os.path.join(media_dir, "broken_001.wav"), "wb") as f:
        f.write(b"RIFFxxxxWAVE")
    with open(marker, "w") as f:
        f.write("ok")
    return media_dir


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

_BMP_MAX_PIXELS = 1 << 26  # 64M px: refuse header-driven memory bombs


def decode_bmp(data: bytes) -> dict:
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
    return {
        "kind": "image",
        "width": int(width),
        "height": int(height),
        "bit_depth": 8,
        "channels": int(channels),
        "pixel_mean": float(pixels.mean()),
        "pixel_std": float(pixels.std()),
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

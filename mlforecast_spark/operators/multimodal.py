"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

Decode is REAL for formats that need no external library — PPM (P6) / PGM
(P5) / uncompressed 24-bit BMP / 8-bit non-interlaced PNG (stdlib ``zlib``
inflate + full five-filter unfiltering) / GIF87a+89a incl. animations
(pure-python LZW, palettes, interlacing, transparency compositing) /
baseline strip TIFF (both endians, none+PackBits compression) / baseline
sequential JPEG (marker parse, Huffman entropy decode with restart
markers, vectorized IDCT, 4:4:4/4:2:2/4:2:0 chroma upsampling,
YCbCr->RGB), plus PCM and G.711 WAV audio — all pure numpy/stdlib inside
Arrow-batched ``mapInPandas``; ``sample_gif_frames`` is a real multi-frame
sampling path, and perceptual near-dup fingerprints run over the decoded
media (DCT pHash for images and per-frame for animated GIFs,
Haitsma-Kalker spectral hashes for audio — all feeding the simhash-style
banded candidate joins). Progressive JPEG and real video containers genuinely need
PIL/ffmpeg, which this container lacks: those raise
``NotImplementedError`` naming the supported set, and ``fake=True`` keeps
the deterministic pseudo-decode so the distributed plumbing stays testable
for any payload.
"""

from __future__ import annotations

import struct
from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

# feature vector layouts (fixed-length so the Arrow schema is stable)
IMAGE_FEATURE_LEN = 3 + 3 + 3 + 16  # dims + channel means + channel stds + gray hist
AUDIO_FEATURE_LEN = 4 + 8  # rate/duration/rms/zcr + spectral band energies


# ---------------------------------------------------------------------------
# pure-numpy decoders (no external libraries)
# ---------------------------------------------------------------------------

def decode_ppm(raw: bytes):
    """P6 (binary) PPM → uint8 array (h, w, 3). Pure numpy."""
    import numpy as np

    if not raw.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def decode_bmp(raw: bytes):
    """Uncompressed 24-bit BI_RGB BMP → uint8 array (h, w, 3) in RGB order.
    Pure numpy: header parse, 4-byte row padding strip, bottom-up flip."""
    import numpy as np

    if not raw.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    header_size = struct.unpack_from("<I", raw, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core-header variant not supported")
    w, h = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    compression = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got {bpp}bpp, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        raw, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        img = img[::-1]
    return img.copy()


def decode_wav(raw: bytes) -> Tuple["object", int]:
    """PCM WAV → (float64 array (n, channels) in [-1, 1], sample_rate).
    stdlib ``wave`` + numpy; 8/16/32-bit integer PCM."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(raw), "rb") as wf:
        rate = wf.getframerate()
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width == 1:  # unsigned 8-bit
        arr = np.frombuffer(frames, dtype=np.uint8).astype("float64")
        arr = (arr - 128.0) / 128.0
    elif width == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype("float64") / 32768.0
    elif width == 4:
        arr = np.frombuffer(frames, dtype="<i4").astype("float64") / 2147483648.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    return arr.reshape(-1, n_ch), rate


def decode_pgm(raw: bytes):
    """P5 (binary) PGM → uint8 array (h, w). Same header grammar as P6."""
    import numpy as np

    if not raw.startswith(b"P5"):
        raise ValueError("not a P5 PGM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    return np.frombuffer(raw, dtype=np.uint8, count=w * h, offset=pos).reshape(h, w).copy()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(raw: bytes):
    """Real PNG decode with stdlib only: chunk walk → ``zlib`` inflate →
    scanline unfilter (all five filter types: None/Sub/Up/Average/Paeth) →
    uint8 (h, w[, c]). Supports 8-bit depth, gray / gray+alpha / RGB / RGBA,
    non-interlaced — the overwhelmingly common PNG shape. Palette and Adam7
    raise with the gap named. Filters Sub/Average/Paeth are sequential per
    scanline byte (the format's data dependency, not an implementation
    shortcut); fine for feature extraction, not a PIL replacement for bulk
    transcodes."""
    import zlib

    import numpy as np

    if raw[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = None
    while pos + 8 <= len(raw):
        (ln,) = struct.unpack_from(">I", raw, pos)
        typ = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, bit_depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG without IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"{bit_depth}-bit PNG not supported (8-bit only)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError("palette PNG not supported")
    stride = w * channels
    flat = zlib.decompress(b"".join(idat))
    if len(flat) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    o = 0
    for y in range(h):
        f = flat[o]
        line = np.frombuffer(flat, np.uint8, stride, o + 1).astype(np.int32)
        o += stride + 1
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorized
            rec = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth carry an in-row dependency
            rec = np.zeros(stride, np.int32)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                elif f == 4:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter byte {f}")
                rec[i] = (line[i] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = rec
    img = out.reshape(h, w, channels)
    return img[:, :, 0].copy() if channels == 1 else img.copy()


def decode_image(raw: bytes):
    """Dispatch on magic bytes: P6 PPM, P5 PGM, 24-bit BMP and 8-bit PNG
    decode for real (pure numpy/stdlib); everything else names the gap."""
    if raw[:2] == b"P6":
        return decode_ppm(raw)
    if raw[:2] == b"P5":
        return decode_pgm(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:8] == _PNG_MAGIC:
        return decode_png(raw)
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(raw, max_frames=1)[0]
    if raw[:2] in (b"II", b"MM"):
        return decode_tiff(raw)
    if raw[:3] == b"\xff\xd8\xff":
        return decode_jpeg(raw)
    raise NotImplementedError(
        "real decode supports P6 PPM, P5 PGM, uncompressed 24-bit BMP, "
        "8-bit non-interlaced PNG, GIF, baseline TIFF and baseline "
        "sequential JPEG (pure numpy/stdlib); progressive JPEG and video "
        "containers need PIL/ffmpeg, which are not installed"
    )


def resize_nearest(img, out_h: int, out_w: int):
    """Nearest-neighbor resize, pure numpy indexing (the resize operator for
    decoded frames; at scale it runs inside the same Arrow batch as decode)."""
    import numpy as np

    h, w = img.shape[:2]
    rows = np.clip((np.arange(out_h) * (h / out_h)).astype(int), 0, h - 1)
    cols = np.clip((np.arange(out_w) * (w / out_w)).astype(int), 0, w - 1)
    return img[rows][:, cols]


def image_features(img) -> list:
    """Fixed-length feature vector: (h, w, c) dims, per-channel mean/std,
    16-bin grayscale histogram (normalized)."""
    import numpy as np

    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(h * w, c).astype("float64")
    means = flat.mean(axis=0)
    stds = flat.std(axis=0)
    means = np.pad(means, (0, 3 - len(means[:3])))[:3]
    stds = np.pad(stds, (0, 3 - len(stds[:3])))[:3]
    gray = flat.mean(axis=1)
    hist = np.bincount((gray / 16).astype(int).clip(0, 15), minlength=16)
    hist = hist / hist.sum() if hist.sum() else hist
    return [float(h), float(w), float(c), *means, *stds, *hist]


def audio_features(arr, rate: int) -> list:
    """Fixed-length feature vector: sample rate, duration, RMS,
    zero-crossing rate, 8 normalized spectral band energies (rfft)."""
    import numpy as np

    mono = arr.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt((mono**2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    bands = [0.0] * 8
    if n > 16:
        spec = np.abs(np.fft.rfft(mono)) ** 2
        chunks = np.array_split(spec[1:], 8)
        energies = np.array([c.sum() for c in chunks])
        total = energies.sum()
        if total > 0:
            bands = (energies / total).tolist()
    return [float(rate), n / rate if rate else 0.0, rms, zcr, *bands]


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def attach_fake_payload(df: DataFrame, id_col: str, size: int = 64) -> DataFrame:
    """Deterministic binary payload per row (stand-in for real image bytes)."""
    return df.withColumn(
        "payload",
        F.to_binary(F.sha2(F.col(id_col).cast("string"), 256), F.lit("hex")),
    ).withColumn(
        "meta",
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit("fake").alias("format"),
        ),
    )


def decode_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
    resize_to: Tuple[int, int] | None = None,
    batch_hint: int = 512,
) -> DataFrame:
    """Decode binary payloads and emit fixed-size feature vectors via
    ``mapInPandas`` (Arrow batches; payload bytes never pass through Python
    row-at-a-time).

    Real path: every :func:`decode_image` format (PPM/PGM/BMP/PNG/GIF/TIFF,
    optionally nearest-neighbor resized first) and PCM/G.711 WAV audio, all
    pure numpy/stdlib; other formats raise per-row with the supported set
    named. ``fake=True`` keeps the deterministic pseudo-decode (bytes →
    histogram) for arbitrary payloads."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            kinds, feats = [], []
            for raw in pdf[payload_col]:
                raw = bytes(raw or b"")
                if fake:
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    hist = np.bincount(arr % 16, minlength=16).astype("float64")
                    total = hist.sum()
                    kinds.append("fake")
                    feats.append((hist / total if total else hist).tolist())
                elif raw[:4] == b"RIFF":
                    samples, rate = decode_wav_any(raw)
                    kinds.append("audio")
                    feats.append(audio_features(samples, rate))
                else:
                    img = decode_image(raw)
                    if resize_to is not None:
                        img = resize_nearest(img, *resize_to)
                    kinds.append("image")
                    feats.append(image_features(img))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "kind": kinds, "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index.
    Frame extraction from real video containers needs ffmpeg (absent); the
    row explosion (the Spark-side cost driver) is real. For animated GIF
    payloads use :func:`sample_frames_and_featurize`, which decodes for
    real."""
    n_frames = F.lit(100)  # stub: constant frame count per asset
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(F.col(id_col), F.explode(idx).alias("frame_idx"))


def sample_frames_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    k: int = 4,
    resize_to: Tuple[int, int] | None = None,
) -> DataFrame:
    """REAL multi-frame sampling: decode animated GIF payloads
    (:func:`decode_gif`), pick ``k`` evenly spaced full-canvas frames, and
    emit one feature row per sampled frame — the video-pipeline shape
    (decode → frame-sample → featurize) running inside one Arrow batch with
    no intermediate materialization of the frame tensor. Single-image
    payloads (PPM/PGM/BMP/PNG) yield one row; formats needing ffmpeg raise
    per-row with the gap named."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np  # noqa: F401
        import pandas as pd

        for pdf in batches:
            ids, fidx, nfr, feats = [], [], [], []
            for rid, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(raw or b"")
                if raw[:6] in (b"GIF87a", b"GIF89a"):
                    frames = decode_gif(raw)
                else:
                    frames = [decode_image(raw)]
                n = len(frames)
                picks = (
                    range(n)
                    if k >= n
                    else sorted(
                        {int(round(i * (n - 1) / (k - 1))) for i in range(k)}
                        if k > 1
                        else {0}
                    )
                )
                for i in picks:
                    img = frames[i]
                    if resize_to is not None:
                        img = resize_nearest(img, *resize_to)
                    ids.append(rid)
                    fidx.append(i)
                    nfr.append(n)
                    feats.append(image_features(img))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "n_frames": nfr, "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# GIF (LZW) — pure-python/numpy, no external libraries
# ---------------------------------------------------------------------------

def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width from min_code_size+1 to 12 bits,
    CLEAR resets the dictionary, EOI terminates. Returns palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width):
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        byte = bitpos >> 3
        val = int.from_bytes(data[byte : byte + 3], "little")
        val = (val >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    def reset():
        return {i: bytes([i]) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset()
    prev = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def decode_gif(raw: bytes, max_frames: int | None = None):
    """GIF87a/89a → list of uint8 (h, w, 3) full-canvas frames, stdlib-only
    (pure-python LZW + numpy compositing). Handles global/local palettes,
    interlacing, transparency and all disposal methods (none/keep,
    restore-to-background, restore-previous via a saved pre-frame canvas)."""
    import numpy as np

    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    W, H = struct.unpack_from("<HH", raw, 6)
    packed = raw[10]
    bg_idx = raw[11]
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(raw, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if global_pal is not None and bg_idx < len(global_pal):
        canvas = np.tile(global_pal[bg_idx], (H, W, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((H, W, 3), np.uint8)
    frames = []
    transparent = None
    disposal = 0
    while pos < len(raw):
        block = raw[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = raw[pos + 1]
            pos += 2
            subs = []
            while raw[pos]:
                ln = raw[pos]
                subs.append(raw[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and subs:  # graphic control
                gc = subs[0]
                disposal = (gc[0] >> 2) & 0x7
                transparent = gc[3] if gc[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", raw, pos + 1)
        ipacked = raw[pos + 9]
        pos += 10
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(raw, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame without a color table")
        min_code = raw[pos]
        pos += 1
        comp = bytearray()
        while raw[pos]:
            ln = raw[pos]
            comp.extend(raw[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _gif_lzw_decode(bytes(comp), min_code), np.uint8, w * h
        ).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            deinter = np.zeros_like(idx)
            order = [r for step, off in ((8, 0), (8, 4), (4, 2), (2, 1))
                     for r in range(off, h, step)]
            deinter[order] = idx
            idx = deinter
        before = canvas.copy()
        region = canvas[top : top + h, left : left + w]
        colors = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[:] = np.where(mask, colors, region)
        else:
            region[:] = colors
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            break
        if disposal == 2:  # restore to background
            bg = (
                global_pal[bg_idx]
                if global_pal is not None and bg_idx < len(global_pal)
                else np.zeros(3, np.uint8)
            )
            canvas[top : top + h, left : left + w] = bg
        elif disposal == 3:  # restore previous: revert to the pre-frame canvas
            canvas = before
        transparent = None
        disposal = 0
    return frames


def sample_gif_frames(raw: bytes, k: int):
    """Evenly spaced frame sample from an animated GIF (real frame-sample
    path: the container formats that need no ffmpeg). Returns <= k frames."""
    frames = decode_gif(raw)
    if not frames:
        return []
    if k >= len(frames):
        return frames
    import numpy as np

    picks = np.linspace(0, len(frames) - 1, k).round().astype(int)
    return [frames[i] for i in dict.fromkeys(picks.tolist())]


def _g711_ulaw_table():
    import numpy as np

    codes = np.arange(256, dtype=np.uint8)
    u = (~codes).astype(np.int64) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    mag = t - 0x84
    return np.where(u & 0x80, -mag, mag).astype("float64") / 32768.0


def _g711_alaw_table():
    import numpy as np

    codes = np.arange(256, dtype=np.uint8)
    a = codes.astype(np.int64) ^ 0x55
    mant = a & 0x0F
    exp = (a & 0x70) >> 4
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(a & 0x80, mag, -mag).astype("float64") / 32768.0


def decode_wav_any(raw: bytes) -> Tuple["object", int]:
    """WAV decode covering integer PCM (via :func:`decode_wav`) plus G.711
    A-law (fmt 6) and µ-law (fmt 7) telephony encodings, which the stdlib
    ``wave`` module rejects — decoded with 256-entry lookup tables in pure
    numpy (the G.711 expansion formulas)."""
    import numpy as np

    try:
        return decode_wav(raw)
    except Exception as pcm_err:
        wave_error = pcm_err
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunks")
    audio_format, n_ch, rate = fmt[0], fmt[1], fmt[2]
    if audio_format == 7:
        table = _g711_ulaw_table()
    elif audio_format == 6:
        table = _g711_alaw_table()
    elif audio_format == 1:
        # PCM that the wave module rejected: the payload is corrupt, not an
        # unsupported format — surface the real error, don't mask it
        raise wave_error
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format} not supported (PCM, A-law, µ-law)"
        ) from wave_error
    arr = table[np.frombuffer(data, np.uint8)]
    return arr.reshape(-1, n_ch), rate


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF PackBits RLE: n in [0,127] → copy n+1 literal bytes; n in
    [-127,-1] → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out.extend(data[i : i + n + 1])
            i += n + 1
        elif n > 128:
            out.extend(data[i : i + 1] * (257 - n))
            i += 1
    return bytes(out[:expected])


def decode_tiff(raw: bytes):
    """Baseline TIFF → uint8 array (h, w[, c]), stdlib+numpy only:
    II/MM byte order, first IFD, strip layout, 8-bit grayscale/RGB(A),
    compression none (1) or PackBits (32773). Tiled, LZW/deflate/JPEG-in-
    TIFF, palette and non-8-bit depths raise with the gap named."""
    import numpy as np

    if raw[:2] == b"II":
        endian = "<"
    elif raw[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF payload")
    if struct.unpack_from(endian + "H", raw, 2)[0] != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(endian + "I", raw, 4)
    (n_entries,) = struct.unpack_from(endian + "H", raw, ifd_off)
    TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    TYPE_FMT = {1: "B", 3: "H", 4: "I"}
    tags = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(endian + "HHI", raw, off)
        if typ not in TYPE_SIZE:
            continue
        nbytes = TYPE_SIZE[typ] * count
        val_off = off + 8 if nbytes <= 4 else struct.unpack_from(endian + "I", raw, off + 8)[0]
        if typ in TYPE_FMT:
            tags[tag] = list(
                struct.unpack_from(endian + TYPE_FMT[typ] * count, raw, val_off)
            )
    width = tags[256][0]
    height = tags[257][0]
    bits = tags.get(258, [1])
    spp = tags.get(277, [1])[0]
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"only 8-bit TIFF supported (got bits={bits})")
    if photometric == 3:
        raise NotImplementedError("palette TIFF not supported")
    if compression not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression} not supported (none/PackBits only)"
        )
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF not supported (strips only)")
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = tags.get(278, [height])[0]
    out = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = raw[so : so + sc]
        n_rows = min(rows_per_strip, height - si * rows_per_strip)
        expected = n_rows * width * spp
        if compression == 32773:
            strip = _packbits_decode(strip, expected)
        out.extend(strip[:expected])
    img = np.frombuffer(bytes(out), np.uint8, height * width * spp).reshape(
        height, width, spp
    )
    if photometric == 0:  # WhiteIsZero grayscale: invert to the usual sense
        img = 255 - img
    return img[:, :, 0].copy() if spp == 1 else img.copy()


# ---------------------------------------------------------------------------
# baseline JPEG decode (pure numpy/stdlib)
# ---------------------------------------------------------------------------

# zigzag scan order: _JPEG_ZIGZAG[k] = (row*8 + col) of the k-th coefficient
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_dct_basis():
    import numpy as np

    u = np.arange(8)
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    scale = np.full(8, 0.5)
    scale[0] = 1.0 / (2 * np.sqrt(2.0))
    return scale[:, None] * c  # C[u, x]; IDCT: block = C.T @ coeffs @ C


def _jpeg_build_huffman(bits, vals):
    """Canonical Huffman map: (code_length, code) -> symbol (JPEG F.2.2.3)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any real marker (restart handling is the
    caller's job via expect_rst/align)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.b = 0
        self.cnt = 0

    def read_bit(self) -> int:
        if self.cnt == 0:
            byte = self.d[self.p]
            self.p += 1
            if byte == 0xFF:
                nxt = self.d[self.p]
                if nxt == 0x00:
                    self.p += 1  # stuffed zero: literal 0xFF data byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                    )
            self.b = byte
            self.cnt = 8
        self.cnt -= 1
        return (self.b >> self.cnt) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def expect_rst(self, n: int):
        """Byte-align and consume the RSTn marker at a restart boundary."""
        self.cnt = 0
        if self.d[self.p] != 0xFF or self.d[self.p + 1] != 0xD0 + (n & 7):
            raise ValueError("missing expected JPEG restart marker")
        self.p += 2


def _jpeg_extend(v: int, s: int) -> int:
    # F.2.4.3.1.1: s-bit magnitude to signed value
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(raw: bytes):
    """Baseline sequential JPEG/JFIF decode, pure numpy/stdlib: marker
    parse (DQT/DHT/SOF0/SOF1/DRI/SOS), canonical Huffman entropy decode
    with restart-marker support, dequantize + dezigzag, vectorized 8x8
    IDCT over all blocks per component, chroma upsampling for any
    sampling-factor layout (4:4:4 / 4:2:2 / 4:2:0), YCbCr->RGB. Grayscale
    returns (H, W); color returns (H, W, 3) uint8. Progressive (SOF2) and
    arithmetic-coded JPEGs raise ``NotImplementedError``."""
    import numpy as np

    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt = {}  # id -> np.array(64) in zigzag order
    huff_dc = {}
    huff_ac = {}
    frame = None  # (H, W, [(cid, hi, vi, tq), ...])
    restart_interval = 0
    pos = 2
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("bad JPEG marker sync")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seglen = struct.unpack(">H", raw[pos : pos + 2])[0]
        seg = raw[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(seg[i : i + 64], np.uint8).astype(
                        np.int32
                    )
                    i += 64
                else:
                    qt[tq] = np.frombuffer(
                        seg[i : i + 128], ">u2"
                    ).astype(np.int32)
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _jpeg_build_huffman(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline & extended seq.
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (non-baseline) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns < len(frame[2]):
                # non-interleaved baseline: one scan per component; decoding
                # only the first scan would silently return a Y-plane for a
                # color image, so refuse explicitly
                raise NotImplementedError(
                    "non-interleaved JPEG (scan has "
                    f"{ns} of {len(frame[2])} components)"
                )
            scan = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                tt = seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 15))
            ecs_start = pos + seglen
            return _jpeg_decode_scan(
                raw, ecs_start, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG has no SOS scan")


def _jpeg_decode_scan(
    raw, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
):
    import numpy as np

    H, W, comps = frame
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    # per-component coefficient block grids
    grids = {}
    for cid, td, ta in scan:
        hi, vi, tq = by_id[cid]
        grids[cid] = np.zeros((mcuy * vi, mcux * hi, 64), np.int32)
    br = _JpegBitReader(raw, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    zz = np.array(_JPEG_ZIGZAG)
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            br.expect_rst(n_rst)
            n_rst = (n_rst + 1) & 7
            pred = {cid: 0 for cid, _, _ in scan}
        my, mx = divmod(m, mcux)
        for cid, td, ta in scan:
            hi, vi, tq = by_id[cid]
            for v in range(vi):
                for hh in range(hi):
                    blk = np.zeros(64, np.int32)
                    s = br.decode_symbol(huff_dc[td])
                    diff = _jpeg_extend(br.receive(s), s)
                    pred[cid] += diff
                    blk[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = br.decode_symbol(huff_ac[ta])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run overflows block")
                        blk[k] = _jpeg_extend(br.receive(s), s)
                        k += 1
                    grids[cid][my * vi + v, mx * hi + hh] = blk
    # dequantize + dezigzag + vectorized IDCT per component
    C = _jpeg_dct_basis()
    planes = {}
    for cid, td, ta in scan:
        hi, vi, tq = by_id[cid]
        g = grids[cid]
        deq = (g * qt[tq][None, None, :]).astype(np.float64)
        blocks = np.zeros((g.shape[0], g.shape[1], 64))
        blocks[:, :, zz] = deq
        blocks = blocks.reshape(g.shape[0], g.shape[1], 8, 8)
        spatial = np.einsum("ux,mnuv,vy->mnxy", C, blocks, C, optimize=True)
        # block grid -> plane
        plane = spatial.transpose(0, 2, 1, 3).reshape(
            g.shape[0] * 8, g.shape[1] * 8
        )
        plane = np.clip(np.round(plane + 128.0), 0, 255)
        # upsample to full resolution by sample replication, crop to (H, W)
        ry, rx = vmax // vi, hmax // hi
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes[cid] = plane[:H, :W]
    if len(scan) == 1:
        return planes[scan[0][0]].astype(np.uint8)
    y = planes[scan[0][0]]
    cb = planes[scan[1][0]] - 128.0
    cr = planes[scan[2][0]] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# perceptual image hashing (near-duplicate images)
# ---------------------------------------------------------------------------

def phash64(img, hash_size: int = 8, dct_size: int = 32) -> int:
    """64-bit perceptual hash (classic pHash): grayscale → ``dct_size``²
    nearest-neighbor resize → 2-D DCT-II → keep the top-left
    ``hash_size``² low-frequency block (DC excluded) → threshold at the
    median. Visually identical images (re-encoded, resized, lightly
    noised) land within a few bits; unrelated images differ in ~32.
    Pure numpy, deterministic."""
    import numpy as np

    if img.ndim == 3:
        img = img.astype("float64").mean(axis=2)
    else:
        img = img.astype("float64")
    small = resize_nearest(img, dct_size, dct_size)
    n = dct_size
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    basis = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    basis[0] /= np.sqrt(2.0)
    coeffs = basis @ small @ basis.T
    block = coeffs[:hash_size, :hash_size].ravel()[1:]  # drop DC
    bits = block > np.median(block)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def image_phash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    hash_size: int = 8,
    dct_size: int = 32,
) -> DataFrame:
    """Per-image 64-bit perceptual hash over binary payloads — the image
    analog of :func:`~mlforecast_spark.operators.dedup.simhash`. Decodes
    with :func:`decode_image` (every pure-numpy format; unsupported formats
    raise per-row, naming the gap) inside one ``mapInPandas`` pass: payloads
    never cross a shuffle, only ``(id, 8-byte hash)`` leaves the scan stage.
    Returns ``(id_col, phash long)``; feed into :func:`phash_candidates`
    for banded near-duplicate candidate pairs."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("phash", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            hashes = []
            for raw in pdf[payload_col]:
                img = decode_image(bytes(raw or b""))
                h = phash64(img, hash_size=hash_size, dct_size=dct_size)
                # store the unsigned 64-bit pattern as a signed long
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({id_col: pdf[id_col], "phash": hashes})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def phash_candidates(
    fps: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """Near-duplicate image candidate pairs from :func:`image_phash` output:
    delegates to the simhash banded self-join (the fingerprints are the same
    shape — 64 bits, near-dup = small hamming distance), so the 4×16-bit
    pigeonhole banding, bucket caps and first-matching-band dedup all apply
    unchanged. ``cache=False`` skips pinning the fingerprint frame (see
    :func:`~mlforecast_spark.operators.dedup.simhash_candidates`). Returns
    ``(id_a, id_b, hamming)``."""
    from .dedup import simhash_candidates

    return simhash_candidates(
        fps.select(F.col(id_col), F.col("phash").alias("simhash")),
        id_col=id_col,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
        cache=cache,
    )


def audio_fingerprint64(samples, rate: int, n_bands: int = 5) -> int:
    """64-bit clip-level audio fingerprint (Haitsma–Kalker 2002 style):
    17 equal time windows × ``n_bands`` log-spaced spectral bands; each bit
    is the sign of the band-energy difference ΔE(frame, band) −
    ΔE(frame−1, band) — 16 frames × 4 band-pairs = 64 bits. Global gain
    scales every energy equally, so the signs (and the hash) are
    volume-invariant; time windows are fractional, so moderate resampling
    keeps the hash close. Pure numpy, deterministic.

    ``n_bands`` must be 5: the downstream banded join
    (:func:`afp_candidates`) pigeonholes the hash into 4×16-bit chunks, so
    anything but 16 frame-transitions × 4 band-pairs = exactly 64 bits
    would leave whole chunks zero (one degenerate bucket holding the entire
    corpus — a quadratic-join cliff) or overflow the 64-bit lane."""
    import numpy as np

    if 16 * (n_bands - 1) != 64:
        raise ValueError(
            f"n_bands must be 5 (16 frame-transitions x 4 band-pairs = 64 "
            f"bits; got n_bands={n_bands} -> {16 * (n_bands - 1)} bits)"
        )

    mono = samples.mean(axis=1) if samples.ndim == 2 else samples.astype("float64")
    n = len(mono)
    n_frames = 17
    if n < n_frames * 2:
        mono = np.pad(mono, (0, n_frames * 2 - n))
        n = len(mono)
    edges_t = (np.arange(n_frames + 1) * n) // n_frames
    # band edges in ABSOLUTE Hz (log-spaced over the 100 Hz – 3 kHz speech/
    # music core, clipped to Nyquist) so a resampled copy of the same
    # content lands in the same bands — bin-index edges would shift with
    # the sample rate and break resampling invariance
    hz_hi = min(3000.0, rate / 2 * 0.95) if rate else 3000.0
    band_hz = np.logspace(np.log10(100.0), np.log10(max(hz_hi, 200.0)), n_bands + 1)
    energies = np.empty((n_frames, n_bands))
    for f in range(n_frames):
        seg = mono[edges_t[f] : edges_t[f + 1]]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(len(seg), 1.0 / rate) if rate else np.arange(len(spec))
        # raw band sums: gain and resampling scale every band equally, so
        # the difference SIGNS below are invariant without normalization
        for i in range(n_bands):
            m = (freqs >= band_hz[i]) & (freqs < band_hz[i + 1])
            energies[f, i] = spec[m].sum()
    out = 0
    for f in range(1, n_frames):
        for b in range(n_bands - 1):
            d = (energies[f, b] - energies[f, b + 1]) - (
                energies[f - 1, b] - energies[f - 1, b + 1]
            )
            out = (out << 1) | int(d > 0)
    return out


def audio_fingerprints(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_bands: int = 5,
) -> DataFrame:
    """Per-clip 64-bit audio fingerprints over WAV payloads (PCM + G.711 via
    :func:`decode_wav_any`) in one Arrow ``mapInPandas`` pass — the audio
    analog of :func:`image_phash`; only ``(id, 8 bytes)`` leaves the scan.
    Feed into :func:`afp_candidates` for banded near-duplicate pairs."""
    if 16 * (n_bands - 1) != 64:
        # fail at plan time, not per-row inside the UDF (same contract as
        # audio_fingerprint64: the banded join needs exactly 64 filled bits)
        raise ValueError(
            f"n_bands must be 5 (64-bit fingerprint contract), got {n_bands}"
        )
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("afp", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            fps = []
            for raw in pdf[payload_col]:
                samples, rate = decode_wav_any(bytes(raw or b""))
                h = audio_fingerprint64(samples, rate, n_bands=n_bands)
                fps.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({id_col: pdf[id_col], "afp": fps})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def afp_candidates(
    fps: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """Near-duplicate audio candidate pairs: same 64-bit shape as simhash /
    pHash, so the 4×16-bit pigeonhole banded self-join applies unchanged.
    ``cache=False`` skips pinning the fingerprint frame (see
    :func:`~mlforecast_spark.operators.dedup.simhash_candidates`). Returns
    ``(id_a, id_b, hamming)``."""
    from .dedup import simhash_candidates

    return simhash_candidates(
        fps.select(F.col(id_col), F.col("afp").alias("simhash")),
        id_col=id_col,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
        cache=cache,
    )


def video_frame_phashes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    k: int = 8,
    hash_size: int = 8,
    dct_size: int = 32,
) -> DataFrame:
    """Per-frame perceptual hashes for animated payloads: decode, sample up
    to ``k`` evenly spaced frames (:func:`sample_gif_frames` — the
    container family that needs no ffmpeg; single images contribute one
    frame), pHash each — all in one Arrow ``mapInPandas`` pass, so only
    ``(id, frame_idx, 8 bytes)`` rows leave the scan. Returns
    ``(id_col, frame_idx, phash)``."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for did, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(raw or b"")
                if raw[:6] in (b"GIF87a", b"GIF89a"):
                    frames = sample_gif_frames(raw, k)
                else:
                    frames = [decode_image(raw)]
                for i, frame in enumerate(frames):
                    h = phash64(frame, hash_size=hash_size, dct_size=dct_size)
                    ids.append(did)
                    idxs.append(i)
                    hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "phash": hashes})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def video_near_dups(
    frame_hashes: DataFrame,
    id_col: str = "doc_id",
    min_matching_frames: int = 2,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate videos from :func:`video_frame_phashes`
    output: frame pHashes go through the same 4×16-bit pigeonhole banding
    as the image path (hamming ≤ 3 ⇒ at least one 16-bit chunk equal), so a
    re-encoded/rescaled clip whose frame hashes are perturbed by 1–2 bits
    still joins — exact equality (``max_hamming=0``) stays available as the
    cheap single-equi-join path. Pairs are then ranked by how many DISTINCT
    matching frame-hash pairs they share; ``min_matching_frames`` is the
    evidence threshold. ``max_bucket_size`` caps degenerate chunk buckets
    (black frames, title cards shared by thousands of clips) exactly like
    the text-dedup banded joins — the 100 TB guard against one common frame
    turning the join quadratic. Returns
    ``(id_a, id_b, n_matching_frames)``."""
    from .dedup import _cap_buckets

    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming must be in [0, 3] (4-chunk pigeonhole bound), "
            f"got {max_hamming}"
        )
    fh = frame_hashes.select(F.col(id_col), F.col("phash")).distinct()
    if max_hamming == 0:
        fh = _cap_buckets(fh, ["phash"], max_bucket_size)
        a, b = fh.alias("a"), fh.alias("b")
        pairs = a.join(
            b,
            (F.col("a.phash") == F.col("b.phash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        counted = pairs.groupBy("id_a", "id_b").agg(
            F.count(F.lit(1)).cast("long").alias("n_matching_frames")
        )
    else:
        # banded self-join per 16-bit chunk; a frame pair can agree on up
        # to 4 chunks, so evidence is counted over DISTINCT (ph_a, ph_b)
        # hash pairs, which also keeps it comparable to the exact path
        chunks = fh.select(
            F.col(id_col),
            F.col("phash"),
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("phash"), 16 * i).bitwiseAND(
                            F.lit(0xFFFF).cast("long")
                        )
                        for i in range(4)
                    ]
                )
            ).alias("chunk_idx", "chunk"),
        )
        chunks = _cap_buckets(chunks, ["chunk_idx", "chunk"], max_bucket_size)
        a, b = chunks.alias("a"), chunks.alias("b")
        cand = a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.phash").alias("_ph_a"),
            F.col("b.phash").alias("_ph_b"),
        )
        verified = cand.filter(
            F.bit_count(F.col("_ph_a").bitwiseXOR(F.col("_ph_b"))) <= max_hamming
        )
        counted = verified.groupBy("id_a", "id_b").agg(
            F.count_distinct(F.struct("_ph_a", "_ph_b"))
            .cast("long")
            .alias("n_matching_frames")
        )
    return counted.filter(F.col("n_matching_frames") >= min_matching_frames)


def dedup_media_corpus(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """End-to-end near-duplicate removal for a mixed media corpus — the
    media analog of :func:`~mlforecast_spark.operators.dedup.dedup_corpus`.
    Returns the SURVIVING rows (all original columns): one canonical asset
    (min id) per near-dup cluster.

    Stages: (1) one decode+fingerprint pass (:func:`phash64` for image
    payloads, :func:`audio_fingerprint64` for WAV — dispatched per row on
    magic bytes, single ``mapInPandas``); (2) banded candidate pairs within
    each modality (the 4×16-bit pigeonhole join — image and audio hashes
    live in disjoint keyspaces only by content, so the band join is scoped
    per modality to keep cross-modal collisions out); (3) connected
    components → drop non-canonical members with one anti join."""
    from .dedup import connected_components, simhash_candidates

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("kind", T.StringType()),
            T.StructField("fp", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            kinds, fps = [], []
            for raw in pdf[payload_col]:
                raw = bytes(raw or b"")
                if raw[:4] == b"RIFF":
                    samples, rate = decode_wav_any(raw)
                    h = audio_fingerprint64(samples, rate)
                    kinds.append("audio")
                else:
                    h = phash64(decode_image(raw))
                    kinds.append("image")
                fps.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({id_col: pdf[id_col], "kind": kinds, "fp": fps})

    prints = df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
    pairs = None
    for kind in ("image", "audio"):
        cand = simhash_candidates(
            prints.filter(F.col("kind") == kind).select(
                F.col(id_col), F.col("fp").alias("simhash")
            ),
            id_col=id_col,
            max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
        ).select("id_a", "id_b")
        pairs = cand if pairs is None else pairs.unionByName(cand)
    comps = connected_components(pairs, src="id_a", dst="id_b")
    drop = comps.filter(F.col("node_id") != F.col("cluster_id")).select(
        F.col("node_id").alias(id_col)
    )
    return df.join(drop, on=id_col, how="left_anti")

"""Multimodal-column operators: opaque binary payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB:
  * store payloads as a ``binary`` column next to typed metadata
    (media_type, n_bytes, content hash — see the media_manifest query);
  * decode / feature-extract / resize / frame-sample runs as a
    ``mapInPandas`` stage: Arrow ships each partition to Python in
    columnar batches, the decoder is vectorized per batch, and the
    output schema is declared up front so Catalyst can keep planning
    around the stage;
  * partition by content-size buckets before heavy decode so one task
    doesn't get all the 4K videos (see ``size_bucket``).

Codec status: the PNG path (encode/decode/resize/frame-split) and the
WAV/RIFF path (encode/decode/PCM stats) are REAL — stdlib-only, no
image/audio library needed — so those legs have no stub anywhere.
Only ``_decode_stub``/``_resize_stub``/``sample_frames`` remain
bytes-contract stubs for formats that genuinely need external codecs
(JPEG/mp4/mp3); ``decode_features`` computes real deterministic
features of the bytes themselves (length, byte entropy, header) so
the Spark-side plumbing — schema, batching, partitioning — is fully
exercised either way. Swap PIL/librosa/av into the same mapInPandas
contracts in production.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("header_hex", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _byte_entropy(b: bytes) -> float:
    if not b:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """Deterministic fake 'decoded feature' (8-dim). A real deployment
    replaces this with PIL/librosa/av decode + model features; the
    Spark-side contract (bytes in, fixed-width float vector out, batch
    shape) is identical."""
    if payload is None:
        raise NotImplementedError("real decoder required for null-payload media")
    return [float((len(payload) * (i + 1) + sum(payload[:16])) % 997) for i in range(8)]


def decode_features(media: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA → FEATURE_SCHEMA via mapInPandas (Arrow batches).

    Scale: narrow map stage — no shuffle; heavy decode parallelism is
    controlled by the input partitioning (repartition by size_bucket
    upstream if payload sizes are skewed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                    "byte_entropy": payloads.map(
                        lambda b: _byte_entropy(b) if b is not None else None
                    ),
                    "header_hex": payloads.map(
                        lambda b: b[:4].hex() if b is not None else None
                    ),
                    "feature": payloads.map(
                        lambda b: _decode_stub(b, "") if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: width·height 'grayscale pixels'
    derived by striding/repeating the source bytes. A real deployment
    replaces this with PIL decode→resize→tobytes; the contract (bytes
    in, exactly width·height bytes out) is identical."""
    if not payload:
        return bytes(width * height)
    n = width * height
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """MEDIA_SCHEMA → RESIZED_SCHEMA via mapInPandas: one output row
    per input image with a fixed-size pixel buffer — the normalize
    stage before vision-model feature extraction. Narrow map stage;
    output size is constant per row (width·height), so downstream
    partition sizing is predictable regardless of source image sizes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "pixels": pdf["payload"].map(
                        lambda b: _resize_stub(b, width, height) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 64, every_n: int = 2) -> DataFrame:
    """MEDIA_SCHEMA (video payloads) → one row per sampled frame: the
    1→N row expansion shape (mapInPandas output batches need not align
    with input rows). The stub treats the payload as a concatenation of
    ``frame_bytes`` frames and keeps every ``every_n``-th; a real
    deployment replaces the slicing with av/ffmpeg keyframe extraction.
    Scale: output cardinality is rows·frames/every_n — repartition on
    size_bucket first so long videos spread across tasks."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_bytes
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(payload[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAME_SCHEMA)


def size_bucket(df: DataFrame, payload_col: str = "payload", n_buckets: int = 32) -> DataFrame:
    """Add a decode-cost bucket column (by payload size) to repartition
    on before a heavy decode stage, so large payloads spread evenly."""
    return df.withColumn(
        "_size_bucket",
        (F.floor(F.log2(F.octet_length(payload_col) + 2)) * 7 + F.crc32(F.col(payload_col)) % n_buckets)
        % n_buckets,
    )


# ---------------------------------------------------------------------------
# Real PNG codec — pure stdlib (zlib + struct). The one image format the
# sandbox can genuinely encode AND decode without PIL: full chunk
# structure, CRC validation, and all five scanline filters on decode.
# ---------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\x0a"


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal REAL PNG encoder: 8-bit RGB (color type 2), filter 0
    scanlines, one zlib IDAT, correct CRCs. Any standards-compliant
    viewer decodes the output."""
    import struct
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Minimal REAL PNG decoder for 8-bit RGB/RGBA, no interlace:
    validates the signature and every chunk CRC, inflates IDAT, and
    un-applies all five scanline filters (None/Sub/Up/Average/Paeth).
    Returns (width, height, rgb_bytes) — alpha stripped if present."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    height = bpp = 0
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (2, 6) or interlace != 0:
                raise ValueError("decoder supports 8-bit RGB/RGBA, no interlace")
            bpp = 3 if color == 2 else 4
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out += row
        prev = row
    if bpp == 4:  # strip alpha
        out = bytearray(
            b for i, b in enumerate(out) if i % 4 != 3
        )
    return width, height, bytes(out)


PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
    ]
)


def png_pixel_stats(media: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA (image/png payloads) → per-image dimensions and
    exact per-channel means via the REAL decoder — the decode +
    feature-extract stage with no stub in the path. Channel sums are
    integer-exact; the single double division at the end is
    engine-identical. Narrow Arrow-batched map stage; partition by
    size_bucket upstream when image sizes are skewed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, mr, mg, mb = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h, rgb = decode_png(bytes(payload))
                n = w * h
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                mr.append(sum(rgb[0::3]) / n)
                mg.append(sum(rgb[1::3]) / n)
                mb.append(sum(rgb[2::3]) / n)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "mean_r": mr,
                    "mean_g": mg,
                    "mean_b": mb,
                }
            )

    return media.mapInPandas(run, PNG_STATS_SCHEMA)


def _resize_rgb_nearest(
    width: int, height: int, rgb: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of a packed RGB buffer: output pixel
    (ox, oy) copies source pixel (ox·W // out_w, oy·H // out_h) — the
    floor grid map, exactly replayable by an integer SQL twin (unlike
    PIL's half-pixel-center convention, which is also NN but offsets
    the grid)."""
    out = bytearray(out_w * out_h * 3)
    i = 0
    for oy in range(out_h):
        base = ((oy * height) // out_h) * width * 3
        for ox in range(out_w):
            j = base + ((ox * width) // out_w) * 3
            out[i : i + 3] = rgb[j : j + 3]
            i += 3
    return bytes(out)


def resize_png_nearest(
    media: DataFrame, out_w: int = 8, out_h: int = 4
) -> DataFrame:
    """MEDIA_SCHEMA (image/png payloads) → RESIZED_SCHEMA with REAL
    pixels: the full decoder (signature, chunk CRCs, scanline
    unfiltering) feeds a nearest-neighbor grid resample — the
    normalize stage before vision-model feature extraction, with no
    stub anywhere in the path (:func:`resize_images` remains the
    bytes-contract stub for formats the stdlib can't decode; PNG runs
    real). One narrow Arrow-batched map stage; output is a constant
    3·out_w·out_h bytes per row, so downstream partition sizing is
    exact regardless of source dimensions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, px = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                ws.append(out_w)
                hs.append(out_h)
                if payload is None:
                    px.append(None)
                    continue
                w, h, rgb = decode_png(bytes(payload))
                px.append(_resize_rgb_nearest(w, h, rgb, out_w, out_h))
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "pixels": px}
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def rgb_mean_stats(resized: DataFrame) -> DataFrame:
    """RESIZED_SCHEMA → per-image exact per-channel means over the
    packed RGB pixel buffer (integer sums, one double division at the
    end — engine-identical). The featurize stage downstream of
    :func:`resize_png_nearest`."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("mean_r", T.DoubleType(), True),
            T.StructField("mean_g", T.DoubleType(), True),
            T.StructField("mean_b", T.DoubleType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for mid, w, h, px in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                if px is None:
                    rows["mean_r"].append(None)
                    rows["mean_g"].append(None)
                    rows["mean_b"].append(None)
                    continue
                n = int(w) * int(h)
                b = bytes(px)
                for ch, key in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[key].append(sum(b[ch::3]) / n)
            yield pd.DataFrame(rows)

    return resized.mapInPandas(run, schema)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def split_png_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-PNG container (the 'video' format the
    harness can build from the stdlib: frame streams laid end to end)
    into its individual PNG byte streams by honest chunk walking — each
    frame is signature + (length, type, data, crc) chunks through IEND;
    no fixed-size slicing, so frames of different compressed sizes
    split correctly. Raises on a bad signature or a truncated chunk."""
    frames: list[bytes] = []
    i, n = 0, len(payload)
    while i < n:
        if payload[i : i + 8] != _PNG_SIG:
            raise ValueError(f"bad PNG signature at offset {i}")
        start = i
        i += 8
        while True:
            if i + 8 > n:
                raise ValueError("truncated chunk header")
            ln = int.from_bytes(payload[i : i + 4], "big")
            ctype = payload[i + 4 : i + 8]
            i += 12 + ln
            if i > n:
                raise ValueError("truncated chunk body")
            if ctype == b"IEND":
                break
        frames.append(payload[start:i])
    return frames


def sample_png_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """MEDIA_SCHEMA (concatenated-PNG 'video' payloads) → FRAME_SCHEMA,
    REAL path: the container is split by chunk walking
    (:func:`split_png_frames`) and every ``every_n``-th frame is kept
    as a complete PNG stream — :func:`sample_frames` remains the
    bytes-contract stub for containers the stdlib can't parse
    (mp4/mkv need libav; this is the same contract they'd fill).
    Scale: output cardinality is rows·frames/every_n with each output
    row a full frame — repartition on (media_id, frame_idx) before
    per-frame decode so decode parallelism is per-frame, not
    per-video (the skew fix for long videos)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for k, frame in enumerate(split_png_frames(bytes(payload))):
                    if k % every_n == 0:
                        ids.append(mid)
                        idxs.append(k)
                        frames.append(frame)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Real WAV/RIFF audio codec — the audio leg of the multimodal layer,
# with no stub in the path (PCM needs no codec library). Same contract
# shape as the PNG legs: an encoder builds honest containers, a
# chunk-walking parser consumes them (skipping unknown chunks, honoring
# RIFF's even-byte padding), and the feature stage emits integer-exact
# stats an oracle can recompute from the sample formula. A compressed
# format (mp3/opus) would swap its decoder into the same mapInPandas
# contract.
# ---------------------------------------------------------------------------
def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Canonical 16-bit PCM WAV: RIFF header, fmt chunk, a LIST/INFO
    chunk with an odd-sized payload (so parsers must honor the RIFF
    pad byte), then the data chunk (little-endian int16)."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * channels * 2,  # byte rate
        channels * 2,  # block align
        16,  # bits per sample
    )
    info = b"INFOsw1"  # 7 bytes — odd, forces a pad byte
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt,
        b"LIST" + struct.pack("<I", len(info)) + info + b"\x00",
        b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b""),
    )
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a 16-bit PCM WAV by walking RIFF chunks: returns
    (sample_rate, channels, samples). Unknown chunks are skipped with
    pad-byte handling; raises on a malformed container or a
    non-PCM/non-16-bit stream (the real-decoder contract: fail loud,
    never emit garbage features)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    rate = nch = None
    samples: list[int] | None = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, nch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            samples = [
                struct.unpack("<h", body[i : i + 2])[0] for i in range(0, size, 2)
            ]
        pos += 8 + size + (size & 1)  # RIFF pads chunks to even offsets
    if samples is None:
        raise ValueError("no data chunk")
    return rate, nch, samples


PCM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
        T.StructField("sum_abs", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
    ]
)


def wav_pcm_stats(media: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA (WAV payloads) → integer-exact PCM stats per clip:
    sample count, peak |amplitude|, sum |s|, sum s² — the loudness /
    clipping / silence signals an audio-curation pipeline thresholds
    on, all integers so the oracle can replay them exactly.

    Scale: one Arrow-batched mapInPandas over the payload column, zero
    exchanges; stats are O(duration) per clip, so size-bucket first
    (``size_bucket``) when clip lengths are skewed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "sample_rate", "channels",
                                    "n_samples", "peak", "sum_abs", "sum_sq")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                rate, nch, samples = decode_wav(bytes(payload))
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["channels"].append(nch)
                rows["n_samples"].append(len(samples))
                rows["peak"].append(max((abs(s) for s in samples), default=0))
                rows["sum_abs"].append(sum(abs(s) for s in samples))
                rows["sum_sq"].append(sum(s * s for s in samples))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, PCM_STATS_SCHEMA)


CLIP_FEATURES_SCHEMA = T.StructType(
    PCM_STATS_SCHEMA.fields
    + [
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("peak_frame_energy", T.LongType(), True),
        T.StructField("n_zero_cross", T.LongType(), True),
    ]
)


def wav_clip_features(media: DataFrame, frame: int = 160) -> DataFrame:
    """MEDIA_SCHEMA (WAV payloads) → the PCM_STATS columns PLUS
    framewise DSP features from the same single decode pass: the clip
    is cut into non-overlapping ``frame``-sample windows (trailing
    partial frame dropped — the standard STFT convention) and each
    frame's energy (sum s²) and zero-crossing count (sign flips
    between adjacent samples, 0 counting as positive) reduce to
    n_frames / peak_frame_energy / total n_zero_cross per clip — the
    voice-activity / silence-trim signals an audio-curation stage
    thresholds on before any expensive model sees the clip. All
    integers, so the oracle replays them exactly.

    Scale: identical shape to :func:`wav_pcm_stats` — one Arrow-batched
    mapInPandas, zero exchanges, O(duration) per clip; a framewise
    per-row output (media_id, frame_idx, energy, zcross) would be the
    same pass with the aggregate loop removed."""

    cols = (
        "media_id", "sample_rate", "channels", "n_samples", "peak",
        "sum_abs", "sum_sq", "n_frames", "peak_frame_energy",
        "n_zero_cross",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                rate, nch, samples = decode_wav(bytes(payload))
                nf = len(samples) // frame
                peak_e = 0
                zc = 0
                for f in range(nf):
                    seg = samples[f * frame : (f + 1) * frame]
                    peak_e = max(peak_e, sum(s * s for s in seg))
                    zc += sum(
                        1
                        for a, b in zip(seg, seg[1:])
                        if (a < 0) != (b < 0)
                    )
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["channels"].append(nch)
                rows["n_samples"].append(len(samples))
                rows["peak"].append(max((abs(s) for s in samples), default=0))
                rows["sum_abs"].append(sum(abs(s) for s in samples))
                rows["sum_sq"].append(sum(s * s for s in samples))
                rows["n_frames"].append(nf)
                rows["peak_frame_energy"].append(peak_e)
                rows["n_zero_cross"].append(zc)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, CLIP_FEATURES_SCHEMA)

"""Multimodal plumbing: mapInPandas decode stage over binary payloads —
schema, batch shape, determinism, and skew-bucket column."""

from __future__ import annotations

from pyspark.sql import functions as F

from stonkwhisperer_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_features,
    size_bucket,
)


def _media(spark):
    rows = [
        (i, ["image/png", "audio/wav", "video/mp4"][i % 3], bytes([i % 251]) * (10 + i * 7))
        for i in range(50)
    ]
    return spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )


def test_decode_features_schema_and_values(spark):
    out = decode_features(_media(spark))
    assert out.schema == FEATURE_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 50
    # deterministic features of the bytes themselves
    assert rows[0].n_bytes == 10
    assert rows[0].header_hex == bytes([0]).hex() * 4
    assert len(rows[0].feature) == 8
    # single-valued payload → zero entropy; determinism across runs
    assert rows[0].byte_entropy == 0.0
    again = {r.media_id: r for r in decode_features(_media(spark)).collect()}
    assert all(rows[i].feature == again[i].feature for i in rows)


def test_decode_features_null_payload(spark):
    df = spark.createDataFrame(
        [(1, "image/png", None)], "media_id long, media_type string, payload binary"
    )
    row = decode_features(df).collect()[0]
    assert row.n_bytes is None and row.feature is None


def test_size_bucket_bounded(spark):
    out = size_bucket(_media(spark), n_buckets=8)
    stats = out.agg(
        F.min("_size_bucket").alias("lo"), F.max("_size_bucket").alias("hi")
    ).collect()[0]
    assert 0 <= stats.lo and stats.hi < 8


def test_resize_images_fixed_output(spark):
    from stonkwhisperer_spark.operators.multimodal import RESIZED_SCHEMA, resize_images

    out = resize_images(_media(spark), width=8, height=4)
    assert out.schema == RESIZED_SCHEMA
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.pixels) == 8 * 4 for r in rows)  # constant-size contract
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_sample_frames_row_expansion(spark):
    from stonkwhisperer_spark.operators.multimodal import FRAME_SCHEMA, sample_frames

    # payload of media_id i has 10 + 7i bytes (see _media); with
    # 20-byte frames and every_n=1: (10 + 7i) // 20 frames per row.
    out = sample_frames(_media(spark), frame_bytes=20, every_n=1)
    assert out.schema == FRAME_SCHEMA
    per_doc = {r.media_id: r.cnt for r in out.groupBy("media_id").agg(
        F.count("*").alias("cnt")).collect()}
    for i, cnt in per_doc.items():
        assert cnt == (10 + 7 * i) // 20
    # media 0 (10 bytes) yields no complete frame and is absent
    assert 0 not in per_doc and 1 not in per_doc and 2 in per_doc
    assert all(len(r.frame) == 20 for r in out.collect())

    # every_n=2 halves the sampled frames (rounded up per video)
    half = sample_frames(_media(spark), frame_bytes=20, every_n=2)
    for r in half.groupBy("media_id").agg(F.count("*").alias("cnt")).collect():
        assert r.cnt == -(-per_doc[r.media_id] // 2)


def test_png_codec_roundtrip_and_filters():
    """The pure-stdlib PNG codec: encode→decode round trip is exact,
    the decoder un-applies ALL five scanline filters, validates chunk
    CRCs, and strips alpha from RGBA."""
    import struct
    import zlib

    import pytest

    from stonkwhisperer_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    w, h = 5, 4
    rgb = bytes((x * 31 + y * 17 + c * 7) % 256 for y in range(h) for x in range(w) for c in range(3))
    assert decode_png(encode_png(w, h, rgb)) == (w, h, rgb)

    # Hand-build PNGs using each non-zero filter type; the decoder must
    # reconstruct the same pixels regardless of the filter chosen.
    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
        )

    stride = w * 3
    rows = [bytearray(rgb[y * stride : (y + 1) * stride]) for y in range(h)]

    def filtered(ftype):
        out, prev = b"", bytearray(stride)
        for row in rows:
            enc = bytearray(row)
            if ftype == 1:  # Sub
                for i in range(stride - 1, 2, -1):
                    enc[i] = (enc[i] - row[i - 3]) & 0xFF
            elif ftype == 2:  # Up
                for i in range(stride):
                    enc[i] = (enc[i] - prev[i]) & 0xFF
            elif ftype == 3:  # Average
                for i in range(stride - 1, -1, -1):
                    left = row[i - 3] if i >= 3 else 0
                    enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                from stonkwhisperer_spark.operators.multimodal import _paeth

                for i in range(stride - 1, -1, -1):
                    left = row[i - 3] if i >= 3 else 0
                    upleft = prev[i - 3] if i >= 3 else 0
                    enc[i] = (enc[i] - _paeth(left, prev[i], upleft)) & 0xFF
            out += bytes([ftype]) + bytes(enc)
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(out))
            + chunk(b"IEND", b"")
        )

    for ftype in (1, 2, 3, 4):
        assert decode_png(filtered(ftype)) == (w, h, rgb), f"filter {ftype}"

    # CRC corruption is detected, not silently decoded.
    good = bytearray(encode_png(w, h, rgb))
    good[20] ^= 0xFF  # flip a byte inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))

    # RGBA input: alpha plane stripped on decode.
    rgba_rows = b"".join(
        b"\x00"
        + bytes(
            v
            for x in range(w)
            for v in ((x * 3) % 256, (x * 5) % 256, (x * 7) % 256, 255)
        )
        for _ in range(h)
    )
    ihdr_rgba = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    png_rgba = (
        _PNG_SIG
        + chunk(b"IHDR", ihdr_rgba)
        + chunk(b"IDAT", zlib.compress(rgba_rows))
        + chunk(b"IEND", b"")
    )
    dw, dh, drgb = decode_png(png_rgba)
    assert (dw, dh) == (w, h)
    assert drgb[:9] == bytes([0, 0, 0, 3, 5, 7, 6, 10, 14])


def test_nearest_neighbor_resize_grid_map():
    """Floor grid map: 2x decimation keeps every even pixel; identity
    resize returns the buffer unchanged; upscale repeats pixels."""
    from stonkwhisperer_spark.operators.multimodal import _resize_rgb_nearest

    w, h = 4, 2
    # pixel (x, y) = (x, y, 10*x+y)
    rgb = bytes(
        v for y in range(h) for x in range(w) for v in (x, y, 10 * x + y)
    )
    assert _resize_rgb_nearest(w, h, rgb, w, h) == rgb  # identity
    down = _resize_rgb_nearest(w, h, rgb, 2, 1)  # keeps (0,0) and (2,0)
    assert down == bytes([0, 0, 0, 2, 0, 20])
    up = _resize_rgb_nearest(w, h, rgb, 8, 2)  # each pixel twice per row
    assert up[:12] == bytes([0, 0, 0, 0, 0, 0, 1, 0, 10, 1, 0, 10])


def test_resize_png_nearest_real_decode(spark):
    """The real chain: encode an actual PNG, resize through the full
    decoder, check the sampled pixels against the source formula."""
    import pandas as pd

    from stonkwhisperer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        resize_png_nearest,
    )

    w, h = 6, 4
    rgb = bytes(
        v for y in range(h) for x in range(w) for v in (x * 7 % 256, y * 11 % 256, (x + y) % 256)
    )

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": [1],
                    "media_type": ["image/png"],
                    "payload": [encode_png(w, h, rgb)],
                }
            )

    media = spark.range(1).mapInPandas(gen, MEDIA_SCHEMA)
    out = resize_png_nearest(media, out_w=3, out_h=2).collect()
    assert len(out) == 1 and (out[0].width, out[0].height) == (3, 2)
    px = bytes(out[0].pixels)
    # output (ox, oy) samples source (2*ox, 2*oy)
    want = bytes(
        v
        for oy in range(2)
        for ox in range(3)
        for v in ((2 * ox) * 7 % 256, (2 * oy) * 11 % 256, (2 * ox + 2 * oy) % 256)
    )
    assert px == want


def test_split_png_frames_walks_chunks():
    """The container splitter must split on REAL chunk boundaries
    (variable compressed sizes), not fixed-size slices, and reject
    corrupt containers."""
    import pytest

    from stonkwhisperer_spark.operators.multimodal import (
        decode_png,
        encode_png,
        split_png_frames,
    )

    # frames with very different compressibility -> different byte sizes
    f0 = encode_png(4, 2, bytes(24))                     # all-zero, tiny
    f1 = encode_png(4, 2, bytes(range(24)))              # gradient
    f2 = encode_png(4, 2, bytes((i * 37 + 11) % 256 for i in range(24)))
    assert len({len(f0), len(f1), len(f2)}) > 1          # sizes genuinely differ
    frames = split_png_frames(f0 + f1 + f2)
    assert [len(x) for x in frames] == [len(f0), len(f1), len(f2)]
    # every split frame round-trips through the real decoder
    assert decode_png(frames[1]) == (4, 2, bytes(range(24)))
    with pytest.raises(ValueError):
        split_png_frames(f0 + b"JUNK" + f1)
    with pytest.raises(ValueError):
        split_png_frames(f0[:-4])                        # truncated IEND


def test_sample_png_frames_every_n(spark):
    """sample_png_frames keeps frames 0, n, 2n... as complete decodable
    PNG streams."""
    import pandas as pd

    from stonkwhisperer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        encode_png,
        sample_png_frames,
    )

    def gen(batches):
        for pdf in batches:
            payload = b"".join(
                encode_png(2, 1, bytes([f, 0, 0, 0, f, 0])) for f in range(5)
            )
            yield pd.DataFrame(
                {"media_id": [7], "media_type": ["video/x-png-seq"], "payload": [payload]}
            )

    media = spark.range(1).mapInPandas(gen, MEDIA_SCHEMA)
    out = sorted(
        (r.frame_idx, bytes(r.frame))
        for r in sample_png_frames(media, every_n=2).collect()
    )
    assert [i for i, _ in out] == [0, 2, 4]
    for i, frame in out:
        assert decode_png(frame) == (2, 1, bytes([i, 0, 0, 0, i, 0]))


def test_wav_codec_roundtrip_pad_and_errors():
    import struct

    import pytest

    from stonkwhisperer_spark.operators.multimodal import decode_wav, encode_wav

    # Round-trip with odd and even sample counts (data-chunk padding)
    # and extreme amplitudes; the encoder's odd-size LIST chunk forces
    # the parser through the RIFF pad-byte path on every container.
    for samples in ([0], [-32768, 32767, 1], [5, -5], list(range(-50, 53))):
        wav = encode_wav(8000, 1, samples)
        assert decode_wav(wav) == (8000, 1, samples)
        assert len(wav) % 2 == 0  # container itself is even-aligned

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)

    # Non-PCM fmt must fail loud, not emit garbage features.
    wav = bytearray(encode_wav(8000, 1, [1, 2]))
    fmt_off = wav.index(b"fmt ") + 8
    wav[fmt_off : fmt_off + 2] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(wav))

    # A truncated container (no data chunk inside the declared RIFF
    # size) must also fail loud.
    wav = encode_wav(8000, 1, [1, 2, 3])
    data_off = wav.index(b"data")
    with pytest.raises(ValueError, match="no data chunk"):
        decode_wav(wav[:data_off] + b"\x00" * (len(wav) - data_off))


def test_wav_clip_features_framing_and_zero_cross(spark):
    # A hand-built alternating clip: 370 samples at frame=160 → 2 full
    # frames (trailing 50 dropped); each frame alternates sign every
    # sample → 159 crossings/frame; energy = 160 * amp². The aggregate
    # columns must match those closed forms exactly.
    from stonkwhisperer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_wav,
        wav_clip_features,
    )

    samples = [100 if i % 2 == 0 else -100 for i in range(370)]
    payload = encode_wav(8000, 1, samples)
    media = spark.createDataFrame(
        [(1, "audio/wav", bytearray(payload))], MEDIA_SCHEMA
    )
    row = wav_clip_features(media, frame=160).collect()[0]
    assert row.n_samples == 370
    assert row.n_frames == 2
    assert row.peak_frame_energy == 160 * 100 * 100
    assert row.n_zero_cross == 2 * 159
    # the clip-level stats still come through the same pass
    assert row.peak == 100 and row.sum_abs == 370 * 100

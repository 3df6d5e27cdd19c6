"""Real dependency-free media codecs: PPM/BMP pixel decode, WAV sample
decode, and actual pixel-space resize — end-to-end through mapInPandas so
the worker-serialization path is exercised too."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from custom_python_vectordb_spark.operators.multimodal import (
    decode_audio,
    decode_bmp,
    decode_images,
    decode_ppm,
    decode_wav,
    encode_ppm,
    resize_ppm_pixels,
)


def make_gradient(h, w):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    px[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    px[:, :, 2] = 7
    return px


def make_bmp(px) -> bytes:
    """24bpp bottom-up BMP from an (h, w, 3) RGB array."""
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)  # RGB→BGR
    body = rows[::-1].tobytes()  # bottom-up
    data_offset = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_offset + len(body), 0, 0, data_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def make_wav(samples: np.ndarray, rate=8000, nch=1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def test_ppm_roundtrip_pure():
    px = make_gradient(5, 9)
    w, h, c, out = decode_ppm(encode_ppm(px))
    assert (w, h, c) == (9, 5, 3)
    assert np.array_equal(out, px)


def test_bmp_decode_pure():
    px = make_gradient(6, 5)  # odd width exercises row padding
    w, h, c, out = decode_bmp(make_bmp(px))
    assert (w, h, c) == (5, 6, 3)
    assert np.array_equal(out, px)


def test_wav_decode_pure():
    t = np.arange(8000)
    samples = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    nch, rate, n, dur, rms = decode_wav(make_wav(samples))
    assert (nch, rate, n) == (1, 8000, 8000)
    assert dur == pytest.approx(1.0)
    assert rms == pytest.approx(10000 / np.sqrt(2), rel=0.01)


def test_decode_images_spark(spark):
    ppm_px, bmp_px = make_gradient(8, 12), make_gradient(4, 6)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_ppm(ppm_px))),
            (2, bytearray(make_bmp(bmp_px))),
            (3, bytearray(b"not an image")),
        ],
        "doc_id long, media binary",
    )
    rows = {r["doc_id"]: r for r in decode_images(df).collect()}
    assert set(rows) == {1, 2}  # non-image rows skipped
    assert (rows[1]["codec"], rows[1]["width"], rows[1]["height"]) == ("ppm", 12, 8)
    assert (rows[2]["codec"], rows[2]["width"], rows[2]["height"]) == ("bmp", 6, 4)
    for did, px in ((1, ppm_px), (2, bmp_px)):
        luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]).mean()
        assert rows[did]["mean_luma"] == pytest.approx(float(luma), rel=1e-9)


def test_decode_audio_spark(spark):
    samples = (5000 * np.sin(2 * np.pi * np.arange(4000) * 0.05)).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(make_wav(samples, rate=16000))), (2, bytearray(b"xx"))],
        "doc_id long, media binary",
    )
    rows = decode_audio(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["n_channels"], r["sample_rate"], r["n_samples"]) == (1, 1, 16000, 4000)
    assert r["duration_s"] == pytest.approx(0.25)
    assert r["rms"] == pytest.approx(float(np.sqrt((samples.astype(np.float64) ** 2).mean())), rel=1e-9)


def test_resize_ppm_pixels_spark(spark):
    px = make_gradient(40, 100)
    df = spark.createDataFrame([(1, bytearray(encode_ppm(px)))], "doc_id long, media binary")
    out = resize_ppm_pixels(df, max_side=50).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (50, 20)
    w2, h2, _, small = decode_ppm(bytes(r["media"]))
    assert (w2, h2) == (50, 20)
    # nearest-neighbour: resampled pixels are exact picks from the source
    xs = (np.arange(50) * (100 / 50)).astype(int)
    ys = (np.arange(20) * (40 / 20)).astype(int)
    assert np.array_equal(small, px[ys][:, xs])
    # upscale never happens
    same = resize_ppm_pixels(df, max_side=200).collect()[0]
    assert (same["width"], same["height"]) == (100, 40)


def test_png_roundtrip_all_color_types():
    """encode_png → decode_png is exact for gray / gray+alpha / RGB /
    RGBA (8-bit, filter 0) — no imaging library anywhere."""
    import numpy as np

    from custom_python_vectordb_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for shape in ((5, 4), (5, 4, 2), (6, 3, 3), (4, 7, 4)):
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        w, h, c, px = decode_png(encode_png(arr))
        assert (w, h) == (shape[1], shape[0])
        assert c == (1 if len(shape) == 2 else shape[2])
        assert (px.reshape(arr.shape) == arr).all(), shape


def test_png_filter_reconstruction_sub_up_avg_paeth():
    """Hand-built IDAT streams exercising every PNG row filter must
    reconstruct to the reference image (filters computed forward here,
    decoder must invert them)."""
    import struct
    import zlib

    import numpy as np

    from custom_python_vectordb_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)  # the TRUTH
    h, w, nch = img.shape
    stride = w * nch
    flat = img.reshape(h, stride).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = b""
    filters = [0, 1, 2, 3, 4]
    prev = np.zeros(stride, np.int32)
    for r in range(h):
        ft = filters[r % len(filters)]
        line = flat[r]
        out = np.empty(stride, np.int32)
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[ft]
            out[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(out.astype(np.uint8))
        prev = line

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    ww, hh, c, px = decode_png(buf)
    assert (ww, hh, c) == (w, h, 3)
    assert (px == img).all()


def test_png_palette_and_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest

    from custom_python_vectordb_spark.operators.multimodal import decode_png

    # palette PNG: 2 colors, 2x2
    plte = bytes([255, 0, 0, 0, 0, 255])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([1, 0])

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, c, px = decode_png(buf)
    assert (w, h, c) == (2, 2, 3)
    assert (px == np.array([[[255, 0, 0], [0, 0, 255]], [[0, 0, 255], [255, 0, 0]]])).all()
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF")
    # 16-bit depth refused loudly
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 6))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bad)


def test_decode_images_sniffs_png(spark):
    """PNG payloads flow through the Spark decode operator next to
    PPM/BMP, with real pixel luma."""
    import numpy as np

    from custom_python_vectordb_spark.operators.multimodal import (
        decode_images,
        encode_png,
        encode_ppm,
    )

    solid = np.full((4, 4, 3), 100, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(solid))),
        (2, bytearray(encode_ppm(solid))),
        (3, bytearray(b"not an image")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r for r in decode_images(media).collect()}
    assert set(got) == {1, 2}
    assert got[1]["codec"] == "png" and got[2]["codec"] == "ppm"
    for r in got.values():
        assert (r["width"], r["height"], r["channels"]) == (4, 4, 3)
        assert abs(r["mean_luma"] - 100.0) < 1e-9


def test_resize_images_sniffs_and_reencodes(spark):
    """resize_images: PPM stays PPM, PNG/BMP come back as decodable PNG,
    pixels actually resampled (gradient structure preserved)."""
    import numpy as np

    from custom_python_vectordb_spark.operators.multimodal import (
        decode_png,
        decode_ppm,
        encode_png,
        encode_ppm,
        resize_images,
    )

    grad = np.zeros((8, 8, 3), dtype=np.uint8)
    grad[:, 4:, :] = 200  # left half black, right half bright
    rows = [
        (1, bytearray(encode_ppm(grad))),
        (2, bytearray(encode_png(grad))),
        (3, bytearray(b"nope")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r for r in resize_images(media, max_side=4).collect()}
    assert set(got) == {1, 2}
    assert got[1]["codec"] == "ppm" and got[2]["codec"] == "png"
    for did, dec in ((1, decode_ppm), (2, decode_png)):
        r = got[did]
        assert (r["width"], r["height"]) == (4, 4)
        w, h, c, px = dec(bytes(r["media"]))
        assert (w, h, c) == (4, 4, 3)
        assert (px[:, :2] == 0).all() and (px[:, 2:] == 200).all()


def test_media_features_snapshot_matches_recomputation(spark):
    """Frozen sf0.01 media_features rows (the snapshot oracle) must equal
    a live recomputation — drift fails here before the driver gate."""
    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.queries._media_snapshot import (
        MEDIA_FEATURES_ROWS_SF001,
    )

    registry.load_all()
    fn = registry.QUERIES["media_features"].__wrapped__
    live = [
        (int(r["doc_id"]), int(r["dim"]), float(r["norm"]), float(r["f0"]))
        for r in fn(spark, "/root/testdata/sf0.01").collect()
    ]
    assert live == [
        (i, d, float(n), float(f)) for i, d, n, f in MEDIA_FEATURES_ROWS_SF001
    ]


def test_gif_roundtrip_and_lzw_growth():
    """encode_gif → decode_gif reproduces every composed frame exactly,
    including an LZW stream large enough to force code-width growth and a
    dictionary clear (random 64x64 over 7 colors)."""
    import numpy as np

    from custom_python_vectordb_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    frames = [rng.integers(0, 7, (9, 11), dtype=np.uint8) for _ in range(3)]
    w, h, n, out = decode_gif(encode_gif(frames, pal))
    assert (w, h, n) == (11, 9, 3)
    for f_idx, f_out in zip(frames, out):
        assert (f_out == pal[f_idx]).all()
    big = rng.integers(0, 7, (64, 64), dtype=np.uint8)
    _, _, _, out = decode_gif(encode_gif([big], pal))
    assert (out[0] == pal[big]).all()


def test_gif_transparency_composes_over_previous_frame():
    import numpy as np

    from custom_python_vectordb_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    pal = np.array([[9, 9, 9], [50, 60, 70], [200, 10, 30]], dtype=np.uint8)
    f1 = np.full((4, 4), 1, np.uint8)
    f2 = np.zeros((4, 4), np.uint8)
    f2[0, 0] = 2  # everything else transparent (index 0)
    _, _, n, out = decode_gif(encode_gif([f1, f2], pal, transparent=0))
    assert n == 2
    assert (out[1][0, 0] == pal[2]).all()
    assert (out[1][1, 1] == pal[1]).all()  # transparent pixel shows frame 1
    from custom_python_vectordb_spark.operators.multimodal import decode_gif as dg
    import pytest

    with pytest.raises(ValueError, match="not a GIF"):
        dg(b"PNG?")


def test_gif_frame_sample_operator(spark):
    """Real animation sampling through Spark: evenly spaced composed
    frames with real per-frame luma (frames get brighter over time)."""
    import numpy as np

    from custom_python_vectordb_spark.operators.multimodal import (
        encode_gif,
        gif_frame_sample,
    )

    pal = np.array([[0, 0, 0], [100, 100, 100], [200, 200, 200]], dtype=np.uint8)
    frames = [np.full((6, 6), i, np.uint8) for i in range(3)]  # dark → bright
    rows = [
        (1, bytearray(encode_gif(frames, pal))),
        (2, bytearray(b"not a gif")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    got = sorted(
        (r["frame_idx"], r["mean_luma"]) for r in gif_frame_sample(media, 2).collect()
    )
    assert [f for f, _ in got] == [0, 2]
    assert got[0][1] == 0.0 and abs(got[1][1] - 200.0) < 1e-9


def test_gif_frames_snapshot_matches_recomputation(spark):
    """Frozen sf0.01 media_gif_frames rows (the snapshot oracle for the
    whole GIF encode->decode->sample pipeline) must equal a live
    recomputation."""
    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.queries._media_snapshot import (
        GIF_FRAMES_ROWS_SF001,
    )

    registry.load_all()
    fn = registry.QUERIES["media_gif_frames"].__wrapped__
    live = sorted(
        (int(r["doc_id"]), int(r["frame_idx"]), int(r["n_total_frames"]),
         int(r["width"]), int(r["height"]), float(r["mean_luma"]))
        for r in fn(spark, "/root/testdata/sf0.01").collect()
    )
    assert live == [tuple(r) for r in GIF_FRAMES_ROWS_SF001]


# ------------------------------------------------------- perceptual hashing

def _phash_img(doc, H=16, W=72):
    yy, xx = np.mgrid[0:H, 0:W]
    m = (doc * 73856093 + yy * 19349663 + xx * 83492791) % 2147483648
    v = (((m * m) // 65536) % 256).astype(np.uint8)
    return np.repeat(v[:, :, None], 3, axis=2)


def test_encode_bmp_roundtrip_pure():
    from custom_python_vectordb_spark.operators.multimodal import encode_bmp

    rng = np.random.default_rng(3)
    for h, w in ((16, 72), (5, 7), (1, 1), (3, 4)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        w2, h2, c, px2 = decode_bmp(encode_bmp(px))
        assert (w2, h2, c) == (w, h, 3)
        assert np.array_equal(px, px2)


def test_perceptual_hash_planted_twins(spark):
    """The planted-twin contract: the SAME image re-encoded in another
    codec AND 2x nearest-neighbour upsampled must hash identically
    (hamming 0 in both dHash and aHash); distinct images must stay far
    (measured min distinct-pair hamming 6 at 5010 docs)."""
    from custom_python_vectordb_spark.operators.dedup import perceptual_hash_pairs
    from custom_python_vectordb_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        encode_ppm,
        image_perceptual_hashes,
    )

    rows = []
    encs = [encode_ppm, encode_bmp, encode_png]
    for doc in range(12):
        px = _phash_img(doc)
        rows.append((doc, encs[doc % 3](px)))
        if doc < 4:  # twins: codec swap + 2x upsample
            tw = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
            rows.append((doc + 20000, encs[(doc + 1) % 3](tw)))
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    hashes = image_perceptual_hashes(media)
    pairs = perceptual_hash_pairs(
        hashes, max_hamming=3, extra_prefixes=("ah",)
    ).collect()
    got = {(r["a"], r["b"]): (r["dhamming"], r["ahamming"]) for r in pairs}
    assert got == {(d, d + 20000): (0, 0) for d in range(4)}
    # signatures themselves: twin equals base band-for-band
    hpd = {r["doc_id"]: r for r in hashes.collect()}
    for d in range(4):
        for c in ("dh0", "dh1", "dh2", "dh3", "ah0", "ah1", "ah2", "ah3"):
            assert hpd[d][c] == hpd[d + 20000][c]


def test_perceptual_hash_rejects_edits(spark):
    """A genuinely different image (one block's luma flipped) must NOT
    pair at max_hamming=3, and non-image payloads are skipped."""
    from custom_python_vectordb_spark.operators.dedup import perceptual_hash_pairs
    from custom_python_vectordb_spark.operators.multimodal import (
        encode_ppm,
        image_perceptual_hashes,
    )

    base = _phash_img(7)
    edited = base.copy()
    edited[:, :36] = 255 - edited[:, :36]  # invert half the image
    rows = [
        (1, bytearray(encode_ppm(base))),
        (2, bytearray(encode_ppm(edited))),
        (3, b"not an image at all"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    hashes = image_perceptual_hashes(media)
    assert {r["doc_id"] for r in hashes.collect()} == {1, 2}
    assert perceptual_hash_pairs(hashes, max_hamming=3).count() == 0


# ------------------------------------------------------------ baseline JPEG

def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_jpeg_roundtrip_psnr_and_determinism():
    from custom_python_vectordb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:16, 0:72]
    smooth = np.stack([(xx * 3) % 256, (yy * 9) % 256, ((xx + yy) * 2) % 256], 2).astype(np.uint8)
    buf = encode_jpeg(smooth, quality=90)
    w, h, c, px = decode_jpeg(buf)
    assert (w, h, c) == (72, 16, 3)
    assert _psnr(smooth, px) > 40.0
    # flat blocks survive quantization exactly
    flat = np.full((24, 40, 3), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90))[3], flat)
    # non-multiple-of-8 dims (edge-padded blocks) + grayscale
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (17, 23, 3), np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(noise, 95))
    assert (w, h, c) == (23, 17, 3) and _psnr(noise, px) > 25.0
    g = ((yy * 5 + xx * 2) % 256).astype(np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(g, 85))
    assert (w, h, c) == (72, 16, 1) and _psnr(g, px[:, :, 0]) > 40.0
    # bit-stable: same bytes in, same bytes/pixels out
    assert encode_jpeg(smooth, 90) == encode_jpeg(smooth, 90)
    assert np.array_equal(decode_jpeg(buf)[3], decode_jpeg(buf)[3])


def _dc_only_420_jpeg(y_dcs_per_mcu, cb_dc, cr_dc, w, h, dri=0):
    """Hand-built 4:2:0 DC-only baseline JPEG (the 'minimal fixture' path):
    every block is one DC coefficient + EOB, quant tables all 16, custom
    2-entry Huffman tables written into DHT. With only the DC coefficient,
    each 8x8 block decodes to the constant 128 + 2*dc (quant 16 x
    orthonormal IDCT /8), which the test asserts pixel-exactly."""
    import struct

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zzvals = bytes([16] * 64)
    # DC table: categories 0..5 at code length 3 (000..101); AC: EOB = '0'
    dc_bits = [0, 0, 6] + [0] * 13
    dc_vals = list(range(6))
    ac_bits = [1] + [0] * 15
    ac_vals = [0x00]

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xDB, b"\x00" + zzvals)
    # SOF0: Y 2x2 sampling, Cb/Cr 1x1, all quant table 0
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
               + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xC4, b"\x00" + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, b"\x10" + bytes(ac_bits) + bytes(ac_vals))
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00")

    bits = []

    def put(code, ln):
        bits.extend((code >> (ln - 1 - i)) & 1 for i in range(ln))

    def put_dc(diff):
        s = abs(diff).bit_length()
        assert s <= 5
        put(s, 3)  # category s has code s at length 3
        if s:
            put(diff if diff > 0 else diff + (1 << s) - 1, s)

    def flush():
        while len(bits) % 8:
            bits.append(1)
        by = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i : i + 8]:
                v = (v << 1) | b
            by.append(v)
            if v == 0xFF:
                by.append(0x00)
        bits.clear()
        return bytes(by)

    preds = {"y": 0, "cb": 0, "cr": 0}
    n_mcus = len(y_dcs_per_mcu)
    for mi, ydcs in enumerate(y_dcs_per_mcu):
        if dri and mi and mi % dri == 0:
            out += flush()
            out += bytes([0xFF, 0xD0 + ((mi // dri - 1) % 8)])
            preds = {"y": 0, "cb": 0, "cr": 0}
        for d in ydcs:  # 4 Y blocks: TL TR BL BR
            put_dc(d - preds["y"])
            preds["y"] = d
            put(0, 1)  # EOB
        put_dc(cb_dc - preds["cb"])
        preds["cb"] = cb_dc
        put(0, 1)
        put_dc(cr_dc - preds["cr"])
        preds["cr"] = cr_dc
        put(0, 1)
    out += flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_420_subsampling_and_restart_markers():
    """Hand-built 32x16 4:2:0 two-MCU stream with DRI=1 and an RST0
    between MCUs: quadrant lumas and chroma must land pixel-exactly at
    128 + 2*dc, chroma upsampled 2x to full res."""
    from custom_python_vectordb_spark.operators.multimodal import decode_jpeg

    mcu0, mcu1 = [4, 8, 12, 14], [2, 6, 10, 12]
    buf = _dc_only_420_jpeg([mcu0, mcu1], cb_dc=0, cr_dc=0, w=32, h=16, dri=1)
    w, h, c, px = decode_jpeg(buf)
    assert (w, h, c) == (32, 16, 3)
    # Cb=Cr=128 -> RGB == Y; Y quadrants per MCU (2x2 blocks of 8x8)
    for mx, ydcs in enumerate((mcu0, mcu1)):
        for bi, d in enumerate(ydcs):
            by, bx = divmod(bi, 2)
            block = px[by * 8 : by * 8 + 8, mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8]
            assert (block == 128 + 2 * d).all(), (mx, bi)
    # chroma path: nonzero Cb shifts blue up, red down (one MCU, flat Y)
    buf2 = _dc_only_420_jpeg([[0, 0, 0, 0]], cb_dc=8, cr_dc=0, w=16, h=16)
    _, _, _, px2 = decode_jpeg(buf2)
    assert (px2[:, :, 2].astype(int) - px2[:, :, 0].astype(int) > 20).all()
    assert np.unique(px2[:, :, 2]).size == 1  # chroma constant over the MCU


def test_jpeg_progressive_decodes_and_bad_magic_raises():
    """SOF2 routes to the progressive decoder as of r10 (a header-only
    SOF2 stream now fails for lack of scans, not for being progressive);
    non-JPEG magic still raises immediately."""
    from custom_python_vectordb_spark.operators.multimodal import decode_jpeg

    import struct

    sof2 = (b"\xff\xd8" + bytes([0xFF, 0xC2]) + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="without SOF2/SOS"):
        decode_jpeg(sof2)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nope")


def test_jpeg_progressive_roundtrip_equals_baseline():
    """encode_jpeg_progressive carries the SAME quantized coefficients as
    encode_jpeg (same tables, DCT, rounding), so decoding both streams
    must be pixel-IDENTICAL — this one equality exercises spectral
    selection, successive approximation (DC and AC first + refinement),
    EOB runs, ZRL and correction bits end to end."""
    from custom_python_vectordb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(42)
    cases = []
    yy, xx = np.mgrid[0:33, 0:41]
    grad = np.clip(((yy * 3 + xx * 2) % 256)[..., None]
                   + rng.randint(-40, 40, (33, 41, 3)), 0, 255).astype(np.uint8)
    cases.append((grad, 75))
    cases.append((np.full((48, 56, 3), 77, np.uint8), 90))     # flat: max EOB runs
    sparse = np.zeros((40, 40, 3), np.uint8)
    sparse[::7, ::11] = 255                                    # ZRL + long runs
    cases.append((sparse, 85))
    cases.append((rng.randint(0, 256, (21, 13)).astype(np.uint8), 90))  # grayscale
    chk = (((yy[:32, :32] + xx[:32, :32]) % 2) * 255).astype(np.uint8)  # dense tail
    cases.append((chk, 95))
    for img, q in cases:
        base = decode_jpeg(encode_jpeg(img, q))
        prog = decode_jpeg(encode_jpeg_progressive(img, q))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3]), (img.shape, q)
    # magic sniffing: progressive bytes still start FF D8 -> same path
    assert encode_jpeg_progressive(grad, 75)[:2] == b"\xff\xd8"


def test_decode_images_sniffs_jpeg(spark):
    from custom_python_vectordb_spark.operators.multimodal import (
        decode_images,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:16, 0:24]
    img = np.stack([(xx * 7) % 256, (yy * 11) % 256, ((xx * yy) % 256)], 2).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img, 90))), (2, b"not media")],
        "doc_id long, media binary",
    )
    rows = decode_images(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["codec"], r["width"], r["height"], r["channels"]) == ("jpeg", 24, 16, 3)
    true_luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]).mean()
    assert abs(r["mean_luma"] - true_luma) < 3.0  # lossy, but close


def test_perceptual_hash_survives_jpeg_reencode(spark):
    """High-quality JPEG re-encode of a SMOOTH image must stay within the
    dHash pairing threshold of its lossless original — the cross-codec
    near-dup case perceptual hashing exists for (exact twins are the
    lossless-codec test above)."""
    from custom_python_vectordb_spark.operators.dedup import perceptual_hash_pairs
    from custom_python_vectordb_spark.operators.multimodal import (
        encode_jpeg,
        encode_png,
        image_perceptual_hashes,
    )

    yy, xx = np.mgrid[0:16, 0:72]
    v = ((xx * 255) // 71).astype(np.uint8)  # smooth horizontal ramp
    img = np.repeat(v[:, :, None], 3, axis=2)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(img))), (2, bytearray(encode_jpeg(img, 95)))],
        "doc_id long, media binary",
    )
    pairs = perceptual_hash_pairs(
        image_perceptual_hashes(media), max_hamming=3
    ).collect()
    assert len(pairs) == 1 and (pairs[0]["a"], pairs[0]["b"]) == (1, 2)


def test_jpeg_luma_snapshot_matches_recomputation(spark):
    """Frozen sf0.01 media_jpeg_luma rows (the snapshot oracle for the
    whole JPEG encode->decode pipeline, quantization loss included) must
    equal a live recomputation."""
    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.queries._jpeg_snapshot import (
        JPEG_LUMA_ROWS_SF001,
    )

    registry.load_all()
    fn = registry.QUERIES["media_jpeg_luma"].__wrapped__
    live = sorted(
        (int(r["doc_id"]), r["codec"], int(r["width"]), int(r["height"]),
         int(r["channels"]), float(r["mean_luma"]))
        for r in fn(spark, "/root/testdata/sf0.01").collect()
    )
    assert live == [tuple(r) for r in JPEG_LUMA_ROWS_SF001]


def test_image_features_real_descriptor(spark):
    """image_features must reflect actual pixel content: a bright image
    yields higher grid means than a dark one, twins (re-encode + 2x
    upsample) match exactly, and the descriptor feeds cosine math."""
    from custom_python_vectordb_spark.operators.multimodal import (
        encode_png,
        encode_ppm,
        image_features,
    )

    dark = np.full((16, 72, 3), 10, np.uint8)
    bright = np.full((16, 72, 3), 240, np.uint8)
    tex = _phash_img(5)
    tex_twin = np.repeat(np.repeat(tex, 2, axis=0), 2, axis=1)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_ppm(dark))),
            (2, bytearray(encode_ppm(bright))),
            (3, bytearray(encode_ppm(tex))),
            (4, bytearray(encode_png(tex_twin))),
        ],
        "doc_id long, media binary",
    )
    rows = {r["doc_id"]: r["features"] for r in image_features(media).collect()}
    assert all(len(v) == 64 for v in rows.values())
    assert max(rows[1]) < 11 and min(rows[2]) > 239
    assert rows[3] == rows[4]  # integer-exact twin invariance
    assert len(set(rows[3])) > 8  # textured image varies across the grid


def test_image_hash_index_incremental_converges(spark, tmp_path):
    """The streaming image-hash index twin must converge to the batch
    path's pair set over the union of all batches: twins split across
    batches are found when the second member arrives, within-batch twins
    by the same probe, and a batch REPLAY (crash recovery) leaves the
    index unchanged."""
    from custom_python_vectordb_spark.operators.dedup import perceptual_hash_pairs
    from custom_python_vectordb_spark.operators.multimodal import (
        encode_png,
        encode_ppm,
        image_perceptual_hashes,
    )
    from custom_python_vectordb_spark.streaming.media_maintenance import (
        load_image_pairs,
        process_image_batch,
    )

    def img_row(doc, twin_of=None):
        px = _phash_img(twin_of if twin_of is not None else doc)
        if twin_of is not None:
            px = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
            return (doc, bytearray(encode_png(px)))
        return (doc, bytearray(encode_ppm(px)))

    batches = [
        [img_row(0), img_row(1), img_row(20000, twin_of=0)],   # within-batch twin
        [img_row(2), img_row(20001, twin_of=1)],               # cross-batch twin
        [img_row(3), img_row(20002, twin_of=2)],               # cross-batch twin
    ]
    root = str(tmp_path / "imgidx")
    all_rows = []
    for bi, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, media binary")
        process_image_batch(df, bi, root)
        all_rows.extend(rows)

    got = {
        (r["a"], r["b"], r["dhamming"], r["ahamming"])
        for r in load_image_pairs(spark, root).collect()
    }
    full = spark.createDataFrame(all_rows, "doc_id long, media binary")
    want = {
        (r["a"], r["b"], r["dhamming"], r["ahamming"])
        for r in perceptual_hash_pairs(
            image_perceptual_hashes(full), max_hamming=3, extra_prefixes=("ah",)
        ).collect()
    }
    assert got == want and len(want) == 3

    # replay batch 1 (crash recovery): idempotent, nothing changes
    process_image_batch(
        spark.createDataFrame(batches[1], "doc_id long, media binary"), 1, root
    )
    got2 = {
        (r["a"], r["b"], r["dhamming"], r["ahamming"])
        for r in load_image_pairs(spark, root).collect()
    }
    assert got2 == want


# ------------------------------------------------------------ MJPEG-in-AVI

def test_avi_mjpeg_roundtrip_and_sampling(spark):
    from custom_python_vectordb_spark.operators.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        encode_jpeg,
        video_frame_sample,
    )

    frames = [_phash_img(s, H=16, W=24) for s in range(5)]
    avi = encode_avi_mjpeg([encode_jpeg(f, 85) for f in frames], 24, 16, fps=12)
    w, h, fps, dec = decode_avi_mjpeg(avi)
    assert (w, h, len(dec)) == (24, 16, 5) and abs(fps - 12) < 0.01
    for a, b in zip(frames, dec):
        assert _psnr(a, b) > 30.0
    # container is independent of frame payload order bugs: frame 3 ≠ frame 0
    assert not np.array_equal(dec[0], dec[3])
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")

    # Spark-side sampling: 2 of 5 evenly spaced (endpoints), real lumas
    media = spark.createDataFrame(
        [(1, bytearray(avi)), (2, b"not a video")], "doc_id long, media binary"
    )
    rows = video_frame_sample(media, 2).collect()
    assert [(r["doc_id"], r["frame_idx"], r["n_total_frames"]) for r in rows] == [
        (1, 0, 5), (1, 4, 5),
    ]
    for r in rows:
        true = frames[r["frame_idx"]]
        luma = (0.299 * true[:, :, 0] + 0.587 * true[:, :, 1]
                + 0.114 * true[:, :, 2]).mean()
        assert abs(r["mean_luma"] - luma) < 3.0  # lossy frames, close luma


def test_video_frames_snapshot_matches_recomputation(spark):
    """Frozen sf0.01 media_video_frames rows (the snapshot oracle for the
    whole AVI-container + JPEG-frame pipeline) must equal a live
    recomputation."""
    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.queries._video_snapshot import (
        VIDEO_FRAMES_ROWS_SF001,
    )

    registry.load_all()
    fn = registry.QUERIES["media_video_frames"].__wrapped__
    live = sorted(
        (int(r["doc_id"]), int(r["frame_idx"]), int(r["n_total_frames"]),
         int(r["width"]), int(r["height"]), float(r["fps"]), float(r["mean_luma"]))
        for r in fn(spark, "/root/testdata/sf0.01").collect()
    )
    assert live == [tuple(r) for r in VIDEO_FRAMES_ROWS_SF001]


# ------------------------------------------------------------ audio dedup

def test_audio_fingerprint_invariances(spark):
    """The fingerprint must be EXACTLY invariant to uniform integer gain
    and to trailing content beyond its span, and must reject different
    audio; non-WAV payloads are skipped."""
    import io
    import wave

    from custom_python_vectordb_spark.operators.dedup import perceptual_hash_pairs
    from custom_python_vectordb_spark.operators.multimodal import audio_fingerprint

    def wav_bytes(arr):
        b = io.BytesIO()
        with wave.open(b, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(arr.astype("<i2").tobytes())
        return b.getvalue()

    def pcm(seed, n=2112):
        t = np.arange(n, dtype=np.int64)
        m1 = (seed * 73856093 + t * 40503 + 12345) % 2147483648
        m2 = (m1 * m1) % 2147483648
        return ((m2 * m2) // 65536) % 16001 - 8000

    base = pcm(3)
    rows = [
        (1, bytearray(wav_bytes(base))),
        (2, bytearray(wav_bytes(2 * base))),                       # x2 gain
        (3, bytearray(wav_bytes(np.concatenate([base[:2080], np.full(500, 7000)])))),  # new tail
        (4, bytearray(wav_bytes(pcm(4)))),                         # different audio
        (5, bytearray(wav_bytes(pcm(3)[:100]))),                   # too short: skipped
        (6, b"not audio"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    hashes = audio_fingerprint(media)
    by_id = {r["doc_id"]: (r["fp0"], r["fp1"], r["fp2"], r["fp3"]) for r in hashes.collect()}
    assert set(by_id) == {1, 2, 3, 4}
    assert by_id[1] == by_id[2] == by_id[3]
    assert by_id[4] != by_id[1]
    pairs = {(r["a"], r["b"]): r["fpamming"]
             for r in perceptual_hash_pairs(hashes, max_hamming=3, band_prefix="fp").collect()}
    assert pairs == {(1, 2): 0, (1, 3): 0, (2, 3): 0}


def test_image_hash_replica_handle(spark, tmp_path):
    """The in-process dedup probe must agree with the batch banded join:
    an incoming re-encoded/resized/JPEG'd image finds its indexed
    original; a distinct image finds nothing; refresh() picks up new
    index shards."""
    from custom_python_vectordb_spark.operators.multimodal import (
        ImageHashReplicaHandle,
        encode_bmp,
        encode_jpeg,
        encode_png,
        encode_ppm,
        image_perceptual_hashes,
    )

    rows = [(d, bytearray(encode_ppm(_phash_img(d)))) for d in range(8)]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    sig_dir = str(tmp_path / "sigs")
    image_perceptual_hashes(media).coalesce(1).write.parquet(sig_dir)
    import glob

    shards = sorted(glob.glob(sig_dir + "/part-*.parquet"))
    h = ImageHashReplicaHandle(shards)

    base = _phash_img(3)
    for probe in (
        encode_png(base),                                   # codec swap
        encode_bmp(np.repeat(np.repeat(base, 2, 0), 2, 1)), # resized
        encode_jpeg(base, 95),                              # lossy re-encode
    ):
        ids, ham = h.search_one(probe, max_hamming=3)
        assert list(ids) == [3] and ham[0] <= 1, (list(ids), list(ham))
    ids, _ = h.search_one(encode_ppm(_phash_img(99)), max_hamming=3)
    assert len(ids) == 0
    with pytest.raises(ValueError, match="not a decodable image"):
        h.search_one(b"junk")

    # write-visibility: new shard appears after refresh()
    more = spark.createDataFrame(
        [(99, bytearray(encode_ppm(_phash_img(99))))], "doc_id long, media binary"
    )
    sig_dir2 = str(tmp_path / "sigs2")
    image_perceptual_hashes(more).coalesce(1).write.parquet(sig_dir2)
    h2 = ImageHashReplicaHandle(shards + sorted(glob.glob(sig_dir2 + "/part-*.parquet")))
    ids, ham = h2.search_one(encode_png(_phash_img(99)), max_hamming=3)
    assert list(ids) == [99] and ham[0] == 0


def test_jpeg_ff_fill_bytes_before_markers():
    """0xFF fill byte(s) before a marker code are legal padding (ITU-T
    T.81 B.1.1.2); the header scan must skip them, not read a bogus
    length (r9 ADVICE). Decoded pixels must be identical to the
    unpadded stream."""
    from custom_python_vectordb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    buf = encode_jpeg(img, quality=85)
    _, _, _, base = decode_jpeg(buf)
    # inject fill bytes before the DQT and SOF0 markers
    for marker in (b"\xff\xdb", b"\xff\xc0"):
        i = buf.index(marker)
        padded = buf[:i] + b"\xff" * 3 + buf[i:]
        w, h, c, px = decode_jpeg(padded)
        assert (w, h, c) == (24, 16, 3)
        assert np.array_equal(px, base)


def test_video_frame_sample_decodes_only_picked(spark):
    """The container walk returns raw payload slices; only picked indices
    go through the JPEG decoder (the docstring's 100 TB claim, r9 ADVICE).
    Proven by planting a CORRUPT frame at an unsampled index: sampling
    must still succeed, full decode must raise."""
    from custom_python_vectordb_spark.operators.multimodal import (
        decode_avi_frames,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    frames = [encode_jpeg(np.full((8, 8, 3), 40 * (i + 1), np.uint8)) for i in range(5)]
    avi = encode_avi_mjpeg(frames, 8, 8, fps=10)
    w, h, fps, bufs = decode_avi_frames(avi)
    assert (w, h, len(bufs)) == (8, 8, 5)
    # corrupt frame index 2 (never picked when sampling endpoints of 2)
    bad_payload = b"\xff\xd8" + b"\x00" * 10
    bad = avi.replace(bufs[2], bad_payload.ljust(len(bufs[2]), b"\x00"))
    _, _, _, bufs2 = decode_avi_frames(bad)
    assert len(bufs2) == 5
    with pytest.raises(Exception):
        decode_avi_mjpeg(bad)  # eager decode hits the corrupt frame

    from custom_python_vectordb_spark.operators.multimodal import video_frame_sample

    media = spark.createDataFrame([(1, bytearray(bad))], "doc_id long, media binary")
    rows = video_frame_sample(media, n_frames=2).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 4]


def test_mp4_jpeg_track_roundtrip_and_sampling(spark):
    """JPEG-track MP4 (r10): container round trip slices the exact frame
    bytes back out of mdat via the sample tables; decoded frames equal
    the AVI twin's; video_frame_sample sniffs ISO BMFF next to RIFF; a
    non-JPEG codec fourcc raises at the walk, not mid-decode."""
    from custom_python_vectordb_spark.operators.multimodal import (
        decode_avi_mjpeg,
        decode_mp4_frames,
        decode_mp4_mjpeg,
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mp4_mjpeg,
    )

    rng = np.random.RandomState(3)
    pxs = [rng.randint(0, 256, (16, 24, 3)).astype(np.uint8) for _ in range(4)]
    frames = [encode_jpeg(px, 80) for px in pxs]
    mp4 = encode_mp4_mjpeg(frames, 24, 16, fps=12)
    w, h, fps, bufs = decode_mp4_frames(mp4)
    assert (w, h, fps) == (24, 16, 12.0)
    assert bufs == frames  # exact payload slices out of mdat
    _, _, _, dec_mp4 = decode_mp4_mjpeg(mp4)
    _, _, _, dec_avi = decode_avi_mjpeg(encode_avi_mjpeg(frames, 24, 16, fps=12))
    for a, b in zip(dec_mp4, dec_avi):
        assert np.array_equal(a, b)

    with pytest.raises(ValueError, match="avc1"):
        decode_mp4_frames(mp4.replace(b"\x00\x00\x00\x56jpeg", b"\x00\x00\x00\x56avc1"))
    with pytest.raises(ValueError, match="not an MP4"):
        decode_mp4_frames(b"\x00\x00\x00\x08free")

    from custom_python_vectordb_spark.operators.multimodal import video_frame_sample

    media = spark.createDataFrame([(1, bytearray(mp4))], "doc_id long, media binary")
    rows = video_frame_sample(media, n_frames=2).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 3]
    assert all(r["n_total_frames"] == 4 and r["width"] == 24 for r in rows)


def test_jpeg_progressive_restart_intervals():
    """Progressive streams with DRI (every real web encoder emits them):
    per-segment DC-predictor and EOB-run resets must round-trip to the
    exact baseline pixels at several interval lengths, including dri=1
    (a restart between every MCU in every scan)."""
    from custom_python_vectordb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:40, 0:48]
    img = np.clip(
        ((yy * 3 + xx * 2) % 256)[..., None] + rng.randint(-40, 40, (40, 48, 3)),
        0, 255,
    ).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, 80))[3]
    for dri in (1, 2, 5, 7):
        buf = encode_jpeg_progressive(img, 80, dri=dri)
        assert b"\xff\xdd" in buf  # DRI marker present
        assert np.array_equal(decode_jpeg(buf)[3], base), dri
    # flat image: restart mid-EOB-run (the run must not span segments)
    flat = np.full((24, 24, 3), 99, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat, 85, dri=2))[3],
        decode_jpeg(encode_jpeg(flat, 85))[3],
    )


def _dc_only_420_progressive(y_dcs_per_mcu, cb_dc, cr_dc, w, h):
    """SOF2 twin of _dc_only_420_jpeg: ONE interleaved DC-first scan
    (Ss=Se=0, Ah=Al=0) and no AC scans — legal progressive (undefined
    coefficients decode as zero), exercising the interleaved DC path
    with 2x2/1x1 sampling factors."""
    import struct

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zzvals = bytes([16] * 64)
    dc_bits = [0, 0, 6] + [0] * 13
    dc_vals = list(range(6))

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xDB, b"\x00" + zzvals)
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", h, w)
               + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xC4, b"\x00" + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x00\x00")

    bits = []

    def put(code, ln):
        bits.extend((code >> (ln - 1 - i)) & 1 for i in range(ln))

    def put_dc(diff):
        s = abs(diff).bit_length()
        assert s <= 5
        put(s, 3)
        if s:
            put(diff if diff > 0 else diff + (1 << s) - 1, s)

    preds = {"y": 0, "cb": 0, "cr": 0}
    for ydcs in y_dcs_per_mcu:
        for d in ydcs:
            put_dc(d - preds["y"])
            preds["y"] = d
        put_dc(cb_dc - preds["cb"])
        preds["cb"] = cb_dc
        put_dc(cr_dc - preds["cr"])
        preds["cr"] = cr_dc
    while len(bits) % 8:
        bits.append(1)
    by = bytearray()
    for i in range(0, len(bits), 8):
        v = 0
        for b in bits[i : i + 8]:
            v = (v << 1) | b
        by.append(v)
        if v == 0xFF:
            by.append(0x00)
    return bytes(out) + bytes(by) + b"\xff\xd9"


def test_jpeg_progressive_420_interleaved_dc():
    """Hand-built 4:2:0 SOF2 with one interleaved DC scan: quadrant
    lumas land pixel-exactly at 128 + 2*dc, same as the baseline 4:2:0
    fixture — proves the progressive interleaved-MCU addressing handles
    h=v=2 against 1x1 components."""
    from custom_python_vectordb_spark.operators.multimodal import decode_jpeg

    mcu0, mcu1 = [4, 8, 12, 14], [2, 6, 10, 12]
    buf = _dc_only_420_progressive([mcu0, mcu1], cb_dc=0, cr_dc=0, w=32, h=16)
    w, h, c, px = decode_jpeg(buf)
    assert (w, h, c) == (32, 16, 3)
    for mx, ydcs in enumerate((mcu0, mcu1)):
        for bi, d in enumerate(ydcs):
            by, bx = divmod(bi, 2)
            block = px[by * 8 : by * 8 + 8, mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8]
            assert (block == 128 + 2 * d).all(), (mx, bi)


def test_video_frame_hashes_container_invariant(spark):
    """The SAME JPEG frame payloads boxed as AVI and as MP4 must produce
    bit-equal per-frame dHashes (the re-mux dedup contract), and a video
    with DIFFERENT content must not collide."""
    from custom_python_vectordb_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mp4_mjpeg,
        video_frame_hashes,
    )

    rng = np.random.RandomState(9)
    frames = [encode_jpeg(rng.randint(0, 256, (16, 24, 3)).astype(np.uint8), 80)
              for _ in range(3)]
    other = [encode_jpeg(rng.randint(0, 256, (16, 24, 3)).astype(np.uint8), 80)
             for _ in range(3)]
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_avi_mjpeg(frames, 24, 16, fps=12))),
            (2, bytearray(encode_mp4_mjpeg(frames, 24, 16, fps=12))),
            (3, bytearray(encode_avi_mjpeg(other, 24, 16, fps=12))),
        ],
        "doc_id long, media binary",
    )
    rows = {(r["doc_id"], r["frame_idx"]): tuple(r[f"dh{i}"] for i in range(4))
            for r in video_frame_hashes(media, 2).collect()}
    assert set(rows) == {(1, 0), (1, 2), (2, 0), (2, 2), (3, 0), (3, 2)}
    assert rows[(1, 0)] == rows[(2, 0)] and rows[(1, 2)] == rows[(2, 2)]
    assert rows[(3, 0)] != rows[(1, 0)]


def test_video_hash_index_incremental_converges(spark, tmp_path):
    """Streaming video frame-hash index twin: re-muxed AVI/MP4 twins
    split ACROSS batches pair up when the second container arrives,
    within-batch twins by the same probe, non-twins never pair, and a
    batch replay leaves the pair set unchanged."""
    from custom_python_vectordb_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mp4_mjpeg,
    )
    from custom_python_vectordb_spark.streaming.media_maintenance import (
        load_video_pairs,
        process_video_batch,
    )

    rng = np.random.RandomState(11)

    def clip(seed):
        r = np.random.RandomState(seed)
        return [encode_jpeg(r.randint(0, 256, (16, 24, 3)).astype(np.uint8), 80)
                for _ in range(3)]

    c1, c2, c3 = clip(1), clip(2), clip(3)
    # batch 0: AVI of c1, AVI+MP4 of c2 (within-batch twin), AVI of c3
    b0 = [
        (10, bytearray(encode_avi_mjpeg(c1, 24, 16, fps=12))),
        (20, bytearray(encode_avi_mjpeg(c2, 24, 16, fps=12))),
        (21, bytearray(encode_mp4_mjpeg(c2, 24, 16, fps=12))),
        (30, bytearray(encode_avi_mjpeg(c3, 24, 16, fps=12))),
    ]
    # batch 1: the MP4 twin of c1 arrives later (cross-batch pair)
    b1 = [(11, bytearray(encode_mp4_mjpeg(c1, 24, 16, fps=12)))]
    root = str(tmp_path / "vidx")
    for bi, rows in enumerate((b0, b1)):
        df = spark.createDataFrame(rows, "doc_id long, media binary")
        process_video_batch(df, bi, root)
    pairs = {(r["a"], r["b"]) for r in load_video_pairs(spark, root).collect()}
    assert pairs == {(20, 21), (10, 11)}
    # replay batch 1 (crash recovery): same pair set, no duplicates
    process_video_batch(
        spark.createDataFrame(b1, "doc_id long, media binary"), 1, root
    )
    pairs2 = [(r["a"], r["b"]) for r in load_video_pairs(spark, root).collect()]
    assert sorted(pairs2) == sorted(pairs)

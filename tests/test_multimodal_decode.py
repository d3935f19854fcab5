"""Real WAV/PPM decode kernels: byte-level parse correctness + the
mapInPandas describe_media pass over mixed/garbage/null payloads."""

import numpy as np
import pytest

from flink_cdc_dsql_master_spark.operators.multimodal import (
    audio_features,
    decode_media,
    decode_ppm,
    decode_wav,
    describe_media,
    image_features,
    synth_ppm_bytes,
    synth_wav_bytes,
)


def test_wav_decode_roundtrip():
    payload = synth_wav_bytes(440.0, 250, sample_rate=8000, amplitude=0.5)
    samples, sr = decode_wav(payload)
    assert sr == 8000
    assert len(samples) == 2000  # 250 ms at 8 kHz
    # sine RMS = amplitude / sqrt(2)
    assert abs(float(np.sqrt(np.mean(samples ** 2))) - 0.5 / 2 ** 0.5) < 0.01


def test_wav_stereo_downmix():
    payload = synth_wav_bytes(220.0, 100, channels=2)
    samples, sr = decode_wav(payload)
    assert len(samples) == 800  # frames, not interleaved samples


def test_audio_features_band_energy():
    samples, sr = decode_wav(synth_wav_bytes(440.0, 500))
    f = audio_features(samples, sr, n_bands=4)
    assert abs(f[0] - 0.5) < 1e-9  # duration seconds
    # 440 Hz lives in band 0 of 4 (0–1 kHz of the 0–4 kHz Nyquist range)
    assert f[3] > 0.95 and sum(f[4:7]) < 0.05


def test_ppm_decode_gradient_and_comments():
    payload = synth_ppm_bytes(16, 8)
    arr = decode_ppm(payload)
    assert arr.shape == (8, 16, 3)
    assert arr[0, 0, 0] == 0 and arr[0, 15, 0] == 255  # red = x gradient
    assert arr[7, 0, 1] == 255  # green = y gradient
    # header comments are legal PPM
    commented = payload.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(decode_ppm(commented), arr)


def test_image_features_shape():
    f = image_features(decode_ppm(synth_ppm_bytes(12, 9)), grid=3)
    assert len(f) == 3 + 3 + 9  # means + stds + 3x3 pooled luminance
    assert abs(f[0] - 0.5) < 0.05  # symmetric gradient mean ≈ 0.5


def test_decode_media_router():
    mime, w, h, dur, feat = decode_media(synth_wav_bytes(300, 120), dim=16)
    assert (mime, dur) == ("audio/wav", 120) and w is None
    assert len(feat) == 16
    mime, w, h, dur, feat = decode_media(synth_ppm_bytes(10, 7), dim=16)
    assert (mime, w, h, dur) == ("image/ppm", 10, 7, None)
    mime, *_rest, feat = decode_media(b"\x00\x01unknown-bytes", dim=16)
    assert mime == "application/octet-stream" and len(feat) == 16
    assert decode_media(None) is None


def test_describe_media_spark(spark):
    rows = [
        (1, synth_wav_bytes(440, 200)),
        (2, synth_ppm_bytes(9, 5)),
        (3, None),
        (4, b"RIFF\x00\x00\x00\x00WAVEgarbage-truncated"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in describe_media(df, dim=8).collect()}
    assert got[1]["mime"] == "audio/wav" and got[1]["duration_ms"] == 200
    assert got[2]["mime"] == "image/ppm" and (
        got[2]["width"], got[2]["height"]) == (9, 5)
    assert got[3]["decode_ok"] is False
    assert got[4]["decode_ok"] is False  # malformed RIFF → caught, not fatal
    assert len(got[1]["feature"]) == 8


def test_unsupported_formats_still_raise():
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM is out of scope


def test_bmp_roundtrip_and_router(spark):
    """Synthesized 24-bit BMP decodes to the exact gradient (round-trip
    vs the synthesis formula), and the router reports image/bmp with the
    true dimensions through the Arrow pipeline."""
    import numpy as np
    from flink_cdc_dsql_master_spark.operators.multimodal import (
        decode_bmp, describe_media, synth_bmp_bytes)

    w, h = 5, 3
    payload = synth_bmp_bytes(w, h)
    arr = decode_bmp(payload)
    assert arr.shape == (h, w, 3)
    # spot-check the synthesis formula at a non-corner pixel (RGB order)
    x, y = 3, 1
    assert tuple(arr[y, x]) == ((x * 7 + y * 3) % 256,
                                (x * 5 + y * 11) % 256,
                                (x * 13 + y * 17) % 256)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary")
    row = describe_media(df).collect()[0]
    assert (row["mime"], row["width"], row["height"],
            row["decode_ok"]) == ("image/bmp", w, h, True)
    assert row["feature"] is not None and len(row["feature"]) == 32


def test_png_roundtrip_all_filters(spark):
    """Synthesized PNG (row filters cycling through all five types)
    decodes to the exact gradient pixels, matching the BMP twin; the
    router reports image/png with true dimensions via Arrow."""
    from flink_cdc_dsql_master_spark.operators.multimodal import (
        decode_bmp, decode_png, describe_media, synth_bmp_bytes,
        synth_png_bytes)

    w, h = 9, 7  # >= 5 rows so every filter type 0..4 is exercised
    payload = synth_png_bytes(w, h)
    arr = decode_png(payload)
    assert arr.shape == (h, w, 3)
    assert (arr == decode_bmp(synth_bmp_bytes(w, h))).all()
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary")
    row = describe_media(df).collect()[0]
    assert (row["mime"], row["width"], row["height"],
            row["decode_ok"]) == ("image/png", w, h, True)


def test_png_gray_and_rgba_paths():
    import struct
    import zlib

    from flink_cdc_dsql_master_spark.operators.multimodal import decode_png

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    sig = b"\x89PNG\r\n\x1a\n"
    # 2x2 grayscale, filter 0
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 10, 20, 0, 30, 40])
    a = decode_png(sig + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(raw))
                   + chunk(b"IEND", b""))
    assert a.shape == (2, 2, 3) and a[0, 0, 0] == 10 and a[1, 1, 2] == 40
    # 2x1 RGBA with Sub filter: second pixel adds the first
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)
    raw = bytes([1, 5, 6, 7, 8, 10, 10, 10, 10])
    a = decode_png(sig + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(raw))
                   + chunk(b"IEND", b""))
    assert a.shape == (1, 2, 3) and list(a[0, 1]) == [15, 16, 17]


def test_png_crc_and_format_errors():
    from flink_cdc_dsql_master_spark.operators.multimodal import (
        decode_png, synth_png_bytes)

    good = bytearray(synth_png_bytes(3, 3))
    good[20] ^= 0xFF  # corrupt a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")


def test_png_checksum_feature_matches_gradient():
    """png_checksum_feature's integer checksums equal the synthesis
    gradient sums (what the SQL oracle recomputes)."""
    from flink_cdc_dsql_master_spark.operators.multimodal import (
        png_checksum_feature, synth_png_bytes)

    w, h = 6, 4
    feat = png_checksum_feature(synth_png_bytes(w, h), dim=8)
    rs = sum((x * 7 + y * 3) % 256 for x in range(w) for y in range(h))
    gs = sum((x * 5 + y * 11) % 256 for x in range(w) for y in range(h))
    bs = sum((x * 13 + y * 17) % 256 for x in range(w) for y in range(h))
    assert feat[:6] == [float(w), float(h), float((rs + gs + bs) % 997),
                        float(rs % 997), float(gs % 997), float(bs % 997)]
    assert feat[6:] == [0.0, 0.0]


def test_video_frame_sampling_boundaries(spark):
    from flink_cdc_dsql_master_spark.operators.multimodal import (
        decode_video_frames, synth_video_bytes,
    )

    rows = [(1, synth_video_bytes(4, 3, 5)),   # frames 0,2,4 sampled
            (2, synth_video_bytes(4, 3, 1)),   # single frame
            (3, None)]                         # null payload skipped
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {(r["media_id"], r["frame_idx"]): (r["n_frames"], r["width"],
                                             r["height"])
           for r in decode_video_frames(df, every_k=2).collect()}
    assert set(got) == {(1, 0), (1, 2), (1, 4), (2, 0)}
    assert got[(1, 4)] == (5, 4, 3)
    assert got[(2, 0)] == (1, 4, 3)


def test_resize_nearest_index_map(spark):
    import numpy as np

    from flink_cdc_dsql_master_spark.operators.multimodal import (
        resize_nearest,
    )

    # 4x2 -> 2x1: output (0,0) samples src (0,0); (0,1) samples (0,2)
    arr = np.arange(4 * 2 * 3, dtype="u1").reshape(2, 4, 3)
    small = resize_nearest(arr, 2, 1)
    assert small.shape == (1, 2, 3)
    assert (small[0, 0] == arr[0, 0]).all()
    assert (small[0, 1] == arr[0, 2]).all()
    # upscale repeats pixels, never interpolates
    big = resize_nearest(arr, 8, 2)
    assert (big[0, 0] == big[0, 1]).all()


def test_jpeg_dc_exact_roundtrip():
    """Block-constant gradient under an all-ones quant table round-trips
    bit-exactly (DC-only blocks are lossless) — including non-multiple-
    of-8 dimensions (partial edge MCUs)."""
    import numpy as np

    from flink_cdc_dsql_master_spark.operators.multimodal import (
        decode_jpeg, synth_jpeg_bytes)

    for (w, h) in [(8, 8), (13, 11), (40, 24), (1, 1)]:
        arr = decode_jpeg(synth_jpeg_bytes(w, h))
        assert arr.shape == (h, w, 3)
        exp = np.array([[((x // 8) * 29 + (y // 8) * 37) % 256
                         for x in range(w)] for y in range(h)])
        assert (arr[:, :, 0].astype(np.int64) == exp).all()
        assert (arr[:, :, 1] == arr[:, :, 0]).all()  # gray → replicated


def test_jpeg_ac_coefficients_through_idct():
    """The AC huffman path, zigzag placement, dequant and IDCT are
    exercised with a hand-assembled single-block scan carrying known AC
    coefficients; the decode must equal the reference IDCT computed
    independently here."""
    import math
    import struct

    import numpy as np

    from flink_cdc_dsql_master_spark.operators import multimodal as mm

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFDB, b"\x00" + bytes([1] * 64))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1)
               + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, b"\x00" + bytes(mm._DC_LUM_BITS)
               + bytes(mm._DC_LUM_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(mm._AC_LUM_BITS)
               + bytes(mm._AC_LUM_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))

    dc_codes = mm._huff_codes(mm._DC_LUM_BITS, mm._DC_LUM_VALS)
    ac_codes = mm._huff_codes(mm._AC_LUM_BITS, mm._AC_LUM_VALS)
    bw = mm._BitWriter()

    def put_mag(v, s):
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)

    def cat(v):
        s, m = 0, abs(v)
        while m:
            s += 1
            m >>= 1
        return s

    # DC = 80; AC at zigzag pos 1 = -30, pos 3 = 17 (one-run), rest EOB
    coef = np.zeros(64)
    coef[0], dc = 80.0, 80
    s = cat(dc)
    ln, code = dc_codes[s]
    bw.put(code, ln)
    put_mag(dc, s)
    for (zz_pos, run, val) in [(1, 0, -30), (3, 1, 17)]:
        coef[mm._ZZ[zz_pos]] = val
        s = cat(val)
        ln, code = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        put_mag(val, s)
    ln, code = ac_codes[0x00]
    bw.put(code, ln)
    out += bw.flush() + b"\xFF\xD9"

    got = mm.decode_jpeg(bytes(out))[:, :, 0].astype(np.float64)
    A = np.zeros((8, 8))
    for u in range(8):
        c = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * c * math.cos(math.pi * (2 * x + 1) * u / 16)
    ref = np.clip(np.rint(A.T @ coef.reshape(8, 8) @ A + 128.0),
                  0, 255)
    assert (got == ref).all()


def test_jpeg_color_ycbcr_conversion():
    """3-component 4:4:4 scan with constant planes: the decoded RGB must
    equal the JFIF conversion formula applied to (Y, Cb, Cr)."""
    import struct

    import numpy as np

    from flink_cdc_dsql_master_spark.operators import multimodal as mm

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    y_v, cb_v, cr_v = 120, 90, 180
    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFDB, b"\x00" + bytes([1] * 64))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xFFC4, b"\x00" + bytes(mm._DC_LUM_BITS)
               + bytes(mm._DC_LUM_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(mm._AC_LUM_BITS)
               + bytes(mm._AC_LUM_VALS))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    dc_codes = mm._huff_codes(mm._DC_LUM_BITS, mm._DC_LUM_VALS)
    ac_codes = mm._huff_codes(mm._AC_LUM_BITS, mm._AC_LUM_VALS)
    bw = mm._BitWriter()
    for v in (y_v, cb_v, cr_v):
        dc = 8 * (v - 128)
        s, m = 0, abs(dc)
        while m:
            s += 1
            m >>= 1
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(dc if dc >= 0 else dc + (1 << s) - 1, s)
        ln, code = ac_codes[0x00]
        bw.put(code, ln)
    out += bw.flush() + b"\xFF\xD9"

    got = mm.decode_jpeg(bytes(out))
    cb, cr = cb_v - 128.0, cr_v - 128.0
    exp = [np.clip(np.rint(y_v + 1.402 * cr), 0, 255),
           np.clip(np.rint(y_v - 0.344136 * cb - 0.714136 * cr), 0, 255),
           np.clip(np.rint(y_v + 1.772 * cb), 0, 255)]
    for ch in range(3):
        assert (got[:, :, ch] == exp[ch]).all()


def test_jpeg_rejects_progressive_and_junk():
    import struct

    import pytest

    from flink_cdc_dsql_master_spark.operators import multimodal as mm

    with pytest.raises(ValueError):
        mm.decode_jpeg(b"nope")
    prog = (b"\xFF\xD8"
            + struct.pack(">HH", 0xFFC2, 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="baseline"):
        mm.decode_jpeg(prog)


def test_jpeg_router_and_checksum_feature():
    from flink_cdc_dsql_master_spark.operators.multimodal import (
        decode_media, jpeg_checksum_feature, synth_jpeg_bytes)

    b = synth_jpeg_bytes(13, 11)
    mime, w, h, dur, feat = decode_media(b, dim=8)
    assert (mime, w, h, dur) == ("image/jpeg", 13, 11, None)
    cs = jpeg_checksum_feature(b, dim=8)
    assert cs[0] == 13.0 and cs[1] == 11.0
    # checksums recomputable from the synthesis formula
    tot = sum(((x // 8) * 29 + (y // 8) * 37) % 256
              for x in range(13) for y in range(11))
    assert cs[3] == float(tot % 997)

"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Decode kernels, by format:
- **WAV (PCM)** — REAL decode via the stdlib ``wave`` module + numpy
  (8/16/32-bit PCM, multi-channel downmix); features are genuine audio
  features (duration, RMS, zero-crossing rate, FFT band energies).
- **PPM (P6)** — REAL decode via a pure-numpy binary parser; features are
  per-channel stats + a mean-pooled luminance grid.
- **PNG** — REAL decode via stdlib zlib (chunk parse, inflate, all five
  scanline filters, CRC verification).
- **JPEG** — REAL baseline decode (T.81 sequential: marker parse, huffman
  entropy decode, dequantize, numpy matrix IDCT, chroma upsample,
  YCbCr→RGB); progressive/arithmetic variants are rejected explicitly.
- **MP4/video** — no container parser here; frame sampling runs on
  duration metadata and routes per-frame payloads through the image
  kernels; unknown containers fall to the deterministic payload-hash fake
  (clearly marked by mime 'application/octet-stream').

100 TB notes: binary payloads stay columnar (parquet BYTE_ARRAY) and are
only materialized inside the Arrow batch of the executor that processes
them; metadata-only operations (filtering by mime/size/dims) never read the
bytes thanks to parquet column pruning. `mapInPandas` streams batches, so a
partition never holds more than `maxRecordsPerBatch` payloads in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T
from ..pinning import pin

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive cheap metadata without decoding: byte size + magic-byte mime
    sniff (JPEG/PNG/WAV/MP4) — pure Catalyst over the first bytes."""
    p = F.col(payload_col)
    head = F.hex(F.substring(p, 1, 4))
    mime = (
        F.when(head.startswith("FFD8"), "image/jpeg")
        .when(head.startswith("89504E47"), "image/png")
        .when(head.startswith("52494646"), "audio/wav")
        .when(head.startswith("424D"), "image/bmp")
        .when(head.startswith("5036"), "image/ppm")
        .when(head.startswith("00000018") | head.startswith("00000020"),
              "video/mp4")
        .otherwise("application/octet-stream")
    )
    return (
        df.withColumn("byte_size", F.length(p))
        .withColumn("mime_sniffed", mime)
    )


def _fake_decode_feature(payload: bytes | None, dim: int) -> list[float] | None:
    """Deterministic stand-in for a real decode→embed kernel.

    REAL DECODE NOT AVAILABLE IN THIS CONTAINER — this derives a stable
    pseudo-feature from the payload hash so downstream similarity/dedup
    plumbing is exercisable end-to-end. Replace with e.g. PIL + a vision
    encoder; the mapInPandas contract (bytes in, array<float> out) is
    unchanged.
    """
    if payload is None:
        return None
    import hashlib

    import numpy as np

    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype("float32")
    return (v / np.linalg.norm(v)).tolist()


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id", dim: int = 32,
                     decode_fn=None) -> DataFrame:
    """payload binary → feature array<float> via Arrow-batched mapInPandas.

    `decode_fn(payload_bytes) -> list[float] | None` plugs in a real codec;
    default is the deterministic fake above.
    """
    fn = decode_fn or (lambda b: _fake_decode_feature(b, dim))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = pdf[payload_col].map(
                lambda b: fn(bytes(b)) if b is not None else None)
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "feature": feats,
                "decode_ok": feats.notna(),
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id", every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explodes (media_id, frame_idx, ts_ms)
    rows from duration metadata WITHOUT decoding; the per-frame decode is a
    second extract_features pass (every image format the router knows —
    PPM/BMP/PNG/JPEG — decodes for real; see decode_jpeg).
    """
    if "duration_ms" not in df.columns:
        raise ValueError("sample_frames needs a duration_ms metadata column")
    n_frames = F.greatest(
        (F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)


# ---------------------------------------------------------------------------
# baseline JPEG (ITU-T T.81): stdlib+numpy encoder/decoder — no codec lib
# ---------------------------------------------------------------------------

# zigzag scan order: _ZZ[k] = natural (row*8+col) index of the k-th
# zigzag-ordered coefficient
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# standard huffman tables, T.81 Annex K.3 (luminance): (bits[1..16],
# values). Public constants every baseline codec ships.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits, vals):
    """(length, code) per symbol from a DHT (bits, values) spec — the
    canonical code assignment of T.81 Annex C."""
    out, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (ln, code)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:           # byte stuffing
                self.buf.append(0x00)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)


def synth_jpeg_bytes(width: int, height: int) -> bytes:
    """Synthesize a baseline grayscale JFIF whose decode is EXACT: every
    8x8 block is constant (value (bx*29 + by*37) % 256), so only the DC
    coefficient is nonzero, and with an all-ones quantization table the
    quantize→dequantize→IDCT round trip reproduces the block value
    bit-exactly despite JPEG being lossy in general. An oracle can
    therefore recompute pixel checksums from the synthesis parameters —
    the same proof shape as synth_png_bytes. Standard Annex K luminance
    huffman tables; DC diffs span many bit-categories, so the decoder's
    huffman + receive/extend path does real work."""
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00"
               + struct.pack(">HHBB", 1, 1, 0, 0))     # APP0
    out += seg(0xFFDB, b"\x00" + bytes([1] * 64))      # DQT id0, all 1s
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1)
               + bytes([1, 0x11, 0]))                  # SOF0, 1 comp 1x1
    out += seg(0xFFC4, b"\x00" + bytes(_DC_LUM_BITS)
               + bytes(_DC_LUM_VALS))                  # DHT DC0
    out += seg(0xFFC4, b"\x10" + bytes(_AC_LUM_BITS)
               + bytes(_AC_LUM_VALS))                  # DHT AC0
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS

    dc_codes = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = _BitWriter()
    pred = 0
    bx_n = (width + 7) // 8
    by_n = (height + 7) // 8
    for by in range(by_n):
        for bx in range(bx_n):
            val = (bx * 29 + by * 37) % 256
            dc = 8 * (val - 128)       # F(0,0) of a constant block, q=1
            diff = dc - pred
            pred = dc
            mag, s = abs(diff), 0
            while mag:
                s += 1
                mag >>= 1
            ln, code = dc_codes[s]
            bw.put(code, ln)
            if s:
                v = diff if diff >= 0 else diff + (1 << s) - 1
                bw.put(v, s)
            ln, code = ac_codes[0x00]  # EOB: all ACs zero
            bw.put(code, ln)
    out += bw.flush()
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RSTn
    detection (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if not self.n:
            if self.pos >= len(self.d):
                raise ValueError("jpeg: truncated entropy segment")
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else None
                if nxt == 0x00:
                    self.pos += 1          # stuffed byte
                else:
                    raise _MarkerHit(b, nxt)
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0

    def skip_rst(self) -> None:
        # reader sits just before FF Dn: consume the marker
        assert self.d[self.pos] == 0xFF
        self.pos += 2
        self.align()


class _MarkerHit(Exception):
    def __init__(self, b, nxt):
        super().__init__(f"marker 0x{b:02X}{(nxt or 0):02X}")
        self.nxt = nxt


def _huff_decode(br: "_BitReader", table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes):
    """REAL baseline JPEG decode (T.81 sequential DCT, huffman coding):
    marker parse → DQT/DHT/SOF0/SOS → per-MCU huffman decode →
    dequantize → 2-D IDCT (matrix form, numpy) → level shift →
    chroma upsample → JFIF YCbCr→RGB. Supports 1- and 3-component
    scans, arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart
    intervals. Progressive (SOF2) and arithmetic coding are rejected
    explicitly. Returns uint8 (height, width, 3) RGB."""
    import math
    import struct

    import numpy as np

    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    quant: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: bad marker byte at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2:pos + seglen]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant unsupported")
                quant[tq] = np.frombuffer(
                    body[p + 1:p + 65], dtype=np.uint8).astype(np.int32)
                p += 65
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1:p + 17])
                nv = sum(bits)
                vals = list(body[p + 17:p + 17 + nv])
                huff[(tc, th)] = {
                    (ln, code): sym
                    for sym, (ln, code) in _huff_codes(bits, vals).items()}
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential supported")
        elif marker == 0xDD:                    # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                    # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                c = next(c for c in comps if c["id"] == cid)
                scan.append({**c, "dc": tt >> 4, "ac": tt & 15})
            # The decoder returns after this (first) scan assuming an
            # interleaved single-scan file. A legal multi-scan baseline
            # file (ns < SOF component count) would silently decode only
            # the first component; a 1-component scan with sampling
            # factors >1 would use the wrong (interleaved) block order.
            # Reject both explicitly, matching the progressive/arithmetic
            # rejection style above.
            if ns < len(comps):
                raise ValueError(
                    "jpeg: multi-scan (non-interleaved) baseline "
                    "unsupported — scan covers "
                    f"{ns} of {len(comps)} components")
            if ns == 1 and (scan[0]["h"] > 1 or scan[0]["v"] > 1):
                raise ValueError(
                    "jpeg: single-component scan with sampling factors "
                    ">1 unsupported")
            pos += seglen
            return _decode_scan(payload, pos, scan, quant, huff, w, h,
                                restart, math, np)
        pos += seglen
    raise ValueError("jpeg: no scan found")


def _decode_scan(payload, pos, scan, quant, huff, w, h, restart,
                 math, np):
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # IDCT basis: spatial = A.T @ F @ A
    A = np.zeros((8, 8))
    for u in range(8):
        c = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * c * math.cos(math.pi * (2 * x + 1) * u / 16)
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                       dtype=np.float64) for c in scan]
    preds = [0] * len(scan)
    br = _BitReader(payload, pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.align()
                # expect RSTn
                while br.d[br.pos] == 0xFF and \
                        0xD0 <= br.d[br.pos + 1] <= 0xD7:
                    br.skip_rst()
                    break
                preds = [0] * len(scan)
            n_mcu += 1
            for ci, comp in enumerate(scan):
                q = quant[comp["tq"]]
                dct = huff[(0, comp["dc"])]
                act = huff[(1, comp["ac"])]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        s = _huff_decode(br, dct)
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        coef[0] = preds[ci] * int(q[0])
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break          # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            coef[_ZZ[k]] = _extend(br.bits(sz), sz) \
                                * int(q[k])
                            k += 1
                        block = A.T @ coef.reshape(8, 8) @ A + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
    # upsample each plane to full resolution and crop
    full = []
    for ci, comp in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def jpeg_checksum_feature(payload: bytes | None,
                          dim: int = 8) -> list[float] | None:
    """Integer-exact JPEG decode evidence (same shape as
    png_checksum_feature): [width, height, (r+g+b sums)%997, r%997,
    g%997, b%997, pad]. Exactness holds because synth_jpeg_bytes emits
    block-constant images under an all-ones quant table (DC-only blocks
    round-trip losslessly), so a SQL oracle recomputes the sums from the
    block-value formula."""
    if payload is None:
        return None
    arr = decode_jpeg(payload)
    h, w = arr.shape[:2]
    s = arr.astype("int64")
    rs = int(s[:, :, 0].sum())
    gs = int(s[:, :, 1].sum())
    bs = int(s[:, :, 2].sum())
    return _fit([float(w), float(h), float((rs + gs + bs) % 997),
                 float(rs % 997), float(gs % 997), float(bs % 997)], dim)


# ---------------------------------------------------------------------------
# REAL decode kernels: WAV (stdlib wave + numpy) and PPM (pure numpy)
# ---------------------------------------------------------------------------

def synth_wav_bytes(freq_hz: float, duration_ms: int,
                    sample_rate: int = 8000, amplitude: float = 0.5,
                    channels: int = 1) -> bytes:
    """Synthesize a PCM-16 sine-wave WAV (test/fixture generator)."""
    import io
    import wave

    import numpy as np

    n = int(sample_rate * duration_ms / 1000)
    t = np.arange(n) / sample_rate
    pcm = (np.sin(2 * np.pi * freq_hz * t) * amplitude * 32767).astype("<i2")
    if channels > 1:
        pcm = np.repeat(pcm[:, None], channels, axis=1).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_ppm_bytes(width: int, height: int) -> bytes:
    """Synthesize a P6 PPM with a deterministic RGB gradient."""
    import numpy as np

    x = np.linspace(0, 255, width)
    y = np.linspace(0, 255, height)
    r = np.tile(x, (height, 1))
    g = np.tile(y[:, None], (1, width))
    b = (r + g) / 2
    arr = np.stack([r, g, b], axis=-1).astype("u1")
    return f"P6\n{width} {height}\n255\n".encode() + arr.tobytes()


def decode_wav(payload: bytes):
    """REAL WAV decode: (mono float64 samples in [-1, 1], sample_rate).
    Handles 8/16/32-bit PCM and downmixes multi-channel by mean."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtype = {1: "u1", 2: "<i2", 4: "<i4"}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {sw}")
    x = np.frombuffer(raw, dtype=dtype).astype("float64")
    if sw == 1:
        x = (x - 128.0) / 128.0
    elif sw == 2:
        x = x / 32768.0
    else:
        x = x / 2147483648.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def decode_ppm(payload: bytes):
    """REAL P6 PPM decode → uint8 array of shape (height, width, 3).
    Pure numpy; handles whitespace and '#' comments in the header."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval (comments skipped)
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height * 3
    arr = np.frombuffer(payload, dtype="u1", count=n, offset=pos)
    return arr.reshape(height, width, 3)


def synth_bmp_bytes(width: int, height: int) -> bytes:
    """Synthesize a 24-bit uncompressed BMP with a deterministic RGB
    gradient (bottom-up rows, 4-byte padded — the classic layout)."""
    import struct

    row_bytes = (width * 3 + 3) & ~3
    pixel_bytes = row_bytes * height
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + pixel_bytes, 0, 0,
                         offset)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       pixel_bytes, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up on disk
        row = bytearray()
        for x in range(width):
            r = (x * 7 + y * 3) % 256
            g = (x * 5 + y * 11) % 256
            b = (x * 13 + y * 17) % 256
            row += bytes((b, g, r))  # BGR order
        row += b"\x00" * (row_bytes - len(row))
        rows += row
    return header + info + bytes(rows)


def decode_bmp(payload: bytes):
    """REAL BMP decode (24-bit uncompressed BI_RGB) → uint8 array of
    shape (height, width, 3) in RGB order. Pure struct + numpy — no
    codec libraries; bottom-up and top-down row orders both handled.
    """
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, width, height, _planes, bitcount,
     compression) = struct.unpack_from("<IiiHHI", payload, 14)
    if bitcount != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bitcount}-bit "
                         f"compression={compression}")
    bottom_up = height > 0
    h = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    buf = np.frombuffer(payload, dtype=np.uint8,
                        count=row_bytes * h, offset=offset)
    rows = buf.reshape(h, row_bytes)[:, :width * 3].reshape(h, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def synth_png_bytes(width: int, height: int) -> bytes:
    """Synthesize an 8-bit RGB PNG with the same deterministic gradient
    as :func:`synth_bmp_bytes` (r=(x*7+y*3)%256, g=(x*5+y*11)%256,
    b=(x*13+y*17)%256). Row filters cycle 0..4 by scanline so a decoder
    must implement None/Sub/Up/Average/Paeth to reproduce the pixels —
    pure stdlib struct+zlib, no codec library."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = bytearray(width * 3)
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(((x * 7 + y * 3) % 256, (x * 5 + y * 11) % 256,
                          (x * 13 + y * 17) % 256))
        ftype = y % 5
        filt = bytearray()
        for i, v in enumerate(row):
            a = row[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 0:
                filt.append(v)
            elif ftype == 1:
                filt.append((v - a) & 0xFF)
            elif ftype == 2:
                filt.append((v - b) & 0xFF)
            elif ftype == 3:
                filt.append((v - (a + b) // 2) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                filt.append((v - pred) & 0xFF)
        raw += bytes([ftype]) + filt
        prev = row
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes):
    """REAL PNG decode (stdlib zlib — no codec library) → uint8 array of
    shape (height, width, 3) in RGB order.

    Parses the chunk stream, inflates the concatenated IDAT zlib stream,
    and unfilters scanlines (all five filter types: None/Sub/Up/Average/
    Paeth). Supports bit depth 8, color types 0 (gray, expanded), 2
    (RGB) and 6 (RGBA, alpha dropped), interlace 0. CRCs are verified.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        length, tag = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + length]
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(tag + data) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG: depth={depth} "
                         f"interlace={interlace}")
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — vectorizable, no intra-row dependency
            line = bytearray(
                ((np.frombuffer(bytes(line), dtype=np.uint8)
                  .astype(np.int32) + prev) & 0xFF).astype(np.uint8)
                .tobytes())
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth: sequential in x
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                if ftype == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    line[i] = (line[i] + (a + b) // 2) & 0xFF
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = out[y]
    px = out.reshape(height, width, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy()


def png_checksum_feature(payload: bytes | None,
                         dim: int = 8) -> list[float] | None:
    """Integer-exact PNG decode evidence as a feature vector:
    [width, height, (r+g+b sums)%997, r%997, g%997, b%997, 0 pad].
    Every component is a small integer (exact in float32), so a SQL
    oracle can recompute it from the synthesis parameters — proving the
    zlib inflate + unfilter path reproduced every pixel, not just the
    header."""
    if payload is None:
        return None
    arr = decode_png(payload)
    h, w = arr.shape[:2]
    s = arr.astype("int64")
    rs = int(s[:, :, 0].sum())
    gs = int(s[:, :, 1].sum())
    bs = int(s[:, :, 2].sum())
    return _fit([float(w), float(h), float((rs + gs + bs) % 997),
                 float(rs % 997), float(gs % 997), float(bs % 997)], dim)


def audio_features(samples, sample_rate: int, n_bands: int = 4) -> list[float]:
    """Real audio features: [duration_s, rms, zero_crossing_rate,
    band_energy_0..n-1] — energies are FFT power shares in equal bands."""
    import numpy as np

    n = len(samples)
    if n == 0:
        return [0.0] * (3 + n_bands)
    duration = n / sample_rate
    rms = float(np.sqrt(np.mean(samples ** 2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples)))))
    spec = np.abs(np.fft.rfft(samples)) ** 2
    total = spec.sum() or 1.0
    bands = [float(chunk.sum() / total)
             for chunk in np.array_split(spec, n_bands)]
    return [float(duration), rms, zcr] + bands


def image_features(arr, grid: int = 3) -> list[float]:
    """Real image features: per-channel mean/std (scaled to [0,1]) + a
    grid×grid mean-pooled luminance thumbnail."""
    import numpy as np

    a = arr.astype("float64") / 255.0
    means = a.reshape(-1, 3).mean(axis=0).tolist()
    stds = a.reshape(-1, 3).std(axis=0).tolist()
    lum = a.mean(axis=2)
    h, w = lum.shape
    pooled = [float(cell.mean())
              for row in np.array_split(lum, grid, axis=0)
              for cell in np.array_split(row, grid, axis=1)]
    _ = (h, w)
    return means + stds + pooled


def decode_media(payload: bytes | None, dim: int = 32):
    """Magic-byte router → real decode where a kernel exists.

    Returns (mime, width, height, duration_ms, feature) — feature padded or
    truncated to `dim`. WAV/PPM decode for real; other formats fall back to
    the deterministic hash fake (marked by mime 'application/octet-stream'
    unless sniffed otherwise).
    """
    if payload is None:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, sr = decode_wav(payload)
        feat = audio_features(samples, sr)
        duration_ms = int(round(len(samples) / sr * 1000))
        return ("audio/wav", None, None, duration_ms, _fit(feat, dim))
    if payload[:2] == b"P6":
        arr = decode_ppm(payload)
        feat = image_features(arr)
        return ("image/ppm", int(arr.shape[1]), int(arr.shape[0]), None,
                _fit(feat, dim))
    if payload[:2] == b"BM":
        arr = decode_bmp(payload)
        feat = image_features(arr)
        return ("image/bmp", int(arr.shape[1]), int(arr.shape[0]), None,
                _fit(feat, dim))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        arr = decode_png(payload)
        feat = image_features(arr)
        return ("image/png", int(arr.shape[1]), int(arr.shape[0]), None,
                _fit(feat, dim))
    if payload[:2] == b"\xFF\xD8":
        arr = decode_jpeg(payload)
        feat = image_features(arr)
        return ("image/jpeg", int(arr.shape[1]), int(arr.shape[0]), None,
                _fit(feat, dim))
    return ("application/octet-stream", None, None, None,
            _fake_decode_feature(payload, dim))


def _fit(feat: list[float], dim: int) -> list[float]:
    if len(feat) >= dim:
        return [float(x) for x in feat[:dim]]
    return [float(x) for x in feat] + [0.0] * (dim - len(feat))


MEDIA_INFO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def describe_media(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id", dim: int = 32) -> DataFrame:
    """Full decode pass: payload → (mime, dims/duration, feature) via the
    real-kernel router, Arrow-batched through mapInPandas."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    info = decode_media(bytes(b) if b is not None else None,
                                        dim)
                except Exception:
                    info = None
                if info is None:
                    rows.append((mid, None, None, None, None, None, False))
                else:
                    mime, w, h, dur, feat = info
                    rows.append((mid, mime, w, h, dur, feat, True))
            yield pd.DataFrame(
                rows, columns=["media_id", "mime", "width", "height",
                               "duration_ms", "feature", "decode_ok"])

    return df.mapInPandas(run, MEDIA_INFO_SCHEMA)


def synth_video_bytes(width: int, height: int, n_frames: int) -> bytes:
    """Synthesize a 'video': N concatenated P6 PPM frames with an
    INTEGER-exact per-frame gradient (r=(i*37+k)%256, g=(j*53+k)%256,
    b=(i*7+j*11+k)%256 for frame k) — integer arithmetic only, so an
    SQL oracle replays every pixel exactly (float linspace endpoints
    would not replay bit-stably)."""
    import numpy as np

    i = np.arange(width)
    j = np.arange(height)[:, None]
    frames = []
    for k in range(n_frames):
        r = np.broadcast_to((i * 37 + k) % 256, (height, width))
        g = np.broadcast_to((j * 53 + k) % 256, (height, width))
        b = (i * 7 + j * 11 + k) % 256
        arr = np.stack([r, g, np.broadcast_to(b, (height, width))],
                       axis=-1).astype("u1")
        frames.append(f"P6\n{width} {height}\n255\n".encode()
                      + arr.tobytes())
    return b"".join(frames)


def decode_video_frames(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "media_id",
                        every_k: int = 2) -> DataFrame:
    """REAL video frame sampling + decode: the payload is split into
    its constituent frames by parsing the FIRST frame's PPM header for
    the frame byte size (no metadata trust), every ``every_k``-th frame
    is sliced out and decoded with the real PPM kernel, and per-frame
    stats are emitted — the frame-sample -> decode -> featurize shape a
    video curation pipeline runs, with the frames that are skipped
    never decoded (the point of sampling: at every_k=30 a 30 fps video
    decodes 1 frame/second of content).

    Arrow-batched mapInPandas; output (id, frame_idx, n_frames, width,
    height, mean_pixel). Scale: payload bytes stay inside the executor
    that holds the row — no shuffle; decode cost is
    O(sampled frames)."""
    import pandas as pd

    out_schema = (f"{id_col} long, frame_idx int, n_frames int, "
                  "width int, height int, mean_pixel double")

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                first = decode_ppm(bytes(payload))
                h, w, _ = first.shape
                header = f"P6\n{w} {h}\n255\n".encode()
                fsize = len(header) + w * h * 3
                n = len(payload) // fsize
                for fi in range(0, n, every_k):
                    arr = decode_ppm(
                        bytes(payload[fi * fsize:(fi + 1) * fsize]))
                    rows.append((int(mid), fi, n, w, h,
                                 float(arr.mean())))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "n_frames",
                               "width", "height", "mean_pixel"])

    return df.mapInPandas(run, out_schema)


def resize_nearest(arr, out_w: int, out_h: int):
    """REAL nearest-neighbor image resize (numpy index map): output
    pixel (i, j) samples source pixel (floor(j*H/out_h),
    floor(i*W/out_w)) — the standard GPU-sampler convention, integer
    arithmetic only so an SQL oracle replays the exact sampled
    coordinates."""
    import numpy as np

    h, w, _ = arr.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys[:, None], xs[None, :], :]


def resize_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id",
                  out_w: int = 4, out_h: int = 3) -> DataFrame:
    """Decode + nearest-neighbor resize per image (Arrow-batched): the
    standardize-thumbnails step of a multimodal curation pipeline.
    Emits (id, src_w, src_h, out_w, out_h, mean_pixel of the RESIZED
    image) — the resized mean is what proves the index map is exact
    (a wrong sampler produces a different pixel subset)."""
    import pandas as pd

    out_schema = (f"{id_col} long, src_w int, src_h int, out_w int, "
                  "out_h int, mean_pixel double")

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                arr = decode_ppm(bytes(payload))
                h, w, _ = arr.shape
                small = resize_nearest(arr, out_w, out_h)
                rows.append((int(mid), w, h, out_w, out_h,
                             float(small.mean())))
            yield pd.DataFrame(
                rows, columns=[id_col, "src_w", "src_h", "out_w",
                               "out_h", "mean_pixel"])

    return df.mapInPandas(run, out_schema)


def audio_dominant_freq(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "media_id", f_lo: int = 200,
                        f_hi: int = 300) -> DataFrame:
    """Per-clip dominant-frequency estimation over a dense Goertzel
    bank — the audio-feature-extraction stage of a multimodal curation
    pipeline (pitch/band fingerprints for near-dup audio detection).
    Each clip is REAL-decoded (decode_wav), then projected onto
    [f_lo, f_hi) Hz complex exponentials as ONE numpy matmul per clip;
    the argmax candidate is the dominant tone.

    mapInPandas streams Arrow batches of (id, payload) through the
    kernel — embarrassingly parallel, no shuffle, payload bytes never
    leave the executor — so throughput scales with input splits at
    100 TB of audio. Output: (media_id, dom_freq_hz, n_samples)."""
    out_schema = f"{id_col} long, dom_freq_hz int, n_samples long"

    def run(batches):
        import numpy as np
        import pandas as pd

        # the projection bank depends only on (n, sr); real corpora
        # have a handful of clip shapes, so the transcendental work
        # (n·bank sin/cos evals) amortizes to ~zero and each clip costs
        # ONE pair of BLAS matvecs
        banks: dict = {}

        def bank(n, sr):
            key = (n, sr)
            if key not in banks:
                if len(banks) >= 64:  # pathological shape diversity:
                    banks.clear()     # bound executor memory, recompute
                t = np.arange(n) / sr
                freqs = np.arange(f_lo, f_hi, dtype="float64")
                ph = 2 * np.pi * freqs[:, None] * t[None, :]
                banks[key] = (freqs, np.cos(ph), np.sin(ph))
            return banks[key]

        for pdf in batches:
            ids, doms, lens = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                x, sr = decode_wav(bytes(payload))
                freqs, cos_b, sin_b = bank(len(x), sr)
                power = (cos_b @ x) ** 2 + (sin_b @ x) ** 2
                ids.append(int(mid))
                doms.append(int(freqs[int(np.argmax(power))]))
                lens.append(len(x))
            yield pd.DataFrame(
                {id_col: ids, "dom_freq_hz": doms, "n_samples": lens})

    return df.mapInPandas(run, out_schema)


def image_ahash(df: DataFrame, payload_col: str = "payload",
                id_col: str = "media_id", grid: int = 8) -> DataFrame:
    """Perceptual average-hash per image (the aHash of image near-dup
    dedup): decode with the REAL PPM kernel, sample a grid×grid
    nearest-neighbor thumbnail (sx=(i·W)//grid, the resize_images index
    map), grayscale each sample INTEGER-exactly (gray=(r+g+b)//3), and
    emit one bit per cell — 1 iff gray·grid² > Σgray (the all-integer
    form of 'above the thumbnail mean', so an SQL oracle replays every
    bit). Returns (id, ahash) with ahash a row-major '0'/'1' string:
    equal strings = perceptual duplicates (payload bytes may differ —
    compression noise, dithering, metadata — wherever the sampled
    grid doesn't look).

    Scale shape: payload bytes never shuffle (decode+hash runs in the
    Arrow map stage, output is id + 64 chars); downstream grouping by
    the hash is ONE shuffle at the deduplicated-hash grain."""
    import pandas as pd

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                arr = decode_ppm(bytes(payload)).astype(np.int64)
                h, w, _ = arr.shape
                sy = (np.arange(grid) * h) // grid
                sx = (np.arange(grid) * w) // grid
                cells = arr[np.ix_(sy, sx)]          # (grid, grid, 3)
                gray = cells.sum(axis=-1) // 3       # integer grayscale
                total = int(gray.sum())
                bits = (gray * (grid * grid) > total).astype(np.uint8)
                rows.append((int(mid),
                             "".join("1" if b else "0"
                                     for b in bits.ravel())))
            yield pd.DataFrame(rows, columns=[id_col, "ahash"])

    return df.mapInPandas(run, f"{id_col} long, ahash string")


def ahash_near_pairs(hashes: DataFrame, id_col: str = "media_id",
                     hash_col: str = "ahash",
                     max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate pairs over :func:`image_ahash` output:
    all (id_a < id_b) pairs whose 64-bit hashes differ in at most
    ``max_hamming`` cells — the retrieval half of image dedup (exact
    hash-equality grouping misses a one-block crop/brightness flip;
    Hamming radius catches it).

    EXACT-complete candidate generation by pigeonhole banding (the
    simhash_search discipline applied to image hashes): the 64-char
    hash splits into ``max_hamming + 1`` contiguous bands, and any pair
    within the radius must agree on at least one band verbatim — so
    per-band equi-joins (never all-pairs) provably produce a superset,
    and one exact Hamming pass over the candidates filters it. At
    corpus scale each band join is bucket-local; the exact check runs
    only on collisions."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    h = hashes.select(F.col(id_col).alias("__id"),
                      F.col(hash_col).alias("__h"))
    bands = [F.struct(F.lit(b).alias("band"),
                      F.substring("__h", b * width + 1,
                                  64 - b * width if b == n_bands - 1
                                  else width).alias("key"))
             for b in range(n_bands)]
    ex = (h.select("__id", "__h", F.explode(F.array(*bands)).alias("bb"))
          .select("__id", "__h", F.col("bb.band").alias("band"),
                  F.col("bb.key").alias("key"))
          .transform(pin))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (a.join(b.hint("SHUFFLE_HASH"), on=["band", "key"])
            .where(F.col("a.__id") < F.col("b.__id"))
            .select(F.col("a.__id").alias("id_a"),
                    F.col("b.__id").alias("id_b"),
                    F.col("a.__h").alias("ha"),
                    F.col("b.__h").alias("hb"))
            .dropDuplicates(["id_a", "id_b"]))
    dist = F.aggregate(
        F.sequence(F.lit(1), F.lit(64)), F.lit(0),
        lambda acc, i: acc + F.when(
            F.substring(F.col("ha"), i, 1)
            != F.substring(F.col("hb"), i, 1), 1).otherwise(0))
    return (cand.withColumn("dist", dist.cast("int"))
            .where(F.col("dist") <= max_hamming)
            .select("id_a", "id_b", "dist"))

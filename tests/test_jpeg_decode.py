"""Baseline JPEG decoder (operators/multimodal.decode_jpeg_pixels).

Verification strategy (CLAUDE.md: independent references, never the
engine's own path):

* hand-built single-MCU JPEGs whose expected pixels follow from T.81
  arithmetic done BY HAND (DC-only => flat c/8+128 block; single-AC =>
  cosine ramp computed from the spec formula written independently here);
* the zigzag constant re-derived algorithmically from the spec's
  diagonal-walk rule;
* a minimal INDEPENDENT baseline encoder (forward DCT + quant + its own
  canonical Huffman construction) round-tripped through the decoder on
  gradients/patterns, grayscale + 4:4:4 + 4:2:0 + restart markers;
* the perceptual-hash pairing path on generated JPEGs (near-dup found,
  distinct not), including a mixed PNG+JPEG corpus through the
  decode_image_pixels dispatcher.
"""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.multimodal import (
    _JPEG_ZIGZAG,
    decode_image_pixels,
    decode_jpeg_pixels,
)

# --- minimal independent baseline encoder (test-side only) ------------------

_QT_LUMA = [  # T.81 Annex K.1 (raster order)
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def _zigzag_spec_walk() -> list[int]:
    """Re-derive the zigzag order from the spec's diagonal-walk rule."""
    order, x, y, up = [], 0, 0, True
    for _ in range(64):
        order.append(y * 8 + x)
        if up:
            if x == 7:
                y, up = y + 1, False
            elif y == 0:
                x, up = x + 1, False
            else:
                x, y = x + 1, y - 1
        else:
            if y == 7:
                x, up = x + 1, True
            elif x == 0:
                y, up = y + 1, True
            else:
                x, y = x - 1, y + 1
    return order


def _fdct(block: list[int]) -> list[float]:
    """Forward DCT (T.81 A.3.3), raster in, raster out."""
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            cu = math.sqrt(0.5) if u == 0 else 1.0
            cv = math.sqrt(0.5) if v == 0 else 1.0
            acc = 0.0
            for y in range(8):
                for x in range(8):
                    acc += (block[y * 8 + x] - 128) * math.cos(
                        (2 * x + 1) * u * math.pi / 16
                    ) * math.cos((2 * y + 1) * v * math.pi / 16)
            out[v * 8 + u] = 0.25 * cu * cv * acc
    return out


class _BitWriter:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _raw_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _fixed_table(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """Equal-length canonical table over the used symbol set (valid,
    suboptimal; leaves the all-ones code unused)."""
    syms = sorted(set(symbols))
    length = max(2, (len(syms) + 1).bit_length())
    counts = [0] * 16
    counts[length - 1] = len(syms)
    enc = {s: (i, length) for i, s in enumerate(syms)}
    return counts, syms, enc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_baseline_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quant: list[int] | None = None,
    subsample_420: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Test-side minimal baseline encoder: grayscale or YCbCr 4:4:4 /
    4:2:0 (input taken as R,G,B), shared quant table, per-image
    equal-length Huffman tables, optional restart markers."""
    q = quant or [1] * 64
    zz = _zigzag_spec_walk()

    if channels == 3:
        y_p, cb_p, cr_p = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            yy = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
            y_p.append(min(255, max(0, int(yy + 0.5))))
            cb_p.append(min(255, max(0, int(cb + 0.5))))
            cr_p.append(min(255, max(0, int(cr + 0.5))))
        if subsample_420:
            comps = [(y_p, width, height, 2, 2), None, None]
            half_w, half_h = -(-width // 2), -(-height // 2)

            def box(p):
                o = []
                for by in range(half_h):
                    for bx in range(half_w):
                        vals = [
                            p[min(2 * by + dy, height - 1) * width + min(2 * bx + dx, width - 1)]
                            for dy in range(2)
                            for dx in range(2)
                        ]
                        o.append((sum(vals) + 2) // 4)
                return o

            comps[1] = (box(cb_p), half_w, half_h, 1, 1)
            comps[2] = (box(cr_p), half_w, half_h, 1, 1)
        else:
            comps = [
                (y_p, width, height, 1, 1),
                (cb_p, width, height, 1, 1),
                (cr_p, width, height, 1, 1),
            ]
    else:
        comps = [(list(pixels), width, height, 1, 1)]

    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    mcux, mcuy = -(-width // (8 * hmax)), -(-height // (8 * vmax))

    # pass 1: quantized zigzag coefficients per block in scan order
    def block_at(plane, pw, ph, bx, by):
        blk = []
        for yy in range(8):
            for xx in range(8):
                sx, sy = min(bx * 8 + xx, pw - 1), min(by * 8 + yy, ph - 1)
                blk.append(plane[sy * pw + sx])
        coefs = _fdct(blk)
        zq = []
        for k in range(64):
            c = coefs[zz[k]] / q[zz[k]]
            zq.append(int(c + 0.5) if c >= 0 else -int(-c + 0.5))
        return zq

    scan_blocks = []  # (comp_index, zigzag coefs)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (plane, pw, ph, hs, vs) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        scan_blocks.append(
                            (ci, block_at(plane, pw, ph, mx * hs + bx, my * vs + by))
                        )

    # pass 2: collect symbols (restart-aware DC predictors)
    n_comp = len(comps)
    blocks_per_mcu = sum(c[3] * c[4] for c in comps)
    dc_syms: dict[int, list[int]] = {0: [], 1: []}
    ac_syms: dict[int, list[int]] = {0: [], 1: []}

    def emit(blocks, sink_dc=None, sink_ac=None, writer=None, enc_dc=None, enc_c=None):
        pred = [0] * n_comp
        for bi, (ci, zq) in enumerate(blocks):
            if restart_interval and bi and bi % (restart_interval * blocks_per_mcu) == 0:
                if writer is not None:
                    data = writer.flush()
                    writer.out = bytearray(data)
                    writer.acc, writer.n = 0, 0
                    rst = 0xD0 + ((bi // (restart_interval * blocks_per_mcu) - 1) % 8)
                    writer.out += bytes([0xFF, rst])
                pred = [0] * n_comp
            tc = 0 if ci == 0 else 1
            diff = zq[0] - pred[ci]
            pred[ci] = zq[0]
            t = _category(diff)
            if writer is None:
                sink_dc[tc].append(t)
            else:
                code, ln = enc_dc[tc][t]
                writer.write(code, ln)
                if t:
                    writer.write(_raw_bits(diff, t), t)
            run = 0
            last_nz = max((k for k in range(1, 64) if zq[k]), default=0)
            for k in range(1, 64):
                v = zq[k]
                if v == 0:
                    if k > last_nz:
                        break
                    run += 1
                    if run == 16:
                        if writer is None:
                            sink_ac[tc].append(0xF0)
                        else:
                            code, ln = enc_c[tc][0xF0]
                            writer.write(code, ln)
                        run = 0
                    continue
                sz = _category(v)
                sym = (run << 4) | sz
                if writer is None:
                    sink_ac[tc].append(sym)
                else:
                    code, ln = enc_c[tc][sym]
                    writer.write(code, ln)
                    writer.write(_raw_bits(v, sz), sz)
                run = 0
            if last_nz < 63:
                if writer is None:
                    sink_ac[tc].append(0x00)
                else:
                    code, ln = enc_c[tc][0x00]
                    writer.write(code, ln)

    emit(scan_blocks, dc_syms, ac_syms)
    tables, enc_dc, enc_ac = [], {}, {}
    used_classes = [0] + ([1] if n_comp == 3 else [])
    for tc in used_classes:
        counts, syms, enc = _fixed_table(dc_syms[tc] or [0])
        enc_dc[tc] = enc
        tables.append(_seg(0xC4, bytes([0x00 | tc]) + bytes(counts) + bytes(syms)))
        counts, syms, enc = _fixed_table(ac_syms[tc] or [0])
        enc_ac[tc] = enc
        tables.append(_seg(0xC4, bytes([0x10 | tc]) + bytes(counts) + bytes(syms)))

    w = _BitWriter()
    emit(scan_blocks, writer=w, enc_dc=enc_dc, enc_c=enc_ac)
    entropy = w.flush()

    qz = bytes(q[zz[k]] for k in range(64))
    out = b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + qz)
    if n_comp == 3:
        samp0 = (comps[0][3] << 4) | comps[0][4]
        sof_body = bytes([8]) + struct.pack(">HH", height, width) + bytes(
            [3, 1, samp0, 0, 2, 0x11, 0, 3, 0x11, 0]
        )
        sos_body = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    else:
        sof_body = bytes([8]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0])
        sos_body = bytes([1, 1, 0x00, 0, 63, 0])
    out += _seg(0xC0, sof_body)
    out += b"".join(tables)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, sos_body) + entropy + b"\xff\xd9"
    return out


# --- hand-vector helpers ----------------------------------------------------


def _hand_jpeg(entropy: bytes, dc_identity_quant: bool = True) -> bytes:
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    counts_dc = [0] * 16
    counts_dc[3] = 12  # 12 codes of length 4, symbols 0..11
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes(counts_dc) + bytes(range(12)))
    counts_ac = [0] * 16
    counts_ac[2] = 3  # 3 codes of length 3: EOB(0x00), 0x01, 0x02
    dht_ac = _seg(0xC4, bytes([0x10]) + bytes(counts_ac) + bytes([0x00, 0x01, 0x02]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"


def test_zigzag_matches_spec_walk():
    assert _JPEG_ZIGZAG == _zigzag_spec_walk()


def test_dc_only_hand_vectors():
    """DC-only block: every pixel = DC/8 + 128 (T.81 A.3.3 with only the
    u=v=0 term). Codes by hand: DC cat-4 = '0100', raw '1000' = +8 /
    '0111' = -8; EOB = '000' (3-bit)."""
    # +8: 0100 1000 000 -> 01001000 000 + pad
    d = decode_jpeg_pixels(_hand_jpeg(bytes([0b01001000, 0b00011111])))
    assert d == {"width": 8, "height": 8, "channels": 1, "pixels": bytes([129] * 64)}
    # -8: 0100 0111 000
    d = decode_jpeg_pixels(_hand_jpeg(bytes([0b01000111, 0b00011111])))
    assert d["pixels"] == bytes([127] * 64)
    # 0: 0000 000
    d = decode_jpeg_pixels(_hand_jpeg(bytes([0b00000000, 0b01111111])))
    assert d["pixels"] == bytes([128] * 64)


def test_single_ac_hand_vector():
    """DC=0 then AC at zigzag index 1 (= F[v=0][u=1]): expected pixels
    from the spec IDCT formula computed here, independently."""
    # DC cat0: '0000'; AC symbol 0x14 -> not in table; use symbol run=0
    # size=4 = 0x04? our hand AC table has only 0x00,0x01,0x02 — use size 2:
    # AC (0,2) = symbol 0x02 code '010', raw 2 bits: value 2 -> '10'
    d = decode_jpeg_pixels(_hand_jpeg(bytes([0b00000101, 0b00001111])))
    # bits: DC '0000' AC '010' raw '10' EOB '000' -> 0000 0101 0000 + pad 1111
    assert d is not None
    exp = []
    for y in range(8):
        for x in range(8):
            val = 0.25 * 2 * math.cos((2 * x + 1) * 1 * math.pi / 16)  # C(1)=1, F=2
            # C(0) factors for v: 1/sqrt(2) each of u? u=1 -> C=1; v=0 -> C=1/sqrt2
            val *= math.sqrt(0.5)  # C(v=0)
            s = int(val + 128.5) if val >= -128.5 else 0
            exp.append(min(255, max(0, s)))
    assert list(d["pixels"]) == exp


def _gray_pattern(w, h):
    return bytes(((x * 7 + y * 13 + (x * y) % 31) % 256) for y in range(h) for x in range(w))


def _smooth_rgb(w, h):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes(
                [
                    (x * 255) // max(w - 1, 1),
                    (y * 255) // max(h - 1, 1),
                    ((x + y) * 255) // max(w + h - 2, 1),
                ]
            )
    return bytes(out)


def test_roundtrip_grayscale_identity_quant():
    """Identity quant: the only loss is DCT coefficient rounding, so the
    decode must land within +-2 of the source everywhere (16x16 = 4 MCUs,
    non-aligned 12x10 exercises edge padding)."""
    for w, h in [(16, 16), (12, 10)]:
        px = _gray_pattern(w, h)
        d = decode_jpeg_pixels(encode_baseline_jpeg(px, w, h, 1))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
        worst = max(abs(a - b) for a, b in zip(d["pixels"], px))
        assert worst <= 2, worst


def test_roundtrip_grayscale_real_quant_table():
    """Annex K luminance table: error bounded by the quantization steps
    (coarse), but structure must survive — per-pixel within 36 (half the
    largest quant step + rounding) and mean error small on a smooth ramp."""
    w = h = 16
    px = bytes((x * 16) % 256 for y in range(h) for x in range(w))
    d = decode_jpeg_pixels(encode_baseline_jpeg(px, w, h, 1, quant=_QT_LUMA))
    errs = [abs(a - b) for a, b in zip(d["pixels"], px)]
    assert max(errs) <= 36 and sum(errs) / len(errs) <= 8.0, (max(errs), sum(errs) / len(errs))


def test_roundtrip_color_444_and_420():
    w, h = 16, 16
    px = _smooth_rgb(w, h)
    d = decode_jpeg_pixels(encode_baseline_jpeg(px, w, h, 3))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    worst = max(abs(a - b) for a, b in zip(d["pixels"], px))
    assert worst <= 4, worst  # color convert round trips add ~2

    d = decode_jpeg_pixels(encode_baseline_jpeg(px, w, h, 3, subsample_420=True))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    # chroma was box-averaged 2x2 and upsampled nearest: smooth gradient
    # stays within the neighbor-delta bound
    worst = max(abs(a - b) for a, b in zip(d["pixels"], px))
    assert worst <= 24, worst


def test_restart_markers():
    w, h = 32, 8  # 4 MCUs, restart every 2
    px = _gray_pattern(w, h)
    jpg = encode_baseline_jpeg(px, w, h, 1, restart_interval=2)
    assert any(
        jpg[i] == 0xFF and 0xD0 <= jpg[i + 1] <= 0xD7 for i in range(len(jpg) - 1)
    )
    d = decode_jpeg_pixels(jpg)
    worst = max(abs(a - b) for a, b in zip(d["pixels"], px))
    assert worst <= 2, worst


def test_rejects_non_baseline_and_hostile():
    px = _gray_pattern(16, 16)
    jpg = encode_baseline_jpeg(px, 16, 16, 1)
    assert decode_jpeg_pixels(jpg[:40]) is None  # truncated
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None  # no frame
    assert decode_jpeg_pixels(None) is None
    assert decode_jpeg_pixels(b"not a jpeg") is None
    prog = jpg.replace(bytes([0xFF, 0xC0]), bytes([0xFF, 0xC2]), 1)
    assert decode_jpeg_pixels(prog) is None  # progressive honestly gated
    # 12-bit precision rejected
    i = jpg.index(bytes([0xFF, 0xC0]))
    twelve = jpg[: i + 4] + bytes([12]) + jpg[i + 5 :]
    assert decode_jpeg_pixels(twelve) is None


def test_dispatcher_routes_by_magic():
    px = _gray_pattern(16, 16)
    jpg = encode_baseline_jpeg(px, 16, 16, 1)
    assert decode_image_pixels(jpg)["pixels"] == decode_jpeg_pixels(jpg)["pixels"]
    assert decode_image_pixels(b"\x89PNG\r\n\x1a\ntrash") is None
    assert decode_image_pixels(b"???") is None
    assert decode_image_pixels(None) is None


def test_phash_pairing_on_generated_jpegs(spark):
    """The dominant crawl format now feeds the perceptual dedup chain:
    a JPEG and its +8-brightness re-encode must pair (dHash is
    gradient-based, brightness-invariant); a structurally different
    image must not. Mixed PNG+JPEG corpus goes through the default
    decode_image_pixels dispatcher — no decode= injection needed."""
    from edna_dbt_library_spark.operators.multimodal import image_near_dup_pairs
    from tests.test_streaming_multimodal import _encode_png  # reuse PNG builder

    w = h = 32
    base = bytes(((x * 5 + y * 3) % 256) for y in range(h) for x in range(w))
    bright = bytes(min(255, b + 8) for b in base)
    other = bytes(((x * 97 + (y % 7) * 151) % 256) for y in range(h) for x in range(w))

    rows = [
        (1, encode_baseline_jpeg(base, w, h, 1)),
        (2, encode_baseline_jpeg(bright, w, h, 1)),
        (3, encode_baseline_jpeg(other, w, h, 1)),
        (4, _encode_png(base, w, h, 0)),  # same content as grayscale PNG
    ]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in image_near_dup_pairs(media, max_hamming=3, bands=4).collect()
    }
    assert (1, 2) in pairs
    assert (1, 4) in pairs or (2, 4) in pairs  # PNG and JPEG of same pixels pair
    assert not any(3 in p for p in pairs)


def test_parse_media_header_jpeg_mp4_mp3():
    """Container-level probes for the formats the crawl actually ships:
    JPEG SOFn dims (including PROGRESSIVE — dims parse even though pixel
    decode is honestly gated), hand-built ISO-BMFF moov/mvhd/tkhd, and
    an MPEG-1 Layer III header behind an ID3v2 tag."""
    from edna_dbt_library_spark.operators.multimodal import parse_media_header

    jpg = encode_baseline_jpeg(_gray_pattern(24, 16), 24, 16, 1)
    m = parse_media_header(jpg)
    assert m == {
        "format": "jpeg", "width": 24, "height": 16, "channels": 1,
        "sample_rate": None, "duration_ms": None,
    }
    prog = jpg.replace(bytes([0xFF, 0xC0]), bytes([0xFF, 0xC2]), 1)
    assert parse_media_header(prog)["width"] == 24  # dims without decode

    color = encode_baseline_jpeg(_smooth_rgb(8, 8), 8, 8, 3)
    assert parse_media_header(color)["channels"] == 3

    # minimal MP4: ftyp + moov(mvhd v0 timescale=1000 dur=2500,
    # trak(tkhd v0 with 320x240 16.16 fixed)) — box-exact per 14496-12
    def box(t, body):
        return struct.pack(">I", len(body) + 8) + t + body

    mvhd = box(b"mvhd", bytes(12) + struct.pack(">II", 1000, 2500) + bytes(80))
    tkhd = box(
        b"tkhd", bytes(76) + struct.pack(">II", 320 << 16, 240 << 16)
    )
    mp4 = box(b"ftyp", b"isom" + bytes(8)) + box(b"moov", mvhd + box(b"trak", tkhd))
    m = parse_media_header(mp4)
    assert m["format"] == "mp4" and m["duration_ms"] == 2500
    assert (m["width"], m["height"]) == (320, 240)

    # MP3: ID3v2 tag (10-byte header, 0 payload) + MPEG-1 Layer III
    # 128kbps 44100Hz stereo frame header + 4 KiB of payload
    frame_hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # 1111 1111 111 11 01 1...
    mp3 = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 0]) + frame_hdr + bytes(4096)
    m = parse_media_header(mp3)
    assert m["format"] == "mp3" and m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["duration_ms"] == (4 + 4096) * 8000 // 128000

    # hostile: truncated boxes / garbage stay None or don't crash
    assert parse_media_header(mp4[:10]) is None
    assert parse_media_header(b"\xff\xe0aa") is None


def test_grayscale_with_declared_subsampling_decodes_non_interleaved():
    """T.81 A.2: a single-component scan is non-interleaved — exactly
    one data unit per MCU, whatever sampling factors the SOF declares.
    A grayscale JPEG patched to declare 2x2 sampling must decode to the
    SAME pixels as its 1x1 twin (libjpeg normalizes grayscale to 1x1);
    decoding it interleaved would desync the stream into wrong pixels."""
    w, h = 16, 16
    px = bytes((7 * x + 13 * y) % 256 for y in range(h) for x in range(w))
    plain = encode_baseline_jpeg(px, w, h, 1)
    ref = decode_jpeg_pixels(plain)
    assert ref is not None and ref["channels"] == 1

    sof = plain.index(b"\xff\xc0")
    # SOF0 body: len(2) precision(1) h(2) w(2) ncomp(1) id(1) sampling(1)
    samp_at = sof + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert plain[samp_at] == 0x11
    patched = plain[:samp_at] + bytes([0x22]) + plain[samp_at + 1 :]

    d = decode_jpeg_pixels(patched)
    assert d is not None
    assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
    assert d["pixels"] == ref["pixels"]

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` UDFs.

The Spark-side plumbing — schema convention, partitioning, UDF signatures,
batch shapes — is real and tested. Byte decoding in-container is real for
the formats stdlib can express: PNG headers AND pixels
(``parse_media_header`` / ``decode_png_pixels`` — zlib inflate +
per-scanline unfilter per the spec) and WAV integer-PCM SAMPLES
(``decode_wav_samples`` — RIFF walk + exact integer mono mix). On top of
the real decodes: perceptual dHash/aHash and audio energy-delta
fingerprints for near-dup pairing (shared banded-Hamming blocking), and
``image_feature_embeddings`` (luma-histogram embeddings bridging into
the embedding operators). JPEG gained a real stdlib BASELINE decoder in
r6 (``decode_jpeg_pixels`` — Huffman + dequant + exact IDCT + YCbCr);
formats that genuinely need a codec library (progressive JPEG, video,
compressed audio) remain STUBBED: ``decode_images`` /
``extract_features`` accept an injected codec function, and
``require_real_codecs()`` raises NotImplementedError spelling out what
a production deployment plugs in.

Scale notes: media bytes travel in the ``content`` column, so operators
keep batches small via ``MEDIA_BATCH_ROWS`` (maxRecordsPerBatch) rather
than per-row Python calls; metadata-only transforms (frame planning,
filtering by dimensions) stay in pure Column expressions and never
deserialize bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_BATCH_ROWS = 64  # arrow batch cap for byte-heavy frames


def _apply_batch_rows(media: DataFrame, batch_rows: int | None) -> None:
    """Set ``spark.sql.execution.arrow.maxRecordsPerBatch`` for this
    operator's Arrow transfer.

    SESSION-SCOPED SIDE EFFECT, by design: the conf is read when the
    returned (lazy) DataFrame EXECUTES, not when this builder runs, so a
    save/restore around the mapInPandas construction would silently lose
    the override before the job ever starts. Later Arrow jobs in the same
    session inherit the last value passed; pass ``batch_rows`` explicitly
    on each media operator (they all accept it) or reset the conf when
    mixing media and non-media Arrow work in one session."""
    if batch_rows is not None:
        media.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows)
        )

# convention: media tables/columns use this struct
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png, wav, mp4, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|mp3|unknown
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)

# PNG IHDR color type -> sample channels (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_media_header(content: bytes | None) -> dict | None:
    """Pure-stdlib (struct-only) header parse of REAL media bytes: PNG
    IHDR (width/height/channels), JPEG SOFn frame dimensions, RIFF/WAVE
    fmt+data chunks (channels, sample rate, exact duration), ISO-BMFF
    MP4 (mvhd duration + first video tkhd dimensions), and MPEG-1/2
    Layer III (MP3) frame headers (channels, sample rate, CBR duration
    estimate). Returns None for anything it cannot identify — full
    sample decoding beyond PNG/baseline-JPEG/WAV still requires the
    injected codec stack (require_real_codecs). This is the honest
    container-level subset: byte-exact per the specs, no external deps,
    enough to drive format routing, dimension filtering, and frame
    planning on real files."""
    if not content:
        return None
    import struct

    if content[:2] == b"\xff\xd8":
        return _parse_jpeg_header(content)
    if len(content) >= 12 and content[4:8] == b"ftyp":
        return _parse_mp4_header(content)
    if len(content) >= 4 and (
        content[:3] == b"ID3"
        or (content[0] == 0xFF and (content[1] & 0xE0) == 0xE0 and (content[1] & 0x06) == 0x02)
    ):
        mp3 = _parse_mp3_header(content)
        if mp3 is not None:
            return mp3

    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 26 and content[12:16] == b"IHDR":
        width, height = struct.unpack(">II", content[16:24])
        # IHDR fields are unsigned 32-bit; the PROBE/DECODE schemas declare
        # int32. A corrupt/hostile header with a dimension > 2^31-1 must
        # read as unparseable, not blow up the Arrow conversion inside
        # mapInPandas and fail the whole ingest job.
        if not (0 < width <= 0x7FFFFFFF and 0 < height <= 0x7FFFFFFF):
            return None
        color_type = content[25]
        return {
            "format": "png",
            "width": width,
            "height": height,
            "channels": _PNG_CHANNELS.get(color_type),
            "sample_rate": None,
            "duration_ms": None,
        }
    if content[:4] == b"RIFF" and len(content) >= 12 and content[8:12] == b"WAVE":
        pos, channels, rate, bits, data_len = 12, None, None, None, None
        while pos + 8 <= len(content):
            cid = content[pos : pos + 4]
            (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
            body = content[pos + 8 : pos + 8 + clen]
            if cid == b"fmt " and len(body) >= 16:
                channels, rate = struct.unpack("<HI", body[2:8])
                (bits,) = struct.unpack("<H", body[14:16])
            elif cid == b"data":
                data_len = clen
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if channels and rate and bits and data_len is not None and rate <= 0x7FFFFFFF:
            return {
                "format": "wav",
                "width": None,
                "height": None,
                "channels": channels,
                "sample_rate": rate,
                "duration_ms": data_len * 8000 // (rate * channels * bits),
            }
    return None


def _parse_jpeg_header(content: bytes) -> dict | None:
    """JPEG frame dimensions/channels from the first SOFn marker
    (baseline through progressive — dimensions live in every frame
    header even when pixel decode needs a codec)."""
    import struct

    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            return None
        marker = content[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        if pos + 2 > len(content):
            return None
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(content):
            return None
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF) and seglen >= 8:
            h, w = struct.unpack(">HH", content[pos + 3 : pos + 7])
            nc = content[pos + 7]
            if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
                return None
            return {
                "format": "jpeg",
                "width": w,
                "height": h,
                "channels": nc,
                "sample_rate": None,
                "duration_ms": None,
            }
        if marker == 0xDA:
            return None  # scan before any frame header: malformed
        pos += seglen
    return None


def _parse_mp4_header(content: bytes) -> dict | None:
    """ISO-BMFF (MP4/MOV) box walk: mvhd movie duration + the first
    video track's tkhd display dimensions. Box-exact per ISO 14496-12;
    frame/sample decode stays behind the codec hook."""
    import struct

    duration_ms = width = height = None

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal duration_ms, width, height
        pos = lo
        while pos + 8 <= hi and depth < 8:
            (size,) = struct.unpack(">I", content[pos : pos + 4])
            btype = content[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > hi:
                    return
                (size,) = struct.unpack(">Q", content[pos + 8 : pos + 16])
                body = pos + 16
            elif size == 0:
                size = hi - pos
            if size < 8 or pos + size > hi:
                return
            if btype in (b"moov", b"trak", b"mdia"):
                walk(body, pos + size, depth + 1)
            elif btype == b"mvhd" and duration_ms is None and body + 20 <= hi:
                ver = content[body]
                if ver == 1 and body + 28 <= hi:
                    (scale,) = struct.unpack(">I", content[body + 20 : body + 24])
                    (dur,) = struct.unpack(">Q", content[body + 24 : body + 32])
                else:
                    (scale,) = struct.unpack(">I", content[body + 12 : body + 16])
                    (dur,) = struct.unpack(">I", content[body + 16 : body + 20])
                if scale:
                    duration_ms = dur * 1000 // scale
            elif btype == b"tkhd" and width is None and body + 84 <= hi:
                # v0: ver/flags 4 + times 8 + id 4 + res 4 + dur 4 = 24,
                # + res 8 + layer/alt/vol/res 8 + matrix 36 = width at 76
                # (v1 widens the three time/duration fields by 12)
                ver = content[body]
                off = body + (88 if ver == 1 else 76)
                if off + 8 <= hi:
                    w16, h16 = struct.unpack(">II", content[off : off + 8])
                    if w16 and h16:  # 16.16 fixed point; audio tracks are 0x0
                        width, height = w16 >> 16, h16 >> 16
            pos += size

    walk(0, len(content), 0)
    if duration_ms is None and width is None:
        return None
    return {
        "format": "mp4",
        "width": width,
        "height": height,
        "channels": None,
        "sample_rate": None,
        "duration_ms": duration_ms,
    }


_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_RATES = {0: 44100, 1: 48000, 2: 32000}


def _parse_mp3_header(content: bytes) -> dict | None:
    """MPEG-1 Layer III frame header (optionally behind an ID3v2 tag):
    channels + sample rate exact, duration a CBR estimate from the first
    frame's bitrate (the honest header-level answer; VBR-accurate
    duration needs a full frame walk or Xing parsing)."""
    import struct

    pos = 0
    if content[:3] == b"ID3" and len(content) >= 10:
        # syncsafe 28-bit tag size
        sz = ((content[6] & 0x7F) << 21) | ((content[7] & 0x7F) << 14) | (
            (content[8] & 0x7F) << 7
        ) | (content[9] & 0x7F)
        pos = 10 + sz
    if pos + 4 > len(content):
        return None
    b0, b1, b2, b3 = content[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    if (b1 >> 3) & 0x03 != 0x03 or (b1 >> 1) & 0x03 != 0x01:
        return None  # only MPEG-1 Layer III
    bitrate_idx, rate_idx = b2 >> 4, (b2 >> 2) & 0x03
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    bitrate = _MP3_BITRATES[bitrate_idx] * 1000
    rate = _MP3_RATES[rate_idx]
    channels = 1 if (b3 >> 6) == 3 else 2
    audio_bytes = len(content) - pos
    return {
        "format": "mp3",
        "width": None,
        "height": None,
        "channels": channels,
        "sample_rate": rate,
        "duration_ms": audio_bytes * 8000 // bitrate,
    }


def probe_media_headers(media: DataFrame, batch_rows: int | None = None) -> DataFrame:
    """Format-sniff a binary ``content`` column over Arrow batches: one
    output row per input with parsed container metadata (or
    format='unknown' and NULL fields), byte count and digest. The
    ingest-side routing step of a multimodal pipeline — runs on real
    bytes with zero codec dependencies, so it works in this container and
    scales exactly like decode_images (bounded Arrow batches, no per-row
    Python overhead beyond the parse itself)."""
    _apply_batch_rows(media, batch_rows)

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                meta = parse_media_header(content)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "format": meta["format"] if meta else "unknown",
                        "width": meta["width"] if meta else None,
                        "height": meta["height"] if meta else None,
                        "channels": meta["channels"] if meta else None,
                        "sample_rate": meta["sample_rate"] if meta else None,
                        "duration_ms": meta["duration_ms"] if meta else None,
                        "n_bytes": len(content) if content is not None else 0,
                        "content_md5": hashlib.md5(content or b"").hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return media.select("doc_id", "content").mapInPandas(run, PROBE_SCHEMA)


def decode_png_pixels(content: bytes | None) -> dict | None:
    """Pure-stdlib PNG PIXEL decode (PNG spec §9 filtering, §13 decoder
    conformance): chunk walk, zlib-inflate of the concatenated IDAT
    stream, then per-scanline unfilter (None/Sub/Up/Average/Paeth).

    Supports the baseline subset that covers the overwhelming majority of
    crawled PNGs: bit depth 8, color types 0/2/3/4/6 (palette expanded
    via PLTE), no interlace. Returns ``{"width", "height", "channels",
    "pixels"}`` with ``pixels`` the reconstructed ``height*width*channels``
    sample bytes, or None for anything else (Adam7, 16-bit, truncated or
    hostile streams) — callers fall back to header-only metadata rather
    than failing the job.

    This closes the container honesty gate for images: no codec library
    is needed to get real samples out of real PNG bytes. It runs inside
    the Arrow-batched ``decode_images`` path (Python per scanline is the
    cost of stdlib-only; a production stack injects a native codec via
    ``decode_fn`` for throughput). JPEG/video stay behind
    ``require_real_codecs``.
    """
    import struct
    import zlib

    if not content or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, width, height = 8, None, None
    bit_depth = color_type = interlace = None
    idat, plte = bytearray(), None
    while pos + 8 <= len(content):
        (clen,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None  # truncated stream
        if ctype == b"IHDR" and clen >= 13:
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + data + crc32
    if (
        width is None
        or bit_depth != 8
        or interlace != 0
        or color_type not in _PNG_CHANNELS
        or not (0 < width <= 0x7FFFFFFF and 0 < height <= 0x7FFFFFFF)
    ):
        return None
    channels = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        return None
    out = bytearray(stride * height)
    prev = bytes(stride)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            return None  # invalid filter type
        out[y * stride : (y + 1) * stride] = line
        prev = line
    pixels = bytes(out)
    if color_type == 3:  # expand palette indices to RGB
        if plte is None or len(plte) < 3 * (max(pixels) + 1 if pixels else 1):
            return None
        pixels = b"".join(plte[3 * i : 3 * i + 3] for i in pixels)
        channels = 3
    return {"width": width, "height": height, "channels": channels, "pixels": pixels}




# --- baseline JPEG (ITU-T T.81) pixel decode, stdlib-only -------------------

#: zigzag order (T.81 Figure 5): zigzag index -> raster index in an 8x8 block
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_idct_table() -> list[float]:
    """cos((2x+1)*u*pi/16) * C(u)/2 lookup, flattened [x*8+u]."""
    import math

    t = []
    for x in range(8):
        for u in range(8):
            c = math.sqrt(0.5) if u == 0 else 1.0
            t.append(0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16.0))
    return t


_IDCT_T = _jpeg_idct_table()


def _jpeg_idct_block(coef: list[int]) -> list[int]:
    """Exact separable 2D IDCT (T.81 A.3.3) + level shift + clamp:
    64 dequantized raster-order coefficients -> 64 samples 0..255.
    Float path with a single final round — deterministic in IEEE doubles
    on any platform (fixed evaluation order, no fused contractions in
    CPython)."""
    t = _IDCT_T
    # rows: for each v, inverse transform over u
    tmp = [0.0] * 64
    for v in range(8):
        base = v * 8
        row = coef[base : base + 8]
        if not any(row):
            continue
        for x in range(8):
            acc = 0.0
            xb = x * 8
            for u in range(8):
                cu = row[u]
                if cu:
                    acc += cu * t[xb + u]
            tmp[base + x] = acc
    out = [0] * 64
    for x in range(8):
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            acc = 0.0
            yb = y * 8
            for v in range(8):
                cv = col[v]
                if cv:
                    acc += cv * t[yb + v]
            s = int(acc + 128.5) if acc >= -128.5 else 0  # round half up + shift
            out[y * 8 + x] = 255 if s > 255 else (0 if s < 0 else s)
    return out


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any real marker (caller handles RST)."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.buf, self.nbits = 0, 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed byte
            else:
                return False  # real marker: stop
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_to_marker(self) -> int | None:
        """Skip to the next marker byte pair; returns the marker code."""
        self.buf, self.nbits = 0, 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return None


def _jpeg_build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: {(length, code) -> symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int | None:
    code, length = 0, 0
    while length < 16:
        b = reader.bit()
        if b is None:
            return None
        code = (code << 1) | b
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _jpeg_extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: t-bit raw value -> signed coefficient."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg_pixels(content: bytes | None) -> dict | None:
    """Pure-stdlib BASELINE-SEQUENTIAL JPEG pixel decode (ITU-T T.81:
    SOF0, 8-bit, Huffman): marker walk (DQT/DHT/SOF0/DRI/SOS), canonical
    Huffman entropy decode with restart-marker handling, dequantize +
    dezigzag, exact float IDCT, nearest-neighbor chroma upsample, and
    JFIF YCbCr->RGB (BT.601 full range). The companion of
    decode_png_pixels behind the same contract: returns
    ``{"width", "height", "channels", "pixels"}`` (channels 1 for
    grayscale, 3 for color; pixels = height*width*channels bytes) or
    None for anything outside the subset (progressive SOF2, arithmetic
    coding, 12-bit, truncated or hostile streams) — callers fall back to
    header metadata rather than failing the job.

    Baseline-sequential is the dominant crawl-image coding (progressive
    JPEG remains behind ``require_real_codecs``'s injectable hook);
    chroma upsampling is nearest-neighbor — a valid T.81 decoder choice,
    deterministic, and within +-1 of fancy upsampling everywhere the
    perceptual hashes look. Python-per-block is the cost of stdlib-only
    (same trade as decode_png_pixels); a production stack injects a
    native codec for throughput."""
    import struct

    if not content or content[:2] != b"\xff\xd8":
        return None
    data = bytes(content)
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (width, height, comps)
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(data):
            return None
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if seglen < 2 or len(body) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                b += 1
                n = 64 * (2 if prec else 1)
                if b + n > len(body):
                    return None
                if prec:
                    vals = list(struct.unpack(f">{64}H", body[b : b + n]))
                else:
                    vals = list(body[b : b + n])
                qt[tid] = vals  # zigzag order
                b += n
        elif marker == 0xC4:  # DHT
            b = 0
            while b + 17 <= len(body):
                tclass, tid = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1 : b + 17])
                n = sum(counts)
                syms = body[b + 17 : b + 17 + n]
                if len(syms) != n:
                    return None
                huff[(tclass, tid)] = _jpeg_build_huffman(counts, syms)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                return None
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8 or nc not in (1, 3) or not (0 < w and 0 < h):
                return None
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq})
            if any(c["h"] < 1 or c["v"] < 1 for c in comps):
                return None
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # extended/progressive/lossless/arithmetic: not baseline
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return None
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = {}
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan[cs] = (tabs >> 4, tabs & 0x0F)
            return _jpeg_decode_scan(
                data, pos + seglen, frame, qt, huff, scan, restart_interval
            )
        # APPn/COM/others: skip
        pos += seglen
    return None


def _jpeg_decode_scan(data, pos, frame, qt, huff, scan, restart_interval):
    w, h, comps = frame
    if any(c["id"] not in scan or c["tq"] not in qt for c in comps):
        return None
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — exactly one
        # data unit per MCU regardless of the declared sampling factors.
        # libjpeg normalizes grayscale to h=v=1; decoding it interleaved
        # (h*v blocks/MCU) would desync the bitstream and yield silently
        # wrong pixels that poison the perceptual hashes downstream.
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        c["bw"], c["bh"] = mcux * c["h"], mcuy * c["v"]  # blocks per dimension
        planes.append(bytearray(c["bw"] * 8 * c["bh"] * 8))
    reader = _JpegBitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    return None
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct = huff.get((0, scan[c["id"]][0]))
                act = huff.get((1, scan[c["id"]][1]))
                if dct is None or act is None:
                    return None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = _jpeg_decode_block(reader, dct, act, qt[c["tq"]])
                        if coef is None:
                            return None
                        pred[ci] += coef[0]
                        coef_r = [0] * 64
                        coef_r[0] = pred[ci] * qt[c["tq"]][0]
                        for z in range(1, 64):
                            if coef[z]:
                                coef_r[_JPEG_ZIGZAG[z]] = coef[z] * qt[c["tq"]][z]
                        block = _jpeg_idct_block(coef_r)
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        stride = c["bw"] * 8
                        pl = planes[ci]
                        for yy in range(8):
                            row = (oy + yy) * stride + ox
                            pl[row : row + 8] = bytes(block[yy * 8 : yy * 8 + 8])
            mcu_count += 1
    # assemble output: nearest-neighbor upsample + color convert
    if len(comps) == 1:
        c = comps[0]
        stride = c["bw"] * 8
        pl = planes[0]
        out = bytearray(w * h)
        for y in range(h):
            sy = y * c["v"] // vmax
            out[y * w : (y + 1) * w] = bytes(
                pl[sy * stride + (x * c["h"] // hmax)] for x in range(w)
            )
        return {"width": w, "height": h, "channels": 1, "pixels": bytes(out)}
    out = bytearray(w * h * 3)
    strides = [c["bw"] * 8 for c in comps]
    for y in range(h):
        rows = [planes[i][(y * comps[i]["v"] // vmax) * strides[i] :] for i in range(3)]
        o = y * w * 3
        for x in range(w):
            yv = rows[0][x * comps[0]["h"] // hmax]
            cb = rows[1][x * comps[1]["h"] // hmax] - 128
            cr = rows[2][x * comps[2]["h"] // hmax] - 128
            r = int(yv + 1.402 * cr + 0.5) if yv + 1.402 * cr > 0 else 0
            g = int(yv - 0.344136 * cb - 0.714136 * cr + 0.5)
            b = int(yv + 1.772 * cb + 0.5) if yv + 1.772 * cb > 0 else 0
            out[o] = 255 if r > 255 else (0 if r < 0 else r)
            out[o + 1] = 255 if g > 255 else (0 if g < 0 else g)
            out[o + 2] = 255 if b > 255 else (0 if b < 0 else b)
            o += 3
    return {"width": w, "height": h, "channels": 3, "pixels": bytes(out)}


def _jpeg_decode_block(reader, dct, act, q):
    """One 8x8 block's ZIGZAG-order coefficients (DC as DIFF, undequantized)."""
    t = _jpeg_huff_decode(reader, dct)
    if t is None or t > 15:
        return None
    if t == 0:
        diff = 0
    else:
        raw = reader.bits(t)
        if raw is None:
            return None
        diff = _jpeg_extend(raw, t)
    coef = [0] * 64
    coef[0] = diff
    k = 1
    while k < 64:
        rs = _jpeg_huff_decode(reader, act)
        if rs is None:
            return None
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            return None
        raw = reader.bits(size)
        if raw is None:
            return None
        coef[k] = _jpeg_extend(raw, size)
        k += 1
    return coef


def decode_image_pixels(content: bytes | None) -> dict | None:
    """Format-dispatching stdlib pixel decode: PNG (decode_png_pixels)
    or baseline JPEG (decode_jpeg_pixels) by magic bytes; None for
    anything else — the default decoder for perceptual_hash_images, so
    the dominant two crawl-image formats hash without any codec
    library."""
    if not content:
        return None
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(content)
    if content[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(content)
    return None

def pixel_decode(content: bytes, width: int, height: int) -> tuple[int, int, str]:
    """decode_fn for ``decode_images`` that FULLY decodes pixels (PNG via
    decode_png_pixels, baseline JPEG via decode_jpeg_pixels) and digests
    the reconstructed pixel buffer — the digest proves the real samples
    were unfiltered/inverse-transformed, not merely that the header was
    read. Unsupported content falls back to header_decode
    (header-derived dimensions, content digest)."""
    import hashlib

    decoded = decode_image_pixels(content)
    if decoded is not None:
        return (
            decoded["width"],
            decoded["height"],
            hashlib.md5(decoded["pixels"]).hexdigest(),
        )
    return header_decode(content, width, height)


def header_decode(content: bytes, width: int, height: int) -> tuple[int, int, str]:
    """decode_fn for decode_images that reads dimensions from the REAL
    bytes (PNG IHDR via parse_media_header) instead of trusting caller
    metadata; non-PNG content falls back to the claimed metadata. Plugs
    the stdlib parser into the injectable codec hook so the Arrow decode
    path is exercised end-to-end on genuine image bytes."""
    import hashlib

    digest = hashlib.md5(content or b"").hexdigest()
    meta = parse_media_header(content)
    if meta and meta["format"] == "png":
        return meta["width"], meta["height"], digest
    return width, height, digest


def require_real_codecs() -> None:
    """Production decode path for codec-requiring formats — not available
    in this environment.

    Decoded for real in-container: PNG headers AND pixels
    (parse_media_header / decode_png_pixels), BASELINE-sequential JPEG
    pixels (decode_jpeg_pixels, r6), and WAV integer PCM SAMPLES
    (decode_wav_samples → audio_features / perceptual_hash_audio).
    Progressive/arithmetic JPEG, compressed-audio codecs (mp3/aac/opus),
    resampling, and video frame extraction need an injected codec
    stack."""
    raise NotImplementedError(
        "progressive-JPEG/video/compressed-audio decoding needs a codec "
        "stack (e.g. Pillow/librosa/pyav) which is not installed here; "
        "inject a decode_fn into decode_images()/extract_features() or "
        "install codecs and wire them in (PNG pixels, baseline-JPEG "
        "pixels and WAV PCM samples decode stdlib-only via "
        "decode_png_pixels/decode_jpeg_pixels/decode_wav_samples)"
    )


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic synthetic media: content = utf-8 bytes of the text,
    metadata derived from its length. Stands in for a real binary column so
    the plumbing is exercised end-to-end."""
    length = F.length(F.col(text_col))
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        (length % 640 + 16).cast("int").alias("width"),
        (length % 480 + 16).cast("int").alias("height"),
        (length * 10).cast("long").alias("duration_ms"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).cast("binary").alias("content"),
        meta.alias("media"),
    )


def _fake_decode(content: bytes, width: int, height: int) -> tuple[int, int, str]:
    import hashlib

    return width, height, hashlib.md5(content or b"").hexdigest()


def decode_images(
    media: DataFrame,
    decode_fn: Callable[[bytes, int, int], tuple[int, int, str]] | None = None,
    batch_rows: int | None = None,
) -> DataFrame:
    """Arrow-batched decode over (doc_id, content, media) rows.

    ``decode_fn(content, width, height) -> (width, height, digest)`` is the
    injectable codec; the default is the deterministic fake (see module
    docstring — real decoding is stubbed in this environment).
    ``batch_rows`` caps the Arrow batch size — set it (e.g.
    MEDIA_BATCH_ROWS) when content is real multi-MB media so a batch fits
    in executor memory; leave None for Spark's default batching."""
    fn = decode_fn or _fake_decode
    _apply_batch_rows(media, batch_rows)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            decoded = [
                fn(c, w, h)
                for c, w, h in zip(pdf["content"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "content_md5": [d[2] for d in decoded],
                }
            )

    flat = media.select(
        "doc_id", "content", F.col("media.width").alias("width"), F.col("media.height").alias("height")
    )
    return flat.mapInPandas(run, DECODE_SCHEMA)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    embed_fn: Callable[[bytes, int], list[float]] | None = None,
) -> DataFrame:
    """Feature extraction (image embedding) over Arrow batches. The default
    embed_fn is a deterministic byte-histogram fake; a real deployment
    injects a model call here (batched — never per row)."""

    def _fake_embed(content: bytes, d: int) -> list[float]:
        buckets = [0] * d
        for b in content or b"":
            buckets[b % d] += 1
        total = float(sum(buckets)) or 1.0
        return [b / total for b in buckets]

    fn = embed_fn or _fake_embed

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": [fn(c, dim) for c in pdf["content"]],
                }
            )

    return media.select("doc_id", "content").mapInPandas(run, FEATURE_SCHEMA)


def plan_frame_samples(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per frame timestamp.
    Pure Column expressions over metadata — the bytes are never touched, so
    this stays in whole-stage codegen and scales with row count, not byte
    size. The decode of each planned frame is then a batched UDF downstream."""
    vids = media.where(F.col("media.media_type").isin("video", "image"))
    n_frames = F.greatest((F.col("media.duration_ms") / every_ms).cast("int"), F.lit(1))
    return vids.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select("doc_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))


# ---------------------------------------------------------------------------
# Perceptual image hashing + near-dup pairs: the image-side counterpart
# of text SimHash. dHash/aHash over REAL decoded pixels (decode_png_pixels)
# — brightness shifts and small crops move only a few bits, so banded
# Hamming blocking (operators.dedup.banded_hamming_pairs) finds
# re-encoded / slightly-edited copies without an all-pairs join.

PHASH_SCHEMA = "doc_id long, dhash long, ahash long, decoded boolean"


def _luma_grid(
    pixels: bytes, width: int, height: int, channels: int, gw: int, gh: int
) -> list[list[int]]:
    """Exact-integer box-averaged luma grid (gh rows × gw cols).

    Luma is ITU-R BT.601 in integer thousandths ((299R + 587G + 114B)
    // 1000); alpha channels are ignored. Tile boundaries are the
    floor-divided index ranges (clamped to at least one source pixel,
    so tiny images still hash), and each tile value is the integer mean
    of its luma values — no floats anywhere, so the grid (and every
    hash derived from it) is bit-stable across platforms."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels >= 3:
        luma = (
            299 * arr[:, :, 0].astype(np.int64)
            + 587 * arr[:, :, 1].astype(np.int64)
            + 114 * arr[:, :, 2].astype(np.int64)
        ) // 1000
    else:  # grayscale / gray+alpha: channel 0 is the gray sample
        luma = arr[:, :, 0].astype(np.int64)
    grid = []
    for ty in range(gh):
        y0, y1 = ty * height // gh, max((ty + 1) * height // gh, ty * height // gh + 1)
        row = []
        for tx in range(gw):
            x0, x1 = tx * width // gw, max((tx + 1) * width // gw, tx * width // gw + 1)
            block = luma[y0:y1, x0:x1]
            row.append(int(block.sum()) // block.size)
        grid.append(row)
    return grid


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash_int(
    pixels: bytes, width: int, height: int, channels: int, hash_size: int = 8
) -> int:
    """Difference hash: ``hash_size``×``hash_size`` bits, bit (y, x) set
    when tile (y, x) is strictly brighter than its right neighbor on a
    ``(hash_size+1)``-wide luma grid. Invariant under global brightness
    shifts (differences are unchanged short of clipping) — the property
    that makes it the near-dup signature of choice for re-encoded
    images. Returned as signed 64-bit (Spark LongType)."""
    grid = _luma_grid(pixels, width, height, channels, hash_size + 1, hash_size)
    bits = 0
    for y in range(hash_size):
        for x in range(hash_size):
            bits = (bits << 1) | (1 if grid[y][x] > grid[y][x + 1] else 0)
    return _to_signed64(bits)


def ahash_int(
    pixels: bytes, width: int, height: int, channels: int, hash_size: int = 8
) -> int:
    """Average hash: bit set when the tile is strictly brighter than the
    whole-grid integer mean. Cheaper but brightness-sensitive — kept as
    the second opinion / tie-breaking signature."""
    grid = _luma_grid(pixels, width, height, channels, hash_size, hash_size)
    total = sum(v for row in grid for v in row)
    mean = total // (hash_size * hash_size)
    bits = 0
    for y in range(hash_size):
        for x in range(hash_size):
            bits = (bits << 1) | (1 if grid[y][x] > mean else 0)
    return _to_signed64(bits)


def perceptual_hash_images(
    media: DataFrame,
    hash_size: int = 8,
    decode: Callable[[bytes], dict | None] | None = None,
    batch_rows: int | None = None,
) -> DataFrame:
    """Arrow-batched perceptual hashes over (doc_id, content) rows:
    (doc_id, dhash, ahash, decoded). Rows whose bytes don't decode
    (non-PNG without an injected codec, hostile streams) yield NULL
    hashes with decoded = false — they fall out of pair generation but
    stay observable. ``decode`` defaults to the stdlib format
    dispatcher (PNG + baseline JPEG pixels); a production stack injects
    its codec here (same contract: bytes -> {width, height, channels,
    pixels})."""
    fn = decode or decode_image_pixels
    _apply_batch_rows(media, batch_rows)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, dh, ah, ok = [], [], [], []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                d = fn(bytes(content)) if content is not None else None
                ids.append(did)
                if d is None:
                    dh.append(None)
                    ah.append(None)
                    ok.append(False)
                else:
                    args = (d["pixels"], d["width"], d["height"], d["channels"])
                    dh.append(dhash_int(*args, hash_size))
                    ah.append(ahash_int(*args, hash_size))
                    ok.append(True)
            yield pd.DataFrame(
                {"doc_id": ids, "dhash": dh, "ahash": ah, "decoded": ok}
            )

    return media.select("doc_id", "content").mapInPandas(run, PHASH_SCHEMA)


def image_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    hash_size: int = 8,
    method: str = "dhash",
    decode: Callable[[bytes], dict | None] | None = None,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: hash every decodable image
    (one Arrow pass over the bytes), then banded Hamming blocking +
    exact bit_count verify on the chosen signature — the image analogue
    of dedup.simhash_near_pairs, sharing its pigeonhole recall bound
    (full recall while ``max_hamming`` <= ``bands`` - 1; the defaults
    keep that guarantee). Output: (doc_a, doc_b, hamming)."""
    from edna_dbt_library_spark.operators.dedup import banded_hamming_pairs

    if method not in ("dhash", "ahash"):
        raise ValueError(f"unknown perceptual hash method: {method}")
    sigs = perceptual_hash_images(media, hash_size, decode).where(F.col("decoded"))
    return banded_hamming_pairs(
        sigs,
        sig_col=method,
        bits=hash_size * hash_size,
        bands=bands,
        max_hamming=max_hamming,
    )


# ---------------------------------------------------------------------------
# WAV PCM SAMPLE decode + audio features/fingerprint: the audio
# counterpart of decode_png_pixels / dHash. RIFF/WAVE integer PCM is
# fully expressible with stdlib struct, so samples (not just headers)
# decode honestly in-container; compressed codecs (mp3/aac/opus) stay
# behind require_real_codecs.


def decode_wav_samples(content: bytes | None) -> dict | None:
    """Pure-stdlib WAV PCM sample decode: RIFF chunk walk (format 1 =
    integer PCM; 8/16/24/32-bit), channel-averaged (integer floor) to a
    mono sample list. Returns ``{"sample_rate", "channels", "n_frames",
    "samples"}`` or None for non-PCM / truncated / hostile streams —
    callers fall back to header metadata, same contract as the PNG
    decoder."""
    import struct

    if not content or content[:4] != b"RIFF" or len(content) < 12 or content[8:12] != b"WAVE":
        return None
    pos, fmt_tag, channels, rate, bits, data = 12, None, None, None, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None  # truncated
        if cid == b"fmt " and clen >= 16:
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt_tag != 1 or not channels or not rate or bits not in (8, 16, 24, 32) or data is None:
        return None
    bytes_per = bits // 8
    frame_size = bytes_per * channels
    n_frames = len(data) // frame_size
    samples: list[int] = []
    for f in range(n_frames):
        acc = 0
        base = f * frame_size
        for ch in range(channels):
            raw = data[base + ch * bytes_per : base + (ch + 1) * bytes_per]
            if bits == 8:  # WAV 8-bit is UNSIGNED, centered at 128
                v = raw[0] - 128
            else:
                v = int.from_bytes(raw, "little", signed=True)
            acc += v
        # floor-division mono mix (exact integer; order-independent)
        samples.append(acc // channels if acc >= 0 else -((-acc) // channels))
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "samples": samples,
    }


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_frames long, duration_ms long, "
    "rms long, peak long, zero_crossings long, decoded boolean"
)


def audio_features(media: DataFrame, batch_rows: int | None = None) -> DataFrame:
    """Arrow-batched SAMPLE-derived audio statistics per (doc_id,
    content) row: exact integer RMS (isqrt of mean square), peak
    amplitude, zero-crossing count, duration from the real frame count.
    Undecodable rows keep NULL stats with decoded = false."""
    _apply_batch_rows(media, batch_rows)

    def run(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "n_frames", "duration_ms",
                "rms", "peak", "zero_crossings", "decoded",
            )}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                d = decode_wav_samples(bytes(content)) if content is not None else None
                out["doc_id"].append(did)
                if d is None or d["n_frames"] == 0:
                    for k in ("sample_rate", "n_frames", "duration_ms", "rms", "peak", "zero_crossings"):
                        out[k].append(None)
                    out["decoded"].append(False)
                    continue
                s = d["samples"]
                out["sample_rate"].append(d["sample_rate"])
                out["n_frames"].append(d["n_frames"])
                out["duration_ms"].append(d["n_frames"] * 1000 // d["sample_rate"])
                out["rms"].append(math.isqrt(sum(v * v for v in s) // len(s)))
                out["peak"].append(max(abs(v) for v in s))
                out["zero_crossings"].append(
                    sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
                )
                out["decoded"].append(True)
            yield pd.DataFrame(out)

    return media.select("doc_id", "content").mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def audio_fingerprint_int(samples: list[int], n_bits: int = 64) -> int:
    """Energy-delta fingerprint: split the mono samples into
    ``n_bits + 1`` equal frames (floor boundaries, clamped non-empty),
    frame energy = exact integer sum of squares, bit i set when frame
    i+1 is strictly louder than frame i. Volume scaling multiplies all
    energies by the same positive factor, so the comparisons — and the
    fingerprint — are invariant, the audio analogue of dHash's
    brightness invariance. Signed 64-bit (Spark LongType)."""
    n = len(samples)
    frames = n_bits + 1
    energies = []
    for i in range(frames):
        lo, hi = i * n // frames, max((i + 1) * n // frames, i * n // frames + 1)
        energies.append(sum(v * v for v in samples[lo:hi]))
    bits = 0
    for i in range(n_bits):
        bits = (bits << 1) | (1 if energies[i + 1] > energies[i] else 0)
    return _to_signed64(bits)


AUDIO_PHASH_SCHEMA = "doc_id long, afp long, decoded boolean"


def perceptual_hash_audio(
    media: DataFrame, n_bits: int = 64, batch_rows: int | None = None
) -> DataFrame:
    """Arrow-batched audio fingerprints over (doc_id, content):
    (doc_id, afp, decoded); non-PCM rows yield NULL with decoded=false."""
    _apply_batch_rows(media, batch_rows)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, fps, ok = [], [], []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                d = decode_wav_samples(bytes(content)) if content is not None else None
                ids.append(did)
                if d is None or d["n_frames"] == 0:
                    fps.append(None)
                    ok.append(False)
                else:
                    fps.append(audio_fingerprint_int(d["samples"], n_bits))
                    ok.append(True)
            yield pd.DataFrame({"doc_id": ids, "afp": fps, "decoded": ok})

    return media.select("doc_id", "content").mapInPandas(run, AUDIO_PHASH_SCHEMA)


def audio_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    n_bits: int = 64,
) -> DataFrame:
    """Audio near-duplicate pairs: fingerprint every decodable PCM row,
    then the shared banded-Hamming blocking
    (operators.dedup.banded_hamming_pairs) — full recall while
    ``max_hamming`` <= ``bands`` - 1. Catches re-encoded / re-leveled
    copies of the same recording without an all-pairs join."""
    from edna_dbt_library_spark.operators.dedup import banded_hamming_pairs

    sigs = perceptual_hash_audio(media, n_bits).where(F.col("decoded"))
    return banded_hamming_pairs(
        sigs, sig_col="afp", bits=n_bits, bands=bands, max_hamming=max_hamming
    )


def luma_histogram_embed(
    pixels: bytes, width: int, height: int, channels: int, bins: int = 32
) -> list[float]:
    """REAL image embedding from decoded pixels: L1-normalized luma
    histogram (``bins`` buckets over 0..255). Stdlib+numpy only — the
    honest in-container counterpart of the injectable model embedder in
    ``extract_features``: coarse but real content signal (palette /
    exposure / structure mass), good enough to drive the embedding
    dedup/ANN machinery end-to-end on actual pixels."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels >= 3:
        luma = (
            299 * arr[:, :, 0].astype(np.int64)
            + 587 * arr[:, :, 1].astype(np.int64)
            + 114 * arr[:, :, 2].astype(np.int64)
        ) // 1000
    else:
        luma = arr[:, :, 0].astype(np.int64)
    counts = np.bincount((luma.ravel() * bins) // 256, minlength=bins)[:bins]
    total = float(counts.sum()) or 1.0
    return [float(c) / total for c in counts]


def image_feature_embeddings(
    media: DataFrame,
    bins: int = 32,
    decode: Callable[[bytes], dict | None] | None = None,
    batch_rows: int | None = None,
) -> DataFrame:
    """Arrow-batched REAL image features over (doc_id, content):
    (doc_id, embedding array<float>, decoded) — decoded pixels (PNG or
    baseline JPEG via decode_image_pixels) → luma histogram, ready for
    the embedding operators (semantic_dedup, brute_force_topk,
    cell_outliers) with id_col='doc_id', vec_col='embedding'.
    Undecodable rows keep NULL embeddings with decoded=false, same
    contract (and same default decoder) as perceptual_hash_images."""
    fn = decode or decode_image_pixels
    _apply_batch_rows(media, batch_rows)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, embs, ok = [], [], []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                d = fn(bytes(content)) if content is not None else None
                ids.append(did)
                if d is None:
                    embs.append(None)
                    ok.append(False)
                else:
                    embs.append(
                        luma_histogram_embed(
                            d["pixels"], d["width"], d["height"], d["channels"], bins
                        )
                    )
                    ok.append(True)
            yield pd.DataFrame({"doc_id": ids, "embedding": embs, "decoded": ok})

    return media.select("doc_id", "content").mapInPandas(
        run, "doc_id long, embedding array<float>, decoded boolean"
    )

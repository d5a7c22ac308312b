"""Streaming incremental append (checkpointed, crash-safe) and multimodal
binary-column plumbing (schema, batching, determinism)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.multimodal import (
    DECODE_SCHEMA,
    attach_fake_media,
    decode_images,
    extract_features,
    plan_frame_samples,
    require_real_codecs,
)
from edna_dbt_library_spark.operators.materializations import PartitionSpec
from edna_dbt_library_spark.sources.tables import load_table
from edna_dbt_library_spark.streaming import stream_incremental_append, stream_windowed_counts

SF = "/root/testdata/sf0.001"


def test_stream_incremental_append_drains_and_resumes(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    tgt_dir = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, SF, "events")
    schema = events.schema

    # first micro-drain: half the data
    events.where(F.col("ts") <= "2024-01-15").write.parquet(src_dir, mode="overwrite")
    q = stream_incremental_append(
        spark, src_dir, schema, tgt_dir, ckpt, partition_by=PartitionSpec("ts")
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(tgt_dir).count()
    exp1 = events.where(F.col("ts") <= "2024-01-15").count()
    assert n1 == exp1

    # append more source files; the checkpoint (the streaming watermark)
    # makes the second drain process ONLY the new files
    events.where(F.col("ts") > "2024-01-15").write.parquet(src_dir, mode="append")
    q2 = stream_incremental_append(
        spark, src_dir, schema, tgt_dir, ckpt, partition_by=PartitionSpec("ts")
    )
    q2.awaitTermination(120)
    n2 = spark.read.parquet(tgt_dir).count()
    assert n2 == events.count()
    # day-partitioned layout on disk
    import os

    assert any(d.startswith("_pdate=") for d in os.listdir(tgt_dir))


def test_stream_windowed_counts_semantics_in_batch(spark):
    """The windowed-agg transformation is testable in batch mode (same
    logical plan Structured Streaming runs incrementally)."""
    events = load_table(spark, SF, "events")
    out = stream_windowed_counts(events, window_duration="1 hour", watermark_delay="2 hours")
    rows = out.collect()
    assert out.columns == ["window_start", "window_end", "event_type", "n_events", "sum_value"]
    total = sum(r["n_events"] for r in rows)
    assert total == events.count()
    # window bounds are aligned hours
    assert all(r["window_start"].minute == 0 and (r["window_end"] - r["window_start"]) == dt.timedelta(hours=1) for r in rows)


def test_attach_and_decode_images(spark):
    docs = load_table(spark, SF, "documents").limit(100)
    media = attach_fake_media(docs)
    assert [f.name for f in media.schema.fields] == ["doc_id", "content", "media"]
    decoded = decode_images(media)
    assert decoded.schema == DECODE_SCHEMA
    rows = decoded.collect()
    assert len(rows) == 100
    # deterministic digest equals md5 of the utf-8 text
    import hashlib

    truth = {r["doc_id"]: hashlib.md5(r["text"].encode()).hexdigest() for r in docs.collect()}
    for r in rows:
        assert r["content_md5"] == truth[r["doc_id"]]
        assert r["n_bytes"] > 0


def test_extract_features_shape_and_determinism(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    media = attach_fake_media(docs)
    f1 = {r["doc_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    f2 = {r["doc_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    assert f1 == f2  # deterministic across runs
    assert all(len(v) == 8 for v in f1.values())
    assert all(abs(sum(v) - 1.0) < 1e-5 for v in f1.values())  # normalized histogram


def test_plan_frame_samples_pure_column(spark):
    docs = load_table(spark, SF, "documents").limit(10)
    media = attach_fake_media(docs)
    plan = plan_frame_samples(media, every_ms=500)
    rows = plan.collect()
    assert plan.columns == ["doc_id", "frame_idx", "frame_ts_ms"]
    # one doc's frame count matches its duration
    d0 = media.select("doc_id", "media.duration_ms").collect()[0]
    n0 = sum(1 for r in rows if r["doc_id"] == d0["doc_id"])
    assert n0 == max(d0["duration_ms"] // 500, 1)
    # no UDF in the plan (pure codegen path)
    assert "mapInPandas" not in plan._jdf.queryExecution().executedPlan().toString().lower().replace(" ", "")


def test_real_codec_stub_raises():
    with pytest.raises(NotImplementedError, match="decode"):
        require_real_codecs()


def _png_bytes(width: int, height: int, color_type: int = 2) -> bytes:
    """Minimal valid PNG written with stdlib only (struct + zlib CRCs):
    signature, IHDR, one zlib IDAT of zero scanlines, IEND."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = (b"\x00" + b"\x00" * (width * n_ch)) * height  # filter byte + pixels
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _wav_bytes(sample_rate: int, channels: int, bits: int, n_frames: int) -> bytes:
    """Minimal valid RIFF/WAVE (PCM) written with stdlib struct only."""
    import struct

    block_align = channels * bits // 8
    data = b"\x00" * (n_frames * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_probe_media_headers_real_bytes(spark):
    """The Arrow decode path runs on REAL container bytes: stdlib-built
    PNG/WAV files round-trip through probe_media_headers bit-exactly."""
    import hashlib

    from edna_dbt_library_spark.operators.multimodal import (
        PROBE_SCHEMA,
        probe_media_headers,
    )

    png = _png_bytes(640, 360, color_type=2)
    wav = _wav_bytes(16000, 1, 16, 8000)  # exactly 500 ms of mono PCM
    junk = b"not a media file at all"
    media = spark.createDataFrame(
        [(1, png), (2, wav), (3, junk), (4, None)],
        "doc_id long, content binary",
    )
    out = probe_media_headers(media, batch_rows=2)
    assert out.schema == PROBE_SCHEMA
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4
    p = rows[1]
    assert (p["format"], p["width"], p["height"], p["channels"]) == ("png", 640, 360, 3)
    assert p["content_md5"] == hashlib.md5(png).hexdigest() and p["n_bytes"] == len(png)
    w = rows[2]
    assert (w["format"], w["channels"], w["sample_rate"], w["duration_ms"]) == ("wav", 1, 16000, 500)
    assert rows[3]["format"] == "unknown" and rows[3]["width"] is None
    assert rows[4]["format"] == "unknown" and rows[4]["n_bytes"] == 0


def test_decode_images_with_stdlib_header_codec(spark):
    """header_decode injected into the decode_images hook: dimensions come
    from the real PNG IHDR, overriding (wrong) claimed metadata; non-PNG
    rows fall back to the claimed metadata."""
    from edna_dbt_library_spark.operators.multimodal import header_decode

    png = _png_bytes(31, 17, color_type=6)
    meta = {"media_type": "image", "format": "png", "width": 999, "height": 999, "duration_ms": 0}
    media = spark.createDataFrame(
        [(1, png, meta), (2, b"opaque", {**meta, "format": "bin", "width": 5, "height": 6})],
        "doc_id long, content binary, media struct<media_type:string,format:string,width:int,height:int,duration_ms:long>",
    )
    rows = {r["doc_id"]: r for r in decode_images(media, decode_fn=header_decode).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (31, 17)  # parsed, not claimed
    assert (rows[2]["width"], rows[2]["height"]) == (5, 6)  # fallback to claimed


def _encode_png(
    pixels: bytes,
    width: int,
    height: int,
    color_type: int,
    filters: list[int] | None = None,
    palette: bytes | None = None,
) -> bytes:
    """Full stdlib PNG encoder for test vectors: applies the chosen filter
    type per scanline (forward direction of PNG spec §9), so the decoder's
    unfilter path is exercised on every filter type, not just None."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    stride = width * n_ch
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        filt = bytearray(line)
        if f == 1:  # Sub
            for i in range(n_ch, stride):
                filt[i] = (line[i] - line[i - n_ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                filt[i] = (line[i] - prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - n_ch] if i >= n_ch else 0
                filt[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - n_ch] if i >= n_ch else 0
                b = prev[i]
                c = prev[i - n_ch] if i >= n_ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (line[i] - pr) & 0xFF
        raw += bytes([f]) + bytes(filt)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette)
    # split IDAT in two chunks to exercise concatenation
    comp = zlib.compress(bytes(raw))
    mid = len(comp) // 2
    return out + chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:]) + chunk(b"IEND", b"")


def _test_pixels(width: int, height: int, n_ch: int) -> bytes:
    return bytes((i * 31 + (i // (width * n_ch)) * 7) % 256 for i in range(width * height * n_ch))


def test_decode_png_pixels_roundtrip_all_filters():
    """Encoder applies every filter type (None/Sub/Up/Average/Paeth);
    decoder must reconstruct the exact pixel bytes for each color type."""
    from edna_dbt_library_spark.operators.multimodal import decode_png_pixels

    for color_type, n_ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
        w, h = 13, 11
        pixels = _test_pixels(w, h, n_ch)
        png = _encode_png(pixels, w, h, color_type, filters=[0, 1, 2, 3, 4])
        d = decode_png_pixels(png)
        assert d is not None, color_type
        assert (d["width"], d["height"], d["channels"]) == (w, h, n_ch)
        assert d["pixels"] == pixels, f"pixel mismatch for color_type={color_type}"


def test_decode_png_pixels_palette_and_rejects():
    from edna_dbt_library_spark.operators.multimodal import decode_png_pixels

    # palette image: indices expand through PLTE to RGB
    palette = bytes(range(48))  # 16 RGB entries
    idx = bytes(i % 16 for i in range(7 * 5))
    png = _encode_png(idx, 7, 5, 3, filters=[0, 1, 2], palette=palette)
    d = decode_png_pixels(png)
    assert d is not None and d["channels"] == 3
    expect = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert d["pixels"] == expect

    # non-baseline and hostile streams return None, never raise
    assert decode_png_pixels(None) is None
    assert decode_png_pixels(b"not png") is None
    good = _encode_png(_test_pixels(4, 4, 3), 4, 4, 2)
    assert decode_png_pixels(good[:40]) is None  # truncated
    interlaced = bytearray(good)
    interlaced[28] = 1  # IHDR interlace flag
    assert decode_png_pixels(bytes(interlaced)) is None
    bit16 = bytearray(good)
    bit16[24] = 16  # IHDR bit depth
    assert decode_png_pixels(bytes(bit16)) is None


def test_decode_images_real_png_pixels_on_spark(spark):
    """decode_images with pixel_decode digests the DECODED pixel buffer of
    a real PNG end-to-end through the Arrow path — proof the engine
    reconstructs actual samples in-container, not just headers."""
    import hashlib

    from edna_dbt_library_spark.operators.multimodal import pixel_decode

    w, h = 19, 9
    pixels = _test_pixels(w, h, 3)
    png = _encode_png(pixels, w, h, 2, filters=[4, 3, 2, 1, 0])
    meta = {"media_type": "image", "format": "png", "width": 999, "height": 999, "duration_ms": 0}
    media = spark.createDataFrame(
        [(1, png, meta), (2, b"opaque", {**meta, "format": "bin", "width": 5, "height": 6})],
        "doc_id long, content binary, media struct<media_type:string,format:string,width:int,height:int,duration_ms:long>",
    )
    rows = {r["doc_id"]: r for r in decode_images(media, decode_fn=pixel_decode).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (w, h)
    assert rows[1]["content_md5"] == hashlib.md5(pixels).hexdigest()  # digest of PIXELS
    assert (rows[2]["width"], rows[2]["height"]) == (5, 6)  # non-PNG falls back


def test_probe_media_headers_hostile_dimensions_dont_fail_job(spark):
    """A hostile PNG IHDR with width > 2^31-1 (unsigned 32-bit) must read
    as 'unknown', not blow up the Arrow int32 conversion inside
    mapInPandas and fail the whole ingest."""
    import struct
    import zlib

    from edna_dbt_library_spark.operators.multimodal import probe_media_headers

    ihdr = struct.pack(">IIBBBBB", 0x80000001, 17, 8, 2, 0, 0, 0)
    hostile = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    media = spark.createDataFrame(
        [(1, hostile), (2, _png_bytes(8, 8))], "doc_id long, content binary"
    )
    rows = {r["doc_id"]: r for r in probe_media_headers(media).collect()}
    assert rows[1]["format"] == "unknown" and rows[1]["width"] is None
    assert rows[2]["format"] == "png"  # sane rows still parse


def test_curation_verdict_runs_under_structured_streaming(spark, tmp_path):
    """The fused curation verdict is stateless row-local Column algebra,
    so it runs UNCHANGED as a streaming transformation — no watermark,
    no stateful operator, no plan rewrite — and a drained stream equals
    the batch result bit-for-bit."""
    from edna_dbt_library_spark.operators.curation import curation_verdict

    docs = load_table(spark, SF, "documents").limit(60).select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)

    stream_in = spark.readStream.schema(docs.schema).parquet(src)
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        curation_verdict(stream_in)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    batch = sorted(map(tuple, curation_verdict(spark.read.parquet(src)).collect()))
    assert streamed == batch and len(streamed) == 60


# ---------------------------------------------------------------------------
# Perceptual image dedup (multimodal.perceptual_hash_images /
# image_near_dup_pairs): dHash/aHash over REAL decoded PNG pixels,
# banded-Hamming blocking from operators.dedup.banded_hamming_pairs.


def _png_rgb(width: int, height: int, pix) -> bytes:
    """Valid PNG (color type 2, filter 0 scanlines) with REAL pixel
    content from ``pix(x, y) -> (r, g, b)`` — stdlib only."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for y in range(height):
        raw.append(0)
        for x in range(width):
            raw.extend(pix(x, y))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _grad(x, y):
    return ((x * 200) // 64, (y * 200) // 64, ((x + y) * 100) // 64)


def _grad_bright(x, y):
    return tuple(v + 4 for v in _grad(x, y))


def _grad_shift(x, y):
    return _grad(min(x + 1, 63), y)


def _noise(x, y):
    v = (x * 31 + y * 17) * 2654435761 % 2**32
    return (v % 251, (v >> 8) % 251, (v >> 16) % 251)


def test_dhash_properties_on_decoded_pixels():
    """dHash over real decoded PNG pixels: brightness shifts are
    invariant (difference hash), a 1-px shift moves few bits, unrelated
    noise is far; aHash is brightness-sensitive but stable."""
    from edna_dbt_library_spark.operators.multimodal import (
        ahash_int,
        decode_png_pixels,
        dhash_int,
    )

    def h(pix):
        d = decode_png_pixels(_png_rgb(64, 64, pix))
        assert d is not None and len(d["pixels"]) == 64 * 64 * 3
        a = (d["pixels"], d["width"], d["height"], d["channels"])
        return dhash_int(*a), ahash_int(*a)

    d_base, a_base = h(_grad)
    d_bright, _ = h(_grad_bright)
    d_shift, _ = h(_grad_shift)
    d_noise, a_noise = h(_noise)

    def ham(u, v):
        return bin((u ^ v) & (2**64 - 1)).count("1")

    assert ham(d_base, d_bright) == 0  # brightness-invariant
    assert ham(d_base, d_shift) <= 12  # small perturbation, few bits
    assert ham(d_base, d_noise) >= 16  # unrelated content is far
    assert a_base != a_noise


def test_perceptual_hash_images_arrow_path(spark):
    """The distributed Arrow path returns exactly the driver-side hashes;
    non-PNG and NULL content yield NULL hashes with decoded=false."""
    from edna_dbt_library_spark.operators.multimodal import (
        decode_png_pixels,
        dhash_int,
        perceptual_hash_images,
    )

    base = _png_rgb(64, 64, _grad)
    noise = _png_rgb(64, 64, _noise)
    df = spark.createDataFrame(
        [(1, base), (2, noise), (3, b"not a png"), (4, None)],
        "doc_id long, content binary",
    ).repartition(3)
    rows = {r["doc_id"]: r for r in perceptual_hash_images(df).collect()}
    d = decode_png_pixels(base)
    assert rows[1]["dhash"] == dhash_int(
        d["pixels"], d["width"], d["height"], d["channels"]
    )
    assert rows[1]["decoded"] and rows[2]["decoded"]
    assert not rows[3]["decoded"] and rows[3]["dhash"] is None
    assert not rows[4]["decoded"] and rows[4]["ahash"] is None
    plan = perceptual_hash_images(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_image_near_dup_pairs_finds_planted_duplicates(spark):
    """Planted brightness-perturbed copies pair with their originals;
    unrelated images don't; and within the pigeonhole guarantee
    (max_hamming <= bands-1) banded blocking equals the exhaustive
    all-pairs answer computed driver-side."""
    from edna_dbt_library_spark.operators.multimodal import (
        image_near_dup_pairs,
        perceptual_hash_images,
    )

    imgs = [
        (1, _png_rgb(64, 64, _grad)),
        (2, _png_rgb(64, 64, _grad_bright)),  # near-dup of 1 (hamming 0)
        (3, _png_rgb(64, 64, _noise)),
        (4, _png_rgb(48, 32, lambda x, y: ((x * 5) % 200, (y * 7) % 200, 30))),
        (5, b"junk bytes"),  # undecodable: must not appear in pairs
    ]
    df = spark.createDataFrame(imgs, "doc_id long, content binary")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_near_dup_pairs(df, max_hamming=3, bands=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert all(5 not in p for p in pairs)

    # exhaustive reference over the collected hashes
    hs = {
        r["doc_id"]: r["dhash"] & (2**64 - 1)
        for r in perceptual_hash_images(df).collect()
        if r["decoded"]
    }
    expect = {
        (a, b): bin(hs[a] ^ hs[b]).count("1")
        for a in hs
        for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 3
    }
    assert pairs == expect


# ---------------------------------------------------------------------------
# WAV PCM sample decode + audio features/fingerprints
# (multimodal.decode_wav_samples / audio_features / audio_near_dup_pairs)


def _wav_pcm(samples_per_channel, rate=8000, bits=16):
    """Valid RIFF/WAVE integer PCM with REAL sample content.
    ``samples_per_channel`` is a list of per-channel sample lists."""
    import struct

    channels = len(samples_per_channel)
    n = len(samples_per_channel[0])
    data = bytearray()
    for f in range(n):
        for ch in range(channels):
            v = samples_per_channel[ch][f]
            if bits == 8:
                data.append((v + 128) & 0xFF)  # 8-bit WAV is unsigned
            else:
                data += int(v).to_bytes(bits // 8, "little", signed=True)
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _tone(n, period, amp, phase=0, env=(1, 3, 2, 5, 4)):
    """Deterministic integer square wave under a stepped loudness
    envelope — the envelope PATTERN is what the energy-delta
    fingerprint sees, so different patterns give distant prints."""
    return [
        (amp if ((i + phase) // period) % 2 == 0 else -amp) * env[(i // 100) % len(env)]
        for i in range(n)
    ]


def test_decode_wav_samples_roundtrip_and_mix():
    from edna_dbt_library_spark.operators.multimodal import decode_wav_samples

    left = [0, 100, -100, 32000, -32000, 7]
    right = [10, -100, 100, 32000, -32000, 8]
    d = decode_wav_samples(_wav_pcm([left, right], rate=16000))
    assert (d["sample_rate"], d["channels"], d["n_frames"]) == (16000, 2, 6)
    # integer mono mix, truncation toward zero
    assert d["samples"] == [5, 0, 0, 32000, -32000, 7]
    # mono 16-bit roundtrips exactly
    assert decode_wav_samples(_wav_pcm([left]))["samples"] == left
    # 8-bit unsigned recenters at 128
    d8 = decode_wav_samples(_wav_pcm([[0, 127, -128]], bits=8))
    assert d8["samples"] == [0, 127, -128]
    # junk and non-PCM refuse politely
    assert decode_wav_samples(b"not audio") is None
    assert decode_wav_samples(None) is None


def test_audio_features_hand_check(spark):
    import math

    from edna_dbt_library_spark.operators.multimodal import audio_features

    s = [1000, -1000] * 400  # 800 frames at 8000 Hz -> 100 ms
    df = spark.createDataFrame(
        [(1, _wav_pcm([s])), (2, b"junk"), (3, None)], "doc_id long, content binary"
    )
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    r1 = rows[1]
    assert r1["decoded"] and r1["n_frames"] == 800 and r1["duration_ms"] == 100
    assert r1["peak"] == 1000 and r1["rms"] == math.isqrt(1000 * 1000)
    assert r1["zero_crossings"] == 799  # alternates every sample
    assert not rows[2]["decoded"] and rows[2]["rms"] is None
    assert not rows[3]["decoded"]


def test_audio_fingerprint_volume_invariance():
    from edna_dbt_library_spark.operators.multimodal import (
        audio_fingerprint_int,
        decode_wav_samples,
    )

    base = _tone(6500, 13, 800)
    louder = [v * 2 for v in base]  # exact 2x gain, no clipping
    other = _tone(6500, 57, 800, phase=29, env=(5, 4, 3, 2, 1))
    fp = lambda s: audio_fingerprint_int(s) & (2**64 - 1)
    assert fp(base) == fp(louder)  # volume-invariant
    dist = bin(fp(base) ^ fp(other)).count("1")
    assert dist >= 10
    # the fingerprint survives the WAV encode/decode roundtrip
    assert fp(decode_wav_samples(_wav_pcm([base]))["samples"]) == fp(base)


def test_audio_near_dup_pairs_finds_releveled_copy(spark):
    from edna_dbt_library_spark.operators.multimodal import (
        audio_near_dup_pairs,
        perceptual_hash_audio,
    )

    base = _tone(6500, 13, 800)
    rows = [
        (1, _wav_pcm([base])),
        (2, _wav_pcm([[v * 2 for v in base]])),  # re-leveled copy of 1
        (3, _wav_pcm([_tone(6500, 57, 800, phase=29, env=(5, 4, 3, 2, 1))])),
        (4, _wav_pcm([_tone(6500, 101, 500, phase=3, env=(1, 2, 3, 4, 5))])),
        (5, b"not audio"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in audio_near_dup_pairs(df, max_hamming=3, bands=4).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert all(5 not in p for p in pairs)
    # banded blocking equals the exhaustive answer within the pigeonhole bound
    hs = {
        r["doc_id"]: r["afp"] & (2**64 - 1)
        for r in perceptual_hash_audio(df).collect()
        if r["decoded"]
    }
    expect = {
        (a, b): bin(hs[a] ^ hs[b]).count("1")
        for a in hs for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 3
    }
    assert pairs == expect


def test_image_feature_embeddings_feed_semantic_dedup(spark):
    """Real pixel features bridge into the embedding operators: decoded
    luma histograms of near-identical images collapse under
    semantic_dedup, structurally different images survive."""
    from edna_dbt_library_spark.operators.multimodal import (
        image_feature_embeddings,
        luma_histogram_embed,
        decode_png_pixels,
    )
    from edna_dbt_library_spark.operators.similarity import semantic_dedup

    imgs = [
        (1, _png_rgb(64, 64, _grad)),
        (2, _png_rgb(64, 64, _grad)),         # identical content
        (3, _png_rgb(64, 64, _noise)),
        (4, b"junk"),
    ]
    df = spark.createDataFrame(imgs, "doc_id long, content binary")
    feats = image_feature_embeddings(df)
    rows = {r["doc_id"]: r for r in feats.collect()}
    d = decode_png_pixels(imgs[0][1])
    expect = luma_histogram_embed(d["pixels"], 64, 64, 3)
    assert [round(v, 6) for v in rows[1]["embedding"]] == [round(v, 6) for v in expect]
    assert abs(sum(rows[1]["embedding"]) - 1.0) < 1e-6
    assert rows[1]["embedding"] == rows[2]["embedding"]
    assert rows[1]["embedding"] != rows[3]["embedding"]
    assert not rows[4]["decoded"] and rows[4]["embedding"] is None

    verdict = semantic_dedup(
        feats.where("decoded"), n_cells=2, iters=1, threshold=0.999, id_col="doc_id"
    )
    v = {r["vec_id"]: r["keep"] for r in verdict.collect()}
    assert v[1] and not v[2]  # identical histograms collapse to min id
    assert v[3]


def test_stream_table_warehouse_source_drains_and_resumes(spark, tmp_path):
    """stream_table(): a warehouse table is a streaming source — an
    availableNow drain lands exactly the table's rows (including the
    _pdate layout from the sidecar schema), and after an append a
    restarted stream processes ONLY the newly landed files."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse
    from edna_dbt_library_spark.streaming import stream_table

    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel = wh.relation("s", "t")
    base = spark.range(6).select(
        F.col("id"),
        F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1).cast("string")).alias("_pdate"),
        (F.col("id") * 10).alias("v"),
    )
    wh.create_as(rel, base, TableMeta(partition_by="_pdate"))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            stream_table(wh, rel, max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = spark.read.parquet(out)
    # sidecar schema is authoritative (string _pdate, as written); the
    # batch read infers date from the dirs — compare value-normalized
    norm = lambda df: sorted(
        map(tuple, df.select("id", F.col("_pdate").cast("string"), "v").collect())
    )
    assert norm(got) == norm(wh.read(rel))

    wh.append(rel, spark.createDataFrame([(100, "2024-01-04", 1000)],
                                         "id long, _pdate string, v long"))
    drain()
    assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == [0, 1, 2, 3, 4, 5, 100]

    # no sidecar schema -> clear refusal
    import shutil as _sh, pytest as _pytest

    raw = wh.relation("s", "raw")
    spark.range(3).write.parquet(wh.path(raw))
    with _pytest.raises(ValueError, match="schema sidecar"):
        stream_table(wh, raw)


def test_stream_interval_join_equals_batch_attribution(spark, tmp_path):
    """Stream-stream watermarked interval join (r8): clicks and
    purchases drained as two file streams, purchases attributed to
    same-user clicks in the preceding 2 hours — the drained result must
    equal the direct batch inequality join row-for-row (the
    range_attribution semantics, streaming-native)."""
    from edna_dbt_library_spark.streaming import stream_interval_join

    ev = load_table(spark, SF, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c_src, p_src = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks.write.mode("overwrite").parquet(c_src)
    purchases.write.mode("overwrite").parquet(p_src)

    cs = spark.readStream.schema(spark.read.parquet(c_src).schema).parquet(c_src)
    ps = spark.readStream.schema(spark.read.parquet(p_src).schema).parquet(p_src)
    joined = stream_interval_join(
        cs, ps, key_col="user_id", left_ts="c_ts", right_ts="p_ts",
        max_delay="2 hours", watermark_delay="30 minutes",
    ).select("click_id", "purchase_id")
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = sorted(map(tuple, spark.read.parquet(out_dir).collect()))

    bc, bp = spark.read.parquet(c_src), spark.read.parquet(p_src)
    batch = sorted(
        map(
            tuple,
            bc.join(
                bp,
                (bc["user_id"] == bp["user_id"])
                & (bp["p_ts"] >= bc["c_ts"])
                & (bp["p_ts"] < bc["c_ts"] + F.expr("INTERVAL 2 HOURS")),
            )
            .select("click_id", "purchase_id")
            .collect(),
        )
    )
    assert streamed == batch and len(streamed) > 0


def test_stream_semantic_dedup_converges_to_batch_state(spark, tmp_path):
    """Streaming SemDeDup (r8): embeddings chopped into two micro-batches
    (even ids file, odd ids file, one file per trigger) must converge the
    persistent store to EXACTLY the state of the batch incremental
    operator run over the same two batches in the same order, and a full
    re-drain from a fresh checkpoint must admit nothing new."""
    from edna_dbt_library_spark.operators.similarity import (
        run_incremental_semantic_dedup,
    )
    from edna_dbt_library_spark.sources import Warehouse
    from edna_dbt_library_spark.streaming import stream_semantic_dedup

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    even = emb.where(F.col("vec_id") % 2 == 0)
    odd = emb.where(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "src")
    # two files, drained one per trigger in name order
    even.coalesce(1).write.mode("overwrite").parquet(src + "/b=0")
    odd.coalesce(1).write.mode("overwrite").parquet(src + "/b=1")

    s_wh = Warehouse(spark, str(tmp_path / "s_wh"))
    s_store = s_wh.relation("scratch", "sem")
    stream_in = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b=*")
    )
    q = stream_semantic_dedup(
        stream_in, s_wh, s_store,
        admitted_path=str(tmp_path / "admitted"),
        checkpoint_path=str(tmp_path / "cp"),
        threshold=0.3,
    )
    q.awaitTermination(300)

    b_wh = Warehouse(spark, str(tmp_path / "b_wh"))
    b_store = b_wh.relation("scratch", "sem")
    run_incremental_semantic_dedup(b_wh, b_store, even, threshold=0.3)
    run_incremental_semantic_dedup(b_wh, b_store, odd, threshold=0.3)

    s_rows = sorted((r["vec_id"], r["cell"]) for r in s_wh.read(s_store).collect())
    b_rows = sorted((r["vec_id"], r["cell"]) for r in b_wh.read(b_store).collect())
    assert s_rows == b_rows and 0 < len(s_rows) < emb.count()

    # re-drain with a FRESH checkpoint into the SAME admitted_path (an
    # at-least-once replay of already-committed batches): the operator
    # admits nothing, so the admitted_sink is skipped and the first
    # drain's committed subdirs survive untouched — ADVICE r8: the old
    # post-hoc overwrite replaced them with the replay's empty set.
    adm_path = str(tmp_path / "admitted") + "/batch=*"
    first = sorted(
        (r["vec_id"], r["cell"]) for r in spark.read.parquet(adm_path).collect()
    )
    assert first == s_rows  # sink content == everything admitted
    q2 = stream_semantic_dedup(
        stream_in, s_wh, s_store,
        admitted_path=str(tmp_path / "admitted"),
        checkpoint_path=str(tmp_path / "cp2"),
        threshold=0.3,
    )
    q2.awaitTermination(300)
    assert sorted((r["vec_id"], r["cell"]) for r in s_wh.read(s_store).collect()) == s_rows
    again = sorted(
        (r["vec_id"], r["cell"]) for r in spark.read.parquet(adm_path).collect()
    )
    assert again == first

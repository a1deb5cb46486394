"""Real media decode (functions/media_decode.py): pure-kernel round trips +
the Spark decode_media operator + strict-gate interaction."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from batch_doc_vqa_spark.functions import media_decode as md


def test_png_round_trip_all_channel_counts():
    rng = np.random.RandomState(7)
    for c in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(11, 9, c), dtype=np.uint8)
        back = md.decode_png(md.encode_png(px))
        assert np.array_equal(back, px)


def test_png_filters_reconstruct():
    """Decoder must undo ALL spec filters (0-4), not just the encoder's 0."""
    rng = np.random.RandomState(3)
    h, w, c = 7, 5, 3
    px = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8).astype(np.int64)
    stride = w * c
    flat = px.reshape(h, stride)
    rows, prev = [], np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = y % 5
        enc = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            left = flat[y, x - c] if x >= c else 0
            up, ul = prev[x], (prev[x - c] if x >= c else 0)
            if f == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            else:
                pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2}[f]
            enc[x] = (flat[y, x] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = flat[y]

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    png = (md.PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"".join(rows))) + chunk(b"IEND", b""))
    assert np.array_equal(md.decode_png(png), px.astype(np.uint8))


def test_probe_formats():
    png = md.encode_png(np.zeros((3, 4, 3), dtype=np.uint8))
    assert md.probe_bytes(png) == {"kind": "image/png", "width": 4, "height": 3, "duration_ms": 0}
    wav = md.encode_wav(np.zeros(8000, dtype=np.int16), rate=8000)
    assert md.probe_bytes(wav) == {"kind": "audio/wav", "width": 1, "height": 16, "duration_ms": 1000}
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 10
    assert md.probe_bytes(gif)["kind"] == "image/gif"
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 7, -9) + b"\x00" * 20
    assert md.probe_bytes(bmp) == {"kind": "image/bmp", "width": 7, "height": 9, "duration_ms": 0}
    jpg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
           + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 240, 320)
           + b"\x03\xff\xd9")
    assert md.probe_bytes(jpg) == {"kind": "image/jpeg", "width": 320, "height": 240, "duration_ms": 0}
    assert md.probe_bytes(b"not a media payload") is None


def test_bmp_round_trip_and_variants():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(9, 7, 3), dtype=np.uint8)  # stride padding path
    assert np.array_equal(md.decode_bmp(md.encode_bmp(px)), px)
    px4 = rng.randint(0, 256, size=(3, 4, 3), dtype=np.uint8)  # no padding (w*3 % 4 == 0)
    assert np.array_equal(md.decode_bmp(md.encode_bmp(px4)), px4)
    with pytest.raises(ValueError):
        md.decode_bmp(b"BM" + b"\x00" * 60)  # bpp=0 → unsupported variant
    with pytest.raises(ValueError):
        md.decode_bmp(md.encode_bmp(px)[:40])  # truncated


def test_bmp_top_down_matches_bottom_up():
    """Negative height = top-down row order per the public header spec."""
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    bu = bytearray(md.encode_bmp(px))
    # flip to top-down: negate height, reverse the two 8-byte rows (stride=8)
    struct.pack_into("<i", bu, 22, -2)
    off = 54
    bu[off : off + 8], bu[off + 8 : off + 16] = bu[off + 8 : off + 16], bu[off : off + 8]
    assert np.array_equal(md.decode_bmp(bytes(bu)), px)


def test_zero_framerate_wav_is_stub_not_crash():
    """Malformed fmt chunk with framerate=0: record-and-continue, never a
    task-killing ZeroDivisionError (ADVICE r3)."""
    wav = bytearray(md.encode_wav(np.zeros(100, dtype=np.int16), rate=8000))
    # RIFF fmt chunk: sample rate lives 4 bytes into the fmt payload body
    i = bytes(wav).index(b"fmt ") + 8 + 4
    struct.pack_into("<I", wav, i, 0)
    assert md.probe_bytes(bytes(wav)) is None  # falls back to stub path
    with pytest.raises(ValueError):
        md.audio_features(bytes(wav))


def test_resize_box_properties():
    rng = np.random.RandomState(1)
    px = rng.randint(0, 256, size=(64, 48, 3), dtype=np.uint8)
    out = md.resize_box(px, 16, 16)
    assert out.shape == (16, 12, 3)  # aspect preserved
    assert np.array_equal(md.resize_box(px, 100, 100), px)  # never upscale
    flat = np.full((10, 10, 1), 200, dtype=np.uint8)
    assert np.all(md.resize_box(flat, 3, 3) == 200)  # box mean of constant


def test_audio_features_sane():
    t = np.arange(8000)
    loud = md.audio_features(md.encode_wav((np.sin(t * 0.3) * 30000).astype(np.int16)))
    quiet = md.audio_features(md.encode_wav((np.sin(t * 0.3) * 1000).astype(np.int16)))
    assert loud[0] > quiet[0] and loud[1] > quiet[1]
    assert loud[3] == quiet[3] == 1.0  # duration sec
    assert loud[2] == pytest.approx(quiet[2], abs=0.01)  # same frequency


def test_spark_decode_media_real_vs_stub(spark):
    from batch_doc_vqa_spark.operators.multimodal import decode_media
    from batch_doc_vqa_spark.sources.media_fixture import media_df, media_row

    assert media_row(42, 3) == media_row(42, 3)
    out = {r["media_id"]: r for r in
           decode_media(media_df(spark, 24, seed=42), "media_id", "payload", "kind").collect()}
    assert len(out) == 24
    for i, r in out.items():
        i = int(i)
        if i % 8 in (0, 1, 2):   # png rows decode for real
            assert r["kind"] == "image/png" and r["decode_status"] == "ok"
            assert r["width"] >= 4 and r["height"] >= 4
        elif i % 8 == 3:         # wav rows decode for real
            assert r["kind"] == "audio/wav" and r["decode_status"] == "ok"
            assert r["duration_ms"] >= 100 and r["f0"] > 0  # rms
        elif i % 8 == 4:         # blobs fall back to the stub
            assert r["kind"] == "blob" and r["decode_status"] == "stub"
        elif i % 8 == 5:         # bmp rows decode full pixels
            assert r["kind"] == "image/bmp" and r["decode_status"] == "ok"
            assert r["f3"] > 0   # pixel std from real noise content
        else:                    # gif/jpeg: header probe only — real dims
            assert r["kind"] in ("image/gif", "image/jpeg")
            assert r["decode_status"] == "probe"
            assert r["width"] >= 4 and all(r[f"f{k}"] == 0.0 for k in range(8))


def test_gate_passes_real_decodes_quarantines_stubs(spark, tmp_path):
    from batch_doc_vqa_spark.operators.multimodal import probe_media
    from batch_doc_vqa_spark.plans import publish_run
    from batch_doc_vqa_spark.sources.media_fixture import media_df

    meta = probe_media(media_df(spark, 24, seed=42), "media_id", "payload", "kind")
    counts = publish_run(spark, meta, str(tmp_path / "p"), text_col=None,
                         decode_status_col="decode_status")
    # 24 rows mod 8 kinds: 9 png + 3 wav + 3 bmp publish; 3 blobs (stub) and
    # 3+3 gif/jpeg (probe-only) quarantine — with distinct reasons
    assert (counts["published"], counts["quarantined"]) == (15, 9)
    reasons = {r["reject_reason"] for r in
               spark.read.parquet(str(tmp_path / "p" / "quarantine")).collect()}
    assert reasons == {"stub_decode", "probe_only"}


def test_resize_and_frames_use_real_metadata(spark):
    import numpy as np

    from batch_doc_vqa_spark.operators.multimodal import resize_media, sample_frames

    png = md.encode_png(np.zeros((512, 1024, 3), dtype=np.uint8))
    wav = md.encode_wav(np.zeros(8000 * 12, dtype=np.int16), rate=8000)  # 12s
    df = spark.createDataFrame([("img", png), ("aud", wav)], "media_id string, payload binary")
    rs = {r["media_id"]: r for r in resize_media(df, "media_id", "payload", 256, 256).collect()}
    assert (rs["img"]["width"], rs["img"]["height"]) == (1024, 512)  # real dims
    assert (rs["img"]["out_w"], rs["img"]["out_h"]) == (256, 128)    # aspect kept
    frames = sample_frames(df.filter("media_id = 'aud'"), "media_id", "payload", every_ms=5000)
    assert [r["ts_ms"] for r in frames.collect()] == [0, 5000, 10000]  # real 12s duration


def test_resize_survives_zero_dimension_header(spark):
    """A malformed GIF header declaring width=0 flows through status='probe';
    resize must record-and-continue (stub-dim fallback), never raise
    ZeroDivisionError inside the task (ADVICE r4)."""
    import numpy as np

    from batch_doc_vqa_spark.operators.multimodal import resize_media

    bad_gif = b"GIF89a" + (0).to_bytes(2, "little") + (240).to_bytes(2, "little") + b"\x00" * 8
    df = spark.createDataFrame([("bad", bad_gif)], "media_id string, payload binary")
    rows = {r["media_id"]: r for r in resize_media(df, "media_id", "payload", 256, 256).collect()}
    assert rows["bad"]["width"] > 0 and rows["bad"]["height"] > 0  # stub fallback dims
    assert rows["bad"]["out_w"] > 0 and rows["bad"]["out_h"] > 0


def test_resize_box_zero_dim_array_is_noop():
    import numpy as np

    empty = np.zeros((0, 0, 3), dtype=np.uint8)
    out = md.resize_box(empty, 64, 64)
    assert out.shape == (0, 0, 3)

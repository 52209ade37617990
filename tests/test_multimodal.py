"""Multimodal binary-column operators: byte-exact checks at sf0.001."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators import multimodal as MM
from lakehouse_tacklebox_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    return MM.as_media(docs).cache()


def test_payload_layout_and_metadata(spark, media):
    meta = MM.media_metadata(media)
    rows = meta.select("doc_id", "modality", "mime", "width", "height", "parsed_width", "parsed_height", "n_bytes", "n_body_bytes", "payload").collect()
    assert rows
    for r in rows:
        assert r.mime == MM.MIMES[r.modality]
        assert bytes(r.payload)[:4] == MM.MAGICS[r.modality]
        assert (r.parsed_width, r.parsed_height) == (r.width, r.height)
        assert r.n_bytes == len(bytes(r.payload))
        assert r.n_body_bytes == r.n_bytes - 14


def test_frame_sample_reconstructs_payload(spark, media):
    frames = MM.frame_sample(media, n_frames=4, keys=["doc_id"])
    joined = (
        frames.groupBy("doc_id")
        .agg(F.sum("frame_bytes").alias("fb"), F.count(F.lit(1)).alias("nf"))
        .join(media.select("doc_id", F.length("payload").alias("nb")), "doc_id")
        .collect()
    )
    for r in joined:
        assert r.fb == r.nb  # slices partition the payload exactly
        assert 1 <= r.nf <= 4
    # byte-level: frames concatenated in order equal the payload
    one = media.orderBy("doc_id").limit(1).collect()[0]
    fr = MM.frame_sample(media.filter(F.col("doc_id") == one.doc_id), 4).orderBy("frame_idx").collect()
    assert b"".join(bytes(r.frame_payload) for r in fr) == bytes(one.payload)


def test_byte_histogram_matches_numpy(spark, media):
    rows = media.select("doc_id", "payload", MM.byte_histogram(64)("payload").alias("h")).limit(20).collect()
    for r in rows:
        arr = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        expect = np.bincount(arr >> 2, minlength=64).astype("float32")
        expect /= expect.sum()
        np.testing.assert_allclose(np.array(r.h, dtype="float32"), expect, rtol=1e-6)


def test_decode_pixels_deterministic_fake(spark, media):
    decoded = MM.decode_pixels(media).join(media.select("doc_id", "payload", "width", "height"), "doc_id")
    for r in decoded.limit(20).collect():
        body = np.frombuffer(bytes(r.payload)[14:], dtype=np.uint8)
        assert abs(r.mean_brightness - float(body.mean())) < 1e-9
    # schema contract
    assert set(MM.decode_pixels(media).columns) == {"doc_id", "width", "height", "mean_brightness"}


@pytest.fixture(scope="module")
def bmp(spark):
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    return MM.as_bmp_images(docs).cache()


def test_bmp_encode_is_byte_real(spark, bmp):
    import struct

    for r in bmp.limit(10).collect():
        b = bytes(r.payload)
        assert b[:2] == b"BM"
        (size,) = struct.unpack_from("<I", b, 2)
        (offset,) = struct.unpack_from("<I", b, 10)
        w, h = struct.unpack_from("<ii", b, 18)
        (bpp,) = struct.unpack_from("<H", b, 28)
        assert (w, h, bpp, offset) == (r.width, r.height, 24, 54)
        assert size == len(b) == 54 + h * MM._bmp_stride(w)


def test_decode_bmp_roundtrip_matches_numpy(spark, bmp):
    decoded = {r.doc_id: r for r in MM.decode_bmp(bmp).collect()}
    for r in bmp.limit(20).collect():
        d = decoded[r.doc_id]
        n = 3 * r.width * r.height
        expect = ((r.doc_id + np.arange(n)) % 256).astype(np.uint8)
        assert (d.width, d.height, d.pixel_bytes) == (r.width, r.height, n)
        assert abs(d.mean_brightness - float(expect.mean())) < 1e-12


def test_decode_bmp_handles_topdown_files(spark):
    # a top-down BMP (negative height) from another producer must decode
    import numpy as np

    rows = (np.arange(4 * 9) % 256).astype(np.uint8).reshape(4, 9)  # 3x4 img
    b = bytearray(MM._bmp_encode(rows))
    import struct

    struct.pack_into("<i", b, 22, -4)  # mark top-down
    w, h, pix = MM._bmp_decode(bytes(b))
    assert (w, h) == (3, 4)
    np.testing.assert_array_equal(pix, rows[::-1])


@pytest.fixture(scope="module")
def wav(spark):
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    return MM.as_wav_audio(docs).cache()


def test_wav_encode_is_byte_real(spark, wav):
    import struct

    for r in wav.limit(10).collect():
        b = bytes(r.payload)
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        fmt, ch, rate, byte_rate, block, bits = struct.unpack_from("<HHIIHH", b, 20)
        assert (fmt, ch, rate, bits) == (1, 1, 8000, 16)
        (data_len,) = struct.unpack_from("<I", b, 40)
        assert data_len == 2 * r.n_samples
        assert len(b) == 44 + data_len


def test_decode_wav_roundtrip_matches_numpy(spark, wav):
    import math

    decoded = {r.doc_id: r for r in MM.decode_wav(wav).collect()}
    for r in wav.limit(20).collect():
        d = decoded[r.doc_id]
        s = ((r.doc_id * 31 + np.arange(r.n_samples) * 7) % 2001) - 1000
        assert (d.sample_rate, d.n_samples) == (8000, r.n_samples)
        assert d.duration_ms == r.n_samples * 1000 // 8000
        assert d.peak_abs == int(np.abs(s).max())
        assert abs(d.rms - math.sqrt(float((s.astype(float) ** 2).mean()))) < 1e-12


def test_decode_wav_skips_unknown_chunks(spark):
    # a LIST chunk before data (common in real files) must be skipped
    import struct

    s = (np.arange(100) % 300 - 150).astype("<i2")
    b = MM._wav_encode(s, 8000)
    extra = struct.pack("<4sI", b"LIST", 6) + b"INFOxy"
    patched = b[:12] + extra + b[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, out = MM._wav_decode(patched)
    assert rate == 8000
    np.testing.assert_array_equal(out, s)


def test_resample_audio_nearest_neighbor(spark, wav):
    small = wav.limit(5)
    res = MM.resample_audio(small, 4000)
    src = {r.doc_id: r for r in small.collect()}
    for r in res.collect():
        rate, out = MM._wav_decode(bytes(r.payload))
        assert rate == 4000 and r.sample_rate == 4000
        _, s = MM._wav_decode(bytes(src[r.doc_id].payload))
        n_out = s.size * 4000 // 8000
        idx = (np.arange(n_out) * 8000 // 4000).clip(0, s.size - 1)
        np.testing.assert_array_equal(out, s[idx])
        assert r.n_samples == n_out


@pytest.fixture(scope="module")
def avi(spark):
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    return MM.as_avi_videos(docs).cache()


def test_avi_container_is_byte_real(spark, avi):
    import struct

    for r in avi.limit(10).collect():
        b = bytes(r.payload)
        assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
        (riff_size,) = struct.unpack_from("<I", b, 4)
        assert riff_size == len(b) - 8
        w, h, frames = MM._avi_decode(b)
        assert (w, h, len(frames)) == (r.width, r.height, r.n_frames)
        stride = MM._bmp_stride(r.width)
        assert all(f.shape == (r.height, r.width * 3) for f in frames)
        # container accounting: movi payload = n_frames x (8 + h*stride)
        assert b.count(b"00db") == r.n_frames
        assert stride % 4 == 0


def test_decode_avi_matches_analytic_law(spark, avi):
    decoded = {r.doc_id: r for r in MM.decode_avi(avi).collect()}
    for r in avi.limit(20).collect():
        d = decoded[r.doc_id]
        npx = 3 * r.width * r.height
        vals = np.concatenate(
            [((r.doc_id + f * 13 + np.arange(npx)) % 256) for f in range(r.n_frames)]
        )
        assert (d.width, d.height, d.n_frames, d.frame_bytes) == (r.width, r.height, r.n_frames, npx)
        assert abs(d.mean_pixel - float(vals.mean())) < 1e-12


def test_sample_avi_frames_are_valid_bmps(spark, avi):
    small = avi.limit(5)
    frames = MM.sample_avi_frames(small, every=2)
    src = {r.doc_id: r for r in small.collect()}
    got = frames.collect()
    assert got
    for r in got:
        assert r.frame_idx % 2 == 0
        w, h, pix = MM._bmp_decode(bytes(r.frame_bmp))
        s = src[r.doc_id]
        assert (w, h) == (s.width, s.height)
        npx = 3 * w * h
        expect = ((s.doc_id + r.frame_idx * 13 + np.arange(npx)) % 256).astype(np.uint8)
        np.testing.assert_array_equal(pix.reshape(-1), expect)


def test_resize_nearest_neighbor(spark, bmp):
    small = bmp.limit(5)
    resized = MM.resize_image(small, 8, 6)
    src = {r.doc_id: r for r in small.collect()}
    for r in resized.collect():
        assert (r.width, r.height) == (8, 6)
        w, h, pix = MM._bmp_decode(bytes(r.payload))
        assert (w, h) == (8, 6)
        sw, sh, spix = MM._bmp_decode(bytes(src[r.doc_id].payload))
        src_img = spix.reshape(sh, sw, 3)
        ys = (np.arange(6) * sh // 6).clip(0, sh - 1)
        xs = (np.arange(8) * sw // 8).clip(0, sw - 1)
        np.testing.assert_array_equal(pix.reshape(6, 8, 3), src_img[ys][:, xs])


def test_phash_brightness_invariant_and_noise_tolerant(spark):
    """The pHash drops the DC coefficient, so a uniform (unclipped)
    brightness shift must leave the hash EXACTLY unchanged, and the
    planted sparse-noise copy must stay within the 6-bit verify cut
    while a different random image stays far — the margin contract the
    battery oracle certifies end-to-end."""
    import numpy as np

    from lakehouse_tacklebox_spark.operators.multimodal import _lcg_bytes, _phash_bits

    w, h = 24, 20
    pix = _lcg_bytes(42, 3 * w * h).reshape(h, w, 3)
    base = _phash_bits(pix)
    # uniform shift, no clipping anywhere (stay <= 200 before shift)
    capped = np.minimum(pix, 200.0)
    assert np.array_equal(_phash_bits(capped), _phash_bits(capped + 30))
    # sparse noise copy: within the verify cut
    noisy = np.minimum(pix + 7, 255.0)
    flat = noisy.reshape(-1)
    flat[np.arange(flat.size) % 23 == 0] = np.minimum(
        flat[np.arange(flat.size) % 23 == 0] + 5, 255.0
    )
    assert int(np.sum(_phash_bits(noisy) != base)) <= 6
    # unrelated image: far
    other = _lcg_bytes(43, 3 * w * h).reshape(h, w, 3)
    assert int(np.sum(_phash_bits(other) != base)) >= 12


def test_audio_fingerprint_gain_invariant_and_noise_tolerant(spark):
    """Energy-delta signs are EXACTLY invariant to uniform gain (every
    energy scales by g², delta signs unchanged), tolerant to the
    planted sparse noise, and far for unrelated clips — the margin
    contract mm_audio_fingerprint_neardup certifies end-to-end."""
    import numpy as np

    from lakehouse_tacklebox_spark.operators.multimodal import _afp_bits, _lcg_bytes

    n = 2200
    s = (_lcg_bytes(7, n) * 15.66) - 2000.0
    base = _afp_bits(s)
    assert np.array_equal(_afp_bits(s * 3.7), base)  # pure gain: identical
    noisy = s * 1.35
    noisy[np.arange(n) % 29 == 0] += 40.0
    assert int(np.sum(_afp_bits(np.round(noisy)) != base)) <= 6
    other = (_lcg_bytes(8, n) * 15.66) - 2000.0
    assert int(np.sum(_afp_bits(other) != base)) >= 11


def test_audio_snippet_offset_voting(spark):
    """Landmark offset voting must recover every planted snippet's source
    track at EXACTLY the planted frame offset, and nothing else may reach
    the vote threshold — including under the fixture's exact ×2-gain
    re-encode (energy-delta signs preserved by construction). Also pins
    the landmark margin: the true delta must collect all possible votes
    (8 positions for a 24-frame snippet at window 16)."""
    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators import multimodal as MM
    from lakehouse_tacklebox_spark.sources import load_tables

    d = load_tables(spark, "/root/testdata/sf0.001", ["documents"])["documents"]
    clips = MM.as_wav_audio_with_snippets(d)
    hashes = MM.audio_frame_hashes(clips, keys=["clip_id"])
    tracks = hashes.filter(F.col("clip_id") < 200000).withColumnRenamed("clip_id", "track_id")
    snips = hashes.filter(F.col("clip_id") >= 200000).withColumnRenamed("clip_id", "snippet_id")
    got = {
        r["snippet_id"]: (r["track_id"], r["offset_frames"], r["votes"])
        for r in MM.audio_snippet_matches(tracks, snips, min_votes=5).collect()
    }
    expected = {
        r["clip_id"]: (r["src_id"], r["offset_frames"])
        for r in clips.filter(F.col("role") == "snippet")
        .select("clip_id", "src_id", "offset_frames")
        .collect()
    }
    assert expected, "fixture must plant snippets at this scale"
    assert set(got) == set(expected)
    for sid, (track, off) in expected.items():
        g_track, g_off, g_votes = got[sid]
        assert (g_track, g_off) == (track, off), (sid, got[sid], (track, off))
        assert g_votes == 8, f"true delta must collect all 8 votes, got {g_votes}"


def test_video_snippet_offset_voting(spark):
    """Frame-sequence offset voting must recover every planted 6-frame
    video snippet's source track at EXACTLY the planted offset with full
    coverage (votes == 6), and nothing else may reach the threshold —
    64-bit frame pHashes make full-coverage agreement the verify."""
    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators import multimodal as MM
    from lakehouse_tacklebox_spark.sources import load_tables

    d = load_tables(spark, "/root/testdata/sf0.001", ["documents"])["documents"]
    clips = MM.as_avi_videos_with_snippets(d)
    hashes = MM.video_frame_phash(clips, keys=["vid_id"])
    tracks = hashes.filter(F.col("vid_id") < 200000).withColumnRenamed("vid_id", "track_id")
    snips = hashes.filter(F.col("vid_id") >= 200000).withColumnRenamed("vid_id", "snippet_id")
    got = {
        r["snippet_id"]: (r["track_id"], r["offset_frames"], r["votes"])
        for r in MM.frame_sequence_matches(tracks, snips, hash_col="phash", min_votes=6).collect()
    }
    expected = {
        r["vid_id"]: (r["src_id"], r["offset_frames"])
        for r in clips.filter(F.col("role") == "snippet")
        .select("vid_id", "src_id", "offset_frames")
        .collect()
    }
    assert expected, "fixture must plant snippets at this scale"
    assert set(got) == set(expected)
    for sid, (track, off) in expected.items():
        assert got[sid] == (track, off, 6), (sid, got[sid], (track, off))


def test_lcg_closed_form_matches_loop():
    """_lcg_bytes' vectorized closed form must be BIT-IDENTICAL to the
    original per-step mod-2^63 loop — every multimodal fixture's pixels,
    samples, and planted-duplicate margins depend on these exact bytes."""
    import numpy as np

    from lakehouse_tacklebox_spark.operators.multimodal import (
        _LCG_A,
        _LCG_C,
        _lcg_bytes,
    )

    def loop(seed, n):
        out = np.empty(n, dtype=np.float64)
        s = (seed * _LCG_A + _LCG_C) % (1 << 63)
        for k in range(n):
            s = (s * _LCG_A + _LCG_C) % (1 << 63)
            out[k] = (s >> 33) % 256
        return out

    for seed in (0, 1, 42, 999983, 12345678901):
        for n in (1, 7, 256, 1441, 12288):
            assert (loop(seed, n) == _lcg_bytes(seed, n)).all(), (seed, n)


def test_phash_batch_equals_per_frame():
    """_phash_many must be BIT-IDENTICAL to packing _phash_bits per
    frame — the equivalence that licenses the batched video/image hash
    path (VERDICT r8: per-frame Python DCT loop was the sf1 decade-ratio
    holder). Covers every (h, w) the fixtures emit plus degenerate dims,
    on LCG pixels both plain and with the near-dup tweak (the values
    closest to median-tie bit flips)."""
    import numpy as np

    from lakehouse_tacklebox_spark.operators.multimodal import (
        _lcg_bytes,
        _phash_bits,
        _phash_many,
    )

    rng_dims = [(h, w) for h in (16, 21, 27, 8, 5) for w in (16, 24, 31, 9)]
    for h, w in rng_dims:
        frames = []
        for seed in range(977, 977 + 40):
            pix = _lcg_bytes(seed, 3 * h * w)
            if seed % 3 == 0:
                pix = np.minimum(pix + 7, 255.0)
                idx = np.arange(3 * h * w) % 23 == 0
                pix[idx] = np.minimum(pix[idx] + 5, 255.0)
            frames.append(pix.astype(np.uint8))
        stack = np.stack(frames).reshape(len(frames), h, w, 3)
        gray = stack.astype(np.float64).mean(axis=3)
        batched = _phash_many(gray)
        for i, f in enumerate(frames):
            bits = _phash_bits(f.reshape(h, w, 3).astype(np.float64))
            val = np.uint64(0)
            for b in bits:
                val = (val << np.uint64(1)) | np.uint64(b)
            assert int(np.int64(val)) == int(batched[i]), (h, w, i)


def test_image_tile_hashes_and_crop_voting(spark):
    """Tile hashes must be exact through the BMP round-trip: every
    planted crop matches its source at exactly the planted (dx, dy)
    with all 9 cells voting; lowering min_votes must not surface any
    cross-image displacement reaching even 3 agreeing cells (the
    64-bit-hash no-chance-collision claim, checked not assumed)."""
    docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    imgs = MM.as_bmp_images_with_crops(docs)
    tiles = MM.image_tile_hashes(imgs, keys=["img_id"]).localCheckpoint(eager=True)
    full = tiles.filter(F.col("img_id") < 300000).withColumnRenamed("img_id", "image_id")
    crop = tiles.filter(F.col("img_id") >= 300000).withColumnRenamed("img_id", "crop_id")
    expected = {
        (r["img_id"], r["src_id"], r["off_x"], r["off_y"])
        for r in imgs.filter(F.col("role") == "crop").collect()
    }
    got = {
        (r["crop_id"], r["image_id"], r["dx"], r["dy"])
        for r in MM.tile_offset_matches(full, crop, min_votes=9).collect()
    }
    assert got == expected and len(got) > 0
    # relaxed threshold: still only true (crop, source) pairs appear
    loose = MM.tile_offset_matches(full, crop, min_votes=3).collect()
    assert {(r["crop_id"], r["image_id"]) for r in loose} == {
        (c, s) for c, s, _, _ in expected
    }


def test_nonaligned_crop_phase_voting(spark):
    """Crops at ARBITRARY pixel offsets (not tile-aligned) are matched
    by phase voting: hash the crop's tiles at all 16 grid phases; the
    phase ((-px) mod 4, (-py) mod 4) aligns the crop's grid with the
    source's, full interior coverage votes at one displacement, and the
    planted pixel offset is recovered exactly as
    px = 4·(i_tx − c_tx) − phase_x (same for y)."""
    import numpy as np

    from lakehouse_tacklebox_spark.operators.multimodal import (
        _bmp_encode,
        _lcg_bytes,
    )

    # build sources + 16x16-px crops at non-aligned offsets in plain
    # numpy, ship as payload rows
    rows_src, rows_crop, expected = [], [], {}
    for i, (px, py) in enumerate([(3, 5), (1, 2), (6, 7), (5, 1), (2, 3)]):
        w, h = 28, 26
        pix = _lcg_bytes(7000 + i, 3 * w * h).astype(np.uint8).reshape(h, w * 3)
        rows_src.append((i, bytearray(_bmp_encode(pix))))
        crop = pix[py : py + 16, px * 3 : (px + 16) * 3]
        rows_crop.append((1000 + i, bytearray(_bmp_encode(np.ascontiguousarray(crop)))))
        expected[1000 + i] = (i, px, py)
    src = spark.createDataFrame(rows_src, "img_id long, payload binary")
    crp = spark.createDataFrame(rows_crop, "img_id long, payload binary")

    full = MM.image_tile_hashes(src, keys=["img_id"]).withColumnRenamed(
        "img_id", "image_id"
    ).localCheckpoint(eager=True)
    got = {}
    for sx in range(4):
        for sy in range(4):
            ct = MM.image_tile_hashes(crp, keys=["img_id"], origin=(sx, sy))
            ct = ct.withColumnRenamed("img_id", "crop_id")
            # interior coverage at the true phase: a 16x16 crop holds a
            # 3x3 block of source-aligned tiles at any phase
            for r in MM.tile_offset_matches(full, ct, min_votes=9).collect():
                px = 4 * r["dx"] - sx
                py = 4 * r["dy"] - sy
                prev = got.get(r["crop_id"])
                # keep the strongest vote (the true phase gives >= 9;
                # other phases cannot reach 9 with 64-bit hashes)
                if prev is None or r["votes"] > prev[3]:
                    got[r["crop_id"]] = (r["image_id"], px, py, r["votes"])
    assert set(got) == set(expected)
    for cid, (img, px, py) in expected.items():
        g = got[cid]
        assert (g[0], g[1], g[2]) == (img, px, py), (cid, g, expected[cid])

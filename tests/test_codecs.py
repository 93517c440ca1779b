"""Round-trip and malformed-input tests for the dependency-free real
codecs (operators/codecs.py) plus the Spark decode stages built on them."""

import struct

import numpy as np
import pytest

from ecommerce_data_pipeline_spark.operators import codecs


RNG = np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (8, 8), (13, 13), (5, 9)])
def test_pgm_round_trip(shape):
    px = RNG.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(codecs.pgm_decode(codecs.pgm_encode(px)), px)


def test_pgm_header_comment():
    px = RNG.integers(0, 256, (5, 9), dtype=np.uint8)
    data = b"P5\n# a comment\n9 5\n255\n" + px.tobytes()
    assert np.array_equal(codecs.pgm_decode(data), px)


def test_pgm_rejects_truncated_and_wrong_magic():
    px = RNG.integers(0, 256, (4, 4), dtype=np.uint8)
    good = codecs.pgm_encode(px)
    with pytest.raises(ValueError):
        codecs.pgm_decode(good[:-3])
    with pytest.raises(ValueError):
        codecs.pgm_decode(b"P6" + good[2:])


@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (8, 8), (13, 13), (5, 9)])
def test_bmp_round_trip(shape):
    # odd widths exercise the 4-byte row padding path
    px = RNG.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(codecs.bmp_decode(codecs.bmp_encode(px)), px)


def test_bmp_rejects_unsupported():
    px = RNG.integers(0, 256, (4, 4), dtype=np.uint8)
    good = bytearray(codecs.bmp_encode(px))
    with pytest.raises(ValueError):
        codecs.bmp_decode(b"XX" + bytes(good[2:]))
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)  # 8-bit palettized: unsupported
    with pytest.raises(ValueError):
        codecs.bmp_decode(bytes(bad_bpp))


def test_wav_round_trip_and_extra_chunk():
    s = RNG.integers(-32768, 32768, 1234, dtype=np.int16)
    enc = codecs.wav_encode(s, rate=22050)
    dec, rate = codecs.wav_decode(enc)
    assert rate == 22050 and np.array_equal(dec, s)
    # a LIST chunk (odd size, word-aligned pad) before fmt/data must be
    # skipped, per the RIFF spec
    extra = b"LIST" + struct.pack("<I", 5) + b"hello" + b"\x00"
    chunks = enc[12:]
    patched = (
        b"RIFF"
        + struct.pack("<I", 4 + len(extra) + len(chunks))
        + b"WAVE"
        + extra
        + chunks
    )
    dec2, rate2 = codecs.wav_decode(patched)
    assert rate2 == 22050 and np.array_equal(dec2, s)


def test_wav_rejects_stereo_and_missing_data():
    s = np.zeros(10, dtype=np.int16)
    enc = bytearray(codecs.wav_encode(s))
    struct.pack_into("<H", enc, 22, 2)  # channels=2 inside fmt chunk
    with pytest.raises(ValueError):
        codecs.wav_decode(bytes(enc))
    with pytest.raises(ValueError):
        codecs.wav_decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_nearest_resize_grid():
    img = RNG.integers(0, 256, (13, 13), dtype=np.uint8)
    th = codecs.nearest_resize(img, 4)
    for i in range(4):
        for j in range(4):
            assert th[i, j] == img[(i * 13) // 4, (j * 13) // 4]


def test_spark_image_decode_round_trip(spark):
    from ecommerce_data_pipeline_spark.operators.multimodal import (
        decode_image_features,
        synth_image_corpus,
    )

    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    out = {
        r["doc_id"]: r for r in decode_image_features(synth_image_corpus(docs)).collect()
    }
    assert len(out) == 20
    for d, r in out.items():
        side = 8 + d % 9
        assert (r["width"], r["height"]) == (side, side)
        assert r["format"] == ("pgm" if d % 2 == 0 else "bmp")
        expect = sum(
            (d * 31 + i * 7 + j * 13) % 256 for i in range(side) for j in range(side)
        )
        assert r["pixel_sum"] == expect


def test_spark_audio_decode_round_trip(spark):
    from ecommerce_data_pipeline_spark.operators.multimodal import (
        decode_audio_features,
        synth_audio_corpus,
    )

    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    out = {
        r["doc_id"]: r for r in decode_audio_features(synth_audio_corpus(docs)).collect()
    }
    for d, r in out.items():
        n = 400 + (d % 64) * 8
        assert r["n_samples"] == n and r["sample_rate"] == 16000
        ss = sum(((d * 13 + t * 7919) % 65536 - 32768) ** 2 for t in range(n))
        assert r["sum_sq"] == ss


def test_spark_image_patchify(spark):
    from ecommerce_data_pipeline_spark.operators.multimodal import (
        image_patchify,
        synth_image_corpus,
    )

    docs = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    rows = image_patchify(synth_image_corpus(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        side = 8 + d % 9
        assert len(rs) == (side // 4) ** 2
        r0 = next(x for x in rs if x["patch_row"] == 0 and x["patch_col"] == 0)
        expect = sum(
            (d * 31 + i * 7 + j * 13) % 256 for i in range(4) for j in range(4)
        )
        assert r0["patch_sum"] == expect


def test_spark_audio_frame_energy(spark):
    from ecommerce_data_pipeline_spark.operators.multimodal import (
        audio_frame_energy,
        synth_audio_corpus,
    )

    docs = spark.range(0, 5).withColumnRenamed("id", "doc_id")
    rows = audio_frame_energy(synth_audio_corpus(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        n = 400 + (d % 64) * 8
        assert len(rs) == n // 160
        f0 = next(x for x in rs if x["frame_idx"] == 0)
        expect = sum(
            ((d * 13 + t * 7919) % 65536 - 32768) ** 2 for t in range(160)
        )
        assert f0["frame_sum_sq"] == expect


def test_wav_rejects_truncated_and_short_fmt():
    s = np.arange(100, dtype=np.int16)
    enc = codecs.wav_encode(s)
    # truncated data chunk: declared size overruns the buffer -> ValueError,
    # never a silent short read
    with pytest.raises(ValueError):
        codecs.wav_decode(enc[:-10])
    # fmt chunk declaring fewer than 16 bytes -> ValueError, not struct.error
    bad = bytearray(enc)
    struct.pack_into("<I", bad, 16, 8)  # fmt chunk size field
    with pytest.raises(ValueError):
        codecs.wav_decode(bytes(bad))


def test_bmp_rejects_short_header():
    with pytest.raises(ValueError):
        codecs.bmp_decode(b"BM" + b"\x00" * 20)


def test_ngram_candidates_param_validated(spark):
    from ecommerce_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ngram_jaccard_pairs(docs, candidates="LSH")


def test_pgm_stream_round_trip_and_rejects():
    fs = [
        RNG.integers(0, 256, (5, 7), dtype=np.uint8),
        RNG.integers(0, 256, (3, 3), dtype=np.uint8),
        RNG.integers(0, 256, (8, 8), dtype=np.uint8),
    ]
    enc = codecs.pgm_stream_encode(fs)
    dec = codecs.pgm_stream_decode(enc)
    assert len(dec) == 3 and all(np.array_equal(a, b) for a, b in zip(fs, dec))
    with pytest.raises(ValueError):
        codecs.pgm_stream_decode(enc[:-3])  # truncated last frame
    with pytest.raises(ValueError):
        codecs.pgm_stream_decode(enc + b"garbage")  # trailing bytes
    with pytest.raises(ValueError):
        codecs.pgm_stream_decode(b"")


def test_spark_video_frame_sample(spark):
    from ecommerce_data_pipeline_spark.operators.multimodal import (
        synth_video_corpus,
        video_frame_sample,
    )

    docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    rows = video_frame_sample(synth_video_corpus(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        nf = 2 + d % 4
        assert all(r["n_frames"] == nf for r in rs)
        assert sorted(r["frame_idx"] for r in rs) == list(range(0, nf, 2))
        r0 = next(r for r in rs if r["frame_idx"] == 0)
        expect = sum(
            (d * 31 + i * 7 + j * 13) % 256 for i in range(8) for j in range(8)
        )
        assert r0["frame_sum"] == expect

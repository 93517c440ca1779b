"""Round-7 operator tests: perceptual image hashing, video frame vectors,
iterative BPE merge training, tolerance-bounded as-of registry shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators import codecs
from ecommerce_data_pipeline_spark.operators.dedup import banded_hamming_pairs
from ecommerce_data_pipeline_spark.operators.multimodal import (
    image_ahash,
    video_frame_vectors,
)
from ecommerce_data_pipeline_spark.operators.text import bpe_merge_vocab


def _ahash_ref(img: np.ndarray, grid: int = 8) -> int:
    """Independent reference aHash (same spec, numpy-only)."""
    h, w = img.shape
    rows = (np.arange(grid) * h) // grid
    cols = (np.arange(grid) * w) // grid
    g = img[np.ix_(rows, cols)].astype(np.int64)
    s = int(g.sum())
    bits = g.ravel() * grid * grid > s
    return sum(1 << i for i in range(min(63, grid * grid)) if bits[i])


def _media_df(spark, items):
    return spark.createDataFrame(items, "doc_id long, payload binary")


def test_image_ahash_matches_reference(spark):
    rng = np.random.default_rng(7)
    imgs = {
        i: rng.integers(0, 256, (9 + i, 9 + i)).astype(np.uint8)
        for i in range(6)
    }
    df = _media_df(
        spark,
        [(i, bytearray(codecs.pgm_encode(img))) for i, img in imgs.items()],
    )
    got = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got == {i: _ahash_ref(img) for i, img in imgs.items()}


def test_image_ahash_encoding_invariant(spark):
    """The hash is computed from DECODED pixels: the same image encoded as
    PGM and as BMP must hash identically — that is what lets re-encoded
    copies dedup."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 13)).astype(np.uint8)
    df = _media_df(
        spark,
        [
            (0, bytearray(codecs.pgm_encode(img))),
            (1, bytearray(codecs.bmp_encode(img))),
        ],
    )
    hashes = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert hashes[0] == hashes[1] == _ahash_ref(img)


def test_image_ahash_resolution_invariant(spark):
    """2x nearest-neighbor upscaling preserves the 8x8 sample grid exactly
    -> identical hash (perceptual, not byte-level, identity)."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    big = np.kron(img, np.ones((2, 2), dtype=np.uint8))
    df = _media_df(
        spark,
        [
            (0, bytearray(codecs.pgm_encode(img))),
            (1, bytearray(codecs.pgm_encode(big))),
        ],
    )
    hashes = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert hashes[0] == hashes[1]


def test_banded_hamming_pairs_lossless_at_3(spark):
    """For max_hamming <= 3 the 4x16 banding is pigeonhole-lossless:
    band-blocked pairs == exact all-pairs filter."""
    rng = np.random.default_rng(3)
    base = int(rng.integers(0, 1 << 62))
    sigs = [base]
    for flips in (1, 2, 3, 4, 17):  # distances 1..4 and a far one
        s = base
        for b in rng.choice(62, size=flips, replace=False):
            s ^= 1 << int(b)
        sigs.append(int(s))
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, sig long"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"], r["hamming"])
        for r in banded_hamming_pairs(df, "sig", max_hamming=3).collect()
    }
    want = set()
    for a in range(len(sigs)):
        for b in range(a + 1, len(sigs)):
            hm = bin(sigs[a] ^ sigs[b]).count("1")
            if hm <= 3:
                want.add((a, b, hm))
    assert got == want and len(want) >= 3


def test_video_frame_vectors_stride_and_content(spark):
    frames = [
        (np.arange(64, dtype=np.int64).reshape(8, 8) * (f + 1) % 256).astype(
            np.uint8
        )
        for f in range(5)
    ]
    df = _media_df(spark, [(42, bytearray(codecs.pgm_stream_encode(frames)))])
    rows = {
        r["frame_idx"]: r["embedding"]
        for r in video_frame_vectors(df, every_n=2).collect()
    }
    assert sorted(rows) == [0, 2, 4]  # every 2nd of 5 frames
    for f in (0, 2, 4):
        assert rows[f] == [float(x) for x in frames[f].ravel()]


def test_bpe_merge_vocab_hand_computed(spark):
    """Corpus 'the the the cat hat': most frequent pair is t-h (4: three
    'the' + 'hat'... counted over the VOCAB weighted by word freq), then
    th-e (3), then the singletons."""
    docs = spark.createDataFrame(
        [(1, "the the the cat hat")], "doc_id long, text string"
    )
    out = bpe_merge_vocab(docs, rounds=3).collect()
    got = [(r["merge_round"], r["sym_a"], r["sym_b"], r["merged"], r["pair_count"]) for r in out]
    # vocab: the(3), cat(1), hat(1)
    # round 1 pairs: th:3+? 'hat' pairs: ha, at; 'cat': ca, at; 'the': th, he
    # counts: th=3, he=3, at=2, ca=1, ha=1 -> tie th/he at 3 -> 'he' < 'th'
    # lexicographically on (a, b): ('h','e') < ('t','h') -> he wins.
    assert got[0] == (1, "h", "e", "he", 3)
    # round 2: the -> [t, he]: pairs t-he=3; at=2; ca=1, ha=1 -> t,he wins
    assert got[1] == (2, "t", "he", "the", 3)
    # round 3: remaining pairs: at=2 (cat, hat), ca=1, ha=1 -> a,t
    assert got[2] == (3, "a", "t", "at", 2)


def test_bpe_merge_overlapping_runs(spark):
    """'aaaa' with merge (a,a): leftmost non-overlapping -> [aa][aa], so
    round 2 merges (aa,aa), not (a,aa)."""
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    out = bpe_merge_vocab(docs, rounds=2).collect()
    assert (out[0]["sym_a"], out[0]["sym_b"], out[0]["pair_count"]) == ("a", "a", 3)
    assert (out[1]["sym_a"], out[1]["sym_b"], out[1]["merged"]) == ("aa", "aa", "aaaa")


def test_audio_fingerprint_matches_reference(spark):
    """Fingerprint from REAL WAV decode equals the numpy reference over
    random PCM16 signals of varying length."""
    from ecommerce_data_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
    )

    rng = np.random.default_rng(5)
    signals = {
        i: rng.integers(-32768, 32768, 300 + 37 * i).astype(np.int16)
        for i in range(5)
    }
    df = _media_df(
        spark,
        [(i, bytearray(codecs.wav_encode(s))) for i, s in signals.items()],
    )
    got = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}

    def ref(sig):
        s = sig.astype(np.int64)
        n = len(s)
        e = [int((s[f * n // 64 : (f + 1) * n // 64] ** 2).sum()) for f in range(64)]
        return sum(1 << i for i in range(63) if e[i + 1] > e[i])

    assert got == {i: ref(s) for i, s in signals.items()}


def test_bpe_encode_tokens_compresses(spark):
    """Encoding its own training corpus: after merges, every doc's token
    count is <= its char count, >= its word count, and the corpus with the
    most repetition compresses the most."""
    from ecommerce_data_pipeline_spark.operators.text import bpe_encode_tokens

    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "wxyz qrst")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_words"], r["bpe_tokens"]) for r in
           bpe_encode_tokens(docs, rounds=2).collect()}
    # merges learned on this corpus: (h,e)x? vocab: the(4), wxyz(1), qrst(1)
    # round1 pairs: th=4, he=4 -> he wins (lex); round2: t-he=4 -> the
    # doc1: 'the' -> 1 token x4 words = 4; doc2: untouched 4+4 chars = 8
    assert out[1] == (4, 4)
    assert out[2] == (2, 8)


def test_bpe_merge_stops_when_dry(spark):
    """Single-char words have no pairs: trainer returns zero merges
    instead of looping."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bpe_merge_vocab(docs, rounds=5).count() == 0

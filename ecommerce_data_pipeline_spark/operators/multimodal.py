"""Multimodal column plumbing (engine extension).

Treats image/audio/video payloads as opaque ``binary`` columns with a typed
metadata struct, and runs decode/feature-extraction as Arrow-batched
``mapInPandas`` stages. Two decode tiers:

- REAL codecs (PGM/BMP images, RIFF/WAV audio — operators/codecs.py,
  dependency-free parsers): synth_image_corpus / decode_image_features /
  synth_audio_corpus / decode_audio_features round-trip genuine format
  bytes and are oracle-checked feature-by-feature.
- Stub kernels for formats whose codec libraries are not in this container
  (JPEG/MP4 would need PIL/ffmpeg): deterministic byte-derived features,
  clearly marked, exercising the same Spark plumbing.

Scale notes: media blobs dominate row size, so the decode stage must run on
narrow projections (id + payload only — column pruning keeps metadata
columns out of the Arrow transfer) and with small
``spark.sql.execution.arrow.maxRecordsPerBatch`` if blobs are MBs. Feature
outputs re-join to metadata by id afterwards if needed — never carry blobs
through shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum_mod", LongType()),
    ]
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a media table: (doc_id, payload binary, media_type, n_bytes).
    Uses utf-8 bytes of the text as the stand-in payload."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
    )


def decode_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode / feature-extract over binary payloads.

    STUB KERNEL: real image/audio decode (PIL/ffmpeg/torchvision) is not
    installed in this environment. The kernel below computes deterministic
    pseudo-features from the raw bytes so the full Spark pipeline — binary
    column in Arrow batches, pandas kernel, typed struct out — is exercised
    end-to-end and oracle-checkable. Swap `_decode_batch` for a real codec
    to productionize; the Spark plumbing does not change.
    """
    cols = media.select("doc_id", "payload")  # narrow projection: no blob drag

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int32")
            first = payloads.map(lambda b: b[0] if len(b) else 0).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "format": "fake",
                    # Deterministic pseudo-dimensions derived from size.
                    "width": (n_bytes % 640).astype("int32"),
                    "height": (n_bytes % 480).astype("int32"),
                    "checksum_mod": (first * 31 + n_bytes) % 1_000_003,
                }
            )

    return cols.mapInPandas(_decode_batch, schema=MEDIA_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codec path (operators/codecs.py): PGM / BMP / WAV bytes, parsed by
# actual format decoders inside the same Arrow-batched mapInPandas shape as
# the stub path above. The payloads are synthesized from a generative pixel
# formula so a SQL oracle can verify the decoded features in closed form —
# any bug in the encoder, the parser, or the Arrow plumbing breaks the
# round-trip equality.
# ---------------------------------------------------------------------------


def synth_image_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload binary, media_type): REAL image bytes per doc —
    even doc_ids encode as binary PGM (P5), odd as 24-bit BMP.

    Generative content: side = 8 + doc_id % 9, pixel[i,j] =
    (doc_id*31 + i*7 + j*13) % 256 — a formula, so downstream decoded
    features are oracle-checkable without a reference decoder."""
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, kinds = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                side = 8 + d % 9
                i = np.arange(side, dtype=np.int64)
                px = ((d * 31 + i[:, None] * 7 + i[None, :] * 13) % 256).astype(
                    np.uint8
                )
                if d % 2 == 0:
                    payloads.append(codecs.pgm_encode(px))
                    kinds.append("image/pgm")
                else:
                    payloads.append(codecs.bmp_encode(px))
                    kinds.append("image/bmp")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "media_type": kinds}
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth, "doc_id long, payload binary, media_type string"
    )


def decode_image_features(media: DataFrame, thumb: int = 4) -> DataFrame:
    """REAL image decode + resize: dispatch on the payload's magic bytes
    (``P5`` -> PGM parser, ``BM`` -> BMP parser — operators/codecs.py),
    then emit integer-exact features of the DECODED pixel array:

    - pixel_sum: sum of all pixels (bit-stable, unlike float means);
    - thumb_checksum: position-weighted sum of the nearest-neighbor
      ``thumb`` x ``thumb`` downsample — any change in decode output,
      raster orientation (BMP is bottom-up), row padding, or the sampling
      grid shifts it.

    Same narrow-projection mapInPandas shape as the stub path; this one
    parses genuine format bytes any external tool could read."""
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"P5":
                    img, fmt = codecs.pgm_decode(b), "pgm"
                elif b[:2] == b"BM":
                    img, fmt = codecs.bmp_decode(b), "bmp"
                else:
                    raise ValueError(f"unknown image magic {b[:2]!r}")
                th = codecs.nearest_resize(img, thumb).astype(np.int64)
                weights = 1 + np.arange(thumb * thumb, dtype=np.int64)
                rows.append(
                    (
                        int(doc_id),
                        fmt,
                        int(img.shape[1]),
                        int(img.shape[0]),
                        int(img.astype(np.int64).sum()),
                        int((th.ravel() * weights).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "format",
                    "width",
                    "height",
                    "pixel_sum",
                    "thumb_checksum",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        _decode,
        "doc_id long, format string, width int, height int, "
        "pixel_sum long, thumb_checksum long",
    )


def synth_audio_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload binary, media_type): REAL RIFF/WAVE bytes — mono
    PCM16 @16 kHz, n = 400 + (doc_id % 64) * 8 samples,
    s[t] = (doc_id*13 + t*7919) % 65536 - 32768."""
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                t = np.arange(400 + (d % 64) * 8, dtype=np.int64)
                s = ((d * 13 + t * 7919) % 65536 - 32768).astype(np.int16)
                payloads.append(codecs.wav_encode(s, rate=16000))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": "audio/wav",
                }
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth, "doc_id long, payload binary, media_type string"
    )


def decode_audio_features(media: DataFrame) -> DataFrame:
    """REAL WAV decode (chunk-walking RIFF parser) -> integer-exact audio
    features of the DECODED samples: (doc_id, sample_rate, n_samples,
    sum_sq, max_abs). sum_sq stays in int64 (max 2^41 here) so the oracle
    compares bit-stable integers, not float RMS."""
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s, rate = codecs.wav_decode(bytes(payload))
                s64 = s.astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        int(rate),
                        int(len(s)),
                        int((s64 * s64).sum()),
                        int(np.abs(s64).max()) if len(s64) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "sum_sq", "max_abs"],
            )

    return media.select("doc_id", "payload").mapInPandas(
        _decode,
        "doc_id long, sample_rate int, n_samples int, sum_sq long, max_abs int",
    )


def image_patchify(media: DataFrame, patch: int = 4) -> DataFrame:
    """ViT-style patch extraction over REAL decoded images: decode the
    payload (PGM/BMP dispatch), crop to the largest multiple of ``patch``
    (standard ViT preprocessing), split into non-overlapping patch x patch
    tiles, and emit one row per tile with its integer pixel sum — the
    hand-off shape for a per-patch embedding stage.

    One decode per image, patches emitted from the same kernel pass (no
    re-decode per patch); output rows are tiny fixed-width tuples, so the
    explode happens AFTER the blobs are dropped — blobs never shuffle.

    Output: (doc_id, patch_row, patch_col, patch_sum).
    """
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _patch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                img = codecs.pgm_decode(b) if b[:2] == b"P5" else codecs.bmp_decode(b)
                h, w = (img.shape[0] // patch) * patch, (img.shape[1] // patch) * patch
                tiles = (
                    img[:h, :w]
                    .astype(np.int64)
                    .reshape(h // patch, patch, w // patch, patch)
                    .sum(axis=(1, 3))
                )
                for pr in range(tiles.shape[0]):
                    for pc in range(tiles.shape[1]):
                        rows.append((int(doc_id), pr, pc, int(tiles[pr, pc])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "patch_row", "patch_col", "patch_sum"]
            )

    return media.select("doc_id", "payload").mapInPandas(
        _patch, "doc_id long, patch_row int, patch_col int, patch_sum long"
    )


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash (aHash) over REAL decoded pixels: decode the
    payload (PGM/BMP magic dispatch), nearest-neighbor downsample to
    ``grid`` x ``grid``, and set bit i*grid+j iff that cell is brighter
    than the grid average. The mean comparison is integer-exact
    (``grid²·pixel > Σpixels`` — no float mean), and only bits 0..62 are
    used so the hash stays a non-negative signed int64 (same 63-bit
    discipline as SimHash). Identical content at different encodings
    (PGM vs BMP) or resolutions hashes identically — that's the point of
    a perceptual hash, and what makes it a dedup key.

    Blobs are dropped before the result leaves the kernel: the output is
    one (doc_id, ahash) row per image, so nothing heavier than 16 bytes
    per doc ever shuffles. Output: (doc_id, ahash long).
    """
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    n_cells = grid * grid

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                img = codecs.pgm_decode(b) if b[:2] == b"P5" else codecs.bmp_decode(b)
                g = codecs.nearest_resize(img, grid).astype(np.int64)
                s = int(g.sum())
                bits = (g.ravel() * n_cells > s).astype(np.int64)
                h = 0
                for idx in range(min(63, n_cells)):
                    if bits[idx]:
                        h |= 1 << idx
                rows.append((int(doc_id), h))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash"])

    return media.select("doc_id", "payload").mapInPandas(
        _hash, "doc_id long, ahash long"
    )


def audio_fingerprint(media: DataFrame, n_frames: int = 64) -> DataFrame:
    """Acoustic fingerprint over REAL decoded WAV audio (the audio twin of
    image_ahash): decode the RIFF/PCM16 payload, split the signal into
    ``n_frames`` equal time frames, compute each frame's integer energy
    (sum of squared samples — exact int64 arithmetic), and set bit i iff
    energy rises from frame i to i+1. The energy-delta shape is what
    audio-ID systems hash (loudness contour), it's robust to constant
    gain-ish changes, and it's integer-exact so a SQL oracle can replay it
    from the generative sample formula. Bits 0..62 only (signed-int64
    discipline shared with SimHash / image_ahash).

    Output: (doc_id, afp long) — feeds banded_hamming_pairs for dedup.
    """
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _rate = codecs.wav_decode(bytes(payload))
                s = samples.astype(np.int64)
                n = len(s)
                h = 0
                prev = None
                for f in range(n_frames):
                    lo, hi = f * n // n_frames, (f + 1) * n // n_frames
                    e = int((s[lo:hi] ** 2).sum())
                    if prev is not None and f - 1 < 63 and e > prev:
                        h |= 1 << (f - 1)
                    prev = e
                rows.append((int(doc_id), h))
            yield pd.DataFrame(rows, columns=["doc_id", "afp"])

    return media.select("doc_id", "payload").mapInPandas(
        _fp, "doc_id long, afp long"
    )


def audio_frame_energy(media: DataFrame, frame: int = 160) -> DataFrame:
    """Frame-level energy over REAL decoded WAV audio: split the PCM16
    stream into non-overlapping ``frame``-sample windows (160 @ 16 kHz =
    the canonical 10 ms hop) and emit each frame's integer energy — the
    front half of any VAD / silence-trim / loudness-normalize stage.

    Same kernel-pass shape as image_patchify: one decode per payload,
    fixed-width frame rows out, blobs never leave the map stage. The tail
    partial frame is dropped (standard hop alignment).

    Output: (doc_id, frame_idx, frame_sum_sq).
    """
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s, _ = codecs.wav_decode(bytes(payload))
                n = (len(s) // frame) * frame
                if n:
                    e = (
                        s[:n].astype(np.int64).reshape(-1, frame) ** 2
                    ).sum(axis=1)
                    rows.extend(
                        (int(doc_id), i, int(v)) for i, v in enumerate(e)
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_sum_sq"]
            )

    return media.select("doc_id", "payload").mapInPandas(
        _frames, "doc_id long, frame_idx int, frame_sum_sq long"
    )


def synth_video_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload binary, media_type): REAL multi-frame video bytes —
    concatenated binary PGM frames (raw-MJPEG shape: independently
    decodable frames back to back). n_frames = 2 + doc_id % 4, 8x8 frames,
    pixel[f,i,j] = (doc_id*31 + f*17 + i*7 + j*13) % 256."""
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                i = np.arange(8, dtype=np.int64)
                frames = [
                    (
                        (d * 31 + f * 17 + i[:, None] * 7 + i[None, :] * 13) % 256
                    ).astype(np.uint8)
                    for f in range(2 + d % 4)
                ]
                payloads.append(codecs.pgm_stream_encode(frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": "video/pgm-stream",
                }
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth, "doc_id long, payload binary, media_type string"
    )


def video_frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling: parse the multi-frame container
    (codecs.pgm_stream_decode walks the byte stream frame by frame), keep
    frames 0, n, 2n, ..., emit each kept frame's integer pixel sum — the
    production shape of a frame-subsample stage feeding a per-frame
    vision encoder. One container parse per payload; blobs never shuffle.

    Output: (doc_id, n_frames, frame_idx, frame_sum).
    """
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = codecs.pgm_stream_decode(bytes(payload))
                for f in range(0, len(frames), every_n):
                    rows.append(
                        (
                            int(doc_id),
                            len(frames),
                            f,
                            int(frames[f].astype(np.int64).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "frame_idx", "frame_sum"]
            )

    return media.select("doc_id", "payload").mapInPandas(
        _sample, "doc_id long, n_frames int, frame_idx int, frame_sum long"
    )


def video_frame_vectors(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Sampled video frames as dense vectors: parse the multi-frame
    container (codecs.pgm_stream_decode), keep frames 0, n, 2n, ..., and
    emit each kept frame's raw pixel raster (row-major) as a float vector
    — the hand-off shape from frame sampling into a retrieval index, where
    a learned vision encoder would replace the identity featurizer. One
    container parse per payload; blobs are dropped inside the kernel so
    only (doc_id, frame_idx, 64-float vector) rows ever shuffle.

    Output: (doc_id, frame_idx, embedding array<double>).
    """
    from ecommerce_data_pipeline_spark.operators import codecs

    def _vecs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = codecs.pgm_stream_decode(bytes(payload))
                for f in range(0, len(frames), every_n):
                    rows.append(
                        (
                            int(doc_id),
                            f,
                            [float(x) for x in frames[f].ravel()],
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "embedding"])

    return media.select("doc_id", "payload").mapInPandas(
        _vecs, "doc_id long, frame_idx int, embedding array<double>"
    )


def video_scene_cuts(media: DataFrame, threshold: float = 40.0) -> DataFrame:
    """REAL scene-change detection over the multi-frame container: decode
    every frame (codecs.pgm_stream_decode), compute the mean absolute
    pixel difference between each adjacent frame pair, and flag pairs
    above ``threshold`` as cuts — the shot-boundary pre-pass every video
    training pipeline runs before frame sampling (sample densely inside
    shots, always keep boundary frames). One container parse per
    payload; only (doc_id, frame_idx, diff, flag) rows ever shuffle,
    never pixels.

    Output: (doc_id, frame_idx of the LATTER frame, mean_abs_diff,
    is_cut).
    """
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import codecs

    def _cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = codecs.pgm_stream_decode(bytes(payload))
                for f in range(1, len(frames)):
                    d = np.abs(
                        frames[f].astype(np.int64)
                        - frames[f - 1].astype(np.int64)
                    )
                    # sum/64 is a dyadic rational — exactly representable
                    # as a double, so NO rounding: both engines land on
                    # the identical bits (round(x, 4) would split on
                    # banker's-vs-half-away at .00005 boundaries).
                    mean = int(d.sum()) / d.size
                    rows.append((int(doc_id), f, mean, mean > threshold))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "mean_abs_diff", "is_cut"],
            )

    return media.select("doc_id", "payload").mapInPandas(
        _cuts, "doc_id long, frame_idx int, mean_abs_diff double, is_cut boolean"
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit (doc_id, frame_idx)
    rows for frames 0, n, 2n... based on a pseudo frame count (bytes/1000).
    The real decoder would replace the frame-count derivation; the explode
    pattern (one row per sampled frame, ready for a per-frame decode stage)
    is the production shape."""
    n_frames = (F.col("n_bytes") / F.lit(1000)).cast("int") + 1
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def embed_media(media: DataFrame, dims: int = 16) -> DataFrame:
    """Arrow-batched media -> embedding extraction (the "CLIP stage" of a
    multimodal training pipeline).

    STUB KERNEL like decode_media_features: the real encoder model is not
    installed, so each dimension is a deterministic md5-derived value of
    the payload — which keeps the whole downstream ANN path (next stage:
    cosine top-k over these vectors) oracle-checkable in SQL. The Spark
    shape is production-real: narrow projection in, fixed-width
    array<double> out, no shuffle in the embed stage itself.
    """
    cols = media.select("doc_id", "payload")

    def _embed_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def emb(payload: bytes) -> list[float]:
            text = payload.decode("utf-8")
            out = []
            for i in range(dims):
                h = hashlib.md5(f"{text}:{i}".encode()).hexdigest()[:15]
                out.append((int(h, 16) % 100000) / 100000.0)
            return out

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "embedding": pdf["payload"].map(emb)}
            )

    from pyspark.sql.types import ArrayType, DoubleType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    return cols.mapInPandas(_embed_batch, schema=schema)


def resize_media(media: DataFrame, out: int = 8) -> DataFrame:
    """Arrow-batched thumbnail resize over binary payloads.

    STUB KERNEL (same policy as decode_media_features — no image codecs
    in this environment): the payload is treated as a square grayscale
    image of side floor(sqrt(n_bytes)) and nearest-neighbor-downsampled
    to ``out``×``out`` by strided byte sampling; the emitted checksum is
    the position-weighted sum of the sampled bytes, so any change in the
    sampling grid or order shows up. A real kernel swaps in
    PIL.Image.resize over the same (doc_id, payload) → (doc_id, thumb)
    batch shape — partitioning, Arrow batching and output contract are
    the production plumbing.

    Output: (doc_id, out_w, out_h, thumb_checksum).
    """
    import numpy as np
    import pandas as pd

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                side = int(len(b) ** 0.5)
                ck = 0
                for i in range(out):
                    for j in range(out):
                        pos = (i * side // out) * side + (j * side // out)
                        ck += int(b[pos]) * (1 + i * out + j)
                rows.append((doc_id, out, out, ck % 1000003))
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_w", "out_h", "thumb_checksum"]
            )

    return media.select("doc_id", "payload").mapInPandas(
        _resize_batch,
        "doc_id long, out_w int, out_h int, thumb_checksum long",
    )

"""Dependency-free REAL media codecs for the multimodal pipeline.

The container has no PIL/ffmpeg, but three classic formats need nothing
beyond numpy + struct, so the decode stage of the multimodal path can be
demonstrably real rather than stubbed:

- PGM (P5): binary grayscale portable graymap — ASCII header (magic,
  width, height, maxval, '#' comments) + raw raster. Any image tool reads
  the bytes these encoders emit.
- BMP: 24-bit uncompressed Windows bitmap — BITMAPFILEHEADER +
  BITMAPINFOHEADER, BGR triplets, 4-byte-padded rows, bottom-up raster.
- WAV: RIFF/WAVE with a PCM16 mono ``fmt `` chunk + ``data`` chunk,
  parsed chunk-by-chunk (unknown chunks skipped, as the spec requires).

These are kernels, not operators: the Spark side
(operators/multimodal.py) calls them inside Arrow-batched ``mapInPandas``
stages. Encoders exist so tests and registry queries can synthesize real
format bytes deterministically; decoders are full parsers that reject
malformed input instead of guessing.

Reference parity note: the reference pipeline (hydramod
ecommerce-data-pipeline) has no multimodal stage — this is part of the
LLM-training-data extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PGM (P5) — binary grayscale
# ---------------------------------------------------------------------------


def pgm_encode(pixels: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as a binary PGM (P5) image."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError(f"PGM wants a 2-D grayscale array, got shape {px.shape}")
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def _pgm_tokens(data: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ASCII integers from a PNM header,
    honoring '#' comments (run to end-of-line, legal anywhere whitespace
    is). Returns (values, offset of the byte AFTER the single whitespace
    that terminates the last token) — the raster starts there."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i] == ord("#"):
            while i < len(data) and data[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PGM header")
        vals.append(int(data[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte separates header/raster


def _pgm_frame_at(data: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one binary PGM (P5) frame starting at ``pos`` -> (frame,
    offset after its raster). Single source of truth for the frame
    grammar — pgm_decode and pgm_stream_decode both delegate here."""
    if data[pos : pos + 2] != b"P5":
        raise ValueError(f"not a P5 PGM at offset {pos}")
    (w, h, maxval), off = _pgm_tokens(data, 3, pos + 2)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PGM maxval {maxval}")
    raster = data[off : off + w * h]
    if len(raster) != w * h:
        raise ValueError(f"PGM raster truncated: want {w * h}, got {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w), off + w * h


def pgm_decode(data: bytes) -> np.ndarray:
    """Decode a binary PGM (P5) into a 2-D uint8 array."""
    frame, _end = _pgm_frame_at(data, 0)
    return frame


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed
# ---------------------------------------------------------------------------


def bmp_encode(pixels: np.ndarray) -> bytes:
    """Encode a 2-D uint8 grayscale array as a 24-bit BMP (B=G=R=value).

    Emits the canonical layout: 14-byte file header, 40-byte
    BITMAPINFOHEADER, bottom-up rows padded to 4-byte boundaries."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    raster = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = np.repeat(px[r], 3)  # gray -> BGR triplets
        raster += row.tobytes() + b"\x00" * pad
    data_size = len(raster)
    file_size = 14 + 40 + data_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + info + bytes(raster)


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into 2-D uint8 grayscale (blue
    channel; encoder writes B=G=R). Handles row padding, bottom-up and
    top-down (negative height) rasters."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(data) < 54:  # file header (14) + BITMAPINFOHEADER (40)
        raise ValueError(f"BMP header truncated: {len(data)} bytes")
    _, _, _, _, px_off = struct.unpack_from("<2sIHHI", data, 0)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    out = np.empty((h, w), dtype=np.uint8)
    for r in range(h):
        src = px_off + r * stride
        row = np.frombuffer(data[src : src + row_bytes], dtype=np.uint8)
        if len(row) != row_bytes:
            raise ValueError("BMP raster truncated")
        dst = r if top_down else h - 1 - r
        out[dst] = row[0::3]  # blue channel
    return out


# ---------------------------------------------------------------------------
# WAV — RIFF / PCM16 mono
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 samples as a mono PCM16 RIFF/WAVE file."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE file -> (int16 samples, sample_rate).

    Walks the chunk list (skipping unknown chunks and odd-length padding,
    per the RIFF spec) — not a fixed-offset read, so files with extra
    LIST/fact chunks decode too. PCM16 mono only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate: int | None = None
    samples: np.ndarray | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(
                f"WAV chunk {cid!r} truncated: declares {size} bytes, "
                f"{len(body)} present"
            )
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"WAV fmt chunk too short ({size} bytes)")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            if size % 2:
                raise ValueError("WAV PCM16 data chunk has odd byte length")
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


# ---------------------------------------------------------------------------
# Pixel-domain kernels (run on decoded arrays)
# ---------------------------------------------------------------------------


def nearest_resize(img: np.ndarray, out: int) -> np.ndarray:
    """Nearest-neighbor resample to out x out: sample the source pixel at
    (i*h//out, j*w//out) — integer arithmetic, so the grid is exactly
    reproducible by an integer-math oracle."""
    h, w = img.shape
    rows = (np.arange(out) * h) // out
    cols = (np.arange(out) * w) // out
    return img[np.ix_(rows, cols)]


# ---------------------------------------------------------------------------
# PGM stream — a minimal real video container (concatenated P5 frames,
# the same shape as raw MJPEG: independently-decodable frames back to back)
# ---------------------------------------------------------------------------


def pgm_stream_encode(frames: list[np.ndarray]) -> bytes:
    """Encode a frame list as back-to-back binary PGMs."""
    if not frames:
        raise ValueError("empty frame list")
    return b"".join(pgm_encode(f) for f in frames)


def pgm_stream_decode(data: bytes) -> list[np.ndarray]:
    """Decode a concatenated-PGM stream into its frame list by walking
    the byte stream: parse each P5 header, slice its raster, continue at
    the next frame boundary. Rejects trailing garbage and truncated
    frames — every byte must belong to a well-formed frame."""
    frames: list[np.ndarray] = []
    pos = 0
    while pos < len(data):
        frame, pos = _pgm_frame_at(data, pos)
        frames.append(frame)
    if not frames:
        raise ValueError("empty PGM stream")
    return frames

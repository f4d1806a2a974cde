"""Multimodal span operators: typed metadata + decode/feature plumbing.

Media spans are opaque references (``media_ref``) with binary payloads at
rest. This module implements what a multimodal training pipeline needs on
the Spark side — schemas, Arrow batch shapes, partition behavior — over
REAL container bytes:

* ``synth_media_payload`` deterministically synthesizes a valid container
  per media_ref (the stand-in for the object-store fetch, which is the only
  unreal step in this sandbox): binary PPM (P6) or PNG for images (split
  deterministically per ref, so both codecs are exercised in every run),
  RIFF/WAVE PCM for audio, YUV4MPEG2 for video. All are public
  self-describing formats writable and parseable in pure Python — PNG is a
  REAL compressed format (zlib deflate + per-row filters), decoded here
  end-to-end with only the stdlib.
* ``parse_media_header`` reads width/height/duration back FROM THE BYTES
  (magic-sniffed, never trusting the claimed kind) — so ``with_media_meta``
  emits metadata computed from the binary column, not hash-derived fakes.
* ``decode_media`` fully decodes the payload (PPM raster / PCM samples /
  YUV frames) into a numpy array; ``decode_and_featurize`` builds feature
  vectors from the DECODED samples. Real-world compressed codecs (JPEG,
  MP3, H.264) are not present in this container: an unrecognized magic
  raises ``NotImplementedError`` — swapping in a real codec library changes
  only ``decode_media``/``parse_media_header``.

Everything crosses the JVM↔Python boundary as Arrow batches via
``mapInPandas``; payload bytes live in a ``binary`` column.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("pos", IntegerType()),
        StructField("kind", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

MEDIA_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("pos", IntegerType()),
        StructField("kind", StringType()),
        StructField("media_ref", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_DIM = 32

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("pos", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("payload", BinaryType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def media_spans(spans: DataFrame) -> DataFrame:
    """Filter the exploded span table down to media spans."""
    return spans.where(F.col("kind") != "text").select(
        "doc_id", "pos", "kind", "media_ref", "offset"
    )


# ---------------------------------------------------------------------------
# container synthesis (the object-store stand-in) + pure-Python codecs
# ---------------------------------------------------------------------------


def _blake_stream(key: str, n: int) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.blake2b(
            b"media|%d|" % i + key.encode(), digest_size=64
        ).digest()
        i += 1
    return out[:n]


_WAV_RATE = 8_000  # Hz, PCM mono 16-bit

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    """One PNG chunk: length, type, data, CRC32 over type+data."""
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, raster: bytes) -> bytes:
    """Encode an 8-bit RGB raster as a valid PNG (stdlib-only).

    Color type 2 (truecolor), bit depth 8, no interlace. Scanline filters
    alternate None(0)/Up(2) by row so decoders must actually de-filter, and
    the deflate stream is split across two IDAT chunks when large enough —
    both are common in real-world files and exercise the decoder paths a
    single-IDAT filter-0 writer would leave dark.
    """
    if len(raster) != width * height * 3:
        raise ValueError("raster size != w*h*3")
    stride = width * 3
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(height, stride)
    lines = []
    for r in range(height):
        if r % 2 == 0:
            lines.append(b"\x00" + rows[r].tobytes())
        else:  # Up filter: cur - prev, mod 256
            lines.append(
                b"\x02"
                + ((rows[r].astype(np.int16) - rows[r - 1]) & 0xFF)
                .astype(np.uint8)
                .tobytes()
            )
    compressed = zlib.compress(b"".join(lines), 6)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    mid = len(compressed) // 2
    idats = (
        _png_chunk(b"IDAT", compressed[:mid]) + _png_chunk(b"IDAT", compressed[mid:])
        if len(compressed) > 64
        else _png_chunk(b"IDAT", compressed)
    )
    return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + idats + _png_chunk(b"IEND", b"")


def _png_chunks(payload: bytes):
    """Yield (chunk_type, data) for a PNG payload (CRCs verified)."""
    pos = len(_PNG_SIG)
    while pos + 8 <= len(payload):
        size = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        crc = struct.unpack_from(">I", payload, pos + 8 + size)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise NotImplementedError("PNG chunk CRC mismatch: %r" % ctype)
        yield ctype, data
        pos += 12 + size
        if ctype == b"IEND":
            return


def _png_defilter(raw: bytes, width: int, height: int) -> np.ndarray:
    """Reverse PNG scanline filtering for 8-bit RGB (bpp=3), all 5 types.

    None(0) and Up(2) — the only filters our encoder emits — decode fully
    vectorized; Sub(1)/Average(3)/Paeth(4) take the per-pixel recurrence
    (they are inherently sequential in the left neighbor) and appear only in
    foreign files, never in the synthesized hot path.
    """
    bpp, stride = 3, width * 3
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int32)
    for r in range(height):
        ftype = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else zero
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise NotImplementedError("PNG filter type %d" % ftype)
        out[r] = cur.astype(np.uint8)
    return out.reshape(-1)


def _png_decode(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """(width, height, flat uint8 RGB raster) from a PNG payload."""
    width = height = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2 or interlace != 0:
                raise NotImplementedError(
                    "PNG depth/color/interlace %d/%d/%d unsupported "
                    "(this decoder handles 8-bit truecolor, no interlace)"
                    % (depth, color, interlace)
                )
        elif ctype == b"IDAT":
            idat.append(data)
    if width is None or not idat:
        raise NotImplementedError("PNG without IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    return width, height, _png_defilter(raw, width, height)


def synth_media_payload(media_ref: str, kind: str) -> bytes:
    """Deterministic VALID container bytes for a media_ref.

    This is the sandbox's object-store fetch: the content is synthetic, but
    the container is real — every byte downstream (header parse, decode,
    featurization) treats it exactly as it would production data.
    """
    h = int.from_bytes(
        hashlib.blake2b(("dims|" + media_ref).encode(), digest_size=8).digest(),
        "big",
    )
    if kind == "image":
        w = 8 + h % 57
        ht = 8 + (h >> 8) % 41
        raster = _blake_stream(media_ref, w * ht * 3)
        if (h >> 24) & 1:  # half the refs land in the compressed codec
            return encode_png(w, ht, raster)
        return b"P6\n%d %d\n255\n" % (w, ht) + raster
    if kind == "audio":
        n_samples = 800 + h % 8_000  # 100ms .. ~1.1s at 8kHz
        data = _blake_stream(media_ref, n_samples * 2)
        header = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(data), b"WAVE",
            b"fmt ", 16, 1, 1, _WAV_RATE, _WAV_RATE * 2, 2, 16,
            b"data", len(data),
        )
        return header + data
    if kind == "video":
        w = 8 + 2 * (h % 8)        # even dims for 4:2:0 chroma
        ht = 8 + 2 * ((h >> 4) % 8)
        n_frames = 5 + (h >> 16) % 25
        frame_size = w * ht * 3 // 2  # planar YUV 4:2:0
        head = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, ht)
        body = b"".join(
            b"FRAME\n" + _blake_stream("%s|f%d" % (media_ref, i), frame_size)
            for i in range(n_frames)
        )
        return head + body
    raise NotImplementedError(f"unknown media kind: {kind!r}")


def _wav_chunks(payload: bytes):
    """Yield (chunk_id, offset, size) for a RIFF/WAVE payload."""
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _y4m_stream(payload: bytes):
    """Positional YUV4MPEG2 parse: ``(width, height, fps_num, fps_den,
    [frame_raster, ...])``.

    Frames are walked positionally — read one ``FRAME`` line (which per the
    spec may carry parameters, ``FRAME <params>\\n``), then consume exactly
    ``w*h*3//2`` raster bytes — never by splitting on the magic, since raw
    raster bytes can legally contain ``b"FRAME\\n"``.
    """
    header, _, body = payload.partition(b"\n")
    w = h = None
    num, den = 25, 1
    for param in header.split()[1:]:
        tag, val = param[:1], param[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(b":"))
    if not w or not h:
        raise NotImplementedError("YUV4MPEG2 stream header missing W/H")
    frame_size = w * h * 3 // 2  # planar 4:2:0
    frames = []
    pos = 0
    while pos < len(body):
        nl = body.index(b"\n", pos)
        if body[pos : pos + 5] != b"FRAME":
            raise NotImplementedError(
                "YUV4MPEG2 frame header expected at offset %d, got %r"
                % (pos, body[pos : pos + 5])
            )
        raster = body[nl + 1 : nl + 1 + frame_size]
        if len(raster) < frame_size:
            raise NotImplementedError("truncated YUV4MPEG2 frame")
        frames.append(raster)
        pos = nl + 1 + frame_size
    return w, h, num, den, frames


def parse_media_header(
    payload: bytes,
) -> Tuple[Optional[int], Optional[int], Optional[int]]:
    """(width, height, duration_ms) read from the container bytes.

    Magic-sniffed — the claimed span kind is never trusted. Raises
    ``NotImplementedError`` for containers this sandbox has no codec for
    (e.g. JPEG/MP3 magics), which is the swap point for real libraries.
    """
    if payload[:2] == b"P6":
        # P6 <ws> width <ws> height <ws> maxval <single-ws> raster
        fields = payload[2:64].split(None, 3)
        return int(fields[0]), int(fields[1]), None
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        # IHDR is mandated first: width/height at fixed offsets 16/20
        w, ht = struct.unpack_from(">II", payload, 16)
        return w, ht, None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate = channels = bits = None
        data_size = 0
        for cid, off, size in _wav_chunks(payload):
            if cid == b"fmt ":
                channels, rate = struct.unpack_from("<HI", payload, off + 2)
                bits = struct.unpack_from("<H", payload, off + 14)[0]
            elif cid == b"data":
                data_size = size
        if not rate:
            raise NotImplementedError("WAVE payload without fmt chunk")
        byte_rate = rate * channels * (bits // 8)
        return None, None, data_size * 1000 // byte_rate
    if payload[:9] == b"YUV4MPEG2":
        w, ht, num, den, frames = _y4m_stream(payload)
        return w, ht, len(frames) * 1000 * den // num
    raise NotImplementedError(
        "unsupported media container (no codec for this magic in this "
        "environment): %r" % payload[:8]
    )


def decode_media(payload: bytes) -> np.ndarray:
    """Fully decode a payload into raw samples (the real codec step).

    PPM/PNG → uint8 RGB raster (PNG via stdlib zlib inflate + de-filter);
    WAVE → int16 PCM samples; YUV4MPEG2 → uint8 plane bytes of all frames.
    Unrecognized magics raise (swap point).
    """
    if payload[:2] == b"P6":
        parts = payload.split(b"\n", 3)  # P6 / "w h" / maxval / raster
        w, ht = (int(x) for x in parts[1].split())
        raster = parts[3][: w * ht * 3]
        return np.frombuffer(raster, dtype=np.uint8)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _png_decode(payload)[2]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        for cid, off, size in _wav_chunks(payload):
            if cid == b"data":
                return np.frombuffer(payload[off : off + size], dtype="<i2")
        raise NotImplementedError("WAVE payload without data chunk")
    if payload[:9] == b"YUV4MPEG2":
        _, _, _, _, frames = _y4m_stream(payload)
        return np.frombuffer(b"".join(frames), dtype=np.uint8)
    raise NotImplementedError(
        "unsupported media container (no codec for this magic in this "
        "environment): %r" % payload[:8]
    )


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def media_payload_table(spans: DataFrame) -> DataFrame:
    """(doc_id, pos, kind, media_ref, payload) — the object-store read stage.

    Arrow-batched ``mapInPandas``; in production this is the only function
    that touches the store (ranged GETs per media_ref) — here the payloads
    are synthesized deterministically, in valid containers.
    """
    m = media_spans(spans)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pos": pdf["pos"],
                    "kind": pdf["kind"],
                    "media_ref": pdf["media_ref"],
                    "payload": [
                        synth_media_payload(ref, kind)
                        for ref, kind in zip(pdf["media_ref"], pdf["kind"])
                    ],
                }
            )

    return m.mapInPandas(fetch, schema=MEDIA_PAYLOAD_SCHEMA)


def with_media_meta(spans: DataFrame) -> DataFrame:
    """Typed metadata per media span, parsed from the container BYTES.

    width/height (PPM, Y4M), duration_ms (WAVE, Y4M) and n_bytes all come
    from ``parse_media_header`` over the binary payload column — never from
    the span row. Arrow-batched; the parse is header-only (no full decode).
    """
    payloads = media_payload_table(spans)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [parse_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pos": pdf["pos"],
                    "kind": pdf["kind"],
                    "media_ref": pdf["media_ref"],
                    "width": pd.array([m[0] for m in meta], dtype="Int32"),
                    "height": pd.array([m[1] for m in meta], dtype="Int32"),
                    "duration_ms": pd.array(
                        [m[2] for m in meta], dtype="Int64"
                    ),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return payloads.mapInPandas(parse, schema=MEDIA_META_SCHEMA)


def decode_and_featurize(spans: DataFrame) -> DataFrame:
    """Decode media payloads and extract a feature vector per span.

    The decode is REAL for the three self-describing containers
    (``decode_media``); the feature extractor is a deterministic histogram
    over the decoded samples, normalized — so downstream similarity
    plumbing (array<float> columns) is exercised with genuine decoded data.
    Arrow-batched; one Python worker per input partition.
    """
    payloads = media_payload_table(spans)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                samples = decode_media(bytes(payload))
                # int16 audio folds onto the same uint8 lattice as pixels
                arr = samples.astype(np.int64) & 0xFF
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                norm = float(np.linalg.norm(hist)) or 1.0
                feats.append((hist / norm).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pos": pdf["pos"],
                    "media_ref": pdf["media_ref"],
                    "payload": pdf["payload"],
                    "feature": feats,
                }
            )

    return payloads.mapInPandas(kernel, schema=MEDIA_FEATURE_SCHEMA)


RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("pos", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_image(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resample of a P6 or PNG image, re-encoded in kind.

    Pixel-center mapping (``src = floor((i + 0.5) * src_dim / dst_dim)``),
    the standard nearest-neighbor convention, so down- and up-scales are both
    deterministic and alignment-stable. Pure numpy fancy-indexing — no
    Python per-pixel loop. The output container matches the input's (P6→P6,
    PNG→PNG), so the thumbnail written back to the store is the same format
    a real pipeline would preserve. Unrecognized magics raise (same codec
    contract as ``decode_media``).
    """
    is_png = payload[: len(_PNG_SIG)] == _PNG_SIG
    if payload[:2] != b"P6" and not is_png:
        raise NotImplementedError(
            "resize_image: no codec for image magic: %r" % payload[:8]
        )
    w, h, _ = parse_media_header(payload)
    raster = decode_media(payload).reshape(h, w, 3)
    rows = np.minimum(
        ((np.arange(target_h) + 0.5) * h / target_h).astype(np.int64), h - 1
    )
    cols = np.minimum(
        ((np.arange(target_w) + 0.5) * w / target_w).astype(np.int64), w - 1
    )
    out = raster[rows[:, None], cols[None, :], :]
    if is_png:
        return encode_png(target_w, target_h, out.tobytes())
    return b"P6\n%d %d\n255\n" % (target_w, target_h) + out.tobytes()


def resize_ppm(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Back-compat alias for the P6-only entry point (see resize_image)."""
    if payload[:2] != b"P6":
        raise NotImplementedError(
            "resize_ppm: not a binary-PPM payload: %r" % payload[:8]
        )
    return resize_image(payload, target_w, target_h)


def resize_images(spans: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize every image span's raster to (target_w, target_h).

    The training-pipeline thumbnail stage: image payloads are fetched,
    decoded, resampled, and re-encoded as valid P6 containers whose headers
    downstream stages re-parse — the output column is bytes a real pipeline
    would write back to the object store. Plan-side filter on the span kind
    prunes non-images before any payload is fetched; the kernel is
    Arrow-batched ``mapInPandas`` with vectorized numpy resampling.
    """
    payloads = media_payload_table(spans.where(F.col("kind") == "image"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src_dims = [parse_media_header(p)[:2] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pos": pdf["pos"],
                    "media_ref": pdf["media_ref"],
                    "src_width": pd.array(
                        [d[0] for d in src_dims], dtype="Int32"
                    ),
                    "src_height": pd.array(
                        [d[1] for d in src_dims], dtype="Int32"
                    ),
                    "width": pd.array(
                        [target_w] * len(pdf), dtype="Int32"
                    ),
                    "height": pd.array(
                        [target_h] * len(pdf), dtype="Int32"
                    ),
                    "payload": [
                        resize_image(bytes(p), target_w, target_h)
                        for p in pdf["payload"]
                    ],
                }
            )

    return payloads.mapInPandas(kernel, schema=RESIZED_IMAGE_SCHEMA)


EXTRACTED_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("pos", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("luma_mean", DoubleType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_y4m_frames(payload: bytes, every_ms: int) -> list:
    """Split a Y4M payload into sampled frames (the per-payload codec step).

    Same sampling semantics as :func:`frame_sample_plan` (timestamps
    ``0..duration_ms`` step ``every_ms``; frame index ``ts*fps/1000``
    floored, clamped to the container's frame count). Returns
    ``[(frame_idx, ts_ms, width, height, luma_mean, frame_bytes), ...]``;
    unrecognized magics raise (codec contract).
    """
    if payload[:9] != b"YUV4MPEG2":
        raise NotImplementedError(
            "sample_y4m_frames: no codec for magic %r" % payload[:8]
        )
    w, h, num, den, frames = _y4m_stream(payload)
    duration_ms = len(frames) * 1000 * den // num
    luma = w * h  # planar 4:2:0: Y plane first
    out = []
    for ts in range(0, duration_ms + 1, every_ms):
        idx = min(ts * num // (1000 * den), len(frames) - 1)
        fb = frames[idx]
        y = np.frombuffer(fb[:luma], dtype=np.uint8)
        out.append((idx, ts, w, h, float(y.mean()), fb))
    return out


def extract_frames(spans: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Decode the sampled frames of every video span (the real extractor).

    The sampling/decode semantics live in :func:`sample_y4m_frames`; this
    operator runs them distributed: each video payload crosses the Arrow
    boundary once, and one row per sampled timestamp is emitted carrying the
    raw planar-YUV frame bytes plus the luma-plane mean — the shape a
    training pipeline writes back to the store. Expanding inside the kernel
    (not a join against the plan-side work list) means the multi-KB payload
    is never duplicated per frame in a shuffle.
    """
    payloads = media_payload_table(spans.where(F.col("kind") == "video"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "pos", "media_ref", "frame_idx", "ts_ms",
                "width", "height", "luma_mean", "frame",
            )}
            for doc_id, pos, ref, payload in zip(
                pdf["doc_id"], pdf["pos"], pdf["media_ref"], pdf["payload"]
            ):
                for idx, ts, w, h, luma, fb in sample_y4m_frames(
                    bytes(payload), every_ms
                ):
                    rows["doc_id"].append(doc_id)
                    rows["pos"].append(pos)
                    rows["media_ref"].append(ref)
                    rows["frame_idx"].append(idx)
                    rows["ts_ms"].append(ts)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["luma_mean"].append(luma)
                    rows["frame"].append(fb)
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(kernel, schema=EXTRACTED_FRAME_SCHEMA)


def frame_sample_plan(spans: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand video spans into a frame-sampling work list (timestamps).

    Duration comes from the parsed container header; the expansion itself
    is plan-side (``posexplode`` over a ``sequence``) — the shape a real
    frame extractor would consume, partitionable by doc.
    """
    v = with_media_meta(spans).where(
        F.col("kind") == "video"
    )
    return v.select(
        "doc_id",
        "pos",
        "media_ref",
        F.posexplode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col("duration_ms"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_idx", "ts_ms"),
    )

"""Multimodal columns: images/audio/video as opaque ``binary`` payloads with
typed metadata structs (north-star, BASELINE.json).

Spark-side design (all real and tested):

- schema: ``media: struct<payload: binary, meta: struct<media_type: string,
  n_bytes: bigint, content_md5: string>>`` — payload stays opaque; every
  engine operation (partitioning, dedup by md5, size filters) uses the
  typed metadata, so 100 TB of blobs never pass through Python;
- feature extraction: Arrow-batched ``mapInPandas`` over the binary column
  — the right shape for decode/resize/frame-sample at scale (one Python
  worker per partition, zero-copy Arrow transfer, bounded batch memory via
  ``spark.sql.execution.arrow.maxRecordsPerBatch``);
- decode: REAL for 24-bit uncompressed BMP (``decode_bmp24`` — pure
  struct/NumPy header+pixel parse: magic, pixel-data offset, signed height
  for bottom-up vs top-down row order, 4-byte row stride padding, BGR
  channel order; no codec library needed). Compressed codecs (JPEG/PNG/
  audio/video) stay gated behind an import-try in ``decode_image`` because
  PIL/librosa/ffmpeg are not in this container; ``fake_features`` remains
  the codec-free plumbing exerciser.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import col

FEATURE_SCHEMA = "id bigint, n_bytes bigint, byte_sum bigint, head_hash bigint"

BMP_FEATURE_SCHEMA = (
    "id bigint, width bigint, height bigint, "
    "r_sum bigint, g_sum bigint, b_sum bigint, "
    "r_mean double, g_mean double, b_mean double"
)


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a standard 24-bit uncompressed
    BMP file (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR
    channel order, rows padded to a 4-byte stride)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    padded = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order; RGB -> BGR
    padded[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return file_header + info_header + padded.tobytes()


def decode_bmp24(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL image decode for 24-bit uncompressed BMP: returns (width,
    height, (h, w, 3) uint8 RGB top-down array).

    Parses the actual format, not a private convention: 'BM' magic, pixel
    array offset from the file header (so extra header blocks are honored),
    signed biHeight (negative = top-down), 4-byte row stride, BGR order.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    _, w, h_signed, _, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rgb = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if h_signed > 0:  # bottom-up storage -> flip to top-down
        rgb = rgb[::-1]
    return w, h, rgb


def bmp_features(df: DataFrame, id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Decode BMP payloads and emit per-image features (dimensions, per-
    channel pixel sums and means) via Arrow-batched ``mapInPandas`` — the
    real decode path: one Python worker per partition, each batch decodes
    independently, nothing driver-side. Channel means are a single division
    of an exact integer sum by the exact pixel count (deterministic IEEE)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, rgb = decode_bmp24(bytes(payload))
                sums = rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n_px = float(w * h)
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                        sums[0] / n_px,
                        sums[1] / n_px,
                        sums[2] / n_px,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height",
                    "r_sum", "g_sum", "b_sum",
                    "r_mean", "g_mean", "b_mean",
                ],
            )

    flat = df.select(col(id_col).alias(id_col), col(payload_col).alias(payload_col))
    return flat.mapInPandas(featurize, BMP_FEATURE_SCHEMA)


def to_media_column(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap a binary (or string→utf8) column as the typed media struct."""
    payload = col(payload_col)
    if dict(df.dtypes)[payload_col] == "string":
        payload = F.encode(payload, "UTF-8")
    return df.select(
        col(id_col).alias("id"),
        F.struct(
            payload.alias("payload"),
            F.struct(
                F.lit(media_type).alias("media_type"),
                F.length(payload).alias("n_bytes"),
                F.md5(payload).alias("content_md5"),
            ).alias("meta"),
        ).alias("media"),
    )


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an image payload to (width, height, pixel array).

    Uncompressed 24-bit BMP decodes NATIVELY (:func:`decode_bmp24` parses
    the container — no codec library involved; this is the path the
    oracle-checked `multimodal_bmp_decode` query exercises). Codec formats
    (JPEG/PNG/WebP…) need an actual codec: import-gated on PIL, which this
    environment does not ship — a deployment that installs Pillow gets the
    full format set through the same call."""
    if payload[:2] == b"BM":
        return decode_bmp24(payload)
    try:  # pragma: no cover - codec libraries absent in this environment
        import io as _io

        import PIL.Image
    except ImportError as exc:
        raise NotImplementedError(
            "non-BMP image decode requires PIL (not available in this "
            "environment); BMP decodes natively via decode_bmp24"
        ) from exc
    img = PIL.Image.open(_io.BytesIO(payload))  # pragma: no cover
    arr = np.asarray(img.convert("RGB"))
    return img.width, img.height, arr


def fake_features(df: DataFrame) -> DataFrame:
    """Deterministic stand-in featurizer over media payloads via
    ``mapInPandas`` — exercises the real Arrow batch path with a decode-free
    feature: (payload length, byte sum, hash of the first 16 bytes)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(len),
                    "byte_sum": payloads.map(lambda b: sum(b) % 1_000_003),
                    "head_hash": payloads.map(
                        lambda b: int.from_bytes(b[:8].ljust(8, b"\0"), "big") % (1 << 31)
                    ),
                }
            )

    flat = df.select(col("media.payload").alias("payload"), col("id"))
    return flat.mapInPandas(featurize, FEATURE_SCHEMA)


WAV_FEATURE_SCHEMA = (
    "id bigint, n_frames bigint, channels bigint, sample_rate bigint, "
    "duration_s double, amp_sum bigint, amp_mean double, peak bigint"
)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_frames, channels) int16 array as a standard RIFF/WAVE
    file (PCM format 1, 16-bit little-endian, interleaved frames). A LIST
    metadata chunk is deliberately placed between fmt and data so decoders
    that assume data immediately follows fmt break loudly."""
    frames, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    info = b"INFOISFT\x06\x00\x00\x00mrgsp\x00"  # LIST/INFO software tag
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL audio decode for 16-bit PCM WAV: returns (sample_rate, channels,
    (n_frames, channels) int16 array).

    Parses the actual container: RIFF magic + WAVE form type, then a proper
    chunk walk (chunk ids + sizes, word-aligned) to locate fmt and data —
    unknown chunks (LIST, fact, cue…) are skipped, not assumed absent."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, channels)
    return sample_rate, channels, samples


def wav_features(df: DataFrame, id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Decode PCM WAV payloads and emit per-clip features (frame count,
    channel count, sample rate, duration, amplitude sum/mean, peak) via
    Arrow-batched ``mapInPandas`` — same distributed decode shape as
    ``bmp_features``: per-partition Python workers, zero driver involvement.
    amp_sum is an exact int64 sum; mean and duration are single exact-IEEE
    divisions, so the closed-form oracle agrees bit-for-bit."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, channels, samples = decode_wav_pcm16(bytes(payload))
                frames = samples.shape[0]
                flat = samples.astype(np.int64)
                amp_sum = int(flat.sum())
                rows.append(
                    (
                        doc_id,
                        frames,
                        channels,
                        rate,
                        frames / rate,
                        amp_sum,
                        amp_sum / (frames * channels),
                        int(np.abs(flat).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "n_frames", "channels", "sample_rate",
                    "duration_s", "amp_sum", "amp_mean", "peak",
                ],
            )

    flat = df.select(col(id_col).alias(id_col), col(payload_col).alias(payload_col))
    return flat.mapInPandas(featurize, WAV_FEATURE_SCHEMA)


def wav_frame_energy(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    window_frames: int = 160,
) -> DataFrame:
    """Windowed audio energy: decode PCM WAV and emit one row per
    ``window_frames``-frame window (the 20 ms-at-8 kHz hop speech pipelines
    use for VAD/silence trimming) with the exact int64 sum of squared
    samples across the window's frames and all channels (tail window
    partial). Integer arithmetic end-to-end, so the closed-form oracle is
    exact. Same Arrow ``mapInPandas`` shape as :func:`wav_features`; output
    grows ×(frames/window) but stays long-and-narrow."""

    def energize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, energy = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                _, _, samples = decode_wav_pcm16(bytes(payload))
                sq = samples.astype(np.int64) ** 2  # (frames, ch)
                frames = sq.shape[0]
                for w in range(0, (frames + window_frames - 1) // window_frames):
                    lo, hi = w * window_frames, min((w + 1) * window_frames, frames)
                    ids.append(doc_id)
                    widx.append(w)
                    energy.append(int(sq[lo:hi].sum()))
            yield pd.DataFrame({"id": ids, "window_idx": widx, "energy": energy})

    flat = df.select(col(id_col).alias(id_col), col(payload_col).alias(payload_col))
    return flat.mapInPandas(energize, "id bigint, window_idx bigint, energy bigint")


def wav_zero_crossings(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    window_frames: int = 160,
) -> DataFrame:
    """Windowed zero-crossing count: decode PCM WAV and emit, per
    ``window_frames``-frame window, the number of strict sign flips
    between consecutive frames of the SAME channel (v(i,c)·v(i+1,c) < 0 —
    the other classic VAD feature next to energy: voiced speech is
    low-ZCR/high-energy, fricatives and noise high-ZCR). A pair (i, i+1)
    belongs to the window containing i, so windows tile the pair index
    space exactly once; ``n_pairs`` carries the per-window denominator so
    the rate needs no float column. Pure integer comparisons on the
    decoded samples — the closed-form oracle replays every pair.
    Same Arrow ``mapInPandas`` shape and scale behavior as
    :func:`wav_frame_energy`: one pass over payload bytes, no shuffle."""

    def zcr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, cross, npairs = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                _, _, samples = decode_wav_pcm16(bytes(payload))
                s = samples.astype(np.int64)  # (frames, ch)
                frames, ch = s.shape
                flips = (s[:-1] * s[1:]) < 0  # (frames-1, ch)
                for w in range(0, (frames + window_frames - 1) // window_frames):
                    lo = w * window_frames
                    hi = min((w + 1) * window_frames, frames - 1)
                    ids.append(doc_id)
                    widx.append(w)
                    cross.append(int(flips[lo:hi].sum()))
                    npairs.append((hi - lo) * ch)
            yield pd.DataFrame(
                {"id": ids, "window_idx": widx, "crossings": cross, "n_pairs": npairs}
            )

    flat = df.select(col(id_col).alias(id_col), col(payload_col).alias(payload_col))
    return flat.mapInPandas(
        zcr, "id bigint, window_idx bigint, crossings bigint, n_pairs bigint"
    )


VIDEO_FEATURE_SCHEMA = (
    "id bigint, width bigint, height bigint, n_frames bigint, "
    "usec_per_frame bigint, duration_s double, n_sampled bigint, "
    "r_sum bigint, g_sum bigint, b_sum bigint, "
    "r_mean double, g_mean double, b_mean double"
)


def _pack_dib_rows(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> DIB bits: bottom-up rows, BGR, 4-byte stride."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return padded.tobytes()


def encode_avi_rgb24(frames: np.ndarray, usec_per_frame: int) -> bytes:
    """Encode an (n, h, w, 3) uint8 RGB frame stack as a standard AVI RIFF
    container with uncompressed DIB video ('vids'/'DIB '): LIST hdrl
    (MainAVIHeader + one stream's strh/strf) followed by LIST movi holding
    one word-aligned '00db' chunk per frame (bottom-up BGR rows, 4-byte
    stride — the same DIB bit layout as BMP)."""
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame, frame_bytes * 1_000_000 // max(usec_per_frame, 1), 0,
        0, n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids", b"DIB ", 0, 0, 0, 0,
        usec_per_frame, 1_000_000,  # rate/scale = fps
        0, n, frame_bytes, -1, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\0" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00db", _pack_dib_rows(f)) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk_riff(payload: bytes, pos: int, end: int):
    """Yield (chunk_id, list_type_or_None, body_start, body_size) over a
    RIFF chunk range; word-aligned advance."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"LIST":
            yield cid, payload[pos + 8 : pos + 12], pos + 12, size - 4
        else:
            yield cid, None, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi_rgb24(payload: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """REAL video decode for uncompressed-DIB AVI: returns (width, height,
    n_frames, usec_per_frame, (n, h, w, 3) uint8 RGB top-down stack).

    Walks the actual RIFF structure — 'RIFF'+'AVI ' form check, LIST
    recursion into hdrl for the MainAVIHeader, then every word-aligned
    '00db' chunk inside LIST movi becomes one frame (4-byte row stride,
    bottom-up, BGR). Unknown chunks/lists (idx1, INFO, JUNK…) are skipped
    by the walk, not assumed absent."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = n = usec = None
    frames: list[np.ndarray] = []
    for cid, ltype, start, size in _walk_riff(payload, 12, len(payload)):
        if cid == b"LIST" and ltype == b"hdrl":
            for cid2, _, s2, sz2 in _walk_riff(payload, start, start + size):
                if cid2 == b"avih":
                    vals = struct.unpack_from("<IIIIIIIIII", payload, s2)
                    usec, n, w, h = vals[0], vals[4], vals[8], vals[9]
        elif cid == b"LIST" and ltype == b"movi":
            if w is None:
                raise ValueError("movi before hdrl")
            stride = (w * 3 + 3) & ~3
            for cid2, _, s2, sz2 in _walk_riff(payload, start, start + size):
                if cid2 == b"00db":
                    raw = np.frombuffer(payload, np.uint8, count=stride * h, offset=s2)
                    frames.append(raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1])
    if w is None or not frames:
        raise ValueError("missing hdrl or movi frames")
    if n != len(frames):
        raise ValueError(f"header says {n} frames, movi has {len(frames)}")
    return w, h, n, usec, np.stack(frames)


def video_frame_sample_features(
    df: DataFrame, sample_stride: int = 2, id_col: str = "id", payload_col: str = "payload"
) -> DataFrame:
    """Decode AVI payloads, FRAME-SAMPLE every ``sample_stride``-th frame
    (indices 0, s, 2s, … — the standard cheap keyframe policy for video
    featurization), and emit per-clip features: container metadata plus
    exact per-channel pixel sums/means over the sampled frames. Same
    distributed Arrow mapInPandas shape as bmp/wav_features — per-partition
    Python workers, bounded batches, zero driver involvement; only the
    sampled frames are ever touched after the header walk."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, n, usec, stack = decode_avi_rgb24(bytes(payload))
                sampled = stack[::sample_stride]
                ns = sampled.shape[0]
                sums = sampled.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n_px = float(ns * w * h)
                rows.append(
                    (doc_id, w, h, n, usec, n * usec / 1_000_000.0, ns,
                     int(sums[0]), int(sums[1]), int(sums[2]),
                     sums[0] / n_px, sums[1] / n_px, sums[2] / n_px)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "n_frames", "usec_per_frame",
                    "duration_s", "n_sampled",
                    "r_sum", "g_sum", "b_sum", "r_mean", "g_mean", "b_mean",
                ],
            )

    flat = df.select(col(id_col).alias(id_col), col(payload_col).alias(payload_col))
    return flat.mapInPandas(featurize, VIDEO_FEATURE_SCHEMA)


AHASH_SCHEMA = "id bigint, width int, height int, ahash_hi bigint, ahash_lo bigint"


def ahash_halves(rgb: np.ndarray) -> tuple[int, int]:
    """64-bit average-hash of one decoded (h, w, 3) image, as (hi, lo)
    32-bit halves. Gray proxy is r+g+b (scale cancels in the comparison);
    pixel row r maps to block row (r·8)//h (standard integer box mapping);
    bit k = bi·8+bj is set iff sum_block·n_pixels > sum_image·n_block —
    integer cross-multiplication, no float division, so any engine
    replaying the pixel math reproduces every bit."""
    h, w = rgb.shape[0], rgb.shape[1]
    g3 = rgb.sum(axis=2, dtype=np.int64)
    total = int(g3.sum())
    npx = w * h
    bi = (np.arange(h, dtype=np.int64) * 8) // h
    bj = (np.arange(w, dtype=np.int64) * 8) // w
    row_onehot = (bi[:, None] == np.arange(8)[None, :]).astype(np.int64)
    col_onehot = (bj[:, None] == np.arange(8)[None, :]).astype(np.int64)
    sb = row_onehot.T @ g3 @ col_onehot  # 8x8 block sums
    nb = row_onehot.sum(axis=0)[:, None] * col_onehot.sum(axis=0)[None, :]
    # cross-multiply in PYTHON ints (ADVICE r6 #4): sb·npx is ≤ 765·npx²,
    # which wraps int64 silently past ~1e8 pixels (NumPy doesn't raise);
    # 64 arbitrary-precision comparisons per image are free next to decode
    sb_l, nb_l = sb.tolist(), nb.tolist()
    bits = np.fromiter(
        (
            1 if sb_l[i][j] * npx > total * nb_l[i][j] else 0
            for i in range(8)
            for j in range(8)
        ),
        dtype=np.uint64,
        count=64,
    )
    ks = np.arange(64, dtype=np.uint64)
    lo = int((bits[:32] << ks[:32]).sum())
    hi = int((bits[32:] << ks[:32]).sum())
    return hi, lo


def bmp_ahash(df: DataFrame, id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Perceptual average-hash (aHash) of BMP payloads — the classic
    image near-dup fingerprint: decode, collapse to a gray intensity,
    area-map onto an 8×8 grid (pixel row r → block (r·8)//h, the standard
    integer box mapping), and set bit k = [block-mean > image-mean]. All
    comparisons are integer cross-multiplications (sum_block · n_pixels >
    sum_image · n_block) — no float division anywhere, so the 64 hash bits
    are bit-identical on any engine that replays the pixel math. The hash
    is emitted as two BIGINT halves (``ahash_hi``/``ahash_lo``) because a
    1<<63 top bit has engine-specific signed-overflow behavior. Runs as
    Arrow-batched ``mapInPandas`` (one decode + NumPy block reduce per
    image, nothing driver-side); grouping/joining on the hash downstream
    is an ordinary key shuffle."""

    def hasher(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, rgb = decode_bmp24(bytes(payload))
                hi, lo = ahash_halves(rgb)
                rows.append((doc_id, w, h, hi, lo))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "ahash_hi", "ahash_lo"]
            )

    flat = df.select(col(id_col).alias(id_col), col(payload_col).alias(payload_col))
    return flat.mapInPandas(hasher, AHASH_SCHEMA)

"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample as Arrow
batch kernels over ``mapInPandas``.

The decode step is REAL for codec-free uncompressed formats — all of them
public, header-documented container formats parseable with nothing but
``np.frombuffer``:

- images: 24-bit uncompressed **BMP** (BITMAPINFOHEADER, bottom-up or
  top-down rows, BGR byte order, rows padded to 4-byte boundaries),
- audio: **WAV** PCM 16-bit mono (RIFF chunk walk),
- video: **Y4M** (YUV4MPEG2) with the ``Cmono`` colorspace (plain-text
  stream header + ``FRAME`` markers, one luma plane per frame).

Compressed formats (JPEG/PNG/MP3/H.264) genuinely need codec libraries this
container does not ship; those payloads raise ``NotImplementedError`` at the
magic-byte check — the kernels around them are the real thing a libjpeg/PIL
call would drop into.

Scale shape: every kernel here is ``mapInPandas`` over a projection of
(id, payload) — partition-preserving, shuffle-free, with per-row working
sets (one decoded image/clip at a time, never a batch-sized intermediate).
At 100 TB the decode stage is embarrassingly parallel and scan-bound.

The reference engine has no multimodal surface (brief-driven component, see
SURVEY.md §2); ``synthesize_media`` provides the deterministic fixture the
driver's DuckDB oracle replicates in closed form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

_COMPRESSED_MAGICS = {
    b"\xff\xd8\xff": "JPEG",
    b"\x89PNG": "PNG",
    b"GIF8": "GIF",
    b"ID3": "MP3",
    b"\xff\xfb": "MP3",
    b"OggS": "Ogg",
    b"\x00\x00\x00": "MP4-family",
}


def _reject_compressed(buf: bytes, want: str):
    for magic, name in _COMPRESSED_MAGICS.items():
        if buf[: len(magic)] == magic:
            raise NotImplementedError(
                f"STUB: {name} decoding needs codec libraries this container "
                f"does not ship; supported {want} formats are codec-free "
                "(BMP-24/WAV-PCM16/Y4M-mono)"
            )


# --------------------------------------------------------------- encoders
# (public-format writers; used by synthesize_media and resize re-encode)


def _encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit uncompressed BMP from an (h, w, 3) uint8 RGB array — standard
    layout: BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR order,
    rows zero-padded to 4-byte multiples."""
    h, w, _ = rgb.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    img_size = stride * h
    header = np.zeros(54, dtype=np.uint8)
    header[0:2] = np.frombuffer(b"BM", dtype=np.uint8)
    header[2:6] = np.frombuffer(np.uint32(54 + img_size).tobytes(), dtype=np.uint8)
    header[10:14] = np.frombuffer(np.uint32(54).tobytes(), dtype=np.uint8)
    header[14:18] = np.frombuffer(np.uint32(40).tobytes(), dtype=np.uint8)
    header[18:22] = np.frombuffer(np.int32(w).tobytes(), dtype=np.uint8)
    header[22:26] = np.frombuffer(np.int32(h).tobytes(), dtype=np.uint8)  # bottom-up
    header[26:28] = np.frombuffer(np.uint16(1).tobytes(), dtype=np.uint8)
    header[28:30] = np.frombuffer(np.uint16(24).tobytes(), dtype=np.uint8)
    header[34:38] = np.frombuffer(np.uint32(img_size).tobytes(), dtype=np.uint8)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row] = rgb[::-1, :, ::-1].reshape(h, row)  # flip rows, RGB→BGR
    return header.tobytes() + body.tobytes()


def _encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """WAV PCM 16-bit mono from an int16 array (RIFF/fmt/data chunks)."""
    pcm = samples.astype("<i2").tobytes()
    n = len(pcm)

    def u32(x):
        return np.uint32(x).tobytes()

    def u16(x):
        return np.uint16(x).tobytes()

    return (
        b"RIFF" + u32(36 + n) + b"WAVE"
        + b"fmt " + u32(16) + u16(1) + u16(1) + u32(sample_rate)
        + u32(sample_rate * 2) + u16(2) + u16(16)
        + b"data" + u32(n) + pcm
    )


def _encode_y4m(frames: np.ndarray) -> bytes:
    """Y4M (YUV4MPEG2) mono-colorspace stream from an (f, h, w) uint8 luma
    array: text stream header, then ``FRAME\\n`` + one luma plane per frame."""
    f, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode()
    return head + b"".join(b"FRAME\n" + fr.tobytes() for fr in frames)


# ---------------------------------------------------------------- parsers
# (numpy header-parse decoders; plain functions, unit-testable off-Spark)


def _parse_bmp(buf: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.
    Handles bottom-up (positive height) and top-down (negative height) rows,
    BGR byte order, and 4-byte row padding."""
    _reject_compressed(buf, "image")
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) < 54 or bytes(b[:2]) != b"BM":
        raise ValueError("not a BMP payload")
    offset = int(b[10:14].view("<u4")[0])
    w = int(b[18:22].view("<i4")[0])
    h_raw = int(b[22:26].view("<i4")[0])
    bpp = int(b[28:30].view("<u2")[0])
    compression = int(b[30:34].view("<u4")[0])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"STUB: only 24-bit uncompressed BMP is supported "
            f"(got bpp={bpp}, compression={compression})"
        )
    h = abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    if offset + stride * h > len(b):
        raise ValueError(
            f"truncated BMP stream: pixel array needs {stride * h} bytes "
            f"at offset {offset}, buffer has {len(b)}"
        )
    rows = b[offset : offset + stride * h].reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if h_raw > 0:
        img = img[::-1]  # bottom-up → top-down
    return np.ascontiguousarray(img)


def _parse_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV PCM-16 mono payload to (int16 samples, sample_rate),
    walking RIFF chunks (fmt may be preceded/followed by LIST etc.)."""
    _reject_compressed(buf, "audio")
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int(np.frombuffer(buf[pos + 4 : pos + 8], dtype="<u4")[0])
        if size > len(buf) - pos - 8:
            raise ValueError(
                f"truncated WAV stream: chunk {cid!r} declares {size} bytes "
                f"but only {len(buf) - pos - 8} remain"
            )
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int(np.frombuffer(body[0:2], dtype="<u2")[0])
            channels = int(np.frombuffer(body[2:4], dtype="<u2")[0])
            rate = int(np.frombuffer(body[4:8], dtype="<u4")[0])
            bits = int(np.frombuffer(body[14:16], dtype="<u2")[0])
            if fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"STUB: only PCM-16 mono WAV is supported "
                    f"(got fmt={fmt}, channels={channels}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2"), rate


def _parse_y4m(buf: bytes) -> np.ndarray:
    """Decode a Y4M mono stream to an (n_frames, h, w) uint8 luma array."""
    _reject_compressed(buf, "video")
    nl = buf.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream: unterminated stream header")
    head = buf[:nl].decode("ascii", errors="replace")
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    w = h = None
    cspace = "C420"
    for tok in head.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C":
            cspace = tok
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if cspace != "Cmono":
        raise NotImplementedError(
            f"STUB: only Cmono Y4M is supported (got {cspace}); chroma "
            "upsampling for 4:2:0 belongs to a codec library"
        )
    frames = []
    pos = nl + 1
    fsize = w * h
    while pos < len(buf):
        fnl = buf.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated Y4M stream: unterminated FRAME header")
        if not buf[pos:fnl].startswith(b"FRAME"):
            raise ValueError("Y4M frame marker missing")
        if fnl + 1 + fsize > len(buf):
            raise ValueError(
                f"truncated Y4M stream: frame needs {fsize} bytes, "
                f"{len(buf) - fnl - 1} remain"
            )
        plane = np.frombuffer(buf[fnl + 1 : fnl + 1 + fsize], dtype=np.uint8)
        frames.append(plane.reshape(h, w))
        pos = fnl + 1 + fsize
    return np.stack(frames) if frames else np.zeros((0, h, w), dtype=np.uint8)


# -------------------------------------------------------------- synthesis

VIDEO_W, VIDEO_H = 16, 8


def synthesize_media(spark, n_rows: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL binary payloads: id % 3 cycles
    BMP image / WAV audio / Y4M video. Pixel, sample, and luma values are
    closed-form in (seed, id, position) so a SQL oracle can recompute every
    downstream statistic without parsing bytes:

    - image ``id``: w=13+id%5, h=7+id%4 (odd widths exercise BMP row pad);
      r=(seed+id+3x+7y)%256, g=(seed+2id+5x+11y)%256, b=(seed+3id+13x+17y)%256
    - audio ``id``: rate=8000, n=100+id%50; s(i)=(seed+31id+17i)%2003-1001
    - video ``id``: 16×8, f=1+id%4 frames; luma=(seed+id+3f+5x+7y)%256
    """

    def gen(batches):
        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                if i % 3 == 0:
                    w, h = 13 + i % 5, 7 + i % 4
                    y, x = np.mgrid[0:h, 0:w]
                    rgb = np.stack(
                        [
                            (seed + i + 3 * x + 7 * y) % 256,
                            (seed + 2 * i + 5 * x + 11 * y) % 256,
                            (seed + 3 * i + 13 * x + 17 * y) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    out["kind"].append("image")
                    out["payload"].append(_encode_bmp(rgb))
                    out["meta"].append(
                        {"width": w, "height": h, "n_frames": 1, "sample_rate": 0}
                    )
                elif i % 3 == 1:
                    n = 100 + i % 50
                    idx = np.arange(n)
                    s = ((seed + 31 * i + 17 * idx) % 2003 - 1001).astype(np.int16)
                    out["kind"].append("audio")
                    out["payload"].append(_encode_wav(s, 8000))
                    out["meta"].append(
                        {"width": 0, "height": 0, "n_frames": 0, "sample_rate": 8000}
                    )
                else:
                    nf = 1 + i % 4
                    f, y, x = np.mgrid[0:nf, 0:VIDEO_H, 0:VIDEO_W]
                    luma = ((seed + i + 3 * f + 5 * x + 7 * y) % 256).astype(np.uint8)
                    out["kind"].append("video")
                    out["payload"].append(_encode_y4m(luma))
                    out["meta"].append(
                        {
                            "width": VIDEO_W,
                            "height": VIDEO_H,
                            "n_frames": nf,
                            "sample_rate": 0,
                        }
                    )
                out["media_id"].append(i)
            yield pd.DataFrame(out)

    return spark.range(n_rows).mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------- decoders


def decode_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Real BMP decode: binary in → row-major top-down RGB pixel array out.
    Returns [<id_col>, width, height, pixels array<int>] (pixels interleaved
    R,G,B per position). Compressed payloads raise NotImplementedError."""

    def kernel(batches):
        for pdf in batches:
            ids, ws, hs, px = [], [], [], []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                img = _parse_bmp(bytes(buf))
                h, w, _ = img.shape
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                px.append(img.reshape(-1).astype(np.int32))
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "pixels": px}
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_type}, width int, height int, pixels array<int>"
    )


def decode_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Real WAV PCM-16 decode. Returns
    [<id_col>, sample_rate, n_samples, samples array<int>]."""

    def kernel(batches):
        for pdf in batches:
            ids, rates, ns, ss = [], [], [], []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = _parse_wav(bytes(buf))
                ids.append(mid)
                rates.append(rate)
                ns.append(len(samples))
                ss.append(samples.astype(np.int32))
            yield pd.DataFrame(
                {id_col: ids, "sample_rate": rates, "n_samples": ns, "samples": ss}
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, payload_col).mapInPandas(
        kernel,
        f"{id_col} {id_type}, sample_rate int, n_samples int, samples array<int>",
    )


def decode_video_frames(
    df: DataFrame,
    every_n: int = 1,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Real Y4M decode + frame sampling: one output row per kept frame
    (indices 0, n, 2n, …). Returns
    [<id_col>, frame_idx, width, height, luma array<int>]."""

    def kernel(batches):
        for pdf in batches:
            rows = {id_col: [], "frame_idx": [], "width": [], "height": [], "luma": []}
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                frames = _parse_y4m(bytes(buf))
                nf, h, w = frames.shape
                for fi in range(0, nf, every_n):
                    rows[id_col].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["luma"].append(frames[fi].reshape(-1).astype(np.int32))
            yield pd.DataFrame(rows)

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, payload_col).mapInPandas(
        kernel,
        f"{id_col} {id_type}, frame_idx int, width int, height int, "
        "luma array<int>",
    )


# ------------------------------------------------------- fused decode+stats
# The scale path: decode and reduce inside ONE kernel, so full pixel/sample
# arrays never materialize as Spark rows. Integer outputs are exact —
# position- and channel-weighted sums catch any mis-parse of row order
# (bottom-up flip), byte order (BGR), or row padding.


def image_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Per-image integer stats from a real BMP decode: per-channel sums and a
    position-weighted checksum wsum = Σ_p (p+1)·(r+2g+3b), p row-major
    top-down. Returns [<id_col>, width, height, sum_r, sum_g, sum_b, wsum]."""

    def kernel(batches):
        for pdf in batches:
            rows = {
                id_col: [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [], "wsum": [],
            }
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                img = _parse_bmp(bytes(buf)).astype(np.int64)
                h, w, _ = img.shape
                flat = img.reshape(-1, 3)
                weights = np.arange(1, h * w + 1, dtype=np.int64)
                rows[id_col].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(int(flat[:, 0].sum()))
                rows["sum_g"].append(int(flat[:, 1].sum()))
                rows["sum_b"].append(int(flat[:, 2].sum()))
                rows["wsum"].append(
                    int((weights * (flat[:, 0] + 2 * flat[:, 1] + 3 * flat[:, 2])).sum())
                )
            yield pd.DataFrame(rows)

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, payload_col).mapInPandas(
        kernel,
        f"{id_col} {id_type}, width int, height int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, wsum bigint",
    )


def audio_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Per-clip integer stats from a real WAV decode: Σs, Σ|s|, and the
    order-sensitive wsum = Σ (i+1)·s(i). Returns
    [<id_col>, sample_rate, n_samples, sum_amp, sum_abs, wsum]."""

    def kernel(batches):
        for pdf in batches:
            rows = {
                id_col: [], "sample_rate": [], "n_samples": [],
                "sum_amp": [], "sum_abs": [], "wsum": [],
            }
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                s, rate = _parse_wav(bytes(buf))
                s = s.astype(np.int64)
                idx = np.arange(1, len(s) + 1, dtype=np.int64)
                rows[id_col].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(s))
                rows["sum_amp"].append(int(s.sum()))
                rows["sum_abs"].append(int(np.abs(s).sum()))
                rows["wsum"].append(int((idx * s).sum()))
            yield pd.DataFrame(rows)

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, payload_col).mapInPandas(
        kernel,
        f"{id_col} {id_type}, sample_rate int, n_samples int, "
        "sum_amp bigint, sum_abs bigint, wsum bigint",
    )


def video_frame_stats(
    df: DataFrame,
    every_n: int = 1,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-sampled-frame integer stats from a real Y4M decode:
    [<id_col>, frame_idx, sum_luma, wsum] with wsum = Σ_p (p+1)·luma(p)."""

    def kernel(batches):
        for pdf in batches:
            rows = {id_col: [], "frame_idx": [], "sum_luma": [], "wsum": []}
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                frames = _parse_y4m(bytes(buf)).astype(np.int64)
                nf, h, w = frames.shape
                weights = np.arange(1, h * w + 1, dtype=np.int64)
                for fi in range(0, nf, every_n):
                    plane = frames[fi].reshape(-1)
                    rows[id_col].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["sum_luma"].append(int(plane.sum()))
                    rows["wsum"].append(int((weights * plane).sum()))
            yield pd.DataFrame(rows)

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, payload_col).mapInPandas(
        kernel,
        f"{id_col} {id_type}, frame_idx int, sum_luma bigint, wsum bigint",
    )


# ------------------------------------------------- generic feature extract


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 32,
) -> DataFrame:
    """Format-agnostic payload featurizer: fold raw bytes into ``dim``
    buckets and L2-normalize — the stand-in for a learned embedding model
    (which would be an identical Arrow kernel with a model call inside).
    Returns [<id_col>, features array<float>]."""

    def kernel(batches):
        for pdf in batches:
            feats = []
            for buf in pdf[payload_col]:
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                pad = (-len(b)) % dim
                folded = np.pad(b, (0, pad)).reshape(-1, dim).sum(axis=0)
                v = folded.astype(np.float64)
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_type}, features array<float>"
    )


# ----------------------------------------------------------------- resize


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Real nearest-neighbor resize: BMP in → decode → NN index sample →
    re-encode BMP out with updated meta. Arrow-batched, partition-preserving.
    Returns [<id_col>, payload, meta]."""

    def kernel(batches):
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                img = _parse_bmp(bytes(buf))
                h, w, _ = img.shape
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                resized = img[ys][:, xs]
                ids.append(mid)
                payloads.append(_encode_bmp(resized))
                metas.append(
                    {"width": width, "height": height, "n_frames": 1,
                     "sample_rate": 0}
                )
            yield pd.DataFrame({id_col: ids, "payload": payloads, "meta": metas})

    id_type = dict(df.dtypes)[id_col]
    meta_t = "struct<width:int,height:int,n_frames:int,sample_rate:int>"
    return (
        df.filter(F.col("kind") == "image")
        .select(id_col, payload_col)
        .mapInPandas(kernel, f"{id_col} {id_type}, payload binary, meta {meta_t}")
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 5,
    id_col: str = "media_id",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-index sampling plan from metadata only (no payload scan):
    explodes indices 0, n, 2n … per video row via a JVM ``sequence`` — the
    cheap planner-side companion to ``decode_video_frames``. Returns
    [<id_col>, frame_idx]."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col(f"{meta_col}.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


# ------------------------------------------------- perceptual image hashing
# Near-duplicate image detection without a codec stack: decode (BMP),
# grayscale, nearest-neighbor downsample, threshold — aHash / dHash (public
# recipes; e.g. the classic pHash.org / Krawetz descriptions). All integer
# arithmetic, so the synthesized fixture's closed-form pixels make every
# hash SQL-replayable bit-for-bit.


def _gray1000(img: np.ndarray) -> np.ndarray:
    """Integer luma ×1000: 299·R + 587·G + 114·B (the ITU-R BT.601 weights
    scaled to integers — exact, oracle-replayable; no float rounding)."""
    p = img.astype(np.int64)
    return 299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]


def _nn_grid(src: int, dst: int) -> np.ndarray:
    """Nearest-neighbor index map (the resize_images convention):
    position i of dst samples source index (i*src)//dst."""
    return (np.arange(dst) * src) // dst


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major bit-pack to a SIGNED 64-bit int (bit k of flat position k;
    two's-complement wrap for bit 63 — matches BIGINT in Spark/DuckDB)."""
    flat = bits.reshape(-1).astype(np.uint64)
    val = 0
    for k, b in enumerate(flat):
        if b:
            val |= 1 << k
    return val - (1 << 64) if val >= (1 << 63) else val


def image_phash(
    df: DataFrame,
    method: str = "dhash",
    hash_size: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-image 64-bit perceptual hash from a real BMP decode. Returns
    [<id_col>, width, height, phash bigint].

    - ``dhash``: NN-downsample the integer luma to (hash_size+1) ×
      hash_size, set bit (row·hash_size + col) iff gray[row][col+1] >
      gray[row][col] — the gradient hash; robust to uniform brightness
      shifts.
    - ``ahash``: NN-downsample to hash_size × hash_size, set each bit iff
      the cell exceeds the image's mean cell value (strict >; integer
      compare ``cell · N > Σcells`` avoids any float mean).

    hash_size must satisfy hash_size² ≤ 64 (one BIGINT). The kernel is the
    standard fused decode+reduce shape: mapInPandas over (id, payload),
    shuffle-free, per-row working set."""
    if method not in ("dhash", "ahash"):
        raise ValueError(f"method must be dhash|ahash, got {method!r}")
    if hash_size < 2 or hash_size * hash_size > 64:
        raise ValueError(
            f"hash_size must be in [2, 8] (hash_size^2 <= 64 bits), "
            f"got {hash_size}"
        )

    def kernel(batches):
        for pdf in batches:
            rows = {id_col: [], "width": [], "height": [], "phash": []}
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                img = _parse_bmp(bytes(buf))
                h, w, _ = img.shape
                gray = _gray1000(img)
                ys = _nn_grid(h, hash_size)
                if method == "dhash":
                    xs = _nn_grid(w, hash_size + 1)
                    cells = gray[np.ix_(ys, xs)]
                    bits = cells[:, 1:] > cells[:, :-1]
                else:
                    xs = _nn_grid(w, hash_size)
                    cells = gray[np.ix_(ys, xs)]
                    bits = cells * cells.size > cells.sum()
                rows[id_col].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["phash"].append(_pack_bits(bits))
            yield pd.DataFrame(rows)

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_type}, width int, height int, phash bigint"
    )


def phash_duplicates(
    hashes: DataFrame,
    max_distance: int = 3,
    num_bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate pairs by Hamming distance over 64-bit perceptual
    hashes — the banded-LSH shape (the MinHash dedup recipe applied to
    bit-space): split each hash into ``num_bands`` contiguous bit bands,
    bucket-join on (band, band_value), then verify candidates with
    ``bit_count(h1 XOR h2) <= max_distance``. By pigeonhole the recall is
    EXACT when ``max_distance < num_bands`` (fewer flipped bits than bands
    ⇒ at least one band untouched); larger distances degrade to LSH recall
    and are rejected. Returns [id_a, id_b, hamming] with id_a < id_b,
    deduplicated across bands.

    Scale shape: one short-key shuffle on the band buckets (64/num_bands
    bits each), candidate verification is a JVM bit op — no all-pairs step
    anywhere; identical to the text MinHash banding already proven at
    scale (dedup.py)."""
    if not 0 <= max_distance < num_bands:
        raise ValueError(
            f"exact recall needs max_distance < num_bands "
            f"(got d={max_distance}, bands={num_bands})"
        )
    if 64 % num_bands != 0:
        raise ValueError(f"num_bands must divide 64, got {num_bands}")
    width = 64 // num_bands
    h = hashes.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )

    def _band_val(b: int) -> F.Column:
        col = F.shiftrightunsigned(F.col("_h"), b * width)
        if width < 64:
            # full-width band (num_bands=1, the exact-duplicate config)
            # needs no mask — and (1<<64)-1 overflows a signed long literal
            col = col.bitwiseAND(F.lit((1 << width) - 1))
        return col

    bands = h.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _band_val(b).alias("val")
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bv"),
    ).select("_id", "_h", "bv.band", "bv.val")
    left = bands.select(
        "band", "val", F.col("_id").alias("id_a"), F.col("_h").alias("h_a")
    )
    right = bands.select(
        "band", "val", F.col("_id").alias("id_b"), F.col("_h").alias("h_b")
    )
    pairs = (
        left.join(right, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("h_a").bitwiseXOR(F.col("h_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()  # a close pair can collide in several bands
    )
    return pairs


# ------------------------------------------------------ audio quality flags
# The WAV-side analog of the text quality filters: cheap per-clip integer
# statistics that decide keep/drop for a training corpus — silence and
# clipping fractions, peak, and total energy. Exact integers, so the
# synthesized fixture's closed-form samples make every value
# SQL-replayable.


def audio_quality(
    df: DataFrame,
    silence_threshold: int = 100,
    clip_threshold: int = 32000,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-clip quality flags from a real WAV PCM-16 decode. Returns
    [<id_col>, sample_rate, n_samples, n_silent, n_clipped, peak,
    energy, silence_ratio, clipping_ratio]:

    - ``n_silent``  = #{i : |s(i)| ≤ silence_threshold}
    - ``n_clipped`` = #{i : |s(i)| ≥ clip_threshold} (near-full-scale —
      the standard clipping detector for 16-bit PCM, where true clipping
      pins samples at ±32767/-32768)
    - ``peak``      = max |s(i)| (0 for an empty clip)
    - ``energy``    = Σ s(i)² (int64-exact: ≤ 2³⁰ per sample)
    - ratios are the counts over n_samples (0.0 for an empty clip)."""
    if silence_threshold < 0 or clip_threshold <= silence_threshold:
        raise ValueError(
            "need 0 <= silence_threshold < clip_threshold, got "
            f"{silence_threshold} / {clip_threshold}"
        )

    def kernel(batches):
        for pdf in batches:
            rows = {
                id_col: [], "sample_rate": [], "n_samples": [],
                "n_silent": [], "n_clipped": [], "peak": [], "energy": [],
            }
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                s, rate = _parse_wav(bytes(buf))
                a = np.abs(s.astype(np.int64))
                rows[id_col].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(s))
                rows["n_silent"].append(int((a <= silence_threshold).sum()))
                rows["n_clipped"].append(int((a >= clip_threshold).sum()))
                rows["peak"].append(int(a.max()) if len(s) else 0)
                rows["energy"].append(int((a * a).sum()))
            yield pd.DataFrame(rows)

    id_type = dict(df.dtypes)[id_col]
    base = df.select(id_col, payload_col).mapInPandas(
        kernel,
        f"{id_col} {id_type}, sample_rate int, n_samples int, "
        "n_silent bigint, n_clipped bigint, peak bigint, energy bigint",
    )
    n = F.col("n_samples")
    ratio = lambda c: F.when(n > 0, F.col(c).cast("double") / n).otherwise(0.0)  # noqa: E731
    return base.select(
        "*",
        ratio("n_silent").alias("silence_ratio"),
        ratio("n_clipped").alias("clipping_ratio"),
    )

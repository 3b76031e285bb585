"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a typed metadata
struct, processed via Arrow-batched mapInPandas.

Codec status: ``decode_real`` is a REAL byte-level decoder for uncompressed
24-bit BMP, binary PPM (P6), non-interlaced 8-bit RGB PNG including all
five scanline filters (None/Sub/Up/Average/Paeth) via the stdlib zlib, and
— since round 5 — baseline JFIF JPEG (SOF0, Huffman entropy decode, IDCT,
4:4:4/4:2:0 chroma, restart markers) via ``operators/jpeg.py``.
``decode_stub`` remains only as the declared fake-decode plumbing shape for
formats with no codec (e.g. proprietary video containers).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = "id bigint, data binary, media_type string, byte_size bigint, magic string"
DECODED_SCHEMA = (
    "id bigint, media_type string, byte_size bigint, width bigint, height bigint, "
    "n_pixels bigint, content_sha string"
)


def to_blob(df: DataFrame, id_col: str, payload_col: str, media_type: str = "text/plain") -> DataFrame:
    """Wrap a column as an opaque binary blob with typed metadata."""
    data = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("id"),
        data.alias("data"),
        F.lit(media_type).alias("media_type"),
        F.length(data).cast("bigint").alias("byte_size"),
        F.hex(F.substring(data, 1, 4)).alias("magic"),
    )


def decode_stub(blobs: DataFrame) -> DataFrame:
    """Deterministic fake decode via mapInPandas (Arrow batches).

    width/height are the first two bytes of the sha256 digest (+1) — stable,
    content-derived, and reproducible in SQL for the oracle check. Swap
    ``_fake_decode_batch`` for a real codec to go live.
    """

    def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            digests = pdf["data"].map(
                lambda b: hashlib.sha256(bytes(b) if b is not None else b"").hexdigest()
            )
            width = digests.map(lambda h: int(h[0:2], 16) + 1)
            height = digests.map(lambda h: int(h[2:4], 16) + 1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "byte_size": pdf["byte_size"],
                    "width": width.astype("int64"),
                    "height": height.astype("int64"),
                    "n_pixels": (width * height).astype("int64"),
                    "content_sha": digests,
                }
            )

    return blobs.mapInPandas(_fake_decode_batch, DECODED_SCHEMA)


IMAGE_SCHEMA = (
    "id bigint, fmt string, width bigint, height bigint, n_pixels bigint, "
    "byte_size bigint, mean_r double, mean_g double, mean_b double, top_r double"
)


def encode_bmp(width: int, height: int, top_rgb, bottom_rgb) -> bytes:
    """Minimal uncompressed 24-bit BMP (BITMAPINFOHEADER): two horizontal
    color bands. Pixel rows are stored BOTTOM-UP in BGR order and padded to
    4-byte boundaries — the parts a decoder must get right."""
    import numpy as np

    stride = (width * 3 + 3) // 4 * 4
    pix_bytes = stride * height
    img = np.zeros((height, width, 3), dtype=np.uint8)  # top-down RGB
    img[: height // 2] = top_rgb
    img[height // 2 :] = bottom_rgb
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = img[::-1, :, ::-1].reshape(height, width * 3)  # flip + BGR
    header = (
        b"BM"
        + (54 + pix_bytes).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # pixel data offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER size
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")  # positive: bottom-up
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + pix_bytes.to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + rows.tobytes()


def encode_ppm(width: int, height: int, top_rgb, bottom_rgb) -> bytes:
    """Binary PPM (P6): ASCII header, then top-down RGB triples, no padding."""
    import numpy as np

    img = np.zeros((height, width, 3), dtype=np.uint8)
    img[: height // 2] = top_rgb
    img[height // 2 :] = bottom_rgb
    return f"P6\n{width} {height}\n255\n".encode() + img.tobytes()


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth_predict(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, upper-left) — RFC 2083 §6.6."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, top_rgb, bottom_rgb, filter_type: int = 0) -> bytes:
    """Minimal non-interlaced 8-bit RGB PNG (stdlib zlib only): two horizontal
    color bands, every scanline filtered with ``filter_type`` (0-4) so a
    decoder's unfilter paths can be exercised deliberately — the reconstructed
    pixels are filter-independent, which is what makes the b39_decode_png
    oracle possible."""
    import struct
    import zlib

    import numpy as np

    if not 0 <= filter_type <= 4:
        raise ValueError(f"PNG filter type must be 0-4, got {filter_type}")
    img = np.zeros((height, width, 3), dtype=np.uint8)
    img[: height // 2] = top_rgb
    img[height // 2 :] = bottom_rgb
    stride = width * 3
    raw = bytearray()
    prev = np.zeros(stride, dtype=int)
    for y in range(height):
        line = img[y].reshape(-1).astype(int)
        left = np.concatenate([np.zeros(3, dtype=int), line[:-3]])
        if filter_type == 0:
            out = line
        elif filter_type == 1:  # Sub
            out = (line - left) % 256
        elif filter_type == 2:  # Up
            out = (line - prev) % 256
        elif filter_type == 3:  # Average
            out = (line - (left + prev) // 2) % 256
        else:  # Paeth
            upleft = np.concatenate([np.zeros(3, dtype=int), prev[:-3]])
            pred = np.array(
                [_paeth_predict(int(a), int(b), int(c)) for a, b, c in zip(left, prev, upleft)]
            )
            out = (line - pred) % 256
        raw.append(filter_type)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB, no interlace
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _parse_png(raw: bytes):
    """Parse a non-interlaced 8-bit RGB PNG into a top-down RGB ndarray —
    pure stdlib: chunk walk, zlib inflate, unfilter (all 5 filter types)."""
    import struct
    import zlib

    import numpy as np

    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        tag = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, interlace={interlace})"
        )
    data = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(data) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        ft = data[y * (stride + 1)]
        cur = bytearray(data[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(stride):
                cur[i] = (cur[i] + (cur[i - 3] if i >= 3 else 0)) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                upleft = prev[i - 3] if i >= 3 else 0
                cur[i] = (cur[i] + _paeth_predict(left, prev[i], upleft)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        prev = cur
    return out.reshape(h, w, 3)


def _parse_bmp(raw: bytes):
    """Parse an uncompressed 24-bit BMP into a top-down RGB ndarray."""
    import numpy as np

    if raw[0:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    pix_off = int.from_bytes(raw[10:14], "little")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    compression = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    ah = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = (
        np.frombuffer(raw, dtype=np.uint8, count=stride * ah, offset=pix_off)
        .reshape(ah, stride)[:, : w * 3]
        .reshape(ah, w, 3)
    )
    # positive height = bottom-up storage; channel order on disk is BGR
    return (rows[::-1] if h > 0 else rows)[:, :, ::-1]


def _parse_ppm(raw: bytes):
    """Parse a binary PPM (P6) into a top-down RGB ndarray."""
    import numpy as np

    if raw[0:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = 4 whitespace-separated tokens, then exactly one whitespace byte
    pos, tokens = 0, []
    while len(tokens) < 4:
        while raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment line
            pos = raw.index(b"\n", pos) + 1
            continue
        start = pos
        while not raw[pos : pos + 1].isspace():
            pos += 1
        tokens.append(raw[start:pos])
    pos += 1  # the single whitespace after maxval
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def decode_real(blobs: DataFrame) -> DataFrame:
    """REAL image decode (no external libraries): parses uncompressed 24-bit
    BMP, binary PPM, and non-interlaced 8-bit RGB PNG payloads byte-by-byte —
    header fields, row padding, bottom-up row order, BGR→RGB, zlib inflate +
    scanline unfiltering — and emits dimensions plus channel statistics.
    ``top_r`` (mean red over the top half of the image) is order-sensitive: a
    decoder that forgets the BMP row flip, the row padding, or a PNG filter
    produces wrong values. Baseline JPEG (magic FFD8) decodes through the
    pure-numpy codec in ``operators/jpeg.py``."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "fmt", "width", "height", "n_pixels", "byte_size",
                "mean_r", "mean_g", "mean_b", "top_r",
            )}
            for rid, data in zip(pdf["id"], pdf["data"]):
                raw = bytes(data)
                if raw[:2] == b"BM":
                    img, fmt = _parse_bmp(raw), "bmp"
                elif raw[:2] == b"P6":
                    img, fmt = _parse_ppm(raw), "ppm"
                elif raw[:2] == b"\x89P":
                    img, fmt = _parse_png(raw), "png"
                elif raw[:2] == b"\xff\xd8":
                    from .jpeg import parse_jpeg

                    img, fmt = parse_jpeg(raw), "jpeg"
                else:
                    raise ValueError(f"unknown image magic {raw[:2]!r} for id {rid}")
                h, w = img.shape[0], img.shape[1]
                means = img.reshape(-1, 3).mean(axis=0)
                out["id"].append(rid)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["byte_size"].append(len(raw))
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
                out["top_r"].append(float(img[: h // 2, :, 0].mean()) if h >= 2 else float("nan"))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_decode, IMAGE_SCHEMA)


RESIZED_SCHEMA = "id bigint, width bigint, height bigint, scale double, content_sha string"
FEATURES_SCHEMA = "id bigint, features array<double>, dim bigint"


def resize_stub(decoded: DataFrame, target: int = 64) -> DataFrame:
    """Deterministic resize: scales the fake dimensions so the longer side is
    `target`, preserving aspect ratio — the partition-preserving per-row
    transform shape of a real resizer (swap the arithmetic for PIL)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def _round_half_up(x):
            # floor(x+0.5): SQL-compatible rounding (pandas .round() is
            # banker's rounding, which an oracle can't reproduce portably)
            return np.floor(x + 0.5).astype("int64")

        for pdf in batches:
            longer = pdf[["width", "height"]].max(axis=1)
            scale = target / longer
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": _round_half_up(pdf["width"] * scale).clip(lower=1),
                    "height": _round_half_up(pdf["height"] * scale).clip(lower=1),
                    "scale": scale,
                    "content_sha": pdf["content_sha"],
                }
            )

    return decoded.mapInPandas(_resize, RESIZED_SCHEMA)


def feature_extract_stub(blobs: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic feature extraction: `dim` floats in [0,1) derived from
    the content hash — the embedding-column producer shape (swap the hash
    arithmetic for a real vision/audio encoder). Output feeds directly into
    the similarity operators (cosine_topk / ann_lsh / ivf)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for data in pdf["data"]:
                raw = bytes(data) if data is not None else b""
                digest = hashlib.sha256(raw).digest()
                if dim > 8:
                    # sha256's 32 bytes cap at 8 floats; extend with a
                    # variable-length digest so every dim gets real entropy
                    digest += hashlib.shake_256(raw).digest(4 * (dim - 8))
                feats.append(
                    [
                        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "features": pd.Series(feats, dtype="object"),
                    "dim": dim,
                }
            )

    return blobs.mapInPandas(_extract, FEATURES_SCHEMA)


def frame_sample(blobs: DataFrame, every_nth: int = 10) -> DataFrame:
    """Deterministic frame-sampling stub for video blobs: keeps ids where
    hash(id) % every_nth == 0 — the partition-preserving sampling shape a real
    frame extractor would use."""
    return blobs.where(F.pmod(F.xxhash64(F.col("id")), F.lit(every_nth)) == 0)


_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def xxhash64_long(value: int, seed: int = 42) -> int:
    """Pure-Python replica of Spark's ``xxhash64`` for a single LongType input
    (XXH64.hashLong with the default seed 42). Used to PREDICT which ids
    survive ``frame_sample`` so the sampled set gets a deterministic DuckDB
    oracle (the driver cannot evaluate Spark hashes in SQL). Equality with the
    JVM implementation is asserted in tests/test_llm_ops.py.
    """

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    h = (seed + _XXH_P5 + 8) & _M64
    h ^= (rotl((value & _M64) * _XXH_P2 & _M64, 31) * _XXH_P1) & _M64
    h = (rotl(h, 27) * _XXH_P1 + _XXH_P4) & _M64
    h ^= h >> 33
    h = h * _XXH_P2 & _M64
    h ^= h >> 29
    h = h * _XXH_P3 & _M64
    h ^= h >> 32
    # reinterpret as signed 64-bit (Spark returns LongType)
    return h - (1 << 64) if h >= (1 << 63) else h


# ---------------------------------------------------------------------------
# Audio: PCM binary plumbing + feature extraction
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = "id bigint, pcm binary, n_samples bigint"
AUDIO_FEATURES_SCHEMA = (
    "id bigint, n_bytes bigint, n_samples bigint, rms double, peak bigint, "
    "zero_crossings bigint, sample_sum bigint"
)


def synth_pcm(ids: DataFrame, id_col: str = "id") -> DataFrame:
    """Synthesize deterministic 16-bit little-endian PCM waveforms per id.

    The waveform is an INTEGER sawtooth — sample[i] = ((i * f) % 2000) - 1000
    with f = 3 + id % 7 over n = 800 + (id % 5) * 80 samples — so every
    derived feature is exact integer (or exactly-representable double)
    arithmetic that a SQL oracle reproduces bit-for-bit from the closed
    form; no codec and no libm call is involved in the signal itself.
    The *plumbing* is the real thing: Arrow-batched mapInPandas packs the
    int16 array into a genuine binary column, exactly how decoded audio
    rides a 100 TB corpus (reference brief: stub the codec, keep the
    schema/batch shape real).
    """
    import numpy as np

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "pcm": [], "n_samples": []}
            for i in pdf["id"]:
                i = int(i)
                n = 800 + (i % 5) * 80
                f = 3 + i % 7
                idx = np.arange(n, dtype=np.int64)
                samples = ((idx * f) % 2000 - 1000).astype("<i2")
                out["id"].append(i)
                out["pcm"].append(samples.tobytes())
                out["n_samples"].append(n)
            yield pd.DataFrame(out)

    return ids.select(F.col(id_col).cast("long").alias("id")).mapInPandas(
        _synth, AUDIO_SCHEMA
    )


def audio_features(pcm_df: DataFrame) -> DataFrame:
    """Decode int16-LE PCM binary columns and extract waveform features.

    Arrow-batched mapInPandas: np.frombuffer per row (zero-copy), then
    RMS = sqrt(mean(s^2)) (sums of int64 squares are exact in float64, and
    IEEE sqrt is correctly rounded — so the double is bit-identical on any
    engine computing the same formula), peak = max(|s|), zero crossings
    counted strictly (s[i] * s[i+1] < 0), and the integer sample sum as a
    payload checksum. n_bytes re-measures the binary column, proving the
    pack/unpack round-trip.
    """
    import numpy as np

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": [], "n_bytes": [], "n_samples": [], "rms": [],
                "peak": [], "zero_crossings": [], "sample_sum": [],
            }
            for i, raw in zip(pdf["id"], pdf["pcm"]):
                buf = bytes(raw)
                s = np.frombuffer(buf, dtype="<i2").astype(np.int64)
                out["id"].append(int(i))
                out["n_bytes"].append(len(buf))
                out["n_samples"].append(len(s))
                out["rms"].append(float(np.sqrt((s * s).sum() / len(s))))
                out["peak"].append(int(np.abs(s).max()))
                out["zero_crossings"].append(int((s[:-1] * s[1:] < 0).sum()))
                out["sample_sum"].append(int(s.sum()))
            yield pd.DataFrame(out)

    return pcm_df.mapInPandas(_features, AUDIO_FEATURES_SCHEMA)


VIDEO_MAGIC = b"PSV1"
VIDEO_SCHEMA = "id bigint, video binary, n_frames bigint"
VIDEO_FEATURES_SCHEMA = (
    "id bigint, n_bytes bigint, width bigint, height bigint, n_frames bigint, "
    "n_sampled bigint, luma_sum bigint, motion_sum bigint"
)


def synth_video(ids: DataFrame, id_col: str = "id") -> DataFrame:
    """Synthesize a deterministic raw-video container per id.

    Container layout (the 'proprietary video container' case of the brief:
    the CONTENT is a closed-form integer function so a SQL oracle can verify
    the decode, but the byte-level plumbing — header parse, frame seek,
    pixel extraction — is the real thing):

        magic 'PSV1' (4) | width u16-LE | height u16-LE | n_frames u32-LE |
        fps u16-LE | 2 pad bytes | n_frames raw 8-bit grayscale frames

    Frame t's pixel (x, y) = (id*7 + t*13 + x*5 + y*3) % 256 — every derived
    feature is exact integer arithmetic. Dimensions vary per id
    (w = 8 + id%9, h = 8 + (id*3)%9, n = 12 + id%19) so reshape bugs can't
    hide behind a fixed geometry.
    """
    import struct

    import numpy as np

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "video": [], "n_frames": []}
            for i in pdf["id"]:
                i = int(i)
                w, h, n = 8 + i % 9, 8 + (i * 3) % 9, 12 + i % 19
                t = np.arange(n, dtype=np.int64)[:, None, None]
                y = np.arange(h, dtype=np.int64)[None, :, None]
                x = np.arange(w, dtype=np.int64)[None, None, :]
                px = ((i * 7 + t * 13 + x * 5 + y * 3) % 256).astype(np.uint8)
                header = VIDEO_MAGIC + struct.pack("<HHIH2x", w, h, n, 24)
                out["id"].append(i)
                out["video"].append(header + px.tobytes())
                out["n_frames"].append(n)
            yield pd.DataFrame(out)

    return ids.select(F.col(id_col).cast("long").alias("id")).mapInPandas(
        _synth, VIDEO_SCHEMA
    )


def video_features(video_df: DataFrame, every_nth: int = 5) -> DataFrame:
    """Parse the PSV1 container and extract frame-sampled features.

    Real byte-level decode per row: header unpack, np.frombuffer over the
    frame payload, reshape to (n_frames, h, w), then sample every
    ``every_nth``-th frame (frames[::k] — the decode/frame-sample stage of
    a video ingestion pipeline). Features are exact integers: luma_sum =
    Σ sampled pixel values, motion_sum = Σ |frame_sum[j+1] - frame_sum[j]|
    over consecutive SAMPLED frames; n_bytes proves the pack/parse
    round-trip against the header geometry.
    """
    import struct

    import numpy as np

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": [], "n_bytes": [], "width": [], "height": [],
                "n_frames": [], "n_sampled": [], "luma_sum": [], "motion_sum": [],
            }
            for i, raw in zip(pdf["id"], pdf["video"]):
                buf = bytes(raw)
                if buf[:4] != VIDEO_MAGIC:
                    raise ValueError(f"bad video magic for id={i}")
                w, h, n, _fps = struct.unpack_from("<HHIH", buf, 4)
                frames = np.frombuffer(buf, dtype=np.uint8, offset=16)
                if frames.size != n * h * w:
                    raise ValueError(f"payload/header mismatch for id={i}")
                sampled = frames.reshape(n, h, w)[::every_nth].astype(np.int64)
                fsums = sampled.sum(axis=(1, 2))
                out["id"].append(int(i))
                out["n_bytes"].append(len(buf))
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["n_frames"].append(int(n))
                out["n_sampled"].append(int(sampled.shape[0]))
                out["luma_sum"].append(int(fsums.sum()))
                out["motion_sum"].append(int(np.abs(np.diff(fsums)).sum()))
            yield pd.DataFrame(out)

    return video_df.mapInPandas(_features, VIDEO_FEATURES_SCHEMA)


def encode_ppm_pattern(width: int, height: int, pattern_id: int, shift: int = 0) -> bytes:
    """Binary PPM with a deterministic grayscale pattern keyed by
    ``pattern_id``: pixel(x, y) = (31x + 17y + 7·id) mod 201 (+shift).

    The modular wrap makes distinct ids produce genuinely different images
    (not a constant offset of each other), while ``shift`` applied ON TOP is
    a strictly monotone brightness change (base ∈ [0, 200], shift ≤ 55 keeps
    every value < 256 — no clipping, so per-pixel ORDER is preserved
    exactly, which is what makes an average-hash invariant to it)."""
    import numpy as np

    y, x = np.mgrid[0:height, 0:width]
    v = ((31 * x + 17 * y + 7 * pattern_id) % 201 + shift).astype(np.uint8)
    img = np.stack([v, v, v], axis=-1)
    return f"P6\n{width} {height}\n255\n".encode() + img.tobytes()


AHASH_SCHEMA = "id bigint, ahash bigint, width bigint, height bigint"


def ahash_int(img, grid: int = 8) -> int:
    """Pure per-image aHash: grayscale → grid×grid block means → one bit per
    block (mean > global mean) → packed int64 (two's complement).  Invariant
    under any strictly monotone per-pixel brightness map (every block mean
    and the global mean shift identically)."""
    import numpy as np

    if grid * grid > 64:
        # The np.uint64 accumulator holds exactly 64 bits; a larger grid
        # would silently wrap and hash only the last 64 blocks.
        raise ValueError(f"grid {grid}x{grid} exceeds the 64-bit hash width")
    gray = img.astype(np.float64).mean(axis=2)
    blocks = np.array(
        [
            [b.mean() for b in np.array_split(row_band, grid, axis=1)]
            for row_band in np.array_split(gray, grid, axis=0)
        ]
    )
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    acc = np.uint64(0)
    for bit in bits:
        acc = np.uint64(acc << np.uint64(1)) | bit
    return int(acc.astype(np.int64))


def image_ahash(blobs: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over DECODED pixels (dHash/aHash family —
    the image-dedup workhorse): decode → grayscale → grid×grid block means
    → one bit per block (mean > global mean) → packed int64.

    Invariance by construction: any strictly monotone per-pixel brightness
    map (e.g. +k without clipping) shifts every block mean AND the global
    mean identically, so every comparison bit — and hence the hash — is
    unchanged.  Exact-duplicate and brightness-shifted images therefore
    collide deterministically, while the modular test pattern gives
    distinct ids distinct hashes.

    Scale shape: one Arrow-batched mapInPandas pass (no shuffle); dedup on
    the emitted hash is a plain hash-keyed join/groupBy — never pairwise
    over images."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "ahash": [], "width": [], "height": []}
            for rid, data in zip(pdf["id"], pdf["data"]):
                raw = bytes(data)
                if raw[:2] == b"BM":
                    img = _parse_bmp(raw)
                elif raw[:2] == b"P6":
                    img = _parse_ppm(raw)
                elif raw[:2] == b"\x89P":
                    img = _parse_png(raw)
                else:
                    raise ValueError(f"unknown image magic {raw[:2]!r} for id {rid}")
                h, w = img.shape[0], img.shape[1]
                out["id"].append(rid)
                out["ahash"].append(ahash_int(img, grid))
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_hash, AHASH_SCHEMA)

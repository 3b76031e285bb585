"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a typed metadata
struct, processed via Arrow-batched mapInPandas. The actual codec step is
STUBBED (no image/audio libraries in this container): ``decode_stub``
produces deterministic fake dimensions derived from the content hash, and
``decode_real`` is the clearly-marked NotImplementedError seam where PIL /
torchaudio / pyav would plug in. The Spark-side plumbing — schema, batching,
partition behavior — is real and tested.
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


def decode_real(blobs: DataFrame) -> DataFrame:
    """Real codec seam — requires an image library not present in this container."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decode needs PIL/torchaudio/pyav; use decode_stub for plumbing"
        ) from e
    raise NotImplementedError("wire PIL decode here when the dependency is available")


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

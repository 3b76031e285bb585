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
            digests = pdf["data"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
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


def frame_sample(blobs: DataFrame, every_nth: int = 10) -> DataFrame:
    """Deterministic frame-sampling stub for video blobs: keeps ids where
    hash(id) % every_nth == 0 — the partition-preserving sampling shape a real
    frame extractor would use."""
    return blobs.where(F.pmod(F.xxhash64(F.col("id")), F.lit(every_nth)) == 0)

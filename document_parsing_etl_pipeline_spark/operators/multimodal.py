"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The decode step itself (PIL/ffmpeg are not in this container) is
stubbed behind a deterministic fake clearly marked below; everything
Spark-side — schema, batch iteration, partitioning, output shape — is
real and is what would carry a 100 TB media corpus: binary columns
stay columnar end-to-end, Python sees Arrow batches (not rows), and
the per-partition iterator keeps memory bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "image_path string, doc_id bigint, width int, height int, "
    "format string, feature array<float>"
)


def _fake_decode(content: bytes) -> tuple[int, int, str]:
    """STUB: deterministic fake for image decode (no PIL here).

    Derives (width, height, format) from the byte content so tests are
    stable. Replace with PIL.Image.open in a real deployment.
    """
    if content is None or len(content) == 0:
        return (0, 0, "empty")
    w = 64 + (content[0] % 8) * 32
    h = 64 + (content[-1] % 8) * 32
    return (w, h, "png" if content[:4] == b"\x89PNG" else "raw")


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """STUB: deterministic fake embedding from bytes (byte histogram)."""
    if not content:
        return [0.0] * dim
    buckets = [0] * dim
    for by in content[:4096]:
        buckets[by % dim] += 1
    total = float(sum(buckets)) or 1.0
    return [b / total for b in buckets]


def decode_images(blobs: DataFrame) -> DataFrame:
    """binary blobs → typed media metadata + feature vector.

    mapInPandas: Arrow batches in, bounded-memory iterator out — the
    Spark-correct shape for Python-side media work.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["content"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "image_path": pdf["image_path"],
                    "doc_id": pdf["image_path"].str.extract(
                        r"documents/(\d+)/"
                    )[0].astype("int64"),
                    "width": meta.map(lambda m: m[0]).astype("int32"),
                    "height": meta.map(lambda m: m[1]).astype("int32"),
                    "format": meta.map(lambda m: m[2]),
                    "feature": pdf["content"].map(_fake_feature),
                }
            )

    return blobs.mapInPandas(_decode, schema=MEDIA_META_SCHEMA)

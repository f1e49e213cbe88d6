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
- decode: STUBBED — real codecs (PIL/librosa/ffmpeg) are not in this
  container. ``decode_image`` raises NotImplementedError behind an
  import-try; ``fake_features`` is the deterministic stand-in that keeps
  the plumbing (schema, batching, partitioning) fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import col

FEATURE_SCHEMA = "id bigint, n_bytes bigint, byte_sum bigint, head_hash bigint"


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


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Decode an image payload. STUB: image codecs are not available in this
    environment; a real deployment plugs PIL/torchvision here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL, not available in this environment; "
            "use fake_features() for plumbing tests"
        ) from exc
    raise NotImplementedError("real decode path not implemented in this build")


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

"""Multimodal (image/audio/video) column plumbing — north-star surface.

Media are opaque ``binary`` columns with typed metadata.  The engine's job
at 100 TB is the *plumbing*: schema, partitioning, Arrow batch shape, and
the ``mapInPandas`` kernel signature; the actual codec work belongs to
libraries (PIL/ffmpeg/torchvision) that are NOT in this runtime image.

Every kernel therefore takes a ``decoder`` callable:

- ``decoder=None`` (production default) raises ``NotImplementedError``
  with the dependency it needs — a clearly-marked stub;
- ``decoder=fake_decoder`` is a deterministic stand-in (derives features
  from the bytes themselves) so the Spark-side plumbing — batch iteration,
  schema, struct output — is real and fully tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media binary, mime string, width int, height int, duration_ms long"
)

FEATURE_SCHEMA = "media_id long, n_bytes long, content_key long, feature array<double>"


def fake_decoder(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for a real decode→embed pipeline: fixed-dim
    features derived from the md5 of the payload.  Replace with a real
    model under the same signature."""
    h = hashlib.md5(payload).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(dim)]


def _require_decoder(decoder: Callable | None, what: str) -> Callable:
    if decoder is None:
        raise NotImplementedError(
            f"{what} needs a media codec (PIL/ffmpeg) not present in this "
            "image; pass decoder=fake_decoder for the deterministic stub "
            "or a real callable with the same signature"
        )
    return decoder


def extract_features(
    media: DataFrame,
    decoder: Callable | None = None,
    media_col: str = "media",
    id_col: str = "media_id",
    dim: int = 4,
) -> DataFrame:
    """binary column → fixed-dim feature vectors via ``mapInPandas``.

    Arrow-batched: each pandas batch holds raw bytes; the decoder runs
    per-element inside the batch loop (vectorize inside a real decoder as
    appropriate).  Output keeps the id for joining back — no index-join
    needed (SURVEY J10).
    """
    dec = _require_decoder(decoder, "extract_features")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[media_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_key": payloads.map(
                        lambda b: int(hashlib.md5(b).hexdigest()[:15], 16)
                    ).astype("int64"),
                    "feature": payloads.map(lambda b: dec(b, dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload so the
    multimodal plumbing is exercisable on the synthetic tables."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )

"""Multimodal column plumbing: opaque binary payloads with typed metadata,
processed through Arrow-batched `mapInPandas`.

No reference analog — Phase-5 pipeline operators. The design rule for
image/audio/video at 100 TB: the engine treats media as `binary` columns
plus typed metadata, keeps them out of shuffles wherever possible
(project metadata early, join payloads late), and runs per-item Python
(decode, resize, frame-sample, feature-extract) only through
`mapInPandas` so every crossing of the JVM<->Python boundary moves an
Arrow batch, not a row.

The actual codec work (JPEG decode, resampling, ...) needs libraries this
container doesn't ship, so those steps are stubbed with
NotImplementedError behind the REAL plumbing: schema, batching, and the
deterministic byte-level features (q32) are fully functional and
oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from smartbulkcopy_spark.queries import register, table

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, blob_md5 string"


def binary_features(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Byte-level features of an opaque blob column via mapInPandas.

    This is the canonical multimodal batch shape: each Arrow batch arrives
    as a pandas DataFrame, per-item work is vectorized or tight-loop
    Python, output is a typed frame. Row-local -> zero shuffle; partition
    count is inherited from the scan.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[blob_col].map(len),
                    "blob_md5": pdf[blob_col].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(df: DataFrame, blob_col: str) -> DataFrame:
    """Decode an image blob column to (height, width, channels) + pixels.

    STUB: image codecs are not available in this container. The Spark-side
    contract (mapInPandas over Arrow batches returning a typed struct) is
    the same as :func:`binary_features`; plug a PIL/turbojpeg call into
    the batch loop to activate.
    """
    raise NotImplementedError(
        "image decode requires a codec library not present in this"
        " environment; see binary_features for the live batch plumbing"
    )


def sample_audio_frames(df: DataFrame, blob_col: str, rate_hz: int) -> DataFrame:
    """Resample an audio blob column. STUB — same contract as decode_image."""
    raise NotImplementedError(
        "audio resampling requires a codec library not present in this"
        " environment; see binary_features for the live batch plumbing"
    )


@register(
    "q32_binary_features",
    "SELECT doc_id, octet_length(encode(text)) AS n_bytes,"
    " md5(text) AS blob_md5 FROM documents ORDER BY doc_id",
    doc="Multimodal plumbing proof: text bytes treated as an opaque blob,"
    " features (size + md5) computed in Arrow-batched mapInPandas. The"
    " oracle recomputes both from the same UTF-8 bytes SQL-side.",
)
def q32(spark, sf_dir):
    # No spread(): each partition spawns a Python worker, and for a tiny
    # input the worker spin-up dwarfs the vectorized md5 work. At scale
    # the scan has many splits and parallelism comes for free.
    docs = table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return binary_features(blobs, "doc_id", "blob")

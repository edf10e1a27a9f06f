"""Multimodal plumbing in the driver contract: binary payload columns
processed through the Arrow-batched ``mapInPandas`` feature extractor.

The fixture tables carry no binary column, so the query derives one (UTF-8
bytes of ``documents.text``) — the *plumbing* under test is exactly the
production shape: binary column in, partition-parallel pandas batches,
fixed-width features out, payload projected away.  The byte length and
SHA-256 are value-checked against DuckDB (which hashes the same UTF-8
bytes); the codec-dependent features (entropy, hash-derived pseudo-embedding
components) come from the deterministic fake codec and are covered by unit
tests (real decoders are stubbed — no image/audio libs in this image).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_media_features
from ..sources.batch import load_table
from .registry import register


@register(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha256
    FROM documents
    """,
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return extract_media_features(media).select("media_id", "n_bytes", "payload_sha256")

"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Design for 100 TB multimodal pipelines: payloads travel as ``binary``
columns with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas functions over ``mapInPandas``
so bytes never round-trip through the driver, batch shape and schema are
explicit, and partition sizing controls memory (one Arrow batch of
payloads must fit the executor).

The decode step itself is a STUB in this environment (no image/audio
libraries in the container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic byte-level feature extraction — the Spark-side plumbing
(schemas, UDF signatures, batching, partitioning) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

#: metadata carried alongside every payload
MEDIA_META_SCHEMA = "struct<mime:string,source:string,n_bytes:bigint>"
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, first_byte int, byte_checksum bigint, "
    "mime string"
)


def attach_media(
    df: DataFrame, payload_from: str = "text", id_col: str = "doc_id",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Build a media table: (id, payload binary, meta struct).

    In production the payload column comes from the lakehouse (parquet
    binary / object-store pointers); here it is synthesized by encoding a
    text column so the pipeline is runnable on the test tables.
    """
    from rapids_and_rivers_spark.sources.tables import spread

    payload = F.encode(F.col(payload_from), "UTF-8")
    df = spread(df, id_col)  # parallel Arrow batches on under-partitioned input
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.col("source").alias("source") if "source" in df.columns else F.lit(None).cast("string").alias("source"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub contract
    """Decode an image payload to pixels. STUB: the container has no image
    codec libraries; real deployments plug Pillow/torchvision here."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this environment"
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-payload feature extraction over mapInPandas (Arrow batches).

    With ``fake=True`` (this environment) features are deterministic
    byte-level statistics; the execution path — executor-side batched
    Python over binary columns — is exactly the production shape.
    """
    if not fake:  # pragma: no cover - exercised only with codec libs present
        raise NotImplementedError("real decode requires codec libraries")

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            # vectorize inside the batch: numpy over the raw bytes, never a
            # per-byte Python loop (the production decode would likewise be
            # a C-level call per payload)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "byte_checksum": payloads.map(
                        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
                        % 1_000_000_007
                    ),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: emit up to ``max_frames`` fixed-stride
    'frames' (byte slices) per payload — the video-frame-sampling shape
    (explode to one row per frame) with a byte-slice stand-in decode."""
    # bind the decoded payload to an attribute first: expressions inside
    # HOF lambdas are re-evaluated per element (here: per frame)
    decoded = media.select(
        "doc_id", F.col("payload").cast("string").alias("payload_str")
    )
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    frames = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                i.alias("frame_no"),
                F.substring(
                    F.col("payload_str"), i * every_n_bytes + 1, every_n_bytes
                ).alias("frame"),
            ),
        ),
        lambda s: F.length(s["frame"]) > 0,
    )
    return (
        decoded.select("doc_id", F.explode_outer(frames).alias("f"))
        .filter(F.col("f").isNotNull())
        .select(
            "doc_id",
            F.col("f.frame_no").alias("frame_no"),
            F.col("f.frame").alias("frame"),
        )
    )

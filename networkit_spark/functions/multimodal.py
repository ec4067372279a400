"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual decoders are STUBBED behind
deterministic fakes / NotImplementedError because the codec libraries
(PIL/ffmpeg/etc.) are not in this container. Swapping in a real decoder
changes ONE function body, not the pipeline.

Pipeline shape for 100 TB: binary payloads stay in parquet binary columns
(never collected), metadata travels in sibling struct columns, and all
decode/feature work runs in `mapInPandas` over Arrow record batches —
one Python process per core, zero per-row overhead, bounded memory via
`maxRecordsPerBatch`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("payload", T.BinaryType()),    # opaque encoded bytes
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
        ])),
    ]
)


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (xxhash-seeded), metadata consistent with `kind`. Real Spark plumbing,
    fake content."""
    df = spark.range(n)
    kind = (
        F.when(F.pmod("id", F.lit(3)) == 0, "image")
        .when(F.pmod("id", F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256).cast(
        "binary"
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(kind == "image", "image/png")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.struct(
            F.when(kind != "audio", (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1920)) + 32).cast("int")).alias("width"),
            F.when(kind != "audio", (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1080)) + 32).cast("int")).alias("height"),
            F.when(kind != "image", (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(600_000)) + 1000).cast("long")).alias("duration_ms"),
            F.when(kind == "audio", F.lit(16_000).cast("int")).alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes) -> "object":
    """REAL IMPLEMENTATION REQUIRES: PIL/turbojpeg. Deterministic fake:
    a 4x4 uint8 'image' derived from the payload hash bytes."""
    import numpy as np

    arr = np.frombuffer((payload * 3)[:48], dtype=np.uint8).reshape(4, 4, 3)
    return arr


def image_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """(media_id, feat: array<float>) — decode → feature-extract over
    mapInPandas Arrow batches. The decode step is the stub; the batch
    plumbing (schema-in, schema-out, per-batch vectorization) is real."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("feat", T.ArrayType(T.FloatType())),
        ]
    )

    def extract(batches):
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = _decode_image_stub(bytes(payload))
                # channel means + stds: a real extractor would run a model
                f = np.concatenate([img.mean(axis=(0, 1)), img.std(axis=(0, 1))])
                feats.append((f / 255.0).astype("float32").tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feat": feats})

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(extract, out_schema)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """(media_id, payload) resized — decode/re-encode is NOT available in
    this container; the operator raises on execution but carries the full
    Spark plan/schema so the pipeline type-checks end-to-end."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def do_resize(batches):
        raise NotImplementedError(
            "image re-encode requires PIL/libjpeg — not in this container; "
            "swap this function body for the real codec"
        )
        yield  # pragma: no cover

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(do_resize, out_schema)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx, ts_ms) — frame-sampling plan: the timestamps
    come from metadata (real); frame payload extraction is stubbed to a
    deterministic hash of (media_id, frame_idx)."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                (F.col("meta.duration_ms") / every_ms).cast("long"),
            )
        ).alias("frame_idx"),
    )
    return frames.select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("ts_ms"),
        F.sha2(
            F.concat(F.col("media_id").cast("string"), F.lit(":"), F.col("frame_idx").cast("string")),
            256,
        ).cast("binary").alias("frame_payload_stub"),
    )


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 30_000) -> DataFrame:
    """(media_id, chunk_idx, start_ms, end_ms) — chunking plan for ASR-style
    processing; pure metadata arithmetic, no decode."""
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), (F.col("meta.duration_ms") / chunk_ms).cast("long")
                )
            ).alias("chunk_idx"),
            F.col("meta.duration_ms").alias("dur"),
        )
        .select(
            "media_id",
            "chunk_idx",
            (F.col("chunk_idx") * chunk_ms).alias("start_ms"),
            F.least(
                (F.col("chunk_idx") + 1) * chunk_ms, F.col("dur")
            ).alias("end_ms"),
        )
        .filter(F.col("start_ms") < F.col("dur"))
    )

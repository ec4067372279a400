"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Round 3: the decode tier is REAL for every codec the container can
express without external libraries — BMP and P6-PPM images, PCM16 WAV
audio (functions/codecs.py, pure numpy + stdlib `wave`). Compressed
codecs (JPEG/PNG/MP4) still raise a loud, documented error at the decode
dispatch; swapping in PIL/ffmpeg changes one function (codecs.decode_image),
not the pipeline.

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

_WAV_RATE = 16_000
_WAV_SAMPLES = 1_600  # 100 ms


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: images are genuine
    8×8 24-bit BMPs, audio rows genuine 100 ms PCM16 WAVs (content seeded
    per id); video payloads remain opaque fakes (mp4 needs ffmpeg —
    declared). Built via mapInPandas so the synthesis itself exercises the
    Arrow batch path."""
    import numpy as np
    import pandas as pd

    from networkit_spark.functions.codecs import encode_bmp, encode_wav

    def build(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.default_rng(seed * 1_000_003 + mid)
                k = mid % 3
                if k == 0:
                    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
                    meta = {"width": 8, "height": 8,
                            "duration_ms": None, "sample_rate": None}
                    rows.append(
                        (mid, "image", encode_bmp(img), "image/bmp", meta)
                    )
                elif k == 1:
                    samples = rng.integers(
                        -20_000, 20_000, size=_WAV_SAMPLES, dtype=np.int16
                    )
                    dur = int(_WAV_SAMPLES * 1000 / _WAV_RATE)
                    meta = {"width": None, "height": None,
                            "duration_ms": dur, "sample_rate": _WAV_RATE}
                    rows.append(
                        (mid, "audio", encode_wav(samples, _WAV_RATE),
                         "audio/wav", meta)
                    )
                else:
                    dur = int(rng.integers(1_000, 601_000))
                    meta = {"width": int(rng.integers(32, 1952)),
                            "height": int(rng.integers(32, 1112)),
                            "duration_ms": dur, "sample_rate": None}
                    rows.append(
                        (mid, "video", rng.bytes(64), "video/mp4", meta)
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime", "meta"]
            )

    return spark.range(n).mapInPandas(build, MEDIA_SCHEMA)


def image_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """(media_id, feat: array<float>) — REAL decode (BMP/PPM) →
    feature-extract (per-channel means + stds, a model stand-in) over
    mapInPandas Arrow batches."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("feat", T.ArrayType(T.FloatType())),
        ]
    )

    def extract(batches):
        import numpy as np

        from networkit_spark.functions.codecs import decode_image

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload))
                f = np.concatenate([img.mean(axis=(0, 1)), img.std(axis=(0, 1))])
                feats.append((f / 255.0).astype("float32").tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feat": feats})

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(extract, out_schema)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """(media_id, payload) — REAL decode → nearest-neighbor resize →
    BMP re-encode for the container-native codecs; compressed inputs raise
    the documented swap-in error from the decode dispatch."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def do_resize(batches):
        from networkit_spark.functions.codecs import (
            decode_image,
            encode_bmp,
            resize_nearest,
        )

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload))
                out.append(encode_bmp(resize_nearest(img, width, height)))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": out})

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(do_resize, out_schema)


def audio_features(media: DataFrame) -> DataFrame:
    """(media_id, feat: array<float>) — REAL WAV decode → [rms, zero-
    crossing rate, duration_s] (an ASR-frontend stand-in), Arrow-batched."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("feat", T.ArrayType(T.FloatType())),
        ]
    )

    def extract(batches):
        import numpy as np

        from networkit_spark.functions.codecs import decode_wav

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                samples, rate = decode_wav(bytes(payload))
                x = samples.astype(np.float64) / 32768.0
                rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                zcr = (
                    float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
                    if x.size > 1
                    else 0.0
                )
                feats.append(
                    np.array([rms, zcr, x.size / rate], dtype="float32").tolist()
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "feat": feats})

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(extract, out_schema)
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx, ts_ms) — frame-sampling plan: the timestamps
    come from metadata (real); frame payload extraction is stubbed to a
    deterministic hash of (media_id, frame_idx) — mp4 demux needs ffmpeg
    (declared container limitation)."""
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

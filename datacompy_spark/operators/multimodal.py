"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct; all per-item compute (decode, feature extraction, resizing, frame
sampling) runs as Arrow-batched ``mapInPandas`` stages — the one place in
this engine where Python-side execution is the right tool, because the work
is per-blob CPU, not relational algebra. Partitioning, schema contracts, and
batch shapes are real and tested; the actual codec calls are stubbed behind
import-guards (``pillow``/``librosa``/``av`` are not in this container) with
a deterministic fallback so the pipeline shape is exercisable end-to-end.

Scale notes: ``mapInPandas`` streams Arrow batches — peak memory is
O(batch), not O(partition); `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds blob batches. Repartition by a content-hash bucket before heavy
decode stages so stragglers (giant blobs clustered in one input file) spread
across the cluster.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata contract for media blobs
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),      # png, wav, mp4, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

IMAGE_FEATURE_DIM = 16


def attach_media_metadata(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct (sizes filled
    engine-side; dimensional fields populated by the decode stage)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("size_bytes"),
        ),
    )


def bucket_by_content(df: DataFrame, binary_col: str, buckets: int = 256) -> DataFrame:
    """Repartition blobs by content-hash bucket: spreads size-skewed inputs
    evenly before a decode stage (a directory of giant videos otherwise pins
    one executor)."""
    out = df.withColumn("__bucket", F.crc32(F.col(binary_col)) % buckets)
    return out.repartition(buckets, "__bucket").drop("__bucket")


def _try_decode_image(data: bytes):
    """Real decode via pillow when available; None when the codec stack is
    absent (this container)."""
    try:
        import io

        from PIL import Image  # noqa: F401

        return Image.open(io.BytesIO(data))
    except ImportError:
        return None


def _fake_features(data: bytes, dim: int) -> list:
    """Deterministic stand-in features: md5-seeded values in [-1, 1). Keeps
    the pipeline (schema, batching, downstream ANN) fully testable without
    codecs; swap for a real model udf in production."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(data + i.to_bytes(4, "little")).hexdigest()
        out.append(int(h[:15], 16) / float(1 << 60) * 2.0 - 1.0)
    return out


def image_features(df: DataFrame, id_col: str, binary_col: str, dim: int = IMAGE_FEATURE_DIM) -> DataFrame:
    """Per-image feature vectors via Arrow-batched ``mapInPandas``.

    Output: (id, feature array<double>, decoded boolean). With pillow
    installed the features come from a decoded thumbnail; without it the
    deterministic fallback keeps schema/partitioning behavior identical."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("decoded", T.BooleanType()),
        ]
    )

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, feats, decoded = [], [], []
            for _, row in pdf.iterrows():
                data = bytes(row[binary_col]) if row[binary_col] is not None else b""
                img = _try_decode_image(data)
                if img is not None:
                    img = img.convert("L").resize((4, 4))
                    px = list(img.getdata())
                    vec = [p / 127.5 - 1.0 for p in px][:dim]
                    vec += [0.0] * (dim - len(vec))
                    feats.append(vec)
                    decoded.append(True)
                else:
                    feats.append(_fake_features(data, dim))
                    decoded.append(False)
                ids.append(row[id_col])
            yield pd.DataFrame({"id": ids, "features": feats, "decoded": decoded})

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def sample_video_frames(
    df: DataFrame, id_col: str, binary_col: str, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling stage contract: one output row per sampled frame with
    the frame as a binary column. Requires a video codec stack (``av``),
    which is not in this container."""
    try:
        import av  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "video frame sampling requires the 'av' codec stack; the "
            "mapInPandas contract is (id, frame_idx, frame_ms, frame_png binary)"
        ) from ex
    raise NotImplementedError("codec stack present but decoder not implemented yet")


def audio_features(df: DataFrame, id_col: str, binary_col: str, dim: int = 8) -> DataFrame:
    """Audio feature stage: deterministic fallback (no librosa here), same
    schema contract as a real mel-spectrogram summarizer."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("decoded", T.BooleanType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "features": [
                        _fake_features(bytes(b) if b is not None else b"", dim)
                        for b in pdf[binary_col]
                    ],
                    "decoded": [False] * len(pdf),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)

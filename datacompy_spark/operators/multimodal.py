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
    clash = sorted(c for c in df.columns if c.lower() == "__bucket")
    if clash:
        # withColumn + the trailing drop would silently destroy the
        # caller's column (case-insensitively, per Spark's resolver)
        raise ValueError(
            f"bucket_by_content reserves the internal column name "
            f"'__bucket' (input has {clash}) — rename it first"
        )
    out = df.withColumn("__bucket", F.crc32(F.col(binary_col)) % buckets)
    return out.repartition(buckets, "__bucket").drop("__bucket")


def _try_decode_image(data: bytes):
    """Real decode via pillow when available; None when the codec stack is
    absent (this container) OR the blob is not decodable (corrupt bytes
    must fall back, not fail the whole Spark task after retries)."""
    try:
        import io

        from PIL import Image  # noqa: F401

        return Image.open(io.BytesIO(data))
    except Exception:
        return None


def _fake_features(data: bytes, dim: int) -> list:
    """Deterministic stand-in features: md5-seeded values in [-1, 1). Keeps
    the pipeline (schema, batching, downstream ANN) fully testable without
    codecs; swap for a real model udf in production. The per-dimension seed
    suffix is ASCII (``#i``) so an engine whose md5 only takes strings (the
    DuckDB oracle) can reproduce the values on text-derived blobs."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(data + f"#{i}".encode()).hexdigest()
        out.append(int(h[:15], 16) / float(1 << 60) * 2.0 - 1.0)
    return out


def image_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    dim: int = IMAGE_FEATURE_DIM,
    carry_cols: tuple = (),
) -> DataFrame:
    """Per-image feature vectors via Arrow-batched ``mapInPandas``.

    Output: (id, feature array<double>, decoded boolean, *carry_cols). With
    pillow installed the features come from a decoded thumbnail; without it
    the deterministic fallback keeps schema/partitioning behavior identical.
    ``carry_cols`` ride through the Arrow batches — attaching metadata
    AFTER a feature stage would otherwise cost a full 1:1 shuffle join at
    scale just to restore columns the stage already had in hand."""
    carried = [df.schema[c] for c in carry_cols]
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("decoded", T.BooleanType()),
        ]
        + [T.StructField(f.name, f.dataType) for f in carried]
    )

    def featurize(data) -> tuple:
        data = bytes(data) if data is not None else b""
        img = _try_decode_image(data)
        if img is None:
            return _fake_features(data, dim), False
        img = img.convert("L").resize((4, 4))
        vec = [p / 127.5 - 1.0 for p in img.getdata()][:dim]
        return vec + [0.0] * (dim - len(vec)), True

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            # Series.map over the blob column: decode is inherently per-item
            # Python work, but nothing materializes per-row frames
            pairs = pdf[binary_col].map(featurize)
            out = {
                "id": pdf[id_col],
                "features": pairs.map(lambda p: p[0]),
                "decoded": pairs.map(lambda p: p[1]),
            }
            for c in carry_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col, *carry_cols).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    width: int = 224,
    height: int = 224,
    carry_cols: tuple = (),
) -> DataFrame:
    """Batch image resize via Arrow-batched ``mapInPandas`` — the
    preprocessing step vision-training pipelines run before feature
    extraction. Output: (id, blob binary, width, height, resized boolean,
    *carry_cols).

    With pillow installed the blob is re-encoded at (width, height);
    without it (this container) the DETERMINISTIC fallback passes the
    original bytes through with resized=false, keeping schema, batch
    shape, and partitioning behavior identical so the Spark-side plumbing
    stays fully testable. Same scale discipline as :func:`image_features`:
    blobs stream through Arrow batches (no per-row Python rows
    materialize), carry columns ride inside the stage instead of a 1:1
    shuffle join afterwards, and the stage is a narrow map — partition
    sizing is governed upstream by ``bucket_by_content`` /
    ``spark.sql.files.maxPartitionBytes``."""
    if width <= 0 or height <= 0:
        raise ValueError("resize_images: width and height must be positive")
    carried = [df.schema[c] for c in carry_cols]
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("blob", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized", T.BooleanType()),
        ]
        + [T.StructField(f.name, f.dataType) for f in carried]
    )

    def one(data) -> tuple:
        data = bytes(data) if data is not None else b""
        img = _try_decode_image(data)
        if img is None:
            # no codec stack OR undecodable blob: byte-identical
            # passthrough, flagged
            return data, width, height, False
        try:
            import io

            resized = img.resize((width, height))
            buf = io.BytesIO()
            resized.save(buf, format=img.format or "PNG")
            return buf.getvalue(), width, height, True
        except Exception:
            # truncated frames / unwritable formats degrade to passthrough;
            # one bad blob must never fail a 100 TB stage
            return data, width, height, False

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            quads = pdf[binary_col].map(one)
            out = {
                "id": pdf[id_col],
                "blob": quads.map(lambda q: q[0]),
                "width": quads.map(lambda q: q[1]),
                "height": quads.map(lambda q: q[2]),
                "resized": quads.map(lambda q: q[3]),
            }
            for c in carry_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col, *carry_cols).mapInPandas(run, out_schema)


def _try_sample_video(data: bytes, every_ms: int):
    """Real frame sampling via the ``av`` codec stack when available; None
    when it is absent (this container) or the blob is undecodable (a
    corrupt video must fall back, not fail the stage)."""
    try:  # pragma: no cover - codec stack absent in this container
        import io

        import av

        frames = []
        with av.open(io.BytesIO(data)) as container:
            stream = container.streams.video[0]
            next_ms = 0
            for frame in container.decode(stream):
                ms = int(frame.time * 1000) if frame.time is not None else 0
                if ms >= next_ms:
                    buf = io.BytesIO()
                    frame.to_image().save(buf, format="PNG")
                    frames.append((ms, buf.getvalue()))
                    next_ms += every_ms
        return frames
    except Exception:
        return None


def _fake_video_frames(data: bytes, every_ms: int) -> list:
    """Deterministic stand-in sampler: the blob is treated as 1 byte/ms of
    pseudo-video and each sampled 'frame' is an md5-derived 16-byte blob —
    keeps the explode shape (rows ∝ duration/every_ms), ordering, and binary
    schema exercisable without codecs."""
    import hashlib

    duration_ms = len(data)
    out = []
    for ms in range(0, max(duration_ms, 1), every_ms):
        out.append((ms, hashlib.md5(data + ms.to_bytes(8, "little")).digest()))
    return out


def sample_video_frames(
    df: DataFrame, id_col: str, binary_col: str, every_ms: int = 1000
) -> DataFrame:
    """Sample one frame every ``every_ms`` per video blob via Arrow-batched
    ``mapInPandas`` — a row-EXPANDING stage (one output row per frame).

    Output: (id, frame_idx, frame_ms, frame_png binary, decoded boolean).
    With the ``av`` codec stack the frames are real PNG re-encodes; without
    it a deterministic fallback preserves the expansion shape, ordering, and
    schema so downstream stages stay testable."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("frame_png", T.BinaryType()),
            T.StructField("decoded", T.BooleanType()),
        ]
    )

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, mss, blobs, decs = [], [], [], [], []
            for vid, data in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(data) if data is not None else b""
                frames = _try_sample_video(data, every_ms)
                decoded = frames is not None
                if frames is None:
                    frames = _fake_video_frames(data, every_ms)
                for i, (ms, png) in enumerate(frames):
                    ids.append(vid)
                    idxs.append(i)
                    mss.append(ms)
                    blobs.append(png)
                    decs.append(decoded)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": idxs,
                    "frame_ms": mss,
                    "frame_png": blobs,
                    "decoded": decs,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


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

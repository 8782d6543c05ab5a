"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The charter treatment: media travels through the pipeline as
``BinaryType`` payloads with a typed metadata struct; decode /
feature-extract / resize / frame-sample are Arrow-batched Python
boundaries (``mapInPandas``) because codecs don't exist in the JVM.  The
decode libraries (PIL/ffmpeg/torchcodec) are NOT in this image, so the
decode kernels are stubbed: a deterministic fake honoring the declared
output schema, or ``NotImplementedError`` where faking would be
misleading.  Everything Spark-side — schema, batch iteration, partition
sizing, column pruning before the Python boundary — is real and tested.

Scale notes: media rows are large; the operators (a) prune to
(id, payload) before the Python boundary so Arrow doesn't ship unused
columns, (b) repartition by a size budget (rows × avg payload) rather
than row count, because a 128 MB parquet split of 4 MB images is 32 rows
— partition count must come from byte budgets at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("phash", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload = repeated hash bytes,
    metadata populated per modality.  Stands in for a real media lake."""
    return spark.range(n).selectExpr(
        "id AS media_id",
        # payload: md5 hex of the id repeated — deterministic binary blob
        "CAST(repeat(md5(CAST(id AS STRING)), CAST(id % 7 AS INT) + 1) AS BINARY) AS payload",
        """named_struct(
             'media_type', element_at(array('image','audio','video'), CAST(id % 3 AS INT) + 1),
             'mime',       element_at(array('image/png','audio/wav','video/mp4'), CAST(id % 3 AS INT) + 1),
             'width',      CASE WHEN id % 3 = 0 THEN CAST(64 + id % 512 AS INT) END,
             'height',     CASE WHEN id % 3 = 0 THEN CAST(64 + (id * 3) % 512 AS INT) END,
             'duration_ms',CASE WHEN id % 3 > 0 THEN CAST(1000 + id * 37 AS LONG) END,
             'sample_rate',CASE WHEN id % 3 = 1 THEN CAST(16000 AS INT) END
           ) AS meta""",
    )


def image_features_stub(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract boundary (``mapInPandas``).

    STUB: real implementation decodes the payload (PIL/torchvision — not
    in this container) and runs a vision encoder.  The fake derives a
    deterministic per-row feature vector from payload bytes so the
    surrounding plan (pruning, batching, schema) is fully exercised.
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, phashes, sizes = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None); phashes.append(None); sizes.append(None)
                    continue
                digest = hashlib.md5(bytes(payload)).hexdigest()
                phashes.append(digest[:16])
                sizes.append(len(payload))
                feats.append(
                    [int(digest[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(feature_dim)]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": sizes,
                    "phash": phashes,
                    "features": feats,
                }
            )

    # prune BEFORE the Arrow boundary: only (media_id, payload) crosses
    return media.select("media_id", "payload").mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def resize_image_stub(
    media: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Resize boundary (``mapInPandas``, binary in → binary out).

    STUB kernel: a real resize decodes pixels and interpolates
    (PIL/opencv — not in this container); the fake produces a payload of
    EXACTLY ``target_w*target_h`` bytes by cycling the source bytes, so
    the output-size contract, the Arrow binary round-trip, and the
    metadata rewrite are all real and the result is reproducible from
    the input bytes (the oracle recomputes it in SQL).
    """

    n_out = target_w * target_h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                if payload is None or len(payload) == 0:
                    out.append(bytes(n_out))
                    continue
                b = bytes(payload)
                out.append((b * (n_out // len(b) + 1))[:n_out])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, "media_id long, payload binary, width int, height int"
    )


def audio_window_features_stub(media: DataFrame, window_ms: int = 250) -> DataFrame:
    """Audio windowing + per-window feature extraction.

    The explode (1 clip → N fixed-width windows from duration metadata)
    is plain Catalyst; the per-window feature crosses a REAL Arrow
    ``pandas_udf`` boundary.  STUB kernel: a real implementation computes
    RMS energy / MFCCs from decoded samples (soundfile/librosa — not in
    this container); the fake derives a deterministic energy integer from
    md5(media_id:window), which the oracle reproduces in SQL.
    """
    import hashlib

    @F.pandas_udf("long")
    def energy(mid: pd.Series, widx: pd.Series) -> pd.Series:
        keys = mid.astype("int64").astype(str) + ":" + widx.astype("int64").astype(str)
        return keys.map(lambda s: int(hashlib.md5(s.encode()).hexdigest()[:4], 16))

    wins = media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.ceil(F.col("meta.duration_ms") / window_ms).cast("long") - 1,
                    F.lit(0),
                ),
            )
        ).alias("widx"),
    ).withColumn("win_start_ms", F.col("widx") * window_ms)
    return wins.withColumn("energy", energy(F.col("media_id"), F.col("widx")))


def decode_image(media: DataFrame) -> DataFrame:
    """Real pixel decode — requires an image codec library.

    Not fakeable without lying about pixel data; explicitly unimplemented
    in this environment.
    """
    raise NotImplementedError(
        "pixel decode needs PIL/torchvision, not present in this container; "
        "use image_features_stub for plumbing tests"
    )


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: 1 row per sampled frame (UDTF-shaped explode).

    STUB kernel: frame timestamps derived from duration metadata; real
    implementation would demux the container (ffmpeg).  The explode shape
    — one media row → N frame rows with carried metadata — is the real
    contract.
    """
    frames = media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("meta.duration_ms") / every_ms).cast("long") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    return frames


def repartition_by_bytes(media: DataFrame, target_partition_bytes: int = 128 << 20, avg_payload_bytes: int | None = None) -> DataFrame:
    """Partition media by byte budget, not row count (payloads are MBs)."""
    if avg_payload_bytes is None:
        avg_payload_bytes = (
            media.select(F.avg(F.length("payload"))).first()[0] or 1
        )
    rows_per_part = max(1, int(target_partition_bytes / max(avg_payload_bytes, 1)))
    n_rows = media.count()
    n_parts = max(1, (n_rows + rows_per_part - 1) // rows_per_part)
    return media.repartition(n_parts)


def pool_frame_embeddings(
    frames,
    media_col: str = "media_id",
    vec_col: str = "embedding",
    fp: int = 1_000_000,
):
    """Sum-pool per-frame embeddings into one clip-level vector per
    media item — the frame→clip reduction every video/audio embedding
    pipeline runs after frame-level feature extraction.

    Returns FLAT rows (media_id, pos, n_frames, pooled_micro): one row
    per (media, dimension), ``pos`` 1-based, components summed in
    ``fp``-scaled integer micro-units so the distributed sum is exact
    and order-independent (mean-pool = pooled_micro / n_frames
    downstream, kept rational here).  Plan: posexplode (one shuffle-free
    map stage) + one combinable (media, pos) aggregation — at 100 TB
    the groupBy key count is |media| x dim, each group ~frame-count
    rows, no skew beyond the longest video.
    """
    from pyspark.sql import functions as F

    exploded = frames.select(
        F.col(media_col),
        F.posexplode(vec_col).alias("pos0", "x"),
    ).select(
        media_col,
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * fp).cast("long").alias("micro"),
    )
    return exploded.groupBy(media_col, "pos").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum("micro").cast("long").alias("pooled_micro"),
    )

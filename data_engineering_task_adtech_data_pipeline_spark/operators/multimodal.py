"""Multimodal columns: opaque binary payloads + typed metadata, processed
via Arrow-batched ``mapInPandas`` operators.

Design (the part that matters at 100 TB and IS real here):
- media travels as a ``binary`` column beside a typed metadata struct —
  (modality, mime, width/height/duration, byte size); Catalyst prunes the
  binary column away for metadata-only queries, so `SELECT count(*) WHERE
  meta.mime = 'image/png'` never reads payload bytes,
- decode/resize/frame-sample are per-partition Arrow-batch operators
  (``mapInPandas``): payloads never serialize row-at-a-time and never visit
  the driver,
- partitioning by (modality, size-bucket) keeps batches homogeneous so a
  batch's peak memory is bounded by ``batch_rows x max_payload``.

The actual pixel/audio decoding is STUBBED (this container ships no
image/audio libraries): ``decode_images`` raises ``NotImplementedError``
unless ``fake=True``, which produces a deterministic fake feature vector
from the payload bytes — the Spark-side plumbing (schemas, batching, UDF
signatures) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        # nullable: a NULL payload has no byte count (and a non-null
        # declaration would crash the Arrow round-trip in mapInPandas)
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def attach_meta(df: DataFrame, payload_col: str = "payload",
                modality: str = "image", mime: str | None = None) -> DataFrame:
    """Derive the metadata struct from a bare binary column (n_bytes is
    computed; dimensional fields stay NULL until decode)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def size_bucketed(df: DataFrame, buckets: int = 32) -> DataFrame:
    """Repartition so each partition holds similar-sized payloads — bounds
    Arrow batch memory (big payloads don't co-batch with thousands of small
    ones)."""
    return df.repartition(buckets, F.ceil(F.log2(F.col("meta.n_bytes") + 1)))


def decode_images(
    df: DataFrame,
    fake: bool = False,
    feature_dim: int = 8,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode image payloads to feature vectors via Arrow-batched
    ``mapInPandas``.

    Real decoding requires an image library not present in this container —
    call with ``fake=True`` for a deterministic payload-derived fake feature
    (keeps every Spark-side contract testable); ``fake=False`` raises
    NotImplementedError *inside the executor batch*, which is where a real
    implementation would plug in (PIL/cv2 import at top of ``run``).

    ``batch_rows`` sets the SESSION-level Arrow batch-size conf (Spark
    reads it at execution, not per plan): the last multimodal operator
    built before an action wins for every Arrow exchange in that job, and
    the setting persists for later pandas-UDF operators in the session.
    Set it once per job to the smallest payload-appropriate value.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode needs PIL/cv2 — not available in this "
                    "container; run with fake=True for the deterministic stub"
                )
            feats, oks = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    oks.append(False)
                    continue
                # deterministic fake "embedding": byte-histogram moments,
                # vectorized (frombuffer+bincount) — the pattern a real
                # decoder should follow: numpy over the buffer, never
                # per-byte Python
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % feature_dim, minlength=feature_dim)
                feats.append(
                    [float(arr.size), *hist[: feature_dim - 1].astype(float)]
                )
                oks.append(True)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decode_ok": oks}
            )

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
    batch_rows: int = 256,
) -> DataFrame:
    """Resize image payloads via Arrow-batched ``mapInPandas`` — same
    executor-side contract as ``decode_images``: output rows carry the
    (possibly re-encoded) payload plus a meta struct with the new
    dimensions filled in.

    Real resizing needs PIL/cv2 (absent in this container): ``fake=True``
    passes payload bytes through untouched and stamps width/height into the
    metadata — exercising the full schema/batching path — while
    ``fake=False`` raises NotImplementedError inside the executor batch,
    exactly where `PIL.Image.open(BytesIO(payload)).resize(...)` plugs in.

    Scale shape: per-partition Arrow batches, no shuffle, payloads never
    visit the driver; pair with ``size_bucketed`` so one batch's memory is
    bounded by ``batch_rows x max_payload``. ``batch_rows`` is the same
    session-level Arrow conf ``decode_images`` documents — last setting
    before an action wins session-wide.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("meta", MEDIA_META, True),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize needs PIL/cv2 — not available in this "
                    "container; run with fake=True for the pass-through stub"
                )
            metas = []
            for m in pdf["meta"]:
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = width, height
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],
                    "meta": metas,
                }
            )

    return df.select("media_id", "payload", "meta").mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, duration) into the
    frame timestamps to decode — pure built-ins, no payload access, so the
    expensive decode fan-out is planned columnar-side and the decoder only
    receives (media_id, frame_ts) work units."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )

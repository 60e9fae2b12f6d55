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

Decoding support (round 6): ``decode_images(fake=False)`` /
``resize_images(fake=False)`` now REALLY decode two dependency-free
formats — binary PPM (P6) and uncompressed 24-bit BMP — via hand-rolled
numpy parsers inside the Arrow batch (``_decode_payload``), exactly where
PIL/cv2 would plug in for the rest. Unsupported formats still raise
``NotImplementedError`` inside the executor batch (no image libraries in
this container); a corrupt payload of a supported format yields
``decode_ok=False`` rather than failing the job. ``fake=True`` keeps the
deterministic byte-histogram stub used by the oracle-checked battery
entry (q40).
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


# ---------------------------------------------------------------------------
# Dependency-free decoders (executor-side; numpy only). PPM P6 and
# uncompressed 24-bit BMP cover the "real bytes in, real pixels out" path
# offline; everything else needs PIL/cv2 (env-blocked, DEVIATIONS.md).
# ---------------------------------------------------------------------------

def _ppm_decode(payload: bytes):
    """Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` with
    whitespace/`#` comments, then raw RGB (1 byte/sample for maxval<256).
    Returns (H, W, 3) uint8 ndarray, or None if the payload is corrupt."""
    import numpy as np

    try:
        if payload[:2] != b"P6":
            return None
        pos, vals = 2, []
        n = len(payload)
        while len(vals) < 3:
            while pos < n and payload[pos : pos + 1].isspace():
                pos += 1
            if pos < n and payload[pos : pos + 1] == b"#":
                while pos < n and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(payload[start:pos]))
        pos += 1  # single whitespace byte after maxval
        w, h, maxval = vals
        if w <= 0 or h <= 0 or not (0 < maxval < 256):
            return None
        raw = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
        return raw.reshape(h, w, 3)
    except (ValueError, IndexError):
        return None


def _ppm_encode(arr) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def _bmp_decode(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB, bottom-up or
    top-down): rows padded to 4 bytes, BGR order. Returns (H, W, 3) uint8
    RGB ndarray, or None if corrupt/unsupported sub-format."""
    import struct

    import numpy as np

    try:
        if payload[:2] != b"BM" or len(payload) < 54:
            return None
        (data_off,) = struct.unpack_from("<I", payload, 10)
        w, h_signed = struct.unpack_from("<ii", payload, 18)
        (bpp,) = struct.unpack_from("<H", payload, 28)
        (compression,) = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or compression != 0 or w <= 0 or h_signed == 0:
            return None
        h = abs(h_signed)
        stride = (w * 3 + 3) & ~3
        raw = np.frombuffer(payload, np.uint8, count=stride * h,
                            offset=data_off)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if h_signed > 0:  # bottom-up storage
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR -> RGB
    except (ValueError, IndexError, struct.error):
        return None


def _bmp_encode(arr) -> bytes:
    import struct

    import numpy as np

    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    data = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                    2835, 2835, 0, 0)
    return header + data


def _decode_payload(payload: bytes):
    """Sniff + decode a supported payload. Returns (pixels, fmt) where
    pixels is (H, W, 3) uint8 (None if the supported-format payload is
    corrupt); raises NotImplementedError for formats needing PIL/cv2."""
    if payload[:2] == b"P6":
        return _ppm_decode(payload), "ppm"
    if payload[:2] == b"BM":
        return _bmp_decode(payload), "bmp"
    raise NotImplementedError(
        "only PPM(P6)/24-bit BMP decode offline; other formats need "
        "PIL/cv2 — not available in this container (DEVIATIONS.md)"
    )


def _encode_payload(arr, fmt: str) -> bytes:
    return _ppm_encode(arr) if fmt == "ppm" else _bmp_encode(arr)


def _resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resample via numpy index arrays (no interpolation
    libs): output pixel (i, j) samples source (floor((i+.5)*H/h'), ...)."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height), h - 1).astype(int)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width), w - 1).astype(int)
    return arr[rows][:, cols]


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

    ``fake=False`` REALLY decodes PPM(P6)/24-bit BMP payloads via the
    module's hand-rolled numpy parsers and emits
    ``[width, height, mean R, mean G, mean B, std R, std G, std B]``
    (truncated/zero-padded to ``feature_dim``); a corrupt supported-format
    payload yields ``decode_ok=False``; other formats raise
    NotImplementedError *inside the executor batch*, which is where
    PIL/cv2 would plug in. ``fake=True`` produces the deterministic
    payload-derived byte-histogram feature (oracle-expressible — q40).

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
            feats, oks = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    oks.append(False)
                    continue
                if fake:
                    # deterministic fake "embedding": byte-histogram
                    # moments, vectorized (frombuffer+bincount) — numpy
                    # over the buffer, never per-byte Python
                    arr = np.frombuffer(payload, dtype=np.uint8)
                    hist = np.bincount(
                        arr % feature_dim, minlength=feature_dim
                    )
                    feats.append(
                        [float(arr.size),
                         *hist[: feature_dim - 1].astype(float)]
                    )
                    oks.append(True)
                    continue
                pixels, _ = _decode_payload(bytes(payload))
                if pixels is None:
                    feats.append(None)
                    oks.append(False)
                    continue
                px = pixels.reshape(-1, 3).astype(np.float64)
                f = [
                    float(pixels.shape[1]), float(pixels.shape[0]),
                    *px.mean(axis=0).tolist(), *px.std(axis=0).tolist(),
                ]
                feats.append((f + [0.0] * feature_dim)[:feature_dim])
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

    ``fake=False`` REALLY resizes PPM(P6)/24-bit BMP payloads —
    hand-rolled decode, numpy nearest-neighbor resample, re-encode in the
    source format — with width/height stamped into the metadata; a corrupt
    supported-format payload passes through with a NULL payload; other
    formats raise NotImplementedError inside the executor batch, exactly
    where `PIL.Image.open(BytesIO(payload)).resize(...)` plugs in.
    ``fake=True`` passes payload bytes through untouched and stamps the
    metadata only (the schema/batching path without pixel work).

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
            metas, payloads = [], []
            for payload, m in zip(pdf["payload"], pdf["meta"]):
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = width, height
                metas.append(m)
                if fake or payload is None:
                    payloads.append(payload)
                    continue
                pixels, fmt = _decode_payload(bytes(payload))
                if pixels is None:
                    payloads.append(None)  # corrupt: no resized bytes
                    continue
                payloads.append(
                    _encode_payload(
                        _resize_nearest(pixels, width, height), fmt
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.select("media_id", "payload", "meta").mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Audio: dependency-free RIFF/WAVE PCM parser (round 7). Retires the next
# slice of the decode stub the way PPM/BMP did for images: real bytes in,
# real samples out, numpy-only. MP3/OGG/FLAC still need audio libs
# (env-blocked, DEVIATIONS.md) and raise inside the executor batch.
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _wav_encode(samples, sample_rate: int = 8000, channels: int = 1,
                bits: int = 16) -> bytes:
    """Encode int samples (interleaved if multi-channel) as a canonical
    RIFF/WAVE PCM payload. ``bits=16``: int16 LE; ``bits=8``: unsigned
    bytes (the WAV convention for 8-bit PCM)."""
    import struct

    import numpy as np

    if bits == 16:
        body = np.asarray(samples, dtype="<i2").tobytes()
    elif bits == 8:
        body = np.asarray(samples, dtype=np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * bits // 8, channels * bits // 8, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _wav_decode(payload: bytes):
    """Parse a RIFF/WAVE PCM payload (8-bit unsigned or 16-bit signed LE,
    any channel count): walks the chunk list (word-aligned, unknown chunks
    skipped), returns ``(info_dict, samples)`` where samples is a signed
    int numpy array (8-bit recentred to [-128, 127]), or ``None`` if the
    payload is corrupt or a non-PCM/unsupported-depth sub-format."""
    import struct

    import numpy as np

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos, n = 12, len(payload)
        fmt_info, data = None, None
        while pos + 8 <= n:
            cid = payload[pos : pos + 4]
            (csize,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if body_start + csize > n:
                return None  # truncated chunk
            if cid == b"fmt " and csize >= 16:
                audio_format, channels, rate, _br, _ba, bits = (
                    struct.unpack_from("<HHIIHH", payload, body_start)
                )
                fmt_info = (audio_format, channels, rate, bits)
            elif cid == b"data":
                data = payload[body_start : body_start + csize]
            pos = body_start + csize + (csize & 1)  # odd chunks padded
        if fmt_info is None or data is None:
            return None
        audio_format, channels, rate, bits = fmt_info
        if audio_format != 1 or channels < 1 or rate <= 0:
            return None  # compressed / malformed: unsupported sub-format
        if bits == 16:
            samples = np.frombuffer(
                data[: len(data) - (len(data) % 2)], dtype="<i2"
            ).astype(np.int32)
        elif bits == 8:
            samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
        else:
            return None
        n_frames = samples.size // channels
        info = {
            "sample_rate": int(rate),
            "channels": int(channels),
            "bits": int(bits),
            "n_frames": int(n_frames),
            "duration_ms": int(n_frames * 1000 // rate),
        }
        return info, samples[: n_frames * channels]
    except (ValueError, IndexError, struct.error):
        return None


def decode_audio(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode audio payloads to waveform stats via Arrow-batched
    ``mapInPandas``: RIFF/WAVE PCM payloads REALLY parse (hand-rolled,
    numpy-only ``_wav_decode``) into (sample_rate, channels, bits,
    n_frames, duration_ms, peak, rms); a corrupt or non-PCM WAV yields
    ``decode_ok=False``; non-RIFF formats (MP3/OGG/FLAC) raise
    NotImplementedError inside the executor batch — exactly where an
    audio library would plug in (DEVIATIONS.md).

    Numerics are oracle-exact by construction: peak/sum-of-squares are
    integer math over the decoded samples (sum(s^2) < 2^53 for any
    payload this container can hold), and ``rms = sqrt(sum_sq / n)`` is
    two correctly-rounded IEEE-double ops — an external SQL oracle
    deriving the same samples reproduces it bit-for-bit, no rounding
    fudge needed. Same scale shape as ``decode_images``: per-partition
    Arrow batches, payloads never visit the driver; ``batch_rows`` is the
    session-level Arrow conf documented there.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))

    def run(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, False))
                    continue
                payload = bytes(payload)
                if len(payload) < 12:
                    # too short to be ANY audio container — corrupt per
                    # the contract, not a foreign format (review r7)
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, False))
                    continue
                if payload[:4] != b"RIFF":
                    raise NotImplementedError(
                        "only RIFF/WAVE PCM decodes offline; compressed "
                        "audio needs an audio library — not available in "
                        "this container (DEVIATIONS.md)"
                    )
                dec = _wav_decode(payload)
                if dec is None:
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, False))
                    continue
                info, samples = dec
                if samples.size:
                    peak = int(max(samples.max(), -samples.min()))
                    sum_sq = int((samples.astype("int64") ** 2).sum())
                    rms = math.sqrt(sum_sq / samples.size)
                else:
                    peak, rms = None, None
                rows.append((
                    media_id, info["sample_rate"], info["channels"],
                    info["bits"], info["n_frames"], info["duration_ms"],
                    peak, rms, True,
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields]
            )

    return df.select("media_id", "payload").mapInPandas(run, AUDIO_SCHEMA)


def synth_wav(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", sample_rate: int = 8000) -> DataFrame:
    """Deterministic WAV test fixture: encodes each row's text as a mono
    16-bit PCM payload with samples
    ``s_i = ((codepoint(text[i]) * 257 + 7*i) % 65536) - 32768`` (1-based
    i) — a pure function of the text, so an external SQL oracle can derive
    the exact samples (and thus every decoded stat) from the source table.
    Returns (media_id, payload)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                if t is None:
                    payloads.append(None)
                    continue
                samples = [
                    ((ord(c) * 257 + 7 * i) % 65536) - 32768
                    for i, c in enumerate(t, start=1)
                ]
                payloads.append(_wav_encode(samples, sample_rate))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Video: dependency-free YUV4MPEG2 (Y4M) codec (round 8 — retires the last
# plan-only modality the way q98 retired audio and PPM/BMP retired images).
# Y4M is the uncompressed interchange container (mjpegtools/ffmpeg
# `-f yuv4mpeg`): one ASCII header line, then per-frame `FRAME\n` markers
# followed by raw planes — parseable with numpy alone. Supported
# colorspaces offline: `Cmono` (one Y plane/frame), `C444` (Y,U,V planes,
# no subsampling), the `C420` family since round 9 (`420`, `420jpeg`,
# `420mpeg2`, `420paldv`: identical plane layout, the tags differ only
# in chroma SITING, which nearest-neighbor reconstruction is agnostic
# to), and `C422`/`C411` since round 10 (horizontal-only subsampling at
# 1/2 and 1/4 width — the broadcast/capture and DV interchange formats).
# Subsampled chroma is reconstructed by exact nearest-neighbor upsample
# (4:2:0: full-res pixel reads chroma block (x//2, y//2); 4:2:2:
# (x//2, y); 4:1:1: (x//4, y) — pure
# integer indexing, so every decoded value stays oracle-derivable;
# smooth bilinear siting-aware reconstruction is the video library's
# refinement, not a correctness requirement). Compressed video
# (MP4/MKV/AVI-MJPEG) raises NotImplementedError inside the executor
# batch — the spot ffmpeg plugs in (DEVIATIONS.md).
# ---------------------------------------------------------------------------


def _y4m_encode(frames, fps_num: int = 4, fps_den: int = 1) -> bytes:
    """Encode (n, h, w) uint8 (mono) or (n, h, w, 3) uint8 (444) frames
    as a YUV4MPEG2 payload. For subsampled chroma pass ``frames`` as a
    tuple ``(Y, U, V)`` of uint8 arrays with Y shaped (n, h, w); the
    chroma shape selects the tag — (n, h/2, w/2) writes ``C420``
    (even h, w), (n, h, w/2) writes ``C422`` (even w), (n, h, w/4)
    writes ``C411`` (w divisible by 4)."""
    import numpy as np

    if isinstance(frames, tuple):
        yp, up, vp = (np.asarray(p, dtype=np.uint8) for p in frames)
        n, h, w = yp.shape
        if vp.shape != up.shape:
            raise ValueError(
                f"chroma planes must match: U {up.shape} vs V {vp.shape}"
            )
        if up.shape == (n, h, w // 2):
            if w % 2:
                raise ValueError("C422 requires even width")
            cs = b"422"
        elif w >= 4 and up.shape == (n, h, w // 4):
            if w % 4:
                raise ValueError("C411 requires width divisible by 4")
            cs = b"411"
        elif h % 2 or w % 2:
            # not a horizontal-only layout; the only other subsampled
            # layout (420) is ill-defined on odd dims
            raise ValueError("C420 requires even dimensions")
        elif up.shape == (n, h // 2, w // 2):
            cs = b"420"
        else:
            raise ValueError(
                "chroma planes must be (n, h/2, w/2) [C420], "
                f"(n, h, w/2) [C422] or (n, h, w/4) [C411], got "
                f"{up.shape} for Y {yp.shape}"
            )
        out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
               % (w, h, fps_num, fps_den, cs)]
        for f in range(n):
            out.append(b"FRAME\n")
            out.append(yp[f].tobytes())
            out.append(up[f].tobytes())
            out.append(vp[f].tobytes())
        return b"".join(out)
    arr = np.asarray(frames, dtype=np.uint8)
    mono = arr.ndim == 3
    if not mono and not (arr.ndim == 4 and arr.shape[-1] == 3):
        raise ValueError("frames must be (n,h,w) mono or (n,h,w,3) 444")
    n, h, w = arr.shape[:3]
    cs = b"mono" if mono else b"444"
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
           % (w, h, fps_num, fps_den, cs)]
    for f in range(n):
        out.append(b"FRAME\n")
        if mono:
            out.append(arr[f].tobytes())
        else:
            # planar, not interleaved: all Y, then all U, then all V
            out.append(arr[f, :, :, 0].tobytes())
            out.append(arr[f, :, :, 1].tobytes())
            out.append(arr[f, :, :, 2].tobytes())
    return b"".join(out)


_C420_TAGS = ("420", "420jpeg", "420mpeg2", "420paldv")


def _y4m_decode(payload: bytes):
    """Parse a YUV4MPEG2 payload (Cmono, C444, C422, C411, or the C420
    family). Returns ``(info_dict, frames)`` — frames is (n, h, w) uint8
    for mono or (n, h, w, 3) uint8 planar-stacked for 444/422/411/420
    (subsampled chroma reconstructed by exact nearest-neighbor upsample:
    full-res pixel (x, y) reads chroma block (x//2, y//2) for 420,
    (x//2, y) for 422, (x//4, y) for 411) — or ``None`` if the payload
    is corrupt or an unsupported-colorspace sub-format."""
    import numpy as np

    try:
        nl = payload.index(b"\n")
        header = payload[:nl].decode("ascii")
        if not header.startswith("YUV4MPEG2"):
            return None
        w = h = fn = fd = None
        cs = "420"  # the Y4M spec default when no C tag is present
        for tag in header.split(" ")[1:]:
            if not tag:
                continue
            key, val = tag[0], tag[1:]
            if key == "W":
                w = int(val)
            elif key == "H":
                h = int(val)
            elif key == "F":
                fn, fd = (int(x) for x in val.split(":"))
            elif key == "C":
                cs = val
        if not w or not h or w <= 0 or h <= 0 or not fn or not fd:
            return None
        sub420 = cs in _C420_TAGS
        sub422 = cs == "422"
        sub411 = cs == "411"
        if cs not in ("mono", "444") and not (sub420 or sub422 or sub411):
            return None  # 16-bit planes (e.g. C420p10): unsupported
        if sub420 and (w % 2 or h % 2):
            return None  # C420 plane split is ill-defined on odd dims
        if sub422 and w % 2:
            return None  # C422 subsamples horizontally only
        if sub411 and w % 4:
            return None  # C411 subsamples width by 4
        planes = 1 if cs == "mono" else 3
        wh = w * h
        if sub420:
            csize = wh // 4  # (h/2) x (w/2) per chroma plane
        elif sub422:
            csize = h * (w // 2)  # full-height, half-width
        elif sub411:
            csize = h * (w // 4)  # full-height, quarter-width
        else:
            csize = wh
        fsize = wh if planes == 1 else wh + 2 * csize
        frames, pos, n = [], nl + 1, len(payload)
        while pos < n:
            fnl = payload.index(b"\n", pos)
            if payload[pos:fnl].split(b" ")[0] != b"FRAME":
                return None
            body = fnl + 1
            if body + fsize > n:
                return None  # truncated frame
            raw = np.frombuffer(payload, np.uint8, count=fsize, offset=body)
            if planes == 1:
                frames.append(raw.reshape(h, w))
            elif sub420 or sub422 or sub411:
                yp = raw[:wh].reshape(h, w)
                ch_h = h // 2 if sub420 else h
                ch_w = w // 4 if sub411 else w // 2
                up = raw[wh:wh + csize].reshape(ch_h, ch_w)
                vp = raw[wh + csize:].reshape(ch_h, ch_w)
                # nearest-neighbor upsample — exact integer indexing
                # (420: 2x both axes; 422: 2x horizontal; 411: 4x
                # horizontal)
                if sub420:
                    up = np.repeat(up, 2, axis=0)
                    vp = np.repeat(vp, 2, axis=0)
                hx = 4 if sub411 else 2
                uf = np.repeat(up, hx, axis=1)
                vf = np.repeat(vp, hx, axis=1)
                frames.append(np.stack([yp, uf, vf], axis=-1))
            else:
                frames.append(raw.reshape(3, h, w).transpose(1, 2, 0))
            pos = body + fsize
        if not frames:
            return None
        info = {
            "width": int(w), "height": int(h),
            "fps_num": int(fn), "fps_den": int(fd),
            "colorspace": cs, "n_frames": len(frames),
            "duration_ms": int(len(frames) * 1000 * fd // fn),
        }
        return info, np.stack(frames)
    except (ValueError, IndexError, UnicodeDecodeError):
        return None


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps_num", T.IntegerType(), True),
        T.StructField("fps_den", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("lum_peak", T.IntegerType(), True),
        T.StructField("lum_sum", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def decode_video(df: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Decode video payloads to stream stats via Arrow-batched
    ``mapInPandas``: Y4M payloads REALLY parse (hand-rolled numpy
    ``_y4m_decode``) into (width, height, fps, n_frames, duration_ms)
    plus integer luminance stats over ALL frames — ``lum_peak`` = max Y
    sample, ``lum_sum`` = exact sum of Y samples (mono: the plane itself;
    444: the Y plane). Corrupt/unsupported-colorspace Y4M yields
    ``decode_ok=False``; non-Y4M magic raises NotImplementedError in the
    executor batch (the decode contract shared with images/audio —
    DEVIATIONS.md). All-integer stats keep every value oracle-derivable
    bit-for-bit. ``batch_rows`` bounds Arrow batch memory (video payloads
    are the largest media rows; same session conf as decode_images).
    CAVEAT: ``spark.sql.execution.arrow.maxRecordsPerBatch`` is a SESSION
    conf read once at execution — when several mapInPandas operators
    compose in one job, the LAST one built wins for the whole job, so a
    composed pipeline must pass the payload-heaviest stage's bound to
    every operator in it (q118 does)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, None, False))
                    continue
                payload = bytes(payload)
                if len(payload) < 10:
                    # too short for ANY container magic — corrupt per the
                    # contract, not a foreign format
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, None, False))
                    continue
                if payload[:9] != b"YUV4MPEG2":
                    raise NotImplementedError(
                        "only YUV4MPEG2 (Y4M) decodes offline; compressed "
                        "video needs a video library — not available in "
                        "this container (DEVIATIONS.md)"
                    )
                dec = _y4m_decode(payload)
                if dec is None:
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, None, False))
                    continue
                info, frames = dec
                y = frames if frames.ndim == 3 else frames[..., 0]
                rows.append((
                    media_id, info["width"], info["height"],
                    info["fps_num"], info["fps_den"], info["n_frames"],
                    info["duration_ms"],
                    int(y.max()), int(y.astype("int64").sum()), True,
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_SCHEMA.fields]
            )

    return df.select("media_id", "payload").mapInPandas(run, VIDEO_SCHEMA)


def sample_frames(
    df: DataFrame, every_n: int = 2, batch_rows: int = 64
) -> DataFrame:
    """REAL frame extraction (replaces round-7's plan-only
    ``frame_sample_plan``): decode the Y4M payload, keep every
    ``every_n``-th frame (starting at frame 0 — decimation in time, the
    video twin of ``resample_audio``'s decimation in samples), and emit
    each kept frame as a REAL P6 PPM payload (mono Y replicated to RGB;
    444 planes passed through) — so the extracted frames feed straight
    into the existing image operators (``ahash_images`` → temporal /
    cross-video duplicate detection, ``decode_images``, ``resize_images``).
    Output: (media_id, frame_idx, width, height, payload). Same Arrow
    shape + failure contract as :func:`decode_video`: corrupt payloads
    emit NO frame rows, foreign formats raise in the executor batch."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if len(payload) < 10:
                    continue  # corrupt: no frames (decode contract)
                if payload[:9] != b"YUV4MPEG2":
                    raise NotImplementedError(
                        "only YUV4MPEG2 (Y4M) frame-samples offline; "
                        "compressed video needs a video library "
                        "(DEVIATIONS.md)"
                    )
                dec = _y4m_decode(payload)
                if dec is None:
                    continue
                info, frames = dec
                for idx in range(0, info["n_frames"], every_n):
                    fr = frames[idx]
                    rgb = (
                        np.repeat(fr[:, :, None], 3, axis=2)
                        if fr.ndim == 2 else fr
                    )
                    rows.append((
                        media_id, idx, info["width"], info["height"],
                        _ppm_encode(rgb),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.select("media_id", "payload").mapInPandas(run, out_schema)


def synth_y4m(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", width: int = 16,
              height: int = 12) -> DataFrame:
    """Deterministic Y4M test fixture (the video member of the
    ``synth_wav`` / ``synth_ppm`` family): a clip at 4 fps with
    ``n_frames = (len(text) % 3) + 2`` frames, where frame f's Y pixel
    (x, y) derives from the text codepoint at index
    ``((f*height + y)*width + x) mod len(text)`` (0-based) as
    ``lum = (cp*3 + x + 5*y + 11*f) % 256`` — a pure function of the
    text, so an external SQL oracle can re-derive any frame pixel (and
    thus every decoded stat and every sampled-frame aHash) from the
    source table.

    Colorspace arms (round 9, widened round 10): EVEN-length texts emit
    ``Cmono`` clips (Y plane only, as before); ODD-length texts carry
    deterministic subsampled chroma on top of the SAME Y plane —
    ``len % 4 == 1`` emits ``C420`` (half-resolution both axes, the
    dominant real-world colorspace), ``len % 4 == 3`` emits ``C422``
    (half-width full-height, the broadcast/capture interchange format).
    Chroma at chroma coords (cx, cy):
    ``u = (cp[ku]*7 + 3*cx + cy + 2*f) % 256`` with
    ``ku = ((f*ch + cy)*(width/2) + cx) mod len(text)`` and
    ``v = (cp[kv]*11 + cx + 4*cy + 6*f) % 256`` with ``kv = ku + 1 mod
    len(text)``, where the chroma-plane height ``ch`` is ``height/2``
    for 420 and ``height`` for 422 — the SAME formulas, so the arms
    differ only in plane geometry. Because decode reconstructs chroma by
    nearest-neighbor (full-res (x, y) reads block (x//2, y//2) for 420,
    (x//2, y) for 422), every decoded channel value stays a pure integer
    function of the text — the oracle for the sampled-frame hashes
    (q118) re-derives the chroma at block coords, which VALUE-CHECKS
    each arm's upsample indexing itself. Returns (media_id, payload);
    NULL/empty text yields a NULL payload."""
    if width % 2 or height % 2:
        raise ValueError("width/height must be even (C420 arm)")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        x = np.arange(width)[None, None, :]
        y = np.arange(height)[None, :, None]
        cw, ch = width // 2, height // 2
        cx = np.arange(cw)[None, None, :]
        cy = np.arange(ch)[None, :, None]
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                if t is None or len(t) == 0:
                    payloads.append(None)
                    continue
                n_frames = (len(t) % 3) + 2
                f = np.arange(n_frames)[:, None, None]
                cps = np.frombuffer(
                    t.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                k = (f * height + y) * width + x
                cp = cps[k % len(cps)]
                lum = ((cp * 3 + x + 5 * y + 11 * f) % 256).astype(np.uint8)
                if len(t) % 2 == 0:
                    payloads.append(_y4m_encode(lum, fps_num=4, fps_den=1))
                    continue
                # odd-length text: subsampled-chroma clip — same Y plane
                # plus deterministic chroma (docstring math); len%4==1 is
                # C420 (h/2 x w/2), len%4==3 is C422 (h x w/2): identical
                # formulas, only the chroma-plane geometry differs
                if len(t) % 4 == 1:
                    cyk, chh = cy, ch
                else:
                    cyk, chh = y, height  # 422: full-height chroma rows
                ku = (f * chh + cyk) * cw + cx
                up = ((cps[ku % len(cps)] * 7 + 3 * cx + cyk + 2 * f)
                      % 256).astype(np.uint8)
                vp = ((cps[(ku + 1) % len(cps)] * 11 + cx + 4 * cyk + 6 * f)
                      % 256).astype(np.uint8)
                payloads.append(
                    _y4m_encode((lum, up, vp), fps_num=4, fps_den=1)
                )
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def resample_audio(df: DataFrame, factor: int = 2,
                   batch_rows: int = 256) -> DataFrame:
    """Integer-factor audio decimation over real PCM payloads: decode the
    RIFF/WAVE payload (:func:`_wav_decode`), keep every ``factor``-th
    FRAME (all channels of it, starting at frame 0), re-encode a real WAV
    payload at the reduced rate and emit the resampled waveform stats —
    the downsample stage of an audio-curation pipeline, end-to-end real
    bytes on both sides of the batch. (Decimation without a low-pass is
    deliberate: it keeps every output sample an exact input sample, so an
    external oracle can re-derive peak/RMS bit-for-bit; an anti-alias FIR
    would be float convolution, the part an audio library owns.)

    Same Arrow/mapInPandas shape and failure contract as
    :func:`decode_audio`: corrupt/non-PCM payloads yield
    ``decode_ok=False``, non-RIFF formats raise in the executor batch.
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))

    out_schema = T.StructType(
        [*AUDIO_SCHEMA.fields, T.StructField("payload", T.BinaryType(), True)]
    )

    def run(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, False, None))
                    continue
                payload = bytes(payload)
                if len(payload) < 12:
                    # corrupt (too short for any container), not foreign
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, False, None))
                    continue
                if payload[:4] != b"RIFF":
                    raise NotImplementedError(
                        "only RIFF/WAVE PCM resamples offline; compressed "
                        "audio needs an audio library (DEVIATIONS.md)"
                    )
                dec = _wav_decode(payload)
                if dec is None:
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, False, None))
                    continue
                info, samples = dec
                ch = info["channels"]
                frames = samples.reshape(-1, ch)[::factor]
                out = frames.reshape(-1)
                new_rate = max(1, info["sample_rate"] // factor)
                n_frames = frames.shape[0]
                if out.size:
                    peak = int(max(out.max(), -out.min()))
                    sum_sq = int((out.astype("int64") ** 2).sum())
                    rms = math.sqrt(sum_sq / out.size)
                else:
                    peak, rms = None, None
                enc = _wav_encode(
                    out, sample_rate=new_rate, channels=ch,
                    bits=info["bits"],
                )
                rows.append((
                    media_id, new_rate, ch, info["bits"], n_frames,
                    int(n_frames * 1000 // new_rate), peak, rms, True, enc,
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.select("media_id", "payload").mapInPandas(run, out_schema)


def synth_ppm(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", width: int = 16,
              height: int = 12) -> DataFrame:
    """Deterministic PPM(P6) test fixture (the image twin of
    :func:`synth_wav`): pixel (x, y) derives from the text codepoint at
    index ``(y*width + x) mod len(text)`` (0-based) as
    ``r = (cp*3 + x) % 256, g = (cp*5 + y) % 256,
    b = (cp*7 + x + y) % 256`` — a pure function of the text, so an
    external SQL oracle can re-derive any pixel (and thus any decoded
    statistic) from the source table. Returns (media_id, payload); rows
    with NULL/empty text yield a NULL payload."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        x = np.arange(width)[None, :]
        y = np.arange(height)[:, None]
        k = y * width + x
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                if t is None or len(t) == 0:
                    payloads.append(None)
                    continue
                cps = np.frombuffer(
                    t.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                cp = cps[k % len(cps)]
                arr = np.stack(
                    [
                        (cp * 3 + x) % 256,
                        (cp * 5 + y) % 256,
                        (cp * 7 + x + y) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(_ppm_encode(arr))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def ahash_images(df: DataFrame, hash_size: int = 8,
                 batch_rows: int = 256) -> DataFrame:
    """Average-hash perceptual fingerprints over REALLY-decoded pixels —
    the image near-dup primitive (two images with small Hamming distance
    between their aHashes are visual near-duplicates; bucket-join on
    bit-bands exactly like ``dedup.simhash_candidates``). Pipeline per
    payload, all integer math so an oracle can reproduce it bit-for-bit:
    decode (PPM/BMP, :func:`_decode_payload`) → integer luminance
    ``(r+g+b) // 3`` → nearest-neighbor sample to hash_size² (the
    ``_resize_nearest`` (i+0.5) rule) → mean threshold with
    ``mean = sum // n`` → row-major bitstring ('1' where lum > mean).

    The hash is returned as a ``hash_size²``-char '0'/'1' STRING, not a
    packed int64 — a 64-bit pack would put bit 63 in the sign position
    and make cross-engine equality depend on overflow semantics.
    Corrupt supported-format payloads yield ``decode_ok=False``;
    foreign formats raise in the executor batch (decode contract)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("ahash_bits", T.StringType(), True),
            T.StructField("decode_ok", T.BooleanType(), False),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, False))
                    continue
                arr, _fmt = _decode_payload(bytes(payload))
                if arr is None:
                    rows.append((media_id, None, None, None, False))
                    continue
                h, w = arr.shape[:2]
                lum = arr.astype(np.int64).sum(axis=-1) // 3
                small = _resize_nearest(lum, hash_size, hash_size)
                mean = int(small.sum()) // (hash_size * hash_size)
                bits = "".join(
                    "1" if v > mean else "0" for v in small.reshape(-1)
                )
                rows.append((media_id, int(w), int(h), bits, True))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.select("media_id", "payload").mapInPandas(run, out_schema)


def ahash_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 6,
    band_bits: int = 16,
    max_bucket: int = 64,
) -> DataFrame:
    """Visual NEAR-duplicate pairs from aHash fingerprints — the banded
    LSH + verify recipe ``dedup.simhash_candidates`` applies to text,
    applied to images (and, through ``sample_frames``, to video frames):
    the 64-bit hash splits into ``64/band_bits`` substrings; images
    sharing ANY band bucket together (two hashes within Hamming distance
    d must agree on at least one band whenever d < n_bands — band_bits=16
    guarantees recall for d <= 3 and catches most d <= 6); bucket-local
    (id_a < id_b) pairs are then VERIFIED by exact Hamming distance over
    the full 64 bits and kept at ``<= max_hamming``.

    Scale shape: band rows explode 4x, buckets are band-local, and
    degenerate buckets (a band value shared by > ``max_bucket`` images —
    e.g. the all-black band) are DROPPED from pair generation, the same
    deterministic hot-bucket contract as ``record_link_pairs``/
    ``minhash_lsh_candidates``. The Hamming verify is one JVM-side
    fold over the two bound hash attributes — no UDF.
    """
    if 64 % band_bits != 0:
        raise ValueError(f"band_bits must divide 64, got {band_bits}")
    from pyspark.sql import functions as F

    from .dedup import pairs_from_sorted_ids

    n_bands = 64 // band_bits
    h = hashes.select(F.col(id_col).alias("id"), "ahash_bits")
    bands = h.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.substring(
                        "ahash_bits", b * band_bits + 1, band_bits
                    ).alias("band"),
                )
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band_idx", "bb.band")
    buckets = (
        bands.groupBy("band_idx", "band")
        .agg(F.array_sort(F.collect_set("id")).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    from .dedup import fan_out_pairs

    # pin the 64-step Hamming-fold verify's parallelism (fan_out_pairs
    # docstring): the bucket frame the pairs explode from is a few KB and
    # AQE coalesces it to 1-2 partitions at small scale
    pairs = fan_out_pairs(pairs_from_sorted_ids(buckets).distinct())
    ha = h.select(F.col("id").alias("id_a"), F.col("ahash_bits").alias("__ba"))
    hb = h.select(F.col("id").alias("id_b"), F.col("ahash_bits").alias("__bb"))
    ham = F.expr(
        "aggregate(sequence(1, 64), 0, (acc, i) -> acc + "
        "if(substr(__ba, i, 1) = substr(__bb, i, 1), 0, 1))"
    )
    return (
        pairs.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def audio_fingerprint(
    df: DataFrame, n_windows: int = 16, batch_rows: int = 256
) -> DataFrame:
    """Audio content fingerprints over REALLY-decoded PCM — the audio
    member of the near-dup fingerprint family (text: simhash; image/video
    frame: aHash; audio: this): the waveform splits into ``n_windows``
    equal time windows, each window's integer ENERGY (sum of squared
    samples — the robust, phase-insensitive statistic) compares against
    the clip mean, and the bits concatenate into a '0'/'1' string.
    Clips sharing a fingerprint are audio duplicates; near-dups band +
    Hamming-verify exactly like ``ahash_near_dup_pairs``.

    All integer math (energy·n_windows > total_energy — no division), so
    an external SQL oracle re-deriving the samples reproduces every bit.
    Window w covers frames [floor(w·L/n), floor((w+1)·L/n)); clips
    shorter than ``n_windows`` frames leave trailing windows empty
    (energy 0 → bit '0' on both engines). Same Arrow contract as
    ``decode_audio``: corrupt WAV → decode_ok=False, non-RIFF raises."""
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows)
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("fp_bits", T.StringType(), True),
            T.StructField("n_frames", T.IntegerType(), True),
            T.StructField("decode_ok", T.BooleanType(), False),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, False))
                    continue
                payload = bytes(payload)
                if len(payload) < 12:
                    rows.append((media_id, None, None, False))
                    continue
                if payload[:4] != b"RIFF":
                    raise NotImplementedError(
                        "only RIFF/WAVE PCM fingerprints offline; "
                        "compressed audio needs an audio library "
                        "(DEVIATIONS.md)"
                    )
                dec = _wav_decode(payload)
                if dec is None:
                    rows.append((media_id, None, None, False))
                    continue
                info, samples = dec
                s = samples.astype("int64")
                mono = s if s.ndim == 1 else s.sum(axis=1)
                L = mono.size
                if L == 0:
                    rows.append((media_id, "0" * n_windows, 0, True))
                    continue
                idx = (np.arange(L) * n_windows) // L
                # EXACT int64 accumulation: bincount's float64 weights
                # lose integer exactness past 2^53 total energy (~8M
                # mono 16-bit samples; less multi-channel). idx is
                # monotone, so window sums are int64 prefix-sum
                # differences — exact while total energy < 2^63
                # (~2^33 mono samples, hours of audio) (r8 advice).
                sq = mono * mono  # int64; < 2^36 per sample (8ch 16-bit)
                cs = np.concatenate(
                    ([0], np.cumsum(sq, dtype="int64"))
                )
                w_ix = np.arange(n_windows)
                e = (
                    cs[np.searchsorted(idx, w_ix, side="right")]
                    - cs[np.searchsorted(idx, w_ix, side="left")]
                )
                total = int(e.sum())
                bits = "".join(
                    "1" if int(ew) * n_windows > total else "0"
                    for ew in e
                )
                rows.append((media_id, bits, L, True))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.select("media_id", "payload").mapInPandas(run, out_schema)

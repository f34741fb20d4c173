"""Multimodal column plumbing (SURVEY.md §7 M4).

Images/audio/video ride as opaque ``binary`` columns with typed
metadata alongside. The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` transforms, partition sizing — is real and tested;
the actual codec step is STUBBED (this container has no image/audio
libraries): ``decode_fn`` defaults to a deterministic fake, and
:func:`decode_with_real_codec` raises ``NotImplementedError`` with
the integration contract documented.

Scale notes: binary payloads dominate partition size, so the batch
iterator shape (many small Arrow batches per partition) matters more
than row count; ``media_stats`` keeps metadata extraction JVM-side so
a metadata-only query never deserializes payload bytes into Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fixture adapter: treats the documents table's text as an opaque
    payload so the binary plumbing is exercised on real data."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.lit("documents"),
        ).alias("meta"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """JVM-side metadata extraction — payload never crosses to Python:
    byte length + sha256 content address."""
    return df.select(
        "media_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: 4 summary floats of the
    byte stream. Replace with a real decoder via ``decode_fn``."""
    if payload is None:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    return [
        float(n),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
        float(sum(payload[:64]) % 997),
    ]


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes], list[float]] = fake_decode,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` receives an iterator of pandas batches per
    partition — the decode loop stays per-batch vectorizable and
    memory is bounded by batch size, not partition size.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "n_bytes": batch["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": batch["payload"].map(decode_fn),
                }
            )

    from mydatasyncer_spark.operators.partitioning import ensure_min_parallelism

    # widen a narrow source so the Python decode pool sees every core;
    # no-op when the input already has cluster-width splits
    return ensure_min_parallelism(df.select("media_id", "payload")).mapInPandas(
        process, FEATURE_SCHEMA
    )


def extract_features_jvm(df: DataFrame) -> DataFrame:
    """JVM-expression twin of ``extract_features(decode_fn=fake_decode)``.

    The fake codec's four summary floats — byte count, first byte,
    last byte, sum of the first 64 bytes mod 997 — are pure byte
    arithmetic, so they compile to whole-stage-codegen expressions
    (hex → per-pair ``conv`` fold) with no Arrow transfer at all.
    This is the path contract queries use; ``extract_features`` stays
    as the Arrow-batched route a *real* codec (pillow/librosa/pyav)
    must take, since actual decoding cannot be a SQL expression.
    Byte-accurate: operates on the binary payload, not codepoints.
    """
    nb = F.coalesce(F.octet_length("payload"), F.lit(0))
    # hex of the first 64 bytes: ≤128 chars, one pair per byte
    hx = F.hex(F.expr("substring(payload, 1, 64)"))
    first = F.coalesce(
        F.conv(F.substring(hx, 1, 2), 16, 10).cast("double"), F.lit(0.0)
    )
    last = F.coalesce(
        F.conv(F.hex(F.expr("substring(payload, -1, 1)")), 16, 10).cast(
            "double"
        ),
        F.lit(0.0),
    )
    byte_sum = F.aggregate(
        F.regexp_extract_all(hx, F.lit("(..)"), 1),
        F.lit(0).cast("long"),
        lambda acc, pair: acc + F.conv(pair, 16, 10).cast("long"),
    )
    f3 = F.coalesce((byte_sum % 997).cast("double"), F.lit(0.0))
    return df.select(
        "media_id",
        nb.cast("long").alias("n_bytes"),
        F.array(nb.cast("double"), first, last, f3).alias("feature"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: truncates/pads the
    byte stream to width*height bytes (a real impl decodes, resamples
    to the canonical resolution, re-encodes)."""
    if payload is None:
        return b""
    target = width * height
    if len(payload) >= target:
        return bytes(payload[:target])
    return bytes(payload) + b"\x00" * (target - len(payload))


def resize_media(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    resize_fn: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Arrow-batched resize over the payload column — binary in,
    binary out, constant metadata columns attached."""
    from mydatasyncer_spark.operators.partitioning import ensure_min_parallelism

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "payload": batch["payload"].map(
                        lambda p: resize_fn(p, width, height)
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return ensure_min_parallelism(df.select("media_id", "payload")).mapInPandas(
        process, RESIZED_SCHEMA
    )


def fake_frame_sample(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: n_frames even
    byte slices (a real impl seeks keyframes at a fixed stride)."""
    if not payload:
        return []
    step = max(len(payload) // n_frames, 1)
    return [bytes(payload[i * step : (i + 1) * step]) for i in range(n_frames)]


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    sample_fn: Callable[[bytes, int], list[bytes]] = fake_frame_sample,
) -> DataFrame:
    """One output row per sampled frame (media_id, frame_idx, frame).

    Emitting exploded rows rather than an array column keeps a frame,
    not a whole video, as the unit of downstream parallelism."""
    from mydatasyncer_spark.operators.partitioning import ensure_min_parallelism

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                for i, fr in enumerate(sample_fn(payload, n_frames)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return ensure_min_parallelism(df.select("media_id", "payload")).mapInPandas(
        process, FRAME_SCHEMA
    )


def sample_frames_jvm(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """JVM-expression twin of ``sample_frames(fake_frame_sample)``.

    The fake sampler is pure byte slicing (step = max(len/n, 1), frame
    i = payload[i*step:(i+1)*step]) so it compiles to binary
    ``substring`` + ``posexplode`` — no Arrow transfer. Byte-identical
    to the Python path (pinned by test_m4_operators); a real video
    decoder must still take the ``sample_frames`` mapInPandas route.
    Same row-per-frame output contract: a frame, not a whole video, is
    the unit of downstream parallelism.
    """
    nb = F.octet_length("payload")
    step = F.greatest(F.floor(nb / F.lit(n_frames)).cast("int"), F.lit(1))
    frames = F.array(
        *[
            F.expr(
                f"substring(payload, _step * {i} + 1, _step)"
            )
            for i in range(n_frames)
        ]
    )
    return (
        df.select("media_id", "payload")
        .filter(nb > 0)  # fake_frame_sample: empty/NULL payload -> no rows
        .withColumn("_step", step)
        .select(
            "media_id",
            F.posexplode(frames).alias("frame_idx", "frame"),
        )
    )


def decode_bmp_features(payload: bytes) -> list[float]:
    """Real image decode with zero external deps: uncompressed 24-bit
    BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB) parsed with
    ``struct``. Returns ``[width, height, mean_r, mean_g, mean_b]``.

    This is the proof that the Arrow ``mapInPandas`` route in
    :func:`extract_features` carries REAL decoded bytes end-to-end —
    the same wiring a pillow/pyav decoder would use. Raises on
    malformed/unsupported payloads (FAILFAST; filter or wrap for
    permissive pipelines).
    """
    import struct

    if payload is None or len(payload) < 54 or bytes(payload[:2]) != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    h = abs(height)  # height < 0 = top-down; channel means don't care
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    sums = [0, 0, 0]  # pixel order in BMP rows is B, G, R
    for r in range(h):
        off = data_offset + r * row_stride
        row = payload[off : off + width * 3]
        if len(row) < width * 3:
            raise ValueError("truncated BMP pixel data")
        sums[0] += sum(row[0::3])
        sums[1] += sum(row[1::3])
        sums[2] += sum(row[2::3])
    npx = max(width * h, 1)
    return [
        float(width),
        float(h),
        sums[2] / npx,
        sums[1] / npx,
        sums[0] / npx,
    ]


def decode_wav_features(payload: bytes) -> list[float]:
    """Real audio decode with zero external deps: RIFF/WAV 16-bit PCM
    via the stdlib ``wave`` module. Returns
    ``[n_channels, framerate, n_frames, mean_abs, peak]`` with
    amplitudes normalized to [0, 1]."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        nch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV is supported")
        fr = w.getframerate()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    samples = memoryview(raw).cast("h")  # WAV PCM is little-endian
    n = len(samples)
    if n == 0:
        return [float(nch), float(fr), 0.0, 0.0, 0.0]
    mean_abs = sum(abs(s) for s in samples) / n / 32768.0
    peak = max(abs(s) for s in samples) / 32768.0
    return [float(nch), float(fr), float(nframes), mean_abs, peak]


#: media types decodable with the Python stdlib alone
_STDLIB_CODECS: dict[str, Callable[[bytes], list[float]]] = {
    "image/bmp": decode_bmp_features,
    "audio/wav": decode_wav_features,
    "audio/x-wav": decode_wav_features,
}


def decode_with_real_codec(media_type: str) -> Callable[[bytes], list[float]]:
    """Real-codec dispatch for ``extract_features(df, decode_fn=...)``.

    Formats a bare Python stdlib can decode — uncompressed 24-bit BMP
    and 16-bit PCM WAV — return a working decoder; everything else
    (PNG/JPEG/MP3/MP4...) needs external libraries this container
    doesn't have. An external implementation must return a
    fixed-length feature vector per payload; image decoders should
    resize to a canonical resolution before feature extraction, audio
    decoders should resample, video decoders should frame-sample.
    """
    codec = _STDLIB_CODECS.get(media_type.lower())
    if codec is not None:
        return codec
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; "
        "install pillow/librosa/pyav and pass a decode_fn"
    )

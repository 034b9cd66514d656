"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video columns are ``binary`` with a metadata struct; decode /
feature-extraction runs in ``mapInPandas`` (Arrow batch iterator — the
shape real decoders need: per-batch amortized model/codec setup, bounded
batch memory). The actual codecs are NOT in this container, so the decoder
is stubbed: ``use_real_decoder=True`` raises ``NotImplementedError`` at the
call site, while the default deterministic fake produces byte-statistics
features so the Spark-side plumbing (schema, partitioning, UDF signature,
batch shape) is fully real and testable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

#: audio decoders emit waveform-derived rows (see media_codec.wav_decoder)
AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossing_rate", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_media_columns(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload + metadata struct from text
    (stand-in for a real image/audio column; deterministic)."""
    payload = F.encode(F.col(text_col), "utf-8").cast("binary")
    meta = F.struct(
        F.lit("image/fake").alias("media_type"),
        (F.length(text_col) % 640).cast("int").alias("width"),
        (F.length(text_col) % 480).cast("int").alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    return df.select(F.col(id_col), payload.alias("media"), meta.alias("media_meta"))


def attach_png_media_columns(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Like attach_media_columns, but the payload is a VALID PNG — pixels
    derived deterministically from the text bytes — so the real
    ``png_decoder`` (functions/media_codec.py) exercises the decode slot
    with honest, spec-compliant media bytes (r3 VERDICT Next #7). Arrow
    pandas UDF, amortized per batch like a real encoder would be."""
    import pandas as pd  # noqa: F811 (UDF-local, pickled to workers)

    from logminer_kafka_connect_spark.functions.media_codec import encode_png

    @F.pandas_udf(T.BinaryType())
    def to_png(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            b = (t or "").encode("utf-8") or b"\x00"
            arr = np.frombuffer(b, dtype=np.uint8)
            w = max(4, min(64, int(len(arr) ** 0.5)))
            h = max(1, -(-len(arr) // w))
            px = np.zeros(w * h, dtype=np.uint8)
            px[: len(arr)] = arr
            px = px.reshape(h, w)
            # deterministic color-type mix (by content, not position):
            # grayscale / truecolor RGB / 16-entry palette, so every PNG
            # color path of the codec sees real traffic through the slot
            kind = int(arr.sum()) % 3
            if kind == 0:
                out.append(encode_png(px))
            elif kind == 1:
                rgb = np.stack([px, np.roll(px, 1, axis=1), 255 - px], axis=2)
                out.append(encode_png(rgb))
            else:
                pal = np.stack(
                    [np.arange(16) * 17, np.arange(16)[::-1] * 17, np.full(16, 128)],
                    axis=1,
                ).astype(np.uint8)
                out.append(encode_png((px % 16).astype(np.uint8), palette=pal))
        return pd.Series(out)

    payload = to_png(F.col(text_col))
    df = df.select(F.col(id_col), payload.alias("media"))
    meta = F.struct(
        F.lit("image/png").alias("media_type"),
        F.lit(None).cast("int").alias("width"),  # real dims live in the PNG
        F.lit(None).cast("int").alias("height"),
        F.length("media").cast("long").alias("n_bytes"),
    )
    return df.select(id_col, "media", meta.alias("media_meta"))


def attach_jpeg_media_columns(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Like attach_png_media_columns, but the payload is a VALID baseline
    JPEG (pure-python DCT + huffman encoder, functions/media_codec.py) —
    the entropy-coded rung of the real-codec story: the decode slot runs
    huffman + dequant + IDCT on honest bytes, and the features are only
    quantization-close to the source pixels (lossy), unlike PNG's exact
    round-trip."""
    import pandas as pd  # noqa: F811 (UDF-local, pickled to workers)

    from logminer_kafka_connect_spark.functions.media_codec import encode_jpeg_baseline

    @F.pandas_udf(T.BinaryType())
    def to_jpeg(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            b = (t or "").encode("utf-8") or b"\x00"
            arr = np.frombuffer(b, dtype=np.uint8)
            w = max(8, min(64, int(len(arr) ** 0.5)))
            h = max(8, -(-len(arr) // w))
            px = np.zeros(w * h, dtype=np.uint8)
            px[: len(arr)] = arr
            out.append(encode_jpeg_baseline(px.reshape(h, w), quality=85))
        return pd.Series(out)

    payload = to_jpeg(F.col(text_col))
    df = df.select(F.col(id_col), payload.alias("media"))
    meta = F.struct(
        F.lit("image/jpeg").alias("media_type"),
        F.lit(None).cast("int").alias("width"),  # real dims live in the SOF0
        F.lit(None).cast("int").alias("height"),
        F.length("media").cast("long").alias("n_bytes"),
    )
    return df.select(id_col, "media", meta.alias("media_meta"))


def _fake_decode(payload: bytes) -> dict:
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    p = hist / hist.sum()
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    feat = hist[:16] / max(len(arr), 1)
    return {
        "n_bytes": int(len(arr)),
        "byte_mean": float(arr.mean()),
        "byte_entropy": round(entropy, 6),
        "feature": [float(x) for x in feat],
    }


def extract_media_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    use_real_decoder: bool = False,
    decoder=None,
    feature_schema: T.StructType | None = None,
) -> DataFrame:
    """Decode/feature-extract over Arrow batches (``mapInPandas``).

    ``decoder`` is the pluggable decode slot: any ``bytes -> dict`` with
    keys ``n_bytes, byte_mean, byte_entropy, feature`` (e.g. a PIL/ffmpeg
    wrapper on a cluster with codecs; the callable is pickled to executors,
    so per-batch amortized model/codec setup belongs inside it). Real
    codecs are unavailable in this image — ``use_real_decoder=True``
    without a decoder raises per the build contract; the deterministic
    fake exercises the identical distributed plumbing (schema,
    partitioning, UDF signature, batch shape).
    """
    if use_real_decoder and decoder is None:
        raise NotImplementedError(
            "real media decoding requires image/audio codecs not present in "
            "this environment; pass decoder=<bytes -> feature dict>"
        )
    decode = decoder or _fake_decode
    schema = feature_schema or FEATURE_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(b) for b in pdf[media_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(run, schema)


def attach_wav_media_columns(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", rate: int = 8000
) -> DataFrame:
    """Audio twin of attach_png_media_columns: the payload is a VALID
    RIFF/WAVE PCM file whose waveform is a deterministic tone mixture
    derived from the text bytes, so the real ``wav_decoder``
    (functions/media_codec.py) exercises the decode slot with honest,
    sample-accurate audio. Arrow pandas UDF, per-batch amortized."""
    import pandas as pd  # noqa: F811 (UDF-local, pickled to workers)

    from logminer_kafka_connect_spark.functions.media_codec import encode_wav

    @F.pandas_udf(T.BinaryType())
    def to_wav(text: pd.Series) -> pd.Series:
        out = []
        for txt in text:
            b = (txt or "").encode("utf-8") or b"\x00"
            arr = np.frombuffer(b, dtype=np.uint8)
            n = min(4000, max(400, len(arr) * 8))  # 50-500 ms at 8 kHz
            t_ax = np.arange(n) / rate
            # three tones whose frequencies are text-determined
            freqs = [110.0 + float(arr[i % len(arr)]) * 7.0 for i in range(3)]
            wave = sum(np.sin(2 * np.pi * f * t_ax) for f in freqs) / 3.0
            out.append(encode_wav((wave * 20000).astype(np.int16), rate))
        return pd.Series(out)

    payload = to_wav(F.col(text_col))
    df = df.select(F.col(id_col), payload.alias("media"))
    meta = F.struct(
        F.lit("audio/wav").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length("media").cast("long").alias("n_bytes"),
    )
    return df.select(id_col, "media", meta.alias("media_meta"))

"""Multimodal column support: opaque binary payloads + typed metadata.

Design (SURVEY §2.9): media travels as a ``binary`` column with a metadata
struct (mime, width/height, duration, …). Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages — per-batch Python,
never per-row — and are the ONLY sanctioned Python hot path in the engine.

The image/audio codec LIBRARIES are not in this container; general decode
is stubbed: ``decode_image``/``decode_audio`` raise ``NotImplementedError``
unless the deterministic fake decoder is selected. Two formats ARE real:
8-bit grayscale PNG encodes/decodes through the pure-stdlib codec in
``functions.png`` (``encode_png_images``/``decode_png_stats`` below —
signature, CRC-checked chunks, zlib scanlines, all five filter types),
oracle-checked end to end by ``registry.x_png_decode``; and RIFF/WAVE
s16 PCM through ``functions.wav`` (``encode_wav_audio``/
``decode_wav_stats`` below, plus ``audio_energy(codec="wav")``),
oracle-checked by ``registry.x_wav_decode``/``x_wav_energy``. Everything
around the remaining stubs — schema, batch iteration, partition sizing,
output contract — is real and tested; swapping in PIL/librosa later
touches only ``_decode_payload``.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# The mapInPandas closures below reference module-level helpers
# (``_decode_payload``). cloudpickle serializes module functions BY
# REFERENCE, so a Python worker whose sys.path lacks this package (the
# driver's cwd is not the repo root) would die with ModuleNotFoundError.
# Registering the module for by-VALUE pickling ships the helper code
# inside each task closure instead — the standard cloudpickle remedy for
# "module not importable on executors".
try:
    from pyspark import cloudpickle as _cp
    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - vendored API moved; fall back
    pass

# Output contract of the feature extractor stage.
FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

N_FEATURES = 8


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Test-fixture adapter: synthesize a binary media column from a string
    column (UTF-8 bytes) + a metadata struct, so the multimodal plumbing can
    be exercised without real media files."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes, mime: str, fake: bool) -> list[float]:
    """Decode one payload into a fixed-length feature vector.

    Real codecs are not available in this container; the deterministic fake
    derives features from byte statistics so tests have stable assertions.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libs (PIL/librosa) not present in "
            "this environment; pass fake=True for the deterministic stub")
    if payload is None or len(payload) == 0:
        return [0.0] * N_FEATURES
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:64]) % 997),
        float(min(payload)),
        float(max(payload)),
        float(sum(payload) % 10007),
        float(n % 251),
    ]


def extract_features(media: DataFrame, fake: bool = True,
                     batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over (media_id, payload, meta).

    Arrow delivers columnar batches; we iterate batches (never rows at the
    DataFrame level) and emit the FEATURE_SCHEMA contract. At scale, size
    input partitions so payload batches fit executor memory
    (``spark.sql.files.maxPartitionBytes`` + ``maxRecordsPerBatch``).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(p, m, fake)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "checksum": [int(sum(p) % 100003) if p is not None else 0
                             for p in pdf["payload"]],
                "features": feats,
            })

    flat = media.select("media_id", "payload", F.col("meta.mime").alias("mime"))
    return flat.mapInPandas(run, FEATURE_SCHEMA)


def resize(media: DataFrame, width: int = 16, height: int = 16,
           fake: bool = True) -> DataFrame:
    """Image resize stage: payload → fixed ``width × height`` byte buffer
    (media_id, width, height, payload BINARY).

    Real resize needs an image codec (PIL); the deterministic fake
    stride-samples the input bytes to exactly ``width*height`` (padding with
    zeros when shorter) — the Spark plumbing (Arrow binary in/out, stable
    output size for downstream fixed-shape consumers) is the real contract;
    swapping in PIL touches only the sampler below.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires codec libs (PIL) not present in this "
            "environment; pass fake=True for the deterministic stride sampler")
    if width < 1 or height < 1:
        raise ValueError(f"width/height must be >= 1, got {width}x{height}")
    out_len = width * height
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bufs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    payload = b""
                n = len(payload)
                if n >= out_len:
                    step = n / out_len
                    buf = bytes(payload[int(i * step)] for i in range(out_len))
                else:
                    buf = bytes(payload) + b"\x00" * (out_len - n)
                ids.append(mid)
                bufs.append(buf)
            yield pd.DataFrame({"media_id": ids,
                                "width": [width] * len(ids),
                                "height": [height] * len(ids),
                                "payload": bufs})

    return media.select("media_id", "payload").mapInPandas(run, schema)


def frame_sample(media: DataFrame, every_n: int = 10, frame_bytes: int = 16,
                 fake: bool = True) -> DataFrame:
    """Video frame sampling: every ``every_n``-th frame of each payload as its
    own row (media_id, frame_no, frame BINARY).

    Real video decode needs codec libs absent from this container; the
    deterministic fake treats the payload as a sequence of fixed-size
    ``frame_bytes`` chunks ("frames") and emits every n-th chunk — the Spark
    plumbing (mapInPandas fan-out rows-per-input-row, Arrow binary columns,
    schema contract) is identical to what a real decoder needs; swapping in
    a codec touches only the chunker below.
    """
    if not fake:
        raise NotImplementedError(
            "video decode requires codec libs not present in this environment; "
            "pass fake=True for the deterministic chunk sampler")
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_bytes
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    nos.append(fno)
                    frames.append(bytes(payload[fno * frame_bytes:(fno + 1) * frame_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.select("media_id", "payload").mapInPandas(run, schema)


def audio_energy(media: DataFrame, frame_samples: int = 32,
                 fake: bool = True, codec: str = "bytes") -> DataFrame:
    """Audio frame-energy extraction: each payload is windowed into frames
    of ``frame_samples`` samples; each full frame emits its energy (sum of
    squared sample values, exact BIGINT).

    ``codec="wav"`` is the REAL path: payloads are genuine RIFF/WAVE s16
    PCM files decoded through the pure-stdlib :mod:`.wav` codec (chunk
    walk, fmt validation, little-endian sample unpack) — the audio
    analogue of ``decode_png_stats``. ``codec="bytes"`` keeps the
    deterministic fake (payload bytes as unsigned 8-bit samples) for
    formats whose decoders are absent from this container (mp3/ogg —
    ``fake=False`` there still raises). Per-frame energies are the front
    half of audio dedup / silence trimming / VAD-style segmentation in a
    media pipeline.
    """
    if codec not in ("bytes", "wav"):
        raise ValueError(f"unknown codec {codec!r}")
    if codec == "bytes" and not fake:
        raise NotImplementedError(
            "audio decode requires codec libs not present in this "
            "environment; pass fake=True for the byte-sample stub or "
            "codec='wav' for the real RIFF/PCM16 path")
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import wav as _wav
        for pdf in batches:
            ids, nos, es = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                if codec == "wav":
                    _, _, samples = _wav.decode_pcm16(bytes(payload))
                else:
                    samples = list(payload)
                n_frames = len(samples) // frame_samples
                for fno in range(n_frames):
                    chunk = samples[fno * frame_samples:
                                    (fno + 1) * frame_samples]
                    ids.append(mid)
                    nos.append(fno)
                    es.append(sum(s * s for s in chunk))
            yield pd.DataFrame({"media_id": ids, "frame_no": nos,
                                "energy": pd.Series(es, dtype="int64")})

    return media.select("media_id", "payload").mapInPandas(run, schema)


WAV_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("n_channels", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("smp_min", T.LongType()),
    T.StructField("smp_max", T.LongType()),
    T.StructField("smp_sum", T.LongType()),
])


def encode_wav_audio(samples_df: DataFrame, id_col: str = "media_id",
                     smp_col: str = "samples",
                     sample_rate: int = 8000) -> DataFrame:
    """REAL audio encode stage: turn per-row signed-16-bit sample arrays
    into genuine RIFF/WAVE binary payloads via the pure-stdlib codec
    (``functions.wav``) — Arrow-batched mapInPandas, the same plumbing
    contract as ``encode_png_images``. Output: (id, payload binary,
    mime). The bytes on the wire are a real file format."""
    from . import wav as _wav
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_wav.encode_pcm16([int(s) for s in smps],
                                          sample_rate=sample_rate)
                        for smps in pdf[smp_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "payload": payloads,
                "mime": ["audio/wav"] * len(pdf),
            })

    return samples_df.mapInPandas(encode, out_schema)


def decode_wav_stats(media: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """REAL audio decode stage: parse each RIFF/WAVE payload (chunk walk,
    fmt validation, s16 sample unpack) and emit exact sample statistics —
    the audio decode slot holding an actual decoder instead of the
    byte-sample fake. Unsupported profiles raise; they do not silently
    produce wrong samples."""
    from . import wav as _wav

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "sample_rate", "n_channels",
                                   "n_samples", "smp_min", "smp_max",
                                   "smp_sum")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, chans, samples = _wav.decode_pcm16(bytes(payload))
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["n_channels"].append(chans)
                out["n_samples"].append(len(samples))
                out["smp_min"].append(min(samples))
                out["smp_max"].append(max(samples))
                out["smp_sum"].append(sum(samples))
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, WAV_STATS_SCHEMA)


PNG_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("px_min", T.LongType()),
    T.StructField("px_max", T.LongType()),
    T.StructField("px_sum", T.LongType()),
])


def encode_png_images(pixels_df: DataFrame, id_col: str = "media_id",
                      px_col: str = "pixels", width: int = 8,
                      batch_hint: int = 1024) -> DataFrame:
    """REAL image encode stage: turn per-row pixel arrays (row-major 8-bit
    grayscale) into genuine PNG binary payloads via the pure-stdlib codec
    (``functions.png``) — Arrow-batched mapInPandas, the same plumbing
    contract as the feature extractor. Output: (id, payload binary,
    mime). This removes the 'decode is only a stub' caveat for PNG: the
    bytes on the wire are a real file format."""
    from . import png as _png
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for px in pdf[px_col]:
                vals = [int(v) & 0xFF for v in px]
                rows = [bytes(vals[r * width:(r + 1) * width])
                        for r in range(len(vals) // width)]
                payloads.append(_png.encode_gray(rows))
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "payload": payloads,
                "mime": ["image/png"] * len(pdf),
            })

    return pixels_df.mapInPandas(encode, out_schema)


def decode_png_stats(media: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """REAL image decode stage: parse each PNG payload (chunk walk, CRC
    check, inflate, un-filter) and emit exact pixel statistics — the
    decode slot of the multimodal pipeline holding an actual decoder
    instead of the deterministic fake. Unsupported profiles raise; they
    do not silently produce wrong pixels."""
    from . import png as _png

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height",
                                   "px_min", "px_max", "px_sum")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rows = _png.decode_gray(bytes(payload))
                flat = b"".join(rows)
                out["media_id"].append(int(mid))
                out["width"].append(len(rows[0]))
                out["height"].append(len(rows))
                out["px_min"].append(min(flat))
                out["px_max"].append(max(flat))
                out["px_sum"].append(sum(flat))
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, PNG_STATS_SCHEMA)


def decode_png_ahash(media: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """REAL-codec perceptual hash: decode each PNG payload and emit the
    n-bit average-hash (aHash, n = pixel count — 64 bits only for the
    8x8 case) — bit *i* set iff ``px_i * n >= sum(px)`` (the integer
    form of "pixel above mean", no division) — as a hex string,
    MSB-first, zero-padded to whole bytes (``2*ceil(n/8)`` hex chars).
    Identical images produce identical hashes through the full
    encode→decode round trip, so grouping on the hash IS image-level
    exact dedup; near-dup variants would group by Hamming bands exactly
    like SimHash. Arrow-batched mapInPandas; the threshold compare and
    bit packing are vectorized numpy (``np.packbits``), not a per-pixel
    Python loop, so real-size images stay one C pass per image."""
    import numpy as np

    from . import png as _png

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash", T.StringType()),
    ])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                flat = np.frombuffer(
                    b"".join(_png.decode_gray(bytes(payload))), dtype=np.uint8)
                n = flat.size
                above = flat.astype(np.int64) * n >= int(flat.sum(dtype=np.int64))
                ids.append(int(mid))
                hashes.append(np.packbits(above).tobytes().hex())
            yield pd.DataFrame({"media_id": ids, "ahash": hashes})

    return media.mapInPandas(decode, schema)

"""Audio column plumbing: real WAV wire format, real spectral features.

The reference's multimodal pipeline handles video frames outside the engine
(prepare_for_clip_webvid.py:50-129); audio is the analogous modality the
engine must plumb at 100 TB: opaque ``binary`` payloads + typed metadata,
decoded and feature-extracted inside Arrow-batched ``mapInPandas`` stages so
nothing ever crosses the driver.

Honesty contract (same as the image path in ``operators/multimodal.py``):
the WAV encoder/parser below handle the REAL RIFF/PCM wire format —
``parse_wav`` walks chunks, validates the fmt block, and decodes int16 LE
frames; only the waveform CONTENT is synthetic (a deterministic integer
formula of ``doc_id``), which is what lets a DuckDB oracle recompute the
time-domain statistics exactly, bit-for-bit, from the same formula.
Compressed codecs (MP3/AAC/Opus) need external libraries absent from this
container; they would slot into ``parse_wav``'s dispatch.

Scale: every stage is an Arrow batch map over the payload column — no
shuffle, no driver collection; partition count carries straight through
from the source scan. FFT cost is O(n log n) per clip and embarrassingly
parallel.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", IntegerType(), False),
    ]
)


def encode_wav(samples, sample_rate: int) -> bytes:
    """int16 mono samples -> canonical 44-byte-header PCM WAV bytes."""
    import numpy as np

    a = np.ascontiguousarray(samples, dtype="<i2")
    body = a.tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    return out


def parse_wav(data: bytes):
    """PCM WAV bytes -> (int16 numpy array, sample_rate).

    A real RIFF chunk walker: tolerates extra chunks (LIST, fact, ...)
    before/after ``data``, validates the fmt block is 16-bit mono PCM.
    """
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        clen = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if pos + 8 + clen > len(data):
            # a declared chunk length past the buffer is a truncated file;
            # silently decoding the partial body would under-count samples
            raise ValueError(f"truncated {cid!r} chunk: {clen} bytes declared, "
                             f"{len(data) - pos - 8} present")
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"truncated fmt chunk: {len(body)} bytes")
            audio_fmt, channels, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only 16-bit mono PCM supported (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
            sample_rate = sr
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return samples, sample_rate


def synth_audio_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-wire audio table: each doc becomes an actual PCM
    WAV payload whose int16 samples follow an exact integer formula of
    (doc_id, n_chars) — sample k = ((k*k*31 + k*17 + doc_id*131 + 7) mod
    2048) - 1024 — so a SQL oracle can recompute time-domain statistics
    bit-for-bit without ever seeing the bytes."""
    import numpy as np

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("media_id", "payload", "sample_rate", "n_samples")}
            for did, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                did, n_chars = int(did), int(n_chars)
                n = 1024 + (n_chars % 7) * 128
                sr = 4000 + (did % 4) * 2000
                k = np.arange(n, dtype=np.int64)
                samples = ((k * k * 31 + k * 17 + did * 131 + 7) % 2048 - 1024).astype(
                    np.int16
                )
                out["media_id"].append(did)
                out["payload"].append(encode_wav(samples, sr))
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars").mapInPandas(_make, AUDIO_SCHEMA)


_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("rms_micro", LongType(), False),
        StructField("mean_abs_micro", LongType(), False),
        StructField("peak", LongType(), False),
        StructField("n_zero_cross", LongType(), False),
    ]
)


def audio_stats(audio: DataFrame) -> DataFrame:
    """Time-domain features from a REAL WAV parse: RMS, mean |x|, peak |x|,
    zero crossings (sign product < 0 between consecutive samples). The
    sample_rate/n_samples columns come from the PARSED header, not the
    metadata columns, so the decode path is what's verified. Integer sums
    stay exact (sum of x^2 over 2k int16 samples < 2^53); rms/mean_abs are
    emitted as floor(x * 1e6) micro-unit BIGINTs — floor of an identical
    IEEE double is tie-free across engines, unlike round(), whose
    half-even (Python) vs half-away (DuckDB) split breaks the value hash
    whenever a statistic lands exactly on a 1e-6 boundary (a sf0.01 doc
    hits rms = 499.4140625)."""
    import numpy as np

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in _STATS_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x16, sr = parse_wav(bytes(payload))
                x = x16.astype(np.int64)
                n = len(x)
                out["media_id"].append(mid)
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
                out["rms_micro"].append(int(np.floor(np.sqrt((x * x).sum() / n) * 1e6)))
                out["mean_abs_micro"].append(int(np.floor(np.abs(x).sum() / n * 1e6)))
                out["peak"].append(int(np.abs(x).max()))
                out["n_zero_cross"].append(int((x[:-1] * x[1:] < 0).sum()))
            yield pd.DataFrame(out)

    return audio.select("media_id", "payload").mapInPandas(_stats, _STATS_SCHEMA)


_SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("dominant_hz", DoubleType(), False),
        StructField("spectral_centroid_hz", DoubleType(), False),
        StructField("rolloff85_hz", DoubleType(), False),
        StructField("band_low", DoubleType(), False),
        StructField("band_mid", DoubleType(), False),
        StructField("band_high", DoubleType(), False),
    ]
)


def audio_spectral(audio: DataFrame) -> DataFrame:
    """Frequency-domain features via a REAL rfft over the parsed samples:
    dominant frequency (argmax magnitude, DC excluded), spectral centroid,
    85% energy rolloff, and 3-band energy fractions (<1/8, 1/8..3/8,
    >3/8 of Nyquist). Not SQL-expressible — registered rows-only; the
    physics (a pure sine's dominant bin lands on its frequency) is gated
    in tests/test_multimodal_audio.py."""
    import numpy as np

    def _spec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in _SPECTRAL_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x16, sr = parse_wav(bytes(payload))
                x = x16.astype(np.float64)
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
                power = mag * mag
                total = power[1:].sum() or 1.0
                dom = 1 + int(np.argmax(mag[1:]))
                centroid = float((freqs[1:] * power[1:]).sum() / total)
                cum = np.cumsum(power[1:])
                roll = 1 + int(np.searchsorted(cum, 0.85 * cum[-1]))
                nyq = sr / 2.0
                lo = power[1:][freqs[1:] < nyq / 8].sum() / total
                hi = power[1:][freqs[1:] >= 3 * nyq / 8].sum() / total
                out["media_id"].append(mid)
                out["dominant_hz"].append(round(float(freqs[dom]), 3))
                out["spectral_centroid_hz"].append(round(centroid, 3))
                out["rolloff85_hz"].append(round(float(freqs[min(roll, len(freqs) - 1)]), 3))
                out["band_low"].append(round(float(lo), 6))
                out["band_mid"].append(round(float(1.0 - lo - hi), 6))
                out["band_high"].append(round(float(hi), 6))
            yield pd.DataFrame(out)

    return audio.select("media_id", "payload").mapInPandas(_spec, _SPECTRAL_SCHEMA)

"""Gates for the round-4 multimodal extensions: real WAV codec, audio
features, bilinear resize, and image feature extraction.

The codec tests are pure-local (no Spark); the Spark-path tests run the
registered entries at sf0.001 and check them against independent numpy
references computed directly from the generative formulas."""

import numpy as np
import pytest

from mysteryann_spark.operators.audio import (
    audio_spectral,
    audio_stats,
    encode_wav,
    parse_wav,
    synth_audio_from_documents,
)
from mysteryann_spark.operators.multimodal import (
    decode_image,
    encode_ppm,
    extract_image_features,
    resize_bilinear,
    resize_images,
    synth_real_media_from_documents,
)

SF_TINY = "/root/testdata/sf0.001"


# --- WAV codec (local) ------------------------------------------------------


def test_wav_exact_roundtrip():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, size=2048, dtype=np.int16)
    data = encode_wav(samples, 16000)
    back, sr = parse_wav(data)
    assert sr == 16000
    np.testing.assert_array_equal(back, samples)


def test_wav_parser_walks_extra_chunks():
    samples = np.arange(-50, 50, dtype=np.int16)
    data = encode_wav(samples, 8000)
    # splice a LIST chunk between fmt and data (odd length -> pad byte)
    fmt_end = data.index(b"data")
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\0"
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    back, sr = parse_wav(spliced)
    assert sr == 8000
    np.testing.assert_array_equal(back, samples)


def test_wav_parser_rejects_non_pcm():
    data = bytearray(encode_wav(np.zeros(4, dtype=np.int16), 8000))
    data[20] = 3  # audio_fmt = IEEE float
    with pytest.raises(ValueError, match="16-bit mono PCM"):
        parse_wav(bytes(data))


# --- spectral physics (local reference, Spark path below) -------------------


def test_sine_dominant_frequency(spark):
    """A pure 440 Hz sine must put its dominant FFT bin at 440 Hz and its
    zero-crossing count at ~2*f*duration — through the FULL Spark path
    (encode to WAV bytes -> parse -> features)."""
    # 441 Hz (not 440): at sr=8000 a 440 Hz sine hits exact-zero samples
    # every 100 steps, each of which suppresses a sign-product crossing.
    sr, f, n = 8000, 441.0, 4000
    t = np.arange(n) / sr
    samples = (10000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
    wav = encode_wav(samples, sr)
    audio = spark.createDataFrame(
        [(1, bytearray(wav), sr, n)],
        "media_id long, payload binary, sample_rate int, n_samples int",
    )
    spec = audio_spectral(audio).collect()[0]
    assert abs(spec["dominant_hz"] - f) <= sr / n + 0.6  # nearest bin + leakage
    assert spec["band_low"] > 0.99  # 441 Hz < 4000/8 = 500 Hz band edge
    stats = audio_stats(audio).collect()[0]
    expected_zc = 2 * f * (n / sr)
    assert abs(stats["n_zero_cross"] - expected_zc) <= 3
    assert abs(stats["rms_micro"] / 1e6 - 10000 / np.sqrt(2)) < 20  # quantized sine


def test_audio_stats_matches_formula(spark):
    """Spark entry output == numpy reference computed straight from the
    waveform formula, for every doc at sf0.001."""
    from mysteryann_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF_TINY)
    meta = {int(r["doc_id"]): int(r["n_chars"]) for r in docs.select("doc_id", "n_chars").collect()}
    got = {
        int(r["media_id"]): r
        for r in audio_stats(synth_audio_from_documents(docs)).collect()
    }
    assert set(got) == set(meta)
    for did in list(meta)[:50]:
        n = 1024 + (meta[did] % 7) * 128
        k = np.arange(n, dtype=np.int64)
        v = (k * k * 31 + k * 17 + did * 131 + 7) % 2048 - 1024
        r = got[did]
        assert r["sample_rate"] == 4000 + (did % 4) * 2000  # from parsed header
        assert r["n_samples"] == n
        assert r["peak"] == int(np.abs(v).max())
        assert r["n_zero_cross"] == int((v[:-1] * v[1:] < 0).sum())
        assert r["rms_micro"] == int(np.floor(np.sqrt((v * v).sum() / n) * 1e6))
        assert r["mean_abs_micro"] == int(np.floor(np.abs(v).sum() / n * 1e6))


# --- resize (local invariants + Spark path) ---------------------------------


def test_resize_constant_image_stays_constant():
    arr = np.full((9, 7, 3), 123, dtype=np.uint8)
    out = resize_bilinear(arr, 12, 12)
    assert out.shape == (12, 12, 3)
    assert (out == 123).all()


def test_resize_identity_is_exact():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    np.testing.assert_array_equal(resize_bilinear(arr, 10, 14), arr)


def test_resize_preserves_mean_approximately():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = resize_bilinear(arr, 8, 8)
    assert abs(float(out.mean()) - float(arr.mean())) < 8.0


def test_resize_axis_independence():
    """A vertical gradient resized horizontally must keep each row constant."""
    col = np.linspace(0, 255, 12).astype(np.uint8)
    arr = np.repeat(col[:, None], 8, axis=1)[:, :, None].repeat(3, axis=2)
    out = resize_bilinear(arr, 12, 16)
    assert (out == out[:, :1, :]).all()


def test_resize_spark_path(spark):
    from mysteryann_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF_TINY).limit(20)
    media = synth_real_media_from_documents(docs)
    rows = resize_images(media, out_h=12, out_w=12).collect()
    assert len(rows) == 20
    payloads = {int(r["media_id"]): bytes(r["payload"]) for r in media.collect()}
    for r in rows[:5]:
        ref = resize_bilinear(decode_image(payloads[int(r["media_id"])]), 12, 12)
        import hashlib

        assert r["resized_md5"] == hashlib.md5(ref.tobytes()).hexdigest()
        assert r["resized_mean"] == round(float(ref.mean()), 6)


# --- image features (Spark path vs formula) ---------------------------------


def test_image_features_match_formula(spark):
    from mysteryann_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF_TINY)
    meta = {int(r["doc_id"]): int(r["n_chars"]) for r in docs.select("doc_id", "n_chars").collect()}
    got = {
        int(r["media_id"]): r
        for r in extract_image_features(synth_real_media_from_documents(docs)).collect()
    }
    assert set(got) == set(meta)
    for did in list(meta)[:50]:
        w, h = 8 + (meta[did] % 17), 8 + (did % 11)
        flat = (np.arange(h * w * 3, dtype=np.int64) * 31 + did * 131 + 7) % 256
        r = got[did]
        assert r["n_pixels"] == w * h
        assert r["mean_r_micro"] == int(np.floor(flat[0::3].mean() * 1e6))
        assert r["mean_g_micro"] == int(np.floor(flat[1::3].mean() * 1e6))
        assert r["mean_b_micro"] == int(np.floor(flat[2::3].mean() * 1e6))
        assert r["grad_energy"] == int(np.abs(flat[3:] - flat[:-3]).sum())


def test_image_features_catch_channel_swap():
    """The feature gate actually discriminates: a BGR-swapped decode of a
    non-symmetric raster must change mean_r (guards the BMP channel-order
    path the oracle verifies)."""
    pix = (np.arange(6 * 5 * 3, dtype=np.int64) * 31 + 7) % 256
    arr = pix.astype(np.uint8).reshape(6, 5, 3)
    swapped = arr[:, :, ::-1]
    assert round(float(arr[:, :, 0].mean()), 6) != round(float(swapped[:, :, 0].mean()), 6)
    ppm = encode_ppm(arr)
    np.testing.assert_array_equal(decode_image(ppm), arr)

"""Real-codec multimodal path: BMP/WAV bytes through the same
mapInPandas kernel the stubbed pipeline uses (VERDICT r3 directive #5).

The codecs are pure Python/NumPy (24-bit uncompressed BMP, PCM16 WAV)
— no media libraries — so the decode seam is real in this sandbox;
PIL/pyav would plug into :func:`decode_media` identically.
"""

from __future__ import annotations

import numpy as np
import pytest

from incubator_hugegraph_computer_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_bmp,
    decode_media,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
)


def _luma(px: np.ndarray) -> np.ndarray:
    rgb = px.astype(np.float32)
    return 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(7)
    # width 5 forces the 4-byte row padding branch (5*3=15 -> stride 16)
    px = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    decoded = decode_bmp(encode_bmp(px))
    np.testing.assert_allclose(decoded, _luma(px).ravel(), rtol=1e-6)


def test_wav_roundtrip_exact():
    samples = np.array([0, 100, -32768, 32767, -1], dtype=np.int16)
    decoded = decode_wav(encode_wav(samples, sample_rate=8000))
    np.testing.assert_allclose(decoded, samples.astype(np.float32) / 32768.0)


def test_decode_media_sniffs_and_falls_back():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_media(encode_bmp(px), "image").shape == (4,)
    assert decode_media(encode_wav(np.arange(8, dtype=np.int16)), "audio").shape == (8,)
    # non-container bytes fall back to the deterministic stub grid
    raw = bytes(range(16))
    np.testing.assert_array_equal(
        decode_media(raw, "image"), np.frombuffer(raw, np.uint8).astype(np.float32)
    )
    with pytest.raises(NotImplementedError):
        decode_media(b"0123456789ab", "text")


def test_extract_features_on_real_bytes(spark):
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    wav = rng.integers(-3000, 3000, 64, dtype=np.int16)
    rows = [
        (1, "image", bytearray(encode_bmp(px)),
         {"width": 6, "height": 8, "sample_rate": None, "n_frames": None}),
        (2, "audio", bytearray(encode_wav(wav)),
         {"width": None, "height": None, "sample_rate": 16000, "n_frames": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in extract_features(media, feature_dim=4, codec="auto").collect()
    }
    img_expect = [
        float(c.mean(dtype=np.float64))
        for c in np.array_split(_luma(px).ravel(), 4)
    ]
    wav_expect = [
        float(c.mean(dtype=np.float64))
        for c in np.array_split(wav.astype(np.float32) / 32768.0, 4)
    ]
    np.testing.assert_allclose(out[1]["feature"], img_expect, rtol=1e-5)
    np.testing.assert_allclose(out[2]["feature"], wav_expect, rtol=1e-5)
    assert out[1]["n_bytes"] == len(encode_bmp(px))


def test_wav_media_from_ids_roundtrip(spark):
    """The driver-checkable codec corpus: every payload is a real RIFF
    container whose decode replays the generator formula exactly."""
    from incubator_hugegraph_computer_spark.functions.multimodal import (
        decode_media,
        wav_media_from_ids,
    )

    ids = spark.createDataFrame([(7,), (12,)], "doc_id long")
    rows = {r["media_id"]: r for r in wav_media_from_ids(ids, n_samples=16).collect()}
    assert set(rows) == {7, 12}
    t = np.arange(16, dtype=np.int64)
    for d, r in rows.items():
        assert r["kind"] == "audio"
        payload = bytes(r["payload"])
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        assert len(payload) == 44 + 32
        expect = (((d * 7919 + t * 104729) % 65536) - 32768) / 32768.0
        np.testing.assert_array_equal(
            decode_media(payload, "audio"), expect.astype(np.float32)
        )

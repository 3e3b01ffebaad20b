"""WAV/PCM codec: roundtrips per bit depth, header probe, audio feature
semantics, and the multimodal wiring."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_obsidian_spark.operators.wavcodec import (
    audio_features,
    decode_wav,
    encode_wav,
    wav_info,
)


def _sine(n=4410, rate=44100, freq=440.0, amp=0.5, ch=1):
    t = np.arange(n) / rate
    x = amp * np.sin(2 * np.pi * freq * t)
    return np.stack([x] * ch, axis=1)


@pytest.mark.parametrize("bits,tol", [(8, 1 / 120), (16, 1 / 3e4), (24, 1 / 7e6), (32, 1e-9)])
def test_pcm_roundtrip_by_depth(bits, tol):
    x = _sine(ch=2)
    out, rate = decode_wav(encode_wav(x, 44100, bits=bits))
    assert rate == 44100 and out.shape == x.shape
    assert float(np.abs(out - x).max()) <= tol


def test_wav_info_header_only():
    x = _sine(n=22050, ch=2)
    b = encode_wav(x, 44100)
    assert wav_info(b) == (500, 44100, 2)
    assert wav_info(b"RIFFxxxxWAVE") is None
    assert wav_info(b"not audio") is None


def test_audio_features_semantics():
    loud = audio_features(encode_wav(_sine(amp=0.9), 44100))
    quiet = audio_features(encode_wav(_sine(amp=0.05), 44100))
    silent = audio_features(encode_wav(np.zeros((1000, 1)), 44100))
    assert all(0.0 <= v <= 1.0 for v in loud)
    assert loud[3] > quiet[3] > silent[3] == 0.0  # rms ordering
    assert loud[4] == pytest.approx(0.9, abs=0.01)  # peak
    assert silent[5] == 0.0  # no zero crossings in silence


def test_decode_errors_and_boundaries():
    with pytest.raises(ValueError):
        decode_wav(b"not audio")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data
    # a non-PCM format tag is the honest compressed-codec boundary
    b = bytearray(encode_wav(_sine(), 44100))
    i = bytes(b).find(b"fmt ")
    b[i + 8] = 85  # format tag 0x55 = MP3
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(b))


def test_media_features_use_real_audio(spark):
    from ocr_obsidian_spark.operators.multimodal import extract_media_features

    good = encode_wav(_sine(amp=0.8), 44100)
    rows = [
        ("a1", bytearray(good), {"media_type": "audio", "mime": "audio/wav",
                                 "width": None, "height": None,
                                 "duration_ms": 100}),
        ("a2", bytearray(good[:16]), {"media_type": "audio", "mime": "audio/wav",
                                      "width": None, "height": None,
                                      "duration_ms": None}),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, payload binary, media_meta struct<media_type:string,"
        "mime:string,width:int,height:int,duration_ms:long>",
    )
    got = {r["url"]: r for r in extract_media_features(df).collect()}
    assert got["a1"]["feature_vec"] == pytest.approx(audio_features(good))
    assert got["a1"]["feature_vec"][4] == pytest.approx(0.8, abs=0.01)
    # truncated payload: fail-soft, stage alive
    assert got["a2"]["feature_vec"] != pytest.approx(audio_features(good))


def test_truncated_data_chunk_is_a_value_error():
    b = encode_wav(_sine(), 44100)
    with pytest.raises(ValueError):
        decode_wav(b[: len(b) // 2])


def test_wav_info_survives_zero_block_align():
    import struct

    b = bytearray(encode_wav(_sine(n=441), 44100))
    i = bytes(b).find(b"fmt ")
    b[i + 20 : i + 22] = struct.pack("<H", 0)  # block align = 0
    assert wav_info(bytes(b)) == (10, 44100, 1)

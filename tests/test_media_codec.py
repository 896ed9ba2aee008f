"""Pure-numpy media codec roundtrips + the closed-form payload spec."""

import numpy as np
import pytest

from myzql_binlog_connector_ray.functions.media_codec import (
    AUDIO_RATE,
    decode_bmp,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_wav,
    encode_y4m,
    frame_sample,
    media_dims,
    media_kind,
    resize_nearest,
    synth_payload,
)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (16, 9), (31, 7)])
def test_bmp_roundtrip_all_padding_cases(w, h):
    # w=1,3,31 exercise non-zero row padding; 2/16 exercise zero padding
    rng = np.random.RandomState(w * 100 + h)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip_and_chunk_walk():
    samples = (np.arange(1000) * 37 % 4096 - 2048).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(out, samples)
    # extra chunk before data must be skipped, odd size word-aligned
    payload = bytearray(encode_wav(samples[:5], 8000))
    data_at = payload.index(b"data")
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    payload[data_at:data_at] = extra
    payload[4:8] = (len(payload) - 8).to_bytes(4, "little")
    out2, _ = decode_wav(bytes(payload))
    assert np.array_equal(out2, samples[:5])


def test_y4m_roundtrip():
    frames = (np.arange(4 * 6 * 5) % 251).astype(np.uint8).reshape(4, 6, 5)
    out, fps = decode_y4m(encode_y4m(frames, fps=25))
    assert fps == 25
    assert np.array_equal(out, frames)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + b"\x00" * 40)
    with pytest.raises(ValueError):
        decode_y4m(b"NOT A HEADER\n")


def test_synth_payload_matches_closed_form():
    """Decoded checksum equals the oracle's closed-form sum."""
    for mid in [0, 1, 2, 3, 7, 100, 101, 102]:
        kind = media_kind(mid)
        payload = synth_payload(mid)
        dims = media_dims(mid)
        if kind == "image":
            img = decode_bmp(payload)
            n = dims["width"] * dims["height"] * 3
            assert img.shape == (dims["height"], dims["width"], 3)
            assert int(img.astype(np.int64).sum()) == int(((np.arange(n) + mid) % 251).sum())
        elif kind == "audio":
            samples, rate = decode_wav(payload)
            assert rate == AUDIO_RATE and len(samples) == dims["n_samples"]
            n = dims["n_samples"]
            assert int(samples.astype(np.int64).sum()) == int(((7 * np.arange(n) + mid) % 4096 - 2048).sum())
        else:
            frames, fps = decode_y4m(payload)
            assert frames.shape == (dims["n_frames"], dims["height"], dims["width"])
            n = frames.size
            assert int(frames.astype(np.int64).sum()) == int(((np.arange(n) + mid) % 251).sum())


def test_resize_and_frame_sample():
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, img[::2, ::2])
    frames = np.arange(6 * 2 * 2, dtype=np.uint8).reshape(6, 2, 2)
    assert np.array_equal(frame_sample(frames, 3), frames[[0, 3]])

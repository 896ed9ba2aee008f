"""Pure-numpy media codecs for the multimodal pipeline.

Real decoders for three simple PUBLIC container formats — no external
media libraries needed, so the decode stage is genuinely exercised (not
a stub): header parsing, row padding, channel order, chunk walking and
frame framing are all real failure modes the tests/oracle catch.

- image: BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit uncompressed,
  bottom-up rows, BGR byte order, rows padded to 4 bytes)
- audio: WAV (RIFF, PCM 16-bit LE mono)
- video: YUV4MPEG2 (y4m) with ``Cmono`` colorspace — text header,
  ``FRAME\\n`` markers, raw luma planes

Fixture payloads are synthesized from a closed-form byte pattern
(value at logical index j is ``(j + media_id) % 251``; audio samples
``((7*j + media_id) % 4096) - 2048``) so the DuckDB oracle can
recompute the decoded checksum without being able to decode the
container itself — any decode bug (padding, endianness, header size,
channel order, frame offset) breaks the checksum equality.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """pixels: (H, W, 3) uint8 in top-down RGB order → 24-bit BMP bytes."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    file_size = 14 + 40 + data_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up rows, BGR channel order
    rows[:, :row_bytes] = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (H, W, 3) uint8 top-down RGB."""
    magic, _file_size, _r1, _r2, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (hdr={hdr_size} bpp={bpp} comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


# ---------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """samples: (N,) int16 mono → RIFF/WAVE PCM bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (samples int16, sample_rate). Walks the
    chunk list (so extra chunks like LIST/fact are tolerated)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    rate, samples = None, None
    while pos + 8 <= end:
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(f"unsupported WAV variant (fmt={audio_fmt} ch={channels} bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


# ---------------------------------------------------------------- Y4M


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """frames: (F, H, W) uint8 luma → YUV4MPEG2 Cmono bytes."""
    f, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()]
    for i in range(f):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 Cmono → ((F, H, W) uint8 luma, fps)."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode()
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a y4m payload")
    w = h = fps = None
    for tok in head.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = int(num) // int(den)
        elif tok[0] == "C" and tok[1:] != "mono":
            raise ValueError(f"unsupported y4m colorspace {tok}")
    if not (w and h and fps):
        raise ValueError("y4m header missing W/H/F")
    frame_bytes = w * h
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("bad y4m frame marker")
        start = fnl + 1
        frames.append(np.frombuffer(payload, dtype=np.uint8, count=frame_bytes, offset=start).reshape(h, w))
        pos = start + frame_bytes
    return np.stack(frames), fps


# ------------------------------------------- closed-form fixture spec
# Shared with the DuckDB oracle (__ray_entry__._media_cte): every field
# below is a pure function of media_id.

MEDIA_MOD = 251
AUDIO_RATE = 8000


def media_kind(media_id: int) -> str:
    return ("image", "audio", "video")[media_id % 3]


def media_dims(media_id: int) -> dict:
    """Deterministic shape parameters per media_id (see oracle CTE)."""
    d = media_id
    kind = media_kind(d)
    if kind == "image":
        return {"kind": kind, "width": 8 + d % 24, "height": 8 + (d // 3) % 24, "n_frames": 1}
    if kind == "audio":
        return {"kind": kind, "n_samples": 800 + d % 800}
    return {"kind": kind, "width": 8 + d % 16, "height": 8 + (d // 2) % 16, "n_frames": 2 + d % 4}


def synth_payload(media_id: int) -> bytes:
    """Closed-form payload: logical byte j carries (j + media_id) % 251
    (audio: sample j carries ((7j + media_id) % 4096) - 2048)."""
    d = media_id
    dims = media_dims(d)
    if dims["kind"] == "image":
        n = dims["width"] * dims["height"] * 3
        vals = ((np.arange(n, dtype=np.int64) + d) % MEDIA_MOD).astype(np.uint8)
        return encode_bmp(vals.reshape(dims["height"], dims["width"], 3))
    if dims["kind"] == "audio":
        n = dims["n_samples"]
        vals = ((7 * np.arange(n, dtype=np.int64) + d) % 4096 - 2048).astype(np.int16)
        return encode_wav(vals, AUDIO_RATE)
    n = dims["n_frames"] * dims["height"] * dims["width"]
    vals = ((np.arange(n, dtype=np.int64) + d) % MEDIA_MOD).astype(np.uint8)
    return encode_y4m(vals.reshape(dims["n_frames"], dims["height"], dims["width"]))


# ---------------------------------------------------- derived kernels


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) — pure index math."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def frame_sample(frames: np.ndarray, every: int) -> np.ndarray:
    """Every k-th frame of (F, H, W[, C])."""
    return frames[::every]

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns alongside. The decode / feature-extract kernels are
STUBBED (no image/audio libraries in this container): ``DecodeStub``
raises ``NotImplementedError`` unless ``fake=True``, in which case it
produces a deterministic fake feature vector — but the Ray-side
plumbing (schema, actor signature, batch sizing, output layout) is real
and tested, so swapping in a real decoder is a one-line change.

Scale notes: binary payloads make rows wide — callers should use small
``batch_size`` (payload_bytes × batch_size × concurrency must fit the
worker heap) and keep stages in ``batch_format="pyarrow"`` (binary
columns round-trip Arrow zero-copy; pandas would objectify them).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def text_to_media_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Fixture adapter: wrap text bytes as opaque payloads with metadata."""
    ids = batch[id_col].to_pylist()
    payloads = [t.encode("utf-8") for t in batch[text_col].to_pylist()]
    kinds = ["image" if i % 3 == 0 else ("audio" if i % 3 == 1 else "video") for i in ids]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([len(p) % 640 for p in payloads], pa.int32()),
            "height": pa.array([len(p) % 480 for p in payloads], pa.int32()),
            "duration_ms": pa.array([len(p) for p in payloads], pa.int32()),
        }
    )


class DecodeStub:
    """Actor-pool stage: payload → fixed-size feature vector.

    Real deployments replace ``_decode`` with e.g. PIL/torchvision or
    torchaudio; model/codec setup belongs in ``__init__`` (once per
    actor). With ``fake=True`` the features are a deterministic
    blake2b-seeded vector so downstream stages are testable.
    """

    def __init__(self, dim: int = 16, fake: bool = False):
        self.dim = dim
        self.fake = fake

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires an image/audio library not present in "
                "this environment; construct DecodeStub(fake=True) for the "
                "deterministic test path"
            )
        seed = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(seed[:4], "little"))
        return rng.standard_normal(self.dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, k)
            for p, k in zip(batch["payload"].to_pylist(), batch["kind"].to_pylist())
        ]
        out = batch.drop_columns(["payload"])  # features replace the heavy payload
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def synth_media_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Fixture adapter: deterministic closed-form media payloads (real
    BMP / WAV / y4m containers — see functions.media_codec) keyed by
    doc_id, so the decode stage can be oracle-checked end to end."""
    from .media_codec import media_kind, synth_payload

    ids = batch[id_col].to_pylist()
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([media_kind(i) for i in ids], pa.string()),
            "payload": pa.array([synth_payload(i) for i in ids], pa.binary()),
        }
    )


class MediaDecoder:
    """Actor-pool stage: REAL container decode (BMP / WAV PCM16 / y4m)
    → structural facts + a checksum over the logical pixel/sample
    array. Pure numpy + struct — no external media libraries — so the
    decode path (header parse, row padding, channel order, chunk walk,
    frame framing) is genuinely exercised, unlike DecodeStub.

    Callers should keep ``batch_size`` small: payload_bytes ×
    batch_size × concurrency must fit the worker heap.
    """

    def __init__(self):
        from . import media_codec

        self.codec = media_codec

    def _decode_one(self, payload: bytes, kind: str) -> tuple[int, int, int, int, int]:
        c = self.codec
        if kind == "image":
            img = c.decode_bmp(payload)
            h, w, _ = img.shape
            return w, h, 1, 0, int(img.astype(np.int64).sum())
        if kind == "audio":
            samples, rate = c.decode_wav(payload)
            n = len(samples)
            return 0, 0, n, n * 1000 // rate, int(samples.astype(np.int64).sum())
        frames, fps = c.decode_y4m(payload)
        f, h, w = frames.shape
        return w, h, f, f * 1000 // fps, int(frames.astype(np.int64).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            self._decode_one(p, k)
            for p, k in zip(batch["payload"].to_pylist(), batch["kind"].to_pylist())
        ]
        w, h, f, dur, chk = zip(*rows) if rows else ((), (), (), (), ())
        out = batch.drop_columns(["payload"])
        return (
            out.append_column("width", pa.array(w, pa.int32()))
            .append_column("height", pa.array(h, pa.int32()))
            .append_column("n_frames", pa.array(f, pa.int32()))
            .append_column("duration_ms", pa.array(dur, pa.int32()))
            .append_column("checksum", pa.array(chk, pa.int64()))
        )


def payload_stats(batch: pa.Table) -> pa.Table:
    """Metadata-only pass: size accounting without touching payload bytes
    beyond the buffer length (zero-copy friendly)."""
    import pyarrow.compute as pc

    sizes = pc.binary_length(batch["payload"])
    return pa.table(
        {
            "kind": batch["kind"],
            "payload_bytes": pa.array(sizes.to_pylist(), pa.int64()),
        }
    )

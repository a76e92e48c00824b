"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode/feature kernels are STUBBED (no image/audio libraries in this
environment — clearly marked below); the Ray-side plumbing — schema,
actor-pool signature, batch sizing, output layout — is real and tested.
A deployment swaps ``_decode_image_stub`` for a PIL/torchvision call in
``ImageFeatures.__init__``-loaded state without touching the pipeline.

Pattern notes for 100 TB media:
- binary payloads are large: keep ``batch_size`` small (32-128) and
  ``batch_format="pyarrow"`` so payloads stay in Arrow buffers
  (zero-copy from the object store), never pandas object columns.
- the stage is an actor pool: model load happens once per actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic fake 8x8 grayscale "image" derived from
    the payload bytes. Replace with a real decoder (PIL.Image.open) in
    production; raises NotImplementedError for empty payloads to mirror
    real decode failures."""
    if not payload:
        raise NotImplementedError("empty payload: real decoder required")
    h = hashlib.blake2b(payload, digest_size=64).digest()
    return np.frombuffer(h, dtype=np.uint8).reshape(8, 8).astype(np.float32)


class ImageFeatures:
    """Actor-pool stage: (id, payload:binary) -> (id, width, height,
    mean_px, feature:list<float>).

    __init__ is where a real model would load (once per actor).
    """

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(batch.column_names[0])
        payloads = batch.column("payload").to_pylist()
        ws, hs, means, feats = [], [], [], []
        for p in payloads:
            try:
                img = _decode_image_stub(p or b"")
            except NotImplementedError:
                img = np.zeros((8, 8), dtype=np.float32)
            ws.append(img.shape[1])
            hs.append(img.shape[0])
            means.append(float(img.mean()))
            f = img.flatten()[: self.feature_dim]
            feats.append((f / 255.0).astype(np.float32).tolist())
        return pa.table(
            {
                batch.column_names[0]: ids,
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "mean_px": pa.array(means, pa.float32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def frame_sample_plan(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling plan for video payloads (the real
    sampler would seek these frame indexes)."""
    return list(range(0, n_frames, max(1, every)))

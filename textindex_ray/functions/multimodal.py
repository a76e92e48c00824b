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
import io

import numpy as np
import pyarrow as pa

# Real decoders are import-guarded: the sandbox has neither PIL nor
# soundfile (verified), so the deterministic stubs run here; a
# deployment image with the libraries flips to real decode with no code
# change. Tests exercise the real branch by monkeypatching these module
# globals with fakes.
try:  # pragma: no cover - absent in this environment
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:
    _PIL_Image = None

try:  # pragma: no cover - absent in this environment
    import soundfile as _soundfile  # type: ignore
except ImportError:
    _soundfile = None


def decode_image(payload: bytes) -> np.ndarray:
    """Grayscale float32 (H, W): PIL decode when available, else the
    deterministic stub. Raises on an undecodable payload (callers map
    failures to a zero image / decode_ok=False — a poisoned payload
    must not kill the stage)."""
    if _PIL_Image is not None:
        with _PIL_Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.float32)
    return _decode_image_stub(payload)


def decode_audio(payload: bytes, sample_rate: int) -> np.ndarray:
    """Mono float32 PCM: soundfile decode when available (channel-mean
    downmix, native rate), else the deterministic 1-second stub."""
    if _soundfile is not None:
        data, _sr = _soundfile.read(io.BytesIO(payload), dtype="float32")
        data = np.asarray(data, dtype=np.float32)
        if data.ndim > 1:
            data = data.mean(axis=1)
        return data
    return _decode_audio_stub(payload, sample_rate)


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
                img = decode_image(p or b"")
            except Exception:
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


def _decode_audio_stub(payload: bytes, sample_rate: int) -> np.ndarray:
    """STUB decode: deterministic fake 1-second mono PCM derived from the
    payload (replace with soundfile/librosa in production)."""
    if not payload:
        raise NotImplementedError("empty payload: real decoder required")
    h = hashlib.blake2b(payload, digest_size=64).digest()
    base = np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 127.5 - 1.0
    reps = (sample_rate + base.size - 1) // base.size
    return np.tile(base, reps)[:sample_rate]


class AudioFeatures:
    """Actor-pool stage: (id, payload:binary) -> (id, n_samples,
    rms_milli:int32, zcr_ppm:int64, feature:list<float>).

    Integer-scaled aggregate features (milli-RMS, zero-crossing-rate ppm)
    keep the output hashable/deterministic; decode failures land in an
    ``decode_ok`` column instead of killing the task — at 10^12 payloads
    some WILL be corrupt, and a poisoned batch must not fail the stage.
    """

    def __init__(self, sample_rate: int = 16_000, feature_dim: int = 16):
        self.sample_rate = sample_rate
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(batch.column_names[0])
        ns, rms, zcr, feats, ok = [], [], [], [], []
        for p in batch.column("payload").to_pylist():
            try:
                pcm = decode_audio(p or b"", self.sample_rate)
                ns.append(pcm.size)
                rms.append(int(np.sqrt(np.mean(pcm**2)) * 1000))
                zcr.append(int((np.diff(np.signbit(pcm)) != 0).mean() * 1_000_000))
                # fixed-bin coarse "spectrum": mean |amplitude| per segment
                segs = np.array_split(np.abs(pcm), self.feature_dim)
                feats.append([float(s.mean()) for s in segs])
                ok.append(True)
            except Exception:
                ns.append(0)
                rms.append(0)
                zcr.append(0)
                feats.append([0.0] * self.feature_dim)
                ok.append(False)
        return pa.table(
            {
                batch.column_names[0]: ids,
                "n_samples": pa.array(ns, pa.int32()),
                "rms_milli": pa.array(rms, pa.int32()),
                "zcr_ppm": pa.array(zcr, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )


class VideoFrameSample:
    """Actor-pool flat-map stage: (id, payload:binary, n_frames:int32) ->
    one row PER SAMPLED FRAME (id, frame_idx, frame:binary).

    The fan-out (rows multiply by ~n_frames/every) is why this stage
    needs a SMALL batch_size upstream and why frame payloads go straight
    back into Arrow binary cells (object-store-spillable) rather than
    Python lists. The stub "frame" is a deterministic slice-hash of the
    payload; a real implementation seeks the planned indexes with
    PyAV/ffmpeg in __init__-held state.
    """

    def __init__(self, every: int = 10):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_frame = [], [], []
        id_col = batch.column_names[0]
        for i, (p, nf) in enumerate(
            zip(batch.column("payload").to_pylist(),
                batch.column("n_frames").to_pylist())
        ):
            rid = batch.column(id_col)[i].as_py()
            for fi in frame_sample_plan(int(nf or 0), self.every):
                out_id.append(rid)
                out_idx.append(fi)
                out_frame.append(
                    hashlib.blake2b((p or b"") + fi.to_bytes(4, "big"),
                                    digest_size=32).digest()
                )
        return pa.table(
            {
                id_col: pa.array(out_id),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame": pa.array(out_frame, pa.binary()),
            }
        )

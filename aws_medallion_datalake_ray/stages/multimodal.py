"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Decode is REAL for:

- raw tensor formats — ``raw-rgb8`` (payload IS the H x W x 3 uint8 pixel
  buffer, zero-copy ``np.frombuffer``) and ``pcm16`` (int16-LE samples) —
  the representations large training pipelines actually store after a
  one-time decode pass;
- genuinely COMPRESSED formats implementable from stdlib — ``png``
  (zlib-DEFLATE, full scanline-filter spec) and ``wav`` (RIFF PCM16) via
  ``functions/codecs.py``.

Only jpeg/mp3/mp4 (``image`` / ``audio`` / ``video`` kinds) remain STUBBED
(DCT/psychoacoustic codecs need PIL/libav, absent in this container —
clearly marked below); a real deployment swaps ``_decode_stub`` for
codec-lib calls in ``__init__`` and nothing else changes: the resize /
frame-sampling / feature plumbing already operates on true array shapes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media rows: raw-rgb8 / pcm16 payloads are REAL decodable
    tensors (pixel buffer / sample buffer); image/audio/video payloads are
    opaque bytes exercising the stubbed compressed path."""
    from aws_medallion_datalake_ray.functions.codecs import encode_png, encode_wav

    rng = np.random.default_rng(seed)
    kind_pool = np.array(
        ["raw-rgb8", "pcm16", "png", "wav", "image", "audio", "video"])
    kinds = kind_pool[rng.integers(0, len(kind_pool), n)]
    widths = rng.integers(8, 64, n).astype(np.int32)
    heights = rng.integers(8, 64, n).astype(np.int32)
    payloads = []
    for i in range(n):
        if kinds[i] == "raw-rgb8":
            payloads.append(
                rng.integers(0, 256, int(heights[i]) * int(widths[i]) * 3,
                             dtype=np.uint8).tobytes())
        elif kinds[i] == "pcm16":
            payloads.append(
                rng.integers(-(2**15), 2**15, 1024, dtype=np.int16).tobytes())
        elif kinds[i] == "png":  # REAL zlib-compressed image payload
            img = rng.integers(0, 256, (int(heights[i]), int(widths[i]), 3),
                               dtype=np.uint8)
            payloads.append(encode_png(img))
        elif kinds[i] == "wav":  # REAL RIFF PCM16 payload
            payloads.append(encode_wav(
                rng.integers(-(2**15), 2**15, 2048, dtype=np.int16)))
        else:
            payloads.append(
                rng.integers(0, 256, int(rng.integers(256, 8192)),
                             dtype=np.uint8).tobytes())
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeaturizer:
    """Actor-pool stage: decode -> (resize | frame-sample) -> feature-extract.

    ``__init__`` is where real codecs/models would load (once per actor).
    ``batch_size`` must stay SMALL (payloads are wide): batch_bytes ~=
    batch_size * median_payload; size so batch x concurrency fits the heap.

    The DECODE is stubbed (deterministic digest-seeded pixels/samples — no
    image/audio libs in this container); the resize / frame-sampling /
    feature plumbing operates on the decoded arrays exactly as a real
    implementation would.
    """

    def __init__(self, target_size: tuple[int, int] = (8, 8), frame_stride: int = 4):
        self.target = target_size
        self.frame_stride = frame_stride  # video: keep every k-th frame
        # codecs bind once per actor (the real-impl slot: PIL/libav go here)
        from aws_medallion_datalake_ray.functions import codecs

        self._decode_png = codecs.decode_png
        self._decode_wav = codecs.decode_wav

    def _decode(self, payload: bytes, kind: str, w: int, h: int) -> np.ndarray:
        """Raw tensors and stdlib-compressed kinds (png/wav) decode for REAL;
        only jpeg/mp3/mp4 hit the stub."""
        if kind == "raw-rgb8":
            # zero-copy view of the pixel buffer -> (h, w, 3) uint8
            px = np.frombuffer(payload, dtype=np.uint8)
            if len(px) != h * w * 3:
                raise ValueError(
                    f"raw-rgb8 payload is {len(px)} B, metadata says {h}x{w}x3")
            return px.reshape(h, w, 3)
        if kind == "pcm16":
            return np.frombuffer(payload, dtype="<i2")  # int16-LE samples
        if kind == "png":  # real zlib/DEFLATE decode (functions/codecs.py)
            img = self._decode_png(payload)
            if img.shape[:2] != (h, w):
                raise ValueError(
                    f"png is {img.shape[1]}x{img.shape[0]}, metadata says {w}x{h}")
            return img
        if kind == "wav":  # real RIFF PCM16 decode
            samples, _rate = self._decode_wav(payload)
            return samples.reshape(-1)
        return self._decode_stub(payload, kind, w, h)

    def _decode_stub(self, payload: bytes, kind: str, w: int, h: int) -> np.ndarray:
        """Deterministic fake decode for COMPRESSED kinds only.

        image -> (h, w) uint8 "pixels"; audio -> (n,) int16 "samples";
        video -> (frames, h, w) uint8.  A real decoder replaces ONLY this
        method; everything downstream (resize, frame sampling, features)
        already handles the true array shapes via the raw formats above.
        """
        if kind not in ("image", "audio", "video"):
            raise NotImplementedError(f"no decoder for media kind {kind!r}")
        seed = np.frombuffer(hashlib.sha256(payload).digest()[:8], dtype=np.uint64)[0]
        rng = np.random.default_rng(seed)
        w, h = max(4, w % 64), max(4, h % 64)
        if kind == "image":
            return rng.integers(0, 256, (h, w), dtype=np.uint8)
        if kind == "audio":
            return rng.integers(-(2**15), 2**15, max(64, len(payload) // 4),
                                dtype=np.int16)
        return rng.integers(0, 256, (16, h, w), dtype=np.uint8)  # video frames

    def _resize(self, img: np.ndarray) -> np.ndarray:
        """Nearest-neighbor resize to target (numpy indexing; a real impl
        swaps in PIL/cv2 — same in/out contract)."""
        th, tw = self.target
        ys = (np.arange(th) * img.shape[0] // th).clip(0, img.shape[0] - 1)
        xs = (np.arange(tw) * img.shape[1] // tw).clip(0, img.shape[1] - 1)
        return img[np.ix_(ys, xs)]

    def _features(self, arr: np.ndarray) -> np.ndarray:
        f = arr.astype(np.float32).reshape(-1)
        out = np.empty(32, np.float32)
        chunks = np.array_split(f, 32)
        for i, c in enumerate(chunks):
            out[i] = float(c.mean()) if len(c) else 0.0
        return out / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, sizes, frames = [], [], []
        for payload, kind, w, h in zip(
            batch["payload"].to_pylist(), batch["kind"].to_pylist(),
            batch["width"].to_pylist(), batch["height"].to_pylist(),
        ):
            dec = self._decode(payload, kind, w, h)
            if kind in ("image", "raw-rgb8", "png"):
                dec = self._resize(dec)
                n_frames = 1
            elif kind == "video":
                dec = dec[:: self.frame_stride]  # frame sampling
                n_frames = dec.shape[0]
                dec = np.stack([self._resize(fr) for fr in dec])
            else:  # audio kinds: features over the raw sample stream
                n_frames = 0
            feats.append(self._features(dec))
            sizes.append(len(payload))
            frames.append(n_frames)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": pa.array(sizes, pa.int64()),
                "n_frames": pa.array(frames, pa.int32()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def featurize_media(ds: Dataset, concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    """The multimodal pipeline stage: small batches, actor pool, list<float>
    feature output — the exact shape a real decoder drops into."""
    return ds.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

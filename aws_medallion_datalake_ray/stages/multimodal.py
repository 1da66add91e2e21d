"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The decode step is STUBBED (no image/audio libs in this container — clearly
marked below); the Ray-side plumbing is real: schema, actor-pool signature,
small-batch sizing for wide binary rows, and output layout are what matter at
100 TB.  A real deployment swaps ``_decode_stub`` for PIL/libav decoding in
``__init__``-loaded codecs; nothing else changes.
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
    """Deterministic fake media rows (binary payloads of varying size)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    sizes = rng.integers(256, 8192, n)
    payloads = [rng.integers(0, 256, s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(32, 1024, n), pa.int32()),
            "height": pa.array(rng.integers(32, 1024, n), pa.int32()),
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
        # STUB: real impl -> ``self.codec = PIL.Image`` / torchaudio / libav

    def _decode_stub(self, payload: bytes, kind: str, w: int, h: int) -> np.ndarray:
        """Deterministic fake decode.

        image -> (h, w) uint8 "pixels"; audio -> (n,) int16 "samples";
        video -> (frames, h, w) uint8.  A real decoder replaces ONLY this
        method; everything downstream (resize, frame sampling, features)
        already handles the true array shapes.
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
            dec = self._decode_stub(payload, kind, w, h)
            if kind == "image":
                dec = self._resize(dec)
                n_frames = 1
            elif kind == "video":
                dec = dec[:: self.frame_stride]  # frame sampling
                n_frames = dec.shape[0]
                dec = np.stack([self._resize(fr) for fr in dec])
            else:
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

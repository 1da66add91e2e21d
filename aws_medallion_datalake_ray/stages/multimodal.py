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
    """Actor-pool stage: decode + feature-extract binary media.

    ``__init__`` is where real codecs/models would load (once per actor).
    ``batch_size`` must stay SMALL (payloads are wide): batch_bytes ~=
    batch_size * median_payload; size so batch x concurrency fits the heap.
    """

    def __init__(self, target_size: tuple[int, int] = (224, 224)):
        self.target = target_size
        # STUB: real impl -> ``self.codec = PIL.Image`` / torchaudio etc.

    def _decode_stub(self, payload: bytes, kind: str) -> np.ndarray:
        """Deterministic fake decode: digest-seeded feature vector.
        NotImplementedError path documents the real-library contract."""
        if kind not in ("image", "audio", "video"):
            raise NotImplementedError(f"no decoder for media kind {kind!r}")
        d = hashlib.sha256(payload).digest()
        return np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, sizes = [], []
        for payload, kind in zip(
            batch["payload"].to_pylist(), batch["kind"].to_pylist()
        ):
            feats.append(self._decode_stub(payload, kind))
            sizes.append(len(payload))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": pa.array(sizes, pa.int64()),
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

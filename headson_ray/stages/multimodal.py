"""Multimodal column stages: image/audio/video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — clearly marked below); the Ray-side plumbing is real:
actor-pool map_batches stages with small batch sizes for large payloads,
typed output schemas, and deterministic fake features so pipelines are
testable end-to-end.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = pa.struct(
    [
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("format", pa.string()),
    ]
)


def _decode_image_real(data: bytes):  # pragma: no cover
    """Real decode path — requires an image library not in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this environment"
    )


class ImageFeatureExtractor:
    """Actor-pool stage: binary image column -> fixed-size feature vector.

    In production __init__ would load a vision model once per actor; here
    it seeds the deterministic fake featurizer. Use small batch_size —
    payload bytes x batch_size x concurrency must fit the worker heap.
    """

    def __init__(self, *, dim: int = 16, use_real_decoder: bool = False):
        self.dim = dim
        self.use_real_decoder = use_real_decoder

    def _features(self, data: bytes | None) -> list[float]:
        if data is None:
            return [0.0] * self.dim
        if self.use_real_decoder:
            _decode_image_real(data)  # NotImplementedError by design
        # Deterministic fake: per-chunk crc32-derived floats in [0,1)
        out = []
        step = max(1, len(data) // self.dim)
        for i in range(self.dim):
            chunk = data[i * step : (i + 1) * step] or b"\x00"
            out.append((zlib.crc32(chunk) % 10_000) / 10_000.0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("payload" if "payload" in batch.column_names else "html")
        feats = [self._features(v) for v in col.to_pylist()]
        return batch.append_column(
            "features",
            pa.array(feats, pa.list_(pa.float32(), self.dim)),
        )


def frame_sample_plan(
    batch: pa.Table,
    *,
    every_n: int = 30,
    duration_column: str = "n_frames",
) -> pa.Table:
    """Video frame-sampling plan: which frame indices to decode per row.

    Decoding is stubbed; the plan (the distributed part) is real and
    vectorized."""
    plans = []
    for n in batch.column(duration_column).to_pylist():
        n = int(n or 0)
        plans.append(list(range(0, n, every_n)))
    return batch.append_column(
        "sample_frames", pa.array(plans, pa.list_(pa.int32()))
    )


def fake_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic binary payload table for multimodal plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(128 + int(rng.randint(0, 512))) for _ in range(n)]
    return pa.table(
        {
            "img_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(
                [
                    {"width": 64, "height": 48, "format": "fake"}
                    for _ in range(n)
                ],
                IMAGE_META_SCHEMA,
            ),
        }
    )

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
    fully vectorized — per-row counts via ceil division, one flat
    arange, and a ListArray built from offsets (no per-row python)."""
    import numpy as np

    n = batch.column(duration_column).to_numpy(zero_copy_only=False)
    n = np.where(np.isnan(n.astype(np.float64)), 0, n).astype(np.int64)
    k = np.maximum((n + every_n - 1) // every_n, 0)
    # int64 offsets + large_list: a batch whose cumulative sampled-frame
    # count exceeds 2^31 must not wrap into a corrupt plan
    offsets = np.concatenate(([0], np.cumsum(k))).astype(np.int64)
    total = int(offsets[-1])
    row_id = np.repeat(np.arange(len(k)), k)
    within = np.arange(total) - offsets[row_id]
    flat = (within * every_n).astype(np.int64)
    arr = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(flat, pa.int64())
    )
    return batch.append_column("sample_frames", arr)


AUDIO_META_SCHEMA = pa.struct(
    [
        pa.field("sample_rate", pa.int32()),
        pa.field("n_samples", pa.int64()),
        pa.field("codec", pa.string()),
    ]
)


def _decode_audio_real(data: bytes):  # pragma: no cover
    """Real decode path — requires an audio library not in this container."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa; not available here"
    )


def audio_chunk_plan(
    batch: pa.Table,
    *,
    chunk_s: float = 30.0,
    overlap_s: float = 1.0,
    meta_column: str = "meta",
) -> pa.Table:
    """Chunking plan for long audio: (start_sample, end_sample) windows of
    chunk_s seconds with overlap_s overlap — the distributed part
    (vectorized over the typed metadata); decoding is stubbed."""
    metas = batch.column(meta_column).to_pylist()
    plans = []
    for m in metas:
        sr = int((m or {}).get("sample_rate") or 0)
        n = int((m or {}).get("n_samples") or 0)
        step = max(1, int((chunk_s - overlap_s) * sr))
        size = max(1, int(chunk_s * sr))
        chunks = []
        start = 0
        while start < n:
            chunks.append([start, min(n, start + size)])
            start += step
        plans.append(chunks)
    return batch.append_column(
        "chunks", pa.array(plans, pa.list_(pa.list_(pa.int64(), 2)))
    )


class AudioFeatureExtractor:
    """Actor-pool stage: binary audio payload -> fixed-size embedding.

    In production __init__ loads the audio frontend once per actor; here
    the decode is a deterministic fake (crc32 over byte chunks, matching
    ImageFeatureExtractor's pattern) so the Ray plumbing — small batch
    sizes for big payloads, typed metadata, per-actor init — is real and
    testable. Set use_real_decoder=True for the (stubbed) real path."""

    def __init__(self, *, dim: int = 32, use_real_decoder: bool = False,
                 payload_column: str = "payload"):
        self.dim = dim
        self.use_real_decoder = use_real_decoder
        self.payload_column = payload_column

    def _features(self, data: bytes | None) -> list[float]:
        if data is None:
            return [0.0] * self.dim
        if self.use_real_decoder:
            _decode_audio_real(data)  # NotImplementedError by design
        out = []
        step = max(1, len(data) // self.dim)
        for i in range(self.dim):
            chunk = data[i * step : (i + 1) * step] or b"\x00"
            out.append((zlib.crc32(chunk, 7) % 10_000) / 10_000.0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.payload_column)
        feats = [self._features(v) for v in col.to_pylist()]
        return batch.append_column(
            "audio_features",
            pa.array(feats, pa.list_(pa.float32(), self.dim)),
        )


def fake_audio_table(n: int, seed: int = 43) -> pa.Table:
    """Deterministic audio payload table for plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256 + int(rng.randint(0, 1024))) for _ in range(n)]
    metas = [
        {
            "sample_rate": 16_000,
            "n_samples": int(rng.randint(1, 120) * 16_000),
            "codec": "fake",
        }
        for _ in range(n)
    ]
    return pa.table(
        {
            "audio_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, AUDIO_META_SCHEMA),
        }
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

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


def _image_decoder():
    """Soft-dependency image decode: returns a bytes -> grayscale float
    ndarray callable when PIL is importable, else None. Resolved ONCE
    per actor (in ImageFeatureExtractor.__init__), never per batch."""
    try:  # pragma: no cover — PIL is absent in the build sandbox
        import io

        from PIL import Image
    except ImportError:
        return None

    def decode(data: bytes) -> np.ndarray:  # pragma: no cover
        with Image.open(io.BytesIO(data)) as img:
            return np.asarray(img.convert("L"), dtype=np.float64)

    return decode


def _decode_image_real(data: bytes):
    """Real decode path: PIL when installed, loud NotImplementedError
    otherwise (this container ships no codecs — the plumbing around it
    is real and tested; see ImageFeatureExtractor)."""
    dec = _image_decoder()
    if dec is None:
        raise NotImplementedError(
            "image decode requires PIL/opencv; not available in this "
            "environment"
        )
    return dec(data)  # pragma: no cover


class ImageFeatureExtractor:
    """Actor-pool stage: binary image column -> fixed-size feature vector.

    In production __init__ would load a vision model once per actor; here
    it resolves the decoder once per actor: use_real_decoder=False (the
    default — deterministic fake, stable across environments) / True
    (require PIL, fail loudly at actor init if absent) / "auto" (real
    when PIL imports, fake otherwise). Use small batch_size — payload
    bytes x batch_size x concurrency must fit the worker heap.
    """

    def __init__(self, *, dim: int = 16, use_real_decoder=False):
        self.dim = dim
        self._decode = None
        if use_real_decoder in (True, "auto"):
            self._decode = _image_decoder()
            if self._decode is None and use_real_decoder is True:
                raise NotImplementedError(
                    "use_real_decoder=True but PIL is not importable"
                )

    def _features(self, data: bytes | None) -> list[float]:
        if data is None:
            return [0.0] * self.dim
        if self._decode is not None:  # pragma: no cover — needs PIL
            try:
                arr = self._decode(data)
            except Exception:
                # non-image payload (or truncated file): fall through to
                # the deterministic fake rather than poisoning the batch
                arr = None
            if arr is not None and arr.size:
                # real features: per-horizontal-strip mean intensity,
                # scaled to [0, 1)
                strips = np.array_split(arr, self.dim, axis=0)
                return [
                    float(min(s.mean() / 255.0, 0.999999)) if s.size else 0.0
                    for s in strips
                ]
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


def _audio_decoder():
    """Soft-dependency audio decode: returns a bytes ->
    (samples ndarray, sample_rate) callable when soundfile is
    importable, else None."""
    try:  # pragma: no cover — soundfile is absent in the build sandbox
        import io

        import soundfile as sf
    except ImportError:
        return None

    def decode(data: bytes):  # pragma: no cover
        samples, rate = sf.read(io.BytesIO(data), dtype="float64")
        return samples, int(rate)

    return decode


def _decode_audio_real(data: bytes):
    """Real decode path: soundfile when installed, loud
    NotImplementedError otherwise (no codecs in this container)."""
    dec = _audio_decoder()
    if dec is None:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa; not available here"
        )
    return dec(data)  # pragma: no cover


def audio_chunk_plan(
    batch: pa.Table,
    *,
    chunk_s: float = 30.0,
    overlap_s: float = 1.0,
    meta_column: str = "meta",
) -> pa.Table:
    """Chunking plan for long audio: (start_sample, end_sample) windows of
    chunk_s seconds with overlap_s overlap — the distributed part
    (decoding is stubbed). Fully vectorized like frame_sample_plan:
    per-row chunk counts, one flat arange, a large_list built from int64
    offsets (no per-row python loop, no int32 wrap)."""
    metas = batch.column(meta_column)
    if isinstance(metas, pa.ChunkedArray):
        metas = metas.combine_chunks()
    sr = np.nan_to_num(
        metas.field("sample_rate")
        .cast(pa.float64())
        .to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    n = np.nan_to_num(
        metas.field("n_samples")
        .cast(pa.float64())
        .to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    step = np.maximum(((chunk_s - overlap_s) * sr).astype(np.int64), 1)
    size = np.maximum((chunk_s * sr).astype(np.int64), 1)
    # python loop semantics: start = 0, step, 2*step, ... while start < n
    k = np.where(n > 0, (n + step - 1) // step, 0)
    offsets = np.concatenate(([0], np.cumsum(k))).astype(np.int64)
    total = int(offsets[-1])
    row_id = np.repeat(np.arange(len(k)), k)
    within = np.arange(total) - offsets[row_id]
    starts = within * step[row_id]
    ends = np.minimum(n[row_id], starts + size[row_id])
    pairs = pa.FixedSizeListArray.from_arrays(
        pa.array(
            np.column_stack([starts, ends]).ravel(), pa.int64()
        ),
        2,
    )
    arr = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pairs
    )
    return batch.append_column("chunks", arr)


class AudioFeatureExtractor:
    """Actor-pool stage: binary audio payload -> fixed-size embedding.

    In production __init__ loads the audio frontend once per actor; here
    the decoder resolves once per actor like ImageFeatureExtractor:
    False (default — deterministic crc32 fake, stable everywhere) /
    True (require soundfile, fail loudly at init) / "auto" (real when
    soundfile imports, fake otherwise). Real features: per-strip RMS
    of the decoded waveform."""

    def __init__(self, *, dim: int = 32, use_real_decoder=False,
                 payload_column: str = "payload"):
        self.dim = dim
        self.payload_column = payload_column
        self._decode = None
        if use_real_decoder in (True, "auto"):
            self._decode = _audio_decoder()
            if self._decode is None and use_real_decoder is True:
                raise NotImplementedError(
                    "use_real_decoder=True but soundfile is not importable"
                )

    def _features(self, data: bytes | None) -> list[float]:
        if data is None:
            return [0.0] * self.dim
        if self._decode is not None:  # pragma: no cover — needs soundfile
            try:
                samples, _rate = self._decode(data)
            except Exception:
                samples = None  # non-audio payload: deterministic fake
            if samples is not None and np.asarray(samples).size:
                arr = np.asarray(samples, dtype=np.float64)
                if arr.ndim > 1:
                    arr = arr.mean(axis=1)
                strips = np.array_split(arr, self.dim)
                return [
                    float(np.sqrt((s**2).mean())) if s.size else 0.0
                    for s in strips
                ]
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

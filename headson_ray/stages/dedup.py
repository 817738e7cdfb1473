"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (100 TB):
- exact dedup = hash-partition on the dedup key (a groupby shuffle of
  (key, id) pairs only — project before shuffling!) + per-group min-id.
- MinHash: signatures computed batch-local (vectorized numpy); LSH bands
  become (band_hash) keys whose groupby only shuffles (band_hash, doc_id);
  candidate verification re-reads only candidate docs' shingle sets.
- SimHash: 64-bit signature per doc; near-dup = signatures equal on all
  but <= k bits, found via banding on 4 x 16-bit chunks.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

_MERSENNE = (1 << 61) - 1


def _stable_hash_bytes(data: bytes, seed: int = 0) -> int:
    """Process-stable 64-bit hash (python hash() is per-process salted).
    Two salted crc32 calls (C speed) — the per-byte python FNV loop this
    replaced cost seconds per 1k documents."""
    lo = zlib.crc32(data, seed & 0xFFFFFFFF)
    hi = zlib.crc32(data, (seed ^ 0x9E3779B9) & 0xFFFFFFFF ^ 0x5BD1E995)
    return (hi << 32) | lo


def word_shingles(text: str, k: int = 3) -> set[int]:
    toks = text.split()
    if len(toks) < k:
        return {_stable_hash_bytes(" ".join(toks).encode())} if toks else set()
    return {
        _stable_hash_bytes(" ".join(toks[i : i + k]).encode())
        for i in range(len(toks) - k + 1)
    }


class MinHasher:
    """Vectorized MinHash signatures: sig[j] = min over shingles s of
    (a_j * s + b_j) mod p. Permutation params derived from a fixed seed in
    __init__ (once per actor)."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: set[int]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        s = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        # splitmix-style hash-mix per permutation (equivalent quality to
        # affine mod-p permutations), one vectorized (num_perm, n) pass
        h = (s[None, :] ^ self.a[:, None]) * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        return h.min(axis=1)


def minhash_signatures(
    batch: pa.Table,
    *,
    hasher: MinHasher,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_k: int = 3,
) -> pa.Table:
    ids = batch.column(id_column).to_pylist()
    sigs = []
    for t in batch.column(text_column).to_pylist():
        sigs.append(hasher.signature(word_shingles(t or "", shingle_k)))
    return pa.table(
        {
            id_column: pa.array(ids),
            "sig": pa.array(
                [s.astype(np.int64).tolist() for s in sigs],
                pa.list_(pa.int64()),
            ),
        }
    )


def lsh_band_rows(
    sig_table: pa.Table,
    *,
    bands: int = 16,
    id_column: str = "doc_id",
) -> pa.Table:
    """Explode signatures into (band_hash, doc_id) rows for the bucket
    groupby. rows_out = bands * rows_in, but each row is 16 bytes."""
    ids = sig_table.column(id_column).to_pylist()
    sigs = sig_table.column("sig").to_pylist()
    out_hash = []
    out_id = []
    for i, sig in enumerate(sigs):
        r = len(sig) // bands
        for b in range(bands):
            chunk = sig[b * r : (b + 1) * r]
            h = _stable_hash_bytes(
                np.array(chunk, dtype=np.int64).tobytes(), seed=b + 1
            )
            out_hash.append(h & 0x7FFFFFFFFFFFFFFF)
            out_id.append(ids[i])
    return pa.table(
        {
            "band_hash": pa.array(out_hash, pa.int64()),
            id_column: pa.array(out_id),
        }
    )


def candidate_pairs_from_buckets(group: pa.Table, id_column="doc_id") -> pa.Table:
    """Within one LSH bucket: all candidate pairs (a < b)."""
    ids = sorted(group.column(id_column).to_pylist())
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def pairs_from_key_runs(
    group: pa.Table,
    *,
    key_column: str,
    id_column: str,
    run_cap: int | None = None,
) -> pa.Table:
    """Candidate pairs within every equal-key run of one COARSE bucket.

    A groupby on the raw key would create one tiny python group per key
    (hundreds of thousands of map_groups calls); instead the shuffle key
    is `key % NUM_COARSE_BUCKETS` and this single pass sorts the bucket by
    key and emits pairs per run. Runs longer than run_cap are skipped
    (prefix-filtering: an ultra-common key carries no dedup signal)."""
    idx = pa.compute.sort_indices(
        group, sort_keys=[(key_column, "ascending"), (id_column, "ascending")]
    )
    t = group.take(idx)
    keys = t.column(key_column).to_pylist()
    ids = t.column(id_column).to_pylist()
    out_a, out_b = [], []
    i, n = 0, len(keys)
    while i < n:
        j = i + 1
        while j < n and keys[j] == keys[i]:
            j += 1
        run = sorted(set(ids[i:j]))
        if len(run) > 1 and (run_cap is None or len(run) <= run_cap):
            for x in range(len(run)):
                for y in range(x + 1, len(run)):
                    out_a.append(run[x])
                    out_b.append(run[y])
        i = j
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())}
    )


NUM_COARSE_BUCKETS = 256


def _dedup_verified_pairs(verified: "ray.data.Dataset") -> "ray.data.Dataset":
    """Candidate pairs reach verification WITH duplicates (a pair appears
    once per shared bucket key): a distributed groupby on 1M+ composite
    keys costs ~10x the whole verification, so duplicates are verified
    redundantly (cheap, pure) and deduped here on the small verified
    result."""
    tables = list(
        verified.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )
    t = (
        pa.concat_tables(tables)
        if tables
        else pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    )
    if t.num_rows:
        t = (
            t.group_by(["a", "b"])
            .aggregate([("jaccard", "min")])
            .rename_columns(["a", "b", "jaccard"])
        )
        t = t.take(
            pa.compute.sort_indices(
                t, sort_keys=[("a", "ascending"), ("b", "ascending")]
            )
        )
    return ray.data.from_arrow(t)


def _verify_pairs_parallel(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    *,
    id_column: str,
    text_column: str,
    shingle_k: int,
    threshold: float,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of candidate pairs, distributed: the
    shingle sets are broadcast once via ray.put and every pairs batch
    verifies in parallel (the driver never loops over pairs)."""
    import ray as _ray

    shingle_map: dict = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        for i, t in zip(
            batch.column(id_column).to_pylist(),
            batch.column(text_column).to_pylist(),
        ):
            shingle_map[i] = frozenset(word_shingles(t or "", shingle_k))
    sm_ref = _ray.put(shingle_map)

    def verify(b: pa.Table) -> pa.Table:
        sm = _ray.get(sm_ref)
        avals = b.column("a").to_pylist()
        bvals = b.column("b").to_pylist()
        out_a, out_b, out_j = [], [], []
        for x, y in zip(avals, bvals):
            s1 = sm.get(x, frozenset())
            s2 = sm.get(y, frozenset())
            if not s1 and not s2:
                j = 1.0
            else:
                inter = len(s1 & s2)
                j = inter / (len(s1) + len(s2) - inter)
            if j >= threshold:
                out_a.append(x)
                out_b.append(y)
                out_j.append(j)
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return pairs.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )


def jaccard(s1: set, s2: set) -> float:
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)


def minhash_near_dups(
    ds: "ray.data.Dataset",
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> "ray.data.Dataset":
    """Full MinHash+LSH near-dup pipeline: signatures -> band buckets ->
    candidate pairs -> exact-Jaccard verification (broadcast shingle sets).

    Verification broadcasts candidate docs' shingle sets via ray.put —
    candidates are a tiny fraction of the corpus. Returns (a, b, jaccard)
    pairs with jaccard >= threshold.
    """
    hasher = MinHasher(num_perm)
    sigs = ds.map_batches(
        lambda b: minhash_signatures(
            b, hasher=hasher, id_column=id_column, text_column=text_column,
            shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bands_ds = sigs.map_batches(
        lambda b: lsh_band_rows(b, bands=bands, id_column=id_column),
        batch_format="pyarrow",
    )
    bands_ds = bands_ds.map_batches(
        lambda b: b.append_column(
            "bucket",
            pa.compute.bit_wise_and(
                b.column("band_hash"), NUM_COARSE_BUCKETS - 1
            ),
        ),
        batch_format="pyarrow",
    )
    pairs = bands_ds.groupby("bucket").map_groups(
        lambda g: pairs_from_key_runs(
            g, key_column="band_hash", id_column=id_column
        ),
        batch_format="pyarrow",
    )
    verified = _verify_pairs_parallel(
        ds, pairs, id_column=id_column, text_column=text_column,
        shingle_k=shingle_k, threshold=threshold,
    )
    return _dedup_verified_pairs(verified)


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    bucket_cap: int = 64,
) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard near-dup pairs via a distributed inverted
    index (no MinHash approximation):

    1. flat-map each doc to (shingle_hash, doc_id) rows;
    2. groupby shingle -> candidate pairs per posting list (lists longer
       than `bucket_cap` are skipped: a shingle shared by that many docs
       carries no dedup signal, standard prefix-filtering practice — at
       threshold t, a qualifying pair shares >= t/(1+t) of its shingles,
       so rare shingles always surface it);
    3. dedup pairs, verify exact Jaccard with broadcast shingle sets.
    """

    def postings(b: pa.Table) -> pa.Table:
        ids, hs = [], []
        for i, t in zip(
            b.column(id_column).to_pylist(), b.column(text_column).to_pylist()
        ):
            for h in word_shingles(t or "", shingle_k):
                ids.append(i)
                hs.append(h & 0x7FFFFFFFFFFFFFFF)  # fit int64
        return pa.table(
            {
                "shingle": pa.array(hs, pa.int64()),
                id_column: pa.array(ids, pa.int64()),
            }
        )

    posts = ds.map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True
    )

    posts = posts.map_batches(
        lambda b: b.append_column(
            "bucket",
            pa.compute.bit_wise_and(
                b.column("shingle"), NUM_COARSE_BUCKETS - 1
            ),
        ),
        batch_format="pyarrow",
    )
    pairs = posts.groupby("bucket").map_groups(
        lambda g: pairs_from_key_runs(
            g,
            key_column="shingle",
            id_column=id_column,
            run_cap=bucket_cap,
        ),
        batch_format="pyarrow",
    )
    verified = _verify_pairs_parallel(
        ds, pairs, id_column=id_column, text_column=text_column,
        shingle_k=shingle_k, threshold=threshold,
    )
    return _dedup_verified_pairs(verified)


def simhash_signatures(
    batch: pa.Table, *, id_column: str = "doc_id", text_column: str = "text"
) -> pa.Table:
    """64-bit SimHash over whitespace tokens (weight 1 each)."""
    ids = batch.column(id_column).to_pylist()
    out = []
    for t in batch.column(text_column).to_pylist():
        toks = (t or "").split()
        if not toks:
            out.append(0)
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = _stable_hash_bytes(tok.encode())
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        sig = 0
        for bit in range(64):
            if acc[bit] > 0:
                sig |= 1 << bit
        out.append(sig - (1 << 63) if sig >= (1 << 63) else sig)
    return pa.table(
        {id_column: pa.array(ids), "simhash": pa.array(out, pa.int64())}
    )


def simhash_near_dups(
    ds: "ray.data.Dataset",
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    max_hamming: int = 3,
    num_bands: int = 4,
) -> "ray.data.Dataset":
    """SimHash near-dup pairs: signatures -> band buckets -> exact
    Hamming-distance verification.

    Pigeonhole guarantee: two signatures within `max_hamming` bits differ
    in at most max_hamming of the `num_bands` 16-bit bands, so with
    num_bands > max_hamming they MUST agree on at least one band — the
    band groupby finds every qualifying pair exactly (no recall loss).
    Per-band shuffle rows are (band_key, id, sig): 24 bytes."""
    assert num_bands > max_hamming, "need num_bands > max_hamming"
    width = 64 // num_bands

    sigs = ds.map_batches(
        lambda b: simhash_signatures(
            b, id_column=id_column, text_column=text_column
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def band_rows(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_pylist()
        hs = b.column("simhash").to_pylist()
        out_key, out_id, out_sig = [], [], []
        mask = (1 << width) - 1
        for i, h in zip(ids, hs):
            u = h & 0xFFFFFFFFFFFFFFFF
            for band in range(num_bands):
                chunk = (u >> (band * width)) & mask
                out_key.append((band << width) | chunk)
                out_id.append(i)
                out_sig.append(h)
        return pa.table(
            {
                "band_key": pa.array(out_key, pa.int64()),
                id_column: pa.array(out_id, pa.int64()),
                "simhash": pa.array(out_sig, pa.int64()),
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")
    banded = banded.map_batches(
        lambda b: b.append_column(
            "bucket",
            pa.compute.bit_wise_and(
                b.column("band_key"), NUM_COARSE_BUCKETS - 1
            ),
        ),
        batch_format="pyarrow",
    )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            group,
            sort_keys=[("band_key", "ascending"), (id_column, "ascending")],
        )
        t = group.take(idx)
        keys = t.column("band_key").to_pylist()
        ids = t.column(id_column).to_pylist()
        hs = t.column("simhash").to_pylist()
        out_a, out_b, out_d = [], [], []
        i, n = 0, len(keys)
        while i < n:
            j = i + 1
            while j < n and keys[j] == keys[i]:
                j += 1
            seen_run = sorted({(ids[x], hs[x]) for x in range(i, j)})
            for x in range(len(seen_run)):
                for y in range(x + 1, len(seen_run)):
                    ia, ha = seen_run[x]
                    ib, hb = seen_run[y]
                    if ia == ib:
                        continue
                    d = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
                    if d <= max_hamming:
                        out_a.append(ia)
                        out_b.append(ib)
                        out_d.append(d)
            i = j
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_d, pa.int64()),
            }
        )

    raw = banded.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )
    tables = list(raw.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    t = (
        pa.concat_tables(tables)
        if tables
        else pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
    )
    if t.num_rows:
        t = (
            t.group_by(["a", "b"])
            .aggregate([("hamming", "min")])
            .rename_columns(["a", "b", "hamming"])
        )
        t = t.take(
            pa.compute.sort_indices(
                t, sort_keys=[("a", "ascending"), ("b", "ascending")]
            )
        )
    return ray.data.from_arrow(t)


def exact_dedup(
    ds: "ray.data.Dataset",
    *,
    key_column: str = "text",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Exact dedup: keep the min-id row per key. Only (key_hash, id) moves
    through the shuffle; survivors selected per group.

    Collision note: keys are compared via a 63-bit content hash, so two
    DISTINCT keys collide with probability ~n^2/2^64 (~1e-4 at 10^9 docs;
    at 10^12-doc scale either widen to 128-bit fingerprints or add a
    second pass that re-reads colliding groups' full keys — the shuffle
    stays (fingerprint, id) either way)."""
    projected = ds.select_columns([id_column, key_column])

    def hash_key(batch: pa.Table) -> pa.Table:
        hashes = [
            _stable_hash_bytes((k or "").encode()) & 0x7FFFFFFFFFFFFFFF
            for k in batch.column(key_column).to_pylist()
        ]
        return pa.table(
            {
                id_column: batch.column(id_column),
                "key_hash": pa.array(hashes, pa.int64()),
            }
        )

    hashed = projected.map_batches(hash_key, batch_format="pyarrow")
    return hashed.groupby("key_hash").aggregate(
        Min(id_column, alias_name="keep_id")
    )

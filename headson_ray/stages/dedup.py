"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (100 TB):
- exact dedup = hash-partition on the dedup key (a groupby shuffle of
  (key, id) pairs only — project before shuffling!) + per-group min-id.
- MinHash: signatures computed batch-local (vectorized numpy); LSH bands
  become (band_hash) keys whose groupby only shuffles (band_hash, doc_id);
  candidate verification re-reads ONLY candidate docs' shingle sets (the
  corpus is semi-join-filtered to candidate ids before anything is
  collected, so driver memory is O(candidates), never O(corpus)).
- n-gram Jaccard: EXACT pairs via a distributed inverted index with
  global-frequency prefix filtering (PPJoin-style) — no posting list is
  silently dropped, so boilerplate clusters are found in full.
- SimHash: 64-bit signature per doc; near-dup = signatures equal on all
  but <= k bits, found via banding on 4 x 16-bit chunks (pigeonhole, no
  recall loss).

All string hashing is the vectorized 64-bit polynomial family in
stages/hashing.py (true 64-bit entropy; the two-seeded-crc32 scheme it
replaces had only ~32 bits for same-length inputs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from .hashing import hash_strings, hash_u64_rows

_MERSENNE = (1 << 61) - 1


def _stable_hash_bytes(data: bytes, seed: int = 0) -> int:
    """Process-stable 64-bit hash of a byte payload (python hash() is
    per-process salted). blake2b is a genuine 64-bit PRF at C speed —
    collision probability ~n^2/2^65 for n distinct inputs."""
    if seed:
        h = hashlib.blake2b(
            data, digest_size=8, salt=seed.to_bytes(8, "little")
        )
    else:
        h = hashlib.blake2b(data, digest_size=8)
    return int.from_bytes(h.digest(), "little")


def word_shingle_array(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique uint64 hashes of the word k-shingles of `text`.

    Vectorized: hash every token in one pass, then combine each k-run of
    token hashes with a second (seeded-Horner + mix) pass. Texts shorter
    than k words contribute one shingle over all their tokens."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = hash_strings(toks)
    if len(toks) < k:
        win = th[None, :]
    else:
        win = np.lib.stride_tricks.sliding_window_view(th, k)
    return np.unique(hash_u64_rows(win))


def word_shingles(text: str, k: int = 3) -> set[int]:
    """Set-of-ints view of word_shingle_array (python set ops)."""
    return set(map(int, word_shingle_array(text, k)))


def word_shingle_arrays(
    texts: "list[str | None]", k: int = 3
) -> list[np.ndarray]:
    """Per-doc sorted unique shingle hashes for a whole batch.

    Batch-vectorized version of word_shingle_array (identical values):
    one tokenize pass, ONE hash_strings call over the flattened token
    stream of every doc, one windowed-combine pass over the flat hash
    array (windows crossing doc boundaries are discarded by slicing),
    then a per-doc np.unique. Amortizes the codepoint-matrix setup that
    per-doc hash_strings calls pay per document."""
    n = len(texts)
    toks_all: list[str] = []
    bounds = np.empty(n + 1, dtype=np.int64)
    bounds[0] = 0
    for i, t in enumerate(texts):
        toks_all.extend((t or "").split())
        bounds[i + 1] = len(toks_all)
    empty = np.empty(0, dtype=np.uint64)
    if not toks_all:
        return [empty] * n
    th = hash_strings(toks_all)
    if th.shape[0] >= k:
        wh_all = hash_u64_rows(
            np.lib.stride_tricks.sliding_window_view(th, k)
        )
    else:
        wh_all = empty
    out: list[np.ndarray] = []
    for i in range(n):
        s, e = int(bounds[i]), int(bounds[i + 1])
        c = e - s
        if c == 0:
            out.append(empty)
        elif c < k:
            out.append(hash_u64_rows(th[s:e][None, :]))
        else:
            out.append(np.unique(wh_all[s : e - k + 1]))
    return out


class MinHasher:
    """Vectorized MinHash signatures: sig[j] = min over shingles s of
    mix_j(s). Permutation params derived from a fixed seed in __init__
    (once per actor)."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if shingles.size == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        s = np.asarray(shingles, dtype=np.uint64)
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
    sigs = [
        hasher.signature(sh)
        for sh in word_shingle_arrays(
            batch.column(text_column).to_pylist(), shingle_k
        )
    ]
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
    groupby. rows_out = bands * rows_in, but each row is 16 bytes.
    Band hashing is one vectorized pass per band (hash_u64_rows)."""
    ids = sig_table.column(id_column)
    sigs = sig_table.column("sig").to_pylist()
    n = len(sigs)
    if n == 0:
        return pa.table(
            {
                "band_hash": pa.array([], pa.int64()),
                id_column: pa.array([], ids.type),
            }
        )
    sig_mat = np.asarray(sigs, dtype=np.int64).astype(np.uint64)
    r = sig_mat.shape[1] // bands
    hashes = np.empty((bands, n), dtype=np.uint64)
    for b in range(bands):
        hashes[b] = hash_u64_rows(
            sig_mat[:, b * r : (b + 1) * r], seed=b + 1
        )
    out_hash = (hashes.reshape(-1).astype(np.int64)) & 0x7FFFFFFFFFFFFFFF
    out_id = pa.concat_arrays(
        [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids]
        * bands
    )
    return pa.table(
        {
            "band_hash": pa.array(out_hash, pa.int64()),
            id_column: out_id,
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
    key and emits pairs per run. run_cap (None = unlimited) is a safety
    valve for callers that tolerate recall loss; the exact n-gram path
    passes None and bounds run length via prefix filtering instead."""
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


def _dedup_verified_pairs(
    verified: "ray.data.Dataset", value_column: str = "jaccard"
) -> "ray.data.Dataset":
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
                value_column: pa.array(
                    [],
                    pa.int64() if value_column.endswith("_ppm")
                    else pa.float64(),
                ),
            }
        )
    )
    if t.num_rows:
        t = (
            t.group_by(["a", "b"])
            .aggregate([(value_column, "min")])
            .rename_columns(["a", "b", value_column])
        )
        t = t.take(
            pa.compute.sort_indices(
                t, sort_keys=[("a", "ascending"), ("b", "ascending")]
            )
        )
    return ray.data.from_arrow(t)


def candidate_shingle_map(
    ds: "ray.data.Dataset",
    cand_ids: np.ndarray,
    *,
    id_column: str,
    text_column: str,
    shingle_k: int,
) -> dict[int, np.ndarray]:
    """Shingle sets for ONLY the candidate ids: the corpus is semi-join
    filtered (vectorized np.isin against the broadcast sorted id array)
    before any row reaches the driver, so driver memory and the broadcast
    payload are O(candidates), not O(corpus)."""
    import ray as _ray

    ids_ref = _ray.put(np.sort(np.asarray(cand_ids, dtype=np.int64)))

    def semi_join(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(ids_ref)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        mask = np.isin(ids, wanted, assume_unique=False)
        return batch.filter(pa.array(mask)).select([id_column, text_column])

    filtered = ds.map_batches(
        semi_join, batch_format="pyarrow", zero_copy_batch=True
    )
    shingle_map: dict[int, np.ndarray] = {}
    for batch in filtered.iter_batches(batch_format="pyarrow", batch_size=8192):
        arrs = word_shingle_arrays(
            batch.column(text_column).to_pylist(), shingle_k
        )
        for i, sh in zip(batch.column(id_column).to_pylist(), arrs):
            shingle_map[i] = sh
    return shingle_map


def _collect_candidate_ids(pairs: "ray.data.Dataset") -> np.ndarray:
    """Unique ids appearing in the pair set, folded INCREMENTALLY so the
    driver holds O(unique candidates), never the full pair stream (a
    boilerplate-heavy corpus has O(cluster^2) pairs over O(cluster)
    ids)."""
    acc = np.empty(0, dtype=np.int64)
    for batch in pairs.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        chunk = np.unique(
            np.concatenate(
                [
                    batch.column("a").to_numpy(zero_copy_only=False),
                    batch.column("b").to_numpy(zero_copy_only=False),
                ]
            )
        )
        acc = np.union1d(acc, chunk)
    return acc


def _verify_pairs_parallel(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    *,
    id_column: str,
    text_column: str,
    shingle_k: int,
    threshold: float,
    emit_ppm: bool = False,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of candidate pairs, distributed.

    Only the CANDIDATE docs' shingle sets are built and broadcast (via a
    semi-join filter of the corpus against the candidate id set); every
    pairs batch then verifies in parallel. With emit_ppm the jaccard is
    emitted as integer parts-per-million computed in exact int arithmetic
    (inter * 1_000_000 // union) so the DuckDB oracle matches bit-for-bit.
    """
    import ray as _ray

    # pairs is consumed twice (id collection + verification); it is the
    # small candidate set, so materializing it is O(candidates).
    pairs = pairs.materialize()
    cand_ids = _collect_candidate_ids(pairs)
    shingle_map = candidate_shingle_map(
        ds, cand_ids, id_column=id_column, text_column=text_column,
        shingle_k=shingle_k,
    )
    sm_ref = _ray.put(shingle_map)
    thr_ppm = int(round(threshold * 1_000_000))

    def verify(b: pa.Table) -> pa.Table:
        sm = _ray.get(sm_ref)
        avals = b.column("a").to_pylist()
        bvals = b.column("b").to_pylist()
        empty = np.empty(0, dtype=np.uint64)
        out_a, out_b, out_j = [], [], []
        for x, y in zip(avals, bvals):
            s1 = sm.get(x, empty)
            s2 = sm.get(y, empty)
            inter = len(np.intersect1d(s1, s2, assume_unique=True))
            union = len(s1) + len(s2) - inter
            # two empty shingle sets are identical documents: j = 1
            ppm = 1_000_000 if union == 0 else inter * 1_000_000 // union
            if ppm >= thr_ppm:
                out_a.append(x)
                out_b.append(y)
                out_j.append(
                    ppm
                    if emit_ppm
                    else (1.0 if union == 0 else inter / union)
                )
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                (
                    "jaccard_ppm" if emit_ppm else "jaccard"
                ): pa.array(
                    out_j, pa.int64() if emit_ppm else pa.float64()
                ),
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
    emit_ppm: bool = False,
) -> "ray.data.Dataset":
    """Full MinHash+LSH near-dup pipeline: signatures -> band buckets ->
    candidate pairs -> exact-Jaccard verification over candidate-only
    shingle sets. Returns (a, b, jaccard) pairs with jaccard >= threshold;
    with emit_ppm the jaccard is integer parts-per-million (exact int
    arithmetic) so a DuckDB oracle can reproduce it bit-for-bit — the
    band codes are fixed slices of the already-oracled signatures, so
    the candidate set (and therefore the verified pair set, absent
    64-bit band-hash collisions) is SQL-expressible too."""
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
        shingle_k=shingle_k, threshold=threshold, emit_ppm=emit_ppm,
    )
    return _dedup_verified_pairs(
        verified, value_column="jaccard_ppm" if emit_ppm else "jaccard"
    )


def _postings(
    ds: "ray.data.Dataset", id_column: str, text_column: str, shingle_k: int
) -> "ray.data.Dataset":
    """(shingle, doc_id) posting rows, bucketed by shingle hash."""

    def postings(b: pa.Table) -> pa.Table:
        ids_np = b.column(id_column).to_numpy(zero_copy_only=False)
        id_chunks, sh_chunks = [], []
        arrs = word_shingle_arrays(
            b.column(text_column).to_pylist(), shingle_k
        )
        for i, sh in zip(ids_np, arrs):
            sh_chunks.append(sh)
            id_chunks.append(np.full(sh.shape[0], i, dtype=np.int64))
        hs = (
            np.concatenate(sh_chunks).astype(np.int64)
            if sh_chunks
            else np.empty(0, dtype=np.int64)
        ) & 0x7FFFFFFFFFFFFFFF
        ids = (
            np.concatenate(id_chunks)
            if id_chunks
            else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                "shingle": pa.array(hs, pa.int64()),
                id_column: pa.array(ids, pa.int64()),
                "bucket": pa.array(hs & (NUM_COARSE_BUCKETS - 1), pa.int64()),
            }
        )

    return ds.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)


def _attach_doc_freq(group: pa.Table, id_column: str) -> pa.Table:
    """Within one shingle bucket: attach each posting's GLOBAL document
    frequency (every occurrence of a shingle lands in this one bucket, so
    the run length IS the global df). Vectorized run detection."""
    idx = pa.compute.sort_indices(group, sort_keys=[("shingle", "ascending")])
    t = group.take(idx)
    sh = t.column("shingle").to_numpy(zero_copy_only=False)
    n = sh.shape[0]
    if n == 0:
        return pa.table(
            {
                id_column: pa.array([], pa.int64()),
                "shingle": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            }
        )
    starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
    lengths = np.diff(np.r_[starts, n])
    df = np.repeat(lengths, lengths)
    return pa.table(
        {
            id_column: t.column(id_column),
            "shingle": t.column("shingle"),
            "df": pa.array(df, pa.int64()),
        }
    )


def _prefix_postings(
    group: pa.Table, id_column: str, threshold: float
) -> pa.Table:
    """Within one doc bucket: keep each doc's PREFIX postings under the
    global (df, shingle) order. For Jaccard threshold t a qualifying pair
    must share a shingle within the first |S| - ceil(t*|S|) + 1 shingles
    of BOTH docs (standard prefix-filter bound), so pairing only prefix
    postings loses nothing. Vectorized per-run trimming."""
    idx = pa.compute.sort_indices(
        group,
        sort_keys=[
            (id_column, "ascending"),
            ("df", "ascending"),
            ("shingle", "ascending"),
        ],
    )
    t = group.take(idx)
    ids = t.column(id_column).to_numpy(zero_copy_only=False)
    n = ids.shape[0]
    if n == 0:
        return pa.table(
            {
                "shingle": pa.array([], pa.int64()),
                id_column: pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
            }
        )
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    lengths = np.diff(np.r_[starts, n])
    # prefix size per doc: |S| - ceil(t*|S|) + 1
    prefix = lengths - np.ceil(threshold * lengths).astype(np.int64) + 1
    pos_in_run = np.arange(n) - np.repeat(starts, lengths)
    keep = pos_in_run < np.repeat(prefix, lengths)
    kept = t.filter(pa.array(keep))
    sh = kept.column("shingle").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "shingle": kept.column("shingle"),
            id_column: kept.column(id_column),
            "bucket": pa.array(sh & (NUM_COARSE_BUCKETS - 1), pa.int64()),
        }
    )


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> "ray.data.Dataset":
    """EXACT word-n-gram Jaccard near-dup pairs via a distributed inverted
    index with global-frequency prefix filtering (PPJoin-style):

    1. flat-map each doc to (shingle_hash, doc_id) posting rows;
    2. groupby shingle-bucket -> attach global document frequency (a
       shingle's postings all land in one bucket, so run length = df);
    3. groupby doc-bucket -> keep each doc's prefix under the global
       (df, shingle) order: |S| - ceil(t*|S|) + 1 postings. Any pair with
       J >= t shares a prefix shingle on both sides, so no pair is lost —
       unlike a posting-run cap, boilerplate clusters (the primary dedup
       target) are found in full (their output is inherently O(cluster²));
    4. groupby shingle-bucket -> candidate pairs per run (NO cap);
    5. exact-Jaccard verification over candidate-only shingle sets,
       emitted as integer jaccard_ppm (= inter*1e6 // union) so the
       DuckDB oracle can reproduce values exactly.

    Three narrow shuffles of (int64, int64[, int64]) rows; the wide text
    column never shuffles.
    """
    posts = _postings(ds, id_column, text_column, shingle_k)
    with_df = posts.groupby("bucket").map_groups(
        lambda g: _attach_doc_freq(g, id_column), batch_format="pyarrow"
    )
    with_df = with_df.map_batches(
        lambda b: b.append_column(
            "doc_bucket",
            pa.compute.bit_wise_and(
                b.column(id_column), NUM_COARSE_BUCKETS - 1
            ),
        ),
        batch_format="pyarrow",
    )
    prefixes = with_df.groupby("doc_bucket").map_groups(
        lambda g: _prefix_postings(g, id_column, threshold),
        batch_format="pyarrow",
    )
    pairs = prefixes.groupby("bucket").map_groups(
        lambda g: pairs_from_key_runs(
            g, key_column="shingle", id_column=id_column
        ),
        batch_format="pyarrow",
    )
    verified = _verify_pairs_parallel(
        ds, pairs, id_column=id_column, text_column=text_column,
        shingle_k=shingle_k, threshold=threshold, emit_ppm=True,
    )
    return _dedup_verified_pairs(verified, value_column="jaccard_ppm")


def simhash_signatures(
    batch: pa.Table, *, id_column: str = "doc_id", text_column: str = "text"
) -> pa.Table:
    """64-bit SimHash over whitespace tokens (weight 1 each).

    Fully vectorized: all tokens of the batch hash in one pass
    (stages/hashing.py polynomial hash — SQL-expressible, so the DuckDB
    oracle recomputes identical signatures), bits expand to a (tokens, 64)
    +-1 matrix, and per-doc sums use one np.add.reduceat."""
    ids = batch.column(id_column)
    texts = batch.column(text_column).to_pylist()
    tok_lists = [(t or "").split() for t in texts]
    counts = np.fromiter(map(len, tok_lists), dtype=np.int64, count=len(tok_lists))
    all_toks: list[str] = [tok for toks in tok_lists for tok in toks]
    n_docs = len(tok_lists)
    if not all_toks:
        return pa.table(
            {id_column: ids, "simhash": pa.array([0] * n_docs, pa.int64())}
        )
    th = hash_strings(all_toks)
    bits = (
        (th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)
    contrib = 2 * bits - 1  # (tokens, 64)
    # per-doc segment sums; docs with zero tokens get sig 0
    offsets = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    nonempty = counts > 0
    acc = np.zeros((n_docs, 64), dtype=np.int64)
    if nonempty.any():
        seg = np.add.reduceat(contrib, offsets[nonempty], axis=0)
        # reduceat with duplicate offsets (empty docs) is avoided by
        # indexing only nonempty docs
        acc[nonempty] = seg
    sig_bits = (acc > 0).astype(np.uint64)
    sig = (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    sig[~nonempty] = 0
    return pa.table(
        {
            id_column: ids,
            "simhash": pa.array(sig.view(np.int64), pa.int64()),
        }
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
        n = b.num_rows
        if n == 0:
            return pa.table(
                {
                    "band_key": pa.array([], pa.int64()),
                    id_column: pa.array([], pa.int64()),
                    "simhash": pa.array([], pa.int64()),
                }
            )
        hs = b.column("simhash").to_numpy(zero_copy_only=False)
        u = hs.astype(np.int64).view(np.uint64)
        mask = np.uint64((1 << width) - 1)
        keys = np.empty((num_bands, n), dtype=np.int64)
        for band in range(num_bands):
            chunk = (u >> np.uint64(band * width)) & mask
            keys[band] = ((np.uint64(band) << np.uint64(width)) | chunk).astype(
                np.int64
            )
        ids = b.column(id_column).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1), pa.int64()),
                id_column: pa.array(np.tile(ids, num_bands), pa.int64()),
                "simhash": pa.array(np.tile(hs, num_bands), pa.int64()),
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


# Below this many symmetric edge rows the min-label closure folds in ONE
# Ray task (numpy union-find) instead of paying the iterative loop's
# per-round all-to-all constant (~2s/round of pure scheduling at tiny
# scale: measured 3 rounds x 2 shuffles on a 2.2k-edge graph). The fold
# runs in a worker task off the edge blocks' ObjectRefs — the driver
# never materializes edges or labels on either path.
SMALL_COMPONENT_GRAPH_ROWS = 1 << 18


def components_min_label(
    pairs: "ray.data.Dataset", *, max_iters: int = 50
) -> "ray.data.Dataset":
    """Connected components of an (a, b) pair graph via iterative
    min-label propagation on Ray Data — the 10^12-scale path where the
    pair set itself is too big for a driver union-find. Returns one
    (node, lbl) row per node appearing in any pair; lbl = component min.

    Each iteration is one hash-partitioned join (edges x labels) + a
    min-groupby; labels only ever decrease, so `sum(lbl)` unchanged is a
    fixpoint certificate (no change-detection join needed). Converges in
    O(component diameter) iterations; labels materialize per iteration
    (they are one small row per graph node — never the corpus).

    Graphs at or under SMALL_COMPONENT_GRAPH_ROWS symmetric edges skip
    the loop: one worker task union-finds the edge blocks (same output,
    tested equal) — the adaptive-parallelism counterpart of
    _num_blocks_for, because per-round shuffle constants, not data,
    dominate tiny graphs."""
    from .join import hash_join

    def sym_edges(b: pa.Table) -> pa.Table:
        a = b.column("a").combine_chunks() if isinstance(
            b.column("a"), pa.ChunkedArray
        ) else b.column("a")
        bb = b.column("b").combine_chunks() if isinstance(
            b.column("b"), pa.ChunkedArray
        ) else b.column("b")
        return pa.table(
            {
                "src": pa.concat_arrays([a, bb]),
                "node": pa.concat_arrays([bb, a]),
            }
        )

    edges = pairs.map_batches(
        sym_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if 0 < edges.count() <= SMALL_COMPONENT_GRAPH_ROWS:
        import ray as _ray

        @_ray.remote
        def _uf_fold(*blocks) -> pa.Table:
            t = pa.concat_tables(blocks)
            col_a, col_b = t.column("src"), t.column("node")
            if pa.types.is_integer(col_a.type):
                av = col_a.to_numpy(zero_copy_only=False)
                bv = col_b.to_numpy(zero_copy_only=False)
            else:
                av = np.asarray(col_a.to_pylist(), dtype=object)
                bv = np.asarray(col_b.to_pylist(), dtype=object)
            uniq, codes = np.unique(
                np.concatenate([av, bv]), return_inverse=True
            )
            ca, cb = codes[: av.size], codes[av.size:]
            parent = np.arange(uniq.size, dtype=np.int64)

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for x, y in zip(ca.tolist(), cb.tolist()):
                rx, ry = find(x), find(y)
                if rx != ry:
                    # union by MIN root: np.unique sorts, so the min
                    # code IS the component's min node — every root is
                    # its component's label with no second pass
                    if rx < ry:
                        parent[ry] = rx
                    else:
                        parent[rx] = ry
            roots = np.fromiter(
                (find(i) for i in range(uniq.size)),
                dtype=np.int64, count=uniq.size,
            )
            return pa.table(
                {"node": pa.array(uniq), "lbl": pa.array(uniq[roots])}
            )

        return ray.data.from_arrow_refs(
            [_uf_fold.remote(*edges.to_arrow_refs())]
        )

    def init_labels(b: pa.Table) -> pa.Table:
        t = b.select(["src"]).group_by(["src"]).aggregate([])
        return pa.table(
            {"node": t.column("src"), "lbl": t.column("src")}
        )

    # coalesce to a bounded block count every iteration: groupby /
    # map_groups emit one tiny block per bucket, and without this the
    # block count compounds per iteration (measured: 2047 blocks
    # carrying 19 rows by iteration 11 — task-scheduling overhead, not
    # data, dominated the wall clock)
    coalesce = 8
    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("lbl", alias_name="lbl"))
        .repartition(coalesce)
        .materialize()
    )
    prev_sum = labels.sum("lbl")
    for _ in range(max_iters):
        # the join's per-bucket map_groups also emits one block per
        # bucket; coalesce before the per-block cand pass
        nbr = hash_join(edges, labels, key="node").repartition(coalesce)

        def cand(b: pa.Table) -> pa.Table:
            t = pa.table({"node": b.column("src"), "lbl": b.column("lbl")})
            return t.group_by(["node"]).aggregate([("lbl", "min")]).\
                rename_columns(["node", "lbl"])

        merged = nbr.map_batches(cand, batch_format="pyarrow").union(labels)
        labels = (
            merged.groupby("node")
            .aggregate(Min("lbl", alias_name="lbl"))
            .repartition(coalesce)
            .materialize()
        )
        new_sum = labels.sum("lbl")
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"components_min_label did not converge in {max_iters} iterations"
        " (component diameter exceeds max_iters; raise it or pre-contract"
        " the graph)"
    )


def near_dup_canonical(
    ds: "ray.data.Dataset",
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    method: str = "driver",
) -> "ray.data.Dataset":
    """Cluster-level near-dup assignment: every doc maps to the MIN doc id
    of its connected component in the exact Jaccard >= threshold graph
    (the usual keep-one-per-cluster dedup step after pair finding).

    method="driver" (default): the pair set is tiny relative to the
    corpus, so components resolve with a driver-side union-find over the
    pairs; the mapping is broadcast and the corpus streams through a
    vectorized relabel — the corpus itself is never collected.
    method="distributed": the scale path — components via
    components_min_label (iterative hash-join min-label propagation,
    nothing driver-side), for pair sets too big to union-find locally;
    identical output (tested)."""
    pairs = ngram_jaccard_pairs(
        ds, id_column=id_column, text_column=text_column,
        shingle_k=shingle_k, threshold=threshold,
    )
    if method == "distributed":
        labels = components_min_label(pairs)
        items = sorted(
            (r["node"], r["lbl"])
            for b in labels.iter_batches(
                batch_format="pyarrow", batch_size=1 << 20
            )
            for r in b.to_pylist()
        )
        # (collected here only to reuse the broadcast relabel below;
        # at true scale relabel via a hash_join of corpus ids x labels)
        keys = np.array([k for k, _ in items], dtype=np.int64)
        vals = np.array([v for _, v in items], dtype=np.int64)
        return _relabel_with_mapping(ds, id_column, keys, vals)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        for a_, b_ in zip(
            b.column("a").to_pylist(), b.column("b").to_pylist()
        ):
            ra, rb = find(a_), find(b_)
            if ra != rb:
                if ra > rb:
                    ra, rb = rb, ra
                parent[rb] = ra
    mapping = {x: find(x) for x in list(parent)}
    items = sorted(mapping.items())
    keys = np.array([k for k, _ in items], dtype=np.int64)
    vals = np.array([v for _, v in items], dtype=np.int64)
    return _relabel_with_mapping(ds, id_column, keys, vals)


def _relabel_with_mapping(
    ds: "ray.data.Dataset",
    id_column: str,
    keys: np.ndarray,
    vals: np.ndarray,
) -> "ray.data.Dataset":
    """Broadcast (keys -> vals) once; stream the corpus through a
    vectorized searchsorted relabel (ids absent from the mapping keep
    their own id as canonical)."""
    import ray as _ray

    map_ref = _ray.put((keys, vals))

    def relabel(b: pa.Table) -> pa.Table:
        ks, vs = _ray.get(map_ref)
        ids = b.column(id_column).to_numpy(zero_copy_only=False)
        canon = ids.copy()
        if ks.size:
            pos = np.searchsorted(ks, ids)
            pos_c = np.clip(pos, 0, ks.size - 1)
            hit = ks[pos_c] == ids
            canon[hit] = vs[pos_c[hit]]
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "canonical_id": pa.array(canon, pa.int64()),
            }
        )

    return ds.select_columns([id_column]).map_batches(
        relabel, batch_format="pyarrow", zero_copy_batch=True
    )


def exact_dedup(
    ds: "ray.data.Dataset",
    *,
    key_column: str = "text",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Exact dedup: keep the min-id row per key. Only (key_hash, id) moves
    through the shuffle; survivors selected per group.

    Collision note: keys are compared via a 63-bit blake2b fingerprint, so
    two DISTINCT keys collide with probability ~n^2/2^64 (~1e-4 at 10^9
    docs; at 10^12-doc scale either widen to 128-bit fingerprints or add
    a second pass that re-reads colliding groups' full keys — the shuffle
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


# ---------------------------------------------------------------------------
# Exact substring-level dedup spans (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better": remove every character
# span whose length-L window occurs more than once in the corpus).
# Scale design: windows never leave their batch as strings — only
# (window_hash, doc_id, pos) int64 triples shuffle, bucketed by hash so
# corpus-wide occurrence counting completes inside each bucket; the
# duplicated positions (a small fraction) re-shuffle once by doc bucket
# for the vectorized interval merge. Driver holds nothing.

SUBSTR_WINDOW = 40
NUM_SUBSTR_BUCKETS = 256
NUM_SPAN_DOC_BUCKETS = 64


def substring_window_explode(
    b: pa.Table, *, window: int = SUBSTR_WINDOW
) -> pa.Table:
    """Explode a batch of docs into (bucket, wh, doc_id, pos) rows — one
    per length-`window` character window. All texts concatenate into ONE
    codepoint array; rolling_window_hashes runs `window` vectorized
    passes over it and windows crossing a doc boundary are masked out,
    so the kernel is loop-free over rows. ASCII or not, positions are
    CODEPOINT offsets (matching SQL substr semantics)."""
    from .hashing import mix_rounds, rolling_window_hashes

    texts = [t or "" for t in b.column("text").to_pylist()]
    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
    lens = np.fromiter((len(t) for t in texts), np.int64, count=len(texts))
    total = int(lens.sum())
    empty = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "wh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }
    )
    if total < window:
        return empty
    codes = np.frombuffer(
        "".join(texts).encode("utf-32-le"), dtype=np.uint32
    )
    h = rolling_window_hashes(codes, window)  # n - window + 1 lanes
    doc_idx = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    starts = np.cumsum(lens) - lens
    # window at global p is valid iff its last char is in the same doc
    valid = doc_idx[: h.size] == doc_idx[window - 1 :]
    if not valid.any():
        return empty
    p = np.flatnonzero(valid)
    d = doc_idx[p]
    wh = mix_rounds(h[p])
    return pa.table(
        {
            "bucket": pa.array(
                (wh % np.uint64(NUM_SUBSTR_BUCKETS)).astype(np.int64)
            ),
            "wh": pa.array(wh.view(np.int64)),
            "doc_id": pa.array(ids[d].astype(np.int64)),
            "pos": pa.array(p - starts[d]),
        }
    )


def substring_bucket_dups(g: pa.Table) -> pa.Table:
    """One window-hash bucket: corpus-wide occurrence counts complete
    locally (every occurrence of a window lands in its bucket); only the
    positions of windows seen >= 2 times leave, tagged with the doc
    bucket for the interval-merge shuffle."""
    wh = g.column("wh").to_numpy(zero_copy_only=False).view(np.uint64)
    _, inv, cnt = np.unique(wh, return_inverse=True, return_counts=True)
    keep = (cnt >= 2)[inv]
    doc = g.column("doc_id").to_numpy(zero_copy_only=False)[keep]
    pos = g.column("pos").to_numpy(zero_copy_only=False)[keep]
    return pa.table(
        {
            "dbucket": pa.array(doc % np.int64(NUM_SPAN_DOC_BUCKETS)),
            "doc_id": pa.array(doc),
            "pos": pa.array(pos),
        }
    )


def substring_merge_spans(
    g: pa.Table, *, window: int = SUBSTR_WINDOW
) -> pa.Table:
    """One doc bucket: merge each doc's duplicated-window positions into
    maximal character spans [span_start, span_end). Two windows at p < q
    of one doc merge iff q - p <= window (their spans overlap or touch).
    Vectorized: one lexsort + run-break cumsum over the whole bucket."""
    doc = g.column("doc_id").to_numpy(zero_copy_only=False)
    pos = g.column("pos").to_numpy(zero_copy_only=False)
    if doc.size == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64()),
            }
        )
    order = np.lexsort((pos, doc))
    d_s, p_s = doc[order], pos[order]
    brk = np.empty(d_s.size, dtype=bool)
    brk[0] = True
    brk[1:] = (d_s[1:] != d_s[:-1]) | (p_s[1:] - p_s[:-1] > window)
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], d_s.size) - 1
    return pa.table(
        {
            "doc_id": pa.array(d_s[starts]),
            "span_start": pa.array(p_s[starts]),
            "span_end": pa.array(p_s[ends] + window),
        }
    )

"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k. The (small) query matrix is
  broadcast once via ray.put; every batch does one numpy matmul and emits
  its top-(k+1) per query; a groupby(query) map_groups does the k-way
  merge DISTRIBUTED, so the driver receives only the final nq*k rows
  (per-block partials scale with corpus block count and never land on
  the driver).
- lsh_topk: random-hyperplane LSH bucketing as the approximate scale
  variant (probes only matching buckets).
- embedding near-dup: pairs with cosine >= threshold via label-blocked
  matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    """Zero-copy-ish (n, dim) float64 matrix from a list<float> /
    fixed_size_list column: flatten the child values and reshape —
    no python list materialization."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = flat.shape[0] // n
    return flat.reshape(n, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    exclude_self: bool = True,
    query_ids: list[int] | None = None,
) -> pa.Table:
    """Exact cosine top-k: returns (query_id, neighbor_id, rank).

    rank is 1-based by descending similarity, ties broken by neighbor id
    (deterministic).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    nq = qn.shape[0]
    if query_ids is None:
        query_ids = list(range(nq))
    qids_ref = ray.put(np.asarray(query_ids, dtype=np.int64))
    empty = pa.table(
        {
            "qi": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )

    def score_block(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_matrix(batch, vec_column))
        if m.shape[0] == 0:
            return empty
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        sims = q @ m.T  # (nq, block)
        # per-block top-(k+1) per query, fully vectorized (the +1 leaves
        # room to drop the self-match at merge time)
        top = min(k + 1, sims.shape[1])
        idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
        return pa.table(
            {
                "qi": pa.array(
                    np.repeat(np.arange(nq, dtype=np.int64), top),
                    pa.int64(),
                ),
                "neighbor_id": pa.array(ids[idx].ravel(), pa.int64()),
                "sim": pa.array(
                    np.take_along_axis(sims, idx, axis=1).ravel(),
                    pa.float64(),
                ),
            }
        )

    partials = ds.map_batches(
        score_block, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_group(group: pa.Table) -> pa.Table:
        # distributed k-way merge: one group per query id, so the driver
        # only ever receives the final nq*k rows, not the per-block
        # partials (which grow with the corpus block count)
        qids = ray.get(qids_ref)
        qi = group.column("qi")[0].as_py()
        nid = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        sim = group.column("sim").to_numpy(zero_copy_only=False)
        if exclude_self:
            keep = nid != qids[qi]
            nid, sim = nid[keep], sim[keep]
        # rank by descending sim, ties by ascending neighbor id
        order = np.lexsort((nid, -sim))[:k]
        n = order.shape[0]
        return pa.table(
            {
                "query_id": pa.array(
                    np.full(n, qids[qi], dtype=np.int64), pa.int64()
                ),
                "neighbor_id": pa.array(nid[order], pa.int64()),
                "rank": pa.array(
                    np.arange(1, n + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    merged = partials.groupby("qi").map_groups(
        merge_group, batch_format="pyarrow"
    )
    tbls = list(merged.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tbls:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    out = pa.concat_tables(tbls)
    return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])


def lsh_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    num_planes: int = 3,
    num_tables: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    seed: int = 42,
    query_ids: list[int] | None = None,
) -> pa.Table:
    """Approximate top-k: MULTI-TABLE random-hyperplane buckets — a
    vector is scored if its bucket code matches a query's code in ANY of
    the `num_tables` independent tables (recall ~= 1-(1-p^P)^L with
    p = 1 - theta/pi), the same OR-of-tables scheme as
    embedding_near_dup_pairs_lsh. Returns the brute_force_topk schema;
    recall vs exact is asserted in tests. Scale note: P grows ~log(n)
    to keep per-table buckets selective; the defaults suit the sf-scale
    test corpora."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    dim = qn.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    pw = 1 << np.arange(num_planes)
    q_codes = [
        np.unique(((qn @ planes[t].T > 0) * pw).sum(axis=1))
        for t in range(num_tables)
    ]
    planes_ref = ray.put(planes)
    codes_ref = ray.put(q_codes)

    def bucket_filter(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        codes = ray.get(codes_ref)
        m = _normalize(_matrix(batch, vec_column))
        if m.shape[0] == 0:
            return batch
        mask = np.zeros(m.shape[0], dtype=bool)
        for t in range(pl.shape[0]):
            code = ((m @ pl[t].T > 0) * pw).sum(axis=1)
            mask |= np.isin(code, codes[t])
        return batch.filter(pa.array(mask))

    filtered = ds.map_batches(
        bucket_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    return brute_force_topk(
        filtered,
        queries,
        k=k,
        id_column=id_column,
        vec_column=vec_column,
        query_ids=query_ids,
    )


def train_centroids(
    ds: "ray.data.Dataset",
    *,
    num_centroids: int = 16,
    iters: int = 2,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> np.ndarray:
    """Exact-integer Lloyd coarse quantizer on the floor-quantized 2^20
    grid (stages/cluster.py kmeans_centroids): k-lowest-id init, `iters`
    distributed partial-sum update passes, driver state bounded at
    O(k*d) integers. Replaces the earlier float spherical trainer: the
    integer metric makes every IVF decision (training, cell assignment,
    probe choice) bit-reproducible in the DuckDB chained-CTE oracle,
    and training streams the full corpus distributed instead of folding
    a driver-side sample."""
    from .cluster import kmeans_centroids

    return kmeans_centroids(
        ds.select_columns([id_column, vec_column]),
        k=num_centroids,
        iters=iters,
        id_column=id_column,
        vec_column=vec_column,
    )


def _quantize(m: np.ndarray) -> np.ndarray:
    """floor(x * 2^20) int64 grid — the same exact-arithmetic embedding
    quantization as stages/cluster.py (QUANT), so every IVF decision is
    integer math a SQL oracle reproduces bit-for-bit."""
    from .cluster import QUANT

    return np.floor(np.asarray(m, dtype=np.float64) * QUANT).astype(
        np.int64
    )


def _int_d2(M: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) exact int64 squared L2 distances on the quantized grid."""
    return (
        (M * M).sum(1)[:, None]
        + (cents * cents).sum(1)[None, :]
        - 2 * (M @ cents.T)
    )


def _assign_cells(m_raw: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid cell per vector: exact integer L2 argmin, ties
    to the lowest cell id (np.argmin == row_number ORDER BY dist, cell)."""
    if m_raw.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    return np.argmin(_int_d2(_quantize(m_raw), cents), axis=1).astype(
        np.int64
    )


def _probe_cells(
    cents: np.ndarray, queries: np.ndarray, nprobe: int
) -> list[int]:
    """Union of every query's `nprobe` nearest centroid ids (sorted) —
    the same exact integer metric as cell assignment, so the probe set
    is SQL-reproducible."""
    d2 = _int_d2(_quantize(np.asarray(queries, dtype=np.float64)), cents)
    probe: set[int] = set()
    k = cents.shape[0]
    for row in d2:
        # nprobe nearest by (dist asc, cell id asc) — lexsort's last key
        # is primary
        order = np.lexsort((np.arange(k), row))[:nprobe]
        probe.update(order.tolist())
    return sorted(probe)


def build_ivf_index(
    ds: "ray.data.Dataset",
    path: str,
    *,
    num_centroids: int = 16,
    iters: int = 2,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> np.ndarray:
    """ONE pass over the corpus writes the IVF partitioned layout: each
    row lands in `path`/cells/ivf_cell=<nearest centroid>/ (hive
    partitioning via write_parquet partition_cols), centroids saved
    alongside. Queries then read ONLY the probed partitions
    (ivf_topk_indexed) instead of filter-scanning the whole corpus —
    the read cost drops to ~nprobe/num_centroids of the data, and the
    layout is reusable across query batches (build once, probe many)."""
    import os

    cents = train_centroids(
        ds,
        num_centroids=num_centroids,
        iters=iters,
        id_column=id_column,
        vec_column=vec_column,
    )
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "centroids.npy"), cents)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cs = ray.get(cents_ref)
        cell = _assign_cells(_matrix(batch, vec_column), cs)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int64()))

    ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(
        os.path.join(path, "cells"), partition_cols=["ivf_cell"]
    )
    return cents


def ivf_topk_indexed(
    index_path: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    query_ids: list[int] | None = None,
) -> pa.Table:
    """IVF ANN over a build_ivf_index layout: compute the probe-cell
    union, read ONLY those hive partitions, exact top-k over them. The
    unprobed partitions never leave storage (I/O pruning is asserted in
    tests via the read_parquet path list)."""
    import os

    cents = np.load(os.path.join(index_path, "centroids.npy"))
    probe = _probe_cells(cents, queries, nprobe)
    # expand probed partitions to their files (a multi-path read_parquet
    # list is taken literally, not dir-expanded)
    files = [
        os.path.join(d, f)
        for c in probe
        if os.path.isdir(
            d := os.path.join(index_path, "cells", f"ivf_cell={c}")
        )
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    ds = ray.data.read_parquet(files, columns=[id_column, vec_column])
    return brute_force_topk(
        ds,
        queries,
        k=k,
        id_column=id_column,
        vec_column=vec_column,
        query_ids=query_ids,
    )


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    query_ids: list[int] | None = None,
) -> pa.Table:
    """Single-pass in-stream IVF approximate top-k (no prebuilt layout):

    1. train the exact-integer coarse quantizer (train_centroids);
    2. broadcast centroids; each batch keeps only vectors whose nearest
       centroid is among the union of every query's `nprobe` closest
       centroids;
    3. exact cosine top-k over the surviving ~nprobe/num_centroids of the
       corpus.

    Every pruning decision (training, assignment, probing) is integer
    math, so the whole approximation is reproduced bit-for-bit by the
    SQL_IVF_TOPK chained-CTE oracle. For repeated query batches over a
    stable corpus, build_ivf_index + ivf_topk_indexed is the scale path:
    it pays the assignment pass once and then reads only the probed
    partitions per query batch, instead of re-scanning (and
    re-assigning) the full corpus every time.
    """
    cents = train_centroids(
        ds,
        num_centroids=num_centroids,
        iters=iters,
        id_column=id_column,
        vec_column=vec_column,
    )
    probe = _probe_cells(cents, queries, nprobe)
    cents_ref = ray.put(cents)
    probe_ref = ray.put(np.array(sorted(probe), dtype=np.int64))

    def probe_filter(batch: pa.Table) -> pa.Table:
        cs = ray.get(cents_ref)
        pr = ray.get(probe_ref)
        nearest = _assign_cells(_matrix(batch, vec_column), cs)
        mask = np.isin(nearest, pr)
        return batch.filter(pa.array(mask))

    filtered = ds.map_batches(
        probe_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    return brute_force_topk(
        filtered,
        queries,
        k=k,
        id_column=id_column,
        vec_column=vec_column,
        query_ids=query_ids,
    )


def embedding_near_dup_pairs_lsh(
    ds: "ray.data.Dataset",
    *,
    threshold: float = 0.95,
    num_planes: int = 3,
    num_tables: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    seed: int = 42,
) -> pa.Table:
    """Scale path for near-dup pairs: MULTI-TABLE random-hyperplane LSH —
    each row lands in `num_tables` blocks (one per table of `num_planes`
    hyperplanes); pairs sharing any block are scored exactly within the
    block. recall ~= 1 - (1 - p^m)^L with p = 1 - theta/pi, so small m +
    several tables covers even moderate thresholds; corpus-wide work
    drops from O(n^2) to sum(block^2). Duplicate detections across tables
    are deduped on the (small) verified result."""
    planes_holder = {}

    def explode_codes(batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch, vec_column))
        if "planes" not in planes_holder:
            planes_holder["planes"] = np.random.RandomState(
                seed
            ).standard_normal((num_tables, num_planes, m.shape[1]))
        pls = planes_holder["planes"]
        pieces = []
        for t in range(num_tables):
            bits = (m @ pls[t].T > 0).astype(np.int64)
            code = (bits * (1 << np.arange(num_planes))).sum(axis=1)
            block = code + (t << num_planes)
            pieces.append(
                batch.append_column(
                    "lsh_block", pa.array(block, pa.int64())
                )
            )
        return pa.concat_tables(pieces)

    coded = ds.map_batches(
        explode_codes, batch_format="pyarrow", zero_copy_batch=True
    )
    raw = embedding_near_dup_pairs(
        coded,
        threshold=threshold,
        id_column=id_column,
        vec_column=vec_column,
        block_column="lsh_block",
    )
    if raw.num_rows == 0:
        return raw
    t = raw.group_by(["a", "b"]).aggregate([])
    idx = pa.compute.sort_indices(
        t, sort_keys=[("a", "ascending"), ("b", "ascending")]
    )
    return t.take(idx)


def embedding_near_dup_pairs_tiled(
    ds: "ray.data.Dataset",
    *,
    threshold: float = 0.95,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    tile_rows: int = 4096,
) -> pa.Table:
    """EXACT all-pairs cosine near-dups, distributed by tiling: the
    corpus materializes as Arrow block refs in the object store, one Ray
    task per block converts it to a normalized (ids, matrix) tile (the
    tile stays in the object store as the task's return), and one Ray
    task per tile pair (i <= j) computes its sims block — O(n^2) total
    work like any exact all-pairs, but spread over B(B+1)/2 parallel
    matmuls with no driver-side matrix. The driver only ever holds
    ObjectRefs and the (bounded) matching pairs: the old form pumped
    every tile through driver-side iter_batches + ray.put — a
    single-point ingest at corpus scale."""
    import math

    import ray as _ray

    n_rows = ds.count()
    if n_rows == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    num_tiles = max(1, math.ceil(n_rows / tile_rows))
    # split-only repartition (no shuffle) bounds each tile's rows, then
    # materialize pins the blocks in the object store
    block_refs = (
        ds.repartition(num_tiles)
        .materialize()
        .to_arrow_refs()
    )

    @_ray.remote
    def prep(tbl: pa.Table):
        ids = np.asarray(tbl.column(id_column).to_pylist(), dtype=np.int64)
        return ids, _normalize(_matrix(tbl, vec_column))

    tiles = [prep.remote(r) for r in block_refs]

    @_ray.remote
    def tile_pairs(ta, tb, same: bool) -> pa.Table:
        ids_a, ma = ta
        ids_b, mb = tb
        if ids_a.size == 0 or ids_b.size == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        sims = ma @ mb.T
        if same:
            ia, ib = np.where(np.triu(sims >= threshold, k=1))
        else:
            ia, ib = np.where(sims >= threshold)
        left, right = ids_a[ia], ids_b[ib]
        a = np.minimum(left, right)
        bb = np.maximum(left, right)
        order = np.lexsort((bb, a))
        return pa.table(
            {
                "a": pa.array(a[order], pa.int64()),
                "b": pa.array(bb[order], pa.int64()),
            }
        )

    futs = []
    for i in range(len(tiles)):
        for j in range(i, len(tiles)):
            futs.append(tile_pairs.remote(tiles[i], tiles[j], i == j))
    parts = _ray.get(futs)
    if not parts:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(parts)
    idx = pa.compute.sort_indices(
        t, sort_keys=[("a", "ascending"), ("b", "ascending")]
    )
    return t.take(idx)


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    *,
    threshold: float = 0.95,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    block_column: str | None = "label",
) -> pa.Table:
    """Pairs (a < b) with cosine >= threshold. Blocked by `block_column`
    (an LSH bucket or class label) so the quadratic pass stays per-block;
    block_column=None delegates to the distributed tiled exact path."""

    def pairs_in_block(group: pa.Table) -> pa.Table:
        ids = np.array(group.column(id_column).to_pylist(), dtype=np.int64)
        m = _normalize(_matrix(group, vec_column))
        sims = m @ m.T
        ia, ib = np.where(np.triu(sims >= threshold, k=1))
        order = np.lexsort((ids[ib], ids[ia]))
        a = np.minimum(ids[ia], ids[ib])[order]
        b = np.maximum(ids[ia], ids[ib])[order]
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )

    if block_column is None:
        return embedding_near_dup_pairs_tiled(
            ds,
            threshold=threshold,
            id_column=id_column,
            vec_column=vec_column,
        )
    out = ds.groupby(block_column).map_groups(
        pairs_in_block, batch_format="pyarrow"
    )
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )

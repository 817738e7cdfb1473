"""Distributed k-means over an embedding column.

The reference has no clustering; this is training-data-pipeline surface
(the same centroid machinery that backs IVF partitioning, embedding
dedup bucketing and stratified corpus analyses) built Ray-Data-first:

- assignment is one vectorized (n, k) integer distance computation per
  batch against broadcast centroids (`ray.put` once per iteration,
  `ray.get` zero-copy in every task);
- the centroid update folds (k, d) per-batch partial sums + counts —
  the driver only ever holds O(k*d) integers, never rows;
- every pass is a streaming `map_batches` over the (column-pruned)
  input; nothing is materialized driver-side at any scale.

All arithmetic is EXACT so a DuckDB oracle reproduces the clustering
bit-for-bit: vectors are floor-quantized to a 2^20 integer grid
(float64 products are exact for these magnitudes, and floor avoids the
numpy half-to-even vs SQL half-away rounding split), distances are
int64, ties pick the lowest centroid id (np.argmin == row_number ORDER
BY dist, cluster), and the mean update is floor(sum/count) with sums
far below 2^53.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUANT = 1 << 20  # quantization grid: floor(x * 2^20)


def quantized_matrix(batch: pa.Table, vec_column: str) -> np.ndarray:
    """(n, d) int64 matrix of floor-quantized vectors (zero-copy list
    flatten, one vectorized floor)."""
    arr = batch.column(vec_column).combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.int64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if flat.size % n:
        raise ValueError("ragged embedding column")
    d = flat.size // n
    return np.floor(flat * QUANT).astype(np.int64).reshape(n, d)


def _init_centroids(
    ds, *, k: int, id_column: str, vec_column: str
) -> np.ndarray:
    """Centroids = the k lowest-id vectors (deterministic, order-free).
    Per-block top-k trim before anything reaches the driver."""

    def partial(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[(id_column, "ascending")]
        )
        return b.take(idx).slice(0, k).select([id_column, vec_column])

    best: list[tuple[int, np.ndarray]] = []
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=4 * k):
        ids = b.column(id_column).to_pylist()
        M = quantized_matrix(b, vec_column)
        best.extend(zip(ids, M))
        best.sort(key=lambda p: p[0])
        del best[k:]
    if len(best) < k:
        raise ValueError(f"need >= {k} vectors to init {k} centroids")
    return np.stack([m for _, m in best])


def kmeans_centroids(
    ds,
    *,
    k: int = 4,
    iters: int = 2,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> np.ndarray:
    """Exact-integer Lloyd centroids: k-lowest-id init, `iters` exact
    update steps (each a streaming distributed partial-sum fold — the
    driver only ever holds the O(k*d) integer centroid matrix). Shared
    by kmeans_assign and the IVF coarse quantizer, so both stay
    bit-reproducible in the DuckDB chained-CTE oracle."""
    C = _init_centroids(
        ds, k=k, id_column=id_column, vec_column=vec_column
    )

    for _ in range(iters):
        import ray

        cent_ref = ray.put(C)

        def partials(b: pa.Table) -> pa.Table:
            M = quantized_matrix(b, vec_column)
            cc = ray.get(cent_ref)
            if M.shape[0] == 0:
                sums = np.zeros((k, cc.shape[1]), dtype=np.int64)
                counts = np.zeros(k, dtype=np.int64)
            else:
                d2 = (
                    (M * M).sum(1)[:, None]
                    + (cc * cc).sum(1)[None, :]
                    - 2 * (M @ cc.T)
                )
                a = np.argmin(d2, axis=1)
                sums = np.zeros((k, M.shape[1]), dtype=np.int64)
                for j in range(k):
                    sel = M[a == j]
                    if sel.size:
                        sums[j] = sel.sum(axis=0)
                counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "cnt": pa.array(counts),
                    "vsum": pa.array(sums.tolist(), pa.list_(pa.int64())),
                }
            )

        tot_counts = np.zeros(k, dtype=np.int64)
        tot_sums = np.zeros_like(C)
        for b in ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=4096):
            # one iter-batch stacks partials from MANY map tasks:
            # scatter-add by the cluster column, never assume k rows
            cl = b.column("cluster").to_numpy(zero_copy_only=False)
            np.add.at(
                tot_counts, cl, b.column("cnt").to_numpy(zero_copy_only=False)
            )
            np.add.at(
                tot_sums,
                cl,
                np.asarray(b.column("vsum").to_pylist(), dtype=np.int64),
            )
        nonempty = tot_counts > 0
        # exact floor(sum/count): int64 // floors like SQL floor(s/n)
        C = C.copy()
        C[nonempty] = tot_sums[nonempty] // tot_counts[nonempty, None]

    return C


def kmeans_assign(
    ds,
    *,
    k: int = 4,
    iters: int = 2,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    passthrough: tuple = (),
):
    """Lloyd's k-means, `iters` exact integer update steps, then a final
    assignment pass. Returns a Dataset of (id_column, *passthrough,
    cluster) — passthrough columns ride along the final map so callers
    never need a post-hoc join back to the input. Empty clusters keep
    their previous centroid (the oracle mirrors this with a LEFT JOIN +
    COALESCE)."""
    import ray

    # init/update passes re-execute the (lazy) input per scan: prune to
    # the two needed columns so passthrough columns are only read by the
    # final assignment pass that emits them
    core = (
        ds.select_columns([id_column, vec_column]) if passthrough else ds
    )
    C = kmeans_centroids(
        core, k=k, iters=iters, id_column=id_column, vec_column=vec_column
    )

    final_ref = ray.put(C)

    def assign(b: pa.Table) -> pa.Table:
        M = quantized_matrix(b, vec_column)
        cc = ray.get(final_ref)
        if M.shape[0] == 0:
            a = np.empty(0, dtype=np.int64)
        else:
            d2 = (
                (M * M).sum(1)[:, None]
                + (cc * cc).sum(1)[None, :]
                - 2 * (M @ cc.T)
            )
            a = np.argmin(d2, axis=1).astype(np.int64)
        cols = {id_column: b.column(id_column)}
        for c in passthrough:
            cols[c] = b.column(c)
        cols["cluster"] = pa.array(a)
        return pa.table(cols)

    return ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )

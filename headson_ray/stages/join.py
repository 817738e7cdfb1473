"""Distributed joins for fact-fact shapes (both sides too big to
broadcast): hash-partitioned cogroup join on Ray Data primitives.

Mechanics: tag each side, union the (projected!) key+payload streams,
shuffle once on a COARSE key bucket (hash(key) % NUM_JOIN_BUCKETS — a
per-key groupby would pay one python map_groups call per key), then run
an Acero hash join (pyarrow Table.join, C++) inside each bucket.

Skew note: a hot join key lands in one bucket; pass `salt=S` when one
key's rows exceed a bucket budget — the left (big/skewed) side spreads
each key over S sub-buckets and the right side is replicated S times, so
the hot key's work parallelizes S-ways at the cost of S x the (smaller)
right side's shuffle volume.

Ray Data (2.49) has no native join; this is the documented composition
(SURVEY.md §2.8). Broadcast joins for dimension-sized sides live in
pipelines/queries.py (_broadcast_lookup).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

NUM_JOIN_BUCKETS = 256


def _bucket_of(col: pa.ChunkedArray) -> pa.Array:
    if pa.types.is_integer(col.type):
        return pc.cast(
            pc.bit_wise_and(pc.cast(col, pa.int64()), NUM_JOIN_BUCKETS - 1),
            pa.int32(),
        )
    # string keys: one vectorized numpy hashing pass per batch
    # (stages/hashing.py), not a per-row python crc32 loop
    from .hashing import hash_strings

    import numpy as np

    h = hash_strings([str(v) for v in col.to_pylist()])
    return pa.array(
        (h % np.uint64(NUM_JOIN_BUCKETS)).astype(np.int32), pa.int32()
    )


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    key: str,
    how: str = "inner",
    salt: int = 1,
    bucket_post=None,
) -> "ray.data.Dataset":
    """Join two Datasets on an equality key.

    Columns other than `key` must be disjoint between sides (project
    before joining — also keeps the shuffle narrow).
    how: "inner" | "left outer" (Acero join types).
    salt: hot-key spreading factor. Left rows scatter round-robin over
    `salt` sub-buckets per key; right rows replicate into every
    sub-bucket, so results are identical to the unsalted join while a
    single hot key's probe work runs `salt`-way parallel.
    bucket_post: optional pa.Table -> pa.Table applied to each joined
    bucket IN PLACE of the deterministic sort. A bucket holds every row
    of its keys (salt=1), so per-key aggregation / top-k trimming can
    COMPLETE inside it — no second shuffle over high-cardinality keys.
    Incompatible with salt>1 (a salted key spans sub-buckets).
    """
    if bucket_post is not None and salt > 1:
        raise ValueError("bucket_post requires salt=1 (key co-location)")
    lsch = left.schema()
    rsch = right.schema()
    if lsch is None or rsch is None:
        # A side was empty with no recoverable schema (e.g. map_batches
        # over an empty read). The inner join is empty by definition;
        # emit a zero-column empty dataset — callers' empty guards
        # supply the typed output schema.
        if how == "inner":
            return ray.data.from_arrow(pa.table({}))
        raise ValueError(
            "outer hash_join needs a known schema on both sides"
        )
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    lcols = [c for c in lsch.names if c != key]
    rcols = [c for c in rsch.names if c != key]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")

    # one unified schema: key, bucket, side, left payload, right payload
    import numpy as np

    def widen(side: int):
        def fn(b: pa.Table) -> pa.Table:
            if side == 1 and salt > 1:
                # replicate the right side into every salt sub-bucket
                b = pa.concat_tables([b] * salt)
            cols = {
                key: b.column(key),
                "__bucket": _bucket_of(b.column(key)),
                "__side": pa.array([side] * b.num_rows, pa.int8()),
            }
            if salt > 1:
                n = b.num_rows
                if side == 0:
                    # round-robin scatter of the (skewed) left rows
                    s = np.arange(n, dtype=np.int64) % salt
                else:
                    rep = n // salt
                    s = np.repeat(np.arange(salt, dtype=np.int64), rep)
                base = cols["__bucket"].cast(pa.int64())
                cols["__bucket"] = pa.compute.cast(
                    pa.compute.add(
                        pa.compute.multiply(base, salt), pa.array(s)
                    ),
                    pa.int32(),
                )
            for c in lcols:
                cols[c] = (
                    b.column(c)
                    if side == 0
                    else pa.nulls(b.num_rows, ltypes[c])
                )
            for c in rcols:
                cols[c] = (
                    b.column(c)
                    if side == 1
                    else pa.nulls(b.num_rows, rtypes[c])
                )
            return pa.table(cols)

        return fn

    lt = left.map_batches(widen(0), batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.map_batches(widen(1), batch_format="pyarrow",
                           zero_copy_batch=True)
    unioned = lt.union(rt)

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        lmask = pc.equal(side, 0)
        lrows = group.filter(lmask).select([key] + lcols)
        rrows = group.filter(pc.invert(lmask)).select([key] + rcols)
        joined = lrows.join(
            rrows, keys=[key], join_type=how, use_threads=False
        )
        if bucket_post is not None:
            return bucket_post(joined)
        # deterministic output order within the bucket
        sort_keys = [(key, "ascending")] + [
            (c, "ascending")
            for c in joined.column_names
            if c != key and not pa.types.is_nested(joined.schema.field(c).type)
        ]
        return joined.take(pc.sort_indices(joined, sort_keys=sort_keys))

    return unioned.groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def banded_interval_count(
    ds: "ray.data.Dataset",
    *,
    ts_col: str,
    id_col: str,
    width_us: int,
    band_us: int | None = None,
    out_col: str = "n_concurrent",
) -> "ray.data.Dataset":
    """Self interval-range join, count form: for every row, how many
    OTHER rows have |ts2 - ts1| <= width_us. The range-join sibling of
    hash_join for predicates with NO equality key (pure interval
    overlap) — the shape Ray Data's groupby cannot express directly.

    Banding: time splits into bands of band_us (>= width_us, default
    equal). Each row probes in its own band; a 3x-replicated narrow
    (ts-only) build stream covers bands t//B-1 .. t//B+1, so every
    probe's [t-W, t+W] window is fully present in its band and each
    build lands in a given band exactly once — counts are exact with
    no dedup pass. ONE groupby shuffle; the probe side carries only
    (id, ts) and the build side only ts, so replication cost is 3x a
    single int64 column regardless of input width. Per-band resolution
    is a vectorized sort + two searchsorted calls. A bursty interval
    (hot band) parallelizes by lowering band_us — bands have no
    cross-band state.

    Rows with null ts are dropped from both sides (mirror the oracle
    with WHERE ts IS NOT NULL on both join legs)."""
    import numpy as np

    if band_us is None:
        band_us = width_us
    if band_us < width_us:
        raise ValueError("band_us must be >= width_us (window coverage)")
    w = int(width_us)
    bu = int(band_us)

    def explode(b: pa.Table) -> pa.Table:
        t = b.column(ts_col)
        if pa.types.is_timestamp(t.type):
            t = pc.cast(t, pa.int64())
        valid = pc.is_valid(t)
        ts = pc.cast(t, pa.int64()).filter(valid).to_numpy(
            zero_copy_only=False
        )
        ids = b.column(id_col).filter(valid).to_numpy(zero_copy_only=False)
        band = ts // bu
        # probe rows: side=0, own band only
        p_band = band
        # build rows: side=1, replicated into band-1, band, band+1
        b_band = np.concatenate([band - 1, band, band + 1])
        b_ts = np.concatenate([ts, ts, ts])
        return pa.table(
            {
                "band": pa.array(np.concatenate([p_band, b_band])),
                "side": pa.array(
                    np.concatenate(
                        [
                            np.zeros(ts.size, dtype=np.int8),
                            np.ones(b_ts.size, dtype=np.int8),
                        ]
                    )
                ),
                "ts": pa.array(np.concatenate([ts, b_ts])),
                "id": pa.array(
                    np.concatenate(
                        [ids, np.zeros(b_ts.size, dtype=np.int64)]
                    )
                ),
            }
        )

    def resolve(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        p = side == 0
        if not p.any():
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.int64()),
                }
            )
        build = np.sort(ts[~p])
        pt = ts[p]
        hi = np.searchsorted(build, pt + w, side="right")
        lo = np.searchsorted(build, pt - w, side="left")
        # each probe's own build replica lands in this band exactly once
        n = (hi - lo - 1).astype(np.int64)
        return pa.table(
            {
                id_col: g.column("id").filter(pa.array(p)),
                out_col: pa.array(n),
            }
        )

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    return exploded.groupby("band").map_groups(
        resolve, batch_format="pyarrow"
    )

"""Streaming sketches for corpus statistics: mergeable Misra-Gries heavy
hitters with an exact second pass.

Scale design (100 TB): pass 1 runs one bounded-size Misra-Gries summary
per BATCH inside map_batches (the corpus text never leaves the workers;
each batch ships only <= capacity (token, count) rows). The driver merges
the per-batch summaries (mergeable-summary property: sum counts, then
subtract the (capacity+1)-th largest and drop <= 0) into one candidate
set with the standard guarantee: every token with global frequency
> N / (capacity + 1) survives. Pass 2 broadcasts the candidate tokens and
computes EXACT counts with a vectorized np.isin filter + two-phase
groupby, so the reported top-k is exact whenever the true k-th count
clears the guarantee threshold (asserted; raise capacity otherwise)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray
import ray.data


def misra_gries_trim(counter: Counter, capacity: int) -> Counter:
    """Trim a counter to <= capacity keys, Misra-Gries style (subtract the
    (capacity+1)-th largest count from everything, drop <= 0). Equivalent
    to pairwise decrements; keeps the summary mergeable."""
    if len(counter) <= capacity:
        return counter
    counts = sorted(counter.values(), reverse=True)
    dec = counts[capacity]
    return Counter(
        {t: c - dec for t, c in counter.items() if c - dec > 0}
    )


def heavy_hitter_tokens(
    ds: "ray.data.Dataset",
    *,
    text_column: str = "text",
    k: int = 20,
    capacity: int = 4096,
) -> pa.Table:
    """Exact top-k whitespace tokens by document-stream frequency via the
    two-pass sketch. Returns (token, n) ordered by (n desc, token asc)."""

    def batch_sketch(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column(text_column).to_pylist():
            c.update((t or "").split())
        n_tokens = sum(c.values())
        c = misra_gries_trim(c, capacity)
        toks = sorted(c)
        # first row carries the batch's true token total (needed for the
        # guarantee check); a null-token row if the trim emptied the sketch
        if toks:
            totals = [n_tokens] + [0] * (len(toks) - 1)
            token_arr = pa.array(toks, pa.string())
            cnt_arr = pa.array([c[t] for t in toks], pa.int64())
        else:
            totals = [n_tokens]
            token_arr = pa.array([None], pa.string())
            cnt_arr = pa.array([0], pa.int64())
        return pa.table(
            {
                "token": token_arr,
                "cnt": cnt_arr,
                "batch_total": pa.array(totals, pa.int64()),
            }
        )

    sketches = ds.map_batches(
        batch_sketch, batch_format="pyarrow", zero_copy_batch=True
    )
    merged: Counter = Counter()
    total_tokens = 0
    for b in sketches.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        for t, c in zip(
            b.column("token").to_pylist(), b.column("cnt").to_pylist()
        ):
            if t is not None and c > 0:
                merged[t] += c
        total_tokens += sum(b.column("batch_total").to_pylist())
        merged = misra_gries_trim(merged, capacity)

    cand = np.array(sorted(merged), dtype=object)
    cand_ref = ray.put(cand)

    def exact_count(b: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        c: Counter = Counter()
        for t in b.column(text_column).to_pylist():
            toks = np.array((t or "").split(), dtype=object)
            if toks.size:
                hits = toks[np.isin(toks, wanted)]
                c.update(hits.tolist())
        toks = sorted(c)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "n": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    partials = ds.map_batches(
        exact_count, batch_format="pyarrow", zero_copy_batch=True
    )
    from ray.data.aggregate import Sum

    agg = partials.groupby("token").aggregate(Sum("n", alias_name="n"))
    t = pa.concat_tables(
        agg.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )
    idx = pa.compute.sort_indices(
        t, sort_keys=[("n", "descending"), ("token", "ascending")]
    )
    top = t.take(idx).slice(0, k)
    # exactness guarantee: the k-th exact count must clear the sketch's
    # miss threshold, else a more frequent token could have been dropped
    if top.num_rows == k and total_tokens:
        kth = top.column("n")[k - 1].as_py()
        assert kth > total_tokens / (capacity + 1), (
            f"heavy-hitter guarantee violated: raise capacity "
            f"(kth={kth}, N/(C+1)={total_tokens / (capacity + 1):.1f})"
        )
    return top

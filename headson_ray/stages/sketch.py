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


def rank_select(
    ds: "ray.data.Dataset",
    column: str,
    ranks: list,
    *,
    num_bins: int = 1024,
    collect_cap: int = 262_144,
    return_resolved_ranks: bool = False,
) -> "list[float] | tuple[list[int], list[float]]":
    """EXACT k-th smallest values (0-based ranks) of a numeric column
    WITHOUT a global sort: iterative histogram refinement.

    Scale design: quantiles via ds.sort() are an all-to-all shuffle of
    the whole column; this instead runs a few histogram passes (each a
    map_batches partial-count + tiny driver merge — no shuffle at all).
    Each round narrows the value range holding each rank by ~num_bins x;
    once every rank's candidate range holds <= collect_cap values they
    are collected and selected exactly. log_bins(n) rounds: 10^12 rows
    resolve in <= 4 passes at 1024 bins."""
    import ray as _ray

    # pass 0: global min/max + count (single aggregate pass)
    def minmax(b: pa.Table) -> pa.Table:
        col = pa.compute.cast(b.column(column), pa.float64())
        if len(col) == 0 or col.null_count == len(col):
            return pa.table(
                {
                    "lo": pa.array([], pa.float64()),
                    "hi": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "lo": pa.array([pa.compute.min(col).as_py()], pa.float64()),
                "hi": pa.array([pa.compute.max(col).as_py()], pa.float64()),
                "n": pa.array([len(col) - col.null_count], pa.int64()),
            }
        )

    parts = list(
        ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )
    los = [v for p in parts for v in p.column("lo").to_pylist()]
    his = [v for p in parts for v in p.column("hi").to_pylist()]
    total = sum(v for p in parts for v in p.column("n").to_pylist())
    if not los:
        raise ValueError("rank_select on an empty column")
    # a rank may be a callable n -> rank, resolved against the NON-NULL
    # total from this pass (callers deriving ranks from ds.count() would
    # silently include null rows and select the wrong order statistic)
    ranks = [k(total) if callable(k) else k for k in ranks]
    for k in ranks:
        if not 0 <= k < total:
            raise ValueError(f"rank {k} out of range [0, {total})")

    results: dict[int, float] = {}
    # (lo, hi, rank-within-range, count-in-range) per unresolved rank;
    # ranges with few enough values resolve by exact collection
    pending = {k: (min(los), max(his), k, total) for k in ranks}
    while pending:
        # group ranks sharing a range to share one histogram pass
        by_range: dict[tuple, list[int]] = {}
        for k, (lo, hi, r, cnt) in pending.items():
            by_range.setdefault((lo, hi), []).append(k)
        (lo, hi), ks = next(iter(by_range.items()))
        if (
            pending[ks[0]][3] <= collect_cap
            or not (hi > lo)
        ):
            # exact endgame: collect the narrowed range once, sort locally
            def in_range(b: pa.Table) -> pa.Table:
                col = pa.compute.cast(b.column(column), pa.float64())
                mask = pa.compute.and_(
                    pa.compute.greater_equal(col, lo),
                    pa.compute.less_equal(col, hi),
                )
                return pa.table(
                    {"v": pa.compute.filter(col, pa.compute.fill_null(mask, False))}
                )

            vals = np.sort(
                np.concatenate(
                    [
                        b.column("v").to_numpy(zero_copy_only=False)
                        for b in ds.map_batches(
                            in_range, batch_format="pyarrow",
                            zero_copy_batch=True,
                        ).iter_batches(
                            batch_format="pyarrow", batch_size=1 << 20
                        )
                    ]
                    or [np.empty(0)]
                )
            )
            for k in ks:
                results[k] = float(vals[pending[k][2]])
                del pending[k]
            continue
        edges = np.linspace(lo, hi, num_bins + 1)
        edges_ref = _ray.put(edges)

        def hist(b: pa.Table) -> pa.Table:
            e = _ray.get(edges_ref)
            col = pa.compute.cast(b.column(column), pa.float64())
            v = col.to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            v = v[(v >= e[0]) & (v <= e[-1])]
            counts, _ = np.histogram(v, bins=e)
            return pa.table(
                {
                    "bin": pa.array(np.arange(len(counts)), pa.int64()),
                    "c": pa.array(counts, pa.int64()),
                }
            )

        agg = np.zeros(num_bins, dtype=np.int64)
        for b in ds.map_batches(
            hist, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            np.add.at(
                agg,
                b.column("bin").to_numpy(zero_copy_only=False),
                b.column("c").to_numpy(zero_copy_only=False),
            )
        cum = np.concatenate(([0], np.cumsum(agg)))
        for k in ks:
            _, _, r, _ = pending[k]
            b_idx = int(np.searchsorted(cum, r, side="right") - 1)
            b_idx = min(b_idx, num_bins - 1)
            new_lo, new_hi = float(edges[b_idx]), float(edges[b_idx + 1])
            pending[k] = (
                new_lo,
                new_hi,
                r - int(cum[b_idx]),
                int(agg[b_idx]),
            )
    vals = [results[k] for k in ranks]
    if return_resolved_ranks:
        return ranks, vals
    return vals


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
        n_distinct = len(c)
        c = misra_gries_trim(c, capacity)
        toks = sorted(c)
        # first row carries the batch's true token total + whether the
        # trim dropped anything (needed for the guarantee checks); a
        # null-token row if the trim emptied the sketch
        if toks:
            totals = [n_tokens] + [0] * (len(toks) - 1)
            trims = [int(n_distinct > capacity)] + [0] * (len(toks) - 1)
            token_arr = pa.array(toks, pa.string())
            cnt_arr = pa.array([c[t] for t in toks], pa.int64())
        else:
            totals = [n_tokens]
            trims = [int(n_distinct > capacity)]
            token_arr = pa.array([None], pa.string())
            cnt_arr = pa.array([0], pa.int64())
        return pa.table(
            {
                "token": token_arr,
                "cnt": cnt_arr,
                "batch_total": pa.array(totals, pa.int64()),
                "batch_trimmed": pa.array(trims, pa.int64()),
            }
        )

    sketches = ds.map_batches(
        batch_sketch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # DISTRIBUTED sketch merge: summing per-batch MG summaries and then
    # trimming once is a valid mergeable-summary merge (total undercount
    # of any token <= sum of per-batch N_i/(C+1) = N/(C+1)), and the
    # single trim only keeps tokens whose summed count exceeds the
    # (C+1)-th largest — i.e. the top C+1 rows of a distributed groupby
    # + sort. The driver only ever sees <= C+1 candidate rows, not the
    # O(batches x capacity) union the old Counter merge held.
    total_tokens = int(sketches.sum("batch_total") or 0)
    any_trimmed = bool(sketches.sum("batch_trimmed") or 0)
    from ray.data.aggregate import Sum

    def drop_markers(b: pa.Table) -> pa.Table:
        mask = pa.compute.and_(
            pa.compute.is_valid(b.column("token")),
            pa.compute.greater(b.column("cnt"), 0),
        )
        return b.filter(mask).select(["token", "cnt"])

    summed = (
        sketches.map_batches(
            drop_markers, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="c"))
        .sort(["c", "token"], descending=[True, False])
        .limit(capacity + 1)
    )
    rows = [
        r
        for b in summed.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    merged: Counter = Counter()
    if rows:
        dec = rows[-1]["c"] if len(rows) == capacity + 1 else 0
        any_trimmed = any_trimmed or dec > 0
        for r in rows:
            if r["c"] - dec > 0:
                merged[r["token"]] = r["c"] - dec
    if len(merged) < k and any_trimmed and total_tokens:
        # near-uniform distribution: trimming may have dropped tokens as
        # frequent as the survivors, so a short candidate list cannot
        # certify an exact top-k
        raise ValueError(
            f"heavy-hitter guarantee violated: only {len(merged)} "
            f"candidates survived trimming for top-{k}; raise capacity"
        )

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
    parts = list(
        agg.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )
    if not parts:
        return pa.table(
            {"token": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(parts)
    idx = pa.compute.sort_indices(
        t, sort_keys=[("n", "descending"), ("token", "ascending")]
    )
    top = t.take(idx).slice(0, k)
    # exactness guarantee: the k-th exact count must clear the sketch's
    # miss threshold, else a more frequent token could have been dropped.
    # A real exception (not assert — `python -O` would silence the
    # documented exactness gate). Gated on any_trimmed ALONE: when no
    # per-batch trim occurred and the merge kept the full union, the
    # candidate set is provably complete and the two-pass result is
    # exact regardless of the kth-count threshold (a skewed corpus with
    # few distinct tokens would otherwise raise spuriously).
    if total_tokens and any_trimmed:
        kth = (
            top.column("n")[top.num_rows - 1].as_py()
            if top.num_rows
            else 0
        )
        if kth <= total_tokens / (capacity + 1):
            raise ValueError(
                f"heavy-hitter guarantee violated: raise capacity "
                f"(kth={kth}, N/(C+1)={total_tokens / (capacity + 1):.1f})"
            )
    return top


def grouped_rank_select(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    quantiles: "list[tuple[str, float]]",
    *,
    num_bins: int = 512,
    collect_cap: int = 65_536,
    force_stall_rounds: int = 0,
    stall_distinct_cap: int = 4096,
) -> pa.Table:
    """EXACT per-group discrete quantiles of a numeric column WITHOUT a
    sort and WITHOUT assuming a group's values fit in memory: the
    grouped generalization of rank_select's histogram refinement.

    quantiles: (label, q) pairs; each selects the 0-based order
    statistic k = ceil(q*n_g) - 1 within its group (the smallest value
    whose rank fraction is >= q — DuckDB row_number()-reproducible).
    Returns a pa.Table (group_col, q, value) with one row per
    (non-empty group) x quantile.

    Scale design: groupby(g).map_groups + sort would require one
    group's values in one task (fatal for skewed groups); ds.sort() is
    an all-to-all shuffle. Here every pass is a map_batches
    partial-count + driver merge — no shuffle. Per round, each
    unresolved (group, quantile) narrows its candidate range ~num_bins
    x; ranges holding <= collect_cap values resolve by exact
    collection. Binning uses exact edge comparisons (a vectorized
    arithmetic guess corrected against the stored edge values), so
    cross-round counts are consistent like np.histogram's.

    Driver state: O(#groups x num_bins) counters per quantile per
    round (stats, never values). At >~10^5 groups shard the group
    domain or lower num_bins.
    """
    import ray as _ray

    if not quantiles:
        raise ValueError("no quantiles requested")
    for _, q in quantiles:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile {q} outside (0, 1]")

    # pass 0: per-group (lo, hi, n) — partial group_by per batch, small
    # Ray groupby merge, driver collects one row per group
    def stat_partial(b: pa.Table) -> pa.Table:
        col = pa.compute.cast(b.column(value_col), pa.float64())
        t = pa.table({"g": b.column(group_col), "v": col}).filter(
            pa.compute.and_(
                pa.compute.is_valid(col),
                pa.compute.is_finite(pa.compute.fill_null(col, 0.0)),
            )
        )
        g = t.group_by(["g"]).aggregate(
            [("v", "min"), ("v", "max"), ("v", "count")]
        )
        return g.rename_columns(["g", "lo", "hi", "n"])

    from ray.data.aggregate import Max, Min, Sum

    stats = (
        ds.map_batches(
            stat_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("g")
        .aggregate(
            Min("lo", alias_name="lo"),
            Max("hi", alias_name="hi"),
            Sum("n", alias_name="n"),
        )
    )
    groups: list = []
    g_stats: dict = {}
    for b in stats.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            groups.append(r["g"])
            g_stats[r["g"]] = (float(r["lo"]), float(r["hi"]), int(r["n"]))
    groups.sort()

    # per (group, label): [lo, hi, r_rel, cnt]
    pending: dict = {}
    results: dict = {}
    for g in groups:
        lo, hi, n = g_stats[g]
        for label, q in quantiles:
            k = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
            pending[(g, label)] = [lo, hi, k, n]

    def _resolve_degenerate() -> None:
        for key in [k for k, (lo, hi, _, _) in pending.items() if hi <= lo]:
            results[key] = pending[key][0]
            del pending[key]

    _resolve_degenerate()
    labels = [lab for lab, _ in quantiles]
    g_order = {g: i for i, g in enumerate(groups)}

    def run_round_multi(entry_lists):
        """ONE distributed pass over several slot blocks (one block per
        quantile label when ranges diverge): each block is a list of
        (group, state) entries occupying a contiguous global-slot
        range. Big slots get histogrammed, small slots (cnt <=
        collect_cap) get their in-range values collected exactly.
        Returns (small mask, hist array, collected values per slot)
        over the GLOBAL slot space — the table is scanned once no
        matter how many labels are in flight."""
        blocks = []
        base = 0
        small_parts = []
        for entries in entry_lists:
            lo_arr = np.array([st[0] for _, st in entries])
            hi_arr = np.array([st[1] for _, st in entries])
            # hi/n - lo/n, not (hi-lo)/n: a group spanning +/-1.7e308
            # overflows hi-lo to inf, and an inf step NaN-poisons the
            # refined bounds (0*inf) into an infinite refinement loop.
            # Must match apply_update's edge formula exactly.
            step_arr = hi_arr / num_bins - lo_arr / num_bins
            small_blk = np.array(
                [st[3] <= collect_cap for _, st in entries], dtype=bool
            )
            blocks.append(
                (
                    pa.array([g for g, _ in entries]),
                    lo_arr,
                    hi_arr,
                    step_arr,
                    small_blk,
                    base,
                )
            )
            small_parts.append(small_blk)
            base += len(entries)
        total_slots = base
        small = np.concatenate(small_parts)
        refs = _ray.put(blocks)

        def scan(b: pa.Table) -> pa.Table:
            blks = _ray.get(refs)
            col = pa.compute.cast(b.column(value_col), pa.float64())
            v_all = col.to_numpy(zero_copy_only=False)
            kinds, keys, cs, vs = [], [], [], []
            for ga, lo_a, hi_a, st_a, sm, blk_base in blks:
                idx = pa.compute.index_in(
                    b.column(group_col), value_set=ga
                )
                sl = idx.to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                ok = ~np.isnan(sl) & ~np.isnan(v_all)
                sl_i = sl[ok].astype(np.int64)
                vv = v_all[ok]
                lo = lo_a[sl_i]
                hi = hi_a[sl_i]
                inr = (vv >= lo) & (vv <= hi)
                sl_i, vv, lo = sl_i[inr], vv[inr], lo[inr]
                step = st_a[sl_i]
                smv = sm[sl_i]
                # exact collection rows for small slots
                col_sl = sl_i[smv] + blk_base
                col_v = vv[smv]
                # histogram rows for big slots: arithmetic bin guess,
                # then exact correction against edge(s, j) = lo +
                # j*step so cross-round bin membership is
                # FP-consistent
                hb_sl = sl_i[~smv]
                hb_v = vv[~smv]
                hb_lo = lo[~smv]
                hb_step = step[~smv]
                with np.errstate(invalid="ignore", divide="ignore"):
                    j = np.floor((hb_v - hb_lo) / hb_step).astype(
                        np.int64
                    )
                j = np.clip(j, 0, num_bins - 1)
                for _ in range(2):
                    edge_j = hb_lo + j * hb_step
                    j = np.where((hb_v < edge_j) & (j > 0), j - 1, j)
                    edge_j1 = hb_lo + (j + 1) * hb_step
                    too_high = (hb_v >= edge_j1) & (j < num_bins - 1)
                    j = np.where(too_high, j + 1, j)
                # bincount over LOCAL slot keys (global offset added to
                # the sparse output) — offsetting before bincount would
                # allocate/scan every earlier block's slot space per
                # batch per block
                key = hb_sl * num_bins + j
                counts = np.bincount(key)
                nz = np.nonzero(counts)[0]
                kinds.append(np.zeros(len(nz), np.int64))
                keys.append(nz + blk_base * num_bins)
                cs.append(counts[nz])
                vs.append(np.zeros(len(nz)))
                kinds.append(np.ones(len(col_sl), np.int64))
                keys.append(col_sl)
                cs.append(np.zeros(len(col_sl), np.int64))
                vs.append(col_v)
            return pa.table(
                {
                    "kind": pa.array(
                        np.concatenate(kinds), pa.int64()
                    ),
                    "key": pa.array(np.concatenate(keys), pa.int64()),
                    "c": pa.array(np.concatenate(cs), pa.int64()),
                    "v": pa.array(np.concatenate(vs), pa.float64()),
                }
            )

        hist = np.zeros(total_slots * num_bins, dtype=np.int64)
        collected: dict = {}
        for b in ds.map_batches(
            scan, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            kind = b.column("kind").to_numpy(zero_copy_only=False)
            keys = b.column("key").to_numpy(zero_copy_only=False)
            cs = b.column("c").to_numpy(zero_copy_only=False)
            vs = b.column("v").to_numpy(zero_copy_only=False)
            hsel = kind == 0
            np.add.at(hist, keys[hsel], cs[hsel])
            for s, val in zip(keys[~hsel], vs[~hsel]):
                collected.setdefault(int(s), []).append(float(val))
        return small, hist, collected

    def apply_update(keyp, st, si, small, hist, collected) -> bool:
        """Resolve or refine one pending (group, label) from a round's
        scan of slot si; returns True if state changed."""
        lo, hi, r, cnt = st
        if small[si]:
            vals = np.sort(np.array(collected.get(si, [])))
            if r >= len(vals):
                raise AssertionError(
                    f"grouped_rank_select: rank {r} outside collected "
                    f"range ({len(vals)} values) for group {keyp[0]!r}"
                )
            results[keyp] = float(vals[r])
            del pending[keyp]
            return True
        seg = hist[si * num_bins : (si + 1) * num_bins]
        cum = np.concatenate(([0], np.cumsum(seg)))
        b_idx = int(np.searchsorted(cum, r, side="right") - 1)
        b_idx = min(max(b_idx, 0), num_bins - 1)
        step = hi / num_bins - lo / num_bins  # matches run_round_multi
        new_lo = lo + b_idx * step
        new_hi = hi if b_idx == num_bins - 1 else lo + (b_idx + 1) * step
        if not (np.isfinite(new_lo) and np.isfinite(new_hi)):
            # belt-and-braces: never let a non-finite bound into the
            # state (it would never match any row again); report no
            # progress so the stall resolver takes over
            return False
        pending[keyp] = [new_lo, new_hi, r - int(cum[b_idx]), int(seg[b_idx])]
        return (new_lo, new_hi) != (lo, hi)

    def _resolve_stalled_exact() -> None:
        """Ranges stopped shrinking: that only happens when a range's
        bin step underflows (lo + step == lo), i.e. [lo, hi] is a few
        float ulps wide and holds only a handful of REPRESENTABLE
        doubles — however many ROWS carry them. Resolve every stuck
        (group, label) by counting DISTINCT in-range values per slot:
        driver memory is O(stall_distinct_cap), never O(rows) and never
        O(distinct) either — if a slot exceeds the cap mid-pass its
        largest keys are evicted (counts below the smallest-ever-evicted
        key stay exact because only the largest keys are dropped), the
        exact prefix is consumed from the rank, and the slot rescans the
        remaining [floor, hi] range. Bounded chunks instead of the old
        hard AssertionError: a cap-violating stall degrades to more
        passes, not a failure."""
        todo = {
            keyp: [st[0], st[1], st[2]] for keyp, st in pending.items()
        }
        cap = max(int(stall_distinct_cap), 2)
        while todo:
            items = sorted(
                todo.items(),
                key=lambda kv: (g_order[kv[0][0]], str(kv[0][1])),
            )
            blocks = []
            base = 0
            for (g, _lab), st in items:
                blocks.append(
                    (
                        pa.array([g]),
                        np.array([st[0]]),
                        np.array([st[1]]),
                        base,
                    )
                )
                base += 1
            refs = _ray.put(blocks)

            def scan(b: pa.Table) -> pa.Table:
                blks = _ray.get(refs)
                col = pa.compute.cast(b.column(value_col), pa.float64())
                v_all = col.to_numpy(zero_copy_only=False)
                out_s, out_v, out_c = [], [], []
                for ga, lo_a, hi_a, blk_base in blks:
                    m = pa.compute.equal(b.column(group_col), ga[0])
                    mm = m.to_numpy(zero_copy_only=False)
                    mm = np.asarray(mm, dtype=bool) & ~np.isnan(v_all)
                    vv = v_all[mm]
                    vv = vv[(vv >= lo_a[0]) & (vv <= hi_a[0])]
                    if vv.size:
                        uq, cnt = np.unique(vv, return_counts=True)
                        out_s.append(
                            np.full(uq.size, blk_base, dtype=np.int64)
                        )
                        out_v.append(uq)
                        out_c.append(cnt.astype(np.int64))
                if not out_s:
                    return pa.table(
                        {
                            "s": pa.array([], pa.int64()),
                            "v": pa.array([], pa.float64()),
                            "c": pa.array([], pa.int64()),
                        }
                    )
                return pa.table(
                    {
                        "s": pa.array(np.concatenate(out_s)),
                        "v": pa.array(np.concatenate(out_v)),
                        "c": pa.array(np.concatenate(out_c)),
                    }
                )

            per_slot: dict = {}
            floors: dict = {}  # slot -> smallest evicted key (exclusive)
            for b in ds.map_batches(
                scan, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=1 << 20):
                for s, v, c in zip(
                    b.column("s").to_pylist(),
                    b.column("v").to_pylist(),
                    b.column("c").to_pylist(),
                ):
                    si, vf = int(s), float(v)
                    if si in floors and vf >= floors[si]:
                        continue  # beyond the eviction floor: next chunk
                    d = per_slot.setdefault(si, {})
                    d[vf] = d.get(vf, 0) + int(c)
                    if len(d) > cap:
                        # evict the largest half; keys below the new
                        # floor keep exact counts (only the top is cut)
                        keys = sorted(d)
                        flo = keys[cap // 2]
                        floors[si] = min(floors.get(si, flo), flo)
                        per_slot[si] = {
                            k: n for k, n in d.items() if k < floors[si]
                        }
            for si, (keyp, st) in enumerate(items):
                d = per_slot.get(si, {})
                flo = floors.get(si)
                r = st[2]
                vals = sorted(
                    k for k in d if flo is None or k < flo
                )
                cum = 0
                chosen = None
                for v in vals:
                    cum += d[v]
                    if cum > r:
                        chosen = v
                        break
                if chosen is not None:
                    results[keyp] = float(chosen)
                    del pending[keyp]
                    del todo[keyp]
                elif flo is None:
                    raise AssertionError(
                        f"grouped_rank_select: rank {r} outside stalled "
                        f"range for group {keyp[0]!r} ({cum} values)"
                    )
                else:
                    # rank lives above the floor: consume the exact
                    # prefix and rescan the rest of the range
                    todo[keyp] = [flo, st[1], r - cum]

    rounds_done = 0
    while pending:
        if force_stall_rounds and rounds_done >= force_stall_rounds:
            # test hook: exercise the stall resolver deterministically
            # (with overflow-safe steps a genuine stall may be
            # unreachable — this keeps the defensive path covered)
            _resolve_stalled_exact()
            continue
        rounds_done += 1
        progressed = False
        # range signature per group: when every pending label of a group
        # shares one (lo, hi) — always true in round 1 and in the
        # all-small endgame — ONE scan slot serves all its labels
        by_group: dict = {}
        for (g, lab), st in pending.items():
            by_group.setdefault(g, []).append((lab, st))
        shared = all(
            len({(st[0], st[1]) for _, st in labs}) == 1
            for labs in by_group.values()
        )
        if shared:
            entries = [
                (g, max((st for _, st in labs), key=lambda s: s[3]))
                for g, labs in sorted(
                    by_group.items(), key=lambda kv: g_order[kv[0]]
                )
            ]
            small, hist, collected = run_round_multi([entries])
            for si, (g, _) in enumerate(entries):
                for lab, st in by_group[g]:
                    if (g, lab) in pending:
                        progressed |= apply_update(
                            (g, lab), st, si, small, hist, collected
                        )
        else:
            # diverged ranges: one slot per (group, label), but still
            # ONE scan of the table — each label is a slot block
            by_label: dict = {lab: [] for lab in labels}
            for (g, lab), st in pending.items():
                by_label[lab].append((g, st))
            entry_lists = []
            routing = []  # (label, entries, base)
            base = 0
            for lab in labels:
                entries = by_label[lab]
                if not entries:
                    continue
                entries.sort(key=lambda e: g_order[e[0]])
                entry_lists.append(entries)
                routing.append((lab, entries, base))
                base += len(entries)
            small, hist, collected = run_round_multi(entry_lists)
            for lab, entries, blk_base in routing:
                for i, (g, st) in enumerate(entries):
                    if (g, lab) in pending:
                        progressed |= apply_update(
                            (g, lab),
                            st,
                            blk_base + i,
                            small,
                            hist,
                            collected,
                        )
        _resolve_degenerate()
        if not progressed and pending:
            _resolve_stalled_exact()

    out_g, out_q, out_v = [], [], []
    for g in groups:
        for lab, _ in quantiles:
            if (g, lab) in results:
                out_g.append(g)
                out_q.append(lab)
                out_v.append(results[(g, lab)])
    return pa.table(
        {
            group_col: pa.array(out_g),
            "q": pa.array(out_q, pa.string()),
            "value": pa.array(out_v, pa.float64()),
        }
    )

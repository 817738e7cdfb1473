"""Windowed aggregation operators over event time.

Batch-mode (whole-Dataset) window operators built Ray-Data-first:
two-phase aggregation — vectorized pyarrow group_by partials inside
map_batches, then a small Ray groupby merge over the partials — so the
all-to-all shuffle only moves pre-aggregated rows (hot domains collapse to
one partial row per (task, key)). Session windows use per-key map_groups.

The CEP/streaming variants (watermarks, incremental panes, actor state)
live in pipelines/cep.py; these operators are also their per-micro-batch
building blocks.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum


def _partial_window_agg(
    keys: Sequence[str],
    ts_column: str,
    size_us: int,
    value_column: str | None,
    slide_us: int | None = None,
):
    """Build a map_batches fn: assign window ids + pyarrow group_by partial."""

    def fn(batch: pa.Table) -> pa.Table:
        micros = pc.cast(batch.column(ts_column), pa.int64())
        if slide_us is None:
            wid = pc.divide(micros, pa.scalar(size_us, pa.int64()))
            batch = batch.append_column("window_id", wid)
            tables = [batch]
        else:
            last = pc.divide(micros, pa.scalar(slide_us, pa.int64()))
            k = size_us // slide_us
            tables = []
            for j in range(k):
                wid = pc.subtract(last, pa.scalar(j, pa.int64()))
                tables.append(batch.append_column("window_id", wid))
            merged = pa.concat_tables(tables)
            merged = merged.filter(
                pc.greater_equal(merged.column("window_id"), 0)
            )
            tables = [merged]
        t = tables[0]
        cols = list(keys) + ["window_id"]
        aggs = [([], "count_all")]
        if value_column is not None:
            aggs.append((value_column, "sum"))
        part = t.group_by(cols).aggregate(aggs)
        names = {"count_all": "n"}
        if value_column is not None:
            names[f"{value_column}_sum"] = "val_sum"
        return part.rename_columns(
            [names.get(c, c) for c in part.column_names]
        )

    return fn


def window_aggregate(
    ds: "ray.data.Dataset",
    *,
    size_s: int,
    keys: Sequence[str] = ("domain",),
    ts_column: str = "warc_ts",
    value_column: str | None = None,
    slide_s: int | None = None,
) -> "ray.data.Dataset":
    """Tumbling (or sliding when slide_s given) windowed count/sum.

    Output columns: *keys, window_id, n [, val_sum].
    """
    fn = _partial_window_agg(
        keys,
        ts_column,
        size_s * 1_000_000,
        value_column,
        slide_s * 1_000_000 if slide_s else None,
    )
    partials = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Sum("n", alias_name="n")]
    if value_column is not None:
        aggs.append(Sum("val_sum", alias_name="val_sum"))
    return partials.groupby(list(keys) + ["window_id"]).aggregate(*aggs)


def assign_sessions_in_group(
    group: pa.Table,
    *,
    key: str,
    ts_column: str,
    gap_us: int,
    value_column: str | None = None,
) -> pa.Table:
    """Per-key session assignment: sort by ts, split on gaps > gap_us,
    emit one row per session (key, session_start, session_end, n [, val_sum]).
    """
    idx = pc.sort_indices(group.column(ts_column))
    sorted_ts = pc.take(pc.cast(group.column(ts_column), pa.int64()), idx)
    ts_list = sorted_ts.to_pylist()
    vals = None
    if value_column is not None:
        vals = pc.take(group.column(value_column), idx).to_pylist()
    key_val = group.column(key)[0].as_py()
    out_key, out_start, out_end, out_n, out_sum = [], [], [], [], []
    start = prev = None
    n = 0
    vsum = 0.0
    for i, t in enumerate(ts_list):
        if prev is not None and t - prev > gap_us:
            out_key.append(key_val)
            out_start.append(start)
            out_end.append(prev)
            out_n.append(n)
            out_sum.append(vsum)
            start, n, vsum = t, 0, 0.0
        if start is None:
            start = t
        n += 1
        if vals is not None:
            vsum += vals[i] or 0.0
        prev = t
    if start is not None:
        out_key.append(key_val)
        out_start.append(start)
        out_end.append(prev)
        out_n.append(n)
        out_sum.append(vsum)
    cols = {
        key: out_key,
        "session_start": pa.array(out_start, pa.int64()),
        "session_end": pa.array(out_end, pa.int64()),
        "n": pa.array(out_n, pa.int64()),
    }
    if value_column is not None:
        cols["val_sum"] = pa.array(out_sum, pa.float64())
    return pa.table(cols)


def session_windows(
    ds: "ray.data.Dataset",
    *,
    key: str,
    gap_s: int,
    ts_column: str = "warc_ts",
    value_column: str | None = None,
) -> "ray.data.Dataset":
    """Session windows per key via groupby().map_groups (shuffle on key)."""
    gap_us = gap_s * 1_000_000

    def fn(group: pa.Table) -> pa.Table:
        return assign_sessions_in_group(
            group,
            key=key,
            ts_column=ts_column,
            gap_us=gap_us,
            value_column=value_column,
        )

    return ds.groupby(key).map_groups(fn, batch_format="pyarrow")


def finalized_windows(
    ds: "ray.data.Dataset",
    *,
    size_s: int,
    allowed_lateness_s: int,
    keys: Sequence[str] = ("domain",),
    ts_column: str = "warc_ts",
    value_column: str | None = None,
) -> "ray.data.Dataset":
    """Batch-mode watermark semantics: aggregate all windows, then keep only
    those whose end <= watermark = max(ts) - allowed_lateness.

    The streaming engine (pipelines/cep.py) produces the same finalized set
    incrementally; this operator is its whole-input oracle.
    """
    wm = ds.map_batches(
        lambda b: pa.table(
            {"m": [pc.max(pc.cast(b.column(ts_column), pa.int64())).as_py()]}
        ),
        batch_format="pyarrow",
    ).max("m")
    watermark = wm - allowed_lateness_s * 1_000_000
    agg = window_aggregate(
        ds,
        size_s=size_s,
        keys=keys,
        ts_column=ts_column,
        value_column=value_column,
    )
    size_us = size_s * 1_000_000
    # window w covers [w*size, (w+1)*size); finalized iff
    # (w+1)*size <= watermark  <=>  w <= floor(watermark/size) - 1
    max_wid = watermark // size_us - 1
    return agg.filter(expr=f"window_id <= {max_wid}")

"""Unit tests for the hash-partitioned cogroup join (stages/join.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data

from headson_ray.stages.join import hash_join


def _ds(d):
    return ray.data.from_arrow(pa.table(d))


@pytest.mark.usefixtures("ray_session")
def test_inner_join_int_keys():
    left = _ds({"k": [1, 2, 2, 3], "lv": ["a", "b", "c", "d"]})
    right = _ds({"k": [2, 3, 3, 4], "rv": [10, 20, 30, 40]})
    out = hash_join(left, right, key="k").to_pandas()
    got = sorted(map(tuple, out[["k", "lv", "rv"]].itertuples(index=False)))
    assert got == [
        (2, "b", 10), (2, "c", 10), (3, "d", 20), (3, "d", 30),
    ]


@pytest.mark.usefixtures("ray_session")
def test_left_outer_join():
    left = _ds({"k": [1, 2], "lv": ["a", "b"]})
    right = _ds({"k": [2], "rv": [99]})
    out = hash_join(left, right, key="k", how="left outer").to_pandas()
    rows = {(r.k, r.lv): r.rv for r in out.itertuples(index=False)}
    assert rows[(2, "b")] == 99
    import math

    assert (1, "a") in rows and (
        rows[(1, "a")] is None or math.isnan(rows[(1, "a")])
    )


@pytest.mark.usefixtures("ray_session")
def test_string_keys_cross_bucket():
    keys = [f"domain-{i}.com" for i in range(300)]
    left = _ds({"k": keys, "lv": list(range(300))})
    right = _ds({"k": keys[::2], "rv": list(range(0, 300, 2))})
    out = hash_join(left, right, key="k").to_pandas()
    assert len(out) == 150
    assert (out["lv"] == out["rv"]).all()


@pytest.mark.usefixtures("ray_session")
def test_overlapping_columns_rejected():
    left = _ds({"k": [1], "v": [1]})
    right = _ds({"k": [1], "v": [2]})
    with pytest.raises(ValueError, match="overlapping"):
        hash_join(left, right, key="k")


@pytest.mark.usefixtures("ray_session")
def test_salted_join_matches_unsalted_under_skew():
    """One orderkey carries 50% of the left rows; the salted join must
    return exactly the unsalted result (right side replicated per salt,
    left scattered round-robin)."""
    import numpy as np

    hot = 7
    lk = [hot] * 500 + list(np.arange(500) % 97)
    left = _ds({"k": pa.array(lk, pa.int64()),
                "lv": pa.array(range(len(lk)), pa.int64())})
    rk = list(range(100))
    right = _ds({"k": pa.array(rk, pa.int64()),
                 "rv": pa.array([k * 10 for k in rk], pa.int64())})
    plain = hash_join(left, right, key="k").to_pandas()
    salted = hash_join(left, right, key="k", salt=8).to_pandas()
    key = ["k", "lv", "rv"]
    p = plain[key].sort_values(key).reset_index(drop=True)
    s = salted[key].sort_values(key).reset_index(drop=True)
    assert p.equals(s)
    assert (s[s["k"] == hot]["rv"] == hot * 10).all()
    assert len(s[s["k"] == hot]) == lk.count(hot)


@pytest.mark.usefixtures("ray_session")
def test_salted_left_outer_join():
    left = _ds({"k": [1, 1, 1, 2, 5], "lv": ["a", "b", "c", "d", "e"]})
    right = _ds({"k": [1, 2], "rv": [10, 20]})
    out = hash_join(
        left, right, key="k", how="left outer", salt=4
    ).to_pandas()
    assert len(out) == 5
    rows = {(r.k, r.lv): r.rv for r in out.itertuples(index=False)}
    assert rows[(1, "a")] == 10 and rows[(2, "d")] == 20
    import math

    assert rows[(5, "e")] is None or math.isnan(rows[(5, "e")])


@pytest.mark.usefixtures("ray_session")
def test_banded_interval_count_matches_brute_force():
    """Random timestamps (with duplicates and band-boundary values)
    across random shard splits: banded self interval-count equals the
    O(n^2) reference, for band_us == width_us and band_us > width_us."""
    import numpy as np

    from headson_ray.stages.join import banded_interval_count

    rng = np.random.RandomState(11)
    for trial in range(8):
        n = rng.randint(1, 120)
        w = int(rng.choice([10, 50, 100]))
        # cluster around band edges so windows straddle bands often
        ts = rng.randint(0, 5 * w, n).astype(np.int64)
        snap = rng.rand(n) < 0.3
        ts[snap] = (ts[snap] // w) * w
        ids = np.arange(n, dtype=np.int64)
        expect = {
            int(i): int(np.sum(np.abs(ts - t) <= w) - 1)
            for i, t in zip(ids, ts)
        }
        tbl = pa.table({"event_id": pa.array(ids), "ts": pa.array(ts)})
        k = rng.randint(1, 4)
        ds = ray.data.from_arrow(tbl).repartition(k)
        for band in (w, 3 * w):
            got = banded_interval_count(
                ds, ts_col="ts", id_col="event_id", width_us=w,
                band_us=band,
            ).to_pandas()
            assert len(got) == n
            gm = dict(zip(got["event_id"], got["n_concurrent"]))
            assert {int(a): int(b) for a, b in gm.items()} == expect, (
                trial, w, band
            )


@pytest.mark.usefixtures("ray_session")
def test_banded_interval_count_drops_null_ts():
    import numpy as np

    from headson_ray.stages.join import banded_interval_count

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([100, None, 105], pa.int64()),
        }
    )
    got = banded_interval_count(
        ray.data.from_arrow(tbl), ts_col="ts", id_col="event_id",
        width_us=10,
    ).to_pandas()
    assert sorted(got["event_id"]) == [1, 3]
    assert (got["n_concurrent"] == 1).all()

"""Stream-stream interval join (pipelines/streamjoin.py): pair-set
equality vs an in-memory replay of the batch semantics, exactly-once
resume byte-equality, and the watermark eviction bound."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
EVENTS = os.path.join(SF_DIR, "events.parquet")


def _reference_pairs(path: str) -> list[tuple]:
    """In-memory interval join: (user, click, purchase) multiset with
    click strictly earlier and purchase - click <= 1h."""
    from headson_ray.pipelines.streamjoin import HOUR_US

    t = pq.read_table(path, columns=["user_id", "event_type", "ts"])
    users = t.column("user_id").to_numpy(zero_copy_only=False)
    et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
    ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    out = []
    for u in np.unique(users):
        m = users == u
        cl = np.sort(ts[m & (et == "click")])
        for p in ts[m & (et == "purchase")]:
            lo = np.searchsorted(cl, p - HOUR_US, side="left")
            hi = np.searchsorted(cl, p, side="left")
            for c in cl[lo:hi]:
                out.append((int(u), int(c), int(p)))
    return sorted(out)


def _pairs_list(tbl: pa.Table) -> list[tuple]:
    return sorted(
        zip(
            tbl.column("user_id").to_pylist(),
            tbl.column("click_ts_us").to_pylist(),
            tbl.column("purchase_ts_us").to_pylist(),
        )
    )


def _run(tmp_path, tag, groups=None, num_batches=8):
    from headson_ray.pipelines.streamjoin import (
        StreamJoin,
        ts_range_groups,
    )

    if groups is None:
        groups = ts_range_groups([EVENTS], num_batches)
    eng = StreamJoin(
        out_dir=str(tmp_path / f"{tag}-out"),
        checkpoint_dir=str(tmp_path / f"{tag}-ckpt"),
        num_state_actors=3,
    )
    m = eng.run(groups)
    return eng, m


@pytest.mark.usefixtures("ray_session")
def test_stream_join_matches_batch_semantics(tmp_path):
    eng, m = _run(tmp_path, "full")
    got = _pairs_list(eng.read_pairs())
    exp = _reference_pairs(EVENTS)
    assert got == exp
    assert m["pairs_emitted"] == len(exp) > 0


@pytest.mark.usefixtures("ray_session")
def test_stream_join_resume_byte_equal(tmp_path):
    from headson_ray.pipelines.streamjoin import (
        StreamJoin,
        ts_range_groups,
    )

    groups = ts_range_groups([EVENTS], 8)
    eng_a, _ = _run(tmp_path, "ref", groups=groups)
    ref = eng_a.read_pairs()

    out = str(tmp_path / "res-out")
    ckpt = str(tmp_path / "res-ckpt")
    half = StreamJoin(
        out_dir=out, checkpoint_dir=ckpt, num_state_actors=3
    )
    half.run(groups[:5])  # "crash" after batch 4 commits
    assert half.sink.committed_batches() == set(range(5))

    resumed = StreamJoin(
        out_dir=out, checkpoint_dir=ckpt, num_state_actors=3
    )
    resumed.run(groups)
    assert resumed.read_pairs().equals(ref)
    for b in range(8):
        a = tmp_path / "ref-out" / f"pairs-b{b:06d}.parquet"
        r = tmp_path / "res-out" / f"pairs-b{b:06d}.parquet"
        assert a.exists() == r.exists()
        if a.exists():
            assert pq.read_table(a).equals(pq.read_table(r))


@pytest.mark.usefixtures("ray_session")
def test_stream_join_watermark_eviction_bounds_state(tmp_path):
    """Join state must stay bounded by the window: after the run, every
    surviving click is within 1h of the final batch bound (the stream
    spans days, so unevicted state would be far larger)."""
    from headson_ray.pipelines.streamjoin import (
        HOUR_US,
        ts_range_groups,
    )

    groups = ts_range_groups([EVENTS], 8)
    eng, m = _run(tmp_path, "evict", groups=groups)
    final_hi = groups[-1][0]
    t = pq.read_table(EVENTS, columns=["event_type", "ts"])
    et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
    ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    clicks = ts[et == "click"]
    in_window = int((clicks >= final_hi - HOUR_US).sum())
    held = sum(st["clicks_held"] for st in m["actor_stats"])
    assert held == in_window
    assert held < int((et == "click").sum())

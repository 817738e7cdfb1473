"""Update-mode lateness (pipelines/streamlate.py): late arrivals force
versioned pane re-emissions, the materialized view converges to the
batch aggregate, and kill/resume stays byte-identical."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

ROWS = 1500
N_BATCHES = 8


@pytest.fixture(scope="module")
def paths():
    from headson_ray.sources.pages import materialize_pages

    return materialize_pages(ROWS, num_shards=3, tag="late-upd-test")


def _batch_truth(paths):
    from headson_ray.pipelines.streamlate import WINDOW_US
    from headson_ray.stages.derive import add_domain

    t = add_domain(
        pa.concat_tables(
            pq.read_table(p, columns=["url", "warc_ts", "text"])
            for p in paths
        )
    )
    ts = pc.cast(t.column("warc_ts"), pa.int64())
    win = pc.multiply(pc.divide(ts, WINDOW_US), pa.scalar(WINDOW_US))
    agg = (
        pa.table(
            {
                "domain": t.column("domain"),
                "win_start": win,
                "cnt": pc.cast(
                    pc.utf8_length(t.column("url")), pa.int64()
                ),
                "chars": pc.cast(
                    pc.utf8_length(t.column("text")), pa.int64()
                ),
            }
        )
        .group_by(["domain", "win_start"])
        .aggregate([("cnt", "count"), ("chars", "sum")])
    )
    return agg.rename_columns(
        ["domain", "win_start", "n_pages", "total_chars"]
    ).sort_by([("domain", "ascending"), ("win_start", "ascending")])


def _view_table(eng):
    tbls = list(
        eng.materialized_view().iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return pa.concat_tables(tbls).sort_by(
        [("domain", "ascending"), ("win_start", "ascending")]
    ).select(["domain", "win_start", "n_pages", "total_chars"])


@pytest.mark.usefixtures("ray_session")
def test_late_updates_converge_to_batch_truth(tmp_path, paths):
    from headson_ray.pipelines.streamlate import (
        LateUpdateStream,
        late_shuffled_groups,
    )

    eng = LateUpdateStream(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_state_actors=3,
    )
    m = eng.run(late_shuffled_groups(paths, N_BATCHES))
    assert m["rows_processed"] == ROWS
    got = _view_table(eng)
    exp = _batch_truth(paths)
    assert got.equals(exp)
    # the pair-swapped arrival order forces genuine late corrections:
    # panes re-emitted at version >= 2 must exist, and emissions must
    # exceed the distinct-pane count
    corrections = sum(st["corrections"] for st in m["actor_stats"])
    assert corrections > 0
    assert m["emissions"] > exp.num_rows
    # every pane is clean after the final flush
    assert all(st["dirty"] == 0 for st in m["actor_stats"])


@pytest.mark.usefixtures("ray_session")
def test_late_updates_resume_byte_equal(tmp_path, paths):
    from headson_ray.pipelines.streamlate import (
        LateUpdateStream,
        late_shuffled_groups,
    )

    groups = late_shuffled_groups(paths, N_BATCHES)
    ref = LateUpdateStream(
        out_dir=str(tmp_path / "ref-out"),
        checkpoint_dir=str(tmp_path / "ref-ckpt"),
        num_state_actors=3,
    )
    ref.run(groups)

    out = str(tmp_path / "res-out")
    ckpt = str(tmp_path / "res-ckpt")
    half = LateUpdateStream(
        out_dir=out, checkpoint_dir=ckpt, num_state_actors=3
    )
    # final_flush=False: a run killed between micro-batches never wrote
    # its flush batch
    half.run(groups[:5], final_flush=False)
    assert half.sink.committed_batches() == set(range(5))

    resumed = LateUpdateStream(
        out_dir=out, checkpoint_dir=ckpt, num_state_actors=3
    )
    resumed.run(groups)
    assert _view_table(resumed).equals(_view_table(ref))
    for b in range(N_BATCHES + 1):  # incl. the final-flush batch
        a = tmp_path / "ref-out" / f"updates-b{b:06d}.parquet"
        r = tmp_path / "res-out" / f"updates-b{b:06d}.parquet"
        assert a.exists() == r.exists(), b
        if a.exists():
            assert pq.read_table(a).equals(pq.read_table(r)), b

"""Streaming MinHash near-dup suppression (pipelines/streamdedup.py):
semantics vs an in-memory replay, exactly-once resume byte-equality,
and the tiered BandRegistry's spill/rollback contract."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _reference_ledger(path: str) -> "pa.Table":
    """In-memory replay of the register-all stream semantics: dup(d) =
    exists d' < d sharing any LSH band; first_src = min such d'."""
    from headson_ray.pipelines.streamdedup import NUM_BANDS, NUM_PERM
    from headson_ray.stages.dedup import (
        MinHasher,
        lsh_band_rows,
        minhash_signatures,
    )

    t = pq.read_table(path, columns=["doc_id", "text"])
    sig = minhash_signatures(t, hasher=MinHasher(NUM_PERM))
    rows = lsh_band_rows(sig, bands=NUM_BANDS)
    codes = rows.column("band_hash").to_numpy(zero_copy_only=False)
    ids = rows.column("doc_id").to_numpy(zero_copy_only=False)
    first_by_code: dict[int, int] = {}
    order = np.lexsort((ids, codes))
    for c, i in zip(codes[order].tolist(), ids[order].tolist()):
        if c not in first_by_code:
            first_by_code[c] = i
    doc_ids = np.sort(
        t.column("doc_id").to_numpy(zero_copy_only=False)
    )
    firsts = {}
    for c, i in zip(codes.tolist(), ids.tolist()):
        m = first_by_code[c]
        if m < i and (i not in firsts or m < firsts[i]):
            firsts[i] = m
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "is_dup": pa.array(
                [int(d in firsts) for d in doc_ids.tolist()], pa.int64()
            ),
            "first_src": pa.array(
                [firsts.get(d, -1) for d in doc_ids.tolist()], pa.int64()
            ),
        }
    )


def _run_stream(tmp_path, tag, groups=8, paths=None, **kw):
    from headson_ray.pipelines.streamdedup import (
        NearDupStream,
        doc_range_groups,
    )

    if paths is None:
        paths = [os.path.join(SF_DIR, "documents.parquet")]
    eng = NearDupStream(
        out_dir=str(tmp_path / f"{tag}-out"),
        checkpoint_dir=str(tmp_path / f"{tag}-ckpt"),
        num_state_actors=3,
        **kw,
    )
    m = eng.run(doc_range_groups(paths, groups))
    return eng, m


@pytest.mark.usefixtures("ray_session")
def test_stream_matches_inmemory_replay(tmp_path):
    eng, m = _run_stream(tmp_path, "full")
    got = eng.read_ledger()
    exp = _reference_ledger(os.path.join(SF_DIR, "documents.parquet"))
    assert got.equals(exp)
    assert m["rows_processed"] == exp.num_rows
    assert m["dups"] == int(
        pa.compute.sum(exp.column("is_dup")).as_py()
    )
    # the suppression is real on this corpus (it carries near-dups)
    assert 0 < m["dups"] < m["rows_processed"]


@pytest.mark.usefixtures("ray_session")
def test_stream_resume_byte_equal(tmp_path):
    """A run killed between micro-batches resumes from the committed
    manifest + actor snapshots and produces a byte-identical ledger."""
    from headson_ray.pipelines.streamdedup import (
        NearDupStream,
        doc_range_groups,
    )

    paths = [os.path.join(SF_DIR, "documents.parquet")]
    groups = doc_range_groups(paths, 8)

    eng_a, _ = _run_stream(tmp_path, "ref")
    ref = eng_a.read_ledger()

    out = str(tmp_path / "res-out")
    ckpt = str(tmp_path / "res-ckpt")
    half = NearDupStream(
        out_dir=out, checkpoint_dir=ckpt, num_state_actors=3
    )
    half.run(groups[:4])  # "crash" after batch 3 commits
    assert half.sink.committed_batches() == {0, 1, 2, 3}
    half_rows = half.read_ledger().num_rows

    resumed = NearDupStream(
        out_dir=out, checkpoint_dir=ckpt, num_state_actors=3
    )
    m = resumed.run(groups)
    # only the remaining batches were processed
    assert m["rows_processed"] == ref.num_rows - half_rows
    assert resumed.read_ledger().equals(ref)
    # per-batch ledger files byte-equal vs the uninterrupted run
    for b in range(8):
        a = tmp_path / "ref-out" / f"ledger-b{b:06d}.parquet"
        r = tmp_path / "res-out" / f"ledger-b{b:06d}.parquet"
        assert a.exists() == r.exists()
        if a.exists():
            assert pq.read_table(a).equals(pq.read_table(r))


@pytest.mark.usefixtures("ray_session")
def test_stream_tiered_spill_and_resume(tmp_path):
    """With a tiny hot cap the registry MUST spill to the sqlite cold
    tier mid-stream; verdicts and resume stay exact across the spill."""
    eng, m = _run_stream(tmp_path, "spill", max_mem_entries=8)
    stats = m["actor_stats"]
    assert any(st["spilled"] for st in stats)
    assert all(st["hot_entries"] <= 8 + st["rows_seen"] for st in stats)
    exp = _reference_ledger(os.path.join(SF_DIR, "documents.parquet"))
    assert eng.read_ledger().equals(exp)


def test_band_registry_rollback(tmp_path):
    """Append-only cold tier: restore deletes future-batch rows without
    losing earlier minima (the in-place-upsert failure mode)."""
    from headson_ray.state.store import BandRegistry

    reg = BandRegistry(str(tmp_path / "cold.sqlite3"), max_mem_entries=1)
    reg.register_batch(
        np.array([7, 9], dtype=np.int64), np.array([5, 2], dtype=np.int64)
    )
    snap0 = reg.snapshot_state()
    reg.checkpoint_commit(0)  # over cap -> spill tagged batch 0
    assert reg.spilled
    snap1 = reg.snapshot_state()
    # batch 1 lowers code 7's min, spills tagged batch 1
    reg.register_batch(
        np.array([7], dtype=np.int64), np.array([1], dtype=np.int64)
    )
    reg.checkpoint_commit(1)
    assert reg.probe_batch(np.array([7], dtype=np.int64))[0] == 1
    # roll back to batch 0: code 7's min must REVERT to 5, not vanish
    reg.restore_state(snap1, 0)
    assert reg.probe_batch(np.array([7], dtype=np.int64))[0] == 5
    assert reg.probe_batch(np.array([9], dtype=np.int64))[0] == 2
    # roll back to "before batch 0": cold rows gone, hot snapshot rules
    reg.restore_state(snap0, -1)
    assert reg.probe_batch(np.array([7], dtype=np.int64))[0] == 5
    assert reg.probe_batch(
        np.array([12345], dtype=np.int64)
    )[0] == (1 << 62)


@pytest.mark.usefixtures("ray_session")
def test_stream_empty_input(tmp_path):
    """Empty inputs yield empty streams, not min()/max() crashes (the
    ADVICE-class guard), for all three session-3 flows."""
    from headson_ray.pipelines.streamdedup import (
        NearDupStream,
        doc_range_groups,
    )
    from headson_ray.pipelines.streamjoin import ts_range_groups
    from headson_ray.pipelines.streamlate import late_shuffled_groups

    docs = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "text": pa.array([], pa.string())}
    )
    pq.write_table(docs, tmp_path / "docs.parquet")
    assert doc_range_groups([str(tmp_path / "docs.parquet")], 8) == []

    events = pa.table(
        {"user_id": pa.array([], pa.int64()),
         "event_type": pa.array([], pa.string()),
         "ts": pa.array([], pa.timestamp("us"))}
    )
    pq.write_table(events, tmp_path / "events.parquet")
    assert ts_range_groups([str(tmp_path / "events.parquet")], 8) == []

    pages = pa.table(
        {"url": pa.array([], pa.string()),
         "warc_ts": pa.array([], pa.timestamp("us")),
         "text": pa.array([], pa.string())}
    )
    pq.write_table(pages, tmp_path / "pages.parquet")
    assert late_shuffled_groups(
        [str(tmp_path / "pages.parquet")], 8
    ) == []

    eng = NearDupStream(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_state_actors=2,
    )
    m = eng.run([])
    assert m["rows_processed"] == 0 and m["dups"] == 0
    assert eng.read_ledger().num_rows == 0

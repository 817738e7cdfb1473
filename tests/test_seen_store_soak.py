"""Soak evidence for the tiered seen-store: stream 6x the hot-tier cap
through one store — memory stays bounded at the cap, dedup stays EXACT,
and cold-tier rollback restores pre-batch state."""

from __future__ import annotations

import os

from headson_ray.state.store import SeenStore


def test_seen_store_soak_6x_cap(tmp_path):
    cap = 100_000
    s = SeenStore(str(tmp_path / "seen.db"), max_mem_entries=cap)
    n_new = 0
    peak = 0
    for b in range(12):  # 600k distinct urls + 50 re-offered dups
        for i in range(50_000):
            k = b * 50_000 + i
            if s.add_if_new(f"dom{k % 997}.com",
                            f"https://dom{k % 997}.com/p/{k}"):
                n_new += 1
            if i % 10 == 0:
                if s.add_if_new("dom1.com",
                                f"https://dom1.com/p/old{i % 500}"):
                    n_new += 1
        s.checkpoint_commit(b)
        peak = max(peak, s.mem_count)
    # exact: 600k fresh urls + 50 distinct "old" urls, dups rejected
    assert n_new == 600_000 + 50
    # bounded: hot tier never exceeded the cap; cold tier actually used
    assert peak <= cap
    assert s.spilled
    assert os.path.getsize(tmp_path / "seen.db") > 0


def test_seen_store_rollback_discards_uncommitted_batch(tmp_path):
    cap = 10
    s = SeenStore(str(tmp_path / "seen.db"), max_mem_entries=cap)
    # batch 0: committed
    for i in range(25):
        assert s.add_if_new("d.com", f"u{i}")
    snap = s.snapshot_state()
    s.checkpoint_commit(0)
    # batch 1: spills more rows, then "crashes" (no commit)
    for i in range(25, 60):
        assert s.add_if_new("d.com", f"u{i}")
    # restore to batch 0 on a FRESH store over the same file
    s.con.close()
    s2 = SeenStore(str(tmp_path / "seen.db"), max_mem_entries=cap)
    s2.restore_state(snap, 0)
    # batch-0 urls are duplicates; batch-1 urls must look new again
    assert not s2.add_if_new("d.com", "u3")
    assert s2.add_if_new("d.com", "u40")


def test_rollback_first_spill_batch_with_prespill_snapshot(tmp_path):
    """Review finding: the crashed batch is the FIRST to spill and its
    snapshot committed sqlite rows, but the restore point's snapshot has
    spilled=False — the cold tier must still roll back, else replayed
    urls masquerade as duplicates."""
    path = str(tmp_path / "seen.db")
    s = SeenStore(path, max_mem_entries=10)
    for i in range(5):
        assert s.add_if_new("d.com", f"pre{i}")
    snap0 = s.snapshot_state()
    assert snap0["spilled"] is False
    s.checkpoint_commit(0)
    # batch 1 crosses the cap (spills) and its snapshot commit lands
    for i in range(30):
        assert s.add_if_new("d.com", f"b1-{i}")
    assert s.spilled
    s.checkpoint_commit(1)
    s.con.close()
    # crash before the SINK commit of batch 1 -> resume restores batch 0
    s2 = SeenStore(path, max_mem_entries=10)
    s2.restore_state(snap0, 0)
    # batch-1 urls must look new again; batch-0 urls stay duplicates
    assert s2.add_if_new("d.com", "b1-17")
    assert not s2.add_if_new("d.com", "pre3")

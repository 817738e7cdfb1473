"""Keyed state-store actors for the streaming CEP engine.

A fixed pool of P ``StateStoreActor``s partitions all mutable stream state
by hash(domain) (hot domains additionally spread by hash(url) for the
dedup/join row flow — the pane merge is the second phase of the salted
two-phase aggregation). Each actor holds:

- window panes: (domain, window_id) -> [n_pages, n_dup, n_new, n_changed,
  n_unchanged, total_chars]
- per-domain seen-url sets (stream dedup)
- the prior-crawl index (url -> text fingerprint) for the delta join

State snapshots to the checkpoint directory per micro-batch (atomic
write + rename), so a killed run restores the exact pre-batch state and
re-emits byte-identical window files (exactly-once with the deterministic
sink in sinks/parquet.py).
"""

from __future__ import annotations

import os
import pickle
from collections import defaultdict

import pyarrow as pa

import ray


def fnv1a64(data: bytes) -> int:
    """Stable 64-bit FNV-1a (python hash() is per-process salted)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def route_partition(domain: str, url: str, num_partitions: int) -> int:
    """Salted routing: same (domain,url) always lands on one actor while a
    hot domain spreads across the pool."""
    return fnv1a64(f"{domain}\x00{url}".encode()) % num_partitions


PANE_FIELDS = [
    "n_pages", "n_dup", "n_new", "n_changed", "n_unchanged", "total_chars",
]


@ray.remote
class StateStoreActor:
    def __init__(self, actor_id: int, checkpoint_dir: str | None = None):
        self.actor_id = actor_id
        self.checkpoint_dir = checkpoint_dir
        # (domain, window_id) -> [PANE_FIELDS]
        self.panes: dict[tuple[str, int], list] = {}
        # domain -> set(url)
        self.seen: dict[str, set] = defaultdict(set)
        # prior crawl: url -> text fingerprint
        self.prior: dict[str, int] = {}
        self.rows_seen = 0
        # Highest finalized window id: rows at or below are late beyond
        # allowed lateness and are dropped (counted), never re-opened.
        self.frontier = -(1 << 62)
        self.n_late = 0

    # --- prior-crawl side (the small, bounded side of the stream join) ---
    def load_prior(self, urls: list[str], fps: list[int]) -> int:
        self.prior.update(zip(urls, fps))
        return len(self.prior)

    # --- per-micro-batch update ------------------------------------------
    def update(self, batch: dict) -> int:
        """Consume routed rows: domain, window_id, url, n_chars, text_fp."""
        domains = batch["domain"]
        wids = batch["window_id"]
        urls = batch["url"]
        chars = batch["n_chars"]
        fps = batch["text_fp"]
        panes = self.panes
        seen = self.seen
        prior = self.prior
        frontier = self.frontier
        for d, w, u, c, fp in zip(domains, wids, urls, chars, fps):
            if w <= frontier:
                self.n_late += 1
                continue
            key = (d, w)
            pane = panes.get(key)
            if pane is None:
                pane = [0, 0, 0, 0, 0, 0]
                panes[key] = pane
            pane[0] += 1
            s = seen[d]
            if u in s:
                pane[1] += 1  # duplicate within this crawl stream
            else:
                s.add(u)
                pane[5] += c
                pfp = prior.get(u)
                if pfp is None:
                    pane[2] += 1  # new vs prior crawl
                elif pfp != fp:
                    pane[3] += 1  # changed
                else:
                    pane[4] += 1  # unchanged
        self.rows_seen += len(urls)
        return len(urls)

    # --- finalization -----------------------------------------------------
    def finalize_upto(self, max_window_id: int) -> "pa.Table":
        """Emit and drop panes with window_id <= max_window_id."""
        self.frontier = max(self.frontier, max_window_id)
        done = [k for k in self.panes if k[1] <= max_window_id]
        done.sort()
        cols = {"domain": [], "window_id": []}
        for f in PANE_FIELDS:
            cols[f] = []
        for key in done:
            pane = self.panes.pop(key)
            cols["domain"].append(key[0])
            cols["window_id"].append(key[1])
            for f, v in zip(PANE_FIELDS, pane):
                cols[f].append(v)
        return pa.table(
            {
                "domain": pa.array(cols["domain"], pa.string()),
                "window_id": pa.array(cols["window_id"], pa.int64()),
                **{
                    f: pa.array(cols[f], pa.int64()) for f in PANE_FIELDS
                },
            }
        )

    def pending_windows(self) -> list[int]:
        return sorted({w for (_, w) in self.panes})

    def stats(self) -> dict:
        return {
            "actor_id": self.actor_id,
            "rows_seen": self.rows_seen,
            "open_panes": len(self.panes),
            "domains": len(self.seen),
            "prior_entries": len(self.prior),
            "n_late": self.n_late,
        }

    # --- checkpointing ----------------------------------------------------
    def snapshot(self, batch_idx: int) -> str:
        assert self.checkpoint_dir is not None
        d = os.path.join(self.checkpoint_dir, f"actor-{self.actor_id:04d}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"batch-{batch_idx:06d}.pkl")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(
                {
                    "panes": self.panes,
                    "seen": dict(self.seen),
                    "rows_seen": self.rows_seen,
                    "frontier": self.frontier,
                    "n_late": self.n_late,
                },
                fh,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
        os.replace(tmp, path)
        return path

    def restore(self, batch_idx: int) -> bool:
        assert self.checkpoint_dir is not None
        path = os.path.join(
            self.checkpoint_dir,
            f"actor-{self.actor_id:04d}",
            f"batch-{batch_idx:06d}.pkl",
        )
        if not os.path.exists(path):
            return False
        with open(path, "rb") as fh:
            state = pickle.load(fh)
        self.panes = state["panes"]
        self.seen = defaultdict(set, state["seen"])
        self.rows_seen = state["rows_seen"]
        self.frontier = state["frontier"]
        self.n_late = state["n_late"]
        return True

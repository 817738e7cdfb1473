"""Keyed state-store actors for the streaming CEP engine.

A fixed pool of P ``StateStoreActor``s partitions all mutable stream state
by hash(domain) (hot domains additionally spread by hash(url) for the
dedup/join row flow — the pane merge is the second phase of the salted
two-phase aggregation). Each actor holds:

- tumbling window panes: (domain, window_id) -> [n_pages, n_dup, n_new,
  n_changed, n_unchanged, total_chars]
- sliding-window slide panes: (domain, slide_id) -> [n_pages, total_chars]
  (a sliding window of ``slide_count`` slides aggregates the additive
  fields of its member slides; slides are pruned once out of range)
- session-window state: domain -> merged [start, end, n, chars] fragments,
  routed by hash(domain) so each domain's session lives on ONE actor
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
import zlib
from bisect import bisect_left
from collections import defaultdict

import pyarrow as pa

import ray


def route_partition(domain: str, url: str, num_partitions: int) -> int:
    """Salted routing: same (domain,url) always lands on one actor while a
    hot domain spreads across the pool. crc32 is stable across processes
    (python hash() is per-process salted) and C-speed in the hot path."""
    return zlib.crc32(f"{domain}\x00{url}".encode()) % num_partitions


def route_domain(domain: str, num_partitions: int) -> int:
    """Unsalted per-domain routing (session state must be co-located)."""
    return zlib.crc32(domain.encode()) % num_partitions


PANE_FIELDS = [
    "n_pages", "n_dup", "n_new", "n_changed", "n_unchanged", "total_chars",
]
SLIDE_FIELDS = ["n_pages", "total_chars"]
SESSION_FIELDS = ["session_start", "session_end", "n_events", "total_chars"]


@ray.remote
class StateStoreActor:
    def __init__(
        self,
        actor_id: int,
        checkpoint_dir: str | None = None,
        *,
        slide_count: int = 1,
        session_gap_us: int = 0,
    ):
        self.actor_id = actor_id
        self.checkpoint_dir = checkpoint_dir
        self.slide_count = max(1, slide_count)
        self.session_gap_us = session_gap_us
        # (domain, window_id) -> [PANE_FIELDS]
        self.panes: dict[tuple[str, int], list] = {}
        # (domain, slide_id) -> [SLIDE_FIELDS]
        self.slides: dict[tuple[str, int], list] = {}
        # domain -> sorted list of [start, end, n, chars] fragments
        self.sessions: dict[str, list] = defaultdict(list)
        # domain -> set(url)
        self.seen: dict[str, set] = defaultdict(set)
        # prior crawl: url -> text fingerprint
        self.prior: dict[str, int] = {}
        self.rows_seen = 0
        # Highest finalized window id: rows at or below are late beyond
        # allowed lateness and are dropped (counted), never re-opened.
        self.frontier = -(1 << 62)
        # Event-time watermark below which sessions have been finalized.
        self.session_frontier = -(1 << 62)
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
        slides = self.slides
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
            slide = slides.get(key)
            if slide is None:
                slide = [0, 0]
                slides[key] = slide
            slide[0] += 1
            slide[1] += c
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

    def update_sessions(self, domains: list[str], ts: list[int],
                        chars: list[int]) -> int:
        """Merge events into per-domain session fragments (gap-merge;
        handles out-of-order arrival within allowed lateness)."""
        gap = self.session_gap_us
        n_merged = 0
        for d, t, c in zip(domains, ts, chars):
            if t <= self.session_frontier:
                self.n_late += 1
                continue
            frags = self.sessions[d]
            starts = [f[0] for f in frags]
            i = bisect_left(starts, t)
            # candidate predecessor (i-1) and successor (i)
            joined = None
            if i > 0 and t - frags[i - 1][1] <= gap:
                joined = frags[i - 1]
                joined[1] = max(joined[1], t)
                joined[2] += 1
                joined[3] += c
                pos = i - 1
            elif i < len(frags) and frags[i][0] - t <= gap:
                joined = frags[i]
                joined[0] = min(joined[0], t)
                joined[2] += 1
                joined[3] += c
                pos = i
            else:
                frags.insert(i, [t, t, 1, c])
                pos = i
                joined = frags[i]
            # bridge with the next fragment if now within gap
            while (
                pos + 1 < len(frags)
                and frags[pos + 1][0] - joined[1] <= gap
            ):
                nxt = frags.pop(pos + 1)
                joined[1] = max(joined[1], nxt[1])
                joined[2] += nxt[2]
                joined[3] += nxt[3]
            n_merged += 1
        return n_merged

    # --- finalization -----------------------------------------------------
    def finalize_upto(self, max_window_id: int) -> "pa.Table":
        """Emit and drop tumbling panes with window_id <= max_window_id."""
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

    def finalize_sliding(self, prev_max_window: int,
                         max_window_id: int) -> "pa.Table":
        """Emit sliding-window partials for window ids in
        (prev_max_window, max_window_id]: window w sums the additive slide
        fields over slides [w - slide_count + 1, w]. Slides older than
        max_window_id - slide_count + 1 can never contribute again and are
        pruned."""
        k = self.slide_count
        out = {"domain": [], "window_id": [], "n_pages": [],
               "total_chars": []}
        if max_window_id > prev_max_window:
            by_domain: dict[str, dict[int, list]] = defaultdict(dict)
            for (d, sid), v in self.slides.items():
                by_domain[d][sid] = v
            for d in sorted(by_domain):
                smap = by_domain[d]
                # candidate windows = those overlapping an existing slide,
                # restricted to (prev_max, max]; keeps the final flush
                # (max = +inf sentinel) bounded by the live slides.
                cand = set()
                for sid in smap:
                    for w in range(sid, sid + k):
                        if prev_max_window < w <= max_window_id:
                            cand.add(w)
                for w in sorted(cand):
                    n = ch = 0
                    for sid in range(w - k + 1, w + 1):
                        v = smap.get(sid)
                        if v is not None:
                            n += v[0]
                            ch += v[1]
                    if n:
                        out["domain"].append(d)
                        out["window_id"].append(w)
                        out["n_pages"].append(n)
                        out["total_chars"].append(ch)
            prune_below = max_window_id - k + 1
            for key in [k2 for k2 in self.slides if k2[1] < prune_below]:
                del self.slides[key]
        return pa.table(
            {
                "domain": pa.array(out["domain"], pa.string()),
                "window_id": pa.array(out["window_id"], pa.int64()),
                "n_pages": pa.array(out["n_pages"], pa.int64()),
                "total_chars": pa.array(out["total_chars"], pa.int64()),
            }
        )

    def finalize_sessions(self, watermark_us: int) -> "pa.Table":
        """Emit sessions that can no longer grow: end + gap <= watermark."""
        gap = self.session_gap_us
        self.session_frontier = max(self.session_frontier, watermark_us)
        out = {f: [] for f in ("domain", *SESSION_FIELDS)}
        empty_domains = []
        for d in sorted(self.sessions):
            frags = self.sessions[d]
            keep = []
            for f in frags:
                if f[1] + gap <= watermark_us:
                    out["domain"].append(d)
                    out["session_start"].append(f[0])
                    out["session_end"].append(f[1])
                    out["n_events"].append(f[2])
                    out["total_chars"].append(f[3])
                else:
                    keep.append(f)
            if keep:
                self.sessions[d] = keep
            else:
                empty_domains.append(d)
        for d in empty_domains:
            del self.sessions[d]
        return pa.table(
            {
                "domain": pa.array(out["domain"], pa.string()),
                **{
                    f: pa.array(out[f], pa.int64()) for f in SESSION_FIELDS
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
            "open_slides": len(self.slides),
            "open_sessions": sum(len(v) for v in self.sessions.values()),
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
                    "slides": self.slides,
                    "sessions": dict(self.sessions),
                    "seen": dict(self.seen),
                    "rows_seen": self.rows_seen,
                    "frontier": self.frontier,
                    "session_frontier": self.session_frontier,
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
        self.slides = state.get("slides", {})
        self.sessions = defaultdict(list, state.get("sessions", {}))
        self.seen = defaultdict(set, state["seen"])
        self.rows_seen = state["rows_seen"]
        self.frontier = state["frontier"]
        self.session_frontier = state.get("session_frontier", -(1 << 62))
        self.n_late = state["n_late"]
        return True

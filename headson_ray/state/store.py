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
- per-domain seen-url dedup state: a tiered SeenStore (bounded hot dict
  + sqlite cold tier under the checkpoint dir) so actor memory stays
  FLAT however many urls stream through; optional bloom mode
- the prior-crawl index (url -> text fingerprint) for the delta join,
  tiered the same way (PriorIndex)

State snapshots to the checkpoint directory per micro-batch (atomic
write + rename; the sqlite cold tier commits transactionally at the same
point and is rolled back to the restore batch on resume), so a killed
run restores the exact pre-batch state and re-emits byte-identical
window files (exactly-once with the deterministic sink in
sinks/parquet.py).
"""

from __future__ import annotations

import os
import pickle
import sqlite3
import tempfile
from bisect import bisect_left
from collections import defaultdict

import numpy as np
import pyarrow as pa

import ray


class SeenStore:
    """Tiered EXACT seen-(domain, url) store with bounded actor memory.

    - hot tier: python dict[domain] -> set(url), capped at
      `max_mem_entries` total urls;
    - cold tier: a sqlite table under the checkpoint dir, filled by
      spilling the whole hot tier once the cap is crossed. Lookups hit
      the hot set first, then (only if a spill ever happened) sqlite.

    Exactly-once integration: cold-tier rows are tagged with the
    micro-batch that inserted them and are only COMMITTED by
    `checkpoint_commit(batch)` (the actor snapshot point). A crash before
    the snapshot rolls the journal back; a crash after the snapshot but
    before the sink commit is undone on restore by deleting rows with
    batch > restore point — so replayed batches see the exact pre-batch
    state and re-emit byte-identical windows. The hot tier (bounded) is
    pickled inside the regular actor snapshot; cold-tier growth never
    re-serializes old entries (incremental, unlike the old
    whole-dict-per-snapshot pickle).

    `mode="bloom"` swaps the store for a fixed-size bloom filter
    (documented approximate alternative: ~zero memory growth, a false
    positive wrongly counts a new url as duplicate at ~(1-e^{-kn/m})^k
    rate; no spill, snapshot carries the bit array)."""

    def __init__(
        self,
        spill_path: str,
        *,
        max_mem_entries: int = 500_000,
        mode: str = "exact",
        bloom_bits: int = 1 << 24,
    ):
        self.spill_path = spill_path
        self.max_mem = max_mem_entries
        self.mode = mode
        self.mem: dict[str, set] = defaultdict(set)
        self.mem_count = 0
        self.total = 0
        self.current_batch = 0
        self.spilled = False
        self.con: sqlite3.Connection | None = None
        if mode == "bloom":
            self.bloom = np.zeros(bloom_bits // 8, dtype=np.uint8)
            self.bloom_bits = bloom_bits

    # -- sqlite tier -------------------------------------------------------
    def _ensure_db(self) -> sqlite3.Connection:
        if self.con is None:
            os.makedirs(os.path.dirname(self.spill_path), exist_ok=True)
            self.con = sqlite3.connect(self.spill_path)
            self.con.execute(
                "CREATE TABLE IF NOT EXISTS seen ("
                "domain TEXT, url TEXT, batch INTEGER,"
                "PRIMARY KEY (domain, url)) WITHOUT ROWID"
            )
        return self.con

    def _spill(self) -> None:
        con = self._ensure_db()
        con.executemany(
            "INSERT OR IGNORE INTO seen VALUES (?, ?, ?)",
            (
                (d, u, self.current_batch)
                for d, urls in self.mem.items()
                for u in urls
            ),
        )
        self.mem.clear()
        self.mem_count = 0
        self.spilled = True

    # -- bloom tier --------------------------------------------------------
    def _bloom_positions(self, d: str, u: str) -> np.ndarray:
        # one blake2b call yields two independent 64-bit words for the
        # double-hashing scheme (paired crc32 would give only ~32 bits
        # of entropy and could never address blooms past 2^32 bits —
        # see the hashing rule in CLAUDE.md)
        import hashlib

        dig = hashlib.blake2b(
            f"{d}\x00{u}".encode(), digest_size=16
        ).digest()
        h = int.from_bytes(dig[:8], "little")
        h2 = int.from_bytes(dig[8:], "little")
        return (
            (np.uint64(h) + np.arange(4, dtype=np.uint64) * np.uint64(h2 | 1))
            % np.uint64(self.bloom_bits)
        )

    # -- api ---------------------------------------------------------------
    def add_if_new(self, d: str, u: str) -> bool:
        """True if (d, u) was NOT seen before (and records it)."""
        return bool(self.add_if_new_batch([d], [u])[0])

    def add_if_new_batch(
        self, domains: list[str], urls: list[str]
    ) -> np.ndarray:
        """Vectorized membership+insert: returns a bool array where True
        means (d, u) was NOT seen before this call (first in-batch
        occurrence wins). Once spilled, the cold tier is probed with ONE
        temp-table JOIN per batch instead of one SELECT per row (the
        per-row point query was the CEP throughput ceiling). The join
        probes the (domain, url) PRIMARY KEY — a row-value
        `IN (VALUES ...)` form would full-scan the seen table in
        sqlite and anti-scale with cold-tier size."""
        n = len(urls)
        self.total += n
        out = np.zeros(n, dtype=bool)
        if self.mode == "bloom":
            # bloom bits set by earlier rows must be visible to later
            # rows (sequential semantics), so this stays a per-row loop
            # over the (cheap) bit ops; the exact tier is the hot path.
            for i, (d, u) in enumerate(zip(domains, urls)):
                pos = self._bloom_positions(d, u)
                byte, bit = pos >> np.uint64(3), pos & np.uint64(7)
                hits = (self.bloom[byte] >> bit.astype(np.uint8)) & 1
                if hits.all():
                    continue
                np.bitwise_or.at(
                    self.bloom, byte, (1 << bit).astype(np.uint8)
                )
                out[i] = True
            return out
        # pass 1: hot tier + in-batch first-occurrence
        batch_new: set = set()
        maybe_new: list[int] = []
        mem = self.mem
        for i, (d, u) in enumerate(zip(domains, urls)):
            key = (d, u)
            if key in batch_new:
                continue
            s = mem.get(d)
            if s is not None and u in s:
                continue
            batch_new.add(key)
            maybe_new.append(i)
        # pass 2: one temp-table-join cold-tier probe for the candidates
        if self.spilled and maybe_new:
            con = self.con
            con.execute(
                "CREATE TEMP TABLE IF NOT EXISTS seen_probe "
                "(domain TEXT, url TEXT)"
            )
            con.execute("DELETE FROM seen_probe")
            con.executemany(
                "INSERT INTO seen_probe VALUES (?, ?)",
                ((domains[i], urls[i]) for i in maybe_new),
            )
            found = set(
                con.execute(
                    "SELECT s.domain, s.url FROM seen_probe p "
                    "JOIN seen s ON s.domain = p.domain AND s.url = p.url"
                ).fetchall()
            )
            con.execute("DELETE FROM seen_probe")
            if found:
                maybe_new = [
                    i
                    for i in maybe_new
                    if (domains[i], urls[i]) not in found
                ]
        for i in maybe_new:
            out[i] = True
            mem[domains[i]].add(urls[i])
        self.mem_count += len(maybe_new)
        if self.mem_count > self.max_mem:
            self._spill()
        return out

    def domain_count(self) -> int:
        n = len(self.mem)
        if self.spilled:
            n = max(
                n,
                self.con.execute(
                    "SELECT count(DISTINCT domain) FROM seen"
                ).fetchone()[0],
            )
        return n

    def reset_cold_tier(self) -> None:
        """Drop any cold-tier state from a PREVIOUS run. Called by the
        engine when it starts a FRESH stream (no committed batches) over
        a reused checkpoint dir — without this, stale spilled urls would
        silently count new pages as duplicates. Never called on resume
        (the cold tier there IS the restored state)."""
        if self.con is not None:
            self.con.close()
            self.con = None
        if os.path.exists(self.spill_path):
            os.remove(self.spill_path)
        self.spilled = False
        self.mem.clear()
        self.mem_count = 0
        self.total = 0
        self.current_batch = 0

    # -- checkpoint integration -------------------------------------------
    def checkpoint_commit(self, batch_idx: int) -> None:
        if self.con is not None:
            self.con.commit()
        self.current_batch = batch_idx + 1

    def snapshot_state(self) -> dict:
        state = {
            "mode": self.mode,
            "mem": {d: set(s) for d, s in self.mem.items()},
            "mem_count": self.mem_count,
            "total": self.total,
            "spilled": self.spilled,
        }
        if self.mode == "bloom":
            state["bloom"] = self.bloom.copy()
        return state

    def restore_state(self, state: dict, batch_idx: int) -> None:
        self.mem = defaultdict(set, state["mem"])
        self.mem_count = state["mem_count"]
        self.total = state["total"]
        self.spilled = state["spilled"]
        if self.mode == "bloom" and "bloom" in state:
            self.bloom = state["bloom"].copy()
        # Roll the cold tier back whenever a db file EXISTS — not just
        # when the restored snapshot had spilled=True: if the crashed
        # batch was the FIRST to spill (and its snapshot committed the
        # rows), the pre-spill snapshot carries spilled=False while the
        # db holds future-batch rows that must go.
        if self.spilled or os.path.exists(self.spill_path):
            con = self._ensure_db()
            con.execute("DELETE FROM seen WHERE batch > ?", (batch_idx,))
            con.commit()
        self.current_batch = batch_idx + 1


class BandRegistry:
    """Tiered (LSH band code -> min doc id) registry for the streaming
    near-dup flow (pipelines/streamdedup.py) — the SeenStore tiering
    contract: a bounded hot dict plus an append-only sqlite cold tier,
    so actor memory stays flat however many distinct band codes stream
    through.

    The cold tier is APPEND-ONLY (code, mn, batch) rows rather than a
    min-updated upsert: a probe takes MIN(mn) over a code's rows, and a
    resume rolls back by deleting rows with batch > restore point — an
    in-place min-update could not be rolled back (the pre-update min
    would be lost). The hot tier flushes to the cold tier only at
    snapshot time, tagged with the completing batch, so every flushed
    row is provably part of that batch's committed state; the pickled
    snapshot of an EARLIER batch still carries those entries hot, which
    keeps restore exact in both directions."""

    _PROBE_CHUNK = 900

    def __init__(self, spill_path: str, *, max_mem_entries: int = 500_000):
        self.spill_path = spill_path
        self.max_mem = max_mem_entries
        self.mem: dict[int, int] = {}
        self.spilled = False
        self.con: sqlite3.Connection | None = None

    def _ensure_db(self) -> sqlite3.Connection:
        if self.con is None:
            os.makedirs(os.path.dirname(self.spill_path), exist_ok=True)
            self.con = sqlite3.connect(self.spill_path)
            self.con.execute(
                "CREATE TABLE IF NOT EXISTS bands ("
                "code INTEGER, mn INTEGER, batch INTEGER)"
            )
            self.con.execute(
                "CREATE INDEX IF NOT EXISTS bands_code ON bands (code)"
            )
        return self.con

    def register_batch(self, codes: np.ndarray, ids: np.ndarray) -> None:
        """Fold candidate minima into the hot tier (vectorized per-code
        min first, one dict op per DISTINCT code in the call)."""
        order = np.lexsort((ids, codes))
        c_s, i_s = codes[order], ids[order]
        first = np.ones(c_s.size, dtype=bool)
        first[1:] = c_s[1:] != c_s[:-1]
        mem = self.mem
        for c, i in zip(c_s[first].tolist(), i_s[first].tolist()):
            prev = mem.get(c)
            if prev is None or i < prev:
                mem[c] = i

    def probe_batch(self, codes: np.ndarray) -> np.ndarray:
        """Per code: min registered doc id across both tiers (2**62
        sentinel when the code was never seen)."""
        n = codes.shape[0]
        out = np.full(n, 1 << 62, dtype=np.int64)
        mem = self.mem
        for i, c in enumerate(codes.tolist()):
            v = mem.get(c)
            if v is not None:
                out[i] = v
        if self.spilled:
            uniq = np.unique(codes)
            lookup: dict[int, int] = {}
            con = self._ensure_db()
            u = uniq.tolist()
            for ofs in range(0, len(u), self._PROBE_CHUNK):
                chunk = u[ofs : ofs + self._PROBE_CHUNK]
                ph = ",".join(["?"] * len(chunk))
                cur = con.execute(
                    "SELECT code, MIN(mn) FROM bands WHERE code IN "
                    f"({ph}) GROUP BY code",
                    chunk,
                )
                lookup.update(cur.fetchall())
            if lookup:
                for i, c in enumerate(codes.tolist()):
                    v = lookup.get(c)
                    if v is not None and v < out[i]:
                        out[i] = v
        return out

    def checkpoint_commit(self, batch_idx: int) -> None:
        """Snapshot-time spill: flush the hot tier to the cold tier
        (tagged with the completing batch) when it exceeds the cap, then
        commit. Mid-batch the hot dict may exceed the cap by one batch's
        distinct codes — bounded by micro-batch sizing."""
        if len(self.mem) > self.max_mem:
            con = self._ensure_db()
            con.executemany(
                "INSERT INTO bands VALUES (?, ?, ?)",
                [(c, m, batch_idx) for c, m in self.mem.items()],
            )
            self.mem.clear()
            self.spilled = True
        if self.con is not None:
            self.con.commit()

    def snapshot_state(self) -> dict:
        return {"mem": dict(self.mem), "spilled": self.spilled}

    def restore_state(self, state: dict, batch_idx: int) -> None:
        self.mem = dict(state["mem"])
        self.spilled = state["spilled"]
        # roll the cold tier back whenever a db file exists (the crashed
        # batch may have been the first to spill — SeenStore contract)
        if self.spilled or os.path.exists(self.spill_path):
            con = self._ensure_db()
            con.execute("DELETE FROM bands WHERE batch > ?", (batch_idx,))
            con.commit()

    def reset_cold_tier(self) -> None:
        if self.con is not None:
            self.con.close()
            self.con = None
        if os.path.exists(self.spill_path):
            os.remove(self.spill_path)
        self.spilled = False
        self.mem.clear()

    def __len__(self) -> int:
        n = len(self.mem)
        if self.spilled:
            n += self._ensure_db().execute(
                "SELECT count(DISTINCT code) FROM bands"
            ).fetchone()[0]
        return n


class PriorIndex:
    """url -> fingerprint index for the prior-crawl delta join, with the
    same memory tiering as SeenStore (hot dict up to a cap, then sqlite).
    Loaded fresh by the caller each run (it is join INPUT, not stream
    state), so it needs no checkpoint integration; the spill file is
    truncated on construction."""

    def __init__(self, spill_path: str, *, max_mem_entries: int = 500_000):
        self.spill_path = spill_path
        self.max_mem = max_mem_entries
        self.mem: dict[str, int] = {}
        self.spilled = False
        self.con: sqlite3.Connection | None = None
        self.total = 0
        if os.path.exists(spill_path):
            os.remove(spill_path)

    def _ensure_db(self) -> sqlite3.Connection:
        if self.con is None:
            os.makedirs(os.path.dirname(self.spill_path), exist_ok=True)
            self.con = sqlite3.connect(self.spill_path)
            self.con.execute(
                "CREATE TABLE IF NOT EXISTS prior ("
                "url TEXT PRIMARY KEY, fp INTEGER) WITHOUT ROWID"
            )
        return self.con

    def update(self, urls: list, fps: list) -> None:
        self.mem.update(zip(urls, fps))
        if len(self.mem) > self.max_mem:
            con = self._ensure_db()
            con.executemany(
                "INSERT OR REPLACE INTO prior VALUES (?, ?)",
                self.mem.items(),
            )
            con.commit()
            self.mem.clear()
            self.spilled = True

    def get(self, url: str):
        fp = self.mem.get(url)
        if fp is not None or not self.spilled:
            return fp
        row = self.con.execute(
            "SELECT fp FROM prior WHERE url = ?", (url,)
        ).fetchone()
        return row[0] if row else None

    # chunk size for the batched cold-tier lookup (sqlite variable cap)
    _PROBE_CHUNK = 900

    def get_batch(
        self, urls: list[str]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized lookup: (found_mask, fps) arrays. Hot-tier hits
        resolve from the dict; misses probe the cold tier with ONE
        chunked IN query per batch instead of a SELECT per row."""
        n = len(urls)
        found = np.zeros(n, dtype=bool)
        fps = np.zeros(n, dtype=np.int64)
        misses: list[int] = []
        mem = self.mem
        for i, u in enumerate(urls):
            fp = mem.get(u)
            if fp is not None:
                found[i] = True
                fps[i] = fp
            elif self.spilled:
                misses.append(i)
        if misses:
            lookup: dict[str, int] = {}
            for ofs in range(0, len(misses), self._PROBE_CHUNK):
                chunk = misses[ofs : ofs + self._PROBE_CHUNK]
                placeholders = ",".join(["?"] * len(chunk))
                cur = self.con.execute(
                    "SELECT url, fp FROM prior WHERE url IN "
                    f"({placeholders})",
                    [urls[i] for i in chunk],
                )
                lookup.update(cur.fetchall())
            for i in misses:
                fp = lookup.get(urls[i])
                if fp is not None:
                    found[i] = True
                    fps[i] = fp
        return found, fps

    def __len__(self) -> int:
        # stats-only figure; mem may briefly shadow spilled urls
        n = len(self.mem)
        if self.spilled:
            n += self.con.execute(
                "SELECT count(*) FROM prior"
            ).fetchone()[0]
        return n


def route_partition(domain: str, url: str, num_partitions: int) -> int:
    """Salted routing: same (domain,url) always lands on one actor while a
    hot domain spreads across the pool. Scalar reference of
    route_partitions_batch (stages/hashing.py family: process-stable,
    64-bit, and the batch form is fully vectorized — python hash() is
    per-process salted and per-row crc32 calls were the hot-path cost)."""
    from ..stages.hashing import hash_pair_int

    return hash_pair_int(domain, url) % num_partitions


def route_domain(domain: str, num_partitions: int) -> int:
    """Unsalted per-domain routing (session state must be co-located).
    Scalar reference of route_domains_batch."""
    from ..stages.hashing import horner_hash_int

    return horner_hash_int(domain) % num_partitions


def route_partitions_batch(
    domains: list[str], urls: list[str], num_partitions: int
) -> "np.ndarray":
    """Vectorized route_partition over a batch (int64 partition ids)."""
    from ..stages.hashing import hash_string_pairs

    h = hash_string_pairs(domains, urls)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def route_domains_batch(
    domains: list[str], num_partitions: int
) -> "np.ndarray":
    """Vectorized route_domain over a batch (int64 partition ids)."""
    from ..stages.hashing import hash_strings

    h = hash_strings(domains)
    return (h % np.uint64(num_partitions)).astype(np.int64)


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
        seen_mem_entries: int = 500_000,
        seen_mode: str = "exact",
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
        # tiered (domain, url) dedup state + prior-crawl join index:
        # bounded actor memory, sqlite cold tier under the checkpoint dir
        spill_base = checkpoint_dir or tempfile.mkdtemp(
            prefix="headson-state-"
        )
        spill_dir = os.path.join(spill_base, f"actor-{actor_id:04d}")
        self.seen = SeenStore(
            os.path.join(spill_dir, "seen.db"),
            max_mem_entries=seen_mem_entries,
            mode=seen_mode,
        )
        self.prior = PriorIndex(
            os.path.join(spill_dir, "prior.db"),
            max_mem_entries=seen_mem_entries,
        )
        self.rows_seen = 0
        # Highest finalized window id: rows at or below are late beyond
        # allowed lateness and are dropped (counted), never re-opened.
        self.frontier = -(1 << 62)
        # Event-time watermark below which sessions have been finalized.
        self.session_frontier = -(1 << 62)
        self.n_late = 0

    # --- prior-crawl side (the bounded-memory side of the stream join) ---
    def load_prior(self, urls: list[str], fps: list[int]) -> int:
        self.prior.update(urls, fps)
        return len(self.prior)

    def reset_cold_tier(self) -> None:
        self.seen.reset_cold_tier()

    # --- per-micro-batch update ------------------------------------------
    def update(self, batch: dict) -> int:
        """Consume routed rows: domain, window_id, url, n_chars, text_fp.

        Vectorized: late-row masking in numpy, ONE batched seen-store
        membership+insert (batched cold-tier probe), ONE batched prior
        lookup for first-seen rows, then a pyarrow group_by that reduces
        the per-row stream to per-(domain, window) increments — the
        python loop below runs once per OPEN PANE touched, not once per
        row (the old per-row loop + per-row sqlite probe was the CEP
        throughput ceiling)."""
        domains = batch["domain"]
        urls = batch["url"]
        wids = np.asarray(batch["window_id"], dtype=np.int64)
        chars = np.asarray(batch["n_chars"], dtype=np.int64)
        fps = np.asarray(batch["text_fp"], dtype=np.int64)
        n = len(urls)
        self.rows_seen += n
        live = wids > self.frontier
        n_live = int(live.sum())
        self.n_late += n - n_live
        if n_live == 0:
            return n
        if n_live < n:
            idx = np.flatnonzero(live)
            domains = [domains[i] for i in idx]
            urls = [urls[i] for i in idx]
            wids = wids[idx]
            chars = chars[idx]
            fps = fps[idx]
        is_new = self.seen.add_if_new_batch(domains, urls)
        found = np.zeros(n_live, dtype=bool)
        pfps = np.zeros(n_live, dtype=np.int64)
        new_idx = np.flatnonzero(is_new)
        if new_idx.size:
            f, p = self.prior.get_batch([urls[i] for i in new_idx])
            found[new_idx] = f
            pfps[new_idx] = p
        dup = ~is_new
        fresh = is_new & ~found
        chg = is_new & found & (pfps != fps)
        unc = is_new & found & (pfps == fps)
        t = pa.table(
            {
                "d": pa.array(domains, pa.string()),
                "w": pa.array(wids),
                "one": pa.array(np.ones(n_live, np.int64)),
                "dup": pa.array(dup.astype(np.int64)),
                "new": pa.array(fresh.astype(np.int64)),
                "chg": pa.array(chg.astype(np.int64)),
                "unc": pa.array(unc.astype(np.int64)),
                # total_chars counts first-seen rows only (dup rows
                # contribute to the pane count but not its chars)
                "ach": pa.array(np.where(is_new, chars, 0)),
                "ch": pa.array(chars),
            }
        )
        fields = ["one", "dup", "new", "chg", "unc", "ach", "ch"]
        g = t.group_by(["d", "w"]).aggregate([(f, "sum") for f in fields])
        gd = g.column("d").to_pylist()
        gw = g.column("w").to_pylist()
        sums = [g.column(f"{f}_sum").to_pylist() for f in fields]
        panes = self.panes
        slides = self.slides
        for j, key in enumerate(zip(gd, gw)):
            pane = panes.get(key)
            if pane is None:
                pane = [0, 0, 0, 0, 0, 0]
                panes[key] = pane
            pane[0] += sums[0][j]
            pane[1] += sums[1][j]
            pane[2] += sums[2][j]
            pane[3] += sums[3][j]
            pane[4] += sums[4][j]
            pane[5] += sums[5][j]
            slide = slides.get(key)
            if slide is None:
                slide = [0, 0]
                slides[key] = slide
            slide[0] += sums[0][j]
            slide[1] += sums[6][j]
        return n

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
    def _spill_partial(self, table: "pa.Table", spill_path: str) -> int:
        """Write a finalization partial to parquet (tmp+rename; replays
        regenerate byte-identical content from the restored state) and
        return its row count — the driver never holds partial rows."""
        import pyarrow.parquet as pq

        os.makedirs(os.path.dirname(spill_path), exist_ok=True)
        tmp = spill_path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, spill_path)
        return table.num_rows

    def finalize_upto(
        self, max_window_id: int, spill_path: str | None = None
    ) -> "pa.Table | int":
        """Emit and drop tumbling panes with window_id <= max_window_id.
        With spill_path the partial goes to parquet (distributed-merge
        mode) and only the row count returns."""
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
        table = pa.table(
            {
                "domain": pa.array(cols["domain"], pa.string()),
                "window_id": pa.array(cols["window_id"], pa.int64()),
                **{
                    f: pa.array(cols[f], pa.int64()) for f in PANE_FIELDS
                },
            }
        )
        if spill_path is not None:
            return self._spill_partial(table, spill_path)
        return table

    def finalize_sliding(self, prev_max_window: int,
                         max_window_id: int,
                         spill_path: str | None = None) -> "pa.Table | int":
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
        table = pa.table(
            {
                "domain": pa.array(out["domain"], pa.string()),
                "window_id": pa.array(out["window_id"], pa.int64()),
                "n_pages": pa.array(out["n_pages"], pa.int64()),
                "total_chars": pa.array(out["total_chars"], pa.int64()),
            }
        )
        if spill_path is not None:
            return self._spill_partial(table, spill_path)
        return table

    def finalize_sessions(
        self, watermark_us: int, spill_path: str | None = None
    ) -> "pa.Table | int":
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
        table = pa.table(
            {
                "domain": pa.array(out["domain"], pa.string()),
                **{
                    f: pa.array(out[f], pa.int64()) for f in SESSION_FIELDS
                },
            }
        )
        if spill_path is not None:
            return self._spill_partial(table, spill_path)
        return table

    def pending_windows(self) -> list[int]:
        return sorted({w for (_, w) in self.panes})

    def stats(self) -> dict:
        return {
            "actor_id": self.actor_id,
            "rows_seen": self.rows_seen,
            "open_panes": len(self.panes),
            "open_slides": len(self.slides),
            "open_sessions": sum(len(v) for v in self.sessions.values()),
            "domains": self.seen.domain_count(),
            "seen_mem_entries": self.seen.mem_count,
            "seen_spilled": self.seen.spilled,
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
        # commit the sqlite cold tier at the snapshot point (incremental:
        # only this batch's inserts hit disk, old entries never rewrite)
        self.seen.checkpoint_commit(batch_idx)
        with open(tmp, "wb") as fh:
            pickle.dump(
                {
                    "panes": self.panes,
                    "slides": self.slides,
                    "sessions": dict(self.sessions),
                    "seen_state": self.seen.snapshot_state(),
                    "rows_seen": self.rows_seen,
                    "frontier": self.frontier,
                    "session_frontier": self.session_frontier,
                    "n_late": self.n_late,
                },
                fh,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
        os.replace(tmp, path)
        # retention: resume only ever restores max(committed batches),
        # and commit(batch_idx) may still fail after this snapshot — so
        # keep this snapshot and the previous one, prune everything
        # older. A long stream's checkpoint dir stays O(num_actors),
        # not O(num_batches).
        for f in os.listdir(d):
            if f.startswith("batch-") and f.endswith(".pkl"):
                try:
                    bi = int(f[len("batch-"):-len(".pkl")])
                except ValueError:
                    continue
                if bi <= batch_idx - 2:
                    os.remove(os.path.join(d, f))
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
        self.seen.restore_state(state["seen_state"], batch_idx)
        self.rows_seen = state["rows_seen"]
        self.frontier = state["frontier"]
        self.session_frontier = state.get("session_frontier", -(1 << 62))
        self.n_late = state["n_late"]
        return True

"""Stateful stream-stream interval join through the CEP machinery.

The north rule names a "stateful stream-stream join held in actor-pool
state stores"; the engine's prior-crawl delta join covers the
stream-to-static side, and this module adds the two-stream case: the
events table streams in EVENT-TIME-ordered micro-batches, clicks
accumulate in per-user join state, and every purchase joins the clicks
of the SAME user within the preceding hour (strictly earlier ts) —
exactly the CEP `click -> purchase` interval pattern of the batch
q_click_purchase_pairs, but emitted incrementally as (user, click_ts,
purchase_ts) pairs with exactly-once per-micro-batch commits.

Correctness shape (mirrors streamdedup's two-phase contract): within a
micro-batch, click rows may be scattered across many worker tasks, so
phase 1 REGISTERS every click of the batch into the join state (hard
barrier), and phase 2 probes the purchases — a purchase therefore sees
every click with smaller ts regardless of task interleaving, and the
join is a pure function of event time. That makes the stream
SQL-replayable: the DuckDB oracle is the plain interval self-join.

Scale posture:
- join state is per-user sorted click timestamps, WATERMARK-BOUNDED:
  after batch b (covering ts < hi_b) every click older than hi_b - W is
  evicted, so an actor holds O(clicks in the last window) — the
  textbook stream-join state bound, no cold tier needed (unlike the
  forever-growing seen/band registries, which tier to sqlite);
- state partitions by user hash across the actor pool; hot users cost
  one binary search per probe, not a scan;
- register and probe are batched worker-side scatters (one actor call
  per partition per task); pairs fold inside the probe task and the
  driver only concatenates the micro-batch ledger (bounded);
- the ledger commits exactly-once (ExactlyOnceSink), actors snapshot
  per batch (retention 2), and a killed run resumes byte-identical.

Reference scope note: kantord/headson has no streaming/join layer
(/root/reference/src/main.rs:140-158); from-scratch Ray Data surface.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sinks.parquet import ExactlyOnceSink

HOUR_US = 3600 * 1_000_000


@ray.remote
class JoinStateActor:
    """One user-hash partition of the click join state."""

    def __init__(self, actor_id: int, checkpoint_dir: str):
        self.actor_id = actor_id
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(
            os.path.join(checkpoint_dir, f"join-{actor_id:04d}"),
            exist_ok=True,
        )
        # user_id -> np.ndarray of click ts (sorted)
        self.clicks: dict[int, np.ndarray] = {}
        self.rows_seen = 0

    def register_clicks(
        self, users: np.ndarray, ts: np.ndarray
    ) -> int:
        """Merge a batch slice of clicks into per-user sorted state."""
        users = np.asarray(users, dtype=np.int64)
        ts = np.asarray(ts, dtype=np.int64)
        order = np.lexsort((ts, users))
        u_s, t_s = users[order], ts[order]
        starts = np.flatnonzero(
            np.r_[True, u_s[1:] != u_s[:-1]]
        )
        bounds = np.r_[starts, u_s.size]
        for i, s in enumerate(starts):
            u = int(u_s[s])
            new = t_s[s : bounds[i + 1]]
            prev = self.clicks.get(u)
            if prev is None:
                self.clicks[u] = new.copy()
            else:
                merged = np.concatenate([prev, new])
                merged.sort(kind="stable")
                self.clicks[u] = merged
        self.rows_seen += int(users.size)
        return int(users.size)

    def probe_purchases(
        self, users: np.ndarray, ts: np.ndarray, window_us: int
    ) -> dict:
        """For each purchase: the user's clicks with
        purchase - W <= click < purchase. Returns flat pair arrays."""
        users = np.asarray(users, dtype=np.int64)
        ts = np.asarray(ts, dtype=np.int64)
        out_u: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        for i in range(users.size):
            u = int(users[i])
            p = int(ts[i])
            cl = self.clicks.get(u)
            if cl is None or cl.size == 0:
                continue
            lo = np.searchsorted(cl, p - window_us, side="left")
            hi = np.searchsorted(cl, p, side="left")  # strict <
            if hi > lo:
                k = hi - lo
                out_u.append(np.full(k, u, dtype=np.int64))
                out_c.append(cl[lo:hi])
                out_p.append(np.full(k, p, dtype=np.int64))
        if not out_u:
            e = np.empty(0, dtype=np.int64)
            return {"user_id": e, "click_ts_us": e, "purchase_ts_us": e}
        return {
            "user_id": np.concatenate(out_u),
            "click_ts_us": np.concatenate(out_c),
            "purchase_ts_us": np.concatenate(out_p),
        }

    def evict(self, min_ts: int) -> int:
        """Watermark eviction: drop clicks older than min_ts; drop
        users whose state empties. Returns surviving click count."""
        total = 0
        for u in list(self.clicks):
            cl = self.clicks[u]
            k = int(np.searchsorted(cl, min_ts, side="left"))
            if k:
                cl = cl[k:].copy()
                if cl.size:
                    self.clicks[u] = cl
                else:
                    del self.clicks[u]
                    continue
            total += int(cl.size)
        return total

    def stats(self) -> dict:
        return {
            "actor_id": self.actor_id,
            "rows_seen": self.rows_seen,
            "users": len(self.clicks),
            "clicks_held": int(
                sum(c.size for c in self.clicks.values())
            ),
        }

    def snapshot(self, batch_idx: int) -> str:
        d = os.path.join(
            self.checkpoint_dir, f"join-{self.actor_id:04d}"
        )
        path = os.path.join(d, f"batch-{batch_idx:06d}.pkl")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(
                {
                    "clicks": {
                        u: c.copy() for u, c in self.clicks.items()
                    },
                    "rows_seen": self.rows_seen,
                },
                fh,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
        os.replace(tmp, path)
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
        path = os.path.join(
            self.checkpoint_dir,
            f"join-{self.actor_id:04d}",
            f"batch-{batch_idx:06d}.pkl",
        )
        if not os.path.exists(path):
            return False
        with open(path, "rb") as fh:
            state = pickle.load(fh)
        self.clicks = state["clicks"]
        self.rows_seen = state["rows_seen"]
        return True

    def reset(self) -> None:
        self.clicks = {}
        self.rows_seen = 0


def _scatter_clicks(actors: list):
    p = len(actors)

    def fn(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        parts = users % p
        refs = []
        for i in range(p):
            idx = np.flatnonzero(parts == i)
            if idx.size:
                refs.append(
                    actors[i].register_clicks.remote(
                        users[idx], ts[idx]
                    )
                )
        ray.get(refs)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    return fn


def _scatter_purchases(actors: list, window_us: int):
    p = len(actors)

    def fn(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        parts = users % p
        refs = []
        for i in range(p):
            idx = np.flatnonzero(parts == i)
            if idx.size:
                refs.append(
                    actors[i].probe_purchases.remote(
                        users[idx], ts[idx], window_us
                    )
                )
        cols = {"user_id": [], "click_ts_us": [], "purchase_ts_us": []}
        for r in ray.get(refs):
            for k in cols:
                cols[k].append(r[k])
        e = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                k: pa.array(
                    np.concatenate(v) if v else e, pa.int64()
                )
                for k, v in cols.items()
            }
        )

    return fn


class StreamJoin:
    """Owns the join-state actor pool + exactly-once pair ledger."""

    def __init__(
        self,
        *,
        out_dir: str,
        checkpoint_dir: str,
        num_state_actors: int = 4,
        window_us: int = HOUR_US,
    ):
        self.sink = ExactlyOnceSink(out_dir)
        self.window_us = window_us
        self.actors = [
            JoinStateActor.remote(i, checkpoint_dir)
            for i in range(num_state_actors)
        ]

    def run(self, groups: list) -> dict:
        """groups: list of (hi_ts_us, factory) — factory() returns the
        micro-batch Dataset of (user_id, event_type, ts_us) rows with
        ts_us < hi (event-time-ordered ranges, reconstructable so a
        resumed run rebuilds the identical stream)."""
        committed = self.sink.committed_batches()
        start_batch = 0
        if committed:
            last = max(committed)
            ok = ray.get(
                [a.restore.remote(last) for a in self.actors]
            )
            if not all(ok):
                raise RuntimeError(
                    f"checkpoint for committed batch {last} missing"
                )
            start_batch = last + 1
        else:
            ray.get([a.reset.remote() for a in self.actors])
        rows_processed = 0
        pairs_emitted = 0
        for b in range(start_batch, len(groups)):
            hi_ts, factory = groups[b]
            ds = factory().materialize()  # consumed by BOTH phases
            # phase 1: register every click of the batch (barrier).
            # NOTE: consume exactly once (take_all) — a re-executed plan
            # would double-deliver clicks and inflate pair multiplicity
            # (the CepEngine route stage documents the same contract).
            n_rows = 0
            for r in (
                ds.filter(expr="event_type == 'click'")
                .map_batches(
                    _scatter_clicks(self.actors),
                    batch_format="pyarrow",
                    batch_size=8192,
                    num_cpus=0.5,
                )
                .take_all()
            ):
                n_rows += int(r["n"])
            # phase 2: probe purchases against complete click state
            parts = ds.filter(
                expr="event_type == 'purchase'"
            ).map_batches(
                _scatter_purchases(self.actors, self.window_us),
                batch_format="pyarrow",
                batch_size=8192,
                num_cpus=0.5,
            )
            tbls = list(
                parts.iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
            ledger = (
                pa.concat_tables(tbls)
                if tbls
                else pa.table(
                    {
                        "user_id": pa.array([], pa.int64()),
                        "click_ts_us": pa.array([], pa.int64()),
                        "purchase_ts_us": pa.array([], pa.int64()),
                    }
                )
            )
            ledger = ledger.sort_by(
                [
                    ("user_id", "ascending"),
                    ("purchase_ts_us", "ascending"),
                    ("click_ts_us", "ascending"),
                ]
            )
            out_file = self.sink.write_windows(b, ledger, kind="pairs")
            # watermark eviction: future purchases have ts >= hi_ts
            held = ray.get(
                [
                    a.evict.remote(int(hi_ts) - self.window_us)
                    for a in self.actors
                ]
            )
            ray.get([a.snapshot.remote(b) for a in self.actors])
            rows_processed += int(ds.count())
            pairs_emitted += ledger.num_rows
            self.sink.commit(
                b,
                {
                    "rows": int(ledger.num_rows),
                    "clicks_registered": n_rows,
                    "clicks_held": int(sum(held)),
                    "out_file": out_file,
                    "state_version": b,
                },
            )
        return {
            "rows_processed": rows_processed,
            "pairs_emitted": pairs_emitted,
            "actor_stats": ray.get(
                [a.stats.remote() for a in self.actors]
            ),
        }

    def read_pairs(self) -> pa.Table:
        import pyarrow.parquet as pq

        tbls = []
        for b in sorted(self.sink.committed_batches()):
            p = self.sink.out_dir / f"pairs-b{b:06d}.parquet"
            if p.exists():
                tbls.append(pq.read_table(p))
        if not tbls:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "click_ts_us": pa.array([], pa.int64()),
                    "purchase_ts_us": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(tbls)


def ts_range_groups(
    paths: list[str], num_batches: int
) -> list:
    """Event-time-ordered micro-batch factories over the events table:
    batch g covers ts_us in [lo + g*span, lo + (g+1)*span) (the last
    range absorbs the max). Bounds derive from two distributed scalars;
    identical on resume."""
    ds = ray.data.read_parquet(paths, columns=["ts"]).map_batches(
        lambda t: pa.table(
            {"ts_us": pc.cast(t.column("ts"), pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    lo = ds.min("ts_us")
    if lo is None:  # empty table -> empty stream, not a min() crash
        return []
    lo = int(lo)
    hi = int(ds.max("ts_us")) + 1
    span = max(1, (hi - lo + num_batches - 1) // num_batches)

    def make(a: int, z: int):
        def factory():
            d = ray.data.read_parquet(
                paths, columns=["user_id", "event_type", "ts"]
            )

            def prep(t: pa.Table) -> pa.Table:
                ts_us = pc.cast(t.column("ts"), pa.int64())
                keep = pc.and_(
                    pc.greater_equal(ts_us, pa.scalar(a)),
                    pc.less(ts_us, pa.scalar(z)),
                )
                t = t.append_column("ts_us", ts_us).filter(keep)
                return t.select(["user_id", "event_type", "ts_us"])

            return d.map_batches(
                prep, batch_format="pyarrow", zero_copy_batch=True
            )

        return factory

    out = []
    for g in range(num_batches):
        a = lo + g * span
        z = hi if g == num_batches - 1 else lo + (g + 1) * span
        out.append((z, make(a, z)))
    return out

"""Update-mode windowed aggregation: late data RE-EMITS corrected panes.

The CepEngine handles lateness by the classic drop-and-count contract
(rows below watermark - allowed_lateness increment n_late and vanish).
This module implements the other standard semantics — Flink-style
ALLOWED-LATENESS UPDATES: every row folds into its (domain, tumbling
window) pane no matter how late it arrives, and a pane that changes
after it was already emitted re-emits with a bumped version number.
Downstream consumers upsert by (domain, win_start) -> latest version,
so the materialized view CONVERGES to the exact batch aggregate once
the stream drains — which is precisely what makes the flow
hash-oracle-able: the final view equals a plain GROUP BY over the
input, however disordered the arrival schedule was.

Scale posture:
- pane state partitions by domain hash across the actor pool; each
  pane is 2 int64 accumulators + a version int, and panes are emitted
  from the actor as Arrow tables (bounded by the panes due per batch);
- per-batch folds are pre-aggregated worker-side ((domain, window)
  partials per Arrow batch — the exchange carries one row per distinct
  pane per block, never raw pages);
- emission ledgers commit exactly-once per micro-batch
  (ExactlyOnceSink kind="updates"), actors snapshot with retention 2,
  and a killed run resumes byte-identical;
- state never evicts (a pane may always receive a later correction);
  at 10^12 rows the pane count is (domains x windows), which is the
  same cardinality the batch aggregate must shuffle anyway — tier to
  the SeenStore sqlite pattern if domains x windows outgrows the pool.

Reference scope note: kantord/headson has no streaming layer
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
from ..stages.derive import add_domain

WINDOW_US = 600 * 1_000_000
LATENESS_US = 60 * 1_000_000


@ray.remote
class LatePaneActor:
    """One domain-hash partition of the updatable pane state."""

    def __init__(self, actor_id: int, checkpoint_dir: str):
        self.actor_id = actor_id
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(
            os.path.join(checkpoint_dir, f"late-{actor_id:04d}"),
            exist_ok=True,
        )
        # (domain, win_start) -> [n_pages, total_chars, version]
        self.panes: dict[tuple, list] = {}
        self.dirty: set[tuple] = set()
        self.rows_seen = 0

    def update(self, domains, wins, counts, chars) -> int:
        n = 0
        for d, w, c, ch in zip(domains, wins, counts, chars):
            key = (d, int(w))
            pane = self.panes.get(key)
            if pane is None:
                self.panes[key] = [int(c), int(ch), 0]
            else:
                pane[0] += int(c)
                pane[1] += int(ch)
            self.dirty.add(key)
            n += int(c)
        self.rows_seen += n
        return n

    def emit_due(self, max_win_start: int) -> pa.Table:
        """Emit every DIRTY pane whose window start <= max_win_start,
        bumping its version: version 1 is the pane's first (on-time)
        finalization, 2+ are late-data corrections."""
        due = sorted(
            k for k in self.dirty if k[1] <= max_win_start
        )
        doms, wins, ns, chs, vers = [], [], [], [], []
        for key in due:
            pane = self.panes[key]
            pane[2] += 1
            doms.append(key[0])
            wins.append(key[1])
            ns.append(pane[0])
            chs.append(pane[1])
            vers.append(pane[2])
            self.dirty.discard(key)
        return pa.table(
            {
                "domain": pa.array(doms, pa.string()),
                "win_start": pa.array(wins, pa.int64()),
                "n_pages": pa.array(ns, pa.int64()),
                "total_chars": pa.array(chs, pa.int64()),
                "version": pa.array(vers, pa.int64()),
            }
        )

    def stats(self) -> dict:
        return {
            "actor_id": self.actor_id,
            "rows_seen": self.rows_seen,
            "panes": len(self.panes),
            "dirty": len(self.dirty),
            "corrections": int(
                sum(1 for p in self.panes.values() if p[2] > 1)
            ),
        }

    def snapshot(self, batch_idx: int) -> str:
        d = os.path.join(
            self.checkpoint_dir, f"late-{self.actor_id:04d}"
        )
        path = os.path.join(d, f"batch-{batch_idx:06d}.pkl")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(
                {
                    "panes": {
                        k: list(v) for k, v in self.panes.items()
                    },
                    "dirty": set(self.dirty),
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
            f"late-{self.actor_id:04d}",
            f"batch-{batch_idx:06d}.pkl",
        )
        if not os.path.exists(path):
            return False
        with open(path, "rb") as fh:
            state = pickle.load(fh)
        self.panes = state["panes"]
        self.dirty = state["dirty"]
        self.rows_seen = state["rows_seen"]
        return True

    def reset(self) -> None:
        self.panes = {}
        self.dirty = set()
        self.rows_seen = 0


def _scatter_panes(actors: list):
    """Worker-side pre-aggregated scatter: fold the batch to (domain,
    win_start) partials, route by domain hash, return (n, max_ts)."""
    p = len(actors)

    def fn(batch: pa.Table) -> pa.Table:
        batch = add_domain(batch)
        ts = pc.cast(batch.column("warc_ts"), pa.int64())
        win = pc.multiply(
            pc.divide(ts, WINDOW_US), pa.scalar(WINDOW_US)
        )
        chars = pc.utf8_length(batch.column("text"))
        part = pa.table(
            {
                "domain": batch.column("domain"),
                "win_start": win,
                "cnt": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
                "chars": pc.cast(chars, pa.int64()),
            }
        ).group_by(["domain", "win_start"]).aggregate(
            [("cnt", "sum"), ("chars", "sum")]
        )
        doms = [
            "" if d is None else d
            for d in part.column("domain").to_pylist()
        ]
        wins = part.column("win_start").to_numpy(zero_copy_only=False)
        cnts = part.column("cnt_sum").to_numpy(zero_copy_only=False)
        chs = part.column("chars_sum").to_numpy(zero_copy_only=False)
        from ..state.store import route_domains_batch

        parts = route_domains_batch(doms, p)
        refs = []
        for i in range(p):
            idx = np.flatnonzero(parts == i)
            if idx.size:
                refs.append(
                    actors[i].update.remote(
                        [doms[j] for j in idx],
                        wins[idx],
                        cnts[idx],
                        chs[idx],
                    )
                )
        ray.get(refs)
        mx = int(pc.max(ts).as_py()) if batch.num_rows else -1
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "max_ts": pa.array([mx], pa.int64()),
            }
        )

    return fn


_EMPTY_LEDGER = pa.table(
    {
        "domain": pa.array([], pa.string()),
        "win_start": pa.array([], pa.int64()),
        "n_pages": pa.array([], pa.int64()),
        "total_chars": pa.array([], pa.int64()),
        "version": pa.array([], pa.int64()),
    }
)


class LateUpdateStream:
    """Owns the pane actor pool + exactly-once update ledger."""

    def __init__(
        self,
        *,
        out_dir: str,
        checkpoint_dir: str,
        num_state_actors: int = 4,
        window_us: int = WINDOW_US,
        lateness_us: int = LATENESS_US,
    ):
        self.sink = ExactlyOnceSink(out_dir)
        self.window_us = window_us
        self.lateness_us = lateness_us
        self.watermark = -1
        self.actors = [
            LatePaneActor.remote(i, checkpoint_dir)
            for i in range(num_state_actors)
        ]

    def run(self, groups: list, *, final_flush: bool = True) -> dict:
        """groups: micro-batch factories returning (url, warc_ts, text)
        Datasets — arrival order is the STREAM order, deliberately
        allowed to be out of event-time order (that is the point)."""
        import json as _json

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
            with open(self.sink.manifest_path) as fh:
                for line in fh:
                    rec = _json.loads(line)
                    if rec.get("kind") == "commit" and rec["batch"] <= last:
                        self.watermark = max(
                            self.watermark, rec["watermark"]
                        )
        else:
            ray.get([a.reset.remote() for a in self.actors])
        rows_processed = 0
        emissions = 0
        n_batches = len(groups)
        for b in range(start_batch, n_batches):
            stats = groups[b]().map_batches(
                _scatter_panes(self.actors),
                batch_format="pyarrow",
                batch_size=4096,
                num_cpus=0.5,
            )
            # NOTE: consume exactly once — a re-executed plan would
            # double-fold partials into the pane accumulators.
            rows = 0
            for r in stats.take_all():
                rows += int(r["n"])
                self.watermark = max(self.watermark, int(r["max_ts"]))
            wm = self.watermark - self.lateness_us
            max_win_start = (wm // self.window_us - 1) * self.window_us
            tbls = ray.get(
                [
                    a.emit_due.remote(max_win_start)
                    for a in self.actors
                ]
            )
            ledger = pa.concat_tables(
                [t for t in tbls if t.num_rows] or [_EMPTY_LEDGER]
            ).sort_by(
                [("domain", "ascending"), ("win_start", "ascending")]
            )
            out_file = self.sink.write_windows(b, ledger, kind="updates")
            ray.get([a.snapshot.remote(b) for a in self.actors])
            rows_processed += rows
            emissions += ledger.num_rows
            self.sink.commit(
                b,
                {
                    "rows": rows,
                    "emissions": int(ledger.num_rows),
                    "watermark": int(self.watermark),
                    "out_file": out_file,
                    "state_version": b,
                },
            )
        if final_flush and n_batches > start_batch:
            b = n_batches
            if b not in self.sink.committed_batches():
                tbls = ray.get(
                    [a.emit_due.remote(1 << 62) for a in self.actors]
                )
                ledger = pa.concat_tables(
                    [t for t in tbls if t.num_rows] or [_EMPTY_LEDGER]
                ).sort_by(
                    [
                        ("domain", "ascending"),
                        ("win_start", "ascending"),
                    ]
                )
                out_file = self.sink.write_windows(
                    b, ledger, kind="updates"
                )
                ray.get([a.snapshot.remote(b) for a in self.actors])
                emissions += ledger.num_rows
                self.sink.commit(
                    b,
                    {
                        "rows": 0,
                        "emissions": int(ledger.num_rows),
                        "watermark": int(self.watermark),
                        "out_file": out_file,
                        "state_version": b,
                    },
                )
        return {
            "rows_processed": rows_processed,
            "emissions": emissions,
            "actor_stats": ray.get(
                [a.stats.remote() for a in self.actors]
            ),
        }

    def ledger_files(self) -> list[str]:
        out = []
        for b in sorted(self.sink.committed_batches()):
            p = self.sink.out_dir / f"updates-b{b:06d}.parquet"
            if p.exists():
                out.append(str(p))
        return out

    def materialized_view(self) -> "ray.data.Dataset":
        """Upsert-latest view: one row per (domain, win_start) at its
        highest version — a distributed groupby over the committed
        ledgers, never a driver fold."""
        files = self.ledger_files()
        if not files:
            return ray.data.from_arrow(
                _EMPTY_LEDGER.drop_columns(["version"])
            )

        def latest(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group, sort_keys=[("version", "descending")]
            )
            return group.take(idx).slice(0, 1).drop_columns(["version"])

        return (
            ray.data.read_parquet(files)
            .groupby(["domain", "win_start"])
            .map_groups(latest, batch_format="pyarrow")
        )


def late_shuffled_groups(
    paths: list[str], num_batches: int
) -> list:
    """Event-time ranges processed in PAIR-SWAPPED order (1,0,3,2,...):
    every even range arrives after its later sibling advanced the
    watermark past it, so its rows are genuinely late and force
    versioned re-emissions — while the converged view stays exactly the
    batch aggregate. Bounds derive from two distributed scalars and
    rebuild identically on resume."""
    ds = ray.data.read_parquet(paths, columns=["warc_ts"]).map_batches(
        lambda t: pa.table(
            {"ts_us": pc.cast(t.column("warc_ts"), pa.int64())}
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
                paths, columns=["url", "warc_ts", "text"]
            )

            def prep(t: pa.Table) -> pa.Table:
                ts_us = pc.cast(t.column("warc_ts"), pa.int64())
                keep = pc.and_(
                    pc.greater_equal(ts_us, pa.scalar(a)),
                    pc.less(ts_us, pa.scalar(z)),
                )
                return t.filter(keep)

            return d.map_batches(
                prep, batch_format="pyarrow", zero_copy_batch=True
            )

        return factory

    ranges = []
    for g in range(num_batches):
        a = lo + g * span
        z = hi if g == num_batches - 1 else lo + (g + 1) * span
        ranges.append(make(a, z))
    order = []
    for g in range(0, num_batches, 2):
        if g + 1 < num_batches:
            order.extend([g + 1, g])
        else:
            order.append(g)
    return [ranges[i] for i in order]

"""Streaming CEP engine: micro-batch driver with event-time watermarks,
keyed actor state (dedup + prior-crawl delta join), tumbling + sliding +
session windows, exactly-once sink and checkpoint/resume.

Window kinds (all event-time, watermark-finalized):
- tumbling: (domain, window_id=ts//size) panes with dedup/delta-join
  metrics; salted across actors, merged two-phase.
- sliding: size = slide_count x tumbling size, slide = tumbling size;
  additive metrics (n_pages, total_chars) summed over member slides.
- session: per-domain gap-merged [start, end] fragments, routed by
  hash(domain) so each domain's session state lives on exactly one actor;
  a session finalizes when watermark passes end + gap.

Dataflow per micro-batch (a group of parquet shards — the event-time-ordered
page stream):

    read_parquet(shards)                        # pruned columns
      -> map_batches(prepare)                   # domain, window_id, fp (vectorized)
      -> map_batches(make_router(actors))       # salted hash(domain,url) routing
    actors.update(...)                          # panes, dedup sets, delta join
    watermark = max event ts seen - allowed_lateness
    actors.finalize_upto(watermark_window)      # pop finalized partial panes
    driver merges partials (2nd phase of salted two-phase aggregation)
      -> ExactlyOnceSink.write_windows + commit(lineage)
    actors.snapshot(batch)                      # atomic state checkpoint

A killed run resumes from the last committed batch: actor state restores
from that batch's snapshot, committed batches are skipped, and the replayed
batch regenerates byte-identical window files (deterministic merge order).

Late rows whose window already finalized are counted and dropped (standard
allowed-lateness semantics); `n_late` is reported in lineage.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sinks.parquet import ExactlyOnceSink
from ..state.store import (
    PANE_FIELDS,
    StateStoreActor,
)
from ..stages.derive import add_domain


def text_fingerprint_column(texts: pa.ChunkedArray) -> pa.Array:
    """Stable 64-bit per-row content fingerprint for change detection:
    the vectorized stages/hashing.py family (one numpy pass per batch),
    not per-row crc32 (32 bits, one python-loop C call per row — see the
    hashing rule in CLAUDE.md). Nulls fingerprint to 0."""
    import numpy as np

    from ..stages.hashing import hash_strings

    lst = texts.to_pylist()
    fps = hash_strings(["" if t is None else t for t in lst]).view(np.int64)
    nulls = np.fromiter(
        (t is None for t in lst), dtype=bool, count=len(lst)
    )
    if nulls.any():
        fps = fps.copy()
        fps[nulls] = 0
    return pa.array(fps, pa.int64())


def _prepare(size_us: int):
    def fn(batch: pa.Table) -> pa.Table:
        batch = add_domain(batch)
        micros = pc.cast(batch.column("warc_ts"), pa.int64())
        wid = pc.divide(micros, pa.scalar(size_us, pa.int64()))
        batch = batch.append_column("window_id", wid)
        batch = batch.append_column(
            "n_chars",
            pc.fill_null(
                pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
                0,
            ),
        )
        batch = batch.append_column(
            "text_fp", text_fingerprint_column(batch.column("text"))
        )
        return batch.select(
            ["domain", "window_id", "url", "n_chars", "text_fp", "warc_ts"]
        )

    return fn


def make_router(actors: list):
    """Task-stage factory: scatters rows to the persistent state actors by
    content hash and returns per-batch (max_ts, n) for the watermark.
    A plain function (task pool) — actor-pool map_batches stages would pay
    pool startup/teardown on every micro-batch Dataset execution, which
    anti-scales with pool size."""
    p = len(actors)

    def route(batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.hashing import combine_hash_pair, hash_strings

        domains = batch.column("domain").to_pylist()
        urls = batch.column("url").to_pylist()
        # fully vectorized routing (stages/hashing.py): one numpy pass
        # per batch, no per-row hashing calls; the domain hash is shared
        # between the salted (domain,url) flow and the session flow
        hd = hash_strings(["" if d is None else d for d in domains])
        hu = hash_strings(urls)
        pu = np.uint64(p)
        part_du = (combine_hash_pair(hd, hu) % pu).astype(np.int64)
        # session flow routes by domain only (session state for a domain
        # must live on one actor); the pane/dedup flow stays salted.
        part_d = (hd % pu).astype(np.int64)
        ts_col = pc.cast(batch.column("warc_ts"), pa.int64())
        refs = []
        for i in range(p):
            mask = part_du == i
            if mask.any():
                sub = batch.filter(pa.array(mask))
                refs.append(
                    actors[i].update.remote(
                        {
                            "domain": sub.column("domain").to_pylist(),
                            "window_id": sub.column(
                                "window_id"
                            ).to_numpy(),
                            "url": sub.column("url").to_pylist(),
                            "n_chars": sub.column("n_chars").to_numpy(),
                            "text_fp": sub.column("text_fp").to_numpy(),
                        }
                    )
                )
            smask = part_d == i
            if smask.any():
                pam = pa.array(smask)
                refs.append(
                    actors[i].update_sessions.remote(
                        pc.array_filter(
                            batch.column("domain"), pam
                        ).to_pylist(),
                        pc.array_filter(ts_col, pam).to_pylist(),
                        pc.array_filter(
                            batch.column("n_chars"), pam
                        ).to_pylist(),
                    )
                )
        # Block until delivered: gives backpressure and guarantees all rows
        # are in actor state before the driver advances the watermark.
        ray.get(refs)
        max_ts = pc.max(pc.cast(batch.column("warc_ts"), pa.int64())).as_py()
        return pa.table(
            {
                "max_ts": pa.array([max_ts], pa.int64()),
                "n": pa.array([batch.num_rows], pa.int64()),
            }
        )

    return route


def _merge_pane_partials(tables: list[pa.Table]) -> pa.Table:
    nonempty = [t for t in tables if t.num_rows > 0]
    if not nonempty:
        return tables[0]
    merged = pa.concat_tables(nonempty)
    agg = merged.group_by(["domain", "window_id"]).aggregate(
        [(f, "sum") for f in PANE_FIELDS]
    )
    agg = agg.rename_columns(
        [c[:-4] if c.endswith("_sum") else c for c in agg.column_names]
    )
    idx = pc.sort_indices(
        agg, sort_keys=[("window_id", "ascending"), ("domain", "ascending")]
    )
    return agg.take(idx)


def _merge_sliding_partials(tables: list[pa.Table]) -> pa.Table:
    """Second phase of the salted two-phase sliding aggregation: sum the
    per-actor partials for each (domain, window_id)."""
    nonempty = [t for t in tables if t.num_rows > 0]
    if not nonempty:
        return tables[0]
    merged = pa.concat_tables(nonempty)
    agg = merged.group_by(["domain", "window_id"]).aggregate(
        [("n_pages", "sum"), ("total_chars", "sum")]
    )
    agg = agg.rename_columns(
        [c[:-4] if c.endswith("_sum") else c for c in agg.column_names]
    )
    idx = pc.sort_indices(
        agg, sort_keys=[("window_id", "ascending"), ("domain", "ascending")]
    )
    return agg.take(idx)


def _merge_session_partials(tables: list[pa.Table]) -> pa.Table:
    """Sessions are domain-local to one actor: concat + deterministic sort
    (no cross-actor merge needed)."""
    nonempty = [t for t in tables if t.num_rows > 0]
    if not nonempty:
        return tables[0]
    merged = pa.concat_tables(nonempty)
    idx = pc.sort_indices(
        merged,
        sort_keys=[("domain", "ascending"), ("session_start", "ascending")],
    )
    return merged.take(idx)


class CepEngine:
    """Owns the actor pool + sink; one instance per streaming run."""

    def __init__(
        self,
        *,
        out_dir: str,
        checkpoint_dir: str,
        num_state_actors: int = 4,
        window_size_s: int = 3600,
        allowed_lateness_s: int = 60,
        slide_count: int = 3,
        session_gap_s: int = 1800,
        summarize_budget: int | None = None,
        summarizer_concurrency: int | tuple = 4,
        seen_mem_entries: int = 500_000,
        seen_mode: str = "exact",
        distributed_merge_threshold: int = 500_000,
        merge_parts: int = 8,
    ):
        self.sink = ExactlyOnceSink(out_dir)
        self.checkpoint_dir = checkpoint_dir
        self.window_size_us = window_size_s * 1_000_000
        self.lateness_us = allowed_lateness_s * 1_000_000
        self.slide_count = slide_count
        self.session_gap_us = session_gap_s * 1_000_000
        self.actors = [
            StateStoreActor.remote(
                i,
                checkpoint_dir,
                slide_count=slide_count,
                session_gap_us=self.session_gap_us,
                seen_mem_entries=seen_mem_entries,
                seen_mode=seen_mode,
            )
            for i in range(num_state_actors)
        ]
        self.watermark = -1
        # highest window id already emitted for the sliding flow
        self.sliding_frontier = -(1 << 62)
        # when one finalization holds more open windows than this, the
        # second-phase merge runs DISTRIBUTED (actors spill partials to
        # parquet, a Ray groupby merges, deterministic partitioned
        # write) instead of concatenating partials on the driver — the
        # final flush of a long stream would otherwise materialize every
        # remaining pane driver-side
        self.distributed_merge_threshold = distributed_merge_threshold
        self.merge_parts = merge_parts
        # optional per-document summarize stage chained ahead of the window
        # flow: previews are written exactly-once per micro-batch and the
        # window stage consumes the durable preview output.
        self.summarize_budget = summarize_budget
        if isinstance(summarizer_concurrency, tuple):
            summarizer_concurrency = summarizer_concurrency[-1]
        self.summarizer_concurrency = summarizer_concurrency

    def load_prior_crawl(self, paths: list[str]) -> int:
        """Load the prior-crawl index (the join side) into the actor pool
        WORKER-SIDE: a map_batches task stage fingerprints each batch and
        scatters (url, fp) slices straight to the state actors using the
        same vectorized routing hash as the live stream (make_router), so
        the corpus-sized prior crawl never flows through the driver — the
        driver only sums tiny per-batch row counts. Domain derivation
        matches the stream's add_domain, keeping (domain, url) routing
        consistent between the prior index and the rows that probe it."""
        actors = self.actors
        p = len(actors)

        def scatter(batch: pa.Table) -> pa.Table:
            import numpy as np

            from ..state.store import route_partitions_batch

            batch = add_domain(batch)
            urls = batch.column("url").to_pylist()
            doms = [
                "" if d is None else d
                for d in batch.column("domain").to_pylist()
            ]
            fps = text_fingerprint_column(batch.column("text")).to_numpy()
            # MUST be the same routing as the live stream's make_router —
            # a drift puts prior entries on the wrong actor and every
            # page silently classifies as new
            parts = route_partitions_batch(doms, urls, p)
            refs = []
            for i in range(p):
                idx = np.flatnonzero(parts == i)
                if idx.size:
                    refs.append(
                        actors[i].load_prior.remote(
                            [urls[j] for j in idx],
                            fps[idx].tolist(),
                        )
                    )
            # block until delivered (backpressure; all rows are in actor
            # state before the driver sees this batch's count)
            ray.get(refs)
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        ds = ray.data.read_parquet(paths, columns=["url", "text"])
        stats = ds.map_batches(
            scatter,
            batch_format="pyarrow",
            batch_size=8192,
            num_cpus=0.5,
        )
        # the only thing that reaches the driver: one-row count tables
        total = 0
        for b in stats.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        ):
            s = pc.sum(b.column("n")).as_py()
            total += int(s or 0)
        return total

    def _summarize_batch(self, ds, b: int):
        """Per-document summarize stage chained ahead of the window flow,
        fused into the SAME streaming execution as prepare/route (no
        mid-pipeline materialize). Each task writes its own previews file
        (parallel IO) under out/previews/b{b}, content-addressed by the
        crc32 of its url list; the whole directory is wiped before a
        non-committed batch (re)runs, so replays converge exactly-once."""
        import os
        import shutil

        import pyarrow.parquet as pq_mod

        prev_dir = str(self.sink.out_dir / "previews" / f"b{b:06d}")
        shutil.rmtree(prev_dir, ignore_errors=True)
        os.makedirs(prev_dir, exist_ok=True)
        from ..stages.summarize import Summarizer

        budget = self.summarize_budget

        def summarize_fn(batch: pa.Table) -> pa.Table:
            # stateless TASK stage: config build is microseconds against
            # ~1s of per-batch summarize work, and task pools don't pay
            # the per-micro-batch actor-pool startup/teardown that made
            # larger pools anti-scale (the flagship pipeline runs ONE
            # Dataset execution and uses the stateful actor-pool form)
            out = Summarizer(budget=budget)(batch)
            urls = "\n".join(out.column("url").to_pylist()).encode()
            name = f"part-{zlib.crc32(urls):08x}.parquet"
            # unique tmp: a re-executed task racing its original on one
            # fixed tmp path could interleave writers; content is
            # deterministic so last-rename-wins stays byte-identical
            import uuid

            tmp = os.path.join(
                prev_dir, f"{name}.{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp"
            )
            pq_mod.write_table(out, tmp)
            os.replace(tmp, os.path.join(prev_dir, name))
            return out.select(["url", "warc_ts", "text"])

        return ds.map_batches(
            summarize_fn,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1024,
            # cap concurrent summarize TASKS (this is a task pool, not an
            # actor pool): leaves headroom for the router/read stages
            concurrency=self.summarizer_concurrency,
        )

    def _finalize_flows(self, b: int, max_window: int, wm: int) -> dict:
        """Finalize all three window flows for micro-batch `b` and write
        them through the sink. Driver-merge for small finalizations (low
        latency); distributed merge (actor spill -> Ray groupby ->
        deterministic partitioned write) once the open-window count
        crosses the threshold."""
        import os

        pre = ray.get([a.stats.remote() for a in self.actors])
        open_total = sum(
            st["open_panes"] + st["open_slides"] + st["open_sessions"]
            for st in pre
        )
        import shutil

        # a crashed distributed attempt may have left this batch's spill
        # partials behind; clear them regardless of which mode this
        # (re)run takes so the checkpoint dir cannot accumulate
        spill_root = os.path.join(
            self.checkpoint_dir, "merge-spill", f"b{b:06d}"
        )
        shutil.rmtree(spill_root, ignore_errors=True)
        if open_total > self.distributed_merge_threshold:

            def paths(tag: str) -> list[str]:
                return [
                    os.path.join(spill_root, f"{tag}-actor-{i:04d}.parquet")
                    for i in range(len(self.actors))
                ]

            pane_p = paths("panes")
            slide_p = paths("slides")
            sess_p = paths("sessions")
            # one ray.get over all three flows' spill futures (3 round
            # trips -> 1), then the three independent merge jobs run
            # concurrently — each is a small Ray Dataset execution whose
            # ~1s fixed cost would otherwise serialize per micro-batch
            na = len(self.actors)
            futs = (
                [
                    a.finalize_upto.remote(max_window, p)
                    for a, p in zip(self.actors, pane_p)
                ]
                + [
                    a.finalize_sliding.remote(
                        self.sliding_frontier, max_window, p
                    )
                    for a, p in zip(self.actors, slide_p)
                ]
                + [
                    a.finalize_sessions.remote(wm, p)
                    for a, p in zip(self.actors, sess_p)
                ]
            )
            ns = ray.get(futs)
            pane_n, slide_n, sess_n = (
                ns[:na], ns[na : 2 * na], ns[2 * na :]
            )
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=3) as pool:
                f_win = pool.submit(
                    self.sink.write_windows_distributed,
                    b,
                    [p for p, n in zip(pane_p, pane_n) if n],
                    kind="windows",
                    sum_fields=PANE_FIELDS,
                    num_parts=self.merge_parts,
                )
                f_slide = pool.submit(
                    self.sink.write_windows_distributed,
                    b,
                    [p for p, n in zip(slide_p, slide_n) if n],
                    kind="sliding",
                    sum_fields=["n_pages", "total_chars"],
                    num_parts=self.merge_parts,
                )
                f_sess = pool.submit(
                    self.sink.write_windows_distributed,
                    b,
                    [p for p, n in zip(sess_p, sess_n) if n],
                    kind="sessions",
                    sum_fields=None,
                    sort_keys=[
                        ("domain", "ascending"),
                        ("session_start", "ascending"),
                    ],
                    num_parts=self.merge_parts,
                )
                n_win = f_win.result()
                n_slide = f_slide.result()
                n_sess = f_sess.result()
            # partials are fully merged into the sink parts; a replay
            # regenerates them from restored actor state, so the spill
            # dir must not accumulate over a long stream
            shutil.rmtree(spill_root, ignore_errors=True)
            out_path = str(self.sink.out_dir / f"windows-b{b:06d}")
            return {
                "windows": n_win,
                "sliding": n_slide,
                "sessions": n_sess,
                "out_file": out_path,
                "merge_mode": "distributed",
                "actor_stats": pre,
            }
        partials = ray.get(
            [a.finalize_upto.remote(max_window) for a in self.actors]
        )
        finalized = _merge_pane_partials(partials)
        slide_partials = ray.get(
            [
                a.finalize_sliding.remote(self.sliding_frontier, max_window)
                for a in self.actors
            ]
        )
        sliding = _merge_sliding_partials(slide_partials)
        sess_parts = ray.get(
            [a.finalize_sessions.remote(wm) for a in self.actors]
        )
        sessions = _merge_session_partials(sess_parts)
        path = self.sink.write_windows(b, finalized)
        self.sink.write_windows(b, sliding, kind="sliding")
        self.sink.write_windows(b, sessions, kind="sessions")
        return {
            "windows": finalized.num_rows,
            "sliding": sliding.num_rows,
            "sessions": sessions.num_rows,
            "out_file": path,
            "merge_mode": "driver",
            # finalization does not change n_late/rows_seen, so the
            # pre-finalize stats serve the commit lineage (no second
            # per-batch stats round-trip)
            "actor_stats": pre,
        }

    def run(
        self,
        shard_groups: list[list[str]],
        *,
        final_flush: bool = True,
    ) -> dict:
        """Process micro-batches; resume-safe. Returns run metrics."""
        committed = self.sink.committed_batches()
        start_batch = 0
        if not committed:
            # FRESH stream over a possibly-reused checkpoint dir: drop
            # any previous run's spilled seen-state so stale urls can't
            # masquerade as duplicates (resume keeps it — it IS state)
            ray.get([a.reset_cold_tier.remote() for a in self.actors])
        if committed:
            last = max(committed)
            # restore state as of the last committed batch
            ok = ray.get(
                [a.restore.remote(last) for a in self.actors]
            )
            if not all(ok):
                raise RuntimeError(
                    f"checkpoint for committed batch {last} missing"
                )
            start_batch = last + 1
            # recover watermark from manifest lineage
            import json

            with open(self.sink.manifest_path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    if rec.get("kind") == "commit" and rec["batch"] <= last:
                        self.watermark = max(self.watermark, rec["watermark"])
                        self.sliding_frontier = max(
                            self.sliding_frontier, rec["max_window"]
                        )
        n_batches = len(shard_groups)
        windows_emitted = 0
        sliding_emitted = 0
        sessions_emitted = 0
        rows_processed = 0
        for b in range(start_batch, n_batches):
            shards = shard_groups[b]
            ds = ray.data.read_parquet(
                shards, columns=["url", "warc_ts", "text"]
            )
            if self.summarize_budget is not None:
                ds = self._summarize_batch(ds, b)
            ds = ds.map_batches(
                _prepare(self.window_size_us),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            stats = ds.map_batches(
                make_router(self.actors),
                batch_format="pyarrow",
                batch_size=4096,
                num_cpus=0.5,
            )
            # NOTE: consume exactly once (take_all). to_arrow_refs() executes
            # the plan twice, which would double-deliver to the state actors.
            stat_rows = stats.take_all()
            batch_max_ts = max(r["max_ts"] for r in stat_rows)
            batch_rows = sum(r["n"] for r in stat_rows)
            rows_processed += batch_rows
            self.watermark = max(self.watermark, batch_max_ts)
            wm = self.watermark - self.lateness_us
            max_window = wm // self.window_size_us - 1
            counts = self._finalize_flows(b, max_window, wm)
            actor_stats = counts["actor_stats"]
            self.sliding_frontier = max(self.sliding_frontier, max_window)
            ray.get([a.snapshot.remote(b) for a in self.actors])
            self.sink.commit(
                b,
                {
                    "shards": shards,
                    "rows": int(batch_rows),
                    "watermark": int(self.watermark),
                    "windows_finalized": int(counts["windows"]),
                    "sliding_finalized": int(counts["sliding"]),
                    "sessions_finalized": int(counts["sessions"]),
                    "max_window": int(max_window),
                    "out_file": counts["out_file"],
                    "merge_mode": counts["merge_mode"],
                    "state_version": b,
                    # per-partition lineage: row spread + late drops per
                    # state actor at commit time
                    "n_late": int(sum(st["n_late"] for st in actor_stats)),
                    "actor_rows": [
                        int(st["rows_seen"]) for st in actor_stats
                    ],
                },
            )
            windows_emitted += counts["windows"]
            sliding_emitted += counts["sliding"]
            sessions_emitted += counts["sessions"]
        if final_flush and n_batches > start_batch:
            b = n_batches
            if b not in self.sink.committed_batches():
                # the final flush finalizes EVERY remaining window — the
                # case most likely to cross the distributed-merge
                # threshold on a long stream
                counts = self._finalize_flows(b, 2**62, 2**62)
                self.sliding_frontier = 2**62
                ray.get([a.snapshot.remote(b) for a in self.actors])
                self.sink.commit(
                    b,
                    {
                        "shards": [],
                        "rows": 0,
                        "watermark": int(self.watermark),
                        "windows_finalized": int(counts["windows"]),
                        "sliding_finalized": int(counts["sliding"]),
                        "sessions_finalized": int(counts["sessions"]),
                        "max_window": 2**62,
                        "out_file": counts["out_file"],
                        "merge_mode": counts["merge_mode"],
                        "state_version": b,
                    },
                )
                windows_emitted += counts["windows"]
                sliding_emitted += counts["sliding"]
                sessions_emitted += counts["sessions"]
        actor_stats = ray.get([a.stats.remote() for a in self.actors])
        return {
            "rows_processed": rows_processed,
            "windows_emitted": windows_emitted,
            "sliding_emitted": sliding_emitted,
            "sessions_emitted": sessions_emitted,
            "watermark": self.watermark,
            "actor_stats": actor_stats,
        }

"""Exactly-once parquet sink: deterministic per-partition file names,
atomic tmp+rename writes, and a commit manifest.

A replayed micro-batch (after a crash before its commit record landed)
regenerates byte-identical state and overwrites the same paths, so the
sink converges to exactly-once output: no duplicates, no losses, stable
row counts across kill/resume.
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

# Ray's read_parquet path resolution lazily attempts
# `from fsspec.implementations.http import HTTPFileSystem`; when two
# driver threads construct Datasets concurrently (the per-flow merge
# jobs), that import can race and surface as a spurious
# "cannot import name 'HTTPFileSystem'" ImportError (only
# ModuleNotFoundError is swallowed upstream). Dataset CONSTRUCTION is
# serialized here; execution still overlaps.
_DATASET_CTOR_LOCK = threading.Lock()


class ExactlyOnceSink:
    def __init__(self, out_dir: str):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.manifest_path = self.out_dir / "MANIFEST.jsonl"

    def committed_batches(self) -> set[int]:
        done = set()
        if self.manifest_path.exists():
            with open(self.manifest_path) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("kind") == "commit":
                        done.add(rec["batch"])
        return done

    def write_windows(
        self, batch_idx: int, table: pa.Table, kind: str = "windows"
    ) -> str | None:
        """Write one micro-batch's finalized windows (deterministic name).
        `kind` tags the window flow: windows | sliding | sessions."""
        import shutil

        # a replay may switch merge modes or finalize different rows
        # (config changed between runs): drop BOTH artifact forms for
        # this batch before writing so read_all_windows never sees a
        # stale file from a crashed earlier attempt
        shutil.rmtree(
            self.out_dir / f"{kind}-b{batch_idx:06d}", ignore_errors=True
        )
        path = self.out_dir / f"{kind}-b{batch_idx:06d}.parquet"
        if path.exists():
            path.unlink()
        if table.num_rows == 0:
            return None
        tmp = path.with_suffix(".tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        return str(path)

    def commit(self, batch_idx: int, lineage: dict) -> None:
        """Append the commit record atomically (single O_APPEND write)."""
        rec = {"kind": "commit", "batch": batch_idx, **lineage}
        line = json.dumps(rec, sort_keys=True) + "\n"
        fd = os.open(
            self.manifest_path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644
        )
        try:
            os.write(fd, line.encode())
        finally:
            os.close(fd)

    def write_windows_distributed(
        self,
        batch_idx: int,
        partial_paths: list[str],
        *,
        kind: str = "windows",
        sum_fields: list[str] | None = None,
        group_keys: tuple[str, str] = ("domain", "window_id"),
        sort_keys: list[tuple[str, str]] | None = None,
        num_parts: int = 8,
    ) -> int:
        """DISTRIBUTED second-phase merge + deterministic partitioned
        write — the scale path when a micro-batch (or the final flush)
        finalizes too many windows to concat on the driver.

        Per-actor partial parquet files are read as a Dataset, rows route
        to hash(domain) % num_parts partitions (co-partitioned with the
        actors' salted split, so each (domain, window) merges within ONE
        partition), each partition sums `sum_fields` (or passes through
        when None, e.g. sessions), sorts deterministically, and writes
        its own part file (parallel IO, tmp+rename). Replays wipe the
        batch directory first and regenerate byte-identical parts, so
        exactly-once semantics match the single-file path. Returns the
        merged row count."""
        import shutil

        import ray.data

        out_dir = self.out_dir / f"{kind}-b{batch_idx:06d}"
        shutil.rmtree(out_dir, ignore_errors=True)
        # mode-switch replay symmetry: drop the single-file form too
        single = self.out_dir / f"{kind}-b{batch_idx:06d}.parquet"
        if single.exists():
            single.unlink()
        out_dir.mkdir(parents=True, exist_ok=True)
        if not partial_paths:
            return 0
        with _DATASET_CTOR_LOCK:
            ds = ray.data.read_parquet(partial_paths)
        if sort_keys is None:
            sort_keys = [(group_keys[1], "ascending"),
                         (group_keys[0], "ascending")]

        from ..state.store import route_domains_batch

        def add_part(b: pa.Table) -> pa.Table:
            # same hash as the actors' routing (state/store.py
            # route_domains_batch) so partitioning stays co-located by
            # design (vectorized: one numpy hashing pass per batch)
            vals = route_domains_batch(
                [
                    "" if d is None else d
                    for d in b.column(group_keys[0]).to_pylist()
                ],
                num_parts,
            )
            parts = pa.array(vals.astype("int32"), pa.int32())
            return b.append_column("part", parts)

        ds = ds.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True
        )

        def merge_write(group: pa.Table) -> pa.Table:
            part = group.column("part")[0].as_py()
            t = group.drop_columns(["part"])
            if sum_fields:
                t = t.group_by(list(group_keys)).aggregate(
                    [(f, "sum") for f in sum_fields]
                )
                t = t.rename_columns(
                    [
                        c[:-4] if c.endswith("_sum") else c
                        for c in t.column_names
                    ]
                )
            t = t.take(pa.compute.sort_indices(t, sort_keys=sort_keys))
            path = out_dir / f"part-{part:04d}.parquet"
            # unique tmp name: a re-executed group task (worker failure /
            # object reconstruction) racing the original on one fixed tmp
            # path could interleave writers and publish a torn file;
            # content is deterministic so last-rename-wins stays
            # byte-identical
            import uuid

            tmp = out_dir / (
                f"part-{part:04d}.{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp"
            )
            pq.write_table(t, tmp)
            os.replace(tmp, path)
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        counts = ds.groupby("part").map_groups(
            merge_write, batch_format="pyarrow"
        )
        return sum(
            r["n"]
            for b in counts.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        )

    def read_all_windows(self, kind: str = "windows") -> pa.Table | None:
        committed = self.committed_batches()
        tables = []
        for b in sorted(committed):
            p = self.out_dir / f"{kind}-b{b:06d}.parquet"
            if p.exists():
                tables.append(pq.read_table(p))
            d = self.out_dir / f"{kind}-b{b:06d}"
            if d.is_dir():
                for part in sorted(d.glob("part-*.parquet")):
                    tables.append(pq.read_table(part))
        if not tables:
            return None
        return pa.concat_tables(tables, promote_options="permissive")

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
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


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
        if table.num_rows == 0:
            return None
        path = self.out_dir / f"{kind}-b{batch_idx:06d}.parquet"
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

    def read_all_windows(self, kind: str = "windows") -> pa.Table | None:
        committed = self.committed_batches()
        tables = []
        for b in sorted(committed):
            p = self.out_dir / f"{kind}-b{b:06d}.parquet"
            if p.exists():
                tables.append(pq.read_table(p))
        if not tables:
            return None
        return pa.concat_tables(tables)

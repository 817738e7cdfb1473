"""Streaming MinHash near-dup suppression through the CEP machinery.

The north-rule engine (pipelines/cep.py) already runs stateful EXACT
dedup (per-domain SeenStore) inside the stream; this module adds the
NEAR-dup analog a 100 TB crawl pipeline needs: documents arrive in
doc-id-ordered micro-batches, each doc's MinHash signature is banded
into 16 LSH codes (the same stages/dedup.py kernels the batch
minhash_near_dups uses), and a doc is suppressed when ANY of its band
codes was already registered by an earlier doc — first occurrence per
near-dup cluster survives, in stream order.

Semantics are REGISTER-ALL: suppressed docs still register their bands,
so chains (A~B, B~C but A!~C) collapse transitively to the earliest
member, and — crucially — the decision for a doc depends only on docs
with smaller ids, which makes the whole stream SQL-expressible: the
DuckDB oracle (SQL_CEP_NEAR_DUP_STREAM) re-derives every signature
bit-for-bit and replays "exists an earlier doc sharing a band" as a
self-join. Register-first semantics under keep-only registration would
be recursively defined and untestable by hash.

Scale posture:
- band codes are computed distributed (map_batches over Arrow batches,
  vectorized MinHasher + hash_u64_rows), 16 int64 rows per doc;
- state actors partition the band registry by code hash; registries are
  TIERED (state/store.py BandRegistry: bounded hot dict + append-only
  sqlite cold tier with batch-tagged rollback) — actor heap stays flat
  at any stream length;
- register and probe are BATCHED actor calls issued from worker tasks
  (the load_prior_crawl scatter shape) — the driver never sees a band
  row, only per-batch counts;
- the per-doc verdict folds inside the probe task (a doc's 16 band rows
  never split across blocks), so no per-batch shuffle is needed;
- the ledger commits exactly-once per micro-batch (ExactlyOnceSink,
  deterministic file names), actors snapshot per batch with retention 2
  (StateStoreActor contract), and a killed run resumes byte-identical.

Reference scope note: kantord/headson has no dedup/streaming layer
(/root/reference/src/main.rs:140-158 is a per-document previewer);
this is from-scratch training-data-pipeline surface on Ray Data.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..sinks.parquet import ExactlyOnceSink
from ..stages.dedup import MinHasher, lsh_band_rows, minhash_signatures

NUM_PERM = 64
NUM_BANDS = 16
ABSENT = 1 << 62


@ray.remote
class BandStateActor:
    """One partition of the distributed band registry."""

    def __init__(
        self,
        actor_id: int,
        checkpoint_dir: str,
        *,
        max_mem_entries: int = 500_000,
    ):
        from ..state.store import BandRegistry

        self.actor_id = actor_id
        self.checkpoint_dir = checkpoint_dir
        d = os.path.join(checkpoint_dir, f"band-{actor_id:04d}")
        os.makedirs(d, exist_ok=True)
        self.reg = BandRegistry(
            os.path.join(d, "cold.sqlite3"),
            max_mem_entries=max_mem_entries,
        )
        self.rows_seen = 0

    def register(self, codes: np.ndarray, ids: np.ndarray) -> int:
        self.reg.register_batch(
            np.asarray(codes, dtype=np.int64),
            np.asarray(ids, dtype=np.int64),
        )
        self.rows_seen += int(len(codes))
        return len(codes)

    def probe(self, codes: np.ndarray) -> np.ndarray:
        return self.reg.probe_batch(np.asarray(codes, dtype=np.int64))

    def reset_cold_tier(self) -> None:
        self.reg.reset_cold_tier()

    def stats(self) -> dict:
        return {
            "actor_id": self.actor_id,
            "rows_seen": self.rows_seen,
            "distinct_codes": len(self.reg),
            "spilled": self.reg.spilled,
            "hot_entries": len(self.reg.mem),
        }

    def snapshot(self, batch_idx: int) -> str:
        d = os.path.join(
            self.checkpoint_dir, f"band-{self.actor_id:04d}"
        )
        path = os.path.join(d, f"batch-{batch_idx:06d}.pkl")
        tmp = path + ".tmp"
        # flush/commit the cold tier FIRST so the pickle reflects the
        # post-flush hot dict (StateStoreActor.snapshot ordering)
        self.reg.checkpoint_commit(batch_idx)
        with open(tmp, "wb") as fh:
            pickle.dump(
                {
                    "reg": self.reg.snapshot_state(),
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
            f"band-{self.actor_id:04d}",
            f"batch-{batch_idx:06d}.pkl",
        )
        if not os.path.exists(path):
            return False
        with open(path, "rb") as fh:
            state = pickle.load(fh)
        self.reg.restore_state(state["reg"], batch_idx)
        self.rows_seen = state["rows_seen"]
        return True


def _band_code_rows(hasher: MinHasher):
    """(doc_id, text) batch -> (doc_id, code) rows: signature + 16 LSH
    band hashes per doc, all rows of one doc contiguous in ONE output
    block (the probe stage's per-block verdict fold relies on this)."""

    def fn(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch, hasher=hasher)
        rows = lsh_band_rows(sig, bands=NUM_BANDS)
        return pa.table(
            {
                "doc_id": rows.column("doc_id"),
                "code": rows.column("band_hash"),
            }
        )

    return fn


def _scatter_register(actors: list):
    """Worker-side scatter: route (code, doc_id) slices to the registry
    actors by code hash; block until delivered (backpressure — all of
    this batch's registrations land before the probe phase starts)."""
    p = len(actors)

    def fn(batch: pa.Table) -> pa.Table:
        codes = batch.column("code").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        parts = codes % p
        refs = []
        for i in range(p):
            idx = np.flatnonzero(parts == i)
            if idx.size:
                refs.append(
                    actors[i].register.remote(codes[idx], ids[idx])
                )
        ray.get(refs)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    return fn


def _scatter_probe(actors: list):
    """Worker-side probe + per-doc verdict fold: one batched actor call
    per partition, then min-over-bands per doc — emits exactly one
    (doc_id, is_dup, first_src) row per doc in the block."""
    p = len(actors)

    def fn(batch: pa.Table) -> pa.Table:
        codes = batch.column("code").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        # the per-block verdict fold is only complete if every doc's
        # NUM_BANDS rows landed in this block — guaranteed by the
        # _band_code_rows emission layout, but a silent Ray block split
        # would corrupt verdicts, so fail loudly instead
        if ids.size:
            _, cnt = np.unique(ids, return_counts=True)
            if not (cnt == NUM_BANDS).all():
                raise AssertionError(
                    "band rows of a doc split across blocks"
                )
        mins = np.full(codes.shape[0], ABSENT, dtype=np.int64)
        parts = codes % p
        slices = []
        for i in range(p):
            idx = np.flatnonzero(parts == i)
            if idx.size:
                slices.append(
                    (idx, actors[i].probe.remote(codes[idx]))
                )
        for idx, ref in slices:
            mins[idx] = ray.get(ref)
        # a band whose registered min is the doc itself is NOT an
        # earlier occurrence
        earlier = np.where(mins < ids, mins, ABSENT)
        # per-doc min over its bands (docs are contiguous in the block)
        order = np.lexsort((earlier, ids))
        i_s, e_s = ids[order], earlier[order]
        first = np.ones(i_s.size, dtype=bool)
        first[1:] = i_s[1:] != i_s[:-1]
        doc_ids = i_s[first]
        first_src = e_s[first]
        is_dup = (first_src != ABSENT).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "is_dup": pa.array(is_dup, pa.int64()),
                "first_src": pa.array(
                    np.where(first_src == ABSENT, -1, first_src),
                    pa.int64(),
                ),
            }
        )

    return fn


class NearDupStream:
    """Owns the registry actor pool + exactly-once ledger sink; one
    instance per streaming run (the CepEngine shape)."""

    def __init__(
        self,
        *,
        out_dir: str,
        checkpoint_dir: str,
        num_state_actors: int = 4,
        num_perm: int = NUM_PERM,
        max_mem_entries: int = 500_000,
    ):
        self.sink = ExactlyOnceSink(out_dir)
        self.checkpoint_dir = checkpoint_dir
        self.hasher = MinHasher(num_perm)
        self.actors = [
            BandStateActor.remote(
                i, checkpoint_dir, max_mem_entries=max_mem_entries
            )
            for i in range(num_state_actors)
        ]

    def run(self, groups: list) -> dict:
        """Process micro-batches (each a callable returning the group's
        (doc_id, text) Dataset — reconstructable, so a resumed run
        rebuilds the identical stream); resume-safe."""
        committed = self.sink.committed_batches()
        start_batch = 0
        if not committed:
            ray.get([a.reset_cold_tier.remote() for a in self.actors])
        else:
            last = max(committed)
            ok = ray.get([a.restore.remote(last) for a in self.actors])
            if not all(ok):
                raise RuntimeError(
                    f"checkpoint for committed batch {last} missing"
                )
            start_batch = last + 1
        rows_processed = 0
        dups = 0
        for b in range(start_batch, len(groups)):
            ds = groups[b]()
            codes = ds.map_batches(
                _band_code_rows(self.hasher),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()  # 16 int64 rows/doc, micro-batch-bounded
            # phase 1: register every doc's bands (register-all), with a
            # hard barrier before any probe — in-batch earlier docs must
            # be visible to later ones regardless of task interleaving.
            # NOTE: consume exactly once (take_all) — re-execution would
            # double-register (harmless for min, but double-counts).
            for _ in codes.map_batches(
                _scatter_register(self.actors),
                batch_format="pyarrow",
                batch_size=8192,
                num_cpus=0.5,
            ).take_all():
                pass
            # phase 2: probe + per-block verdict fold
            ledger_parts = codes.map_batches(
                _scatter_probe(self.actors),
                batch_format="pyarrow",
                batch_size=None,  # one task per block: docs stay whole
                num_cpus=0.5,
            )
            tbls = list(
                ledger_parts.iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
            ledger = (
                pa.concat_tables(tbls)
                if tbls
                else pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "is_dup": pa.array([], pa.int64()),
                        "first_src": pa.array([], pa.int64()),
                    }
                )
            )
            ledger = ledger.sort_by([("doc_id", "ascending")])
            out_file = self.sink.write_windows(b, ledger, kind="ledger")
            ray.get([a.snapshot.remote(b) for a in self.actors])
            n_dup = int(
                pa.compute.sum(ledger.column("is_dup")).as_py() or 0
            )
            rows_processed += ledger.num_rows
            dups += n_dup
            self.sink.commit(
                b,
                {
                    "rows": int(ledger.num_rows),
                    "dups": n_dup,
                    "out_file": out_file,
                    "state_version": b,
                },
            )
        return {
            "rows_processed": rows_processed,
            "dups": dups,
            "actor_stats": ray.get(
                [a.stats.remote() for a in self.actors]
            ),
        }

    def read_ledger(self) -> pa.Table:
        """Concat the committed per-batch ledgers in stream order."""
        import pyarrow.parquet as pq

        tbls = []
        for b in sorted(self.sink.committed_batches()):
            p = self.sink.out_dir / f"ledger-b{b:06d}.parquet"
            if p.exists():
                tbls.append(pq.read_table(p))
        if not tbls:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "is_dup": pa.array([], pa.int64()),
                    "first_src": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(tbls)


def doc_range_groups(
    paths: list[str], num_batches: int, *, columns=("doc_id", "text")
) -> list:
    """Doc-id-ordered micro-batch factories over the documents table:
    group g covers doc_id in [g*span, (g+1)*span). Ranges derive from
    one distributed max (no driver id materialization) and rebuild
    identically on resume."""
    hi = ray.data.read_parquet(paths, columns=["doc_id"]).max("doc_id")
    if hi is None:  # empty table -> empty stream, not a max() crash
        return []
    span = max(1, (int(hi) + num_batches) // num_batches)
    cols = list(columns)

    def make(lo: int, up: int):
        def factory():
            return ray.data.read_parquet(paths, columns=cols).filter(
                expr=f"doc_id >= {lo} and doc_id < {up}"
            )

        return factory

    return [
        make(g * span, (g + 1) * span) for g in range(num_batches)
    ]

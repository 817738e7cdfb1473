"""Edge-case tests for the web-text repetition / duplication signal
kernels (stages/textstats.add_repetition_stats and the dup-shingle /
tf-idf / late-event catalog queries added in round 3).

The DuckDB oracle parametrization in test_queries_oracle.py covers the
happy path at sf0.001; these tests pin the boundary conditions the
synthetic corpus never hits (empty docs at batch edges, cross-document
bigram masking, watermark edge equality)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from headson_ray.stages.textstats import add_repetition_stats


def _rep(texts):
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    r = add_repetition_stats(t)
    return r.column("n_bigrams").to_pylist(), r.column(
        "top_bigram_ppm"
    ).to_pylist()


def brute_top_bigram_ppm(text: str) -> tuple[int, int]:
    toks = (text or "").split()
    bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not bgs:
        return 0, 0
    counts: dict[str, int] = {}
    for g in bgs:
        counts[g] = counts.get(g, 0) + 1
    return len(bgs), max(counts.values()) * 1_000_000 // len(bgs)


def test_repetition_basic():
    n, p = _rep(["a b a b a", "x y z", "w w w w"])
    # 'a b a b a': bigrams ab ba ab ba -> top 2/4
    assert (n[0], p[0]) == (4, 500000)
    # all-distinct bigrams -> 1/2
    assert (n[1], p[1]) == (2, 500000)
    # 'w w w w': 'w w' x3 -> 3/3
    assert (n[2], p[2]) == (3, 1_000_000)


def test_repetition_empty_and_short_docs():
    n, p = _rep(["", "solo", "", "a a", ""])
    assert n == [0, 0, 0, 1, 0]
    assert p == [0, 0, 0, 1_000_000, 0]


def test_repetition_no_cross_document_bigrams():
    # identical adjacent tokens ACROSS docs must not count as a bigram:
    # doc0 ends with 'q', doc1 starts with 'q' -> 'q q' never formed
    n, p = _rep(["p q", "q p"])
    assert n == [1, 1]
    assert p == [1_000_000, 1_000_000]
    # ...and a doc that is one token between two others stays isolated
    n, p = _rep(["a b", "b", "b c"])
    assert n == [1, 0, 1]


def test_repetition_empty_doc_at_batch_edges():
    # empty FIRST doc used to risk masking index -1; empty LAST doc used
    # to risk masking index total-1 (out of bounds)
    n, p = _rep(["", "a b c", ""])
    assert n == [0, 2, 0]
    n, p = _rep(["", ""])
    assert n == [0, 0]
    n, p = _rep([])
    assert n == []


def test_repetition_matches_bruteforce_fuzz():
    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "dd", "e"]
    texts = []
    for _ in range(200):
        k = int(rng.integers(0, 12))
        texts.append(" ".join(rng.choice(vocab, size=k)))
    n, p = _rep(texts)
    for i, t in enumerate(texts):
        bn, bp = brute_top_bigram_ppm(t)
        assert (n[i], p[i]) == (bn, bp), t


def test_doc_term_counts_vectorized_matches_brute():
    from headson_ray.pipelines.queries import _doc_term_counts

    texts = ["b a b", "", "c c c", "a"]
    d, t, tf = _doc_term_counts(texts)
    got = sorted(zip(d.tolist(), t.tolist(), tf.tolist()))
    assert got == [(0, "a", 1), (0, "b", 2), (2, "c", 3), (3, "a", 1)]


def test_late_events_waterline_edge(ray_session, tmp_path):
    """Deterministic mini-stream: an event exactly AT watermark-lateness
    is NOT late (strict <); one microsecond below is late."""
    import duckdb

    from headson_ray.pipelines.queries import (
        LATE_ALLOWED_US,
        SQL_LATE_EVENTS,
        q_late_events,
    )

    # synthesize a tiny events table with controlled ts spread
    rng = np.random.default_rng(3)
    n = 5000
    ts = np.sort(rng.integers(0, 40 * 86_400_000_000, size=n))
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array(np.zeros(n)),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "events.parquet")

    got = q_late_events(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    exp = con.execute(SQL_LATE_EVENTS).df()
    g = got.sort_values(["event_id"]).reset_index(drop=True)
    e = exp.sort_values(["event_id"]).reset_index(drop=True)
    assert len(g) == len(e)
    assert (g["event_id"].to_numpy() == e["event_id"].to_numpy()).all()
    assert (g["batch_id"].to_numpy() == e["batch_id"].to_numpy()).all()
    assert LATE_ALLOWED_US > 0


def test_late_events_exact_boundary_row(ray_session, tmp_path):
    """Hand-built rows AT the watermark-lateness boundary: an event whose
    event time equals pmax - LATE_ALLOWED_US is NOT late (strict <); one
    microsecond below IS late. (The randomized test above never
    constructs the exact-equality row.)"""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import (
        LATE_ALLOWED_US,
        LATE_JITTER_US,
        q_late_events,
    )
    from headson_ray.stages.hashing import mix_rounds

    W, LA = LATE_JITTER_US, LATE_ALLOWED_US

    def jit(eid: int) -> int:
        return int(mix_rounds(np.array([eid], dtype=np.uint64))[0] % W)

    # e0 anchors the watermark from arrival batch 99; X and Y arrive in
    # batch 100 (their jitter pushes them over the bucket boundary) with
    # event times exactly at / one microsecond below pmax - lateness
    id0 = next(i for i in range(10_000) if jit(i) < 1_000_000)
    j0 = jit(id0)
    ts0 = 100 * W - 1 - j0  # arrival 100W-1 -> batch 99; global max ts
    tsX = ts0 - LA  # boundary: NOT late
    tsY = ts0 - LA - 1  # one microsecond below: late
    idX = next(
        i for i in range(id0 + 1, 20_000) if jit(i) >= 100 * W - tsX
    )
    idY = next(
        i for i in range(20_000, 40_000) if jit(i) >= 100 * W - tsY
    )
    assert (ts0 + j0) // W == 99
    assert (tsX + jit(idX)) // W == 100
    assert (tsY + jit(idY)) // W == 100
    t = pa.table(
        {
            "event_id": pa.array([id0, idX, idY], pa.int64()),
            "ts": pa.array([ts0, tsX, tsY], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([0, 0, 0], pa.int64()),
            "event_type": pa.array(["click"] * 3, pa.string()),
            "value": pa.array([0.0] * 3),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = set(q_late_events(str(tmp_path)).to_pandas()["event_id"])
    assert idY in got  # strictly below the line: late
    assert idX not in got  # exactly at the line: NOT late
    assert id0 not in got


def test_add_blocklist_stats_token_equality():
    """Blocklist counting is token-EQUALITY, not substring: 'bigtable'
    must not count for 'big'; empty/None texts count zero; multiple
    hits accumulate."""
    from headson_ray.stages.textstats import add_blocklist_stats

    b = pa.table(
        {
            "text": pa.array(
                [
                    "spark is slow and big",
                    "bigtable sparkles slowly",
                    "",
                    None,
                    "big big big",
                ]
            )
        }
    )
    out = add_blocklist_stats(b)
    assert out.column("n_blocked").to_pylist() == [3, 0, 0, 0, 3]

"""CEP engine tests: windowed pane contents vs a single-process oracle,
exactly-once row counts across kill/resume, and delta-join semantics."""

from __future__ import annotations

import collections
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from headson_ray.sources.pages import generate_shard
from headson_ray.pipelines.cep import CepEngine, text_fingerprint_column

WINDOW_S = 600
LATENESS_S = 60


@pytest.fixture(scope="module")
def pages_shards(tmp_path_factory):
    root = tmp_path_factory.mktemp("cep-pages")
    paths = []
    tables = []
    for s in range(4):
        t = generate_shard(s, 400)
        p = root / f"shard-{s}.parquet"
        pq.write_table(t, p)
        paths.append(str(p))
        tables.append(t)
    return paths, pa.concat_tables(tables)


@pytest.fixture(scope="module")
def prior_crawl(tmp_path_factory, pages_shards):
    _, src = pages_shards
    root = tmp_path_factory.mktemp("cep-prior")
    urls = src.column("url").to_pylist()
    texts = src.column("text").to_pylist()
    n = len(urls)
    # first third unchanged, second third changed, last third absent (new)
    p_urls = urls[: n // 3] + urls[n // 3 : 2 * n // 3]
    p_texts = texts[: n // 3] + [t + "X" for t in texts[n // 3 : 2 * n // 3]]
    t = pa.table({"url": p_urls, "text": p_texts})
    path = root / "prior.parquet"
    pq.write_table(t, path)
    return str(path), set(urls[: n // 3]), set(urls[n // 3 : 2 * n // 3])


def _oracle_panes(src: pa.Table, prior_path: str):
    """Single-process oracle for the full-run pane table."""
    prior_t = pq.read_table(prior_path)
    prior = dict(
        zip(
            prior_t.column("url").to_pylist(),
            text_fingerprint_column(prior_t.column("text")).to_pylist(),
        )
    )
    fps = text_fingerprint_column(src.column("text")).to_pylist()
    panes = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    seen = collections.defaultdict(set)
    size_us = WINDOW_S * 1_000_000
    for url, ts, text, fp in zip(
        src.column("url").to_pylist(),
        src.column("warc_ts").to_pylist(),
        src.column("text").to_pylist(),
        fps,
    ):
        domain = url.split("/")[2]
        w = int(ts.timestamp() * 1_000_000) // size_us
        pane = panes[(domain, w)]
        pane[0] += 1
        if url in seen[domain]:
            pane[1] += 1
            continue
        seen[domain].add(url)
        pane[5] += len(text)
        pfp = prior.get(url)
        if pfp is None:
            pane[2] += 1
        elif pfp != fp:
            pane[3] += 1
        else:
            pane[4] += 1
    return panes


def _pane_dict(table: pa.Table):
    out = {}
    for row in table.to_pylist():
        out[(row["domain"], row["window_id"])] = [
            row["n_pages"], row["n_dup"], row["n_new"],
            row["n_changed"], row["n_unchanged"], row["total_chars"],
        ]
    return out


@pytest.mark.usefixtures("ray_session")
def test_load_prior_crawl_never_pumps_through_driver(
    pages_shards, prior_crawl, tmp_path
):
    """Round-3 scale fix: the prior crawl is corpus-sized, so it must
    load as a worker-side map_batches scatter — any driver-side
    iter_batches/iter_rows pump fails this test. The per-actor entry
    spread also proves rows landed on the (domain,url)-routed actors."""
    import ray as _ray
    import ray.data as rd
    from unittest import mock

    prior_path, unchanged_urls, changed_urls = prior_crawl
    eng = CepEngine(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_state_actors=3,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
    )

    # the driver may only ever iterate TINY per-batch count tables (one
    # "n" row per scatter batch) — a corpus pump (url/text columns or
    # row-sized batches) fails the assertion inside the wrapper
    orig_iter = rd.Dataset.iter_batches

    def _guarded_iter(self, *a, **k):
        for b in orig_iter(self, *a, **k):
            names = set(
                b.column_names if hasattr(b, "column_names") else b.keys()
            )
            assert names <= {"n"}, (
                f"driver-side corpus pump in load_prior_crawl: {names}"
            )
            yield b

    def _no_rows(self, *a, **k):
        raise AssertionError("driver-side iter_rows in load_prior_crawl")

    with mock.patch.object(
        rd.Dataset, "iter_batches", _guarded_iter
    ), mock.patch.object(rd.Dataset, "iter_rows", _no_rows):
        total = eng.load_prior_crawl([prior_path])
    n_prior = len(unchanged_urls) + len(changed_urls)
    assert total == n_prior
    per_actor = [
        st["prior_entries"]
        for st in _ray.get([a.stats.remote() for a in eng.actors])
    ]
    assert sum(per_actor) == n_prior
    assert sum(1 for c in per_actor if c > 0) >= 2  # really scattered


@pytest.mark.usefixtures("ray_session")
def test_cep_full_run_matches_oracle(pages_shards, prior_crawl, tmp_path):
    paths, src = pages_shards
    prior_path, unchanged_urls, changed_urls = prior_crawl
    eng = CepEngine(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_state_actors=3,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
    )
    eng.load_prior_crawl([prior_path])
    metrics = eng.run([[p] for p in paths])
    assert metrics["rows_processed"] == src.num_rows
    got = _pane_dict(eng.sink.read_all_windows())
    exp = _oracle_panes(src, prior_path)
    assert got == dict(exp)
    # delta-join categories all exercised
    total_new = sum(v[2] for v in got.values())
    total_changed = sum(v[3] for v in got.values())
    total_unchanged = sum(v[4] for v in got.values())
    assert total_new > 0 and total_changed > 0 and total_unchanged > 0
    assert total_changed == len(changed_urls)
    assert total_unchanged == len(unchanged_urls)


@pytest.mark.usefixtures("ray_session")
def test_cep_kill_resume_exactly_once(pages_shards, prior_crawl, tmp_path):
    paths, src = pages_shards
    prior_path, _, _ = prior_crawl
    groups = [[p] for p in paths]

    # clean full run
    clean = CepEngine(
        out_dir=str(tmp_path / "out-clean"),
        checkpoint_dir=str(tmp_path / "ckpt-clean"),
        num_state_actors=3,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
    )
    clean.load_prior_crawl([prior_path])
    clean.run(groups)
    clean_windows = _pane_dict(clean.sink.read_all_windows())

    # "killed" run: process only first two micro-batches, then abandon
    eng1 = CepEngine(
        out_dir=str(tmp_path / "out-resume"),
        checkpoint_dir=str(tmp_path / "ckpt-resume"),
        num_state_actors=3,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
    )
    eng1.load_prior_crawl([prior_path])
    eng1.run(groups[:2], final_flush=False)

    # fresh engine (new actors) resumes from the checkpoint + manifest
    eng2 = CepEngine(
        out_dir=str(tmp_path / "out-resume"),
        checkpoint_dir=str(tmp_path / "ckpt-resume"),
        num_state_actors=3,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
    )
    eng2.load_prior_crawl([prior_path])
    metrics = eng2.run(groups)
    resumed_windows = _pane_dict(eng2.sink.read_all_windows())
    assert resumed_windows == clean_windows  # no dup/lost windows
    # resumed run only processed the remaining batches
    assert metrics["rows_processed"] == src.num_rows - 800


SLIDE_COUNT = 3
SESSION_GAP_S = 30


def _oracle_sliding(src: pa.Table):
    """Single-process oracle: window w sums slides [w-k+1, w]."""
    size_us = WINDOW_S * 1_000_000
    slides = collections.defaultdict(lambda: [0, 0])
    for url, ts, text in zip(
        src.column("url").to_pylist(),
        src.column("warc_ts").to_pylist(),
        src.column("text").to_pylist(),
    ):
        domain = url.split("/")[2]
        s = int(ts.timestamp() * 1_000_000) // size_us
        v = slides[(domain, s)]
        v[0] += 1
        v[1] += len(text)
    out = collections.defaultdict(lambda: [0, 0])
    for (d, s), v in slides.items():
        for w in range(s, s + SLIDE_COUNT):
            out[(d, w)][0] += v[0]
            out[(d, w)][1] += v[1]
    return dict(out)


def _oracle_sessions(src: pa.Table):
    """Single-process oracle: per-domain sorted gap-split sessions."""
    gap_us = SESSION_GAP_S * 1_000_000
    events = collections.defaultdict(list)
    for url, ts, text in zip(
        src.column("url").to_pylist(),
        src.column("warc_ts").to_pylist(),
        src.column("text").to_pylist(),
    ):
        domain = url.split("/")[2]
        events[domain].append((int(ts.timestamp() * 1_000_000), len(text)))
    sessions = {}
    for d, evs in events.items():
        evs.sort()
        start = prev = None
        n = ch = 0
        for t, c in evs:
            if prev is not None and t - prev > gap_us:
                sessions[(d, start)] = (prev, n, ch)
                start, n, ch = None, 0, 0
            if start is None:
                start = t
            n += 1
            ch += c
            prev = t
        if start is not None:
            sessions[(d, start)] = (prev, n, ch)
    return sessions


def _make_engine(tmp_path, name):
    return CepEngine(
        out_dir=str(tmp_path / f"out-{name}"),
        checkpoint_dir=str(tmp_path / f"ckpt-{name}"),
        num_state_actors=3,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
        slide_count=SLIDE_COUNT,
        session_gap_s=SESSION_GAP_S,
    )


@pytest.mark.usefixtures("ray_session")
def test_cep_sliding_and_session_windows_match_oracle(
    pages_shards, prior_crawl, tmp_path
):
    paths, src = pages_shards
    prior_path, _, _ = prior_crawl
    eng = _make_engine(tmp_path, "slidesess")
    eng.load_prior_crawl([prior_path])
    metrics = eng.run([[p] for p in paths])
    assert metrics["sliding_emitted"] > 0
    assert metrics["sessions_emitted"] > 0

    sliding = eng.sink.read_all_windows(kind="sliding")
    got_slide = {
        (r["domain"], r["window_id"]): [r["n_pages"], r["total_chars"]]
        for r in sliding.to_pylist()
    }
    assert got_slide == _oracle_sliding(src)
    # no window emitted twice
    assert sliding.num_rows == len(got_slide)

    sessions = eng.sink.read_all_windows(kind="sessions")
    got_sess = {
        (r["domain"], r["session_start"]): (
            r["session_end"], r["n_events"], r["total_chars"]
        )
        for r in sessions.to_pylist()
    }
    assert got_sess == _oracle_sessions(src)
    assert sessions.num_rows == len(got_sess)
    # multiple sessions exist for at least one domain (gap actually splits)
    domains = [r["domain"] for r in sessions.to_pylist()]
    assert len(domains) > len(set(domains))


@pytest.mark.usefixtures("ray_session")
def test_cep_kill_resume_sliding_sessions_exactly_once(
    pages_shards, prior_crawl, tmp_path
):
    paths, src = pages_shards
    prior_path, _, _ = prior_crawl
    groups = [[p] for p in paths]

    clean = _make_engine(tmp_path, "clean2")
    clean.load_prior_crawl([prior_path])
    clean.run(groups)

    eng1 = _make_engine(tmp_path, "resume2")
    eng1.load_prior_crawl([prior_path])
    eng1.run(groups[:2], final_flush=False)
    eng2 = _make_engine(tmp_path, "resume2")  # same dirs: resumes
    eng2.load_prior_crawl([prior_path])
    eng2.run(groups)

    for kind in ("windows", "sliding", "sessions"):
        a = clean.sink.read_all_windows(kind=kind)
        b = eng2.sink.read_all_windows(kind=kind)
        assert a.sort_by([(c, "ascending") for c in a.column_names]).equals(
            b.sort_by([(c, "ascending") for c in b.column_names])
        ), kind


@pytest.mark.usefixtures("ray_session")
def test_cep_hot_domain_skew_two_phase(tmp_path):
    """A severely skewed stream (one domain holding ~half the rows) must
    (a) still match the single-process oracle exactly — the salted
    two-phase pane aggregation merges per-actor partials correctly — and
    (b) actually spread the hot domain's rows across the actor pool."""
    import pyarrow.parquet as pq

    rows = 2000
    base = generate_shard(0, rows)
    # overwrite half the urls with one hot domain
    urls = base.column("url").to_pylist()
    hot = [
        f"https://wikipedia.org/page/{i}" if i % 2 == 0 else u
        for i, u in enumerate(urls)
    ]
    skewed = base.set_column(
        base.schema.get_field_index("url"), "url", pa.array(hot)
    )
    shards = []
    for s in range(4):
        p = tmp_path / f"skew-{s}.parquet"
        pq.write_table(skewed.slice(s * 500, 500), p)
        shards.append(str(p))

    eng = CepEngine(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_state_actors=4,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
    )
    metrics = eng.run([[p] for p in shards])
    got = _pane_dict(eng.sink.read_all_windows())

    # oracle over the skewed table with empty prior
    prior = tmp_path / "empty-prior.parquet"
    pq.write_table(pa.table({"url": pa.array([], pa.string()),
                             "text": pa.array([], pa.string())}), prior)
    exp = _oracle_panes(skewed, str(prior))
    assert got == dict(exp)

    # hot-domain rows really are salted across all actors
    per_actor = [a["rows_seen"] for a in metrics["actor_stats"]]
    assert min(per_actor) > 0
    assert max(per_actor) < rows * 0.6  # no single actor got the hot half


@pytest.mark.usefixtures("ray_session")
def test_cep_lineage_records_partition_metrics(pages_shards, prior_crawl,
                                               tmp_path):
    import json

    paths, _src = pages_shards
    prior_path, _, _ = prior_crawl
    eng = _make_engine(tmp_path, "lineage")
    eng.load_prior_crawl([prior_path])
    eng.run([[p] for p in paths])
    commits = []
    with open(eng.sink.manifest_path) as fh:
        for line in fh:
            rec = json.loads(line)
            if rec.get("kind") == "commit":
                commits.append(rec)
    assert len(commits) == len(paths) + 1  # + final flush
    for rec in commits[:-1]:
        assert rec["rows"] > 0
        assert "watermark" in rec and "windows_finalized" in rec
        assert "sliding_finalized" in rec and "sessions_finalized" in rec
        assert len(rec["actor_rows"]) == 3
        assert sum(rec["actor_rows"]) > 0
        assert rec["n_late"] == 0  # jitter < lateness in the generator


@pytest.mark.usefixtures("ray_session")
def test_cep_late_rows_dropped_and_counted(tmp_path):
    """Rows arriving after their window passed the watermark (beyond
    allowed lateness) are dropped and counted in lineage, never reopening
    a finalized pane."""
    import json

    import pyarrow.parquet as pq

    # batch 0: ts in [t0, t0+1000s) ; batch 1: mostly ts ~ t0+2000s with
    # 50 stragglers back at t0 (two windows behind -> late after the
    # watermark from batch 0's max has finalized their window)
    t0 = 1_700_000_000_000_000
    step = 1_000_000

    def mk(ts_list, tag):
        n = len(ts_list)
        t = pa.table({
            "url": pa.array([f"https://ex{i % 7}.com/{tag}/{i}"
                             for i in range(n)]),
            "warc_ts": pa.array(ts_list, pa.timestamp("us")),
            "text": pa.array(["hello world"] * n),
        })
        p = tmp_path / f"{tag}.parquet"
        pq.write_table(t, p)
        return str(p)

    b0 = mk([t0 + i * step for i in range(1000)], "b0")
    late_ts = [t0 + i * step for i in range(50)]  # window 0 again
    b1 = mk([t0 + 2000 * step + i * step for i in range(500)] + late_ts, "b1")

    eng = CepEngine(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_state_actors=2,
        window_size_s=600,       # window 0 = [t0, t0+600s)
        allowed_lateness_s=60,
        slide_count=2,
        session_gap_s=3600,
    )
    eng.run([[b0], [b1]])

    commits = [json.loads(x) for x in open(eng.sink.manifest_path)
               if x.strip()]
    commits = [c for c in commits if c.get("kind") == "commit"]
    # all 50 stragglers were beyond lateness for the pane flow
    assert commits[1]["n_late"] >= 50

    # the first window's pane count equals its on-time rows from batch 0
    # only — the 50 late replays in batch 1 never reopen it
    size_us = 600 * 1_000_000
    w0_id = t0 // size_us
    expected_w0 = sum(
        1 for i in range(1000) if (t0 + i * step) // size_us == w0_id
    )
    win = eng.sink.read_all_windows()
    w0 = win.filter(pc.equal(win.column("window_id"), w0_id))
    assert sum(w0.column("n_pages").to_pylist()) == expected_w0


@pytest.mark.usefixtures("ray_session")
def test_cep_tiered_seen_state_spills_and_matches(
    pages_shards, prior_crawl, tmp_path
):
    """With a tiny hot-tier cap the seen/prior state must spill to the
    sqlite cold tier, keep actor memory bounded, and still produce
    byte-identical windows — including across a kill/resume while
    spilled (the cold tier rolls back to the restore batch)."""
    paths, src = pages_shards
    prior_path, _, _ = prior_crawl
    groups = [[p] for p in paths]

    ref = CepEngine(
        out_dir=str(tmp_path / "out-ref"),
        checkpoint_dir=str(tmp_path / "ckpt-ref"),
        num_state_actors=3,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
    )
    ref.load_prior_crawl([prior_path])
    ref.run(groups)
    ref_windows = _pane_dict(ref.sink.read_all_windows())

    cap = 40
    eng1 = CepEngine(
        out_dir=str(tmp_path / "out-tiny"),
        checkpoint_dir=str(tmp_path / "ckpt-tiny"),
        num_state_actors=3,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
        seen_mem_entries=cap,
    )
    eng1.load_prior_crawl([prior_path])
    eng1.run(groups[:2], final_flush=False)

    eng2 = CepEngine(
        out_dir=str(tmp_path / "out-tiny"),
        checkpoint_dir=str(tmp_path / "ckpt-tiny"),
        num_state_actors=3,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
        seen_mem_entries=cap,
    )
    eng2.load_prior_crawl([prior_path])
    m = eng2.run(groups)
    got = _pane_dict(eng2.sink.read_all_windows())
    assert got == ref_windows
    # memory stayed bounded and the cold tier was actually used
    stats = m["actor_stats"]
    assert any(st["seen_spilled"] for st in stats)
    assert all(st["seen_mem_entries"] <= cap + 1 for st in stats)


@pytest.mark.usefixtures("ray_session")
def test_cep_bloom_seen_mode_smoke(pages_shards, prior_crawl, tmp_path):
    """Documented approximate mode: bloom dedup runs end-to-end; additive
    metrics that do not depend on dedup (n_pages) match the exact run."""
    paths, src = pages_shards
    prior_path, _, _ = prior_crawl
    eng = CepEngine(
        out_dir=str(tmp_path / "out-bloom"),
        checkpoint_dir=str(tmp_path / "ckpt-bloom"),
        num_state_actors=2,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
        seen_mode="bloom",
    )
    eng.load_prior_crawl([prior_path])
    eng.run([[p] for p in paths])
    got = _pane_dict(eng.sink.read_all_windows())
    exp = _oracle_panes(src, prior_path)
    assert {k: v[0] for k, v in got.items()} == {
        k: v[0] for k, v in exp.items()
    }


@pytest.mark.usefixtures("ray_session")
def test_cep_distributed_merge_matches_driver_merge(
    pages_shards, prior_crawl, tmp_path
):
    """With distributed_merge_threshold=0 every finalization runs the
    actor-spill -> Ray-groupby -> partitioned-write path; pane contents
    (all three flows) must equal the driver-merge run exactly."""
    paths, src = pages_shards
    prior_path, _, _ = prior_crawl
    groups = [[p] for p in paths]

    def run(outdir, ckptdir, threshold):
        eng = CepEngine(
            out_dir=str(tmp_path / outdir),
            checkpoint_dir=str(tmp_path / ckptdir),
            num_state_actors=3,
            window_size_s=WINDOW_S,
            allowed_lateness_s=LATENESS_S,
            distributed_merge_threshold=threshold,
            merge_parts=4,
        )
        eng.load_prior_crawl([prior_path])
        eng.run(groups)
        return eng

    drv = run("out-drv", "ckpt-drv", 1 << 60)
    dist = run("out-dist", "ckpt-dist", 0)
    assert _pane_dict(dist.sink.read_all_windows()) == _pane_dict(
        drv.sink.read_all_windows()
    )
    for kind in ("sliding", "sessions"):
        a = drv.sink.read_all_windows(kind=kind)
        b = dist.sink.read_all_windows(kind=kind)
        ka = sorted(map(tuple, a.to_pylist()), key=str)
        kb = sorted(map(tuple, b.to_pylist()), key=str)
        assert ka == kb
    # the distributed path actually ran (directory parts + manifest tag)
    import json

    modes = set()
    with open(dist.sink.manifest_path) as fh:
        for line in fh:
            rec = json.loads(line)
            if rec.get("kind") == "commit":
                modes.add(rec.get("merge_mode"))
    assert modes == {"distributed"}


@pytest.mark.usefixtures("ray_session")
def test_cep_distributed_merge_kill_resume_byte_equal(
    pages_shards, prior_crawl, tmp_path
):
    """Kill/resume under distributed merge: replayed batches regenerate
    byte-identical part files (exactly-once)."""
    import hashlib

    paths, src = pages_shards
    prior_path, _, _ = prior_crawl
    groups = [[p] for p in paths]

    def mk(outdir):
        eng = CepEngine(
            out_dir=str(tmp_path / outdir),
            checkpoint_dir=str(tmp_path / f"{outdir}-ckpt"),
            num_state_actors=3,
            window_size_s=WINDOW_S,
            allowed_lateness_s=LATENESS_S,
            distributed_merge_threshold=0,
            merge_parts=4,
        )
        eng.load_prior_crawl([prior_path])
        return eng

    clean = mk("odm-clean")
    clean.run(groups)

    eng1 = mk("odm-resume")
    eng1.run(groups[:2], final_flush=False)
    eng2 = mk("odm-resume")
    eng2.run(groups)

    def digest(root):
        h = {}
        import pathlib

        for p in sorted(pathlib.Path(root).rglob("part-*.parquet")):
            h[str(p.relative_to(root))] = hashlib.sha256(
                p.read_bytes()
            ).hexdigest()
        return h

    assert digest(tmp_path / "odm-clean" ) == digest(tmp_path / "odm-resume")


@pytest.mark.usefixtures("ray_session")
def test_fresh_run_resets_stale_cold_tier(pages_shards, prior_crawl,
                                          tmp_path):
    """A FRESH stream over a reused checkpoint dir must not consult the
    previous run's spilled seen-state (review finding): run twice with a
    tiny hot tier + same checkpoint dir but fresh out dirs; the second
    run's panes must equal the first's."""
    paths, src = pages_shards
    prior_path, _, _ = prior_crawl
    groups = [[p] for p in paths]
    ckpt = str(tmp_path / "ckpt-shared")

    def run(outdir):
        eng = CepEngine(
            out_dir=str(tmp_path / outdir),
            checkpoint_dir=ckpt,
            num_state_actors=2,
            window_size_s=WINDOW_S,
            allowed_lateness_s=LATENESS_S,
            seen_mem_entries=40,
        )
        eng.load_prior_crawl([prior_path])
        eng.run(groups)
        return _pane_dict(eng.sink.read_all_windows())

    first = run("out-first")
    second = run("out-second")
    assert second == first  # stale spilled urls would inflate n_dup


@pytest.mark.usefixtures("ray_session")
def test_merge_mode_switch_on_resume_no_double_count(
    pages_shards, prior_crawl, tmp_path
):
    """Crash after a driver-mode write but before commit, then resume
    with distributed merge: the stale single-file artifact must not be
    double-counted next to the new directory parts (review finding)."""
    paths, src = pages_shards
    prior_path, _, _ = prior_crawl
    groups = [[p] for p in paths]

    def mk(threshold):
        eng = CepEngine(
            out_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            num_state_actors=2,
            window_size_s=WINDOW_S,
            allowed_lateness_s=LATENESS_S,
            distributed_merge_threshold=threshold,
            merge_parts=3,
        )
        eng.load_prior_crawl([prior_path])
        return eng

    # driver-mode run of the first two batches, commits present
    eng1 = mk(1 << 60)
    eng1.run(groups[:2], final_flush=False)
    # simulate a crash AFTER batch-2 files were written but BEFORE its
    # commit: run batch 3 then strip its commit record
    eng1.run(groups[:3], final_flush=False)
    manifest = tmp_path / "out" / "MANIFEST.jsonl"
    lines = manifest.read_text().splitlines()
    import json as _json

    keep = [ln for ln in lines
            if _json.loads(ln).get("batch") != 2]
    manifest.write_text("\n".join(keep) + "\n")

    # resume with the OPPOSITE merge mode: batch 2 replays distributed
    eng2 = mk(0)
    eng2.run(groups)
    got = _pane_dict(eng2.sink.read_all_windows())

    clean = CepEngine(
        out_dir=str(tmp_path / "out-clean"),
        checkpoint_dir=str(tmp_path / "ckpt-clean"),
        num_state_actors=2,
        window_size_s=WINDOW_S,
        allowed_lateness_s=LATENESS_S,
    )
    clean.load_prior_crawl([prior_path])
    clean.run(groups)
    assert got == _pane_dict(clean.sink.read_all_windows())

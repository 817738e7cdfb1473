"""Driver-mimic correctness harness: run every catalog query through Ray
and its DuckDB oracle on the same parquet tables; compare row counts,
schemas and order-insensitive values — the same gate the external driver
applies at sf0.01 (here at sf0.001 for speed)."""

from __future__ import annotations

from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from headson_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return c


def _to_frame(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        df = result.to_pandas()
    elif isinstance(result, pd.DataFrame):
        df = result
    else:  # ray Dataset
        df = result.to_pandas()
    return df


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(con, name):
    got = _norm(_to_frame(QUERIES[name](SF_DIR)))
    exp = _norm(con.execute(ORACLE_SQL[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLE_SQL))
)
def test_rows_only_queries_run(name):
    got = _to_frame(QUERIES[name](SF_DIR))
    assert len(got) >= 0
    if name in ("summarize_documents", "quality_scores", "lang_id",
                "fingerprints", "simhash"):
        assert len(got) == 500  # one row per document at sf0.001


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_recall_vs_brute_force():
    """IVF ANN must reach high recall against the exact top-k."""
    exact = _to_frame(QUERIES["knn_topk"](SF_DIR))
    approx = _to_frame(QUERIES["ivf_topk"](SF_DIR))
    exact_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    approx_sets = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


@pytest.mark.usefixtures("ray_session")
def test_lsh_topk_recall_vs_brute_force():
    """LSH ANN must reach high recall against the exact top-k."""
    exact = _to_frame(QUERIES["knn_topk"](SF_DIR))
    approx = _to_frame(QUERIES["lsh_topk"](SF_DIR))
    exact_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    approx_sets = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


@pytest.mark.usefixtures("ray_session")
def test_ivf_index_reads_only_probed_partitions(tmp_path, monkeypatch):
    """The IVF partitioned layout must prune I/O: ivf_topk_indexed may
    read_parquet ONLY the probed ivf_cell=<c> hive partitions — a strict
    subset of the cells on disk — and its results must still recall >=
    0.8 of the exact top-k."""
    import os

    import numpy as np
    import ray.data

    from headson_ray.stages.similarity import (
        _probe_cells,
        brute_force_topk,
        build_ivf_index,
        ivf_topk_indexed,
    )

    rng = np.random.RandomState(11)
    # 8 well-separated clusters so cells are meaningful
    centers = rng.standard_normal((8, 12)) * 4
    vecs = np.concatenate(
        [c + 0.05 * rng.standard_normal((64, 12)) for c in centers]
    )
    n = vecs.shape[0]
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    idx = str(tmp_path / "ivf")
    cents = build_ivf_index(ds, idx, num_centroids=8)
    cell_dirs = sorted(os.listdir(os.path.join(idx, "cells")))
    assert len(cell_dirs) >= 4  # clusters spread over several cells

    queries = vecs[:3]
    expected_dirs = {
        os.path.join(idx, "cells", f"ivf_cell={c}")
        for c in _probe_cells(cents, queries, 2)
        if os.path.isdir(os.path.join(idx, "cells", f"ivf_cell={c}"))
    }
    assert len(expected_dirs) < len(cell_dirs)  # strict pruning

    captured = {}
    orig = ray.data.read_parquet

    def spy(paths, **kw):
        captured["paths"] = list(paths)
        return orig(paths, **kw)

    monkeypatch.setattr(ray.data, "read_parquet", spy)
    got = ivf_topk_indexed(idx, queries, k=5, nprobe=2)
    assert {os.path.dirname(p) for p in captured["paths"]} == expected_dirs

    monkeypatch.undo()
    exact = brute_force_topk(ds, queries, k=5)
    gdf, edf = got.to_pandas(), exact.to_pandas()
    recalls = []
    for qi in range(3):
        e = set(edf[edf.query_id == qi].neighbor_id)
        g = set(gdf[gdf.query_id == qi].neighbor_id)
        recalls.append(len(e & g) / len(e))
    assert sum(recalls) / len(recalls) >= 0.8, recalls


@pytest.mark.usefixtures("ray_session")
def test_brute_force_topk_merge_is_distributed(monkeypatch):
    """The top-k merge must happen in the groupby(query) stage, not on
    the driver: per-block partials (nq*(k+1)*n_blocks rows) never
    materialize driver-side — only the final <= nq*k merged rows do.
    Spy: forbid Dataset.take_all for the whole call, and check the
    result against a local numpy brute force."""
    import numpy as np
    import ray.data

    from headson_ray.stages.similarity import brute_force_topk

    rng = np.random.RandomState(7)
    n, dim, nq, k = 512, 16, 3, 5
    vecs = rng.standard_normal((n, dim))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    vecs.tolist(), pa.list_(pa.float64())
                ),
            }
        )
    ).repartition(16)
    queries = vecs[:nq]

    def _forbidden(self, *a, **kw):
        raise AssertionError(
            "take_all on the driver during brute_force_topk"
        )

    monkeypatch.setattr(ray.data.Dataset, "take_all", _forbidden)
    got = brute_force_topk(ds, queries, k=k, exclude_self=True)
    assert got.num_rows <= nq * k

    qn = vecs[:nq] / np.linalg.norm(vecs[:nq], axis=1, keepdims=True)
    mn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = qn @ mn.T
    gdf = got.to_pandas()
    for qi in range(nq):
        cand = [(-sims[qi, j], j) for j in range(n) if j != qi]
        cand.sort()
        exp = [j for _s, j in cand[:k]]
        gq = gdf[gdf.query_id == qi].sort_values("rank")
        assert gq.neighbor_id.tolist() == exp


@pytest.mark.usefixtures("ray_session")
def test_sequence_packing_driver_fold_is_superbucket_bound(monkeypatch):
    """The packing prefix scan's driver state must be the SUPERbucket
    offsets (O(sqrt n)), never the per-bucket sums: with 2000 docs,
    bucket_width=8 and super_width=8 there are 250 buckets but only 32
    superbuckets — the fold must see exactly those 32 rows. Result is
    checked against a local ordered prefix scan."""
    import numpy as np
    import ray.data

    import headson_ray.pipelines.queries as Q

    n, bw, sw, budget = 2000, 8, 8, 50
    rng = np.random.RandomState(3)
    counts = rng.randint(0, 12, size=n)
    texts = ["w " * int(c) for c in counts]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(16)

    seen = {}
    orig = Q._fold_super_offsets

    def spy(super_sums):
        sk, excl = orig(super_sums)
        seen["rows"] = int(sk.size)
        return sk, excl

    monkeypatch.setattr(Q, "_fold_super_offsets", spy)
    got = (
        Q.sequence_packing(
            ds, budget=budget, bucket_width=bw, super_width=sw
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert seen["rows"] == 32  # superbuckets, not the 250 buckets

    excl = np.concatenate(([0], np.cumsum(counts)[:-1]))
    assert got.doc_id.tolist() == list(range(n))
    assert got.pack_id.tolist() == (excl // budget).tolist()


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_pairs_exact_vs_brute_force():
    """The inverted-index pipeline must find exactly the brute-force
    above-threshold pairs (shingle sets here are small, so every pair
    shares a sub-cap shingle)."""
    import pyarrow.parquet as pq

    from headson_ray.stages.dedup import jaccard, word_shingles

    docs = pq.read_table(
        Path(SF_DIR) / "documents.parquet", columns=["doc_id", "text"]
    )
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    sh = {i: word_shingles(t or "", 3) for i, t in zip(ids, texts)}
    expected = set()
    sids = sorted(sh)
    for x in range(len(sids)):
        for y in range(x + 1, len(sids)):
            a, b = sids[x], sids[y]
            if sh[a] and sh[b] and jaccard(sh[a], sh[b]) >= 0.5:
                expected.add((a, b))
    got = _to_frame(QUERIES["ngram_jaccard_pairs"](SF_DIR))
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs == expected


@pytest.mark.usefixtures("ray_session")
def test_orders_by_segment_hash_join_fallback(con, monkeypatch):
    """With a forced-low broadcast limit the query must switch to the
    hash-partitioned join and still match the oracle exactly."""
    import headson_ray.pipelines.queries as q

    monkeypatch.setattr(q, "BROADCAST_ROW_LIMIT", 10)
    got = _norm(_to_frame(q.q_orders_by_segment(SF_DIR)))
    exp = _norm(con.execute(ORACLE_SQL["orders_by_segment"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_regional_revenue_hash_join_fallback(con, monkeypatch):
    """With the broadcast limit forced between supplier size (10 rows at
    sf0.001 — still broadcastable) and customer size (150 rows), the Q5
    chain must route the customer-nation lookup through the
    hash-partitioned join and stay oracle-exact."""
    import headson_ray.pipelines.queries as q

    monkeypatch.setattr(q, "BROADCAST_ROW_LIMIT", 50)
    got = _norm(_to_frame(q.q_regional_nation_revenue(SF_DIR)))
    exp = _norm(con.execute(ORACLE_SQL["regional_nation_revenue"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_promo_revenue_hash_join_fallback(con, monkeypatch):
    """With the part side over a forced-low broadcast limit, the Q14
    shape must route through the bucket hash_join (bucket_post emits the
    same per-month partials) and stay oracle-exact."""
    import headson_ray.pipelines.queries as q

    monkeypatch.setattr(q, "BROADCAST_ROW_LIMIT", 10)
    got = _norm(_to_frame(q.q_promo_revenue_share(SF_DIR)))
    exp = _norm(con.execute(ORACLE_SQL["promo_revenue_share"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_cms_point_query_guarantee(con):
    """Count-Min point estimates (min over depth rows) must NEVER
    under-count: for every user the estimate is >= the true event
    count, and with depth*width >> #users here it is exact for most."""
    import numpy as np

    from headson_ray.pipelines.queries import (
        CMS_SALTS,
        CMS_WIDTH,
        QUERIES,
    )
    from headson_ray.stages.hashing import mix_rounds

    cms = _to_frame(QUERIES["cms_user_registers"](SF_DIR))
    counters = {}
    for r, c, n in zip(cms["sketch_row"], cms["col"], cms["cnt"]):
        counters[(int(r), int(c))] = int(n)
    truth = con.execute(
        "SELECT user_id, count(*) FROM events"
        " WHERE user_id IS NOT NULL GROUP BY 1"
    ).fetchall()
    assert truth
    exact = 0
    for uid, true_n in truth:
        est = min(
            counters.get(
                (r,
                 int(mix_rounds(
                     np.array([uid], np.uint64) + np.uint64(s)
                 )[0] % np.uint64(CMS_WIDTH))),
                0,
            )
            for r, s in enumerate(CMS_SALTS)
        )
        assert est >= true_n, (uid, est, true_n)
        exact += est == true_n
    assert exact / len(truth) > 0.5


@pytest.mark.usefixtures("ray_session")
def test_brand_disjunctive_hash_join_fallback(con, monkeypatch):
    """The Q19 disjunctive predicate must produce identical (revenue,
    count) through the hash_join fallback as through the broadcast
    probes."""
    import headson_ray.pipelines.queries as q

    monkeypatch.setattr(q, "BROADCAST_ROW_LIMIT", 10)
    got = _norm(_to_frame(q.q_brand_disjunctive_revenue(SF_DIR)))
    exp = _norm(con.execute(ORACLE_SQL["brand_disjunctive_revenue"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_late_ship_exists_rewrite_counts_orders_once():
    """The EXISTS rewrite must count each qualifying ORDER once, however
    many late line items it has: every per-priority count is bounded by
    the number of distinct orders in the window."""
    import duckdb as _d

    from headson_ray.pipelines.queries import (
        Q5_HI_US,
        Q5_LO_US,
        q_late_ship_priority_counts,
    )

    got = _to_frame(q_late_ship_priority_counts(SF_DIR))
    bound = _d.connect().execute(
        f"""SELECT o_orderpriority, count(*) AS n FROM
            read_parquet('{SF_DIR}/orders.parquet')
            WHERE epoch_us(o_orderdate) >= {Q5_LO_US}
              AND epoch_us(o_orderdate) < {Q5_HI_US}
            GROUP BY 1"""
    ).df().set_index("o_orderpriority")["n"]
    assert len(got) > 0
    for prio, n in zip(got["o_orderpriority"], got["n_late_orders"]):
        assert 0 < n <= bound[prio]


@pytest.mark.usefixtures("ray_session")
def test_customer_order_distribution_counts_zero_order_customers(tmp_path):
    """The LEFT-JOIN semantics must survive the zero-marker-union
    rewrite: customers with no orders land in the n_orders=0 bucket."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import q_customer_order_distribution

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {"o_custkey": pa.array([1, 1, 1, 3], pa.int64())}
        ),
        tmp_path / "orders.parquet",
    )
    got = _to_frame(q_customer_order_distribution(str(tmp_path)))
    dist = dict(zip(got["n_orders"], got["n_customers"]))
    assert dist == {0: 2, 1: 1, 3: 1}


@pytest.mark.usefixtures("ray_session")
def test_broadcast_lookup_guardrail_raises(monkeypatch):
    import ray.data

    import headson_ray.pipelines.queries as q

    monkeypatch.setattr(q, "BROADCAST_ROW_LIMIT", 3)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(range(10), pa.int64()),
                  "v": pa.array([str(i) for i in range(10)])})
    )
    with pytest.raises(ValueError, match="BROADCAST_ROW_LIMIT"):
        q._broadcast_lookup(ds, "k", "v")


@pytest.mark.usefixtures("ray_session")
def test_near_dup_verification_memory_is_o_candidates():
    """The verification stage must build shingle sets ONLY for candidate
    ids (semi-join), never the whole corpus: on a corpus where candidates
    are a tiny fraction, the broadcast map stays tiny."""
    import ray.data

    from headson_ray.stages.dedup import (
        _collect_candidate_ids,
        candidate_shingle_map,
    )

    n = 400
    texts = [f"unique document number {i} with words {i * 7} {i * 13}"
             for i in range(n)]
    # two near-dup clusters -> only their ids become candidates
    texts[10] = texts[11] = "alpha beta gamma delta epsilon zeta"
    texts[20] = texts[21] = "one two three four five six seven"
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts)})
    )
    pairs = ray.data.from_arrow(
        pa.table({"a": pa.array([10, 20], pa.int64()),
                  "b": pa.array([11, 21], pa.int64())})
    )
    cand = _collect_candidate_ids(pairs)
    assert sorted(cand.tolist()) == [10, 11, 20, 21]
    sm = candidate_shingle_map(
        ds, cand, id_column="doc_id", text_column="text", shingle_k=3
    )
    assert sorted(sm) == [10, 11, 20, 21]  # O(candidates), not O(corpus)


@pytest.mark.usefixtures("ray_session")
def test_dup_shingle_stats_no_driver_broadcast(monkeypatch):
    """The dup-shingle membership test is a partitioned semi-join: the
    driver must never collect and ray.put the corpus dup-shingle set
    (round-3 weak point — that set is O(corpus) at scale). Spy on
    ray.put for the whole plan+consume lifecycle: no numpy array may
    pass through it."""
    import numpy as np
    import ray

    from headson_ray.pipelines.queries import QUERIES

    put_types = []
    orig_put = ray.put

    def spy(value, *a, **kw):
        put_types.append(type(value))
        return orig_put(value, *a, **kw)

    monkeypatch.setattr(ray, "put", spy)
    got = _to_frame(QUERIES["dup_shingle_stats"](SF_DIR))
    assert len(got) > 0 and got["dup_shingles"].sum() > 0
    assert not any(t is np.ndarray for t in put_types), put_types


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_finds_large_boilerplate_cluster():
    """A cluster of identical boilerplate docs larger than any posting-run
    cap must be found IN FULL (the old bucket_cap=64 silently dropped
    such clusters)."""
    import ray.data

    from headson_ray.stages.dedup import ngram_jaccard_pairs

    n_cluster, n_unique = 80, 40
    texts = ["copyright boilerplate footer text all rights reserved"] * n_cluster
    texts += [f"unique doc {i} containing words {i * 3} {i * 11} {i * 17}"
              for i in range(n_unique)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    )
    got = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    expected_pairs = n_cluster * (n_cluster - 1) // 2
    assert len(got) == expected_pairs
    assert (got["jaccard_ppm"] == 1_000_000).all()


@pytest.mark.usefixtures("ray_session")
def test_simhash_near_dups_exact_vs_brute_force():
    """Pigeonhole banding must find EXACTLY the pairs within max_hamming
    bits (no recall loss, no false pairs)."""
    import pyarrow.parquet as pq

    from headson_ray.stages.dedup import simhash_near_dups, simhash_signatures
    import ray.data

    docs = pq.read_table(
        Path(SF_DIR) / "documents.parquet", columns=["doc_id", "text"]
    )
    sigs = simhash_signatures(docs)
    ids = sigs.column("doc_id").to_pylist()
    hs = sigs.column("simhash").to_pylist()
    expected = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin((hs[x] ^ hs[y]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if d <= 3:
                a, b = sorted((ids[x], ids[y]))
                expected.add((a, b))
    got = simhash_near_dups(
        ray.data.from_arrow(docs), max_hamming=3
    ).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs == expected


@pytest.mark.usefixtures("ray_session")
def test_near_dup_canonical_transitive_cluster():
    """A near-dup CHAIN (a~b, b~c, but a!~c still in one component) must
    collapse to one canonical id via the union-find."""
    import ray.data

    from headson_ray.stages.dedup import near_dup_canonical

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",          # 0
        "alpha beta gamma delta epsilon zeta eta iota",           # 1 ~ 0
        "alpha beta gamma delta epsilon zeta kappa iota",         # 2 ~ 1
        "completely different text about other things entirely",  # 3
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts)})
    )
    got = near_dup_canonical(ds, threshold=0.4).to_pandas()
    canon = dict(zip(got["doc_id"], got["canonical_id"]))
    assert canon[0] == canon[1] == canon[2] == 0
    assert canon[3] == 3


def test_misra_gries_trim_mergeable_guarantee():
    from collections import Counter

    from headson_ray.stages.sketch import misra_gries_trim

    c = Counter({f"t{i}": 1 for i in range(100)})
    c["hot"] = 50
    trimmed = misra_gries_trim(c, 10)
    assert len(trimmed) <= 10
    # any item with freq > N/(C+1) survives with count >= freq - N/(C+1)
    n = 150
    assert "hot" in trimmed and trimmed["hot"] >= 50 - n / 11


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("force_distributed", [False, True])
def test_components_min_label_matches_union_find(
    monkeypatch, force_distributed
):
    """Both closure paths — the single-task union-find fold (small
    graphs) and the iterative min-label propagation (forced here by
    zeroing the small-graph threshold) — must produce the exact same
    components on an adversarial graph (long chain + star + singleton
    pairs)."""
    import ray.data

    import headson_ray.stages.dedup as dedup_mod
    from headson_ray.stages.dedup import components_min_label

    if force_distributed:
        monkeypatch.setattr(dedup_mod, "SMALL_COMPONENT_GRAPH_ROWS", 0)

    # chain 100..110, star around 200, disjoint pair (301,300), loner 400
    edges = [(i, i + 1) for i in range(100, 110)]
    edges += [(200, x) for x in (201, 202, 203)]
    edges += [(301, 300), (400, 401)]
    pairs = ray.data.from_arrow(
        pa.table({"a": pa.array([a for a, _ in edges], pa.int64()),
                  "b": pa.array([b for _, b in edges], pa.int64())})
    )
    labels = {
        r["node"]: r["lbl"]
        for b in components_min_label(pairs).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    for i in range(100, 111):
        assert labels[i] == 100
    for x in (200, 201, 202, 203):
        assert labels[x] == 200
    assert labels[300] == labels[301] == 300
    assert labels[400] == labels[401] == 400


@pytest.mark.usefixtures("ray_session")
def test_near_dup_canonical_distributed_equals_driver():
    import ray.data

    from headson_ray.stages.dedup import near_dup_canonical

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "alpha beta gamma delta epsilon zeta kappa iota",
        "completely different text about other things entirely",
        "yet another unrelated document body of words here",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts)})
    )
    drv = near_dup_canonical(ds, threshold=0.4).to_pandas()
    dist = near_dup_canonical(
        ds, threshold=0.4, method="distributed"
    ).to_pandas()
    d1 = dict(zip(drv["doc_id"], drv["canonical_id"]))
    d2 = dict(zip(dist["doc_id"], dist["canonical_id"]))
    assert d1 == d2


@pytest.mark.usefixtures("ray_session")
def test_rank_select_multi_round_refinement():
    """Force several histogram-refinement rounds (tiny collect_cap,
    few bins) on a duplicate-heavy distribution; results must equal
    plain sorted-order selection."""
    import numpy as np
    import ray.data

    from headson_ray.stages.sketch import rank_select

    rng = np.random.RandomState(7)
    vals = np.concatenate([
        rng.normal(0, 1, 20_000),
        np.full(5_000, 0.5),          # heavy ties
        rng.uniform(100, 101, 500),   # far cluster
    ])
    ds = ray.data.from_arrow(
        pa.table({"value": pa.array(vals, pa.float64())})
    ).repartition(8)
    n = len(vals)
    ranks = [0, n // 2, n * 9 // 10, n - 1]
    got = rank_select(ds, "value", ranks, num_bins=16, collect_cap=200)
    exp = np.sort(vals)[ranks]
    assert np.allclose(got, exp, rtol=0, atol=0)


@pytest.mark.usefixtures("ray_session")
def test_domain_fileset_previews_sections_and_budget():
    got = _to_frame(QUERIES["domain_fileset_previews"](SF_DIR))
    assert len(got) > 10  # one row per domain present in the sample
    row = got[got["n_files"] > 6].iloc[0]
    # fileset sections render and the ONE shared budget is respected
    assert "==> https://" in row["preview"]
    import re

    uncolored = re.sub("\x1b\\[[0-9;]*m", "", row["preview"])
    assert len(uncolored) <= 400


def test_preview_fixtures_not_stale():
    """The committed preview fixtures (the DuckDB oracles for
    summarize_documents / summarize_pages) must match a FRESH run of the
    snapshot-validated core — a core change without regenerating
    tools/build_preview_fixtures.py fails here, not at the driver."""
    import pyarrow.parquet as pq

    from headson_ray.stages.summarize import Summarizer

    fx = pq.read_table(
        Path(__file__).parent / "fixtures" / "doc_previews.parquet"
    )
    by_text = dict(
        zip(fx.column("text").to_pylist(), fx.column("preview").to_pylist())
    )
    docs = pq.read_table(
        Path(SF_DIR) / "documents.parquet", columns=["doc_id", "text"]
    )
    out = Summarizer(budget=200, input_format="text")(docs)
    n = 0
    for text, prev in zip(
        out.column("text").to_pylist(), out.column("preview").to_pylist()
    ):
        assert by_text[text] == prev
        n += 1
    assert n == docs.num_rows

    # pages fixture: first shard of the deterministic 5000-page stream,
    # summarized through the same flagship kernel the query uses
    from headson_ray.sources.pages import materialize_pages

    pfx = pq.read_table(
        Path(__file__).parent / "fixtures" / "page_previews.parquet"
    )
    assert pfx.num_rows == 5000
    by_url = dict(
        zip(pfx.column("url").to_pylist(), pfx.column("preview").to_pylist())
    )
    paths = materialize_pages(5000, tag="q-5000")
    shard = pq.read_table(paths[0])
    ps = Summarizer(budget=300)(shard)
    m = 0
    for url, prev in zip(
        ps.column("url").to_pylist(), ps.column("preview").to_pylist()
    ):
        assert by_url[url] == prev
        m += 1
    assert m == shard.num_rows > 0


def test_fileset_preview_fixture_not_stale():
    """The committed per-domain fileset-preview fixture (the DuckDB
    oracle for domain_fileset_previews) must match a FRESH in-process
    recomputation of the same pure group kernel over the same
    deterministic 5000-page stream."""
    import pyarrow.parquet as pq

    from headson_ray.sources.pages import materialize_pages
    from headson_ray.stages.derive import add_domain
    from headson_ray.stages.summarize import fileset_preview_group

    fx = pq.read_table(
        Path(__file__).parent / "fixtures" / "fileset_previews.parquet"
    )
    by_domain = {
        d: (n, p)
        for d, n, p in zip(
            fx.column("domain").to_pylist(),
            fx.column("n_files").to_pylist(),
            fx.column("preview").to_pylist(),
        )
    }
    paths = materialize_pages(5000, tag="q-5000")
    t = pa.concat_tables(
        [pq.read_table(p, columns=["url", "text"]) for p in paths]
    )
    t = add_domain(t)
    groups: dict[str, list[int]] = {}
    for i, d in enumerate(t.column("domain").to_pylist()):
        groups.setdefault(d, []).append(i)
    assert len(groups) == fx.num_rows
    for d, idx in groups.items():
        out = fileset_preview_group(
            t.take(pa.array(idx)), budget=400, max_files=6
        )
        assert by_domain[d] == (
            out.column("n_files")[0].as_py(),
            out.column("preview")[0].as_py(),
        ), d


@pytest.mark.usefixtures("ray_session")
def test_minhash_near_dups_precision_and_high_sim_recall():
    """Verification makes precision exactly 1 (every emitted pair has
    true jaccard >= threshold); banding recall for HIGH-similarity pairs
    (j >= 0.8 -> detection prob ~0.9996 per pair, deterministic here via
    fixed seeds) must be total on this corpus."""
    import pyarrow.parquet as pq

    from headson_ray.stages.dedup import jaccard, word_shingles

    docs = pq.read_table(
        Path(SF_DIR) / "documents.parquet", columns=["doc_id", "text"]
    )
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    sh = {i: word_shingles(t or "", 3) for i, t in zip(ids, texts)}
    exact_05, exact_08 = set(), set()
    sids = sorted(sh)
    for x in range(len(sids)):
        for y in range(x + 1, len(sids)):
            a, b = sids[x], sids[y]
            if not (sh[a] or sh[b]):
                continue
            j = jaccard(sh[a], sh[b])
            if j >= 0.5:
                exact_05.add((a, b))
            if j >= 0.8:
                exact_08.add((a, b))
    got = _to_frame(QUERIES["minhash_near_dups"](SF_DIR))
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs <= exact_05          # precision = 1
    assert exact_08 <= got_pairs          # high-sim pairs all found
    assert (got["jaccard_ppm"] >= 500_000).all()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_ngram_jaccard_randomized_equals_brute_force(seed):
    """Adversarial prefix-filter check: tiny vocabulary (maximal shingle
    collisions), highly variable doc lengths, duplicate docs — the
    pipeline must still find EXACTLY the brute-force pair set."""
    import numpy as np
    import ray.data

    from headson_ray.stages.dedup import (
        jaccard,
        ngram_jaccard_pairs,
        word_shingles,
    )

    rng = np.random.RandomState(seed)
    vocab = ["a", "b", "c", "d", "e"]
    texts = []
    for i in range(120):
        n = int(rng.randint(1, 25))
        texts.append(" ".join(vocab[rng.randint(0, len(vocab))]
                              for _ in range(n)))
    # inject exact dups and prefix-sharing docs
    texts[5] = texts[6]
    texts[10] = texts[11] + " a"
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    )
    sh = {i: word_shingles(t, 3) for i, t in enumerate(texts)}
    expected = set()
    for x in range(len(texts)):
        for y in range(x + 1, len(texts)):
            if (sh[x] or sh[y]) and jaccard(sh[x], sh[y]) >= 0.5:
                expected.add((x, y))
    got = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    assert set(zip(got["a"], got["b"])) == expected


@pytest.mark.usefixtures("ray_session")
def test_minhash_handles_empty_documents():
    """Two empty docs form a candidate pair with empty shingle sets —
    must emit jaccard 1.0, not ZeroDivisionError (review finding)."""
    import ray.data

    from headson_ray.stages.dedup import minhash_near_dups

    texts = ["", "   ", "a real document with several words inside it"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts)})
    )
    got = minhash_near_dups(ds, threshold=0.5).to_pandas()
    pairs = dict(zip(zip(got["a"], got["b"]), got["jaccard"]))
    assert pairs.get((0, 1)) == 1.0


def test_fileset_preview_color_pinned_off(monkeypatch):
    """Preview data must be byte-identical regardless of worker env:
    CLICOLOR_FORCE must not inject ANSI (review finding)."""
    from headson_ray.stages.summarize import fileset_preview_group

    monkeypatch.setenv("CLICOLOR_FORCE", "1")
    g = pa.table(
        {
            "domain": pa.array(["d.com"] * 2),
            "url": pa.array(["https://d.com/a", "https://d.com/b"]),
            "text": pa.array(['{"k": "v"}', '{"x": 1}']),
        }
    )
    out = fileset_preview_group(g, budget=200)
    assert "\x1b[" not in out.column("preview")[0].as_py()


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_uniform_distribution_raises_not_silent():
    """Review finding: when trimming drops everything (near-uniform
    distribution beyond capacity) the function must raise the guarantee
    error, not return an empty/truncated 'exact' top-k."""
    import ray.data

    from headson_ray.stages.sketch import heavy_hitter_tokens

    texts = [f"tok{i}" for i in range(500)]  # 500 distinct, one each
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    with pytest.raises(ValueError, match="heavy-hitter guarantee"):
        heavy_hitter_tokens(ds, k=20, capacity=64)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_small_distinct_corpus_is_exact():
    """Fewer distinct tokens than k with no trimming: return the full
    exact counts without raising."""
    import ray.data

    from headson_ray.stages.sketch import heavy_hitter_tokens

    texts = ["a a a b b c"] * 10
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    top = heavy_hitter_tokens(ds, k=20, capacity=64)
    assert top.column("token").to_pylist() == ["a", "b", "c"]
    assert top.column("n").to_pylist() == [30, 20, 10]


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_skewed_exact_when_nothing_trimmed():
    """Advisor finding (round 2): a skewed corpus whose k-th exact count
    sits below N/(C+1) must NOT raise when no per-batch trim ever
    occurred and the merge kept the full union — the candidate set is
    provably complete, so the top-k is exact."""
    import ray.data

    from headson_ray.stages.sketch import heavy_hitter_tokens

    texts = ["tok0 " * 1000] * 1000 + [f"rare{i}" for i in range(24)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    top = heavy_hitter_tokens(ds, k=20, capacity=4096)
    assert top.num_rows == 20
    assert top.column("token")[0].as_py() == "tok0"
    assert top.column("n")[0].as_py() == 1_000_000
    # the 19 rare survivors all have exact count 1
    assert top.column("n").to_pylist()[1:] == [1] * 19


@pytest.mark.usefixtures("ray_session")
def test_rank_select_callable_ranks_skip_null_rows():
    """Advisor finding (round 2): ranks derived from ds.count() would
    include null rows; callable ranks resolve against the NON-NULL total
    computed in the min/max pass."""
    import ray.data

    from headson_ray.stages.sketch import rank_select

    vals = [float(i) for i in range(100)] + [None] * 50
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
    ranks, got = rank_select(
        ds,
        "v",
        [lambda n: n // 2, lambda n: n - 1],
        num_bins=16,
        collect_cap=8,
        return_resolved_ranks=True,
    )
    assert ranks == [50, 99]
    assert got == [50.0, 99.0]


@pytest.mark.usefixtures("ray_session")
def test_collect_small_side_empty_preserves_schema_types():
    """Advisor finding (round 2): an empty keyed side must yield empty
    arrays typed from the dataset schema, not hardcoded int64/string."""
    import ray.data

    from headson_ray.pipelines.queries import _collect_small_side

    t = pa.table(
        {
            "k": pa.array([], pa.string()),
            "v": pa.array([], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    keys, vals = _collect_small_side(ds, "k", "v", 100)
    assert keys.type == pa.string()
    assert vals.type == pa.float64()


@pytest.mark.usefixtures("ray_session")
def test_top3_per_segment_hash_join_fallback(con, monkeypatch):
    """Review finding: top3 must take the hash-join fallback (not raise)
    past the broadcast limit, and still match the oracle."""
    import headson_ray.pipelines.queries as q

    monkeypatch.setattr(q, "BROADCAST_ROW_LIMIT", 10)
    got = _norm(_to_frame(q.q_top3_orders_per_segment(SF_DIR)))
    exp = _norm(con.execute(ORACLE_SQL["top3_orders_per_segment"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_grouped_rank_select_multi_round_refinement():
    """Grouped histogram refinement with a tiny collect_cap / few bins
    (forcing several rounds AND the per-label divergent-range path)
    must equal per-group sorted selection for every (group, quantile),
    across skewed sizes, heavy ties, and a constant group."""
    import numpy as np
    import ray.data

    from headson_ray.stages.sketch import grouped_rank_select

    rng = np.random.RandomState(11)
    parts = {
        "big": np.concatenate(
            [rng.normal(0, 1, 30_000), np.full(4_000, 0.25)]
        ),
        "small": rng.uniform(-5, 5, 137),
        "const": np.full(900, 42.0),
        "far": rng.uniform(1e6, 1e6 + 1, 3_000),
    }
    g = np.concatenate(
        [np.repeat(k, len(v)) for k, v in parts.items()]
    )
    v = np.concatenate(list(parts.values()))
    perm = rng.permutation(len(v))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "grp": pa.array(g[perm]),
                "val": pa.array(v[perm], pa.float64()),
            }
        )
    ).repartition(8)
    quants = [("p10", 0.10), ("p50", 0.50), ("p99", 0.99)]
    out = grouped_rank_select(
        ds, "grp", "val", quants, num_bins=16, collect_cap=100
    )
    got = {
        (r["grp"], r["q"]): r["value"] for r in out.to_pylist()
    }
    assert len(got) == len(parts) * len(quants)
    for name, vals in parts.items():
        s = np.sort(vals)
        n = len(s)
        for lab, q in quants:
            k = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
            assert got[(name, lab)] == s[k], (name, lab)


@pytest.mark.usefixtures("ray_session")
def test_grouped_rank_select_nulls_and_nonfinite_excluded():
    """Null / NaN / inf values must be excluded from ranks the same way
    the oracle's WHERE value IS NOT NULL AND isfinite(value) is."""
    import numpy as np
    import ray.data

    from headson_ray.stages.sketch import grouped_rank_select

    vals = [1.0, None, float("nan"), float("inf"), 3.0, 2.0]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "grp": pa.array(["a"] * len(vals)),
                "val": pa.array(vals, pa.float64()),
            }
        )
    )
    out = grouped_rank_select(ds, "grp", "val", [("p50", 0.5)])
    assert out.to_pylist() == [{"grp": "a", "q": "p50", "value": 2.0}]


@pytest.mark.usefixtures("ray_session")
def test_windowed_topk_partial_trim_across_batches(tmp_path, con):
    """One giant (event_type, window) pane whose true top-2 rows sit far
    apart in the file: the per-batch partial trim must still surface the
    global top-2 after the merge (k-selection survives any block split),
    and ranks/ties must match the row_number() oracle."""
    import duckdb
    import numpy as np

    from headson_ray.pipelines.queries import (
        SQL_WINDOWED_TOPK_EVENTS,
        q_windowed_topk_events,
    )

    n = 5000
    rng = np.random.RandomState(7)
    values = rng.uniform(0.0, 50.0, size=n)
    values[10] = 99.0       # global max, early batch
    values[4000] = 98.5     # runner-up, late batch
    values[4500] = 98.5     # tie with 4000 -> event_id breaks it
    ts = np.full(n, 86_400_000_000 * 3 + 1000, dtype="datetime64[us]")
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, tmp_path / "events.parquet")
    got = _norm(_to_frame(q_windowed_topk_events(str(tmp_path))))
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    exp = _norm(c.execute(SQL_WINDOWED_TOPK_EVENTS).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert set(got["event_id"]) == {10, 4000}


@pytest.mark.usefixtures("ray_session")
def test_event_transitions_single_event_users_emit_nothing(tmp_path):
    """Users with one event contribute no transition rows; ordering is
    by (ts, event_id) so same-ts events break ties by id."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import q_event_transitions

    t0 = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [t0, t0, t0 + 5, t0 + 9], pa.timestamp("us")
            ),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "event_type": pa.array(["view", "click", "purchase", "view"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = _to_frame(q_event_transitions(str(tmp_path)))
    rows = {
        (r.prev_type, r.next_type): r.n for r in got.itertuples()
    }
    assert rows == {("view", "click"): 1, ("click", "purchase"): 1}


@pytest.mark.usefixtures("ray_session")
def test_kmeans_empty_cluster_carries_centroid(tmp_path):
    """Two identical lowest-id init vectors: every point ties to cluster
    0 (argmin == row_number tie-break), cluster 1 goes empty and must
    carry its previous centroid instead of dividing by zero — and the
    result must still match the SQL mirror on the same file."""
    import duckdb
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import (
        _kmeans_sql,
        q_kmeans_clusters,
    )
    from headson_ray.pipelines import queries as qmod

    vecs = [
        [0.5, 0.5],          # init centroid 0
        [0.5, 0.5],          # init centroid 1 (identical -> always loses ties)
        [0.4, 0.6],
        [-0.3, -0.2],
        [0.1, 0.0],
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * 5, pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    got = _norm(_to_frame(q_kmeans_clusters(str(tmp_path))))
    # the duplicate init vector (cluster 1) loses every tie to cluster 0,
    # goes empty, and must never be assigned (its carried centroid stays
    # coincident with cluster 0's start point, which always wins ties)
    assert 1 not in set(got["cluster"])
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'embeddings.parquet'}')"
    )
    exp = _norm(c.execute(_kmeans_sql()).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_grouped_rank_select_stall_resolver_is_exact_and_bounded():
    """The defensive stall path must produce exact answers via the
    distinct-count pass (driver holds O(distinct), never O(rows)).
    With overflow-safe bin steps a genuine stall may be unreachable,
    so the test drives the path deterministically via the
    force_stall_rounds hook after one ordinary refinement round."""
    import numpy as np
    import ray.data

    from headson_ray.stages.sketch import grouped_rank_select

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1000, size=50_000).astype(np.float64)
    t = pa.table(
        {"g": pa.array(["a"] * len(vals)), "v": pa.array(vals)}
    )
    ds = ray.data.from_arrow(t)
    out = grouped_rank_select(
        ds, "g", "v", [("p25", 0.25), ("p90", 0.9)],
        num_bins=4, collect_cap=16, force_stall_rounds=1,
    ).to_pandas()
    got = dict(zip(out["q"], out["value"]))
    sv = np.sort(vals)
    n = len(sv)
    for lab, q in (("p25", 0.25), ("p90", 0.9)):
        k = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
        assert got[lab] == sv[k], lab


@pytest.mark.usefixtures("ray_session")
def test_grouped_rank_select_stall_chunks_past_distinct_cap():
    """A stalled range holding MORE distinct values than
    stall_distinct_cap must resolve exactly via bounded chunked
    collection (evict-largest + rescan), not raise: the driver dict
    stays O(cap) while correctness is preserved."""
    import numpy as np
    import ray.data

    from headson_ray.stages.sketch import grouped_rank_select

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 5000, size=30_000).astype(np.float64)
    t = pa.table({"g": pa.array(["a"] * len(vals)), "v": pa.array(vals)})
    ds = ray.data.from_arrow(t)
    out = grouped_rank_select(
        ds, "g", "v", [("p50", 0.5), ("p99", 0.99)],
        num_bins=4, collect_cap=16, force_stall_rounds=1,
        stall_distinct_cap=64,  # << ~5000 distinct: forces eviction chunks
    ).to_pandas()
    got = dict(zip(out["q"], out["value"]))
    sv = np.sort(vals)
    n = len(sv)
    for lab, q in (("p50", 0.5), ("p99", 0.99)):
        k = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
        assert got[lab] == sv[k], lab


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_null_event_type_uses_default_rate(tmp_path):
    """Null event_type rows must route to the default stratum rate, not
    crash numpy fancy indexing with an object-dtype mask."""
    import numpy as np
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import (
        STRATUM_DEFAULT_RATE,
        q_stratified_sample,
    )
    from headson_ray.stages.hashing import mix_rounds

    n = 2000
    et = ["click" if i % 3 == 0 else None for i in range(n)]
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(et, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_stratified_sample(str(tmp_path)).to_pandas()
    null_kept = got[got["event_type"].isna()]["event_id"].to_numpy()
    h = mix_rounds(
        np.arange(n, dtype=np.uint64)
    ) % np.uint64(100)
    exp_null = [
        i for i in range(n)
        if et[i] is None and h[i] < STRATUM_DEFAULT_RATE
    ]
    assert sorted(null_kept.tolist()) == exp_null


@pytest.mark.usefixtures("ray_session")
def test_hll_registers_ignore_null_user_ids(tmp_path):
    """Null user_ids contribute no register (the SQL mixer emits NULL);
    the registers must equal those of the null-free projection."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import q_hll_user_registers

    ids = [i * 37 for i in range(500)] + [None] * 100
    t = pa.table({"user_id": pa.array(ids, pa.int64())})
    pq.write_table(t, tmp_path / "events.parquet")
    sub = tmp_path / "clean"
    sub.mkdir()
    pq.write_table(
        t.filter(pa.compute.is_valid(t.column("user_id"))),
        sub / "events.parquet",
    )
    got = _norm(_to_frame(q_hll_user_registers(str(tmp_path))))
    exp = _norm(_to_frame(q_hll_user_registers(str(sub))))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_grouped_rank_select_terminates_on_overflow_wide_range():
    """A group spanning +/-1.7e308 overflows hi-lo to inf; the old
    (hi-lo)/num_bins step NaN-poisoned the refined bounds (0*inf) and
    refinement looped forever. The overflow-safe step must terminate
    with exact answers."""
    import numpy as np
    import ray.data

    from headson_ray.stages.sketch import grouped_rank_select

    vals = np.concatenate(
        [np.full(100, -1.7e308), np.full(50, 1.7e308), [3.0] * 10]
    )
    t = pa.table(
        {"g": pa.array(["a"] * len(vals)), "v": pa.array(vals)}
    )
    ds = ray.data.from_arrow(t)
    out = grouped_rank_select(
        ds, "g", "v", [("p10", 0.1), ("p99", 0.99)],
        num_bins=8, collect_cap=4,
    ).to_pandas()
    got = dict(zip(out["q"], out["value"]))
    assert got["p10"] == -1.7e308
    assert got["p99"] == 1.7e308


@pytest.mark.usefixtures("ray_session")
def test_hll_registers_estimate_close_to_exact_distinct(con):
    """The sketch must actually work as an HLL: the harmonic-mean
    estimate from the oracled registers lands within the standard
    ~1.04/sqrt(m) error band of the exact distinct-user count."""
    import numpy as np

    from headson_ray.pipelines.queries import (
        HLL_REGISTERS,
        QUERIES,
    )

    t = _to_frame(QUERIES["hll_user_registers"](SF_DIR))
    m = HLL_REGISTERS
    regs = np.zeros(m)
    regs[t["register"].to_numpy()] = t["rho"].to_numpy()
    raw = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(2.0 ** -regs)
    zeros = int(np.sum(regs == 0))
    est = m * np.log(m / zeros) if (raw < 2.5 * m and zeros) else raw
    exact = con.execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.2, (est, exact)


@pytest.mark.usefixtures("ray_session")
def test_user_first_last_fold_merges_cross_block_partials(tmp_path):
    """Every user's events span many parquet row groups (hence many Ray
    blocks), so each user produces MULTIPLE (first,last,n) partials and
    the bucket fold must pick the true global boundary rows — including
    a same-timestamp tie broken by event_id across blocks."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import (
        SQL_USER_FIRST_LAST_VALUE,
        q_user_first_last_value,
    )

    n = 4000
    rng = np.random.RandomState(11)
    t0 = 1_700_000_000_000_000
    users = rng.randint(0, 8, size=n)
    ts = t0 + rng.randint(0, 1_000_000, size=n)
    # same-ts tie for user 3: ids 0 and n-1 sit in the first and last
    # row group; the smaller event_id must win FIRST_VALUE
    users[0] = users[n - 1] = 3
    ts[0] = ts[n - 1] = t0 - 5
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(rng.uniform(0, 300, size=n), pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet", row_group_size=100)
    got = _norm(_to_frame(q_user_first_last_value(str(tmp_path))))
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    exp = _norm(c.execute(SQL_USER_FIRST_LAST_VALUE).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_moving_sum_short_users_and_exact_frame(tmp_path):
    """Users with fewer rows than the frame get the plain running sum;
    at exactly the frame width the oldest row falls out of the sum."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import q_user_value_moving_sum

    t0 = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array(
                [t0, t0 + 1, t0 + 2, t0 + 3, t0, t0 + 1],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["click"] * 6),
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 0.5, 0.25]),
            "props": pa.array(["{}"] * 6),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = _to_frame(q_user_value_moving_sum(str(tmp_path)))
    by_id = dict(zip(got["event_id"], got["mov_cents"]))
    assert by_id == {
        1: 100,        # 1.00
        2: 300,        # 1.00 + 2.00
        3: 700,        # 1.00 + 2.00 + 4.00
        4: 1400,       # 2.00 + 4.00 + 8.00 (1.00 fell out)
        5: 50,
        6: 75,
    }


@pytest.mark.usefixtures("ray_session")
def test_part_value_threshold_strict_boundary(tmp_path):
    """A part whose value lands EXACTLY on the 150%-of-mean cutoff is
    excluded (strict >), and the cutoff derives from the filtered
    nation's parts only. Values 100/200/600/700 cents: mean 400, cutoff
    600 — part 3 sits exactly on it and must not survive."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import q_part_value_threshold

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([7, 8], pa.int64()),
                "n_name": pa.array(["NATION_7", "NATION_8"]),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_nationkey": pa.array([8, 7], pa.int64()),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 2, 3, 4, 9], pa.int64()),
                "l_suppkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "l_extendedprice": pa.array([1.0, 2.0, 6.0, 7.0, 99.0]),
                "l_discount": pa.array([0.0] * 5),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    got = _to_frame(q_part_value_threshold(str(tmp_path)))
    # part 9 belongs to the other nation's supplier: neither in the
    # output nor in the mean; part 3 == cutoff: excluded.
    assert list(got["p_partkey"]) == [4]
    assert list(got["value_cents"]) == [700]


@pytest.mark.usefixtures("ray_session")
def test_returnflag_priority_lateness_is_strict(tmp_path):
    """A line shipped exactly 60 days after its order date is NOT late
    (strict >); one microsecond later is. Priority splits into the high
    branch for URGENT/HIGH and the low branch otherwise."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import (
        Q12_LATE_US,
        q_returnflag_priority_counts,
    )

    base = pa.scalar(
        pd.Timestamp("1997-03-01").value // 1000, pa.timestamp("us")
    )
    b_us = base.value
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_orderdate": pa.array([b_us, b_us], pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT", "5-LOW"]),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_returnflag": pa.array(["A", "A", "A"]),
                "l_shipdate": pa.array(
                    [
                        b_us + Q12_LATE_US,      # exactly 60d: not late
                        b_us + Q12_LATE_US + 1,  # late, high branch
                        b_us + Q12_LATE_US + 1,  # late, low branch
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    got = _to_frame(q_returnflag_priority_counts(str(tmp_path)))
    assert list(got["l_returnflag"]) == ["A"]
    assert list(got["high_line_count"]) == [1]
    assert list(got["low_line_count"]) == [1]


@pytest.mark.usefixtures("ray_session")
def test_mixture_sample_downsamples_only_over_cap_langs(tmp_path):
    """With 4 'en' and 2 'fr' docs, cap = ceil(6/2) = 3: fr passes whole
    while en gates at ppm = 750000 — the per-doc keep decision must
    equal the python-int reference of the same mix hash."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import (
        MIXTURE_PPM_DEN,
        q_mixture_sample,
    )
    from headson_ray.stages.hashing import mix_rounds_int

    ids = [11, 22, 33, 44, 55, 66]
    langs = ["en", "en", "en", "en", "fr", "fr"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs),
                "text": pa.array(["x"] * 6),
                "source": pa.array(["s"] * 6),
                "n_chars": pa.array([1] * 6, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = _to_frame(q_mixture_sample(str(tmp_path)))
    kept = set(got["doc_id"])
    en_ppm = 3 * MIXTURE_PPM_DEN // 4
    expected = {
        i for i, l in zip(ids, langs)
        if l == "fr" or mix_rounds_int(i) % MIXTURE_PPM_DEN < en_ppm
    }
    assert kept == expected
    assert {55, 66} <= kept  # under-cap lang never loses a doc


@pytest.mark.usefixtures("ray_session")
def test_mixture_upsample_whole_and_fractional_epochs(tmp_path):
    """4 'en' (dominant, passes through once) + 3 'fr' (base epoch 1,
    fractional gate ppm = 333333): per-doc totals must equal the
    python-int mix reference, and copy indices must be dense [0, reps)."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import (
        MIXTURE_PPM_DEN,
        q_mixture_upsample,
    )
    from headson_ray.stages.hashing import mix_rounds_int

    ids = [1, 2, 3, 4, 10, 20, 30]
    langs = ["en"] * 4 + ["fr"] * 3
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs),
                "text": pa.array(["x"] * 7),
                "source": pa.array(["s"] * 7),
                "n_chars": pa.array([1] * 7, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = _to_frame(q_mixture_upsample(str(tmp_path)))
    per_doc = got.groupby("doc_id")["copy"].agg(["count", "min", "max"])
    gppm = (4 - 3) * MIXTURE_PPM_DEN // 3
    for i, l in zip(ids, langs):
        if l == "en":
            reps = 1
        else:
            reps = 1 + (mix_rounds_int(i) % MIXTURE_PPM_DEN < gppm)
        assert per_doc.loc[i, "count"] == reps, (i, reps)
        assert per_doc.loc[i, "min"] == 0
        assert per_doc.loc[i, "max"] == reps - 1


@pytest.mark.usefixtures("ray_session")
def test_lm_quality_scores_vocab_threshold_boundary(tmp_path):
    """Vocabulary admission is >= 1000 ppm of total bigram mass: with
    2003 total bigram occurrences, 'a a' (x2000) is in-vocab while
    'b c' (x2, = 998.5 ppm) and 'a b' (x1) just miss — so the mixed doc
    scores exactly 1/3 coverage and the empty doc scores 0."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import q_lm_quality_scores

    texts = [
        "a " * 2000,     # 1999 x 'a a'
        "b c",           # 1 x 'b c'
        "a a b c",       # 'a a' (in), 'a b' (out), 'b c' (out)
        "",              # no bigrams
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["s"] * 4),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = _to_frame(q_lm_quality_scores(str(tmp_path)))
    rows = {
        r.doc_id: (r.n_bigrams, r.lm_vocab_ppm)
        for r in got.itertuples()
    }
    assert rows == {
        1: (1999, 1_000_000),
        2: (1, 0),
        3: (3, 333_333),
        4: (0, 0),
    }


@pytest.mark.usefixtures("ray_session")
def test_new_ops_empty_inputs(tmp_path):
    """Every end-of-round op returns an empty, correctly-typed result on
    empty inputs instead of raising (None-sum / max() / division-by-zero
    hazards all guarded)."""
    import pyarrow.parquet as pq

    from headson_ray.pipelines.queries import (
        q_lm_quality_scores,
        q_mixture_sample,
        q_mixture_upsample,
        q_part_value_threshold,
        q_returnflag_priority_counts,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([8], pa.int64()),
                "n_name": pa.array(["NATION_8"]),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1], pa.int64()),
                "s_nationkey": pa.array([8], pa.int64()),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "l_partkey": pa.array([], pa.int64()),
                "l_suppkey": pa.array([], pa.int64()),
                "l_extendedprice": pa.array([], pa.float64()),
                "l_discount": pa.array([], pa.float64()),
                "l_returnflag": pa.array([], pa.string()),
                "l_shipdate": pa.array([], pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    sf = str(tmp_path)
    for fn, cols in [
        (q_part_value_threshold, ["p_partkey", "value_cents"]),
        (
            q_returnflag_priority_counts,
            ["l_returnflag", "high_line_count", "low_line_count"],
        ),
        (q_mixture_sample, ["doc_id", "lang"]),
        (q_mixture_upsample, ["doc_id", "lang", "copy"]),
        (q_lm_quality_scores, ["doc_id", "n_bigrams", "lm_vocab_ppm"]),
    ]:
        got = _to_frame(fn(sf))
        assert len(got) == 0, fn.__name__
        assert list(got.columns) == cols, fn.__name__

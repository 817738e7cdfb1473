"""Tests for the PII scrub kernel and the benchmark-decontamination query:
kernel-level parity with DuckDB's RE2 on crafted PII, brute-force equality
for the shingle-overlap flags, and the exclusion/zero-token edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from headson_ray.stages.textstats import PII_PATTERNS, scrub_text

CRAFTED = [
    "mail bob@example.co.uk or alice+spam@x.io now",
    "ip 10.0.0.1 and 255.255.255.255 but not 1.2.3",
    "call +1 555-123-4567 or 0800 111 2222 today",
    "",
    None,
    "no pii at all in this row",
    "mixed a@b.cc 192.168.0.7 +44 7700-900123 end",
]


def _mini_table():
    return pa.table(
        {
            "doc_id": pa.array(
                np.arange(len(CRAFTED), dtype=np.int64)
            ),
            "text": pa.array(CRAFTED, pa.string()),
        }
    )


def test_scrub_crafted_pii():
    out = scrub_text(_mini_table()).to_pydict()
    assert out["clean_text"][0] == "mail <EMAIL> or <EMAIL> now"
    assert out["n_redactions"][0] == 2
    assert out["clean_text"][1] == "ip <IP> and <IP> but not 1.2.3"
    assert out["clean_text"][2] == "call <PHONE> or <PHONE> today"
    assert out["clean_text"][3] == ""
    assert out["n_redactions"][3] == 0
    assert out["clean_len"][3] == 0
    assert out["clean_text"][4] is None
    assert out["n_redactions"][4] == 0
    assert out["clean_len"][4] == 0
    assert out["clean_text"][5] == CRAFTED[5]
    assert out["clean_text"][6] == "mixed <EMAIL> <IP> <PHONE> end"
    assert out["n_redactions"][6] == 3


def test_scrub_matches_duckdb_on_crafted_pii():
    """The kernel and nested DuckDB regexp_replace calls (same RE2
    patterns, same order) agree byte-for-byte on PII-bearing text."""
    import duckdb

    con = duckdb.connect()
    con.register("docs_arrow", _mini_table())
    prev, src, acc = "docs_arrow", "text", "0"
    ctes = []
    for i, (_n, pat, rep) in enumerate(PII_PATTERNS):
        ctes.append(
            f"s{i} AS (SELECT doc_id, "
            f"regexp_replace({src}, '{pat}', '{rep}', 'g') AS t, "
            f"{acc} + COALESCE(len(regexp_extract_all({src}, '{pat}')), 0)"
            f" AS c FROM {prev})"
        )
        prev, src, acc = f"s{i}", "t", "c"
    sql = (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT doc_id, t, CAST(c AS BIGINT) AS c FROM {prev}"
        " ORDER BY doc_id"
    )
    exp = con.execute(sql).fetchall()
    got = scrub_text(_mini_table()).to_pydict()
    for i, (_d, t, c) in enumerate(exp):
        assert got["clean_text"][i] == t
        assert got["n_redactions"][i] == c


def _docs_table(n=400, seed=11):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 12))
        texts.append(" ".join(rng.choice(words, size=k)))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def _brute_decontam(tbl, mod):
    """Reference implementation: python-set string 3-gram shingles."""

    def shingles(t):
        toks = (t or "").split()
        if not toks:
            return set()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    ids = tbl.column("doc_id").to_pylist()
    txt = tbl.column("text").to_pylist()
    bench = set()
    for d, t in zip(ids, txt):
        if d % mod == 0:
            bench |= shingles(t)
    out = {}
    for d, t in zip(ids, txt):
        if d % mod == 0:
            continue
        sh = shingles(t)
        hits = len(sh & bench)
        out[d] = (len(sh), hits, 1 if hits else 0)
    return out


def test_decontam_matches_bruteforce(ray_session, tmp_path):
    import ray

    from headson_ray.pipelines.queries import (
        DECONTAM_BENCH_MOD,
        q_decontam_flags,
    )

    tbl = _docs_table()
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = q_decontam_flags(str(tmp_path)).to_pandas()
    exp = _brute_decontam(tbl, DECONTAM_BENCH_MOD)
    assert len(got) == len(exp)
    for row in got.itertuples(index=False):
        n, hits, flag = exp[row.doc_id]
        assert row.n_shingles == n, row
        assert row.contaminated_shingles == hits, row
        assert row.is_contaminated == flag, row
    # benchmark docs are excluded from the output
    assert not (got["doc_id"].to_numpy() % DECONTAM_BENCH_MOD == 0).any()
    assert ray.is_initialized()


def test_decontam_oracle_parity(ray_session, tmp_path):
    import duckdb

    from headson_ray.pipelines.queries import (
        SQL_DECONTAM_FLAGS,
        q_decontam_flags,
    )

    tbl = _docs_table(n=300, seed=5)
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = (
        q_decontam_flags(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    exp = (
        con.execute(SQL_DECONTAM_FLAGS)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for col in (
        "doc_id",
        "n_shingles",
        "contaminated_shingles",
        "is_contaminated",
    ):
        assert (
            got[col].to_numpy() == exp[col].to_numpy()
        ).all(), col


def test_scrub_query_sql_parity_on_corpus(ray_session):
    """Full text_scrub catalog query vs its oracle at sf0.001 — the term
    pattern hits the corpus, the PII patterns exercise zero-hit."""
    import duckdb

    from headson_ray.pipelines.queries import SQL_TEXT_SCRUB, q_text_scrub

    sf = "/root/testdata/sf0.001"
    got = (
        q_text_scrub(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    exp = (
        con.execute(SQL_TEXT_SCRUB)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["clean_text"] == exp["clean_text"]).all()
    assert (
        got["n_redactions"].to_numpy() == exp["n_redactions"].to_numpy()
    ).all()
    assert int(got["n_redactions"].sum()) > 0  # term pattern really hits

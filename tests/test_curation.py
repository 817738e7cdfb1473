"""Composed corpus-curation pipeline (quality -> decontam -> lede
dedup) vs its DuckDB oracle, plus drop-reason semantics."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from headson_ray.pipelines.queries import (
    DECONTAM_BENCH_MOD,
    SQL_CURATION_PIPELINE,
    q_curation_pipeline,
)

SF = "/root/testdata/sf0.001"


def _oracle(sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(SQL_CURATION_PIPELINE).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_curation_pipeline_matches_duckdb():
    got = _norm(q_curation_pipeline(SF).to_pandas())
    exp = _norm(_oracle(SF))
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_curation_duplicate_leg(tmp_path):
    """Crafted corpus where every drop reason fires, including the
    syndication-dedup leg (absent from the synthetic sf tables, whose
    lede collisions all drop earlier as quality/contaminated)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sw = "the a of and in to is it on for "  # plenty of stopwords
    lede = "Breaking news from the wire"
    bench_text = "benchmark heldout evaluation prompt " * 10
    filler1 = " ".join(f"alpha{k}" for k in range(15))
    filler2 = " ".join(f"beta{k}" for k in range(15))
    docs = {
        # doc 31 % 31 == 0 -> benchmark set (excluded from output)
        31: bench_text,
        # 1 and 2 share the 5-token lede, both pass quality -> 2 is dup
        1: f"{lede} {sw}{filler1} {sw}",
        2: f"{lede} {sw}{filler2} {sw}",
        # 3: too short -> quality
        3: "tiny doc",
        # 4: contains a benchmark 3-gram -> contaminated
        4: f"{sw}{filler1} benchmark heldout evaluation {sw}{filler2}",
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    got = _norm(q_curation_pipeline(str(tmp_path)).to_pandas())
    exp = _norm(_oracle(str(tmp_path)))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    by_id = got.set_index("doc_id")
    assert by_id.loc[1, "kept"] == 1 and by_id.loc[1, "drop_reason"] == ""
    assert by_id.loc[2, "drop_reason"] == "duplicate"
    assert by_id.loc[3, "drop_reason"] == "quality"
    assert by_id.loc[4, "drop_reason"] == "contaminated"
    assert 31 not in by_id.index


@pytest.mark.usefixtures("ray_session")
def test_curation_reasons_are_consistent():
    df = q_curation_pipeline(SF).to_pandas()
    # benchmark docs never appear
    assert (df["doc_id"] % DECONTAM_BENCH_MOD != 0).all()
    # kept rows carry no reason; dropped rows carry exactly one
    kept = df[df["kept"] == 1]
    dropped = df[df["kept"] == 0]
    assert (kept["drop_reason"] == "").all()
    assert set(dropped["drop_reason"]) <= {
        "quality", "contaminated", "duplicate"
    }
    assert (dropped["drop_reason"] != "").all()
    # at most one keeper per lede group is implied by kept+reason split;
    # the pipeline keeps at least one doc
    assert len(kept) > 0

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

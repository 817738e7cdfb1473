"""Driver-sim: run every queries() entry next to its oracle_sql() in DuckDB
at a given sf dir, compare row-count / schema / value-hash the way the
driver does (sort columns by name, sort rows, hash values).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd
import ray

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "iter_batches"):  # ray Dataset
        import pyarrow as pa

        batches = list(res.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        if not batches:
            return pd.DataFrame()
        return pa.concat_tables(batches, promote_options="permissive").to_pandas()
    if hasattr(res, "to_pandas"):  # pyarrow Table
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalized value hash: stringify with float rounding
    h = hashlib.sha256()
    for col in df.columns:
        vals = df[col]
        if vals.dtype.kind == "f":
            vals = vals.round(6)
        h.update(repr(list(vals)).encode())
    return len(df), list(df.columns), h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(mine)} rows  [{dt:.1f}s]")
            continue
        theirs = con.execute(oracles[name]).fetchdf()
        n1, c1, h1 = canon(mine)
        n2, c2, h2 = canon(theirs)
        status = "OK" if (n1, c1, h1) == (n2, c2, h2) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"{status} {name}: mine=({n1},{c1},{h1}) oracle=({n2},{c2},{h2})")
            if n1 == n2 and c1 == c2:
                # show a sample diff
                m = mine.reindex(sorted(mine.columns), axis=1).sort_values(
                    by=sorted(mine.columns)
                ).reset_index(drop=True)
                o = theirs.reindex(sorted(theirs.columns), axis=1).sort_values(
                    by=sorted(theirs.columns)
                ).reset_index(drop=True)
                neq = (m != o).any(axis=1)
                print(m[neq].head(3))
                print(o[neq].head(3))
        else:
            print(f"OK {name}: {n1} rows  [{dt:.1f}s]")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

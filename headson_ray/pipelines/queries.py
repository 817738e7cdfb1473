"""Driver-facing query catalog: one Ray-Data pipeline per operator from
SURVEY.md §2 (+ the training-data ops), each with a DuckDB oracle where
SQL can express it.

Conventions:
- every callable takes sf_dir and returns a pyarrow Table / Dataset;
- monetary doubles are emitted as integer cents (deterministic hashing);
- column names match the oracle SQL aliases exactly.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..stages.dedup import (
    MinHasher,
    exact_dedup,
    minhash_near_dups,
    minhash_signatures,
    near_dup_canonical,
    ngram_jaccard_pairs,
    simhash_near_dups,
    simhash_signatures,
)
from ..stages.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
)
from ..stages.summarize import Summarizer
from ..stages.textstats import (
    STOPWORDS,
    add_fingerprint,
    add_lang_id,
    add_quality_score,
    add_token_stats,
)

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


_TARGET_BLOCK_BYTES = 64 << 20  # on-disk parquet bytes per block at scale
_SMALL_BLOCK_BYTES = 256 << 10  # min useful work per task on tiny tables


def _num_blocks_for(path: Path, heavy: bool = False) -> int:
    """Scale-aware block count: big inputs get ~64 MiB-of-parquet blocks
    (thousands of blocks at 100 TB — streaming parallelism is unbounded),
    while tiny inputs stop being sliced into 2x-CPU-count confetti blocks
    whose per-task scheduling overhead dominates wall time (a 1.5 MB
    table in Ray's default 64 blocks spent 8x longer on task dispatch
    than on the actual dedup).

    `heavy` marks compute-dense per-row stages (shingle/signature
    builders, summarizers) where CPU work — not bytes — sets the right
    parallelism: those keep near-full fan-out down to much smaller
    inputs (an 8x-smaller per-block byte floor)."""
    try:
        size = path.stat().st_size
    except OSError:
        return 1
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8) or 8)
    except Exception:
        cpus = 8
    floor_bytes = _SMALL_BLOCK_BYTES // 8 if heavy else _SMALL_BLOCK_BYTES
    wide = size // _TARGET_BLOCK_BYTES
    narrow = min(2 * cpus, size // floor_bytes + 1)
    return max(1, int(max(wide, narrow)))


def _read(
    sf_dir: str,
    table: str,
    columns=None,
    heavy: bool = False,
    filter_expr=None,
) -> "ray.data.Dataset":
    p = Path(sf_dir) / f"{table}.parquet"
    kwargs = {}
    if filter_expr is not None:
        # pushed into the pyarrow fragment scanner: row-group statistics
        # prune whole groups and the scan materializes only passing rows
        kwargs["filter"] = filter_expr
    return ray.data.read_parquet(
        str(p),
        columns=columns,
        override_num_blocks=_num_blocks_for(p, heavy),
        **kwargs,
    )


def _cents(col, factor: float = 100.0):
    # half_towards_infinity == SQL round() (half away from zero); pyarrow's
    # default half_to_even would drift one cent on exact-half values.
    return pc.cast(
        pc.round(
            pc.multiply(col, factor), round_mode="half_towards_infinity"
        ),
        pa.int64(),
    )


def _trim_topk_runs(t: pa.Table, key_columns, k: int) -> pa.Table:
    """Keep the first k rows of every contiguous key run of an
    ALREADY-SORTED table — the per-batch partial trim behind every
    grouped top-k (at most k rows per key per block enter the shuffle).
    Vectorized: run starts come from per-column change masks (strings
    via dictionary codes), position-within-run via cumulative offset
    subtraction."""
    n = t.num_rows
    if n == 0:
        return t
    new_run = np.zeros(n, dtype=bool)
    new_run[0] = True
    for c in key_columns:
        col = t.column(c).combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(
            col.type
        ):
            vals = col.dictionary_encode().indices.to_numpy(
                zero_copy_only=False
            )
        else:
            vals = col.to_numpy(zero_copy_only=False)
        new_run[1:] |= vals[1:] != vals[:-1]
    run_id = np.cumsum(new_run) - 1
    starts = np.flatnonzero(new_run)
    pos = np.arange(n) - starts[run_id]
    return t.filter(pa.array(pos < k))


def _two_phase_sum(ds, keys, partial_fn, sum_cols):
    """Partial pyarrow group_by inside map_batches, then a small Ray
    groupby merge — the shuffle only moves pre-aggregated rows."""
    partials = ds.map_batches(
        partial_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    return partials.groupby(keys).aggregate(*aggs)


# --------------------------------------------------------------------------
# Windowed aggregations over `events`
# --------------------------------------------------------------------------
def q_tumbling_events(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        wid = pc.divide(pc.cast(b.column("ts"), pa.int64()), DAY_US)
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "window_id": wid,
                "cents": _cents(b.column("value")),
            }
        )
        g = t.group_by(["event_type", "window_id"]).aggregate(
            [([], "count_all"), ("cents", "sum")]
        )
        return g.rename_columns(["event_type", "window_id", "n", "val_cents"])

    return _two_phase_sum(
        ds, ["event_type", "window_id"], partial, ["n", "val_cents"]
    )


SQL_TUMBLING_EVENTS = f"""
SELECT event_type,
       epoch_us(ts) // {DAY_US} AS window_id,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
FROM events
GROUP BY 1, 2
"""


def q_events_cube(sf_dir: str):
    """GROUPING SETS / CUBE over (event_type, day window) from ONE
    finest-grain partial pass: the (type x window) two-phase aggregate
    materializes once, and the (type), (window), and grand-total levels
    re-fold THOSE partial rows — one corpus scan, one partial-row
    shuffle, three grain-sized re-folds (never a rescan). Sentinels
    ('' / -1) stand in for rolled-up keys; level = grouping id
    (0 = finest, 1 = by type, 2 = by window, 3 = grand total)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        wid = pc.divide(pc.cast(b.column("ts"), pa.int64()), DAY_US)
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "window_id": wid,
                "cents": _cents(b.column("value")),
            }
        )
        g = t.group_by(["event_type", "window_id"]).aggregate(
            [([], "count_all"), ("cents", "sum")]
        )
        return g.rename_columns(["event_type", "window_id", "n", "val_cents"])

    fine = _two_phase_sum(
        ds, ["event_type", "window_id"], partial, ["n", "val_cents"]
    ).materialize()

    def shape(level: int, with_type: bool, with_window: bool):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table(
                {
                    "event_type": (
                        b.column("event_type")
                        if with_type
                        else pa.array([""] * n, pa.string())
                    ),
                    "window_id": (
                        b.column("window_id")
                        if with_window
                        else pa.array([-1] * n, pa.int64())
                    ),
                    "n": pc.cast(b.column("n"), pa.int64()),
                    "val_cents": pc.cast(b.column("val_cents"), pa.int64()),
                    "level": pa.array([level] * n, pa.int64()),
                }
            )

        return fn

    lvl0 = fine.map_batches(shape(0, True, True), batch_format="pyarrow")
    lvl1 = (
        fine.groupby("event_type")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("val_cents", alias_name="val_cents"))
        .map_batches(shape(1, True, False), batch_format="pyarrow")
    )
    lvl2 = (
        fine.groupby("window_id")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("val_cents", alias_name="val_cents"))
        .map_batches(shape(2, False, True), batch_format="pyarrow")
    )

    def const_key(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array([0] * b.num_rows, pa.int64()),
                "n": b.column("n"),
                "val_cents": b.column("val_cents"),
            }
        )

    lvl3 = (
        fine.map_batches(const_key, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("val_cents", alias_name="val_cents"))
        .map_batches(shape(3, False, False), batch_format="pyarrow")
    )
    return lvl0.union(lvl1).union(lvl2).union(lvl3)


SQL_EVENTS_CUBE = f"""
SELECT COALESCE(event_type, '') AS event_type,
       COALESCE(window_id, -1) AS window_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS val_cents,
       CAST(grouping(event_type) * 2 + grouping(window_id) AS BIGINT)
         AS level
FROM (
  SELECT event_type,
         epoch_us(ts) // {DAY_US} AS window_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
GROUP BY CUBE (event_type, window_id)
"""


def q_sliding_events(sf_dir: str):
    # size = 2 days, slide = 1 day -> each event in exactly 2 windows
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        last = pc.divide(pc.cast(b.column("ts"), pa.int64()), DAY_US)
        pieces = []
        for j in (0, 1):
            wid = pc.subtract(last, pa.scalar(j, pa.int64()))
            pieces.append(
                pa.table(
                    {
                        "event_type": b.column("event_type"),
                        "window_id": wid,
                        "cents": _cents(b.column("value")),
                    }
                )
            )
        t = pa.concat_tables(pieces)
        t = t.filter(pc.greater_equal(t.column("window_id"), 0))
        g = t.group_by(["event_type", "window_id"]).aggregate(
            [([], "count_all"), ("cents", "sum")]
        )
        return g.rename_columns(["event_type", "window_id", "n", "val_cents"])

    return _two_phase_sum(
        ds, ["event_type", "window_id"], partial, ["n", "val_cents"]
    )


SQL_SLIDING_EVENTS = f"""
SELECT event_type,
       (epoch_us(ts) // {DAY_US}) - j AS window_id,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
FROM events, (SELECT unnest([0, 1]) AS j)
WHERE (epoch_us(ts) // {DAY_US}) - j >= 0
GROUP BY 1, 2
"""

SESSION_GAP_US = 2 * HOUR_US


def q_session_events(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])

    def sessions(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group.column("ts"))
        tus = pc.take(
            pc.cast(group.column("ts"), pa.int64()), idx
        ).to_numpy(zero_copy_only=False)
        cents = pc.take(_cents(group.column("value")), idx).to_numpy(
            zero_copy_only=False
        )
        uid = group.column("user_id")[0].as_py()
        m = len(tus)
        # session boundaries + per-session aggregates, fully vectorized:
        # starts mark gap > SESSION_GAP_US, reduceat folds each run
        new_sess = np.ones(m, dtype=bool)
        if m > 1:
            new_sess[1:] = np.diff(tus) > SESSION_GAP_US
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], m) - 1
        return pa.table(
            {
                "user_id": pa.array(np.full(len(starts), uid, np.int64)),
                "session_start": pa.array(tus[starts], pa.int64()),
                "session_end": pa.array(tus[ends], pa.int64()),
                "n": pa.array(ends - starts + 1, pa.int64()),
                "val_cents": pa.array(
                    np.add.reduceat(cents, starts), pa.int64()
                ),
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


SQL_SESSION_EVENTS = f"""
WITH t AS (
  SELECT user_id, epoch_us(ts) AS tu,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY tu
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM t
)
SELECT user_id, min(tu) AS session_start, max(tu) AS session_end,
       count(*) AS n, CAST(sum(cents) AS BIGINT) AS val_cents
FROM s GROUP BY user_id, sess
"""

LATENESS_US = HOUR_US


def q_finalized_tumbling_events(sf_dir: str):
    """Tumbling windows finalized under watermark = max(ts) - lateness —
    the batch oracle of the streaming engine's finalization rule."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    max_ts = ds.map_batches(
        lambda b: pa.table(
            {"m": [pc.max(pc.cast(b.column("ts"), pa.int64())).as_py()]}
        ),
        batch_format="pyarrow",
    ).max("m")
    max_wid = (max_ts - LATENESS_US) // DAY_US - 1
    agg = q_tumbling_events(sf_dir)
    return agg.filter(expr=f"window_id <= {max_wid}")


SQL_FINALIZED_TUMBLING_EVENTS = f"""
SELECT event_type,
       epoch_us(ts) // {DAY_US} AS window_id,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
FROM events
GROUP BY 1, 2
HAVING window_id <= (SELECT (max(epoch_us(ts)) - {LATENESS_US}) // {DAY_US} - 1
                     FROM events)
"""


# --------------------------------------------------------------------------
# Dedup / text ops over `documents`
# --------------------------------------------------------------------------
def q_dedup_exact(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(ds, key_column="text", id_column="doc_id")
    return out.select_columns(["keep_id"])


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS keep_id FROM documents GROUP BY text
"""


def q_token_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        b = add_token_stats(b)
        t = pa.table(
            {
                "lang": b.column("lang"),
                "token_count": b.column("token_count"),
                "stopword_count": b.column("stopword_count"),
            }
        )
        g = t.group_by(["lang"]).aggregate(
            [([], "count_all"), ("token_count", "sum"), ("stopword_count", "sum")]
        )
        return g.rename_columns(["lang", "docs", "tokens", "stopwords"])

    return _two_phase_sum(ds, ["lang"], partial, ["docs", "tokens", "stopwords"])


_SW = ", ".join(f"'{w}'" for w in STOPWORDS)
SQL_TOKEN_STATS = f"""
WITH t AS (
  SELECT lang,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT lang, count(*) AS docs,
       CAST(sum(len(toks)) AS BIGINT) AS tokens,
       CAST(sum(len(list_filter(toks, x -> x IN ({_SW})))) AS BIGINT) AS stopwords
FROM t GROUP BY lang
"""


def q_doc_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda b: add_token_stats(b).select(
            ["doc_id", "token_count", "stopword_count"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return out


SQL_DOC_TOKEN_COUNTS = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id, len(toks) AS token_count,
       len(list_filter(toks, x -> x IN ({_SW}))) AS stopword_count
FROM t
"""


def q_quality_scores(sf_dir: str):
    """Quality scoring; the float score is emitted as integer ppm
    (round-half-away of score*1e6) so the DuckDB oracle value-hashes
    exactly (both sides compute the same IEEE double first)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def shape(b: pa.Table) -> pa.Table:
        b = add_quality_score(b)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "quality_ppm": _cents(b.column("quality_score"), 1_000_000.0),
            }
        )

    return ds.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)
SQL_QUALITY_SCORES = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), n AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, x -> x IN ({_SW_LIST}))) AS DOUBLE) AS sw
  FROM t
)
SELECT doc_id,
       CAST(round((LEAST(n / 100.0, 1.0) * 0.5 +
                   LEAST((sw / GREATEST(n, 1.0)) / 0.05, 1.0) * 0.5)
                  * 1000000) AS BIGINT) AS quality_ppm
FROM n
"""


def q_lang_id(sf_dir: str):
    """Language-ID heuristic via deterministic marker counting; oracle
    reproduces the count (non-overlapping, left-to-right — identical to
    str.count / replace()) and the first-wins argmax in SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_lang_id(b).select(["doc_id", "lang_pred"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _lang_id_sql() -> str:
    from ..stages.textstats import _LANG_MARKERS

    def count_expr(m: str) -> str:
        esc = m.replace("'", "''")
        return (
            f"((length(s) - length(replace(s, '{esc}', ''))) // {len(m)})"
        )

    score_cols = ",\n         ".join(
        f"{' + '.join(count_expr(m) for m in markers)} AS s_{lang}"
        for lang, markers in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    greatest = f"GREATEST({', '.join('s_' + lg for lg in langs)})"
    # first-wins tie-break: python iterates dict order with strict >
    whens = "\n       ".join(
        f"WHEN s_{lg} = {greatest} THEN '{lg}'" for lg in langs
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR text = '' THEN ''
              ELSE ' ' || text || ' ' END AS s
  FROM documents
), sc AS (
  SELECT doc_id,
         {score_cols}
  FROM t
)
SELECT doc_id,
       CASE WHEN {greatest} <= 0 THEN 'und'
       {whens}
       END AS lang_pred
FROM sc
"""


SQL_LANG_ID = _lang_id_sql()


def q_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints: XOR of Horner-mod-2^64 window
    hashes (vectorized; oracle reproduces with HUGEINT arithmetic)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_fingerprint(b).select(["doc_id", "doc_fp"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


_M64 = "18446744073709551616::HUGEINT"


def _mixr_sql(v: str) -> str:
    """One bijective mix round in HUGEINT SQL — the exact counterpart of
    stages/hashing.py mix_rounds (shared by the simhash and split
    oracles so the two sites cannot drift)."""
    return (
        f"(((({v}) // 4294967296::HUGEINT) * 4294967296::HUGEINT + "
        f"(({v}) + 2654435769::HUGEINT * (({v}) // 4294967296::HUGEINT))"
        f" % 4294967296::HUGEINT) * 2654435761::HUGEINT) % {_M64}"
    )
SQL_FINGERPRINTS = f"""
WITH c AS (
  SELECT doc_id, string_split(text, '') AS cs FROM documents
), h AS (
  SELECT doc_id,
    CASE WHEN len(cs) < 8 THEN [] ELSE
      [CAST(
         CASE WHEN hu >= 9223372036854775808::HUGEINT
              THEN hu - {_M64} ELSE hu END AS BIGINT)
       FOR hu IN [
         list_reduce(
           list_prepend(CAST(0 AS HUGEINT),
             [CAST(ord(cs[i + k]) AS HUGEINT) for k in range(0, 8)]),
           (a, x) -> (a * 1000003 + x) % {_M64})
         for i in range(1, len(cs) - 6)]]
    END AS hs
  FROM c
)
SELECT doc_id,
       CASE WHEN len(hs) = 0 THEN 0
            ELSE list_reduce(hs, (a, b) -> xor(a, b)) END AS doc_fp
FROM h
"""


def _simhash_sig_sql() -> str:
    """Shared CTE computing per-doc simhash in SQL: the same codepoint
    Horner + two bijective mix rounds as stages/hashing.py, bit expansion
    via a 64-row powers table, per-(doc, bit) +-1 sums."""
    pw_rows = ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))
    mixr = _mixr_sql
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
), h0 AS (
  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT),
      [CAST(ord(ch) AS HUGEINT) for ch in string_split(tok, '')]),
      (a, x) -> (a * 1000003 + x) % {_M64}) AS v
  FROM toks
), m1 AS (SELECT doc_id, {mixr('v')} AS v FROM h0),
m2 AS (SELECT doc_id, {mixr('v')} AS v FROM m1),
bits AS (
  SELECT doc_id, p.b,
         CASE WHEN (v // p.pw) % 2 = 1 THEN 1 ELSE -1 END AS contrib
  FROM m2, (VALUES {pw_rows}) AS p(b, pw)
), acc AS (
  SELECT doc_id, b, sum(contrib) AS s FROM bits GROUP BY doc_id, b
), sig0 AS (
  SELECT acc.doc_id,
         sum(CASE WHEN s > 0 THEN p.pw ELSE 0::HUGEINT END) AS u
  FROM acc JOIN (VALUES {pw_rows}) AS p(b, pw) USING (b)
  GROUP BY acc.doc_id
), sig AS (
  SELECT d.doc_id,
         COALESCE(CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                            THEN u - {_M64} ELSE u END AS BIGINT), 0)
           AS simhash
  FROM documents d LEFT JOIN sig0 ON d.doc_id = sig0.doc_id
)
"""


SQL_SIMHASH = _simhash_sig_sql() + "SELECT doc_id, simhash FROM sig"

SQL_SIMHASH_NEAR_DUPS = _simhash_sig_sql() + """
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_minhash_near_dups(sf_dir: str):
    """MinHash+LSH near-dup pairs, DuckDB-oracled bit-for-bit: the band
    codes are fixed 4-perm slices of the HUGEINT-oracled signatures
    (SQL_MINHASH_SIGNATURES), candidates are band-code equality joins,
    and the verify step is exact integer-ppm Jaccard over word-3-gram
    shingle sets — all SQL-expressible (round-4 verdict task 5)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    return minhash_near_dups(ds, threshold=0.5, emit_ppm=True)


MINHASH_NUM_PERM = 64


def q_minhash_signatures(sf_dir: str):
    """Per-document MinHash signatures, exploded to (doc_id, perm, sig)
    rows so the DuckDB oracle can reproduce every one of the 64
    permutation minima bit-for-bit (shingle Horner hash + splitmix-style
    per-permutation mix, all mod-2**64 HUGEINT arithmetic in SQL).

    This oracles the signature stage that feeds minhash_near_dups — the
    LSH banding/verify downstream stays approx-by-design, but the sketch
    state itself is now hash-checked like simhash/HLL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    hasher = MinHasher(MINHASH_NUM_PERM)

    def explode(b: pa.Table) -> pa.Table:
        t = minhash_signatures(b, hasher=hasher)
        sig = t.column("sig")
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        n = len(t)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(ids, MINHASH_NUM_PERM), pa.int64()
                ),
                "perm": pa.array(
                    np.tile(
                        np.arange(MINHASH_NUM_PERM, dtype=np.int64), n
                    ),
                    pa.int64(),
                ),
                "sig": sig.flatten(),
            }
        )

    return ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


def _mulmod64_sql(x: str, c: int) -> str:
    """(x * c) mod 2**64 in HUGEINT without overflowing the signed
    128-bit range: split c into 32-bit halves (x < 2**64, lo < 2**32 so
    x*lo < 2**96; the hi half only survives mod 2**32 before the <<32)."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"((({x}) * {lo}::HUGEINT) % {_M64} + "
        f"(((({x}) % 4294967296::HUGEINT) * {hi}::HUGEINT)"
        f" % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {_M64}"
    )


def _minhash_sig_sql() -> str:
    """SQL counterpart of MinHasher.signature over word-3-shingles:
    token Horner hashes (same staged mix CTEs as the simhash oracle),
    per-window shingle Horner + mix (hash_u64_rows), then for each of
    the 64 embedded permutation constants a_j the splitmix-style
    (s ^ a_j)*C1, xor-shift 27, *C2, xor-shift 31 pipeline, min per
    (doc, perm); shingle-less docs get the 2**61-1 sentinel."""
    mixr = _mixr_sql
    a = MinHasher(MINHASH_NUM_PERM).a
    perm_rows = ", ".join(
        f"({j}, {int(a[j])}::HUGEINT)" for j in range(MINHASH_NUM_PERM)
    )
    sentinel = (1 << 61) - 1
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS toks
  FROM documents
), posr AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM d
), h0 AS (
  SELECT doc_id, pos, list_reduce(list_prepend(CAST(0 AS HUGEINT),
      [CAST(ord(ch) AS HUGEINT) for ch in string_split(toks[pos], '')]),
      (a, x) -> (a * 1000003 + x) % {_M64}) AS v
  FROM posr
), tm1 AS (SELECT doc_id, pos, {mixr('v')} AS v FROM h0),
tm2 AS (SELECT doc_id, pos, {mixr('v')} AS v FROM tm1),
thl AS (SELECT doc_id, list(v ORDER BY pos) AS th FROM tm2 GROUP BY doc_id),
sh0 AS (
  SELECT d.doc_id,
    CASE WHEN th IS NULL OR len(th) = 0 THEN []
         WHEN len(th) < 3 THEN
           [list_reduce(list_prepend(CAST(0 AS HUGEINT), th),
                        (a, x) -> (a * 1000003 + x) % {_M64})]
         ELSE [list_reduce(list_prepend(CAST(0 AS HUGEINT), th[i:i+2]),
                           (a, x) -> (a * 1000003 + x) % {_M64})
               for i in range(1, len(th) - 1)]
    END AS sh
  FROM d LEFT JOIN thl ON d.doc_id = thl.doc_id
), shr AS (SELECT doc_id, unnest(sh) AS v FROM sh0),
sm1 AS (SELECT doc_id, {mixr('v')} AS v FROM shr),
sm2 AS (SELECT doc_id, {mixr('v')} AS s FROM sm1),
px AS (
  SELECT doc_id, p.j, xor(s, p.aj) AS x0
  FROM sm2, (VALUES {perm_rows}) AS p(j, aj)
), p1 AS (SELECT doc_id, j, {_mulmod64_sql('x0', 0xBF58476D1CE4E5B9)} AS x1
          FROM px),
p2 AS (SELECT doc_id, j, xor(x1, x1 // 134217728::HUGEINT) AS x2 FROM p1),
p3 AS (SELECT doc_id, j, {_mulmod64_sql('x2', 0x94D049BB133111EB)} AS x3
       FROM p2),
p4 AS (SELECT doc_id, j, xor(x3, x3 // 2147483648::HUGEINT) AS x4 FROM p3),
minsig AS (SELECT doc_id, j, min(x4) AS sig_u FROM p4 GROUP BY doc_id, j),
allp AS (
  SELECT doc_id, p.j AS perm
  FROM documents, (VALUES {perm_rows}) AS p(j, aj)
)
SELECT allp.doc_id, allp.perm,
  CAST(CASE WHEN COALESCE(m.sig_u, {sentinel}::HUGEINT)
                 >= 9223372036854775808::HUGEINT
            THEN COALESCE(m.sig_u, {sentinel}::HUGEINT) - {_M64}
            ELSE COALESCE(m.sig_u, {sentinel}::HUGEINT) END AS BIGINT)
    AS sig
FROM allp LEFT JOIN minsig m
  ON allp.doc_id = m.doc_id AND allp.perm = m.j
"""


SQL_MINHASH_SIGNATURES = _minhash_sig_sql()


def _minhash_near_dups_sql() -> str:
    """Mirror of minhash_near_dups(threshold=0.5, emit_ppm=True): the
    oracled signature rows regroup into 16 bands of 4 ordered minima
    (exactly the slices lsh_band_rows hashes), candidate pairs are
    band-code equality joins (identical to band-hash equality absent
    64-bit collisions — the standing fp contract), and verification is
    exact integer-ppm Jaccard over distinct word-3-gram shingles (the
    Ray side compares hashed shingles; distinct counts agree absent
    collisions, same contract as SQL_NGRAM_JACCARD_PAIRS)."""
    return f"""
WITH sigrows AS (
{_minhash_sig_sql()}
), bands AS (
  SELECT doc_id, perm // 4 AS band, list(sig ORDER BY perm) AS code
  FROM sigrows GROUP BY doc_id, perm // 4
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.code = y.code AND x.doc_id < y.doc_id
), d2 AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS toks
  FROM documents
), s2 AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                  for i in range(1, len(toks) - 1)])
         END AS sh
  FROM d2
), j AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(sa.sh) + len(sb.sh)
           - len(list_intersect(sa.sh, sb.sh)) AS un
  FROM cand c
  JOIN s2 sa ON sa.doc_id = c.a
  JOIN s2 sb ON sb.doc_id = c.b
)
SELECT a, b,
       CAST(CASE WHEN un = 0 THEN 1000000
                 ELSE inter * 1000000 // un END AS BIGINT) AS jaccard_ppm
FROM j
WHERE un = 0 OR inter * 1000000 >= 500000 * un
"""


SQL_MINHASH_NEAR_DUPS = _minhash_near_dups_sql()


def q_cep_near_dup_stream(sf_dir: str):
    """Streaming MinHash near-dup suppression THROUGH the stateful
    engine machinery (pipelines/streamdedup.py): documents arrive in 8
    doc-id-ordered micro-batches, band codes register into tiered
    partitioned BandRegistry actors, and each doc is suppressed when any
    of its 16 LSH band codes was registered by an earlier doc — first
    occurrence per near-dup cluster survives, exactly-once ledger
    commits per micro-batch, kill/resume byte-equality pinned in
    tests/test_streamdedup.py. Hash-oracled: register-all semantics
    depend only on smaller doc ids, so SQL replays the stream as an
    exists-earlier band self-join over the bit-exact signature CTE."""
    import shutil
    import tempfile

    from .streamdedup import NearDupStream, doc_range_groups

    paths = [str(Path(sf_dir) / "documents.parquet")]
    work = tempfile.mkdtemp(prefix="headson-neardup-stream-")
    try:
        eng = NearDupStream(
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            num_state_actors=4,
        )
        eng.run(doc_range_groups(paths, 8))
        return eng.read_ledger()
    finally:
        shutil.rmtree(work, ignore_errors=True)


SQL_CEP_NEAR_DUP_STREAM = f"""
WITH sigrows AS (
{_minhash_sig_sql()}
), bands AS (
  SELECT doc_id, perm // 4 AS band, list(sig ORDER BY perm) AS code
  FROM sigrows GROUP BY doc_id, perm // 4
), firsts AS (
  SELECT y.doc_id, min(x.doc_id) AS first_src
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.code = y.code AND x.doc_id < y.doc_id
  GROUP BY y.doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN f.first_src IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS is_dup,
       CAST(COALESCE(f.first_src, -1) AS BIGINT) AS first_src
FROM documents d LEFT JOIN firsts f ON d.doc_id = f.doc_id
"""


def q_ngram_jaccard(sf_dir: str):
    """Exact word-3-gram Jaccard near-dup pairs via distributed inverted
    index with prefix filtering; jaccard emitted as integer ppm
    (inter*1e6 // union) so the DuckDB oracle matches bit-for-bit."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    return ngram_jaccard_pairs(ds, threshold=0.5)


SQL_NGRAM_JACCARD_PAIRS = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                  for i in range(1, len(toks) - 1)])
         END AS sh
  FROM d
)
SELECT a.doc_id AS a, b.doc_id AS b,
       (len(list_intersect(a.sh, b.sh)) * 1000000)
         // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         AS jaccard_ppm
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(a.sh) + len(b.sh) > 0
  AND (len(list_intersect(a.sh, b.sh)) * 1000000)
      >= 500000 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
"""


def q_simhash_near_dups(sf_dir: str):
    """SimHash near-dup pairs via pigeonhole banding (rows-only; exactness
    vs brute-force Hamming asserted in tests)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    return simhash_near_dups(ds, max_hamming=3)


def q_simhash(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    return ds.map_batches(
        simhash_signatures, batch_format="pyarrow", zero_copy_batch=True
    )


def q_near_dup_canonical(sf_dir: str):
    """Cluster dedup: canonical (min) doc id per connected component of
    the exact Jaccard>=0.5 near-dup graph; oracle = recursive-CTE
    transitive closure over the same pair set."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    return near_dup_canonical(ds, threshold=0.5)


SQL_NEAR_DUP_CANONICAL = r"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                  for i in range(1, len(toks) - 1)])
         END AS sh
  FROM d
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(a.sh) + len(b.sh) > 0
    AND (len(list_intersect(a.sh, b.sh)) * 1000000)
        >= 500000 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
), edges AS (
  SELECT a, b FROM p UNION SELECT b, a FROM p
), reach(doc, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.doc, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT doc AS doc_id, min(r) AS canonical_id
FROM reach GROUP BY doc
"""


def q_dup_cluster_size_hist(sf_dir: str):
    """Dedup audit histogram: how many near-dup clusters have exactly
    s members (size-1 clusters = unique documents). The number every
    dedup run reports before anyone trusts its output.

    Scale design: cluster labels come from near_dup_canonical (the
    distributed min-label closure); sizes and the histogram are two
    stacked two-phase sums — per-batch partials collapse before each
    groupby, so the first exchange is cluster-grain and the second is
    bounded by the distinct-size support, not by #documents."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    labels = near_dup_canonical(ds, threshold=0.5)

    def size_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "canonical_id": b.column("canonical_id"),
                "cluster_size": pa.array(
                    np.ones(b.num_rows, dtype=np.int64)
                ),
            }
        )
        g = t.group_by(["canonical_id"]).aggregate([("cluster_size", "sum")])
        return g.rename_columns(["canonical_id", "cluster_size"])

    def hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "cluster_size": b.column("cluster_size"),
                "n_clusters": pa.array(
                    np.ones(b.num_rows, dtype=np.int64)
                ),
            }
        )
        g = t.group_by(["cluster_size"]).aggregate([("n_clusters", "sum")])
        return g.rename_columns(["cluster_size", "n_clusters"])

    sizes = (
        labels.map_batches(
            size_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("canonical_id")
        .aggregate(Sum("cluster_size", alias_name="cluster_size"))
    )
    return (
        sizes.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("cluster_size")
        .aggregate(Sum("n_clusters", alias_name="n_clusters"))
    )


# Histogram over the canonical labels: extend the closure's CTE list
# with cluster sizes, then count clusters per size.
SQL_DUP_CLUSTER_SIZE_HIST = SQL_NEAR_DUP_CANONICAL.replace(
    "SELECT doc AS doc_id, min(r) AS canonical_id\nFROM reach GROUP BY doc",
    """, lbl AS (
  SELECT doc AS doc_id, min(r) AS canonical_id FROM reach GROUP BY doc
), cs AS (
  SELECT canonical_id, count(*) AS cluster_size FROM lbl
  GROUP BY canonical_id
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM cs GROUP BY cluster_size""",
)
assert "lbl" in SQL_DUP_CLUSTER_SIZE_HIST  # replace() must have matched


def q_heavy_hitter_tokens(sf_dir: str):
    """Exact top-20 tokens via the two-pass Misra-Gries sketch."""
    from ..stages.sketch import heavy_hitter_tokens

    ds = _read(sf_dir, "documents", ["text"])
    return heavy_hitter_tokens(ds, k=20, capacity=4096)


SQL_HEAVY_HITTER_TOKENS = r"""
SELECT tok AS token, count(*) AS n
FROM (
  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
)
GROUP BY tok
ORDER BY n DESC, token ASC
LIMIT 20
"""


def q_value_rank_select(sf_dir: str):
    """Exact p50/p90/p99 order statistics of events.value WITHOUT a
    global sort: histogram-refinement rank-select (stages/sketch.py) —
    a few shuffle-free counting passes instead of an all-to-all sort."""
    from ..stages.sketch import rank_select

    ds = _read(sf_dir, "events", ["value"])
    # ranks resolve against rank_select's NON-NULL total (ds.count()
    # would include null rows and select the wrong order statistic on a
    # null-bearing column)
    ranks, vals = rank_select(
        ds,
        "value",
        [
            lambda n: n // 2,
            lambda n: n * 9 // 10,
            lambda n: n * 99 // 100,
        ],
        return_resolved_ranks=True,
    )
    return pa.table(
        {
            "rank_k": pa.array(ranks, pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )


SQL_VALUE_RANK_SELECT = """
WITH o AS (
  SELECT value, row_number() OVER (ORDER BY value) - 1 AS rn
  FROM events WHERE value IS NOT NULL
), ks AS (
  SELECT unnest([
    (SELECT count(value) FROM events) // 2,
    (SELECT count(value) FROM events) * 9 // 10,
    (SELECT count(value) FROM events) * 99 // 100
  ]) AS k
)
SELECT k AS rank_k, (SELECT value FROM o WHERE rn = k) AS value FROM ks
"""


def q_regex_token_counts(sf_dir: str):
    """BPE-ish pre-tokenizer counts, vectorized with the Arrow RE2
    kernel; DuckDB regexp_extract_all is the oracle."""
    from ..stages.textstats import add_bpe_token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_bpe_token_count(b).select(["doc_id", "n_bpe_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_REGEX_TOKEN_COUNTS = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
"""


TEST_SPLIT_PCT = 10


def q_doc_split_assign(sf_dir: str):
    """Deterministic train/test split assignment: split by the 64-bit
    mix of doc_id (stages/hashing.py mix_rounds) mod 100 — stable across
    runs, machines and partitionings, reproducible in SQL (the staple
    held-out-split pattern for training-data pipelines)."""
    from ..stages.hashing import mix_rounds

    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h = mix_rounds(ids.astype(np.uint64))
        bucket = (h % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < TEST_SPLIT_PCT, "test", "train")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOC_SPLIT_ASSIGN = f"""
WITH m1 AS (
  SELECT doc_id, {_mixr_sql('CAST(doc_id AS HUGEINT)')} AS v FROM documents
), m2 AS (
  SELECT doc_id, {_mixr_sql('v')} AS v FROM m1
)
SELECT doc_id,
       CASE WHEN v % 100 < {TEST_SPLIT_PCT} THEN 'test' ELSE 'train' END
         AS split
FROM m2
"""


MIXTURE_PPM_DEN = 1_000_000


def q_mixture_sample(sf_dir: str):
    """Language-balancing data-mixture sampler — the 'rebalance the
    training mix' staple: every language may contribute at most
    cap = ceil(total_docs / #langs) documents IN EXPECTATION, so
    the over-represented language (en, ~42% of the corpus) is rate-downsampled (keep-rate
    ppm_l = cap * 10^6 // n_l) while under-represented ones pass whole.
    A document keeps iff mix_rounds(doc_id) % 10^6 < ppm of its language —
    deterministic across runs, machines and partitionings, and
    reproducible in SQL (same HUGEINT mix as doc_split_assign).

    Scale composition: phase 1 is a two-phase count at LANGUAGE grain
    (languages are a curated dimension, bounded by nature — the same
    driver-smallness contract as nation/region resolution); the
    (lang, ppm) rate table broadcasts once via ray.put and phase 2 is
    one vectorized hash-gate map over the corpus — zero shuffle of
    document rows."""
    import ray as _ray

    from ..stages.hashing import mix_rounds

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def count_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"lang": b.column("lang")}).group_by(
            ["lang"]
        ).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    counts = docs.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("lang").aggregate(Sum("n", alias_name="n"))
    srcs: list = []
    ns: list = []
    for b in counts.iter_batches(batch_format="pyarrow"):
        srcs.extend(b.column("lang").to_pylist())
        ns.extend(b.column("n").to_pylist())
    if not srcs:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
            }
        )
    tot = sum(ns)
    cap = -(-tot // len(srcs))  # ceil
    ppm = [
        MIXTURE_PPM_DEN if n <= cap else cap * MIXTURE_PPM_DEN // n
        for n in ns
    ]
    ref = _ray.put(
        (pa.array(srcs, pa.string()), pa.array(ppm, pa.int64()))
    )

    def keep(b: pa.Table) -> pa.Table:
        keys_arr, ppm_arr = _ray.get(ref)
        p = pc.take(
            ppm_arr, pc.index_in(b.column("lang"), value_set=keys_arr)
        ).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h = mix_rounds(ids.astype(np.uint64)) % np.uint64(MIXTURE_PPM_DEN)
        return pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "lang": b.column("lang"),
            }
        ).filter(pa.array(h.astype(np.int64) < p))

    return docs.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_MIXTURE_SAMPLE = f"""
WITH m1 AS (
  SELECT doc_id, lang,
         {_mixr_sql('CAST(doc_id AS HUGEINT)')} AS v
  FROM documents
), m2 AS (
  SELECT doc_id, lang, {_mixr_sql('v')} AS v FROM m1
), c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY 1
), cap AS (
  SELECT (sum(n) + count(*) - 1) // count(*) AS cap FROM c
), r AS (
  SELECT lang,
         CASE WHEN n <= cap THEN {MIXTURE_PPM_DEN}
              ELSE CAST(cap AS HUGEINT) * {MIXTURE_PPM_DEN} // n
         END AS ppm
  FROM c, cap
)
SELECT CAST(m2.doc_id AS BIGINT) AS doc_id, m2.lang
FROM m2 JOIN r ON m2.lang = r.lang
WHERE m2.v % {MIXTURE_PPM_DEN} < r.ppm
"""


def q_mixture_upsample(sf_dir: str):
    """Epoch-style upsampler, the mixture_sample complement: bring every
    language up to the DOMINANT language's document count in expectation
    by repeating its documents — whole epochs (reps = target // n_l for
    everyone) plus a deterministic hash-gated fractional epoch (one
    extra copy iff mix_rounds(doc_id) % 10^6 < (target mod n_l scaled to
    ppm)) — the 'repeat rare data k.x times' staple of training-mix
    construction. The dominant language gets base 1 + gate 0, i.e.
    passes through unchanged. Emits one (doc_id, lang, copy) row per
    repetition, copy in [0, reps).

    Scale composition: same two phases as mixture_sample — a
    language-grain count (curated dimension, bounded by nature), one
    ray.put of the (lang, base, gate_ppm) table, then a single
    vectorized expansion map over the corpus (np.repeat gather, no
    Python loop; output grows by the mix's design factor, never
    materialized on the driver)."""
    import ray as _ray

    from ..stages.hashing import mix_rounds

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def count_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"lang": b.column("lang")}).group_by(
            ["lang"]
        ).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    counts = docs.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("lang").aggregate(Sum("n", alias_name="n"))
    langs: list = []
    ns: list = []
    for b in counts.iter_batches(batch_format="pyarrow"):
        langs.extend(b.column("lang").to_pylist())
        ns.extend(b.column("n").to_pylist())
    if not langs:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "copy": pa.array([], pa.int64()),
            }
        )
    target = max(ns)
    base = [target // n for n in ns]
    gppm = [
        (target - (target // n) * n) * MIXTURE_PPM_DEN // n for n in ns
    ]
    ref = _ray.put(
        (
            pa.array(langs, pa.string()),
            pa.array(base, pa.int64()),
            pa.array(gppm, pa.int64()),
        )
    )

    def expand(b: pa.Table) -> pa.Table:
        keys_arr, base_arr, gppm_arr = _ray.get(ref)
        pos = pc.index_in(b.column("lang"), value_set=keys_arr)
        bs = pc.take(base_arr, pos).to_numpy(zero_copy_only=False)
        gp = pc.take(gppm_arr, pos).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h = (
            mix_rounds(ids.astype(np.uint64))
            % np.uint64(MIXTURE_PPM_DEN)
        ).astype(np.int64)
        reps = bs + (h < gp)
        idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), reps)
        offsets = np.cumsum(reps) - reps
        copy = np.arange(idx.size, dtype=np.int64) - np.repeat(
            offsets, reps
        )
        out = pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "lang": b.column("lang"),
            }
        ).take(pa.array(idx))
        return out.append_column("copy", pa.array(copy))

    return docs.map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_MIXTURE_UPSAMPLE = f"""
WITH m1 AS (
  SELECT doc_id, lang,
         {{MIXR1}} AS v
  FROM documents
), m2 AS (
  SELECT doc_id, lang, {{MIXR2}} AS v FROM m1
), c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY 1
), t AS (
  SELECT max(n) AS target FROM c
), r AS (
  SELECT lang,
         target // n AS base,
         (target - (target // n) * n) * {MIXTURE_PPM_DEN} // n AS gppm
  FROM c, t
), reps AS (
  SELECT m2.doc_id, m2.lang,
         r.base + CASE WHEN m2.v % {MIXTURE_PPM_DEN} < r.gppm
                       THEN 1 ELSE 0 END AS reps
  FROM m2 JOIN r ON m2.lang = r.lang
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(unnest(range(reps)) AS BIGINT) AS copy
FROM reps
"""
SQL_MIXTURE_UPSAMPLE = SQL_MIXTURE_UPSAMPLE.replace(
    "{MIXR1}", _mixr_sql("CAST(doc_id AS HUGEINT)")
).replace("{MIXR2}", _mixr_sql("v"))


def q_domain_fileset_previews(sf_dir: str):
    """Per-domain FILESET summarization: all of a domain's pages compete
    for one character budget, rendered as `==> url <==` sections — the
    groupby(key).map_groups realization of the reference's multi-file
    mode (rows-only: preview strings)."""
    import ray.data as _rd

    from ..sources.pages import materialize_pages, rows_for_sf_dir
    from ..stages.derive import add_domain
    from ..stages.summarize import fileset_preview_group

    rows = min(rows_for_sf_dir(sf_dir), 5000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    ds = _rd.read_parquet(paths, columns=["url", "text"])
    ds = ds.map_batches(
        add_domain, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby("domain").map_groups(
        lambda g: fileset_preview_group(g, budget=400, max_files=6),
        batch_format="pyarrow",
    )
    return out


def q_image_features(sf_dir: str):
    """Multimodal plumbing over the pages' binary html payload: actor-pool
    feature extraction (rows-only; decode kernel is a deterministic fake,
    see stages/multimodal.py)."""
    import ray.data as _rd

    from ..sources.pages import materialize_pages, rows_for_sf_dir
    from ..stages.multimodal import ImageFeatureExtractor

    rows = min(rows_for_sf_dir(sf_dir), 5000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    ds = _rd.read_parquet(paths, columns=["url", "html"])
    out = ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs=dict(dim=16),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
        batch_size=64,
        num_cpus=1,
    )
    return out.select_columns(["url", "features"])


def q_props_extract(sf_dir: str):
    """JSON field extraction from the events.props payload column,
    vectorized per batch; aggregated by event_type (oracle: DuckDB
    json_extract)."""
    import json as _json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        ks = [
            _json.loads(p).get("k", 0) if p else 0
            for p in b.column("props").to_pylist()
        ]
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "k": pa.array(ks, pa.int64()),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("k", "sum")]
        )
        return g.rename_columns(["event_type", "n", "k_sum"])

    return _two_phase_sum(ds, ["event_type"], partial, ["n", "k_sum"])


def q_summarize_documents(sf_dir: str):
    """The flagship per-document transform over the documents table
    (rows-only: previews have no SQL equivalent)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    out = ds.map_batches(
        Summarizer,
        fn_constructor_kwargs=dict(budget=200, input_format="text"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
        batch_size=512,
        num_cpus=1,
    )
    return out.select_columns(["doc_id", "preview"])


# --------------------------------------------------------------------------
# Similarity search over `embeddings`
# --------------------------------------------------------------------------
N_QUERIES = 5
TOPK = 10


def q_knn_topk(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = (
        ds.filter(expr=f"vec_id < {N_QUERIES}")
        .take_all()
    )
    qrows.sort(key=lambda r: r["vec_id"])
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]
    return brute_force_topk(
        ds, queries, k=TOPK, query_ids=qids, exclude_self=True
    )


SQL_KNN_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
), s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
), r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS "rank"
FROM r WHERE rnk <= {TOPK}
"""

NEAR_DUP_TAU = 0.4


def q_ivf_topk(sf_dir: str):
    """IVF approximate top-k over the PARTITIONED layout (recall vs
    brute force is asserted in tests): one pass writes the corpus
    bucketed by nearest centroid under /tmp, then the query reads ONLY
    the probed hive partitions. Hash-oracled: the coarse quantizer is
    the exact-integer Lloyd trainer (stages/cluster.py), so
    SQL_IVF_TOPK re-derives centroids, cell assignment and the probe
    set bit-for-bit with the chained-CTE kmeans machinery."""
    import tempfile

    from ..stages.similarity import build_ivf_index, ivf_topk_indexed

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = ds.filter(expr=f"vec_id < {N_QUERIES}").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]
    idx_dir = tempfile.mkdtemp(prefix="headson-ivf-")
    build_ivf_index(ds, idx_dir)
    return ivf_topk_indexed(
        idx_dir, queries, k=TOPK, query_ids=qids
    )


def q_lsh_topk(sf_dir: str):
    """Random-hyperplane LSH approximate top-k (recall vs the exact
    knn_topk asserted in tests). Only vectors whose bucket code matches
    a query bucket are scored — the in-stream ANN variant that needs no
    prebuilt layout. Hash-oracled: SQL_LSH_TOPK re-derives the exact
    bucket codes from inlined plane literals, so DuckDB reproduces the
    same approximation bit-for-bit."""
    from ..stages.similarity import lsh_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = ds.filter(expr=f"vec_id < {N_QUERIES}").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]
    return lsh_topk(ds, queries, k=TOPK, query_ids=qids)


def q_embedding_near_dups_lsh(sf_dir: str):
    """LSH-blocked near-dup pairs — the scale path (recall vs the exact
    variant asserted in tests). Hash-oracled via the same inlined-plane
    code CTE as SQL_LSH_TOPK."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_near_dup_pairs_lsh(ds, threshold=NEAR_DUP_TAU)


def q_embedding_near_dups(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_near_dup_pairs(
        ds, threshold=NEAR_DUP_TAU, block_column=None
    )


SQL_EMBEDDING_NEAR_DUPS = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS a, b.vec_id AS b
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.emb, b.emb) >= {NEAR_DUP_TAU}
"""

# LSH oracle machinery: the random-hyperplane bucket codes used by
# lsh_topk / embedding_near_dup_pairs_lsh are DETERMINISTIC given
# (seed, num_tables, num_planes, dim) — RandomState(42) Gaussians —
# and sign(normalized_v . p) == sign(raw_v . p) because normalization
# scales by a positive number. So the exact candidate sets are
# SQL-expressible by inlining the plane vectors as DOUBLE[] literals
# (repr() round-trips float64 exactly; DuckDB parses correctly-rounded)
# and re-deriving each vector's per-table code with list_dot_product.
# This turns both previously rows-only approximate-ANN entries into
# hash-checked oracles: SQL reproduces the same approximation, not a
# ground truth it approximates.
LSH_DIM = 64  # embeddings.embedding is list<float>[64] in testdata
LSH_NUM_TABLES = 10
LSH_NUM_PLANES = 3
LSH_SEED = 42


def _lsh_planes_values() -> str:
    """VALUES rows (t, p, w DOUBLE[]) for the LSH hyperplanes — the same
    RandomState(seed).standard_normal((T, P, dim)) draw as
    stages/similarity.py lsh_topk / embedding_near_dup_pairs_lsh."""
    planes = np.random.RandomState(LSH_SEED).standard_normal(
        (LSH_NUM_TABLES, LSH_NUM_PLANES, LSH_DIM)
    )
    rows = []
    for t in range(LSH_NUM_TABLES):
        for p in range(LSH_NUM_PLANES):
            lst = ", ".join(repr(float(x)) for x in planes[t, p])
            rows.append(f"({t}, {p}, [{lst}]::DOUBLE[])")
    return ",\n".join(rows)


def _sql_lsh_codes() -> str:
    """Shared CTE prefix: per-(vec_id, table) bucket code c, exactly the
    (bits * 2^p).sum() code of the Ray kernels."""
    return f"""
WITH planes(t, p, w) AS (VALUES
{_lsh_planes_values()}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
proj AS (
  SELECT e.vec_id, pl.t, pl.p, list_dot_product(e.emb, pl.w) AS d
  FROM e, planes pl
),
code AS (
  SELECT vec_id, t,
         SUM(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS c
  FROM proj GROUP BY vec_id, t
)"""


SQL_LSH_TOPK = f"""{_sql_lsh_codes()},
qc AS (SELECT DISTINCT t, c FROM code WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT code.vec_id
  FROM code JOIN qc ON code.t = qc.t AND code.c = qc.c
),
q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.emb) AS sim
  FROM q, e
  JOIN cand ON e.vec_id = cand.vec_id
  WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS "rank"
FROM r WHERE rnk <= {TOPK}
"""

SQL_EMBEDDING_NEAR_DUPS_LSH = f"""{_sql_lsh_codes()},
cand AS (
  SELECT DISTINCT c1.vec_id AS a, c2.vec_id AS b
  FROM code c1
  JOIN code c2 ON c1.t = c2.t AND c1.c = c2.c AND c1.vec_id < c2.vec_id
)
SELECT cand.a, cand.b
FROM cand
JOIN e ea ON ea.vec_id = cand.a
JOIN e eb ON eb.vec_id = cand.b
WHERE list_cosine_similarity(ea.emb, eb.emb) >= {NEAR_DUP_TAU}
"""


# --------------------------------------------------------------------------
# Relational operators over the TPC-H-ish tables
# --------------------------------------------------------------------------
def q_lineitem_agg(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "qty": pc.cast(b.column("l_quantity"), pa.int64()),
                "price_cents": _cents(b.column("l_extendedprice")),
                "disc_cents": _cents(disc_price),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [([], "count_all"), ("qty", "sum"), ("price_cents", "sum"),
             ("disc_cents", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "n", "sum_qty",
             "sum_price_cents", "sum_disc_cents"]
        )

    return _two_phase_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        partial,
        ["n", "sum_qty", "sum_price_cents", "sum_disc_cents"],
    )


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS BIGINT) AS sum_disc_cents
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# Max rows a "small" join side may have before broadcast falls back to the
# hash-partitioned join (stages/join.py). TPC-H customer grows with sf, so
# "dimension-sized" must be checked, not assumed. Tests monkeypatch this.
BROADCAST_ROW_LIMIT = 4_000_000


def _collect_small_side(
    ds, key_col: str, val_col: str, limit: int
) -> tuple[pa.Array, pa.Array] | None:
    """Collect a keyed side as two arrow arrays IF it fits under `limit`
    rows; returns None (caller must shuffle-join) once the limit is
    crossed — the stream is abandoned early, never fully materialized."""
    keys, vals, total = [], [], 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        total += b.num_rows
        if total > limit:
            return None
        keys.append(b.column(key_col))
        vals.append(b.column(val_col))
    if not keys:
        # empty side: derive the array types from the dataset's actual
        # schema (hardcoded int64/string would break the index_in probe
        # for any other key/value types in this edge case)
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return (
            pa.array([], types[key_col]),
            pa.array([], types[val_col]),
        )
    return (
        pa.concat_arrays([c.combine_chunks() for c in keys]),
        pa.concat_arrays([c.combine_chunks() for c in vals]),
    )


def _probe(batch_keys, keys_arr: pa.Array, vals_arr: pa.Array) -> pa.Array:
    """Vectorized broadcast-join probe: index_in + take (Arrow C++), null
    where the key is absent — no per-row python dict.get loop."""
    idx = pc.index_in(batch_keys, value_set=keys_arr)
    return pc.take(vals_arr, idx)


def _orders_with_segment(sf_dir: str, order_columns: list[str]):
    """Orders joined with c_mktsegment, INNER-join semantics in BOTH
    paths (rows whose custkey is absent from customer are dropped, like
    the oracles' JOIN): broadcast + vectorized index_in probe while the
    customer side fits BROADCAST_ROW_LIMIT, hash-partitioned join beyond
    it — no unbounded dict ever lands on the driver."""
    import ray as _ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", *order_columns])
    small = _collect_small_side(
        cust, "c_custkey", "c_mktsegment", BROADCAST_ROW_LIMIT
    )
    if small is None:
        from ..stages.join import hash_join

        proj = orders.map_batches(
            lambda b: pa.table(
                {"c_custkey": b.column("o_custkey"),
                 **{c: b.column(c) for c in order_columns}}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return hash_join(proj, cust, key="c_custkey", how="inner")

    lookup_ref = _ray.put(small)

    def probe_batch(b: pa.Table) -> pa.Table:
        keys_arr, vals_arr = _ray.get(lookup_ref)
        segs = _probe(b.column("o_custkey"), keys_arr, vals_arr)
        t = pa.table(
            {"c_mktsegment": segs,
             **{c: b.column(c) for c in order_columns}}
        )
        # inner-join semantics: drop dangling custkeys (null segment),
        # matching the hash-join fallback and the SQL oracle
        return t.filter(pc.is_valid(t.column("c_mktsegment")))

    return orders.map_batches(
        probe_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def q_orders_by_segment(sf_dir: str):
    """customer->segment join + two-phase aggregate (see
    _orders_with_segment for the broadcast/hash-join mode switch)."""
    joined = _orders_with_segment(sf_dir, ["o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_mktsegment": b.column("c_mktsegment"),
                "cents": _cents(b.column("o_totalprice")),
            }
        )
        g = t.group_by(["c_mktsegment"]).aggregate(
            [([], "count_all"), ("cents", "sum")]
        )
        return g.rename_columns(["c_mktsegment", "n_orders", "total_cents"])

    return _two_phase_sum(
        joined, ["c_mktsegment"], partial, ["n_orders", "total_cents"]
    )


SQL_ORDERS_BY_SEGMENT = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_top_orders(sf_dir: str):
    """Global top-10 WITHOUT a global sort: each block pre-trims to its
    own top-10 (ds.sort().limit() would be an all-to-all shuffle of the
    whole orders table), then the driver merges the tiny partials
    (<= 10 rows per block) and takes the final 10."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def trim(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "total_cents": _cents(b.column("o_totalprice")),
            }
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("total_cents", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )
        return t.take(idx.slice(0, 10))

    partials = ds.map_batches(
        trim, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = list(partials.iter_batches(batch_format="pyarrow"))
    merged = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64()),
            }
        )
    )
    idx = pc.sort_indices(
        merged,
        sort_keys=[
            ("total_cents", "descending"),
            ("o_orderkey", "ascending"),
        ],
    )
    return merged.take(idx.slice(0, 10))


SQL_TOP_ORDERS = """
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def q_events_per_user(sf_dir: str):
    """Plain groupby (count/min/max) — exercises Ray aggregate kernels."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "tu": pc.cast(b.column("ts"), pa.int64()),
            }
        )
        g = t.group_by(["user_id"]).aggregate(
            [([], "count_all"), ("tu", "min"), ("tu", "max")]
        )
        return g.rename_columns(["user_id", "n", "first_ts", "last_ts"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("user_id").aggregate(
        Sum("n", alias_name="n"),
        Min("first_ts", alias_name="first_ts"),
        Max("last_ts", alias_name="last_ts"),
    )


SQL_EVENTS_PER_USER = """
SELECT user_id, count(*) AS n,
       min(epoch_us(ts)) AS first_ts,
       max(epoch_us(ts)) AS last_ts
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Joins / set ops / per-group top-k
# --------------------------------------------------------------------------
def _broadcast_lookup(ds, key_col: str, val_col: str):
    """Collect a SMALL keyed table as (keys, vals) arrow arrays and
    ray.put it once; probes are vectorized via _probe (index_in + take).

    Guardrail: raises if the side exceeds BROADCAST_ROW_LIMIT — callers
    with potentially-growing sides must branch to stages/join.py
    hash_join themselves (see q_orders_by_segment)."""
    import ray as _ray

    small = _collect_small_side(ds, key_col, val_col, BROADCAST_ROW_LIMIT)
    if small is None:
        raise ValueError(
            f"broadcast side over BROADCAST_ROW_LIMIT={BROADCAST_ROW_LIMIT};"
            " use hash_join"
        )
    return _ray.put(small)


def q_suppliers_by_region(sf_dir: str):
    """supplier JOIN nation JOIN region via broadcast of the two tiny
    dimension tables; two-phase aggregate by region name."""
    import ray as _ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    n2r = {}
    for b in nation.iter_batches(batch_format="pyarrow"):
        n2r.update(
            zip(
                b.column("n_nationkey").to_pylist(),
                b.column("n_regionkey").to_pylist(),
            )
        )
    r2name = {}
    for b in region.iter_batches(batch_format="pyarrow"):
        r2name.update(
            zip(
                b.column("r_regionkey").to_pylist(),
                b.column("r_name").to_pylist(),
            )
        )
    n2r_items = sorted(n2r.items())
    lookup_ref = _ray.put(
        (
            pa.array([n for n, _ in n2r_items], pa.int64()),
            pa.array([r2name[r] for _, r in n2r_items], pa.string()),
        )
    )
    supplier = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        keys_arr, vals_arr = _ray.get(lookup_ref)
        names = _probe(b.column("s_nationkey"), keys_arr, vals_arr)
        t = pa.table(
            {
                "r_name": names,
                "cents": _cents(b.column("s_acctbal")),
            }
        )
        g = t.group_by(["r_name"]).aggregate(
            [([], "count_all"), ("cents", "sum")]
        )
        return g.rename_columns(["r_name", "n_suppliers", "acctbal_cents"])

    return _two_phase_sum(
        supplier, ["r_name"], partial, ["n_suppliers", "acctbal_cents"]
    )


SQL_SUPPLIERS_BY_REGION = """
SELECT r_name, count(*) AS n_suppliers,
       CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_distinct_part_types(sf_dir: str):
    """DISTINCT via two-phase: per-batch pyarrow distinct count, then a
    small groupby merge (the shuffle moves one row per (type, batch))."""
    ds = _read(sf_dir, "part", ["p_type"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["p_type", "n_parts"])

    return _two_phase_sum(ds, ["p_type"], partial, ["n_parts"])


SQL_DISTINCT_PART_TYPES = """
SELECT p_type, count(*) AS n_parts FROM part GROUP BY p_type
"""


def q_order_customers_without_events(sf_dir: str):
    """Anti-join: distinct order custkeys with no event activity. The
    distinct event-user set (bounded, dimension-sized) is pre-deduped
    two-phase and broadcast once; the orders stream dedups per batch then
    merges through one small groupby."""
    import ray as _ray

    events = _read(sf_dir, "events", ["user_id"])

    def distinct_users(b: pa.Table) -> pa.Table:
        return b.group_by(["user_id"]).aggregate([])

    user_chunks = []
    for b in (
        events.map_batches(distinct_users, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=65536)
    ):
        user_chunks.append(b.column("user_id").combine_chunks())
    users_ref = _ray.put(
        pc.unique(pa.chunked_array(user_chunks))
        if user_chunks
        else pa.array([], pa.int64())
    )

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def anti(b: pa.Table) -> pa.Table:
        us = _ray.get(users_ref)
        mask = pc.is_null(pc.index_in(b.column("o_custkey"), value_set=us))
        return b.filter(mask).group_by(["o_custkey"]).aggregate([])

    deduped = orders.map_batches(
        anti, batch_format="pyarrow", zero_copy_batch=True
    )
    return deduped.groupby("o_custkey").count().select_columns(["o_custkey"])


SQL_ORDER_CUSTOMERS_WITHOUT_EVENTS = """
SELECT DISTINCT o_custkey FROM orders
WHERE o_custkey NOT IN (SELECT user_id FROM events)
"""


def q_top3_orders_per_segment(sf_dir: str):
    """Per-group top-k: segment-joined orders (broadcast or hash-join
    fallback, see _orders_with_segment), then per-segment top-3 orders
    by price via groupby(segment).map_groups. Partials are pre-trimmed
    to 3 rows per (segment, batch) inside map_batches so the shuffle
    moves at most 3 rows per segment per block."""
    joined = _orders_with_segment(
        sf_dir, ["o_orderkey", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_mktsegment": b.column("c_mktsegment"),
                "o_orderkey": b.column("o_orderkey"),
                "total_cents": _cents(b.column("o_totalprice")),
            }
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("c_mktsegment", "ascending"),
                ("total_cents", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )
        return _trim_topk_runs(t.take(idx), ["c_mktsegment"], 3)

    partials = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def top3(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("total_cents", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )
        t = group.take(idx).slice(0, 3)
        ranks = pa.array(range(1, t.num_rows + 1), pa.int64())
        return t.append_column("rnk", ranks)

    return partials.groupby("c_mktsegment").map_groups(
        top3, batch_format="pyarrow"
    )


SQL_TOP3_ORDERS_PER_SEGMENT = """
WITH j AS (
  SELECT c_mktsegment, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), r AS (
  SELECT *, row_number() OVER (
      PARTITION BY c_mktsegment
      ORDER BY total_cents DESC, o_orderkey) AS rnk
  FROM j
)
SELECT c_mktsegment, o_orderkey, total_cents, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
"""


def q_asof_latest_order_per_event(sf_dir: str):
    """As-of join (an operator Ray Data lacks natively): for each event,
    the customer's most recent order with o_orderdate <= ts. Implemented
    as union-of-streams -> groupby(key).map_groups with a per-key ordered
    sweep. Partitioning assumption: one customer's rows fit in memory
    (orders+events per key are bounded); hot keys would need salting by
    time range with boundary handoff."""
    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def ev_shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("user_id"),
                "t_us": pc.cast(b.column("ts"), pa.int64()),
                "event_id": b.column("event_id"),
                "o_orderkey": pa.nulls(b.num_rows, pa.int64()),
                "is_event": pa.array([True] * b.num_rows),
            }
        )

    def ord_shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("o_custkey"),
                "t_us": pc.cast(b.column("o_orderdate"), pa.int64()),
                "event_id": pa.nulls(b.num_rows, pa.int64()),
                "o_orderkey": b.column("o_orderkey"),
                "is_event": pa.array([False] * b.num_rows),
            }
        )

    unioned = events.map_batches(
        ev_shape, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(
            ord_shape, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def sweep(group: pa.Table) -> pa.Table:
        # vectorized as-of probe: sort the key's orders by (t, orderkey)
        # and searchsorted each event's ts with side="right" — the match
        # is the latest order with t <= ts (orders at equal ts count,
        # ties broken toward the max orderkey), identical to the old
        # row-at-a-time sweep without the per-row python loop.
        is_ev = group.column("is_event")
        ev = group.filter(is_ev)
        orders = group.filter(pc.invert(is_ev))
        ev_ids = ev.column("event_id").to_numpy(zero_copy_only=False)
        ev_t = ev.column("t_us").to_numpy(zero_copy_only=False)
        if orders.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array(
                        ev_ids.astype(np.int64), pa.int64()
                    ),
                    "o_orderkey": pa.nulls(len(ev_ids), pa.int64()),
                }
            )
        o_t = orders.column("t_us").to_numpy(zero_copy_only=False)
        o_k = orders.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((o_k, o_t))
        o_t = o_t[order]
        o_k = o_k[order]
        pos = np.searchsorted(o_t, ev_t, side="right") - 1
        matched = pos >= 0
        keys = np.where(matched, o_k[np.maximum(pos, 0)], 0)
        return pa.table(
            {
                "event_id": pa.array(ev_ids.astype(np.int64), pa.int64()),
                "o_orderkey": pa.array(
                    keys.astype(np.int64), pa.int64(), mask=~matched
                ),
            }
        )

    return unioned.groupby("key").map_groups(sweep, batch_format="pyarrow")


SQL_ASOF_LATEST_ORDER_PER_EVENT = """
SELECT e.event_id,
       (SELECT max(o.o_orderkey)
        FROM orders o
        WHERE o.o_custkey = e.user_id
          AND epoch_us(o.o_orderdate) = (
            SELECT max(epoch_us(o2.o_orderdate))
            FROM orders o2
            WHERE o2.o_custkey = e.user_id
              AND epoch_us(o2.o_orderdate) <= epoch_us(e.ts))
       ) AS o_orderkey
FROM events e
"""


CONCURRENCY_WIDTH_US = 3600 * 1_000_000


def q_event_concurrency(sf_dir: str):
    """Keyless range join (no equality key at all — the one join class
    hash_join cannot express): for every event, how many OTHER events
    across ALL users landed within +/-1 hour (load / burst-detection
    signal). Implemented as stages/join.py:banded_interval_count — one
    time-band groupby; a 3x-replicated ts-only build stream makes every
    band self-sufficient, and per-band resolution is sort + two
    searchsorted calls. Scale: shuffle volume is 4x a single int64
    column (1 probe + 3 build replicas) regardless of row width; bursty
    bands parallelize by shrinking band_us."""
    from ..stages.join import banded_interval_count

    ds = _read(sf_dir, "events", ["event_id", "ts"])
    return banded_interval_count(
        ds,
        ts_col="ts",
        id_col="event_id",
        width_us=CONCURRENCY_WIDTH_US,
    )


SQL_EVENT_CONCURRENCY = f"""
SELECT e1.event_id,
       CAST(count(e2.event_id) AS BIGINT) AS n_concurrent
FROM events e1
LEFT JOIN events e2
  ON e2.event_id <> e1.event_id
 AND epoch_us(e2.ts) BETWEEN epoch_us(e1.ts) - {CONCURRENCY_WIDTH_US}
                         AND epoch_us(e1.ts) + {CONCURRENCY_WIDTH_US}
WHERE e1.ts IS NOT NULL
GROUP BY e1.event_id
"""


def q_click_purchase_pairs(sf_dir: str):
    """Event-sequence interval join (CEP pattern `click -> purchase`
    within 1 hour, per user): count qualifying (click, purchase) pairs
    for every user. Implemented as groupby(user).map_groups with a
    vectorized searchsorted window count — the per-key sweep pattern for
    stream-stream interval joins. Partitioning assumption: one user's
    events fit in memory (salt by time range for pathological keys)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def pairs(group: pa.Table) -> pa.Table:
        uid = group.column("user_id")[0].as_py()
        et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        clicks = np.sort(ts[et == "click"])
        purchases = ts[et == "purchase"]
        if clicks.size == 0 or purchases.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        lo = np.searchsorted(clicks, purchases - HOUR_US, side="left")
        hi = np.searchsorted(clicks, purchases, side="left")  # strict <
        n = int((hi - lo).sum())
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_pairs": pa.array([n], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(pairs, batch_format="pyarrow")


SQL_CLICK_PURCHASE_PAIRS = f"""
SELECT c.user_id, count(*) AS n_pairs
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND epoch_us(c.ts) < epoch_us(p.ts)
 AND epoch_us(p.ts) - epoch_us(c.ts) <= {HOUR_US}
GROUP BY c.user_id
"""


def q_cep_stream_join(sf_dir: str):
    """Stateful stream-stream interval join THROUGH the engine
    machinery (pipelines/streamjoin.py): events stream in 8 event-time
    micro-batches, clicks accumulate in watermark-evicted per-user
    actor state, and each purchase emits its qualifying (click ->
    purchase within 1h, strictly earlier) pairs exactly-once in its
    batch — the incremental, pair-grain form of click_purchase_pairs.
    Hash-oracled: the join is a pure function of event time, so SQL
    replays the whole stream as the plain interval self-join;
    kill/resume byte-equality pinned in tests/test_streamjoin.py."""
    import shutil
    import tempfile

    from .streamjoin import StreamJoin, ts_range_groups

    paths = [str(Path(sf_dir) / "events.parquet")]
    work = tempfile.mkdtemp(prefix="headson-stream-join-")
    try:
        eng = StreamJoin(
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            num_state_actors=4,
        )
        eng.run(ts_range_groups(paths, 8))
        return eng.read_pairs()
    finally:
        shutil.rmtree(work, ignore_errors=True)


SQL_CEP_STREAM_JOIN = f"""
SELECT c.user_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) AS purchase_ts_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND epoch_us(c.ts) < epoch_us(p.ts)
 AND epoch_us(p.ts) - epoch_us(c.ts) <= {HOUR_US}
"""


_PATTERN = ("click", "click", "purchase")


def q_event_pattern_matches(sf_dir: str):
    """MATCH_RECOGNIZE-style strict-contiguity CEP pattern: per user,
    count CONSECUTIVE [click, click, purchase] runs in event-time order
    (total key (ts, event_id) so ties are deterministic). The
    contiguous-pattern shape is what windowed pair joins like
    click_purchase_pairs cannot express — adjacency matters, not
    co-occurrence. groupby(user).map_groups with a vectorized
    shifted-equality test; per-user rows bounded (same partitioning
    assumption as the other per-key sweeps)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def count_runs(group: pa.Table) -> pa.Table:
        uid = group.column("user_id")[0].as_py()
        ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts))
        et = et[order]
        n = 0
        if et.size >= len(_PATTERN):
            m = et[: et.size - 2] == _PATTERN[0]
            m &= et[1 : et.size - 1] == _PATTERN[1]
            m &= et[2:] == _PATTERN[2]
            n = int(m.sum())
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_matches": pa.array([n], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(
        count_runs, batch_format="pyarrow"
    )


SQL_EVENT_PATTERN_MATCHES = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' AND e2 = 'click'
                      AND e3 = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matches
FROM o GROUP BY user_id
"""


def q_funnel_depths(sf_dir: str):
    """Multi-step CEP sequence detection (funnel `view -> click ->
    purchase`, each step within 1 hour of the previous, per user):
    emit (user_id, depth) where depth is the longest prefix of the
    funnel the user completed (1 = viewed, 2 = view->click chain,
    3 = full chain). A click only advances the funnel if a view
    precedes it within the window, and a purchase only completes it
    from such a QUALIFIED click — the chained constraint a pairwise
    interval join can't express.

    Scale design: groupby(user).map_groups with vectorized
    searchsorted step qualification — per-key state is three sorted
    timestamp arrays, never a cross join. Same partitioning assumption
    as q_click_purchase_pairs (one user's events fit in memory)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def depth(group: pa.Table) -> pa.Table:
        et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        views = np.sort(ts[et == "view"])
        if views.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "depth": pa.array([], pa.int64()),
                }
            )
        uid = group.column("user_id")[0].as_py()
        d = 1
        clicks = np.sort(ts[et == "click"])
        # a click qualifies iff some view falls in [click - 1h, click)
        lo = np.searchsorted(views, clicks - HOUR_US, side="left")
        hi = np.searchsorted(views, clicks, side="left")  # strict <
        qclicks = clicks[hi > lo]
        if qclicks.size:
            d = 2
            purchases = ts[et == "purchase"]
            lo = np.searchsorted(qclicks, purchases - HOUR_US, side="left")
            hi = np.searchsorted(qclicks, purchases, side="left")
            if np.any(hi > lo):
                d = 3
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "depth": pa.array([d], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(depth, batch_format="pyarrow")


SQL_FUNNEL_DEPTHS = f"""
WITH v AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'view'),
     c AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'click'),
     p AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'purchase'),
     qc AS (SELECT DISTINCT c.user_id, c.t FROM c
            JOIN v ON v.user_id = c.user_id
                  AND v.t < c.t AND c.t - v.t <= {HOUR_US}),
     d3 AS (SELECT DISTINCT p.user_id FROM p
            JOIN qc ON qc.user_id = p.user_id
                   AND qc.t < p.t AND p.t - qc.t <= {HOUR_US})
SELECT DISTINCT v.user_id,
       CAST(CASE WHEN v.user_id IN (SELECT user_id FROM d3) THEN 3
                 WHEN v.user_id IN (SELECT user_id FROM qc) THEN 2
                 ELSE 1 END AS BIGINT) AS depth
FROM v
"""


def q_revenue_by_priority(sf_dir: str):
    """Fact-fact hash-partitioned join (TPC-H Q3-ish): lineitem x orders
    on orderkey — both sides too big to broadcast at scale — then
    two-phase revenue aggregation by order priority."""
    from ..stages.join import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def li_shape(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "rev_cents": _cents(rev),
            }
        )

    li_proj = li.map_batches(li_shape, batch_format="pyarrow",
                             zero_copy_batch=True)
    joined = hash_join(li_proj, orders, key="o_orderkey", how="inner")

    def partial(b: pa.Table) -> pa.Table:
        g = (
            b.select(["o_orderpriority", "rev_cents"])
            .group_by(["o_orderpriority"])
            .aggregate([([], "count_all"), ("rev_cents", "sum")])
        )
        return g.rename_columns(["o_orderpriority", "n_items", "rev_cents"])

    return _two_phase_sum(
        joined, ["o_orderpriority"], partial, ["n_items", "rev_cents"]
    )


SQL_REVENUE_BY_PRIORITY = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


Q3_CUTOFF_US = 897_696_000_000_000  # 1998-06-01 epoch microseconds
Q3_SEGMENT = "BUILDING"
Q3_TOPK = 10


def q_order_revenue_topk(sf_dir: str):
    """TPC-H Q3 shape: BUILDING-segment customers, orders placed before
    the cutoff, lineitems shipped after it; revenue per ORDER (not per
    priority — high-cardinality key), global top-10 by revenue.

    Scale composition: dimension semi-filter (customer segment ->
    broadcast custkey set; hash-join fallback past BROADCAST_ROW_LIMIT)
    -> selective date filters pushed before the shuffle -> fact-fact
    bucket join (lineitem x orders) whose bucket_post aggregates
    per-order revenue and trims to its own top-10 INSIDE the bucket —
    each bucket holds every row of its keys, so no second shuffle over
    the per-order key; the driver merges <= 10 rows per bucket."""
    import ray as _ray

    cutoff = Q3_CUTOFF_US
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr=f"c_mktsegment == {Q3_SEGMENT!r}"
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    small = _collect_small_side(
        cust, "c_custkey", "c_custkey", BROADCAST_ROW_LIMIT
    )

    def orders_shape(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("o_orderdate"), pa.int64())
        t = pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "o_date_us": t_us,
            }
        ).filter(pc.less(t_us, pa.scalar(cutoff, pa.int64())))
        return t

    orders_f = orders.map_batches(
        orders_shape, batch_format="pyarrow", zero_copy_batch=True
    )
    if small is None:
        # customer side too big to broadcast: hash-partitioned semi join
        from ..stages.join import hash_join as _hj

        cust_keyed = cust.map_batches(
            lambda b: pa.table({"o_custkey": b.column("c_custkey")}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        orders_seg = _hj(orders_f, cust_keyed, key="o_custkey", how="inner")
    else:
        keys_ref = _ray.put(small[0])

        def semi(b: pa.Table) -> pa.Table:
            keys_arr = _ray.get(keys_ref)
            return b.filter(pc.is_in(b.column("o_custkey"),
                                     value_set=keys_arr))

        orders_seg = orders_f.map_batches(
            semi, batch_format="pyarrow", zero_copy_batch=True
        )
    orders_seg = orders_seg.select_columns(["o_orderkey", "o_date_us"])

    def li_shape(b: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.cast(b.column("l_shipdate"), pa.int64()),
            pa.scalar(cutoff, pa.int64()),
        )
        b = b.filter(keep)
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "rev_cents": _cents(rev),
            }
        )

    li_proj = li.map_batches(
        li_shape, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_post(joined: pa.Table) -> pa.Table:
        # every row of each o_orderkey is in this bucket: the per-order
        # sum is COMPLETE here, so trim to the bucket's own top-10
        g = joined.group_by(["o_orderkey", "o_date_us"]).aggregate(
            [("rev_cents", "sum")]
        )
        g = g.rename_columns(["o_orderkey", "o_date_us", "rev_cents"])
        idx = pc.sort_indices(
            g,
            sort_keys=[("rev_cents", "descending"),
                       ("o_orderkey", "ascending")],
        )
        return g.select(["o_orderkey", "rev_cents", "o_date_us"]).take(
            idx.slice(0, Q3_TOPK)
        )

    from ..stages.join import hash_join

    trimmed = hash_join(
        li_proj, orders_seg, key="o_orderkey", how="inner",
        bucket_post=bucket_post,
    )
    parts = list(trimmed.iter_batches(batch_format="pyarrow"))
    merged = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "rev_cents": pa.array([], pa.int64()),
                "o_date_us": pa.array([], pa.int64()),
            }
        )
    )
    idx = pc.sort_indices(
        merged,
        sort_keys=[("rev_cents", "descending"), ("o_orderkey", "ascending")],
    )
    return merged.take(idx.slice(0, Q3_TOPK))


SQL_ORDER_REVENUE_TOPK = f"""
SELECT o_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS rev_cents,
       epoch_us(o_orderdate) AS o_date_us
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND epoch_us(o_orderdate) < {Q3_CUTOFF_US}
  AND epoch_us(l_shipdate) > {Q3_CUTOFF_US}
GROUP BY o_orderkey, o_orderdate
ORDER BY rev_cents DESC, o_orderkey
LIMIT {Q3_TOPK}
"""


Q5_REGION = "ASIA"
Q5_LO_US = 852_076_800_000_000  # 1997-01-01 epoch microseconds
Q5_HI_US = 883_612_800_000_000  # 1998-01-01


def q_regional_nation_revenue(sf_dir: str):
    """TPC-H Q5 shape: revenue per nation for 1997 orders whose customer
    and line-item supplier sit in the SAME nation, restricted to one
    region — the six-table join chain (customer x orders x lineitem x
    supplier x nation x region).

    Scale composition, three join grains but ONE all-to-all exchange:
    nation x region resolve driver-side (tiny by nature, ~10^2 rows
    total) into an in-region nationkey -> name map; supplier broadcasts
    suppkey -> nationkey once via _broadcast_lookup (dimension-sized;
    its guardrail raises past BROADCAST_ROW_LIMIT); customer broadcasts
    custkey -> nationkey under the same limit WITH a hash_join fallback
    (customer is a fact at high sf). Both fact sides are pre-filtered
    to the region BEFORE the lineitem x orders bucket join (supplier
    nation in-region on the lineitem side, customer nation in-region +
    the order-date window on the orders side), and bucket_post
    collapses every bucket to <= one row per nation, so the final
    groupby shuffles only #buckets x #in-region-nations tiny rows."""
    import ray as _ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name",
                                      "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    region_keys = set()
    for b in region.iter_batches(batch_format="pyarrow"):
        for rk, rn in zip(b.column("r_regionkey").to_pylist(),
                          b.column("r_name").to_pylist()):
            if rn == Q5_REGION:
                region_keys.add(rk)
    nk2name = {}
    for b in nation.iter_batches(batch_format="pyarrow"):
        for nk, nn, rk in zip(b.column("n_nationkey").to_pylist(),
                              b.column("n_name").to_pylist(),
                              b.column("n_regionkey").to_pylist()):
            if rk in region_keys:
                nk2name[nk] = nn
    in_region = pa.array(sorted(nk2name), pa.int64())

    supp_ref = _broadcast_lookup(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey",
    )

    # orders side: window filter, attach + filter the customer nation
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def orders_window(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("o_orderdate"), pa.int64())
        keep = pc.and_(
            pc.greater_equal(t_us, pa.scalar(Q5_LO_US, pa.int64())),
            pc.less(t_us, pa.scalar(Q5_HI_US, pa.int64())),
        )
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
            }
        ).filter(keep)

    orders_w = orders.map_batches(
        orders_window, batch_format="pyarrow", zero_copy_batch=True
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    small = _collect_small_side(
        cust, "c_custkey", "c_nationkey", BROADCAST_ROW_LIMIT
    )
    if small is None:
        # customer too big to broadcast: hash-partitioned lookup join
        from ..stages.join import hash_join as _hj

        cust_keyed = cust.map_batches(
            lambda b: pa.table(
                {
                    "o_custkey": b.column("c_custkey"),
                    "c_nat": pc.cast(b.column("c_nationkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        orders_nat = _hj(orders_w, cust_keyed, key="o_custkey",
                         how="inner")

        def trim(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "c_nat": b.column("c_nat"),
                }
            ).filter(pc.is_in(b.column("c_nat"), value_set=in_region))

        orders_nat = orders_nat.map_batches(
            trim, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        cust_ref = _ray.put(small)

        def attach_cnat(b: pa.Table) -> pa.Table:
            keys_arr, vals_arr = _ray.get(cust_ref)
            cn = pc.cast(
                _probe(b.column("o_custkey"), keys_arr, vals_arr),
                pa.int64(),
            )
            return pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "c_nat": cn,
                }
            ).filter(pc.is_in(cn, value_set=in_region))

        orders_nat = orders_w.map_batches(
            attach_cnat, batch_format="pyarrow", zero_copy_batch=True
        )

    # lineitem side: attach + filter the supplier nation, price in cents
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_shape(b: pa.Table) -> pa.Table:
        keys_arr, vals_arr = _ray.get(supp_ref)
        sn = pc.cast(
            _probe(b.column("l_suppkey"), keys_arr, vals_arr), pa.int64()
        )
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "s_nat": sn,
                "rev_cents": _cents(rev),
            }
        ).filter(pc.is_in(sn, value_set=in_region))

    li_proj = li.map_batches(
        li_shape, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_post(joined: pa.Table) -> pa.Table:
        # same-nation predicate, then collapse the bucket to one row
        # per nation — the post-join exchange is O(#nations) per bucket
        m = joined.filter(
            pc.equal(joined.column("c_nat"), joined.column("s_nat"))
        )
        g = m.group_by(["s_nat"]).aggregate([("rev_cents", "sum")])
        return g.rename_columns(["nationkey", "rev_cents"])

    from ..stages.join import hash_join

    per_bucket = hash_join(
        li_proj, orders_nat, key="o_orderkey", how="inner",
        bucket_post=bucket_post,
    )
    totals = per_bucket.groupby("nationkey").aggregate(
        Sum("rev_cents", alias_name="rev_cents")
    )
    parts = list(totals.iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "rev_cents": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(parts)
    names = pa.array(
        [nk2name[k] for k in merged.column("nationkey").to_pylist()],
        pa.string(),
    )
    out = pa.table(
        {
            "n_name": names,
            "rev_cents": pc.cast(merged.column("rev_cents"), pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("rev_cents", "descending"),
                       ("n_name", "ascending")],
        )
    )


SQL_REGIONAL_NATION_REVENUE = f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS rev_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{Q5_REGION}'
  AND epoch_us(o_orderdate) >= {Q5_LO_US}
  AND epoch_us(o_orderdate) < {Q5_HI_US}
GROUP BY n_name
ORDER BY rev_cents DESC, n_name
"""


Q4_LATE_US = 90 * DAY_US


def q_late_ship_priority_counts(sf_dir: str):
    """TPC-H Q4 shape: per order priority, how many 1997 orders had at
    least one line item shipped more than 90 days after the order date
    — the correlated EXISTS, rewritten as a per-order max-shipdate
    aggregate (EXISTS(ship > date + 90d) <=> max(ship) > date + 90d).

    Scale composition: lineitem pre-aggregates max(l_shipdate) per
    orderkey INSIDE each batch, so the single bucket shuffle moves at
    most one row per (orderkey, block) instead of every line item;
    bucket_post finishes the per-order max (each bucket holds all of
    its keys' partials), applies the lateness predicate, and counts per
    priority — the final exchange is #buckets x #priorities rows."""
    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def orders_window(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("o_orderdate"), pa.int64())
        keep = pc.and_(
            pc.greater_equal(t_us, pa.scalar(Q5_LO_US, pa.int64())),
            pc.less(t_us, pa.scalar(Q5_HI_US, pa.int64())),
        )
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_date_us": t_us,
                "o_orderpriority": b.column("o_orderpriority"),
            }
        ).filter(keep)

    orders_w = orders.map_batches(
        orders_window, batch_format="pyarrow", zero_copy_batch=True
    )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_max_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "ship_us": pc.cast(b.column("l_shipdate"), pa.int64()),
            }
        )
        g = t.group_by(["o_orderkey"]).aggregate([("ship_us", "max")])
        return g.rename_columns(["o_orderkey", "ship_us"])

    li_partials = li.map_batches(
        li_max_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_post(joined: pa.Table) -> pa.Table:
        g = joined.group_by(
            ["o_orderkey", "o_date_us", "o_orderpriority"]
        ).aggregate([("ship_us", "max")])
        g = g.rename_columns(
            ["o_orderkey", "o_date_us", "o_orderpriority", "ship_us"]
        )
        late = g.filter(
            pc.greater(
                g.column("ship_us"),
                pc.add(g.column("o_date_us"),
                       pa.scalar(Q4_LATE_US, pa.int64())),
            )
        )
        c = late.group_by(["o_orderpriority"]).aggregate(
            [([], "count_all")]
        )
        return c.rename_columns(["o_orderpriority", "n_late_orders"])

    from ..stages.join import hash_join

    per_bucket = hash_join(
        li_partials, orders_w, key="o_orderkey", how="inner",
        bucket_post=bucket_post,
    )
    totals = per_bucket.groupby("o_orderpriority").aggregate(
        Sum("n_late_orders", alias_name="n_late_orders")
    )
    parts = list(totals.iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table(
            {
                "o_orderpriority": pa.array([], pa.string()),
                "n_late_orders": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(parts)
    out = pa.table(
        {
            "o_orderpriority": merged.column("o_orderpriority"),
            "n_late_orders": pc.cast(
                merged.column("n_late_orders"), pa.int64()
            ),
        }
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("o_orderpriority", "ascending")])
    )


SQL_LATE_SHIP_PRIORITY_COUNTS = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders
WHERE epoch_us(o_orderdate) >= {Q5_LO_US}
  AND epoch_us(o_orderdate) < {Q5_HI_US}
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND epoch_us(l_shipdate) > epoch_us(o_orderdate) + {Q4_LATE_US}
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    INCLUDING zero-order customers (LEFT JOIN semantics) — expressed
    without a join: the customer stream contributes one zero marker row
    per custkey, the orders stream contributes per-batch pre-aggregated
    counts, and a single groupby(custkey) sums both — a customer with
    no orders survives the union as n_orders=0, exactly what the outer
    join's null side would produce.

    Scale posture: both shuffles move pre-aggregated rows only (order
    counts collapse inside each batch before the custkey exchange; the
    histogram partials collapse to <= max-orders-per-customer rows per
    block before the tiny final exchange)."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def zero_marker(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "n_orders": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def order_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"c_custkey": b.column("o_custkey")}).group_by(
            ["c_custkey"]
        ).aggregate([([], "count_all")])
        return g.rename_columns(["c_custkey", "n_orders"])

    per_cust = (
        cust.map_batches(
            zero_marker, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(
            orders.map_batches(
                order_partial, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("c_custkey")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        g = b.select(["n_orders"]).group_by(["n_orders"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["n_orders", "n_customers"])

    totals = (
        per_cust.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("n_orders")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )
    parts = list(totals.iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table(
            {
                "n_orders": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(parts)
    out = pa.table(
        {
            "n_orders": pc.cast(merged.column("n_orders"), pa.int64()),
            "n_customers": pc.cast(
                merged.column("n_customers"), pa.int64()
            ),
        }
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("n_orders", "ascending")])
    )


SQL_CUSTOMER_ORDER_DISTRIBUTION = """
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
ORDER BY n_orders
"""


def q_user_top_event_type(sf_dir: str):
    """Grouped mode (argmax aggregate): each user's most frequent event
    type, ties broken by event_type ASC — the top-1-of-counts shape
    that plain groupby aggregates cannot express.

    ONE shuffle total: per-batch partial (user, type) counts collapse
    inside map_batches, the groupby(user) exchange moves only those
    partials, and each group finishes its own count-sum + argmax
    vectorized (sort by n DESC, type ASC; take row 0)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["user_id", "event_type", "n"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def argmax(group: pa.Table) -> pa.Table:
        g = group.group_by(["user_id", "event_type"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["user_id", "event_type", "n"])
        idx = pc.sort_indices(
            g,
            sort_keys=[("n", "descending"), ("event_type", "ascending")],
        )
        top = g.take(idx.slice(0, 1))
        return pa.table(
            {
                "user_id": top.column("user_id"),
                "top_event_type": top.column("event_type"),
                "n_events": pc.cast(top.column("n"), pa.int64()),
            }
        )

    return partials.groupby("user_id").map_groups(
        argmax, batch_format="pyarrow"
    )


SQL_USER_TOP_EVENT_TYPE = """
SELECT user_id, event_type AS top_event_type,
       CAST(n AS BIGINT) AS n_events
FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY count(*) DESC, event_type
         ) AS rn
  FROM events GROUP BY user_id, event_type
)
WHERE rn = 1
"""


Q18_MIN_QTY = 300
Q18_TOPK = 100


def q_large_volume_orders(sf_dir: str):
    """TPC-H Q18 shape: the top orders by total price among orders whose
    summed line-item quantity exceeds Q18_MIN_QTY, with the buying
    customer attached — the HAVING-filtered semi-join into a two-table
    enrichment.

    Scale composition: line items pre-aggregate sum(l_quantity) per
    orderkey INSIDE each batch (quantities are integer-valued, summed
    exactly as int64), one groupby(orderkey) finishes the sums, and the
    HAVING filter cuts the stream to the rare heavy orders BEFORE any
    join — both hash joins then move only those few rows plus the
    projected orders/customer payloads. The customer-side join's
    bucket_post trims each bucket to the global-candidate top Q18_TOPK
    by (price DESC, orderkey ASC), so the driver fold sees at most
    k x #buckets rows regardless of corpus size."""
    from ..stages.hashing import mix_rounds
    from ..stages.join import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def li_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "total_qty": _cents(b.column("l_quantity"), 1.0),
            }
        )
        g = (
            t.group_by(["o_orderkey"])
            .aggregate([("total_qty", "sum")])
            .rename_columns(["o_orderkey", "total_qty"])
        )
        ok = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        bucket = (
            mix_rounds(ok.astype(np.uint64))
            % np.uint64(Q17_NUM_BUCKETS)
        ).astype(np.int64)
        return g.append_column("bucket", pa.array(bucket))

    def heavy_fold(t: pa.Table) -> pa.Table:
        # an orderkey-hash bucket holds every partial of its orders, so
        # the sum AND the HAVING cut finish locally — only the rare
        # heavy rows leave the bucket (a 147k-group sort-aggregate here
        # measured ~10x slower than this 256-bucket fold)
        g = (
            t.select(["o_orderkey", "total_qty"])
            .group_by(["o_orderkey"])
            .aggregate([("total_qty", "sum")])
            .rename_columns(["o_orderkey", "total_qty"])
        )
        return g.filter(
            pc.greater(
                g.column("total_qty"), pa.scalar(Q18_MIN_QTY, pa.int64())
            )
        )

    heavy = (
        li.map_batches(
            li_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(heavy_fold, batch_format="pyarrow")
    )

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def orders_proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "c_custkey": b.column("o_custkey"),
                "o_date_us": pc.cast(b.column("o_orderdate"), pa.int64()),
                "price_cents": _cents(b.column("o_totalprice")),
            }
        )

    # Fast path: the HAVING threshold makes heavy orders rare (~0.1% of
    # orders), so while the heavy set fits the broadcast limit the two
    # enrichment joins collapse into two is_in semi-filter SCANS — no
    # orders/customer shuffle at all. Each orders block trims to the
    # global-candidate top-k before the driver folds <= k x #blocks
    # rows; only the <= k winners' custkeys touch customer.
    heavy_small = _collect_small_side(
        heavy, "o_orderkey", "total_qty", BROADCAST_ROW_LIMIT
    )
    if heavy_small is not None:
        import ray as _ray

        empty = pa.table(
            {
                "c_name": pa.array([], pa.string()),
                "c_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_date_us": pa.array([], pa.int64()),
                "price_cents": pa.array([], pa.int64()),
                "total_qty": pa.array([], pa.int64()),
            }
        )
        heavy_ref = _ray.put(heavy_small)

        def orders_semi(b: pa.Table) -> pa.Table:
            hk, hq = _ray.get(heavy_ref)
            t = orders_proj(b)
            tq = _probe(t.column("o_orderkey"), hk, hq)
            m = t.append_column("total_qty", tq).filter(pc.is_valid(tq))
            idx = pc.sort_indices(
                m,
                sort_keys=[("price_cents", "descending"),
                           ("o_orderkey", "ascending")],
            )
            return m.take(idx.slice(0, Q18_TOPK))

        cand_parts = list(
            orders.map_batches(
                orders_semi, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow")
        )
        if not cand_parts:
            return empty
        # resolve names for ALL candidates (<= k x #blocks rows) and
        # apply the customer inner-join BEFORE the final top-k, so a
        # custkey absent from customer promotes the next order exactly
        # like the join path / the oracle
        cand = pa.concat_tables(cand_parts).combine_chunks()
        cand_keys = cand.column("c_custkey").combine_chunks()

        def cust_semi(b: pa.Table) -> pa.Table:
            m = b.filter(
                pc.is_in(b.column("c_custkey"), value_set=cand_keys)
            )
            return pa.table(
                {
                    "c_custkey": m.column("c_custkey"),
                    "c_name": m.column("c_name"),
                }
            )

        name_parts = list(
            _read(sf_dir, "customer", ["c_custkey", "c_name"])
            .map_batches(
                cust_semi, batch_format="pyarrow", zero_copy_batch=True
            )
            .iter_batches(batch_format="pyarrow")
        )
        if not name_parts:
            return empty
        names = pa.concat_tables(name_parts)
        nm = _probe(
            cand_keys,
            names.column("c_custkey").combine_chunks(),
            names.column("c_name").combine_chunks(),
        )
        resolved = cand.append_column("c_name", nm).filter(
            pc.is_valid(nm)
        )
        idx = pc.sort_indices(
            resolved,
            sort_keys=[("price_cents", "descending"),
                       ("o_orderkey", "ascending")],
        )
        top = resolved.take(idx.slice(0, Q18_TOPK))
        return top.select(
            ["c_name", "c_custkey", "o_orderkey", "o_date_us",
             "price_cents", "total_qty"]
        )

    enriched = hash_join(
        heavy,
        orders.map_batches(
            orders_proj, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="o_orderkey",
        how="inner",
    )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def bucket_trim(joined: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            joined,
            sort_keys=[("price_cents", "descending"),
                       ("o_orderkey", "ascending")],
        )
        return joined.take(idx.slice(0, Q18_TOPK))

    named = hash_join(
        enriched, cust, key="c_custkey", how="inner",
        bucket_post=bucket_trim,
    )
    parts = list(named.iter_batches(batch_format="pyarrow"))
    cols = ["c_name", "c_custkey", "o_orderkey", "o_date_us",
            "price_cents", "total_qty"]
    if not parts:
        return pa.table(
            {
                "c_name": pa.array([], pa.string()),
                "c_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_date_us": pa.array([], pa.int64()),
                "price_cents": pa.array([], pa.int64()),
                "total_qty": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(
        [p.select(cols) for p in parts]
    ).combine_chunks()
    idx = pc.sort_indices(
        merged,
        sort_keys=[("price_cents", "descending"),
                   ("o_orderkey", "ascending")],
    )
    return merged.take(idx.slice(0, Q18_TOPK))


SQL_LARGE_VOLUME_ORDERS = f"""
SELECT c_name, c_custkey, o_orderkey,
       epoch_us(o_orderdate) AS o_date_us,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {Q18_MIN_QTY})
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY price_cents DESC, o_orderkey
LIMIT {Q18_TOPK}
"""


def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 shape: per market segment, the count and total balance
    of customers holding an above-average positive account balance who
    placed NO orders in the 1997 window — the scalar-subquery filter
    plus NOT-EXISTS anti-join.

    Exactness: the average is never computed as a float — a customer is
    "rich" iff bal_cents * n_pos > sum_pos_cents (integer
    cross-multiplication), which the DuckDB oracle reproduces exactly
    in BIGINT math.

    Scale composition: the global (sum, count) over positive balances
    folds two-phase (one two-int partial per block; the driver sees two
    scalars). The anti-join is the bucket hash_join in left-outer mode:
    the rich-customer stream joins per-batch pre-aggregated 1997 order
    counts, and each bucket finishes its own null-side filter (idle =
    zero non-null matches) plus segment partials — the final exchange
    is #buckets x #segments rows."""
    from ..stages.join import hash_join

    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]
    )

    def pos_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("c_acctbal"))
        pos = pc.filter(cents, pc.greater(cents, pa.scalar(0, pa.int64())))
        s = pc.sum(pos).as_py() or 0
        return pa.table(
            {
                "sum_pos": pa.array([s], pa.int64()),
                "n_pos": pa.array([len(pos)], pa.int64()),
            }
        )

    stats = cust.map_batches(
        pos_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    sum_pos = 0
    n_pos = 0
    for p in stats.iter_batches(batch_format="pyarrow"):
        sum_pos += pc.sum(p.column("sum_pos")).as_py() or 0
        n_pos += pc.sum(p.column("n_pos")).as_py() or 0

    def rich_only(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("c_acctbal"))
        t = pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_mktsegment": b.column("c_mktsegment"),
                "bal_cents": cents,
            }
        )
        return t.filter(
            pc.greater(
                pc.multiply(cents, pa.scalar(n_pos, pa.int64())),
                pa.scalar(sum_pos, pa.int64()),
            )
        )

    rich = cust.map_batches(
        rich_only, batch_format="pyarrow", zero_copy_batch=True
    )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def order_partial(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("o_orderdate"), pa.int64())
        keep = pc.and_(
            pc.greater_equal(t_us, pa.scalar(Q5_LO_US, pa.int64())),
            pc.less(t_us, pa.scalar(Q5_HI_US, pa.int64())),
        )
        g = pa.table(
            {"c_custkey": pc.filter(b.column("o_custkey"), keep)}
        ).group_by(["c_custkey"]).aggregate([([], "count_all")])
        return g.rename_columns(["c_custkey", "n_orders"])

    counts = orders.map_batches(
        order_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_post(joined: pa.Table) -> pa.Table:
        g = joined.group_by(
            ["c_custkey", "c_mktsegment", "bal_cents"]
        ).aggregate([("n_orders", "count")])
        g = g.rename_columns(
            ["c_custkey", "c_mktsegment", "bal_cents", "n_matches"]
        )
        idle = g.filter(
            pc.equal(g.column("n_matches"), pa.scalar(0, pa.int64()))
        )
        seg = idle.group_by(["c_mktsegment"]).aggregate(
            [([], "count_all"), ("bal_cents", "sum")]
        )
        return seg.rename_columns(
            ["c_mktsegment", "n_customers", "bal_cents"]
        )

    per_bucket = hash_join(
        rich, counts, key="c_custkey", how="left outer",
        bucket_post=bucket_post,
    )
    totals = per_bucket.groupby("c_mktsegment").aggregate(
        Sum("n_customers", alias_name="n_customers"),
        Sum("bal_cents", alias_name="bal_cents"),
    )
    parts = list(totals.iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table(
            {
                "c_mktsegment": pa.array([], pa.string()),
                "n_customers": pa.array([], pa.int64()),
                "bal_cents": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(parts)
    out = pa.table(
        {
            "c_mktsegment": merged.column("c_mktsegment"),
            "n_customers": pc.cast(merged.column("n_customers"), pa.int64()),
            "bal_cents": pc.cast(merged.column("bal_cents"), pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("c_mktsegment", "ascending")])
    )


SQL_IDLE_RICH_CUSTOMERS = f"""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM customer
WHERE CAST(round(c_acctbal * 100) AS BIGINT)
      * (SELECT count(*) FROM customer
         WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0)
    > (SELECT coalesce(sum(CAST(round(c_acctbal * 100) AS BIGINT)), 0)
       FROM customer
       WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND epoch_us(o_orderdate) >= {Q5_LO_US}
          AND epoch_us(o_orderdate) < {Q5_HI_US})
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_small_quantity_part_revenue(sf_dir: str):
    """TPC-H Q17 shape: total revenue (and item count) of line items
    whose quantity is below 20% of their part's average quantity — the
    correlated per-group average applied back to the fact stream.

    Exactness: no float average — the predicate qty < 0.2 * avg is the
    integer cross-multiplication 5 * qty * cnt_part < sum_qty_part
    (quantities are integer-valued), bit-reproducible in the oracle.

    Scale composition (single read, single narrow shuffle, NO join):
    quantities are a tiny discrete domain, so each batch collapses to
    (partkey, qty) grain carrying (n, price_sum, qty*n) partials —
    <= 50 rows per part per block — and rows route to partkey-hash
    buckets. Each bucket holds every surviving grain of its parts, so
    the per-part totals AND the correlated predicate finish locally in
    two vectorized kernels; the bucket emits ONE row and the driver
    folds #buckets rows into the single-row answer. The fact stream is
    never re-read and no row-grain data crosses the exchange."""
    from ..stages.hashing import mix_rounds

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def grain_partial(b: pa.Table) -> pa.Table:
        qty = _cents(b.column("l_quantity"), 1.0)
        t = pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "qty": qty,
                "price_cents": _cents(b.column("l_extendedprice")),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["l_partkey", "qty"]).aggregate(
            [("price_cents", "sum"), ("n", "sum")]
        ).rename_columns(["l_partkey", "qty", "price_cents", "n"])
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        bucket = (
            mix_rounds(pk.astype(np.uint64))
            % np.uint64(Q17_NUM_BUCKETS)
        ).astype(np.int64)
        return g.append_column("bucket", pa.array(bucket))

    def bucket_fold(t: pa.Table) -> pa.Table:
        qn = pc.multiply(t.column("qty"), t.column("n"))
        per_part = (
            pa.table(
                {
                    "pk": t.column("l_partkey"),
                    "sum_qty": qn,
                    "cnt": t.column("n"),
                }
            )
            .group_by(["pk"])
            .aggregate([("sum_qty", "sum"), ("cnt", "sum")])
            .rename_columns(["pk", "sum_qty", "cnt"])
        )
        idx = pc.index_in(
            t.column("l_partkey"),
            value_set=per_part.column("pk").combine_chunks(),
        )
        cnt = pc.take(per_part.column("cnt").combine_chunks(), idx)
        sq = pc.take(per_part.column("sum_qty").combine_chunks(), idx)
        keep = pc.less(
            pc.multiply(
                pc.multiply(t.column("qty"), pa.scalar(5, pa.int64())),
                cnt,
            ),
            sq,
        )
        m = t.filter(keep)
        rev = pc.sum(m.column("price_cents")).as_py() or 0
        n_items = pc.sum(m.column("n")).as_py() or 0
        return pa.table(
            {
                "revenue_cents": pa.array([rev], pa.int64()),
                "n_items": pa.array([n_items], pa.int64()),
            }
        )

    per_bucket = (
        li.map_batches(
            grain_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pyarrow")
    )
    revenue = 0
    n_items = 0
    for p in per_bucket.iter_batches(batch_format="pyarrow"):
        revenue += pc.sum(p.column("revenue_cents")).as_py() or 0
        n_items += pc.sum(p.column("n_items")).as_py() or 0
    return pa.table(
        {
            "revenue_cents": pa.array([revenue], pa.int64()),
            "n_items": pa.array([n_items], pa.int64()),
        }
    )


Q17_NUM_BUCKETS = 256


def _keyed_bucket_fold(partials, key_col: str, fold, nbuckets: int =
                       Q17_NUM_BUCKETS):
    """Finish a per-key aggregation by routing pre-aggregated partial
    rows to key-hash buckets and folding each bucket with ONE
    vectorized arrow kernel call — measured ~10x faster than Ray's
    sort-based groupby once keys reach ~100k distinct values (see
    q_large_volume_orders). Queries whose partial map already knows the
    key can fuse the bucket column there instead (q_small_quantity_
    part_revenue) and skip this extra map_batches."""
    from ..stages.hashing import mix_rounds

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        bucket = (
            mix_rounds(k.astype(np.uint64)) % np.uint64(nbuckets)
        ).astype(np.int64)
        return b.append_column("bucket", pa.array(bucket))

    def fold_wo_bucket(t: pa.Table) -> pa.Table:
        return fold(t.drop_columns(["bucket"]))

    return (
        partials.map_batches(
            add_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(fold_wo_bucket, batch_format="pyarrow")
    )


PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_user_event_type_pivot(sf_dir: str):
    """PIVOT shape: one row per user with one count column per event
    type (SQL count(*) FILTER (WHERE ...)) — the wide conditional
    aggregate. The pivoted domain is the five fixed event types; an
    unseen type still yields the user's row with all-zero counts, like
    the FILTER oracle.

    Scale composition: each batch collapses to per-user partial rows
    (five vectorized equality kernels + one arrow group_by), then the
    user-hash bucket fold finishes the sums — user_id is unbounded
    cardinality, exactly the case where the bucket fold beats a sort
    groupby."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    ncols = [f"n_{et}" for et in PIVOT_EVENT_TYPES]

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("user_id")))
        cols = {"user_id": b.column("user_id")}
        for et, nc in zip(PIVOT_EVENT_TYPES, ncols):
            cols[nc] = pc.cast(
                pc.equal(b.column("event_type"), pa.scalar(et)),
                pa.int64(),
            )
        g = pa.table(cols).group_by(["user_id"]).aggregate(
            [(nc, "sum") for nc in ncols]
        )
        return g.rename_columns(["user_id", *ncols])

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id"]).aggregate(
            [(nc, "sum") for nc in ncols]
        )
        return g.rename_columns(["user_id", *ncols])

    return _keyed_bucket_fold(
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "user_id",
        fold,
    )


SQL_USER_EVENT_TYPE_PIVOT = f"""
SELECT user_id,
       {", ".join(
           f"CAST(count(*) FILTER (WHERE event_type = '{et}')"
           f" AS BIGINT) AS n_{et}"
           for et in PIVOT_EVENT_TYPES
       )}
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
"""


def q_order_growth_by_quarter(sf_dir: str):
    """Calendar rollup + analytic lag: order count and revenue per
    (year, quarter), with each quarter's revenue delta vs the previous
    quarter — the time-series reporting shape (window function OVER an
    aggregate, not over the fact stream).

    Scale composition: per-batch partials collapse to quarter grain, so
    the one groupby moves O(#quarters) rows per block; the lag runs on
    the driver over a table bounded by CALENDAR TIME, not data size
    (first quarter's delta coalesces to 0, like the oracle)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate")
        qkey = pc.add(
            pc.multiply(pc.cast(pc.year(ts), pa.int64()),
                        pa.scalar(10, pa.int64())),
            pc.cast(pc.quarter(ts), pa.int64()),
        )
        t = pa.table(
            {
                "qkey": qkey,
                "n_orders": pa.array(np.ones(b.num_rows, np.int64)),
                "rev_cents": _cents(b.column("o_totalprice")),
            }
        )
        g = t.group_by(["qkey"]).aggregate(
            [("n_orders", "sum"), ("rev_cents", "sum")]
        )
        return g.rename_columns(["qkey", "n_orders", "rev_cents"])

    agg = (
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("qkey")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("rev_cents", alias_name="rev_cents"),
        )
    )
    parts = list(agg.iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table(
            {
                "qkey": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
                "rev_cents": pa.array([], pa.int64()),
                "rev_delta_cents": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(parts).combine_chunks()
    t = t.take(pc.sort_indices(t, sort_keys=[("qkey", "ascending")]))
    rev = pc.cast(t.column("rev_cents"), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    delta = np.empty_like(rev)
    delta[0] = 0
    np.subtract(rev[1:], rev[:-1], out=delta[1:])
    return pa.table(
        {
            "qkey": t.column("qkey"),
            "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
            "rev_cents": pa.array(rev),
            "rev_delta_cents": pa.array(delta),
        }
    )


SQL_ORDER_GROWTH_BY_QUARTER = """
WITH q AS (
  SELECT CAST(year(o_orderdate) * 10 + quarter(o_orderdate)
              AS BIGINT) AS qkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
)
SELECT qkey, n_orders, rev_cents,
       CAST(coalesce(rev_cents - lag(rev_cents) OVER (ORDER BY qkey), 0)
            AS BIGINT) AS rev_delta_cents
FROM q
ORDER BY qkey
"""


SQL_SMALL_QUANTITY_PART_REVENUE = """
SELECT CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)),
                     0) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN (
  SELECT l_partkey AS pk,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
) t ON l.l_partkey = t.pk
WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * t.cnt < t.sum_qty
"""


def q_customer_balance_ranks(sf_dir: str):
    """Per-row analytic window function over the whole table: every
    customer's RANK() by account balance (ties share a rank, SQL rank
    semantics) — the full-table OVER (ORDER BY ...) shape.

    Scale composition: rank(x) = 1 + #rows with balance < x, so ONE
    pre-aggregated groupby builds the balance histogram — whose size is
    bounded by the number of DISTINCT cent values (itself bounded by
    the balance range, ~1.1M entries at any corpus size, ~18 MB), NOT
    by row count — and the sorted (value, base_rank) pair broadcasts
    once via ray.put; every batch then resolves its ranks with one
    vectorized searchsorted. No sort of the data, no per-row state."""
    import ray as _ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def hist_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"bal_cents": _cents(b.column("c_acctbal"))}).group_by(
            ["bal_cents"]
        ).aggregate([([], "count_all")])
        return g.rename_columns(["bal_cents", "cnt"])

    hist = (
        cust.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bal_cents")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    vals_parts = []
    cnt_parts = []
    for p in hist.iter_batches(batch_format="pyarrow"):
        vals_parts.append(
            p.column("bal_cents").to_numpy(zero_copy_only=False)
        )
        cnt_parts.append(
            pc.cast(p.column("cnt"), pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
    if not vals_parts:
        return pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "bal_cents": pa.array([], pa.int64()),
                "bal_rank": pa.array([], pa.int64()),
            }
        )
    vals = np.concatenate(vals_parts)
    cnts = np.concatenate(cnt_parts)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    base = np.empty_like(cnts)
    base[0] = 1
    np.cumsum(cnts[:-1], out=base[1:])
    base[1:] += 1
    lookup_ref = _ray.put(
        pa.table({"v": pa.array(vals), "r": pa.array(base)})
    )

    def assign_rank(b: pa.Table) -> pa.Table:
        lk = _ray.get(lookup_ref)
        v = lk.column("v").to_numpy(zero_copy_only=False)
        r = lk.column("r").to_numpy(zero_copy_only=False)
        cents = _cents(b.column("c_acctbal")).to_numpy(
            zero_copy_only=False
        )
        idx = np.searchsorted(v, cents)
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "bal_cents": pa.array(cents),
                "bal_rank": pa.array(r[idx]),
            }
        )

    return cust.map_batches(
        assign_rank, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_CUSTOMER_BALANCE_RANKS = """
SELECT c_custkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
       CAST(rank() OVER (
         ORDER BY CAST(round(c_acctbal * 100) AS BIGINT)
       ) AS BIGINT) AS bal_rank
FROM customer
"""


def _rev_cents(b: pa.Table) -> pa.Array:
    """extendedprice * (1 - discount) in integer cents, SQL round()."""
    return _cents(
        pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
    )


def q_promo_revenue_share(sf_dir: str):
    """TPC-H Q14 shape: per ship-month, the promo-part slice of revenue
    next to total revenue (the conditional-aggregate ratio, emitted as
    two BIGINT cent sums so the ratio is exact on the reader's side).

    Scale composition: part is dimension-sized, so (partkey -> is_promo)
    broadcasts once via ray.put and every lineitem batch resolves the
    flag with one vectorized index_in probe, then collapses to at most
    one (month, promo, total) row per month per batch — the only
    shuffle is the final O(#months) groupby. Past BROADCAST_ROW_LIMIT
    the same plan runs as a bucket hash_join whose bucket_post emits
    the identical per-month partials."""
    import ray as _ray

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def month_partial(t: pa.Table) -> pa.Table:
        # t: ship_month, rev_cents, promo (int64 0/1)
        g = t.group_by(["ship_month"]).aggregate(
            [("promo_cents", "sum"), ("rev_cents", "sum")]
        )
        return g.rename_columns(["ship_month", "promo_cents",
                                 "total_cents"])

    small = _collect_small_side(
        part, "p_partkey", "p_type", BROADCAST_ROW_LIMIT
    )
    if small is not None:
        part_ref = _ray.put(small)

        def probe_collapse(b: pa.Table) -> pa.Table:
            keys_arr, vals_arr = _ray.get(part_ref)
            ptype = _probe(b.column("l_partkey"), keys_arr, vals_arr)
            rev = _rev_cents(b)
            promo = pc.cast(
                pc.equal(ptype, pa.scalar("PROMO")), pa.int64()
            )
            t = pa.table(
                {
                    "ship_month": pc.strftime(
                        b.column("l_shipdate"), format="%Y-%m"
                    ),
                    "promo_cents": pc.multiply(rev, promo),
                    "rev_cents": rev,
                }
            ).filter(pc.is_valid(ptype))  # inner-join semantics
            return month_partial(t)

        partials = li.map_batches(
            probe_collapse, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        from ..stages.join import hash_join

        def li_proj(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_partkey": b.column("l_partkey"),
                    "ship_month": pc.strftime(
                        b.column("l_shipdate"), format="%Y-%m"
                    ),
                    "rev_cents": _rev_cents(b),
                }
            )

        def part_proj(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "p_partkey": b.column("p_partkey"),
                    "promo": pc.cast(
                        pc.equal(b.column("p_type"), pa.scalar("PROMO")),
                        pa.int64(),
                    ),
                }
            ).rename_columns(["l_partkey", "promo"])

        def bucket_post(joined: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "ship_month": joined.column("ship_month"),
                    "promo_cents": pc.multiply(
                        joined.column("rev_cents"), joined.column("promo")
                    ),
                    "rev_cents": joined.column("rev_cents"),
                }
            )
            return month_partial(t)

        partials = hash_join(
            li.map_batches(
                li_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            part.map_batches(
                part_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            key="l_partkey",
            how="inner",
            bucket_post=bucket_post,
        )

    out = (
        partials.groupby("ship_month")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .sort("ship_month")
    )

    def final_cast(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ship_month": b.column("ship_month"),
                "promo_cents": pc.cast(b.column("promo_cents"),
                                       pa.int64()),
                "total_cents": pc.cast(b.column("total_cents"),
                                       pa.int64()),
            }
        )

    return out.map_batches(
        final_cast, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_PROMO_REVENUE_SHARE = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS total_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY ship_month
ORDER BY ship_month
"""


Q15_LO_US = 852_076_800_000_000  # 1997-01-01 epoch microseconds
Q15_HI_US = 859_852_800_000_000  # 1997-04-01


def q_top_supplier_revenue(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the global maximum — aggregate, take a scalar max OF the aggregate,
    filter the aggregate by it (the create-view + subquery-max form).

    Scale composition: per-supplier partials collapse inside each batch
    so the one shuffle is supplier-grain; the materialized totals are
    dimension-sized by nature. The global max is the ONE scalar the
    driver reads; winners (ties only) are a tiny table, and their names
    resolve by scanning supplier with an is_in semi-filter — no
    supplier-sized structure ever lands on the driver."""
    li = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def supp_partial(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("l_shipdate"), pa.int64())
        keep = pc.and_(
            pc.greater_equal(t_us, pa.scalar(Q15_LO_US, pa.int64())),
            pc.less(t_us, pa.scalar(Q15_HI_US, pa.int64())),
        )
        w = b.filter(keep)
        t = pa.table(
            {
                "l_suppkey": w.column("l_suppkey"),
                "rev_cents": _rev_cents(w),
            }
        )
        g = t.group_by(["l_suppkey"]).aggregate([("rev_cents", "sum")])
        return g.rename_columns(["l_suppkey", "rev_cents"])

    totals = (
        li.map_batches(
            supp_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("l_suppkey")
        .aggregate(Sum("rev_cents", alias_name="rev_cents"))
        .materialize()
    )
    empty = pa.table(
        {
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "rev_cents": pa.array([], pa.int64()),
        }
    )
    if totals.count() == 0:
        return empty
    gmax = int(totals.max("rev_cents"))

    def winners_only(b: pa.Table) -> pa.Table:
        m = b.filter(
            pc.equal(
                pc.cast(b.column("rev_cents"), pa.int64()),
                pa.scalar(gmax, pa.int64()),
            )
        )
        return pa.table(
            {
                "s_suppkey": m.column("l_suppkey"),
                "rev_cents": pc.cast(m.column("rev_cents"), pa.int64()),
            }
        )

    win_parts = list(
        totals.map_batches(
            winners_only, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    )
    if not win_parts:
        return empty
    winners = pa.concat_tables(win_parts)  # ties only: tiny by nature
    win_keys = winners.column("s_suppkey").combine_chunks()

    def name_filter(b: pa.Table) -> pa.Table:
        m = b.filter(pc.is_in(b.column("s_suppkey"), value_set=win_keys))
        return pa.table(
            {
                "s_suppkey": m.column("s_suppkey"),
                "s_name": m.column("s_name"),
            }
        )

    name_parts = list(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(
            name_filter, batch_format="pyarrow", zero_copy_batch=True
        )
        .iter_batches(batch_format="pyarrow")
    )
    names = (
        pa.concat_tables(name_parts)
        if name_parts
        else pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
            }
        )
    )
    nm = _probe(
        win_keys,
        names.column("s_suppkey").combine_chunks(),
        names.column("s_name").combine_chunks(),
    )
    out = pa.table(
        {
            "s_suppkey": win_keys,
            "s_name": nm,
            "rev_cents": winners.column("rev_cents"),
        }
    ).filter(pc.is_valid(nm))  # inner-join semantics
    return out.take(pc.sort_indices(out, sort_keys=[("s_suppkey",
                                                     "ascending")]))


SQL_TOP_SUPPLIER_REVENUE = f"""
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE epoch_us(l_shipdate) >= {Q15_LO_US}
    AND epoch_us(l_shipdate) < {Q15_HI_US}
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_cents
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE rev_cents = (SELECT max(rev_cents) FROM r)
ORDER BY s_suppkey
"""


# Q19-style disjunctive predicate: three (brand, size-range, qty-range)
# conjunctions OR'd together (brands exist in the synthetic part table).
Q19_ARMS = [
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#7", 1, 15, 20, 30),
]


def q_brand_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue under a DISJUNCTION of per-arm
    (brand equality x part-size range x quantity range) conjunctions —
    the multi-arm compound predicate that defeats naive pushdown.

    Scale composition: part's two predicate attributes broadcast once
    (dimension-sized; hash_join bucket_post fallback past the limit);
    each lineitem batch resolves brand/size with two vectorized probes
    and evaluates all three arms as Arrow boolean kernels — no python
    row loop, and the batch collapses to ONE (revenue, count) partial
    row, so nothing shuffles at all in the broadcast path."""
    import ray as _ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def arms_mask(brand: pa.Array, size: pa.Array,
                  qty: pa.Array) -> pa.Array:
        m = None
        for bname, slo, shi, qlo, qhi in Q19_ARMS:
            arm = pc.and_(
                pc.and_(
                    pc.equal(brand, pa.scalar(bname)),
                    pc.and_(
                        pc.greater_equal(size,
                                         pa.scalar(slo, pa.int64())),
                        pc.less_equal(size, pa.scalar(shi, pa.int64())),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(qty, pa.scalar(qlo, pa.int64())),
                    pc.less_equal(qty, pa.scalar(qhi, pa.int64())),
                ),
            )
            m = arm if m is None else pc.or_(m, arm)
        return m

    def one_row(rev: int, n: int) -> pa.Table:
        return pa.table(
            {
                "b": pa.array([0], pa.int64()),
                "revenue_cents": pa.array([rev], pa.int64()),
                "n_items": pa.array([n], pa.int64()),
            }
        )

    small_brand = _collect_small_side(
        part, "p_partkey", "p_brand", BROADCAST_ROW_LIMIT
    )
    if small_brand is not None:
        small_size = _collect_small_side(
            part, "p_partkey", "p_size", BROADCAST_ROW_LIMIT
        )
        ref = _ray.put(
            (small_brand[0], small_brand[1],
             pc.cast(small_size[1], pa.int64()))
        )

        def probe_arms(b: pa.Table) -> pa.Table:
            keys_arr, brand_arr, size_arr = _ray.get(ref)
            idx = pc.index_in(b.column("l_partkey"), value_set=keys_arr)
            brand = pc.take(brand_arr, idx)
            size = pc.take(size_arr, idx)
            qty = _cents(b.column("l_quantity"), 1.0)
            keep = pc.and_(pc.is_valid(brand),
                           arms_mask(brand, size, qty))
            m = b.filter(pc.fill_null(keep, False))
            rev = pc.sum(_cents(m.column("l_extendedprice"))).as_py() or 0
            return one_row(rev, m.num_rows)

        partials = li.map_batches(
            probe_arms, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        from ..stages.join import hash_join

        def li_proj(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_partkey": b.column("l_partkey"),
                    "qty": _cents(b.column("l_quantity"), 1.0),
                    "price_cents": _cents(b.column("l_extendedprice")),
                }
            )

        def part_proj(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_partkey": b.column("p_partkey"),
                    "p_brand": b.column("p_brand"),
                    "p_size": pc.cast(b.column("p_size"), pa.int64()),
                }
            )

        def bucket_post(joined: pa.Table) -> pa.Table:
            keep = arms_mask(
                joined.column("p_brand"),
                joined.column("p_size"),
                joined.column("qty"),
            )
            m = joined.filter(keep)
            rev = pc.sum(m.column("price_cents")).as_py() or 0
            return one_row(rev, m.num_rows)

        partials = hash_join(
            li.map_batches(
                li_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            part.map_batches(
                part_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            key="l_partkey",
            how="inner",
            bucket_post=bucket_post,
        )

    revenue = 0
    n_items = 0
    for p in partials.iter_batches(batch_format="pyarrow"):
        revenue += pc.sum(p.column("revenue_cents")).as_py() or 0
        n_items += pc.sum(p.column("n_items")).as_py() or 0
    return pa.table(
        {
            "revenue_cents": pa.array([revenue], pa.int64()),
            "n_items": pa.array([n_items], pa.int64()),
        }
    )


def _q19_arm_sql(arm) -> str:
    bname, slo, shi, qlo, qhi = arm
    return (
        f"(p_brand = '{bname}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND CAST(round(l_quantity) AS BIGINT)"
        f" BETWEEN {qlo} AND {qhi})"
    )


SQL_BRAND_DISJUNCTIVE_REVENUE = f"""
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)),
                     0) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {" OR ".join(_q19_arm_sql(a) for a in Q19_ARMS)}
"""


Q21_LATE_LAG_US = 7_776_000_000_000  # 90 days in microseconds
Q21_TOPK = 20


def q_lonely_late_suppliers(sf_dir: str):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper in a
    finished multi-supplier order — the EXISTS(other supplier) +
    NOT EXISTS(other LATE supplier) double-correlated self-join,
    re-expressed as per-order counting ("late" = shipped more than 90
    days after the order date; the synthetic schema has no
    commit/receipt dates).

    Scale composition: ONE lineitem x orders bucket join; because a
    bucket co-locates every row of its orderkeys, bucket_post finishes
    the whole correlated cascade locally — per-(order,supplier) late
    flags, per-order supplier/late-supplier counts, an in-bucket
    index_in rejoin, and a per-supplier count partial — so the second
    exchange is supplier-grain. The final top-k trims per block before
    the driver folds <= k x #blocks rows, and winner names resolve by
    an is_in semi-filter scan of supplier (nothing supplier-sized on
    the driver)."""
    from ..stages.join import hash_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderstatus"])

    def li_proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "ship_us": pc.cast(b.column("l_shipdate"), pa.int64()),
            }
        )

    def orders_proj(b: pa.Table) -> pa.Table:
        m = b.filter(pc.equal(b.column("o_orderstatus"), pa.scalar("F")))
        return pa.table(
            {
                "l_orderkey": m.column("o_orderkey"),
                "odate_us": pc.cast(m.column("o_orderdate"), pa.int64()),
            }
        )

    def bucket_post(joined: pa.Table) -> pa.Table:
        late = pc.cast(
            pc.greater(
                joined.column("ship_us"),
                pc.add(joined.column("odate_us"),
                       pa.scalar(Q21_LATE_LAG_US, pa.int64())),
            ),
            pa.int64(),
        )
        per_os = (
            pa.table(
                {
                    "ok": joined.column("l_orderkey"),
                    "sk": joined.column("l_suppkey"),
                    "late": late,
                }
            )
            .group_by(["ok", "sk"])
            .aggregate([("late", "max")])
            .rename_columns(["ok", "sk", "late"])
        )
        per_o = (
            per_os.group_by(["ok"])
            .aggregate([([], "count_all"), ("late", "sum")])
            .rename_columns(["ok", "n_supp", "n_late"])
        )
        idx = pc.index_in(per_os.column("ok"),
                          value_set=per_o.column("ok").combine_chunks())
        n_supp = pc.take(per_o.column("n_supp").combine_chunks(), idx)
        n_late = pc.take(per_o.column("n_late").combine_chunks(), idx)
        qual = per_os.filter(
            pc.and_(
                pc.equal(per_os.column("late"), pa.scalar(1, pa.int64())),
                pc.and_(
                    pc.greater(n_supp, pa.scalar(1, pa.int64())),
                    pc.equal(n_late, pa.scalar(1, pa.int64())),
                ),
            )
        )
        g = (
            pa.table(
                {
                    "s_suppkey": qual.column("sk"),
                    "numwait": pa.array(
                        np.ones(qual.num_rows, np.int64)
                    ),
                }
            )
            .group_by(["s_suppkey"])
            .aggregate([("numwait", "sum")])
        )
        return g.rename_columns(["s_suppkey", "numwait"])

    per_bucket = hash_join(
        li.map_batches(li_proj, batch_format="pyarrow",
                       zero_copy_batch=True),
        orders.map_batches(orders_proj, batch_format="pyarrow",
                           zero_copy_batch=True),
        key="l_orderkey",
        how="inner",
        bucket_post=bucket_post,
    )
    totals = per_bucket.groupby("s_suppkey").aggregate(
        Sum("numwait", alias_name="numwait")
    )

    def local_topk(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "s_suppkey": b.column("s_suppkey"),
                "numwait": pc.cast(b.column("numwait"), pa.int64()),
            }
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[("numwait", "descending"),
                       ("s_suppkey", "ascending")],
        )
        return t.take(idx[:Q21_TOPK])

    parts = list(
        totals.map_batches(
            local_topk, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    )
    empty = pa.table(
        {
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "numwait": pa.array([], pa.int64()),
        }
    )
    if not parts:
        return empty
    folded = pa.concat_tables(parts)  # <= k x #blocks rows
    idx = pc.sort_indices(
        folded,
        sort_keys=[("numwait", "descending"), ("s_suppkey", "ascending")],
    )
    top = folded.take(idx[:Q21_TOPK])
    win_keys = top.column("s_suppkey").combine_chunks()

    def name_filter(b: pa.Table) -> pa.Table:
        m = b.filter(pc.is_in(b.column("s_suppkey"), value_set=win_keys))
        return pa.table(
            {
                "s_suppkey": m.column("s_suppkey"),
                "s_name": m.column("s_name"),
            }
        )

    name_parts = list(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(name_filter, batch_format="pyarrow",
                     zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    )
    if not name_parts:
        return empty
    names = pa.concat_tables(name_parts)
    nm = _probe(
        win_keys,
        names.column("s_suppkey").combine_chunks(),
        names.column("s_name").combine_chunks(),
    )
    return pa.table(
        {
            "s_suppkey": win_keys,
            "s_name": nm,
            "numwait": top.column("numwait"),
        }
    ).filter(pc.is_valid(nm))


SQL_LONELY_LATE_SUPPLIERS = f"""
WITH f AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN epoch_us(l_shipdate)
                       > epoch_us(o_orderdate) + {Q21_LATE_LAG_US}
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
  FROM f GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM f
JOIN o USING (l_orderkey)
JOIN supplier ON s_suppkey = f.l_suppkey
WHERE f.late = 1 AND o.n_supp > 1 AND o.n_late = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT {Q21_TOPK}
"""


QUANTILES_BY_TYPE = [("p25", 0.25), ("p50", 0.50), ("p90", 0.90)]


def q_value_quantiles_by_type(sf_dir: str):
    """EXACT per-group quantiles (p25/p50/p90 of events.value per
    event_type) via grouped histogram refinement — no sort, no
    one-group-fits-in-memory assumption (stages/sketch.py
    grouped_rank_select). Each refinement pass is a map_batches
    partial-count + tiny driver merge; a skewed group refines in
    log_bins(n) passes instead of shipping its whole value set to one
    map_groups task."""
    from ..stages.sketch import grouped_rank_select

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_rank_select(
        ds, "event_type", "value", QUANTILES_BY_TYPE
    )


SQL_VALUE_QUANTILES_BY_TYPE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*)    OVER (PARTITION BY event_type) AS n
  FROM events
  WHERE value IS NOT NULL AND isfinite(value)
)
SELECT event_type, q, value
FROM ranked
JOIN (VALUES ('p25', 0.25), ('p50', 0.50), ('p90', 0.90)) AS quants(q, f)
  ON rn = greatest(CAST(ceil(f * n) AS BIGINT), 1)
"""


VALUE_BUCKETS = [0.0, 10.0, 25.0, 50.0, 100.0, 250.0, 1000.0]


def q_events_value_ranges(sf_dir: str):
    """Range join against a small static bucket table (broadcast): count
    events whose value falls in [lo, hi)."""
    ds = _read(sf_dir, "events", ["value"])
    edges = VALUE_BUCKETS

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column("value").to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(np.array(edges), vals, side="right") - 1
        mask = (bucket >= 0) & (bucket < len(edges) - 1)
        t = pa.table(
            {"bucket": pa.array(bucket[mask].astype("int64"), pa.int64())}
        )
        g = t.group_by(["bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["bucket", "n"])

    return _two_phase_sum(ds, ["bucket"], partial, ["n"])


_BUCKET_ROWS = ", ".join(
    f"({i}, {lo}, {hi})"
    for i, (lo, hi) in enumerate(zip(VALUE_BUCKETS, VALUE_BUCKETS[1:]))
)
SQL_EVENTS_VALUE_RANGES = f"""
SELECT b.bucket, count(*) AS n
FROM events e
JOIN (VALUES {_BUCKET_ROWS}) AS b(bucket, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.bucket
"""


def q_union_distinct_orderkeys(sf_dir: str):
    """UNION + global distinct count, two-phase: per-batch distinct, one
    shuffled groupby over pre-deduped keys, then a count aggregate."""
    o = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        lambda b: b.rename_columns(["k"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        lambda b: b.rename_columns(["k"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def distinct(b: pa.Table) -> pa.Table:
        return b.group_by(["k"]).aggregate([])

    deduped = o.union(li).map_batches(distinct, batch_format="pyarrow")
    n = deduped.groupby("k").count().count()
    return pa.table({"n_keys": pa.array([n], pa.int64())})


SQL_UNION_DISTINCT_ORDERKEYS = """
SELECT count(DISTINCT k) AS n_keys FROM (
  SELECT o_orderkey AS k FROM orders
  UNION ALL
  SELECT l_orderkey AS k FROM lineitem
)
"""


def q_click_events_filtered(sf_dir: str):
    """Filter + project with BOTH prunings at the read: column
    projection and a predicate pushed into the parquet scanner (row
    groups whose statistics exclude the predicate never leave
    storage)."""
    import pyarrow.dataset as pads

    ds = _read(
        sf_dir,
        "events",
        ["event_id", "event_type", "value"],
        filter_expr=(pads.field("event_type") == "click")
        & (pads.field("value") > 50.0),
    )
    return ds.map_batches(
        lambda b: pa.table(
            {"event_id": b.column("event_id"), "cents": _cents(b.column("value"))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_PROPS_EXTRACT = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS k_sum
FROM events GROUP BY event_type
"""


SQL_CLICK_EVENTS_FILTERED = """
SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
FROM events WHERE event_type = 'click' AND value > 50.0
"""


# --------------------------------------------------------------------------
# Web-text repetition / cross-doc duplication signals, TF-IDF, late data
# --------------------------------------------------------------------------
def q_repetition_scores(sf_dir: str):
    """Gopher-style top-bigram repetition fraction per document.
    Embarrassingly parallel — no shuffle at any scale; the vectorized
    counting kernel lives in stages/textstats.py."""
    from ..stages.textstats import add_repetition_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_repetition_stats(b).select(
            ["doc_id", "n_bigrams", "top_bigram_ppm"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_REPETITION_SCORES = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), b2 AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 2 THEN []
              ELSE [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
         END AS bgs
  FROM d
), c AS (
  SELECT doc_id, bg, count(*) AS cnt
  FROM (SELECT doc_id, unnest(bgs) AS bg FROM b2) GROUP BY 1, 2
), m AS (
  SELECT doc_id, max(cnt) AS mx, sum(cnt) AS nb FROM c GROUP BY 1
)
SELECT b2.doc_id,
       CAST(len(b2.bgs) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(m.mx * 1000000 // m.nb, 0) AS BIGINT) AS top_bigram_ppm
FROM b2 LEFT JOIN m USING (doc_id)
"""


LM_VOCAB_MIN_PPM = 1000  # bigram joins the LM vocab at >= 1000 ppm of mass


def _doc_bigram_hashes(texts: list) -> tuple:
    """(doc_idx, bigram_hash) for every adjacent word pair in a batch of
    texts — whitespace-split tokens (matching the oracles' \\s+ split),
    hash_strings per token, odd-multiplier uint64 combine per pair
    (bijective in each argument), document boundaries masked. Shared by
    pass 1 (global counts) and pass 2 (membership scoring) of
    lm_quality_scores so both passes see identical keys."""
    from ..stages.hashing import hash_strings

    tok_lists = [(t or "").split() for t in texts]
    nd = len(tok_lists)
    ntok = np.fromiter(
        (len(t) for t in tok_lists), dtype=np.int64, count=nd
    )
    nbig = np.maximum(ntok - 1, 0)
    total = int(ntok.sum())
    if total < 2 or int(nbig.sum()) == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.uint64),
            nbig,
        )
    flat = [w for toks in tok_lists for w in toks]
    h = hash_strings(flat)
    big = h[:-1] * np.uint64(0x9E3779B97F4A7C15) + h[1:]
    ends = np.cumsum(ntok)
    valid = np.ones(total - 1, dtype=bool)
    cut = ends[:-1] - 1
    cut = cut[(cut >= 0) & (cut < total - 1)]
    valid[cut] = False
    doc_idx = np.repeat(np.arange(nd, dtype=np.int64), nbig)
    return doc_idx, big[valid], nbig


def q_lm_quality_scores(sf_dir: str):
    """Bigram-LM quality scoring — the perplexity-proxy filter of a
    training-data stack, integer-exact: pass 1 learns a pruned bigram
    'language model' (every word bigram holding >= 1000 ppm of the
    corpus's bigram mass), pass 2 scores each document by the fraction
    of its bigram occurrences covered by that vocabulary
    (lm_vocab_ppm). Low scores flag rare/garbled constructions exactly
    the way a low LM log-prob would, with none of the float
    reproducibility hazards.

    Scale posture: pass 1 pre-counts bigram hashes per batch, so the
    one bigram-grain exchange carries (hash, count) partials only; the
    ppm threshold bounds the vocabulary at 10^6 / LM_VOCAB_MIN_PPM = 1000
    entries BY CONSTRUCTION regardless of corpus size (the decontam
    broadcast contract), shipped once as a sorted uint64 array; pass 2
    is one vectorized searchsorted probe per batch — no second shuffle,
    no driver row ever wider than the bounded vocab."""
    import ray as _ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_partial(b: pa.Table) -> pa.Table:
        _, big, _ = _doc_bigram_hashes(b.column("text").to_pylist())
        bg, cnt = np.unique(big, return_counts=True)
        return pa.table(
            {
                "bg": pa.array(bg.view(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = docs.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bg").aggregate(Sum("cnt", alias_name="cnt")).materialize()
    tot_row = counts.aggregate(Sum("cnt", alias_name="t"))["t"]
    tot = int(tot_row) if tot_row is not None else 0
    if tot == 0 and docs.count() == 0:
        # zero documents: a mapped empty read carries no schema, so
        # return the typed empty result directly (tot == 0 with docs
        # present still flows through — every doc scores 0)
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "lm_vocab_ppm": pa.array([], pa.int64()),
            }
        )
    vocab_parts = []
    if tot:
        kept = counts.map_batches(
            lambda b: b.filter(
                pa.array(
                    b.column("cnt").to_numpy(zero_copy_only=False)
                    * 1_000_000
                    >= tot * LM_VOCAB_MIN_PPM
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        for b in kept.iter_batches(batch_format="pyarrow"):
            vocab_parts.append(
                b.column("bg").to_numpy(zero_copy_only=False)
            )
    vocab = (
        np.sort(np.concatenate(vocab_parts).view(np.uint64))
        if vocab_parts
        else np.empty(0, dtype=np.uint64)
    )
    vocab_ref = _ray.put(vocab)

    def score(b: pa.Table) -> pa.Table:
        v = _ray.get(vocab_ref)
        doc_idx, big, nbig = _doc_bigram_hashes(
            b.column("text").to_pylist()
        )
        n_in = np.zeros(b.num_rows, dtype=np.int64)
        if big.size and v.size:
            pos = np.searchsorted(v, big)
            pos[pos >= v.size] = 0
            hit = v[pos] == big
            n_in = np.bincount(
                doc_idx[hit], minlength=b.num_rows
            ).astype(np.int64)
        ppm = np.zeros(b.num_rows, dtype=np.int64)
        nz = nbig > 0
        ppm[nz] = n_in[nz] * 1_000_000 // nbig[nz]
        return pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "n_bigrams": pa.array(nbig),
                "lm_vocab_ppm": pa.array(ppm),
            }
        )

    return docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_LM_QUALITY_SCORES = rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), b2 AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 2 THEN []
              ELSE [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
         END AS bgs
  FROM d
), occ AS (
  SELECT doc_id, unnest(bgs) AS bg FROM b2
), g AS (
  SELECT bg, count(*) AS cnt FROM occ GROUP BY 1
), t AS (
  SELECT sum(cnt) AS tot FROM g
), v AS (
  SELECT bg FROM g, t
  WHERE CAST(cnt AS HUGEINT) * 1000000
        >= CAST(tot AS HUGEINT) * {LM_VOCAB_MIN_PPM}
), per AS (
  SELECT occ.doc_id, count(*) AS n_in
  FROM occ JOIN v USING (bg) GROUP BY 1
)
SELECT b2.doc_id,
       CAST(len(b2.bgs) AS BIGINT) AS n_bigrams,
       CAST(CASE WHEN len(b2.bgs) = 0 THEN 0
            ELSE COALESCE(per.n_in, 0) * 1000000 // len(b2.bgs)
            END AS BIGINT) AS lm_vocab_ppm
FROM b2 LEFT JOIN per USING (doc_id)
"""


NUM_SHINGLE_BUCKETS = 256


def _dup_shingle_explode(b: pa.Table) -> pa.Table:
    """Explode a batch of docs into distinct (doc_id, shingle, bucket)
    rows. Per-doc shingle sets are already unique (word_shingle_arrays),
    and bucket = hash % NUM_SHINGLE_BUCKETS co-locates every occurrence
    of a shingle, so the bucketed pass can finish df counting locally."""
    from ..stages.dedup import word_shingle_arrays

    arrs = word_shingle_arrays(b.column("text").to_pylist())
    ids_all = b.column("doc_id").to_numpy(zero_copy_only=False)
    lens = np.fromiter(
        (a.size for a in arrs), dtype=np.int64, count=len(arrs)
    )
    keep = lens > 0
    n = lens[keep]
    if n.size:
        flat = np.concatenate([a for a in arrs if a.size])
        doc = np.repeat(ids_all[keep].astype(np.int64), n)
    else:
        flat = np.empty(0, dtype=np.uint64)
        doc = np.empty(0, dtype=np.int64)
    bucket = (flat % np.uint64(NUM_SHINGLE_BUCKETS)).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "sh": pa.array(flat.view(np.int64)),
            "bucket": pa.array(bucket, pa.int64()),
        }
    )


def _dup_shingle_bucket_partial(g: pa.Table) -> pa.Table:
    """One shingle-hash bucket: df(sh) completes locally (all rows of a
    shingle land in its bucket), rows with df >= 2 are hits, and only
    per-(doc, bucket) partial sums leave — at most one row per doc per
    bucket enters the second (tiny) shuffle."""
    sh = g.column("sh").to_numpy(zero_copy_only=False).view(np.uint64)
    doc = g.column("doc_id").to_numpy(zero_copy_only=False)
    _, inv, cnt = np.unique(sh, return_inverse=True, return_counts=True)
    hit = (cnt >= 2)[inv].astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "h": pa.array(hit),
            "one": pa.array(np.ones(doc.size, dtype=np.int64)),
        }
    )
    agg = t.group_by(["doc_id"]).aggregate([("h", "sum"), ("one", "sum")])
    return agg.rename_columns(["doc_id", "dup_part", "n_part"])


def q_dup_shingle_stats(sf_dir: str):
    """Cross-document duplicate-shingle ratio per doc (CCNet-style
    boilerplate signal): fraction (ppm) of a doc's distinct word-3-gram
    shingles that appear in >= 2 documents.

    Partitioned semi-join, NO driver-side dup-set: one shuffle of the
    exploded (doc_id, shingle) pairs by shingle-hash bucket computes the
    document frequency inside each bucket (every occurrence of a shingle
    co-locates), marks hits, and pre-aggregates (doc, n, dup) partials;
    a second shuffle of at most one row per (doc, bucket) folds the
    per-doc totals. The driver never collects or broadcasts shingles —
    memory is O(1) regardless of corpus dup-set size (the round-3 weak
    point). Docs with zero tokens emit no row (they have no shingles),
    matching the oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    pairs = ds.map_batches(
        _dup_shingle_explode, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = pairs.groupby("bucket").map_groups(
        _dup_shingle_bucket_partial, batch_format="pyarrow"
    )
    agg = partials.groupby("doc_id").aggregate(
        Sum("n_part", alias_name="n_shingles"),
        Sum("dup_part", alias_name="dup_shingles"),
    )

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_shingles"), pa.int64())
        d = pc.cast(b.column("dup_shingles"), pa.int64())
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_shingles": n,
                "dup_shingles": d,
                "dup_ppm": pc.divide(pc.multiply(d, 1_000_000), n),
            }
        )

    return agg.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_DUP_SHINGLE_STATS = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                  for i in range(1, len(toks) - 1)])
         END AS sh
  FROM d
), u AS (
  SELECT doc_id, unnest(sh) AS g FROM s
), df AS (
  SELECT g, count(*) AS df FROM u GROUP BY g
), per AS (
  SELECT u.doc_id,
         count(*) AS n_shingles,
         sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS dup_shingles
  FROM u JOIN df USING (g) GROUP BY u.doc_id
)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(dup_shingles AS BIGINT) AS dup_shingles,
       CAST(dup_shingles * 1000000 // n_shingles AS BIGINT) AS dup_ppm
FROM per
"""


def q_substring_dup_spans(sf_dir: str):
    """Exact substring-level dedup spans (Lee et al. 2021, arXiv
    2107.06499: drop every character span whose length-40 window occurs
    >= 2 times anywhere in the corpus — the suffix-array dedup's output
    semantics, realized Ray-Data-first). Emits (doc_id, span_start,
    span_end) maximal merged spans, codepoint offsets.

    Scale design: windows never exist as strings outside their batch —
    substring_window_explode hashes every window of the batch's
    CONCATENATED codepoint array in `window` vectorized passes and emits
    (window_hash, doc_id, pos) int64 triples; one hash-bucket shuffle
    counts corpus-wide occurrences in-bucket (every occurrence of a
    window co-locates, the dup_shingle_stats posture); only duplicated
    positions (a small fraction of the corpus) re-shuffle once by doc
    bucket for the vectorized interval merge. No broadcast, no driver
    structure; two shuffles of 3-4 int64 columns regardless of text
    width. Collision note: windows compare by mixed 64-bit Horner hash
    (stages/hashing.py), so two DISTINCT windows collide with prob
    ~n^2/2^64 — at 10^12-window scale widen to 128 bits, same shuffle."""
    from ..stages.dedup import (
        substring_bucket_dups,
        substring_merge_spans,
        substring_window_explode,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    exploded = ds.map_batches(
        substring_window_explode,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    dups = exploded.groupby("bucket").map_groups(
        substring_bucket_dups, batch_format="pyarrow"
    )
    return dups.groupby("dbucket").map_groups(
        substring_merge_spans, batch_format="pyarrow"
    )


# Oracle groups the raw substrings themselves (exact semantics); the Ray
# side groups their 64-bit hashes — bit-identical output unless two
# distinct windows collide (prob ~1e-7 over this corpus). Interval
# merge = gaps-and-islands over duplicated positions.
SQL_SUBSTRING_DUP_SPANS = """
WITH w AS (
  SELECT doc_id, unnest(range(0, length(text) - 39)) AS pos, text
  FROM documents WHERE length(text) >= 40
), s AS (
  SELECT doc_id, pos,
         substr(text, CAST(pos AS INTEGER) + 1, 40) AS win
  FROM w
), dup AS (
  SELECT win FROM s GROUP BY win HAVING count(*) >= 2
), d AS (
  SELECT s.doc_id, s.pos FROM s JOIN dup USING (win)
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                        ORDER BY pos) <= 40
              THEN 0 ELSE 1 END AS brk
  FROM d
), g AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM isl
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 40 AS BIGINT) AS span_end
FROM g GROUP BY doc_id, grp
"""


# --------------------------------------------------------------------------
# BPE merge learning (tokenizer training's core loop, Sennrich et al.
# 2016): m rounds of (count adjacent token pairs weighted by word
# frequency -> merge the argmax pair everywhere). State is the WORD
# VOCABULARY (Heaps-law small relative to the corpus), encoded as a
# separator string so the merge step is ONE vectorized replace kernel:
#   s = SEP + tok + SEP2 + tok + ... + SEP   (SEP=\x1f, SEP2=SEP+SEP)
#   merge (a,b): replace(SEP+a+SEP2+b+SEP -> SEP+ab+SEP)
# The double separator makes the single left-to-right replace pass equal
# BPE's leftmost-greedy merge even for overlapping occurrences
# ([a,a,a] -> [aa,a]; [a,b,a,b] -> [ab,ab]) because each replacement
# re-emits the boundary SEP the next match needs — verified identical
# between pyarrow replace_substring and DuckDB replace.
# --------------------------------------------------------------------------
BPE_SEP = "\x1f"
BPE_SEP2 = BPE_SEP + BPE_SEP
BPE_MERGES = 8


def _bpe_word_partial(b: pa.Table) -> pa.Table:
    """Per-batch word-frequency partials (words containing the \\x1f /
    \\x1e control separators are dropped on BOTH sides — absent from the
    corpus by construction)."""
    words = [
        w
        for t in b.column("text").to_pylist()
        for w in (t or "").split()
        if "\x1f" not in w and "\x1e" not in w
    ]
    t = pa.table({"word": pa.array(words, pa.string())})
    g = t.group_by(["word"]).aggregate([([], "count_all")])
    return g.rename_columns(["word", "freq"])


def _bpe_pair_partial(b: pa.Table) -> pa.Table:
    """Per-batch adjacent-pair counts over encoded vocab rows: flatten
    the token lists once, gather (left, right) neighbours by offset
    arithmetic, weight by word frequency — loop-free."""
    s = b.column("s")
    freq = pc.cast(b.column("freq"), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    toks = pc.split_pattern(
        pc.utf8_trim(s, BPE_SEP), pattern=BPE_SEP2
    ).combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = toks.values
    n_per = np.diff(offs)
    pair_n = np.maximum(n_per - 1, 0)
    total = int(pair_n.sum())
    if total == 0:
        return pa.table(
            {
                "pair": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    word_of = np.repeat(np.arange(pair_n.size, dtype=np.int64), pair_n)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(pair_n) - pair_n, pair_n
    )
    idx = offs[:-1][word_of] + within
    pair = pc.binary_join_element_wise(
        pc.take(vals, pa.array(idx)),
        pc.take(vals, pa.array(idx + 1)),
        BPE_SEP,
    )
    t = pa.table(
        {"pair": pair, "cnt": pa.array(freq[word_of], pa.int64())}
    )
    g = t.group_by(["pair"]).aggregate([("cnt", "sum")])
    return g.rename_columns(["pair", "cnt"])


def _bpe_block_top1(b: pa.Table) -> pa.Table:
    """Block-local argmax (cnt DESC, pair ASC): at most ONE row per
    block reaches the driver's final fold."""
    if b.num_rows == 0:
        return b
    cnt = pc.cast(b.column("cnt"), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    at = np.flatnonzero(cnt == cnt.max())
    if at.size > 1:
        pairs = b.column("pair").take(pa.array(at)).to_pylist()
        at = at[int(np.argmin(np.array(pairs, dtype=object)))]
    else:
        at = at[0]
    return b.slice(int(at), 1)


def q_bpe_merges(sf_dir: str):
    """Learn the first BPE_MERGES byte-pair-encoding merges over the
    whitespace-token vocabulary of the documents corpus; emit
    (merge_rank, lhs, rhs, pair_count).

    Scale design: the corpus is touched ONCE (word-frequency two-phase
    fold); every iteration runs over the materialized vocab dataset —
    pair counting is a pre-aggregated two-phase groupby, the argmax
    reaches the driver as <= one row per block, and the chosen merge is
    applied as a single broadcast replace_substring kernel (the kmeans
    broadcast-fold shape). Driver state: m pair strings."""
    ds = _read(sf_dir, "documents", ["text"], heavy=True)
    wf = _two_phase_sum(ds, ["word"], _bpe_word_partial, ["freq"])

    def encode(b: pa.Table) -> pa.Table:
        words = b.column("word").to_pylist()
        return pa.table(
            {
                "s": pa.array(
                    [BPE_SEP + BPE_SEP2.join(w) + BPE_SEP for w in words],
                    pa.string(),
                ),
                "freq": pc.cast(b.column("freq"), pa.int64()),
            }
        )

    vocab = wf.map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    ranks, lhss, rhss, cnts = [], [], [], []
    for rank in range(1, BPE_MERGES + 1):
        counts = vocab.map_batches(
            _bpe_pair_partial, batch_format="pyarrow", zero_copy_batch=True
        ).groupby("pair").aggregate(Sum("cnt", alias_name="cnt"))
        tops = counts.map_batches(
            _bpe_block_top1, batch_format="pyarrow"
        ).take_all()  # <= one row per block
        if not tops:
            break
        best = min(tops, key=lambda r: (-r["cnt"], r["pair"]))
        lhs, rhs = best["pair"].split(BPE_SEP)
        ranks.append(rank)
        lhss.append(lhs)
        rhss.append(rhs)
        cnts.append(int(best["cnt"]))
        pat = BPE_SEP + lhs + BPE_SEP2 + rhs + BPE_SEP
        rep = BPE_SEP + lhs + rhs + BPE_SEP

        def apply(b: pa.Table, pat=pat, rep=rep) -> pa.Table:
            return pa.table(
                {
                    "s": pc.replace_substring(
                        b.column("s"), pattern=pat, replacement=rep
                    ),
                    "freq": b.column("freq"),
                }
            )

        vocab = vocab.map_batches(
            apply, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return pa.table(
        {
            "merge_rank": pa.array(ranks, pa.int64()),
            "lhs": pa.array(lhss, pa.string()),
            "rhs": pa.array(rhss, pa.string()),
            "pair_count": pa.array(cnts, pa.int64()),
        }
    )


def _bpe_sql(m: int = BPE_MERGES) -> str:
    """Chained-CTE oracle: each round counts pairs via a list transform
    over the separator-encoded vocab and applies the argmax merge with
    the same double-separator replace. coalesce to chr(30) (absent from
    every word by the shared filter) keeps later rounds no-ops if the
    corpus runs out of pairs."""
    sep = "chr(31)"
    sep2 = "chr(31) || chr(31)"
    ctes = [
        f"""w AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS word
        FROM documents)
  WHERE instr(word, chr(31)) = 0 AND instr(word, chr(30)) = 0
  GROUP BY word
), v0 AS MATERIALIZED (
  SELECT {sep} || array_to_string(string_split_regex(word, ''), {sep2})
           || {sep} AS s,
         freq
  FROM w
)"""
    ]
    for k in range(m):
        ctes.append(
            f"""p{k} AS MATERIALIZED (
  SELECT pair, sum(freq) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(sp)),
                                 i -> sp[i] || {sep} || sp[i+1])) AS pair,
           freq
    FROM (SELECT string_split(trim(s, {sep}), {sep2}) AS sp, freq
          FROM v{k})
  ) GROUP BY pair
), m{k} AS MATERIALIZED (
  SELECT pair, cnt FROM p{k} ORDER BY cnt DESC, pair ASC LIMIT 1
), v{k + 1} AS MATERIALIZED (
  SELECT replace(s,
                 coalesce({sep} || replace((SELECT pair FROM m{k}),
                                           {sep}, {sep2}) || {sep},
                          chr(30)),
                 coalesce({sep} || replace((SELECT pair FROM m{k}),
                                           {sep}, '') || {sep},
                          chr(30))) AS s,
         freq
  FROM v{k}
)"""
        )
    selects = [
        f"""SELECT CAST({k + 1} AS BIGINT) AS merge_rank,
       split_part(pair, chr(31), 1) AS lhs,
       split_part(pair, chr(31), 2) AS rhs,
       CAST(cnt AS BIGINT) AS pair_count
FROM m{k}"""
        for k in range(m)
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


SQL_BPE_MERGES = _bpe_sql()


def _doc_term_counts(texts: list):
    """Vectorized per-doc term frequencies for a batch: one lexsort over
    (doc_idx, token) and a run-length pass. Returns (doc_idx, term, tf)
    numpy arrays over DISTINCT (doc, term) pairs."""
    tok_lists = [(t or "").split() for t in texts]
    ntok = np.fromiter(
        (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
    )
    flat = [w for toks in tok_lists for w in toks]
    if not flat:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype="U1"),
            np.empty(0, dtype=np.int64),
        )
    terms = np.array(flat)
    docs = np.repeat(np.arange(len(tok_lists), dtype=np.int64), ntok)
    order = np.lexsort((terms, docs))
    d_s, t_s = docs[order], terms[order]
    newrun = np.empty(d_s.shape[0], dtype=bool)
    newrun[0] = True
    newrun[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
    starts = np.flatnonzero(newrun)
    tf = np.diff(np.append(starts, d_s.shape[0]))
    return d_s[starts], t_s[starts], tf.astype(np.int64)


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 terms by tf/df (TF-IDF ranking; log(N/df) is
    monotone in 1/df so the ranking is identical), with an
    INTEGER-EXACT score key tf * 1e9 // df so the DuckDB oracle
    value-hashes bit-for-bit (no float log drift). Ties break by term.

    One shuffle total (term -> document frequency, pre-aggregated per
    batch); the df side is broadcast (vocabulary-sized — at corpus scale
    this becomes a hash join on term, same switch as
    _orders_with_segment) and the per-doc top-3 selection runs inside
    map_batches, so documents themselves never shuffle."""
    import ray as _ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)

    def df_partial(b: pa.Table) -> pa.Table:
        _, terms, _tf = _doc_term_counts(b.column("text").to_pylist())
        ks, cnts = np.unique(terms, return_counts=True)
        return pa.table(
            {
                "term": pa.array(ks),
                "c": pa.array(cnts.astype(np.int64)),
            }
        )

    df = ds.map_batches(
        df_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("term").aggregate(Sum("c", alias_name="c"))

    t_parts, c_parts = [], []
    for b in df.iter_batches(batch_format="pyarrow", batch_size=65536):
        t_parts.append(np.array(b.column("term").to_pylist()))
        c_parts.append(b.column("c").to_numpy(zero_copy_only=False))
    if t_parts:
        terms_all = np.concatenate(t_parts)
        dfs_all = np.concatenate(c_parts).astype(np.int64)
        order = np.argsort(terms_all)
        terms_sorted, dfs_sorted = terms_all[order], dfs_all[order]
    else:
        terms_sorted = np.empty(0, dtype="U1")
        dfs_sorted = np.empty(0, dtype=np.int64)
    df_ref = _ray.put((terms_sorted, dfs_sorted))

    def topk(b: pa.Table) -> pa.Table:
        ts, dfsv = _ray.get(df_ref)
        d_idx, terms, tf = _doc_term_counts(b.column("text").to_pylist())
        if d_idx.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "score_key": pa.array([], pa.int64()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        dfv = dfsv[np.searchsorted(ts, terms)]
        score = tf * 1_000_000_000 // dfv
        order = np.lexsort((terms, -score, d_idx))
        d_s = d_idx[order]
        newdoc = np.empty(d_s.shape[0], dtype=bool)
        newdoc[0] = True
        newdoc[1:] = d_s[1:] != d_s[:-1]
        starts = np.flatnonzero(newdoc)
        lens = np.diff(np.append(starts, d_s.shape[0]))
        rank = np.arange(d_s.shape[0]) - np.repeat(starts, lens)
        keep = rank < 3
        sel = order[keep]
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[d_idx[sel]]),
                "term": pa.array(terms[sel]),
                "score_key": pa.array(score[sel]),
                "rk": pa.array((rank[keep] + 1).astype(np.int64)),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)


SQL_TFIDF_TOP_TERMS = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM d) GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), sc AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS BIGINT) * 1000000000 // df.df AS score_key
  FROM tf JOIN df USING (term)
), rk AS (
  SELECT doc_id, term, score_key,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score_key DESC, term
         ) AS rk
  FROM sc
)
SELECT doc_id, term, score_key, CAST(rk AS BIGINT) AS rk
FROM rk WHERE rk <= 3
"""


QF_MIN_TOKENS = 30
QF_MIN_STOPWORD_PCT = 2
QF_MAX_TOP_BIGRAM_PPM = 100_000


def q_quality_filter(sf_dir: str):
    """C4/Gopher-style composite keep-filter — the end-user shape of the
    individual signals: keep docs with >= 30 tokens, stopword ratio
    >= 2% (integer cross-multiply, no float compare), and top-bigram
    repetition <= 10%. One map_batches, zero shuffle; all three signals
    come from the vectorized kernels in stages/textstats.py."""
    from ..stages.textstats import add_repetition_stats, add_token_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def keep(b: pa.Table) -> pa.Table:
        b = add_repetition_stats(add_token_stats(b))
        tc = b.column("token_count")
        sw = b.column("stopword_count")
        rep = b.column("top_bigram_ppm")
        m = pc.and_(
            pc.and_(
                pc.greater_equal(tc, QF_MIN_TOKENS),
                pc.greater_equal(
                    pc.multiply(sw, 100),
                    pc.multiply(tc, QF_MIN_STOPWORD_PCT),
                ),
            ),
            pc.less_equal(rep, QF_MAX_TOP_BIGRAM_PPM),
        )
        t = b.select(["doc_id", "token_count", "top_bigram_ppm"])
        return t.filter(m)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


BLOCK_MAX_PPM = 60_000  # drop docs with > 6% blocklisted tokens


def q_blocklist_filter(sf_dir: str):
    """C4-style blocklist (badwords) filter — the curation stage that
    precedes quality scoring in most corpus builds: per doc, the count
    and ppm of blocklisted tokens (token-equality semantics) plus the
    keep verdict at the 6% ratio bar. One map_batches, zero shuffle;
    integer cross-multiply verdict (no float compare)."""
    from ..stages.textstats import add_blocklist_stats, add_token_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def verdict(b: pa.Table) -> pa.Table:
        b = add_blocklist_stats(add_token_stats(b))
        tc = b.column("token_count")
        nb = b.column("n_blocked")
        kept = pc.cast(
            pc.less_equal(
                pc.multiply(nb, 1_000_000),
                pc.multiply(tc, BLOCK_MAX_PPM),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "token_count": tc,
                "n_blocked": nb,
                "kept": kept,
            }
        )

    return ds.map_batches(
        verdict, batch_format="pyarrow", zero_copy_batch=True
    )


def _blocklist_sql() -> str:
    from ..stages.textstats import BLOCKLIST

    terms = ", ".join(f"'{t}'" for t in BLOCKLIST)
    return rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), c AS (
  SELECT doc_id, len(toks) AS token_count,
         len(list_filter(toks, x -> x IN ({terms}))) AS n_blocked
  FROM d
)
SELECT doc_id, CAST(token_count AS BIGINT) AS token_count,
       CAST(n_blocked AS BIGINT) AS n_blocked,
       CAST(CASE WHEN n_blocked * 1000000 <= token_count * {BLOCK_MAX_PPM}
                 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM c
"""


SQL_BLOCKLIST_FILTER = _blocklist_sql()


SQL_QUALITY_FILTER = rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), b2 AS (
  SELECT doc_id, len(toks) AS token_count,
         len(list_filter(toks, x -> x IN ({_SW}))) AS sw,
         CASE WHEN len(toks) < 2 THEN []
              ELSE [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
         END AS bgs
  FROM d
), c AS (
  SELECT doc_id, bg, count(*) AS cnt
  FROM (SELECT doc_id, unnest(bgs) AS bg FROM b2) GROUP BY 1, 2
), m AS (
  SELECT doc_id, max(cnt) AS mx, sum(cnt) AS nb FROM c GROUP BY 1
), j AS (
  SELECT b2.doc_id, b2.token_count, b2.sw,
         COALESCE(m.mx * 1000000 // m.nb, 0) AS top_bigram_ppm
  FROM b2 LEFT JOIN m USING (doc_id)
)
SELECT doc_id, CAST(token_count AS BIGINT) AS token_count,
       CAST(top_bigram_ppm AS BIGINT) AS top_bigram_ppm
FROM j
WHERE token_count >= {QF_MIN_TOKENS}
  AND sw * 100 >= token_count * {QF_MIN_STOPWORD_PCT}
  AND top_bigram_ppm <= {QF_MAX_TOP_BIGRAM_PPM}
"""


LATE_JITTER_US = 600_000_000  # arrival jitter / arrival-bucket width: 10 min
LATE_ALLOWED_US = 120_000_000  # allowed lateness: 2 min


def q_late_events(sf_dir: str):
    """Watermark late-data side output with a DuckDB oracle.

    The events table is event-time-sorted, so out-of-order ARRIVAL is
    simulated deterministically: each event's arrival time is its event
    time plus a jitter of mix64(event_id) % 10min (stages/hashing.py
    mix_rounds — SQL-reproducible), and arrival micro-batches are 10-min
    tumbling buckets of arrival time. The watermark entering batch b is
    max(event time over all earlier arrival batches) minus 2 min allowed
    lateness; an event is LATE (routed to the side output) iff its event
    time < watermark — exactly the drop rule the CEP engine's watermark
    tracker applies per micro-batch (pipelines/cep.py).

    Distributed shape: a two-phase per-arrival-batch max (tiny shuffle on
    batch_id), a driver-side prefix-max over per-batch maxima (one row
    per arrival bucket — bounded by stream duration / bucket width, NOT
    by row count), then a broadcast lookup inside map_batches."""
    import ray as _ray

    from ..stages.hashing import mix_rounds

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def _arrival_batch(b: pa.Table):
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        tsu = pc.cast(b.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        jit = (
            mix_rounds(eid.astype(np.uint64)) % np.uint64(LATE_JITTER_US)
        ).astype(np.int64)
        return eid, tsu, (tsu + jit) // LATE_JITTER_US

    def bmax(b: pa.Table) -> pa.Table:
        _, tsu, bid = _arrival_batch(b)
        t = pa.table({"batch_id": pa.array(bid), "mx": pa.array(tsu)})
        g = t.group_by(["batch_id"]).aggregate([("mx", "max")])
        return g.rename_columns(["batch_id", "mx"])

    bm = ds.map_batches(
        bmax, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("batch_id").aggregate(Max("mx", alias_name="mx"))

    bids, mxs = [], []
    for b in bm.iter_batches(batch_format="pyarrow", batch_size=65536):
        bids.append(b.column("batch_id").to_numpy(zero_copy_only=False))
        mxs.append(b.column("mx").to_numpy(zero_copy_only=False))
    bids = np.concatenate(bids) if bids else np.empty(0, dtype=np.int64)
    mxs = np.concatenate(mxs) if mxs else np.empty(0, dtype=np.int64)
    order = np.argsort(bids)
    bids, mxs = bids[order], mxs[order]
    # watermark entering batch i = max over batches < i (None for first)
    wm = np.empty_like(mxs)
    if mxs.size:
        wm[0] = np.iinfo(np.int64).min  # batch 0: nothing is late
        if mxs.size > 1:
            np.maximum.accumulate(mxs[:-1], out=wm[1:])
    wm_ref = _ray.put((bids, wm))

    def late(b: pa.Table) -> pa.Table:
        bv, wv = _ray.get(wm_ref)
        eid, tsu, bid = _arrival_batch(b)
        w = wv[np.searchsorted(bv, bid)]
        is_late = (w != np.iinfo(np.int64).min) & (
            tsu < w - LATE_ALLOWED_US
        )
        return pa.table(
            {
                "event_id": pa.array(eid[is_late]),
                "batch_id": pa.array(bid[is_late]),
            }
        )

    return ds.map_batches(late, batch_format="pyarrow", zero_copy_batch=True)


def _late_events_sql() -> str:
    m1 = _mixr_sql("CAST(event_id AS HUGEINT)")
    return f"""
WITH m1 AS (
  SELECT event_id, epoch_us(ts) AS tsu, {m1} AS v FROM events
), m2 AS (
  SELECT event_id, tsu, {_mixr_sql('v')} AS v FROM m1
), e AS (
  SELECT event_id, tsu,
         (tsu + CAST(v % {LATE_JITTER_US} AS BIGINT))
           // {LATE_JITTER_US} AS batch_id
  FROM m2
), bm AS (
  SELECT batch_id, max(tsu) AS mx FROM e GROUP BY batch_id
), wm AS (
  SELECT batch_id,
         max(mx) OVER (
           ORDER BY batch_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS pmax
  FROM bm
)
SELECT e.event_id, e.batch_id
FROM e JOIN wm USING (batch_id)
WHERE wm.pmax IS NOT NULL AND e.tsu < wm.pmax - {LATE_ALLOWED_US}
"""


SQL_LATE_EVENTS = _late_events_sql()


TOPK_PER_WINDOW = 2


def q_windowed_topk_events(sf_dir: str):
    """Windowed ranking: top-2 events by value per (event_type, 1-day
    tumbling window) — the streaming "trending items per pane" shape.

    Scale design: per-batch partials are trimmed to <= 2 rows per
    (type, window) run BEFORE the shuffle (the run-length trim used by
    q_top3_orders_per_segment), so the groupby moves at most k rows per
    pane per block regardless of pane size — no global sort, no
    pane-sized groups."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    k = TOPK_PER_WINDOW

    def partial(b: pa.Table) -> pa.Table:
        wid = pc.divide(pc.cast(b.column("ts"), pa.int64()), DAY_US)
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "window_id": wid,
                "event_id": b.column("event_id"),
                "val_cents": _cents(b.column("value")),
            }
        )
        n = t.num_rows
        if n == 0:
            return t
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("event_type", "ascending"),
                ("window_id", "ascending"),
                ("val_cents", "descending"),
                ("event_id", "ascending"),
            ],
        )
        return _trim_topk_runs(
            t.take(idx), ["event_type", "window_id"], k
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("val_cents", "descending"),
                ("event_id", "ascending"),
            ],
        )
        t = group.take(idx).slice(0, k)
        return t.append_column(
            "rnk", pa.array(range(1, t.num_rows + 1), pa.int64())
        )

    return partials.groupby(["event_type", "window_id"]).map_groups(
        topk, batch_format="pyarrow"
    )


SQL_WINDOWED_TOPK_EVENTS = f"""
WITH r AS (
  SELECT event_type,
         epoch_us(ts) // {DAY_US} AS window_id,
         event_id,
         CAST(round(value * 100) AS BIGINT) AS val_cents,
         row_number() OVER (
           PARTITION BY event_type, epoch_us(ts) // {DAY_US}
           ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id
         ) AS rk
  FROM events
)
SELECT event_type, window_id, event_id, val_cents,
       CAST(rk AS BIGINT) AS rnk
FROM r WHERE rk <= {TOPK_PER_WINDOW}
"""


def q_event_transitions(sf_dir: str):
    """Per-user event-sequence bigram transitions (Markov counts): for
    each user's events ordered by (ts, event_id), count consecutive
    (prev_type -> next_type) pairs across the whole corpus.

    Scale design: ONE groupby(user) shuffle for sequence locality (the
    same partitioning assumption every per-key CEP stage makes), a
    vectorized shift inside map_groups, and per-group pyarrow partial
    counts so the second shuffle only moves (prev, next, n) partials —
    never the event stream twice."""
    ds = _read(
        sf_dir, "events", ["user_id", "event_type", "ts", "event_id"]
    )

    def transitions(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("ts", "ascending"), ("event_id", "ascending")],
        )
        et = group.column("event_type").take(idx).combine_chunks()
        n = len(et)
        if n < 2:
            return pa.table(
                {
                    "prev_type": pa.array([], pa.string()),
                    "next_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        pairs = pa.table(
            {"prev_type": et.slice(0, n - 1), "next_type": et.slice(1)}
        )
        g = pairs.group_by(["prev_type", "next_type"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["prev_type", "next_type", "n"])

    partials = ds.groupby("user_id").map_groups(
        transitions, batch_format="pyarrow"
    )
    return partials.groupby(["prev_type", "next_type"]).aggregate(
        Sum("n", alias_name="n")
    )


SQL_EVENT_TRANSITIONS = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM o WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def q_user_running_value(sf_dir: str):
    """Per-user running (cumulative) value in cents ordered by
    (ts, event_id) — SUM() OVER (ROWS UNBOUNDED PRECEDING) as a Ray
    pipeline. One groupby(user) shuffle for sequence locality, then one
    vectorized cumsum per group; emits one row per event."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def running(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("ts", "ascending"), ("event_id", "ascending")],
        )
        t = group.take(idx)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "cum_cents": pa.array(np.cumsum(cents), pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(running, batch_format="pyarrow")


SQL_USER_RUNNING_VALUE = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_cents
FROM events
"""


KMEANS_K = 4
KMEANS_ITERS = 2


def q_kmeans_clusters(sf_dir: str):
    """Distributed k-means cluster assignment over the embeddings table
    (k=4, 2 exact Lloyd steps, k-lowest-id init). Assignment is a
    vectorized integer distance per batch against broadcast centroids;
    updates fold O(k*d) partial sums — see stages/cluster.py for the
    exact-arithmetic design that makes the DuckDB oracle bit-exact."""
    from ..stages.cluster import kmeans_assign

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_assign(ds, k=KMEANS_K, iters=KMEANS_ITERS)


def _kmeans_cte_chain(k: int, iters: int) -> tuple[str, str]:
    """Shared chained-CTE centroid trainer (mirror of
    stages/cluster.py kmeans_centroids): returns (cte_sql, final_name)
    where final_name is the centroid CTE in (cluster, d, v) layout.
    Used by both SQL_KMEANS_CLUSTERS and SQL_IVF_TOPK."""
    parts = [
        f"""
WITH e AS (
  SELECT vec_id,
         list_transform(
           embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)
         ) AS q
  FROM embeddings
), ed AS (
  SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS d FROM e
), init AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, q
  FROM e ORDER BY vec_id LIMIT {k}
), c0 AS (
  SELECT cluster, unnest(q) AS v, generate_subscripts(q, 1) AS d FROM init
)"""
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        parts.append(
            f""", d{i} AS (
  SELECT ed.vec_id, {prev}.cluster,
         sum((ed.v - {prev}.v) * (ed.v - {prev}.v)) AS dist
  FROM ed JOIN {prev} ON ed.d = {prev}.d
  GROUP BY 1, 2
), a{i} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY dist, cluster
           ) AS rk
    FROM d{i}
  ) WHERE rk = 1
), c{i} AS (
  SELECT c.cluster, c.d, COALESCE(u.v, c.v) AS v
  FROM {prev} c LEFT JOIN (
    SELECT a{i}.cluster, ed.d,
           CAST(floor(CAST(sum(ed.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
    FROM ed JOIN a{i} USING (vec_id)
    GROUP BY 1, 2
  ) u ON u.cluster = c.cluster AND u.d = c.d
)"""
        )
        prev = f"c{i}"
    return "".join(parts), prev


def _kmeans_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Chained-CTE mirror of kmeans_assign: floor-quantized int grid,
    HUGEINT-exact distances, row_number tie-break on (dist, cluster),
    floor(sum/count) updates with empty-cluster carry."""
    chain, prev = _kmeans_cte_chain(k, iters)
    return (
        chain
        + f""", dfin AS (
  SELECT ed.vec_id, {prev}.cluster,
         sum((ed.v - {prev}.v) * (ed.v - {prev}.v)) AS dist
  FROM ed JOIN {prev} ON ed.d = {prev}.d
  GROUP BY 1, 2
)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rk
  FROM dfin
) WHERE rk = 1"""
    )


SQL_KMEANS_CLUSTERS = _kmeans_sql()


def _ivf_topk_sql(
    *,
    num_centroids: int = 16,
    iters: int = 2,
    nprobe: int = 4,
    n_queries: int = 5,
    topk: int = 10,
) -> str:
    """Chained-CTE mirror of q_ivf_topk: the SAME integer centroid
    trainer as SQL_KMEANS_CLUSTERS (k=16 cells), integer-exact cell
    assignment and probe choice (row_number ORDER BY dist, cell), then
    float cosine top-k over the probed cells only — SQL reproduces the
    exact approximation, pruning included."""
    chain, cfin = _kmeans_cte_chain(num_centroids, iters)
    return (
        chain
        + f""", dcell AS (
  SELECT ed.vec_id, {cfin}.cluster,
         sum((ed.v - {cfin}.v) * (ed.v - {cfin}.v)) AS dist
  FROM ed JOIN {cfin} ON ed.d = {cfin}.d
  GROUP BY 1, 2
), cellassign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rk
    FROM dcell
  ) WHERE rk = 1
), qprobe AS (
  SELECT DISTINCT cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rk
    FROM dcell WHERE vec_id < {n_queries}
  ) WHERE rk <= {nprobe}
), cand AS (
  SELECT vec_id FROM cellassign
  WHERE cluster IN (SELECT cluster FROM qprobe)
), raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), q AS (
  SELECT vec_id AS query_id, emb AS qe FROM raw WHERE vec_id < {n_queries}
), s AS (
  SELECT q.query_id, raw.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, raw.emb) AS sim
  FROM q, raw
  JOIN cand ON raw.vec_id = cand.vec_id
  WHERE raw.vec_id <> q.query_id
), r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS "rank"
FROM r WHERE rnk <= {topk}"""
    )


SQL_IVF_TOPK = _ivf_topk_sql()


STRATUM_RATES = {"view": 1, "click": 10, "purchase": 100}
STRATUM_DEFAULT_RATE = 5


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: keep p% of events per
    event_type (different p per stratum — the data-mixing knob of a
    training pipeline). Membership is mix_rounds(event_id) % 100 <
    rate[type]: stable across runs, machines and partitionings, zero
    shuffle, and SQL-reproducible via the shared mixer."""
    from ..stages.hashing import mix_rounds

    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def sample(b: pa.Table) -> pa.Table:
        ids = b.column("event_id").to_numpy(zero_copy_only=False)
        h = mix_rounds(ids.astype(np.uint64)) % np.uint64(100)
        rate = np.full(len(ids), STRATUM_DEFAULT_RATE, dtype=np.uint64)
        et = b.column("event_type")
        for t, r in STRATUM_RATES.items():
            # fill_null(False): a null event_type must route to the
            # default rate, not poison the mask into an object array
            m = pc.fill_null(pc.equal(et, t), False)
            rate[m.to_numpy(zero_copy_only=False)] = r
        return b.filter(pa.array(h < rate))

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def _stratified_sample_sql() -> str:
    cases = " ".join(
        f"WHEN '{t}' THEN {r}" for t, r in STRATUM_RATES.items()
    )
    return f"""
WITH m1 AS (
  SELECT event_id, event_type,
         {_mixr_sql('CAST(event_id AS HUGEINT)')} AS v
  FROM events
), m2 AS (
  SELECT event_id, event_type, {_mixr_sql('v')} AS v FROM m1
)
SELECT event_id, event_type FROM m2
WHERE v % 100 < CASE event_type {cases}
                ELSE {STRATUM_DEFAULT_RATE} END
"""


SQL_STRATIFIED_SAMPLE = _stratified_sample_sql()


def q_cluster_label_purity(sf_dir: str):
    """Cluster quality audit: join the k-means assignment with the
    embeddings' labels and report, per cluster, the member count, the
    majority label and its purity (ppm). Labels ride the assignment map
    as a passthrough column (no post-hoc join); counts are two-phase
    (per-batch pyarrow partials, then a (cluster, label) groupby), so
    the driver folds at most k * n_labels rows."""
    from ..stages.cluster import kmeans_assign

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    assigned = kmeans_assign(
        ds, k=KMEANS_K, iters=KMEANS_ITERS, passthrough=("label",)
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["cluster", "label"]).aggregate([([], "count_all")])
        return g.rename_columns(["cluster", "label", "n"])

    counts = (
        assigned.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["cluster", "label"])
        .aggregate(Sum("n", alias_name="n"))
    )
    t = pa.Table.from_pandas(counts.to_pandas())  # k * n_labels rows
    cl = t.column("cluster").to_numpy(zero_copy_only=False)
    lb = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    n = t.column("n").to_numpy(zero_copy_only=False)
    out = []
    for c in np.unique(cl):
        m = cl == c
        tot = int(n[m].sum())
        order = np.lexsort((lb[m], -n[m]))  # n desc, label asc
        top = order[0]
        out.append(
            (
                int(c),
                int(lb[m][top]),
                tot,
                int(n[m][top]) * 1_000_000 // tot,
            )
        )
    return pa.table(
        {
            "cluster": pa.array([r[0] for r in out], pa.int64()),
            "major_label": pa.array([r[1] for r in out], pa.int64()),
            "n": pa.array([r[2] for r in out], pa.int64()),
            "purity_ppm": pa.array([r[3] for r in out], pa.int64()),
        }
    )


SQL_CLUSTER_LABEL_PURITY = f"""
WITH km AS ({SQL_KMEANS_CLUSTERS}),
j AS (
  SELECT km.cluster, e.label
  FROM km JOIN embeddings e USING (vec_id)
),
c AS (SELECT cluster, label, count(*) AS n FROM j GROUP BY 1, 2),
t AS (SELECT cluster, sum(n) AS tot FROM c GROUP BY 1),
m AS (
  SELECT cluster, label, n,
         row_number() OVER (
           PARTITION BY cluster ORDER BY n DESC, label
         ) AS rk
  FROM c
)
SELECT m.cluster,
       CAST(m.label AS BIGINT) AS major_label,
       CAST(t.tot AS BIGINT) AS n,
       CAST(m.n * 1000000 // t.tot AS BIGINT) AS purity_ppm
FROM m JOIN t USING (cluster) WHERE rk = 1
"""


def q_event_session_ids(sf_dir: str):
    """Per-event sessionization: assign every event its user-local
    session index (a new session starts when the gap to the previous
    event exceeds SESSION_GAP_US) — the row-level companion of the
    session-window aggregate, and the label a training pipeline joins
    back onto raw events. One groupby(user) shuffle, then a vectorized
    gap-cumsum per group (no per-row python)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def label(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("ts", "ascending"), ("event_id", "ascending")],
        )
        t = group.take(idx)
        tus = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        new_sess = np.ones(len(tus), dtype=np.int64)
        if len(tus) > 1:
            new_sess[1:] = (np.diff(tus) > SESSION_GAP_US).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "session_idx": pa.array(np.cumsum(new_sess) - 1),
            }
        )

    return ds.groupby("user_id").map_groups(label, batch_format="pyarrow")


SQL_EVENT_SESSION_IDS = f"""
WITH o AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                      > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(sum(new_sess) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) - 1 AS BIGINT) AS session_idx
FROM o
"""


RESERVOIR_K = 3


def q_reservoir_sample(sf_dir: str):
    """Deterministic distributed reservoir sampling: exactly k events
    per event_type, uniform over the stratum, chosen as the k smallest
    mixer hashes of event_id (hash-order top-k == an order-free,
    partition-free, rerun-stable reservoir). Per-batch run-length trim
    keeps at most k rows per stratum per block out of the shuffle."""
    from ..stages.hashing import mix_rounds

    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    k = RESERVOIR_K

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("event_id").to_numpy(zero_copy_only=False)
        # keep the hash UNSIGNED end-to-end so the sort order matches
        # the oracle's HUGEINT order (an int64 wrap would reorder)
        h = mix_rounds(ids.astype(np.uint64))
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "event_id": b.column("event_id"),
                "h": pa.array(h, pa.uint64()),
            }
        )
        n = t.num_rows
        if n == 0:
            return t
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("event_type", "ascending"),
                ("h", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        return _trim_topk_runs(t.take(idx), ["event_type"], k)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def pick(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("h", "ascending"), ("event_id", "ascending")],
        )
        return group.take(idx).slice(0, k).select(
            ["event_type", "event_id"]
        )

    return partials.groupby("event_type").map_groups(
        pick, batch_format="pyarrow"
    )


def _reservoir_sample_sql() -> str:
    m1 = _mixr_sql("CAST(event_id AS HUGEINT)")
    return f"""
WITH m1 AS (
  SELECT event_id, event_type, {m1} AS v FROM events
), m2 AS (
  SELECT event_id, event_type, {_mixr_sql('v')} AS v FROM m1
), r AS (
  SELECT event_type, event_id,
         row_number() OVER (
           PARTITION BY event_type ORDER BY v, event_id
         ) AS rk
  FROM m2
)
SELECT event_type, event_id FROM r WHERE rk <= {RESERVOIR_K}
"""


SQL_RESERVOIR_SAMPLE = _reservoir_sample_sql()


def q_distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type, two-level: batches
    pre-dedupe (type, user) pairs before the pair-key shuffle (the
    stream entering the exchange is unique-pairs-per-batch, not raw
    events), the groupby dedupes globally, and the final per-type count
    folds pre-aggregated partials — the standard distinct-count
    decomposition that avoids shipping the raw stream twice."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def pair_partial(b: pa.Table) -> pa.Table:
        # drop null users first: SQL count(DISTINCT user_id) ignores
        # NULLs, but a groupby would count the null group as a user
        b = b.filter(pc.is_valid(b.column("user_id")))
        return b.group_by(["event_type", "user_id"]).aggregate([])

    pairs = (
        ds.map_batches(
            pair_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["event_type", "user_id"])
        .aggregate(Count())  # count unused; the groupby IS the dedup
    )

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "n"])

    return _two_phase_sum(pairs, ["event_type"], count_partial, ["n"])


SQL_DISTINCT_USERS_PER_TYPE = """
SELECT event_type, count(DISTINCT user_id) AS n
FROM events GROUP BY 1
"""


HLL_REGISTERS = 256  # 2^8 registers; rho over the remaining 56 bits


def q_hll_user_registers(sf_dir: str):
    """HyperLogLog register construction over user_id — the classic
    mergeable distinct-count sketch, built exactly: register =
    mix(user) % m, rho = 57 - bit_length(mix(user) >> 8). Per-batch
    partial register maxima merge through a tiny groupby (the shuffle
    moves <= m rows per block — the property that lets one sketch
    summarize 10^12 rows), and the deterministic mixer makes the
    registers themselves SQL-reproducible, so the sketch state (not
    just an estimate) is oracle-checked bit-for-bit."""
    from ..stages.hashing import mix_rounds

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        # NULL user_ids contribute no register (SQL mixer emits NULL);
        # unfiltered they'd turn to_numpy into float64 NaN whose uint64
        # cast is undefined — same rule as q_distinct_users_per_type
        b = b.filter(pc.is_valid(b.column("user_id")))
        ids = b.column("user_id").to_numpy(zero_copy_only=False)
        h = mix_rounds(ids.astype(np.uint64))
        reg = (h % np.uint64(HLL_REGISTERS)).astype(np.int64)
        w = h >> np.uint64(8)
        # exact vectorized bit_length (float log2 is off-by-one near
        # powers of two for > 53-bit values)
        bl = np.zeros(len(w), dtype=np.int64)
        v = w.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            m = v >= (np.uint64(1) << np.uint64(shift))
            bl[m] += shift
            v[m] >>= np.uint64(shift)
        bl += (v > 0).astype(np.int64)
        rho = 57 - bl
        t = pa.table({"register": pa.array(reg), "rho": pa.array(rho)})
        g = t.group_by(["register"]).aggregate([("rho", "max")])
        return g.rename_columns(["register", "rho"])

    from ray.data.aggregate import Max

    return (
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
    )


def _hll_sql() -> str:
    m1 = _mixr_sql("CAST(user_id AS HUGEINT)")
    return f"""
WITH m1 AS (
  SELECT {m1} AS v FROM events
), m2 AS (
  SELECT {_mixr_sql('v')} AS v FROM m1
), pw AS (
  SELECT i, CAST(2 AS HUGEINT) ** i AS p FROM range(57) t(i)
), r AS (
  SELECT CAST(v % {HLL_REGISTERS} AS BIGINT) AS register,
         v // 256 AS w
  FROM m2
), bl AS (
  SELECT register,
         COALESCE(
           (SELECT max(pw.i) + 1 FROM pw WHERE pw.p <= r.w), 0
         ) AS bitlen
  FROM r
)
SELECT register, CAST(max(57 - bitlen) AS BIGINT) AS rho
FROM bl GROUP BY 1
"""


SQL_HLL_USER_REGISTERS = _hll_sql()


CMS_DEPTH = 4
CMS_WIDTH = 512
# golden-ratio multiples mod 2^64: large odd row salts, reproducible as
# HUGEINT literals in the oracle
CMS_SALTS = [(r * 11400714819323198485) % (1 << 64)
             for r in range(CMS_DEPTH)]


def q_cms_user_registers(sf_dir: str):
    """Count-Min-Sketch counter construction over user_id — the
    mergeable FREQUENCY sketch (point queries answer min over rows),
    built exactly: row r hashes (user + salt_r) mod 2^64 through the
    same two bijective mix rounds as every other sketch here, and
    counter (r, h % width) accumulates the event count.

    Scale posture: per-batch partials collapse to <= depth x width rows
    before the one tiny groupby — the sketch summarizes any corpus size
    through a fixed 4 x 512 counter exchange, and counters merge by
    addition across partitions/streams. The deterministic mixer makes
    the COUNTER STATE itself SQL-reproducible, so the oracle checks the
    sketch bit-for-bit (not an estimate)."""
    from ..stages.hashing import mix_rounds

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("user_id")))
        ids = b.column("user_id").to_numpy(zero_copy_only=False)
        u = ids.astype(np.uint64)
        rows, cols = [], []
        for r, salt in enumerate(CMS_SALTS):
            h = mix_rounds(u + np.uint64(salt))  # wrapping add
            cols.append((h % np.uint64(CMS_WIDTH)).astype(np.int64))
            rows.append(np.full(u.size, r, dtype=np.int64))
        t = pa.table(
            {
                "sketch_row": pa.array(np.concatenate(rows)),
                "col": pa.array(np.concatenate(cols)),
                "cnt": pa.array(
                    np.ones(u.size * CMS_DEPTH, dtype=np.int64)
                ),
            }
        )
        g = t.group_by(["sketch_row", "col"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["sketch_row", "col", "cnt"])

    out = (
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["sketch_row", "col"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def final_cast(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sketch_row": b.column("sketch_row"),
                "col": b.column("col"),
                "cnt": pc.cast(b.column("cnt"), pa.int64()),
            }
        )

    return out.map_batches(
        final_cast, batch_format="pyarrow", zero_copy_batch=True
    )


def _cms_sql() -> str:
    salt_rows = ", ".join(
        f"({r}, {s}::HUGEINT)" for r, s in enumerate(CMS_SALTS)
    )
    return f"""
WITH u AS (
  SELECT CAST(user_id AS HUGEINT) AS uid FROM events
  WHERE user_id IS NOT NULL
), v0 AS (
  SELECT s.r, (uid + s.salt) % {_M64} AS v
  FROM u, (VALUES {salt_rows}) AS s(r, salt)
), m1 AS (
  SELECT r, {_mixr_sql('v')} AS v FROM v0
), m2 AS (
  SELECT r, {_mixr_sql('v')} AS v FROM m1
)
SELECT CAST(r AS BIGINT) AS sketch_row,
       CAST(v % {CMS_WIDTH} AS BIGINT) AS col,
       CAST(count(*) AS BIGINT) AS cnt
FROM m2
GROUP BY 1, 2
"""


SQL_CMS_USER_REGISTERS = _cms_sql()


FRAME_EVERY_N = 30


def q_video_frame_plans(sf_dir: str):
    """Video frame-sampling plans through the real multimodal stage
    (stages/multimodal.frame_sample_plan) over a deterministic
    synthetic video table — documents' token counts stand in for frame
    counts (no video codec in this container; the PLAN is the
    distributed part). Oracled on the plan's scalars: every-Nth-frame
    sampling yields ceil(n_frames / N) decode targets per row."""
    from ..stages.multimodal import frame_sample_plan

    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)

    def plan(b: pa.Table) -> pa.Table:
        t = add_token_stats(b)
        vt = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_frames": pc.cast(
                    t.column("token_count"), pa.int64()
                ),
            }
        )
        out = frame_sample_plan(vt, every_n=FRAME_EVERY_N)
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "n_frames": out.column("n_frames"),
                "n_sampled": pc.cast(
                    pc.list_value_length(out.column("sample_frames")),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(plan, batch_format="pyarrow", zero_copy_batch=True)


SQL_VIDEO_FRAME_PLANS = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_frames
  FROM documents
)
SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
       CAST((n_frames + {FRAME_EVERY_N - 1}) // {FRAME_EVERY_N} AS BIGINT)
         AS n_sampled
FROM t
"""


AUDIO_SR = 16_000
AUDIO_CHUNK_S = 30.0
AUDIO_OVERLAP_S = 1.0


def q_audio_chunk_plans(sf_dir: str):
    """Audio chunking plans through the real multimodal stage
    (stages/multimodal.audio_chunk_plan) over deterministic synthetic
    typed metadata — n_samples derived from doc_id (no audio codec in
    this container; the PLAN is the distributed part). Exploded to one
    row per chunk so DuckDB reproduces every (start_sample, end_sample)
    window bit-for-bit."""
    from ..stages.multimodal import AUDIO_META_SCHEMA, audio_chunk_plan

    ds = _read(sf_dir, "documents", ["doc_id"])

    def derive(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        m = len(ids)
        n = ((ids % 120) + 1) * AUDIO_SR
        meta = pa.StructArray.from_arrays(
            [
                pa.array(np.full(m, AUDIO_SR, dtype=np.int32), pa.int32()),
                pa.array(n, pa.int64()),
                pa.array(["synthetic"] * m, pa.string()),
            ],
            fields=list(AUDIO_META_SCHEMA),
        )
        t = pa.table({"doc_id": b.column("doc_id"), "meta": meta})
        planned = audio_chunk_plan(
            t, chunk_s=AUDIO_CHUNK_S, overlap_s=AUDIO_OVERLAP_S
        )
        chunks = planned.column("chunks")
        if isinstance(chunks, pa.ChunkedArray):
            chunks = chunks.combine_chunks()
        offs = chunks.offsets.to_numpy(zero_copy_only=False)
        k = np.diff(offs)
        row_id = np.repeat(np.arange(m), k)
        se = chunks.flatten().flatten().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[row_id], pa.int64()),
                "chunk_id": pa.array(
                    np.arange(int(offs[-1])) - offs[row_id], pa.int64()
                ),
                "start_sample": pa.array(se[0::2], pa.int64()),
                "end_sample": pa.array(se[1::2], pa.int64()),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


_AUDIO_STEP = int((AUDIO_CHUNK_S - AUDIO_OVERLAP_S) * AUDIO_SR)
_AUDIO_SIZE = int(AUDIO_CHUNK_S * AUDIO_SR)

SQL_AUDIO_CHUNK_PLANS = f"""
WITH m AS (
  SELECT doc_id, ((doc_id % 120) + 1) * {AUDIO_SR} AS n FROM documents
), c AS (
  SELECT doc_id, n,
         unnest(range(0, (n + {_AUDIO_STEP - 1}) // {_AUDIO_STEP})) AS i
  FROM m
)
SELECT doc_id, i AS chunk_id,
       i * {_AUDIO_STEP} AS start_sample,
       least(n, i * {_AUDIO_STEP} + {_AUDIO_SIZE}) AS end_sample
FROM c
"""


PACK_BUDGET_TOKENS = 512
PACK_BUCKET_WIDTH = 4096  # docs per id-range bucket


PACK_SUPER_WIDTH = 4096  # buckets per superbucket (driver folds O(sqrt n))


def _fold_super_offsets(super_sums) -> "tuple[np.ndarray, np.ndarray]":
    """Driver fold of (superbucket, sum) rows into sorted ids +
    exclusive offsets. This is the ONLY corpus-size-dependent driver
    state in the packing pipeline: O(n / (PACK_BUCKET_WIDTH *
    PACK_SUPER_WIDTH)) rows (~60k at 10^12 docs), vs the round-3 form
    that folded one row per bucket (~2.4e8 at that scale)."""
    sk, ss = [], []
    for b in super_sums.iter_batches(
        batch_format="pyarrow", batch_size=8192
    ):
        sk.extend(b.column("sb").to_pylist())
        ss.extend(b.column("s").to_pylist())
    if not sk:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.argsort(sk)
    sk_arr = np.asarray(sk, dtype=np.int64)[order]
    s_arr = np.asarray(ss, dtype=np.int64)[order]
    excl = np.concatenate(([0], np.cumsum(s_arr)[:-1]))
    return sk_arr, excl


def sequence_packing(
    ds: "ray.data.Dataset",
    *,
    budget: int = PACK_BUDGET_TOKENS,
    bucket_width: int = PACK_BUCKET_WIDTH,
    super_width: int = PACK_SUPER_WIDTH,
) -> "ray.data.Dataset":
    """Distributed ORDERED PREFIX SCAN over doc_id order (the primitive
    behind contiguous batch packing): pack_id =
    exclusive-prefix-token-count // budget.

    No global sort, TWO-LEVEL fold so the driver holds O(sqrt n):
    - docs are range-bucketed by doc_id (fixed width: no max() read);
    - pass 1 folds per-bucket token sums two-phase (only (bucket, sum)
      partials shuffle), then per-SUPERbucket sums the same way; the
      driver folds only the superbucket rows into exclusive offsets;
    - the per-bucket exclusive offsets are computed DISTRIBUTED (one
      map_groups per superbucket: within-super cumsum + broadcast super
      base) and delivered to pass 2 as marker rows co-partitioned with
      the data (union -> groupby bucket), never through the driver;
    - pass 2 moves each row once (groupby bucket), cumsums within the
      bucket and adds its marker's base offset."""
    import ray as _ray

    def toks(b: pa.Table) -> pa.Table:
        t = add_token_stats(b)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "tok": pc.cast(t.column("token_count"), pa.int64()),
                "bucket": pa.array(ids // bucket_width, pa.int64()),
                "m": pa.array(
                    np.zeros(len(t), dtype=np.int8), pa.int8()
                ),
            }
        )

    # materialize the REDUCED projection (3 int64 cols + marker byte):
    # both passes below consume it, and re-tokenizing the full text
    # column per pass costs far more than holding (and spilling)
    # 25 bytes/doc
    tds = ds.map_batches(
        toks, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def sum_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["bucket"]).aggregate([("tok", "sum")])
        return g.rename_columns(["bucket", "s"])

    sums = _two_phase_sum(tds, ["bucket"], sum_partial, ["s"])

    def super_partial(b: pa.Table) -> pa.Table:
        t = b.append_column(
            "sb",
            pc.cast(
                pc.divide(b.column("bucket"), super_width), pa.int64()
            ),
        )
        g = t.group_by(["sb"]).aggregate([("s", "sum")])
        return g.rename_columns(["sb", "s"])

    super_sums = _two_phase_sum(sums, ["sb"], super_partial, ["s"])
    sk_arr, super_excl = _fold_super_offsets(super_sums)
    super_ref = _ray.put((sk_arr, super_excl))

    def offsets_group(group: pa.Table) -> pa.Table:
        # per-bucket exclusive offsets for ONE superbucket: broadcast
        # super base + within-super exclusive cumsum, emitted as marker
        # rows (m=1, tok=base) that co-partition with the data rows
        sks, sexcl = _ray.get(super_ref)
        idx = pc.sort_indices(group.column("bucket"))
        t = group.take(idx)
        s = t.column("s").to_numpy(zero_copy_only=False)
        sb = int(t.column("bucket")[0].as_py()) // super_width
        base = sexcl[np.searchsorted(sks, sb)]
        off = base + np.cumsum(s) - s
        n = len(t)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.zeros(n, dtype=np.int64), pa.int64()
                ),
                "tok": pa.array(off, pa.int64()),
                "bucket": t.column("bucket"),
                "m": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }
        )

    offsets_ds = (
        sums.map_batches(
            lambda b: b.append_column(
                "sb",
                pc.cast(
                    pc.divide(b.column("bucket"), super_width),
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("sb")
        .map_groups(offsets_group, batch_format="pyarrow")
    )

    def scan(group: pa.Table) -> pa.Table:
        m = group.column("m").to_numpy(zero_copy_only=False)
        mark = m == 1
        base = int(
            group.column("tok").to_numpy(zero_copy_only=False)[mark][0]
        )
        data = group.filter(pa.array(~mark))
        idx = pc.sort_indices(data.column("doc_id"))
        t = data.take(idx)
        tok = t.column("tok").to_numpy(zero_copy_only=False)
        prefix = base + np.cumsum(tok) - tok
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "pack_id": pa.array(prefix // budget, pa.int64()),
            }
        )

    return (
        tds.union(offsets_ds)
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
    )


def q_sequence_packing(sf_dir: str):
    """Sequence packing over `documents` (see sequence_packing)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    return sequence_packing(ds)


SQL_SEQUENCE_PACKING = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS tok
  FROM documents
), p AS (
  SELECT doc_id,
         COALESCE(sum(tok) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING
         ), 0) AS excl
  FROM t
)
SELECT doc_id, CAST(excl // {PACK_BUDGET_TOKENS} AS BIGINT) AS pack_id
FROM p
"""


# --- text scrub (PII redaction machinery) ---------------------------------

# The catalog run adds a corpus-hitting term pattern on top of the real
# PII patterns (the synthetic corpus contains no emails/phones/IPs, so
# the PII patterns exercise the zero-hit path and the term pattern the
# hit path). Replacement machinery is identical either way: sequential
# RE2 global replace, each pattern over the previous pattern's output.
def _scrub_query_patterns() -> tuple:
    from ..stages.textstats import PII_PATTERNS

    return PII_PATTERNS + (("term", r"\b(key|hash|join)\b", "<TERM>"),)


def q_text_scrub(sf_dir: str):
    """Regex scrub / PII redaction over documents.text: emails, phones,
    IPv4s (plus a corpus-hitting term pattern) → redacted clean_text,
    n_redactions, clean_len. One map_batches, zero shuffle; both sides
    (pyarrow.compute and DuckDB) run the SAME RE2 patterns, so the
    oracle checks the redacted text bit-for-bit."""
    from ..stages.textstats import scrub_text

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pats = _scrub_query_patterns()
    return ds.map_batches(
        lambda b: scrub_text(b, patterns=pats).select(
            ["doc_id", "clean_text", "n_redactions", "clean_len"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _sql_text_scrub() -> str:
    pats = _scrub_query_patterns()
    prev = "documents"
    src = "text"
    ctes = []
    for i, (_name, pat, rep) in enumerate(pats):
        acc = "0" if i == 0 else "c"
        ctes.append(
            f"s{i} AS (SELECT doc_id, "
            f"regexp_replace({src}, '{pat}', '{rep}', 'g') AS t, "
            f"{acc} + COALESCE(len(regexp_extract_all({src}, '{pat}')), 0)"
            f" AS c FROM {prev})"
        )
        prev, src = f"s{i}", "t"
    return (
        "WITH " + ", ".join(ctes) + " SELECT doc_id, t AS clean_text, "
        "CAST(c AS BIGINT) AS n_redactions, "
        f"CAST(COALESCE(len(t), 0) AS BIGINT) AS clean_len FROM {prev}"
    )


SQL_TEXT_SCRUB = _sql_text_scrub()


# --- benchmark decontamination ---------------------------------------------

DECONTAM_BENCH_MOD = 31  # docs with doc_id % 31 == 0 form the benchmark set


def _bench_shingle_partial(b: pa.Table) -> pa.Table:
    """Distinct shingle hashes of this batch's benchmark-set docs."""
    from ..stages.dedup import word_shingle_arrays

    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
    keep = (ids % DECONTAM_BENCH_MOD) == 0
    texts = [
        t for t, k in zip(b.column("text").to_pylist(), keep) if k
    ]
    arrs = [a for a in word_shingle_arrays(texts) if a.size]
    flat = (
        np.unique(np.concatenate(arrs))
        if arrs
        else np.empty(0, dtype=np.uint64)
    )
    return pa.table({"sh": pa.array(flat.view(np.int64))})


def decontam_flags(ds: "ray.data.Dataset"):
    """Benchmark decontamination: flag corpus docs that share any
    word-3-gram shingle with a held-out benchmark set (docs with
    doc_id % DECONTAM_BENCH_MOD == 0) — the GPT-3-style n-gram overlap
    check every training-data pipeline runs before release.

    Scale posture: the benchmark side is SMALL BY NATURE (eval sets are
    MBs against a 100 TB corpus), so broadcast is the right join
    strategy — a distributed pass extracts per-block distinct benchmark
    shingle hashes (at most the benchmark's shingle count ever reaches
    the driver), `ray.put` ships the sorted array to the object store
    once, and every probe task does a vectorized np.searchsorted per
    batch. Corpus documents never shuffle and never materialize."""
    import ray as _ray

    from ..stages.dedup import word_shingle_arrays

    parts = [
        b.column("sh").to_numpy(zero_copy_only=False)
        for b in ds.map_batches(
            _bench_shingle_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    ]
    # view BEFORE unique: the sort must happen in uint64 order (hashes
    # >= 2^63 are negative as int64 and would break searchsorted)
    bench = (
        np.unique(np.concatenate(parts).view(np.uint64))
        if parts
        else np.empty(0, dtype=np.uint64)
    )
    bench_ref = _ray.put(bench)

    def probe(b: pa.Table) -> pa.Table:
        bs = _ray.get(bench_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (ids % DECONTAM_BENCH_MOD) != 0
        ids = ids[keep].astype(np.int64)
        texts = [
            t for t, k in zip(b.column("text").to_pylist(), keep) if k
        ]
        arrs = word_shingle_arrays(texts)
        n = np.fromiter(
            (a.size for a in arrs), dtype=np.int64, count=len(arrs)
        )
        if int(n.sum()):
            flat = np.concatenate([a for a in arrs if a.size])
            idx = np.searchsorted(bs, flat)
            idx[idx >= bs.size] = 0
            hit = (
                (bs[idx] == flat).astype(np.int64)
                if bs.size
                else np.zeros(flat.size, dtype=np.int64)
            )
            bounds = np.zeros(len(arrs) + 1, dtype=np.int64)
            np.cumsum(n, out=bounds[1:])
            csum = np.zeros(flat.size + 1, dtype=np.int64)
            np.cumsum(hit, out=csum[1:])
            cont = csum[bounds[1:]] - csum[bounds[:-1]]
        else:
            cont = np.zeros(len(arrs), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_shingles": pa.array(n),
                "contaminated_shingles": pa.array(cont),
                "is_contaminated": pa.array(
                    (cont > 0).astype(np.int64)
                ),
            }
        )

    return ds.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )


def q_decontam_flags(sf_dir: str):
    """Benchmark decontamination over `documents` (see decontam_flags)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)
    return decontam_flags(ds)


SQL_DECONTAM_FLAGS = rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                  for i in range(1, len(toks) - 1)])
         END AS sh
  FROM d
), bset AS (
  SELECT DISTINCT unnest(sh) AS g FROM s
  WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
), u AS (
  SELECT doc_id, unnest(sh) AS g FROM s
  WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0
), hits AS (
  SELECT u.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS contaminated
  FROM u LEFT JOIN bset b USING (g) GROUP BY u.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.contaminated, 0) AS BIGINT)
         AS contaminated_shingles,
       CAST(CASE WHEN COALESCE(h.contaminated, 0) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS is_contaminated
FROM d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {DECONTAM_BENCH_MOD} <> 0
"""


# --- composed corpus-curation pipeline --------------------------------------

CURATION_LEDE_TOKENS = 5  # syndication-dedup key: first 5 tokens


def q_curation_pipeline(sf_dir: str):
    """C4-style end-to-end corpus curation in ONE streaming pipeline:
    quality filter (q_quality_filter's gates) -> benchmark
    decontamination (decontam_flags' broadcast probe) -> syndication
    dedup (first-doc-wins on the 5-token lede fingerprint — the same
    article syndicated across sites shares its lede). Emits one row per
    non-benchmark doc: kept, and the drop reason in fixed priority
    quality > contaminated > duplicate.

    Scale posture: signals + contamination probe are embarrassingly
    parallel (benchmark shingle set built distributed, ray.put once);
    the only shuffle carries one tiny (doc_id, lede-hash, 2 flags) row
    per doc to co-locate lede groups — the same inherent exchange as
    exact dedup. No driver-side corpus state."""
    import ray as _ray

    from ..stages.dedup import word_shingle_arrays
    from ..stages.hashing import hash_strings
    from ..stages.textstats import add_repetition_stats, add_token_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"], heavy=True)

    parts = [
        b.column("sh").to_numpy(zero_copy_only=False)
        for b in ds.map_batches(
            _bench_shingle_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    ]
    bench = (
        np.unique(np.concatenate(parts).view(np.uint64))
        if parts
        else np.empty(0, dtype=np.uint64)
    )
    bench_ref = _ray.put(bench)

    def signals(b: pa.Table) -> pa.Table:
        bs = _ray.get(bench_ref)
        b2 = add_repetition_stats(add_token_stats(b))
        qual = pc.and_(
            pc.and_(
                pc.greater_equal(b2.column("token_count"), QF_MIN_TOKENS),
                pc.greater_equal(
                    pc.multiply(b2.column("stopword_count"), 100),
                    pc.multiply(
                        b2.column("token_count"), QF_MIN_STOPWORD_PCT
                    ),
                ),
            ),
            pc.less_equal(
                b2.column("top_bigram_ppm"), QF_MAX_TOP_BIGRAM_PPM
            ),
        ).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (ids % DECONTAM_BENCH_MOD) != 0
        ids_k = ids[keep].astype(np.int64)
        qual_k = qual[keep].astype(np.int64)
        texts = [
            t for t, k in zip(b.column("text").to_pylist(), keep) if k
        ]
        # contamination probe (vectorized searchsorted, decontam_flags)
        arrs = word_shingle_arrays(texts)
        n = np.fromiter(
            (a.size for a in arrs), dtype=np.int64, count=len(arrs)
        )
        if int(n.sum()) and bs.size:
            flat = np.concatenate([a for a in arrs if a.size])
            idx = np.searchsorted(bs, flat)
            idx[idx >= bs.size] = 0
            hit = (bs[idx] == flat).astype(np.int64)
            bounds = np.zeros(len(arrs) + 1, dtype=np.int64)
            np.cumsum(n, out=bounds[1:])
            csum = np.zeros(flat.size + 1, dtype=np.int64)
            np.cumsum(hit, out=csum[1:])
            contam = (
                (csum[bounds[1:]] - csum[bounds[:-1]]) > 0
            ).astype(np.int64)
        else:
            contam = np.zeros(len(arrs), dtype=np.int64)
        ledes = [
            " ".join((t or "").split()[:CURATION_LEDE_TOKENS])
            for t in texts
        ]
        lh = hash_strings(ledes)
        return pa.table(
            {
                "doc_id": pa.array(ids_k),
                "lede": pa.array(lh.view(np.int64)),
                "qual": pa.array(qual_k),
                "contam": pa.array(contam),
            }
        )

    def resolve(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        qual = g.column("qual").to_numpy(zero_copy_only=False)
        contam = g.column("contam").to_numpy(zero_copy_only=False)
        elig = (qual == 1) & (contam == 0)
        keeper = ids[elig].min() if elig.any() else -1
        kept = (elig & (ids == keeper)).astype(np.int64)
        reason = np.where(
            qual == 0,
            "quality",
            np.where(
                contam == 1,
                "contaminated",
                np.where(kept == 1, "", "duplicate"),
            ),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "kept": pa.array(kept),
                "drop_reason": pa.array(reason.tolist(), pa.string()),
            }
        )

    sig = ds.map_batches(
        signals, batch_format="pyarrow", zero_copy_batch=True
    )
    return sig.groupby("lede").map_groups(resolve, batch_format="pyarrow")


SQL_CURATION_PIPELINE = rf"""
WITH d AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), q AS (
  SELECT doc_id, len(toks) AS token_count,
         len(list_filter(toks, x -> x IN ({_SW}))) AS sw,
         CASE WHEN len(toks) < 2 THEN []
              ELSE [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
         END AS bgs,
         array_to_string(toks[1:{CURATION_LEDE_TOKENS}], ' ') AS lede
  FROM d
), c AS (
  SELECT doc_id, bg, count(*) AS cnt
  FROM (SELECT doc_id, unnest(bgs) AS bg FROM q) GROUP BY 1, 2
), m AS (
  SELECT doc_id, max(cnt) AS mx, sum(cnt) AS nb FROM c GROUP BY 1
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                  for i in range(1, len(toks) - 1)])
         END AS sh
  FROM d
), bset AS (
  SELECT DISTINCT unnest(sh) AS g FROM s
  WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
), u AS (
  SELECT doc_id, unnest(sh) AS g FROM s
  WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0
), hits AS (
  SELECT u.doc_id,
         sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS contaminated
  FROM u LEFT JOIN bset b USING (g) GROUP BY u.doc_id
), sig AS (
  SELECT q.doc_id, q.lede,
         CASE WHEN q.token_count >= {QF_MIN_TOKENS}
               AND q.sw * 100 >= q.token_count * {QF_MIN_STOPWORD_PCT}
               AND COALESCE(m.mx * 1000000 // m.nb, 0)
                     <= {QF_MAX_TOP_BIGRAM_PPM}
              THEN 1 ELSE 0 END AS qual,
         CASE WHEN COALESCE(h.contaminated, 0) > 0 THEN 1 ELSE 0 END
           AS contam
  FROM q
  LEFT JOIN m USING (doc_id)
  LEFT JOIN hits h USING (doc_id)
  WHERE q.doc_id % {DECONTAM_BENCH_MOD} <> 0
), win AS (
  SELECT lede, min(doc_id) AS keeper FROM sig
  WHERE qual = 1 AND contam = 0 GROUP BY lede
)
SELECT sig.doc_id,
       CAST(CASE WHEN qual = 1 AND contam = 0 AND sig.doc_id = w.keeper
                 THEN 1 ELSE 0 END AS BIGINT) AS kept,
       CASE WHEN qual = 0 THEN 'quality'
            WHEN contam = 1 THEN 'contaminated'
            WHEN sig.doc_id <> w.keeper THEN 'duplicate'
            ELSE '' END AS drop_reason
FROM sig LEFT JOIN win w USING (lede)
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer, global top 20
# ---------------------------------------------------------------------------
Q10_LO_US = 820_454_400_000_000  # 1996-01-01 epoch microseconds
Q10_HI_US = 828_316_800_000_000  # 1996-04-01
Q10_TOPK = 20


def q_returned_customer_revenue(sf_dir: str):
    """TPC-H Q10 shape: customers ranked by revenue carried on RETURNED
    items (l_returnflag = 'R') of orders placed in one quarter — the
    "who is returning the most" report — global top 20 with each
    winner's nation name attached.

    Scale composition: both fact sides pre-filter and pre-shape before
    the ONE lineitem x orders bucket join; bucket_post collapses each
    join bucket to per-customer partial sums, then a custkey-hash
    bucket fold finishes the sums AND trims every bucket to its own
    top-20 (each custkey's rows are complete inside its fold bucket),
    so the driver merges <= 20 x #buckets candidate rows. Customer
    names resolve AFTER the trim: the <= 20 winning custkeys filter the
    customer table in-stream (k-bounded is_in — the fact-sized customer
    side is never broadcast or shuffled), and nation is dimension-tiny
    by nature."""
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def li_shape(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), pa.scalar("R")))
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "rev_cents": _cents(rev),
            }
        )

    li_proj = li.map_batches(
        li_shape, batch_format="pyarrow", zero_copy_batch=True
    )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def orders_shape(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("o_orderdate"), pa.int64())
        keep = pc.and_(
            pc.greater_equal(t_us, pa.scalar(Q10_LO_US, pa.int64())),
            pc.less(t_us, pa.scalar(Q10_HI_US, pa.int64())),
        )
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
            }
        ).filter(keep)

    orders_w = orders.map_batches(
        orders_shape, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_post(joined: pa.Table) -> pa.Table:
        g = joined.group_by(["o_custkey"]).aggregate([("rev_cents", "sum")])
        return g.rename_columns(["o_custkey", "rev_cents"])

    from ..stages.join import hash_join

    partials = hash_join(
        li_proj, orders_w, key="o_orderkey", how="inner",
        bucket_post=bucket_post,
    )

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate([("rev_cents", "sum")])
        g = g.rename_columns(["o_custkey", "rev_cents"])
        idx = pc.sort_indices(
            g,
            sort_keys=[("rev_cents", "descending"),
                       ("o_custkey", "ascending")],
        )
        return g.take(idx.slice(0, Q10_TOPK))

    trimmed = _keyed_bucket_fold(partials, "o_custkey", fold)
    parts = list(trimmed.iter_batches(batch_format="pyarrow"))
    empty = pa.table(
        {
            "rnk": pa.array([], pa.int64()),
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "n_name": pa.array([], pa.string()),
            "rev_cents": pa.array([], pa.int64()),
        }
    )
    if not parts:
        return empty
    merged = pa.concat_tables(parts).combine_chunks()
    idx = pc.sort_indices(
        merged,
        sort_keys=[("rev_cents", "descending"), ("o_custkey", "ascending")],
    )
    top = merged.take(idx.slice(0, Q10_TOPK))
    if top.num_rows == 0:
        return empty
    win_keys = pc.cast(top.column("o_custkey"), pa.int64()).combine_chunks()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])

    def cust_trim(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.is_in(pc.cast(b.column("c_custkey"), pa.int64()),
                     value_set=win_keys)
        )

    cust_rows = pa.concat_tables(
        cust.map_batches(
            cust_trim, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    )
    nk2name = {}
    for b in _read(sf_dir, "nation", ["n_nationkey", "n_name"]).iter_batches(
        batch_format="pyarrow"
    ):
        for nk, nn in zip(b.column("n_nationkey").to_pylist(),
                          b.column("n_name").to_pylist()):
            nk2name[nk] = nn
    name_by_key = dict(
        zip(cust_rows.column("c_custkey").to_pylist(),
            cust_rows.column("c_name").to_pylist())
    )
    nat_by_key = dict(
        zip(cust_rows.column("c_custkey").to_pylist(),
            cust_rows.column("c_nationkey").to_pylist())
    )
    keys = win_keys.to_pylist()
    return pa.table(
        {
            "rnk": pa.array(
                np.arange(1, len(keys) + 1, dtype=np.int64)
            ),
            "c_custkey": pa.array(keys, pa.int64()),
            "c_name": pa.array(
                [name_by_key[k] for k in keys], pa.string()
            ),
            "n_name": pa.array(
                [nk2name[nat_by_key[k]] for k in keys], pa.string()
            ),
            "rev_cents": pc.cast(top.column("rev_cents"), pa.int64()),
        }
    )


SQL_RETURNED_CUSTOMER_REVENUE = f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND epoch_us(o_orderdate) >= {Q10_LO_US}
    AND epoch_us(o_orderdate) < {Q10_HI_US}
  GROUP BY o_custkey
)
SELECT CAST(row_number() OVER (ORDER BY rev_cents DESC, o_custkey)
            AS BIGINT) AS rnk,
       c_custkey, c_name, n_name, rev_cents
FROM rev
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
ORDER BY rev_cents DESC, c_custkey
LIMIT {Q10_TOPK}
"""


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: cross-nation trade volume by year
# ---------------------------------------------------------------------------
Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_LO_US = 820_454_400_000_000  # 1996-01-01 epoch microseconds
Q7_HI_US = 883_612_800_000_000  # 1998-01-01


def q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape: shipped revenue flowing BETWEEN two nations
    (supplier in one, ordering customer in the other, both directions)
    per (supp_nation, cust_nation, ship year) over a two-year window —
    the double-dimension-join fact query.

    Scale composition, one all-to-all exchange: nation resolves
    driver-side (dimension-tiny by nature); supplier broadcasts
    suppkey -> nationkey once via _broadcast_lookup; customer uses the
    same broadcast WITH the hash_join fallback past BROADCAST_ROW_LIMIT
    (it is a fact at high sf). Both fact sides pre-filter to the
    two-nation set and the ship-date window BEFORE the lineitem x
    orders bucket join, and bucket_post applies the cross-nation
    predicate and collapses each bucket to <= 2 pairs x #years rows, so
    the final groupby moves only O(#buckets) tiny partials."""
    import ray as _ray

    nk2name = {}
    for b in _read(sf_dir, "nation", ["n_nationkey", "n_name"]).iter_batches(
        batch_format="pyarrow"
    ):
        for nk, nn in zip(b.column("n_nationkey").to_pylist(),
                          b.column("n_name").to_pylist()):
            nk2name[nk] = nn
    pair_keys = sorted(
        nk for nk, nn in nk2name.items() if nn in (Q7_NATION_A, Q7_NATION_B)
    )
    pair_set = pa.array(pair_keys, pa.int64())

    supp_ref = _broadcast_lookup(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey",
    )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"],
    )

    def li_shape(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("l_shipdate"), pa.int64())
        keep = pc.and_(
            pc.greater_equal(t_us, pa.scalar(Q7_LO_US, pa.int64())),
            pc.less(t_us, pa.scalar(Q7_HI_US, pa.int64())),
        )
        b = b.filter(keep)
        keys_arr, vals_arr = _ray.get(supp_ref)
        sn = pc.cast(
            _probe(b.column("l_suppkey"), keys_arr, vals_arr), pa.int64()
        )
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "s_nat": sn,
                "l_year": pc.cast(pc.year(b.column("l_shipdate")),
                                  pa.int64()),
                "rev_cents": _cents(rev),
            }
        ).filter(pc.is_in(sn, value_set=pair_set))

    li_proj = li.map_batches(
        li_shape, batch_format="pyarrow", zero_copy_batch=True
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    small = _collect_small_side(
        cust, "c_custkey", "c_nationkey", BROADCAST_ROW_LIMIT
    )
    if small is None:
        from ..stages.join import hash_join as _hj

        cust_keyed = cust.map_batches(
            lambda b: pa.table(
                {
                    "o_custkey": b.column("c_custkey"),
                    "c_nat": pc.cast(b.column("c_nationkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        orders_nat = _hj(orders, cust_keyed, key="o_custkey", how="inner")
        orders_nat = orders_nat.map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "c_nat": b.column("c_nat"),
                }
            ).filter(pc.is_in(b.column("c_nat"), value_set=pair_set)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    else:
        cust_ref = _ray.put(small)

        def attach_cnat(b: pa.Table) -> pa.Table:
            keys_arr, vals_arr = _ray.get(cust_ref)
            cn = pc.cast(
                _probe(b.column("o_custkey"), keys_arr, vals_arr),
                pa.int64(),
            )
            return pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "c_nat": cn,
                }
            ).filter(pc.is_in(cn, value_set=pair_set))

        orders_nat = orders.map_batches(
            attach_cnat, batch_format="pyarrow", zero_copy_batch=True
        )

    def bucket_post(joined: pa.Table) -> pa.Table:
        m = joined.filter(
            pc.not_equal(joined.column("s_nat"), joined.column("c_nat"))
        )
        g = m.group_by(["s_nat", "c_nat", "l_year"]).aggregate(
            [("rev_cents", "sum")]
        )
        return g.rename_columns(["s_nat", "c_nat", "l_year", "rev_cents"])

    from ..stages.join import hash_join

    per_bucket = hash_join(
        li_proj, orders_nat, key="o_orderkey", how="inner",
        bucket_post=bucket_post,
    )
    totals = per_bucket.groupby(["s_nat", "c_nat", "l_year"]).aggregate(
        Sum("rev_cents", alias_name="rev_cents")
    )
    parts = list(totals.iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table(
            {
                "supp_nation": pa.array([], pa.string()),
                "cust_nation": pa.array([], pa.string()),
                "l_year": pa.array([], pa.int64()),
                "rev_cents": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(parts).combine_chunks()
    out = pa.table(
        {
            "supp_nation": pa.array(
                [nk2name[k] for k in t.column("s_nat").to_pylist()],
                pa.string(),
            ),
            "cust_nation": pa.array(
                [nk2name[k] for k in t.column("c_nat").to_pylist()],
                pa.string(),
            ),
            "l_year": pc.cast(t.column("l_year"), pa.int64()),
            "rev_cents": pc.cast(t.column("rev_cents"), pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("supp_nation", "ascending"),
                       ("cust_nation", "ascending"),
                       ("l_year", "ascending")],
        )
    )


SQL_NATION_TRADE_VOLUME = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
    OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
  AND epoch_us(l_shipdate) >= {Q7_LO_US}
  AND epoch_us(l_shipdate) < {Q7_HI_US}
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# grouped second moments (the stddev/variance shape, integer-exact)
# ---------------------------------------------------------------------------
def q_value_moments_by_type(sf_dir: str):
    """Grouped dispersion statistics (the VAR/STDDEV shape) in
    overflow-safe integer math: per event_type, the count, sum and sum
    of SQUARES of value in cents. Variance and stddev derive exactly
    from (n, sum, sumsq) downstream; emitting the raw moments keeps
    every column BIGINT-exact for the value-hash oracle (a float stddev
    is not bit-reproducible across engines), and (n, sum, sumsq) is
    precisely the mergeable partial a distributed VAR implementation
    ships anyway.

    Scale composition: each batch collapses to <= #event_types moment
    rows with one arrow group_by (cents^2 peaks ~2.4e9 per row and
    ~5e13 per group at bench volumes — far inside int64), so the one
    groupby moves O(#types) rows per block — the textbook mergeable-
    statistic two-phase."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        c = _cents(b.column("value"))
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "sum_cents": c,
                "sumsq_cents": pc.multiply(c, c),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sum_cents", "sum"), ("sumsq_cents", "sum")]
        )
        return g.rename_columns(
            ["event_type", "n", "sum_cents", "sumsq_cents"]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("sumsq_cents", alias_name="sumsq_cents"),
        )
    )
    parts = list(agg.iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_cents": pa.array([], pa.int64()),
                "sumsq_cents": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(parts).combine_chunks()
    t = pa.table(
        {
            "event_type": t.column("event_type"),
            "n": pc.cast(t.column("n"), pa.int64()),
            "sum_cents": pc.cast(t.column("sum_cents"), pa.int64()),
            "sumsq_cents": pc.cast(t.column("sumsq_cents"), pa.int64()),
        }
    )
    return t.take(
        pc.sort_indices(t, sort_keys=[("event_type", "ascending")])
    )


SQL_VALUE_MOMENTS_BY_TYPE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(c) AS BIGINT) AS sum_cents,
       CAST(sum(c * c) AS BIGINT) AS sumsq_cents
FROM (SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events)
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# INTERSECT shape: customers ordering in BOTH of two years
# ---------------------------------------------------------------------------
INTERSECT_YEAR_A = 1996
INTERSECT_YEAR_B = 1997


def q_repeat_buyer_customers(sf_dir: str):
    """INTERSECT shape: custkeys that placed >= 1 order in BOTH 1996
    and 1997 — the set-intersection of two filtered key streams,
    answered WITHOUT running two scans or a join: one pass folds each
    custkey's per-year presence flags.

    Scale composition: per-batch partials collapse to (custkey, inA,
    inB) flag maxima, then the custkey-hash bucket fold finishes the OR
    and keeps both-years keys inside the bucket — the exchange carries
    at most one row per distinct custkey per block and the driver never
    sees a key (the result streams out at qualifying-customer
    grain)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(b: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(b.column("o_orderdate")), pa.int64())
        in_a = pc.cast(
            pc.equal(yr, pa.scalar(INTERSECT_YEAR_A, pa.int64())),
            pa.int64(),
        )
        in_b = pc.cast(
            pc.equal(yr, pa.scalar(INTERSECT_YEAR_B, pa.int64())),
            pa.int64(),
        )
        t = pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "in_a": in_a,
                "in_b": in_b,
            }
        ).filter(
            pc.or_(pc.equal(in_a, pa.scalar(1, pa.int64())),
                   pc.equal(in_b, pa.scalar(1, pa.int64())))
        )
        g = t.group_by(["o_custkey"]).aggregate(
            [("in_a", "max"), ("in_b", "max")]
        )
        return g.rename_columns(["o_custkey", "in_a", "in_b"])

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate(
            [("in_a", "max"), ("in_b", "max")]
        )
        g = g.rename_columns(["o_custkey", "in_a", "in_b"])
        both = pc.and_(
            pc.equal(g.column("in_a"), pa.scalar(1, pa.int64())),
            pc.equal(g.column("in_b"), pa.scalar(1, pa.int64())),
        )
        return g.filter(both).select(["o_custkey"])

    return _keyed_bucket_fold(
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "o_custkey",
        fold,
    )


SQL_REPEAT_BUYER_CUSTOMERS = f"""
SELECT o_custkey FROM orders
WHERE year(o_orderdate) = {INTERSECT_YEAR_A}
INTERSECT
SELECT o_custkey FROM orders
WHERE year(o_orderdate) = {INTERSECT_YEAR_B}
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast-revenue filter-sum with scan-level pushdown
# ---------------------------------------------------------------------------
Q6_LO_US = 820_454_400_000_000  # 1996-01-01 epoch microseconds
Q6_HI_US = 852_076_800_000_000  # 1997-01-01
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_MAX_QTY = 24.0


def q_forecast_revenue_change(sf_dir: str):
    """TPC-H Q6 shape: the would-be revenue increase from dropping a
    discount band — sum(l_extendedprice * l_discount) over one ship
    year, a discount window and small quantities. The archetypal
    scan-bound query: no join, no keyed shuffle, ONE global scalar.

    Scale composition: the discount band and quantity cap are pushed
    into the parquet fragment scanner as a pyarrow dataset expression
    (row-group statistics prune whole groups; non-matching rows never
    materialize), the ship-year window applies vectorized per batch,
    and each block collapses to a single (rev, n) partial row — the
    driver folds #blocks tiny rows, the distributed plan moves nothing
    else. Both engines compare the same stored doubles against the same
    literals, so the float predicate is deterministic across Ray and
    the oracle."""
    import pyarrow.dataset as pads

    ds = _read(
        sf_dir, "lineitem",
        ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
        filter_expr=(
            (pads.field("l_discount") >= Q6_DISC_LO)
            & (pads.field("l_discount") <= Q6_DISC_HI)
            & (pads.field("l_quantity") < Q6_MAX_QTY)
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("l_shipdate"), pa.int64())
        keep = pc.and_(
            pc.greater_equal(t_us, pa.scalar(Q6_LO_US, pa.int64())),
            pc.less(t_us, pa.scalar(Q6_HI_US, pa.int64())),
        )
        b = b.filter(keep)
        rev = _cents(
            pc.multiply(b.column("l_extendedprice"), b.column("l_discount"))
        )
        return pa.table(
            {
                "forecast_rev_cents": pa.array(
                    [int(pc.sum(rev).as_py() or 0)], pa.int64()
                ),
                "n_items": pa.array([b.num_rows], pa.int64()),
            }
        )

    rev_total = 0
    n_total = 0
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        rev_total += int(pc.sum(b.column("forecast_rev_cents")).as_py() or 0)
        n_total += int(pc.sum(b.column("n_items")).as_py() or 0)
    return pa.table(
        {
            "forecast_rev_cents": pa.array([rev_total], pa.int64()),
            "n_items": pa.array([n_total], pa.int64()),
        }
    )


SQL_FORECAST_REVENUE_CHANGE = f"""
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * l_discount * 100)
                              AS BIGINT)), 0) AS BIGINT)
         AS forecast_rev_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE epoch_us(l_shipdate) >= {Q6_LO_US}
  AND epoch_us(l_shipdate) < {Q6_HI_US}
  AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI}
  AND l_quantity < {Q6_MAX_QTY}
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: a nation's market share inside one region, by year
# ---------------------------------------------------------------------------
Q8_REGION = "EUROPE"
Q8_NATION = "NATION_3"
Q8_PART_TYPE = "ECONOMY"
Q8_LO_US = 820_454_400_000_000  # 1996-01-01 epoch microseconds
Q8_HI_US = 883_612_800_000_000  # 1998-01-01


def q_nation_market_share(sf_dir: str):
    """TPC-H Q8 shape: one supplier nation's share of the revenue on a
    part type sold into one region, per order year — numerator and
    denominator emitted as BIGINT cents plus the integer-ppm share, so
    the ratio is exact on the reader's side (a float division would not
    value-hash reproducibly).

    Scale composition, one all-to-all exchange: nation x region resolve
    driver-side (dimension-tiny by nature); part membership and
    supplier nation broadcast once via _broadcast_lookup (dimension-
    sized; guardrail raises past BROADCAST_ROW_LIMIT); customer probes
    through _collect_small_side WITH the hash_join fallback (it is a
    fact at high sf). Lineitem pre-filters to the part type before the
    lineitem x orders bucket join, orders pre-filter to the region and
    the date window, and bucket_post collapses each bucket to
    <= #years x 2 partial rows, so the final groupby moves only
    O(#buckets) tiny partials."""
    import ray as _ray

    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    region_keys = set()
    for b in region.iter_batches(batch_format="pyarrow"):
        for rk, rn in zip(b.column("r_regionkey").to_pylist(),
                          b.column("r_name").to_pylist()):
            if rn == Q8_REGION:
                region_keys.add(rk)
    in_region = []
    target_nk = None
    for b in nation.iter_batches(batch_format="pyarrow"):
        for nk, nn, rk in zip(b.column("n_nationkey").to_pylist(),
                              b.column("n_name").to_pylist(),
                              b.column("n_regionkey").to_pylist()):
            if rk in region_keys:
                in_region.append(nk)
            if nn == Q8_NATION:
                target_nk = nk
    in_region_set = pa.array(sorted(in_region), pa.int64())

    part_ref = _broadcast_lookup(
        _read(sf_dir, "part", ["p_partkey", "p_type"]),
        "p_partkey", "p_type",
    )
    supp_ref = _broadcast_lookup(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey",
    )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"],
    )

    def li_shape(b: pa.Table) -> pa.Table:
        pk, pv = _ray.get(part_ref)
        ptype = _probe(b.column("l_partkey"), pk, pv)
        b = b.filter(pc.equal(ptype, pa.scalar(Q8_PART_TYPE)))
        sk, sv = _ray.get(supp_ref)
        sn = pc.cast(_probe(b.column("l_suppkey"), sk, sv), pa.int64())
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        rev_c = _cents(rev)
        is_target = pc.cast(
            pc.equal(sn, pa.scalar(int(target_nk), pa.int64())),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "nation_cents": pc.multiply(rev_c, is_target),
                "rev_cents": rev_c,
            }
        )

    li_proj = li.map_batches(
        li_shape, batch_format="pyarrow", zero_copy_batch=True
    )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    small = _collect_small_side(
        cust, "c_custkey", "c_nationkey", BROADCAST_ROW_LIMIT
    )

    def orders_window(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("o_orderdate"), pa.int64())
        keep = pc.and_(
            pc.greater_equal(t_us, pa.scalar(Q8_LO_US, pa.int64())),
            pc.less(t_us, pa.scalar(Q8_HI_US, pa.int64())),
        )
        b = b.filter(keep)
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "o_year": pc.cast(pc.year(b.column("o_orderdate")),
                                  pa.int64()),
            }
        )

    orders_w = orders.map_batches(
        orders_window, batch_format="pyarrow", zero_copy_batch=True
    )
    if small is None:
        from ..stages.join import hash_join as _hj

        cust_keyed = cust.map_batches(
            lambda b: pa.table(
                {
                    "o_custkey": b.column("c_custkey"),
                    "c_nat": pc.cast(b.column("c_nationkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        orders_nat = _hj(orders_w, cust_keyed, key="o_custkey",
                         how="inner")
        orders_nat = orders_nat.map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "o_year": b.column("o_year"),
                }
            ).filter(
                pc.is_in(b.column("c_nat"), value_set=in_region_set)
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    else:
        cust_ref = _ray.put(small)

        def attach_cnat(b: pa.Table) -> pa.Table:
            ck, cv = _ray.get(cust_ref)
            cn = pc.cast(_probe(b.column("o_custkey"), ck, cv), pa.int64())
            return pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "o_year": b.column("o_year"),
                }
            ).filter(pc.is_in(cn, value_set=in_region_set))

        orders_nat = orders_w.map_batches(
            attach_cnat, batch_format="pyarrow", zero_copy_batch=True
        )

    def bucket_post(joined: pa.Table) -> pa.Table:
        g = joined.group_by(["o_year"]).aggregate(
            [("nation_cents", "sum"), ("rev_cents", "sum")]
        )
        return g.rename_columns(["o_year", "nation_cents", "total_cents"])

    from ..stages.join import hash_join

    per_bucket = hash_join(
        li_proj, orders_nat, key="o_orderkey", how="inner",
        bucket_post=bucket_post,
    )
    totals = per_bucket.groupby("o_year").aggregate(
        Sum("nation_cents", alias_name="nation_cents"),
        Sum("total_cents", alias_name="total_cents"),
    )
    parts = list(totals.iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table(
            {
                "o_year": pa.array([], pa.int64()),
                "nation_cents": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64()),
                "share_ppm": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(parts).combine_chunks()
    t = t.take(pc.sort_indices(t, sort_keys=[("o_year", "ascending")]))
    nc = pc.cast(t.column("nation_cents"), pa.int64()).to_pylist()
    tc = pc.cast(t.column("total_cents"), pa.int64()).to_pylist()
    # python ints: nation_cents * 1e6 can exceed int64 at high sf and
    # numpy would wrap silently where the oracle's HUGEINT does not
    share = [(n * 1_000_000) // d if d > 0 else 0 for n, d in zip(nc, tc)]
    return pa.table(
        {
            "o_year": pc.cast(t.column("o_year"), pa.int64()),
            "nation_cents": pa.array(nc, pa.int64()),
            "total_cents": pa.array(tc, pa.int64()),
            "share_ppm": pa.array(share, pa.int64()),
        }
    )


SQL_NATION_MARKET_SHARE = f"""
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rev_c,
         CASE WHEN sn.n_name = '{Q8_NATION}' THEN 1 ELSE 0 END AS tgt
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = cn.n_regionkey
  WHERE p_type = '{Q8_PART_TYPE}'
    AND r_name = '{Q8_REGION}'
    AND epoch_us(o_orderdate) >= {Q8_LO_US}
    AND epoch_us(o_orderdate) < {Q8_HI_US}
)
SELECT o_year,
       CAST(sum(rev_c * tgt) AS BIGINT) AS nation_cents,
       CAST(sum(rev_c) AS BIGINT) AS total_cents,
       CAST(CASE WHEN sum(rev_c) > 0
                 THEN (sum(rev_c * tgt) * 1000000) // sum(rev_c)
                 ELSE 0 END AS BIGINT) AS share_ppm
FROM vol
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# term-match retrieval: top-k documents for a bag-of-words query
# ---------------------------------------------------------------------------
SEARCH_TERMS = ("spark", "merge", "window", "sort")
SEARCH_TOPK = 15


def q_term_search_topk(sf_dir: str):
    """Bag-of-words retrieval: score every document by its total term
    frequency over a fixed query-term set and return the global top-k
    as (rnk, doc_id, score) — the keyword-search primitive a corpus
    triage stack runs before semantic rerank. Tiebreak doc_id ASC so
    ranks are total-order deterministic.

    Scale composition: embarrassingly parallel scoring (the measured
    str.split kernel shared with add_token_stats; the query set is a
    per-task frozenset constant — nothing broadcasts), zero-score docs
    drop in-batch, each block trims to its OWN top-k, and the driver
    merges <= k x #blocks candidate rows — no shuffle anywhere,
    independent of corpus size."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = frozenset(SEARCH_TERMS)

    def score_trim(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        scores = np.fromiter(
            (
                sum(1 for x in (t or "").split() if x in terms)
                for t in b.column("text").to_pylist()
            ),
            dtype=np.int64,
            count=b.num_rows,
        )
        keep = scores > 0
        ids, scores = ids[keep], scores[keep]
        order = np.lexsort((ids, -scores))[:SEARCH_TOPK]
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "score": pa.array(scores[order]),
            }
        )

    cands = []
    for b in ds.map_batches(
        score_trim, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        cands.append(b)
    if not cands:
        return pa.table(
            {
                "rnk": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(cands).combine_chunks()
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    scores = t.column("score").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -scores))[:SEARCH_TOPK]
    return pa.table(
        {
            "rnk": pa.array(
                np.arange(1, order.size + 1, dtype=np.int64)
            ),
            "doc_id": pa.array(ids[order]),
            "score": pa.array(scores[order]),
        }
    )


_SEARCH_IN = ", ".join(f"'{w}'" for w in SEARCH_TERMS)
SQL_TERM_SEARCH_TOPK = f"""
WITH s AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'),
                         x -> x IN ({_SEARCH_IN}))) AS score
  FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT)
         AS rnk,
       doc_id, CAST(score AS BIGINT) AS score
FROM s WHERE score > 0
ORDER BY score DESC, doc_id ASC
LIMIT {SEARCH_TOPK}
"""


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: part-filtered revenue by supplier nation x order year
# ---------------------------------------------------------------------------
Q9_PART_TOKEN = "widget"


def q_part_nation_revenue(sf_dir: str):
    """TPC-H Q9 shape (the profit rollup, sans partsupp which the test
    corpus does not carry): revenue of line items whose PART NAME
    contains a token, grouped by the supplier's nation and the order
    year — part-filter x supplier-dimension x order-date rollup.

    Scale composition, one all-to-all exchange: nation resolves
    driver-side (tiny by nature); the FILTERED part keyset broadcasts
    once under BROADCAST_ROW_LIMIT (a name-token filter keeps a
    dimension-sized slice; partitioned hash_join fallback beyond the
    limit); supplier broadcasts suppkey -> nationkey via
    _broadcast_lookup. lineitem pre-filters to matching parts and
    attaches s_nat BEFORE the lineitem x orders bucket join, and
    bucket_post collapses every bucket to <= #nations x #years
    partials, so the final groupby shuffles only O(#buckets) tiny
    rows."""
    import ray as _ray

    from ..stages.join import hash_join

    nk2name = {}
    for b in _read(sf_dir, "nation", ["n_nationkey", "n_name"]).iter_batches(
        batch_format="pyarrow"
    ):
        for nk, nn in zip(b.column("n_nationkey").to_pylist(),
                          b.column("n_name").to_pylist()):
            nk2name[nk] = nn

    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        lambda b: pa.table({"p_partkey": b.column("p_partkey")}).filter(
            pc.match_substring(b.column("p_name"), Q9_PART_TOKEN)
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    small = _collect_small_side(
        part, "p_partkey", "p_partkey", BROADCAST_ROW_LIMIT
    )
    supp_ref = _broadcast_lookup(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey",
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"],
    )
    if small is None:
        # filtered part slice too big to broadcast: partitioned
        # semi-join on the part key first (narrow projections only)
        part_marked = part.map_batches(
            lambda b: b.append_column(
                "p_hit", pa.array(np.ones(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        li_keyed = li.map_batches(
            lambda b: pa.table(
                {
                    "p_partkey": b.column("l_partkey"),
                    "l_orderkey": b.column("l_orderkey"),
                    "l_suppkey": b.column("l_suppkey"),
                    "l_extendedprice": b.column("l_extendedprice"),
                    "l_discount": b.column("l_discount"),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        li = hash_join(li_keyed, part_marked, key="p_partkey", how="inner")
    else:
        keys_ref = _ray.put(small[0])

        def part_filter(b: pa.Table) -> pa.Table:
            keys_arr = _ray.get(keys_ref)
            return b.filter(
                pc.is_in(b.column("l_partkey"), value_set=keys_arr)
            )

        li = li.map_batches(
            part_filter, batch_format="pyarrow", zero_copy_batch=True
        )

    def li_shape(b: pa.Table) -> pa.Table:
        keys_arr, vals_arr = _ray.get(supp_ref)
        sn = pc.cast(
            _probe(b.column("l_suppkey"), keys_arr, vals_arr), pa.int64()
        )
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "s_nat": sn,
                "rev_cents": _cents(rev),
            }
        ).filter(pc.is_valid(sn))

    li_proj = li.map_batches(
        li_shape, batch_format="pyarrow", zero_copy_batch=True
    )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_year": pc.cast(
                    pc.year(b.column("o_orderdate")), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def bucket_post(joined: pa.Table) -> pa.Table:
        g = joined.group_by(["s_nat", "o_year"]).aggregate(
            [("rev_cents", "sum")]
        )
        return g.rename_columns(["s_nat", "o_year", "rev_cents"])

    partials = hash_join(
        li_proj, orders, key="o_orderkey", how="inner",
        bucket_post=bucket_post,
    )
    agg = partials.groupby(["s_nat", "o_year"]).aggregate(
        Sum("rev_cents", alias_name="rev_cents")
    )

    def name_rows(b: pa.Table) -> pa.Table:
        # #nations x #years rows by construction — the python map over
        # the tiny driver-resolved nation dimension is bounded
        nk = b.column("s_nat").to_pylist()
        return pa.table(
            {
                "n_name": pa.array(
                    [nk2name.get(int(k)) for k in nk], pa.string()
                ),
                "o_year": b.column("o_year"),
                "rev_cents": b.column("rev_cents"),
            }
        )

    return agg.map_batches(
        name_rows, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_PART_NATION_REVENUE = f"""
SELECT n_name,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%{Q9_PART_TOKEN}%'
GROUP BY n_name, o_year
"""


# ---------------------------------------------------------------------------
# CEP negation pattern: clicks NOT followed by a purchase within a window
# ---------------------------------------------------------------------------
ABANDON_WINDOW_US = HOUR_US


def q_click_abandonment(sf_dir: str):
    """CEP negation pattern (the anti-funnel): per user, how many click
    events were NOT followed by a purchase within one hour — the
    absence-of-event shape that windowed pair joins and strict
    contiguity both cannot express (a match is defined by NO row
    existing in the interval).

    Scale design: groupby(user).map_groups; per key the state is two
    sorted timestamp arrays and the negation resolves as a vectorized
    searchsorted interval-emptiness test over (c, c + W] — never a
    cross join, never driver state. Same bounded-per-user-partition
    assumption as the other per-key CEP sweeps."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def count_abandoned(group: pa.Table) -> pa.Table:
        et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        clicks = np.sort(ts[et == "click"])
        if clicks.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_abandoned": pa.array([], pa.int64()),
                }
            )
        uid = group.column("user_id")[0].as_py()
        purchases = np.sort(ts[et == "purchase"])
        # strictly-after start, inclusive end: purchases in (c, c + W]
        lo = np.searchsorted(purchases, clicks, side="right")
        hi = np.searchsorted(
            purchases, clicks + ABANDON_WINDOW_US, side="right"
        )
        n = int((hi == lo).sum())
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_abandoned": pa.array([n], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(
        count_abandoned, batch_format="pyarrow"
    )


SQL_CLICK_ABANDONMENT = f"""
WITH c AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'click'),
     p AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'purchase')
SELECT user_id,
       CAST(sum(CASE WHEN NOT EXISTS (
                  SELECT 1 FROM p
                  WHERE p.user_id = c.user_id
                    AND p.t > c.t AND p.t - c.t <= {ABANDON_WINDOW_US})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned
FROM c GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Global top-k adjacent-token bigrams (collocation mining)
# ---------------------------------------------------------------------------
BIGRAM_TOPK = 50


def _bigram_partial(b: pa.Table) -> pa.Table:
    """Per-batch vectorized bigram partial: split once per batch (RE2),
    adjacency straight from the flattened list offsets via a doc-id
    shift — zero per-row python — pre-counted so the exchange carries
    at most one row per distinct bigram per block."""
    toks = pc.split_pattern_regex(b.column("text"), pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    did = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    keep = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    did = did[keep]
    empty = pa.table(
        {
            "bigram": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    if did.size < 2:
        return empty
    adj = did[1:] == did[:-1]
    left = flat.slice(0, len(flat) - 1).filter(pa.array(adj))
    right = flat.slice(1).filter(pa.array(adj))
    bg = pc.binary_join_element_wise(left, right, " ")
    t = pa.table(
        {
            "bigram": bg,
            "cnt": pa.array(np.ones(len(bg), dtype=np.int64)),
        }
    )
    agg = t.group_by(["bigram"]).aggregate([("cnt", "sum")])
    return agg.rename_columns(["bigram", "cnt"])


def q_bigram_topk(sf_dir: str):
    """Global top-k adjacent-token bigrams over the document corpus
    (count DESC, bigram ASC) — the collocation-mining primitive behind
    phrase vocabularies and BPE-merge seeding.

    Scale design: _bigram_partial pre-counts per batch, the single
    all-to-all is the native groupby-sum over (bigram) partials, then
    each output block trims to its OWN top-k so the driver merges at
    most k x #blocks candidate rows — never the distinct-bigram
    table."""
    ds = _read(sf_dir, "documents", ["text"], heavy=True)
    agg = (
        ds.map_batches(
            _bigram_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bigram")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def trim(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("cnt", "descending"), ("bigram", "ascending")]
        )
        return b.take(idx.slice(0, BIGRAM_TOPK))

    parts = list(
        agg.map_batches(
            trim, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    )
    if not parts:
        return pa.table(
            {
                "bigram": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(parts).combine_chunks()
    idx = pc.sort_indices(
        merged, sort_keys=[("cnt", "descending"), ("bigram", "ascending")]
    )
    return merged.select(["bigram", "cnt"]).take(idx.slice(0, BIGRAM_TOPK))


SQL_BIGRAM_TOPK = f"""
WITH d AS (
  SELECT list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
b AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d)
)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM b
GROUP BY bigram
ORDER BY cnt DESC, bigram ASC
LIMIT {BIGRAM_TOPK}
"""


# ---------------------------------------------------------------------------
# NTILE quartile rollup per nation (windowed bucket assignment)
# ---------------------------------------------------------------------------
NTILE_BUCKETS = 4


def q_customer_balance_ntiles(sf_dir: str):
    """NTILE(4) quartile rollup: split each nation's customers into 4
    balance quartiles (acctbal DESC, custkey tiebreak; SQL NTILE's
    front-loaded bucket sizes) and report per-(nation, tile) customer
    count and total balance in integer cents.

    Scale design: groupby(nation).map_groups with a vectorized lexsort
    + np.repeat tile assignment; each group COLLAPSES to <= 4 rows
    inside the task, so the shuffle output is 4 x #nations tiny rows
    and the only exchange is the groupby itself."""
    ds = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def tiles(group: pa.Table) -> pa.Table:
        nk = int(group.column("c_nationkey")[0].as_py())
        bal = group.column("c_acctbal").to_numpy(zero_copy_only=False)
        ck = group.column("c_custkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -bal))
        cents = _cents(group.column("c_acctbal")).to_numpy(
            zero_copy_only=False
        )[order]
        n = order.size
        base, rem = divmod(n, NTILE_BUCKETS)
        sizes = np.array(
            [base + (1 if i < rem else 0) for i in range(NTILE_BUCKETS)],
            dtype=np.int64,
        )
        sizes = sizes[sizes > 0]
        starts = np.concatenate(
            ([0], np.cumsum(sizes)[:-1])
        ).astype(np.int64)
        sums = np.add.reduceat(cents, starts)
        return pa.table(
            {
                "nationkey": pa.array([nk] * sizes.size, pa.int64()),
                "tile": pa.array(
                    np.arange(1, sizes.size + 1, dtype=np.int64)
                ),
                "n_cust": pa.array(sizes),
                "bal_cents": pa.array(sums),
            }
        )

    return ds.groupby("c_nationkey").map_groups(
        tiles, batch_format="pyarrow"
    )


SQL_CUSTOMER_BALANCE_NTILES = f"""
WITH t AS (
  SELECT c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
         ntile({NTILE_BUCKETS}) OVER (
           PARTITION BY c_nationkey
           ORDER BY c_acctbal DESC, c_custkey ASC) AS tile
  FROM customer
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(tile AS BIGINT) AS tile,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(cents) AS BIGINT) AS bal_cents
FROM t GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Pareto concentration: revenue share of the top decile of customers
# ---------------------------------------------------------------------------


def q_top_decile_revenue_share(sf_dir: str):
    """Pareto concentration: what share of total order revenue the top
    decile of customers by lifetime spend carries (k = ceil(n/10)) —
    the global-order-statistic rollup behind "top X% of users drive Y%
    of revenue" dashboards.

    Scale design: per-customer spend folds in custkey-hash buckets (the
    Q18 pattern — no high-cardinality Ray groupby); the decile
    THRESHOLD resolves via exact histogram rank-select
    (stages/sketch.py:rank_select — a few shuffle-free refinement
    passes); the top-decile mass then folds in ONE pass as
    (sum-above, count-above, total) partials with the tie mass at the
    threshold reconstructed arithmetically (tied spends contribute
    identical amounts, so the sum is deterministic without choosing
    which tied customers are "in"). Nothing sorts and the driver never
    sees a customer row."""
    from ..stages.hashing import mix_rounds
    from ..stages.sketch import rank_select

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def spend_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c": b.column("o_custkey"),
                "spend": _cents(b.column("o_totalprice")),
            }
        )
        g = (
            t.group_by(["c"])
            .aggregate([("spend", "sum")])
            .rename_columns(["c", "spend"])
        )
        ck = g.column("c").to_numpy(zero_copy_only=False)
        bucket = (
            mix_rounds(ck.astype(np.uint64)) % np.uint64(Q17_NUM_BUCKETS)
        ).astype(np.int64)
        return g.append_column("bucket", pa.array(bucket))

    def spend_fold(t: pa.Table) -> pa.Table:
        # a custkey-hash bucket holds every partial of its customers,
        # so the lifetime sum COMPLETES locally
        return (
            t.select(["c", "spend"])
            .group_by(["c"])
            .aggregate([("spend", "sum")])
            .rename_columns(["c", "spend"])
        )

    spends = (
        orders.map_batches(
            spend_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(spend_fold, batch_format="pyarrow")
        .materialize()  # customer grain; consumed by 3+ passes below
    )
    n = spends.count()
    if n == 0:
        return pa.table(
            {
                "n_cust": pa.array([], pa.int64()),
                "k_top": pa.array([], pa.int64()),
                "top_cents": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64()),
                "share_ppm": pa.array([], pa.int64()),
            }
        )
    k = (n + 9) // 10
    # k-th largest spend == ascending 0-based rank (n - k)
    thr = int(round(rank_select(spends, "spend", [n - k])[0]))

    def above_partial(b: pa.Table) -> pa.Table:
        s = b.column("spend").to_numpy(zero_copy_only=False)
        gt = s[s > thr]
        return pa.table(
            {
                "sum_gt": pa.array([int(gt.sum())], pa.int64()),
                "n_gt": pa.array([gt.size], pa.int64()),
                "total": pa.array([int(s.sum())], pa.int64()),
            }
        )

    sum_gt = n_gt = total = 0
    for b in spends.map_batches(
        above_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        sum_gt += int(pc.sum(b.column("sum_gt")).as_py() or 0)
        n_gt += int(pc.sum(b.column("n_gt")).as_py() or 0)
        total += int(pc.sum(b.column("total")).as_py() or 0)
    top_cents = sum_gt + (k - n_gt) * thr
    return pa.table(
        {
            "n_cust": pa.array([n], pa.int64()),
            "k_top": pa.array([k], pa.int64()),
            "top_cents": pa.array([top_cents], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
            "share_ppm": pa.array(
                [top_cents * 1_000_000 // total], pa.int64()
            ),
        }
    )


SQL_TOP_DECILE_REVENUE_SHARE = """
WITH s AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend
  FROM orders GROUP BY o_custkey
), r AS (
  SELECT spend,
         row_number() OVER (ORDER BY spend DESC, o_custkey ASC) AS rn,
         count(*) OVER () AS n_cust
  FROM s
)
SELECT CAST(n_cust AS BIGINT) AS n_cust,
       CAST((n_cust + 9) // 10 AS BIGINT) AS k_top,
       CAST(sum(CASE WHEN rn <= (n_cust + 9) // 10
                     THEN spend ELSE 0 END) AS BIGINT) AS top_cents,
       CAST(sum(spend) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN rn <= (n_cust + 9) // 10
                     THEN spend ELSE 0 END) * 1000000
            // sum(spend) AS BIGINT) AS share_ppm
FROM r GROUP BY n_cust
"""


# ---------------------------------------------------------------------------
# Customer reorder-gap histogram (per-key lag over the orders fact)
# ---------------------------------------------------------------------------


def q_customer_reorder_gaps(sf_dir: str):
    """Reorder-cadence histogram: for every consecutive pair of orders
    by the same customer (ordered by orderdate, orderkey), the gap in
    whole days — rolled up to (gap_days, n_gaps). The
    repeat-purchase-cadence curve behind retention dashboards.

    Scale design: the per-key LAG resolves inside custkey-hash buckets
    (every order of a customer lands in ONE bucket, so the lag is
    complete locally — the Q18 bucket-fold pattern, no high-cardinality
    Ray groupby and no global sort); each bucket emits a pre-counted
    histogram partial, so the final exchange is bounded by the
    distinct-gap support (~10^3 days), not by #orders."""
    from ..stages.hashing import mix_rounds

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def route(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        bucket = (
            mix_rounds(ck.astype(np.uint64)) % np.uint64(Q17_NUM_BUCKETS)
        ).astype(np.int64)
        return pa.table(
            {
                "c": b.column("o_custkey"),
                "k": b.column("o_orderkey"),
                "t": pc.cast(b.column("o_orderdate"), pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def bucket_lag_hist(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, ts, c))
        c, ts = c[order], ts[order]
        same = c[1:] == c[:-1]
        gaps = (ts[1:] - ts[:-1])[same] // DAY_US
        vals, cnt = np.unique(gaps, return_counts=True)
        return pa.table(
            {
                "gap_days": pa.array(vals.astype(np.int64)),
                "n_gaps": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        orders.map_batches(
            route, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(bucket_lag_hist, batch_format="pyarrow")
        .groupby("gap_days")
        .aggregate(Sum("n_gaps", alias_name="n_gaps"))
    )


SQL_CUSTOMER_REORDER_GAPS = """
WITH g AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) AS t,
         lag(epoch_us(o_orderdate)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS pt
  FROM orders
)
SELECT CAST((t - pt) // 86400000000 AS BIGINT) AS gap_days,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM g WHERE pt IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# DAU / trailing-7-day WAU stickiness over the events stream
# ---------------------------------------------------------------------------


def q_dau_wau_stickiness(sf_dir: str):
    """Product-analytics stickiness: per active day, distinct daily
    users (DAU), distinct users over the trailing 7 days (WAU), and
    DAU/WAU in integer ppm.

    Scale design: (day, user) pairs dedup in (day, user)-hash buckets
    with per-batch local dedup partials (pair-grain exchange, one row
    per pair per block); DAU is a two-phase count over the deduped
    pairs; WAU replicates each pair to its 7 covering target days and
    dedups (target_day, user) the same way — a bounded 7x fan-out
    instead of a range self-join. Day-grain DAU and WAU then join in
    one tiny day-grain exchange (days are bounded by the calendar, not
    by event volume)."""
    from ..stages.hashing import mix_rounds
    from ..stages.join import hash_join

    events = _read(sf_dir, "events", ["ts", "user_id"])
    nb = np.uint64(Q17_NUM_BUCKETS)

    def pair_partial(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()), DAY_US)
        t = pa.table({"day": day, "u": b.column("user_id")})
        g = t.group_by(["day", "u"]).aggregate([])
        d = g.column("day").to_numpy(zero_copy_only=False)
        u = g.column("u").to_numpy(zero_copy_only=False)
        h = mix_rounds(
            d.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ mix_rounds(u.astype(np.uint64))
        )
        return g.append_column(
            "bucket", pa.array((h % nb).astype(np.int64))
        )

    def pair_distinct(t: pa.Table) -> pa.Table:
        return t.select(["day", "u"]).group_by(["day", "u"]).aggregate([])

    pairs = (
        events.map_batches(
            pair_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(pair_distinct, batch_format="pyarrow")
        .materialize()  # consumed by both the DAU and WAU branches
    )

    def dau_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "day": b.column("day"),
                "dau": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["day"]).aggregate([("dau", "sum")])
        return g.rename_columns(["day", "dau"])

    dau = (
        pairs.map_batches(
            dau_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("day")
        .aggregate(Sum("dau", alias_name="dau"))
    )

    def wau_explode(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        u = b.column("u").to_numpy(zero_copy_only=False)
        td = (d[:, None] + np.arange(7)[None, :]).ravel()
        uu = np.repeat(u, 7)
        h = mix_rounds(
            td.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ mix_rounds(uu.astype(np.uint64))
        )
        return pa.table(
            {
                "day": pa.array(td.astype(np.int64)),
                "u": pa.array(uu),
                "bucket": pa.array((h % nb).astype(np.int64)),
            }
        )

    def wau_fold(t: pa.Table) -> pa.Table:
        g = t.select(["day", "u"]).group_by(["day", "u"]).aggregate([])
        h = pa.table(
            {
                "day": g.column("day"),
                "wau": pa.array(np.ones(g.num_rows, dtype=np.int64)),
            }
        )
        out = h.group_by(["day"]).aggregate([("wau", "sum")])
        return out.rename_columns(["day", "wau"])

    wau = (
        pairs.map_batches(
            wau_explode, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(wau_fold, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("wau", alias_name="wau"))
    )

    joined = hash_join(dau, wau, key="day", how="inner")

    def finish(b: pa.Table) -> pa.Table:
        dd = b.column("dau").to_numpy(zero_copy_only=False)
        ww = b.column("wau").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": b.column("day"),
                "dau": b.column("dau"),
                "wau": b.column("wau"),
                "stickiness_ppm": pa.array(
                    (dd * 1_000_000 // ww).astype(np.int64)
                ),
            }
        )

    return joined.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_DAU_WAU_STICKINESS = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
), dau AS (
  SELECT day, count(*) AS dau FROM du GROUP BY day
), wau AS (
  SELECT d.day, count(DISTINCT u.user_id) AS wau
  FROM dau d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
)
SELECT CAST(dau.day AS BIGINT) AS day,
       CAST(dau AS BIGINT) AS dau,
       CAST(wau AS BIGINT) AS wau,
       CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
FROM dau JOIN wau ON wau.day = dau.day
"""


# ---------------------------------------------------------------------------
# Percent-of-group: each nation's share of its region's order revenue
# ---------------------------------------------------------------------------


def q_nation_revenue_share_in_region(sf_dir: str):
    """Percent-of-group rollup: every customer nation's share of its
    REGION's total order revenue, integer ppm — the SUM() OVER
    (PARTITION BY region) window shape on top of a fact-table fold.

    Scale design: orders fold to nationkey grain (<= 25 rows survive)
    via a broadcast custkey -> nationkey probe (hash_join fallback past
    BROADCAST_ROW_LIMIT); the nation/region attach and the
    percent-of-group window resolve driver-side on the nation-grain
    result, which is tiny by nature."""
    import ray as _ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    small = _collect_small_side(
        cust, "c_custkey", "c_nationkey", BROADCAST_ROW_LIMIT
    )
    if small is None:
        from ..stages.join import hash_join

        proj = orders.map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": b.column("o_custkey"),
                    "cents": _cents(b.column("o_totalprice")),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        cust_keyed = cust.map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": b.column("c_custkey"),
                    "nk": pc.cast(b.column("c_nationkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        with_nat = hash_join(proj, cust_keyed, key="c_custkey",
                             how="inner")

        def nat_partial(b: pa.Table) -> pa.Table:
            t = pa.table(
                {"nk": b.column("nk"), "rev": b.column("cents")}
            )
            g = t.group_by(["nk"]).aggregate([("rev", "sum")])
            return g.rename_columns(["nk", "rev"])

        nat_rev = with_nat.map_batches(
            nat_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        cust_ref = _ray.put(small)

        def nat_partial_bcast(b: pa.Table) -> pa.Table:
            keys, vals = _ray.get(cust_ref)
            nk = _probe(b.column("o_custkey"), keys, vals)
            t = pa.table(
                {
                    "nk": pc.cast(nk, pa.int64()),
                    "rev": _cents(b.column("o_totalprice")),
                }
            ).filter(pc.is_valid(nk))
            g = t.group_by(["nk"]).aggregate([("rev", "sum")])
            return g.rename_columns(["nk", "rev"])

        nat_rev = orders.map_batches(
            nat_partial_bcast, batch_format="pyarrow", zero_copy_batch=True
        )
    folded = nat_rev.groupby("nk").aggregate(Sum("rev", alias_name="rev"))

    # nation-grain result: attach names + the percent-of-group window
    # driver-side (<= 25 rows by construction of the schema)
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name",
                                      "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    r2name = {}
    for b in region.iter_batches(batch_format="pyarrow"):
        r2name.update(zip(b.column("r_regionkey").to_pylist(),
                          b.column("r_name").to_pylist()))
    nk2 = {}
    for b in nation.iter_batches(batch_format="pyarrow"):
        for nk, nn, rk in zip(b.column("n_nationkey").to_pylist(),
                              b.column("n_name").to_pylist(),
                              b.column("n_regionkey").to_pylist()):
            nk2[nk] = (nn, r2name[rk])
    rows = []
    for b in folded.iter_batches(batch_format="pyarrow"):
        for nk, rev in zip(b.column("nk").to_pylist(),
                           b.column("rev").to_pylist()):
            nn, rn = nk2[nk]
            rows.append((rn, nn, int(rev)))
    region_total: dict[str, int] = {}
    for rn, _, rev in rows:
        region_total[rn] = region_total.get(rn, 0) + rev
    rows.sort()
    return pa.table(
        {
            "r_name": pa.array([r[0] for r in rows]),
            "n_name": pa.array([r[1] for r in rows]),
            "revenue_cents": pa.array(
                [r[2] for r in rows], pa.int64()
            ),
            "share_ppm": pa.array(
                [r[2] * 1_000_000 // region_total[r[0]] for r in rows],
                pa.int64(),
            ),
        }
    )


SQL_NATION_REVENUE_SHARE_IN_REGION = """
WITH rev AS (
  SELECT c_nationkey AS nk,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1
)
SELECT r_name, n_name,
       CAST(rev AS BIGINT) AS revenue_cents,
       CAST(rev * 1000000
            // sum(rev) OVER (PARTITION BY r_name) AS BIGINT)
         AS share_ppm
FROM rev
JOIN nation ON n_nationkey = nk
JOIN region ON r_regionkey = n_regionkey
"""


# ---------------------------------------------------------------------------
# Cohort retention matrix over the events stream
# ---------------------------------------------------------------------------


def q_user_retention_cohorts(sf_dir: str):
    """Classic cohort retention: users grouped by their FIRST active
    day (the cohort), counted on each later active day as an offset —
    the (cohort_day, day_offset, n_users) triangle behind every
    retention curve.

    Scale design: (user, day) pairs dedup inside user-hash buckets
    (per-batch local dedup partials first), and because every row of a
    user lands in ONE bucket, the cohort anchor (min day) and the
    offsets resolve locally in the same fold — no user-grain shuffle
    ever happens. Buckets emit pre-counted (cohort_day, day_offset)
    partials; the final exchange is bounded by #days^2/2, not by
    events or users."""
    from ..stages.hashing import mix_rounds

    events = _read(sf_dir, "events", ["ts", "user_id"])
    nb = np.uint64(Q17_NUM_BUCKETS)

    def pair_partial(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()), DAY_US)
        t = pa.table({"u": b.column("user_id"), "day": day})
        g = t.group_by(["u", "day"]).aggregate([])
        u = g.column("u").to_numpy(zero_copy_only=False)
        return g.append_column(
            "bucket",
            pa.array(
                (mix_rounds(u.astype(np.uint64)) % nb).astype(np.int64)
            ),
        )

    def cohort_fold(t: pa.Table) -> pa.Table:
        g = t.select(["u", "day"]).group_by(["u", "day"]).aggregate([])
        u = g.column("u").to_numpy(zero_copy_only=False)
        d = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1]))
        )
        # first active day per user, repeated across the user's rows
        counts = np.diff(np.append(starts, u.size))
        first = np.repeat(d[starts], counts)
        off = d - first
        h = pa.table(
            {
                "cohort_day": pa.array(first.astype(np.int64)),
                "day_offset": pa.array(off.astype(np.int64)),
                "n_users": pa.array(np.ones(u.size, dtype=np.int64)),
            }
        )
        agg = h.group_by(["cohort_day", "day_offset"]).aggregate(
            [("n_users", "sum")]
        )
        return agg.rename_columns(
            ["cohort_day", "day_offset", "n_users"]
        )

    return (
        events.map_batches(
            pair_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(cohort_fold, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


SQL_USER_RETENTION_COHORTS = """
WITH du AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
), f AS (
  SELECT user_id, min(day) AS cohort_day FROM du GROUP BY user_id
)
SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
       CAST(day - cohort_day AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM du JOIN f ON f.user_id = du.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Vocabulary growth (Heaps-law type/token ratio) per document source
# ---------------------------------------------------------------------------


def q_vocab_growth_by_source(sf_dir: str):
    """Heaps-law corpus profile: per source, total whitespace tokens,
    distinct tokens, and the type/token ratio in integer ppm — the
    vocabulary-saturation signal that separates natural text from
    template spam in a training corpus.

    Scale design: per-batch (source, token) counts collapse first (one
    row per distinct pair per block), route by TOKEN hash — every
    occurrence of a token lands in one bucket, so global per-(source,
    token) distinctness resolves locally — and each bucket emits ONE
    (source, n_tokens, n_distinct) partial; the final exchange is
    #buckets x #sources tiny rows. Token STRINGS ride the shuffle only
    pre-deduped per batch. Same str.split kernel as add_token_stats
    (bit-compatible with the oracle's string_split_regex)."""
    from ..stages.hashing import hash_strings

    ds = _read(sf_dir, "documents", ["source", "text"], heavy=True)
    nb = np.uint64(Q17_NUM_BUCKETS)

    def tok_partial(b: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for s, t in zip(
            b.column("source").to_pylist(), b.column("text").to_pylist()
        ):
            for tok in (t or "").split():
                counts[(s, tok)] = counts.get((s, tok), 0) + 1
        if not counts:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "tok": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        srcs = [k[0] for k in counts]
        toks = [k[1] for k in counts]
        bucket = (hash_strings(toks) % nb).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "tok": pa.array(toks, pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def bucket_fold(t: pa.Table) -> pa.Table:
        g = (
            t.select(["source", "tok", "cnt"])
            .group_by(["source", "tok"])
            .aggregate([("cnt", "sum")])
        )
        h = pa.table(
            {
                "source": g.column("source"),
                "n_tokens": g.column("cnt_sum"),
                "n_distinct_tokens": pa.array(
                    np.ones(g.num_rows, dtype=np.int64)
                ),
            }
        )
        agg = h.group_by(["source"]).aggregate(
            [("n_tokens", "sum"), ("n_distinct_tokens", "sum")]
        )
        return agg.rename_columns(
            ["source", "n_tokens", "n_distinct_tokens"]
        )

    folded = (
        ds.map_batches(
            tok_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_distinct_tokens", alias_name="n_distinct_tokens"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
        nd = b.column("n_distinct_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b.column("source"),
                "n_tokens": b.column("n_tokens"),
                "n_distinct_tokens": b.column("n_distinct_tokens"),
                "ttr_ppm": pa.array(
                    (nd * 1_000_000 // nt).astype(np.int64)
                ),
            }
        )

    return folded.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_VOCAB_GROWTH_BY_SOURCE = r"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
       CAST(count(DISTINCT tok) * 1000000 // count(*) AS BIGINT)
         AS ttr_ppm
FROM toks GROUP BY source
"""


# ---------------------------------------------------------------------------
# Hour-of-day seasonality profile of the events stream
# ---------------------------------------------------------------------------


def q_hourly_seasonality(sf_dir: str):
    """Diurnal load profile: events per (hour-of-day, event_type) —
    the seasonality heatmap capacity planning reads first. Pure
    two-phase count: per-batch partials collapse to <= 24 x #types
    rows per block before the (tiny, bounded-domain) exchange."""
    events = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        hod = pc.subtract(
            pc.divide(pc.cast(b.column("ts"), pa.int64()), HOUR_US),
            pc.multiply(
                pc.divide(
                    pc.divide(pc.cast(b.column("ts"), pa.int64()),
                              HOUR_US),
                    24,
                ),
                24,
            ),
        )
        t = pa.table(
            {
                "hour_of_day": hod,
                "event_type": b.column("event_type"),
                "n_events": pa.array(
                    np.ones(b.num_rows, dtype=np.int64)
                ),
            }
        )
        g = t.group_by(["hour_of_day", "event_type"]).aggregate(
            [("n_events", "sum")]
        )
        return g.rename_columns(["hour_of_day", "event_type", "n_events"])

    return (
        events.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["hour_of_day", "event_type"])
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


SQL_HOURLY_SEASONALITY = """
SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour_of_day,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: distinct suppliers per part attribute group
# ---------------------------------------------------------------------------


def q_part_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape (via lineitem, sans partsupp which the corpus
    does not carry): how many DISTINCT suppliers have shipped each
    (p_brand, p_type, p_size) part class — the supplier-diversity
    rollup behind sourcing-risk dashboards.

    Scale design: part attributes broadcast once as three
    dimension-sized probe refs (guardrailed by _broadcast_lookup);
    lineitem collapses per batch to distinct (brand, type, size,
    suppkey) quadruples routed by quadruple hash, so global
    distinctness resolves locally in each bucket and every bucket
    emits pre-counted (class, supplier_cnt) partials; the final
    exchange is class-grain (bounded by the attribute domain), never
    supplier- or lineitem-grain."""
    import ray as _ray

    from ..stages.hashing import hash_strings, mix_rounds

    brand_ref = _broadcast_lookup(
        _read(sf_dir, "part", ["p_partkey", "p_brand"]),
        "p_partkey", "p_brand",
    )
    type_ref = _broadcast_lookup(
        _read(sf_dir, "part", ["p_partkey", "p_type"]),
        "p_partkey", "p_type",
    )
    size_ref = _broadcast_lookup(
        _read(sf_dir, "part", ["p_partkey", "p_size"]),
        "p_partkey", "p_size",
    )
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    nb = np.uint64(Q17_NUM_BUCKETS)

    def quad_partial(b: pa.Table) -> pa.Table:
        bk, bv = _ray.get(brand_ref)
        tk, tv = _ray.get(type_ref)
        sk, sv = _ray.get(size_ref)
        pkeys = b.column("l_partkey")
        brand = _probe(pkeys, bk, bv)
        t = pa.table(
            {
                "p_brand": brand,
                "p_type": _probe(pkeys, tk, tv),
                "p_size": pc.cast(_probe(pkeys, sk, sv), pa.int64()),
                "supp": b.column("l_suppkey"),
            }
        ).filter(pc.is_valid(brand))  # inner-join semantics
        g = t.group_by(
            ["p_brand", "p_type", "p_size", "supp"]
        ).aggregate([])

        # routing hash only (the fold re-groups on actual values):
        # hash each string column's DICTIONARY (tens of values) and
        # gather per row — no per-row python, no row-count to_pylist
        def dict_hash(col) -> np.ndarray:
            enc = pc.dictionary_encode(col).combine_chunks()
            dh = hash_strings(enc.dictionary.to_pylist())
            return dh[enc.indices.to_numpy(zero_copy_only=False)]

        h = mix_rounds(
            dict_hash(g.column("p_brand"))
            * np.uint64(0x9E3779B97F4A7C15)
            + dict_hash(g.column("p_type"))
            * np.uint64(0xC2B2AE3D27D4EB4F)
            + g.column("p_size").to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
            * np.uint64(0x165667B19E3779F9)
            + g.column("supp").to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
        )
        return g.append_column(
            "bucket", pa.array((h % nb).astype(np.int64))
        )

    def bucket_fold(t: pa.Table) -> pa.Table:
        g = (
            t.select(["p_brand", "p_type", "p_size", "supp"])
            .group_by(["p_brand", "p_type", "p_size", "supp"])
            .aggregate([])
        )
        h = pa.table(
            {
                "p_brand": g.column("p_brand"),
                "p_type": g.column("p_type"),
                "p_size": g.column("p_size"),
                "supplier_cnt": pa.array(
                    np.ones(g.num_rows, dtype=np.int64)
                ),
            }
        )
        agg = h.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("supplier_cnt", "sum")]
        )
        return agg.rename_columns(
            ["p_brand", "p_type", "p_size", "supplier_cnt"]
        )

    return (
        li.map_batches(
            quad_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
    )


SQL_PART_SUPPLIER_COUNTS = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Order-fulfillment latency histogram (order date -> line-item ship date)
# ---------------------------------------------------------------------------


def q_ship_latency_hist(sf_dir: str):
    """Fulfillment-latency distribution: whole days between an order's
    placement and each of its line items' ship dates, rolled up to
    (latency_days, n_items) — the SLA curve a logistics dashboard
    draws.

    Scale design: ONE orderkey-hash bucket join (stages/join.py
    hash_join) whose bucket_post collapses each bucket straight to a
    pre-counted latency histogram partial, so nothing wider than the
    bounded latency support ever reaches the final exchange."""
    from ..stages.join import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    li_proj = li.map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "ship_us": pc.cast(b.column("l_shipdate"), pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ord_proj = orders.map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_date_us": pc.cast(b.column("o_orderdate"), pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def bucket_post(joined: pa.Table) -> pa.Table:
        ship = joined.column("ship_us").to_numpy(zero_copy_only=False)
        od = joined.column("o_date_us").to_numpy(zero_copy_only=False)
        lat = (ship - od) // DAY_US
        vals, cnt = np.unique(lat, return_counts=True)
        return pa.table(
            {
                "latency_days": pa.array(vals.astype(np.int64)),
                "n_items": pa.array(cnt.astype(np.int64)),
            }
        )

    joined = hash_join(
        li_proj, ord_proj, key="o_orderkey", how="inner",
        bucket_post=bucket_post,
    )
    return joined.groupby("latency_days").aggregate(
        Sum("n_items", alias_name="n_items")
    )


SQL_SHIP_LATENCY_HIST = """
SELECT CAST((epoch_us(l_shipdate) - epoch_us(o_orderdate))
            // 86400000000 AS BIGINT) AS latency_days,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Document-length quantiles per language (corpus balance audit)
# ---------------------------------------------------------------------------


def q_doc_len_quantiles_by_lang(sf_dir: str):
    """Corpus-balance audit: exact p10/p50/p99 document lengths
    (n_chars) per language — the length-distribution check a training
    mix is balanced against. Same grouped histogram-refinement
    rank-select as value_quantiles_by_type (stages/sketch.py): every
    pass is a shuffle-free map_batches partial count + tiny driver
    merge, no per-group sort and no one-group-fits-in-memory
    assumption. Lengths are integers, so the resolved order statistics
    cast back to int64 losslessly."""
    from ..stages.sketch import grouped_rank_select

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    t = grouped_rank_select(
        ds, "lang", "n_chars",
        [("p10", 0.10), ("p50", 0.50), ("p99", 0.99)],
    )
    return pa.table(
        {
            "lang": t.column("lang"),
            "q": t.column("q"),
            "n_chars": pc.cast(t.column("value"), pa.int64()),
        }
    )


SQL_DOC_LEN_QUANTILES_BY_LANG = """
WITH ranked AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         count(*)    OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang, q, CAST(n_chars AS BIGINT) AS n_chars
FROM ranked
JOIN (VALUES ('p10', 0.10), ('p50', 0.50), ('p99', 0.99)) AS quants(q, f)
  ON rn = greatest(CAST(ceil(f * n) AS BIGINT), 1)
"""


MOVING_WINDOW_ROWS = 3


def q_user_value_moving_sum(sf_dir: str):
    """Per-user trailing moving sum of value in cents over the last
    MOVING_WINDOW_ROWS events ordered by (ts, event_id) — SUM() OVER
    (ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW), the bounded-frame
    window that user_running_value's unbounded frame doesn't cover.

    Scale design: one groupby(user) shuffle for sequence locality (the
    standard per-key CEP partitioning), then the whole frame resolves
    as TWO vectorized ops per group — a cumsum and a shifted
    subtraction — no per-row loop, no second pass."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def moving(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("ts", "ascending"), ("event_id", "ascending")],
        )
        t = group.take(idx)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        cum = np.cumsum(cents)
        mov = cum.copy()
        w = MOVING_WINDOW_ROWS
        mov[w:] = cum[w:] - cum[:-w]
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "mov_cents": pa.array(mov, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(moving, batch_format="pyarrow")


SQL_USER_VALUE_MOVING_SUM = f"""
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN {MOVING_WINDOW_ROWS - 1} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS mov_cents
FROM events
"""


def q_user_first_last_value(sf_dir: str):
    """FIRST_VALUE/LAST_VALUE per partition: each user's earliest and
    latest event value (cents) by (ts, event_id), plus their event
    count — the boundary-row window shape.

    Scale design: NO row-grain shuffle. Each batch collapses to one
    (user, first, last, n) partial via a single batch-local sort and
    run-boundary gather, so the exchange moves at most one row per
    (user, block); the user-hash bucket fold finishes first/last with
    two lexsorts. The event stream itself never crosses the wire."""
    from ..stages.hashing import mix_rounds

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "f_ts": pa.array([], pa.int64()),
                    "f_eid": pa.array([], pa.int64()),
                    "first_cents": pa.array([], pa.int64()),
                    "l_ts": pa.array([], pa.int64()),
                    "l_eid": pa.array([], pa.int64()),
                    "last_cents": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            b,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = b.take(idx)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        new = np.empty(uid.size, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], uid.size) - 1
        u = uid[starts]
        bucket = (
            mix_rounds(u.astype(np.uint64)) % np.uint64(Q17_NUM_BUCKETS)
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "user_id": pa.array(u),
                "f_ts": pa.array(ts[starts]),
                "f_eid": pa.array(eid[starts]),
                "first_cents": pa.array(cents[starts]),
                "l_ts": pa.array(ts[ends]),
                "l_eid": pa.array(eid[ends]),
                "last_cents": pa.array(cents[ends]),
                "n_events": pa.array(ends - starts + 1),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        f_ts = g.column("f_ts").to_numpy(zero_copy_only=False)
        f_eid = g.column("f_eid").to_numpy(zero_copy_only=False)
        fc = g.column("first_cents").to_numpy(zero_copy_only=False)
        l_ts = g.column("l_ts").to_numpy(zero_copy_only=False)
        l_eid = g.column("l_eid").to_numpy(zero_copy_only=False)
        lc = g.column("last_cents").to_numpy(zero_copy_only=False)
        n = g.column("n_events").to_numpy(zero_copy_only=False)
        fo = np.lexsort((f_eid, f_ts, uid))
        new = np.empty(fo.size, dtype=bool)
        new[0] = True
        new[1:] = uid[fo][1:] != uid[fo][:-1]
        fsel = fo[np.flatnonzero(new)]
        lo = np.lexsort((-l_eid, -l_ts, uid))
        new[1:] = uid[lo][1:] != uid[lo][:-1]
        lsel = lo[np.flatnonzero(new)]
        order = np.argsort(uid[fsel])
        fsel, lsel = fsel[order], lsel[np.argsort(uid[lsel])]
        u_out, inv = np.unique(uid, return_inverse=True)
        n_out = np.bincount(inv, weights=n, minlength=u_out.size)
        return pa.table(
            {
                "user_id": pa.array(uid[fsel]),
                "first_cents": pa.array(fc[fsel]),
                "last_cents": pa.array(lc[lsel]),
                "n_events": pa.array(n_out.astype(np.int64)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("bucket").map_groups(
        fold, batch_format="pyarrow"
    )


SQL_USER_FIRST_LAST_VALUE = """
WITH o AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS rn_a,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn_d
  FROM events
)
SELECT user_id,
       max(CASE WHEN rn_a = 1 THEN c END) AS first_cents,
       max(CASE WHEN rn_d = 1 THEN c END) AS last_cents,
       count(*) AS n_events
FROM o GROUP BY user_id
"""


def q_part_dominant_suppliers(sf_dir: str):
    """TPC-H Q20 shape: suppliers who shipped MORE THAN A TENTH of a
    part's all-time quantity during 1997 alone — the nested
    (per-part-threshold from an inner aggregate) semi-join cascade,
    re-expressed without the partsupp table (the synthetic schema has
    none): availqty becomes the part's total shipped quantity, and the
    half-of-one-year threshold scales to the schema's ~7-year span.
    Output: (s_suppkey, n_parts) — how many parts each such supplier
    dominated.

    Scale composition: quantities collapse to (partkey, suppkey)
    grain with (qty_all, qty_1997) sums INSIDE each batch, so the one
    partkey-hash bucket shuffle moves at most one row per (part,
    supplier, block). Each bucket owns every grain of its parts: the
    per-part total, the 2*q97 > total dominance predicate, AND a
    per-supplier count partial all finish locally — the final
    exchange is supplier-grain tiny rows."""
    from ..stages.hashing import mix_rounds

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )

    def grain_partial(b: pa.Table) -> pa.Table:
        qty = _cents(b.column("l_quantity"), 1.0)
        ship = pc.cast(b.column("l_shipdate"), pa.int64())
        in97 = pc.and_(
            pc.greater_equal(ship, pa.scalar(Q5_LO_US, pa.int64())),
            pc.less(ship, pa.scalar(Q5_HI_US, pa.int64())),
        )
        q97 = pc.if_else(in97, qty, pa.scalar(0, pa.int64()))
        t = pa.table(
            {
                "pk": b.column("l_partkey"),
                "sk": b.column("l_suppkey"),
                "qall": qty,
                "q97": q97,
            }
        )
        g = t.group_by(["pk", "sk"]).aggregate(
            [("qall", "sum"), ("q97", "sum")]
        ).rename_columns(["pk", "sk", "qall", "q97"])
        pkv = g.column("pk").to_numpy(zero_copy_only=False)
        bucket = (
            mix_rounds(pkv.astype(np.uint64))
            % np.uint64(Q17_NUM_BUCKETS)
        ).astype(np.int64)
        return g.append_column("bucket", pa.array(bucket))

    def bucket_fold(t: pa.Table) -> pa.Table:
        g = t.group_by(["pk", "sk"]).aggregate(
            [("qall", "sum"), ("q97", "sum")]
        ).rename_columns(["pk", "sk", "qall", "q97"])
        per_part = g.group_by(["pk"]).aggregate(
            [("qall", "sum")]
        ).rename_columns(["pk", "total"])
        idx = pc.index_in(
            g.column("pk"), value_set=per_part.column("pk").combine_chunks()
        )
        total = pc.take(per_part.column("total").combine_chunks(), idx)
        keep = pc.and_(
            pc.greater(
                pc.multiply(
                    g.column("q97"), pa.scalar(Q20_DOM_FACTOR, pa.int64())
                ),
                total,
            ),
            pc.greater(g.column("q97"), pa.scalar(0, pa.int64())),
        )
        m = g.filter(keep)
        out = (
            pa.table(
                {
                    "s_suppkey": m.column("sk"),
                    "n_parts": pa.array(np.ones(m.num_rows, np.int64)),
                }
            )
            .group_by(["s_suppkey"])
            .aggregate([("n_parts", "sum")])
        )
        return out.rename_columns(["s_suppkey", "n_parts"])

    per_bucket = (
        li.map_batches(
            grain_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pyarrow")
    )
    return per_bucket.groupby("s_suppkey").aggregate(
        Sum("n_parts", alias_name="n_parts")
    )


Q20_DOM_FACTOR = 10

SQL_PART_DOMINANT_SUPPLIERS = f"""
WITH pq AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         SUM(CAST(round(l_quantity) AS BIGINT)) AS qall,
         SUM(CASE WHEN epoch_us(l_shipdate) >= {Q5_LO_US}
                   AND epoch_us(l_shipdate) < {Q5_HI_US}
                  THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END
         ) AS q97
  FROM lineitem GROUP BY 1, 2
), pt AS (
  SELECT pk, SUM(qall) AS total FROM pq GROUP BY 1
)
SELECT pq.sk AS s_suppkey, count(*) AS n_parts
FROM pq JOIN pt USING (pk)
WHERE {Q20_DOM_FACTOR} * pq.q97 > pt.total AND pq.q97 > 0
GROUP BY 1
"""


def q_user_event_path(sf_dir: str):
    """Ordered string aggregation: each user's full event-type path
    ('view>click>purchase>...') by (ts, event_id), plus its length —
    string_agg(... ORDER BY ...) as a Ray pipeline, the order-sensitive
    aggregate the other grouped queries don't exercise.

    Scale design: paths need full sequence locality, so this is the
    standard ONE groupby(user) shuffle; inside each group a single
    arrow sort + one join builds the path (no per-row python in the
    sort or gather; the join itself is O(len) per user, the output
    grain). Paths grow with a user's event count by nature — the same
    bound the SQL aggregate has."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def path(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("ts", "ascending"), ("event_id", "ascending")],
        )
        et = group.column("event_type").take(idx).combine_chunks()
        lst = pa.ListArray.from_arrays(
            pa.array([0, len(et)], pa.int32()), et
        )
        joined = pc.binary_join(lst, pa.scalar(">"))
        return pa.table(
            {
                "user_id": pa.array(
                    [group.column("user_id")[0].as_py()], pa.int64()
                ),
                "path": joined,
                "n_events": pa.array([len(et)], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(path, batch_format="pyarrow")


SQL_USER_EVENT_PATH = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


Q2_SIZE_MIN = 40
Q2_REGION = "EUROPE"


def q_min_cost_part_supplier(sf_dir: str):
    """TPC-H Q2 shape: for every large part (p_size >=
    {Q2_SIZE_MIN}), the in-region supplier(s) offering the minimum
    unit cost — the correlated MIN subquery joined back to its fact,
    with ties preserved. Unit cost is integer-exact micro-cents:
    floor(price_cents * 1e6 / qty), bit-reproducible in BIGINT SQL.

    Scale composition: supplier->nationkey broadcasts once under
    _broadcast_lookup's guardrail (dimension-sized) and nation/region
    resolve driver-side (fixed ~30 rows at every sf); lineitem then
    pre-filters to in-region suppliers and collapses to (part,
    supplier, min-cost) grain per batch. The part-size semi-join needs
    NO broadcast of the part table: filtered part rows ride the SAME
    partkey-hash bucket shuffle as marker rows (kind=0), so each
    bucket filters, finishes the per-part min, and re-joins the ties
    locally."""
    import ray as _ray

    from ..stages.hashing import mix_rounds

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    region_keys = set()
    for b in region.iter_batches(batch_format="pyarrow"):
        for rk, rn in zip(b.column("r_regionkey").to_pylist(),
                          b.column("r_name").to_pylist()):
            if rn == Q2_REGION:
                region_keys.add(rk)
    nat_keys = []
    for b in nation.iter_batches(batch_format="pyarrow"):
        for nk, rk in zip(b.column("n_nationkey").to_pylist(),
                          b.column("n_regionkey").to_pylist()):
            if rk in region_keys:
                nat_keys.append(nk)
    in_region = pa.array(sorted(nat_keys), pa.int64())

    supp_ref = _broadcast_lookup(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey",
    )

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
    )

    def li_partial(b: pa.Table) -> pa.Table:
        keys_arr, vals_arr = _ray.get(supp_ref)
        sn = pc.cast(
            _probe(b.column("l_suppkey"), keys_arr, vals_arr), pa.int64()
        )
        m = b.filter(pc.is_in(sn, value_set=in_region))
        price = _cents(m.column("l_extendedprice")).to_numpy(
            zero_copy_only=False
        )
        qty = _cents(m.column("l_quantity"), 1.0).to_numpy(
            zero_copy_only=False
        )
        cost = price * 1_000_000 // qty
        t = pa.table(
            {
                "pk": m.column("l_partkey"),
                "sk": m.column("l_suppkey"),
                "cost": pa.array(cost, pa.int64()),
            }
        )
        g = t.group_by(["pk", "sk"]).aggregate(
            [("cost", "min")]
        ).rename_columns(["pk", "sk", "cost"])
        pkv = g.column("pk").to_numpy(zero_copy_only=False)
        bucket = (
            mix_rounds(pkv.astype(np.uint64))
            % np.uint64(Q17_NUM_BUCKETS)
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "kind": pa.array(np.ones(g.num_rows, np.int64)),
                "pk": g.column("pk"),
                "sk": g.column("sk"),
                "cost": g.column("cost"),
            }
        )

    part = _read(sf_dir, "part", ["p_partkey", "p_size"])

    def part_markers(b: pa.Table) -> pa.Table:
        m = b.filter(
            pc.greater_equal(
                pc.cast(b.column("p_size"), pa.int64()),
                pa.scalar(Q2_SIZE_MIN, pa.int64()),
            )
        )
        pkv = m.column("p_partkey").to_numpy(zero_copy_only=False)
        bucket = (
            mix_rounds(pkv.astype(np.uint64))
            % np.uint64(Q17_NUM_BUCKETS)
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "kind": pa.array(np.zeros(m.num_rows, np.int64)),
                "pk": m.column("p_partkey"),
                "sk": pa.array(np.zeros(m.num_rows, np.int64)),
                "cost": pa.array(np.zeros(m.num_rows, np.int64)),
            }
        )

    def bucket_fold(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        marker_pks = np.unique(pk[kind == 0])
        rows = t.filter(pa.array(kind == 1))
        g = rows.group_by(["pk", "sk"]).aggregate(
            [("cost", "min")]
        ).rename_columns(["pk", "sk", "cost"])
        gpk = g.column("pk").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(marker_pks, gpk)
        pos[pos >= marker_pks.size] = 0
        inset = (
            (marker_pks[pos] == gpk)
            if marker_pks.size
            else np.zeros(gpk.size, dtype=bool)
        )
        g = g.filter(pa.array(inset))
        per_part = g.group_by(["pk"]).aggregate(
            [("cost", "min")]
        ).rename_columns(["pk", "mc"])
        idx = pc.index_in(
            g.column("pk"), value_set=per_part.column("pk").combine_chunks()
        )
        mc = pc.take(per_part.column("mc").combine_chunks(), idx)
        m = g.filter(pc.equal(g.column("cost"), mc))
        return pa.table(
            {
                "p_partkey": m.column("pk"),
                "s_suppkey": m.column("sk"),
                "cost_micro": m.column("cost"),
            }
        )

    partials = li.map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    markers = part.map_batches(
        part_markers, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.union(markers).groupby("bucket").map_groups(
        bucket_fold, batch_format="pyarrow"
    )


SQL_MIN_COST_PART_SUPPLIER = f"""
WITH eu AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
), pp AS (
  SELECT p_partkey FROM part WHERE p_size >= {Q2_SIZE_MIN}
), lc AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000000
             // CAST(round(l_quantity) AS BIGINT)) AS cost
  FROM lineitem
  JOIN eu ON l_suppkey = eu.s_suppkey
  JOIN pp ON l_partkey = pp.p_partkey
  GROUP BY 1, 2
), pm AS (
  SELECT pk, MIN(cost) AS mc FROM lc GROUP BY 1
)
SELECT lc.pk AS p_partkey, lc.sk AS s_suppkey,
       CAST(lc.cost AS BIGINT) AS cost_micro
FROM lc JOIN pm ON lc.pk = pm.pk AND lc.cost = pm.mc
"""


Q11_NATION = "NATION_8"
Q11_THRESHOLD_PCT_OF_MEAN = 150


def q_part_value_threshold(sf_dir: str):
    """TPC-H Q11 shape (sans partsupp, which the test corpus does not
    carry): value of each part supplied by one nation's suppliers, kept
    only when it exceeds a GLOBAL-AGGREGATE-derived threshold (150% of
    the mean per-part value) — the global-scalar-subquery HAVING, the
    one TPC-H idiom the catalog did not yet exercise. Mean-relative
    rather than total-relative so the predicate keeps the same
    selectivity at every scale factor (Q11's 0.0001/SF adjustment,
    folded into the threshold's own definition).

    Scale composition: supplier broadcasts suppkey -> nationkey once
    (_broadcast_lookup; dimension-sized by nature); lineitem filters to
    the nation's suppliers and pre-aggregates value per partkey INSIDE
    each batch, so the single part-grain exchange moves one row per
    (part, block). The grand total and part count fold off the SAME
    materialized part-grain aggregate (no second corpus pass) as TWO
    driver scalars — bounded by construction — and the threshold filter
    is a vectorized integer compare against the exact integer cutoff
    (v > 150t/(100n) <=> v >= 150t//(100n) + 1; the division happens
    once on the driver in arbitrary-precision Python ints, so the
    worker-side compare never overflows)."""
    import ray as _ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    nk = None
    for b in nation.iter_batches(batch_format="pyarrow"):
        names = b.column("n_name").to_pylist()
        if Q11_NATION in names:
            nk = b.column("n_nationkey").to_pylist()[
                names.index(Q11_NATION)
            ]
    if nk is None:
        return pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "value_cents": pa.array([], pa.int64()),
            }
        )
    supp_ref = _broadcast_lookup(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey",
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    nk_scalar = int(nk)

    def li_partial(b: pa.Table) -> pa.Table:
        keys_arr, vals_arr = _ray.get(supp_ref)
        sn = pc.cast(
            _probe(b.column("l_suppkey"), keys_arr, vals_arr), pa.int64()
        )
        b = b.filter(pc.equal(sn, pa.scalar(nk_scalar, pa.int64())))
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        t = pa.table(
            {"p_partkey": b.column("l_partkey"), "value_cents": _cents(rev)}
        )
        g = t.group_by(["p_partkey"]).aggregate([("value_cents", "sum")])
        return g.rename_columns(["p_partkey", "value_cents"])

    partials = li.map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_part = partials.groupby("p_partkey").aggregate(
        Sum("value_cents", alias_name="value_cents")
    ).materialize()
    n_parts = per_part.count()
    if n_parts == 0:
        return pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "value_cents": pa.array([], pa.int64()),
            }
        )
    tot = int(per_part.aggregate(Sum("value_cents", alias_name="t"))["t"])
    cut = (Q11_THRESHOLD_PCT_OF_MEAN * tot) // (100 * n_parts)

    def keep(b: pa.Table) -> pa.Table:
        v = b.column("value_cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_partkey": pc.cast(b.column("p_partkey"), pa.int64()),
                "value_cents": pc.cast(b.column("value_cents"), pa.int64()),
            }
        ).filter(pa.array(v.astype(np.int64) > cut))

    parts = list(
        per_part.map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    )
    if not parts:
        return pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "value_cents": pa.array([], pa.int64()),
            }
        )
    out = pa.concat_tables(parts)
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("value_cents", "descending"),
                       ("p_partkey", "ascending")],
        )
    )


SQL_PART_VALUE_THRESHOLD = f"""
WITH sn AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
), pv AS (
  SELECT l_partkey AS p_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
             AS BIGINT)) AS value_cents
  FROM lineitem JOIN sn ON l_suppkey = sn.s_suppkey
  GROUP BY 1
), tot AS (SELECT sum(value_cents) AS t, count(*) AS n FROM pv)
SELECT p_partkey, CAST(value_cents AS BIGINT) AS value_cents
FROM pv, tot
WHERE CAST(value_cents AS HUGEINT) * n * 100
      > CAST(t AS HUGEINT) * {Q11_THRESHOLD_PCT_OF_MEAN}
ORDER BY value_cents DESC, p_partkey
"""


Q12_LATE_US = 60 * DAY_US
Q12_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q_returnflag_priority_counts(sf_dir: str):
    """TPC-H Q12 shape (shipmode column absent, l_returnflag stands in
    as the line-grain group): per return flag, how many 1997-order line
    items shipped more than 60 days after their order date, split into
    high-priority (URGENT/HIGH) vs low-priority order counts — the
    two-branch CASE aggregation over a line-grain fact-fact join.

    Scale composition: both sides project narrow BEFORE the single
    orderkey bucket exchange (orders additionally window-filtered and
    its priority pre-collapsed to one int64 flag); bucket_post applies
    the lateness predicate and collapses each bucket to <= #flags rows,
    so the final exchange is #buckets x #flags tiny rows."""
    from ..stages.join import hash_join

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def orders_proj(b: pa.Table) -> pa.Table:
        t_us = pc.cast(b.column("o_orderdate"), pa.int64())
        keep = pc.and_(
            pc.greater_equal(t_us, pa.scalar(Q5_LO_US, pa.int64())),
            pc.less(t_us, pa.scalar(Q5_HI_US, pa.int64())),
        )
        hi = pc.cast(
            pc.is_in(
                b.column("o_orderpriority"),
                value_set=pa.array(list(Q12_HIGH_PRIORITIES)),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_date_us": t_us,
                "prio_high": hi,
            }
        ).filter(keep)

    orders_w = orders.map_batches(
        orders_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag",
                                    "l_shipdate"])

    def li_proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "l_returnflag": b.column("l_returnflag"),
                "ship_us": pc.cast(b.column("l_shipdate"), pa.int64()),
            }
        )

    li_keyed = li.map_batches(
        li_proj, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_post(joined: pa.Table) -> pa.Table:
        late = joined.filter(
            pc.greater(
                joined.column("ship_us"),
                pc.add(joined.column("o_date_us"),
                       pa.scalar(Q12_LATE_US, pa.int64())),
            )
        )
        g = late.group_by(["l_returnflag"]).aggregate(
            [("prio_high", "sum"), ([], "count_all")]
        ).rename_columns(["l_returnflag", "high", "n"])
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "high_line_count": pc.cast(g.column("high"), pa.int64()),
                "low_line_count": pc.cast(
                    pc.subtract(g.column("n"), g.column("high")), pa.int64()
                ),
            }
        )

    per_bucket = hash_join(
        li_keyed, orders_w, key="o_orderkey", how="inner",
        bucket_post=bucket_post,
    )
    totals = per_bucket.groupby("l_returnflag").aggregate(
        Sum("high_line_count", alias_name="high_line_count"),
        Sum("low_line_count", alias_name="low_line_count"),
    )
    parts = list(totals.iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table(
            {
                "l_returnflag": pa.array([], pa.string()),
                "high_line_count": pa.array([], pa.int64()),
                "low_line_count": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(parts)
    out = pa.table(
        {
            "l_returnflag": merged.column("l_returnflag"),
            "high_line_count": pc.cast(
                merged.column("high_line_count"), pa.int64()
            ),
            "low_line_count": pc.cast(
                merged.column("low_line_count"), pa.int64()
            ),
        }
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("l_returnflag", "ascending")])
    )


SQL_RETURNFLAG_PRIORITY_COUNTS = f"""
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN
       ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN
       ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE epoch_us(o_orderdate) >= {Q5_LO_US}
  AND epoch_us(o_orderdate) < {Q5_HI_US}
  AND epoch_us(l_shipdate) > epoch_us(o_orderdate) + {Q12_LATE_US}
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "tumbling_events": q_tumbling_events,
    "sliding_events": q_sliding_events,
    "session_events": q_session_events,
    "finalized_tumbling_events": q_finalized_tumbling_events,
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "doc_token_counts": q_doc_token_counts,
    "quality_scores": q_quality_scores,
    "lang_id": q_lang_id,
    "fingerprints": q_fingerprints,
    "minhash_near_dups": q_minhash_near_dups,
    "cep_near_dup_stream": q_cep_near_dup_stream,
    "cep_stream_join": q_cep_stream_join,
    "minhash_signatures": q_minhash_signatures,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "simhash": q_simhash,
    "simhash_near_dups": q_simhash_near_dups,
    "near_dup_canonical": q_near_dup_canonical,
    "heavy_hitter_tokens": q_heavy_hitter_tokens,
    "regex_token_counts": q_regex_token_counts,
    "value_rank_select": q_value_rank_select,
    "domain_fileset_previews": q_domain_fileset_previews,
    "click_purchase_pairs": q_click_purchase_pairs,
    "doc_split_assign": q_doc_split_assign,
    "mixture_sample": q_mixture_sample,
    "mixture_upsample": q_mixture_upsample,
    "props_extract": q_props_extract,
    "summarize_documents": q_summarize_documents,
    "image_features": q_image_features,
    "knn_topk": q_knn_topk,
    "ivf_topk": q_ivf_topk,
    "lsh_topk": q_lsh_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "embedding_near_dups_lsh": q_embedding_near_dups_lsh,
    "lineitem_agg": q_lineitem_agg,
    "orders_by_segment": q_orders_by_segment,
    "top_orders": q_top_orders,
    "events_per_user": q_events_per_user,
    "suppliers_by_region": q_suppliers_by_region,
    "distinct_part_types": q_distinct_part_types,
    "order_customers_without_events": q_order_customers_without_events,
    "top3_orders_per_segment": q_top3_orders_per_segment,
    "asof_latest_order_per_event": q_asof_latest_order_per_event,
    "event_concurrency": q_event_concurrency,
    "event_pattern_matches": q_event_pattern_matches,
    "blocklist_filter": q_blocklist_filter,
    "events_cube": q_events_cube,
    "funnel_depths": q_funnel_depths,
    "value_quantiles_by_type": q_value_quantiles_by_type,
    "events_value_ranges": q_events_value_ranges,
    "revenue_by_priority": q_revenue_by_priority,
    "order_revenue_topk": q_order_revenue_topk,
    "regional_nation_revenue": q_regional_nation_revenue,
    "late_ship_priority_counts": q_late_ship_priority_counts,
    "customer_order_distribution": q_customer_order_distribution,
    "user_top_event_type": q_user_top_event_type,
    "large_volume_orders": q_large_volume_orders,
    "idle_rich_customers": q_idle_rich_customers,
    "small_quantity_part_revenue": q_small_quantity_part_revenue,
    "customer_balance_ranks": q_customer_balance_ranks,
    "promo_revenue_share": q_promo_revenue_share,
    "top_supplier_revenue": q_top_supplier_revenue,
    "brand_disjunctive_revenue": q_brand_disjunctive_revenue,
    "lonely_late_suppliers": q_lonely_late_suppliers,
    "cms_user_registers": q_cms_user_registers,
    "user_event_type_pivot": q_user_event_type_pivot,
    "order_growth_by_quarter": q_order_growth_by_quarter,
    "returned_customer_revenue": q_returned_customer_revenue,
    "nation_trade_volume": q_nation_trade_volume,
    "value_moments_by_type": q_value_moments_by_type,
    "repeat_buyer_customers": q_repeat_buyer_customers,
    "forecast_revenue_change": q_forecast_revenue_change,
    "nation_market_share": q_nation_market_share,
    "term_search_topk": q_term_search_topk,
    "part_nation_revenue": q_part_nation_revenue,
    "click_abandonment": q_click_abandonment,
    "bigram_topk": q_bigram_topk,
    "customer_balance_ntiles": q_customer_balance_ntiles,
    "top_decile_revenue_share": q_top_decile_revenue_share,
    "dup_cluster_size_hist": q_dup_cluster_size_hist,
    "customer_reorder_gaps": q_customer_reorder_gaps,
    "dau_wau_stickiness": q_dau_wau_stickiness,
    "nation_revenue_share_in_region": q_nation_revenue_share_in_region,
    "user_retention_cohorts": q_user_retention_cohorts,
    "vocab_growth_by_source": q_vocab_growth_by_source,
    "hourly_seasonality": q_hourly_seasonality,
    "part_supplier_counts": q_part_supplier_counts,
    "ship_latency_hist": q_ship_latency_hist,
    "doc_len_quantiles_by_lang": q_doc_len_quantiles_by_lang,
    "union_distinct_orderkeys": q_union_distinct_orderkeys,
    "click_events_filtered": q_click_events_filtered,
    "repetition_scores": q_repetition_scores,
    "lm_quality_scores": q_lm_quality_scores,
    "dup_shingle_stats": q_dup_shingle_stats,
    "substring_dup_spans": q_substring_dup_spans,
    "bpe_merges": q_bpe_merges,
    "tfidf_top_terms": q_tfidf_top_terms,
    "late_events": q_late_events,
    "quality_filter": q_quality_filter,
    "windowed_topk_events": q_windowed_topk_events,
    "event_transitions": q_event_transitions,
    "user_running_value": q_user_running_value,
    "kmeans_clusters": q_kmeans_clusters,
    "stratified_sample": q_stratified_sample,
    "cluster_label_purity": q_cluster_label_purity,
    "event_session_ids": q_event_session_ids,
    "reservoir_sample": q_reservoir_sample,
    "sequence_packing": q_sequence_packing,
    "distinct_users_per_type": q_distinct_users_per_type,
    "video_frame_plans": q_video_frame_plans,
    "audio_chunk_plans": q_audio_chunk_plans,
    "hll_user_registers": q_hll_user_registers,
    "text_scrub": q_text_scrub,
    "decontam_flags": q_decontam_flags,
    "curation_pipeline": q_curation_pipeline,
    "user_value_moving_sum": q_user_value_moving_sum,
    "user_first_last_value": q_user_first_last_value,
    "part_dominant_suppliers": q_part_dominant_suppliers,
    "min_cost_part_supplier": q_min_cost_part_supplier,
    "part_value_threshold": q_part_value_threshold,
    "returnflag_priority_counts": q_returnflag_priority_counts,
    "user_event_path": q_user_event_path,
}

# Preview parity as a hashable oracle (round-4 verdict task 8): previews
# are deterministic outputs of the snapshot-validated core but not
# SQL-expressible, so the oracle joins the documents table against the
# committed fixture generated by that same core
# (tools/build_preview_fixtures.py; staleness caught by
# tests/test_queries_oracle.py fixture-parity test). Keyed by text so
# one fixture serves every sf dir.
_DOC_PREVIEW_FIXTURE = str(
    Path(__file__).resolve().parent.parent.parent
    / "tests" / "fixtures" / "doc_previews.parquet"
)
SQL_SUMMARIZE_DOCUMENTS = f"""
SELECT d.doc_id, f.preview
FROM documents d
JOIN read_parquet('{_DOC_PREVIEW_FIXTURE}') f ON d.text = f.text
"""

# Same fixture pattern for the per-domain FILESET previews: the
# 5000-page stream q_domain_fileset_previews consumes is identical
# across sf dirs (row cap), and the group kernel is a pure function of
# the url-sorted group, so the committed fixture (regenerated by
# tools/build_preview_fixtures.py, staleness caught by
# tests/test_queries_oracle.py::test_preview_fixtures_not_stale) IS the
# exact expected output.
_FILESET_PREVIEW_FIXTURE = str(
    Path(__file__).resolve().parent.parent.parent
    / "tests" / "fixtures" / "fileset_previews.parquet"
)
SQL_DOMAIN_FILESET_PREVIEWS = f"""
SELECT domain, n_files, preview
FROM read_parquet('{_FILESET_PREVIEW_FIXTURE}')
"""

ORACLE_SQL = {
    "tumbling_events": SQL_TUMBLING_EVENTS,
    "sliding_events": SQL_SLIDING_EVENTS,
    "session_events": SQL_SESSION_EVENTS,
    "finalized_tumbling_events": SQL_FINALIZED_TUMBLING_EVENTS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "token_stats": SQL_TOKEN_STATS,
    "doc_token_counts": SQL_DOC_TOKEN_COUNTS,
    "knn_topk": SQL_KNN_TOPK,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    "lsh_topk": SQL_LSH_TOPK,
    "embedding_near_dups_lsh": SQL_EMBEDDING_NEAR_DUPS_LSH,
    "ivf_topk": SQL_IVF_TOPK,
    "lineitem_agg": SQL_LINEITEM_AGG,
    "orders_by_segment": SQL_ORDERS_BY_SEGMENT,
    "top_orders": SQL_TOP_ORDERS,
    "events_per_user": SQL_EVENTS_PER_USER,
    "suppliers_by_region": SQL_SUPPLIERS_BY_REGION,
    "distinct_part_types": SQL_DISTINCT_PART_TYPES,
    "order_customers_without_events": SQL_ORDER_CUSTOMERS_WITHOUT_EVENTS,
    "top3_orders_per_segment": SQL_TOP3_ORDERS_PER_SEGMENT,
    "asof_latest_order_per_event": SQL_ASOF_LATEST_ORDER_PER_EVENT,
    "event_concurrency": SQL_EVENT_CONCURRENCY,
    "event_pattern_matches": SQL_EVENT_PATTERN_MATCHES,
    "blocklist_filter": SQL_BLOCKLIST_FILTER,
    "events_cube": SQL_EVENTS_CUBE,
    "funnel_depths": SQL_FUNNEL_DEPTHS,
    "value_quantiles_by_type": SQL_VALUE_QUANTILES_BY_TYPE,
    "events_value_ranges": SQL_EVENTS_VALUE_RANGES,
    "revenue_by_priority": SQL_REVENUE_BY_PRIORITY,
    "order_revenue_topk": SQL_ORDER_REVENUE_TOPK,
    "regional_nation_revenue": SQL_REGIONAL_NATION_REVENUE,
    "late_ship_priority_counts": SQL_LATE_SHIP_PRIORITY_COUNTS,
    "customer_order_distribution": SQL_CUSTOMER_ORDER_DISTRIBUTION,
    "user_top_event_type": SQL_USER_TOP_EVENT_TYPE,
    "large_volume_orders": SQL_LARGE_VOLUME_ORDERS,
    "idle_rich_customers": SQL_IDLE_RICH_CUSTOMERS,
    "small_quantity_part_revenue": SQL_SMALL_QUANTITY_PART_REVENUE,
    "customer_balance_ranks": SQL_CUSTOMER_BALANCE_RANKS,
    "promo_revenue_share": SQL_PROMO_REVENUE_SHARE,
    "top_supplier_revenue": SQL_TOP_SUPPLIER_REVENUE,
    "brand_disjunctive_revenue": SQL_BRAND_DISJUNCTIVE_REVENUE,
    "lonely_late_suppliers": SQL_LONELY_LATE_SUPPLIERS,
    "cms_user_registers": SQL_CMS_USER_REGISTERS,
    "user_event_type_pivot": SQL_USER_EVENT_TYPE_PIVOT,
    "order_growth_by_quarter": SQL_ORDER_GROWTH_BY_QUARTER,
    "returned_customer_revenue": SQL_RETURNED_CUSTOMER_REVENUE,
    "nation_trade_volume": SQL_NATION_TRADE_VOLUME,
    "value_moments_by_type": SQL_VALUE_MOMENTS_BY_TYPE,
    "repeat_buyer_customers": SQL_REPEAT_BUYER_CUSTOMERS,
    "forecast_revenue_change": SQL_FORECAST_REVENUE_CHANGE,
    "nation_market_share": SQL_NATION_MARKET_SHARE,
    "term_search_topk": SQL_TERM_SEARCH_TOPK,
    "part_nation_revenue": SQL_PART_NATION_REVENUE,
    "click_abandonment": SQL_CLICK_ABANDONMENT,
    "bigram_topk": SQL_BIGRAM_TOPK,
    "customer_balance_ntiles": SQL_CUSTOMER_BALANCE_NTILES,
    "top_decile_revenue_share": SQL_TOP_DECILE_REVENUE_SHARE,
    "dup_cluster_size_hist": SQL_DUP_CLUSTER_SIZE_HIST,
    "customer_reorder_gaps": SQL_CUSTOMER_REORDER_GAPS,
    "dau_wau_stickiness": SQL_DAU_WAU_STICKINESS,
    "nation_revenue_share_in_region": SQL_NATION_REVENUE_SHARE_IN_REGION,
    "user_retention_cohorts": SQL_USER_RETENTION_COHORTS,
    "vocab_growth_by_source": SQL_VOCAB_GROWTH_BY_SOURCE,
    "hourly_seasonality": SQL_HOURLY_SEASONALITY,
    "part_supplier_counts": SQL_PART_SUPPLIER_COUNTS,
    "ship_latency_hist": SQL_SHIP_LATENCY_HIST,
    "doc_len_quantiles_by_lang": SQL_DOC_LEN_QUANTILES_BY_LANG,
    "union_distinct_orderkeys": SQL_UNION_DISTINCT_ORDERKEYS,
    "click_events_filtered": SQL_CLICK_EVENTS_FILTERED,
    "props_extract": SQL_PROPS_EXTRACT,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "quality_scores": SQL_QUALITY_SCORES,
    "lang_id": SQL_LANG_ID,
    "fingerprints": SQL_FINGERPRINTS,
    "simhash": SQL_SIMHASH,
    "minhash_signatures": SQL_MINHASH_SIGNATURES,
    "minhash_near_dups": SQL_MINHASH_NEAR_DUPS,
    "cep_near_dup_stream": SQL_CEP_NEAR_DUP_STREAM,
    "cep_stream_join": SQL_CEP_STREAM_JOIN,
    "simhash_near_dups": SQL_SIMHASH_NEAR_DUPS,
    "near_dup_canonical": SQL_NEAR_DUP_CANONICAL,
    "heavy_hitter_tokens": SQL_HEAVY_HITTER_TOKENS,
    "regex_token_counts": SQL_REGEX_TOKEN_COUNTS,
    "value_rank_select": SQL_VALUE_RANK_SELECT,
    "click_purchase_pairs": SQL_CLICK_PURCHASE_PAIRS,
    "doc_split_assign": SQL_DOC_SPLIT_ASSIGN,
    "mixture_sample": SQL_MIXTURE_SAMPLE,
    "mixture_upsample": SQL_MIXTURE_UPSAMPLE,
    "repetition_scores": SQL_REPETITION_SCORES,
    "lm_quality_scores": SQL_LM_QUALITY_SCORES,
    "dup_shingle_stats": SQL_DUP_SHINGLE_STATS,
    "substring_dup_spans": SQL_SUBSTRING_DUP_SPANS,
    "bpe_merges": SQL_BPE_MERGES,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "late_events": SQL_LATE_EVENTS,
    "quality_filter": SQL_QUALITY_FILTER,
    "windowed_topk_events": SQL_WINDOWED_TOPK_EVENTS,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "user_running_value": SQL_USER_RUNNING_VALUE,
    "kmeans_clusters": SQL_KMEANS_CLUSTERS,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "cluster_label_purity": SQL_CLUSTER_LABEL_PURITY,
    "event_session_ids": SQL_EVENT_SESSION_IDS,
    "reservoir_sample": SQL_RESERVOIR_SAMPLE,
    "sequence_packing": SQL_SEQUENCE_PACKING,
    "distinct_users_per_type": SQL_DISTINCT_USERS_PER_TYPE,
    "video_frame_plans": SQL_VIDEO_FRAME_PLANS,
    "audio_chunk_plans": SQL_AUDIO_CHUNK_PLANS,
    "hll_user_registers": SQL_HLL_USER_REGISTERS,
    "text_scrub": SQL_TEXT_SCRUB,
    "decontam_flags": SQL_DECONTAM_FLAGS,
    "curation_pipeline": SQL_CURATION_PIPELINE,
    "summarize_documents": SQL_SUMMARIZE_DOCUMENTS,
    "domain_fileset_previews": SQL_DOMAIN_FILESET_PREVIEWS,
    "user_value_moving_sum": SQL_USER_VALUE_MOVING_SUM,
    "user_first_last_value": SQL_USER_FIRST_LAST_VALUE,
    "part_dominant_suppliers": SQL_PART_DOMINANT_SUPPLIERS,
    "min_cost_part_supplier": SQL_MIN_COST_PART_SUPPLIER,
    "part_value_threshold": SQL_PART_VALUE_THRESHOLD,
    "returnflag_priority_counts": SQL_RETURNFLAG_PRIORITY_COUNTS,
    "user_event_path": SQL_USER_EVENT_PATH,
}

"""Stateless vectorized derivation stages (pyarrow.compute kernels only).

- domain extraction from url (the CEP key column)
- binary sniff on the html payload (reference: src/main.rs:313-346 —
  skip-with-notice becomes a `skipped` flag column)
- tumbling / sliding window-id assignment over warc_ts event time
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_DOMAIN_PATTERN = r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?(?P<host>[^/:?#]+)"


def add_domain(batch: pa.Table, url_column: str = "url") -> pa.Table:
    """Append `domain` = url host, vectorized via extract_regex."""
    urls = batch.column(url_column)
    if len(urls) == 0:
        host = pa.array([], pa.string())
    else:
        ex = pc.extract_regex(urls, pattern=_DOMAIN_PATTERN)
        host = pc.struct_field(ex, "host")
    return batch.append_column("domain", host)


# content_inspector parity (reference src/main.rs:313-346 via
# content_inspector::inspect): a BOM-prefixed UTF-8/16/32 payload is TEXT
# even though UTF-16/32 encodings contain NUL bytes; otherwise a NUL in
# the first `scan` bytes means binary.
_TEXT_BOMS = (
    b"\xef\xbb\xbf",  # UTF-8 BOM
    b"\xff\xfe\x00\x00",  # UTF-32 LE (checked before its UTF-16 prefix)
    b"\x00\x00\xfe\xff",  # UTF-32 BE
    b"\xff\xfe",  # UTF-16 LE
    b"\xfe\xff",  # UTF-16 BE
)


def looks_binary(first: bytes, scan: int = 1024) -> bool:
    """True when a payload prefix sniffs as binary: NUL in the first
    `scan` bytes UNLESS the payload starts with a text BOM."""
    if not first:
        return False
    for bom in _TEXT_BOMS:
        if first.startswith(bom):
            return False
    return b"\x00" in first[:scan]


def add_binary_sniff(
    batch: pa.Table, html_column: str = "html", sniff_bytes: int = 1024
) -> pa.Table:
    """Append `skipped` = payload-looks-binary (looks_binary above)."""
    col = batch.column(html_column)
    flags = []
    for chunk in col.chunks:
        for buf in chunk:
            v = buf.as_py()
            flags.append(v is not None and looks_binary(v, sniff_bytes))
    return batch.append_column("skipped", pa.array(flags, pa.bool_()))


def add_tumbling_window(
    batch: pa.Table,
    size_s: int,
    ts_column: str = "warc_ts",
    out_column: str = "window_id",
) -> pa.Table:
    """window_id = floor(event_time / size) as int64 (vectorized)."""
    ts = batch.column(ts_column)
    micros = pc.cast(ts, pa.int64())
    wid = pc.divide(micros, pa.scalar(size_s * 1_000_000, pa.int64()))
    # floor-divide semantics for negative ts: arrow divide truncates; event
    # times here are positive epochs so truncation == floor.
    return batch.append_column(out_column, wid)


def explode_sliding_windows(
    batch: pa.Table,
    size_s: int,
    slide_s: int,
    ts_column: str = "warc_ts",
    out_column: str = "window_id",
) -> pa.Table:
    """Replicate each row into every sliding window containing its ts.

    A row at time t belongs to windows w with
    w*slide <= t < w*slide + size, i.e. w in
    (floor((t-size)/slide), floor(t/slide)] — size/slide rows out per
    row in. window_id is the window's start/slide index.
    """
    assert size_s % slide_s == 0, "size must be a multiple of slide"
    k = size_s // slide_s
    micros = pc.cast(batch.column(ts_column), pa.int64())
    slide_us = slide_s * 1_000_000
    last = pc.divide(micros, pa.scalar(slide_us, pa.int64()))
    pieces = []
    for j in range(k):
        wid = pc.subtract(last, pa.scalar(j, pa.int64()))
        pieces.append(batch.append_column(out_column, wid))
    out = pa.concat_tables(pieces)
    # Drop replicas whose window would end after.. no: every one of the k
    # windows [w*slide, w*slide+size) with w in (last-k, last] contains t
    # when t >= 0, except windows with negative start for early ts.
    return out.filter(pc.greater_equal(out.column(out_column), 0))

"""Conformance: byte-equality against the reference's committed snapshot
corpus (insta .snap files under /root/reference/tests/snapshots).

Each snapshot name encodes the CLI invocation; we re-derive the config the
same way the reference CLI does (headson_ray.core.cli) and compare our
render + "\n" (the println! newline) to the snapshot body.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from headson_ray.core.cli import CliOptions, run_stdin

REF = Path("/root/reference")
SNAP_DIR = REF / "tests" / "snapshots"
FIXTURE_DIRS = [
    REF / "tests" / "fixtures" / "parametric",
    REF / "tests" / "fixtures" / "explicit",
]

_E2E_RE = re.compile(
    r"^e2e(?:_(head|tail))?__e2e(?:_(?:head|tail))?_(.+?)"
    r"(?:__([a-z]+))?(?:__n(\d+))?\.snap$"
)

# Reference-side anomaly: this committed snapshot indents one empty-object
# array child at depth 8 (16 spaces) where the reference's own renderer
# (json.rs empty-object path at ctx.depth=4) and every sibling snapshot
# produce depth 4 (8 spaces). Our render matches the other 205 snapshots
# byte-for-byte; treat this one as a known divergence.
_KNOWN_DIVERGENT = {"e2e_tail__e2e_tail_mixed_arrays_json__json__n200.snap"}


def _snap_body(path: Path) -> str:
    text = path.read_text()
    # insta format: ---\nsource: ...\nexpression: ...\n---\n<body>
    marker = "---\n"
    second = text.index(marker, len(marker))
    return text[second + len(marker):]


def _find_fixture(base: str) -> Path | None:
    # base is the fixture filename with '.' replaced by '_'
    for d in FIXTURE_DIRS:
        for f in d.iterdir():
            if f.name.replace(".", "_") == base:
                return f
    return None


def _opts_for_template(tmpl: str, n: int, mode: str | None) -> CliOptions:
    opts = CliOptions(budget=n)
    if tmpl == "json":
        opts.format, opts.style = "json", "strict"
    elif tmpl == "pseudo":
        opts.format, opts.style = "json", "default"
    elif tmpl == "js":
        opts.format, opts.style = "json", "detailed"
    elif tmpl == "yaml":
        opts.format, opts.input_format = "yaml", "yaml"
    else:
        opts.format = tmpl
    if mode == "head":
        opts.head = True
    elif mode == "tail":
        opts.tail = True
    return opts


def _e2e_cases():
    cases = []
    for snap in sorted(SNAP_DIR.glob("e2e*.snap")):
        m = _E2E_RE.match(snap.name)
        if not m:
            continue
        mode, base, tmpl, n = (
            m.group(1),
            m.group(2),
            m.group(3) or "pseudo",
            int(m.group(4) or 500),
        )
        fixture = _find_fixture(base)
        if fixture is None:
            continue
        marks = (
            [pytest.mark.xfail(reason="stale reference snapshot", strict=True)]
            if snap.name in _KNOWN_DIVERGENT
            else []
        )
        cases.append(
            pytest.param(snap, fixture, tmpl, n, mode, id=snap.stem, marks=marks)
        )
    return cases


_CASES = _e2e_cases()


def test_corpus_found():
    assert len(_CASES) >= 194, f"expected full e2e grid, got {len(_CASES)}"


@pytest.mark.parametrize("snap,fixture,tmpl,n,mode", _CASES)
def test_e2e_snapshot(snap, fixture, tmpl, n, mode):
    opts = _opts_for_template(tmpl, n, mode)
    out = run_stdin(opts, fixture.read_bytes())
    expected = _snap_body(snap)
    assert out + "\n" == expected

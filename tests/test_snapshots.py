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

# Reference-side STALE snapshot (verified, round 2). The committed body
# renders the `{}` array child under "deep"[0]."a" with 16 leading spaces;
# the reference's CURRENT renderer can only emit 8 there:
#   - a single-line Object array item is pushed with NO extra parent indent
#     (templates/core.rs:44-53 push_single_array_item, Object arm), so its
#     only indentation is the open_block indent at its own render depth
#     (templates/core.rs:103-111), which is depth+1 = 4 -> 8 spaces;
#   - the n1000 sibling snapshot renders that exact subtree (`"a": [` ->
#     `{` ...) with the code-consistent 8-space indentation.
# Every byte of our output matches the snapshot EXCEPT that one line's
# indentation (verified by diff), so the snapshot predates a renderer fix
# in the reference (old double-indent: parent indent + child's own). The
# strict xfail pins the divergence to exactly this snapshot.
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

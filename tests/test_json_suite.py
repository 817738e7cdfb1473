"""JSONTestSuite conformance, mirroring the reference's
tests/json_parse_files.rs: y_ files must be accepted and round-trip
semantically through the strict-JSON template; n_ files must be rejected.
Same 3 documented skips as the reference (json_parse_files.rs:40-50).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from headson_ray.core.cli import CliOptions, run_stdin

FIX = Path(
    "/root/reference/tests/fixtures/json/JSONTestSuite/test_parsing"
)
SKIP = {
    "n_multidigit_number_then_00.json",
    "y_number_minus_zero.json",
    "y_number_negative_zero.json",
}

_Y = [f for f in sorted(FIX.glob("y_*.json")) if f.name not in SKIP]
_N = [f for f in sorted(FIX.glob("n_*.json")) if f.name not in SKIP]


def test_corpus_found():
    assert len(_Y) >= 90 and len(_N) >= 180


def _run(data: bytes) -> str:
    return run_stdin(
        CliOptions(budget=10_000, format="json", style="strict"), data
    )


@pytest.mark.parametrize("path", _Y, ids=lambda p: p.stem)
def test_y_roundtrip(path):
    data = path.read_bytes()
    out = _run(data)
    original = json.loads(data.decode("utf-8", "surrogatepass"))
    assert json.loads(out) == original


@pytest.mark.parametrize("path", _N, ids=lambda p: p.stem)
def test_n_rejected(path):
    with pytest.raises(Exception):
        _run(path.read_bytes())

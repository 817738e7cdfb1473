"""CI-sized long-horizon CEP soak: many micro-batches with forced
seen-state spill and a hard crash exactly AT a finalize boundary
(finalized parts written, commit record absent), then resume.

The script itself asserts the three invariants (byte-equal outputs,
O(num_actors) snapshot retention, exactly one commit per batch); the
full-scale 400-batch variant runs out-of-band:

    python scripts/cep_long_soak.py            # 400 batches

This test runs the identical logic at 30 batches so the suite stays
fast. No ray_session fixture: the script owns its own Ray sessions in
subprocesses.
"""

from __future__ import annotations

import json
import subprocess
import sys


def test_cep_long_soak_scaled(tmp_path):
    r = subprocess.run(
        [
            sys.executable,
            "scripts/cep_long_soak.py",
            "--batches", "30",
            "--rows-per-batch", "20",
            "--crash-at", "6",
            "--workdir", str(tmp_path / "soak"),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=560,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["ok"] is True
    # snapshot retention held for every actor in both runs
    assert summary["snapshot_pickles"]
    assert all(v <= 2 for v in summary["snapshot_pickles"].values())

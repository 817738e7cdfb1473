"""Green-window hunter for the scaling protocol: probe the box's own
8->32-process memory-bandwidth scaling (bench._membw_scaling_baseline)
once a minute and exit when GRAFT_MEMBW_CONSEC consecutive probes clear
the gate — the signal to launch `python bench.py --scaling` so its legs
sample a healthy epoch instead of a trough (BASELINE.md round-5
scaling protocol; traces land in /tmp/membw_trace.json).

Usage: python tools/membw_hunt.py [max_seconds=3600]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

GATE = float(os.environ.get("GRAFT_MEMBW_GATE", "0.7"))
CONSEC = int(os.environ.get("GRAFT_MEMBW_CONSEC", "2"))


def main() -> None:
    t_end = time.time() + (
        float(sys.argv[1]) if len(sys.argv) > 1 else 3600.0
    )
    trace, green = [], 0
    while time.time() < t_end:
        p = bench._membw_scaling_baseline(8, 32)
        rec = {
            "probe": round(p, 3),
            "loadavg": round(os.getloadavg()[0], 2),
            "unix": round(time.time(), 1),
        }
        trace.append(rec)
        print(json.dumps(rec), flush=True)
        green = green + 1 if p >= GATE else 0
        if green >= CONSEC:
            print("GREEN_WINDOW", flush=True)
            break
        time.sleep(60)
    json.dump(trace, open("/tmp/membw_trace.json", "w"))
    sys.exit(0 if green >= CONSEC else 1)


if __name__ == "__main__":
    main()

"""Throughput soak of the webtext crawl suite at 480k pages (4x the
bench stream): measures pages/s per operator on one streaming
execution each, plus peak driver RSS, to evidence that the crawl
operators hold their scale posture well past the 20k-row oracle size.

Usage: python scripts/soak_webtext.py [rows]
Never run while other Ray sessions / pytest runs are live.
"""

from __future__ import annotations

import json
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    from headson_ray.pipelines import webtext
    from headson_ray.sources.pages import materialize_pages

    paths = materialize_pages(
        rows, tag=f"webtext-soak-{rows}", num_shards=max(8, rows // 10_000)
    )

    ops = {
        "url_host_stats": lambda: webtext.url_host_stats(paths),
        "url_canonical_dedup": lambda: webtext.url_canonical_dedup(paths),
        "host_lang_profile": lambda: webtext.host_lang_profile(paths),
        "extraction_ratios": lambda: webtext.extraction_ratios(paths),
        "mirror_hosts": lambda: webtext.mirror_host_detection(paths),
        "host_boilerplate_lines": lambda: webtext.host_boilerplate_lines(
            paths
        ),
        "host_link_graph": lambda: webtext.host_link_graph(paths, rows),
        "host_pagerank": lambda: webtext.host_pagerank(paths, rows),
    }
    out: dict[str, dict] = {}
    for name, fn in ops.items():
        t0 = time.time()
        res = fn()
        n_out = 0
        if hasattr(res, "iter_batches"):
            for b in res.iter_batches(
                batch_format="pyarrow", batch_size=8192
            ):
                n_out += b.num_rows
        else:
            n_out = res.num_rows
        dt = time.time() - t0
        out[name] = {
            "sec": round(dt, 2),
            "pages_per_sec": round(rows / dt),
            "out_rows": n_out,
        }
        print(f"{name}: {dt:.1f}s  {rows / dt:,.0f} pages/s  "
              f"{n_out} out rows", flush=True)

    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(json.dumps({"rows": rows, "ops": out, "driver_peak_mb": peak_mb}))
    ray.shutdown()


if __name__ == "__main__":
    main()

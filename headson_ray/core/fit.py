"""Budget fitting: binary-search the largest top-k render under budget.

Re-expression of /root/reference/src/lib.rs:117-179 and
src/utils/search.rs:2-18. Length is measured on the *uncolored* render
(byte length, UTF-8), then one final render applies the real color config.
"""

from __future__ import annotations

from .config import RenderConfig
from .order import PriorityOrder
from .render import render_top_k


def _byte_len(s: str) -> int:
    # Budget counts serialized bytes (Rust String::len)
    if s.isascii():
        return len(s)
    return len(s.encode("utf-8"))


def find_largest_render_under_budget(
    order: PriorityOrder, config: RenderConfig, char_budget: int
) -> str:
    total = order.total_nodes
    if total == 0:
        return ""
    lo = 1
    hi = min(total, max(char_budget, 1))
    best_k = None
    measure_cfg = (
        config if not config.color_enabled
        else config.copy_with(color_enabled=False)
    )

    # binary_search_max (src/utils/search.rs:2-18). The probes share a
    # render cache for fully-included subtrees (k-independent renders);
    # the final render rebuilds cleanly with the real color config.
    probe_cache: dict = {}
    while lo <= hi:
        mid = lo + (hi - lo) // 2
        s = render_top_k(order, mid, measure_cfg, probe_cache)
        if _byte_len(s) <= char_budget:
            best_k = mid
            lo = mid + 1
        else:
            hi = mid - 1

    k = best_k if best_k is not None else 1
    return render_top_k(order, k, config)

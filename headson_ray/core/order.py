"""Priority ranking: best-first expansion of the arena into a ranked order.

Re-expression of /root/reference/src/order/build.rs (min-heap on
(score, insertion id), breadth-first with depth/sibling biases) and
src/order/scoring.rs constants. Scores use Python ints (covers u128).
"""

from __future__ import annotations

import heapq

from . import arena as A
from .config import BIAS_HEAD, PriorityConfig
from .graphemes import count_graphemes_capped

# Scoring constants (reference: src/order/scoring.rs)
SAFETY_CAP = 2_000_000
ROOT_BASE_SCORE = 1
ARRAY_CHILD_BASE_INCREMENT = 1
ARRAY_INDEX_CUBIC_WEIGHT = 1_000_000_000_000
OBJECT_CHILD_BASE_INCREMENT = 1
STRING_CHILD_BASE_INCREMENT = 1
STRING_CHILD_LINEAR_WEIGHT = 1
STRING_INDEX_INFLECTION = 20
STRING_INDEX_QUADRATIC_WEIGHT = 1

# Ranked node types (reference: src/order/types.rs:60-87)
N_ARRAY = 0
N_OBJECT = 1
N_SPLITTABLE = 2  # truncatable string leaf
N_LEAFPART = 3  # synthetic per-grapheme child (never rendered)
N_ATOMIC = 4  # null/bool/number token


class PriorityOrder:
    """Ranked view (reference: src/order/types.rs:129-143)."""

    __slots__ = (
        "node_type",
        "key_in_object",
        "payload",
        "parent",
        "children",
        "index_in_parent_array",
        "by_priority",
        "total_nodes",
        "root_is_fileset",
        "m_array_len",
        "m_object_len",
        "m_string_len",
        "m_string_truncated",
        "inc_rank",
        "sorted_child_ranks",
        "subtree_max_rank",
    )

    def __init__(self) -> None:
        self.node_type: list[int] = []
        self.key_in_object: list[str | None] = []
        self.payload: list[str | None] = []
        self.parent: list[int | None] = []
        self.children: list[list[int]] = []
        self.index_in_parent_array: list[int | None] = []
        self.by_priority: list[int] = []
        self.total_nodes = 0
        self.root_is_fileset = False
        self.m_array_len: list[int | None] = []
        self.m_object_len: list[int | None] = []
        self.m_string_len: list[int | None] = []
        self.m_string_truncated: list[bool] = []
        # lazy render-support caches (see render.render_top_k):
        # inc_rank[nid] = min priority rank over nid's subtree; a node is
        # in the inclusion set for top-k iff inc_rank[nid] < k (equivalent
        # to the reference's mark-top-k-and-ancestors, graph.rs:41-61,
        # because ancestors inherit the min rank of their descendants)
        self.inc_rank: list[int] | None = None
        self.sorted_child_ranks: dict[int, list[int]] = {}
        # subtree_max_rank[nid] = max inc_rank over nid's subtree; when
        # it is < k the WHOLE subtree is included and its render is
        # independent of k — the budget-fit probes cache such renders
        self.subtree_max_rank: list[int] | None = None

    def ensure_inc_rank(self) -> list[int]:
        inc = self.inc_rank
        if inc is None:
            n_ids = len(self.parent)
            inf = n_ids + 1
            inc = [inf] * n_ids
            for r, nid in enumerate(self.by_priority):
                inc[nid] = r
            parent = self.parent
            for nid in reversed(self.by_priority):
                p = parent[nid]
                if p is not None and inc[nid] < inc[p]:
                    inc[p] = inc[nid]
            self.inc_rank = inc
        return inc

    def ensure_subtree_max_rank(self) -> list[int]:
        m = self.subtree_max_rank
        if m is None:
            inc = self.ensure_inc_rank()
            m = list(inc)
            children = self.children
            # children rank strictly after parents in by_priority (scores
            # are strictly increasing down the tree), so the reversed
            # walk sees every child before its parent; pulling through
            # the children lists also propagates the inf of any
            # never-ranked node (budget-bounded expansion) conservatively
            for nid in reversed(self.by_priority):
                mn = m[nid]
                for c in children[nid]:
                    if m[c] > mn:
                        mn = m[c]
                m[nid] = mn
            self.subtree_max_rank = m
        return m


_KIND_TO_TYPE = {
    A.K_ARRAY: N_ARRAY,
    A.K_OBJECT: N_OBJECT,
    A.K_STRING: N_SPLITTABLE,
    A.K_NULL: N_ATOMIC,
    A.K_BOOL: N_ATOMIC,
    A.K_NUMBER: N_ATOMIC,
}


def _array_extra(cfg: PriorityConfig, i: int, kept: int) -> int:
    """Array-position bias (reference: src/order/build.rs:130-150)."""
    if cfg.prefer_tail_arrays:
        d = max(0, (kept - 1) - i) if kept > 0 else 0
        return d * d * d * ARRAY_INDEX_CUBIC_WEIGHT
    if cfg.array_bias == BIAS_HEAD:
        return i * i * i * ARRAY_INDEX_CUBIC_WEIGHT
    mid = (kept - 1) // 2 if kept > 0 else 0
    d = min(i, (kept - 1) - i, abs(i - mid))
    return d * d * d * ARRAY_INDEX_CUBIC_WEIGHT


def build_order(
    arena: A.TreeArena, cfg: PriorityConfig, stop_after: int | None = None
) -> PriorityOrder:
    """Best-first expansion (reference: src/order/build.rs:377-470).

    ``stop_after`` bounds the number of processed (popped) nodes: the
    budget fit only ever includes ranks < min(total, char_budget), so
    processing past ``char_budget`` pops cannot change any render. Output
    is byte-identical to the unbounded build for every k <= stop_after;
    at 100 TB scale this keeps a giant document (500 MB html cell) from
    expanding millions of nodes for a 500-char preview. Same-score
    sibling pushes (object children, string grapheme parts) are capped by
    the remaining pop quota for the same reason; array children are NOT
    capped because the head/mid/tail bias makes their scores
    non-monotonic in sibling order (the sampler already bounds them).
    """
    o = PriorityOrder()
    o.root_is_fileset = arena.is_fileset
    nt = o.node_type
    keys = o.key_in_object
    payload = o.payload
    parent = o.parent
    children = o.children
    in_arr = o.index_in_parent_array
    mal = o.m_array_len
    mol = o.m_object_len
    msl = o.m_string_len
    mst = o.m_string_truncated
    order = o.by_priority

    ak = arena.kind
    a_tok = arena.atomic_token
    a_str = arena.string_value
    a_cs = arena.children_start
    a_cl = arena.children_len
    a_ks = arena.obj_keys_start
    a_al = arena.array_len
    a_ol = arena.object_len
    a_children = arena.children
    a_obj_keys = arena.obj_keys

    def push_node(
        ntype: int, key: str | None, pl: str | None,
        par: int | None, idx_in_arr: int | None,
    ) -> int:
        nid = len(nt)
        nt.append(ntype)
        keys.append(key)
        payload.append(pl)
        parent.append(par)
        children.append([])
        in_arr.append(idx_in_arr)
        mal.append(None)
        mol.append(None)
        msl.append(None)
        mst.append(False)
        return nid

    # Seed root
    root_ar = arena.root_id
    rk = ak[root_ar]
    push_node(
        _KIND_TO_TYPE[rk],
        None,
        a_str[root_ar] if rk == A.K_STRING else a_tok[root_ar],
        None,
        None,
    )
    next_pq_id = 1
    heap: list[tuple[int, int, int]] = [(ROOT_BASE_SCORE, 0, root_ar)]
    # arena id -1 marks synthetic (LeafPart) entries
    cap_graphemes = cfg.max_string_graphemes

    while heap:
        score, pq_id, ar_id = heapq.heappop(heap)
        order.append(pq_id)
        ntype = nt[pq_id]
        if ar_id >= 0:
            # Record metrics (reference: build.rs:86-128)
            if ntype == N_ARRAY:
                al = a_al[ar_id]
                mal[pq_id] = al if al is not None else a_cl[ar_id]
            elif ntype == N_OBJECT:
                ol = a_ol[ar_id]
                mol[pq_id] = ol if ol is not None else a_cl[ar_id]
            elif ntype == N_SPLITTABLE:
                cnt, trunc = count_graphemes_capped(
                    payload[pq_id], cap_graphemes
                )
                msl[pq_id] = cnt
                mst[pq_id] = trunc

        # rank len(order)-1 just became final; deeper pops can never be
        # included once the quota is met, so skip expanding further
        if stop_after is not None and len(order) >= stop_after:
            break

        if ntype == N_ARRAY:
            kept = a_cl[ar_id]
            cs = a_cs[ar_id]
            my_children = children[pq_id]
            for i in range(kept):
                child_ar = a_children[cs + i]
                ck = ak[child_ar]
                cid = next_pq_id
                next_pq_id += 1
                orig_index = arena.orig_index(ar_id, i)
                child_score = (
                    score
                    + ARRAY_CHILD_BASE_INCREMENT
                    + _array_extra(cfg, i, kept)
                )
                push_node(
                    _KIND_TO_TYPE[ck],
                    None,
                    a_str[child_ar] if ck == A.K_STRING else a_tok[child_ar],
                    pq_id,
                    orig_index,
                )
                my_children.append(cid)
                heapq.heappush(heap, (child_score, cid, child_ar))
                if next_pq_id >= SAFETY_CAP:
                    break
        elif ntype == N_OBJECT:
            count = a_cl[ar_id]
            cs = a_cs[ar_id]
            ks = a_ks[ar_id]
            # Children sorted by key (ties by original position)
            items = sorted(
                ((a_obj_keys[ks + i], ks + i, a_children[cs + i])
                 for i in range(count)),
                key=lambda t: (t[0], t[1]),
            )
            my_children = children[pq_id]
            if stop_after is not None:
                items = items[: max(0, stop_after - len(order))]
            for key_text, _ki, child_ar in items:
                ck = ak[child_ar]
                cid = next_pq_id
                next_pq_id += 1
                child_score = score + OBJECT_CHILD_BASE_INCREMENT
                push_node(
                    _KIND_TO_TYPE[ck],
                    key_text,
                    a_str[child_ar] if ck == A.K_STRING else a_tok[child_ar],
                    pq_id,
                    None,
                )
                my_children.append(cid)
                heapq.heappush(heap, (child_score, cid, child_ar))
                if next_pq_id >= SAFETY_CAP:
                    break
        elif ntype == N_SPLITTABLE:
            # One synthetic LeafPart per grapheme (build.rs:291-331)
            full = payload[pq_id] or ""
            count, _ = count_graphemes_capped(full, cap_graphemes)
            my_children = children[pq_id]
            push_count = count
            if stop_after is not None:
                push_count = min(count, max(0, stop_after - len(order)))
            push_count = min(push_count, SAFETY_CAP - next_pq_id)
            if push_count > 0:
                # all LeafParts share identical metadata except id: bulk-
                # extend the parallel arrays instead of 10 appends per part
                cid0 = next_pq_id
                next_pq_id += push_count
                nt.extend([N_LEAFPART] * push_count)
                keys.extend([None] * push_count)
                payload.extend([None] * push_count)
                parent.extend([pq_id] * push_count)
                children.extend([] for _ in range(push_count))
                in_arr.extend([None] * push_count)
                mal.extend([None] * push_count)
                mol.extend([None] * push_count)
                msl.extend([None] * push_count)
                mst.extend([False] * push_count)
                my_children.extend(range(cid0, cid0 + push_count))
                base = score + STRING_CHILD_BASE_INCREMENT
                for i in range(push_count):
                    if i > STRING_INDEX_INFLECTION:
                        d = i - STRING_INDEX_INFLECTION
                        extra = d * d * STRING_INDEX_QUADRATIC_WEIGHT
                    else:
                        extra = 0
                    heapq.heappush(
                        heap,
                        (base + i * STRING_CHILD_LINEAR_WEIGHT + extra,
                         cid0 + i, -1),
                    )

        if next_pq_id >= SAFETY_CAP:
            # Drain remaining heap entries into the order for consistency
            # with the reference (which stops expanding but has already
            # allocated ids for queued nodes).
            break

    # Any nodes still queued after a safety-cap break keep their slots but
    # are not appended to by_priority — matching the reference, where the
    # loop exits and by_priority only holds processed entries.
    o.total_nodes = next_pq_id
    return o

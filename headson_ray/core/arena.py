"""Flat, column-oriented tree arena — the neutral IR for all ingest formats.

Re-expression of the reference's JsonTreeArena
(/root/reference/src/utils/tree_arena.rs:3-51) as parallel Python lists
(one entry per node) to keep per-document allocation cheap inside Ray Data
map_batches workers.
"""

from __future__ import annotations

# Node kinds (reference: src/order/types.rs:27-35)
K_NULL = 0
K_BOOL = 1
K_NUMBER = 2
K_STRING = 3
K_ARRAY = 4
K_OBJECT = 5


class TreeArena:
    __slots__ = (
        "kind",
        "atomic_token",
        "string_value",
        "children_start",
        "children_len",
        "obj_keys_start",
        "obj_keys_len",
        "array_len",
        "object_len",
        "arr_indices_start",
        "arr_indices_len",
        "children",
        "obj_keys",
        "arr_indices",
        "root_id",
        "is_fileset",
    )

    def __init__(self) -> None:
        self.kind: list[int] = []
        self.atomic_token: list[str | None] = []
        self.string_value: list[str | None] = []
        self.children_start: list[int] = []
        self.children_len: list[int] = []
        self.obj_keys_start: list[int] = []
        self.obj_keys_len: list[int] = []
        self.array_len: list[int | None] = []
        self.object_len: list[int | None] = []
        self.arr_indices_start: list[int] = []
        self.arr_indices_len: list[int] = []
        self.children: list[int] = []
        self.obj_keys: list[str] = []
        self.arr_indices: list[int] = []
        self.root_id: int = 0
        self.is_fileset: bool = False

    def _push_default(self) -> int:
        nid = len(self.kind)
        self.kind.append(K_NULL)
        self.atomic_token.append(None)
        self.string_value.append(None)
        self.children_start.append(0)
        self.children_len.append(0)
        self.obj_keys_start.append(0)
        self.obj_keys_len.append(0)
        self.array_len.append(None)
        self.object_len.append(None)
        self.arr_indices_start.append(0)
        self.arr_indices_len.append(0)
        return nid

    def push_null(self) -> int:
        nid = self._push_default()
        self.atomic_token[nid] = "null"
        return nid

    def push_bool(self, v: bool) -> int:
        nid = self._push_default()
        self.kind[nid] = K_BOOL
        self.atomic_token[nid] = "true" if v else "false"
        return nid

    def push_number_token(self, token: str) -> int:
        nid = self._push_default()
        self.kind[nid] = K_NUMBER
        self.atomic_token[nid] = token
        return nid

    def push_string(self, s: str) -> int:
        nid = self._push_default()
        self.kind[nid] = K_STRING
        self.string_value[nid] = s
        return nid

    def push_array(
        self,
        child_ids: list[int],
        total_len: int,
        kept_indices: list[int] | None = None,
    ) -> int:
        """Finalize an array node (reference: builder.rs:95-129).

        ``kept_indices`` are original positions of kept children; elided
        when they are the contiguous prefix 0..kept.
        """
        nid = self._push_default()
        self.kind[nid] = K_ARRAY
        kept = len(child_ids)
        self.children_start[nid] = len(self.children)
        self.children.extend(child_ids)
        self.children_len[nid] = kept
        self.array_len[nid] = total_len
        if kept_indices and kept_indices != list(range(kept)):
            self.arr_indices_start[nid] = len(self.arr_indices)
            self.arr_indices.extend(kept_indices)
            self.arr_indices_len[nid] = min(len(kept_indices), kept)
        return nid

    def push_object(self, keys: list[str], child_ids: list[int]) -> int:
        """Finalize an object node (reference: builder.rs:131-150)."""
        nid = self._push_default()
        self.kind[nid] = K_OBJECT
        count = min(len(keys), len(child_ids))
        self.children_start[nid] = len(self.children)
        self.children.extend(child_ids)
        self.children_len[nid] = count
        self.obj_keys_start[nid] = len(self.obj_keys)
        self.obj_keys.extend(keys)
        self.obj_keys_len[nid] = count
        self.object_len[nid] = count
        return nid

    def orig_index(self, array_nid: int, i: int) -> int:
        """Original index of the i-th kept child of an array node."""
        if self.arr_indices_len[array_nid] > 0:
            return self.arr_indices[self.arr_indices_start[array_nid] + i]
        return i

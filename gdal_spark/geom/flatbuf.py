"""Minimal FlatBuffers wire-format codec (write + read) — just enough
of the format for FlatGeobuf's Header/Geometry/Feature tables, with
correct alignment so spec-conforming readers (including the reference's
generated C++ verifier) accept the output.

Wire format (public FlatBuffers internals documentation): buffers build
back-to-front; a table is [soffset32 -> vtable][field slots...] where
the vtable is [vt_size:u16][table_size:u16][slot_off:u16 per field id];
offset fields store a forward uoffset32 (target_addr - field_addr);
vectors are [count:u32][elements]; strings are vectors of bytes with a
NUL terminator. Alignment is maintained relative to the buffer END and
the finished buffer is front-padded to the max alignment, so every
scalar lands on its natural boundary.
"""

from __future__ import annotations

import struct


class Builder:
    """Back-to-front FlatBuffers builder. All create_* methods return
    an offset measured from the buffer END (converted to relative
    uoffsets when referenced)."""

    def __init__(self) -> None:
        self._chunks: list[bytes] = []  # in prepend order (reversed at finish)
        self._size = 0
        self._max_align = 4

    def _prepend(self, data: bytes) -> None:
        self._chunks.append(data)
        self._size += len(data)

    def _align(self, align: int, extra: int) -> None:
        """Pad so that after writing `extra` more bytes, the offset
        from the buffer end is a multiple of `align`."""
        self._max_align = max(self._max_align, align)
        pad = (-(self._size + extra)) % align
        if pad:
            self._prepend(b"\x00" * pad)

    def create_vector(self, fmt: str, values, elem_size: int) -> int:
        """Vector of scalars. `fmt` is the struct code per element."""
        body = struct.pack(f"<{len(values)}{fmt}", *values)
        # the ELEMENT DATA must sit on its natural boundary; the u32
        # count precedes it (and lands 4-aligned as a consequence)
        self._align(max(4, elem_size), len(body))
        self._prepend(struct.pack("<I", len(values)) + body)
        return self._size

    def create_byte_vector(self, data: bytes) -> int:
        self._align(4, len(data) + 4)
        self._prepend(struct.pack("<I", len(data)) + data)
        return self._size

    def create_string(self, s: str) -> int:
        raw = s.encode("utf-8")
        self._align(4, len(raw) + 1 + 4)
        self._prepend(struct.pack("<I", len(raw)) + raw + b"\x00")
        return self._size

    def create_offset_vector(self, offsets: list[int]) -> int:
        """Vector of uoffsets to already-written tables."""
        self._align(4, 4 * len(offsets) + 4)
        base = self._size + 4 * len(offsets)  # offset-from-end of element 0
        rel = [
            (base - 4 * i) - off  # field position minus target position
            for i, off in enumerate(offsets)
        ]
        self._prepend(
            struct.pack("<I", len(offsets)) + struct.pack(f"<{len(rel)}I", *rel)
        )
        return self._size

    def create_table(self, fields) -> int:
        """fields: list of (field_id, kind, value) with kind one of
        'u8' 'u16' 'i32' 'u32' 'u64' 'f64' 'bool' (inline scalars) or
        'offset' (uoffset to an already-created element). Fields with
        value None are omitted (reader falls back to defaults)."""
        present = [(fid, kind, v) for fid, kind, v in fields if v is not None]
        max_id = max((fid for fid, _, _ in present), default=-1)
        sizes = {"u8": 1, "bool": 1, "u16": 2, "i32": 4, "u32": 4,
                 "offset": 4, "u64": 8, "f64": 8}
        fmts = {"u8": "B", "bool": "B", "u16": "H", "i32": "i", "u32": "I",
                "u64": "Q", "f64": "d"}
        # lay out slots: soffset32 first, then fields largest-first for
        # tight packing (any order is legal; slot offsets recorded in
        # the vtable)
        order = sorted(present, key=lambda f: -sizes[f[1]])
        slot_off: dict[int, int] = {}
        pos = 4  # after the soffset32
        for fid, kind, _ in order:
            s = sizes[kind]
            pos = (pos + s - 1) // s * s
            slot_off[fid] = pos
            pos += s
        table_size = (pos + 3) // 4 * 4
        vt_len = 4 + 2 * (max_id + 1)
        # table body alignment: 8 if any 8-byte scalar present
        body_align = max([4] + [sizes[k] for _, k, _ in present])
        self._align(body_align, table_size)
        body = bytearray(table_size)
        table_end_off = self._size + table_size  # offset-from-end of table start
        for fid, kind, v in present:
            o = slot_off[fid]
            if kind == "offset":
                field_off = table_end_off - o  # offset-from-end of this slot
                struct.pack_into("<I", body, o, field_off - v)
            elif kind == "bool":
                struct.pack_into("<B", body, o, 1 if v else 0)
            else:
                struct.pack_into(f"<{fmts[kind]}", body, o, v)
        # vtable (no dedup — files stay small enough)
        vt = struct.pack("<HH", vt_len, table_size) + b"".join(
            struct.pack("<H", slot_off.get(i, 0)) for i in range(max_id + 1)
        )
        # soffset at table start = table_addr - vtable_addr; vtable sits
        # immediately before the table (lower address). The table start
        # is 4-aligned from the end (body_align >= 4) and vtables are
        # even-sized, so the vtable needs no padding of its own.
        struct.pack_into("<i", body, 0, len(vt))
        self._prepend(bytes(body))
        self._prepend(vt)
        return table_end_off

    def finish(self, root: int, size_prefixed: bool = False) -> bytes:
        # align the MESSAGE (prefix excluded): consumers copy the
        # size-prefixed payload into a fresh buffer, so internal
        # alignment is relative to the message start
        self._align(self._max_align, 4)
        root_rel = (self._size + 4) - root
        self._prepend(struct.pack("<I", root_rel))
        buf = b"".join(reversed(self._chunks))
        if size_prefixed:
            buf = struct.pack("<I", len(buf)) + buf
        return buf


class Table:
    """Reader for one table in a finished buffer."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos

    @classmethod
    def root(cls, buf: bytes) -> "Table":
        (o,) = struct.unpack_from("<I", buf, 0)
        return cls(buf, o)

    def _slot(self, field_id: int) -> int:
        (soff,) = struct.unpack_from("<i", self.buf, self.pos)
        vt = self.pos - soff
        (vt_len,) = struct.unpack_from("<H", self.buf, vt)
        idx = 4 + 2 * field_id
        if idx >= vt_len:
            return 0
        (o,) = struct.unpack_from("<H", self.buf, vt + idx)
        return o

    def scalar(self, field_id: int, fmt: str, default):
        o = self._slot(field_id)
        if o == 0:
            return default
        return struct.unpack_from(f"<{fmt}", self.buf, self.pos + o)[0]

    def _indirect(self, field_id: int) -> int | None:
        o = self._slot(field_id)
        if o == 0:
            return None
        (rel,) = struct.unpack_from("<I", self.buf, self.pos + o)
        return self.pos + o + rel

    def string(self, field_id: int) -> str | None:
        p = self._indirect(field_id)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        return self.buf[p + 4 : p + 4 + n].decode("utf-8")

    def vector(self, field_id: int, fmt: str, elem_size: int):
        p = self._indirect(field_id)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        return list(struct.unpack_from(f"<{n}{fmt}", self.buf, p + 4))

    def byte_vector(self, field_id: int) -> bytes | None:
        p = self._indirect(field_id)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        return self.buf[p + 4 : p + 4 + n]

    def table(self, field_id: int) -> "Table | None":
        p = self._indirect(field_id)
        return None if p is None else Table(self.buf, p)

    def table_vector(self, field_id: int) -> "list[Table] | None":
        p = self._indirect(field_id)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        out = []
        for i in range(n):
            ep = p + 4 + 4 * i
            (rel,) = struct.unpack_from("<I", self.buf, ep)
            out.append(Table(self.buf, ep + rel))
        return out

"""Minimal pure-Python HDF5 reader (+ fixture writer) for biom 2.1.

The reference ingests ``feature-table.biom`` by shelling out to
``biom convert`` (mmeds/summary.py:83-91, extract_feature_table.sh); the
runtime here has no HDF5 library, so this module implements — from the
public HDF5 File Format Specification v3 — exactly the subset a
biom-format 2.1 file written by h5py uses:

* superblock v0 and v2/v3, little-endian, 8-byte offsets/lengths
* groups: v1-B-tree + local-heap symbol tables AND compact link messages
* object headers v1 and v2 (incl. OCHK continuation blocks)
* datasets: compact, contiguous, and chunked (v1 chunk B-tree) layouts
  with optional shuffle + deflate filters (stdlib ``zlib``)
* datatypes: fixed-point ints, IEEE floats, fixed-size strings, and
  variable-length strings via the global heap (biom's id arrays)

Not supported (and not used by biom files): fractal-heap dense groups,
compound/array datatypes, v4 chunk indexes, big-endian files.  The
reader raises a clear error on any of these.

Everything is driver-side: biom artifacts are metadata-scale (the
feature table inside is sparse CSR), and the result is handed to Spark
as an ordinary DataFrame.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


class Hdf5FormatError(ValueError):
    pass


def _u(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off : off + n], "little")


@dataclass
class _Dtype:
    cls: int  # 0 int, 1 float, 3 string, 9 vlen
    size: int
    signed: bool = True
    vlen_str: bool = False


@dataclass
class _Dataset:
    shape: tuple[int, ...]
    dtype: _Dtype
    layout_class: int  # 0 compact, 1 contiguous, 2 chunked
    compact_data: bytes = b""
    data_addr: int = _UNDEF
    data_size: int = 0
    chunk_dims: tuple[int, ...] = ()
    btree_addr: int = _UNDEF
    filters: list[int] = field(default_factory=list)


class H5File:
    """Read-only HDF5 file over an in-memory byte string."""

    def __init__(self, data: bytes):
        self.b = data
        if not data.startswith(_SIG):
            raise Hdf5FormatError("not an HDF5 file (bad signature)")
        ver = data[8]
        if ver == 0:
            if data[13] != 8 or data[14] != 8:
                raise Hdf5FormatError("only 8-byte offsets/lengths supported")
            # root group symbol-table entry at fixed offset 24+8+8+8+8 = 56;
            # entry: link name offset(8) then object header address(8)
            self.root = _u(data, 64, 8)
        elif ver in (2, 3):
            if data[9] != 8 or data[10] != 8:
                raise Hdf5FormatError("only 8-byte offsets/lengths supported")
            self.root = _u(data, 36, 8)
        else:
            raise Hdf5FormatError(f"unsupported superblock version {ver}")

    # -- public API --------------------------------------------------------

    def dataset(self, path: str) -> list:
        """Dataset values (flat list) at ``/a/b/c``."""
        addr = self.root
        for part in [p for p in path.split("/") if p]:
            links = self._group_links(addr)
            if part not in links:
                raise KeyError(f"{part!r} not found (have {sorted(links)})")
            addr = links[part]
        ds = self._parse_dataset(addr)
        return self._read_values(ds)

    def keys(self, path: str = "/") -> list[str]:
        addr = self.root
        for part in [p for p in path.split("/") if p]:
            addr = self._group_links(addr)[part]
        return sorted(self._group_links(addr))

    # -- object headers ----------------------------------------------------

    def _messages(self, addr: int) -> list[tuple[int, bytes]]:
        b = self.b
        out: list[tuple[int, bytes]] = []
        if b[addr : addr + 4] == b"OHDR":  # version 2
            flags = b[addr + 5]
            p = addr + 6
            if flags & 0x20:
                p += 16  # times
            if flags & 0x10:
                p += 4  # max compact / min dense
            cs = 2 ** (flags & 0x3)
            chunk_size = _u(b, p, cs)
            p += cs
            self._v2_msgs(p, p + chunk_size, flags, out)
        else:  # version 1
            if b[addr] != 1:
                raise Hdf5FormatError(f"bad object header at {addr}")
            nmsg = _u(b, addr + 2, 2)
            hsize = _u(b, addr + 8, 4)
            self._v1_msgs(addr + 16, hsize, nmsg, out)
        return out

    def _v1_msgs(self, p: int, size: int, budget: int, out: list) -> None:
        b = self.b
        end = p + size
        while p + 8 <= end and len(out) < budget:
            mtype = _u(b, p, 2)
            msize = _u(b, p + 2, 2)
            body = b[p + 8 : p + 8 + msize]
            p += 8 + msize  # stored sizes are already 8-byte padded
            if mtype == 0x0010:  # continuation
                self._v1_msgs(_u(body, 0, 8), _u(body, 8, 8), budget, out)
            else:
                out.append((mtype, body))

    def _v2_msgs(self, p: int, end: int, hdr_flags: int, out: list) -> None:
        b = self.b
        while p + 4 <= end:
            mtype = b[p]
            msize = _u(b, p + 1, 2)
            p += 4
            if hdr_flags & 0x4:
                p += 2  # creation order
            body = b[p : p + msize]
            p += msize
            if mtype == 0x10:  # continuation: block starts with OCHK
                off, length = _u(body, 0, 8), _u(body, 8, 8)
                if b[off : off + 4] != b"OCHK":
                    raise Hdf5FormatError("bad OCHK continuation")
                # messages run from after the signature to before the
                # trailing 4-byte checksum
                self._v2_msgs(off + 4, off + length - 4, hdr_flags, out)
            elif msize:
                out.append((mtype, body))

    # -- groups ------------------------------------------------------------

    def _group_links(self, addr: int) -> dict[str, int]:
        links: dict[str, int] = {}
        for mtype, body in self._messages(addr):
            if mtype == 0x0011:  # symbol table: btree + local heap
                self._walk_group_btree(_u(body, 0, 8), _u(body, 8, 8), links)
            elif mtype == 0x0006:  # compact link message
                self._parse_link(body, links)
            elif mtype == 0x0002:  # link info — dense groups unsupported
                if _u(body, 2 + (8 if body[1] & 1 else 0), 8) != _UNDEF:
                    raise Hdf5FormatError("dense (fractal-heap) groups unsupported")
        return links

    def _parse_link(self, body: bytes, links: dict[str, int]) -> None:
        flags = body[1]
        p = 2
        ltype = 0
        if flags & 0x8:
            ltype = body[p]
            p += 1
        if flags & 0x4:
            p += 8  # creation order
        if flags & 0x10:
            p += 1  # charset
        lsz = 2 ** (flags & 0x3)
        nlen = _u(body, p, lsz)
        p += lsz
        name = body[p : p + nlen].decode()
        p += nlen
        if ltype == 0:  # hard link
            links[name] = _u(body, p, 8)

    def _walk_group_btree(self, bt_addr: int, heap_addr: int, links: dict) -> None:
        b = self.b
        if b[heap_addr : heap_addr + 4] != b"HEAP":
            raise Hdf5FormatError("bad local heap")
        heap_data = _u(b, heap_addr + 24, 8)

        def name_at(off: int) -> str:
            end = b.index(b"\x00", heap_data + off)
            return b[heap_data + off : end].decode()

        def walk(addr: int) -> None:
            if b[addr : addr + 4] == b"SNOD":
                n = _u(b, addr + 6, 2)
                p = addr + 8
                for _ in range(n):
                    links[name_at(_u(b, p, 8))] = _u(b, p + 8, 8)
                    p += 40
                return
            if b[addr : addr + 4] != b"TREE":
                raise Hdf5FormatError("bad group B-tree node")
            entries = _u(b, addr + 6, 2)
            p = addr + 24 + 8  # skip siblings + key0
            for _ in range(entries):
                walk(_u(b, p, 8))
                p += 16  # child + key

        walk(bt_addr)

    # -- datasets ----------------------------------------------------------

    def _parse_dataset(self, addr: int) -> _Dataset:
        shape: tuple[int, ...] = ()
        dtype: _Dtype | None = None
        ds: _Dataset | None = None
        layout = None
        filters: list[int] = []
        for mtype, body in self._messages(addr):
            if mtype == 0x0001:
                shape = self._parse_dataspace(body)
            elif mtype == 0x0003:
                dtype = self._parse_datatype(body)[0]
            elif mtype == 0x0008:
                layout = body
            elif mtype == 0x000B:
                filters = self._parse_filters(body)
        if dtype is None or layout is None:
            raise Hdf5FormatError("object is not a dataset")
        if layout[0] != 3:
            raise Hdf5FormatError(f"unsupported data layout version {layout[0]}")
        cls = layout[1]
        ds = _Dataset(shape=shape, dtype=dtype, layout_class=cls, filters=filters)
        if cls == 0:
            n = _u(layout, 2, 2)
            ds.compact_data = layout[4 : 4 + n]
        elif cls == 1:
            ds.data_addr = _u(layout, 2, 8)
            ds.data_size = _u(layout, 10, 8)
        elif cls == 2:
            rank = layout[2]  # includes the element-size dimension
            ds.btree_addr = _u(layout, 3, 8)
            dims = [_u(layout, 11 + 4 * i, 4) for i in range(rank)]
            ds.chunk_dims = tuple(dims[:-1])
        else:
            raise Hdf5FormatError(f"unsupported layout class {cls}")
        return ds

    @staticmethod
    def _parse_dataspace(body: bytes) -> tuple[int, ...]:
        ver = body[0]
        if ver == 1:
            rank = body[1]
            return tuple(_u(body, 8 + 8 * i, 8) for i in range(rank))
        if ver == 2:
            rank = body[1]
            return tuple(_u(body, 4 + 8 * i, 8) for i in range(rank))
        raise Hdf5FormatError(f"unsupported dataspace version {ver}")

    @staticmethod
    def _parse_datatype(body: bytes) -> tuple[_Dtype, int]:
        cls = body[0] & 0x0F
        bits0 = body[1]
        size = _u(body, 4, 4)
        if cls == 0:  # fixed point
            return _Dtype(0, size, signed=bool(bits0 & 0x08)), 8 + 4
        if cls == 1:  # float
            if size not in (4, 8):
                raise Hdf5FormatError(f"unsupported float size {size}")
            return _Dtype(1, size), 8 + 12
        if cls == 3:  # fixed string
            return _Dtype(3, size), 8
        if cls == 9:  # vlen
            if (bits0 & 0x0F) != 1:
                raise Hdf5FormatError("only vlen strings supported")
            return _Dtype(9, size, vlen_str=True), 8
        raise Hdf5FormatError(f"unsupported datatype class {cls}")

    @staticmethod
    def _parse_filters(body: bytes) -> list[int]:
        ver = body[0]
        n = body[1]
        ids: list[int] = []
        p = 8 if ver == 1 else 2
        for _ in range(n):
            fid = _u(body, p, 2)
            if ver == 1 or fid >= 256:
                nlen = _u(body, p + 2, 2)
                ncv = _u(body, p + 6, 2)
                p += 8 + nlen
                if ver == 1 and nlen % 8:
                    p += (-nlen) % 8  # name padded to 8 in v1
            else:  # v2, built-in filter: no name-length field, no name
                ncv = _u(body, p + 4, 2)
                p += 6
            p += 4 * ncv
            if ver == 1 and ncv % 2:
                p += 4
            ids.append(fid)
        return ids

    # -- raw → python values ----------------------------------------------

    def _raw_bytes(self, ds: _Dataset) -> bytes:
        b = self.b
        n = 1
        for d in ds.shape:
            n *= d
        total = n * ds.dtype.size
        if ds.layout_class == 0:
            return ds.compact_data
        if ds.layout_class == 1:
            if ds.data_addr == _UNDEF:
                return b"\x00" * total
            return b[ds.data_addr : ds.data_addr + ds.data_size]
        # chunked: walk the v1 chunk B-tree (node type 1)
        out = bytearray(total)
        esize = ds.dtype.size
        rank = len(ds.chunk_dims)
        key_size = 8 + (rank + 1) * 8

        def walk(addr: int) -> None:
            if b[addr : addr + 4] != b"TREE":
                raise Hdf5FormatError("bad chunk B-tree node")
            level = b[addr + 5]
            entries = _u(b, addr + 6, 2)
            p = addr + 24
            for i in range(entries):
                kp = p + i * (key_size + 8)
                child = _u(b, kp + key_size, 8)
                if level > 0:
                    walk(child)
                    continue
                chunk_nbytes = _u(b, kp, 4)
                offs = [_u(b, kp + 8 + 8 * d, 8) for d in range(rank)]
                raw = b[child : child + chunk_nbytes]
                for fid in reversed(ds.filters):
                    if fid == 1:
                        raw = zlib.decompress(raw)
                    elif fid == 2:
                        raw = _unshuffle(raw, esize)
                    else:
                        raise Hdf5FormatError(f"unsupported filter id {fid}")
                _scatter_chunk(out, raw, ds.shape, ds.chunk_dims, offs, esize)

        if ds.btree_addr != _UNDEF:
            walk(ds.btree_addr)
        return bytes(out)

    def _read_values(self, ds: _Dataset) -> list:
        raw = self._raw_bytes(ds)
        t = ds.dtype
        n = 1
        for d in ds.shape:
            n *= d
        if t.cls == 0:
            fmt = {1: "b", 2: "h", 4: "i", 8: "q"}[t.size]
            if not t.signed:
                fmt = fmt.upper()
            return list(struct.unpack(f"<{n}{fmt}", raw[: n * t.size]))
        if t.cls == 1:
            fmt = "f" if t.size == 4 else "d"
            return list(struct.unpack(f"<{n}{fmt}", raw[: n * t.size]))
        if t.cls == 3:
            return [
                raw[i * t.size : (i + 1) * t.size].split(b"\x00")[0].decode()
                for i in range(n)
            ]
        if t.cls == 9:
            out = []
            for i in range(n):
                p = i * t.size
                length = _u(raw, p, 4)
                gcol = _u(raw, p + 4, 8)
                idx = _u(raw, p + 12, 4)
                out.append(self._global_heap_object(gcol, idx)[:length].decode())
            return out
        raise Hdf5FormatError(f"unsupported datatype class {t.cls}")

    def _global_heap_object(self, addr: int, index: int) -> bytes:
        b = self.b
        if b[addr : addr + 4] != b"GCOL":
            raise Hdf5FormatError("bad global heap collection")
        end = addr + _u(b, addr + 8, 8)
        p = addr + 16
        while p + 16 <= end:
            idx = _u(b, p, 2)
            size = _u(b, p + 8, 8)
            if idx == 0:
                break
            if idx == index:
                return b[p + 16 : p + 16 + size]
            p += 16 + size + ((-size) % 8)
        raise Hdf5FormatError(f"global heap object {index} not found")


def _unshuffle(raw: bytes, esize: int) -> bytes:
    if esize <= 1:
        return raw
    n = len(raw) // esize
    out = bytearray(len(raw))
    for j in range(esize):
        out[j::esize] = raw[j * n : (j + 1) * n]
    return bytes(out)


def _scatter_chunk(
    out: bytearray,
    raw: bytes,
    shape: tuple[int, ...],
    cdims: tuple[int, ...],
    offs: list[int],
    esize: int,
) -> None:
    """Copy one (possibly edge-clipped) chunk into the row-major output."""
    if len(shape) == 1:
        start = offs[0]
        count = min(cdims[0], shape[0] - start)
        out[start * esize : (start + count) * esize] = raw[: count * esize]
        return
    if len(shape) == 2:
        rows = min(cdims[0], shape[0] - offs[0])
        cols = min(cdims[1], shape[1] - offs[1])
        for r in range(rows):
            src = (r * cdims[1]) * esize
            dst = ((offs[0] + r) * shape[1] + offs[1]) * esize
            out[dst : dst + cols * esize] = raw[src : src + cols * esize]
        return
    raise Hdf5FormatError("only rank-1/2 chunked datasets supported")


# ---------------------------------------------------------------------------
# minimal writer — test fixtures only (superblock v0, symbol-table groups,
# contiguous datasets, fixed-size strings / int64 / float64)
# ---------------------------------------------------------------------------


class H5Writer:
    """Just enough HDF5 writing to build biom-2.1-shaped fixtures: nested
    groups + 1-D contiguous datasets.  Strings become fixed-size ASCII."""

    def __init__(self):
        self.buf = bytearray(b"\x00" * 96)  # superblock v0 placeholder
        self.tree: dict = {}  # nested {name: dict | (dtype, values)}

    def add(self, path: str, values: list) -> None:
        parts = [p for p in path.split("/") if p]
        d = self.tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = list(values)

    # -- low-level emit helpers -------------------------------------------

    def _alloc(self, data: bytes, align: int = 8) -> int:
        pad = (-len(self.buf)) % align
        self.buf += b"\x00" * pad
        addr = len(self.buf)
        self.buf += data
        return addr

    def _emit_dataset(self, values: list) -> int:
        if values and isinstance(values[0], str):
            size = max(1, max((len(v.encode()) for v in values), default=1))
            raw = b"".join(v.encode().ljust(size, b"\x00") for v in values)
            dt_body = bytes([0x13, 0x00, 0x00, 0x00]) + struct.pack("<I", size)
        elif all(isinstance(v, int) for v in values):
            size = 8
            raw = struct.pack(f"<{len(values)}q", *values)
            dt_body = bytes([0x10, 0x08, 0x00, 0x00]) + struct.pack("<I", 8)
            dt_body += struct.pack("<HH", 0, 64)
        else:
            size = 8
            raw = struct.pack(f"<{len(values)}d", *[float(v) for v in values])
            dt_body = bytes([0x11, 0x20, 0x3F, 0x00]) + struct.pack("<I", 8)
            dt_body += struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        data_addr = self._alloc(raw) if raw else _UNDEF
        sp_body = bytes([1, 1, 0, 0, 0, 0, 0, 0]) + struct.pack("<Q", len(values))
        lay_body = bytes([3, 1]) + struct.pack("<QQ", data_addr, len(raw))
        msgs = [(0x0001, sp_body), (0x0003, dt_body), (0x0008, lay_body)]
        return self._emit_v1_header(msgs)

    def _emit_v1_header(self, msgs: list[tuple[int, bytes]]) -> int:
        body = b""
        for mtype, mb in msgs:
            mb = mb + b"\x00" * ((-len(mb)) % 8)
            body += struct.pack("<HHBxxx", mtype, len(mb), 0) + mb
        hdr = struct.pack("<BxHII", 1, len(msgs), 1, len(body)) + b"\x00" * 4 + body
        return self._alloc(hdr)

    def _emit_group(self, entries: dict) -> int:
        # resolve children depth-first
        resolved: dict[str, int] = {}
        for name, v in sorted(entries.items()):
            resolved[name] = (
                self._emit_group(v) if isinstance(v, dict) else self._emit_dataset(v)
            )
        # local heap: empty string at 0, then each name
        heap = bytearray(b"\x00" * 8)
        offsets: dict[str, int] = {}
        for name in sorted(resolved):
            offsets[name] = len(heap)
            heap += name.encode() + b"\x00"
            heap += b"\x00" * ((-len(heap)) % 8)
        heap_data_addr = self._alloc(bytes(heap))
        heap_hdr = (
            b"HEAP"
            + bytes([0, 0, 0, 0])
            + struct.pack("<QQQ", len(heap), len(heap), heap_data_addr)
        )
        heap_addr = self._alloc(heap_hdr)
        # SNOD with all entries (sorted)
        snod = b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(resolved))
        for name in sorted(resolved):
            snod += struct.pack("<QQI", offsets[name], resolved[name], 0)
            snod += b"\x00" * 20
        snod_addr = self._alloc(snod)
        # single-leaf group B-tree
        bt = (
            b"TREE"
            + bytes([0, 0])
            + struct.pack("<H", 1)
            + struct.pack("<QQ", _UNDEF, _UNDEF)
            + struct.pack("<Q", 0)  # key0: empty string
            + struct.pack("<Q", snod_addr)
            + struct.pack("<Q", offsets[max(resolved)] if resolved else 0)
        )
        bt_addr = self._alloc(bt)
        st_body = struct.pack("<QQ", bt_addr, heap_addr)
        return self._emit_v1_header([(0x0011, st_body)])

    def tobytes(self) -> bytes:
        root = self._emit_group(self.tree)
        sb = bytearray(_SIG)
        sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])
        sb += struct.pack("<HHI", 4, 16, 0)
        sb += struct.pack("<QQQQ", 0, _UNDEF, len(self.buf), _UNDEF)
        # root symbol-table entry
        sb += struct.pack("<QQI", 0, root, 0) + b"\x00" * 20
        self.buf[: len(sb)] = sb
        return bytes(self.buf)

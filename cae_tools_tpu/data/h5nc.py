"""netCDF4 (HDF5) reader/writer for the classic data model.

The reference reads production EOCIS data as "netcdf4 file(s)"
(reference ``cli/train_cae.py:20-23``, opened at ``:58-59`` through
xarray/netcdf4-python) — but this image ships neither netcdf4 nor h5py,
so ``xrlite`` could only *refuse* HDF5 inputs with an actionable error.
This module implements the envelope directly from the HDF5 File Format
Specification (v1.0/2.0) and the netCDF-4 format conventions, in the
style of ``data/nc3.py`` (offset-addressable parsing, ``os.pread`` row
gathers, no third-party dependency beyond numpy + zlib):

Reader (``H5File`` / :func:`read_h5_dataset`):

* superblock versions 0/1 (symbol-table root group) and 2/3 (root object
  header address), signature searched at 0, 512, 1024, ... (user blocks)
* version 1 object headers (with continuation blocks) and version 2
  ("OHDR"/"OCHK") headers
* messages: dataspace (v1/v2), datatype (fixed-point, IEEE float,
  string, reference, vlen), fill value, data layout v3 (compact,
  contiguous, chunked), filter pipeline (v1/v2: deflate via zlib,
  shuffle, fletcher32 checksum strip), attributes (v1/v2/v3), symbol
  table, link info, link messages, object header continuation
* group traversal: v1 B-tree + SNOD + local heap, and v2 compact link
  messages (dense fractal-heap link storage raises an actionable error —
  netCDF4 writes compact groups at classic-model arity)
* chunk v1 B-trees with per-chunk deflate/shuffle, decompressing only
  the chunks a row gather intersects (LRU chunk cache for scans)
* netCDF-4 dimension resolution: ``DIMENSION_LIST`` vlen-of-object-
  reference attributes dereferenced through the global heap ("GCOL") to
  the dimension-scale datasets (``CLASS="DIMENSION_SCALE"``); pure
  dimensions (NAME = "This is a netCDF dimension but not a netCDF
  variable...") are excluded from data variables, phony names are
  synthesized when a file carries no dimension lists

Writer (:func:`write_h5_dataset`): a minimal netCDF4-classic-model
producer (superblock v0, v1 object headers, one flat root group,
contiguous or chunked+deflate layouts, dimension scales +
``DIMENSION_LIST`` references) — enough to round-trip every dataset this
framework trains on and to build test fixtures in this image (no
netcdf4/h5py to generate them with).  Files written here are also read
back by the same spec-level structures libhdf5 emits, so the reader is
exercised against the format, not a private dialect.

Anything outside the envelope (compound datatypes beyond the skipped
``REFERENCE_LIST``, szip/scaleoffset filters, layout v4, dense groups)
raises ``ValueError`` naming the feature — same actionable-error policy
as ``xrlite._check_signature``.
"""

from __future__ import annotations

import os
import struct
import zlib
from collections import OrderedDict

import numpy as np

HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


def _sig_offset(read8, fsize):
    """Offset of the HDF5 signature (0 or, with a user block,
    512/1024/2048/...), or None.  ``read8(off) -> 8 bytes``.  The ONE
    implementation of the signature walk — detection (:func:`is_hdf5`)
    and parsing (``H5File._find_superblock``) must never diverge."""
    off = 0
    while off < fsize:
        if read8(off) == HDF5_MAGIC:
            return off
        off = 512 if off == 0 else off * 2
    return None


def is_hdf5(path) -> bool:
    """True if ``path`` is an HDF5 file — signature at offset 0 or, for
    files with a user block, at 512/1024/2048/... (the same search
    ``H5File._find_superblock`` performs).  Detection helpers must use
    this rather than reading 8 bytes at offset 0, or user-block files
    get misrouted to the netCDF3 reader."""
    try:
        size = os.path.getsize(path)
        with open(path, "rb") as fh:
            def read8(off):
                fh.seek(off)
                return fh.read(8)

            return _sig_offset(read8, size) is not None
    except OSError:
        return False

# message type ids
_MSG_NIL = 0x0000
_MSG_DATASPACE = 0x0001
_MSG_LINK_INFO = 0x0002
_MSG_DATATYPE = 0x0003
_MSG_FILL_OLD = 0x0004
_MSG_FILL = 0x0005
_MSG_LINK = 0x0006
_MSG_LAYOUT = 0x0008
_MSG_GROUP_INFO = 0x000A
_MSG_FILTER = 0x000B
_MSG_ATTR = 0x000C
_MSG_CONT = 0x0010
_MSG_SYMTAB = 0x0011

# datatype classes
_DT_FIXED = 0
_DT_FLOAT = 1
_DT_STRING = 3
_DT_REFERENCE = 7
_DT_VLEN = 9

_NC_DIM_NAME_PREFIX = "This is a netCDF dimension but not a netCDF variable"


class H5Error(ValueError):
    pass


def _unsupported(path, what):
    return H5Error(
        f"{path}: unsupported HDF5 feature for the built-in netCDF4 "
        f"reader: {what}. This build reads the netCDF4 classic-model "
        "envelope (contiguous/chunked layouts, gzip+shuffle filters, "
        "compact groups); install xarray+netcdf4 for full coverage — "
        "cae_tools_tpu.xrcompat prefers them automatically."
    )


# ==========================================================================
# low-level readers
# ==========================================================================

class _Buf:
    """Cursor over bytes with little-endian scalar reads (HDF5 metadata
    is little-endian regardless of platform)."""

    __slots__ = ("b", "o")

    def __init__(self, b, o=0):
        self.b = b
        self.o = o

    def u1(self):
        v = self.b[self.o]
        self.o += 1
        return v

    def u2(self):
        v = struct.unpack_from("<H", self.b, self.o)[0]
        self.o += 2
        return v

    def u4(self):
        v = struct.unpack_from("<I", self.b, self.o)[0]
        self.o += 4
        return v

    def u8(self):
        v = struct.unpack_from("<Q", self.b, self.o)[0]
        self.o += 8
        return v

    def take(self, n):
        v = self.b[self.o:self.o + n]
        self.o += n
        return v

    def skip(self, n):
        self.o += n


class _Datatype:
    """Decoded datatype message: enough for the classic-model envelope."""

    __slots__ = ("cls", "size", "np_dtype", "vlen_base", "ref", "vlen_str")

    def __init__(self, cls, size, np_dtype=None, vlen_base=None, ref=False,
                 vlen_str=False):
        self.cls = cls
        self.size = size
        self.np_dtype = np_dtype
        self.vlen_base = vlen_base
        self.ref = ref
        self.vlen_str = vlen_str


def _parse_datatype(buf: _Buf, path="?") -> _Datatype:
    cls_ver = buf.u1()
    cls = cls_ver & 0x0F
    bits0, bits1, bits2 = buf.u1(), buf.u1(), buf.u1()
    size = buf.u4()
    big = bool(bits0 & 0x01)
    order = ">" if big else "<"
    if cls == _DT_FIXED:
        buf.skip(4)  # bit offset u2 + precision u2
        signed = bool(bits0 & 0x08)
        kind = "i" if signed else "u"
        return _Datatype(cls, size, np.dtype(f"{order}{kind}{size}"))
    if cls == _DT_FLOAT:
        buf.skip(12)  # bitoffset/precision/exp/man layout + bias
        return _Datatype(cls, size, np.dtype(f"{order}f{size}"))
    if cls == _DT_STRING:
        return _Datatype(cls, size, np.dtype(f"S{size}"))
    if cls == _DT_REFERENCE:
        return _Datatype(cls, size, ref=True)
    if cls == _DT_VLEN:
        # bits0 & 0x0F: 0 = vlen sequence, 1 = vlen string
        base = _parse_datatype(buf, path)
        return _Datatype(cls, size, vlen_base=base,
                         vlen_str=(bits0 & 0x0F) == 1)
    # compound (6) covers netCDF4's REFERENCE_LIST back-pointers on
    # dimension scales — callers skip attributes they cannot decode
    return _Datatype(cls, size)


class _Dataspace:
    __slots__ = ("shape",)

    def __init__(self, shape):
        self.shape = shape


def _parse_dataspace(buf: _Buf, path="?") -> _Dataspace:
    ver = buf.u1()
    rank = buf.u1()
    flags = buf.u1()
    if ver == 1:
        buf.skip(5)  # reserved
    elif ver == 2:
        buf.u1()  # type (scalar/simple/null)
    else:
        raise _unsupported(path, f"dataspace message version {ver}")
    shape = tuple(buf.u8() for _ in range(rank))
    if flags & 0x1:
        buf.skip(8 * rank)  # max dims
    if ver == 1 and flags & 0x2:
        buf.skip(8 * rank)  # permutation indices (never used in practice)
    return _Dataspace(shape)


class _Layout:
    __slots__ = ("cls", "addr", "size", "chunk", "btree", "compact",
                 "index", "filtered_single")

    def __init__(self):
        self.cls = None       # "compact" | "contiguous" | "chunked"
        self.addr = None
        self.size = None
        self.chunk = None     # chunk dims (without the trailing elem size)
        self.btree = None     # v1 B-tree address (v3 chunked)
        self.compact = None
        self.index = "btree1"  # chunk index: btree1|single|implicit|fixed
        self.filtered_single = None  # (size, mask) for filtered single chunk


def _parse_layout(buf: _Buf, path="?") -> _Layout:
    ver = buf.u1()
    lay = _Layout()
    if ver == 3:
        cls = buf.u1()
        if cls == 0:
            lay.cls = "compact"
            n = buf.u2()
            lay.compact = bytes(buf.take(n))
        elif cls == 1:
            lay.cls = "contiguous"
            lay.addr = buf.u8()
            lay.size = buf.u8()
        elif cls == 2:
            lay.cls = "chunked"
            nd = buf.u1()  # dimensionality + 1
            lay.btree = buf.u8()
            dims = [buf.u4() for _ in range(nd)]
            lay.chunk = tuple(dims[:-1])  # last entry = element size
        else:
            raise _unsupported(path, f"layout class {cls}")
        return lay
    if ver in (1, 2):
        nd = buf.u1()
        cls = buf.u1()
        buf.skip(5)
        if cls == 1:
            lay.cls = "contiguous"
            lay.addr = buf.u8()
            dims = [buf.u4() for _ in range(nd)]
            lay.size = int(np.prod(dims)) if dims else 0
        elif cls == 2:
            lay.cls = "chunked"
            lay.btree = buf.u8()
            dims = [buf.u4() for _ in range(nd)]
            lay.chunk = tuple(dims[:-1])
        elif cls == 0:
            lay.cls = "compact"
            dims = [buf.u4() for _ in range(nd)]
            n = buf.u4()
            lay.compact = bytes(buf.take(n))
        else:
            raise _unsupported(path, f"layout class {cls}")
        return lay
    if ver == 4:
        cls = buf.u1()
        if cls == 0:
            lay.cls = "compact"
            n = buf.u2()
            lay.compact = bytes(buf.take(n))
            return lay
        if cls == 1:
            lay.cls = "contiguous"
            lay.addr = buf.u8()
            lay.size = buf.u8()
            return lay
        if cls != 2:
            raise _unsupported(path, f"layout v4 class {cls}")
        lay.cls = "chunked"
        flags = buf.u1()
        nd = buf.u1()  # dataset rank + 1, like v3 (last entry = elem size)
        enc = buf.u1()  # bytes per encoded chunk-dim size
        rd = {1: buf.u1, 2: buf.u2, 4: buf.u4, 8: buf.u8}[enc]
        lay.chunk = tuple(rd() for _ in range(nd))[:-1]
        itype = buf.u1()
        if itype == 1:  # single chunk
            lay.index = "single"
            if flags & 0x02:  # filtered
                size = buf.u8()
                mask = buf.u4()
                lay.filtered_single = (size, mask)
            lay.addr = buf.u8()
        elif itype == 2:  # implicit (unfiltered, contiguous chunk grid)
            lay.index = "implicit"
            lay.addr = buf.u8()
        elif itype == 3:  # fixed array
            lay.index = "fixed"
            buf.u1()  # page bits
            lay.addr = buf.u8()
        else:
            raise _unsupported(
                path,
                f"layout v4 chunk index type {itype} "
                "(extensible array / v2 B-tree: unlimited-dimension "
                "latest-format files)",
            )
        return lay
    raise _unsupported(path, f"data layout message version {ver}")


def _parse_filters(buf: _Buf, path="?"):
    ver = buf.u1()
    n = buf.u1()
    filters = []
    if ver == 1:
        buf.skip(6)
    elif ver != 2:
        raise _unsupported(path, f"filter pipeline version {ver}")
    for _ in range(n):
        fid = buf.u2()
        if ver == 1 or fid >= 256:
            namelen = buf.u2()
        else:
            namelen = 0
        buf.u2()  # flags
        nvals = buf.u2()
        if namelen:
            pad = namelen if ver == 2 else (namelen + 7) // 8 * 8
            buf.skip(pad)
        vals = [buf.u4() for _ in range(nvals)]
        if ver == 1 and nvals % 2:
            buf.skip(4)
        filters.append((fid, vals))
    return filters


def _parse_fill(buf: _Buf) -> bytes | None:
    ver = buf.u1()
    if ver in (1, 2):
        buf.skip(2)  # space alloc time, fill write time
        defined = buf.u1()
        if ver == 2 and not defined:
            return None
        size = buf.u4()
        return bytes(buf.take(size)) if size else None
    if ver == 3:
        flags = buf.u1()
        if flags & 0x20:
            size = buf.u4()
            return bytes(buf.take(size)) if size else None
        return None
    return None


class _Attr:
    __slots__ = ("name", "dt", "ds", "data")

    def __init__(self, name, dt, ds, data):
        self.name = name
        self.dt = dt
        self.ds = ds
        self.data = data


def _parse_attr(raw: bytes, path="?") -> _Attr:
    buf = _Buf(raw)
    ver = buf.u1()
    if ver == 1:
        buf.u1()  # reserved
        name_size = buf.u2()
        dt_size = buf.u2()
        ds_size = buf.u2()
        pad = 8
    elif ver in (2, 3):
        flags = buf.u1()
        name_size = buf.u2()
        dt_size = buf.u2()
        ds_size = buf.u2()
        if ver == 3:
            buf.u1()  # name charset
        if flags & 0x03:
            raise _unsupported(path, "shared attribute datatype/dataspace")
        pad = 1
    else:
        raise _unsupported(path, f"attribute message version {ver}")

    def padded(n):
        return (n + pad - 1) // pad * pad

    name = bytes(buf.take(name_size)).split(b"\x00")[0].decode(
        "utf-8", "replace"
    )
    buf.skip(padded(name_size) - name_size)
    dt = _parse_datatype(_Buf(raw, buf.o), path)
    buf.skip(padded(dt_size))
    ds = _parse_dataspace(_Buf(raw, buf.o), path)
    buf.skip(padded(ds_size))
    return _Attr(name, dt, ds, raw[buf.o:])


# ==========================================================================
# file reader
# ==========================================================================

class _Object:
    """Messages of one object header, decoded lazily by kind."""

    __slots__ = ("msgs",)

    def __init__(self, msgs):
        self.msgs = msgs  # list of (type, bytes)

    def first(self, mtype):
        for t, body in self.msgs:
            if t == mtype:
                return body
        return None

    def all(self, mtype):
        return [body for t, body in self.msgs if t == mtype]


class H5File:
    """Header-parsed HDF5 (netCDF4 classic model) file with row access.

    Same surface as :class:`~.nc3.NC3File`: ``variables`` (name ->
    ``VarInfo``-alike with ``shape``/``dims``/``dtype``/``row_shape``/
    ``row_nbytes``), ``n_rows(var)``, ``read_rows(var, rows)``,
    ``close()`` — drop-in for :class:`~.diskstream.DiskStreamDataset`.
    """

    #: decompressed chunks kept per variable during row gathers
    _CHUNK_CACHE = 8

    def __init__(self, path):
        self.path = str(path)
        self._fd = os.open(self.path, os.O_RDONLY)
        self._fsize = os.fstat(self._fd).st_size
        try:
            self._load()
        except Exception:
            os.close(self._fd)
            self._fd = None
            raise

    # -- low-level file access ----------------------------------------------
    # every HDF5 file address is relative to the superblock's base address
    # (non-zero only with a user block); _read applies it uniformly
    def _read(self, off, n) -> bytes:
        data = os.pread(self._fd, n, self._base + off)
        if len(data) != n:
            raise H5Error(f"{self.path}: short read at offset {off}")
        return data

    # -- superblock ---------------------------------------------------------
    def _find_superblock(self):
        off = _sig_offset(
            lambda o: os.pread(self._fd, 8, o), self._fsize
        )
        if off is None:
            raise H5Error(f"{self.path}: HDF5 signature not found")
        return off

    def _load(self):
        self._base = self._find_superblock()
        head = self._read(8, 64)
        buf = _Buf(head)
        ver = buf.u1()
        if ver == 1:
            # v1's 4-byte indexed-storage-k field pushes the root STE
            # header address to bytes 60-68 after the signature — the
            # 64-byte v0 read is short for it, so re-read wider
            buf = _Buf(self._read(8, 72))
            buf.u1()
        if ver in (0, 1):
            buf.skip(1 + 1 + 1 + 1)  # freespace/root/reserved/shared vers
            so, sl = buf.u1(), buf.u1()
            buf.skip(1 + 2 + 2 + 4)  # reserved, leaf k, internal k, flags
            if ver == 1:
                buf.skip(4)  # indexed storage k + reserved
            if (so, sl) != (8, 8):
                raise _unsupported(self.path, f"offset/length sizes {so}/{sl}")
            buf.skip(8 * 4)  # base, freespace, eof, driver
            buf.skip(8)  # root STE: link name offset
            root_header = buf.u8()
        elif ver in (2, 3):
            so, sl = buf.u1(), buf.u1()
            if (so, sl) != (8, 8):
                raise _unsupported(self.path, f"offset/length sizes {so}/{sl}")
            buf.u1()  # consistency flags
            buf.skip(8 * 2)  # base, superblock extension
            buf.skip(8)  # eof
            root_header = buf.u8()
        else:
            raise _unsupported(self.path, f"superblock version {ver}")

        root = self._object_header(root_header)
        links = self._group_links(root)

        # global (root-group) attributes — the netCDF "global attrs"
        # surface the netCDF3 route exposes as NC3File._attributes
        self._attributes = {}
        for body in root.all(_MSG_ATTR):
            # an undecodable/exotic global attribute must never make the
            # FILE unreadable — skip it (same policy as variable attrs);
            # catch Exception, not just H5Error: truncated payloads raise
            # struct.error/ValueError from _Buf/np.frombuffer
            try:
                a = _parse_attr(body, self.path)
                val = self._attr_value(a)
            except Exception:
                continue
            # hide netCDF4 implementation attrs, as the xarray/netcdf4
            # route does (_Netcdf4Dimid/_Netcdf4Coordinates on variables,
            # libnetcdf's _NCProperties provenance string on the root)
            if val is not None and not a.name.startswith(
                ("_Netcdf", "_NCProperties")
            ):
                self._attributes[a.name] = val

        self.variables: dict[str, "H5Var"] = {}
        #: name -> H5Error for datasets outside the supported envelope
        #: (string/reference/compound types, exotic filters...).  The
        #: error is DEFERRED to access: a production file carrying an
        #: ancillary 'crs' or label variable alongside numeric training
        #: data must not be unreadable as a whole.
        self.unsupported: dict[str, H5Error] = {}
        objects = {}
        for name, addr in links.items():
            objects[name] = (addr, self._object_header(addr))
        # address -> name map for dereferencing DIMENSION_LIST
        self._addr_names = {addr: n for n, (addr, _) in objects.items()}
        for name, (addr, obj) in objects.items():
            if obj.first(_MSG_DATASPACE) is None:
                continue  # sub-group: classic model keeps data at root
            try:
                self.variables[name] = H5Var(self, name, addr, obj)
            except H5Error as e:
                self.unsupported[name] = e

        # netCDF-4 dimension resolution
        self._resolve_dims()

    # -- object headers ------------------------------------------------------
    def _object_header(self, addr) -> _Object:
        first = self._read(addr, 16)
        if first[:4] == b"OHDR":
            return self._object_header_v2(addr)
        return self._object_header_v1(addr)

    def _object_header_v1(self, addr) -> _Object:
        buf = _Buf(self._read(addr, 16))
        ver = buf.u1()
        if ver != 1:
            raise _unsupported(self.path, f"object header version {ver}")
        buf.u1()
        nmsgs = buf.u2()
        buf.u4()  # ref count
        hsize = buf.u4()
        msgs = []
        # message blocks: (offset, length) queue; continuations append
        blocks = [(addr + 16, hsize)]
        while blocks and len(msgs) < nmsgs:
            boff, blen = blocks.pop(0)
            raw = self._read(boff, blen)
            b = _Buf(raw)
            while b.o + 8 <= blen and len(msgs) < nmsgs:
                mtype = b.u2()
                msize = b.u2()
                b.skip(4)  # flags + reserved
                body = bytes(b.take(msize))
                if mtype == _MSG_CONT:
                    c = _Buf(body)
                    blocks.append((c.u8(), c.u8()))
                elif mtype != _MSG_NIL:
                    msgs.append((mtype, body))
        return _Object(msgs)

    def _object_header_v2(self, addr) -> _Object:
        head = self._read(addr, 64)
        buf = _Buf(head)
        if bytes(buf.take(4)) != b"OHDR":
            raise H5Error(f"{self.path}: bad OHDR signature at {addr}")
        ver = buf.u1()
        if ver != 2:
            raise _unsupported(self.path, f"object header v2 version {ver}")
        flags = buf.u1()
        if flags & 0x20:
            buf.skip(16)  # times
        if flags & 0x10:
            buf.skip(4)  # max compact / min dense attrs
        size_bytes = 1 << (flags & 0x03)
        size0 = {1: buf.u1, 2: buf.u2, 4: buf.u4, 8: buf.u8}[size_bytes]()
        track_order = bool(flags & 0x04)
        msgs = []
        blocks = [(addr + buf.o, size0, False)]
        while blocks:
            boff, blen, is_chk = blocks.pop(0)
            raw = self._read(boff, blen)
            b = _Buf(raw)
            if is_chk:
                if bytes(b.take(4)) != b"OCHK":
                    raise H5Error(f"{self.path}: bad OCHK at {boff}")
            end = blen - 4  # gap/checksum tail
            while b.o + 4 <= end:
                mtype = b.u1()
                msize = b.u2()
                b.u1()  # flags
                if track_order:
                    b.skip(2)
                if b.o + msize > blen:
                    break
                body = bytes(b.take(msize))
                if mtype == _MSG_CONT:
                    c = _Buf(body)
                    blocks.append((c.u8(), c.u8(), True))
                elif mtype != _MSG_NIL:
                    msgs.append((mtype, body))
        return _Object(msgs)

    # -- group traversal -----------------------------------------------------
    def _group_links(self, obj: _Object) -> dict:
        links = {}
        st = obj.first(_MSG_SYMTAB)
        if st is not None:
            b = _Buf(st)
            btree, heap = b.u8(), b.u8()
            self._walk_group_btree(btree, heap, links)
            return links
        for body in obj.all(_MSG_LINK):
            b = _Buf(body)
            ver = b.u1()
            flags = b.u1()
            ltype = b.u1() if flags & 0x08 else 0
            if flags & 0x04:
                b.skip(8)  # creation order
            if flags & 0x10:
                b.skip(1)  # charset
            nbytes = 1 << (flags & 0x03)
            nlen = {1: b.u1, 2: b.u2, 4: b.u4, 8: b.u8}[nbytes]()
            name = bytes(b.take(nlen)).decode("utf-8", "replace")
            if ltype == 0:  # hard link
                links[name] = b.u8()
        li = obj.first(_MSG_LINK_INFO)
        if not links and li is not None:
            b = _Buf(li)
            b.u1()
            flags = b.u1()
            if flags & 0x01:
                b.skip(8)
            fheap = b.u8()
            if fheap != _UNDEF:
                raise _unsupported(self.path, "dense (fractal-heap) groups")
        return links

    def _local_heap(self, addr):
        raw = self._read(addr, 32)
        b = _Buf(raw)
        if bytes(b.take(4)) != b"HEAP":
            raise H5Error(f"{self.path}: bad local heap at {addr}")
        b.skip(4)  # version + reserved
        seg_size = b.u8()
        b.u8()  # free list head
        seg_addr = b.u8()
        return self._read(seg_addr, seg_size)

    def _walk_group_btree(self, btree_addr, heap_addr, links):
        heap = self._local_heap(heap_addr)

        def heap_name(off):
            end = heap.index(b"\x00", off)
            return heap[off:end].decode("utf-8", "replace")

        def walk(addr):
            head = self._read(addr, 24)
            b = _Buf(head)
            if bytes(b.take(4)) != b"TREE":
                raise H5Error(f"{self.path}: bad group B-tree at {addr}")
            ntype, level = b.u1(), b.u1()
            nent = b.u2()
            if ntype != 0:
                raise H5Error(f"{self.path}: B-tree type {ntype} in group")
            body = self._read(addr + 24, 8 + nent * 16)
            bb = _Buf(body)
            bb.u8()  # key 0
            for _ in range(nent):
                child = bb.u8()
                bb.u8()  # next key
                if level > 0:
                    walk(child)
                else:
                    self._read_snod(child, heap_name, links)

        walk(btree_addr)

    def _read_snod(self, addr, heap_name, links):
        head = self._read(addr, 8)
        b = _Buf(head)
        if bytes(b.take(4)) != b"SNOD":
            raise H5Error(f"{self.path}: bad SNOD at {addr}")
        b.skip(2)
        nsyms = b.u2()
        raw = self._read(addr + 8, nsyms * 40)
        bb = _Buf(raw)
        for _ in range(nsyms):
            name_off = bb.u8()
            header = bb.u8()
            bb.skip(24)  # cache type + reserved + scratch
            links[heap_name(name_off)] = header

    # -- global heap (vlen attribute payloads) -------------------------------
    def _gheap_object(self, addr, index) -> bytes:
        head = self._read(addr, 16)
        b = _Buf(head)
        if bytes(b.take(4)) != b"GCOL":
            raise H5Error(f"{self.path}: bad global heap at {addr}")
        b.skip(4)
        size = b.u8()
        raw = self._read(addr, size)
        bb = _Buf(raw, 16)
        while bb.o + 16 <= size:
            idx = bb.u2()
            bb.u2()  # ref count
            bb.u4()  # reserved
            osize = bb.u8()
            if idx == 0:
                break
            data = bytes(raw[bb.o:bb.o + osize])
            bb.skip((osize + 7) // 8 * 8)
            if idx == index:
                return data
        raise H5Error(f"{self.path}: global heap object {index} not found")

    # -- netCDF-4 dimension names -------------------------------------------
    def _attr_value(self, attr: _Attr):
        """Decode an attribute's payload (numeric / string / vlen-of-ref);
        returns None for unsupported classes (e.g. REFERENCE_LIST)."""
        dt, ds = attr.dt, attr.ds
        count = int(np.prod(ds.shape)) if ds.shape else 1
        if dt.np_dtype is not None and dt.cls in (_DT_FIXED, _DT_FLOAT):
            arr = np.frombuffer(attr.data, dt.np_dtype, count=count)
            arr = arr.astype(arr.dtype.newbyteorder("="))
            return arr.reshape(ds.shape) if ds.shape else arr[0]
        if dt.cls == _DT_STRING:
            raw = attr.data[:dt.size * count]
            vals = [
                raw[i * dt.size:(i + 1) * dt.size].split(b"\x00")[0].decode(
                    "utf-8", "replace"
                )
                for i in range(count)
            ]
            return vals[0] if not ds.shape else vals
        if dt.cls == _DT_VLEN and (
            dt.vlen_str
            or (dt.vlen_base is not None
                and dt.vlen_base.cls == _DT_STRING)
        ):
            # vlen strings (libhdf5's representation of str attributes)
            out = []
            b = _Buf(attr.data)
            for _ in range(count):
                n = b.u4()
                gaddr = b.u8()
                gidx = b.u4()
                if gaddr in (_UNDEF, 0):
                    out.append("")
                    continue
                payload = self._gheap_object(gaddr, gidx)
                out.append(
                    payload[:n].split(b"\x00")[0].decode("utf-8", "replace")
                )
            return out[0] if not ds.shape else out
        if dt.cls == _DT_VLEN and dt.vlen_base is not None \
                and dt.vlen_base.ref:
            out = []
            b = _Buf(attr.data)
            for _ in range(count):
                n = b.u4()
                gaddr = b.u8()
                gidx = b.u4()
                if gaddr == _UNDEF or gaddr == 0:
                    out.append([])
                    continue
                payload = self._gheap_object(gaddr, gidx)
                refs = np.frombuffer(
                    payload, "<u8", count=min(n, len(payload) // 8)
                )
                # object references are base-relative header addresses
                out.append([int(r) for r in refs])
            return out
        return None

    def _resolve_dims(self):
        self._dim_vars = set()
        phony = 0
        shared = {}  # size -> synthesized name (shared phony dims)
        for name, v in self.variables.items():
            attrs = v.attrs
            if attrs.get("CLASS") == "DIMENSION_SCALE":
                self._dim_vars.add(name)
        for name, v in self.variables.items():
            dl = v.raw_attrs.get("DIMENSION_LIST")
            dims = []
            if dl is not None:
                try:
                    refs = self._attr_value(dl)
                except Exception:
                    refs = None  # malformed refs -> phony-dim fallback
                for i, rl in enumerate(refs or []):
                    if rl and rl[0] in self._addr_names:
                        dims.append(self._addr_names[rl[0]])
                    else:
                        dims.append(f"phony_dim_{phony}")
                        phony += 1
            if len(dims) != len(v.shape):
                dims = []
                seen = {}  # size -> occurrences within THIS variable
                for size in v.shape:
                    if name in self._dim_vars:
                        dims.append(name)  # a dim scale is its own dim
                        continue
                    # key by (size, occurrence index): a square variable
                    # (..., 256, 256) must get two DISTINCT phony dims
                    # (duplicate dims in one array are invalid), while
                    # equal-size axes still share names across variables
                    key = (size, seen.get(size, 0))
                    seen[size] = seen.get(size, 0) + 1
                    if key not in shared:
                        shared[key] = f"phony_dim_{phony}"
                        phony += 1
                    dims.append(shared[key])
            v.dims = tuple(dims)

    # -- NC3File-compatible surface -------------------------------------------
    def data_variable_names(self):
        """Variables that are not pure netCDF dimensions."""
        out = []
        for name, v in self.variables.items():
            if name in self._dim_vars:
                nm = v.attrs.get("NAME", "")
                if isinstance(nm, str) and nm.startswith(_NC_DIM_NAME_PREFIX):
                    continue  # dimension-only dataset
            out.append(name)
        return out

    def _var(self, name: str) -> "H5Var":
        if name in self.unsupported:
            raise self.unsupported[name]  # deferred actionable error
        return self.variables[name]

    def n_rows(self, var: str) -> int:
        v = self._var(var)
        return v.shape[0] if v.shape else 1

    def read_rows(self, var: str, rows) -> np.ndarray:
        return self._var(var).read_rows(rows)

    def close(self):
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


class H5Var:
    """One dataset: geometry + lazily-indexed chunk map + row reads."""

    def __init__(self, f: H5File, name, addr, obj: _Object):
        self.f = f
        self.name = name
        self.addr = addr
        path = f.path
        self.shape = _parse_dataspace(
            _Buf(obj.first(_MSG_DATASPACE)), path
        ).shape
        dt = _parse_datatype(_Buf(obj.first(_MSG_DATATYPE)), path)
        if dt.np_dtype is None or dt.cls not in (_DT_FIXED, _DT_FLOAT):
            raise _unsupported(
                path, f"datatype class {dt.cls} on variable {name!r}"
            )
        self.dtype = dt.np_dtype
        self.layout = _parse_layout(_Buf(obj.first(_MSG_LAYOUT)), path)
        fbody = obj.first(_MSG_FILTER)
        self.filters = _parse_filters(_Buf(fbody), path) if fbody else []
        for fid, _ in self.filters:
            if fid not in (1, 2, 3):  # deflate, shuffle, fletcher32
                raise _unsupported(path, f"filter id {fid} on {name!r}")
        fill = obj.first(_MSG_FILL)
        self.fill = _parse_fill(_Buf(fill)) if fill else None
        self.dims = ()
        # decoded attrs (strings/numerics); raw kept for DIMENSION_LIST
        self.raw_attrs = {}
        self.attrs = {}
        for body in obj.all(_MSG_ATTR):
            # skip undecodable attrs outright (Exception, not just
            # H5Error: truncated payloads raise struct.error/ValueError
            # from _Buf/np.frombuffer) — one bad attribute must not make
            # the variable (or the file) unreadable
            try:
                a = _parse_attr(body, path)
            except Exception:
                continue
            self.raw_attrs[a.name] = a
            if a.name == "DIMENSION_LIST":
                continue  # decoded once, lazily, in _resolve_dims
            try:
                val = f._attr_value(a)
            except Exception:
                continue
            if val is not None:
                self.attrs[a.name] = val
        self._chunks = None
        self._cache = OrderedDict()

    @property
    def row_shape(self):
        return self.shape[1:] if self.shape else ()

    @property
    def row_nbytes(self):
        n = self.dtype.itemsize
        for s in self.row_shape:
            n *= s
        return n

    # -- chunk index ----------------------------------------------------------
    def _grid_coords(self):
        """Row-major chunk-grid coordinates for the variable's shape."""
        import itertools

        axes = [
            range(0, self.shape[d], self.layout.chunk[d])
            for d in range(len(self.shape))
        ]
        return itertools.product(*axes)

    def _chunk_nbytes(self):
        n = self.dtype.itemsize
        for c in self.layout.chunk:
            n *= c
        return n

    def _fixed_array_index(self):
        """Layout v4 'fixed array' chunk index (FAHD + FADB, unpaged)."""
        head = self.f._read(self.layout.addr, 32)
        b = _Buf(head)
        if bytes(b.take(4)) != b"FAHD":
            raise H5Error(f"{self.f.path}: bad fixed-array header")
        b.u1()  # version
        client = b.u1()
        entry_size = b.u1()
        page_bits = b.u1()
        nelems = b.u8()
        dblock = b.u8()
        if nelems > (1 << page_bits):
            raise _unsupported(self.f.path, "paged fixed-array chunk index")
        raw = self.f._read(dblock, 14 + nelems * entry_size + 4)
        bb = _Buf(raw)
        if bytes(bb.take(4)) != b"FADB":
            raise H5Error(f"{self.f.path}: bad fixed-array data block")
        bb.skip(2 + 8)  # version + client id + header address
        entries = []
        for _ in range(nelems):
            addr = bb.u8()
            if client == 1:  # filtered: + chunk size + filter mask
                size_len = entry_size - 12
                size = int.from_bytes(
                    bytes(bb.take(size_len)), "little"
                )
                mask = bb.u4()
            else:
                size, mask = self._chunk_nbytes(), 0
            entries.append((addr, size, mask))
        for coord, (addr, size, mask) in zip(self._grid_coords(), entries):
            if addr != _UNDEF:
                self._chunks[coord] = (addr, size, mask)

    def _chunk_index(self):
        if self._chunks is None:
            self._chunks = {}
            nd = len(self.shape)
            lay = self.layout
            if lay.index == "single":
                if lay.addr != _UNDEF:
                    size, mask = lay.filtered_single or (
                        self._chunk_nbytes(), 0
                    )
                    self._chunks[(0,) * nd] = (lay.addr, size, mask)
                return self._chunks
            if lay.index == "implicit":
                cb = self._chunk_nbytes()
                for i, coord in enumerate(self._grid_coords()):
                    self._chunks[coord] = (lay.addr + i * cb, cb, 0)
                return self._chunks
            if lay.index == "fixed":
                if lay.addr != _UNDEF:
                    self._fixed_array_index()
                return self._chunks

            def walk(addr):
                head = self.f._read(addr, 24)
                b = _Buf(head)
                if bytes(b.take(4)) != b"TREE":
                    raise H5Error(f"{self.f.path}: bad chunk B-tree")
                ntype, level = b.u1(), b.u1()
                nent = b.u2()
                if ntype != 1:
                    raise H5Error(f"{self.f.path}: B-tree type {ntype}")
                key_size = 8 + 8 * (nd + 1)
                body = self.f._read(
                    addr + 24, (nent + 1) * key_size + nent * 8
                )
                bb = _Buf(body)
                for i in range(nent):
                    size = bb.u4()
                    mask = bb.u4()
                    offs = tuple(bb.u8() for _ in range(nd + 1))
                    child = bb.u8()
                    if level > 0:
                        walk(child)
                    else:
                        self._chunks[offs[:-1]] = (child, size, mask)

            if self.layout.btree != _UNDEF:
                walk(self.layout.btree)
        return self._chunks

    def _decode_chunk(self, addr, size, mask):
        raw = self.f._read(addr, size)
        # filters apply in reverse pipeline order on read
        for pos in range(len(self.filters) - 1, -1, -1):
            fid, vals = self.filters[pos]
            if mask & (1 << pos):
                continue
            if fid == 1:
                raw = zlib.decompress(raw)
            elif fid == 3:
                raw = raw[:-4]  # fletcher32 checksum strip
            elif fid == 2:
                # shuffle: byte-transposed by element size
                es = vals[0] if vals else self.dtype.itemsize
                n = len(raw) // es
                arr = np.frombuffer(raw, np.uint8)
                raw = (
                    arr[: n * es].reshape(es, n).T.tobytes() + raw[n * es:]
                )
        return raw

    def _chunk_array(self, coord):
        cached = self._cache.pop(coord, None)
        if cached is not None:
            self._cache[coord] = cached
            return cached
        chunks = self._chunk_index()
        cshape = self.layout.chunk
        if coord in chunks:
            addr, size, mask = chunks[coord]
            raw = self._decode_chunk(addr, size, mask)
            arr = np.frombuffer(raw, self.dtype).reshape(cshape)
        else:
            arr = self._fill_array(cshape)
        self._cache[coord] = arr
        while len(self._cache) > H5File._CHUNK_CACHE:
            self._cache.popitem(last=False)
        return arr

    def _fill_array(self, shape):
        if self.fill:
            v = np.frombuffer(self.fill, self.dtype, count=1)[0]
        else:
            v = 0
        return np.full(shape, v, self.dtype)

    # -- reads ------------------------------------------------------------------
    def read(self) -> np.ndarray:
        """Whole variable, native byte order."""
        if not self.shape:
            rows = self.read_rows(np.array([0]))
            return rows.reshape(())
        return self.read_rows(np.arange(self.shape[0]))

    def read_rows(self, rows) -> np.ndarray:
        rows = np.asarray(rows, dtype=np.int64)
        lay = self.layout
        rshape = self.row_shape if self.shape else ()
        out = np.empty((rows.shape[0],) + rshape, self.dtype)
        if lay.cls == "compact":
            full = np.frombuffer(lay.compact, self.dtype).reshape(
                self.shape if self.shape else (1,)
            )
            out[:] = full[rows] if self.shape else full[0]
        elif lay.cls == "contiguous":
            if lay.addr == _UNDEF:
                out[:] = self._fill_array(out.shape)
            else:
                rb = self.row_nbytes
                flat = out.reshape(rows.shape[0], -1)
                j, n = 0, rows.shape[0]
                while j < n:
                    k = j + 1
                    while k < n and rows[k] == rows[k - 1] + 1:
                        k += 1
                    data = self.f._read(
                        lay.addr + int(rows[j]) * rb, rb * (k - j)
                    )
                    flat[j:k] = np.frombuffer(data, self.dtype).reshape(
                        k - j, -1
                    )
                    j = k
        elif lay.cls == "chunked":
            c0 = lay.chunk[0]
            nd = len(self.shape)
            # per-axis chunk counts beyond axis 0 (netCDF4 commonly chunks
            # whole rows, but handle the general grid)
            axis_chunks = [
                range(0, self.shape[d], lay.chunk[d]) for d in range(1, nd)
            ]
            import itertools

            for i, r in enumerate(rows):
                r = int(r)
                base = (r // c0) * c0
                local = r - base
                for rest in itertools.product(*axis_chunks):
                    coord = (base,) + rest
                    chunk = self._chunk_array(coord)
                    sel = chunk[local]
                    slices = tuple(
                        slice(o, min(o + lay.chunk[d + 1], self.shape[d + 1]))
                        for d, o in enumerate(rest)
                    )
                    trims = tuple(
                        slice(0, s.stop - s.start) for s in slices
                    )
                    out[(i,) + slices] = sel[trims] if slices else sel
        else:
            raise _unsupported(self.f.path, f"layout {lay.cls}")
        if out.dtype.byteorder == ">":
            out = out.astype(out.dtype.newbyteorder("="))
        return out


# ==========================================================================
# xrlite integration
# ==========================================================================

def read_h5_dataset(path):
    """Open a netCDF4/HDF5 file as an :mod:`~.xrlite` Dataset."""
    from . import xrlite

    f = H5File(path)
    try:
        ds = xrlite.Dataset()
        ds.attrs.update(f._attributes)  # global attrs, as the nc3 route
        for name in f.data_variable_names():
            v = f.variables[name]
            arr = v.read()
            attrs = {
                k: val for k, val in v.attrs.items()
                if not k.startswith("_Netcdf4") and k not in (
                    "CLASS", "NAME", "REFERENCE_LIST"
                )
            }
            ds[name] = xrlite.DataArray(arr, dims=v.dims, attrs=attrs)
        return ds
    finally:
        f.close()


# ==========================================================================
# writer (fixtures + netCDF4-classic write capability)
# ==========================================================================

class _Out:
    """Append-only buffer with deferred 8-byte address fixups."""

    def __init__(self):
        self.parts = bytearray()
        self.fixups = []  # (position, key)
        self.addrs = {}

    def tell(self):
        return len(self.parts)

    def write(self, b):
        self.parts += b

    def addr_placeholder(self, key):
        self.fixups.append((len(self.parts), key))
        self.parts += b"\x00" * 8

    def mark(self, key):
        self.addrs[key] = len(self.parts)

    def finish(self):
        for pos, key in self.fixups:
            struct.pack_into("<Q", self.parts, pos, self.addrs[key])
        return bytes(self.parts)


def _dt_msg(dtype: np.dtype) -> bytes:
    dtype = np.dtype(dtype)
    big = dtype.byteorder == ">"
    order = 1 if big else 0
    if dtype.kind == "f":
        # IEEE float class bits: byte order + mantissa normalization = 2
        # (msb implied); sign location rides in the second bit-field byte
        bits0 = order | (2 << 4)
        size = dtype.itemsize
        if size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
            sign = 31
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
            sign = 63
        head = struct.pack(
            "<BBBBI", (1 << 4) | _DT_FLOAT, bits0, sign, 0, size
        )
        return head + props
    if dtype.kind in "iu":
        signed = 0x08 if dtype.kind == "i" else 0
        head = struct.pack(
            "<BBBBI", (1 << 4) | _DT_FIXED, order | signed, 0, 0,
            dtype.itemsize,
        )
        return head + struct.pack("<HH", 0, dtype.itemsize * 8)
    if dtype.kind == "S":
        head = struct.pack(
            "<BBBBI", (1 << 4) | _DT_STRING, 0, 0, 0, dtype.itemsize
        )
        return head
    raise H5Error(f"writer: unsupported dtype {dtype}")


def _dt_vlen_ref_msg() -> bytes:
    base = struct.pack("<BBBBI", (1 << 4) | _DT_REFERENCE, 0, 0, 0, 8)
    head = struct.pack("<BBBBI", (1 << 4) | _DT_VLEN, 0, 0, 0, 16)
    return head + base


def _ds_msg(shape) -> bytes:
    body = struct.pack("<BBB5x", 1, len(shape), 0)
    for s in shape:
        body += struct.pack("<Q", s)
    return body


def _v1_messages(msgs) -> bytes:
    """Serialize (type, body) message list with v1 headers + 8-alignment."""
    out = bytearray()
    for mtype, body in msgs:
        pad = (-len(body)) % 8
        out += struct.pack("<HHB3x", mtype, len(body) + pad, 0)
        out += body + b"\x00" * pad
    return bytes(out)


def _obj_header_v1(msgs) -> bytes:
    body = _v1_messages(msgs)
    head = struct.pack("<BBHII4x", 1, 0, len(msgs), 1, len(body))
    return head + body


class _AttrV1:
    @staticmethod
    def build(name, dt_msg, ds_msg, data) -> bytes:
        nb = name.encode() + b"\x00"

        def pad8(b):
            return b + b"\x00" * ((-len(b)) % 8)

        body = struct.pack(
            "<BBHHH", 1, 0, len(nb), len(dt_msg), len(ds_msg)
        )
        body += pad8(nb) + pad8(dt_msg) + pad8(ds_msg) + data
        return body


def _attr_msgs(attrs) -> list:
    """(type, body) ATTR messages for a str/numeric attrs mapping.

    Non-string, non-numeric values are skipped — the same policy the
    reader applies to attributes it cannot decode."""
    msgs = []
    for k, v in (attrs or {}).items():
        if isinstance(v, str):
            vb = v.encode() + b"\x00"
            msgs.append((_MSG_ATTR, _AttrV1.build(
                k, _dt_msg(np.dtype(f"S{len(vb)}")), _ds_msg(()), vb
            )))
        else:
            arr = np.asarray(v)
            if arr.dtype.kind not in "iuf":
                continue
            arr = arr.astype(arr.dtype.newbyteorder("<"))
            msgs.append((_MSG_ATTR, _AttrV1.build(
                k, _dt_msg(arr.dtype),
                _ds_msg(arr.shape if arr.ndim else ()),
                arr.tobytes(),
            )))
    return msgs


def write_h5_dataset(ds, path, chunk_rows=None, compress=None,
                     _superblock_v1=False):
    """Write an xrlite-style Dataset as a netCDF4-classic-model HDF5 file.

    ``chunk_rows``: rows per chunk along each variable's leading dim
    (None = contiguous layout).  ``compress``: zlib level 1-9 (requires
    chunking; netCDF4 semantics).  Supported variable dtypes: f4/f8,
    i1/i2/i4/i8, u1/u2/u4/u8.

    Intent: fixtures for the built-in reader and a netCDF4 write path
    for this image (no netcdf4/h5py); the structures emitted are the
    same spec-level objects libhdf5 writes for classic-model files
    (superblock v0, v1 object headers, symbol-table root group,
    dimension scales + DIMENSION_LIST references, chunked+deflate).
    """
    if compress and not chunk_rows:
        chunk_rows = 1
    names = list(ds.variables)
    dims = ds.dims  # name -> size
    dim_names = list(dims)
    all_links = sorted(set(names) | set(dim_names))

    out = _Out()
    # ---- superblock v0 ---------------------------------------------------
    # group-node capacities: libhdf5 reads B-tree/SNOD node images at the
    # FULL allocated size implied by these K values (not entries_used), and
    # one SNOD may hold at most 2*leaf_k symbols — size leaf_k so the flat
    # root group's links fit one node, and allocate nodes at capacity
    leaf_k = max(4, (len(all_links) + 1) // 2)
    internal_k = 16
    out.write(HDF5_MAGIC)
    out.write(struct.pack(
        "<BBBBBBBBHHI",
        1 if _superblock_v1 else 0, 0, 0, 0, 0, 8, 8, 0,
        leaf_k, internal_k, 0,
    ))
    if _superblock_v1:
        # v1 adds indexed-storage-k + 2 reserved bytes after the flags
        # (test fixture knob: legacy producers with non-default btree K
        # emit v1; every address below is fixup-based so nothing shifts)
        out.write(struct.pack("<HH", 32, 0))
    out.write(struct.pack("<Q", 0))            # base address
    out.write(struct.pack("<Q", _UNDEF))       # free space
    eof_pos = out.tell()
    out.write(struct.pack("<Q", 0))            # EOF (fixed up at the end)
    out.write(struct.pack("<Q", _UNDEF))       # driver info
    # root group STE
    out.write(struct.pack("<Q", 0))            # link name offset
    out.addr_placeholder("root_header")
    out.write(struct.pack("<II", 0, 0))        # cache type 0 + reserved
    out.write(b"\x00" * 16)                    # scratch

    # ---- root group object header (symbol table message + global attrs) ---
    out.mark("root_header")
    gattr_msgs = _attr_msgs(getattr(ds, "attrs", {}))
    gattr_raw = _v1_messages(gattr_msgs)
    out.write(
        struct.pack(
            "<BBHII4x", 1, 0, 1 + len(gattr_msgs), 1,
            8 + 16 + len(gattr_raw),
        )
        + struct.pack("<HHB3x", _MSG_SYMTAB, 16, 0)
    )
    out.addr_placeholder("root_btree")
    out.addr_placeholder("root_heap")
    out.write(gattr_raw)

    # ---- local heap with link names ---------------------------------------
    heap_data = bytearray(b"\x00" * 8)  # offset 0 = empty string
    name_offsets = {}
    for nm in all_links:
        name_offsets[nm] = len(heap_data)
        nb = nm.encode() + b"\x00"
        heap_data += nb + b"\x00" * ((-len(nb)) % 8)
    out.mark("root_heap")
    out.write(b"HEAP" + struct.pack("<B3x", 0))
    # free-list head: local heaps use offset 1 as the null marker
    # (offset 0 is the valid empty-string entry), not UNDEF
    out.write(struct.pack("<QQ", len(heap_data), 1))
    out.addr_placeholder("heap_data")
    out.mark("heap_data")
    out.write(bytes(heap_data))

    # ---- group B-tree (one leaf -> one SNOD), allocated at capacity --------
    out.mark("root_btree")
    tree_start = out.tell()
    out.write(b"TREE" + struct.pack("<BBH", 0, 0, 1))
    out.write(struct.pack("<QQ", _UNDEF, _UNDEF))
    out.write(struct.pack("<Q", 0))  # key 0: empty string
    out.addr_placeholder("snod")
    out.write(struct.pack("<Q", name_offsets[all_links[-1]]))  # key 1
    tree_cap = 24 + 2 * internal_k * 16 + 8
    out.write(b"\x00" * (tree_cap - (out.tell() - tree_start)))

    out.mark("snod")
    snod_start = out.tell()
    out.write(b"SNOD" + struct.pack("<BBH", 1, 0, len(all_links)))
    for nm in all_links:
        out.write(struct.pack("<Q", name_offsets[nm]))
        out.addr_placeholder(f"hdr:{nm}")
        out.write(struct.pack("<II4x", 0, 0) + b"\x00" * 12)
    snod_cap = 8 + 2 * leaf_k * 40
    out.write(b"\x00" * (snod_cap - (out.tell() - snod_start)))

    # ---- plan variables ----------------------------------------------------
    # pure dims = dims that are not themselves variables
    pure_dims = [d for d in dim_names if d not in names]
    gheap_objects = []  # (key, payload bytes) for DIMENSION_LIST vlens

    def dim_scale_attrs(dim, idx):
        nm = f"{_NC_DIM_NAME_PREFIX} {dims[dim]:10d}"
        return [
            (_MSG_ATTR, _AttrV1.build(
                "CLASS", _dt_msg(np.dtype("S16")), _ds_msg(()),
                b"DIMENSION_SCALE\x00")),
            (_MSG_ATTR, _AttrV1.build(
                "NAME", _dt_msg(np.dtype(f"S{len(nm) + 1}")), _ds_msg(()),
                nm.encode() + b"\x00")),
            (_MSG_ATTR, _AttrV1.build(
                "_Netcdf4Dimid", _dt_msg(np.dtype("<i4")), _ds_msg(()),
                struct.pack("<i", idx))),
        ]

    def fixed_attr_msgs(da):
        return _attr_msgs(getattr(da, "attrs", {}))

    dim_index = {d: i for i, d in enumerate(dim_names)}

    def dataset_header(nm, shape, dtype, extra_msgs, data_key,
                       chunk=None, filters=None):
        msgs = [
            (_MSG_DATASPACE, _ds_msg(shape)),
            (_MSG_DATATYPE, _dt_msg(dtype)),
            (_MSG_FILL, struct.pack("<BBBB", 2, 2, 0, 0)),  # undefined fill
        ]
        if chunk is None:
            nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize \
                if shape else np.dtype(dtype).itemsize
            body = bytearray(struct.pack("<BB", 3, 1))
            pos = len(body)
            body += b"\x00" * 8 + struct.pack("<Q", nbytes)
            msgs.append((_MSG_LAYOUT, bytes(body)))
            layout_fix = (data_key, pos)
        else:
            body = bytearray(struct.pack("<BBB", 3, 2, len(shape) + 1))
            pos = len(body)
            body += b"\x00" * 8
            for c in chunk:
                body += struct.pack("<I", c)
            body += struct.pack("<I", np.dtype(dtype).itemsize)
            msgs.append((_MSG_LAYOUT, bytes(body)))
            layout_fix = (data_key, pos)
            if filters:
                fb = bytearray(struct.pack("<BB6x", 1, len(filters)))
                for fid, vals in filters:
                    fb += struct.pack("<HHHH", fid, 0, 0, len(vals))
                    for v in vals:
                        fb += struct.pack("<I", v)
                    if len(vals) % 2:
                        fb += b"\x00" * 4
                msgs.append((_MSG_FILTER, bytes(fb)))
        msgs.extend(extra_msgs)
        raw = _obj_header_v1(msgs)
        # locate the layout message's address field inside the serialized
        # header: find the body we built and compute its offset
        return raw, layout_fix, bytes(body)

    def emit_dataset(nm, shape, dtype, extra_msgs, chunk=None, filters=None):
        data_key = f"data:{nm}"
        raw, (key, pos_in_body), body = dataset_header(
            nm, shape, dtype, extra_msgs, data_key, chunk, filters
        )
        out.mark(f"hdr:{nm}")
        hpos = out.tell()
        idx = raw.index(body)
        out.write(raw)
        out.fixups.append((hpos + idx + pos_in_body, key))

    # ---- dimension-scale datasets ------------------------------------------
    for d in pure_dims:
        emit_dataset(
            d, (dims[d],), np.dtype("<f4"),
            dim_scale_attrs(d, dim_index[d]),
        )
    # variables that ARE dims (coordinate variables): mark as scales too
    for nm in names:
        if nm in dim_names:
            raise H5Error(
                "writer: coordinate variables (a variable named like its "
                f"dimension: {nm!r}) are not supported"
            )

    # ---- data variables -------------------------------------------------------
    var_payloads = {}
    for nm in names:
        da = ds[nm]
        arr = np.asarray(da.values)
        if arr.dtype.kind not in "iuf":
            raise H5Error(f"writer: unsupported dtype {arr.dtype} on {nm!r}")
        arr = arr.astype(arr.dtype.newbyteorder("<"))
        # DIMENSION_LIST: one vlen (len 1, ref to the dim scale) per dim
        dl_data = bytearray()
        for i, d in enumerate(da.dims):
            key = f"gheap_obj:{nm}:{i}"
            gheap_objects.append((key, d))
            dl_data += struct.pack("<I", 1)
            # global heap collection address + object index (filled below)
            dl_data += b"\x00" * 8 + struct.pack("<I", 0)
        extra = [
            (_MSG_ATTR, _AttrV1.build(
                "DIMENSION_LIST", _dt_vlen_ref_msg(),
                _ds_msg((len(da.dims),)), bytes(dl_data),
            )),
        ] + fixed_attr_msgs(da)
        chunk = None
        filters = None
        if chunk_rows and arr.ndim:
            chunk = (min(chunk_rows, arr.shape[0]),) + arr.shape[1:]
            if compress:
                filters = [(2, [arr.dtype.itemsize]), (1, [int(compress)])]
        emit_dataset(nm, arr.shape, arr.dtype, extra, chunk, filters)
        var_payloads[nm] = (arr, chunk, filters)

    # ---- raw data ---------------------------------------------------------------
    for d in pure_dims:
        out.mark(f"data:{d}")
        out.write(np.zeros(dims[d], "<f4").tobytes())
    for nm in names:
        arr, chunk, filters = var_payloads[nm]
        if chunk is None:
            out.mark(f"data:{nm}")
            out.write(arr.tobytes())
            continue
        # chunked: emit chunks, then one leaf chunk B-tree
        c0 = chunk[0]
        nchunks = -(-arr.shape[0] // c0)
        entries = []
        for ci in range(nchunks):
            block = arr[ci * c0:(ci + 1) * c0]
            if block.shape[0] < c0:  # pad the final partial chunk
                pad = np.zeros((c0 - block.shape[0],) + arr.shape[1:],
                               arr.dtype)
                block = np.concatenate([block, pad], axis=0)
            raw = block.tobytes()
            if filters:
                for fid, vals in filters:  # pipeline order
                    if fid == 2:
                        es = vals[0]
                        n = len(raw) // es
                        a = np.frombuffer(raw[:n * es], np.uint8)
                        raw = a.reshape(n, es).T.tobytes() + raw[n * es:]
                    elif fid == 1:
                        raw = zlib.compress(raw, vals[0])
            addr = out.tell()
            out.write(raw)
            entries.append(
                ((ci * c0,) + (0,) * (arr.ndim - 1), addr, len(raw))
            )
        out.mark(f"data:{nm}")
        out.write(b"TREE" + struct.pack("<BBH", 1, 0, len(entries)))
        out.write(struct.pack("<QQ", _UNDEF, _UNDEF))
        for coord, addr, size in entries:
            out.write(struct.pack("<II", size, 0))
            for c in coord:
                out.write(struct.pack("<Q", c))
            out.write(struct.pack("<Q", 0))
            out.write(struct.pack("<Q", addr))
        # final key: one past the last chunk
        out.write(struct.pack("<II", 0, 0))
        out.write(struct.pack("<Q", nchunks * c0))
        for _ in range(arr.ndim - 1):
            out.write(struct.pack("<Q", 0))
        out.write(struct.pack("<Q", 0))

    # ---- global heap collection for the DIMENSION_LIST references -----------
    if gheap_objects:
        gaddr = out.tell()
        objs = bytearray()
        index_of = {}
        for i, (key, dim) in enumerate(gheap_objects, start=1):
            index_of[key] = i
            payload_fix_pos = gaddr + 16 + len(objs) + 16
            objs += struct.pack("<HHIQ", i, 1, 0, 8)
            out.fixups.append((payload_fix_pos, f"hdr:{dim}"))
            objs += b"\x00" * 8
        total = 16 + len(objs) + 16
        size = max(4096, (total + 7) // 8 * 8)
        free = size - 16 - len(objs)
        out.write(b"GCOL" + struct.pack("<B3xQ", 1, size))
        out.write(bytes(objs))
        out.write(struct.pack("<HHIQ", 0, 0, 0, free))
        out.write(b"\x00" * (size - 16 - len(objs) - 16))
        # patch each DIMENSION_LIST attr payload: gheap addr + index.
        # The attr payloads live inside the emitted variable headers; we
        # wrote zeros there, so locate them via recorded fixups instead:
        # simpler — rewrite them now through the fixup mechanism set up
        # when the attribute was built.
        for nm in names:
            da = ds[nm]
            hdr_pos = out.addrs[f"hdr:{nm}"]
            raw = bytes(out.parts[hdr_pos:hdr_pos + 4096])
            marker = b"DIMENSION_LIST\x00"
            mpos = raw.index(marker)
            # attr body layout: name (padded 8) | dt (vlen 16+base 8 -> 24,
            # padded to 24) | ds (padded) | data
            name_off = mpos
            name_pad = (len(marker) + 7) // 8 * 8
            dt_len = len(_dt_vlen_ref_msg())
            dt_pad = (dt_len + 7) // 8 * 8
            ds_len = len(_ds_msg((len(da.dims),)))
            ds_pad = (ds_len + 7) // 8 * 8
            data_off = hdr_pos + name_off + name_pad + dt_pad + ds_pad
            for i, d in enumerate(da.dims):
                key = f"gheap_obj:{nm}:{i}"
                pos = data_off + i * 16
                struct.pack_into("<IQI", out.parts, pos, 1, gaddr,
                                 index_of[key])

    struct.pack_into("<Q", out.parts, eof_pos, out.tell())
    blob = out.finish()
    with open(path, "wb") as f:
        f.write(blob)

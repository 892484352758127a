"""Native runtime tier: C++ multithreaded graph builder behind a C ABI.

The capability analog of the reference's FFI layer (``src/libext.rs``): opaque index
handles, insert/search/parallel variants, custom function-pointer distances, plus
flat-array exports so a natively-built graph hands off zero-copy to the TPU search
path. The shared library builds on first use with g++ (ctypes binding — no pybind11
in this environment)."""

from __future__ import annotations

import ctypes as C
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hnsw_core.cpp")
_SO = os.path.join(_HERE, "libhnsw_core.so")
_lock = threading.Lock()
_lib = None

DIST_FN_T = C.CFUNCTYPE(C.c_float, C.POINTER(C.c_float), C.POINTER(C.c_float),
                        C.c_uint64)
FILTER_FN_T = C.CFUNCTYPE(C.c_int, C.c_int64)


class DescriptionFFI(C.Structure):
    """C-struct dump header — analog of the reference's ``DescriptionFFI``
    (``src/libext.rs:1121-1232``). Filled by ``hnsw_load_description``."""

    _fields_ = [
        ("format_version", C.c_int32),
        ("dumpmode", C.c_int32),
        ("max_nb_connection", C.c_int32),
        ("nb_layer", C.c_int32),
        ("level_scale", C.c_double),
        ("ef_construction", C.c_uint64),
        ("nb_point", C.c_uint64),
        ("dimension", C.c_uint64),
        ("distname", C.c_char * 64),
        ("t_name", C.c_char * 16),
    ]


def _build_so() -> str:
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    # compile with fast-math but LINK without it: -ffast-math at link time pulls in
    # crtfastmath.o, which flips FTZ/DAZ process-wide at dlopen and silently changes
    # subnormal behavior for the host numpy/jax process.
    obj = _SO + ".o"
    subprocess.run(["g++", "-c", "-O3", "-march=native", "-ffast-math",
                    "-funroll-loops", "-DNDEBUG", "-std=c++17", "-fPIC",
                    "-o", obj, _SRC], check=True, capture_output=True)
    subprocess.run(["g++", "-shared", "-pthread", "-o", _SO, obj],
                   check=True, capture_output=True)
    os.remove(obj)
    return _SO


_TYPED = {"float32": "f32", "float64": "f64", "int32": "i32",
          "uint32": "u32", "uint16": "u16", "uint8": "u8"}


def native_lib():
    """Load (building if needed) the native core; raises on toolchain failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = C.CDLL(_build_so())
        lib.hnsw_init.restype = C.c_void_p
        lib.hnsw_init.argtypes = [C.c_uint64, C.c_uint64, C.c_uint64, C.c_uint64,
                                  C.c_char_p]
        lib.hnsw_init_ptrdist.restype = C.c_void_p
        lib.hnsw_init_ptrdist.argtypes = [C.c_uint64, C.c_uint64, C.c_uint64,
                                          C.c_uint64, DIST_FN_T]
        lib.hnsw_drop.argtypes = [C.c_void_p]
        lib.hnsw_set_extend_candidates.argtypes = [C.c_void_p, C.c_int]
        lib.hnsw_set_keeping_pruned.argtypes = [C.c_void_p, C.c_int]
        lib.hnsw_modify_level_scale.argtypes = [C.c_void_p, C.c_double]
        lib.hnsw_insert.argtypes = [C.c_void_p, C.POINTER(C.c_float), C.c_uint64,
                                    C.c_int64]
        lib.hnsw_parallel_insert.argtypes = [C.c_void_p, C.POINTER(C.c_float),
                                             C.c_uint64, C.c_uint64,
                                             C.POINTER(C.c_int64), C.c_int]
        lib.hnsw_search.restype = C.c_uint64
        lib.hnsw_search.argtypes = [C.c_void_p, C.POINTER(C.c_float), C.c_uint64,
                                    C.c_uint64, C.POINTER(C.c_int64),
                                    C.POINTER(C.c_float)]
        lib.hnsw_search_filter.restype = C.c_uint64
        lib.hnsw_search_filter.argtypes = [C.c_void_p, C.POINTER(C.c_float),
                                           C.c_uint64, C.c_uint64, FILTER_FN_T,
                                           C.POINTER(C.c_int64), C.POINTER(C.c_float)]
        lib.hnsw_parallel_search.argtypes = [C.c_void_p, C.POINTER(C.c_float),
                                             C.c_uint64, C.c_uint64, C.c_uint64,
                                             C.c_int, C.POINTER(C.c_int64),
                                             C.POINTER(C.c_float)]
        lib.hnsw_nb_points.restype = C.c_uint64
        lib.hnsw_nb_points.argtypes = [C.c_void_p]
        lib.hnsw_dim.restype = C.c_uint64
        lib.hnsw_dim.argtypes = [C.c_void_p]
        lib.hnsw_entry_point.restype = C.c_int64
        lib.hnsw_entry_point.argtypes = [C.c_void_p]
        lib.hnsw_max_level_used.restype = C.c_int32
        lib.hnsw_max_level_used.argtypes = [C.c_void_p]
        lib.hnsw_layer_count.restype = C.c_int64
        lib.hnsw_layer_count.argtypes = [C.c_void_p, C.c_int32]
        lib.hnsw_level_scale.restype = C.c_double
        lib.hnsw_level_scale.argtypes = [C.c_void_p]
        lib.hnsw_export_meta.argtypes = [C.c_void_p, C.POINTER(C.c_int64),
                                         C.POINTER(C.c_int32), C.POINTER(C.c_int32)]
        lib.hnsw_export_data.argtypes = [C.c_void_p, C.POINTER(C.c_float)]
        lib.hnsw_export_layer.argtypes = [C.c_void_p, C.c_int32,
                                          C.POINTER(C.c_int32), C.POINTER(C.c_float)]
        lib.hnsw_layer_max_row.restype = C.c_int64
        lib.hnsw_layer_max_row.argtypes = [C.c_void_p, C.c_int32]
        lib.hnsw_export_layer_w.argtypes = [C.c_void_p, C.c_int32, C.c_int64,
                                            C.POINTER(C.c_int32), C.POINTER(C.c_float)]
        # typed surface (element-type parity with the reference's per-type FFI)
        for suf in _TYPED.values():
            f = getattr(lib, f"hnsw_init_{suf}")
            f.restype = C.c_void_p
            f.argtypes = [C.c_uint64, C.c_uint64, C.c_uint64, C.c_uint64, C.c_char_p]
            getattr(lib, f"hnsw_insert_{suf}").argtypes = [
                C.c_void_p, C.c_void_p, C.c_uint64, C.c_int64]
            getattr(lib, f"hnsw_parallel_insert_{suf}").argtypes = [
                C.c_void_p, C.c_void_p, C.c_uint64, C.c_uint64,
                C.POINTER(C.c_int64), C.c_int]
            g = getattr(lib, f"hnsw_search_{suf}")
            g.restype = C.c_uint64
            g.argtypes = [C.c_void_p, C.c_void_p, C.c_uint64, C.c_uint64,
                          C.POINTER(C.c_int64), C.POINTER(C.c_float)]
            g = getattr(lib, f"hnsw_search_filter_{suf}")
            g.restype = C.c_uint64
            g.argtypes = [C.c_void_p, C.c_void_p, C.c_uint64, C.c_uint64,
                          FILTER_FN_T, C.POINTER(C.c_int64), C.POINTER(C.c_float)]
            getattr(lib, f"hnsw_parallel_search_{suf}").argtypes = [
                C.c_void_p, C.c_void_p, C.c_uint64, C.c_uint64, C.c_uint64,
                C.c_int, C.POINTER(C.c_int64), C.POINTER(C.c_float)]
            getattr(lib, f"hnsw_export_data_{suf}").argtypes = [C.c_void_p, C.c_void_p]
            f = getattr(lib, f"hnsw_import_{suf}")
            f.restype = C.c_void_p
            f.argtypes = [C.c_uint64, C.c_uint64, C.c_uint64, C.c_char_p,
                          C.c_double, C.c_uint64, C.c_uint64, C.c_void_p,
                          C.POINTER(C.c_int64), C.POINTER(C.c_int32),
                          C.POINTER(C.c_int32), C.c_int64, C.c_int32,
                          C.POINTER(C.c_int64), C.POINTER(C.c_void_p),
                          C.POINTER(C.c_void_p), C.c_int, C.c_int]
        lib.hnsw_load_ptrdist.restype = C.c_void_p
        lib.hnsw_load_ptrdist.argtypes = [C.c_char_p, C.c_char_p, DIST_FN_T]
        lib.hnsw_init_log.argtypes = [C.c_int32]
        lib.hnsw_file_dump.restype = C.c_int32
        lib.hnsw_file_dump.argtypes = [C.c_void_p, C.c_char_p, C.c_char_p]
        lib.hnsw_load.restype = C.c_void_p
        lib.hnsw_load.argtypes = [C.c_char_p, C.c_char_p]
        lib.hnsw_element_type.restype = C.c_int32
        lib.hnsw_element_type.argtypes = [C.c_void_p]
        lib.hnsw_load_description.restype = C.c_int32
        lib.hnsw_load_description.argtypes = [C.c_char_p, C.c_char_p,
                                              C.POINTER(DescriptionFFI)]
        lib.hnsw_load_graph_only.restype = C.c_void_p
        lib.hnsw_load_graph_only.argtypes = [C.c_char_p, C.c_char_p]
        _lib = lib
        return lib


def init_native_log(level: int = 1):
    """Set the native tier's verbosity through the C ABI — the analog of the
    reference's ``init_rust_log`` (``src/libext.rs:1237-1240``). 0 = silent,
    1 = info, 2 = debug. Also settable via the ``HNSW_NATIVE_LOG`` env var."""
    native_lib().hnsw_init_log(int(level))


def load_hnsw_description(path, basename: str) -> DescriptionFFI:
    """Read a dump header through the C ABI without loading the index — the
    native-tier analog of the reference's ``load_hnsw_description``
    (``src/libext.rs:1121-1232``)."""
    lib = native_lib()
    d = DescriptionFFI()
    rc = lib.hnsw_load_description(str(path).encode(), basename.encode(), C.byref(d))
    if rc != 0:
        raise IOError(f"native description load failed (rc={rc}) for {path}/{basename}")
    return d


def _fp(a: np.ndarray):
    return a.ctypes.data_as(C.POINTER(C.c_float))


class NativeHnsw:
    """ctypes wrapper over the native index — the analog of the reference's
    ``HnswApi*`` opaque handles (``src/libext.rs:38-101``)."""

    def __init__(self, max_nb_connection=16, max_elements=10_000, max_layer=16,
                 ef_construction=200, dist="L2", dist_fn=None, dtype=np.float32):
        self.lib = native_lib()
        self._keepalive = []
        self.dtype = np.dtype(dtype)
        if self.dtype.name not in _TYPED:
            raise ValueError(f"unsupported native element type {self.dtype}")
        self._suf = _TYPED[self.dtype.name]
        if dist_fn is not None:
            if self.dtype != np.float32:
                raise ValueError("custom distances are f32-only on the native tier")
            cb = DIST_FN_T(lambda a, b, n: float(
                dist_fn(np.ctypeslib.as_array(a, (n,)), np.ctypeslib.as_array(b, (n,)))))
            self._keepalive.append(cb)
            self.h = self.lib.hnsw_init_ptrdist(max_nb_connection, ef_construction,
                                                max_elements, max_layer, cb)
            self.dist_name = "DistPtr"
        else:
            self.h = getattr(self.lib, f"hnsw_init_{self._suf}")(
                max_nb_connection, ef_construction, max_elements, max_layer,
                str(dist).encode())
            self.dist_name = str(dist)
        if not self.h:
            raise ValueError("native init failed (check max_nb_connection <= 256)")
        self.M = max_nb_connection
        self.max_layer = max_layer
        self.ef_construction = ef_construction

    def _fn(self, name):
        return getattr(self.lib, f"hnsw_{name}_{self._suf}")

    def _dp(self, a):
        return C.c_void_p(a.ctypes.data)

    def __del__(self):
        try:
            if getattr(self, "h", None):
                self.lib.hnsw_drop(self.h)
                self.h = None
        except Exception:
            pass

    def set_extend_candidates(self, flag: bool):
        self.lib.hnsw_set_extend_candidates(self.h, int(flag))

    def set_keeping_pruned(self, flag: bool):
        self.lib.hnsw_set_keeping_pruned(self.h, int(flag))

    def modify_level_scale(self, f: float):
        self.lib.hnsw_modify_level_scale(self.h, float(f))

    def insert(self, v, data_id: int):
        v = np.ascontiguousarray(v, self.dtype)
        self._fn("insert")(self.h, self._dp(v), v.shape[-1], int(data_id))

    def parallel_insert(self, X, ids, n_threads: int = 0):
        X = np.ascontiguousarray(X, self.dtype)
        ids = np.ascontiguousarray(ids, np.int64)
        self._fn("parallel_insert")(self.h, self._dp(X), X.shape[0], X.shape[1],
                                    ids.ctypes.data_as(C.POINTER(C.c_int64)),
                                    int(n_threads))

    def search(self, q, knbn: int, ef: int, filter_fn=None):
        q = np.ascontiguousarray(q, self.dtype)
        out_i = np.full(knbn, -1, np.int64)
        out_d = np.full(knbn, np.inf, np.float32)
        if filter_fn is None:
            k = self._fn("search")(self.h, self._dp(q), knbn, ef,
                                   out_i.ctypes.data_as(C.POINTER(C.c_int64)),
                                   _fp(out_d))
        else:
            cb = FILTER_FN_T(lambda i: 1 if filter_fn(int(i)) else 0)
            k = self._fn("search_filter")(
                self.h, self._dp(q), knbn, ef, cb,
                out_i.ctypes.data_as(C.POINTER(C.c_int64)), _fp(out_d))
        return out_i[:k], out_d[:k]

    def parallel_search(self, Q, knbn: int, ef: int, n_threads: int = 0):
        Q = np.ascontiguousarray(Q, self.dtype)
        nq = Q.shape[0]
        out_i = np.full((nq, knbn), -1, np.int64)
        out_d = np.full((nq, knbn), np.inf, np.float32)
        self._fn("parallel_search")(self.h, self._dp(Q), nq, knbn, ef, int(n_threads),
                                    out_i.ctypes.data_as(C.POINTER(C.c_int64)),
                                    _fp(out_d))
        return out_i, out_d

    def __len__(self):
        return int(self.lib.hnsw_nb_points(self.h))

    def file_dump(self, path, basename: str) -> str:
        """Reference-format dump straight from the native core (C ABI
        ``hnsw_file_dump``) — interchangeable with the Python tier's reader."""
        rc = self.lib.hnsw_file_dump(self.h, str(path).encode(), basename.encode())
        if rc != 0:
            raise IOError(f"native dump failed (rc={rc})")
        return basename

    @classmethod
    def _wrap_loaded(cls, lib, h, path, basename) -> "NativeHnsw":
        """Shared tail of the native reload constructors: wrap the C handle,
        recover the dumped element type, and fill header metadata (M, efc,
        distance) from the dump description so ``to_hnsw()`` is faithful."""
        self = cls.__new__(cls)
        self.lib = lib
        self._keepalive = []
        tcode = int(lib.hnsw_element_type(h))
        self.dtype = np.dtype(["float32", "float64", "int32", "uint32", "uint16",
                               "uint8"][tcode])
        self._suf = _TYPED[self.dtype.name]
        self.h = h
        d = load_hnsw_description(path, basename)
        from ..io.hnswio import short_dist_name
        self.M = d.max_nb_connection
        self.max_layer = d.nb_layer
        self.ef_construction = d.ef_construction
        self.dist_name = short_dist_name(d.distname.decode())
        return self

    @classmethod
    def load(cls, path, basename: str) -> "NativeHnsw":
        """Reload a Full or Light v2/v3/v4 dump into a native index (C ABI
        ``hnsw_load``). DistPtr dumps are a hard error here — use
        :meth:`load_ptrdist` (reference ``load_hnsw_with_dist``)."""
        lib = native_lib()
        h = lib.hnsw_load(str(path).encode(), basename.encode())
        if not h:
            raise IOError(f"native load failed for {path}/{basename}")
        return cls._wrap_loaded(lib, h, path, basename)

    @classmethod
    def load_ptrdist(cls, path, basename: str, dist_fn) -> "NativeHnsw":
        """Reload a DistPtr dump with the caller's distance function (reference
        ``load_hnsw_with_dist`` ``src/hnswio.rs:531-613`` + ptr-dist FFI ctors
        ``src/libext.rs:643-655``). f32 element type only."""
        lib = native_lib()
        cb = DIST_FN_T(lambda a, b, n: float(
            dist_fn(np.ctypeslib.as_array(a, (n,)), np.ctypeslib.as_array(b, (n,)))))
        h = lib.hnsw_load_ptrdist(str(path).encode(), basename.encode(), cb)
        if not h:
            raise IOError(f"native ptrdist load failed for {path}/{basename}")
        self = cls._wrap_loaded(lib, h, path, basename)
        self._keepalive.append(cb)  # the index holds the fn pointer for its lifetime
        return self

    @classmethod
    def from_hnsw(cls, h) -> "NativeHnsw":
        """Import a Python-tier ``Hnsw`` into a native index via the flat-array
        C ABI (``hnsw_import_*``) — the inverse of :meth:`to_hnsw`. Rows keep
        their stored order, so ``file_dump`` on the result is byte-identical to
        the Python writer's output. This is the fast persistence path at
        flagship scale: one memcpy-style handoff, then the buffered C++ writer
        (reference single-pass dump, ``src/hnswio.rs:1063-1115``)."""
        lib = native_lib()
        n = h._nb_point
        if n == 0:
            raise ValueError("cannot import an empty index")
        dt = np.dtype(h.dtype)
        if dt.name not in _TYPED:
            raise ValueError(f"unsupported native element type {dt}")
        suf = _TYPED[dt.name]
        data = np.ascontiguousarray(np.asarray(h._data[:n], dtype=dt))
        origin = np.ascontiguousarray(h._origin[:n], np.int64)
        level = np.ascontiguousarray(h._level[:n], np.int32)
        rank = np.ascontiguousarray(h._rank_in_layer[:n], np.int32)
        L = max(h._layers.keys(), default=-1) + 1
        widths = np.zeros(max(L, 1), np.int64)
        lid_ptrs = (C.c_void_p * max(L, 1))()
        ldd_ptrs = (C.c_void_p * max(L, 1))()
        keep = []  # the row arrays must outlive the call
        for l in range(L):
            t = h._layers.get(l)
            if t is None:
                continue
            ids = np.ascontiguousarray(t.ids[:n], np.int32)
            dds = np.ascontiguousarray(t.dists[:n], np.float32)
            keep.append((ids, dds))
            widths[l] = t.width
            lid_ptrs[l] = ids.ctypes.data
            ldd_ptrs[l] = dds.ctypes.data
        handle = getattr(lib, f"hnsw_import_{suf}")(
            h.max_nb_connection, h.ef_construction, h.max_layer,
            h.metric.name.encode(), float(h.get_level_scale()), n, h._dim or 0,
            C.c_void_p(data.ctypes.data),
            origin.ctypes.data_as(C.POINTER(C.c_int64)),
            level.ctypes.data_as(C.POINTER(C.c_int32)),
            rank.ctypes.data_as(C.POINTER(C.c_int32)),
            int(h._entry), L, widths.ctypes.data_as(C.POINTER(C.c_int64)),
            lid_ptrs, ldd_ptrs, int(h.extend_candidates), int(h.keep_pruned))
        if not handle:
            raise ValueError("native import failed")
        self = cls.__new__(cls)
        self.lib = lib
        self._keepalive = []
        self.dtype = dt
        self._suf = suf
        self.h = handle
        self.M = h.max_nb_connection
        self.max_layer = h.max_layer
        self.ef_construction = h.ef_construction
        self.dist_name = h.metric.name
        return self

    @classmethod
    def load_graph_only(cls, path, basename: str) -> "NativeHnsw":
        """NoData reload through the C ABI: topology + metadata, no vectors
        (reference ``libext.rs:446-451``). Searching returns 0 results; exports,
        meta introspection, and ``to_hnsw()`` (graph-only) work."""
        lib = native_lib()
        h = lib.hnsw_load_graph_only(str(path).encode(), basename.encode())
        if not h:
            raise IOError(f"native graph-only load failed for {path}/{basename}")
        return cls._wrap_loaded(lib, h, path, basename)

    # ----------------------------------------------------- zero-copy TPU handoff -----

    def to_hnsw(self):
        """Export the native graph into a Python ``Hnsw`` (same flat layout), making
        every framework capability — device batched search, persistence, flatten,
        filters — available on a natively-built graph."""
        from ..models.hnsw import Hnsw
        n = len(self)
        dim = int(self.lib.hnsw_dim(self.h))
        h = Hnsw(max_nb_connection=self.M, max_elements=max(n, 8),
                 max_layer=self.max_layer, ef_construction=self.ef_construction,
                 dist=self.dist_name if self.dist_name != "DistPtr" else "L2",
                 dtype=self.dtype,
                 level_scale=float(self.lib.hnsw_level_scale(self.h)))
        if n == 0:
            return h
        h._set_dim(dim)
        h._ensure_cap(n)
        self._fn("export_data")(self.h, self._dp(h._data[:n]))
        org = np.empty(n, np.int64)
        lvl = np.empty(n, np.int32)
        rnk = np.empty(n, np.int32)
        self.lib.hnsw_export_meta(self.h, org.ctypes.data_as(C.POINTER(C.c_int64)),
                                  lvl.ctypes.data_as(C.POINTER(C.c_int32)),
                                  rnk.ctypes.data_as(C.POINTER(C.c_int32)))
        h._origin[:n] = org
        h._level[:n] = lvl
        h._rank_in_layer[:n] = rnk
        for l in range(int(self.lib.hnsw_max_level_used(self.h)) + 1):
            cnt = int(self.lib.hnsw_layer_count(self.h, l))
            h._layer_npoints[l] = cnt
        # export every layer that can hold links (levels + l_n backlinks + projections)
        top = int(lvl.max(initial=0))
        for l in range(top + 1):
            t = h._layer_table(l)
            # navigability-repaired graphs carry rows wider than the M-derived
            # default; size the export to the widest row actually present
            w = max(t.width, int(self.lib.hnsw_layer_max_row(self.h, l)))
            if w > t.width:
                t.grow_width(w)
            ids = np.empty((n, w), np.int32)
            dd = np.empty((n, w), np.float32)
            self.lib.hnsw_export_layer_w(self.h, l, w,
                                         ids.ctypes.data_as(C.POINTER(C.c_int32)),
                                         _fp(dd))
            t.ids[:n] = ids
            t.dists[:n] = dd
            t.counts[:n] = (ids >= 0).sum(1)
        h._nb_point = n
        h._entry = int(self.lib.hnsw_entry_point(self.h))
        h._version += 1
        return h

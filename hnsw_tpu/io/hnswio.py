"""Persistence — byte-compatible with the reference's dump format, plus a fast native
snapshot.

A dump is two files, ``<basename>.hnsw.graph`` + ``<basename>.hnsw.data`` (reference
``src/hnswio.rs:4-7``). All integers are native-endian (little-endian here); ``usize``
is u64. Layout (format v4, reference ``src/hnswio.rs:46-65,878-919,1063-1115,1303-1341``):

graph file:
  u32 MAGICDESCR_4 | u8 dumpmode | u8 max_nb_connection | f64 level_scale |
  u8 nb_layer (== 16) | u64 ef_construction | u64 nb_point | u64 dimension |
  u64 len + distname bytes | u64 len + typename bytes
  u8 nb_layer, then for each layer 0..16:
      u32 MAGICLAYER | u64 nb_point_in_layer
      per point (rank order): u32 MAGICPOINT | u64 origin_id | (Full: u8 layer,
      i32 rank) | for each of the 16 layers: u64 nbg | per neighbor
      (u64 d_id | Full: u8 layer, i32 rank | f32 distance)
  u64 entry origin_id | (Full: u8 layer, i32 rank)

data file:
  u32 MAGICDATAP | u64 dimension
  per point: u32 MAGICDATAP | u64 origin_id | u64 byte_len | raw vector bytes

The native snapshot (``save_native``/``load_native``) is a plain ``.npz`` of the flat
arrays — the fast path for TPU-sized indexes.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import struct
from typing import Optional

import numpy as np

from ..models.hnsw import Hnsw, NB_LAYER_MAX
from ..utils.rng import DEFAULT_SEED

log = logging.getLogger(__name__)

MAGICPOINT = 0x000A678F
MAGICDESCR_2 = 0x002A677F
MAGICDESCR_3 = 0x002A6771
MAGICDESCR_4 = 0x002A6779
MAGICLAYER = 0x000A676F
MAGICDATAP = 0xA67F0000

_RUST_TYPE = {"float32": "f32", "float64": "f64", "int32": "i32",
              "uint32": "u32", "uint16": "u16", "uint8": "u8"}
_NP_TYPE = {v: k for k, v in _RUST_TYPE.items()}
_DIST_PREFIX = "anndists::dist::distances::"


def rust_dist_name(metric_name: str) -> str:
    short = metric_name if metric_name.startswith("Dist") else "Dist" + metric_name
    return _DIST_PREFIX + short


def short_dist_name(full: str) -> str:
    s = full.rsplit("::", 1)[-1]
    return s[4:] if s.startswith("Dist") else s


@dataclasses.dataclass
class Description:
    """Dump header — mirrors reference ``Description`` (``src/hnswio.rs:846-930``)."""

    format_version: int
    dumpmode: int
    max_nb_connection: int
    level_scale: float
    nb_layer: int
    ef: int
    nb_point: int
    dimension: int
    distname: str
    t_name: str

    def get_typename(self) -> str:
        return self.t_name

    def get_dimension(self) -> int:
        return self.dimension


def _w(f, fmt, *vals):
    f.write(struct.pack("<" + fmt, *vals))


def _r(f, fmt):
    size = struct.calcsize("<" + fmt)
    buf = f.read(size)
    if len(buf) != size:
        raise EOFError("truncated dump file")
    return struct.unpack("<" + fmt, buf)


def write_description(f, d: Description):
    if not (0 < d.max_nb_connection <= 255):
        # the header stores M as a u8; the reference silently truncates 256 -> 0
        # (``src/hnsw.rs:823-825`` casts ``as u8``) — we reject instead
        raise ValueError("max_nb_connection must be in [1, 255] to dump (u8 header field)")
    _w(f, "I", MAGICDESCR_4)
    _w(f, "B", d.dumpmode)
    _w(f, "B", d.max_nb_connection)
    _w(f, "d", d.level_scale)
    if d.nb_layer != NB_LAYER_MAX:
        raise ValueError("nb_layer must equal NB_LAYER_MAX for dump")
    _w(f, "B", d.nb_layer)
    _w(f, "Q", d.ef)
    _w(f, "Q", d.nb_point)
    _w(f, "Q", d.dimension)
    name = d.distname.encode()
    _w(f, "Q", len(name))
    f.write(name)
    tname = d.t_name.encode()
    _w(f, "Q", len(tname))
    f.write(tname)


def read_description(f) -> Description:
    (magic,) = _r(f, "I")
    if magic not in (MAGICDESCR_2, MAGICDESCR_3, MAGICDESCR_4):
        raise ValueError(f"bad description magic 0x{magic:08x}")
    version = {MAGICDESCR_2: 2, MAGICDESCR_3: 3, MAGICDESCR_4: 4}[magic]
    (dumpmode,) = _r(f, "B")
    (max_nb_connection,) = _r(f, "B")
    level_scale = _r(f, "d")[0] if version == 4 else 1.0 / np.log(max(max_nb_connection, 2))
    (nb_layer,) = _r(f, "B")
    (ef,) = _r(f, "Q")
    (nb_point,) = _r(f, "Q")
    (dimension,) = _r(f, "Q")
    (nlen,) = _r(f, "Q")
    if nlen > 256:
        raise ValueError("distance name too long — corrupt dump?")
    distname = f.read(nlen).decode()
    (tlen,) = _r(f, "Q")
    if tlen > 256:
        raise ValueError("type name too long — corrupt dump?")
    t_name = f.read(tlen).decode()
    return Description(version, dumpmode, max_nb_connection, level_scale, nb_layer,
                       ef, nb_point, dimension, distname, t_name)


def load_description(path) -> Description:
    """Standalone header parse — reference ``load_description``
    (``src/hnswio.rs:937-1042``)."""
    with open(path, "rb") as f:
        return read_description(f)


# ------------------------------------------------------------------------- dump ------

def graph_path(dirpath, basename):
    return os.path.join(dirpath, basename + ".hnsw.graph")


def data_path(dirpath, basename):
    return os.path.join(dirpath, basename + ".hnsw.data")


# Above this size route dump/reload through the native C++ tier (flat-array
# import + single buffered pass): the Python writer/reader is a per-record
# struct loop — ~10^8 struct calls at 1M points, tens of minutes on one core.
# Below it the Python path is instant and avoids a toolchain dependency.
NATIVE_IO_MIN_POINTS = 5_000
_NATIVE_METRICS = ("L1", "L2", "Cosine", "Dot", "Hamming", "Jaccard",
                   "Hellinger", "Jeffreys", "JensenShannon", "Levenshtein")


def _native_io_enabled() -> bool:
    return os.environ.get("HNSW_TPU_NATIVE_IO", "1") not in ("0", "false")


def file_dump(hnsw: Hnsw, dirpath, basename: str, mode: str = "Full") -> str:
    """Dump to ``<dir>/<basename>.hnsw.{graph,data}`` — reference ``AnnT::file_dump``
    (``src/api.rs:70-94``). When the live index is mmap-backed the basename is
    uniquified instead of clobbering a possibly-mapped file (reference
    ``src/hnswio.rs:150-185``).

    Large Full dumps route through the native C++ writer (flat-array handoff +
    one buffered pass, byte-identical output — reference single-pass dump
    ``src/hnswio.rs:1063-1115``); the Python writer below is the oracle and the
    fallback for small/special dumps."""
    if hnsw.datamap_opt and os.path.exists(graph_path(dirpath, basename)):
        basename = f"{basename}-{np.random.randint(1, 2**31)}"
    full = mode == "Full"
    if (full and _native_io_enabled() and hnsw._nb_point >= NATIVE_IO_MIN_POINTS
            and hnsw.metric.name in _NATIVE_METRICS
            and hnsw.dtype.name in _RUST_TYPE and hnsw._entry >= 0):
        try:
            from ..ffi import NativeHnsw
            nh = NativeHnsw.from_hnsw(hnsw)
            nh.file_dump(dirpath, basename)
            return basename
        except Exception:  # toolchain missing / import failure: Python fallback
            log.warning("native dump unavailable; falling back to the Python "
                        "writer", exc_info=True)
    n = hnsw._nb_point
    if hnsw._entry < 0:
        raise ValueError("cannot dump an empty index (no entry point)")
    d = Description(
        format_version=4, dumpmode=1 if full else 0,
        max_nb_connection=hnsw.max_nb_connection,
        level_scale=hnsw.get_level_scale(), nb_layer=NB_LAYER_MAX,
        ef=hnsw.ef_construction, nb_point=n, dimension=hnsw._dim or 0,
        distname=rust_dist_name(hnsw.metric.name),
        t_name=_RUST_TYPE.get(hnsw.dtype.name, hnsw.dtype.name),
    )
    order = hnsw._iteration_order()  # layer 0 upward, rank order within layer
    with open(graph_path(dirpath, basename), "wb") as g, \
            open(data_path(dirpath, basename), "wb") as dt:
        write_description(g, d)
        _w(dt, "I", MAGICDATAP)
        _w(dt, "Q", d.dimension)
        _w(g, "B", NB_LAYER_MAX)
        pos = 0
        for layer in range(NB_LAYER_MAX):
            nb_in_layer = hnsw.get_layer_nb_point(layer)
            _w(g, "I", MAGICLAYER)
            _w(g, "Q", nb_in_layer)
            for _ in range(nb_in_layer):
                i = int(order[pos])
                pos += 1
                assert hnsw.get_point_id(i)[0] == layer
                _w(g, "I", MAGICPOINT)
                _w(g, "Q", hnsw.get_origin_id(i))
                if full:
                    lv, rk = hnsw.get_point_id(i)
                    _w(g, "B", lv)
                    _w(g, "i", rk)
                for l in range(NB_LAYER_MAX):
                    ids, dists = hnsw.neighbour_row(i, l)
                    _w(g, "Q", len(ids))
                    for j, dd in zip(ids, dists):
                        _w(g, "Q", hnsw.get_origin_id(int(j)))
                        if full:
                            nlv, nrk = hnsw.get_point_id(int(j))
                            _w(g, "B", nlv)
                            _w(g, "i", nrk)
                        _w(g, "f", float(dd))
                _w(dt, "I", MAGICDATAP)
                _w(dt, "Q", hnsw.get_origin_id(i))
                raw = np.ascontiguousarray(hnsw._data[i]).tobytes()
                _w(dt, "Q", len(raw))
                dt.write(raw)
        _w(g, "Q", hnsw.get_origin_id(hnsw._entry))
        if full:
            lv, rk = hnsw.get_point_id(hnsw._entry)
            _w(g, "B", lv)
            _w(g, "i", rk)
    return basename


# ------------------------------------------------------------------------- reload ----

@dataclasses.dataclass
class ReloadOptions:
    """Reference ``ReloadOptions`` (``src/hnswio.rs:87-133``). ``datamap=True`` keeps
    vector data as a zero-copy strided view over the (memory-mapped) data file;
    ``mmap_threshold`` is the number of most-recently-dumped points to materialize in
    RAM (upper layers load last, so they stay resident, matching the reference's
    policy note ``Changes.md:36-37``)."""

    datamap: bool = False
    mmap_threshold: int = 0


class HnswIo:
    """Stateful reloader — reference ``HnswIo`` (``src/hnswio.rs:300-364``). Owns the
    optional mmap, so keep it alive as long as the reloaded index when using
    ``datamap`` (reference lifetime note ``src/hnswio.rs:265-267``)."""

    def __init__(self, dirpath, basename: str, options: Optional[ReloadOptions] = None):
        self.dir = str(dirpath)
        self.basename = basename
        self.options = options or ReloadOptions()
        self._mmap = None

    def set_options(self, options: ReloadOptions):
        self.options = options

    def load_description(self) -> Description:
        return load_description(graph_path(self.dir, self.basename))

    def load_hnsw(self, dist=None, dtype=None, graph_only: bool = False) -> Hnsw:
        """Rebuild an index from a dump — reference ``HnswIo::load_hnsw``
        (``src/hnswio.rs:431-524``). ``graph_only=True`` is the ``NoData``/``NoDist``
        reload (topology without vectors). Handles Full and Light dumps (the
        reference's readers branch on dumpmode, ``src/hnswio.rs:1074-1090``):
        Light records carry no PointIds, so points take their (layer, rank) from
        file position and neighbors resolve by external id.

        Large dumps route through the native C++ reader (single buffered pass +
        flat-array export); the per-record Python parser below is the oracle and
        the fallback."""
        gpath = graph_path(self.dir, self.basename)
        dpath = data_path(self.dir, self.basename)
        pre = load_description(gpath)
        if (_native_io_enabled() and not graph_only and not self.options.datamap
                and dtype is None and (dist is None or isinstance(dist, str))
                and pre.nb_point >= NATIVE_IO_MIN_POINTS
                and pre.t_name in _NP_TYPE
                and short_dist_name(pre.distname) in _NATIVE_METRICS):
            if dist is not None:
                from ..ops.distances import get_metric
                want = get_metric(dist).name
                got = short_dist_name(pre.distname)
                if want != got:
                    raise ValueError(
                        f"distance mismatch: dump has {got}, requested {want}")
            try:
                from ..ffi import NativeHnsw
                h = NativeHnsw.load(self.dir, self.basename).to_hnsw()
                # reference hardcodes these on reload (src/hnswio.rs:507-518)
                h.extend_candidates = True
                h.keep_pruned = False
                h._version += 1
                return h
            except Exception:
                log.warning("native reload unavailable; falling back to the "
                            "Python reader", exc_info=True)
        with open(gpath, "rb") as g:
            descr = read_description(g)
            if dist is not None:
                from ..ops.distances import get_metric
                want = get_metric(dist).name
                got = short_dist_name(descr.distname)
                if not graph_only and want != got and got != "NoDist":
                    raise ValueError(f"distance mismatch: dump has {got}, requested {want}")
            dist = dist if dist is not None else short_dist_name(descr.distname)
            if graph_only:
                dist = "NoDist"
            np_dtype = dtype or _NP_TYPE.get(descr.t_name, "float32")
            full = descr.dumpmode == 1
            hnsw = Hnsw(max_nb_connection=descr.max_nb_connection,
                        max_elements=max(descr.nb_point, 8),
                        max_layer=descr.nb_layer, ef_construction=descr.ef,
                        dist=dist, dtype=np_dtype, seed=DEFAULT_SEED,
                        level_scale=descr.level_scale)
            # reference hardcodes these on reload (src/hnswio.rs:507-518)
            hnsw.extend_candidates = True
            hnsw.keep_pruned = False
            if descr.dimension > 0:
                if self.options.datamap and not graph_only:
                    # _data becomes a lazy mmap view in _load_data — don't
                    # materialize a [cap, dim] dense array just to throw it away
                    hnsw._dim = int(descr.dimension)
                else:
                    hnsw._set_dim(descr.dimension)
            hnsw._ensure_cap(descr.nb_point)
            (nb_layer,) = _r(g, "B")
            pid_to_idx: dict[tuple[int, int], int] = {}
            oid_to_idx: dict[int, int] = {}  # Light: neighbors resolve by d_id
            raw_points = []  # (idx, [per-layer list of (d_id, p_id, dist)])
            idx = 0
            for layer in range(nb_layer):
                (magic,) = _r(g, "I")
                if magic != MAGICLAYER:
                    raise ValueError("bad layer magic")
                (nb_in_layer,) = _r(g, "Q")
                for rank in range(nb_in_layer):
                    (magic,) = _r(g, "I")
                    if magic != MAGICPOINT:
                        raise ValueError("bad point magic")
                    (origin,) = _r(g, "Q")
                    if full:
                        lv, rk = _r(g, "Bi")
                        if (lv, rk) != (layer, rank):
                            raise ValueError(f"point id mismatch: {(lv, rk)} != {(layer, rank)}")
                    else:  # Light: pid implied by file position
                        lv, rk = layer, rank
                    hnsw._origin[idx] = origin
                    hnsw._level[idx] = lv
                    hnsw._rank_in_layer[idx] = rk
                    pid_to_idx[(lv, rk)] = idx
                    oid_to_idx[origin] = idx
                    per_layer = []
                    for _l in range(NB_LAYER_MAX):
                        (nbg,) = _r(g, "Q")
                        lst = []
                        for _j in range(nbg):
                            (d_id,) = _r(g, "Q")
                            pid = _r(g, "Bi") if full else None
                            (dd,) = _r(g, "f")
                            lst.append((d_id, pid, dd))
                        per_layer.append(lst)
                    raw_points.append((idx, per_layer))
                    idx += 1
                hnsw._layer_npoints[layer] = nb_in_layer
            (ep_origin,) = _r(g, "Q")
            if full:
                ep_lv, ep_rk = _r(g, "Bi")
                hnsw._entry = pid_to_idx.get((ep_lv, ep_rk), -1)
            else:
                hnsw._entry = oid_to_idx.get(ep_origin, -1)
            hnsw._nb_point = descr.nb_point
        # pass 2: resolve p_ids (Full) / external ids (Light), sort each list by
        # distance (reference src/hnswio.rs:720-737)
        for idx, per_layer in raw_points:
            for l, lst in enumerate(per_layer):
                if not lst:
                    continue
                if full:
                    lst = sorted(((dd, pid_to_idx[pid]) for (_d, pid, dd) in lst))
                else:
                    lst = sorted(((dd, oid_to_idx[d_id]) for (d_id, _p, dd) in lst))
                t = hnsw._layer_table(l)
                ids = np.fromiter((i for _, i in lst), np.int32, len(lst))
                dds = np.fromiter((d for d, _ in lst), np.float32, len(lst))
                # rows wider than the M-derived default are kept intact —
                # set_row grows reserve columns (navigability-repaired graphs
                # carry them; truncating here would silently drop the repair
                # links on reload)
                t.set_row(idx, ids, dds)
        # data
        if not graph_only and descr.dimension > 0:
            self._load_data(hnsw, dpath, descr)
        hnsw._version += 1
        return hnsw

    def load_hnsw_with_dist(self, dist, dtype=None) -> Hnsw:
        """Reload with an explicit distance instance (reference
        ``load_hnsw_with_dist``, ``src/hnswio.rs:531-613``, for DistPtr closures)."""
        return self.load_hnsw(dist=dist, dtype=dtype)

    def _load_data(self, hnsw: Hnsw, dpath: str, descr: Description):
        from .datamap import DataMap
        if self.options.datamap and descr.format_version == 2:
            raise ValueError("datamap reload needs fixed-size records (format >= 3); "
                             "v2 bincode data records carry a length prefix")
        if self.options.datamap:
            dm = DataMap(self.dir, self.basename, dtype=hnsw.dtype)
            self._mmap = dm
            order = {int(o): k for k, o in enumerate(dm.ids())}
            n = hnsw._nb_point
            perm = np.fromiter((order[int(hnsw._origin[i])] for i in range(n)), np.int64, n)
            # partial residency (reference src/hnswio.rs:675-692): _data becomes a
            # lazy view over the mmap; only the last `threshold` records (upper
            # layers, dumped last) are materialized in RAM, searches/uploads read
            # through the map, and post-reload inserts land in a RAM overlay.
            hnsw._data = dm.lazy_data(perm, hnsw._cap,
                                      threshold=self.options.mmap_threshold)
            hnsw.set_datamap(True)
            return
        with open(dpath, "rb") as f:
            (magic,) = _r(f, "I")
            if magic != MAGICDATAP:
                raise ValueError("bad data file magic")
            (dim,) = _r(f, "Q")
            if dim != descr.dimension:
                raise ValueError("data dimension mismatch")
            by_origin = {}
            for _ in range(descr.nb_point):
                (magic,) = _r(f, "I")
                if magic != MAGICDATAP:
                    raise ValueError("bad data record magic")
                (origin,) = _r(f, "Q")
                (blen,) = _r(f, "Q")
                raw = f.read(blen)
                if descr.format_version == 2:
                    # v2 data records are bincode-serialized Vec<T>: u64 element
                    # count + raw LE elements (reference src/hnswio.rs:1156-1172)
                    (cnt,) = struct.unpack_from("<Q", raw, 0)
                    by_origin[origin] = np.frombuffer(raw, dtype=hnsw.dtype,
                                                      count=cnt, offset=8)
                else:
                    by_origin[origin] = np.frombuffer(raw, dtype=hnsw.dtype)
            n = hnsw._nb_point
            for i in range(n):
                hnsw._data[i] = by_origin[int(hnsw._origin[i])]


# -------------------------------------------------------------- native snapshot ------

def save_native(hnsw: Hnsw, path: str):
    """Fast flat-array snapshot (.npz) — everything round-trips exactly."""
    n = hnsw._nb_point
    arrays = {
        "data": hnsw._data[:n] if hnsw._data is not None else np.zeros((0, 0), hnsw.dtype),
        "origin": hnsw._origin[:n], "level": hnsw._level[:n],
        "rank": hnsw._rank_in_layer[:n], "layer_npoints": hnsw._layer_npoints,
        "meta": np.array([hnsw.max_nb_connection, hnsw.max_layer, hnsw.ef_construction,
                          hnsw._entry, n, int(hnsw.extend_candidates), int(hnsw.keep_pruned)],
                         np.int64),
        "level_scale": np.float64(hnsw.get_level_scale()),
        "metric": np.array(hnsw.metric.name),
        "dtype": np.array(hnsw.dtype.name),
    }
    for l, t in hnsw._layers.items():
        arrays[f"l{l}_ids"] = t.ids[:n]
        arrays[f"l{l}_dists"] = t.dists[:n]
        arrays[f"l{l}_counts"] = t.counts[:n]
    np.savez_compressed(path, **arrays)


def load_native(path: str) -> Hnsw:
    z = np.load(path, allow_pickle=False)
    M, max_layer, ef, entry, n, ext, keep = (int(x) for x in z["meta"])
    hnsw = Hnsw(max_nb_connection=M, max_elements=max(n, 8), max_layer=max_layer,
                ef_construction=ef, dist=str(z["metric"]), dtype=str(z["dtype"]),
                level_scale=float(z["level_scale"]))
    hnsw.extend_candidates = bool(ext)
    hnsw.keep_pruned = bool(keep)
    if z["data"].size:
        hnsw._set_dim(z["data"].shape[1])
        hnsw._ensure_cap(n)
        hnsw._data[:n] = z["data"]
    else:
        hnsw._ensure_cap(n)
    hnsw._origin[:n] = z["origin"]
    hnsw._level[:n] = z["level"]
    hnsw._rank_in_layer[:n] = z["rank"]
    hnsw._layer_npoints[:] = z["layer_npoints"]
    hnsw._entry = entry
    hnsw._nb_point = n
    for key in z.files:
        if key.endswith("_ids") and key.startswith("l"):
            l = int(key[1:-4])
            t = hnsw._layer_table(l)
            w = z[f"l{l}_ids"].shape[1]
            if w > t.width:  # repaired (widened) snapshot: grow before assigning
                t.grow_width(w)
            t.ids[:n, :w] = z[f"l{l}_ids"]
            t.dists[:n, :w] = z[f"l{l}_dists"]
            t.counts[:n] = z[f"l{l}_counts"]
    hnsw._version += 1
    return hnsw

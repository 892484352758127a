"""Memory-mapped vector store — analog of reference ``DataMap``
(``src/datamap.rs:24-319``).

A standalone zero-copy view over a ``.hnsw.data`` dump: validates the header, computes
the fixed record size ``4 + 2*8 + dim*itemsize`` (reference ``src/datamap.rs:157-159``),
indexes external id → record offset, and serves vectors without copying. Because every
record has the same size, the whole file doubles as one strided ``[N, dim]`` array
(``strided_view``), which is what the TPU upload path uses for streaming.
"""

from __future__ import annotations

import os
import struct

import numpy as np

MAGICDATAP = 0xA67F0000
_HDR = 4 + 8  # u32 magic + u64 dimension
_REC_HDR = 4 + 8 + 8  # u32 magic + u64 origin + u64 byte_len


class DataMap:
    def __init__(self, dirpath, basename: str, dtype=np.float32):
        self.path = os.path.join(str(dirpath), basename + ".hnsw.data")
        self.dtype = np.dtype(dtype)
        self._mm = np.memmap(self.path, dtype=np.uint8, mode="r")
        magic, = struct.unpack_from("<I", self._mm, 0)
        if magic != MAGICDATAP:
            raise ValueError(f"bad data file magic 0x{magic:08x}")
        self.dimension, = struct.unpack_from("<Q", self._mm, 4)
        self.record_size = _REC_HDR + self.dimension * self.dtype.itemsize
        body = len(self._mm) - _HDR
        if self.dimension and body % self.record_size != 0:
            raise ValueError("data file size is not a whole number of records")
        self.nb_data = body // self.record_size if self.dimension else 0
        # id -> record ordinal (reference builds an IndexMap of offsets)
        self._ids = np.zeros(self.nb_data, np.int64)
        for k in range(self.nb_data):
            off = _HDR + k * self.record_size
            magic, = struct.unpack_from("<I", self._mm, off)
            if magic != MAGICDATAP:
                raise ValueError(f"bad record magic at record {k}")
            self._ids[k], = struct.unpack_from("<Q", self._mm, off + 4)
        self._index = {int(i): k for k, i in enumerate(self._ids)}

    def get_nb_data(self) -> int:
        return self.nb_data

    def get_dimension(self) -> int:
        return int(self.dimension)

    def check_data_type(self, typename: str) -> bool:
        """Compare against a dump's short type name (reference
        ``src/datamap.rs:238-268``)."""
        from .hnswio import _RUST_TYPE
        return _RUST_TYPE.get(self.dtype.name, self.dtype.name) == typename

    def get_data(self, data_id: int):
        """Zero-copy vector for an external id (reference ``get_data``,
        ``src/datamap.rs:276-297``); None if absent."""
        k = self._index.get(int(data_id))
        if k is None:
            return None
        off = _HDR + k * self.record_size + _REC_HDR
        return np.frombuffer(self._mm, dtype=self.dtype, count=self.dimension, offset=off)

    def get_dataid_iter(self):
        """External ids in file order (reference ``get_dataid_iter``,
        ``src/datamap.rs:299-303``) — for streaming consumers."""
        return iter(self._ids.tolist())

    def ids(self) -> np.ndarray:
        return self._ids

    def strided_view(self) -> np.ndarray:
        """The whole file as a ``[N, dim]`` array in file order — zero-copy (a strided
        view over the mmap) whenever the record header is aligned for the dtype
        (f32/i32/u32/u16/u8); a materialized copy otherwise (f64)."""
        dim = int(self.dimension)
        if self.nb_data == 0:
            return np.zeros((0, dim), self.dtype)
        it = self.dtype.itemsize
        if _HDR % it == 0 and _REC_HDR % it == 0 and self.record_size % it == 0:
            per_rec = self.record_size // it
            arr = np.frombuffer(self._mm, dtype=self.dtype, offset=_HDR,
                                count=self.nb_data * per_rec).reshape(self.nb_data, per_rec)
            return arr[:, _REC_HDR // it: _REC_HDR // it + dim]
        out = np.empty((self.nb_data, dim), self.dtype)
        for k, i in enumerate(self._ids):
            out[k] = self.get_data(int(i))
        return out

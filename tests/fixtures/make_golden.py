"""Hand-assemble the golden v4 dump fixture byte-by-byte from the documented format
(SURVEY.md §2.5; reference src/hnswio.rs:46-65,878-919,1063-1115,1303-1341) — NOT via
either tier's writer, so the fixture can catch shared wrong assumptions in both.

Index: dim=2 f32 L2, M=4, ef_c=16, 3 points:
  A origin=10 vec=(0,0) level=0 rank=0
  B origin=20 vec=(1,0) level=0 rank=1
  C origin=30 vec=(0,2) level=1 rank=0   <- entry point
Neighbors (sorted by distance):
  A l0: [B d=1, C d=2]      B l0: [A d=1, C d=sqrt5]
  C l0: [A d=2, B d=sqrt5]  C l1: []

Run from the repo root: python tests/fixtures/make_golden.py
"""
import math
import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
MAGICPOINT = 0x000A678F
MAGICDESCR_4 = 0x002A6779
MAGICLAYER = 0x000A676F
MAGICDATAP = 0xA67F0000

SQ5 = math.sqrt(5.0)
# (origin, level, rank, vec, neighbors per 16 layers as [(d_id, (lv, rk), dist)])
A = (10, 0, 0, (0.0, 0.0), {0: [(20, (0, 1), 1.0), (30, (1, 0), 2.0)]})
B = (20, 0, 1, (1.0, 0.0), {0: [(10, (0, 0), 1.0), (30, (1, 0), SQ5)]})
C = (30, 1, 0, (0.0, 2.0), {0: [(10, (0, 0), 2.0), (20, (0, 1), SQ5)], 1: []})

g = bytearray()
g += struct.pack("<I", MAGICDESCR_4)
g += struct.pack("<B", 1)  # dumpmode Full
g += struct.pack("<B", 4)  # max_nb_connection
g += struct.pack("<d", 1.0 / math.log(4.0))  # level_scale
g += struct.pack("<B", 16)  # nb_layer (description copy)
g += struct.pack("<Q", 16)  # ef_construction
g += struct.pack("<Q", 3)  # nb_point
g += struct.pack("<Q", 2)  # dimension
dist = b"anndists::dist::distances::DistL2"
g += struct.pack("<Q", len(dist)) + dist
tn = b"f32"
g += struct.pack("<Q", len(tn)) + tn
g += struct.pack("<B", 16)  # nb_layer again (PointIndexation dump)

d = bytearray()
d += struct.pack("<I", MAGICDATAP)
d += struct.pack("<Q", 2)

by_layer = {0: [A, B], 1: [C]}
for layer in range(16):
    pts = by_layer.get(layer, [])
    g += struct.pack("<I", MAGICLAYER)
    g += struct.pack("<Q", len(pts))
    for (origin, lv, rk, vec, nbrs) in pts:
        g += struct.pack("<I", MAGICPOINT)
        g += struct.pack("<Q", origin)
        g += struct.pack("<B", lv) + struct.pack("<i", rk)  # PointId (Full mode)
        for l in range(16):
            row = nbrs.get(l, [])
            g += struct.pack("<Q", len(row))
            for (d_id, (nlv, nrk), dd) in row:
                g += struct.pack("<Q", d_id)
                g += struct.pack("<B", nlv) + struct.pack("<i", nrk)
                g += struct.pack("<f", dd)
        d += struct.pack("<I", MAGICDATAP)
        d += struct.pack("<Q", origin)
        raw = struct.pack("<2f", *vec)
        d += struct.pack("<Q", len(raw)) + raw
g += struct.pack("<Q", 30)  # entry origin
g += struct.pack("<B", 1) + struct.pack("<i", 0)  # entry PointId

with open(os.path.join(HERE, "golden_v4.hnsw.graph"), "wb") as f:
    f.write(g)
with open(os.path.join(HERE, "golden_v4.hnsw.data"), "wb") as f:
    f.write(d)
print(f"wrote golden_v4.hnsw.graph ({len(g)} bytes), golden_v4.hnsw.data ({len(d)} bytes)")

# ---- the same index as a legacy v2 dump: MAGICDESCR_2, no level_scale field, and
# bincode-serialized data records (u64 element count + raw LE elements; reference
# src/hnswio.rs:49-56,1156-1172) ----
MAGICDESCR_2 = 0x002A677F
g2 = bytearray()
g2 += struct.pack("<I", MAGICDESCR_2)
g2 += struct.pack("<B", 1)
g2 += struct.pack("<B", 4)
# (v2/v3 have no level_scale in the header)
g2 += struct.pack("<B", 16)
g2 += struct.pack("<Q", 16) + struct.pack("<Q", 3) + struct.pack("<Q", 2)
g2 += struct.pack("<Q", len(dist)) + dist
g2 += struct.pack("<Q", len(tn)) + tn
# graph body is identical to v4 from the second nb_layer byte onward
body_start = (4 + 1 + 1 + 8 + 1 + 8 + 8 + 8 + 8 + len(dist) + 8 + len(tn))
g2 += g[body_start:]

d2 = bytearray()
d2 += struct.pack("<I", MAGICDATAP) + struct.pack("<Q", 2)
for layer in range(16):
    for (origin, lv, rk, vec, nbrs) in by_layer.get(layer, []):
        d2 += struct.pack("<I", MAGICDATAP) + struct.pack("<Q", origin)
        payload = struct.pack("<Q", len(vec)) + struct.pack("<2f", *vec)
        d2 += struct.pack("<Q", len(payload)) + payload

with open(os.path.join(HERE, "golden_v2.hnsw.graph"), "wb") as f:
    f.write(g2)
with open(os.path.join(HERE, "golden_v2.hnsw.data"), "wb") as f:
    f.write(d2)
print(f"wrote golden_v2.hnsw.graph ({len(g2)} bytes), golden_v2.hnsw.data ({len(d2)} bytes)")

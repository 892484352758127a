"""Fused codec-score kernel micro-bench: sweep (qt, slots) on a synthetic
1M-scale table. Verifies multi-slot output == double-buffered baseline, then
times each variant. Env: KB (batch, default 8192), KE (expand, 4), KM0 (48),
KD (128), KN (table rows, 1_000_001), KGRID ("qt,slots;..." pairs).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from hnsw_tpu.ops.pallas_scores import pallas_fused_codec_scores

    B = int(os.environ.get("KB", 8192))
    E = int(os.environ.get("KE", 4))
    M0 = int(os.environ.get("KM0", 48))
    d = int(os.environ.get("KD", 128))
    N = int(os.environ.get("KN", 500_001))  # 3 GB: the 1M table OOM'd this
    # job's gen+kernel working set; per-row DMA latency is table-size-agnostic
    rng = np.random.default_rng(7)
    # generate the table ON DEVICE: a [N, M0, d] int8 host array is ~6 GB at
    # 1M rows — this microVM's first-touch page zeroing can run at MB/s, and
    # the tunnel upload would add another minute
    # random.bits(uint8) + bitcast: randint's int32 intermediate is 4x the
    # table (24 GB at 1M rows -> HBM OOM); fused under jit this materializes
    # the 6 GB int8 table once. Value distribution is irrelevant for timing.
    blocks = jax.jit(lambda k: jax.lax.bitcast_convert_type(
        jax.random.bits(k, (N, M0, d), dtype=jnp.uint8), jnp.int8))(
            jax.random.PRNGKey(7))
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    qsn = (q * q).sum(-1)[:, None]
    scale = jnp.float32(0.01)
    src = jnp.asarray(rng.integers(0, N, (B, E), dtype=np.int32))

    ref = None
    grid = os.environ.get("KGRID", "8,2;8,3;16,2;16,3;16,4;32,2;32,3")
    results = []
    for spec in grid.split(";"):
        qt, slots = (int(x) for x in spec.split(","))
        if B % qt:
            continue
        t0 = time.time()
        out = pallas_fused_codec_scores(src, q, qsn, scale, blocks, E,
                                        form="l2", qt=qt, slots=slots)
        o = np.array(out)
        compile_s = time.time() - t0
        if ref is None:
            ref = o
            ok = True
        else:
            ok = bool(np.array_equal(ref, o))
        # time: chain 20 calls, force one fetch at the end
        t0 = time.time()
        outs = [pallas_fused_codec_scores(src, q, qsn, scale, blocks, E,
                                          form="l2", qt=qt, slots=slots)
                for _ in range(20)]
        np.array(outs[-1])
        ms = (time.time() - t0) / 20 * 1e3
        row = dict(qt=qt, slots=slots, ms=round(ms, 3), exact=ok,
                   compile_s=round(compile_s, 1),
                   gbps=round(B * E * M0 * d / ms / 1e6, 1))
        results.append(row)
        log("[kern]", json.dumps(row))
    print(json.dumps(results))


if __name__ == "__main__":
    main()

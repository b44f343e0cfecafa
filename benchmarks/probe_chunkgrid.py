"""Chunk-width sensitivity of the chunked engine across batch sizes.

The round-3 calibration measured chunk width at ONE shape (128x8192^2)
and found 2048 optimal; the e2e pipeline's real buckets are short-query
shapes (m ~ 300, n ~ 3000) at batch 64-1024, where the fused-carry
regime's width cliff moves with B. This probe times
engine/chunked.chunked_scores over a (B, chunk) grid with the on-device
chained methodology (benchmarks/suite.py _chain) and prints one JSON
line per cell, so `default_chunk` can become batch-aware from
measurement rather than theory.

    /opt/venv/bin/python benchmarks/probe_chunkgrid.py [--quick]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

try:
    import numpy as np
except ImportError:
    venv = "/opt/venv/bin/python"
    if os.path.exists(venv) and not sys.executable.startswith("/opt/venv/"):
        os.execv(venv, [venv, os.path.abspath(__file__), *sys.argv[1:]])
    raise

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_cell(B, m, n_pad, chunk, k1=2, k2=8):
    import jax
    import jax.numpy as jnp

    from aligntools_tpu import batch as AB
    from aligntools_tpu.engine import chunked as ck
    from aligntools_tpu.params import AlignParams

    rng = np.random.default_rng(12345 + B + chunk)
    m_pad = -(-m // 16) * 16
    pairs = [
        (
            bytes(rng.integers(65, 69, m).astype(np.uint8)),
            bytes(rng.integers(65, 69, n_pad - 10).astype(np.uint8)),
        )
        for _ in range(B)
    ]
    bks = AB._bucketize(pairs, None, keys=[(m_pad, n_pad)] * B)
    b = list(bks.values())[0]
    q_np, t_np, _, m_np, n_np = AB._pad_rows(b)
    qs, ts, nss, _, ps = AB._dev_inputs(
        q_np, t_np, m_np, n_np, params=AlignParams()
    )
    cells = len(q_np) * m_pad * n_pad / 1e9

    def one(q):
        return ck.chunked_scores(
            "local", q, ts, nss, chunk, params=ps, decaying_params=True
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_k(K, q0):
        def body(k, carry):
            acc, q = carry
            sc = one(q)
            return acc + sc, q + (sc * 0).astype(q.dtype)[:, None]

        acc, _ = jax.lax.fori_loop(
            0, K, body, (jnp.zeros(q0.shape[0]), q0)
        )
        return acc

    def timed(K):
        np.asarray(run_k(K, qs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_k(K, qs))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (timed(k2) - timed(k1)) / (k2 - k1)
    return cells / per


def main():
    from aligntools_tpu.backend import enable_compile_cache

    enable_compile_cache()
    quick = "--quick" in sys.argv
    grid = []
    # e2e regime: short queries, clustered targets
    for B in (64, 152, 512) if quick else (64, 152, 512, 1024):
        for chunk in (512, 1024, 2048):
            grid.append((B, 290, 2944, chunk))
    # headline-regime guards
    if not quick:
        grid += [(256, 2048, 2048, 1024), (256, 2048, 2048, 2048),
                 (256, 2048, 8192, 1024), (256, 2048, 8192, 2048)]
    for B, m, n_pad, chunk in grid:
        try:
            g = bench_cell(B, m, n_pad, chunk)
            print(json.dumps({
                "B": B, "m": m, "n_pad": n_pad, "chunk": chunk,
                "gcups": round(g, 1),
            }), flush=True)
        except Exception as e:  # OOM etc: record and continue
            print(json.dumps({
                "B": B, "m": m, "n_pad": n_pad, "chunk": chunk,
                "error": str(e)[:120],
            }), flush=True)


if __name__ == "__main__":
    main()
